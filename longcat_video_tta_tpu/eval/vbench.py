"""VBench++ hook (reference: finalize_online_eval common.py:2453-2522;
eval_vbench.py). Gated: the vbench package and its model downloads are
external; without them this reports a skip marker instead of failing the
run."""

from __future__ import annotations

from typing import Dict, List, Optional

VBENCH_DIMENSIONS = (
    "subject_consistency",
    "motion_smoothness",
    "temporal_flickering",
    "aesthetic_quality",
    "imaging_quality",
)


def run_vbench(
    video_dir: str,
    dimensions: Optional[List[str]] = None,
    mode: str = "i2v",
) -> Dict[str, object]:
    """Run VBench++ over saved mp4s on the reference's 5 dimensions."""
    dims = list(dimensions or VBENCH_DIMENSIONS)
    try:
        from vbench import VBench  # type: ignore
    except ImportError:
        return {
            "skipped": True,
            "reason": "vbench not installed in this environment",
            "dimensions": dims,
        }
    import torch

    vb = VBench(torch.device("cpu"), None, None)
    results = vb.evaluate(videos_path=video_dir, name="eval",
                          dimension_list=dims, mode=mode)
    return {"skipped": False, "results": results, "dimensions": dims}
