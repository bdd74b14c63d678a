"""VBench++ dispatch (reference: finalize_online_eval
common.py:2453-2522; eval_vbench.py). Prefers the external vbench
package (exact published protocol) and falls back to the JAX-native
dimensions in eval/vbench_native.py, so the hook produces scores on a
zero-egress TPU box instead of only a skip marker."""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

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
    towers_dir: Optional[str] = None,
    native: str = "fallback",
) -> Dict[str, object]:
    """Run VBench++ over saved mp4s on the reference's 5 dimensions.

    Dispatch order: the external vbench package when installed (exact
    published protocol), else the JAX-native dimensions
    (eval/vbench_native.py) — temporal_flickering and motion_smoothness
    always run; subject_consistency / aesthetic_quality additionally
    need their towers under ``towers_dir``
    (scripts/fetch_and_convert_towers.py --only dino,aesthetic).
    ``native="force"`` skips the package even if present;
    ``native="off"`` restores the old gated behavior.
    """
    dims = list(dimensions or VBENCH_DIMENSIONS)
    if native != "force":
        try:
            from vbench import VBench  # type: ignore
        except ImportError:
            pass
        else:
            import torch

            vb = VBench(torch.device("cpu"), None, None)
            results = vb.evaluate(videos_path=video_dir, name="eval",
                                  dimension_list=dims, mode=mode)
            return {"skipped": False, "backend": "vbench-package",
                    "results": results, "dimensions": dims}
    if native == "off":
        return {
            "skipped": True,
            "reason": "vbench not installed in this environment",
            "dimensions": dims,
        }
    return run_vbench_native(video_dir, dims, towers_dir)


def run_vbench_native(
    video_dir: str,
    dimensions: Optional[List[str]] = None,
    towers_dir: Optional[str] = None,
) -> Dict[str, object]:
    """Score the mp4s in ``video_dir`` with the JAX-native dimensions."""
    from pathlib import Path

    from .vbench_native import load_native_towers, native_vbench_scores

    dims = list(dimensions or VBENCH_DIMENSIONS)
    mp4s = sorted(Path(video_dir).glob("*.mp4"))
    if not mp4s:
        return {"skipped": True, "reason": f"no mp4s in {video_dir}",
                "dimensions": dims}
    from ..data.video_io import decode_all_frames

    # lazy loaders: native_vbench_scores decodes/scores/frees one video
    # at a time (100 campaign clips at once would be ~13 GB), and
    # decode_all_frames counts frames by decoding to EOF — container
    # frame-count metadata can overcount, and padding duplicate tail
    # frames would bias the temporal dimensions upward
    frames = {
        p.name: (lambda p=p: decode_all_frames(str(p))
                 .astype(np.float32) / 255.0)
        for p in mp4s
    }
    towers = load_native_towers(towers_dir) if towers_dir else {}
    out = native_vbench_scores(frames, towers, dims)
    return {"skipped": False, "backend": "jax-native",
            "dimensions": dims, **out}
