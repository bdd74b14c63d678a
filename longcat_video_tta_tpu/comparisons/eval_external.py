"""Score externally-generated predictions against ground truth.

Covers the evaluation half of the reference's DFoT / PVDM comparison
runs (comparison_methods/run_dfot_eval.py + savi_dno.py eval paths): the
external model produces a directory of predicted clips; we score them
with the same PSNR/SSIM/LPIPS (+ optional FVD) used for our own runs, so
numbers are directly comparable in compare_all.
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..data.video_io import count_frames, decode_frames
from ..eval import OnlineFrechetAccumulator, evaluate_generation_metrics
from ..eval.frechet import load_i3d_model
from ..eval.offline import _list_videos, _pair_by_stem


def evaluate_external(gen_dir: str, gt_dir: str,
                      max_frames: int = 64,
                      i3d_model_path: Optional[str] = None) -> Dict:
    pairs = _pair_by_stem(_list_videos(gen_dir), _list_videos(gt_dir))
    if not pairs:
        raise SystemExit(f"no (gen, gt) pairs matched between {gen_dir} "
                         f"and {gt_dir}")
    fvd = OnlineFrechetAccumulator(
        video_feature_fn=load_i3d_model(i3d_model_path))
    rows: List[Dict] = []
    for g, t in pairs:
        gen = decode_frames(g, min(count_frames(g), max_frames)) / 255.0
        gt = decode_frames(t, min(count_frames(t), max_frames)) / 255.0
        n = min(len(gen), len(gt))
        m = evaluate_generation_metrics(gen[:n], gt[:n])
        m["video"] = Path(g).name
        rows.append(m)
        if fvd.enabled:
            fvd.update(gen[:n], gt[:n])
    out = {
        "n": len(rows),
        "psnr": float(np.mean([r["psnr"] for r in rows])),
        "ssim": float(np.mean([r["ssim"] for r in rows])),
        "lpips": float(np.nanmean([r["lpips"] for r in rows])),
        "fvd": fvd.compute().get("fvd"),
        "per_video": rows,
    }
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description="Score external predictions")
    p.add_argument("--gen-dir", required=True)
    p.add_argument("--gt-dir", required=True)
    p.add_argument("--max-frames", type=int, default=64)
    p.add_argument("--i3d-model-path", default=None)
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)
    out = evaluate_external(args.gen_dir, args.gt_dir, args.max_frames,
                            args.i3d_model_path)
    print(json.dumps({k: v for k, v in out.items() if k != "per_video"},
                     indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()
