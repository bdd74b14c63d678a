"""No-TTA baseline runner (reference: baseline_experiment/scripts/
run_baseline.py — anchor-based frame layout, generate_vc with KV cache,
per-video CSV + summary with mean/std/min/max metric and timing blocks).

Thin wrapper over the unified runner with --method none, plus the
baseline CSV artifact."""

from __future__ import annotations

import csv
import os
import sys
from typing import List, Optional

from .run_tta import build_arg_parser, main as tta_main


def main(argv: Optional[List[str]] = None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--method" not in argv:
        argv = ["--method", "none"] + argv
    summary = tta_main(argv)

    # per-video CSV (reference: run_baseline.py:506-568)
    out_dir = summary["config"]["output_dir"]
    csv_path = os.path.join(out_dir, "per_video_metrics.csv")
    rows = [r for r in summary["results"] if r.get("success")]
    if rows:
        with open(csv_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=[
                "index", "video", "caption", "psnr", "ssim", "lpips",
                "gen_time",
            ], extrasaction="ignore")
            w.writeheader()
            w.writerows(rows)
        print(f"baseline CSV: {csv_path}")
    return summary


if __name__ == "__main__":
    main()
