#!/usr/bin/env python3
"""In-process TTA hyperparameter probe (round 5).

Round 4/5 campaign rows kept landing below NOTTA (dPSNR < 0 at
delta_a lr 5e-3 / 20 steps). Before spending wall-clock on full
100-video rows, sweep a small method x lr x steps grid on the first
K distribution-B videos and compare per-video PSNR against the
committed NOTTA row (campaign/demo/campaign_demo/NOTTA/summary.json,
paired by video name). In-process so JAX init + jit memoization are
paid once.

Usage:
    python scripts/probe_tta_grid.py [--n 6] [--out campaign/probe]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = [
    "--preset", "longcat_demo", "--checkpoint-dir", "campaign/demo_ckpt",
    "--data-dir", "campaign/demo/data_b", "--caption-guard-mode", "off",
    "--height", "192", "--width", "320", "--num-cond-frames", "14",
    "--num-frames", "28", "--gen-start-frame", "32",
    "--num-inference-steps", "50", "--guidance-scale", "1.0",
    "--tta-total-frames", "29", "--seed", "42",
    "--compile-cache-dir", "/tmp/longcat_demo_cache",
]

# (tag, method, lr, steps)
GRID = [
    ("full_lr1e-4_s40", "full", 1e-4, 40),
    ("full_lr3e-4_s40", "full", 3e-4, 40),
    ("delta_a_lr1e-3_s40", "delta_a", 1e-3, 40),
    ("lora_lr1e-3_s40", "lora", 1e-3, 40),
]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=6)
    p.add_argument("--out", default="campaign/probe")
    p.add_argument("--grid", default=None,
                   help="comma list of tag filters (substring match)")
    p.add_argument("--baseline",
                   default="campaign/probe/NOTTA_REPRO/summary.json",
                   help="NOTTA summary measured under the CURRENT "
                        "weights (post-rebuild weights drift ~0.1 dB "
                        "from the committed row, so pair against a "
                        "fresh baseline)")
    args = p.parse_args(argv)

    from longcat_video_tta_tpu.runners.run_tta import main as run_main

    notta = json.load(open(args.baseline))
    base_psnr = {r["video"]: r["psnr"] for r in notta["results"]}

    grid = GRID
    if args.grid:
        keys = args.grid.split(",")
        grid = [g for g in GRID if any(k in g[0] for k in keys)]

    report = []
    for tag, method, lr, steps in grid:
        out_dir = os.path.join(args.out, tag)
        argv_run = BASE + [
            "--method", method, "--lr", str(lr), "--steps", str(steps),
            "--es-disable", "--max-videos", str(args.n),
            "--output-dir", out_dir,
        ]
        print(f"[probe] {tag} ...", flush=True)
        try:
            run_main(argv_run)
        except SystemExit as e:
            if e.code not in (0, None):
                print(f"[probe] {tag} FAILED rc={e.code}", flush=True)
                continue
        s = json.load(open(os.path.join(out_dir, "summary.json")))
        diffs = [(r["video"], r["psnr"] - base_psnr[r["video"]])
                 for r in s["results"] if r["video"] in base_psnr]
        mean_d = sum(d for _, d in diffs) / max(len(diffs), 1)
        wins = sum(d > 0 for _, d in diffs)
        row = {"tag": tag, "method": method, "lr": lr, "steps": steps,
               "n": len(diffs), "mean_dpsnr": round(mean_d, 4),
               "wins": wins,
               "train_s": round(s["avg_train_time"], 2)}
        print(f"[probe] {tag}: dPSNR={mean_d:+.4f} wins={wins}/{len(diffs)}",
              flush=True)
        report.append(row)

    report.sort(key=lambda r: -r["mean_dpsnr"])
    with open(os.path.join(args.out, "grid_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
