#!/usr/bin/env python3
"""Distribution-shift science campaign (VERDICT r4 #3/#4).

Protocol:
  1. Synthetic-weight metric towers (scripts/make_synth_towers.py) so
     LPIPS / online FVD+FID / CLIP gate / native VBench (all 5 dims,
     incl. the new MUSIQ imaging_quality) are ALIVE in every row.
  2. Pretrained demo stack (scripts/pretrain_demo.py, distribution A).
  3. Eval dataset B: fast REVERSED motion — shifted from A, so the
     pretrained model continues wrongly zero-shot and TTA has signal.
     Plus an A-eval set for the in-distribution control row.
  4. Rows from configs/campaign_demo_*.yaml through sweep/run_sweep.py:
     NOTTA baseline, 7 TTA methods, ES-on/off ablation pair, batch-K5,
     in-dist control, SAVi-DNO (faithful hyperparameters).
  5. Matrix check -> export (+NOTTA baseline matching) -> compare ->
     loss curves -> figures -> timing table.

Reference analogue: the 228-run sweep fleet + Panda->UCF cross-dataset
rows (summary_printout.txt:18-118, 861-885, 901).

Usage:
    python scripts/run_demo_campaign.py --output-base campaign/demo \
        [--rows baseline,delta_a,...] [--max-videos N] [--pretrain]
        [--smoke]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# priority order: baseline first (export needs it for matching), then
# the headline methods, then the long tail
ROWS = ("baseline", "delta_a", "full", "lora", "delta_b", "norm_tune",
        "delta_c", "film", "dno")

# Distribution B (eval): fast reversed motion vs DIST_A in
# pretrain_demo.py (speed 0.02-0.05, +x)
DIST_B = {"speed_range": (0.09, 0.16), "freq_range": (2.0, 5.0),
          "direction": -1.0}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output-base", default="campaign/demo")
    p.add_argument("--rows", default=",".join(ROWS))
    p.add_argument("--max-videos", type=int, default=0)
    p.add_argument("--towers-dir", default="campaign/towers")
    p.add_argument("--ckpt-dir", default="campaign/demo_ckpt")
    p.add_argument("--pretrain", action="store_true",
                   help="run scripts/pretrain_demo.py first if the "
                        "checkpoint dir is missing")
    p.add_argument("--smoke", action="store_true",
                   help="tiny-preset CPU smoke of the whole protocol")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args(argv)

    from longcat_video_tta_tpu.runners.run_tta import make_synthetic_dataset
    from longcat_video_tta_tpu.sweep.run_sweep import run_sweep

    os.makedirs(args.output_base, exist_ok=True)
    rows = [r for r in args.rows.split(",") if r]
    unknown = set(rows) - set(ROWS)
    if unknown:
        raise SystemExit(f"unknown rows: {sorted(unknown)}")

    # ---- towers ------------------------------------------------------
    if not os.path.exists(os.path.join(args.towers_dir, "lpips_alex.pth")):
        print(f"[demo] generating synthetic towers -> {args.towers_dir}")
        from make_synth_towers import main as towers_main

        towers_main(["--out-dir", args.towers_dir])

    # ---- pretrained checkpoint ----------------------------------------
    if not os.path.exists(os.path.join(args.ckpt_dir, "model_config.json")):
        if not args.pretrain:
            raise SystemExit(
                f"no pretrained bundle at {args.ckpt_dir} — run "
                "scripts/pretrain_demo.py first (or pass --pretrain)")
        from pretrain_demo import main as pretrain_main

        pargs = ["--out-dir", args.ckpt_dir]
        if args.smoke:
            pargs.append("--smoke")
        pretrain_main(pargs)

    # ---- datasets ------------------------------------------------------
    n_videos = args.max_videos or 100
    h, w = (16, 32) if args.smoke else (192, 320)
    data_b = os.path.join(args.output_base, "data_b")
    data_a = os.path.join(args.output_base, "data_a")
    if not os.path.exists(os.path.join(data_b, "metadata.csv")):
        print(f"[demo] generating {n_videos} distribution-B clips")
        make_synthetic_dataset(data_b, n_videos, h, w, seed=11, **DIST_B)
    if not os.path.exists(os.path.join(data_a, "metadata.csv")):
        from pretrain_demo import DIST_A

        print(f"[demo] generating {n_videos} distribution-A eval clips")
        # seed differs from pretraining's RandomState stream: these
        # clips are a held-out sample of A, not the training data
        make_synthetic_dataset(data_a, n_videos, h, w, seed=13, **DIST_A)

    smoke_fixed = {
        "preset": "longcat_tiny", "checkpoint_dir": args.ckpt_dir,
        "height": 16, "width": 32,
        "num_cond_frames": 5, "num_frames": 5, "gen_start_frame": 16,
        "tta_total_frames": 13, "steps": 2, "num_inference_steps": 2,
        "attn_impl": "xla", "es_check_every": 1, "es_noise_draws": 1,
        "es_anchor_sigmas": "0.5", "compile_cache_dir": None,
        "compute_vbench": False, "guidance_scale": 1.0,
    }

    t0 = time.time()
    launched = []
    configs = []
    for row in rows:
        import yaml

        cfg_path = os.path.join(REPO, "configs",
                                f"campaign_demo_{row}.yaml")
        with open(cfg_path) as f:
            cfg = yaml.safe_load(
                f.read().replace("__DATA_B__", data_b)
                        .replace("__DATA_A__", data_a))
        cfg["fixed"]["checkpoint_dir"] = args.ckpt_dir
        cfg["fixed"]["vbench_towers_dir"] = args.towers_dir
        for key in ("lpips_model_path", "clip_gate_model_path",
                    "i3d_model_path", "inception_model_path"):
            base = os.path.basename(str(cfg["fixed"].get(key, "")))
            if base:
                cfg["fixed"][key] = os.path.join(
                    args.towers_dir, base if "." in base else base)
        if args.max_videos:
            cfg["fixed"]["max_videos"] = args.max_videos
            for r in cfg["sweep"]:
                r.pop("max_videos", None)
        if args.smoke:
            cfg["fixed"].update(smoke_fixed)
            cfg["fixed"] = {k: v for k, v in cfg["fixed"].items()
                            if v not in (None, False) or k == "max_videos"}
            # batch-K retrieval needs >= K pool entries; keep the smoke tiny
            cfg["sweep"] = [r for r in cfg["sweep"]
                            if r.get("batch_videos", 1) <= n_videos]
        out_cfg = os.path.join(args.output_base, f"_{row}.yaml")
        with open(out_cfg, "w") as f:
            yaml.safe_dump(cfg, f)
        configs.append(out_cfg)
        print(f"[demo] row {row}: {out_cfg}")
        launched += run_sweep(out_cfg, args.output_base,
                              data_dir=data_b, dry_run=args.dry_run)
    if args.dry_run:
        print(json.dumps(launched, indent=2, default=str))
        return 0

    # fail-loud: a campaign where rows died at preflight/launch must not
    # exit 0 with an empty aggregation (round-5 postmortem: a stale
    # --preset choices list preflight-failed all 12 rows and the driver
    # still reported "done in 0.0 min")
    ok_statuses = ("ok", "drained", "skipped (summary.json exists)")
    bad = [r for r in launched if r.get("status") not in ok_statuses]
    if bad:
        for r in bad:
            print(f"[demo] ROW FAILED {r.get('run_id')}: "
                  f"{r.get('status')}", file=sys.stderr)
    if not any(r.get("status") in ok_statuses for r in launched):
        print("[demo] no row completed — aborting before aggregation",
              file=sys.stderr)
        return 1

    # ---- completeness + aggregation + figures -------------------------
    from run_campaign import timing_table

    from longcat_video_tta_tpu.sweep import (
        export_loss_curves, export_results, figures,
    )
    from longcat_video_tta_tpu.sweep.diagnostics import (
        check_expected_matrix)

    series_dir = os.path.join(args.output_base, "campaign_demo")
    base_dir = os.path.join(series_dir, "NOTTA")
    check_expected_matrix(
        configs, args.output_base,
        baseline_dir=base_dir if os.path.exists(base_dir) else None,
        report_path=os.path.join(args.output_base, "matrix_report.txt"))

    all_results = os.path.join(args.output_base, "all_results.json")
    export_results.main(["--results-roots", args.output_base,
                         "--output", all_results])
    if os.path.exists(os.path.join(base_dir, "summary.json")):
        import glob as _glob

        rows_dirs = [f"NOTTA={base_dir}"]
        for sp in sorted(_glob.glob(os.path.join(
                series_dir, "*", "summary.json"))):
            d = os.path.dirname(sp)
            if d != base_dir:
                rows_dirs.append(f"{os.path.basename(d)}={d}")
        export_results.main(
            ["--compare", *rows_dirs, "--compare-output-dir",
             os.path.join(args.output_base, "compare")])
    curves = os.path.join(args.output_base, "loss_curves.json")
    export_loss_curves.main(["--results-roots", args.output_base,
                             "--output", curves])
    figures.main(["--all-results", all_results, "--loss-curves", curves,
                  "--output-dir", os.path.join(args.output_base,
                                               "figures")])

    # CLIP-gate calibration over the headline row's per-video scores
    # (reference: analyze_clip_gate_calibration.py — threshold
    # simulation vs the baseline-matched metric)
    delta_dir = os.path.join(series_dir, "DELTA_A")
    if (os.path.exists(os.path.join(delta_dir, "summary.json"))
            and os.path.exists(os.path.join(base_dir, "summary.json"))):
        from longcat_video_tta_tpu.sweep.diagnostics import (
            clip_gate_calibration)

        cal = clip_gate_calibration(delta_dir, base_dir)
        with open(os.path.join(args.output_base,
                               "clip_gate_calibration.json"), "w") as f:
            json.dump(cal, f, indent=2)

    table = timing_table(args.output_base, series="campaign_demo")
    with open(os.path.join(args.output_base, "timing_table.md"), "w") as f:
        f.write(table + "\n")
    print(table)
    print(f"[demo] done in {(time.time() - t0) / 60:.1f} min -> "
          f"{args.output_base}"
          + (f" ({len(bad)} row(s) FAILED)" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
