"""Sweep runner: YAML config -> sequential/queued local runs.

Replaces the reference's SLURM fleet (sweep_experiment/scripts/
run_sweep.py + run_sweep.sbatch, SURVEY.md §2.5): same YAML schema
{method, series, series_name, description, fixed:{...}, sweep:[{run_id,
overrides...}]}, but rows dispatch to the unified runner in-process (or
as subprocesses) instead of sbatch — one TPU host replaces the job
array; the env-var indirection layer disappears (config keys map
straight to runner flags).

Also keeps the reference's ops affordances: --dry-run, --run-ids
filtering, per-method wall-time estimates, resume (a completed
summary.json skips the row — the analogue of SLURM requeue + per-video
checkpointing).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Any, Dict, List, Optional

import yaml

# config key -> runner flag (analogue of _KEY_TO_ENV, run_sweep.py:51-136)
_KEY_TO_FLAG = {
    "lr": "--lr",
    "steps": "--steps",
    "optimizer": "--optimizer",
    "num_cond_frames": "--num-cond-frames",
    "num_frames": "--num-frames",
    "gen_start_frame": "--gen-start-frame",
    "tta_total_frames": "--tta-total-frames",
    "tta_context_frames": "--tta-context-frames",
    "num_inference_steps": "--num-inference-steps",
    "guidance_scale": "--guidance-scale",
    "max_videos": "--max-videos",
    "seed": "--seed",
    "height": "--height",
    "width": "--width",
    "preset": "--preset",
    "checkpoint_dir": "--checkpoint-dir",
    "synthetic": "--synthetic",
    "lora_rank": "--lora-rank",
    "lora_alpha": "--lora-alpha",
    "lora_target_modules": "--lora-target-modules",
    "num_groups": "--num-groups",
    "delta_target": "--delta-target",
    "delta_dim": "--delta-dim",
    "target_blocks": "--target-blocks",
    "norm_target": "--norm-target",
    "film_mode": "--film-mode",
    "es_check_every": "--es-check-every",
    "es_patience": "--es-patience",
    "es_anchor_sigmas": "--es-anchor-sigmas",
    "es_noise_draws": "--es-noise-draws",
    "es_strategy": "--es-strategy",
    "es_holdout_fraction": "--es-holdout-fraction",
    "caption_guard_mode": "--caption-guard-mode",
    "fixed_caption": "--fixed-caption",
    "feature_frame_guard_mode": "--feature-frame-guard-mode",
    "clip_gate_threshold": "--clip-gate-threshold",
    "clip_gate_backend": "--clip-gate-backend",
    "clip_gate_sample_frames": "--clip-gate-sample-frames",
    "clip_gate_late_fraction": "--clip-gate-late-fraction",
    "clip_gate_aggregate": "--clip-gate-aggregate",
    "batch_videos": "--batch-videos",
    "retrieval_pool_dir": "--retrieval-pool-dir",
    "attn_impl": "--attn-impl",
    "warmup_steps": "--warmup-steps",
    "weight_decay": "--weight-decay",
    "max_grad_norm": "--max-grad-norm",
    "batch_method": "--batch-method",
}
# booleans: flag set iff true (reference convention, run_sweep.py:201-205)
_BOOL_FLAGS = {
    "es_disable": "--es-disable",
    "aug_enabled": "--aug-enabled",
    "aug_hflip": "--aug-hflip",
    "clip_gate_enabled": "--clip-gate-enabled",
    "clip_gate_log_only": "--clip-gate-log-only",
    "skip_generation": "--skip-generation",
    "no_save_videos": "--no-save-videos",
    "no_kv_cache": "--no-kv-cache",
    "lora_target_ffn": "--lora-target-ffn",
    "fvd_enabled": "--fvd-enabled",
    "also_tune_delta": "--also-tune-delta",
    "use_builtin_lora": "--use-builtin-lora",
}


def load_config(path: str) -> Dict[str, Any]:
    """Validate {method, series, fixed, sweep} (run_sweep.py:150-166)."""
    with open(path) as f:
        cfg = yaml.safe_load(f)
    for key in ("method", "series", "sweep"):
        if key not in cfg:
            raise ValueError(f"sweep config missing required key '{key}'")
    if not isinstance(cfg["sweep"], list) or not cfg["sweep"]:
        raise ValueError("sweep must be a non-empty list of rows")
    for row in cfg["sweep"]:
        if "run_id" not in row:
            raise ValueError(f"sweep row missing run_id: {row}")
    cfg.setdefault("fixed", {})
    return cfg


def build_argv(method: str, params: Dict[str, Any], output_dir: str,
               data_dir: Optional[str]) -> List[str]:
    argv = ["--method", method, "--output-dir", output_dir]
    if data_dir:
        argv += ["--data-dir", data_dir]
    for key, val in params.items():
        if key in _BOOL_FLAGS:
            if val:
                argv.append(_BOOL_FLAGS[key])
        elif key in _KEY_TO_FLAG:
            if val is not None:
                argv += [_KEY_TO_FLAG[key], str(val)]
        elif key in ("data_dir", "run_id"):
            pass
        else:
            raise ValueError(f"unknown sweep config key '{key}'")
    return argv


def estimate_minutes(method: str, params: Dict[str, Any]) -> float:
    """Wall-time heuristic per row (the reference's SLURM --time logic,
    run_sweep.py:259-339, rescaled to measured v5e timings)."""
    n = int(params.get("max_videos", 100))
    steps = int(params.get("steps", 20))
    infer = int(params.get("num_inference_steps", 50))
    per_step_s = {"full": 2.5, "lora": 1.0, "norm_tune": 1.5}.get(method, 0.5)
    gen_s = infer * 1.8
    return n * (steps * per_step_s + gen_s) / 60.0


def run_sweep(config_path: str, output_base: str,
              data_dir: Optional[str] = None,
              run_ids: Optional[List[str]] = None,
              dry_run: bool = False,
              subprocess_mode: bool = False) -> List[Dict[str, Any]]:
    cfg = load_config(config_path)
    method = cfg["method"]
    series = cfg.get("series_name") or cfg["series"]
    rows = cfg["sweep"]
    if run_ids:
        rows = [r for r in rows if str(r["run_id"]) in set(run_ids)]

    launched = []
    for row in rows:
        run_id = str(row["run_id"])
        params = dict(cfg["fixed"])
        params.update({k: v for k, v in row.items() if k != "run_id"})
        out_dir = os.path.join(output_base, series, run_id)
        argv = build_argv(method, params, out_dir,
                          params.get("data_dir", data_dir))
        est = estimate_minutes(method, params)
        info = {"run_id": run_id, "series": series, "method": method,
                "output_dir": out_dir, "argv": argv,
                "estimated_minutes": round(est, 1)}
        if os.path.exists(os.path.join(out_dir, "summary.json")):
            info["status"] = "skipped (summary.json exists)"
            launched.append(info)
            print(f"[sweep] {run_id}: already complete, skipping")
            continue
        if dry_run:
            info["status"] = "dry-run"
            launched.append(info)
            print(f"[sweep] DRY {run_id} (~{est:.0f} min): "
                  f"run_tta {' '.join(argv)}")
            continue
        print(f"[sweep] RUN {run_id} (~{est:.0f} min)")
        t0 = time.time()
        if subprocess_mode:
            import subprocess
            import sys

            r = subprocess.run(
                [sys.executable, "-m",
                 "longcat_video_tta_tpu.runners.run_tta", *argv])
            info["returncode"] = r.returncode
            info["status"] = "ok" if r.returncode == 0 else "failed"
        else:
            from ..runners.run_tta import main as run_main

            try:
                run_main(argv)
                info["status"] = "ok"
            except Exception as e:
                info["status"] = f"failed: {type(e).__name__}: {e}"
        info["wall_minutes"] = round((time.time() - t0) / 60.0, 2)
        launched.append(info)

    os.makedirs(output_base, exist_ok=True)
    with open(os.path.join(output_base, f"sweep_{series}.json"), "w") as f:
        json.dump(launched, f, indent=2)
    return launched


def main(argv=None):
    p = argparse.ArgumentParser(description="YAML sweep runner")
    p.add_argument("config")
    p.add_argument("--output-base", default="results")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--run-ids", default=None,
                   help="comma-separated run_id filter")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--subprocess", action="store_true",
                   help="isolate each row in its own process")
    args = p.parse_args(argv)
    run_ids = args.run_ids.split(",") if args.run_ids else None
    return run_sweep(args.config, args.output_base, args.data_dir, run_ids,
                     args.dry_run, args.subprocess)


if __name__ == "__main__":
    main()
