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
    # decode-lever flags (round 2)
    "bsa_keep_ratio": "--bsa-keep-ratio",
    "quantize_decode": "--quantize-decode",
    "remat_policy": "--remat-policy",
    "compile_cache_dir": "--compile-cache-dir",
    "cfg_reuse_every": "--cfg-reuse-every",
    "cfg_reuse_start_frac": "--cfg-reuse-start-frac",
    "cfg_reuse_end_frac": "--cfg-reuse-end-frac",
    "loss_fetch_every": "--loss-fetch-every",
    # round-3 levers
    "video_parallel": "--video-parallel",
    "data_mesh": "--data-mesh",
    "context_mesh": "--context-mesh",
    "tensor_mesh": "--tensor-mesh",
    "lpips_model_path": "--lpips-model-path",
    "clip_gate_scorer": "--clip-gate-scorer",
    "clip_gate_sampling_mode": "--clip-gate-sampling-mode",
    "clip_gate_model_path": "--clip-gate-model-path",
    "aug_rotate_degrees": "--aug-rotate-degrees",
    "aug_speed_factors": "--aug-speed-factors",
    "gen_segment_steps": "--gen-segment-steps",
    "pab_every": "--pab-every",
    "pab_start_frac": "--pab-start-frac",
    "pab_end_frac": "--pab-end-frac",
    "load_fps": "--load-fps",
    "fast_decode_verify": "--fast-decode-verify",
    "dno_sampler_steps": "--dno-sampler-steps",
    "dno_interp_p": "--dno-interp-p",
    "dno_interp_every": "--dno-interp-every",
    "retrieval_sbert_path": "--retrieval-sbert-path",
    "i3d_model_path": "--i3d-model-path",
    "inception_model_path": "--inception-model-path",
    "vbench_towers_dir": "--vbench-towers-dir",
    "min_fvd_videos": "--min-fvd-videos",
    "caption_guard_topk": "--caption-guard-topk",
    "caption_guard_min_nonempty_ratio":
        "--caption-guard-min-nonempty-ratio",
    "caption_guard_min_unique_ratio": "--caption-guard-min-unique-ratio",
    "caption_guard_max_top1_ratio": "--caption-guard-max-top1-ratio",
    "caption_guard_max_generic_top1_ratio":
        "--caption-guard-max-generic-top1-ratio",
}

# Reference YAML key names accepted verbatim (run_sweep.py:51-136) so a
# FifthEpoch/longcat-video-tta sweep config drops in unchanged; each
# maps onto the unified driver's flag names.
_REF_ALIASES = {
    "learning_rate": "lr", "num_steps": "steps",
    "delta_lr": "lr", "delta_steps": "steps",
    "film_lr": "lr", "film_steps": "steps",
    "norm_lr": "lr", "norm_steps": "steps",
    "target_modules": "lora_target_modules",
    "lora_target_blocks": "target_blocks",
    "delta_target_blocks": "target_blocks",
    "target_ffn": "lora_target_ffn",
    "clip_gate_aggregation": "clip_gate_aggregate",
    "clip_gate_model": "clip_gate_model_path",
    "compute_fvd": "fvd_enabled",
}
# booleans: flag set iff true (reference convention, run_sweep.py:201-205)
_BOOL_FLAGS = {
    "es_disable": "--es-disable",
    "aug_enabled": "--aug-enabled",
    "aug_hflip": "--aug-hflip",
    "clip_gate_enabled": "--clip-gate-enabled",
    "clip_gate_log_only": "--clip-gate-log-only",
    "clip_gate_hash_tokenizer": "--clip-gate-hash-tokenizer",
    "skip_generation": "--skip-generation",
    "no_save_videos": "--no-save-videos",
    "no_kv_cache": "--no-kv-cache",
    "lora_target_ffn": "--lora-target-ffn",
    "fvd_enabled": "--fvd-enabled",
    "also_tune_delta": "--also-tune-delta",
    "use_builtin_lora": "--use-builtin-lora",
    "bucket_gen": "--bucket-gen",
    "native_prefetch": "--native-prefetch",
    "debug_nans": "--debug-nans",
    "clip_gate_fail_closed": "--clip-gate-fail-closed",
    "bucket_shapes": "--bucket-shapes",
    "save_adapters": "--save-adapters",
    "compute_vbench": "--compute-vbench",
    "fast_decode": "--fast-decode",
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
        key = _REF_ALIASES.get(key, key)
        if key == "resolution":
            # reference: "480p" (832x480 bucket, resize_videos.py:24-39)
            if str(val) not in ("480p", "480"):
                raise ValueError(
                    f"unsupported resolution '{val}' (use height/width)")
            argv += ["--height", "480", "--width", "832"]
        elif key == "clip_gate_late_only":
            if val:
                argv += ["--clip-gate-sampling-mode", "late_only"]
        elif key == "clip_gate_fail_open":
            # ours defaults to fail-open; the inverse flag closes it
            if not val:
                argv.append("--clip-gate-fail-closed")
        elif key == "delta_mode":
            # the reference's delta_c has a single mode; ours is
            # per-channel by construction (run_delta_c.py:82-246)
            if str(val) != "per_channel":
                raise ValueError(f"unknown delta_mode '{val}'")
        elif key == "compute_fid":
            # FID enables via inception_model_path here; key accepted
            # for reference-YAML compat
            print("[sweep] note: 'compute_fid' is driven by "
                  "inception_model_path here; key accepted for "
                  "reference-YAML compat")
        elif key in _BOOL_FLAGS:
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
    """Wall-time heuristic per row, mirroring the reference's per-method
    SLURM --time model (run_sweep.py:259-339: method base cost, ES and
    CLIP-gate adders, extended-window factor) rescaled to measured v5e
    per-step timings instead of H200 job-hours.

    Components per video:
      train  = steps x per-method step cost x window factor
      ES     = (steps / check_every) anchor evals (sigmas x draws fwds),
               folded into the train dispatch but still real FLOPs
      gate   = CLIP-gate decode+score when enabled
      gen    = inference steps x per-CFG-step decode cost
    """
    n = int(params.get("max_videos", 100))
    steps = int(params.get("steps", 20))
    infer = int(params.get("num_inference_steps", 50))
    cond = int(params.get("num_cond_frames", 14))
    tta_total = int(params.get("tta_total_frames") or cond)
    # window factor: tokens scale ~linearly in TTA frames vs the
    # canonical 32-frame window (reference extended_factor, :303)
    wf = max(1.0, tta_total / 32.0)

    # dno backprops through a K-step sampler scan, so a step costs
    # roughly K adapter steps (K = dno_sampler_steps, default 4)
    per_step_s = {"full": 2.5, "lora": 1.0, "norm_tune": 1.5,
                  "film": 0.7, "delta_b": 0.5, "delta_c": 0.45,
                  "dno": 0.5 * int(params.get("dno_sampler_steps", 4)),
                  }.get(method, 0.5) * wf
    train_s = steps * per_step_s

    es_s = 0.0
    # dno has no adapter snapshots -> the driver force-disables ES
    if method != "dno" and not params.get("es_disable", False):
        check_every = int(params.get("es_check_every", 5))
        sig = str(params.get("es_anchor_sigmas", "0.25,0.5,0.75"))
        draws = int(params.get("es_noise_draws", 2))
        n_anchor_fwd = len(sig.split(",")) * draws
        # anchor fwd ~ 1/3 of a train step (no bwd)
        es_s = (steps / max(1, check_every)) * n_anchor_fwd             * per_step_s / 3.0

    gate_s = 4.0 if params.get("clip_gate_enabled", False) else 0.0
    gen_s = infer * 1.8
    # decode levers (measured v5e ratios, ARCHITECTURE.md): BSA 1.37x,
    # int8+BSA 1.53x, int8 alone 1.08x
    bsa = float(params.get("bsa_keep_ratio", 0) or 0) > 0
    int8 = params.get("quantize_decode") == "int8"
    if bsa and int8:
        gen_s /= 1.53
    elif bsa:
        gen_s /= 1.37
    elif int8:
        gen_s /= 1.08
    return n * (train_s + es_s + gate_s + gen_s) / 60.0


def estimate_memory_gb(method: str, params: Dict[str, Any],
                       model_gb: float = 27.2) -> Dict[str, float]:
    """Device HBM + host RSS estimate per row (the reference's --mem
    heuristic, run_sweep.py:342-351: 256G full/lora, 192G others — here
    derived from what actually holds the memory).

    device: params + grads/optimizer for the trainable set + remat
    activations; host: the full-TTA base-state snapshot analogue (we
    keep the frozen base on device, so host stays small)."""
    steps_state = {"full": 3.0, "lora": 0.02}.get(method, 0.001)
    device = model_gb * (1.0 + steps_state) + 6.0  # + activations/caches
    host = 8.0 if method != "full" else 16.0
    return {"device_hbm_gb": round(device, 1), "host_gb": host}


def _execute_row(info: Dict[str, Any], argv: List[str],
                 subprocess_mode: bool, max_retries: int,
                 extra_env: Optional[Dict[str, str]] = None) -> None:
    """Run one sweep row (with requeue-on-failure), mutating ``info``."""
    t0 = time.time()
    for attempt in range(max_retries + 1):
        if subprocess_mode or extra_env:
            import subprocess
            import sys

            env = {**os.environ, **extra_env} if extra_env else None
            r = subprocess.run(
                [sys.executable, "-m",
                 "longcat_video_tta_tpu.runners.run_tta", *argv], env=env)
            info["returncode"] = r.returncode
            # the runner writes an explicit DRAINED sentinel on a
            # stop-file drain (checkpoint left for resume) — other
            # exit-0-without-summary paths (e.g. --preflight-only)
            # must not be misread as drained
            if r.returncode == 0 and os.path.exists(
                    os.path.join(info["output_dir"], "DRAINED")):
                info["status"] = "drained"
            else:
                info["status"] = "ok" if r.returncode == 0 else "failed"
        else:
            from ..runners.run_tta import main as run_main

            try:
                out = run_main(argv)
                info["status"] = ("drained" if isinstance(out, dict)
                                  and out.get("drained") else "ok")
            except Exception as e:
                import traceback

                info["status"] = f"failed: {type(e).__name__}: {e}"
                # fail LOUD in the sweep log: a swallowed startup error
                # (bad frame window, missing path) otherwise reads as a
                # silently-skipped row (round-4 campaign postmortem)
                print(f"[sweep] {info['run_id']} FAILED: "
                      f"{type(e).__name__}: {e}")
                traceback.print_exc()
        if info["status"] in ("ok", "drained"):
            break
        if attempt < max_retries:
            print(f"[sweep] {info['run_id']} failed; requeue "
                  f"{attempt + 1}/{max_retries} (resumes from "
                  f"checkpoint.json)")
            info["retries"] = attempt + 1
    info["wall_minutes"] = round((time.time() - t0) / 60.0, 2)


def run_sweep(config_path: str, output_base: str,
              data_dir: Optional[str] = None,
              run_ids: Optional[List[str]] = None,
              dry_run: bool = False,
              subprocess_mode: bool = False,
              max_retries: int = 0,
              jobs: int = 1,
              device_pool: Optional[List[str]] = None
              ) -> List[Dict[str, Any]]:
    """``max_retries``: re-dispatch failed rows up to N times — the local
    analogue of SLURM preempt+requeue (run_sweep.sbatch:11-12); each
    retry resumes from the row's checkpoint.json via the runner's
    per-video resume.

    ``jobs`` > 1: run up to N rows concurrently, each in its own
    subprocess — the pod-host analogue of the reference's one-SLURM-job-
    per-row fleet (run_sweep.py:405-440). ``device_pool`` pins each
    concurrent slot to its own chip via TPU_VISIBLE_DEVICES (e.g.
    ["0","1","2","3"] on a v5e-4 host); without it the processes share
    the default device set. Intra-process DP over videos is the
    runner's own --video-parallel."""
    cfg = load_config(config_path)
    method = cfg["method"]
    series = cfg.get("series_name") or cfg["series"]
    rows = cfg["sweep"]
    if run_ids:
        rows = [r for r in rows if str(r["run_id"]) in set(run_ids)]

    launched = []
    pending = []   # (info, argv) rows that actually execute
    for row in rows:
        run_id = str(row["run_id"])
        params = dict(cfg["fixed"])
        params.update({k: v for k, v in row.items() if k != "run_id"})
        out_dir = os.path.join(output_base, series, run_id)
        argv = build_argv(method, params, out_dir,
                          params.get("data_dir", data_dir))
        # fleet-level graceful drain: launched rows must also see the
        # sweep's stop file (not just their own <out_dir>/STOP), so a
        # STOP dropped in the results root checkpoints RUNNING rows at
        # their next video boundary rather than only skipping pending
        # ones (MIGRATION.md contract)
        argv += ["--stop-file", os.path.join(output_base, "STOP")]
        est = estimate_minutes(method, params)
        info = {"run_id": run_id, "series": series, "method": method,
                "output_dir": out_dir, "argv": argv,
                "estimated_minutes": round(est, 1)}
        launched.append(info)
        if os.path.exists(os.path.join(out_dir, "summary.json")):
            info["status"] = "skipped (summary.json exists)"
            print(f"[sweep] {run_id}: already complete, skipping")
            continue
        if dry_run:
            info["status"] = "dry-run"
            print(f"[sweep] DRY {run_id} (~{est:.0f} min): "
                  f"run_tta {' '.join(argv)}")
            continue
        info["estimated_memory"] = estimate_memory_gb(method, params)
        pending.append((info, argv))

    # Startup-guard preflight for every pending row BEFORE the first
    # slot is spent: --preflight-only runs the runner's fail-loud gates
    # (frame window / ES budget, data dir, caption guard, decode-lever
    # combos) without model init. A row that would die at startup is
    # reported and dropped here in seconds instead of surfacing as an
    # empty output dir hours into the fleet (round-4 postmortem).
    # Synthetic rows are exempt (preflight would regenerate the data).
    if pending and not dry_run and not subprocess_mode:
        from ..runners.run_tta import main as run_main

        healthy = []
        for info, argv in pending:
            if "--synthetic" in argv:
                healthy.append((info, argv))
                continue
            try:
                run_main(argv + ["--preflight-only"])
            except (Exception, SystemExit) as e:
                info["status"] = (f"preflight-failed: "
                                  f"{type(e).__name__}: {e}")
                print(f"[sweep] {info['run_id']} PREFLIGHT FAILED: {e}")
                continue
            healthy.append((info, argv))
        pending = healthy

    def _fleet_stop_file() -> Optional[str]:
        for c in (os.environ.get("LONGCAT_STOP_FILE"),
                  os.path.join(output_base, "STOP")):
            if c and os.path.exists(c):
                return c
        return None

    if jobs <= 1:
        for info, argv in pending:
            sf = _fleet_stop_file()
            if sf:
                info["status"] = "drained (not launched)"
                print(f"[sweep] {info['run_id']}: stop file {sf} "
                      f"present, not launching")
                continue
            print(f"[sweep] RUN {info['run_id']} "
                  f"(~{info['estimated_minutes']:.0f} min)")
            _execute_row(info, argv, subprocess_mode, max_retries)
    elif pending:
        # concurrent rows, each its own subprocess; a chip from the
        # pool travels with the worker slot, not the row
        import queue
        from concurrent.futures import ThreadPoolExecutor

        devq: "queue.Queue[Optional[str]]" = queue.Queue()
        for i in range(jobs):
            devq.put(device_pool[i % len(device_pool)]
                     if device_pool else None)

        def worker(item):
            info, argv = item
            sf = _fleet_stop_file()
            if sf:
                info["status"] = "drained (not launched)"
                print(f"[sweep] {info['run_id']}: stop file {sf} "
                      f"present, not launching")
                return
            dev = devq.get()
            try:
                env = {"TPU_VISIBLE_DEVICES": dev} if dev else {}
                info["device"] = dev
                print(f"[sweep] RUN {info['run_id']} "
                      f"(~{info['estimated_minutes']:.0f} min"
                      f"{', chip ' + dev if dev else ''})")
                _execute_row(info, argv, True, max_retries,
                             extra_env=env or None)
            finally:
                devq.put(dev)

        with ThreadPoolExecutor(max_workers=jobs) as ex:
            list(ex.map(worker, pending))

    os.makedirs(output_base, exist_ok=True)
    # merge-by-run_id rather than overwrite: several run_sweep calls
    # over the SAME series (scripts/run_campaign.py launches one call
    # per method row) must not clobber each other's launch records
    state_path = os.path.join(output_base, f"sweep_{series}.json")
    merged: Dict[str, Any] = {}
    if os.path.exists(state_path):
        try:
            with open(state_path) as f:
                merged = {r["run_id"]: r for r in json.load(f)}
        except (json.JSONDecodeError, KeyError, TypeError):
            merged = {}
    for r in launched:
        merged[r["run_id"]] = r
    with open(state_path, "w") as f:
        json.dump(list(merged.values()), f, indent=2)
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
    p.add_argument("--max-retries", type=int, default=0,
                   help="requeue failed rows up to N times (the SLURM "
                        "preempt+requeue analogue; rows resume from "
                        "checkpoint.json)")
    p.add_argument("--jobs", type=int, default=1,
                   help="run up to N rows concurrently, each in its own "
                        "subprocess (the pod-host analogue of the "
                        "reference's one-SLURM-job-per-row fleet)")
    p.add_argument("--device-pool", default=None,
                   help="comma-separated chip ids to pin concurrent "
                        "rows to via TPU_VISIBLE_DEVICES, e.g. "
                        "'0,1,2,3' on a v5e-4 host")
    args = p.parse_args(argv)
    run_ids = args.run_ids.split(",") if args.run_ids else None
    pool = args.device_pool.split(",") if args.device_pool else None
    return run_sweep(args.config, args.output_base, args.data_dir, run_ids,
                     args.dry_run, args.subprocess,
                     max_retries=args.max_retries, jobs=args.jobs,
                     device_pool=pool)


if __name__ == "__main__":
    main()
