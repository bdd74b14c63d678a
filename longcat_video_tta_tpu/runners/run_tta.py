"""Unified TTA runner: one driver for all seven methods plus the no-TTA
baseline.

Replaces the reference's eight per-method runner scripts (SURVEY.md
§2.3/2.4; canonical skeleton run_delta_b.py:451-968): parse config ->
frame-window clamps + feature-budget guard -> seed -> resume from
checkpoint.json -> load components -> caption-guarded video list ->
per-video loop {CLIP gate -> decode window -> VAE encode ->
split_tta_latents -> encode prompt -> augment -> fresh adapter ->
optimize (jitted step, grad-clip, ES) -> restore best -> generate_vc
with per-video seed seed+idx -> metrics + FVD -> checkpoint} ->
summary.json.

CLI:
  python -m longcat_video_tta_tpu.runners.run_tta \
      --method delta_a --preset longcat_tiny --synthetic 3 \
      --output-dir /tmp/out
"""

from __future__ import annotations

import argparse
import contextlib
import dataclasses
import json
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native LongCat video TTA")
    p.add_argument("--method", default="delta_a",
                   choices=["none", "full", "lora", "delta_a", "delta_b",
                            "delta_c", "norm_tune", "film", "dno"])
    p.add_argument("--checkpoint-dir", default=None,
                   help="Converted weight dir (orbax); random init if unset")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--output-dir", required=True)
    # choices come from the preset registry so a new preset (e.g.
    # longcat_demo, longcat_bench_3b) is usable the moment it exists —
    # a hand-maintained list silently drifted in round 5
    from ..config import ALL_PRESET_NAMES

    p.add_argument("--preset", default="longcat_13b",
                   choices=sorted(ALL_PRESET_NAMES))
    p.add_argument("--remat-policy", default=None,
                   choices=["full", "dots", "dots_attn"],
                   help="Override the preset's gradient-checkpoint "
                        "policy (ops/layers.py::remat_wrap): 'full' = "
                        "minimum memory; 'dots' saves matmul outputs; "
                        "'dots_attn' also saves the flash-attention "
                        "residuals (fastest, most HBM)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="Generate N synthetic clips instead of --data-dir")
    p.add_argument("--max-videos", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--attn-impl", default=None,
                   choices=[None, "xla", "pallas"])
    # optimization (reference: --delta-steps/--delta-lr etc.)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--loss-fetch-every", type=int, default=0,
                   help="host-sync cadence for the chunked train loop "
                        "(0 = auto: es check_every, or 25 when ES is off)")
    p.add_argument("--bucket-shapes", action="store_true",
                   help="pad target latents to bucket lengths so mixed "
                        "geometries (speed-factor augmentation, in-process "
                        "sweeps) share one compile per bucket")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--optimizer", default="adamw", choices=["adamw", "sgd"])
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--max-grad-norm", type=float, default=1.0)
    # frames (reference: add_tta_frame_args + anchor args)
    p.add_argument("--num-cond-frames", type=int, default=14)
    p.add_argument("--num-frames", type=int, default=28)
    p.add_argument("--gen-start-frame", type=int, default=32)
    p.add_argument("--tta-total-frames", type=int, default=None)
    p.add_argument("--tta-context-frames", type=int, default=None)
    # generation
    p.add_argument("--num-inference-steps", type=int, default=50)
    p.add_argument("--guidance-scale", type=float, default=4.0)
    p.add_argument("--no-kv-cache", action="store_true")
    p.add_argument("--bsa-keep-ratio", type=float, default=0.0,
                   help="block-sparse decode attention: keep this "
                        "fraction of k-blocks per q-block (0 = dense; "
                        "cond cache always exact — ops/bsa.py)")
    p.add_argument("--bucket-gen", action="store_true",
                   help="pad the gen-latent horizon to the bucket ladder "
                        "(one sampler compile per bucket across gen-"
                        "horizon sweeps; composes with --bsa-keep-ratio "
                        "and --quantize-decode)")
    p.add_argument("--quantize-decode", choices=["none", "int8", "int8qk"],
                   default="none",
                   help="W8A8 per-block matmuls in the denoise loop "
                        "(ops/quant.py); 'int8qk' additionally runs "
                        "attention QK^T in int8 with per-token scales "
                        "(LongCat decode; rides the BSA kernel). "
                        "Training stays bf16")
    p.add_argument("--fast-decode", action="store_true",
                   help="enable the measured-recommended decode lever "
                        "stack (ARCHITECTURE.md): int8 W8A8 matmuls + "
                        "BSA (keep 0.35, or 0.15 at horizons >= 16 gen "
                        "latents where the forced-keep floor allows) + "
                        "PAB every-4 wide-range + CFG guidance-delta "
                        "reuse every-2 (range-aligned with PAB) + "
                        "5-step segmented dispatch on long horizons. "
                        "Explicitly-set individual flags win over the "
                        "bundle")
    p.add_argument("--pab-every", type=int, default=0,
                   help="Pyramid Attention Broadcast (arXiv:2408.12588): "
                        "compute decode self-attention only every Nth "
                        "step inside the broadcast range, reusing the "
                        "previous computed step's per-block outputs "
                        "(0 = off; LongCat KV-cache decode; composes "
                        "with int8/BSA/bucketing/segmenting)")
    p.add_argument("--pab-start-frac", type=float, default=0.1,
                   help="broadcast range start as a fraction of steps")
    p.add_argument("--pab-end-frac", type=float, default=0.9,
                   help="broadcast range end as a fraction of steps")
    p.add_argument("--cfg-reuse-every", type=int, default=0,
                   help="CFG guidance-delta reuse (FasterCache, "
                        "arXiv:2410.19355): compute the unconditional "
                        "CFG branch only every Nth step inside the "
                        "reuse range, reconstructing v_uncond = v_cond "
                        "- cached delta on the others (half the model "
                        "FLOPs there). 0 = off; LongCat decode; "
                        "composes with PAB/int8/BSA/bucketing/"
                        "segmenting")
    p.add_argument("--cfg-reuse-start-frac", type=float, default=0.1,
                   help="reuse range start as a fraction of steps")
    p.add_argument("--cfg-reuse-end-frac", type=float, default=0.9,
                   help="reuse range end as a fraction of steps")
    p.add_argument("--gen-segment-steps", type=int, default=0,
                   help="split the denoise loop into N-step dispatches "
                        "(bounds single-execution time for long-horizon "
                        "decode; 0 = one dispatch)")
    p.add_argument("--fast-decode-verify", type=int, default=0,
                   help="fidelity self-check: for the first K videos, "
                        "ALSO generate with every decode lever off "
                        "(dense, same seed/adapters) and record "
                        "fast-vs-dense PSNR + per-metric-vs-GT deltas "
                        "into each result and the summary — so a real-"
                        "weight campaign proves the lever stack is "
                        "metric-neutral instead of extrapolating from "
                        "synthetic-weight correlations (0 = off)")
    p.add_argument("--save-adapters", action="store_true",
                   help="persist each video's trained adapter state "
                        "(orbax) for post-hoc re-evaluation "
                        "(run_eval_adapters)")
    p.add_argument("--skip-generation", action="store_true")
    p.add_argument("--no-save-videos", action="store_true")
    p.add_argument("--stop-file", default=None,
                   help="graceful drain: when this file (default "
                        "<output-dir>/STOP, or $LONGCAT_STOP_FILE) "
                        "exists at a video boundary, checkpoint and "
                        "exit WITHOUT writing summary.json so the row "
                        "resumes from checkpoint.json later — the "
                        "preemption-drain analogue of the reference's "
                        "scancel + SLURM requeue")
    # method knobs
    p.add_argument("--lora-rank", type=int, default=8)
    p.add_argument("--lora-alpha", type=float, default=16.0)
    p.add_argument("--lora-target-modules", default="qkv,proj")
    p.add_argument("--lora-target-ffn", action="store_true")
    p.add_argument("--num-groups", type=int, default=4)
    p.add_argument("--delta-target", default="timestep",
                   choices=["timestep", "hidden"])
    p.add_argument("--delta-dim", type=int, default=None)
    p.add_argument("--target-blocks", default="all")
    p.add_argument("--norm-target", default="cross_attn_norm",
                   choices=["cross_attn_norm", "qk_norm", "all_norm"])
    p.add_argument("--also-tune-delta", action="store_true",
                   help="norm_tune + delta_a combo (run_norm_tune_tta:311)")
    p.add_argument("--use-builtin-lora", action="store_true",
                   help="merged-weight LoRA formulation (W + scale*a@b "
                        "folded into the base kernels, the reference's "
                        "builtin LoRAModule forward patch) instead of "
                        "the low-rank side-branch; results equivalent "
                        "(asserted in tests), costs a weight copy")
    p.add_argument("--film-mode", default="full",
                   choices=["full", "shift_scale", "scale_only"])
    # SAVi-DNO noise optimization (--method dno; comparisons/noise_opt.py
    # — the reference ran this on PVDM, savi_dno.py:1-399; here the
    # differentiable lax.scan sampler runs it on the same backbone).
    # --steps is the per-video noise-opt step count and --lr the Adam lr
    # (paper: 0.01), shared with the adapter methods.
    p.add_argument("--dno-sampler-steps", type=int, default=4,
                   help="K of the differentiable K-step Euler sampler "
                        "backpropped through per DNO step (paper: 10 "
                        "DDIM steps on PVDM; lower K = linearly cheaper)")
    p.add_argument("--dno-interp-p", type=float, default=0.9,
                   help="noise-interpolation regularization p "
                        "(savi_dno.py:119-124); 1.0 disables")
    p.add_argument("--dno-interp-every", type=int, default=5,
                   help="apply the noise interpolation every N opt steps")
    # early stopping (reference: add_early_stopping_args)
    p.add_argument("--es-disable", action="store_true")
    p.add_argument("--es-check-every", type=int, default=5)
    p.add_argument("--es-patience", type=int, default=3)
    p.add_argument("--es-anchor-sigmas", default="0.25,0.5,0.75")
    p.add_argument("--es-noise-draws", type=int, default=2)
    p.add_argument("--es-strategy", default="patience",
                   choices=["patience", "first_rise"])
    p.add_argument("--es-holdout-fraction", type=float, default=0.25)
    # augmentation (reference: add_augmentation_args)
    p.add_argument("--aug-enabled", action="store_true")
    p.add_argument("--aug-hflip", action="store_true")
    p.add_argument("--aug-rotate-degrees", default="")
    p.add_argument("--aug-speed-factors", default="")
    # caption guard / override
    p.add_argument("--caption-guard-topk", type=int, default=5)
    p.add_argument("--caption-guard-min-nonempty-ratio", type=float,
                   default=0.95)
    p.add_argument("--caption-guard-min-unique-ratio", type=float,
                   default=0.10)
    p.add_argument("--caption-guard-max-top1-ratio", type=float,
                   default=0.50)
    p.add_argument("--caption-guard-max-generic-top1-ratio", type=float,
                   default=0.20)
    p.add_argument("--caption-guard-mode", default="fail",
                   choices=["fail", "warn", "off"])
    p.add_argument("--fixed-caption", default=None)
    p.add_argument("--feature-frame-guard-mode", default="fail",
                   choices=["fail", "warn", "off"])
    # clip gate
    p.add_argument("--clip-gate-enabled", action="store_true")
    p.add_argument("--clip-gate-backend", default="clip",
                   choices=["clip", "xclip"])
    p.add_argument("--clip-gate-model-path", default=None)
    p.add_argument("--clip-gate-threshold", type=float, default=0.2)
    p.add_argument("--clip-gate-sample-frames", type=int, default=4)
    p.add_argument("--clip-gate-sampling-mode", default="full_window",
                   choices=["full_window", "late_only"])
    p.add_argument("--clip-gate-late-fraction", type=float, default=0.4)
    p.add_argument("--clip-gate-aggregate", default="mean",
                   choices=["mean", "min", "max"])
    p.add_argument("--clip-gate-log-only", action="store_true")
    p.add_argument("--clip-gate-fail-closed", action="store_true")
    p.add_argument("--clip-gate-scorer", default="jax",
                   choices=["jax", "torch"],
                   help="'jax': convert the checkpoint once and score "
                        "on-TPU (models/clip.py, models/xclip.py); "
                        "'torch': runtime HF scoring (the reference's "
                        "mechanism)")
    p.add_argument("--clip-gate-hash-tokenizer", action="store_true",
                   help="Allow the deterministic hash tokenizer when the "
                        "gate checkpoint dir has no tokenizer files "
                        "(synthetic/test weights only — scores are "
                        "meaningless on real captions)")
    # video-parallel DP (replaces the reference's SLURM-array fleet
    # parallelism, run_sweep.py:405-440, with ONE compiled program:
    # engine.make_batched_train_chunk)
    p.add_argument("--video-parallel", type=int, default=1,
                   help="Train V videos' adapters concurrently (vmapped "
                        "per-video optimizer; generation stays "
                        "per-video). Results match sequential runs.")
    p.add_argument("--data-mesh", type=int, default=0,
                   help="Shard the --video-parallel axis over the first "
                        "N devices as a (data,) jax.sharding.Mesh")
    p.add_argument("--context-mesh", type=int, default=0,
                   help="Ring context parallelism over the mesh "
                        "'context' axis: video tokens shard in BOTH the "
                        "TTA train chunk and the KV-cache decode (Pallas "
                        "ring flash attention, "
                        "parallel/context_attention.py). LongCat only; "
                        "composes with int8/PAB/bucketing/--tensor-mesh "
                        "but NOT --bsa-keep-ratio (block selection is "
                        "chip-local) or --video-parallel")
    p.add_argument("--tensor-mesh", type=int, default=0,
                   help="Megatron-style tensor parallelism: shard the "
                        "DiT weights (qkv/ffn column+row rules, "
                        "parallel/sharding.py) over the mesh 'tensor' "
                        "axis for train AND decode — the flagship "
                        "memory-fit lever (scripts/aot_13b.py TP4). Any "
                        "backbone; composes with --context-mesh "
                        "(TPxCP), int8, PAB; not --video-parallel")
    # batch TTA (reference: --batch-videos/--retrieval-pool-dir)
    p.add_argument("--batch-videos", type=int, default=1)
    p.add_argument("--batch-method", default="similarity",
                   choices=["similarity"])
    p.add_argument("--retrieval-pool-dir", default=None)
    p.add_argument("--retrieval-sbert-path", default=None,
                   help="local all-MiniLM-L6-v2 dir (fetch once with "
                        "scripts/fetch_and_convert_towers.py); absent = "
                        "deterministic hashed-BoW fallback, stamped as "
                        "retrieval_embedder in config.json — fallback "
                        "neighbor quality is NOT semantic-equivalent")
    # online eval
    p.add_argument("--fvd-enabled", action="store_true")
    p.add_argument("--compute-vbench", action="store_true",
                   help="run VBench++ over the saved mp4s at "
                        "finalization (reference finalize_online_eval, "
                        "common.py:2453-2522; uses the external vbench "
                        "package when installed, else the JAX-native "
                        "dimensions in eval/vbench_native.py)")
    p.add_argument("--vbench-towers-dir", default=None,
                   help="dir with dino_vits16.pth / aesthetic_l14.pth + "
                        "clip_l14/ for the native subject_consistency "
                        "and aesthetic_quality dimensions "
                        "(fetch_and_convert_towers.py --only "
                        "dino,aesthetic)")
    p.add_argument("--min-fvd-videos", type=int, default=256,
                   help="small-sample warning threshold for the online "
                        "Frechet accumulator (reference min_videos=256, "
                        "common.py:2141-2431)")
    p.add_argument("--i3d-model-path", default=None)
    p.add_argument("--inception-model-path", default=None,
                   help="torchvision inception_v3 state_dict; enables "
                        "online FID through the JAX InceptionV3 tower "
                        "(reference common.py:2161-2305, compute_fid)")
    p.add_argument("--lpips-model-path", default=None,
                   help="torch state_dict of lpips.LPIPS(net='alex'); "
                        "runs the JAX LPIPS tower per video (reference "
                        "common.py:648-667). Without it lpips=NaN.")
    # observability (reference: manual time.time() spans; SURVEY.md §5
    # prescribes jax.profiler traces + the same structured timing fields)
    p.add_argument("--profile-dir", default=None,
                   help="Write a jax.profiler trace of the first video's "
                        "TTA+generation to this directory")
    p.add_argument("--debug-nans", action="store_true",
                   help="Enable jax debug_nans (CI sanitizer analogue)")
    p.add_argument("--preflight-only", action="store_true",
                   help="Validate the run (frame window, feature "
                        "budget, data dir, caption guard, decode-lever "
                        "combos) and exit 0 WITHOUT initializing the "
                        "model — seconds instead of a fleet slot; "
                        "run_sweep --preflight uses this per row")
    p.add_argument("--compile-cache-dir", default="auto",
                   help="Persistent XLA compile cache directory; 'auto' "
                        "= $LONGCAT_TTA_COMPILE_CACHE or "
                        "~/.cache/longcat_tta_xla, 'off' disables. "
                        "Sweep rows with the same geometry then pay "
                        "the jit set once, not once per row")
    # host IO
    p.add_argument("--load-fps", type=float, default=None,
                   help="Subsample decoded frames to this fps (stride = "
                        "round(native/target)); the reference baseline "
                        "loads at 15 fps (run_baseline.py:85-118). "
                        "Default: consecutive frames (the TTA runners' "
                        "behavior)")
    p.add_argument("--native-prefetch", action="store_true",
                   help="Use the C++ threaded prefetch loader for the TTA "
                        "window decode (overlaps host IO with device "
                        "compute; .npy datasets)")
    return p


def _drain_file(args) -> Optional[str]:
    """First existing stop-file candidate, or None (graceful drain)."""
    for c in (args.stop_file, os.environ.get("LONGCAT_STOP_FILE"),
              os.path.join(args.output_dir, "STOP")):
        if c and os.path.exists(c):
            return c
    return None


def _summarize_fast_decode_verify(ok_results):
    """Aggregate the per-video --fast-decode-verify records: mean
    fast-vs-dense PSNR and mean per-metric-vs-GT delta over the verified
    sample. None when the check never ran."""
    recs = [r["fast_decode_verify"] for r in ok_results
            if "fast_decode_verify" in r]
    if not recs:
        return None
    out = {"num_verified": len(recs),
           "same_noise": all(r.get("same_noise") for r in recs)}
    for key in ("psnr_fast_vs_dense", "psnr_delta", "ssim_delta",
                "lpips_delta", "dense_gen_time"):
        vals = [r[key] for r in recs
                if key in r and np.isfinite(r[key])]
        if vals:
            out[f"{key}_mean"] = float(np.mean(vals))
    return out


def step_keys(seed: int, vid_idx: int, lo: int, hi: int):
    """Per-(video, step) training PRNG keys [hi-lo, 2].

    fold_in(fold_in(seed, idx), t) is collision-free across videos and
    steps — the previous arithmetic ``seed*1000 + idx*100 + t`` aliased
    video i's step t>=100 with video i+1's step t-100, correlating
    per-video noise draws in the shipped steps>=200 sweep configs."""
    import jax
    import jax.numpy as jnp

    base = jax.random.fold_in(jax.random.PRNGKey(seed), vid_idx)
    return jax.vmap(lambda t: jax.random.fold_in(base, t))(
        jnp.arange(lo, hi))


def make_synthetic_dataset(out_dir: str, n: int, height: int, width: int,
                           frames: int = 64, seed: int = 0,
                           speed_range: Tuple[float, float] = (0.02, 0.10),
                           freq_range: Tuple[float, float] = (2.0, 8.0),
                           direction: float = 1.0) -> str:
    """Deterministic synthetic moving-pattern clips + metadata.csv — lets
    the whole runner execute without external datasets (this environment
    has no video corpora; the reference's test strategy has no analogue,
    SURVEY.md §4 gap we fill).

    ``speed_range``/``freq_range``/``direction`` parameterize the motion
    distribution: the distribution-shift A/B campaign (VERDICT r4 #3)
    pretrains on one setting and evaluates TTA on a shifted one (the
    reference's analogue is the Panda-70M -> UCF-101 cross-dataset
    story, summary_printout.txt:861-885)."""
    import csv

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    rows = []
    captions = ["a ball moving across the scene",
                "waves rolling over a beach",
                "a car driving down a road",
                "a bird flying in the sky"]
    for i in range(n):
        t = np.arange(frames, dtype=np.float32)
        yy, xx = np.meshgrid(np.linspace(0, 1, height),
                             np.linspace(0, 1, width), indexing="ij")
        freq = freq_range[0] + rng.rand() * (freq_range[1] - freq_range[0])
        phase = rng.rand() * 6.28
        speed = direction * (
            speed_range[0] + rng.rand() * (speed_range[1] - speed_range[0]))
        clip = np.stack([
            0.5 + 0.5 * np.sin(
                6.28 * (freq * (xx + speed * ti) + yy * freq / 2) + phase
            ) for ti in t
        ])[..., None].repeat(3, -1)
        clip = (clip * 255).astype(np.uint8)
        name = f"clip_{i:03d}.npy"
        np.save(os.path.join(out_dir, name), clip)
        rows.append({"filename": name, "caption": captions[i % len(captions)],
                     "category": f"cat{i % 2}"})
    with open(os.path.join(out_dir, "metadata.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["filename", "caption", "category"])
        w.writeheader()
        w.writerows(rows)
    return out_dir


def load_bundle(args):
    from ..config import get_model_config
    from ..pipeline import ModelBundle

    cfg = get_model_config(args.preset)
    if getattr(args, "remat_policy", None):
        import dataclasses

        cfg = dataclasses.replace(
            cfg, dit=dataclasses.replace(cfg.dit,
                                         remat_policy=args.remat_policy))
    if args.checkpoint_dir:
        from ..models.convert import load_converted_bundle

        return load_converted_bundle(args.checkpoint_dir, cfg)
    print("[runner] no --checkpoint-dir: using random-init weights "
          f"(preset {args.preset})")
    return ModelBundle.init_random(cfg, seed=args.seed)


def apply_fast_decode_defaults(args) -> None:
    """--fast-decode: fill UNSET decode-lever flags with the measured
    recommended stack (individually-set flags win). Geometry-aware BSA
    keep ratio: 0.15 is validated at >= 16 gen latents (the forced-keep
    floor allows it there); shorter horizons use 0.35."""
    if not getattr(args, "fast_decode", False):
        return
    from ..pipeline import round_frames_4k1

    n_gen_latents = (round_frames_4k1(args.num_frames) - 1) // 4 + 1
    if args.quantize_decode == "none":
        args.quantize_decode = "int8"
    # BSA exploits the LongCat cond-KV/noise split; the joint-volume
    # samplers (cogvideox/mmdit) fail-loud on it, so the bundle only
    # enables it where it applies. Under --context-mesh/--tensor-mesh
    # the mesh owns the attention (BSA is chip-local), so the bundle
    # degrades to int8+PAB there.
    if args.no_kv_cache:
        # BSA/PAB/int8qk all ride the KV-cache decode path; the bundle
        # degrades to int8 weights (set above) + CFG-reuse + segmenting
        # on --no-kv-cache runs (CFG-reuse is path-agnostic, tested on
        # the no-cache sampler)
        if args.cfg_reuse_every <= 0:
            args.cfg_reuse_every = 2
        if args.gen_segment_steps <= 0 and n_gen_latents >= 16 \
                and args.num_inference_steps >= 20:
            args.gen_segment_steps = 5
        return
    if (args.bsa_keep_ratio <= 0 and args.preset.startswith("longcat")
            and getattr(args, "context_mesh", 0) <= 1
            and getattr(args, "tensor_mesh", 0) <= 1):
        args.bsa_keep_ratio = 0.15 if n_gen_latents >= 16 else 0.35
    if args.pab_every <= 0:
        args.pab_every = 4
        # parser defaults only — a user-tuned broadcast range wins
        if args.pab_start_frac == 0.1:
            args.pab_start_frac = 0.06
        if args.pab_end_frac == 0.9:
            args.pab_end_frac = 0.96
    if args.cfg_reuse_every <= 0:
        # CFG guidance-delta reuse, range ALIGNED with the PAB schedule
        # so the joint compute steps refresh both caches (measured:
        # 93-frame 55.2 -> 48.1 s, latent corr unchanged; every=4 gives
        # 44.4 s at corr 0.99965 — opt-in). Works on all three archs
        # (conditional-only forwards of the joint-volume samplers too).
        args.cfg_reuse_every = 2
        if args.cfg_reuse_start_frac == 0.1:
            args.cfg_reuse_start_frac = args.pab_start_frac
        if args.cfg_reuse_end_frac == 0.9:
            args.cfg_reuse_end_frac = args.pab_end_frac
    if args.gen_segment_steps <= 0 and n_gen_latents >= 16 \
            and args.num_inference_steps >= 20:
        args.gen_segment_steps = 5


def main(argv: Optional[List[str]] = None) -> Dict[str, Any]:
    args = build_arg_parser().parse_args(argv)
    apply_fast_decode_defaults(args)

    import jax
    import jax.numpy as jnp

    from ..config import (
        AdapterConfig, AugmentationConfig, BSAConfig, CaptionGuardConfig,
        CFGReuseConfig, ClipGateConfig, EarlyStoppingConfig, FrameConfig,
        OptimConfig, PABConfig,
    )
    from ..data import (
        apply_fixed_caption, build_augmented_latent_variants,
        build_retrieval_pool, load_gt_frames, load_video_frames,
        load_video_list, parse_speed_factors, save_video,
        validate_caption_quality,
    )
    from ..eval import OnlineFrechetAccumulator, evaluate_generation_metrics
    from ..eval.frechet import load_i3d_model
    from ..models.vae import latent_len
    from ..pipeline import generate_vc
    from ..tta import (
        build_early_stopper, build_optimizer, build_scheme,
        make_train_step, split_tta_latents, validate_tta_feature_budget,
    )
    from ..tta.bucket import pad_target_latents
    from ..tta.engine import make_train_chunk
    from ..tta.clip_gate import (
        evaluate_clip_gate, make_hf_clip_scorer, make_hf_xclip_scorer,
        summarize_clip_gate_stats,
    )
    from ..tta.engine import adapter_norm
    from ..tta.split import resolve_frame_window
    from ..utils.checkpoint import (
        load_checkpoint, save_checkpoint, save_config, save_results,
    )

    from ..utils.compile_cache import enable_compile_cache

    t_start = time.time()
    os.makedirs(args.output_dir, exist_ok=True)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    cache_dir = enable_compile_cache(args.compile_cache_dir)
    if cache_dir:
        print(f"[runner] persistent XLA compile cache: {cache_dir}")

    # ---- configs -----------------------------------------------------
    frames = resolve_frame_window(FrameConfig(
        num_cond_frames=args.num_cond_frames,
        num_frames=args.num_frames,
        gen_start_frame=args.gen_start_frame,
        tta_total_frames=args.tta_total_frames,
        tta_context_frames=args.tta_context_frames,
        height=args.height, width=args.width,
    ))
    is_tta = args.method != "none"
    is_dno = args.method == "dno"
    # adapter methods train weights; dno trains the init noise — the
    # ES machinery (adapter snapshots, anchor evals on adapted params)
    # and the adapter scheme only exist for the former
    is_adapter = is_tta and not is_dno
    escfg = EarlyStoppingConfig(
        enabled=(not args.es_disable) and is_adapter,
        check_every=args.es_check_every,
        patience=args.es_patience,
        anchor_sigmas=tuple(float(x) for x in args.es_anchor_sigmas.split(",")),
        noise_draws=args.es_noise_draws,
        strategy=args.es_strategy,
        holdout_fraction=args.es_holdout_fraction,
    )
    gatecfg = ClipGateConfig(
        enabled=args.clip_gate_enabled,
        backend=args.clip_gate_backend,
        threshold=args.clip_gate_threshold,
        sample_frames=args.clip_gate_sample_frames,
        sampling_mode=args.clip_gate_sampling_mode,
        late_fraction=args.clip_gate_late_fraction,
        aggregate=args.clip_gate_aggregate,
        log_only=args.clip_gate_log_only,
        fail_open=not args.clip_gate_fail_closed,
    )
    augcfg = AugmentationConfig(
        enabled=args.aug_enabled,
        hflip=args.aug_hflip,
        rotate_degrees=tuple(float(x) for x in
                             args.aug_rotate_degrees.split(",") if x.strip()),
        speed_factors=tuple(parse_speed_factors(args.aug_speed_factors)),
    )
    acfg = AdapterConfig(
        method=args.method if is_adapter else "delta_a",
        lora_rank=args.lora_rank, lora_alpha=args.lora_alpha,
        lora_target_modules=tuple(args.lora_target_modules.split(",")),
        lora_target_ffn=args.lora_target_ffn,
        num_groups=args.num_groups, delta_target=args.delta_target,
        delta_dim=args.delta_dim, target_blocks=args.target_blocks,
        norm_target=args.norm_target, film_mode=args.film_mode,
        also_tune_delta=args.also_tune_delta,
        lora_builtin=args.use_builtin_lora,
    )
    validate_tta_feature_budget(frames, escfg, gatecfg,
                                args.feature_frame_guard_mode,
                                context=args.method)

    # ---- data --------------------------------------------------------
    if args.synthetic:
        data_dir = make_synthetic_dataset(
            os.path.join(args.output_dir, "synthetic_data"),
            args.synthetic, args.height, args.width, seed=args.seed)
    else:
        if not args.data_dir:
            raise SystemExit("--data-dir or --synthetic required")
        data_dir = args.data_dir
    videos = load_video_list(data_dir, max_videos=args.max_videos,
                             seed=args.seed)
    # guard the DATASET's captions, then apply the intentional override
    # — guarding after apply_fixed_caption makes every --fixed-caption
    # run trip the uniqueness checks by construction (the reference
    # orders it override-first, run_delta_a.py:482-483, but never
    # combines the two; the guard's purpose is catching bad *data*)
    caption_stats = validate_caption_quality(
        videos, CaptionGuardConfig(
            mode=args.caption_guard_mode,
            min_nonempty_ratio=args.caption_guard_min_nonempty_ratio,
            min_unique_ratio=args.caption_guard_min_unique_ratio,
            max_top1_ratio=args.caption_guard_max_top1_ratio,
            max_generic_top1_ratio=args.caption_guard_max_generic_top1_ratio,
            topk=args.caption_guard_topk))
    apply_fixed_caption(videos, args.fixed_caption)

    # ---- model + method ----------------------------------------------
    # Config-only arch resolution: every guard below needs only the
    # preset's ModelConfig, so --preflight-only can validate a run
    # (frame window, feature budget, data, captions, lever combos)
    # without paying model init — sweep rows die in seconds, not after
    # a fleet slot is burned (round-4 campaign postmortem).
    from ..config import get_model_config

    model_cfg = get_model_config(args.preset)

    # per-architecture loss dispatch (SURVEY.md §2.7: the backbone ports
    # re-implement the loss layer per backbone; here it is one callable)
    if model_cfg.arch == "mmdit":
        from ..tta.losses import (
            mmdit_flow_matching_loss_conditioned as arch_loss,
            mmdit_flow_matching_loss_conditioned_fixed as arch_anchor,
        )
    elif model_cfg.arch == "cogvideox":
        from ..tta.losses import (
            cogvideox_flow_matching_loss_conditioned as arch_loss,
            cogvideox_flow_matching_loss_conditioned_fixed as arch_anchor,
        )
    else:
        from ..tta.losses import (
            flow_matching_loss_conditioned as arch_loss,
            flow_matching_loss_conditioned_fixed as arch_anchor,
        )
    if model_cfg.arch != "longcat" and args.bucket_shapes:
        raise SystemExit("--bucket-shapes is only wired for the LongCat "
                         "backbone")

    if args.fast_decode_verify > 0:
        if args.skip_generation:
            raise SystemExit("--fast-decode-verify needs generation "
                             "(drop --skip-generation)")
        if not (args.quantize_decode != "none" or args.bsa_keep_ratio > 0
                or args.pab_every > 0 or args.cfg_reuse_every > 0
                or args.bucket_gen):
            raise SystemExit("--fast-decode-verify: no decode lever is "
                             "active — nothing to verify (enable "
                             "--fast-decode or individual levers)")

    # Fail-loud at STARTUP on decode-lever combos generate_vc rejects
    # (or would silently drop) at generation time — catching them
    # per-video would first spend the full training budget on every
    # video and mark the whole run failed (review r3c #5/#4).
    if not args.skip_generation:
        if model_cfg.arch != "longcat":
            bad = [name for on, name in (
                (args.bsa_keep_ratio > 0, "--bsa-keep-ratio"),
                (args.bucket_gen, "--bucket-gen"),
                (args.quantize_decode == "int8qk",
                 "--quantize-decode int8qk"),
            ) if on]
            if bad:
                raise SystemExit(
                    f"{', '.join(bad)}: not supported on the "
                    f"{model_cfg.arch} decode path (LongCat only — "
                    "no cond-KV/noise split in the joint-volume "
                    "sampler)")
        if args.no_kv_cache:
            bad = [name for on, name in (
                (args.pab_every > 0, "--pab-every"),
                (args.bsa_keep_ratio > 0, "--bsa-keep-ratio"),
                (args.quantize_decode == "int8qk",
                 "--quantize-decode int8qk"),
            ) if on]
            if bad:
                raise SystemExit(
                    f"{', '.join(bad)}: requires the KV-cache decode "
                    "path (drop --no-kv-cache)")
    if args.compute_vbench and (args.no_save_videos
                                or args.skip_generation):
        raise SystemExit("--compute-vbench scores the saved mp4s; it "
                         "cannot run with --no-save-videos or "
                         "--skip-generation")

    if args.preflight_only:
        print(f"[preflight] OK: {len(videos)} videos, method "
              f"{args.method}, arch {model_cfg.arch}, window "
              f"total={frames.tta_total_frames} "
              f"ctx={frames.tta_context_frames}")
        return 0
    bundle = load_bundle(args)
    dit_cfg = bundle.cfg.dit

    # ---- model parallelism (--context-mesh N / --tensor-mesh M) --------
    # First-class sequence + tensor parallelism for the product CLI
    # (SURVEY §2.10: the reference's cp_split_hw / init_context_parallel
    # analogue, run_baseline.py:63-79, plus the TP the reference never
    # needed on a 141 GB H200): video tokens shard over the mesh
    # "context" axis (ring flash attention) in the train chunk AND the
    # KV-cache decode; DiT weights shard megatron-style over "tensor".
    # Fail-loud on combos the mesh does not own.
    ctx_mesh = None
    n_ctx = max(1, args.context_mesh)
    n_tp = max(1, args.tensor_mesh)
    if n_ctx > 1 or n_tp > 1:
        if args.video_parallel > 1:
            raise SystemExit("--context-mesh/--tensor-mesh and "
                             "--video-parallel are mutually exclusive "
                             "(one mesh per run)")
        if args.bsa_keep_ratio > 0:
            raise SystemExit("--context-mesh/--tensor-mesh do not "
                             "compose with --bsa-keep-ratio (the BSA "
                             "kernel is chip-local)")
        if args.quantize_decode == "int8qk":
            # int8qk rides the BSA kernel (keep_ratio=1.0 internally),
            # so it hits the same chip-local limit; catch it here
            # instead of after the full training budget is spent
            raise SystemExit("--context-mesh/--tensor-mesh do not "
                             "compose with --quantize-decode int8qk "
                             "(it rides the chip-local BSA kernel); "
                             "use --quantize-decode int8")
        from ..config import MeshConfig
        from ..parallel import build_mesh, shard_params

        devs = jax.devices()
        if len(devs) < n_ctx * n_tp:
            raise SystemExit(f"mesh needs {n_ctx * n_tp} devices "
                             f"(context {n_ctx} x tensor {n_tp}) but "
                             f"only {len(devs)} visible")
        if n_ctx > 1:
            if bundle.cfg.arch != "longcat":
                raise SystemExit("--context-mesh is wired for the "
                                 "LongCat backbone only (ring decode "
                                 "needs the cond-KV/noise split)")
            # the ring shards the flattened video-token axis (nt * nhw);
            # nhw % N guarantees every window (train, anchor, cached
            # decode) divides evenly regardless of its latent-frame count
            sf = bundle.cfg.vae.spatial_factor * dit_cfg.patch_size[1]
            nhw = (frames.height // sf) * (frames.width // sf)
            if nhw % n_ctx != 0:
                raise SystemExit(
                    f"--context-mesh {n_ctx} needs the spatial token "
                    f"count per latent frame ({nhw} at "
                    f"{frames.height}x{frames.width}) to be divisible "
                    "by the ring size; adjust --height/--width (480p's "
                    "1560 tokens divide by 2/4/8)")
        if n_tp > 1:
            heads = getattr(dit_cfg, "num_heads", 0)
            if heads and heads % n_tp != 0:
                raise SystemExit(f"--tensor-mesh {n_tp} must divide "
                                 f"num_heads ({heads})")
        mesh = build_mesh(MeshConfig(data=1, context=n_ctx, tensor=n_tp))
        if n_ctx > 1:
            ctx_mesh = mesh
        if n_tp > 1:
            # place the frozen base weights with the per-arch TP rules;
            # every jitted consumer (train chunk, anchor eval, decode,
            # int8 quantizer) inherits the shardings via GSPMD
            bundle.dit_params = shard_params(mesh, bundle.dit_params,
                                             bundle.cfg.arch)

    scheme = build_scheme(dit_cfg, acfg) if is_adapter else None
    tx = build_optimizer(OptimConfig(
        optimizer=args.optimizer, lr=args.lr, steps=args.steps,
        warmup_steps=args.warmup_steps, weight_decay=args.weight_decay,
        grad_clip_norm=args.max_grad_norm))
    step_fn = (make_train_step(scheme, dit_cfg, tx, attn_impl=args.attn_impl,
                               loss_fn=arch_loss, cp_mesh=ctx_mesh)
               if is_adapter else None)
    chunk_fn = (make_train_chunk(
        scheme, dit_cfg, tx, attn_impl=args.attn_impl,
        anchor_sigmas=tuple(float(x)
                            for x in args.es_anchor_sigmas.split(",")),
        loss_fn=arch_loss, anchor_fn=arch_anchor, cp_mesh=ctx_mesh)
        if is_adapter else None)
    stopper = (build_early_stopper(escfg, scheme, dit_cfg, args.attn_impl,
                                   anchor_fn=arch_anchor, cp_mesh=ctx_mesh)
               if is_adapter else None)

    dno_step_and_tx = None
    if is_dno:
        # fail-loud composition gates (like the decode-lever preflight):
        # DNO backprops through the plain single-device sampler
        if bundle.cfg.arch != "longcat":
            raise SystemExit("--method dno is wired for the LongCat "
                             "backbone only (carried init_noise rides "
                             "the cond-KV/noise-split sampler)")
        bad = [n for on, n in ((args.aug_enabled, "augmentation"),
                               (args.batch_videos > 1, "--batch-videos"),
                               (ctx_mesh is not None, "--context-mesh"),
                               (args.tensor_mesh > 1, "--tensor-mesh"),
                               (args.bucket_shapes, "--bucket-shapes"),
                               (args.save_adapters, "--save-adapters"))
               if on]
        if bad:
            raise SystemExit(f"--method dno does not compose with "
                             f"{', '.join(bad)}")
        import optax as _optax

        from ..comparisons.noise_opt import make_dno_step

        _dno_tx = _optax.adam(args.lr)
        dno_step_and_tx = (make_dno_step(
            dit_cfg, bundle.cfg.scheduler, _dno_tx,
            num_steps=args.dno_sampler_steps, attn_impl=args.attn_impl),
            _dno_tx)

    gate_scorer = None
    if gatecfg.enabled and args.clip_gate_model_path:
        if args.clip_gate_scorer == "torch":
            maker = (make_hf_xclip_scorer if gatecfg.backend == "xclip"
                     else make_hf_clip_scorer)
            gate_scorer = maker(args.clip_gate_model_path)
        else:
            from ..tta.clip_gate import make_tpu_clip_scorer

            gate_scorer = make_tpu_clip_scorer(
                args.clip_gate_model_path, gatecfg.backend,
                allow_hash_tokenizer=args.clip_gate_hash_tokenizer)

    pool = None
    if args.batch_videos > 1:
        if not args.retrieval_pool_dir:
            raise SystemExit("--retrieval-pool-dir required for batch TTA")
        if args.retrieval_sbert_path and not os.path.exists(
                args.retrieval_sbert_path):
            # fail loud, not degrade: a typo'd path silently falling
            # back to hashed-BoW would run 100 videos on non-semantic
            # neighbors
            raise SystemExit(
                f"--retrieval-sbert-path {args.retrieval_sbert_path} "
                "does not exist; omit the flag to opt into the "
                "hashed-BoW fallback explicitly")
        pool_entries = load_video_list(args.retrieval_pool_dir,
                                       max_videos=10 ** 9, seed=args.seed)
        pool = build_retrieval_pool(pool_entries,
                                    sbert_model_path=args.retrieval_sbert_path)
        # stamp which embedder actually ran into the run's provenance:
        # hashed-BoW preserves the contract but NOT all-MiniLM-L6-v2's
        # semantic neighbor quality — batch-TTA conclusions drawn with
        # the fallback do not transfer to SBERT runs
        args.retrieval_embedder = pool.embedder
        if pool.embedder != "sbert":
            print("[retrieval] WARNING: no SBERT weights "
                  "(--retrieval-sbert-path) — using the deterministic "
                  "hashed-BoW fallback; neighbor quality is NOT "
                  "semantic-equivalent")

    i3d_fn = None
    if args.fvd_enabled and args.i3d_model_path:
        try:
            # TPU-native I3D (eval/i3d.py): convert once, run on-device
            from ..eval.i3d import load_i3d_params, make_i3d_feature_fn

            i3d_fn = make_i3d_feature_fn(
                load_i3d_params(args.i3d_model_path))
        except Exception as e:
            print(f"[fvd] JAX I3D conversion failed "
                  f"({type(e).__name__}: {e}); falling back to the "
                  "TorchScript runtime path")
            i3d_fn = load_i3d_model(args.i3d_model_path)
    inception_fn = None
    if args.inception_model_path:
        # TPU-native InceptionV3 FID features (eval/inception.py);
        # reference loads torchvision inception_v3 at runtime
        # (common.py:2161-2305)
        from ..eval.inception import (load_inception_params,
                                      make_inception_feature_fn)

        inception_fn = make_inception_feature_fn(
            load_inception_params(args.inception_model_path))
    fvd = OnlineFrechetAccumulator(video_feature_fn=i3d_fn,
                                   frame_feature_fn=inception_fn,
                                   min_videos=args.min_fvd_videos)
    fvd_state_path = os.path.join(args.output_dir, "fvd_state.npz")
    lpips_fn = None
    if args.lpips_model_path:
        from ..eval.lpips import load_lpips_params, make_lpips_feature_fn

        lpips_fn = make_lpips_feature_fn(
            load_lpips_params(args.lpips_model_path))

    # ---- resume --------------------------------------------------------
    ckpt_path = os.path.join(args.output_dir, "checkpoint.json")
    # a fresh (re)launch clears any drain sentinel from a prior run so
    # the sweep doesn't misread a completed resume as still-drained
    with contextlib.suppress(OSError):
        os.remove(os.path.join(args.output_dir, "DRAINED"))
    ckpt = load_checkpoint(ckpt_path)
    start_idx = ckpt["next_idx"] if ckpt else 0
    results: List[Dict] = ckpt["results"] if ckpt else []
    if start_idx > 0 and fvd.enabled:
        cursor = fvd.load_state(fvd_state_path)
        if cursor is None:
            print("[resume] WARNING: fvd_state.npz missing — online "
                  "FVD/FID will cover only post-resume videos")
        elif cursor == -1:
            print(f"[resume] restored legacy FVD/FID moments "
                  f"({fvd.compute()['num_videos']} pairs; pre-cursor "
                  "format — if the previous run crashed between its "
                  "FVD save and its checkpoint, the first re-run video "
                  "may be double-counted)")
        elif cursor < start_idx:
            print(f"[resume] restored FVD/FID moments through video "
                  f"{cursor} — {start_idx - cursor} completed video(s) "
                  "are missing from the streaming stats (state saves "
                  "are amortized; never double-counted)")
        else:
            print(f"[resume] restored online FVD/FID moments "
                  f"({fvd.compute()['num_videos']} pairs)")
    save_config(os.path.join(args.output_dir, "config.json"), vars(args))

    n_ctx_lat = latent_len(frames.tta_context_frames)
    videos_dir = os.path.join(args.output_dir, "videos")

    # optional C++ threaded prefetch of the TTA windows (native/prefetch.cpp)
    window_cache = {}
    if args.native_prefetch:
        from ..data.native_loader import ClipPrefetcher

        tta_start = frames.gen_start_frame - frames.tta_total_frames
        prefetcher = iter(ClipPrefetcher(
            [videos[i]["path"] for i in range(start_idx, len(videos))],
            frames.tta_total_frames, tta_start, frames.height, frames.width,
            target_fps=args.load_fps,
        ))

        def _window_px(i):
            want = i - start_idx
            while want not in window_cache:
                j, clip = next(prefetcher)
                window_cache[j] = clip
            clip = window_cache.pop(want)
            if clip is None:  # per-clip decode failure: fail THIS video
                raise ValueError(
                    f"native prefetch failed to decode {videos[i]['path']}")
            return clip[None]  # [1, 3, T, H, W]
    else:
        _window_px = None

    def encode_window(path, start, idx=None):
        if _window_px is not None and idx is not None:
            px = _window_px(idx)
        else:
            px = load_video_frames(path, frames.tta_total_frames,
                                   frames.height, frames.width,
                                   start_frame=start,
                                   target_fps=args.load_fps)
        return px, bundle.encode_video(jnp.asarray(px))

    # ---- video-parallel DP (--video-parallel V) -----------------------
    # The reference gets fleet-level data parallelism from SLURM arrays
    # (run_sweep.py:405-440); here V videos' optimizers run as one
    # vmapped XLA program (engine.make_batched_train_chunk), optionally
    # sharded over a (data,) mesh. Per-video semantics (seeds, ES
    # schedule, best-snapshot restore) are preserved exactly, so the
    # results match the sequential loop; generation stays per-video.
    vp = max(1, args.video_parallel)
    pretrained: Dict[int, Dict[str, Any]] = {}
    batched_chunk = None
    # fail-loud convention: these flags must not silently no-op
    if vp > 1 and not is_adapter:
        raise SystemExit(
            f"--video-parallel requires an adapter TTA method, not "
            f"{args.method!r}")
    if args.data_mesh > 1 and vp <= 1:
        raise SystemExit("--data-mesh requires --video-parallel > 1")
    if args.batch_videos > 1 and augcfg.enabled:
        # the batch-TTA stack round-robins [query + K neighbors] and
        # would silently keep only the unaugmented query variant
        raise SystemExit("--batch-videos does not compose with "
                         "augmentation (the round-robin stack would "
                         "drop the augmented variants)")
    if vp > 1 and is_adapter:
        for bad, name in ((augcfg.enabled, "augmentation"),
                          (args.batch_videos > 1, "--batch-videos"),
                          (args.bucket_shapes, "--bucket-shapes")):
            if bad:
                raise SystemExit(
                    f"--video-parallel does not compose with {name}")
        from ..tta.engine import make_batched_train_chunk

        vp_mesh = None
        if args.data_mesh > 1:
            from jax.sharding import Mesh

            devs = jax.devices()
            if len(devs) < args.data_mesh:
                raise SystemExit(
                    f"--data-mesh {args.data_mesh} but only "
                    f"{len(devs)} devices visible")
            vp_mesh = Mesh(np.asarray(devs[: args.data_mesh]), ("data",))
        batched_chunk = make_batched_train_chunk(
            scheme, dit_cfg, tx, attn_impl=args.attn_impl,
            anchor_sigmas=tuple(float(x)
                                for x in args.es_anchor_sigmas.split(",")),
            loss_fn=arch_loss, anchor_fn=arch_anchor, mesh=vp_mesh)

    def _step_keys(vid_idx, lo, hi):
        return step_keys(args.seed, vid_idx, lo, hi)

    def train_video_group(g_idxs: List[int]) -> Dict[int, Dict[str, Any]]:
        """Phase A of --video-parallel: gate + encode + batched TTA for
        a group of videos; returns per-idx precomputed training state
        consumed by the (unchanged) per-video generation loop."""
        stack_trees = lambda ts: jax.tree.map(
            lambda *xs: jnp.stack(xs), *ts)
        tta_start = frames.gen_start_frame - frames.tta_total_frames
        lanes: List[Dict[str, Any]] = []
        lane_errors: Dict[int, BaseException] = {}
        for i in g_idxs:
            e = videos[i]
            try:
                wpx, wlat = encode_window(e["path"], tta_start, idx=i)
            except Exception as exc:
                # a broken video must fail *itself*, not the whole
                # group: record the error for re-raise inside that
                # video's own per-video try block
                print(f"  [vp] lane {os.path.basename(e['path'])} "
                      f"failed to load/encode: {exc}")
                lane_errors[i] = exc
                continue
            try:
                t0 = time.time()
                gate = evaluate_clip_gate(
                    (wpx[0].transpose(1, 2, 3, 0) + 1.0) / 2.0,
                    e["caption"], gatecfg, gate_scorer)
                lane: Dict[str, Any] = {
                    "idx": i, "vid": os.path.basename(e["path"]),
                    "window": (wpx, wlat), "gate": gate,
                    "gate_time": time.time() - t0, "padded": False,
                }
                if not gate.get("skip_tta"):
                    c, tr, vl = split_tta_latents(wlat, n_ctx_lat,
                                                  escfg.holdout_fraction)
                    emb_i, mask_i = bundle.encode_prompt(e["caption"])
                    tp_i = scheme.init(jax.random.PRNGKey(args.seed + i),
                                       base_params=bundle.dit_params)
                    st = build_early_stopper(escfg, scheme, dit_cfg,
                                             args.attn_impl,
                                             anchor_fn=arch_anchor)
                    es_setup = 0.0
                    if st is not None and vl is not None:
                        t0 = time.time()
                        st.setup(bundle.dit_params, c, vl, emb_i, mask_i,
                                 lane["vid"], tp_i)
                        es_setup = time.time() - t0
                    lane.update(cond=c, train=tr, val=vl, emb=emb_i,
                                mask=mask_i, tp=tp_i,
                                opt_state=tx.init(tp_i),
                                losses=[], stopper=st, active=True,
                                es_time=es_setup)
            except Exception as exc:
                print(f"  [vp] lane {os.path.basename(e['path'])} "
                      f"failed in gate/setup: {exc}")
                lane_errors[i] = exc
                continue
            lanes.append(lane)

        train_lanes = [l for l in lanes if "tp" in l]
        out: Dict[int, Dict[str, Any]] = {}
        if train_lanes:
            # pad to the compiled width V so every group shares a trace
            lanes_p = list(train_lanes)
            while len(lanes_p) < vp:
                pad = dict(train_lanes[-1])
                pad["padded"] = True
                # padded lanes are skipped by the ES update loop, so
                # they must not count toward the loop-exit condition
                pad["active"] = False
                lanes_p.append(pad)

            tps = stack_trees([l["tp"] for l in lanes_p])
            osts = stack_trees([l["opt_state"] for l in lanes_p])
            cond = jnp.stack([l["cond"] for l in lanes_p])
            train = jnp.stack([l["train"] for l in lanes_p])
            emb_s = jnp.stack([l["emb"] for l in lanes_p])
            mask_s = jnp.stack([l["mask"] for l in lanes_p])
            es_active = all(l["stopper"] is not None
                            and l["val"] is not None for l in lanes_p)
            val_s = (jnp.stack([l["val"] for l in lanes_p])
                     if es_active else None)
            noises_s = (jnp.stack([l["stopper"].fixed_noises
                                   for l in lanes_p])
                        if es_active else None)

            k0 = (escfg.check_every if es_active
                  else (args.loss_fetch_every or 25))
            n_real = len(train_lanes)
            t_train = time.time()
            es_loop = 0.0
            first_anchor_done = False
            s = 0
            while s < args.steps and any(l["active"] for l in lanes_p):
                k = min(k0, args.steps - s)
                do_anchor = es_active and (s + k) % escfg.check_every == 0
                rngs = jnp.stack([_step_keys(l["idx"], s, s + k)
                                  for l in lanes_p])
                t_chunk = time.time()
                tps, osts, loss_mat, anchors = batched_chunk(
                    tps, osts, bundle.dit_params, cond, train, emb_s,
                    mask_s, rngs,
                    val_latents=val_s if do_anchor else None,
                    fixed_noises=noises_s if do_anchor else None)
                s += k
                loss_mat = jax.device_get(loss_mat)
                if do_anchor:
                    anchors = jax.device_get(anchors)
                    if first_anchor_done:
                        n_anchor = (escfg.noise_draws
                                    * len(escfg.anchor_sigmas)) / 3.0
                        es_loop += ((time.time() - t_chunk)
                                    * n_anchor / (k + n_anchor))
                    first_anchor_done = True
                for v, l in enumerate(lanes_p):
                    if l["padded"] or not l["active"]:
                        continue
                    l["losses"].extend(float(x) for x in loss_mat[v])
                    if do_anchor:
                        tp_v = jax.tree.map(lambda x, v=v: x[v], tps)
                        stop, _ = l["stopper"].step_with_loss(
                            s, tp_v, float(anchors[v]))
                        if stop:
                            l["active"] = False
                            print(f"  [vp] early stop {l['vid']} "
                                  f"at step {s}")
            wall = time.time() - t_train - es_loop
            for v, l in enumerate(lanes_p):
                if l["padded"]:
                    continue
                tp_v = jax.tree.map(lambda x, v=v: x[v], tps)
                es_info = None
                if l["stopper"] is not None and l["val"] is not None:
                    tp_v = l["stopper"].restore()
                    es_info = l["stopper"].state
                out[l["idx"]] = {
                    "window": l["window"], "gate": l["gate"],
                    "gate_time": l["gate_time"], "tp": tp_v,
                    "losses": l["losses"], "es_info": es_info,
                    "train_time": wall / n_real,
                    "es_time": l["es_time"] + es_loop / n_real,
                    # observable for the padded-lane loop-exit contract:
                    # ES stopping all real lanes must end the group loop
                    "steps_executed": s,
                }
        for l in lanes:
            if "tp" not in l:
                out[l["idx"]] = {
                    "window": l["window"], "gate": l["gate"],
                    "gate_time": l["gate_time"], "tp": None,
                    "losses": [], "es_info": None,
                    "train_time": 0.0, "es_time": 0.0,
                }
        for i, exc in lane_errors.items():
            out[i] = {"error": exc}
        return out

    def record_adapter_result(res, tp, losses, idx, vid_id):
        """Adapter fields + optional artifact, identical for the
        sequential and --video-parallel paths (the vp == sequential
        results contract depends on both writing the same keys)."""
        res["losses"] = losses
        res["adapter_norm"] = adapter_norm(tp)
        res["trainable_params"] = scheme.num_params(tp)
        if args.save_adapters:
            # per-video adapter artifact (reference: run_lora_tta
            # torch.save of LoRA weights, run_lora_tta.py:412-418;
            # consumed by runners/run_eval_adapters.py)
            from ..utils.checkpoint import save_adapter_state

            ap = os.path.join(args.output_dir, "adapters",
                              f"{idx:04d}_{vid_id}")
            save_adapter_state(ap, tp)
            res["adapter_path"] = ap

    # resume-safe: verified count carries over from the checkpoint
    fd_verified = sum(1 for r in results if "fast_decode_verify" in r)

    # Measured cost of one standalone anchor-eval dispatch (the
    # stopper.setup initial anchor, clean after its first compile).
    # The chunked loop attributes this measured value to each fused
    # anchor check instead of the round-4 modeled FLOP share, which
    # over-counted ~2x because the anchor forward runs over the
    # shorter cond+val window (VERDICT r4 weak #3).
    anchor_cal = {"t": None, "calls": 0}

    # ---- per-video loop ------------------------------------------------
    for idx in range(start_idx, len(videos)):
        stop_f = _drain_file(args)
        if stop_f:
            # deliberately NO summary.json: its presence marks the row
            # complete to the sweep; a drained row must resume instead.
            # The checkpoint is (re)written even at idx==start_idx so
            # "checkpointed" is always true, and an explicit DRAINED
            # sentinel tells the sweep this was a drain rather than any
            # other exit-0-without-summary path (e.g. --preflight-only).
            save_checkpoint(ckpt_path, idx, results)
            with open(os.path.join(args.output_dir, "DRAINED"), "w") as f:
                json.dump({"next_idx": idx, "stop_file": stop_f}, f)
            print(f"\n[drain] stop file {stop_f} present — exiting at "
                  f"{idx}/{len(videos)} videos (checkpointed; re-run "
                  f"to resume)")
            return {"drained": True, "next_idx": idx,
                    "num_videos": len(results)}
        entry = videos[idx]
        vid_id = os.path.basename(entry["path"])
        print(f"\n[{idx + 1}/{len(videos)}] {vid_id}")
        t_vid = time.time()
        profiling = args.profile_dir and idx == start_idx
        if profiling:
            jax.profiler.start_trace(args.profile_dir)
        res: Dict[str, Any] = {"video": vid_id, "path": entry["path"],
                               "caption": entry["caption"], "index": idx,
                               "success": True}
        try:
            pre = None
            if batched_chunk is not None:
                if idx not in pretrained:
                    pretrained.update(train_video_group(
                        list(range(idx, min(idx + vp, len(videos))))))
                pre = pretrained.pop(idx)
                if pre is not None and "error" in pre:
                    # re-raise the per-lane failure inside *this*
                    # video's try block so the failure is attributed
                    # to the broken video, not the group's first
                    raise pre["error"]

            tta_start = frames.gen_start_frame - frames.tta_total_frames
            if pre is not None:
                window_px, window_lat = pre["window"]
                gate = pre["gate"]
                res.update(gate)
                res["clip_gate_eval_time"] = pre["gate_time"]
            else:
                t_enc = time.time()
                window_px, window_lat = encode_window(
                    entry["path"], tta_start, idx=idx)
                # settle the async VAE-encode here so downstream timing
                # buckets (the ES stopper's first device sync used to
                # absorb it — round-4 es_check_time was ~1/3 encode
                # time) each measure only their own work
                jax.block_until_ready(window_lat)
                res["encode_time"] = time.time() - t_enc

                # CLIP gate
                t0 = time.time()
                gate_frames = (window_px[0].transpose(1, 2, 3, 0)
                               + 1.0) / 2.0
                gate = evaluate_clip_gate(gate_frames, entry["caption"],
                                          gatecfg, gate_scorer)
                res.update(gate)
                res["clip_gate_eval_time"] = time.time() - t0

            train_time = 0.0
            es_time = 0.0
            losses: List[float] = []
            tp = None
            if pre is not None:
                # video-parallel phase A already trained this adapter
                tp = pre["tp"]
                if tp is not None:
                    losses = pre["losses"]
                    train_time = pre["train_time"]
                    es_time = pre["es_time"]
                    res["vp_steps_executed"] = pre.get("steps_executed")
                    if pre["es_info"] is not None:
                        res["early_stopping_info"] = pre["es_info"]
                    record_adapter_result(res, tp, losses, idx, vid_id)
            else:
                # dno reconstructs the WHOLE post-context window (no
                # adapter snapshots, so no ES holdout to carve out)
                cond_l, train_l, val_l = split_tta_latents(
                    window_lat, n_ctx_lat,
                    0.0 if is_dno else escfg.holdout_fraction)
                emb, mask = bundle.encode_prompt(entry["caption"])

            dno_noise = None
            if is_dno and not gate.get("skip_tta"):
                from ..comparisons.noise_opt import optimize_noise

                t_train = time.time()
                dno_noise, dinfo = optimize_noise(
                    bundle.dit_params, dit_cfg, bundle.cfg.scheduler,
                    cond_l, train_l, emb, mask,
                    jax.random.PRNGKey(args.seed + idx),
                    num_opt_steps=args.steps,
                    sampler_steps=args.dno_sampler_steps,
                    interp_p=args.dno_interp_p,
                    interp_every=args.dno_interp_every,
                    attn_impl=args.attn_impl,
                    step_and_tx=dno_step_and_tx)
                train_time = time.time() - t_train
                losses = dinfo["losses"]
                res["losses"] = losses
                res["trainable_params"] = int(np.prod(dno_noise.shape))
                res["noise_norm"] = float(jnp.linalg.norm(dno_noise))
            if pre is None and is_adapter and not gate.get("skip_tta"):
                variants = [{"cond": cond_l, "train": train_l, "val": val_l,
                             "name": "orig"}]
                if augcfg.enabled:
                    variants = build_augmented_latent_variants(
                        bundle, (window_px[0].transpose(1, 2, 3, 0) + 1) / 2,
                        augcfg, n_ctx_lat, escfg.holdout_fraction,
                        seed=args.seed + idx)

                batch_data = [variants[0]]
                if pool is not None and args.batch_videos > 1:
                    for nb in pool.neighbors(entry["caption"], entry["path"],
                                             args.batch_videos - 1):
                        _, nb_lat = encode_window(nb["path"], tta_start)
                        nc, ntr, nv = split_tta_latents(
                            nb_lat, n_ctx_lat, escfg.holdout_fraction)
                        nb_emb, nb_mask = bundle.encode_prompt(nb["caption"])
                        batch_data.append({"cond": nc, "train": ntr,
                                           "emb": nb_emb, "mask": nb_mask})

                tp = scheme.init(jax.random.PRNGKey(args.seed + idx),
                                 base_params=bundle.dit_params)
                opt_state = tx.init(tp)
                if stopper is not None and val_l is not None:
                    # settle upstream async work (prompt encode, latent
                    # split) so setup's first sync measures only the
                    # initial anchor eval
                    jax.block_until_ready((cond_l, val_l, emb))
                    t0 = time.time()
                    stopper.setup(bundle.dit_params, cond_l, val_l, emb, mask,
                                  vid_id, tp)
                    dt_setup = time.time() - t0
                    es_time += dt_setup
                    anchor_cal["calls"] += 1
                    if anchor_cal["calls"] > 1:
                        # first call is compile-dominated; afterwards
                        # setup is one clean anchor dispatch
                        anchor_cal["t"] = dt_setup

                rng_host = np.random.RandomState(args.seed + idx)
                es_loop_time = 0.0
                t_train = time.time()
                if len(batch_data) > 1:
                    stacks = [{"cond": d["cond"], "train": d["train"],
                               "emb": d.get("emb", emb),
                               "mask": d.get("mask", mask)}
                              for d in batch_data]
                    sel = [s % len(stacks) for s in range(args.steps)]
                else:
                    stacks = [{"cond": v["cond"], "train": v["train"],
                               "emb": emb, "mask": mask} for v in variants]
                    sel = [rng_host.randint(len(stacks))
                           for _ in range(args.steps)]
                valid_stack = None
                if args.bucket_shapes:
                    for d in stacks:
                        d["train"], d["valid"] = pad_target_latents(
                            d["train"])
                    # pad ragged variants (speed-factor augmentation) up
                    # to the largest bucket present so they stack
                    t_max = max(d["train"].shape[2] for d in stacks)
                    for d in stacks:
                        t = d["train"].shape[2]
                        if t < t_max:
                            d["train"] = jnp.pad(
                                d["train"],
                                ((0, 0), (0, 0), (0, t_max - t),
                                 (0, 0), (0, 0)))
                    valid_stack = jnp.stack([d["valid"] for d in stacks])
                uniform = (
                    len({d["cond"].shape for d in stacks}) == 1
                    and len({d["train"].shape for d in stacks}) == 1)
                es_active = stopper is not None and val_l is not None

                def _step_rngs(lo, hi):
                    return _step_keys(idx, lo, hi)

                if uniform:
                    # Chunked device-side loop: `check_every` optimizer
                    # steps + the ES anchor eval run as ONE XLA dispatch,
                    # fetched with one device_get — vs the reference's
                    # per-step loss.item() + blocking anchor forward
                    # (run_delta_a.py:224-305, early_stopping.py:190).
                    cond_stack = jnp.stack([d["cond"] for d in stacks])
                    train_stack = jnp.stack([d["train"] for d in stacks])
                    emb_stack = jnp.stack([d["emb"] for d in stacks])
                    mask_stack = jnp.stack([d["mask"] for d in stacks])
                    k0 = (escfg.check_every if es_active
                          else (args.loss_fetch_every or 25))
                    first_anchor_done = False
                    s = 0
                    while s < args.steps:
                        k = min(k0, args.steps - s)
                        do_anchor = (es_active
                                     and (s + k) % escfg.check_every == 0)
                        t_chunk = time.time()
                        tp, opt_state, loss_vec, anchor = chunk_fn(
                            tp, opt_state, bundle.dit_params,
                            cond_stack, train_stack, emb_stack, mask_stack,
                            jnp.asarray(sel[s:s + k], jnp.int32),
                            _step_rngs(s, s + k),
                            val_latents=val_l if do_anchor else None,
                            fixed_noises=(stopper.fixed_noises
                                          if do_anchor else None),
                            valid_stack=valid_stack)
                        s += k
                        loss_vec, anchor = jax.device_get((loss_vec, anchor))
                        losses.extend(float(x) for x in loss_vec)
                        if do_anchor:
                            # the anchor eval is fused into the dispatch;
                            # attribute the MEASURED standalone anchor
                            # time (stopper.setup's initial eval, same
                            # jitted computation) — an upper bound on
                            # the fused increment. Falls back to the
                            # FLOP-share model only before the first
                            # clean measurement (video 0). The FIRST
                            # anchor chunk is excluded: its wall time is
                            # dominated by XLA compilation.
                            if first_anchor_done:
                                wall = time.time() - t_chunk
                                if anchor_cal["t"] is not None:
                                    es_loop_time += min(anchor_cal["t"],
                                                        wall)
                                else:
                                    n_anchor = (
                                        len(stopper.fixed_noises)
                                        * len(escfg.anchor_sigmas)) / 3.0
                                    es_loop_time += (wall * n_anchor
                                                     / (k + n_anchor))
                            first_anchor_done = True
                            stop, _info = stopper.step_with_loss(
                                s, tp, float(anchor))
                            if stop:
                                print(f"  early stop at step {s}")
                                break
                else:
                    # variant shapes differ (speed-factor augmentation):
                    # per-step dispatch, host-side variant pick
                    for s in range(args.steps):
                        bd = stacks[sel[s]]
                        tp, opt_state, loss = step_fn(
                            tp, opt_state, bundle.dit_params,
                            bd["cond"], bd["train"], bd["emb"], bd["mask"],
                            _step_keys(idx, s, s + 1)[0],
                            num_valid_target=bd.get("valid"))
                        losses.append(float(loss))
                        if es_active:
                            t0 = time.time()
                            stop, _info = stopper.step(s + 1, tp)
                            es_loop_time += time.time() - t0
                            if stop:
                                print(f"  early stop at step {s + 1}")
                                break
                es_time += es_loop_time
                train_time = time.time() - t_train - es_loop_time
                if stopper is not None and val_l is not None:
                    tp = stopper.restore()
                    res["early_stopping_info"] = stopper.state
                record_adapter_result(res, tp, losses, idx, vid_id)

            # ---- generation -------------------------------------------
            gen_time = 0.0
            if not args.skip_generation:
                dit_params_override, adapters = (
                    scheme.to_forward(tp, bundle.dit_params)
                    if (is_tta and tp is not None) else (None, None))
                cond_px = load_video_frames(
                    entry["path"], frames.num_cond_frames, frames.height,
                    frames.width,
                    start_frame=frames.gen_start_frame - frames.num_cond_frames,
                    target_fps=args.load_fps)
                t0 = time.time()
                gen_ctx = ctx_mesh if ctx_mesh is not None else (
                    contextlib.nullcontext())
                with gen_ctx:
                    gen = generate_vc(
                        bundle, jnp.asarray(cond_px), entry["caption"],
                        num_frames=frames.num_frames,
                        num_inference_steps=args.num_inference_steps,
                        guidance_scale=args.guidance_scale,
                        seed=args.seed + idx,
                        use_kv_cache=not args.no_kv_cache,
                        adapters=adapters,
                        dit_params=(dit_params_override
                                    if dit_params_override
                                    is not bundle.dit_params
                                    else None),
                        attn_impl=args.attn_impl,
                        cp_mesh=ctx_mesh,
                        bsa_cfg=(None if args.bsa_keep_ratio <= 0 else
                                 BSAConfig(keep_ratio=args.bsa_keep_ratio)),
                        quantize_decode=args.quantize_decode,
                        bucket_gen=args.bucket_gen,
                        gen_segment_steps=args.gen_segment_steps,
                        pab_cfg=(None if args.pab_every <= 0 else PABConfig(
                            every=args.pab_every,
                            start_frac=args.pab_start_frac,
                            end_frac=args.pab_end_frac)),
                        cfgr_cfg=(None if args.cfg_reuse_every <= 0 else
                                  CFGReuseConfig(
                                      every=args.cfg_reuse_every,
                                      start_frac=args.cfg_reuse_start_frac,
                                      end_frac=args.cfg_reuse_end_frac)),
                        init_noise=dno_noise,
                    )
                gen_time = time.time() - t0

                gt = load_gt_frames(entry["path"], len(gen), frames.height,
                                    frames.width, frames.gen_start_frame,
                                    target_fps=args.load_fps)
                res.update(evaluate_generation_metrics(
                    gen, gt, lpips_feature_fn=lpips_fn))
                if fd_verified < args.fast_decode_verify:
                    # fidelity self-check: same seed/adapters, every
                    # decode lever off. Per-pixel comparison is exact
                    # only when the fast path kept the plain noise draw
                    # (bucket_gen pads the draw shape -> different
                    # sample identity; the vs-GT deltas stay valid).
                    t0 = time.time()
                    with gen_ctx:
                        dense = generate_vc(
                            bundle, jnp.asarray(cond_px), entry["caption"],
                            num_frames=frames.num_frames,
                            num_inference_steps=args.num_inference_steps,
                            guidance_scale=args.guidance_scale,
                            seed=args.seed + idx,
                            use_kv_cache=not args.no_kv_cache,
                            adapters=adapters,
                            dit_params=(dit_params_override
                                        if dit_params_override
                                        is not bundle.dit_params
                                        else None),
                            attn_impl=args.attn_impl,
                            cp_mesh=ctx_mesh,
                            gen_segment_steps=args.gen_segment_steps,
                            init_noise=dno_noise,
                        )
                    dm = evaluate_generation_metrics(
                        dense, gt, lpips_feature_fn=lpips_fn)
                    mse = float(np.mean((np.asarray(gen, np.float64)
                                         - np.asarray(dense)) ** 2))
                    res["fast_decode_verify"] = {
                        "psnr_fast_vs_dense": (float("inf") if mse == 0
                                               else -10.0 * np.log10(mse)),
                        "same_noise": not args.bucket_gen,
                        "dense_gen_time": time.time() - t0,
                        **{f"{k}_dense": v for k, v in dm.items()
                           if k != "num_frames_scored"},
                        **{f"{k}_delta": res[k] - v for k, v in dm.items()
                           if k in ("psnr", "ssim", "lpips")
                           and np.isfinite(v)},
                    }
                    fd_verified += 1
                if fvd.enabled:
                    fvd.update(gen, gt)
                if not args.no_save_videos:
                    to_save = gen
                    if not is_tta:
                        # baseline artifact: green GENERATED border
                        # (reference: run_baseline.py:195-231 annotation)
                        from ..data import annotate_borders

                        to_save = annotate_borders(gen, (0, 200, 0))
                    res["video_path"] = save_video(
                        to_save,
                        os.path.join(videos_dir, f"{idx:04d}_{vid_id}.mp4"))

            res["train_time"] = train_time
            res["gen_time"] = gen_time
            res["es_check_time"] = es_time
            res["total_time"] = time.time() - t_vid
            print(f"  psnr={res.get('psnr', float('nan')):.3f} "
                  f"train={train_time:.1f}s gen={gen_time:.1f}s")
        except Exception as e:  # per-video fault tolerance
            import traceback

            traceback.print_exc()
            res["success"] = False
            res["error"] = f"{type(e).__name__}: {e}"
        finally:
            # stop even when the profiled video failed — otherwise the
            # trace silently runs for the whole remaining fleet
            if profiling:
                jax.profiler.stop_trace()
                print(f"  profiler trace -> {args.profile_dir}")
        results.append(res)
        if os.environ.get("LONGCAT_DEBUG_LIVE_BUFFERS"):
            # leak probe: what is still resident on device between
            # videos (sorted by size, top 12)
            import gc as _gc

            _gc.collect()
            live = [x for x in jax.live_arrays()
                    if getattr(x, "nbytes", 0) > 0]
            total = sum(x.nbytes for x in live)
            print(f"  [live-buffers] {len(live)} arrays, "
                  f"{total / 2**30:.2f} GiB")
            for x in sorted(live, key=lambda a: -a.nbytes)[:12]:
                print(f"    {x.nbytes / 2**20:9.1f} MiB {x.dtype} "
                      f"{x.shape}")
        save_checkpoint(ckpt_path, idx + 1, results)
        if fvd.enabled:
            # persist the moments AFTER the checkpoint: a crash between
            # the two writes leaves the state one video behind the
            # checkpoint — the resume path detects and reports the gap
            # instead of double-counting the re-run video. With frame
            # features (inception FID) the state is ~67 MB of float64
            # moments, so amortize the write; the final save at loop
            # end always lands.
            every = 5 if inception_fn is not None else 1
            if (idx + 1) % every == 0 or idx + 1 == len(videos):
                try:
                    fvd.save_state(fvd_state_path, next_idx=idx + 1)
                except OSError as e:  # a full disk must not kill the
                    print(f"  WARNING: fvd_state save failed: {e}")
                    # fleet; the resume path reports the coverage gap

    # ---- summary -------------------------------------------------------
    ok = [r for r in results if r.get("success") and "psnr" in r]

    def stats(key):
        vals = [r[key] for r in ok if np.isfinite(r.get(key, np.nan))]
        if not vals:
            return None
        return {"mean": float(np.mean(vals)), "std": float(np.std(vals)),
                "min": float(np.min(vals)), "max": float(np.max(vals))}

    summary = {
        "method": args.method,
        "config": vars(args),
        "num_videos": len(results),
        "num_success": len(ok),
        "metrics": {k: stats(k) for k in ("psnr", "ssim", "lpips")},
        "avg_train_time": float(np.mean([r.get("train_time", 0)
                                         for r in ok])) if ok else None,
        "avg_gen_time": float(np.mean([r.get("gen_time", 0)
                                       for r in ok])) if ok else None,
        "avg_es_check_time": float(np.mean([r.get("es_check_time", 0)
                                            for r in ok])) if ok else None,
        "avg_encode_time": float(np.mean([r.get("encode_time", 0)
                                          for r in ok])) if ok else None,
        "avg_clip_gate_eval_time": float(np.mean(
            [r.get("clip_gate_eval_time", 0) for r in ok])) if ok else None,
        "clip_gate_stats": summarize_clip_gate_stats(results),
        "fast_decode_verify": _summarize_fast_decode_verify(ok),
        "caption_stats": caption_stats,
        "online_eval": fvd.compute(),
        "wall_time": time.time() - t_start,
        "results": results,
    }
    if args.compute_vbench:
        from ..eval.vbench import run_vbench

        # never lose the run's summary to a scorer failure: write it
        # first, then amend with the VBench scores
        save_results(os.path.join(args.output_dir, "summary.json"), summary)
        try:
            summary["online_eval"]["vbench"] = run_vbench(
                videos_dir, towers_dir=args.vbench_towers_dir)
        except Exception as e:
            summary["online_eval"]["vbench"] = {
                "error": f"{type(e).__name__}: {e}"}
    save_results(os.path.join(args.output_dir, "summary.json"), summary)
    print(f"\nDone: {len(ok)}/{len(results)} videos, "
          f"summary at {args.output_dir}/summary.json")
    return summary


if __name__ == "__main__":
    main()
