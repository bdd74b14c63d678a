#!/usr/bin/env python3
"""Measure the 93-frame single-chip decode (bench scale) with the
int8 + BSA + segmented-dispatch lever stack, and the BSA keep-ratio's
latent fidelity at the 29-frame geometry (VERDICT r2 #4: re-measure
the 126.6 s number, target <= 90 s, latent corr >= 0.999).

Runs on the real TPU chip:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_longhorizon.py \
        --mode corr --keep 0.25            # fidelity at 29-frame geometry
    ... --mode wall --keep 0.25 --gen-latents 24 --segment 5   # 93-frame

Timing is value-fetch based (scalar sum) per the axon-tunnel protocol.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["corr", "wall"], default="wall")
    ap.add_argument("--keep", type=float, default=0.35)
    ap.add_argument("--gen-latents", type=int, default=24)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--segment", type=int, default=5)
    ap.add_argument("--no-int8", action="store_true")
    ap.add_argument("--int8qk", action="store_true",
                    help="int8 QK^T inside the BSA kernel "
                         "(--quantize-decode int8qk)")
    ap.add_argument("--pab-every", type=int, default=0,
                    help="Pyramid Attention Broadcast: compute decode "
                         "self-attention only every Nth step inside "
                         "[--pab-start, --pab-end) of the trajectory "
                         "(0 = off)")
    ap.add_argument("--pab-start", type=float, default=0.1)
    ap.add_argument("--pab-end", type=float, default=0.9)
    ap.add_argument("--cfg-reuse-every", type=int, default=0,
                    help="CFG guidance-delta reuse (FasterCache): run "
                         "only the conditional branch on reuse steps "
                         "(0 = off)")
    ap.add_argument("--cfg-reuse-start", type=float, default=0.1)
    ap.add_argument("--cfg-reuse-end", type=float, default=0.9)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from longcat_video_tta_tpu.config import (
        BSAConfig, CFGReuseConfig, PABConfig, longcat_bench,
    )
    from longcat_video_tta_tpu.models import dit as M
    from longcat_video_tta_tpu.ops.quant import quantize_dit_blocks_int8
    from longcat_video_tta_tpu.pipeline.sampler import (
        sample_latents,
        sample_latents_segmented,
    )

    cfg = longcat_bench()
    dcfg = cfg.dit
    params = jax.jit(lambda k: M.init_dit(k, dcfg, zero_init=False))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    B, lat_h, lat_w = 1, 60, 104
    text = jax.random.normal(jax.random.PRNGKey(2),
                             (B, dcfg.text_len, dcfg.text_dim),
                             jnp.bfloat16)
    mask = jnp.ones((B, dcfg.text_len), jnp.int32)
    cond = jax.random.normal(jax.random.PRNGKey(3),
                             (B, 16, 4, lat_h, lat_w))
    qparams = params if args.no_int8 else jax.jit(
        quantize_dit_blocks_int8)(params)
    bsa = BSAConfig(keep_ratio=args.keep, qk_int8=args.int8qk)
    pab = (None if args.pab_every <= 0 else PABConfig(
        every=args.pab_every, start_frac=args.pab_start,
        end_frac=args.pab_end))
    cfgr = (None if args.cfg_reuse_every <= 0 else CFGReuseConfig(
        every=args.cfg_reuse_every, start_frac=args.cfg_reuse_start,
        end_frac=args.cfg_reuse_end))

    if args.mode == "corr":
        # fidelity vs dense bf16. NOTE: run at the geometry you intend
        # to deploy — the forced-keep clamp (cond blocks + diagonal)
        # sets an effective sparsity floor that depends on the
        # cond:noise block ratio, so a 29-frame corr does not validate
        # a 93-frame keep ratio (--gen-latents 24).
        kw = dict(num_gen_latents=args.gen_latents, num_steps=args.steps,
                  lat_h=lat_h, lat_w=lat_w, cond_latents=cond,
                  use_kv_cache=True)
        if args.segment > 0:
            sampler = sample_latents_segmented
            kw["segment_steps"] = args.segment
        else:
            sampler = sample_latents
        ref = np.asarray(sampler(
            params, dcfg, cfg.scheduler, jax.random.PRNGKey(7), text,
            mask, jnp.zeros_like(text), mask, 4.0, **kw), np.float32)
        if not args.no_int8:
            del params  # free the bf16 tree before the lever-stack run
        fast = np.asarray(sampler(
            qparams, dcfg, cfg.scheduler, jax.random.PRNGKey(7), text,
            mask, jnp.zeros_like(text), mask, 4.0, bsa_cfg=bsa,
            pab_cfg=pab, cfgr_cfg=cfgr, **kw), np.float32)
        corr = float(np.corrcoef(ref.ravel(), fast.ravel())[0, 1])
        rel = float(np.linalg.norm(fast - ref) / np.linalg.norm(ref))
        print(json.dumps({"mode": "corr", "keep": args.keep,
                          "pab_every": args.pab_every,
                          "cfg_reuse_every": args.cfg_reuse_every,
                          "int8": not args.no_int8, "steps": args.steps,
                          "gen_latents": args.gen_latents,
                          "segment": args.segment,
                          "latent_corr": round(corr, 5),
                          "rel_err": round(rel, 4)}))
        return

    # wall mode: segmented long-horizon decode. Free the bf16 tree when
    # int8 is in use — at 93-frame the PAB cache (4.9 GB) + both param
    # copies exceed v5e HBM (the product driver quantizes via a cache
    # that also drops the bf16 decode copy).
    if not args.no_int8:
        del params
    kw = dict(num_gen_latents=args.gen_latents, num_steps=args.steps,
              lat_h=lat_h, lat_w=lat_w,
              segment_steps=args.segment, cond_latents=cond,
              use_kv_cache=True, bsa_cfg=bsa, pab_cfg=pab, cfgr_cfg=cfgr)
    t0 = time.perf_counter()
    out = sample_latents_segmented(
        qparams, dcfg, cfg.scheduler, jax.random.PRNGKey(5), text, mask,
        jnp.zeros_like(text), mask, 4.0, **kw)
    float(jnp.sum(out))
    warm_incl_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = sample_latents_segmented(
        qparams, dcfg, cfg.scheduler, jax.random.PRNGKey(6), text, mask,
        jnp.zeros_like(text), mask, 4.0, **kw)
    float(jnp.sum(out))
    wall = time.perf_counter() - t0
    frames = 1 + (args.gen_latents - 1) * 4
    print(json.dumps({
        "mode": "wall", "keep": args.keep, "int8": not args.no_int8,
        "int8qk": args.int8qk, "pab_every": args.pab_every,
        "cfg_reuse_every": args.cfg_reuse_every,
        "gen_latents": args.gen_latents, "frames": frames,
        "steps": args.steps, "segment": args.segment,
        "first_incl_compile_s": round(warm_incl_compile, 1),
        "decode_s": round(wall, 1),
        "s_per_step": round(wall / args.steps, 3),
    }))


if __name__ == "__main__":
    main()
