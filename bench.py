"""Benchmark: per-video TTA cost on real TPU hardware.

Measures the two hot loops of the reference workload (SURVEY.md §3.1)
on the bench-scale flagship architecture (same 48-block geometry scaled
to fit one v5e chip in bf16):

  1. delta_a TTA train step (conditioned flow-matching fwd+bwd+AdamW)
     at the canonical 480p cond14 window geometry
  2. 50-step CFG video-continuation sampling with conditioning KV-cache

Headline metric: mean seconds per TTA train step. vs_baseline is the
speedup vs the reference's Delta-A wall time of 4.18 s/step
(BASELINE.md: 20.9 s/video at 5 steps on 1x H200, 13.6 B params).

Timing protocol: value-fetch based (`float()` / `np.asarray`) — through
the axon tunnel `block_until_ready` returns at dispatch, and identical
(executable, inputs) pairs are memoized, so every timed call uses a
fresh rng (see .claude/skills/verify/SKILL.md).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from longcat_video_tta_tpu.config import (
        AdapterConfig, EarlyStoppingConfig, OptimConfig, longcat_bench,
    )
    from longcat_video_tta_tpu.models import dit as M
    from longcat_video_tta_tpu.pipeline.sampler import sample_latents
    from longcat_video_tta_tpu.tta import (
        build_optimizer, build_scheme, make_train_step, split_tta_latents,
    )

    cfg = longcat_bench()
    dcfg = cfg.dit
    params = jax.jit(lambda k: M.init_dit(k, dcfg, zero_init=False))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)

    B, lat_h, lat_w = 1, 60, 104  # 480p (832x480) latent grid
    text = jax.random.normal(jax.random.PRNGKey(2),
                             (B, dcfg.text_len, dcfg.text_dim), jnp.bfloat16)
    mask = jnp.ones((B, dcfg.text_len), jnp.int32)

    # canonical TTA window: cond14 pixel frames -> 4 latents,
    # context 2 / train 1 / val 1 (es holdout 0.25 on the remainder)
    win = jax.random.normal(jax.random.PRNGKey(4), (B, 16, 4, lat_h, lat_w))
    c, tr, _val = split_tta_latents(win, 2, 0.25)

    scheme = build_scheme(dcfg, AdapterConfig(method="delta_a"))
    tp = scheme.init(jax.random.PRNGKey(5), base_params=params)
    tx = build_optimizer(OptimConfig(lr=5e-3))
    step = make_train_step(scheme, dcfg, tx)
    opt_state = tx.init(tp)

    # warmup/compile
    tp, opt_state, loss = step(tp, opt_state, params, c, tr, text, mask,
                               jax.random.PRNGKey(99))
    float(loss)

    n_steps = 5
    t0 = time.perf_counter()
    for i in range(n_steps):
        tp, opt_state, loss = step(tp, opt_state, params, c, tr, text, mask,
                                   jax.random.PRNGKey(100 + i))
        float(loss)  # fetch = device sync
    tta_step_s = (time.perf_counter() - t0) / n_steps

    # 50-step CFG continuation: cond 4 latents + 8 gen latents (29 frames)
    cond = jax.random.normal(jax.random.PRNGKey(3), (B, 16, 4, lat_h, lat_w))
    out = sample_latents(
        params, dcfg, cfg.scheduler, jax.random.PRNGKey(0),
        text, mask, jnp.zeros_like(text), mask, 4.0,
        num_gen_latents=8, num_steps=50, lat_h=lat_h, lat_w=lat_w,
        cond_latents=cond, use_kv_cache=True,
    )
    np.asarray(out)  # compile+warm
    t0 = time.perf_counter()
    out = sample_latents(
        params, dcfg, cfg.scheduler, jax.random.PRNGKey(1),
        text, mask, jnp.zeros_like(text), mask, 4.0,
        num_gen_latents=8, num_steps=50, lat_h=lat_h, lat_w=lat_w,
        cond_latents=cond, use_kv_cache=True,
    )
    np.asarray(out)
    gen_s = time.perf_counter() - t0
    gen_fps = 29.0 / gen_s

    # BSA decode (ops/bsa.py): block-sparse noise-noise attention with
    # the cond cache kept exact — the reference pipeline's BSA lever
    # (run_delta_a.py:118-120)
    from longcat_video_tta_tpu.config import BSAConfig

    bsa_cfg = BSAConfig(keep_ratio=0.35)
    gen_bsa_s = gen_fast_s = None

    def _timed_gen(p, seed, **kw):
        kwargs = dict(num_gen_latents=8, num_steps=50, lat_h=lat_h,
                      lat_w=lat_w, cond_latents=cond, use_kv_cache=True,
                      **kw)
        out = sample_latents(
            p, dcfg, cfg.scheduler, jax.random.PRNGKey(seed),
            text, mask, jnp.zeros_like(text), mask, 4.0, **kwargs)
        np.asarray(out)  # compile+warm
        t0 = time.perf_counter()
        out = sample_latents(
            p, dcfg, cfg.scheduler, jax.random.PRNGKey(seed + 1),
            text, mask, jnp.zeros_like(text), mask, 4.0, **kwargs)
        np.asarray(out)
        return time.perf_counter() - t0

    try:
        gen_bsa_s = _timed_gen(params, 2, bsa_cfg=bsa_cfg)
    except Exception as e:  # keep the headline metric robust
        print(f"[bench] BSA gen failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # int8 W8A8 block matmuls + BSA — the combined decode lever stack
    # (ops/quant.py; measured 30.5 s vs 48.7 dense bf16, corr 0.9999)
    gen_pab_s = None
    try:
        from longcat_video_tta_tpu.ops.quant import quantize_dit_blocks_int8

        qparams = jax.jit(quantize_dit_blocks_int8)(params)
        gen_fast_s = _timed_gen(qparams, 7, bsa_cfg=bsa_cfg)
    except Exception as e:
        print(f"[bench] int8+BSA gen failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    gen_stack_s = None
    try:
        # + Pyramid Attention Broadcast (arXiv:2408.12588): reuse
        # self-attention outputs on broadcast steps (r3 lever; measured
        # 93-frame 87.0 -> 55.2 s at identical latent corr 0.99986)
        from longcat_video_tta_tpu.config import PABConfig

        gen_pab_s = _timed_gen(
            qparams, 11, bsa_cfg=bsa_cfg,
            pab_cfg=PABConfig(every=4, start_frac=0.06, end_frac=0.96))
    except Exception as e:
        print(f"[bench] int8+BSA+PAB gen failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    try:
        # + CFG guidance-delta reuse (FasterCache, arXiv:2410.19355):
        # conditional-branch-only forwards on reuse steps, range aligned
        # with PAB (r3 lever; measured 93-frame 55.2 -> 48.1 s, latent
        # corr 0.99983 at the 93-frame geometry)
        from longcat_video_tta_tpu.config import CFGReuseConfig

        gen_stack_s = _timed_gen(
            qparams, 13, bsa_cfg=bsa_cfg,
            pab_cfg=PABConfig(every=4, start_frac=0.06, end_frac=0.96),
            cfgr_cfg=CFGReuseConfig(every=2, start_frac=0.06,
                                    end_frac=0.96))
    except Exception as e:
        print(f"[bench] full-stack gen failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # ---- north-star metric #2 (BASELINE.md:41-42): fused LoRA-TTA ----
    # ---- step vs base denoise step cost (target <= 2x) --------------
    lora_scheme = build_scheme(dcfg, AdapterConfig(
        method="lora", lora_rank=1, lora_alpha=2.0))
    ltp = lora_scheme.init(jax.random.PRNGKey(6), base_params=params)
    lstep = make_train_step(lora_scheme, dcfg, tx)
    lost = tx.init(ltp)
    ltp, lost, ll = lstep(ltp, lost, params, c, tr, text, mask,
                          jax.random.PRNGKey(200))
    float(ll)
    t0 = time.perf_counter()
    for i in range(n_steps):
        ltp, lost, ll = lstep(ltp, lost, params, c, tr, text, mask,
                              jax.random.PRNGKey(201 + i))
        float(ll)
    lora_step_s = (time.perf_counter() - t0) / n_steps
    denoise_step_s = gen_s / 50.0  # one CFG denoise step of the 50
    lora_vs_denoise = lora_step_s / denoise_step_s

    # ---- video-parallel TTA (VERDICT r2 #2): batched per-video -------
    # ---- optimizers as one program, single-chip batching win ---------
    from longcat_video_tta_tpu.tta.engine import make_batched_train_chunk

    vp_detail = {}
    try:
        # V=4 at bench geometry exceeds v5e-1 HBM (3.4 GB activation
        # temps per lane); V=2 fits. The single-chip vp win is bounded
        # here because the 480p step is already MXU-saturated — the
        # lever's value is fleet replacement + data-axis sharding.
        for V in (2,):
            chunk = make_batched_train_chunk(scheme, dcfg, tx)
            tps = jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[scheme.init(jax.random.PRNGKey(5), base_params=params)
                  for _ in range(V)])
            osts = jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[tx.init(jax.tree.map(lambda a: a[v], tps))
                  for v in range(V)])
            cond_b = jnp.stack([c] * V)
            train_b = jnp.stack([tr] * V)
            emb_b = jnp.stack([text] * V)
            mask_b = jnp.stack([mask] * V)

            def vp_rngs(base):
                return jnp.stack([
                    jnp.stack([jax.random.PRNGKey(base + v * 50 + s)
                               for s in range(2)]) for v in range(V)])

            tps, osts, lv, _ = chunk(tps, osts, params, cond_b, train_b,
                                     emb_b, mask_b, vp_rngs(300))
            np.asarray(lv)
            t0 = time.perf_counter()
            tps, osts, lv, _ = chunk(tps, osts, params, cond_b, train_b,
                                     emb_b, mask_b, vp_rngs(400))
            np.asarray(lv)
            dt = time.perf_counter() - t0
            # dt covers V videos x 2 steps -> per-video-step seconds
            vp_detail[f"vp{V}_step_s_per_video"] = round(dt / (2 * V), 3)
            vp_detail[f"vp{V}_speedup_vs_sequential"] = round(
                tta_step_s / (dt / (2 * V)), 3)
    except Exception as e:
        print(f"[bench] video-parallel failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # ---- honest accounting (VERDICT r1): FLOPs-normalized MFU + ----
    # ---- per-param-normalized baseline ratio, geometry in labels ----
    peak = 197e12               # v5e bf16 MXU roofline
    nhw = (lat_h // 2) * (lat_w // 2)
    s_train = 3 * nhw           # cond 2 + train 1 latent frames

    def matmul_params(dc):
        """matmul params touched per token (per block: qkv/proj/xattn/
        ffn/adaln)."""
        D, F, Ct = dc.hidden_size, dc.ffn_dim, dc.adaln_tembed_dim
        return dc.depth * (3 * D * D + D * D
                           + (D * D + 2 * D * D + D * D)
                           + 3 * D * F + Ct * 6 * D)

    def train_mfu_of(dc, step_s):
        # fwd 2*P*S, bwd 2x fwd; self-attention 4*S^2*D fwd PER BLOCK
        # (~2.5x in bwd). Round-2 bench omitted the L factor on the
        # attention term, understating MFU (r3 accounting fix).
        flops = (6 * matmul_params(dc) * s_train
                 + dc.depth * 14 * s_train ** 2 * dc.hidden_size)
        return flops / step_s / peak

    def gen_mfu_of(dc, per_step_s):
        s_noise, s_cond = 8 * nhw, 4 * nhw
        # per denoise step: CFG batch 2, fwd only; attention Sq=noise,
        # Sk=cond+noise (KV-cache), per block
        flops = 2 * (2 * matmul_params(dc) * s_noise
                     + dc.depth * 4 * s_noise * (s_noise + s_cond)
                     * dc.hidden_size)
        return flops / per_step_s / peak

    n_params = M.count_params(params)
    D, F, L = dcfg.hidden_size, dcfg.ffn_dim, dcfg.depth
    train_mfu = train_mfu_of(dcfg, tta_step_s)

    gen_mfu = gen_mfu_of(dcfg, gen_s / 50.0)

    # ---- second scale point (VERDICT r3 Weak #3): the largest single-
    # chip geometry (~3.2B, full remat) — same TTA step + gen MFU
    # measured so the 1.19B -> 13.6B extrapolation rests on two points
    scale2 = {}
    try:
        from longcat_video_tta_tpu.config import longcat_bench_3b

        # free the int8 copy and the 1.19B geometry's HBM residents
        # before materializing the 6.4 GiB tree (16 GiB chip)
        try:
            del qparams
        except NameError:
            pass
        try:
            del out, tps, osts
        except NameError:
            pass

        cfg2 = longcat_bench_3b()
        d2 = cfg2.dit
        params2 = jax.jit(lambda k: M.init_dit(k, d2, zero_init=False))(
            jax.random.PRNGKey(50))
        jax.block_until_ready(params2)
        n_params2 = M.count_params(params2)
        scheme2 = build_scheme(d2, AdapterConfig(method="delta_a"))
        tp2 = scheme2.init(jax.random.PRNGKey(51), base_params=params2)
        step2 = make_train_step(scheme2, d2, tx)
        ost2 = tx.init(tp2)
        tp2, ost2, l2 = step2(tp2, ost2, params2, c, tr, text, mask,
                              jax.random.PRNGKey(300))
        float(l2)
        t0 = time.perf_counter()
        for i in range(3):
            tp2, ost2, l2 = step2(tp2, ost2, params2, c, tr, text, mask,
                                  jax.random.PRNGKey(301 + i))
            float(l2)
        step2_s = (time.perf_counter() - t0) / 3
        # gen at 10 steps (per-step time is what the MFU uses; 10 vs 50
        # changes only how much scan warmup amortizes, bounded cost)
        g2_steps = 10

        def _gen2(seed):
            out = sample_latents(
                params2, d2, cfg2.scheduler, jax.random.PRNGKey(seed),
                text, mask, jnp.zeros_like(text), mask, 4.0,
                num_gen_latents=8, num_steps=g2_steps, lat_h=lat_h,
                lat_w=lat_w, cond_latents=cond, use_kv_cache=True)
            np.asarray(out)

        _gen2(60)  # compile+warm
        t0 = time.perf_counter()
        _gen2(61)
        gen2_s = time.perf_counter() - t0
        mfu2_train = train_mfu_of(d2, step2_s)
        mfu2_gen = gen_mfu_of(d2, gen2_s / g2_steps)
        scale2 = {
            "scale2_geometry": f"depth={d2.depth} hidden={d2.hidden_size} "
                               f"ffn={d2.ffn_dim} heads={d2.num_heads} "
                               f"({n_params2 / 1e9:.2f}B, full remat)",
            "scale2_tta_step_s": round(step2_s, 3),
            "scale2_tta_step_mfu": round(mfu2_train, 4),
            f"scale2_gen_{g2_steps}step_s": round(gen2_s, 2),
            "scale2_gen_mfu": round(mfu2_gen, 4),
            "scale2_per_param_vs_baseline": round(
                (20.9 / 5.0 / 13.6e9) / (step2_s / n_params2), 3),
        }
        del params2, tp2, ost2
    except Exception as e:
        print(f"[bench] scale2 geometry failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # ---- third scale point (VERDICT r4 #8): the flagship's EXACT layer
    # geometry — hidden 4096 / ffn 11008 / heads 32 (head_dim 128) at
    # the 480p token count — measured as a depth-1 vs depth-2 slope so
    # the per-block marginal fwd+bwd cost excludes fixed dispatch/embed
    # overhead. 48 x marginal + fixed = the 13.6B step estimate resting
    # on true shapes instead of 2048/2560-wide proxies.
    scale3 = {}
    try:
        import dataclasses as _dc

        from longcat_video_tta_tpu.config import DiTConfig as _DC

        times = {}
        d3_text = jax.random.normal(
            jax.random.PRNGKey(72), (text.shape[0], _DC().text_len,
                                     _DC().text_dim), jnp.bfloat16)
        d3_mask = jnp.ones((text.shape[0], _DC().text_len), jnp.int32)
        for depth in (1, 2):
            d3 = _DC(depth=depth, remat_policy="full")
            params3 = jax.jit(
                lambda k, d=d3: M.init_dit(k, d, zero_init=False))(
                jax.random.PRNGKey(70 + depth))
            jax.block_until_ready(params3)
            scheme3 = build_scheme(d3, AdapterConfig(method="delta_a"))
            tp3 = scheme3.init(jax.random.PRNGKey(71), base_params=params3)
            step3 = make_train_step(scheme3, d3, tx)
            ost3 = tx.init(tp3)
            tp3, ost3, l3 = step3(tp3, ost3, params3, c, tr, d3_text, d3_mask,
                                  jax.random.PRNGKey(400))
            float(l3)
            t0 = time.perf_counter()
            for i in range(3):
                tp3, ost3, l3 = step3(tp3, ost3, params3, c, tr, d3_text,
                                      d3_mask, jax.random.PRNGKey(401 + i))
                float(l3)
            times[depth] = (time.perf_counter() - t0) / 3
            del params3, tp3, ost3
        per_block_s = times[2] - times[1]
        fixed_s = times[1] - per_block_s
        est48_s = 48 * per_block_s + fixed_s
        d48 = _DC()  # flagship: depth 48, hidden 4096, ffn 11008
        scale3 = {
            "scale3_geometry": "flagship block: hidden 4096 ffn 11008 "
                               "heads 32 (depth 1/2 slope, 480p tokens, "
                               "full remat)",
            "scale3_block_fwd_bwd_s": round(per_block_s, 4),
            "scale3_fixed_overhead_s": round(fixed_s, 4),
            "scale3_est_13p6B_step_s": round(est48_s, 3),
            "scale3_est_13p6B_step_mfu": round(
                train_mfu_of(d48, est48_s), 4),
        }
        del times
    except Exception as e:
        print(f"[bench] scale3 flagship-block failed: "
              f"{type(e).__name__}: {e}", file=sys.stderr)

    baseline_step_s = 20.9 / 5.0  # Delta-A 5-step train_s on H200 (13.6B)
    per_param_ratio = (baseline_step_s / 13.6e9) / (tta_step_s / n_params)
    # hardware-efficiency comparison: the reference's step at the same
    # token geometry (13.6B: D=4096, F~12288, L=48) on H200 989 TFLOP/s
    # dense bf16 — per-param parity on a 5x-weaker chip means ~5-6x
    # higher silicon utilization
    Dr, Fr, Lr = 4096, 12288, 48
    p_block_ref = 3 * Dr * Dr + Dr * Dr + 4 * Dr * Dr + 3 * Dr * Fr \
        + 512 * 6 * Dr
    ref_flops = 6 * Lr * p_block_ref * s_train \
        + Lr * 14 * s_train ** 2 * Dr
    ref_mfu = ref_flops / baseline_step_s / 989e12
    mfu_advantage = train_mfu / ref_mfu
    print(json.dumps({
        "metric": "delta_a_tta_step_seconds_480p_1p2B_v5e1",
        "value": round(tta_step_s, 3),
        "unit": "s/step",
        # headline ratio is PER-PARAM normalized: wall-clock ratio x
        # (our params / baseline params) — the raw wall ratio would
        # compare a 1.19B model against the 13.6B H200 baseline
        "vs_baseline": round(per_param_ratio, 3),
        "detail": {
            "geometry": f"depth={L} hidden={D} ffn={F} heads="
                        f"{dcfg.num_heads} ({n_params / 1e9:.2f}B params, "
                        f"bf16, v5e-1, 480p 60x104 latent grid)",
            "tta_step_mfu": round(train_mfu, 4),
            "gen_50step_cfg_29frames_s": round(gen_s, 2),
            "gen_frames_per_s": round(gen_fps, 3),
            "gen_mfu": round(gen_mfu, 4),
            "gen_50step_bsa_keep35_s": (round(gen_bsa_s, 2)
                                        if gen_bsa_s else None),
            "gen_bsa_speedup": (round(gen_s / gen_bsa_s, 3)
                                if gen_bsa_s else None),
            "gen_50step_int8_bsa_s": (round(gen_fast_s, 2)
                                      if gen_fast_s else None),
            "gen_int8_bsa_speedup": (round(gen_s / gen_fast_s, 3)
                                     if gen_fast_s else None),
            "gen_50step_int8_bsa_pab_s": (round(gen_pab_s, 2)
                                          if gen_pab_s else None),
            "gen_int8_bsa_pab_speedup": (round(gen_s / gen_pab_s, 3)
                                         if gen_pab_s else None),
            # + CFG guidance-delta reuse (the full recommended stack,
            # --fast-decode)
            "gen_50step_full_stack_s": (round(gen_stack_s, 2)
                                        if gen_stack_s else None),
            "gen_full_stack_speedup": (round(gen_s / gen_stack_s, 3)
                                       if gen_stack_s else None),
            # north-star #2: fused LoRA-TTA step <= 2x base denoise
            # step (BASELINE.md:41-42); denoise step = one CFG step of
            # the 50-step KV-cached continuation at the same geometry
            "lora_r1_step_s": round(lora_step_s, 3),
            "denoise_step_s": round(denoise_step_s, 3),
            "lora_step_over_denoise_step": round(lora_vs_denoise, 3),
            **vp_detail,
            # vp2 on ONE chip is expected ~1.0x (the 480p step is
            # already MXU-saturated): --video-parallel is a data-axis
            # lever — its win is fleet replacement + --data-mesh
            # sharding over real multi-chip, equality-tested in
            # tests/test_runner.py
            "vp2_note": "single-chip measurement; expect ~1.0x "
                        "(data-axis lever, see detail comment)",
            **scale2,
            **scale3,
            "wall_ratio_unnormalized": round(baseline_step_s / tta_step_s,
                                             3),
            "baseline_step_mfu_est": round(ref_mfu, 4),
            "mfu_advantage_vs_h200": round(mfu_advantage, 2),
            # recorded offline (too slow for the round bench window):
            # scripts/measure_longhorizon.py, 24 gen latents, int8 +
            # BSA keep 0.15 + PAB every-4 + CFG-reuse every-2 (both
            # [0.06,0.96), aligned), segment 5 — latent corr 0.99983 /
            # rel err 1.96% vs dense bf16 AT this geometry; see
            # ARCHITECTURE.md
            "gen_93frame_50step_s_recorded": 48.1,
            "baseline": "Delta-A lr5e-3 5 steps: 20.9 s/video on 1xH200 "
                        "13.6B (summary_printout.txt:134); per-param "
                        "normalization factor 1.19/13.6",
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
