"""Measure the delta_a TTA train step under each remat policy on TPU.

Compares ``full`` / ``dots`` / ``dots_attn`` (ops/layers.py::remat_wrap)
at the bench geometry (480p token grid, 1.19 B model, v5e-1). The
``dots_attn`` policy saves the named flash-attention residuals
(flash_out/flash_lse) so the block backward never re-runs the forward
flash kernel — the experiment this script exists to quantify.

Timing protocol per .claude/skills/verify/SKILL.md: fresh rng per timed
call (the tunnel memoizes identical executions), scalar fetch as the
device sync.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_remat_policy.py \
      [--policies dots,dots_attn] [--steps 5]
"""

import argparse
import dataclasses
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--policies", default="dots,dots_attn")
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from longcat_video_tta_tpu.config import (
        AdapterConfig, OptimConfig, longcat_bench,
    )
    from longcat_video_tta_tpu.models import dit as M
    from longcat_video_tta_tpu.tta import (
        build_optimizer, build_scheme, make_train_step, split_tta_latents,
    )

    cfg = longcat_bench()
    params = jax.jit(lambda k: M.init_dit(k, cfg.dit, zero_init=False))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    B, lat_h, lat_w = 1, 60, 104
    text = jax.random.normal(jax.random.PRNGKey(2),
                             (B, cfg.dit.text_len, cfg.dit.text_dim),
                             jnp.bfloat16)
    mask = jnp.ones((B, cfg.dit.text_len), jnp.int32)
    win = jax.random.normal(jax.random.PRNGKey(4), (B, 16, 4, lat_h, lat_w))
    c, tr, _ = split_tta_latents(win, 2, 0.25)
    tx = build_optimizer(OptimConfig(lr=5e-3))

    results = {}
    for policy in args.policies.split(","):
        dcfg = dataclasses.replace(cfg.dit, remat_policy=policy)
        scheme = build_scheme(dcfg, AdapterConfig(method="delta_a"))
        tp = scheme.init(jax.random.PRNGKey(5), base_params=params)
        step = make_train_step(scheme, dcfg, tx)
        opt_state = tx.init(tp)
        t0 = time.perf_counter()
        tp, opt_state, loss = step(tp, opt_state, params, c, tr, text,
                                   mask, jax.random.PRNGKey(99))
        warm = float(loss)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(args.steps):
            tp, opt_state, loss = step(tp, opt_state, params, c, tr, text,
                                       mask, jax.random.PRNGKey(100 + i))
            float(loss)
        dt = (time.perf_counter() - t0) / args.steps
        results[policy] = {"step_s": round(dt, 4),
                           "compile_s": round(compile_s, 1),
                           "warm_loss": warm}
        print(json.dumps({policy: results[policy]}), flush=True)

    print(json.dumps({"metric": "remat_policy_step_s", "results": results}))


if __name__ == "__main__":
    main()
