#!/usr/bin/env python3
"""Sweep flash-attention (block_q, block_k) tiles at a given geometry,
fwd and fwd+bwd (the custom-VJP kernels), dispatch-amortized per the
axon-tunnel timing protocol (chained calls on distinct resident inputs,
scalar fetch).

The 1024x1024 default was tuned on the DECODE shapes (Sq=12480,
Sk=18720 — ARCHITECTURE.md); the TRAIN geometry (Sq=Sk=4680 at the
canonical cond14 window) pads 4680 -> 5120 at those tiles, and the
backward kernels (dkv + dq passes) have different reuse patterns, so
the optimum may differ.

    PYTHONPATH=/root/repo:/root/.axon_site python \
        scripts/measure_flash_tiles.py --sq 4680 --ncond 3120
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
    ap.add_argument("--sq", type=int, default=4680)
    ap.add_argument("--sk", type=int, default=0, help="0 = same as sq")
    ap.add_argument("--ncond", type=int, default=3120)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--dh", type=int, default=128)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--tiles", default="512x512,512x1024,1024x512,"
                                       "1024x1024,2048x1024,1024x2048")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from longcat_video_tta_tpu.ops.flash_attention import flash_attention

    B, H, D = args.batch, args.heads, args.dh
    Sq = args.sq
    Sk = args.sk or Sq
    n = args.chain

    def inputs(seed):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3 * n)
        mk = lambda k, S: jax.random.normal(k, (B, S, H, D), jnp.bfloat16)
        return [(mk(ks[3 * i], Sq), mk(ks[3 * i + 1], Sk),
                 mk(ks[3 * i + 2], Sk)) for i in range(n)]

    warm, cold = inputs(0), inputs(1)
    flops_fwd = 4 * B * H * Sq * Sk * D  # QK^T + PV
    results = {}
    for spec in args.tiles.split(","):
        bq, bk = (int(x) for x in spec.split("x"))

        def fwd_chain(batches):
            acc = 0.0
            for q, k, v in batches:
                o = flash_attention(q, k, v, num_cond_tokens=args.ncond,
                                    block_q=bq, block_k=bk)
                acc = acc + jnp.sum(o.astype(jnp.float32))
            return acc

        def bwd_chain(batches):
            acc = 0.0
            for q, k, v in batches:
                def loss(q, k, v):
                    o = flash_attention(
                        q, k, v, num_cond_tokens=args.ncond,
                        block_q=bq, block_k=bk)
                    return jnp.sum(o.astype(jnp.float32))

                l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                    q, k, v)
                acc = acc + l + sum(jnp.sum(g.astype(jnp.float32))
                                    for g in grads)
            return acc

        row = {}
        for name, fn, mult in (("fwd", jax.jit(fwd_chain), 1.0),
                               ("fwd+bwd", jax.jit(bwd_chain), 3.5)):
            try:
                float(fn(warm))  # compile + warm
                t0 = time.perf_counter()
                float(fn(cold))
                dt = (time.perf_counter() - t0) / n
                tf = flops_fwd * mult / dt / 1e12
                row[name] = {"ms": round(dt * 1e3, 2),
                             "tflops": round(tf, 1)}
            except Exception as e:
                row[name] = {"error": f"{type(e).__name__}: {e}"[:120]}
        results[spec] = row
        print(json.dumps({spec: row}), flush=True)

    ok = [(r["fwd+bwd"]["ms"], t) for t, r in results.items()
          if "ms" in r.get("fwd+bwd", {})]
    summary = {"geometry": f"B{B} Sq{Sq} Sk{Sk} H{H} D{D} "
                           f"ncond{args.ncond}"}
    if ok:
        best = min(ok)
        summary.update(best_fwd_bwd=best[1], ms=best[0])
    else:
        summary["error"] = "every tile config failed (see rows above)"
    print(json.dumps(summary))
    return 1 if not ok else 0


if __name__ == "__main__":
    sys.exit(main())
