#!/usr/bin/env python3
"""Validate the ring-CP scaling assumption on real hardware
(VERDICT r2 weak #2: "attention scales near-linearly over the context
axis — unvalidated at real sequence lengths").

Ring context parallelism splits the query tokens over N chips; each
chip runs the SAME flash-attention kernel at Sq_local = Sq/N against
the full K/V stream (arriving ring-chunk by ring-chunk, total work
unchanged). The per-chip compute therefore scales with Sq_local — IF
the kernel's throughput holds up at the smaller per-shard query sizes.
This script measures exactly that on one chip: the decode-shape flash
attention at Sq, Sq/2, Sq/4, Sq/8 (full Sk), reporting achieved
TFLOP/s per shard size. Near-constant TFLOP/s across rows = the
near-linear scaling claim holds at real sequence lengths.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_ring_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def train_mode():
    """fwd+bwd kernel throughput at query shards of the TTA train
    geometry (Sq=Sk=4680, H=16, dh=128): ring-CP *training* splits the
    query tokens per chip while the full K/V stream rotates past, so
    per-chip work is (Sq/N x Sk) in the fwd AND both backward kernels.
    Near-constant TF/s across rows = ring TTA training scales
    near-linearly too (decode-side validation is the default mode)."""
    import jax
    import jax.numpy as jnp

    from longcat_video_tta_tpu.ops.flash_attention import flash_attention

    B, H, dh = 1, 16, 128
    nhw = 1560                    # 60x104/4 patches per latent frame
    n_lat = 3                     # default: canonical cond 2 + train 1
    for a in sys.argv:
        if a.startswith("--latents="):
            n_lat = int(a.split("=")[1])
    Sq_full = Sk = n_lat * nhw
    CH = 4
    rows = []
    for shards in (1, 2, 4, 8):
        Sq = Sq_full // shards
        rng = np.random.RandomState(shards)
        mk = lambda s: jnp.asarray(
            rng.randn(B, s, H, dh) * 0.05, jnp.bfloat16)

        def one(q, k, v):
            def loss(q, k, v):
                o = flash_attention(q, k, v)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
            return l + sum(jnp.sum(x.astype(jnp.float32) ** 2)
                           for x in g)

        @jax.jit
        def chained(inps):
            return sum(one(*t) for t in inps)

        def mkset(seed0):
            return tuple((mk(Sq), mk(Sk), mk(Sk))
                         for _ in range(CH))
        sets = [mkset(j) for j in range(3)]
        float(chained(sets[0]))   # compile + warm
        t0 = time.perf_counter()
        for j in (1, 2):
            float(chained(sets[j]))
        dt = (time.perf_counter() - t0) / 2
        flops = 3.5 * B * 4 * Sq * Sk * H * dh * CH  # fwd + ~2.5x bwd
        rows.append({"shards": shards, "Sq": Sq, "Sk": Sk,
                     "fwd_bwd_ms_per_call": round(dt / CH * 1e3, 1),
                     "tflops_per_s": round(flops / dt / 1e12, 1)})
        print(rows[-1])
    print(json.dumps({
        "mode": "train (fwd+bwd, 4x-chained amortized)",
        "geometry": f"B={B} H={H} dh={dh} Sq=Sk={Sk} (TTA train window)",
        "rows": rows,
        "retention_8way": round(
            rows[-1]["tflops_per_s"] / rows[0]["tflops_per_s"], 3),
    }))


def main():
    if "--train" in sys.argv:
        return train_mode()

    import jax
    import jax.numpy as jnp

    from longcat_video_tta_tpu.ops.flash_attention import flash_attention

    B, H, dh = 2, 16, 128        # bench decode geometry (CFG batch 2)
    nhw = 30 * 52
    n_noise, n_cond = 24, 4      # 93-frame horizon
    Sq_full = n_noise * nhw      # 37,440
    Sk = (n_noise + n_cond) * nhw

    rows = []
    fn = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, num_cond_tokens=n_cond * nhw))
    for shards in (1, 2, 4, 8):
        Sq = Sq_full // shards
        rng = np.random.RandomState(shards)
        mk = lambda s: jnp.asarray(
            rng.randn(B, s, H, dh) * 0.05, jnp.bfloat16)
        q, k, v = mk(Sq), mk(Sk), mk(Sk)
        float(fn(q, k, v).sum())              # compile + warm
        q2 = mk(Sq)
        # force q2/k/v device-resident BEFORE timing: the tunnel moves
        # ~40 MB/s, so a lazy transfer inside the timed call would
        # dominate the ~0.3 s kernel
        float(q2.sum()) + float(k.sum()) + float(v.sum())
        t0 = time.perf_counter()
        float(fn(q2, k, v).sum())
        dt = time.perf_counter() - t0

        # the tunnel adds a ~30 ms fixed dispatch floor per call, which
        # masquerades as throughput loss at small shards: amortize it
        # with 1-call vs 4-call chains on resident inputs
        def chain(n):
            @jax.jit
            def f(qs, k, v):
                def body(c, q):
                    o = flash_attention(q, k, v,
                                        num_cond_tokens=n_cond * nhw)
                    return c + o.sum(), None
                c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                    qs)
                return c
            return f

        qs1 = jnp.stack([mk(Sq)])
        qs4 = jnp.stack([mk(Sq) for _ in range(4)])
        f1c, f4c = chain(1), chain(4)
        float(f1c(qs1, k, v)); float(f4c(qs4, k, v))  # compile+warm
        qs1b = jnp.stack([mk(Sq)])
        qs4b = jnp.stack([mk(Sq) for _ in range(4)])
        float(qs1b.sum()) + float(qs4b.sum())
        t0 = time.perf_counter(); float(f1c(qs1b, k, v))
        t1c = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f4c(qs4b, k, v))
        t4c = time.perf_counter() - t0
        per = (t4c - t1c) / 3.0
        flops = B * 4 * Sq * Sk * H * dh
        rows.append({
            "shards": shards, "Sq": Sq, "Sk": Sk,
            "time_s": round(dt, 4),
            "tflops_per_s": round(flops / dt / 1e12, 1),
            "amortized_s": round(per, 4),
            "amortized_tflops_per_s": round(flops / per / 1e12, 1),
        })
        print(rows[-1])
    print(json.dumps({
        "geometry": f"B={B} H={H} dh={dh} Sk={Sk} (93-frame decode)",
        "rows": rows,
        "throughput_retention_8way": round(
            rows[-1]["tflops_per_s"] / rows[0]["tflops_per_s"], 3),
        "amortized_retention_8way": round(
            rows[-1]["amortized_tflops_per_s"]
            / rows[0]["amortized_tflops_per_s"], 3),
    }))


if __name__ == "__main__":
    main()
