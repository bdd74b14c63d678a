#!/usr/bin/env python3
"""BSA kernel throughput at the 93-frame decode geometry.

Timing protocol (axon tunnel): host->device transfer of the 300 MB
q/k/v operands dominates naive per-call timing, and identical inputs
are memoized. So each config is timed as a jitted scan of N kernel
applications (output feeds the next query) at N=1 and N=5 on distinct
inputs; (t5 - t1) / 4 isolates per-application device time.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/tune_bsa_tiles.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from longcat_video_tta_tpu.ops.bsa import bsa_attention

    B, H, dh = 2, 16, 128
    nhw = 30 * 52
    n_noise, n_cond = 24, 4
    Sq, Sk = n_noise * nhw, (n_noise + n_cond) * nhw
    ncond_tok = n_cond * nhw

    def mk(s, seed):
        return jnp.asarray(
            np.random.RandomState(seed).randn(B, s, H, dh) * 0.05,
            jnp.bfloat16)

    k, v = mk(Sk, 1), mk(Sk, 2)
    rows = []
    for bq, bk, keep in ((1024, 1024, 0.25), (1024, 1024, 0.186),
                         (2048, 1024, 0.186), (1024, 2048, 0.186)):
        n_kb = -(-Sk // bk)
        top_k = max(2, -int(-n_kb * keep // 1))

        def chain(n, bq=bq, bk=bk, tk=top_k):
            @jax.jit
            def fn(q, k, v):
                def body(q, _):
                    o = bsa_attention(q, k, v, top_k=tk, block_q=bq,
                                      block_k=bk,
                                      num_cond_tokens=ncond_tok)
                    return o.astype(q.dtype), None
                q, _ = jax.lax.scan(body, q, None, length=n)
                return q
            return fn

        try:
            f1, f5 = chain(1), chain(5)
            float(f1(mk(Sq, 3), k, v).sum())   # compile + warm
            float(f5(mk(Sq, 4), k, v).sum())
            t0 = time.perf_counter()
            float(f1(mk(Sq, 5), k, v).sum())
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(f5(mk(Sq, 6), k, v).sum())
            t5 = time.perf_counter() - t0
            per = (t5 - t1) / 4.0
            flops = B * H * 4 * Sq * top_k * bk * dh
            rows.append({
                "block_q": bq, "block_k": bk, "keep": keep,
                "top_k": top_k, "per_call_s": round(per, 4),
                "eff_tflops_per_s": round(flops / per / 1e12, 1),
            })
            print(rows[-1], flush=True)
        except Exception as e:
            print({"block_q": bq, "block_k": bk,
                   "error": f"{type(e).__name__}: {str(e)[:200]}"},
                  flush=True)
    print(json.dumps({"geometry": f"Sq={Sq} Sk={Sk}", "rows": rows}))


if __name__ == "__main__":
    main()
