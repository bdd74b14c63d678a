#!/usr/bin/env python3
"""Measure the BSA block-selection pooling cost: Pallas block-sum kernel
vs the XLA [B, nb, bs, H, D] middle-axis reduction it replaces.

Context (ARCHITECTURE.md int8qk diagnosis): at the BSA keep-floor the
gather-flash call is bound by fixed costs, and block selection alone was
7.9 ms of the 23.9 ms call at 29-frame decode shapes — the XLA lowering
of the pooling reduction runs at ~40 GB/s effective, an order of
magnitude under HBM bandwidth. ops/bsa.py::_block_sum streams the same
reduction through VMEM one [bs, H, D] tile per grid step.

This script, on the real chip:
  1. checks the kernel == the XLA reduction numerically (f32 sums of a
     bf16 input: exact same accumulation dtype, tolerance ~1e-3 rel),
  2. times both at the 29-frame and 93-frame decode pooling shapes
     (dispatch-amortized: 4x chained on distinct resident inputs),
  3. times the full bsa_attention call end-to-end before/after is
     implicit — selection is inside the call, so re-run the int8qk
     diagnosis numbers to see the call-level delta.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_bsa_selection.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _timed(fn, args_list):
    """Amortized timing over len(args_list)-1 cold calls (first warms)."""
    float(fn(*args_list[0]).sum())
    for a in args_list[1:]:
        for x in a:
            float(x.sum())  # force resident
    t0 = time.perf_counter()
    for a in args_list[1:]:
        float(fn(*a).sum())
    return (time.perf_counter() - t0) / (len(args_list) - 1)


def main():
    import jax
    import jax.numpy as jnp

    from longcat_video_tta_tpu.ops.bsa import _block_sum, bsa_attention

    B, H, D = 2, 16, 128
    nhw = 30 * 52
    out = {"device": str(jax.devices()[0])}

    def xla_pool(x, bs):
        b, s, h, d = x.shape
        return x.reshape(b, s // bs, bs, h, d).sum(axis=2, dtype=jnp.float32)

    for tag, n_lat in (("29f", 12), ("93f", 28)):
        Sk = n_lat * nhw
        bs = 1024
        Sk_pad = ((Sk + bs - 1) // bs) * bs
        rng = np.random.RandomState(n_lat)
        mk = lambda i: jnp.asarray(
            np.random.RandomState(n_lat * 100 + i).randn(B, Sk_pad, H, D)
            * 0.05, jnp.bfloat16)

        pallas_fn = jax.jit(lambda x: _block_sum(x, bs))
        xla_fn = jax.jit(lambda x: xla_pool(x, bs))

        x0 = mk(0)
        a = np.asarray(pallas_fn(x0), np.float32)
        b = np.asarray(xla_fn(x0), np.float32)
        err = float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))
        out[f"{tag}_rel_err"] = err

        args = [(mk(i),) for i in range(5)]
        tp = _timed(pallas_fn, args)
        tx = _timed(xla_fn, args)
        gb = x0.nbytes / 1e9
        out[f"{tag}_pallas_ms"] = round(tp * 1e3, 2)
        out[f"{tag}_xla_ms"] = round(tx * 1e3, 2)
        out[f"{tag}_pallas_gbps"] = round(gb / tp, 1)
        out[f"{tag}_xla_gbps"] = round(gb / tx, 1)

    # full BSA call at the 29-frame decode shapes (the int8qk-diagnosis
    # geometry): Sq = 8 noise latents, Sk = 12 (4 cond + 8 noise)
    Sq, Sk = 8 * nhw, 12 * nhw
    n_cond_tok = 4 * nhw
    mk2 = lambda i, s: jnp.asarray(
        np.random.RandomState(7000 + i).randn(B, s, H, D) * 0.05,
        jnp.bfloat16)
    call = jax.jit(lambda q, k, v: bsa_attention(
        q, k, v, top_k=8, block_q=1024, block_k=1024,
        num_cond_tokens=n_cond_tok))
    args = [(mk2(3 * i, Sq), mk2(3 * i + 1, Sk), mk2(3 * i + 2, Sk))
            for i in range(5)]
    out["bsa_call_topk8_ms"] = round(_timed(call, args) * 1e3, 2)

    # int8qk variant at the same shapes (the r3 diagnosis geometry)
    call8 = jax.jit(lambda q, k, v: bsa_attention(
        q, k, v, top_k=8, block_q=1024, block_k=1024,
        num_cond_tokens=n_cond_tok, qk_int8=True))
    out["bsa_call_topk8_int8qk_ms"] = round(_timed(call8, args) * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
