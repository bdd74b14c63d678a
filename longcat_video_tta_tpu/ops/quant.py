"""Int8 (W8A8) quantized matmuls for the decode hot loop.

The round-1 analysis (ARCHITECTURE.md) showed the 50-step CFG decode is
compute-bound at ~50% MFU — further single-chip speedup needs FLOP
cuts. BSA (ops/bsa.py) cuts the attention term; this module cuts the
matmul term: per-block heavy kernels (fused qkv, attn proj, cross-attn
q/kv/proj, SwiGLU w1/w2/w3) are quantized to int8 with per-output-
channel weight scales, activations are dynamically quantized per token,
and the contraction runs int8 x int8 -> int32 on the MXU (2x bf16 peak
on v5e/v5p). Embedders, adaLN, norms, and the final layer stay bf16.

Opt-in and decode-only: training always runs bf16; generation takes
``quantize_decode="int8"`` (runners/run_tta.py --quantize-decode).
The reference has no analogue (its decode levers are the KV cache and
BSA, run_delta_a.py:118-120) — this is TPU-first headroom.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def quantize_linear_params(p: Dict[str, Any]) -> Dict[str, Any]:
    """{'kernel': [..., K, N], 'bias'?} -> {'kernel_i8', 'scale', 'bias'?}.

    Per-output-channel symmetric scales over the contraction axis; works
    unchanged on depth-stacked kernels [L, K, N] (scale [L, N]) — the
    block scan slices the leading axis as usual."""
    w = p["kernel"].astype(jnp.float32)
    s = jnp.max(jnp.abs(w), axis=-2) / 127.0          # [..., N]
    s = jnp.maximum(s, 1e-8)
    wi = jnp.clip(jnp.round(w / s[..., None, :]), -127, 127).astype(jnp.int8)
    out = {"kernel_i8": wi, "scale": s}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def int8_linear(p: Dict[str, Any], x: jnp.ndarray, lora=None,
                lora_scale=None) -> jnp.ndarray:
    """W8A8 dense: dynamic per-token activation quant, int32 accumulate.

    ``p``: output of :func:`quantize_linear_params` (sliced to
    {'kernel_i8': [K, N], 'scale': [N], 'bias'?: [N]}). LoRA adds stay
    bf16 (adapters are small and quality-critical)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0  # [..., 1]
    sx = jnp.maximum(sx, 1e-8)
    xi = jnp.round(xf / sx).astype(jnp.int8)
    yi = jax.lax.dot_general(
        xi, p["kernel_i8"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = yi.astype(jnp.float32) * sx * p["scale"]
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    y = y.astype(dtype)
    if lora is not None:
        lx = jnp.dot(x, lora["a"].astype(dtype))
        lx = jnp.dot(lx, lora["b"].astype(dtype))
        y = y + lx * jnp.asarray(lora_scale, dtype)
    return y


_BLOCK_LINEARS = {
    "attn": ("qkv", "proj"),
    "cross_attn": ("q", "kv", "proj"),
    "ffn": ("w1", "w2", "w3"),
}


def quantize_dit_blocks_int8(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the per-block heavy matmuls of a (LongCat-layout) DiT
    param pytree; everything else is shared by reference. The result
    drops into the same forward code — ``ops.layers.linear`` dispatches
    on the 'kernel_i8' key."""
    blocks = params["blocks"]
    new_blocks = {}
    for group, sub in blocks.items():
        if group in _BLOCK_LINEARS:
            new_sub = {}
            for name, leaf in sub.items():
                if name in _BLOCK_LINEARS[group]:
                    new_sub[name] = quantize_linear_params(leaf)
                else:
                    new_sub[name] = leaf
            new_blocks[group] = new_sub
        else:
            new_blocks[group] = sub
    return {**params, "blocks": new_blocks}


def _quantize_named(tree: Dict[str, Any],
                    spec: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize leaves named by ``spec`` ({group: (names...)} or nested
    dicts); everything else passes through."""
    out = {}
    for key, val in tree.items():
        sel = spec.get(key)
        if sel is None:
            out[key] = val
        elif isinstance(sel, dict):
            out[key] = _quantize_named(val, sel)
        else:
            out[key] = {n: (quantize_linear_params(leaf) if n in sel
                            else leaf)
                        for n, leaf in val.items()}
    return out


def quantize_mmdit_blocks_int8(params: Dict[str, Any]) -> Dict[str, Any]:
    """MMDiT (Open-Sora v2 / Flux layout): quantize the double-stream
    img/txt attention + MLPs and the single-stream fused linears; mods,
    embedders, and final stay bf16."""
    spec = {
        "double": {
            "img_attn": ("qkv", "proj"),
            "txt_attn": ("qkv", "proj"),
            "img_mlp": ("w_in", "w_out"),
            "txt_mlp": ("w_in", "w_out"),
        },
    }
    out = _quantize_named(params, spec)
    single = dict(params["single"])
    for name in ("linear1", "linear2"):
        single[name] = quantize_linear_params(single[name])
    out["single"] = single
    return out


def quantize_cogvideox_blocks_int8(params: Dict[str, Any]
                                   ) -> Dict[str, Any]:
    """CogVideoX layout: quantize the joint-attention q/k/v/out and the
    feed-forward; LayerNormZero mod linears and embedders stay bf16."""
    spec = {
        "blocks": {
            "attn": ("to_q", "to_k", "to_v", "to_out"),
            "ff": ("w_in", "w_out"),
        },
    }
    return _quantize_named(params, spec)


QUANTIZERS_BY_ARCH = {
    "longcat": quantize_dit_blocks_int8,
    "mmdit": quantize_mmdit_blocks_int8,
    "cogvideox": quantize_cogvideox_blocks_int8,
}
