"""Primitive layers shared across models: norms, modulation, linear+LoRA,
sinusoidal embeddings, 3D RoPE.

All pure functions over explicit param pytrees — the property that lets
every TTA method (SURVEY.md §2.3) be expressed as parameter surgery
instead of the reference's nn.Module hook machinery.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: Optional[jnp.ndarray], eps: float = 1e-6):
    """RMSNorm with optional learned scale (DiT qk_norm; reference norm-tune
    targets these weights, run_norm_tune_tta.py:86-96)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    if weight is not None:
        x = x * weight.astype(jnp.float32)
    return x.astype(dtype)


def layer_norm(x: jnp.ndarray, weight=None, bias=None, eps: float = 1e-6):
    """LayerNorm; affine optional (DiT norm1/norm2 are affine-free, the
    pre-cross-attn norm carries weight+bias — run_norm_tune_tta.py:79-84)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        x = x * weight.astype(jnp.float32)
    if bias is not None:
        x = x + bias.astype(jnp.float32)
    return x.astype(dtype)


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray):
    """adaLN modulation x * (1 + scale) + shift."""
    return x * (1.0 + scale) + shift


def linear(p, x: jnp.ndarray, lora=None, lora_scale=None):
    """Dense layer with optional fused LoRA contribution.

    ``p``: {'kernel': [in, out], optional 'bias': [out]} — or the int8
    form {'kernel_i8', 'scale', 'bias'?} from ops/quant.py, which routes
    to the W8A8 path (decode-only quantization).
    ``lora``: {'a': [in, r], 'b': [r, out]} — output += (x@a)@b * scale,
    the reference's LoRALinear math (run_lora_tta.py:255-260) as a pure
    function.
    """
    if "kernel_i8" in p:
        from .quant import int8_linear

        return int8_linear(p, x, lora=lora, lora_scale=lora_scale)
    y = jnp.dot(x, p["kernel"].astype(x.dtype))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    if lora is not None:
        lx = jnp.dot(x, lora["a"].astype(x.dtype))
        lx = jnp.dot(lx, lora["b"].astype(x.dtype))
        y = y + lx * jnp.asarray(lora_scale, x.dtype)
    return y


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal timestep features, computed in fp32 (the reference keeps
    t_embedder in fp32 under autocast — run_delta_a.py:161-165)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def mlp_embedder(p, feats: jnp.ndarray):
    """2-layer SiLU MLP used by t_embedder (fp32)."""
    h = jnp.dot(feats, p["w1"]) + p["b1"]
    h = jax.nn.silu(h)
    return jnp.dot(h, p["w2"]) + p["b2"]


# ---------------------------------------------------------------------------
# 3D rotary position embedding
# ---------------------------------------------------------------------------


def rope_3d_angles(
    n_t: int, n_h: int, n_w: int,
    rope_dims: Tuple[int, int, int],
    theta: float = 10000.0,
    t_offset: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables [n_t, n_h*n_w, head_dim//2] for factored (t,h,w) RoPE.

    ``t_offset`` shifts temporal positions — the KV-cache decode path places
    noise-frame tokens after the conditioning frames so cached and uncached
    forwards agree exactly.
    """
    def axis_angles(n, d, offset=0):
        freqs = 1.0 / (
            theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d)
        )  # [d//2]
        pos = jnp.arange(n, dtype=jnp.float32) + offset
        return pos[:, None] * freqs[None, :]  # [n, d//2]

    dt, dh, dw = rope_dims
    at = axis_angles(n_t, dt, t_offset)          # [n_t, dt//2]
    ah = axis_angles(n_h, dh)                    # [n_h, dh//2]
    aw = axis_angles(n_w, dw)                    # [n_w, dw//2]

    at_full = jnp.broadcast_to(at[:, None, None, :], (n_t, n_h, n_w, dt // 2))
    ah_full = jnp.broadcast_to(ah[None, :, None, :], (n_t, n_h, n_w, dh // 2))
    aw_full = jnp.broadcast_to(aw[None, None, :, :], (n_t, n_h, n_w, dw // 2))
    ang = jnp.concatenate([at_full, ah_full, aw_full], axis=-1)
    ang = ang.reshape(n_t, n_h * n_w, -1)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Apply half-split rotary embedding.

    x: [B, n_t, n_hw, heads, head_dim]; cos/sin: [n_t, n_hw, head_dim//2].
    """
    half = x.shape[-1] // 2
    xa, xb = x[..., :half], x[..., half:]
    c = cos[None, :, :, None, :].astype(x.dtype)
    s = sin[None, :, :, None, :].astype(x.dtype)
    return jnp.concatenate([xa * c - xb * s, xb * c + xa * s], axis=-1)


def remat_wrap(body, remat: bool, policy: str = "full"):
    """Per-block gradient-checkpoint wrapper shared by the model stacks.

    ``policy="dots"`` saves matmul outputs and recomputes only the cheap
    elementwise/norm ops in the backward pass
    (jax.checkpoint_policies.dots_with_no_batch_dims_saveable) — ~10%
    faster TTA step at bench scale on v5e when HBM allows; "full" is the
    minimum-memory default (the reference's non-reentrant torch
    checkpoint, run_delta_a.py:469-473).

    ``policy="dots_attn"`` additionally saves the flash-attention kernel
    residuals (the "flash_out"/"flash_lse" names tagged in
    ops/flash_attention.py), so the block backward skips the forward
    flash kernel re-run entirely — costs one extra [B,S,D] bf16 + one
    [B,H,S] f32 per attention site."""
    import jax

    if not remat:
        return body
    if policy == "dots":
        return jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    if policy == "dots_attn":
        return jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                jax.checkpoint_policies.save_only_these_names(
                    "flash_out", "flash_lse")))
    return jax.checkpoint(body)
