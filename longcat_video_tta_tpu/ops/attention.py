"""Attention ops with LongCat conditioning semantics.

TPU-native replacement for the reference's flash-attn-2 CUDA path
(reference: common.py:71-74 ``enable_flashattn2=True``; SURVEY.md §2.9).

The LongCat DiT treats the first ``num_cond_latents`` latent frames as a
clean-conditioning prefix (reference: common.py:414-489). The attention
rule that makes conditioning KV-cache exact (``use_kv_cache=True`` in
``generate_vc``, common.py:606-608) is *prefix-block-causal*:

    allowed(q_i, k_j) = (i >= num_cond_tokens) or (j < num_cond_tokens)

i.e. noise-region queries attend everywhere, conditioning queries attend
only within the conditioning prefix — so conditioning activations (and
their K/V) are independent of the noise tokens and can be computed once
per video and reused across all denoise steps.

Two implementations:
  - ``xla``:    pure-jnp reference (CPU tests, fallback, autodiff oracle)
  - ``pallas``: fused flash-attention kernel (ops/flash_attention.py)

Public arrays are [B, S, H, D] (batch, seq, heads, head_dim).
"""

from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _prefix_mask(num_q: int, num_k: int, num_cond_q: int, num_cond_k: int,
                 kv_valid_len) -> Optional[jnp.ndarray]:
    """Build the [num_q, num_k] boolean allowed-mask, or None if all-true.
    ``kv_valid_len`` may be a static int or a traced int32 scalar (shape
    bucketing — see flash_attention)."""
    need_cond = num_cond_q > 0
    need_pad = kv_valid_len is not None and (
        not isinstance(kv_valid_len, int) or kv_valid_len < num_k)
    if not need_cond and not need_pad:
        return None
    q_idx = jnp.arange(num_q)[:, None]
    k_idx = jnp.arange(num_k)[None, :]
    allowed = jnp.ones((num_q, num_k), dtype=bool)
    if need_cond:
        allowed = (q_idx >= num_cond_q) | (k_idx < num_cond_k)
    if need_pad:
        allowed = allowed & (k_idx < kv_valid_len)
    return allowed


def attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    num_cond_tokens: int = 0,
    kv_valid_len: Optional[int] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Reference attention in plain jnp (fp32 softmax).

    q: [B, Sq, H, D]; k, v: [B, Sk, H, D]. ``num_cond_tokens`` marks the
    conditioning prefix length in *both* q and k when Sq == Sk (training /
    no-cache path). When Sq != Sk (KV-cache decode: q holds only noise
    tokens), conditioning queries are absent and only the key-side prefix
    matters — which is attend-to-everything, so no mask is applied.
    """
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    if scale is None:
        scale = D ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    num_cond_q = num_cond_tokens if Sq == Sk else 0
    mask = _prefix_mask(Sq, Sk, num_cond_q, num_cond_tokens, kv_valid_len)
    if mask is not None:
        logits = jnp.where(mask[None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    num_cond_tokens: int = 0,
    kv_valid_len=None,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Dispatching attention entry point. See :func:`attention_xla`.

    Not jitted itself: every call site already sits under an outer jit
    (dit_forward / the samplers), and ``kv_valid_len`` must be allowed to
    stay a traced scalar for shape bucketing."""
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return attention_xla(
            q, k, v, num_cond_tokens=num_cond_tokens,
            kv_valid_len=kv_valid_len, scale=scale,
        )
    from .flash_attention import flash_attention

    return flash_attention(
        q, k, v, num_cond_tokens=num_cond_tokens,
        kv_valid_len=kv_valid_len, scale=scale,
    )
