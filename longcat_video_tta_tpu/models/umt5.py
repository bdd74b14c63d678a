"""UMT5 text encoder, TPU-native.

Replaces the reference's ``transformers UMT5EncoderModel`` (loaded at
common.py:62-64, used via ``encode_prompt`` common.py:228-255: pad to
max_length 512, return last_hidden_state).

UMT5 specifics vs vanilla T5: every layer owns its *own* relative
position bias table (T5 shares layer 0's), gated-GELU FFN, RMSNorm,
no attention-logit scaling (T5 convention folds 1/sqrt(d) into init).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import TextEncoderConfig, resolve_dtype
from ..ops.layers import rms_norm


def _relative_position_bucket(rel_pos, num_buckets: int, max_distance: int):
    """Bidirectional T5 bucket mapping (half exact, half logarithmic)."""
    num_buckets = num_buckets // 2
    ret = jnp.where(rel_pos > 0, num_buckets, 0)
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


def relative_position_bias(table: jnp.ndarray, qlen: int, klen: int,
                           num_buckets: int, max_distance: int):
    """table: [num_buckets, heads] -> bias [1, heads, qlen, klen]."""
    ctx = jnp.arange(qlen)[:, None]
    mem = jnp.arange(klen)[None, :]
    buckets = _relative_position_bucket(mem - ctx, num_buckets, max_distance)
    bias = table[buckets]  # [qlen, klen, heads]
    return bias.transpose(2, 0, 1)[None]


def init_umt5(rng: jax.Array, cfg: TextEncoderConfig) -> Dict[str, Any]:
    pdtype = resolve_dtype(cfg.param_dtype)
    d, dkv, h, dff, L = cfg.d_model, cfg.d_kv, cfg.num_heads, cfg.d_ff, cfg.num_layers
    inner = h * dkv
    keys = iter(jax.random.split(rng, 8))

    def w(key, shape, scale):
        return (jax.random.normal(key, shape) * scale).astype(pdtype)

    return {
        "embed": w(next(keys), (cfg.vocab_size, d), 1.0),
        "blocks": {
            "ln1": jnp.ones((L, d), pdtype),
            "q": w(next(keys), (L, d, inner), (d * dkv) ** -0.5),
            "k": w(next(keys), (L, d, inner), d ** -0.5),
            "v": w(next(keys), (L, d, inner), d ** -0.5),
            "o": w(next(keys), (L, inner, d), inner ** -0.5),
            "rel_bias": jnp.zeros(
                (L, cfg.relative_attention_num_buckets, h), jnp.float32
            ),
            "ln2": jnp.ones((L, d), pdtype),
            "wi0": w(next(keys), (L, d, dff), d ** -0.5),
            "wi1": w(next(keys), (L, d, dff), d ** -0.5),
            "wo": w(next(keys), (L, dff, d), dff ** -0.5),
        },
        "final_ln": jnp.ones((d,), pdtype),
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def umt5_encode(params, cfg: TextEncoderConfig, input_ids: jnp.ndarray,
                attention_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """input_ids [B, L] -> last_hidden_state [B, L, d_model]."""
    cdtype = resolve_dtype(cfg.compute_dtype)
    B, L = input_ids.shape
    h, dkv = cfg.num_heads, cfg.d_kv
    x = params["embed"][input_ids].astype(cdtype)

    if attention_mask is not None:
        neg = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
    else:
        neg = jnp.zeros((B, 1, 1, L), jnp.float32)

    def body(x, bp):
        hn = rms_norm(x, bp["ln1"], eps=cfg.layer_norm_eps)
        q = (hn @ bp["q"].astype(cdtype)).reshape(B, L, h, dkv)
        k = (hn @ bp["k"].astype(cdtype)).reshape(B, L, h, dkv)
        v = (hn @ bp["v"].astype(cdtype)).reshape(B, L, h, dkv)
        bias = relative_position_bias(
            bp["rel_bias"], L, L,
            cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance,
        )
        # T5 attention: no 1/sqrt(d) scaling
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) + bias + neg
        probs = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
        o = o.reshape(B, L, h * dkv).astype(cdtype) @ bp["o"].astype(cdtype)
        x = x + o

        hn = rms_norm(x, bp["ln2"], eps=cfg.layer_norm_eps)
        g = jax.nn.gelu(hn @ bp["wi0"].astype(cdtype), approximate=True)
        u = hn @ bp["wi1"].astype(cdtype)
        x = x + (g * u) @ bp["wo"].astype(cdtype)
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = rms_norm(x, params["final_ln"], eps=cfg.layer_norm_eps)
    return x
