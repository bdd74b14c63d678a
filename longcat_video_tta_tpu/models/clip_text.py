"""CLIP-L/14 text encoder (pooled output) for the Open-Sora v2 MMDiT's
``y_vec`` conditioning.

The reference gets y_vec from Open-Sora's HFEmbedder CLIP wrapper
(common_opensora.py:82-105 ``y_vec = clip([prompt])``). This is the
standard CLIP text tower: token + learned positional embeddings, 12
pre-LN causal transformer layers with quick-GELU MLPs, final LayerNorm,
pooled = hidden state at the EOT (argmax token id) position. Flux-family
models consume the pooled state directly (no text_projection).

Weights convert from the HF ``CLIPTextModel`` state_dict
(convert.convert_torch_clip_text_state).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import CLIPTextConfig
from ..ops.layers import layer_norm


def init_clip_text(rng: jax.Array, cfg: CLIPTextConfig) -> Dict[str, Any]:
    counter = [0]

    def key():
        counter[0] += 1
        return jax.random.fold_in(rng, counter[0])

    def dense(din, dout, depth):
        return {
            "kernel": jax.random.normal(key(), (depth, din, dout),
                                        jnp.float32) * 0.02,
            "bias": jnp.zeros((depth, dout), jnp.float32),
        }

    W, L = cfg.width, cfg.num_layers
    return {
        "token_embedding": jax.random.normal(
            key(), (cfg.vocab_size, W), jnp.float32) * 0.02,
        "position_embedding": jax.random.normal(
            key(), (cfg.max_length, W), jnp.float32) * 0.01,
        "layers": {
            "ln1": {"weight": jnp.ones((L, W)), "bias": jnp.zeros((L, W))},
            "q": dense(W, W, L), "k": dense(W, W, L), "v": dense(W, W, L),
            "out": dense(W, W, L),
            "ln2": {"weight": jnp.ones((L, W)), "bias": jnp.zeros((L, W))},
            "fc1": dense(W, 4 * W, L), "fc2": dense(4 * W, W, L),
        },
        "final_ln": {"weight": jnp.ones((W,)), "bias": jnp.zeros((W,))},
    }


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def clip_encoder(layers: Dict[str, Any], x: jnp.ndarray, num_heads: int,
                 head_dim: int, causal: bool = False) -> jnp.ndarray:
    """Pre-LN quick-GELU CLIP transformer stack, scanned over layers.

    One body for BOTH towers (text: causal; vision: non-causal, see
    models/clip.py) so numerics fixes — e.g. the LN eps — cannot drift
    between the gate scorer and the MMDiT y_vec path."""
    B, S, _ = x.shape
    mask = jnp.tril(jnp.ones((S, S), bool)) if causal else None
    neg = jnp.asarray(-1e30, jnp.float32)

    def body(x, lp):
        h = layer_norm(x, lp["ln1"]["weight"], lp["ln1"]["bias"], eps=1e-5)

        def proj(p, t):
            return (jnp.dot(t, p["kernel"]) + p["bias"]).reshape(
                B, S, num_heads, head_dim)

        q, k, v = proj(lp["q"], h), proj(lp["k"], h), proj(lp["v"], h)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (head_dim ** -0.5)
        if mask is not None:
            logits = jnp.where(mask[None, None], logits, neg)
        o = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(logits, axis=-1), v)
        x = x + jnp.dot(o.reshape(B, S, -1), lp["out"]["kernel"]) \
            + lp["out"]["bias"]

        h = layer_norm(x, lp["ln2"]["weight"], lp["ln2"]["bias"], eps=1e-5)
        h = _quick_gelu(jnp.dot(h, lp["fc1"]["kernel"]) + lp["fc1"]["bias"])
        x = x + jnp.dot(h, lp["fc2"]["kernel"]) + lp["fc2"]["bias"]
        return x, None

    x, _ = jax.lax.scan(body, x, layers)
    return x


@functools.partial(jax.jit, static_argnames=("cfg",))
def clip_text_pooled(
    params: Dict[str, Any],
    cfg: CLIPTextConfig,
    input_ids: jnp.ndarray,        # [B, max_length] int32
) -> jnp.ndarray:
    """-> pooled [B, width]: final-LN hidden at the EOT position
    (EOT = argmax token id, the CLIP convention)."""
    B, S = input_ids.shape
    x = params["token_embedding"][input_ids] \
        + params["position_embedding"][None, :S]
    x = clip_encoder(params["layers"], x, cfg.num_heads, cfg.head_dim,
                     causal=True)
    x = layer_norm(x, params["final_ln"]["weight"],
                   params["final_ln"]["bias"], eps=1e-5)
    eot = jnp.argmax(input_ids, axis=-1)
    return x[jnp.arange(B), eot]
