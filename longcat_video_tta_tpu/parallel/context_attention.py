"""Context-parallel attention over the token axis.

First-class sequence/context parallelism (SURVEY.md §2.10: the
reference's ``cp_split_hw`` latent-grid split + LongCat CP internals,
always run degenerate at size 1): video tokens shard over the mesh's
``context`` axis; each device all-gathers K/V over ICI and attends its
local query shard. The conditioning-prefix rule (ops/attention.py) is
applied with *global* query indices, so prefix semantics are preserved
across shards.

This is the all-gather-KV formulation — one tiled all-gather per layer,
memory O(S_global) for K/V but O(S_local) for activations. The Pallas
ring variant (neighbor RDMA exchange, O(S_local) K/V memory) is the
round-2 upgrade; this module fixes the API and the masking semantics it
must reproduce.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.attention import NEG_INF

TOKEN_SPEC = P(None, "context", None, None)  # [B, S, H, D]


def _local_attention(ql, kg, vg, q_offset, num_cond_tokens: int,
                     scale: Optional[float]):
    """Attention of a local query shard against the gathered K/V with the
    global prefix mask. q_offset is traced (axis_index-derived)."""
    B, Sq, H, D = ql.shape
    Sk = kg.shape[1]
    if scale is None:
        scale = D ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", ql.astype(jnp.float32),
                        kg.astype(jnp.float32)) * scale
    if num_cond_tokens > 0:
        q_idx = q_offset + jnp.arange(Sq)[:, None]
        k_idx = jnp.arange(Sk)[None, :]
        allowed = (q_idx >= num_cond_tokens) | (k_idx < num_cond_tokens)
        logits = jnp.where(allowed[None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vg.astype(jnp.float32))
    return out.astype(ql.dtype)


def cp_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    num_cond_tokens: int = 0,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Self-attention with q/k/v token-sharded over mesh axis "context".

    q, k, v: [B, S, H, D] with S divisible by the context axis size.
    Output keeps the same token sharding. Equivalent to the unsharded
    ``attention_xla`` (tested on the virtual CPU mesh).
    """
    from jax.experimental.shard_map import shard_map

    def local(ql, kl, vl):
        kg = jax.lax.all_gather(kl, "context", axis=1, tiled=True)
        vg = jax.lax.all_gather(vl, "context", axis=1, tiled=True)
        q_offset = jax.lax.axis_index("context") * ql.shape[1]
        return _local_attention(ql, kg, vg, q_offset, num_cond_tokens, scale)

    f = shard_map(
        local, mesh=mesh,
        in_specs=(TOKEN_SPEC, TOKEN_SPEC, TOKEN_SPEC),
        out_specs=TOKEN_SPEC,
        check_rep=False,
    )
    return f(q, k, v)
