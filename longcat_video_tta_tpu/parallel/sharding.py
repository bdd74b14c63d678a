"""Sharding rules: params over the tensor axis, activations over
data x context.

Megatron-style layout for the stacked-block DiT param tree
(models/dit.py): column-parallel for qkv / cross q / cross kv / ffn
w1+w3 (shard the output dim), row-parallel for attn proj / cross proj /
ffn w2 (shard the input dim). Norm scales, adaLN, and embedders are
replicated (small). XLA/GSPMD inserts the psum/all-gather collectives.

Activation rule: video latents [B, C, T, H, W] shard batch over "data"
and the W axis over "context" — the direct analogue of the reference's
``cp_split_hw`` latent-grid split (common.py:71-73).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# path-suffix -> PartitionSpec for the stacked [L, in, out] kernels
_RULES = (
    ("blocks/attn/qkv/kernel", P(None, None, "tensor")),
    ("blocks/attn/qkv/bias", P(None, "tensor")),
    ("blocks/attn/proj/kernel", P(None, "tensor", None)),
    ("blocks/cross_attn/q/kernel", P(None, None, "tensor")),
    ("blocks/cross_attn/q/bias", P(None, "tensor")),
    ("blocks/cross_attn/kv/kernel", P(None, None, "tensor")),
    ("blocks/cross_attn/kv/bias", P(None, "tensor")),
    ("blocks/cross_attn/proj/kernel", P(None, "tensor", None)),
    ("blocks/ffn/w1/kernel", P(None, None, "tensor")),
    ("blocks/ffn/w3/kernel", P(None, None, "tensor")),
    ("blocks/ffn/w2/kernel", P(None, "tensor", None)),
    ("blocks/adaln/kernel", P(None, None, "tensor")),
    ("blocks/adaln/bias", P(None, "tensor")),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching ``params``."""

    def spec_for(path, leaf):
        ps = _path_str(path)
        for suffix, spec in _RULES:
            if ps == suffix:
                return spec
        return P()  # replicate

    return jax.tree_util.tree_map_with_path(spec_for, params)


def param_shardings(mesh: Mesh, params: Dict[str, Any]):
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), param_specs(params),
        is_leaf=lambda x: isinstance(x, P),
    )


# Activation specs
LATENT_SPEC = P("data", None, None, None, "context")   # [B,C,T,H,W]
TEXT_SPEC = P("data", None, None)                      # [B,L,C]
MASK_SPEC = P("data", None)                            # [B,L]
TIME_SPEC = P("data", None)                            # [B,nt]


def shard_params(mesh: Mesh, params):
    return jax.device_put(params, param_shardings(mesh, params))


def shard_batch(mesh: Mesh, latents, text_emb, text_mask):
    return (
        jax.device_put(latents, NamedSharding(mesh, LATENT_SPEC)),
        jax.device_put(text_emb, NamedSharding(mesh, TEXT_SPEC)),
        jax.device_put(text_mask, NamedSharding(mesh, MASK_SPEC)),
    )
