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


# CogVideoX (models/cogvideox.py): separate to_q/to_k/to_v columns,
# to_out row, GELU FFN, LayerNormZero modulation matmuls (6D outputs,
# ~0.8 GB of params at 5B — worth sharding; the [B,1,6D] modulation
# activation GSPMD reshards is negligible).
_RULES_COGVIDEOX = (
    ("blocks/attn/to_q/kernel", P(None, None, "tensor")),
    ("blocks/attn/to_q/bias", P(None, "tensor")),
    ("blocks/attn/to_k/kernel", P(None, None, "tensor")),
    ("blocks/attn/to_k/bias", P(None, "tensor")),
    ("blocks/attn/to_v/kernel", P(None, None, "tensor")),
    ("blocks/attn/to_v/bias", P(None, "tensor")),
    ("blocks/attn/to_out/kernel", P(None, "tensor", None)),
    ("blocks/ff/w_in/kernel", P(None, None, "tensor")),
    ("blocks/ff/w_in/bias", P(None, "tensor")),
    ("blocks/ff/w_out/kernel", P(None, "tensor", None)),
    ("blocks/norm1/lin/kernel", P(None, None, "tensor")),
    ("blocks/norm1/lin/bias", P(None, "tensor")),
    ("blocks/norm2/lin/kernel", P(None, None, "tensor")),
    ("blocks/norm2/lin/bias", P(None, "tensor")),
)

# MMDiT (models/mmdit.py): fused qkv columns (3D divisible by tensor),
# proj/linear2 rows, modulation matmuls column-sharded.
_RULES_MMDIT = (
    ("double/img_attn/qkv/kernel", P(None, None, "tensor")),
    ("double/img_attn/qkv/bias", P(None, "tensor")),
    ("double/img_attn/proj/kernel", P(None, "tensor", None)),
    ("double/txt_attn/qkv/kernel", P(None, None, "tensor")),
    ("double/txt_attn/qkv/bias", P(None, "tensor")),
    ("double/txt_attn/proj/kernel", P(None, "tensor", None)),
    ("double/img_mlp/w_in/kernel", P(None, None, "tensor")),
    ("double/img_mlp/w_in/bias", P(None, "tensor")),
    ("double/img_mlp/w_out/kernel", P(None, "tensor", None)),
    ("double/txt_mlp/w_in/kernel", P(None, None, "tensor")),
    ("double/txt_mlp/w_in/bias", P(None, "tensor")),
    ("double/txt_mlp/w_out/kernel", P(None, "tensor", None)),
    ("double/img_mod/kernel", P(None, None, "tensor")),
    ("double/img_mod/bias", P(None, "tensor")),
    ("double/txt_mod/kernel", P(None, None, "tensor")),
    ("double/txt_mod/bias", P(None, "tensor")),
    ("single/mod/kernel", P(None, None, "tensor")),
    ("single/mod/bias", P(None, "tensor")),
    ("single/linear1/kernel", P(None, None, "tensor")),
    ("single/linear1/bias", P(None, "tensor")),
    ("single/linear2/kernel", P(None, "tensor", None)),
)

_RULES_BY_ARCH = {
    "longcat": _RULES,
    "cogvideox": _RULES_COGVIDEOX,
    "mmdit": _RULES_MMDIT,
}


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def param_specs(params: Dict[str, Any],
                arch: str = "longcat") -> Dict[str, Any]:
    """PartitionSpec pytree matching ``params`` (TP rules per arch)."""
    rules = _RULES_BY_ARCH[arch]
    matched = [0]

    def spec_for(path, leaf):
        ps = _path_str(path)
        for suffix, spec in rules:
            if ps == suffix:
                matched[0] += 1
                return spec
        # int8-quantized linears (ops/quant.py) rename kernel ->
        # kernel_i8 (same [.., K, N] layout) and add a per-output-
        # channel scale ([.., N] = the kernel spec minus its
        # contraction axis). Without this mapping every heavy matmul
        # of a quantized tree would silently replicate under TP — and
        # the matched==0 guard below could not fire because the
        # unquantized small leaves still match.
        if ps.endswith("/kernel_i8") or ps.endswith("/scale"):
            base = ps.rsplit("/", 1)[0] + "/kernel"
            for suffix, spec in rules:
                if base == suffix:
                    matched[0] += 1
                    if ps.endswith("/kernel_i8"):
                        return spec
                    tup = tuple(spec)
                    return P(*(tup[:-2] + tup[-1:]))
        return P()  # replicate

    out = jax.tree_util.tree_map_with_path(spec_for, params)
    if matched[0] == 0:
        # an arch/tree mismatch matches no rule and silently replicates
        # every parameter — the exact failure TP exists to prevent
        raise ValueError(
            f"no {arch!r} TP rule matched any leaf of the param tree — "
            f"wrong arch for this tree? (archs: {sorted(_RULES_BY_ARCH)})")
    return out


def param_shardings(mesh: Mesh, params: Dict[str, Any],
                    arch: str = "longcat"):
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), param_specs(params, arch),
        is_leaf=lambda x: isinstance(x, P),
    )


# Activation specs
LATENT_SPEC = P("data", None, None, None, "context")   # [B,C,T,H,W]
TEXT_SPEC = P("data", None, None)                      # [B,L,C]
MASK_SPEC = P("data", None)                            # [B,L]
TIME_SPEC = P("data", None)                            # [B,nt]


def shard_params(mesh: Mesh, params, arch: str = "longcat"):
    """Place ``params`` with the per-arch TP rules. ``arch`` must match
    the tree ('longcat'|'mmdit'|'cogvideox') — the wrong arch would
    silently replicate every parameter (no rule matches), negating TP."""
    return jax.device_put(params, param_shardings(mesh, params, arch))


def shard_batch(mesh: Mesh, latents, text_emb, text_mask):
    return (
        jax.device_put(latents, NamedSharding(mesh, LATENT_SPEC)),
        jax.device_put(text_emb, NamedSharding(mesh, TEXT_SPEC)),
        jax.device_put(text_mask, NamedSharding(mesh, MASK_SPEC)),
    )
