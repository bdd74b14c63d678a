"""The seven TTA methods as parameter-surgery schemes.

Each reference method (SURVEY.md §2.3) is a wrapper/hook pair in torch;
here each is an ``AdapterScheme``: a trainable pytree ``init()`` plus a
pure ``to_forward(train_params, base_params) -> (dit_params, adapters)``
mapping consumed identically by training losses and the sampler. Group
sharing, partial dims, and block scoping are all expressed inside
``to_forward`` so gradients flow to the compact trainable form.

Method -> reference:
  full       run_full_tta.py:95-310   (all params)
  lora       run_lora_tta.py:104-634  (rank-r per linear; kaiming down,
                                       zero up, scale alpha/rank)
  delta_a    run_delta_a.py:88-217    (one 512-d delta on the t-embed)
  delta_b    run_delta_b.py:99-444    ("AdaSteer": G group deltas,
                                       timestep or hidden target,
                                       partial dims zero-padded,
                                       block scoping all/last_N/indices)
  delta_c    run_delta_c.py:82-246    (16-d per-channel output residual)
  norm_tune  run_norm_tune_tta.py:74-230 (unfreeze norm affines)
  film       run_film_tta.py:78-330   (adaLN-output corrections per
                                       group; modes full/shift_scale/
                                       scale_only)
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp

from ..config import AdapterConfig, DiTConfig
from ..utils.memo import memoize_factory


# ---------------------------------------------------------------------------
# Block scoping (reference: _parse_target_blocks, run_delta_b.py:424-444)
# ---------------------------------------------------------------------------


def parse_target_blocks(target_blocks: str, num_blocks: int) -> Optional[Set[int]]:
    """"all" -> None; "last_N" -> trailing N; "0,5,10" -> explicit set."""
    t = target_blocks.strip().lower()
    if t == "all":
        return None
    if t.startswith("last_"):
        n = int(t.split("_", 1)[1])
        if n <= 0 or n > num_blocks:
            raise ValueError(f"last_{n} invalid for {num_blocks} blocks")
        return set(range(num_blocks - n, num_blocks))
    idxs = {int(x.strip()) for x in t.split(",")}
    for i in idxs:
        if not 0 <= i < num_blocks:
            raise ValueError(f"block index {i} out of range [0, {num_blocks})")
    return idxs


def block_group_map(num_blocks: int, num_groups: int) -> Tuple[int, ...]:
    """Blocks split evenly into groups (reference: run_delta_b.py:153-157)."""
    per = math.ceil(num_blocks / num_groups)
    return tuple(min(i // per, num_groups - 1) for i in range(num_blocks))


def _active_mask(num_blocks: int, targets: Optional[Set[int]]) -> jnp.ndarray:
    if targets is None:
        return jnp.ones((num_blocks,), jnp.float32)
    return jnp.asarray(
        [1.0 if i in targets else 0.0 for i in range(num_blocks)], jnp.float32
    )


def _pad_dim(x: jnp.ndarray, full: int) -> jnp.ndarray:
    """Zero-pad trailing dim to ``full`` (partial-dim deltas,
    run_delta_b.py:161-165)."""
    if x.shape[-1] >= full:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, full - x.shape[-1])]
    return jnp.pad(x, pad)


# ---------------------------------------------------------------------------
# Param-path partition (norm_tune / full)
# ---------------------------------------------------------------------------


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


NORM_TARGET_PATHS = {
    # reference: collect_norm_params, run_norm_tune_tta.py:74-98
    "cross_attn_norm": ("blocks/pre_crs_norm/weight", "blocks/pre_crs_norm/bias"),
    "qk_norm": (
        "blocks/attn/q_norm", "blocks/attn/k_norm",
        "blocks/cross_attn/q_norm", "blocks/cross_attn/k_norm",
    ),
}
NORM_TARGET_PATHS["all_norm"] = (
    NORM_TARGET_PATHS["cross_attn_norm"] + NORM_TARGET_PATHS["qk_norm"]
)


def partition_params(params, trainable_paths: Sequence[str]) -> Dict[str, Any]:
    """Extract trainable leaves as a flat {path: leaf} dict (optax-friendly
    pytree; no None placeholders)."""
    paths = tuple(trainable_paths)

    def is_trainable(path_s: str) -> bool:
        return any(path_s.startswith(p) or path_s == p for p in paths)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {
        _path_str(path): leaf for path, leaf in flat
        if is_trainable(_path_str(path))
    }


def merge_params(params, trainable: Dict[str, Any]):
    """Write {path: leaf} entries back into a full param pytree."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves = [trainable.get(_path_str(p), leaf) for p, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# AdapterScheme
# ---------------------------------------------------------------------------


class AdapterScheme:
    """One TTA method = init + pure to_forward mapping.

    ``to_forward(train_params, base_params)`` returns
    ``(dit_params, adapters_dict)`` — the two things every loss and the
    sampler need. For adapter methods dit_params is base_params
    unchanged; for full/norm_tune it's the merge of trainable slices
    into the frozen remainder.
    """

    method = "base"

    def __init__(self, dit_cfg: DiTConfig, acfg: AdapterConfig):
        self.cfg = dit_cfg
        self.acfg = acfg

    def init(self, rng: jax.Array, base_params=None):
        raise NotImplementedError

    def to_forward(self, train_params, base_params):
        raise NotImplementedError

    def num_params(self, train_params) -> int:
        return sum(
            int(x.size) for x in jax.tree_util.tree_leaves(train_params)
        )


class DeltaAScheme(AdapterScheme):
    method = "delta_a"

    def init(self, rng, base_params=None):
        return {"delta": jnp.zeros((self.cfg.adaln_tembed_dim,), jnp.float32)}

    def to_forward(self, train_params, base_params):
        return base_params, {"delta_t": train_params["delta"]}


class DeltaBScheme(AdapterScheme):
    method = "delta_b"

    def __init__(self, dit_cfg, acfg):
        super().__init__(dit_cfg, acfg)
        self.groups = block_group_map(dit_cfg.depth, acfg.num_groups)
        self.targets = parse_target_blocks(acfg.target_blocks, dit_cfg.depth)
        self.full_dim = (
            dit_cfg.adaln_tembed_dim if acfg.delta_target == "timestep"
            else dit_cfg.hidden_size
        )
        self.dim = acfg.delta_dim or self.full_dim

    def init(self, rng, base_params=None):
        p = {"deltas": jnp.zeros((self.acfg.num_groups, self.dim), jnp.float32)}
        if self.acfg.delta_target == "hidden":
            p["delta_final"] = jnp.zeros((self.dim,), jnp.float32)
        return p

    def to_forward(self, train_params, base_params):
        padded = _pad_dim(train_params["deltas"], self.full_dim)  # [G, full]
        gmap = jnp.asarray(self.groups, jnp.int32)
        per_block = padded[gmap]  # [depth, full]
        per_block = per_block * _active_mask(self.cfg.depth, self.targets)[:, None]
        if self.acfg.delta_target == "timestep":
            ad = {"delta_t_blocks": per_block}
        else:
            ad = {
                "delta_h_blocks": per_block,
                "delta_h_final": _pad_dim(train_params["delta_final"],
                                          self.full_dim),
            }
        return base_params, ad


class DeltaCScheme(AdapterScheme):
    method = "delta_c"

    def init(self, rng, base_params=None):
        return {"delta_out": jnp.zeros((self.cfg.out_channels,), jnp.float32)}

    def to_forward(self, train_params, base_params):
        return base_params, {"delta_out": train_params["delta_out"]}


class FiLMScheme(AdapterScheme):
    method = "film"

    _MODE_CHUNKS = {
        # chunk layout [shift_msa, scale_msa, gate_msa, shift_mlp,
        # scale_mlp, gate_mlp] (run_film_tta.py:105-141)
        "full": (0, 1, 2, 3, 4, 5),
        "shift_scale": (0, 1, 3, 4),
        "scale_only": (1, 4),
    }

    def __init__(self, dit_cfg, acfg):
        super().__init__(dit_cfg, acfg)
        self.groups = block_group_map(dit_cfg.depth, acfg.num_groups)
        self.chunks = self._MODE_CHUNKS[acfg.film_mode]
        self.dim = len(self.chunks) * dit_cfg.hidden_size

    def init(self, rng, base_params=None):
        return {"corrections": jnp.zeros((self.acfg.num_groups, self.dim),
                                         jnp.float32)}

    def _expand(self, corr):
        """[G, k*D] -> [G, 6*D] zero-filling untouched chunks."""
        D = self.cfg.hidden_size
        G = corr.shape[0]
        full = jnp.zeros((G, 6 * D), corr.dtype)
        for j, chunk in enumerate(self.chunks):
            full = full.at[:, chunk * D:(chunk + 1) * D].set(
                corr[:, j * D:(j + 1) * D]
            )
        return full

    def to_forward(self, train_params, base_params):
        full = self._expand(train_params["corrections"])
        gmap = jnp.asarray(self.groups, jnp.int32)
        return base_params, {"film_blocks": full[gmap]}


# LoRA sites -> (in_dim_fn, out_dim_fn) in terms of the DiT config
_LORA_SITES = {
    "qkv": lambda c: (c.hidden_size, 3 * c.hidden_size),
    "attn_proj": lambda c: (c.hidden_size, c.hidden_size),
    "xattn_q": lambda c: (c.hidden_size, c.hidden_size),
    "xattn_kv": lambda c: (c.hidden_size, 2 * c.hidden_size),
    "xattn_proj": lambda c: (c.hidden_size, c.hidden_size),
    "ffn_w1": lambda c: (c.hidden_size, c.ffn_dim),
    "ffn_w2": lambda c: (c.ffn_dim, c.hidden_size),
    "ffn_w3": lambda c: (c.hidden_size, c.ffn_dim),
}


# site -> (group, name) path inside base_params["blocks"] for the
# builtin merged-weight formulation
_LORA_PARAM_PATHS = {
    "qkv": ("attn", "qkv"), "attn_proj": ("attn", "proj"),
    "xattn_q": ("cross_attn", "q"), "xattn_kv": ("cross_attn", "kv"),
    "xattn_proj": ("cross_attn", "proj"),
    "ffn_w1": ("ffn", "w1"), "ffn_w2": ("ffn", "w2"),
    "ffn_w3": ("ffn", "w3"),
}


def lora_site_names(target_modules: Sequence[str], target_ffn: bool) -> List[str]:
    """Map the reference's --lora-target-modules/--lora-target-ffn flags
    (run_lora_tta.py:142-168) to our site names."""
    sites: List[str] = []
    if "qkv" in target_modules:
        sites += ["qkv", "xattn_q", "xattn_kv"]
    if "proj" in target_modules:
        sites += ["attn_proj", "xattn_proj"]
    if target_ffn:
        sites += ["ffn_w1", "ffn_w2", "ffn_w3"]
    return sites


class LoRAScheme(AdapterScheme):
    method = "lora"

    def __init__(self, dit_cfg, acfg):
        super().__init__(dit_cfg, acfg)
        self.sites = lora_site_names(acfg.lora_target_modules, acfg.lora_target_ffn)
        self.targets = parse_target_blocks(acfg.target_blocks, dit_cfg.depth)
        self.rank = acfg.lora_rank
        self.scale = acfg.lora_alpha / acfg.lora_rank
        self.builtin = getattr(acfg, "lora_builtin", False)

    def init(self, rng, base_params=None):
        L, r = self.cfg.depth, self.rank
        p = {}
        keys = jax.random.split(rng, len(self.sites))
        for key, site in zip(keys, self.sites):
            din, dout = _LORA_SITES[site](self.cfg)
            # kaiming-uniform down (a=sqrt(5) torch convention ~ U(+-1/sqrt(din)))
            bound = 1.0 / math.sqrt(din)
            p[site] = {
                "a": jax.random.uniform(key, (L, din, r), jnp.float32,
                                        -bound, bound),
                "b": jnp.zeros((L, r, dout), jnp.float32),
            }
        return p

    def to_forward(self, train_params, base_params):
        mask = _active_mask(self.cfg.depth, self.targets)[:, None, None]
        if self.builtin:
            # merged-weight formulation (reference builtin LoRAModule
            # forward patch): W' = W + scale * a b per site; asserted
            # equivalent to the side-branch in tests/test_tta.py
            blocks = dict(base_params["blocks"])
            for site, ab in train_params.items():
                g1, g2 = _LORA_PARAM_PATHS[site]
                grp = dict(blocks[g1])
                p = dict(grp[g2])
                delta = jnp.einsum("ldr,lrb->ldb", ab["a"] * mask,
                                   ab["b"]) * self.scale
                p["kernel"] = p["kernel"] + delta.astype(p["kernel"].dtype)
                grp[g2] = p
                blocks[g1] = grp
            merged = dict(base_params)
            merged["blocks"] = blocks
            return merged, {}
        lora = {
            site: {"a": ab["a"] * mask, "b": ab["b"]}
            for site, ab in train_params.items()
        }
        return base_params, {"lora": lora, "lora_scale": self.scale}

    def num_params(self, train_params) -> int:
        """Count only params in targeted blocks (matches the reference's
        per-module counting, run_lora_tta.py:193-198)."""
        n_active = (self.cfg.depth if self.targets is None
                    else len(self.targets))
        total = 0
        for site, ab in train_params.items():
            per_block = ab["a"].shape[1] * self.rank + self.rank * ab["b"].shape[2]
            total += per_block * n_active
        return total


class NormTuneScheme(AdapterScheme):
    method = "norm_tune"

    def __init__(self, dit_cfg, acfg):
        super().__init__(dit_cfg, acfg)
        self.paths = NORM_TARGET_PATHS[acfg.norm_target]
        # reference: --also-tune-delta trains a delta_a vector alongside
        # the norm affines (run_norm_tune_tta.py:311)
        self.also_tune_delta = getattr(acfg, "also_tune_delta", False)

    def init(self, rng, base_params=None):
        norms = partition_params(base_params, self.paths)
        if self.also_tune_delta:
            return {"norms": norms,
                    "delta_t": jnp.zeros(
                        (self.cfg.adaln_tembed_dim,), jnp.float32)}
        return norms

    def to_forward(self, train_params, base_params):
        if self.also_tune_delta:
            return (merge_params(base_params, train_params["norms"]),
                    {"delta_t": train_params["delta_t"]})
        return merge_params(base_params, train_params), None


class FullScheme(AdapterScheme):
    method = "full"

    def init(self, rng, base_params=None):
        return base_params

    def to_forward(self, train_params, base_params):
        return train_params, None


SCHEMES = {
    "delta_a": DeltaAScheme,
    "delta_b": DeltaBScheme,
    "delta_c": DeltaCScheme,
    "film": FiLMScheme,
    "lora": LoRAScheme,
    "norm_tune": NormTuneScheme,
    "full": FullScheme,
}


# ---------------------------------------------------------------------------
# MMDiT (Open-Sora v2) backbone schemes
# ---------------------------------------------------------------------------
#
# The reference ports three methods to each backbone: delta_a, lora,
# full (backbone_experiment/opensora/run_{delta_a,lora_tta,full_tta}_
# opensora.py). delta_a and full reuse the generic schemes unchanged
# (MMDiTConfig.adaln_tembed_dim is the vec width); LoRA needs the MMDiT
# site map (lora_layers.py:309-416: double img/txt attn qkv+proj,
# optional mlp; single linear1/linear2).

_MMDIT_DOUBLE_SITES = {
    "img_qkv": lambda c: (c.hidden_size, 3 * c.hidden_size),
    "img_proj": lambda c: (c.hidden_size, c.hidden_size),
    "txt_qkv": lambda c: (c.hidden_size, 3 * c.hidden_size),
    "txt_proj": lambda c: (c.hidden_size, c.hidden_size),
    "img_mlp_in": lambda c: (c.hidden_size, c.mlp_dim),
    "img_mlp_out": lambda c: (c.mlp_dim, c.hidden_size),
    "txt_mlp_in": lambda c: (c.hidden_size, c.mlp_dim),
    "txt_mlp_out": lambda c: (c.mlp_dim, c.hidden_size),
}
_MMDIT_SINGLE_SITES = {
    "lin1": lambda c: (c.hidden_size, 3 * c.hidden_size + c.mlp_dim),
    "lin2": lambda c: (c.hidden_size + c.mlp_dim, c.hidden_size),
}


class MMDiTLoRAScheme(AdapterScheme):
    """LoRA over the MMDiT dual/single-stream stacks.

    ``acfg.target_blocks``: "all" | "double" | "single" (the reference's
    target_blocks semantics for MMDiT, lora_layers.py:309-416).
    ``acfg.lora_target_modules``: qkv/proj; ``lora_target_ffn`` adds the
    double-stream mlps (single-stream linear1/linear2 are inherently
    fused attn+mlp).
    """

    method = "lora"

    def __init__(self, cfg, acfg):
        super().__init__(cfg, acfg)
        if acfg.target_blocks not in ("all", "double", "single"):
            raise ValueError(
                "MMDiT lora target_blocks must be all|double|single")
        dsites: List[str] = []
        if "qkv" in acfg.lora_target_modules:
            dsites += ["img_qkv", "txt_qkv"]
        if "proj" in acfg.lora_target_modules:
            dsites += ["img_proj", "txt_proj"]
        if acfg.lora_target_ffn:
            dsites += ["img_mlp_in", "img_mlp_out",
                       "txt_mlp_in", "txt_mlp_out"]
        self.double_sites = dsites if acfg.target_blocks != "single" else []
        self.single_sites = (list(_MMDIT_SINGLE_SITES)
                             if acfg.target_blocks != "double" else [])
        self.rank = acfg.lora_rank
        self.scale = acfg.lora_alpha / acfg.lora_rank

    def _init_group(self, rng, sites, table, depth):
        p = {}
        keys = jax.random.split(rng, max(1, len(sites)))
        for key, site in zip(keys, sites):
            din, dout = table[site](self.cfg)
            bound = 1.0 / math.sqrt(din)
            p[site] = {
                "a": jax.random.uniform(key, (depth, din, self.rank),
                                        jnp.float32, -bound, bound),
                "b": jnp.zeros((depth, self.rank, dout), jnp.float32),
            }
        return p

    def init(self, rng, base_params=None):
        kd, ks = jax.random.split(rng)
        return {
            "double": self._init_group(kd, self.double_sites,
                                       _MMDIT_DOUBLE_SITES,
                                       self.cfg.depth_double),
            "single": self._init_group(ks, self.single_sites,
                                       _MMDIT_SINGLE_SITES,
                                       self.cfg.depth_single),
        }

    def to_forward(self, train_params, base_params):
        ad = {"lora_scale": self.scale}
        if train_params["double"]:
            ad["lora_double"] = train_params["double"]
        if train_params["single"]:
            ad["lora_single"] = train_params["single"]
        return base_params, ad


MMDIT_SCHEMES = {
    "delta_a": DeltaAScheme,
    "lora": MMDiTLoRAScheme,
    "full": FullScheme,
}


# ---------------------------------------------------------------------------
# CogVideoX backbone schemes
# ---------------------------------------------------------------------------

_COGVIDEOX_LORA_SITES = {
    "to_q": lambda c: (c.hidden_size, c.hidden_size),
    "to_k": lambda c: (c.hidden_size, c.hidden_size),
    "to_v": lambda c: (c.hidden_size, c.hidden_size),
    "to_out": lambda c: (c.hidden_size, c.hidden_size),
    "ff_in": lambda c: (c.hidden_size, c.ffn_dim),
    "ff_out": lambda c: (c.ffn_dim, c.hidden_size),
}


class CogVideoXLoRAScheme(AdapterScheme):
    """LoRA over the CogVideoX joint-attention blocks. Default sites
    match the reference: to_q/to_k/to_v/to_out.0
    (run_lora_tta_cogvideo.py:215); ``lora_target_ffn`` adds the ff
    projections. Block scoping via the generic all/last_N/indices."""

    method = "lora"

    def __init__(self, cfg, acfg):
        super().__init__(cfg, acfg)
        sites: List[str] = []
        if "qkv" in acfg.lora_target_modules:
            sites += ["to_q", "to_k", "to_v"]
        if "proj" in acfg.lora_target_modules:
            sites += ["to_out"]
        if acfg.lora_target_ffn:
            sites += ["ff_in", "ff_out"]
        self.sites = sites
        self.targets = parse_target_blocks(acfg.target_blocks, cfg.depth)
        self.rank = acfg.lora_rank
        self.scale = acfg.lora_alpha / acfg.lora_rank

    def init(self, rng, base_params=None):
        L, r = self.cfg.depth, self.rank
        p = {}
        keys = jax.random.split(rng, max(1, len(self.sites)))
        for key, site in zip(keys, self.sites):
            din, dout = _COGVIDEOX_LORA_SITES[site](self.cfg)
            bound = 1.0 / math.sqrt(din)
            p[site] = {
                "a": jax.random.uniform(key, (L, din, r), jnp.float32,
                                        -bound, bound),
                "b": jnp.zeros((L, r, dout), jnp.float32),
            }
        return p

    def to_forward(self, train_params, base_params):
        mask = _active_mask(self.cfg.depth, self.targets)[:, None, None]
        lora = {site: {"a": ab["a"] * mask, "b": ab["b"]}
                for site, ab in train_params.items()}
        return base_params, {"lora": lora, "lora_scale": self.scale}


COGVIDEOX_SCHEMES = {
    "delta_a": DeltaAScheme,
    "lora": CogVideoXLoRAScheme,
    "full": FullScheme,
}


@memoize_factory
def build_scheme(dit_cfg, acfg: AdapterConfig) -> AdapterScheme:
    """Dispatch on architecture config: LongCat DiTConfig gets all seven
    methods; the MMDiT / CogVideoX backbones get the three the reference
    ports (SURVEY.md §2.7).

    Memoized (utils/memo.py): the returned scheme is the canonical
    instance for its config, so the engine's memoized jit factories —
    keyed partly on scheme identity — hit across repeat driver runs in
    one process."""
    from ..config import CogVideoXConfig, MMDiTConfig

    if isinstance(dit_cfg, MMDiTConfig):
        table, name = MMDIT_SCHEMES, "MMDiT"
    elif isinstance(dit_cfg, CogVideoXConfig):
        table, name = COGVIDEOX_SCHEMES, "CogVideoX"
    else:
        return SCHEMES[acfg.method](dit_cfg, acfg)
    if acfg.method not in table:
        raise ValueError(
            f"method {acfg.method} is not ported to the {name} backbone "
            "(reference ports delta_a/lora/full — SURVEY.md §2.7)")
    return table[acfg.method](dit_cfg, acfg)
