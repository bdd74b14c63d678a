"""MUSIQ (multi-scale image quality transformer) — the VBench
``imaging_quality`` tower, JAX-native.

The reference scores imaging_quality through the external VBench++
package, which wraps pyiqa's MUSIQ-SPAQ checkpoint
(common.py:2512-2516). This module implements the MUSIQ architecture
(Ke et al., ICCV 2021) on-device:

- **Multi-scale representation**: the native-resolution image plus
  aspect-ratio-preserving resizes to longer side 384 and 224. All
  scales are patchified (32x32, stride 32) into ONE token sequence with
  a single CLS token.
- **Hash-based 2D spatial embedding**: each patch at grid position
  (i, j) within its scale indexes a shared [G, G, D] table via
  ``(i*G // n_rows, j*G // n_cols)`` (G=10) — this is what lets one
  positional table serve arbitrary input resolutions.
- **Scale embedding**: a learned [num_scales, D] table added per token.
- Pre-LN ViT encoder (width 384, 14 layers, 6 heads, exact GELU,
  LN eps 1e-6) with padding-masked attention, regression head on CLS.

VBench protocol: ``imaging_quality = clip(MUSIQ_SPAQ(frame), 0, 100) /
100`` averaged over frames.

CHOICE marker: the torch state-dict naming consumed by
``convert_torch_musiq_state`` follows this repo's ViT mirror
(tests/test_musiq.py validates converter + forward against a torch
oracle). The official pyiqa checkpoint is unavailable on a zero-egress
box; converting it needs only a flat key-map shim on top of this
converter (same situation as the reference, which downloads it at
runtime). Scores from synthetic weights are comparable across rows of
one campaign, never against published numbers.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.layers import layer_norm


@dataclasses.dataclass(frozen=True)
class MUSIQConfig:
    """MUSIQ-SPAQ geometry (google-research/musiq defaults)."""

    width: int = 384
    num_layers: int = 14
    num_heads: int = 6
    patch_size: int = 32
    grid_size: int = 10           # hash table is [G, G, width]
    longer_sides: Tuple[int, ...] = (224, 384)  # + the native scale
    max_tokens: int = 512         # sequence cap (native scale trimmed)

    @property
    def num_scales(self) -> int:
        return 1 + len(self.longer_sides)

    @property
    def head_dim(self) -> int:
        return self.width // self.num_heads

    @property
    def patch_dim(self) -> int:
        return 3 * self.patch_size * self.patch_size

    def as_dict(self) -> Dict[str, Any]:
        return {"width": self.width, "num_layers": self.num_layers,
                "num_heads": self.num_heads, "patch_size": self.patch_size,
                "grid_size": self.grid_size,
                "longer_sides": list(self.longer_sides),
                "max_tokens": self.max_tokens}

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "MUSIQConfig":
        d = dict(d)
        if "longer_sides" in d:
            d["longer_sides"] = tuple(d["longer_sides"])
        return MUSIQConfig(**d)


def init_musiq(rng: jax.Array, cfg: MUSIQConfig) -> Dict[str, Any]:
    """Random MUSIQ tree (tests / synthetic towers), scan-stacked."""
    counter = [0]

    def key():
        counter[0] += 1
        return jax.random.fold_in(rng, counter[0])

    def dense(din, dout, depth):
        return {"kernel": jax.random.normal(
                    key(), (depth, din, dout), jnp.float32) * 0.02,
                "bias": jnp.zeros((depth, dout), jnp.float32)}

    W, L, G = cfg.width, cfg.num_layers, cfg.grid_size
    return {
        "patch_embedding": {
            "kernel": jax.random.normal(
                key(), (cfg.patch_dim, W), jnp.float32) * 0.02,
            "bias": jnp.zeros((W,), jnp.float32)},
        "cls_token": jax.random.normal(key(), (W,), jnp.float32) * 0.02,
        "hash_pos_embed": jax.random.normal(
            key(), (G, G, W), jnp.float32) * 0.02,
        "scale_embed": jax.random.normal(
            key(), (cfg.num_scales, W), jnp.float32) * 0.02,
        "layers": {
            "ln1": {"weight": jnp.ones((L, W)), "bias": jnp.zeros((L, W))},
            "q": dense(W, W, L), "k": dense(W, W, L), "v": dense(W, W, L),
            "out": dense(W, W, L),
            "ln2": {"weight": jnp.ones((L, W)), "bias": jnp.zeros((L, W))},
            "fc1": dense(W, 4 * W, L), "fc2": dense(4 * W, W, L),
        },
        "norm": {"weight": jnp.ones((W,)), "bias": jnp.zeros((W,))},
        "head": {"kernel": jax.random.normal(
                    key(), (W, 1), jnp.float32) * 0.02,
                 "bias": jnp.zeros((1,), jnp.float32)},
    }


# --------------------------------------------------------------------------
# Host-side multi-scale tokenization
# --------------------------------------------------------------------------


def _arp_resize(frame: np.ndarray, longer: int) -> np.ndarray:
    """Aspect-ratio-preserving resize of [H, W, 3] so max(H', W') ==
    longer (bilinear, matching TF's resize in the original)."""
    h, w, _ = frame.shape
    scale = longer / max(h, w)
    nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    if (nh, nw) == (h, w):
        return frame
    return np.asarray(jax.image.resize(
        jnp.asarray(frame, jnp.float32), (nh, nw, 3), "bilinear"))


def _patchify(frame: np.ndarray, cfg: MUSIQConfig
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """[H, W, 3] -> (patches [N, patch_dim], row_idx [N], col_idx [N])
    with zero-padding to full 32x32 tiles and hash-grid indices."""
    p, G = cfg.patch_size, cfg.grid_size
    h, w, _ = frame.shape
    nr, nc = -(-h // p), -(-w // p)
    pad = np.zeros((nr * p, nc * p, 3), np.float32)
    pad[:h, :w] = frame
    x = pad.reshape(nr, p, nc, p, 3).transpose(0, 2, 1, 3, 4)
    patches = x.reshape(nr * nc, cfg.patch_dim)
    ri, ci = np.meshgrid(np.arange(nr), np.arange(nc), indexing="ij")
    # the MUSIQ hash: grid position -> [0, G) bucket, resolution-free
    return (patches,
            (ri.reshape(-1) * G // nr).astype(np.int32),
            (ci.reshape(-1) * G // nc).astype(np.int32))


def build_multiscale_tokens(
    frame: np.ndarray, cfg: MUSIQConfig,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """[H, W, 3] in [0,1] -> (patches [T, patch_dim], row [T], col [T],
    scale [T], n_valid) padded/trimmed to cfg.max_tokens (excl. CLS).

    Scale order: native first (index 0), then longer_sides ascending
    (indices 1..). When the combined sequence exceeds max_tokens the
    NATIVE scale is trimmed (it has the most patches and the paper's
    full-size input is the one sampled under a budget).
    """
    frame = np.asarray(frame, np.float32)
    per_scale: List[Tuple[np.ndarray, np.ndarray, np.ndarray, int]] = []
    for s, img in enumerate(
            [frame] + [_arp_resize(frame, ls)
                       for ls in sorted(cfg.longer_sides)]):
        pt, ri, ci = _patchify(img, cfg)
        per_scale.append((pt, ri, ci, s))
    # budget: keep the resized scales whole, trim native from the end
    n_resized = sum(p[0].shape[0] for p in per_scale[1:])
    native_budget = max(0, cfg.max_tokens - n_resized)
    pt0, ri0, ci0, _ = per_scale[0]
    if pt0.shape[0] > native_budget:
        keep = np.linspace(0, pt0.shape[0] - 1, native_budget).astype(int) \
            if native_budget else np.zeros((0,), int)
        per_scale[0] = (pt0[keep], ri0[keep], ci0[keep], 0)
    patches = np.concatenate([p[0] for p in per_scale], 0)
    rows = np.concatenate([p[1] for p in per_scale], 0)
    cols = np.concatenate([p[2] for p in per_scale], 0)
    scales = np.concatenate([np.full(p[0].shape[0], p[3], np.int32)
                             for p in per_scale], 0)
    n = patches.shape[0]
    if n > cfg.max_tokens:  # resized scales alone exceed the budget
        patches, rows, cols, scales = (a[:cfg.max_tokens] for a in
                                       (patches, rows, cols, scales))
        n = cfg.max_tokens
    out = (np.zeros((cfg.max_tokens, cfg.patch_dim), np.float32),
           np.zeros((cfg.max_tokens,), np.int32),
           np.zeros((cfg.max_tokens,), np.int32),
           np.zeros((cfg.max_tokens,), np.int32))
    out[0][:n], out[1][:n], out[2][:n], out[3][:n] = (
        patches, rows, cols, scales)
    return (*out, n)


# --------------------------------------------------------------------------
# Device-side transformer
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def musiq_score(params: Dict[str, Any], cfg: MUSIQConfig,
                patches: jnp.ndarray, rows: jnp.ndarray,
                cols: jnp.ndarray, scales: jnp.ndarray,
                n_valid: jnp.ndarray) -> jnp.ndarray:
    """Batched scoring: patches [B, T, patch_dim], rows/cols/scales
    [B, T] int32, n_valid [B] -> scores [B] (SPAQ scale, ~0-100)."""
    B, T = patches.shape[0], patches.shape[1]
    W, H, D = cfg.width, cfg.num_heads, cfg.head_dim
    emb = jnp.dot(patches, params["patch_embedding"]["kernel"]) \
        + params["patch_embedding"]["bias"]
    emb = emb + params["hash_pos_embed"][rows, cols] \
        + params["scale_embed"][scales]
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, W))
    x = jnp.concatenate([cls, emb], axis=1)          # [B, 1+T, W]
    S = T + 1
    valid = jnp.arange(S)[None] < (n_valid[:, None] + 1)  # CLS always on
    bias = jnp.where(valid, 0.0, -1e9)[:, None, None, :]  # [B,1,1,S]

    def body(x, lp):
        h = layer_norm(x, lp["ln1"]["weight"], lp["ln1"]["bias"], eps=1e-6)

        def proj(pp, t):
            return (jnp.dot(t, pp["kernel"]) + pp["bias"]).reshape(
                B, S, H, D)

        q, k, v = proj(lp["q"], h), proj(lp["k"], h), proj(lp["v"], h)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (D ** -0.5) + bias
        o = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(logits, -1), v)
        x = x + jnp.dot(o.reshape(B, S, -1), lp["out"]["kernel"]) \
            + lp["out"]["bias"]
        h = layer_norm(x, lp["ln2"]["weight"], lp["ln2"]["bias"], eps=1e-6)
        h = jax.nn.gelu(jnp.dot(h, lp["fc1"]["kernel"]) + lp["fc1"]["bias"],
                        approximate=False)
        return x + jnp.dot(h, lp["fc2"]["kernel"]) + lp["fc2"]["bias"], None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = layer_norm(x, params["norm"]["weight"], params["norm"]["bias"],
                   eps=1e-6)
    return (jnp.dot(x[:, 0], params["head"]["kernel"])
            + params["head"]["bias"])[:, 0]


# --------------------------------------------------------------------------
# Converter + loader (same pattern as convert_torch_dino_state)
# --------------------------------------------------------------------------


def convert_torch_musiq_state(sd: Dict[str, np.ndarray],
                              cfg: MUSIQConfig) -> Dict[str, Any]:
    """torch state_dict (numpy values) -> JAX tree. Expected naming
    (tests/test_musiq.py oracle layout): patch_embedding {weight
    [W, patch_dim], bias}, cls_token [1,1,W], hash_pos_embed [G,G,W],
    scale_embed [S,W], blocks.{i}.{norm1, attn.qkv (fused [3W,W]),
    attn.proj, norm2, mlp.fc1, mlp.fc2}, norm, head."""
    W, L, G = cfg.width, cfg.num_layers, cfg.grid_size
    known = set()

    def take(k):
        known.add(k)
        return np.asarray(sd[k])

    def stack(fmt, transform=lambda a: a):
        return jnp.asarray(np.stack(
            [transform(take(fmt.format(i=i))) for i in range(L)]))

    def lin(name):
        return {"kernel": stack(f"blocks.{{i}}.{name}.weight",
                                lambda a: a.T),
                "bias": stack(f"blocks.{{i}}.{name}.bias")}

    qkv_w = stack("blocks.{i}.attn.qkv.weight")
    qkv_b = stack("blocks.{i}.attn.qkv.bias")

    def qkv_slice(j):
        return {"kernel": jnp.transpose(
                    qkv_w[:, j * W:(j + 1) * W, :], (0, 2, 1)),
                "bias": qkv_b[:, j * W:(j + 1) * W]}

    tree = {
        "patch_embedding": {
            "kernel": jnp.asarray(take("patch_embedding.weight").T),
            "bias": jnp.asarray(take("patch_embedding.bias"))},
        "cls_token": jnp.asarray(take("cls_token").reshape(W)),
        "hash_pos_embed": jnp.asarray(
            take("hash_pos_embed").reshape(G, G, W)),
        "scale_embed": jnp.asarray(take("scale_embed")),
        "layers": {
            "ln1": {"weight": stack("blocks.{i}.norm1.weight"),
                    "bias": stack("blocks.{i}.norm1.bias")},
            "q": qkv_slice(0), "k": qkv_slice(1), "v": qkv_slice(2),
            "out": lin("attn.proj"),
            "ln2": {"weight": stack("blocks.{i}.norm2.weight"),
                    "bias": stack("blocks.{i}.norm2.bias")},
            "fc1": lin("mlp.fc1"), "fc2": lin("mlp.fc2"),
        },
        "norm": {"weight": jnp.asarray(take("norm.weight")),
                 "bias": jnp.asarray(take("norm.bias"))},
        "head": {"kernel": jnp.asarray(take("head.weight").T),
                 "bias": jnp.asarray(take("head.bias"))},
    }
    unknown = set(sd) - known
    if unknown:
        raise ValueError(
            f"unconverted MUSIQ keys {sorted(unknown)[:5]}... — a real "
            "pyiqa checkpoint needs a key-map shim (see module CHOICE "
            "marker); refusing a silent partial convert")
    return tree


def load_musiq_params(
    path: str, cfg: Optional[MUSIQConfig] = None,
) -> Tuple[Dict[str, Any], MUSIQConfig]:
    """Load + convert; an optional ``musiq_config.json`` sidecar (the
    synthetic-towers layout) overrides the geometry."""
    import json
    import os

    import torch

    if cfg is None:
        side = os.path.join(os.path.dirname(path), "musiq_config.json")
        if os.path.exists(side):
            with open(side) as f:
                cfg = MUSIQConfig.from_dict(json.load(f))
        else:
            cfg = MUSIQConfig()
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_torch_musiq_state(
        {k: v.numpy() for k, v in sd.items()}, cfg), cfg


def imaging_quality(params: Dict[str, Any], cfg: MUSIQConfig,
                    frames: np.ndarray, batch: int = 8) -> float:
    """frames [T, H, W, 3] in [0,1] -> VBench imaging_quality: mean of
    clip(MUSIQ(frame), 0, 100)/100 over frames (common.py:2512-2516
    protocol via pyiqa musiq_spaq)."""
    frames = np.asarray(frames, np.float32)
    toks = [build_multiscale_tokens(f, cfg) for f in frames]
    scores = []
    for i in range(0, len(toks), batch):
        chunk = toks[i:i + batch]
        args = [jnp.asarray(np.stack([t[j] for t in chunk]))
                for j in range(4)]
        n = jnp.asarray(np.asarray([t[4] for t in chunk], np.int32))
        scores.append(np.asarray(musiq_score(params, cfg, *args, n)))
    return float(np.clip(np.concatenate(scores), 0.0, 100.0).mean()
                 / 100.0)
