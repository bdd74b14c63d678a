"""Causal 3D VAE (WAN-style), TPU-native.

Replaces the reference's ``AutoencoderKLWan`` (used at common.py:158-221):
temporal x4 / spatial x8 compression, ``z_dim``-channel latents with
per-channel ``latents_mean``/``latents_std`` normalization, causal
temporal convolutions (first frame encodes independently, so
``T_lat = 1 + (T-1)/4`` — common.py:1488-1490).

The forward math mirrors the public Wan2.1 VAE exactly (channelwise
RMS norms, causal (k_t-1) left-pad temporal convs, Resample blocks whose
decoder spatial convs halve channels, identity first-frame paths in the
temporal resamples, model-level quant/post-quant 1x1x1 convs) so that
``convert_torch_vae_state`` produces weight-level parity — validated
against an independent torch implementation in tests/test_oracle_vae.py.

TPU design notes:
- NDHWC layout end-to-end (channels-last feeds XLA conv kernels and the
  MXU without relayouts); the public API keeps the reference's NCTHW.
- 3D convs decompose into k_t batched 2D convs (_conv3d_via_2d) — the
  XLA:TPU 3D conv emitter is compile-pathological.
- Monolithic whole-clip forwards by default; bit-exact streaming
  encode/decode with explicit per-conv temporal caches for long clips
  (the upstream feat_cache protocol, re-derived as carried input tails).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import VAEConfig, resolve_dtype


# ---------------------------------------------------------------------------
# Primitive ops (NDHWC)
# ---------------------------------------------------------------------------

_DN2 = ("NHWC", "HWIO", "NHWC")


def _conv3d_via_2d(x, w, tpad: Tuple[int, int], tstride: int,
                   spad, sstride: Tuple[int, int]):
    """3D conv decomposed into kt 2D convs (T folded into the batch dim).

    XLA:TPU's 3D convolution emitter is compile-pathological (~10-60 s per
    op, measured on v5e via the axon tunnel); the 2D path compiles in
    seconds and maps straight onto the MXU. Same math: out[t] =
    sum_i conv2d(x[t*stride - (kt-1) + i], w[i]) with causal zero-padding.

    x: [B, T, H, W, C]; w: [kt, kh, kw, Cin, Cout].
    """
    kt = w.shape[0]
    B, T, H, W, C = x.shape
    x = jnp.pad(x, ((0, 0), tpad, (0, 0), (0, 0), (0, 0)))
    Tp = x.shape[1]
    T_out = (Tp - kt) // tstride + 1
    if tstride > 1:
        # de-interleave via reshape instead of a strided slice: strided
        # slices fault the TPU worker through the axon runtime (observed
        # kernel crash), and the reshape form lowers cleanly everywhere.
        L = ((Tp + tstride - 1) // tstride) * tstride
        xq = jnp.pad(x, ((0, 0), (0, L - Tp), (0, 0), (0, 0), (0, 0)))
        xq = xq.reshape(B, L // tstride, tstride, H, W, C)
    out = None
    for i in range(kt):
        if tstride > 1:
            row0 = i // tstride
            xi = xq[:, row0:row0 + T_out, i % tstride]
        else:
            xi = jax.lax.slice_in_dim(x, i, i + T_out, axis=1)
        xi2 = xi.reshape(B * T_out, H, W, C)
        yi = jax.lax.conv_general_dilated(
            xi2, w[i], sstride, spad, dimension_numbers=_DN2,
        )
        out = yi if out is None else out + yi
    return out.reshape(B, T_out, out.shape[1], out.shape[2], out.shape[3])


def causal_conv3d(p, x, stride: Tuple[int, int, int] = (1, 1, 1)):
    """3D conv with causal temporal padding and SAME spatial padding.

    x: [B, T, H, W, C]; kernel: [kt, kh, kw, Cin, Cout].
    """
    kt, kh, kw = p["kernel"].shape[:3]
    st, sh, sw = stride
    pad_h = ((kh - 1) // 2, kh // 2)
    pad_w = ((kw - 1) // 2, kw // 2)
    y = _conv3d_via_2d(
        x, p["kernel"].astype(x.dtype),
        tpad=(kt - 1, 0), tstride=st, spad=(pad_h, pad_w), sstride=(sh, sw),
    )
    return y + p["bias"].astype(y.dtype)


def wan_rms_norm(p, x, eps: float = 1e-12):
    """Wan2.1 ``RMS_norm``: channelwise L2 normalization per (t, h, w)
    position, scaled by sqrt(C), with a learned per-channel gamma
    (upstream: ``F.normalize(x, dim=C) * dim**0.5 * gamma + bias``;
    the VAE instantiates it bias-free, the converter zero-fills).
    The eps matches torch F.normalize (``max(norm, 1e-12)``)."""
    xf = x.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    xf = xf / jnp.maximum(n, eps) * (x.shape[-1] ** 0.5)
    xf = xf * p["weight"] + p["bias"]
    return xf.astype(x.dtype)


def _conv_init(key, kt, kh, kw, cin, cout, dtype):
    fan_in = kt * kh * kw * cin
    w = jax.random.normal(key, (kt, kh, kw, cin, cout)) * (fan_in ** -0.5)
    return {"kernel": w.astype(dtype), "bias": jnp.zeros((cout,), dtype)}


def _norm_init(c, dtype):
    return {"weight": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _init_resblock(key, cin, cout, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": _norm_init(cin, dtype),
        "conv1": _conv_init(k1, 3, 3, 3, cin, cout, dtype),
        "norm2": _norm_init(cout, dtype),
        "conv2": _conv_init(k2, 3, 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["shortcut"] = _conv_init(k3, 1, 1, 1, cin, cout, dtype)
    return p


def _resblock(p, x):
    h = causal_conv3d(p["conv1"], jax.nn.silu(wan_rms_norm(p["norm1"], x)))
    h = causal_conv3d(p["conv2"], jax.nn.silu(wan_rms_norm(p["norm2"], h)))
    if "shortcut" in p:
        x = causal_conv3d(p["shortcut"], x)
    return x + h


def _init_attn(key, c, dtype):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mk = lambda k: {"kernel": (jax.random.normal(k, (c, c)) * c ** -0.5).astype(dtype),
                    "bias": jnp.zeros((c,), dtype)}
    return {"norm": _norm_init(c, dtype), "q": mk(k1), "k": mk(k2),
            "v": mk(k3), "proj": mk(k4)}


def _spatial_attn(p, x):
    """Per-frame spatial self-attention (mid-block)."""
    B, T, H, W, C = x.shape
    h = wan_rms_norm(p["norm"], x).reshape(B * T, H * W, C)
    q = h @ p["q"]["kernel"].astype(h.dtype) + p["q"]["bias"].astype(h.dtype)
    k = h @ p["k"]["kernel"].astype(h.dtype) + p["k"]["bias"].astype(h.dtype)
    v = h @ p["v"]["kernel"].astype(h.dtype) + p["v"]["bias"].astype(h.dtype)
    logits = jnp.einsum("bqc,bkc->bqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (C ** -0.5)
    attn = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bqk,bkc->bqc", attn, v.astype(jnp.float32)).astype(x.dtype)
    o = o @ p["proj"]["kernel"].astype(o.dtype) + p["proj"]["bias"].astype(o.dtype)
    return x + o.reshape(B, T, H, W, C)


# ---------------------------------------------------------------------------
# Temporal resample (Wan2.1 Resample time_conv semantics)
# ---------------------------------------------------------------------------
#
# Upstream processes clips through per-conv feature caches in chunks of
# [1, 4, 4, ...] pixel frames (wan/modules/vae.py encode/decode). The
# monolithic equivalents below were derived window-by-window from that
# cache protocol (see tests/torch_oracles.py::WanVAEOracle for the
# derivation, validated numerically in tests/test_oracle_vae.py):
#
# - downsample3d: the first frame is cached untouched (identity); the
#   k=(3,1,1) stride-(2,1,1) UNPADDED time_conv then runs over the full
#   sequence — windows (f1,f2,f3), (f3,f4,f5), ...  T -> 1 + (T-1)/2.
# - upsample3d: the first frame is marked 'Rep' and passes through
#   identically; the k=(3,1,1) C->2C time_conv runs causally (zero
#   history — f1 is never used as history) over frames 2..T, each
#   output splitting into two interleaved frames.  1+n -> 1+2n.


def _temporal_downsample(p, x):
    """Wan downsample3d: concat([x[:1], conv_nopad_stride2(x)])."""
    kt, kh, kw = p["kernel"].shape[:3]
    spad = (((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2))
    if x.shape[1] < kt:
        return x[:, :1]
    y = _conv3d_via_2d(
        x, p["kernel"].astype(x.dtype),
        tpad=(0, 0), tstride=2, spad=spad, sstride=(1, 1),
    ) + p["bias"].astype(x.dtype)
    return jnp.concatenate([x[:, :1], y], axis=1)


def _temporal_upsample(p, x):
    """Wan upsample3d: concat([x[:1], interleave2(causal_conv(x[1:]))])."""
    first = x[:, :1]
    rest = x[:, 1:]
    if rest.shape[1] == 0:
        return first
    B, T, H, W, C = rest.shape
    y = causal_conv3d(p, rest)  # [B, T, H, W, 2C], zero causal history
    y = y.reshape(B, T, H, W, 2, y.shape[-1] // 2)
    y = y.transpose(0, 1, 4, 2, 3, 5).reshape(B, 2 * T, H, W, y.shape[-1])
    return jnp.concatenate([first, y], axis=1)


def _spatial_downsample(p, x):
    y = _conv3d_via_2d(
        x, p["kernel"].astype(x.dtype),
        tpad=(0, 0), tstride=1, spad=((0, 1), (0, 1)), sstride=(2, 2),
    )
    return y + p["bias"].astype(x.dtype)


def _spatial_upsample(p, x):
    B, T, H, W, C = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    return causal_conv3d(p, x)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def decoder_channel_plan(cfg: VAEConfig):
    """Wan2.1 decoder channel plan: dims_dec = [dims[-1]] + dims[::-1];
    every Resample's spatial conv HALVES channels, so each scale after
    the first starts at half the previous scale's output width. Returns
    [(cin, cout, has_resample, has_temporal)] per decoder scale, and the
    matching temporal-upsample flags (= temporal_downsample reversed)."""
    dims = [cfg.base_dim * m for m in cfg.dim_mults]
    dims_dec = [dims[-1]] + dims[::-1]
    ups = tuple(cfg.temporal_downsample)[::-1]
    n = len(dims)
    plan = []
    for idx in range(n):
        cin = dims_dec[idx] if idx == 0 else dims_dec[idx] // 2
        cout = dims_dec[idx + 1]
        has_rs = idx < n - 1
        plan.append((cin, cout, has_rs, has_rs and ups[idx]))
    return plan


def init_vae(rng: jax.Array, cfg: VAEConfig) -> Dict[str, Any]:
    dtype = resolve_dtype(cfg.param_dtype)
    dims = [cfg.base_dim * m for m in cfg.dim_mults]
    keys = iter(jax.random.split(rng, 256))

    def enc_scale(i):
        cin = dims[i - 1] if i > 0 else dims[0]
        cout = dims[i]
        p = {"res": [
            _init_resblock(next(keys), cin if j == 0 else cout, cout, dtype)
            for j in range(cfg.num_res_blocks)
        ]}
        if i < len(dims) - 1:
            p["sdown"] = _conv_init(next(keys), 1, 3, 3, cout, cout, dtype)
            if cfg.temporal_downsample[i]:
                p["tdown"] = _conv_init(next(keys), 3, 1, 1, cout, cout,
                                        dtype)
        return p

    def dec_scale(cin, cout, has_rs, has_t):
        p = {"res": [
            _init_resblock(next(keys), cin if j == 0 else cout, cout, dtype)
            for j in range(cfg.num_res_blocks + 1)
        ]}
        if has_rs:
            if has_t:
                p["tup"] = _conv_init(next(keys), 3, 1, 1, cout, 2 * cout,
                                      dtype)
            # Wan Resample spatial conv halves channels (Conv2d(d, d//2))
            p["sup"] = _conv_init(next(keys), 1, 3, 3, cout, cout // 2,
                                  dtype)
        return p

    mid_c = dims[-1]
    params = {
        "enc": {
            "conv_in": _conv_init(next(keys), 3, 3, 3, 3, dims[0], dtype),
            "scales": [enc_scale(i) for i in range(len(dims))],
            "mid": {
                "res1": _init_resblock(next(keys), mid_c, mid_c, dtype),
                "attn": _init_attn(next(keys), mid_c, dtype),
                "res2": _init_resblock(next(keys), mid_c, mid_c, dtype),
            },
            "norm_out": _norm_init(mid_c, dtype),
            "conv_out": _conv_init(next(keys), 3, 3, 3, mid_c, 2 * cfg.z_dim, dtype),
            # model-level quant conv (upstream `conv1`, 1x1x1 on moments)
            "quant": _conv_init(next(keys), 1, 1, 1, 2 * cfg.z_dim,
                                2 * cfg.z_dim, dtype),
        },
        "dec": {
            # model-level post-quant conv (upstream `conv2`)
            "post_quant": _conv_init(next(keys), 1, 1, 1, cfg.z_dim,
                                     cfg.z_dim, dtype),
            "conv_in": _conv_init(next(keys), 3, 3, 3, cfg.z_dim, mid_c, dtype),
            "mid": {
                "res1": _init_resblock(next(keys), mid_c, mid_c, dtype),
                "attn": _init_attn(next(keys), mid_c, dtype),
                "res2": _init_resblock(next(keys), mid_c, mid_c, dtype),
            },
            "scales": [dec_scale(*sc) for sc in decoder_channel_plan(cfg)],
            "norm_out": _norm_init(dims[0], dtype),
            "conv_out": _conv_init(next(keys), 3, 3, 3, dims[0], 3, dtype),
        },
    }
    return params


# ---------------------------------------------------------------------------
# Encode / decode
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def vae_encode_moments(params, cfg: VAEConfig, video: jnp.ndarray):
    """video [B, 3, T, H, W] in [-1, 1] -> (mean, logvar) each
    [B, z_dim, T_lat, H/8, W/8] with T_lat = 1 + (T-1)//4."""
    cdtype = resolve_dtype(cfg.compute_dtype)
    x = video.transpose(0, 2, 3, 4, 1).astype(cdtype)  # NDHWC
    e = params["enc"]
    x = causal_conv3d(e["conv_in"], x)
    n_scales = len(cfg.dim_mults)
    for i in range(n_scales):
        sp = e["scales"][i]
        for rp in sp["res"]:
            x = _resblock(rp, x)
        if i < n_scales - 1:
            x = _spatial_downsample(sp["sdown"], x)
            if cfg.temporal_downsample[i]:
                x = _temporal_downsample(sp["tdown"], x)
    x = _resblock(e["mid"]["res1"], x)
    x = _spatial_attn(e["mid"]["attn"], x)
    x = _resblock(e["mid"]["res2"], x)
    x = causal_conv3d(e["conv_out"], jax.nn.silu(wan_rms_norm(e["norm_out"], x)))
    x = causal_conv3d(e["quant"], x)  # upstream model-level `conv1`
    x = x.transpose(0, 4, 1, 2, 3)  # NCTHW
    mean, logvar = jnp.split(x, 2, axis=1)
    return mean.astype(jnp.float32), logvar.astype(jnp.float32)


def vae_encode(params, cfg: VAEConfig, video: jnp.ndarray,
               rng: Optional[jax.Array] = None,
               sample: bool = False,
               normalize: bool = True) -> jnp.ndarray:
    """Encode to normalized latents (reference: encode_video +
    normalize_latents, common.py:158-190). Deterministic (mode) unless
    ``sample``."""
    mean, logvar = vae_encode_moments(params, cfg, video)
    z = mean
    if sample:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        z = mean + std * jax.random.normal(rng, mean.shape)
    if normalize:
        z = normalize_latents(cfg, z)
    return z


@functools.partial(jax.jit, static_argnames=("cfg",))
def _vae_decode_core(params, cfg: VAEConfig, z: jnp.ndarray):
    cdtype = resolve_dtype(cfg.compute_dtype)
    x = z.transpose(0, 2, 3, 4, 1).astype(cdtype)  # NDHWC
    d = params["dec"]
    x = causal_conv3d(d["post_quant"], x)  # upstream model-level `conv2`
    x = causal_conv3d(d["conv_in"], x)
    x = _resblock(d["mid"]["res1"], x)
    x = _spatial_attn(d["mid"]["attn"], x)
    x = _resblock(d["mid"]["res2"], x)
    for sp, (_, _, has_rs, has_t) in zip(params["dec"]["scales"],
                                         decoder_channel_plan(cfg)):
        for rp in sp["res"]:
            x = _resblock(rp, x)
        if has_rs:
            # Wan Resample order: temporal first, then spatial (which
            # halves channels)
            if has_t:
                x = _temporal_upsample(sp["tup"], x)
            x = _spatial_upsample(sp["sup"], x)
    x = causal_conv3d(d["conv_out"], jax.nn.silu(wan_rms_norm(d["norm_out"], x)))
    return x.transpose(0, 4, 1, 2, 3).astype(jnp.float32)  # [B,3,T,H,W]


def vae_decode(params, cfg: VAEConfig, latents: jnp.ndarray,
               denormalize: bool = True,
               chunk_latents: int = 1,
               context_latents: int = 3) -> jnp.ndarray:
    """Latents -> pixels in [0, 1] (reference: decode_latents,
    common.py:209-221).

    Long clips decode in sliding temporal windows: each chunk is decoded
    together with ``context_latents`` preceding latent frames (covering
    the decoder's temporal receptive field) whose pixels are discarded.
    Caps peak activation memory at ~(context+chunk) latent frames of
    full-resolution tensors — the TPU-native stand-in for the reference
    VAE's causal feature cache. Chunk boundaries are exact up to the
    receptive-field approximation (tested in test_vae.py).
    """
    if denormalize:
        latents = denormalize_latents(cfg, latents)
    L = latents.shape[2]
    if L <= context_latents + chunk_latents:
        video = _vae_decode_core(params, cfg, latents)
        return jnp.clip((video + 1.0) / 2.0, 0.0, 1.0)

    tf = cfg.temporal_factor
    pieces = []
    # first window: no context, keep everything
    first = _vae_decode_core(params, cfg, latents[:, :, :chunk_latents])
    pieces.append(first)
    for j in range(chunk_latents, L, chunk_latents):
        lo = max(0, j - context_latents)
        window = latents[:, :, lo:j + chunk_latents]
        dec = _vae_decode_core(params, cfg, window)
        n_keep = (min(j + chunk_latents, L) - j) * tf
        pieces.append(dec[:, :, -n_keep:])
    video = jnp.concatenate(pieces, axis=2)
    return jnp.clip((video + 1.0) / 2.0, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Latent normalization (reference: common.py:177-206)
# ---------------------------------------------------------------------------


def normalize_latents(cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(cfg.latents_mean, z.dtype).reshape(1, -1, 1, 1, 1)
    std = jnp.asarray(cfg.latents_std, z.dtype).reshape(1, -1, 1, 1, 1)
    return (z - mean) / std


def denormalize_latents(cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(cfg.latents_mean, z.dtype).reshape(1, -1, 1, 1, 1)
    std = jnp.asarray(cfg.latents_std, z.dtype).reshape(1, -1, 1, 1, 1)
    return z * std + mean


def latent_len(num_pixel_frames: int, temporal_factor: int = 4) -> int:
    """T_lat = 1 + (T-1)//factor (reference: common.py:1488-1490)."""
    n = max(1, int(num_pixel_frames))
    return 1 + (n - 1) // temporal_factor


# ---------------------------------------------------------------------------
# Streaming decode with exact causal feature caches
# ---------------------------------------------------------------------------
#
# The sliding-window chunked decode above re-computes ``context_latents``
# per chunk and is exact only up to the decoder's receptive field. The
# streamed decoder below is *bit-exact* vs the monolithic decode: every
# temporal conv carries its (kt-1)-frame input tail between chunks (the
# TPU-native equivalent of the reference VAE's causal feature cache), so
# arbitrarily long clips decode in constant memory with zero redundant
# compute.


def _causal_conv3d_cached(p, x, cache):
    """Causal conv with explicit temporal state.

    cache: [B, kt-1, H, W, C] input tail from the previous chunk, or
    None (zero history — identical to the monolithic zero left-pad).
    Returns (y, new_cache). kt == 1 convs are stateless (cache None).
    """
    kt, kh, kw = p["kernel"].shape[:3]
    if kt == 1:
        return causal_conv3d(p, x), None
    if cache is None:
        cache = jnp.zeros((x.shape[0], kt - 1) + x.shape[2:], x.dtype)
    ext = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
    new_cache = ext[:, -(kt - 1):]
    pad_h = ((kh - 1) // 2, kh // 2)
    pad_w = ((kw - 1) // 2, kw // 2)
    y = _conv3d_via_2d(ext, p["kernel"].astype(x.dtype), tpad=(0, 0),
                       tstride=1, spad=(pad_h, pad_w), sstride=(1, 1))
    return y + p["bias"].astype(x.dtype), new_cache


class _CacheIO:
    """Threads the per-op cache list through the decoder traversal."""

    def __init__(self, caches):
        self._in = iter(caches) if caches is not None else None
        self.out = []

    def conv(self, p, x):
        c = next(self._in) if self._in is not None else None
        y, nc = _causal_conv3d_cached(p, x, c)
        self.out.append(nc)
        return y

    def pull(self):
        return next(self._in) if self._in is not None else None

    def push(self, c):
        self.out.append(c)


def _resblock_cached(p, x, cio: "_CacheIO"):
    h = cio.conv(p["conv1"], jax.nn.silu(wan_rms_norm(p["norm1"], x)))
    h = cio.conv(p["conv2"], jax.nn.silu(wan_rms_norm(p["norm2"], h)))
    if "shortcut" in p:
        x = causal_conv3d(p["shortcut"], x)  # 1x1x1, stateless
    return x + h


def _temporal_upsample_cached(p, x, cio: "_CacheIO", first: bool):
    """Streaming form of _temporal_upsample. The first latent frame (only
    present in the first chunk) passes through identically ('Rep') and
    never feeds the time-conv — its cache starts at zeros, exactly
    matching the monolithic zero left-pad over frames 2..T."""
    cache = cio.pull()
    if first:
        head = x[:, :1]
        rest = x[:, 1:]
    else:
        head = None
        rest = x
    if cache is None:
        cache = jnp.zeros((x.shape[0], 2) + rest.shape[2:], x.dtype)
    if rest.shape[1] == 0:
        cio.push(cache)
        return head
    ext = jnp.concatenate([cache.astype(x.dtype), rest], axis=1)
    cio.push(ext[:, -2:])
    kh, kw = p["kernel"].shape[1:3]
    spad = (((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2))
    y = _conv3d_via_2d(ext, p["kernel"].astype(x.dtype), tpad=(0, 0),
                       tstride=1, spad=spad, sstride=(1, 1))
    y = y + p["bias"].astype(x.dtype)
    B, T, H, W, C2 = y.shape
    y = y.reshape(B, T, H, W, 2, C2 // 2)
    y = y.transpose(0, 1, 4, 2, 3, 5).reshape(B, 2 * T, H, W, C2 // 2)
    if head is not None:
        y = jnp.concatenate([head, y], axis=1)
    return y


@functools.partial(jax.jit, static_argnames=("cfg", "first"))
def _vae_decode_chunk(params, cfg: VAEConfig, z: jnp.ndarray, caches,
                      first: bool):
    """Decode one latent chunk with carried caches. Returns
    (pixels [B,3,t,H,W] fp32 pre-[0,1]-mapping, new_caches)."""
    cdtype = resolve_dtype(cfg.compute_dtype)
    x = z.transpose(0, 2, 3, 4, 1).astype(cdtype)
    d = params["dec"]
    cio = _CacheIO(caches)
    x = causal_conv3d(d["post_quant"], x)  # 1x1x1, stateless
    x = cio.conv(d["conv_in"], x)
    x = _resblock_cached(d["mid"]["res1"], x, cio)
    x = _spatial_attn(d["mid"]["attn"], x)
    x = _resblock_cached(d["mid"]["res2"], x, cio)
    for sp, (_, _, has_rs, has_t) in zip(d["scales"],
                                         decoder_channel_plan(cfg)):
        for rp in sp["res"]:
            x = _resblock_cached(rp, x, cio)
        if has_rs:
            if has_t:
                x = _temporal_upsample_cached(sp["tup"], x, cio, first)
            x = _spatial_upsample(sp["sup"], x)  # (1,3,3), stateless
    x = cio.conv(d["conv_out"], jax.nn.silu(wan_rms_norm(d["norm_out"], x)))
    return x.transpose(0, 4, 1, 2, 3).astype(jnp.float32), tuple(cio.out)


def vae_decode_streamed(params, cfg: VAEConfig, latents: jnp.ndarray,
                        denormalize: bool = True,
                        chunk_latents: int = 2) -> jnp.ndarray:
    """Bit-exact streaming decode: latents -> pixels in [0, 1], constant
    activation memory in clip length (vs the sliding-window approximation
    of ``vae_decode``). First chunk carries the first-frame paths; later
    chunks reuse at most two compiled variants (steady + ragged tail)."""
    if denormalize:
        latents = denormalize_latents(cfg, latents)
    L = latents.shape[2]
    x0, caches = _vae_decode_chunk(params, cfg, latents[:, :, :1], None,
                                   True)
    pieces = [x0]
    j = 1
    while j < L:
        c = min(chunk_latents, L - j)
        xj, caches = _vae_decode_chunk(params, cfg, latents[:, :, j:j + c],
                                       caches, False)
        pieces.append(xj)
        j += c
    video = jnp.concatenate(pieces, axis=2)
    return jnp.clip((video + 1.0) / 2.0, 0.0, 1.0)


def _temporal_downsample_cached(p, x, cio: "_CacheIO", first: bool):
    """Streaming form of _temporal_downsample (stride-2 k=3 UNPADDED
    conv whose first window starts at frame 1; carry = kt - stride = 1
    input frame). The first frame (chunk 0 only) passes through
    identically AND seeds the carry — it IS the first window's first
    tap, matching the monolithic no-pad conv over the full sequence."""
    cache = cio.pull()
    if first:
        # chunk 0 is exactly one frame: identity output, frame cached
        cio.push(x[:, :1])
        return x[:, :1]
    ext = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
    n_out = (ext.shape[1] - 3) // 2 + 1
    assert n_out >= 1, "streaming chunk too small for the stride-2 window"
    cio.push(ext[:, 2 * n_out:])
    kh, kw = p["kernel"].shape[1:3]
    spad = (((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2))
    y = _conv3d_via_2d(ext, p["kernel"].astype(x.dtype),
                       tpad=(0, 0), tstride=2, spad=spad, sstride=(1, 1))
    return y + p["bias"].astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "first"))
def _vae_encode_chunk(params, cfg: VAEConfig, video: jnp.ndarray, caches,
                      first: bool):
    """Encode one pixel-frame chunk with carried caches. Returns
    ((mean, logvar) latent moments for the chunk, new_caches)."""
    cdtype = resolve_dtype(cfg.compute_dtype)
    x = video.transpose(0, 2, 3, 4, 1).astype(cdtype)
    e = params["enc"]
    cio = _CacheIO(caches)
    x = cio.conv(e["conv_in"], x)
    n_scales = len(cfg.dim_mults)
    for i in range(n_scales):
        sp = e["scales"][i]
        for rp in sp["res"]:
            x = _resblock_cached(rp, x, cio)
        if i < n_scales - 1:
            x = _spatial_downsample(sp["sdown"], x)  # (1,3,3) stateless
            if cfg.temporal_downsample[i]:
                x = _temporal_downsample_cached(sp["tdown"], x, cio, first)
    x = _resblock_cached(e["mid"]["res1"], x, cio)
    x = _spatial_attn(e["mid"]["attn"], x)
    x = _resblock_cached(e["mid"]["res2"], x, cio)
    x = cio.conv(e["conv_out"], jax.nn.silu(wan_rms_norm(e["norm_out"], x)))
    x = causal_conv3d(e["quant"], x)  # 1x1x1, stateless
    x = x.transpose(0, 4, 1, 2, 3)
    mean, logvar = jnp.split(x, 2, axis=1)
    return (mean.astype(jnp.float32), logvar.astype(jnp.float32)), \
        tuple(cio.out)


def vae_encode_streamed(params, cfg: VAEConfig, video: jnp.ndarray,
                        normalize: bool = True,
                        chunk_frames: int = 8) -> jnp.ndarray:
    """Bit-exact streaming encode: pixels [B, 3, T, H, W] in [-1, 1] ->
    normalized latent means, constant activation memory in clip length.
    ``chunk_frames`` must be a multiple of the temporal factor (stride
    phase alignment); T must be 1 (mod temporal_factor)."""
    tf = cfg.temporal_factor
    assert chunk_frames % tf == 0
    T = video.shape[2]
    (mean0, _), caches = _vae_encode_chunk(params, cfg, video[:, :, :1],
                                           None, True)
    pieces = [mean0]
    j = 1
    while j < T:
        c = min(chunk_frames, T - j)
        # absorb a ragged remainder (< temporal factor) into this chunk so
        # no chunk produces zero latent frames at the deepest level
        if 0 < T - (j + c) < tf:
            c = T - j
        (mj, _), caches = _vae_encode_chunk(params, cfg,
                                            video[:, :, j:j + c], caches,
                                            False)
        pieces.append(mj)
        j += c
    z = jnp.concatenate(pieces, axis=2)
    if normalize:
        z = normalize_latents(cfg, z)
    return z
