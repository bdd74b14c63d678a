"""Open-Sora v2.0 MMDiT backbone (Flux-style dual-stream + single-stream),
TPU-native.

Replaces the reference's external Open-Sora model used by
backbone_experiment/opensora/ (SURVEY.md §2.7/Ly):

- forward contract = common_opensora.py:247-307 (img/img_ids/txt/txt_ids/
  timesteps/y_vec/guidance kwargs), :314-411 (cond_embed v2v/i2v
  conditioning via [masks | masked_ref] channel input), patchify layout
  "b c t (h ph) (w pw) -> b (t h w) (c ph pw)" (:190-242)
- vec pipeline = time_in(timestep_embedding(t)) + vector_in(y_vec)
  [+ guidance_in], the delta-A injection point
  (common_opensora.py:418-475, run_delta_a_opensora.py:6-8)
- LoRA sites = lora_layers.py:231-416: double-stream img/txt attn
  qkv+proj (+ optional mlp), single-stream linear1/linear2

Architecture is the standard Flux MMDiT: N_double dual-stream blocks
(separate img/txt params, joint attention) then N_single fused blocks
over the concatenated [txt | img] sequence; both stacks run as remat
``lax.scan`` over stacked block params (one compile per stack).

RoPE note: we rotate half-split pairs (ops/layers.py convention) rather
than Flux's interleaved pairs. The two are related by a fixed per-head
channel permutation P of q and k; since q·k is invariant under a common
permutation, a weight converter maps upstream checkpoints exactly by
permuting the q/k rows of every qkv kernel (and q_norm/k_norm scales)
— see convert.convert_torch_mmdit_state.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import MMDiTConfig, resolve_dtype
from ..ops.attention import attention
from ..ops.layers import layer_norm, mlp_embedder, modulate, \
    remat_wrap, rms_norm, timestep_embedding

AdapterDict = Optional[Dict[str, Any]]


# ---------------------------------------------------------------------------
# packing (common_opensora.py patchify_latents / unpatchify_tokens)
# ---------------------------------------------------------------------------


def pack_latents(latents: jnp.ndarray, p: int) -> jnp.ndarray:
    """[B, C, T, H, W] -> [B, T*Hp*Wp, C*p*p] (token order t,h,w; channel
    order c,ph,pw — common_opensora.py:205-217)."""
    B, C, T, H, W = latents.shape
    x = latents.reshape(B, C, T, H // p, p, W // p, p)
    x = x.transpose(0, 2, 3, 5, 1, 4, 6)
    return x.reshape(B, T * (H // p) * (W // p), C * p * p)


def unpack_tokens(tokens: jnp.ndarray, T: int, H: int, W: int,
                  p: int) -> jnp.ndarray:
    """[B, N, C*p*p] -> [B, C, T, H, W] (common_opensora.py:220-240)."""
    B, N, Cpp = tokens.shape
    C = Cpp // (p * p)
    x = tokens.reshape(B, T, H // p, W // p, C, p, p)
    x = x.transpose(0, 4, 1, 2, 5, 3, 6)
    return x.reshape(B, C, T, H, W)


def _rope_joint(cfg: MMDiTConfig, L_txt: int, nt: int, nh: int, nw: int):
    """cos/sin [L_txt + N_img, head_dim//2]: identity rotation for text
    (txt_ids are zeros — common_opensora.py:100), factored (t,h,w) for
    video tokens."""
    from ..ops.layers import rope_3d_angles

    cos_i, sin_i = rope_3d_angles(nt, nh, nw, cfg.axes_dims, cfg.rope_theta)
    half = cfg.head_dim // 2
    cos_i = cos_i.reshape(nt * nh * nw, half)
    sin_i = sin_i.reshape(nt * nh * nw, half)
    cos = jnp.concatenate([jnp.ones((L_txt, half), cos_i.dtype), cos_i])
    sin = jnp.concatenate([jnp.zeros((L_txt, half), sin_i.dtype), sin_i])
    return cos, sin


def _apply_rope_flat(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x: [B, S, H, dh]; cos/sin: [S, dh//2] (half-split rotation)."""
    half = x.shape[-1] // 2
    xa, xb = x[..., :half], x[..., half:]
    c = cos[None, :, None, :].astype(x.dtype)
    s = sin[None, :, None, :].astype(x.dtype)
    return jnp.concatenate([xa * c - xb * s, xb * c + xa * s], axis=-1)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_mmdit(rng: jax.Array, cfg: MMDiTConfig,
               zero_init: bool = True) -> Dict[str, Any]:
    """Stacked-parameter pytree. ``zero_init`` zeroes the residual-output
    projections (proj/linear2/mlp-out/final) so a fresh model is
    well-conditioned — harmless for converted checkpoints which overwrite
    everything."""
    pdtype = resolve_dtype(cfg.param_dtype)
    D, mlp = cfg.hidden_size, cfg.mlp_dim
    counter = [0]

    def key():
        counter[0] += 1
        return jax.random.fold_in(rng, counter[0])

    def dense(din, dout, depth=None, zero=False, scale=0.02):
        shape = (din, dout) if depth is None else (depth, din, dout)
        bshape = (dout,) if depth is None else (depth, dout)
        k = (jnp.zeros(shape, pdtype) if zero else
             (jax.random.normal(key(), shape, jnp.float32) * scale
              ).astype(pdtype))
        return {"kernel": k, "bias": jnp.zeros(bshape, pdtype)}

    def embed_mlp(din):
        return {"w1": jax.random.normal(key(), (din, D), jnp.float32) * 0.02,
                "b1": jnp.zeros((D,), jnp.float32),
                "w2": jax.random.normal(key(), (D, D), jnp.float32) * 0.02,
                "b2": jnp.zeros((D,), jnp.float32)}

    Ld, Ls = cfg.depth_double, cfg.depth_single
    params: Dict[str, Any] = {
        "img_in": dense(cfg.packed_channels, D),
        "txt_in": dense(cfg.context_in_dim, D),
        "time_in": embed_mlp(cfg.t_embed_freq_dim),
        "vector_in": embed_mlp(cfg.vec_in_dim),
        "double": {
            "img_mod": dense(D, 6 * D, Ld),
            "txt_mod": dense(D, 6 * D, Ld),
            "img_attn": {
                "qkv": dense(D, 3 * D, Ld),
                "q_norm": jnp.ones((Ld, cfg.head_dim), pdtype),
                "k_norm": jnp.ones((Ld, cfg.head_dim), pdtype),
                "proj": dense(D, D, Ld, zero=zero_init),
            },
            "txt_attn": {
                "qkv": dense(D, 3 * D, Ld),
                "q_norm": jnp.ones((Ld, cfg.head_dim), pdtype),
                "k_norm": jnp.ones((Ld, cfg.head_dim), pdtype),
                "proj": dense(D, D, Ld, zero=zero_init),
            },
            "img_mlp": {"w_in": dense(D, mlp, Ld),
                        "w_out": dense(mlp, D, Ld, zero=zero_init)},
            "txt_mlp": {"w_in": dense(D, mlp, Ld),
                        "w_out": dense(mlp, D, Ld, zero=zero_init)},
        },
        "single": {
            "mod": dense(D, 3 * D, Ls),
            "linear1": dense(D, 3 * D + mlp, Ls),
            "q_norm": jnp.ones((Ls, cfg.head_dim), pdtype),
            "k_norm": jnp.ones((Ls, cfg.head_dim), pdtype),
            "linear2": dense(D + mlp, D, Ls, zero=zero_init),
        },
        "final": {
            "adaln": dense(D, 2 * D),
            "proj": dense(D, cfg.packed_channels, zero=zero_init),
        },
    }
    if cfg.cond_embed:
        params["cond_in"] = dense(cfg.cond_channels, D, zero=zero_init)
    if cfg.guidance_embed:
        params["guidance_in"] = embed_mlp(cfg.t_embed_freq_dim)
    return params


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def _linear(p, x, lora=None, scale=None):
    from ..ops.layers import linear

    return linear(p, x, lora=lora, lora_scale=scale)


def _qkv_heads(p, x, q_norm, k_norm, nH, dh, lora=None, scale=None):
    B, S, _ = x.shape
    qkv = _linear(p, x, lora, scale).reshape(B, S, 3, nH, dh)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    q = rms_norm(q, q_norm)
    k = rms_norm(k, k_norm)
    return q, k, v


def _double_block(bp, lora, lscale, img, txt, vec, cos, sin,
                  cfg: MMDiTConfig, attn_impl, pab_reuse=None,
                  pab_cache=None):
    B, L = txt.shape[:2]
    S = img.shape[1]
    nH, dh = cfg.num_heads, cfg.head_dim
    lora = lora or {}

    svec = jax.nn.silu(vec).astype(img.dtype)
    im = _linear(bp["img_mod"], svec)[:, None, :]
    tm = _linear(bp["txt_mod"], svec)[:, None, :]
    i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2 = jnp.split(im, 6, axis=-1)
    t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2 = jnp.split(tm, 6, axis=-1)

    img_n = modulate(layer_norm(img), i_sh1, i_sc1)
    txt_n = modulate(layer_norm(txt), t_sh1, t_sc1)

    def attn_module(ops):
        img_n, txt_n = ops
        iq, ik, iv = _qkv_heads(bp["img_attn"]["qkv"], img_n,
                                bp["img_attn"]["q_norm"],
                                bp["img_attn"]["k_norm"], nH, dh,
                                lora.get("img_qkv"), lscale)
        tq, tk, tv = _qkv_heads(bp["txt_attn"]["qkv"], txt_n,
                                bp["txt_attn"]["q_norm"],
                                bp["txt_attn"]["k_norm"], nH, dh,
                                lora.get("txt_qkv"), lscale)
        # joint sequence [txt | img] (Flux order)
        q = jnp.concatenate([tq, iq], axis=1)
        k = jnp.concatenate([tk, ik], axis=1)
        v = jnp.concatenate([tv, iv], axis=1)
        q = _apply_rope_flat(q, cos, sin)
        k = _apply_rope_flat(k, cos, sin)
        o = attention(q, k, v, impl=attn_impl)
        return o.reshape(B, L + S, -1).astype(img.dtype)

    if pab_reuse is not None:
        o = jax.lax.cond(pab_reuse, lambda ops: pab_cache.astype(img.dtype),
                         attn_module, (img_n, txt_n))
    else:
        o = attn_module((img_n, txt_n))
    o_cache = o
    t_o, i_o = o[:, :L].reshape(B, L, -1), o[:, L:].reshape(B, S, -1)

    img = img + i_g1 * _linear(bp["img_attn"]["proj"], i_o,
                               lora.get("img_proj"), lscale)
    txt = txt + t_g1 * _linear(bp["txt_attn"]["proj"], t_o,
                               lora.get("txt_proj"), lscale)

    h = modulate(layer_norm(img), i_sh2, i_sc2)
    h = jax.nn.gelu(_linear(bp["img_mlp"]["w_in"], h,
                            lora.get("img_mlp_in"), lscale))
    img = img + i_g2 * _linear(bp["img_mlp"]["w_out"], h,
                               lora.get("img_mlp_out"), lscale)

    h = modulate(layer_norm(txt), t_sh2, t_sc2)
    h = jax.nn.gelu(_linear(bp["txt_mlp"]["w_in"], h,
                            lora.get("txt_mlp_in"), lscale))
    txt = txt + t_g2 * _linear(bp["txt_mlp"]["w_out"], h,
                               lora.get("txt_mlp_out"), lscale)
    return img, txt, o_cache


def _single_block(bp, lora, lscale, x, vec, cos, sin, cfg: MMDiTConfig,
                  attn_impl, pab_reuse=None, pab_cache=None):
    B, S, D = x.shape
    nH, dh = cfg.num_heads, cfg.head_dim
    mlp = cfg.mlp_dim
    lora = lora or {}

    mod = _linear(bp["mod"], jax.nn.silu(vec).astype(x.dtype))[:, None, :]
    shift, scale, gate = jnp.split(mod, 3, axis=-1)
    xn = modulate(layer_norm(x), shift, scale)
    h = _linear(bp["linear1"], xn, lora.get("lin1"), lscale)
    qkv, mlp_h = h[..., :3 * D], h[..., 3 * D:]

    def attn_module(qkv):
        qkv = qkv.reshape(B, S, 3, nH, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = _apply_rope_flat(rms_norm(q, bp["q_norm"]), cos, sin)
        k = _apply_rope_flat(rms_norm(k, bp["k_norm"]), cos, sin)
        return attention(q, k, v, impl=attn_impl).reshape(
            B, S, D).astype(x.dtype)

    if pab_reuse is not None:
        # linear1 still runs (mlp_h shares the fused matmul); only the
        # rope/rms/attention kernel is skipped on broadcast steps
        o = jax.lax.cond(pab_reuse, lambda q: pab_cache.astype(x.dtype),
                         attn_module, qkv)
    else:
        o = attn_module(qkv)
    out = _linear(bp["linear2"],
                  jnp.concatenate([o, jax.nn.gelu(mlp_h)], axis=-1),
                  lora.get("lin2"), lscale)
    return x + gate * out, o


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "attn_impl",
                                              "cache_cond_first"))
def mmdit_forward(
    params: Dict[str, Any],
    cfg: MMDiTConfig,
    latents: jnp.ndarray,          # [B, C, T, H_lat, W_lat]
    sigma: jnp.ndarray,            # [B] flow-match time in [0, 1]
    txt: jnp.ndarray,              # [B, L, context_in_dim] (T5)
    y_vec: jnp.ndarray,            # [B, vec_in_dim] (CLIP pooled)
    cond: Optional[jnp.ndarray] = None,  # [B, 1+C, T, H_lat, W_lat]
    guidance: Optional[jnp.ndarray] = None,  # [B]
    adapters: AdapterDict = None,
    attn_impl: Optional[str] = None,
    pab_reuse: Optional[jnp.ndarray] = None,
    pab_cache=None,
    cache_cond_first: bool = False,
) -> jnp.ndarray:
    """Velocity prediction [B, C, T, H_lat, W_lat] in fp32.

    ``cache_cond_first``: CFG-reuse conditional-only forward — the
    triple-CFG batch layout here is [cond, uncond, uncond2], so
    ``pab_cache`` carries 3B rows while the inputs carry B; each block
    slices the FIRST third of its cache row in-scan (block-sized
    scratch, no materialized third-batch cache copy; see
    models/dit.py cache_cond_half).

    ``pab_reuse``/``pab_cache``: Pyramid Attention Broadcast (see
    models/dit.py): ``pab_cache`` = (dbl, sgl) per-block joint-attention
    output stacks ([n_double, B, L+S, D], [n_single, B, L+S, D]); when
    given, the return becomes (out, new_cache).

    ``cond`` carries [masks | masked_ref] for v2v/i2v conditioning
    (common_opensora.py:314-357 build_cond_embed); None = t2v.

    Adapter dict keys consumed here (same pytree-surgery mechanism as the
    LongCat DiT): ``delta_t`` [D] added to vec after time_in+vector_in;
    ``lora_double`` / ``lora_single`` per-site {a, b} stacks with leading
    block axes; ``lora_scale``.
    """
    cdtype = resolve_dtype(cfg.compute_dtype)
    adapters = adapters or {}
    B, C, T, H, W = latents.shape
    p = cfg.patch_size
    L = txt.shape[1]

    img = pack_latents(latents.astype(cdtype), p)
    img = _linear(params["img_in"], img)
    if cond is not None:
        img = img + _linear(params["cond_in"],
                            pack_latents(cond.astype(cdtype), p))
    txt_h = _linear(params["txt_in"], txt.astype(cdtype))

    # vec in fp32 (t-embed precision note: dit.py / run_delta_a.py:161-165)
    t_feat = timestep_embedding(
        jnp.asarray(sigma, jnp.float32) * 1000.0, cfg.t_embed_freq_dim)
    vec = mlp_embedder(params["time_in"], t_feat)
    vec = vec + mlp_embedder(params["vector_in"],
                             y_vec.astype(jnp.float32))
    if cfg.guidance_embed and guidance is not None:
        vec = vec + mlp_embedder(
            params["guidance_in"],
            timestep_embedding(jnp.asarray(guidance, jnp.float32) * 1000.0,
                               cfg.t_embed_freq_dim))
    if adapters.get("delta_t") is not None:
        vec = vec + adapters["delta_t"].astype(jnp.float32)[None, :]

    cos, sin = _rope_joint(cfg, L, T, H // p, W // p)
    lscale = adapters.get("lora_scale", 1.0)

    # {} is a leafless pytree: valid scan xs, statically "no lora"
    lora_d = adapters.get("lora_double") or {}
    lora_s = adapters.get("lora_single") or {}
    if pab_cache is not None:
        dbl_cache, sgl_cache = pab_cache
        nb = latents.shape[0]

        def _first(cb):
            return cb[:nb] if cache_cond_first else cb

        def dbl_body(carry, xs):
            bp, lora, cb = xs
            img, txt_h = carry
            img, txt_h, o = _double_block(
                bp, lora, lscale, img, txt_h, vec, cos, sin, cfg,
                attn_impl, pab_reuse=pab_reuse, pab_cache=_first(cb))
            return (img, txt_h), o

        def sgl_body(carry, xs):
            bp, lora, cb = xs
            out, o = _single_block(bp, lora, lscale, carry, vec, cos, sin,
                                   cfg, attn_impl, pab_reuse=pab_reuse,
                                   pab_cache=_first(cb))
            return out, o

        dbl_body_fn = remat_wrap(dbl_body, cfg.remat, cfg.remat_policy)
        sgl_body_fn = remat_wrap(sgl_body, cfg.remat, cfg.remat_policy)
        (img, txt_h), new_dbl = jax.lax.scan(
            dbl_body_fn, (img, txt_h), (params["double"], lora_d,
                                        dbl_cache))
        x = jnp.concatenate([txt_h, img], axis=1)
        x, new_sgl = jax.lax.scan(
            sgl_body_fn, x, (params["single"], lora_s, sgl_cache))
        new_cache = (new_dbl, new_sgl)
    else:
        def dbl_body(carry, xs):
            bp, lora = xs
            img, txt_h = carry
            img, txt_h, _ = _double_block(bp, lora, lscale, img, txt_h,
                                          vec, cos, sin, cfg, attn_impl)
            return (img, txt_h), None

        def sgl_body(carry, xs):
            bp, lora = xs
            out, _ = _single_block(bp, lora, lscale, carry, vec, cos,
                                   sin, cfg, attn_impl)
            return out, None

        dbl_body_fn = remat_wrap(dbl_body, cfg.remat, cfg.remat_policy)
        sgl_body_fn = remat_wrap(sgl_body, cfg.remat, cfg.remat_policy)
        (img, txt_h), _ = jax.lax.scan(
            dbl_body_fn, (img, txt_h), (params["double"], lora_d))
        x = jnp.concatenate([txt_h, img], axis=1)
        x, _ = jax.lax.scan(sgl_body_fn, x, (params["single"], lora_s))
        new_cache = None
    img = x[:, L:]

    mod = _linear(params["final"]["adaln"],
                  jax.nn.silu(vec).astype(cdtype))[:, None, :]
    shift, scale = jnp.split(mod, 2, axis=-1)
    img = modulate(layer_norm(img), shift, scale)
    img = _linear(params["final"]["proj"], img)
    out = unpack_tokens(img, T, H, W, p).astype(jnp.float32)
    if pab_cache is not None:
        return out, new_cache
    return out


def pab_init_cache_mmdit(cfg: MMDiTConfig, batch: int, t_lat: int,
                         lat_h: int, lat_w: int, text_len: int):
    """Zero-init PAB caches (double, single) for the joint [txt | img]
    attention outputs: each [n_blocks, B, L+S, hidden]."""
    p = cfg.patch_size
    s_joint = text_len + t_lat * (lat_h // p) * (lat_w // p)
    dt = resolve_dtype(cfg.compute_dtype)
    shape = (batch, s_joint, cfg.hidden_size)
    return (jnp.zeros((cfg.depth_double, *shape), dt),
            jnp.zeros((cfg.depth_single, *shape), dt))


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
