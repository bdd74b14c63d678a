"""CogVideoX-5B(-I2V) transformer backbone, TPU-native.

Replaces the reference's external diffusers ``CogVideoXTransformer3DModel``
used by backbone_experiment/cogvideo/ (SURVEY.md §2.7/Ly):

- forward contract = common_cogvideo.py:184-218:
  forward(hidden_states [B,C,T,H,W], encoder_hidden_states [B,L,4096],
  timestep [B]) -> velocity/v-pred [B,16,T,H,W]
- delta-A site = the 512-d ``time_embedding`` output
  (common_cogvideo.py:225-279 DeltaAWrapperCogVideo)
- LoRA sites = per-block separate to_q/to_k/to_v/to_out projections
  (run_lora_tta_cogvideo.py:215)
- I2V conditioning = image latents (first latent frame = the encoded
  conditioning image, rest zeros) channel-concatenated onto the noisy
  latents (in_channels 32), the diffusers CogVideoX-I2V convention

Architecture (diffusers layout): patch_embed (per-frame Conv2d p=2 on
the video + Linear on the text tokens), joint [text | video] sequence
through ``depth`` blocks of {CogVideoXLayerNormZero(temb -> 6 chunks
modulating BOTH streams), qk-LayerNorm attention with 3D RoPE on the
video tokens only, LayerNormZero'd 4x GELU FFN over the joint
sequence}, then norm_final + AdaLayerNorm(scale-first chunk) +
proj_out. Blocks run as a remat ``lax.scan`` over stacked params.

The reference never actually executed its CogVideoX port
(backbone_experiment NOT_RUN_YET status); this implementation is
validated by random-weight shape/identity/training tests
(tests/test_cogvideox.py) and a structural converter check.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import CogVideoXConfig, resolve_dtype
from ..ops.attention import attention
from ..ops.layers import layer_norm, linear, mlp_embedder, \
    remat_wrap, timestep_embedding
from .dit import apply_rope, rope_3d_angles

AdapterDict = Optional[Dict[str, Any]]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_cogvideox(rng: jax.Array, cfg: CogVideoXConfig,
                   zero_init: bool = True) -> Dict[str, Any]:
    pdtype = resolve_dtype(cfg.param_dtype)
    D, L = cfg.hidden_size, cfg.depth
    counter = [0]

    def key():
        counter[0] += 1
        return jax.random.fold_in(rng, counter[0])

    def dense(din, dout, depth=None, zero=False, scale=0.02, dtype=pdtype):
        shape = (din, dout) if depth is None else (depth, din, dout)
        bshape = (dout,) if depth is None else (depth, dout)
        k = (jnp.zeros(shape, dtype) if zero else
             (jax.random.normal(key(), shape, jnp.float32) * scale
              ).astype(dtype))
        return {"kernel": k, "bias": jnp.zeros(bshape, dtype)}

    def ln(depth=None, dim=D):
        shape = (dim,) if depth is None else (depth, dim)
        return {"weight": jnp.ones(shape, pdtype),
                "bias": jnp.zeros(shape, pdtype)}

    pos_embed = (
        {"pos_embed": (jax.random.normal(
            key(), (cfg.learned_pos_embed_len, D), jnp.float32) * 0.02
        ).astype(pdtype)}
        if cfg.learned_pos_embed_len > 0 else {})
    return {
        **pos_embed,
        # per-frame Conv2d p=2 expressed as a dense over packed patches
        "patch_embed": dense(cfg.in_channels * cfg.patch_size ** 2, D),
        "text_proj": dense(cfg.text_dim, D),
        "time_embed": {
            "w1": jax.random.normal(key(), (D, cfg.time_embed_dim),
                                    jnp.float32) * 0.02,
            "b1": jnp.zeros((cfg.time_embed_dim,), jnp.float32),
            "w2": jax.random.normal(
                key(), (cfg.time_embed_dim, cfg.time_embed_dim),
                jnp.float32) * 0.02,
            "b2": jnp.zeros((cfg.time_embed_dim,), jnp.float32),
        },
        "blocks": {
            "norm1": {"lin": dense(cfg.time_embed_dim, 6 * D, L),
                      "ln": ln(L)},
            "attn": {
                "to_q": dense(D, D, L),
                "to_k": dense(D, D, L),
                "to_v": dense(D, D, L),
                "to_out": dense(D, D, L, zero=zero_init),
                "norm_q": ln(L, cfg.head_dim),
                "norm_k": ln(L, cfg.head_dim),
            },
            "norm2": {"lin": dense(cfg.time_embed_dim, 6 * D, L),
                      "ln": ln(L)},
            "ff": {"w_in": dense(D, cfg.ffn_dim, L),
                   "w_out": dense(cfg.ffn_dim, D, L, zero=zero_init)},
        },
        "norm_final": ln(),
        "norm_out": {"lin": dense(cfg.time_embed_dim, 2 * D),
                     "ln": ln()},
        "proj_out": dense(D, cfg.out_channels * cfg.patch_size ** 2,
                          zero=zero_init),
    }


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


# token packing is identical to the MMDiT contract (t-major token order,
# c,ph,pw channel order) — one implementation, shared
from .mmdit import pack_latents as _pack  # noqa: E402


def _unpack(tokens: jnp.ndarray, T: int, H: int, W: int, p: int,
            C: int) -> jnp.ndarray:
    from .mmdit import unpack_tokens

    return unpack_tokens(tokens, T, H, W, p)


def _ln_zero(npz, temb, hidden, enc, cdtype):
    """CogVideoXLayerNormZero: silu(temb) -> Linear -> 6 chunks
    (shift, scale, gate) x (video, text); affine LayerNorm on both."""
    mod = linear(npz["lin"], jax.nn.silu(temb).astype(cdtype))[:, None, :]
    sh, sc, g, e_sh, e_sc, e_g = jnp.split(mod, 6, axis=-1)
    h = layer_norm(hidden, npz["ln"]["weight"], npz["ln"]["bias"])
    e = layer_norm(enc, npz["ln"]["weight"], npz["ln"]["bias"])
    return h * (1 + sc) + sh, e * (1 + e_sc) + e_sh, g, e_g


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "attn_impl",
                                              "cache_cond_half"))
def cogvideox_forward(
    params: Dict[str, Any],
    cfg: CogVideoXConfig,
    latents: jnp.ndarray,          # [B, 16, T, H_lat, W_lat] noisy
    timestep: jnp.ndarray,         # [B] (sigma*1000 units)
    text_emb: jnp.ndarray,         # [B, L, 4096]
    image_latents: Optional[jnp.ndarray] = None,  # [B, 16, T, H, W]
    adapters: AdapterDict = None,
    attn_impl: Optional[str] = None,
    pab_reuse: Optional[jnp.ndarray] = None,
    pab_cache=None,
    cache_cond_half: bool = False,
) -> jnp.ndarray:
    """-> prediction [B, out_channels, T, H_lat, W_lat] fp32.

    ``cache_cond_half``: CFG-reuse conditional-only forward —
    ``pab_cache`` carries the full CFG batch (2B) while the inputs
    carry B; each block slices the second (conditional) half of its
    cache row in-scan (block-sized scratch, no materialized half-batch
    cache copy; see models/dit.py).

    ``pab_reuse``/``pab_cache``: Pyramid Attention Broadcast
    (arXiv:2408.2588-style, see models/dit.py) — ``pab_cache`` holds
    per-block joint-attention outputs [depth, B, L+S_vid, D]; when the
    traced bool ``pab_reuse`` is set the whole attention module
    (projections + RoPE + attention + out-proj) is skipped via
    lax.cond and the cached output is used. Return becomes
    (out, new_cache).

    ``image_latents`` (I2V): channel-concatenated conditioning — pass
    zeros-everywhere-but-frame-0 per the CogVideoX-I2V convention; when
    ``cfg.in_channels == cfg.latent_channels`` (t2v) it must be None.

    Adapter keys: ``delta_t`` [time_embed_dim] added to the time
    embedding (DeltaAWrapperCogVideo site); ``lora`` {to_q/to_k/to_v/
    to_out/ff_in/ff_out: {a, b}} stacks; ``lora_scale``.
    """
    cdtype = resolve_dtype(cfg.compute_dtype)
    adapters = adapters or {}
    B, _, T, H, W = latents.shape
    p = cfg.patch_size
    L = text_emb.shape[1]
    nH, dh = cfg.num_heads, cfg.head_dim

    x = latents
    if cfg.in_channels != cfg.latent_channels:
        if image_latents is None:
            image_latents = jnp.zeros_like(latents)
        x = jnp.concatenate([x, image_latents], axis=1)
    vid = linear(params["patch_embed"], _pack(x.astype(cdtype), p))
    txt = linear(params["text_proj"], text_emb.astype(cdtype))

    pe = params.get("pos_embed")
    if pe is not None:
        # learned joint-sequence positional embedding sliced to
        # [text | video] length (diffusers CogVideoXPatchEmbed with
        # use_learned_positional_embeddings, I2V checkpoints)
        S = L + vid.shape[1]
        if S > pe.shape[0]:
            raise ValueError(
                f"sequence {S} exceeds learned pos-embed table "
                f"{pe.shape[0]} (text {L} + video {vid.shape[1]})")
        txt = txt + pe[None, :L].astype(cdtype)
        vid = vid + pe[None, L:S].astype(cdtype)

    # time embedding in fp32 (sinusoid width = hidden, diffusers
    # Timesteps(inner_dim) with flip_sin_to_cos, shift 0)
    t_feat = timestep_embedding(jnp.asarray(timestep, jnp.float32),
                                cfg.hidden_size)
    temb = mlp_embedder(params["time_embed"], t_feat)
    if adapters.get("delta_t") is not None:
        temb = temb + adapters["delta_t"].astype(jnp.float32)[None, :]

    cos, sin = rope_3d_angles(T, H // p, W // p, cfg.rope_dims,
                              cfg.rope_theta)
    lora_scale = adapters.get("lora_scale", 1.0)
    lora_stack = adapters.get("lora") or {}

    def block(carry, bp, lora, cache_blk):
        vid, txt = carry

        def lin_l(site, pp, t):
            return linear(pp, t, lora=(lora or {}).get(site),
                          lora_scale=lora_scale)

        vid_n, txt_n, g, eg = _ln_zero(bp["norm1"], temb, vid, txt, cdtype)

        def attn_module(ops):
            vid_n, txt_n = ops

            def qkv(t, site):
                return lin_l(site, bp["attn"]["to_" + site[-1]], t).reshape(
                    t.shape[0], t.shape[1], nH, dh)

            q = jnp.concatenate([qkv(txt_n, "to_q"), qkv(vid_n, "to_q")],
                                axis=1)
            k = jnp.concatenate([qkv(txt_n, "to_k"), qkv(vid_n, "to_k")],
                                axis=1)
            v = jnp.concatenate([qkv(txt_n, "to_v"), qkv(vid_n, "to_v")],
                                axis=1)
            q = layer_norm(q, bp["attn"]["norm_q"]["weight"],
                           bp["attn"]["norm_q"]["bias"], eps=cfg.norm_eps)
            k = layer_norm(k, bp["attn"]["norm_k"]["weight"],
                           bp["attn"]["norm_k"]["bias"], eps=cfg.norm_eps)
            # RoPE on video tokens only (CogVideoXAttnProcessor)
            S_vid = vid.shape[1]

            def rope_vid(t):
                tv = t[:, L:].reshape(B, T, S_vid // T, nH, dh)
                tv = apply_rope(tv, cos, sin).reshape(B, S_vid, nH, dh)
                return jnp.concatenate([t[:, :L], tv], axis=1)

            q, k = rope_vid(q), rope_vid(k)
            o = attention(q, k, v, impl=attn_impl).reshape(
                B, L + S_vid, -1)
            return lin_l("to_out", bp["attn"]["to_out"], o).astype(cdtype)

        if pab_reuse is not None:
            o = jax.lax.cond(pab_reuse,
                             lambda ops: cache_blk.astype(cdtype),
                             attn_module, (vid_n, txt_n))
        else:
            o = attn_module((vid_n, txt_n))
        txt = txt + eg * o[:, :L]
        vid = vid + g * o[:, L:]

        vid_n, txt_n, g, eg = _ln_zero(bp["norm2"], temb, vid, txt, cdtype)
        joint = jnp.concatenate([txt_n, vid_n], axis=1)
        h = jax.nn.gelu(lin_l("ff_in", bp["ff"]["w_in"], joint))
        h = lin_l("ff_out", bp["ff"]["w_out"], h)
        txt = txt + eg * h[:, :L]
        vid = vid + g * h[:, L:]
        return (vid, txt), o

    nb = latents.shape[0]
    if pab_cache is not None:
        def body(carry, xs):
            bp, lora, cache_blk = xs
            if cache_cond_half:
                cache_blk = cache_blk[cache_blk.shape[0] - nb:]
            carry, o = block(carry, bp, lora, cache_blk)
            return carry, o

        body_fn = remat_wrap(body, cfg.remat, cfg.remat_policy)
        (vid, txt), new_cache = jax.lax.scan(
            body_fn, (vid, txt), (params["blocks"], lora_stack, pab_cache))
    else:
        def body(carry, xs):
            bp, lora = xs
            carry, _ = block(carry, bp, lora, None)
            return carry, None

        body_fn = remat_wrap(body, cfg.remat, cfg.remat_policy)
        (vid, txt), _ = jax.lax.scan(body_fn, (vid, txt),
                                     (params["blocks"], lora_stack))
        new_cache = None

    joint = jnp.concatenate([txt, vid], axis=1)
    joint = layer_norm(joint, params["norm_final"]["weight"],
                       params["norm_final"]["bias"], eps=cfg.norm_eps)
    vid = joint[:, L:]
    # AdaLayerNorm with chunk_dim=1: SHIFT-first chunk (diffusers
    # AdaLayerNorm as instantiated by CogVideoX norm_out)
    mod = linear(params["norm_out"]["lin"],
                 jax.nn.silu(temb).astype(cdtype))[:, None, :]
    shift, scale = jnp.split(mod, 2, axis=-1)
    vid = layer_norm(vid, params["norm_out"]["ln"]["weight"],
                     params["norm_out"]["ln"]["bias"],
                     eps=cfg.norm_eps) * (1 + scale) + shift
    out = linear(params["proj_out"], vid)
    res = _unpack(out, T, H, W, p, cfg.out_channels)
    if adapters.get("delta_out") is not None:
        res = res + adapters["delta_out"].astype(res.dtype)[
            None, :, None, None, None]
    res = res.astype(jnp.float32)
    if pab_cache is not None:
        return res, new_cache
    return res


def pab_init_cache_cogvideox(cfg: CogVideoXConfig, batch: int, t_lat: int,
                             lat_h: int, lat_w: int,
                             text_len: int) -> jnp.ndarray:
    """Zero-init PAB cache for the joint [text | video] attention:
    [depth, B, L + S_vid, hidden] (step 0 always computes)."""
    p = cfg.patch_size
    s_vid = t_lat * (lat_h // p) * (lat_w // p)
    return jnp.zeros((cfg.depth, batch, text_len + s_vid, cfg.hidden_size),
                     resolve_dtype(cfg.compute_dtype))


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
