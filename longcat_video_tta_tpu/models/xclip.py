"""X-CLIP (video CLIP with cross-frame attention) — TPU-native.

The reference's CLIP gate can score caption<->video with a HF
``XCLIPModel`` (common.py:1806-2012 ``_get_xclip_scorer``, 8-frame
pad/subsample protocol). This is the JAX implementation of the full
HF X-CLIP graph:

- vision tower = CLIP ViT whose every layer first runs *message
  attention*: per-frame CLS tokens -> message_fc -> LN -> MHA across
  the ``num_frames`` axis -> appended as an extra token for that
  frame's spatial attention, dropped afterwards
- MIT (multi-frame integration transformer): learned frame-position
  embeddings + a small CLIP encoder over per-frame projected CLS
  embeds, residual, mean-pool -> video embedding
- video-conditioned prompts: patch-token features (prompts_visual
  LN+projection, frame-averaged) attend into the text embedding via
  ``prompt_layers`` cross-attention blocks scaled by a learned alpha
- logits = cosine(video, prompted text)

Weights convert from a HF ``XCLIPModel`` state_dict
(``convert_torch_xclip_state`` here); numerics validated against
``transformers.XCLIPModel`` on tiny random configs
(tests/test_xclip.py). ``make_jax_xclip_scorer`` produces the
tta.clip_gate ScorerFn (pad/subsample to ``num_frames`` like the
reference scorer) so the gate runs on-TPU without torch.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import XCLIPConfig
from ..ops.layers import layer_norm
from .clip import preprocess_frames
from .clip_text import _quick_gelu, clip_text_pooled

_EPS = 1e-5


def _mha(q, k, v, num_heads):
    """[B, Sq, D] x [B, Sk, D] -> [B, Sq, D] plain softmax attention."""
    B, Sq, D = q.shape
    dh = D // num_heads
    qh = q.reshape(B, Sq, num_heads, dh)
    kh = k.reshape(B, k.shape[1], num_heads, dh)
    vh = v.reshape(B, v.shape[1], num_heads, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * (dh ** -0.5)
    o = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(logits, axis=-1), vh)
    return o.reshape(B, Sq, D)


def _lin(p, x):
    return jnp.dot(x, p["kernel"]) + p["bias"]


def _vision_encoder(layers, x, cfg: XCLIPConfig, num_frames: int):
    """Cross-frame message attention + spatial attention stack.

    x: [B*T, L, W] (frame-major). Mirrors XCLIPVisionEncoderLayer:
    msg = fc(cls); msg += MHA(LN(msg)) over frames; spatial attention
    over [tokens ++ msg]; msg dropped; MLP."""
    BT, L, W = x.shape
    B = BT // num_frames
    nH = cfg.vision_heads

    def body(x, lp):
        cls = x[:, 0]
        msg = _lin(lp["msg_fc"], cls).reshape(B, num_frames, W)
        m = layer_norm(msg, lp["msg_ln"]["weight"], lp["msg_ln"]["bias"],
                       eps=_EPS)
        attn = _mha(_lin(lp["msg_q"], m), _lin(lp["msg_k"], m),
                    _lin(lp["msg_v"], m), nH)
        msg = msg + _lin(lp["msg_out"], attn)
        x = jnp.concatenate([x, msg.reshape(BT, 1, W)], axis=1)

        h = layer_norm(x, lp["ln1"]["weight"], lp["ln1"]["bias"], eps=_EPS)
        attn = _mha(_lin(lp["q"], h), _lin(lp["k"], h), _lin(lp["v"], h),
                    nH)
        x = (x + _lin(lp["out"], attn))[:, :L]
        h = layer_norm(x, lp["ln2"]["weight"], lp["ln2"]["bias"], eps=_EPS)
        h = _quick_gelu(_lin(lp["fc1"], h))
        x = x + _lin(lp["fc2"], h)
        return x, None

    x, _ = jax.lax.scan(body, x, layers)
    return x


def _mit(params, cls_features, cfg: XCLIPConfig):
    """[B, T, proj] -> video embeds [B, proj] (MIT: +positions, CLIP
    encoder, residual, mean over frames)."""
    residual = cls_features
    x = cls_features + params["position_embedding"][None]
    nH = cfg.mit_heads

    def body(x, lp):
        h = layer_norm(x, lp["ln1"]["weight"], lp["ln1"]["bias"], eps=_EPS)
        attn = _mha(_lin(lp["q"], h), _lin(lp["k"], h), _lin(lp["v"], h),
                    nH)
        x = x + _lin(lp["out"], attn)
        h = layer_norm(x, lp["ln2"]["weight"], lp["ln2"]["bias"], eps=_EPS)
        h = _quick_gelu(_lin(lp["fc1"], h))
        x = x + _lin(lp["fc2"], h)
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return jnp.mean(x + residual, axis=1)


def _prompts(params, text, visual, cfg: XCLIPConfig):
    """Video-specific prompts: text [B, K, proj] attends into frame-
    averaged patch features [B, Lp, proj]; returns alpha * prompted."""
    visual = layer_norm(visual, params["ln"]["weight"], params["ln"]["bias"],
                        eps=_EPS)
    nH = cfg.prompt_heads

    def body(x, lp):
        h = layer_norm(x, lp["norm1"]["weight"], lp["norm1"]["bias"],
                       eps=_EPS)
        q = jnp.dot(h, lp["q"])          # no bias (XCLIPCrossAttention)
        k = jnp.dot(visual, lp["k"])
        v = jnp.dot(visual, lp["v"])
        x = x + _lin(lp["proj"], _mha(q, k, v, nH))
        h = layer_norm(x, lp["norm3"]["weight"], lp["norm3"]["bias"],
                       eps=_EPS)
        x = x + _lin(lp["fc2"], _quick_gelu(_lin(lp["fc1"], h)))
        return x, None

    x, _ = jax.lax.scan(body, text, params["layers"])
    return params["alpha"] * x


def _l2(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("cfg",))
def xclip_scores(
    params: Dict[str, Any],
    cfg: XCLIPConfig,
    pixels: jnp.ndarray,           # [B, T, S, S, 3] preprocessed
    input_ids: jnp.ndarray,        # [K, max_length] int32
) -> jnp.ndarray:
    """-> cosine similarities [B, K] (XCLIPModel.forward without the
    logit scale — the gate thresholds raw cosines, make_hf_xclip_scorer
    convention)."""
    from .clip import vision_embed_tokens

    B, T = pixels.shape[0], pixels.shape[1]
    vp = params["vision"]
    x = vision_embed_tokens(vp, cfg.vision, pixels.reshape(
        (B * T,) + pixels.shape[2:]))
    x = layer_norm(x, vp["pre_ln"]["weight"], vp["pre_ln"]["bias"],
                   eps=_EPS)
    x = _vision_encoder(vp["layers"], x, cfg, T)
    pooled = layer_norm(x[:, 0], vp["post_ln"]["weight"],
                        vp["post_ln"]["bias"], eps=_EPS)

    frame_embeds = jnp.dot(pooled, params["visual_projection"])
    video_embeds = _mit(params["mit"], frame_embeds.reshape(B, T, -1), cfg)

    img_features = layer_norm(
        x[:, 1:], params["prompts_visual_ln"]["weight"],
        params["prompts_visual_ln"]["bias"], eps=_EPS)
    img_features = jnp.dot(img_features, params["prompts_visual_projection"])
    img_features = jnp.mean(
        img_features.reshape(B, T, img_features.shape[1], -1), axis=1)

    text_pooled = clip_text_pooled(params["text"], cfg.text, input_ids)
    text_embeds = jnp.dot(text_pooled, params["text_projection"])
    text_embeds = jnp.broadcast_to(
        text_embeds[None], (B,) + text_embeds.shape)
    text_embeds = text_embeds + _prompts(params["prompts"], text_embeds,
                                         img_features, cfg)

    return jnp.einsum("bd,bkd->bk", _l2(video_embeds), _l2(text_embeds))


def make_jax_xclip_scorer(
    params: Dict[str, Any],
    cfg: XCLIPConfig,
    tokenize: Callable[[str], np.ndarray],
) -> Callable:
    """-> tta.clip_gate ScorerFn: video-level score broadcast over the
    sampled frames (pad/subsample to cfg.num_frames exactly like the
    reference's make_hf_xclip_scorer)."""

    def score(frames: np.ndarray, caption: str) -> np.ndarray:
        from .clip import pad_or_subsample_frames

        frames = pad_or_subsample_frames(np.asarray(frames),
                                         cfg.num_frames)
        pixels = preprocess_frames(np.asarray(frames),
                                   cfg.vision.image_size)[None]
        ids = jnp.asarray(tokenize(caption))[None]
        s = xclip_scores(params, cfg, pixels, ids)
        return np.asarray(s).reshape(-1)

    return score
