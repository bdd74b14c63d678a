"""CLIP vision tower + full dual-encoder scorer, TPU-native.

The reference's CLIP gate scores captions against frames with a HF
``CLIPModel`` at runtime (common.py:1806-2012 ``_get_clip_scorer``);
round 2 left scoring as an external torch hook. This module is the
JAX implementation: a ViT vision tower (HF ``CLIPVisionTransformer``
layout: class token, patch conv, learned positions, pre-LN, non-causal
pre-LN transformer with quick-GELU MLPs, post-LN on CLS), the
visual/text projections and the frame preprocessing (shortest-edge
resize + center crop + CLIP normalization), composing with the existing
text tower (models/clip_text.py).

Weights convert from a HF ``CLIPModel`` state_dict
(convert.convert_torch_clip_model_state); numerics are validated
against ``transformers.CLIPModel`` with tiny random configs
(tests/test_clip_vision.py). ``make_jax_clip_scorer`` produces the
tta.clip_gate ScorerFn so the gate runs on-TPU without torch.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPTextConfig, CLIPVisionConfig
from ..ops.layers import layer_norm
from .clip_text import clip_encoder, clip_text_pooled, init_clip_text

# CLIPProcessor / OPENAI_CLIP normalization constants
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def init_clip_vision(rng: jax.Array, cfg: CLIPVisionConfig) -> Dict[str, Any]:
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

    W, L, p = cfg.width, cfg.num_layers, cfg.patch_size
    n_pos = (cfg.image_size // p) ** 2 + 1
    return {
        "class_embedding": jax.random.normal(key(), (W,), jnp.float32) * 0.02,
        "patch_embedding": {
            "kernel": jax.random.normal(key(), (p, p, 3, W),
                                        jnp.float32) * 0.02,
        },
        "position_embedding": jax.random.normal(
            key(), (n_pos, W), jnp.float32) * 0.01,
        "pre_ln": {"weight": jnp.ones((W,)), "bias": jnp.zeros((W,))},
        "layers": {
            "ln1": {"weight": jnp.ones((L, W)), "bias": jnp.zeros((L, W))},
            "q": dense(W, W, L), "k": dense(W, W, L), "v": dense(W, W, L),
            "out": dense(W, W, L),
            "ln2": {"weight": jnp.ones((L, W)), "bias": jnp.zeros((L, W))},
            "fc1": dense(W, 4 * W, L), "fc2": dense(4 * W, W, L),
        },
        "post_ln": {"weight": jnp.ones((W,)), "bias": jnp.zeros((W,))},
    }


def init_clip_model(rng: jax.Array, vcfg: CLIPVisionConfig,
                    tcfg: CLIPTextConfig) -> Dict[str, Any]:
    """Random full dual-encoder tree (tests / smoke)."""
    proj = vcfg.projection_dim
    return {
        "vision": init_clip_vision(jax.random.fold_in(rng, 1), vcfg),
        "text": init_clip_text(jax.random.fold_in(rng, 2), tcfg),
        "visual_projection": jax.random.normal(
            jax.random.fold_in(rng, 3), (vcfg.width, proj),
            jnp.float32) * 0.02,
        "text_projection": jax.random.normal(
            jax.random.fold_in(rng, 4), (tcfg.width, proj),
            jnp.float32) * 0.02,
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }


def vision_embed_tokens(params: Dict[str, Any], cfg: CLIPVisionConfig,
                        pixels: jnp.ndarray) -> jnp.ndarray:
    """[B, S, S, 3] preprocessed pixels -> embedded tokens [B, N+1, W]
    (class token first), before pre-LN."""
    p = cfg.patch_size
    feat = jax.lax.conv_general_dilated(
        pixels, params["patch_embedding"]["kernel"], (p, p), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    B = feat.shape[0]
    tokens = feat.reshape(B, -1, cfg.width)
    cls = jnp.broadcast_to(params["class_embedding"], (B, 1, cfg.width))
    x = jnp.concatenate([cls, tokens], axis=1)
    return x + params["position_embedding"][None]


@functools.partial(jax.jit, static_argnames=("cfg",))
def clip_vision_pooled(
    params: Dict[str, Any],
    cfg: CLIPVisionConfig,
    pixels: jnp.ndarray,           # [B, S, S, 3] preprocessed
) -> jnp.ndarray:
    """-> pooled [B, width]: post-LN hidden at the class token."""
    x = vision_embed_tokens(params, cfg, pixels)
    x = layer_norm(x, params["pre_ln"]["weight"],
                   params["pre_ln"]["bias"], eps=1e-5)
    x = clip_encoder(params["layers"], x, cfg.num_heads, cfg.head_dim)
    return layer_norm(x[:, 0], params["post_ln"]["weight"],
                      params["post_ln"]["bias"], eps=1e-5)


def _l2norm(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("vcfg",))
def clip_image_embed(clip_params, vcfg: CLIPVisionConfig, pixels):
    """-> L2-normalized projected image embeds [B, proj]."""
    pooled = clip_vision_pooled(clip_params["vision"], vcfg, pixels)
    return _l2norm(jnp.dot(pooled, clip_params["visual_projection"]))


@functools.partial(jax.jit, static_argnames=("tcfg",))
def clip_text_embed(clip_params, tcfg: CLIPTextConfig, input_ids):
    """-> L2-normalized projected text embeds [B, proj]."""
    pooled = clip_text_pooled(clip_params["text"], tcfg, input_ids)
    return _l2norm(jnp.dot(pooled, clip_params["text_projection"]))


def preprocess_frames(frames: np.ndarray, image_size: int) -> jnp.ndarray:
    """[T, H, W, 3] float [0,1] -> [T, S, S, 3] CLIP-normalized
    (CLIPProcessor protocol: bicubic shortest-edge resize, center crop,
    mean/std normalize).

    The torch path hands frames to ``CLIPProcessor`` which first
    quantizes to uint8 (PIL) — mirror that here so both scorers see the
    same input domain. The residual difference vs PIL is the resampler
    (jax.image "cubic" vs PIL bicubic, ~1e-3 on embeddings); thresholds
    tuned on the reference to finer precision than that should run
    ``--clip-gate-scorer torch`` (bit-compatible) or be recalibrated
    with sweep/diagnostics.py::clip_gate_calibration."""
    t, h, w, _ = frames.shape
    scale = image_size / min(h, w)
    nh, nw = max(image_size, int(round(h * scale))), \
        max(image_size, int(round(w * scale)))
    x = jnp.asarray(frames, jnp.float32)
    x = jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0
    x = jax.image.resize(x, (t, nh, nw, 3), "cubic")
    y0, x0 = (nh - image_size) // 2, (nw - image_size) // 2
    x = x[:, y0:y0 + image_size, x0:x0 + image_size]
    x = jnp.clip(x, 0.0, 1.0)
    mean = jnp.asarray(CLIP_IMAGE_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_IMAGE_STD, jnp.float32)
    return (x - mean) / std


def make_jax_clip_scorer(
    clip_params: Dict[str, Any],
    vcfg: CLIPVisionConfig,
    tcfg: CLIPTextConfig,
    tokenize: Callable[[str], np.ndarray],
) -> Callable:
    """-> tta.clip_gate ScorerFn: (frames [k,H,W,3] in [0,1], caption)
    -> [k] cosine scores, computed entirely on-device (the torch-free
    replacement for make_hf_clip_scorer)."""

    def score(frames: np.ndarray, caption: str) -> np.ndarray:
        pixels = preprocess_frames(np.asarray(frames), vcfg.image_size)
        img = clip_image_embed(clip_params, vcfg, pixels)
        ids = jnp.asarray(tokenize(caption))[None]
        txt = clip_text_embed(clip_params, tcfg, ids)
        return np.asarray(jnp.einsum("kd,bd->k", img, txt))

    return score


def clip_hash_tokenize(caption: str, max_length: int = 77,
                       vocab_size: int = 49408) -> np.ndarray:
    """Deterministic hash tokenizer for tests / no-tokenizer boxes
    (same fallback pattern as pipeline.HashTokenizer). BOS=vocab-2 at 0,
    EOT=vocab-1 at the end so the pooled-at-argmax convention holds.
    Uses crc32, not built-in hash() — the latter is salted per process,
    which would make gate scores non-reproducible across runs."""
    import zlib

    words = caption.lower().split()[: max_length - 2]
    ids = [vocab_size - 2] + [
        2 + (zlib.crc32(w.encode()) % (vocab_size - 4)) for w in words
    ] + [vocab_size - 1]
    out = np.zeros((max_length,), np.int32)
    out[: len(ids)] = ids
    return out


def pad_or_subsample_frames(frames: np.ndarray, n: int) -> np.ndarray:
    """[T, ...] -> exactly n frames: repeat the last frame when short,
    linspace-subsample when long — the reference's X-CLIP 8-frame
    protocol (common.py _get_xclip_scorer), shared by the torch and jax
    scorer paths so they cannot drift."""
    t = frames.shape[0]
    if t < n:
        return np.concatenate(
            [frames, np.repeat(frames[-1:], n - t, 0)], axis=0)
    if t > n:
        idx = np.linspace(0, t - 1, n).round().astype(int)
        return frames[idx]
    return frames
