"""Data augmentation for the TTA conditioning clip.

Behavior-compatible with the reference (common.py:1164-1362): pixel-space
h-flip, fixed/random rotations with zoom-to-fill, temporal speed-up
(stride) / slow-down (frame repeat); latent variants re-encode each
pixel variant through the VAE. Geometry runs host-side in numpy/cv2
(the reference used torchvision), batched before device transfer.
"""

from __future__ import annotations

import math
import random
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..config import AugmentationConfig


def _rotation_scale(deg: float, h: int, w: int) -> float:
    """Zoom factor so a rotated frame still covers the full canvas
    (reference: _rotation_scale)."""
    rad = abs(math.radians(deg))
    return math.cos(rad) + max(h / w, w / h) * math.sin(rad)


def rotate_clip(frames: np.ndarray, deg: float) -> np.ndarray:
    """Rotate [T, H, W, 3] with zoom-to-fill (reference: _rotate_clip)."""
    import cv2

    t, h, w, _ = frames.shape
    scale = _rotation_scale(deg, h, w)
    m = cv2.getRotationMatrix2D((w / 2, h / 2), deg, scale)
    return np.stack([
        cv2.warpAffine(f, m, (w, h), flags=cv2.INTER_LINEAR,
                       borderMode=cv2.BORDER_REFLECT)
        for f in frames
    ])


def speed_clip(frames: np.ndarray, factor: float) -> np.ndarray:
    """factor > 1: stride subsample (speed-up); factor < 1: repeat frames
    (slow-down). Output padded/truncated to the input length
    (reference: speed variants, common.py:1164-1362)."""
    t = frames.shape[0]
    if factor >= 1.0:
        stride = max(1, int(round(factor)))
        out = frames[::stride]
    else:
        rep = max(1, int(round(1.0 / factor)))
        out = np.repeat(frames, rep, axis=0)
    if out.shape[0] < t:
        out = np.concatenate(
            [out, np.repeat(out[-1:], t - out.shape[0], 0)], axis=0)
    return out[:t]


def parse_speed_factors(spec: str) -> List[float]:
    """"2,0.5" -> [2.0, 0.5] (reference: parse_speed_factors)."""
    return [float(x) for x in spec.split(",") if x.strip()]


def build_augmented_pixel_variants(
    frames: np.ndarray,            # [T, H, W, 3] in [0, 1] or [-1, 1]
    cfg: AugmentationConfig,
    seed: int = 0,
) -> List[Dict]:
    """Returns [{"frames", "name"}...] — original first
    (reference: build_augmented_pixel_variants)."""
    variants = [{"frames": frames, "name": "orig"}]
    if not cfg.enabled:
        return variants
    if cfg.hflip:
        variants.append({"frames": frames[:, :, ::-1].copy(), "name": "hflip"})
    for deg in cfg.rotate_degrees:
        variants.append({"frames": rotate_clip(frames, deg),
                         "name": f"rot{deg:+g}"})
    if cfg.random_rotate and cfg.num_random_rotations > 0:
        rng = random.Random(seed)
        for i in range(cfg.num_random_rotations):
            deg = rng.uniform(-cfg.random_rotate_max_deg,
                              cfg.random_rotate_max_deg)
            variants.append({"frames": rotate_clip(frames, deg),
                             "name": f"randrot{i}_{deg:+.1f}"})
    for f in cfg.speed_factors:
        variants.append({"frames": speed_clip(frames, f),
                         "name": f"speed{f:g}"})
    return variants


def build_augmented_latent_variants(
    bundle,
    frames: np.ndarray,            # [T, H, W, 3] in [0, 1]
    cfg: AugmentationConfig,
    num_context_latents: int,
    holdout_fraction: float,
    seed: int = 0,
) -> List[Dict]:
    """Encode each pixel variant through the VAE and split; returns
    [{"cond", "train", "val", "name"}...]
    (reference: build_augmented_latent_variants)."""
    import jax.numpy as jnp

    from ..tta.split import split_tta_latents

    out = []
    for v in build_augmented_pixel_variants(frames, cfg, seed):
        px = v["frames"].astype(np.float32)
        x = jnp.asarray(px.transpose(3, 0, 1, 2)[None] * 2.0 - 1.0)
        lat = bundle.encode_video(x)
        cond, train, val = split_tta_latents(
            lat, num_context_latents, holdout_fraction)
        out.append({"cond": cond, "train": train, "val": val,
                    "name": v["name"]})
    return out
