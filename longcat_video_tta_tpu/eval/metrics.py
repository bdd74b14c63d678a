"""Per-frame generation quality metrics: PSNR / SSIM / LPIPS.

Behavior-compatible with the reference (common.py:618-776):
- PSNR per frame, mean over frames, clamped at 50 dB
- SSIM 11x11 gaussian window (the reference uses torchmetrics or a
  hand-rolled fallback, common.py:632-645)
- LPIPS via the JAX AlexNet tower in eval/lpips.py (build a hook with
  ``make_lpips_feature_fn(load_lpips_params(path))``); without weights
  we return NaN exactly like the reference's missing-lpips fallback
  (common.py:659-660).

All metric math is jitted jax; inputs are [T, H, W, 3] float in [0, 1].
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def psnr_per_frame(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """[T, H, W, 3] x2 -> [T] PSNR (50 dB clamp)."""
    mse = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
    psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))
    return jnp.minimum(psnr, 50.0)


def compute_psnr(pred, target) -> float:
    return float(jnp.mean(psnr_per_frame(jnp.asarray(pred), jnp.asarray(target))))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


@jax.jit
def ssim_per_frame(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Standard SSIM, 11x11 gaussian window, per frame -> [T]."""
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    win = _gaussian_kernel()[:, :, None, None]  # [11,11,1,1]

    def filt(x):
        # x: [T, H, W, 3] -> depthwise gaussian blur
        T, H, W, C = x.shape
        xr = x.transpose(0, 3, 1, 2).reshape(T * C, 1, H, W)
        y = jax.lax.conv_general_dilated(
            xr, win.transpose(2, 3, 0, 1), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        Ho, Wo = y.shape[2], y.shape[3]
        return y.reshape(T, C, Ho, Wo).transpose(0, 2, 3, 1)

    mu_p, mu_t = filt(pred), filt(target)
    mu_pp, mu_tt, mu_pt = mu_p * mu_p, mu_t * mu_t, mu_p * mu_t
    sig_p = filt(pred * pred) - mu_pp
    sig_t = filt(target * target) - mu_tt
    sig_pt = filt(pred * target) - mu_pt
    ssim_map = ((2 * mu_pt + C1) * (2 * sig_pt + C2)) / (
        (mu_pp + mu_tt + C1) * (sig_p + sig_t + C2)
    )
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def compute_ssim(pred, target) -> float:
    return float(jnp.mean(ssim_per_frame(jnp.asarray(pred, jnp.float32),
                                         jnp.asarray(target, jnp.float32))))


def compute_lpips(
    pred, target,
    feature_fn: Optional[Callable] = None,
) -> float:
    """LPIPS mean over frames; NaN without a pretrained feature model
    (reference fallback: common.py:659-660)."""
    if feature_fn is None:
        return float("nan")
    d = feature_fn(np.asarray(pred), np.asarray(target))
    return float(np.mean(d))


def evaluate_generation_metrics(
    generated: np.ndarray,      # [N, H, W, 3] in [0, 1]
    ground_truth: np.ndarray,   # [N', H, W, 3] in [0, 1]
    lpips_feature_fn: Optional[Callable] = None,
) -> Dict[str, float]:
    """Frame-aligned PSNR/SSIM/LPIPS vs GT (reference: common.py:618-776;
    GT decoded from the source video starting at the anchor frame)."""
    n = min(len(generated), len(ground_truth))
    gen = jnp.asarray(generated[:n], jnp.float32)
    gt = jnp.asarray(ground_truth[:n], jnp.float32)
    return {
        "psnr": float(jnp.mean(psnr_per_frame(gen, gt))),
        "ssim": float(jnp.mean(ssim_per_frame(gen, gt))),
        "lpips": compute_lpips(gen, gt, lpips_feature_fn),
        "num_frames_scored": int(n),
    }
