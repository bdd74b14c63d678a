"""Shape bucketing for the per-video TTA loop.

SURVEY.md §7 hard-part 3: the reference varies the frame window freely
(cond 2/7/14/24 x gen 16/28/44/72 sweeps, speed-factor augmentation),
which is free under eager torch but forces one XLA compile per geometry.
Buckets make the compiled surface finite: target latents are padded up
to the next bucket length and a *traced* valid count masks the padding
out of attention (models/dit.py ``num_valid_latents``) and out of the
MSE (tta/losses.py ``num_valid_target``), so the loss and gradients over
the valid region are exactly independent of pad contents and one compile
serves every geometry in the bucket (asserted by
tests/test_bucket.py::test_one_compile_per_bucket).

The ladder covers the reference sweep matrix: gen horizons 16/28/44/72
frames are 4/7/11/18 latents -> buckets 4/8/12/20; speed-up augmentation
(stride 2) halves T; slow-down doubles it.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

# latent-frame bucket ladder (target side)
DEFAULT_BUCKETS: Tuple[int, ...] = (1, 2, 4, 6, 8, 12, 16, 20, 26, 32)


def bucket_len(t: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    """Smallest bucket >= t (exact t if it exceeds the ladder)."""
    for b in buckets:
        if b >= t:
            return b
    return t


def pad_target_latents(
    latents: jnp.ndarray,  # [B, C, T, H, W]
    buckets: Sequence[int] = DEFAULT_BUCKETS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pad the latent T axis up to its bucket.

    Returns (padded [B, C, T_bucket, H, W], valid int32 scalar = T).
    Pad content is zeros — masked everywhere downstream, any value works.
    """
    t = latents.shape[2]
    tb = bucket_len(t, buckets)
    if tb > t:
        latents = jnp.pad(
            latents, ((0, 0), (0, 0), (0, tb - t), (0, 0), (0, 0)))
    return latents, jnp.int32(t)
