"""Flow-match Euler sampling loops, fully jitted.

Replaces ``LongCatVideoPipeline.generate_vc`` / ``generate_t2v``
denoising internals (reference: used via common.py:566-611 and
run_baseline.py:409-421). One ``lax.scan`` over denoise steps; CFG runs
cond/uncond as a size-2B batch through a single DiT call; conditioning
tokens are either concatenated per step (no-cache) or pre-encoded once
into per-block K/V (``use_kv_cache=True`` — exact, see
test_dit.py::test_kv_cache_decode_matches_full_forward).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import DiTConfig, SchedulerConfig
from ..models import scheduler as sched
from ..models.dit import (
    dit_forward,
    dit_forward_with_cache,
    dit_precompute_cond_cache,
)


def _cfg_batch(x, neg_first=False):
    """Stack [uncond; cond] along batch."""
    return jnp.concatenate([x, x], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "dit_cfg", "sched_cfg", "num_gen_latents", "num_steps",
        "use_kv_cache", "attn_impl", "lat_h", "lat_w", "cp_mesh",
    ),
)
def sample_latents(
    dit_params: Dict[str, Any],
    dit_cfg: DiTConfig,
    sched_cfg: SchedulerConfig,
    rng: jax.Array,
    text_emb: jnp.ndarray,        # [B, L, C_text]  (positive prompt)
    text_mask: jnp.ndarray,       # [B, L]
    neg_text_emb: jnp.ndarray,    # [B, L, C_text]  (negative prompt)
    neg_text_mask: jnp.ndarray,
    guidance_scale: float | jnp.ndarray,
    *,
    num_gen_latents: int,
    num_steps: int,
    lat_h: int,
    lat_w: int,
    cond_latents: Optional[jnp.ndarray] = None,  # [B, C, T_cond, H, W]
    adapters=None,
    use_kv_cache: bool = True,
    attn_impl: Optional[str] = None,
    cp_mesh=None,
) -> jnp.ndarray:
    """Returns denoised latents for the generated region
    [B, C, num_gen_latents, lat_h, lat_w] (normalized latent space).

    ``cond_latents=None`` gives the T2V path (generate_t2v); otherwise
    video-continuation (generate_vc) with per-token timesteps
    [0..0, t..t] and ``num_cond_latents`` semantics.
    """
    B = text_emb.shape[0]
    C = dit_cfg.in_channels
    Lg = num_gen_latents
    n_cond = 0 if cond_latents is None else cond_latents.shape[2]

    sigmas = sched.build_sigmas(num_steps, sched_cfg)
    x = jax.random.normal(rng, (B, C, Lg, lat_h, lat_w), jnp.float32)
    x = x * sigmas[0]

    # CFG batch: [uncond; cond]
    emb2 = jnp.concatenate([neg_text_emb, text_emb], axis=0)
    mask2 = jnp.concatenate([neg_text_mask, text_mask], axis=0)
    g = jnp.asarray(guidance_scale, jnp.float32)

    if n_cond > 0:
        cond2 = jnp.concatenate([cond_latents, cond_latents], axis=0)
        if use_kv_cache:
            kv_cache = dit_precompute_cond_cache(
                dit_params, dit_cfg, cond2, emb2, mask2,
                adapters=adapters, attn_impl=attn_impl, cp_mesh=cp_mesh,
            )

    nt_total = n_cond + Lg

    def step(x, sig_pair):
        sigma, sigma_next = sig_pair
        t_val = sched.sigma_to_timestep(sigma, sched_cfg)
        x2 = jnp.concatenate([x, x], axis=0)
        if n_cond == 0:
            v2 = dit_forward(
                dit_params, dit_cfg, x2.astype(jnp.float32),
                jnp.full((2 * B,), t_val), emb2, mask2,
                num_cond_latents=0, adapters=adapters, attn_impl=attn_impl,
                cp_mesh=cp_mesh,
            )
        elif use_kv_cache:
            v2 = dit_forward_with_cache(
                dit_params, dit_cfg, x2.astype(jnp.float32),
                jnp.full((2 * B,), t_val), emb2, mask2, kv_cache,
                num_cond_latents=n_cond, adapters=adapters,
                attn_impl=attn_impl, cp_mesh=cp_mesh,
            )
        else:
            full2 = jnp.concatenate([cond2, x2], axis=2)
            tsteps = jnp.zeros((2 * B, nt_total)).at[:, n_cond:].set(t_val)
            v_all = dit_forward(
                dit_params, dit_cfg, full2.astype(jnp.float32), tsteps,
                emb2, mask2, num_cond_latents=n_cond, adapters=adapters,
                attn_impl=attn_impl, cp_mesh=cp_mesh,
            )
            v2 = v_all[:, :, n_cond:]
        v_u, v_c = v2[:B], v2[B:]
        v = v_u + g * (v_c - v_u)
        x = sched.euler_step(x, v, sigma, sigma_next)
        return x, None

    sig_pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=1)
    x, _ = jax.lax.scan(step, x, sig_pairs)
    return x
