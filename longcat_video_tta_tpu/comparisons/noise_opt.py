"""SAVi-DNO-style diffusion noise optimization, TPU-native.

Competing-method baseline (reference: comparison_methods/savi_dno.py —
SAVi-DNO, arXiv:2511.18255: optimize the initial diffusion noise with
Adam lr 0.01 so the sampled video matches the conditioning signal;
noise-interpolation regularization p=0.9).

TPU-native formulation: the K-step Euler sampler is one differentiable
``lax.scan``, so the whole objective

    z* = argmin_z || sample_K(z | cond, text)[:T_match] - target ||^2
         with z <- p * z* + (1-p) * fresh  between rounds

is a single jitted value_and_grad. The reference had to run DNO on PVDM
because backprop-through-sampler was impractical on the 13.6 B model;
here remat + the flash kernel make it run on the same backbone.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import DiTConfig, SchedulerConfig
from ..models import scheduler as sched
from ..models.dit import dit_forward


@functools.partial(
    jax.jit,
    static_argnames=("dit_cfg", "sched_cfg", "num_steps", "attn_impl"),
)
def sample_from_noise(
    dit_params, dit_cfg: DiTConfig, sched_cfg: SchedulerConfig,
    noise: jnp.ndarray,            # [B, C, Lg, H, W] trainable init noise
    cond_latents: jnp.ndarray,     # [B, C, Lc, H, W]
    text_emb: jnp.ndarray, text_mask,
    *, num_steps: int, attn_impl: Optional[str] = None,
) -> jnp.ndarray:
    """Differentiable K-step Euler sampling (no CFG — DNO optimizes the
    conditional path, DDIM eta=0 analogue)."""
    import dataclasses

    # Backprop-through-sampler stacks every block's saved residuals
    # across ALL K sampler steps: with the presets' dots/dots_attn
    # remat policy (which SAVES qkv/ffn matmul outputs) the K=2 bench
    # geometry alone wants 17.6 GB of HBM (measured OOM on v5e-16GB).
    # Full remat saves only block inputs — the right trade here, where
    # the whole sampler is differentiated, unlike the single-forward
    # TTA train step the dots policies were tuned on.
    dit_cfg = dataclasses.replace(dit_cfg, remat=True,
                                  remat_policy="full")
    B = noise.shape[0]
    n_cond = cond_latents.shape[2]
    nt_total = n_cond + noise.shape[2]
    sigmas = sched.build_sigmas(num_steps, sched_cfg)
    x = noise * sigmas[0]

    def step(x, sig_pair):
        sigma, sigma_next = sig_pair
        t_val = sched.sigma_to_timestep(sigma, sched_cfg)
        full = jnp.concatenate([cond_latents, x], axis=2)
        tsteps = jnp.zeros((B, nt_total)).at[:, n_cond:].set(t_val)
        v = dit_forward(
            dit_params, dit_cfg, full.astype(jnp.float32), tsteps,
            text_emb, text_mask, num_cond_latents=n_cond,
            attn_impl=attn_impl,
        )[:, :, n_cond:]
        return sched.euler_step(x, v, sigma, sigma_next), None

    sig_pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=1)
    x, _ = jax.lax.scan(step, x, sig_pairs)
    return x


def make_dno_step(dit_cfg: DiTConfig, sched_cfg: SchedulerConfig,
                  tx: optax.GradientTransformation,
                  num_steps: int = 4,
                  attn_impl: Optional[str] = None):
    """Jitted DNO step: optimize init noise so the K-step sample of the
    *training region* reconstructs the held-out target latents."""

    @jax.jit
    def step(noise, opt_state, dit_params, cond_latents, target_latents,
             text_emb, text_mask):
        def loss_fn(z):
            gen = sample_from_noise(
                dit_params, dit_cfg, sched_cfg, z, cond_latents,
                text_emb, text_mask, num_steps=num_steps,
                attn_impl=attn_impl,
            )
            return jnp.mean(
                (gen - target_latents.astype(jnp.float32)) ** 2
            )

        loss, grads = jax.value_and_grad(loss_fn)(noise)
        updates, opt_state = tx.update(grads, opt_state, noise)
        noise = optax.apply_updates(noise, updates)
        return noise, opt_state, loss

    return step


def noise_interp(noise: jnp.ndarray, rng: jax.Array,
                 p: float = 0.9) -> jnp.ndarray:
    """SAVi-DNO noise-interpolation regularization (savi_dno.py:1-46):
    z <- p*z + sqrt(1-p^2)*fresh, keeping unit marginal variance."""
    fresh = jax.random.normal(rng, noise.shape, noise.dtype)
    return p * noise + jnp.sqrt(1.0 - p * p) * fresh


def optimize_noise(
    dit_params, dit_cfg: DiTConfig, sched_cfg: SchedulerConfig,
    cond_latents, target_latents, text_emb, text_mask,
    rng: jax.Array,
    *, num_opt_steps: int = 20, sampler_steps: int = 4, lr: float = 0.01,
    interp_p: float = 0.9, interp_every: int = 5,
    attn_impl: Optional[str] = None,
    step_and_tx: Optional[Tuple[Any, optax.GradientTransformation]] = None,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Full DNO loop. Returns (optimized noise, info).

    ``step_and_tx``: optional prebuilt ``(make_dno_step(...), tx)`` pair —
    pass it when looping over many videos so the jitted step (and its
    XLA executable) is shared instead of re-traced per video."""
    if step_and_tx is not None:
        step, tx = step_and_tx
    else:
        tx = optax.adam(lr)
        step = make_dno_step(dit_cfg, sched_cfg, tx, sampler_steps,
                             attn_impl)
    k0, rng = jax.random.split(rng)
    noise = jax.random.normal(k0, target_latents.shape, jnp.float32)
    opt_state = tx.init(noise)
    losses = []
    for i in range(num_opt_steps):
        noise, opt_state, loss = step(noise, opt_state, dit_params,
                                      cond_latents, target_latents,
                                      text_emb, text_mask)
        losses.append(float(loss))
        if interp_p < 1.0 and (i + 1) % interp_every == 0:
            rng, k = jax.random.split(rng)
            noise = noise_interp(noise, k, interp_p)
    return noise, {"losses": losses}
