"""Flow-match Euler discrete scheduler as pure functions.

TPU-native replacement for the reference's stateful
``FlowMatchEulerDiscreteScheduler`` (loaded at common.py:68-70; stepped
inside ``LongCatVideoPipeline.generate_vc``). Everything here is a pure
jnp function so the whole sampling loop stays inside one ``lax.scan``.

Rectified-flow convention (reference: common.py:274-343):
    x_sigma = (1 - sigma) * x0 + sigma * noise
    velocity target v = noise - x0
    Euler step: x_{sigma'} = x_sigma + (sigma' - sigma) * v
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SchedulerConfig


def timestep_shift(sigmas: jnp.ndarray, shift: float) -> jnp.ndarray:
    """Resolution-dependent timestep shift: sigma' = s*sigma / (1+(s-1)*sigma).

    Identity when shift == 1. Pushes sampling toward high-noise timesteps,
    as used by SD3/WAN-family flow-matching schedulers.
    """
    return shift * sigmas / (1.0 + (shift - 1.0) * sigmas)


def build_sigmas(num_inference_steps: int, cfg: SchedulerConfig) -> jnp.ndarray:
    """Return the (num_steps + 1,) sigma schedule from sigma_max down to 0.

    sigmas[i] is the noise level *entering* step i; the final entry is 0
    so that ``x + (sigmas[i+1]-sigmas[i]) * v`` lands on the clean sample.
    """
    sigmas = jnp.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
    sigmas = timestep_shift(sigmas, cfg.shift)
    sigmas = sigmas * (cfg.sigma_max)  # scale into [0, sigma_max]
    return jnp.concatenate([sigmas, jnp.zeros((1,), sigmas.dtype)])


def sigma_to_timestep(sigma: jnp.ndarray, cfg: SchedulerConfig) -> jnp.ndarray:
    """Map sigma in [0,1] to the model's timestep input (sigma * 1000)."""
    return sigma * cfg.num_train_timesteps


def add_noise(x0: jnp.ndarray, noise: jnp.ndarray, sigma) -> jnp.ndarray:
    """Forward noising x_sigma = (1 - sigma) * x0 + sigma * noise.

    ``sigma`` may be scalar or broadcastable (e.g. [B,1,1,1,1])."""
    sigma = jnp.asarray(sigma, x0.dtype)
    return (1.0 - sigma) * x0 + sigma * noise


def velocity_target(x0: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """Rectified-flow velocity target v = noise - x0."""
    return noise - x0


def euler_step(x: jnp.ndarray, v: jnp.ndarray, sigma, sigma_next) -> jnp.ndarray:
    """One Euler step along the probability-flow ODE dx/dsigma = v."""
    dt = jnp.asarray(sigma_next - sigma, x.dtype)
    return x + dt * v
