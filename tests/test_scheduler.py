"""Flow-match scheduler invariants."""

import jax.numpy as jnp
import numpy as np

from longcat_video_tta_tpu.config import SchedulerConfig
from longcat_video_tta_tpu.models import scheduler as sched


def test_sigmas_monotone_and_terminal_zero():
    cfg = SchedulerConfig()
    s = sched.build_sigmas(50, cfg)
    assert s.shape == (51,)
    assert float(s[-1]) == 0.0
    assert np.all(np.diff(np.asarray(s)) < 0)
    assert float(s[0]) <= cfg.sigma_max + 1e-6


def test_shift_identity_at_one():
    s = jnp.linspace(0.01, 1.0, 10)
    np.testing.assert_allclose(
        np.asarray(sched.timestep_shift(s, 1.0)), np.asarray(s), atol=1e-7
    )


def test_euler_step_exact_for_constant_velocity():
    """For the true rectified-flow field v = noise - x0 (constant along the
    path), a single Euler step from sigma to 0 recovers x0 exactly."""
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(2, 4, 3), jnp.float32)
    noise = jnp.asarray(rng.randn(2, 4, 3), jnp.float32)
    sigma = 0.7
    xt = sched.add_noise(x0, noise, sigma)
    v = sched.velocity_target(x0, noise)
    x_rec = sched.euler_step(xt, v, sigma, 0.0)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x0), atol=1e-5)


def test_config_roundtrip():
    from longcat_video_tta_tpu.config import RunConfig

    c = RunConfig(output_dir="/tmp/x", seed=7)
    c2 = RunConfig.from_json(c.to_json())
    assert c2 == c
