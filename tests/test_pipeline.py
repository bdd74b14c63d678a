"""Sampler + pipeline: shapes, KV-cache equivalence, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longcat_video_tta_tpu.config import longcat_tiny
from longcat_video_tta_tpu.pipeline import (
    ModelBundle,
    generate_t2v,
    generate_vc,
    round_frames_4k1,
    sample_latents,
)

CFG = longcat_tiny()


@pytest.fixture(scope="module")
def bundle():
    return ModelBundle.init_random(CFG, seed=0)


def test_round_frames():
    assert round_frames_4k1(93) == 93
    assert round_frames_4k1(28) == 29
    assert round_frames_4k1(1) == 1
    assert round_frames_4k1(2) == 5


def test_generate_t2v_shape(bundle):
    out = generate_t2v(bundle, "a cat", num_frames=5, height=16, width=32,
                       num_inference_steps=2, seed=0)
    assert out.shape == (5, 16, 32, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_generate_vc_shape(bundle):
    cond = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 5, 16, 32),
                              minval=-1.0, maxval=1.0)
    out = generate_vc(bundle, cond, "a dog", num_frames=5,
                      num_inference_steps=2, seed=0)
    assert out.shape == (5, 16, 32, 3)


def test_kv_cache_equals_no_cache(bundle):
    """use_kv_cache must be a pure optimization: identical latents either
    way (the reference asserts this implicitly by flipping offload flags —
    common.py:606-608)."""
    cond = bundle.encode_video(
        jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 5, 16, 32),
                           minval=-1.0, maxval=1.0))
    emb, mask = bundle.encode_prompt("hello world")
    nemb, nmask = bundle.encode_prompt("")
    common = dict(
        num_gen_latents=2, num_steps=3, lat_h=2, lat_w=4,
        cond_latents=cond,
    )
    a = sample_latents(bundle.dit_params, CFG.dit, CFG.scheduler,
                       jax.random.PRNGKey(0), emb, mask, nemb, nmask, 4.0,
                       use_kv_cache=True, **common)
    b = sample_latents(bundle.dit_params, CFG.dit, CFG.scheduler,
                       jax.random.PRNGKey(0), emb, mask, nemb, nmask, 4.0,
                       use_kv_cache=False, **common)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                               rtol=1e-2)


def test_determinism_and_seed_sensitivity(bundle):
    cond = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 5, 16, 32),
                              minval=-1.0, maxval=1.0)
    o1 = generate_vc(bundle, cond, "x", num_frames=5, num_inference_steps=2,
                     seed=7)
    o2 = generate_vc(bundle, cond, "x", num_frames=5, num_inference_steps=2,
                     seed=7)
    o3 = generate_vc(bundle, cond, "x", num_frames=5, num_inference_steps=2,
                     seed=8)
    np.testing.assert_allclose(o1, o2, atol=0)
    assert np.max(np.abs(o1 - o3)) > 1e-5


def test_adapters_affect_generation(bundle):
    """Adapters must flow through sampling (the reference needs hooks for
    this — here it's the same forward, run_delta_a.py:117-126 parity)."""
    cond = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 5, 16, 32),
                              minval=-1.0, maxval=1.0)
    o1 = generate_vc(bundle, cond, "x", num_frames=5, num_inference_steps=2,
                     seed=0)
    adapters = {"delta_t": jnp.full((CFG.dit.adaln_tembed_dim,), 0.3)}
    o2 = generate_vc(bundle, cond, "x", num_frames=5, num_inference_steps=2,
                     seed=0, adapters=adapters)
    assert np.max(np.abs(o1 - o2)) > 1e-6
