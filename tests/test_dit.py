"""DiT model: shapes, conditioning semantics, KV-cache exactness,
zero-adapter identity, flagship parameter count."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longcat_video_tta_tpu.config import longcat_13b, longcat_tiny
from longcat_video_tta_tpu.models import dit as dit_mod

CFG = longcat_tiny().dit


@pytest.fixture(scope="module")
def setup():
    rng = jax.random.PRNGKey(0)
    params = dit_mod.init_dit(rng, CFG, zero_init=False)
    B, C, T, H, W = 1, CFG.in_channels, 5, 8, 12
    latents = jax.random.normal(jax.random.PRNGKey(1), (B, C, T, H, W))
    t = jnp.full((B,), 500.0)
    text = jax.random.normal(jax.random.PRNGKey(2), (B, CFG.text_len, CFG.text_dim))
    mask = jnp.ones((B, CFG.text_len), jnp.int32).at[:, 10:].set(0)
    return params, latents, t, text, mask


def test_forward_shape_and_dtype(setup):
    params, latents, t, text, mask = setup
    out = dit_mod.dit_forward(params, CFG, latents, t, text, mask)
    assert out.shape == (1, CFG.out_channels, 5, 8, 12)
    assert out.dtype == jnp.float32


def test_per_frame_timesteps(setup):
    params, latents, t, text, mask = setup
    nt = latents.shape[2] // CFG.patch_size[0]
    t_frames = jnp.zeros((1, nt)).at[:, 2:].set(500.0)
    out = dit_mod.dit_forward(params, CFG, latents, t_frames, text, mask,
                              num_cond_latents=2)
    assert out.shape == (1, CFG.out_channels, 5, 8, 12)


def test_cond_output_independent_of_noise_tokens(setup):
    """With num_cond_latents=k, the velocity on cond frames must not depend
    on the noise-region latents (prefix attention semantics)."""
    params, latents, t, text, mask = setup
    nt = latents.shape[2]
    ncond = 2
    tsteps = jnp.zeros((1, nt)).at[:, ncond:].set(700.0)
    out1 = dit_mod.dit_forward(params, CFG, latents, tsteps, text, mask,
                               num_cond_latents=ncond)
    latents2 = latents.at[:, :, ncond:].add(3.0)
    out2 = dit_mod.dit_forward(params, CFG, latents2, tsteps, text, mask,
                               num_cond_latents=ncond)
    np.testing.assert_allclose(
        np.asarray(out1[:, :, :ncond]), np.asarray(out2[:, :, :ncond]),
        atol=1e-5,
    )
    # noise region must differ (sanity that the model is not degenerate)
    assert float(jnp.max(jnp.abs(out1[:, :, ncond:] - out2[:, :, ncond:]))) > 1e-4


def test_kv_cache_decode_matches_full_forward(setup):
    """Two-phase cached forward == no-cache forward on the noise region.
    This is the exactness property behind generate_vc's use_kv_cache
    (reference: common.py:606-608)."""
    params, latents, t, text, mask = setup
    ncond = 2
    nt = latents.shape[2]
    cond = latents[:, :, :ncond]
    noise = latents[:, :, ncond:]
    tsteps = jnp.zeros((1, nt)).at[:, ncond:].set(640.0)

    full = dit_mod.dit_forward(params, CFG, latents, tsteps, text, mask,
                               num_cond_latents=ncond)

    cache = dit_mod.dit_precompute_cond_cache(params, CFG, cond, text, mask)
    dec = dit_mod.dit_forward_with_cache(
        params, CFG, noise, jnp.full((1,), 640.0), text, mask, cache,
        num_cond_latents=ncond,
    )
    np.testing.assert_allclose(
        np.asarray(full[:, :, ncond:]), np.asarray(dec), atol=2e-4, rtol=1e-3
    )


def test_zero_adapters_are_identity(setup):
    """Zero-initialized adapters of every injection type must reproduce the
    base forward exactly (all reference methods zero-init)."""
    params, latents, t, text, mask = setup
    base = dit_mod.dit_forward(params, CFG, latents, t, text, mask)
    L, D, Ct = CFG.depth, CFG.hidden_size, CFG.adaln_tembed_dim
    r = 2
    adapters = {
        "delta_t": jnp.zeros((Ct,)),
        "delta_t_blocks": jnp.zeros((L, Ct)),
        "delta_h_blocks": jnp.zeros((L, D)),
        "delta_h_final": jnp.zeros((D,)),
        "film_blocks": jnp.zeros((L, 6 * D)),
        "delta_out": jnp.zeros((CFG.out_channels,)),
        "lora": {
            "qkv": {
                "a": jax.random.normal(jax.random.PRNGKey(5), (L, D, r)) * 0.1,
                "b": jnp.zeros((L, r, 3 * D)),
            },
        },
        "lora_scale": 0.5,
    }
    out = dit_mod.dit_forward(params, CFG, latents, t, text, mask,
                              adapters=adapters)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)


def test_nonzero_adapters_change_output(setup):
    params, latents, t, text, mask = setup
    base = dit_mod.dit_forward(params, CFG, latents, t, text, mask)
    adapters = {"delta_t": jnp.full((CFG.adaln_tembed_dim,), 0.1)}
    out = dit_mod.dit_forward(params, CFG, latents, t, text, mask,
                              adapters=adapters)
    assert float(jnp.max(jnp.abs(out - base))) > 1e-5


def test_adapter_gradients_flow(setup):
    params, latents, t, text, mask = setup

    def loss(delta):
        out = dit_mod.dit_forward(params, CFG, latents, t, text, mask,
                                  adapters={"delta_t": delta})
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(jnp.zeros((CFG.adaln_tembed_dim,)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_flagship_param_count_matches_reference():
    """SURVEY.md §2.8 / series01_full_lr.yaml:10 — the DiT is ~13.6 B
    params. Verify geometry without materializing weights."""
    cfg = longcat_13b().dit
    shapes = jax.eval_shape(lambda k: dit_mod.init_dit(k, cfg),
                            jax.random.PRNGKey(0))
    n = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))
    assert 13.0e9 < n < 14.2e9, f"param count {n/1e9:.2f}B outside 13-14.2B"


def test_remat_policy_dots_matches_full(setup):
    """remat_policy='dots' must be numerically identical to 'full' in
    both the forward value and adapter gradients (it only changes which
    residuals the bwd recomputes)."""
    import dataclasses

    params, latents, t, text, mask = setup
    cfg_dots = dataclasses.replace(CFG, remat_policy="dots")

    def loss(delta, cfg):
        out = dit_mod.dit_forward(params, cfg, latents, t, text, mask,
                                  adapters={"delta_t": delta})
        return jnp.mean(out ** 2)

    d0 = jnp.zeros((CFG.adaln_tembed_dim,))
    v_full, g_full = jax.value_and_grad(loss)(d0, CFG)
    v_dots, g_dots = jax.value_and_grad(loss)(d0, cfg_dots)
    np.testing.assert_allclose(float(v_full), float(v_dots), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_dots),
                               rtol=1e-4, atol=1e-6)
