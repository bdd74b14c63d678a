"""Shape bucketing (SURVEY.md §7 hard-part 3): padded geometries share
one compile, and valid-region math is exactly independent of padding."""

import jax
import jax.numpy as jnp
import numpy as np

from longcat_video_tta_tpu.config import AdapterConfig, OptimConfig, longcat_tiny
from longcat_video_tta_tpu.models.dit import dit_forward, init_dit
from longcat_video_tta_tpu.tta import (
    build_optimizer,
    build_scheme,
    flow_matching_loss_conditioned,
)
from longcat_video_tta_tpu.tta.bucket import (
    DEFAULT_BUCKETS,
    bucket_len,
    pad_target_latents,
)
from longcat_video_tta_tpu.tta.engine import make_train_step

CFG = longcat_tiny().dit


def _inputs(t_lat, seed=0):
    B, C = 1, CFG.in_channels
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    lat = jax.random.normal(k1, (B, C, t_lat, 8, 12))
    text = jax.random.normal(k2, (B, CFG.text_len, CFG.text_dim))
    mask = jnp.ones((B, CFG.text_len), jnp.int32)
    return lat, text, mask


def test_bucket_len_ladder():
    assert bucket_len(3) == 4 and bucket_len(4) == 4 and bucket_len(5) == 6
    assert bucket_len(99) == 99  # beyond the ladder: exact
    lat, _, _ = _inputs(5)
    padded, valid = pad_target_latents(lat)
    assert padded.shape[2] == 6 and int(valid) == 5
    np.testing.assert_array_equal(np.asarray(padded[:, :, 5:]), 0.0)


def test_forward_valid_region_independent_of_padding():
    """dit_forward on [cond | target | pad] with num_valid_latents must
    equal the unpadded forward on the valid slice — for ANY pad content
    (pad keys are masked out of every attention)."""
    params = init_dit(jax.random.PRNGKey(0), CFG, zero_init=False)
    lat, text, mask = _inputs(6)
    t_cond = 2
    B = lat.shape[0]
    nt = 6 // CFG.patch_size[0]
    ts = jnp.concatenate(
        [jnp.zeros((B, 2)), jnp.full((B, nt - 2), 500.0)], axis=1)

    ref = dit_forward(params, CFG, lat, ts, text, mask,
                      num_cond_latents=t_cond)

    for fill in (0.0, 37.5):
        pad = jnp.full((B, lat.shape[1], 2, 8, 12), fill, lat.dtype)
        lat_p = jnp.concatenate([lat, pad], axis=2)
        ts_p = jnp.concatenate([ts, jnp.full((B, 2), 500.0)], axis=1)
        out = dit_forward(params, CFG, lat_p, ts_p, text, mask,
                          num_cond_latents=t_cond,
                          num_valid_latents=jnp.int32(6))
        np.testing.assert_allclose(np.asarray(out[:, :, :6]),
                                   np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_conditioned_loss_independent_of_pad_content():
    params = init_dit(jax.random.PRNGKey(0), CFG, zero_init=False)
    lat, text, mask = _inputs(6, seed=1)
    cond, tgt = lat[:, :, :2], lat[:, :, 2:]
    rng = jax.random.PRNGKey(7)

    losses = []
    for fill in (0.0, -11.0):
        pad = jnp.full(tgt.shape[:2] + (2,) + tgt.shape[3:], fill, tgt.dtype)
        tgt_p = jnp.concatenate([tgt, pad], axis=2)
        losses.append(float(flow_matching_loss_conditioned(
            params, CFG, cond, tgt_p, text, mask, rng,
            num_valid_target=jnp.int32(4))))
    assert losses[0] == losses[1]
    assert np.isfinite(losses[0])


def test_one_compile_per_bucket():
    """Two different target geometries padded into the same bucket must
    reuse ONE compiled train step (the whole point of bucketing)."""
    params = init_dit(jax.random.PRNGKey(0), CFG, zero_init=True)
    scheme = build_scheme(CFG, AdapterConfig(method="delta_a"))
    tx = build_optimizer(OptimConfig(lr=1e-2, optimizer="adamw"))
    step = make_train_step(scheme, CFG, tx)
    tp = scheme.init(jax.random.PRNGKey(1), base_params=params)
    opt_state = tx.init(tp)

    _, text, mask = _inputs(4)
    cond = jax.random.normal(jax.random.PRNGKey(2),
                             (1, CFG.in_channels, 2, 8, 12))
    for t_tgt in (3, 4):  # both bucket to 4
        tgt = jax.random.normal(jax.random.PRNGKey(3),
                                (1, CFG.in_channels, t_tgt, 8, 12))
        tgt_p, valid = pad_target_latents(tgt, DEFAULT_BUCKETS)
        assert tgt_p.shape[2] == 4
        tp2, os2, loss = step(tp, opt_state, params, cond, tgt_p, text,
                              mask, jax.random.PRNGKey(4),
                              num_valid_target=valid)
        assert np.isfinite(float(loss))
    assert step._cache_size() == 1


def test_cached_decode_valid_region_independent_of_padding():
    """Gen-horizon bucketing in the KV-cache decode path: the bucketed
    forward's valid region equals the exact-shape forward — for ANY pad
    content (fresh pad keys are masked; the cond cache is always
    valid)."""
    from longcat_video_tta_tpu.models.dit import (
        dit_forward_with_cache,
        dit_precompute_cond_cache,
    )

    params = init_dit(jax.random.PRNGKey(0), CFG, zero_init=False)
    B, C = 1, CFG.in_channels
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, C, 2, 8, 12))
    text = jax.random.normal(jax.random.PRNGKey(2),
                             (B, CFG.text_len, CFG.text_dim))
    mask = jnp.ones((B, CFG.text_len), jnp.int32)
    cache = dit_precompute_cond_cache(params, CFG, cond, text, mask)

    noise = jax.random.normal(jax.random.PRNGKey(3), (B, C, 3, 8, 12))
    ts = jnp.full((B,), 500.0)
    ref = dit_forward_with_cache(params, CFG, noise, ts, text, mask, cache,
                                 num_cond_latents=2)
    for fill in (0.0, 21.5):
        pad = jnp.full((B, C, 1, 8, 12), fill)
        out = dit_forward_with_cache(
            params, CFG, jnp.concatenate([noise, pad], axis=2), ts, text,
            mask, cache, num_cond_latents=2,
            num_valid_latents=jnp.int32(3))
        np.testing.assert_allclose(np.asarray(out[:, :, :3]),
                                   np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_generate_vc_bucket_gen_one_compile():
    """Two gen horizons in the same bucket share ONE sampler compile
    (exp4 gen-horizon sweeps through the tunnel)."""
    from longcat_video_tta_tpu.config import longcat_tiny
    from longcat_video_tta_tpu.pipeline.pipeline import (
        ModelBundle, generate_vc,
    )
    from longcat_video_tta_tpu.pipeline.sampler import sample_latents

    bundle = ModelBundle.init_random(longcat_tiny(), seed=0)
    cond = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 5, 16, 32),
                              minval=-1.0, maxval=1.0)
    before = sample_latents._cache_size()
    outs = {}
    for nf in (9, 13):  # 3 and 4 gen latents -> both bucket to 4
        outs[nf] = generate_vc(bundle, cond, "p", num_frames=nf,
                               num_inference_steps=2, seed=0,
                               attn_impl="xla", bucket_gen=True)
        assert outs[nf].shape[0] == nf
        assert np.all(np.isfinite(outs[nf]))
    assert sample_latents._cache_size() - before == 1
