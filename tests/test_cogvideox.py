"""CogVideoX backbone: forward shapes, I2V conditioning, adapter
identities, training, converter structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longcat_video_tta_tpu.config import AdapterConfig, CogVideoXConfig, \
    OptimConfig
from longcat_video_tta_tpu.models.cogvideox import (
    cogvideox_forward,
    count_params,
    init_cogvideox,
)
from longcat_video_tta_tpu.tta.adapters import build_scheme
from longcat_video_tta_tpu.tta.losses import (
    cogvideox_flow_matching_loss_conditioned,
    cogvideox_flow_matching_loss_conditioned_fixed,
)

CFG = CogVideoXConfig(hidden_size=64, depth=2, num_heads=4, in_channels=8,
                      latent_channels=4, out_channels=4, text_dim=16,
                      text_len=6, time_embed_dim=32, rope_dims=(4, 6, 6),
                      param_dtype="float32", compute_dtype="float32")


@pytest.fixture(scope="module")
def setup():
    params = init_cogvideox(jax.random.PRNGKey(0), CFG, zero_init=False)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 3, 8, 12))
    txt = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 16))
    return params, lat, txt


def test_forward_shapes_and_i2v_conditioning(setup):
    params, lat, txt = setup
    ts = jnp.array([500.0])
    out = cogvideox_forward(params, CFG, lat, ts, txt)
    assert out.shape == lat.shape and out.dtype == jnp.float32
    img = jnp.zeros_like(lat).at[:, :, 0].set(1.0)
    out2 = cogvideox_forward(params, CFG, lat, ts, txt, image_latents=img)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


@pytest.mark.parametrize("acfg", [
    AdapterConfig(method="delta_a"),
    AdapterConfig(method="lora", lora_rank=2, target_blocks="all"),
    AdapterConfig(method="lora", lora_rank=2, target_blocks="last_1",
                  lora_target_ffn=True),
    AdapterConfig(method="full"),
], ids=lambda a: f"{a.method}-{a.target_blocks}")
def test_scheme_zero_init_identity_and_trains(acfg, setup):
    params, lat, txt = setup
    cond, tgt = lat[:, :, :1], lat[:, :, 1:]
    scheme = build_scheme(CFG, acfg)
    assert scheme.cfg.adaln_tembed_dim == 32  # delta site = time_embed_dim
    tp = scheme.init(jax.random.PRNGKey(5), base_params=params)
    dp, ad = scheme.to_forward(tp, params)

    rng = jax.random.PRNGKey(11)
    base = float(cogvideox_flow_matching_loss_conditioned(
        params, CFG, cond, tgt, txt, None, rng))
    init = float(cogvideox_flow_matching_loss_conditioned(
        dp, CFG, cond, tgt, txt, None, rng, adapters=ad))
    np.testing.assert_allclose(init, base, rtol=1e-5)

    from longcat_video_tta_tpu.tta.engine import build_optimizer, \
        make_train_step

    tx = build_optimizer(OptimConfig(lr=1e-2, optimizer="adamw"))
    step = make_train_step(scheme, CFG, tx,
                           loss_fn=cogvideox_flow_matching_loss_conditioned)
    opt_state = tx.init(tp)
    rngs = [jax.random.PRNGKey(100 + i) for i in range(3)]

    def cycle(tp):
        dp, ad = scheme.to_forward(tp, params)
        return float(np.mean([float(cogvideox_flow_matching_loss_conditioned(
            dp, CFG, cond, tgt, txt, None, r, adapters=ad)) for r in rngs]))

    before = cycle(tp)
    for i in range(9):
        tp, opt_state, loss = step(tp, opt_state, params, cond, tgt, txt,
                                   None, rngs[i % 3])
        assert np.isfinite(float(loss))
    assert cycle(tp) < before


def test_method_not_ported_raises():
    with pytest.raises(ValueError, match="not ported"):
        build_scheme(CFG, AdapterConfig(method="norm_tune"))


def test_fixed_anchor_deterministic(setup):
    params, lat, txt = setup
    cond, val = lat[:, :, :1], lat[:, :, 2:]
    noises = jax.random.normal(jax.random.PRNGKey(9), (2,) + val.shape)
    a = float(cogvideox_flow_matching_loss_conditioned_fixed(
        params, CFG, cond, val, txt, None, noises, fixed_sigmas=(0.25, 0.5)))
    b = float(cogvideox_flow_matching_loss_conditioned_fixed(
        params, CFG, cond, val, txt, None, noises, fixed_sigmas=(0.25, 0.5)))
    assert a == b and np.isfinite(a)


def test_ddim_sampler_runs():
    from longcat_video_tta_tpu.pipeline.sampler import (
        cogvideox_alphas_cumprod,
        sample_latents_cogvideox,
    )

    ab = cogvideox_alphas_cumprod()
    assert ab.shape == (1000,)
    assert float(ab[-1]) == pytest.approx(0.0, abs=1e-6)  # zero-SNR rescale
    assert float(ab[0]) > 0.99

    params = init_cogvideox(jax.random.PRNGKey(0), CFG, zero_init=True)
    txt = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 16))
    cond = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 1, 8, 12))
    out = sample_latents_cogvideox(
        params, CFG, jax.random.PRNGKey(4), txt,
        num_gen_latents=2, num_steps=3, lat_h=8, lat_w=12,
        cond_latents=cond)
    assert out.shape == (1, 4, 3, 8, 12)
    assert np.isfinite(np.asarray(out)).all()


def _synthetic_cogvideox_state_dict(cfg: CogVideoXConfig):
    rng = np.random.RandomState(0)
    sd = {}

    def lin(name, din, dout):
        sd[name + ".weight"] = rng.randn(dout, din).astype(np.float32) * 0.02
        sd[name + ".bias"] = rng.randn(dout).astype(np.float32) * 0.02

    D, dh = cfg.hidden_size, cfg.head_dim
    sd["patch_embed.proj.weight"] = rng.randn(
        D, cfg.in_channels, 2, 2).astype(np.float32) * 0.02
    sd["patch_embed.proj.bias"] = rng.randn(D).astype(np.float32) * 0.02
    lin("patch_embed.text_proj", cfg.text_dim, D)
    lin("time_embedding.linear_1", D, cfg.time_embed_dim)
    lin("time_embedding.linear_2", cfg.time_embed_dim, cfg.time_embed_dim)
    for i in range(cfg.depth):
        b = f"transformer_blocks.{i}."
        for n in ("norm1", "norm2"):
            lin(b + n + ".linear", cfg.time_embed_dim, 6 * D)
            sd[b + n + ".norm.weight"] = rng.randn(D).astype(np.float32)
            sd[b + n + ".norm.bias"] = rng.randn(D).astype(np.float32)
        for n in ("to_q", "to_k", "to_v"):
            lin(b + "attn1." + n, D, D)
        lin(b + "attn1.to_out.0", D, D)
        for n in ("norm_q", "norm_k"):
            sd[b + "attn1." + n + ".weight"] = rng.randn(dh).astype(np.float32)
            sd[b + "attn1." + n + ".bias"] = rng.randn(dh).astype(np.float32)
        lin(b + "ff.net.0.proj", D, cfg.ffn_dim)
        lin(b + "ff.net.2", cfg.ffn_dim, D)
    sd["norm_final.weight"] = rng.randn(D).astype(np.float32)
    sd["norm_final.bias"] = rng.randn(D).astype(np.float32)
    lin("norm_out.linear", cfg.time_embed_dim, 2 * D)
    sd["norm_out.norm.weight"] = rng.randn(D).astype(np.float32)
    sd["norm_out.norm.bias"] = rng.randn(D).astype(np.float32)
    lin("proj_out", D, cfg.out_channels * 4)
    return sd


def test_segmented_sampler_equals_one_dispatch():
    """gen_segment_steps on the CogVideoX path (advisor r2: the flag
    silently did nothing here) — chunked dispatches must be numerically
    identical to the single-scan sampler."""
    from longcat_video_tta_tpu.pipeline.sampler import (
        sample_latents_cogvideox,
        sample_latents_cogvideox_segmented,
    )

    params = init_cogvideox(jax.random.PRNGKey(0), CFG, zero_init=False)
    txt = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 16))
    cond = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 1, 8, 12))
    kw = dict(num_gen_latents=2, num_steps=5, lat_h=8, lat_w=12,
              cond_latents=cond)
    one = sample_latents_cogvideox(params, CFG, jax.random.PRNGKey(4),
                                   txt, **kw)
    seg = sample_latents_cogvideox_segmented(
        params, CFG, jax.random.PRNGKey(4), txt, segment_steps=2, **kw)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(one),
                               rtol=1e-5, atol=1e-6)


def test_convert_torch_cogvideox_state_structure(setup):
    from longcat_video_tta_tpu.models.convert import (
        convert_torch_cogvideox_state,
    )

    params_ref, lat, txt = setup
    sd = _synthetic_cogvideox_state_dict(CFG)
    params = convert_torch_cogvideox_state(sd, CFG)
    ref_map = {jax.tree_util.keystr(p): v.shape
               for p, v in jax.tree_util.tree_flatten_with_path(
                   params_ref)[0]}
    got_map = {jax.tree_util.keystr(p): v.shape
               for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_map == got_map
    out = cogvideox_forward(params, CFG, lat, jnp.array([500.0]), txt,
                            image_latents=jnp.zeros_like(lat))
    assert np.isfinite(np.asarray(out)).all()


def test_convert_cogvideox_learned_pos_embedding(setup):
    """I2V checkpoints carry patch_embed.pos_embedding (advisor r2):
    the converter must consume it and the model must apply it."""
    import dataclasses

    from longcat_video_tta_tpu.models.convert import (
        convert_torch_cogvideox_state,
    )

    _, lat, txt = setup
    pe_len = CFG.text_len + 80  # >= text 6 + video 3*(8/2)*(12/2)=72
    cfg = dataclasses.replace(CFG, learned_pos_embed_len=pe_len)
    sd = _synthetic_cogvideox_state_dict(CFG)
    sd["patch_embed.pos_embedding"] = np.random.RandomState(7).randn(
        1, pe_len, CFG.hidden_size).astype(np.float32) * 0.02
    params = convert_torch_cogvideox_state(sd, cfg)
    assert params["pos_embed"].shape == (pe_len, CFG.hidden_size)
    out = cogvideox_forward(params, cfg, lat, jnp.array([500.0]), txt,
                            image_latents=jnp.zeros_like(lat))
    no_pe = {k: v for k, v in params.items() if k != "pos_embed"}
    out0 = cogvideox_forward(no_pe, cfg, lat, jnp.array([500.0]), txt,
                             image_latents=jnp.zeros_like(lat))
    assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(np.asarray(out), np.asarray(out0))
    # cfg declares a table but the checkpoint lacks one -> loud failure
    with pytest.raises(ValueError, match="pos_embedding"):
        convert_torch_cogvideox_state(
            _synthetic_cogvideox_state_dict(CFG), cfg)


def test_convert_cogvideox_refuses_unconsumed_keys():
    """Unknown checkpoint keys (e.g. ofs_embedding from 1.5 models) must
    fail the conversion, never silently drop parameters."""
    from longcat_video_tta_tpu.models.convert import (
        convert_torch_cogvideox_state,
    )

    sd = _synthetic_cogvideox_state_dict(CFG)
    sd["ofs_embedding.linear_1.weight"] = np.zeros((8, 8), np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_torch_cogvideox_state(sd, CFG)


def test_cogvideox_5b_param_count():
    """Full 5B geometry sanity (42 layers, 48x64 heads)."""
    cfg = CogVideoXConfig()
    D = cfg.hidden_size
    analytic = cfg.depth * (4 * D * D + 2 * D * cfg.ffn_dim
                            + 2 * 6 * D * cfg.time_embed_dim)
    assert 4e9 < analytic < 7e9


def test_pab_every1_exact_and_segment_carry():
    """PAB on the CogVideoX joint-attention sampler: every=1 must
    reproduce the plain sampler exactly; every=2 stays finite and the
    segmented dispatch carries the cache (== one-dispatch PAB)."""
    from longcat_video_tta_tpu.config import PABConfig
    from longcat_video_tta_tpu.pipeline.sampler import (
        sample_latents_cogvideox,
        sample_latents_cogvideox_segmented,
    )

    params = init_cogvideox(jax.random.PRNGKey(0), CFG, zero_init=False)
    txt = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 16))
    cond = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 1, 8, 12))
    kw = dict(num_gen_latents=2, num_steps=6, lat_h=8, lat_w=12,
              cond_latents=cond)
    base = np.asarray(sample_latents_cogvideox(
        params, CFG, jax.random.PRNGKey(4), txt, **kw))
    pab1 = np.asarray(sample_latents_cogvideox(
        params, CFG, jax.random.PRNGKey(4), txt,
        pab_cfg=PABConfig(every=1), **kw))
    np.testing.assert_allclose(pab1, base, rtol=1e-5, atol=1e-6)
    cfg2 = PABConfig(every=2, start_frac=0.2, end_frac=0.9)
    pab2 = np.asarray(sample_latents_cogvideox(
        params, CFG, jax.random.PRNGKey(4), txt, pab_cfg=cfg2, **kw))
    assert np.isfinite(pab2).all() and not np.allclose(pab2, base)
    seg = np.asarray(sample_latents_cogvideox_segmented(
        params, CFG, jax.random.PRNGKey(4), txt, segment_steps=2,
        pab_cfg=cfg2, **kw))
    np.testing.assert_allclose(seg, pab2, rtol=1e-5, atol=1e-6)


def test_cfg_reuse_every1_exact_pab_compose_segment_carry():
    """CFG guidance-delta reuse on the CogVideoX sampler: every=1 must
    reproduce the plain sampler exactly (the unified-carry refactor is
    a no-op there); every=2 approximates (finite, not equal); composes
    with PAB; segmented dispatch carries the delta."""
    from longcat_video_tta_tpu.config import CFGReuseConfig, PABConfig
    from longcat_video_tta_tpu.pipeline.sampler import (
        sample_latents_cogvideox,
        sample_latents_cogvideox_segmented,
    )

    params = init_cogvideox(jax.random.PRNGKey(0), CFG, zero_init=False)
    txt = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 16))
    cond = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 1, 8, 12))
    kw = dict(num_gen_latents=2, num_steps=6, lat_h=8, lat_w=12,
              cond_latents=cond)
    base = np.asarray(sample_latents_cogvideox(
        params, CFG, jax.random.PRNGKey(4), txt, **kw))
    r1 = np.asarray(sample_latents_cogvideox(
        params, CFG, jax.random.PRNGKey(4), txt,
        cfgr_cfg=CFGReuseConfig(every=1), **kw))
    np.testing.assert_allclose(r1, base, rtol=1e-5, atol=1e-6)
    cfg2 = CFGReuseConfig(every=2, start_frac=0.2, end_frac=1.0)
    r2 = np.asarray(sample_latents_cogvideox(
        params, CFG, jax.random.PRNGKey(4), txt, cfgr_cfg=cfg2, **kw))
    assert np.isfinite(r2).all() and not np.allclose(r2, base)
    seg = np.asarray(sample_latents_cogvideox_segmented(
        params, CFG, jax.random.PRNGKey(4), txt, segment_steps=2,
        cfgr_cfg=cfg2, **kw))
    np.testing.assert_allclose(seg, r2, rtol=1e-5, atol=1e-6)
    # x PAB: both engaged stays finite; the cond cache third refreshes
    both = np.asarray(sample_latents_cogvideox(
        params, CFG, jax.random.PRNGKey(4), txt, cfgr_cfg=cfg2,
        pab_cfg=PABConfig(every=2, start_frac=0.2, end_frac=0.9), **kw))
    assert np.isfinite(both).all()
