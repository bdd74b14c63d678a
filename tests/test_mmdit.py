"""Open-Sora v2 MMDiT backbone: forward shapes, adapter identities,
training, converter structure, and the RoPE-permutation equivalence the
weight converter relies on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longcat_video_tta_tpu.config import (
    AdapterConfig,
    CLIPTextConfig,
    MMDiTConfig,
    OptimConfig,
)
from longcat_video_tta_tpu.models.mmdit import (
    count_params,
    init_mmdit,
    mmdit_forward,
    pack_latents,
    unpack_tokens,
)
from longcat_video_tta_tpu.tta.adapters import build_scheme
from longcat_video_tta_tpu.tta.losses import (
    mmdit_flow_matching_loss_conditioned,
    mmdit_flow_matching_loss_conditioned_fixed,
)

CFG = MMDiTConfig(hidden_size=64, num_heads=4, depth_double=2,
                  depth_single=2, mlp_ratio=2.0, in_channels=4,
                  patch_size=2, vec_in_dim=8, context_in_dim=16,
                  axes_dims=(4, 6, 6),
                  param_dtype="float32", compute_dtype="float32")


@pytest.fixture(scope="module")
def setup():
    params = init_mmdit(jax.random.PRNGKey(0), CFG, zero_init=False)
    B = 1
    lat = jax.random.normal(jax.random.PRNGKey(1), (B, 4, 3, 8, 12))
    txt = jax.random.normal(jax.random.PRNGKey(2), (B, 10, 16))
    yv = jax.random.normal(jax.random.PRNGKey(3), (B, 8))
    return params, lat, txt, yv


def test_pack_unpack_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 3, 8, 12))
    tok = pack_latents(x, 2)
    assert tok.shape == (2, 3 * 4 * 6, 16)
    np.testing.assert_array_equal(np.asarray(unpack_tokens(tok, 3, 8, 12, 2)),
                                  np.asarray(x))


def test_forward_shapes_t2v_and_cond(setup):
    params, lat, txt, yv = setup
    sig = jnp.array([0.5])
    out = mmdit_forward(params, CFG, lat, sig, txt, yv)
    assert out.shape == lat.shape and out.dtype == jnp.float32
    cond = jax.random.normal(jax.random.PRNGKey(4), (1, 5, 3, 8, 12))
    out2 = mmdit_forward(params, CFG, lat, sig, txt, yv, cond=cond)
    assert out2.shape == lat.shape
    assert not np.allclose(np.asarray(out), np.asarray(out2))


@pytest.mark.parametrize("acfg", [
    AdapterConfig(method="delta_a"),
    AdapterConfig(method="lora", lora_rank=2, target_blocks="all"),
    AdapterConfig(method="lora", lora_rank=2, target_blocks="double"),
    AdapterConfig(method="lora", lora_rank=2, target_blocks="single",
                  lora_target_ffn=True),
    AdapterConfig(method="full"),
], ids=lambda a: f"{a.method}-{a.target_blocks}")
def test_scheme_zero_init_identity_and_trains(acfg, setup):
    params, lat, txt, yv = setup
    cond, tgt = lat[:, :, :1], lat[:, :, 1:]
    scheme = build_scheme(CFG, acfg)
    tp = scheme.init(jax.random.PRNGKey(5), base_params=params)
    dp, ad = scheme.to_forward(tp, params)

    rng = jax.random.PRNGKey(11)
    base = float(mmdit_flow_matching_loss_conditioned(
        params, CFG, cond, tgt, txt, yv, rng))
    init = float(mmdit_flow_matching_loss_conditioned(
        dp, CFG, cond, tgt, txt, yv, rng, adapters=ad))
    np.testing.assert_allclose(init, base, rtol=1e-5)

    # a few steps on a fixed rng cycle must decrease the cycle loss
    from longcat_video_tta_tpu.tta.engine import build_optimizer, \
        make_train_step

    tx = build_optimizer(OptimConfig(lr=1e-2, optimizer="adamw"))
    step = make_train_step(scheme, CFG, tx,
                           loss_fn=mmdit_flow_matching_loss_conditioned)
    opt_state = tx.init(tp)
    rngs = [jax.random.PRNGKey(100 + i) for i in range(3)]

    def cycle(tp):
        dp, ad = scheme.to_forward(tp, params)
        return float(np.mean([float(mmdit_flow_matching_loss_conditioned(
            dp, CFG, cond, tgt, txt, yv, r, adapters=ad)) for r in rngs]))

    before = cycle(tp)
    for i in range(9):
        tp, opt_state, loss = step(tp, opt_state, params, cond, tgt, txt,
                                   yv, rngs[i % 3])
        assert np.isfinite(float(loss))
    assert cycle(tp) < before


def test_method_not_ported_raises():
    with pytest.raises(ValueError, match="not ported"):
        build_scheme(CFG, AdapterConfig(method="film"))


def test_fixed_anchor_deterministic(setup):
    params, lat, txt, yv = setup
    cond, val = lat[:, :, :1], lat[:, :, 2:]
    noises = jax.random.normal(jax.random.PRNGKey(9), (2,) + val.shape)
    a = float(mmdit_flow_matching_loss_conditioned_fixed(
        params, CFG, cond, val, txt, yv, noises, fixed_sigmas=(0.25, 0.75)))
    b = float(mmdit_flow_matching_loss_conditioned_fixed(
        params, CFG, cond, val, txt, yv, noises, fixed_sigmas=(0.25, 0.75)))
    assert a == b and np.isfinite(a)


def test_segmented_sampler_equals_one_dispatch(setup):
    """gen_segment_steps on the MMDiT path (advisor r2): chunked
    dispatches must equal the single-scan sampler."""
    from longcat_video_tta_tpu.pipeline.sampler import (
        sample_latents_mmdit,
        sample_latents_mmdit_segmented,
    )

    params, lat, txt, yv = setup
    txt3 = jnp.concatenate([txt, txt, txt], axis=0)
    yv3 = jnp.concatenate([yv, yv, yv], axis=0)
    kw = dict(num_gen_latents=2, num_steps=5, lat_h=8, lat_w=12,
              cond_latents=lat[:, :, :1])
    one = sample_latents_mmdit(params, CFG, jax.random.PRNGKey(4), txt3,
                               yv3, **kw)
    seg = sample_latents_mmdit_segmented(
        params, CFG, jax.random.PRNGKey(4), txt3, yv3, segment_steps=2,
        **kw)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(one),
                               rtol=1e-5, atol=1e-6)


def test_rope_half_split_permutation_equals_interleaved():
    """The converter's claim (_rope_perm): half-split rotation on
    P-permuted channels == interleaved-pair rotation on the originals.
    q·k logits must be identical under the common q/k permutation."""
    from longcat_video_tta_tpu.models.convert import _rope_perm
    from longcat_video_tta_tpu.models.mmdit import _apply_rope_flat

    S, dh = 6, 8
    rng = np.random.RandomState(0)
    q = rng.randn(1, S, 1, dh).astype(np.float32)
    k = rng.randn(1, S, 1, dh).astype(np.float32)
    ang = rng.rand(S, dh // 2).astype(np.float32)
    cos, sin = np.cos(ang), np.sin(ang)

    def rope_interleaved(x):
        # Flux pair form: (x0, x1) -> (x0 c - x1 s, x1 c + x0 s) on
        # channel pairs (2i, 2i+1)
        xp = x.reshape(1, S, 1, dh // 2, 2)
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
        out = np.stack([xp[..., 0] * c - xp[..., 1] * s,
                        xp[..., 1] * c + xp[..., 0] * s], axis=-1)
        return out.reshape(1, S, 1, dh)

    logits_ref = np.einsum("bqhd,bkhd->bhqk", rope_interleaved(q),
                           rope_interleaved(k))

    perm = _rope_perm(dh)
    qh = jnp.asarray(q[..., perm])
    kh = jnp.asarray(k[..., perm])
    qh = _apply_rope_flat(qh, jnp.asarray(cos), jnp.asarray(sin))
    kh = _apply_rope_flat(kh, jnp.asarray(cos), jnp.asarray(sin))
    logits = np.einsum("bqhd,bkhd->bhqk", np.asarray(qh), np.asarray(kh))
    np.testing.assert_allclose(logits, logits_ref, atol=1e-5, rtol=1e-5)


def _synthetic_mmdit_state_dict(cfg: MMDiTConfig):
    rng = np.random.RandomState(0)
    sd = {}

    def lin(name, din, dout):
        sd[name + ".weight"] = rng.randn(dout, din).astype(np.float32) * 0.02
        sd[name + ".bias"] = rng.randn(dout).astype(np.float32) * 0.02

    D, mlp, dh = cfg.hidden_size, cfg.mlp_dim, cfg.head_dim
    lin("img_in", cfg.packed_channels, D)
    lin("txt_in", cfg.context_in_dim, D)
    lin("cond_in", cfg.cond_channels, D)
    for p, din in (("time_in", cfg.t_embed_freq_dim),
                   ("vector_in", cfg.vec_in_dim)):
        lin(p + ".in_layer", din, D)
        lin(p + ".out_layer", D, D)
    for i in range(cfg.depth_double):
        b = f"double_blocks.{i}."
        for st in ("img", "txt"):
            lin(b + st + "_mod.lin", D, 6 * D)
            lin(b + st + "_attn.qkv", D, 3 * D)
            sd[b + st + "_attn.norm.query_norm.scale"] = \
                rng.randn(dh).astype(np.float32)
            sd[b + st + "_attn.norm.key_norm.scale"] = \
                rng.randn(dh).astype(np.float32)
            lin(b + st + "_attn.proj", D, D)
            lin(b + st + "_mlp.0", D, mlp)
            lin(b + st + "_mlp.2", mlp, D)
    for i in range(cfg.depth_single):
        b = f"single_blocks.{i}."
        lin(b + "linear1", D, 3 * D + mlp)
        lin(b + "linear2", D + mlp, D)
        sd[b + "norm.query_norm.scale"] = rng.randn(dh).astype(np.float32)
        sd[b + "norm.key_norm.scale"] = rng.randn(dh).astype(np.float32)
        lin(b + "modulation.lin", D, 3 * D)
    lin("final_layer.adaLN_modulation.1", D, 2 * D)
    lin("final_layer.linear", D, cfg.packed_channels)
    return sd


def test_convert_torch_mmdit_state_structure(setup):
    """Converter output must be structurally identical to init_mmdit
    (same treedef, same shapes) and run through the forward."""
    from longcat_video_tta_tpu.models.convert import convert_torch_mmdit_state

    params_ref, lat, txt, yv = setup
    sd = _synthetic_mmdit_state_dict(CFG)
    params = convert_torch_mmdit_state(sd, CFG)

    ref_flat = jax.tree_util.tree_flatten_with_path(params_ref)[0]
    got_flat = jax.tree_util.tree_flatten_with_path(params)[0]
    ref_map = {jax.tree_util.keystr(p): v.shape for p, v in ref_flat}
    got_map = {jax.tree_util.keystr(p): v.shape for p, v in got_flat}
    assert ref_map == got_map

    out = mmdit_forward(params, CFG, lat, jnp.array([0.5]), txt, yv,
                        cond=jnp.zeros((1, 5, 3, 8, 12)))
    assert np.isfinite(np.asarray(out)).all()


def test_convert_clip_text_structure():
    from longcat_video_tta_tpu.models.clip_text import (
        clip_text_pooled,
        init_clip_text,
    )
    from longcat_video_tta_tpu.models.convert import (
        convert_torch_clip_text_state,
    )

    cfg = CLIPTextConfig(vocab_size=64, width=16, num_layers=2, num_heads=2,
                         max_length=8)
    rng = np.random.RandomState(0)
    sd = {}

    def lin(name, din, dout):
        sd[name + ".weight"] = rng.randn(dout, din).astype(np.float32)
        sd[name + ".bias"] = rng.randn(dout).astype(np.float32)

    sd["text_model.embeddings.token_embedding.weight"] = \
        rng.randn(64, 16).astype(np.float32)
    sd["text_model.embeddings.position_embedding.weight"] = \
        rng.randn(8, 16).astype(np.float32)
    for i in range(2):
        b = f"text_model.encoder.layers.{i}."
        for n in ("layer_norm1", "layer_norm2"):
            sd[b + n + ".weight"] = rng.randn(16).astype(np.float32)
            sd[b + n + ".bias"] = rng.randn(16).astype(np.float32)
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin(b + "self_attn." + n, 16, 16)
        lin(b + "mlp.fc1", 16, 64)
        lin(b + "mlp.fc2", 64, 16)
    sd["text_model.final_layer_norm.weight"] = rng.randn(16).astype(np.float32)
    sd["text_model.final_layer_norm.bias"] = rng.randn(16).astype(np.float32)

    params = convert_torch_clip_text_state(sd, cfg)
    ref = init_clip_text(jax.random.PRNGKey(0), cfg)
    ref_map = {jax.tree_util.keystr(p): v.shape
               for p, v in jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_map = {jax.tree_util.keystr(p): v.shape
               for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_map == got_map
    ids = jnp.asarray(np.concatenate(
        [rng.randint(1, 63, (1, 5)), np.zeros((1, 3), int)], axis=1))
    pooled = clip_text_pooled(params, cfg, ids)
    assert pooled.shape == (1, 16) and np.isfinite(np.asarray(pooled)).all()


def test_mmdit_param_count_full_size():
    """The full Open-Sora v2 geometry must land in the ~11B class
    (sanity that the preset isn't a toy)."""
    cfg = MMDiTConfig()
    D, mlp, Ld, Ls = (cfg.hidden_size, cfg.mlp_dim, cfg.depth_double,
                      cfg.depth_single)
    analytic = (
        Ld * (2 * 6 * D * D + 2 * (3 * D * D + D * D) + 4 * D * mlp)
        + Ls * (3 * D * D + D * D + 2 * D * mlp + 3 * D * D)
    )
    assert 9e9 < analytic < 13e9


def test_pab_every1_exact_and_segment_carry(setup):
    """PAB on the MMDiT dual+single-stream sampler: every=1 exact,
    segmented carries the (double, single) caches."""
    from longcat_video_tta_tpu.config import PABConfig
    from longcat_video_tta_tpu.pipeline.sampler import (
        sample_latents_mmdit,
        sample_latents_mmdit_segmented,
    )

    params, lat, txt, yv = setup
    txt3 = jnp.concatenate([txt, txt, txt], axis=0)
    yv3 = jnp.concatenate([yv, yv, yv], axis=0)
    kw = dict(num_gen_latents=2, num_steps=6, lat_h=8, lat_w=12,
              cond_latents=lat[:, :, :1])
    base = np.asarray(sample_latents_mmdit(
        params, CFG, jax.random.PRNGKey(4), txt3, yv3, **kw))
    pab1 = np.asarray(sample_latents_mmdit(
        params, CFG, jax.random.PRNGKey(4), txt3, yv3,
        pab_cfg=PABConfig(every=1), **kw))
    np.testing.assert_allclose(pab1, base, rtol=1e-5, atol=1e-6)
    cfg2 = PABConfig(every=2, start_frac=0.2, end_frac=0.9)
    pab2 = np.asarray(sample_latents_mmdit(
        params, CFG, jax.random.PRNGKey(4), txt3, yv3, pab_cfg=cfg2,
        **kw))
    assert np.isfinite(pab2).all() and not np.allclose(pab2, base)
    seg = np.asarray(sample_latents_mmdit_segmented(
        params, CFG, jax.random.PRNGKey(4), txt3, yv3, segment_steps=2,
        pab_cfg=cfg2, **kw))
    np.testing.assert_allclose(seg, pab2, rtol=1e-5, atol=1e-6)


def test_cfg_reuse_every1_exact_pab_compose_segment_carry(setup):
    """CFG guidance-delta reuse on the MMDiT triple-CFG sampler
    ([cond, uncond, uncond2] -> reuse steps run the conditional third
    and reconstruct the other two from the cached deltas): every=1
    exact, every=2 finite approximation, segmented carries the deltas,
    composes with PAB (cond-first cache slice)."""
    from longcat_video_tta_tpu.config import CFGReuseConfig, PABConfig
    from longcat_video_tta_tpu.pipeline.sampler import (
        sample_latents_mmdit,
        sample_latents_mmdit_segmented,
    )

    params, lat, txt, yv = setup
    txt3 = jnp.concatenate([txt, txt, txt], axis=0)
    yv3 = jnp.concatenate([yv, yv, yv], axis=0)
    kw = dict(num_gen_latents=2, num_steps=6, lat_h=8, lat_w=12,
              cond_latents=lat[:, :, :1])
    base = np.asarray(sample_latents_mmdit(
        params, CFG, jax.random.PRNGKey(4), txt3, yv3, **kw))
    r1 = np.asarray(sample_latents_mmdit(
        params, CFG, jax.random.PRNGKey(4), txt3, yv3,
        cfgr_cfg=CFGReuseConfig(every=1), **kw))
    np.testing.assert_allclose(r1, base, rtol=1e-5, atol=1e-6)
    cfg2 = CFGReuseConfig(every=2, start_frac=0.2, end_frac=1.0)
    r2 = np.asarray(sample_latents_mmdit(
        params, CFG, jax.random.PRNGKey(4), txt3, yv3, cfgr_cfg=cfg2,
        **kw))
    assert np.isfinite(r2).all() and not np.allclose(r2, base)
    seg = np.asarray(sample_latents_mmdit_segmented(
        params, CFG, jax.random.PRNGKey(4), txt3, yv3, segment_steps=2,
        cfgr_cfg=cfg2, **kw))
    np.testing.assert_allclose(seg, r2, rtol=1e-5, atol=1e-6)
    both = np.asarray(sample_latents_mmdit(
        params, CFG, jax.random.PRNGKey(4), txt3, yv3, cfgr_cfg=cfg2,
        pab_cfg=PABConfig(every=2, start_frac=0.2, end_frac=0.9), **kw))
    assert np.isfinite(both).all()
