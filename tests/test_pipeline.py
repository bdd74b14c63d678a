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


def test_generate_vc_frame_alignment(monkeypatch):
    """The returned clip must start exactly at the anchor frame.

    With the causal VAE, n_gen latents decode to nf+3 frames; slicing the
    *tail* nf frames (the round-1 bug) would return a clip starting 3
    frames after the anchor, misaligning every metric vs GT (reference
    scores gen_output[num_cond:num_cond+num_gen]). Uses an index-marking
    fake codec so the check is exact."""
    import longcat_video_tta_tpu.pipeline.pipeline as P

    tf = CFG.vae.temporal_factor
    anchor, t_cond = 32, 13  # 4k+1 cond window flush with the anchor
    start = anchor - t_cond

    class FakeBundle:
        cfg = CFG
        dit_params = {}

        def encode_video(self, px):
            # latent j stores the global index of its group's first frame
            T = px.shape[2]
            L = 1 + (T - 1) // tf
            vals = [px[0, 0, 0, 0, 0]] + [
                px[0, 0, 1 + (j - 1) * tf, 0, 0] for j in range(1, L)
            ]
            return jnp.asarray(vals, jnp.float32).reshape(1, 1, L, 1, 1)

        def encode_prompt(self, prompt):
            return jnp.zeros((1, 4, 8)), jnp.ones((1, 4), jnp.int32)

        def decode_latents(self, lat):
            frames = [lat[0, 0, 0, 0, 0]]
            for j in range(1, lat.shape[2]):
                v = lat[0, 0, j, 0, 0]
                frames.extend(v + k for k in range(tf))
            out = jnp.asarray(frames, jnp.float32).reshape(1, 1, -1, 1, 1)
            return jnp.broadcast_to(out, (1, 3, out.shape[2], 1, 1))

    def fake_sample(dit_params, dit_cfg, sched_cfg, key, emb, mask, nemb,
                    nmask, guidance, *, cond_latents=None,
                    num_gen_latents=None, **kw):
        # gen latent i covers frames [anchor + i*tf, ...): continue the
        # group-start index sequence from the last cond latent
        last = cond_latents[0, 0, -1, 0, 0]
        vals = last + tf * jnp.arange(1, num_gen_latents + 1,
                                      dtype=jnp.float32)
        return vals.reshape(1, 1, num_gen_latents, 1, 1)

    monkeypatch.setattr(P, "sample_latents", fake_sample)

    cond_px = jnp.broadcast_to(
        jnp.arange(start, anchor, dtype=jnp.float32).reshape(1, 1, t_cond,
                                                             1, 1),
        (1, 3, t_cond, 2, 2))
    out = P.generate_vc(FakeBundle(), cond_px, "x", num_frames=14,
                        num_inference_steps=1)
    nf = round_frames_4k1(14)
    assert out.shape[0] == nf
    np.testing.assert_allclose(
        out[:, 0, 0, 0], np.arange(anchor, anchor + nf, dtype=np.float32),
        atol=0)


def test_segmented_sampler_equals_one_dispatch(bundle):
    """sample_latents_segmented must be numerically identical to the
    one-dispatch sampler (same noise init, same per-step math) — it only
    bounds per-dispatch execution time (the axon long-execution fault
    workaround, --gen-segment-steps)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from longcat_video_tta_tpu.pipeline.sampler import (
        sample_latents, sample_latents_segmented,
    )

    cfg = bundle.cfg
    B = 1
    emb, mask = bundle.encode_prompt("a dog")
    nemb, nmask = bundle.encode_prompt("")
    cond = jax.random.normal(jax.random.PRNGKey(7),
                             (B, cfg.dit.in_channels, 2, 4, 8))
    kw = dict(num_gen_latents=3, num_steps=5, lat_h=4, lat_w=8,
              cond_latents=cond, use_kv_cache=True, attn_impl="xla")
    ref = sample_latents(bundle.dit_params, cfg.dit, cfg.scheduler,
                         jax.random.PRNGKey(0), emb, mask, nemb, nmask,
                         4.0, **kw)
    seg = sample_latents_segmented(bundle.dit_params, cfg.dit,
                                   cfg.scheduler, jax.random.PRNGKey(0),
                                   emb, mask, nemb, nmask, 4.0,
                                   segment_steps=2, **kw)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_generate_vc_segmented(bundle):
    import jax
    import numpy as np

    cond = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 5, 16, 32),
                              minval=-1.0, maxval=1.0)
    a = generate_vc(bundle, cond, "a dog", num_frames=5,
                    num_inference_steps=3, seed=0)
    b = generate_vc(bundle, cond, "a dog", num_frames=5,
                    num_inference_steps=3, seed=0, gen_segment_steps=2)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=1e-4, rtol=1e-4)


def test_pab_every1_is_exact_and_every2_faithful(bundle):
    """Pyramid Attention Broadcast (config.PABConfig): every=1 never
    reuses (the (i-start)%every==0 refresh rule fires at each step), so
    the PAB code path must reproduce the plain sampler exactly; every=2
    is an approximation that must stay finite and close at tiny scale.
    The segmented dispatch must carry the attention cache across
    segments (global flags) and match the one-dispatch PAB result."""
    from longcat_video_tta_tpu.config import PABConfig
    from longcat_video_tta_tpu.pipeline.sampler import (
        sample_latents_segmented,
    )

    cond = bundle.encode_video(
        jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 5, 16, 32),
                           minval=-1.0, maxval=1.0))
    emb, mask = bundle.encode_prompt("hello")
    nemb, nmask = bundle.encode_prompt("")
    common = dict(num_gen_latents=2, num_steps=6, lat_h=2, lat_w=4,
                  cond_latents=cond, use_kv_cache=True)

    def run(**kw):
        return np.asarray(sample_latents(
            bundle.dit_params, CFG.dit, CFG.scheduler,
            jax.random.PRNGKey(0), emb, mask, nemb, nmask, 4.0,
            **common, **kw))

    base = run()
    pab1 = run(pab_cfg=PABConfig(every=1))
    np.testing.assert_allclose(pab1, base, atol=1e-5, rtol=1e-5)

    pab2_cfg = PABConfig(every=2, start_frac=0.2, end_frac=0.9)
    pab2 = run(pab_cfg=pab2_cfg)
    assert np.isfinite(pab2).all()
    assert not np.allclose(pab2, base)  # approximation engaged
    # crude fidelity bound at tiny scale: same order of magnitude and
    # positively correlated with the dense trajectory
    c = np.corrcoef(pab2.ravel(), base.ravel())[0, 1]
    assert c > 0.8, c

    seg = np.asarray(sample_latents_segmented(
        bundle.dit_params, CFG.dit, CFG.scheduler, jax.random.PRNGKey(0),
        emb, mask, nemb, nmask, 4.0, segment_steps=2,
        pab_cfg=pab2_cfg, **common))
    np.testing.assert_allclose(seg, pab2, atol=1e-5, rtol=1e-5)


def test_pab_generate_vc_and_unsupported_combos(bundle):
    from longcat_video_tta_tpu.config import PABConfig

    cond = jax.random.uniform(jax.random.PRNGKey(4), (1, 3, 5, 16, 32),
                              minval=-1.0, maxval=1.0)
    out = generate_vc(bundle, cond, "a dog", num_frames=5,
                      num_inference_steps=4, seed=0,
                      pab_cfg=PABConfig(every=2))
    assert out.shape == (5, 16, 32, 3)
    with pytest.raises(NotImplementedError):
        generate_vc(bundle, cond, "a dog", num_frames=5,
                    num_inference_steps=4, seed=0, use_kv_cache=False,
                    pab_cfg=PABConfig(every=2))


def test_pab_t2v_every1_exact(bundle):
    """PAB on the dense t2v path (dit_forward, n_cond=0): every=1 must
    reproduce the plain t2v sampler exactly."""
    from longcat_video_tta_tpu.config import PABConfig

    base = generate_t2v(bundle, "a cat", num_frames=5, height=16,
                        width=32, num_inference_steps=5, seed=3)
    pab1 = generate_t2v(bundle, "a cat", num_frames=5, height=16,
                        width=32, num_inference_steps=5, seed=3,
                        pab_cfg=PABConfig(every=1))
    np.testing.assert_allclose(pab1, base, atol=1e-5, rtol=1e-5)
    pab2 = generate_t2v(bundle, "a cat", num_frames=5, height=16,
                        width=32, num_inference_steps=5, seed=3,
                        pab_cfg=PABConfig(every=2, start_frac=0.2,
                                          end_frac=1.0))
    assert np.isfinite(pab2).all()


def test_pab_composes_with_bucket_and_bsa(bundle):
    """The r3 lever stack must compose: bucket_gen (padded horizon with
    traced valid count) + BSA + PAB through generate_vc."""
    from longcat_video_tta_tpu.config import BSAConfig, PABConfig

    cond = jax.random.uniform(jax.random.PRNGKey(5), (1, 3, 5, 16, 32),
                              minval=-1.0, maxval=1.0)
    out = generate_vc(bundle, cond, "a dog", num_frames=5,
                      num_inference_steps=4, seed=0, bucket_gen=True,
                      bsa_cfg=BSAConfig(keep_ratio=0.5, block_q=8,
                                        block_k=8, min_blocks=1),
                      pab_cfg=PABConfig(every=2, start_frac=0.25,
                                        end_frac=1.0))
    assert out.shape == (5, 16, 32, 3)
    assert np.isfinite(out).all()


# ---------------------------------------------------------------------------
# CFG guidance-delta reuse (config.CFGReuseConfig; FasterCache,
# arXiv:2410.19355)
# ---------------------------------------------------------------------------


def _cfgr_run(bundle, cond, emb, mask, nemb, nmask, g=4.0, **kw):
    common = dict(num_gen_latents=2, num_steps=6, lat_h=2, lat_w=4,
                  cond_latents=cond, use_kv_cache=True)
    common.update(kw)
    return np.asarray(sample_latents(
        bundle.dit_params, CFG.dit, CFG.scheduler, jax.random.PRNGKey(0),
        emb, mask, nemb, nmask, g, **common))


def test_cfg_reuse_every1_exact_every2_faithful_segment_carry(bundle):
    """every=1 never reuses, so the CFG-reuse code path must reproduce
    the plain sampler exactly; every=2 approximates (finite, correlated
    at tiny scale); segmented dispatch must carry the guidance delta
    across segments and bit-match the one-dispatch result."""
    from longcat_video_tta_tpu.config import CFGReuseConfig
    from longcat_video_tta_tpu.pipeline.sampler import (
        sample_latents_segmented,
    )

    cond = bundle.encode_video(
        jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 5, 16, 32),
                           minval=-1.0, maxval=1.0))
    emb, mask = bundle.encode_prompt("hello")
    nemb, nmask = bundle.encode_prompt("")

    base = _cfgr_run(bundle, cond, emb, mask, nemb, nmask)
    r1 = _cfgr_run(bundle, cond, emb, mask, nemb, nmask,
                   cfgr_cfg=CFGReuseConfig(every=1))
    np.testing.assert_allclose(r1, base, atol=1e-5, rtol=1e-5)

    cfgr2 = CFGReuseConfig(every=2, start_frac=0.2, end_frac=1.0)
    r2 = _cfgr_run(bundle, cond, emb, mask, nemb, nmask, cfgr_cfg=cfgr2)
    assert np.isfinite(r2).all()
    assert not np.allclose(r2, base)  # approximation engaged
    c = np.corrcoef(r2.ravel(), base.ravel())[0, 1]
    assert c > 0.8, c

    seg = np.asarray(sample_latents_segmented(
        bundle.dit_params, CFG.dit, CFG.scheduler, jax.random.PRNGKey(0),
        emb, mask, nemb, nmask, 4.0, segment_steps=2,
        num_gen_latents=2, num_steps=6, lat_h=2, lat_w=4,
        cond_latents=cond, use_kv_cache=True, cfgr_cfg=cfgr2))
    np.testing.assert_allclose(seg, r2, atol=1e-5, rtol=1e-5)


def test_cfg_reuse_guidance1_is_exact(bundle):
    """At guidance_scale=1 the euler update consumes only v_cond, so
    CFG-reuse must be EXACT at any schedule — this isolates the
    conditional-half plumbing (text/KV-cache slices, batch-B forward)
    from the delta approximation."""
    from longcat_video_tta_tpu.config import CFGReuseConfig

    cond = bundle.encode_video(
        jax.random.uniform(jax.random.PRNGKey(5), (1, 3, 5, 16, 32),
                           minval=-1.0, maxval=1.0))
    emb, mask = bundle.encode_prompt("hello")
    nemb, nmask = bundle.encode_prompt("")
    base = _cfgr_run(bundle, cond, emb, mask, nemb, nmask, g=1.0)
    r = _cfgr_run(bundle, cond, emb, mask, nemb, nmask, g=1.0,
                  cfgr_cfg=CFGReuseConfig(every=3, start_frac=0.0,
                                          end_frac=1.0))
    np.testing.assert_allclose(r, base, atol=1e-5, rtol=1e-5)


def test_cfg_reuse_matches_hand_rolled_reference(bundle):
    """The scan implementation must match a step-by-step python loop of
    the FasterCache recipe: full steps compute both CFG branches and
    refresh delta = v_c - v_u; reuse steps compute only the conditional
    branch and reconstruct v_u = v_c - delta."""
    from longcat_video_tta_tpu.config import CFGReuseConfig
    from longcat_video_tta_tpu.models import scheduler as sched
    from longcat_video_tta_tpu.models.dit import (
        dit_forward_with_cache, dit_precompute_cond_cache,
    )
    from longcat_video_tta_tpu.pipeline.sampler import _cfg_reuse_flags

    cond = bundle.encode_video(
        jax.random.uniform(jax.random.PRNGKey(7), (1, 3, 5, 16, 32),
                           minval=-1.0, maxval=1.0))
    emb, mask = bundle.encode_prompt("hello")
    nemb, nmask = bundle.encode_prompt("")
    num_steps, g = 6, 4.0
    cfgr = CFGReuseConfig(every=2, start_frac=0.2, end_frac=1.0)
    n_cond = cond.shape[2]

    out = _cfgr_run(bundle, cond, emb, mask, nemb, nmask, g=g,
                    cfgr_cfg=cfgr)

    flags = np.asarray(_cfg_reuse_flags(num_steps, cfgr))
    assert flags.any() and not flags.all() and not flags[0]
    sigmas = sched.build_sigmas(num_steps, CFG.scheduler)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, CFG.dit.in_channels,
                                                  2, 2, 4), jnp.float32)
    x = x * sigmas[0]
    emb2 = jnp.concatenate([nemb, emb], axis=0)
    mask2 = jnp.concatenate([nmask, mask], axis=0)
    cond2 = jnp.concatenate([cond, cond], axis=0)
    kv = dit_precompute_cond_cache(bundle.dit_params, CFG.dit, cond2,
                                   emb2, mask2)
    kv_c = jax.tree.map(lambda a: a[:, 1:], kv)
    delta = jnp.zeros_like(x)
    for i in range(num_steps):
        t_val = sched.sigma_to_timestep(sigmas[i], CFG.scheduler)
        if flags[i]:
            v_c = dit_forward_with_cache(
                bundle.dit_params, CFG.dit, x.astype(jnp.float32),
                jnp.full((1,), t_val), emb2[1:], mask2[1:], kv_c,
                num_cond_latents=n_cond)
            v_u = v_c - delta
        else:
            v2 = dit_forward_with_cache(
                bundle.dit_params, CFG.dit,
                jnp.concatenate([x, x]).astype(jnp.float32),
                jnp.full((2,), t_val), emb2, mask2, kv,
                num_cond_latents=n_cond)
            v_u, v_c = v2[:1], v2[1:]
            delta = v_c - v_u
        v = v_u + g * (v_c - v_u)
        x = sched.euler_step(x, v, sigmas[i], sigmas[i + 1])
    np.testing.assert_allclose(np.asarray(x), out, atol=1e-4, rtol=1e-4)


def test_cfg_reuse_composes_with_pab_and_paths(bundle):
    """CFG-reuse x PAB: both at every=1 stay exact; both engaged stay
    finite. Also covers the t2v (n_cond=0) and no-KV-cache paths, and
    the generate_vc wiring incl. the mmdit/cogvideox fail-loud."""
    from longcat_video_tta_tpu.config import CFGReuseConfig, PABConfig

    cond = bundle.encode_video(
        jax.random.uniform(jax.random.PRNGKey(9), (1, 3, 5, 16, 32),
                           minval=-1.0, maxval=1.0))
    emb, mask = bundle.encode_prompt("hello")
    nemb, nmask = bundle.encode_prompt("")

    base = _cfgr_run(bundle, cond, emb, mask, nemb, nmask)
    both1 = _cfgr_run(bundle, cond, emb, mask, nemb, nmask,
                      cfgr_cfg=CFGReuseConfig(every=1),
                      pab_cfg=PABConfig(every=1))
    np.testing.assert_allclose(both1, base, atol=1e-5, rtol=1e-5)
    both2 = _cfgr_run(
        bundle, cond, emb, mask, nemb, nmask,
        cfgr_cfg=CFGReuseConfig(every=2, start_frac=0.2, end_frac=1.0),
        pab_cfg=PABConfig(every=2, start_frac=0.2, end_frac=0.9))
    assert np.isfinite(both2).all()

    # no-KV-cache continuation path
    nc = _cfgr_run(bundle, cond, emb, mask, nemb, nmask,
                   use_kv_cache=False,
                   cfgr_cfg=CFGReuseConfig(every=2, start_frac=0.2,
                                           end_frac=1.0))
    assert np.isfinite(nc).all()

    # t2v (n_cond=0) through the product wrapper
    t2v = generate_t2v(bundle, "a cat", num_frames=5, height=16, width=32,
                       num_inference_steps=4, seed=0,
                       cfgr_cfg=CFGReuseConfig(every=2, start_frac=0.25,
                                               end_frac=1.0))
    assert t2v.shape == (5, 16, 32, 3) and np.isfinite(t2v).all()

    cond_px = jax.random.uniform(jax.random.PRNGKey(4), (1, 3, 5, 16, 32),
                                 minval=-1.0, maxval=1.0)
    out = generate_vc(bundle, cond_px, "a dog", num_frames=5,
                      num_inference_steps=4, seed=0,
                      cfgr_cfg=CFGReuseConfig(every=2))
    assert out.shape == (5, 16, 32, 3)
