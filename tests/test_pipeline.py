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
