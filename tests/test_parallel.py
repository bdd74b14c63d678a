"""Sharded multi-chip path on the virtual 8-device CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longcat_video_tta_tpu.config import (
    AdapterConfig, MeshConfig, OptimConfig, longcat_tiny,
)
from longcat_video_tta_tpu.models import dit as M
from longcat_video_tta_tpu.parallel import (
    build_mesh, param_specs, shard_batch, shard_params,
)
from longcat_video_tta_tpu.tta import (
    build_optimizer, build_scheme, flow_matching_loss_conditioned,
    make_train_step,
)

CFG = dataclasses.replace(longcat_tiny().dit, hidden_size=64, num_heads=2,
                          ffn_dim=128)


@pytest.fixture(scope="module")
def inputs():
    params = M.init_dit(jax.random.PRNGKey(0), CFG, zero_init=False)
    B, C, T, H, W = 2, CFG.in_channels, 4, 8, 16
    latents = jax.random.normal(jax.random.PRNGKey(1), (B, C, T, H, W))
    text = jax.random.normal(jax.random.PRNGKey(2),
                             (B, CFG.text_len, CFG.text_dim))
    mask = jnp.ones((B, CFG.text_len), jnp.int32)
    return params, latents, text, mask


def test_mesh_axes():
    mesh = build_mesh(MeshConfig(data=2, context=2, tensor=2))
    assert mesh.axis_names == ("data", "context", "tensor")
    assert mesh.devices.size == 8


def test_param_specs_cover_tensor_axis(inputs):
    params, *_ = inputs
    specs = param_specs(params)
    flat = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
    assert any("tensor" in str(s) for s in flat)


def test_param_specs_cover_int8_quantized_tree(inputs):
    """ops/quant.py renames kernel -> kernel_i8 and adds a per-output
    scale; the TP rules must keep sharding those (regression: the heavy
    matmuls of a quantized tree silently replicated under TP)."""
    from longcat_video_tta_tpu.ops.quant import quantize_dit_blocks_int8

    params, *_ = inputs
    specs = param_specs(quantize_dit_blocks_int8(params))
    qkv = specs["blocks"]["attn"]["qkv"]
    # column-parallel: kernel_i8 [L,K,N] out-sharded, scale [L,N] too
    assert tuple(qkv["kernel_i8"]) == (None, None, "tensor")
    assert tuple(qkv["scale"]) == (None, "tensor")
    proj = specs["blocks"]["attn"]["proj"]
    # row-parallel: kernel_i8 in-sharded, scale [L,N] replicated
    assert tuple(proj["kernel_i8"]) == (None, "tensor", None)
    assert tuple(proj["scale"]) == (None, None)


def test_sharded_forward_matches_single_device(inputs):
    """dp=2 x cp=2 x tp=2 sharded forward == unsharded forward."""
    params, latents, text, mask = inputs
    ref = M.dit_forward(params, CFG, latents, jnp.full((2,), 500.0),
                        text, mask, num_cond_latents=2, attn_impl="xla")

    mesh = build_mesh(MeshConfig(data=2, context=2, tensor=2))
    with mesh:
        p = shard_params(mesh, params)
        lat, txt, msk = shard_batch(mesh, latents, text, mask)
        out = M.dit_forward(p, CFG, lat, jnp.full((2,), 500.0), txt, msk,
                            num_cond_latents=2, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_sharded_full_tta_step(inputs):
    """The dryrun path: full-finetune step over the 8-device mesh."""
    params, latents, text, mask = inputs
    mesh = build_mesh(MeshConfig(data=2, context=2, tensor=2))
    with mesh:
        p = shard_params(mesh, params)
        lat, txt, msk = shard_batch(mesh, latents, text, mask)
        cond, target = lat[:, :, :2], lat[:, :, 2:]
        scheme = build_scheme(CFG, AdapterConfig(method="full"))
        tp = scheme.init(jax.random.PRNGKey(3), base_params=p)
        tx = build_optimizer(OptimConfig(lr=1e-4, optimizer="sgd"))
        opt_state = tx.init(tp)
        step = make_train_step(scheme, CFG, tx, attn_impl="xla")
        tp, opt_state, loss = step(tp, opt_state, p, cond, target, txt, msk,
                                   jax.random.PRNGKey(4))
    assert np.isfinite(float(loss))


def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_cp_attention_matches_unsharded():
    """Context-parallel all-gather-KV attention over 4 devices equals the
    unsharded reference, including the conditioning-prefix mask across
    shard boundaries."""
    from longcat_video_tta_tpu.ops.attention import attention_xla
    from longcat_video_tta_tpu.parallel.context_attention import (
        cp_self_attention,
    )

    mesh = build_mesh(MeshConfig(data=1, context=4, tensor=1))
    B, S, H, D = 1, 64, 2, 16
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, S, H, D))
    k = jax.random.normal(kk, (B, S, H, D))
    v = jax.random.normal(kv, (B, S, H, D))
    for ncond in (0, 24):  # 24 crosses the 16-token shard boundary
        ref = attention_xla(q, k, v, num_cond_tokens=ncond)
        with mesh:
            out = cp_self_attention(q, k, v, mesh, num_cond_tokens=ncond)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5,
                                   err_msg=f"ncond={ncond}")


def test_dit_forward_context_parallel_matches(inputs):
    """dit_forward with cp_mesh (self-attention sharded over 4 context
    devices) equals the single-device forward, including the cond
    prefix."""
    params, latents, text, mask = inputs
    mesh = build_mesh(MeshConfig(data=1, context=4, tensor=1))
    t = jnp.full((2,), 500.0)
    ref = M.dit_forward(params, CFG, latents, t, text, mask,
                        num_cond_latents=2, attn_impl="xla")
    with mesh:
        out = M.dit_forward(params, CFG, latents, t, text, mask,
                            num_cond_latents=2, attn_impl="xla",
                            cp_mesh=mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_ring_attention_matches_unsharded_and_allgather():
    """Ring flash attention (xla chunk impl on CPU) == all-gather-KV ==
    unsharded reference, incl. the cond prefix crossing shard
    boundaries."""
    from longcat_video_tta_tpu.ops.attention import attention_xla
    from longcat_video_tta_tpu.parallel.context_attention import (
        cp_self_attention, ring_self_attention,
    )

    mesh = build_mesh(MeshConfig(data=1, context=4, tensor=1))
    B, S, H, D = 1, 64, 2, 16
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(kq, (B, S, H, D))
    k = jax.random.normal(kk, (B, S, H, D))
    v = jax.random.normal(kv, (B, S, H, D))
    for ncond in (0, 24):
        ref = attention_xla(q, k, v, num_cond_tokens=ncond)
        with mesh:
            ag = cp_self_attention(q, k, v, mesh, num_cond_tokens=ncond)
            ring = ring_self_attention(q, k, v, mesh,
                                       num_cond_tokens=ncond, impl="xla")
        np.testing.assert_allclose(np.asarray(ring), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5,
                                   err_msg=f"ring vs ref ncond={ncond}")
        np.testing.assert_allclose(np.asarray(ring), np.asarray(ag),
                                   atol=2e-5, rtol=2e-5,
                                   err_msg=f"ring vs all-gather "
                                           f"ncond={ncond}")


def test_ring_attention_gradients_match_unsharded():
    """The ring-level custom VJP (second ring pass, travelling dk/dv
    accumulators) reproduces the unsharded gradients."""
    from longcat_video_tta_tpu.ops.attention import attention_xla
    from longcat_video_tta_tpu.parallel.context_attention import (
        ring_self_attention,
    )

    mesh = build_mesh(MeshConfig(data=1, context=4, tensor=1))
    B, S, H, D = 1, 32, 2, 8
    kq, kk, kv, kw = jax.random.split(jax.random.PRNGKey(6), 4)
    q = jax.random.normal(kq, (B, S, H, D))
    k = jax.random.normal(kk, (B, S, H, D))
    v = jax.random.normal(kv, (B, S, H, D))
    w = jax.random.normal(kw, (B, S, H, D))
    ncond = 12

    def loss_ref(q, k, v):
        return jnp.sum(attention_xla(q, k, v, num_cond_tokens=ncond) * w)

    def loss_ring(q, k, v):
        with mesh:
            return jnp.sum(
                ring_self_attention(q, k, v, mesh,
                                    num_cond_tokens=ncond, impl="xla") * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=f"d{name}")


def test_ring_attention_decode_shapes():
    """KV-cache decode under CP: Sq (noise) != Sk (cond ++ noise), no
    masking — matches the unsharded oracle."""
    from longcat_video_tta_tpu.ops.attention import attention_xla
    from longcat_video_tta_tpu.parallel.context_attention import (
        ring_self_attention,
    )

    mesh = build_mesh(MeshConfig(data=1, context=4, tensor=1))
    B, Sq, Sk, H, D = 1, 32, 48, 2, 16
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(kq, (B, Sq, H, D))
    k = jax.random.normal(kk, (B, Sk, H, D))
    v = jax.random.normal(kv, (B, Sk, H, D))
    ref = attention_xla(q, k, v)
    with mesh:
        out = ring_self_attention(q, k, v, mesh, num_cond_tokens=0,
                                  impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    # ncond > 0 with Sq != Sk: conditioning QUERIES only exist in the
    # no-cache path, so the prefix rule must be dropped exactly like
    # flash_attention/attention_xla drop it (regression: the ring
    # applied it in query-local coordinates, silently restricting the
    # first ncond noise queries to the cond prefix).
    ref_c = attention_xla(q, k, v, num_cond_tokens=16)
    with mesh:
        out_c = ring_self_attention(q, k, v, mesh, num_cond_tokens=16,
                                    impl="xla")
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref_c),
                               atol=2e-5, rtol=2e-5)

    from longcat_video_tta_tpu.parallel.context_attention import (
        cp_self_attention,
    )
    with mesh:
        out_cp = cp_self_attention(q, k, v, mesh, num_cond_tokens=16)
    np.testing.assert_allclose(np.asarray(out_cp), np.asarray(ref_c),
                               atol=2e-5, rtol=2e-5)


def test_sample_latents_context_parallel_matches(inputs):
    """Sharded generation: sample_latents under a context mesh (incl. the
    KV-cache decode path) == single-device sampling."""
    from longcat_video_tta_tpu.pipeline import sample_latents
    from longcat_video_tta_tpu.config import longcat_tiny

    params, latents, text, mask = inputs
    cfg = longcat_tiny()
    mesh = build_mesh(MeshConfig(data=1, context=4, tensor=1))
    cond = latents[:1, :, :2]
    emb, msk = text[:1], mask[:1]
    common = dict(num_gen_latents=2, num_steps=2, lat_h=8, lat_w=16,
                  cond_latents=cond, attn_impl="xla")
    ref = sample_latents(params, CFG, cfg.scheduler, jax.random.PRNGKey(0),
                         emb, msk, emb, msk, 4.0, use_kv_cache=True,
                         **common)
    with mesh:
        out = sample_latents(params, CFG, cfg.scheduler,
                             jax.random.PRNGKey(0), emb, msk, emb, msk, 4.0,
                             use_kv_cache=True, cp_mesh=mesh, **common)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_sample_latents_pab_under_context_parallel(inputs):
    """Pyramid Attention Broadcast composes with ring-CP: the broadcast
    lax.cond wraps the ring shard_map (models/dit.py::_block), so both
    branches must carry the same token sharding. every=1 under the ring
    == ring without PAB (the refresh rule fires each step, exactness);
    every=2 under the ring == every=2 unsharded (the approximation is
    mesh-invariant); the segmented dispatch carries the cache across
    segments under the mesh."""
    from longcat_video_tta_tpu.config import PABConfig, longcat_tiny
    from longcat_video_tta_tpu.pipeline import sample_latents
    from longcat_video_tta_tpu.pipeline.sampler import (
        sample_latents_segmented,
    )

    params, latents, text, mask = inputs
    cfg = longcat_tiny()
    mesh = build_mesh(MeshConfig(data=1, context=4, tensor=1))
    cond = latents[:1, :, :2]
    emb, msk = text[:1], mask[:1]
    common = dict(num_gen_latents=2, num_steps=4, lat_h=8, lat_w=16,
                  cond_latents=cond, attn_impl="xla", use_kv_cache=True)

    def run(cp_mesh=None, pab_cfg=None, segment_steps=0):
        fn = sample_latents
        kw = dict(common)
        if segment_steps:
            fn = sample_latents_segmented
            kw["segment_steps"] = segment_steps
        args = (params, CFG, cfg.scheduler, jax.random.PRNGKey(0),
                emb, msk, emb, msk, 4.0)
        if cp_mesh is not None:
            with cp_mesh:
                return np.asarray(fn(*args, cp_mesh=cp_mesh,
                                     pab_cfg=pab_cfg, **kw))
        return np.asarray(fn(*args, pab_cfg=pab_cfg, **kw))

    cp_ref = run(cp_mesh=mesh)
    pab1_cp = run(cp_mesh=mesh, pab_cfg=PABConfig(every=1))
    np.testing.assert_allclose(pab1_cp, cp_ref, atol=1e-5, rtol=1e-5)

    pab2_cfg = PABConfig(every=2, start_frac=0.25, end_frac=1.0)
    pab2 = run(pab_cfg=pab2_cfg)
    pab2_cp = run(cp_mesh=mesh, pab_cfg=pab2_cfg)
    np.testing.assert_allclose(pab2_cp, pab2, atol=2e-4, rtol=1e-3)

    seg = run(cp_mesh=mesh, pab_cfg=pab2_cfg, segment_steps=2)
    np.testing.assert_allclose(seg, pab2_cp, atol=1e-5, rtol=1e-5)


def test_factorize_devices_prefers_context():
    from longcat_video_tta_tpu.parallel import factorize_devices

    cfg = factorize_devices(8)
    assert cfg.context >= cfg.tensor
    assert cfg.context == 8 and cfg.data == 1 and cfg.tensor == 1


def test_video_parallel_chunk_matches_sequential(inputs):
    """make_batched_train_chunk (vmap over videos) must equal running
    each video's per-step loop independently — and sharding the video
    axis over the mesh 'data' dimension must not change the math."""
    from longcat_video_tta_tpu.tta.engine import (
        make_batched_train_chunk,
        make_train_step,
    )
    from longcat_video_tta_tpu.tta import split_tta_latents

    params, latents, text, mask = inputs
    V, k = 2, 3
    scheme = build_scheme(CFG, AdapterConfig(method="delta_b",
                                             num_groups=2))
    tx = build_optimizer(OptimConfig(lr=1e-2, optimizer="adamw"))

    conds, trains, vids = [], [], []
    for v in range(V):
        lat = latents * (0.8 + 0.2 * v)
        c, t, _ = split_tta_latents(lat, 2, 0.25)
        conds.append(c)
        trains.append(t)
    rngs = jnp.stack([
        jnp.stack([jax.random.PRNGKey(v * 100 + s) for s in range(k)])
        for v in range(V)])

    # sequential reference
    step = make_train_step(scheme, CFG, tx)
    seq_tp, seq_losses = [], []
    for v in range(V):
        tp = scheme.init(jax.random.PRNGKey(7 + v), base_params=params)
        ost = tx.init(tp)
        ls = []
        for s in range(k):
            tp, ost, loss = step(tp, ost, params, conds[v], trains[v],
                                 text, mask, rngs[v, s])
            ls.append(float(loss))
        seq_tp.append(tp)
        seq_losses.append(ls)

    # batched (unsharded)
    tps = jax.tree.map(lambda *x: jnp.stack(x), *[
        scheme.init(jax.random.PRNGKey(7 + v), base_params=params)
        for v in range(V)])
    osts = jax.tree.map(lambda *x: jnp.stack(x),
                        *[tx.init(jax.tree.map(lambda a: a[v], tps))
                          for v in range(V)])
    cond_b = jnp.stack(conds)
    train_b = jnp.stack(trains)
    emb_b = jnp.stack([text] * V)
    mask_b = jnp.stack([mask] * V)

    for mesh in (None, build_mesh(MeshConfig(data=2, context=1, tensor=1))):
        chunk = make_batched_train_chunk(scheme, CFG, tx, mesh=mesh)
        tps_o, _, losses, anchors = chunk(
            tps, jax.tree.map(jnp.copy, osts), params, cond_b, train_b,
            emb_b, mask_b, rngs)
        assert anchors is None
        np.testing.assert_allclose(np.asarray(losses),
                                   np.asarray(seq_losses),
                                   rtol=2e-5, atol=1e-6)
        for v in range(V):
            for a, b in zip(jax.tree.leaves(
                    jax.tree.map(lambda x: x[v], tps_o)),
                    jax.tree.leaves(seq_tp[v])):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-5, atol=1e-6)


def test_ring_attention_kv_valid_bucketing():
    """Shape bucketing under ring CP: a traced global valid-key bound
    masks keys across ring chunks; valid-region outputs and gradients
    equal the unsharded oracle on the unpadded slice, and pad tokens
    contribute zero gradient to k/v."""
    from longcat_video_tta_tpu.ops.attention import attention_xla
    from longcat_video_tta_tpu.parallel.context_attention import (
        ring_self_attention,
    )

    mesh = build_mesh(MeshConfig(data=1, context=4, tensor=1))
    B, S, H, D = 1, 64, 2, 16
    valid, ncond = 44, 16
    kq, kk, kv, kw = jax.random.split(jax.random.PRNGKey(11), 4)
    q = jax.random.normal(kq, (B, S, H, D))
    k = jax.random.normal(kk, (B, S, H, D))
    v = jax.random.normal(kv, (B, S, H, D))
    w = jax.random.normal(kw, (B, valid, H, D))

    ref = attention_xla(q[:, :valid], k[:, :valid], v[:, :valid],
                        num_cond_tokens=ncond)
    with mesh:
        ring = ring_self_attention(q, k, v, mesh, num_cond_tokens=ncond,
                                   impl="xla", kv_valid=jnp.int32(valid))
    np.testing.assert_allclose(np.asarray(ring[:, :valid]),
                               np.asarray(ref), atol=2e-5, rtol=2e-5)

    def loss_ref(q, k, v):
        o = attention_xla(q[:, :valid], k[:, :valid], v[:, :valid],
                          num_cond_tokens=ncond)
        return jnp.sum(o * w)

    def loss_ring(q, k, v):
        with mesh:
            o = ring_self_attention(q, k, v, mesh, num_cond_tokens=ncond,
                                    impl="xla", kv_valid=jnp.int32(valid))
        return jnp.sum(o[:, :valid] * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a[:, :valid]),
                                   np.asarray(b[:, :valid]),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=f"d{name} valid region")
    # pad keys/values are masked out of every key set -> zero grads
    for a, name in zip(g_ring[1:], "kv"):
        np.testing.assert_allclose(np.asarray(a[:, valid:]), 0.0,
                                   atol=1e-7, err_msg=f"d{name} pad")


def test_dit_forward_bucketed_context_parallel_matches(inputs):
    """num_valid_latents composes with cp_mesh: the bucketed CP forward
    equals the bucketed single-device forward on the valid region."""
    params, latents, text, mask = inputs
    mesh = build_mesh(MeshConfig(data=1, context=4, tensor=1))
    B = latents.shape[0]
    # pad 4 valid latent frames to 8 with junk
    pad = jnp.full((B, latents.shape[1], 4, 8, 16), 13.5, latents.dtype)
    lat_p = jnp.concatenate([latents, pad], axis=2)
    ts = jnp.concatenate(
        [jnp.zeros((B, 2)), jnp.full((B, 6), 500.0)], axis=1)
    nv = jnp.int32(4)
    ref = M.dit_forward(params, CFG, lat_p, ts, text, mask,
                        num_cond_latents=2, attn_impl="xla",
                        num_valid_latents=nv)
    with mesh:
        out = M.dit_forward(params, CFG, lat_p, ts, text, mask,
                            num_cond_latents=2, attn_impl="xla",
                            cp_mesh=mesh, num_valid_latents=nv)
    np.testing.assert_allclose(np.asarray(out[:, :, :4]),
                               np.asarray(ref[:, :, :4]),
                               atol=2e-4, rtol=1e-3)


def test_bucketed_cached_decode_under_cp(inputs):
    """Gen-horizon bucketing composes with ring-CP cached decode: the
    concatenated [cache ++ fresh] sequence is contiguously sharded, so
    the global prefix bound holds across ring chunks."""
    params, latents, text, mask = inputs
    mesh = build_mesh(MeshConfig(data=1, context=4, tensor=1))
    B = latents.shape[0]
    cond = latents[:, :, :2]
    noise = latents[:, :, :3]
    pad = jnp.full((B, latents.shape[1], 1, 8, 16), 9.5, latents.dtype)
    noise_p = jnp.concatenate([noise, pad], axis=2)
    ts = jnp.full((B,), 500.0)
    nv = jnp.int32(3)

    cache = M.dit_precompute_cond_cache(params, CFG, cond, text, mask,
                                        attn_impl="xla")
    ref = M.dit_forward_with_cache(params, CFG, noise_p, ts, text, mask,
                                   cache, num_cond_latents=2,
                                   attn_impl="xla", num_valid_latents=nv)
    with mesh:
        cache_cp = M.dit_precompute_cond_cache(params, CFG, cond, text,
                                               mask, attn_impl="xla",
                                               cp_mesh=mesh)
        out = M.dit_forward_with_cache(params, CFG, noise_p, ts, text,
                                       mask, cache_cp, num_cond_latents=2,
                                       attn_impl="xla", cp_mesh=mesh,
                                       num_valid_latents=nv)
    np.testing.assert_allclose(np.asarray(out[:, :, :3]),
                               np.asarray(ref[:, :, :3]),
                               atol=2e-4, rtol=1e-3)


def test_sample_latents_cfg_reuse_under_context_parallel(inputs):
    """CFG guidance-delta reuse (config.CFGReuseConfig) composes with
    ring-CP: the conditional-only forward runs the same ring shard_map
    at batch B with the cond KV cache sliced per block in-scan
    (models/dit.py cache_cond_half). every=1 under the ring == ring
    without reuse (exactness); every=2 under the ring == every=2
    unsharded (mesh-invariant approximation); segmented dispatch
    carries the delta across segments under the mesh."""
    from longcat_video_tta_tpu.config import CFGReuseConfig, longcat_tiny
    from longcat_video_tta_tpu.pipeline import sample_latents
    from longcat_video_tta_tpu.pipeline.sampler import (
        sample_latents_segmented,
    )

    params, latents, text, mask = inputs
    cfg = longcat_tiny()
    mesh = build_mesh(MeshConfig(data=1, context=4, tensor=1))
    cond = latents[:1, :, :2]
    emb, msk = text[:1], mask[:1]
    common = dict(num_gen_latents=2, num_steps=4, lat_h=8, lat_w=16,
                  cond_latents=cond, attn_impl="xla", use_kv_cache=True)

    def run(cp_mesh=None, cfgr_cfg=None, segment_steps=0):
        fn = sample_latents
        kw = dict(common)
        if segment_steps:
            fn = sample_latents_segmented
            kw["segment_steps"] = segment_steps
        args = (params, CFG, cfg.scheduler, jax.random.PRNGKey(0),
                emb, msk, emb, msk, 4.0)
        if cp_mesh is not None:
            with cp_mesh:
                return np.asarray(fn(*args, cp_mesh=cp_mesh,
                                     cfgr_cfg=cfgr_cfg, **kw))
        return np.asarray(fn(*args, cfgr_cfg=cfgr_cfg, **kw))

    cp_ref = run(cp_mesh=mesh)
    r1_cp = run(cp_mesh=mesh, cfgr_cfg=CFGReuseConfig(every=1))
    np.testing.assert_allclose(r1_cp, cp_ref, atol=1e-5, rtol=1e-5)

    r2_cfg = CFGReuseConfig(every=2, start_frac=0.25, end_frac=1.0)
    r2 = run(cfgr_cfg=r2_cfg)
    r2_cp = run(cp_mesh=mesh, cfgr_cfg=r2_cfg)
    np.testing.assert_allclose(r2_cp, r2, atol=2e-4, rtol=1e-3)

    seg = run(cp_mesh=mesh, cfgr_cfg=r2_cfg, segment_steps=2)
    np.testing.assert_allclose(seg, r2_cp, atol=1e-5, rtol=1e-5)
