"""Flash-attention kernel vs jnp reference: fwd, bwd, cond-prefix mask,
KV-cache decode consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longcat_video_tta_tpu.ops.attention import attention_xla
from longcat_video_tta_tpu.ops.flash_attention import flash_attention


def _rand_qkv(key, B=2, S=256, H=2, D=64, Sk=None, dtype=jnp.float32):
    Sk = S if Sk is None else Sk
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, S, H, D), dtype)
    k = jax.random.normal(kk, (B, Sk, H, D), dtype)
    v = jax.random.normal(kv, (B, Sk, H, D), dtype)
    return q, k, v


@pytest.mark.parametrize("ncond", [0, 64, 100])
def test_flash_fwd_matches_reference(ncond):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0))
    ref = attention_xla(q, k, v, num_cond_tokens=ncond)
    out = flash_attention(q, k, v, num_cond_tokens=ncond, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_fwd_unaligned_seq_and_padding():
    # S not a multiple of the block size; kernel must mask padded keys.
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), S=200, Sk=200)
    ref = attention_xla(q, k, v, num_cond_tokens=37)
    out = flash_attention(q, k, v, num_cond_tokens=37, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_cross_attention_kv_valid_len():
    # Cross-attn: Sq != Sk, with trailing key padding masked via kv_valid_len.
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), S=128, Sk=256)
    ref = attention_xla(q, k, v, kv_valid_len=180)
    out = flash_attention(q, k, v, kv_valid_len=180, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("ncond", [0, 64])
def test_flash_bwd_matches_reference(ncond):
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), B=1, S=128, H=2, D=32)

    def loss_ref(q, k, v):
        return jnp.sum(attention_xla(q, k, v, num_cond_tokens=ncond) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, num_cond_tokens=ncond, interpret=True) ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4)


def test_cond_prefix_enables_exact_kv_cache():
    """The conditioning prefix must be independent of noise tokens: attention
    output on cond rows is unchanged when noise tokens change, and the decode
    path (noise-only queries vs full [cond|noise] keys) matches the full
    no-cache forward on the noise rows. This is the property that makes
    generate_vc's use_kv_cache exact (reference: common.py:606-608)."""
    key = jax.random.PRNGKey(4)
    B, S, H, D = 1, 128, 2, 32
    ncond = 48
    q, k, v = _rand_qkv(key, B=B, S=S, H=H, D=D)

    full = attention_xla(q, k, v, num_cond_tokens=ncond)

    # Perturb noise-region tokens: cond rows must not change.
    q2 = q.at[:, ncond:].add(1.0)
    k2 = k.at[:, ncond:].add(1.0)
    v2 = v.at[:, ncond:].add(1.0)
    full2 = attention_xla(q2, k2, v2, num_cond_tokens=ncond)
    np.testing.assert_allclose(
        np.asarray(full[:, :ncond]), np.asarray(full2[:, :ncond]), atol=1e-6
    )

    # Decode path: noise queries against all keys == full forward noise rows.
    dec = attention_xla(q[:, ncond:], k, v, num_cond_tokens=ncond)
    np.testing.assert_allclose(
        np.asarray(full[:, ncond:]), np.asarray(dec), atol=1e-6
    )

    # Same property through the pallas kernel.
    dec_flash = flash_attention(q[:, ncond:], k, v, num_cond_tokens=ncond,
                                interpret=True)
    np.testing.assert_allclose(
        np.asarray(dec_flash), np.asarray(dec), atol=2e-5, rtol=2e-5
    )


def test_flash_chunk_fwd_offsets_match_jnp():
    """Ring chunk kernel with traced global offsets == jnp chunk oracle
    (the conditioning prefix crosses the chunk boundary)."""
    from longcat_video_tta_tpu.ops.flash_attention import flash_chunk_fwd
    from longcat_video_tta_tpu.parallel.context_attention import (
        _xla_chunk_fwd,
    )

    q, k, v = _rand_qkv(jax.random.PRNGKey(5), B=1, S=64, H=2, D=32, Sk=64)
    ncond, scale = 96, 32 ** -0.5
    for q_off, k_off in ((0, 64), (64, 0), (128, 64)):
        ref_o, ref_lse = _xla_chunk_fwd(q, k, v, q_off, k_off, ncond, scale)
        o, lse = flash_chunk_fwd(q, k, v, q_off, k_off,
                                 num_cond_tokens=ncond, scale=scale,
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref_o),
                                   atol=2e-5, rtol=2e-5,
                                   err_msg=f"o off=({q_off},{k_off})")
        np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                                   atol=2e-5, rtol=2e-5,
                                   err_msg=f"lse off=({q_off},{k_off})")


def test_flash_chunk_bwd_offsets_match_jnp():
    from longcat_video_tta_tpu.ops.flash_attention import (
        flash_chunk_dkv, flash_chunk_dq, flash_chunk_fwd,
    )
    from longcat_video_tta_tpu.parallel.context_attention import (
        _xla_chunk_dkv, _xla_chunk_dq, _xla_chunk_fwd,
    )

    q, k, v = _rand_qkv(jax.random.PRNGKey(6), B=1, S=64, H=2, D=32, Sk=64)
    do = jax.random.normal(jax.random.PRNGKey(7), q.shape, q.dtype)
    ncond, scale, q_off, k_off = 96, 32 ** -0.5, 64, 64
    o, lse = _xla_chunk_fwd(q, k, v, q_off, k_off, ncond, scale)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), -1)

    ref_dq = _xla_chunk_dq(q, k, v, do, lse, delta, q_off, k_off, ncond,
                           scale)
    dq = flash_chunk_dq(q, k, v, do, lse, delta, q_off, k_off,
                        num_cond_tokens=ncond, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(ref_dq),
                               atol=5e-5, rtol=5e-5)

    ref_dk, ref_dv = _xla_chunk_dkv(q, k, v, do, lse, delta, q_off, k_off,
                                    ncond, scale)
    dk, dv = flash_chunk_dkv(q, k, v, do, lse, delta, q_off, k_off,
                             num_cond_tokens=ncond, scale=scale,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(ref_dk),
                               atol=5e-5, rtol=5e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(ref_dv),
                               atol=5e-5, rtol=5e-5)


def test_flash_dynamic_kv_valid_len_fwd_and_bwd():
    """Traced kv_valid_len (shape bucketing): one compile serves every
    valid length; valid-query rows must match the static-mask oracle in
    fwd AND grad. Pad-query rows are garbage by contract — only their
    gradient contribution must vanish (do=0 rows)."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(7), B=1, S=192, H=2, D=32)

    @jax.jit
    def fwd(q, k, v, valid):
        return flash_attention(q, k, v, num_cond_tokens=64,
                               kv_valid_len=valid, interpret=True)

    for valid in (192, 160, 100):
        ref = attention_xla(q, k, v, num_cond_tokens=64,
                            kv_valid_len=valid)
        out = fwd(q, k, v, jnp.int32(valid))
        np.testing.assert_allclose(np.asarray(out)[:, :valid],
                                   np.asarray(ref)[:, :valid],
                                   atol=2e-5, rtol=2e-5)
    assert fwd._cache_size() == 1

    valid = 100
    w = jnp.zeros((1, 192, 2, 32)).at[:, :valid].set(1.0)

    def loss_ref(q, k, v):
        o = attention_xla(q, k, v, num_cond_tokens=64, kv_valid_len=valid)
        return jnp.sum((o * w) ** 2)

    def loss_dyn(q, k, v):
        o = flash_attention(q, k, v, num_cond_tokens=64,
                            kv_valid_len=jnp.int32(valid), interpret=True)
        return jnp.sum((o * w) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_dyn = jax.grad(loss_dyn, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_dyn, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_flash_grad_under_dots_attn_remat_policy():
    """remat policy "dots_attn" (ops/layers.py) saves the named
    flash_out/flash_lse residuals; gradients through a checkpointed
    body must match the un-rematerialized gradient exactly."""
    from longcat_video_tta_tpu.ops.layers import remat_wrap

    q, k, v = _rand_qkv(jax.random.PRNGKey(7), B=1, S=128, H=2, D=32)

    def body(q, k, v):
        o = flash_attention(q, k, v, num_cond_tokens=32, interpret=True)
        return jnp.tanh(o) * o

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v) ** 2)

    g_plain = jax.grad(lambda *a: loss(body, *a), argnums=(0, 1, 2))(q, k, v)
    for policy in ("full", "dots", "dots_attn"):
        wrapped = remat_wrap(body, True, policy)
        g = jax.grad(lambda *a: loss(wrapped, *a), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, g_plain):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)
