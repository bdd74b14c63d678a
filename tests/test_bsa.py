"""Block-sparse attention: kernel vs dense-masked oracle, full-selection
exactness vs plain attention, forced cond/diagonal blocks."""

import jax
import jax.numpy as jnp
import numpy as np

from longcat_video_tta_tpu.ops.attention import attention_xla
from longcat_video_tta_tpu.ops.bsa import (
    bsa_attention,
    bsa_reference,
    select_blocks,
)


def _qkv(key, B=1, Sq=96, Sk=160, H=2, D=32):
    kq, kk, kv = jax.random.split(key, 3)
    return (jax.random.normal(kq, (B, Sq, H, D)),
            jax.random.normal(kk, (B, Sk, H, D)),
            jax.random.normal(kv, (B, Sk, H, D)))


def test_full_topk_equals_dense():
    q, k, v = _qkv(jax.random.PRNGKey(0))
    out = bsa_attention(q, k, v, top_k=5, block_q=32, block_k=32,
                        interpret=True)  # 160/32 = 5 blocks = all
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_sparse_matches_masked_oracle():
    q, k, v = _qkv(jax.random.PRNGKey(1))
    idx = select_blocks(q, k, block_q=32, block_k=32, top_k=3,
                        num_cond_tokens=32, q_token_offset=64)
    out = bsa_attention(q, k, v, top_k=3, block_q=32, block_k=32,
                        num_cond_tokens=32, q_token_offset=64,
                        interpret=True)
    ref = bsa_reference(q, k, v, idx, block_q=32, block_k=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_selection_forces_cond_and_diagonal():
    q, k, v = _qkv(jax.random.PRNGKey(2), Sq=64, Sk=192)
    # cond prefix = 64 tokens = blocks 0,1 with block_k=32
    idx = select_blocks(q, k, block_q=32, block_k=32, top_k=4,
                        num_cond_tokens=64, q_token_offset=128)
    idx = np.asarray(idx)  # [BH, nQb=2, 4]
    for bh in range(idx.shape[0]):
        for qi in range(idx.shape[1]):
            sel = set(idx[bh, qi].tolist())
            assert {0, 1} <= sel, f"cond blocks missing: {sel}"
            diag = (128 + qi * 32) // 32
            assert diag in sel, f"diagonal block {diag} missing: {sel}"


def test_ragged_tail_block_masked():
    # Sk not a multiple of block_k: padded keys of the last block must
    # not contribute
    q, k, v = _qkv(jax.random.PRNGKey(3), Sq=64, Sk=150)
    out = bsa_attention(q, k, v, top_k=5, block_q=32, block_k=32,
                        interpret=True)  # all 5 blocks -> dense
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_sampler_bsa_full_keep_equals_dense():
    """sample_latents with keep_ratio=1.0 BSA must bit-match the dense
    KV-cache decode (all blocks selected; selection is order-preserving)."""
    from longcat_video_tta_tpu.config import BSAConfig, longcat_tiny
    from longcat_video_tta_tpu.models.dit import init_dit
    from longcat_video_tta_tpu.pipeline.sampler import sample_latents

    cfg = longcat_tiny()
    params = init_dit(jax.random.PRNGKey(0), cfg.dit, zero_init=False)
    B, L = 1, cfg.dit.text_len
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, L, cfg.dit.text_dim))
    mask = jnp.ones((B, L), jnp.int32)
    cond = jax.random.normal(jax.random.PRNGKey(2),
                             (B, cfg.dit.in_channels, 2, 8, 12))
    common = dict(num_gen_latents=2, num_steps=2, lat_h=8, lat_w=12,
                  cond_latents=cond, use_kv_cache=True)
    dense = sample_latents(params, cfg.dit, cfg.scheduler,
                           jax.random.PRNGKey(3), emb, mask, emb, mask,
                           4.0, **common)
    bsa = sample_latents(params, cfg.dit, cfg.scheduler,
                         jax.random.PRNGKey(3), emb, mask, emb, mask,
                         4.0, bsa_cfg=BSAConfig(keep_ratio=1.0, block_q=32,
                                                block_k=32, min_blocks=1),
                         **common)
    np.testing.assert_allclose(np.asarray(bsa), np.asarray(dense),
                               atol=2e-5, rtol=2e-5)


def test_top_k_clamped_to_forced_set():
    """When the forced-keep set (cond blocks + diagonal) exceeds the
    requested top_k, bsa_attention must clamp top_k up rather than let
    tie-breaking silently drop the diagonal (the default 480p decode
    geometry hits this: 7 cond blocks + diag > ceil(19*0.35)=7)."""
    # cond prefix 128 tokens = 4 blocks of 32; forced set = 4 cond + 1
    # diagonal = 5 > requested top_k=2
    q, k, v = _qkv(jax.random.PRNGKey(4), Sq=64, Sk=192)
    out = bsa_attention(q, k, v, top_k=2, block_q=32, block_k=32,
                        num_cond_tokens=128, q_token_offset=128,
                        interpret=True)
    idx = select_blocks(q, k, block_q=32, block_k=32, top_k=5,
                        num_cond_tokens=128, q_token_offset=128)
    idx_np = np.asarray(idx)
    for bh in range(idx_np.shape[0]):
        for qi in range(idx_np.shape[1]):
            sel = set(idx_np[bh, qi].tolist())
            assert {0, 1, 2, 3} <= sel
            assert (128 + qi * 32) // 32 in sel
    ref = bsa_reference(q, k, v, idx, block_q=32, block_k=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_bsa_kv_valid_masks_invalid_keys():
    """BSA + bucketing: with full keep, bucketed BSA over padded keys
    equals dense attention over the valid slice (selection never picks
    fully-invalid blocks; the kernel masks the boundary tail)."""
    q, k, v = _qkv(jax.random.PRNGKey(5), Sq=64, Sk=192)
    valid = 150  # blocks 0..4 (4 partial), block 5 fully invalid
    out = bsa_attention(q, k, v, top_k=6, block_q=32, block_k=32,
                        num_cond_tokens=64, q_token_offset=128,
                        kv_valid=jnp.int32(valid), interpret=True)
    ref = attention_xla(q, k[:, :valid], v[:, :valid])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_bsa_selection_skips_invalid_blocks():
    q, k, v = _qkv(jax.random.PRNGKey(6), Sq=64, Sk=192)
    idx = select_blocks(q, k, block_q=32, block_k=32, top_k=3,
                        num_cond_tokens=32, q_token_offset=128,
                        kv_valid=jnp.int32(96))  # blocks 3,4,5 invalid
    idx_np = np.asarray(idx)
    # valid q-block 0 (tokens 128..160 > valid — but its selection must
    # still avoid invalid K blocks beyond index 2)
    for bh in range(idx_np.shape[0]):
        sel = set(idx_np[bh, 0].tolist())
        assert sel <= {0, 1, 2, 4}, sel  # 4 = forced diagonal of q-block 0
        assert 0 in sel  # cond block always kept


def test_generate_vc_bucket_gen_with_bsa(tmp_path):
    """bucket_gen composes with bsa_cfg end-to-end."""
    from longcat_video_tta_tpu.config import BSAConfig, longcat_tiny
    from longcat_video_tta_tpu.pipeline.pipeline import (
        ModelBundle, generate_vc,
    )

    bundle = ModelBundle.init_random(longcat_tiny(), seed=0)
    cond = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 5, 16, 32),
                              minval=-1.0, maxval=1.0)
    out = generate_vc(bundle, cond, "p", num_frames=9,
                      num_inference_steps=2, seed=0, attn_impl="xla",
                      bucket_gen=True,
                      bsa_cfg=BSAConfig(keep_ratio=0.9, block_q=8,
                                        block_k=8, min_blocks=1))
    assert out.shape[0] == 9 and np.all(np.isfinite(out))


def test_qk_int8_close_to_bf16():
    """int8 QK^T (per-token scales) tracks the bf16 kernel closely —
    the only error source is the 8-bit rounding of q and k
    (--quantize-decode int8qk)."""
    q, k, v = _qkv(jax.random.PRNGKey(7))
    ref = bsa_attention(q, k, v, top_k=5, block_q=32, block_k=32,
                        interpret=True)
    out = bsa_attention(q, k, v, top_k=5, block_q=32, block_k=32,
                        interpret=True, qk_int8=True)
    ref, out = np.asarray(ref, np.float64), np.asarray(out, np.float64)
    corr = np.corrcoef(ref.ravel(), out.ravel())[0, 1]
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert corr > 0.999, corr
    assert rel < 0.05, rel


def test_qk_int8_composes_with_sparsity_and_kv_valid():
    q, k, v = _qkv(jax.random.PRNGKey(8))
    ref = bsa_attention(q, k, v, top_k=3, block_q=32, block_k=32,
                        num_cond_tokens=32, q_token_offset=64,
                        kv_valid=jnp.int32(150), interpret=True)
    out = bsa_attention(q, k, v, top_k=3, block_q=32, block_k=32,
                        num_cond_tokens=32, q_token_offset=64,
                        kv_valid=jnp.int32(150), interpret=True,
                        qk_int8=True)
    corr = np.corrcoef(np.asarray(ref, np.float64).ravel(),
                       np.asarray(out, np.float64).ravel())[0, 1]
    assert corr > 0.999, corr
