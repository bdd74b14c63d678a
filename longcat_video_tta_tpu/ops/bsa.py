"""Block-sparse attention (BSA) for the decode hot loop.

The reference pipeline's generation path runs LongCat's BSA —
block-sparse attention over the video token grid — alongside the KV
cache (mentioned at run_delta_a.py:118-120, run_delta_c.py:124; the
implementation lives in the unvendored LongCat-Video repo). This is the
TPU-native design:

1. **Selection (XLA):** mean-pool Q and K into blocks of ``block_q`` /
   ``block_k`` tokens; score every (q-block, k-block) pair with the
   pooled dot product; force-keep the conditioning-prefix blocks (the
   cond KV cache stays EXACT — only noise-token interactions are
   sparsified) and each query block's own block; take top-k per q-block.
2. **Compute (Pallas):** flash-attention kernel whose K/V BlockSpecs
   gather the selected blocks via a scalar-prefetched index array — the
   grid iterates (batch*heads, q_blocks, top_k) and only touches
   selected tiles, so FLOPs and HBM reads scale with ``keep_ratio``
   rather than S².

Exactness contract (tested in tests/test_bsa.py): with ``top_k`` = all
k-blocks, BSA == dense flash attention; with fewer blocks it equals the
dense oracle over the same selection mask (selection is deterministic).

Forward-only: generation runs under ``lax.scan`` with no gradients.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import NEG_INF
from .flash_attention import _needs_head_split, _pack_merged, _split_heads


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Selection
# ---------------------------------------------------------------------------


def select_blocks(
    q: jnp.ndarray,              # [B, Sq, H, D]
    k: jnp.ndarray,              # [B, Sk, H, D]
    *,
    block_q: int,
    block_k: int,
    top_k: int,
    num_cond_tokens: int = 0,
    q_token_offset: int = 0,
    kv_valid=None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """-> int32 [B*H, nQb, top_k] selected k-block indices (sorted).

    ``kv_valid``: optional traced valid-key count (bucketing) — k-blocks
    that start at or beyond the bound are scored NEG so they are never
    selected over a valid block (applied after force-keep: cond blocks
    are always valid; a pad q-block's forced diagonal gets demoted,
    which is harmless since its outputs are discarded).

    Pooled-similarity scoring with force-kept cond-prefix blocks and the
    diagonal block (each query's own neighborhood). ``q_token_offset``
    is the global position of q[0] (decode: n_cond_tokens)."""
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    nQb = _round_up(Sq, block_q) // block_q
    nKb = _round_up(Sk, block_k) // block_k
    if top_k > nKb:
        raise ValueError(f"top_k {top_k} > {nKb} k-blocks")

    def pool(x, bs, nb):
        S = x.shape[1]
        pad = nb * bs - S
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        # mean over real tokens only. The block sum runs in a Pallas
        # kernel: XLA lowers this [B, nb, bs, H, D] middle-axis
        # reduction at ~40 GB/s effective (measured — selection was
        # 7.9 ms of the 23.9 ms BSA call at decode shapes, ~1/3 of the
        # whole call across 16 layers x 50 steps)
        cnt = jnp.minimum(
            jnp.maximum(S - jnp.arange(nb) * bs, 0), bs).astype(jnp.float32)
        itp = (jax.default_backend() != "tpu" if interpret is None
               else interpret)
        xb = _block_sum(x, bs, interpret=itp)
        return xb / jnp.maximum(cnt, 1.0)[None, :, None, None]

    qb = pool(q, block_q, nQb)   # [B, nQb, H, D]
    kb = pool(k, block_k, nKb)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qb, kb)  # [B, H, nQb, nKb]

    kb_idx = jnp.arange(nKb)
    big = jnp.float32(3e38)
    # force-keep conditioning blocks (exact cond attention)
    n_cond_blocks = -(-num_cond_tokens // block_k) if num_cond_tokens else 0
    keep = kb_idx < n_cond_blocks
    # force-keep each q-block's own (diagonal) block
    q_starts = q_token_offset + jnp.arange(nQb) * block_q
    diag = q_starts // block_k                        # [nQb]
    keep_qk = keep[None, :] | (kb_idx[None, :] == diag[:, None])  # [nQb,nKb]
    scores = jnp.where(keep_qk[None, None], big, scores)
    if kv_valid is not None:
        invalid = (kb_idx * block_k) >= kv_valid      # fully-invalid blocks
        scores = jnp.where(invalid[None, None, None], -big, scores)

    _, idx = jax.lax.top_k(scores, top_k)             # [B, H, nQb, top_k]
    idx = jnp.sort(idx, axis=-1)
    return idx.reshape(B * H, nQb, top_k).astype(jnp.int32)


def _block_sum_kernel(x_ref, o_ref):
    o_ref[0, 0] = jnp.sum(x_ref[0].astype(jnp.float32), axis=0)


def _block_sum(x: jnp.ndarray, bs: int, interpret: bool = False):
    """[B, nb*bs, H, D] -> f32 [B, nb, H, D] block sums over the token
    axis, streamed through VMEM at HBM bandwidth (one (b, block) grid
    step reads one [bs, H, D] tile and writes its [H, D] sum)."""
    B, S, H, D = x.shape
    nb = S // bs
    return pl.pallas_call(
        _block_sum_kernel,
        grid=(B, nb),
        in_specs=[pl.BlockSpec((1, bs, H, D), lambda b, i: (b, i, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, H, D), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, nb, H, D), jnp.float32),
        interpret=interpret,
    )(x)


def _quantize_tokens(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, S, H, D] -> (int8 [B, S, H, D], f32 per-(token,head) scale
    [B, S, H, 1]).

    Symmetric per-token abs-max quantization (same recipe as the W8A8
    activation quant in ops/quant.py). Padded rows are all-zero and get
    the 1e-8 floor scale — they quantize to 0 and stay masked."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0,
                    1e-8)
    xi = jnp.round(xf / s).astype(jnp.int8)
    return xi, s


# ---------------------------------------------------------------------------
# Pallas gather-flash kernel
# ---------------------------------------------------------------------------


def _bsa_kernel(idx_ref, meta_ref, q_ref, k_ref, v_ref, *rest,
                scale: float, bq: int, bk: int, sk: int,
                dyn_kvlen: bool = False, qk_int8: bool = False):
    if qk_int8:
        qs_ref, ks_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    if qk_int8:
        # int8 x int8 -> int32 QK^T on the MXU (2x bf16 peak); exact
        # rescale by the per-token scales, so the only error is the
        # 8-bit rounding of q and k (SageAttention-style)
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        s = s * (qs_ref[0, 0] * scale) * ks_ref[0, 0]  # [bq,1] * [1,bk]
    else:
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [bq, bk]

    # mask padded keys of the final (ragged) k block — and, under shape
    # bucketing, keys at global index >= the traced valid bound
    blk = idx_ref[pl.program_id(0), pl.program_id(1), ki]
    k_glob = blk * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    bound = jnp.minimum(sk, meta_ref[0, 0]) if dyn_kvlen else sk
    allowed = k_glob < bound
    s = jnp.where(allowed, s, NEG_INF)

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    if qk_int8:
        # reduced-precision decode mode: bf16 exp and bf16 P straight
        # into the PV matmul — halves the VPU softmax passes that
        # co-bound this kernel with the MXU. No second mask needed:
        # masked s is NEG_INF, and exp(NEG_INF - m) is exactly 0 in
        # bf16; a row that has seen no allowed key yet (s - m = 0 ->
        # p = 1 garbage) self-corrects at the next allowed tile via
        # alpha = exp(NEG_INF - m_real) = 0, and rows that never see
        # one are padded rows whose outputs are sliced away.
        p = jnp.exp((s - m_new).astype(jnp.bfloat16))
        l_new = alpha * l_prev + jnp.sum(
            p, axis=-1, keepdims=True, dtype=jnp.float32)
    else:
        p = jnp.where(allowed, jnp.exp(s - m_new), 0.0)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


def bsa_attention(
    q: jnp.ndarray,              # [B, Sq, H, D]
    k: jnp.ndarray,              # [B, Sk, H, D]
    v: jnp.ndarray,
    *,
    top_k: int,
    block_q: int = 512,
    block_k: int = 512,
    num_cond_tokens: int = 0,
    q_token_offset: Optional[int] = None,
    scale: Optional[float] = None,
    interpret: bool = False,
    kv_valid=None,
    qk_int8: bool = False,
) -> jnp.ndarray:
    """Block-sparse attention: dense per-block top-k selection + gathered
    flash compute. Decode semantics: queries are noise tokens (attend-
    anywhere); conditioning-prefix key blocks are always kept exact.

    When Sq == Sk (no-cache path) the cond-prefix query rule is NOT
    applied — BSA is a decode-path optimization; use flash_attention for
    training.

    ``kv_valid``: optional traced valid-key count (gen-horizon
    bucketing): invalid blocks are never selected and the kernel masks
    keys at global index >= the bound, so BSA composes with
    ``--bucket-gen``.

    ``qk_int8``: quantize q/k to int8 with per-token scales and run
    QK^T as int8 x int8 -> int32 on the MXU (2x bf16 peak on v5e/v5p;
    --quantize-decode int8qk). Selection still scores the original
    tensors; PV stays bf16 (P is softmax-normalized — quantizing it
    costs more fidelity per FLOP saved than QK).
    """
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    if scale is None:
        scale = D ** -0.5
    if _needs_head_split(H, D):
        # Mosaic: [tile, D] blocks along the merged H*D axis need D to
        # be a lane multiple (128); sub-128 head_dim folds heads into
        # batch instead so D is the FULL last dim (always legal) —
        # same fallback as ops/flash_attention's public entries.
        o = bsa_attention(
            _split_heads(q), _split_heads(k), _split_heads(v),
            num_cond_tokens=num_cond_tokens,
            top_k=top_k, block_q=block_q, block_k=block_k, scale=scale,
            q_token_offset=q_token_offset, kv_valid=kv_valid,
            qk_int8=qk_int8, interpret=interpret)
        return o.reshape(B, H, Sq, D).transpose(0, 2, 1, 3)
    if q_token_offset is None:
        q_token_offset = Sk - Sq  # decode: queries follow the cache

    # The forced-keep set (cond-prefix blocks + each q-block's diagonal)
    # must fit in top_k, or top-k tie-breaking silently drops the
    # diagonal / trailing cond blocks and the "cond stays exact"
    # contract breaks. Clamp up — keep_ratio is a floor, not a cap.
    nKb = _round_up(Sk, block_k) // block_k
    n_cond_blocks = -(-num_cond_tokens // block_k) if num_cond_tokens else 0
    top_k = min(nKb, max(top_k, n_cond_blocks + 1))

    idx = select_blocks(q, k, block_q=block_q, block_k=block_k,
                        top_k=top_k, num_cond_tokens=num_cond_tokens,
                        q_token_offset=q_token_offset, kv_valid=kv_valid,
                        interpret=interpret or None)

    bq = min(block_q, _round_up(Sq, 8))
    bk = min(block_k, _round_up(Sk, 8))
    sq_pad = _round_up(Sq, bq)
    sk_pad = _round_up(Sk, bk)

    # Transpose-free layout: [B, S, H, D] row-major is bit-identical to
    # [B, S, H*D], and the h-th D-wide slice of the merged last axis is
    # head h — so the kernel gathers per-head [bq/bk, D] tiles by BLOCK
    # INDEX along the merged axis instead of paying four materialized
    # [B,S,H,D]<->[BH,S,D] transposes (q/k/v in + o out, ~2x the
    # operand bytes at decode shapes). The output lands directly in the
    # [B, Sq, H*D] layout the following proj matmul consumes.
    merge = _pack_merged

    if qk_int8:
        # quantize in 4-D (per-token-per-head scales), then merge; the
        # tiny scale tensors go heads-first so their last-2 block dims
        # stay Mosaic-legal ((bq,1) / (1,bk))
        (qi, q_s), (ki, k_s) = _quantize_tokens(q), _quantize_tokens(k)
        q3, k3 = merge(qi, sq_pad), merge(ki, sk_pad)
        qs = jnp.transpose(q_s, (0, 2, 1, 3))          # [B, H, Sq, 1]
        if sq_pad > Sq:
            qs = jnp.pad(qs, ((0, 0), (0, 0), (0, sq_pad - Sq), (0, 0)),
                         constant_values=1e-8)
        ks = jnp.transpose(k_s, (0, 2, 3, 1))          # [B, H, 1, Sk]
        if sk_pad > Sk:
            ks = jnp.pad(ks, ((0, 0), (0, 0), (0, 0), (0, sk_pad - Sk)),
                         constant_values=1e-8)
    else:
        q3, k3 = merge(q, sq_pad), merge(k, sk_pad)
    v3 = merge(v, sk_pad)
    BH = B * H
    nQb = sq_pad // bq

    inputs = [q3, k3, v3]
    in_specs = [
        pl.BlockSpec((1, bq, D),
                     lambda b, i, j, idx, meta: (b // H, i, b % H)),
        pl.BlockSpec((1, bk, D),
                     lambda b, i, j, idx, meta: (b // H, idx[b, i, j],
                                                 b % H)),
        pl.BlockSpec((1, bk, D),
                     lambda b, i, j, idx, meta: (b // H, idx[b, i, j],
                                                 b % H)),
    ]
    if qk_int8:
        inputs = inputs + [qs, ks]
        in_specs = in_specs + [
            pl.BlockSpec((1, 1, bq, 1),
                         lambda b, i, j, idx, meta: (b // H, b % H, i, 0)),
            pl.BlockSpec((1, 1, 1, bk),
                         lambda b, i, j, idx, meta: (b // H, b % H, 0,
                                                     idx[b, i, j])),
        ]

    grid = (BH, nQb, top_k)
    dyn = kv_valid is not None
    kernel = functools.partial(_bsa_kernel, scale=float(scale), bq=bq,
                               bk=bk, sk=Sk, dyn_kvlen=dyn,
                               qk_int8=qk_int8)
    meta = jnp.reshape(
        jnp.asarray(kv_valid if dyn else 0, jnp.int32), (1, 1))
    o = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, bq, D),
                lambda b, i, j, idx, meta: (b // H, i, b % H)),
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, sq_pad, H * D), v.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(idx, meta, *inputs)
    return o[:, :Sq].reshape(B, Sq, H, D)


def bsa_reference(q, k, v, idx, *, block_q: int, block_k: int,
                  scale: Optional[float] = None) -> jnp.ndarray:
    """Dense jnp oracle: full attention with non-selected k-blocks masked
    out (the semantics the kernel must match exactly)."""
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    if scale is None:
        scale = D ** -0.5
    nQb = _round_up(Sq, block_q) // block_q
    nKb = _round_up(Sk, block_k) // block_k
    sel = jnp.zeros((B * H, nQb, nKb), bool)
    sel = sel.at[
        jnp.arange(B * H)[:, None, None],
        jnp.arange(nQb)[None, :, None],
        idx,
    ].set(True)
    sel = sel.reshape(B, H, nQb, nKb)
    # expand to token resolution
    tok = jnp.repeat(jnp.repeat(sel, block_q, axis=2), block_k, axis=3)
    tok = tok[:, :, :Sq, :Sk]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    logits = jnp.where(tok, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs,
                      v.astype(jnp.float32)).astype(q.dtype)
