"""Pallas TPU flash attention with LongCat conditioning-prefix semantics.

Replaces the reference's flash-attn-2 CUDA kernels (SURVEY.md §2.9;
enabled at common.py:71-74). Forward + backward (custom VJP), online
softmax, fp32 accumulation, bf16-friendly 128x128 tiles feeding the MXU.

Masking rule (see ops/attention.py): with a conditioning prefix of
``num_cond_tokens``, queries in the noise region attend to all keys;
queries in the conditioning prefix attend only within the prefix. The
mask is only materialized for (q-block, k-block) tiles that straddle the
boundary — everything is static-specialized on ``num_cond_tokens`` so the
common cases (cross-attn, KV-cache decode) carry zero masking overhead.

Layout: public API [B, S, H, D]; operands reach the kernels as merged
[B, S, H*D] (a free row-major bitcast of the projection output) with
per-head [tile, D] blocks addressed by BLOCK INDEX along the merged
axis — no [B,S,H,D]<->[B*H,S,D] transposes are materialized on either
side of the kernels. lse/delta ride in a tiny [B*H, 1, S] row layout.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import NEG_INF


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _needs_head_split(H: int, D: int) -> bool:
    """Mosaic requires a block's last dim to be a lane multiple (128) OR
    the full array dim. The merged-head layout addresses [tile, D]
    blocks along an H*D axis, so sub-128 head_dim (CogVideoX's 64, the
    tiny test presets) must instead fold heads into batch — then D IS
    the full last dim and any width is legal (the pre-merge layout)."""
    return D % 128 != 0 and H > 1


def _split_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, S, H, D] -> [B*H, S, 1, D] (heads folded into batch)."""
    B, S, H, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B * H, S, 1, D)


def _unsplit_heads(x: jnp.ndarray, B: int, H: int) -> jnp.ndarray:
    """[B*H, S, 1, D] -> [B, S, H, D]."""
    _, S, _, D = x.shape
    return x.reshape(B, H, S, D).transpose(0, 2, 1, 3)


def _split_rows(x: jnp.ndarray) -> jnp.ndarray:
    """[B, S, H] fp32 rows (lse/delta) -> [B*H, S, 1]."""
    B, S, H = x.shape
    return x.transpose(0, 2, 1).reshape(B * H, S, 1)


def _mask_tile(q_off, k_off, bq: int, bk: int, ncond: int, kvlen: int,
               sk_pad: int, q_glob=0, k_glob=0, kv_dyn=None):
    """Boolean allowed-mask [bq, bk] for one tile, or None if all-allowed.

    ``q_off``/``k_off`` are dynamic tile offsets (local); ``q_glob``/
    ``k_glob`` are dynamic *global* sequence offsets (ring context
    parallelism — each device's shard starts at a traced global index).
    ``ncond``/``kvlen`` are static; the prefix rule uses global indices,
    the padded-key rule uses local ones. ``kv_dyn``, when given, is a
    *traced* valid-key count over GLOBAL key indices (shape bucketing:
    one compile serves every geometry in a bucket — composes with ring
    CP, where the bucket's pad tail lives on the last shard(s)). Returns
    None (python-level) only when statically all-allowed."""
    need_cond = ncond > 0
    need_pad = (kvlen < sk_pad) or (kv_dyn is not None)
    if not need_cond and not need_pad:
        return None
    q_loc = q_off + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    k_loc = k_off + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    allowed = jnp.ones((bq, bk), dtype=jnp.bool_)
    if need_cond:
        allowed = ((q_glob + q_loc) >= ncond) | ((k_glob + k_loc) < ncond)
    if need_pad:
        if kv_dyn is None:
            allowed = allowed & (k_loc < kvlen)
        else:
            allowed = allowed & ((k_glob + k_loc) < kv_dyn)
            if kvlen < sk_pad:
                # chunk-local tile padding is independent of the global
                # valid bound (ring: this chunk may sit entirely below it)
                allowed = allowed & (k_loc < kvlen)
    return allowed


def _tile_fully_masked(q_off, k_off, bq: int, bk: int, ncond: int,
                       kvlen: int, sk_pad: int, q_glob=0, k_glob=0,
                       kv_dyn=None):
    """Traced scalar bool: True when the [bq, bk] tile is ENTIRELY
    disallowed under _mask_tile's rules, so the kernel can skip its
    dots outright (exact: a fully-masked tile contributes p=0 to the
    online softmax and zeros to every backward accumulator). At the
    canonical train window (cond 2/3 of rows, noise 1/3 of keys) the
    cond-query x noise-key region is ~22% of the matrix. Returns None
    when statically never skippable (e.g. the decode path, which
    passes ncond=0)."""
    terms = []
    if ncond > 0:
        # tile rows all conditioning AND tile keys all noise
        terms.append(((q_glob + q_off + bq) <= ncond)
                     & ((k_glob + k_off) >= ncond))
    if kvlen < sk_pad:
        terms.append(k_off >= kvlen)  # tile keys all in the pad tail
    if kv_dyn is not None:
        terms.append((k_glob + k_off) >= kv_dyn)
    if not terms:
        return None
    skip = terms[0]
    for t in terms[1:]:
        skip = skip | t
    return skip


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(offs_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr,
                *, scale: float, ncond: int, kvlen: int, sk_pad: int,
                bq: int, bk: int, dyn_kvlen: bool = False):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    kv_dyn = offs_ref[0, 2] if dyn_kvlen else None
    skip = _tile_fully_masked(qi * bq, ki * bk, bq, bk, ncond, kvlen,
                              sk_pad, q_glob=offs_ref[0, 0],
                              k_glob=offs_ref[0, 1], kv_dyn=kv_dyn)

    def _tile_body():
        q = q_ref[0]  # [bq, D]
        k = k_ref[0]  # [bk, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [bq, bk]

        allowed = _mask_tile(qi * bq, ki * bk, bq, bk, ncond, kvlen,
                             sk_pad, q_glob=offs_ref[0, 0],
                             k_glob=offs_ref[0, 1], kv_dyn=kv_dyn)
        if allowed is not None:
            s = jnp.where(allowed, s, NEG_INF)

        m_prev = m_scr[:, :1]  # [bq, 1]
        l_prev = l_scr[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        if allowed is not None:
            p = jnp.where(allowed, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)  # [bq, 1]
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

        acc = acc_scr[...]
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    if skip is None:
        _tile_body()
    else:
        # a fully-masked tile is an exact no-op for the online softmax
        # (p = 0, m/l/acc unchanged) — skip both dots entirely
        pl.when(jnp.logical_not(skip))(_tile_body)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)
        lse = m_scr[:, :1] + jnp.log(l_safe)  # [bq, 1]
        lse_ref[0] = lse.reshape(1, -1)  # column -> row relayout


def _flash_fwd_impl(q, k, v, ncond: int, kvlen: int, scale: float,
                    bq: int, bk: int, interpret: bool, offs=None,
                    dyn_kvlen: bool = False, nh: int = 1):
    """q: [B, Sq, nh*D] (padded, merged heads); k, v: [B, Sk, nh*D].
    Returns (o [B, Sq, nh*D], lse [B*nh, 1, Sq]).

    Merged-head layout: [B, S, H, D] row-major is bit-identical to
    [B, S, H*D], and the h-th D-wide slice of the merged axis is head h
    — the BlockSpecs below gather per-head [bq/bk, D] tiles by block
    index along the merged axis, so no [B,S,H,D]<->[BH,S,D] transposes
    are ever materialized (in OR out).

    ``offs``: optional traced int32 [1, 3] = (q_global_off, k_global_off,
    dynamic_kv_valid) for ring context parallelism / shape bucketing."""
    B, Sq, HD = q.shape
    D = HD // nh
    Sk = k.shape[1]
    grid = (B * nh, Sq // bq, Sk // bk)
    if offs is None:
        offs = jnp.zeros((1, 3), jnp.int32)

    kernel = functools.partial(
        _fwd_kernel, scale=scale, ncond=ncond, kvlen=kvlen, sk_pad=Sk,
        bq=bq, bk=bk, dyn_kvlen=dyn_kvlen,
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b // nh, i, b % nh)),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b // nh, j, b % nh)),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b // nh, j, b % nh)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b // nh, i, b % nh)),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Sq, HD), q.dtype),
            jax.ShapeDtypeStruct((B * nh, 1, Sq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(offs, q, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(offs_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr,
                    *, scale: float, ncond: int, kvlen: int, sk_pad: int,
                    bq: int, bk: int, dyn_kvlen: bool = False):
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    kv_dyn = offs_ref[0, 2] if dyn_kvlen else None
    skip = _tile_fully_masked(qi * bq, ki * bk, bq, bk, ncond, kvlen,
                              sk_pad, q_glob=offs_ref[0, 0],
                              k_glob=offs_ref[0, 1], kv_dyn=kv_dyn)

    def _tile_body():
        q = q_ref[0]        # [bq, D]
        k = k_ref[0]        # [bk, D]
        v = v_ref[0]
        do = do_ref[0]      # [bq, D]
        lse = lse_ref[0].reshape(-1, 1)    # row -> column relayout
        delta = delta_ref[0].reshape(-1, 1)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        allowed = _mask_tile(qi * bq, ki * bk, bq, bk, ncond, kvlen,
                             sk_pad, q_glob=offs_ref[0, 0],
                             k_glob=offs_ref[0, 1], kv_dyn=kv_dyn)
        p = jnp.exp(s - lse)
        if allowed is not None:
            p = jnp.where(allowed, p, 0.0)

        # dv += P^T dO
        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dP = dO V^T ; dS = P * (dP - delta)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        # dk += dS^T q * scale
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    if skip is None:
        _tile_body()
    else:
        # fully-masked tile: p = 0 and ds = 0, so dk/dv gain nothing
        pl.when(jnp.logical_not(skip))(_tile_body)

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(offs_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, dq_scr,
                   *, scale: float, ncond: int, kvlen: int, sk_pad: int,
                   bq: int, bk: int, dyn_kvlen: bool = False):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    kv_dyn = offs_ref[0, 2] if dyn_kvlen else None
    skip = _tile_fully_masked(qi * bq, ki * bk, bq, bk, ncond, kvlen,
                              sk_pad, q_glob=offs_ref[0, 0],
                              k_glob=offs_ref[0, 1], kv_dyn=kv_dyn)

    def _tile_body():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0].reshape(-1, 1)
        delta = delta_ref[0].reshape(-1, 1)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        allowed = _mask_tile(qi * bq, ki * bk, bq, bk, ncond, kvlen,
                             sk_pad, q_glob=offs_ref[0, 0],
                             k_glob=offs_ref[0, 1], kv_dyn=kv_dyn)
        p = jnp.exp(s - lse)
        if allowed is not None:
            p = jnp.where(allowed, p, 0.0)

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dq_scr[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    if skip is None:
        _tile_body()
    else:
        # fully-masked tile: ds = 0, so dq gains nothing
        pl.when(jnp.logical_not(skip))(_tile_body)

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _flash_bwd_dkv_impl(q, k, v, do, lse, delta, ncond, kvlen, scale,
                        bq, bk, interpret, offs=None, dyn_kvlen=False,
                        nh=1):
    """dk/dv for one K/V chunk against all local queries. q/k/v/do:
    merged [B, S, nh*D]; lse/delta: [B*nh, 1, Sq] fp32."""
    B, Sq, HD = q.shape
    D = HD // nh
    Sk = k.shape[1]
    if offs is None:
        offs = jnp.zeros((1, 3), jnp.int32)
    common = dict(scale=scale, ncond=ncond, kvlen=kvlen, sk_pad=Sk,
                  bq=bq, bk=bk, dyn_kvlen=dyn_kvlen)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **common),
        grid=(B * nh, Sk // bk, Sq // bq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, D),
                         lambda b, i, j: (b // nh, j, b % nh)),  # q by qi
            pl.BlockSpec((1, bk, D),
                         lambda b, i, j: (b // nh, i, b % nh)),  # k by ki
            pl.BlockSpec((1, bk, D),
                         lambda b, i, j: (b // nh, i, b % nh)),
            pl.BlockSpec((1, bq, D),
                         lambda b, i, j: (b // nh, j, b % nh)),  # do
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, j)),  # lse
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, j)),  # delta
        ],
        out_specs=[
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b // nh, i, b % nh)),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b // nh, i, b % nh)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Sk, HD), k.dtype),
            jax.ShapeDtypeStruct((B, Sk, HD), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(offs, q, k, v, do, lse, delta)
    return dk, dv


def _flash_bwd_dq_impl(q, k, v, do, lse, delta, ncond, kvlen, scale,
                       bq, bk, interpret, offs=None, dyn_kvlen=False,
                       nh=1):
    """dq of local queries against one K/V chunk (merged-head layout)."""
    B, Sq, HD = q.shape
    D = HD // nh
    Sk = k.shape[1]
    if offs is None:
        offs = jnp.zeros((1, 3), jnp.int32)
    common = dict(scale=scale, ncond=ncond, kvlen=kvlen, sk_pad=Sk,
                  bq=bq, bk=bk, dyn_kvlen=dyn_kvlen)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **common),
        grid=(B * nh, Sq // bq, Sk // bk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b // nh, i, b % nh)),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b // nh, j, b % nh)),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b // nh, j, b % nh)),
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b // nh, i, b % nh)),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, bq, D),
                               lambda b, i, j: (b // nh, i, b % nh)),
        out_shape=jax.ShapeDtypeStruct((B, Sq, HD), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(offs, q, k, v, do, lse, delta)
    return dq


def _flash_bwd_impl(q, k, v, o, lse, do, ncond: int, kvlen: int, scale: float,
                    bq: int, bk: int, interpret: bool, offs=None,
                    dyn_kvlen: bool = False, nh: int = 1):
    B, Sq, HD = q.shape
    # per-(token, head) delta in the [B*nh, 1, Sq] row layout lse uses
    delta = jnp.sum(
        do.astype(jnp.float32).reshape(B, Sq, nh, HD // nh)
        * o.astype(jnp.float32).reshape(B, Sq, nh, HD // nh), axis=-1)
    delta = delta.transpose(0, 2, 1).reshape(B * nh, 1, Sq)
    dk, dv = _flash_bwd_dkv_impl(q, k, v, do, lse, delta, ncond, kvlen,
                                 scale, bq, bk, interpret, offs=offs,
                                 dyn_kvlen=dyn_kvlen, nh=nh)
    dq = _flash_bwd_dq_impl(q, k, v, do, lse, delta, ncond, kvlen,
                            scale, bq, bk, interpret, offs=offs,
                            dyn_kvlen=dyn_kvlen, nh=nh)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp wiring
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11))
def _flash_core(q, k, v, offs, ncond, kvlen, scale, bq, bk, interpret,
                dyn_kvlen, nh):
    o, _ = _flash_fwd_impl(q, k, v, ncond, kvlen, scale, bq, bk, interpret,
                           offs=offs, dyn_kvlen=dyn_kvlen, nh=nh)
    return o


def _flash_core_fwd(q, k, v, offs, ncond, kvlen, scale, bq, bk, interpret,
                    dyn_kvlen, nh):
    from jax.ad_checkpoint import checkpoint_name

    o, lse = _flash_fwd_impl(q, k, v, ncond, kvlen, scale, bq, bk, interpret,
                             offs=offs, dyn_kvlen=dyn_kvlen, nh=nh)
    # Name the kernel-produced residuals so a remat policy can elect to
    # save them (ops/layers.py remat_wrap policy "dots_attn"): with
    # o/lse stored, the rematerialized block backward never re-runs the
    # forward flash kernel — it only needs q/k/v (cheap reshapes of
    # saved projection dots) plus these two tensors.
    o = checkpoint_name(o, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return o, (q, k, v, o, lse, offs)


def _flash_core_bwd(ncond, kvlen, scale, bq, bk, interpret, dyn_kvlen, nh,
                    res, do):
    q, k, v, o, lse, offs = res
    dq, dk, dv = _flash_bwd_impl(
        q, k, v, o, lse, do, ncond, kvlen, scale, bq, bk, interpret,
        offs=offs, dyn_kvlen=dyn_kvlen, nh=nh,
    )
    d_offs = np.zeros(offs.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, d_offs


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    num_cond_tokens: int = 0,
    kv_valid_len: Optional[int] = None,
    scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention with conditioning-prefix masking.

    Default 1024x1024 tiles: measured fastest at 480p decode shapes on
    v5e (96 TFLOP/s amortized vs 88 at 512x1024; bq must be a multiple
    of 128 for the lse block, bk of 128 for the pv contraction).

    q: [B, Sq, H, D]; k, v: [B, Sk, H, D] → [B, Sq, H, D].
    ``num_cond_tokens`` is a static int. ``kv_valid_len`` may be a static
    int OR a traced int32 scalar (shape bucketing: keys at index >= valid
    are masked for every query, so one compile serves every geometry that
    pads into the same bucket; pad *queries* still attend valid keys —
    their outputs are garbage the caller masks downstream, which keeps
    the lse finite and the backward pass NaN-free).
    """
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    if scale is None:
        scale = D ** -0.5
    if _needs_head_split(H, D):
        o = flash_attention(
            _split_heads(q), _split_heads(k), _split_heads(v),
            num_cond_tokens=num_cond_tokens, kv_valid_len=kv_valid_len,
            scale=scale, block_q=block_q, block_k=block_k,
            interpret=interpret)
        return _unsplit_heads(o, B, H)
    dyn = kv_valid_len is not None and not isinstance(kv_valid_len, int)
    kvlen = Sk if (kv_valid_len is None or dyn) else int(kv_valid_len)
    # Conditioning queries only exist in the no-cache (Sq == Sk) path.
    ncond = int(num_cond_tokens) if Sq == Sk else 0

    bq = min(block_q, _round_up(Sq, 8))
    bk = min(block_k, _round_up(Sk, 8))
    sq_pad = _round_up(Sq, bq)
    sk_pad = _round_up(Sk, bk)
    # Padded keys must be masked out.
    if sk_pad > Sk:
        kvlen = min(kvlen, Sk)

    q3 = _pack_merged(q, sq_pad)
    k3 = _pack_merged(k, sk_pad)
    v3 = _pack_merged(v, sk_pad)

    # The dynamic valid bound also covers the static tile padding
    # (kv_valid_len <= Sk <= sk_pad).
    offs = _offs_arr(0, 0, kv_valid_len if dyn else 0)
    o = _flash_core(q3, k3, v3, offs, ncond, kvlen, float(scale), bq, bk,
                    interpret, dyn, H)
    return o[:, :Sq].reshape(B, Sq, H, D)


# ---------------------------------------------------------------------------
# Chunk-level API for ring context parallelism
# ---------------------------------------------------------------------------
#
# Ring attention (parallel/context_attention.py) iterates K/V chunks
# around the ICI ring; these entry points run one (local-q x chunk-KV)
# flash pass with *traced global offsets* so the conditioning-prefix rule
# holds across shards. The ring owns the custom VJP — these are raw
# impl wrappers (fwd returns the combinable (o, lse) pair; dq/dkv take
# the globally-combined lse).


def _chunk_geom(Sq: int, Sk: int, block_q: int, block_k: int):
    bq = min(block_q, _round_up(Sq, 8))
    bk = min(block_k, _round_up(Sk, 8))
    return bq, bk, _round_up(Sq, bq), _round_up(Sk, bk)


def _pack_merged(x, s_pad):
    """[B, S, H, D] -> [B, s_pad, H*D]: a free bitcast (row-major) plus
    token padding — NOT a transpose. Head tiles are addressed by block
    index along the merged axis inside the kernels."""
    B, S, H, D = x.shape
    if s_pad > S:
        x = jnp.pad(x, ((0, 0), (0, s_pad - S), (0, 0), (0, 0)))
    return x.reshape(B, s_pad, H * D)


def _pack_row(x, s_pad):
    """[B, S, H] fp32 -> [BH, 1, S_pad]."""
    B, S, H = x.shape
    x = x.transpose(0, 2, 1).reshape(B * H, 1, S)
    if s_pad > S:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - S)))
    return x


def _offs_arr(q_offset, k_offset, kv_dyn=0):
    return jnp.stack(
        [jnp.asarray(q_offset, jnp.int32), jnp.asarray(k_offset, jnp.int32),
         jnp.asarray(kv_dyn, jnp.int32)]
    ).reshape(1, 3)


def flash_chunk_fwd(q, k, v, q_offset, k_offset, *, num_cond_tokens: int,
                    scale: Optional[float] = None, block_q: int = 1024,
                    block_k: int = 1024, interpret: bool = False,
                    kv_valid=None):
    """One ring step: local q [B,Sq,H,D] x chunk K/V [B,Sk,H,D] ->
    (o normalized [B,Sq,H,D], lse [B,Sq,H] fp32). Offsets are traced.
    ``kv_valid``: optional traced GLOBAL valid-key count (bucketing)."""
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    if scale is None:
        scale = D ** -0.5
    if _needs_head_split(H, D):
        o, lse = flash_chunk_fwd(
            _split_heads(q), _split_heads(k), _split_heads(v),
            q_offset, k_offset, num_cond_tokens=num_cond_tokens,
            scale=scale, block_q=block_q, block_k=block_k,
            interpret=interpret, kv_valid=kv_valid)
        return (_unsplit_heads(o, B, H),
                lse.reshape(B, H, Sq).transpose(0, 2, 1))
    dyn = kv_valid is not None
    bq, bk, sq_pad, sk_pad = _chunk_geom(Sq, Sk, block_q, block_k)
    o, lse = _flash_fwd_impl(
        _pack_merged(q, sq_pad), _pack_merged(k, sk_pad),
        _pack_merged(v, sk_pad),
        int(num_cond_tokens), Sk, float(scale), bq, bk, interpret,
        offs=_offs_arr(q_offset, k_offset, kv_valid if dyn else 0),
        dyn_kvlen=dyn, nh=H,
    )
    o = o[:, :Sq].reshape(B, Sq, H, D)
    lse = lse[:, 0, :Sq].reshape(B, H, Sq).transpose(0, 2, 1)
    return o, lse


def flash_chunk_dq(q, k, v, do, lse, delta, q_offset, k_offset, *,
                   num_cond_tokens: int, scale: Optional[float] = None,
                   block_q: int = 1024, block_k: int = 1024,
                   interpret: bool = False, kv_valid=None):
    """dq of local queries vs one chunk. lse/delta: [B, Sq, H] fp32
    (globally combined)."""
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    if scale is None:
        scale = D ** -0.5
    if _needs_head_split(H, D):
        dq = flash_chunk_dq(
            _split_heads(q), _split_heads(k), _split_heads(v),
            _split_heads(do), _split_rows(lse), _split_rows(delta),
            q_offset, k_offset, num_cond_tokens=num_cond_tokens,
            scale=scale, block_q=block_q, block_k=block_k,
            interpret=interpret, kv_valid=kv_valid)
        return _unsplit_heads(dq, B, H)
    dyn = kv_valid is not None
    bq, bk, sq_pad, sk_pad = _chunk_geom(Sq, Sk, block_q, block_k)
    dq = _flash_bwd_dq_impl(
        _pack_merged(q, sq_pad), _pack_merged(k, sk_pad),
        _pack_merged(v, sk_pad),
        _pack_merged(do, sq_pad), _pack_row(lse, sq_pad),
        _pack_row(delta, sq_pad),
        int(num_cond_tokens), Sk, float(scale), bq, bk, interpret,
        offs=_offs_arr(q_offset, k_offset, kv_valid if dyn else 0),
        dyn_kvlen=dyn, nh=H,
    )
    return dq[:, :Sq].reshape(B, Sq, H, D)


def flash_chunk_dkv(q, k, v, do, lse, delta, q_offset, k_offset, *,
                    num_cond_tokens: int, scale: Optional[float] = None,
                    block_q: int = 1024, block_k: int = 1024,
                    interpret: bool = False, kv_valid=None):
    """This device's (dk, dv) contribution to one chunk."""
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    if scale is None:
        scale = D ** -0.5
    if _needs_head_split(H, D):
        dk, dv = flash_chunk_dkv(
            _split_heads(q), _split_heads(k), _split_heads(v),
            _split_heads(do), _split_rows(lse), _split_rows(delta),
            q_offset, k_offset, num_cond_tokens=num_cond_tokens,
            scale=scale, block_q=block_q, block_k=block_k,
            interpret=interpret, kv_valid=kv_valid)
        return _unsplit_heads(dk, B, H), _unsplit_heads(dv, B, H)
    dyn = kv_valid is not None
    bq, bk, sq_pad, sk_pad = _chunk_geom(Sq, Sk, block_q, block_k)
    dk, dv = _flash_bwd_dkv_impl(
        _pack_merged(q, sq_pad), _pack_merged(k, sk_pad),
        _pack_merged(v, sk_pad),
        _pack_merged(do, sq_pad), _pack_row(lse, sq_pad),
        _pack_row(delta, sq_pad),
        int(num_cond_tokens), Sk, float(scale), bq, bk, interpret,
        offs=_offs_arr(q_offset, k_offset, kv_valid if dyn else 0),
        dyn_kvlen=dyn, nh=H,
    )
    dk = dk[:, :Sk].reshape(B, Sk, H, D)
    dv = dv[:, :Sk].reshape(B, Sk, H, D)
    return dk, dv
