"""Context-parallel attention over the token axis.

First-class sequence/context parallelism (SURVEY.md §2.10: the
reference's ``cp_split_hw`` latent-grid split + LongCat CP internals,
always run degenerate at size 1): video tokens shard over the mesh's
``context`` axis. The conditioning-prefix rule (ops/attention.py) is
applied with *global* query/key indices, so prefix semantics are
preserved across shards.

Two formulations:

- ``ring_self_attention`` (default): ring flash attention. K/V chunks
  rotate around the ICI ring via ``lax.ppermute`` while each device runs
  the Pallas flash kernel (ops/flash_attention.py chunk API) on its
  local queries, combining online-softmax partials (o, lse) across ring
  steps. K/V memory stays O(S_local); XLA overlaps the collective-
  permute with the next chunk's compute. A ring-level ``custom_vjp``
  implements the exact backward as a second ring pass (dq accumulates
  locally; each chunk's dk/dv accumulator travels with the chunk and
  arrives home after n steps). ``impl="xla"`` swaps the per-chunk kernel
  for a jnp reference (CPU tests; same ring orchestration).

- ``cp_self_attention``: all-gather-KV reference formulation — one tiled
  all-gather per layer, O(S_global) K/V memory. Kept as the correctness
  oracle for the ring (test_parallel.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.attention import NEG_INF

TOKEN_SPEC = P(None, "context", None, None)  # [B, S, H, D]


def _token_spec(mesh: Mesh, n_heads: int) -> P:
    """Token spec for [B, S, H, D] q/k/v at the shard_map boundary.

    Under TP x CP the qkv projections produce HEAD-sharded activations
    (parallel/sharding.py: qkv kernels split their output dim over
    "tensor"). Demanding head-replicated inputs here forces GSPMD into
    an involuntary full rematerialization (replicate + reslice) at every
    attention, fwd and bwd; instead the ring keeps heads sharded over
    "tensor" — attention is per-head independent, so each device ring-
    rotates only its local heads' K/V (ICI traffic / tp as a bonus)."""
    tp = int(mesh.shape.get("tensor", 1)) if "tensor" in mesh.shape else 1
    if tp > 1 and n_heads % tp == 0:
        return P(None, "context", "tensor", None)
    return TOKEN_SPEC


def _shard_map_fn():
    """jax.shard_map (0.8+) with the experimental fallback; disables
    replication checking under either API (axis_index makes outputs
    device-varying in ways the checker can't see)."""
    fn = getattr(jax, "shard_map", None)
    if fn is not None:
        return functools.partial(fn, check_vma=False)
    from jax.experimental.shard_map import shard_map as fn

    return functools.partial(fn, check_rep=False)


def _local_attention(ql, kg, vg, q_offset, num_cond_tokens: int,
                     scale: Optional[float]):
    """Attention of a local query shard against the gathered K/V with the
    global prefix mask. q_offset is traced (axis_index-derived)."""
    B, Sq, H, D = ql.shape
    Sk = kg.shape[1]
    if scale is None:
        scale = D ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", ql.astype(jnp.float32),
                        kg.astype(jnp.float32)) * scale
    if num_cond_tokens > 0:
        q_idx = q_offset + jnp.arange(Sq)[:, None]
        k_idx = jnp.arange(Sk)[None, :]
        allowed = (q_idx >= num_cond_tokens) | (k_idx < num_cond_tokens)
        logits = jnp.where(allowed[None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vg.astype(jnp.float32))
    return out.astype(ql.dtype)


def cp_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    num_cond_tokens: int = 0,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Self-attention with q/k/v token-sharded over mesh axis "context".

    q, k, v: [B, S, H, D] with S divisible by the context axis size.
    Output keeps the same token sharding. Equivalent to the unsharded
    ``attention_xla`` (tested on the virtual CPU mesh).
    """
    shard_map = _shard_map_fn()
    if q.shape[1] != k.shape[1]:
        # decode: every query is a noise token; the local q_offset below
        # counts query tokens, not global positions (see
        # ring_self_attention for the full rationale)
        num_cond_tokens = 0

    def local(ql, kl, vl):
        kg = jax.lax.all_gather(kl, "context", axis=1, tiled=True)
        vg = jax.lax.all_gather(vl, "context", axis=1, tiled=True)
        q_offset = jax.lax.axis_index("context") * ql.shape[1]
        return _local_attention(ql, kg, vg, q_offset, num_cond_tokens, scale)

    spec = _token_spec(mesh, q.shape[2])
    f = shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return f(q, k, v)


# ---------------------------------------------------------------------------
# Ring flash attention
# ---------------------------------------------------------------------------


def _xla_chunk_mask(q_off, k_off, Sq, Sk, ncond, kv=None):
    q_idx = q_off + jnp.arange(Sq)[:, None]
    k_idx = k_off + jnp.arange(Sk)[None, :]
    allowed = jnp.ones((Sq, Sk), jnp.bool_)
    if ncond > 0:
        allowed = (q_idx >= ncond) | (k_idx < ncond)
    if kv is not None:
        # traced GLOBAL valid-key bound (shape bucketing under CP)
        allowed = allowed & (k_idx < kv)
    return allowed


def _xla_chunk_fwd(q, k, v, q_off, k_off, ncond, scale, kv=None):
    """jnp reference of the per-chunk flash pass: returns (o normalized,
    lse [B, Sq, H]); fully-masked rows give o=0, lse=NEG_INF (combinable)."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    masked = ncond > 0 or kv is not None
    if masked:
        allowed = _xla_chunk_mask(q_off, k_off, q.shape[1], k.shape[1],
                                  ncond, kv)
        s = jnp.where(allowed[None, None], s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    if masked:
        p = jnp.where(allowed[None, None], p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o = jnp.einsum("bhqk,bkhd->bqhd", p / l_safe, v.astype(jnp.float32))
    lse = (m + jnp.log(l_safe))[..., 0].transpose(0, 2, 1)  # [B, Sq, H]
    return o.astype(q.dtype), lse


def _xla_chunk_p_ds(q, k, v, do, lse, delta, q_off, k_off, ncond, scale,
                    kv=None):
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jnp.exp(s - lse.transpose(0, 2, 1)[..., None])
    if ncond > 0 or kv is not None:
        allowed = _xla_chunk_mask(q_off, k_off, q.shape[1], k.shape[1],
                                  ncond, kv)
        p = jnp.where(allowed[None, None], p, 0.0)
    dp = jnp.einsum("bqhd,bkhd->bhqk", do.astype(jnp.float32),
                    v.astype(jnp.float32))
    ds = p * (dp - delta.transpose(0, 2, 1)[..., None])
    return p, ds


def _xla_chunk_dq(q, k, v, do, lse, delta, q_off, k_off, ncond, scale,
                  kv=None):
    _, ds = _xla_chunk_p_ds(q, k, v, do, lse, delta, q_off, k_off, ncond,
                            scale, kv)
    return jnp.einsum("bhqk,bkhd->bqhd", ds,
                      k.astype(jnp.float32)) * scale


def _xla_chunk_dkv(q, k, v, do, lse, delta, q_off, k_off, ncond, scale,
                   kv=None):
    p, ds = _xla_chunk_p_ds(q, k, v, do, lse, delta, q_off, k_off, ncond,
                            scale, kv)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, do.astype(jnp.float32))
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds,
                    q.astype(jnp.float32)) * scale
    return dk, dv


def _chunk_fns(impl: str, ncond: int, scale: float, interpret: bool,
               kv=None):
    """``kv``: optional traced GLOBAL valid-key count threaded into every
    chunk mask (bucketing under ring CP)."""
    if impl == "pallas":
        from ..ops.flash_attention import (
            flash_chunk_dkv, flash_chunk_dq, flash_chunk_fwd,
        )

        kw = dict(num_cond_tokens=ncond, scale=scale, interpret=interpret,
                  kv_valid=kv)
        return (
            lambda q, k, v, qo, ko: flash_chunk_fwd(q, k, v, qo, ko, **kw),
            lambda q, k, v, do, lse, dl, qo, ko: flash_chunk_dq(
                q, k, v, do, lse, dl, qo, ko, **kw),
            lambda q, k, v, do, lse, dl, qo, ko: flash_chunk_dkv(
                q, k, v, do, lse, dl, qo, ko, **kw),
        )
    return (
        lambda q, k, v, qo, ko: _xla_chunk_fwd(q, k, v, qo, ko, ncond, scale,
                                               kv),
        lambda q, k, v, do, lse, dl, qo, ko: _xla_chunk_dq(
            q, k, v, do, lse, dl, qo, ko, ncond, scale, kv),
        lambda q, k, v, do, lse, dl, qo, ko: _xla_chunk_dkv(
            q, k, v, do, lse, dl, qo, ko, ncond, scale, kv),
    )


def _ring_perm(n: int):
    # device j sends to j-1: after one rotation, device m holds the chunk
    # originally on m+1; at ring step i it holds chunk (m + i) mod n.
    return [(j, (j - 1) % n) for j in range(n)]


def _ring_fwd_impl(q, k, v, axis: str, n: int, ncond: int, scale: float,
                   impl: str, interpret: bool, kv=None):
    chunk_fwd, _, _ = _chunk_fns(impl, ncond, scale, interpret, kv)
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    my = jax.lax.axis_index(axis)
    q_off = my * Sq
    perm = _ring_perm(n)

    def combine(o_acc, lse_acc, o_i, lse_i):
        lse_new = jnp.logaddexp(lse_acc, lse_i)
        o_acc = (o_acc * jnp.exp(lse_acc - lse_new)[..., None]
                 + o_i.astype(jnp.float32)
                 * jnp.exp(lse_i - lse_new)[..., None])
        return o_acc, lse_new

    def step(carry, i):
        o_acc, lse_acc, kc, vc = carry
        src = (my + i) % n
        o_i, lse_i = chunk_fwd(q, kc, vc, q_off, src * Sk)
        o_acc, lse_acc = combine(o_acc, lse_acc, o_i, lse_i)
        # rotating at the tail lets XLA overlap the permute with the
        # next iteration's chunk compute
        kc, vc = jax.lax.ppermute((kc, vc), axis, perm)
        return (o_acc, lse_acc, kc, vc), None

    init = (jnp.zeros((B, Sq, H, D), jnp.float32),
            jnp.full((B, Sq, H), NEG_INF, jnp.float32), k, v)
    if n > 1:
        # scan covers chunks 0..n-2; the LAST chunk runs unrolled below
        # so its post-compute rotation (whose result nothing consumes)
        # is never issued — 1/n of the ring's K/V ICI traffic
        (o, lse, kc, vc), _ = jax.lax.scan(step, init, jnp.arange(n - 1))
    else:
        o, lse, kc, vc = init
    o_i, lse_i = chunk_fwd(q, kc, vc, q_off, ((my + n - 1) % n) * Sk)
    o, lse = combine(o, lse, o_i, lse_i)
    return o.astype(q.dtype), lse


def _ring_bwd_core(axis, n, ncond, scale, impl, interpret, q, k, v, o, lse,
                   do, kv=None):
    _, chunk_dq, chunk_dkv = _chunk_fns(impl, ncond, scale, interpret, kv)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)  # [B, Sq, H]
    my = jax.lax.axis_index(axis)
    q_off = my * q.shape[1]
    Sk = k.shape[1]
    perm = _ring_perm(n)

    def step(carry, i):
        dq_acc, kc, vc, dkc, dvc = carry
        src = (my + i) % n
        k_off = src * Sk
        dq_acc = dq_acc + chunk_dq(q, kc, vc, do, lse, delta, q_off,
                                   k_off).astype(jnp.float32)
        dk_i, dv_i = chunk_dkv(q, kc, vc, do, lse, delta, q_off, k_off)
        dkc = dkc + dk_i.astype(jnp.float32)
        dvc = dvc + dv_i.astype(jnp.float32)
        if n > 1:
            # the accumulators travel with their chunk; after n rotations
            # each is home with every device's contribution added
            kc, vc, dkc, dvc = jax.lax.ppermute((kc, vc, dkc, dvc), axis,
                                                perm)
        return (dq_acc, kc, vc, dkc, dvc), None

    init = (jnp.zeros(q.shape, jnp.float32), k, v,
            jnp.zeros(k.shape, jnp.float32), jnp.zeros(v.shape, jnp.float32))
    (dq, _, _, dk, dv), _ = jax.lax.scan(step, init, jnp.arange(n))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _ring_core(q, k, v, axis, n, ncond, scale, impl, interpret):
    o, _ = _ring_fwd_impl(q, k, v, axis, n, ncond, scale, impl, interpret)
    return o


def _ring_core_fwd(q, k, v, axis, n, ncond, scale, impl, interpret):
    o, lse = _ring_fwd_impl(q, k, v, axis, n, ncond, scale, impl, interpret)
    return o, (q, k, v, o, lse)


def _ring_bwd_impl(axis, n, ncond, scale, impl, interpret, res, do):
    q, k, v, o, lse = res
    return _ring_bwd_core(axis, n, ncond, scale, impl, interpret,
                          q, k, v, o, lse, do)


_ring_core.defvjp(_ring_core_fwd, _ring_bwd_impl)


# Bucketed variant: the traced valid-key bound rides as a float32 scalar
# operand (integer operands have float0 cotangents, which custom_vjp
# can't return portably).
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _ring_core_kv(q, k, v, kvf, axis, n, ncond, scale, impl, interpret):
    o, _ = _ring_fwd_impl(q, k, v, axis, n, ncond, scale, impl, interpret,
                          kv=kvf.astype(jnp.int32))
    return o


def _ring_core_kv_fwd(q, k, v, kvf, axis, n, ncond, scale, impl, interpret):
    o, lse = _ring_fwd_impl(q, k, v, axis, n, ncond, scale, impl, interpret,
                            kv=kvf.astype(jnp.int32))
    return o, (q, k, v, kvf, o, lse)


def _ring_core_kv_bwd(axis, n, ncond, scale, impl, interpret, res, do):
    q, k, v, kvf, o, lse = res
    dq, dk, dv = _ring_bwd_core(axis, n, ncond, scale, impl, interpret,
                                q, k, v, o, lse, do,
                                kv=kvf.astype(jnp.int32))
    return dq, dk, dv, jnp.zeros((), jnp.float32)


_ring_core_kv.defvjp(_ring_core_kv_fwd, _ring_core_kv_bwd)


def ring_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    num_cond_tokens: int = 0,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
    interpret: bool = False,
    kv_valid=None,
) -> jnp.ndarray:
    """Ring flash attention with q/k/v token-sharded over mesh axis
    "context". Sq may differ from Sk (KV-cache decode: q = noise tokens,
    k/v = cond-cache ++ noise). Equivalent to ``cp_self_attention`` and
    the unsharded oracle (tested, including gradients).

    ``kv_valid``: optional traced GLOBAL valid-key count (shape
    bucketing, SURVEY.md §7 hard-part 3): keys at global index >=
    kv_valid are masked on every ring chunk, so one compile serves every
    geometry padding into the bucket even under CP."""
    shard_map = _shard_map_fn()

    n = int(mesh.shape["context"])
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    # Conditioning QUERIES only exist in the no-cache (Sq == Sk) path —
    # same convention as ops/flash_attention.flash_attention. In decode
    # (Sq != Sk) every query is a noise token at global position
    # Sk - Sq + i, but q_off inside the ring counts query tokens from 0;
    # without this guard the first ncond noise queries would be silently
    # restricted to the cond prefix.
    if q.shape[1] != k.shape[1]:
        num_cond_tokens = 0

    spec = _token_spec(mesh, q.shape[2])
    if kv_valid is None:
        def local(ql, kl, vl):
            return _ring_core(ql, kl, vl, "context", n, int(num_cond_tokens),
                              float(scale), impl, interpret)

        f = shard_map(
            local, mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
        )
        return f(q, k, v)

    kvf = jnp.asarray(kv_valid, jnp.float32)

    def local_kv(ql, kl, vl, kvl):
        return _ring_core_kv(ql, kl, vl, kvl, "context", n,
                             int(num_cond_tokens), float(scale), impl,
                             interpret)

    f = shard_map(
        local_kv, mesh=mesh,
        in_specs=(spec, spec, spec, P()),
        out_specs=spec,
    )
    return f(q, k, v, kvf)
