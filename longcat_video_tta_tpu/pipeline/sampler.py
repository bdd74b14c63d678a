"""Flow-match Euler sampling loops, fully jitted.

Replaces ``LongCatVideoPipeline.generate_vc`` / ``generate_t2v``
denoising internals (reference: used via common.py:566-611 and
run_baseline.py:409-421). One ``lax.scan`` over denoise steps; CFG runs
cond/uncond as a size-2B batch through a single DiT call; conditioning
tokens are either concatenated per step (no-cache) or pre-encoded once
into per-block K/V (``use_kv_cache=True`` — exact, see
test_dit.py::test_kv_cache_decode_matches_full_forward).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import DiTConfig, SchedulerConfig
from ..models import scheduler as sched
from ..models.dit import (
    dit_forward,
    dit_forward_with_cache,
    dit_precompute_cond_cache,
    pab_init_cache,
)


@functools.partial(
    jax.jit,
    static_argnames=("dit_cfg", "sched_cfg", "n_cond", "use_kv_cache",
                     "attn_impl", "cp_mesh", "bsa_cfg", "pab_cfg",
                     "cfgr_cfg"),
    # donate x, the PAB cache (4.9 GB at 93-frame), the CFG delta
    donate_argnums=(3, 12, 14),
)
def _denoise_scan(dit_params, dit_cfg, sched_cfg, x, sig_pairs, emb2,
                  mask2, g, cond2, kv_cache, adapters, nv, pab_state=None,
                  pab_reuse_flags=None, cfg_delta=None,
                  cfg_reuse_flags=None, *, n_cond, use_kv_cache, attn_impl,
                  cp_mesh, bsa_cfg, pab_cfg=None, cfgr_cfg=None):
    """The CFG euler denoise loop over ``sig_pairs`` (one lax.scan, x
    donated). Shared by the one-dispatch ``sample_latents`` and the
    segmented driver (``segment_steps``) — segmenting bounds single
    device executions, which this runtime kills past ~1-2 min (see
    .claude/skills/verify/SKILL.md long-execution fault).

    ``pab_cfg`` (PABConfig, static) enables Pyramid Attention Broadcast
    on the KV-cache path: ``pab_reuse_flags`` [n_steps] bool marks the
    steps that reuse the carried per-block attention cache
    (``pab_state``) instead of recomputing self-attention.

    ``cfgr_cfg`` (CFGReuseConfig, static) enables guidance-delta reuse
    (FasterCache, arXiv:2410.19355): ``cfg_reuse_flags`` [n_steps] bool
    marks the steps that run ONLY the conditional branch (batch B
    instead of 2B — half the model FLOPs) and reconstruct
    ``v_uncond = v_cond - cfg_delta`` from the delta carried from the
    last fully-computed step. Under PAB, the reuse step's conditional
    forward still refreshes the conditional slice of the attention
    cache; the unconditional slice goes one step staler (documented
    approximation-on-approximation, validated by the fidelity
    measurements in ARCHITECTURE.md).

    Returns ``(x, pab_state, cfg_delta)`` so segmented dispatch carries
    both caches across segments."""
    B = x.shape[0]
    nt_total = n_cond + x.shape[2]
    if pab_cfg is not None and n_cond > 0 and not use_kv_cache:
        raise NotImplementedError(
            "PAB is implemented for the KV-cache continuation path and "
            "t2v; drop pab_cfg for no-cache continuation sampling")

    # cond-half text views for the CFG-reuse branch (CFG layout:
    # [uncond; cond] along batch — see sample_latents). The big
    # caches (cond KV, PAB) are NOT pre-sliced: the conditional-only
    # forward slices them per block in-scan (cache_cond_half), which
    # costs one block-sized scratch instead of a materialized
    # half-batch cache copy (the copies OOMed a v5e at 93-frame).
    emb_c, mask_c = emb2[B:], mask2[B:]
    cond_c = None if cond2 is None else cond2[B:]

    def forward(x, t_val, pab_reuse=None, pab_state=None, cond_only=False):
        """One model forward. ``cond_only=False``: the CFG pair as one
        2B batch. ``cond_only=True``: conditional branch only (batch B,
        cond-half text slices; caches sliced in-scan)."""
        nb = B if cond_only else 2 * B
        xb = x if cond_only else jnp.concatenate([x, x], axis=0)
        emb = emb_c if cond_only else emb2
        msk = mask_c if cond_only else mask2
        if n_cond == 0:
            out = dit_forward(
                dit_params, dit_cfg, xb.astype(jnp.float32),
                jnp.full((nb,), t_val), emb, msk,
                num_cond_latents=0, adapters=adapters, attn_impl=attn_impl,
                cp_mesh=cp_mesh, num_valid_latents=nv,
                pab_reuse=pab_reuse, pab_cache=pab_state,
                cache_cond_half=cond_only,
            )
            return out if pab_state is not None else (out, None)
        elif use_kv_cache:
            out = dit_forward_with_cache(
                dit_params, dit_cfg, xb.astype(jnp.float32),
                jnp.full((nb,), t_val), emb, msk, kv_cache,
                num_cond_latents=n_cond, adapters=adapters,
                attn_impl=attn_impl, cp_mesh=cp_mesh, bsa_cfg=bsa_cfg,
                num_valid_latents=nv,
                pab_reuse=pab_reuse, pab_cache=pab_state,
                cache_cond_half=cond_only,
            )
            return out if pab_state is not None else (out, None)
        else:
            cnd = cond_c if cond_only else cond2
            full = jnp.concatenate([cnd, xb], axis=2)
            tsteps = jnp.zeros((nb, nt_total)).at[:, n_cond:].set(t_val)
            v_all = dit_forward(
                dit_params, dit_cfg, full.astype(jnp.float32), tsteps,
                emb, msk, num_cond_latents=n_cond, adapters=adapters,
                attn_impl=attn_impl, cp_mesh=cp_mesh,
                num_valid_latents=(None if nv is None
                                   else jnp.int32(n_cond) + nv),
            )
            return v_all[:, :, n_cond:], None

    def euler(x, v2, sigma, sigma_next):
        v_u, v_c = v2[:B], v2[B:]
        v = v_u + g * (v_c - v_u)
        return sched.euler_step(x, v, sigma, sigma_next)

    def step(carry, inp):
        x, pcache, cdelta = carry
        sig_pair, p_reuse, c_reuse = inp
        sigma, sigma_next = sig_pair
        t_val = sched.sigma_to_timestep(sigma, sched_cfg)
        if cfgr_cfg is None:
            v2, pcache = forward(x, t_val, pab_reuse=p_reuse,
                                 pab_state=pcache)
        else:
            def _full(ops):
                x, pcache, _cd = ops
                v2, pc = forward(x, t_val, pab_reuse=p_reuse,
                                 pab_state=pcache)
                return v2, pc, v2[B:] - v2[:B]

            def _reuse(ops):
                x, pcache, cd = ops
                v_c, pc_half = forward(x, t_val, pab_reuse=p_reuse,
                                       pab_state=pcache, cond_only=True)
                v2 = jnp.concatenate([v_c - cd.astype(v_c.dtype), v_c],
                                     axis=0)
                pc = (pcache if pcache is None
                      else pcache.at[:, B:].set(pc_half))
                return v2, pc, cd

            v2, pcache, cdelta = jax.lax.cond(
                c_reuse, _reuse, _full, (x, pcache, cdelta))
        return (euler(x, v2, sigma, sigma_next), pcache, cdelta), None

    (x, pab_state, cfg_delta), _ = jax.lax.scan(
        step, (x, pab_state, cfg_delta),
        (sig_pairs, pab_reuse_flags, cfg_reuse_flags))
    return x, pab_state, cfg_delta




def _pab_reuse_flags(num_steps: int, pab_cfg) -> jnp.ndarray:
    """[num_steps] bool: True = reuse the attention cache at that step.
    Steps outside [start_frac, end_frac) and every ``every``-th step
    inside it recompute (refreshing the cache); step 0 always
    recomputes by construction."""
    import numpy as np

    start = int(round(pab_cfg.start_frac * num_steps))
    end = int(round(pab_cfg.end_frac * num_steps))
    flags = np.zeros(num_steps, bool)
    for i in range(num_steps):
        if start <= i < end and (i - start) % max(1, pab_cfg.every) != 0:
            flags[i] = True
    return jnp.asarray(flags)


def _cfg_reuse_flags(num_steps: int, cfgr_cfg) -> jnp.ndarray:
    """[num_steps] bool: True = reuse the guidance delta at that step
    (conditional-branch-only forward). Same schedule shape as PAB;
    step 0 never reuses (the delta starts at zeros)."""
    flags = _pab_reuse_flags(num_steps, cfgr_cfg)
    return flags.at[0].set(False) if num_steps > 0 else flags

@functools.partial(
    jax.jit,
    static_argnames=(
        "dit_cfg", "sched_cfg", "num_gen_latents", "num_steps",
        "use_kv_cache", "attn_impl", "lat_h", "lat_w", "cp_mesh",
        "bsa_cfg", "pab_cfg", "cfgr_cfg",
    ),
)
def sample_latents(
    dit_params: Dict[str, Any],
    dit_cfg: DiTConfig,
    sched_cfg: SchedulerConfig,
    rng: jax.Array,
    text_emb: jnp.ndarray,        # [B, L, C_text]  (positive prompt)
    text_mask: jnp.ndarray,       # [B, L]
    neg_text_emb: jnp.ndarray,    # [B, L, C_text]  (negative prompt)
    neg_text_mask: jnp.ndarray,
    guidance_scale: float | jnp.ndarray,
    *,
    num_gen_latents: int,
    num_steps: int,
    lat_h: int,
    lat_w: int,
    cond_latents: Optional[jnp.ndarray] = None,  # [B, C, T_cond, H, W]
    adapters=None,
    use_kv_cache: bool = True,
    attn_impl: Optional[str] = None,
    cp_mesh=None,
    bsa_cfg=None,
    num_valid_gen_latents: Optional[jnp.ndarray] = None,
    pab_cfg=None,
    cfgr_cfg=None,
    init_noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Returns denoised latents for the generated region
    [B, C, num_gen_latents, lat_h, lat_w] (normalized latent space).

    ``cond_latents=None`` gives the T2V path (generate_t2v); otherwise
    video-continuation (generate_vc) with per-token timesteps
    [0..0, t..t] and ``num_cond_latents`` semantics.

    ``num_valid_gen_latents``: optional traced valid count for
    gen-horizon bucketing — ``num_gen_latents`` is the (static) bucket
    size, latents beyond the valid count are masked out of attention
    (dense flash and BSA) and the caller slices the output. One compile
    serves every horizon in the bucket.

    ``init_noise``: optional unit-variance [B, C, num_gen_latents, H, W]
    initial noise replacing the ``rng`` draw (SAVi-DNO carried noise —
    comparisons/noise_opt.py); scaled by sigma_max like the fresh draw.
    """
    B = text_emb.shape[0]
    C = dit_cfg.in_channels
    Lg = num_gen_latents
    n_cond = 0 if cond_latents is None else cond_latents.shape[2]

    sigmas = sched.build_sigmas(num_steps, sched_cfg)
    x = (init_noise.astype(jnp.float32) if init_noise is not None else
         jax.random.normal(rng, (B, C, Lg, lat_h, lat_w), jnp.float32))
    x = x * sigmas[0]

    # CFG batch: [uncond; cond]
    emb2 = jnp.concatenate([neg_text_emb, text_emb], axis=0)
    mask2 = jnp.concatenate([neg_text_mask, text_mask], axis=0)
    g = jnp.asarray(guidance_scale, jnp.float32)

    cond2 = kv_cache = None
    if n_cond > 0:
        cond2 = jnp.concatenate([cond_latents, cond_latents], axis=0)
        if use_kv_cache:
            kv_cache = dit_precompute_cond_cache(
                dit_params, dit_cfg, cond2, emb2, mask2,
                adapters=adapters, attn_impl=attn_impl, cp_mesh=cp_mesh,
            )

    sig_pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=1)
    pab_state = pab_flags = None
    if pab_cfg is not None:
        pab_state = pab_init_cache(dit_cfg, 2 * B, Lg, lat_h, lat_w)
        pab_flags = _pab_reuse_flags(num_steps, pab_cfg)
    cfg_delta = cfg_flags = None
    if cfgr_cfg is not None:
        cfg_delta = jnp.zeros((B, dit_cfg.out_channels, Lg, lat_h, lat_w),
                              jnp.float32)
        cfg_flags = _cfg_reuse_flags(num_steps, cfgr_cfg)
    out, _, _ = _denoise_scan(
        dit_params, dit_cfg, sched_cfg, x, sig_pairs, emb2, mask2, g,
        cond2 if (n_cond > 0 and not use_kv_cache) else None,
        kv_cache if (n_cond > 0 and use_kv_cache) else None,
        adapters, num_valid_gen_latents, pab_state, pab_flags,
        cfg_delta, cfg_flags,
        n_cond=n_cond, use_kv_cache=use_kv_cache, attn_impl=attn_impl,
        cp_mesh=cp_mesh, bsa_cfg=bsa_cfg, pab_cfg=pab_cfg,
        cfgr_cfg=cfgr_cfg,
    )
    return out


def sample_latents_segmented(
    dit_params, dit_cfg, sched_cfg, rng, text_emb, text_mask,
    neg_text_emb, neg_text_mask, guidance_scale, *,
    num_gen_latents, num_steps, lat_h, lat_w, segment_steps,
    cond_latents=None, adapters=None, use_kv_cache=True, attn_impl=None,
    cp_mesh=None, bsa_cfg=None, num_valid_gen_latents=None, pab_cfg=None,
    cfgr_cfg=None, init_noise=None,
):
    """``sample_latents`` split into ceil(num_steps/segment_steps)
    device dispatches with the denoised carry fetched between segments.

    Numerically identical to the one-dispatch path (same noise init,
    same per-step math; tested). Use when single executions must stay
    short — long-horizon decode (93 frames) runs minutes in one
    execution, which some runtimes kill (the axon tunnel's
    long-execution fault); the cost is one host round-trip per segment.
    The last partial segment compiles separately.
    """
    B = text_emb.shape[0]
    C = dit_cfg.in_channels
    n_cond = 0 if cond_latents is None else cond_latents.shape[2]

    sigmas = sched.build_sigmas(num_steps, sched_cfg)
    x = (init_noise.astype(jnp.float32) if init_noise is not None else
         jax.random.normal(rng, (B, C, num_gen_latents, lat_h, lat_w),
                           jnp.float32))
    x = x * sigmas[0]
    emb2 = jnp.concatenate([neg_text_emb, text_emb], axis=0)
    mask2 = jnp.concatenate([neg_text_mask, text_mask], axis=0)
    g = jnp.asarray(guidance_scale, jnp.float32)

    cond2 = kv_cache = None
    if n_cond > 0:
        cond2 = jnp.concatenate([cond_latents, cond_latents], axis=0)
        if use_kv_cache:
            kv_cache = dit_precompute_cond_cache(
                dit_params, dit_cfg, cond2, emb2, mask2,
                adapters=adapters, attn_impl=attn_impl, cp_mesh=cp_mesh,
            )

    sig_pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=1)
    pab_state = pab_flags = None
    if pab_cfg is not None:
        pab_state = pab_init_cache(dit_cfg, 2 * B, num_gen_latents,
                                   lat_h, lat_w)
        pab_flags = _pab_reuse_flags(num_steps, pab_cfg)  # GLOBAL steps
    cfg_delta = cfg_flags = None
    if cfgr_cfg is not None:
        cfg_delta = jnp.zeros(
            (B, dit_cfg.out_channels, num_gen_latents, lat_h, lat_w),
            jnp.float32)
        cfg_flags = _cfg_reuse_flags(num_steps, cfgr_cfg)  # GLOBAL steps
    seg = max(1, int(segment_steps))
    for s in range(0, num_steps, seg):
        x, pab_state, cfg_delta = _denoise_scan(
            dit_params, dit_cfg, sched_cfg, x, sig_pairs[s:s + seg],
            emb2, mask2, g,
            cond2 if (n_cond > 0 and not use_kv_cache) else None,
            kv_cache if (n_cond > 0 and use_kv_cache) else None,
            adapters, num_valid_gen_latents, pab_state,
            None if pab_flags is None else pab_flags[s:s + seg],
            cfg_delta,
            None if cfg_flags is None else cfg_flags[s:s + seg],
            n_cond=n_cond, use_kv_cache=use_kv_cache, attn_impl=attn_impl,
            cp_mesh=cp_mesh, bsa_cfg=bsa_cfg, pab_cfg=pab_cfg,
            cfgr_cfg=cfgr_cfg,
        )
        jax.block_until_ready(x)  # bound the in-flight execution
    return x


# ---------------------------------------------------------------------------
# MMDiT (Open-Sora v2) sampling
# ---------------------------------------------------------------------------


def flux_time_shift(ts: jnp.ndarray, image_seq_len: int) -> jnp.ndarray:
    """Flux/Open-Sora resolution-shifted schedule: mu is linear in the
    image token count between (256, 0.5) and (4096, 1.15); each t maps to
    exp(mu) / (exp(mu) + (1/t - 1)) (Open-Sora get_schedule(shift=True),
    used at run_full_tta_opensora.py:186-191)."""
    import math

    m = (1.15 - 0.5) / (4096 - 256)
    mu = m * image_seq_len + (0.5 - m * 256)
    e = math.exp(mu)
    safe = jnp.where(ts > 0, ts, 1.0)
    return jnp.where(ts > 0, e / (e + (1.0 / safe - 1.0)), 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_gen_latents", "num_steps", "lat_h", "lat_w",
                     "guidance", "guidance_img", "shift", "attn_impl",
                     "pab_cfg", "cfgr_cfg"),
)
def sample_latents_mmdit(
    params: Dict[str, Any],
    cfg,                           # MMDiTConfig
    rng: jax.Array,
    txt3: jnp.ndarray,             # [3B, L, D_t5]: [prompt, neg, neg]
    y_vec3: jnp.ndarray,           # [3B, D_clip]
    *,
    num_gen_latents: int,
    num_steps: int,
    lat_h: int,
    lat_w: int,
    cond_latents: Optional[jnp.ndarray] = None,  # [B, C, T_cond, H, W]
    adapters=None,
    guidance: float = 7.5,
    guidance_img: float = 3.0,
    shift: bool = True,
    attn_impl: Optional[str] = None,
    pab_cfg=None,
    cfgr_cfg=None,
) -> jnp.ndarray:
    """Open-Sora v2 v2v/i2v denoise loop as one ``lax.scan``
    (reference: run_full_tta_opensora.py:149-260): triple-batch CFG
    [cond | txt-uncond+cond | no-cond], oscillating image/text guidance
    combine, Euler updates on the shifted schedule. Returns the full
    latent volume [B, C, T_cond + num_gen, H, W] (cond region included,
    matching the reference's masked-conditioning layout)."""
    x, cond3, t_pairs = _mmdit_setup(
        cfg, rng, txt3, num_gen_latents, num_steps, lat_h, lat_w,
        cond_latents, shift)
    g_vec = jnp.full((txt3.shape[0],), guidance, jnp.float32)
    cache, pab_flags = _mmdit_pab_init(
        cfg, txt3, num_gen_latents, num_steps, lat_h, lat_w,
        cond_latents, pab_cfg)
    deltas = cfg_flags = None
    if cfgr_cfg is not None:
        deltas = (jnp.zeros_like(x), jnp.zeros_like(x))
        cfg_flags = _cfg_reuse_flags(num_steps, cfgr_cfg)
    step = _mmdit_denoise_step(params, cfg, txt3, y_vec3, cond3, g_vec,
                               guidance, guidance_img, adapters,
                               attn_impl, pab=pab_cfg is not None,
                               cfgr=cfgr_cfg is not None)
    (x, _, _), _ = jax.lax.scan(step, (x, cache, deltas),
                                (t_pairs, pab_flags, cfg_flags))
    return x


def _mmdit_pab_init(cfg, txt3, num_gen_latents, num_steps, lat_h, lat_w,
                    cond_latents, pab_cfg):
    if pab_cfg is None:
        return None, None
    from ..models.mmdit import pab_init_cache_mmdit

    t_cond = 0 if cond_latents is None else cond_latents.shape[2]
    cache = pab_init_cache_mmdit(cfg, txt3.shape[0],
                                 t_cond + num_gen_latents, lat_h, lat_w,
                                 txt3.shape[1])
    return cache, _pab_reuse_flags(num_steps, pab_cfg)


def _mmdit_setup(cfg, rng, txt3, num_gen_latents, num_steps, lat_h, lat_w,
                 cond_latents, shift):
    """Shared noise-draw / triple-CFG conditioning / schedule setup for
    the one-dispatch and segmented MMDiT samplers — a single source so
    the 'numerically identical' contract can't drift between them."""
    from ..tta.losses import _mmdit_cond_input

    B = txt3.shape[0] // 3
    C = cfg.in_channels
    t_cond = 0 if cond_latents is None else cond_latents.shape[2]
    T = t_cond + num_gen_latents
    x = jax.random.normal(rng, (B, C, T, lat_h, lat_w), jnp.float32)
    if cond_latents is not None:
        cond_in = _mmdit_cond_input(cond_latents, T)          # [B, 1+C, ...]
        cond3 = jnp.concatenate(
            [cond_in, cond_in, jnp.zeros_like(cond_in)], axis=0)
    else:
        cond3 = None
    seq_len = T * (lat_h // cfg.patch_size) * (lat_w // cfg.patch_size)
    ts = jnp.linspace(1.0, 0.0, num_steps + 1)
    if shift:
        ts = flux_time_shift(ts, seq_len)
    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=1)
    return x, cond3, t_pairs


def _mmdit_denoise_step(params, cfg, txt3, y_vec3, cond3, g_vec, guidance,
                        guidance_img, adapters, attn_impl, pab=False,
                        cfgr=False):
    """Shared denoise-step body for the one-dispatch and segmented
    MMDiT samplers (identical math by construction), over a unified
    carry ``(x, attn_caches, deltas)`` and xs
    ``(t_pair, pab_flag, cfg_flag)`` (unused slots None).

    ``cfgr``: CFG guidance-delta reuse for the triple-CFG batch
    [cond, uncond, uncond2] (FasterCache, arXiv:2410.19355): reuse
    steps run only the conditional third (batch B, ONE-THIRD the model
    FLOPs; PAB caches' first third sliced per block in-scan via
    mmdit_forward cache_cond_first) and reconstruct
    ``u = c - d1`` and ``u2 = u - d2`` from the two deltas cached at
    the last full step."""
    B = txt3.shape[0] // 3

    from ..models.mmdit import mmdit_forward

    def combine(x, pred, t_curr, t_prev):
        c_pred, u_pred, u2_pred = pred[:B], pred[B:2 * B], pred[2 * B:]
        combined = (u2_pred + guidance_img * (u_pred - u2_pred)
                    + guidance * (c_pred - u_pred))
        return x + (t_prev - t_curr) * combined

    def forward(x, t_curr, p_reuse, cache, cond_only=False):
        nb = B if cond_only else 3 * B
        xb = x if cond_only else jnp.concatenate([x, x, x], axis=0)
        out = mmdit_forward(
            params, cfg, xb, jnp.broadcast_to(t_curr, (nb,)),
            txt3[:B] if cond_only else txt3,
            y_vec3[:B] if cond_only else y_vec3,
            cond=(None if cond3 is None else
                  (cond3[:B] if cond_only else cond3)),
            guidance=g_vec[:B] if cond_only else g_vec,
            adapters=adapters, attn_impl=attn_impl,
            pab_reuse=p_reuse, pab_cache=cache,
            cache_cond_first=cond_only,
        )
        return out if cache is not None else (out, None)

    def step(carry, inp):
        x, cache, deltas = carry
        t_pair, p_reuse, c_reuse = inp
        t_curr, t_prev = t_pair[0], t_pair[1]
        if not cfgr:
            pred, cache = forward(x, t_curr, p_reuse, cache)
        else:
            def _full(ops):
                x, cache, _d = ops
                pred, c = forward(x, t_curr, p_reuse, cache)
                cp, up, u2p = pred[:B], pred[B:2 * B], pred[2 * B:]
                return pred, c, (cp - up, up - u2p)

            def _reuse(ops):
                x, cache, (d1, d2) = ops
                cp, c_first = forward(x, t_curr, p_reuse, cache,
                                      cond_only=True)
                up = cp - d1.astype(cp.dtype)
                u2p = up - d2.astype(cp.dtype)
                pred = jnp.concatenate([cp, up, u2p], axis=0)
                if cache is not None:
                    # write the refreshed conditional third back into
                    # each cache (double, single)
                    cache = jax.tree.map(
                        lambda full, half: full.at[:, :B].set(half),
                        cache, c_first)
                return pred, cache, (d1, d2)

            pred, cache, deltas = jax.lax.cond(
                c_reuse, _reuse, _full, (x, cache, deltas))
        return (combine(x, pred, t_curr, t_prev), cache, deltas), None

    return step


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "guidance", "guidance_img", "attn_impl",
                     "pab", "cfgr"),
    donate_argnums=(2,))
def _mmdit_scan_segment(params, cfg, carry, xs, txt3, y_vec3, cond3,
                        adapters, guidance, guidance_img, attn_impl, *,
                        pab=False, cfgr=False):
    g_vec = jnp.full((txt3.shape[0],), guidance, jnp.float32)
    step = _mmdit_denoise_step(params, cfg, txt3, y_vec3, cond3, g_vec,
                               guidance, guidance_img, adapters, attn_impl,
                               pab=pab, cfgr=cfgr)
    carry, _ = jax.lax.scan(step, carry, xs)
    return carry


def sample_latents_mmdit_segmented(
    params, cfg, rng, txt3, y_vec3, *, num_gen_latents, num_steps,
    lat_h, lat_w, segment_steps, cond_latents=None, adapters=None,
    guidance: float = 7.5, guidance_img: float = 3.0, shift: bool = True,
    attn_impl=None, pab_cfg=None, cfgr_cfg=None,
):
    """``sample_latents_mmdit`` split into bounded device dispatches
    (the long-execution-fault workaround, same as
    sample_latents_segmented). Numerically identical: same noise draw,
    same per-step math via the shared setup + step body. ``pab_cfg``
    carries the attention caches across segments with global flags;
    ``cfgr_cfg`` carries the two guidance deltas the same way."""
    x, cond3, t_pairs = _mmdit_setup(
        cfg, rng, txt3, num_gen_latents, num_steps, lat_h, lat_w,
        cond_latents, shift)
    cache, pab_flags = _mmdit_pab_init(
        cfg, txt3, num_gen_latents, num_steps, lat_h, lat_w,
        cond_latents, pab_cfg)
    deltas = cfg_flags = None
    if cfgr_cfg is not None:
        deltas = (jnp.zeros_like(x), jnp.zeros_like(x))
        cfg_flags = _cfg_reuse_flags(num_steps, cfgr_cfg)
    carry = (x, cache, deltas)
    seg = max(1, int(segment_steps))
    for s in range(0, num_steps, seg):
        xs = (t_pairs[s:s + seg],
              None if pab_flags is None else pab_flags[s:s + seg],
              None if cfg_flags is None else cfg_flags[s:s + seg])
        carry = _mmdit_scan_segment(
            params, cfg, carry, xs, txt3, y_vec3, cond3, adapters,
            guidance, guidance_img, attn_impl, pab=pab_cfg is not None,
            cfgr=cfgr_cfg is not None)
        carry[0].block_until_ready()
    return carry[0]


# ---------------------------------------------------------------------------
# CogVideoX sampling (DDIM, v-prediction, zero-terminal-SNR)
# ---------------------------------------------------------------------------


def cogvideox_alphas_cumprod(num_train_timesteps: int = 1000,
                             beta_start: float = 0.00085,
                             beta_end: float = 0.012) -> jnp.ndarray:
    """CogVideoXDDIMScheduler constants: scaled-linear betas rescaled for
    zero terminal SNR (Lin et al., the diffusers rescale_zero_terminal_snr
    recipe the CogVideoX config enables)."""
    betas = jnp.linspace(beta_start ** 0.5, beta_end ** 0.5,
                         num_train_timesteps) ** 2
    alphas_bar = jnp.cumprod(1.0 - betas)
    # rescale so the final alpha_bar is exactly 0
    sqrt_ab = jnp.sqrt(alphas_bar)
    sqrt_ab = (sqrt_ab - sqrt_ab[-1]) * (
        sqrt_ab[0] / (sqrt_ab[0] - sqrt_ab[-1]))
    return sqrt_ab ** 2


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_gen_latents", "num_steps", "lat_h",
                     "lat_w", "guidance", "attn_impl", "pab_cfg",
                     "cfgr_cfg"),
)
def sample_latents_cogvideox(
    params: Dict[str, Any],
    cfg,                           # CogVideoXConfig
    rng: jax.Array,
    text_emb2: jnp.ndarray,        # [2B, L, 4096]: [neg, pos]
    *,
    num_gen_latents: int,
    num_steps: int,
    lat_h: int,
    lat_w: int,
    cond_latents: Optional[jnp.ndarray] = None,  # [B, C, T_cond, H, W]
    adapters=None,
    guidance: float = 6.0,
    attn_impl: Optional[str] = None,
    pab_cfg=None,
    cfgr_cfg=None,
) -> jnp.ndarray:
    """CogVideoX-I2V DDIM (eta=0) v-prediction loop as one ``lax.scan``
    (the diffusers CogVideoXImageToVideoPipeline denoise semantics used
    at common_cogvideo.py:283-322): 2-batch CFG, image-latent channels
    carry the conditioning frame. Returns the full latent volume
    [B, C, T_cond + num_gen, H, W].

    ``pab_cfg``: Pyramid Attention Broadcast over the joint-attention
    outputs (models/cogvideox.py pab_* plumbing). ``cfgr_cfg``: CFG
    guidance-delta reuse (config.CFGReuseConfig; conditional-only
    forwards on reuse steps)."""
    x, img_lat2, xs = _cogvideox_setup(
        cfg, rng, text_emb2, num_gen_latents, num_steps, lat_h, lat_w,
        cond_latents)
    cache, pab_flags = _cogvideox_pab_init(
        cfg, text_emb2, num_gen_latents, num_steps, lat_h, lat_w,
        cond_latents, pab_cfg)
    delta = cfg_flags = None
    if cfgr_cfg is not None:
        delta = jnp.zeros_like(x)
        cfg_flags = _cfg_reuse_flags(num_steps, cfgr_cfg)
    step = _cogvideox_denoise_step(params, cfg, text_emb2, img_lat2,
                                   guidance, adapters, attn_impl,
                                   pab=pab_cfg is not None,
                                   cfgr=cfgr_cfg is not None)
    (x, _, _), _ = jax.lax.scan(step, (x, cache, delta),
                                (*xs, pab_flags, cfg_flags))
    return x


def _cogvideox_pab_init(cfg, text_emb2, num_gen_latents, num_steps,
                        lat_h, lat_w, cond_latents, pab_cfg):
    if pab_cfg is None:
        return None, None
    from ..models.cogvideox import pab_init_cache_cogvideox

    t_cond = 0 if cond_latents is None else cond_latents.shape[2]
    cache = pab_init_cache_cogvideox(
        cfg, text_emb2.shape[0], t_cond + num_gen_latents, lat_h, lat_w,
        text_emb2.shape[1])
    return cache, _pab_reuse_flags(num_steps, pab_cfg)


def _cogvideox_setup(cfg, rng, text_emb2, num_gen_latents, num_steps,
                     lat_h, lat_w, cond_latents):
    """Shared noise-draw / image-latent conditioning / DDIM schedule
    setup for the one-dispatch and segmented CogVideoX samplers.
    Returns (x, img_lat2, (step_idx, ab_t, ab_prev))."""
    from ..tta.losses import _cogvideox_image_latents

    B = text_emb2.shape[0] // 2
    C = cfg.latent_channels
    t_cond = 0 if cond_latents is None else cond_latents.shape[2]
    T = t_cond + num_gen_latents
    x = jax.random.normal(rng, (B, C, T, lat_h, lat_w), jnp.float32)
    img_lat = (None if cond_latents is None
               else _cogvideox_image_latents(cond_latents, T))
    img_lat2 = None if img_lat is None else jnp.concatenate(
        [img_lat, img_lat], axis=0)
    ab = cogvideox_alphas_cumprod()
    n_train = ab.shape[0]
    step_idx = jnp.round(
        jnp.linspace(n_train - 1, 0, num_steps)).astype(jnp.int32)
    # pairs (t, t_prev); alpha_prev at t<0 is 1
    ab_t = ab[step_idx]
    ab_prev = jnp.concatenate([ab[step_idx[1:]], jnp.ones((1,))])
    return x, img_lat2, (step_idx, ab_t, ab_prev)


def _cogvideox_denoise_step(params, cfg, text_emb2, img_lat2, guidance,
                            adapters, attn_impl, pab=False, cfgr=False):
    """Shared DDIM v-pred step body for the one-dispatch and segmented
    CogVideoX samplers, over a unified carry ``(x, attn_cache, delta)``
    (``attn_cache``/``delta`` are None when PAB / CFG-reuse is off) and
    xs ``(t, a_t, a_prev, pab_flag, cfg_flag)`` (flags None when off).

    ``cfgr``: CFG guidance-delta reuse (FasterCache, arXiv:2410.19355,
    same recipe as the LongCat ``_denoise_scan``): reuse steps run only
    the conditional branch (batch B; the PAB cache's conditional half
    sliced per block in-scan via cache_cond_half) and reconstruct
    ``v_uncond = v_cond - delta``."""
    B = text_emb2.shape[0] // 2

    from ..models.cogvideox import cogvideox_forward

    def ddim(x, v, a_t, a_prev):
        sq_a, sq_1a = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
        x0 = sq_a * x - sq_1a * v
        eps = sq_1a * x + sq_a * v
        return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps

    def forward(x, t, p_reuse, cache, cond_only=False):
        nb = B if cond_only else 2 * B
        xb = x if cond_only else jnp.concatenate([x, x], axis=0)
        out = cogvideox_forward(
            params, cfg, xb, jnp.broadcast_to(t, (nb,)).astype(
                jnp.float32),
            text_emb2[B:] if cond_only else text_emb2,
            image_latents=(None if img_lat2 is None else
                           (img_lat2[B:] if cond_only else img_lat2)),
            adapters=adapters, attn_impl=attn_impl,
            pab_reuse=p_reuse, pab_cache=cache,
            cache_cond_half=cond_only,
        )
        return out if cache is not None else (out, None)

    def step(carry, inp):
        x, cache, delta = carry
        t, a_t, a_prev, p_reuse, c_reuse = inp
        if not cfgr:
            pred, cache = forward(x, t, p_reuse, cache)
            uncond, cond = pred[:B], pred[B:]
        else:
            def _full(ops):
                x, cache, _d = ops
                pred, c = forward(x, t, p_reuse, cache)
                return pred, c, pred[B:] - pred[:B]

            def _reuse(ops):
                x, cache, d = ops
                cond, c_half = forward(x, t, p_reuse, cache,
                                       cond_only=True)
                pred = jnp.concatenate(
                    [cond - d.astype(cond.dtype), cond], axis=0)
                c = cache if cache is None else cache.at[:, B:].set(c_half)
                return pred, c, d

            pred, cache, delta = jax.lax.cond(
                c_reuse, _reuse, _full, (x, cache, delta))
            uncond, cond = pred[:B], pred[B:]
        v = uncond + guidance * (cond - uncond)
        return (ddim(x, v, a_t, a_prev), cache, delta), None

    return step


@functools.partial(jax.jit,
                   static_argnames=("cfg", "guidance", "attn_impl",
                                    "pab", "cfgr"),
                   donate_argnums=(2,))  # carry (x, attn cache, delta)
def _cogvideox_scan_segment(params, cfg, carry, xs, text_emb2, img_lat2,
                            adapters, guidance, attn_impl, *, pab=False,
                            cfgr=False):
    step = _cogvideox_denoise_step(params, cfg, text_emb2, img_lat2,
                                   guidance, adapters, attn_impl,
                                   pab=pab, cfgr=cfgr)
    carry, _ = jax.lax.scan(step, carry, xs)
    return carry


def sample_latents_cogvideox_segmented(
    params, cfg, rng, text_emb2, *, num_gen_latents, num_steps, lat_h,
    lat_w, segment_steps, cond_latents=None, adapters=None,
    guidance: float = 6.0, attn_impl=None, pab_cfg=None, cfgr_cfg=None,
):
    """``sample_latents_cogvideox`` split into bounded device dispatches
    (long-execution-fault workaround); numerically identical by
    construction (same shared setup + step body). ``pab_cfg`` carries
    the attention cache across segments with global step flags;
    ``cfgr_cfg`` carries the guidance delta the same way."""
    x, img_lat2, (step_idx, ab_t, ab_prev) = _cogvideox_setup(
        cfg, rng, text_emb2, num_gen_latents, num_steps, lat_h, lat_w,
        cond_latents)
    cache, pab_flags = _cogvideox_pab_init(
        cfg, text_emb2, num_gen_latents, num_steps, lat_h, lat_w,
        cond_latents, pab_cfg)
    delta = cfg_flags = None
    if cfgr_cfg is not None:
        delta = jnp.zeros_like(x)
        cfg_flags = _cfg_reuse_flags(num_steps, cfgr_cfg)
    carry = (x, cache, delta)
    seg = max(1, int(segment_steps))
    for s in range(0, num_steps, seg):
        xs = (step_idx[s:s + seg], ab_t[s:s + seg], ab_prev[s:s + seg],
              None if pab_flags is None else pab_flags[s:s + seg],
              None if cfg_flags is None else cfg_flags[s:s + seg])
        carry = _cogvideox_scan_segment(
            params, cfg, carry, xs, text_emb2, img_lat2, adapters,
            guidance, attn_impl, pab=pab_cfg is not None,
            cfgr=cfgr_cfg is not None)
        carry[0].block_until_ready()
    return carry[0]
