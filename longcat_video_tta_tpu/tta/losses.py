"""Flow-matching TTA losses as pure jitted functions.

The four variants of the reference (SURVEY.md §2.1):
- ``flow_matching_loss``              (common.py:274-343)
- ``flow_matching_loss_fixed``        (common.py:346-407)
- ``flow_matching_loss_conditioned``  (common.py:414-489, the workhorse)
- ``flow_matching_loss_conditioned_fixed`` (common.py:492-559, early stop)

Conventions (identical to the reference): x_t = (1-σ)x₀ + σε, target
v = ε - x₀, σ ~ U[1e-3, 1], per-latent-frame timestep σ·1000, loss in
fp32; the conditioned variants concatenate [cond_clean | noisy_target]
with timesteps [0.., σ·1000..] and ``num_cond_latents``, MSE on the
target slice only.

Differences by design: noise comes from explicit jax PRNG keys (the
fixed variants derive per-draw keys from a base seed) instead of torch
global / Generator state.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import DiTConfig
from ..models.dit import dit_forward

NUM_TRAIN_TIMESTEPS = 1000.0


@functools.partial(
    jax.jit, static_argnames=("cfg", "sigma_min", "sigma_max", "attn_impl")
)
def flow_matching_loss(
    dit_params: Dict[str, Any],
    cfg: DiTConfig,
    latents: jnp.ndarray,           # [B, C, T, H, W] clean
    text_emb: jnp.ndarray,
    text_mask: Optional[jnp.ndarray],
    rng: jax.Array,
    *,
    adapters=None,
    sigma_min: float = 0.001,
    sigma_max: float = 1.0,
    attn_impl: Optional[str] = None,
) -> jnp.ndarray:
    """Unconditioned rectified-flow MSE (reference: common.py:274-343)."""
    B = latents.shape[0]
    k_sig, k_noise = jax.random.split(rng)
    sigma = jax.random.uniform(k_sig, (B,), minval=sigma_min, maxval=sigma_max)
    noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
    lat32 = latents.astype(jnp.float32)
    noisy = (1.0 - sigma.reshape(B, 1, 1, 1, 1)) * lat32 \
        + sigma.reshape(B, 1, 1, 1, 1) * noise
    nt = latents.shape[2] // cfg.patch_size[0]
    timestep = jnp.broadcast_to(
        (sigma * NUM_TRAIN_TIMESTEPS)[:, None], (B, nt)
    )
    pred = dit_forward(
        dit_params, cfg, noisy, timestep, text_emb, text_mask,
        adapters=adapters, attn_impl=attn_impl,
    )
    target = noise - lat32
    return jnp.mean((pred - target) ** 2)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "fixed_sigmas", "noise_draws", "attn_impl"),
)
def flow_matching_loss_fixed(
    dit_params: Dict[str, Any],
    cfg: DiTConfig,
    latents: jnp.ndarray,
    text_emb: jnp.ndarray,
    text_mask: Optional[jnp.ndarray],
    *,
    fixed_sigmas: Tuple[float, ...],
    noise_draws: int = 1,
    noise_seed: int = 42,
    adapters=None,
    attn_impl: Optional[str] = None,
) -> jnp.ndarray:
    """Deterministic eval loss at fixed sigmas x seeded draws
    (reference: common.py:346-407, seeds 42+i)."""
    B = latents.shape[0]
    nt = latents.shape[2] // cfg.patch_size[0]
    lat32 = latents.astype(jnp.float32)
    # one scanned forward instead of an unrolled sigmas x draws product
    # (unrolling multiplies XLA compile cost by the grid size)
    noises = jnp.stack([
        jax.random.normal(jax.random.PRNGKey(noise_seed + d), latents.shape,
                          jnp.float32)
        for d in range(noise_draws)
    ])
    sig = jnp.repeat(jnp.asarray(fixed_sigmas, jnp.float32), noise_draws)
    noi = jnp.concatenate([noises] * len(fixed_sigmas), axis=0)

    def body(acc, sn):
        sigma, noise = sn
        noisy = (1.0 - sigma) * lat32 + sigma * noise
        timestep = jnp.broadcast_to(sigma * NUM_TRAIN_TIMESTEPS, (B, nt))
        pred = dit_forward(
            dit_params, cfg, noisy, timestep, text_emb, text_mask,
            adapters=adapters, attn_impl=attn_impl,
        )
        return acc + jnp.mean((pred - (noise - lat32)) ** 2), None

    total, _ = jax.lax.scan(body, jnp.zeros(()), (sig, noi))
    return total / sig.shape[0]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sigma_min", "sigma_max", "attn_impl",
                     "cp_mesh"),
)
def flow_matching_loss_conditioned(
    dit_params: Dict[str, Any],
    cfg: DiTConfig,
    cond_latents: jnp.ndarray,      # [B, C, T_cond, H, W] clean context
    target_latents: jnp.ndarray,    # [B, C, T_target, H, W]
    text_emb: jnp.ndarray,
    text_mask: Optional[jnp.ndarray],
    rng: jax.Array,
    *,
    adapters=None,
    sigma_min: float = 0.001,
    sigma_max: float = 1.0,
    attn_impl: Optional[str] = None,
    cp_mesh=None,
    num_valid_target: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Conditioning-aware loss replicating LongCat inference
    (reference: common.py:414-489). ``cp_mesh`` shards self-attention
    over the mesh context axis.

    ``num_valid_target``: optional traced int32 — target latent frames at
    index >= this are shape-bucketing padding: masked out of attention
    (dit_forward num_valid_latents) and of the MSE, so the loss over the
    valid region is independent of pad contents and one compile serves
    every geometry in the bucket."""
    B = cond_latents.shape[0]
    pt = cfg.patch_size[0]
    t_cond = cond_latents.shape[2]
    t_tgt = target_latents.shape[2]
    n_cond, n_tgt = t_cond // pt, t_tgt // pt

    k_sig, k_noise = jax.random.split(rng)
    sigma = jax.random.uniform(k_sig, (B,), minval=sigma_min, maxval=sigma_max)
    noise = jax.random.normal(k_noise, target_latents.shape, jnp.float32)
    tgt32 = target_latents.astype(jnp.float32)
    noisy_tgt = (1.0 - sigma.reshape(B, 1, 1, 1, 1)) * tgt32 \
        + sigma.reshape(B, 1, 1, 1, 1) * noise

    hidden = jnp.concatenate(
        [cond_latents.astype(jnp.float32), noisy_tgt], axis=2
    )
    timestep = jnp.concatenate(
        [
            jnp.zeros((B, n_cond)),
            jnp.broadcast_to((sigma * NUM_TRAIN_TIMESTEPS)[:, None],
                             (B, n_tgt)),
        ],
        axis=1,
    )
    pred = dit_forward(
        dit_params, cfg, hidden, timestep, text_emb, text_mask,
        num_cond_latents=t_cond, adapters=adapters, attn_impl=attn_impl,
        cp_mesh=cp_mesh,
        num_valid_latents=(None if num_valid_target is None
                           else t_cond + num_valid_target),
    )
    pred_tgt = pred[:, :, t_cond:]
    err = (pred_tgt - (noise - tgt32)) ** 2
    if num_valid_target is None:
        return jnp.mean(err)
    m = (jnp.arange(t_tgt) < num_valid_target).astype(jnp.float32)
    valid_elems = (jnp.asarray(num_valid_target, jnp.float32)
                   * (err.size / t_tgt))
    return jnp.sum(err * m[None, None, :, None, None]) / valid_elems


@functools.partial(
    jax.jit, static_argnames=("cfg", "fixed_sigmas", "attn_impl", "cp_mesh")
)
def flow_matching_loss_conditioned_fixed(
    dit_params: Dict[str, Any],
    cfg: DiTConfig,
    cond_latents: jnp.ndarray,
    target_latents: jnp.ndarray,
    text_emb: jnp.ndarray,
    text_mask: Optional[jnp.ndarray],
    fixed_noises: jnp.ndarray,      # [n_draws, B, C, T_target, H, W]
    *,
    fixed_sigmas: Tuple[float, ...],
    adapters=None,
    attn_impl: Optional[str] = None,
    cp_mesh=None,
) -> jnp.ndarray:
    """Deterministic conditioned anchor loss for the early stopper
    (reference: common.py:492-559; caller supplies pre-drawn noises).
    ``cp_mesh`` shards the anchor forward's self-attention over the mesh
    context axis, matching the train-step sharding."""
    B = cond_latents.shape[0]
    pt = cfg.patch_size[0]
    t_cond = cond_latents.shape[2]
    t_tgt = target_latents.shape[2]
    n_cond, n_tgt = t_cond // pt, t_tgt // pt
    tgt32 = target_latents.astype(jnp.float32)
    cond32 = cond_latents.astype(jnp.float32)

    n_draws = fixed_noises.shape[0]
    # Evaluate the |sigmas| x |draws| grid as ONE batched forward of
    # G*B rows instead of a G-iteration scan: at anchor-eval sequence
    # lengths a single-row forward underutilizes the MXU, so batching
    # the grid cuts the ES check's wall time ~G-fold for the same FLOPs
    # (VERDICT r4 #7 — the reference runs the grid as separate no-grad
    # forwards, common.py:492-559). Forward-only, so the G-fold
    # activation growth is a few transient [G*B, tokens, hidden]
    # buffers — small next to the train step's saved residuals.
    G = n_draws * len(fixed_sigmas)
    sig = jnp.repeat(jnp.asarray(fixed_sigmas, jnp.float32), n_draws)
    noi = jnp.concatenate([fixed_noises] * len(fixed_sigmas), axis=0)
    # [G, B, C, T, H, W] -> [G*B, ...]
    noi = noi.reshape((G * B,) + noi.shape[2:])
    sig_rows = jnp.repeat(sig, B)[:, None, None, None, None]
    tgt_g = jnp.tile(tgt32, (G, 1, 1, 1, 1))
    noisy = (1.0 - sig_rows) * tgt_g + sig_rows * noi
    hidden = jnp.concatenate([jnp.tile(cond32, (G, 1, 1, 1, 1)), noisy],
                             axis=2)
    timestep = jnp.concatenate(
        [jnp.zeros((G * B, n_cond)),
         jnp.broadcast_to(jnp.repeat(sig, B)[:, None]
                          * NUM_TRAIN_TIMESTEPS, (G * B, n_tgt))],
        axis=1,
    )
    emb_g = jnp.concatenate([text_emb] * G, axis=0)
    mask_g = (None if text_mask is None
              else jnp.concatenate([text_mask] * G, axis=0))
    pred = dit_forward(
        dit_params, cfg, hidden, timestep, emb_g, mask_g,
        num_cond_latents=t_cond, adapters=adapters, attn_impl=attn_impl,
        cp_mesh=cp_mesh,
    )
    return jnp.mean((pred[:, :, t_cond:] - (noi - tgt_g)) ** 2)


# ---------------------------------------------------------------------------
# MMDiT (Open-Sora v2) backbone losses
# ---------------------------------------------------------------------------


def _mmdit_cond_input(cond_latents, t_total):
    """[masks | masked_ref] channel input for v2v conditioning
    (common_opensora.py:314-357 build_cond_embed): masks are 1 on the
    conditioning frames, masked_ref carries the clean cond latents."""
    B, C, t_cond, H, W = cond_latents.shape
    masks = jnp.concatenate(
        [jnp.ones((B, 1, t_cond, H, W), jnp.float32),
         jnp.zeros((B, 1, t_total - t_cond, H, W), jnp.float32)], axis=2)
    ref = jnp.concatenate(
        [cond_latents.astype(jnp.float32),
         jnp.zeros((B, C, t_total - t_cond, H, W), jnp.float32)], axis=2)
    return jnp.concatenate([masks, ref], axis=1)


@functools.partial(
    jax.jit, static_argnames=("cfg", "sigma_min", "sigma_max", "guidance",
                              "attn_impl", "cp_mesh"),
)
def mmdit_flow_matching_loss_conditioned(
    dit_params: Dict[str, Any],
    cfg,                            # MMDiTConfig
    cond_latents: jnp.ndarray,      # [B, C, T_cond, H, W] clean context
    target_latents: jnp.ndarray,    # [B, C, T_target, H, W]
    txt: jnp.ndarray,               # [B, L, context_in_dim] (T5)
    y_vec: jnp.ndarray,             # [B, vec_in_dim] (CLIP pooled)
    rng: jax.Array,
    *,
    adapters=None,
    sigma_min: float = 0.001,
    sigma_max: float = 1.0,
    guidance: float = 7.5,
    attn_impl: Optional[str] = None,
    cp_mesh=None,
    num_valid_target=None,
) -> jnp.ndarray:
    """Conditioning-aware flow-matching loss for the MMDiT backbone
    (reference: common_opensora.py:360-411): conditioning rides the
    cond_embed channel input (masks + masked_ref), the timestep is a
    single per-batch sigma, noise is applied only to the target frames,
    MSE on the target slice. Engine-compatible signature (the (emb,
    mask) slots of the LongCat loss carry (txt, y_vec) here)."""
    if cp_mesh is not None or num_valid_target is not None:
        raise NotImplementedError(
            "CP / shape bucketing are not wired for the MMDiT backbone")
    B, C, t_cond = cond_latents.shape[:3]
    t_tgt = target_latents.shape[2]
    k_sig, k_noise = jax.random.split(rng)
    sigma = jax.random.uniform(k_sig, (B,), minval=sigma_min,
                               maxval=sigma_max)
    noise = jax.random.normal(k_noise, target_latents.shape, jnp.float32)
    tgt32 = target_latents.astype(jnp.float32)
    noisy = (1.0 - sigma.reshape(B, 1, 1, 1, 1)) * tgt32 \
        + sigma.reshape(B, 1, 1, 1, 1) * noise
    full = jnp.concatenate([cond_latents.astype(jnp.float32), noisy], axis=2)
    cond_in = _mmdit_cond_input(cond_latents, t_cond + t_tgt)

    from ..models.mmdit import mmdit_forward

    pred = mmdit_forward(
        dit_params, cfg, full, sigma, txt, y_vec, cond=cond_in,
        guidance=jnp.full((B,), guidance, jnp.float32),
        adapters=adapters, attn_impl=attn_impl,
    )
    return jnp.mean((pred[:, :, t_cond:] - (noise - tgt32)) ** 2)


@functools.partial(
    jax.jit, static_argnames=("cfg", "fixed_sigmas", "guidance", "attn_impl")
)
def mmdit_flow_matching_loss_conditioned_fixed(
    dit_params: Dict[str, Any],
    cfg,
    cond_latents: jnp.ndarray,
    target_latents: jnp.ndarray,
    txt: jnp.ndarray,
    y_vec: jnp.ndarray,
    fixed_noises: jnp.ndarray,      # [n_draws, B, C, T_target, H, W]
    *,
    fixed_sigmas: Tuple[float, ...],
    adapters=None,
    guidance: float = 7.5,
    attn_impl: Optional[str] = None,
) -> jnp.ndarray:
    """Deterministic MMDiT anchor loss (early-stopper analogue of
    flow_matching_loss_conditioned_fixed for the Open-Sora backbone)."""
    B, C, t_cond = cond_latents.shape[:3]
    t_tgt = target_latents.shape[2]
    tgt32 = target_latents.astype(jnp.float32)
    cond_in = _mmdit_cond_input(cond_latents, t_cond + t_tgt)
    sig = jnp.repeat(jnp.asarray(fixed_sigmas, jnp.float32),
                     fixed_noises.shape[0])
    noi = jnp.concatenate([fixed_noises] * len(fixed_sigmas), axis=0)

    from ..models.mmdit import mmdit_forward

    def body(acc, sn):
        sigma, noise = sn
        noisy = (1.0 - sigma) * tgt32 + sigma * noise
        full = jnp.concatenate(
            [cond_latents.astype(jnp.float32), noisy], axis=2)
        pred = mmdit_forward(
            dit_params, cfg, full, jnp.broadcast_to(sigma, (B,)), txt,
            y_vec, cond=cond_in,
            guidance=jnp.full((B,), guidance, jnp.float32),
            adapters=adapters, attn_impl=attn_impl,
        )
        return acc + jnp.mean((pred[:, :, t_cond:] - (noise - tgt32)) ** 2), None

    total, _ = jax.lax.scan(body, jnp.zeros(()), (sig, noi))
    return total / sig.shape[0]


# ---------------------------------------------------------------------------
# CogVideoX backbone losses
# ---------------------------------------------------------------------------


def _cogvideox_image_latents(cond_latents, t_total):
    """I2V conditioning channels: first latent frame = the encoded
    conditioning image, remaining frames zero (the CogVideoX-I2V
    channel-concat convention)."""
    B, C, _, H, W = cond_latents.shape
    return jnp.concatenate(
        [cond_latents[:, :, :1].astype(jnp.float32),
         jnp.zeros((B, C, t_total - 1, H, W), jnp.float32)], axis=2)


@functools.partial(
    jax.jit, static_argnames=("cfg", "sigma_min", "sigma_max", "attn_impl",
                              "cp_mesh"),
)
def cogvideox_flow_matching_loss_conditioned(
    dit_params: Dict[str, Any],
    cfg,                            # CogVideoXConfig
    cond_latents: jnp.ndarray,      # [B, C, T_cond, H, W]
    target_latents: jnp.ndarray,    # [B, C, T_target, H, W]
    text_emb: jnp.ndarray,          # [B, L, 4096]
    text_mask,                      # unused (engine slot)
    rng: jax.Array,
    *,
    adapters=None,
    sigma_min: float = 0.001,
    sigma_max: float = 1.0,
    attn_impl: Optional[str] = None,
    cp_mesh=None,
    num_valid_target=None,
) -> jnp.ndarray:
    """Rectified-flow TTA loss for CogVideoX
    (reference: common_cogvideo.py:184-218 — whole-window noise + MSE,
    timestep = sigma*1000; conditioning rides the I2V image-latent
    channels built from the first conditioning frame). The (cond,
    target) split follows the runner's window contract; per the
    reference this loss noises and scores the FULL window.

    NOTE (deliberate behavior parity): CogVideoX is natively a v-pred
    DDPM (the sampler uses zero-terminal-SNR DDIM v-pred algebra), yet
    the reference fine-tunes it with THIS rectified-flow objective —
    common_cogvideo.py:203-218 verbatim: noisy = (1-sigma)x + sigma*n,
    target = noise - latents. The parameterization mismatch is the
    reference's own experimental choice (its CogVideoX arm was never
    run, NOT_RUN_YET.md:55-56); we reproduce it rather than 'fix' it so
    cross-framework comparisons measure the same method."""
    if cp_mesh is not None or num_valid_target is not None:
        raise NotImplementedError(
            "CP / shape bucketing are not wired for the CogVideoX backbone")
    B = cond_latents.shape[0]
    full = jnp.concatenate([cond_latents.astype(jnp.float32),
                            target_latents.astype(jnp.float32)], axis=2)
    T = full.shape[2]
    k_sig, k_noise = jax.random.split(rng)
    sigma = jax.random.uniform(k_sig, (B,), minval=sigma_min,
                               maxval=sigma_max)
    noise = jax.random.normal(k_noise, full.shape, jnp.float32)
    noisy = (1.0 - sigma.reshape(B, 1, 1, 1, 1)) * full \
        + sigma.reshape(B, 1, 1, 1, 1) * noise

    from ..models.cogvideox import cogvideox_forward

    img_lat = (None if cfg.in_channels == cfg.latent_channels
               else _cogvideox_image_latents(cond_latents, T))
    pred = cogvideox_forward(
        dit_params, cfg, noisy, sigma * NUM_TRAIN_TIMESTEPS, text_emb,
        image_latents=img_lat, adapters=adapters, attn_impl=attn_impl,
    )
    return jnp.mean((pred - (noise - full)) ** 2)


@functools.partial(
    jax.jit, static_argnames=("cfg", "fixed_sigmas", "attn_impl")
)
def cogvideox_flow_matching_loss_conditioned_fixed(
    dit_params: Dict[str, Any],
    cfg,
    cond_latents: jnp.ndarray,
    target_latents: jnp.ndarray,
    text_emb: jnp.ndarray,
    text_mask,
    fixed_noises: jnp.ndarray,      # [n_draws, B, C, T_target, H, W]
    *,
    fixed_sigmas: Tuple[float, ...],
    adapters=None,
    attn_impl: Optional[str] = None,
) -> jnp.ndarray:
    """Deterministic CogVideoX anchor loss (early-stopper analogue):
    fixed noise on the target slice, conditioning frames kept clean, MSE
    on the target slice."""
    B = cond_latents.shape[0]
    t_cond = cond_latents.shape[2]
    tgt32 = target_latents.astype(jnp.float32)
    cond32 = cond_latents.astype(jnp.float32)
    T = t_cond + target_latents.shape[2]
    sig = jnp.repeat(jnp.asarray(fixed_sigmas, jnp.float32),
                     fixed_noises.shape[0])
    noi = jnp.concatenate([fixed_noises] * len(fixed_sigmas), axis=0)

    from ..models.cogvideox import cogvideox_forward

    img_lat = (None if cfg.in_channels == cfg.latent_channels
               else _cogvideox_image_latents(cond_latents, T))

    def body(acc, sn):
        sigma, noise = sn
        noisy = (1.0 - sigma) * tgt32 + sigma * noise
        full = jnp.concatenate([cond32, noisy], axis=2)
        pred = cogvideox_forward(
            dit_params, cfg, full,
            jnp.broadcast_to(sigma * NUM_TRAIN_TIMESTEPS, (B,)), text_emb,
            image_latents=img_lat, adapters=adapters, attn_impl=attn_impl,
        )
        return acc + jnp.mean(
            (pred[:, :, t_cond:] - (noise - tgt32)) ** 2), None

    total, _ = jax.lax.scan(body, jnp.zeros(()), (sig, noi))
    return total / sig.shape[0]
