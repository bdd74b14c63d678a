"""TTA latent split + frame-budget guards.

Behavior-compatible with the reference:
- ``split_tta_latents``          common.py:1365-1401
- ``estimate_tta_split_budget``  common.py:1493-1517
- ``validate_tta_feature_budget``common.py:1533-1598
- GT-leak clamp                  run_delta_a.py:414-429
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from ..config import ClipGateConfig, EarlyStoppingConfig, FrameConfig


def split_tta_latents(
    latents: jnp.ndarray,
    num_context_latents: int,
    holdout_fraction: float = 0.25,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """[B, C, T, H, W] -> (cond, train, val or None) along T.

    cond = leading clean context (timestep 0, never noised);
    T_val = max(1, int(remainder * holdout)); degenerate remainders fall
    back to train-only. Matches common.py:1365-1401 exactly.
    """
    t_total = latents.shape[2]
    t_cond = min(num_context_latents, t_total - 1)
    remainder = t_total - t_cond
    t_val = max(1, int(remainder * holdout_fraction))
    t_train = remainder - t_val
    if t_train < 1:
        t_train = remainder
        t_val = 0
    cond = latents[:, :, :t_cond]
    train = latents[:, :, t_cond:t_cond + t_train]
    val = latents[:, :, t_cond + t_train:] if t_val > 0 else None
    return cond, train, val


def estimate_latent_len(num_pixel_frames: int, vae_t_scale: int = 4) -> int:
    n = max(1, int(num_pixel_frames))
    return 1 + (n - 1) // int(vae_t_scale)


def estimate_tta_split_budget(
    tta_total_frames: int,
    tta_context_frames: int,
    holdout_fraction: float = 0.25,
    vae_t_scale: int = 4,
) -> Dict[str, int]:
    """Mirror of split_tta_latents sizing for the pre-flight guard."""
    t_total = estimate_latent_len(tta_total_frames, vae_t_scale)
    t_ctx = estimate_latent_len(tta_context_frames, vae_t_scale)
    t_cond = min(t_ctx, t_total - 1)
    remainder = t_total - t_cond
    t_val = max(1, int(remainder * float(holdout_fraction)))
    t_train = remainder - t_val
    if t_train < 1:
        t_train = remainder
        t_val = 0
    return {
        "total_latents": t_total,
        "cond_latents": t_cond,
        "train_latents": t_train,
        "val_latents": t_val,
    }


def round_frames_4k1_down(num_frames: int) -> int:
    """Largest 4k+1 <= num_frames (>=1).

    The causal VAE encodes 4k+1-frame windows exactly; a non-4k+1 window
    silently drops its trailing frames at the encoder, shifting the
    cond/gen pixel boundary off the anchor. Rounding the *cond* side
    down (dropping the oldest frames) keeps the window flush with the
    anchor instead."""
    return ((max(int(num_frames), 1) - 1) // 4) * 4 + 1


def resolve_frame_window(frames: FrameConfig) -> FrameConfig:
    """Apply the reference's defaulting + GT-leak clamp
    (run_delta_a.py:414-429): tta_total defaults to num_cond_frames, the
    window may never cross the anchor. Cond/TTA windows are additionally
    rounded down to 4k+1 so the causal-VAE latent boundary lands exactly
    on the anchor frame."""
    import dataclasses

    ncond = round_frames_4k1_down(frames.num_cond_frames)
    if ncond != frames.num_cond_frames:
        print(
            f"[WARN] num_cond_frames ({frames.num_cond_frames}) is not "
            f"4k+1; using {ncond} (oldest frames dropped so the window "
            f"stays flush with the anchor)."
        )
    frames = dataclasses.replace(frames, num_cond_frames=ncond)

    total = frames.tta_total_frames
    ctx = frames.tta_context_frames
    if total is None:
        total = frames.num_cond_frames
    else:
        r = round_frames_4k1_down(total)
        if r != total:
            print(f"[WARN] tta_total_frames ({total}) is not 4k+1; "
                  f"using {r}.")
        total = r
    if ctx is None or ctx > total:
        ctx = min(frames.num_cond_frames, total)
    if total > frames.gen_start_frame:
        print(
            f"[WARN] tta_total_frames ({total}) exceeds gen_start_frame "
            f"({frames.gen_start_frame}); clamping to avoid GT leakage."
        )
        total = round_frames_4k1_down(frames.gen_start_frame)
    if ctx > total:
        ctx = total
    return dataclasses.replace(
        frames, tta_total_frames=total, tta_context_frames=ctx
    )


def _estimate_clip_candidate_frames(
    tta_total_frames: int, sampling_mode: str, late_fraction: float
) -> int:
    window = max(1, int(tta_total_frames))
    if (sampling_mode or "full_window").lower() == "late_only":
        frac = min(max(float(late_fraction), 1e-6), 1.0)
        return max(1, int(round(window * frac)))
    return window


def validate_tta_feature_budget(
    frames: FrameConfig,
    es: EarlyStoppingConfig,
    clip_gate: ClipGateConfig,
    guard_mode: str = "fail",
    context: str = "",
) -> Dict[str, Any]:
    """Pre-flight guard: enabled features must have enough frames
    (common.py:1533-1598). guard_mode: fail | warn | off."""
    mode = (guard_mode or "fail").lower()
    if mode not in {"fail", "warn", "off"}:
        mode = "fail"
    prefix = f"[feature_budget:{context}]" if context else "[feature_budget]"
    info: Dict[str, Any] = {}
    issues = []

    total = int(frames.tta_total_frames or 0)
    ctx = int(frames.tta_context_frames or 0)
    split = estimate_tta_split_budget(total, ctx, es.holdout_fraction)
    info["split_budget"] = split

    if es.enabled and split["val_latents"] < 1:
        issues.append(
            f"ES is enabled but estimated val_latents=0 (tta_total_frames="
            f"{total}, tta_context_frames={ctx}, holdout="
            f"{es.holdout_fraction}). Increase tta_total_frames and/or "
            f"reduce tta_context_frames."
        )

    if clip_gate.enabled:
        required = clip_gate.sample_frames if clip_gate.backend != "xclip" else 8
        candidates = _estimate_clip_candidate_frames(
            total, clip_gate.sampling_mode, clip_gate.late_fraction
        )
        info["clip_candidates"] = candidates
        info["clip_required_frames"] = required
        if candidates < required:
            issues.append(
                f"CLIP gate enabled but candidate frames < required "
                f"(candidates={candidates}, required={required})."
            )

    if mode != "off":
        print(
            f"{prefix} split(total={split['total_latents']}, "
            f"cond={split['cond_latents']}, train={split['train_latents']}, "
            f"val={split['val_latents']})"
        )
    if issues:
        msg = f"{prefix} " + " | ".join(issues)
        if mode == "warn":
            print(f"WARNING: {msg}")
        elif mode == "fail":
            raise RuntimeError(msg)
    return info
