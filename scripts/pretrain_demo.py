#!/usr/bin/env python3
"""Pretrain the longcat_demo stack on a synthetic motion distribution
(VERDICT r4 #3: the controlled distribution-shift A/B).

Round 4's campaign ran TTA against RANDOM weights, so every TTA row
landed below NOTTA — the plumbing was proven but not the science. This
script trains the whole demo stack (93M DiT + WAN-style VAE) to
competence on motion distribution A, so the demo campaign can evaluate
TTA on shifted distribution B where adaptation has real signal — the
framework-native analogue of the reference's Panda-pretrained /
UCF-evaluated cross-dataset story (summary_printout.txt:861-885).

Phases (all on-device, single chip):
  1. VAE: recon (MSE) + tiny KL on 9-frame clips from A.
  2. Latent statistics: per-channel mean/std over A windows -> baked
     into the bundle's model_config.json (load_converted_bundle
     restores them, models/convert.py).
  3. DiT: conditioned flow-matching loss (tta/losses.py — the SAME loss
     TTA uses) on cond-4 + target-8 latent windows from A, full-param
     AdamW via the engine's make_train_step(FullScheme).

Distribution A (pretrain): sinusoid fields, speed in [0.02, 0.05],
freq in [2, 5], direction +x.
Distribution B (the campaign's eval data): speed in [0.09, 0.16],
direction -x — fast REVERSED motion the pretrained model continues
wrongly zero-shot, and per-video TTA can read off the conditioning
window.

Usage:
    python scripts/pretrain_demo.py --out-dir campaign/demo_ckpt \
        [--vae-steps 1200] [--dit-steps 4000] [--smoke]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Distribution A parameters (B lives in scripts/run_campaign.py)
DIST_A = {"speed_range": (0.02, 0.05), "freq_range": (2.0, 5.0),
          "direction": 1.0}

CAPTIONS = ["a ball moving across the scene",
            "waves rolling over a beach",
            "a car driving down a road",
            "a bird flying in the sky"]


def sample_clip(rng: np.random.RandomState, frames: int, height: int,
                width: int) -> np.ndarray:
    """One A-distribution clip [3, T, H, W] in [-1, 1] (same generator
    family as run_tta.make_synthetic_dataset)."""
    t = np.arange(frames, dtype=np.float32)
    yy, xx = np.meshgrid(np.linspace(0, 1, height),
                         np.linspace(0, 1, width), indexing="ij")
    lo, hi = DIST_A["freq_range"]
    freq = lo + rng.rand() * (hi - lo)
    phase = rng.rand() * 6.28
    lo, hi = DIST_A["speed_range"]
    speed = DIST_A["direction"] * (lo + rng.rand() * (hi - lo))
    clip = np.stack([
        0.5 + 0.5 * np.sin(
            6.28 * (freq * (xx + speed * ti) + yy * freq / 2) + phase)
        for ti in t
    ])  # [T, H, W]
    clip = np.broadcast_to(clip[None], (3,) + clip.shape)
    return (clip * 2.0 - 1.0).astype(np.float32)


def batch_clips(rng, b, frames, h, w):
    return np.stack([sample_clip(rng, frames, h, w) for _ in range(b)])


def draw_params(rng: np.random.RandomState, b: int):
    """Per-clip (freq, phase, speed) draws — the same RandomState
    stream order as sample_clip, so the device generator below samples
    the identical distribution-A parameter stream."""
    f, p, s = [], [], []
    lo_f, hi_f = DIST_A["freq_range"]
    lo_s, hi_s = DIST_A["speed_range"]
    for _ in range(b):
        f.append(lo_f + rng.rand() * (hi_f - lo_f))
        p.append(rng.rand() * 6.28)
        s.append(DIST_A["direction"] * (lo_s + rng.rand() * (hi_s - lo_s)))
    return (np.asarray(f, np.float32), np.asarray(p, np.float32),
            np.asarray(s, np.float32))


def make_device_clip_gen(frames: int, height: int, width: int):
    """Jitted on-device clip synthesis from per-clip scalars.

    The axon tunnel moves ~40 MB/s, so uploading host-generated pixel
    batches (66 MB/step at the DiT window) makes pretraining
    transfer-bound; synthesizing the sinusoid field on device turns the
    per-step upload into 3 floats per clip. Same formula as
    sample_clip."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(freq, phase, speed):  # each [B]
        t = jnp.arange(frames, dtype=jnp.float32)
        yy, xx = jnp.meshgrid(jnp.linspace(0.0, 1.0, height),
                              jnp.linspace(0.0, 1.0, width),
                              indexing="ij")
        f = freq[:, None, None, None]
        arg = (6.28 * (f * (xx[None, None] + speed[:, None, None, None]
                            * t[None, :, None, None])
                       + yy[None, None] * f / 2.0)
               + phase[:, None, None, None])
        clip = 0.5 + 0.5 * jnp.sin(arg)           # [B, T, H, W]
        clip = jnp.broadcast_to(clip[:, None],
                                (clip.shape[0], 3) + clip.shape[1:])
        return clip * 2.0 - 1.0

    return gen


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out-dir", default="campaign/demo_ckpt")
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--vae-steps", type=int, default=1200)
    p.add_argument("--dit-steps", type=int, default=4000)
    p.add_argument("--vae-lr", type=float, default=3e-4)
    p.add_argument("--dit-lr", type=float, default=2e-4)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--preset", default="longcat_demo")
    p.add_argument("--smoke", action="store_true",
                   help="tiny geometry + a handful of steps (CPU CI)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from longcat_video_tta_tpu.config import OptimConfig, get_model_config
    from longcat_video_tta_tpu.models.convert import save_bundle
    from longcat_video_tta_tpu.models.vae import (
        _vae_decode_core, normalize_latents, vae_encode,
        vae_encode_moments)
    from longcat_video_tta_tpu.pipeline import ModelBundle
    from longcat_video_tta_tpu.tta.adapters import build_scheme
    from longcat_video_tta_tpu.tta.engine import (build_optimizer,
                                                  make_train_step)
    from longcat_video_tta_tpu.config import AdapterConfig

    if args.smoke:
        args.preset = "longcat_tiny"
        args.height, args.width = 16, 32
        args.vae_steps = min(args.vae_steps, 4)
        args.dit_steps = min(args.dit_steps, 4)
        args.batch = 1

    cfg = get_model_config(args.preset)
    bundle = ModelBundle.init_random(cfg, seed=args.seed)
    rng = np.random.RandomState(args.seed)
    tf = cfg.vae.temporal_factor
    t_hist = []

    # ---- phase 1: VAE reconstruction --------------------------------
    vae_frames = 2 * tf + 1  # 3 latent frames
    vopt = optax.chain(optax.clip_by_global_norm(1.0),
                       optax.adamw(args.vae_lr, weight_decay=1e-5))
    vstate = vopt.init(bundle.vae_params)

    @jax.jit
    def vae_step(params, state, x, key):
        def loss_fn(p):
            mean, logvar = vae_encode_moments(p, cfg.vae, x)
            lv = jnp.clip(logvar, -30.0, 20.0)
            z = mean + jnp.exp(0.5 * lv) * jax.random.normal(
                key, mean.shape)
            recon = _vae_decode_core(p, cfg.vae, z)
            mse = jnp.mean((recon - x) ** 2)
            kl = 0.5 * jnp.mean(mean ** 2 + jnp.exp(lv) - 1.0 - lv)
            return mse + 1e-6 * kl, mse

        (loss, mse), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, state = vopt.update(grads, state, params)
        return optax.apply_updates(params, upd), state, mse

    key = jax.random.PRNGKey(args.seed)
    vae_params = bundle.vae_params
    vgen = make_device_clip_gen(vae_frames, args.height, args.width)
    t0 = time.time()
    for s in range(args.vae_steps):
        x = vgen(*draw_params(rng, args.batch))
        key, sub = jax.random.split(key)
        vae_params, vstate, mse = vae_step(vae_params, vstate, x, sub)
        if s % 100 == 0 or s == args.vae_steps - 1:
            m = float(mse)
            t_hist.append({"phase": "vae", "step": s, "mse": m,
                           "wall_s": round(time.time() - t0, 1)})
            print(f"[vae {s}/{args.vae_steps}] recon mse {m:.5f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    bundle = dataclasses.replace(bundle, vae_params=vae_params)

    # ---- phase 2: latent statistics over A ---------------------------
    stat_frames = 4 * tf + 1  # 5 latent frames
    sgen = make_device_clip_gen(stat_frames, args.height, args.width)
    moments = []
    for _ in range(8 if not args.smoke else 2):
        x = sgen(*draw_params(rng, args.batch))
        z = vae_encode(vae_params, cfg.vae, x, normalize=False)
        moments.append(np.asarray(z, np.float64))
    zs = np.concatenate(moments, 0)  # [N, C, T, H, W]
    mean = zs.mean(axis=(0, 2, 3, 4))
    std = zs.std(axis=(0, 2, 3, 4)) + 1e-6
    cfg = dataclasses.replace(cfg, vae=dataclasses.replace(
        cfg.vae, latents_mean=tuple(float(v) for v in mean),
        latents_std=tuple(float(v) for v in std)))
    bundle = dataclasses.replace(bundle, cfg=cfg)
    print(f"[stats] latent mean [{mean.min():.3f}, {mean.max():.3f}] "
          f"std [{std.min():.3f}, {std.max():.3f}]", flush=True)

    # ---- phase 3: DiT flow matching (cond 4 + target 8 latents) ------
    n_cond_lat, n_tgt_lat = (4, 8) if not args.smoke else (2, 2)
    win_frames = (n_cond_lat + n_tgt_lat - 1) * tf + 1
    scheme = build_scheme(cfg.dit, AdapterConfig(method="full"))
    tx = build_optimizer(OptimConfig(
        optimizer="adamw", lr=args.dit_lr, steps=args.dit_steps,
        warmup_steps=min(100, args.dit_steps // 4), weight_decay=1e-4,
        grad_clip_norm=1.0))
    step_fn = make_train_step(scheme, cfg.dit, tx,
                              attn_impl=None if not args.smoke else "xla")
    dit_params = bundle.dit_params
    dstate = tx.init(dit_params)
    emb_bank = [bundle.encode_prompt(c) for c in CAPTIONS]
    dgen = make_device_clip_gen(win_frames, args.height, args.width)
    t0 = time.time()
    for s in range(args.dit_steps):
        x = dgen(*draw_params(rng, args.batch))
        z = vae_encode(vae_params, cfg.vae, x)  # normalized, new stats
        cond_l = z[:, :, :n_cond_lat]
        tgt_l = z[:, :, n_cond_lat:]
        emb, mask = emb_bank[rng.randint(len(emb_bank))]
        emb = jnp.broadcast_to(emb, (args.batch,) + emb.shape[1:])
        mask = jnp.broadcast_to(mask, (args.batch,) + mask.shape[1:])
        key, sub = jax.random.split(key)
        dit_params, dstate, loss = step_fn(
            dit_params, dstate, bundle.dit_params, cond_l, tgt_l,
            emb, mask, sub)
        if s % 200 == 0 or s == args.dit_steps - 1:
            ls = float(loss)
            t_hist.append({"phase": "dit", "step": s, "loss": ls,
                           "wall_s": round(time.time() - t0, 1)})
            print(f"[dit {s}/{args.dit_steps}] flow loss {ls:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    bundle = dataclasses.replace(bundle, dit_params=dit_params)

    # ---- save ---------------------------------------------------------
    save_bundle(args.out_dir, bundle,
                converted_components=["dit", "vae", "text_encoder"])
    with open(os.path.join(args.out_dir, "PROVENANCE.json"), "w") as f:
        json.dump({
            "pretrained_by": "scripts/pretrain_demo.py",
            "preset": args.preset,
            "distribution_A": {k: list(v) if isinstance(v, tuple) else v
                               for k, v in DIST_A.items()},
            "vae_steps": args.vae_steps, "dit_steps": args.dit_steps,
            "height": args.height, "width": args.width,
            "seed": args.seed,
            "note": ("text_encoder is frozen random (the demo world's "
                     "fixed text space); dit+vae are trained on "
                     "synthetic distribution A"),
            "history": t_hist,
        }, f, indent=2)
    print(f"[pretrain] bundle saved to {args.out_dir}")
    return t_hist


if __name__ == "__main__":
    main()
