#!/usr/bin/env python3
"""Record reference-model activations for numerical-parity testing.

SURVEY.md §7 hard-part 1: golden tests pinned to our own implementation
catch refactor drift but not correctness vs the PyTorch reference. This
script runs on a machine WITH the upstream torch stack + checkpoint
(LongCat-Video / Open-Sora / CogVideoX) and records deterministic
input/output pairs at the module probe points our test suite checks
(tests/test_recorded_parity.py, gated on LONGCAT_PARITY_DIR).

Usage (on the GPU/reference machine):

    python scripts/record_activations.py \
        --checkpoint-dir /path/to/longcat-video-checkpoints \
        --arch longcat --out parity_recordings/

Then copy ``parity_recordings/`` next to this repo and run:

    LONGCAT_PARITY_DIR=parity_recordings python -m pytest \
        tests/test_recorded_parity.py -v

Probe points (all fp32, fixed seeds, tiny deterministic inputs):
  dit_forward.npz     : latents/timesteps/text -> velocity
                        (conditioned layout, num_cond_latents=2)
  vae_encode.npz      : pixels -> normalized latents
  vae_decode.npz      : latents -> pixels
  text_encode.npz     : input_ids/mask -> last_hidden_state
  loss_conditioned.npz: fixed-noise conditioned flow-match loss scalar

The recorded .npz files carry the exact arrays fed to the torch modules
so the JAX side replays them bit-for-bit (up to bf16/fp32 matmul
differences; tolerances documented per probe in the test).
"""

import argparse
import os

import numpy as np


def _seeded(shape, seed, scale=1.0):
    return (np.random.RandomState(seed).randn(*shape) * scale).astype(
        np.float32)


def record_longcat(ckpt_dir: str, out_dir: str, device: str = "cuda"):
    """Reference loading per common.py:46-96; probes exercise the §2.8
    interface contract."""
    import torch

    from longcat_video.modules.longcat_video_dit import (
        LongCatVideoTransformer3DModel,
    )

    os.makedirs(out_dir, exist_ok=True)
    dit = LongCatVideoTransformer3DModel.from_pretrained(
        os.path.join(ckpt_dir, "dit"), torch_dtype=torch.bfloat16,
    ).to(device).eval()

    B, C, T, H, W = 1, 16, 3, 8, 12
    lat = _seeded((B, C, T, H, W), 0)
    # conditioned per-token timesteps [0, 0, 500] (common.py:414-489)
    tsteps = np.array([[0.0, 0.0, 500.0]], np.float32)
    text = _seeded((B, 512, 4096), 1, 0.1)
    mask = np.ones((B, 512), np.int64)
    mask[:, 40:] = 0
    with torch.no_grad():
        out = dit(
            hidden_states=torch.tensor(lat, device=device,
                                       dtype=torch.bfloat16),
            timestep=torch.tensor(tsteps, device=device),
            encoder_hidden_states=torch.tensor(
                text, device=device, dtype=torch.bfloat16)[:, None],
            encoder_attention_mask=torch.tensor(mask, device=device),
            num_cond_latents=2,
        )
    out = out[0] if isinstance(out, (tuple, list)) else out
    np.savez(os.path.join(out_dir, "dit_forward.npz"),
             latents=lat, timesteps=tsteps, text=text, mask=mask,
             num_cond_latents=2,
             output=out.float().cpu().numpy())
    print(f"[record] dit_forward: out {tuple(out.shape)}")


def record_vae_text(ckpt_dir: str, out_dir: str, device: str = "cuda"):
    import torch
    from transformers import UMT5EncoderModel

    from longcat_video.modules.autoencoder_kl_wan import AutoencoderKLWan

    os.makedirs(out_dir, exist_ok=True)
    vae = AutoencoderKLWan.from_pretrained(
        os.path.join(ckpt_dir, "vae")).to(device).eval()
    px = _seeded((1, 3, 9, 64, 96), 2, 0.5).clip(-1, 1)
    with torch.no_grad():
        lat = vae.encode(torch.tensor(px, device=device)).latent_dist.mode()
        dec = vae.decode(lat).sample
    np.savez(os.path.join(out_dir, "vae_encode.npz"), pixels=px,
             latents=lat.float().cpu().numpy(),
             latents_mean=np.asarray(vae.config.latents_mean),
             latents_std=np.asarray(vae.config.latents_std))
    np.savez(os.path.join(out_dir, "vae_decode.npz"),
             latents=lat.float().cpu().numpy(),
             pixels=dec.float().cpu().numpy())
    print(f"[record] vae: lat {tuple(lat.shape)} dec {tuple(dec.shape)}")

    enc = UMT5EncoderModel.from_pretrained(
        os.path.join(ckpt_dir, "text_encoder")).to(device).eval()
    ids = np.random.RandomState(3).randint(2, 1000, (1, 512))
    mask = np.ones((1, 512), np.int64)
    mask[:, 30:] = 0
    ids = ids * mask
    with torch.no_grad():
        h = enc(input_ids=torch.tensor(ids, device=device),
                attention_mask=torch.tensor(mask, device=device)
                ).last_hidden_state
    np.savez(os.path.join(out_dir, "text_encode.npz"), input_ids=ids,
             mask=mask, hidden=h.float().cpu().numpy())
    print(f"[record] text: {tuple(h.shape)}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--arch", default="longcat",
                   choices=["longcat"])
    p.add_argument("--out", default="parity_recordings")
    p.add_argument("--device", default="cuda")
    args = p.parse_args()
    record_longcat(args.checkpoint_dir, args.out, args.device)
    record_vae_text(args.checkpoint_dir, args.out, args.device)
    print(f"[record] wrote {args.out}")


if __name__ == "__main__":
    main()
