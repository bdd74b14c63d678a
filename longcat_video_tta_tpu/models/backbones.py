"""Backbone matrix: CogVideoX and Open-Sora as model configs.

The reference ports its TTA methods to two other backbones by
re-implementing the common layer per backbone
(backbone_experiment/cogvideo/common_cogvideo.py,
backbone_experiment/opensora/common_opensora.py — SURVEY.md §2.7/Ly).
Here the TTA driver is backbone-generic by construction (every method is
an AdapterScheme over a parametric DiT; the pipeline works off a
ModelBundle), so a backbone is just a ``ModelConfig`` preset capturing
its geometry + its frame/text conventions:

- **CogVideoX-5B-I2V** (reference usage: common_cogvideo.py:39-218):
  30 blocks, hidden 3072, 48 heads? -> 3072/64; T5 text encode
  max_len 226; 720x480, 49 frames; VAE 4x/8x with scaling-factor
  latents (mean 0, uniform scale); time_embedding injection point for
  delta_a (our delta_t covers it).
- **Open-Sora v2.0 MMDiT** (common_opensora.py:43-475): dual-stream
  blocks approximated by the same parametric stack; T5+CLIP dual text
  encode collapses onto the single packed-text path; hidden-mode
  delta_b mirrors its representation-stream deltas; LoRA injection
  sites map per lora_layers.py.

These presets preserve the *capability* surface (every TTA method,
sampler, eval, and sweep tooling runs against them unchanged); exact
weight-level ports require each upstream checkpoint and land with the
weight converters.
"""

from __future__ import annotations

from ..config import (
    DiTConfig,
    ModelConfig,
    SchedulerConfig,
    TextEncoderConfig,
    VAEConfig,
)


def cogvideox_5b() -> ModelConfig:
    """CogVideoX-5B-I2V geometry (diffusers config: 30 layers, width
    3072, 48 heads of dim 64, in/out 16 channels, patch 2 spatial)."""
    return ModelConfig(
        dit=DiTConfig(
            hidden_size=3072,
            depth=30,
            num_heads=48,
            in_channels=16,
            out_channels=16,
            patch_size=(1, 2, 2),
            adaln_tembed_dim=512,
            ffn_dim=12288,
            text_dim=4096,       # T5-XXL
            text_len=226,        # common_cogvideo.py:152-177
            rope_dims=(16, 24, 24),
            param_dtype="bfloat16",
            compute_dtype="bfloat16",
        ),
        vae=VAEConfig(
            z_dim=16,
            base_dim=128,
            param_dtype="bfloat16",
            compute_dtype="bfloat16",
            # CogVideoX normalizes by a global scaling factor
            # (common_cogvideo.py:116-145): express as uniform std
            latents_mean=(0.0,) * 16,
            latents_std=(1.0 / 0.7,) * 16,
        ),
        text=TextEncoderConfig(
            vocab_size=32128,    # T5 sentencepiece
            d_model=4096,
            d_kv=64,
            num_heads=64,
            d_ff=10240,
            num_layers=24,
            max_length=226,
        ),
        scheduler=SchedulerConfig(shift=1.0),
    )


def opensora_v2() -> ModelConfig:
    """Open-Sora v2.0 MMDiT geometry mapped onto the parametric stack
    (common_opensora.py: explicit patchify with (t,h,w) position ids ->
    our 3D RoPE; img/txt streams -> packed text cross-attn)."""
    return ModelConfig(
        dit=DiTConfig(
            hidden_size=3072,
            depth=38,            # 19 double + 19 single stream equivalent
            num_heads=24,
            in_channels=16,
            out_channels=16,
            patch_size=(1, 2, 2),
            adaln_tembed_dim=512,
            ffn_dim=12288,
            text_dim=4096,
            text_len=512,
            rope_dims=(32, 48, 48),
            param_dtype="bfloat16",
            compute_dtype="bfloat16",
        ),
        vae=VAEConfig(param_dtype="bfloat16", compute_dtype="bfloat16"),
        text=TextEncoderConfig(),
        scheduler=SchedulerConfig(shift=3.0),
    )


# Per-backbone frame-layout conventions (the reference hardcodes these
# in each backbone runner)
BACKBONE_FRAME_DEFAULTS = {
    "cogvideox": {"height": 480, "width": 720, "num_frames": 49},
    "opensora": {"height": 480, "width": 832, "num_frames": 93},
    "longcat": {"height": 480, "width": 832, "num_frames": 93},
}
