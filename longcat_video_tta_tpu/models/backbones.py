"""Backbone matrix: CogVideoX and Open-Sora as real architectures.

The reference ports its TTA methods to two other backbones by
re-implementing the common layer per backbone
(backbone_experiment/cogvideo/common_cogvideo.py,
backbone_experiment/opensora/common_opensora.py — SURVEY.md §2.7/Ly).
Here each backbone is a genuine TPU-native implementation behind the
same ModelBundle / AdapterScheme surface, so the unified TTA driver,
sweep, and eval tooling run against all three unchanged:

- **CogVideoX-5B-I2V** (models/cogvideox.py): 42 joint-attention blocks
  (48 heads of 64), CogVideoXLayerNormZero, I2V image-latent channel
  conditioning, DDIM v-pred sampler; delta_a on the 512-d
  time_embedding, LoRA on to_q/to_k/to_v/to_out
  (common_cogvideo.py:39-322, run_lora_tta_cogvideo.py:215).
- **Open-Sora v2.0 MMDiT** (models/mmdit.py): 19 double + 38 single
  stream blocks (Flux-derived), cond_embed v2v conditioning, triple-CFG
  sampler, T5 tokens + CLIP pooled y_vec; delta_a on the 3072-d vec,
  LoRA per lora_layers.py sites (common_opensora.py:43-475).

Weight converters: convert.convert_torch_{mmdit,cogvideox,clip_text}_
state. The VAEs reuse the causal-VAE machinery with per-backbone
normalization (both upstreams are 4x/8x causal video VAEs).
"""

from __future__ import annotations

from ..config import (
    CLIPTextConfig,
    CogVideoXConfig,
    DiTConfig,
    MMDiTConfig,
    ModelConfig,
    SchedulerConfig,
    TextEncoderConfig,
    VAEConfig,
)


def cogvideox_5b() -> ModelConfig:
    """CogVideoX-5B-I2V: the REAL joint-attention architecture
    (models/cogvideox.py) — 42 blocks, 48 heads of 64 (hidden 3072),
    CogVideoXLayerNormZero modulation of both streams, I2V image-latent
    channel conditioning (in 32 = 16+16), T5 text encode max_len 226
    (common_cogvideo.py:39-218)."""
    return ModelConfig(
        arch="cogvideox",
        dit=CogVideoXConfig(),
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


def cogvideox_tiny() -> ModelConfig:
    """Scaled-down CogVideoX for tests and synthetic e2e runs."""
    return ModelConfig(
        arch="cogvideox",
        dit=CogVideoXConfig(
            hidden_size=64, depth=2, num_heads=4, in_channels=32,
            latent_channels=16, out_channels=16, text_dim=32, text_len=16,
            time_embed_dim=32, rope_dims=(4, 6, 6),
            param_dtype="float32", compute_dtype="float32",
        ),
        vae=VAEConfig(base_dim=16, dim_mults=(1, 1, 2, 2),
                      num_res_blocks=1, attn_mid_block=False,
                      latents_mean=(0.0,) * 16,
                      latents_std=(1.0 / 0.7,) * 16),
        text=TextEncoderConfig(vocab_size=512, d_model=32, d_kv=8,
                               num_heads=4, d_ff=64, num_layers=2,
                               max_length=16,
                               param_dtype="float32",
                               compute_dtype="float32"),
        scheduler=SchedulerConfig(shift=1.0),
    )


def opensora_v2() -> ModelConfig:
    """Open-Sora v2.0: the REAL dual-stream/single-stream MMDiT
    (models/mmdit.py) — 19 double + 38 single blocks, hidden 3072, joint
    [txt | img] attention with (t,h,w) RoPE, cond_embed v2v/i2v
    conditioning, T5 token embeddings + CLIP pooled y_vec
    (common_opensora.py:43-475, lora_layers.py)."""
    return ModelConfig(
        arch="mmdit",
        dit=MMDiTConfig(),
        vae=VAEConfig(param_dtype="bfloat16", compute_dtype="bfloat16"),
        text=TextEncoderConfig(
            vocab_size=32128,    # T5 sentencepiece
            max_length=512,      # t5([prompt], seq_align=1) upper bound
        ),
        clip=CLIPTextConfig(),
        scheduler=SchedulerConfig(shift=3.0),
    )


def opensora_v2_tiny() -> ModelConfig:
    """Scaled-down MMDiT for tests and synthetic e2e runs."""
    return ModelConfig(
        arch="mmdit",
        dit=MMDiTConfig(
            hidden_size=64, num_heads=4, depth_double=2, depth_single=2,
            mlp_ratio=2.0, in_channels=16, patch_size=2, vec_in_dim=16,
            context_in_dim=32, axes_dims=(4, 6, 6),
            param_dtype="float32", compute_dtype="float32",
        ),
        vae=VAEConfig(base_dim=16, dim_mults=(1, 1, 2, 2),
                      num_res_blocks=1, attn_mid_block=False),
        text=TextEncoderConfig(vocab_size=512, d_model=32, d_kv=8,
                               num_heads=4, d_ff=64, num_layers=2,
                               max_length=16,
                               param_dtype="float32",
                               compute_dtype="float32"),
        clip=CLIPTextConfig(vocab_size=512, width=16, num_layers=2,
                            num_heads=2, max_length=16),
        scheduler=SchedulerConfig(shift=3.0),
    )


# Per-backbone frame-layout conventions (the reference hardcodes these
# in each backbone runner)
BACKBONE_FRAME_DEFAULTS = {
    "cogvideox": {"height": 480, "width": 720, "num_frames": 49},
    "opensora": {"height": 480, "width": 832, "num_frames": 93},
    "longcat": {"height": 480, "width": 832, "num_frames": 93},
}
