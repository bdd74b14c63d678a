"""Typed configuration for the TPU-native LongCat-Video TTA framework.

One frozen dataclass per subsystem, replacing the reference's 3-tier
argparse/env/YAML stack (reference: sweep_experiment/scripts/run_sweep.py:51-136,
delta_experiment/scripts/common.py add_*_args groups). A single `RunConfig`
serializes into each run directory as `config.json`.

Model geometry matches the interface contract enumerated in SURVEY.md §2.8:
- 48 blocks, hidden 4096, adaln_tembed_dim 512, out_channels 16,
  patch (1, 2, 2)   (reference: run_delta_b.py:14,464-465; run_delta_a.py:5-8;
  run_delta_c.py:95)
- WAN VAE: z_dim 16, temporal x4 / spatial x8 factors
  (reference: common.py:177-206, 1488-1490)
- UMT5 text encoder, max_length 512 (reference: common.py:228-246)
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# dtype registry (dataclasses stay JSON-serializable: dtypes stored by name)
# ---------------------------------------------------------------------------

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def resolve_dtype(name: str):
    return _DTYPES[name]


# ---------------------------------------------------------------------------
# Model configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DiTConfig:
    """LongCat-style video diffusion transformer.

    Interface contract: SURVEY.md §2.8 / run_delta_a.py:134-217 (embed
    pipeline), run_norm_tune_tta.py:74-98 (norm modules), run_lora_tta.py
    :142-168 (linear layout: fused qkv(3), fused kv(2), proj, ffn w1/w2/w3).
    """

    hidden_size: int = 4096
    depth: int = 48
    num_heads: int = 32
    in_channels: int = 16
    out_channels: int = 16
    patch_size: Tuple[int, int, int] = (1, 2, 2)  # (p_t, p_h, p_w)
    adaln_tembed_dim: int = 512
    ffn_dim: int = 11008  # SwiGLU inner dim (w1/w3 out, w2 in)
    text_dim: int = 4096  # UMT5-XXL hidden size
    text_len: int = 512
    qk_norm: bool = True
    cross_qk_norm: bool = True
    text_tokens_zero_pad: bool = True
    # 3D RoPE per-axis channel split; must sum to head_dim and be even.
    rope_dims: Tuple[int, int, int] = (32, 48, 48)
    rope_theta: float = 10000.0
    t_embed_freq_dim: int = 256
    param_dtype: str = "bfloat16"
    compute_dtype: str = "bfloat16"
    # remat ("gradient checkpointing") per block for training
    # (reference: run_delta_a.py:469-473 non-reentrant torch checkpoint)
    remat: bool = True
    # "full": recompute the whole block in bwd (min memory);
    # "dots": save matmul outputs, recompute only elementwise/norms —
    # ~10% faster TTA step on v5e at bench scale when HBM allows
    remat_policy: str = "full"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    def __post_init__(self):
        assert self.hidden_size % self.num_heads == 0
        assert sum(self.rope_dims) == self.head_dim, (
            f"rope_dims {self.rope_dims} must sum to head_dim {self.head_dim}"
        )


@dataclass(frozen=True)
class MMDiTConfig:
    """Open-Sora v2.0 / Flux-style MMDiT (dual-stream + single-stream).

    Interface contract: backbone_experiment/opensora/common_opensora.py —
    forward kwargs img/img_ids/txt/txt_ids/timesteps/y_vec/guidance/cond
    (:247-411), hidden_size 3072 with the delta-A vec injection after
    ``time_in`` (:418-475, run_delta_a_opensora.py:6-8), LoRA sites
    per lora_layers.py:231-416 (double img/txt attn qkv+proj, optional
    mlp; single linear1/linear2). Defaults are the Open-Sora v2 geometry
    (Flux-derived: 19 double + 38 single blocks, 24 heads of 128)."""

    hidden_size: int = 3072
    num_heads: int = 24
    depth_double: int = 19
    depth_single: int = 38
    mlp_ratio: float = 4.0
    in_channels: int = 16          # latent channels (pre-packing)
    patch_size: int = 2            # spatial; temporal patch is 1
    cond_embed: bool = True        # v2v/i2v masks+masked_ref channel input
    vec_in_dim: int = 768          # CLIP pooled text
    context_in_dim: int = 4096     # T5 token embeddings
    t_embed_freq_dim: int = 256
    guidance_embed: bool = False
    # RoPE over (t, h, w) position ids; text ids are zeros (identity
    # rotation) — common_opensora.py:205-217 img_ids construction.
    axes_dims: Tuple[int, int, int] = (16, 56, 56)
    rope_theta: float = 10000.0
    qk_norm: bool = True
    param_dtype: str = "bfloat16"
    compute_dtype: str = "bfloat16"
    remat: bool = True
    remat_policy: str = "full"  # "full" | "dots" (see DiTConfig)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def mlp_dim(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)

    @property
    def packed_channels(self) -> int:
        return self.in_channels * self.patch_size ** 2

    @property
    def cond_channels(self) -> int:
        return (1 + self.in_channels) * self.patch_size ** 2

    @property
    def adaln_tembed_dim(self) -> int:
        """Delta-A site width: the MMDiT vec is hidden-sized
        (run_delta_a_opensora.py:6-8)."""
        return self.hidden_size

    def __post_init__(self):
        assert self.hidden_size % self.num_heads == 0
        assert sum(self.axes_dims) == self.head_dim


@dataclass(frozen=True)
class CogVideoXConfig:
    """CogVideoX-5B(-I2V) transformer (diffusers
    CogVideoXTransformer3DModel layout).

    Interface contract: backbone_experiment/cogvideo/common_cogvideo.py —
    forward(hidden_states, encoder_hidden_states, timestep) (:184-218),
    DeltaAWrapperCogVideo hooking ``time_embedding`` with a 512-d delta
    (:225-279), LoRA on to_q/to_k/to_v/to_out.0
    (run_lora_tta_cogvideo.py:215). Joint [text | video] attention with
    CogVideoXLayerNormZero (6-chunk temb modulation of BOTH streams),
    qk LayerNorm, 3D RoPE on the video tokens only, I2V via channel-
    concatenated image latents (in_channels 32 = 16 noisy + 16 image).
    5B geometry: 42 layers, 48 heads of 64."""

    hidden_size: int = 3072
    depth: int = 42
    num_heads: int = 48
    in_channels: int = 32          # I2V: 16 latent + 16 image-cond
    latent_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2            # spatial; temporal patch is 1
    text_dim: int = 4096           # T5-XXL
    text_len: int = 226            # common_cogvideo.py:152-177
    time_embed_dim: int = 512      # delta-A site (common_cogvideo.py:233)
    ffn_mult: float = 4.0
    rope_dims: Tuple[int, int, int] = (16, 24, 24)
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    # CogVideoX-5B-I2V carries a learned joint-sequence positional
    # embedding (diffusers use_learned_positional_embeddings; key
    # patch_embed.pos_embedding) on top of 3D RoPE. >0 = param tree
    # includes "pos_embed" [len, hidden] added to [txt | vid] tokens;
    # len must cover text_len + max video tokens.
    learned_pos_embed_len: int = 0
    param_dtype: str = "bfloat16"
    compute_dtype: str = "bfloat16"
    remat: bool = True
    remat_policy: str = "full"  # "full" | "dots" (see DiTConfig)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def ffn_dim(self) -> int:
        return int(self.hidden_size * self.ffn_mult)

    @property
    def adaln_tembed_dim(self) -> int:
        """Delta-A site width (time_embedding output,
        common_cogvideo.py:225-279)."""
        return self.time_embed_dim

    def __post_init__(self):
        assert self.hidden_size % self.num_heads == 0
        assert sum(self.rope_dims) == self.head_dim


@dataclass(frozen=True)
class BSAConfig:
    """Block-sparse attention for the decode hot loop (the reference
    pipeline's BSA — run_delta_a.py:118-120; ops/bsa.py). keep_ratio
    selects that fraction of k-blocks per q-block (cond-prefix blocks
    and the diagonal are always kept exact)."""

    keep_ratio: float = 0.35
    block_q: int = 1024
    block_k: int = 1024
    min_blocks: int = 4
    # int8 QK^T inside the kernel (per-token scales; 2x bf16 MXU peak).
    # Set by --quantize-decode int8qk; PV and the cond-exactness
    # selection stay bf16.
    qk_int8: bool = False


@dataclass(frozen=True)
class PABConfig:
    """Pyramid Attention Broadcast (arXiv:2408.12588) for the decode
    hot loop — no reference analogue (TPU-first lever, like BSA/int8):
    self-attention outputs drift slowly across adjacent denoise steps,
    so mid-trajectory steps reuse the previous computed step's per-block
    attention outputs instead of recomputing them. ``every=2`` computes
    attention on every 2nd step inside [start_frac, end_frac) of the
    trajectory; early and late steps (where the latent changes fastest)
    always compute."""

    every: int = 2
    start_frac: float = 0.1
    end_frac: float = 0.9


@dataclass(frozen=True)
class CFGReuseConfig:
    """CFG guidance-delta reuse for the decode hot loop (FasterCache,
    arXiv:2410.19355 — TPU-first lever like PAB/BSA/int8, no reference
    analogue): the unconditional CFG branch drifts slowly relative to
    the conditional one, so mid-trajectory steps run ONLY the
    conditional forward (half the model FLOPs) and reconstruct
    ``v_uncond = v_cond - delta`` from the guidance delta cached at the
    last fully-computed step. ``every=2`` computes both branches on
    every 2nd step inside [start_frac, end_frac); early and late steps
    (where guidance shapes the trajectory most) always compute both.
    Composes with PAB (the reuse step's conditional half still
    refreshes its slice of the attention cache) and with BSA/int8/
    bucketing/segmenting."""

    every: int = 2
    start_frac: float = 0.1
    end_frac: float = 0.9


@dataclass(frozen=True)
class VAEConfig:
    """Causal WAN-style 3D VAE (reference: AutoencoderKLWan usage,
    common.py:158-221; 4x temporal / 8x spatial factors, z_dim-channel
    latents with per-channel latents_mean/latents_std)."""

    z_dim: int = 16
    base_dim: int = 96
    dim_mults: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    # spatial downsample happens between scales 0-1, 1-2, 2-3 (8x total);
    # temporal downsample between scales 1-2 and 2-3 (4x total)
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    attn_mid_block: bool = True
    latents_mean: Tuple[float, ...] = (
        -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
        0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
    )
    latents_std: Tuple[float, ...] = (
        2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
        3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
    )
    param_dtype: str = "float32"
    compute_dtype: str = "float32"

    @property
    def temporal_factor(self) -> int:
        return 2 ** sum(self.temporal_downsample)

    @property
    def spatial_factor(self) -> int:
        return 2 ** (len(self.dim_mults) - 1)


@dataclass(frozen=True)
class TextEncoderConfig:
    """UMT5 encoder (reference: transformers UMT5EncoderModel,
    common.py:228-255; padded to max_length 512)."""

    vocab_size: int = 256384
    d_model: int = 4096
    d_kv: int = 64
    num_heads: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    max_length: int = 512
    param_dtype: str = "bfloat16"
    compute_dtype: str = "bfloat16"


@dataclass(frozen=True)
class CLIPTextConfig:
    """CLIP-L/14 text tower for the MMDiT y_vec conditioning
    (common_opensora.py:82-105; model in models/clip_text.py)."""

    vocab_size: int = 49408
    width: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    param_dtype: str = "float32"

    @property
    def head_dim(self) -> int:
        return self.width // self.num_heads


@dataclass(frozen=True)
class CLIPVisionConfig:
    """CLIP ViT vision tower for the TPU-native CLIP gate scorer
    (reference scores with a HF CLIPModel at runtime,
    common.py:1806-2012; model in models/clip.py). Defaults = the
    gate's ViT-B/32 geometry."""

    width: int = 768
    num_layers: int = 12
    num_heads: int = 12
    patch_size: int = 32
    image_size: int = 224
    projection_dim: int = 512
    param_dtype: str = "float32"

    @property
    def head_dim(self) -> int:
        return self.width // self.num_heads


@dataclass(frozen=True)
class XCLIPConfig:
    """X-CLIP video-text scorer (HF XCLIPModel graph; reference
    _get_xclip_scorer common.py:1806-2012; model in models/xclip.py).
    Defaults = microsoft/xclip-base-patch32 geometry. The MIT hidden
    size equals the projection dim (frame CLS embeds are projected
    before integration)."""

    vision: "CLIPVisionConfig" = None  # type: ignore[assignment]
    text: "CLIPTextConfig" = None      # type: ignore[assignment]
    num_frames: int = 8
    mit_layers: int = 1
    mit_heads: int = 8
    prompt_layers: int = 2
    prompt_heads: int = 8

    def __post_init__(self):
        if self.vision is None:
            object.__setattr__(self, "vision", CLIPVisionConfig())
        if self.text is None:
            object.__setattr__(self, "text", CLIPTextConfig())

    @property
    def vision_heads(self) -> int:
        return self.vision.num_heads

    @property
    def projection_dim(self) -> int:
        return self.vision.projection_dim


@dataclass(frozen=True)
class SchedulerConfig:
    """Flow-match Euler discrete scheduler
    (reference: FlowMatchEulerDiscreteScheduler, common.py:68-70)."""

    num_train_timesteps: int = 1000
    shift: float = 5.0  # resolution-dependent timestep shift
    sigma_min: float = 0.001
    sigma_max: float = 1.0


@dataclass(frozen=True)
class ModelConfig:
    dit: Any = field(default_factory=DiTConfig)  # DiTConfig | MMDiTConfig
    vae: VAEConfig = field(default_factory=VAEConfig)
    text: TextEncoderConfig = field(default_factory=TextEncoderConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    # architecture family: "longcat" (DiT, cross-attn text) or "mmdit"
    # (Open-Sora v2 dual/single stream, T5+CLIP). Dispatches the bundle's
    # prompt encoding, losses, and sampler.
    arch: str = "longcat"
    clip: Optional[CLIPTextConfig] = None


# ---------------------------------------------------------------------------
# Presets
# ---------------------------------------------------------------------------


def longcat_13b() -> ModelConfig:
    """Flagship config: the 13.6B-param LongCat-Video DiT geometry
    (SURVEY.md §2.8: 48 blocks, hidden 4096, t-embed 512, out 16)."""
    return ModelConfig(
        vae=VAEConfig(param_dtype="bfloat16", compute_dtype="bfloat16"),
    )


def longcat_tiny() -> ModelConfig:
    """Tiny config for unit tests and CPU-mesh dry runs."""
    return ModelConfig(
        dit=DiTConfig(
            hidden_size=64,
            depth=2,
            num_heads=2,
            ffn_dim=128,
            adaln_tembed_dim=32,
            text_dim=48,
            text_len=16,
            rope_dims=(8, 12, 12),
            t_embed_freq_dim=32,
            param_dtype="float32",
            compute_dtype="float32",
            remat=False,
        ),
        vae=VAEConfig(
            z_dim=16,
            base_dim=8,
            dim_mults=(1, 2, 4, 4),
            num_res_blocks=1,
        ),
        text=TextEncoderConfig(
            vocab_size=512,
            d_model=48,
            d_kv=8,
            num_heads=2,
            d_ff=64,
            num_layers=2,
            max_length=16,
            param_dtype="float32",
            compute_dtype="float32",
        ),
    )


def longcat_bench() -> ModelConfig:
    """Single-chip bench config: full 480p token geometry with a model
    scaled to fit one v5e chip (16 GB HBM) in bf16."""
    return ModelConfig(
        dit=DiTConfig(
            hidden_size=2048,
            depth=16,
            num_heads=16,
            ffn_dim=5504,
            adaln_tembed_dim=512,
            text_dim=2048,
            text_len=512,
            rope_dims=(32, 48, 48),
            # dots_attn also saves the flash kernel residuals: 0.331
            # s/step vs 0.365 (dots) / 0.40 (full) measured on v5e-1
            # (scripts/measure_remat_policy.py)
            remat_policy="dots_attn",
        ),
        vae=VAEConfig(param_dtype="bfloat16", compute_dtype="bfloat16"),
        text=TextEncoderConfig(
            vocab_size=32128,
            d_model=2048,
            d_kv=64,
            num_heads=32,
            d_ff=5120,
            num_layers=8,
        ),
    )


def longcat_demo() -> ModelConfig:
    """Pretrainable demo config (~93M DiT) for the distribution-shift
    science campaign (VERDICT r4 #3): small enough that
    scripts/pretrain_demo.py trains the WHOLE stack (VAE recon + DiT
    flow matching) to competence on synthetic motion in ~30 min of
    single-chip time, while keeping the flagship's kernel layout
    (head_dim 128 -> merged-head flash path, qk-norm, SwiGLU, adaLN).
    Resolution pairs with 192x320 (latents 24x40, 240 tokens/frame)."""
    return ModelConfig(
        dit=DiTConfig(
            hidden_size=768,
            depth=8,
            num_heads=6,
            ffn_dim=2048,
            adaln_tembed_dim=256,
            text_dim=256,
            text_len=64,
            rope_dims=(32, 48, 48),
            remat=False,  # 93M: activations fit; remat only costs time
        ),
        vae=VAEConfig(
            base_dim=32,
            num_res_blocks=1,
            # latents_mean/std are RE-ESTIMATED by pretrain_demo.py over
            # the training distribution and saved into the bundle's
            # model_config.json (load_converted_bundle restores them)
        ),
        text=TextEncoderConfig(
            vocab_size=512,
            d_model=256,
            d_kv=32,
            num_heads=8,
            d_ff=512,
            num_layers=2,
            max_length=64,
            param_dtype="float32",
            compute_dtype="float32",
        ),
    )


def longcat_bench_3b() -> ModelConfig:
    """Second bench geometry (VERDICT r3 Weak #3): the largest model
    that fits one v5e chip with full rematerialization (~3.2B, bf16
    params 6.3 GiB), so the per-param extrapolation from the 1.19B
    bench point to the 13.6B flagship rests on two scale points instead
    of one. Head_dim stays 128 (flagship kernel layout)."""
    base = longcat_bench()
    return dataclasses.replace(
        base,
        dit=dataclasses.replace(
            base.dit,
            hidden_size=2560,
            depth=24,
            num_heads=20,
            ffn_dim=6912,
            remat_policy="full",  # memory-min: params dominate HBM here
        ),
    )


# ---------------------------------------------------------------------------
# Run / TTA configs (the reference's ~70 sweep-exposed knobs, typed)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class EarlyStoppingConfig:
    """reference: early_stopping.py:33-51."""

    enabled: bool = True
    check_every: int = 5
    patience: int = 3
    anchor_sigmas: Tuple[float, ...] = (0.25, 0.5, 0.75)
    noise_draws: int = 2
    strategy: str = "patience"  # "patience" | "first_rise"
    holdout_fraction: float = 0.25


@dataclass(frozen=True)
class AugmentationConfig:
    """reference: common.py:1164-1362."""

    enabled: bool = False
    hflip: bool = False
    rotate_degrees: Tuple[float, ...] = ()
    random_rotate: bool = False
    random_rotate_max_deg: float = 15.0
    num_random_rotations: int = 0
    speed_factors: Tuple[float, ...] = ()
    latent_space: bool = True  # re-encode variants through the VAE


@dataclass(frozen=True)
class ClipGateConfig:
    """reference: common.py:1709-2012."""

    enabled: bool = False
    backend: str = "clip"  # "clip" | "xclip"
    threshold: float = 0.2
    sample_frames: int = 4
    sampling_mode: str = "full_window"  # "full_window" | "late_only"
    late_fraction: float = 0.4
    aggregate: str = "mean"  # "mean" | "min" | "max"
    log_only: bool = False
    fail_open: bool = True


@dataclass(frozen=True)
class CaptionGuardConfig:
    """reference: common.py:1022-1157."""

    mode: str = "fail"  # "fail" | "warn" | "off"
    min_nonempty_ratio: float = 0.95
    min_unique_ratio: float = 0.10
    max_top1_ratio: float = 0.50
    max_generic_top1_ratio: float = 0.20
    topk: int = 5


@dataclass(frozen=True)
class AdapterConfig:
    """One config covering all seven TTA methods (SURVEY.md §2.3).

    method: full | lora | delta_a | delta_b | delta_c | norm_tune | film
    """

    method: str = "delta_a"
    # lora
    lora_rank: int = 8
    lora_alpha: float = 16.0
    lora_target_modules: Tuple[str, ...] = ("qkv", "proj")
    lora_target_ffn: bool = False
    # "builtin" formulation: merge scale*(a@b) into the base kernels at
    # to_forward time (the reference's LoRAModule forward-patch
    # analogue, run_lora_tta.py:104-218) instead of the low-rank
    # side-branch. Mathematically equivalent (asserted in
    # tests/test_tta.py); costs a merged weight copy per step, so the
    # side-branch stays the default.
    lora_builtin: bool = False
    # delta_b ("AdaSteer")
    num_groups: int = 4
    delta_target: str = "timestep"  # "timestep" | "hidden"
    delta_dim: Optional[int] = None  # partial dim, zero-padded
    # delta_b / lora / film block scoping: "all" | "last_N" | "i,j,k"
    target_blocks: str = "all"
    # norm_tune
    norm_target: str = "cross_attn_norm"  # cross_attn_norm | qk_norm | all_norm
    # norm_tune + delta_a combo (reference: --also-tune-delta,
    # run_norm_tune_tta.py:311)
    also_tune_delta: bool = False
    # film
    film_mode: str = "full"  # full | shift_scale | scale_only


@dataclass(frozen=True)
class OptimConfig:
    optimizer: str = "adamw"  # "adamw" | "sgd"
    lr: float = 1e-3
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-15
    momentum: float = 0.0  # sgd (reference default: momentum-free)
    grad_clip_norm: float = 1.0
    steps: int = 20
    warmup_steps: int = 0      # linear warmup 0 -> lr, then constant
    weight_decay: float = 0.01


@dataclass(frozen=True)
class FrameConfig:
    """Anchor-based frame layout (reference: run_delta_a.py:378-428,
    run_baseline.py:275-300)."""

    num_cond_frames: int = 14
    num_frames: int = 28  # generated frames (rounded up to 4k+1)
    gen_start_frame: int = 32  # anchor
    tta_total_frames: Optional[int] = None  # default: num_cond_frames
    tta_context_frames: Optional[int] = None  # default: num_cond_frames
    height: int = 480
    width: int = 832
    fps: int = 24


@dataclass(frozen=True)
class GenerationConfig:
    num_inference_steps: int = 50
    guidance_scale: float = 4.0
    use_kv_cache: bool = True
    negative_prompt: str = ""


@dataclass(frozen=True)
class BatchTTAConfig:
    """Retrieval-augmented batch TTA (reference: run_delta_a.py:308-363,
    493-523)."""

    batch_videos: int = 1
    retrieval_pool_dir: Optional[str] = None


@dataclass(frozen=True)
class OnlineEvalConfig:
    """reference: common.py:2141-2431, 2453-2522."""

    fvd_enabled: bool = False
    fid_enabled: bool = False
    vbench_enabled: bool = False
    min_videos: int = 256


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh: data x context x tensor axes (SURVEY.md §2.10)."""

    data: int = 1
    context: int = 1
    tensor: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.context * self.tensor


@dataclass(frozen=True)
class RunConfig:
    """Top-level config serialized into each run directory."""

    checkpoint_dir: str = ""
    data_dir: str = ""
    output_dir: str = ""
    max_videos: int = 100
    seed: int = 42
    save_videos: bool = True
    skip_generation: bool = False
    fixed_caption: Optional[str] = None
    feature_frame_guard_mode: str = "fail"

    model_preset: str = "longcat_13b"
    adapter: AdapterConfig = field(default_factory=AdapterConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    frames: FrameConfig = field(default_factory=FrameConfig)
    generation: GenerationConfig = field(default_factory=GenerationConfig)
    early_stopping: EarlyStoppingConfig = field(default_factory=EarlyStoppingConfig)
    augmentation: AugmentationConfig = field(default_factory=AugmentationConfig)
    clip_gate: ClipGateConfig = field(default_factory=ClipGateConfig)
    caption_guard: CaptionGuardConfig = field(default_factory=CaptionGuardConfig)
    batch_tta: BatchTTAConfig = field(default_factory=BatchTTAConfig)
    online_eval: OnlineEvalConfig = field(default_factory=OnlineEvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    # ------------------------------------------------------------------
    # serialization
    # ------------------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self, **kw) -> str:
        return json.dumps(self.to_dict(), indent=2, **kw)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "RunConfig":
        return _dataclass_from_dict(cls, d)

    @classmethod
    def from_json(cls, s: str) -> "RunConfig":
        return cls.from_dict(json.loads(s))


def _dataclass_from_dict(cls, d):
    if not dataclasses.is_dataclass(cls):
        return d
    import typing

    hints = typing.get_type_hints(cls)
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        ftype = hints.get(f.name, None)
        if isinstance(ftype, type) and dataclasses.is_dataclass(ftype):
            kwargs[f.name] = _dataclass_from_dict(ftype, v)
        elif isinstance(v, list):
            kwargs[f.name] = tuple(v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


MODEL_PRESETS = {
    "longcat_13b": longcat_13b,
    "longcat_tiny": longcat_tiny,
    "longcat_bench": longcat_bench,
    "longcat_bench_3b": longcat_bench_3b,
    "longcat_demo": longcat_demo,
}


# backbone presets are defined in models/backbones.py (import-cycle
# guard); this is the full CLI-facing name list — run_tta's --preset
# choices derive from it so new presets are never silently unlaunchable
ALL_PRESET_NAMES = tuple(MODEL_PRESETS) + (
    "cogvideox_5b", "cogvideox_tiny", "opensora_v2", "opensora_v2_tiny")


def get_model_config(preset: str) -> ModelConfig:
    if preset in MODEL_PRESETS:
        return MODEL_PRESETS[preset]()
    # backbone presets live in models/backbones.py (import cycle guard)
    from .models import backbones

    if preset == "cogvideox_5b":
        return backbones.cogvideox_5b()
    if preset == "opensora_v2":
        return backbones.opensora_v2()
    if preset == "opensora_v2_tiny":
        return backbones.opensora_v2_tiny()
    if preset == "cogvideox_tiny":
        return backbones.cogvideox_tiny()
    raise KeyError(f"unknown model preset {preset!r}")
