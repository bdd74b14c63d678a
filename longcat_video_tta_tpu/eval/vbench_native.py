"""TPU-native VBench dimensions (JAX towers, no vbench package).

The reference runs the external VBench++ package over saved mp4s on 5
dimensions at job end (common.py:2453-2522 finalize_online_eval;
sweep_experiment/scripts/eval_vbench.py:1-104). That package is a
torch/CUDA model zoo; this module re-implements the dimensions the
published VBench protocol defines, as JAX towers running on-device:

- ``temporal_flickering``  — exact, weight-free: mean over consecutive
  frame pairs of (255 - MAE)/255 in the uint8 domain.
- ``subject_consistency``  — DINO ViT-S/16 CLS features per frame
  (facebookresearch/dino ``dino_vits16``), score = mean over t>=1 of
  (max(0, cos(f_{t-1}, f_t)) + max(0, cos(f_0, f_t))) / 2. The tower is
  a standard pre-LN ViT implemented here; weights convert from the
  torch.hub state_dict (``convert_torch_dino_state``), fetched by
  scripts/fetch_and_convert_towers.py --only dino.
- ``aesthetic_quality``    — LAION aesthetic predictor v2: CLIP
  ViT-L/14 image embeds (the existing JAX CLIP vision tower at L/14
  geometry) -> L2 normalize -> a 5-linear MLP head (NO activations —
  that is the published predictor's architecture) -> mean/10, clipped
  to [0, 1].
- ``motion_smoothness``    — the VBench protocol (drop odd frames,
  reconstruct them by interpolation, score (255 - MAE)/255 against the
  real odd frames) with a pluggable interpolator. VBench uses the AMT-S
  video-frame-interpolation network; that model is not reproducible
  here, so the default interpolator is the linear frame blend and the
  result is labeled ``native_variant`` — comparable across THIS
  framework's runs, not against published VBench numbers.
- ``imaging_quality``      — MUSIQ-SPAQ via the native multi-scale
  image-quality transformer in eval/musiq.py (hash-based 2D spatial
  embeddings, scale embeddings, masked ViT encoder); score =
  clip(MUSIQ, 0, 100)/100 averaged over frames.

CHOICE markers: VBench's DINO transform is torchvision
``Resize(224) -> CenterCrop(224) -> ImageNet normalize``; the resize
here is jax.image bicubic (same residual-vs-PIL caveat as
models/clip.py::preprocess_frames, ~1e-3 on features).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.layers import layer_norm

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# --------------------------------------------------------------------------
# DINO ViT-S/16 tower (subject_consistency backbone)
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DINOViTConfig:
    """facebookresearch/dino ``dino_vits16`` geometry (ViT-S/16)."""

    width: int = 384
    num_layers: int = 12
    num_heads: int = 6
    patch_size: int = 16
    image_size: int = 224

    @property
    def head_dim(self) -> int:
        return self.width // self.num_heads


def init_dino(rng: jax.Array, cfg: DINOViTConfig) -> Dict[str, Any]:
    """Random DINO tree (tests / smoke), layers stacked for lax.scan."""
    counter = [0]

    def key():
        counter[0] += 1
        return jax.random.fold_in(rng, counter[0])

    def dense(din, dout, depth):
        return {
            "kernel": jax.random.normal(key(), (depth, din, dout),
                                        jnp.float32) * 0.02,
            "bias": jnp.zeros((depth, dout), jnp.float32),
        }

    W, L, p = cfg.width, cfg.num_layers, cfg.patch_size
    n_pos = (cfg.image_size // p) ** 2 + 1
    return {
        "cls_token": jax.random.normal(key(), (W,), jnp.float32) * 0.02,
        "pos_embed": jax.random.normal(key(), (n_pos, W), jnp.float32) * 0.01,
        "patch_embed": {
            "kernel": jax.random.normal(key(), (p, p, 3, W),
                                        jnp.float32) * 0.02,
            "bias": jnp.zeros((W,), jnp.float32),
        },
        "layers": {
            "ln1": {"weight": jnp.ones((L, W)), "bias": jnp.zeros((L, W))},
            "q": dense(W, W, L), "k": dense(W, W, L), "v": dense(W, W, L),
            "out": dense(W, W, L),
            "ln2": {"weight": jnp.ones((L, W)), "bias": jnp.zeros((L, W))},
            "fc1": dense(W, 4 * W, L), "fc2": dense(4 * W, W, L),
        },
        "norm": {"weight": jnp.ones((W,)), "bias": jnp.zeros((W,))},
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def dino_cls_features(params: Dict[str, Any], cfg: DINOViTConfig,
                      pixels: jnp.ndarray) -> jnp.ndarray:
    """[B, S, S, 3] ImageNet-normalized pixels -> CLS features [B, W].

    Standard pre-LN ViT with exact GELU (timm/DINO convention; CLIP's
    quick-GELU encoder in models/clip_text.py is NOT reused for this
    reason) and LN eps 1e-6.
    """
    p = cfg.patch_size
    feat = jax.lax.conv_general_dilated(
        pixels, params["patch_embed"]["kernel"], (p, p), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed"]["bias"]
    B = feat.shape[0]
    tokens = feat.reshape(B, -1, cfg.width)
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.width))
    x = jnp.concatenate([cls, tokens], axis=1) + params["pos_embed"][None]
    S, H, D = x.shape[1], cfg.num_heads, cfg.head_dim

    def body(x, lp):
        h = layer_norm(x, lp["ln1"]["weight"], lp["ln1"]["bias"], eps=1e-6)

        def proj(pp, t):
            return (jnp.dot(t, pp["kernel"]) + pp["bias"]).reshape(
                B, S, H, D)

        q, k, v = proj(lp["q"], h), proj(lp["k"], h), proj(lp["v"], h)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (D ** -0.5)
        o = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(logits, -1), v)
        x = x + jnp.dot(o.reshape(B, S, -1), lp["out"]["kernel"]) \
            + lp["out"]["bias"]
        h = layer_norm(x, lp["ln2"]["weight"], lp["ln2"]["bias"], eps=1e-6)
        h = jax.nn.gelu(jnp.dot(h, lp["fc1"]["kernel"]) + lp["fc1"]["bias"],
                        approximate=False)
        x = x + jnp.dot(h, lp["fc2"]["kernel"]) + lp["fc2"]["bias"]
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = layer_norm(x, params["norm"]["weight"], params["norm"]["bias"],
                   eps=1e-6)
    return x[:, 0]


def convert_torch_dino_state(sd: Dict[str, np.ndarray],
                             cfg: DINOViTConfig) -> Dict[str, Any]:
    """torch.hub ``dino_vits16`` state_dict (numpy values) -> JAX tree.

    Layout (facebookresearch/dino vision_transformer.VisionTransformer):
    cls_token [1,1,W], pos_embed [1,N+1,W], patch_embed.proj
    {weight [W,3,p,p], bias}, blocks.{i}.{norm1, attn.qkv (fused
    [3W,W]), attn.proj, norm2, mlp.fc1, mlp.fc2}, final norm.
    """
    W, L = cfg.width, cfg.num_layers

    def stack(fmt, transform=lambda a: a):
        return jnp.asarray(np.stack(
            [transform(np.asarray(sd[fmt.format(i=i)])) for i in range(L)]))

    def lin(name):  # torch Linear [out,in] -> kernel [L,in,out]
        return {
            "kernel": stack(f"blocks.{{i}}.{name}.weight",
                            lambda a: a.T),
            "bias": stack(f"blocks.{{i}}.{name}.bias"),
        }

    qkv_w = stack("blocks.{i}.attn.qkv.weight")      # [L, 3W, W]
    qkv_b = stack("blocks.{i}.attn.qkv.bias")        # [L, 3W]

    def qkv_slice(j):
        return {
            "kernel": jnp.transpose(
                qkv_w[:, j * W:(j + 1) * W, :], (0, 2, 1)),
            "bias": qkv_b[:, j * W:(j + 1) * W],
        }

    return {
        "cls_token": jnp.asarray(np.asarray(sd["cls_token"]).reshape(W)),
        "pos_embed": jnp.asarray(np.asarray(sd["pos_embed"])[0]),
        "patch_embed": {
            # torch conv [W, 3, p, p] -> HWIO [p, p, 3, W]
            "kernel": jnp.asarray(np.transpose(
                np.asarray(sd["patch_embed.proj.weight"]), (2, 3, 1, 0))),
            "bias": jnp.asarray(np.asarray(sd["patch_embed.proj.bias"])),
        },
        "layers": {
            "ln1": {"weight": stack("blocks.{i}.norm1.weight"),
                    "bias": stack("blocks.{i}.norm1.bias")},
            "q": qkv_slice(0), "k": qkv_slice(1), "v": qkv_slice(2),
            "out": lin("attn.proj"),
            "ln2": {"weight": stack("blocks.{i}.norm2.weight"),
                    "bias": stack("blocks.{i}.norm2.bias")},
            "fc1": lin("mlp.fc1"), "fc2": lin("mlp.fc2"),
        },
        "norm": {"weight": jnp.asarray(np.asarray(sd["norm.weight"])),
                 "bias": jnp.asarray(np.asarray(sd["norm.bias"]))},
    }


def load_dino_params(path: str,
                     cfg: Optional[DINOViTConfig] = None) -> Dict[str, Any]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_torch_dino_state(
        {k: v.numpy() for k, v in sd.items()}, cfg or DINOViTConfig())


def preprocess_imagenet(frames: np.ndarray, image_size: int) -> jnp.ndarray:
    """[T, H, W, 3] float [0,1] -> [T, S, S, 3] ImageNet-normalized
    (torchvision Resize(shortest-edge) -> CenterCrop -> Normalize)."""
    t, h, w, _ = frames.shape
    scale = image_size / min(h, w)
    nh = max(image_size, int(round(h * scale)))
    nw = max(image_size, int(round(w * scale)))
    x = jnp.asarray(frames, jnp.float32)
    x = jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0
    x = jax.image.resize(x, (t, nh, nw, 3), "cubic")
    y0, x0 = (nh - image_size) // 2, (nw - image_size) // 2
    x = jnp.clip(x[:, y0:y0 + image_size, x0:x0 + image_size], 0.0, 1.0)
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


# --------------------------------------------------------------------------
# Dimension scores
# --------------------------------------------------------------------------


def consistency_score_from_features(feats: np.ndarray) -> float:
    """VBench consistency formula over per-frame features [T, D]:
    mean over t>=1 of (max(0, cos(prev, cur)) + max(0, cos(first,
    cur))) / 2 on L2-normalized features."""
    f = np.asarray(feats, np.float64)
    f = f / np.linalg.norm(f, axis=-1, keepdims=True)
    if f.shape[0] < 2:
        return 1.0
    sim_prev = np.clip((f[:-1] * f[1:]).sum(-1), 0.0, None)
    sim_first = np.clip((f[0] * f[1:]).sum(-1), 0.0, None)
    return float(((sim_prev + sim_first) / 2.0).mean())


def subject_consistency(dino_params: Dict[str, Any], cfg: DINOViTConfig,
                        frames: np.ndarray, batch: int = 16) -> float:
    """frames [T, H, W, 3] in [0,1] -> VBench subject_consistency."""
    pixels = preprocess_imagenet(np.asarray(frames), cfg.image_size)
    feats = [np.asarray(dino_cls_features(dino_params, cfg,
                                          pixels[i:i + batch]))
             for i in range(0, pixels.shape[0], batch)]
    return consistency_score_from_features(np.concatenate(feats, 0))


def temporal_flickering(frames: np.ndarray) -> float:
    """frames [T, H, W, 3] in [0,1] (or uint8) -> mean over consecutive
    pairs of (255 - MAE)/255 in the uint8 domain (the exact VBench
    formula; weight-free)."""
    x = np.asarray(frames)
    if x.dtype != np.uint8:
        x = (np.clip(x, 0.0, 1.0) * 255.0).round().astype(np.uint8)
    if x.shape[0] < 2:
        return 1.0
    a = x[:-1].astype(np.float64)
    b = x[1:].astype(np.float64)
    mae = np.abs(a - b).reshape(x.shape[0] - 1, -1).mean(axis=1)
    return float(((255.0 - mae) / 255.0).mean())


def motion_smoothness(
    frames: np.ndarray,
    interpolate_fn: Optional[Callable[[np.ndarray, np.ndarray],
                                      np.ndarray]] = None,
) -> Dict[str, Any]:
    """VBench protocol: drop the odd frames, reconstruct each from its
    even neighbors with ``interpolate_fn(prev, nxt)``, and score the
    reconstruction (255 - MAE)/255 against the real odd frames.

    Default interpolator = linear blend (VBench uses the AMT-S VFI
    network); the result carries ``native_variant`` so downstream
    consumers cannot mistake it for a published-protocol number.
    """
    x = np.asarray(frames)
    if x.dtype != np.uint8:
        x = (np.clip(x, 0.0, 1.0) * 255.0).round().astype(np.uint8)
    if x.shape[0] < 3:
        return {"value": 1.0, "native_variant": "linear-interp"}
    fn = interpolate_fn or (
        lambda a, b: ((a.astype(np.float64) + b.astype(np.float64)) / 2.0))
    maes = []
    for t in range(1, x.shape[0] - 1, 2):
        pred = np.asarray(fn(x[t - 1], x[t + 1]), np.float64)
        maes.append(np.abs(pred - x[t].astype(np.float64)).mean())
    return {
        "value": float(((255.0 - np.asarray(maes)) / 255.0).mean()),
        "native_variant": ("linear-interp" if interpolate_fn is None
                           else "custom"),
    }


# --------------------------------------------------------------------------
# Aesthetic quality (LAION predictor v2 on CLIP ViT-L/14 embeds)
# --------------------------------------------------------------------------

# openai/clip-vit-large-patch14 vision geometry (the predictor's input
# space is its 768-d projected image embedding).
CLIP_L14 = dict(width=1024, num_layers=24, num_heads=16, patch_size=14,
                image_size=224, projection_dim=768)


def aesthetic_mlp(head: Dict[str, Any], feats: jnp.ndarray) -> jnp.ndarray:
    """The LAION aesthetic v2 head: a stack of Linear layers with NO
    activations between them (the published predictor really is
    linear-only with train-time dropout). head = list of {kernel,
    bias} in layer order."""
    x = feats
    for layer in head["linears"]:
        x = jnp.dot(x, layer["kernel"]) + layer["bias"]
    return x[..., 0]


def convert_torch_aesthetic_head(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """``sac+logos+ava1-l14-linearMSE.pth`` state_dict: keys
    ``layers.{n}.weight/bias`` with gaps at the Dropout indices; sort
    numerically and keep the Linears."""
    idx = sorted({int(k.split(".")[1]) for k in sd
                  if k.startswith("layers.") and k.endswith(".weight")})
    return {"linears": [
        {"kernel": jnp.asarray(np.asarray(sd[f"layers.{i}.weight"]).T),
         "bias": jnp.asarray(np.asarray(sd[f"layers.{i}.bias"]))}
        for i in idx
    ]}


def load_aesthetic_head(path: str) -> Dict[str, Any]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_torch_aesthetic_head(
        {k: v.numpy() for k, v in sd.items()})


def aesthetic_quality(clip_params: Dict[str, Any], vcfg,
                      head: Dict[str, Any], frames: np.ndarray,
                      batch: int = 8) -> float:
    """frames [T, H, W, 3] in [0,1] -> VBench aesthetic_quality: mean
    predictor score over frames, /10, clipped to [0,1]."""
    from ..models.clip import clip_image_embed, preprocess_frames

    pixels = preprocess_frames(np.asarray(frames), vcfg.image_size)
    scores = []
    for i in range(0, pixels.shape[0], batch):
        emb = clip_image_embed(clip_params, vcfg, pixels[i:i + batch])
        scores.append(np.asarray(aesthetic_mlp(head, emb)))
    return float(np.clip(np.concatenate(scores).mean() / 10.0, 0.0, 1.0))


# --------------------------------------------------------------------------
# Native dispatcher
# --------------------------------------------------------------------------


def load_native_towers(towers_dir: str) -> Dict[str, Any]:
    """Best-effort load of the native VBench towers from the
    fetch_and_convert_towers.py / make_synth_towers.py layout:
    dino_vits16.pth (optional dino_config.json sidecar for synthetic
    geometries), aesthetic_l14.pth + clip_l14/ (HF snapshot),
    musiq_spaq.pth (optional musiq_config.json sidecar). Missing files
    produce per-dimension skip reasons, not failures."""
    import json
    import os

    towers: Dict[str, Any] = {}
    dino_path = os.path.join(towers_dir, "dino_vits16.pth")
    if os.path.exists(dino_path):
        dcfg = DINOViTConfig()
        side = os.path.join(towers_dir, "dino_config.json")
        if os.path.exists(side):
            with open(side) as f:
                dcfg = DINOViTConfig(**json.load(f))
        towers["dino"] = (load_dino_params(dino_path, dcfg), dcfg)
    musiq_path = os.path.join(towers_dir, "musiq_spaq.pth")
    if os.path.exists(musiq_path):
        from .musiq import load_musiq_params

        towers["musiq"] = load_musiq_params(musiq_path)
    head_path = os.path.join(towers_dir, "aesthetic_l14.pth")
    clip_dir = os.path.join(towers_dir, "clip_l14")
    if os.path.exists(head_path) and os.path.isdir(clip_dir):
        from ..config import CLIPTextConfig, CLIPVisionConfig
        from ..models.convert import (convert_torch_clip_model_state,
                                      read_hf_clip_dir)

        sd, hf = read_hf_clip_dir(clip_dir)
        vc, tc = hf["vision_config"], hf["text_config"]
        vcfg = CLIPVisionConfig(
            width=vc.get("hidden_size", CLIP_L14["width"]),
            num_layers=vc.get("num_hidden_layers", CLIP_L14["num_layers"]),
            num_heads=vc.get("num_attention_heads", CLIP_L14["num_heads"]),
            patch_size=vc.get("patch_size", CLIP_L14["patch_size"]),
            image_size=vc.get("image_size", CLIP_L14["image_size"]),
            projection_dim=hf.get("projection_dim",
                                  CLIP_L14["projection_dim"]),
        )
        tcfg = CLIPTextConfig(
            vocab_size=tc.get("vocab_size", 49408),
            width=tc.get("hidden_size", 768),
            num_layers=tc.get("num_hidden_layers", 12),
            num_heads=tc.get("num_attention_heads", 12),
            max_length=tc.get("max_position_embeddings", 77),
        )
        clip_params = convert_torch_clip_model_state(sd, vcfg, tcfg)
        towers["aesthetic"] = (clip_params, vcfg,
                               load_aesthetic_head(head_path))
    return towers


def resolve_unavailable_dimensions(
    towers: Dict[str, Any], dims: list,
) -> Dict[str, str]:
    """Which of ``dims`` cannot be scored with the given towers, and
    why — resolved ONCE up front so the per-video loop never decodes a
    video for a dimension that can't run."""
    unavailable: Dict[str, str] = {}
    for dim in dims:
        if dim in ("temporal_flickering", "motion_smoothness"):
            continue
        if dim == "subject_consistency":
            if "dino" not in towers:
                unavailable[dim] = ("dino_vits16.pth not in towers dir "
                                    "(fetch_and_convert_towers.py --only "
                                    "dino)")
        elif dim == "aesthetic_quality":
            if "aesthetic" not in towers:
                unavailable[dim] = ("aesthetic_l14.pth + clip_l14/ not in "
                                    "towers dir (fetch_and_convert_towers"
                                    ".py --only aesthetic)")
        elif dim == "imaging_quality":
            if "musiq" not in towers:
                unavailable[dim] = ("musiq_spaq.pth not in towers dir "
                                    "(make_synth_towers.py --only musiq, "
                                    "or a converted pyiqa checkpoint)")
        else:
            unavailable[dim] = "unknown dimension"
    return unavailable


def score_video_dimensions(
    frames: np.ndarray,
    towers: Dict[str, Any],
    dims: list,
    unavailable: Dict[str, str],
) -> Dict[str, float]:
    """All available-dimension scores for ONE decoded video
    ([T,H,W,3] in [0,1])."""
    out: Dict[str, float] = {}
    for dim in dims:
        if dim in unavailable:
            continue
        if dim == "temporal_flickering":
            out[dim] = temporal_flickering(frames)
        elif dim == "motion_smoothness":
            out[dim] = motion_smoothness(frames)["value"]
        elif dim == "subject_consistency":
            dp, dcfg = towers["dino"]
            out[dim] = subject_consistency(dp, dcfg, frames)
        elif dim == "aesthetic_quality":
            cp, vcfg, head = towers["aesthetic"]
            out[dim] = aesthetic_quality(cp, vcfg, head, frames)
        elif dim == "imaging_quality":
            from .musiq import imaging_quality

            mp, mcfg = towers["musiq"]
            out[dim] = imaging_quality(mp, mcfg, frames)
    return out


def native_vbench_scores(
    frames_per_video: Dict[str, Any],
    towers: Optional[Dict[str, Any]] = None,
    dimensions: Optional[list] = None,
) -> Dict[str, Any]:
    """Score decoded videos ({name: [T,H,W,3] in [0,1]}) on every
    requested dimension the available towers can serve. Returns
    {"results": {dim: mean score or dict}, "per_video": {...},
    "unavailable": {dim: reason}}.

    A value may also be a zero-arg callable returning the array — a
    lazy loader. Videos are then decoded, scored on all dimensions,
    and freed ONE AT A TIME, so a 100-video campaign directory never
    holds more than one clip in RAM (a 28-frame 480x832 float32 clip
    is ~130 MB; 100 at once would be ~13 GB)."""
    towers = towers or {}
    dims = list(dimensions or (
        "subject_consistency", "motion_smoothness", "temporal_flickering",
        "aesthetic_quality", "imaging_quality"))
    unavailable = resolve_unavailable_dimensions(towers, dims)
    per_video: Dict[str, Dict[str, float]] = {}
    for n, f in frames_per_video.items():
        arr = f() if callable(f) else f
        per_video[n] = score_video_dimensions(arr, towers, dims,
                                              unavailable)
        del arr

    results: Dict[str, Any] = {}
    for dim in dims:
        vals = [v[dim] for v in per_video.values() if dim in v]
        if vals:
            results[dim] = float(np.mean(vals))
            if dim == "motion_smoothness":
                results["motion_smoothness_variant"] = "linear-interp"
    return {"results": results, "per_video": per_video,
            "unavailable": unavailable}
