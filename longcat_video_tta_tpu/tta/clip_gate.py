"""CLIP gate: per-sample pre-TTA caption<->frames alignment gate.

Behavior-compatible rebuild of the reference (common.py:1709-2012):
sample k frame offsets from the TTA window (full-window linspace or
late_only fraction), score caption vs frames with CLIP (per-image) or
X-CLIP (video, 8-frame pad/subsample), aggregate mean/min/max, decide
skip_tta when score < threshold; log-only and fail-open/fail-closed
modes; rich per-video info dict and run-level stats.

Scorers are pluggable (zero-egress environments have no pretrained CLIP
downloads): ``make_hf_clip_scorer``/``make_hf_xclip_scorer`` load local
checkpoints via transformers; tests inject stub scorers.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import numpy as np

from ..config import ClipGateConfig

# scorer: (frames [k, H, W, 3] float [0,1], caption str) -> [k] scores
ScorerFn = Callable[[np.ndarray, str], np.ndarray]


def sample_clip_frame_offsets(
    window_len: int, cfg: ClipGateConfig
) -> List[int]:
    """Frame offsets inside the TTA window
    (reference: _sample_clip_frame_offsets)."""
    k = max(1, cfg.sample_frames)
    mode = cfg.sampling_mode
    if mode == "late_only":
        frac = min(max(cfg.late_fraction, 1e-6), 1.0)
        start = window_len - max(1, int(round(window_len * frac)))
        candidates = list(range(start, window_len))
    else:
        candidates = list(range(window_len))
    if len(candidates) <= k:
        return candidates
    idx = np.linspace(0, len(candidates) - 1, k).round().astype(int)
    return [candidates[i] for i in idx]


def make_hf_clip_scorer(model_path: str) -> ScorerFn:
    """Per-image CLIP score via a local HF checkpoint
    (reference: _get_clip_scorer, cached)."""
    import torch
    from transformers import CLIPModel, CLIPProcessor

    model = CLIPModel.from_pretrained(model_path).eval()
    proc = CLIPProcessor.from_pretrained(model_path)

    def score(frames: np.ndarray, caption: str) -> np.ndarray:
        images = [(f * 255).astype(np.uint8) for f in frames]
        inputs = proc(text=[caption], images=images, return_tensors="pt",
                      padding=True, truncation=True)
        with torch.no_grad():
            out = model(**inputs)
            img = out.image_embeds / out.image_embeds.norm(dim=-1, keepdim=True)
            txt = out.text_embeds / out.text_embeds.norm(dim=-1, keepdim=True)
        return (img @ txt.T).squeeze(-1).numpy()

    return score


def make_hf_xclip_scorer(model_path: str) -> ScorerFn:
    """Video-level X-CLIP score; pads/subsamples to 8 frames
    (reference: _get_xclip_scorer)."""
    import torch
    from transformers import XCLIPModel, XCLIPProcessor

    model = XCLIPModel.from_pretrained(model_path).eval()
    proc = XCLIPProcessor.from_pretrained(model_path)

    def score(frames: np.ndarray, caption: str) -> np.ndarray:
        from ..models.clip import pad_or_subsample_frames

        frames = pad_or_subsample_frames(np.asarray(frames), 8)
        vid = [(f * 255).astype(np.uint8) for f in frames]
        inputs = proc(text=[caption], videos=[vid], return_tensors="pt",
                      padding=True, truncation=True)
        with torch.no_grad():
            out = model(**inputs)
            v = out.video_embeds / out.video_embeds.norm(dim=-1, keepdim=True)
            tx = out.text_embeds / out.text_embeds.norm(dim=-1, keepdim=True)
        return (v @ tx.T).reshape(-1).numpy()

    return score


def make_tpu_clip_scorer(model_path: str, backend: str = "clip",
                         allow_hash_tokenizer: bool = False) -> ScorerFn:
    """Convert a local HF CLIP / X-CLIP checkpoint into the JAX towers
    (models/clip.py, models/xclip.py) and score caption<->frames
    entirely on-device — torch is used only to deserialize the weights
    once. This is the TPU-native replacement for
    make_hf_clip_scorer/make_hf_xclip_scorer (reference scores with
    runtime HF torch models, common.py:1806-2012)."""
    import os

    from ..config import CLIPTextConfig, CLIPVisionConfig, XCLIPConfig
    from ..models.clip import clip_hash_tokenize
    from ..models.convert import read_hf_clip_dir

    sd, hf = read_hf_clip_dir(model_path)
    tc, vc = hf["text_config"], hf["vision_config"]
    tcfg = CLIPTextConfig(
        vocab_size=tc.get("vocab_size", 49408),
        width=tc.get("hidden_size", 512),
        num_layers=tc.get("num_hidden_layers", 12),
        num_heads=tc.get("num_attention_heads", 8),
        max_length=tc.get("max_position_embeddings", 77),
    )
    vcfg = CLIPVisionConfig(
        width=vc.get("hidden_size", 768),
        num_layers=vc.get("num_hidden_layers", 12),
        num_heads=vc.get("num_attention_heads", 12),
        patch_size=vc.get("patch_size", 32),
        image_size=vc.get("image_size", 224),
        projection_dim=hf.get("projection_dim", 512),
    )

    # The hash fallback is only legitimate when the checkpoint dir
    # carries no tokenizer at all (synthetic-weight tests). If tokenizer
    # files exist but fail to load, scoring real pretrained weights
    # against hash-random token ids would be silently meaningless — let
    # AutoTokenizer raise, like the torch scorer path does.
    has_tok = any(
        os.path.exists(os.path.join(model_path, f))
        for f in ("tokenizer.json", "vocab.json", "merges.txt",
                  "tokenizer_config.json", "spiece.model"))
    if has_tok:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(model_path)

        def tokenize(caption: str) -> np.ndarray:
            return np.asarray(tok(
                caption, padding="max_length", truncation=True,
                max_length=tcfg.max_length).input_ids, np.int32)
    else:
        if not allow_hash_tokenizer:
            # a re-saved real checkpoint (save_pretrained without the
            # processor) would otherwise score crc32-random token ids —
            # meaningless gate decisions with only a warning to show
            # for it; fail loud like the torch AutoProcessor path does
            raise ValueError(
                f"no tokenizer files in {model_path}; refusing to score "
                "real weights with the hash tokenizer. Add the tokenizer "
                "files to the checkpoint dir, or opt in explicitly for "
                "synthetic weights (--clip-gate-hash-tokenizer / "
                "allow_hash_tokenizer=True)")
        print(f"[clip_gate] WARNING: no tokenizer files in {model_path}; "
              "using the deterministic hash tokenizer — gate scores are "
              "meaningful only for synthetic/test weights")

        def tokenize(caption: str) -> np.ndarray:
            return clip_hash_tokenize(caption, tcfg.max_length,
                                      tcfg.vocab_size)

    if backend == "xclip":
        from ..models.convert import convert_torch_xclip_state
        from ..models.xclip import make_jax_xclip_scorer

        cfg = XCLIPConfig(
            vision=vcfg, text=tcfg,
            num_frames=vc.get("num_frames", 8),
            mit_layers=vc.get("mit_num_hidden_layers", 1),
            mit_heads=vc.get("mit_num_attention_heads", 8),
            prompt_layers=hf.get("prompt_layers", 2),
            prompt_heads=hf.get("prompt_num_attention_heads", 8),
        )
        return make_jax_xclip_scorer(convert_torch_xclip_state(sd, cfg),
                                     cfg, tokenize)
    from ..models.clip import make_jax_clip_scorer
    from ..models.convert import convert_torch_clip_model_state

    return make_jax_clip_scorer(
        convert_torch_clip_model_state(sd, vcfg, tcfg), vcfg, tcfg,
        tokenize)


def evaluate_clip_gate(
    frames: np.ndarray,            # [T, H, W, 3] in [0, 1] (TTA window)
    caption: str,
    cfg: ClipGateConfig,
    scorer: Optional[ScorerFn] = None,
) -> Dict[str, Any]:
    """Gate decision dict merged into per-video results
    (reference: evaluate_clip_gate common.py:1806-1984)."""
    info: Dict[str, Any] = {
        "clip_gate_enabled": cfg.enabled,
        "clip_gate_backend": cfg.backend,
        "clip_gate_threshold": cfg.threshold,
        "clip_gate_log_only": cfg.log_only,
        "skip_tta": False,
        "clip_gate_score": None,
        "clip_gate_error": None,
    }
    if not cfg.enabled:
        return info
    try:
        if scorer is None:
            raise RuntimeError(
                "no CLIP scorer available (no local checkpoint configured)"
            )
        offsets = sample_clip_frame_offsets(frames.shape[0], cfg)
        info["clip_gate_frame_offsets"] = offsets
        sampled = frames[np.asarray(offsets)]
        scores = np.asarray(scorer(sampled, caption), np.float64)
        agg = {"mean": np.mean, "min": np.min, "max": np.max}[cfg.aggregate]
        score = float(agg(scores))
        info["clip_gate_score"] = score
        info["clip_gate_scores"] = [float(s) for s in scores]
        if not cfg.log_only and score < cfg.threshold:
            info["skip_tta"] = True
    except Exception as e:  # fail-open / fail-closed (common.py:1976-1984)
        info["clip_gate_error"] = f"{type(e).__name__}: {e}"
        info["skip_tta"] = not cfg.fail_open
    return info


def summarize_clip_gate_stats(results: List[Dict]) -> Dict[str, Any]:
    """Run-level gate stats (reference: summarize_clip_gate_stats)."""
    infos = [r for r in results if r.get("clip_gate_enabled")]
    if not infos:
        return {"clip_gate_enabled": False}
    scores = [r["clip_gate_score"] for r in infos
              if r.get("clip_gate_score") is not None]
    skipped = sum(1 for r in infos if r.get("skip_tta"))
    errors = sum(1 for r in infos if r.get("clip_gate_error"))
    return {
        "clip_gate_enabled": True,
        "num_evaluated": len(infos),
        "num_skipped": skipped,
        "num_errors": errors,
        "skip_ratio": skipped / len(infos),
        "score_mean": float(np.mean(scores)) if scores else None,
        "score_min": float(np.min(scores)) if scores else None,
        "score_max": float(np.max(scores)) if scores else None,
    }
