"""High-level video pipeline: the TPU-native ``LongCatVideoPipeline``.

Interface contract (SURVEY.md §2.8): ``generate_vc`` (video continuation
from conditioning frames, KV-cached cond tokens, CFG, ``num_frames ≡ 1
(mod 4)`` — common.py:566-611), ``generate_t2v``
(t2v_experiment/scripts/run_longcat_t2v.py), prompt encoding
(common.py:228-255: pad to 512, last_hidden_state).

The ``ModelBundle`` groups params+configs for DiT / VAE / text encoder —
the backbone-generic handle the TTA driver works against (the reference
proves TTA is backbone-generic via backbone_experiment/, SURVEY.md §2.7).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models import vae as vae_mod
from ..models.umt5 import umt5_encode
from ..models.vae import latent_len
from .sampler import sample_latents


# ---------------------------------------------------------------------------
# Tokenizer: HF when available, deterministic hash fallback for tests
# ---------------------------------------------------------------------------


class HashTokenizer:
    """Deterministic whitespace+hash tokenizer used in tests and synthetic
    runs (no checkpoint dir). Same contract as the HF tokenizer path:
    (ids [1, L], mask [1, L]) padded to max_length."""

    def __init__(self, vocab_size: int, max_length: int):
        self.vocab_size = vocab_size
        self.max_length = max_length

    def __call__(self, text: str) -> Tuple[np.ndarray, np.ndarray]:
        import zlib

        # crc32, not hash(): built-in string hashing is salted per
        # process, which would break cross-run reproducibility
        words = text.lower().split()[: self.max_length - 1]
        ids = [(zlib.crc32(w.encode()) % (self.vocab_size - 2)) + 2
               for w in words]
        ids.append(1)  # eos
        n = len(ids)
        ids = ids + [0] * (self.max_length - n)
        mask = [1] * n + [0] * (self.max_length - n)
        return (np.asarray(ids, np.int32)[None],
                np.asarray(mask, np.int32)[None])


def load_hf_tokenizer(checkpoint_dir: str, max_length: int,
                      subfolder: str = "tokenizer"):
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(checkpoint_dir, subfolder=subfolder)

    def tokenize(text: str):
        out = tok([text], padding="max_length", max_length=max_length,
                  truncation=True, add_special_tokens=True,
                  return_attention_mask=True, return_tensors="np")
        return out["input_ids"].astype(np.int32), \
            out["attention_mask"].astype(np.int32)

    return tokenize


def load_hf_clip_tokenizer(checkpoint_dir: str, max_length: int):
    """CLIP BPE tokenizer for the MMDiT y_vec path. Tries the common
    checkpoint subfolder names (Flux/Open-Sora layouts). Returns None
    when absent — callers fall back to the hash path with a loud
    warning, since T5/hash ids are meaningless CLIP BPE ids."""
    import os

    for sub in ("tokenizer_2", "clip_tokenizer", "tokenizer_clip"):
        if os.path.exists(os.path.join(checkpoint_dir, sub)):
            return load_hf_tokenizer(checkpoint_dir, max_length,
                                     subfolder=sub)
    return None


# ---------------------------------------------------------------------------
# ModelBundle
# ---------------------------------------------------------------------------


@dataclass
class ModelBundle:
    """All model state for one backbone (params are jax pytrees).

    ``cfg.arch`` selects the family: "longcat" (DiT + UMT5 cross-attn) or
    "mmdit" (Open-Sora v2 dual/single stream + T5 tokens + CLIP y_vec).
    """

    cfg: ModelConfig
    dit_params: Dict[str, Any]
    vae_params: Dict[str, Any]
    text_params: Dict[str, Any]
    tokenize: Callable[[str], Tuple[np.ndarray, np.ndarray]]
    clip_params: Optional[Dict[str, Any]] = None
    # CLIP BPE tokenizer for the MMDiT y_vec path (real checkpoints);
    # None = hash fallback (tests/synthetic only)
    clip_tokenize: Optional[Callable[[str],
                                     Tuple[np.ndarray, np.ndarray]]] = None

    @classmethod
    def init_random(cls, cfg: ModelConfig, seed: int = 0,
                    zero_init_dit: bool = False) -> "ModelBundle":
        """Random-weight bundle (tests / synthetic benchmarking)."""
        from ..models.umt5 import init_umt5
        from ..models.vae import init_vae

        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
        # jitted inits: eager per-leaf dispatch is pathologically slow
        # through the TPU tunnel (see .claude/skills/verify/SKILL.md)
        # jit_for (utils/memo.py) shares one wrapper per init fn across
        # bundles, so repeat in-process runs re-use the trace instead of
        # re-tracing a fresh jit(lambda) every time
        from ..utils.memo import jit_for

        if cfg.arch == "mmdit":
            from ..models.mmdit import init_mmdit

            dit_params = jit_for(init_mmdit, ("cfg", "zero_init"))(
                k1, cfg=cfg.dit, zero_init=zero_init_dit)
        elif cfg.arch == "cogvideox":
            from ..models.cogvideox import init_cogvideox

            dit_params = jit_for(init_cogvideox, ("cfg", "zero_init"))(
                k1, cfg=cfg.dit, zero_init=zero_init_dit)
        else:
            from ..models.dit import init_dit

            dit_params = jit_for(init_dit, ("cfg", "zero_init"))(
                k1, cfg=cfg.dit, zero_init=zero_init_dit)
        vae_params = jit_for(init_vae, ("cfg",))(k2, cfg=cfg.vae)
        text_params = jit_for(init_umt5, ("cfg",))(k3, cfg=cfg.text)
        clip_params = None
        if cfg.clip is not None:
            from ..models.clip_text import init_clip_text

            clip_params = jit_for(init_clip_text, ("cfg",))(
                k4, cfg=cfg.clip)
        return cls(
            cfg=cfg,
            dit_params=dit_params,
            vae_params=vae_params,
            text_params=text_params,
            tokenize=HashTokenizer(cfg.text.vocab_size, cfg.text.max_length),
            clip_params=clip_params,
        )

    # ------------------------------------------------------------------
    # Prompt encoding (reference: encode_prompt, common.py:228-255;
    # MMDiT: encode_prompt_opensora, common_opensora.py:82-105)
    # ------------------------------------------------------------------
    def encode_prompt(self, prompt: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """longcat -> (embeds [1, L, C], mask [1, L]);
        mmdit   -> (txt [1, L, C_t5], y_vec [1, C_clip])."""
        ids, mask = self.tokenize(prompt)
        emb = umt5_encode(self.text_params, self.cfg.text,
                          jnp.asarray(ids), jnp.asarray(mask))
        if self.cfg.arch == "mmdit":
            from ..models.clip_text import clip_text_pooled

            if self.clip_tokenize is not None:
                clip_ids, _ = self.clip_tokenize(prompt)
                clip_ids = np.asarray(clip_ids)[
                    :, : self.cfg.clip.max_length]
            else:
                # synthetic/random-weight fallback ONLY: T5/hash ids are
                # not CLIP BPE ids; with real CLIP weights the pooled
                # vector would be garbage (load_converted_bundle wires
                # clip_tokenize and warns when the tokenizer is absent)
                clip_ids = np.minimum(ids, self.cfg.clip.vocab_size - 1)
                clip_ids = clip_ids[:, : self.cfg.clip.max_length]
            y_vec = clip_text_pooled(self.clip_params, self.cfg.clip,
                                     jnp.asarray(clip_ids))
            return emb, y_vec
        return emb, jnp.asarray(mask)

    # ------------------------------------------------------------------
    # VAE helpers (reference: encode_video/decode_latents)
    # ------------------------------------------------------------------
    def encode_video(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """pixels [B, 3, T, H, W] in [-1, 1] -> normalized latents.

        Long clips use the bit-exact feature-cache streaming encoder
        (constant activation memory)."""
        if pixels.shape[2] > 17:
            return vae_mod.vae_encode_streamed(
                self.vae_params, self.cfg.vae, pixels)
        return vae_mod.vae_encode(self.vae_params, self.cfg.vae, pixels)

    def decode_latents(self, latents: jnp.ndarray) -> jnp.ndarray:
        """normalized latents -> pixels [B, 3, T, H, W] in [0, 1].

        Uses the bit-exact feature-cache streaming decoder for clips
        longer than a few latents (constant activation memory)."""
        if latents.shape[2] > 3:
            return vae_mod.vae_decode_streamed(
                self.vae_params, self.cfg.vae, latents)
        return vae_mod.vae_decode(self.vae_params, self.cfg.vae, latents)


# ---------------------------------------------------------------------------
# Generation entry points
# ---------------------------------------------------------------------------


# int8 decode quantization cache: adapter-method sweeps call generate_vc
# per video with the SAME frozen base params — quantizing the full tree
# each time would add a whole-params HBM pass per video. Keyed by object
# identity; the value holds a reference to the source params so the id
# stays valid.
_QUANT_CACHE: dict = {}


def _quantized_cached(params, arch: str):
    from ..ops.quant import QUANTIZERS_BY_ARCH

    key = (id(params), arch)
    hit = _QUANT_CACHE.get(key)
    if hit is not None and hit[0] is params:
        return hit[1]
    # drop the stale entry BEFORE quantizing so two bf16 + two int8
    # trees never coexist in HBM
    _QUANT_CACHE.clear()
    q = jax.jit(QUANTIZERS_BY_ARCH[arch])(params)
    _QUANT_CACHE[key] = (params, q)
    return q


def round_frames_4k1(num_frames: int) -> int:
    """Round generated-frame count up to 4k+1 (common.py:589-592)."""
    f = 4
    return ((num_frames - 1 + f - 1) // f) * f + 1


def generate_vc(
    bundle: ModelBundle,
    cond_pixels: jnp.ndarray,     # [1, 3, T_cond, H, W] in [-1, 1]
    prompt: str,
    *,
    num_frames: int = 93,
    num_inference_steps: int = 50,
    guidance_scale: float = 4.0,
    seed: int = 42,
    negative_prompt: str = "",
    use_kv_cache: bool = True,
    adapters=None,
    dit_params=None,
    attn_impl: Optional[str] = None,
    cp_mesh=None,
    bsa_cfg=None,
    quantize_decode: str = "none",
    bucket_gen: bool = False,
    gen_segment_steps: int = 0,
    pab_cfg=None,
    cfgr_cfg=None,
    init_noise: Optional[jnp.ndarray] = None,
) -> np.ndarray:
    """Video continuation. Returns generated frames [N, H, W, 3] in [0, 1]
    (N = num_frames rounded to 4k+1), matching the contract of
    ``generate_video_continuation`` (common.py:566-611).

    ``dit_params`` overrides the bundle's weights (full/norm-tune TTA
    generate with their adapted weights; adapter methods pass
    ``adapters`` instead — both flow through the same forward).

    ``quantize_decode="int8"``: run the denoise loop with W8A8 per-block
    matmuls (ops/quant.py) — a decode-only FLOP cut on top of the KV
    cache and BSA; training and the VAE stay bf16.

    ``bucket_gen``: pad the generated-latent horizon to the tta.bucket
    ladder with a traced valid count, so gen-horizon sweeps (exp4:
    16/28/44/72 frames) share one compile per bucket (LongCat path;
    composes with bsa_cfg and quantize_decode). Seed caveat: the
    initial noise is drawn at the padded bucket shape, so for the same
    seed the bucketed and exact paths produce *different* (equally
    valid) samples — toggling bucket_gen changes sample identity, not
    just compile count. Metrics comparisons across the flag must
    compare distributions, not per-video values.

    ``init_noise``: optional unit-variance carried noise
    [1, C, L*, lat_h, lat_w] (SAVi-DNO, --method dno). Latent frames
    beyond L* are topped up with the fresh seeded draw; extra frames
    are cropped — the paper's eps_optimized persists across prediction
    windows of possibly different horizons (savi_dno.py:139-152).
    LongCat decode path only."""
    cfg = bundle.cfg
    nf = round_frames_4k1(num_frames)
    n_gen_latents = (nf - 1) // 4 + 1

    cond_latents = bundle.encode_video(cond_pixels)
    emb, mask = bundle.encode_prompt(prompt)
    nemb, nmask = bundle.encode_prompt(negative_prompt)

    lat_h, lat_w = cond_latents.shape[3], cond_latents.shape[4]

    if cfg.arch in ("cogvideox", "mmdit"):
        # Fail loudly instead of silently running dense/unbucketed.
        # Design reason these stay LongCat-only: BSA and ring-CP exploit
        # the KV-cached cond-prefix/noise split of the LongCat decode —
        # the joint [text | video] samplers here re-denoise the FULL
        # latent volume each step with no cond KV cache, so there is no
        # exact-prefix block structure for BSA to preserve nor a cached
        # ring shard layout; bucketing pads the gen horizon, but these
        # samplers' cond region lives inside the same volume, so horizon
        # padding changes the conditioning channel layout. Segmented
        # dispatch (gen_segment_steps) IS supported on all three archs.
        for flag, name in ((bsa_cfg, "bsa_cfg"), (bucket_gen, "bucket_gen"),
                           (cp_mesh, "cp_mesh"),
                           (init_noise is not None, "init_noise")):
            if flag:
                raise NotImplementedError(
                    f"{name} is not supported on the {cfg.arch} decode "
                    "path (LongCat only): no cond-KV/noise split to "
                    "exploit in the joint-volume sampler — see "
                    "generate_vc")

    decode_params = bundle.dit_params if dit_params is None else dit_params
    if quantize_decode == "int8qk":
        # int8 weights AND int8 QK^T inside the attention kernel.
        # Carried on bsa_cfg (the kernel flag lives there); with no BSA
        # requested, keep_ratio=1.0 keeps attention DENSE-exact modulo
        # the 8-bit q/k rounding (top_k = all blocks).
        if cfg.arch != "longcat":
            raise NotImplementedError(
                "quantize_decode='int8qk' rides the BSA kernel "
                "(LongCat decode only); use 'int8' here")
        from ..config import BSAConfig

        bsa_cfg = dataclasses.replace(
            bsa_cfg if bsa_cfg is not None else BSAConfig(keep_ratio=1.0),
            qk_int8=True)
    if quantize_decode in ("int8", "int8qk"):
        arch = getattr(cfg, "arch", "longcat")
        if dit_params is None:
            # frozen bundle base (adapter methods): cache across videos
            decode_params = _quantized_cached(decode_params, arch)
        else:
            # per-video adapted weights (full/norm_tune): quantize
            # uncached so the cache never pins a stale full-model tree
            from ..ops.quant import QUANTIZERS_BY_ARCH

            decode_params = jax.jit(QUANTIZERS_BY_ARCH[arch])(decode_params)

    if cfg.arch == "cogvideox":
        # CogVideoX-I2V path: DDIM v-pred, 2-batch CFG, image-latent
        # channel conditioning (common_cogvideo.py:283-322). The sampler
        # returns the full volume; cond region swapped for exact latents
        # before decode.
        from .sampler import (
            sample_latents_cogvideox,
            sample_latents_cogvideox_segmented,
        )

        emb2 = jnp.concatenate([nemb, emb], axis=0)
        cvx_kwargs = dict(
            num_gen_latents=n_gen_latents,
            num_steps=num_inference_steps,
            lat_h=lat_h, lat_w=lat_w,
            cond_latents=cond_latents,
            adapters=adapters,
            guidance=float(guidance_scale),
            attn_impl=attn_impl,
            pab_cfg=pab_cfg,
            cfgr_cfg=cfgr_cfg,
        )
        if gen_segment_steps > 0:
            full = sample_latents_cogvideox_segmented(
                decode_params, cfg.dit, jax.random.PRNGKey(seed), emb2,
                segment_steps=gen_segment_steps, **cvx_kwargs)
        else:
            full = sample_latents_cogvideox(
                decode_params, cfg.dit, jax.random.PRNGKey(seed), emb2,
                **cvx_kwargs)
        full = full.at[:, :, : cond_latents.shape[2]].set(cond_latents)
        tf = cfg.vae.temporal_factor
        pixels = bundle.decode_latents(full)
        t_cond_px = 1 + (cond_latents.shape[2] - 1) * tf
        gen_px = pixels[0, :, t_cond_px:t_cond_px + nf]
        return np.asarray(gen_px.transpose(1, 2, 3, 0))

    if cfg.arch == "mmdit":
        # Open-Sora v2 v2v path: triple-batch CFG [prompt, neg, neg] with
        # cond_embed conditioning (run_full_tta_opensora.py:149-260);
        # the sampler returns the full latent volume incl. the cond
        # region, which we swap for the exact cond latents before decode.
        from .sampler import (
            sample_latents_mmdit,
            sample_latents_mmdit_segmented,
        )

        txt3 = jnp.concatenate([emb, nemb, nemb], axis=0)
        yv3 = jnp.concatenate([mask, nmask, nmask], axis=0)
        mm_kwargs = dict(
            num_gen_latents=n_gen_latents,
            num_steps=num_inference_steps,
            lat_h=lat_h, lat_w=lat_w,
            cond_latents=cond_latents,
            adapters=adapters,
            guidance=float(guidance_scale),
            attn_impl=attn_impl,
            pab_cfg=pab_cfg,
            cfgr_cfg=cfgr_cfg,
        )
        if gen_segment_steps > 0:
            full = sample_latents_mmdit_segmented(
                decode_params, cfg.dit, jax.random.PRNGKey(seed), txt3,
                yv3, segment_steps=gen_segment_steps, **mm_kwargs)
        else:
            full = sample_latents_mmdit(
                decode_params, cfg.dit, jax.random.PRNGKey(seed), txt3,
                yv3, **mm_kwargs)
        full = full.at[:, :, : cond_latents.shape[2]].set(cond_latents)
        tf = cfg.vae.temporal_factor
        pixels = bundle.decode_latents(full)
        t_cond_px = 1 + (cond_latents.shape[2] - 1) * tf
        gen_px = pixels[0, :, t_cond_px:t_cond_px + nf]
        return np.asarray(gen_px.transpose(1, 2, 3, 0))

    gen_bucket, num_valid = n_gen_latents, None
    if bucket_gen:
        from ..tta.bucket import bucket_len

        gen_bucket = bucket_len(n_gen_latents)
        # always traced (even at exact bucket size) so every horizon in
        # the bucket shares one trace
        num_valid = jnp.int32(n_gen_latents)
    if pab_cfg is not None and not use_kv_cache:
        raise NotImplementedError(
            "pab_cfg requires the KV-cache decode path (use_kv_cache)")
    fit_noise = None
    if init_noise is not None:
        # carry the optimized noise into this window's horizon: overwrite
        # the seeded draw's leading latent frames, keep fresh noise for
        # any frames beyond the carried length (same seed as the plain
        # path, so dno with a zero-step optimization == the baseline
        # sample apart from the carried region)
        fit_noise = jax.random.normal(
            jax.random.PRNGKey(seed),
            (1, cfg.dit.in_channels, gen_bucket, lat_h, lat_w), jnp.float32)
        L = min(init_noise.shape[2], gen_bucket)
        fit_noise = fit_noise.at[:, :, :L].set(
            init_noise[:, :, :L].astype(jnp.float32))
    sample_kwargs = dict(
        num_gen_latents=gen_bucket,
        num_steps=num_inference_steps,
        lat_h=lat_h, lat_w=lat_w,
        cond_latents=cond_latents,
        adapters=adapters,
        use_kv_cache=use_kv_cache,
        attn_impl=attn_impl,
        cp_mesh=cp_mesh,
        bsa_cfg=bsa_cfg,
        num_valid_gen_latents=num_valid,
        pab_cfg=pab_cfg,
        cfgr_cfg=cfgr_cfg,
        init_noise=fit_noise,
    )
    if gen_segment_steps > 0:
        # bounded per-dispatch execution time (long-horizon decode on
        # runtimes that kill minute-long single executions)
        from .sampler import sample_latents_segmented

        gen_latents = sample_latents_segmented(
            decode_params, cfg.dit, cfg.scheduler,
            jax.random.PRNGKey(seed), emb, mask, nemb, nmask,
            guidance_scale, segment_steps=gen_segment_steps,
            **sample_kwargs)
    else:
        gen_latents = sample_latents(
            decode_params, cfg.dit, cfg.scheduler,
            jax.random.PRNGKey(seed), emb, mask, nemb, nmask,
            guidance_scale, **sample_kwargs)
    gen_latents = gen_latents[:, :, :n_gen_latents]

    # Decode [cond | gen] together so the causal decoder sees the real
    # temporal context, then return the generated region sliced from the
    # cond/gen boundary: n_cond latents decode to 1+(n_cond-1)*tf frames,
    # and the n_gen generated latents decode to n_gen*tf = nf+3 frames —
    # the clip starting at the anchor is the first nf of those, so
    # slicing the tail would drop the 3 frames right after the anchor
    # and misalign every metric vs GT (reference scores
    # gen_output[num_cond:num_cond+num_gen], common.py:618-776).
    tf = cfg.vae.temporal_factor
    full = jnp.concatenate([cond_latents, gen_latents], axis=2)
    pixels = bundle.decode_latents(full)  # [1, 3, T_full, H, W] in [0,1]
    t_cond_px = 1 + (cond_latents.shape[2] - 1) * tf
    gen_px = pixels[0, :, t_cond_px:t_cond_px + nf]
    return np.asarray(gen_px.transpose(1, 2, 3, 0))  # [N, H, W, 3]


def generate_t2v(
    bundle: ModelBundle,
    prompt: str,
    *,
    num_frames: int = 93,
    height: int = 480,
    width: int = 832,
    num_inference_steps: int = 50,
    guidance_scale: float = 4.0,
    seed: int = 42,
    negative_prompt: str = "",
    adapters=None,
    attn_impl: Optional[str] = None,
    cp_mesh=None,
    pab_cfg=None,
    cfgr_cfg=None,
) -> np.ndarray:
    """Text-to-video (reference: run_longcat_t2v.py pipe.generate_t2v).
    Returns [N, H, W, 3] in [0, 1]. ``pab_cfg``: Pyramid Attention
    Broadcast on the dense t2v denoise loop; ``cfgr_cfg``: CFG
    guidance-delta reuse (config.CFGReuseConfig)."""
    cfg = bundle.cfg
    nf = round_frames_4k1(num_frames)
    n_lat = latent_len(nf, cfg.vae.temporal_factor)
    sf = cfg.vae.spatial_factor

    emb, mask = bundle.encode_prompt(prompt)
    nemb, nmask = bundle.encode_prompt(negative_prompt)

    latents = sample_latents(
        bundle.dit_params, cfg.dit, cfg.scheduler,
        jax.random.PRNGKey(seed),
        emb, mask, nemb, nmask, guidance_scale,
        num_gen_latents=n_lat,
        num_steps=num_inference_steps,
        lat_h=height // sf, lat_w=width // sf,
        cond_latents=None,
        adapters=adapters,
        attn_impl=attn_impl,
        cp_mesh=cp_mesh,
        pab_cfg=pab_cfg,
        cfgr_cfg=cfgr_cfg,
    )
    pixels = bundle.decode_latents(latents)
    return np.asarray(pixels[0].transpose(1, 2, 3, 0)[:nf])
