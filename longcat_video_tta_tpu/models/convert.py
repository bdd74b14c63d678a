"""Checkpoint conversion / loading.

The reference loads torch checkpoints via from_pretrained
(common.py:46-96). This module provides:

- ``save_bundle`` / ``load_converted_bundle``: orbax round-trip of our
  native param trees (the framework's own checkpoint format)
- ``convert_torch_dit_state``: best-effort mapping from a LongCat-style
  torch state_dict to our stacked-block DiT tree (for use once real
  weights are present; the upstream LongCat-Video checkpoint is not part
  of the reference snapshot — SURVEY.md reading notes)
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, RunConfig, get_model_config, resolve_dtype


def save_bundle(out_dir: str, bundle, converted_components=None) -> None:
    """``converted_components``: names of components holding real
    converted weights (vs random init). Recorded in model_config.json
    and checked loudly by ``load_converted_bundle``."""
    import orbax.checkpoint as ocp

    os.makedirs(out_dir, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    comps = [("dit", bundle.dit_params), ("vae", bundle.vae_params),
             ("text_encoder", bundle.text_params)]
    if getattr(bundle, "clip_params", None) is not None:
        comps.append(("clip", bundle.clip_params))
    for name, tree in comps:
        ckptr.save(os.path.abspath(os.path.join(out_dir, name)), tree,
                   force=True)
    with open(os.path.join(out_dir, "model_config.json"), "w") as f:
        import dataclasses

        meta = dataclasses.asdict(bundle.cfg)
        meta["converted_components"] = sorted(
            converted_components
            if converted_components is not None
            else ["dit", "vae", "text_encoder"])
        json.dump(meta, f, indent=2)


def load_converted_bundle(ckpt_dir: str, cfg: ModelConfig):
    """Load an orbax-format bundle saved by ``save_bundle``; uses the HF
    tokenizer subfolder when present (reference layout)."""
    import orbax.checkpoint as ocp

    from ..pipeline.pipeline import HashTokenizer, ModelBundle, load_hf_tokenizer

    import jax

    ckptr = ocp.PyTreeCheckpointer()
    trees = {}
    names = ["dit", "vae", "text_encoder"]
    if cfg.clip is not None:
        names.append("clip")
    for name in names:
        path = os.path.abspath(os.path.join(ckpt_dir, name))
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{path} missing — run scripts/convert_checkpoint.py first"
            )
        # restore host-side (numpy) so bundles move freely across device
        # topologies (saved single-chip, restored under a mesh, etc.)
        meta = ckptr.metadata(path)
        tree = getattr(getattr(meta, "item_metadata", meta), "tree", meta)
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        trees[name] = ckptr.restore(path, restore_args=restore_args)

    meta_path = os.path.join(ckpt_dir, "model_config.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        # the bundle's own latent statistics win over the preset's: a
        # pretrained VAE (scripts/pretrain_demo.py) has its own
        # per-channel latents_mean/std estimated over its training
        # distribution, and normalize/denormalize must use THOSE
        vmeta = meta.get("vae") or {}
        if "latents_mean" in vmeta:
            import dataclasses as _dc

            cfg = _dc.replace(cfg, vae=_dc.replace(
                cfg.vae,
                latents_mean=tuple(vmeta["latents_mean"]),
                latents_std=tuple(vmeta["latents_std"])))
        converted = set(meta.get("converted_components",
                                 ["dit", "vae", "text_encoder"]))
        missing = {"dit", "vae", "text_encoder"} - converted
        if missing:
            print(
                "=" * 70 + f"\nWARNING: bundle {ckpt_dir} holds RANDOM-INIT "
                f"weights for {sorted(missing)} (converted with "
                f"--allow-partial). Metrics from this bundle are "
                f"meaningless for real-checkpoint comparisons.\n" + "=" * 70
            )

    tok_dir = os.path.join(ckpt_dir, "tokenizer")
    if os.path.exists(tok_dir):
        tokenize = load_hf_tokenizer(ckpt_dir, cfg.text.max_length)
    else:
        tokenize = HashTokenizer(cfg.text.vocab_size, cfg.text.max_length)
    clip_tokenize = None
    if cfg.clip is not None:
        from ..pipeline.pipeline import load_hf_clip_tokenizer

        clip_tokenize = load_hf_clip_tokenizer(ckpt_dir,
                                               cfg.clip.max_length)
        if clip_tokenize is None:
            print(
                "WARNING: no CLIP tokenizer subfolder in the bundle — "
                "MMDiT y_vec conditioning will use hash ids clamped into "
                "the CLIP vocab (meaningless with real CLIP weights). "
                "Copy the checkpoint's CLIP tokenizer to "
                f"{os.path.join(ckpt_dir, 'tokenizer_2')}.")
    return ModelBundle(cfg=cfg, dit_params=trees["dit"],
                       vae_params=trees["vae"],
                       text_params=trees["text_encoder"],
                       tokenize=tokenize,
                       clip_params=trees.get("clip"),
                       clip_tokenize=clip_tokenize)


# ---------------------------------------------------------------------------
# torch state_dict -> stacked-block DiT tree
# ---------------------------------------------------------------------------


class _TrackedStateDict(dict):
    """State-dict wrapper recording key access, so converters can assert
    they consumed every source parameter — a real-weight conversion must
    never silently drop keys (advisor finding r2: a checkpoint carrying
    e.g. patch_embed.pos_embedding would otherwise convert to a tree
    missing learned parameters and produce wrong outputs)."""

    def __init__(self, sd):
        super().__init__(sd)
        self.accessed = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)

    def assert_fully_consumed(self, what: str) -> None:
        leftover = sorted(set(self) - self.accessed)
        if leftover:
            shown = ", ".join(leftover[:8])
            more = f" (+{len(leftover) - 8} more)" if len(leftover) > 8 \
                else ""
            raise ValueError(
                f"{what} conversion left {len(leftover)} state-dict "
                f"key(s) unconsumed: {shown}{more} — the converter does "
                "not understand this checkpoint layout; refusing a "
                "silently-partial conversion")


def _stack(sd, fmt: str, depth: int, transpose: bool = False):
    mats = []
    for i in range(depth):
        w = np.asarray(sd[fmt.format(i)])
        mats.append(w.T if transpose else w)
    return jnp.asarray(np.stack(mats))


def convert_torch_dit_state(sd: Dict[str, Any], cfg,
                            rope_interleaved: bool = False) -> Dict[str, Any]:
    """Map a LongCat-style torch DiT state_dict (keys per SURVEY.md §2.8:
    x_embedder.proj, t_embedder, y_embedder, blocks.{i}.attn.qkv/proj/
    q_norm/k_norm, cross_attn.q_linear/kv_linear/proj/q_norm/k_norm,
    ffn.w1/w2/w3, pre_crs_attn_norm, adaLN_modulation, final_layer) into
    our stacked tree. torch Linear weights are [out, in] -> transposed;
    a Conv3d ``x_embedder.proj`` ([D, C, pt, ph, pw]) is flattened to the
    patchify feature order (pt, ph, pw, C — models/dit.py::patchify).

    Numerically validated end-to-end against an independent torch
    implementation of the documented conventions in
    tests/test_oracle_dit.py (forward equality at fp32).

    CHOICE markers — conventions the reference's visible usage
    (run_delta_a.py:134-217, run_norm_tune_tta.py:74-98,
    run_lora_tta.py:142-168) cannot pin, fixed here to the dominant
    public convention and pinned by the torch oracle test:

    - RoPE: factored 3D (t,h,w) rotary with HALF-SPLIT channel rotation,
      per-axis dims head_dim·(1/4, 3/8, 3/8), theta 10000. If the real
      checkpoint uses interleaved-pair rotation (complex-mul style),
      pass ``rope_interleaved=True``: the q/k rows of every fused qkv
      (and the q/k RMSNorm scales) are permuted per head so our
      half-split forward equals the interleaved forward exactly
      (see _rope_perm; same mechanism as the MMDiT/CogVideoX
      converters).
    - adaLN chunk order: (shift, scale, gate)×(msa, mlp), final layer
      (shift, scale) — the Meta-DiT order.
    - t_embedder: standard DiT sinusoid, cat([cos, sin]) over
      freq_dim/2 frequencies exp(-ln(1e4)·i/half), MLP in fp32
      (run_delta_a.py:161-165 pins only the fp32 part).
    - y_embedder: Linear-GELU(tanh)-Linear.
    - LayerNorm/RMSNorm eps: 1e-6 (torch nn.LayerNorm default is 1e-5;
      video DiTs overwhelmingly use 1e-6).
    - modulate: x·(1+scale)+shift; cross-attn residual is ungated with
      an affine pre-norm (pre_crs_attn_norm carrying weight+bias is
      visible in run_norm_tune_tta.py:79-84).

    Raises KeyError with the missing name when the layout differs; the
    mapping is exercised by tests/test_convert.py on a synthetic
    state_dict of the expected layout.
    """
    L = cfg.depth

    def t(name):
        return jnp.asarray(np.asarray(sd[name]).T)

    def v(name):
        return jnp.asarray(np.asarray(sd[name]))

    xw = np.asarray(sd["x_embedder.proj.weight"])
    if xw.ndim == 5:  # Conv3d [D, C, pt, ph, pw] -> [(pt ph pw C), D]
        xk = jnp.asarray(
            xw.transpose(2, 3, 4, 1, 0).reshape(-1, xw.shape[0]))
    else:
        xk = jnp.asarray(xw.T)

    nH, dh = cfg.num_heads, cfg.head_dim

    def qkv_maybe_perm(w):
        """Optionally permute fused-qkv q/k rows for the RoPE convention
        (w: torch [3D, D])."""
        if not rope_interleaved:
            return w
        return _permute_qkv_rows(w, nH, dh)

    def stack_qkv(fmt, transpose=True):
        mats = []
        for i in range(L):
            w = np.asarray(sd[fmt.format(i)])
            w = qkv_maybe_perm(w if w.ndim == 2 else w[:, None])
            if w.shape[-1] == 1:
                w = w[:, 0]
            mats.append(w.T if (transpose and w.ndim == 2) else w)
        return jnp.asarray(np.stack(mats))

    def stack_qknorm(fmt):
        if not rope_interleaved:
            return _stack(sd, fmt, L)
        perm = _rope_perm(dh)
        return jnp.asarray(np.stack(
            [np.asarray(sd[fmt.format(i)])[perm] for i in range(L)]))

    params = {
        "x_embed": {"kernel": xk,
                    "bias": v("x_embedder.proj.bias")},
        "t_embed": {
            "w1": jnp.asarray(np.asarray(sd["t_embedder.mlp.0.weight"]).T,
                              jnp.float32),
            "b1": jnp.asarray(np.asarray(sd["t_embedder.mlp.0.bias"]),
                              jnp.float32),
            "w2": jnp.asarray(np.asarray(sd["t_embedder.mlp.2.weight"]).T,
                              jnp.float32),
            "b2": jnp.asarray(np.asarray(sd["t_embedder.mlp.2.bias"]),
                              jnp.float32),
        },
        "y_embed": {
            "in": {"kernel": t("y_embedder.y_proj.0.weight"),
                   "bias": v("y_embedder.y_proj.0.bias")},
            "out": {"kernel": t("y_embedder.y_proj.2.weight"),
                    "bias": v("y_embedder.y_proj.2.bias")},
        },
        "blocks": {
            "adaln": {
                "kernel": _stack(sd, "blocks.{}.adaLN_modulation.1.weight",
                                 L, transpose=True),
                "bias": _stack(sd, "blocks.{}.adaLN_modulation.1.bias", L),
            },
            "attn": {
                "qkv": {
                    "kernel": stack_qkv("blocks.{}.attn.qkv.weight"),
                    "bias": stack_qkv("blocks.{}.attn.qkv.bias",
                                      transpose=False),
                },
                "proj": {
                    "kernel": _stack(sd, "blocks.{}.attn.proj.weight", L,
                                     transpose=True),
                    "bias": _stack(sd, "blocks.{}.attn.proj.bias", L),
                },
                "q_norm": stack_qknorm("blocks.{}.attn.q_norm.weight"),
                "k_norm": stack_qknorm("blocks.{}.attn.k_norm.weight"),
            },
            "cross_attn": {
                "q": {
                    "kernel": _stack(sd, "blocks.{}.cross_attn.q_linear.weight",
                                     L, transpose=True),
                    "bias": _stack(sd, "blocks.{}.cross_attn.q_linear.bias", L),
                },
                "kv": {
                    "kernel": _stack(sd, "blocks.{}.cross_attn.kv_linear.weight",
                                     L, transpose=True),
                    "bias": _stack(sd, "blocks.{}.cross_attn.kv_linear.bias", L),
                },
                "proj": {
                    "kernel": _stack(sd, "blocks.{}.cross_attn.proj.weight", L,
                                     transpose=True),
                    "bias": _stack(sd, "blocks.{}.cross_attn.proj.bias", L),
                },
                "q_norm": _stack(sd, "blocks.{}.cross_attn.q_norm.weight", L),
                "k_norm": _stack(sd, "blocks.{}.cross_attn.k_norm.weight", L),
            },
            "pre_crs_norm": {
                "weight": _stack(sd, "blocks.{}.pre_crs_attn_norm.weight", L),
                "bias": _stack(sd, "blocks.{}.pre_crs_attn_norm.bias", L),
            },
            "ffn": {
                "w1": {"kernel": _stack(sd, "blocks.{}.ffn.w1.weight", L,
                                        transpose=True)},
                "w3": {"kernel": _stack(sd, "blocks.{}.ffn.w3.weight", L,
                                        transpose=True)},
                "w2": {"kernel": _stack(sd, "blocks.{}.ffn.w2.weight", L,
                                        transpose=True)},
            },
        },
        "final": {
            "adaln": {
                "kernel": t("final_layer.adaLN_modulation.1.weight"),
                "bias": v("final_layer.adaLN_modulation.1.bias"),
            },
            "proj": {"kernel": t("final_layer.linear.weight"),
                     "bias": v("final_layer.linear.bias")},
        },
    }
    return params


# ---------------------------------------------------------------------------
# torch UMT5EncoderModel state_dict -> stacked tree
# ---------------------------------------------------------------------------


def convert_torch_umt5_state(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Map a HF ``UMT5EncoderModel`` state_dict into our stacked tree.

    Upstream layout (transformers; reference loads it at common.py:62-64):
    ``shared.weight``, per block ``encoder.block.{i}.layer.0.SelfAttention.
    {q,k,v,o,relative_attention_bias}.weight`` + ``layer.0.layer_norm`` and
    ``layer.1.DenseReluDense.{wi_0,wi_1,wo}.weight`` + ``layer.1.layer_norm``,
    then ``encoder.final_layer_norm.weight``. UMT5 (unlike T5) has one
    relative-attention-bias table per layer. torch Linear weights are
    [out, in] -> transposed. Exercised against the real transformers
    implementation in tests/test_umt5.py (output parity on CPU).
    """
    from ..config import resolve_dtype

    L = cfg.num_layers
    pdt = resolve_dtype(cfg.param_dtype)

    def stack(fmt, transpose=False, dtype=None):
        mats = []
        for i in range(L):
            w = np.asarray(sd[fmt.format(i)], np.float32)
            mats.append(w.T if transpose else w)
        return jnp.asarray(np.stack(mats)).astype(dtype or pdt)
    att = "encoder.block.{}.layer.0.SelfAttention."
    return {
        "embed": jnp.asarray(np.asarray(sd["shared.weight"], np.float32),
                             pdt),
        "blocks": {
            "ln1": stack("encoder.block.{}.layer.0.layer_norm.weight"),
            "q": stack(att + "q.weight", transpose=True),
            "k": stack(att + "k.weight", transpose=True),
            "v": stack(att + "v.weight", transpose=True),
            "o": stack(att + "o.weight", transpose=True),
            # bias table used in fp32 logits: [num_buckets, heads]
            "rel_bias": stack(att + "relative_attention_bias.weight",
                              dtype=jnp.float32),
            "ln2": stack("encoder.block.{}.layer.1.layer_norm.weight"),
            "wi0": stack(
                "encoder.block.{}.layer.1.DenseReluDense.wi_0.weight",
                transpose=True),
            "wi1": stack(
                "encoder.block.{}.layer.1.DenseReluDense.wi_1.weight",
                transpose=True),
            "wo": stack("encoder.block.{}.layer.1.DenseReluDense.wo.weight",
                        transpose=True),
        },
        "final_ln": jnp.asarray(
            np.asarray(sd["encoder.final_layer_norm.weight"], np.float32),
            pdt),
    }


# ---------------------------------------------------------------------------
# torch WAN-VAE state_dict -> our tree
# ---------------------------------------------------------------------------


def _c3d(sd, name):
    """torch Conv3d weight [Cout, Cin, kt, kh, kw] -> [kt, kh, kw, Cin, Cout]
    with its bias."""
    w = np.asarray(sd[name + ".weight"], np.float32)
    return {"kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
            "bias": jnp.asarray(np.asarray(sd[name + ".bias"], np.float32))}


def _c2d_as_3d(sd, name):
    """torch Conv2d weight [Cout, Cin, kh, kw] -> [1, kh, kw, Cin, Cout]."""
    w = np.asarray(sd[name + ".weight"], np.float32)
    return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)[None]),
            "bias": jnp.asarray(np.asarray(sd[name + ".bias"], np.float32))}


def _vnorm(sd, name):
    """Upstream channelwise RMS_norm gamma (any trailing singleton dims)
    -> our {weight, bias}; bias zeros when the upstream norm has none
    (the Wan VAE instantiates every norm bias-free)."""
    g = np.asarray(sd[name + ".gamma"], np.float32).reshape(-1)
    b = (np.asarray(sd[name + ".bias"], np.float32).reshape(-1)
         if name + ".bias" in sd else np.zeros_like(g))
    return {"weight": jnp.asarray(g), "bias": jnp.asarray(b)}


def _vres(sd, prefix, has_shortcut):
    """WAN ResidualBlock: residual = Sequential(norm, SiLU, conv, norm,
    SiLU, Dropout, conv) -> indices 0/2/3/6; optional 1x1x1 shortcut."""
    p = {
        "norm1": _vnorm(sd, f"{prefix}.residual.0"),
        "conv1": _c3d(sd, f"{prefix}.residual.2"),
        "norm2": _vnorm(sd, f"{prefix}.residual.3"),
        "conv2": _c3d(sd, f"{prefix}.residual.6"),
    }
    if has_shortcut:
        p["shortcut"] = _c3d(sd, f"{prefix}.shortcut")
    return p


def _vattn(sd, prefix):
    """WAN AttentionBlock: norm + fused to_qkv 1x1 conv + proj 1x1 conv
    -> split into our separate q/k/v/proj matrices."""
    qkv = np.asarray(sd[f"{prefix}.to_qkv.weight"], np.float32)
    qkv_b = np.asarray(sd[f"{prefix}.to_qkv.bias"], np.float32)
    c = qkv.shape[0] // 3
    qkv = qkv.reshape(3, c, -1)  # conv 1x1: [3C, C, 1, 1] -> [3, C, C]
    pw = np.asarray(sd[f"{prefix}.proj.weight"], np.float32).reshape(c, c)
    pb = np.asarray(sd[f"{prefix}.proj.bias"], np.float32)
    mk = lambda w, b: {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}
    return {
        "norm": _vnorm(sd, f"{prefix}.norm"),
        "q": mk(qkv[0], qkv_b[:c]),
        "k": mk(qkv[1], qkv_b[c:2 * c]),
        "v": mk(qkv[2], qkv_b[2 * c:]),
        "proj": mk(pw, pb),
    }


def convert_torch_vae_state(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Map a Wan2.1-style torch VAE state_dict into our tree.

    Upstream layout (Wan2.1 ``wan/modules/vae.py`` naming, which LongCat
    vendors as ``AutoencoderKLWan`` — reference usage common.py:158-221):
    flat ``encoder.downsamples.{k}`` / ``decoder.upsamples.{k}``
    ModuleLists interleaving ResidualBlocks and Resamples per scale
    (decoder Resample spatial convs HALVE channels),
    ``{encoder,decoder}.middle.{0,1,2}`` (res/attn/res), ``head.{0,2}``
    (norm/conv), ``{encoder,decoder}.conv1`` in convs, and the
    model-level ``conv1``/``conv2`` quant/post-quant 1x1x1 convs.

    Structural reconciliations (documented, exact):
    - fused ``to_qkv`` 1x1 convs split into q/k/v matrices;
    - RMS_norm gamma -> weight, zero bias when upstream has none;
    - temporal Resample convs map 1:1 (our forward implements the
      upstream feat-cache chunk semantics monolithically — identity
      first-frame paths carry no weights).

    Our forward is numerically validated against an independent torch
    implementation of Wan2.1 in tests/test_oracle_vae.py (encode AND
    decode equality on random weights at fp32).

    CHOICE marker: original Wan naming is assumed; a
    diffusers-converted checkpoint (``AutoencoderKLWan`` with renamed
    modules) must be key-remapped first — the converter refuses any
    unconsumed key rather than silently partial-loading.

    Raises KeyError naming the missing tensor when the layout differs.
    Exercised on a synthetic state_dict in tests/test_convert.py.
    """
    from .vae import decoder_channel_plan

    sd = _TrackedStateDict(sd)
    dims = [cfg.base_dim * m for m in cfg.dim_mults]
    n_scales = len(dims)
    nrb = cfg.num_res_blocks

    # ---- encoder ----
    enc_scales = []
    k = 0  # flat downsamples index
    for i in range(n_scales):
        cin = dims[i - 1] if i > 0 else dims[0]
        cout = dims[i]
        res = []
        for j in range(nrb):
            c_in_j = cin if j == 0 else cout
            res.append(_vres(sd, f"encoder.downsamples.{k}",
                             has_shortcut=(c_in_j != cout)))
            k += 1
        sp = {"res": res}
        if i < n_scales - 1:
            sp["sdown"] = _c2d_as_3d(sd, f"encoder.downsamples.{k}.resample.1")
            if cfg.temporal_downsample[i]:
                sp["tdown"] = _c3d(sd, f"encoder.downsamples.{k}.time_conv")
            k += 1
        enc_scales.append(sp)

    enc = {
        "conv_in": _c3d(sd, "encoder.conv1"),
        "scales": enc_scales,
        "mid": {
            "res1": _vres(sd, "encoder.middle.0", has_shortcut=False),
            "attn": _vattn(sd, "encoder.middle.1"),
            "res2": _vres(sd, "encoder.middle.2", has_shortcut=False),
        },
        "norm_out": _vnorm(sd, "encoder.head.0"),
        "conv_out": _c3d(sd, "encoder.head.2"),
        "quant": _c3d(sd, "conv1"),
    }

    # ---- decoder (Wan channel plan: resample convs halve channels) ----
    dec_scales = []
    k = 0
    for cin, cout, has_rs, has_t in decoder_channel_plan(cfg):
        res = []
        for j in range(nrb + 1):
            c_in_j = cin if j == 0 else cout
            res.append(_vres(sd, f"decoder.upsamples.{k}",
                             has_shortcut=(c_in_j != cout)))
            k += 1
        sp = {"res": res}
        if has_rs:
            if has_t:
                sp["tup"] = _c3d(sd, f"decoder.upsamples.{k}.time_conv")
            sp["sup"] = _c2d_as_3d(sd, f"decoder.upsamples.{k}.resample.1")
            k += 1
        dec_scales.append(sp)

    dec = {
        "post_quant": _c3d(sd, "conv2"),
        "conv_in": _c3d(sd, "decoder.conv1"),
        "mid": {
            "res1": _vres(sd, "decoder.middle.0", has_shortcut=False),
            "attn": _vattn(sd, "decoder.middle.1"),
            "res2": _vres(sd, "decoder.middle.2", has_shortcut=False),
        },
        "scales": dec_scales,
        "norm_out": _vnorm(sd, "decoder.head.0"),
        "conv_out": _c3d(sd, "decoder.head.2"),
    }
    sd.assert_fully_consumed("AutoencoderKLWan")
    return {"enc": enc, "dec": dec}


def assert_tree_matches(converted, reference_tree, name: str) -> None:
    """Fail loudly if a converted tree's structure/shapes differ from a
    freshly-initialised one (completeness gate for the converters)."""
    import jax

    ref_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(reference_tree)
    }
    got_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(converted)
    }
    missing = sorted(set(ref_paths) - set(got_paths))
    extra = sorted(set(got_paths) - set(ref_paths))
    bad = [f"{k}: {got_paths[k]} != {ref_paths[k]}"
           for k in ref_paths.keys() & got_paths.keys()
           if tuple(got_paths[k]) != tuple(ref_paths[k])]
    if missing or extra or bad:
        raise ValueError(
            f"{name} conversion incomplete: missing={missing[:8]} "
            f"extra={extra[:8]} shape-mismatch={bad[:8]}"
        )


# ---------------------------------------------------------------------------
# MMDiT (Open-Sora v2 / Flux layout) converter
# ---------------------------------------------------------------------------


def _rope_perm(dh: int) -> np.ndarray:
    """Channel permutation mapping upstream interleaved-pair RoPE to our
    half-split rotation: new[j] = old[2j] for j < dh/2, new[j] =
    old[2(j-dh/2)+1] otherwise. q·k is invariant under a common
    permutation of q and k channels, and RMSNorm commutes with it, so
    permuting the q/k rows of every qkv kernel (plus the q/k norm
    scales) makes the half-split forward exactly equal the upstream
    interleaved forward."""
    half = dh // 2
    return np.concatenate([np.arange(half) * 2, np.arange(half) * 2 + 1])


def _permute_qkv_rows(w: np.ndarray, nH: int, dh: int,
                      n_chunks: int = 3) -> np.ndarray:
    """w: torch Linear weight [n_chunks*nH*dh (+extra), in]. Permute the
    per-head rows of the q and k chunks by the RoPE permutation; v (and
    any trailing mlp rows for fused single-stream linear1) untouched."""
    perm = _rope_perm(dh)
    out = w.copy()
    for chunk in range(2):  # q, k
        base = chunk * nH * dh
        for h in range(nH):
            rows = base + h * dh + np.arange(dh)
            out[rows] = w[base + h * dh + perm]
    return out


def convert_torch_mmdit_state(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Map an Open-Sora v2 / Flux MMDiT torch state_dict into our stacked
    tree (models/mmdit.py).

    Key layout (Flux naming, which Open-Sora v2 inherits): img_in/txt_in,
    time_in/vector_in[/guidance_in].{in_layer,out_layer},
    double_blocks.{i}.{img,txt}_{mod.lin, attn.qkv, attn.norm.query_norm/
    key_norm.scale, attn.proj, mlp.0, mlp.2},
    single_blocks.{i}.{linear1, linear2, norm.query_norm/key_norm.scale,
    modulation.lin}, final_layer.{adaLN_modulation.1, linear}, and the
    Open-Sora cond_in for v2v conditioning. q/k rows are permuted for the
    RoPE convention (see _rope_perm). Exercised on a synthetic state_dict
    by tests/test_convert.py.
    """
    nH, dh = cfg.num_heads, cfg.head_dim
    Ld, Ls = cfg.depth_double, cfg.depth_single

    def t(name):
        return jnp.asarray(np.asarray(sd[name]).T)

    def v(name):
        return jnp.asarray(np.asarray(sd[name]))

    def emb(prefix):
        return {
            "w1": jnp.asarray(np.asarray(sd[f"{prefix}.in_layer.weight"]).T,
                              jnp.float32),
            "b1": jnp.asarray(np.asarray(sd[f"{prefix}.in_layer.bias"]),
                              jnp.float32),
            "w2": jnp.asarray(np.asarray(sd[f"{prefix}.out_layer.weight"]).T,
                              jnp.float32),
            "b2": jnp.asarray(np.asarray(sd[f"{prefix}.out_layer.bias"]),
                              jnp.float32),
        }

    def stack_qkv(fmt, depth, n_chunks=3):
        mats = []
        for i in range(depth):
            w = np.asarray(sd[fmt.format(i)])
            mats.append(_permute_qkv_rows(w, nH, dh, n_chunks).T)
        return jnp.asarray(np.stack(mats))

    def stack_qkv_bias(fmt, depth):
        mats = []
        for i in range(depth):
            b = np.asarray(sd[fmt.format(i)])
            mats.append(_permute_qkv_rows(b[:, None], nH, dh)[:, 0])
        return jnp.asarray(np.stack(mats))

    def stack_norm_scale(fmt, depth):
        perm = _rope_perm(dh)
        return jnp.asarray(np.stack(
            [np.asarray(sd[fmt.format(i)])[perm] for i in range(depth)]))

    def dattn(stream):
        base = "double_blocks.{}." + stream + "_attn"
        return {
            "qkv": {"kernel": stack_qkv(base + ".qkv.weight", Ld),
                    "bias": stack_qkv_bias(base + ".qkv.bias", Ld)},
            "q_norm": stack_norm_scale(base + ".norm.query_norm.scale", Ld),
            "k_norm": stack_norm_scale(base + ".norm.key_norm.scale", Ld),
            "proj": {"kernel": _stack(sd, base + ".proj.weight", Ld,
                                      transpose=True),
                     "bias": _stack(sd, base + ".proj.bias", Ld)},
        }

    def dmlp(stream):
        base = "double_blocks.{}." + stream + "_mlp"
        return {
            "w_in": {"kernel": _stack(sd, base + ".0.weight", Ld,
                                      transpose=True),
                     "bias": _stack(sd, base + ".0.bias", Ld)},
            "w_out": {"kernel": _stack(sd, base + ".2.weight", Ld,
                                       transpose=True),
                      "bias": _stack(sd, base + ".2.bias", Ld)},
        }

    params = {
        "img_in": {"kernel": t("img_in.weight"), "bias": v("img_in.bias")},
        "txt_in": {"kernel": t("txt_in.weight"), "bias": v("txt_in.bias")},
        "time_in": emb("time_in"),
        "vector_in": emb("vector_in"),
        "double": {
            "img_mod": {"kernel": _stack(
                sd, "double_blocks.{}.img_mod.lin.weight", Ld,
                transpose=True),
                "bias": _stack(sd, "double_blocks.{}.img_mod.lin.bias", Ld)},
            "txt_mod": {"kernel": _stack(
                sd, "double_blocks.{}.txt_mod.lin.weight", Ld,
                transpose=True),
                "bias": _stack(sd, "double_blocks.{}.txt_mod.lin.bias", Ld)},
            "img_attn": dattn("img"),
            "txt_attn": dattn("txt"),
            "img_mlp": dmlp("img"),
            "txt_mlp": dmlp("txt"),
        },
        "single": {
            "mod": {"kernel": _stack(
                sd, "single_blocks.{}.modulation.lin.weight", Ls,
                transpose=True),
                "bias": _stack(sd, "single_blocks.{}.modulation.lin.bias",
                               Ls)},
            "linear1": {"kernel": stack_qkv(
                "single_blocks.{}.linear1.weight", Ls),
                "bias": stack_qkv_bias("single_blocks.{}.linear1.bias", Ls)},
            "q_norm": stack_norm_scale(
                "single_blocks.{}.norm.query_norm.scale", Ls),
            "k_norm": stack_norm_scale(
                "single_blocks.{}.norm.key_norm.scale", Ls),
            "linear2": {"kernel": _stack(
                sd, "single_blocks.{}.linear2.weight", Ls, transpose=True),
                "bias": _stack(sd, "single_blocks.{}.linear2.bias", Ls)},
        },
        "final": {
            "adaln": {"kernel": t("final_layer.adaLN_modulation.1.weight"),
                      "bias": v("final_layer.adaLN_modulation.1.bias")},
            "proj": {"kernel": t("final_layer.linear.weight"),
                     "bias": v("final_layer.linear.bias")},
        },
    }
    if cfg.cond_embed:
        cond_key = ("cond_in.weight" if "cond_in.weight" in sd
                    else "cond_embed.weight")
        params["cond_in"] = {"kernel": t(cond_key),
                             "bias": v(cond_key.replace("weight", "bias"))}
    if cfg.guidance_embed:
        params["guidance_in"] = emb("guidance_in")
    pdtype = resolve_dtype(cfg.param_dtype)
    out = jax.tree.map(lambda x: x.astype(pdtype), params)
    # the vec-embedder MLPs stay fp32 (t-embed precision contract,
    # matching init_mmdit / run_delta_a.py:161-165)
    for k in ("time_in", "vector_in", "guidance_in"):
        if k in params:
            out[k] = params[k]
    return out


def convert_torch_clip_text_state(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Map a HF CLIPTextModel state_dict (text_model.* naming) into our
    models/clip_text.py tree. Strictly tracked: a layer-count mismatch
    or unexpected key refuses the conversion (position_ids buffers from
    older transformers versions excepted)."""
    L = cfg.num_layers
    pre = "text_model."
    if not any(k.startswith(pre) for k in sd):
        pre = ""
    sd = _TrackedStateDict(sd)
    for key in list(sd):
        if key.endswith("position_ids"):
            sd.accessed.add(key)

    def t(name):
        return jnp.asarray(np.asarray(sd[pre + name]).T)

    def v(name):
        return jnp.asarray(np.asarray(sd[pre + name]))

    def stack(fmt, transpose=False):
        arrs = [np.asarray(sd[pre + fmt.format(i)]) for i in range(L)]
        if transpose:
            arrs = [a.T for a in arrs]
        return jnp.asarray(np.stack(arrs))

    lyr = "encoder.layers.{}."
    params = {
        "token_embedding": v("embeddings.token_embedding.weight"),
        "position_embedding": v("embeddings.position_embedding.weight"),
        "layers": {
            "ln1": {"weight": stack(lyr + "layer_norm1.weight"),
                    "bias": stack(lyr + "layer_norm1.bias")},
            "q": {"kernel": stack(lyr + "self_attn.q_proj.weight", True),
                  "bias": stack(lyr + "self_attn.q_proj.bias")},
            "k": {"kernel": stack(lyr + "self_attn.k_proj.weight", True),
                  "bias": stack(lyr + "self_attn.k_proj.bias")},
            "v": {"kernel": stack(lyr + "self_attn.v_proj.weight", True),
                  "bias": stack(lyr + "self_attn.v_proj.bias")},
            "out": {"kernel": stack(lyr + "self_attn.out_proj.weight", True),
                    "bias": stack(lyr + "self_attn.out_proj.bias")},
            "ln2": {"weight": stack(lyr + "layer_norm2.weight"),
                    "bias": stack(lyr + "layer_norm2.bias")},
            "fc1": {"kernel": stack(lyr + "mlp.fc1.weight", True),
                    "bias": stack(lyr + "mlp.fc1.bias")},
            "fc2": {"kernel": stack(lyr + "mlp.fc2.weight", True),
                    "bias": stack(lyr + "mlp.fc2.bias")},
        },
        "final_ln": {"weight": v("final_layer_norm.weight"),
                     "bias": v("final_layer_norm.bias")},
    }
    sd.assert_fully_consumed("CLIPTextModel")
    return params


def read_hf_clip_dir(model_path: str):
    """Read a local HF CLIP/X-CLIP snapshot dir -> (state_dict as numpy,
    parsed config dict). Shared by the gate scorer (tta/clip_gate.py)
    and the native VBench aesthetic tower (eval/vbench_native.py) so
    the safetensors/bin fallback logic cannot drift."""
    with open(os.path.join(model_path, "config.json")) as f:
        hf = json.load(f)
    st_path = os.path.join(model_path, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        sd = load_file(st_path)
    else:
        import torch

        sd = {k: v.numpy() for k, v in torch.load(
            os.path.join(model_path, "pytorch_model.bin"),
            map_location="cpu", weights_only=True).items()}
    return sd, hf


def convert_torch_clip_model_state(sd: Dict[str, Any], vcfg,
                                   tcfg) -> Dict[str, Any]:
    """Map a full HF ``CLIPModel`` state_dict (vision_model.* +
    text_model.* + projections + logit_scale) into the models/clip.py
    dual-encoder tree. Both halves are strictly tracked (unconsumed
    keys — including layer-count mismatches — refuse the conversion);
    position_ids buffers from older transformers versions are
    ignored."""
    sd = _TrackedStateDict(sd)
    L = vcfg.num_layers

    def v(name):
        return jnp.asarray(np.asarray(sd["vision_model." + name]))

    def stack(fmt, transpose=False):
        arrs = [np.asarray(sd["vision_model." + fmt.format(i)])
                for i in range(L)]
        if transpose:
            arrs = [a.T for a in arrs]
        return jnp.asarray(np.stack(arrs))

    pw = np.asarray(sd["vision_model.embeddings.patch_embedding.weight"])
    lyr = "encoder.layers.{}."
    vision = {
        "class_embedding": v("embeddings.class_embedding"),
        "patch_embedding": {"kernel": jnp.asarray(pw.transpose(2, 3, 1, 0))},
        "position_embedding": v("embeddings.position_embedding.weight"),
        "pre_ln": {"weight": v("pre_layrnorm.weight"),
                   "bias": v("pre_layrnorm.bias")},
        "layers": {
            "ln1": {"weight": stack(lyr + "layer_norm1.weight"),
                    "bias": stack(lyr + "layer_norm1.bias")},
            "q": {"kernel": stack(lyr + "self_attn.q_proj.weight", True),
                  "bias": stack(lyr + "self_attn.q_proj.bias")},
            "k": {"kernel": stack(lyr + "self_attn.k_proj.weight", True),
                  "bias": stack(lyr + "self_attn.k_proj.bias")},
            "v": {"kernel": stack(lyr + "self_attn.v_proj.weight", True),
                  "bias": stack(lyr + "self_attn.v_proj.bias")},
            "out": {"kernel": stack(lyr + "self_attn.out_proj.weight", True),
                    "bias": stack(lyr + "self_attn.out_proj.bias")},
            "ln2": {"weight": stack(lyr + "layer_norm2.weight"),
                    "bias": stack(lyr + "layer_norm2.bias")},
            "fc1": {"kernel": stack(lyr + "mlp.fc1.weight", True),
                    "bias": stack(lyr + "mlp.fc1.bias")},
            "fc2": {"kernel": stack(lyr + "mlp.fc2.weight", True),
                    "bias": stack(lyr + "mlp.fc2.bias")},
        },
        "post_ln": {"weight": v("post_layernorm.weight"),
                    "bias": v("post_layernorm.bias")},
    }
    for k in list(sd):
        if k.endswith("position_ids"):
            sd.accessed.add(k)
    # text half goes through the dedicated (strict) text converter on
    # its sub-dict; its keys count as consumed only if that succeeds
    text_keys = [k for k in sd if k.startswith("text_model.")]
    text = convert_torch_clip_text_state(
        {k: dict.__getitem__(sd, k) for k in text_keys}, tcfg)
    sd.accessed.update(text_keys)
    params = {
        "vision": vision,
        "text": text,
        "visual_projection": jnp.asarray(
            np.asarray(sd["visual_projection.weight"]).T),
        "text_projection": jnp.asarray(
            np.asarray(sd["text_projection.weight"]).T),
        "logit_scale": jnp.asarray(np.asarray(sd["logit_scale"]),
                                   jnp.float32),
    }
    sd.assert_fully_consumed("CLIPModel")
    return params


def convert_torch_xclip_state(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Map a full HF ``XCLIPModel`` state_dict into the models/xclip.py
    tree: CLIP text tower + message-attention ViT + MIT + prompt
    generator + projections. Strictly tracked except the text half
    (validated by its own converter) and position_ids buffers."""
    sd = _TrackedStateDict(sd)
    L = cfg.vision.num_layers

    def v(name):
        return jnp.asarray(np.asarray(sd[name]))

    def t(name):
        return jnp.asarray(np.asarray(sd[name]).T)

    def stk(fmt, depth, transpose=False):
        arrs = [np.asarray(sd[fmt.format(i)]) for i in range(depth)]
        if transpose:
            arrs = [a.T for a in arrs]
        return jnp.asarray(np.stack(arrs))

    def dense_stk(fmt, depth):
        return {"kernel": stk(fmt + ".weight", depth, True),
                "bias": stk(fmt + ".bias", depth)}

    def ln_stk(fmt, depth):
        return {"weight": stk(fmt + ".weight", depth),
                "bias": stk(fmt + ".bias", depth)}

    vl = "vision_model.encoder.layers.{}."
    pw = np.asarray(sd["vision_model.embeddings.patch_embedding.weight"])
    vision = {
        "class_embedding": v("vision_model.embeddings.class_embedding"),
        "patch_embedding": {"kernel": jnp.asarray(pw.transpose(2, 3, 1, 0))},
        "position_embedding": v(
            "vision_model.embeddings.position_embedding.weight"),
        "pre_ln": {"weight": v("vision_model.pre_layernorm.weight"),
                   "bias": v("vision_model.pre_layernorm.bias")},
        "layers": {
            "msg_fc": dense_stk(vl + "message_fc", L),
            "msg_ln": ln_stk(vl + "message_ln", L),
            "msg_q": dense_stk(vl + "message_attn.q_proj", L),
            "msg_k": dense_stk(vl + "message_attn.k_proj", L),
            "msg_v": dense_stk(vl + "message_attn.v_proj", L),
            "msg_out": dense_stk(vl + "message_attn.out_proj", L),
            "ln1": ln_stk(vl + "layer_norm1", L),
            "q": dense_stk(vl + "self_attn.q_proj", L),
            "k": dense_stk(vl + "self_attn.k_proj", L),
            "v": dense_stk(vl + "self_attn.v_proj", L),
            "out": dense_stk(vl + "self_attn.out_proj", L),
            "ln2": ln_stk(vl + "layer_norm2", L),
            "fc1": dense_stk(vl + "mlp.fc1", L),
            "fc2": dense_stk(vl + "mlp.fc2", L),
        },
        "post_ln": {"weight": v("vision_model.post_layernorm.weight"),
                    "bias": v("vision_model.post_layernorm.bias")},
    }
    ml = "mit.encoder.layers.{}."
    mit = {
        "position_embedding": jnp.asarray(
            np.asarray(sd["mit.position_embedding"]).reshape(
                cfg.num_frames, -1)),
        "layers": {
            "ln1": ln_stk(ml + "layer_norm1", cfg.mit_layers),
            "q": dense_stk(ml + "self_attn.q_proj", cfg.mit_layers),
            "k": dense_stk(ml + "self_attn.k_proj", cfg.mit_layers),
            "v": dense_stk(ml + "self_attn.v_proj", cfg.mit_layers),
            "out": dense_stk(ml + "self_attn.out_proj", cfg.mit_layers),
            "ln2": ln_stk(ml + "layer_norm2", cfg.mit_layers),
            "fc1": dense_stk(ml + "mlp.fc1", cfg.mit_layers),
            "fc2": dense_stk(ml + "mlp.fc2", cfg.mit_layers),
        },
    }
    pl = "prompts_generator.decoder.{}."
    prompts = {
        "ln": {"weight": v("prompts_generator.layernorm.weight"),
               "bias": v("prompts_generator.layernorm.bias")},
        "alpha": v("prompts_generator.alpha"),
        "layers": {
            "norm1": ln_stk(pl + "norm1", cfg.prompt_layers),
            "q": stk(pl + "cross_attn.q_proj.weight", cfg.prompt_layers,
                     True),
            "k": stk(pl + "cross_attn.k_proj.weight", cfg.prompt_layers,
                     True),
            "v": stk(pl + "cross_attn.v_proj.weight", cfg.prompt_layers,
                     True),
            "proj": dense_stk(pl + "cross_attn.proj", cfg.prompt_layers),
            "norm3": ln_stk(pl + "norm3", cfg.prompt_layers),
            "fc1": dense_stk(pl + "mlp.0", cfg.prompt_layers),
            "fc2": dense_stk(pl + "mlp.3", cfg.prompt_layers),
        },
    }
    for k in list(sd):
        if k.endswith("position_ids"):
            sd.accessed.add(k)
    text_keys = [k for k in sd if k.startswith("text_model.")]
    text = convert_torch_clip_text_state(
        {k: dict.__getitem__(sd, k) for k in text_keys}, cfg.text)
    sd.accessed.update(text_keys)
    params = {
        "vision": vision,
        "text": text,
        "mit": mit,
        "prompts": prompts,
        "visual_projection": t("visual_projection.weight"),
        "text_projection": t("text_projection.weight"),
        "prompts_visual_ln": {
            "weight": v("prompts_visual_layernorm.weight"),
            "bias": v("prompts_visual_layernorm.bias")},
        "prompts_visual_projection": v("prompts_visual_projection"),
        "logit_scale": jnp.asarray(np.asarray(sd["logit_scale"]),
                                   jnp.float32),
    }
    sd.assert_fully_consumed("XCLIPModel")
    return params


# ---------------------------------------------------------------------------
# CogVideoX (diffusers layout) converter
# ---------------------------------------------------------------------------


def convert_torch_cogvideox_state(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Map a diffusers ``CogVideoXTransformer3DModel`` state_dict into our
    stacked tree (models/cogvideox.py).

    Keys: patch_embed.{proj (Conv2d k2 s2), text_proj},
    time_embedding.linear_{1,2}, transformer_blocks.{i}.{norm1.linear,
    norm1.norm, attn1.to_q/to_k/to_v/to_out.0/norm_q/norm_k, norm2.*,
    ff.net.0.proj, ff.net.2}, norm_final, norm_out.{linear, norm},
    proj_out. Upstream RoPE is interleaved-pair (diffusers
    apply_rotary_emb use_real_unbind_dim=-1 with repeat_interleave'd
    cos/sin); to_q/to_k output rows and the q/k LayerNorm affines are
    permuted per head by _rope_perm for our half-split rotation
    (see convert_torch_mmdit_state).

    Consumes ``patch_embed.pos_embedding`` (the learned positional
    table CogVideoX-5B-I2V carries) into ``pos_embed``; refuses any
    checkpoint with keys the converter does not consume."""
    sd = _TrackedStateDict(sd)
    nH, dh = cfg.num_heads, cfg.head_dim
    L = cfg.depth
    perm = _rope_perm(dh)
    full_perm = (np.arange(nH)[:, None] * dh + perm[None, :]).reshape(-1)

    def t(name):
        return jnp.asarray(np.asarray(sd[name]).T)

    def v(name):
        return jnp.asarray(np.asarray(sd[name]))

    def stack(fmt, transpose=False):
        return _stack(sd, fmt, L, transpose=transpose)

    def stack_perm_lin(fmt_w, fmt_b):
        ws, bs = [], []
        for i in range(L):
            w = np.asarray(sd[fmt_w.format(i)])[full_perm]
            b = np.asarray(sd[fmt_b.format(i)])[full_perm]
            ws.append(w.T)
            bs.append(b)
        return {"kernel": jnp.asarray(np.stack(ws)),
                "bias": jnp.asarray(np.stack(bs))}

    def stack_perm_ln(fmt):
        return jnp.asarray(np.stack(
            [np.asarray(sd[fmt.format(i)])[perm] for i in range(L)]))

    def norm_zero(n):
        b = "transformer_blocks.{}." + n
        return {
            "lin": {"kernel": stack(b + ".linear.weight", True),
                    "bias": stack(b + ".linear.bias")},
            "ln": {"weight": stack(b + ".norm.weight"),
                   "bias": stack(b + ".norm.bias")},
        }

    # patch conv [D, C, p, p] -> dense [(c, ph, pw), D]
    pw = np.asarray(sd["patch_embed.proj.weight"])
    patch_kernel = jnp.asarray(
        pw.transpose(1, 2, 3, 0).reshape(-1, pw.shape[0]))

    ab = "transformer_blocks.{}.attn1."
    params = {
        "patch_embed": {"kernel": patch_kernel,
                        "bias": v("patch_embed.proj.bias")},
        "text_proj": {"kernel": t("patch_embed.text_proj.weight"),
                      "bias": v("patch_embed.text_proj.bias")},
        "time_embed": {
            "w1": jnp.asarray(
                np.asarray(sd["time_embedding.linear_1.weight"]).T,
                jnp.float32),
            "b1": jnp.asarray(np.asarray(sd["time_embedding.linear_1.bias"]),
                              jnp.float32),
            "w2": jnp.asarray(
                np.asarray(sd["time_embedding.linear_2.weight"]).T,
                jnp.float32),
            "b2": jnp.asarray(np.asarray(sd["time_embedding.linear_2.bias"]),
                              jnp.float32),
        },
        "blocks": {
            "norm1": norm_zero("norm1"),
            "attn": {
                "to_q": stack_perm_lin(ab + "to_q.weight", ab + "to_q.bias"),
                "to_k": stack_perm_lin(ab + "to_k.weight", ab + "to_k.bias"),
                "to_v": {"kernel": stack(ab + "to_v.weight", True),
                         "bias": stack(ab + "to_v.bias")},
                "to_out": {"kernel": stack(ab + "to_out.0.weight", True),
                           "bias": stack(ab + "to_out.0.bias")},
                "norm_q": {"weight": stack_perm_ln(ab + "norm_q.weight"),
                           "bias": stack_perm_ln(ab + "norm_q.bias")},
                "norm_k": {"weight": stack_perm_ln(ab + "norm_k.weight"),
                           "bias": stack_perm_ln(ab + "norm_k.bias")},
            },
            "norm2": norm_zero("norm2"),
            "ff": {
                "w_in": {"kernel": stack(
                    "transformer_blocks.{}.ff.net.0.proj.weight", True),
                    "bias": stack("transformer_blocks.{}.ff.net.0.proj.bias")},
                "w_out": {"kernel": stack(
                    "transformer_blocks.{}.ff.net.2.weight", True),
                    "bias": stack("transformer_blocks.{}.ff.net.2.bias")},
            },
        },
        "norm_final": {"weight": v("norm_final.weight"),
                       "bias": v("norm_final.bias")},
        "norm_out": {
            "lin": {"kernel": t("norm_out.linear.weight"),
                    "bias": v("norm_out.linear.bias")},
            "ln": {"weight": v("norm_out.norm.weight"),
                   "bias": v("norm_out.norm.bias")},
        },
        "proj_out": {"kernel": t("proj_out.weight"),
                     "bias": v("proj_out.bias")},
    }
    if "patch_embed.pos_embedding" in sd:
        pe = np.asarray(sd["patch_embed.pos_embedding"])
        params["pos_embed"] = jnp.asarray(pe.reshape(-1, pe.shape[-1]))
    elif cfg.learned_pos_embed_len > 0:
        raise ValueError(
            "cfg.learned_pos_embed_len > 0 but the checkpoint has no "
            "patch_embed.pos_embedding key")
    sd.assert_fully_consumed("CogVideoXTransformer3DModel")
    pdtype = resolve_dtype(cfg.param_dtype)
    out = jax.tree.map(lambda x: x.astype(pdtype), params)
    out["time_embed"] = params["time_embed"]  # fp32 t-embed contract
    return out
