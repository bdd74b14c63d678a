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

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, RunConfig, get_model_config


def save_bundle(out_dir: str, bundle, converted_components=None) -> None:
    """``converted_components``: names of components holding real
    converted weights (vs random init). Recorded in model_config.json
    and checked loudly by ``load_converted_bundle``."""
    import orbax.checkpoint as ocp

    os.makedirs(out_dir, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    for name, tree in (("dit", bundle.dit_params),
                       ("vae", bundle.vae_params),
                       ("text_encoder", bundle.text_params)):
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
    for name in ("dit", "vae", "text_encoder"):
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
    return ModelBundle(cfg=cfg, dit_params=trees["dit"],
                       vae_params=trees["vae"],
                       text_params=trees["text_encoder"],
                       tokenize=tokenize)


# ---------------------------------------------------------------------------
# torch state_dict -> stacked-block DiT tree
# ---------------------------------------------------------------------------


def _stack(sd, fmt: str, depth: int, transpose: bool = False):
    mats = []
    for i in range(depth):
        w = np.asarray(sd[fmt.format(i)])
        mats.append(w.T if transpose else w)
    return jnp.asarray(np.stack(mats))


def convert_torch_dit_state(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Map a LongCat-style torch DiT state_dict (keys per SURVEY.md §2.8:
    x_embedder.proj, t_embedder, y_embedder, blocks.{i}.attn.qkv/proj/
    q_norm/k_norm, cross_attn.q_linear/kv_linear/proj/q_norm/k_norm,
    ffn.w1/w2/w3, pre_crs_attn_norm, adaLN_modulation, final_layer) into
    our stacked tree. torch Linear weights are [out, in] -> transposed.

    Raises KeyError with the missing name when the layout differs; the
    mapping is exercised by tests/test_convert.py on a synthetic
    state_dict of the expected layout.
    """
    L = cfg.depth

    def t(name):
        return jnp.asarray(np.asarray(sd[name]).T)

    def v(name):
        return jnp.asarray(np.asarray(sd[name]))

    params = {
        "x_embed": {"kernel": t("x_embedder.proj.weight"),
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
                    "kernel": _stack(sd, "blocks.{}.attn.qkv.weight", L,
                                     transpose=True),
                    "bias": _stack(sd, "blocks.{}.attn.qkv.bias", L),
                },
                "proj": {
                    "kernel": _stack(sd, "blocks.{}.attn.proj.weight", L,
                                     transpose=True),
                    "bias": _stack(sd, "blocks.{}.attn.proj.bias", L),
                },
                "q_norm": _stack(sd, "blocks.{}.attn.q_norm.weight", L),
                "k_norm": _stack(sd, "blocks.{}.attn.k_norm.weight", L),
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
    """Upstream channelwise norm gamma (any trailing singleton dims) ->
    our {weight, bias}; bias zeros when the upstream norm has none."""
    g = np.asarray(sd[name + ".gamma"], np.float32).reshape(-1)
    b = sd.get(name + ".bias")
    b = (np.asarray(b, np.float32).reshape(-1) if b is not None
         else np.zeros_like(g))
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


def _embed_t11_into_t33(p):
    """Embed a (kt,1,1) temporal conv kernel into our (kt,3,3) slot: the
    upstream kernel goes in the center spatial tap, zeros elsewhere —
    mathematically identical under SAME spatial padding."""
    k = np.asarray(p["kernel"])
    kt, kh, kw, cin, cout = k.shape
    if (kh, kw) == (3, 3):
        return p
    out = np.zeros((kt, 3, 3, cin, cout), k.dtype)
    out[:, 1, 1] = k[:, 0, 0]
    return {"kernel": jnp.asarray(out), "bias": p["bias"]}


def _first_tap(p, out_slice=None):
    """Derive our frame-1 stride-1 conv from the upstream temporal conv's
    last (current-frame) tap: with zero causal history, frame 1 only ever
    sees itself through that tap."""
    k = np.asarray(p["kernel"])  # [kt, kh, kw, Cin, Cout]
    tap = k[-1:, k.shape[1] // 2:k.shape[1] // 2 + 1,
            k.shape[2] // 2:k.shape[2] // 2 + 1]
    b = np.asarray(p["bias"])
    if out_slice is not None:
        tap, b = tap[..., out_slice], b[out_slice]
    return {"kernel": jnp.asarray(tap), "bias": jnp.asarray(b)}


def convert_torch_vae_state(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Map a WAN-style torch VAE state_dict into our tree.

    Upstream layout (Wan2.1 ``AutoencoderKLWan`` naming, which LongCat
    vendors — reference usage common.py:158-221): flat
    ``encoder.downsamples.{k}`` / ``decoder.upsamples.{k}`` ModuleLists
    interleaving ResidualBlocks and Resamples per scale,
    ``{encoder,decoder}.middle.{0,1,2}`` (res/attn/res),
    ``head.{0,2}`` (norm/conv), ``conv1`` in/out convs.

    Structural reconciliations (documented, exact):
    - fused ``to_qkv`` 1x1 convs split into q/k/v matrices;
    - (kt,1,1) temporal-resample kernels embedded into our (kt,3,3)
      center tap (identical math under SAME padding);
    - our frame-1 stride-1 convs derived from the upstream temporal
      conv's current-frame tap (zero causal history);
    - norm gamma -> weight, zero bias when upstream has none.

    Raises KeyError naming the missing tensor when the layout differs.
    Exercised on a synthetic state_dict in tests/test_convert.py.
    """
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
                tconv = _c3d(sd, f"encoder.downsamples.{k}.time_conv")
                sp["tdown"] = {"first": _first_tap(tconv),
                               "rest": _embed_t11_into_t33(tconv)}
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
    }

    # ---- decoder (scales iterate deepest -> shallowest) ----
    dec_scales = []
    k = 0
    for idx, i in enumerate(range(n_scales - 1, -1, -1)):
        cin = dims[i]
        cout = dims[i - 1] if i > 0 else dims[0]
        res = []
        for j in range(nrb + 1):
            c_in_j = cin if j == 0 else cout
            res.append(_vres(sd, f"decoder.upsamples.{k}",
                             has_shortcut=(c_in_j != cout)))
            k += 1
        sp = {"res": res}
        if i > 0:
            sp["sup"] = _c2d_as_3d(sd, f"decoder.upsamples.{k}.resample.1")
            if cfg.temporal_downsample[i - 1]:
                tconv = _c3d(sd, f"decoder.upsamples.{k}.time_conv")
                c = tconv["bias"].shape[0] // 2
                sp["tup"] = {
                    "first": _first_tap(tconv, out_slice=slice(0, c)),
                    "rest": tconv,  # (3,1,1) C->2C, matches our slot
                }
            k += 1
        dec_scales.append(sp)

    dec = {
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
