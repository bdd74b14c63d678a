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


def save_bundle(out_dir: str, bundle) -> None:
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

        json.dump(dataclasses.asdict(bundle.cfg), f, indent=2)


def load_converted_bundle(ckpt_dir: str, cfg: ModelConfig):
    """Load an orbax-format bundle saved by ``save_bundle``; uses the HF
    tokenizer subfolder when present (reference layout)."""
    import orbax.checkpoint as ocp

    from ..pipeline.pipeline import HashTokenizer, ModelBundle, load_hf_tokenizer

    ckptr = ocp.PyTreeCheckpointer()
    trees = {}
    for name in ("dit", "vae", "text_encoder"):
        path = os.path.abspath(os.path.join(ckpt_dir, name))
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{path} missing — run scripts/convert_checkpoint.py first"
            )
        trees[name] = ckptr.restore(path)

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
