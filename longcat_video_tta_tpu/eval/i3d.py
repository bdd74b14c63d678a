"""Inception-I3D (Kinetics-400) video features for FVD, TPU-native.

The reference downloads a TorchScript I3D (HF kiwhansong/DFoT,
``metrics_models/i3d_torchscript.pt``) and runs it per generated/GT
clip pair for the online FVD accumulator
(/root/reference/delta_experiment/scripts/common.py:2150-2270). Round 2
left the extractor as an external ``video_feature_fn`` hook; this is
the real network:

- InceptionI3d trunk (pytorch-i3d layout): Unit3D conv+BN+ReLU stem
  (7x7x7 s2), TF-SAME max pools, 9 Inception modules (b0 1x1 / b1
  1x1->3x3 / b2 1x1->3x3 / b3 pool->1x1), 2x7x7 average pool, 1x1x1
  logits conv, temporal mean -> 400-d pre-softmax logits (the standard
  FVD feature protocol)
- ``convert_torch_i3d_state``: maps the pytorch-i3d /
  TorchScript-state_dict naming (Conv3d_1a_7x7.conv3d.weight,
  Mixed_3b.b1a.bn.running_mean, ...) with the unconsumed-key guard
- ``make_i3d_feature_fn``: OnlineFrechetAccumulator hook applying the
  DFoT protocol (>=9-frame symmetric pad, 224 center crop, [-1,1])

BatchNorm runs in inference form (running stats, eps 1e-3). All
padding is TF-SAME, matching pytorch-i3d's MaxPool3dSamePadding /
Unit3D compute_pad; numerics validated against a torch.nn.functional
forward on random weights (tests/test_i3d.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .frechet import center_crop, pad_for_i3d

# (branch0, b1_reduce, b1_out, b2_reduce, b2_out, b3_out) per module
INCEPTION_TABLE: Dict[str, Tuple[int, ...]] = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}
_MODULE_IN = {
    "Mixed_3b": 192, "Mixed_3c": 256, "Mixed_4b": 480, "Mixed_4c": 512,
    "Mixed_4d": 512, "Mixed_4e": 512, "Mixed_4f": 528, "Mixed_5b": 832,
    "Mixed_5c": 832,
}
NUM_CLASSES = 400
_BN_EPS = 1e-3


def _unit_init(rng, cin, cout, k):
    kt, kh, kw = k
    fan = kt * kh * kw * cin
    return {
        "kernel": jax.random.normal(
            rng, (kt, kh, kw, cin, cout), jnp.float32) * (2.0 / fan) ** 0.5,
        "bn": {
            "weight": jnp.ones((cout,), jnp.float32),
            "bias": jnp.zeros((cout,), jnp.float32),
            "mean": jnp.zeros((cout,), jnp.float32),
            "var": jnp.ones((cout,), jnp.float32),
        },
    }


def init_i3d(rng: jax.Array) -> Dict[str, Any]:
    """Random-weight tree at the real Kinetics-400 geometry."""
    counter = [0]

    def key():
        counter[0] += 1
        return jax.random.fold_in(rng, counter[0])

    params: Dict[str, Any] = {
        "Conv3d_1a_7x7": _unit_init(key(), 3, 64, (7, 7, 7)),
        "Conv3d_2b_1x1": _unit_init(key(), 64, 64, (1, 1, 1)),
        "Conv3d_2c_3x3": _unit_init(key(), 64, 192, (3, 3, 3)),
    }
    for name, (b0, b1r, b1o, b2r, b2o, b3o) in INCEPTION_TABLE.items():
        cin = _MODULE_IN[name]
        params[name] = {
            "b0": _unit_init(key(), cin, b0, (1, 1, 1)),
            "b1a": _unit_init(key(), cin, b1r, (1, 1, 1)),
            "b1b": _unit_init(key(), b1r, b1o, (3, 3, 3)),
            "b2a": _unit_init(key(), cin, b2r, (1, 1, 1)),
            "b2b": _unit_init(key(), b2r, b2o, (3, 3, 3)),
            "b3b": _unit_init(key(), cin, b3o, (1, 1, 1)),
        }
    params["logits"] = {
        "kernel": jax.random.normal(
            key(), (1, 1, 1, 1024, NUM_CLASSES), jnp.float32) * 0.02,
        "bias": jnp.zeros((NUM_CLASSES,), jnp.float32),
    }
    return params


def _conv3d_same(x, kernel, strides=(1, 1, 1)):
    """NTHWC conv with TF-SAME padding (pytorch-i3d compute_pad)."""
    return jax.lax.conv_general_dilated(
        x, kernel, strides, "SAME",
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
    )


def _unit(p, x, strides=(1, 1, 1)):
    y = _conv3d_same(x, p["kernel"], strides)
    bn = p["bn"]
    inv = jax.lax.rsqrt(bn["var"] + _BN_EPS)
    return jax.nn.relu((y - bn["mean"]) * inv * bn["weight"] + bn["bias"])


def _maxpool_same(x, k, s):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1,) + k + (1,), (1,) + s + (1,), "SAME")


def _inception(p, x):
    b0 = _unit(p["b0"], x)
    b1 = _unit(p["b1b"], _unit(p["b1a"], x))
    b2 = _unit(p["b2b"], _unit(p["b2a"], x))
    b3 = _unit(p["b3b"], _maxpool_same(x, (3, 3, 3), (1, 1, 1)))
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


@jax.jit
def i3d_logits(params: Dict[str, Any], video: jnp.ndarray) -> jnp.ndarray:
    """video [B, T, H, W, 3] in [-1, 1] -> pre-softmax logits [B, 400]
    (the FVD feature). T >= 9 (DFoT pad protocol), H, W >= 112."""
    x = _unit(params["Conv3d_1a_7x7"], video, (2, 2, 2))
    x = _maxpool_same(x, (1, 3, 3), (1, 2, 2))
    x = _unit(params["Conv3d_2b_1x1"], x)
    x = _unit(params["Conv3d_2c_3x3"], x)
    x = _maxpool_same(x, (1, 3, 3), (1, 2, 2))
    x = _inception(params["Mixed_3b"], x)
    x = _inception(params["Mixed_3c"], x)
    x = _maxpool_same(x, (3, 3, 3), (2, 2, 2))
    for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e",
                 "Mixed_4f"):
        x = _inception(params[name], x)
    x = _maxpool_same(x, (2, 2, 2), (2, 2, 2))
    x = _inception(params["Mixed_5b"], x)
    x = _inception(params["Mixed_5c"], x)
    # VALID 2x7x7 average pool, 1x1x1 logits conv, temporal mean
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 7, 7, 1), (1, 1, 1, 1, 1), "VALID"
    ) / (2 * 7 * 7)
    x = _conv3d_same(x, params["logits"]["kernel"]) + params["logits"]["bias"]
    return jnp.mean(x, axis=(1, 2, 3))


def convert_torch_i3d_state(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map a pytorch-i3d style state_dict (the layout inside the DFoT
    TorchScript file): ``<Block>.conv3d.weight`` [O,I,kt,kh,kw] +
    ``<Block>.bn.{weight,bias,running_mean,running_var}``."""
    from ..models.convert import _TrackedStateDict

    sd = _TrackedStateDict(sd)
    for k in list(sd):   # harmless BN bookkeeping buffers
        if k.endswith("num_batches_tracked"):
            sd.accessed.add(k)

    def unit(prefix):
        w = np.asarray(sd[prefix + ".conv3d.weight"], np.float32)
        return {
            "kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
            "bn": {
                "weight": jnp.asarray(
                    np.asarray(sd[prefix + ".bn.weight"], np.float32)),
                "bias": jnp.asarray(
                    np.asarray(sd[prefix + ".bn.bias"], np.float32)),
                "mean": jnp.asarray(np.asarray(
                    sd[prefix + ".bn.running_mean"], np.float32)),
                "var": jnp.asarray(np.asarray(
                    sd[prefix + ".bn.running_var"], np.float32)),
            },
        }

    params: Dict[str, Any] = {
        "Conv3d_1a_7x7": unit("Conv3d_1a_7x7"),
        "Conv3d_2b_1x1": unit("Conv3d_2b_1x1"),
        "Conv3d_2c_3x3": unit("Conv3d_2c_3x3"),
    }
    for name in INCEPTION_TABLE:
        params[name] = {b: unit(f"{name}.{b}")
                        for b in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b")}
    lw = np.asarray(sd["logits.conv3d.weight"], np.float32)
    params["logits"] = {
        "kernel": jnp.asarray(lw.transpose(2, 3, 4, 1, 0)),
        "bias": jnp.asarray(np.asarray(sd["logits.conv3d.bias"],
                                       np.float32)),
    }
    sd.assert_fully_consumed("InceptionI3d")
    return params


def load_i3d_params(path: str) -> Dict[str, Any]:
    """Load + convert I3D weights: a plain torch state_dict file or a
    TorchScript archive (the DFoT i3d_torchscript.pt — torch.jit.load
    then state_dict)."""
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        sd = torch.jit.load(path, map_location="cpu").state_dict()
    return convert_torch_i3d_state(
        {k: v.numpy() for k, v in sd.items()})


def make_i3d_feature_fn(params: Dict[str, Any]) -> Callable:
    """-> video_feature_fn for OnlineFrechetAccumulator: [T, H, W, 3]
    in [0,1] -> [400], with the DFoT protocol (symmetric pad to >= 9
    frames, 224 center crop, [-1,1] scaling) applied host-side."""

    def feat(frames: np.ndarray) -> np.ndarray:
        x = pad_for_i3d(center_crop(np.asarray(frames)))
        x = jnp.asarray(x, jnp.float32)[None] * 2.0 - 1.0
        return np.asarray(i3d_logits(params, x)).reshape(-1)

    return feat
