"""InceptionV3 (torchvision Inception3, ImageNet) frame features for
FID, TPU-native.

The reference loads ``torchvision.models.inception_v3`` with default
ImageNet weights, replaces ``fc`` with Identity, and feeds
299-shorter-side-resized / 299-center-cropped / ImageNet-normalized
frames to get 2048-d pool features for the online FID accumulator
(/root/reference/delta_experiment/scripts/common.py:2161-2305). Round 2
left the extractor as an external ``frame_feature_fn`` hook; this is
the real network:

- Inception3 trunk, eval path only (AuxLogits is train-time): VALID
  stem convs, InceptionA/B/C/D/E mixed blocks, global average pool ->
  2048-d features. ``transform_input=True`` (the torchvision builder
  forces it when weights are given) is folded into the jitted forward.
- ``convert_torch_inception_state``: maps the torchvision state_dict
  naming (``Mixed_5b.branch5x5_1.conv.weight`` [O,I,kh,kw] + bn
  buffers) with the unconsumed-key guard; ``AuxLogits.*``/``fc.*`` are
  consumed-and-ignored (eval path never runs them).
- ``make_inception_feature_fn``: OnlineFrechetAccumulator
  ``frame_feature_fn`` hook applying the reference's exact protocol
  (PIL bilinear shorter-side-299 resize, 299 center crop, ImageNet
  normalize).

BatchNorm runs in inference form (running stats, eps 1e-3 like
torchvision's BasicConv2d). Numerics validated against a
torch.nn.functional forward on random weights
(tests/test_inception.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FEATURE_DIM = 2048
_BN_EPS = 1e-3

# (name, cin, cout, (kh, kw), (sh, sw), (ph, pw)) for the stem
_STEM: Tuple[Tuple[str, int, int, Tuple[int, int], Tuple[int, int],
                   Tuple[int, int]], ...] = (
    ("Conv2d_1a_3x3", 3, 32, (3, 3), (2, 2), (0, 0)),
    ("Conv2d_2a_3x3", 32, 32, (3, 3), (1, 1), (0, 0)),
    ("Conv2d_2b_3x3", 32, 64, (3, 3), (1, 1), (1, 1)),
    ("Conv2d_3b_1x1", 64, 80, (1, 1), (1, 1), (0, 0)),
    ("Conv2d_4a_3x3", 80, 192, (3, 3), (1, 1), (0, 0)),
)

# InceptionA(cin, pool_features): branch -> (cin, cout, k, pad)
def _a_spec(cin, pool):
    return {
        "branch1x1": (cin, 64, (1, 1), (0, 0)),
        "branch5x5_1": (cin, 48, (1, 1), (0, 0)),
        "branch5x5_2": (48, 64, (5, 5), (2, 2)),
        "branch3x3dbl_1": (cin, 64, (1, 1), (0, 0)),
        "branch3x3dbl_2": (64, 96, (3, 3), (1, 1)),
        "branch3x3dbl_3": (96, 96, (3, 3), (1, 1)),
        "branch_pool": (cin, pool, (1, 1), (0, 0)),
    }


def _b_spec(cin):
    return {
        "branch3x3": (cin, 384, (3, 3), (0, 0)),
        "branch3x3dbl_1": (cin, 64, (1, 1), (0, 0)),
        "branch3x3dbl_2": (64, 96, (3, 3), (1, 1)),
        "branch3x3dbl_3": (96, 96, (3, 3), (0, 0)),
    }


def _c_spec(cin, c7):
    return {
        "branch1x1": (cin, 192, (1, 1), (0, 0)),
        "branch7x7_1": (cin, c7, (1, 1), (0, 0)),
        "branch7x7_2": (c7, c7, (1, 7), (0, 3)),
        "branch7x7_3": (c7, 192, (7, 1), (3, 0)),
        "branch7x7dbl_1": (cin, c7, (1, 1), (0, 0)),
        "branch7x7dbl_2": (c7, c7, (7, 1), (3, 0)),
        "branch7x7dbl_3": (c7, c7, (1, 7), (0, 3)),
        "branch7x7dbl_4": (c7, c7, (7, 1), (3, 0)),
        "branch7x7dbl_5": (c7, 192, (1, 7), (0, 3)),
        "branch_pool": (cin, 192, (1, 1), (0, 0)),
    }


def _d_spec(cin):
    return {
        "branch3x3_1": (cin, 192, (1, 1), (0, 0)),
        "branch3x3_2": (192, 320, (3, 3), (0, 0)),
        "branch7x7x3_1": (cin, 192, (1, 1), (0, 0)),
        "branch7x7x3_2": (192, 192, (1, 7), (0, 3)),
        "branch7x7x3_3": (192, 192, (7, 1), (3, 0)),
        "branch7x7x3_4": (192, 192, (3, 3), (0, 0)),
    }


def _e_spec(cin):
    return {
        "branch1x1": (cin, 320, (1, 1), (0, 0)),
        "branch3x3_1": (cin, 384, (1, 1), (0, 0)),
        "branch3x3_2a": (384, 384, (1, 3), (0, 1)),
        "branch3x3_2b": (384, 384, (3, 1), (1, 0)),
        "branch3x3dbl_1": (cin, 448, (1, 1), (0, 0)),
        "branch3x3dbl_2": (448, 384, (3, 3), (1, 1)),
        "branch3x3dbl_3a": (384, 384, (1, 3), (0, 1)),
        "branch3x3dbl_3b": (384, 384, (3, 1), (1, 0)),
        "branch_pool": (cin, 192, (1, 1), (0, 0)),
    }


MIXED_SPECS: Dict[str, Dict[str, Tuple]] = {
    "Mixed_5b": _a_spec(192, 32),
    "Mixed_5c": _a_spec(256, 64),
    "Mixed_5d": _a_spec(288, 64),
    "Mixed_6a": _b_spec(288),
    "Mixed_6b": _c_spec(768, 128),
    "Mixed_6c": _c_spec(768, 160),
    "Mixed_6d": _c_spec(768, 160),
    "Mixed_6e": _c_spec(768, 192),
    "Mixed_7a": _d_spec(768),
    "Mixed_7b": _e_spec(1280),
    "Mixed_7c": _e_spec(2048),
}


def _unit_init(rng, spec):
    cin, cout, (kh, kw), _ = spec
    fan = kh * kw * cin
    return {
        "kernel": jax.random.normal(
            rng, (kh, kw, cin, cout), jnp.float32) * (2.0 / fan) ** 0.5,
        "bn": {
            "weight": jnp.ones((cout,), jnp.float32),
            "bias": jnp.zeros((cout,), jnp.float32),
            "mean": jnp.zeros((cout,), jnp.float32),
            "var": jnp.ones((cout,), jnp.float32),
        },
    }


def init_inception(rng: jax.Array) -> Dict[str, Any]:
    """Random-weight tree at the real ImageNet geometry."""
    counter = [0]

    def key():
        counter[0] += 1
        return jax.random.fold_in(rng, counter[0])

    params: Dict[str, Any] = {}
    for name, cin, cout, k, _s, pad in _STEM:
        params[name] = _unit_init(key(), (cin, cout, k, pad))
    for name, spec in MIXED_SPECS.items():
        params[name] = {b: _unit_init(key(), s) for b, s in spec.items()}
    return params


def _conv(x, kernel, strides=(1, 1), pad=(0, 0)):
    return jax.lax.conv_general_dilated(
        x, kernel, strides,
        [(pad[0], pad[0]), (pad[1], pad[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _unit(p, x, strides=(1, 1), pad=(0, 0)):
    y = _conv(x, p["kernel"], strides, pad)
    bn = p["bn"]
    inv = jax.lax.rsqrt(bn["var"] + _BN_EPS)
    return jax.nn.relu((y - bn["mean"]) * inv * bn["weight"] + bn["bias"])


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID")


def _avgpool_same(x, k=3):
    # torch F.avg_pool2d(x, 3, stride=1, padding=1) divides by k*k
    # including the zero padding (count_include_pad default)
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / (k * k)


def _branch(p, x, spec, name):
    _cin, _cout, _k, pad = spec[name]
    return _unit(p[name], x, (1, 1), pad)


def _mixed_a(p, x, spec):
    b0 = _branch(p, x, spec, "branch1x1")
    b1 = _unit(p["branch5x5_2"], _branch(p, x, spec, "branch5x5_1"),
               pad=(2, 2))
    b2 = _unit(p["branch3x3dbl_3"],
               _unit(p["branch3x3dbl_2"],
                     _branch(p, x, spec, "branch3x3dbl_1"), pad=(1, 1)),
               pad=(1, 1))
    b3 = _branch(p, _avgpool_same(x), spec, "branch_pool")
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def _mixed_b(p, x):
    b0 = _unit(p["branch3x3"], x, (2, 2))
    b1 = _unit(p["branch3x3dbl_3"],
               _unit(p["branch3x3dbl_2"],
                     _unit(p["branch3x3dbl_1"], x), pad=(1, 1)),
               (2, 2))
    return jnp.concatenate([b0, b1, _maxpool(x)], axis=-1)


def _mixed_c(p, x, spec):
    b0 = _branch(p, x, spec, "branch1x1")
    b1 = x
    for n in ("branch7x7_1", "branch7x7_2", "branch7x7_3"):
        b1 = _branch(p, b1, spec, n)
    b2 = x
    for n in ("branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
              "branch7x7dbl_4", "branch7x7dbl_5"):
        b2 = _branch(p, b2, spec, n)
    b3 = _branch(p, _avgpool_same(x), spec, "branch_pool")
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def _mixed_d(p, x, spec):
    b0 = _unit(p["branch3x3_2"],
               _branch(p, x, spec, "branch3x3_1"), (2, 2))
    b1 = x
    for n in ("branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3"):
        b1 = _branch(p, b1, spec, n)
    b1 = _unit(p["branch7x7x3_4"], b1, (2, 2))
    return jnp.concatenate([b0, b1, _maxpool(x)], axis=-1)


def _mixed_e(p, x, spec):
    b0 = _branch(p, x, spec, "branch1x1")
    b1 = _branch(p, x, spec, "branch3x3_1")
    b1 = jnp.concatenate([_branch(p, b1, spec, "branch3x3_2a"),
                          _branch(p, b1, spec, "branch3x3_2b")], axis=-1)
    b2 = _unit(p["branch3x3dbl_2"],
               _branch(p, x, spec, "branch3x3dbl_1"), pad=(1, 1))
    b2 = jnp.concatenate([_branch(p, b2, spec, "branch3x3dbl_3a"),
                          _branch(p, b2, spec, "branch3x3dbl_3b")],
                         axis=-1)
    b3 = _branch(p, _avgpool_same(x), spec, "branch_pool")
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


@jax.jit
def inception_features(params: Dict[str, Any],
                       images: jnp.ndarray) -> jnp.ndarray:
    """images [B, H, W, 3] ImageNet-normalized -> pool features
    [B, 2048] (torchvision Inception3 eval path, fc=Identity,
    transform_input=True folded in — common.py:2161-2169 behavior).
    H, W >= 75 (the VALID stem/pool chain's minimum)."""
    # torchvision transform_input: undo ImageNet stats, redo (0.5, 0.5)
    scale = jnp.asarray([0.229, 0.224, 0.225], jnp.float32) / 0.5
    shift = (jnp.asarray([0.485, 0.456, 0.406], jnp.float32) - 0.5) / 0.5
    x = images * scale + shift

    x = _unit(params["Conv2d_1a_3x3"], x, (2, 2))
    x = _unit(params["Conv2d_2a_3x3"], x)
    x = _unit(params["Conv2d_2b_3x3"], x, pad=(1, 1))
    x = _maxpool(x)
    x = _unit(params["Conv2d_3b_1x1"], x)
    x = _unit(params["Conv2d_4a_3x3"], x)
    x = _maxpool(x)
    for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _mixed_a(params[name], x, MIXED_SPECS[name])
    x = _mixed_b(params["Mixed_6a"], x)
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _mixed_c(params[name], x, MIXED_SPECS[name])
    x = _mixed_d(params["Mixed_7a"], x, MIXED_SPECS["Mixed_7a"])
    for name in ("Mixed_7b", "Mixed_7c"):
        x = _mixed_e(params[name], x, MIXED_SPECS[name])
    return jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1


def convert_torch_inception_state(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map a torchvision ``inception_v3`` state_dict into our tree.
    ``AuxLogits.*`` and ``fc.*`` are consumed-and-ignored (train-time /
    replaced-by-Identity respectively); anything else unconsumed
    refuses the conversion."""
    from ..models.convert import _TrackedStateDict

    sd = _TrackedStateDict(sd)
    for k in list(sd):
        if (k.startswith(("AuxLogits.", "fc."))
                or k.endswith("num_batches_tracked")):
            sd.accessed.add(k)

    def unit(prefix):
        w = np.asarray(sd[prefix + ".conv.weight"], np.float32)
        return {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bn": {
                "weight": jnp.asarray(np.asarray(
                    sd[prefix + ".bn.weight"], np.float32)),
                "bias": jnp.asarray(np.asarray(
                    sd[prefix + ".bn.bias"], np.float32)),
                "mean": jnp.asarray(np.asarray(
                    sd[prefix + ".bn.running_mean"], np.float32)),
                "var": jnp.asarray(np.asarray(
                    sd[prefix + ".bn.running_var"], np.float32)),
            },
        }

    params: Dict[str, Any] = {name: unit(name) for name, *_ in _STEM}
    for name, spec in MIXED_SPECS.items():
        params[name] = {b: unit(f"{name}.{b}") for b in spec}
    sd.assert_fully_consumed("InceptionV3")
    return params


def load_inception_params(path: str) -> Dict[str, Any]:
    """Load + convert InceptionV3 weights (a torchvision state_dict
    .pth, or a .safetensors of the same naming)."""
    import os

    if os.path.isdir(path):
        for cand in ("inception_v3.pth", "pytorch_model.bin",
                     "model.safetensors"):
            p = os.path.join(path, cand)
            if os.path.exists(p):
                path = p
                break
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = {k: v.numpy() for k, v in torch.load(
            path, map_location="cpu", weights_only=True).items()}
    return convert_torch_inception_state(sd)


def preprocess_frames(frames: np.ndarray, size: int = 299) -> np.ndarray:
    """[T, H, W, 3] in [0,1] -> [T, size, size, 3] ImageNet-normalized,
    via the reference's exact protocol: uint8 PIL bilinear resize of
    the SHORTER side to ``size``, center crop, normalize
    (common.py:2284-2301)."""
    from PIL import Image

    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    out = []
    for f in frames:
        img = Image.fromarray(
            (np.clip(f, 0.0, 1.0) * 255).astype(np.uint8))
        w, h = img.size
        if w <= h:
            nw, nh = size, max(size, int(round(size * h / w)))
        else:
            nw, nh = max(size, int(round(size * w / h))), size
        img = img.resize((nw, nh), Image.BILINEAR)
        left, top = (nw - size) // 2, (nh - size) // 2
        arr = np.asarray(
            img.crop((left, top, left + size, top + size)),
            np.float32) / 255.0
        out.append((arr - mean) / std)
    return np.stack(out)


def make_inception_feature_fn(params: Dict[str, Any],
                              batch: int = 16) -> Callable:
    """-> frame_feature_fn for OnlineFrechetAccumulator: [T, H, W, 3]
    in [0,1] -> [T, 2048] float64, batched on device."""

    def feat(frames: np.ndarray) -> np.ndarray:
        x = preprocess_frames(np.asarray(frames))
        outs = []
        for i in range(0, x.shape[0], batch):
            outs.append(np.asarray(inception_features(
                params, jnp.asarray(x[i:i + batch]))))
        return np.concatenate(outs).astype(np.float64)

    return feat
