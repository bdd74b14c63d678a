"""LPIPS-AlexNet tower: converter structure + numerical parity with a
torch.nn.functional forward on random weights (the validation VERDICT
r2 asked for — no lpips/torchvision packages exist on this box, but the
lpips math is a handful of F ops)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from longcat_video_tta_tpu.eval.lpips import (
    _CONV_SPECS,
    convert_torch_lpips_state,
    init_lpips_alex,
    lpips_alex,
    make_lpips_feature_fn,
)


def _synthetic_lpips_state_dict(seed=0):
    rng = np.random.RandomState(seed)
    sd = {
        "scaling_layer.shift": np.array(
            [-0.030, -0.088, -0.188], np.float32).reshape(1, 3, 1, 1),
        "scaling_layer.scale": np.array(
            [0.458, 0.448, 0.450], np.float32).reshape(1, 3, 1, 1),
    }
    slices = (("slice1", 0), ("slice2", 3), ("slice3", 6),
              ("slice4", 8), ("slice5", 10))
    for (sl, idx), (k, _s, _p, cin, cout) in zip(slices, _CONV_SPECS):
        sd[f"net.{sl}.{idx}.weight"] = (
            rng.randn(cout, cin, k, k).astype(np.float32)
            * (2.0 / (k * k * cin)) ** 0.5)
        sd[f"net.{sl}.{idx}.bias"] = rng.randn(cout).astype(np.float32) * 0.1
    for i, spec in enumerate(_CONV_SPECS):
        sd[f"lin{i}.model.1.weight"] = np.abs(
            rng.randn(1, spec[4], 1, 1).astype(np.float32)) * 0.1
    return sd


def _torch_lpips(sd, pred, target):
    """Reference forward with torch.nn.functional — mirrors the lpips
    package's AlexNet slices + LPIPS head exactly."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

    def feats(x):
        x = (x - t["scaling_layer.shift"]) / t["scaling_layer.scale"]
        taps = []
        for i, ((sl, idx), (_k, s, p, _ci, _co)) in enumerate(zip(
                (("slice1", 0), ("slice2", 3), ("slice3", 6),
                 ("slice4", 8), ("slice5", 10)), _CONV_SPECS)):
            x = F.relu(F.conv2d(x, t[f"net.{sl}.{idx}.weight"],
                                t[f"net.{sl}.{idx}.bias"],
                                stride=s, padding=p))
            taps.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, 3, 2)
        return taps

    with torch.no_grad():
        total = 0
        for i, (a, b) in enumerate(zip(feats(pred), feats(target))):
            na = a / (a.norm(dim=1, keepdim=True) + 1e-10)
            nb = b / (b.norm(dim=1, keepdim=True) + 1e-10)
            d = F.conv2d((na - nb) ** 2, t[f"lin{i}.model.1.weight"])
            total = total + d.mean(dim=(2, 3))
    return total.reshape(-1).numpy()


def test_lpips_matches_torch_forward():
    import torch

    sd = _synthetic_lpips_state_dict()
    params = convert_torch_lpips_state(sd)
    rng = np.random.RandomState(1)
    pred = rng.rand(2, 64, 64, 3).astype(np.float32)
    target = np.clip(pred + rng.randn(*pred.shape).astype(np.float32) * 0.1,
                     0, 1)
    ours = np.asarray(lpips_alex(params, jnp.asarray(pred),
                                 jnp.asarray(target)))
    ref = _torch_lpips(
        sd,
        torch.from_numpy(pred).permute(0, 3, 1, 2) * 2 - 1,
        torch.from_numpy(target).permute(0, 3, 1, 2) * 2 - 1,
    )
    assert ours.shape == (2,)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-6)


def test_lpips_identity_and_symmetry():
    params = init_lpips_alex(jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    b = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    assert float(lpips_alex(params, a, a)[0]) < 1e-8
    d_ab = float(lpips_alex(params, a, b)[0])
    d_ba = float(lpips_alex(params, b, a)[0])
    assert d_ab > 0
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-5)


def test_lpips_converter_refuses_unknown_keys():
    sd = _synthetic_lpips_state_dict()
    sd["net.slice1.99.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_torch_lpips_state(sd)


def test_load_lpips_params_torch_file(tmp_path):
    import torch

    sd = _synthetic_lpips_state_dict()
    path = tmp_path / "lpips_alex.pt"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)
    from longcat_video_tta_tpu.eval.lpips import load_lpips_params

    params = load_lpips_params(str(path))
    assert params["convs"][0]["kernel"].shape == (11, 11, 3, 64)


def test_lpips_feature_fn_hook():
    """The tower plugs into evaluate_generation_metrics and replaces the
    NaN fallback (reference common.py:648-667 computes real LPIPS)."""
    from longcat_video_tta_tpu.eval.metrics import (
        evaluate_generation_metrics,
    )

    params = init_lpips_alex(jax.random.PRNGKey(0))
    fn = make_lpips_feature_fn(params)
    rng = np.random.RandomState(3)
    gen = rng.rand(3, 64, 64, 3).astype(np.float32)
    gt = rng.rand(4, 64, 64, 3).astype(np.float32)
    m = evaluate_generation_metrics(gen, gt, lpips_feature_fn=fn)
    assert np.isfinite(m["lpips"]) and m["lpips"] > 0
    assert m["num_frames_scored"] == 3
    m0 = evaluate_generation_metrics(gen, gt)
    assert np.isnan(m0["lpips"])
