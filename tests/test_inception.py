"""InceptionV3 tower: numerical parity with a torch.nn.functional
forward (written literally from torchvision's Inception3 eval path —
explicit branch names, paddings and strides, independent of the JAX
module's spec tables), converter guard, and the FID accumulator hook."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from longcat_video_tta_tpu.eval.inception import (
    MIXED_SPECS,
    _STEM,
    convert_torch_inception_state,
    inception_features,
    init_inception,
    make_inception_feature_fn,
    preprocess_frames,
)


def _tree_to_torch_sd(params):
    """Our tree -> torchvision naming (kernel [kh,kw,I,O] ->
    [O,I,kh,kw])."""
    sd = {}

    def unit(prefix, p):
        sd[prefix + ".conv.weight"] = np.asarray(
            p["kernel"]).transpose(3, 2, 0, 1)
        for ours, theirs in (("weight", "weight"), ("bias", "bias"),
                             ("mean", "running_mean"),
                             ("var", "running_var")):
            sd[prefix + ".bn." + theirs] = np.asarray(p["bn"][ours])

    for name, *_ in _STEM:
        unit(name, params[name])
    for name, spec in MIXED_SPECS.items():
        for b in spec:
            unit(f"{name}.{b}", params[name][b])
    return sd


def _torch_inception(sd, x):
    """torchvision Inception3 eval forward with torch.nn.functional
    (transform_input=True, fc=Identity)."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

    def bc(name, x, stride=1, padding=0):  # BasicConv2d
        x = F.conv2d(x, t[name + ".conv.weight"], None, stride, padding)
        x = F.batch_norm(x, t[name + ".bn.running_mean"],
                         t[name + ".bn.running_var"],
                         t[name + ".bn.weight"], t[name + ".bn.bias"],
                         False, 0.0, 1e-3)
        return F.relu(x)

    def inception_a(n, x):
        b0 = bc(n + ".branch1x1", x)
        b1 = bc(n + ".branch5x5_2", bc(n + ".branch5x5_1", x), padding=2)
        b2 = bc(n + ".branch3x3dbl_3",
                bc(n + ".branch3x3dbl_2",
                   bc(n + ".branch3x3dbl_1", x), padding=1), padding=1)
        b3 = bc(n + ".branch_pool",
                F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b0, b1, b2, b3], 1)

    def inception_b(n, x):
        b0 = bc(n + ".branch3x3", x, stride=2)
        b1 = bc(n + ".branch3x3dbl_3",
                bc(n + ".branch3x3dbl_2",
                   bc(n + ".branch3x3dbl_1", x), padding=1), stride=2)
        return torch.cat([b0, b1, F.max_pool2d(x, 3, 2)], 1)

    def inception_c(n, x):
        b0 = bc(n + ".branch1x1", x)
        b1 = bc(n + ".branch7x7_1", x)
        b1 = bc(n + ".branch7x7_2", b1, padding=(0, 3))
        b1 = bc(n + ".branch7x7_3", b1, padding=(3, 0))
        b2 = bc(n + ".branch7x7dbl_1", x)
        b2 = bc(n + ".branch7x7dbl_2", b2, padding=(3, 0))
        b2 = bc(n + ".branch7x7dbl_3", b2, padding=(0, 3))
        b2 = bc(n + ".branch7x7dbl_4", b2, padding=(3, 0))
        b2 = bc(n + ".branch7x7dbl_5", b2, padding=(0, 3))
        b3 = bc(n + ".branch_pool",
                F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b0, b1, b2, b3], 1)

    def inception_d(n, x):
        b0 = bc(n + ".branch3x3_2", bc(n + ".branch3x3_1", x), stride=2)
        b1 = bc(n + ".branch7x7x3_1", x)
        b1 = bc(n + ".branch7x7x3_2", b1, padding=(0, 3))
        b1 = bc(n + ".branch7x7x3_3", b1, padding=(3, 0))
        b1 = bc(n + ".branch7x7x3_4", b1, stride=2)
        return torch.cat([b0, b1, F.max_pool2d(x, 3, 2)], 1)

    def inception_e(n, x):
        b0 = bc(n + ".branch1x1", x)
        b1 = bc(n + ".branch3x3_1", x)
        b1 = torch.cat([bc(n + ".branch3x3_2a", b1, padding=(0, 1)),
                        bc(n + ".branch3x3_2b", b1, padding=(1, 0))], 1)
        b2 = bc(n + ".branch3x3dbl_2",
                bc(n + ".branch3x3dbl_1", x), padding=1)
        b2 = torch.cat([bc(n + ".branch3x3dbl_3a", b2, padding=(0, 1)),
                        bc(n + ".branch3x3dbl_3b", b2, padding=(1, 0))],
                       1)
        b3 = bc(n + ".branch_pool",
                F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b0, b1, b2, b3], 1)

    with torch.no_grad():
        # transform_input
        x0 = x[:, 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
        x1 = x[:, 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
        x2 = x[:, 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
        x = torch.cat([x0, x1, x2], 1)
        x = bc("Conv2d_1a_3x3", x, stride=2)
        x = bc("Conv2d_2a_3x3", x)
        x = bc("Conv2d_2b_3x3", x, padding=1)
        x = F.max_pool2d(x, 3, 2)
        x = bc("Conv2d_3b_1x1", x)
        x = bc("Conv2d_4a_3x3", x)
        x = F.max_pool2d(x, 3, 2)
        x = inception_a("Mixed_5b", x)
        x = inception_a("Mixed_5c", x)
        x = inception_a("Mixed_5d", x)
        x = inception_b("Mixed_6a", x)
        x = inception_c("Mixed_6b", x)
        x = inception_c("Mixed_6c", x)
        x = inception_c("Mixed_6d", x)
        x = inception_c("Mixed_6e", x)
        x = inception_d("Mixed_7a", x)
        x = inception_e("Mixed_7b", x)
        x = inception_e("Mixed_7c", x)
        x = F.adaptive_avg_pool2d(x, 1).flatten(1)
    return x.numpy()


@pytest.fixture(scope="module")
def params():
    return init_inception(jax.random.PRNGKey(0))


def test_inception_matches_torch_forward(params):
    import torch

    rng = np.random.RandomState(0)
    # 96x96 exercises every layer (min input 75) at ~1/10 the compute
    x = rng.randn(2, 96, 96, 3).astype(np.float32) * 0.5
    sd = _tree_to_torch_sd(params)
    ours = np.asarray(inception_features(params, jnp.asarray(x)))
    theirs = _torch_inception(sd, torch.from_numpy(
        x.transpose(0, 3, 1, 2)))
    assert ours.shape == theirs.shape == (2, 2048)
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)


def test_inception_converter_roundtrip_and_guard(params):
    sd = _tree_to_torch_sd(params)
    # AuxLogits / fc / bookkeeping keys must be tolerated
    sd["AuxLogits.conv0.conv.weight"] = np.zeros((128, 768, 1, 1),
                                                 np.float32)
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)
    sd["fc.bias"] = np.zeros((1000,), np.float32)
    sd["Conv2d_1a_3x3.bn.num_batches_tracked"] = np.zeros((), np.int64)
    back = convert_torch_inception_state(sd)
    np.testing.assert_allclose(np.asarray(back["Mixed_7c"]["branch1x1"]
                                          ["kernel"]),
                               np.asarray(params["Mixed_7c"]["branch1x1"]
                                          ["kernel"]))
    # unconsumed keys refuse the conversion
    sd["Mixed_9z.branch1x1.conv.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError):
        convert_torch_inception_state(sd)


def test_inception_fid_accumulator_hook(params):
    from longcat_video_tta_tpu.eval.frechet import (
        OnlineFrechetAccumulator,
    )
    from longcat_video_tta_tpu.eval.i3d import (
        init_i3d,
        make_i3d_feature_fn,
    )

    rng = np.random.RandomState(1)
    acc = OnlineFrechetAccumulator(
        video_feature_fn=make_i3d_feature_fn(
            init_i3d(jax.random.PRNGKey(1))),
        frame_feature_fn=make_inception_feature_fn(params),
    )
    for _ in range(2):
        gen = rng.rand(3, 96, 112, 3).astype(np.float32)
        gt = rng.rand(3, 96, 112, 3).astype(np.float32)
        acc.update(gen, gt)
    out = acc.compute()
    assert np.isfinite(out["fvd"]) and np.isfinite(out["fid"])
    assert out["fid"] >= 0.0


def test_offline_fid_wiring(params, tmp_path):
    """--inception-model-path reaches the offline dir evaluator: FID
    computes with no I3D weights at all (fvd stays None)."""
    import torch

    from longcat_video_tta_tpu.eval.offline import evaluate_fvd_dirs

    ckpt = tmp_path / "inception_v3.pth"
    torch.save({k: torch.from_numpy(np.asarray(v).copy())
                for k, v in _tree_to_torch_sd(params).items()}, ckpt)
    rng = np.random.RandomState(3)
    for d in ("gen", "gt"):
        (tmp_path / d).mkdir()
        for i in range(2):
            np.save(tmp_path / d / f"v{i}.npy",
                    (rng.rand(3, 96, 112, 3) * 255).astype(np.uint8))
    out = evaluate_fvd_dirs(str(tmp_path / "gen"), str(tmp_path / "gt"),
                            inception_model_path=str(ckpt))
    assert out["num_pairs"] == 2
    assert out["num_videos"] == 2  # pair counter, not the I3D moments
    assert out["fvd"] is None and np.isfinite(out["fid"])


def test_fid_only_accumulator_enabled(params):
    from longcat_video_tta_tpu.eval.frechet import (
        OnlineFrechetAccumulator,
    )

    acc = OnlineFrechetAccumulator(
        frame_feature_fn=make_inception_feature_fn(params))
    assert acc.enabled  # run_tta gates update() on this


def test_preprocess_frames_protocol():
    frames = np.random.RandomState(2).rand(2, 120, 160, 3).astype(
        np.float32)
    x = preprocess_frames(frames, size=96)
    assert x.shape == (2, 96, 96, 3)
    # ImageNet-normalized: mean near 0-ish, not [0,1]
    assert x.min() < -0.5 and x.max() > 0.5
