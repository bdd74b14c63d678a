"""I3D tower: numerical parity with a torch.nn.functional forward
(pytorch-i3d semantics: TF-SAME padding, inference BN eps 1e-3) on
random weights, converter guard, and the FVD accumulator hook."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from longcat_video_tta_tpu.eval.i3d import (
    INCEPTION_TABLE,
    convert_torch_i3d_state,
    i3d_logits,
    init_i3d,
    make_i3d_feature_fn,
)


def _tree_to_torch_sd(params):
    """Our tree -> pytorch-i3d naming (kernel [kt,kh,kw,I,O] ->
    [O,I,kt,kh,kw])."""
    sd = {}

    def unit(prefix, p):
        sd[prefix + ".conv3d.weight"] = np.asarray(
            p["kernel"]).transpose(4, 3, 0, 1, 2)
        for ours, theirs in (("weight", "weight"), ("bias", "bias"),
                             ("mean", "running_mean"),
                             ("var", "running_var")):
            sd[prefix + ".bn." + theirs] = np.asarray(p["bn"][ours])

    for name in ("Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3"):
        unit(name, params[name])
    for name in INCEPTION_TABLE:
        for b in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b"):
            unit(f"{name}.{b}", params[name][b])
    sd["logits.conv3d.weight"] = np.asarray(
        params["logits"]["kernel"]).transpose(4, 3, 0, 1, 2)
    sd["logits.conv3d.bias"] = np.asarray(params["logits"]["bias"])
    return sd


def _torch_i3d(sd, x):
    """Reference forward with torch.nn.functional (TF-SAME pads)."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

    def same_pad(x, k, s):
        pads = []
        for dim, (kk, ss) in zip((2, 3, 4), zip(k, s)):
            n = x.shape[dim]
            total = max(kk - ss, 0) if n % ss == 0 else \
                max(kk - (n % ss), 0)
            pads.append((total // 2, total - total // 2))
        # F.pad order: last dim first
        flat = [p for pair in reversed(pads) for p in pair]
        return F.pad(x, flat)

    def unit(prefix, x, s=(1, 1, 1)):
        w = t[prefix + ".conv3d.weight"]
        x = same_pad(x, w.shape[2:], s)
        x = F.conv3d(x, w, stride=s)
        x = F.batch_norm(x, t[prefix + ".bn.running_mean"],
                         t[prefix + ".bn.running_var"],
                         t[prefix + ".bn.weight"], t[prefix + ".bn.bias"],
                         training=False, eps=1e-3)
        return F.relu(x)

    def pool(x, k, s):
        x = same_pad(x, k, s)
        return F.max_pool3d(x, k, s)

    def mix(name, x):
        b0 = unit(f"{name}.b0", x)
        b1 = unit(f"{name}.b1b", unit(f"{name}.b1a", x))
        b2 = unit(f"{name}.b2b", unit(f"{name}.b2a", x))
        b3 = unit(f"{name}.b3b", pool(x, (3, 3, 3), (1, 1, 1)))
        return torch.cat([b0, b1, b2, b3], dim=1)

    with torch.no_grad():
        x = unit("Conv3d_1a_7x7", x, (2, 2, 2))
        x = pool(x, (1, 3, 3), (1, 2, 2))
        x = unit("Conv3d_2b_1x1", x)
        x = unit("Conv3d_2c_3x3", x)
        x = pool(x, (1, 3, 3), (1, 2, 2))
        x = mix("Mixed_3b", x)
        x = mix("Mixed_3c", x)
        x = pool(x, (3, 3, 3), (2, 2, 2))
        for n in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e",
                  "Mixed_4f"):
            x = mix(n, x)
        x = pool(x, (2, 2, 2), (2, 2, 2))
        x = mix("Mixed_5b", x)
        x = mix("Mixed_5c", x)
        x = F.avg_pool3d(x, (2, 7, 7), (1, 1, 1))
        x = F.conv3d(x, t["logits.conv3d.weight"],
                     t["logits.conv3d.bias"])
        return x.mean(dim=(2, 3, 4)).numpy()


@pytest.fixture(scope="module")
def params():
    return jax.jit(init_i3d)(jax.random.PRNGKey(0))


def test_i3d_matches_torch_forward(params):
    import torch

    sd = _tree_to_torch_sd(params)
    rng = np.random.RandomState(1)
    vid = rng.rand(1, 16, 224, 224, 3).astype(np.float32) * 2 - 1
    ours = np.asarray(i3d_logits(params, jnp.asarray(vid)))
    ref = _torch_i3d(sd, torch.from_numpy(vid).permute(0, 4, 1, 2, 3))
    assert ours.shape == (1, 400)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_i3d_converter_roundtrip_and_guard(params):
    sd = _tree_to_torch_sd(params)
    sd["Conv3d_1a_7x7.bn.num_batches_tracked"] = np.zeros((), np.int64)
    back = convert_torch_i3d_state(sd)
    np.testing.assert_allclose(
        np.asarray(back["Mixed_4f"]["b1b"]["kernel"]),
        np.asarray(params["Mixed_4f"]["b1b"]["kernel"]))
    sd["extra.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_torch_i3d_state(sd)


def test_i3d_fvd_accumulator_hook(params):
    """Real-feature FVD end-to-end: identical streams -> FVD ~ 0,
    different streams -> larger (reference protocol, min 9 frames +
    224 crop handled by the hook)."""
    from longcat_video_tta_tpu.eval.frechet import (
        OnlineFrechetAccumulator,
    )

    feat = make_i3d_feature_fn(params)
    rng = np.random.RandomState(2)
    clips = [rng.rand(6, 128, 128, 3).astype(np.float32)
             for _ in range(4)]
    acc_same = OnlineFrechetAccumulator(video_feature_fn=feat,
                                        min_videos=2)
    acc_diff = OnlineFrechetAccumulator(video_feature_fn=feat,
                                        min_videos=2)
    for c in clips:
        acc_same.update(c, c)
        acc_diff.update(c, np.clip(
            c + rng.randn(*c.shape).astype(np.float32) * 0.3, 0, 1))
    same = acc_same.compute()["fvd"]
    diff = acc_diff.compute()["fvd"]
    assert same is not None and diff is not None
    assert abs(same) < 1e-3
    assert diff > same
