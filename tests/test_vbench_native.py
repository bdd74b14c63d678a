"""Native VBench dimensions (eval/vbench_native.py) vs torch oracles.

Reference protocol: finalize_online_eval common.py:2453-2522 runs the
external VBench++ package on 5 dimensions; these tests pin the native
JAX re-implementations — the DINO tower + converter against a minimal
torch module in the facebookresearch/dino layout, the aesthetic head
against a torch Sequential, and the weight-free formulas against direct
numpy computation.
"""

import numpy as np
import pytest

from longcat_video_tta_tpu.eval.vbench import run_vbench
from longcat_video_tta_tpu.eval.vbench_native import (
    DINOViTConfig,
    aesthetic_mlp,
    consistency_score_from_features,
    convert_torch_aesthetic_head,
    convert_torch_dino_state,
    dino_cls_features,
    init_dino,
    motion_smoothness,
    native_vbench_scores,
    preprocess_imagenet,
    subject_consistency,
    temporal_flickering,
)

TINY = DINOViTConfig(width=32, num_layers=2, num_heads=2, patch_size=8,
                     image_size=16)


def _torch_dino(cfg):
    """Minimal torch module pinned to the facebookresearch/dino
    VisionTransformer layout (fused qkv, pre-norm blocks, exact GELU,
    LN eps 1e-6, CLS-token output) with matching state_dict keys."""
    import torch
    import torch.nn as nn

    W, H = cfg.width, cfg.num_heads

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(W, eps=1e-6)
            self.attn = nn.Module()
            self.attn.qkv = nn.Linear(W, 3 * W)
            self.attn.proj = nn.Linear(W, W)
            self.norm2 = nn.LayerNorm(W, eps=1e-6)
            self.mlp = nn.Module()
            self.mlp.fc1 = nn.Linear(W, 4 * W)
            self.mlp.fc2 = nn.Linear(4 * W, W)

        def forward(self, x):
            B, N, _ = x.shape
            h = self.norm1(x)
            qkv = self.attn.qkv(h).reshape(B, N, 3, H, W // H)
            qkv = qkv.permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            a = (q @ k.transpose(-2, -1)) * (W // H) ** -0.5
            o = (a.softmax(-1) @ v).transpose(1, 2).reshape(B, N, W)
            x = x + self.attn.proj(o)
            h = self.norm2(x)
            h = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(h)))
            return x + h

    class DINO(nn.Module):
        def __init__(self):
            super().__init__()
            self.cls_token = nn.Parameter(torch.randn(1, 1, W) * 0.02)
            n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
            self.pos_embed = nn.Parameter(torch.randn(1, n_pos, W) * 0.02)
            self.patch_embed = nn.Module()
            self.patch_embed.proj = nn.Conv2d(
                3, W, cfg.patch_size, stride=cfg.patch_size)
            self.blocks = nn.ModuleList(
                [Block() for _ in range(cfg.num_layers)])
            self.norm = nn.LayerNorm(W, eps=1e-6)

        def forward(self, x):
            B = x.shape[0]
            x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
            cls = self.cls_token.expand(B, -1, -1)
            x = torch.cat([cls, x], dim=1) + self.pos_embed
            for blk in self.blocks:
                x = blk(x)
            return self.norm(x)[:, 0]

    torch.manual_seed(0)
    return DINO().eval()


def test_dino_converter_matches_torch_oracle():
    import torch

    model = _torch_dino(TINY)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_torch_dino_state(sd, TINY)
    rs = np.random.RandomState(1)
    pix = rs.standard_normal((3, TINY.image_size, TINY.image_size, 3)) \
        .astype(np.float32)
    ours = np.asarray(dino_cls_features(params, TINY, pix))
    with torch.no_grad():
        ref = model(torch.from_numpy(
            pix.transpose(0, 3, 1, 2))).numpy()
    assert ours.shape == ref.shape == (3, TINY.width)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_aesthetic_head_matches_torch_sequential():
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    # the published v2 predictor: linears at 0/2/4/6/7, dropout between,
    # NO activations
    head = nn.Module()
    head.layers = nn.Sequential(
        nn.Linear(8, 16), nn.Dropout(0.2), nn.Linear(16, 4),
        nn.Dropout(0.2), nn.Linear(4, 4), nn.Dropout(0.1),
        nn.Linear(4, 2), nn.Linear(2, 1)).eval()
    sd = {k: v.numpy() for k, v in head.state_dict().items()}
    jhead = convert_torch_aesthetic_head(sd)
    assert len(jhead["linears"]) == 5
    x = np.random.RandomState(2).standard_normal((6, 8)).astype(np.float32)
    ours = np.asarray(aesthetic_mlp(jhead, x))
    with torch.no_grad():
        ref = head.layers(torch.from_numpy(x)).numpy()[:, 0]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_temporal_flickering_formula():
    rs = np.random.RandomState(0)
    frames = rs.randint(0, 256, (5, 4, 6, 3), dtype=np.uint8)
    maes = [np.abs(frames[i].astype(np.float64)
                   - frames[i + 1].astype(np.float64)).mean()
            for i in range(4)]
    expected = float(np.mean([(255.0 - m) / 255.0 for m in maes]))
    assert temporal_flickering(frames) == pytest.approx(expected)
    # static video: perfect score, and float input matches uint8 input
    static = np.repeat(frames[:1], 4, axis=0)
    assert temporal_flickering(static) == pytest.approx(1.0)
    assert temporal_flickering(frames.astype(np.float32) / 255.0) == \
        pytest.approx(expected, abs=1e-6)


def test_consistency_score_formula():
    f = np.asarray([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    # t=1: cos(prev)=1, cos(first)=1 -> 1; t=2: both 0 -> 0
    assert consistency_score_from_features(f) == pytest.approx(0.5)
    # identical frames -> 1.0; negative cosines clamp at 0
    assert consistency_score_from_features(
        np.ones((4, 3))) == pytest.approx(1.0)
    g = np.asarray([[1.0, 0.0], [-1.0, 0.0]])
    assert consistency_score_from_features(g) == pytest.approx(0.0)


def test_subject_consistency_runs_on_random_tower():
    import jax

    params = init_dino(jax.random.PRNGKey(0), TINY)
    rs = np.random.RandomState(0)
    frames = rs.rand(4, 20, 24, 3).astype(np.float32)
    s = subject_consistency(params, TINY, frames, batch=2)
    assert 0.0 <= s <= 1.0
    # a static clip maxes the score regardless of tower weights
    static = np.repeat(frames[:1], 3, axis=0)
    assert subject_consistency(params, TINY, static) == pytest.approx(
        1.0, abs=1e-5)


def test_motion_smoothness_linear_motion_is_perfect():
    t = np.arange(9, dtype=np.float32)[:, None, None, None]
    ramp = np.broadcast_to(t / 10.0, (9, 4, 4, 3))
    out = motion_smoothness(ramp)
    assert out["native_variant"] == "linear-interp"
    assert out["value"] == pytest.approx(1.0, abs=2e-3)  # uint8 rounding
    rs = np.random.RandomState(0)
    noisy = rs.rand(9, 4, 4, 3).astype(np.float32)
    assert motion_smoothness(noisy)["value"] < out["value"]


def test_preprocess_imagenet_shape_and_range():
    frames = np.random.RandomState(0).rand(2, 30, 50, 3).astype(np.float32)
    x = np.asarray(preprocess_imagenet(frames, 16))
    assert x.shape == (2, 16, 16, 3)
    # zero pixel maps to -mean/std
    z = np.asarray(preprocess_imagenet(np.zeros((1, 16, 16, 3)), 16))
    np.testing.assert_allclose(
        z[0, 0, 0], (0 - np.asarray([0.485, 0.456, 0.406]))
        / np.asarray([0.229, 0.224, 0.225]), atol=1e-6)


def test_native_vbench_scores_dispatch():
    import jax

    rs = np.random.RandomState(0)
    frames = {"a.mp4": rs.rand(5, 16, 16, 3).astype(np.float32),
              "b.mp4": rs.rand(5, 16, 16, 3).astype(np.float32)}
    # no towers: weight-free dims score, tower dims report reasons
    out = native_vbench_scores(frames)
    assert set(out["results"]) >= {"temporal_flickering",
                                   "motion_smoothness"}
    assert out["results"]["motion_smoothness_variant"] == "linear-interp"
    assert "subject_consistency" in out["unavailable"]
    assert "aesthetic_quality" in out["unavailable"]
    assert "imaging_quality" in out["unavailable"]
    # with a dino tower the subject dim scores per video
    towers = {"dino": (init_dino(jax.random.PRNGKey(0), TINY), TINY)}
    out2 = native_vbench_scores(frames, towers,
                                ["subject_consistency"])
    assert 0.0 <= out2["results"]["subject_consistency"] <= 1.0
    assert set(out2["per_video"]["a.mp4"]) == {"subject_consistency"}


def test_run_vbench_native_over_saved_mp4s(tmp_path):
    from longcat_video_tta_tpu.data.video_io import save_video

    rs = np.random.RandomState(0)
    for name in ("x", "y"):
        save_video(rs.rand(6, 32, 32, 3).astype(np.float32),
                   str(tmp_path / f"{name}.mp4"), fps=8)
    out = run_vbench(str(tmp_path))
    assert out["skipped"] is False and out["backend"] == "jax-native"
    assert 0.0 <= out["results"]["temporal_flickering"] <= 1.0
    assert len(out["per_video"]) == 2
    # empty dir still degrades to the structured skip marker
    empty = tmp_path / "empty"
    empty.mkdir()
    out2 = run_vbench(str(empty))
    assert out2["skipped"] is True


def test_native_vbench_scores_accepts_lazy_loaders():
    """Values may be zero-arg callables (lazy decode): the scorer must
    materialize one video at a time so a 100-clip campaign dir never
    sits in RAM at once."""
    import numpy as np

    from longcat_video_tta_tpu.eval.vbench_native import (
        native_vbench_scores,
    )

    rng = np.random.default_rng(0)
    clip = rng.random((6, 16, 16, 3), dtype=np.float32)
    live = {"n": 0}

    def loader():
        live["n"] += 1
        return clip

    out = native_vbench_scores(
        {"a.mp4": loader, "b.mp4": clip},
        towers={},
        dimensions=["temporal_flickering", "motion_smoothness"],
    )
    assert live["n"] == 1  # called exactly once, scored on both dims
    assert set(out["per_video"]) == {"a.mp4", "b.mp4"}
    for scores in out["per_video"].values():
        assert set(scores) == {"temporal_flickering", "motion_smoothness"}
