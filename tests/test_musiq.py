"""MUSIQ tower (VBench imaging_quality): converter + forward parity
with a torch.nn.functional oracle on random weights, multi-scale
tokenization invariants, and the vbench_native dispatch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from longcat_video_tta_tpu.eval.musiq import (
    MUSIQConfig,
    build_multiscale_tokens,
    convert_torch_musiq_state,
    imaging_quality,
    init_musiq,
    musiq_score,
)

TINY = MUSIQConfig(width=32, num_layers=2, num_heads=2, patch_size=8,
                   grid_size=4, longer_sides=(16, 24), max_tokens=48)


def _torch_musiq(cfg):
    """Torch mirror pinned to the converter's expected state_dict
    layout (pre-LN ViT, fused qkv, exact GELU, LN eps 1e-6, hash 2D +
    scale embeddings, CLS regression head)."""
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

        def forward(self, x, bias):
            B, N, _ = x.shape
            h = self.norm1(x)
            qkv = self.attn.qkv(h).reshape(B, N, 3, H, W // H)
            qkv = qkv.permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            a = (q @ k.transpose(-2, -1)) * (W // H) ** -0.5 + bias
            o = (a.softmax(-1) @ v).transpose(1, 2).reshape(B, N, W)
            x = x + self.attn.proj(o)
            h = self.norm2(x)
            h = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(h)))
            return x + h

    class MUSIQ(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embedding = nn.Linear(cfg.patch_dim, W)
            self.cls_token = nn.Parameter(torch.randn(1, 1, W) * 0.02)
            self.hash_pos_embed = nn.Parameter(
                torch.randn(cfg.grid_size, cfg.grid_size, W) * 0.02)
            self.scale_embed = nn.Parameter(
                torch.randn(cfg.num_scales, W) * 0.02)
            self.blocks = nn.ModuleList(
                [Block() for _ in range(cfg.num_layers)])
            self.norm = nn.LayerNorm(W, eps=1e-6)
            self.head = nn.Linear(W, 1)

        def forward(self, patches, rows, cols, scales, n_valid):
            B, T, _ = patches.shape
            x = self.patch_embedding(patches) \
                + self.hash_pos_embed[rows, cols] \
                + self.scale_embed[scales]
            x = torch.cat([self.cls_token.expand(B, -1, -1), x], 1)
            valid = torch.arange(T + 1)[None] < (n_valid[:, None] + 1)
            bias = torch.where(valid, 0.0, -1e9)[:, None, None, :]
            for blk in self.blocks:
                x = blk(x, bias)
            return self.head(self.norm(x)[:, 0])[:, 0]

    torch.manual_seed(0)
    return MUSIQ().eval()


@pytest.fixture(scope="module")
def oracle():
    return _torch_musiq(TINY)


def test_musiq_matches_torch_forward(oracle):
    import torch

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = convert_torch_musiq_state(sd, TINY)
    rs = np.random.RandomState(1)
    B, T = 3, TINY.max_tokens
    patches = rs.standard_normal((B, T, TINY.patch_dim)).astype(np.float32)
    rows = rs.randint(0, TINY.grid_size, (B, T)).astype(np.int32)
    cols = rs.randint(0, TINY.grid_size, (B, T)).astype(np.int32)
    scales = rs.randint(0, TINY.num_scales, (B, T)).astype(np.int32)
    n_valid = np.asarray([T, T // 2, 5], np.int32)
    ours = np.asarray(musiq_score(
        params, TINY, jnp.asarray(patches), jnp.asarray(rows),
        jnp.asarray(cols), jnp.asarray(scales), jnp.asarray(n_valid)))
    with torch.no_grad():
        ref = oracle(torch.from_numpy(patches),
                     torch.from_numpy(rows.astype(np.int64)),
                     torch.from_numpy(cols.astype(np.int64)),
                     torch.from_numpy(scales.astype(np.int64)),
                     torch.from_numpy(n_valid.astype(np.int64))).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


def test_musiq_converter_refuses_unknown_keys(oracle):
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    sd["extra.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="unconverted MUSIQ keys"):
        convert_torch_musiq_state(sd, TINY)


def test_multiscale_tokens_invariants():
    rs = np.random.RandomState(0)
    frame = rs.rand(40, 72, 3).astype(np.float32)
    patches, rows, cols, scales, n = build_multiscale_tokens(frame, TINY)
    assert patches.shape == (TINY.max_tokens, TINY.patch_dim)
    assert 0 < n <= TINY.max_tokens
    assert rows.max() < TINY.grid_size and cols.max() < TINY.grid_size
    assert set(np.unique(scales[:n])) <= set(range(TINY.num_scales))
    # all three scales represented
    assert len(set(np.unique(scales[:n]))) == TINY.num_scales
    # padding region zeroed
    assert not patches[n:].any()
    # native scale trimmed under budget pressure, resized scales whole
    big = rs.rand(160, 160, 3).astype(np.float32)
    _, _, _, scales2, n2 = build_multiscale_tokens(big, TINY)
    n_resized = sum(int((s - 1) // TINY.patch_size + 1) ** 2
                    for s in TINY.longer_sides)
    assert (scales2[:n2] > 0).sum() == n_resized


def test_imaging_quality_range_and_determinism():
    params = init_musiq(jax.random.PRNGKey(0), TINY)
    rs = np.random.RandomState(2)
    frames = rs.rand(4, 32, 48, 3).astype(np.float32)
    a = imaging_quality(params, TINY, frames)
    b = imaging_quality(params, TINY, frames)
    assert 0.0 <= a <= 1.0 and a == b


def test_load_musiq_with_config_sidecar(oracle, tmp_path):
    import json

    import torch

    torch.save(oracle.state_dict(), tmp_path / "musiq_spaq.pth")
    with open(tmp_path / "musiq_config.json", "w") as f:
        json.dump(TINY.as_dict(), f)
    from longcat_video_tta_tpu.eval.musiq import load_musiq_params

    params, cfg = load_musiq_params(str(tmp_path / "musiq_spaq.pth"))
    assert cfg == TINY
    assert params["scale_embed"].shape == (TINY.num_scales, TINY.width)


def test_vbench_dispatch_scores_all_five_dims(tmp_path):
    """With dino + aesthetic + musiq towers present, the native scorer
    covers the full reference dimension set (common.py:2512-2516) with
    no unavailable entries."""
    import json

    import torch

    from longcat_video_tta_tpu.eval.vbench_native import (
        load_native_towers, native_vbench_scores)

    torch.save(_torch_musiq(TINY).state_dict(),
               tmp_path / "musiq_spaq.pth")
    with open(tmp_path / "musiq_config.json", "w") as f:
        json.dump(TINY.as_dict(), f)

    from test_vbench_native import TINY as DINO_TINY, _torch_dino

    torch.save(_torch_dino(DINO_TINY).state_dict(),
               tmp_path / "dino_vits16.pth")
    with open(tmp_path / "dino_config.json", "w") as f:
        json.dump({"width": DINO_TINY.width,
                   "num_layers": DINO_TINY.num_layers,
                   "num_heads": DINO_TINY.num_heads,
                   "patch_size": DINO_TINY.patch_size,
                   "image_size": DINO_TINY.image_size}, f)

    import torch.nn as nn

    torch.manual_seed(0)
    head = nn.Module()
    head.layers = nn.Sequential(
        nn.Linear(16, 8), nn.Dropout(0.2), nn.Linear(8, 4),
        nn.Dropout(0.2), nn.Linear(4, 4), nn.Dropout(0.1),
        nn.Linear(4, 2), nn.Linear(2, 1)).eval()
    torch.save(head.state_dict(), tmp_path / "aesthetic_l14.pth")
    from transformers import CLIPConfig, CLIPModel

    ccfg = CLIPConfig(
        text_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, projection_dim=16),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=16,
            projection_dim=16),
        projection_dim=16)
    CLIPModel(ccfg).eval().save_pretrained(tmp_path / "clip_l14")

    towers = load_native_towers(str(tmp_path))
    assert set(towers) == {"dino", "musiq", "aesthetic"}
    rs = np.random.RandomState(3)
    out = native_vbench_scores(
        {"v0": rs.rand(4, 24, 32, 3).astype(np.float32)}, towers)
    assert out["unavailable"] == {}
    for dim in ("subject_consistency", "motion_smoothness",
                "temporal_flickering", "aesthetic_quality",
                "imaging_quality"):
        assert dim in out["results"], dim
        assert 0.0 <= out["results"][dim] <= 1.0
