"""Comparison methods: DNO noise optimization, external eval, table."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longcat_video_tta_tpu.comparisons.compare_all import load_row, print_table
from longcat_video_tta_tpu.comparisons.eval_external import evaluate_external
from longcat_video_tta_tpu.comparisons.noise_opt import (
    noise_interp,
    optimize_noise,
    sample_from_noise,
)
from longcat_video_tta_tpu.config import longcat_tiny
from longcat_video_tta_tpu.models.dit import init_dit


@pytest.fixture(scope="module")
def setup():
    cfg = longcat_tiny()
    params = init_dit(jax.random.PRNGKey(0), cfg.dit, zero_init=False)
    B, C = 1, cfg.dit.in_channels
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, C, 2, 4, 4))
    target = jax.random.normal(jax.random.PRNGKey(2), (B, C, 2, 4, 4)) * 0.5
    text = jax.random.normal(jax.random.PRNGKey(3),
                             (B, cfg.dit.text_len, cfg.dit.text_dim))
    mask = jnp.ones((B, cfg.dit.text_len), jnp.int32)
    return cfg, params, cond, target, text, mask


def test_sample_from_noise_differentiable(setup):
    cfg, params, cond, target, text, mask = setup
    noise = jax.random.normal(jax.random.PRNGKey(4), target.shape)

    def loss(z):
        gen = sample_from_noise(params, cfg.dit, cfg.scheduler, z, cond,
                                text, mask, num_steps=2, attn_impl="xla")
        return jnp.mean((gen - target) ** 2)

    g = jax.grad(loss)(noise)
    assert float(jnp.max(jnp.abs(g))) > 0
    assert np.isfinite(np.asarray(g)).all()


def test_optimize_noise_reduces_loss(setup):
    cfg, params, cond, target, text, mask = setup
    _, info = optimize_noise(
        params, cfg.dit, cfg.scheduler, cond, target, text, mask,
        jax.random.PRNGKey(0), num_opt_steps=8, sampler_steps=2,
        lr=0.05, interp_p=1.0, attn_impl="xla",
    )
    losses = info["losses"]
    assert losses[-1] < losses[0], f"DNO did not reduce loss: {losses}"


def test_noise_interp_preserves_variance():
    z = jax.random.normal(jax.random.PRNGKey(0), (4096,))
    z2 = noise_interp(z, jax.random.PRNGKey(1), p=0.9)
    assert abs(float(jnp.std(z2)) - 1.0) < 0.05


def test_eval_external_and_table(tmp_path):
    rng = np.random.RandomState(0)
    gen_dir, gt_dir = tmp_path / "gen", tmp_path / "gt"
    gen_dir.mkdir()
    gt_dir.mkdir()
    for i in range(3):
        gt = (rng.rand(6, 16, 16, 3) * 255).astype(np.uint8)
        noisy = np.clip(gt.astype(int) + rng.randint(-20, 20, gt.shape),
                        0, 255).astype(np.uint8)
        np.save(str(gt_dir / f"v{i}.npy"), gt)
        np.save(str(gen_dir / f"v{i}.npy"), noisy)
    out = evaluate_external(str(gen_dir), str(gt_dir))
    assert out["n"] == 3 and 10 < out["psnr"] < 40

    ext_json = tmp_path / "ext.json"
    json.dump({k: v for k, v in out.items() if k != "per_video"},
              open(ext_json, "w"))
    rows = [load_row(str(ext_json), "dfot_external")]
    table = print_table(rows)
    assert "dfot_external" in table
