"""Int8 W8A8 decode quantization (ops/quant.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longcat_video_tta_tpu.config import longcat_tiny
from longcat_video_tta_tpu.models.dit import (
    dit_forward,
    init_dit,
)
from longcat_video_tta_tpu.ops.layers import linear
from longcat_video_tta_tpu.ops.quant import (
    int8_linear,
    quantize_dit_blocks_int8,
    quantize_linear_params,
)

CFG = longcat_tiny().dit


def test_int8_linear_close_to_dense():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p = {"kernel": jax.random.normal(k1, (64, 96)) * 0.05,
         "bias": jnp.ones((96,)) * 0.1}
    x = jax.random.normal(k2, (3, 17, 64))
    ref = linear(p, x)
    qp = quantize_linear_params(p)
    out = int8_linear(qp, x)
    # W8A8 with per-channel/per-token scales: ~1% relative error
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel
    # transparent dispatch through ops.layers.linear
    out2 = linear(qp, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_int8_linear_stacked_kernels_slice_like_scan():
    """Depth-stacked quantization [L, K, N] must equal quantizing each
    block independently (the scan slices the leading axis)."""
    k = jax.random.PRNGKey(1)
    w = jax.random.normal(k, (4, 32, 48)) * 0.05
    stacked = quantize_linear_params({"kernel": w})
    for i in range(4):
        single = quantize_linear_params({"kernel": w[i]})
        np.testing.assert_array_equal(
            np.asarray(stacked["kernel_i8"][i]),
            np.asarray(single["kernel_i8"]))
        np.testing.assert_allclose(np.asarray(stacked["scale"][i]),
                                   np.asarray(single["scale"]))


def test_int8_linear_lora_contribution_bf16():
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(2), 4)
    p = quantize_linear_params(
        {"kernel": jax.random.normal(k1, (32, 32)) * 0.05})
    x = jax.random.normal(k2, (5, 32))
    lora = {"a": jax.random.normal(k3, (32, 4)) * 0.1,
            "b": jax.random.normal(k4, (4, 32)) * 0.1}
    base = int8_linear(p, x)
    with_lora = int8_linear(p, x, lora=lora, lora_scale=0.5)
    expect = base + (x @ lora["a"]) @ lora["b"] * 0.5
    np.testing.assert_allclose(np.asarray(with_lora), np.asarray(expect),
                               atol=1e-5, rtol=1e-5)


def test_quantized_dit_forward_close_and_structure():
    """The quantized pytree drops into the SAME forward; outputs track
    the bf16 reference closely at tiny scale, and only the per-block
    heavy matmuls are int8."""
    params = init_dit(jax.random.PRNGKey(0), CFG, zero_init=False)
    qparams = quantize_dit_blocks_int8(params)

    # structure: block linears quantized, embedders/final untouched
    assert "kernel_i8" in qparams["blocks"]["attn"]["qkv"]
    assert "kernel_i8" in qparams["blocks"]["ffn"]["w2"]
    assert "kernel" in qparams["final"]["proj"]
    assert "kernel" in qparams["x_embed"]
    assert qparams["blocks"]["attn"]["qkv"]["kernel_i8"].dtype == jnp.int8

    B, C, T, H, W = 1, CFG.in_channels, 5, 8, 12
    lat = jax.random.normal(jax.random.PRNGKey(1), (B, C, T, H, W))
    t = jnp.full((B,), 500.0)
    text = jax.random.normal(jax.random.PRNGKey(2),
                             (B, CFG.text_len, CFG.text_dim))
    mask = jnp.ones((B, CFG.text_len), jnp.int32)

    ref = dit_forward(params, CFG, lat, t, text, mask, num_cond_latents=2)
    out = dit_forward(qparams, CFG, lat, t, text, mask, num_cond_latents=2)
    ref_n = np.asarray(ref).ravel()
    out_n = np.asarray(out).ravel()
    assert np.all(np.isfinite(out_n))
    corr = np.corrcoef(ref_n, out_n)[0, 1]
    assert corr > 0.995, corr
    rel = np.linalg.norm(out_n - ref_n) / np.linalg.norm(ref_n)
    assert rel < 0.15, rel


def test_generate_vc_quantize_decode_runs(tmp_path):
    """End-to-end sampler with quantize_decode='int8' produces finite
    frames of the right shape (tiny preset, xla attention)."""
    from longcat_video_tta_tpu.pipeline.pipeline import (
        ModelBundle, generate_vc,
    )

    cfg = longcat_tiny()
    bundle = ModelBundle.init_random(cfg, seed=0)
    cond = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 5, 16, 32),
                              minval=-1.0, maxval=1.0)
    out = generate_vc(bundle, cond, "a test prompt", num_frames=5,
                      num_inference_steps=2, seed=0, attn_impl="xla",
                      quantize_decode="int8")
    assert out.shape == (5, 16, 32, 3) and np.all(np.isfinite(out))


@pytest.mark.parametrize("preset_fn", ["opensora_v2_tiny", "cogvideox_tiny"])
def test_backbone_quantize_decode_runs(preset_fn):
    """int8 decode on the MMDiT and CogVideoX layouts: the per-arch
    quantizers produce pytrees the shared forwards accept end-to-end."""
    from longcat_video_tta_tpu.models import backbones
    from longcat_video_tta_tpu.pipeline.pipeline import (
        ModelBundle, generate_vc,
    )

    cfg = getattr(backbones, preset_fn)()
    bundle = ModelBundle.init_random(cfg, seed=0)
    cond = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 5, 16, 32),
                              minval=-1.0, maxval=1.0)
    out = generate_vc(bundle, cond, "a test", num_frames=5,
                      num_inference_steps=2, seed=0, attn_impl="xla",
                      quantize_decode="int8")
    assert out.shape[0] == 5 and np.all(np.isfinite(out))


def test_generate_vc_int8qk_runs(tmp_path):
    """quantize_decode='int8qk' (int8 weights + int8 QK^T attention via
    the BSA kernel at keep_ratio=1.0) produces finite frames close to
    the plain int8 decode on the tiny preset."""
    from longcat_video_tta_tpu.pipeline.pipeline import (
        ModelBundle, generate_vc,
    )

    cfg = longcat_tiny()
    bundle = ModelBundle.init_random(cfg, seed=0)
    cond = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 5, 16, 32),
                              minval=-1.0, maxval=1.0)
    kw = dict(num_frames=5, num_inference_steps=2, seed=0,
              attn_impl="xla")
    ref = generate_vc(bundle, cond, "a test prompt",
                      quantize_decode="int8", **kw)
    out = generate_vc(bundle, cond, "a test prompt",
                      quantize_decode="int8qk", **kw)
    assert out.shape == (5, 16, 32, 3) and np.all(np.isfinite(out))
    corr = np.corrcoef(np.asarray(ref).ravel(),
                       np.asarray(out).ravel())[0, 1]
    assert corr > 0.99, corr


def test_backbone_int8qk_fails_loud():
    from longcat_video_tta_tpu.models import backbones
    from longcat_video_tta_tpu.pipeline.pipeline import (
        ModelBundle, generate_vc,
    )

    cfg = backbones.cogvideox_tiny()
    bundle = ModelBundle.init_random(cfg, seed=0)
    cond = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 5, 16, 32),
                              minval=-1.0, maxval=1.0)
    with pytest.raises(NotImplementedError, match="int8qk"):
        generate_vc(bundle, cond, "a test", num_frames=5,
                    num_inference_steps=2, seed=0, attn_impl="xla",
                    quantize_decode="int8qk")
