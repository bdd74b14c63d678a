"""DiT converter parity vs an independent torch oracle.

Closes the highest-risk link in the real-weight parity chain (VERDICT r3
Missing #1): convert_torch_dit_state was previously tested for shape
completeness only — a fused-qkv order, adaLN chunk-order, RoPE
convention, or t_embedder frequency mistake would have passed every
test. Here a torch implementation of the documented LongCat conventions
(tests/torch_oracles.py) runs on random weights and our converted
forward must match it numerically at fp32.

Reference contract: run_delta_a.py:134-217, common.py:46-96.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_oracles import LongCatDiTOracle  # noqa: E402

from longcat_video_tta_tpu.config import DiTConfig  # noqa: E402
from longcat_video_tta_tpu.models.convert import (  # noqa: E402
    assert_tree_matches,
    convert_torch_dit_state,
)
from longcat_video_tta_tpu.models.dit import dit_forward, init_dit  # noqa: E402

CFG = DiTConfig(
    hidden_size=64, depth=2, num_heads=4, in_channels=4, out_channels=4,
    patch_size=(1, 2, 2), adaln_tembed_dim=32, ffn_dim=96, text_dim=40,
    text_len=12, rope_dims=(4, 6, 6), t_embed_freq_dim=16,
    param_dtype="float32", compute_dtype="float32", remat=False,
)


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    B, L = 2, CFG.text_len
    latents = rng.randn(B, CFG.in_channels, 3, 8, 8).astype(np.float32)
    # per-latent-frame timesteps: cond frame at 0, noise frames at sigma*1000
    timesteps = np.array([[0.0, 437.0, 850.0],
                          [0.0, 12.5, 999.0]], np.float32)
    text = rng.randn(B, L, CFG.text_dim).astype(np.float32)
    mask = np.ones((B, L), np.float32)
    mask[0, 7:] = 0.0
    mask[1, 10:] = 0.0
    return latents, timesteps, text, mask


@pytest.mark.parametrize("rope_interleaved", [False, True])
@pytest.mark.parametrize("num_cond_latents", [0, 1])
def test_dit_converter_matches_torch_oracle(rope_interleaved,
                                            num_cond_latents):
    torch.manual_seed(3)
    model = LongCatDiTOracle(CFG, rope_interleaved=rope_interleaved).eval()
    latents, timesteps, text, mask = _inputs()

    with torch.no_grad():
        ref = model(
            torch.from_numpy(latents), torch.from_numpy(timesteps),
            torch.from_numpy(text), torch.from_numpy(mask),
            num_cond_latents=num_cond_latents,
        ).numpy()

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_torch_dit_state(sd, CFG,
                                     rope_interleaved=rope_interleaved)
    assert_tree_matches(params, init_dit(jax.random.PRNGKey(0), CFG), "dit")

    out = np.asarray(dit_forward(
        params, CFG, jnp.asarray(latents), jnp.asarray(timesteps),
        jnp.asarray(text), jnp.asarray(mask),
        num_cond_latents=num_cond_latents, attn_impl="xla",
    ))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_dit_converter_scalar_timestep_and_linear_xembed():
    """Scalar [B] timesteps broadcast per frame; a Linear x_embedder.proj
    (the alternative upstream layout) converts too."""
    torch.manual_seed(5)
    model = LongCatDiTOracle(CFG).eval()
    latents, _, text, mask = _inputs(seed=1)
    t_scalar = np.array([250.0, 990.0], np.float32)

    with torch.no_grad():
        ref = model(
            torch.from_numpy(latents), torch.from_numpy(t_scalar),
            torch.from_numpy(text), torch.from_numpy(mask),
        ).numpy()

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    # re-express the conv patch embed as the equivalent Linear layout
    # [D, (pt ph pw C)] and convert that form
    w = sd.pop("x_embedder.proj.weight")
    sd["x_embedder.proj.weight"] = \
        w.transpose(2, 3, 4, 1, 0).reshape(-1, w.shape[0]).T
    params = convert_torch_dit_state(sd, CFG)

    out = np.asarray(dit_forward(
        params, CFG, jnp.asarray(latents), jnp.asarray(t_scalar),
        jnp.asarray(text), jnp.asarray(mask), attn_impl="xla",
    ))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)
