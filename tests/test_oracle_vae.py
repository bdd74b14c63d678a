"""VAE converter + forward parity vs an independent torch Wan2.1 oracle.

Closes the second half of VERDICT r3 Missing #1: convert_torch_vae_state
was previously tested for completeness only — a temporal-resample
semantics, RMS-norm, channel-plan, or quant-conv mistake would have
passed every test. Here an independent torch implementation of the
public Wan2.1 VAE (including the upstream per-conv feat-cache chunk
protocol, which defines the causal temporal semantics) runs on random
weights and our converted monolithic + streaming forwards must match it
numerically at fp32.

Reference contract: common.py:158-221 (encode/normalize/denormalize/
decode usage of AutoencoderKLWan).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_oracles import WanVAEOracle  # noqa: E402

from longcat_video_tta_tpu.config import VAEConfig  # noqa: E402
from longcat_video_tta_tpu.models.convert import (  # noqa: E402
    assert_tree_matches,
    convert_torch_vae_state,
)
from longcat_video_tta_tpu.models import vae as jvae  # noqa: E402

CFG = VAEConfig(
    z_dim=4, base_dim=8, dim_mults=(1, 2, 4, 4), num_res_blocks=1,
    temporal_downsample=(False, True, True),
    latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4),
    param_dtype="float32", compute_dtype="float32",
)


@pytest.fixture(scope="module")
def oracle_and_params():
    torch.manual_seed(7)
    model = WanVAEOracle(CFG).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(std=0.15)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_torch_vae_state(sd, CFG)
    assert_tree_matches(params, jvae.init_vae(jax.random.PRNGKey(0), CFG),
                        "vae")
    return model, params


@pytest.mark.parametrize("T", [1, 9, 13])
def test_vae_encode_matches_torch_oracle(oracle_and_params, T):
    model, params = oracle_and_params
    rng = np.random.RandomState(11 + T)
    video = rng.uniform(-1, 1, (1, 3, T, 16, 16)).astype(np.float32)

    with torch.no_grad():
        mu_t, logvar_t = model.encode(torch.from_numpy(video))

    mu, logvar = jvae.vae_encode_moments(params, CFG, jnp.asarray(video))
    assert mu.shape == tuple(mu_t.shape) == (1, 4, 1 + (T - 1) // 4, 2, 2)
    np.testing.assert_allclose(np.asarray(mu), mu_t.numpy(),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(logvar), logvar_t.numpy(),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("L", [1, 3])
def test_vae_decode_matches_torch_oracle(oracle_and_params, L):
    model, params = oracle_and_params
    rng = np.random.RandomState(23 + L)
    z = rng.randn(1, 4, L, 2, 2).astype(np.float32)

    with torch.no_grad():
        pix_t = model.decode(torch.from_numpy(z)).numpy()

    pix = np.asarray(jvae._vae_decode_core(params, CFG, jnp.asarray(z)))
    assert pix.shape == pix_t.shape == (1, 3, 1 + (L - 1) * 4, 16, 16)
    np.testing.assert_allclose(pix, pix_t, atol=2e-4, rtol=2e-4)


def test_vae_streaming_paths_match_torch_oracle(oracle_and_params):
    """The bit-exact streaming encoder/decoder agree with the oracle too
    (they re-implement the upstream cache protocol directly)."""
    model, params = oracle_and_params
    rng = np.random.RandomState(5)
    video = rng.uniform(-1, 1, (1, 3, 13, 16, 16)).astype(np.float32)
    z = rng.randn(1, 4, 4, 2, 2).astype(np.float32)

    with torch.no_grad():
        mu_t, _ = model.encode(torch.from_numpy(video))
        pix_t = model.decode(torch.from_numpy(z)).numpy()

    mu = jvae.vae_encode_streamed(params, CFG, jnp.asarray(video),
                                  normalize=False, chunk_frames=4)
    np.testing.assert_allclose(np.asarray(mu), mu_t.numpy(),
                               atol=2e-4, rtol=2e-4)

    pix = jvae.vae_decode_streamed(params, CFG, jnp.asarray(z),
                                   denormalize=False, chunk_latents=2)
    expect = np.clip((pix_t + 1.0) / 2.0, 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(pix), expect, atol=2e-4, rtol=2e-4)
