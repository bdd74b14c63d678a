"""Causal 3D VAE: shapes, temporal causality, latent normalization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longcat_video_tta_tpu.config import longcat_tiny
from longcat_video_tta_tpu.models import vae as V

CFG = longcat_tiny().vae


@pytest.fixture(scope="module")
def setup():
    params = V.init_vae(jax.random.PRNGKey(0), CFG)
    video = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 13, 32, 48),
                               minval=-1.0, maxval=1.0)
    return params, video


def test_encode_shape(setup):
    params, video = setup
    z = V.vae_encode(params, CFG, video)
    # T_lat = 1 + (13-1)/4 = 4; spatial /8
    assert z.shape == (1, CFG.z_dim, 4, 4, 6)


def test_decode_shape_and_range(setup):
    params, video = setup
    z = V.vae_encode(params, CFG, video)
    out = V.vae_decode(params, CFG, z)
    assert out.shape == (1, 3, 13, 32, 48)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0


def test_single_frame_roundtrip(setup):
    """T=1 must map to T_lat=1 and back (image-as-video causal property)."""
    params, _ = setup
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 1, 32, 48))
    z = V.vae_encode(params, CFG, img)
    assert z.shape[2] == 1
    out = V.vae_decode(params, CFG, z)
    assert out.shape[2] == 1


def test_encoder_prefix_consistency(setup):
    """Chunk-aligned prefix causality: encoding the first 1+4k pixel frames
    gives the same latents as slicing the full encoding — the property that
    makes conditioning-window encoding independent of what follows (the
    reference encodes cond windows in isolation, common.py:158-174)."""
    params, video = setup
    z_full = V.vae_encode(params, CFG, video)          # 13 frames -> 4 lat
    z_pref = V.vae_encode(params, CFG, video[:, :, :9])  # 9 frames -> 3 lat
    np.testing.assert_allclose(np.asarray(z_full[:, :, :3]),
                               np.asarray(z_pref), atol=1e-4)


def test_decoder_prefix_consistency(setup):
    """Decoding a latent prefix matches the prefix of the full decode."""
    params, video = setup
    z = V.vae_encode(params, CFG, video)
    full = V.vae_decode(params, CFG, z)
    pref = V.vae_decode(params, CFG, z[:, :, :3])
    np.testing.assert_allclose(np.asarray(full[:, :, :9]),
                               np.asarray(pref), atol=1e-4)


def test_normalize_roundtrip():
    z = jax.random.normal(jax.random.PRNGKey(3), (1, CFG.z_dim, 2, 4, 4))
    z2 = V.denormalize_latents(CFG, V.normalize_latents(CFG, z))
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-5)


def test_latent_len():
    assert V.latent_len(1) == 1
    assert V.latent_len(13) == 4
    assert V.latent_len(14) == 4
    assert V.latent_len(93) == 24


def test_chunked_decode_close_to_full(setup):
    """Sliding-window decode must match the monolithic decode within the
    receptive-field approximation (context >= decoder temporal RF)."""
    params, video = setup
    z = V.vae_encode(params, CFG, video)  # 4 latents
    full = V.vae_decode(params, CFG, z)
    chunked = V.vae_decode(params, CFG, z, chunk_latents=1,
                           context_latents=3)
    assert chunked.shape == full.shape
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               atol=5e-2)
    err = float(jnp.mean(jnp.abs(chunked - full)))
    assert err < 5e-3, f"mean decode chunking error {err}"


def test_streamed_decode_bit_exact(setup):
    """Feature-cache streaming decode must equal the monolithic decode
    exactly (unlike the sliding-window path, which is approximate)."""
    params, video = setup
    z = V.vae_encode(params, CFG, video)  # 4 latents
    full = V.vae_decode(params, CFG, z, chunk_latents=100)  # monolithic
    for chunk in (1, 2, 3):
        streamed = V.vae_decode_streamed(params, CFG, z,
                                         chunk_latents=chunk)
        assert streamed.shape == full.shape
        np.testing.assert_allclose(np.asarray(streamed), np.asarray(full),
                                   atol=2e-5,
                                   err_msg=f"chunk_latents={chunk}")


def test_streamed_encode_bit_exact(setup):
    """Feature-cache streaming encode must equal the monolithic encode."""
    params, video = setup  # 13 frames
    full = V.vae_encode(params, CFG, video)
    for chunk in (4, 8):
        streamed = V.vae_encode_streamed(params, CFG, video,
                                         chunk_frames=chunk)
        assert streamed.shape == full.shape
        np.testing.assert_allclose(np.asarray(streamed), np.asarray(full),
                                   atol=2e-5, err_msg=f"chunk={chunk}")


def test_streamed_encode_ragged_window(setup):
    """Non-4k+1 windows (e.g. the cond14 TTA window) stream exactly too —
    the strided-conv carry keeps phase across arbitrary chunk sizes."""
    params, _ = setup
    video = jax.random.uniform(jax.random.PRNGKey(9), (1, 3, 14, 32, 48),
                               minval=-1.0, maxval=1.0)
    full = V.vae_encode(params, CFG, video)
    streamed = V.vae_encode_streamed(params, CFG, video, chunk_frames=4)
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(full),
                               atol=2e-5)
