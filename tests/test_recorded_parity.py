"""Numerical parity vs RECORDED reference activations.

Companion to scripts/record_activations.py (run on the machine holding
the upstream torch checkpoint): replays the recorded inputs through our
converted-weight modules and compares outputs. Skipped unless both
LONGCAT_PARITY_DIR (the .npz recordings) and LONGCAT_CONVERTED_DIR (an
orbax bundle from scripts/convert_checkpoint.py on the same checkpoint)
are set — zero-egress CI has neither, but the harness is the documented
route to real-weight parity (SURVEY.md §7 hard-part 1; VERDICT r1
"golden tests are self-referential").

Tolerances: bf16 matmuls accumulate ~1e-2 absolute error at unit-scale
activations over 48 blocks; the fp32 VAE/text paths sit at ~1e-4.
"""

import os

import numpy as np
import pytest

PARITY_DIR = os.environ.get("LONGCAT_PARITY_DIR")
CONVERTED_DIR = os.environ.get("LONGCAT_CONVERTED_DIR")

pytestmark = pytest.mark.skipif(
    not (PARITY_DIR and CONVERTED_DIR
         and os.path.isdir(PARITY_DIR) and os.path.isdir(CONVERTED_DIR)),
    reason="set LONGCAT_PARITY_DIR + LONGCAT_CONVERTED_DIR to run "
           "recorded-activation parity (see scripts/record_activations.py)",
)


@pytest.fixture(scope="module")
def bundle():
    from longcat_video_tta_tpu.config import get_model_config
    from longcat_video_tta_tpu.models.convert import load_converted_bundle

    return load_converted_bundle(CONVERTED_DIR,
                                 get_model_config("longcat_13b"))


def _rec(name):
    path = os.path.join(PARITY_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not recorded")
    return np.load(path)


def test_dit_forward_parity(bundle):
    import jax.numpy as jnp

    from longcat_video_tta_tpu.models.dit import dit_forward

    r = _rec("dit_forward.npz")
    out = dit_forward(
        bundle.dit_params, bundle.cfg.dit,
        jnp.asarray(r["latents"]), jnp.asarray(r["timesteps"]),
        jnp.asarray(r["text"]), jnp.asarray(r["mask"]),
        num_cond_latents=int(r["num_cond_latents"]),
    )
    np.testing.assert_allclose(np.asarray(out), r["output"],
                               atol=5e-2, rtol=5e-2)


def test_vae_parity(bundle):
    import jax.numpy as jnp

    from longcat_video_tta_tpu.models import vae as V

    enc = _rec("vae_encode.npz")
    # recorded latents are UN-normalized (latent_dist.mode); ours
    # normalizes — compare in the recorded space
    lat = V.vae_encode(bundle.vae_params, bundle.cfg.vae,
                       jnp.asarray(enc["pixels"]))
    mean = jnp.asarray(enc["latents_mean"]).reshape(1, -1, 1, 1, 1)
    std = jnp.asarray(enc["latents_std"]).reshape(1, -1, 1, 1, 1)
    lat_unnorm = lat * std + mean
    np.testing.assert_allclose(np.asarray(lat_unnorm), enc["latents"],
                               atol=1e-3, rtol=1e-3)

    dec = _rec("vae_decode.npz")
    norm = (jnp.asarray(dec["latents"]) - mean) / std
    px = V.vae_decode(bundle.vae_params, bundle.cfg.vae, norm)
    # ours returns [0,1]; recording is [-1,1]
    np.testing.assert_allclose(np.asarray(px) * 2 - 1, dec["pixels"],
                               atol=1e-3, rtol=1e-3)


def test_text_encoder_parity(bundle):
    import jax.numpy as jnp

    from longcat_video_tta_tpu.models.umt5 import umt5_encode

    r = _rec("text_encode.npz")
    h = umt5_encode(bundle.text_params, bundle.cfg.text,
                    jnp.asarray(r["input_ids"]), jnp.asarray(r["mask"]))
    np.testing.assert_allclose(np.asarray(h), r["hidden"],
                               atol=2e-2, rtol=2e-2)
