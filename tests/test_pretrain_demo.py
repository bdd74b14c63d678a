"""Pretraining pipeline smoke (VERDICT r4 #3): the demo-stack pretrain
script runs end-to-end at tiny geometry, the saved bundle carries its
RE-ESTIMATED latent statistics, and load_converted_bundle restores
them (the demo campaign's normalize/denormalize contract)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts"))


@pytest.mark.slow
def test_pretrain_smoke_and_bundle_roundtrip(tmp_path):
    from pretrain_demo import main as pretrain_main

    from longcat_video_tta_tpu.config import get_model_config
    from longcat_video_tta_tpu.models.convert import load_converted_bundle

    out = str(tmp_path / "ckpt")
    hist = pretrain_main(["--smoke", "--out-dir", out])
    phases = {h["phase"] for h in hist}
    assert phases == {"vae", "dit"}
    assert os.path.exists(os.path.join(out, "PROVENANCE.json"))

    cfg = get_model_config("longcat_tiny")
    bundle = load_converted_bundle(out, cfg)
    # the bundle's own statistics override the preset's
    assert bundle.cfg.vae.latents_mean != cfg.vae.latents_mean
    meta = json.load(open(os.path.join(out, "model_config.json")))
    np.testing.assert_allclose(bundle.cfg.vae.latents_std,
                               meta["vae"]["latents_std"])
    # and the stack is runnable: encode -> normalized latents with the
    # new stats have ~unit scale on the training distribution
    from pretrain_demo import batch_clips

    rng = np.random.RandomState(3)
    x = batch_clips(rng, 1, 5, 16, 32)
    z = np.asarray(bundle.encode_video(x))
    assert np.isfinite(z).all()
    assert 0.2 < np.abs(z).mean() < 3.0
