"""Weight converters: UMT5 parity vs the real transformers model, VAE
completeness on a synthetic WAN-style state_dict.

The UMT5 test is a *cross-implementation* check (not a self-referential
golden): it instantiates HF ``UMT5EncoderModel`` with random weights on
CPU, converts its state_dict, and requires output parity — validating
both the converter mapping and our encoder math (rel-pos buckets,
gated-GELU, T5 no-scale attention, RMSNorm).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longcat_video_tta_tpu.config import TextEncoderConfig, VAEConfig
from longcat_video_tta_tpu.models.convert import (
    assert_tree_matches,
    convert_torch_umt5_state,
    convert_torch_vae_state,
)
from longcat_video_tta_tpu.models.umt5 import init_umt5, umt5_encode
from longcat_video_tta_tpu.models.vae import init_vae, vae_decode, vae_encode

TEXT_CFG = TextEncoderConfig(
    vocab_size=512, d_model=64, d_kv=16, num_heads=4, d_ff=128,
    num_layers=3, param_dtype="float32", compute_dtype="float32",
    max_length=24,
)


def test_umt5_converter_matches_transformers():
    torch = pytest.importorskip("torch")
    tr = pytest.importorskip("transformers")

    hf_cfg = tr.UMT5Config(
        vocab_size=TEXT_CFG.vocab_size, d_model=TEXT_CFG.d_model,
        d_kv=TEXT_CFG.d_kv, num_heads=TEXT_CFG.num_heads,
        d_ff=TEXT_CFG.d_ff, num_layers=TEXT_CFG.num_layers,
        relative_attention_num_buckets=(
            TEXT_CFG.relative_attention_num_buckets),
        relative_attention_max_distance=(
            TEXT_CFG.relative_attention_max_distance),
        feed_forward_proj="gated-gelu", dropout_rate=0.0,
        is_encoder_decoder=False, use_cache=False,
    )
    torch.manual_seed(0)
    model = tr.UMT5EncoderModel(hf_cfg).eval()

    rng = np.random.RandomState(0)
    ids = rng.randint(1, TEXT_CFG.vocab_size, (2, TEXT_CFG.max_length))
    mask = np.ones_like(ids)
    mask[0, 17:] = 0
    ids = ids * mask

    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_torch_umt5_state(sd, TEXT_CFG)
    assert_tree_matches(params, init_umt5(jax.random.PRNGKey(0), TEXT_CFG),
                        "umt5")
    out = np.asarray(umt5_encode(params, TEXT_CFG, jnp.asarray(ids),
                                 jnp.asarray(mask)))

    # compare valid (unmasked) positions — HF zeroes nothing, but padded
    # queries still attend identically, so compare everything
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# VAE converter: synthetic WAN-layout state_dict
# ---------------------------------------------------------------------------

VAE_CFG = VAEConfig(z_dim=4, base_dim=8, dim_mults=(1, 2, 2),
                    num_res_blocks=1, temporal_downsample=(False, True),
                    latents_mean=(0.0,) * 4, latents_std=(1.0,) * 4)

from synth_checkpoints import make_dit_sd, make_umt5_sd, make_vae_sd


def test_vae_converter_complete_and_runs():
    sd = make_vae_sd(VAE_CFG)
    params = convert_torch_vae_state(sd, VAE_CFG)
    ref = init_vae(jax.random.PRNGKey(0), VAE_CFG)
    assert_tree_matches(params, ref, "vae")

    # converted weights run end-to-end (encode -> decode) with the right
    # temporal contraction
    px = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 5, 16, 16),
                            minval=-1.0, maxval=1.0)
    z = vae_encode(params, VAE_CFG, px)
    # T=5 -> 1+(5-1)/2 = 3 (one tdown); spatial /4 (two sdowns)
    assert z.shape == (1, 4, 3, 4, 4)
    out = vae_decode(params, VAE_CFG, z)
    assert out.shape == (1, 3, 5, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_vae_converter_raises_on_missing_key():
    sd = make_vae_sd(VAE_CFG)
    del sd["decoder.head.2.weight"]
    with pytest.raises(KeyError):
        convert_torch_vae_state(sd, VAE_CFG)


def test_convert_checkpoint_script_end_to_end(tmp_path):
    """Full converter CLI: all three components from torch .bin shards ->
    orbax bundle -> load_converted_bundle; partial conversion fails
    without --allow-partial (ADVICE r1 medium)."""
    import os
    import subprocess
    import sys

    torch = pytest.importorskip("torch")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    from longcat_video_tta_tpu.config import longcat_tiny
    from longcat_video_tta_tpu.models.convert import load_converted_bundle

    cfg = longcat_tiny()
    src = tmp_path / "ckpt"
    for sub, sd in (("dit", make_dit_sd(cfg.dit)),
                    ("vae", make_vae_sd(cfg.vae)),
                    ("text_encoder", make_umt5_sd(cfg.text))):
        (src / sub).mkdir(parents=True)
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
                   src / sub / "model.bin")

    script = "scripts/convert_checkpoint.py"
    out = tmp_path / "bundle"
    r = subprocess.run(
        [sys.executable, script, "--torch-checkpoint-dir", str(src),
         "--output-dir", str(out), "--preset", "longcat_tiny"],
        capture_output=True, text=True, cwd="/root/repo", env=env)
    assert r.returncode == 0, r.stderr[-2000:]

    import json
    meta = json.loads((out / "model_config.json").read_text())
    assert set(meta["converted_components"]) == {"dit", "vae",
                                                 "text_encoder"}
    bundle = load_converted_bundle(str(out), cfg)
    assert bundle.dit_params is not None

    # partial checkpoint: strict mode fails, --allow-partial succeeds
    import shutil

    shutil.rmtree(src / "vae")
    r = subprocess.run(
        [sys.executable, script, "--torch-checkpoint-dir", str(src),
         "--output-dir", str(tmp_path / "b2"), "--preset", "longcat_tiny"],
        capture_output=True, text=True, cwd="/root/repo", env=env)
    assert r.returncode != 0 and "allow-partial" in (r.stdout + r.stderr)
    r = subprocess.run(
        [sys.executable, script, "--torch-checkpoint-dir", str(src),
         "--output-dir", str(tmp_path / "b3"), "--preset", "longcat_tiny",
         "--allow-partial"],
        capture_output=True, text=True, cwd="/root/repo", env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    meta = json.loads(
        (tmp_path / "b3" / "model_config.json").read_text())
    assert "vae" not in meta["converted_components"]


def test_assert_tree_matches_catches_gaps():
    ref = init_umt5(jax.random.PRNGKey(0), TEXT_CFG)
    broken = dict(ref)
    broken.pop("final_ln")
    with pytest.raises(ValueError, match="missing"):
        assert_tree_matches(broken, ref, "umt5")
