"""X-CLIP tower: end-to-end numerical parity against
``transformers.XCLIPModel`` with tiny random weights, and the gate
scorer contract (video-level scoring with 8-frame pad/subsample)."""

import numpy as np
import pytest

import jax.numpy as jnp

from longcat_video_tta_tpu.config import (
    CLIPTextConfig,
    CLIPVisionConfig,
    XCLIPConfig,
)

VCFG = CLIPVisionConfig(width=32, num_layers=2, num_heads=4, patch_size=8,
                        image_size=32, projection_dim=24)
TCFG = CLIPTextConfig(vocab_size=100, width=32, num_layers=2, num_heads=4,
                      max_length=16)
CFG = XCLIPConfig(vision=VCFG, text=TCFG, num_frames=8, mit_layers=1,
                  mit_heads=4, prompt_layers=2, prompt_heads=4)


@pytest.fixture(scope="module")
def hf_and_ours():
    import torch
    from transformers import XCLIPConfig as HFConfig
    from transformers import XCLIPModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        text_config={
            "hidden_size": 32, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "max_position_embeddings": 16, "vocab_size": 100,
            "hidden_act": "quick_gelu", "eos_token_id": 99,
        },
        vision_config={
            "hidden_size": 32, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "image_size": 32, "patch_size": 8, "num_frames": 8,
            "hidden_act": "quick_gelu",
            "mit_hidden_size": 24, "mit_intermediate_size": 96,
            "mit_num_hidden_layers": 1, "mit_num_attention_heads": 4,
        },
        projection_dim=24,
        prompt_layers=2,
        prompt_num_attention_heads=4,
        prompt_hidden_act="quick_gelu",
    )
    model = XCLIPModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    from longcat_video_tta_tpu.models.convert import (
        convert_torch_xclip_state,
    )

    params = convert_torch_xclip_state(sd, CFG)
    return model, params


def test_xclip_scores_match_hf(hf_and_ours):
    import torch

    model, params = hf_and_ours
    rng = np.random.RandomState(1)
    pix = rng.randn(2, 8, 32, 32, 3).astype(np.float32) * 0.5
    ids = rng.randint(3, 98, size=(3, 16)).astype(np.int64)
    ids[:, 0] = 1
    ids[:, -1] = 99  # EOT = vocab max -> argmax pooling matches HF eos

    from longcat_video_tta_tpu.models.xclip import xclip_scores

    ours = np.asarray(xclip_scores(params, CFG, jnp.asarray(pix),
                                   jnp.asarray(ids)))
    with torch.no_grad():
        out = model(
            input_ids=torch.from_numpy(ids),
            pixel_values=torch.from_numpy(pix).permute(0, 1, 4, 2, 3),
        )
        scale = float(model.logit_scale.exp())
        ref = (out.logits_per_video / scale).numpy()
    assert ours.shape == (2, 3)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)


def test_xclip_converter_refuses_unknown_keys(hf_and_ours):
    model, _ = hf_and_ours
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    sd["mit.mystery"] = np.zeros((1,), np.float32)

    from longcat_video_tta_tpu.models.convert import (
        convert_torch_xclip_state,
    )

    with pytest.raises(ValueError, match="unconsumed"):
        convert_torch_xclip_state(sd, CFG)


def test_xclip_gate_scorer(hf_and_ours):
    """ScorerFn contract: video-level score on k sampled frames with
    pad/subsample to num_frames (reference make_hf_xclip_scorer)."""
    _, params = hf_and_ours

    from longcat_video_tta_tpu.config import ClipGateConfig
    from longcat_video_tta_tpu.models.clip import clip_hash_tokenize
    from longcat_video_tta_tpu.models.xclip import make_jax_xclip_scorer
    from longcat_video_tta_tpu.tta.clip_gate import evaluate_clip_gate

    def tok(caption):
        return clip_hash_tokenize(caption, max_length=TCFG.max_length,
                                  vocab_size=TCFG.vocab_size)

    scorer = make_jax_xclip_scorer(params, CFG, tok)
    # fewer frames than num_frames -> pad path
    frames = np.random.RandomState(2).rand(5, 40, 48, 3).astype(np.float32)
    s = scorer(frames, "a dog runs")
    assert s.shape == (1,) and -1.0 <= float(s[0]) <= 1.0
    # more frames -> subsample path
    frames = np.random.RandomState(3).rand(12, 40, 48, 3).astype(np.float32)
    s = scorer(frames, "a dog runs")
    assert s.shape == (1,)

    cfg = ClipGateConfig(enabled=True, backend="xclip", threshold=-10.0,
                         sample_frames=4)
    info = evaluate_clip_gate(frames, "a dog runs", cfg, scorer=scorer)
    assert info["clip_gate_error"] is None and not info["skip_tta"]
