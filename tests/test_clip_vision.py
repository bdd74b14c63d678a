"""CLIP vision tower + dual-encoder scorer: numerical parity against
``transformers.CLIPModel`` with tiny random weights (the converter
validation VERDICT r2 prescribed), plus the TPU-native gate scorer
contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from longcat_video_tta_tpu.config import CLIPTextConfig, CLIPVisionConfig

VCFG = CLIPVisionConfig(width=32, num_layers=2, num_heads=4, patch_size=8,
                        image_size=32, projection_dim=24)
TCFG = CLIPTextConfig(vocab_size=100, width=32, num_layers=2, num_heads=4,
                      max_length=16)


@pytest.fixture(scope="module")
def hf_and_ours():
    from transformers import CLIPConfig, CLIPModel

    import torch

    torch.manual_seed(0)
    hf_cfg = CLIPConfig(
        text_config={
            "hidden_size": 32, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "max_position_embeddings": 16, "vocab_size": 100,
            "hidden_act": "quick_gelu", "eos_token_id": 99,
        },
        vision_config={
            "hidden_size": 32, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "image_size": 32, "patch_size": 8,
            "hidden_act": "quick_gelu",
        },
        projection_dim=24,
    )
    model = CLIPModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    from longcat_video_tta_tpu.models.convert import (
        convert_torch_clip_model_state,
    )

    params = convert_torch_clip_model_state(sd, VCFG, TCFG)
    return model, params


def _ids():
    rng = np.random.RandomState(1)
    ids = rng.randint(3, 98, size=(2, 16)).astype(np.int64)
    ids[:, 0] = 1
    ids[0, 10] = 99  # EOT (= vocab max, so argmax pooling matches HF eos)
    ids[0, 11:] = 0
    ids[1, 14] = 99
    ids[1, 15:] = 0
    return ids


def test_image_embeds_match_hf(hf_and_ours):
    import torch

    model, params = hf_and_ours
    rng = np.random.RandomState(2)
    pix = rng.randn(2, 32, 32, 3).astype(np.float32) * 0.5

    from longcat_video_tta_tpu.models.clip import clip_image_embed

    ours = np.asarray(clip_image_embed(params, VCFG, jnp.asarray(pix)))
    with torch.no_grad():
        ref = model.get_image_features(
            pixel_values=torch.from_numpy(pix).permute(0, 3, 1, 2))
        ref = (ref / ref.norm(dim=-1, keepdim=True)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-4)


def test_text_embeds_match_hf(hf_and_ours):
    import torch

    model, params = hf_and_ours
    ids = _ids()

    from longcat_video_tta_tpu.models.clip import clip_text_embed

    ours = np.asarray(clip_text_embed(params, TCFG, jnp.asarray(ids)))
    with torch.no_grad():
        ref = model.get_text_features(input_ids=torch.from_numpy(ids))
        ref = (ref / ref.norm(dim=-1, keepdim=True)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-4)


def test_converter_refuses_unknown_vision_keys(hf_and_ours):
    model, _ = hf_and_ours
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    sd["vision_model.mystery.weight"] = np.zeros((2,), np.float32)

    from longcat_video_tta_tpu.models.convert import (
        convert_torch_clip_model_state,
    )

    with pytest.raises(ValueError, match="unconsumed"):
        convert_torch_clip_model_state(sd, VCFG, TCFG)


def test_jax_clip_scorer_gate_contract(hf_and_ours):
    """The scorer plugs into evaluate_clip_gate and scores on-device
    (torch-free gate; reference common.py:1806-2012)."""
    _, params = hf_and_ours

    from longcat_video_tta_tpu.config import ClipGateConfig
    from longcat_video_tta_tpu.models.clip import (
        clip_hash_tokenize,
        make_jax_clip_scorer,
    )
    from longcat_video_tta_tpu.tta.clip_gate import evaluate_clip_gate

    def tok(caption):
        return clip_hash_tokenize(caption, max_length=TCFG.max_length,
                                  vocab_size=TCFG.vocab_size)

    scorer = make_jax_clip_scorer(params, VCFG, TCFG, tok)
    frames = np.random.RandomState(3).rand(6, 40, 56, 3).astype(np.float32)
    cfg = ClipGateConfig(enabled=True, threshold=-10.0, sample_frames=3)
    info = evaluate_clip_gate(frames, "a cat on a mat", cfg, scorer=scorer)
    assert info["clip_gate_error"] is None
    assert info["clip_gate_score"] is not None
    assert len(info["clip_gate_scores"]) == 3
    assert not info["skip_tta"]
    # scores are cosine similarities
    assert all(-1.0 <= s <= 1.0 for s in info["clip_gate_scores"])


def test_make_tpu_clip_scorer_from_checkpoint_dir(hf_and_ours, tmp_path):
    """Factory path: HF save_pretrained dir -> converted JAX scorer ->
    gate scoring on-device (run_tta --clip-gate-scorer jax)."""
    model, params = hf_and_ours
    model.save_pretrained(tmp_path)

    from longcat_video_tta_tpu.tta.clip_gate import make_tpu_clip_scorer

    scorer = make_tpu_clip_scorer(str(tmp_path), "clip",
                                  allow_hash_tokenizer=True)
    frames = np.random.RandomState(5).rand(4, 40, 56, 3).astype(np.float32)
    s = scorer(frames, "a boat on water")
    assert s.shape == (4,)
    assert np.all(np.abs(s) <= 1.0)


def test_make_tpu_xclip_scorer_from_checkpoint_dir(tmp_path):
    """Factory path for the xclip backend: HF XCLIPModel
    save_pretrained dir -> converted JAX scorer."""
    import torch
    from transformers import XCLIPConfig as HFXConfig
    from transformers import XCLIPModel

    torch.manual_seed(1)
    hf_cfg = HFXConfig(
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
        projection_dim=24, prompt_layers=2,
        prompt_num_attention_heads=4, prompt_hidden_act="quick_gelu",
    )
    XCLIPModel(hf_cfg).save_pretrained(tmp_path)

    from longcat_video_tta_tpu.tta.clip_gate import make_tpu_clip_scorer

    scorer = make_tpu_clip_scorer(str(tmp_path), "xclip",
                                  allow_hash_tokenizer=True)
    frames = np.random.RandomState(6).rand(5, 40, 48, 3).astype(np.float32)
    s = scorer(frames, "a person dances")
    assert s.shape == (1,) and -1.0 <= float(s[0]) <= 1.0


def test_preprocess_frames_shape_and_range():
    from longcat_video_tta_tpu.models.clip import (
        CLIP_IMAGE_MEAN,
        CLIP_IMAGE_STD,
        preprocess_frames,
    )

    frames = np.random.RandomState(4).rand(3, 50, 90, 3).astype(np.float32)
    out = np.asarray(preprocess_frames(frames, 32))
    assert out.shape == (3, 32, 32, 3)
    # un-normalize back into [0, 1]
    un = out * np.asarray(CLIP_IMAGE_STD) + np.asarray(CLIP_IMAGE_MEAN)
    assert un.min() >= -1e-4 and un.max() <= 1 + 1e-4


def test_tpu_scorer_refuses_hash_tokenizer_by_default(hf_and_ours,
                                                      tmp_path):
    """A checkpoint dir with weights but no tokenizer files must fail
    loud (real converted weights + crc32-random token ids would produce
    meaningless gate scores) unless the synthetic-weights opt-in is
    passed (--clip-gate-hash-tokenizer)."""
    model, _ = hf_and_ours
    model.save_pretrained(tmp_path)

    from longcat_video_tta_tpu.tta.clip_gate import make_tpu_clip_scorer

    with pytest.raises(ValueError, match="tokenizer"):
        make_tpu_clip_scorer(str(tmp_path), "clip")
