"""Data layer + eval metrics + CLIP gate + retrieval + frechet math."""

import os

import numpy as np
import pytest

from longcat_video_tta_tpu.config import CaptionGuardConfig, ClipGateConfig
from longcat_video_tta_tpu.data import (
    analyze_caption_quality,
    apply_fixed_caption,
    build_retrieval_pool,
    load_video_frames,
    load_video_list,
    normalize_caption,
    save_video,
    validate_caption_quality,
)
from longcat_video_tta_tpu.data.augment import (
    build_augmented_pixel_variants, speed_clip,
)
from longcat_video_tta_tpu.config import AugmentationConfig
from longcat_video_tta_tpu.eval import (
    OnlineFrechetAccumulator,
    compute_psnr,
    compute_ssim,
    evaluate_generation_metrics,
    frechet_distance,
    pad_for_i3d,
)
from longcat_video_tta_tpu.runners.run_tta import make_synthetic_dataset
from longcat_video_tta_tpu.tta.clip_gate import (
    evaluate_clip_gate,
    sample_clip_frame_offsets,
    summarize_clip_gate_stats,
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    return make_synthetic_dataset(str(d), 4, 32, 48, frames=40, seed=0)


def test_load_video_list_and_frames(dataset):
    entries = load_video_list(dataset, max_videos=3, seed=0)
    assert len(entries) == 3
    assert all(e["caption"] for e in entries)
    px = load_video_frames(entries[0]["path"], 8, 32, 48, start_frame=4)
    assert px.shape == (1, 3, 8, 32, 48)
    assert px.min() >= -1.0 and px.max() <= 1.0


def test_caption_normalization():
    assert normalize_caption("['a cat', 'b']") == "a cat"
    assert normalize_caption("  hello   world ") == "hello world"
    assert normalize_caption(None) == ""


def test_caption_guard_fail_on_fixed_caption(dataset):
    entries = load_video_list(dataset, max_videos=4, seed=0)
    apply_fixed_caption(entries, "same caption everywhere")
    with pytest.raises(RuntimeError):
        validate_caption_quality(entries, CaptionGuardConfig(mode="fail"))
    # warn mode passes through
    stats = validate_caption_quality(entries, CaptionGuardConfig(mode="warn"))
    assert stats["unique_ratio"] < 0.5


def test_psnr_ssim_behavior():
    rng = np.random.RandomState(0)
    a = rng.rand(4, 32, 32, 3).astype(np.float32)
    assert compute_psnr(a, a) == 50.0  # clamp on identical
    assert compute_ssim(a, a) > 0.99
    noisy = np.clip(a + rng.randn(*a.shape) * 0.1, 0, 1).astype(np.float32)
    m = evaluate_generation_metrics(a, noisy)
    assert 10 < m["psnr"] < 30
    assert 0 < m["ssim"] < 1
    assert np.isnan(m["lpips"])  # no feature model -> NaN fallback


def test_frechet_zero_for_identical_distributions():
    rng = np.random.RandomState(0)
    feats = rng.randn(500, 16)
    mu, cov = feats.mean(0), np.cov(feats.T)
    assert frechet_distance(mu, cov, mu, cov) < 1e-6
    shifted = feats + 3.0
    d = frechet_distance(mu, cov, shifted.mean(0), np.cov(shifted.T))
    assert d > 100


def test_online_frechet_accumulator_with_stub_features():
    def feat(frames):
        base = np.full(400, frames.mean())
        return base + np.linspace(0, 1, 400) * frames.std()

    acc = OnlineFrechetAccumulator(video_feature_fn=feat, min_videos=2)
    rng = np.random.RandomState(0)
    for _ in range(8):
        a = rng.rand(5, 16, 16, 3)
        acc.update(a, a + rng.rand() * 0.01)
    out = acc.compute()
    assert out["num_videos"] == 8
    assert out["fvd"] is not None and out["fvd"] >= 0


def test_online_frechet_state_roundtrip(tmp_path):
    """save_state/load_state: a resumed accumulator must produce the
    SAME FVD as one that saw every pair (review r3c: resume previously
    restarted the moments, silently scoring only the post-crash tail)."""
    def feat(frames):
        return np.full(400, frames.mean()) + np.linspace(0, 1, 400)

    rng = np.random.RandomState(0)
    pairs = [(rng.rand(5, 8, 8, 3), rng.rand(5, 8, 8, 3))
             for _ in range(6)]
    full = OnlineFrechetAccumulator(video_feature_fn=feat, min_videos=2)
    for a, b in pairs:
        full.update(a, b)

    p = str(tmp_path / "fvd_state.npz")
    first = OnlineFrechetAccumulator(video_feature_fn=feat, min_videos=2)
    for a, b in pairs[:3]:
        first.update(a, b)
    first.save_state(p, next_idx=3)
    resumed = OnlineFrechetAccumulator(video_feature_fn=feat, min_videos=2)
    assert resumed.load_state(p) == 3  # the saved checkpoint cursor
    for a, b in pairs[3:]:
        resumed.update(a, b)
    f, r = full.compute(), resumed.compute()
    assert r["num_videos"] == f["num_videos"] == 6
    assert r["fvd"] == pytest.approx(f["fvd"], rel=1e-9)
    # missing file: load returns None, accumulator untouched
    fresh = OnlineFrechetAccumulator(video_feature_fn=feat)
    assert fresh.load_state(str(tmp_path / "nope.npz")) is None


def test_pad_for_i3d():
    assert pad_for_i3d(np.zeros((3, 8, 8, 3))).shape[0] == 9
    assert pad_for_i3d(np.zeros((12, 8, 8, 3))).shape[0] == 12


def test_clip_gate_with_stub_scorer():
    frames = np.random.RandomState(0).rand(10, 16, 16, 3)
    cfg = ClipGateConfig(enabled=True, threshold=0.5, sample_frames=4)
    low = evaluate_clip_gate(frames, "x", cfg,
                             scorer=lambda f, c: np.full(len(f), 0.1))
    assert low["skip_tta"] and low["clip_gate_score"] == pytest.approx(0.1)
    high = evaluate_clip_gate(frames, "x", cfg,
                              scorer=lambda f, c: np.full(len(f), 0.9))
    assert not high["skip_tta"]
    # log-only never skips
    log_cfg = ClipGateConfig(enabled=True, threshold=0.5, log_only=True)
    lo = evaluate_clip_gate(frames, "x", log_cfg,
                            scorer=lambda f, c: np.full(4, 0.1))
    assert not lo["skip_tta"]
    # fail-open on scorer error
    open_cfg = ClipGateConfig(enabled=True, fail_open=True)
    e = evaluate_clip_gate(frames, "x", open_cfg, scorer=None)
    assert not e["skip_tta"] and e["clip_gate_error"]
    closed_cfg = ClipGateConfig(enabled=True, fail_open=False)
    e2 = evaluate_clip_gate(frames, "x", closed_cfg, scorer=None)
    assert e2["skip_tta"]
    stats = summarize_clip_gate_stats([low, high, lo, e, e2])
    assert stats["num_evaluated"] == 5 and stats["num_skipped"] == 2


def test_clip_gate_offset_sampling():
    cfg = ClipGateConfig(sample_frames=4)
    offs = sample_clip_frame_offsets(20, cfg)
    assert len(offs) == 4 and offs[0] == 0 and offs[-1] == 19
    late = ClipGateConfig(sample_frames=4, sampling_mode="late_only",
                          late_fraction=0.25)
    offs = sample_clip_frame_offsets(20, late)
    assert all(o >= 15 for o in offs)


def test_retrieval_pool_excludes_query():
    entries = [
        {"path": f"/v/{i}.mp4", "caption": c, "category": ""}
        for i, c in enumerate([
            "a dog running in a park",
            "a dog playing in a park",
            "a rocket launching into space",
            "stock market charts on a screen",
        ])
    ]
    pool = build_retrieval_pool(entries)
    nbs = pool.neighbors("a dog running in a park", "/v/0.mp4", k=2)
    assert all(n["path"] != "/v/0.mp4" for n in nbs)
    assert nbs[0]["path"] == "/v/1.mp4"  # nearest is the other dog video


def test_augmentation_variants():
    frames = np.random.RandomState(0).rand(8, 16, 24, 3).astype(np.float32)
    cfg = AugmentationConfig(enabled=True, hflip=True,
                             rotate_degrees=(10.0,), speed_factors=(2.0,))
    vs = build_augmented_pixel_variants(frames, cfg)
    names = [v["name"] for v in vs]
    assert names[0] == "orig" and "hflip" in names
    assert all(v["frames"].shape == frames.shape for v in vs)
    np.testing.assert_allclose(vs[1]["frames"], frames[:, :, ::-1])
    sp = speed_clip(frames, 2.0)
    np.testing.assert_allclose(sp[1], frames[2])


def test_save_video_npy_fallback(tmp_path):
    frames = np.random.RandomState(0).rand(4, 16, 16, 3)
    path = save_video(frames, str(tmp_path / "out.npy"))
    assert os.path.exists(path)


def test_decode_frames_fps_subsample(tmp_path):
    """target_fps subsamples by stride (reference baseline loads at
    15 fps, run_baseline.py:85-118); npy clips assume 24 fps native."""
    import numpy as np

    from longcat_video_tta_tpu.data.video_io import decode_frames

    arr = np.arange(48, dtype=np.uint8)[:, None, None, None] * np.ones(
        (1, 4, 4, 3), np.uint8)
    p = str(tmp_path / "clip.npy")
    np.save(p, arr)
    # 24 fps native -> 12 fps target = stride 2. start_frame counts
    # SUBSAMPLED frames (the reference subsamples first, then indexes —
    # run_baseline.py:396-403): arr[::2][1:7] = [2, 4, ...]
    out = decode_frames(p, 6, start_frame=1, target_fps=12.0)
    assert out[:, 0, 0, 0].tolist() == [2, 4, 6, 8, 10, 12]
    # no target_fps: consecutive
    out = decode_frames(p, 4, start_frame=2)
    assert out[:, 0, 0, 0].tolist() == [2, 3, 4, 5]
    # the property the timebase exists for: a cond window ending at the
    # anchor and GT starting at the anchor never overlap under fps
    # subsampling (review r3c: native-frame start indexing leaked
    # future GT frames into conditioning)
    g, c = 8, 5
    cond = decode_frames(p, c, start_frame=g - c, target_fps=12.0)
    gt = decode_frames(p, 4, start_frame=g, target_fps=12.0)
    assert cond[:, 0, 0, 0].max() < gt[:, 0, 0, 0].min()
    # contiguity across the anchor: cond's last + stride == gt's first
    assert cond[-1, 0, 0, 0] + 2 == gt[0, 0, 0, 0]


def test_decode_all_frames_no_pad_and_stride(tmp_path):
    """decode_all_frames decodes to EOF without the pad-last tail of
    decode_frames (metadata frame counts can overcount; padded
    duplicate frames bias the temporal VBench dimensions and exported
    num_frames stamps)."""
    import numpy as np

    from longcat_video_tta_tpu.data.video_io import decode_all_frames

    arr = np.arange(7, dtype=np.uint8)[:, None, None, None] * np.ones(
        (1, 4, 4, 3), np.uint8)
    p = str(tmp_path / "clip.npy")
    np.save(p, arr)
    out = decode_all_frames(p)
    assert out.shape == (7, 4, 4, 3)
    assert out[:, 0, 0, 0].tolist() == [0, 1, 2, 3, 4, 5, 6]
    # 24 fps native -> 12 target = stride 2, still no pad
    out = decode_all_frames(p, target_fps=12.0)
    assert out[:, 0, 0, 0].tolist() == [0, 2, 4, 6]
