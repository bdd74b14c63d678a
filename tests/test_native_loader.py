"""C++ prefetch loader: build, ordering, decode parity vs python path."""

import numpy as np
import pytest

from longcat_video_tta_tpu.data.native_loader import ClipPrefetcher, _build_lib


@pytest.fixture(scope="module")
def clips(tmp_path_factory):
    d = tmp_path_factory.mktemp("clips")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(5):
        arr = (rng.rand(10, 24, 40, 3) * 255).astype(np.uint8)
        p = str(d / f"c{i}.npy")
        np.save(p, arr)
        paths.append(p)
    return paths


def test_native_lib_builds():
    assert _build_lib() is not None, "g++ build of prefetch.cpp failed"


def test_native_prefetch_order_and_shape(clips):
    pf = ClipPrefetcher(clips, num_frames=6, start_frame=2, height=16,
                        width=32, workers=3)
    assert pf._native
    out = list(pf)
    assert [i for i, _ in out] == list(range(5))
    for _, clip in out:
        assert clip.shape == (3, 6, 16, 32)
        assert clip.dtype == np.float32
        assert -1.0 <= clip.min() and clip.max() <= 1.0


def test_native_matches_python_loader(clips):
    native = dict(ClipPrefetcher(clips, 6, 2, 16, 32))
    python = dict(ClipPrefetcher(clips, 6, 2, 16, 32, force_python=True))
    for i in range(5):
        # both bilinear-resize; interpolation differs slightly (cv2 vs
        # hand-rolled), so compare loosely but require high correlation
        a, b = native[i], python[i]
        assert a.shape == b.shape
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > 0.98, f"clip {i} corr {corr}"


def test_pad_last_frame_semantics(clips):
    # request more frames than exist after start: last frame repeats
    pf = ClipPrefetcher(clips[:1], num_frames=6, start_frame=8, height=16,
                        width=32)
    _, clip = next(iter(pf))
    np.testing.assert_allclose(clip[:, 2], clip[:, 5])  # padded region


def test_native_mp4_decode_matches_python_loader(tmp_path):
    """mp4 path: the libav-built prefetcher must match the Python cv2
    loader closely (same libav lineage; bilinear resize) and honor the
    start-skip + pad-last-frame contract (common.py:121-133)."""
    import cv2

    from longcat_video_tta_tpu.data.native_loader import (
        ClipPrefetcher,
        _build_lib,
    )
    from longcat_video_tta_tpu.data.video_io import load_video_frames

    lib = _build_lib()
    if lib is None or not lib.pf_has_libav():
        pytest.skip("libav build unavailable")

    T, H, W = 12, 48, 64
    rng = np.random.RandomState(0)
    frames = (rng.rand(T, H, W, 3) * 255).astype(np.uint8)
    for t in range(T):
        frames[t] = cv2.GaussianBlur(frames[t], (11, 11), 5)
    path = str(tmp_path / "clip.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (W, H))
    for t in range(T):
        vw.write(cv2.cvtColor(frames[t], cv2.COLOR_RGB2BGR))
    vw.release()

    pf = ClipPrefetcher([path], 8, 2, 32, 48)
    assert pf._native
    idx, clip = next(iter(pf))
    assert idx == 0 and clip.shape == (3, 8, 32, 48)
    ref = np.asarray(load_video_frames(path, 8, 32, 48, start_frame=2)[0])
    err = np.abs(clip - ref)
    assert err.mean() < 0.03 and err.max() < 0.4

    # pad-last-frame beyond EOF
    _, clip2 = next(iter(ClipPrefetcher([path], 16, 2, 32, 48)))
    np.testing.assert_array_equal(clip2[:, 10], clip2[:, 15])


def test_prefetch_target_fps_matches_video_io(clips, tmp_path):
    """target_fps must produce the same frame selection as
    video_io.load_video_frames (subsampled-timebase start_frame —
    review r3c: --native-prefetch previously ignored --load-fps)."""
    from longcat_video_tta_tpu.data.video_io import load_video_frames

    # deterministic ramp clip so frame identity is checkable
    arr = (np.arange(20, dtype=np.uint8)[:, None, None, None]
           * np.ones((1, 16, 32, 3), np.uint8))
    p = str(tmp_path / "ramp.npy")
    np.save(p, arr)
    for force_python in (False, True):
        pf = ClipPrefetcher([p], num_frames=4, start_frame=2, height=16,
                            width=32, target_fps=12.0,
                            force_python=force_python)
        _, clip = next(iter(pf))
        ref = np.asarray(load_video_frames(p, 4, 16, 32, start_frame=2,
                                           target_fps=12.0)[0])
        np.testing.assert_allclose(clip, ref, atol=1e-5,
                                   err_msg=f"force_python={force_python}")


def test_prefetch_per_clip_fault_tolerance(clips, tmp_path):
    """One corrupt clip yields (idx, None); the stream continues with
    the remaining clips (review r3c: a broken clip previously killed
    the generator and failed every subsequent video)."""
    bad = str(tmp_path / "bad.npy")
    with open(bad, "wb") as f:
        f.write(b"not a numpy file at all")
    paths = [clips[0], bad, clips[1]]
    for force_python in (False, True):
        out = list(ClipPrefetcher(paths, 6, 2, 16, 32,
                                  force_python=force_python))
        assert [i for i, _ in out] == [0, 1, 2], f"python={force_python}"
        assert out[0][1] is not None and out[2][1] is not None
        assert out[1][1] is None, f"python={force_python}"


def test_prefetch_stride_rounding_matches_python_at_half(clips, tmp_path):
    """At exact .5 native/target ratios the C++ loader must pick the
    same stride as Python's round() (half-to-even): 24 fps -> 9.6 fps
    is ratio 2.5 -> stride 2, where lround would have said 3 (review:
    a mismatched stride puts the native-loaded TTA window in a
    different timebase than cond/GT)."""
    from longcat_video_tta_tpu.data.video_io import load_video_frames

    arr = (np.arange(20, dtype=np.uint8)[:, None, None, None]
           * np.ones((1, 16, 32, 3), np.uint8))
    p = str(tmp_path / "ramp.npy")
    np.save(p, arr)
    ref = np.asarray(load_video_frames(p, 4, 16, 32, start_frame=1,
                                       target_fps=9.6)[0])
    for force_python in (False, True):
        _, clip = next(iter(ClipPrefetcher(
            [p], num_frames=4, start_frame=1, height=16, width=32,
            target_fps=9.6, force_python=force_python)))
        np.testing.assert_allclose(clip, ref, atol=1e-5,
                                   err_msg=f"python={force_python}")


def test_prefetch_start_beyond_eof_fails_like_python(clips, tmp_path):
    """A subsampled window starting past EOF must FAIL the clip in both
    loaders (review: the npy native path previously padded a frozen
    last-frame clip and trained on garbage)."""
    arr = np.zeros((6, 16, 32, 3), np.uint8)
    p = str(tmp_path / "short.npy")
    np.save(p, arr)
    for force_python in (False, True):
        out = list(ClipPrefetcher([p], num_frames=4, start_frame=5,
                                  height=16, width=32, target_fps=12.0,
                                  force_python=force_python))
        assert out[0][1] is None, f"python={force_python}"
