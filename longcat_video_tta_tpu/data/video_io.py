"""Host-side video decode / resize / write.

Replaces the reference's PyAV decode (common.py:103-155) and
imageio/libx264 writes (common.py:2019-2025). This environment carries
OpenCV instead of PyAV/ffmpeg; decode stays on the TPU-host CPU and
feeds device-resident batches (SURVEY.md §2.9). ``.npy`` clips
([T, H, W, 3] uint8 or float) are supported everywhere as the
dependency-free synthetic/test format.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np


def _cv2():
    import cv2

    return cv2


def decode_frames(
    video_path: str,
    num_frames: int,
    start_frame: int = 0,
    target_fps: Optional[float] = None,
) -> np.ndarray:
    """Decode up to ``num_frames`` RGB frames after skipping
    ``start_frame`` (reference: load_video_frames start_frame skip +
    pad-last-frame, common.py:103-141). Returns [T, H, W, 3] uint8.

    ``target_fps`` subsamples by stride ``round(native_fps/target)``
    (the reference baseline loads at 15 fps this way,
    run_baseline.py:85-118). The reference subsamples the clip FIRST and
    indexes everything (anchor, cond window, GT) in the subsampled
    timebase (run_baseline.py:396-403 ``all[::stride][start:...]``), so
    ``start_frame`` counts SUBSAMPLED frames when ``target_fps`` is set
    — native-frame indexing of the start would let a strided cond
    window overrun the generation anchor (future-frame leakage)."""
    if video_path.endswith(".npy"):
        arr = np.load(video_path)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        stride = 1
        if target_fps:
            native = 24.0  # npy clips carry no fps metadata
            stride = max(1, round(native / target_fps))
        frames = list(arr[start_frame * stride::stride][:num_frames])
    else:
        cv2 = _cv2()
        cap = cv2.VideoCapture(video_path)
        stride = 1
        if target_fps:
            native = cap.get(cv2.CAP_PROP_FPS) or 30.0
            stride = max(1, round(native / target_fps))
        skip = start_frame * stride
        frames = []
        decoded = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if decoded < skip or (decoded - skip) % stride != 0:
                decoded += 1
                continue
            if len(frames) >= num_frames:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            decoded += 1
        cap.release()
    if not frames:
        raise ValueError(f"No frames decoded from {video_path}")
    while len(frames) < num_frames:
        frames.append(frames[-1])
    return np.stack(frames[:num_frames], axis=0)


def resize_frames(frames: np.ndarray, height: int, width: int) -> np.ndarray:
    """[T, H, W, 3] -> [T, height, width, 3] (area/linear resample,
    the reference used trilinear — common.py:146-151)."""
    if frames.shape[1] == height and frames.shape[2] == width:
        return frames
    cv2 = _cv2()
    out = np.stack([
        cv2.resize(f, (width, height), interpolation=cv2.INTER_LINEAR)
        for f in frames
    ])
    return out


def load_video_frames(
    video_path: str,
    num_frames: int,
    height: int = 480,
    width: int = 832,
    start_frame: int = 0,
    target_fps: Optional[float] = None,
) -> np.ndarray:
    """Decode + resize + scale to [-1, 1]; returns [1, 3, T, H, W] float32
    (reference contract: common.py:103-155)."""
    frames = decode_frames(video_path, num_frames, start_frame,
                           target_fps=target_fps)
    frames = resize_frames(frames, height, width)
    x = frames.astype(np.float32) / 255.0 * 2.0 - 1.0
    return x.transpose(3, 0, 1, 2)[None]  # [1, 3, T, H, W]


def load_gt_frames(
    video_path: str,
    num_frames: int,
    height: int,
    width: int,
    start_frame: int,
    target_fps: Optional[float] = None,
) -> np.ndarray:
    """GT frames for metrics: [N, H, W, 3] in [0, 1]
    (reference: evaluate_generation_metrics GT decode at the anchor)."""
    frames = decode_frames(video_path, num_frames, start_frame,
                           target_fps=target_fps)
    frames = resize_frames(frames, height, width)
    return frames.astype(np.float32) / 255.0


def decode_all_frames(
    video_path: str,
    target_fps: Optional[float] = None,
) -> np.ndarray:
    """Decode every frame to EOF (optional target_fps stride), WITHOUT
    the pad-last-frame tail of ``decode_frames``. Returns [T, H, W, 3]
    uint8 with T = the count actually decodable.

    Use this wherever the frame count must be ground truth rather than
    the requested window: container CAP_PROP_FRAME_COUNT metadata can
    overcount (truncated/VFR files), and count_frames()-then-pad would
    append duplicate trailing frames — which biases temporal metrics
    (VBench temporal_flickering / motion_smoothness score a duplicated
    pair as perfectly smooth) and mis-stamps num_frames in exported
    datasets."""
    if video_path.endswith(".npy"):
        arr = np.load(video_path)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        stride = 1
        if target_fps:
            stride = max(1, round(24.0 / target_fps))
        frames = list(arr[::stride])
    else:
        cv2 = _cv2()
        cap = cv2.VideoCapture(video_path)
        stride = 1
        if target_fps:
            native = cap.get(cv2.CAP_PROP_FPS) or 30.0
            stride = max(1, round(native / target_fps))
        frames = []
        decoded = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if decoded % stride == 0:
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            decoded += 1
        cap.release()
    if not frames:
        raise ValueError(f"No frames decoded from {video_path}")
    return np.stack(frames, axis=0)


def count_frames(video_path: str) -> int:
    if video_path.endswith(".npy"):
        return int(np.load(video_path, mmap_mode="r").shape[0])
    cv2 = _cv2()
    cap = cv2.VideoCapture(video_path)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    return n


def native_fps(video_path: str) -> float:
    """Container fps; 24.0 for .npy clips (no fps metadata) and 30.0
    when the container doesn't report one — the same conventions
    ``decode_frames`` uses for its target_fps stride."""
    if video_path.endswith(".npy"):
        return 24.0
    cv2 = _cv2()
    cap = cv2.VideoCapture(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    cap.release()
    return float(fps)


def validate_decodable(video_path: str) -> bool:
    """Cheap decodability probe (reference drops undecodable files,
    common.py:868-898)."""
    try:
        decode_frames(video_path, 1)
        return True
    except Exception:
        return False


def save_video(frames: np.ndarray, path: str, fps: int = 24):
    """[N, H, W, 3] in [0, 1] -> mp4 (imageio/libx264, quality 9 —
    reference: save_video_from_numpy common.py:2019-2025); falls back to
    cv2 VideoWriter, then .npy."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    if path.endswith(".npy"):
        np.save(path, arr)
        return path
    try:
        import imageio

        with imageio.get_writer(path, fps=fps, quality=9) as w:
            for f in arr:
                w.append_data(f)
        return path
    except Exception:
        pass
    try:
        cv2 = _cv2()
        h, w_ = arr.shape[1], arr.shape[2]
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (w_, h))
        for f in arr:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
        return path
    except Exception:
        alt = os.path.splitext(path)[0] + ".npy"
        np.save(alt, arr)
        return alt


def annotate_borders(
    frames: np.ndarray, color: Tuple[int, int, int], width: int = 6
) -> np.ndarray:
    """Colored border annotation (reference: red CONDITIONING / green
    GENERATED borders, run_baseline.py:195-231). [N,H,W,3] in [0,1]."""
    out = frames.copy()
    c = np.asarray(color, np.float32) / 255.0
    out[:, :width] = c
    out[:, -width:] = c
    out[:, :, :width] = c
    out[:, :, -width:] = c
    return out
