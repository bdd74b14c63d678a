"""ctypes binding for the C++ prefetch loader (native/prefetch.cpp).

Builds the shared library with g++ on first use (cached under
native/build/); falls back to a synchronous Python loader when the
toolchain or the .so is unavailable, preserving the iterator contract:

    for idx, clip in ClipPrefetcher(paths, num_frames, start, h, w):
        # clip: np.float32 [3, T, H, W] in [-1, 1]
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Iterator, List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "prefetch.cpp")
_SO = os.path.join(_NATIVE_DIR, "build", "libprefetch.so")

_lib = None
_lib_failed = False


def _build_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed:
        return None
    try:
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            os.makedirs(os.path.dirname(_SO), exist_ok=True)
            base = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                    "-fPIC", "-pthread", _SRC, "-o", _SO]
            # preferred: mp4/avi decode via the system libav (the same
            # libraries the reference's PyAV wraps, common.py:103-155);
            # fall back to the npy-only build when dev files are absent
            with_av = (base[:1]
                       + ["-DUSE_LIBAV"] + base[1:]
                       + ["-lavformat", "-lavcodec", "-lavutil",
                          "-lswscale"])
            r = subprocess.run(with_av, capture_output=True)
            if r.returncode != 0:
                print("[native_loader] libav build failed; building "
                      "npy-only decoder")
                subprocess.run(base, check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.pf_create.restype = ctypes.c_void_p
        lib.pf_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_int,
            ctypes.c_long, ctypes.c_double,
        ]
        lib.pf_next.restype = ctypes.c_int
        lib.pf_next.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_long)]
        lib.pf_destroy.argtypes = [ctypes.c_void_p]
        lib.pf_has_libav.restype = ctypes.c_int
        _lib = lib
        return lib
    except Exception as e:  # toolchain missing / build failure
        print(f"[native_loader] falling back to python loader: {e}")
        _lib_failed = True
        return None


class ClipPrefetcher:
    """Iterate (index, clip[3,T,H,W] float32 in [-1,1]) over clip paths
    (.npy, or mp4/avi when the lib was built against libav), decoded +
    resized ahead of time by C++ worker threads.

    A clip that fails to decode yields ``(index, None)`` and the stream
    continues — the caller owns per-video failure attribution (the
    driver's per-video try/except), so one corrupt clip never sinks the
    rest of the run. ``target_fps`` subsamples with ``start_frame`` in
    the subsampled timebase (same contract as video_io.decode_frames)."""

    def __init__(self, paths: List[str], num_frames: int, start_frame: int,
                 height: int, width: int, workers: int = 3,
                 queue_cap: int = 4, force_python: bool = False,
                 target_fps: Optional[float] = None):
        self.paths = list(paths)
        self.num_frames = num_frames
        self.start_frame = start_frame
        self.height = height
        self.width = width
        self.workers = workers
        self.queue_cap = queue_cap
        self.target_fps = float(target_fps) if target_fps else 0.0
        lib = None if force_python else _build_lib()
        self._native = lib is not None and (
            all(p.endswith(".npy") for p in self.paths)
            or bool(lib.pf_has_libav()))

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray]]:
        if self._native:
            yield from self._iter_native()
        else:
            yield from self._iter_python()

    def _iter_native(self):
        lib = _build_lib()
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths])
        handle = lib.pf_create(arr, len(self.paths), self.num_frames,
                               self.start_frame, self.height, self.width,
                               self.workers, self.queue_cap,
                               self.target_fps)
        try:
            out = np.empty((3, self.num_frames, self.height, self.width),
                           np.float32)
            idx = ctypes.c_long(-1)
            while True:
                rc = lib.pf_next(
                    handle,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    ctypes.byref(idx))
                if rc == 1:
                    return
                if rc == -2:  # this clip failed; the stream continues
                    yield int(idx.value), None
                    continue
                if rc != 0:
                    raise RuntimeError(f"native prefetch error rc={rc}")
                yield int(idx.value), out.copy()
        finally:
            lib.pf_destroy(handle)

    def _iter_python(self):
        from .video_io import load_video_frames

        for i, p in enumerate(self.paths):
            try:
                clip = load_video_frames(
                    p, self.num_frames, self.height, self.width,
                    self.start_frame,
                    target_fps=self.target_fps or None)[0]
            except Exception:
                # keep the root cause in the logs: the caller only sees
                # (i, None), and a systemic error (missing cv2, bad
                # args) must not masquerade as per-clip corruption
                import traceback

                print(f"[prefetch] decode failed for {p}:",
                      file=sys.stderr)
                traceback.print_exc()
                yield i, None
                continue
            yield i, clip.astype(np.float32)
