"""Offline FVD/FID over saved video directories.

Rebuild of eval_fvd.py (SURVEY.md §2.6): same I3D protocol as the online
accumulator, run post-hoc over a generated-videos dir paired with a GT
dir (matched by sorted order / shared stem)."""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path
from typing import Dict, List, Optional

from ..data.video_io import count_frames, decode_frames
from .frechet import OnlineFrechetAccumulator, load_i3d_model

VIDEO_EXTS = (".mp4", ".avi", ".npy")


def _list_videos(d: str) -> List[str]:
    return sorted(str(p) for p in Path(d).rglob("*")
                  if p.suffix.lower() in VIDEO_EXTS)


def _pair_by_stem(gen: List[str], gt: List[str]) -> List[tuple]:
    gt_by_stem = {Path(p).stem: p for p in gt}
    pairs = []
    for g in gen:
        stem = Path(g).stem
        # runner names are '<idx>_<video>' — try suffix match too
        match = gt_by_stem.get(stem) or next(
            (p for s, p in gt_by_stem.items() if stem.endswith(s)), None)
        if match:
            pairs.append((g, match))
    if not pairs and len(gen) == len(gt):
        pairs = list(zip(gen, gt))
    return pairs


def evaluate_fvd_dirs(gen_dir: str, gt_dir: str,
                      i3d_model_path: Optional[str] = None,
                      max_frames: int = 64,
                      min_videos: int = 256,
                      inception_model_path: Optional[str] = None) -> Dict:
    feat = None
    if i3d_model_path:
        try:
            from .i3d import load_i3d_params, make_i3d_feature_fn

            feat = make_i3d_feature_fn(load_i3d_params(i3d_model_path))
        except Exception as e:
            print(f"[fvd] JAX I3D conversion failed "
                  f"({type(e).__name__}: {e}); TorchScript fallback")
            feat = load_i3d_model(i3d_model_path)
    frame_feat = None
    if inception_model_path:
        from .inception import (load_inception_params,
                                make_inception_feature_fn)

        frame_feat = make_inception_feature_fn(
            load_inception_params(inception_model_path))
    if feat is None and frame_feat is None:
        return {"skipped": True,
                "reason": "no local I3D/Inception weights "
                          "(--i3d-model-path / --inception-model-path)"}
    acc = OnlineFrechetAccumulator(video_feature_fn=feat,
                                   frame_feature_fn=frame_feat,
                                   min_videos=min_videos)
    pairs = _pair_by_stem(_list_videos(gen_dir), _list_videos(gt_dir))
    for g, t in pairs:
        gen = decode_frames(g, min(count_frames(g), max_frames)) / 255.0
        gt = decode_frames(t, min(count_frames(t), max_frames)) / 255.0
        acc.update(gen, gt)
    out = acc.compute()
    out["num_pairs"] = len(pairs)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description="Offline FVD/FID")
    p.add_argument("--gen-dir", required=True)
    p.add_argument("--gt-dir", required=True)
    p.add_argument("--i3d-model-path", default=None)
    p.add_argument("--inception-model-path", default=None)
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)
    out = evaluate_fvd_dirs(args.gen_dir, args.gt_dir, args.i3d_model_path,
                            inception_model_path=args.inception_model_path)
    print(json.dumps(out, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()
