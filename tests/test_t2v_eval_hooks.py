"""T2V runner end-to-end + gated eval hooks (offline FVD, VBench).

Reference: t2v_experiment/scripts/run_longcat_t2v.py (hardcoded
negative prompt), sweep_experiment/scripts/eval_fvd.py,
eval_vbench.py.
"""

import json
import os

import numpy as np

from longcat_video_tta_tpu.eval.offline import _pair_by_stem, evaluate_fvd_dirs
from longcat_video_tta_tpu.eval.vbench import run_vbench
from longcat_video_tta_tpu.runners import run_t2v


def test_run_t2v_single_prompt(tmp_path):
    out = str(tmp_path / "t2v")
    summary = run_t2v.main([
        "--output-dir", out, "--prompt", "a red ball bouncing",
        "--preset", "longcat_tiny", "--num-frames", "5",
        "--height", "16", "--width", "32",
        "--num-inference-steps", "2", "--attn-impl", "xla",
    ])
    rows = summary["results"] if isinstance(summary, dict) else summary
    ok = [r for r in rows if r.get("success", True)]
    assert len(ok) == 1
    on_disk = json.load(open(os.path.join(out, "summary.json")))
    assert on_disk
    # the reference's hardcoded negative prompt is the default
    assert "worst quality" in run_t2v.DEFAULT_NEGATIVE_PROMPT


def test_fvd_dirs_skip_without_i3d(tmp_path):
    g = tmp_path / "gen"
    t = tmp_path / "gt"
    for d in (g, t):
        os.makedirs(d)
        np.save(str(d / "a.npy"),
                (np.random.RandomState(0).rand(4, 8, 8, 3) * 255)
                .astype(np.uint8))
    out = evaluate_fvd_dirs(str(g), str(t), i3d_model_path=None)
    assert out["skipped"] is True and "I3D" in out["reason"]


def test_fvd_pairing_by_stem():
    gen = ["/x/0001_clip_a.mp4", "/x/0002_clip_b.mp4"]
    gt = ["/y/clip_b.mp4", "/y/clip_a.mp4", "/y/other.mp4"]
    pairs = _pair_by_stem(gen, gt)
    assert len(pairs) == 2
    assert pairs[0][1].endswith("clip_a.mp4")
    assert pairs[1][1].endswith("clip_b.mp4")


def test_vbench_skip_marker(tmp_path):
    out = run_vbench(str(tmp_path))
    # vbench isn't installed in this environment: the hook must degrade
    # to a structured skip (reference pattern: NaN LPIPS fallback)
    assert out["skipped"] is True
    assert set(out["dimensions"]) >= {"subject_consistency",
                                      "motion_smoothness"}
