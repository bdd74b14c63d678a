"""Baseline post-processing tools + fleet triage additions.

Covers the analogues of the reference's baseline_experiment utility
scripts (prune_and_summarize.py, extract_gt_videos.py,
annotate_existing_videos.py, plot_baseline_sweep{,_dual}.py,
plot_v20_vs_longcat.py) and sweep_experiment triage
(check_stalled_runs.sh, investigate_failed_jobs.sh,
extract_xclip_sweep_results.py).
"""

import json
import os
import time

import numpy as np
import pytest

from longcat_video_tta_tpu.data.video_io import decode_frames, save_video
from longcat_video_tta_tpu.sweep.baseline_tools import (
    annotate_existing_videos,
    extract_gt_videos,
    load_per_video_metrics,
    plot_backbone_comparison,
    plot_baseline_sweep,
    plot_baseline_sweep_dual,
    prune_and_summarize,
)
from longcat_video_tta_tpu.sweep.run_eval import find_best_configs
from longcat_video_tta_tpu.sweep.run_eval import main as run_eval_main
from longcat_video_tta_tpu.sweep.diagnostics import (
    check_stalled_runs,
    investigate_failures,
    xclip_threshold_rows,
)


def _summary(d, vids_psnr, config=None, extra=None):
    os.makedirs(d, exist_ok=True)
    results = []
    for v, p in vids_psnr:
        r = {"video": v, "success": True, "psnr": p, "ssim": 0.7,
             "lpips": 0.3}
        if extra:
            r.update(extra.get(v, {}))
        results.append(r)
    with open(os.path.join(d, "summary.json"), "w") as f:
        json.dump({"results": results, "config": config or {}}, f)
    return d


def _clips_dir(d, n=3, frames=10, h=24, w=40):
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        clip = rng.rand(frames, h, w, 3).astype(np.float32)
        paths.append(save_video(clip, os.path.join(d, f"clip_{i:04d}.npy")))
    return paths


# ---------------------------------------------------------------------------
# prune_and_summarize
# ---------------------------------------------------------------------------


def test_prune_creates_keep_list_and_results_md(tmp_path):
    d = str(tmp_path / "run")
    vids = [(f"v{i}", 15.0 + i) for i in range(10)]
    _summary(d, vids)
    os.makedirs(os.path.join(d, "videos"))
    for v, _ in vids:
        open(os.path.join(d, "videos", f"{v}.mp4"), "wb").write(b"x")

    out = prune_and_summarize(d, create_keep_list=True, top_n=2, bottom_n=2)
    keep = set(out["kept"])
    # top-2 and bottom-2 by PSNR
    assert keep == {"v9", "v8", "v0", "v1"}
    assert len(out["removed"]) == 6
    left = sorted(os.listdir(os.path.join(d, "videos")))
    assert left == ["v0.mp4", "v1.mp4", "v8.mp4", "v9.mp4"]
    assert os.path.exists(os.path.join(d, "keep_videos.txt"))
    md = open(os.path.join(d, "RESULTS.md")).read()
    assert "psnr" in md and "mean" in md
    assert out["stats"]["psnr"]["mean"] == pytest.approx(19.5)


def test_prune_keeps_run_tta_save_pattern(tmp_path):
    # run_tta saves videos as f"{idx:04d}_{basename}.mp4" where
    # basename RETAINS the source extension ("clip_3.npy"), while keep
    # keys are extension-stripped stems ("clip_3") — the keep match
    # must survive that (regression: exact-stem matching deleted every
    # kept video of a real run).
    d = str(tmp_path / "run")
    vids = [(f"/data/clip_{i}.npy", 15.0 + i) for i in range(6)]
    _summary(d, vids)
    os.makedirs(os.path.join(d, "videos"))
    for i, (v, _) in enumerate(vids):
        name = f"{i:04d}_{os.path.basename(v)}.mp4"
        open(os.path.join(d, "videos", name), "wb").write(b"x")

    out = prune_and_summarize(d, create_keep_list=True, top_n=2,
                              bottom_n=1)
    assert set(out["kept"]) == {"clip_5", "clip_4", "clip_0"}
    left = sorted(os.listdir(os.path.join(d, "videos")))
    assert left == ["0000_clip_0.npy.mp4", "0004_clip_4.npy.mp4",
                    "0005_clip_5.npy.mp4"]


def test_prune_with_existing_keep_list(tmp_path):
    d1 = str(tmp_path / "run1")
    d2 = str(tmp_path / "run2")
    _summary(d1, [("a", 20.0), ("b", 10.0), ("c", 15.0)])
    prune_and_summarize(d1, create_keep_list=True, top_n=1, bottom_n=1)
    # run2 prunes to run1's keep set regardless of its own metrics
    _summary(d2, [("a", 1.0), ("b", 2.0), ("c", 3.0)])
    os.makedirs(os.path.join(d2, "videos"))
    for v in "abc":
        open(os.path.join(d2, "videos", f"{v}.mp4"), "wb").write(b"x")
    out = prune_and_summarize(
        d2, keep_list=os.path.join(d1, "keep_videos.txt"))
    assert set(out["kept"]) == {"a", "b"}
    assert sorted(os.listdir(os.path.join(d2, "videos"))) == \
        ["a.mp4", "b.mp4"]


def test_load_per_video_metrics_prefers_csv(tmp_path):
    d = str(tmp_path / "run")
    _summary(d, [("a", 20.0)])
    with open(os.path.join(d, "per_video_metrics.csv"), "w") as f:
        f.write("video,psnr,ssim,lpips\na,25.0,0.8,0.2\nb,26.0,0.9,0.1\n")
    rows = load_per_video_metrics(d)
    assert len(rows) == 2 and rows[0]["psnr"] == 25.0


# ---------------------------------------------------------------------------
# GT extraction + annotation
# ---------------------------------------------------------------------------


def test_extract_gt_videos_anchor_layout(tmp_path):
    data = str(tmp_path / "data")
    _clips_dir(data, n=2, frames=40)
    out = str(tmp_path / "gt")
    written = extract_gt_videos(data, out, num_cond=4, num_gen=4,
                                gen_start_frame=8, max_videos=2)
    assert len(written) == 2
    clip = decode_frames(written[0], 8).astype(np.float32) / 255.0
    assert clip.shape[0] == 8
    # cond frames carry the red border, GT frames the green border
    assert clip[0, 0, 0, 0] > 0.6 and clip[0, 0, 0, 1] < 0.2
    assert clip[-1, 0, 0, 1] > 0.6 and clip[-1, 0, 0, 0] < 0.2


def test_annotate_existing_videos_index_match(tmp_path):
    orig = str(tmp_path / "orig")
    _clips_dir(orig, n=2, frames=12)
    gen_dir = str(tmp_path / "gen")
    os.makedirs(gen_dir)
    rng = np.random.RandomState(1)
    gen = rng.rand(5, 24, 40, 3).astype(np.float32)
    save_video(gen, os.path.join(gen_dir, "001_sample.npy"))
    out = str(tmp_path / "annot")
    written = annotate_existing_videos(gen_dir, orig, out, num_cond_frames=3)
    assert len(written) == 1
    clip = decode_frames(written[0], 3 + 5).astype(np.float32) / 255.0
    assert clip.shape[0] == 3 + 5
    assert clip[0, 0, 0, 0] > 0.6      # red cond border
    assert clip[-1, 0, 0, 1] > 0.6     # green gen border


# ---------------------------------------------------------------------------
# plots
# ---------------------------------------------------------------------------


def test_plot_baseline_sweep_and_dual(tmp_path):
    pytest.importorskip("matplotlib")
    root = str(tmp_path / "results")
    for c, g in [(2, 14), (14, 14), (14, 2)]:
        _summary(os.path.join(root, f"cond{c}_gen{g}"),
                 [("a", 18.0 + c - g / 10)])
        _summary(os.path.join(root, f"ucf101_cond{c}_gen{g}"),
                 [("a", 17.0 + c - g / 10)])
    out = str(tmp_path / "figs")
    p1 = plot_baseline_sweep(root, out, "panda")
    p2 = plot_baseline_sweep(root, out, "ucf101")
    p3 = plot_baseline_sweep_dual(root, out)
    for p in (p1, p2, p3):
        assert p and os.path.getsize(p) > 0


def test_plot_backbone_comparison(tmp_path):
    pytest.importorskip("matplotlib")
    a = _summary(str(tmp_path / "longcat"), [("a", 22.0), ("b", 23.0)])
    b = _summary(str(tmp_path / "opensora"), [("a", 12.0), ("b", 13.0)])
    paths = plot_backbone_comparison(
        [("LongCat", a), ("Open-Sora v2", b)], str(tmp_path / "figs"))
    assert len(paths) == 3
    assert all(os.path.getsize(p) > 0 for p in paths)


# ---------------------------------------------------------------------------
# triage additions
# ---------------------------------------------------------------------------


def test_check_stalled_runs(tmp_path):
    base = tmp_path / "results" / "s1"
    os.makedirs(base / "fresh")
    os.makedirs(base / "stale")
    for name in ("fresh", "stale"):
        with open(base / name / "checkpoint.json", "w") as f:
            json.dump({"next_idx": 7, "results": []}, f)
    old = time.time() - 3600
    os.utime(base / "stale" / "checkpoint.json", (old, old))
    rows = check_stalled_runs([str(tmp_path / "results")], stale_minutes=30)
    assert len(rows) == 1
    assert rows[0]["run_dir"].endswith("stale")
    assert rows[0]["next_idx"] == 7


def test_investigate_failures_classifies(tmp_path):
    base = tmp_path / "results" / "s1" / "r1"
    os.makedirs(base)
    with open(base / "summary.json", "w") as f:
        json.dump({"results": [
            {"video": "a", "success": False,
             "error": "RESOURCE_EXHAUSTED: out of memory on HBM"},
            {"video": "b", "success": False,
             "error": "cv2 decode failed: corrupt stream"},
            {"video": "c", "success": True, "psnr": 20.0},
        ]}, f)
    buckets = investigate_failures([str(tmp_path / "results")])
    assert len(buckets["oom"]) == 1 and buckets["oom"][0]["video"] == "a"
    assert len(buckets["decode"]) == 1


def test_find_best_configs_ranks_by_baseline_delta(tmp_path):
    root = str(tmp_path / "results")
    cfg = {"data_dir": "/d/panda", "num_cond_frames": 14, "num_frames": 14,
           "lr": 0.005, "steps": 20}
    base = _summary(os.path.join(root, "series_baseline", "B1"),
                    [("a", 20.0), ("b", 20.0)], config=cfg)
    with open(os.path.join(base, "summary.json")) as f:
        doc = json.load(f)
    doc["method"] = "none"
    doc["num_videos"] = doc["num_success"] = 2
    json.dump(doc, open(os.path.join(base, "summary.json"), "w"))
    for rid, psnr in [("R1", 21.0), ("R2", 23.0)]:
        d = _summary(os.path.join(root, "series_delta_a", rid),
                     [("a", psnr), ("b", psnr)], config=cfg)
        with open(os.path.join(d, "summary.json")) as f:
            doc = json.load(f)
        doc["method"] = "delta_a"
        doc["num_videos"] = doc["num_success"] = 2
        json.dump(doc, open(os.path.join(d, "summary.json"), "w"))
    best = find_best_configs([root])
    assert best["series_delta_a"]["run_id"] == "R2"
    assert best["series_delta_a"]["delta_psnr"] == pytest.approx(3.0)
    # CLI writes the best_configs.json artifact (run_eval.sbatch:78-86)
    out = os.path.join(str(tmp_path), "best.json")
    run_eval_main(["--mode", "best_configs", "--results-roots", root,
                   "--output", out])
    assert json.load(open(out))["series_delta_a"]["run_id"] == "R2"


def test_xclip_threshold_rows(tmp_path):
    for thr in (0.2, 0.3):
        d = os.path.join(str(tmp_path),
                         f"results_xclip_gate_thr_{thr}", "series_x", "R1")
        _summary(d, [("a", 20.0), ("b", 22.0)],
                 config={"clip_gate_threshold": thr,
                         "clip_gate_backend": "xclip"},
                 extra={"a": {"skip_tta": True}})
    rows = xclip_threshold_rows(str(tmp_path))
    assert len(rows) == 2
    r = rows[0]
    assert r["backend"] == "xclip" and r["n_ok"] == 2
    assert r["num_skipped"] == 1 and r["num_scored"] == 1
    assert r["skip_rate"] == pytest.approx(0.5)
    assert r["psnr"] == pytest.approx(22.0)  # only the scored video


def test_compare_method_dirs(tmp_path):
    """Cross-method comparison table (compare_methods.py analogue)."""
    from longcat_video_tta_tpu.sweep.export_results import (
        compare_method_dirs,
    )

    a = _summary(str(tmp_path / "baseline"), [("a", 20.0), ("b", 21.0)])
    with open(os.path.join(a, "summary.json")) as f:
        doc = json.load(f)
    doc["method"] = "none"
    json.dump(doc, open(os.path.join(a, "summary.json"), "w"))
    b = _summary(str(tmp_path / "delta_a"), [("a", 22.0), ("b", 23.0)])
    out = compare_method_dirs(
        [("Baseline", a), ("Delta-A", b), ("Missing", str(tmp_path / "x"))],
        output_dir=str(tmp_path / "cmp"))
    rows = out["comparison"]
    assert rows[0]["psnr"] == pytest.approx(20.5)
    assert rows[1]["psnr"] == pytest.approx(22.5)
    assert rows[2]["missing"] is True
    assert os.path.exists(
        os.path.join(str(tmp_path / "cmp"), "method_comparison.json"))
