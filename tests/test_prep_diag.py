"""Dataset prep + diagnostics tooling."""

import csv
import json
import os

import numpy as np
import pytest

from longcat_video_tta_tpu.data.prep import (
    camelcase_to_caption,
    categorize_caption,
    prepare_ucf101_subset,
    replace_corrupt_videos,
)
from longcat_video_tta_tpu.sweep.diagnostics import (
    audit_run_pair,
    check_status,
    clip_gate_calibration,
    per_video_regressions,
)


def _make_ucf_src(d, classes=("ApplyEyeMakeup", "YoYo"), per=3, frames=12):
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    for cls in classes:
        for i in range(per):
            clip = (rng.rand(frames, 24, 40, 3) * 255).astype(np.uint8)
            np.save(str(d / f"v_{cls}_g01_c{i:02d}.npy"), clip)
    return str(d)


def test_camelcase_caption():
    assert camelcase_to_caption("ApplyEyeMakeup") == \
        "a video of apply eye makeup"
    assert camelcase_to_caption("YoYo") == "a video of yo yo"


def test_categorize_caption():
    assert categorize_caption("a dog runs") == "animals"
    assert categorize_caption("quantum physics lecture") == "other"


def test_prepare_ucf101_subset(tmp_path):
    src = _make_ucf_src(tmp_path / "src")
    out = str(tmp_path / "out")
    rows = prepare_ucf101_subset(src, out, videos_per_category=2)
    assert len(rows) == 4  # 2 classes x 2
    assert {r["category"] for r in rows} == {"ApplyEyeMakeup", "YoYo"}
    meta = list(csv.DictReader(open(os.path.join(out, "metadata.csv"))))
    assert len(meta) == 4
    # bucket size applied
    clip = np.load(os.path.join(out, meta[0]["filename"]))
    assert clip.shape[1:3] == (480, 832)


def test_prepare_external_formats(tmp_path):
    """DFoT/PVDM input-layout emitters (VERDICT r3 Missing #4): a
    prepared dataset round-trips into each external repo's expected
    directory layout + mapping CSV (+ torch metadata for DFoT)."""
    from longcat_video_tta_tpu.data.prep import prepare_external_format

    src = _make_ucf_src(tmp_path / "src", per=1, frames=40)
    data = str(tmp_path / "data")
    prepare_ucf101_subset(src, data, videos_per_category=1)

    # PVDM: 256x256, class-dir layout, >=32 frames
    pv = str(tmp_path / "pvdm")
    entries = prepare_external_format(data, pv, "pvdm")
    assert len(entries) == 2
    assert os.path.isdir(os.path.join(pv, "UCF-101", "YoYo"))
    import cv2

    cap = cv2.VideoCapture(entries[0]["path"])
    assert (int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))) == (256, 256)
    cap.release()
    with open(os.path.join(pv, "video_mapping.csv"), newline="") as f:
        rows = list(csv.DictReader(f))
    assert rows[0]["pvdm_path"] and rows[0]["original_filename"]

    # DFoT: 128x128 @10fps, test/ + metadata/test.pt; 40 native frames
    # @24fps -> 20 subsampled >= 17 floor
    df = str(tmp_path / "dfot")
    entries = prepare_external_format(data, df, "dfot")
    assert len(entries) == 2
    assert entries[0]["num_frames"] == 20  # stride round(24/10)=2
    assert os.path.exists(os.path.join(df, "metadata", "test.pt"))
    import torch

    meta = torch.load(os.path.join(df, "metadata", "test.pt"),
                      weights_only=False)
    assert meta[0]["relative_path"].endswith(".mp4")

    # frame floor actually filters
    none = prepare_external_format(data, str(tmp_path / "strict"),
                                   "dfot", min_frames=99)
    assert none == []


def test_replace_corrupt(tmp_path):
    src = _make_ucf_src(tmp_path / "src", per=1)
    out = str(tmp_path / "out")
    prepare_ucf101_subset(src, out, videos_per_category=1)
    # corrupt one file
    meta = list(csv.DictReader(open(os.path.join(out, "metadata.csv"))))
    bad_path = os.path.join(out, meta[0]["filename"])
    open(bad_path, "wb").write(b"garbage")
    bad = replace_corrupt_videos(out)
    assert meta[0]["filename"] in bad
    meta2 = list(csv.DictReader(open(os.path.join(out, "metadata.csv"))))
    assert len(meta2) == len(meta) - 1


def _fake_run(d, vids, metric_vals, scores=None, config=None):
    os.makedirs(d, exist_ok=True)
    results = []
    for i, (v, m) in enumerate(zip(vids, metric_vals)):
        r = {"video": v, "success": True, "psnr": m}
        if scores:
            r["clip_gate_score"] = scores[i]
        results.append(r)
    with open(os.path.join(d, "summary.json"), "w") as f:
        json.dump({"results": results, "config": config or {}}, f)


def test_check_status(tmp_path):
    base = tmp_path / "results" / "s1"
    _fake_run(str(base / "done"), ["a"], [20.0])
    os.makedirs(base / "partial")
    open(base / "partial" / "checkpoint.json", "w").write("{}")
    os.makedirs(base / "empty")
    out = check_status([str(tmp_path / "results")])
    assert len(out["complete"]) == 1
    assert len(out["in_progress"]) == 1
    assert len(out["failed_empty"]) == 1


def test_audit_and_regressions(tmp_path):
    old = str(tmp_path / "old")
    new = str(tmp_path / "new")
    _fake_run(old, ["a", "b", "c"], [20.0, 21.0, 22.0],
              config={"lr": 0.001})
    _fake_run(new, ["a", "b", "c"], [19.0, 23.0, 22.0],
              config={"lr": 0.01})
    rep = audit_run_pair(old, new)
    assert rep["num_shared_videos"] == 3
    assert rep["worst_regressions"][0]["video"] == "a"
    assert rep["config_diff"]["lr"] == {"old": 0.001, "new": 0.01}
    regs = per_video_regressions(new, old)
    assert regs[0]["video"] == "a" and regs[0]["delta"] == -1.0


def test_clip_gate_calibration(tmp_path):
    base = str(tmp_path / "base")
    run = str(tmp_path / "run")
    # low-score videos regress under TTA; high-score improve
    _fake_run(base, ["a", "b", "c", "d"], [20, 20, 20, 20])
    _fake_run(run, ["a", "b", "c", "d"], [18, 19, 22, 23],
              scores=[0.1, 0.2, 0.8, 0.9])
    rows = clip_gate_calibration(run, base)
    best = max(rows, key=lambda r: r["mean_metric"])
    # optimal threshold skips the two regressing low-score videos
    assert 0.2 < best["threshold"] <= 0.8
    assert best["mean_metric"] == pytest.approx((20 + 20 + 22 + 23) / 4)


def test_prepare_ucf101_split_file(tmp_path):
    src = _make_ucf_src(tmp_path / "src")
    split = tmp_path / "trainlist01.txt"
    # official-split format: Class/v_Class_gXX_cXX.avi <label>
    split.write_text(
        "ApplyEyeMakeup/v_ApplyEyeMakeup_g01_c00.avi 1\n"
        "YoYo/v_YoYo_g01_c01.avi 2\n")
    from longcat_video_tta_tpu.data.prep import prepare_ucf101_subset
    rows = prepare_ucf101_subset(src, str(tmp_path / "out"),
                                 videos_per_category=5,
                                 split_file=str(split))
    names = sorted(r["filename"] for r in rows)
    assert len(rows) == 2
    assert any("v_ApplyEyeMakeup_g01_c00" in n for n in names)
    assert any("v_YoYo_g01_c01" in n for n in names)
