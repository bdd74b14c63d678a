"""Sweep runner + export + baseline matching + loss curves + figures,
end-to-end on a tiny synthetic sweep."""

import json
import os

import pytest
import yaml

from longcat_video_tta_tpu.sweep import export_loss_curves, export_results, figures
from longcat_video_tta_tpu.sweep.run_sweep import (
    build_argv, estimate_minutes, load_config, run_sweep,
)


def test_load_config_validation(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("method: delta_a\nseries: x\n")
    with pytest.raises(ValueError):
        load_config(str(bad))


def test_build_argv_rejects_unknown_key():
    with pytest.raises(ValueError):
        build_argv("delta_a", {"not_a_key": 1}, "/tmp/o", None)


def test_estimate_minutes_scales():
    a = estimate_minutes("delta_a", {"max_videos": 10, "steps": 5})
    b = estimate_minutes("full", {"max_videos": 10, "steps": 5})
    assert b > a > 0


@pytest.fixture(scope="module")
def sweep_out(tmp_path_factory):
    """Run the smoke sweep: one delta_a row + one baseline row."""
    out = str(tmp_path_factory.mktemp("sweep"))
    cfg = yaml.safe_load(open("configs/smoke_tiny.yaml"))
    # turn the second row into a matched baseline run
    import copy

    cfg_tta = copy.deepcopy(cfg)
    cfg_tta["sweep"] = [cfg["sweep"][0]]
    cfg_base = copy.deepcopy(cfg)
    cfg_base["method"] = "none"
    cfg_base["series"] = cfg_base["series_name"] = "smoke_baseline"
    cfg_base["sweep"] = [cfg["sweep"][1]]
    import os

    p1 = os.path.join(out, "tta.yaml")
    p2 = os.path.join(out, "base.yaml")
    yaml.safe_dump(cfg_tta, open(p1, "w"))
    yaml.safe_dump(cfg_base, open(p2, "w"))
    results_base = os.path.join(out, "results")
    r1 = run_sweep(p1, results_base)
    r2 = run_sweep(p2, results_base)
    return out, results_base, r1 + r2


def test_sweep_runs_complete(sweep_out):
    _, results_base, launched = sweep_out
    assert all(l["status"] == "ok" for l in launched)
    assert os.path.exists(os.path.join(
        results_base, "smoke_tiny", "lr1e-2", "summary.json"))


def test_sweep_resume_skips(sweep_out):
    out, results_base, _ = sweep_out
    again = run_sweep(os.path.join(out, "tta.yaml"), results_base)
    assert "skipped" in again[0]["status"]


def test_check_expected_matrix(sweep_out, tmp_path, capsys):
    """check-matrix (VERDICT r3 Missing #5, check_phase2.py analogue):
    the expected run matrix is derived from the sweep YAMLs, completed
    runs get a metrics row with dPSNR vs the baseline, absent ones are
    classified missing/in_progress."""
    import copy

    from longcat_video_tta_tpu.sweep.diagnostics import (
        check_expected_matrix)

    out, results_base, _ = sweep_out
    cfg = yaml.safe_load(open(os.path.join(out, "tta.yaml")))
    extra = copy.deepcopy(cfg["sweep"][0])
    extra["run_id"] = "never_launched"
    cfg["sweep"].append(extra)
    p = str(tmp_path / "expect.yaml")
    yaml.safe_dump(cfg, open(p, "w"))

    # an in-progress dir: checkpoint.json but no summary.json
    prog = copy.deepcopy(cfg["sweep"][0])
    prog["run_id"] = "halfway"
    cfg["sweep"].append(prog)
    yaml.safe_dump(cfg, open(p, "w"))
    d = os.path.join(results_base, cfg["series"], "halfway")
    os.makedirs(d, exist_ok=True)
    json.dump({"next_idx": 1, "results": []},
              open(os.path.join(d, "checkpoint.json"), "w"))

    base_dir = os.path.join(results_base, "smoke_baseline",
                            yaml.safe_load(open(os.path.join(
                                out, "base.yaml")))["sweep"][0]["run_id"])
    report = str(tmp_path / "report.txt")
    res = check_expected_matrix([p], results_base,
                                baseline_dir=base_dir, report_path=report)
    assert len(res["ok"]) == 1
    assert len(res["missing"]) == 1 and "never_launched" in res["missing"][0]
    assert len(res["in_progress"]) == 1
    txt = open(report).read()
    assert "dPSNR" in txt and "MISSING" in txt and "IN_PROGRESS" in txt
    # the dPSNR column is populated from the baseline summary
    assert "+" in txt or "-" in txt


def test_dry_run(sweep_out):
    out, results_base, _ = sweep_out
    rows = run_sweep(os.path.join(out, "tta.yaml"),
                     results_base + "_dry", dry_run=True)
    assert rows[0]["status"] == "dry-run" and "--lr" in rows[0]["argv"]


def test_jobs_concurrent_rows_with_device_pool(tmp_path, monkeypatch):
    """--jobs N runs rows as concurrent subprocesses, each slot pinned
    to a pool chip via TPU_VISIBLE_DEVICES (the SLURM-array analogue,
    reference run_sweep.py:405-440). The subprocess is stubbed: this
    tests the scheduler, not the runner."""
    import threading
    import time as _time

    import longcat_video_tta_tpu.sweep.run_sweep as rs

    cfg = yaml.safe_load(open("configs/smoke_tiny.yaml"))
    cfg["sweep"] = [{"run_id": f"r{i}", "lr": 0.01} for i in range(4)]
    p = os.path.join(str(tmp_path), "cfg.yaml")
    yaml.safe_dump(cfg, open(p, "w"))

    lock = threading.Lock()
    state = {"live": 0, "max_live": 0, "devices": [], "calls": 0}

    class _R:
        returncode = 0

    def fake_run(cmd, env=None):
        with lock:
            state["live"] += 1
            state["max_live"] = max(state["max_live"], state["live"])
            state["devices"].append((env or {}).get("TPU_VISIBLE_DEVICES"))
            state["calls"] += 1
        _time.sleep(0.15)
        with lock:
            state["live"] -= 1
        return _R()

    import subprocess

    monkeypatch.setattr(subprocess, "run", fake_run)
    launched = rs.run_sweep(p, os.path.join(str(tmp_path), "res"),
                            jobs=2, device_pool=["0", "1"])
    assert state["calls"] == 4
    assert state["max_live"] == 2          # genuinely concurrent, capped
    assert set(state["devices"]) == {"0", "1"}
    assert all(l["status"] == "ok" for l in launched)
    assert all(l["device"] in ("0", "1") for l in launched)


def test_fleet_stop_file_propagates_to_rows(tmp_path):
    """Every launched row's argv carries --stop-file <output_base>/STOP
    so RUNNING rows drain at their next video boundary when the fleet
    stop file appears — not just pending ones (ADVICE r4 medium)."""
    import longcat_video_tta_tpu.sweep.run_sweep as rs

    cfg = yaml.safe_load(open("configs/smoke_tiny.yaml"))
    p = os.path.join(str(tmp_path), "cfg.yaml")
    yaml.safe_dump(cfg, open(p, "w"))
    base = os.path.join(str(tmp_path), "res")
    launched = rs.run_sweep(p, base, dry_run=True)
    for row in launched:
        i = row["argv"].index("--stop-file")
        assert row["argv"][i + 1] == os.path.join(base, "STOP")


def test_subprocess_drain_classified_by_sentinel(tmp_path, monkeypatch):
    """Subprocess rows are 'drained' iff the runner wrote the DRAINED
    sentinel; a plain exit-0-without-summary (e.g. --preflight-only) is
    'ok', never silently misread as drained (ADVICE r4 low)."""
    import subprocess

    import longcat_video_tta_tpu.sweep.run_sweep as rs

    cfg = yaml.safe_load(open("configs/smoke_tiny.yaml"))
    cfg["sweep"] = [{"run_id": "drains"}, {"run_id": "plain"}]
    p = os.path.join(str(tmp_path), "cfg.yaml")
    yaml.safe_dump(cfg, open(p, "w"))

    class _R:
        returncode = 0

    def fake_run(cmd, env=None):
        out = cmd[cmd.index("--output-dir") + 1]
        os.makedirs(out, exist_ok=True)
        if "drains" in out:
            with open(os.path.join(out, "DRAINED"), "w") as f:
                f.write("{}")
        return _R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    launched = rs.run_sweep(p, os.path.join(str(tmp_path), "res"),
                            subprocess_mode=True)
    statuses = {r["run_id"]: r["status"] for r in launched}
    assert statuses == {"drains": "drained", "plain": "ok"}


def test_export_and_baseline_matching(sweep_out):
    out, results_base, _ = sweep_out
    all_results = os.path.join(out, "all_results.json")
    runs = export_results.main(["--results-roots", results_base,
                                "--output", all_results])
    complete = [r for r in runs if r["status"] == "complete"]
    assert len(complete) == 2
    tta = next(r for r in complete if r["method"] == "delta_a")
    assert tta["baseline_matched"] is True
    assert "delta_psnr" in tta
    assert tta["trainable_params"] == 32


def test_loss_curves_and_figures(sweep_out):
    out, results_base, _ = sweep_out
    all_results = os.path.join(out, "all_results.json")
    curves_path = os.path.join(out, "loss_curves.json")
    if not os.path.exists(all_results):
        export_results.main(["--results-roots", results_base,
                             "--output", all_results])
    curves = export_loss_curves.main(["--results-roots", results_base,
                                      "--output", curves_path])
    assert curves and curves[0]["mean"]
    fig_dir = os.path.join(out, "figs")
    made = figures.main(["--all-results", all_results,
                         "--loss-curves", curves_path,
                         "--output-dir", fig_dir])
    assert len(made) >= 3
    assert any("method_comparison" in m for m in made)
    assert any("loss_curves" in m for m in made)


def test_es_ablation_and_multimetric_figures(tmp_path):
    """New chart families (VERDICT r2 #6): fig_early_stopping panels
    and the per-metric + combined method-comparison / cross-dataset
    charts, on fabricated run records."""
    import numpy as np

    rng = np.random.RandomState(0)
    runs = []
    for series, key, vals in (
            ("es_ablation_patience", "es_patience", (1, 2, 3, 5, 10)),
            ("es_ablation_check_freq", "es_check_every", (1, 2, 5, 10))):
        for v in vals:
            runs.append({
                "status": "complete", "series": series,
                "run_id": f"{key}{v}", "method": "full",
                "psnr_mean": 22.0 + rng.rand(), "psnr_std": 0.5,
                "ssim_mean": 0.7 + 0.01 * rng.rand(), "ssim_std": 0.01,
                "lpips_mean": 0.25, "lpips_std": 0.02,
                "es_stopped_ratio": float(rng.rand()),
                "es_stopped_count": int(rng.randint(0, 20)),
                "es_total_count": 20,
                "avg_train_time": 60.0 + 30 * rng.rand(),
                "avg_gen_time": 120.0,
                "config": {key: v},
                "delta_psnr": rng.rand(), "dataset": "panda",
            })
    for m in ("delta_a", "lora"):
        for ds in ("panda", "ucf101"):
            runs.append({
                "status": "complete", "series": f"s_{m}", "run_id": m,
                "method": m, "psnr_mean": 22.3, "psnr_std": 0.4,
                "ssim_mean": 0.71, "ssim_std": 0.01,
                "lpips_mean": 0.24, "lpips_std": 0.02,
                "delta_psnr": 0.3, "dataset": ds, "config": {},
                "avg_train_time": 40.0, "avg_gen_time": 110.0,
            })
    runs.append({
        "status": "complete", "series": "full_long_train",
        "run_id": "LT1", "method": "full", "psnr_mean": 24.5,
        "ssim_mean": 0.8, "lpips_mean": 0.2, "delta_psnr": 2.5,
        "dataset": "panda", "steps": 500, "es_best_step_mean": 230.0,
        "es_stopped_count": 18, "es_total_count": 30,
        "es_stopped_ratio": 0.6, "avg_train_time": 168.0,
        "config": {}})
    out = str(tmp_path / "figs")
    es = figures.fig_early_stopping(runs, out)
    names = [os.path.basename(p) for p in es]
    assert "es_ablation.png" in names
    assert "es_patience_train_time_psnr.png" in names
    assert "long_train_es.png" in names
    ets = figures.fig_es_time_savings(runs, out)
    names = [os.path.basename(p) for p in ets]
    for expect in ("es_time_vs_early.png", "es_metrics_vs_early.png",
                   "es_time_savings_two_panel.png",
                   "es_time_saved_vs_early.png",
                   "es_train_time_vs_metrics.png", "es_time_savings.png"):
        assert expect in names, expect
    tc = figures.fig_time_cost(runs, out)
    names = [os.path.basename(p) for p in tc]
    assert "time_cost.png" in names
    assert "train_time.png" in names
    assert "train_gen_ratio.png" in names
    mc = figures.fig_method_comparison(runs, out)
    names = [os.path.basename(p) for p in mc]
    assert "method_comparison.png" in names
    assert "method_comparison_psnr.png" in names
    assert "method_comparison_lpips.png" in names
    assert "method_comparison_all_metrics.png" in names
    cd = figures.fig_cross_dataset(runs, out)
    names = [os.path.basename(p) for p in cd]
    assert "cross_dataset.png" in names
    assert "cross_dataset_ucf101_psnr.png" in names


def test_naive_and_lr_detail_figures(tmp_path):
    """Reference chart-set parity for fig_naive_methods (4 charts) and
    fig_lr_sweep (2 charts) — generate_figures.py:551-614, 1727-1806."""
    import numpy as np

    rng = np.random.RandomState(1)
    runs = []
    for m, lrs in (("norm_tune", (1e-4, 1e-3, 1e-2)),
                   ("film", (1e-4, 1e-3)),
                   ("delta_b", (1e-3, 5e-3, 1e-2))):
        for lr in lrs:
            runs.append({
                "status": "complete", "series": f"{m}_sweep",
                "run_id": f"{m}{lr:g}", "method": m, "lr": lr,
                "psnr_mean": 21.0 + rng.rand(), "delta_psnr": -0.5,
                "trainable_params": 24000, "dataset": "panda",
                "config": {}})
    for steps in (5, 10, 20):
        runs.append({
            "status": "complete", "series": "delta_c_iter_sweep",
            "run_id": f"dc{steps}", "method": "delta_c", "steps": steps,
            "psnr_mean": 20.0 + 0.1 * steps / 5, "delta_psnr": -1.5,
            "dataset": "panda", "config": {}})
    out = str(tmp_path / "figs")
    nm = figures.fig_naive_methods(runs, out)
    names = [os.path.basename(p) for p in nm]
    for expect in ("naive_methods.png", "normtune_sweep.png",
                   "film_sweep.png", "delta_c_iter_sweep.png"):
        assert expect in names, expect
    lr = figures.fig_lr_sweep(runs, out)
    names = [os.path.basename(p) for p in lr]
    assert "lr_sweep.png" in names
    assert "lr_sweep_adasteer_detail.png" in names


def test_full_config_matrix_dry_runs(tmp_path):
    """Every generated series (the reference's 64-config matrix) passes
    key-mapping validation via --dry-run."""
    import glob

    from longcat_video_tta_tpu.sweep.run_sweep import run_sweep

    configs = sorted(glob.glob("/root/repo/configs/*.yaml"))
    assert len(configs) >= 64
    total_rows = 0
    for cfg in configs:
        launched = run_sweep(cfg, str(tmp_path / "out"), dry_run=True)
        assert launched, cfg
        assert all(r["status"] == "dry-run" for r in launched), cfg
        total_rows += len(launched)
    assert total_rows >= 230  # the reference fleet ran ~230 rows


def test_es_time_savings_renders_from_legacy_ratio_only_records(tmp_path):
    """Pre-r3 exports carry es_stopped_ratio but no es_stopped_count;
    the 6-chart family must still render (count derived from ratio)."""
    runs = [{
        "status": "complete", "series": "es_ablation_patience",
        "run_id": f"P{i}", "method": "full",
        "psnr_mean": 22.0 + 0.01 * i, "ssim_mean": 0.77,
        "lpips_mean": 0.24, "es_stopped_ratio": 0.1 * i,
        "num_success": 20, "avg_train_time": 90.0 - 5 * i,
    } for i in range(4)]
    made = figures.fig_es_time_savings(runs, str(tmp_path / "figs"))
    names = [os.path.basename(p) for p in made]
    assert "es_time_savings.png" in names
    assert "es_time_vs_early.png" in names


def test_reference_yaml_keys_drop_in():
    """A sweep row written with the reference's key names
    (run_sweep.py:51-136: delta_lr/delta_steps/resolution/
    clip_gate_aggregation/target_modules/...) maps onto the unified
    driver's flags unchanged."""
    argv = build_argv("delta_b", {
        "delta_lr": 5e-3, "delta_steps": 20, "resolution": "480p",
        "num_groups": 1, "delta_target_blocks": "all",
        "clip_gate_enabled": True, "clip_gate_aggregation": "mean",
        "clip_gate_late_only": True, "clip_gate_fail_open": False,
        "compute_fvd": True, "compute_fid": True, "min_fvd_videos": 64,
        "caption_guard_topk": 7, "delta_mode": "per_channel",
        "target_ffn": True, "run_id": "R1",
    }, "/tmp/o", None)
    s = " ".join(argv)
    assert "--lr 0.005" in s and "--steps 20" in s
    assert "--height 480" in s and "--width 832" in s
    assert "--target-blocks all" in s
    assert "--clip-gate-aggregate mean" in s
    assert "--clip-gate-sampling-mode late_only" in s
    assert "--clip-gate-fail-closed" in s
    assert "--fvd-enabled" in s
    assert "--min-fvd-videos 64" in s
    assert "--caption-guard-topk 7" in s
    assert "--lora-target-ffn" in s
    assert "compute_fid" not in s  # accepted, note-only
    import pytest as _pytest
    with _pytest.raises(ValueError):
        build_argv("delta_c", {"delta_mode": "weird"}, "/tmp/o", None)
    with _pytest.raises(ValueError):
        build_argv("full", {"resolution": "720p"}, "/tmp/o", None)


def _tiny_data_dir(tmp_path, n=1):
    from longcat_video_tta_tpu.runners.run_tta import make_synthetic_dataset

    return make_synthetic_dataset(str(tmp_path / "data"), n, 16, 32, seed=3)


def test_preflight_catches_bad_frame_window(tmp_path):
    """The round-4 campaign failure class: ES on with the default TTA
    window (total = cond) leaves val latents = 0; the row must die at
    PREFLIGHT (before any model init / fleet slot), loudly."""
    data = _tiny_data_dir(tmp_path)
    cfg = {
        "method": "delta_a", "series": "pf", "fixed": {
            "preset": "longcat_bench", "max_videos": 1,
            "height": 480, "width": 832,
            "num_cond_frames": 14, "num_frames": 28,
            "gen_start_frame": 32, "steps": 2,
            "caption_guard_mode": "off",
            # NO tta_total_frames -> defaults to cond window -> val=0
        },
        "sweep": [{"run_id": "BAD_WINDOW"}],
    }
    p = tmp_path / "pf.yaml"
    p.write_text(yaml.dump(cfg))
    out = run_sweep(str(p), str(tmp_path / "out"), data_dir=data)
    assert out[0]["status"].startswith("preflight-failed"), out[0]
    assert "val_latents=0" in out[0]["status"]
    # nothing was executed: no config.json, no checkpoint
    assert not os.path.exists(
        os.path.join(str(tmp_path / "out"), "pf", "BAD_WINDOW",
                     "config.json"))


def test_campaign_yamls_pass_preflight(tmp_path):
    """Every shipped campaign row must clear the runner's startup
    guards (config-only, no model init) — pins the tta_total_frames /
    lever-combo fixes against regression."""
    import glob

    from longcat_video_tta_tpu.runners.run_tta import main as run_main

    data = _tiny_data_dir(tmp_path)
    for path in sorted(glob.glob("configs/campaign_bench_*.yaml")):
        cfg = load_config(path)
        for row in cfg["sweep"]:
            params = dict(cfg["fixed"])
            params.update({k: v for k, v in row.items()
                           if k != "run_id"})
            params["max_videos"] = 1
            argv = build_argv(cfg["method"], params,
                              str(tmp_path / "out" / row["run_id"]),
                              data)
            rc = run_main(argv + ["--preflight-only"])
            assert rc == 0 or rc is None, (path, row["run_id"])
