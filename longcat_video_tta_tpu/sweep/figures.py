"""Paper-figure generation from all_results.json + loss_curves.json.

Rebuild of paper_figures/generate_figures.py (SURVEY.md §2.6/L5; the
reference ships 19 fig_* builders, generate_figures.py:417-2092). The
core set here covers the figure families the paper relies on: method
comparison, quality-vs-params Pareto, LR sweeps, step-count sweeps,
cond-frames / gen-horizon ablations, ES time savings, time-cost
scatter, and aggregated loss curves. Each builder is skipped gracefully
when its data slice is absent.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict, List, Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _complete(runs: List[Dict]) -> List[Dict]:
    return [r for r in runs if r.get("status") == "complete"
            and r.get("psnr_mean") is not None]


def _save(fig, out_dir: str, name: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.png")
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    print(f"[figures] {path}")
    return path


def fig_method_comparison(runs, out_dir):
    """Best PSNR delta per method (reference: fig_method_comparison)."""
    rows = [r for r in _complete(runs) if r.get("delta_psnr") is not None]
    if not rows:
        return None
    best: Dict[str, Dict] = {}
    for r in rows:
        m = r["method"]
        if m not in best or r["delta_psnr"] > best[m]["delta_psnr"]:
            best[m] = r
    methods = sorted(best, key=lambda m: best[m]["delta_psnr"])
    deltas = [best[m]["delta_psnr"] for m in methods]
    fig, ax = plt.subplots(figsize=(7, 4))
    colors = ["#2a9d8f" if d >= 0 else "#e76f51" for d in deltas]
    ax.barh(methods, deltas, color=colors)
    ax.axvline(0, color="k", lw=0.8)
    ax.set_xlabel("best ΔPSNR vs matched no-TTA baseline (dB)")
    ax.set_title("TTA method comparison")
    return _save(fig, out_dir, "method_comparison")


def fig_pareto_quality_vs_params(runs, out_dir):
    """PSNR delta vs trainable params (reference: Pareto figure)."""
    rows = [r for r in _complete(runs)
            if r.get("delta_psnr") is not None and r.get("trainable_params")]
    if not rows:
        return None
    fig, ax = plt.subplots(figsize=(7, 4.5))
    by_m: Dict[str, List[Dict]] = {}
    for r in rows:
        by_m.setdefault(r["method"], []).append(r)
    for m, rs in sorted(by_m.items()):
        ax.scatter([r["trainable_params"] for r in rs],
                   [r["delta_psnr"] for r in rs], label=m, s=36, alpha=0.8)
    ax.set_xscale("log")
    ax.axhline(0, color="k", lw=0.8)
    ax.set_xlabel("trainable parameters")
    ax.set_ylabel("ΔPSNR (dB)")
    ax.set_title("Quality vs adapted parameter count")
    ax.legend(fontsize=8)
    return _save(fig, out_dir, "pareto_quality_vs_params")


def _sweep_line(runs, out_dir, xkey: str, name: str, xlabel: str,
                logx=False):
    rows = [r for r in _complete(runs) if r.get(xkey) is not None]
    if len({r[xkey] for r in rows}) < 2:
        return None
    fig, ax = plt.subplots(figsize=(6.5, 4))
    by_m: Dict[str, List[Dict]] = {}
    for r in rows:
        by_m.setdefault(r["method"], []).append(r)
    for m, rs in sorted(by_m.items()):
        pts: Dict[Any, List[float]] = {}
        for r in rs:
            pts.setdefault(r[xkey], []).append(r["psnr_mean"])
        xs = sorted(pts)
        ys = [np.mean(pts[x]) for x in xs]
        ax.plot(xs, ys, marker="o", label=m)
    if logx:
        ax.set_xscale("log")
    ax.set_xlabel(xlabel)
    ax.set_ylabel("PSNR (dB)")
    ax.set_title(f"{xlabel} sweep")
    ax.legend(fontsize=8)
    return _save(fig, out_dir, name)


def fig_lr_sweep(runs, out_dir):
    return _sweep_line(runs, out_dir, "lr", "lr_sweep", "learning rate",
                       logx=True)


def fig_steps_sweep(runs, out_dir):
    return _sweep_line(runs, out_dir, "steps", "steps_sweep", "TTA steps")


def fig_cond_frames(runs, out_dir):
    return _sweep_line(runs, out_dir, "cond", "cond_frames",
                       "conditioning frames")


def fig_gen_horizon(runs, out_dir):
    return _sweep_line(runs, out_dir, "gen", "gen_horizon",
                       "generated frames")


def fig_time_cost(runs, out_dir):
    """PSNR delta vs per-video train time (reference: time-cost figs,
    generate_figures.py:1525-1584)."""
    rows = [r for r in _complete(runs)
            if r.get("delta_psnr") is not None and r.get("avg_train_time")]
    if not rows:
        return None
    fig, ax = plt.subplots(figsize=(6.5, 4))
    by_m: Dict[str, List[Dict]] = {}
    for r in rows:
        by_m.setdefault(r["method"], []).append(r)
    for m, rs in sorted(by_m.items()):
        ax.scatter([r["avg_train_time"] for r in rs],
                   [r["delta_psnr"] for r in rs], label=m, s=36, alpha=0.8)
    ax.axhline(0, color="k", lw=0.8)
    ax.set_xlabel("per-video TTA time (s)")
    ax.set_ylabel("ΔPSNR (dB)")
    ax.set_title("Quality vs adaptation cost")
    ax.legend(fontsize=8)
    return _save(fig, out_dir, "time_cost")


def fig_es_time_savings(runs, out_dir):
    """Early-stopping stop ratio vs train time (reference ES figures)."""
    rows = [r for r in _complete(runs)
            if r.get("es_stopped_ratio") is not None
            and r.get("avg_train_time")]
    if not rows:
        return None
    fig, ax = plt.subplots(figsize=(6.5, 4))
    ax.scatter([r["es_stopped_ratio"] for r in rows],
               [r["avg_train_time"] for r in rows], s=36, alpha=0.8)
    ax.set_xlabel("fraction of videos stopped early")
    ax.set_ylabel("per-video TTA time (s)")
    ax.set_title("Early stopping time savings")
    return _save(fig, out_dir, "es_time_savings")


def fig_loss_curves(curves: List[Dict], out_dir):
    """Mean±std anchor-loss curves (reference: 4 loss-curve figures)."""
    if not curves:
        return None
    fig, ax = plt.subplots(figsize=(6.5, 4))
    for c in curves[:8]:
        steps = np.asarray(c["steps"])
        mean = np.asarray(c["mean"])
        std = np.asarray(c["std"])
        label = f"{c['series']}/{c['run_id']}"
        ax.plot(steps, mean, marker="o", ms=3, label=label)
        ax.fill_between(steps, mean - std, mean + std, alpha=0.15)
    ax.set_xlabel("TTA step")
    ax.set_ylabel("anchor loss")
    ax.set_title("Anchored ES loss curves (mean ± std over videos)")
    ax.legend(fontsize=7)
    return _save(fig, out_dir, "loss_curves")


def fig_summary_table(runs, out_dir):
    """Rendered summary table (reference: fig_summary_table)."""
    rows = _complete(runs)
    if not rows:
        return None
    cols = ["series", "run_id", "method", "psnr_mean", "delta_psnr",
            "ssim_mean", "avg_train_time"]
    cell_rows = []
    for r in sorted(rows, key=lambda x: -(x.get("delta_psnr") or -1e9))[:20]:
        cell_rows.append([
            str(r.get("series", ""))[:18], str(r.get("run_id", ""))[:16],
            str(r.get("method", "")),
            f"{r.get('psnr_mean', float('nan')):.3f}",
            f"{r.get('delta_psnr', float('nan')):.3f}"
            if r.get("delta_psnr") is not None else "—",
            f"{r.get('ssim_mean', float('nan')):.3f}",
            f"{r.get('avg_train_time') or 0:.1f}",
        ])
    fig, ax = plt.subplots(figsize=(10, 0.4 * len(cell_rows) + 1))
    ax.axis("off")
    table = ax.table(cellText=cell_rows, colLabels=cols, loc="center")
    table.auto_set_font_size(False)
    table.set_fontsize(8)
    ax.set_title("Top runs by ΔPSNR")
    return _save(fig, out_dir, "summary_table")


def fig_batch_k(runs, out_dir):
    """Retrieval batch-TTA K sweep (reference: exp5 figures — PSNR
    degrades as the shared adapter spreads over more neighbours)."""
    return _sweep_line(runs, out_dir, "batch_videos", "batch_k",
                       "batch videos K")


def fig_clip_gate_summary(runs, out_dir):
    """Gate skip ratio vs PSNR delta (reference: CLIP-gate summary)."""
    rows = [r for r in _complete(runs)
            if r.get("clip_gate_skip_ratio") is not None
            and r.get("delta_psnr") is not None]
    if not rows:
        return None
    fig, ax = plt.subplots(figsize=(6.5, 4))
    ax.scatter([r["clip_gate_skip_ratio"] for r in rows],
               [r["delta_psnr"] for r in rows], s=36, alpha=0.8)
    ax.set_xlabel("gate skip ratio")
    ax.set_ylabel("ΔPSNR (dB)")
    ax.set_title("CLIP gate: skipping vs quality")
    return _save(fig, out_dir, "clip_gate_summary")


ALL_FIGURES = [
    fig_method_comparison, fig_pareto_quality_vs_params, fig_lr_sweep,
    fig_steps_sweep, fig_cond_frames, fig_gen_horizon, fig_time_cost,
    fig_es_time_savings, fig_summary_table, fig_batch_k,
    fig_clip_gate_summary,
]


def main(argv=None):
    p = argparse.ArgumentParser(description="Generate paper figures")
    p.add_argument("--all-results", default="all_results.json")
    p.add_argument("--loss-curves", default="loss_curves.json")
    p.add_argument("--output-dir", default="paper_figures/output")
    args = p.parse_args(argv)

    with open(args.all_results) as f:
        runs = json.load(f)["runs"]
    made = []
    for fn in ALL_FIGURES:
        path = fn(runs, args.output_dir)
        if path:
            made.append(path)
    if os.path.exists(args.loss_curves):
        with open(args.loss_curves) as f:
            curves = json.load(f)["curves"]
        path = fig_loss_curves(curves, args.output_dir)
        if path:
            made.append(path)
    print(f"[figures] generated {len(made)} figures in {args.output_dir}")
    return made


if __name__ == "__main__":
    main()
