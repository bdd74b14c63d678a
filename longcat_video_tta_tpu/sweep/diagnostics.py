"""Fleet ops + post-hoc diagnostics.

Rebuilds the reference's triage layer (SURVEY.md §2.5/2.6, §5):
- ``check_status``: classify run dirs into complete / in_progress /
  failed_empty (check_job_status.sh, EXPERIMENT_STATUS.md:13-31)
- ``audit_run_pair``: old-vs-new per-video metric diff + config-subset
  diff (audit_regression_run_pair.py)
- ``per_video_regressions``: per-video lookup of the worst regressions
  vs the matched baseline run (phase1_diagnostics.py)
- ``clip_gate_calibration``: threshold simulation over per-video CLIP
  scores vs metric deltas (analyze_clip_gate_calibration.py)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def _load_summary(run_dir: str) -> Optional[Dict]:
    path = os.path.join(run_dir, "summary.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def check_status(results_roots: List[str]) -> Dict[str, List[str]]:
    out = {"complete": [], "in_progress": [], "failed_empty": []}
    for root in results_roots:
        for d in sorted(glob.glob(os.path.join(root, "*", "*"))):
            if not os.path.isdir(d):
                continue
            if os.path.exists(os.path.join(d, "summary.json")):
                out["complete"].append(d)
            elif os.path.exists(os.path.join(d, "checkpoint.json")):
                out["in_progress"].append(d)
            else:
                out["failed_empty"].append(d)
    for k, v in out.items():
        print(f"{k}: {len(v)}")
        for d in v:
            print(f"  {d}")
    return out


def _per_video(summary: Dict) -> Dict[str, Dict]:
    return {r["video"]: r for r in summary.get("results", [])
            if r.get("success")}


def audit_run_pair(old_dir: str, new_dir: str,
                   metric: str = "psnr") -> Dict[str, Any]:
    """Per-video diff between two runs + config diff
    (audit_regression_run_pair.py)."""
    old_s, new_s = _load_summary(old_dir), _load_summary(new_dir)
    if old_s is None or new_s is None:
        raise FileNotFoundError("both runs need summary.json")
    old_v, new_v = _per_video(old_s), _per_video(new_s)
    shared = sorted(set(old_v) & set(new_v))
    diffs = []
    for vid in shared:
        a, b = old_v[vid].get(metric), new_v[vid].get(metric)
        if a is not None and b is not None:
            diffs.append({"video": vid, "old": a, "new": b,
                          "delta": b - a})
    diffs.sort(key=lambda d: d["delta"])

    cfg_old = old_s.get("config", {})
    cfg_new = new_s.get("config", {})
    cfg_diff = {
        k: {"old": cfg_old.get(k), "new": cfg_new.get(k)}
        for k in sorted(set(cfg_old) | set(cfg_new))
        if cfg_old.get(k) != cfg_new.get(k)
        and k not in ("output_dir",)
    }
    report = {
        "num_shared_videos": len(shared),
        f"mean_delta_{metric}": float(np.mean([d["delta"] for d in diffs]))
        if diffs else None,
        "worst_regressions": diffs[:5],
        "best_improvements": diffs[-5:][::-1],
        "config_diff": cfg_diff,
    }
    print(json.dumps(report, indent=2, default=str))
    return report


def per_video_regressions(run_dir: str, baseline_dir: str,
                          metric: str = "psnr",
                          top_k: int = 10) -> List[Dict]:
    """Worst per-video deltas vs the matched baseline
    (phase1_diagnostics.py)."""
    run_s, base_s = _load_summary(run_dir), _load_summary(baseline_dir)
    run_v, base_v = _per_video(run_s), _per_video(base_s)
    rows = []
    for vid in sorted(set(run_v) & set(base_v)):
        a, b = base_v[vid].get(metric), run_v[vid].get(metric)
        if a is not None and b is not None:
            rows.append({"video": vid, "baseline": a, "tta": b,
                         "delta": b - a})
    rows.sort(key=lambda r: r["delta"])
    for r in rows[:top_k]:
        print(f"{r['video']:<40} base={r['baseline']:.3f} "
              f"tta={r['tta']:.3f} Δ={r['delta']:+.3f}")
    return rows


def clip_gate_calibration(run_dir: str, baseline_dir: str,
                          metric: str = "psnr",
                          thresholds: Optional[List[float]] = None
                          ) -> List[Dict]:
    """Simulate gate thresholds: for each candidate threshold, compute the
    mean metric if TTA were skipped below it (taking the baseline value
    instead) — analyze_clip_gate_calibration.py."""
    run_s, base_s = _load_summary(run_dir), _load_summary(baseline_dir)
    run_v, base_v = _per_video(run_s), _per_video(base_s)
    pairs = []
    for vid in sorted(set(run_v) & set(base_v)):
        score = run_v[vid].get("clip_gate_score")
        a, b = base_v[vid].get(metric), run_v[vid].get(metric)
        if score is not None and a is not None and b is not None:
            pairs.append((score, a, b))
    if not pairs:
        print("[calibration] no per-video CLIP scores recorded")
        return []
    scores = sorted({p[0] for p in pairs})
    thresholds = thresholds or [float(s) for s in
                                np.quantile(scores, np.linspace(0, 1, 11))]
    rows = []
    for th in thresholds:
        vals = [(base if score < th else tta)
                for score, base, tta in pairs]
        skipped = sum(1 for score, _, _ in pairs if score < th)
        rows.append({"threshold": th, "mean_metric": float(np.mean(vals)),
                     "skip_ratio": skipped / len(pairs)})
    for r in rows:
        print(f"th={r['threshold']:.4f} mean_{metric}="
              f"{r['mean_metric']:.3f} skip={r['skip_ratio']:.2f}")
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description="Run diagnostics")
    sub = p.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("status")
    s.add_argument("--results-roots", nargs="+", default=["results"])
    a = sub.add_parser("audit")
    a.add_argument("old_dir")
    a.add_argument("new_dir")
    a.add_argument("--metric", default="psnr")
    r = sub.add_parser("regressions")
    r.add_argument("run_dir")
    r.add_argument("baseline_dir")
    r.add_argument("--metric", default="psnr")
    c = sub.add_parser("calibration")
    c.add_argument("run_dir")
    c.add_argument("baseline_dir")
    c.add_argument("--metric", default="psnr")
    args = p.parse_args(argv)
    if args.cmd == "status":
        return check_status(args.results_roots)
    if args.cmd == "audit":
        return audit_run_pair(args.old_dir, args.new_dir, args.metric)
    if args.cmd == "regressions":
        return per_video_regressions(args.run_dir, args.baseline_dir,
                                     args.metric)
    if args.cmd == "calibration":
        return clip_gate_calibration(args.run_dir, args.baseline_dir,
                                     args.metric)


if __name__ == "__main__":
    main()
