"""Run progress checkpointing + result persistence.

Reference contract (common.py:2032-2059): JSON ``checkpoint.json``
{next_idx, results} written after every video for per-video resume
(SLURM preempt+requeue relies on it, run_sweep.sbatch:11-12);
``summary.json`` at the end; ``config.json`` per run. Adapter/model
state snapshots use orbax when requested.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, List, Optional


def _atomic_write_json(path: str, obj: Any):
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, indent=2, default=_json_default)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _json_default(o):
    import numpy as np

    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    if hasattr(o, "item"):
        return o.item()
    return str(o)


def save_checkpoint(path: str, next_idx: int, results: List[Dict]):
    """{next_idx, results} after each video (common.py:2047-2059)."""
    _atomic_write_json(path, {"next_idx": next_idx, "results": results})


def load_checkpoint(path: str) -> Optional[Dict[str, Any]]:
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def save_results(path: str, summary: Dict[str, Any]):
    _atomic_write_json(path, summary)


def environment_provenance() -> Dict[str, Any]:
    """Framework git commit + library versions + device inventory,
    recorded into every run's config.json (the reference logs repo git
    commits and python/torch/transformers versions per job,
    run_sweep.sbatch:177-200)."""
    import subprocess
    import sys

    prov: Dict[str, Any] = {"python": sys.version.split()[0]}
    try:
        repo_dir = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        prov["git_commit"] = subprocess.run(
            ["git", "-C", repo_dir, "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        prov["git_commit"] = None
    for mod in ("jax", "numpy", "optax", "flax"):
        try:
            prov[mod] = __import__(mod).__version__
        except Exception:
            pass
    try:
        import jax

        prov["backend"] = jax.default_backend()
        prov["num_devices"] = jax.device_count()
    except Exception:
        pass
    return prov


def save_config(path: str, config: Dict[str, Any]):
    doc = dict(config)
    if "environment" not in doc:
        doc["environment"] = environment_provenance()
    _atomic_write_json(path, doc)


def save_adapter_state(path: str, train_params):
    """Persist adapter/model trainable state with orbax
    (reference: per-video torch.save of LoRA weights,
    run_lora_tta.py:412-418)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), train_params, force=True)


def load_adapter_state(path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))
