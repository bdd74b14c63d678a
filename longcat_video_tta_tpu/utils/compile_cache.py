"""Persistent XLA compilation cache for the product runners.

The reference amortizes nothing: every SLURM job pays the full CUDA
kernel-selection/cudagraph warmup again (run_sweep.sbatch dispatches a
fresh process per row). On TPU the analogous cost is much larger — the
first video of a run pays the whole jit set (train step, ES anchor,
sampler, VAE; ~minutes at bench scale) — but XLA compiles are
content-addressed and serializable, so a persistent on-disk cache makes
every later run with the same geometry start warm: sweep rows differ in
runtime values (lr, steps, seeds), not compiled programs, so across a
sweep the compile set is paid ~once per geometry instead of once per
row.

``resolve_cache_dir`` policy:
  - explicit path  -> use it
  - "auto" (default) -> $LONGCAT_TTA_COMPILE_CACHE if set, else
    ~/.cache/longcat_tta_xla; but never override a cache dir some
    outer harness (e.g. tests/conftest.py) already configured
  - "off"/"" -> disabled
"""

from __future__ import annotations

import os
from typing import Optional

_MIN_COMPILE_SECS = 0.5


def resolve_cache_dir(flag: Optional[str]) -> Optional[str]:
    if flag is None or flag.lower() in ("off", "none", ""):
        return None
    if flag != "auto":
        return os.path.expanduser(flag)
    env = os.environ.get("LONGCAT_TTA_COMPILE_CACHE")
    if env:
        return None if env.lower() in ("off", "none") else \
            os.path.expanduser(env)
    return os.path.expanduser("~/.cache/longcat_tta_xla")


def enable_compile_cache(flag: Optional[str] = "auto") -> Optional[str]:
    """Point JAX's persistent compilation cache at ``flag`` (see module
    docstring for the "auto"/"off" policy). Returns the directory in
    effect, or None when disabled / left to an outer configuration."""
    import jax

    if flag == "auto" and jax.config.jax_compilation_cache_dir:
        # an outer harness (tests, a notebook) already chose a cache —
        # "auto" must not silently redirect it
        return None
    path = resolve_cache_dir(flag)
    if path is None:
        return None
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      _MIN_COMPILE_SECS)
    return path
