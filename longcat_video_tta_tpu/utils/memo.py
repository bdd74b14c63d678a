"""Config-keyed memoization for jit-factory functions.

The engine/pipeline ``make_*``/``build_*`` factories return fresh
``jax.jit`` wrappers; each wrapper carries its own trace cache, so a
fresh wrapper per driver run re-traces (and re-loads from the
persistent compile cache) every program even when the configuration is
identical. In-process repeat runs — a sweep executing many runs in one
process (sweep/run_sweep.py), the test suite's dozens of tiny e2e
driver runs — pay that cost per run.

``memoize_factory`` shares one wrapper per distinct argument tuple.
Correctness relies on the factories being pure functions of their
arguments (they are: configs are frozen dataclasses, optimizer
transformations are stateless NamedTuples whose state lives in
opt_state, adapter schemes are init+to_forward pairs with no mutable
state). Unhashable arguments fall back to direct construction — the
memo is an optimization, never a requirement.

The reference has no analogue (its torch runners are one process per
run; module load re-builds everything).
"""

from __future__ import annotations

import functools
import threading
from collections import OrderedDict

_LOCK = threading.Lock()

# Bounded: an in-process sweep over N DISTINCT configs would otherwise
# accumulate N wrappers (each pinning its compiled executables) for the
# process lifetime — wrappers that were GC-able per-run before
# memoization. LRU keeps the repeat-run benefit (equal-config runs are
# adjacent in sweeps and tests) while bounding growth; an evicted
# wrapper is freed as soon as the last run using it drops its reference.
_MAX_ENTRIES = 32


def memoize_factory(fn, max_entries: int = _MAX_ENTRIES):
    """LRU-memoize a factory on its (hashable) arguments, falling back
    to a direct call when any argument is unhashable."""
    cache: OrderedDict = OrderedDict()

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        key = (args, tuple(sorted(kwargs.items())))
        try:
            hash(key)
        except TypeError:
            return fn(*args, **kwargs)
        with _LOCK:
            if key in cache:
                cache.move_to_end(key)
                return cache[key]
        out = fn(*args, **kwargs)
        with _LOCK:
            hit = cache.setdefault(key, out)
            cache.move_to_end(key)
            while len(cache) > max_entries:
                cache.popitem(last=False)
            return hit

    wrapper.__wrapped__ = fn
    wrapper.cache = cache  # introspection/tests
    return wrapper


@memoize_factory
def jit_for(fn, static_argnames=()):
    """One shared ``jax.jit`` wrapper per (function, static names) —
    replaces per-call ``jax.jit(lambda ...)`` sites whose fresh wrappers
    defeat jit's own trace cache."""
    import jax

    return jax.jit(fn, static_argnames=tuple(static_argnames))
