"""utils/memo.py: factory memoization semantics.

The engine/pipeline factories are memoized so in-process repeat driver
runs (sweeps, this suite) share one jit wrapper — and its traces — per
distinct config instead of re-tracing per run. These tests pin the
cache-hit / unhashable-fallback contract and that the product factories
actually hit across repeat construction with equal configs.
"""

import functools

import jax.numpy as jnp

from longcat_video_tta_tpu.utils.memo import jit_for, memoize_factory


def test_memoize_factory_hits_on_equal_hashable_args():
    calls = []

    @memoize_factory
    def make(a, b=0):
        calls.append((a, b))
        return object()

    x = make(1, b=2)
    y = make(1, b=2)
    assert x is y
    assert len(calls) == 1
    assert make(1, b=3) is not x
    assert len(calls) == 2


def test_memoize_factory_lru_bound_evicts_oldest():
    calls = []

    @functools.partial(memoize_factory, max_entries=2)
    def make(a):
        calls.append(a)
        return object()

    first = make(1)
    make(2)
    make(3)  # evicts key 1
    assert make(1) is not first  # rebuilt after eviction
    assert len(calls) == 4
    assert len(make.cache) == 2


def test_memoize_factory_falls_back_on_unhashable():
    calls = []

    @memoize_factory
    def make(a):
        calls.append(a)
        return object()

    lst = [1, 2]
    x = make(lst)
    y = make(lst)
    assert x is not y  # no caching — direct construction both times
    assert len(calls) == 2


def test_jit_for_shares_wrapper_and_computes():
    def f(x, scale=1.0):
        return x * scale

    w1 = jit_for(f, ("scale",))
    w2 = jit_for(f, ("scale",))
    assert w1 is w2
    out = w1(jnp.arange(4.0), scale=2.0)
    assert out.tolist() == [0.0, 2.0, 4.0, 6.0]


def test_engine_factories_memoize_across_equal_configs():
    from longcat_video_tta_tpu.config import (
        AdapterConfig,
        OptimConfig,
        longcat_tiny,
    )
    from longcat_video_tta_tpu.tta.adapters import build_scheme
    from longcat_video_tta_tpu.tta.engine import build_optimizer

    dcfg = longcat_tiny().dit
    s1 = build_scheme(dcfg, AdapterConfig(method="delta_a"))
    s2 = build_scheme(dcfg, AdapterConfig(method="delta_a"))
    assert s1 is s2
    assert build_scheme(dcfg, AdapterConfig(method="lora")) is not s1

    t1 = build_optimizer(OptimConfig(lr=1e-4))
    t2 = build_optimizer(OptimConfig(lr=1e-4))
    assert t1 is t2
