"""Test harness: force an 8-device virtual CPU mesh before jax imports.

SURVEY.md §4: multi-chip paths are validated on CPU via
``--xla_force_host_platform_device_count`` (the reference had no test
suite at all; this one follows its runtime-guard philosophy plus real
unit tests)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

import jax  # noqa: E402

# `pytest -m quick` tier (VERDICT r2 #10): one fast test per subsystem
# so a pre-commit loop stays under ~3 min on this 1-CPU box; the full
# suite remains the CI gate.
_QUICK_TESTS = {
    "test_attention.py::test_flash_fwd_matches_reference[0]",
    "test_baseline_tools.py::test_prune_creates_keep_list_and_results_md",
    "test_bsa.py::test_full_topk_equals_dense",
    "test_bucket.py::test_bucket_len_ladder",
    "test_clip_vision.py::test_image_embeds_match_hf",
    "test_cogvideox.py::test_forward_shapes_and_i2v_conditioning",
    "test_convert.py::test_vae_converter_raises_on_missing_key",
    "test_data_eval.py::test_psnr_ssim_behavior",
    "test_dit.py::test_forward_shape_and_dtype",
    "test_dit.py::test_zero_adapters_are_identity",
    "test_golden.py::test_dit_forward_golden",
    "test_i3d.py::test_i3d_converter_roundtrip_and_guard",
    "test_lpips.py::test_lpips_identity_and_symmetry",
    "test_mmdit.py::test_forward_shapes_t2v_and_cond",
    "test_native_loader.py::test_native_lib_builds",
    "test_parallel.py::test_mesh_axes",
    "test_parallel.py::test_sharded_forward_matches_single_device",
    "test_pipeline.py::test_generate_vc_shape",
    "test_pipeline.py::test_cfg_reuse_guidance1_is_exact",
    "test_runner.py::test_compile_cache_policy",
    "test_prep_diag.py::test_check_status",
    "test_quant.py::test_int8_linear_close_to_dense",
    "test_runner.py::test_delta_a_end_to_end",
    "test_scheduler.py::test_sigmas_monotone_and_terminal_zero",
    "test_sweep.py::test_load_config_validation",
    "test_t2v_eval_hooks.py::test_fvd_pairing_by_stem",
    "test_tta.py::test_method_trains_and_loss_decreases[delta_a]",
    "test_umt5.py::test_encode_shape",
    "test_vae.py::test_encode_shape",
    "test_xclip.py::test_xclip_gate_scorer",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.nodeid.split("/")[-1]
        if name in _QUICK_TESTS:
            item.add_marker(pytest.mark.quick)

# The axon TPU tunnel exports JAX_PLATFORMS=axon; the config update (not the
# env var) is what reliably pins tests to the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: DISABLED by default for the suite.
# Root cause (round 4/5 postmortem): with cache writes enabled the
# full run reproducibly dies (fresh or populated dir) with SIGABRT inside
# ``LoadedExecutable.serialize()`` (jax compilation_cache.py:265,
# put_executable_and_time) while writing the cache entry for a large
# train-step executable in test_tta.py — an XLA:CPU AOT-serialization
# bug in this jaxlib, order/state-dependent (the same test passes in
# isolation). The CI gate must FINISH deterministically, so the gate
# trades re-run compile time for correctness. Local iteration can
# opt back in with JAX_TEST_CACHE_DIR=<dir> (accepting the risk); use
# `pytest -m quick` for a fast pre-commit loop instead.
_cache_dir = os.environ.get("JAX_TEST_CACHE_DIR")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
else:
    # also pin the RUNNER's cache policy off: in-process run_tta calls
    # enable_compile_cache("auto"), which would otherwise enable
    # ~/.cache/longcat_tta_xla process-wide mid-suite and resurrect the
    # serialize() crash (utils/compile_cache.py honors this env).
    # FORCE (not setdefault): an inherited shell export pointing at a
    # real cache dir would silently re-arm the crash.
    os.environ["LONGCAT_TTA_COMPILE_CACHE"] = "off"
    # Master kill switch: even if a test (or code under test) sets
    # jax_compilation_cache_dir process-wide, no cache entry is read or
    # written — both the serialize() SIGABRT and the deserialize
    # SIGSEGV (round-5 postmortem: suite died at
    # compilation_cache.get_executable_and_time reading a stale
    # ~/.cache entry) go through this flag.
    jax.config.update("jax_enable_compilation_cache", False)


@pytest.fixture(autouse=True)
def _compile_cache_leak_guard():
    """No test may leave the persistent compile cache enabled for the
    tests that follow it (global jax.config is process-wide state)."""
    yield
    if not _cache_dir and jax.config.jax_compilation_cache_dir:
        jax.config.update("jax_compilation_cache_dir", None)
