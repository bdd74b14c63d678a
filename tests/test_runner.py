"""End-to-end runner: tiny synthetic TTA run, resume, summary schema,
baseline runner, converter round-trip."""

import json
import os

import numpy as np
import pytest

from longcat_video_tta_tpu.runners import run_baseline, run_tta


def _run(tmp_path, method="delta_a", extra=()):
    out = str(tmp_path / f"out_{method}")
    argv = [
        "--method", method, "--preset", "longcat_tiny",
        "--synthetic", "2", "--output-dir", out,
        "--height", "16", "--width", "32",
        "--num-cond-frames", "5", "--num-frames", "5",
        "--gen-start-frame", "16", "--tta-total-frames", "13",
        "--tta-context-frames", "5",
        "--steps", "2", "--num-inference-steps", "2",
        "--es-check-every", "1", "--es-noise-draws", "1",
        "--es-anchor-sigmas", "0.5",
        "--caption-guard-mode", "off",
        "--no-save-videos",
        "--attn-impl", "xla",
        *extra,
    ]
    return out, run_tta.main(argv)


def test_delta_a_end_to_end(tmp_path):
    out, summary = _run(tmp_path, "delta_a")
    assert summary["num_success"] == 2
    assert summary["metrics"]["psnr"]["mean"] > 0
    assert os.path.exists(os.path.join(out, "summary.json"))
    assert os.path.exists(os.path.join(out, "checkpoint.json"))
    assert os.path.exists(os.path.join(out, "config.json"))
    r0 = summary["results"][0]
    assert r0["losses"] and r0["trainable_params"] == 32  # tiny adaln dim
    assert r0["early_stopping_info"]["loss_history"]


def test_video_parallel_driver_matches_sequential(tmp_path):
    """--video-parallel V through the product driver must reproduce the
    sequential per-video results exactly (VERDICT r2 #2: the batched
    engine path reachable from the CLI, padded-lane case included via 3
    videos / V=2), and --data-mesh 2 must not change the math."""
    _, seq = _run(tmp_path, "delta_a", extra=("--synthetic", "3"))
    _, vp = _run(tmp_path, "delta_a",
                 extra=("--synthetic", "3", "--video-parallel", "2",
                        "--output-dir", str(tmp_path / "out_vp")))
    _, vpm = _run(tmp_path, "delta_a",
                  extra=("--synthetic", "3", "--video-parallel", "2",
                         "--data-mesh", "2",
                         "--output-dir", str(tmp_path / "out_vpm")))
    assert vp["num_success"] == seq["num_success"] == 3
    for a, b in ((vp, seq), (vpm, seq)):
        for ra, rb in zip(a["results"], b["results"]):
            np.testing.assert_allclose(ra["psnr"], rb["psnr"], rtol=1e-4)
            np.testing.assert_allclose(ra["losses"], rb["losses"],
                                       rtol=1e-4, atol=1e-6)
            ea = ra["early_stopping_info"]
            eb = rb["early_stopping_info"]
            assert ea["best_step"] == eb["best_step"]
            assert ea["stopped_early"] == eb["stopped_early"]
            np.testing.assert_allclose(
                [x[1] for x in ea["loss_history"]],
                [x[1] for x in eb["loss_history"]], rtol=1e-4)


def test_context_mesh_driver_matches_single_device(tmp_path):
    """--context-mesh N through the product driver: ring context
    parallelism in the train chunk AND the KV-cache decode must
    reproduce the single-device results (ring attention == unsharded,
    test_parallel.py) — the CLI analogue of the reference's
    init_context_parallel (run_baseline.py:63-79)."""
    # width 64 -> 4 spatial tokens per latent frame (vae 8x * patch 2),
    # divisible by the 4-way ring (the driver preflights this)
    _, seq = _run(tmp_path, "delta_a", extra=("--width", "64"))
    _, cp = _run(tmp_path, "delta_a",
                 extra=("--width", "64", "--context-mesh", "4",
                        "--output-dir", str(tmp_path / "out_cp")))
    assert cp["num_success"] == seq["num_success"] == 2
    for ra, rb in zip(cp["results"], seq["results"]):
        np.testing.assert_allclose(ra["psnr"], rb["psnr"], rtol=1e-3)
        np.testing.assert_allclose(ra["losses"], rb["losses"],
                                   rtol=1e-3, atol=1e-5)
        # the ES anchor forward rides the ring too (review r3c #3):
        # its loss history must match the dense single-device anchor
        np.testing.assert_allclose(
            [x[1] for x in ra["early_stopping_info"]["loss_history"]],
            [x[1] for x in rb["early_stopping_info"]["loss_history"]],
            rtol=1e-3, atol=1e-5)
    with pytest.raises(SystemExit):  # nhw=2 at width 32: preflight
        _run(tmp_path, "delta_a",
             extra=("--context-mesh", "4",
                    "--output-dir", str(tmp_path / "out_cp_bad")))


def test_tensor_mesh_and_tp_cp_driver_match_single_device(tmp_path):
    """--tensor-mesh N (megatron TP via param shardings + GSPMD) and the
    combined TPxCP mesh through the product driver must reproduce the
    single-device results — the CLI analogue of the aot_13b.py TP4xCP2
    flagship plan."""
    _, seq = _run(tmp_path, "delta_a")
    _, tp = _run(tmp_path, "delta_a",
                 extra=("--tensor-mesh", "2",
                        "--output-dir", str(tmp_path / "out_tp")))
    _, tpcp = _run(tmp_path, "delta_a",
                   extra=("--tensor-mesh", "2", "--context-mesh", "2",
                          "--output-dir", str(tmp_path / "out_tpcp")))
    assert tp["num_success"] == tpcp["num_success"] == seq["num_success"]
    for a in (tp, tpcp):
        for ra, rb in zip(a["results"], seq["results"]):
            np.testing.assert_allclose(ra["psnr"], rb["psnr"], rtol=1e-3)
            np.testing.assert_allclose(ra["losses"], rb["losses"],
                                       rtol=1e-3, atol=1e-5)


def test_context_mesh_rejects_unsupported_combos(tmp_path):
    with pytest.raises(SystemExit):
        _run(tmp_path, "delta_a",
             extra=("--context-mesh", "4", "--bsa-keep-ratio", "0.5"))
    with pytest.raises(SystemExit):
        _run(tmp_path, "delta_a",
             extra=("--context-mesh", "4", "--video-parallel", "2"))
    # int8qk rides the chip-local BSA kernel: the preflight must catch
    # it up front, not after the training budget is spent (review r3c #2)
    with pytest.raises(SystemExit):
        _run(tmp_path, "delta_a",
             extra=("--context-mesh", "4", "--width", "64",
                    "--quantize-decode", "int8qk"))


def test_video_parallel_padded_group_stops_on_es(tmp_path):
    """A padded group (1 real video, V=2) must exit the training loop
    when the real lane early-stops — padded lanes may not hold the loop
    open to the full --steps (review r3 #4)."""
    _, vp = _run(tmp_path, "delta_a",
                 extra=("--synthetic", "1", "--video-parallel", "2",
                        "--steps", "40", "--es-patience", "1",
                        "--output-dir", str(tmp_path / "out_es")))
    r = vp["results"][0]
    es = r["early_stopping_info"]
    assert es["stopped_early"], "need an early-stopping run to test this"
    assert r["vp_steps_executed"] < 40, (
        "group loop ran to full --steps despite all real lanes stopping")


def test_video_parallel_bad_video_attributed_to_itself(tmp_path):
    """A corrupt video inside a --video-parallel group must fail only
    itself; the healthy group member keeps its results (review r3 #1)."""
    data = run_tta.make_synthetic_dataset(
        str(tmp_path / "data"), 2, 16, 32)
    with open(os.path.join(data, "clip_001.npy"), "wb") as f:
        f.write(b"not an npy file")
    out = str(tmp_path / "out_bad")
    summary = run_tta.main([
        "--method", "delta_a", "--preset", "longcat_tiny",
        "--data-dir", data, "--output-dir", out,
        "--height", "16", "--width", "32",
        "--num-cond-frames", "5", "--num-frames", "5",
        "--gen-start-frame", "16", "--tta-total-frames", "13",
        "--tta-context-frames", "5",
        "--steps", "2", "--num-inference-steps", "2",
        "--es-check-every", "1", "--es-noise-draws", "1",
        "--es-anchor-sigmas", "0.5",
        "--caption-guard-mode", "off", "--no-save-videos",
        "--attn-impl", "xla", "--video-parallel", "2",
    ])
    by_vid = {r["video"]: r for r in summary["results"]}
    assert by_vid["clip_000.npy"]["success"], (
        "healthy video lost its results to the group's broken member")
    assert not by_vid["clip_001.npy"]["success"]
    assert "error" in by_vid["clip_001.npy"]
    assert summary["num_success"] == 1


def test_baseline_end_to_end(tmp_path):
    out = str(tmp_path / "base")
    summary = run_baseline.main([
        "--preset", "longcat_tiny", "--synthetic", "2", "--output-dir", out,
        "--height", "16", "--width", "32",
        "--num-cond-frames", "5", "--num-frames", "5",
        "--gen-start-frame", "16",
        "--num-inference-steps", "2",
        "--caption-guard-mode", "off", "--no-save-videos",
        "--attn-impl", "xla",
    ])
    assert summary["method"] == "none"
    assert summary["num_success"] == 2
    assert summary["avg_train_time"] == 0.0
    assert os.path.exists(os.path.join(out, "per_video_metrics.csv"))


def test_dno_method_end_to_end(tmp_path):
    """--method dno (VERDICT r3 Missing #3): the SAVi-DNO comparison as a
    results-producing run through the unified driver — per-video noise
    optimization, generation from the carried noise, the standard
    checkpoint/summary contract (so compare_all and the exporter consume
    it like any other method). Reference: savi_dno.py:1-399."""
    out, summary = _run(tmp_path, "dno",
                        extra=("--dno-sampler-steps", "2",
                               "--dno-interp-p", "0.9",
                               "--dno-interp-every", "1"))
    assert summary["method"] == "dno"
    assert summary["num_success"] == 2
    assert summary["metrics"]["psnr"]["mean"] > 0
    assert os.path.exists(os.path.join(out, "summary.json"))
    assert os.path.exists(os.path.join(out, "checkpoint.json"))
    r0 = summary["results"][0]
    assert len(r0["losses"]) == 2
    assert all(np.isfinite(r0["losses"]))
    # the trainable object is the init noise, not adapter weights
    assert r0["trainable_params"] > 0 and np.isfinite(r0["noise_norm"])
    assert "adapter_norm" not in r0
    # noise-opt must actually move the objective
    assert r0["losses"][1] != r0["losses"][0]


def test_dno_rejects_unsupported_combos(tmp_path):
    with pytest.raises(SystemExit, match="video-parallel"):
        _run(tmp_path, "dno", extra=("--video-parallel", "2"))
    with pytest.raises(SystemExit, match="compose"):
        _run(tmp_path, "dno", extra=("--aug-enabled",))


def test_fast_decode_verify_records_fidelity(tmp_path):
    """--fast-decode-verify K (VERDICT r3 #7): the first K videos also
    generate dense (same seed) and the summary carries fast-vs-dense
    PSNR + per-metric deltas, so real-weight campaigns prove the lever
    stack metric-neutral in the product path."""
    out, summary = _run(tmp_path, "none",
                        extra=("--quantize-decode", "int8",
                               "--fast-decode-verify", "1",
                               "--es-disable"))
    recs = [r for r in summary["results"] if "fast_decode_verify" in r]
    assert len(recs) == 1  # K=1 of 2 videos
    fdv = recs[0]["fast_decode_verify"]
    assert fdv["same_noise"] is True
    assert np.isfinite(fdv["psnr_fast_vs_dense"])
    # int8 decode is near-exact at tiny scale: fast ~= dense
    assert fdv["psnr_fast_vs_dense"] > 20.0
    assert "psnr_delta" in fdv and abs(fdv["psnr_delta"]) < 3.0
    agg = summary["fast_decode_verify"]
    assert agg["num_verified"] == 1 and agg["same_noise"]
    assert np.isfinite(agg["psnr_fast_vs_dense_mean"])


def test_fast_decode_verify_preflights(tmp_path):
    with pytest.raises(SystemExit, match="no decode lever"):
        _run(tmp_path, "none", extra=("--fast-decode-verify", "1"))
    with pytest.raises(SystemExit, match="generation"):
        _run(tmp_path, "none", extra=("--fast-decode-verify", "1",
                                      "--quantize-decode", "int8",
                                      "--skip-generation"))


def test_batch_tta_stamps_retrieval_embedder(tmp_path):
    """VERDICT r3 Weak #7: without SBERT weights the hashed-BoW fallback
    runs, and the run's config.json must record that (batch-TTA
    conclusions drawn with the fallback don't transfer)."""
    out, first = _run(tmp_path, "delta_a")  # creates synthetic_data
    pool_dir = os.path.join(out, "synthetic_data")
    out2, summary = _run(tmp_path, "delta_a",
                         extra=("--batch-videos", "2",
                                "--retrieval-pool-dir", pool_dir,
                                "--output-dir", str(tmp_path / "batch")))
    assert summary["num_success"] == 2
    cfg = json.load(open(os.path.join(str(tmp_path / "batch"),
                                      "config.json")))
    assert cfg["retrieval_embedder"] == "hashed_bow"


def test_resume_skips_completed(tmp_path):
    out, summary = _run(tmp_path, "delta_c")
    # re-run: checkpoint says next_idx=2 -> no new work, same results
    out2, summary2 = _run(tmp_path, "delta_c")
    assert summary2["num_videos"] == 2
    assert [r["video"] for r in summary2["results"]] == \
        [r["video"] for r in summary["results"]]


def test_lora_method_end_to_end(tmp_path):
    out, summary = _run(tmp_path, "lora",
                        extra=("--lora-rank", "2", "--target-blocks",
                               "last_1"))
    assert summary["num_success"] == 2
    assert summary["results"][0]["trainable_params"] > 0


def test_convert_roundtrip(tmp_path):
    """Synthetic torch-layout state_dict -> our tree -> forward works."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from longcat_video_tta_tpu.config import longcat_tiny
    from longcat_video_tta_tpu.models import dit as M
    from longcat_video_tta_tpu.models.convert import convert_torch_dit_state

    cfg = longcat_tiny().dit
    rng = np.random.RandomState(0)
    D, Ct, F, dh, L = (cfg.hidden_size, cfg.adaln_tembed_dim, cfg.ffn_dim,
                       cfg.head_dim, cfg.depth)
    pdim = cfg.patch_size[0] * cfg.patch_size[1] * cfg.patch_size[2] \
        * cfg.in_channels
    out_dim = cfg.patch_size[0] * cfg.patch_size[1] * cfg.patch_size[2] \
        * cfg.out_channels

    def lin(o, i):
        return rng.randn(o, i).astype(np.float32) * 0.02

    sd = {
        "x_embedder.proj.weight": lin(D, pdim),
        "x_embedder.proj.bias": np.zeros(D, np.float32),
        "t_embedder.mlp.0.weight": lin(Ct, cfg.t_embed_freq_dim),
        "t_embedder.mlp.0.bias": np.zeros(Ct, np.float32),
        "t_embedder.mlp.2.weight": lin(Ct, Ct),
        "t_embedder.mlp.2.bias": np.zeros(Ct, np.float32),
        "y_embedder.y_proj.0.weight": lin(D, cfg.text_dim),
        "y_embedder.y_proj.0.bias": np.zeros(D, np.float32),
        "y_embedder.y_proj.2.weight": lin(D, D),
        "y_embedder.y_proj.2.bias": np.zeros(D, np.float32),
        "final_layer.adaLN_modulation.1.weight": lin(2 * D, Ct),
        "final_layer.adaLN_modulation.1.bias": np.zeros(2 * D, np.float32),
        "final_layer.linear.weight": lin(out_dim, D),
        "final_layer.linear.bias": np.zeros(out_dim, np.float32),
    }
    for i in range(L):
        sd.update({
            f"blocks.{i}.adaLN_modulation.1.weight": lin(6 * D, Ct),
            f"blocks.{i}.adaLN_modulation.1.bias": np.zeros(6 * D, np.float32),
            f"blocks.{i}.attn.qkv.weight": lin(3 * D, D),
            f"blocks.{i}.attn.qkv.bias": np.zeros(3 * D, np.float32),
            f"blocks.{i}.attn.proj.weight": lin(D, D),
            f"blocks.{i}.attn.proj.bias": np.zeros(D, np.float32),
            f"blocks.{i}.attn.q_norm.weight": np.ones(dh, np.float32),
            f"blocks.{i}.attn.k_norm.weight": np.ones(dh, np.float32),
            f"blocks.{i}.cross_attn.q_linear.weight": lin(D, D),
            f"blocks.{i}.cross_attn.q_linear.bias": np.zeros(D, np.float32),
            f"blocks.{i}.cross_attn.kv_linear.weight": lin(2 * D, D),
            f"blocks.{i}.cross_attn.kv_linear.bias": np.zeros(2 * D, np.float32),
            f"blocks.{i}.cross_attn.proj.weight": lin(D, D),
            f"blocks.{i}.cross_attn.proj.bias": np.zeros(D, np.float32),
            f"blocks.{i}.cross_attn.q_norm.weight": np.ones(dh, np.float32),
            f"blocks.{i}.cross_attn.k_norm.weight": np.ones(dh, np.float32),
            f"blocks.{i}.pre_crs_attn_norm.weight": np.ones(D, np.float32),
            f"blocks.{i}.pre_crs_attn_norm.bias": np.zeros(D, np.float32),
            f"blocks.{i}.ffn.w1.weight": lin(F, D),
            f"blocks.{i}.ffn.w3.weight": lin(F, D),
            f"blocks.{i}.ffn.w2.weight": lin(D, F),
        })

    params = convert_torch_dit_state(sd, cfg)
    # shape-compatible with init_dit
    ref_shapes = jax.eval_shape(lambda k: M.init_dit(k, cfg),
                                jax.random.PRNGKey(0))
    got = jax.tree_util.tree_map(lambda x: x.shape, params)
    want = jax.tree_util.tree_map(lambda x: x.shape, ref_shapes)
    assert got == want
    # and the converted tree runs
    lat = jnp.zeros((1, cfg.in_channels, 2, 4, 4))
    text = jnp.zeros((1, cfg.text_len, cfg.text_dim))
    mask = jnp.ones((1, cfg.text_len), jnp.int32)
    out = M.dit_forward(params, cfg, lat, jnp.zeros((1,)), text, mask)
    assert np.isfinite(np.asarray(out)).all()


def test_native_prefetch_run(tmp_path):
    out, summary = _run(tmp_path, "delta_c", extra=("--native-prefetch",))
    assert summary["num_success"] == 2


def test_save_adapters_and_eval_runner(tmp_path):
    """run_tta --save-adapters persists per-video adapter state; the
    evaluate_delta analogue re-generates in adapted and baseline modes
    from the saved run (reference: evaluate_delta.py:1-301)."""
    import json
    import os

    from longcat_video_tta_tpu.runners import run_eval_adapters

    out, summary = _run(tmp_path, "delta_a", extra=("--save-adapters",))
    rows = [r for r in summary["results"] if r.get("success")]
    assert all(r.get("adapter_path") for r in rows)
    assert os.path.isdir(os.path.join(out, "adapters"))

    ev_out = str(tmp_path / "eval_adapted")
    ev = run_eval_adapters.main([
        "--results-dir", out, "--output-dir", ev_out, "--mode", "adapted",
        "--num-inference-steps", "2", "--no-save-videos",
        "--attn-impl", "xla",
    ])
    assert ev["num_success"] == 2
    assert "psnr" in ev["metrics"]
    on_disk = json.load(open(os.path.join(ev_out, "eval_summary.json")))
    assert on_disk["mode"] == "adapted"

    ev_b = run_eval_adapters.main([
        "--results-dir", out, "--output-dir", str(tmp_path / "eval_base"),
        "--mode", "baseline", "--num-inference-steps", "2",
        "--no-save-videos", "--attn-impl", "xla",
    ])
    assert ev_b["num_success"] == 2


def test_step_keys_no_cross_video_aliasing():
    """fold_in-based keys: no (video, step) pair shares a key with any
    other — the old seed*1000+idx*100+t arithmetic aliased video i step
    t>=100 with video i+1 step t-100 (steps>=200 sweep configs)."""
    import numpy as np

    from longcat_video_tta_tpu.runners.run_tta import step_keys

    keys = np.concatenate(
        [np.asarray(step_keys(42, idx, 0, 250)) for idx in range(5)])
    uniq = {tuple(k) for k in keys}
    assert len(uniq) == 5 * 250


def test_remat_policy_flag_end_to_end(tmp_path):
    """--remat-policy overrides the preset policy; dots_attn through the
    xla-attention CPU path (no named residuals to save) must still run
    and produce a finite loss."""
    out, summary = _run(tmp_path, "delta_a",
                        extra=("--remat-policy", "dots_attn"))
    assert summary["num_success"] == 2
    assert summary["config"]["remat_policy"] == "dots_attn"
    assert np.isfinite(summary["results"][0]["losses"][-1])


def test_fast_decode_bundle_defaults():
    """--fast-decode fills unset lever flags (geometry-aware BSA keep);
    explicitly-set flags win."""
    p = run_tta.build_arg_parser()
    a = p.parse_args(["--output-dir", "/tmp/x", "--fast-decode",
                      "--num-frames", "92"])
    run_tta.apply_fast_decode_defaults(a)
    assert a.quantize_decode == "int8"
    assert a.bsa_keep_ratio == 0.15      # 24 gen latents -> long horizon
    assert a.pab_every == 4 and a.pab_start_frac == 0.06
    assert a.gen_segment_steps == 5
    b = p.parse_args(["--output-dir", "/tmp/x", "--fast-decode",
                      "--num-frames", "28", "--pab-every", "2",
                      "--quantize-decode", "int8qk"])
    run_tta.apply_fast_decode_defaults(b)
    assert b.quantize_decode == "int8qk"  # explicit wins
    assert b.bsa_keep_ratio == 0.35       # short horizon
    assert b.pab_every == 2 and b.pab_start_frac == 0.1
    assert b.gen_segment_steps == 0
    # 57 frames = exactly 15 gen latents: one below the 0.15-keep
    # floor (the 4k+1-aware count; the naive (nf+3)//4+1 overcounts)
    c_ = p.parse_args(["--output-dir", "/tmp/x", "--fast-decode",
                       "--num-frames", "57"])
    run_tta.apply_fast_decode_defaults(c_)
    assert c_.bsa_keep_ratio == 0.35
    # explicit broadcast range survives the bundle
    d_ = p.parse_args(["--output-dir", "/tmp/x", "--fast-decode",
                       "--pab-start-frac", "0.3",
                       "--pab-end-frac", "0.8"])
    run_tta.apply_fast_decode_defaults(d_)
    assert d_.pab_every == 4
    assert d_.pab_start_frac == 0.3 and d_.pab_end_frac == 0.8


def test_fast_decode_skips_bsa_on_joint_volume_archs():
    """--fast-decode must not enable BSA for cogvideox/mmdit presets
    (their samplers fail-loud on it); int8 + PAB still apply."""
    p = run_tta.build_arg_parser()
    a = p.parse_args(["--output-dir", "/tmp/x", "--fast-decode",
                      "--preset", "cogvideox_tiny", "--num-frames", "92"])
    run_tta.apply_fast_decode_defaults(a)
    assert a.bsa_keep_ratio == 0.0
    assert a.quantize_decode == "int8" and a.pab_every == 4


def test_startup_preflights_reject_wasteful_combos(tmp_path):
    """Lever combos that generate_vc rejects (or silently drops) at
    decode time must die at STARTUP, before any training compute is
    spent (review r3c #4/#5/#9/#10)."""
    cases = [
        ("--preset", "cogvideox_tiny", "--bsa-keep-ratio", "0.5"),
        ("--preset", "cogvideox_tiny", "--bucket-gen"),
        ("--preset", "opensora_v2_tiny", "--quantize-decode", "int8qk"),
        ("--no-kv-cache", "--pab-every", "4"),
        ("--no-kv-cache", "--bsa-keep-ratio", "0.5"),
        ("--no-kv-cache", "--quantize-decode", "int8qk"),
        ("--compute-vbench", "--no-save-videos"),
        ("--compute-vbench", "--skip-generation"),
        ("--batch-videos", "2", "--aug-enabled", "--aug-hflip"),
    ]
    for extra in cases:
        with pytest.raises(SystemExit):
            _run(tmp_path, "delta_a", extra=extra)
        # a startup abort must not leave a results checkpoint behind
        assert not os.path.exists(
            os.path.join(str(tmp_path / "out_delta_a"), "checkpoint.json")
        ), extra


def test_fast_decode_skips_pab_without_kv_cache():
    """--fast-decode on a --no-kv-cache run degrades to int8+segmenting
    instead of injecting the PAB/BSA levers the preflight rejects."""
    p = run_tta.build_arg_parser()
    a = p.parse_args(["--output-dir", "/tmp/x", "--fast-decode",
                      "--num-frames", "92", "--no-kv-cache"])
    run_tta.apply_fast_decode_defaults(a)
    assert a.pab_every == 0 and a.bsa_keep_ratio == 0.0
    assert a.quantize_decode == "int8" and a.gen_segment_steps == 5


def test_fast_decode_skips_bsa_under_mesh_flags():
    """--fast-decode must not inject BSA when --context-mesh or
    --tensor-mesh is set (the mesh preflight rejects BSA, so the bundle
    would turn a valid combo into a SystemExit — review r3c #1)."""
    p = run_tta.build_arg_parser()
    for mesh_flag in ("--context-mesh", "--tensor-mesh"):
        a = p.parse_args(["--output-dir", "/tmp/x", "--fast-decode",
                          "--num-frames", "92", mesh_flag, "2"])
        run_tta.apply_fast_decode_defaults(a)
        assert a.bsa_keep_ratio == 0.0, mesh_flag
        assert a.quantize_decode == "int8" and a.pab_every == 4


def test_compile_cache_policy(tmp_path, monkeypatch):
    """--compile-cache-dir resolution: explicit path wins, off/empty
    disable, 'auto' honors $LONGCAT_TTA_COMPILE_CACHE and never
    overrides a cache dir an outer harness (conftest) already set."""
    import jax

    from longcat_video_tta_tpu.utils.compile_cache import (
        enable_compile_cache, resolve_cache_dir)

    assert resolve_cache_dir(str(tmp_path / "c")) == str(tmp_path / "c")
    for off in ("off", "none", "", None):
        assert resolve_cache_dir(off) is None
    monkeypatch.setenv("LONGCAT_TTA_COMPILE_CACHE", str(tmp_path / "e"))
    assert resolve_cache_dir("auto") == str(tmp_path / "e")
    monkeypatch.setenv("LONGCAT_TTA_COMPILE_CACHE", "off")
    assert resolve_cache_dir("auto") is None
    monkeypatch.delenv("LONGCAT_TTA_COMPILE_CACHE")
    assert resolve_cache_dir("auto").endswith("longcat_tta_xla")

    # the suite pins the runner's cache policy off (conftest sets
    # $LONGCAT_TTA_COMPILE_CACHE=off — the serialize() crash guard), so
    # in-process run_tta calls must leave the cache disabled
    monkeypatch.setenv("LONGCAT_TTA_COMPILE_CACHE", "off")
    before = jax.config.jax_compilation_cache_dir
    assert enable_compile_cache("auto") is None
    assert jax.config.jax_compilation_cache_dir == before
    try:
        # an outer-configured cache is never silently redirected by auto
        jax.config.update("jax_compilation_cache_dir",
                          str(tmp_path / "outer"))
        assert enable_compile_cache("auto") is None
        assert jax.config.jax_compilation_cache_dir == \
            str(tmp_path / "outer")
        p = enable_compile_cache(str(tmp_path / "x"))
        assert p == str(tmp_path / "x") and os.path.isdir(p)
        assert jax.config.jax_compilation_cache_dir == p
    finally:
        jax.config.update("jax_compilation_cache_dir", before)


def test_stop_file_drains_and_resumes(tmp_path):
    """Graceful drain (the scancel+requeue analogue): a STOP file at a
    video boundary checkpoints and exits WITHOUT summary.json; removing
    it and re-running resumes from the checkpoint and completes."""
    out = str(tmp_path / "out_drain")
    os.makedirs(out)
    stop = os.path.join(out, "STOP")
    open(stop, "w").close()
    _, drained = _run(tmp_path, "delta_a",
                      extra=("--output-dir", out))
    assert drained == {"drained": True, "next_idx": 0, "num_videos": 0}
    assert not os.path.exists(os.path.join(out, "summary.json"))
    # explicit drain sentinel (the sweep's classification signal) and a
    # checkpoint even at idx 0, so "checkpointed; re-run to resume" is
    # always true (ADVICE r4)
    assert os.path.exists(os.path.join(out, "DRAINED"))
    assert json.load(open(os.path.join(
        out, "checkpoint.json")))["next_idx"] == 0

    os.remove(stop)
    _, summary = _run(tmp_path, "delta_a", extra=("--output-dir", out))
    assert summary["num_success"] == 2
    assert os.path.exists(os.path.join(out, "summary.json"))
    # the resumed run clears the stale sentinel
    assert not os.path.exists(os.path.join(out, "DRAINED"))


def test_sweep_stop_file_skips_pending_rows(tmp_path, monkeypatch):
    """A fleet-level stop file stops run_sweep from launching further
    rows; the skipped rows are recorded as drained, not failed."""
    import yaml

    from longcat_video_tta_tpu.sweep.run_sweep import run_sweep

    cfg = {
        "method": "delta_a", "series": "drain_t",
        "fixed": {"preset": "longcat_tiny", "synthetic": 1,
                  "height": 16, "width": 32, "num_cond_frames": 5,
                  "num_frames": 5, "gen_start_frame": 16,
                  "tta_total_frames": 13, "tta_context_frames": 5,
                  "steps": 1, "num_inference_steps": 1,
                  "attn_impl": "xla", "caption_guard_mode": "off",
                  "no_save_videos": True},
        "sweep": [{"run_id": "A"}, {"run_id": "B"}],
    }
    cfg_path = str(tmp_path / "drain.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    base = str(tmp_path / "res")
    os.makedirs(base)
    open(os.path.join(base, "STOP"), "w").close()
    launched = run_sweep(cfg_path, base)
    assert [r["status"] for r in launched] == ["drained (not launched)",
                                               "drained (not launched)"]
