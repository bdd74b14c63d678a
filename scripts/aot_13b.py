#!/usr/bin/env python3
"""AOT-compile the flagship 13.6B LongCat geometry under a TP x CP mesh
and report per-chip memory (VERDICT r1 item 4).

No weights are materialized: the forward and the delta_a TTA train step
are lowered from ShapeDtypeStructs with GSPMD shardings (megatron TP
over qkv/ffn from parallel/sharding.py, ring context parallelism over
the latent W axis) on a virtual device mesh, compiled, and
memory-analyzed. This proves the 13.6B sharding plan compiles and bounds
its per-chip HBM without needing 8 real chips.

Sharding plan (v5e-8 / v5p-8 slice):
  mesh = (data=1, context=2, tensor=4)
  params: bf16 13.6B -> TP4 = ~6.8 GB/chip (fits v5e 16 GB; v5p trivially)
  activations: 480p latent grid sharded over context
  delta_a trainable state: 512 params, replicated

Usage:
    python scripts/aot_13b.py [--preset longcat_13b] [--devices 8]
    [--context 2] [--tensor 4]

``--execute`` upgrades the proof from "compiles" to "runs" (VERDICT r3
Weak #2): the full 13.6B bf16 parameter tree (~27 GiB) is materialized
host-side across the virtual mesh, and the SAME compiled executables
run one real forward and one real delta_a train step — wall times,
output statistics, and loss finiteness are recorded in the JSON.
Pass a small spatial grid (--lat-h 8 --lat-w 16) so single-CPU compute
stays in minutes; depth 48 / hidden 4096 / 48 heads are untouched —
the point is numerical sanity and a working sharded execution at the
real parameter count, not throughput (bench.py owns throughput).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bootstrap_cpu(n: int):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags +
                 f" --xla_force_host_platform_device_count={n}").strip()
    if "collective_call_terminate_timeout" not in flags:
        # On a 1-core host the N virtual-device threads reach a
        # collective MINUTES apart at 13.6B scale; XLA:CPU's default
        # 40 s rendezvous termination kills the process mid-forward
        # (observed: all-to-all, 2/4 threads arrived). Hours-long
        # timeouts make --execute viable on any core count.
        flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds"
                  "=600"
                  " --xla_cpu_collective_call_terminate_timeout_seconds"
                  "=14400"
                  " --xla_cpu_collective_timeout_seconds=14400")
    os.environ["XLA_FLAGS"] = flags
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    try:
        import jax.extend.backend

        jax.extend.backend.clear_backends()
    except Exception:
        pass
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", n)
    except Exception:
        pass
    assert len(jax.devices()) >= n, jax.devices()


def fmt_bytes(b):
    return f"{b / 2 ** 30:.2f} GiB"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="longcat_13b")
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--context", type=int, default=2)
    p.add_argument("--tensor", type=int, default=4)
    p.add_argument("--lat-h", type=int, default=60)
    p.add_argument("--lat-w", type=int, default=104)
    p.add_argument("--execute", action="store_true",
                   help="materialize the full bf16 parameter tree and "
                        "run the compiled forward + train step for real "
                        "(use a small --lat-h/--lat-w grid)")
    args = p.parse_args(argv)

    bootstrap_cpu(args.devices)

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from longcat_video_tta_tpu.config import (
        AdapterConfig, MeshConfig, OptimConfig, get_model_config,
    )
    from longcat_video_tta_tpu.models import dit as M
    from longcat_video_tta_tpu.parallel import build_mesh
    from longcat_video_tta_tpu.parallel.sharding import (
        LATENT_SPEC, MASK_SPEC, TEXT_SPEC, param_shardings, param_specs,
    )
    from longcat_video_tta_tpu.tta import (
        build_optimizer, build_scheme, make_train_step,
    )

    cfg = get_model_config(args.preset)
    dcfg = cfg.dit
    mesh = build_mesh(MeshConfig(
        data=args.devices // (args.context * args.tensor),
        context=args.context, tensor=args.tensor))
    print(f"[aot] preset={args.preset} mesh={dict(mesh.shape)}", flush=True)

    pdt = jnp.bfloat16 if dcfg.param_dtype == "bfloat16" else jnp.float32
    param_shapes = jax.eval_shape(
        lambda k: M.init_dit(k, dcfg, zero_init=False), jax.random.PRNGKey(0))
    n_params = sum(
        int(x.size) for x in jax.tree_util.tree_leaves(param_shapes))
    print(f"[aot] {n_params / 1e9:.2f}B params "
          f"({fmt_bytes(n_params * 2)} bf16 total, "
          f"{fmt_bytes(n_params * 2 // args.tensor)}/chip at TP"
          f"{args.tensor})", flush=True)

    p_shard = param_shardings(mesh, param_shapes)
    B, C = 1, dcfg.in_channels
    lat = lambda t: jax.ShapeDtypeStruct((B, C, t, args.lat_h, args.lat_w),
                                         jnp.float32)
    text = jax.ShapeDtypeStruct((B, dcfg.text_len, dcfg.text_dim), pdt)
    mask = jax.ShapeDtypeStruct((B, dcfg.text_len), jnp.int32)
    tsteps = jax.ShapeDtypeStruct((B, 12), jnp.float32)
    lat_sh = NamedSharding(mesh, LATENT_SPEC)
    text_sh = NamedSharding(mesh, TEXT_SPEC)
    mask_sh = NamedSharding(mesh, MASK_SPEC)
    rep = NamedSharding(mesh, P())

    results = {}

    def analyze(name, lowered):
        t0 = time.time()
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        info = {
            "compile_s": round(time.time() - t0, 1),
            "argument_bytes": int(getattr(ma, "argument_size_in_bytes", 0)),
            "output_bytes": int(getattr(ma, "output_size_in_bytes", 0)),
            "temp_bytes": int(getattr(ma, "temp_size_in_bytes", 0)),
        }
        info["per_chip_total_bytes"] = (
            info["argument_bytes"] + info["output_bytes"]
            + info["temp_bytes"])
        results[name] = info
        print(f"[aot] {name}: compiled in {info['compile_s']}s | "
              f"args {fmt_bytes(info['argument_bytes'])} + temps "
              f"{fmt_bytes(info['temp_bytes'])} + out "
              f"{fmt_bytes(info['output_bytes'])} = "
              f"{fmt_bytes(info['per_chip_total_bytes'])}/chip",
              flush=True)
        return compiled

    with mesh:
        # ---- flagship forward: 4 cond + 8 gen latents @ 480p, ring CP --
        def fwd(params, latents, timesteps, text_emb, text_mask):
            return M.dit_forward(
                params, dcfg, latents, timesteps, text_emb, text_mask,
                num_cond_latents=4, attn_impl="xla",
                cp_mesh=mesh if args.context > 1 else None)

        lowered = jax.jit(
            fwd,
            in_shardings=(p_shard, lat_sh, rep, text_sh, mask_sh),
        ).lower(param_shapes, lat(12), tsteps, text, mask)
        compiled_fwd = analyze("dit_forward_480p_12lat", lowered)

        # ---- delta_a TTA train step (remat fwd+bwd+AdamW) -------------
        scheme = build_scheme(dcfg, AdapterConfig(method="delta_a"))
        tp_shapes = jax.eval_shape(
            lambda k: scheme.init(k, base_params=param_shapes),
            jax.random.PRNGKey(1))
        tx = build_optimizer(OptimConfig(lr=5e-3))
        opt_shapes = jax.eval_shape(tx.init, tp_shapes)
        step = make_train_step(scheme, dcfg, tx, attn_impl="xla",
                               cp_mesh=mesh if args.context > 1 else None)
        rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
        rep_tree = jax.tree_util.tree_map(lambda _: rep, tp_shapes)
        rep_opt = jax.tree_util.tree_map(lambda _: rep, opt_shapes)
        lowered = jax.jit(
            step.__wrapped__ if hasattr(step, "__wrapped__") else step,
            in_shardings=(rep_tree, rep_opt, p_shard, lat_sh, lat_sh,
                          text_sh, mask_sh, rep),
        ).lower(tp_shapes, opt_shapes, param_shapes, lat(2), lat(1),
                text, mask, rng)
        compiled_step = analyze("delta_a_train_step_cond2_train1", lowered)

        if args.execute:
            import hashlib

            import numpy as np

            # ---- materialize the REAL 13.6B bf16 tree, sharded -------
            # Host-side per-shard callbacks, NOT a jitted init: at 13.6B
            # a compiled init materializes fp32 RNG temps on top of the
            # CP-replicated bf16 tree and OOMs the 125 GiB host (first
            # attempt died at exit 137 exactly here). Shards are seeded
            # by (leaf name, slice bounds) so replicated shards hold
            # identical data; kernels ~ N(0, 0.02), norms = 1, biases =
            # 0 — the init_dit(zero_init=False) magnitudes, which is
            # what numerical sanity at depth 48 needs.
            t0 = time.time()

            def leaf_value(name, index, sds):
                bounds = [s.indices(d) for s, d in zip(index, sds.shape)]
                shape = tuple(len(range(*b)) for b in bounds)
                if name.endswith(("bias']", "['b1']", "['b2']")):
                    return np.zeros(shape, sds.dtype)
                if name.endswith(("q_norm']", "k_norm']",
                                  "norm']['weight']")):
                    return np.ones(shape, sds.dtype)
                seed = int.from_bytes(hashlib.md5(
                    (name + repr(bounds)).encode()).digest()[:4],
                    "little")
                # Generator + dtype=float32: RandomState.standard_normal
                # emits float64 (2x the bytes, ~2x the time) — at 13.6B
                # values the f64 detour is minutes of pure waste
                g = np.random.Generator(np.random.PCG64(seed))
                return (g.standard_normal(shape, dtype=np.float32)
                        * 0.02).astype(sds.dtype)

            def make_leaf(path, sds, sharding):
                name = jax.tree_util.keystr(path)
                return jax.make_array_from_callback(
                    sds.shape, sharding,
                    lambda index: leaf_value(name, index, sds))

            params = jax.tree_util.tree_map_with_path(
                make_leaf, param_shapes, p_shard)
            init_s = time.time() - t0
            pbytes = sum(x.nbytes for x in
                         jax.tree_util.tree_leaves(params))
            print(f"[exec] materialized {fmt_bytes(pbytes)} params "
                  f"in {init_s:.1f}s", flush=True)

            rs = np.random.RandomState(0)

            def put(shape, sh, dtype=np.float32, scale=1.0):
                return jax.device_put(
                    (rs.standard_normal(shape) * scale).astype(dtype), sh)

            t_in = put((B, dcfg.text_len, dcfg.text_dim), text_sh,
                       dtype=np.float32 if pdt == jnp.float32
                       else jnp.bfloat16)
            m_in = jax.device_put(
                np.ones((B, dcfg.text_len), np.int32), mask_sh)
            ts_in = jax.device_put(
                np.concatenate([np.zeros((B, 4)),
                                np.full((B, 8), 500.0)],
                               axis=1).astype(np.float32), rep)

            # ---- one real sharded forward -----------------------------
            t0 = time.time()
            out = compiled_fwd(params,
                               put((B, C, 12, args.lat_h, args.lat_w),
                                   lat_sh), ts_in, t_in, m_in)
            out = np.asarray(out, np.float32)
            fwd_s = time.time() - t0
            results["execute_forward"] = {
                "wall_s": round(fwd_s, 2),
                "finite": bool(np.isfinite(out).all()),
                "out_mean": float(out.mean()),
                "out_std": float(out.std()),
                "out_absmax": float(np.abs(out).max()),
            }
            print(f"[exec] forward: {fwd_s:.1f}s finite="
                  f"{results['execute_forward']['finite']} "
                  f"std={results['execute_forward']['out_std']:.4f}",
                  flush=True)

            # ---- one real delta_a train step ---------------------------
            tp = jax.device_put(
                scheme.init(jax.random.PRNGKey(1), base_params=params),
                rep_tree)
            opt_state = jax.device_put(tx.init(tp), rep_opt)
            t0 = time.time()
            tp2, _, loss = compiled_step(
                tp, opt_state, params,
                put((B, C, 2, args.lat_h, args.lat_w), lat_sh),
                put((B, C, 1, args.lat_h, args.lat_w), lat_sh),
                t_in, m_in,
                jax.device_put(np.asarray(
                    jax.random.PRNGKey(2), np.uint32), rep))
            loss = float(loss)
            step_s = time.time() - t0
            moved = float(sum(
                float(jnp.abs(a.astype(jnp.float32)
                              - b.astype(jnp.float32)).sum())
                for a, b in zip(jax.tree_util.tree_leaves(tp),
                                jax.tree_util.tree_leaves(tp2))))
            results["execute_train_step"] = {
                "wall_s": round(step_s, 2),
                "loss": loss,
                "loss_finite": bool(np.isfinite(loss)),
                "adapter_moved_l1": moved,
            }
            print(f"[exec] train step: {step_s:.1f}s loss={loss:.4f} "
                  f"adapter_moved_l1={moved:.3e}", flush=True)

    out = {"preset": args.preset, "n_params": n_params,
           "mesh": dict(mesh.shape),
           "lat_hw": [args.lat_h, args.lat_w], **results}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
