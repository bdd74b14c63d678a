#!/usr/bin/env python3
"""AOT-compile the cross-backbone flagship geometries (CogVideoX-5B-I2V
and Open-Sora v2.0 MMDiT) under TP sharding and record per-chip memory
(VERDICT r2 #5 — the backbones' flagship-scale proof, the sibling of
scripts/aot_13b.py for LongCat).

No weights are materialized: the forward and the delta_a TTA train step
are lowered from ShapeDtypeStructs with GSPMD shardings
(parallel/sharding.py per-arch TP rules) on a virtual device mesh,
compiled and memory-analyzed.

Geometries:
  cogvideox_5b  — 49-frame 480x720 I2V (13 latents, 30x45 patches/frame
                  -> 17,550 video + 226 text tokens), diffusers
                  CogVideoX-5B-I2V shapes (common_cogvideo.py:39-218)
  opensora_v2   — 832x480 v2v (9 latents, 30x52 patches/frame), 19
                  double + 38 single blocks, cond_embed masks+ref
                  (common_opensora.py:247-411)

Usage:
    python scripts/aot_backbones.py [--devices 4] [--tensor 4]
        [--preset cogvideox_5b|opensora_v2|all]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from aot_13b import bootstrap_cpu, fmt_bytes  # noqa: E402


def analyze(results, name, lowered):
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
        info["argument_bytes"] + info["output_bytes"] + info["temp_bytes"])
    results[name] = info
    print(f"[aot] {name}: compiled in {info['compile_s']}s | "
          f"args {fmt_bytes(info['argument_bytes'])} + temps "
          f"{fmt_bytes(info['temp_bytes'])} + out "
          f"{fmt_bytes(info['output_bytes'])} = "
          f"{fmt_bytes(info['per_chip_total_bytes'])}/chip")


def run_preset(preset: str, mesh, tensor: int, geom=None):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from longcat_video_tta_tpu.config import (
        AdapterConfig, OptimConfig, get_model_config,
    )
    from longcat_video_tta_tpu.parallel.sharding import param_shardings
    from longcat_video_tta_tpu.tta import (
        build_optimizer, build_scheme, make_train_step,
    )

    cfg = get_model_config(preset)
    dcfg = cfg.dit
    arch = cfg.arch
    pdt = jnp.bfloat16 if dcfg.param_dtype == "bfloat16" else jnp.float32
    rep = NamedSharding(mesh, P())
    results = {}

    if arch == "cogvideox":
        from longcat_video_tta_tpu.models.cogvideox import (
            cogvideox_forward, init_cogvideox,
        )
        from longcat_video_tta_tpu.tta.losses import (
            cogvideox_flow_matching_loss_conditioned as arch_loss,
        )

        init_fn = lambda k: init_cogvideox(k, dcfg, zero_init=False)
        T, H, W = geom or (13, 60, 90)   # 49-frame 480x720 I2V
        Cl = dcfg.latent_channels
        lat = lambda t: jax.ShapeDtypeStruct((1, Cl, t, H, W), jnp.float32)
        text = jax.ShapeDtypeStruct((1, dcfg.text_len, dcfg.text_dim), pdt)

        def fwd(params, latents, timestep, text_emb, image_latents):
            return cogvideox_forward(params, dcfg, latents, timestep,
                                     text_emb, image_latents=image_latents,
                                     attn_impl="xla")

        fwd_args = (lat(T), jax.ShapeDtypeStruct((1,), jnp.float32),
                    text, lat(T))
        # engine slot for text_b is unused by the cogvideox loss
        text_b = jax.ShapeDtypeStruct((1, dcfg.text_len), jnp.int32)
    elif arch == "mmdit":
        from longcat_video_tta_tpu.models.mmdit import (
            init_mmdit, mmdit_forward,
        )
        from longcat_video_tta_tpu.tta.losses import (
            mmdit_flow_matching_loss_conditioned as arch_loss,
        )

        init_fn = lambda k: init_mmdit(k, dcfg, zero_init=False)
        T, H, W = geom or (9, 60, 104)   # 832x480 v2v window
        Cl = dcfg.in_channels
        lat = lambda t: jax.ShapeDtypeStruct((1, Cl, t, H, W), jnp.float32)
        l_txt = 512 if geom is None else 8
        text = jax.ShapeDtypeStruct((1, l_txt, dcfg.context_in_dim), pdt)
        y_vec = jax.ShapeDtypeStruct((1, dcfg.vec_in_dim), pdt)

        def fwd(params, latents, sigma, txt, yv, cond):
            return mmdit_forward(params, dcfg, latents, sigma, txt, yv,
                                 cond=cond, attn_impl="xla")

        cond_sds = jax.ShapeDtypeStruct((1, 1 + Cl, T, H, W), jnp.float32)
        fwd_args = (lat(T), jax.ShapeDtypeStruct((1,), jnp.float32),
                    text, y_vec, cond_sds)
        text_b = y_vec
    else:
        raise SystemExit(f"unsupported arch {arch}")

    param_shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    n_params = sum(int(x.size)
                   for x in jax.tree_util.tree_leaves(param_shapes))
    print(f"[aot] {preset}: {n_params / 1e9:.2f}B params "
          f"({fmt_bytes(n_params * 2)} bf16, "
          f"~{fmt_bytes(n_params * 2 // tensor)}/chip at TP{tensor})")
    p_shard = param_shardings(mesh, param_shapes, arch=arch)
    arg_sh = tuple(rep for _ in fwd_args)

    with mesh:
        lowered = jax.jit(fwd, in_shardings=(p_shard,) + arg_sh).lower(
            param_shapes, *fwd_args)
        analyze(results, f"{preset}_forward", lowered)

        scheme = build_scheme(dcfg, AdapterConfig(method="delta_a"))
        tp_shapes = jax.eval_shape(
            lambda k: scheme.init(k, base_params=param_shapes),
            jax.random.PRNGKey(1))
        tx = build_optimizer(OptimConfig(lr=5e-3))
        opt_shapes = jax.eval_shape(tx.init, tp_shapes)
        step = make_train_step(scheme, dcfg, tx, attn_impl="xla",
                               loss_fn=arch_loss)
        rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
        rep_tree = jax.tree_util.tree_map(lambda _: rep, tp_shapes)
        rep_opt = jax.tree_util.tree_map(lambda _: rep, opt_shapes)
        lowered = jax.jit(
            step.__wrapped__ if hasattr(step, "__wrapped__") else step,
            in_shardings=(rep_tree, rep_opt, p_shard, rep, rep, rep,
                          rep, rep),
        ).lower(tp_shapes, opt_shapes, param_shapes, lat(2), lat(1),
                text, text_b, rng)
        analyze(results, f"{preset}_delta_a_train_step", lowered)

    return {"preset": preset, "arch": arch, "n_params": n_params,
            **results}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="all",
                   choices=["all", "cogvideox_5b", "opensora_v2"])
    p.add_argument("--devices", type=int, default=4)
    p.add_argument("--tensor", type=int, default=4)
    args = p.parse_args()

    bootstrap_cpu(args.devices)

    from longcat_video_tta_tpu.config import MeshConfig
    from longcat_video_tta_tpu.parallel import build_mesh

    mesh = build_mesh(MeshConfig(
        data=args.devices // args.tensor, context=1, tensor=args.tensor))
    print(f"[aot] mesh={dict(mesh.shape)}")

    presets = (["cogvideox_5b", "opensora_v2"] if args.preset == "all"
               else [args.preset])
    out = [run_preset(pre, mesh, args.tensor) for pre in presets]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
