#!/usr/bin/env python3
"""Convert a LongCat-Video torch checkpoint directory into this
framework's orbax bundle format.

Reference layout (common.py:46-96): <ckpt>/{tokenizer, text_encoder,
vae, scheduler, dit} with HF safetensors/bin shards. Usage:

    PYTHONPATH=. python scripts/convert_checkpoint.py \
        --torch-checkpoint-dir /path/to/longcat-video-checkpoints \
        --output-dir /path/to/converted \
        --preset longcat_13b

All three component mappings (DiT / WAN-VAE / UMT5) are converted; any
failure aborts unless --allow-partial is given, in which case the
component stays at random init and is recorded in
model_config.json:converted_components (load_converted_bundle warns
loudly). Mappings are exercised by tests/test_runner.py (DiT) and
tests/test_convert.py (UMT5 vs the real transformers model; VAE on a
synthetic WAN-layout state_dict).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_torch_state_dict(subdir: str):
    """Load all .safetensors / .bin shards under a model subdir."""
    import glob

    sd = {}
    st_files = sorted(glob.glob(os.path.join(subdir, "*.safetensors")))
    if st_files:
        from safetensors import safe_open

        for path in st_files:
            with safe_open(path, framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
        return sd
    import torch

    for path in sorted(glob.glob(os.path.join(subdir, "*.bin"))):
        part = torch.load(path, map_location="cpu", weights_only=True)
        sd.update({k: v.numpy() for k, v in part.items()})
    if not sd:
        raise FileNotFoundError(f"no weight shards under {subdir}")
    return sd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch-checkpoint-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--preset", default="longcat_13b")
    p.add_argument(
        "--allow-partial", action="store_true",
        help="tolerate unconvertible components (left at RANDOM init and "
             "recorded in model_config.json:converted_components; "
             "load_converted_bundle warns loudly)")
    args = p.parse_args()

    import jax

    # Weight conversion is host-side work (numpy state dicts -> orbax
    # bundle); pin the CPU backend BEFORE any jax op. On the axon
    # tunnel the accelerator backend would add ~100-400 ms per eager op
    # and — observed — block indefinitely when the tunnel is wedged
    # (JAX_PLATFORMS=cpu in the env is not reliable under the site's
    # plugin registration, hence the config call; same pattern as
    # tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")

    from longcat_video_tta_tpu.config import get_model_config
    from longcat_video_tta_tpu.models.convert import (
        assert_tree_matches,
        convert_torch_dit_state,
        convert_torch_umt5_state,
        convert_torch_vae_state,
        save_bundle,
    )
    from longcat_video_tta_tpu.pipeline.pipeline import (
        HashTokenizer, ModelBundle, load_hf_tokenizer,
    )

    cfg = get_model_config(args.preset)
    src = args.torch_checkpoint_dir

    # Reference tree structure WITHOUT materializing weights: at the
    # 13.6 B flagship a full random init exists only to be overwritten
    # by the conversion. eval_shape traces the same init functions
    # abstractly (no compile, no allocation); random weights are
    # materialized lazily below only for components that stay
    # unconverted under --allow-partial.
    abstract = jax.eval_shape(
        lambda: (lambda b: {"dit_params": b.dit_params,
                            "vae_params": b.vae_params,
                            "text_params": b.text_params,
                            "clip_params": b.clip_params})(
            ModelBundle.init_random(cfg, seed=0)))
    out_params = {}
    converted = []
    if cfg.arch == "mmdit":
        from longcat_video_tta_tpu.models.convert import (
            convert_torch_clip_text_state,
            convert_torch_mmdit_state,
        )

        plan = (
            ("dit", "dit", convert_torch_mmdit_state, cfg.dit,
             "dit_params"),
            ("vae", "vae", convert_torch_vae_state, cfg.vae, "vae_params"),
            ("text_encoder", "text_encoder", convert_torch_umt5_state,
             cfg.text, "text_params"),
            ("clip", "clip", convert_torch_clip_text_state, cfg.clip,
             "clip_params"),
        )
    else:
        plan = (
            ("dit", "dit", convert_torch_dit_state, cfg.dit, "dit_params"),
            ("vae", "vae", convert_torch_vae_state, cfg.vae, "vae_params"),
            ("text_encoder", "text_encoder", convert_torch_umt5_state,
             cfg.text, "text_params"),
        )
    for name, subdir, fn, sub_cfg, attr in plan:
        try:
            print(f"[convert] {name}: loading state dict ...")
            sd = load_torch_state_dict(os.path.join(src, subdir))
            params = fn(sd, sub_cfg)
            assert_tree_matches(params, abstract[attr], name)
            out_params[attr] = params
            n = sum(x.size for x in jax.tree_util.tree_leaves(params))
            print(f"[convert] {name} converted ({n / 1e9:.2f}B params)")
            converted.append(name)
        except Exception as e:
            if not args.allow_partial:
                raise SystemExit(
                    f"[convert] {name} FAILED ({type(e).__name__}: {e}). "
                    f"Re-run with --allow-partial to keep random-init "
                    f"weights for this component."
                )
            print(f"[convert] WARNING: {name} left at RANDOM init "
                  f"({type(e).__name__}: {e})")

    missing = [attr for *_, attr in plan if attr not in out_params]
    if missing:
        # Materialize ONLY the missing components (a full
        # ModelBundle.init_random would re-create the 13.6 B DiT just
        # to throw it away when e.g. only the text encoder failed).
        # Key split mirrors init_random(seed=0) so --allow-partial
        # fallbacks are bit-identical to a full random bundle.
        k_dit, k_vae, k_text, k_clip = jax.random.split(
            jax.random.PRNGKey(0), 4)
        init_by_attr = {
            "vae_params": ("vae", k_vae),
            "text_params": ("text", k_text),
            "clip_params": ("clip", k_clip),
            "dit_params": ("dit", k_dit),
        }
        for attr in missing:
            kind, key = init_by_attr[attr]
            if kind == "dit":
                if cfg.arch == "mmdit":
                    from longcat_video_tta_tpu.models.mmdit import init_mmdit
                    fn = lambda k: init_mmdit(k, cfg.dit, zero_init=False)
                elif cfg.arch == "cogvideox":
                    from longcat_video_tta_tpu.models.cogvideox import (
                        init_cogvideox,
                    )
                    fn = lambda k: init_cogvideox(k, cfg.dit,
                                                  zero_init=False)
                else:
                    from longcat_video_tta_tpu.models.dit import init_dit
                    fn = lambda k: init_dit(k, cfg.dit, zero_init=False)
            elif kind == "vae":
                from longcat_video_tta_tpu.models.vae import init_vae
                fn = lambda k: init_vae(k, cfg.vae)
            elif kind == "text":
                from longcat_video_tta_tpu.models.umt5 import init_umt5
                fn = lambda k: init_umt5(k, cfg.text)
            else:
                from longcat_video_tta_tpu.models.clip_text import (
                    init_clip_text,
                )
                fn = lambda k: init_clip_text(k, cfg.clip)
            out_params[attr] = jax.jit(fn)(key)
    bundle = ModelBundle(
        cfg=cfg,
        dit_params=out_params["dit_params"],
        vae_params=out_params["vae_params"],
        text_params=out_params["text_params"],
        tokenize=HashTokenizer(cfg.text.vocab_size, cfg.text.max_length),
        clip_params=out_params.get("clip_params"),
    )

    tok_dir = os.path.join(src, "tokenizer")
    if os.path.exists(tok_dir):
        bundle.tokenize = load_hf_tokenizer(src, cfg.text.max_length)

    save_bundle(args.output_dir, bundle, converted_components=converted)
    print(f"[convert] wrote {args.output_dir} "
          f"(converted: {converted or 'NONE'})")


if __name__ == "__main__":
    main()
