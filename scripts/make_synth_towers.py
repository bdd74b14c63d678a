#!/usr/bin/env python3
"""Generate SYNTHETIC-weight metric/gate towers in the exact on-disk
formats the runner's loaders consume (VERDICT r4 #2).

Zero-egress boxes cannot run scripts/fetch_and_convert_towers.py, so
every quality tower in the product campaign stayed dark in round 4
(lpips=nan, fvd num_videos=0, gate disabled). This script builds each
tower from seeded random weights *through the same torch state-dict
layouts the real checkpoints use* — the converters are torch-oracle-
validated (tests/test_lpips.py, test_i3d.py, test_inception.py,
test_clip_vision.py, test_vbench_native.py, test_musiq.py), so a
campaign run with these towers exercises the full metric plumbing
end-to-end. The NUMBERS are only meaningful relative to each other
(same tower across rows), never against published scores — summaries
carry a `synthetic_towers` provenance marker via the tower dir name.

Reference behavior being matched: common.py:1709-2012 (CLIP gate),
2141-2431 (online FVD/FID), 2453-2522 (LPIPS aggregation + VBench).

Usage:
    python scripts/make_synth_towers.py --out-dir campaign/towers

Layout produced (same as fetch_and_convert_towers.py):
    lpips_alex.pth           -> --lpips-model-path
    i3d.pth                  -> --fvd-enabled --i3d-model-path
    inception_v3.pth         -> --inception-model-path
    clip/                    -> --clip-gate-scorer jax
                                --clip-gate-model-path (hash tokenizer)
    dino_vits16.pth (+json)  -> --vbench-towers-dir
    aesthetic_l14.pth + clip_l14/ -> --vbench-towers-dir
    musiq_spaq.pth (+json)   -> --vbench-towers-dir (imaging_quality)
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
# the tests are the canonical synthetic-state-dict builders (each one
# is oracle-checked against a torch.nn.functional forward there)
sys.path.insert(0, os.path.join(REPO, "tests"))


def _to_torch(sd):
    import torch

    return {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd.items()}


def make_lpips(out, seed):
    import torch

    from test_lpips import _synthetic_lpips_state_dict

    path = os.path.join(out, "lpips_alex.pth")
    torch.save(_to_torch(_synthetic_lpips_state_dict(seed)), path)
    return path


def make_i3d(out, seed):
    import torch

    import jax

    from longcat_video_tta_tpu.eval.i3d import init_i3d
    from test_i3d import _tree_to_torch_sd

    params = init_i3d(jax.random.PRNGKey(seed))
    path = os.path.join(out, "i3d.pth")
    torch.save(_to_torch(_tree_to_torch_sd(params)), path)
    return path


def make_inception(out, seed):
    import torch

    import jax

    from longcat_video_tta_tpu.eval.inception import init_inception
    from test_inception import _tree_to_torch_sd

    params = init_inception(jax.random.PRNGKey(seed))
    path = os.path.join(out, "inception_v3.pth")
    torch.save(_to_torch(_tree_to_torch_sd(params)), path)
    return path


def make_clip_dir(dst, seed, width=128, layers=2, heads=4, proj=64,
                  image_size=224, patch=32):
    """Tiny random HF CLIPModel checkpoint dir (config.json carries the
    geometry, so the converter sizes itself). No tokenizer files on
    purpose: the gate opts into the deterministic hash tokenizer
    (--clip-gate-hash-tokenizer), the documented synthetic-weights
    path (tta/clip_gate.py)."""
    import torch
    from transformers import CLIPConfig, CLIPModel

    torch.manual_seed(seed)
    cfg = CLIPConfig(
        text_config=dict(
            vocab_size=49408, hidden_size=width, intermediate_size=width * 4,
            num_hidden_layers=layers, num_attention_heads=heads,
            max_position_embeddings=77, projection_dim=proj),
        vision_config=dict(
            hidden_size=width, intermediate_size=width * 4,
            num_hidden_layers=layers, num_attention_heads=heads,
            image_size=image_size, patch_size=patch, projection_dim=proj),
        projection_dim=proj)
    CLIPModel(cfg).eval().save_pretrained(dst)
    return dst


def make_dino(out, seed, width=64, layers=2, heads=2, patch=16,
              image_size=224):
    """facebookresearch/dino-layout ViT + a dino_config.json sidecar so
    load_native_towers sizes the JAX tower to the synthetic geometry."""
    import json

    import torch

    from longcat_video_tta_tpu.eval.vbench_native import DINOViTConfig
    from test_vbench_native import _torch_dino

    cfg = DINOViTConfig(width=width, num_layers=layers, num_heads=heads,
                        patch_size=patch, image_size=image_size)
    torch.manual_seed(seed)
    model = _torch_dino(cfg)
    path = os.path.join(out, "dino_vits16.pth")
    torch.save(model.state_dict(), path)
    with open(os.path.join(out, "dino_config.json"), "w") as f:
        json.dump({"width": width, "num_layers": layers,
                   "num_heads": heads, "patch_size": patch,
                   "image_size": image_size}, f)
    return path


def make_aesthetic(out, seed, proj=64):
    """LAION-v2-layout MLP head (input dim = the clip_l14 projection
    dim) + the tiny clip_l14/ checkpoint it scores with."""
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    head = nn.Module()
    head.layers = nn.Sequential(
        nn.Linear(proj, 128), nn.Dropout(0.2), nn.Linear(128, 64),
        nn.Dropout(0.2), nn.Linear(64, 16), nn.Dropout(0.1),
        nn.Linear(16, 8), nn.Linear(8, 1)).eval()
    path = os.path.join(out, "aesthetic_l14.pth")
    torch.save(head.state_dict(), path)
    make_clip_dir(os.path.join(out, "clip_l14"), seed + 1, proj=proj)
    return path


def make_musiq(out, seed):
    import json

    import torch

    from test_musiq import _torch_musiq, TINY

    torch.manual_seed(seed)
    model = _torch_musiq(TINY)
    path = os.path.join(out, "musiq_spaq.pth")
    torch.save(model.state_dict(), path)
    with open(os.path.join(out, "musiq_config.json"), "w") as f:
        json.dump(TINY.as_dict(), f)
    return path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out-dir", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--only", default=None,
                   help="comma list: lpips,i3d,inception,clip,dino,"
                        "aesthetic,musiq")
    args = p.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    towers = {
        "lpips": make_lpips,
        "i3d": make_i3d,
        "inception": make_inception,
        "clip": lambda out, s: make_clip_dir(
            os.path.join(out, "clip"), s),
        "dino": make_dino,
        "aesthetic": make_aesthetic,
        "musiq": make_musiq,
    }
    only = set(args.only.split(",")) if args.only else set(towers)
    made = {}
    for name, fn in towers.items():
        if name not in only:
            continue
        made[name] = fn(args.out_dir, args.seed)
        print(f"[synth_towers] {name}: {made[name]}")
    # provenance marker read by anyone inspecting the campaign dir
    with open(os.path.join(args.out_dir, "SYNTHETIC_WEIGHTS"), "w") as f:
        f.write("Towers in this dir carry seeded RANDOM weights made by "
                "scripts/make_synth_towers.py.\nScores are comparable "
                "across rows of the same campaign, not against "
                "published numbers.\n")
    return made


if __name__ == "__main__":
    main()
