#!/usr/bin/env python3
"""One-shot fetch + convert of every auxiliary metric/gate tower.

Run this ONCE on a NETWORKED host; copy the output dir to the zero-
egress TPU box; pass the printed flags to run_tta. Closes the last
"bring your own weights" friction (VERDICT r3 next-round #8): each 🟡
tower (LPIPS, CLIP, X-CLIP, I3D, InceptionV3, SBERT) becomes one
command. The reference downloads these lazily at runtime through
torch/lpips/HF (common.py:1806-2012, 2161-2305); this framework
converts once and runs the JAX towers on-device, so the fetch is a
separate, explicit step.

Usage:
    python scripts/fetch_and_convert_towers.py --out-dir /data/towers \
        [--only lpips,clip] [--skip-verify]

Each tower fetch is independently fault-tolerant: a missing package or
a download failure reports and continues, so a partial environment
still produces the towers it can.

After fetching, every tower is smoke-converted through the SAME
converter the runner uses (unless --skip-verify), so a broken download
fails HERE, not mid-campaign on the TPU box.
"""

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# tower -> (HF repo or source, run_tta flag)
TOWERS = {
    "lpips": (None, "--lpips-model-path {d}/lpips_alex.pth"),
    "clip": ("openai/clip-vit-base-patch32",
             "--clip-gate-model-path {d}/clip"),
    "xclip": ("microsoft/xclip-base-patch32",
              "--clip-gate-backend xclip --clip-gate-model-path {d}/xclip"),
    "i3d": ("DFoT i3d_torchscript.pt",
            "--fvd-enabled --i3d-model-path {d}/i3d_torchscript.pt"),
    "inception": ("torchvision inception_v3 (FID weights)",
                  "--inception-model-path {d}/inception_v3.pth"),
    "sbert": ("sentence-transformers/all-MiniLM-L6-v2",
              "--retrieval-sbert-path {d}/sbert"),
    "dino": ("torch.hub facebookresearch/dino dino_vits16",
             "--vbench-towers-dir {d}"),
    "aesthetic": ("LAION aesthetic v2 head + openai/clip-vit-large-patch14",
                  "--vbench-towers-dir {d}"),
}

I3D_URL = ("https://www.dropbox.com/s/ge9eh0sx394mc6b/"
           "i3d_torchscript.pt?dl=1")
AESTHETIC_URL = ("https://github.com/christophschuhmann/"
                 "improved-aesthetic-predictor/raw/main/"
                 "sac%2Blogos%2Bava1-l14-linearMSE.pth")


def fetch_lpips(out):
    """lpips package AlexNet head: save the full LPIPS state_dict (the
    loader eval/lpips.py:147 consumes exactly this)."""
    import lpips
    import torch

    net = lpips.LPIPS(net="alex")
    path = os.path.join(out, "lpips_alex.pth")
    torch.save(net.state_dict(), path)
    return path


def fetch_hf(repo, dst):
    """Full HF snapshot (config.json + model.safetensors + tokenizer)
    — make_tpu_clip_scorer converts from the directory."""
    from huggingface_hub import snapshot_download

    snapshot_download(repo, local_dir=dst)
    return dst


def fetch_i3d(out):
    import urllib.request

    path = os.path.join(out, "i3d_torchscript.pt")
    urllib.request.urlretrieve(I3D_URL, path)
    return path


def fetch_inception(out):
    """torchvision InceptionV3 with the FID-standard weights."""
    import torch
    from torchvision.models import Inception_V3_Weights, inception_v3

    m = inception_v3(weights=Inception_V3_Weights.IMAGENET1K_V1)
    path = os.path.join(out, "inception_v3.pth")
    torch.save(m.state_dict(), path)
    return path


def fetch_dino(out):
    """DINO ViT-S/16 backbone for the native VBench subject_consistency
    (eval/vbench_native.py); saved as a plain state_dict."""
    import torch

    m = torch.hub.load("facebookresearch/dino:main", "dino_vits16")
    path = os.path.join(out, "dino_vits16.pth")
    torch.save(m.state_dict(), path)
    return path


def fetch_aesthetic(out):
    """LAION aesthetic v2 MLP head + the CLIP ViT-L/14 snapshot it
    scores on (native VBench aesthetic_quality)."""
    import urllib.request

    path = os.path.join(out, "aesthetic_l14.pth")
    urllib.request.urlretrieve(AESTHETIC_URL, path)
    fetch_hf("openai/clip-vit-large-patch14", os.path.join(out, "clip_l14"))
    return path


def fetch_sbert(out):
    dst = os.path.join(out, "sbert")
    from sentence_transformers import SentenceTransformer

    SentenceTransformer("sentence-transformers/all-MiniLM-L6-v2").save(dst)
    return dst


def verify(name, path):
    """Convert through the runner's own loader so a bad artifact fails
    here, not on the TPU box."""
    if name == "lpips":
        from longcat_video_tta_tpu.eval.lpips import load_lpips_params

        load_lpips_params(path)
    elif name in ("clip", "xclip"):
        from longcat_video_tta_tpu.tta.clip_gate import make_tpu_clip_scorer

        make_tpu_clip_scorer(path, backend=name)
    elif name == "i3d":
        from longcat_video_tta_tpu.eval.i3d import load_i3d_params

        load_i3d_params(path)
    elif name == "inception":
        from longcat_video_tta_tpu.eval.inception import (
            load_inception_params)

        load_inception_params(path)
    elif name == "sbert":
        from longcat_video_tta_tpu.data.retrieval import sbert_embed_fn

        sbert_embed_fn(path)(["smoke"])
    elif name == "dino":
        from longcat_video_tta_tpu.eval.vbench_native import load_dino_params

        load_dino_params(path)
    elif name == "aesthetic":
        from longcat_video_tta_tpu.eval.vbench_native import (
            load_native_towers)

        towers = load_native_towers(os.path.dirname(path))
        if "aesthetic" not in towers:
            raise RuntimeError("aesthetic tower incomplete after fetch")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out-dir", required=True)
    p.add_argument("--only", default="",
                   help="comma-separated subset of: " + ",".join(TOWERS))
    p.add_argument("--skip-verify", action="store_true")
    args = p.parse_args(argv)

    only = set(args.only.split(",")) if args.only else set(TOWERS)
    unknown = only - set(TOWERS)
    if unknown:
        raise SystemExit(f"unknown towers: {sorted(unknown)}")
    os.makedirs(args.out_dir, exist_ok=True)

    fetchers = {
        "lpips": lambda: fetch_lpips(args.out_dir),
        "clip": lambda: fetch_hf(TOWERS["clip"][0],
                                 os.path.join(args.out_dir, "clip")),
        "xclip": lambda: fetch_hf(TOWERS["xclip"][0],
                                  os.path.join(args.out_dir, "xclip")),
        "i3d": lambda: fetch_i3d(args.out_dir),
        "inception": lambda: fetch_inception(args.out_dir),
        "sbert": lambda: fetch_sbert(args.out_dir),
        "dino": lambda: fetch_dino(args.out_dir),
        "aesthetic": lambda: fetch_aesthetic(args.out_dir),
    }
    flags, failed = [], []
    for name in sorted(only):
        print(f"[towers] fetching {name} ({TOWERS[name][0] or 'lpips pkg'})")
        try:
            path = fetchers[name]()
            if not args.skip_verify:
                verify(name, path)
            flags.append(TOWERS[name][1].format(d=args.out_dir))
            print(f"[towers] {name}: OK -> {path}")
        except Exception:
            traceback.print_exc()
            failed.append(name)
            print(f"[towers] {name}: FAILED (continuing)")

    print("\nrun_tta flags for the fetched towers:")
    for f in flags:
        print(f"  {f}")
    if failed:
        print(f"\nFAILED: {failed}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
