#!/usr/bin/env python3
"""Dump dataset captions as a T2V prompt list (reference:
t2v_experiment/scripts/prepare_opensora_prompts.py)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--max-prompts", type=int, default=100)
    args = p.parse_args()
    from longcat_video_tta_tpu.data import load_video_list

    entries = load_video_list(args.data_dir, max_videos=args.max_prompts)
    prompts = [e["caption"] for e in entries if e["caption"]]
    with open(args.output, "w") as f:
        json.dump(prompts, f, indent=2)
    print(f"wrote {len(prompts)} prompts -> {args.output}")


if __name__ == "__main__":
    main()
