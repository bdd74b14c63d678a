#!/usr/bin/env python3
"""Panda-70M clip download via yt-dlp (reference:
datasets/download_panda70m_subset.py:93-181 — --download-sections
trimming, cookies / android-client bot workarounds, ffprobe validation).

Egress-gated: this image has no network and no yt-dlp; the script is the
download half of the prep pipeline and hands off to
``python -m longcat_video_tta_tpu.data.prep panda70m`` for
stratification/validation/transcode once clips exist locally.
"""

import argparse
import csv
import os
import shutil
import subprocess
import sys


def download_clip(video_id: str, start: float, end: float, out_path: str,
                  cookies: str = None, android_client: bool = False) -> bool:
    cmd = [
        "yt-dlp", f"https://www.youtube.com/watch?v={video_id}",
        "--download-sections", f"*{start}-{end}",
        "-f", "bv*[height<=480]+ba/b[height<=480]",
        "--force-keyframes-at-cuts", "-o", out_path, "--no-playlist",
    ]
    if cookies:
        cmd += ["--cookies", cookies]
    if android_client:
        cmd += ["--extractor-args", "youtube:player_client=android"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return os.path.exists(out_path)
    except Exception as e:
        print(f"[download] {video_id}: {e}")
        return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--metadata-csv", required=True,
                   help="Panda-70M csv with videoID, timestamp, caption")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--num-videos", type=int, default=100)
    p.add_argument("--oversample", type=float, default=15.0,
                   help="candidate multiplier (reference: 15x)")
    p.add_argument("--cookies", default=None)
    args = p.parse_args()

    if shutil.which("yt-dlp") is None:
        sys.exit("yt-dlp not available in this environment (zero egress); "
                 "run on a networked host, then feed --clips-dir to "
                 "`python -m longcat_video_tta_tpu.data.prep panda70m`.")

    os.makedirs(args.out_dir, exist_ok=True)
    with open(args.metadata_csv, newline="") as f:
        rows = list(csv.DictReader(f))
    target = int(args.num_videos * args.oversample)
    got = 0
    kept_rows = []
    for row in rows[:target]:
        vid = row.get("videoID") or row.get("video_id")
        ts = (row.get("timestamp") or "0:10").strip("[]").split(",")
        start, end = (float(x.strip().strip("'\"").split(":")[-1])
                      for x in ts[:2]) if len(ts) >= 2 else (0.0, 10.0)
        out = os.path.join(args.out_dir, f"{vid}.mp4")
        ok = download_clip(vid, start, end, out, args.cookies)
        if not ok:  # bot workaround retry (reference behavior)
            ok = download_clip(vid, start, end, out, args.cookies,
                               android_client=True)
        if ok:
            got += 1
            kept_rows.append({"filename": f"{vid}.mp4",
                              "caption": row.get("caption", "")})
        if got >= args.num_videos:
            break
    with open(os.path.join(args.out_dir, "metadata.csv"), "w",
              newline="") as f:
        w = csv.DictWriter(f, fieldnames=["filename", "caption"])
        w.writeheader()
        w.writerows(kept_rows)
    print(f"downloaded {got} clips -> {args.out_dir}")


if __name__ == "__main__":
    main()
