#!/bin/bash
# Rebuild the gitignored demo-campaign substrate after a workspace reset:
# datasets (seeded, deterministic), synthetic metric towers, and the
# pretrained demo checkpoint (scripts/pretrain_demo.py, seed 0).
# Ends with an in-distribution NOTTA probe (n=8) plus a reproducibility
# check of the first data_b videos against the committed NOTTA summary.
set -e
cd /root/repo
echo "[rebuild] stage 1: datasets $(date +%T)"
python3 - <<'EOF'
import sys
sys.path.insert(0, '.')
sys.path.insert(0, 'scripts')
import os
from longcat_video_tta_tpu.runners.run_tta import make_synthetic_dataset
from run_demo_campaign import DIST_B
from pretrain_demo import DIST_A
if not os.path.exists('campaign/demo/data_b/metadata.csv'):
    make_synthetic_dataset('campaign/demo/data_b', 100, 192, 320, seed=11, **DIST_B)
if not os.path.exists('campaign/demo/data_a/metadata.csv'):
    make_synthetic_dataset('campaign/demo/data_a', 20, 192, 320, seed=13, **DIST_A)
print('datasets ok')
EOF
echo "[rebuild] stage 2: towers $(date +%T)"
if [ ! -f campaign/towers/lpips_alex.pth ]; then
  python3 scripts/make_synth_towers.py --out-dir campaign/towers
fi
echo "[rebuild] stage 3: pretrain $(date +%T)"
if [ ! -d campaign/demo_ckpt/dit ]; then
  python3 scripts/pretrain_demo.py --out-dir campaign/demo_ckpt
fi
echo "[rebuild] stage 4: NOTTA reproducibility check (n=4 on data_b) $(date +%T)"
python3 -m longcat_video_tta_tpu.runners.run_tta \
  --method none --preset longcat_demo --checkpoint-dir campaign/demo_ckpt \
  --data-dir campaign/demo/data_b --caption-guard-mode off \
  --output-dir campaign/probe/NOTTA_REPRO --max-videos 4 \
  --height 192 --width 320 --num-cond-frames 14 --num-frames 28 \
  --gen-start-frame 32 --num-inference-steps 50 --guidance-scale 1.0 \
  --tta-total-frames 29 --seed 42 \
  --compile-cache-dir /tmp/longcat_demo_cache
echo "[rebuild] stage 5: in-dist NOTTA probe (n=8 on data_a) $(date +%T)"
python3 -m longcat_video_tta_tpu.runners.run_tta \
  --method none --preset longcat_demo --checkpoint-dir campaign/demo_ckpt \
  --data-dir campaign/demo/data_a --caption-guard-mode off \
  --output-dir campaign/probe/NOTTA_INDIST --max-videos 8 \
  --height 192 --width 320 --num-cond-frames 14 --num-frames 28 \
  --gen-start-frame 32 --num-inference-steps 50 --guidance-scale 1.0 \
  --tta-total-frames 29 --seed 42 \
  --compile-cache-dir /tmp/longcat_demo_cache
echo "[rebuild] DONE $(date +%T)"
