#!/bin/bash
# Round-5 phase 2: DROID curriculum continuation + gating eval.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=scripts/tpu_run.sh

DROID_MS_LO=0.8 DROID_MS_HI=4.0 bash $R /tmp/train_droid_r5.log \
    timeout 4500 python scripts/train_droid.py --steps 2500 \
    --resume vings_mono_tpu/weights/droid_selftrained.npz \
    --out vings_mono_tpu/weights/droid_r5.npz
# gating eval with the NEW weights at two thresholds (selectivity ask:
# frac <= 0.35 with gated <= all-KF)
bash $R /tmp/droid_r5a.log timeout 3600 python scripts/eval_droid.py \
    --weights vings_mono_tpu/weights/droid_r5.npz \
    --filter-thresh 1.75 --out /tmp/droid_r5a.json
bash $R /tmp/droid_r5b.log timeout 3600 python scripts/eval_droid.py \
    --weights vings_mono_tpu/weights/droid_r5.npz \
    --filter-thresh 2.4 --out /tmp/droid_r5b.json
echo PHASE2_DONE
