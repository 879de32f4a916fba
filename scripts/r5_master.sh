#!/bin/bash
# Round-5 master TPU chain (resume): every job through the stall
# watchdog (scripts/tpu_run.sh), strictly serialized on the one chip.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=scripts/tpu_run.sh
MW=vings_mono_tpu/weights/metric_depth_selftrained.npz

# --- tracking A/B (cv1 lane already recorded: 1.631) ---
if [ ! -s /tmp/track_cv0.json ]; then
bash $R /tmp/track_cv0.log timeout 2400 python scripts/eval_track_long.py \
    --frames 160 --grid 2x1 --cv 0.0 --out /tmp/track_cv0.json
fi
if [ ! -s /tmp/track_cv1m.json ]; then
bash $R /tmp/track_cv1m.log timeout 2400 python scripts/eval_track_long.py \
    --frames 160 --grid 2x1 --cv 1.0 --metric-weights $MW \
    --out /tmp/track_cv1m.json
fi
bash $R /tmp/track_cv0m.log timeout 2400 python scripts/eval_track_long.py \
    --frames 160 --grid 2x1 --cv 0.0 --metric-weights $MW \
    --out /tmp/track_cv0m.json
echo TRACK_AB_DONE

# --- aux-net trainings (decision-free; loop e2e waits for the A/B) ---
bash $R /tmp/train_fastsam.log timeout 3600 python scripts/train_fastsam.py \
    --steps 2500 --out vings_mono_tpu/weights/fastsam_selftrained.npz
bash $R /tmp/train_lightglue.log timeout 3600 \
    python scripts/train_lightglue.py --steps 2000 \
    --out vings_mono_tpu/weights/lightglue_selftrained.npz
echo TRAININGS_DONE

# --- DROID curriculum continuation at gated-lane motion scales ---
DROID_MS_LO=0.8 DROID_MS_HI=4.0 bash $R /tmp/train_droid_r5.log \
    timeout 5400 python scripts/train_droid.py --steps 2500 \
    --resume vings_mono_tpu/weights/droid_selftrained.npz \
    --out vings_mono_tpu/weights/droid_r5.npz
echo MASTER_DONE
