#!/bin/bash
# Round-5 resume chain: regenerate the two gating eval artifacts
# back-to-back on the one TPU chip, each through the stall watchdog.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=scripts/tpu_run.sh
LG=vings_mono_tpu/weights/lightglue_selftrained.npz

bash $R /tmp/loop_e2e_r5.log timeout 3000 python scripts/eval_loop_e2e.py \
    --lightglue $LG --out /tmp/loop_e2e_r5.json
echo "LOOP_E2E_RC=$?"

bash $R /tmp/long_run_r5.log timeout 5400 python scripts/eval_long_run.py \
    --lightglue $LG --out /tmp/long_run_r5.json
echo "LONG_RUN_RC=$?"
echo CHAIN_DONE
