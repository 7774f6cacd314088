#!/bin/bash
# Round-3 parity sweeps (sequential: one TPU process at a time).
set -x
cd /root/repo
python scripts/run_parity.py --all --seeds 5 --perturb \
  > /tmp/sweep_perturb.log 2>&1
# 10 seeds where the xHI morphology ratios need statistical power (verdict #5)
python scripts/run_parity.py \
  --configs dexm,sampler,sampler_hires,sampler_noncubic,sampler_ir --seeds 10 \
  > /tmp/sweep_seeds10.log 2>&1
# lightcone golds across the matrix (verdict #4)
python scripts/run_parity.py --all --seeds 3 --lightcone \
  > /tmp/sweep_lightcone.log 2>&1
echo SWEEPS DONE
