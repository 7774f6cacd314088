#!/bin/bash
# Round-4 parity regeneration for the USE_TS_FLUCT configs after the tau_X
# sign fix (the committed artifacts encode the unattenuated-X-ray physics).
set -x
cd /root/repo
TS_CONFIGS=ts,ts_nomdz,inhomo_ts,sampler_ts,sampler_ts_ir,minimize_mem,mini,sampler_mini,multiple_scattering,mini_gamma_approx,multiple_scattering_mini
python scripts/run_parity.py --configs $TS_CONFIGS --seeds 5 \
  > /tmp/r4_sweep_coeval.log 2>&1
python scripts/run_parity.py --configs $TS_CONFIGS --seeds 3 --lightcone \
  > /tmp/r4_sweep_lightcone.log 2>&1
echo SWEEPS DONE
