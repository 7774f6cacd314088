"""Validate the Boltzmann solver's T_vcb(k, z_dec) against the published
Planck18 anchors: V_CB_RMS = 29.3 km/s at kinematic decoupling (reference
inputs.py:1938-1947) and sqrt(8/3pi)*rms ~ 27 km/s mean.  Also prints the
shape (Delta^2-like integrand) so the acoustic structure can be eyeballed
against Munoz+ (1904.07868 fig 1) / TH2010.

Usage: python scripts/r5_vcb_transfer_check.py [n_k] [k_max]
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

from py21cmfast_tpu.cosmology.boltzmann import BoltzmannSolver

N_K = int(sys.argv[1]) if len(sys.argv) > 1 else 32
K_MAX = float(sys.argv[2]) if len(sys.argv) > 2 else 300.0
Z_DEC = 1069.0  # x_e = 0.1 for Planck18 (reference classy_interface.py:295-324)

A_S = 2.1e-9  # Planck18 (the reference's default cosmology)
N_S = 0.9665
K_PIVOT = 0.05  # 1/Mpc
C_KMS = 299792.458

solver = BoltzmannSolver()
ks = np.logspace(np.log10(5e-4), np.log10(K_MAX), N_K)
t_vcb = np.empty(N_K)
t0 = time.time()
for i, k in enumerate(ks):
    r = solver.solve_k(float(k), z_out=(Z_DEC,))[0]
    t_vcb[i] = r["v_cb"]
    print(f"k={k:9.4f}  T_vcb={t_vcb[i]:.6e}  d_m={r['delta_m']:+.5e}  "
          f"({time.time()-t0:.1f}s)", flush=True)

prim = A_S * (ks / K_PIVOT) ** (N_S - 1.0)
integrand = prim * (t_vcb * C_KMS) ** 2
var = np.trapezoid(integrand, np.log(ks))
print(f"\nV_CB_RMS = {np.sqrt(var):.3f} km/s   (published Planck18: 29.3)")
print(f"V_CB_AVG = {np.sqrt(8/(3*np.pi)) * np.sqrt(var):.3f} km/s  (~27)")
print("\nDelta^2-like integrand (km/s)^2 per ln k:")
for k, v in zip(ks, integrand):
    print(f"  k={k:9.4f}  {v:10.4f}")
