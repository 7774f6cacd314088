"""Compare the Boltzmann solver's z=0 delta_m against the gold CLASS table
(_data/class_transfer_density_planck18.dat), with and without the
Newtonian -> synchronous(CDM-comoving) gauge transformation

    delta_syn = delta_N - 3 aH (1+w) theta_c^N / k^2        (MB95 eq 27b)

CLASS's default transfer output gauge is synchronous, so the stored table
is synchronous-gauge delta_m per unit curvature; our solver integrates in
conformal Newtonian.

Usage: python scripts/r5_boltzmann_gauge_check.py [n_k]
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

from py21cmfast_tpu.cosmology.boltzmann import BoltzmannSolver

N_K = int(sys.argv[1]) if len(sys.argv) > 1 else 16

gold = np.loadtxt(REPO / "py21cmfast_tpu/_data/class_transfer_density_planck18.dat")
kg, tg = gold[1:, 0], gold[1:, 1]

solver = BoltzmannSolver(OMm=0.30964)
ks = np.logspace(-4, np.log10(min(1.0, kg.max() * 0.9)), N_K)

print(f"{'k':>10} {'T_gold':>12} {'T_N':>12} {'T_syn':>12} "
      f"{'N/gold':>8} {'syn/gold':>9}")
for k in ks:
    r = solver.solve_k(float(k), z_out=(0.0,))[0]
    a = r["a"]
    ach = solver.hubble_conf(a)  # conformal H in 1/Mpc
    rho_c, rho_b = solver.OMc, solver.OMb
    alpha = r["theta_c"] / k**2
    d_c_syn = r["delta_c"] - 3.0 * ach * alpha
    d_b_syn = r["delta_b"] - 3.0 * ach * alpha
    d_m_syn = (rho_c * d_c_syn + rho_b * d_b_syn) / (rho_c + rho_b)
    t_gold = np.interp(np.log(k), np.log(kg), tg)
    print(f"{k:10.5f} {t_gold:12.5g} {r['delta_m']:12.5g} {d_m_syn:12.5g} "
          f"{abs(r['delta_m'] / t_gold):8.4f} {abs(d_m_syn / t_gold):9.4f}",
          flush=True)
