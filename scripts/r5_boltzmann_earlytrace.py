"""Fine trace of one k-mode through recombination: delta_c, delta_b, delta_g,
theta_b, theta_c, and the algebraic potentials, from just after the TC switch
to z=600.  Expected per unit zeta = +1 (MB95 conventions): delta's negative,
psi positive, |delta_c| growing monotonically after horizon entry.

Usage: python scripts/r5_boltzmann_earlytrace.py [k]
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

from py21cmfast_tpu.cosmology.boltzmann import BoltzmannSolver

k = float(sys.argv[1]) if len(sys.argv) > 1 else 0.05
solver = BoltzmannSolver(OMm=0.30964)

zs = (2400, 2200, 2000, 1800, 1600, 1400, 1300, 1200, 1150, 1100, 1069,
      1030, 1000, 950, 900, 850, 800, 700, 600)
res = solver.solve_k(k, z_out=zs)
print(f"k = {k}   (kappa'/aH at switch scale ~ see solver)")
print(f"{'z':>6} {'d_c':>10} {'d_b':>10} {'th_c':>11} {'th_b':>11} {'v_cb':>10}")
for r in res:
    print(f"{r['z']:6.0f} {r['delta_c']:10.4g} {r['delta_b']:10.4g} "
          f"{r['theta_c']:11.4g} {r['theta_b']:11.4g} {r['v_cb']:10.4g}",
          flush=True)
