"""Trace delta_m(z) for a few k through the solver stages and compare the
late-time growth against the scale-independent growth factor D(z): below
z ~ 200 all sub-horizon matter modes must grow as D, so dividing it out
exposes exactly where the integration goes wrong.

Usage: python scripts/r5_boltzmann_ztrace.py [k ...]
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

from py21cmfast_tpu.cosmology.boltzmann import BoltzmannSolver

ks = [float(x) for x in sys.argv[1:]] or [0.01, 0.05, 0.2]
zs = [800.0, 400.0, 200.0, 100.0, 50.0, 20.0, 10.0, 5.0, 2.0, 1.0, 0.5, 0.0]

solver = BoltzmannSolver(OMm=0.30964)

# unnormalized growth factor via the standard integral
from scipy.integrate import quad


def growth(a):
    om_l, om_m, om_r = solver.OMl, solver.OMm, solver.OMr
    def E(x):
        return np.sqrt(om_m / x**3 + om_r / x**4 + om_l)
    integ = quad(lambda x: 1.0 / (x * E(x)) ** 3, 1e-6, a)[0]
    return 2.5 * om_m * E(a) * integ


for k in ks:
    res = solver.solve_k(k, z_out=tuple(zs))
    print(f"\nk = {k}")
    print(f"{'z':>7} {'a_ode':>10} {'d_m(N)':>12} {'d_m/D':>12} "
          f"{'th_c/k2':>11} {'d_syn/D':>12}")
    for r in res:
        a_exp = 1.0 / (1.0 + r["z"])
        D = growth(a_exp)
        ach = solver.hubble_conf(a_exp)
        alpha = r["theta_c"] / k**2
        d_syn = r["delta_m"] - 3.0 * ach * alpha
        print(f"{r['z']:7.1f} {r['a'] / a_exp - 1:+10.2e} {r['delta_m']:12.4g} "
              f"{r['delta_m'] / D:12.4g} {alpha:11.3g} {d_syn / D:12.4g}",
              flush=True)
