"""Convergence probe at one k: vary solver knobs and report delta_m(z=0)
against the gold table value, to find what the -17%-at-k=1 error is made of.

Usage: python scripts/r5_boltzmann_converge.py [k]
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

from py21cmfast_tpu.cosmology.boltzmann import BoltzmannSolver

k = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0

gold = np.loadtxt(REPO / "py21cmfast_tpu/_data/class_transfer_density_planck18.dat")
t_gold = np.interp(np.log(k), np.log(gold[1:, 0]), gold[1:, 1])
print(f"k={k}  T_gold={t_gold:.5g}")

CASES = [
    ("baseline", {}, {}),
    ("rtol 1e-9", {}, {"rtol": 1e-9}),
    ("lmax_g 24", {"lmax_g": 24}, {}),
    ("lmax_nu 24", {"lmax_nu": 24}, {}),
    ("lmax_pol 16", {"lmax_pol": 16}, {}),
    ("tc_switch 2000", {}, {"tc_switch": 2000.0}),
    ("tc_switch 100", {}, {"tc_switch": 100.0}),
    ("UFA off (ktau 1e9)", {"ufa": 1e9}, {}),
]


def run(name, skw, kkw):
    ufa = skw.pop("ufa", None)
    s = BoltzmannSolver(OMm=0.30964, **skw)
    if ufa is not None:
        s.UFA_KTAU = ufa
    late = skw_late.get(name)
    if late:
        s.A_LATE, s.KTAU_LATE = late
    t0 = time.time()
    r = s.solve_k(k, z_out=(0.0,), **kkw)[0]
    print(f"{name:22s} d_m={r['delta_m']:12.6g}  |d_m|/gold={abs(r['delta_m'])/t_gold:7.4f}"
          f"  ({time.time()-t0:.0f}s)", flush=True)


skw_late = {"late A=1e-2": (1e-2, 25.0), "late ktau 100": (2.5e-3, 100.0),
            "no late stage": (2.0, 1e9)}
for name, skw, kkw in CASES:
    run(name, dict(skw), kkw)
for name in skw_late:
    run(name, {}, {})
