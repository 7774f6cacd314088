"""Generate _data/class_transfer_vcb_planck18.dat: T_vcb(k) at kinematic
decoupling for the default Planck18 cosmology, from the in-house Boltzmann
solver (cosmology/boltzmann.py), on the reference's exact k_transfer grid
(classy_interface.py:21-31, 230 points + k=0).

T_vcb = |theta_b - theta_c| / k in units of c per unit primordial curvature
zeta — the same object the reference ingests from CLASS
(wrapper/inputs.py:1915-1935, get_transfer_function kind="v_cb" / c).
z_dec = 1069.6 (x_e = n_e/(n_H+n_He) = 0.1 for Planck18, the reference's
definition, classy_interface.py:295-324).

Validation anchor: the implied V_CB_RMS must come out ~29.3 km/s (the
reference's published Planck18 value, wrapper/inputs.py:1938-1947); this
solver measures 28.2 km/s with A_s = 2.1e-9 (-3.6%).

k <= K_EXACT are solved exactly (the acoustic band oscillates with period
dk ~ 0.02/Mpc — the table samples it exactly at the reference's points, as
the reference's own table does); above K_EXACT the Silk-damped decay is
smooth, so sparse anchors + log-log cubic interpolation suffice; beyond the
last anchor a power law extrapolates.

Usage: python scripts/r5_make_vcb_table.py [out.dat]   (~1.5-2 h single core)
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np
from scipy.interpolate import CubicSpline

from py21cmfast_tpu.cosmology.boltzmann import BoltzmannSolver

OUT = Path(sys.argv[1]) if len(sys.argv) > 1 else (
    REPO / "py21cmfast_tpu/_data/class_transfer_vcb_planck18.dat"
)
Z_DEC = 1069.6
K_EXACT = 3.0
ANCHORS = np.logspace(np.log10(3.2), np.log10(500.0), 14)

# the reference's k_transfer grid (classy_interface.py:21-31)
k_grid = np.concatenate([
    np.logspace(-5.15, -1.49, 50),
    np.logspace(-1.45, -0.258, 80),
    np.logspace(-0.2083, 3.049, 100),
])

solver = BoltzmannSolver(OMm=0.30964)
t00 = time.time()


def t_vcb(k):
    t0 = time.time()
    r = solver.solve_k(float(k), z_out=(Z_DEC,))[0]
    print(f"k={k:12.6g}  T_vcb={r['v_cb']:.6e}  ({time.time()-t0:.0f}s, "
          f"total {time.time()-t00:.0f}s)", flush=True)
    return r["v_cb"]


exact = k_grid[k_grid <= K_EXACT]
t_exact = np.array([t_vcb(k) for k in exact])

t_anchor = np.array([t_vcb(k) for k in ANCHORS])
spl = CubicSpline(np.log(ANCHORS), np.log(t_anchor))
mid = k_grid[(k_grid > K_EXACT) & (k_grid <= ANCHORS[-1])]
t_mid = np.exp(spl(np.log(mid)))
# power-law tail from the last two anchors
slope = (np.log(t_anchor[-1]) - np.log(t_anchor[-2])) / (
    np.log(ANCHORS[-1]) - np.log(ANCHORS[-2]))
tail = k_grid[k_grid > ANCHORS[-1]]
t_tail = t_anchor[-1] * (tail / ANCHORS[-1]) ** slope

k_all = np.concatenate([[0.0], exact, mid, tail])
t_all = np.concatenate([[0.0], t_exact, t_mid, t_tail])

# validation: implied rms with the default primordial amplitude
A_S, N_S, K_PIVOT, C_KMS = 2.1e-9, 0.9665, 0.05, 299792.458
pos = k_all > 0
prim = A_S * (k_all[pos] / K_PIVOT) ** (N_S - 1.0)
var = np.trapezoid(prim * (t_all[pos] * C_KMS) ** 2, np.log(k_all[pos]))
rms = np.sqrt(var)
print(f"\nimplied V_CB_RMS = {rms:.3f} km/s (published Planck18: 29.3)")

header = (
    "CLASS-convention relative-velocity transfer T_vcb(k, z_dec=1069.6) for the default "
    "Planck18 cosmology (h=0.6766, OMm=0.30964, OMb=0.04897, n_s=0.9665): "
    "|theta_b - theta_c|/k in units of c per unit primordial curvature zeta, the quantity the "
    "reference ingests from CLASS for V_CB_MODEL=FLUCTS (wrapper/inputs.py:1915-1935).\n"
    "Provenance: computed by py21cmfast_tpu.cosmology.boltzmann (MB95 linear perturbations; "
    "massless-neutrino approximation of the 0.06 eV state, Saha+Peebles recombination), "
    f"scripts/r5_make_vcb_table.py; implied V_CB_RMS = {rms:.2f} km/s at A_s=2.1e-9 vs CLASS's "
    f"29.3 ({(rms / 29.3 - 1) * 100:+.1f}%).  k grid matches the reference's k_transfer "
    "(classy_interface.py:21-31); "
    f"k <= {K_EXACT} exact per-point solves, above: {len(ANCHORS)} anchors + log-log cubic, "
    f"power-law tail past k={ANCHORS[-1]:.0f}.\n"
    "columns: k [1/Mpc]   T_vcb [dimensionless v/c per unit zeta]"
)
np.savetxt(OUT, np.column_stack([k_all, t_all]), header=header)
print(f"wrote {OUT} ({len(k_all)} rows)")
