"""Per-node Ts-accumulator means, E-INTEGRAL vs L-INTEGRAL, exact parity config.

Intercepts spintemp._ts_shell_scan to print the mean of every heating/coupling
accumulator (dxheat, dxion, dxlya, dstarlya, dlya_cont, dlya_inj, dstarlw) at
every node.  The z=18 endpoint diag showed E and L agree on x_e but L is
0.48 K colder in Tk with equal J21 — pointing at the Lya-heating terms.

Usage: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/r5_acc_diag.py [seed] [--no-ms]
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import numpy as np

from py21cmfast_tpu.drivers.coeval import generate_coeval
from py21cmfast_tpu.models import spintemp
from run_parity import build_inputs

SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 101
USE_MS = "--no-ms" not in sys.argv
Z = 18.0

_orig = spintemp._ts_shell_scan
_rows = []


def _spy(*args, **kw):
    out = _orig(*args, **kw)
    names = ["dxion", "dxlya", "dstarlya"]
    if kw.get("use_xray_heat"):
        names.insert(0, "dxheat")
    if kw.get("use_lya_heat"):
        names += ["dlya_cont", "dlya_inj"]
    if kw.get("use_minihalos") or kw.get("use_minihalos_lagr"):
        names.append("dstarlw")
    row = {n: float(np.mean(np.asarray(v))) for n, v in zip(names, out)}
    _rows.append(row)
    return out


spintemp._ts_shell_scan = _spy


def run(source_model):
    cfg = "multiple_scattering_mini" if USE_MS else "sampler_mini"
    _, inputs = build_inputs(cfg, SEED)
    inputs = inputs.evolve_input_structs(SOURCE_MODEL=source_model)
    _rows.clear()
    for cv in generate_coeval(inputs, out_redshifts=[Z]):
        pass
    return list(_rows)


rows_e = run("E-INTEGRAL")
rows_l = run("L-INTEGRAL")

print(f"seed={SEED} ms={USE_MS}: per-node accumulator means (E | L | L/E)")
keys = sorted(set().union(*[set(r) for r in rows_e + rows_l]))
for i, (re_, rl) in enumerate(zip(rows_e, rows_l)):
    parts = []
    for kx in keys:
        ve, vl = re_.get(kx), rl.get(kx)
        if ve is None or vl is None:
            continue
        ratio = vl / ve if ve not in (0.0,) else float("nan")
        parts.append(f"{kx} {ve:.3e}|{vl:.3e}|{ratio:5.2f}")
    print(f"node {i:2d}: " + "  ".join(parts))
