"""Boltzmann solver regression vs the gold CLASS table.

The gold (_data/class_transfer_density_planck18.dat, Newtonian gauge,
extracted from the reference's test data) and our solver agree in SHAPE to
~2% over k = 0.004-1.0/Mpc with a known ~+5% constant amplitude offset
(documented in cosmology/boltzmann.py; irrelevant under sigma_8
normalization).  These gates lock the two fixes of round 5: phi carried as
a state super-horizon, and the tau(a) integration constant.
"""

from pathlib import Path

import numpy as np
import pytest

from py21cmfast_tpu.cosmology.boltzmann import BoltzmannSolver

GOLD = Path(__file__).resolve().parents[1] / (
    "py21cmfast_tpu/_data/class_transfer_density_planck18.dat"
)


@pytest.fixture(scope="module")
def solver():
    return BoltzmannSolver(OMm=0.30964)


def _gold_at(k):
    tab = np.loadtxt(GOLD)
    return np.interp(np.log(k), np.log(tab[1:, 0]), tab[1:, 1])


def test_delta_m_z0_at_k01(solver):
    """Fast anchor: one mid-range mode, amplitude within the documented
    offset band and correct (negative, MB95 per unit +zeta) sign."""
    r = solver.solve_k(0.1, z_out=(0.0,))[0]
    assert r["delta_m"] < 0
    ratio = abs(r["delta_m"]) / _gold_at(0.1)
    assert 1.0 < ratio < 1.10, ratio


@pytest.mark.slow
def test_vcb_positive_and_peaked(solver):
    """T_vcb at kinematic decoupling: acoustic-scale modes carry far more
    relative velocity than super-horizon or Silk-damped ones.  (Slow tier:
    the k=0.001 solve alone takes ~2 min.)"""
    ks = (0.001, 0.1, 300.0)
    v = [solver.solve_k(k, z_out=(1069.0,))[0]["v_cb"] for k in ks]
    assert v[1] > 10 * v[0]
    assert v[1] > 10 * v[2]


def test_vcb_table_consistency(solver):
    """Fast anchor: the bundled Planck18 T_vcb table matches a fresh solve at
    one acoustic-band mode to 1% (the table generator and solver share code,
    so this locks the table against solver regressions)."""
    from pathlib import Path

    tab = np.loadtxt(Path(GOLD).parent / "class_transfer_vcb_planck18.dat")
    i = int(np.argmin(np.abs(tab[:, 0] - 0.13)))  # acoustic-band grid row
    k, t_tab = tab[i, 0], tab[i, 1]
    r = solver.solve_k(float(k), z_out=(1069.6,))[0]
    np.testing.assert_allclose(r["v_cb"], t_tab, rtol=0.01)


@pytest.mark.slow
def test_generate_transfer_tables_matches_gold_shape():
    """The classy-free table generator reproduces the bundled gold table's
    density shape for the default cosmology (coarse n_k; BAO unresolved, so
    the gate is loose)."""
    from py21cmfast_tpu.cosmology.boltzmann import (
        REFERENCE_K_TRANSFER, generate_transfer_tables,
    )

    k, td, tv = generate_transfer_tables(OMm=0.30964, n_k=12, vcb=False)
    assert tv is None
    assert k.shape == REFERENCE_K_TRANSFER.shape
    probe = np.array([0.01, 0.1, 0.5])
    ours = np.interp(np.log(probe), np.log(k), td)
    gold = np.array([_gold_at(p) for p in probe])
    shape = (ours / ours[1]) / (gold / gold[1])
    np.testing.assert_allclose(shape, 1.0, rtol=0.08)


@pytest.mark.slow
def test_delta_m_z0_shape_against_gold(solver):
    """Shape (normalized at k=0.1) within 3% of the gold CLASS table over
    k = 0.004-1.0; the constant amplitude offset divides out."""
    ks = np.array([0.004, 0.02, 0.1, 0.3, 1.0])
    ours = np.array([abs(solver.solve_k(float(k), z_out=(0.0,))[0]["delta_m"])
                     for k in ks])
    gold = np.array([_gold_at(k) for k in ks])
    shape = (ours / ours[2]) / (gold / gold[2])
    np.testing.assert_allclose(shape, 1.0, rtol=0.03)
