"""Global (0-D) evolution driver tests, including parity against the
reference's `global_evolution.h5` gold (the reference itself only
load-checks that file; here the stored histories gate our physics).

Reference analogs: tests/test_global_evolution.py (structure checks),
tests/test_data/global_evolution.h5 (produced by run_global_evolution with
the InputParameters recorded in the file's attrs — read back verbatim here).
"""

from pathlib import Path

import numpy as np
import pytest

import py21cmfast_tpu as p21

GOLD = Path("/root/reference/tests/test_data/global_evolution.h5")


@pytest.fixture(scope="module")
def ge_simple():
    inputs = p21.InputParameters(random_seed=1).evolve_input_structs(
        USE_TS_FLUCT=True, SOURCE_MODEL="E-INTEGRAL", ZPRIME_STEP_FACTOR=1.1,
        Z_HEAT_MAX=35.0,
    )
    return p21.run_global_evolution(inputs, min_redshift=5.5)


def test_global_quantities_structure(ge_simple):
    """Reference test_global_quantities: cooling-then-heating Tk, bounded Ts,
    monotone xH, absorption-trough structure of the global signal."""
    ge = ge_simple
    z = ge.node_redshifts
    t_gamma = 2.7255 * (1.0 + z)
    t_k = ge.quantities["kinetic_temp_neutral"]
    t_s = ge.quantities["spin_temperature"]
    x_hi = ge.quantities["neutral_fraction"]
    t_21 = ge.quantities["brightness_temp"]

    min_idx_tk = np.argmin(t_k)
    assert 0 < min_idx_tk < len(t_k) - 1
    # cooled adiabatically before X-ray heating takes over (descending z order:
    # index 0 is the highest node redshift)
    assert np.all(np.diff(t_k[: min_idx_tk + 1]) <= 0)
    assert np.all(np.diff(t_k[min_idx_tk:]) >= 1e-9 * -1)

    assert np.all(t_s <= np.maximum(t_gamma, t_k) * 1.001)
    assert np.all(np.minimum(t_gamma, t_k) <= t_s * 1.001)

    # x_HI monotonically decreasing towards low z (array is descending in z)
    assert np.all(np.diff(x_hi) <= 1e-6)

    # global signal shows the absorption trough then reionization decline
    assert t_21.min() < -20.0
    assert abs(t_21[-1]) < 5.0


def test_run_without_ts(ge_simple):
    inputs = p21.InputParameters(random_seed=1).evolve_input_structs(
        USE_TS_FLUCT=False, SOURCE_MODEL="E-INTEGRAL", ZPRIME_STEP_FACTOR=1.2,
    )
    ge = p21.run_global_evolution(inputs, min_redshift=6.0)
    assert "spin_temperature" not in ge.quantities
    assert np.all(np.isfinite(ge.quantities["brightness_temp"]))


def test_bad_source_model():
    inputs = p21.InputParameters(random_seed=1).evolve_input_structs(
        SOURCE_MODEL="CHMF-SAMPLER"
    )
    with pytest.raises(ValueError, match="source_model"):
        p21.run_global_evolution(inputs, min_redshift=6.0)


def test_roundtrip(tmp_path, ge_simple):
    from py21cmfast_tpu.drivers.global_evolution import GlobalEvolution

    f = tmp_path / "ge.h5"
    ge_simple.save(f)
    ge2 = GlobalEvolution.from_file(f)
    for k, v in ge_simple.quantities.items():
        np.testing.assert_allclose(ge2.quantities[k], v)
    assert ge2.inputs.random_seed == ge_simple.inputs.random_seed


def _gold_inputs():
    """Reconstruct the gold run's InputParameters from its stored attrs
    (read at tests/test_global_evolution.py top; values verified by
    inspecting the file's InputParameters group)."""
    import h5py

    with h5py.File(GOLD, "r") as f:
        node_z = f["InputParameters"]["node_redshifts"][:]
        seed = int(f["InputParameters"].attrs["random_seed"])
    inputs = p21.InputParameters(random_seed=seed).evolve_input_structs(
        HMF="ST",
        POWER_SPECTRUM="EH",
        SOURCE_MODEL="E-INTEGRAL",
        PERTURB_ALGORITHM="LINEAR",
        USE_MINI_HALOS=True,
        USE_TS_FLUCT=True,
        RECOMB_MODEL="inhomogeneous",
        CELL_RECOMB=True,
        USE_CMB_HEATING=False,
        USE_LYA_HEATING=False,
        USE_EXP_FILTER=False,
        USE_UPPER_STELLAR_TURNOVER=False,
        M_TURN=5.0,
        Z_HEAT_MAX=35.0,
        ZPRIME_STEP_FACTOR=1.02,
        SAMPLER_MIN_MASS=1e8,
        A_s=2.105e-9,
        OMm=0.30964144154550644,
        OMb=0.04897468161869667,
        hlittle=0.6766,
        POWER_INDEX=0.9665,
        # astro params as recorded in the gold's attrs (values that differ
        # from template defaults matter: ALPHA_STAR_MINI=0 vs default
        # ALPHA_STAR — a 5x z-sloped MCG SFRD difference)
        F_STAR10=-1.25,
        ALPHA_STAR=0.5,
        ALPHA_STAR_MINI=0.0,
        F_ESC10=-1.35,
        ALPHA_ESC=-0.3,
        F_STAR7_MINI=-2.5,
        F_ESC7_MINI=-1.35,
        t_STAR=0.5,
        L_X=40.0,
        L_X_MINI=40.0,
        NU_X_THRESH=500.0,
        X_RAY_SPEC_INDEX=1.0,
        N_STEP_TS=40,
        R_MAX_TS=500.0,
        R_BUBBLE_MAX=50.0,
        A_LW=2.0,
        BETA_LW=0.6,
        POP2_ION=5000.0,
        POP3_ION=44021.0,
        SIGMA_STAR=0.25,
        SIGMA_LX=0.5,
        T_RE=20000.0,
        CLUMPING_FACTOR=2.0,
    )
    import attrs

    return attrs.evolve(inputs, node_redshifts=tuple(float(z) for z in node_z))


def test_gold_parity():
    """Our global histories vs the reference's stored global_evolution.h5.

    Current state (round 5): with the MCG term in the tau_X filling factor
    (tauX_integrand_MINI, heating_helper_progs.c:901-941) AND the reference's
    HII_DIM==1 early-tau special case (fcoll = fcoll_MINI = 0 while
    x_e_ave < MIN_XE_FOR_FCOLL_IN_TAUX, :914-923) both implemented, the
    histories track the gold over the whole ladder: Tk within 0.6%
    everywhere, Ts within 0.75%, xH within 0.003, Tb trough -94.3 vs
    -95.0 mK (worst node dev 0.77 mK)."""
    import h5py

    with h5py.File(GOLD, "r") as f:
        gold = {k: f["quantities"][k][...] for k in f["quantities"]}
    inputs = _gold_inputs()
    ge = p21.run_global_evolution(inputs)

    z = ge.node_redshifts
    assert len(z) == len(gold["neutral_fraction"])

    # neutral fraction history: absolute agreement over the whole ladder
    xh_dev = np.max(np.abs(ge.quantities["neutral_fraction"] - gold["neutral_fraction"]))
    assert xh_dev < 0.006, f"xH max dev {xh_dev:.4f}"

    # kinetic temperature of the neutral IGM: relative agreement
    tk_ratio = ge.quantities["kinetic_temp_neutral"] / gold["kinetic_temp_neutral"]
    assert np.max(np.abs(np.log(tk_ratio))) < 0.012, (
        f"Tk ratio range {tk_ratio.min():.3f}-{tk_ratio.max():.3f}"
    )

    # adiabatic-era anchor: the first node is insensitive to the source
    # modelling and must agree tightly
    np.testing.assert_allclose(
        ge.quantities["spin_temperature"][0], gold["spin_temperature"][0], rtol=0.02
    )
    np.testing.assert_allclose(
        ge.quantities["kinetic_temp_neutral"][0], gold["kinetic_temp_neutral"][0],
        rtol=0.03,
    )

    # spin temperature where the signal lives (pre-overlap)
    sel = gold["neutral_fraction"] > 0.05
    ts_ratio = ge.quantities["spin_temperature"][sel] / gold["spin_temperature"][sel]
    assert np.max(np.abs(np.log(ts_ratio))) < 0.012

    # global signal: trough depth within 1.5%, worst node within 1.5 mK
    depth = np.abs(gold["brightness_temp"]).max()
    ours_depth = np.abs(ge.quantities["brightness_temp"]).max()
    assert abs(ours_depth - depth) < 0.015 * depth, (
        f"trough depth {ours_depth:.1f} vs {depth:.1f} mK"
    )
    tb_dev = np.max(np.abs(ge.quantities["brightness_temp"] - gold["brightness_temp"]))
    assert tb_dev < 1.5, f"Tb max dev {tb_dev:.2f} mK vs depth {depth:.1f} mK"
