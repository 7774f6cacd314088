"""Minihalo (MCG) path locks + global evolution driver."""

import numpy as np
import pytest

import py21cmfast_tpu as p21
from py21cmfast_tpu.models import hmf


@pytest.fixture(scope="module")
def inputs():
    return p21.create_params_from_template("minihalos", random_seed=3).evolve_input_structs(
        HII_DIM=10, DIM=20, BOX_LEN=15.0, R_BUBBLE_MAX=7.0,
        ZPRIME_STEP_FACTOR=1.35, Z_HEAT_MAX=20.0,
        N_STEP_TS=15,
    ).with_logspaced_redshifts(8.5, 20.0)


def test_minihalo_coeval_chain(inputs):
    """Full minihalo chain: Mturn grids, MCG Nion, LW output."""
    outs = list(inputs.node_redshifts[::4])
    if inputs.node_redshifts[-1] not in outs:
        outs.append(inputs.node_redshifts[-1])
    coevals = list(p21.generate_coeval(inputs, out_redshifts=outs))
    xh = [float(np.asarray(c.neutral_fraction).mean()) for c in coevals]
    assert xh[-1] < xh[0]  # reionization proceeds
    last = coevals[-1]
    # minihalos lower the effective turnover below the default M_TURN=1e8.7:
    # the ACG average equals the atomic-cooling threshold here (M_TURN=1e5)
    mt = float(last.ionized_box.log10_Mturnover_ave)
    sc = hmf.set_scaling_constants(last.redshift, inputs)
    assert abs(mt - np.log10(sc.acg_thresh)) < 0.5
    # J_21_LW populated and nonnegative
    jlw = np.asarray(last.spin_temp.J_21_LW)
    assert np.all(jlw >= 0)
    assert jlw.max() > 0


def test_lyman_werner_threshold_scalings(inputs):
    ap = inputs.astro_params
    m0 = hmf.lyman_werner_threshold(15.0, 0.0, 0.0, ap)
    m_lw = hmf.lyman_werner_threshold(15.0, 10.0, 0.0, ap)
    m_v = hmf.lyman_werner_threshold(15.0, 0.0, 30.0, ap)
    assert m_lw > m0  # LW background raises the threshold
    assert m_v > m0  # streaming velocities raise the threshold
    # z scaling ~ (1+z)^-1.5
    assert np.isclose(
        hmf.lyman_werner_threshold(7.0, 0, 0, ap) / m0, (8.0 / 16.0) ** -1.5, rtol=1e-6
    )


def test_nion_mini_suppressed_above_acg(inputs):
    """MCG Nion integral must be strongly suppressed vs ACG (upper exp cutoff)."""
    from py21cmfast_tpu.models.ionization import _get_sigma_table

    st = _get_sigma_table(inputs)
    cosmo = inputs.cosmology
    sc = hmf.set_scaling_constants(10.0, inputs)
    n_acg = hmf.nion_general(st, cosmo, 1, 10.0, np.log(1e5), np.log(1e16),
                             sc.mturn_a_nofb, sc)
    n_mcg = hmf.nion_general_mini(st, cosmo, 1, 10.0, np.log(1e5), np.log(1e16),
                                  sc.mturn_m_nofb, sc)
    assert n_mcg > 0
    assert n_mcg < n_acg * 10  # same order or below at these parameters


def test_global_evolution_driver():
    inputs = p21.InputParameters(random_seed=12).evolve_input_structs(
        SOURCE_MODEL="E-INTEGRAL", ZPRIME_STEP_FACTOR=1.4, Z_HEAT_MAX=20.0,
    ).with_logspaced_redshifts(7.0, 20.0)
    ge = p21.run_global_evolution(inputs)
    assert np.all(np.diff(ge.neutral_fraction[::-1]) >= -1e-6) or (
        ge.neutral_fraction[-1] <= ge.neutral_fraction[0]
    )
    assert ge.neutral_fraction[-1] < ge.neutral_fraction[0]
    assert np.all(np.isfinite(ge.brightness_temp))


def test_vcb_flucts_box_statistics():
    """FLUCTS relative-velocity box: Maxwell-Boltzmann-like speed field with
    mean ~ V_CB_AVG (box-truncation deficit allowed) and positive everywhere."""
    inp = p21.InputParameters(random_seed=5).evolve_input_structs(
        HII_DIM=32, DIM=64, BOX_LEN=600.0, V_CB_MODEL="FLUCTS"
    )
    ics = p21.compute_initial_conditions(inp)
    v = np.asarray(ics.lowres_vcb)
    assert v.shape == (32, 32, 32)
    assert np.all(v >= 0)
    # mean |v_cb| ~ 27 km/s (V_CB_AVG_DEFAULT); finite box misses super-box power
    assert 15.0 < v.mean() < 31.0
    # rms/mean ratio of a 3D MB speed field ~ sqrt(3pi/8) ~ 1.085
    ratio = np.sqrt((v**2).mean()) / v.mean()
    assert 1.0 < ratio < 1.2


def test_vcb_flucts_raises_minihalo_mturn(inputs):
    """Per-cell vcb raises the MCG turnover vs the no-streaming case in the
    ionization Mturn grids (through lyman_werner_threshold's f_vcb factor)."""
    from py21cmfast_tpu.models.ionization import _mcrit_kernel
    import jax.numpy as jnp

    ap = inputs.astro_params
    shape = (4, 4, 4)
    zeros = jnp.zeros(shape, jnp.float32)
    args = (zeros, zeros, zeros, jnp.float32(15.0),
            jnp.float32(1e8), jnp.float32(1e5))
    tail = (jnp.float32(ap.A_LW), jnp.float32(ap.BETA_LW),
            jnp.float32(ap.A_VCB), jnp.float32(ap.BETA_VCB))
    _, mt_m_novcb = _mcrit_kernel(*args, jnp.float32(0.0), *tail)
    vbox = jnp.full(shape, 30.0, jnp.float32)
    _, mt_m_vcb = _mcrit_kernel(*args, vbox, *tail)
    assert float(mt_m_vcb.mean()) > float(mt_m_novcb.mean())


def test_trapezoidal_nion_tracking(inputs):
    """The per-R unnormalised Nion grids are carried across snapshots and the
    global means follow the trapezoidal rule (IonisationBox.c:463-529, 834)."""
    outs = [inputs.node_redshifts[0], inputs.node_redshifts[-1]]
    coevals = list(p21.generate_coeval(inputs, out_redshifts=outs))
    first, last = coevals[0], coevals[-1]
    # stacks stored whenever minihalos are on
    assert first.ionized_box.unnormalised_nion is not None
    nion = np.asarray(last.ionized_box.unnormalised_nion)
    assert nion.ndim == 4  # (N_R, HII, HII, HII)
    assert np.all(nion >= 0) and np.all(nion <= 1.0)
    # smoothed Nion accumulates: the late-time box mean exceeds the first
    assert float(nion.mean()) > float(
        np.asarray(first.ionized_box.unnormalised_nion).mean()
    )
    # the trapezoidal global mean stays positive and grows toward low z
    assert float(last.ionized_box.mean_f_coll) > float(first.ionized_box.mean_f_coll) > 0


def test_ts_mcrit_box_per_cell(inputs):
    """Cells with higher v_cb must form fewer MCG stars: the per-cell Mcrit box
    (LW + streaming) feeds the Ts shell SFRD via 2D tables."""
    import jax.numpy as jnp
    from py21cmfast_tpu.models.ionization import _mcrit_kernel

    shape = (4, 4, 4)
    j21 = jnp.zeros(shape, jnp.float32)
    zeros = jnp.zeros(shape, jnp.float32)
    no_reion = jnp.full(shape, -1.0, jnp.float32)
    low_v = jnp.zeros(shape, jnp.float32)
    high_v = jnp.full(shape, 40.0, jnp.float32)
    ap = inputs.astro_params
    args = (jnp.float32(ap.A_LW), jnp.float32(ap.BETA_LW),
            jnp.float32(ap.A_VCB), jnp.float32(ap.BETA_VCB))
    _, m_lo = _mcrit_kernel(zeros, no_reion, j21, jnp.float32(15.0),
                            jnp.float32(1e5), jnp.float32(1e5), low_v, *args)
    _, m_hi = _mcrit_kernel(zeros, no_reion, j21, jnp.float32(15.0),
                            jnp.float32(1e5), jnp.float32(1e5), high_v, *args)
    assert float(m_hi.mean()) > float(m_lo.mean())
    # zero feedback recovers the z-only threshold
    assert np.isclose(
        10.0 ** float(m_lo[0, 0, 0]), 3.314e7 * 16.0**-1.5, rtol=1e-5
    )
