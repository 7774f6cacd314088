"""Component tests: halo sampler statistics, recombinations, cfuncs surface,
templates, luminosity function, management (the tier-2/3 coverage of
SURVEY.md §4 for the newer subsystems)."""

import numpy as np
import pytest

import py21cmfast_tpu as p21
from py21cmfast_tpu import cfuncs
from py21cmfast_tpu.models import hmf, recomb
from py21cmfast_tpu.models.luminosity import compute_luminosity_function


@pytest.fixture(scope="module")
def inputs():
    return p21.InputParameters(random_seed=15).evolve_input_structs(
        HII_DIM=16, DIM=32, BOX_LEN=24.0
    )


# -------------------- hmf / cfuncs --------------------


def test_uhmf_positive_and_declining(inputs):
    m = np.logspace(8, 14, 10)
    dn = cfuncs.return_uhmf_value(inputs, 8.0, m)
    assert np.all(dn > 0)
    assert np.all(np.diff(dn) < 0)


def test_chmf_cutoff_at_condition(inputs):
    """Conditional MF vanishes for M >= M_condition."""
    out = cfuncs.return_chmf_value(inputs, 8.0, [1e9, 1e11, 1e12], 1e11, 0.5)
    assert out[0] > 0
    assert out[1] == 0.0  # sigma(M) == sigma_cond
    assert out[2] == 0.0


def test_condition_integrals_monotonic_in_delta(inputs):
    deltas = np.array([-0.5, 0.0, 0.5, 1.0])
    n, m = cfuncs.evaluate_condition_integrals(inputs, 8.0, [1e12] * 4, deltas)
    assert np.all(np.diff(n) > 0)
    assert np.all(np.diff(m) > 0)


def test_inverse_table_roundtrip(inputs):
    """M(p) must be the inverse of the cumulative N(>M)/N."""
    out = cfuncs.evaluate_inverse_table(inputs, 8.0, 1e12, [0.0], [1.0, 1e-3])
    m_at_p1 = out[0, 0]
    m_rare = out[0, 1]
    assert np.isclose(m_at_p1, inputs.simulation_options.SAMPLER_MIN_MASS, rtol=0.05)
    assert m_rare > 10 * m_at_p1


def test_sampled_mass_function_statistics(inputs):
    """Sampled halos in overdense conditions follow the conditional MF shape
    (role of reference test_halo_sampler.py)."""
    res = cfuncs.sample_halos_from_conditions(
        inputs.evolve_input_structs(SAMPLER_MIN_MASS=1e9, HII_DIM=8, DIM=16, BOX_LEN=24.0),
        8.0,
        np.full(256, 0.5),
        seed=3,
    )
    m = res["halo_masses"]
    assert len(m) > 100
    assert m.min() >= 1e9 * 0.9
    # number in adjacent octave bins should decline
    n1 = np.sum((m > 1e9) & (m < 2e9))
    n2 = np.sum((m > 4e9) & (m < 8e9))
    assert n1 > n2


def test_tau_e_planck_ballpark(inputs):
    zs = np.linspace(5, 12, 30)
    xhi = np.clip((zs - 6.5) / 2.0, 0, 1)
    tau = cfuncs.compute_tau(inputs, zs, xhi)
    assert 0.03 < tau < 0.08


# -------------------- recombinations --------------------


def test_recomb_rate_monotonic_in_gamma(inputs):
    rt = recomb.get_recomb_tables(inputs.cosmology)
    r1 = rt.evaluate(7.0, 0.1)[0]
    r2 = rt.evaluate(7.0, 1.0)[0]
    assert 0 < r1 < r2


def test_gamma_ss_suppression():
    """Self-shielding suppresses Gamma in dense gas."""
    g_thin = recomb.gamma_ss(1.0, 0.1, 1.0, 7.0)
    g_dense = recomb.gamma_ss(1.0, 100.0, 1.0, 7.0)
    assert g_dense < g_thin


def test_mhr_pdf_normalized():
    z = 6.0
    A = recomb.A_MHR(z)
    ln_d = np.linspace(np.log(1e-8), np.log(1e8), 4000)
    d = np.exp(ln_d)
    integral = np.trapezoid(A * recomb._pdf_unnorm(d, z) * d, ln_d)
    assert np.isclose(integral, 1.0, rtol=1e-3)


# -------------------- templates / config / management --------------------


def test_templates_resolve():
    for entry in p21.list_templates():
        inp = p21.create_params_from_template(entry["name"], random_seed=1)
        assert inp.random_seed == 1


def test_template_aliases_and_combination():
    inp = p21.create_params_from_template("simple+size-tiny", random_seed=2)
    assert inp.matter_options.SOURCE_MODEL == "E-INTEGRAL"
    assert inp.simulation_options.HII_DIM == 32
    inp2 = p21.create_params_from_template("munoz21", random_seed=2)
    assert inp2.astro_options.USE_MINI_HALOS


def test_management_sizes(inputs):
    from py21cmfast_tpu import management

    sizes = management.get_expected_sizes(inputs)
    assert sizes["InitialConditions"] > sizes["PerturbedField"]
    total = management.get_total_storage_size(inputs, n_redshifts=10)
    assert total > 10 * sizes["PerturbedField"]


# -------------------- luminosity function --------------------


def test_luminosity_function_shape(inputs):
    muv, mh, lf = compute_luminosity_function([6.0, 8.0], inputs, nbins=40)
    assert muv.shape == (2, 40)
    sel = (muv[0] > -24) & (muv[0] < -16)
    # LF declines toward brighter magnitudes (more negative Muv)
    bright = lf[0][muv[0] < -21]
    faint = lf[0][(muv[0] > -18) & (muv[0] < -16)]
    if len(bright) and len(faint):
        assert np.nanmax(bright) < np.nanmax(faint)
    # number densities in a plausible range at Muv ~ -20
    at20 = lf[0][np.argmin(np.abs(muv[0] + 20))]
    assert -8 < at20 < -1


# -------------------- photon conservation --------------------


def test_analytic_q_monotonic(inputs):
    from py21cmfast_tpu.models.photoncons import analytic_Q_history

    zs, q = analytic_Q_history(
        inputs.evolve_input_structs(SOURCE_MODEL="E-INTEGRAL"), z_min=5.0
    )
    assert np.all(np.diff(q) >= -1e-10)  # Q grows towards low z
    assert q[0] < 0.01
    assert q[-1] > 0.5


def test_fixed_grid_mean_fix_watson(inputs):
    """For an HMF without a conditional form (Watson), the fixed-grid box mean
    must be rescaled to the unconditional Nion integral
    (reference mean_fix_grids, HaloBox.c:207-244)."""
    import jax.numpy as jnp

    from py21cmfast_tpu.models import halobox
    from py21cmfast_tpu.models.ionization import _get_sigma_table

    z = 9.0
    inp = inputs.evolve_input_structs(HMF="WATSON", HII_DIM=8, DIM=16, BOX_LEN=60.0)
    rng = np.random.default_rng(0)
    delta = jnp.asarray(rng.normal(0.0, 0.4, (8, 8, 8)), jnp.float32)
    box = halobox.compute_fixed_halo_grid(z, inp, delta)
    sc = hmf.set_scaling_constants(z, inp)
    st = _get_sigma_table(inp)
    cosmo = inp.cosmology
    so = inp.simulation_options
    m_cell = cosmo.rho_mean * (so.box_len / so.HII_DIM) ** 3
    m_min = hmf.minimum_source_mass(z, inp)
    nion_u = hmf.nion_general(
        st, cosmo, hmf.HMF_WATSON, z, np.log(m_min), np.log(m_cell),
        sc.mturn_a_nofb, sc,
    )
    expected = nion_u * cosmo.rho_crit * cosmo.OMb * sc.fstar_10 * sc.fesc_10 * sc.pop2_ion
    got = float(np.asarray(box.n_ion).mean())
    assert np.isclose(got, expected, rtol=1e-3)


def test_photoncons_fesc_inverts_known_bias(inputs, monkeypatch):
    """Inject a calibration that over-ionizes by 25%: the F-PHOTONCONS fit must
    recover fesc_target ~ 0.8 * F_ESC10 (reference photoncons_fesc:587)."""
    from py21cmfast_tpu.models import photoncons as pc

    inp = inputs.evolve_input_structs(SOURCE_MODEL="E-INTEGRAL")
    z_ana, q_ana = pc.analytic_Q_history(inp)

    def fake_cal(inputs_, hii_dim_cal=32):
        z_cal = np.linspace(5.0, 12.0, 30)
        q = np.interp(z_cal, z_ana[::-1], q_ana[::-1])
        return z_cal, 1.0 - np.clip(1.25 * q, 0.0, 1.0)  # 25% over-ionized

    monkeypatch.setattr(pc, "calibrate_photon_cons", fake_cal)
    fit = pc.photoncons_fesc(inp)
    f0 = inp.astro_params.fesc_10
    # targets should sit at fesc/1.25 = 0.8 fesc wherever Q is in range
    v_mid = fit.value_at(float(z_ana[np.argmin(np.abs(q_ana - 0.5))]))
    assert np.isclose(v_mid, 0.8 * f0, rtol=0.05)


def test_photoncons_alpha_null_when_conserving(inputs, monkeypatch):
    """A perfectly conserving calibration must return ALPHA_ESC unchanged."""
    from py21cmfast_tpu.models import photoncons as pc

    inp = inputs.evolve_input_structs(SOURCE_MODEL="E-INTEGRAL")
    z_ana, q_ana = pc.analytic_Q_history(inp, n=256)

    def fake_cal(inputs_, hii_dim_cal=32):
        z_cal = np.linspace(5.0, 12.0, 30)
        q = np.interp(z_cal, z_ana[::-1], q_ana[::-1])
        return z_cal, 1.0 - q

    monkeypatch.setattr(pc, "calibrate_photon_cons", fake_cal)
    fit = pc.photoncons_alpha(inp)
    a0 = inp.astro_params.ALPHA_ESC
    assert abs(fit.value_at(8.0) - a0) < 0.1


def test_number_limited_sampler(inputs):
    """NUMBER-LIMITED sampling: halo count is Poisson around the expected CMF
    integral (reference stoc_halo_sample, Stochasticity.c:259-276)."""
    from py21cmfast_tpu.models import hmf
    from py21cmfast_tpu.models.ionization import _get_sigma_table

    inp = inputs.evolve_input_structs(
        SAMPLER_MIN_MASS=1e9, HII_DIM=8, DIM=16, BOX_LEN=24.0,
        SAMPLE_METHOD="NUMBER-LIMITED",
    )
    n_cond = 2048
    res = cfuncs.sample_halos_from_conditions(inp, 8.0, np.full(n_cond, 0.5), seed=3)
    st = _get_sigma_table(inp)
    cosmo = inp.cosmology
    growth = float(cosmo.dicke(8.0))
    m_cond = cosmo.rho_mean * 3.0**3
    sig_c = float(st.sigma_of_lnm(np.log(m_cond)))
    n_exp = hmf.nhalo_conditional(
        st, hmf.HMF_NAMES[inp.matter_options.HMF], growth, np.log(1e9),
        np.array([np.log(m_cond)]), np.array([sig_c]), np.array([0.5]),
    )[0] * m_cond
    assert np.isclose(len(res["halo_masses"]) / n_cond, n_exp, rtol=0.1)


def test_sample_method_only_affects_progenitors(inputs):
    """Grid conditions always sample number-limited regardless of
    SAMPLE_METHOD (stoc_sample, Stochasticity.c:696-699): identical seeds give
    identical grid samples across methods."""
    outs = {}
    for method in ("MASS-LIMITED", "BINARY-SPLIT"):
        inp = inputs.evolve_input_structs(
            SAMPLE_METHOD=method, HII_DIM=8, DIM=16, BOX_LEN=24.0
        )
        outs[method] = cfuncs.sample_halos_from_conditions(
            inp, 8.0, np.full(8, 0.5), seed=3
        )["halo_masses"]
    np.testing.assert_array_equal(outs["MASS-LIMITED"], outs["BINARY-SPLIT"])


def test_convert_halo_properties(inputs):
    """Scaling-relation property conversion (reference convert_halo_properties):
    stellar mass scales with halo mass, fesc-weighting reduces sfr."""
    m = np.array([1e9, 1e10, 1e11, 1e12], np.float32)
    props = cfuncs.convert_halo_properties(inputs, 8.0, m)
    assert np.all(np.diff(props["stellar_mass"]) > 0)
    assert np.all(props["sfr"] > 0)
    assert np.all(props["fesc_weighted_sfr"] <= props["sfr"] * inputs.astro_params.POP2_ION)
    assert np.all(props["xray_luminosity"] > 0)


def test_dexm_no_overlap_semantics(inputs):
    """DexM strict mode must not place a smaller halo whose sphere overlaps a
    larger one (reference check_halo(.., 1)); DEXM_OPTIMIZE relaxes the test
    for large masses and can only find >= as many centres."""
    from py21cmfast_tpu.models.halos import dexm_halo_grid

    inp = inputs.evolve_input_structs(HII_DIM=16, DIM=32, BOX_LEN=32.0)
    ics = p21.compute_initial_conditions(inp)
    grid, in_halo = dexm_halo_grid(9.0, inp, ics)
    grid = np.asarray(grid)
    centres = np.argwhere(grid > 0)
    masses = grid[grid > 0]
    if len(centres) >= 2:
        # every pair of centres must be separated by at least the larger radius
        cosmo = inp.cosmology
        r_of = lambda m: float(cosmo.MtoR(m))
        cell = 32.0 / 32
        n = len(centres)
        for i in range(min(n, 20)):
            for j in range(i + 1, min(n, 20)):
                d = centres[i] - centres[j]
                d = np.minimum(np.abs(d), 32 - np.abs(d))  # periodic
                dist = np.sqrt((d**2).sum()) * cell
                r_big = max(r_of(masses[i]), r_of(masses[j]))
                if masses[i] != masses[j]:  # same-level overlaps allowed
                    assert dist > 0.8 * r_big, (dist, r_big)
    inp_opt = inp.evolve_input_structs(DEXM_OPTIMIZE=True)
    grid_o, _ = dexm_halo_grid(9.0, inp_opt, ics)
    assert np.sum(np.asarray(grid_o) > 0) >= np.sum(grid > 0)


def test_fixed_grids_velocity_displaced():
    """Sub-resolution source grids are displaced to Eulerian positions
    (move_grid_galprops): their small-scale cross-correlation with the evolved
    density must exceed the Lagrangian-fixed version's."""
    import py21cmfast_tpu as p21
    from py21cmfast_tpu.models import halobox
    from py21cmfast_tpu.ops.ps import reference_binned_power

    inp = p21.InputParameters(random_seed=12).evolve_input_structs(
        HII_DIM=24, DIM=48, BOX_LEN=36.0, SOURCE_MODEL="L-INTEGRAL",
    )
    z = 8.0
    ics = p21.compute_initial_conditions(inp)
    pf = p21.perturb_field(z, inp, ics)
    fixed = halobox.compute_fixed_halo_grid(z, inp, ics.lowres_density)
    moved = halobox.compute_fixed_halo_grid(z, inp, ics.lowres_density, ics=ics)

    # The displaced deposit carries the BARE Lagrangian cell integrals (the
    # Eulerian source pile-up comes from the CIC transport; reference
    # move_grid_galprops deposits without (1+delta), map_mass.c:299-320),
    # so its mean is the Lagrangian <fcoll> — BELOW the undisplaced grid's
    # Eulerian <(1+delta) fcoll> mean, and preserved by the transport.
    m_fix = float(np.mean(np.asarray(fixed.halo_sfr)))
    m_mov = float(np.mean(np.asarray(moved.halo_sfr)))
    assert m_mov < m_fix
    assert m_mov > 0.3 * m_fix

    d = np.asarray(pf.density, np.float64)
    box_lens = inp.simulation_options.box_lens

    def cross_corr(a):
        """Normalized cross-correlation coefficient r(k) with the evolved
        density (amplitude-free: the displaced grid intentionally has a
        different normalization than the (1+delta)-weighted Lagrangian one)."""
        a = np.asarray(a, np.float64)
        _, p_sum, _ = reference_binned_power(
            (a / a.mean() - 1) + (d - d.mean()), box_lens
        )
        _, p_a, _ = reference_binned_power(a / a.mean() - 1, box_lens)
        _, p_d, _ = reference_binned_power(d - d.mean(), box_lens)
        return (p_sum - p_a - p_d) / 2 / np.sqrt(p_a * p_d)

    r_moved = cross_corr(moved.halo_sfr)
    r_fixed = cross_corr(fixed.halo_sfr)
    # sources tracking the matter flow decorrelate less at small scales
    hi = slice(len(r_moved) // 2, None)
    assert np.mean(r_moved[hi]) > np.mean(r_fixed[hi])


@pytest.mark.slow
def test_factored_deposit_matches_scatter():
    """The factored dense deposit (+ outlier scatter) is exact vs the
    per-particle scatter path — across even/odd hires ratios and when the
    support forces many cells through the fixed-capacity outlier branch."""
    import jax.numpy as jnp

    from py21cmfast_tpu.ops import cic
    from py21cmfast_tpu.ops.deposit import factored_cic_deposit
    from py21cmfast_tpu.ops.sep_deposit import staged_factored_deposit

    rng = np.random.default_rng(0)
    for R in (1, 2, 3, 4):
        nl = 8
        nh = nl * R
        hires = rng.normal(0, 0.1, (nh, nh, nh)).astype(np.float32)
        psi = tuple(
            jnp.asarray(rng.normal(0, 1.0, (nl, nl, nl)).astype(np.float32))
            for _ in range(3)
        )
        d2c = (nl / 48.0,) * 3
        ii = np.arange(nh)
        mapx = ((ii * (nl / nh) + 0.5).astype(int)) % nl
        I, J, K = np.meshgrid(ii, ii, ii, indexing="ij")
        MI, MJ, MK = mapx[I], mapx[J], mapx[K]
        m = 1.0 + hires * 0.5

        for fac, S in ((0.4, 1), (3.0, 1), (3.0, 2)):
            out_dense = np.asarray(factored_cic_deposit(
                jnp.asarray(hires), psi, None,
                jnp.float32(0.5), jnp.float32(fac), jnp.float32(0.0), d2c,
                ratio=R, support=S, cap=512, lo_shape=(nl, nl, nl),
            ))
            out_sep = np.asarray(staged_factored_deposit(
                jnp.asarray(hires), psi, None,
                jnp.float32(0.5), jnp.float32(fac), jnp.float32(0.0), d2c,
                ratio=R, support=S, cap=512, lo_shape=(nl, nl, nl),
            ))
            assert np.abs(out_sep - out_dense).max() < 2e-4, (R, fac, S)
            px = I / R + np.asarray(psi[0])[MI, MJ, MK] * fac * d2c[0]
            py = J / R + np.asarray(psi[1])[MI, MJ, MK] * fac * d2c[1]
            pz = K / R + np.asarray(psi[2])[MI, MJ, MK] * fac * d2c[2]
            acc = cic.cic_scatter_flat(
                jnp.zeros(nl**3, jnp.float32),
                jnp.asarray(px.ravel()), jnp.asarray(py.ravel()),
                jnp.asarray(pz.ravel()), jnp.asarray(m.ravel()), (nl, nl, nl),
            )
            out_sc = np.asarray(acc).reshape(nl, nl, nl)
            assert np.abs(out_dense - out_sc).max() < 2e-4, (R, fac, S)


def test_perturb_deposit_modes_agree():
    """PERTURB_DEPOSIT='SWEPT' reproduces the scatter deposit end-to-end."""
    import py21cmfast_tpu as p21

    pfs = {}
    for dep in ("SCATTER", "SWEPT"):
        inputs = p21.InputParameters(random_seed=4).evolve_input_structs(
            HII_DIM=16, DIM=32, BOX_LEN=24.0, PERTURB_DEPOSIT=dep,
        )
        ics = p21.compute_initial_conditions(inputs)
        pfs[dep] = p21.perturb_field(8.0, inputs, ics)
    a = np.asarray(pfs["SCATTER"].density, np.float64)
    b = np.asarray(pfs["SWEPT"].density, np.float64)
    assert np.sqrt(np.mean((a - b) ** 2)) < 1e-4 * max(a.std(), 1e-3)


def test_pallas_deposit_paths_cpu_equivalence():
    """The stack-based outlier scatter (pallas path) equals the sep_deposit
    outlier scatter given the same plan (CPU check; the kernel itself is
    TPU-only and validated by scripts/r3_pallas_check.py on hardware)."""
    import jax.numpy as jnp

    from py21cmfast_tpu.ops import pallas_deposit as PD
    from py21cmfast_tpu.ops.sep_deposit import (
        _bad_mask, _outlier_scatter, staged_factored_deposit,
    )

    rng = np.random.default_rng(2)
    R, nl, S, cap = 2, 8, 1, 128
    nh = nl * R
    hires = jnp.asarray(rng.normal(0, 0.1, (nh, nh, nh)).astype(np.float32))
    d = tuple(
        jnp.asarray(rng.normal(0, 1.4, (nl, nl, nl)).astype(np.float32))
        for _ in range(3)
    )
    bad = _bad_mask(d, ratio=R, support=S)
    assert int(np.asarray(bad).sum()) > 0  # exercise the outlier branch
    acc0 = jnp.zeros((nl, nl, nl), jnp.float32)
    a = _outlier_scatter(
        acc0, hires, jnp.float32(0.5), d, bad, ratio=R, cap=cap,
        lo_shape=(nl, nl, nl),
    )
    chan = PD.build_channel_stack(
        hires, jnp.float32(0.5), ratio=R, lo_shape=(nl, nl, nl)
    )
    b = PD.outlier_scatter_from_stack(
        acc0, chan, d, bad, ratio=R, cap=cap, lo_shape=(nl, nl, nl)
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_channel_stack_matches_chan_slices():
    """build_channel_stack equals the per-channel strided-slice definition
    (incl. the x wrap padding)."""
    import jax.numpy as jnp

    from py21cmfast_tpu.ops import pallas_deposit as PD
    from py21cmfast_tpu.ops.sep_deposit import _chan_slice

    rng = np.random.default_rng(3)
    R, nl = 3, 6
    hires = jnp.asarray(rng.normal(0, 0.2, (18, 18, 18)).astype(np.float32))
    stack = np.asarray(PD.build_channel_stack(
        hires, jnp.float32(0.4), ratio=R, lo_shape=(nl, nl, nl)
    ))
    m = 1.0 + np.asarray(hires) * 0.4
    P = PD.PAD_X
    for rx in range(R):
        for ry in range(R):
            for rz in range(R):
                r3 = (rx * R + ry) * R + rz
                c = np.asarray(_chan_slice(jnp.asarray(m), rx, ry, rz, R))
                np.testing.assert_allclose(
                    stack[r3, P:P + nl], c, atol=1e-6
                )
                # x wrap pads
                np.testing.assert_allclose(stack[r3, :P], c[nl - P:], atol=1e-6)
                np.testing.assert_allclose(stack[r3, P + nl:], c[:P], atol=1e-6)


def test_deprecated_input_aliases():
    """Reference-era field names map through with DeprecationWarnings
    (inputs.py:819-840, 1336-1365, 1540-1735)."""
    import warnings

    base = p21.InputParameters(random_seed=1)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        i = base.evolve_input_structs(
            INHOMO_RECO=True, USE_RELATIVE_VELOCITIES=True,
            USE_MINI_HALOS=True, USE_TS_FLUCT=True, FIXED_VAVG=30.0,
        )
    assert i.astro_options.RECOMB_MODEL == "INHOMOGENEOUS"
    assert i.astro_options.INHOMO_RECO is True  # legacy read-only property
    assert i.matter_options.V_CB_MODEL == "FLUCTS"
    assert i.astro_params.V_CB_AVG_DEBUG == 30.0
    assert sum(issubclass(x.category, DeprecationWarning) for x in w) == 3


def test_cfuncs_round3_surface(inputs):
    """The round-3 cfuncs additions return physically sensible values."""
    assert 0.1 < cfuncs.get_growth_factor(inputs, 8.0) < 0.2
    p = cfuncs.get_matter_power_values(inputs, [0.1, 1.0])
    assert p[0] > p[1] > 0
    assert cfuncs.get_condition_mass(inputs, 5.0) > 1e13
    assert 1.3 < cfuncs.get_delta_crit(inputs, 1e12, 8.0) < 1.8
    inp_s = inputs.evolve_input_structs(SAMPLER_MIN_MASS=1e10)
    n = cfuncs.get_expected_nhalo(inp_s, 8.0)
    assert 10 < n < 1e7
    assert cfuncs.get_halo_catalog_buffer_size(inp_s, 8.0) >= n
    mt_a, mt_m = cfuncs.compute_mturns(
        inputs.evolve_input_structs(USE_MINI_HALOS=True, USE_TS_FLUCT=True,
                                    RECOMB_MODEL="inhomogeneous",
                                    R_BUBBLE_MAX=5.0),
        8.0, J_LW_21=1.0,
    )
    assert mt_a > 1e7 and 1e5 < mt_m < mt_a * 10
    f = cfuncs.evaluate_FgtrM_cond(inputs, 8.0, 1e13, [0.0, 0.5])
    assert 0 < f[0] < f[1] < 1
    sfrd, _ = cfuncs.evaluate_SFRD_z(inputs, [8.0, 12.0])
    assert sfrd[0] > sfrd[1] > 0
    nion, _ = cfuncs.evaluate_Nion_z(inputs, [8.0, 12.0])
    assert nion[0] > nion[1] > 0
    ci = cfuncs.integrate_chmf_interval(inputs, 8.0, 1e9, 1e11, 1e13, [0.0, 0.5])
    assert ci[1] > ci[0] > 0
