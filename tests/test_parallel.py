"""Multi-device sharding tests on the virtual 8-device CPU mesh: distributed
FFT round-trips and the sharded drivers vs the single-device path."""

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from py21cmfast_tpu.parallel import mesh as pmesh
from py21cmfast_tpu.parallel import pfft


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must set 8 virtual devices"
    return pmesh.make_mesh(8)


def test_distributed_rfft_matches_local(mesh8):
    shape = (16, 16, 16)
    rng = np.random.default_rng(0)
    x = rng.normal(size=shape).astype(np.float32)

    f = shard_map(
        pfft.rfft3,
        mesh=mesh8,
        in_specs=P(pmesh.GRID_AXIS, None, None),
        out_specs=P(None, pmesh.GRID_AXIS, None),
    )
    got = jax.jit(f)(jnp.asarray(x))
    want = np.fft.rfftn(x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-3)


def test_distributed_fft_roundtrip(mesh8):
    shape = (16, 16, 16)
    rng = np.random.default_rng(1)
    x = rng.normal(size=shape).astype(np.float32)

    def roundtrip(local):
        return pfft.irfft3(pfft.rfft3(local), shape[2])

    f = shard_map(
        roundtrip,
        mesh=mesh8,
        in_specs=P(pmesh.GRID_AXIS, None, None),
        out_specs=P(pmesh.GRID_AXIS, None, None),
    )
    got = jax.jit(f)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), x, rtol=1e-4, atol=1e-5)


def test_local_kmag_matches_global(mesh8):
    from py21cmfast_tpu.ops import grids

    shape = (16, 16, 16)
    box_lens = (50.0, 50.0, 50.0)

    f = shard_map(
        lambda: pfft.local_kmag(shape, box_lens, 8),
        mesh=mesh8,
        in_specs=(),
        out_specs=P(None, pmesh.GRID_AXIS, None),
    )
    got = jax.jit(f)()
    want = grids.kmag_grid(shape, box_lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


@pytest.mark.slow
def test_sharded_coeval_matches_single_device():
    """Full sharded driver (ICs -> perturb w/ halo exchange -> ionize -> Tb)
    matches the single-device pipeline at float32 precision."""
    import py21cmfast_tpu as p21
    from py21cmfast_tpu.parallel.driver import run_sharded_coeval
    from py21cmfast_tpu.parallel.mesh import make_mesh

    inputs = p21.InputParameters(random_seed=9).evolve_input_structs(
        HII_DIM=24, DIM=48, BOX_LEN=36.0, SOURCE_MODEL="E-INTEGRAL",
        PERTURB_ALGORITHM="ZELDOVICH",
    )
    mesh = make_mesh(8)
    o = run_sharded_coeval(inputs, [8.0], mesh=mesh)[0]

    ics = p21.compute_initial_conditions(inputs)
    pf = p21.perturb_field(8.0, inputs, ics)
    ion = p21.compute_ionization_field(8.0, inputs, pf)

    d_sh, d1 = np.asarray(o.density), np.asarray(pf.density)
    assert np.sqrt(np.mean((d_sh - d1) ** 2)) < 1e-4 * d1.std() + 1e-6
    xh_sh, xh1 = np.asarray(o.neutral_fraction), np.asarray(ion.neutral_fraction)
    assert abs(xh_sh.mean() - xh1.mean()) < 1e-3
    # threshold cells may flip from FFT roundoff; require < 0.5% mismatch
    assert np.mean(np.round(xh_sh, 3) != np.round(xh1, 3)) < 5e-3


@pytest.mark.slow
def test_sharded_ts_recomb_matches_single_device():
    """The Ts shell ladder + inhomogeneous recombinations + ionization produce
    the same snapshot under shard_map (GridOps seam) as on a single device,
    given identical inputs (round-2 north-star coverage: USE_TS_FLUCT +
    INHOMO_RECO on the mesh)."""
    import py21cmfast_tpu as p21
    from py21cmfast_tpu.models.ionization import compute_ionization_field
    from py21cmfast_tpu.models.spintemp import compute_spin_temperature
    from py21cmfast_tpu.parallel.mesh import make_mesh

    inputs = p21.InputParameters(random_seed=4).evolve_input_structs(
        HII_DIM=16, DIM=32, BOX_LEN=32.0, SOURCE_MODEL="E-INTEGRAL",
        USE_TS_FLUCT=True, RECOMB_MODEL="inhomogeneous", R_BUBBLE_MAX=16.0,
        USE_EXP_FILTER=False, CELL_RECOMB=False,
        ZPRIME_STEP_FACTOR=1.3, Z_HEAT_MAX=12.0,
    ).with_logspaced_redshifts(8.0)
    mesh = make_mesh(8)

    ics = p21.compute_initial_conditions(inputs)
    pf = p21.perturb_field(8.0, inputs, ics)

    results = {}
    for label, m in (("single", None), ("sharded", mesh)):
        ts, _ = compute_spin_temperature(
            8.0, inputs, pf,
            prev_state=compute_spin_temperature(12.5, inputs, pf)[1],
            prev_redshift=12.5, mesh=m,
        )
        ion = compute_ionization_field(8.0, inputs, pf, spin_temp=ts, mesh=m)
        results[label] = (ts, ion)

    ts1, ion1 = results["single"]
    ts8, ion8 = results["sharded"]
    np.testing.assert_allclose(
        np.asarray(ts8.spin_temperature), np.asarray(ts1.spin_temperature),
        rtol=2e-3, atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(ts8.kinetic_temp_neutral), np.asarray(ts1.kinetic_temp_neutral),
        rtol=2e-3, atol=1e-2,
    )
    xh1 = np.asarray(ion1.neutral_fraction)
    xh8 = np.asarray(ion8.neutral_fraction)
    mismatched = np.abs(xh8 - xh1) > 2e-3
    assert mismatched.mean() < 0.005
    rec1 = np.asarray(ion1.cumulative_recombinations)
    rec8 = np.asarray(ion8.cumulative_recombinations)
    np.testing.assert_allclose(rec8, rec1, rtol=5e-3, atol=1e-5)


@pytest.mark.slow
def test_sharded_driver_full_ts_recomb_pipeline():
    """run_sharded_coeval scrolls the node ladder with Ts + recombinations,
    producing finite x-slab-sharded outputs."""
    import py21cmfast_tpu as p21
    from py21cmfast_tpu.parallel.driver import run_sharded_coeval
    from py21cmfast_tpu.parallel.mesh import make_mesh

    inputs = p21.InputParameters(random_seed=7).evolve_input_structs(
        HII_DIM=16, DIM=32, BOX_LEN=32.0, SOURCE_MODEL="E-INTEGRAL",
        USE_TS_FLUCT=True, RECOMB_MODEL="inhomogeneous", R_BUBBLE_MAX=16.0,
        USE_EXP_FILTER=False, CELL_RECOMB=False, PERTURB_ALGORITHM="ZELDOVICH",
        ZPRIME_STEP_FACTOR=1.4, Z_HEAT_MAX=14.0,
    ).with_logspaced_redshifts(8.0)
    mesh = make_mesh(8)
    o = run_sharded_coeval(inputs, [8.0], mesh=mesh)[-1]
    xh = np.asarray(o.neutral_fraction)
    tb = np.asarray(o.brightness_temp)
    ts = np.asarray(o.spin_temperature)
    assert np.isfinite(tb).all() and np.isfinite(ts).all()
    assert 0.0 <= xh.min() and xh.max() <= 1.0
    assert "x" in str(o.neutral_fraction.sharding.spec)


@pytest.mark.slow
def test_sharded_coeval_2lpt_matches_single_device():
    """2LPT displacements on-mesh (phi_ij through the distributed FFT) match
    the single-device 2LPT perturb at float32 precision."""
    import py21cmfast_tpu as p21
    from py21cmfast_tpu.parallel.driver import run_sharded_coeval
    from py21cmfast_tpu.parallel.mesh import make_mesh

    inputs = p21.InputParameters(random_seed=11).evolve_input_structs(
        HII_DIM=24, DIM=48, BOX_LEN=36.0, SOURCE_MODEL="E-INTEGRAL",
        PERTURB_ALGORITHM="2LPT",
    )
    mesh = make_mesh(8)
    o = run_sharded_coeval(inputs, [8.0], mesh=mesh)[0]

    ics = p21.compute_initial_conditions(inputs)
    pf = p21.perturb_field(8.0, inputs, ics)

    d_sh, d1 = np.asarray(o.density), np.asarray(pf.density)
    assert np.sqrt(np.mean((d_sh - d1) ** 2)) < 1e-3 * d1.std() + 1e-6
    # the 2LPT term must actually displace mass: compare against the ZA-only
    # sharded run and require a real difference
    inputs_za = inputs.evolve_input_structs(PERTURB_ALGORITHM="ZELDOVICH")
    o_za = run_sharded_coeval(inputs_za, [8.0], mesh=mesh)[0]
    assert np.sqrt(np.mean((d_sh - np.asarray(o_za.density)) ** 2)) > 1e-3


def test_multihost_initialize_single_process():
    """jax.distributed init path: single-process bring-up + idempotence.

    Runs in a subprocess because jax.distributed.initialize must precede any
    backend use (test order in the suite would otherwise matter)."""
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        "from py21cmfast_tpu.parallel import multihost\n"
        "multihost.initialize(coordinator_address='localhost:12987',"
        " num_processes=1, process_id=0)\n"
        "multihost.initialize()\n"
        "assert multihost.is_initialized()\n"
        "assert multihost.process_info() == (0, 1)\n"
        "print('MULTIHOST_OK')\n"
    )
    # force CPU via env too: the ambient JAX_PLATFORMS=axon makes the TPU
    # plugin initialize the XLA backend at import (before
    # jax.distributed.initialize), which is exactly what this test must avoid
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120,
        env=env,
    )
    assert "MULTIHOST_OK" in out.stdout, out.stderr[-500:]


@pytest.mark.slow
def test_slab_parallel_sampler_statistics(mesh8):
    """Slab-decomposed halo sampling reproduces the single-device statistics
    (same CMF + stopping rules, independent streams per slab)."""
    import py21cmfast_tpu as p21
    from py21cmfast_tpu.models.halos import sample_halo_grid
    from py21cmfast_tpu.parallel.sampler import sample_halo_grid_slabs

    inputs = p21.InputParameters(random_seed=21).evolve_input_structs(
        HII_DIM=16, DIM=32, BOX_LEN=48.0, SOURCE_MODEL="CHMF-SAMPLER",
        SAMPLER_MIN_MASS=5e9,
    )
    ics = p21.compute_initial_conditions(inputs)

    m1, p1, t1 = sample_halo_grid(8.0, inputs, ics.lowres_density)
    m1 = np.asarray(m1)
    mass1 = m1.sum()
    n1 = int(np.sum(m1 > 0))

    cat = sample_halo_grid_slabs(8.0, inputs, ics.lowres_density)
    m2 = np.asarray(cat.halo_masses)[: int(cat.n_halos)]
    mass2 = m2.sum()
    n2 = len(m2)

    # Poisson-level agreement in count and total mass
    assert abs(n2 - n1) < 6 * np.sqrt(max(n1, 1) + 1), (n1, n2)
    assert abs(mass2 / mass1 - 1) < 0.2, (mass1, mass2)
    # positions must span the full box (every slab contributed, global coords)
    x = np.asarray(cat.halo_coords)[: int(cat.n_halos), 0]
    assert x.min() < 6.0 and x.max() > 42.0


@pytest.mark.slow
def test_slab_parallel_progenitor_scroll(mesh8):
    """Slab-partitioned progenitor sampling conserves the catalog's statistics
    through one scroll step."""
    import py21cmfast_tpu as p21
    from py21cmfast_tpu.models.halos import determine_halo_catalog
    from py21cmfast_tpu.parallel.sampler import (
        determine_halo_catalog_slabs, sample_progenitors_slabs,
    )

    inputs = p21.InputParameters(random_seed=4).evolve_input_structs(
        HII_DIM=16, DIM=32, BOX_LEN=48.0, SOURCE_MODEL="CHMF-SAMPLER",
        SAMPLER_MIN_MASS=5e9,
    )
    ics = p21.compute_initial_conditions(inputs)

    cat0 = determine_halo_catalog_slabs(10.0, inputs, ics)
    cat1 = determine_halo_catalog_slabs(9.0, inputs, ics, previous_catalog=cat0)

    ref0 = determine_halo_catalog(10.0, inputs, ics)
    ref1 = determine_halo_catalog(9.0, inputs, ics, previous_catalog=ref0)

    m_slab = np.asarray(cat1.halo_masses)[: int(cat1.n_halos)]
    m_ref = np.asarray(ref1.halo_masses)[: int(ref1.n_halos)]
    assert m_slab.sum() > 0
    assert abs(m_slab.sum() / m_ref.sum() - 1) < 0.2
    n_s, n_r = len(m_slab), len(m_ref)
    assert abs(n_s - n_r) < 6 * np.sqrt(max(n_r, 1) + 1), (n_s, n_r)


@pytest.mark.slow
def test_sharded_lightcone_matches_single_device(mesh8):
    """run_sharded_lightcone assembles the same cone as the single-device
    driver (same seed; float32-level tolerance)."""
    import py21cmfast_tpu as p21
    from py21cmfast_tpu.drivers.lightcone import run_lightcone
    from py21cmfast_tpu.parallel.driver import run_sharded_lightcone

    inputs = p21.InputParameters(random_seed=13).evolve_input_structs(
        HII_DIM=16, DIM=32, BOX_LEN=48.0, SOURCE_MODEL="E-INTEGRAL",
        PERTURB_ALGORITHM="ZELDOVICH", ZPRIME_STEP_FACTOR=1.15,
    ).with_logspaced_redshifts(8.0, 10.0)

    lc_sh = run_sharded_lightcone(inputs, mesh=mesh8)
    lc_1d = run_lightcone(inputs)

    bt_sh = np.asarray(lc_sh.brightness_temp)
    bt_1d = np.asarray(lc_1d.brightness_temp)
    assert bt_sh.shape == bt_1d.shape
    rms = np.sqrt(np.mean((bt_sh - bt_1d) ** 2))
    assert rms < 0.05 * bt_1d.std() + 1e-3, (rms, bt_1d.std())
    np.testing.assert_allclose(
        lc_sh.global_quantities["neutral_fraction"],
        lc_1d.global_quantities["neutral_fraction"],
        atol=2e-3,
    )


def test_sharded_halo_paint_matches_single_device(mesh8):
    """Given the SAME perturbed catalog, the mesh painting (slab CIC +
    ppermute margins, parallel/halopaint.py) reproduces the single-device
    compute_halo_grid source fields exactly (up to float order)."""
    import py21cmfast_tpu as p21
    from py21cmfast_tpu.models import halobox as hb
    from py21cmfast_tpu.models import halos as halos_module
    from py21cmfast_tpu.parallel.halopaint import sharded_halo_grids

    inputs = p21.InputParameters(random_seed=21).evolve_input_structs(
        HII_DIM=16, DIM=32, BOX_LEN=48.0, SOURCE_MODEL="CHMF-SAMPLER",
        SAMPLER_MIN_MASS=2e9,
    )
    ics = p21.compute_initial_conditions(inputs)
    cat = halos_module.determine_halo_catalog(9.0, inputs, ics)
    pt = halos_module.perturb_halo_catalog(9.0, inputs, ics, cat)
    single = hb.compute_halo_grid(9.0, inputs, pt)
    sharded = sharded_halo_grids(9.0, inputs, pt, mesh8)
    for name in ("n_ion", "halo_sfr", "whalo_sfr", "halo_xray"):
        a = np.asarray(getattr(single, name), np.float64)
        b = np.asarray(getattr(sharded, name), np.float64)
        scale = max(np.abs(a).max(), 1e-30)
        assert np.abs(a - b).max() < 1e-4 * scale, name


_SAMPLER_E2E_BODY = """
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import py21cmfast_tpu as p21
from py21cmfast_tpu.parallel import mesh as pmesh
from py21cmfast_tpu.parallel.driver import run_sharded_coeval

mesh8 = pmesh.make_mesh(8)
inputs = p21.InputParameters(random_seed=31).evolve_input_structs(
    HII_DIM=16, DIM=32, BOX_LEN=48.0, SOURCE_MODEL="CHMF-SAMPLER",
    SAMPLER_MIN_MASS=2e9, ZPRIME_STEP_FACTOR=1.2,
).with_logspaced_redshifts(8.0, 12.0)
[shard_out] = run_sharded_coeval(inputs, [8.0], mesh=mesh8)
xh_sharded = np.asarray(shard_out.neutral_fraction)
assert xh_sharded.shape == (16, 16, 16)
assert np.all((xh_sharded >= 0) & (xh_sharded <= 1))

[cv] = p21.run_coeval(inputs, [8.0])
xh_single = np.asarray(cv.ionized_box.neutral_fraction)
# same physics, independent halo realizations: global means agree loosely
assert abs(xh_sharded.mean() - xh_single.mean()) < 0.15
print("SAMPLER-E2E-OK")
"""


@pytest.mark.slow
def test_sharded_coeval_sampler_end_to_end():
    """CHMF-SAMPLER through run_sharded_coeval (slab sampling + sharded
    painting + mesh ionization): statistics match the single-device driver
    (different RNG partition, so compare means).

    Runs in a fresh subprocess: the 8-way SPMD sampler program is the largest
    CPU compile in the suite, and XLA's single-core LLVM backend segfaults on
    it once the parent process has accumulated a few hundred JIT'd modules
    (deterministic at full-suite scale, never in isolation).  A clean process
    compiles it reliably and still exercises the identical code path."""
    import subprocess
    import sys

    env = dict(os.environ)
    prev = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in prev:
        env["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()
    proc = subprocess.run(
        [sys.executable, "-c", _SAMPLER_E2E_BODY],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=str(Path(__file__).resolve().parents[1]),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SAMPLER-E2E-OK" in proc.stdout


def test_sharded_vcb_matches_single_device(mesh8):
    """The sharded v_cb realization (build_sharded_lowres_ics with_vcb) is
    the same field the single-device ICs produce (models/ics.compute_vcb_box)
    — identical white noise, distributed FFT, f32-level agreement."""
    import py21cmfast_tpu as p21
    from py21cmfast_tpu.models.ics import vcb_ratio_table, power_amplitude_table
    from py21cmfast_tpu.parallel.mesh import GRID_AXIS
    from py21cmfast_tpu.parallel.perturb import build_sharded_lowres_ics
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    inputs = p21.InputParameters(random_seed=21).evolve_input_structs(
        HII_DIM=16, DIM=32, BOX_LEN=32.0, USE_MINI_HALOS=True,
        V_CB_MODEL="FLUCTS", USE_TS_FLUCT=True, M_TURN=5.0,
    )
    so = inputs.simulation_options
    ln_k, sqrtp = power_amplitude_table(inputs)
    key = jax.random.PRNGKey(inputs.random_seed)
    white = jax.random.normal(key, so.hires_shape, dtype=jnp.float32)
    white = jax.device_put(
        white, NamedSharding(mesh8, P(GRID_AXIS, None, None))
    )
    fn = build_sharded_lowres_ics(
        mesh8, so.hires_shape, so.lowres_shape, so.box_lens, with_vcb=True
    )
    *_, vcb_sh = fn(white, ln_k, sqrtp, *vcb_ratio_table(inputs))

    ics = p21.compute_initial_conditions(inputs)
    vcb_1 = np.asarray(ics.lowres_vcb)
    vcb_8 = np.asarray(vcb_sh)
    assert vcb_1.shape == vcb_8.shape
    np.testing.assert_allclose(vcb_8, vcb_1, rtol=2e-4, atol=2e-3)


_SAMPLER_TS_MINI_E2E_BODY = """
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import py21cmfast_tpu as p21
from py21cmfast_tpu.parallel import mesh as pmesh
from py21cmfast_tpu.parallel.driver import run_sharded_coeval

mesh8 = pmesh.make_mesh(8)
inputs = p21.InputParameters(random_seed=7).evolve_input_structs(
    HII_DIM=16, DIM=32, BOX_LEN=48.0, SOURCE_MODEL="CHMF-SAMPLER",
    SAMPLER_MIN_MASS=2e9, USE_TS_FLUCT=True, USE_MINI_HALOS=True,
    V_CB_MODEL="FLUCTS", M_TURN=5.0, RECOMB_MODEL="inhomogeneous",
    R_BUBBLE_MAX=15.0, ZPRIME_STEP_FACTOR=1.3, Z_HEAT_MAX=18.0,
).with_logspaced_redshifts(10.0, 17.0)
[shard_out] = run_sharded_coeval(inputs, [10.0], mesh=mesh8)
xh_sharded = np.asarray(shard_out.neutral_fraction)
tb_sharded = np.asarray(shard_out.brightness_temp)
ts_sharded = np.asarray(shard_out.spin_temperature)
assert xh_sharded.shape == (16, 16, 16)
assert np.all(np.isfinite(xh_sharded)) and np.all(np.isfinite(tb_sharded))
assert np.all((xh_sharded >= 0) & (xh_sharded <= 1))
assert np.all(ts_sharded > 0)

[cv] = p21.run_coeval(inputs, [10.0])
xh_single = np.asarray(cv.ionized_box.neutral_fraction)
tb_single = np.asarray(cv.brightness_temperature.brightness_temp)
# same physics, independent halo realizations: global means agree loosely
assert abs(xh_sharded.mean() - xh_single.mean()) < 0.15
assert abs(tb_sharded.mean() - tb_single.mean()) < 0.25 * abs(tb_single.mean()) + 10.0
print("SAMPLER-TS-MINI-E2E-OK")
"""


@pytest.mark.slow
def test_sharded_coeval_sampler_ts_mini_end_to_end():
    """The hardest mesh combination end-to-end: CHMF sampler + Lagrangian Ts
    ladder (sharded XraySourceBox) + minihalo feedback grids with per-halo
    Mturn CIC reads and the sharded v_cb realization, vs the single-device
    driver (independent halo RNG partition -> loose global comparison).

    Subprocess-isolated for the same XLA CPU LLVM reason as
    test_sharded_coeval_sampler_end_to_end."""
    import subprocess
    import sys

    env = dict(os.environ)
    prev = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in prev:
        env["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()
    proc = subprocess.run(
        [sys.executable, "-c", _SAMPLER_TS_MINI_E2E_BODY],
        capture_output=True, text=True, timeout=1800, env=env,
        cwd=str(Path(__file__).resolve().parents[1]),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SAMPLER-TS-MINI-E2E-OK" in proc.stdout
