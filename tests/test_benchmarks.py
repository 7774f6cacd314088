"""Benchmark-as-pytest regression gate.

Mirrors the reference's perf CI (Bencher + pytest-benchmark,
.github/workflows/base_benchmarks.yml:36-52) without external services: each
benchmark times a steady-state kernel call (after a compile warmup) on the
virtual CPU backend and compares against the committed baseline in
``tests/bench_baseline.json``.

The gate is deliberately loose (default 3x) — CPU wall-clock in CI containers
is noisy and the real perf numbers come from ``bench.py`` on TPU hardware —
but it catches order-of-magnitude regressions (accidental recompiles per call,
host loops on the device path, dtype blowups) the moment they land.

Regenerate the baseline after an intentional perf change with:
    UPDATE_BENCH_BASELINE=1 python -m pytest tests/test_benchmarks.py -q
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np
import pytest

BASELINE_PATH = Path(__file__).parent / "bench_baseline.json"
REGRESSION_FACTOR = 3.0
# Sub-100ms kernels flake on container scheduler noise alone, but a flat
# floor would let a 20 ms kernel regress 25x (exactly the per-call-recompile
# failure mode this gate exists for).  Instead the limit scales as
# baseline * factor + a fixed noise allowance, so small kernels keep a
# meaningful gate while absorbing scheduler jitter.
NOISE_ALLOWANCE_S = 0.2
UPDATE = bool(os.environ.get("UPDATE_BENCH_BASELINE"))

_results: dict[str, float] = {}


def _time_steady(fn, n=3):
    """Call fn once (warmup/compile), then return the best of n timed calls."""
    fn()
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _check(name: str, seconds: float):
    _results[name] = seconds
    if UPDATE:
        baseline = json.loads(BASELINE_PATH.read_text()) if BASELINE_PATH.exists() else {}
        baseline[name] = round(seconds, 4)
        BASELINE_PATH.write_text(json.dumps(baseline, indent=1, sort_keys=True))
        return
    if not BASELINE_PATH.exists():
        pytest.skip("no committed bench baseline")
    baseline = json.loads(BASELINE_PATH.read_text())
    if name not in baseline:
        pytest.skip(f"no baseline entry for {name}")
    limit = baseline[name] * REGRESSION_FACTOR + NOISE_ALLOWANCE_S
    assert seconds <= limit, (
        f"perf regression: {name} took {seconds:.3f}s vs baseline "
        f"{baseline[name]:.3f}s (limit {limit:.3f}s)"
    )


@pytest.fixture(scope="module")
def tiny_inputs():
    import py21cmfast_tpu as p21

    return p21.InputParameters(random_seed=9).evolve_input_structs(
        HII_DIM=16, DIM=32, BOX_LEN=32.0, ZPRIME_STEP_FACTOR=1.2,
    )


def test_bench_ics(tiny_inputs):
    from py21cmfast_tpu.models.ics import compute_initial_conditions

    def run():
        ics = compute_initial_conditions(tiny_inputs)
        np.asarray(ics.lowres_density)

    _check("ics_32", _time_steady(run))


def test_bench_perturb(tiny_inputs):
    from py21cmfast_tpu.models.ics import compute_initial_conditions
    from py21cmfast_tpu.models.perturb import perturb_field

    ics = compute_initial_conditions(tiny_inputs)

    def run():
        pf = perturb_field(8.0, tiny_inputs, ics)
        np.asarray(pf.density)

    _check("perturb_32", _time_steady(run))


def test_bench_ionize_scan(tiny_inputs):
    from py21cmfast_tpu.models.ics import compute_initial_conditions
    from py21cmfast_tpu.models.ionization import compute_ionization_field
    from py21cmfast_tpu.models.perturb import perturb_field

    ics = compute_initial_conditions(tiny_inputs)
    pf = perturb_field(8.0, tiny_inputs, ics)

    def run():
        ib = compute_ionization_field(8.0, tiny_inputs, pf)
        np.asarray(ib.neutral_fraction)

    _check("ionize_16", _time_steady(run))


def test_bench_nion_table_build(tiny_inputs):
    """Host-side table generation must stay off the critical path (~ms)."""
    from py21cmfast_tpu.models import hmf
    from py21cmfast_tpu.models.ionization import (
        _build_nion_tables, _get_sigma_table, setup_radii,
    )

    sigma_table = _get_sigma_table(tiny_inputs)
    cosmo = tiny_inputs.cosmology
    m_min = hmf.minimum_source_mass(8.0, tiny_inputs)
    ladder = setup_radii(tiny_inputs, m_min)
    growth = float(cosmo.dicke(8.0))
    sc = hmf.set_scaling_constants(8.0, tiny_inputs)

    def run():
        _build_nion_tables(tiny_inputs, ladder, sigma_table, growth, m_min, sc)

    _check("nion_tables", _time_steady(run))


def test_report():
    """Print the collected timings (visible with -s / in CI logs)."""
    for name, sec in sorted(_results.items()):
        print(f"bench {name}: {sec * 1e3:.1f} ms")
