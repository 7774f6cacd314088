"""Golden-data regression tests: delta-Tb power spectra vs stored results.

Mirror of reference tests/test_integration_features.py:1-120 — each named
option set's brightness-temperature power spectrum must match the stored gold
to tight relative tolerance (identical code + seeds => identical results up to
compiler reordering; tolerance matches the reference's rel_tol philosophy).

Regenerate golds with `python tests/produce_golden_data.py` after *intentional*
physics changes, and inspect the printed diffs.
"""

from pathlib import Path

import numpy as np
import pytest

GOLDEN_DIR = Path(__file__).parent / "golden_data"

import produce_golden_data as pgd  # noqa: E402  (same directory)

CONFIGS = list(pgd.CONFIGS)


@pytest.mark.parametrize("name", CONFIGS)
def test_golden_power_spectrum(name):
    path = GOLDEN_DIR / f"{name}.npz"
    if not path.exists():
        pytest.skip(f"golden data for {name} not generated")
    gold = np.load(path)
    got = pgd.run_config(name, pgd.CONFIGS[name])

    np.testing.assert_allclose(
        got["global_xh"], gold["global_xh"], atol=5e-3,
        err_msg=f"{name}: global xH drifted",
    )
    np.testing.assert_allclose(
        got["mean_tb"], gold["mean_tb"], rtol=5e-3, atol=0.05,
        err_msg=f"{name}: mean Tb drifted",
    )
    g, p = np.asarray(gold["power"]), np.asarray(got["power"])
    good = np.isfinite(g) & (g > 0)
    np.testing.assert_allclose(
        p[good], g[good], rtol=1e-2,
        err_msg=f"{name}: power spectrum drifted",
    )
