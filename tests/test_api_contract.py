"""Import-contract test: every name in the reference `py21cmfast.__all__`
(reference __init__.py:14-70) must be importable from py21cmfast_tpu.

classy-backed callables (`run_classy`) import fine but need the optional
classy package to *run*; that's the documented exception."""

import ast
from pathlib import Path

import pytest

REF_INIT = Path("/root/reference/src/py21cmfast/__init__.py")


def _reference_all():
    if not REF_INIT.exists():
        pytest.skip("reference tree not mounted")
    tree = ast.parse(REF_INIT.read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and getattr(node.targets[0], "id", "") == "__all__":
            return [ast.literal_eval(e) for e in node.value.elts]
    raise AssertionError("no __all__ in reference __init__")


def test_reference_all_importable():
    import py21cmfast_tpu as p21

    missing = [n for n in _reference_all() if not hasattr(p21, n)]
    assert not missing, f"reference __all__ names missing: {missing}"


def test_own_all_resolves():
    import py21cmfast_tpu as p21

    missing = [n for n in p21.__all__ if not hasattr(p21, n)]
    assert not missing


def test_wrapper_shim_submodules():
    from py21cmfast_tpu.wrapper import cfuncs, inputs, outputs  # noqa: F401
    from py21cmfast_tpu.wrapper.inputs import CosmoParams  # noqa: F401


def test_get_logspaced_redshifts():
    import numpy as np

    from py21cmfast_tpu import get_logspaced_redshifts

    zs = get_logspaced_redshifts(5.0, 1.05, 20.0)
    arr = np.asarray(zs)
    assert arr[0] > arr[-1]  # descending
    assert arr[-1] == 5.0
    ratios = (1 + arr[:-1]) / (1 + arr[1:])
    assert np.allclose(ratios, 1.05, rtol=1e-10)


def test_write_template_roundtrip(tmp_path):
    import py21cmfast_tpu as p21

    inputs = p21.InputParameters(random_seed=7).evolve_input_structs(
        HII_DIM=20, DIM=40, BOX_LEN=30.0
    )
    path = tmp_path / "tmpl.toml"
    p21.write_template(inputs, path)
    from py21cmfast_tpu.input_serialization import read_inputs_from_toml

    back = read_inputs_from_toml(path)
    assert back.simulation_options.HII_DIM == 20
    assert back.random_seed == 7


def test_run_classy_raises_without_classy():
    import py21cmfast_tpu as p21

    try:
        import classy  # noqa: F401

        pytest.skip("classy installed; run_classy is live")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="register_class_transfer"):
        p21.run_classy()


def test_compute_rms_fallback_matches_sigma8():
    import numpy as np

    import py21cmfast_tpu as p21

    h = 0.6766
    rms = p21.compute_rms(kind="d_m", redshifts=0.0, smoothing_radius=8.0 / h)
    assert np.allclose(rms, 0.8102, rtol=2e-2)


def test_find_zdec_near_planck():
    from py21cmfast_tpu.cosmology.classy_interface import (
        find_redshift_kinematic_decoupling,
    )

    z_dec = find_redshift_kinematic_decoupling()
    assert 1000 < z_dec < 1150  # reference quotes ~1070 for Planck18


def test_import_does_not_initialize_jax_backend():
    """Importing the package must not touch the XLA backend: users (and our
    own multihost path) must be able to call jax.distributed.initialize()
    after `import py21cmfast_tpu`.  A module-level jnp constant (e.g. a jnp
    default argument, evaluated at def time) silently breaks this."""
    import subprocess
    import sys
    import os

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from jax._src import xla_bridge\n"
        "import py21cmfast_tpu\n"
        "assert not xla_bridge._backends, list(xla_bridge._backends)\n"
        "print('IMPORT_CLEAN')\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=180, env=env,
    )
    assert "IMPORT_CLEAN" in out.stdout, (out.stderr or out.stdout)[-500:]
