import numpy as np
import sys, types, argparse

def test_dev_feature_plots(tmp_path, monkeypatch):
    import py21cmfast_tpu.cli as cli
    import py21cmfast_tpu.drivers.lightcone as lcmod
    import py21cmfast_tpu as p21

    rng = np.random.default_rng(0)
    def fake_run_lightcone(inputs, **kw):
        n = inputs.simulation_options.HII_DIM
        nsl = 12
        zs = np.linspace(11, 9, 5)
        lcs = {"brightness_temp": rng.normal(-20, 5, (n, n, nsl)).astype(np.float32)}
        class FakeLC:
            lightcones = lcs
            global_quantities = {
                "neutral_fraction": np.linspace(1, 0.8, 5),
                "brightness_temp": np.linspace(-5, -20, 5),
            }
            node_redshifts = zs
            brightness_temp = lcs["brightness_temp"]
            lc_redshifts = np.linspace(9, 11, nsl)
            inputs_ = inputs
        return FakeLC()

    monkeypatch.setattr(lcmod, "run_lightcone", fake_run_lightcone)
    cli.main([
        "dev", "feature", "--template", "size-tiny",
        "--param", "HII_EFF_FACTOR=25", "--min-z", "9", "--max-z", "11",
        "--outdir", str(tmp_path),
    ])
    out = sorted(p.name for p in tmp_path.iterdir())
    assert "pr_feature_lightcone_2d_brightness_temp.pdf" in out
    assert "pr_feature_history.pdf" in out
    assert "pr_feature_power_history.pdf" in out
