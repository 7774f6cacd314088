"""Reference-parity runner: run configs matched to the reference's golden-data
matrix (produce_integration_test_data.py:47-280) and compare our power spectra
against the stored golds in /root/reference/tests/test_data/power_spectra_*.h5.

Seeds are not bitwise comparable across implementations (GSL vs threefry), so
agreement is asserted statistically: each config runs with several seeds, the
per-bin realization scatter is measured, and the gold (itself one realization)
is compared in units of that scatter plus as a band-averaged amplitude ratio.

Writes tests/parity_data/<config>.json (one file per config) and regenerates
PARITY.md from all result files present.

Usage:
  python scripts/run_parity.py --configs simple,no-mdz --seeds 3
  python scripts/run_parity.py --all --seeds 5
  python scripts/run_parity.py --report-only
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

GOLD_DIR = Path("/root/reference/tests/test_data")
OUT_DIR = REPO / "tests" / "parity_data"

# Matched to reference tests/produce_integration_test_data.py:47-62
DEFAULTS = dict(
    HII_DIM=50,
    DIM=150,
    BOX_LEN=100.0,
    SAMPLER_MIN_MASS=1e9,
    ZPRIME_STEP_FACTOR=1.04,
    SOURCE_MODEL="E-INTEGRAL",
    USE_EXP_FILTER=False,
    CELL_RECOMB=False,
    USE_TS_FLUCT=False,
    USE_UPPER_STELLAR_TURNOVER=False,
)

# Matched to reference OPTIONS_TESTRUNS (produce_integration_test_data.py:84-280).
# Configs needing CLASS transfer functions run with EH here (classy is not in
# this environment) — their density-sector comparison carries a transfer-function
# systematic, noted in PARITY.md.
CONFIGS = {
    "simple": (18, {}),
    "no-mdz": (18, {"SOURCE_MODEL": "CONST-ION-EFF"}),
    "ts": (18, {"USE_TS_FLUCT": True}),
    "ts_nomdz": (18, {"USE_TS_FLUCT": True, "SOURCE_MODEL": "CONST-ION-EFF"}),
    "homo": (
        18,
        {"RECOMB_MODEL": "homogeneous", "CELL_RECOMB": True, "R_BUBBLE_MAX": 50.0},
    ),
    "inhomo": (18, {"RECOMB_MODEL": "inhomogeneous", "R_BUBBLE_MAX": 50.0}),
    "inhomo_ts": (
        18,
        {"RECOMB_MODEL": "inhomogeneous", "USE_TS_FLUCT": True, "R_BUBBLE_MAX": 50.0},
    ),
    "sampler": (18, {"SOURCE_MODEL": "CHMF-SAMPLER"}),
    "sampler_hires": (
        18,
        {"SOURCE_MODEL": "CHMF-SAMPLER", "PERTURB_ON_HIGH_RES": True},
    ),
    "fixed_halogrids": (18, {"SOURCE_MODEL": "L-INTEGRAL"}),
    "sampler_ts": (18, {"SOURCE_MODEL": "CHMF-SAMPLER", "USE_TS_FLUCT": True}),
    "sampler_ir": (
        18,
        {
            "SOURCE_MODEL": "CHMF-SAMPLER",
            "RECOMB_MODEL": "inhomogeneous",
            "R_BUBBLE_MAX": 50.0,
        },
    ),
    "sampler_ts_ir": (
        18,
        {
            "SOURCE_MODEL": "CHMF-SAMPLER",
            "USE_TS_FLUCT": True,
            "RECOMB_MODEL": "inhomogeneous",
            "R_BUBBLE_MAX": 50.0,
        },
    ),
    "sampler_noncubic": (
        18,
        {"SOURCE_MODEL": "CHMF-SAMPLER", "NON_CUBIC_FACTOR": 1.2},
    ),
    "dexm": (18, {"SOURCE_MODEL": "DEXM-ESF"}),
    "photoncons-z": (12, {"PHOTON_CONS_TYPE": "z-photoncons"}),
    "minimize_mem": (
        18,
        {
            "USE_TS_FLUCT": True,
            "RECOMB_MODEL": "inhomogeneous",
            "R_BUBBLE_MAX": 50.0,
            "MINIMIZE_MEMORY": True,
        },
    ),
    "mini": (
        18,
        {
            "USE_MINI_HALOS": True,
            "RECOMB_MODEL": "inhomogeneous",
            "R_BUBBLE_MAX": 50.0,
            "USE_TS_FLUCT": True,
            "M_TURN": 5.0,
            "Z_HEAT_MAX": 25,
            "ZPRIME_STEP_FACTOR": 1.1,
            "V_CB_MODEL": "FLUCTS",
        },
    ),
    "sampler_mini": (
        18,
        {
            "SOURCE_MODEL": "CHMF-SAMPLER",
            "USE_MINI_HALOS": True,
            "USE_TS_FLUCT": True,
            "RECOMB_MODEL": "inhomogeneous",
            "R_BUBBLE_MAX": 50.0,
            "V_CB_MODEL": "FLUCTS",
            "M_TURN": 5.0,
        },
    ),
    "multiple_scattering": (
        18,
        {
            "LYA_MULTIPLE_SCATTERING": True,
            "SOURCE_MODEL": "L-INTEGRAL",
            "USE_TS_FLUCT": True,
        },
    ),
    "mini_gamma_approx": (
        18,
        {
            "USE_MINI_HALOS": True,
            "RECOMB_MODEL": "inhomogeneous",
            "R_BUBBLE_MAX": 50.0,
            "USE_TS_FLUCT": True,
            "M_TURN": 5.0,
            "Z_HEAT_MAX": 25,
            "ZPRIME_STEP_FACTOR": 1.1,
            "INTEGRATION_METHOD_MINI": "GAMMA-APPROX",
            "INTEGRATION_METHOD_ATOMIC": "GAMMA-APPROX",
            # NOTE: the reference config does NOT set V_CB_MODEL — it
            # defaults to "NONE" (vcb = 0 in the LW threshold), see
            # reference inputs.py:827-833 _default_v_cb_model
        },
    ),
    "multiple_scattering_mini": (
        18,
        {
            "LYA_MULTIPLE_SCATTERING": True,
            "SOURCE_MODEL": "L-INTEGRAL",
            "USE_TS_FLUCT": True,
            "USE_MINI_HALOS": True,
            "RECOMB_MODEL": "inhomogeneous",
            "V_CB_MODEL": "FLUCTS",
            "R_BUBBLE_MAX": 50.0,
            "M_TURN": 5.0,
        },
    ),
}

# configs whose reference golds were produced with CLASS transfer functions
# (POWER_SPECTRUM="CLASS"); the gold files SHIP the density transfer table
# (cosmo_tables/transfer_density, produce_integration_test_data.py:525-535),
# which we ingest via register_class_transfer — closing the CLASS-vs-EH
# density systematic without classy.  The vcb transfer is NOT stored, so
# V_CB_MODEL="FLUCTS" still uses our analytic v_cb envelope.
CLASS_CONFIGS = {"mini", "sampler_mini", "mini_gamma_approx", "multiple_scattering_mini"}

# gold dataset name -> how to pull the field out of our Coeval
FIELD_MAP = {
    "brightness_temp": lambda cv: cv.brightness_temperature.brightness_temp,
    "density": lambda cv: cv.perturbed_field.density,
    "velocity_z": lambda cv: cv.perturbed_field.velocity_z,
    "neutral_fraction": lambda cv: cv.ionized_box.neutral_fraction,
    "z_reion": lambda cv: cv.ionized_box.z_reion,
    "ionisation_rate_G12": lambda cv: cv.ionized_box.ionisation_rate_G12,
    "lowres_density": lambda cv: cv.initial_conditions.lowres_density,
    "lowres_vx": lambda cv: cv.initial_conditions.vx,
    "lowres_vx_2LPT": lambda cv: cv.initial_conditions.vx_2LPT,
    "spin_temperature": lambda cv: cv.spin_temp.spin_temperature if cv.spin_temp else None,
    "xray_ionised_fraction": lambda cv: (
        cv.spin_temp.xray_ionised_fraction if cv.spin_temp else None
    ),
    "kinetic_temp_neutral": lambda cv: (
        cv.spin_temp.kinetic_temp_neutral if cv.spin_temp else None
    ),
    "J_21_LW": lambda cv: cv.spin_temp.J_21_LW if cv.spin_temp else None,
    "cumulative_recombinations": lambda cv: cv.ionized_box.cumulative_recombinations,
}

SEEDS = [101, 202, 303, 404, 505, 606, 707, 808, 909, 1010]


def _register_gold_class_transfer(name: str):
    """Load the CLASS density transfer stored inside the gold file and
    register it for POWER_SPECTRUM='CLASS' (see CLASS_CONFIGS)."""
    import h5py

    import py21cmfast_tpu as p21

    path = GOLD_DIR / f"power_spectra_{name}.h5"
    with h5py.File(path, "r") as f:
        g = f["cosmo_tables"]["transfer_density"]
        k = g["x_values"][:]
        t = g["y_values"][:]
    sel = k > 0  # the stored table includes a k=0 sample
    p21.register_class_transfer(k[sel], t[sel])


def build_inputs(name: str, seed: int, lc: bool = False):
    import py21cmfast_tpu as p21

    z, overrides = CONFIGS[name]
    kwargs = {**DEFAULTS, **overrides}
    if name in CLASS_CONFIGS and (GOLD_DIR / f"power_spectra_{name}.h5").exists():
        _register_gold_class_transfer(name)
        kwargs["POWER_SPECTRUM"] = "CLASS"
    inputs = p21.InputParameters(random_seed=seed).evolve_input_structs(**kwargs)
    needs_ladder = lc or kwargs.get("USE_TS_FLUCT", False) or (
        str(kwargs.get("RECOMB_MODEL", "none")).lower() != "none"
    )
    if needs_ladder:
        # reference get_node_z (produce_integration_test_data.py:291-325):
        # max = Z_HEAT_MAX when ts/recombs are on, else redshift+2 (lc only)
        if kwargs.get("USE_TS_FLUCT", False) or (
            str(kwargs.get("RECOMB_MODEL", "none")).lower() != "none"
        ):
            inputs = inputs.with_logspaced_redshifts(float(z))
        else:
            inputs = inputs.with_logspaced_redshifts(float(z), float(z) + 2.0)
    return float(z), inputs


def run_one(name: str, seed: int):
    from py21cmfast_tpu.drivers.coeval import run_coeval
    from py21cmfast_tpu.ops.ps import reference_binned_power

    z, inputs = build_inputs(name, seed)
    t0 = time.time()
    [cv] = run_coeval(inputs, [z])
    dt = time.time() - t0

    # The reference gold spectra are computed with powerbox's SCALAR
    # boxlength=BOX_LEN even for NON_CUBIC boxes
    # (produce_integration_test_data.py:367-369) — i.e., the z axis is
    # treated as BOX_LEN long regardless of NON_CUBIC_FACTOR.  Mimic that
    # convention so noncubic configs compare apples-to-apples.
    L = inputs.simulation_options.BOX_LEN
    box_lens = (L, L, L)
    spectra = {}
    means = {}
    for field, getter in FIELD_MAP.items():
        try:
            arr = getter(cv)
        except (AttributeError, TypeError):
            arr = None
        if arr is None:
            continue
        arr = np.asarray(arr, dtype=np.float64)
        if arr.ndim != 3:
            continue
        k, p, _ = reference_binned_power(arr, box_lens)
        spectra[field] = p
        means[field] = float(arr.mean())
        spectra.setdefault("_k", k)
    return spectra, means, dt


LC_FIELDS = [  # reference LIGHTCONE_FIELDS (produce_integration_test_data.py:64-77)
    "density", "velocity_z", "spin_temperature", "xray_ionised_fraction",
    "J_21_LW", "kinetic_temp_neutral", "ionisation_rate_G12",
    "cumulative_recombinations", "neutral_fraction", "z_reion",
    "brightness_temp",
]


def _lc_quantities(name: str):
    """get_lc_fields (produce_integration_test_data.py:375-392)."""
    _, overrides = CONFIGS[name]
    kwargs = {**DEFAULTS, **overrides}
    q = LC_FIELDS[:]
    if not kwargs.get("USE_TS_FLUCT", False):
        for f in ("spin_temperature", "xray_ionised_fraction", "kinetic_temp_neutral"):
            q.remove(f)
    if not kwargs.get("USE_MINI_HALOS", False):
        q.remove("J_21_LW")
    if str(kwargs.get("RECOMB_MODEL", "none")).upper() != "INHOMOGENEOUS":
        # the reference keeps this for HOMOGENEOUS too; our homogeneous model
        # does not populate per-cell cumulative recombinations yet (ROADMAP)
        q.remove("cumulative_recombinations")
    return q


def run_one_lightcone(name: str, seed: int, gold_lc=None):
    """Run the config as a lightcone (reference produce_lc_power_spectra,
    produce_integration_test_data.py:395-427): RectilinearLightconer between
    node_min+0.2 and node_max-0.2 at cell resolution, include_dvdr default on,
    apply_rsds off (reference generate_lightcone defaults, lightcone.py:615-616).
    Returns (spectra dict incl '_k', global histories dict, wall seconds)."""
    from py21cmfast_tpu.drivers.lightcone import run_lightcone
    from py21cmfast_tpu.lightconers import RectilinearLightconer
    from py21cmfast_tpu.ops.ps import reference_binned_power

    z, inputs = build_inputs(name, seed, lc=True)
    so = inputs.simulation_options
    node_z = np.asarray(inputs.node_redshifts)
    res = so.BOX_LEN / so.HII_DIM
    lcn = RectilinearLightconer.with_equal_cdist_slices(
        min_redshift=float(node_z.min()) + 0.2,
        max_redshift=float(node_z.max()) - 0.2,
        inputs=inputs,
        quantities=tuple(_lc_quantities(name)),
        resolution=res,
    )
    t0 = time.time()
    lc = run_lightcone(
        inputs, lightconer=lcn,
        global_quantities=("brightness_temp", "neutral_fraction"),
        include_dvdr_in_tau21=True, apply_rsds=False,
    )
    dt = time.time() - t0

    n_slices = lcn.n_slices
    box_lens = (so.BOX_LEN, so.BOX_LEN, n_slices * res)
    # force the gold's bin count: slice counts can differ by ±1 from the
    # reference (its lightconer uses astropy Planck18 distances; astropy is
    # not in this image), which would otherwise flip the auto bin count
    bins = len(gold_lc["_k"]) if gold_lc and "_k" in gold_lc else None
    spectra = {}
    for field, arr in lc.lightcones.items():
        if field == "tau_21":
            continue
        k, p, _ = reference_binned_power(
            np.asarray(arr, dtype=np.float64), box_lens, bins=bins
        )
        spectra[field] = p
        spectra.setdefault("_k", k)
    globals_ = {
        "global_" + q: np.asarray(v, dtype=np.float64)
        for q, v in lc.global_quantities.items()
    }
    return spectra, globals_, dt


def run_config_lightcone(name: str, seeds, verbose=True):
    gold = load_gold(name, group="lightcone")
    runs, glob_runs, times = {}, {}, []
    for seed in seeds:
        if verbose:
            print(f"[{name}:lc] seed {seed} ...", flush=True)
        spectra, globals_, dt = run_one_lightcone(name, seed, gold_lc=gold)
        times.append(dt)
        for field, p in spectra.items():
            runs.setdefault(field, []).append(np.asarray(p))
        for field, v in globals_.items():
            glob_runs.setdefault(field, []).append(np.asarray(v))
        if verbose:
            print(f"[{name}:lc] seed {seed} done in {dt:.1f}s", flush=True)

    k = runs.pop("_k")[0]
    result = {
        "config": name,
        "kind": "lightcone",
        "redshift": CONFIGS[name][0],
        "n_seeds": len(seeds),
        "seeds": list(seeds),
        "k": k.tolist(),
        "times_s": [round(t, 2) for t in times],
        "fields": {},
        "globals": {},
    }
    for field, stack in runs.items():
        stack = np.stack(stack)
        entry = {
            "mean": stack.mean(axis=0).tolist(),
            "std": stack.std(axis=0, ddof=1).tolist() if len(seeds) > 1 else None,
            "runs": stack.tolist(),
        }
        if gold is not None and field in gold:
            entry["gold"] = np.asarray(gold[field]).tolist()
        result["fields"][field] = entry
    for field, stack in glob_runs.items():
        stack = np.stack(stack)
        entry = {
            "mean": stack.mean(axis=0).tolist(),
            "std": stack.std(axis=0, ddof=1).tolist() if len(seeds) > 1 else None,
        }
        if gold is not None and field in gold:
            entry["gold"] = np.asarray(gold[field]).tolist()
        result["globals"][field] = entry
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    with open(OUT_DIR / f"{name}.lc.json", "w") as f:
        json.dump(result, f)
    return result


# Matched to reference OPTIONS_PT (produce_integration_test_data.py:281-286):
# perturbed-field-only golds at z=10 — PS + PDF of density and velocity_z,
# isolated from all astrophysics (produce_perturb_field_data:429-470).
OPTIONS_PT = {
    "simple": (10.0, {}),
    "no2lpt": (10.0, {"PERTURB_ALGORITHM": "ZELDOVICH"}),
    "linear": (10.0, {"PERTURB_ALGORITHM": "LINEAR"}),
    "highres": (10.0, {"PERTURB_ON_HIGH_RES": True}),
}
_PT_VEL_NORM = 1e16  # reference velocity_normalisation (:433)


def run_one_perturb(name: str, seed: int):
    import py21cmfast_tpu as p21
    from py21cmfast_tpu.ops.ps import reference_binned_power

    z, overrides = OPTIONS_PT[name]
    inputs = p21.InputParameters(random_seed=seed).evolve_input_structs(
        HII_DIM=50, DIM=150, BOX_LEN=100.0, **overrides
    )
    t0 = time.time()
    ics = p21.compute_initial_conditions(inputs)
    pf = p21.perturb_field(z, inputs, ics)
    dt = time.time() - t0
    L = inputs.simulation_options.BOX_LEN
    dens = np.asarray(pf.density, np.float64)
    vel = np.asarray(pf.velocity_z, np.float64) * _PT_VEL_NORM
    k_d, p_d, _ = reference_binned_power(dens, (L, L, L))
    k_v, p_v, _ = reference_binned_power(vel, (L, L, L))

    def hist(data, xmin, xmax, nbins=50):
        y, edges = np.histogram(
            data, bins=np.linspace(xmin, xmax, nbins), range=[xmin, xmax],
            density=True,
        )
        return np.array([y, y]).T.flatten()  # doubled layout as the gold

    return {
        "k_dens": k_d, "power_dens": p_d, "k_vel": k_v, "power_vel": p_v,
        "pdf_dens": hist(dens, -0.8, 2.0), "pdf_vel": hist(vel, -2.0, 2.0),
    }, dt


def load_gold_perturb(name: str):
    import h5py

    path = GOLD_DIR / f"perturb_field_data_{name}.h5"
    if not path.exists():
        return None
    with h5py.File(path, "r") as f:
        return {k: f[k][:] for k in f if isinstance(f[k], h5py.Dataset)}


def run_config_perturb(name: str, seeds, verbose=True):
    gold = load_gold_perturb(name)
    runs: dict[str, list] = {}
    times = []
    for seed in seeds:
        out, dt = run_one_perturb(name, seed)
        times.append(dt)
        for k, v in out.items():
            runs.setdefault(k, []).append(np.asarray(v))
        if verbose:
            print(f"[{name}:pt] seed {seed} done in {dt:.1f}s", flush=True)
    result = {
        "config": name,
        "kind": "perturb",
        "n_seeds": len(seeds),
        "seeds": list(seeds),
        "times_s": [round(t, 2) for t in times],
        "fields": {},
    }
    for k, stack in runs.items():
        if k.startswith("k_"):
            result[k] = stack[0].tolist()
            continue
        stack = np.stack(stack)
        entry = {
            "mean": stack.mean(axis=0).tolist(),
            "std": stack.std(axis=0, ddof=1).tolist() if len(seeds) > 1 else None,
            "runs": stack.tolist(),
        }
        if gold is not None and k in gold:
            entry["gold"] = np.asarray(gold[k]).tolist()
        result["fields"][k] = entry
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    with open(OUT_DIR / f"{name}.pt.json", "w") as f:
        json.dump(result, f)
    return result


def load_gold(name: str, group: str = "coeval"):
    import h5py

    path = GOLD_DIR / f"power_spectra_{name}.h5"
    if not path.exists():
        return None
    out = {}
    with h5py.File(path, "r") as f:
        if group not in f:
            return None
        g = f[group]
        for key in g:
            if key == "k":
                out["_k"] = g[key][:]
            elif key.startswith("power_"):
                out[key[len("power_") :]] = g[key][:]
            elif key.startswith("global_"):
                out[key] = g[key][:]
    return out


def run_config(name: str, seeds, verbose=True):
    gold = load_gold(name)
    runs = {}
    mean_runs = {}
    times = []
    for seed in seeds:
        if verbose:
            print(f"[{name}] seed {seed} ...", flush=True)
        spectra, means, dt = run_one(name, seed)
        times.append(dt)
        for field, p in spectra.items():
            runs.setdefault(field, []).append(np.asarray(p))
        for field, m in means.items():
            mean_runs.setdefault(field, []).append(m)
        if verbose:
            print(f"[{name}] seed {seed} done in {dt:.1f}s", flush=True)

    k = runs.pop("_k")[0]
    result = {
        "config": name,
        "redshift": CONFIGS[name][0],
        "n_seeds": len(seeds),
        "seeds": list(seeds),
        "k": k.tolist(),
        "times_s": [round(t, 2) for t in times],
        "fields": {},
    }
    for field, stack in runs.items():
        stack = np.stack(stack)
        entry = {
            "mean": stack.mean(axis=0).tolist(),
            "std": stack.std(axis=0, ddof=1).tolist() if len(seeds) > 1 else None,
            "runs": stack.tolist(),
        }
        if gold is not None and field in gold:
            entry["gold"] = np.asarray(gold[field]).tolist()
        if field in mean_runs:
            entry["field_mean"] = mean_runs[field]
        result["fields"][field] = entry
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    with open(OUT_DIR / f"{name}.json", "w") as f:
        json.dump(result, f)
    return result


def band_stats(k, gold, mean, std, runs=None, k_lo=0.3, k_hi=1.2):
    """Summary statistics over the statistically-useful band.

    `band_z` is the primary gate: the gold's geometric-mean band power placed
    within OUR per-seed distribution (in log).  |band_z| <~ 3 means the gold is
    indistinguishable from one of our own realizations — the right criterion
    for fields whose power is exponentially sensitive to the realization
    (e.g. neutral_fraction at xH ~ 1)."""
    k = np.asarray(k)
    gold = np.asarray(gold)
    mean = np.asarray(mean)
    sel = (k >= k_lo) & (k <= k_hi) & (mean > 0) & (gold > 0)
    if sel.sum() < 3:
        return None
    ratio = gold[sel] / mean[sel]
    out = {
        "band_ratio": float(np.exp(np.mean(np.log(ratio)))),
        "max_dev_pct": float(np.max(np.abs(ratio - 1)) * 100),
    }
    if std is not None:
        std = np.asarray(std)
        sigma = np.maximum(std[sel], 1e-30)
        pulls = (gold[sel] - mean[sel]) / sigma
        out["max_pull"] = float(np.max(np.abs(pulls)))
    if runs is not None and len(runs) > 2:
        stack = np.asarray(runs)[:, sel]
        ok = np.all(stack > 0, axis=0)
        if ok.sum() >= 3:
            logs = np.mean(np.log(stack[:, ok]), axis=1)  # per-seed band log-power
            gb = np.mean(np.log(gold[sel][ok]))
            sd = np.std(logs, ddof=1)
            if sd > 0:
                out["band_z"] = float((gb - logs.mean()) / sd)
    return out


def write_report():
    lines = [
        "# PARITY — power-spectrum comparison against the reference golds",
        "",
        "Configs matched to `/root/reference/tests/produce_integration_test_data.py`",
        "(HII_DIM=50, DIM=150, BOX_LEN=100, z=18 except photoncons-z at z=12).",
        "Seeds are not bitwise comparable across implementations, so each config",
        "runs with several seeds here; `ratio` is the geometric-mean gold/ours power",
        "ratio over k ∈ [0.3, 1.2] Mpc⁻¹ (1.00 = perfect amplitude parity),",
        "`maxdev` the worst single-bin deviation in that band, and `pull` the worst",
        "deviation in units of the measured per-bin realization scatter (the gold",
        "is itself a single realization, so |pull| ≲ 3 is statistical agreement).",
        "Configs whose gold used CLASS transfer functions (mini/sampler_mini) run",
        "with EH here — their density sector carries a known transfer systematic.",
        "",
        "Known gaps (gated with regression ratchets in tests/test_reference_parity.py):",
        "CLASS-gold configs (mini family) ingest the density transfer table stored",
        "in the gold file itself via register_class_transfer; the v_cb transfer is",
        "not stored, so V_CB_MODEL=FLUCTS keeps our analytic envelope.",
        "photoncons-z: root-caused (scripts/photoncons_repro.py) — the reference's",
        "analytic Q(z) carries (1) a deterministic Euler da-weighting bias",
        "(photoncons.c:205-228, +15-25%), reproduced faithfully by",
        "models/photoncons.euler_q, and (2) dsigma^2/dM cancellation noise",
        "(filtering.c:62 under GSL QAG GAUSS61, +22-27% at M>~1e9), emulated",
        "since round 4 by models/photoncons._noisy_sigma_table (the same",
        "unstable integrand under scipy's Gauss-Kronrod; photoncons-only).",
        "Lightcone global-xH max dev 0.021 -> 0.0116; the remainder is GSL's",
        "GK61 vs QUADPACK's GK21 noise realization of the same cancellation",
        "(unreproducible without GSL), covered by a tight ratchet.",
        "",
        "`band_z` places the gold's band power inside our per-seed distribution",
        "(in log): |band_z| <~ 3 is indistinguishable from one of our own seeds.",
        "",
        "| config | field | ratio | maxdev % | max pull | band_z | n seeds |",
        "|---|---|---|---|---|---|---|",
    ]
    report_fields = [
        "brightness_temp",
        "density",
        "neutral_fraction",
        "spin_temperature",
        "lowres_density",
        "velocity_z",
    ]
    for path in sorted(OUT_DIR.glob("*.json")):
        if (
            path.name.endswith(".lc.json")
            or path.name.endswith(".pt.json")
            or path.stem == "photoncons_repro"
        ):
            continue
        with open(path) as f:
            res = json.load(f)
        for field in report_fields:
            entry = res["fields"].get(field)
            if entry is None or "gold" not in entry:
                continue
            st = band_stats(
                res["k"], entry["gold"], entry["mean"], entry.get("std"),
                runs=entry.get("runs"),
            )
            if st is None:
                continue
            pull = f"{st['max_pull']:.1f}" if "max_pull" in st else "—"
            bz = f"{st['band_z']:+.1f}" if "band_z" in st else "—"
            lines.append(
                f"| {res['config']} | {field} | {st['band_ratio']:.3f} | "
                f"{st['max_dev_pct']:.1f} | {pull} | {bz} | {res['n_seeds']} |"
            )

    # ---- lightcone section: global histories + lightcone power spectra ----
    lc_paths = sorted(OUT_DIR.glob("*.lc.json"))
    if lc_paths:
        lines += [
            "",
            "## Lightcone parity (reference `lightcone/` gold group)",
            "",
            "Global histories (x̄_HI(z), T̄b(z) over the node ladder) are the",
            "seed-robust signal: `xH dev` / `Tb dev` are the worst per-node",
            "deviations of our seed-mean history vs the gold (absolute for xH,",
            "mK for Tb).  Lightcone PS gated like the coeval section.",
            "",
            "| config | global xH dev | global Tb dev [mK] | Tb-PS ratio | Tb-PS band_z | xH-PS band_z | n seeds |",
            "|---|---|---|---|---|---|---|",
        ]
        for path in lc_paths:
            with open(path) as f:
                res = json.load(f)
            gx = res["globals"].get("global_neutral_fraction", {})
            gt = res["globals"].get("global_brightness_temp", {})
            xh_dev = tb_dev = None
            if "gold" in gx:
                xh_dev = float(np.max(np.abs(
                    np.asarray(gx["mean"]) - np.asarray(gx["gold"])
                )))
            if "gold" in gt:
                tb_dev = float(np.max(np.abs(
                    np.asarray(gt["mean"]) - np.asarray(gt["gold"])
                )))
            tb_entry = res["fields"].get("brightness_temp", {})
            xh_entry = res["fields"].get("neutral_fraction", {})
            st_tb = band_stats(
                res["k"], tb_entry.get("gold"), tb_entry.get("mean"),
                tb_entry.get("std"), runs=tb_entry.get("runs"),
            ) if "gold" in tb_entry else None
            st_xh = band_stats(
                res["k"], xh_entry.get("gold"), xh_entry.get("mean"),
                xh_entry.get("std"), runs=xh_entry.get("runs"),
            ) if "gold" in xh_entry else None
            fmt = lambda v, f="{:.4f}": f.format(v) if v is not None else "—"
            lines.append(
                f"| {res['config']} | {fmt(xh_dev)} | {fmt(tb_dev, '{:.2f}')} | "
                f"{fmt(st_tb['band_ratio'] if st_tb else None, '{:.3f}')} | "
                f"{fmt(st_tb.get('band_z') if st_tb else None, '{:+.1f}')} | "
                f"{fmt(st_xh.get('band_z') if st_xh else None, '{:+.1f}')} | "
                f"{res['n_seeds']} |"
            )
    # ---- perturbed-field golds (z=10, matter sector only) ----
    pt_paths = sorted(OUT_DIR.glob("*.pt.json"))
    if pt_paths:
        lines += [
            "",
            "## Perturbed-field parity (reference `perturb_field_data_*.h5` golds)",
            "",
            "Matter-sector-only check at z=10 (LINEAR/ZA/2LPT/hires paths,",
            "no astrophysics): density and velocity_z power-spectrum band",
            "stats as above, plus the worst PDF bin deviation (density units).",
            "",
            "| config | field | ratio | band_z | pdf max dev | n seeds |",
            "|---|---|---|---|---|---|",
        ]
        for path in pt_paths:
            with open(path) as f:
                res = json.load(f)
            for field, kkey, pdfkey in (
                ("density", "k_dens", "pdf_dens"),
                ("velocity_z", "k_vel", "pdf_vel"),
            ):
                ps = res["fields"].get(f"power_{'dens' if field == 'density' else 'vel'}")
                if ps is None or "gold" not in ps:
                    continue
                st = band_stats(
                    res[kkey], ps["gold"], ps["mean"], ps.get("std"),
                    runs=ps.get("runs"),
                )
                pdf = res["fields"].get(pdfkey, {})
                pdf_dev = None
                if "gold" in pdf:
                    pdf_dev = float(np.max(np.abs(
                        np.asarray(pdf["mean"]) - np.asarray(pdf["gold"])
                    )))
                bz = f"{st['band_z']:+.1f}" if st and "band_z" in st else "—"
                rt = f"{st['band_ratio']:.3f}" if st else "—"
                pd = f"{pdf_dev:.3f}" if pdf_dev is not None else "—"
                lines.append(
                    f"| {res['config']} | {field} | {rt} | {bz} | {pd} | "
                    f"{res['n_seeds']} |"
                )
    lines.append("")
    (REPO / "PARITY.md").write_text("\n".join(lines))
    print(f"wrote PARITY.md ({len(lines)} lines)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--lightcone", action="store_true",
                    help="run the lightcone parity harness instead of coeval")
    ap.add_argument("--perturb", action="store_true",
                    help="run the perturbed-field gold harness instead of coeval")
    ap.add_argument("--report-only", action="store_true")
    args = ap.parse_args()

    if not args.report_only and args.perturb:
        names = list(OPTIONS_PT) if args.all else [
            c for c in args.configs.split(",") if c
        ]
        for name in names:
            run_config_perturb(name, SEEDS[: args.seeds])
        write_report()
        return

    if not args.report_only:
        names = list(CONFIGS) if args.all else [c for c in args.configs.split(",") if c]
        for name in names:
            t0 = time.time()
            if args.lightcone:
                res = run_config_lightcone(name, SEEDS[: args.seeds])
                gx = res["globals"].get("global_neutral_fraction", {})
                if "gold" in gx:
                    dev = np.max(np.abs(np.asarray(gx["mean"]) - np.asarray(gx["gold"])))
                    print(f"[{name}:lc] global xH max dev {dev:.4f} "
                          f"({time.time()-t0:.0f}s total)")
                continue
            res = run_config(name, SEEDS[: args.seeds])
            tb = res["fields"].get("brightness_temp", {})
            if "gold" in tb:
                st = band_stats(res["k"], tb["gold"], tb["mean"], tb.get("std"))
                print(f"[{name}] Tb band ratio {st['band_ratio']:.3f} "
                      f"maxdev {st['max_dev_pct']:.1f}% ({time.time()-t0:.0f}s total)")
    write_report()


if __name__ == "__main__":
    main()
