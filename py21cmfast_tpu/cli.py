"""Command-line interface.

Equivalent of reference cli.py:1-1030 (cyclopts app `21cmfast`), built on
argparse (cyclopts is not in the runtime image).  Subcommands mirror the
reference: template avail/show, run coeval/lightcone/global, predict sizes.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _build_inputs(args):
    from ._templates import create_params_from_template
    from .inputs import InputParameters

    overrides = {}
    for kv in args.param or []:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        overrides[k] = v
    if args.template:
        return create_params_from_template(
            args.template, random_seed=args.seed, **overrides
        )
    return InputParameters(random_seed=args.seed).evolve_input_structs(**overrides)


def cmd_template_avail(args):
    from ._templates import list_templates

    for t in list_templates():
        aliases = f" (aliases: {', '.join(t['aliases'])})" if t.get("aliases") else ""
        print(f"{t['name']:18s} {t['description']}{aliases}")


def cmd_template_show(args):
    from .input_serialization import serialize_inputs

    inputs = _build_inputs(args)
    print(json.dumps(serialize_inputs(inputs), indent=2))


def cmd_template_create(args):
    """Write a new run-template TOML from a base template plus overrides
    (reference cli.py `template create`, :227-420)."""
    from .input_serialization import write_inputs_to_toml

    inputs = _build_inputs(args)
    write_inputs_to_toml(inputs, args.out)
    print(f"wrote {args.out}")


def cmd_run_coeval(args):
    from .drivers.coeval import run_coeval
    from .io.caching import OutputCache

    inputs = _build_inputs(args)
    cache = OutputCache(args.cache_dir) if args.cache_dir else None
    coevals = run_coeval(inputs, [float(z) for z in args.redshift])
    if not isinstance(coevals, list):
        coevals = [coevals]
    for cv in coevals:
        xh = float(np.mean(np.asarray(cv.neutral_fraction)))
        tb = float(np.mean(np.asarray(cv.brightness_temp)))
        print(f"z={cv.redshift:7.3f}  <xH>={xh:.4f}  <Tb>={tb:8.3f} mK")
        if cache is not None:
            cache.write(cv.ionized_box, inputs)
            cache.write(cv.brightness_temperature, inputs)
    return coevals


def cmd_run_lightcone(args):
    from .drivers.lightcone import run_lightcone

    inputs = _build_inputs(args).with_logspaced_redshifts(args.min_z, args.max_z)
    lc = run_lightcone(inputs)
    bt = lc.brightness_temp
    print(
        f"lightcone: shape={bt.shape}, Tb range [{bt.min():.2f}, {bt.max():.2f}] mK"
    )
    if args.out:
        import h5py

        with h5py.File(args.out, "w") as f:
            for q, arr in lc.lightcones.items():
                f.create_dataset(q, data=arr, compression="gzip")
            f.create_dataset("lc_distances", data=lc.lc_distances)
            f.create_dataset("node_redshifts", data=lc.node_redshifts)
            for q, arr in lc.global_quantities.items():
                f.create_dataset(f"global/{q}", data=arr)
        print(f"wrote {args.out}")
    return lc


def cmd_run_global(args):
    from .drivers.global_evolution import run_global_evolution

    inputs = _build_inputs(args)
    ge = run_global_evolution(inputs, min_redshift=args.min_z, max_redshift=args.max_z)
    for i, z in enumerate(ge.redshifts):
        line = f"z={z:7.3f}  <xH>={ge.neutral_fraction[i]:.4f}  <Tb>={ge.brightness_temp[i]:8.3f} mK"
        if ge.spin_temperature is not None:
            line += f"  Ts={ge.spin_temperature[i]:8.2f} K  Tk={ge.kinetic_temperature[i]:8.2f} K"
        print(line)
    return ge


def cmd_predict(args):
    inputs = _build_inputs(args)
    so = inputs.simulation_options
    f32 = 4
    hires = int(np.prod(so.hires_shape)) * f32
    lowres = int(np.prod(so.lowres_shape)) * f32
    n_ic = 2 + 6 if inputs.matter_options.PERTURB_ALGORITHM == "2LPT" else 2 + 3
    per_snap = 6 if inputs.astro_options.USE_TS_FLUCT else 4
    print(f"hires grid:  {hires/2**30:.2f} GiB each ({so.hires_shape})")
    print(f"lowres grid: {lowres/2**30:.3f} GiB each ({so.lowres_shape})")
    print(f"ICs total:   {(2*hires + (n_ic-1)*lowres)/2**30:.2f} GiB")
    print(f"per-snapshot boxes: ~{per_snap*lowres/2**30:.2f} GiB")


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="21cmfast-tpu", description="TPU-native 21cmFAST simulator"
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--template", default=None, help="template name (see 'template avail')")
        sp.add_argument("--seed", type=int, default=42)
        sp.add_argument(
            "--param", "-p", action="append",
            help="parameter override KEY=VALUE (repeatable)",
        )

    t = sub.add_parser("template", help="inspect parameter templates")
    tsub = t.add_subparsers(dest="tcmd", required=True)
    tav = tsub.add_parser("avail", help="list templates")
    tav.set_defaults(func=cmd_template_avail)
    tsh = tsub.add_parser("show", help="show resolved parameters")
    common(tsh)
    tsh.set_defaults(func=cmd_template_show)
    tcr = tsub.add_parser(
        "create", help="write a new template TOML from a base + overrides"
    )
    common(tcr)
    tcr.add_argument("out", help="output TOML path")
    tcr.set_defaults(func=cmd_template_create)

    r = sub.add_parser("run", help="run simulations")
    rsub = r.add_subparsers(dest="rcmd", required=True)

    rc = rsub.add_parser("coeval", help="coeval cube(s)")
    common(rc)
    rc.add_argument("--redshift", "-z", nargs="+", required=True, type=float)
    rc.add_argument("--cache-dir", default=None)
    rc.set_defaults(func=cmd_run_coeval)

    rl = rsub.add_parser("lightcone", help="full lightcone")
    common(rl)
    rl.add_argument("--min-z", type=float, default=6.0)
    rl.add_argument("--max-z", type=float, default=30.0)
    rl.add_argument("--out", default=None, help="output HDF5 path")
    rl.set_defaults(func=cmd_run_lightcone)

    rg = rsub.add_parser("global", help="global (0-D) signal")
    common(rg)
    rg.add_argument("--min-z", type=float, default=5.5)
    rg.add_argument("--max-z", type=float, default=None)
    rg.set_defaults(func=cmd_run_global)

    pr = sub.add_parser("predict", help="memory estimates")
    common(pr)
    pr.set_defaults(func=cmd_predict)

    args = p.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main(sys.argv[1:])
