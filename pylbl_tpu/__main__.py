"""Command-line interface.

The reference library has no CLI at all (its setup.py defines only plugin
entry points); this module adds the operational surface a production
framework needs:

    python -m pylbl_tpu info
    python -m pylbl_tpu compute --atmosphere atm.nc --database spectra.db \
        --grid 1:3000:0.1 --output absorption.nc --format total
    python -m pylbl_tpu create-db --database spectra.db --api-key KEY \
        [--molecules H2O,CO2] [--xsec-dir .cross-sections]
    python -m pylbl_tpu bench
"""
import argparse
import json
import sys

import numpy as np


def _parse_grid(spec):
    lo, hi, res = (float(x) for x in spec.split(":"))
    return np.arange(lo, hi, res)


def _apply_platform(args):
    """Applies --platform after the jax import: env vars alone are not
    reliable here (site customizations may re-force a platform), so the
    config update must run post-import."""
    if getattr(args, "platform", None):
        import jax
        jax.config.update("jax_platforms", args.platform)


def cmd_info(args):
    _apply_platform(args)
    import jax
    from . import __version__, plugins
    from .runtime import native
    print(f"pylbl_tpu {__version__}")
    print(f"jax backend: {jax.default_backend()}  devices: {jax.devices()}")
    print(f"lines backends: {sorted(plugins.molecular_lines)}")
    print(f"continua backends: {sorted(plugins.continua)}")
    print(f"cross-section backends: {sorted(plugins.cross_sections)}")
    print(f"native runtime: {'available' if native.available() else 'unavailable'}")
    return 0


def cmd_compute(args):
    _apply_platform(args)
    from .database.db import Database
    from .spectroscopy import Spectroscopy
    from .utils.observability import configure_logging, metrics
    from .utils.xrlite import open_dataset
    configure_logging()
    atmosphere = open_dataset(args.atmosphere)
    database = Database(args.database,
                        pack_cache_dir=args.pack_cache_dir)
    grid = _parse_grid(args.grid)
    mesh = None
    if args.mesh:
        from .parallel import make_mesh
        from .parallel.distributed import initialize
        initialize()  # no-op single-process; pod entry point otherwise.
        batch, spec = (int(x) for x in args.mesh.lower().split("x"))
        mesh = make_mesh(batch=batch, spec=spec)
    spectroscopy = Spectroscopy(
        atmosphere, grid, database,
        lines_backend=args.lines_backend,
        continua_backend=args.continua_backend,
        cross_sections_backend=args.cross_sections_backend,
        mesh=mesh, sharding_mode=args.sharding_mode)
    if args.streamed:
        spectroscopy.compute_absorption_streamed(args.output)
    else:
        result = spectroscopy.compute_absorption(output_format=args.format)
        result.to_netcdf(args.output)
    if args.metrics:
        print(json.dumps(metrics.snapshot(), indent=2))
    print(f"wrote {args.output}")
    return 0


def cmd_create_db(args):
    from .database.db import Database
    from .webapi import HitranWebApi
    database = Database(args.database)
    molecules = "all" if args.molecules is None \
        else args.molecules.split(",")
    webapi = HitranWebApi(args.api_key)
    database.create(webapi, molecules=molecules,
                    cross_section_directory=args.xsec_dir)
    print(f"created {args.database}")
    return 0


def cmd_bench(args):
    import runpy
    from pathlib import Path
    bench = Path(__file__).resolve().parents[1] / "bench.py"
    runpy.run_path(str(bench), run_name="__main__")
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser(prog="pylbl_tpu")
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. cpu, tpu)")
    sub = parser.add_subparsers(dest="command", required=True)

    sub.add_parser("info", help="environment and backend summary")

    compute = sub.add_parser("compute", help="compute absorption spectra")
    compute.add_argument("--atmosphere", required=True,
                         help="netCDF atmosphere with CF standard names")
    compute.add_argument("--database", required=True)
    compute.add_argument("--grid", required=True,
                         help="lo:hi:resolution in cm-1, e.g. 1:3000:0.1")
    compute.add_argument("--output", required=True)
    compute.add_argument("--format", default="all",
                         choices=["all", "gas", "total"],
                         help="'all' materializes per-gas per-mechanism "
                              "spectra on the HOST (slowest at scale); "
                              "'gas'/'total' reduce on device and ship "
                              "G x / 3G x less data — prefer these (or "
                              "--streamed) for large grids/batches")
    compute.add_argument("--lines-backend", default="pyLBL")
    compute.add_argument("--continua-backend", default="mt_ckd")
    compute.add_argument("--cross-sections-backend", default="arts_crossfit")
    compute.add_argument("--pack-cache-dir", default=None)
    compute.add_argument("--mesh", default=None,
                         help="run lines multi-device on a BATCHxSPEC "
                              "mesh, e.g. 2x4")
    compute.add_argument("--sharding-mode", default="balanced",
                         choices=["balanced", "halo", "ring"])
    compute.add_argument("--streamed", action="store_true",
                         help="stream layer blocks to a chunked, "
                              "resumable netCDF (RFMIP-scale outputs)")
    compute.add_argument("--metrics", action="store_true",
                         help="print the metrics snapshot after computing")

    create = sub.add_parser("create-db", help="build the spectral database "
                            "from HITRAN/TIPS (network)")
    create.add_argument("--database", required=True)
    create.add_argument("--api-key", required=True)
    create.add_argument("--molecules", default=None,
                        help="comma-separated formulae (default: all)")
    create.add_argument("--xsec-dir", default=".cross-sections")

    sub.add_parser("bench", help="run the headline TPU benchmark")

    args = parser.parse_args(argv)
    return {"info": cmd_info, "compute": cmd_compute,
            "create-db": cmd_create_db, "bench": cmd_bench}[args.command](args)


if __name__ == "__main__":
    sys.exit(main())
