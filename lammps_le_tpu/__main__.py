"""Command-line entry point — the ``lmp -in deck`` analog
(reference: src/main.cpp:34-53).

    python -m lammps_le_tpu -in in.chain [-var name value ...] \
        [-log log.txt] [-dtype float32] [-quiet]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="lammps_le_tpu")
    ap.add_argument("-in", dest="infile", required=True,
                    help="input deck (LAMMPS script subset)")
    ap.add_argument("-var", dest="vars", nargs=2, action="append",
                    default=[], metavar=("NAME", "VALUE"),
                    help="deck variable (like lmp -var)")
    ap.add_argument("-log", dest="log", default=None)
    ap.add_argument("-dtype", default="float32",
                    choices=["float32", "float64"])
    ap.add_argument("-quiet", action="store_true")
    ap.add_argument("-platform", default=None,
                    choices=["cpu", "tpu", "gpu"],
                    help="force a JAX backend (the axon sitecustomize "
                         "ignores JAX_PLATFORMS; this config update is "
                         "honored pre-init)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from .compile_cache import enable as enable_compile_cache
    from .deck import DeckRunner

    enable_compile_cache()
    runner = DeckRunner(dtype=args.dtype, quiet=args.quiet)
    if args.log:
        runner.command("log", [args.log])
    runner.run_file(args.infile, variables=dict(args.vars))
    return 0


if __name__ == "__main__":
    sys.exit(main())
