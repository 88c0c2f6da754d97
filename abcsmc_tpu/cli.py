"""Command-line driver, argument-compatible with the reference example binaries
(examples/include/examples.h:12-94):

    abcsmc-tpu config.json --process
    abcsmc-tpu config.json --simulate [-n N]
    abcsmc-tpu config.json --process --simulate -n N [--all]

Extensions: --seed for reproducible runs (the reference seeds from
time(NULL) * getpid(), examples.h:63), --verbose.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from abcsmc_tpu.engine import AbcSmc
from abcsmc_tpu.errors import AbcError


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="abcsmc-tpu",
        description="TPU-native ABC-SMC with PLS particle filtering",
    )
    ap.add_argument("config_file")
    ap.add_argument("--process", action="store_true", dest="process_db")
    ap.add_argument("--simulate", action="store_true", dest="simulate_db")
    ap.add_argument("-n", type=int, default=1, dest="buffer_size",
                    help="simulations per database write")
    ap.add_argument("--all", action="store_true", dest="do_all")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument(
        "--device", action="store_true",
        help="run the full SMC loop on-device (fused sharded generations); "
             "falls back to the host engine when not applicable",
    )
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_argparser().parse_args(argv)
    seed = args.seed
    if seed is None:
        # reference: time(NULL) * getpid() (examples.h:63)
        seed = (int(time.time()) * os.getpid()) & 0x7FFFFFFF

    try:
        abc = AbcSmc(args.config_file)
        if args.device:
            abc.run_device(seed, verbose=args.verbose)
        elif args.do_all:
            # examples.h:76-93: per set, process + simulate the whole set,
            # then one final process pass
            for t in range(abc.config.num_smc_sets):
                if args.process_db:
                    abc.process_database(seed + t, args.verbose)
                if args.simulate_db:
                    abc.simulate_next_particles(n=-1)
            if args.process_db:
                abc.process_database(seed + abc.config.num_smc_sets, args.verbose)
        else:
            if args.process_db:
                abc.process_database(seed, args.verbose)
            if args.simulate_db:
                abc.simulate_next_particles(args.buffer_size)
    except AbcError as e:
        sys.stderr.write(f"{e}\n")
        return -(e.code or 1) if e.code and e.code < 0 else (e.code or 1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
