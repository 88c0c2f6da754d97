#!/usr/bin/env python3
"""Example external-executable simulator (the reference's `executable`
binding: parameters arrive as argv, metrics leave on stdout,
AbcSim.h:120-157). Deterministic per particle via the exported ABC_RNG_SEED.

Config:  { "executable": "python3 examples/dice_exec.py", ... }
Run fleets of these against one database with --workers N or a job array.
"""

import os
import random
import statistics
import sys


def main():
    ndice = max(int(float(sys.argv[1])), 1)
    nsides = max(int(float(sys.argv[2])), 1)
    random.seed(int(os.environ.get("ABC_RNG_SEED", 0)))
    rolls = [random.randint(1, nsides) for _ in range(ndice)]
    sd = statistics.stdev(rolls) if len(rolls) > 1 else 0.0
    print(sum(rolls), sd)


if __name__ == "__main__":
    main()
