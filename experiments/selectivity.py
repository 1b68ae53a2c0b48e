"""Join-selectivity sweep (the reference's `-l` experiments).

Reference: lib/AppUtilities/src/commons.cpp:85-97 — the `-l` flag draws S
keys from an enlarged domain so only `selectivity`% of probe rows match;
the overview/scaling scripts sweep it.  Here: RHO and PHT over
selectivity 1..100% at the headline workload, 3 reps, long-format CSV.
"""
import sys

sys.path.insert(0, ".")

from aqp_tpu.utils import ensure_platform_from_env

ensure_platform_from_env()

from aqp_tpu.harness import (
    ExperimentConfig, run_experiments_pipelined, rows_to_csv)


def main(small: bool = False):
    size = (1 << 16, 1 << 18) if small else (13_107_200, 52_428_800)
    cfg = ExperimentConfig(
        algorithms=["RHO", "PHT"],
        sizes=[size],
        selectivities=[1.0, 10.0, 25.0, 50.0, 75.0, 100.0],
        reps=3,
    )
    rows = run_experiments_pipelined(cfg)
    rows_to_csv(rows, "results/join-selectivity.csv")
    print(f"wrote results/join-selectivity.csv ({len(rows)} rows)")


if __name__ == "__main__":
    main(small="--small" in sys.argv)
