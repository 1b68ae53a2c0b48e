"""Zipf skew study (paper-revision-9-skew.py analog)."""
import sys

sys.path.insert(0, ".")

from aqp_tpu.utils import ensure_platform_from_env

ensure_platform_from_env()

from aqp_tpu.harness import (
    ExperimentConfig, run_experiments_pipelined, rows_to_csv)


def main(small: bool = False):
    size = (1 << 16, 1 << 18) if small else (13_107_200, 52_428_800)
    cfg = ExperimentConfig(
        algorithms=["RHO", "PHT", "PSM"],
        sizes=[size],
        skews=[None, 0.5, 1.0, 1.25, 1.5],
        reps=3,
    )
    rows = run_experiments_pipelined(cfg)
    rows_to_csv(rows, "results/skew.csv")


if __name__ == "__main__":
    main(small="--small" in sys.argv)
