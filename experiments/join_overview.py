"""Join-algorithm overview (paper-1-join-algorithm-overview.py analog):
all algorithms on the cache-exceed-class workload, CSV out."""
import sys

sys.path.insert(0, ".")

from aqp_tpu.harness import ExperimentConfig, run_experiments, rows_to_csv
from aqp_tpu.joins.api import JOIN_ALGORITHMS


def main(small: bool = False):
    size = (1 << 16, 1 << 18) if small else (13_107_200, 52_428_800)
    cfg = ExperimentConfig(
        algorithms=sorted(JOIN_ALGORITHMS),
        sizes=[size],
        reps=3,
    )
    rows = run_experiments(cfg)
    rows_to_csv(rows, "results/join-overview.csv")


if __name__ == "__main__":
    main(small="--small" in sys.argv)
