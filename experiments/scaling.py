"""|R| scaling study (paper-4-scaling.py analog): sweep |R| at fixed |S|."""
import sys

sys.path.insert(0, ".")

from aqp_tpu.utils import ensure_platform_from_env

ensure_platform_from_env()

from aqp_tpu.harness import (
    ExperimentConfig, run_experiments_pipelined, rows_to_csv)


def main(small: bool = False):
    if small:
        sizes = [(1 << k, 1 << 18) for k in (12, 14, 16)]
    else:
        # reference sweeps 131k..524M rows of R at fixed S
        # (scaling-perf.csv); 2^29 = 537M matches its top point
        sizes = [(1 << k, 52_428_800) for k in (17, 20, 23, 25, 27, 29)]
    # alias_payloads halves HBM (keys-only runs never read payloads —
    # the reference's generators leave payloads uninitialized too) so the
    # 537M-row top point fits the 16 GB chip
    cfg = ExperimentConfig(algorithms=["RHO", "PHT"], sizes=sizes, reps=3,
                           alias_payloads=True)
    rows = run_experiments_pipelined(cfg)
    rows_to_csv(rows, "results/scaling-perf.csv")


if __name__ == "__main__":
    main(small="--small" in sys.argv)
