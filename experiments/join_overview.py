"""Join-algorithm overview (paper-1-join-algorithm-overview.py analog):
all algorithms on the cache-exceed-class workload, CSV out."""
import sys

sys.path.insert(0, ".")

from aqp_tpu.utils import ensure_platform_from_env

ensure_platform_from_env()

from aqp_tpu.harness import (
    ExperimentConfig, run_experiments_pipelined, rows_to_csv)
from aqp_tpu.joins.api import JOIN_ALGORITHMS


def main(small: bool = False):
    size = (1 << 16, 1 << 18) if small else (13_107_200, 52_428_800)
    # NL is the O(|R|·|S|) all-pairs baseline: it gets its own small size
    # (the reference's overview also runs it as a baseline, not at scale)
    cfg = ExperimentConfig(
        algorithms=sorted(set(JOIN_ALGORITHMS) - {"NL"}),
        sizes=[size],
        reps=3,
    )
    # async-pipelined per-call timing (bench.py methodology): the
    # reference's overview also times in-process calls without a
    # per-call device round-trip; the dispatch floor here is 25-40 ms
    rows = run_experiments_pipelined(cfg)
    nl_cfg = ExperimentConfig(
        algorithms=["NL"],
        sizes=[(1 << 14, 1 << 16) if small else (1 << 18, 1 << 20)],
        reps=3,
    )
    rows += run_experiments_pipelined(nl_cfg)
    rows_to_csv(rows, "results/join-overview.csv")
    print(f"wrote results/join-overview.csv ({len(rows)} rows)")


def main_key64(small: bool = False):
    """KEY_8B rows (reference data-types.h:6-12): every engine takes the
    XLA core (the packed-key Pallas network is int32-only — measured and
    documented rather than silently absent).  MUST run in its own process:
    jax_enable_x64 flips default dtypes for everything compiled after it.
    Appends backend=tpu_k64 rows to the overview CSV."""
    import jax

    jax.config.update("jax_enable_x64", True)
    size = (1 << 16, 1 << 18) if small else (13_107_200, 52_428_800)
    cfg = ExperimentConfig(
        algorithms=["RHO", "PHT", "MWAY", "INL"],
        sizes=[size],
        reps=3,
        key64=True,
    )
    rows = run_experiments_pipelined(cfg, backend="tpu_k64")
    rows_to_csv(rows, "results/join-overview.csv", append=True)
    print(f"appended {len(rows)} key64 rows to results/join-overview.csv")


if __name__ == "__main__":
    if "--key64" in sys.argv:
        main_key64(small="--small" in sys.argv)
    else:
        main(small="--small" in sys.argv)
