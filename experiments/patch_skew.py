"""Re-measure named algorithms across the skew sweep and splice their rows
into results/skew.csv (used after an engine's skew path is re-designed)."""
import sys

sys.path.insert(0, ".")

from aqp_tpu.utils import ensure_platform_from_env

ensure_platform_from_env()

from aqp_tpu.harness import ExperimentConfig, run_experiments
from aqp_tpu.harness.runner import CSV_HEADER


def main(algs, small=False):
    size = (1 << 16, 1 << 18) if small else (13_107_200, 52_428_800)
    cfg = ExperimentConfig(algorithms=algs, sizes=[size],
                           skews=[None, 0.5, 1.0, 1.25, 1.5], reps=3)
    rows = run_experiments(cfg)
    path = "results/skew.csv"
    with open(path) as f:
        lines = f.read().splitlines()
    keep = [l for l in lines[1:] if l.split(",")[1] not in set(algs)]
    with open(path, "w") as f:
        f.write(CSV_HEADER + "\n")
        for l in keep:
            f.write(l + "\n")
        for r in rows:
            f.write(",".join(str(r[c.strip()]) for c in
                             CSV_HEADER.split(",")) + "\n")
    print(f"patched {path}: kept {len(keep)}, added {len(rows)}")


if __name__ == "__main__":
    algs = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(algs or ["RHO"], small="--small" in sys.argv)
