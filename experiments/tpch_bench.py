"""TPC-H query benchmark (paper-8-full-query-optimization-impact.py analog)."""
import sys
import time

sys.path.insert(0, ".")

from aqp_tpu.queries import generate_tpch_tables, tpch_q3, tpch_q10, tpch_q12, tpch_q19


def main(scale: float = 1.0, algorithm: str = "RHO", reps: int = 3):
    l, o, c, p, n = generate_tpch_tables(scale=scale)
    rows = []
    for name, fn, args in [
        ("Q3", tpch_q3, (c, o, l)),
        ("Q10", tpch_q10, (c, o, l, n)),
        ("Q12", tpch_q12, (l, o)),
        ("Q19", tpch_q19, (l, p)),
    ]:
        for rep in range(reps):
            res = fn(*args, algorithm=algorithm)
            t = res.timings
            print(
                f"{name} sf={scale} alg={algorithm} rep={rep}: "
                f"{t.mrows_per_s:.1f} M rows/s matches={res.matches} "
                f"phases={ {k: round(v,4) for k,v in t.phases.items()} }"
            )
            rows.append((name, scale, algorithm, rep, t.mrows_per_s, res.matches))
    import os

    os.makedirs("results", exist_ok=True)
    with open("results/tpch.csv", "w") as f:
        f.write("query,scale,alg,rep,throughput_mrows,matches\n")
        for r in rows:
            f.write(",".join(map(str, r)) + "\n")


if __name__ == "__main__":
    scale = 0.01 if "--small" in sys.argv else 1.0
    main(scale=scale)
