"""Plotting for experiment CSVs — the paper-*.py seaborn analog.

Reference: SGXv2Scripts/scripts/paper-*.py produce seaborn figures from the
long-format CSVs (errorbar="sd" over 10 reps — paper-1:75).  This renders
the same figure families from this framework's CSVs:

    join-overview   bar: throughput by algorithm (join_overview.py output)
    scaling         line: throughput vs |R| (scaling.py output)
    skew            line: throughput vs Zipf z (skew.py output)
    scan            line: GB/s vs selectivity by mode (scan_bench.py output)
    tpch            bar: M rows/s by query (tpch_bench.py output)

Usage: python experiments/plot.py <family> <csv> [out.pdf]
Matplotlib only (seaborn not required in this image); error bars = sd.
"""

import sys

sys.path.insert(0, ".")

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def _read_csv(path):
    import csv

    with open(path) as f:
        return list(csv.DictReader(f))


def _agg(rows, key_fields, val_field):
    """mean/sd of val_field grouped by key_fields tuple."""
    import math
    from collections import defaultdict

    groups = defaultdict(list)
    for r in rows:
        try:
            v = float(r[val_field])
        except (KeyError, ValueError):
            continue
        groups[tuple(r[k] for k in key_fields)].append(v)
    out = {}
    for k, vs in groups.items():
        m = sum(vs) / len(vs)
        sd = math.sqrt(sum((v - m) ** 2 for v in vs) / len(vs)) if len(vs) > 1 else 0.0
        out[k] = (m, sd)
    return out


def _tput_rows(rows):
    return [r for r in rows if r.get("measurement") == "throughput_mrows"]


def plot_join_overview(rows, out):
    agg = _agg(_tput_rows(rows), ("alg",), "value")
    algs = sorted(agg, key=lambda k: -agg[k][0])
    means = [agg[a][0] for a in algs]
    sds = [agg[a][1] for a in algs]
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.bar([a[0] for a in algs], means, yerr=sds, capsize=3)
    ax.set_ylabel("M input rows/s")
    ax.set_title("Join algorithm overview (cf. paper-1)")
    ax.tick_params(axis="x", rotation=45)
    fig.tight_layout()
    fig.savefig(out)


def plot_scaling(rows, out):
    agg = _agg(_tput_rows(rows), ("size_r", "alg"), "value")
    algs = sorted({k[1] for k in agg})
    fig, ax = plt.subplots(figsize=(6, 4))
    for alg in algs:
        pts = sorted(
            (int(k[0]), v[0], v[1]) for k, v in agg.items() if k[1] == alg
        )
        ax.errorbar([p[0] for p in pts], [p[1] for p in pts],
                    yerr=[p[2] for p in pts], label=alg, marker="o")
    ax.set_xscale("log", base=2)
    ax.set_xlabel("|R| rows")
    ax.set_ylabel("M input rows/s")
    ax.set_title("Scaling (cf. paper-4)")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out)


def plot_skew(rows, out):
    agg = _agg(_tput_rows(rows), ("skew", "alg"), "value")
    algs = sorted({k[1] for k in agg})
    fig, ax = plt.subplots(figsize=(6, 4))
    for alg in algs:
        pts = sorted(
            (float(k[0]), v[0], v[1]) for k, v in agg.items() if k[1] == alg
        )
        ax.errorbar([p[0] for p in pts], [p[1] for p in pts],
                    yerr=[p[2] for p in pts], label=alg, marker="o")
    ax.set_xlabel("Zipf exponent z")
    ax.set_ylabel("M input rows/s")
    ax.set_title("Skew resilience (cf. paper-revision-9)")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out)


def plot_scan(rows, out):
    agg = _agg(rows, ("mode", "selectivity"), "gb_per_s")
    modes = sorted({k[0] for k in agg})
    fig, ax = plt.subplots(figsize=(6, 4))
    for mode in modes:
        pts = sorted(
            (float(k[1]), v[0]) for k, v in agg.items() if k[0] == mode
        )
        ax.plot([p[0] for p in pts], [p[1] for p in pts], label=mode, marker="o")
    ax.set_xlabel("selectivity %")
    ax.set_ylabel("GB/s")
    ax.set_title("Column scan (cf. SimdScanMulti plots)")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out)


def plot_tpch(rows, out):
    agg = _agg(rows, ("query",), "throughput_mrows")
    qs = sorted(agg)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.bar([q[0] for q in qs], [agg[q][0] for q in qs],
           yerr=[agg[q][1] for q in qs], capsize=3)
    ax.set_ylabel("M rows/s")
    ax.set_title("TPC-H queries (cf. paper-8)")
    fig.tight_layout()
    fig.savefig(out)


FAMILIES = {
    "join-overview": plot_join_overview,
    "scaling": plot_scaling,
    "skew": plot_skew,
    "scan": plot_scan,
    "tpch": plot_tpch,
}


def main():
    if len(sys.argv) < 3 or sys.argv[1] not in FAMILIES:
        raise SystemExit(f"usage: plot.py {{{'|'.join(FAMILIES)}}} in.csv [out.pdf]")
    family, path = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else f"results/{family}.pdf"
    FAMILIES[family](_read_csv(path), out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
