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
    """Selectivity family of the spectrum CSV: read GB/s by engine:mode
    (write-rate.csv / selectivity-sweep analogs)."""
    rows = [r for r in rows if r.get("family", "selectivity") == "selectivity"]
    agg = _agg(rows, ("engine", "mode", "selectivity"), "read_gb_s")
    series = sorted({(k[0], k[1]) for k in agg})
    fig, ax = plt.subplots(figsize=(7, 4))
    for eng, mode in series:
        pts = sorted(
            (float(k[2]), v[0]) for k, v in agg.items()
            if (k[0], k[1]) == (eng, mode)
        )
        ax.plot([p[0] for p in pts], [p[1] for p in pts],
                label=f"{eng}:{mode}", marker="o",
                linestyle="-" if eng == "pallas" else "--")
    ax.set_xlabel("selectivity %")
    ax.set_ylabel("read GB/s")
    ax.set_yscale("log")
    ax.set_title("Column scan spectrum (cf. SimdScanMulti plots)")
    ax.legend(fontsize=7, ncol=2)
    fig.tight_layout()
    fig.savefig(out)


def plot_tpch(rows, out):
    agg = _agg(rows, ("query", "plan"), "throughput_mrows")
    qs = sorted({k[0] for k in agg})
    plans = sorted({k[1] for k in agg})
    fig, ax = plt.subplots(figsize=(6, 4))
    w = 0.8 / max(1, len(plans))
    for i, plan in enumerate(plans):
        xs = [j + i * w for j in range(len(qs))]
        ms = [agg.get((q, plan), (0, 0))[0] for q in qs]
        sd = [agg.get((q, plan), (0, 0))[1] for q in qs]
        ax.bar(xs, ms, width=w, yerr=sd, capsize=3, label=plan)
    ax.set_xticks([j + w / 2 for j in range(len(qs))])
    ax.set_xticklabels(qs)
    ax.set_ylabel("M rows/s")
    ax.set_title("TPC-H staged vs fused (cf. paper-8)")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out)


def plot_weak_scaling(rows, out):
    agg = _agg(rows, ("mode", "engine", "devices"), "throughput_mrows")
    series = sorted({(k[0], k[1]) for k in agg})
    fig, ax = plt.subplots(figsize=(6, 4))
    for mode, eng in series:
        pts = sorted(
            (int(k[2]), v[0]) for k, v in agg.items()
            if (k[0], k[1]) == (mode, eng)
        )
        ax.plot([p[0] for p in pts], [p[1] for p in pts],
                label=f"{mode}:{eng}", marker="o")
    ax.set_xscale("log", base=2)
    ax.set_xlabel("devices")
    ax.set_ylabel("M input rows/s")
    ax.set_title("Mesh scaling (thread-scaling analog)")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out)


def plot_cracking(rows, out):
    agg = _agg(rows, ("variant", "query"), "seconds")
    variants = sorted({k[0] for k in agg})
    fig, ax = plt.subplots(figsize=(6, 4))
    for v in variants:
        pts = sorted((int(k[1]), a[0]) for k, a in agg.items() if k[0] == v)
        ax.plot([p[0] for p in pts], [p[1] * 1e3 for p in pts],
                label=v, marker="o")
    ax.set_xlabel("query # in sequence")
    ax.set_ylabel("ms / query")
    ax.set_title("Cracking amortization (cf. CrkJoin)")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out)


FAMILIES = {
    "join-overview": plot_join_overview,
    "scaling": plot_scaling,
    "skew": plot_skew,
    "scan": plot_scan,
    "tpch": plot_tpch,
    "weak-scaling": plot_weak_scaling,
    "cracking": plot_cracking,
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
