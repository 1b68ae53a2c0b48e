"""Round-4 chip session 2: kernel smoke + re-runs with the session-1 fixes.

Order: cheap kernel smokes first (small shapes, fail-fast information),
then the re-run studies.  Single process (claim-handoff discipline).
"""
import sys
import time
import traceback

sys.path.insert(0, ".")

from aqp_tpu.utils import ensure_platform_from_env

ensure_platform_from_env()


def _run(name, fn):
    print(f"\n===== {name} =====", flush=True)
    t0 = time.time()
    try:
        fn()
        print(f"===== {name} DONE ({time.time()-t0:.0f}s) =====", flush=True)
    except Exception:
        traceback.print_exc()
        print(f"===== {name} FAILED =====", flush=True)


def smoke():
    import jax
    import jax.numpy as jnp
    from aqp_tpu.utils.timing import hard_sync
    from aqp_tpu.ops.pallas.lanecompact import scan_index_fast, scan_dict_fast
    from aqp_tpu.ops import scan as xs

    n = 1 << 24
    col = (jnp.arange(n, dtype=jnp.int32) * 1103515245 % 251).astype(
        jnp.uint8)
    hard_sync(col)
    ids, cnt, ovf = scan_index_fast(col, 10, 60, cap_rows=n // 128)
    hard_sync(ids)
    want = int(xs.scan_count(col, jnp.uint8(10), jnp.uint8(60)))
    assert int(ovf) == 0 and int(cnt) == want, (int(cnt), want, int(ovf))
    print("scan_index_fast OK", want, flush=True)
    d = jnp.arange(256, dtype=jnp.int32) * 7
    i2, lo2, hi2, c2, o2 = scan_dict_fast(col, d, d + 1, 10, 60,
                                          cap_rows=n // 128)
    hard_sync(i2)
    assert int(o2) == 0 and int(c2) == want
    print("scan_dict_fast OK", flush=True)

    from aqp_tpu.ops.pallas.aggpipe import groupby_aggregate_routed
    from aqp_tpu.ops.aggregate import groupby_aggregate

    key = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, 1 << 16,
                             jnp.int32)
    val = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, 1000,
                             jnp.int32)
    hard_sync((key, val))
    g = groupby_aggregate_routed(key, val, 1 << 18)
    ref = groupby_aggregate(key, val, 1 << 18)
    assert int(g.num_groups) == int(ref.num_groups), (
        int(g.num_groups), int(ref.num_groups))
    assert int(jnp.sum(g.count, dtype=jnp.int64)) == n
    print("routed aggregate OK", int(g.num_groups), flush=True)


def scans():
    import experiments.scan_bench as sb

    for fam, csv in (("selectivity", "scan-selectivity.csv"),
                     ("residency", "scan-residency.csv")):
        rows = []
        getattr(sb, f"family_{fam}")(False, 5, rows)
        path = f"results/{csv}"
        with open(path, "w") as f:
            f.write("family,mode,engine,rows,selectivity,residency,"
                    "ms,read_gb_s,write_gb_s\n")
            for r in rows:
                f.write(",".join(map(str, r)) + "\n")
        print(f"wrote {path} ({len(rows)} rows)", flush=True)


def tpch10():
    from experiments.tpch_bench import main

    main(scale=10.0, reps=3)


def selectivity():
    from experiments.selectivity import main

    main()


def skew():
    from experiments.skew import main

    main()


def overview():
    # keys-only serving re-run: the harness default now matches the
    # reference's matches-only count branch
    from experiments.join_overview import main

    main()


def aggregates():
    sys.argv = ["aggregate_bench", "--csv", "results/aggregate.csv"]
    from experiments.aggregate_bench import main

    main()


if __name__ == "__main__":
    only = set(sys.argv[1:])
    studies = [("smoke", smoke), ("scans", scans), ("tpch_sf10", tpch10),
               ("selectivity", selectivity), ("skew", skew),
               ("overview", overview), ("aggregate", aggregates)]
    for name, fn in studies:
        if only and name not in only:
            continue
        _run(name, fn)
