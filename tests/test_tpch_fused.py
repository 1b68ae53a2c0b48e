"""Fused single-program TPC-H plans must match the staged plans bit-exactly
(same match counts) — the fused path is the serving path, the staged path is
the per-phase-timed benchmark path."""

from aqp_tpu.queries import generate_tpch_tables, tpch_q3, tpch_q10, tpch_q12, tpch_q19
from aqp_tpu.queries.fused import (
    tpch_q3_fused,
    tpch_q10_fused,
    tpch_q12_fused,
    tpch_q19_fused,
)

SCALE = 0.002


def test_fused_match_staged():
    l, o, c, p, n = generate_tpch_tables(scale=SCALE)
    for got, want in [
        (tpch_q3_fused(c, o, l), tpch_q3(c, o, l).matches),
        (tpch_q10_fused(c, o, l, n), tpch_q10(c, o, l, n).matches),
        (tpch_q12_fused(l, o), tpch_q12(l, o).matches),
        (tpch_q19_fused(l, p), tpch_q19(l, p).matches),
    ]:
        matches, ok = got
        assert bool(ok), "capacity bound exceeded on TPC-H data"
        assert int(matches) == want
