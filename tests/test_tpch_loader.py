"""Binary columnar store roundtrip: write reference-layout dirs, reload,
re-run a query, identical result."""

import numpy as np

from aqp_tpu.data import tpch_loader as L
from aqp_tpu.queries import generate_tpch_tables, tpch_q12


def test_roundtrip(tmp_path):
    l, o, c, p, n = generate_tpch_tables(scale=0.001, seed=9)
    L.write_tables(tmp_path, lineitem=l, orders=o, customer=c, part=p, nation=n)
    l2 = L.load_lineitem(tmp_path)
    o2 = L.load_orders(tmp_path)
    c2 = L.load_customer(tmp_path)
    p2 = L.load_part(tmp_path)
    n2 = L.load_nation(tmp_path)
    for a, b in [(l, l2), (o, o2), (c, c2), (p, p2), (n, n2)]:
        for k, v in a.__dict__.items():
            assert np.array_equal(np.asarray(v), np.asarray(getattr(b, k))), k
    r1 = tpch_q12(l, o)
    r2 = tpch_q12(l2, o2)
    assert r1.matches == r2.matches
