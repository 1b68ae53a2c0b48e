"""TPC-H plans vs. a pure-numpy oracle on synthetic seeded data."""

import numpy as np
import pytest

from aqp_tpu.queries import (
    generate_tpch_tables,
    tpch_q3,
    tpch_q10,
    tpch_q12,
    tpch_q19,
)
from aqp_tpu.queries import tables as T


@pytest.fixture(scope="module")
def data():
    return generate_tpch_tables(scale=0.002, seed=7)


@pytest.fixture(scope="module")
def np_data(data):
    l, o, c, p, n = data
    to = lambda t: {k: np.asarray(v) for k, v in t.__dict__.items()}
    return to(l), to(o), to(c), to(p), to(n)


def oracle_q3(l, o, c):
    cust = set(c["key"][c["mktsegment"] == T.MKT_BUILDING].tolist())
    om = o["orderdate"] < T.TS_1995_03_15
    orders_k = o["custkey"][om]
    orders_okey = o["key"][om]
    u = set(ok for ck, ok in zip(orders_k.tolist(), orders_okey.tolist()) if ck in cust)
    lm = l["shipdate"] >= T.TS_1995_03_16
    return sum(1 for k in l["key"][lm].tolist() if k in u)


def oracle_q10(l, o, c, n):
    om = (o["orderdate"] >= T.TS_1993_10_01) & (o["orderdate"] < T.TS_1994_01_01)
    cust_row = {int(k): int(r) for k, r in zip(c["key"], c["rowid"])}
    nations = set(n["key"].tolist())
    # join1: customer ⋈ filtered orders on custkey
    u = []  # (nationkey, orders_rowid)
    for ck, orow in zip(o["custkey"][om].tolist(), o["rowid"][om].tolist()):
        if ck in cust_row:
            u.append((int(c["nationkey"][cust_row[ck]]), orow))
    # join2: nation ⋈ u
    v = [(int(o["key"][orow]), orow) for nk, orow in u if nk in nations]
    vkeys = set(k for k, _ in v)
    lm = l["returnflag"] == T.L_RETURNFLAG_R
    return sum(1 for k in l["key"][lm].tolist() if k in vkeys)


def oracle_q12(l, o):
    lm = (
        ((l["shipmode"] == T.L_SHIPMODE_MAIL) | (l["shipmode"] == T.L_SHIPMODE_SHIP))
        & (l["commitdate"] < l["receiptdate"])
        & (l["shipdate"] < l["commitdate"])
        & (l["receiptdate"] >= T.TS_1994_01_01)
        & (l["receiptdate"] < T.TS_1995_01_01)
    )
    okeys = set(o["key"].tolist())
    return sum(1 for k in l["key"][lm].tolist() if k in okeys)


def oracle_q19(l, p):
    pm = (
        np.isin(p["brand"], [T.P_BRAND_12, T.P_BRAND_23, T.P_BRAND_34])
        & (p["container"] >= 1) & (p["container"] <= 12)
        & (p["size"] >= 1) & (p["size"] <= 15)
    )
    part_rows = {int(k): int(r) for k, r in zip(p["key"][pm], p["rowid"][pm])}
    lm = (
        (l["quantity"] >= 1) & (l["quantity"] <= 30)
        & np.isin(l["shipmode"], [T.L_SHIPMODE_AIR, T.L_SHIPMODE_AIR_REG])
        & (l["shipinstruct"] == T.L_SHIPINSTRUCT_DELIVER_IN_PERSON)
    )
    matches = 0
    for pk, lrow in zip(l["partkey"][lm].tolist(), l["rowid"][lm].tolist()):
        if pk not in part_rows:
            continue
        prow = part_rows[pk]
        brand, cont, size = int(p["brand"][prow]), int(p["container"][prow]), int(p["size"][prow])
        qty = int(l["quantity"][lrow])
        p1 = brand == T.P_BRAND_12 and 1 <= cont <= 4 and 1 <= size <= 5 and 1 <= qty <= 11
        p2 = brand == T.P_BRAND_23 and 5 <= cont <= 8 and 1 <= size <= 10 and 10 <= qty <= 20
        p3 = brand == T.P_BRAND_34 and 9 <= cont <= 12 and 1 <= size <= 15 and 20 <= qty <= 30
        if p1 or p2 or p3:
            matches += 1
    return matches


@pytest.mark.parametrize("alg", ["RHO", "PHT"])
def test_q3(data, np_data, alg):
    l, o, c, p, n = data
    lnp, onp, cnp, pnp, nnp = np_data
    res = tpch_q3(c, o, l, algorithm=alg)
    assert res.matches == oracle_q3(lnp, onp, cnp)


@pytest.mark.parametrize("alg", ["RHO"])
def test_q10(data, np_data, alg):
    l, o, c, p, n = data
    lnp, onp, cnp, pnp, nnp = np_data
    res = tpch_q10(c, o, l, n, algorithm=alg)
    assert res.matches == oracle_q10(lnp, onp, cnp, nnp)


@pytest.mark.parametrize("alg", ["RHO", "PSM"])
def test_q12(data, np_data, alg):
    l, o, c, p, n = data
    lnp, onp, cnp, pnp, nnp = np_data
    res = tpch_q12(l, o, algorithm=alg)
    assert res.matches == oracle_q12(lnp, onp)


@pytest.mark.parametrize("alg", ["RHO"])
def test_q19(data, np_data, alg):
    l, o, c, p, n = data
    lnp, onp, cnp, pnp, nnp = np_data
    res = tpch_q19(l, p, algorithm=alg)
    assert res.matches == oracle_q19(lnp, pnp)
