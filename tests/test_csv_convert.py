"""Native .tbl converter → binary layout → loader → query, end to end."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

NATIVE = Path(__file__).resolve().parents[1] / "native"


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    exe = NATIVE / "csv_convert"
    if not exe.exists():
        r = subprocess.run(["make", "-C", str(NATIVE)], capture_output=True)
        if r.returncode != 0 or not exe.exists():
            pytest.skip("native toolchain unavailable")
    tbl = tmp_path_factory.mktemp("tbl")
    out = tmp_path_factory.mktemp("out")
    (tbl / "lineitem.tbl").write_text(
        "1|5|100|1|17.0|1|1|1|R|N|1995-03-20|1995-02-01|1995-02-15|DELIVER IN PERSON|AIR|x|\n"
        "2|7|100|1|30.0|1|1|1|A|N|1993-03-20|1993-02-01|1993-02-15|NONE|MAIL|x|\n"
    )
    (tbl / "orders.tbl").write_text(
        "1|3|O|100.0|1995-01-02|x|x|0|x|\n2|4|F|100.0|1993-01-02|x|x|0|x|\n"
    )
    (tbl / "customer.tbl").write_text(
        "3|n|addr|7|phone|0.0|BUILDING|c|\n4|n|addr|8|phone|0.0|MACHINERY|c|\n"
    )
    (tbl / "part.tbl").write_text(
        "5|name|mfgr|Brand#12|type|3|SM CASE|9.0|c|\n"
        "7|name|mfgr|Brand#55|type|20|JUMBO JAR|9.0|c|\n"
    )
    (tbl / "nation.tbl").write_text("0|ALGERIA|0|x|\n1|ARGENTINA|1|x|\n")
    subprocess.run([str(exe), str(tbl), str(out)], check=True, capture_output=True)
    return out


def test_convert_and_query(converted):
    from aqp_tpu.data import tpch_loader as L
    from aqp_tpu.queries import tpch_q3

    l = L.load_lineitem(converted)
    o = L.load_orders(converted)
    c = L.load_customer(converted)
    p = L.load_part(converted)
    L.load_nation(converted)
    assert np.asarray(l.key).tolist() == [1, 2]
    assert np.asarray(l.shipmode).tolist() == [3, 1]  # AIR, MAIL
    assert np.asarray(l.returnflag).tolist() == [82, 65]
    assert np.asarray(l.quantity).tolist() == [17, 30]
    assert np.asarray(c.mktsegment).tolist() == [1, 5]
    assert np.asarray(p.brand).tolist()[0] == 1
    assert np.asarray(p.container).tolist() == [1, 16]
    assert np.asarray(o.custkey).tolist() == [3, 4]
    # customer 3 (BUILDING) ⋈ order 1 (custkey 3, before 1995-03-15) ⋈
    # lineitem 1 (ships after 1995-03-16) → exactly one row
    r = tpch_q3(c, o, l)
    assert r.matches == 1


def test_native_generators_match_contract():
    from aqp_tpu.data.native import gen_pk_host, gen_fk_host, gen_zipf_host

    pk = gen_pk_host(10000, 1)
    assert sorted(pk.tolist()) == list(range(1, 10001))
    fk = gen_fk_host(25000, 10000, 2)
    assert np.array_equal(np.sort(fk[:10000]), np.arange(1, 10001))
    assert len(np.unique(fk[20000:])) == 5000
    z = gen_zipf_host(10000, 1000, 1.5, 3)
    assert z.min() >= 1 and z.max() <= 1000
