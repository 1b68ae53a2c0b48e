"""dbgen-conformant generator → binary store → loaders → query parity."""

import jax.numpy as jnp

from aqp_tpu.data import tpch_dbgen, tpch_loader
from aqp_tpu.queries import tpch_q3, tpch_q12, tpch_q19
from aqp_tpu.queries import filters as F
from aqp_tpu.queries.fused import tpch_q3_fused, tpch_q12_fused, \
    tpch_q19_fused


def _sel(mask):
    return float(jnp.mean(mask.astype(jnp.float32)))


def test_dbgen_store_loads_and_queries(tmp_path):
    base = tmp_path / "scale"
    tpch_dbgen.generate(0.005, base)
    l = tpch_loader.load_lineitem(base)
    o = tpch_loader.load_orders(base)
    c = tpch_loader.load_customer(base)
    p = tpch_loader.load_part(base)
    # dbgen layout facts: sparse orderkeys (8 per 32-block), dense custkey
    assert int(o.key.max()) > o.num_tuples  # sparse
    assert int(c.key.max()) == c.num_tuples  # dense
    # spec-derived selectivities (generous windows; dbgen-faithful codes)
    assert 0.15 < _sel(F.q3_mask_customer(c)[0]) < 0.25
    assert 0.02 < _sel(F.q10_mask_orders(o)[0]) < 0.06
    assert 0.001 < _sel(F.q12_mask_lineitem(l)[0]) < 0.02
    assert 0.02 < _sel(F.q19_mask_lineitem(l)[0]) < 0.07
    # staged == fused on the same disk tables
    rs = tpch_q3(c, o, l, algorithm="RHO")
    m, ok = tpch_q3_fused(c, o, l)
    assert bool(ok) and int(m) == int(rs.matches) > 0
    rs = tpch_q12(l, o, algorithm="RHO")
    m, ok = tpch_q12_fused(l, o)
    assert bool(ok) and int(m) == int(rs.matches) > 0
    rs = tpch_q19(l, p, algorithm="RHO")
    m, ok = tpch_q19_fused(l, p)
    assert bool(ok) and int(m) == int(rs.matches)
