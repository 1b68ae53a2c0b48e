"""Tier-2 v2 pipeline correctness (interpret mode, CPU).

Validates the two-level DMA radix pipeline (ops/pallas/rho2.py) bit-exactly
against the XLA core (ops/mergejoin.py) on reference-shaped workloads:
dense-PK R x tiled-FK S (generator.cpp:351-512 semantics) and selectivity
variants.
"""

import jax.numpy as jnp
import pytest

from aqp_tpu.data import create_relation_fk, create_relation_fk_sel, create_relation_pk
from aqp_tpu.ops import mergejoin
from aqp_tpu.ops.pallas.rho2 import rho_join_count_v2


@pytest.mark.parametrize("nr,ns", [(5000, 20000), (40000, 40000)])
def test_v2_matches_xla_core(nr, ns):
    relR = create_relation_pk(nr, seed=7)
    relS = create_relation_fk(ns, nr, seed=8)
    ref = mergejoin.merge_join_count(relR.key, relR.payload, relS.key, relS.payload)
    m, c, ovf = rho_join_count_v2(
        relR.key, relR.payload, relS.key, relS.payload,
        sub=128, F1=2, interpret=True,
    )
    assert int(ovf) == 0
    assert int(m) == int(ref.matches) == ns
    assert int(c) == int(ref.checksum)


def test_v2_selectivity():
    nr, ns = 8000, 30000
    relR = create_relation_pk(nr, seed=3)
    relS = create_relation_fk_sel(ns, nr, 25.0, seed=4)
    ref = mergejoin.merge_join_count(relR.key, relR.payload, relS.key, relS.payload)
    m, c, ovf = rho_join_count_v2(
        relR.key, relR.payload, relS.key, relS.payload,
        sub=128, F1=4, interpret=True,
    )
    assert int(ovf) == 0
    assert int(m) == int(ref.matches)
    assert int(c) == int(ref.checksum)


def test_v2_overflow_detected():
    # all S keys equal: one region must overflow (adversarial skew)
    nr, ns = 4000, 120000
    relR = create_relation_pk(nr, seed=1)
    sk = jnp.full((ns,), 17, jnp.int32)
    sp = jnp.arange(ns, dtype=jnp.int32)
    m, c, ovf = rho_join_count_v2(
        relR.key, relR.payload, sk, sp, sub=128, F1=2, interpret=True
    )
    assert int(ovf) > 0  # caller must fall back
