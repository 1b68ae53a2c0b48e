"""Skew-aware distributed join vs single-device oracle (8-device CPU mesh).

The reference's skew study (paper-revision-9-skew.py, data/skew.csv) shows
RHO collapsing 1441→405 M rec/s at Zipf z=1.5; the TPU design handles skew
structurally: heavy probe keys are detected exactly, their build rows are
replicated, and only light rows ride the hash all_to_all.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from aqp_tpu.data import create_relation_pk, create_relation_zipf
from aqp_tpu.ops import mergejoin
from aqp_tpu.parallel.mesh import shard_relation
from aqp_tpu.parallel.skew import make_dist_join_count_skew


def _mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), ("shard",))


def test_skew_join_matches_oracle_zipf():
    nr, ns = 1 << 12, 1 << 14
    relR = create_relation_pk(nr, seed=5)
    relS = create_relation_zipf(ns, nr, 1.5, seed=6)
    ref = mergejoin.merge_join_count(
        relR.key, relR.payload, relS.key, relS.payload
    )
    mesh = _mesh()
    R = shard_relation(relR, mesh, "shard")
    S = shard_relation(relS, mesh, "shard")
    fn = make_dist_join_count_skew(
        mesh, nr // 8, ns // 8, axis="shard", safety=3.0, cap_heavy=ns
    )
    m, c, ovf = fn(R.key, R.payload, S.key, S.payload)
    assert int(ovf) == 0
    assert int(m) == int(ref.matches)
    assert int(c) == int(ref.checksum)


def test_skew_join_uniform_unaffected():
    from aqp_tpu.data import create_relation_fk

    nr, ns = 1 << 12, 1 << 14
    relR = create_relation_pk(nr, seed=1)
    relS = create_relation_fk(ns, nr, seed=2)
    mesh = _mesh()
    R = shard_relation(relR, mesh, "shard")
    S = shard_relation(relS, mesh, "shard")
    fn = make_dist_join_count_skew(mesh, nr // 8, ns // 8, safety=3.0)
    m, c, ovf = fn(R.key, R.payload, S.key, S.payload)
    assert int(ovf) == 0
    assert int(m) == ns
