"""Shared helpers for join engines: result assembly and capacity planning."""

from __future__ import annotations

import jax.numpy as jnp

from aqp_tpu.config import JoinConfig
from aqp_tpu.relation import Relation, JoinResult
from aqp_tpu.ops.mergejoin import JoinCounts, JoinMaterialized


def result_capacity(relS: Relation, cfg: JoinConfig) -> int:
    """Materialization capacity: |S| rounded up — with a unique-key build side
    each S row matches at most once (the reference preallocates |S|·1.2 for
    its chunked tables, radix_join.cpp:1465-1476; exact bound here)."""
    n = relS.num_tuples
    return max(128, -(-n // 128) * 128)


def to_join_result(out) -> JoinResult:
    if isinstance(out, JoinCounts):
        return JoinResult(matches=out.matches, checksum=out.checksum)
    if isinstance(out, JoinMaterialized):
        return JoinResult(
            matches=out.matches,
            checksum=out.checksum,
            key=out.key,
            r_payload=out.r_payload,
            s_payload=out.s_payload,
        )
    raise TypeError(type(out))
