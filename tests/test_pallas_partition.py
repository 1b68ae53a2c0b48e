"""Pallas partition kernels vs numpy, interpret mode."""

import numpy as np
import jax.numpy as jnp
import pytest

from aqp_tpu.ops.pallas.blocksort import KEY_PAD_INT, LANES
from aqp_tpu.ops.pallas.partition import sort_and_hist

SUB = 128
BLOCK = SUB * LANES


def test_sort_and_hist_interpret():
    rng = np.random.default_rng(1)
    n = BLOCK * 2
    F = 13  # arbitrary fanout (range partition)
    k = rng.integers(0, 1 << 20, n).astype(np.int32)
    k[-100:] = KEY_PAD_INT
    p = rng.integers(0, 1 << 30, n).astype(np.int32)
    maxk = int((k[k != KEY_PAD_INT] >> 1).max())
    scale = np.float32(F / (maxk + 1) * (1 - 1e-6))
    ok, op, starts = sort_and_hist(
        jnp.asarray(k), jnp.asarray(p), jnp.float32(scale), F, SUB,
        interpret=True,
    )
    ok, op, starts = np.asarray(ok), np.asarray(op), np.asarray(starts)
    for b in range(2):
        sl = slice(b * BLOCK, (b + 1) * BLOCK)
        kb, pb = k[sl], p[sl]
        order = np.argsort(kb, kind="stable")
        assert np.array_equal(ok[sl], kb[order])
        got = sorted(zip(ok[sl].tolist(), op[sl].tolist()))
        exp = sorted(zip(kb.tolist(), pb.tolist()))
        assert got == exp
        # starts = first ROW (128-element groups) whose leading element has
        # bucket >= f
        skb = ok[sl]
        bucket = np.where(
            skb == KEY_PAD_INT,
            F,
            np.minimum((((skb >> 1).astype(np.float32)) * scale).astype(np.int32), F - 1),
        )
        lead = bucket[::128]
        expected = np.searchsorted(lead, np.arange(F + 1))
        assert np.array_equal(starts[b], expected), b
