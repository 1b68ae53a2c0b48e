"""Pallas partition pipeline kernels vs numpy, interpret mode."""

import numpy as np
import jax.numpy as jnp
import pytest

from aqp_tpu.ops.pallas.blocksort import BLOCK, KEY_PAD
from aqp_tpu.ops.pallas.partition import sort_and_hist


def test_sort_and_hist_interpret():
    rng = np.random.default_rng(1)
    n = BLOCK
    k = rng.integers(0, 1 << 20, n).astype(np.int32)
    k[-100:] = int(KEY_PAD)  # pad rows
    p = rng.integers(0, 1 << 30, n).astype(np.int32)
    shift, bits = 12, 8
    ok, op, starts = sort_and_hist(
        jnp.asarray(k), jnp.asarray(p), shift, bits, interpret=True
    )
    ok, op, starts = np.asarray(ok), np.asarray(op), np.asarray(starts)
    order = np.argsort(k, kind="stable")
    assert np.array_equal(ok, k[order])
    got = sorted(zip(ok.tolist(), op.tolist()))
    exp = sorted(zip(k.tolist(), p.tolist()))
    assert got == exp
    # starts = lower bounds of each bucket in the sorted block
    bucket = np.where(ok == int(KEY_PAD), 1 << bits, (ok >> shift) & ((1 << bits) - 1))
    expected_starts = np.searchsorted(bucket, np.arange((1 << bits) + 1))
    assert np.array_equal(starts[0], expected_starts)
