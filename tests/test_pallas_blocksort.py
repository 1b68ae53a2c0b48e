"""Pallas block bitonic sort vs numpy, interpret mode on CPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from aqp_tpu.ops.pallas.blocksort import sort_blocks, BLOCK


@pytest.mark.parametrize("nblocks", [1, 2])
def test_block_sort_matches_numpy(nblocks):
    rng = np.random.default_rng(0)
    n = BLOCK * nblocks
    k = rng.integers(0, 1 << 30, n).astype(np.int32)
    p = rng.integers(0, 1 << 30, n).astype(np.int32)
    ok, op = sort_blocks(jnp.asarray(k), jnp.asarray(p), interpret=True)
    ok, op = np.asarray(ok), np.asarray(op)
    for b in range(nblocks):
        sl = slice(b * BLOCK, (b + 1) * BLOCK)
        order = np.argsort(k[sl], kind="stable")
        assert np.array_equal(ok[sl], k[sl][order]), f"block {b} keys"
        # pair integrity: multiset of pairs preserved
        got = sorted(zip(ok[sl].tolist(), op[sl].tolist()))
        exp = sorted(zip(k[sl].tolist(), p[sl].tolist()))
        assert got == exp, f"block {b} pairs"
