"""Pallas scan kernels vs XLA scan ops (interpret mode, CPU)."""

import jax.numpy as jnp
import numpy as np

from aqp_tpu.ops import scan as xscan
from aqp_tpu.ops.pallas import scan as pscan

N = pscan.LANES * 256 * 2  # two blocks at sub=256


def _col():
    return (jnp.arange(N, dtype=jnp.int32) * 37 % 251).astype(jnp.uint8)


def test_count_sum():
    col = _col()
    lo, hi = jnp.uint8(30), jnp.uint8(200)
    assert int(pscan.scan_count_pallas(col, lo, hi, sub=256, interpret=True)) == int(
        xscan.scan_count(col, lo, hi)
    )
    assert int(pscan.scan_sum_pallas(col, lo, hi, sub=256, interpret=True)) == int(
        xscan.scan_sum(col, lo, hi)
    )


def test_bitvector():
    col = _col()
    lo, hi = jnp.uint8(10), jnp.uint8(99)
    got = np.asarray(pscan.scan_bitvector_pallas(col, lo, hi, sub=256, interpret=True))
    exp = np.asarray(xscan.scan_bitvector(col, lo, hi))
    assert got.shape == exp.shape
    assert (got == exp).all()
