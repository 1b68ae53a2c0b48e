"""Correctness of the hybrid-layout network (interpret mode, CPU)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_platforms", "cpu")

from aqp_tpu.ops.pallas.netsort import (
    LANES, sort_pairs_hybrid, merge_runs_hybrid, nt_transpose)

rng = np.random.default_rng(0)

for W in (128, 256, 512):
    k = rng.integers(0, 1 << 30, (W, LANES), dtype=np.int32)
    p = rng.integers(0, 1 << 30, (W, LANES), dtype=np.int32)

    def kern(k_ref, p_ref, ok, op):
        a, b = sort_pairs_hybrid(k_ref[:], p_ref[:])
        ok[:] = a
        op[:] = b

    ok, op = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((W, LANES), jnp.int32)] * 2,
        interpret=True,
    )(jnp.asarray(k), jnp.asarray(p))
    ok, op = np.asarray(ok), np.asarray(op)
    flat_k = ok.reshape(-1)
    assert (np.diff(flat_k) >= 0).all(), f"W={W}: not sorted"
    # pair integrity: sorted (k,p) multiset equal to input multiset
    got = np.sort((ok.astype(np.int64) << 31) | op.astype(np.int64), axis=None)
    want = np.sort((k.astype(np.int64) << 31) | p.astype(np.int64), axis=None)
    assert (got == want).all(), f"W={W}: pairs scrambled"
    print(f"sort_pairs_hybrid W={W}: OK", flush=True)

# merge_runs_hybrid: runs of 8 rows presorted ascending
for W, run in ((256, 8), (512, 32)):
    k = rng.integers(0, 1 << 30, (W, LANES), dtype=np.int32)
    p = rng.integers(0, 1 << 30, (W, LANES), dtype=np.int32)
    # sort each run (numpy row-major element order)
    kf = k.reshape(W // run, run * LANES)
    pf = p.reshape(W // run, run * LANES)
    idx = np.argsort(kf, axis=1, kind="stable")
    kf = np.take_along_axis(kf, idx, axis=1)
    pf = np.take_along_axis(pf, idx, axis=1)
    k = kf.reshape(W, LANES)
    p = pf.reshape(W, LANES)

    def kern2(k_ref, p_ref, ok, op):
        a, b = merge_runs_hybrid(k_ref[:], p_ref[:], run, use_gather=False)
        ok[:] = a
        op[:] = b

    ok, op = pl.pallas_call(
        kern2,
        out_shape=[jax.ShapeDtypeStruct((W, LANES), jnp.int32)] * 2,
        interpret=True,
    )(jnp.asarray(k), jnp.asarray(p))
    ok, op = np.asarray(ok), np.asarray(op)
    assert (np.diff(ok.reshape(-1)) >= 0).all(), f"merge W={W}: not sorted"
    got = np.sort((ok.astype(np.int64) << 31) | op.astype(np.int64), axis=None)
    want = np.sort((k.astype(np.int64) << 31) | p.astype(np.int64), axis=None)
    assert (got == want).all(), f"merge W={W}: pairs scrambled"
    print(f"merge_runs_hybrid W={W} run={run}: OK", flush=True)

# nt_transpose is an involution
x = jnp.asarray(rng.integers(0, 100, (256, LANES), dtype=np.int32))
def kern3(x_ref, o_ref):
    o_ref[:] = nt_transpose(nt_transpose(x_ref[:]))
o = pl.pallas_call(kern3, out_shape=jax.ShapeDtypeStruct((256, LANES),
                                                         jnp.int32),
                   interpret=True)(x)
assert (np.asarray(o) == np.asarray(x)).all()
print("nt_transpose involution: OK", flush=True)
