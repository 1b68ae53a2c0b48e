import sys; sys.path.insert(0, "/root/repo")
"""Probe: which dynamic gather forms lower in Pallas TPU on this toolchain?

Each candidate compiles a tiny kernel; prints OK/FAIL + correctness.
"""
import os
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=100000")
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, L = 64, 128
x = (jnp.arange(S * L, dtype=jnp.int32) * 7 + 3).reshape(S, L) % 1000
# per-(row,lane) lane index to gather: reverse lanes
idx_lane = jnp.broadcast_to((L - 1 - jnp.arange(L, dtype=jnp.int32))[None, :], (S, L))
# per-(row,lane) sublane index: reverse rows
idx_sub = jnp.broadcast_to((S - 1 - jnp.arange(S, dtype=jnp.int32))[:, None], (S, L))


def run(name, kernel, want):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
        )(x, idx_lane if "lane" in name else idx_sub)
        ok = bool(jnp.all(out == want))
        print(f"{name:45s} LOWERED  correct={ok}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"{name:45s} FAIL: {msg}", flush=True)


# 1. take_along_axis along lanes (axis=1)
def k_taa_lane(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

run("take_along_axis lane(axis=1)", k_taa_lane, x[:, ::-1])

# 2. take_along_axis along sublanes (axis=0)
def k_taa_sub(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

run("take_along_axis sub(axis=0)", k_taa_sub, x[::-1, :])

# 3. flat 1-D gather via jnp.take on a flat ref
def k_take_flat_lane(x_ref, i_ref, o_ref):
    v = x_ref[:].reshape(1, S * L)
    ii = i_ref[:].reshape(1, S * L)
    o_ref[:] = jnp.take_along_axis(v, ii, axis=1).reshape(S, L)

run("flat take_along_axis lane(1,S*L)", k_take_flat_lane, None) if False else None

# 4. lax.gather-style x[idx] advanced indexing along axis 0
def k_adv_sub(x_ref, i_ref, o_ref):
    o_ref[:] = x_ref[:][i_ref[:], jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)]

run("advanced-index sub", k_adv_sub, x[::-1, :])

# 5. dynamic_slice with traced scalar start (per-block, from SMEM) — known OK
# 6. one-hot matmul fallback exists anyway.

# 7. lax.sort inside kernel?
def k_sort(x_ref, i_ref, o_ref):
    o_ref[:] = jax.lax.sort(x_ref[:], dimension=1)

try:
    out = pl.pallas_call(k_sort, out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32))(x, idx_lane)
    print("lax.sort lane                              LOWERED correct=",
          bool(jnp.all(out == jnp.sort(x, axis=1))), flush=True)
except Exception as e:
    print("lax.sort lane                              FAIL:", str(e).split("\n")[0][:110], flush=True)
print("done", flush=True)
