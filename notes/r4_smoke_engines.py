"""TPU smoke test: every engine vs oracle at small scale, count+checksum,
keys-only, and materialize."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from aqp_tpu.config import JoinConfig  # noqa: E402
from aqp_tpu.data import create_relation_pk, create_relation_fk  # noqa: E402
from aqp_tpu.joins.api import run_join, JOIN_ALGORITHMS  # noqa: E402
from aqp_tpu.utils.timing import hard_sync  # noqa: E402

NR, NS = 1 << 17, 1 << 19
relR = create_relation_pk(NR, seed=7)
relS = create_relation_fk(NS, NR, seed=8)
hard_sync((relR.key, relS.key))

# oracle
rk = np.asarray(relR.key)
rp = np.asarray(relR.payload)
sk = np.asarray(relS.key)
sp = np.asarray(relS.payload)
pay_of = dict(zip(rk.tolist(), rp.tolist()))
o_matches = sum(1 for k in sk.tolist() if k in pay_of)
o_ck = np.uint32(0)
for k, p in zip(sk.tolist(), sp.tolist()):
    if k in pay_of:
        o_ck += np.uint32(pay_of[k]) + np.uint32(p)
print(f"oracle: matches={o_matches} ck={o_ck}", flush=True)

fails = []
algs = sys.argv[1:] or sorted(JOIN_ALGORITHMS)
for alg in algs:
    for mode in ("count", "keys", "mat"):
        cfg = JoinConfig(materialize=(mode == "mat"),
                         checksum=(mode != "keys"))
        t0 = time.perf_counter()
        try:
            res, t = run_join(relR, relS, alg, cfg)
            dt = time.perf_counter() - t0
            ok = int(res.matches) == o_matches
            if mode == "count":
                ok = ok and int(res.checksum) == int(o_ck)
            if mode == "mat":
                live = int(jnp.sum((res.key != -3).astype(jnp.int32)))
                ok = ok and live == o_matches
            status = "ok" if ok else "MISMATCH"
            if not ok:
                fails.append((alg, mode))
            print(f"{alg:8s} {mode:5s} {status} m={int(res.matches)} "
                  f"t={dt:.3f}s", flush=True)
        except Exception as e:
            fails.append((alg, mode))
            print(f"{alg:8s} {mode:5s} ERROR {str(e)[:160]}", flush=True)
print("FAILS:", fails, flush=True)
