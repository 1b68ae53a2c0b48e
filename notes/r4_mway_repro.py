"""Reproduce the MWAY headline-scale error (VERDICT r3 item 2)."""
import sys
import traceback

import jax

sys.path.insert(0, "/root/repo")

from aqp_tpu.data import create_relation_pk, create_relation_fk  # noqa: E402
from aqp_tpu.joins.api import run_join  # noqa: E402

NR, NS = 13_107_200, 52_428_800
relR = create_relation_pk(NR, seed=1)
relS = create_relation_fk(NS, NR, seed=2)
jax.block_until_ready((relR.key, relS.key))
print("generated", flush=True)
try:
    res, t = run_join(relR, relS, "MWAY")
    print("MWAY ok:", int(res.matches), t.phases, flush=True)
except Exception:
    traceback.print_exc()
