"""On-chip timing probe for the DP size classes (fetch-timed, axon-safe).

Measures the Pallas extd2+traceback program per class shape at the
bench's chunk sizes, plus the fused front program, to locate the
per-batch device wall. Run with nothing else on the chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from pansvr_tpu.align.engine import _device_dp_pallas
from pansvr_tpu.ops.extd2_jax import Extd2Params

P = Extd2Params(match=2, mismatch=-12, q=16, e=1, q2=32, e2=0, w=200,
                zdrop=400)

rng = np.random.default_rng(0)


def timed(fn, n=5):
    fn()  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        buf = fn()
        np.asarray(buf)  # fetch = sync (block_until_ready lies on axon)
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]


def dp_class(cq, ct, W, B, fill_q, fill_t):
    qc = rng.integers(0, 4, size=(B, cq)).astype(np.int32)
    tc = rng.integers(0, 4, size=(B, ct)).astype(np.int32)
    ql = np.full(B, fill_q, np.int32)
    tl = np.full(B, fill_t, np.int32)
    return lambda: _device_dp_pallas(qc, ql, tc, tl, params=P, W=W,
                                     interpret=False)


CASES = [
    ("32x48 W48 B2048", 32, 48, 48, 2048, 14, 29),
    ("48x64 W64 B1024", 48, 64, 64, 1024, 14, 29),
    ("48x64 W64 B4096", 48, 64, 64, 4096, 14, 29),
    ("48x64 W64 B512", 48, 64, 64, 512, 14, 29),
    ("96x128 W128 B512", 96, 128, 128, 512, 60, 90),
    ("empty-dispatch f(x)=x+1 on (2048,)", 0, 0, 0, 0, 0, 0),
]

import jax.numpy as jnp
trivial = jax.jit(lambda x: x + 1)
x0 = np.zeros(2048, np.int32)
for name, cq, ct, W, B, fq, ft in CASES:
    if cq == 0:
        fn = lambda: trivial(x0)
    else:
        fn = dp_class(cq, ct, W, B, fq, ft)
    lo, med = timed(fn)
    print(f"{name}: min {lo*1e3:.1f} ms, med {med*1e3:.1f} ms", flush=True)
