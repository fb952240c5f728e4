"""On-chip kernel parity gate.

Default CI run (virtual CPU mesh): the sharded-DP shard_map program in
Pallas interpret mode vs the single-device kernel — the mesh+pallas
combination nothing else executes.

PANSVR_ONCHIP_TESTS=1 (conftest then leaves the real backend alone):
the COMPILED Mosaic kernels vs the scalar oracle on the actual chip:

    PANSVR_ONCHIP_TESTS=1 python -m pytest tests/test_onchip.py -q
"""

import os

import numpy as np
import pytest

from pansvr_tpu.ops.onchip_check import (
    ALN,
    _fuzz_pairs,
    check_sharded_dp,
    run_onchip_parity,
)

ONCHIP = bool(os.environ.get("PANSVR_ONCHIP_TESTS"))


@pytest.mark.skipif(not ONCHIP, reason="set PANSVR_ONCHIP_TESTS=1 to run "
                                       "against the real backend")
def test_onchip_compiled_parity():
    import jax

    out = run_onchip_parity(quick=False, interpret=False)
    print(f"[onchip] backend={jax.default_backend()} {out}")
    assert out["extd2_aln"] > 0 and out["extd2_sv"] > 0


def test_sharded_pallas_interpret_parity():
    """CPU-mesh CI leg: shard_map + Pallas(interpret) DP equals the
    single-device program bit-for-bit across 8 virtual devices."""
    rng = np.random.default_rng(3)
    n = check_sharded_dp(_fuzz_pairs(rng, 12), ALN, interpret=True)
    assert n > 0, "expected the 8-device virtual mesh"
