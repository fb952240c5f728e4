"""Golden-parity tests against the compiled reference binary.

Skipped unless /tmp/refbuild/Release/panSVR exists (build it with
tools/build_reference.sh). These are the bit-exactness harness demanded by
BASELINE.json ("VCF-equal to panSVR").
"""

import os
import subprocess

import pytest

PANSVR_BIN = "/tmp/refbuild/Release/panSVR"
DEBGA_BIN = "/tmp/refbuild/deBGA_release/deBGA"


@pytest.fixture(scope="session")
def pansvr_bin():
    if not os.path.exists(PANSVR_BIN):
        pytest.skip("reference binary not built (run tools/build_reference.sh)")
    return PANSVR_BIN


@pytest.fixture(scope="session")
def debga_bin():
    if not os.path.exists(DEBGA_BIN):
        pytest.skip("deBGA binary not built (run tools/build_reference.sh)")
    return DEBGA_BIN


def run_ref(args, **kw):
    return subprocess.run(args, capture_output=True, **kw)
