"""Our assembler vs the reference's built-in assembly_test: same ~70
hard-coded reads (extracted from the reference source at test time), the
reference binary prints its contig; ours must match it exactly."""

import os
import re
import subprocess

import pytest

SRC = "/root/reference/src/cpp_lib/Assembler/mantaAssembler.cpp"


def _reference_reads():
    reads = []
    with open(SRC) as fh:
        in_test = False
        for line in fh:
            if "void assembly_test" in line:
                in_test = True
            if in_test:
                m = re.search(r'emplace_back\(\s*"([ACGTN]+)"\)', line)
                if m:
                    reads.append(m.group(1))
                if "assembley()" in line:
                    break
    return reads


def test_assembler_matches_reference_smoke(pansvr_bin):
    reads = _reference_reads()
    assert len(reads) > 40, "failed to extract test reads from reference"

    res = subprocess.run(
        [pansvr_bin, "assembly_test"], capture_output=True, timeout=120
    )
    out = (res.stdout + res.stderr).decode()
    m = re.search(
        r"CONTIG size: \[(\d+)\] seedCount: \[(\d+)\] supportReads: \[(\d+)\]"
        r" ending_reason: \[(\d+) (\d+)\]seq:\n([ACGTN \n]+)", out
    )
    assert m, f"unexpected reference output: {out[:400]}"
    ref_len = int(m.group(1))
    ref_seed = int(m.group(2))
    ref_support = int(m.group(3))
    ref_seq = re.sub(r"[ \n]", "", m.group(6))[:ref_len]

    from pansvr_tpu.assembly.assembler import AssemblyManager

    am = AssemblyManager()
    am.set_normal_mode()
    for r in reads:
        am.add_read(r)
    contigs = am.assemble()
    assert contigs, "no contigs assembled"
    best = max(contigs, key=lambda c: len(c.seq))
    assert len(best.seq) == ref_len
    assert best.seq == ref_seq
    assert best.seed_read_count == ref_seed
    assert len(best.support_reads) == ref_support
