"""fc_aln process-per-shard fan-out: merged BAM equals the unsharded
run record-for-record (VERDICT r4 #4: shard the aln host glue)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from pansvr_tpu.anchor.builder import AnchorConfig, build_anchor_contigs
from pansvr_tpu.index.builder import build_index
from pansvr_tpu.index.store import save_index
from pansvr_tpu.io.bam import BamReader
from pansvr_tpu.io.fasta import write_fasta
from pansvr_tpu.parallel.aln_shard import (
    merge_bam_shards, run_aln_fanout, split_signal_fastq)
from pansvr_tpu.utils.simulate import DictGenome, make_dataset


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("alnshard")
    ds = make_dataset(seed=21, n_sv=8, n_pairs=400, types=("DEL", "INS"),
                      chrom_lengths={"chr1": 150_000})
    contigs = list(build_anchor_contigs(
        ds.vcf_records, DictGenome(ds.genome), AnchorConfig()))
    idx = build_index([(c.name, c.seq) for c in contigs],
                      first_level_bases="auto")
    save_index(idx, str(d / "rdbg"))
    # signal fastq via the pipeline's extractor
    from pansvr_tpu.utils.simulate import write_sim_bam
    from pansvr_tpu.signal.extract import SignalOptions, extract_signal

    write_sim_bam(ds, str(d / "sim.bam"))
    with open(d / "signal.fq", "w") as fh:
        stats = extract_signal(
            str(d / "sim.bam"), fh,
            opts=SignalOptions(discard_both_full_match=True,
                               not_using_filter=True))
    with open(d / "status.sam", "w") as fh:
        fh.write(stats.status_file_text())
    with open(d / "header.sam", "w") as fh:
        fh.write("@HD\tVN:1.6\tSO:coordinate\n")
        for c, s in ds.genome.items():
            fh.write(f"@SQ\tSN:{c}\tLN:{len(s)}\n")
    return d


def _records(path):
    return [(r.name, r.flag, r.tid, r.pos, r.mapq, tuple(r.cigar),
             tuple(map(tuple, r.tags))) for r in BamReader(path)]


def test_split_pairs_preserved(world):
    d = world
    shards = split_signal_fastq(str(d / "signal.fq"), str(d / "sp"), 3)
    n_orig = sum(1 for _ in open(d / "signal.fq")) // 4 // 2 * 2
    n_split = sum(sum(1 for _ in open(s)) // 4 for s in shards)
    assert n_split == n_orig          # pair-aligned, trailing odd dropped
    for s in shards:
        assert (sum(1 for _ in open(s)) // 4) % 2 == 0


def test_fanout_matches_unsharded(world):
    d = world
    env = {"JAX_PLATFORMS": "cpu"}
    # unsharded reference run
    cmd = [sys.executable, "-m", "pansvr_tpu", "fc_aln",
           "-o", str(d / "whole.bam"), "-b", "256",
           "-r", str(d / "status.sam"),
           str(d / "rdbg"), str(d / "signal.fq"), str(d / "header.sam")]
    e = dict(os.environ)
    e.update(env)
    subprocess.run(cmd, check=True, env=e, capture_output=True)
    run_aln_fanout(str(d / "rdbg"), str(d / "signal.fq"),
                   str(d / "header.sam"), str(d / "sharded.bam"),
                   n_shards=3, status_file=str(d / "status.sam"),
                   batch=256, worker_env=env)
    a = _records(str(d / "whole.bam"))
    b = _records(str(d / "sharded.bam"))
    assert len(a) > 0
    assert a == b
