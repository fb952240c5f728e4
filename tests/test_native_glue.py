"""Native engine glue (native/engine_glue.cpp) vs the pure-Python
collect/replay path: SingleEndState results must be bit-identical.

Skipped when the library is not built (tools/build_native.sh)."""

import numpy as np
import pytest

from pansvr_tpu.align import native_glue
from pansvr_tpu.align.engine import AlignEngine, EngineConfig
from pansvr_tpu.align.host_align import OriResult
from pansvr_tpu.anchor.builder import AnchorConfig, build_anchor_contigs
from pansvr_tpu.index.builder import build_index
from pansvr_tpu.utils.simulate import DictGenome, make_dataset

pytestmark = pytest.mark.skipif(
    not native_glue.available(), reason="native glue library not built")


def _key(results):
    return [
        (r.direction, r.chain_score, r.align_score, r.read_bg, r.ref_bg,
         r.sv_id, r.mapq, r.rst_idx, tuple(r.cigar))
        for r in results
    ]


def test_native_glue_matches_python_path():
    ds = make_dataset(seed=321, n_sv=24, n_pairs=1200, types=("DEL", "INS"),
                      chrom_lengths={"chr1": 600_000}, err_rate=0.004)
    contigs = list(build_anchor_contigs(
        ds.vcf_records, DictGenome(ds.genome), AnchorConfig()))
    idx = build_index([(c.name, c.seq) for c in contigs],
                      first_level_bases=12)
    seqs = []
    for r in ds.reads:
        seqs.append(r.seq1)
        seqs.append(r.seq2)
    oris = [OriResult(unmapped=True)] * len(seqs)
    B = 1024
    eng_n = AlignEngine(idx, ori_chrom_names=list(ds.genome),
                        config=EngineConfig(dp_backend="scan",
                                            native_glue=True))
    eng_p = AlignEngine(idx, ori_chrom_names=list(ds.genome),
                        config=EngineConfig(dp_backend="scan",
                                            native_glue=False))
    assert eng_n._glue_lib is not None
    st_n = eng_n.align_batch(seqs[:B], oris[:B])
    st_p = eng_p.align_batch(seqs[:B], oris[:B])
    n_with = 0
    for a, b in zip(st_n, st_p):
        assert _key(a.results) == _key(b.results)
        n_with += bool(b.results)
    assert n_with > B // 4  # the batch actually aligned things
