import os
import subprocess

import pytest

from pansvr_tpu.anchor.builder import AnchorConfig, run_anchor_ref
from pansvr_tpu.io.fasta import Faidx, write_fasta
from pansvr_tpu.io.vcf import VCFWriter, minimal_header
from pansvr_tpu.utils.simulate import make_dataset


@pytest.mark.parametrize("types", [("DEL",), ("INS",), ("DEL", "INS", "DUP")])
def test_anchor_fasta_byte_identical(tmp_path, pansvr_bin, types):
    ds = make_dataset(seed=hash(types) % 1000, n_sv=12, n_pairs=0, types=types)
    genome_fa = str(tmp_path / "genome.fa")
    vcf = str(tmp_path / "svs.vcf")
    write_fasta(genome_fa, ds.genome.items(), width=60)
    w = VCFWriter(vcf, minimal_header([(c, len(s)) for c, s in ds.genome.items()]))
    for r in ds.vcf_records:
        w.write(r)
    w.close()

    ours = str(tmp_path / "anchors.fa")
    with open(ours, "w") as fh:
        run_anchor_ref(vcf, Faidx(genome_fa), fh, AnchorConfig())

    theirs = str(tmp_path / "ref_anchors.fa")
    with open(theirs, "w") as fh:
        subprocess.run(
            [pansvr_bin, "fc_anchor_ref", genome_fa, vcf],
            stdout=fh, stderr=subprocess.DEVNULL, check=True,
        )
    assert open(ours).read() == open(theirs).read()
