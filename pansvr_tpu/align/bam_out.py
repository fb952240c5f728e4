"""Realigned-BAM emission: engine/host aligner results -> tagged records.

Mirrors single_end_handler::output_BAM (read_realignment.cpp:479-536):
flags, position, CIGAR, mate fields, and the tag vocabulary
AS/OS/OA/CS/SV/MV/XA/RC (samTag.hpp:11-20) that fc_sv parses back.
"""

from __future__ import annotations

from ..io.bam import (
    BamHeader,
    BamRecord,
    FMUNMAP,
    FREAD1,
    FREVERSE,
)
from .host_align import FORWARD, REVERSE, AlnResult, PEPairing, SingleEndState


def sv_tag_string(info) -> str:
    """SV_chr_info::vcf_print_string: ID_chrID?_st_len_TYPE_vcfid — we keep
    the chrom NAME in place of the original-header tid (self-describing)."""
    return (
        f"{info.new_ref_id}_{info.chrom}_{info.st_pos}_{info.length}_"
        f"{info.sv_type}_{info.vcf_id}"
    )


def make_bam_record(
    aligner,
    st: SingleEndState,
    name: str,
    seq: str,
    qual: str,
    is_first: bool,
    abs_isize: int,
    comment: str,
    header: BamHeader,
    primary: AlnResult | None,
    secondary: AlnResult | None,
    mate: AlnResult | None,
) -> BamRecord | None:
    if primary is None:
        return None
    r = primary
    flag = (FREAD1 if is_first else 0)
    if r.direction == REVERSE:
        flag |= FREVERSE
    has_mate = mate is not None
    if not has_mate:
        flag |= FMUNMAP

    if r.is_ori:
        chrom = (
            aligner.ori_chrom_names[r.chr_id]
            if 0 <= r.chr_id < len(aligner.ori_chrom_names) else "*"
        )
        sv_info = aligner.sv_of(mate) if (mate is not None and not mate.is_ori) else None
    else:
        sv_info = aligner.sv_of(r)
        chrom = sv_info.chrom if sv_info else "*"
    tid = header.name2id(chrom)

    rec = BamRecord(
        name=name,
        flag=flag,
        tid=tid,
        pos=r.ref_bg,
        mapq=r.mapq,
        cigar=list(r.cigar),
        seq=seq if r.direction == FORWARD else _revcomp(seq),
        qual=qual if r.direction == FORWARD else qual[::-1],
        isize=abs_isize if r.direction == FORWARD else -abs_isize,
    )
    if has_mate:
        if mate.is_ori:
            mchrom = (
                aligner.ori_chrom_names[mate.chr_id]
                if 0 <= mate.chr_id < len(aligner.ori_chrom_names) else "*"
            )
        else:
            msv = aligner.sv_of(mate)
            mchrom = msv.chrom if msv else "*"
        rec.mtid = header.name2id(mchrom)
        rec.mpos = mate.ref_bg
    rec.set_tag("AS", "i", r.align_score)
    rec.set_tag("OS", "i", st.ori.align_score)
    rec.set_tag(
        "OA", "Z",
        f"{st.ori.chr_id},{st.ori.ref_bg},{st.ori.read_bg},{st.ori.mapq},"
        f"{'U' if st.ori_unmapped else 'M'};",
    )
    if not r.is_ori:
        rec.set_tag("CS", "i", r.chain_score)
    if sv_info is not None:
        rec.set_tag("SV", "Z", sv_tag_string(sv_info))
    if mate is not None and not mate.is_ori:
        msv = aligner.sv_of(mate)
        if msv is not None:
            rec.set_tag("MV", "Z", sv_tag_string(msv))
    if secondary is not None:
        ssv = aligner.sv_of(secondary) if not secondary.is_ori else None
        rec.set_tag(
            "XA", "Z",
            f"{secondary.chr_id},{secondary.ref_bg},{secondary.read_bg},"
            f"{secondary.align_score},"
            f"{'F' if secondary.direction == FORWARD else 'R'},"
            f"{ssv.vcf_id if ssv else '*'};",
        )
    rec.set_tag("RC", "Z", comment)
    return rec


def emit_pair(aligner, pe: PEPairing, st1: SingleEndState, st2: SingleEndState,
              name: str, seq1: str, qual1: str, seq2: str, qual2: str,
              comment1: str, comment2: str, header: BamHeader):
    """PE pairing -> up to two BAM records (primary per end)."""
    out = []
    for is_first, st, primary, mate, seq, qual, comment in (
        (True, st1, pe.max_1, pe.max_2, seq1, qual1, comment1),
        (False, st2, pe.max_2, pe.max_1, seq2, qual2, comment2),
    ):
        secondary = None
        if primary is not None:
            if primary.is_ori and st.results:
                secondary = st.results[0]
            elif len(st.results) > 1 and not primary.is_ori:
                secondary = st.results[1] if primary.rst_idx == 0 else st.results[0]
        rec = make_bam_record(
            aligner, st, name, seq, qual, is_first, abs(pe.isize), comment,
            header, primary, secondary, mate,
        )
        if rec is not None:
            out.append(rec)
    return out


def _revcomp(seq: str) -> str:
    from ..utils import dna

    return dna.revcomp(seq)
