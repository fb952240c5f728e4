"""De novo SV caller (the reference's `sv_calling` / NovaSV subsystem).

Behavioral re-implementation of src/NovaSVgenerateVCF (SveHandler +
NovaSVRst, SURVEY.md §3.6/§8.4): scan the genome in blocks, collect
discordant-pair (DR) and soft-clip (SH) signal evidence per SV type,
cluster evidence, assemble the local reads with the word-ladder
assembler, align contigs back to the reference with the banded
dual-affine DP, extract breakpoints, genotype by breakpoint-spanning
support, and emit VCF records.

Scope notes vs the reference (round-1): DEL/INS/DUP resolved through
contig alignment; INV reported from orientation-cluster evidence with
breakpoint pairs but without repeat-mode assembly refinement; TRA/BND
inter-chromosomal pairing is collected but not emitted. The reference's
empirical breakpoint-probability cluster acceptance is replaced with a
min-support threshold.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..io.bam import BamReader, BamRecord
from ..io.vcf import VCFRecord
from ..ops import ksw2_ref
from ..utils import dna
from .assembler import AssemblyManager


@dataclass
class DeNovoOptions:
    block_size: int = 2_000_000       # RefHandler block (RefHandler.hpp:24)
    block_overlap: int = 1_000
    min_clip: int = 10
    min_support: int = 3
    min_sv_len: int = 30
    isize_min: int = 200
    isize_max: int = 600
    max_cluster_gap: int = 150
    min_mapq: int = 10
    window_pad: int = 400


@dataclass
class _Evidence:
    kind: str          # 'SH' | 'DR'
    sv_type: str       # DEL | INS | DUP | INV | UNKNOWN
    pos: int           # primary breakpoint estimate (0-based)
    pos2: int          # secondary breakpoint / mate position
    read: BamRecord


def _classify_pair(rec: BamRecord, o: DeNovoOptions) -> str | None:
    """DR signal typing (after SveHandler's DR rules, SveHandler.cpp:394):
    long insert -> DEL; short insert -> INS; everted orientation -> DUP;
    same-strand pair -> INV."""
    if rec.is_unmapped or rec.mate_unmapped or rec.tid != rec.mtid:
        return None
    isz = abs(rec.isize)
    same_dir = rec.is_reverse == rec.mate_reverse
    if same_dir:
        return "INV"
    # FR expected: fwd read has pos <= mpos; everted (RF) suggests DUP
    if not rec.is_reverse and rec.pos > rec.mpos:
        return "DUP"
    if rec.is_reverse and rec.pos < rec.mpos:
        return "DUP"
    if isz > o.isize_max + 200:
        return "DEL"
    if 0 < isz < max(o.isize_min - 100, rec.query_len + 10):
        return "INS"
    return None


class DeNovoCaller:
    def __init__(self, genome, opts: DeNovoOptions | None = None):
        self.genome = genome            # Faidx-like
        self.o = opts or DeNovoOptions()
        self.am = AssemblyManager()

    # ------------------------------------------------------------------
    def call_bam(self, bam_path: str) -> list[VCFRecord]:
        out: list[VCFRecord] = []
        with BamReader(bam_path) as rd:
            chroms = rd.header.ref_names
            buf: list[BamRecord] = []
            cur_tid = -1
            for rec in rd:
                if rec.is_secondary or rec.is_supplementary:
                    continue
                if rec.tid != cur_tid and buf:
                    out.extend(self._call_block(buf, chroms[cur_tid], chroms))
                    buf = []
                cur_tid = rec.tid
                if rec.tid < 0:
                    continue
                buf.append(rec)
                if len(buf) > 1 and (
                    buf[-1].pos - buf[0].pos > self.o.block_size
                ):
                    keep_from = buf[-1].pos - self.o.block_overlap
                    out.extend(self._call_block(buf, chroms[cur_tid], chroms))
                    buf = [r for r in buf if r.pos >= keep_from]
            if buf and cur_tid >= 0:
                out.extend(self._call_block(buf, chroms[cur_tid], chroms))
        # dedupe overlapping-block repeats
        seen = set()
        uniq = []
        for r in out:
            key = (r.chrom, r.pos1 // 20, r.sv_type)
            if key in seen:
                continue
            seen.add(key)
            uniq.append(r)
        return uniq

    # ------------------------------------------------------------------
    def _collect(self, reads: list[BamRecord]) -> list[_Evidence]:
        o = self.o
        ev: list[_Evidence] = []
        for rec in reads:
            if rec.is_unmapped or rec.mapq < o.min_mapq:
                continue
            # SH signals at clip boundaries (sve SH collection)
            if rec.soft_left >= o.min_clip:
                ev.append(_Evidence("SH", "UNKNOWN", rec.pos, rec.pos, rec))
            if rec.soft_right >= o.min_clip:
                ev.append(_Evidence("SH", "UNKNOWN", rec.end_pos, rec.end_pos, rec))
            t = _classify_pair(rec, o)
            if t is not None and rec.pos <= rec.mpos:
                ev.append(_Evidence("DR", t, rec.end_pos, rec.mpos, rec))
        ev.sort(key=lambda e: e.pos)
        return ev

    def _cluster(self, ev: list[_Evidence]):
        o = self.o
        clusters: list[list[_Evidence]] = []
        for e in ev:
            if clusters and e.pos - clusters[-1][-1].pos <= o.max_cluster_gap:
                clusters[-1].append(e)
            else:
                clusters.append([e])
        return [c for c in clusters if len(c) >= o.min_support]

    # ------------------------------------------------------------------
    def _call_block(self, reads: list[BamRecord], chrom: str,
                    chroms: list[str]) -> list[VCFRecord]:
        o = self.o
        ev = self._collect(reads)
        records: list[VCFRecord] = list(self._call_tra(reads, chrom, chroms))
        for cluster in self._cluster(ev):
            lo = min(e.pos for e in cluster) - o.window_pad
            hi = max(max(e.pos, e.pos2) for e in cluster) + o.window_pad
            lo = max(0, lo)
            dr_types = [e.sv_type for e in cluster if e.kind == "DR"]
            inv_votes = dr_types.count("INV")
            dup_votes = dr_types.count("DUP")

            region_reads = [
                r for r in reads
                if not r.is_unmapped and r.pos < hi and r.end_pos > lo
            ]
            if len(region_reads) < o.min_support:
                continue
            rec = self._assemble_and_resolve(
                cluster, region_reads, chrom, lo, hi
            )
            if rec is not None:
                records.append(rec)
            elif inv_votes >= o.min_support and inv_votes > dup_votes:
                bp1 = int(np.median([e.pos for e in cluster if e.sv_type == "INV"]))
                bp2 = int(np.median([e.pos2 for e in cluster if e.sv_type == "INV"]))
                if abs(bp2 - bp1) >= o.min_sv_len:
                    lo2, hi2 = sorted((bp1, bp2))
                    records.append(VCFRecord(
                        chrom=chrom, pos1=lo2 + 1, id=f"nova.INV.{lo2}",
                        ref=self.genome.fetch(chrom, lo2, lo2 + 1) or "N",
                        alts=["<INV>"], qual=".", filter="PASS",
                        info={"SVTYPE": "INV", "END": str(hi2 + 1),
                              "SVLEN": str(hi2 - lo2), "IMPRECISE": True},
                        format="GT:DP",
                        samples=[f"./.:{inv_votes}"],
                    ))
        return records

    # ------------------------------------------------------------------
    def _call_tra(self, reads, chrom, chroms):
        """Inter-chromosomal breakends (the reference's TRA sve type,
        sve.hpp:18-30): cluster pairs whose mates map to another
        chromosome by (mate chromosome, junction position, mate window)
        and emit paired-breakend BND records (IMPRECISE; breakpoint at
        the clip/fragment edge consensus)."""
        o = self.o
        cand = []
        for r in reads:
            if (r.is_unmapped or r.mate_unmapped or r.tid == r.mtid
                    or r.mtid < 0 or r.mapq < o.min_mapq):
                continue
            jpos = r.pos if r.is_reverse else r.end_pos
            cand.append((r.mtid, jpos, r.mpos, r))
        cand.sort(key=lambda t: (t[0], t[1]))
        clusters: list[list] = []
        for item in cand:
            if (clusters
                    and item[0] == clusters[-1][-1][0]
                    and item[1] - clusters[-1][-1][1] <= o.max_cluster_gap
                    and abs(item[2] - clusters[-1][-1][2]) <= 2 * o.isize_max):
                clusters[-1].append(item)
            else:
                clusters.append([item])
        for cl in clusters:
            if len(cl) < o.min_support:
                continue
            mtid = cl[0][0]
            bp0 = int(np.median([x[1] for x in cl]))
            mate_bp = int(np.median([x[2] for x in cl]))
            fwd = sum(1 for x in cl if not x[3].is_reverse)
            anchor0 = max(bp0 - 1, 0)
            anchor = self.genome.fetch(chrom, anchor0, anchor0 + 1) or "N"
            chrom2 = chroms[mtid]
            if fwd * 2 >= len(cl):        # junction extends rightward
                alt = f"{anchor}[{chrom2}:{mate_bp + 1}["
            else:
                alt = f"]{chrom2}:{mate_bp + 1}]{anchor}"
            yield VCFRecord(
                chrom=chrom, pos1=anchor0 + 1,
                id=f"nova.BND.{chrom}.{anchor0}",
                ref=anchor, alts=[alt], qual=".", filter="PASS",
                info={"SVTYPE": "BND", "CHR2": chrom2,
                      "END": str(mate_bp + 1), "IMPRECISE": True},
                format="GT:DP", samples=[f"./.:{len(cl)}"],
            )

    # ------------------------------------------------------------------
    def _resolve_ins_two_sided(self, cluster, chrom):
        """Insertions longer than a read leave one-sided clipped contigs
        that a single contig-vs-reference alignment cannot resolve. Mirror
        the reference's two-sided resolution: right-clip tails carry the
        insertion PREFIX (anchored at the breakpoint), left-clip heads
        carry the SUFFIX (end-anchored); column-vote each side, then
        overlap-join. No join -> IMPRECISE <INS> with a length floor."""
        o = self.o
        right = [e.read for e in cluster
                 if e.kind == "SH" and e.read.soft_right >= o.min_clip]
        left = [e.read for e in cluster
                if e.kind == "SH" and e.read.soft_left >= o.min_clip]
        if not right or not left:
            return None
        # an insertion clips BOTH flanks at ONE coordinate; a deletion
        # clips at two distant ones (and shows long-insert DR evidence)
        dr_del = sum(1 for e in cluster
                     if e.kind == "DR" and e.sv_type == "DEL")
        if dr_del >= o.min_support:
            return None

        def consensus(coords):
            best_bp = best_n = 0
            for c in set(coords):
                n = sum(1 for x in coords if abs(x - c) <= 10)
                if n > best_n or (n == best_n and c < best_bp):
                    best_bp, best_n = c, n
            return best_bp, best_n

        bp_r, n_r = consensus([r.end_pos for r in right])
        bp_l, n_l = consensus([r.pos for r in left])
        if abs(bp_r - bp_l) > 20:
            return None
        best_n = n_r + n_l
        if best_n < o.min_support:
            return None
        bp0 = bp_r
        tails = [r.seq[len(r.seq) - r.soft_right :]
                 for r in right if abs(r.end_pos - bp0) <= 10]
        heads = [r.seq[: r.soft_left]
                 for r in left if abs(r.pos - bp0) <= 10]

        def column_vote(parts, end_anchored):
            if not parts:
                return ""
            width = max(len(p) for p in parts)
            out = []
            for i in range(width):
                col = {}
                for p in parts:
                    if i < len(p):
                        ch = p[len(p) - 1 - i] if end_anchored else p[i]
                        col[ch] = col.get(ch, 0) + 1
                ch, n = max(col.items(), key=lambda kv: kv[1])
                if n < 2:
                    break
                out.append(ch)
            s = "".join(out)
            return s[::-1] if end_anchored else s

        pre = column_vote(tails, end_anchored=False)
        suf = column_vote(heads, end_anchored=True)
        ins_seq = None
        if pre and suf:
            for k in range(min(len(pre), len(suf)), 19, -1):
                if pre[len(pre) - k :] == suf[:k]:
                    ins_seq = pre + suf[k:]
                    break
        n_alt = best_n
        anchor0 = max(bp0 - 1, 0)
        anchor = self.genome.fetch(chrom, anchor0, anchor0 + 1) or "N"
        if ins_seq is not None and len(ins_seq) >= o.min_sv_len:
            info = {"SVTYPE": "INS", "END": str(bp0),
                    "SVLEN": str(len(ins_seq))}
            alt = anchor + ins_seq
        else:
            est = len(pre) + len(suf)
            if est < o.min_sv_len:
                return None
            info = {"SVTYPE": "INS", "END": str(bp0), "SVLEN": str(est),
                    "IMPRECISE": True}
            alt = "<INS>"
        return VCFRecord(
            chrom=chrom, pos1=anchor0 + 1, id=f"nova.INS.{anchor0}",
            ref=anchor, alts=[alt], qual=".", filter="PASS",
            info=info, format="GT:DP", samples=[f"./.:{n_alt}"],
        )

    # ------------------------------------------------------------------
    def _assemble_and_resolve(self, cluster, region_reads, chrom, lo, hi):
        o = self.o
        self.am.clear()
        self.am.set_normal_mode()
        # assemble ONLY the evidence reads (clipped + discordant), like the
        # reference's per-SVE assembly — padding with reference-haplotype
        # spanning reads dilutes the alt allele into mosaic contigs
        support_reads = []
        seen_ids = set()
        for e in cluster:
            if e.read.seq and id(e.read) not in seen_ids:
                seen_ids.add(id(e.read))
                support_reads.append(e.read)
        for r in support_reads[:300]:
            self.am.add_read(r.seq)
        contigs = self.am.assemble()
        if not contigs:
            return None
        contig = max(contigs, key=lambda c: len(c.seq))
        if len(contig.seq) < 60:
            return None

        ref_seq = self.genome.fetch(chrom, lo, hi)
        if len(ref_seq) < 60:
            return None
        q = dna.fill_n(dna.encode(contig.seq))
        t = dna.fill_n(dna.encode(ref_seq))
        ez = ksw2_ref.extd2(q, t, match=2, mismatch=-12, q=16, e=1,
                            q2=32, e2=0, w=500, zdrop=-1)
        # events must sit inside the evidence-cluster span: extension
        # alignment of a partial (one-sided) contig produces artifact
        # indels near the window edges that no clip/pair supports
        span_lo = min(e.pos for e in cluster) - 50 - lo
        span_hi = max(max(e.pos, e.pos2) for e in cluster) + 50 - lo
        # insertion-site signature: left- and right-clips pile at ONE
        # coordinate (a deletion clips at two, ~SVLEN apart). A one-sided
        # contig at such a site yields artifact deletions whose D op
        # jumps the unmatched insertion content — forbid DEL there.
        r_clips = [e.read.end_pos for e in cluster
                   if e.kind == "SH" and e.read.soft_right >= o.min_clip]
        l_clips = [e.read.pos for e in cluster
                   if e.kind == "SH" and e.read.soft_left >= o.min_clip]
        dr_del_votes = sum(1 for e in cluster
                           if e.kind == "DR" and e.sv_type == "DEL")
        ins_site = (
            len(r_clips) >= 2 and len(l_clips) >= 2
            and abs(int(np.median(r_clips)) - int(np.median(l_clips))) <= 20
            and dr_del_votes < o.min_support
        )

        def pick_sv(cigar):
            """Largest interior indel >= min_sv_len (edge ops are alignment
            offsets, not events — same rule as get_var's edge exclusion),
            restricted to the cluster-supported span."""
            best = None
            ref_pos = 0
            n = len(cigar)
            for ci, (op, ln) in enumerate(cigar):
                interior = 0 < ci < n - 1
                if interior and op == "I" and ln >= o.min_sv_len:
                    if (span_lo <= ref_pos <= span_hi
                            and (best is None or ln > best[2])):
                        best = ("INS", ref_pos, ln)
                elif interior and op == "D" and ln >= o.min_sv_len:
                    # a deletion's event interval [ref_pos, ref_pos+ln]
                    # ends at a clip consensus when the cluster holds only
                    # the right breakpoint's clips — overlap, not contain
                    if (not ins_site
                            and ref_pos <= span_hi and ref_pos + ln >= span_lo
                            and (best is None or ln > best[2])):
                        best = ("DEL", ref_pos, ln)
                if op in ("M", "D"):
                    ref_pos += ln
            return best

        best = pick_sv(ez.cigar)
        # try the reverse-complement contig too (clip clusters from the
        # minus strand)
        if best is None:
            ez2 = ksw2_ref.extd2((q[::-1] ^ 3), t, match=2, mismatch=-12,
                                 q=16, e=1, q2=32, e2=0, w=500, zdrop=-1)
            best = pick_sv(ez2.cigar)
            if best is not None:
                ez = ez2
                q = q[::-1] ^ 3
        if best is None:
            # single-contig alignment can't resolve insertions longer than
            # a read: fall back to two-sided clip assembly at the clip
            # consensus (the reference's BND-style INS resolution,
            # SveHandler assembly of left/right clip groups)
            return self._resolve_ins_two_sided(cluster, chrom)
        svt, off, ln = best
        bp0 = lo + off          # 0-based breakpoint (base before event)
        anchor0 = max(bp0 - 1, 0)
        anchor = self.genome.fetch(chrom, anchor0, anchor0 + 1) or "N"

        # genotype: alt allele = evidence reads (clips stop AT the
        # breakpoint, discordant mates flank it); ref allele = reads that
        # fully span the breakpoint without signal
        # (NovaSVRst::genotyping analog: ref-vs-contig allele balance)
        n_alt = len(support_reads)
        n_ref = 0
        for r in region_reads:
            if (r.pos + 10 < bp0 < r.end_pos - 10
                    and r.soft_left < o.min_clip and r.soft_right < o.min_clip
                    and abs(r.isize) <= o.isize_max + 200):
                n_ref += 1
        depth = n_alt + n_ref
        af = n_alt / max(depth, 1)
        gt = "1/1" if af > 0.75 else ("0/1" if af > 0.2 else "0/0")
        if n_alt < o.min_support:
            return None

        if svt == "DEL":
            ref_allele = anchor + self.genome.fetch(chrom, bp0, bp0 + ln)
            alt_allele = anchor
            svlen = -ln
            end = bp0 + ln
        else:
            # inserted sequence from the contig alignment
            q_pos = 0
            r_pos = 0
            ins_seq = ""
            for op, l2 in ez.cigar:
                if op == "M":
                    q_pos += l2
                    r_pos += l2
                elif op == "I":
                    if r_pos == off and l2 == ln:
                        ins_seq = dna.decode(q[q_pos : q_pos + l2])
                    q_pos += l2
                elif op == "D":
                    r_pos += l2
            if not ins_seq:
                return None
            ref_allele = anchor
            alt_allele = anchor + ins_seq
            svlen = ln
            end = bp0
        return VCFRecord(
            chrom=chrom, pos1=anchor0 + 1, id=f"nova.{svt}.{anchor0}",
            ref=ref_allele, alts=[alt_allele], qual=".", filter="PASS",
            info={"SVTYPE": svt, "END": str(end), "SVLEN": str(svlen)},
            format="GT:DP",
            samples=[f"{gt}:{depth}"],
        )
