"""Diagnose the chrom-scale BUDGET/seed-slot overflow (VERDICT r4 #1).

Builds the same 100 Mbp / 2,000-SV world as tools/chrom_scale_run.py but
with a small read count, runs ONE engine batch on CPU, and prints the
overflow anatomy: per-row hit counts, per-seed entry counts, merged-run
pos_n, expanded-seed totals — the numbers that decide M/S/K budgets.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

W = "/tmp/pansvr_diag_scale"
N_SV = int(os.environ.get("DIAG_NSV", "2000"))
N_PAIRS = int(os.environ.get("DIAG_NPAIRS", "20000"))
CHROM_LENGTHS = {"chr1": 60_000_000, "chr2": 40_000_000}


def build_world():
    os.makedirs(W, exist_ok=True)
    tag = f"{W}/.done_{N_SV}_{N_PAIRS}"
    if os.path.exists(tag):
        return
    from pansvr_tpu.utils.simulate import make_dataset, write_sim_bam
    from pansvr_tpu.io.fasta import write_fasta
    from pansvr_tpu.io.vcf import VCFWriter, minimal_header

    t0 = time.time()
    ds = make_dataset(seed=99, n_sv=N_SV, n_pairs=N_PAIRS,
                      types=("DEL", "INS", "DUP"),
                      chrom_lengths=CHROM_LENGTHS, err_rate=0.01)
    print(f"[diag] dataset {time.time()-t0:.1f}s", flush=True)
    write_fasta(f"{W}/genome.fa", ds.genome.items(), width=60)
    w = VCFWriter(f"{W}/svs.vcf",
                  minimal_header([(c, len(s)) for c, s in ds.genome.items()]))
    [w.write(r) for r in ds.vcf_records]
    w.close()
    with open(f"{W}/header.sam", "w") as fh:
        fh.write("@HD\tVN:1.6\tSO:coordinate\n")
        for c, s in ds.genome.items():
            fh.write(f"@SQ\tSN:{c}\tLN:{len(s)}\n")
    write_sim_bam(ds, f"{W}/sim.bam")

    from pansvr_tpu.anchor.builder import run_anchor_ref
    from pansvr_tpu.io.fasta import Faidx
    t0 = time.time()
    run_anchor_ref(f"{W}/svs.vcf", Faidx(f"{W}/genome.fa"),
                   open(f"{W}/anchors.fa", "w"))
    print(f"[diag] anchors {time.time()-t0:.1f}s "
          f"({os.path.getsize(f'{W}/anchors.fa')/1e6:.1f} MB)", flush=True)

    from pansvr_tpu.signal.extract import SignalOptions, extract_signal
    t0 = time.time()
    with open(f"{W}/signal.fq", "w") as fh:
        stats = extract_signal(
            f"{W}/sim.bam", fh,
            opts=SignalOptions(discard_both_full_match=True,
                               not_using_filter=True))
    with open(f"{W}/status.sam", "w") as fh:
        fh.write(stats.status_file_text())
    print(f"[diag] signal {time.time()-t0:.1f}s", flush=True)
    open(tag, "w").write("ok")


def build_index():
    import pickle
    pkl = f"{W}/rdbg_{N_SV}.pkl"
    if os.path.exists(pkl):
        return pickle.load(open(pkl, "rb"))
    from pansvr_tpu.index.builder import build_index
    from pansvr_tpu.io.fasta import read_fasta
    t0 = time.time()
    contigs = list(read_fasta(f"{W}/anchors.fa").items())
    idx = build_index(contigs, first_level_bases=14)
    print(f"[diag] index {time.time()-t0:.1f}s n_kmers={idx.n_kmers} "
          f"n_uni={len(idx.uni_seqf)-1}", flush=True)
    with open(pkl, "wb") as fh:
        pickle.dump(idx, fh)
    return idx


def main():
    build_world()
    idx = build_index()

    from pansvr_tpu.align.engine import AlignEngine, EngineConfig
    from pansvr_tpu.align import native_glue
    # read the signal fastq manually (interleaved pairs)
    seqs, comments = [], []
    with open(f"{W}/signal.fq") as fh:
        while True:
            h = fh.readline()
            if not h:
                break
            s = fh.readline().strip()
            fh.readline()
            fh.readline()
            name_comment = h[1:].rstrip("\n").split(" ", 1)
            seqs.append(s)
            comments.append(name_comment[1] if len(name_comment) > 1 else "")
    print(f"[diag] {len(seqs)} signal reads", flush=True)

    B = min(4096, len(seqs) // 2 * 2)
    seqs = seqs[:B]
    comments = comments[:B]

    oris = native_glue.parse_comments(comments)
    assert oris is not None

    eng = AlignEngine(idx, config=EngineConfig())
    prep = eng._prep_batch(seqs, oris)

    # ---- run the front manually with diagnostics ----
    import jax
    from pansvr_tpu.ops.seeding import (
        seed_reads_flat, merge_expand_device3, UNI_POS_N_MAX)
    words = prep["words"]; lens2 = prep["lens2"]; mask2 = prep["mask2"]
    S0 = prep["S0"]; L = prep["L"]
    print(f"[diag] read class L={L} S0={S0} rows={words.shape[0]}",
          flush=True)
    didx = eng.didx
    found, count, left = seed_reads_flat(
        didx, words, lens2, mask2, S0=S0, M=32, probe="bisect",
        stop_after="probe")
    found = np.asarray(found); count = np.asarray(count)
    row_hits = np.where(found, count, 0).sum(axis=1)
    cnt_all = count[np.asarray(found)]
    print(f"[diag] per-seed entry count: med={np.median(cnt_all):.0f} "
          f"p90={np.percentile(cnt_all,90):.0f} "
          f"p99={np.percentile(cnt_all,99):.0f} max={cnt_all.max()}",
          flush=True)
    # how many seeds are SKIPPED for count > UNI_POS_N_MAX (ref: skip)
    raw_over = (count > UNI_POS_N_MAX).sum()
    print(f"[diag] seeds with count>{UNI_POS_N_MAX} (ref skips): "
          f"{raw_over} of {found.size}", flush=True)
    print(f"[diag] row_hits (pre-coverage-skip): med={np.median(row_hits):.0f} "
          f"p90={np.percentile(row_hits,90):.0f} max={row_hits.max()} "
          f">32: {(row_hits>32).mean()*100:.1f}% "
          f">64: {(row_hits>64).mean()*100:.1f}% "
          f">128: {(row_hits>128).mean()*100:.1f}%", flush=True)

    # full front at M=128 to get the merged/expanded stats
    M = 128
    sb = seed_reads_flat(didx, words, lens2, mask2, S0=S0, M=M,
                         probe="bisect")
    es = merge_expand_device3(sb, didx, S=128)
    nov = np.asarray(sb.n_overflow)
    ndrop = np.asarray(es.n_dropped)
    nval = np.asarray(es.valid.sum(axis=1))
    pn = np.asarray(sb.pos_n)[np.asarray(sb.valid)]
    print(f"[diag] MEM pos_n: med={np.median(pn):.0f} "
          f"p90={np.percentile(pn,90):.0f} p99={np.percentile(pn,99):.0f} "
          f"max={pn.max()}", flush=True)
    print(f"[diag] at M=128,S=128: overflow rows {(nov>0).mean()*100:.1f}% "
          f"dropped rows {(ndrop>0).mean()*100:.1f}% ", flush=True)
    tot = nval + ndrop
    act = tot[tot > 0]
    print(f"[diag] expanded seeds/row (valid+dropped): med={np.median(act):.0f} "
          f"p90={np.percentile(act,90):.0f} p99={np.percentile(act,99):.0f} "
          f"max={act.max()}", flush=True)


if __name__ == "__main__":
    main()
