"""Dissect the chrom-scale 100% seed-budget overflow on the REAL
signal.fq (first batch), on CPU or chip."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W = "/tmp/pansvr_chrom_scale"
B = 4096

seqs, comments = [], []
with open(f"{W}/signal.fq") as fh:
    while len(seqs) < B:
        h = fh.readline()
        if not h:
            break
        s = fh.readline().strip()
        fh.readline()
        fh.readline()
        nc = h[1:].rstrip("\n").split(" ", 1)
        seqs.append(s)
        comments.append(nc[1] if len(nc) > 1 else "")

from pansvr_tpu.index.store import load_any
from pansvr_tpu.align.engine import AlignEngine, EngineConfig
from pansvr_tpu.align import native_glue
from pansvr_tpu.ops.seeding import (
    seed_reads_flat, merge_expand_device3, UNI_POS_N_MAX)

idx = load_any(W)
print(f"[diag] index fl={idx.first_level_bases} n_kmers={idx.n_kmers} "
      f"n_uni={idx.n_unitigs}", flush=True)
oris = native_glue.parse_comments(comments)
eng = AlignEngine(idx, config=EngineConfig())
prep = eng._prep_batch(seqs, oris)
words = prep["words"]; lens2 = prep["lens2"]
S0 = prep["S0"]; L = prep["L"]
import numpy as np
mask2 = np.ones((words.shape[0], S0), bool)  # unpacked for direct call
print(f"[diag] L={L} S0={S0} rows={words.shape[0]} "
      f"active={len(prep['active'])}", flush=True)

found, count, left = seed_reads_flat(
    eng.didx, words, lens2, mask2, S0=S0, M=32, probe="bisect",
    stop_after="probe")
found = np.asarray(found); count = np.asarray(count)
row_hits = np.where(found, count, 0).sum(axis=1)
cnt = count[found]
print(f"[diag] entry count per found seed: med={np.median(cnt):.0f} "
      f"p90={np.percentile(cnt,90):.0f} p99={np.percentile(cnt,99):.0f} "
      f"max={cnt.max()}", flush=True)
print(f"[diag] seeds skipped for count>{UNI_POS_N_MAX}: "
      f"{(count>UNI_POS_N_MAX).sum()}", flush=True)
print(f"[diag] row_hits: med={np.median(row_hits):.0f} "
      f"p90={np.percentile(row_hits,90):.0f} max={row_hits.max()} "
      f">32:{(row_hits>32).mean()*100:.1f}% "
      f">64:{(row_hits>64).mean()*100:.1f}% "
      f">128:{(row_hits>128).mean()*100:.1f}%", flush=True)

M = 128
sb = seed_reads_flat(eng.didx, words, lens2, mask2, S0=S0, M=M,
                     probe="bisect")
es = merge_expand_device3(sb, eng.didx, S=128)
nov = np.asarray(sb.n_overflow)
nd = np.asarray(es.n_dropped)
nval = np.asarray(es.valid.sum(axis=1))
pn = np.asarray(sb.pos_n)[np.asarray(sb.valid)]
print(f"[diag] MEM pos_n: med={np.median(pn):.0f} "
      f"p90={np.percentile(pn,90):.0f} p99={np.percentile(pn,99):.0f} "
      f"max={pn.max()}", flush=True)
tot = nval + nd
act = tot[tot > 0]
print(f"[diag] M=128,S=128: overflow {(nov>0).mean()*100:.1f}% rows, "
      f"dropped {(nd>0).mean()*100:.1f}% rows", flush=True)
print(f"[diag] expanded/row: med={np.median(act):.0f} "
      f"p90={np.percentile(act,90):.0f} p99={np.percentile(act,99):.0f} "
      f"max={act.max()}", flush=True)
