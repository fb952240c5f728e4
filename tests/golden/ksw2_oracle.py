"""ctypes binding to a .so compiled from the reference ksw2_extd2_sse.c,
used ONLY as a test oracle (built into /tmp by tools/build_reference.sh or
on demand here; nothing from the reference is vendored into the repo)."""

import ctypes
import os
import subprocess

SO_PATH = "/tmp/ksw2oracle/libksw2.so"

_BUILD_CMD = (
    "mkdir -p /tmp/ksw2oracle && gcc -O2 -fPIC -shared -msse4.1 "
    "-o /tmp/ksw2oracle/libksw2.so "
    "/root/reference/src/kswlib/ksw2_extd2_sse.c "
    "/root/reference/src/kswlib/kalloc.c "
    "-I/root/reference/src/kswlib"
)


class KswExtz(ctypes.Structure):
    _fields_ = [
        ("max_zdropped", ctypes.c_uint32),  # max:31, zdropped:1
        ("max_q", ctypes.c_int),
        ("max_t", ctypes.c_int),
        ("mqe", ctypes.c_int),
        ("mqe_t", ctypes.c_int),
        ("mte", ctypes.c_int),
        ("mte_q", ctypes.c_int),
        ("score", ctypes.c_int),
        ("m_cigar", ctypes.c_int),
        ("n_cigar", ctypes.c_int),
        ("reach_end", ctypes.c_int),
        ("cigar", ctypes.POINTER(ctypes.c_uint32)),
    ]

    @property
    def max(self):
        return self.max_zdropped & 0x7FFFFFFF

    @property
    def zdropped(self):
        return bool(self.max_zdropped >> 31)


_lib = None


def get_lib():
    global _lib
    if _lib is None:
        if not os.path.exists(SO_PATH):
            subprocess.run(_BUILD_CMD, shell=True, check=True)
        _lib = ctypes.CDLL(SO_PATH)
        _lib.ksw_extd2_sse.restype = None
    return _lib


def make_mat(match: int, mismatch: int) -> bytes:
    """5x5 matrix as KSW_ALN_handler::ksw_gen_mat_D builds it
    (read_realignment.cpp:855-868): match/mismatch over ACGT, 0 vs N."""
    mat = []
    for l in range(4):
        for m in range(4):
            mat.append(match if l == m else mismatch)
        mat.append(0)
    mat.extend([0] * 5)
    return bytes((x & 0xFF) for x in mat)


def run_extd2(query, target, match=2, mismatch=-12, q=16, e=1, q2=32, e2=0,
              w=200, zdrop=400, end_bonus=-1, flag=0):
    """Run the reference kernel; returns (ez, cigar list of (op, len))."""
    lib = get_lib()
    qbuf = (ctypes.c_uint8 * len(query))(*query)
    tbuf = (ctypes.c_uint8 * len(target))(*target)
    mat = make_mat(match, mismatch)
    ez = KswExtz()
    lib.ksw_extd2_sse(
        None, len(query), qbuf, len(target), tbuf,
        ctypes.c_int8(5), mat,
        ctypes.c_int8(q), ctypes.c_int8(e), ctypes.c_int8(q2), ctypes.c_int8(e2),
        ctypes.c_int(w), ctypes.c_int(zdrop), ctypes.c_int(end_bonus),
        ctypes.c_int(flag), ctypes.byref(ez),
    )
    ops = "MIDN"
    cigar = [
        (ops[ez.cigar[i] & 0xF], ez.cigar[i] >> 4) for i in range(ez.n_cigar)
    ]
    return ez, cigar
