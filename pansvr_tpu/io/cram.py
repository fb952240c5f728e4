"""CRAM 3.0 reader + writer (htslib-interoperable).

The reference pipeline's fc_signal consumes BAM **or CRAM** through
htslib (`/root/reference/src/clib/bam_file.h:16-259`, htslib `cram/`);
this module supplies the CRAM leg of that contract for the TPU pipeline:
`CramReader` decodes htslib-produced CRAM v3.0 (including rans4x8
order-0/1 and gzip blocks) into the same `BamRecord`s `BamReader`
yields, and `CramWriter` produces spec-conformant v3.0 CRAM (gzip
blocks, detached mate model) that htslib can read back.

Container / slice / record layouts follow the public CRAM 3.0
specification; byte-level quirks were validated against htslib's
behavior (`cram/cram_io.c:2813` container header, `cram/cram_decode.c:
2390-2750` record order, `cram/rANS_static.c:206` rans4x8, `cram/
cram_io.c:4594` v3 EOF marker). Not supported (CRAM 3.1/4.0 codecs):
rans4x16, adaptive arithmetic, fqzcomp, name tokeniser — a clear error
is raised naming the codec.

Mapped records are encoded/decoded against the reference FASTA
(`ref=` accepts a Faidx or a {name: seq} dict); reference-less (RR=0)
files decode via their verbatim base features.
"""

from __future__ import annotations

import bz2
import gzip
import lzma
import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

from .bam import BamHeader, BamRecord

CRAM_MAGIC = b"CRAM"

# block compression methods
M_RAW, M_GZIP, M_BZIP2, M_LZMA, M_RANS = 0, 1, 2, 3, 4
# block content types
CT_FILE_HEADER, CT_COMP_HEADER, CT_SLICE_HEADER, CT_EXTERNAL, CT_CORE = \
    0, 1, 2, 4, 5
# encoding (codec) ids
E_NULL, E_EXTERNAL, E_GOLOMB, E_HUFFMAN, E_BYTE_ARRAY_LEN, \
    E_BYTE_ARRAY_STOP, E_BETA, E_SUBEXP, E_GOLOMB_RICE, E_GAMMA = range(10)

# CRAM record flags (cram_structs.h:839-842)
CF_QUAL, CF_DETACHED, CF_DOWNSTREAM, CF_NO_SEQ = 1, 2, 4, 8
# mate flags
MF_REVERSE, MF_UNMAP = 1, 2

BAM_FPAIRED, BAM_FUNMAP, BAM_FMUNMAP = 0x1, 0x4, 0x8
BAM_FREVERSE, BAM_FMREVERSE, BAM_FREAD1 = 0x10, 0x20, 0x40


# ---------------------------------------------------------------------------
# ITF8 / LTF8
# ---------------------------------------------------------------------------

class ByteReader:
    __slots__ = ("b", "p")

    def __init__(self, b: bytes, p: int = 0):
        self.b = b
        self.p = p

    def u8(self) -> int:
        v = self.b[self.p]
        self.p += 1
        return v

    def raw(self, n: int) -> bytes:
        v = self.b[self.p : self.p + n]
        self.p += n
        return v

    def int32(self) -> int:
        v = struct.unpack_from("<i", self.b, self.p)[0]
        self.p += 4
        return v

    def itf8(self) -> int:
        b = self.b
        p = self.p
        b0 = b[p]
        if b0 < 0x80:
            self.p = p + 1
            return b0
        if b0 < 0xC0:
            self.p = p + 2
            return ((b0 << 8) | b[p + 1]) & 0x3FFF
        if b0 < 0xE0:
            self.p = p + 3
            return ((b0 << 16) | (b[p + 1] << 8) | b[p + 2]) & 0x1FFFFF
        if b0 < 0xF0:
            self.p = p + 4
            v = ((b0 << 24) | (b[p + 1] << 16) | (b[p + 2] << 8)
                 | b[p + 3]) & 0x0FFFFFFF
            return v
        self.p = p + 5
        v = (((b0 & 0x0F) << 28) | (b[p + 1] << 20) | (b[p + 2] << 12)
             | (b[p + 3] << 4) | (b[p + 4] & 0x0F))
        # values >= 2^31 are negative int32 (e.g. -1 ref ids)
        return v - (1 << 32) if v >= (1 << 31) else v

    def ltf8(self) -> int:
        b = self.b
        p = self.p
        b0 = b[p]
        n_extra = 0
        for bit in (0x80, 0x40, 0x20, 0x10, 0x08, 0x04, 0x02, 0x01):
            if b0 & bit:
                n_extra += 1
            else:
                break
        if n_extra == 0:
            self.p = p + 1
            return b0
        if n_extra >= 7:
            # 8 or 9 byte forms carry the value in the trailing 8 bytes
            n = 8 if b0 < 0xFF else 8
            v = int.from_bytes(b[p + 1 : p + 1 + n], "big")
            self.p = p + 1 + n
        else:
            v = b0 & ((1 << (7 - n_extra)) - 1)
            for k in range(n_extra):
                v = (v << 8) | b[p + 1 + k]
            self.p = p + 1 + n_extra
        return v - (1 << 64) if v >= (1 << 63) else v


def itf8_put(v: int) -> bytes:
    v &= 0xFFFFFFFF
    if v < 0x80:
        return bytes((v,))
    if v < 0x4000:
        return bytes((0x80 | (v >> 8), v & 0xFF))
    if v < 0x200000:
        return bytes((0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF))
    if v < 0x10000000:
        return bytes((0xE0 | (v >> 24), (v >> 16) & 0xFF,
                      (v >> 8) & 0xFF, v & 0xFF))
    return bytes((0xF0 | ((v >> 28) & 0x0F), (v >> 20) & 0xFF,
                  (v >> 12) & 0xFF, (v >> 4) & 0xFF, v & 0x0F))


def ltf8_put(v: int) -> bytes:
    v &= 0xFFFFFFFFFFFFFFFF
    if v < 0x80:
        return bytes((v,))
    if v < 0x4000:
        return bytes((0x80 | (v >> 8), v & 0xFF))
    if v < 0x200000:
        return bytes((0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF))
    if v < 0x10000000:
        return bytes((0xE0 | (v >> 24),) + tuple(
            (v >> s) & 0xFF for s in (16, 8, 0)))
    if v < 0x800000000:
        return bytes((0xF0 | (v >> 32),) + tuple(
            (v >> s) & 0xFF for s in (24, 16, 8, 0)))
    if v < 0x40000000000:
        return bytes((0xF8 | (v >> 40),) + tuple(
            (v >> s) & 0xFF for s in (32, 24, 16, 8, 0)))
    if v < 0x2000000000000:
        return bytes((0xFC | (v >> 48),) + tuple(
            (v >> s) & 0xFF for s in (40, 32, 24, 16, 8, 0)))
    if v < 0x100000000000000:
        return bytes((0xFE,) + tuple(
            (v >> s) & 0xFF for s in (48, 40, 32, 24, 16, 8, 0)))
    return bytes((0xFF,)) + v.to_bytes(8, "big")


# ---------------------------------------------------------------------------
# rans4x8 (CRAM codec 4) decode — rANS_static.c:206-420 semantics
# ---------------------------------------------------------------------------

RANS_L = 1 << 23
TF_SHIFT = 12
TOTFREQ = 1 << TF_SHIFT


def _rans_read_freqs(br: ByteReader):
    """Run-length encoded symbol frequency table -> (freq, cumfreq, lut)."""
    freq = np.zeros(256, np.uint32)
    lut = np.zeros(TOTFREQ, np.uint8)
    x = 0
    rle = 0
    j = br.u8()
    while True:
        F = br.u8()
        if F >= 128:
            F = ((F & 0x7F) << 8) | br.u8()
        freq[j] = F
        lut[x : x + F] = j
        x += F
        if rle == 0 and br.b[br.p] == j + 1:
            j = br.u8()
            rle = br.u8()
        elif rle:
            rle -= 1
            j += 1
        else:
            j = br.u8()
        if j == 0:
            break
    if x < TOTFREQ:
        lut[x:] = lut[x - 1]
    cum = np.zeros(257, np.uint32)
    cum[1:] = np.cumsum(freq)
    return freq, cum, lut


def rans_decode(data: bytes, out_sz_hint: int | None = None) -> bytes:
    br = ByteReader(data)
    order = br.u8()
    in_sz = struct.unpack_from("<I", data, 1)[0]
    out_sz = struct.unpack_from("<I", data, 5)[0]
    br.p = 9
    if order == 0:
        return _rans_decode_o0(br, out_sz)
    if order == 1:
        return _rans_decode_o1(br, out_sz)
    raise ValueError(f"rans4x8: bad order {order}")


def _rans_decode_o0(br: ByteReader, out_sz: int) -> bytes:
    freq, cum, lut = _rans_read_freqs(br)
    b = br.b
    p = br.p
    R = list(struct.unpack_from("<4I", b, p))
    p += 16
    out = bytearray(out_sz)
    mask = TOTFREQ - 1
    n = len(b)
    for i in range(out_sz):
        j = i & 3
        x = R[j]
        m = x & mask
        c = lut[m]
        out[i] = c
        x = int(freq[c]) * (x >> TF_SHIFT) + m - int(cum[c])
        while x < RANS_L and p < n:
            x = (x << 8) | b[p]
            p += 1
        R[j] = x
    return bytes(out)


def _rans_decode_o1(br: ByteReader, out_sz: int) -> bytes:
    # per-context tables, contexts RLE'd like symbols
    freqs = {}
    cums = {}
    luts = {}
    rle_i = 0
    i = br.u8()
    while True:
        freq = np.zeros(256, np.uint32)
        lut = np.zeros(TOTFREQ, np.uint8)
        x = 0
        rle_j = 0
        j = br.u8()
        while True:
            F = br.u8()
            if F >= 128:
                F = ((F & 0x7F) << 8) | br.u8()
            if F == 0:
                F = TOTFREQ
            freq[j] = F
            lut[x : x + F] = j
            x += F
            if rle_j == 0 and br.b[br.p] == j + 1:
                j = br.u8()
                rle_j = br.u8()
            elif rle_j:
                rle_j -= 1
                j += 1
            else:
                j = br.u8()
            if j == 0:
                break
        if x < TOTFREQ:
            lut[x:] = lut[x - 1]
        cum = np.zeros(257, np.uint32)
        cum[1:] = np.cumsum(freq)
        freqs[i], cums[i], luts[i] = freq, cum, lut
        if rle_i == 0 and br.b[br.p] == i + 1:
            i = br.u8()
            rle_i = br.u8()
        elif rle_i:
            rle_i -= 1
            i += 1
        else:
            i = br.u8()
        if i == 0:
            break

    b = br.b
    p = br.p
    R = list(struct.unpack_from("<4I", b, p))
    p += 16
    out = bytearray(out_sz)
    isz4 = out_sz >> 2
    i4 = [0, isz4, 2 * isz4, 3 * isz4]
    L = [0, 0, 0, 0]
    mask = TOTFREQ - 1
    n = len(b)
    z = np.zeros(256, np.uint32)
    zl = np.zeros(TOTFREQ, np.uint8)
    zc = np.zeros(257, np.uint32)
    for _ in range(isz4):
        for j in range(4):
            x = R[j]
            m = x & mask
            ctx = L[j]
            c = int(luts.get(ctx, zl)[m])
            out[i4[j]] = c
            f = freqs.get(ctx, z)
            cm = cums.get(ctx, zc)
            x = int(f[c]) * (x >> TF_SHIFT) + m - int(cm[c])
            while x < RANS_L and p < n:
                x = (x << 8) | b[p]
                p += 1
            R[j] = x
            L[j] = c
            i4[j] += 1
    # remainder handled by state 3
    while i4[3] < out_sz:
        x = R[3]
        m = x & mask
        ctx = L[3]
        c = int(luts.get(ctx, zl)[m])
        out[i4[3]] = c
        f = freqs.get(ctx, z)
        cm = cums.get(ctx, zc)
        x = int(f[c]) * (x >> TF_SHIFT) + m - int(cm[c])
        while x < RANS_L and p < n:
            x = (x << 8) | b[p]
            p += 1
        R[3] = x
        L[3] = c
        i4[3] += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

@dataclass
class Block:
    method: int
    content_type: int
    content_id: int
    data: bytes          # uncompressed


def read_block(br: ByteReader, version_major: int = 3) -> Block:
    method = br.u8()
    ctype = br.u8()
    cid = br.itf8()
    comp_size = br.itf8()
    raw_size = br.itf8()
    payload = br.raw(comp_size)
    if version_major >= 3:
        br.raw(4)  # crc32 (unchecked)
    if method == M_RAW:
        data = payload
    elif method == M_GZIP:
        data = gzip.decompress(payload)
    elif method == M_BZIP2:
        data = bz2.decompress(payload)
    elif method == M_LZMA:
        data = lzma.decompress(payload)
    elif method == M_RANS:
        data = rans_decode(payload)
    else:
        raise ValueError(
            f"CRAM block compression method {method} not supported "
            "(rans4x16/arith/fqzcomp/tok3 are CRAM 3.1 codecs)")
    if len(data) != raw_size:
        raise ValueError(f"block raw size mismatch {len(data)} != {raw_size}")
    return Block(method, ctype, cid, data)


def write_block(method: int, ctype: int, cid: int, data: bytes) -> bytes:
    if method == M_GZIP:
        payload = gzip.compress(data, 5)
    elif method == M_RAW:
        payload = data
    else:
        raise ValueError("writer supports raw/gzip blocks only")
    out = bytes((method, ctype)) + itf8_put(cid) \
        + itf8_put(len(payload)) + itf8_put(len(data)) + payload
    out += struct.pack("<I", zlib.crc32(out) & 0xFFFFFFFF)
    return out


# ---------------------------------------------------------------------------
# encodings (decode side)
# ---------------------------------------------------------------------------

class CoreBits:
    """MSB-first bit reader over the slice's core block."""
    __slots__ = ("b", "p", "bit")

    def __init__(self, b: bytes):
        self.b = b
        self.p = 0
        self.bit = 7

    def get_bit(self) -> int:
        v = (self.b[self.p] >> self.bit) & 1
        if self.bit == 0:
            self.bit = 7
            self.p += 1
        else:
            self.bit -= 1
        return v

    def get_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get_bit()
        return v


@dataclass
class Encoding:
    codec: int
    params: bytes

    @classmethod
    def parse(cls, br: ByteReader) -> "Encoding":
        codec = br.itf8()
        size = br.itf8()
        return cls(codec, br.raw(size))


def _huffman_decoder(params: bytes):
    br = ByteReader(params)
    n = br.itf8()
    vals = [br.itf8() for _ in range(n)]
    n2 = br.itf8()
    lens = [br.itf8() for _ in range(n2)]
    if len(vals) == 1 and lens[0] == 0:
        v0 = vals[0]
        return lambda core, ext: v0
    # canonical codes: sort by (len, symbol order of appearance)
    order = sorted(range(len(vals)), key=lambda i: (lens[i], i))
    codes = {}
    code = 0
    prev_len = 0
    for i in order:
        code <<= (lens[i] - prev_len)
        prev_len = lens[i]
        codes[(lens[i], code)] = vals[i]
        code += 1

    def dec(core, ext):
        ln = 0
        c = 0
        while True:
            c = (c << 1) | core.get_bit()
            ln += 1
            if (ln, c) in codes:
                return codes[(ln, c)]
            if ln > 32:
                raise ValueError("bad huffman stream")
    return dec


def make_int_decoder(enc: Encoding, ext_streams):
    if enc.codec == E_EXTERNAL:
        cid = ByteReader(enc.params).itf8()

        def dec(core, ext):
            return ext[cid].itf8()
        return dec
    if enc.codec == E_HUFFMAN:
        return _huffman_decoder(enc.params)
    if enc.codec == E_BETA:
        br = ByteReader(enc.params)
        offset = br.itf8()
        nbits = br.itf8()
        return lambda core, ext: core.get_bits(nbits) - offset
    if enc.codec == E_GAMMA:
        offset = ByteReader(enc.params).itf8()

        def dec(core, ext):
            n = 0
            while core.get_bit() == 0:
                n += 1
            v = 1
            for _ in range(n):
                v = (v << 1) | core.get_bit()
            return v - offset
        return dec
    if enc.codec == E_SUBEXP:
        br = ByteReader(enc.params)
        offset = br.itf8()
        k = br.itf8()

        def dec(core, ext):
            n = 0
            while core.get_bit() == 1:
                n += 1
            if n == 0:
                v = core.get_bits(k)
            else:
                v = core.get_bits(k + n - 1) + (1 << (k + n - 1))
            return v - offset
        return dec
    if enc.codec == E_NULL:
        return lambda core, ext: 0
    raise ValueError(f"int encoding codec {enc.codec} not supported")


def make_byte_decoder(enc: Encoding, ext_streams):
    """Single byte (e.g. FC, BS, BA one at a time, QS one at a time)."""
    if enc.codec == E_EXTERNAL:
        cid = ByteReader(enc.params).itf8()
        return lambda core, ext: ext[cid].u8()
    if enc.codec == E_HUFFMAN:
        return _huffman_decoder(enc.params)
    if enc.codec == E_BETA:
        br = ByteReader(enc.params)
        offset = br.itf8()
        nbits = br.itf8()
        return lambda core, ext: core.get_bits(nbits) - offset
    raise ValueError(f"byte encoding codec {enc.codec} not supported")


def make_bytes_decoder(enc: Encoding, ext_streams):
    """Byte arrays (RN, IN, SC, BB, QQ, tag values, and n-at-a-time
    BA/QS). Returns fn(core, ext, n=None) -> bytes."""
    if enc.codec == E_BYTE_ARRAY_STOP:
        br = ByteReader(enc.params)
        stop = br.u8()
        cid = br.itf8()

        def dec(core, ext, n=None):
            s = ext[cid]
            b = s.b
            q = b.index(bytes((stop,)), s.p)
            v = b[s.p : q]
            s.p = q + 1
            return v
        return dec
    if enc.codec == E_BYTE_ARRAY_LEN:
        br = ByteReader(enc.params)
        len_enc = Encoding.parse(br)
        val_enc = Encoding.parse(br)
        len_dec = make_int_decoder(len_enc, ext_streams)
        if val_enc.codec == E_EXTERNAL:
            vcid = ByteReader(val_enc.params).itf8()

            def dec(core, ext, n=None):
                ln = len_dec(core, ext) if n is None else n
                s = ext[vcid]
                v = s.b[s.p : s.p + ln]
                s.p += ln
                return v
            return dec
        val_dec = make_byte_decoder(val_enc, ext_streams)

        def dec(core, ext, n=None):
            ln = len_dec(core, ext) if n is None else n
            return bytes(val_dec(core, ext) for _ in range(ln))
        return dec
    if enc.codec == E_EXTERNAL:
        cid = ByteReader(enc.params).itf8()

        def dec(core, ext, n=None):
            s = ext[cid]
            if n is None:
                raise ValueError("EXTERNAL byte array needs explicit length")
            v = s.b[s.p : s.p + n]
            s.p += n
            return v
        return dec
    raise ValueError(f"byte-array encoding codec {enc.codec} not supported")


# ---------------------------------------------------------------------------
# compression header
# ---------------------------------------------------------------------------

BASES = "ACGTN"


@dataclass
class CompressionHeader:
    read_names_included: bool = True
    ap_delta: bool = True
    no_ref: bool = False
    sub_matrix: list = field(default_factory=list)   # [5][4] chars
    td: list = field(default_factory=list)           # list of tag triplet lists
    ds: dict = field(default_factory=dict)           # key -> Encoding
    tag_enc: dict = field(default_factory=dict)      # int key -> Encoding

    @classmethod
    def parse(cls, data: bytes) -> "CompressionHeader":
        h = cls()
        br = ByteReader(data)
        # preservation map
        br.itf8()  # byte size
        n = br.itf8()
        sm = bytes(5)
        for _ in range(n):
            key = br.raw(2).decode()
            if key in ("MI", "UI", "PI", "RN", "AP", "RR"):
                v = br.u8()
                if key == "RN":
                    h.read_names_included = bool(v)
                elif key == "AP":
                    h.ap_delta = bool(v)
                elif key == "RR":
                    h.no_ref = not v
            elif key == "SM":
                sm = br.raw(5)
            elif key == "TD":
                ln = br.itf8()
                blob = br.raw(ln)
                h.td = [
                    [part[i : i + 3] for i in range(0, len(part), 3)]
                    for part in blob.split(b"\x00")[:-1]
                ]
            else:
                br.u8()
        # substitution matrix: cram_decode.c:281-318 semantics
        h.sub_matrix = [[None] * 4 for _ in range(5)]
        for r in range(5):
            alts = [b for b in BASES if b != BASES[r]]
            byte = sm[r]
            for k, alt in enumerate(alts):
                code = (byte >> (6 - 2 * k)) & 3
                h.sub_matrix[r][code] = alt
        # data series encodings
        br.itf8()
        n = br.itf8()
        for _ in range(n):
            key = br.raw(2).decode()
            h.ds[key] = Encoding.parse(br)
        # tag encodings
        br.itf8()
        n = br.itf8()
        for _ in range(n):
            key = br.itf8()
            h.tag_enc[key] = Encoding.parse(br)
        return h


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

def _ref_fetch(ref, name: str) -> str | None:
    if ref is None:
        return None
    if hasattr(ref, "fetch_all"):
        return ref.fetch_all(name)
    if isinstance(ref, dict):
        return ref.get(name)
    # Faidx-style: fetch(name, start0, end0) with seq_len
    if hasattr(ref, "fetch") and hasattr(ref, "seq_len"):
        return ref.fetch(name, 0, ref.seq_len(name))
    raise TypeError("unsupported ref object")


class CramReader:
    """Iterate BamRecords from a CRAM 2.1/3.0 file.

    `ref`: the reference genome (Faidx, or {name: seq} dict) — required
    to reconstruct mapped sequences unless the file embeds its bases
    (RR=0) or carries an embedded reference block."""

    def __init__(self, path: str, ref=None):
        self.path = path
        self.ref = ref
        self._fh = open(path, "rb")
        magic = self._fh.read(4)
        if magic != CRAM_MAGIC:
            raise ValueError(f"{path}: not a CRAM file")
        self.major, self.minor = self._fh.read(2)
        if not 2 <= self.major <= 3:
            raise ValueError(f"CRAM version {self.major}.{self.minor} "
                             "not supported (3.0 max)")
        self._fh.read(20)  # file id
        hdr_text = self._read_sam_header()
        self.header = BamHeader.from_sam_text(hdr_text)
        self._ref_cache: dict[int, str] = {}

    # -- container plumbing ------------------------------------------------
    def _read_container_header(self):
        raw = self._fh.read(4)
        if len(raw) < 4:
            return None
        length = struct.unpack("<i", raw)[0]
        # remaining header fields are variable length; read a generous
        # chunk, parse, then seek back to the body start
        pos0 = self._fh.tell()
        blob = self._fh.read(256)
        br = ByteReader(blob)
        ref_id = br.itf8()
        start = br.itf8()
        span = br.itf8()
        n_records = br.itf8()
        counter = br.ltf8() if self.major >= 3 else br.itf8()
        n_bases = br.ltf8() if self.major >= 2 else br.itf8()
        n_blocks = br.itf8()
        n_land = br.itf8()
        landmarks = [br.itf8() for _ in range(n_land)]
        if self.major >= 3:
            br.raw(4)  # crc
        self._fh.seek(pos0 + br.p)
        return dict(length=length, ref_id=ref_id, start=start, span=span,
                    n_records=n_records, counter=counter, n_bases=n_bases,
                    n_blocks=n_blocks, landmarks=landmarks)

    def _read_sam_header(self) -> str:
        c = self._read_container_header()
        body = self._fh.read(c["length"])
        br = ByteReader(body)
        b = read_block(br, self.major)
        hlen = struct.unpack_from("<i", b.data, 0)[0]
        return b.data[4 : 4 + hlen].decode()

    def _get_ref_seq(self, tid: int) -> str | None:
        if tid < 0:
            return None
        if tid not in self._ref_cache:
            name = self.header.ref_names[tid]
            self._ref_cache[tid] = _ref_fetch(self.ref, name)
        return self._ref_cache[tid]

    def __iter__(self):
        while True:
            c = self._read_container_header()
            if c is None:
                return
            if c["ref_id"] == -1 and c["start"] == 4542278:
                return  # v3 EOF container
            body = self._fh.read(c["length"])
            if c["n_records"] == 0 and c["ref_id"] == -1:
                continue
            br = ByteReader(body)
            comp_blk = read_block(br, self.major)
            if comp_blk.content_type != CT_COMP_HEADER:
                raise ValueError("expected compression header block")
            ch = CompressionHeader.parse(comp_blk.data)
            while br.p < len(body):
                sh_blk = read_block(br, self.major)
                if sh_blk.content_type != CT_SLICE_HEADER:
                    raise ValueError("expected slice header block")
                yield from self._decode_slice(ch, sh_blk.data, br)

    # -- slice decode ------------------------------------------------------
    def _decode_slice(self, ch: CompressionHeader, sh_data: bytes,
                      br: ByteReader):
        sbr = ByteReader(sh_data)
        s_ref_id = sbr.itf8()
        s_start = sbr.itf8()
        s_span = sbr.itf8()
        n_rec = sbr.itf8()
        if self.major >= 3:
            sbr.ltf8()
        elif self.major == 2:
            sbr.itf8()
        n_blocks = sbr.itf8()
        n_ids = sbr.itf8()
        [sbr.itf8() for _ in range(n_ids)]
        embed_ref_id = sbr.itf8()
        # md5 + optional tags ignored

        core = None
        ext = {}
        embedded_ref = None
        for _ in range(n_blocks):
            b = read_block(br, self.major)
            if b.content_type == CT_CORE:
                core = CoreBits(b.data)
            else:
                ext[b.content_id] = ByteReader(b.data)
                if b.content_id == embed_ref_id:
                    embedded_ref = b.data
        if core is None:
            core = CoreBits(b"")

        dsd = {}
        for key in ch.ds:
            if key in ("RN", "IN", "SC", "BB", "QQ"):
                dsd[key] = make_bytes_decoder(ch.ds[key], ext)
            elif key in ("FC", "BS"):
                dsd[key] = make_byte_decoder(ch.ds[key], ext)
            elif key in ("BA", "QS"):
                # used both 1-at-a-time and n-at-a-time
                dsd[key] = _array_or_byte(ch.ds[key], ext)
            else:
                dsd[key] = make_int_decoder(ch.ds[key], ext)
        tag_dec = {k: make_bytes_decoder(e, ext)
                   for k, e in ch.tag_enc.items()}

        recs: list[dict] = []
        last_apos = s_start
        for rec_i in range(n_rec):
            r = {}
            bf = dsd["BF"](core, ext)
            cf = dsd["CF"](core, ext)
            if s_ref_id == -2:
                tid = dsd["RI"](core, ext) if "RI" in dsd else -1
            else:
                tid = s_ref_id
            rl = dsd["RL"](core, ext)
            apos = dsd["AP"](core, ext)
            if ch.ap_delta:
                apos += last_apos
            last_apos = apos
            if "RG" in dsd:
                dsd["RG"](core, ext)
            name = b""
            if ch.read_names_included and "RN" in dsd:
                name = dsd["RN"](core, ext)
            mate_flags = 0
            mate_line = -1
            mtid, mpos, tlen = -1, 0, None
            if cf & CF_DETACHED:
                mate_flags = dsd["MF"](core, ext) if "MF" in dsd else 0
                if not ch.read_names_included and "RN" in dsd:
                    name = dsd["RN"](core, ext)
                mtid = dsd["NS"](core, ext) if "NS" in dsd else -1
                mpos = dsd["NP"](core, ext) if "NP" in dsd else 0
                tlen = dsd["TS"](core, ext) if "TS" in dsd else 0
            elif cf & CF_DOWNSTREAM:
                nf = dsd["NF"](core, ext)
                mate_line = rec_i + nf + 1
            # tags
            tags_raw = b""
            tl = dsd["TL"](core, ext) if "TL" in dsd else 0
            triplets = ch.td[tl] if tl < len(ch.td) else []
            for trip in triplets:
                key = (trip[0] << 16) | (trip[1] << 8) | trip[2]
                val = tag_dec[key](core, ext)
                tags_raw += bytes(trip) + val
            r.update(flags=bf, cram_flags=cf, tid=tid, rl=rl, apos=apos,
                     name=name, mate_flags=mate_flags, mate_line=mate_line,
                     mtid=mtid, mpos=mpos, tlen=tlen, tags_raw=tags_raw)

            if not (bf & BAM_FUNMAP):
                self._decode_mapped(r, ch, dsd, core, ext, cf, embedded_ref,
                                    s_start if embedded_ref else None)
            else:
                seq = dsd["BA"](core, ext, rl) if "BA" in dsd and rl else b""
                if cf & CF_QUAL and "QS" in dsd:
                    qual = dsd["QS"](core, ext, rl)
                else:
                    qual = b"\xff" * rl
                r.update(seq=seq.decode(), qual=qual, cigar=[],
                         mapq=0, aend=r["apos"])
            recs.append(r)

        self._xref(recs)
        for r in recs:
            yield self._to_bam(r)

    def _decode_mapped(self, r, ch, dsd, core, ext, cf, embedded_ref,
                       embed_start):
        rl = r["rl"]
        tid = r["tid"]
        apos = r["apos"]
        if embedded_ref is not None:
            refseq = embedded_ref.decode()
            ref_off = embed_start - 1      # refseq[0] is base embed_start
        else:
            refseq = None if ch.no_ref else self._get_ref_seq(tid)
            ref_off = 0
        seq = bytearray(b"=" * rl) if refseq is None else bytearray(rl)
        qual = bytearray(b"\xff" * rl)
        fn = dsd["FN"](core, ext)
        cigar = []
        cig_op = "M"
        cig_len = 0
        seq_pos = 1
        ref_pos = apos - 1          # 0-based
        prev_pos = 0

        def flush(new_op):
            nonlocal cig_op, cig_len
            if cig_len and cig_op != new_op:
                cigar.append((cig_op, cig_len))
                cig_len = 0
            cig_op = new_op

        def fill_ref(upto):  # fill seq[seq_pos-1 : upto-1] from reference
            nonlocal seq_pos, ref_pos, cig_len
            ln = upto - seq_pos
            if ln > 0:
                if refseq is not None:
                    frag = refseq[ref_pos - ref_off : ref_pos - ref_off + ln]
                    frag = frag + "N" * (ln - len(frag))
                    seq[seq_pos - 1 : seq_pos - 1 + ln] = frag.encode()
                flush("M")
                cig_len += ln
                ref_pos += ln
                seq_pos = upto

        for _ in range(fn):
            op = chr(dsd["FC"](core, ext))
            pos = dsd["FP"](core, ext) + prev_pos
            prev_pos = pos
            fill_ref(pos)
            if op == "S":
                sc = dsd["SC"](core, ext)
                flush("S")
                seq[pos - 1 : pos - 1 + len(sc)] = sc
                cigar.append(("S", len(sc)))
                cig_len = 0
                seq_pos += len(sc)
            elif op == "X":
                code = dsd["BS"](core, ext)
                if refseq is None:
                    rbase = "N"
                else:
                    p = ref_pos - ref_off
                    rbase = refseq[p] if 0 <= p < len(refseq) else "N"
                ri = BASES.find(rbase.upper())
                ri = 4 if ri < 0 else ri
                sub = ch.sub_matrix[ri][code]
                seq[pos - 1] = ord(sub)
                flush("M")
                cig_len += 1
                seq_pos += 1
                ref_pos += 1
            elif op == "D":
                dl = dsd["DL"](core, ext)
                flush("D")
                cig_len += dl
                ref_pos += dl
            elif op == "I":
                ins = dsd["IN"](core, ext)
                flush("I")
                cig_len += len(ins)
                seq[pos - 1 : pos - 1 + len(ins)] = ins
                seq_pos += len(ins)
            elif op == "i":
                base = dsd["BA"](core, ext)
                flush("I")
                seq[pos - 1] = base
                cig_len += 1
                seq_pos += 1
            elif op == "b":
                bb = dsd["BB"](core, ext)
                flush("M")
                seq[pos - 1 : pos - 1 + len(bb)] = bb
                cig_len += len(bb)
                seq_pos += len(bb)
                ref_pos += len(bb)
            elif op == "q":
                qq = dsd["QQ"](core, ext)
                flush("M")
                qual[pos - 1 : pos - 1 + len(qq)] = qq
                cig_len += len(qq)
                seq_pos += len(qq)
                ref_pos += len(qq)
            elif op == "B":
                base = dsd["BA"](core, ext)
                q = dsd["QS"](core, ext)
                seq[pos - 1] = base
                qual[pos - 1] = q
                flush("M")
                cig_len += 1
                seq_pos += 1
                ref_pos += 1
            elif op == "Q":
                qual[pos - 1] = dsd["QS"](core, ext)
            elif op == "H":
                hl = dsd["HC"](core, ext)
                flush("H")
                cigar.append(("H", hl))
                cig_len = 0
            elif op == "P":
                pl = dsd["PD"](core, ext)
                flush("P")
                cig_len += pl
            elif op == "N":
                nl = dsd["RS"](core, ext)
                flush("N")
                cig_len += nl
                ref_pos += nl
            else:
                raise ValueError(f"unknown CRAM feature code {op!r}")

        fill_ref(rl + 1)
        if cig_len:
            cigar.append((cig_op, cig_len))
        if not cigar and rl:
            cigar = [("M", rl)]
        mq = dsd["MQ"](core, ext) if "MQ" in dsd else 40
        if cf & CF_QUAL and "QS" in dsd:
            qual = bytearray(dsd["QS"](core, ext, rl))
        r.update(seq=seq.decode(), qual=bytes(qual), cigar=cigar,
                 mapq=mq, aend=ref_pos)

    # -- mate xref (cram_decode.c:2043-2200 semantics) ---------------------
    def _xref(self, recs):
        n = len(recs)
        for i, r in enumerate(recs):
            ml = r["mate_line"]
            if ml >= 0:
                if ml >= n:
                    raise ValueError("mate line out of slice bounds")
                if r["tlen"] is None:
                    # walk the chain computing the template span
                    aleft, aright = r["apos"], r["aend"]
                    left_cnt = 0
                    ref = r["tid"]
                    id2 = i
                    while True:
                        r2 = recs[id2]
                        if aleft > r2["apos"]:
                            aleft, left_cnt = r2["apos"], 1
                        elif aleft == r2["apos"]:
                            left_cnt += 1
                        aright = max(aright, r2["aend"])
                        if r2["mate_line"] == -1:
                            r2["mate_line"] = i
                            break
                        id2 = r2["mate_line"]
                        if recs[id2]["tid"] != ref:
                            ref = -1
                        if id2 == i:
                            break
                    chain = [i]
                    id2 = recs[i]["mate_line"]
                    while id2 != i:
                        chain.append(id2)
                        id2 = recs[id2]["mate_line"]
                    if ref != -1:
                        tl = aright - aleft + 1
                        for j in chain:
                            rj = recs[j]
                            if rj["apos"] == aleft and (
                                    left_cnt == 1
                                    or rj["flags"] & BAM_FREAD1):
                                rj["tlen"] = tl
                            else:
                                rj["tlen"] = -tl
                    else:
                        for j in chain:
                            recs[j]["tlen"] = 0
                mate = recs[r["mate_line"]]
                r["mpos"] = mate["apos"]
                r["mtid"] = mate["tid"]
                r["flags"] |= BAM_FPAIRED
                if mate["flags"] & BAM_FUNMAP:
                    r["flags"] |= BAM_FMUNMAP
                    r["tlen"] = 0
                if r["flags"] & BAM_FUNMAP:
                    r["tlen"] = 0
                if mate["flags"] & BAM_FREVERSE:
                    r["flags"] |= BAM_FMREVERSE
            else:
                mf = r["mate_flags"]
                if mf & MF_REVERSE:
                    r["flags"] |= BAM_FPAIRED | BAM_FMREVERSE
                if mf & MF_UNMAP:
                    r["flags"] |= BAM_FMUNMAP
                if not (r["flags"] & BAM_FPAIRED):
                    r["mtid"] = -1
            if r["tlen"] is None:
                r["tlen"] = 0

    def _to_bam(self, r) -> BamRecord:
        from .bam import _parse_tags  # decoder for raw aux bytes

        qual_b = r["qual"]
        if not qual_b or all(q == 0xFF for q in qual_b):
            qual = ""                      # BamRecord convention: absent
        else:
            qual = "".join(chr(min(q, 93) + 33) for q in qual_b)
        rec = BamRecord(
            name=r["name"].decode() if r["name"] else "",
            flag=r["flags"], tid=r["tid"] if r["tid"] >= 0 else -1,
            pos=r["apos"] - 1 if r["apos"] > 0 else -1,
            mapq=r["mapq"], cigar=list(r["cigar"]),
            mtid=r["mtid"], mpos=r["mpos"] - 1 if r["mpos"] > 0 else -1,
            isize=r["tlen"] or 0, seq=r["seq"] or "",
            qual=qual, tags=_parse_tags(r["tags_raw"]),
        )
        return rec

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def _array_or_byte(enc: Encoding, ext):
    """BA/QS are decoded both one byte at a time (features) and as whole
    arrays (unmapped bases, preserved quals): fn(core, ext) -> int, or
    fn(core, ext, n) -> bytes."""
    if enc.codec == E_EXTERNAL:
        cid = ByteReader(enc.params).itf8()

        def dec(core, ext, n=None):
            s = ext[cid]
            if n is None:
                return s.u8()
            v = s.b[s.p : s.p + n]
            s.p += n
            return v
        return dec
    bd = make_byte_decoder(enc, ext)

    def dec(core, ext, n=None):
        if n is None:
            return bd(core, ext)
        return bytes(bd(core, ext) for _ in range(n))
    return dec


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

# default substitution matrix: codes in alphabetical order (byte 0b00011011)
_SM_IDENTITY = bytes([0x1B] * 5)

EOF_V3 = bytes((
    0x0f, 0x00, 0x00, 0x00, 0xff, 0xff, 0xff, 0xff, 0x0f, 0xe0,
    0x45, 0x4f, 0x46, 0x00, 0x00, 0x00, 0x00, 0x01, 0x00, 0x05,
    0xbd, 0xd9, 0x4f, 0x00, 0x01, 0x00, 0x06, 0x06, 0x01, 0x00,
    0x01, 0x00, 0x01, 0x00, 0xee, 0x63, 0x01, 0x4b,
))


class _Series:
    """Per-data-series external byte sink."""

    def __init__(self, cid):
        self.cid = cid
        self.buf = bytearray()

    def itf8(self, v):
        self.buf += itf8_put(v)

    def u8(self, v):
        self.buf.append(v & 0xFF)

    def raw(self, b):
        self.buf += b


class CramWriter:
    """Minimal spec-conformant CRAM 3.0 writer: one slice per container,
    every data series EXTERNAL in its own gzip block, detached mates
    (mate info stored verbatim per record), read names preserved,
    absolute alignment positions (AP=0)."""

    RECORDS_PER_SLICE = 4096

    def __init__(self, path: str, header: BamHeader, ref=None):
        self.path = path
        self.header = header
        self.ref = ref
        self._fh = open(path, "wb")
        self._fh.write(CRAM_MAGIC + bytes((3, 0)))
        fid = (path.encode()[-20:] + b"\x00" * 20)[:20]
        self._fh.write(fid)
        self._counter = 0
        self._recs: list[BamRecord] = []
        self._ref_cache: dict[int, str] = {}
        self._write_sam_header()

    def _write_sam_header(self):
        text = self.header.to_sam_text().encode()
        data = struct.pack("<i", len(text)) + text
        blk = write_block(M_GZIP, CT_FILE_HEADER, 0, data)
        hdr = self._container_header(len(blk), -1, 0, 0, 0, 0, 1, [0])
        self._fh.write(hdr + blk)

    def _container_header(self, length, ref_id, start, span, n_rec,
                          n_bases, n_blocks, landmarks):
        out = bytearray(struct.pack("<i", length))
        out += itf8_put(ref_id) + itf8_put(start) + itf8_put(span)
        out += itf8_put(n_rec) + ltf8_put(self._counter)
        out += ltf8_put(n_bases) + itf8_put(n_blocks)
        out += itf8_put(len(landmarks))
        for l in landmarks:
            out += itf8_put(l)
        out += struct.pack("<I", zlib.crc32(bytes(out)) & 0xFFFFFFFF)
        return bytes(out)

    def write(self, rec: BamRecord):
        self._recs.append(rec)
        if len(self._recs) >= self.RECORDS_PER_SLICE:
            self._flush()

    def _get_ref_seq(self, tid: int) -> str | None:
        if tid < 0:
            return None
        if tid not in self._ref_cache:
            name = self.header.ref_names[tid]
            self._ref_cache[tid] = _ref_fetch(self.ref, name)
        return self._ref_cache[tid]

    # series content ids (arbitrary but stable)
    _SERIES = ["BF", "CF", "RI", "RL", "AP", "RG", "RN", "MF", "NS", "NP",
               "TS", "TL", "FN", "FC", "FP", "DL", "IN", "SC", "BA", "QS",
               "MQ", "HC", "PD", "RS", "BS"]

    def _flush(self):
        from .bam import _encode_tag_value

        recs = self._recs
        self._recs = []
        if not recs:
            return
        tids = {r.tid for r in recs}
        multi_ref = len(tids) > 1 or any(
            r.tid < 0 for r in recs) and any(r.tid >= 0 for r in recs)
        s_ref = -2 if multi_ref else (recs[0].tid if recs else -1)
        mapped = [r for r in recs if r.tid >= 0]
        s_start = min((r.pos + 1 for r in mapped), default=0)
        s_end = max((self._aend(r) for r in mapped), default=0)
        s_span = max(0, s_end - s_start + 1) if mapped else 0
        if multi_ref:
            s_ref, s_start, s_span = -2, 0, 0

        ser = {k: _Series(i + 1) for i, k in enumerate(self._SERIES)}
        # tag dictionary: one TD line per distinct tag-triplet combo
        td_lines = []
        td_index = {}
        tag_series: dict[int, _Series] = {}
        next_cid = len(self._SERIES) + 1

        def tag_sink(key):
            nonlocal next_cid
            if key not in tag_series:
                tag_series[key] = _Series(next_cid)
                next_cid += 1
            return tag_series[key]

        n_bases = 0
        for i, r in enumerate(recs):
            has_seq = bool(r.seq) and r.seq != "*"
            has_qual = bool(r.qual) and r.qual != "*"
            n_bases += len(r.seq) if has_seq else 0
            ser["BF"].itf8(r.flag)
            cf = CF_DETACHED | (CF_QUAL if has_qual else 0)
            ser["CF"].itf8(cf)
            if s_ref == -2:
                ser["RI"].itf8(r.tid)
            rl = len(r.seq) if has_seq else 0
            ser["RL"].itf8(rl)
            ser["AP"].itf8(r.pos + 1)
            ser["RG"].itf8(-1)      # htslib demands an RG codec (cram_decode.c:2518)
            ser["RN"].raw(r.name.encode() + b"\x00")
            mf = 0
            if r.flag & BAM_FMREVERSE:
                mf |= MF_REVERSE
            if r.flag & BAM_FMUNMAP:
                mf |= MF_UNMAP
            ser["MF"].itf8(mf)
            ser["NS"].itf8(r.mtid)
            ser["NP"].itf8(r.mpos + 1)
            ser["TS"].itf8(r.isize)
            # tags
            trip_key = tuple(
                (t[0].encode() + t[1].encode()) for t in r.tags)
            if trip_key not in td_index:
                td_index[trip_key] = len(td_lines)
                td_lines.append(b"".join(trip_key))
            ser["TL"].itf8(td_index[trip_key])
            for tag, ty, val in r.tags:
                key = (ord(tag[0]) << 16) | (ord(tag[1]) << 8) | ord(ty)
                sink = tag_sink(key)
                vb = _encode_tag_value(ty, val)
                sink.itf8(len(vb))
                sink.raw(vb)
            if r.flag & BAM_FUNMAP or r.tid < 0:
                ser["BA"].raw(r.seq.encode() if has_seq else b"")
                if has_qual:
                    ser["QS"].raw(bytes(
                        min(ord(q) - 33, 0xFE) for q in r.qual))
            else:
                self._encode_features(r, ser)
                ser["MQ"].itf8(r.mapq)
                if has_qual:
                    ser["QS"].raw(bytes(
                        min(ord(q) - 33, 0xFE) for q in r.qual))

        # ---- compression header ----------------------------------------
        comp = bytearray()
        # preservation map
        pm = bytearray()
        pm_entries = 0
        for key, val in (("RN", 1), ("AP", 0), ("RR", 1)):
            pm += key.encode() + bytes((val,))
            pm_entries += 1
        pm += b"SM" + _SM_IDENTITY
        pm_entries += 1
        td_blob = b"\x00".join(td_lines) + b"\x00" if td_lines else b"\x00"
        pm += b"TD" + itf8_put(len(td_blob)) + td_blob
        pm_entries += 1
        pm_body = itf8_put(pm_entries) + bytes(pm)
        comp += itf8_put(len(pm_body)) + pm_body
        # data series encodings: all EXTERNAL; RN/IN/SC byte-array-stop
        dse = bytearray()
        n_ds = 0
        for key in self._SERIES:
            s = ser[key]
            if key in ("RN",):
                params = bytes((0,)) + itf8_put(s.cid)  # stop '\0'
                enc = itf8_put(E_BYTE_ARRAY_STOP) \
                    + itf8_put(len(params)) + params
            elif key in ("IN", "SC"):
                params = bytes((ord("$"),)) + itf8_put(s.cid)
                enc = itf8_put(E_BYTE_ARRAY_STOP) \
                    + itf8_put(len(params)) + params
            else:
                params = itf8_put(s.cid)
                enc = itf8_put(E_EXTERNAL) + itf8_put(len(params)) + params
            dse += key.encode() + enc
            n_ds += 1
        dse_body = itf8_put(n_ds) + bytes(dse)
        comp += itf8_put(len(dse_body)) + dse_body
        # tag encodings: BYTE_ARRAY_LEN(len EXTERNAL cid, val EXTERNAL cid)
        te = bytearray()
        for key, s in tag_series.items():
            lenc = itf8_put(E_EXTERNAL) + itf8_put(1) + itf8_put(s.cid)
            venc = itf8_put(E_EXTERNAL) + itf8_put(1) + itf8_put(s.cid)
            params = lenc + venc
            te += itf8_put(key) + itf8_put(E_BYTE_ARRAY_LEN) \
                + itf8_put(len(params)) + params
        te_body = itf8_put(len(tag_series)) + bytes(te)
        comp += itf8_put(len(te_body)) + te_body
        comp_blk = write_block(M_GZIP, CT_COMP_HEADER, 0, bytes(comp))

        # ---- slice ------------------------------------------------------
        data_blocks = []
        content_ids = []
        for key in self._SERIES:
            s = ser[key]
            if s.buf:
                data_blocks.append(
                    write_block(M_GZIP, CT_EXTERNAL, s.cid, bytes(s.buf)))
                content_ids.append(s.cid)
        for key, s in tag_series.items():
            data_blocks.append(
                write_block(M_GZIP, CT_EXTERNAL, s.cid, bytes(s.buf)))
            content_ids.append(s.cid)
        core_blk = write_block(M_RAW, CT_CORE, 0, b"")

        sh = bytearray()
        sh += itf8_put(s_ref) + itf8_put(s_start) + itf8_put(s_span)
        sh += itf8_put(len(recs)) + ltf8_put(self._counter)
        sh += itf8_put(1 + len(data_blocks))          # core + externals
        sh += itf8_put(len(content_ids))
        for cid in content_ids:
            sh += itf8_put(cid)
        sh += itf8_put(-1)                            # no embedded ref
        sh += bytes(16)                               # md5 (unchecked)
        sh_blk = write_block(M_RAW, CT_SLICE_HEADER, 0, bytes(sh))

        body = comp_blk + sh_blk + core_blk + b"".join(data_blocks)
        landmarks = [len(comp_blk)]
        hdr = self._container_header(
            len(body), s_ref, s_start, s_span, len(recs), n_bases,
            2 + len(data_blocks) + 1, landmarks)
        self._fh.write(hdr + body)
        self._counter += len(recs)

    @staticmethod
    def _aend(r: BamRecord) -> int:
        end = r.pos + 1
        for op, ln in r.cigar:
            if op in "MDN=X":
                end += ln
        return max(end - 1, r.pos + 1)

    def _encode_features(self, r: BamRecord, ser):
        """Read features vs the reference (substitutions via the identity
        SM matrix), driving the same decode loop htslib runs."""
        refseq = self._get_ref_seq(r.tid)
        if refseq is None:
            raise ValueError(
                f"CramWriter needs the reference to encode mapped record "
                f"{r.name} (tid {r.tid})")
        feats = []
        seq = r.seq
        seq_pos = 0          # 0-based within read
        ref_pos = r.pos      # 0-based
        cigar = r.cigar or [("M", len(seq))]
        for op, ln in cigar:
            if op in "M=X":
                for k in range(ln):
                    rb = refseq[ref_pos + k] if ref_pos + k < len(refseq) \
                        else "N"
                    qb = seq[seq_pos + k]
                    if qb.upper() != rb.upper():
                        ri = BASES.find(rb.upper())
                        ri = 4 if ri < 0 else ri
                        alts = [b for b in BASES if b != BASES[ri]]
                        try:
                            code = alts.index(qb.upper())
                        except ValueError:
                            code = 3
                        feats.append(("X", seq_pos + k + 1, code))
                seq_pos += ln
                ref_pos += ln
            elif op == "I":
                feats.append(
                    ("I", seq_pos + 1, seq[seq_pos : seq_pos + ln]))
                seq_pos += ln
            elif op == "S":
                feats.append(
                    ("S", seq_pos + 1, seq[seq_pos : seq_pos + ln]))
                seq_pos += ln
            elif op == "D":
                feats.append(("D", seq_pos + 1, ln))
                ref_pos += ln
            elif op == "N":
                feats.append(("N", seq_pos + 1, ln))
                ref_pos += ln
            elif op == "H":
                feats.append(("H", seq_pos + 1, ln))
            elif op == "P":
                feats.append(("P", seq_pos + 1, ln))
            else:
                raise ValueError(f"cigar op {op} unsupported in CRAM writer")
        ser["FN"].itf8(len(feats))
        prev = 0
        for op, pos, val in feats:
            ser["FC"].u8(ord(op))
            ser["FP"].itf8(pos - prev)
            prev = pos
            if op == "X":
                ser["BS"].u8(val)
            elif op in ("I", "S"):
                ser["IN" if op == "I" else "SC"].raw(
                    val.encode() + b"$")
            elif op in ("D", "N", "H", "P"):
                ser[{"D": "DL", "N": "RS", "H": "HC", "P": "PD"}[op]].itf8(val)

    def close(self):
        self._flush()
        self._fh.write(EOF_V3)
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
