"""Self-contained CRAM 3.0 reader/writer (no htslib).

The reference accepts CRAM trios everywhere a BAM is accepted by
delegating to pysam/htslib (reference cli.py:13-24, vcf/pipeline.py:77,
discovery/pipeline.py:339).  This module provides the same capability
natively: :class:`CramReader` decodes CRAM records into raw BAM record
bodies (reusing :class:`~kmer_denovo_filter_tpu.htsio.bam.AlignedRead`
for all downstream parsing) and :func:`cram_to_bam` converts a CRAM
into a coordinate-equivalent BAM once so every streaming/indexed BAM
path (packed batches, BAI fetch, native inflation) works unchanged.

Reader coverage: CRAM 3.0 containers; raw/gzip/bzip2/lzma/rANS-4x8
block methods; EXTERNAL, HUFFMAN (canonical), BETA, GAMMA, SUBEXP,
BYTE_ARRAY_LEN and BYTE_ARRAY_STOP encodings; single-ref, multi-ref
and unmapped slices; detached and downstream-linked mates; embedded or
FASTA-supplied references; the full read-feature set (X B I i D S H N
P Q q b).  The writer emits a fixed gzip/EXTERNAL profile with
detached mates and preserved read names — spec-conformant output used
for round-trip testing and CRAM export.
"""

import os
import struct
import tempfile
import zlib

from kmer_denovo_filter_tpu.htsio import cram_codecs as cc
from kmer_denovo_filter_tpu.htsio.bam import (
    AlignedRead, BamWriter, encode_read)
from kmer_denovo_filter_tpu.htsio.cram_codecs import (
    BitReader, CramFormatError, read_itf8, read_itf8_array,
    read_ltf8, to_signed32, write_itf8, write_itf8_array, write_ltf8)
from kmer_denovo_filter_tpu.htsio.fasta import read_fasta

CRAM_MAGIC = b"CRAM"

BLOCK_FILE_HEADER = 0
BLOCK_COMPRESSION_HEADER = 1
BLOCK_SLICE_HEADER = 2
BLOCK_EXTERNAL = 4
BLOCK_CORE = 5

# CF record flags
CF_QS_PRESERVED = 0x1
CF_DETACHED = 0x2
CF_MATE_DOWNSTREAM = 0x4
CF_UNKNOWN_BASES = 0x8

# MF mate flags
MF_MATE_REVERSED = 0x1
MF_MATE_UNMAPPED = 0x2

# The spec's fixed 38-byte CRAM 3.0 EOF container.
EOF_CONTAINER = bytes.fromhex(
    "0f000000ffffffff0fe0454f4600000000010005bdd94f0001000606010001"
    "000100ee63014b")
_EOF_POS = 4542278  # "EOF" as an alignment start marks the terminator

_BASES = "ACGTN"
_BASE_IDX = {b: i for i, b in enumerate(_BASES)}


def _default_sub_matrix():
    """SM bytes: for each ref base, codes 0-3 for the other 4 bases in
    ACGTN order (the spec's example layout)."""
    out = bytearray()
    for r in _BASES:
        others = [b for b in _BASES if b != r]
        byte = 0
        for code, _b in enumerate(others[:4]):
            byte |= code << (6 - 2 * code)
        out.append(byte)
    return bytes(out)


def _sub_tables(sm_bytes):
    """sub[ref_idx][code] -> substituted base, and its inverse."""
    sub = []
    inv = []
    for ri, r in enumerate(_BASES):
        others = [b for b in _BASES if b != r]
        byte = sm_bytes[ri]
        by_code = [None] * 4
        code_of = {}
        for slot, b in enumerate(others[:4]):
            code = (byte >> (6 - 2 * slot)) & 0x3
            by_code[code] = b
            code_of[b] = code
        sub.append(by_code)
        inv.append(code_of)
    return sub, inv


# ───────────────────────────── encodings ─────────────────────────────

class _Decoder:
    """One CRAM encoding instance bound to its source streams."""

    def __init__(self, codec, params, streams, core):
        self.codec = codec
        self.core = core
        self.streams = streams
        pos = 0
        if codec == 0:    # NULL
            pass
        elif codec == 1:  # EXTERNAL
            self.cid, pos = read_itf8(params, pos)
        elif codec == 3:  # HUFFMAN
            syms, pos = read_itf8_array(params, pos)
            lens, pos = read_itf8_array(params, pos)
            self._build_huffman(syms, lens)
        elif codec == 4:  # BYTE_ARRAY_LEN
            lc, pos = read_itf8(params, pos)
            ln, pos = read_itf8(params, pos)
            self.len_dec = _Decoder(lc, params[pos:pos + ln], streams,
                                    core)
            pos += ln
            vc, pos = read_itf8(params, pos)
            vn, pos = read_itf8(params, pos)
            self.val_dec = _Decoder(vc, params[pos:pos + vn], streams,
                                    core)
        elif codec == 5:  # BYTE_ARRAY_STOP
            self.stop = params[0]
            self.cid, pos = read_itf8(params, 1)
        elif codec == 6:  # BETA
            self.offset, pos = read_itf8(params, pos)
            self.offset = to_signed32(self.offset)
            self.nbits, pos = read_itf8(params, pos)
        elif codec == 7:  # SUBEXP
            self.offset, pos = read_itf8(params, pos)
            self.offset = to_signed32(self.offset)
            self.k, pos = read_itf8(params, pos)
        elif codec == 9:  # GAMMA
            self.offset, pos = read_itf8(params, pos)
            self.offset = to_signed32(self.offset)
        else:
            raise CramFormatError(f"unsupported CRAM encoding {codec}")

    def _build_huffman(self, syms, lens):
        # canonical codes ordered by (length, symbol)
        entries = sorted(zip(lens, syms))
        self.huff = []
        code = 0
        prev_len = 0
        for ln, sym in entries:
            code <<= (ln - prev_len)
            self.huff.append((ln, code, to_signed32(sym)))
            code += 1
            prev_len = ln
        self.huff_single = (entries[0][0] == 0 or len(entries) == 1)
        self.single_val = to_signed32(entries[0][1])

    def _stream(self):
        try:
            return self.streams[self.cid]
        except KeyError:
            raise CramFormatError(
                f"missing external block id {self.cid}")

    def read_int(self):
        c = self.codec
        if c == 1:
            return to_signed32(self._stream().read_itf8())
        if c == 3:
            if self.huff_single:
                return self.single_val
            ln = 0
            code = 0
            for bits, want, sym in self.huff:
                while ln < bits:
                    code = (code << 1) | self.core.read_bit()
                    ln += 1
                if code == want:
                    return sym
            raise CramFormatError("bad huffman code")
        if c == 6:
            return self.core.read(self.nbits) - self.offset
        if c == 7:
            i = 0
            while self.core.read_bit():
                i += 1
            if i == 0:
                n = self.core.read(self.k)
            else:
                n = (1 << (i + self.k - 1)) \
                    | self.core.read(i + self.k - 1)
            return n - self.offset
        if c == 9:
            nz = 0
            while not self.core.read_bit():
                nz += 1
            val = 1
            for _ in range(nz):
                val = (val << 1) | self.core.read_bit()
            return val - self.offset
        raise CramFormatError(f"encoding {c} cannot produce ints")

    def read_byte(self):
        if self.codec == 1:
            return self._stream().read_byte()
        return self.read_int() & 0xFF

    def read_bytes(self):
        """For BYTE_ARRAY_* encodings: one length-delimited array."""
        c = self.codec
        if c == 4:
            n = self.len_dec.read_int()
            vd = self.val_dec
            if vd.codec == 1:
                return vd._stream().read_raw(n)
            return bytes(vd.read_byte() for _ in range(n))
        if c == 5:
            return self._stream().read_until(self.stop)
        raise CramFormatError(f"encoding {c} is not a byte array")

    def read_n_bytes(self, n):
        """Exactly *n* bytes of a byte data series (e.g. QS, BA)."""
        if self.codec == 1:
            return self._stream().read_raw(n)
        return bytes(self.read_byte() for _ in range(n))


class _Stream:
    """Cursor over one decompressed external block."""

    __slots__ = ("data", "pos")

    def __init__(self, data):
        self.data = data
        self.pos = 0

    def read_itf8(self):
        v, self.pos = read_itf8(self.data, self.pos)
        return v

    def read_byte(self):
        b = self.data[self.pos]
        self.pos += 1
        return b

    def read_raw(self, n):
        out = self.data[self.pos:self.pos + n]
        if len(out) != n:
            raise CramFormatError("external block exhausted")
        self.pos += n
        return out

    def read_until(self, stop):
        end = self.data.find(stop, self.pos)
        if end < 0:
            raise CramFormatError("missing stop byte")
        out = self.data[self.pos:end]
        self.pos = end + 1
        return out


# ─────────────────────────── low-level file IO ───────────────────────

def _read_block(buf, pos):
    """One CRAM block. Returns (method, ctype, cid, raw_data, pos)."""
    method = buf[pos]
    ctype = buf[pos + 1]
    pos += 2
    cid, pos = read_itf8(buf, pos)
    comp_sz, pos = read_itf8(buf, pos)
    raw_sz, pos = read_itf8(buf, pos)
    data = buf[pos:pos + comp_sz]
    pos += comp_sz + 4  # + CRC32
    raw = cc.decompress_block(method, data, raw_sz)
    if len(raw) != raw_sz:
        raise CramFormatError(
            f"block inflated to {len(raw)} bytes, expected {raw_sz}")
    return method, ctype, to_signed32(cid), raw, pos


def _write_block(ctype, cid, raw, method=cc.METHOD_GZIP):
    if method == cc.METHOD_GZIP:
        comp = zlib.compress(raw, 6)
        comp = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff" + \
            comp[2:-4] + struct.pack("<II", zlib.crc32(raw) & 0xFFFFFFFF,
                                     len(raw) & 0xFFFFFFFF)
    elif method == cc.METHOD_RAW:
        comp = raw
    else:
        raise CramFormatError("writer supports raw/gzip only")
    body = bytes((method, ctype)) + write_itf8(cid if cid >= 0 else
                                               cid & 0xFFFFFFFF)
    body += write_itf8(len(comp)) + write_itf8(len(raw)) + comp
    return body + struct.pack("<I", zlib.crc32(body) & 0xFFFFFFFF)


class _ContainerHeader:
    __slots__ = ("length", "ref_id", "start", "span", "n_records",
                 "counter", "bases", "n_blocks", "landmarks")


def _read_container_header(fh):
    raw = fh.read(4)
    if len(raw) < 4:
        return None
    h = _ContainerHeader()
    h.length = struct.unpack("<i", raw)[0]
    # remaining header fields are varints; read a bounded chunk
    chunk = fh.read(512)
    pos = 0
    v, pos = read_itf8(chunk, pos)
    h.ref_id = to_signed32(v)
    h.start, pos = read_itf8(chunk, pos)
    h.span, pos = read_itf8(chunk, pos)
    h.n_records, pos = read_itf8(chunk, pos)
    h.counter, pos = read_ltf8(chunk, pos)
    h.bases, pos = read_ltf8(chunk, pos)
    h.n_blocks, pos = read_itf8(chunk, pos)
    h.landmarks, pos = read_itf8_array(chunk, pos)
    pos += 4  # header CRC32
    fh.seek(pos - len(chunk), os.SEEK_CUR)
    return h


def _container_header_bytes(ref_id, start, span, n_records, counter,
                            bases, n_blocks, landmarks, length):
    out = struct.pack("<i", length)
    out += write_itf8(ref_id & 0xFFFFFFFF)
    out += write_itf8(start) + write_itf8(span)
    out += write_itf8(n_records) + write_ltf8(counter)
    out += write_ltf8(bases) + write_itf8(n_blocks)
    out += write_itf8_array(landmarks)
    return out + struct.pack("<I", zlib.crc32(out) & 0xFFFFFFFF)


# ─────────────────────────── compression header ──────────────────────

class _CompressionHeader:
    def __init__(self, raw):
        pos = 0
        # preservation map
        _sz, pos = read_itf8(raw, pos)
        n, pos = read_itf8(raw, pos)
        self.read_names = True
        self.ap_delta = True
        self.ref_required = True
        self.sub_matrix = _default_sub_matrix()
        self.tag_lines = [[]]
        for _ in range(n):
            key = raw[pos:pos + 2].decode("latin-1")
            pos += 2
            if key == "RN":
                self.read_names = bool(raw[pos])
                pos += 1
            elif key == "AP":
                self.ap_delta = bool(raw[pos])
                pos += 1
            elif key == "RR":
                self.ref_required = bool(raw[pos])
                pos += 1
            elif key == "SM":
                self.sub_matrix = raw[pos:pos + 5]
                pos += 5
            elif key == "TD":
                ln, pos = read_itf8(raw, pos)
                blob = raw[pos:pos + ln]
                pos += ln
                self.tag_lines = []
                for line in blob.split(b"\x00")[:-1]:
                    trips = [(line[i:i + 2].decode("latin-1"),
                              chr(line[i + 2]))
                             for i in range(0, len(line), 3)]
                    self.tag_lines.append(trips)
                if not self.tag_lines:
                    self.tag_lines = [[]]
            else:
                raise CramFormatError(
                    f"unknown preservation key {key!r}")
        self.sub, self.sub_inv = _sub_tables(self.sub_matrix)
        # data series encodings
        _sz, pos = read_itf8(raw, pos)
        n, pos = read_itf8(raw, pos)
        self.series = {}
        for _ in range(n):
            key = raw[pos:pos + 2].decode("latin-1")
            pos += 2
            codec, pos = read_itf8(raw, pos)
            ln, pos = read_itf8(raw, pos)
            self.series[key] = (codec, raw[pos:pos + ln])
            pos += ln
        # tag encodings
        _sz, pos = read_itf8(raw, pos)
        n, pos = read_itf8(raw, pos)
        self.tags = {}
        for _ in range(n):
            key, pos = read_itf8(raw, pos)
            codec, pos = read_itf8(raw, pos)
            ln, pos = read_itf8(raw, pos)
            self.tags[key] = (codec, raw[pos:pos + ln])
            pos += ln


# ────────────────────────────── the reader ───────────────────────────

class _SliceCtx:
    """Decoders bound to one slice's blocks."""

    def __init__(self, comp, core_data, streams):
        self.comp = comp
        self.core = BitReader(core_data)
        self.streams = streams
        self._dec = {}
        self._tag_dec = {}

    def dec(self, key):
        d = self._dec.get(key)
        if d is None:
            if key not in self.comp.series:
                raise CramFormatError(f"missing data series {key}")
            codec, params = self.comp.series[key]
            d = _Decoder(codec, params, self.streams, self.core)
            self._dec[key] = d
        return d

    def tag_dec(self, key):
        d = self._tag_dec.get(key)
        if d is None:
            codec, params = self.comp.tags[key]
            d = _Decoder(codec, params, self.streams, self.core)
            self._tag_dec[key] = d
        return d


_TAG_FIXED = {"A": 1, "c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4,
              "f": 4}


def split_bam_tags(blob):
    """Raw BAM tag block -> [(tag, type, value_bytes)]."""
    out = []
    pos = 0
    n = len(blob)
    while pos + 3 <= n:
        tag = blob[pos:pos + 2].decode("latin-1")
        typ = chr(blob[pos + 2])
        pos += 3
        if typ in _TAG_FIXED:
            ln = _TAG_FIXED[typ]
            val = blob[pos:pos + ln]
            pos += ln
        elif typ in "ZH":
            end = blob.index(b"\x00", pos)
            val = blob[pos:end + 1]
            pos = end + 1
        elif typ == "B":
            sub = chr(blob[pos])
            cnt = struct.unpack_from("<I", blob, pos + 1)[0]
            ln = 5 + cnt * _TAG_FIXED[sub]
            val = blob[pos:pos + ln]
            pos += ln
        else:
            raise CramFormatError(f"bad BAM tag type {typ!r}")
        out.append((tag, typ, val))
    return out


class CramReader:
    """Decode a CRAM 3.0 file into BAM :class:`AlignedRead` records.

    *reference* may be a FASTA path or a dict of contig->sequence; it
    is required for mapped reads unless slices embed their reference.
    """

    def __init__(self, path, reference_filename=None):
        self.path = path
        self._fh = open(path, "rb")
        magic = self._fh.read(4)
        if magic != CRAM_MAGIC:
            raise CramFormatError(f"not a CRAM file: {path}")
        self.major, self.minor = self._fh.read(2)
        if self.major != 3:
            raise CramFormatError(
                f"unsupported CRAM version {self.major}.{self.minor} "
                f"(only 3.x)")
        self._fh.read(20)  # file id
        self._ref_source = reference_filename
        self._ref_cache = {}
        # SAM header container
        hdr = _read_container_header(self._fh)
        raw = self._fh.read(hdr.length)
        _m, ctype, _cid, data, _pos = _read_block(raw, 0)
        if ctype != BLOCK_FILE_HEADER:
            raise CramFormatError("first container is not a SAM header")
        l_text = struct.unpack_from("<i", data, 0)[0]
        self.header_text = data[4:4 + l_text].decode(
            "utf-8", "replace").rstrip("\x00")
        self.refs = []
        for line in self.header_text.split("\n"):
            if line.startswith("@SQ"):
                name = ln_len = None
                for f in line.split("\t")[1:]:
                    if f.startswith("SN:"):
                        name = f[3:]
                    elif f.startswith("LN:"):
                        ln_len = int(f[3:])
                self.refs.append((name, ln_len))
        self._rg_ids = [f[3:] for line in self.header_text.split("\n")
                        if line.startswith("@RG")
                        for f in line.split("\t")[1:]
                        if f.startswith("ID:")]
        self._records = None
        self._counter_base = 0

    # ---- reference handling

    def _ref(self, tid):
        if tid < 0:
            return ""
        name = self.refs[tid][0]
        seq = self._ref_cache.get(name)
        if seq is None:
            if isinstance(self._ref_source, dict):
                seq = self._ref_source[name].upper()
            elif self._ref_source:
                self._ref_cache.update(
                    {k: v.upper()
                     for k, v in read_fasta(self._ref_source).items()})
                seq = self._ref_cache[name]
            else:
                raise CramFormatError(
                    "CRAM slice needs a reference; pass --ref-fasta "
                    f"(contig {name})")
            self._ref_cache[name] = seq
        return seq

    # ---- container/slice decoding

    @property
    def records(self):
        if self._records is None:
            recs = []
            while True:
                hdr = _read_container_header(self._fh)
                if hdr is None:
                    break
                raw = self._fh.read(hdr.length)
                if hdr.n_records == 0:
                    if hdr.start == _EOF_POS:
                        break
                    continue
                recs.extend(self._decode_container(hdr, raw))
            self._records = recs
            self._fh.close()
        return self._records

    def _decode_container(self, hdr, raw):
        pos = 0
        _m, ctype, _cid, data, pos = _read_block(raw, pos)
        if ctype != BLOCK_COMPRESSION_HEADER:
            raise CramFormatError("expected compression header block")
        comp = _CompressionHeader(data)
        out = []
        while pos < len(raw):
            _m, ctype, _cid, data, pos = _read_block(raw, pos)
            if ctype != BLOCK_SLICE_HEADER:
                continue
            pos, slice_recs = self._decode_slice(comp, data, raw, pos)
            out.extend(slice_recs)
        return out

    def _decode_slice(self, comp, shdr, raw, pos):
        sp = 0
        ref_id, sp = read_itf8(shdr, sp)
        ref_id = to_signed32(ref_id)
        start, sp = read_itf8(shdr, sp)
        _span, sp = read_itf8(shdr, sp)
        n_rec, sp = read_itf8(shdr, sp)
        counter, sp = read_ltf8(shdr, sp)
        n_blocks, sp = read_itf8(shdr, sp)
        _cids, sp = read_itf8_array(shdr, sp)
        embed_ref, sp = read_itf8(shdr, sp)
        embed_ref = to_signed32(embed_ref)
        core_data = b""
        streams = {}
        for _ in range(n_blocks):
            _m, ctype, cid, data, pos = _read_block(raw, pos)
            if ctype == BLOCK_CORE:
                core_data = data
            else:
                streams[cid] = _Stream(data)
        ctx = _SliceCtx(comp, core_data, streams)
        embedded = streams[embed_ref].data if embed_ref >= 0 else None
        recs = []
        last_pos = start
        for i in range(n_rec):
            rec = self._decode_record(
                ctx, comp, ref_id, last_pos, counter + i, embedded,
                start)
            last_pos = rec["pos1"] if comp.ap_delta else last_pos
            recs.append(rec)
        self._link_mates(recs)
        reads = []
        for rec in recs:
            raw_body = encode_read(
                rec["name"], rec["flag"], rec["tid"], rec["pos1"] - 1,
                rec["mq"], rec["cigar"], rec["seq"], rec["qual"],
                rec["ntid"], rec["npos1"] - 1, rec["tlen"],
                rec["tags"])
            reads.append(AlignedRead(raw_body, self.refs))
        return pos, reads

    def _decode_record(self, ctx, comp, slice_ref, last_pos, counter,
                       embedded, slice_start):
        rec = {}
        bf = ctx.dec("BF").read_int()
        cf = ctx.dec("CF").read_int()
        tid = slice_ref if slice_ref != -2 else ctx.dec("RI").read_int()
        rlen = ctx.dec("RL").read_int()
        ap = ctx.dec("AP").read_int()
        pos1 = (last_pos + ap) if comp.ap_delta else ap
        rg = ctx.dec("RG").read_int()
        if comp.read_names:
            name = ctx.dec("RN").read_bytes().decode("latin-1")
        else:
            name = f"cram-{counter}"
        ntid, npos1, tlen, nf = -1, 0, 0, None
        if cf & CF_DETACHED:
            mf = ctx.dec("MF").read_int()
            if not comp.read_names:
                name = ctx.dec("RN").read_bytes().decode("latin-1")
            ntid = ctx.dec("NS").read_int()
            npos1 = ctx.dec("NP").read_int()
            tlen = ctx.dec("TS").read_int()
            if mf & MF_MATE_REVERSED:
                bf |= 0x20
            if mf & MF_MATE_UNMAPPED:
                bf |= 0x8
        elif cf & CF_MATE_DOWNSTREAM:
            nf = ctx.dec("NF").read_int()
        tl = ctx.dec("TL").read_int()
        tags = bytearray()
        for tag, typ in comp.tag_lines[tl]:
            key = (ord(tag[0]) << 16) | (ord(tag[1]) << 8) | ord(typ)
            val = ctx.tag_dec(key).read_bytes()
            tags += tag.encode("latin-1") + typ.encode("latin-1") + val
        qual = None
        if not (bf & 0x4):
            seq, cigar, qual = self._decode_mapped(
                ctx, comp, tid, pos1, rlen, cf, embedded, slice_start)
            mq = ctx.dec("MQ").read_int()
            if cf & CF_QS_PRESERVED:
                qual = list(ctx.dec("QS").read_n_bytes(rlen))
        else:
            cigar = []
            mq = 0
            if cf & CF_UNKNOWN_BASES:
                seq = ""
            else:
                seq = ctx.dec("BA").read_n_bytes(rlen).decode("latin-1")
            if cf & CF_QS_PRESERVED:
                qual = list(ctx.dec("QS").read_n_bytes(rlen))
        if rg >= 0 and rg < len(self._rg_ids):
            tags += b"RGZ" + self._rg_ids[rg].encode() + b"\x00"
        rec.update(name=name, flag=bf, tid=tid, pos1=pos1, mq=mq,
                   cigar=cigar, seq=seq, qual=qual, ntid=ntid,
                   npos1=npos1, tlen=tlen, nf=nf, tags=bytes(tags),
                   rlen=rlen)
        return rec

    def _decode_mapped(self, ctx, comp, tid, pos1, rlen, cf, embedded,
                       slice_start):
        nfeat = ctx.dec("FN").read_int()
        feats = []
        fpos = 0
        for _ in range(nfeat):
            code = chr(ctx.dec("FC").read_byte())
            fpos += ctx.dec("FP").read_int()
            feats.append((code, fpos))
        if embedded is not None:
            base = slice_start
            ref = embedded
            def ref_at(p0, ln):
                return ref[p0 - (base - 1):p0 - (base - 1) + ln] \
                    .decode("latin-1").upper()
        else:
            ref_full = self._ref(tid)
            def ref_at(p0, ln):
                seg = ref_full[p0:p0 + ln]
                return seg + "N" * (ln - len(seg))
        seq = []
        cig = []
        qual = [0xFF] * rlen
        qpos = 0           # 0-based in read
        rpos = pos1 - 1    # 0-based in reference

        def emit(op, ln):
            if ln <= 0:
                return
            if cig and cig[-1][0] == op:
                cig[-1][1] += ln
            else:
                cig.append([op, ln])

        for i, (code, fp) in enumerate(feats):
            gap = (fp - 1) - qpos
            if gap > 0:
                seq.append(ref_at(rpos, gap))
                emit(0, gap)
                qpos += gap
                rpos += gap
            if code == "X":
                sub_code = ctx.dec("BS").read_int()
                rb = ref_at(rpos, 1)
                ri = _BASE_IDX.get(rb, 4)
                base = comp.sub[ri][sub_code & 3] or "N"
                seq.append(base)
                emit(0, 1)
                qpos += 1
                rpos += 1
            elif code == "B":
                seq.append(chr(ctx.dec("BA").read_byte()))
                q = ctx.dec("QS").read_byte()
                if qpos < rlen:
                    qual[qpos] = q
                emit(0, 1)
                qpos += 1
                rpos += 1
            elif code == "b":
                bb = ctx.dec("BB").read_bytes().decode("latin-1")
                seq.append(bb)
                emit(0, len(bb))
                qpos += len(bb)
                rpos += len(bb)
            elif code == "I":
                ins = ctx.dec("IN").read_bytes().decode("latin-1")
                seq.append(ins)
                emit(1, len(ins))
                qpos += len(ins)
            elif code == "i":
                seq.append(chr(ctx.dec("BA").read_byte()))
                emit(1, 1)
                qpos += 1
            elif code == "D":
                ln = ctx.dec("DL").read_int()
                emit(2, ln)
                rpos += ln
            elif code == "N":
                ln = ctx.dec("RS").read_int()
                emit(3, ln)
                rpos += ln
            elif code == "S":
                sc = ctx.dec("SC").read_bytes().decode("latin-1")
                seq.append(sc)
                emit(4, len(sc))
                qpos += len(sc)
            elif code == "H":
                ln = ctx.dec("HC").read_int()
                emit(5, ln)
            elif code == "P":
                ln = ctx.dec("PD").read_int()
                emit(6, ln)
            elif code == "Q":
                q = ctx.dec("QS").read_byte()
                if 0 <= fp - 1 < rlen:
                    qual[fp - 1] = q
            elif code == "q":
                qq = ctx.dec("QQ").read_bytes()
                for j, q in enumerate(qq):
                    if 0 <= fp - 1 + j < rlen:
                        qual[fp - 1 + j] = q
            else:
                raise CramFormatError(f"unknown feature code {code!r}")
        gap = rlen - qpos
        if gap > 0:
            seq.append(ref_at(rpos, gap))
            emit(0, gap)
        cigar = [(op, ln) for op, ln in cig]
        if not (cf & CF_QS_PRESERVED) and all(q == 0xFF for q in qual):
            qual = None
        return "".join(seq), cigar, qual

    def _link_mates(self, recs):
        for i, rec in enumerate(recs):
            nf = rec.get("nf")
            if nf is None:
                continue
            j = i + nf + 1
            if j >= len(recs):
                continue
            mate = recs[j]
            rec["ntid"] = mate["tid"]
            rec["npos1"] = mate["pos1"]
            mate["ntid"] = rec["tid"]
            mate["npos1"] = rec["pos1"]
            if mate["flag"] & 0x10:
                rec["flag"] |= 0x20
            if mate["flag"] & 0x4:
                rec["flag"] |= 0x8
            if rec["flag"] & 0x10:
                mate["flag"] |= 0x20
            if rec["flag"] & 0x4:
                mate["flag"] |= 0x8
            end_r = rec["pos1"] + sum(
                ln for op, ln in rec["cigar"] if op in (0, 2, 3, 7, 8))
            end_m = mate["pos1"] + sum(
                ln for op, ln in mate["cigar"] if op in (0, 2, 3, 7, 8))
            span = max(end_r, end_m) - min(rec["pos1"], mate["pos1"])
            if rec["pos1"] <= mate["pos1"]:
                rec["tlen"] = span
                mate["tlen"] = -span
            else:
                rec["tlen"] = -span
                mate["tlen"] = span

    def close(self):
        if not self._fh.closed:
            self._fh.close()


# ────────────────────────────── the writer ───────────────────────────

# content ids for the fixed writer profile
_CID = {k: i + 1 for i, k in enumerate(
    ["BF", "CF", "RI", "RL", "AP", "RG", "RN", "MF", "NS", "NP", "TS",
     "TL", "FN", "FC", "FP", "BS", "IN", "DL", "BA", "SC", "HC", "PD",
     "RS", "MQ", "QS", "BB", "QQ"])}
_TAG_CID_BASE = 100


class CramWriter:
    """CRAM 3.0 writer: gzip blocks, EXTERNAL series, detached mates,
    preserved read names, absolute positions, multi-ref slices."""

    def __init__(self, path, header_text, refs,
                 records_per_slice=10000, ap_delta=False,
                 preserve_names=True):
        self.path = path
        self.refs = refs
        self.ap_delta = ap_delta
        self.preserve_names = preserve_names
        self._fh = open(path, "wb")
        self._fh.write(CRAM_MAGIC + bytes((3, 0)))
        fid = os.path.basename(path).encode()[:20]
        self._fh.write(fid + b"\x00" * (20 - len(fid)))
        text = header_text if header_text.endswith("\n") \
            else header_text + "\n"
        hdr_block = _write_block(
            BLOCK_FILE_HEADER, 0,
            struct.pack("<i", len(text)) + text.encode())
        self._fh.write(_container_header_bytes(
            -1, 0, 0, 0, 0, 0, 1, [0], len(hdr_block)))
        self._fh.write(hdr_block)
        self._pending = []
        self._counter = 0
        self._per_slice = records_per_slice
        self.sub_matrix = _default_sub_matrix()
        _sub, self.sub_inv = _sub_tables(self.sub_matrix)

    def write(self, read):
        """Queue one :class:`AlignedRead`."""
        self._pending.append(read)
        if len(self._pending) >= self._per_slice:
            self.flush()

    def flush(self):
        if not self._pending:
            return
        self._write_container(self._pending)
        self._pending = []

    def _features_for(self, read, ref):
        """(features, has_ref) from the read's CIGAR + seq vs *ref*."""
        feats = []
        seq = read.query_sequence or ""
        quals = read.query_qualities
        qpos = 0
        rpos = read.pos
        for op, ln in (read.cigartuples or []):
            if op in (0, 7, 8):  # M/=/X
                for i in range(ln):
                    rb = ref[rpos + i:rpos + i + 1].upper() or "N"
                    qb = seq[qpos + i].upper()
                    if qb == rb:
                        continue
                    code = self.sub_inv[_BASE_IDX.get(rb, 4)].get(qb)
                    if rb in _BASE_IDX and code is not None:
                        feats.append(("X", qpos + i + 1, code))
                    else:
                        q = quals[qpos + i] if quals else 0xFF
                        feats.append(("B", qpos + i + 1, (qb, q)))
                qpos += ln
                rpos += ln
            elif op == 1:  # I
                ins = seq[qpos:qpos + ln]
                if ln == 1:
                    feats.append(("i", qpos + 1, ins))
                else:
                    feats.append(("I", qpos + 1, ins))
                qpos += ln
            elif op == 2:  # D
                feats.append(("D", qpos + 1, ln))
                rpos += ln
            elif op == 3:  # N
                feats.append(("N", qpos + 1, ln))
                rpos += ln
            elif op == 4:  # S
                feats.append(("S", qpos + 1, seq[qpos:qpos + ln]))
                qpos += ln
            elif op == 5:  # H
                feats.append(("H", qpos + 1, ln))
            elif op == 6:  # P
                feats.append(("P", qpos + 1, ln))
        return feats

    def _write_container(self, reads):
        ext = {cid: bytearray() for cid in _CID.values()}
        core_n_bases = 0
        tag_lines = []
        tag_line_index = {}
        tag_ext = {}
        tag_keys = {}

        def put_int(key, v):
            ext[_CID[key]] += write_itf8(v & 0xFFFFFFFF)

        def put_bytes_stop(key, b, stop=b"\t"):
            ext[_CID[key]] += b + stop

        def put_array(key, b):
            ext[_CID[key]] += write_itf8(len(b)) + b

        ref_cache = {}
        last_ap = 0  # AP-delta base: the slice header's start (0)

        def ref_of(tid):
            if tid < 0:
                return ""
            if tid not in ref_cache:
                ref_cache[tid] = self._ref_lookup(tid)
            return ref_cache[tid]

        for read in reads:
            bf = read.flag
            quals = read.query_qualities
            cf = CF_DETACHED | (CF_QS_PRESERVED if quals else 0)
            seq = read.query_sequence or ""
            if not seq and (bf & 0x4):
                cf |= CF_UNKNOWN_BASES
            put_int("BF", bf & ~0x28)
            put_int("CF", cf)
            put_int("RI", read.tid)
            put_int("RL", len(seq))
            ap = read.pos + 1
            put_int("AP", (ap - last_ap) if self.ap_delta else ap)
            last_ap = ap
            put_int("RG", -1)
            if self.preserve_names:
                put_bytes_stop("RN", read.query_name.encode())
            mf = ((MF_MATE_REVERSED if bf & 0x20 else 0)
                  | (MF_MATE_UNMAPPED if bf & 0x8 else 0))
            put_int("MF", mf)
            if not self.preserve_names:
                # detached records still carry the mate/read name so
                # pairing survives (spec decode order: after MF)
                put_bytes_stop("RN", read.query_name.encode())
            put_int("NS", read.next_tid)
            put_int("NP", read.next_pos + 1)
            put_int("TS", read.tlen)
            trips = tuple((t, y) for t, y, _v in
                          split_bam_tags(read.raw_tags()))
            tl = tag_line_index.get(trips)
            if tl is None:
                tl = len(tag_lines)
                tag_lines.append(trips)
                tag_line_index[trips] = tl
            put_int("TL", tl)
            for tag, typ, val in split_bam_tags(read.raw_tags()):
                key = (ord(tag[0]) << 16) | (ord(tag[1]) << 8) \
                    | ord(typ)
                if key not in tag_keys:
                    cid = _TAG_CID_BASE + len(tag_keys)
                    tag_keys[key] = cid
                    tag_ext[cid] = bytearray()
                cid = tag_keys[key]
                tag_ext[cid] += write_itf8(len(val)) + val
            if not (bf & 0x4):
                feats = self._features_for(read, ref_of(read.tid))
                put_int("FN", len(feats))
                prev = 0
                for code, fp, payload in feats:
                    ext[_CID["FC"]].append(ord(code))
                    put_int("FP", fp - prev)
                    prev = fp
                    if code == "X":
                        put_int("BS", payload)
                    elif code == "B":
                        ext[_CID["BA"]].append(ord(payload[0]))
                        ext[_CID["QS"]].append(payload[1])
                    elif code == "I":
                        put_array("IN", payload.encode())
                    elif code == "i":
                        ext[_CID["BA"]] += payload.encode()
                    elif code == "D":
                        put_int("DL", payload)
                    elif code == "N":
                        put_int("RS", payload)
                    elif code == "S":
                        put_array("SC", payload.encode())
                    elif code == "H":
                        put_int("HC", payload)
                    elif code == "P":
                        put_int("PD", payload)
                put_int("MQ", read.mapping_quality)
                if quals:
                    ext[_CID["QS"]] += bytes(quals)
            else:
                if not (cf & CF_UNKNOWN_BASES):
                    ext[_CID["BA"]] += seq.encode()
                if quals:
                    ext[_CID["QS"]] += bytes(quals)
            core_n_bases += len(seq)

        comp_raw = self._compression_header(tag_lines, tag_keys)
        blocks = [_write_block(BLOCK_COMPRESSION_HEADER, 0, comp_raw)]
        used = [(cid, bytes(b)) for cid, b in
                list(ext.items()) + list(tag_ext.items()) if b]
        shdr = write_itf8(-2 & 0xFFFFFFFF) + write_itf8(0) \
            + write_itf8(0) + write_itf8(len(reads)) \
            + write_ltf8(self._counter) \
            + write_itf8(len(used) + 1) \
            + write_itf8_array([cid for cid, _ in used]) \
            + write_itf8(-1 & 0xFFFFFFFF) + b"\x00" * 16
        blocks.append(_write_block(BLOCK_SLICE_HEADER, 0, shdr))
        blocks.append(_write_block(BLOCK_CORE, 0, b"",
                                   method=cc.METHOD_RAW))
        for cid, data in used:
            blocks.append(_write_block(BLOCK_EXTERNAL, cid, data))
        body = b"".join(blocks)
        landmarks = [len(blocks[0])]
        self._fh.write(_container_header_bytes(
            -2, 0, 0, len(reads), self._counter, core_n_bases,
            len(blocks), landmarks, len(body)))
        self._fh.write(body)
        self._counter += len(reads)

    def _compression_header(self, tag_lines, tag_keys):
        td_blob = b"".join(
            b"".join(t.encode() + y.encode() for t, y in line)
            + b"\x00" for line in (tag_lines or [()]))
        pres_entries = [
            (b"RN", b"\x01" if self.preserve_names else b"\x00"),
            (b"AP", b"\x01" if self.ap_delta else b"\x00"),
            (b"RR", b"\x01"),
            (b"SM", self.sub_matrix),
            (b"TD", write_itf8(len(td_blob)) + td_blob)]
        pres = write_itf8(len(pres_entries))
        for k, v in pres_entries:
            pres += k + v
        pres = write_itf8(len(pres)) + pres

        def ext_enc(cid):
            params = write_itf8(cid)
            return write_itf8(1) + write_itf8(len(params)) + params

        def bal_enc(cid):
            inner = ext_enc(cid)
            params = inner + inner
            return write_itf8(4) + write_itf8(len(params)) + params

        def bas_enc(cid, stop):
            params = bytes((stop,)) + write_itf8(cid)
            return write_itf8(5) + write_itf8(len(params)) + params

        series = []
        for key in ["BF", "CF", "RI", "RL", "AP", "RG", "MF", "NS",
                    "NP", "TS", "TL", "FN", "FC", "FP", "BS", "DL",
                    "BA", "HC", "PD", "RS", "MQ", "QS", "BB", "QQ"]:
            series.append((key.encode(), ext_enc(_CID[key])))
        series.append((b"RN", bas_enc(_CID["RN"], 0x09)))
        series.append((b"IN", bal_enc(_CID["IN"])))
        series.append((b"SC", bal_enc(_CID["SC"])))
        dse = write_itf8(len(series))
        for k, v in series:
            dse += k + v
        dse = write_itf8(len(dse)) + dse

        tenc = write_itf8(len(tag_keys))
        for key, cid in tag_keys.items():
            tenc += write_itf8(key) + bal_enc(cid)
        tenc = write_itf8(len(tenc)) + tenc
        return pres + dse + tenc

    def _ref_lookup(self, tid):
        raise CramFormatError(
            "CramWriter.ref_seqs must be set for mapped reads")

    def set_reference(self, ref):
        """*ref*: dict contig->sequence or FASTA path."""
        if isinstance(ref, str):
            ref = {k: v.upper() for k, v in read_fasta(ref).items()}
        else:
            ref = {k: v.upper() for k, v in ref.items()}

        def lookup(tid):
            return ref[self.refs[tid][0]]
        self._ref_lookup = lookup

    def close(self):
        self.flush()
        self._fh.write(EOF_CONTAINER)
        self._fh.close()


#: records per spill chunk for the external-sort conversion path
_CRAM_SPILL_RECORDS = 500_000


def cram_to_bam(cram_path, bam_path, reference_filename=None,
                sort=True, index=True):
    """Streaming CRAM -> BAM conversion (the compatibility bridge that
    lets every streaming/indexed BAM consumer accept CRAM input).

    Memory is bounded at WGS scale: records spill to temporary sorted
    BAM chunks every ``_CRAM_SPILL_RECORDS`` records and a k-way merge
    writes the final coordinate-sorted, indexed BAM — the pipelines
    auto-convert CRAM inputs up front, so the conversion must never
    hold the whole dataset in RAM (CRAM slices are usually already
    coordinate-sorted, making each chunk sort nearly free).
    """
    import heapq

    reader = CramReader(cram_path, reference_filename)

    def _chunks():
        buf = []
        for read in reader.records:
            buf.append((read.tid, read.pos, read.to_raw()))
            if len(buf) >= _CRAM_SPILL_RECORDS:
                yield buf
                buf = []
        yield buf

    def _sort_key(rec):
        tid, pos, _raw = rec
        return (tid if tid >= 0 else 1 << 30, pos)

    chunk_paths = []
    tmpdir = tempfile.mkdtemp(prefix="kdf_cram2bam_")
    try:
        first = None
        for i, buf in enumerate(_chunks()):
            if sort:
                buf.sort(key=_sort_key)
            if i == 0:
                first = buf
                continue
            # second chunk arrived: spill the first too
            if len(chunk_paths) == 0 and first is not None:
                chunk_paths.append(
                    _spill_chunk(tmpdir, 0, first, reader))
                first = None
            chunk_paths.append(_spill_chunk(tmpdir, i, buf, reader))

        writer = BamWriter(bam_path, reader.header_text, reader.refs)
        if first is not None:
            # everything fit one chunk — write directly
            for tid, pos, raw in first:
                writer.write_raw(tid, pos, raw)
            writer.close(sort=False, index=index)
            return bam_path

        streams = [_iter_chunk(p_, reader) for p_ in chunk_paths]
        if sort:
            merged = heapq.merge(*streams, key=_sort_key)
        else:
            merged = (rec for st in streams for rec in st)
        for tid, pos, raw in merged:
            writer.write_raw(tid, pos, raw)
        writer.close(sort=False, index=index)
        return bam_path
    finally:
        import shutil
        shutil.rmtree(tmpdir, ignore_errors=True)


def _spill_chunk(tmpdir, i, buf, reader):
    """Write one sorted record chunk as a headerless temp BAM body."""
    path = os.path.join(tmpdir, f"chunk_{i:05d}.bgz")
    from kmer_denovo_filter_tpu.htsio.bgzf import BgzfWriter
    import struct as _struct
    with BgzfWriter(path) as out:
        for tid, pos, raw in buf:
            out.write(_struct.pack("<iii", tid, pos, len(raw)) + raw)
    return path


def _iter_chunk(path, reader):
    """Stream one spilled chunk block-at-a-time (the k-way merge holds
    one BGZF block per chunk in memory, never a whole chunk)."""
    import struct as _struct

    from kmer_denovo_filter_tpu.htsio.bgzf import BgzfReader
    fh = BgzfReader(path)
    while True:
        head = fh.read(12)
        if len(head) < 12:
            return
        tid, pos, ln = _struct.unpack("<iii", head)
        raw = fh.read(ln)
        if len(raw) < ln:
            return
        yield tid, pos, raw


def converted_bam_path(cram_path, reference_filename=None):
    """Return a BAM equivalent of *cram_path*, converting and caching
    next to it (or in a temp dir when the directory is read-only)."""
    cache = cram_path + ".converted.bam"
    if os.path.exists(cache) and (
            os.path.getmtime(cache) >= os.path.getmtime(cram_path)):
        return cache
    try:
        return cram_to_bam(cram_path, cache, reference_filename)
    except OSError:
        tmp = os.path.join(
            tempfile.gettempdir(),
            os.path.basename(cram_path) + ".converted.bam")
        return cram_to_bam(cram_path, tmp, reference_filename)
