"""Jellyfish 2 ``binary/sorted`` index support (``--ref-jf`` compat + export).

Reference users pass prebuilt ``.jf`` reference indexes
(``--ref-jf``, reference cli.py:173 and tests/conftest.py:103).  The
``binary/sorted`` format — what ``jellyfish count -o`` writes when the
table fits one chunk — is a JSON header followed by fixed-width
(key, count) records, so it can be ingested directly into the device
key representation.  The mmap'd ``binary/hash`` format (huge WGS
indexes) is not parsed; callers fall back to rebuilding from the
reference FASTA, which yields an identical canonical k-mer set.
"""

import json

import numpy as np


class JellyfishParseError(ValueError):
    pass


def read_jf_header(path):
    """Return (header_dict, data_offset) for a .jf file."""
    with open(path, "rb") as fh:
        prefix = fh.read(9)
        if len(prefix) < 9 or not prefix.isdigit():
            raise JellyfishParseError(f"not a jellyfish file: {path}")
        hlen = int(prefix)
        hdr = fh.read(hlen)
    try:
        meta = json.loads(hdr.decode("utf-8", "replace").rstrip("\x00"))
    except json.JSONDecodeError as e:
        raise JellyfishParseError(f"bad jellyfish header in {path}: {e}")
    return meta, 9 + hlen


def load_sorted_jf(path, expect_k=None):
    """Load a ``binary/sorted`` .jf index into (keys, counts).

    Returns ``(keys, counts, k)`` where *keys* is the engine's
    (N, W) uint32 big-endian word representation in FILE order (which
    is jellyfish's internal matrix-hash order, NOT numeric key order —
    callers sort before building an index) and *counts* is int64.
    """
    meta, off = read_jf_header(path)
    if meta.get("format") != "binary/sorted":
        raise JellyfishParseError(
            f"unsupported jellyfish format {meta.get('format')!r} in {path}"
        )
    key_len = meta["key_len"]          # bits = 2k
    k = key_len // 2
    if expect_k is not None and k != expect_k:
        raise JellyfishParseError(
            f"{path} is a k={k} index, expected k={expect_k}")
    key_bytes = (key_len + 7) // 8
    if key_bytes > 8:
        raise JellyfishParseError(
            f"{path}: k={k} sorted .jf keys exceed 64 bits; rebuild "
            f"the reference set from FASTA instead")
    val_bytes = 4  # observed fixed-width little-endian count
    rec = key_bytes + val_bytes
    data = np.fromfile(path, dtype=np.uint8, offset=off)
    n = data.shape[0] // rec
    data = data[:n * rec].reshape(n, rec)
    # key: little-endian integer, bases packed big-endian within 2k bits
    key_le = data[:, :key_bytes].astype(np.uint64)
    keys_int = np.zeros(n, dtype=np.uint64)
    for b in range(key_bytes):
        keys_int |= key_le[:, b] << np.uint64(8 * b)
    counts = data[:, key_bytes:].astype(np.uint32)
    cvals = np.zeros(n, dtype=np.int64)
    for b in range(val_bytes):
        cvals |= counts[:, b].astype(np.int64) << (8 * b)
    # Convert to the engine layout: 32W-bit left-aligned words.
    from kmer_denovo_filter_tpu.ops.encode import words_per_kmer
    w = words_per_kmer(k)
    shifted = keys_int << np.uint64(32 * w - key_len)
    keys = np.zeros((n, w), dtype=np.uint32)
    for j in range(w):
        keys[:, j] = (shifted >> np.uint64(32 * (w - 1 - j))).astype(
            np.uint32)
    return keys, cvals, k


def write_sorted_jf(path, keys, counts, k):
    """Write a ``binary/sorted`` .jf file from engine-layout keys.

    The exact inverse of :func:`load_sorted_jf`: 9-digit ASCII header
    length + JSON metadata + fixed-width little-endian (key, count)
    records, so exported indexes interoperate with jellyfish-ecosystem
    tooling and round-trip losslessly through this module (the export
    analog of the reference's cached ``{ref}.k{k}.jf`` artifacts,
    reference core/jellyfish_wrappers.py:286-332).  k <= 31 only (the
    format's sorted variant carries <= 64-bit keys).
    """
    from kmer_denovo_filter_tpu.ops.encode import words_per_kmer
    key_len = 2 * k
    key_bytes = (key_len + 7) // 8
    if key_bytes > 8:
        raise JellyfishParseError(
            f"binary/sorted .jf keys are <= 64 bits (k <= 31); got "
            f"k={k}")
    w = words_per_kmer(k)
    keys = np.ascontiguousarray(keys, dtype=np.uint32)
    n = keys.shape[0]
    # engine layout (32W-bit left-aligned words) -> right-aligned int
    packed = np.zeros(n, dtype=np.uint64)
    for j in range(w):
        packed |= keys[:, j].astype(np.uint64) << np.uint64(
            32 * (w - 1 - j))
    packed >>= np.uint64(32 * w - key_len)
    order = np.argsort(packed, kind="stable")
    packed = packed[order]
    cvals = np.asarray(counts, dtype=np.int64)[order]
    meta = {
        "alignment": 8, "canonical": True,
        "cmdline": "kmer_denovo_filter_tpu export",
        "counter_len": 4, "format": "binary/sorted",
        "key_len": key_len, "max_reprobe": 126,
        "size": max(16, 1 << (n - 1).bit_length() if n else 4),
        "val_len": 4,
    }
    hdr = json.dumps(meta, sort_keys=True).encode()
    rec = np.zeros((n, key_bytes + 4), dtype=np.uint8)
    for b in range(key_bytes):
        rec[:, b] = (packed >> np.uint64(8 * b)).astype(np.uint8)
    for b in range(4):
        rec[:, key_bytes + b] = ((cvals >> (8 * b)) & 0xFF).astype(
            np.uint8)
    with open(path, "wb") as fh:
        fh.write(f"{len(hdr):09d}".encode())
        fh.write(hdr)
        fh.write(rec.tobytes())
