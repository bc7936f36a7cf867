"""Synthetic BAM/VCF/FASTA builders for tests (no pysam needed).

Plays the role of reference tests/helpers.py but uses the package's
own writers, so the full test suite runs with zero external binaries.
"""

import hashlib

from kmer_denovo_filter_tpu.htsio.bam import BamWriter, encode_read
from kmer_denovo_filter_tpu.htsio.bgzf import BgzfWriter
from kmer_denovo_filter_tpu.htsio.fasta import write_fai
from kmer_denovo_filter_tpu.htsio.tabix import tabix_index


def make_ref_seq(length=200, seed_prefix=""):
    """Deterministic pseudo-random reference sequence (MD5-seeded)."""
    bases = "ACGT"
    out = []
    for i in range(length):
        h = hashlib.md5(f"{seed_prefix}{i}".encode()).hexdigest()
        out.append(bases[int(h, 16) % 4])
    return "".join(out)


def create_ref_fasta(path, chrom="chr1", length=200):
    """Write a small deterministic reference FASTA + .fai."""
    seq = make_ref_seq(length)
    with open(path, "w") as fh:
        fh.write(f">{chrom}\n{seq}\n")
    write_fai(path)
    return seq


def quals_from_string(qual_str):
    return [ord(c) - 33 for c in qual_str]


def create_bam(path, chrom, reads, ref_length=300):
    """BAM from (name, pos, seq[, qual_str[, cigartuples]]) tuples.

    ``pos`` is 0-based; default CIGAR is all-M; writes a sorted,
    indexed BAM.
    """
    header = f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:{chrom}\tLN:{ref_length}\n"
    writer = BamWriter(path, header, [(chrom, ref_length)])
    for entry in reads:
        name, pos, seq, *rest = entry
        qual_str = rest[0] if rest else None
        cigar = rest[1] if len(rest) > 1 else [(0, len(seq))]
        quals = (quals_from_string(qual_str) if qual_str is not None
                 else [40] * len(seq))
        raw = encode_read(name, 0, 0, pos, 60, cigar, seq, quals)
        writer.write_raw(0, pos, raw)
    writer.close(sort=True, index=True)


def create_bam_with_flags(path, chroms, chrom_lengths, reads):
    """BAM supporting flags / SA tags / supplementary alignments.

    ``reads`` is a list of dicts with keys: name, chrom_idx, pos, seq,
    and optional cigar, flag, sa_tag, mapq.
    """
    header = "@HD\tVN:1.6\tSO:coordinate\n" + "".join(
        f"@SQ\tSN:{c}\tLN:{ln}\n" for c, ln in zip(chroms, chrom_lengths))
    writer = BamWriter(path, header, list(zip(chroms, chrom_lengths)))
    import struct
    for entry in reads:
        seq = entry["seq"]
        tags = b""
        if "sa_tag" in entry:
            tags = b"SAZ" + entry["sa_tag"].encode() + b"\x00"
        raw = encode_read(
            entry["name"], entry.get("flag", 0),
            entry.get("chrom_idx", 0), entry["pos"],
            entry.get("mapq", 60),
            entry.get("cigar", [(0, len(seq))]),
            seq, [40] * len(seq),
            next_tid=entry.get("next_tid", -1),
            next_pos=entry.get("next_pos", -1),
            tags=tags)
        writer.write_raw(entry.get("chrom_idx", 0), entry["pos"], raw)
    writer.close(sort=True, index=True)


def create_vcf(path, chrom, variants, sample="HG002", gts=None,
               contig_length=300):
    """bgzipped + tabix-indexed VCF from (pos_1based, ref, alt) tuples.

    *gts* optionally supplies a GT string per variant (default "0/1").
    """
    lines = [
        "##fileformat=VCFv4.2",
        f"##contig=<ID={chrom},length={contig_length}>",
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        f"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t{sample}",
    ]
    for i, (pos, ref, alt) in enumerate(variants):
        gt = gts[i] if gts else "0/1"
        lines.append(
            f"{chrom}\t{pos}\t.\t{ref}\t{alt}\t.\tPASS\t.\tGT\t{gt}")
    with BgzfWriter(path) as out:
        out.write(("\n".join(lines) + "\n").encode())
    tabix_index(path, preset="vcf", force=True)
