"""Pallas sweep kernel vs XLA reference (interpreter mode)."""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from kmer_denovo_filter_tpu import kmer as K
from kmer_denovo_filter_tpu.ops import device as dev
from kmer_denovo_filter_tpu.ops import encode as enc
from kmer_denovo_filter_tpu.ops.pallas_probe import pallas_small_tally


@pytest.mark.parametrize("k,alphabet", [(31, "ACGT"), (31, "ACGTACGTN"),
                                        (15, "ACGT")])
def test_matches_xla_sweep(k, alphabet):
    rng = random.Random(k + len(alphabet))
    reads = ["".join(rng.choice(alphabet) for _ in range(160))
             for _ in range(256)]
    codes = np.stack([
        enc.ASCII_TO_CODE[np.frombuffer(s.encode(), np.uint8)]
        for s in reads])
    lens = np.full(256, 160, np.int32)
    lens[::5] = 120  # ragged lengths
    km = sorted({c for s in reads[:30]
                 for c in K.extract_read_kmers(s, k)[0].values()})
    keys = dev.pad_pow2_rows(enc.kmers_to_keys(km, k),
                             np.uint32(0xFFFFFFFF))
    if keys.shape[1] == 1:  # k <= 15: widen to the kernel's 2-word form
        keys = np.concatenate(
            [keys, np.zeros_like(keys)], axis=1)
        keys[(keys[:, 0] == 0xFFFFFFFF), 1] = 0xFFFFFFFF
    acc0 = jnp.zeros(keys.shape[0], jnp.int32)
    w = enc.words_per_kmer(k)
    kw = enc.kmers_to_keys(km, k)
    ref_keys = dev.pad_pow2_rows(kw, np.uint32(0xFFFFFFFF))
    ref = np.asarray(dev.small_tally_step(
        jnp.asarray(ref_keys), jnp.zeros(ref_keys.shape[0], jnp.int32),
        jnp.asarray(codes), jnp.asarray(lens), k, w, 2048))
    got = np.asarray(pallas_small_tally(
        jnp.asarray(codes), jnp.asarray(lens),
        jnp.asarray(np.ascontiguousarray(keys[:, 0])),
        jnp.asarray(np.ascontiguousarray(keys[:, 1])),
        k, block_reads=128, m_tile=128, interpret=True))
    assert (got[:ref.shape[0]] == ref).all()
    assert got[ref.shape[0]:].sum() == 0
