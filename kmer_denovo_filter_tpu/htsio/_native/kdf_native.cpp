// kdf_native — C++ host-side accelerator for the TPU k-mer engine.
//
// Replaces the role the reference delegates to samtools/htslib
// subprocesses (reference core/jellyfish_wrappers.py:158–199): BGZF
// block inflation with a thread pool (BGZF blocks are independent
// gzip members, so decompression parallelises perfectly — the
// `samtools -@ N` analog) and BAM record scanning into flat arrays
// (record offsets + fixed fields + 2-bit base codes) that feed the
// device input pipeline with zero Python-per-record overhead.
//
// Exposed as a C ABI consumed via ctypes (htsio/native.py).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

extern "C" {

struct InflateResult {
  uint8_t* data;
  int64_t size;
  int32_t error;  // 0 ok, nonzero = error code
};

// ── BGZF multithreaded inflation ───────────────────────────────────

struct BlockSpec {
  int64_t coffset;     // compressed offset of the block
  int64_t payload_off; // offset of deflate payload within file
  int32_t payload_len;
  int64_t uoffset;     // uncompressed output offset
  int32_t isize;       // uncompressed size
};

static int scan_blocks(const uint8_t* buf, int64_t n,
                       std::vector<BlockSpec>& specs, int64_t* total_out) {
  int64_t off = 0;
  int64_t uoff = 0;
  while (off + 18 <= n) {
    if (!(buf[off] == 0x1f && buf[off + 1] == 0x8b && buf[off + 2] == 8 &&
          (buf[off + 3] & 4))) {
      return -1;  // not a BGZF member
    }
    uint16_t xlen;
    memcpy(&xlen, buf + off + 10, 2);
    int64_t extra = off + 12;
    int32_t bsize = -1;
    int64_t end_extra = extra + xlen;
    while (extra + 4 <= end_extra) {
      uint8_t si1 = buf[extra], si2 = buf[extra + 1];
      uint16_t slen;
      memcpy(&slen, buf + extra + 2, 2);
      if (si1 == 66 && si2 == 67 && slen == 2) {
        uint16_t bs;
        memcpy(&bs, buf + extra + 4, 2);
        bsize = (int32_t)bs + 1;
        break;
      }
      extra += 4 + slen;
    }
    if (bsize < 0 || off + bsize > n) return -2;
    int32_t payload_len = bsize - 12 - xlen - 8;
    uint32_t isize;
    memcpy(&isize, buf + off + bsize - 4, 4);
    if (payload_len > 0 && isize > 0) {
      specs.push_back({off, end_extra, payload_len, uoff, (int32_t)isize});
      uoff += isize;
    }
    off += bsize;
  }
  *total_out = uoff;
  return 0;
}

static void inflate_range(const uint8_t* buf, const BlockSpec* specs,
                          size_t lo, size_t hi, uint8_t* out,
                          int* err_flag) {
  for (size_t i = lo; i < hi; ++i) {
    const BlockSpec& b = specs[i];
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, -15) != Z_OK) { *err_flag = 1; return; }
    zs.next_in = const_cast<Bytef*>(buf + b.payload_off);
    zs.avail_in = b.payload_len;
    zs.next_out = out + b.uoffset;
    zs.avail_out = b.isize;
    int rc = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    if (rc != Z_STREAM_END || (int32_t)zs.total_out != b.isize) {
      *err_flag = 1;
      return;
    }
  }
}

// Inflate an entire BGZF file into one buffer (parallel across blocks).
InflateResult bgzf_inflate_file(const char* path, int n_threads) {
  InflateResult r = {nullptr, 0, 0};
  FILE* fh = fopen(path, "rb");
  if (!fh) { r.error = 1; return r; }
  fseek(fh, 0, SEEK_END);
  int64_t fsize = ftell(fh);
  fseek(fh, 0, SEEK_SET);
  std::vector<uint8_t> raw((size_t)fsize);
  if (fsize > 0 && fread(raw.data(), 1, (size_t)fsize, fh) != (size_t)fsize) {
    fclose(fh);
    r.error = 2;
    return r;
  }
  fclose(fh);

  std::vector<BlockSpec> specs;
  int64_t total = 0;
  if (scan_blocks(raw.data(), fsize, specs, &total) != 0) {
    r.error = 3;
    return r;
  }
  uint8_t* out = (uint8_t*)malloc((size_t)total ? (size_t)total : 1);
  if (!out) { r.error = 4; return r; }

  int nt = n_threads > 0 ? n_threads : 1;
  if ((size_t)nt > specs.size()) nt = specs.size() ? (int)specs.size() : 1;
  std::vector<std::thread> threads;
  std::vector<int> errs(nt, 0);
  size_t per = (specs.size() + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    size_t lo = t * per;
    size_t hi = lo + per < specs.size() ? lo + per : specs.size();
    if (lo >= hi) break;
    threads.emplace_back(inflate_range, raw.data(), specs.data(), lo, hi,
                         out, &errs[t]);
  }
  for (auto& th : threads) th.join();
  for (int e : errs)
    if (e) {
      free(out);
      r.error = 5;
      return r;
    }
  r.data = out;
  r.size = total;
  return r;
}

void kdf_free(void* p) { free(p); }

// ── BAM record scan ────────────────────────────────────────────────
// Walks the decompressed BAM (starting at the first alignment record)
// and fills flat per-record arrays.  `codes` receives 2-bit base codes
// (4 = N) for records passing `exclude_flags`, concatenated, with
// per-record offsets in `code_offsets` (-1 for excluded records).

static const uint8_t NT16_TO_2BIT[16] = {4, 0, 1, 4, 2, 4, 4, 4,
                                         3, 4, 4, 4, 4, 4, 4, 4};

int64_t bam_count_records(const uint8_t* data, int64_t size) {
  int64_t off = 0, n = 0;
  while (off + 4 <= size) {
    int32_t block_size;
    memcpy(&block_size, data + off, 4);
    if (block_size <= 0 || off + 4 + block_size > size) break;
    off += 4 + block_size;
    ++n;
  }
  return n;
}

// Fixed fields per record; caller allocates arrays of length n_records.
int32_t bam_scan_records(const uint8_t* data, int64_t size,
                         int64_t n_records,
                         int64_t* rec_offsets,   // offset of record body
                         int32_t* rec_sizes,     // body size
                         int32_t* tids, int32_t* poss,
                         uint16_t* flags, uint8_t* mapqs,
                         int32_t* l_seqs, int32_t* ref_spans) {
  int64_t off = 0;
  int64_t i = 0;
  while (off + 4 <= size && i < n_records) {
    int32_t block_size;
    memcpy(&block_size, data + off, 4);
    // A record body is at least the 32-byte fixed section; reject
    // truncated/corrupt sizes before touching any per-record field.
    if (block_size < 32 || off + 4 + block_size > size) break;
    const uint8_t* rec = data + off + 4;
    rec_offsets[i] = off + 4;
    rec_sizes[i] = block_size;
    memcpy(&tids[i], rec, 4);
    memcpy(&poss[i], rec + 4, 4);
    uint8_t l_read_name = rec[8];
    mapqs[i] = rec[9];
    uint16_t n_cigar;
    memcpy(&n_cigar, rec + 12, 2);
    memcpy(&flags[i], rec + 14, 2);
    memcpy(&l_seqs[i], rec + 16, 4);
    int32_t l_seq = l_seqs[i];
    // variable sections (name, cigar, packed seq) must fit the body
    if (l_seq < 0 ||
        32 + (int64_t)l_read_name + 4 * (int64_t)n_cigar +
                ((int64_t)l_seq + 1) / 2 >
            (int64_t)block_size)
      break;
    // reference span from CIGAR (ops M/D/N/=/X consume reference)
    int32_t span = 0;
    const uint8_t* cig = rec + 32 + l_read_name;
    for (uint16_t c = 0; c < n_cigar; ++c) {
      uint32_t v;
      memcpy(&v, cig + 4 * c, 4);
      uint32_t op = v & 0xF;
      if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8)
        span += v >> 4;
    }
    ref_spans[i] = span;
    off += 4 + block_size;
    ++i;
  }
  return (int32_t)i;
}

// Extract 2-bit codes for records with (flag & exclude_flags) == 0.
// codes buffer must hold sum of l_seq over kept records; offsets array
// length n_records (+1 sentinel slot filled by caller convention).
int64_t bam_extract_codes(const uint8_t* data,
                          const int64_t* rec_offsets,
                          const int32_t* rec_sizes,
                          const uint16_t* flags, const int32_t* l_seqs,
                          int64_t n_records, uint16_t exclude_flags,
                          uint8_t* codes, int64_t* code_offsets) {
  int64_t pos = 0;
  for (int64_t i = 0; i < n_records; ++i) {
    if (flags[i] & exclude_flags) {
      code_offsets[i] = -1;
      continue;
    }
    const uint8_t* rec = data + rec_offsets[i];
    uint8_t l_read_name = rec[8];
    uint16_t n_cigar;
    memcpy(&n_cigar, rec + 12, 2);
    int32_t l_seq = l_seqs[i];
    // re-validate against the record body size: a corrupt record must
    // not drive nibble reads past the buffer (bam_scan_records already
    // filters these, but this entry point takes caller-supplied arrays)
    if (l_seq < 0 ||
        32 + (int64_t)l_read_name + 4 * (int64_t)n_cigar +
                ((int64_t)l_seq + 1) / 2 >
            (int64_t)rec_sizes[i])
      return -1;
    const uint8_t* seq = rec + 32 + l_read_name + 4 * n_cigar;
    code_offsets[i] = pos;
    for (int32_t b = 0; b < l_seq; ++b) {
      uint8_t nib = (b & 1) ? (seq[b >> 1] & 0xF) : (seq[b >> 1] >> 4);
      codes[pos++] = NT16_TO_2BIT[nib];
    }
  }
  return pos;
}

}  // extern "C"

// ── Host-side k-mer hash table (probe/tally accelerator) ───────────
//
// The XLA per-element gather path on TPU runs at ~10ns/element, ~250×
// below HBM random-access speed-of-light, which makes device-side
// binary-search probes the pipeline bottleneck.  Random access is the
// host CPU's strength, so the engine pairs device window extraction
// with this multithreaded open-addressing table for membership/tally
// queries.  Keys are the engine's packed canonical k-mers collapsed
// to 64 bits (W<=2, i.e. k<=31); k>31 uses the device path.

#include <atomic>

extern "C" {

struct KdfHashTable {
  uint64_t* slots;     // key per slot, EMPTY = ~0ull
  int64_t* index;      // original key index per slot
  uint64_t mask;
  int64_t n_keys;
};

static inline uint64_t mix64(uint64_t x) {
  x += 0x9E3779B97F4A7C15ull;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ull;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBull;
  return x ^ (x >> 31);
}

static const uint64_t KDF_EMPTY = ~0ull;

KdfHashTable* kdf_ht_build(const uint64_t* keys, int64_t n) {
  uint64_t cap = 16;
  while (cap < (uint64_t)(n * 2)) cap <<= 1;
  KdfHashTable* ht = new KdfHashTable;
  ht->slots = (uint64_t*)malloc(cap * sizeof(uint64_t));
  ht->index = (int64_t*)malloc(cap * sizeof(int64_t));
  ht->mask = cap - 1;
  ht->n_keys = n;
  if (!ht->slots || !ht->index) {
    free(ht->slots); free(ht->index); delete ht; return nullptr;
  }
  for (uint64_t i = 0; i < cap; ++i) ht->slots[i] = KDF_EMPTY;
  for (int64_t i = 0; i < n; ++i) {
    uint64_t k = keys[i];
    uint64_t s = mix64(k) & ht->mask;
    while (ht->slots[s] != KDF_EMPTY && ht->slots[s] != k)
      s = (s + 1) & ht->mask;
    ht->slots[s] = k;
    ht->index[s] = i;
  }
  return ht;
}

void kdf_ht_free(KdfHashTable* ht) {
  if (!ht) return;
  free(ht->slots);
  free(ht->index);
  delete ht;
}

static void tally_range(const KdfHashTable* ht, const uint64_t* q,
                        int64_t lo, int64_t hi,
                        std::atomic<int64_t>* tally) {
  for (int64_t i = lo; i < hi; ++i) {
    uint64_t k = q[i];
    if (k == KDF_EMPTY) continue;  // sentinel / invalid window
    uint64_t s = mix64(k) & ht->mask;
    while (true) {
      uint64_t v = ht->slots[s];
      if (v == KDF_EMPTY) break;
      if (v == k) {
        tally[ht->index[s]].fetch_add(1, std::memory_order_relaxed);
        break;
      }
      s = (s + 1) & ht->mask;
    }
  }
}

// Add 1 to tally[original_index] for every query found in the table.
void kdf_ht_tally(const KdfHashTable* ht, const uint64_t* queries,
                  int64_t n, int64_t* tally, int n_threads) {
  auto* at = reinterpret_cast<std::atomic<int64_t>*>(tally);
  int nt = n_threads > 0 ? n_threads : 1;
  if (nt == 1 || n < (1 << 16)) {
    tally_range(ht, queries, 0, n, at);
    return;
  }
  std::vector<std::thread> threads;
  int64_t per = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * per;
    int64_t hi = lo + per < n ? lo + per : n;
    if (lo >= hi) break;
    threads.emplace_back(tally_range, ht, queries, lo, hi, at);
  }
  for (auto& th : threads) th.join();
}

static void member_range(const KdfHashTable* ht, const uint64_t* q,
                         int64_t lo, int64_t hi, uint8_t* out,
                         int64_t* idx_out) {
  for (int64_t i = lo; i < hi; ++i) {
    uint64_t k = q[i];
    out[i] = 0;
    if (idx_out) idx_out[i] = -1;
    if (k == KDF_EMPTY) continue;
    uint64_t s = mix64(k) & ht->mask;
    while (true) {
      uint64_t v = ht->slots[s];
      if (v == KDF_EMPTY) break;
      if (v == k) {
        out[i] = 1;
        if (idx_out) idx_out[i] = ht->index[s];
        break;
      }
      s = (s + 1) & ht->mask;
    }
  }
}

// Membership (+ optional original-index) per query.
void kdf_ht_member(const KdfHashTable* ht, const uint64_t* queries,
                   int64_t n, uint8_t* out, int64_t* idx_out,
                   int n_threads) {
  int nt = n_threads > 0 ? n_threads : 1;
  if (nt == 1 || n < (1 << 16)) {
    member_range(ht, queries, 0, n, out, idx_out);
    return;
  }
  std::vector<std::thread> threads;
  int64_t per = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * per;
    int64_t hi = lo + per < n ? lo + per : n;
    if (lo >= hi) break;
    threads.emplace_back(member_range, ht, queries, lo, hi, out,
                         idx_out);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
