"""Device k-mer ops: packing, canonical extraction, sort-count, probe."""
