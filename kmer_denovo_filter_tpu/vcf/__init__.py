"""VCF-mode annotation pipeline (kmer-denovo)."""
