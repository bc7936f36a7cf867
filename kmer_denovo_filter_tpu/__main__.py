"""``python -m kmer_denovo_filter_tpu`` entry point.

Parity with the reference package's module entry point
(reference src/kmer_denovo_filter/__main__.py:1-3).
"""

from kmer_denovo_filter_tpu.cli import main

main()
