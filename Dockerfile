# kmer-denovo-filter-tpu runtime image.
#
# Unlike the reference image (which apt-installs samtools/bcftools and
# builds kraken2 from source), this tool has no external binary
# dependencies on its compute path — only the optional Kraken2 stage
# needs the kraken2 binary, installable at deploy time.
FROM python:3.12-slim

RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ zlib1g-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/kdf
COPY pyproject.toml README.md ./
COPY kmer_denovo_filter_tpu ./kmer_denovo_filter_tpu
COPY scripts ./scripts
# synthetic-data builders for in-image smoke tests (docker.yml)
COPY tests/helpers.py ./testsupport/helpers.py

RUN pip install --no-cache-dir .

# Pre-build the native host accelerator (otherwise built on first use)
RUN python -c "from kmer_denovo_filter_tpu.htsio import native; \
    native._load(); print('native:', native.AVAILABLE)"

ENTRYPOINT ["kmer-denovo"]
