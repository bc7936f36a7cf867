#!/usr/bin/env bash
# Download and validate a prebuilt Kraken2 database (PrackenDB).
#
# Equivalent of the reference scripts/download_kraken2_db.sh: fetches
# the NCBI-reference PrackenDB tarball (~50 GB), verifies the expected
# k2d files, and leaves a directory usable with --kraken2-db.
set -euo pipefail

DB_URL="${KDF_KRAKEN2_DB_URL:-https://genome-idx.s3.amazonaws.com/kraken/k2_standard_20240112.tar.gz}"
DEST_DIR="${1:-kraken2_db}"

usage() {
    echo "Usage: $0 [dest_dir]" >&2
    echo "  Env: KDF_KRAKEN2_DB_URL overrides the database URL" >&2
    exit 1
}
[[ "${1:-}" == "-h" || "${1:-}" == "--help" ]] && usage

command -v wget >/dev/null 2>&1 || {
    echo "ERROR: wget is required" >&2; exit 1; }

mkdir -p "$DEST_DIR"
tarball="$DEST_DIR/$(basename "$DB_URL")"

echo "Downloading Kraken2 database:"
echo "  URL : $DB_URL"
echo "  Dest: $tarball"
wget --continue --progress=dot:giga -O "$tarball" "$DB_URL"

echo "Extracting…"
tar -xzf "$tarball" -C "$DEST_DIR"

# Validate the expected database files (possibly in a subdirectory)
found=""
for d in "$DEST_DIR" "$DEST_DIR"/*/; do
    if [[ -f "$d/hash.k2d" && -f "$d/opts.k2d" && -f "$d/taxo.k2d" ]]; then
        found="$d"
        break
    fi
done
if [[ -z "$found" ]]; then
    echo "ERROR: hash.k2d/opts.k2d/taxo.k2d not found under $DEST_DIR" >&2
    exit 1
fi

echo "Kraken2 database ready: $found"
echo "Use with: kmer-denovo ... --kraken2-db $found"
