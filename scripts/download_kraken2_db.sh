#!/usr/bin/env bash
# Download and validate a prebuilt Kraken2 database (PrackenDB).
#
# Equivalent of the reference scripts/download_kraken2_db.sh (ref
# :1–154): fetches the NCBI-reference PrackenDB tarball (~50 GB),
# extracts it, detects versioned subdirectory layouts, validates the
# k2d files and taxonomy dumps, and leaves a directory usable with
# --kraken2-db.  Adds resumable downloads (wget --continue) and
# optional SHA-256 verification on top of the reference behavior.
set -euo pipefail

# PrackenDB — curated Kraken2 database with one NCBI reference genome
# per species (bacteria, archaea, protists, fungi, human, RefSeq
# viral, UniVec Core).
DEFAULT_URL="https://genome-idx.s3.amazonaws.com/kraken/k2_NCBI_reference_20251007.tar.gz"

usage() {
    cat <<EOF
Usage:
  ./scripts/download_kraken2_db.sh --db /path/to/kraken_db [options]

Downloads the pre-built PrackenDB Kraken2 database (one NCBI
reference genome per species) and validates it for use with
kmer-denovo's --kraken2-db flag.

Options:
  --db PATH       Target Kraken2 database directory (required)
  --url URL       Override the download URL
                  (default: \$KDF_KRAKEN2_DB_URL or $DEFAULT_URL)
  --sha256 HEX    Verify the tarball against this SHA-256 before
                  extracting (also: \$KDF_KRAKEN2_DB_SHA256)
  --keep-tarball  Do not delete the tarball after extraction
  -h, --help      Show this help

The download resumes from a partial tarball if re-run (wget -c).
EOF
}

DB_PATH=""
URL="${KDF_KRAKEN2_DB_URL:-$DEFAULT_URL}"
SHA256="${KDF_KRAKEN2_DB_SHA256:-}"
KEEP_TARBALL=0

while [[ $# -gt 0 ]]; do
    case "$1" in
        --db)           DB_PATH="${2:-}"; shift 2 ;;
        --url)          URL="${2:-}"; shift 2 ;;
        --sha256)       SHA256="${2:-}"; shift 2 ;;
        --keep-tarball) KEEP_TARBALL=1; shift ;;
        -h|--help)      usage; exit 0 ;;
        *)
            # positional dest dir retained for backward compatibility
            if [[ -z "$DB_PATH" && "$1" != -* ]]; then
                DB_PATH="$1"; shift
            else
                echo "Unknown argument: $1" >&2; usage; exit 2
            fi
            ;;
    esac
done

if [[ -z "$DB_PATH" ]]; then
    echo "Error: --db is required" >&2
    usage
    exit 2
fi

command -v wget >/dev/null 2>&1 || {
    echo "Error: wget not found on PATH." >&2
    echo "Install wget (e.g. apt-get install wget) and retry." >&2
    exit 1
}

mkdir -p "$DB_PATH"
TARBALL="$DB_PATH/kraken2_db.tar.gz"

echo "[kraken2-db] Downloading PrackenDB to: $DB_PATH"
echo "[kraken2-db] URL: $URL"

# --continue resumes an interrupted multi-hour ~50 GB download
wget --continue --progress=dot:giga -O "$TARBALL" "$URL"

if [[ -n "$SHA256" ]]; then
    echo "[kraken2-db] Verifying SHA-256..."
    if command -v sha256sum >/dev/null 2>&1; then
        got=$(sha256sum "$TARBALL" | awk '{print $1}')
    else
        got=$(shasum -a 256 "$TARBALL" | awk '{print $1}')
    fi
    if [[ "$got" != "$SHA256" ]]; then
        echo "Error: SHA-256 mismatch for $TARBALL" >&2
        echo "  expected: $SHA256" >&2
        echo "  actual:   $got" >&2
        echo "Delete the tarball and re-run to re-download." >&2
        exit 1
    fi
    echo "[kraken2-db] Checksum OK."
fi

echo "[kraken2-db] Extracting database..."
tar -xzf "$TARBALL" -C "$DB_PATH"
if [[ "$KEEP_TARBALL" -eq 0 ]]; then
    rm -f "$TARBALL"
fi

DB_VALIDATE_PATH="$DB_PATH"
REQUIRED_DB_FILES=("hash.k2d" "opts.k2d" "taxo.k2d")

has_required_db_files() {
    local dir="$1"
    for req in "${REQUIRED_DB_FILES[@]}"; do
        [[ -f "$dir/$req" ]] || return 1
    done
    return 0
}

# Pre-built tarballs may extract into a versioned subdirectory
# (e.g. k2_NCBI_reference_20251007); detect that layout, and refuse
# to guess between multiple candidates.
if ! has_required_db_files "$DB_PATH"; then
    mapfile -t _db_candidates < <(
        find "$DB_PATH" -type f -name "hash.k2d" -exec dirname {} \; \
        | sort -u)
    _matching=()
    for candidate in "${_db_candidates[@]}"; do
        if has_required_db_files "$candidate"; then
            _matching+=("$candidate")
        fi
    done
    if [[ ${#_matching[@]} -eq 1 ]]; then
        DB_VALIDATE_PATH="${_matching[0]}"
    elif [[ ${#_matching[@]} -gt 1 ]]; then
        echo "Error: multiple Kraken2 database directories found under $DB_PATH:" >&2
        for candidate in "${_matching[@]}"; do
            echo "  - $candidate" >&2
        done
        echo "Please set --db to the specific database directory." >&2
        exit 1
    fi
fi

for req in "${REQUIRED_DB_FILES[@]}"; do
    if [[ ! -f "$DB_VALIDATE_PATH/$req" ]]; then
        echo "Error: missing required database file: $DB_VALIDATE_PATH/$req" >&2
        exit 1
    fi
done

# taxonomy dumps power lineage-aware classification and the per-read
# detail BED's scientific names; warn (matching Kraken2Runner's
# graceful fallbacks) but do not fail.
if [[ ! -f "$DB_VALIDATE_PATH/taxonomy/nodes.dmp" && ! -f "$DB_VALIDATE_PATH/nodes.dmp" ]]; then
    echo "[kraken2-db] Warning: taxonomy/nodes.dmp not found." >&2
    echo "[kraken2-db] Lineage-aware bacterial classification will" >&2
    echo "[kraken2-db] fall back to exact taxid==2 matching." >&2
fi
if [[ ! -f "$DB_VALIDATE_PATH/taxonomy/names.dmp" && ! -f "$DB_VALIDATE_PATH/names.dmp" ]]; then
    echo "[kraken2-db] Warning: taxonomy/names.dmp not found." >&2
    echo "[kraken2-db] Per-read Kraken2 detail BED will use numeric" >&2
    echo "[kraken2-db] taxids instead of scientific names." >&2
fi

echo "[kraken2-db] Complete."
echo "[kraken2-db] Database ready: $DB_VALIDATE_PATH"
echo "[kraken2-db] Use with: kmer-denovo ... --kraken2-db $DB_VALIDATE_PATH"
