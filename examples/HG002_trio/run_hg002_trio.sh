#!/usr/bin/env bash
# =============================================================================
# run_hg002_trio.sh — end-to-end GIAB HG002 trio de novo filtering
# on a TPU host (TPU-native equivalent of the reference's SLURM +
# Apptainer pipeline, examples/HG002_trio/run_hg002_trio.sh).
#
# Trio: HG002/NA24385 son (proband), HG003/NA24149 father,
#       HG004/NA24143 mother.
#
# Stages
#   1. Download the GIAB trio BAMs + v4.2.1 benchmark VCFs (wget).
#   2. Identify putative de novo candidates (child-private sites) with
#      scripts/identify_putative_denovos.py — no bcftools needed.
#   3. Run kmer-denovo (VCF mode) on the TPU host.
#   4. Run kmer-discovery (VCF-free mode) with the candidate summary.
#   5. Extract ±1 kb mini BAMs and build the IGV review TSV.
#
# Disk: downloads ~500 GB; working ~50 GB (no jellyfish intermediates —
# the k-mer engine is device-resident).  Wall: dominated by downloads.
# =============================================================================
set -euo pipefail

DATA_DIR="${DATA_DIR:-hg002_data}"
RESULTS_DIR="${RESULTS_DIR:-hg002_results}"
KMER_SIZE="${KMER_SIZE:-31}"
THREADS="${THREADS:-16}"

while [[ $# -gt 0 ]]; do
    case "$1" in
        --data-dir) DATA_DIR="$2"; shift 2 ;;
        --results-dir) RESULTS_DIR="$2"; shift 2 ;;
        --kmer-size) KMER_SIZE="$2"; shift 2 ;;
        --threads) THREADS="$2"; shift 2 ;;
        *) echo "Unknown option: $1" >&2; exit 1 ;;
    esac
done

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
REPO_DIR="$(cd "$SCRIPT_DIR/../.." && pwd)"
mkdir -p "$DATA_DIR" "$RESULTS_DIR"

GIAB_BASE="https://ftp-trace.ncbi.nlm.nih.gov/ReferenceSamples/giab"
ALN_BASE="$GIAB_BASE/data"
VCF_BASE="$GIAB_BASE/release"

declare -A BAMS=(
    [HG002]="$ALN_BASE/AshkenazimTrio/HG002_NA24385_son/NIST_Illumina_2x250bps/novoalign_bams/HG002.GRCh38.2x250.bam"
    [HG003]="$ALN_BASE/AshkenazimTrio/HG003_NA24149_father/NIST_Illumina_2x250bps/novoalign_bams/HG003.GRCh38.2x250.bam"
    [HG004]="$ALN_BASE/AshkenazimTrio/HG004_NA24143_mother/NIST_Illumina_2x250bps/novoalign_bams/HG004.GRCh38.2x250.bam"
)
declare -A VCFS=(
    [HG002]="$VCF_BASE/AshkenazimTrio/HG002_NA24385_son/NISTv4.2.1/GRCh38/HG002_GRCh38_1_22_v4.2.1_benchmark.vcf.gz"
    [HG003]="$VCF_BASE/AshkenazimTrio/HG003_NA24149_father/NISTv4.2.1/GRCh38/HG003_GRCh38_1_22_v4.2.1_benchmark.vcf.gz"
    [HG004]="$VCF_BASE/AshkenazimTrio/HG004_NA24143_mother/NISTv4.2.1/GRCh38/HG004_GRCh38_1_22_v4.2.1_benchmark.vcf.gz"
)

echo "=== Stage 1: downloads → $DATA_DIR ==="
for sample in HG002 HG003 HG004; do
    for url in "${BAMS[$sample]}" "${BAMS[$sample]}.bai" \
               "${VCFS[$sample]}" "${VCFS[$sample]}.tbi"; do
        dest="$DATA_DIR/$(basename "$url")"
        [[ -f "$dest" ]] || wget --continue -O "$dest" "$url"
    done
done

CHILD_BAM="$DATA_DIR/$(basename "${BAMS[HG002]}")"
FATHER_BAM="$DATA_DIR/$(basename "${BAMS[HG003]}")"
MOTHER_BAM="$DATA_DIR/$(basename "${BAMS[HG004]}")"

echo "=== Stage 2: putative de novo candidates ==="
CANDIDATES="$RESULTS_DIR/putative_denovos.vcf.gz"
python "$REPO_DIR/scripts/identify_putative_denovos.py" \
    --child-vcf "$DATA_DIR/$(basename "${VCFS[HG002]}")" \
    --father-vcf "$DATA_DIR/$(basename "${VCFS[HG003]}")" \
    --mother-vcf "$DATA_DIR/$(basename "${VCFS[HG004]}")" \
    --output "$CANDIDATES"

echo "=== Stage 3: kmer-denovo (VCF mode) ==="
python -m kmer_denovo_filter_tpu.cli 2>/dev/null || true
PYTHONPATH="$REPO_DIR:${PYTHONPATH:-}" python -c \
    "from kmer_denovo_filter_tpu.cli import vcf_main; vcf_main()" \
    --child "$CHILD_BAM" --mother "$MOTHER_BAM" --father "$FATHER_BAM" \
    --vcf "$CANDIDATES" \
    --output "$RESULTS_DIR/annotated.vcf.gz" \
    --metrics "$RESULTS_DIR/metrics.json" \
    --summary "$RESULTS_DIR/summary.txt" \
    --informative-reads "$RESULTS_DIR/informative.bam" \
    --kmer-size "$KMER_SIZE" --threads "$THREADS" \
    --proband-id HG002 \
    --report "$RESULTS_DIR/report.html"

echo "=== Stage 4: kmer-discovery (VCF-free) ==="
PYTHONPATH="$REPO_DIR:${PYTHONPATH:-}" python -c \
    "from kmer_denovo_filter_tpu.cli import discovery_main; discovery_main()" \
    --child "$CHILD_BAM" --mother "$MOTHER_BAM" --father "$FATHER_BAM" \
    --ref-fasta "$DATA_DIR/GRCh38.fa" \
    --out-prefix "$RESULTS_DIR/discovery" \
    --kmer-size "$KMER_SIZE" --threads "$THREADS" \
    --candidate-summary "$RESULTS_DIR/summary.txt" || \
    echo "(discovery skipped — provide $DATA_DIR/GRCh38.fa to enable)"

echo "=== Stage 5: mini BAMs + IGV review TSV ==="
python "$REPO_DIR/scripts/extract_mini_bams.py" \
    --vcf "$RESULTS_DIR/annotated.vcf.gz" \
    --bam "child=$CHILD_BAM" --bam "father=$FATHER_BAM" \
    --bam "mother=$MOTHER_BAM" \
    --out-dir "$RESULTS_DIR/mini_bams"
python "$REPO_DIR/scripts/create_igv_review_tsv.py" \
    --vcf "$RESULTS_DIR/annotated.vcf.gz" \
    --mini-dir "$RESULTS_DIR/mini_bams" \
    --output "$RESULTS_DIR/igv_review.tsv"

echo "Done. Results in $RESULTS_DIR"
