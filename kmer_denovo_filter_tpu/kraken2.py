"""Kraken2 taxonomic classification stage (optional VCF-mode annotation).

Behavioural port of the reference's Kraken2Runner
(reference kmer_utils.py:252–1034): wraps the ``kraken2`` binary in a
subprocess, parses its per-read output, loads the NCBI taxonomy
(nodes.dmp/names.dmp) for lineage-aware domain sets, applies the human
homology guard and UniVec Core exclusion, and maintains the four-way
read partition NHF + UCF + HLF + UF = 1.

This stage stays host-side by design: it is an optional annotation
step bounded by the (small) informative-read set, and the Kraken2 LCA
database is an external mmap'd artifact.  SURVEY.md §2.2 marks a
device LCA classifier as a possible later extension.
"""

import logging
import os
import struct
import subprocess
import tempfile
import threading
import time

logger = logging.getLogger(__name__)

# NCBI taxonomy IDs for the major clades.
BACTERIA_TAXID = 2
ARCHAEA_TAXID = 2157
FUNGI_TAXID = 4751
EUKARYOTA_TAXID = 2759
METAZOA_TAXID = 33208
VIRIDIPLANTAE_TAXID = 33090
VIRUSES_TAXID = 10239
HUMAN_TAXID = 9606
# UniVec Core: synthetic sequencing-vector/adapter sequences — never
# counted as biological non-human content.
UNIVEC_CORE_TAXID = 81077

_HEARTBEAT_INTERVAL = 30
_HEARTBEAT_JOIN_TIMEOUT = 2


def _read_proc_rss_kb(pid):
    try:
        with open(f"/proc/{pid}/status") as fh:
            for line in fh:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return None


class Kraken2Result:
    """Tallied outcome of one classification run.

    The four read-name sets ``nonhuman`` / ``univec_core`` /
    ``human_lineage`` / ``unclassified`` partition all processed reads,
    so the per-variant fractions built from them sum to 1.
    """

    def __init__(self):
        self.total = 0
        self.classified = 0
        self.unclassified = 0
        self.bacterial_read_names = set()
        self.bacterial_count = 0
        self.archaeal_read_names = set()
        self.archaeal_count = 0
        self.fungal_read_names = set()
        self.fungal_count = 0
        self.protist_read_names = set()
        self.protist_count = 0
        self.viral_read_names = set()
        self.viral_count = 0
        self.univec_core_read_names = set()
        self.univec_core_count = 0
        self.nonhuman_read_names = set()
        self.nonhuman_count = 0
        self.unclassified_read_names = set()
        self.human_lineage_read_names = set()
        self.human_lineage_count = 0
        self.human_count = 0
        self.root_count = 0
        self.per_read_detail = {}

    def summary(self):
        pct = (f"{100 * self.bacterial_count / self.total:.1f}"
               if self.total > 0 else "0.0")
        nh_pct = (f"{100 * self.nonhuman_count / self.total:.1f}"
                  if self.total > 0 else "0.0")
        return (
            f"kraken2: {self.total} reads, "
            f"{self.classified} classified, "
            f"{self.bacterial_count} bacterial ({pct}%), "
            f"{self.archaeal_count} archaeal, "
            f"{self.fungal_count} fungal, "
            f"{self.protist_count} protist, "
            f"{self.viral_count} viral, "
            f"{self.univec_core_count} univec_core, "
            f"{self.nonhuman_count} non-human ({nh_pct}%), "
            f"{self.human_count} human, "
            f"{self.root_count} root")

    @property
    def bacterial_fraction(self):
        if self.total == 0:
            return 0.0
        return round(self.bacterial_count / self.total, 4)


class Kraken2Runner:
    """Subprocess driver + taxonomy logic for kraken2 classification."""

    Result = Kraken2Result

    def __init__(self, db_path, *, confidence=0.0, threads=1,
                 memory_mapping=False):
        self.db_path = db_path
        self.confidence = confidence
        self.threads = threads
        self.memory_mapping = memory_mapping

    # ── database introspection ─────────────────────────────────────

    @staticmethod
    def read_kmer_length(db_path):
        """k-mer length from opts.k2d (first size_t of IndexOptions).

        Looks in *db_path* and one directory level deeper (PrackenDB
        extracts into a versioned subdirectory).
        """
        candidate_dirs = [db_path]
        try:
            for entry in os.scandir(db_path):
                if entry.is_dir():
                    candidate_dirs.append(entry.path)
        except OSError:
            pass
        for d in candidate_dirs:
            opts_path = os.path.join(d, "opts.k2d")
            if not os.path.isfile(opts_path):
                continue
            try:
                with open(opts_path, "rb") as fh:
                    data = fh.read(8)
                if len(data) == 8:
                    (k,) = struct.unpack("<Q", data)
                    if 1 <= k <= 256:
                        return k
            except OSError:
                pass
        return None

    # ── taxonomy loading ───────────────────────────────────────────

    @staticmethod
    def load_parent_map(db_path):
        """{child: parent} from nodes.dmp (taxonomy/ or db root)."""
        nodes_path = os.path.join(db_path, "taxonomy", "nodes.dmp")
        if not os.path.isfile(nodes_path):
            nodes_path = os.path.join(db_path, "nodes.dmp")
            if not os.path.isfile(nodes_path):
                return None
        parent_map = {}
        try:
            with open(nodes_path) as fh:
                for line in fh:
                    parts = line.split("\t|\t")
                    if len(parts) < 3:
                        continue
                    parent_map[int(parts[0].strip())] = int(
                        parts[1].strip())
        except (OSError, ValueError):
            return None
        return parent_map

    @staticmethod
    def load_name_map(db_path):
        """{taxid: scientific_name} from names.dmp (spaces→underscores)."""
        names_path = os.path.join(db_path, "taxonomy", "names.dmp")
        if not os.path.isfile(names_path):
            names_path = os.path.join(db_path, "names.dmp")
            if not os.path.isfile(names_path):
                logger.warning(
                    "names.dmp not found under %s; taxon names will be "
                    "unavailable in the per-read detail file.", db_path)
                return None
        name_map = {}
        try:
            with open(names_path) as fh:
                for line in fh:
                    parts = line.split("\t|\t")
                    if len(parts) < 4:
                        continue
                    name_class = parts[3].replace("\t|", "").strip()
                    if name_class != "scientific name":
                        continue
                    try:
                        taxid = int(parts[0].strip())
                    except ValueError:
                        continue
                    name_map[taxid] = parts[1].strip().replace(" ", "_")
        except OSError:
            return None
        return name_map

    # Backward-compat private aliases (reference API names)
    _load_parent_map = load_parent_map
    _load_name_map = load_name_map

    @staticmethod
    def descendants_of(parent_map, root_taxid):
        """All taxids whose lineage passes through *root_taxid*."""
        members = set()
        non_members = set()
        for start in parent_map:
            path = []
            cur = start
            while True:
                if cur in members or cur == root_taxid:
                    members.update(path)
                    members.add(cur)
                    break
                if (cur in non_members or cur in (0, 1)
                        or cur not in parent_map):
                    non_members.update(path)
                    non_members.add(cur)
                    break
                path.append(cur)
                cur = parent_map[cur]
        return members

    @staticmethod
    def ancestors_of(parent_map, taxid):
        """Lineage from *taxid* to root, inclusive."""
        ancestors = set()
        cur = taxid
        while cur in parent_map:
            ancestors.add(cur)
            parent = parent_map[cur]
            if parent == cur:
                break
            cur = parent
        return ancestors

    _descendants_of = descendants_of
    _ancestors_of = ancestors_of

    @staticmethod
    def load_all_taxid_sets(db_path):
        """Domain descendant sets + human lineage/clade sets.

        ``protist`` = Eukaryota − Metazoa − Fungi − Viridiplantae.
        Returns None when nodes.dmp is unavailable.
        """
        parent_map = Kraken2Runner.load_parent_map(db_path)
        if parent_map is None:
            return None
        d = Kraken2Runner.descendants_of
        bacterial = d(parent_map, BACTERIA_TAXID)
        archaeal = d(parent_map, ARCHAEA_TAXID)
        fungal = d(parent_map, FUNGI_TAXID)
        eukaryota = d(parent_map, EUKARYOTA_TAXID)
        metazoa = d(parent_map, METAZOA_TAXID)
        viridiplantae = d(parent_map, VIRIDIPLANTAE_TAXID)
        return {
            "bacterial": bacterial,
            "archaeal": archaeal,
            "fungal": fungal,
            "protist": eukaryota - metazoa - fungal - viridiplantae,
            "viral": d(parent_map, VIRUSES_TAXID),
            "univec_core": d(parent_map, UNIVEC_CORE_TAXID),
            "human_lineage": Kraken2Runner.ancestors_of(
                parent_map, HUMAN_TAXID),
            "human_clade": d(parent_map, HUMAN_TAXID),
        }

    _load_all_taxid_sets = load_all_taxid_sets

    @staticmethod
    def _load_bacterial_taxids(db_path):
        parent_map = Kraken2Runner.load_parent_map(db_path)
        if parent_map is None:
            return None
        return Kraken2Runner.descendants_of(parent_map, BACTERIA_TAXID)

    @staticmethod
    def extract_taxids_from_kmer_string(kmer_string):
        """Integer taxids from the kraken2 per-read k-mer detail field."""
        if not kmer_string:
            return set()
        taxids = set()
        for token in kmer_string.replace("|:|", " ").split():
            taxid, _, _ = token.partition(":")
            if not taxid:
                continue
            try:
                taxids.add(int(taxid))
            except ValueError:
                continue
        return taxids

    _extract_taxids_from_kmer_string = extract_taxids_from_kmer_string

    # ── classification ─────────────────────────────────────────────

    def classify_sequences(self, sequences, tmpdir=None):
        """Classify named sequences; returns a :class:`Kraken2Result`.

        *sequences* is a ``{name: seq}`` dict or ``(name, seq)`` list.
        Subprocess failure degrades gracefully to an empty result with
        a warning (reference kmer_utils.py:854–860).
        """
        items = (sequences.items() if isinstance(sequences, dict)
                 else sequences)
        result = Kraken2Result()
        items = list(items)
        if not items:
            return result
        result.total = len(items)

        kmer_len = self.read_kmer_length(self.db_path)
        if kmer_len is not None:
            logger.info("[Kraken2] database k-mer length: %d", kmer_len)
        else:
            logger.debug(
                "[Kraken2] could not read k-mer length from opts.k2d "
                "(db_path: %s)", self.db_path)

        fd, fastq_path = tempfile.mkstemp(
            suffix=".fq", prefix="kraken2_", dir=tmpdir)
        try:
            with os.fdopen(fd, "w") as fh:
                for name, seq in items:
                    fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")

            cmd = [
                "kraken2",
                "--db", self.db_path,
                "--threads", str(self.threads),
                "--confidence", str(self.confidence),
                "--output", "/dev/stdout",
                "--report", "/dev/null",
            ]
            if self.memory_mapping:
                cmd.append("--memory-mapping")
            cmd.append(fastq_path)

            proc = subprocess.Popen(
                cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE)

            kraken2_start = time.monotonic()
            stop_heartbeat = threading.Event()

            def _heartbeat():
                while not stop_heartbeat.wait(_HEARTBEAT_INTERVAL):
                    rss = _read_proc_rss_kb(proc.pid)
                    elapsed = time.monotonic() - kraken2_start
                    if rss is not None:
                        logger.info(
                            "[Kraken2] heartbeat — %.0f s elapsed, "
                            "RSS: %.1f GB", elapsed, rss / 1_048_576)
                    else:
                        logger.info(
                            "[Kraken2] heartbeat — %.0f s elapsed "
                            "(memory info unavailable)", elapsed)

            hb = threading.Thread(target=_heartbeat, daemon=True,
                                  name="kraken2-heartbeat")
            hb.start()
            try:
                stdout, stderr = proc.communicate()
            finally:
                stop_heartbeat.set()
                hb.join(timeout=_HEARTBEAT_JOIN_TIMEOUT)

            elapsed = time.monotonic() - kraken2_start
            if proc.returncode != 0:
                logger.warning(
                    "kraken2 exited with code %d after %.0f s: %s",
                    proc.returncode, elapsed,
                    stderr.decode(errors="replace").strip()[:500])
                return result

            logger.info(
                "[Kraken2] classification complete — %d reads in %.0f s",
                result.total, elapsed)

            taxid_sets = self.load_all_taxid_sets(self.db_path)
            if taxid_sets is None:
                logger.warning(
                    "Kraken2 taxonomy lineage matching is unavailable "
                    "(missing/unreadable taxonomy/nodes.dmp under DB: "
                    "%s). Falling back to exact taxid matching only; "
                    "non-human fractions may be severely undercounted.",
                    self.db_path)

            self._tally_output(
                stdout.decode(errors="replace"), taxid_sets, result)
        finally:
            try:
                os.unlink(fastq_path)
            except OSError:
                pass
        return result

    def _tally_output(self, text, taxid_sets, result):
        """Parse ``C/U\\tname\\ttaxid\\tlen\\tkmers`` lines into *result*."""
        for line in text.split("\n"):
            line = line.strip()
            if not line:
                continue
            parts = line.split("\t")
            if len(parts) < 3:
                continue
            status = parts[0]
            read_name = parts[1]
            try:
                taxid = int(parts[2])
            except ValueError:
                continue
            kmer_string = parts[4] if len(parts) >= 5 else ""
            kmer_taxids = self.extract_taxids_from_kmer_string(kmer_string)

            if status == "U":
                result.unclassified += 1
                result.unclassified_read_names.add(read_name)
                result.per_read_detail[read_name] = {
                    "status": "U", "taxid": 0, "domain": "Unclassified",
                    "guard_status": "UNCLASSIFIED",
                    "is_nonhuman": False, "kmer_string": "",
                }
                continue

            result.classified += 1
            has_human_kmer = HUMAN_TAXID in kmer_taxids

            if taxid_sets is not None:
                is_bacterial = taxid in taxid_sets["bacterial"]
                is_archaeal = taxid in taxid_sets["archaeal"]
                is_fungal = taxid in taxid_sets["fungal"]
                is_protist = taxid in taxid_sets["protist"]
                is_viral = taxid in taxid_sets["viral"]
                is_univec_core = taxid in taxid_sets["univec_core"]
                is_human = taxid in taxid_sets["human_clade"]
                is_nonhuman = (
                    taxid not in taxid_sets["human_lineage"]
                    and taxid not in taxid_sets["human_clade"]
                    and taxid not in taxid_sets["univec_core"])
            else:
                is_bacterial = taxid == BACTERIA_TAXID
                is_archaeal = taxid == ARCHAEA_TAXID
                is_fungal = taxid == FUNGI_TAXID
                is_protist = False
                is_viral = taxid == VIRUSES_TAXID
                is_univec_core = taxid == UNIVEC_CORE_TAXID
                is_human = taxid == HUMAN_TAXID
                is_nonhuman = taxid not in (
                    HUMAN_TAXID, 1, UNIVEC_CORE_TAXID)

            # Domain label is decided before the guard clears flags.
            if is_bacterial:
                domain = "Bacteria"
            elif is_archaeal:
                domain = "Archaea"
            elif is_fungal:
                domain = "Fungi"
            elif is_protist:
                domain = "Protist"
            elif is_viral:
                domain = "Viruses"
            elif is_univec_core:
                domain = "UniVec_Core"
            elif is_human:
                domain = "Human"
            elif taxid == 1:
                domain = "Root"
            elif (taxid_sets is not None
                  and taxid in taxid_sets["human_lineage"]):
                domain = "Ambiguous_Ancestor"
            else:
                domain = "Root"

            # Human homology guard: any human k-mer vote clears all
            # non-human category flags for this read.
            if has_human_kmer:
                is_bacterial = is_archaeal = is_fungal = False
                is_protist = is_viral = is_univec_core = False
                is_nonhuman = False

            if is_human:
                guard = "HUMAN"
            elif has_human_kmer:
                guard = "HHG"
            elif domain == "UniVec_Core":
                guard = "UVC"
            else:
                guard = "PASS"

            if is_bacterial:
                result.bacterial_count += 1
                result.bacterial_read_names.add(read_name)
            if is_archaeal:
                result.archaeal_count += 1
                result.archaeal_read_names.add(read_name)
            if is_fungal:
                result.fungal_count += 1
                result.fungal_read_names.add(read_name)
            if is_protist:
                result.protist_count += 1
                result.protist_read_names.add(read_name)
            if is_viral:
                result.viral_count += 1
                result.viral_read_names.add(read_name)
            if is_univec_core:
                result.univec_core_count += 1
                result.univec_core_read_names.add(read_name)
            if is_nonhuman:
                result.nonhuman_count += 1
                result.nonhuman_read_names.add(read_name)
            if not is_nonhuman and not is_univec_core:
                result.human_lineage_read_names.add(read_name)
                result.human_lineage_count += 1
            if is_human:
                result.human_count += 1
            elif taxid == 1:
                result.root_count += 1

            result.per_read_detail[read_name] = {
                "status": status,
                "taxid": taxid,
                "domain": domain,
                "guard_status": guard,
                "is_nonhuman": is_nonhuman,
                "kmer_string": kmer_string,
            }


def run_kraken2_on_reads(child_bam, ref_fasta, read_names, kraken2_db,
                         confidence=0.0, threads=1, tmpdir=None,
                         informative_reads_by_variant=None,
                         memory_mapping=False):
    """Fetch informative reads and classify them with kraken2.

    Prefers targeted locus fetches (reference vcf/pipeline.py:106–142)
    over a whole-file scan.
    """
    from kmer_denovo_filter_tpu.htsio.bam import open_bam

    if not read_names:
        return Kraken2Result()

    sequences = {}
    bam = open_bam(child_bam, reference_filename=ref_fasta)
    used_targeted_fetch = False
    if informative_reads_by_variant:
        loci_to_names = {}
        for var_key, names in informative_reads_by_variant.items():
            if not names:
                continue
            parts = var_key.split(":")
            if len(parts) < 2:
                logger.warning(
                    "[Kraken2] Skipping malformed variant key "
                    "(missing ':'): %s", var_key)
                continue
            try:
                pos = int(parts[1])
            except ValueError:
                logger.warning(
                    "[Kraken2] Skipping malformed variant key "
                    "(non-integer pos): %s", var_key)
                continue
            target = set(names).intersection(read_names)
            if target:
                loci_to_names.setdefault(
                    (parts[0], pos), set()).update(target)
        if loci_to_names:
            used_targeted_fetch = True
            for (chrom, pos), target in sorted(loci_to_names.items()):
                for read in bam.fetch(chrom, pos, pos + 1):
                    if (read.query_name in target
                            and read.query_sequence
                            and read.query_name not in sequences):
                        sequences[read.query_name] = read.query_sequence

    if not used_targeted_fetch:
        for read in bam.fetch(until_eof=True):
            if read.query_name in read_names and read.query_sequence:
                if read.query_name not in sequences:
                    sequences[read.query_name] = read.query_sequence
    bam.close()

    if not sequences:
        return Kraken2Result()

    kr = Kraken2Runner(kraken2_db, confidence=confidence, threads=threads,
                       memory_mapping=memory_mapping)
    return kr.classify_sequences(sequences, tmpdir=tmpdir)
