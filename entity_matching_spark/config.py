"""Pipeline configuration, including reference-fidelity quirk flags.

The reference implementation has several semantic quirks that a faithful
re-implementation must decide on explicitly (see SURVEY.md §4.4). Each is a
flag here, with the default replicating the reference behavior bit-for-bit
except where SURVEY.md documents the intended-semantics choice.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
import hashlib
import json


@dataclass(frozen=True)
class MatchConfig:
    """All tunables for the record-linkage pipeline.

    Quirk flags (reference citations into /root/reference):

    - ``penalty_inverted`` (Q1): DiscrepancySeverity penalties are NEGATIVE
      constants (CRITICAL=-25 .. LOW=-5, entity/DiscrepancySeverity.java:7-10)
      while ConfidenceScorer SUBTRACTS their (capped) sum
      (engine/ConfidenceScorer.java:44-46,130-139) — so each discrepancy
      *raises* the reference's final score. Default True replicates that
      arithmetic; False applies the documented intent (penalties reduce score).

    - ``jw_commons_distance_mode`` (Q2): commons-text >=1.8
      JaroWinklerDistance.apply returns 1-similarity, but every reference call
      site treats it as similarity (engine/FuzzyNameMatcher.java:92,113,127).
      Default False computes true JW similarity (the documented intent per
      system-requirements.md:193-217); True reproduces the raw library value
      for differential testing.

    - ``drop_debt_domain_boost`` (Q3): the reference writes the Debt-Domain
      boost under key "debt domain id_boost" (spaces,
      engine/IdentifierMatcher.java:137) but the scorer reads
      "debt_domain_id_boost" (engine/ConfidenceScorer.java:95) — the boost is
      silently lost. Default True replicates the loss.

    - ``collapse_newlines_in_text`` (Q5, graft addition): the reference's
      CharacterNormalizer.normalize collapses ALL whitespace including
      newlines (extraction/CharacterNormalizer.java:65), which makes the
      line-anchored field patterns ([^\\n]+, MULTILINE ^/$ in
      extraction/FieldParser.java:45-72) capture to end-of-document. Default
      False preserves line structure during document-level normalization so
      field extraction is line-scoped (names *within* a line still get the
      exact normalization chain); True replicates the reference collapse.
    """

    # --- thresholds (engine/FuzzyNameMatcher.java:18-19, orchestrator:192-212)
    legal_name_threshold: float = 0.85
    fund_manager_threshold: float = 0.70
    match_threshold: float = 85.0
    review_threshold: float = 50.0
    fuzzy_keep_threshold: float = 50.0  # MatchingEngine.java:72

    # --- quirk flags (SURVEY.md §4.4)
    penalty_inverted: bool = True
    jw_commons_distance_mode: bool = False
    drop_debt_domain_boost: bool = True
    collapse_newlines_in_text: bool = False
    # document normalization path. False (default) = Arrow pandas UDF; True =
    # native JVM regexp chain. Measured on the bench corpus the pandas path is
    # 2-2.6x FASTER: a pandas UDF under when() is evaluated for every row
    # (ArrowEvalPython is unconditional), so the native chain pays the
    # transliteration UDF AND ~12 java.util.regex passes over full documents.
    # Outputs are test-pinned equal either way (test_assemble.py).
    native_doc_normalization: bool = False
    # A5: treat the input text as OCR-derived — the per-record OCR-confidence
    # estimate (operators/assemble.ocr_confidence) then multiplies into
    # extraction_confidence (MultiFormatDocumentExtractor.java:30-62).
    # Transcripts are born-digital, so the default is False (multiplier 1.0,
    # exactly the reference's non-OCR path); the ocr_confidence column is
    # emitted either way.
    ocr_text_mode: bool = False
    # keep the normalized document text columns in the S1 records output
    # (debugging aid). Off by default: the text dominates row size and is
    # dead weight in every downstream shuffle once extraction has run.
    keep_normalized_text: bool = False

    # --- blocking / skew control (SURVEY.md §4.3.1)
    # which blocking passes run (subset of operators/blocking.BLOCKING_PASSES);
    # production default = all; cheap smoke configs can drop the heavy ones
    blocking_passes: tuple = (
        "mei", "lei", "ein", "debt_domain", "cleanname", "email_domain",
        "nametok", "sorted_neighborhood",
    )
    max_block_size: int = 100          # analog of LIMIT 100 (sql/findByName.sql:10)
    salt_threshold: int = 32           # groups above this use the bucket-pair salted join
    sorted_neighborhood_window: int = 3
    name_token_min_len: int = 3
    salt_buckets: int = 8              # salt fan-out for oversized key groups
    shuffle_partitions: int = 32

    # --- clustering
    include_duplicate_edges: bool = False  # union J1/J2 exact-key edges into S5
    cc_max_iterations: int = 50

    # --- decision / output
    top_k_matches: int = 5             # MatchingEngine.java:153-155
    # per-probe cap on FUZZY_NAME candidates (sql/findByName.sql LIMIT 100);
    # 0 disables. Catalog mode applies it per probe (operators/catalog.py);
    # the batch self-linkage path applies the symmetric variant (a pair is
    # kept if within EITHER endpoint's top-n — both endpoints are probes,
    # operators/blocking.cap_fuzzy_fanout) when cap_fuzzy_self_linkage is on.
    max_candidates_per_probe: int = 100
    cap_fuzzy_self_linkage: bool = True

    def params_hash(self) -> str:
        """Stable hash of the config for checkpoint identity."""
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]


DEFAULT_CONFIG = MatchConfig()


# Severity -> penalty constants. NOTE: negative, exactly as the reference
# (entity/DiscrepancySeverity.java:6-11). ConfidenceScorer then does
# score -= min(sum, 50); with negative values the subtraction ADDS (quirk Q1).
SEVERITY_PENALTY = {
    "CRITICAL": -25.0,
    "HIGH": -15.0,
    "MEDIUM": -10.0,
    "LOW": -5.0,
}
