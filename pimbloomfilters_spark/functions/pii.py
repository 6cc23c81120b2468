"""PII detection and redaction — the data-hygiene stage every public
training corpus goes through before release (C4 and CCNet strip or mask
contact strings; see Raffel et al. 2020 §2.2, Dodge et al. 2021).

Spark-first shape: pure whole-stage-codegen column expressions
(``regexp_count`` / ``regexp_replace``) — zero Python on the hot path,
zero exchanges, filter-pushdown friendly. The patterns are written in the
regex subset Java's engine and RE2 (DuckDB) interpret identically
(character classes, bounded repetition, ``\\b`` anchors — no lookaround,
no backreferences), which keeps the operator oracle-testable cross-engine,
the same contract ``text.TOKEN_RE``/``text.BPE_RE`` already rely on.

Reference analogue: none (the reference has no corpus operators —
SURVEY §2.4); this extends the LLM-pipeline text family in
``functions/text.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# (name, pattern, replacement) — applied IN ORDER; each stage counts and
# rewrites the text produced by the previous stage. Order matters where
# patterns could otherwise nest (emails are masked before IPv4 so a
# dotted-quad inside a hostname-less address can't double-fire).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str | None = None,
               patterns=None) -> DataFrame:
    """Mask every PII match and count per-category hits.

    Adds one ``n_<name>`` int column per pattern (matches seen by that
    stage, i.e. after earlier stages' rewrites — SSNs masked as ``<SSN>``
    are no longer visible to the phone stage) and rewrites ``text_col``
    (or ``out_col`` if given) with all replacements applied. NULL text
    stays NULL with NULL counts.

    At 100 TB this is the cheapest kind of operator the engine has: a
    stateless projection fused into whole-stage codegen — it composes
    with any scan without adding a stage boundary."""
    pats = PII_PATTERNS if patterns is None else patterns
    out_col = out_col or text_col
    cur = F.col(text_col)
    counts = []
    for name, pat, repl in pats:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    keep = [c for c in df.columns if c != out_col]
    return df.select(*keep, *counts, cur.alias(out_col))


def pii_doc_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc columns..., has_pii boolean) — the filter-side view: flag
    documents containing ANY PII category without rewriting the text.
    Same codegen-only shape; use where the pipeline drops rather than
    masks."""
    flag = None
    for _, pat, _ in PII_PATTERNS:
        hit = F.regexp_count(F.col(text_col), F.lit(pat)) > 0
        flag = hit if flag is None else (flag | hit)
    return df.withColumn("has_pii", flag)
