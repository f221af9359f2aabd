"""PII detection / redaction over ``documents`` — the scrubbing pass a
training-data pipeline runs between ingestion and tokenization (the
reference's analogue is the per-record ``redact``/``redact_oval`` filter
family, ``processor/vipsprocessor/filter.go`` region blanking; here the
regions are regex spans in text instead of pixel rectangles).

Four canonical detectors (email, NANP-style phone, SSN, IPv4), each a
single regex that parses identically under Python ``re`` (compiled with
``re.ASCII``) and DuckDB's RE2 — the whole oracle contract rests on that
dialect intersection, so patterns stay inside it: ASCII classes, ``\\b``
word boundaries, bounded repetition, no lookaround.

The synthetic corpus is PII-free word salad, so (``embedding_neardup_
planted`` precedent) the entries PLANT deterministic PII derived from
``doc_id`` inside the query itself, with the SQL mirror concatenating
the identical suffixes — the hash gate then bites on hundreds of known
matches instead of vacuously passing on zero rows.

Scale shape: both entries are pure maps over a column-pruned read —
zero shuffle at any corpus size; regexes compile once per worker
process at module import, and matching runs in C (sre / RE2).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import ray.data as rd

__all__ = ["pii_scan", "pii_redact", "PII_SCAN_SQL", "PII_REDACT_SQL",
           "PII_PATTERNS"]

# pattern text is shared verbatim with the SQL mirror (RE2 ∩ sre).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}
# redaction applies in this fixed order; the four pattern families are
# pairwise non-overlapping on any input (digit-group shapes differ), so
# the order only matters for determinism, not semantics.
_ORDER = ("email", "phone", "ssn", "ip")
_COMPILED = {k: re.compile(v, re.ASCII) for k, v in PII_PATTERNS.items()}
_TOKEN = {"email": "<EMAIL>", "phone": "<PHONE>", "ssn": "<SSN>",
          "ip": "<IP>"}


def _augment(doc_id: int, text: str) -> str:
    """Deterministic planted PII (mirrored in SQL as CASE-guarded
    concatenation). Arithmetic keeps every numeric group at a fixed
    digit count so no lpad is needed on either side."""
    s = text
    if doc_id % 5 == 0:
        s += f" contact user{doc_id}@example.com now"
    if doc_id % 7 == 0:
        s += f" call {100 + doc_id % 900}-555-{1000 + doc_id % 9000}"
    if doc_id % 11 == 0:
        s += f" ssn {100 + doc_id % 900}-{10 + doc_id % 90}-{1000 + doc_id % 9000}"
    if doc_id % 13 == 0:
        s += f" host 10.{doc_id % 256}.{(doc_id * 7) % 256}.{1 + doc_id % 200}"
    return s


# the identical augmentation as a SQL expression over (doc_id, text)
_AUGMENT_SQL = (
    "text"
    " || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || doc_id"
    " || '@example.com now' ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' call ' || (100 + doc_id % 900)"
    " || '-555-' || (1000 + doc_id % 9000) ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' ssn ' || (100 + doc_id % 900)"
    " || '-' || (10 + doc_id % 90) || '-' || (1000 + doc_id % 9000)"
    " ELSE '' END"
    " || CASE WHEN doc_id % 13 = 0 THEN ' host 10.' || (doc_id % 256)"
    " || '.' || ((doc_id * 7) % 256) || '.' || (1 + doc_id % 200)"
    " ELSE '' END"
)


def pii_scan(sf_dir: str) -> rd.Dataset:
    """Per-document PII hit counts by detector family.

    Output: doc_id, n_emails, n_phones, n_ssns, n_ips, pii_total.
    """
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def scan(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy()
        texts = [_augment(int(i), t) for i, t in zip(ids, b["text"])]
        counts = {
            k: np.array([len(_COMPILED[k].findall(t)) for t in texts],
                        dtype="int64")
            for k in _ORDER
        }
        return pd.DataFrame({
            "doc_id": ids.astype("int64"),
            "n_emails": counts["email"],
            "n_phones": counts["phone"],
            "n_ssns": counts["ssn"],
            "n_ips": counts["ip"],
            "pii_total": counts["email"] + counts["phone"]
            + counts["ssn"] + counts["ip"],
        })

    return docs.map_batches(scan, batch_format="pandas")


def pii_redact(sf_dir: str) -> rd.Dataset:
    """Redacted-text fingerprints: every detector match is replaced by
    its ``<FAMILY>`` token (fixed email→phone→ssn→ip order) and the
    result is content-addressed — the hash gate certifies byte-exact
    replacement semantics between sre and RE2.

    Output: doc_id, n_redactions, redacted_md5.
    """
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def redact(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy()
        n_red, digests = [], []
        for i, t in zip(ids, b["text"]):
            s = _augment(int(i), t)
            total = 0
            for k in _ORDER:
                s, n = _COMPILED[k].subn(_TOKEN[k], s)
                total += n
            n_red.append(total)
            digests.append(hashlib.md5(s.encode("utf-8")).hexdigest())
        return pd.DataFrame({
            "doc_id": ids.astype("int64"),
            "n_redactions": np.array(n_red, dtype="int64"),
            "redacted_md5": digests,
        })

    return docs.map_batches(redact, batch_format="pandas")


# NOTE: SQL single-quoted strings pass backslashes through untouched,
# so the raw pattern text is embedded directly (no doubling needed).

PII_SCAN_SQL = f"""
WITH aug AS (
  SELECT doc_id, {_AUGMENT_SQL} AS t FROM documents
), c AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t, '{PII_PATTERNS["email"]}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(t, '{PII_PATTERNS["phone"]}')) AS BIGINT) AS n_phones,
         CAST(len(regexp_extract_all(t, '{PII_PATTERNS["ssn"]}')) AS BIGINT) AS n_ssns,
         CAST(len(regexp_extract_all(t, '{PII_PATTERNS["ip"]}')) AS BIGINT) AS n_ips
  FROM aug
)
SELECT doc_id, n_emails, n_phones, n_ssns, n_ips,
       n_emails + n_phones + n_ssns + n_ips AS pii_total
FROM c
"""

# sequential-stage mirror of the Python subn chain: each family is
# counted on the PREVIOUS stage's output (identical semantics even if
# an earlier replacement were ever to destroy a later-family match).
PII_REDACT_SQL = f"""
WITH aug AS (
  SELECT doc_id, {_AUGMENT_SQL} AS t FROM documents
), s1 AS (
  SELECT doc_id, t AS prev,
         regexp_replace(t, '{PII_PATTERNS["email"]}', '<EMAIL>', 'g') AS cur,
         CAST(len(regexp_extract_all(t, '{PII_PATTERNS["email"]}')) AS BIGINT) AS n
  FROM aug
), s2 AS (
  SELECT doc_id,
         regexp_replace(cur, '{PII_PATTERNS["phone"]}', '<PHONE>', 'g') AS cur,
         n + CAST(len(regexp_extract_all(cur, '{PII_PATTERNS["phone"]}')) AS BIGINT) AS n
  FROM s1
), s3 AS (
  SELECT doc_id,
         regexp_replace(cur, '{PII_PATTERNS["ssn"]}', '<SSN>', 'g') AS cur,
         n + CAST(len(regexp_extract_all(cur, '{PII_PATTERNS["ssn"]}')) AS BIGINT) AS n
  FROM s2
), s4 AS (
  SELECT doc_id,
         regexp_replace(cur, '{PII_PATTERNS["ip"]}', '<IP>', 'g') AS cur,
         n + CAST(len(regexp_extract_all(cur, '{PII_PATTERNS["ip"]}')) AS BIGINT) AS n
  FROM s3
)
SELECT doc_id, n AS n_redactions, md5(cur) AS redacted_md5
FROM s4
"""
