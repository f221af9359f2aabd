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

__all__ = ["pii_scan", "pii_redact", "corpus_clean",
           "PII_SCAN_SQL", "PII_REDACT_SQL", "CORPUS_CLEAN_SQL",
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


# twin offset ≡ 0 (mod 5·7·11·13): a twin draws the SAME planted-PII
# families as its base, so after redaction the pair is byte-identical —
# the mirror-page-differing-only-by-contact-info dedup case.
_TWIN_OFFSET = 5005 * 200          # 1_001_000
_TWIN_MOD = 17


def corpus_clean(sf_dir: str, min_quality: int = 400,
                 num_buckets: int = 32) -> rd.Dataset:
    """The COMPOSED training-data cleaning pipeline: PII-redact →
    quality-score (on the redacted text, the bytes that would ship) →
    threshold filter → exact content dedup. Every stage is the verified
    single op (``pii_redact``, ``doc_quality``'s formula,
    ``dedup_exact``'s topology); this entry verifies the COMPOSITION —
    order matters (dedup runs on redacted survivors) and the planted
    twins (doc_id + 1,001,000, same text, PII-pattern-congruent) only
    collapse BECAUSE redaction ran first.

    Scale shape: redact+score+filter is one pure map; the only shuffle
    is the content-hash bucket exchange of dedup_exact, carrying just
    (doc_id, quality_milli, md5) for quality survivors.

    Output: doc_id, quality_milli, redacted_md5 (one row per distinct
    redacted content, min doc_id wins).
    """
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def plant(b: pd.DataFrame) -> pd.DataFrame:
        sel = b[b["doc_id"] % _TWIN_MOD == 0]
        if not len(sel):
            return b
        twins = sel.assign(doc_id=sel["doc_id"] + _TWIN_OFFSET)
        return pd.concat([b, twins], ignore_index=True)

    def redact_score(b: pd.DataFrame) -> pd.DataFrame:
        stop = {"the", "a", "of", "and", "to"}
        ids = b["doc_id"].to_numpy()
        rows = {"doc_id": ids.astype("int64"), "quality_milli": [],
                "redacted_md5": [], "_hb": []}
        punct_re = re.compile(r"[^A-Za-z0-9 ]")
        for i, t in zip(ids, b["text"]):
            s = _augment(int(i), t)
            for k in _ORDER:
                s = _COMPILED[k].sub(_TOKEN[k], s)
            n_chars = len(s)
            toks = s.split(" ")
            n_tokens = len(toks)
            stop_count = sum(1 for x in toks if x in stop)
            n_punct = len(punct_re.findall(s))
            q = (0.5 * (min(n_chars, 500) / 500.0)
                 + 0.3 * (stop_count / max(n_tokens, 1))
                 + 0.2 * (1.0 - n_punct / max(n_chars, 1)))
            digest = hashlib.md5(s.encode("utf-8")).hexdigest()
            rows["quality_milli"].append(int(np.floor(q * 1000)))
            rows["redacted_md5"].append(digest)
            rows["_hb"].append(int(digest[:8], 16) % num_buckets)
        out = pd.DataFrame(rows)
        out["quality_milli"] = out["quality_milli"].astype("int64")
        out["_hb"] = out["_hb"].astype("int32")
        return out[out["quality_milli"] >= min_quality]

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["redacted_md5", "doc_id"], kind="mergesort")
        g = g.drop_duplicates("redacted_md5", keep="first")
        return g[["doc_id", "quality_milli", "redacted_md5"]]

    return (docs
            .map_batches(plant, batch_format="pandas")
            .map_batches(redact_score, batch_format="pandas")
            .groupby("_hb")
            .map_groups(lambda g: dedup(g.drop(columns=["_hb"])),
                        batch_format="pandas"))


_RED_EXPR = (
    f"regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,"
    f" '{PII_PATTERNS['email']}', '<EMAIL>', 'g'),"
    f" '{PII_PATTERNS['phone']}', '<PHONE>', 'g'),"
    f" '{PII_PATTERNS['ssn']}', '<SSN>', 'g'),"
    f" '{PII_PATTERNS['ip']}', '<IP>', 'g')"
)

CORPUS_CLEAN_SQL = f"""
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_TWIN_OFFSET}, text FROM documents
  WHERE doc_id % {_TWIN_MOD} = 0
), aug AS (
  SELECT doc_id, {_AUGMENT_SQL} AS t FROM base
), red AS (
  SELECT doc_id, {_RED_EXPR} AS s FROM aug
), m AS (
  SELECT doc_id, s,
         length(s) AS n_chars,
         len(string_split(s, ' ')) AS n_tokens,
         len(list_filter(string_split(s, ' '),
             x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS stop_count,
         len(regexp_extract_all(s, '[^A-Za-z0-9 ]')) AS n_punct
  FROM red
), q AS (
  SELECT doc_id, md5(s) AS redacted_md5,
         CAST(floor((0.5 * (least(n_chars, 500) / 500.0)
                     + 0.3 * (stop_count / greatest(n_tokens, 1))
                     + 0.2 * (1.0 - n_punct / greatest(n_chars, 1)))
                    * 1000) AS BIGINT) AS quality_milli
  FROM m
)
SELECT doc_id, quality_milli, redacted_md5
FROM q WHERE quality_milli >= 400
QUALIFY row_number() OVER (PARTITION BY redacted_md5 ORDER BY doc_id) = 1
"""
