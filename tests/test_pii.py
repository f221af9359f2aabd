"""PII scan/redact: planted-match non-vacuity, sre↔RE2 dialect parity
on the shipped patterns, and the sequential-count semantics the SQL
mirror reproduces stage by stage."""

from __future__ import annotations

import re

import duckdb
import pytest

from imagor_ray.pipelines.pii import (
    PII_PATTERNS, _COMPILED, _ORDER, _TOKEN, _augment,
)

SF = "/root/testdata/sf0.001"


def test_augment_plants_every_family():
    # doc_id = 5005 = 5*7*11*13 → all four suffixes at once
    s = _augment(5005, "base text")
    assert _COMPILED["email"].search(s)
    assert _COMPILED["phone"].search(s)
    assert _COMPILED["ssn"].search(s)
    assert _COMPILED["ip"].search(s)


def test_families_disjoint_on_planted_text():
    """No planted span is claimed by two families (redaction order is
    determinism-only, not semantics, on this corpus)."""
    for doc_id in range(0, 200):
        s = _augment(doc_id, "w " * 5)
        spans = []
        for k in _ORDER:
            spans += [(m.start(), m.end(), k) for m in _COMPILED[k].finditer(s)]
        spans.sort()
        for (s1, e1, k1), (s2, e2, k2) in zip(spans, spans[1:]):
            assert e1 <= s2, (doc_id, k1, k2)


@pytest.mark.parametrize("family", sorted(PII_PATTERNS))
def test_re2_and_sre_agree(family):
    """The exact pattern text must extract identical match lists under
    Python re (ASCII) and DuckDB RE2 on adversarial inputs."""
    pat = PII_PATTERNS[family]
    samples = [
        "user1@example.com call 555-123-4567 ssn 123-45-6789 10.0.0.1",
        "a@b.co x123-456-78901 1.2.3.4.5 nope@ @nope 12-34-5678",
        "edge 999-999-9999 000-00-0000 255.255.255.255 u.v-w%x+y@z-9.org",
        "",
    ]
    con = duckdb.connect()
    for s in samples:
        got_py = _COMPILED[family].findall(s)
        got_sql = con.sql(
            "SELECT regexp_extract_all(?, ?)", params=[s, pat]
        ).fetchone()[0]
        assert got_py == got_sql, (family, s)


def test_sequential_subn_matches_stagewise_counts():
    """n_redactions counts each family on the PREVIOUS stage's output —
    pin it on a crafted string where a phone is embedded in an email
    local part (email redaction destroys the phone match)."""
    s = "reach 555-123-4567@example.com now"
    total = 0
    cur = s
    for k in _ORDER:
        cur, n = _COMPILED[k].subn(_TOKEN[k], cur)
        total += n
    # email consumed the whole token; the phone inside it never counted
    assert total == 1 and "<EMAIL>" in cur and "<PHONE>" not in cur


def test_scan_nonvacuous(ray_session):
    from imagor_ray.pipelines.pii import pii_scan

    df = pii_scan(SF).to_pandas()
    assert df["pii_total"].sum() > 0
    for c in ("n_emails", "n_phones", "n_ssns", "n_ips"):
        assert df[c].sum() > 0, c


def test_corpus_clean_composition(ray_session):
    """Twins differ from their base ONLY in PII spans, so they collapse
    iff redaction ran before dedup — the base (smaller doc_id) must
    always win, so no twin id survives."""
    from imagor_ray.pipelines.pii import _TWIN_OFFSET, corpus_clean

    df = corpus_clean(SF).to_pandas()
    assert len(df) > 0
    assert (df["doc_id"] < _TWIN_OFFSET).all()
    assert (df["quality_milli"] >= 400).all()
    assert df["redacted_md5"].is_unique
