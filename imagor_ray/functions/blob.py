"""Blob-analogue helpers: content sniffing and payload stats for text
payloads — the engine's stand-in for the reference ``Blob`` abstraction
(lazy byte streams with 512-byte magic-byte sniffing,
``blob.go:297-299, 354-521``; type tables ``blob.go:163-211``).

In the text domain a payload's "content type" is detected from its first
characters (the sniff window), deterministically and SQL-mirrorably:

==========  =====================================================
type        rule (on the first non-space character window)
==========  =====================================================
empty       zero-length payload (BlobTypeEmpty, blob.go:24-47)
json        first char '{' or '[' (BlobTypeJSON)
hex         non-empty, all chars in [0-9A-F], even length
b64         non-empty, all chars in base64 alphabet ending '=' pad
text        everything else (the Memory/unknown fallback)
==========  =====================================================

Order matters (json before hex before b64), mirroring the reference's
first-match magic table scan.
"""

from __future__ import annotations

import re

__all__ = ["sniff_content_type", "SNIFF_SQL_CASE"]

_HEX_RE = re.compile(r"[0-9A-F]+\Z")
_B64_RE = re.compile(r"[A-Za-z0-9+/]+={1,2}\Z")


def sniff_content_type(text: str) -> str:
    """Deterministic content-type sniff of a text payload."""
    if text == "":
        return "empty"
    head = text[:512]
    first = head.lstrip(" ")
    if first[:1] in ("{", "["):
        return "json"
    if len(text) % 2 == 0 and _HEX_RE.fullmatch(text):
        return "hex"
    if _B64_RE.fullmatch(text):
        return "b64"
    return "text"


#: DuckDB CASE expression computing the same sniff over a column named
#: ``payload`` (RE2 regexps mirror the Python patterns).
SNIFF_SQL_CASE = """
CASE
  WHEN payload = '' THEN 'empty'
  WHEN left(ltrim(left(payload, 512), ' '), 1) IN ('{', '[') THEN 'json'
  WHEN length(payload) % 2 = 0 AND regexp_full_match(payload, '[0-9A-F]+') THEN 'hex'
  WHEN regexp_full_match(payload, '[A-Za-z0-9+/]+={1,2}') THEN 'b64'
  ELSE 'text'
END
"""
