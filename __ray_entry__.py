"""Driver contract for the Ray Data engine (see imagor_ray/).

``entry()`` runs the flagship pipeline (transcripts → parse/sign →
filter-chain → enrich) on sf0.001. ``queries()``/``oracle_sql()`` expose
the full operator catalog from SURVEY.md §2 with DuckDB mirrors.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from imagor_ray.pipelines.flagship import processed_turns

    return processed_turns("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from imagor_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB equivalents; keys without an entry get the rows-only check
    (HMAC signing, approximate LSH, the 64-bit blurhash sketch)."""
    from imagor_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
