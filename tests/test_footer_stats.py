"""Zone-map late stats (round-4): exact (late_count, total, max_us)
from parquet row-group footers, with driver-side scanning only of the
row groups whose [min, max] straddles the watermark, and a clean
fallback signal for stats-less files."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from imagor_ray.pipelines.streaming import StreamingSessionJob


def _write(tmp_path, ts_us_values, row_group_size=None, stats=True):
    df = pd.DataFrame({
        "conv_id": [f"c{i}" for i in range(len(ts_us_values))],
        "ts": pd.to_datetime(np.asarray(ts_us_values, dtype="int64"), unit="us"),
    })
    p = str(tmp_path / "batch.parquet")
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False), p,
        row_group_size=row_group_size or len(df) or 1,
        write_statistics=stats,
    )
    return p


@pytest.mark.parametrize("wm", [0, 50, 150, 250, 1_000])
def test_exact_counts_across_row_groups(tmp_path, wm):
    # 3 row groups of 4: [0..300] us in steps of 25
    ts = list(range(0, 300, 25))
    p = _write(tmp_path, ts, row_group_size=4)
    late, total, max_us = StreamingSessionJob._footer_late_stats(p, wm)
    assert total == len(ts)
    assert late == sum(1 for t in ts if t < wm)
    assert max_us == max(ts)


def test_no_late_needs_no_scan(tmp_path, monkeypatch):
    """min >= wm for every group → zero row groups read (the common
    case costs footer metadata only)."""
    p = _write(tmp_path, [100, 200, 300, 400], row_group_size=2)

    def boom(*a, **k):
        raise AssertionError("row group scanned despite clean zone maps")

    monkeypatch.setattr(pq, "ParquetFile", boom)
    late, total, max_us = StreamingSessionJob._footer_late_stats(p, 100)
    assert (late, total, max_us) == (0, 4, 400)


def test_all_late_group_counted_without_scan(tmp_path, monkeypatch):
    p = _write(tmp_path, [10, 20, 500, 600], row_group_size=2)

    def boom(*a, **k):
        raise AssertionError("fully-late group should come from zone maps")

    monkeypatch.setattr(pq, "ParquetFile", boom)
    late, total, max_us = StreamingSessionJob._footer_late_stats(p, 400)
    assert (late, total, max_us) == (2, 4, 600)


def test_statless_file_signals_fallback(tmp_path):
    p = _write(tmp_path, [1, 2, 3], stats=False)
    assert StreamingSessionJob._footer_late_stats(p, 2) == (None, 0, None)


def test_empty_file_falls_back(tmp_path):
    """An empty file has a statless (or absent) row group — the zone-map
    reader signals fallback and the distributed partials pass (over an
    empty dataset) yields late=0 / wm unchanged, which the streaming
    tests cover end-to-end."""
    p = _write(tmp_path, [])
    late, total, max_us = StreamingSessionJob._footer_late_stats(p, 123)
    assert (late in (0, None)) and total == 0 and max_us is None
