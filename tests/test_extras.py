"""Edge-pinning tests for the round-5 extras: heavy hitters (sketch
superset + exact threshold boundary), gaps-and-islands streaks,
time-weighted integration, and the sliding-distinct fan-out — each on
a hand-built corpus where the answer is computed by hand, plus the
DuckDB mirror where the SQL is the clearer spec."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def tmp_sf(tmp_path):
    """A minimal sf-dir with a crafted events + documents table."""
    def _write(events: pd.DataFrame | None = None,
               documents: pd.DataFrame | None = None) -> str:
        d = str(tmp_path)
        if events is not None:
            pq.write_table(pa.Table.from_pandas(events, preserve_index=False),
                           os.path.join(d, "events.parquet"))
        if documents is not None:
            pq.write_table(
                pa.Table.from_pandas(documents, preserve_index=False),
                os.path.join(d, "documents.parquet"))
        return d
    return _write


def _events_frame(rows):
    """rows: (event_id, ts_str, user_id, event_type, value)"""
    return pd.DataFrame({
        "event_id": np.array([r[0] for r in rows], dtype="int64"),
        "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
        "user_id": np.array([r[2] for r in rows], dtype="int64"),
        "event_type": [r[3] for r in rows],
        "value": np.array([r[4] for r in rows], dtype="float64"),
        "props": ["{}"] * len(rows),
    })


class TestHeavyHitters:
    def test_threshold_boundary_exact(self, ray_session, tmp_sf):
        """cnt·65 > N is strict: a token at exactly N/65 must NOT
        appear; one token above must, with its EXACT count."""
        from imagor_ray.pipelines.heavy_hitters import heavy_hitter_tokens

        # 650 tokens total: 'hot' 11 times (11*65=715>650 → in),
        # 'edge' 10 times (10*65=650 = N → out), filler unique tokens.
        words = ["hot"] * 11 + ["edge"] * 10 + [f"w{i}" for i in range(629)]
        assert len(words) == 650
        # spread across 13 docs of 50 tokens each
        docs = pd.DataFrame({
            "doc_id": np.arange(13, dtype="int64"),
            "text": [" ".join(words[i * 50:(i + 1) * 50])
                     for i in range(13)],
            "lang": "en", "source": "t",
            "n_chars": np.int64(1),
        })
        out = heavy_hitter_tokens(tmp_sf(documents=docs))
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        assert list(out["token"]) == ["hot"]
        assert list(out["cnt"]) == [11]
        assert list(out["total_tokens"]) == [650]

    def test_matches_oracle_on_skew(self, ray_session, tmp_sf):
        from imagor_ray.pipelines.heavy_hitters import (
            HEAVY_HITTERS_SQL, heavy_hitter_tokens)

        rng = np.random.default_rng(7)
        vocab = [f"t{i}" for i in range(40)]
        p = 1 / (np.arange(1, 41) ** 1.5)
        p /= p.sum()
        docs = pd.DataFrame({
            "doc_id": np.arange(30, dtype="int64"),
            "text": [" ".join(rng.choice(vocab, size=37, p=p))
                     for _ in range(30)],
            "lang": "en", "source": "t", "n_chars": np.int64(1),
        })
        d = tmp_sf(documents=docs)
        got = heavy_hitter_tokens(d)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{d}/documents.parquet'")
        want = con.sql(HEAVY_HITTERS_SQL).df()
        assert len(got) == len(want) > 0
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True),
            check_dtype=False)


class TestStreaks:
    def test_hand_built_islands(self, ray_session, tmp_sf):
        from imagor_ray.pipelines.window_extras import activity_streaks

        day = 86_400
        rows, eid = [], 0
        # user 1 active on days 1,2,3, 10,11 → longest 3, 2 streaks
        for d in (1, 2, 3, 10, 11):
            rows.append((eid, pd.Timestamp(d * day, unit="s"), 1))
            eid += 1
        # user 2: one day, two events → longest 1, 1 streak, 1 day
        rows.append((eid, pd.Timestamp(5 * day + 10, unit="s"), 2))
        rows.append((eid + 1, pd.Timestamp(5 * day + 20, unit="s"), 2))
        ev = _events_frame([(i, ts, u, "view", 0.0) for i, ts, u in rows])
        out = activity_streaks(tmp_sf(events=ev)).to_pandas()
        out = out.sort_values("user_id").reset_index(drop=True)
        assert out.to_dict("list") == {
            "user_id": [1, 2], "longest_streak": [3, 1],
            "n_streaks": [2, 1], "n_active_days": [5, 1]}


class TestTimeWeighted:
    def test_hand_built_integral(self, ray_session, tmp_sf):
        from imagor_ray.pipelines.window_extras import time_weighted_value

        t0 = pd.Timestamp("2024-01-01")
        ev = _events_frame([
            (1, t0, 1, "view", 2.0),                    # holds 60 s
            (2, t0 + pd.Timedelta(seconds=60), 1, "view", 4.0),  # 30 s
            (3, t0 + pd.Timedelta(seconds=90), 1, "view", 9.9),  # last
            (4, t0, 2, "view", 5.0),                    # single → absent
        ])
        out = time_weighted_value(tmp_sf(events=ev)).to_pandas()
        assert list(out["user_id"]) == [1]
        # num = 2000·60e6 + 4000·30e6 ; den = 90e6 (µs)
        assert int(out["twa_num"][0]) == 2000 * 60_000_000 + 4000 * 30_000_000
        assert int(out["twa_den"][0]) == 90_000_000


class TestSlidingDistinct:
    def test_single_event_covers_six_windows(self, ray_session, tmp_sf):
        from imagor_ray.pipelines.window_extras import sliding_distinct_users

        ts = pd.Timestamp("2024-01-02 13:30:00")
        ev = _events_frame([(1, ts, 7, "view", 0.0)])
        out = sliding_distinct_users(tmp_sf(events=ev)).to_pandas()
        hr = int(ts.value // 1000 // 3_600_000_000)
        assert sorted(out["window_start_hr"]) == list(range(hr - 5, hr + 1))
        assert set(out["n_users"]) == {1}


class TestRobustValueStats:
    def test_lower_median_and_mad(self, ray_session, tmp_path):
        import pandas as pd

        # type 'a' (n=4, even -> k=2): vm = [1000, 2000, 3000, 9000],
        # median = 2000; devs = [1000, 0, 1000, 7000] -> sorted
        # [0,1000,1000,7000], k=2 -> MAD = 1000.
        # type 'b' (n=3, odd -> k=2): vm = [5000, 5000, 8000] (tie),
        # median = 5000; devs [0,0,3000] -> MAD = 0.
        rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 9.0),
                ("b", 5.0), ("b", 5.0), ("b", 8.0)]
        df = pd.DataFrame(rows, columns=["event_type", "value"])
        d = tmp_path / "rv"
        d.mkdir()
        df.to_parquet(d / "events.parquet", index=False)
        from imagor_ray.pipelines.analytics import robust_value_stats
        got = robust_value_stats(str(d))
        assert got.set_index("event_type").to_dict("index") == {
            "a": {"n": 4, "median_milli": 2000, "mad_milli": 1000},
            "b": {"n": 3, "median_milli": 5000, "mad_milli": 0},
        }


class TestScd2Dimension:
    def test_hand_built_versions(self, ray_session, tmp_sf):
        from imagor_ray.pipelines.grouped_extras import scd2_dimension

        us = 1_000_000
        rows = [
            # user 1: view view click view  → 3 versions
            (0, pd.Timestamp(10 * us, unit="us"), 1, "view", 0.0),
            (1, pd.Timestamp(20 * us, unit="us"), 1, "view", 0.0),
            (2, pd.Timestamp(30 * us, unit="us"), 1, "click", 0.0),
            (3, pd.Timestamp(40 * us, unit="us"), 1, "view", 0.0),
            # user 2: single event → one open version
            (4, pd.Timestamp(15 * us, unit="us"), 2, "purchase", 0.0),
            # user 3: ts tie broken by event_id (click then view)
            (5, pd.Timestamp(50 * us, unit="us"), 3, "click", 0.0),
            (6, pd.Timestamp(50 * us, unit="us"), 3, "view", 0.0),
        ]
        out = scd2_dimension(tmp_sf(events=_events_frame(rows))).to_pandas()
        out = out.sort_values(["user_id", "version"]).reset_index(drop=True)
        assert out.to_dict("list") == {
            "user_id": [1, 1, 1, 2, 3, 3],
            "version": [1, 2, 3, 1, 1, 2],
            "attr": ["view", "click", "view", "purchase", "click", "view"],
            "valid_from_us": [10 * us, 30 * us, 40 * us, 15 * us,
                              50 * us, 50 * us],
            "valid_to_us": [30 * us, 40 * us, -1, -1, 50 * us, -1],
            "is_current": [0, 0, 1, 1, 0, 1],
            "n_events": [2, 1, 1, 1, 1, 1],
        }

    def test_single_user_cross_bucket_independence(self, ray_session, tmp_sf):
        # runs never span users, so the per-user last version must be
        # open (-1) even when the shift window crosses into the next
        # user inside one bucket (users 0 and 64 share bucket 0)
        from imagor_ray.pipelines.grouped_extras import scd2_dimension

        rows = [
            (0, pd.Timestamp(1, unit="s"), 0, "view", 0.0),
            (1, pd.Timestamp(2, unit="s"), 64, "view", 0.0),
        ]
        out = scd2_dimension(tmp_sf(events=_events_frame(rows))).to_pandas()
        out = out.sort_values("user_id").reset_index(drop=True)
        assert out["valid_to_us"].tolist() == [-1, -1]
        assert out["is_current"].tolist() == [1, 1]
        assert out["version"].tolist() == [1, 1]
