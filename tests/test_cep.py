"""CEP sequence detection (pipelines/cep.py) unit semantics."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from imagor_ray.pipelines.cep import tool_sequence_matches


def _ds(rows):
    df = pd.DataFrame(rows, columns=["conv_id", "tool", "ts"])
    df["ts"] = pd.to_datetime(df["ts"])
    return rd.from_pandas(df)


def _run(ds, within_s=3600):
    out = tool_sequence_matches(ds, "signup", "purchase", within_s)
    return dict(zip(*(lambda d: (d["conv_id"], d["n_matches"]))(out.to_pandas())))


class TestFunnel:
    def test_basic_match_and_window(self, ray_session):
        got = _run(_ds([
            ("c1", "signup",   "2024-01-01 10:00:00"),
            ("c1", "purchase", "2024-01-01 10:30:00"),   # within
            ("c1", "purchase", "2024-01-01 12:00:00"),   # outside 1h
            ("c2", "purchase", "2024-01-01 10:00:00"),   # wrong order
            ("c2", "signup",   "2024-01-01 10:10:00"),
            ("c3", "signup",   "2024-01-01 09:00:00"),   # no purchase
        ]))
        assert got == {"c1": 1}

    def test_boundary_semantics(self, ray_session):
        got = _run(_ds([
            ("c1", "signup",   "2024-01-01 10:00:00"),
            ("c1", "purchase", "2024-01-01 10:00:00"),   # same ts: NOT after
            ("c1", "purchase", "2024-01-01 11:00:00"),   # exactly +1h: included
        ]))
        assert got == {"c1": 1}

    def test_all_pairs_counted(self, ray_session):
        got = _run(_ds([
            ("c1", "signup",   "2024-01-01 10:00:00"),
            ("c1", "signup",   "2024-01-01 10:05:00"),
            ("c1", "purchase", "2024-01-01 10:30:00"),
            ("c1", "purchase", "2024-01-01 10:40:00"),
        ]))
        assert got == {"c1": 4}  # 2 signups x 2 purchases, all within

    def test_unrelated_tools_ignored(self, ray_session):
        got = _run(_ds([
            ("c1", "signup",   "2024-01-01 10:00:00"),
            ("c1", "click",    "2024-01-01 10:10:00"),
            ("c1", "purchase", "2024-01-01 10:20:00"),
        ]))
        assert got == {"c1": 1}
