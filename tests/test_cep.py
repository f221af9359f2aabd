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


class TestClickAbandonment:
    def _run(self, rows, tmp_path):
        import pandas as pd

        df = pd.DataFrame(rows, columns=[
            "event_id", "ts", "user_id", "event_type"])
        df["ts"] = pd.to_datetime(df["ts"], unit="us")
        d = tmp_path / "ab"
        d.mkdir()
        df.to_parquet(d / "events.parquet", index=False)
        from imagor_ray.pipelines.cep import click_abandonment
        out = click_abandonment(str(d)).to_pandas()
        return sorted(out["event_id"]) if len(out) else []

    def test_boundaries_are_strict(self, ray_session, tmp_path):
        W = 21600 * 1_000_000
        rows = [
            (1, 0, 7, "click"),          # purchase AT ts -> no rescue
            (2, 0, 7, "purchase"),
            (3, 10 * W, 8, "click"),     # purchase AT ts+W -> no rescue
            (4, 10 * W + W, 8, "purchase"),
            (5, 20 * W, 9, "click"),     # purchase strictly inside -> rescued
            (6, 20 * W + 1, 9, "purchase"),
            (7, 30 * W, 10, "click"),    # other user's purchase -> no rescue
            (8, 30 * W + 5, 11, "purchase"),
        ]
        assert self._run(rows, tmp_path) == [1, 3, 7]


class TestConversionLatency:
    def test_min_latency_and_kth_pick(self, ray_session, tmp_path):
        import pandas as pd

        # user 7: click at 0 with purchases at 10s and 20s -> min 10;
        # user 8: click at 0, purchase at 100s -> 100;
        # user 9: click at 0, purchase at 3600s -> 3600
        S = 1_000_000
        rows = [
            (1, 0, 7, "click"), (2, 10 * S, 7, "purchase"),
            (3, 20 * S, 7, "purchase"),
            (4, 0, 8, "click"), (5, 100 * S, 8, "purchase"),
            (6, 0, 9, "click"), (7, 3600 * S, 9, "purchase"),
        ]
        df = pd.DataFrame(rows, columns=[
            "event_id", "ts", "user_id", "event_type"])
        df["ts"] = pd.to_datetime(df["ts"], unit="us")
        d = tmp_path / "lat"
        d.mkdir()
        df.to_parquet(d / "events.parquet", index=False)
        from imagor_ray.pipelines.cep import conversion_latency_quantiles
        got = conversion_latency_quantiles(str(d))
        # n=3: k(50)=ceil(1.5)=2 -> 100; k(90)=ceil(2.7)=3 -> 3600;
        # k(99)=ceil(2.97)=3 -> 3600
        assert dict(zip(got["pct"], got["latency_s"])) == {
            50: 100, 90: 3600, 99: 3600}


class TestKleeneFunnel:
    def _run(self, rows, tmp_path):
        import pandas as pd

        df = pd.DataFrame(rows, columns=[
            "event_id", "ts", "user_id", "event_type"])
        df["ts"] = pd.to_datetime(df["ts"], unit="us")
        d = tmp_path / "kleene"
        d.mkdir()
        df.to_parquet(d / "events.parquet", index=False)
        from imagor_ray.pipelines.cep import cep_kleene_funnel
        out = cep_kleene_funnel(str(d)).to_pandas()
        return sorted(
            (int(r.user_id), int(r.n_clicks)) for r in out.itertuples())

    def test_plus_binds_variable_length_runs(self, ray_session, tmp_path):
        rows = [
            # user 1: signup click purchase -> match, 1 click
            (1, 0, 1, "signup"), (2, 10, 1, "click"), (3, 20, 1, "purchase"),
            # user 2: signup click click click purchase -> match, 3 clicks
            (4, 0, 2, "signup"), (5, 10, 2, "click"), (6, 20, 2, "click"),
            (7, 30, 2, "click"), (8, 40, 2, "purchase"),
            # user 3: signup purchase (zero clicks) -> NO match (+ not *)
            (9, 0, 3, "signup"), (10, 10, 3, "purchase"),
        ]
        assert self._run(rows, tmp_path) == [(1, 1), (2, 3)]

    def test_contiguity_is_strict(self, ray_session, tmp_path):
        rows = [
            # an error inside the run breaks it on both sides
            (1, 0, 1, "signup"), (2, 10, 1, "click"), (3, 20, 1, "error"),
            (4, 30, 1, "click"), (5, 40, 1, "purchase"),
            # an error between signup and first click breaks the prefix
            (6, 0, 2, "signup"), (7, 10, 2, "error"), (8, 20, 2, "click"),
            (9, 30, 2, "purchase"),
            # clean control
            (10, 0, 3, "signup"), (11, 10, 3, "click"),
            (12, 20, 3, "purchase"),
        ]
        # user 1: the second island (click@30) IS flanked by error..purchase
        # -> no signup before it, no match; the first island ends at error.
        assert self._run(rows, tmp_path) == [(3, 1)]

    def test_window_bound_is_inclusive_end_to_end(self, ray_session,
                                                  tmp_path):
        W = 21600 * 1_000_000
        rows = [
            (1, 0, 1, "signup"), (2, 10, 1, "click"), (3, W, 1, "purchase"),
            (4, 0, 2, "signup"), (5, 10, 2, "click"),
            (6, W + 1, 2, "purchase"),
        ]
        # purchase exactly at signup+W matches; one µs later does not
        assert self._run(rows, tmp_path) == [(1, 1)]

    def test_maximal_runs_do_not_overlap(self, ray_session, tmp_path):
        rows = [
            # signup c c purchase signup c purchase: two disjoint matches
            (1, 0, 1, "signup"), (2, 10, 1, "click"), (3, 20, 1, "click"),
            (4, 30, 1, "purchase"), (5, 40, 1, "signup"),
            (6, 50, 1, "click"), (7, 60, 1, "purchase"),
        ]
        assert self._run(rows, tmp_path) == [(1, 1), (1, 2)]

    def test_cross_user_adjacency_never_matches(self, ray_session,
                                                tmp_path):
        rows = [
            # user 5's clicks sandwiched by user 4's signup / user 6's
            # purchase in global ts order -> no match anywhere
            (1, 0, 4, "signup"), (2, 10, 5, "click"), (3, 20, 5, "click"),
            (4, 30, 6, "purchase"),
        ]
        assert self._run(rows, tmp_path) == []
