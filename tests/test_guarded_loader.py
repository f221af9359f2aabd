"""Guarded external-source loader (HTTPLoader analogue,
httploader.go:182-260): allow-list, size pre-check, retryable fetch,
accepts validation, dead-letter routing — against local fixtures."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from imagor_ray.sources.loader import (
    ERR_FETCH_FAILED, ERR_MAX_SIZE_EXCEEDED, ERR_NOT_FOUND,
    ERR_SOURCE_NOT_ALLOWED, AllowedSource, FlakyTransport,
    GuardedLoaderStage, LocalFileTransport, guarded_load,
)


@pytest.fixture()
def fixtures(tmp_path):
    root = tmp_path / "remote"
    for host in ("cdn.example.fixture", "evil.example.fixture"):
        os.makedirs(root / host / "img")
    (root / "cdn.example.fixture" / "img" / "small.txt").write_text("hello world")
    (root / "cdn.example.fixture" / "img" / "big.txt").write_text("x" * 4096)
    (root / "evil.example.fixture" / "img" / "evil.txt").write_text("nope")
    return str(root)


class TestAllowedSource:
    def test_glob_patterns(self):
        a = AllowedSource("*.example.fixture")
        assert a.match("cdn.example.fixture")
        assert not a.match("example.fixture")
        assert not a.match("cdn.example.fixture.evil.io")

    def test_regex_patterns(self):
        a = AllowedSource(r"regex:cdn[0-9]*\.example\.fixture")
        assert a.match("cdn7.example.fixture")
        assert not a.match("evil.example.fixture")


class TestGuards:
    def test_allow_list_rejects(self, fixtures):
        stage = GuardedLoaderStage(
            LocalFileTransport(fixtures), allowed_sources=("cdn.*",))
        out = stage(pd.DataFrame({"key": [
            "cdn.example.fixture/img/small.txt",
            "evil.example.fixture/img/evil.txt",
        ]}))
        assert out["error_code"].tolist() == ["", ERR_SOURCE_NOT_ALLOWED]
        assert out["payload"].tolist()[0] == "hello world"

    def test_path_traversal_rejected(self, fixtures):
        stage = GuardedLoaderStage(LocalFileTransport(fixtures))
        out = stage(pd.DataFrame({"key": [
            "cdn.example.fixture/../../etc/passwd", "", "nokey"]}))
        assert out["error_code"].tolist() == [ERR_SOURCE_NOT_ALLOWED] * 3

    def test_size_precheck_rejects_oversized_without_fetch(self, fixtures):
        class CountingTransport(LocalFileTransport):
            gets = 0

            def get(self, key):
                CountingTransport.gets += 1
                return super().get(key)

        stage = GuardedLoaderStage(
            CountingTransport(fixtures), max_allowed_size=1024)
        out = stage(pd.DataFrame({"key": [
            "cdn.example.fixture/img/big.txt",
            "cdn.example.fixture/img/small.txt",
        ]}))
        assert out["error_code"].tolist() == [ERR_MAX_SIZE_EXCEEDED, ""]
        assert CountingTransport.gets == 1  # the big body was never fetched

    def test_missing_key_not_found(self, fixtures):
        stage = GuardedLoaderStage(LocalFileTransport(fixtures))
        out = stage(pd.DataFrame({"key": ["cdn.example.fixture/img/none.txt"]}))
        assert out["error_code"].tolist() == [ERR_NOT_FOUND]

    def test_retry_recovers_from_transient_failures(self, fixtures):
        flaky = FlakyTransport(LocalFileTransport(fixtures), fail_times=2)
        stage = GuardedLoaderStage(flaky, max_retries=2)
        out = stage(pd.DataFrame({"key": ["cdn.example.fixture/img/small.txt"]}))
        assert out["error_code"].tolist() == [""]
        assert out["payload"].iloc[0] == "hello world"
        assert flaky.attempts["cdn.example.fixture/img/small.txt"] == 3

    def test_retries_exhausted_dead_letters(self, fixtures):
        flaky = FlakyTransport(LocalFileTransport(fixtures), fail_times=5)
        stage = GuardedLoaderStage(flaky, max_retries=2)
        out = stage(pd.DataFrame({"key": ["cdn.example.fixture/img/small.txt"]}))
        assert out["error_code"].tolist() == [ERR_FETCH_FAILED]


class TestRayRouting:
    def test_ok_and_dead_letter_split(self, fixtures, ray_session):
        import ray.data as rd

        ds = rd.from_pandas(pd.DataFrame({"key": [
            "cdn.example.fixture/img/small.txt",
            "evil.example.fixture/img/evil.txt",
            "cdn.example.fixture/img/big.txt",
            "cdn.example.fixture/img/none.txt",
        ]}))
        ok, dead = guarded_load(
            ds, LocalFileTransport(fixtures),
            allowed_sources=("cdn.*",), max_allowed_size=1024,
        )
        okd = ok.to_pandas()
        deadd = dead.to_pandas().sort_values("key").reset_index(drop=True)
        assert okd["key"].tolist() == ["cdn.example.fixture/img/small.txt"]
        assert sorted(deadd["error_code"]) == sorted([
            ERR_SOURCE_NOT_ALLOWED, ERR_MAX_SIZE_EXCEEDED, ERR_NOT_FOUND])


class TestTransportChain:
    """first-hit-wins storage→loader chain (imagor.go:699-760)."""

    def test_first_hit_wins_and_fallthrough(self, tmp_path):
        from imagor_ray.sources.loader import LocalFileTransport, TransportChain

        a, b = tmp_path / "tier_a", tmp_path / "tier_b"
        (a / "h").mkdir(parents=True); (b / "h").mkdir(parents=True)
        (a / "h" / "both.txt").write_text("from-a")
        (b / "h" / "both.txt").write_text("from-b")
        (b / "h" / "only-b.txt").write_text("b-only")
        chain = TransportChain([LocalFileTransport(str(a)), LocalFileTransport(str(b))])
        assert chain.get("h/both.txt") == b"from-a"     # first tier wins
        assert chain.get("h/only-b.txt") == b"b-only"   # falls through
        with pytest.raises(FileNotFoundError):
            chain.get("h/nowhere.txt")

    def test_routed_transport(self, tmp_path):
        from imagor_ray.sources.loader import LocalFileTransport, RoutedTransport

        a, b = tmp_path / "r_a", tmp_path / "r_b"
        (a / "cdn1.fixture").mkdir(parents=True)
        (b / "media.fixture").mkdir(parents=True)
        (a / "cdn1.fixture" / "x.txt").write_text("cdn")
        (b / "media.fixture" / "y.txt").write_text("media")
        routed = RoutedTransport([
            ("cdn*.fixture", LocalFileTransport(str(a))),
            ("regex:media\\.fixture", LocalFileTransport(str(b))),
        ])
        assert routed.get("cdn1.fixture/x.txt") == b"cdn"
        assert routed.get("media.fixture/y.txt") == b"media"
        with pytest.raises(FileNotFoundError):
            routed.get("other.fixture/z.txt")

    def test_chain_behind_guarded_stage(self, tmp_path):
        # the chain IS a Transport — drops into the guarded loader
        import pandas as pd
        from imagor_ray.protocols import Transport
        from imagor_ray.sources.loader import (
            GuardedLoaderStage, LocalFileTransport, TransportChain,
        )

        t = tmp_path / "tc"; (t / "h").mkdir(parents=True)
        (t / "h" / "f.txt").write_text("payload")
        chain = TransportChain([LocalFileTransport(str(t))])
        assert isinstance(chain, Transport)
        out = GuardedLoaderStage(chain)(pd.DataFrame({"key": ["h/f.txt"]}))
        assert out["payload"].tolist() == ["payload"]


class TestSingleExecution:
    """guarded_load materializes the loaded dataset once: consuming BOTH
    the ok and dead-letter branches must not re-run the loader stage
    (previously every external fetch — and every retry — executed twice,
    doubling transport traffic)."""

    def test_each_key_fetched_exactly_once(self, fixtures, ray_session, tmp_path):
        import uuid

        import ray.data as rd

        marker_dir = str(tmp_path / "fetches")
        os.makedirs(marker_dir)

        class RecordingTransport(LocalFileTransport):
            # fetch evidence must cross the Ray worker boundary: one
            # marker file per get(), counted on the driver
            def __init__(self, root, marker):
                super().__init__(root)
                self.marker = marker

            def get(self, key):
                with open(os.path.join(self.marker, uuid.uuid4().hex), "w") as f:
                    f.write(key)
                return super().get(key)

        ds = rd.from_pandas(pd.DataFrame({"key": [
            "cdn.example.fixture/img/small.txt",
            "evil.example.fixture/img/evil.txt",
        ]}))
        ok, dead = guarded_load(
            ds, RecordingTransport(fixtures, marker_dir),
            allowed_sources=("cdn.*",),
        )
        assert ok.count() == 1
        assert dead.count() == 1
        fetched = sorted(
            open(os.path.join(marker_dir, f)).read()
            for f in os.listdir(marker_dir)
        )
        # the blocked key never hit the transport; the allowed key was
        # fetched exactly once despite both branches being consumed
        assert fetched == ["cdn.example.fixture/img/small.txt"]


@pytest.fixture(scope="module")
def http_fixture():
    """Local http.server standing in for the external source: static
    files plus redirect / gzip / flaky-503 / sized endpoints."""
    import gzip
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    small = b"hello world"
    big = b"x" * 4096
    state = {"fail_left": 2}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _serve(self, body, ctype="text/plain", gzipped=False, head=False):
            self.send_response(200)
            payload = gzip.compress(body) if gzipped else body
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            if gzipped:
                self.send_header("Content-Encoding", "gzip")
            self.end_headers()
            if not head:
                self.wfile.write(payload)

        def _route(self, head):
            p = self.path
            if p == "/img/small.txt":
                self._serve(small, head=head)
            elif p == "/img/big.txt":
                self._serve(big, head=head)
            elif p == "/img/zipped.txt":
                self._serve(small, gzipped=True, head=head)
            elif p == "/redir/once":
                self.send_response(302)
                self.send_header("Location", "/img/small.txt")
                self.end_headers()
            elif p == "/redir/away":
                self.send_response(302)
                self.send_header(
                    "Location", "http://evil.invalid:1/steal")
                self.end_headers()
            elif p == "/redir/loop":
                self.send_response(302)
                self.send_header("Location", "/redir/loop")
                self.end_headers()
            elif p == "/flaky":
                if state["fail_left"] > 0:
                    state["fail_left"] -= 1
                    self.send_response(503)
                    self.end_headers()
                else:
                    self._serve(small, head=head)
            else:
                self.send_response(404)
                self.end_headers()

        def do_GET(self):
            self._route(head=False)

        def do_HEAD(self):
            self._route(head=True)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"127.0.0.1:{srv.server_address[1]}", state
    finally:
        srv.shutdown()


class TestHTTPTransport:
    """Real HTTP transport below the guard stack
    (httploader.go:182-260, 262-327; redirect guard 62-118)."""

    def test_get_and_stat(self, http_fixture):
        from imagor_ray.sources.loader import HTTPTransport

        host, _ = http_fixture
        t = HTTPTransport()
        assert t.get(f"{host}/img/small.txt") == b"hello world"
        assert t.stat(f"{host}/img/small.txt") == 11
        assert t.stat(f"{host}/img/big.txt") == 4096

    def test_gzip_decoded(self, http_fixture):
        from imagor_ray.sources.loader import HTTPTransport

        host, _ = http_fixture
        assert HTTPTransport().get(f"{host}/img/zipped.txt") == b"hello world"

    def test_not_found_maps(self, http_fixture):
        from imagor_ray.sources.loader import HTTPTransport

        host, _ = http_fixture
        with pytest.raises(FileNotFoundError):
            HTTPTransport().get(f"{host}/img/none.txt")
        with pytest.raises(FileNotFoundError):
            HTTPTransport().stat(f"{host}/img/none.txt")

    def test_5xx_is_transient_and_retry_recovers(self, http_fixture):
        from imagor_ray.sources.loader import (
            HTTPTransport, TransientFetchError,
        )

        host, state = http_fixture
        state["fail_left"] = 2
        t = HTTPTransport()
        with pytest.raises(TransientFetchError):
            t.get(f"{host}/flaky")
        with pytest.raises(TransientFetchError):
            t.get(f"{host}/flaky")
        assert t.get(f"{host}/flaky") == b"hello world"

    def test_redirect_followed(self, http_fixture):
        from imagor_ray.sources.loader import HTTPTransport

        host, _ = http_fixture
        assert HTTPTransport().get(f"{host}/redir/once") == b"hello world"

    def test_redirect_to_disallowed_host_rejected(self, http_fixture):
        from imagor_ray.sources.loader import HTTPTransport

        host, _ = http_fixture
        t = HTTPTransport(validate_host=lambda h: h.startswith("127.0.0.1"))
        with pytest.raises(FileNotFoundError):
            t.get(f"{host}/redir/away")
        # same-host redirects still fine under the validator
        assert t.get(f"{host}/redir/once") == b"hello world"

    def test_redirect_loop_bounded(self, http_fixture):
        from imagor_ray.sources.loader import (
            HTTPTransport, TransientFetchError,
        )

        host, _ = http_fixture
        with pytest.raises(TransientFetchError):
            HTTPTransport(max_redirects=3).get(f"{host}/redir/loop")

    def test_guard_stack_over_http(self, http_fixture):
        """The full GuardedLoaderStage semantics hold with HTTP swapped
        into the Transport slot (verdict done-condition)."""
        from imagor_ray.sources.loader import GuardedLoaderStage, HTTPTransport

        host, state = http_fixture
        state["fail_left"] = 2
        stage = GuardedLoaderStage(
            HTTPTransport(),
            allowed_sources=("127.0.0.1*",),
            max_allowed_size=1024,
            max_retries=2,
        )
        out = stage(pd.DataFrame({"key": [
            f"{host}/img/small.txt",     # ok
            f"{host}/img/big.txt",       # size pre-check via HEAD
            f"{host}/img/none.txt",      # 404
            f"{host}/flaky",             # 2×503 then ok (retries)
            f"evil.invalid/steal",       # allow-list
        ]}))
        assert out["error_code"].tolist() == [
            "", ERR_MAX_SIZE_EXCEEDED, ERR_NOT_FOUND, "",
            ERR_SOURCE_NOT_ALLOWED,
        ]
        assert out["payload"].iloc[0] == "hello world"
        assert out["payload"].iloc[3] == "hello world"
