"""HTTP response-layer semantics as a loader tier — CachingTransport.

Engine analogue of the reference's ETag / If-None-Match 304 and
Cache-Control TTL / stale-while-revalidate handling (imagor.go:886-1006):
fresh entries serve without touching the origin; stale-inside-SWR
entries serve immediately and revalidate at batch end; revalidation is
a conditional GET whose 304 refreshes the clock without moving bytes.
"""

import gzip
import threading

import pandas as pd
import pytest

from imagor_ray.sources.loader import (
    CachingTransport,
    GuardedLoaderStage,
    HTTPTransport,
    LocalFileTransport,
)


class FakeClock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t

    def tick(self, dt):
        self.t += dt


class CountingTransport:
    """Plain transport (no get_with_meta / get_conditional): the
    content-digest-ETag fallback path."""

    def __init__(self, bodies):
        self.bodies = dict(bodies)
        self.gets = 0

    def stat(self, key):
        self.stats_called = True
        return len(self.bodies[key])

    def get(self, key):
        self.gets += 1
        return self.bodies[key]


class MetaTransport(CountingTransport):
    """Transport speaking the full conditional protocol, with
    scriptable per-key ETag and Cache-Control response policy."""

    def __init__(self, bodies, meta=None):
        super().__init__(bodies)
        self.meta = meta or {}
        self.conditional_calls = []

    def get_with_meta(self, key):
        self.gets += 1
        return self.bodies[key], dict(self.meta.get(key, {}))

    def get_conditional(self, key, etag):
        self.conditional_calls.append((key, etag))
        m = self.meta.get(key, {})
        current = m.get("etag", '"none"')
        if etag == current:  # 304 Not Modified
            return None, etag, m.get("max_age"), m.get("swr")
        self.gets += 1
        return self.bodies[key], current, m.get("max_age"), m.get("swr")


class TestTTL:
    def test_fresh_hit_skips_origin(self):
        clk = FakeClock()
        inner = CountingTransport({"k": b"v1"})
        t = CachingTransport(inner, ttl_s=10.0, clock=clk)
        assert t.get("k") == b"v1"
        clk.tick(5.0)
        assert t.get("k") == b"v1"
        assert inner.gets == 1
        assert t.fresh_hits == 1

    def test_fresh_stat_from_cache(self):
        clk = FakeClock()
        inner = CountingTransport({"k": b"abcd"})
        t = CachingTransport(inner, ttl_s=10.0, clock=clk)
        t.get("k")
        assert t.stat("k") == 4
        assert not hasattr(inner, "stats_called")

    def test_response_max_age_overrides_default(self):
        # a per-entry Cache-Control: max-age beats the configured TTL
        clk = FakeClock()
        inner = MetaTransport(
            {"k": b"v1"}, {"k": {"etag": '"e1"', "max_age": 2.0}})
        t = CachingTransport(inner, ttl_s=100.0, clock=clk)
        t.get("k")
        clk.tick(3.0)  # stale under the entry's 2s TTL despite 100s default
        t.get("k")
        assert inner.conditional_calls == [("k", '"e1"')]
        assert t.conditional_304s == 1


class TestConditionalRevalidation:
    def test_304_refreshes_clock_without_moving_bytes(self):
        clk = FakeClock()
        inner = MetaTransport({"k": b"v1"}, {"k": {"etag": '"e1"'}})
        t = CachingTransport(inner, ttl_s=10.0, clock=clk)
        t.get("k")
        clk.tick(11.0)  # expired, no SWR window -> blocking revalidation
        assert t.get("k") == b"v1"
        assert inner.gets == 1  # body never re-shipped
        assert t.conditional_304s == 1
        clk.tick(5.0)  # clock was refreshed by the 304
        t.get("k")
        assert t.fresh_hits == 1

    def test_changed_etag_swaps_body(self):
        clk = FakeClock()
        inner = MetaTransport({"k": b"v1"}, {"k": {"etag": '"e1"'}})
        t = CachingTransport(inner, ttl_s=10.0, clock=clk)
        t.get("k")
        inner.bodies["k"] = b"v2-longer"
        inner.meta["k"]["etag"] = '"e2"'
        clk.tick(11.0)
        assert t.get("k") == b"v2-longer"
        assert t.refetches == 2
        assert t._bytes == len(b"v2-longer")

    def test_digest_etag_fallback_for_plain_transports(self):
        # inner has no conditional protocol: revalidation refetches and
        # compares content digests; an unchanged body counts as 304
        clk = FakeClock()
        inner = CountingTransport({"k": b"v1"})
        t = CachingTransport(inner, ttl_s=10.0, clock=clk)
        t.get("k")
        clk.tick(11.0)
        assert t.get("k") == b"v1"
        assert t.conditional_304s == 1
        inner.bodies["k"] = b"v2"
        clk.tick(11.0)
        assert t.get("k") == b"v2"
        assert t.refetches == 2


class TestSWR:
    def test_stale_serves_immediately_and_defers(self):
        clk = FakeClock()
        inner = MetaTransport({"k": b"v1"}, {"k": {"etag": '"e1"'}})
        t = CachingTransport(inner, ttl_s=10.0, swr_s=30.0, clock=clk)
        t.get("k")
        inner.bodies["k"] = b"v2"
        inner.meta["k"]["etag"] = '"e2"'
        clk.tick(15.0)  # inside TTL+SWR
        assert t.get("k") == b"v1"  # stale body served, no origin hit
        assert t.stale_served == 1
        assert inner.conditional_calls == []
        assert t.flush_revalidations() == 1  # batch-end drain
        assert t.get("k") == b"v2"  # revalidation swapped the body in

    def test_flush_dedups_keys(self):
        clk = FakeClock()
        inner = MetaTransport({"k": b"v1"}, {"k": {"etag": '"e1"'}})
        t = CachingTransport(inner, ttl_s=10.0, swr_s=30.0, clock=clk)
        t.get("k")
        clk.tick(15.0)
        t.get("k")
        t.get("k")
        assert t.flush_revalidations() == 1
        assert inner.conditional_calls == [("k", '"e1"')]

    def test_beyond_swr_blocks(self):
        clk = FakeClock()
        inner = MetaTransport({"k": b"v1"}, {"k": {"etag": '"e1"'}})
        t = CachingTransport(inner, ttl_s=10.0, swr_s=5.0, clock=clk)
        t.get("k")
        clk.tick(16.0)  # past TTL+SWR
        t.get("k")
        assert t.stale_served == 0
        assert t.conditional_304s == 1  # blocking conditional ran inline


class TestEviction:
    def test_byte_bounded_lru(self):
        clk = FakeClock()
        inner = CountingTransport(
            {f"k{i}": bytes([i]) * 40 for i in range(5)})
        t = CachingTransport(inner, ttl_s=100.0, max_bytes=100, clock=clk)
        for i in range(5):
            t.get(f"k{i}")
        assert t._bytes <= 100
        assert len(t._cache) == 2  # 40-byte bodies, 100-byte budget
        # oldest evicted: k0 refetches, newest serves from cache
        t.get("k4")
        assert t.fresh_hits == 1
        gets = inner.gets
        t.get("k0")
        assert inner.gets == gets + 1


@pytest.fixture(scope="module")
def etag_server():
    """Local origin speaking ETag / If-None-Match / Cache-Control."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    state = {"body": b"hello v1", "etag": '"v1"', "gets": 0, "304s": 0}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            inm = self.headers.get("If-None-Match")
            if inm == state["etag"]:
                state["304s"] += 1
                self.send_response(304)
                self.end_headers()
                return
            state["gets"] += 1
            gz = "gzip" in (self.headers.get("Accept-Encoding") or "")
            payload = gzip.compress(state["body"]) if gz else state["body"]
            self.send_response(200)
            self.send_header("ETag", state["etag"])
            self.send_header(
                "Cache-Control", "max-age=10, stale-while-revalidate=30")
            self.send_header("Content-Length", str(len(payload)))
            if gz:
                self.send_header("Content-Encoding", "gzip")
            self.end_headers()
            self.wfile.write(payload)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        yield f"127.0.0.1:{srv.server_address[1]}", state
    finally:
        srv.shutdown()


class TestOverHTTP:
    """End-to-end over a real local origin: HTTPTransport's
    get_with_meta / get_conditional feed the cache tier's policy."""

    def test_etag_304_and_response_policy(self, etag_server):
        host, state = etag_server
        clk = FakeClock()
        t = CachingTransport(HTTPTransport(), ttl_s=999.0, clock=clk)
        assert t.get(f"{host}/doc") == b"hello v1"
        # response max-age=10 overrode the configured 999s TTL
        clk.tick(11.0)
        assert t.get(f"{host}/doc") == b"hello v1"  # inside SWR: stale serve
        assert t.stale_served == 1
        t.flush_revalidations()
        assert state["304s"] == 1
        assert state["gets"] == 1  # the body crossed the wire exactly once
        # origin content changes -> conditional GET ships the new body
        state["body"], state["etag"] = b"hello v2", '"v2"'
        clk.tick(11.0)
        t.get(f"{host}/doc")
        t.flush_revalidations()
        assert t.get(f"{host}/doc") == b"hello v2"
        assert state["gets"] == 2

    def test_guarded_stage_drains_swr_at_batch_end(self, etag_server):
        host, state = etag_server
        state["body"], state["etag"] = b"hello v1", '"v1"'
        clk = FakeClock()
        cache = CachingTransport(HTTPTransport(), ttl_s=999.0, clock=clk)
        stage = GuardedLoaderStage(cache, allowed_sources=("127.0.0.1*",))
        stage(pd.DataFrame({"key": [f"{host}/doc"]}))
        before = state["304s"]
        clk.tick(11.0)
        out = stage(pd.DataFrame({"key": [f"{host}/doc"]}))
        assert out["error_code"].iloc[0] == ""
        # the stale row was served from cache; the batch-end hook ran
        # the conditional revalidation before the batch returned
        assert cache.stale_served == 1
        assert state["304s"] == before + 1


class TestChainComposition:
    def test_cache_tier_over_file_transport(self, tmp_path):
        # the tier composes with any Transport, not just HTTP
        (tmp_path / "a.txt").write_bytes(b"file body")
        clk = FakeClock()
        t = CachingTransport(
            LocalFileTransport(str(tmp_path)), ttl_s=10.0, clock=clk)
        assert t.get("a.txt") == b"file body"
        (tmp_path / "a.txt").write_bytes(b"changed")
        assert t.get("a.txt") == b"file body"  # fresh: served from cache
        clk.tick(11.0)
        assert t.get("a.txt") == b"changed"  # digest mismatch -> refetch
