"""Guarded external-source loader — the engine analogue of the
reference's HTTPLoader (``loader/httploader/httploader.go:182-260``):
allow-listed sources, HEAD size pre-check, retryable fetch, content-type
validation, and typed dead-letter routing for rejected inputs.

The sandbox has no network, so the fetch side is a pluggable
``Transport`` (the reference's ``http.RoundTripper`` slot,
``option.go WithTransport``): :class:`LocalFileTransport` serves
fixture files keyed ``host/path``; an HTTP transport would drop in
unchanged — every guard (allow-list, size, accepts, retries) lives
above the transport exactly like the reference's loader sits above its
RoundTripper.

Ray shape: a ``map_batches`` stage (stateless or actor pool) adding
``payload``/``size``/``content_type``/``error_code`` columns;
:func:`guarded_load` splits ok vs dead-letter like ``stages/errors``.
"""

from __future__ import annotations

import fnmatch
import os
import re
from typing import Callable

import pandas as pd

from ..functions.blob import sniff_content_type

__all__ = [
    "AllowedSource",
    "LocalFileTransport",
    "HTTPTransport",
    "FlakyTransport",
    "TransportChain",
    "RoutedTransport",
    "TransientFetchError",
    "GuardedLoaderStage",
    "guarded_load",
    "ERR_SOURCE_NOT_ALLOWED",
    "ERR_MAX_SIZE_EXCEEDED",
    "ERR_NOT_FOUND",
    "ERR_FETCH_FAILED",
    "ERR_UNSUPPORTED_TYPE",
]

# sentinel codes continuing the errors.go mapping (stages/errors.py)
ERR_SOURCE_NOT_ALLOWED = "ERR_SOURCE_NOT_ALLOWED"   # imagor.ErrSourceNotAllowed
ERR_MAX_SIZE_EXCEEDED = "ERR_MAX_SIZE_EXCEEDED"     # imagor.ErrMaxSizeExceeded
ERR_NOT_FOUND = "ERR_NOT_FOUND"
ERR_FETCH_FAILED = "ERR_FETCH_FAILED"
ERR_UNSUPPORTED_TYPE = "ERR_UNSUPPORTED_TYPE"       # imagor.ErrUnsupportedFormat


class AllowedSource:
    """Host allow-list entry: glob pattern (``*.example.fixture``) or
    ``regex:`` prefixed regex — ``NewHostPatternAllowedSource`` /
    ``NewRegexpAllowedSource`` (httploader.go:23-52)."""

    def __init__(self, pattern: str):
        self.pattern = pattern
        self._re = re.compile(pattern[6:]) if pattern.startswith("regex:") else None

    def match(self, host: str) -> bool:
        if self._re is not None:
            return self._re.fullmatch(host) is not None
        return fnmatch.fnmatchcase(host, self.pattern)


class TransientFetchError(Exception):
    """Retryable transport failure (network blip / 5xx analogue)."""


class LocalFileTransport:
    """Fixture transport: key ``host/path`` → file under ``root``."""

    def __init__(self, root: str):
        self.root = root

    def stat(self, key: str) -> int:
        """HEAD analogue: size without reading the body."""
        path = os.path.join(self.root, key)
        if not os.path.isfile(path):
            raise FileNotFoundError(key)
        return os.path.getsize(path)

    def get(self, key: str) -> bytes:
        path = os.path.join(self.root, key)
        if not os.path.isfile(path):
            raise FileNotFoundError(key)
        with open(path, "rb") as f:
            return f.read()


class HTTPTransport:
    """Real HTTP fetch behind the ``Transport`` protocol — the engine's
    ``httploader.go:182-260`` analogue, drop-in below the existing guard
    stack (allow-list, size pre-check, retries, sniff, dead-letter all
    live in :class:`GuardedLoaderStage` above it):

    - keys are ``host[:port]/path`` like every other transport; the
      scheme is configuration, not data;
    - ``stat`` issues HEAD and returns Content-Length (the size
      pre-check, httploader.go:192-208) or None when the server omits
      it;
    - gzip accept/decode (httploader.go:262-327);
    - bounded redirects with per-hop host re-validation
      (``validate_host``) — the SSRF re-check of httploader.go:62-118:
      a redirect may not escape to a host the caller's allow-list would
      reject;
    - status mapping into the transport error model: 404/410 →
      FileNotFoundError (dead-letters as ERR_NOT_FOUND), 429/5xx and
      connection errors → TransientFetchError (retried, then
      ERR_FETCH_FAILED).

    Unit-tested against a local ``http.server`` fixture; in the sandbox
    no external network exists, which is exactly what the fixture
    stands in for.
    """

    def __init__(
        self,
        scheme: str = "http",
        timeout: float = 10.0,
        max_redirects: int = 5,
        user_agent: str = "imagor-ray/1.0",
        accept_gzip: bool = True,
        validate_host: "Callable[[str], bool] | None" = None,
    ):
        self.scheme = scheme
        self.timeout = timeout
        self.max_redirects = max_redirects
        self.user_agent = user_agent
        self.accept_gzip = accept_gzip
        self.validate_host = validate_host
        self._opener = None  # built lazily per process (not picklable)

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_opener"] = None
        return state

    def _build_opener(self):
        import urllib.request

        transport = self

        class GuardedRedirect(urllib.request.HTTPRedirectHandler):
            max_redirections = transport.max_redirects

            def redirect_request(self, req, fp, code, msg, headers, newurl):
                from urllib.parse import urlsplit

                host = urlsplit(newurl).netloc
                if (transport.validate_host is not None
                        and not transport.validate_host(host)):
                    raise FileNotFoundError(
                        f"redirect to disallowed host {host}"
                    )
                return super().redirect_request(
                    req, fp, code, msg, headers, newurl
                )

        return urllib.request.build_opener(GuardedRedirect())

    def _open(self, key: str, method: str, extra_headers: dict | None = None,
              allow_not_modified: bool = False):
        import urllib.error
        import urllib.request

        if self._opener is None:
            self._opener = self._build_opener()
        url = f"{self.scheme}://{key}"
        headers = {"User-Agent": self.user_agent}
        if self.accept_gzip and method == "GET":
            headers["Accept-Encoding"] = "gzip"
        if extra_headers:
            headers.update(extra_headers)
        req = urllib.request.Request(url, headers=headers, method=method)
        try:
            return self._opener.open(req, timeout=self.timeout)
        except FileNotFoundError:
            raise  # redirect-to-disallowed-host from the handler
        except urllib.error.HTTPError as e:
            if allow_not_modified and e.code == 304:
                return None                       # conditional-GET hit
            if e.code in (404, 410):
                raise FileNotFoundError(key) from e
            raise TransientFetchError(f"HTTP {e.code} for {key}") from e
        except urllib.error.URLError as e:
            raise TransientFetchError(f"{e.reason} for {key}") from e
        except OSError as e:  # socket timeouts, resets
            raise TransientFetchError(f"{e} for {key}") from e

    def stat(self, key: str) -> "int | None":
        resp = self._open(key, "HEAD")
        try:
            length = resp.headers.get("Content-Length")
        finally:
            resp.close()
        return int(length) if length is not None else None

    @staticmethod
    def _read_body(resp) -> bytes:
        body = resp.read()
        if (resp.headers.get("Content-Encoding") or "").lower() == "gzip":
            import gzip

            body = gzip.decompress(body)
        return body

    @staticmethod
    def _cache_control(headers) -> tuple["float | None", "float | None"]:
        """(max_age, stale_while_revalidate) from Cache-Control —
        imagor.go:886-1006's TTL/SWR response semantics."""
        max_age = swr = None
        for part in (headers.get("Cache-Control") or "").split(","):
            part = part.strip()
            if part.startswith("max-age="):
                try:
                    max_age = float(part[8:])
                except ValueError:
                    pass
            elif part.startswith("stale-while-revalidate="):
                try:
                    swr = float(part[23:])
                except ValueError:
                    pass
        return max_age, swr

    def get(self, key: str) -> bytes:
        resp = self._open(key, "GET")
        try:
            return self._read_body(resp)
        finally:
            resp.close()

    def get_with_meta(self, key: str) -> tuple[bytes, dict]:
        """GET returning (body, {etag?, max_age?, swr?}) — feeds the
        :class:`CachingTransport` tier's per-entry response policy."""
        resp = self._open(key, "GET")
        try:
            body = self._read_body(resp)
            meta: dict = {}
            etag = resp.headers.get("ETag")
            if etag:
                meta["etag"] = etag
            max_age, swr = self._cache_control(resp.headers)
            if max_age is not None:
                meta["max_age"] = max_age
            if swr is not None:
                meta["swr"] = swr
        finally:
            resp.close()
        return body, meta

    def get_conditional(self, key: str, etag: str):
        """Conditional GET with If-None-Match. Returns
        ``(body | None, etag, max_age, swr)`` — a None body means
        304 Not Modified (the cache entry is still valid)."""
        resp = self._open(key, "GET", extra_headers={"If-None-Match": etag},
                          allow_not_modified=True)
        if resp is None:
            return None, etag, None, None
        try:
            body = self._read_body(resp)
            new_etag = resp.headers.get("ETag") or etag
            max_age, swr = self._cache_control(resp.headers)
        finally:
            resp.close()
        return body, new_etag, max_age, swr


class CachingTransport:
    """HTTP response-layer semantics as a transport tier — the engine's
    mapping of the reference's ETag / If-None-Match 304 and
    Cache-Control TTL / stale-while-revalidate handling
    (``imagor.go:886-1006``) onto the loader chain:

    - **ETag**: prefers the inner transport's server ETag (via
      ``get_with_meta``); transports without one get a strong
      content-digest ETag (sha1 of the body — the reference derives
      its ETag from the blob digest the same way);
    - **TTL (max-age)**: a cached body younger than its TTL serves
      without touching the inner transport at all; a response-supplied
      ``Cache-Control: max-age`` overrides the configured default
      per entry;
    - **SWR (stale-while-revalidate)**: a body older than TTL but
      inside the SWR window serves IMMEDIATELY from cache and enqueues
      a revalidation; the batch engine's deterministic analogue of
      async SWR is a deferred queue the owner drains OFF the row
      latency path (``flush_revalidations()`` — the loader stage calls
      it at batch end);
    - **revalidation**: a conditional fetch with ``If-None-Match``;
      304 Not Modified refreshes the entry's clock WITHOUT moving the
      body (``conditional_304s`` counts these); a changed ETag swaps
      the body in.

    Byte-bounded LRU (the ristretto-result-cache shape); per-actor
    state like every stateful tier (build it in ``__init__``).
    """

    def __init__(self, inner, ttl_s: float = 60.0, swr_s: float = 0.0,
                 max_bytes: int = 64 << 20, clock=None):
        import collections
        import time as _time

        self.inner = inner
        self.ttl_s = float(ttl_s)
        self.swr_s = float(swr_s)
        self.max_bytes = max_bytes
        self._clock = clock or _time.monotonic
        #: key -> [body, etag, fetched_at, ttl_s, swr_s]
        self._cache: "collections.OrderedDict[str, list]" = (
            collections.OrderedDict())
        self._bytes = 0
        self._pending: list[str] = []
        # observability counters (metrics tier + tests)
        self.fresh_hits = 0
        self.stale_served = 0
        self.conditional_304s = 0
        self.refetches = 0

    # -- inner-transport adapters -------------------------------------

    @staticmethod
    def _content_etag(body: bytes) -> str:
        import hashlib

        return '"' + hashlib.sha1(body).hexdigest() + '"'

    def _fetch(self, key: str) -> tuple[bytes, str, float, float]:
        """(body, etag, ttl, swr) from the inner transport."""
        if hasattr(self.inner, "get_with_meta"):
            body, meta = self.inner.get_with_meta(key)
            etag = meta.get("etag") or self._content_etag(body)
            ttl = meta.get("max_age", self.ttl_s)
            swr = meta.get("swr", self.swr_s)
            return body, etag, float(ttl), float(swr)
        body = self.inner.get(key)
        return body, self._content_etag(body), self.ttl_s, self.swr_s

    def _revalidate(self, key: str) -> None:
        ent = self._cache.get(key)
        if ent is None:
            return
        if hasattr(self.inner, "get_conditional"):
            body, etag, ttl, swr = self.inner.get_conditional(key, ent[1])
            if body is None:                       # 304 Not Modified
                self.conditional_304s += 1
                ent[2] = self._clock()
                if ttl is not None:
                    ent[3] = float(ttl)
                if swr is not None:
                    ent[4] = float(swr)
                return
        else:
            body, etag, ttl, swr = self._fetch(key)
            if etag == ent[1]:                     # digest unchanged
                self.conditional_304s += 1
                ent[2] = self._clock()
                return
        self.refetches += 1
        self._bytes += len(body) - len(ent[0])
        self._cache[key] = [body, etag, self._clock(),
                            float(ttl if ttl is not None else self.ttl_s),
                            float(swr if swr is not None else self.swr_s)]
        self._evict()

    def _evict(self) -> None:
        while self._bytes > self.max_bytes and len(self._cache) > 1:
            _, ent = self._cache.popitem(last=False)
            self._bytes -= len(ent[0])

    # -- Transport protocol -------------------------------------------

    def stat(self, key: str) -> "int | None":
        ent = self._cache.get(key)
        if ent is not None and self._clock() - ent[2] <= ent[3]:
            return len(ent[0])
        return self.inner.stat(key)

    def get(self, key: str) -> bytes:
        now = self._clock()
        ent = self._cache.get(key)
        if ent is not None:
            age = now - ent[2]
            if age <= ent[3]:                      # fresh
                self.fresh_hits += 1
                self._cache.move_to_end(key)
                return ent[0]
            if age <= ent[3] + ent[4]:             # stale-while-revalidate
                self.stale_served += 1
                self._pending.append(key)
                self._cache.move_to_end(key)
                return ent[0]
            # expired beyond SWR: blocking revalidation (conditional)
            self._revalidate(key)
            return self._cache[key][0]
        body, etag, ttl, swr = self._fetch(key)
        self.refetches += 1
        self._cache[key] = [body, etag, now, ttl, swr]
        self._bytes += len(body)
        self._evict()
        return body

    def flush_revalidations(self) -> int:
        """Drain the SWR queue (batch-end hook): conditional fetches
        off the row path. Returns how many keys were revalidated."""
        keys, self._pending = list(dict.fromkeys(self._pending)), []
        for k in keys:
            self._revalidate(k)
        return len(keys)


class FlakyTransport:
    """Test double: fail each key's first ``fail_times`` fetches with a
    transient error — exercises the retry path deterministically."""

    def __init__(self, inner, fail_times: int = 1):
        self.inner = inner
        self.fail_times = fail_times
        self.attempts: dict[str, int] = {}

    def stat(self, key: str) -> int:
        return self.inner.stat(key)

    def get(self, key: str) -> bytes:
        n = self.attempts.get(key, 0)
        self.attempts[key] = n + 1
        if n < self.fail_times:
            raise TransientFetchError(f"transient failure {n + 1} for {key}")
        return self.inner.get(key)


class TransportChain:
    """Ordered first-hit-wins transport chain — the loader/storage chain
    of ``fromStoragesAndLoaders`` (``imagor.go:699-760``): each tier is
    tried in order; NotFound falls through to the next, any other error
    surfaces; all tiers missing → NotFound."""

    def __init__(self, transports: list):
        self.transports = list(transports)

    def stat(self, key: str) -> int:
        last: Exception | None = None
        for t in self.transports:
            try:
                return t.stat(key)
            except FileNotFoundError as e:
                last = e
        raise last if last is not None else FileNotFoundError(key)

    def get(self, key: str) -> bytes:
        last: Exception | None = None
        for t in self.transports:
            try:
                return t.get(key)
            except FileNotFoundError as e:
                last = e
        raise last if last is not None else FileNotFoundError(key)


class RoutedTransport:
    """Pattern-routed transport — the ``s3routerloader`` analogue
    (``loader/s3routerloader/router.go``): the key's host segment picks
    the backing transport by glob/regex pattern, first match wins; no
    match → NotFound."""

    def __init__(self, routes: list):
        """``routes``: list of (pattern, transport) pairs; pattern uses
        :class:`AllowedSource` syntax (glob or ``regex:``)."""
        self.routes = [(AllowedSource(p), t) for p, t in routes]

    def _pick(self, key: str):
        host = key.split("/", 1)[0]
        for src, transport in self.routes:
            if src.match(host):
                return transport
        raise FileNotFoundError(key)

    def stat(self, key: str) -> int:
        return self._pick(key).stat(key)

    def get(self, key: str) -> bytes:
        return self._pick(key).get(key)


class GuardedLoaderStage:
    """``map_batches`` callable: validate → stat pre-check → retryable
    fetch → sniff/accept check, per key (httploader.go:182-260).

    Input batches need a ``key`` column (``host/path``). Output adds:

    - ``payload``  — fetched text ('' on error),
    - ``size``     — byte size (-1 on error),
    - ``content_type`` — sniffed type ('' on error),
    - ``error_code``   — '' ok, else a sentinel for dead-letter routing.
    """

    def __init__(
        self,
        transport,
        allowed_sources: tuple[str, ...] = (),
        max_allowed_size: int = 0,
        accepts: tuple[str, ...] = (),
        max_retries: int = 2,
        key_col: str = "key",
    ):
        self.transport = transport
        self.allowed = [AllowedSource(p) for p in allowed_sources]
        self.max_allowed_size = max_allowed_size
        self.accepts = accepts
        self.max_retries = max_retries
        self.key_col = key_col

    # -- per-key pipeline --------------------------------------------------

    def _validate(self, key: str) -> str:
        """parseAndValidateURL analogue: shape + allow-list
        (httploader.go:136-178)."""
        key = (key or "").strip().lstrip("/")
        if not key or "/" not in key or ".." in key.split("/"):
            return ""
        return key

    def _accept_ok(self, content_type: str) -> bool:
        if not self.accepts:
            return True
        return any(fnmatch.fnmatchcase(content_type, a) for a in self.accepts)

    def _load_one(self, raw_key: str) -> tuple[str, int, str, str]:
        key = self._validate(raw_key)
        if not key:
            return "", -1, "", ERR_SOURCE_NOT_ALLOWED
        host = key.split("/", 1)[0]
        if self.allowed and not any(a.match(host) for a in self.allowed):
            return "", -1, "", ERR_SOURCE_NOT_ALLOWED
        # HEAD size pre-check before fetching the body
        # (httploader.go:192-208)
        if self.max_allowed_size > 0:
            try:
                size = self.transport.stat(key)
            except FileNotFoundError:
                return "", -1, "", ERR_NOT_FOUND
            except TransientFetchError:
                size = None  # stat failure is not fatal; body fetch decides
            if size is not None and size > self.max_allowed_size:
                return "", -1, "", ERR_MAX_SIZE_EXCEEDED
        # retryable fetch (the reference leans on client retries; Ray
        # tasks add their own layer above this)
        last_err = ERR_FETCH_FAILED
        for _ in range(self.max_retries + 1):
            try:
                body = self.transport.get(key)
                break
            except FileNotFoundError:
                return "", -1, "", ERR_NOT_FOUND
            except TransientFetchError:
                continue
        else:
            return "", -1, "", last_err
        text = body.decode("utf-8", errors="surrogateescape")
        ctype = sniff_content_type(text)
        if not self._accept_ok(ctype):
            return "", len(body), ctype, ERR_UNSUPPORTED_TYPE
        return text, len(body), ctype, ""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        results = [self._load_one(k) for k in batch[self.key_col].astype(str)]
        batch["payload"] = [r[0] for r in results]
        batch["size"] = pd.Series([r[1] for r in results], dtype="int64").to_numpy()
        batch["content_type"] = [r[2] for r in results]
        batch["error_code"] = [r[3] for r in results]
        # batch-end SWR drain: stale bodies were served off the row
        # path; their conditional revalidations run here, once per
        # batch (CachingTransport's deterministic async-SWR analogue)
        if hasattr(self.transport, "flush_revalidations"):
            self.transport.flush_revalidations()
        return batch


def guarded_load(ds, transport, **cfg):
    """(ok, dead_letter) datasets after guarded loading — the loader-tier
    mirror of ``stages/errors.route``."""
    loaded = ds.map_batches(
        GuardedLoaderStage(transport, **cfg), batch_format="pandas"
    ).materialize()
    # materialize() pins the loaded blocks so the ok/dead branches below
    # are filters over the SAME single execution — without it each
    # consumer re-runs the loader stage, doubling every external fetch
    # (and every retry) against the remote source
    ok = loaded.map_batches(lambda b: b[b["error_code"] == ""], batch_format="pandas")
    dead = loaded.map_batches(lambda b: b[b["error_code"] != ""], batch_format="pandas")
    return ok, dead
