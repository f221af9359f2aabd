"""Storage backends for the exactly-once sink — the concrete form of the
"S3/GCS is a URI swap" claim (``storage/s3storage/s3storage.go:137-250``,
``storage/gcloudstorage/gcloudstorage.go``): every filesystem operation
the sink's commit protocol needs goes through ONE small interface, with
two implementations:

- :class:`LocalStorage` — thin wrappers over ``os`` with real fsync and
  POSIX-atomic ``os.replace``; byte- and semantics-identical to the
  sink's original inline code (the default; zero overhead added to the
  hot path).
- :class:`FsspecStorage` — any ``fsspec`` filesystem addressed by URI
  (``memory://`` in tests; ``s3://``/``gcs://`` on a real cluster).

Atomic-rename semantics per backend (documented, load-bearing):

- local: ``os.replace`` is atomic; fsync is real.
- object stores / memory: rename is OVERWRITE-MOVE (one mv; object
  stores overwrite dst per PUT/copy — no missing-dst window), falling
  back to delete-then-move only for backends whose mv refuses
  overwrite. Neither is atomic; the sink's commit protocol tolerates
  both by ordering: the data file is swapped before the manifest, and
  the manifest file IS the commit point, so a failure mid-rename
  leaves at worst a missing/previous file with no NEW manifest —
  exactly the state replay repairs (an uncommitted bucket is
  rewritten). A manifest can never exist without its data file having
  been fully written first; racing replays of the same bucket are
  pinned boundary-by-boundary in tests/test_storage_race.py.
  fsync is a no-op (object stores are durable on close).

``memory://`` is per-process: suitable for driving the sink's commit
protocol driver-side (what the replay tests do) and as the stand-in
proving the URI swap; distributed ``sink.write`` over Ray tasks needs a
cluster-visible backend (local shared dir, s3, gcs).
"""

from __future__ import annotations

import os
import posixpath

__all__ = ["LocalStorage", "FsspecStorage", "storage_for"]


class LocalStorage:
    """POSIX-backed storage: atomic rename + real fsync."""

    is_local = True

    def join(self, *parts: str) -> str:
        return os.path.join(*parts)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def open(self, path: str, mode: str):
        return open(path, mode)

    def remove(self, path: str) -> None:
        os.remove(path)

    def replace(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def getsize(self, path: str) -> int:
        return os.path.getsize(path)

    def fsync_file(self, fileobj) -> None:
        if fileobj.writable():
            fileobj.flush()
        os.fsync(fileobj.fileno())

    def fsync_dir(self, path: str) -> None:
        fd = os.open(path, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)


class FsspecStorage:
    """fsspec-backed storage (memory://, s3://, gcs://, …).

    Rename is overwrite-move with a delete-then-move fallback (see
    module docstring for why the sink's commit ordering makes both
    safe); fsync is a no-op.
    """

    is_local = False

    def __init__(self, fs, protocol: str):
        self.fs = fs
        self.protocol = protocol

    def _strip(self, path: str) -> str:
        prefix = f"{self.protocol}://"
        return path[len(prefix):] if path.startswith(prefix) else path

    def join(self, *parts: str) -> str:
        head, tail = parts[0], parts[1:]
        return posixpath.join(head, *tail)

    def makedirs(self, path: str) -> None:
        self.fs.makedirs(self._strip(path), exist_ok=True)

    def exists(self, path: str) -> bool:
        return self.fs.exists(self._strip(path))

    def isdir(self, path: str) -> bool:
        return self.fs.isdir(self._strip(path))

    def listdir(self, path: str) -> list[str]:
        return [posixpath.basename(p.rstrip("/"))
                for p in self.fs.ls(self._strip(path), detail=False)]

    def open(self, path: str, mode: str):
        return self.fs.open(self._strip(path), mode)

    def remove(self, path: str) -> None:
        p = self._strip(path)
        if not self.fs.exists(p):
            raise FileNotFoundError(path)
        self.fs.rm(p)

    def replace(self, src: str, dst: str) -> None:
        """Overwrite-move: object stores overwrite dst atomically per
        PUT/copy (S3 copy-object, memory cp_file), so mv directly —
        dst transitions old→new with no missing-file window, and a
        failed mv (src stolen by a racing replay) leaves dst's previous
        commit INTACT (tests/test_storage_race.py). Backends whose mv
        refuses to overwrite fall back to delete-then-move — the wider
        non-atomic window the sink's data-before-manifest ordering
        already tolerates."""
        s, d = self._strip(src), self._strip(dst)
        try:
            self.fs.mv(s, d)
        except FileExistsError:
            self.fs.rm(d)
            self.fs.mv(s, d)

    def getsize(self, path: str) -> int:
        return int(self.fs.size(self._strip(path)))

    def fsync_file(self, fileobj) -> None:
        fileobj.flush()

    def fsync_dir(self, path: str) -> None:
        pass


def storage_for(uri_or_path: str):
    """Resolve a sink location to ``(storage, normalized_path)``.

    - plain paths and ``file://`` URIs → :class:`LocalStorage`;
    - any other ``proto://`` URI → :class:`FsspecStorage` over
      ``fsspec.filesystem(proto)``.
    """
    if "://" not in uri_or_path:
        return LocalStorage(), uri_or_path
    proto, rest = uri_or_path.split("://", 1)
    if proto == "file":
        return LocalStorage(), "/" + rest.lstrip("/")
    import fsspec

    return FsspecStorage(fsspec.filesystem(proto), proto), rest
