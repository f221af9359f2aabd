"""imagor-ray: Ray-Data-native transcript processing engine.

Importing this package applies one defensive shim to Ray Data (see
`_harden_ray_http_fs_probe`): in this environment `aiohttp` is absent, so
`fsspec.implementations.http` cannot import. Ray's
`ray/data/datasource/path_util.py::_is_http_filesystem` guards that import
with `except ModuleNotFoundError`, but under *concurrent* imports inside the
streaming executor's threads the partially-initialised module surfaces as a
plain `ImportError` ("cannot import name 'HTTPFileSystem'"), which escapes
out of `read_parquet` and flakes otherwise-correct pipelines. The shim makes
the probe treat any ImportError as "not an HTTP filesystem", which is the
semantics Ray intended.
"""

from __future__ import annotations


def _harden_ray_http_fs_probe() -> None:
    """Make Ray's HTTP-filesystem probe tolerate ImportError, not just
    ModuleNotFoundError.

    Safe to call repeatedly; idempotent. Ray only calls the probe through the
    module attribute (`path_util._is_http_filesystem`), so rebinding the
    attribute covers every call site.
    """
    try:
        from ray.data.datasource import path_util as _pu
    except Exception:  # pragma: no cover - ray always present in this env
        return
    orig = getattr(_pu, "_is_http_filesystem", None)
    if orig is None or getattr(orig, "_imagor_ray_hardened", False):
        return

    def _is_http_filesystem(fs):  # noqa: ANN001 - mirrors ray's signature
        try:
            return orig(fs)
        except ImportError:
            # fsspec's http implementation is unavailable (e.g. no aiohttp);
            # a racing concurrent import raises ImportError rather than
            # ModuleNotFoundError. Either way: this is not an HTTP fs.
            return False

    _is_http_filesystem._imagor_ray_hardened = True
    _is_http_filesystem._imagor_ray_orig = orig
    _pu._is_http_filesystem = _is_http_filesystem


_harden_ray_http_fs_probe()
