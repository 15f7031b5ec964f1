"""Ray-Data-native console-transcript processing engine."""


def _patch_fsspec_http():
    """Work around a Ray Data path-resolution crash: Ray probes
    ``fsspec.implementations.http`` catching only ModuleNotFoundError,
    but when aiohttp is absent a concurrently half-imported module
    raises bare ImportError ("cannot import name 'HTTPFileSystem'"),
    killing reads issued from worker threads.  Registering a placeholder
    class is safe: the probe only uses it in isinstance checks, which
    are False for local filesystems."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return
    except ModuleNotFoundError:
        pass
    except ImportError:
        pass
    import sys
    import types

    m = sys.modules.get("fsspec.implementations.http")
    if m is None:
        m = types.ModuleType("fsspec.implementations.http")
        sys.modules["fsspec.implementations.http"] = m
    if not hasattr(m, "HTTPFileSystem"):

        class _PlaceholderHTTPFileSystem:
            pass

        m.HTTPFileSystem = _PlaceholderHTTPFileSystem


_patch_fsspec_http()
