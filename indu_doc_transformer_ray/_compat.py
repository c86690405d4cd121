"""Environment compatibility shims (import once from the package root)."""

from __future__ import annotations

import sys
import types


def patch_fsspec_http() -> None:
    """This container has fsspec but no aiohttp, so
    ``fsspec.implementations.http`` never imports.  Ray's path resolution
    probes it on every read/write and handles ModuleNotFoundError — but
    CONCURRENT first-imports (e.g. parallel shard pipelines) can observe a
    partially-initialized module and get a bare ImportError instead, which
    Ray does not catch.  Registering a tiny completed stub module (with a
    placeholder HTTPFileSystem that nothing will ever be an instance of)
    makes the probe deterministic and race-free."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return
    except Exception:
        pass

    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # placeholder: aiohttp is absent in this env
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


patch_fsspec_http()
