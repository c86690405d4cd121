"""Document-table sources and sinks.

The production input is a Lance table of interleaved documents (BASELINE
input_hint); development corpora are parquet.  ``read_documents`` dispatches
on the path: a ``.lance`` dataset goes through ``ray.data.read_lance``
(fragment-parallel scan with column projection), anything else through
``read_parquet``.  The ``lance`` package is not installed in this container,
so the Lance branch is import-gated and exercised only where the wheel
exists — the parquet branch covers all tests/benches here.
"""

from __future__ import annotations

import os

import ray.data
from ray.data import Dataset

DOC_COLUMNS = ["doc_id", "spans"]


def have_lance() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_documents(path: str, columns: list[str] | None = None) -> Dataset:
    """Read a documents table (doc_id, spans) from Lance or parquet."""
    columns = columns or DOC_COLUMNS
    if path.rstrip("/").endswith(".lance") or os.path.isdir(
        os.path.join(path, "_versions")
    ):
        if not have_lance():
            raise RuntimeError(
                "input looks like a Lance dataset but the `lance` package is"
                " not installed in this environment"
            )
        return ray.data.read_lance(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns)


def write_documents(ds: Dataset, path: str, fmt: str = "parquet") -> None:
    """Write a documents table; Lance when requested and available."""
    if fmt == "lance" and have_lance():
        ds.write_lance(path)
    else:
        ds.write_parquet(path)
