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


def _sniff_format(path: str) -> str:
    """Infer the on-disk format of a documents table: explicit extension on
    the path itself, else the extension of the first file inside a
    directory (Ray sinks write directories of uniformly-suffixed files)."""
    base = path.rstrip("/")
    if base.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions")):
        return "lance"
    for ext, fmt in ((".jsonl", "jsonl"), (".json", "jsonl"),
                     (".csv", "csv"), (".parquet", "parquet"),
                     (".arrow", "ipc"), (".feather", "ipc")):
        if base.endswith(ext):
            return fmt
    if os.path.isdir(base):
        for name in sorted(os.listdir(base)):
            for ext, fmt in ((".jsonl", "jsonl"), (".json", "jsonl"),
                             (".csv", "csv"), (".parquet", "parquet"),
                             (".arrow", "ipc"), (".feather", "ipc")):
                if name.endswith(ext):
                    return fmt
    return "parquet"


#: Canonical arrow type of the spans column (mirrors fixtures.corpus_table /
#: the BASELINE span-table input contract).
def _spans_type():
    import pyarrow as pa

    return pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )


def _normalize_spans(ds: Dataset, columns: list[str]) -> Dataset:
    """Cast a freshly-read documents table to the canonical span schema:
    JSON readers infer int64 offsets and may reorder struct fields; the
    cast keeps every downstream consumer format-agnostic."""
    import pyarrow as pa

    if "spans" not in columns:
        return ds

    target = _spans_type()

    def canon(t: "pa.Table") -> "pa.Table":
        idx = t.column_names.index("spans")
        col = t.column("spans")
        if col.type != target:
            col = col.cast(target)
            t = t.set_column(idx, "spans", col)
        return t.select(columns)

    return ds.map_batches(canon, batch_format="pyarrow")


def _decode_csv_spans(columns: list[str]):
    """CSV is flat: spans travel as a JSON-encoded string column and are
    decoded back to list<struct> batch-side (vectorized json loads loop is
    per-row but CSV is a small-corpus interchange format, not the scale
    path — parquet/lance are)."""
    import json

    import pyarrow as pa

    target = _spans_type()

    def decode(t: "pa.Table") -> "pa.Table":
        if "spans" in t.column_names:
            vals = [
                json.loads(s) if s is not None else None
                for s in t.column("spans").to_pylist()
            ]
            idx = t.column_names.index("spans")
            t = t.set_column(idx, "spans", pa.array(vals, target))
        return t.select(columns)

    return decode


def read_documents(
    path: str, columns: list[str] | None = None, fmt: str | None = None
) -> Dataset:
    """Read a documents table (doc_id, spans) from Lance, parquet, JSONL or
    CSV; ``fmt`` overrides extension sniffing."""
    columns = columns or DOC_COLUMNS
    fmt = fmt or _sniff_format(path)
    if fmt == "lance":
        if not have_lance():
            raise RuntimeError(
                "input looks like a Lance dataset but the `lance` package is"
                " not installed in this environment"
            )
        return ray.data.read_lance(path, columns=columns)
    if fmt == "jsonl":
        return _normalize_spans(ray.data.read_json(path), columns)
    if fmt == "csv":
        return ray.data.read_csv(path).map_batches(
            _decode_csv_spans(columns), batch_format="pyarrow"
        )
    if fmt == "ipc":
        return _read_ipc(path, columns)
    return ray.data.read_parquet(path, columns=columns)


def _read_ipc(path: str, columns: list[str]) -> Dataset:
    """Arrow IPC / Feather-v2 source: one task per .arrow file (the same
    per-file parallelism parquet gets), zero-copy decode via
    ``pa.ipc.open_file`` inside the task — Ray ships only the raw bytes.
    Ray Data has no native IPC reader, so this rides read_binary_files +
    a flat decode stage; column pruning happens at decode (IPC is not
    column-seekable over a byte blob, so the prune saves shuffle width,
    not I/O — use parquet/Lance when read-side projection matters)."""
    import pyarrow as pa

    def decode(t: "pa.Table") -> "pa.Table":
        parts = []
        for blob in t.column("bytes").to_pylist():
            tbl = pa.ipc.open_file(pa.BufferReader(blob)).read_all()
            parts.append(tbl.select(columns))
        return pa.concat_tables(parts) if parts else pa.table(
            {c: pa.array([], pa.null()) for c in columns}
        )

    return ray.data.read_binary_files(path, file_extensions=["arrow", "feather"]).map_batches(
        decode, batch_format="pyarrow"
    )


def write_documents(ds: Dataset, path: str, fmt: str = "parquet") -> None:
    """Write a documents table: parquet (default), Lance when available,
    JSONL, or CSV (spans JSON-encoded into a flat string column)."""
    if fmt == "lance" and have_lance():
        ds.write_lance(path)
    elif fmt == "jsonl":
        ds.write_json(path)
    elif fmt == "csv":
        import json

        import pyarrow as pa

        def encode(t: "pa.Table") -> "pa.Table":
            if "spans" in t.column_names:
                idx = t.column_names.index("spans")
                enc = pa.array(
                    [
                        json.dumps(v, separators=(",", ":"))
                        if v is not None else None
                        for v in t.column("spans").to_pylist()
                    ],
                    pa.string(),
                )
                t = t.set_column(idx, "spans", enc)
            return t

        ds.map_batches(encode, batch_format="pyarrow").write_csv(path)
    elif fmt == "ipc":
        _write_ipc(ds, path)
    else:
        ds.write_parquet(path)


def _write_ipc(ds: Dataset, path: str) -> None:
    """Arrow IPC sink: one .arrow file per block, written inside the block
    task (no driver fan-in).  File names are the md5 of the serialized
    payload — deterministic, collision-free, and naturally idempotent
    (a re-run of identical data overwrites the same names instead of
    appending duplicates)."""
    import hashlib

    import pyarrow as pa

    os.makedirs(path, exist_ok=True)

    def write_block(t: "pa.Table") -> "pa.Table":
        sink = pa.BufferOutputStream()
        with pa.ipc.new_file(sink, t.schema) as w:
            w.write_table(t)
        buf = sink.getvalue()
        name = hashlib.md5(buf.to_pybytes()).hexdigest()
        tmp = os.path.join(path, f".{name}.tmp")
        final = os.path.join(path, f"{name}.arrow")
        with open(tmp, "wb") as f:
            f.write(buf.to_pybytes())
        os.replace(tmp, final)  # atomic publish per block
        return pa.table({"n": pa.array([len(t)], pa.int64())})

    ds.map_batches(write_block, batch_format="pyarrow").count()


def write_clustered(
    ds: Dataset,
    path: str,
    cluster_col: str,
    bucket_col: str,
) -> str:
    """Clustered parquet sink (the Z-ORDER write path): rows partition into
    one directory per ``bucket_col`` value and sort by ``cluster_col``
    WITHIN each partition, so a reader with a range predicate on any
    dimension folded into the cluster key prunes whole directories (and,
    inside them, contiguous row groups).  The in-partition sort happens in
    the per-bucket kernel — bounded frames, no global sort — and the write
    is hive-partitioned so a failed run resumes by skipping complete
    directories."""
    import pandas as pd
    import pyarrow as pa

    def sort_bucket(g: "pd.DataFrame") -> "pa.Table":
        g = g.sort_values(cluster_col)
        return pa.Table.from_pandas(g, preserve_index=False)

    (
        ds.groupby(bucket_col)
        .map_groups(sort_bucket, batch_format="pandas")
        .write_parquet(path, partition_cols=[bucket_col])
    )
    return path
