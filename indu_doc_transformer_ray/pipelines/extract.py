"""The flagship Ray Data extraction pipeline.

    read (parquet/lance docs table)
      -> map_batches(DocumentExtractor, actor pool)   # classify+footer+tables+emit
           ├─ span path:  select(doc_id, spans_out)   # per-doc, shuffle-free
           └─ delta path: explode -> local combine -> groupby(mkey).aggregate(Max)
                          -> decode -> normalized object tables

Design points for 100 TB (SURVEY.md §3.4/§4):

- The unit of work is the DOCUMENT (one row), processed whole inside the
  actor: the equality surface (per-doc ordered spans) is embarrassingly
  parallel and never shuffles.  Per-page compute is micro-scale (dozens of
  cells), so document skew is bounded by pages/doc; small ``batch_size``
  plus Ray's dynamic block splitting absorbs the multi-hundred-page tail.
- The ONLY all-to-all exchange is the object merge, and it is a single
  ``groupby(mkey).aggregate(Max(payload))`` over pre-combined deltas —
  md5-derived keys are uniform by construction, so no skew/salting needed
  (SURVEY.md §7.4).
- The actor pool holds the warm state (parsed config, compiled separator
  regex, page-spec index) built once per actor in ``__init__``.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

import ray.data
from ray.data import Dataset
from ray.data.aggregate import Max

from ..core import AspectConfig, default_config
from ..deltas import assemble_rows, local_combine, store_to_deltas, TABLE_NAMES
from ..emit import process_document
from ..fixtures import SPAN_STRUCT
from ..spandoc import US, Span
from ..store import ExtractionStore

DELTA_STRUCT = pa.struct([("mkey", pa.string()), ("payload", pa.string())])

EXTRACTED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
        ("deltas", pa.list_(DELTA_STRUCT)),
        ("n_pages", pa.int32()),
        ("n_spans_in", pa.int32()),
        ("n_errors", pa.int32()),
    ]
)


class DocumentExtractor:
    """Actor-pool stage: one whole document per row, a fresh per-document
    store, output = renumbered span sequence + merge-ready deltas + per-doc
    metrics columns (feeding the partition manifest)."""

    def __init__(self, config_records: Optional[list[dict]] = None):
        self.config = (
            AspectConfig.from_pairs(
                [(r["Separator"], r["Aspect"]) for r in config_records]
            )
            if config_records
            else default_config
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        span_lists = batch.column("spans").to_pylist()
        out_spans: list[list[dict]] = []
        out_deltas: list[list[dict]] = []
        n_pages: list[int] = []
        n_spans_in: list[int] = []
        n_errors: list[int] = []
        for doc_id, raw in zip(doc_ids, span_lists):
            store = ExtractionStore(self.config)
            spans = [
                Span(s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in raw
            ]
            out = process_document(doc_id, spans, store)
            out_spans.append(
                [
                    {"kind": s.kind, "text": s.text,
                     "media_ref": s.media_ref, "offset": s.offset}
                    for s in out
                ]
            )
            out_deltas.append(
                [{"mkey": k, "payload": v} for k, v in store_to_deltas(store)]
            )
            n_pages.append(sum(1 for s in raw if s["kind"] == "page_break"))
            n_spans_in.append(len(raw))
            n_errors.append(len(store.error_log))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "spans": pa.array(out_spans, pa.list_(SPAN_STRUCT)),
                "deltas": pa.array(out_deltas, pa.list_(DELTA_STRUCT)),
                "n_pages": pa.array(n_pages, pa.int32()),
                "n_spans_in": pa.array(n_spans_in, pa.int32()),
                "n_errors": pa.array(n_errors, pa.int32()),
            },
            schema=EXTRACTED_SCHEMA,
        )


def extract_documents(
    docs: Dataset,
    config: AspectConfig = default_config,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 32,
) -> Dataset:
    """docs(doc_id, spans) -> extracted(doc_id, spans, deltas, metrics).

    ``batch_size`` is small because per-document work is heavy and variable
    (SURVEY.md §4.2); the default autoscaling actor pool is capped at the
    session CPU count so the stage can use the node without starving the
    read/merge stages."""
    if concurrency is None:
        import ray

        n = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = (1, max(2, n))
    return docs.map_batches(
        DocumentExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        fn_constructor_args=(config.to_records(),),
        concurrency=concurrency,
    )


def _explode_deltas(batch: pa.Table) -> pa.Table:
    """Flatten per-doc delta lists and pre-combine within the batch (the
    partial-aggregate push-down before the shuffle)."""
    flat: list[tuple[str, str]] = []
    for deltas in batch.column("deltas").to_pylist():
        for d in deltas:
            flat.append((d["mkey"], d["payload"]))
    acc = local_combine(flat)
    return pa.Table.from_pydict(
        {
            "mkey": pa.array(list(acc.keys()), pa.string()),
            "payload": pa.array(list(acc.values()), pa.string()),
        }
    )


def merge_deltas(extracted: Dataset) -> Dataset:
    """The one shuffle: exact God-merge semantics as a vectorized aggregate
    (see deltas.py for the per-kind proof).  Output: (mkey, payload)."""
    flat = extracted.select_columns(["deltas"]).map_batches(
        _explode_deltas, batch_format="pyarrow"
    )
    merged = flat.groupby("mkey").aggregate(Max("payload", alias_name="payload"))
    return merged


def _decode_merged(batch: pa.Table) -> pa.Table:
    """merged (mkey, payload) -> typed rows tagged with their table name."""
    import json as _json

    tables: list[str] = []
    rows: list[str] = []
    kinds: list[str] = []
    for mkey, payload in zip(
        batch.column("mkey").to_pylist(), batch.column("payload").to_pylist()
    ):
        name, row = assemble_rows(mkey, payload)
        tables.append(name)
        rows.append(_json.dumps(row, sort_keys=True))
        kinds.append(mkey.split(US, 1)[0])
    return pa.Table.from_pydict(
        {
            "table_name": pa.array(tables, pa.string()),
            "row_json": pa.array(rows, pa.string()),
            "kind": pa.array(kinds, pa.string()),
        }
    )


def merged_object_rows(extracted: Dataset) -> Dataset:
    """Merged deltas decoded to (table_name, row_json) rows — written once,
    partitioned by table_name, so each normalized table is a filtered read."""
    return merge_deltas(extracted).map_batches(
        _decode_merged, batch_format="pyarrow"
    )


def object_tables_to_pylists(extracted: Dataset) -> dict[str, list[dict]]:
    """Small-scale/test materialization of every normalized object table."""
    import json as _json

    out: dict[str, list[dict]] = {n: [] for n in TABLE_NAMES}
    for batch in merged_object_rows(extracted).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for name, row in zip(
            batch.column("table_name").to_pylist(),
            batch.column("row_json").to_pylist(),
        ):
            out[name].append(_json.loads(row))
    return out
