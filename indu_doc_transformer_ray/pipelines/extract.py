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
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

from ..core import AspectConfig, default_config
from ..deltas import (
    TABLE_NAMES,
    assemble_rows,
    store_to_deltas,
    store_to_local_tuples,
)
from ..emit import process_document
from ..fixtures import SPAN_STRUCT
from ..spandoc import US, Span
from ..store import ExtractionStore

DELTA_STRUCT = pa.struct([("mkey", pa.string()), ("payload", pa.string())])
PAGE_OBJECT_STRUCT = pa.struct(
    [
        ("doc_id", pa.string()),
        ("page_no", pa.int32()),
        ("object_kind", pa.string()),
        ("object_guid", pa.string()),
    ]
)
ERROR_STRUCT = pa.struct(
    [
        ("doc_id", pa.string()),
        ("page_no", pa.int32()),
        ("severity", pa.string()),
        ("message", pa.string()),
    ]
)

EXTRACTED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
        ("deltas", pa.list_(DELTA_STRUCT)),
        ("page_objects", pa.list_(PAGE_OBJECT_STRUCT)),
        ("errors", pa.list_(ERROR_STRUCT)),
        ("n_pages", pa.int32()),
        ("n_spans_in", pa.int32()),
        ("n_errors", pa.int32()),
        ("n_page_objects", pa.int32()),
    ]
)


class DocumentExtractor:
    """Actor-pool stage: one whole document per row, a fresh per-document
    store, output = renumbered span sequence + merge-ready deltas + per-doc
    metrics columns (feeding the partition manifest)."""

    def __init__(
        self,
        config_records: Optional[list[dict]] = None,
        page_settings_json: Optional[str] = None,
        progress: "tuple | None" = None,
    ):
        # (progress_actor_handle, shard_id) or None: when set, every batch
        # fire-and-forgets one (shard, docs, pages) increment to the zero-CPU
        # progress actor — page-granular progress (the reference's
        # per-page percentage events, plugins/events.py:46-72) at a
        # one-RPC-per-batch cost instead of one-per-page
        self.progress = progress
        self.config = (
            AspectConfig.from_pairs(
                [(r["Separator"], r["Aspect"]) for r in config_records]
            )
            if config_records
            else default_config
        )
        # cross-document caches shared by every per-doc store this actor
        # creates (pure-function results only); bounded by the distinct
        # values the actor sees — cleared past a safety cap per batch
        self.attr_memo: dict = {}
        self.merge_memo: dict = {}
        self.footer_memo: dict = {}
        self.parse_memo: dict = {}  # aspect_str -> (sep, value, guid)
        self.parts_memo: dict = {}  # tag string -> parsed parts
        self.guid_memo: dict = {}   # final tag -> xtarget GUID
        if page_settings_json:
            # register JSON page-spec overrides IN THIS WORKER PROCESS (the
            # driver's module state does not propagate to Ray actors); only
            # page types with a registered emitter take effect
            from .. import emit
            from ..pagesettings import PageSettings, page_specs_from_settings

            st = PageSettings.__new__(PageSettings)
            st.filename = "<inline>"
            st.from_json(page_settings_json)
            for key, spec in page_specs_from_settings(st).items():
                emitter = emit.EMITTERS.get(key)
                if emitter is not None:
                    emit.register_page_type(spec, emitter)
            # an override may RENAME a page type's search string: rebuild the
            # classifier index from the final spec set so stale names drop
            emit._NAME_INDEX.clear()
            emit._NAME_INDEX.update(
                {
                    sp.search_name.strip().lower(): pt
                    for pt, sp in emit.PAGE_SPECS.items()
                }
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        # memory-safety cap: an adversarial corpus with unbounded distinct
        # attrs/tags would otherwise grow the actor memos without limit
        for memo in (self.attr_memo, self.merge_memo, self.footer_memo,
                     self.parse_memo, self.parts_memo, self.guid_memo):
            if len(memo) > 1_000_000:
                memo.clear()
        doc_ids = batch.column("doc_id").to_pylist()
        # flat-column decode: four plain-list conversions + offset slicing
        # beat list<struct>.to_pylist's per-span dict materialization
        spans_arr = batch.column("spans").combine_chunks()
        flat = spans_arr.flatten()
        in_kind = flat.field("kind").to_pylist()
        in_text = flat.field("text").to_pylist()
        in_ref = flat.field("media_ref").to_pylist()
        in_off = flat.field("offset").to_pylist()
        in_offsets = spans_arr.offsets.to_pylist()
        # columnar accumulators: list<struct> columns are assembled from flat
        # value arrays + offset arrays (ListArray.from_arrays), which is
        # several times cheaper than pa.array over lists of per-row dicts
        sp_kind: list[str] = []
        sp_text: list[str] = []
        sp_ref: list[str] = []
        sp_off: list[int] = []
        sp_offsets = [0]
        d_mkey: list[str] = []
        d_payload: list[str] = []
        d_offsets = [0]
        po_doc: list[str] = []
        po_page: list[int] = []
        po_kind: list[str] = []
        po_guid: list[str] = []
        po_offsets = [0]
        er_doc: list[str] = []
        er_page: list[int] = []
        er_sev: list[str] = []
        er_msg: list[str] = []
        er_offsets = [0]
        n_pages: list[int] = []
        n_spans_in: list[int] = []
        n_errors: list[int] = []
        n_pobjs: list[int] = []

        for i, doc_id in enumerate(doc_ids):
            a, b = in_offsets[i], in_offsets[i + 1]
            store = ExtractionStore(
                self.config, attr_memo=self.attr_memo,
                merge_memo=self.merge_memo, footer_memo=self.footer_memo,
                parse_memo=self.parse_memo, parts_memo=self.parts_memo,
                guid_memo=self.guid_memo,
            )
            spans = [
                Span(k, t, r, o)
                for k, t, r, o in zip(
                    in_kind[a:b], in_text[a:b], in_ref[a:b], in_off[a:b]
                )
            ]
            # renumber=False: output offsets are positional by construction,
            # filled below via range() — skips a per-span Span rebuild
            out = process_document(doc_id, spans, store, renumber=False)
            if out:
                o_kind, o_text, o_ref, _stale = zip(*out)
                sp_kind.extend(o_kind)
                sp_text.extend(o_text)
                sp_ref.extend(o_ref)
                sp_off.extend(range(len(out)))
            sp_offsets.append(len(sp_kind))
            dl = store_to_deltas(store)
            if dl:
                mk, pl = zip(*dl)
                d_mkey.extend(mk)
                d_payload.extend(pl)
            d_offsets.append(len(d_mkey))
            pobjs, errs = store_to_local_tuples(store)
            if pobjs:
                p_doc, p_page, p_kind, p_guid = zip(*pobjs)
                po_doc.extend(p_doc)
                po_page.extend(p_page)
                po_kind.extend(p_kind)
                po_guid.extend(p_guid)
            po_offsets.append(len(po_doc))
            if errs:
                e_doc, e_page, e_sev, e_msg = zip(*errs)
                er_doc.extend(e_doc)
                er_page.extend(e_page)
                er_sev.extend(e_sev)
                er_msg.extend(e_msg)
            er_offsets.append(len(er_doc))
            n_pages.append(in_kind[a:b].count("page_break"))
            n_spans_in.append(b - a)
            n_errors.append(len(errs))  # set-deduplicated, matches the table
            n_pobjs.append(len(pobjs))

        def list_col(offsets, arrays, names):
            values = pa.StructArray.from_arrays(arrays, names)
            return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values)

        spans_col = list_col(
            sp_offsets,
            [pa.array(sp_kind, pa.string()), pa.array(sp_text, pa.string()),
             pa.array(sp_ref, pa.string()), pa.array(sp_off, pa.int32())],
            ["kind", "text", "media_ref", "offset"],
        )
        deltas_col = list_col(
            d_offsets,
            [pa.array(d_mkey, pa.string()), pa.array(d_payload, pa.string())],
            ["mkey", "payload"],
        )
        pobj_col = list_col(
            po_offsets,
            [pa.array(po_doc, pa.string()), pa.array(po_page, pa.int32()),
             pa.array(po_kind, pa.string()), pa.array(po_guid, pa.string())],
            ["doc_id", "page_no", "object_kind", "object_guid"],
        )
        err_col = list_col(
            er_offsets,
            [pa.array(er_doc, pa.string()), pa.array(er_page, pa.int32()),
             pa.array(er_sev, pa.string()), pa.array(er_msg, pa.string())],
            ["doc_id", "page_no", "severity", "message"],
        )
        if self.progress is not None:
            actor, shard = self.progress
            actor.add.remote(shard, len(doc_ids), sum(n_pages))
        return pa.Table.from_arrays(
            [
                pa.array(doc_ids, pa.string()),
                spans_col,
                deltas_col,
                pobj_col,
                err_col,
                pa.array(n_pages, pa.int32()),
                pa.array(n_spans_in, pa.int32()),
                pa.array(n_errors, pa.int32()),
                pa.array(n_pobjs, pa.int32()),
            ],
            schema=EXTRACTED_SCHEMA,
        )


def extract_documents(
    docs: Dataset,
    config: AspectConfig = default_config,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 32,
    page_settings_json: "str | None" = None,
    progress: "tuple | None" = None,
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
        fn_constructor_args=(config.to_records(), page_settings_json, progress),
        concurrency=concurrency,
    )


def _explode_deltas(batch: pa.Table) -> pa.Table:
    """Flatten per-doc delta lists and pre-combine within the batch (the
    partial-aggregate push-down before the shuffle) — all in vectorized
    Arrow kernels, no Python per row."""
    flat = pc.list_flatten(batch.column("deltas").combine_chunks())
    t = pa.Table.from_arrays(
        [flat.field("mkey"), flat.field("payload")], ["mkey", "payload"]
    )
    combined = t.group_by("mkey").aggregate([("payload", "max")])
    return combined.rename_columns(["mkey", "payload"])


def _bucketize(batch: pa.Table, chars: int = 2) -> pa.Table:
    """Merge bucket from the first hex chars of the embedded GUID (uniform
    by construction): 1 char = 16 buckets, 2 = 256.  Bucket count trades
    files-per-partition against per-bucket fold memory — raise it with
    corpus size (each bucket must fit one fold task)."""
    guid_part = pc.list_element(
        pc.split_pattern(batch.column("mkey"), US, max_splits=1), 1
    )
    bucket = pc.utf8_slice_codeunits(guid_part, 0, chars)
    return batch.append_column("bucket", bucket)


def _merge_bucket(group: pa.Table) -> pa.Table:
    merged = group.group_by("mkey").aggregate([("payload", "max")])
    return merged.rename_columns(["mkey", "payload"])


def _fold_bucket_table(t: pa.Table) -> pa.Table:
    """One bucket's combined deltas -> merged rows tagged with table names."""
    merged = t.group_by("mkey").aggregate([("payload", "max")])
    merged = merged.rename_columns(["mkey", "payload"])
    return _tag_table_name(merged)


import ray as _ray


def _read_bucket_dirs(dirs: "str | list[str]") -> pa.Table:
    """One bucket's combined deltas, possibly spread over several per-shard
    partition dirs (runner._write_shard_delta_buckets layout)."""
    import pyarrow.dataset as pads

    if isinstance(dirs, str):
        dirs = [dirs]
    parts = [
        pads.dataset(d).to_table(columns=["mkey", "payload"]) for d in dirs
    ]
    return parts[0] if len(parts) == 1 else pa.concat_tables(parts)


@_ray.remote
def _fold_bucket(bucket_dirs, dest_file: str) -> int:
    """Fold one delta bucket into its merged objects file (vectorized Arrow
    group_by; the bucket is the unit of merge parallelism)."""
    import pyarrow.parquet as pq

    from .runner import PQ_WRITE_KW

    out = _fold_bucket_table(_read_bucket_dirs(bucket_dirs))
    pq.write_table(out, dest_file, **PQ_WRITE_KW)
    return out.num_rows


@_ray.remote
def _fold_bucket_group(pairs: list) -> int:
    """Fold SEVERAL (bucket_dirs, dest_file) pairs in one task: buckets stay
    the unit of merge correctness/resume, but one Ray task per bucket makes
    the fold phase dispatch-bound when bucket count >> CPUs (256 tasks of
    ~50ms each serialize under a degraded scheduler).  Grouping keeps
    task count ~2x CPUs with identical outputs."""
    import pyarrow.parquet as pq

    from .runner import PQ_WRITE_KW

    total = 0
    for bucket_dirs, dest_file in pairs:
        out = _fold_bucket_table(_read_bucket_dirs(bucket_dirs))
        pq.write_table(out, dest_file, **PQ_WRITE_KW)
        total += out.num_rows
    return total


def merge_deltas(extracted: Dataset) -> Dataset:
    """In-memory merge path (tests / small runs): exact God-merge semantics
    as max-per-key (see deltas.py for the per-kind proof) over a coarse
    bucket exchange with a vectorized Arrow group_by inside each bucket.
    Output: (mkey, payload).

    The production path avoids even this exchange: the runner writes deltas
    hash-partitioned by bucket at checkpoint time (a map-side partitioned
    write — no all-to-all), then folds each bucket independently
    (runner.run_merge)."""
    flat = extracted.select_columns(["deltas"]).map_batches(
        _explode_deltas, batch_format="pyarrow"
    )
    return (
        flat.map_batches(_bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_merge_bucket, batch_format="pyarrow")
    )


#: delta kind (mkey prefix) -> output table name
KIND_TO_TABLE = {
    "xtarget": "xtargets",
    "xtarget_attr": "object_attrs",
    "aspect_attr": "object_attrs",
    "link_attr": "object_attrs",
    "aspect": "aspects",
    "attribute": "attributes",
    "link": "links",
    "connection": "connections",
    "pin": "pins",
    "page_object": "page_objects",
    "error": "errors",
}


def _tag_table_name(batch: pa.Table) -> pa.Table:
    """Attach the output-table name from the mkey prefix — dictionary-level
    mapping (a handful of distinct kinds), not per-row Python."""
    kind = pc.list_element(
        pc.split_pattern(batch.column("mkey"), US, max_splits=1), 0
    )
    enc = pc.dictionary_encode(kind.combine_chunks())
    mapped = pa.array(
        [KIND_TO_TABLE[v] for v in enc.dictionary.to_pylist()], pa.string()
    )
    table_name = pc.cast(
        pa.DictionaryArray.from_arrays(enc.indices, mapped), pa.string()
    )
    return batch.append_column("table_name", table_name)


def merged_object_rows(extracted: Dataset) -> Dataset:
    """Merged deltas tagged with their table name: (table_name, mkey,
    payload).  Written once, partitioned by table_name; per-table decode
    (deltas.assemble_rows) is deferred to the consumer so the headline merge
    path stays fully vectorized."""
    return merge_deltas(extracted).map_batches(
        _tag_table_name, batch_format="pyarrow"
    )


def _json_rows(payload: pa.Array) -> pa.Table:
    """COLUMNAR JSON decode of a payload column: one C++ join into an
    NDJSON buffer, one ``pyarrow.json.read_json`` parse — no per-row
    Python.  Canonical payloads (json.dumps) never contain raw newlines,
    so line-delimited framing is safe."""
    import io

    import pyarrow.json as pajson

    arr = (
        payload.combine_chunks()
        if isinstance(payload, pa.ChunkedArray)
        else payload
    )
    la = pa.ListArray.from_arrays(pa.array([0, len(arr)], pa.int32()), arr)
    buf = pc.binary_join(la, "\n")[0].as_py().encode()
    return pajson.read_json(io.BytesIO(buf))


def _const_col(value: str, n: int) -> pa.Array:
    return pa.array([value] * n, pa.string())


def _decode_kind(kind: str, parts, payload: pa.Array) -> pa.Table:
    """Vectorized decode of ONE delta kind's (mkey parts, payload) columns —
    the columnar mirror of ``deltas.assemble_rows`` (kept for the
    driver-side/test path; equality is pinned by test_runner.py)."""
    n = len(payload)
    p1 = pc.list_element(parts, 1)
    if kind == "xtarget":
        ps = pc.split_pattern(payload, US, max_splits=2)
        return pa.table(
            {
                "guid": p1,
                "tag_str": pc.list_element(ps, 2),
                "target_type": pc.list_element(ps, 1),
            }
        )
    if kind in ("xtarget_attr", "aspect_attr", "link_attr"):
        return pa.table(
            {
                "owner_kind": _const_col(kind.removesuffix("_attr"), n),
                "owner_guid": p1,
                "attr_guid": pc.list_element(parts, 2),
            }
        )
    if kind == "aspect":
        jt = _json_rows(payload)
        return pa.table(
            {
                "guid": p1,
                "separator": jt.column("separator"),
                "value": jt.column("value"),
            }
        )
    if kind == "attribute":
        jt = _json_rows(payload)
        return pa.table(
            {
                "guid": p1,
                "attr_type": jt.column("attr_type"),
                "name": jt.column("name"),
                "value_json": jt.column("value_json"),
            }
        )
    if kind in ("link", "connection", "pin"):
        jt = _json_rows(payload)
        return pa.table(
            {"guid": p1, **{c: jt.column(c) for c in jt.column_names}}
        )
    if kind == "page_object":
        return pa.table(
            {
                "doc_id": p1,
                "page_no": pc.cast(pc.list_element(parts, 2), pa.int64()),
                "object_kind": pc.list_element(parts, 3),
                "object_guid": pc.list_element(parts, 4),
            }
        )
    if kind == "error":
        return _json_rows(payload)
    raise ValueError(f"unknown delta kind: {kind}")


def decode_object_batch(batch: pa.Table) -> pa.Table:
    """(mkey, payload) rows of ONE table -> typed rows, fully columnar:
    split mkeys with Arrow kernels, dispatch per distinct kind (an
    object_attrs batch carries up to three *_attr kinds; every other table
    is single-kind), JSON payloads decode through one buffered
    ``pyarrow.json`` parse per kind."""
    if batch.num_rows == 0:
        return pa.table({})
    mkey = batch.column("mkey").combine_chunks()
    payload = batch.column("payload").combine_chunks()
    parts = pc.split_pattern(mkey, US)
    kind0 = pc.list_element(parts, 0)
    pieces = []
    for kind in pc.unique(kind0).to_pylist():
        mask = pc.equal(kind0, kind)
        pieces.append(
            _decode_kind(kind, parts.filter(mask), payload.filter(mask))
        )
    if len(pieces) == 1:
        return pieces[0]
    return pa.concat_tables(pieces, promote_options="permissive")


def flatten_local_rows(extracted: Dataset, column: str) -> Dataset:
    """Doc-scoped rows (page_objects / errors): a pure flatten, no shuffle."""

    def flat(batch: pa.Table) -> pa.Table:
        arr = pc.list_flatten(batch.column(column).combine_chunks())
        return pa.Table.from_arrays(
            [arr.field(i) for i in range(arr.type.num_fields)],
            [arr.type.field(i).name for i in range(arr.type.num_fields)],
        )

    return extracted.select_columns([column]).map_batches(
        flat, batch_format="pyarrow"
    )


def object_tables_to_pylists(extracted: Dataset) -> dict[str, list[dict]]:
    """Small-scale/test materialization of every normalized object table."""
    out: dict[str, list[dict]] = {n: [] for n in TABLE_NAMES}
    for batch in merge_deltas(extracted).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for mkey, payload in zip(
            batch.column("mkey").to_pylist(), batch.column("payload").to_pylist()
        ):
            name, row = assemble_rows(mkey, payload)
            out[name].append(row)
    for name in ("page_objects", "errors"):
        for batch in flatten_local_rows(extracted, name).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        ):
            out[name].extend(batch.to_pylist())
    return out


#: session-scoped memo for the driver corpus extraction: extract_spans,
#: extract_object_stats and search_targets_count all extract the SAME
#: deterministic span corpus (documents rows // 5, seed 42); when a harness
#: runs them back-to-back in one session the heavy actor-pool extraction
#: should happen once.  Entries carry the Ray job id — block refs die with
#: the session, so a stale entry is recomputed, never returned.
_EXTRACT_MEMO: dict[tuple, tuple[str, Dataset]] = {}


def extract_corpus_cached(sf_dir: str) -> Dataset:
    """Materialized extraction of the driver's deterministic span corpus
    (same sizing rule as ``__ray_entry__._corpus_docs_for``), shared across
    the extraction-family queries within one Ray session."""
    import pyarrow.parquet as pq

    import ray

    from .corpus import corpus_dataset

    n_docs = max(
        20, pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows // 5
    )
    from ..functions._util import session_token

    tok = session_token()
    key = (sf_dir, n_docs)
    hit = _EXTRACT_MEMO.get(key)
    if hit is not None and hit[0] == tok:
        return hit[1]
    extracted = extract_documents(corpus_dataset(n_docs, seed=42)).materialize()
    _EXTRACT_MEMO[key] = (tok, extracted)
    return extracted
