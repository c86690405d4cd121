"""Driver contract for the Ray-Data-native engine (see README.md).

The driver initialises Ray BEFORE importing this module; nothing here (or in
the library code it calls) invokes ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``       — flagship extraction pipeline on a corpus derived
                      deterministically from /root/testdata/sf0.001.
- ``queries()``     — one callable per implemented operator (SURVEY.md §2 +
                      the large-scale training-data ops).
- ``oracle_sql()``  — DuckDB-equivalent SQL for every SQL-expressible query;
                      ops with no SQL equivalent (extraction semantics,
                      MinHash/SimHash/LSH, model-ish scoring) are rows-only.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pyarrow.parquet as pq


def _corpus_docs_for(sf_dir: str) -> int:
    """Deterministic span-corpus size derived from the driver testdata scale
    (documents.parquet rows / 5, floor 20)."""
    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return max(20, n // 5)


def _span_corpus(sf_dir: str):
    from indu_doc_transformer_ray.pipelines.corpus import corpus_dataset

    return corpus_dataset(_corpus_docs_for(sf_dir), seed=42)


def entry() -> Any:
    """Flagship: synthesize the interleaved span corpus at sf0.001 scale,
    run the full extraction pipeline (classify -> footer -> reconstruct ->
    emit), and return per-document extraction metrics (stable flat schema)."""
    from indu_doc_transformer_ray.pipelines.extract import extract_documents

    docs = _span_corpus("/root/testdata/sf0.001")
    extracted = extract_documents(docs)
    return extracted.select_columns(
        ["doc_id", "n_pages", "n_spans_in", "n_errors"]
    )


# -- extraction-semantics queries (no SQL equivalent: rows-only checks; the
#    strong correctness gate for these lives in tests/ vs the pure-Python
#    oracle under span-sequence equality) ------------------------------------

def _extract_spans(sf_dir: str):
    from indu_doc_transformer_ray.pipelines.extract import extract_documents

    return extract_documents(_span_corpus(sf_dir)).select_columns(
        ["doc_id", "n_pages", "n_spans_in", "n_errors"]
    )


def _extract_object_stats(sf_dir: str):
    """Object counts per table (the reference's get_stats, G12).  Deltas are
    pre-combined per batch in the pipeline; the final fold happens on the
    driver (the merged set is small at check scale) — the distributed merge
    path itself is equality-tested in tests/test_pipeline_vs_oracle.py."""
    import pandas as pd
    import pyarrow.compute as pc

    from indu_doc_transformer_ray.deltas import assemble_rows
    from indu_doc_transformer_ray.pipelines.extract import (
        _explode_deltas,
        extract_documents,
    )

    extracted = extract_documents(_span_corpus(sf_dir))
    counts: dict[str, int] = {"page_objects": 0, "errors": 0}
    acc: dict[str, str] = {}
    for batch in extracted.select_columns(
        ["deltas", "n_errors", "n_page_objects"]
    ).iter_batches(batch_size=4096, batch_format="pyarrow"):
        counts["errors"] += pc.sum(batch.column("n_errors")).as_py() or 0
        counts["page_objects"] += (
            pc.sum(batch.column("n_page_objects")).as_py() or 0
        )
        combined = _explode_deltas(batch)
        for k, v in zip(
            combined.column("mkey").to_pylist(),
            combined.column("payload").to_pylist(),
        ):
            prev = acc.get(k)
            if prev is None or v > prev:
                acc[k] = v
    for k, v in acc.items():
        name, _row = assemble_rows(k, v)
        counts[name] = counts.get(name, 0) + 1
    rows = sorted(counts.items())
    return pd.DataFrame(rows, columns=["table_name", "n"]).astype({"n": "int64"})


def _media_features(sf_dir: str):
    from indu_doc_transformer_ray.functions.multimodal import media_features

    return media_features(_span_corpus(sf_dir)).select_columns(
        ["doc_id", "media_ref", "width", "height", "n_bytes"]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from indu_doc_transformer_ray.functions import (
        dedup,
        events,
        relational,
        similarity,
        text,
    )

    return {
        # relational / TPC-H-ish (SURVEY §2.6 aggregations + joins)
        "q1_pricing_summary": relational.q1_pricing_summary,
        "q3_top_orders": relational.q3_top_orders,
        "q5_nation_revenue": relational.q5_nation_revenue,
        "top_parts_by_price": relational.top_parts_by_price,
        "orders_per_status": relational.orders_per_status,
        "part_type_stats": relational.part_type_stats,
        "distinct_suppliers_per_nation": relational.distinct_suppliers_per_nation,
        "events_hourly": relational.events_hourly,
        "user_event_counts": relational.user_event_counts,
        "q6_revenue_filtered": relational.q6_revenue_filtered,
        "top2_orders_per_customer": relational.top2_orders_per_customer,
        "distinct_types_union": relational.distinct_types_union,
        "sample_docs_hash": relational.sample_docs_hash,
        "customers_no_orders": relational.customers_no_orders,
        # stream-shaped (as-of join, session windows)
        "asof_prior_click": events.asof_prior_click,
        "sessionize": events.sessionize,
        # text analysis
        "token_stats": text.token_stats,
        "doc_fingerprint": text.doc_fingerprint,
        "quality_flags": text.quality_flags,
        "lang_dist": text.lang_dist,
        "lang_id": text.lang_id,
        "winnow_fingerprint": text.winnow_fingerprint,
        "vocab_topk": text.vocab_topk,
        "doclen_percentiles": text.doclen_percentiles,
        "tfidf_top_terms": text.tfidf_top_terms,
        # dedup
        "dedup_exact": dedup.dedup_exact,
        "dedup_prefix": dedup.dedup_prefix,
        "word_jaccard_pairs": dedup.word_jaccard_pairs,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "simhash64": dedup.simhash64,
        # similarity search
        "ann_topk": similarity.ann_topk,
        "cosine_dup_pairs": similarity.cosine_dup_pairs,
        "lsh_cosine_pairs": similarity.lsh_cosine_pairs,
        "lsh_bucket_topk": similarity.lsh_bucket_topk,
        "label_centroid_sims": similarity.label_centroid_sims,
        # extraction flagship (rows-only; pytest holds the equality gate)
        "extract_spans": _extract_spans,
        "extract_object_stats": _extract_object_stats,
        "media_features": _media_features,
    }


def oracle_sql() -> dict[str, str]:
    from indu_doc_transformer_ray.functions import (
        dedup,
        events,
        relational,
        similarity,
        text,
    )

    return {
        "q1_pricing_summary": relational.Q1_SQL,
        "q3_top_orders": relational.Q3_SQL,
        "q5_nation_revenue": relational.Q5_SQL,
        "top_parts_by_price": relational.TOP_PARTS_SQL,
        "orders_per_status": relational.ORDERS_PER_STATUS_SQL,
        "part_type_stats": relational.PART_TYPE_STATS_SQL,
        "distinct_suppliers_per_nation": relational.DISTINCT_SUPPLIERS_SQL,
        "events_hourly": relational.EVENTS_HOURLY_SQL,
        "user_event_counts": relational.USER_EVENT_COUNTS_SQL,
        "q6_revenue_filtered": relational.Q6_SQL,
        "top2_orders_per_customer": relational.TOP2_PER_CUSTOMER_SQL,
        "distinct_types_union": relational.DISTINCT_TYPES_UNION_SQL,
        "sample_docs_hash": relational.SAMPLE_DOCS_HASH_SQL,
        "customers_no_orders": relational.CUSTOMERS_NO_ORDERS_SQL,
        "asof_prior_click": events.ASOF_PRIOR_CLICK_SQL,
        "sessionize": events.SESSIONIZE_SQL,
        "token_stats": text.TOKEN_STATS_SQL,
        "doc_fingerprint": text.DOC_FINGERPRINT_SQL,
        "quality_flags": text.QUALITY_FLAGS_SQL,
        "lang_dist": text.LANG_DIST_SQL,
        "lang_id": text.LANG_ID_SQL,
        "winnow_fingerprint": text.WINNOW_SQL,
        "vocab_topk": text.VOCAB_TOPK_SQL,
        "doclen_percentiles": text.DOCLEN_PERCENTILES_SQL,
        "tfidf_top_terms": text.TFIDF_TOP_TERMS_SQL,
        "dedup_exact": dedup.DEDUP_EXACT_SQL,
        "dedup_prefix": dedup.DEDUP_PREFIX_SQL,
        "word_jaccard_pairs": dedup.WORD_JACCARD_SQL,
        "minhash_lsh_pairs": dedup.MINHASH_LSH_SQL,
        "simhash64": dedup.SIMHASH64_SQL,
        "ann_topk": similarity.ANN_TOPK_SQL,
        "cosine_dup_pairs": similarity.COSINE_DUP_PAIRS_SQL,
        "label_centroid_sims": similarity.LABEL_CENTROID_SQL,
    }
