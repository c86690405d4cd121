"""Driver-contract invariants for __ray_entry__: registry consistency, the
family-interleaved sampling order, and the entry() smoke shape."""

import importlib.util


def _load():
    spec = importlib.util.spec_from_file_location(
        "ray_entry", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_registry_consistency():
    m = _load()
    q, o = m.queries(), m.oracle_sql()
    # every oracle names a registered query; names are unique by dict nature
    assert not set(o) - set(q)
    # rows-only set stays small and intentional
    rows_only = set(q) - set(o)
    assert rows_only == {
        "compression_ratio", "extract_spans", "extract_object_stats",
        "frame_sample", "media_features", "media_resize",
        "media_dhash", "media_phash_pairs", "media_phash_clusters",
        "pq_topk", "bpe_fertility",
        "media_text_context", "search_targets_count",
        "logreg_train", "calibration_bins",
        "als_factorize", "plsa_topics",
    }  # round-5: stable_assignment + bt_supplier_strengths moved to oracled
    # interleave keeps every entry exactly once
    assert len(q) == len(set(q))


def test_queries_prefix_samples_every_family():
    """The driver snapshot may cap at a prefix (r2: first 50); the
    round-robin interleave must put every function family inside any
    reasonable cap."""
    m = _load()
    q = m.queries()
    first50 = list(q)[:50]
    fams = {q[n].__module__.rsplit(".", 1)[-1] for n in first50}
    all_fams = {fn.__module__.rsplit(".", 1)[-1] for fn in q.values()}
    assert fams == all_fams, (fams, all_fams)


def test_entry_smoke(ray_session):
    m = _load()
    res = m.entry()
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) > 0
    assert list(df.columns) == ["doc_id", "n_pages", "n_spans_in", "n_errors"]
