"""Corpus quality-audit job: one JSON report from the audit operators.

    python tools/run_audit.py --sf-dir /root/testdata/sf0.001 \
        --out /tmp/audit [--num-cpus N]

Composes the registry's audit-family queries into the single artifact a
data owner reviews before a training run: language mix, document-length
percentiles, spend concentration (exact Gini), weekday skew (chi-square),
monotonic value trends (Mann-Kendall), seasonal-naive forecast error,
price-quantile sketch, distinct-user sketches, Benford first-digit
conformance, lang-source independence (chi-square) and diversity
(Simpson), Zipf rank-frequency, OOV vocabulary coverage, self-repetition
bands, MASE forecastability, Page-Hinkley drift, record-days trend, token-mass Gini, tokenizer
fairness, FD schema audit, weekend KS drift, weekly spectral line, SAX
motifs, bounce rate, Huffman code budget, MinHash calibration, dup token
inflation, cross-lingual vocab overlap and hash-ring balance — every payload is the
hash-exact output of a SQL-oracled `queries()` entry, so the report
inherits the registry's correctness gate.

Publish is atomic (temp file + rename, the run_curation pattern) and the
job resumes by lineage: re-running with the same --out and unchanged
inputs returns the existing report with ``"skipped": true``.  All payloads
are bounded (per-type / per-status / per-quantile rows), so the report
stays a few KB at any corpus size — this job never materializes corpus
rows on the driver.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

#: registry entries composed into the report — every one SQL-oracled,
#: every output bounded (types × small constants)
AUDIT_QUERIES = (
    "lang_dist",
    "doclen_percentiles",
    "gini_by_status",
    "dow_chisq_by_type",
    "mann_kendall_by_type",
    "seasonal_error_by_type",
    "ddsketch_price_quantiles",
    "hll_users_per_type",
    # session-8 audit family
    "benford_audit",
    "chi2_lang_source",
    "simpson_diversity_by_lang",
    "zipf_check",
    "oov_rate",
    "selfrep_hist",
    "mase_weekly",
    "page_hinkley_by_type",
    "record_days_by_type",
    "t_closeness_audit",
    # session-9 audit family (all bounded: O(1) rows, O(|langs|^2),
    # O(types x 27), O(bins))
    "token_gini",
    "bytes_per_token_by_lang",
    "fd_discovery",
    "weekend_effect_ks",
    "dft_weekly_power",
    "sax_motifs_by_type",
    "bounce_rate",
    "huffman_code_lengths",
    "minhash_jaccard_calibration",
    "dup_token_inflation",
    "lang_vocab_jaccard",
    "hash_ring_balance",
    "cms_calibration",
    "hll_calibration",
    "ddsketch_calibration",
    "bloom_calibration",
    "user_activity_outliers",
    "effective_vocab",
    "quantile_norm_chars",
    "simpson_paradox_qty_discount",
    "session_cross_lift",
    "fd_discovery2",
    # session-10 audit family (all bounded: O(strata), O(72), O(types),
    # O(2x2), O(pairs), O(1))
    "ate_discount_strata",
    "ind_discovery",
    "dp_count_by_type",
    "cv_mse_by_type",
    "conformal_value_bounds",
    "zonemap_prune_audit",
    "churn_baseline_confusion",
    "type_overlap_exact",
    "effective_diameter",
    "burst_viterbi_by_type",
    "lz_complexity_by_type",
    "voptimal_histogram",
)


def _records(res) -> list[dict]:
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    df = df.reindex(sorted(df.columns), axis=1)
    rows = df.to_dict(orient="records")
    return sorted(rows, key=lambda r: json.dumps(r, default=str, sort_keys=True))


def audit(sf_dir: str, out_dir: str) -> dict:
    """Import-safe library entry (owns no Ray session); returns the
    report dict."""
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    tables = ("documents", "events", "orders", "lineitem")
    lineage = {
        "sf_dir": os.path.abspath(sf_dir),
        "input_rows": {
            t: pq.read_metadata(f"{sf_dir}/{t}.parquet").num_rows
            for t in tables
        },
        "audits": list(AUDIT_QUERIES),
    }
    rpath = os.path.join(out_dir, "report.json")
    if os.path.exists(rpath):
        with open(rpath) as f:
            old = json.load(f)
        if old.get("complete") and {
            k: old.get(k) for k in ("sf_dir", "input_rows", "audits")
        } == lineage:
            old["skipped"] = True
            return old

    t0 = time.time()
    qs = entrymod.queries()
    payloads = {}
    for name in AUDIT_QUERIES:
        payloads[name] = _records(qs[name](sf_dir))

    report = dict(lineage)
    report.update(
        {
            "complete": True,
            "payloads": payloads,
            "wall_s": round(time.time() - t0, 2),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    tmp = rpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(report, f, indent=1, default=str)
    os.rename(tmp, rpath)
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    report = audit(args.sf_dir, args.out)
    digest = {
        k: report[k] for k in ("sf_dir", "complete", "wall_s")
    }
    digest["skipped"] = report.get("skipped", False)
    digest["n_payloads"] = len(report.get("payloads", {}))
    print(json.dumps(digest))
    ray.shutdown()


if __name__ == "__main__":
    main()
