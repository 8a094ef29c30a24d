"""The query catalog — the engine's public query surface.

Each :class:`QuerySpec` pairs a Spark implementation (a callable
``(spark, sf_dir) -> DataFrame``) with an equivalent DuckDB oracle SQL
string over the same parquet tables. The driver (and our own tests) run
both and compare row count, schema and an order-insensitive value hash
— so every computed column is aliased identically on both sides, and
floating aggregates are accumulated exactly (cast to DECIMAL before
SUM) then rounded, making the two engines bit-identical.

Specs register themselves via :func:`register`; the query modules in
this package populate the catalog at import time.
"""

from __future__ import annotations

import functools

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..operators.cache import release_scoped


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


CATALOG: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable:
    """Decorator: add a query implementation to the catalog.

    The registered callable releases the previous query's scoped
    caches first (see ``operators.cache``), so cached intermediates
    never accumulate across a many-query session.
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_scoped()
            return fn(spark, sf_dir)

        CATALOG[name] = QuerySpec(name=name, fn=wrapped, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in CATALOG.items() if spec.oracle}


_LOADED = False

# Catalog order is external-certification order: the round driver's
# correctness gate checks roughly the first 50 registered queries.
# ROTATION POLICY (round 4 on): each round the window holds (a) every
# query whose semantics or implementation changed this round, (b) every
# new query, then (c) as many of the oldest-green queries as fit —
# changed code is always re-proven the round it changes. When new +
# changed queries crowd out part of the oldest-green set (round 5:
# ten new queries), the displaced queries move to the documented
# overflow block below, lead the NEXT round's window, and are covered
# this round by (1) the full sf0.001 oracle sweep in pytest and
# (2) an in-repo full-catalog run of the driver-style gate at sf0.01
# (`tools/vanilla_gate.py`, result recorded in BASELINE.md) — so no
# query ever stands on an unchecked stale row, even past the window.
_PRIORITY = (
    # -- r10 rotation, per the r9 VERDICT's prescription. Lead: the 21
    #    queries whose last driver-recorded green is r6 (they didn't
    #    fit the r9 window). ---------------------------------------------
    "is_new_fix",
    "bounce_stats",
    "session_stats",
    "visitor_stats_union",
    "log_explode_displays",
    "cdc_delete_filter",
    "jdbc_round_trip",
    "embedding_norm_stats",
    "rhp_signature",
    "ann_topk_rhp",
    "keyword_stats",
    "keyword_stats_cjk",
    "media_resize_audit",
    "media_features_head",
    "order_wide_stream",
    "dataset_split",
    "doc_chunking",
    "pii_scrub",
    "repetition_ratio",
    "stratified_sample",
    "dup_coverage_histogram",
    # -- then the 10 corpus-cache queries whose plans changed in r9
    #    (their last driver row predates that refactor); the two
    #    incremental streams ALSO changed this round (the per-epoch
    #    drain now rides a stream-owned cache_scope token). -------------
    "dedup_incremental",
    "dedup_incremental_stream",
    "embedding_incremental_near_dup",
    "embedding_incremental_stream",
    "embedding_cluster_stats",
    "embedding_semdedup",
    "semdedup_threshold_sweep",
    "semdedup_survivors",
    "ann_topk_ivf_kmeans",
    "ann_recall_ivf",
    # -- NEW in r10: point-in-time dim enrichment (scd2_from_changes +
    #    asof_join, DuckDB ASOF oracle) + its temporal_enrich streaming
    #    twin; the streaming Bloom decontamination twin (or-merged
    #    epoch store); the histogram-quantile sketch audit + its
    #    epoch-store streaming twin; BPE merge-candidate induction;
    #    the chi-square distribution-drift audit. -----------------------
    "dim_enrichment_asof",
    "dim_enrichment_asof_stream",
    "decontaminate_bloom_stream",
    "quantile_histogram_audit",
    "quantile_sketch_stream",
    "bpe_merge_candidates",
    "value_drift_chi2",
    "bpe_apply_merge",
    # -- CHANGED in r10: asof_join moved to the struct-packed NULL-safe
    #    fill (asof_click_attribution; dim_enrichment_asof above);
    #    temporal_join derives its types from the input schema
    #    (asof_click_stream); the exact-decontamination eval slice
    #    densified to DECON_NGRAM=4 / EVAL_MOD=7 (decontaminate and
    #    every query compiled from those constants); the CMS oracle's
    #    est CTE went LEFT JOIN + COALESCE 0 (both heavy_hitters). ------
    "asof_click_attribution",
    "asof_click_stream",
    "decontaminate",
    "decontaminate_bloom",
    "decon_eval_coverage",
    "corpus_build",
    "corpus_gate_funnel",
    "heavy_hitters_cms",
    "heavy_hitters_stream",
    # -- oldest-green fill to ~50: head of the block whose last driver
    #    row is r7/r8. The window cut lands mid-list; everything below
    #    is covered this round by the full sf0.001 pytest sweep and the
    #    in-repo full-catalog vanilla gate at sf0.01 (BASELINE.md §r10).
    "payment_wide_stream",
    "json_dead_letter",
    "cdc_envelope_parse",
    "token_stats",
    "tfidf_top_terms",
    "dedup_exact",
    "simhash_fingerprint",
    "doc_fingerprint",
    "lang_id",
    "quality_score",
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "embedding_near_dup",
    "dedup_minhash_lsh",
    "ngram_jaccard_pairs",
    "dedup_clusters",
    "dedup_survivors",
    "dedup_token_retention",
    "near_dup_rate_by_source",
    "minhash_estimate_audit",
    "dedup_method_agreement",
    "simhash_near_dup",
    "rhp_near_dup",
    "decontaminate_fuzzy",
    "order_wide_join",
    "payment_wide_join",
    "dim_enrichment",
    "product_stats",
    "product_stats_approx",
    "local_supplier_volume",
    "log_split_stream",
    "value_percentiles",
    "funnel_conversion",
    "retention_cohorts",
    "cdc_materialize",
    "lsh_bucket_audit",
    "duplicate_ngram_coverage",
    "ann_topk_vectorized",
    "embedding_coverage",
    # -- freshest: everything the r9 driver window certified green in
    #    CORRECTNESS_r09, r9 order preserved (r6-block head, then the
    #    r5-stale set, then the r9-new set minus the ones moved to the
    #    r10-changed block above). --------------------------------------
    "pricing_summary",
    "province_stats",
    "record_merge",
    "date_derive",
    "snake_to_camel",
    "shipping_priority",
    "sales_rollup",
    "order_status_overlap",
    "returnflag_pivot",
    "top_parts_per_brand",
    "sql_entry",
    "order_status_stats",
    "top_revenue_orders",
    "sales_cube",
    "log_split_counts",
    "config_routing",
    "visitor_stats_hourly",
    "uv_first_visit",
    "embedding_quantize",
    "ann_recall_int8",
    "lang_id_confusion",
    "media_catalog",
    "media_decode",
    "media_frame_sample",
    "media_ann_topk",
    "uv_first_visit_stream",
    "is_new_fix_stream",
    "bounce_stats_stream",
    "session_stats_stream",
    "visitor_stats_stream",
    "base_db_stream",
    "doc_quality_gate_stream",
    "sequence_packing",
    "chunk_dedup",
    "domain_mixture_weights",
    "packing_length_histogram",
    "ann_topk_ivf_nprobe",
    "ann_recall_nprobe",
    "vocab_coverage",
    "mixture_temperature",
    "rolling_value_7d",
    "scd2_order_history",
)


def _ensure_loaded() -> None:
    """Import every query module exactly once (they self-register),
    then move the not-yet-driver-certified queries to the front of the
    (insertion-ordered) catalog dict."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        warehouse,
        logs,
        cdc,
        dedup,
        similarity,
        text,
        multimodal,
        replay,
        llmprep,
    )

    ordered = {n: CATALOG[n] for n in _PRIORITY if n in CATALOG}
    ordered.update((n, s) for n, s in CATALOG.items() if n not in ordered)
    CATALOG.clear()
    CATALOG.update(ordered)
    _LOADED = True
