"""Physical-plan regression tests — the scale properties the engine
depends on must be visible in `explain`, not assumed:

- predicate pushdown reaches the parquet scan (PushedFilters)
- column pruning reaches the scan (ReadSchema has only needed columns)
- dimension joins broadcast (BroadcastHashJoin, never a shuffled join
  against a broadcast-sized side)
- CPU-heavy narrow inputs get re-spread (Exchange before the project)

A plan that silently loses one of these still returns correct rows at
test scale and falls over at 100x — which is exactly why these assert
on the plan text instead of the output."""

from __future__ import annotations

import re

from gmall_flink_0526_spark import plans

from .conftest import SF_SMOKE


def plan_of(spark, name: str) -> str:
    import contextlib
    import io

    df = plans.queries()[name](spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushdown_and_pruning(spark):
    p = plan_of(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m and "l_comment" not in m.group(1)  # pruned: only needed columns read
    assert "l_orderkey" not in m.group(1)


def test_dim_enrichment_broadcasts_every_dim(spark):
    p = plan_of(spark, "dim_enrichment")
    # 3 joins, each appearing in the plan tree and the detail section
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", p)) == 3  # customer, nation, region
    assert "SortMergeJoin" not in p


def test_product_stats_broadcasts_part_side(spark):
    p = plan_of(spark, "product_stats")
    assert "BroadcastHashJoin" in p
    m = re.search(r"ReadSchema: struct<(p_[^>]*)>", p)
    assert m and set(re.findall(r"(\w+):", m.group(1))) == {"p_partkey", "p_brand"}


def test_config_routing_broadcasts_config(spark):
    p = plan_of(spark, "config_routing")
    assert "BroadcastHashJoin" in p


def test_lsh_spreads_narrow_scan(spark):
    p = plan_of(spark, "dedup_minhash_lsh")
    assert "REPARTITION_BY_NUM" in p  # spread() fired for the 1-split scan


def test_cdc_delete_filter_pushes_type_filter_below_fanout(spark):
    p = plan_of(spark, "cdc_delete_filter")
    # the delete filter must sit in the same stage as the derivation,
    # before any exchange — i.e. no shuffle between scan and filter
    scan_pos = p.find("Scan parquet")
    filt = re.search(r"\(\d+\) Filter", p)
    assert scan_pos != -1 and filt is not None


def test_decontaminate_bucketed_join_and_pruned_scan(spark):
    p = plan_of(spark, "decontaminate")
    # shingle-hash equi-join, never a doc-vs-doc cartesian
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m and "source" not in m.group(1)  # scan pruned to doc_id+text


def test_simhash_near_dup_banded_equi_join(spark):
    p = plan_of(spark, "simhash_near_dup")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # verify filter (popcount) runs on candidates, not inside a loop join
    assert "bit_count" in p


def test_doc_chunking_prunes_scan(spark):
    p = plan_of(spark, "doc_chunking")
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m and set(re.findall(r"(\w+):", m.group(1))) == {"doc_id", "text"}


def test_dataset_split_partial_aggregation(spark):
    p = plan_of(spark, "dataset_split")
    # map-side combine before the exchange: two HashAggregates
    assert len(re.findall(r"\(\d+\) HashAggregate", p)) >= 2


def test_kmeans_ivf_broadcasts_probe_side(spark):
    p = plan_of(spark, "ann_topk_ivf_kmeans")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_nprobe_ivf_bucket_join_and_recall_monotone(spark):
    """Multi-probe IVF: (a) the candidate join is still the bucket
    equi-join (BroadcastHashJoin on the cluster key — widening nprobe
    must never degrade to a corpus cross join); (b) value property:
    per-probe recall@k at nprobe=2 >= recall at nprobe=1 for EVERY
    probe — the 2-probe candidate set is a superset of the 1-probe
    set, and a top-k over a superset cannot lose brute-force hits
    (any candidate that displaces a hit outranks it globally, so it
    is a hit itself)."""
    p = plan_of(spark, "ann_topk_ivf_nprobe")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    rows = plans.queries()["ann_recall_nprobe"](spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["recall_nprobe"] >= r["recall_1probe"], r


def test_decon_semantic_rungs_containment_and_monotone_recall(spark):
    """The semantic-decontamination ladder's audit must PROVE the
    containment theorem on real data: every rung's pair set is a
    subset of the exact broadcast-eval rung's (extra_pair_ct == 0 —
    a nonzero value would mean a quantized screen surfaced a pair the
    exact screen did not, impossible at one shared cosine bar), the
    exact rung misses nothing by construction, and widening the probe
    count never loses a pair (missed probe1 >= missed probe2)."""
    rows = {r["rung"]: r for r in
            plans.queries()["decon_semantic_rungs"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"probe1", "probe2", "brute"}
    for r in rows.values():
        assert r["extra_pair_ct"] == 0, r
    assert rows["brute"]["missed_pair_ct"] == 0
    assert rows["probe1"]["missed_pair_ct"] >= rows["probe2"]["missed_pair_ct"]
    assert rows["probe1"]["pair_ct"] <= rows["probe2"]["pair_ct"] <= rows["brute"]["pair_ct"]


def test_visitor_stats_late_drop_actually_drops(spark):
    """The late-drop certification is only meaningful if the drop path
    FIRED: the replayed aggregate must be missing exactly the
    earliest-hour rows (delivered two batches after the watermark
    passed their windows), so its total pv count is strictly below the
    corpus event count while every kept window matches the oracle (the
    catalog sweep checks the values; this pins non-emptiness of the
    dropped set)."""
    from gmall_flink_0526_spark.session import load_tables

    from pyspark.sql import functions as F

    out = plans.queries()["visitor_stats_late_drop"](spark, SF_SMOKE)
    kept = out.agg(F.sum("pv_ct")).collect()[0][0]
    total = load_tables(spark, SF_SMOKE, "events")["events"].count()
    assert 0 < kept < total, (kept, total)


def test_matryoshka_monotone_and_hard_negatives_banded(spark):
    """Value properties of the r15 ANN additions: (a) truncation
    recall is non-decreasing in prefix width (a wider prefix carries
    strictly more of the inner product's mass toward the full
    ranking... not a theorem per-query, but the AGGREGATE recall over
    the probe set must not invert at fixture scale — pinned
    empirically); (b) every mined hard negative sits inside the
    [HARD_NEG_LO, SEMDEDUP_T) band — a violation would leak probable
    positives into a contrastive negative set."""
    from pyspark.sql import functions as F

    from gmall_flink_0526_spark.plans.similarity import (
        HARD_NEG_LO,
        HN_K,
        MRL_DIMS,
        SEMDEDUP_T,
    )

    rec = {
        r["trunc_dim"]: r["recall"]
        for r in plans.queries()["ann_recall_matryoshka"](spark, SF_SMOKE).collect()
    }
    assert sorted(rec) == sorted(MRL_DIMS)
    assert rec[16] <= rec[32] <= 1.0
    hn = plans.queries()["hard_negative_mining"](spark, SF_SMOKE).collect()
    assert hn  # the band is populated at fixture scale
    for r in hn:
        assert HARD_NEG_LO <= r["cos_sim"] < SEMDEDUP_T, r
        assert 1 <= r["rn"] <= HN_K


def test_matryoshka_rerank_ladder_properties(spark):
    """Value THEOREMS of the two-stage MRL recipe, pinned on data (r16):
    (a) for a fixed truncation width, recall is non-decreasing in the
    re-rank pool — a wider pool's candidate set is a superset, and any
    brute-force hit inside the pool SURVIVES the full-metric top-k cut
    (at most k-1 candidates outrank a global top-k member under the
    true metric); (b) by the same argument, re-ranked recall at every
    pool >= the raw truncation recall at the same width (the pool
    contains the truncated top-k)."""
    from gmall_flink_0526_spark.plans.similarity import MRL_DIMS, MRL_RERANK_POOLS

    trunc = {
        r["trunc_dim"]: r["recall"]
        for r in plans.queries()["ann_recall_matryoshka"](spark, SF_SMOKE).collect()
    }
    ladder = {
        (r["trunc_dim"], r["pool"]): r["recall"]
        for r in plans.queries()["ann_recall_matryoshka_rerank"](
            spark, SF_SMOKE
        ).collect()
    }
    assert sorted(ladder) == sorted(
        (d, p) for d in MRL_DIMS for p in MRL_RERANK_POOLS
    )
    for d in MRL_DIMS:
        pools = sorted(MRL_RERANK_POOLS)
        for lo, hi in zip(pools, pools[1:]):
            assert ladder[(d, lo)] <= ladder[(d, hi)], (d, lo, hi)
        assert trunc[d] <= ladder[(d, pools[0])], d


def test_hard_negative_rungs_containment_and_delta_accounting(spark):
    """The nprobe mining audit's structural guarantees, pinned on data
    (r16): (a) CONTAINMENT — probe 1 is the anchor's own cell, so the
    1-probe band-candidate set is a subset of the nprobe set
    (extra_pair_ct == 0, the decon_semantic_rungs proof applied to
    mining); (b) the delta accounting is internally consistent
    (shared + lost = the 1-probe negative count; shared + gained = the
    nprobe count); (c) every displaced negative is replaced — the
    nprobe miner never returns FEWER negatives than 1-probe (its
    candidate pool is a superset, so per-anchor fill can only grow)."""
    row = plans.queries()["hard_negative_rungs"](spark, SF_SMOKE).collect()[0]
    assert row["extra_pair_ct"] == 0
    assert row["cand_nprobe_ct"] >= row["cand_1probe_ct"]
    assert row["shared_neg_ct"] + row["lost_neg_ct"] == row["neg_1probe_ct"]
    assert row["shared_neg_ct"] + row["gained_neg_ct"] == row["neg_nprobe_ct"]
    assert row["neg_nprobe_ct"] >= row["neg_1probe_ct"]


def unpartitioned_windows(p: str) -> list[str]:
    """Window nodes in a formatted plan whose partition spec is EMPTY —
    the ``WindowExec: No Partition Defined`` shape that moves its whole
    input to one task. Detection: a Window detail block's ``Arguments:``
    line carries ``[exprs], [partitionSpec], [orderSpec]``; with no
    partition it prints two bracket groups where the LAST is an order
    spec (``... NULLS FIRST/LAST``). A partitioned-but-unordered window
    also prints two groups, but its last group is a bare attribute list
    — the NULLS marker tells them apart. WindowGroupLimit nodes are a
    different (always-bounded) operator and are excluded by the exact
    node-name match."""
    out = []
    for block in p.split("\n\n"):
        lines = block.strip().splitlines()
        if not lines or not re.match(r"\(\d+\) Window$", lines[0].strip()):
            continue
        arg = next((l for l in lines if l.strip().startswith("Arguments:")), None)
        if arg is None:
            continue
        depth, groups, last = 0, [], []
        for ch in arg.split("Arguments:", 1)[1]:
            if ch == "[":
                if depth == 0:
                    last = []
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append("".join(last))
            elif depth > 0:
                last.append(ch)
        if len(groups) <= 1 or (len(groups) == 2 and "NULLS" in groups[-1]):
            out.append(arg.strip()[:160])
    return out


def test_catalog_wide_no_cartesian_no_rowwise_python(spark):
    """Catalog-wide invariants: (a) no query plans a cartesian /
    nested-loop join except the documented brute-force ANN baseline;
    (b) no row-at-a-time Python UDF anywhere (BatchEvalPython) — every
    Python stage must be Arrow-batched (ArrowEvalPython / MapInPandas /
    FlatMapGroupsInPandas); (c) no UNPARTITIONED window over
    corpus-sized input — a global rank serializes the corpus onto one
    task (the r15 dsir_hashed_agreement finding, fixed by
    partitioning.global_row_number); the only unpartitioned windows
    allowed are the documented BOUNDED-input classes below."""
    # the recall audits embed the brute-force baseline by design — the
    # audit needs the exact ranking to measure IVF/int8 recall against
    allowed_cartesian = {
        "ann_topk_bruteforce",
        "ann_topk_vectorized",
        "ann_recall_ivf",
        "ann_recall_int8",
        "ann_recall_nprobe",
        "ann_recall_pq",
        "ann_recall_pq_rerank",
        "ann_recall_ivfpq",
        # the exact decontamination rung IS the brute-force shape: the
        # benchmark-sized-by-contract eval matrix broadcast against the
        # train corpus (one linear map-side pass, the documented
        # bounded_broadcast exception), and the rung audit embeds it as
        # the truth the IVF rungs are measured against
        "decontaminate_semantic_brute",
        "decon_semantic_rungs",
        "decon_method_agreement",
        # the truncation audit embeds the brute baseline per rung —
        # probe-bounded broadcast passes, the recall-audit class
        "ann_recall_matryoshka",
        # the re-rank ladder embeds the same brute truth + per-dim
        # truncated shortlists (probe-bounded broadcast passes)
        "ann_recall_matryoshka_rerank",
    }
    # a crossJoin against a BROADCAST 1-ROW aggregate (scalar fan-in,
    # e.g. tfidf's n_docs, the mixture/histogram totals) plans as
    # BroadcastNestedLoopJoin — O(n) over one broadcast row, the
    # intended scale shape, not a real NLJ. The SemDeDup family joins
    # this class whenever its corpus-scaled k exceeds KM_LITERAL_MAX
    # (with_cluster's broadcast k-row argmin — config-sized build
    # side, partial-agged exchange); at SF_SMOKE k floors to 8 so the
    # literal path plans instead, but the allowance keeps this test
    # honest at any scale factor.
    allowed_scalar_bnlj = {
        "tfidf_top_terms",
        "domain_mixture_weights",
        "mixture_temperature",
        "vocab_coverage",
        "packing_length_histogram",
        # doc_pagerank's per-step dangling-mass scalar is a broadcast
        # 1-row crossJoin; the rank/edge joins themselves are
        # merge-hinted (asserted broadcast-free below) — same loop,
        # same scalar, for the jaccard-weighted variant
        "doc_pagerank",
        "doc_pagerank_weighted",
        # the adversarial-corpus replication (1-row broadcast text) and
        # the final scalar fan-in row are both 1-row crossJoins
        "lsh_recall_post_dedup",
        # probe_clusters fans each probe out against the broadcast
        # k-row centroid table (config-sized build side, like
        # with_cluster's large-k argmin)
        "ann_topk_ivf_nprobe",
        "ann_topk_ivfpq",
        # the RRF fusion's IVF side rides the same probe_clusters
        # broadcast centroid fan-out
        "ann_rrf_fusion",
        "embedding_cluster_stats",
        "embedding_semdedup",
        "semdedup_survivors",
        "semdedup_threshold_sweep",
        "embedding_incremental_near_dup",
        # pagerank's per-step reset term fans the broadcast 1-row
        # node-count scalar into the node table (and its 5-row
        # contrib/ranks frames ride broadcast joins by design)
        "behavior_pagerank",
        # the bigram-LM family fans two broadcast 1-row scalars: the
        # vocabulary size into the model, and (in the gate) the
        # percentile_disc threshold into the scored docs
        "ngram_lm_train",
        "ngram_lm_perplexity",
        "perplexity_filter",
        # bm25's corpus stats (n_docs, avgdl) are one broadcast row
        "bm25_topk",
        # the gap-fill grid fans the broadcast 1-row global bucket
        # bounds into the entity list (entity x bucket generation)
        "events_gapfill_locf",
        "events_gapfill_interp",
        # the semantic-decontamination family rides _fit_and_assign's
        # broadcast centroid fan-out (the embedding_semdedup class);
        # the nprobe variant adds probe_clusters' broadcast k-row
        # centroid table
        "decontaminate_semantic",
        "decontaminate_semantic_audit",
        "decontaminate_semantic_nprobe",
        # DSIR fans two broadcast 1-row scalars: the target vocabulary
        # into the scoring join, and (in the audit) the
        # percentile_disc threshold — the LM-family class
        "dsir_importance",
        "dsir_select_audit",
        # the executed hashed gate rides the same dsir_audit_output
        # percentile-threshold scalar
        "dsir_hashed_select_audit",
        # the hashed variant fans three broadcast 1-row scalars (the
        # two model totals and, in the audit, two percentile
        # thresholds); its <=B-row bucket models ride broadcast HASH
        # joins, never NLJ
        "dsir_hashed",
        "dsir_hashed_agreement",
        # the nprobe miners ride probe_clusters' broadcast k-row
        # centroid fan-out (the ann_topk_ivf_nprobe class); the rungs
        # audit additionally fans in eight broadcast 1-row counts
        "hard_negative_mining_nprobe",
        "hard_negative_rungs",
    }
    # unpartitioned windows whose INPUT is bounded by construction:
    # rank-limit heads (Spark pushes a Partial WindowGroupLimit below
    # the single-partition exchange, so the final window sees <= k rows
    # per upstream partition — asserted below), fixed-width histogram
    # grids, and the distinct-token vocabulary (model-sized,
    # corpus-sublinear under Zipf). Anything NOT listed here must rank
    # via partitioning.global_row_number instead.
    allowed_bounded_window = {
        "bpe_apply_merge",  # top-1 merge head (WindowGroupLimit-pushed)
        "bpe_merge_candidates",  # top-k candidate head (same pushdown)
        "ngram_lm_train",  # model-card head over the bigram model (same)
        "packing_length_histogram",  # cumulative sum over 256 fixed bins
        "vocab_coverage",  # rank + cumulative share over the vocabulary
    }
    skip = {
        "jdbc_round_trip",  # writes a DB as a side effect
        # runs a 2-epoch foreachBatch replay on call (the *_stream
        # class without the suffix — its name describes the K4
        # semantics, not the harness)
        "dim_schema_evolution",
        # runs a 4-batch out-of-order replay on call (the name
        # describes the W1/W2 semantic it certifies, not the harness)
        "visitor_stats_late_drop",
    }
    for name in plans.queries():
        if name.endswith("_stream") or name in skip:
            continue  # replay queries execute streams on call
        p = plan_of(spark, name)
        if name not in allowed_cartesian:
            assert "CartesianProduct" not in p, f"{name} plans a cartesian product"
            if name not in allowed_scalar_bnlj:
                assert "BroadcastNestedLoopJoin" not in p, f"{name} plans a nested-loop join"
        assert "BatchEvalPython" not in p, f"{name} uses a row-at-a-time Python UDF"
        uw = unpartitioned_windows(p)
        if name in allowed_bounded_window:
            # the head class must actually have the limit pushed BELOW
            # the window (TakeOrderedAndProject distributed head, or a
            # WindowGroupLimit rank pushdown) so the window input is
            # k-bounded; the histogram/vocab classes are bounded by
            # their grid width instead
            if name in ("bpe_apply_merge", "bpe_merge_candidates", "ngram_lm_train"):
                assert "TakeOrderedAndProject" in p or "WindowGroupLimit" in p, (
                    f"{name}: distributed-head pushdown missing — its "
                    "unpartitioned window is no longer input-bounded"
                )
        else:
            assert not uw, (
                f"{name} plans an UNPARTITIONED window over unbounded "
                f"input (single-task rank — use global_row_number): {uw}"
            )


def test_dsir_hashed_agreement_ranks_range_partitioned(spark):
    """The r15 VERDICT finding, pinned fixed: the agreement audit ranks
    two corpus-sized score frames — a global (unpartitioned) window
    would move the whole corpus to ONE task. global_row_number's shape
    instead: an explicit range repartition (REPARTITION_BY_NUM, so AQE
    never re-coalesces the routing) feeding a window PARTITIONED by
    __pid, plus CASE-mapped offsets; zero unpartitioned Window nodes
    anywhere in the plan."""
    p = plan_of(spark, "dsir_hashed_agreement")
    assert "rangepartitioning(dsir_score" in p and "REPARTITION_BY_NUM" in p
    assert "hashpartitioning(__pid" in p  # the rank window IS partitioned
    assert not unpartitioned_windows(p)


def test_perceptron_scoring_is_joinless(spark):
    """The classifier's corpus-wide scoring claim, pinned: the fit's
    centering stats and weights enter the plan as LITERALS (bounded
    collects at build time), so the filter/agreement queries are pure
    map-side expression work + one map-side-combinable grouped count —
    no join of any kind, at any corpus size. The train query itself is
    the collected model card (a LocalTableScan)."""
    for name in ("quality_perceptron_filter", "quality_perceptron_agreement"):
        p = plan_of(spark, name)
        assert "Join" not in p, f"{name}: scoring must be joinless"
        assert len(re.findall(r"\(\d+\) HashAggregate", p)) >= 2, (
            f"{name}: grouped count must partial-aggregate"
        )
    pt = plan_of(spark, "quality_perceptron_train")
    assert "LocalTableScan" in pt or "Scan ExistingRDD" in pt


def test_chunk_dedup_partial_aggregation(spark):
    """chunk_dedup's digest groupBy must map-side combine: two
    HashAggregates around one Exchange — at 100 TB the chunk fan-out
    (docs x windows) collapses before it ever shuffles."""
    p = plan_of(spark, "chunk_dedup")
    assert len(re.findall(r"\(\d+\) HashAggregate", p)) >= 2


def test_gate_funnel_shipped_equals_corpus_build(spark):
    """The funnel's terminal 'shipped' row must count exactly the docs
    corpus_build ships, and its gate rows must partition the corpus:
    the two queries share one gate definition (_gate_frames), so any
    drift between report and build is a bug in the shared frames."""
    qs = plans.queries()
    funnel = {r["gate"]: (r["n_docs"]) for r in qs["corpus_gate_funnel"](spark, SF_SMOKE).collect()}
    built = qs["corpus_build"](spark, SF_SMOKE).count()
    from gmall_flink_0526_spark.session import load_tables

    n_docs = load_tables(spark, SF_SMOKE, "documents")["documents"].count()
    assert funnel.get("shipped", 0) == built
    assert sum(funnel.values()) == n_docs  # every doc charged exactly once


def test_corpus_build_scan_pruning(spark):
    """The end-to-end corpus build reads only (doc_id, text) from the
    documents scan and (vec_id, embedding) from the embeddings scan
    (the r15 semantic gate) — gates and dedup derive everything
    else."""
    p = plan_of(spark, "corpus_build")
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", p):
        cols = set(re.findall(r"(\w+):", m.group(1)))
        assert cols <= {"doc_id", "text"} or cols <= {"vec_id", "embedding"}, (
            f"unpruned scan: {cols}"
        )


def test_media_ann_topk_is_bucketed_not_cartesian(spark):
    """Media similarity must candidate-generate through the modality
    equi-join (broadcast probes), never a cross join over the corpus."""
    p = plan_of(spark, "media_ann_topk")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_value_percentiles_single_exchange(spark):
    """Percentile rollup = one shuffle on the group key; a second
    exchange would mean the sort-aggregate lost its partial phase."""
    p = plan_of(spark, "value_percentiles")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1


def test_bpe_merge_candidates_distributed_head_and_partial_agg(spark):
    """The BPE pair count must keep its head distributed
    (TakeOrderedAndProject: per-partition top-N + driver merge, never
    a vocabulary-wide single-partition sort) and its count shuffle
    partial-aggregated map-side."""
    p = plan_of(spark, "bpe_merge_candidates")
    assert "TakeOrderedAndProject" in p
    assert len(re.findall(r"HashAggregate", p)) >= 2  # partial + final


def test_bpe_train_loop_learns_nested_merges(spark):
    """The N-round trainer's composition property (r10 VERDICT #3): at
    least one later round's learned pair must CONTAIN an earlier
    round's merged symbol (round r learned (ma, mb) => symbol ma+mb
    exists from round r+1 on) — the observable proof that each round
    learns over the previous round's rewrite, not the raw vocab.
    Rounds must also be 1..N with positive counts."""
    from gmall_flink_0526_spark.plans.catalog import queries
    from gmall_flink_0526_spark.plans.text import BPE_LOOP_ROUNDS

    rows = sorted(
        (r["round"], r["pair"], r["ct"])
        for r in queries()["bpe_train_loop"](spark, SF_SMOKE).collect()
    )
    assert [r for r, _, _ in rows] == list(range(1, BPE_LOOP_ROUNDS + 1))
    assert all(ct > 0 for _, _, ct in rows)
    merged_syms: set[str] = set()
    nested = False
    for _, pair, _ in rows:
        ma, mb = pair.split("|")
        nested = nested or ma in merged_syms or mb in merged_syms
        merged_syms.add(ma + mb)
    assert nested, f"no round learned a pair containing an earlier merge: {rows}"


def test_dim_enrichment_asof_is_union_fill_not_range_join(spark):
    """Point-in-time enrichment must plan as asof_join's sorted-union
    window fill: NO join operator between facts and dim history (a
    range-predicate join would fan a hot customer out facts x
    versions), exactly one window partitioned by the as-of key, and
    no cartesian anywhere. The dim-history LEAD window rides its own
    small exchange on the change stream — that one is expected."""
    p = plan_of(spark, "dim_enrichment_asof")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert "Union" in p and "Window" in p
    assert re.search(r"hashpartitioning\(custkey", p)


def test_funnel_attribution_is_chained_union_fill(spark):
    """The 3-stage attribution chain must plan as TWO asof_join
    sorted-union fills — no join operator anywhere (a range-predicate
    join would fan a hot user out stage x stage), both fills'
    exchanges hashed on user_id, no cartesian."""
    p = plan_of(spark, "funnel_attribution")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert len(re.findall(r"\(\d+\) Window", p)) == 2  # one per chained link
    assert re.search(r"hashpartitioning\(user_id", p)


def test_incremental_dedup_stream_stores_broadcast_batch_side(spark, tmp_path):
    """The cross-corpus candidate join inside the incremental dedup app
    must broadcast the BATCH side — shuffling the corpus signature
    store is the shape that dies at corpus scale. Asserted on the
    app's own plan via a one-epoch run with an existing store."""
    import os

    from pyspark.sql import functions as F

    from gmall_flink_0526_spark.operators import dedup as D
    from gmall_flink_0526_spark.session import load_tables

    docs = load_tables(spark, SF_SMOKE, "documents")["documents"].select("doc_id", "text")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    sh = D.doc_shingles(half, "doc_id", "text")
    bands = D.lsh_band_keys(sh)
    store = str(tmp_path / "sig_bands")
    bands.write.mode("overwrite").parquet(os.path.join(store, "epoch=0"))
    corp = spark.read.parquet(store).drop("epoch")
    new_bands = D.lsh_band_keys(D.doc_shingles(docs.filter(F.col("doc_id") % 2 == 1), "doc_id", "text"))
    cross = D.lsh_candidates_against(F.broadcast(new_bands), corp)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cross.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p


def test_local_supplier_volume_pushdown_no_cartesian(spark):
    """TPC-H Q5 twin: the order-date range must reach the orders scan
    and the 6-table chain must plan equi-joins only."""
    p = plan_of(spark, "local_supplier_volume")
    assert "GreaterThanOrEqual(o_orderdate" in p and "LessThan(o_orderdate" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_duplicate_ngram_coverage_prunes_scan(spark):
    """The inverted-index coverage signal reads only (doc_id, text)
    for the shingle side — text payloads never ride the shuffle."""
    p = plan_of(spark, "duplicate_ngram_coverage")
    m = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    assert m and all("n_chars" not in g and "lang" not in g for g in m)


def test_embedding_semdedup_no_cartesian(spark):
    """SemDeDup's within-cluster join must stay an equi-join on the
    cluster id (plus the capped representative union) — never a
    cross join over the corpus."""
    p = plan_of(spark, "embedding_semdedup")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_ngram_jaccard_pairs_sourcekeyed_no_cartesian(spark):
    """The source-blocked pairwise query must plan the rep-capped
    self-join as an equi-join hashed on the source key — the window
    that computes occupancy + representative shares that same
    partitioning, and no cartesian ever appears."""
    p = plan_of(spark, "ngram_jaccard_pairs")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "hashpartitioning(source" in p  # cap window + self-join key


def test_dup_coverage_histogram_prunes_scan(spark):
    """The coverage audit reads only (doc_id, text); provenance and
    size columns never reach the shuffle."""
    p = plan_of(spark, "dup_coverage_histogram")
    ms = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    assert ms and all("n_chars" not in g and "lang" not in g and "source" not in g for g in ms)


def test_with_cluster_join_path_partial_aggregates(spark):
    """Past KM_LITERAL_MAX the assignment is a broadcast k-row
    nested-loop (the intended O(n·k) map-side scoring — same class as
    the allowed scalar fan-ins) and the argmin is a grouped min that
    MUST partial-aggregate: two HashAggregates around the exchange,
    so the shuffle carries one row per vector, never n·k."""
    import contextlib
    import io

    import numpy as np

    from gmall_flink_0526_spark.operators import similarity as sim

    rng = np.random.default_rng(9)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    cents = [(c, [float(x) for x in rng.normal(0, 1, 8)]) for c in range(40)]
    assert len(cents) > sim.KM_LITERAL_MAX
    df = sim.with_cluster(emb, "embedding", cents)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in p  # broadcast k-row scoring
    # partial min BEFORE the exchange (struct-with-payload min plans
    # as SortAggregate), final min after — one exchanged row per vector
    assert "partial_min(struct(_kd" in p
    assert len(re.findall(r"\(\d+\) (?:Sort|Hash)Aggregate", p)) >= 2
    assert "CartesianProduct" not in p


def test_decontaminate_fuzzy_broadcasts_eval_side(spark):
    """The near-match decontamination joins the train-side band table
    map-side against the BROADCAST eval bands (bounded-benchmark
    contract): the candidate join must be a BroadcastHashJoin — the
    train side keeps its incoming partitioning — with no cartesian and
    no sort-merge anywhere in the plan."""
    p = plan_of(spark, "decontaminate_fuzzy")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") >= 2  # hot-stats cap + eval candidates


def test_decontaminate_bloom_probes_map_side(spark):
    """The Bloom screen must cost the train side NOTHING in shuffles:
    every word-probe join is a BroadcastHashJoin against the packed
    word table (sized by the eval side only — ~half a row per eval
    gram), the train shingle stream keeps its incoming partitioning up
    to the candidate filter, and nothing in the plan is a cartesian.
    Only bloom-positive shingles may reach the exact verification
    join."""
    p = plan_of(spark, "decontaminate_bloom")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert p.count("BroadcastHashJoin") >= 3  # one per bloom hash probe
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m and set(re.findall(r"(\w+):", m.group(1))) == {"doc_id", "text"}


def test_heavy_hitters_cms_sketch_plan(spark):
    """CMS audit: the exact top-k must plan as TakeOrderedAndProject
    (per-partition head + driver merge, never a vocabulary-wide
    single-partition sort), the probe join must broadcast the
    constant-size counter grid, and the counter build must partial-
    aggregate map-side (two HashAggregates around its exchange)."""
    p = plan_of(spark, "heavy_hitters_cms")
    assert "TakeOrderedAndProject" in p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert len(re.findall(r"\(\d+\) HashAggregate", p)) >= 2


def test_doc_pagerank_loop_is_broadcast_free(spark):
    """The corpus-vertex PageRank loop must SHUFFLE the rank table
    into a merge join each step, never broadcast it (r11 VERDICT #2:
    at 100 TB the rank table is corpus-sized; a plan that depends on
    it fitting in an executor is wrong even when test SF would allow
    it). Asserted on the operator with trivially-derived inputs so
    the plan shows ONLY the loop (the catalog query's full plan also
    carries the prefix-filter edge DERIVATION, whose own broadcasts
    are legitimate and separately asserted); the final iteration is
    left un-checkpointed for exactly this visibility. Both the
    contrib join and the rank-update left join must be SortMergeJoin;
    the only broadcast is the 1-row dangling-mass scalar
    (BroadcastNestedLoopJoin, not Hash)."""
    import contextlib
    import io

    from gmall_flink_0526_spark.operators.graph import pagerank_partitioned

    nodes = spark.range(64).selectExpr("id as node")
    edges = spark.range(32).selectExpr(
        "id as src", "(id + 1) % 32 as dst", "1 as w"
    )
    df = pagerank_partitioned(nodes, edges, iters=2, num_partitions=4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastHashJoin" not in p, "rank loop must not broadcast-join"
    assert len(re.findall(r"SortMergeJoin", p)) >= 2
    assert "CartesianProduct" not in p


def test_funnel_attribution_4_is_chained_union_fill(spark):
    """The generalized K-link chain keeps the 3-stage plan shape at
    K=4: THREE asof_join sorted-union fills (one Window per link), no
    join operator anywhere, exchanges hashed on user_id."""
    p = plan_of(spark, "funnel_attribution_4")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert len(re.findall(r"\(\d+\) Window", p)) == 3  # one per chained link
    assert re.search(r"hashpartitioning\(user_id", p)


def test_ngram_lm_train_distributed_head_and_partial_agg(spark):
    """The bigram-model head must stay a distributed top-k
    (TakeOrderedAndProject) and the model's count shuffles must
    partial-aggregate map-side; the documents scan reads only the two
    columns the fit needs."""
    p = plan_of(spark, "ngram_lm_train")
    assert "TakeOrderedAndProject" in p
    assert len(re.findall(r"HashAggregate", p)) >= 2  # partial + final
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m and "lang" not in m.group(1) and "n_chars" not in m.group(1)


def test_perplexity_filter_no_global_sort(spark):
    """The gate's median threshold is a sort-based AGGREGATE (grouped
    percentile_disc), never a corpus-wide Sort+Window; the scoring
    join must be an equi-join on the bigram key (no cartesian beyond
    the two broadcast 1-row scalars)."""
    p = plan_of(spark, "perplexity_filter")
    assert "CartesianProduct" not in p
    assert "Window" not in p  # threshold is an aggregate, not a ranked scan


def test_ivfpq_bucketed_codes_join_not_cartesian(spark):
    """IVF-PQ serving: the corpus-side score must be an equi-join of
    the code table against the broadcast probe LUT on (c0, j, c) —
    bucket-sized integer scans, never a corpus cartesian and never a
    float-vector read of the corpus at query time (scan pruning: the
    code table join needs no embedding column)."""
    p = plan_of(spark, "ann_topk_ivfpq")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p  # LUT + codebook joins broadcast


def test_decon_bloom_width_derives_from_gram_index_bit_identical(spark):
    """r17: decon_bloom_bits counts eval grams from the shared gram
    index instead of re-shingling the eval slice. The width contract
    (bloom_width of the operator's own eval_gram_count) must hold
    bit-identically, or the memoized width drifts from what
    bloom_decontaminate would self-derive."""
    from pyspark.sql import functions as F

    from gmall_flink_0526_spark.operators import dedup as D
    from gmall_flink_0526_spark.plans.llmprep import (
        DECON_NGRAM,
        EVAL_MOD,
        decon_bloom_bits,
    )
    from gmall_flink_0526_spark.session import load_tables

    t = load_tables(spark, SF_SMOKE, "documents")
    direct = D.bloom_width(
        D.eval_gram_count(
            t["documents"], F.col("doc_id") % EVAL_MOD == 0, ngram=DECON_NGRAM
        )
    )
    assert decon_bloom_bits(spark, SF_SMOKE) == direct
