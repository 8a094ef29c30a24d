"""Hot-bucket guard for LSH candidate generation (MinHash + SimHash).

An LSH bucket shared by m documents yields m*(m-1)/2 candidate pairs;
AQE parallelizes that work but cannot shrink it, so boilerplate band
keys are CAPPED before the candidate self-join: a hot bucket
contributes only its m-1 (min-id representative, member) pairs —
linear cost, and a bucket of 200+ NEAR-duplicates (not exact copies)
still dedups against the representative instead of silently passing
through. These tests synthesize a boilerplate corpus and assert the
cap fires, bounds the pair count, and keeps the representative pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_flink_0526_spark.operators import dedup as D

N_BOILER = 250  # > MAX_BUCKET=200, so the cap must fire
BOILER = "terms of service all rights reserved cookie policy navigation home about " * 3


def _corpus(spark):
    rows = [(i, BOILER) for i in range(N_BOILER)]
    rows += [
        (1000, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (1001, "the quick brown fox jumps over the lazy dog near the river bank now"),
        (1002, "completely unrelated text about spark execution plans and shuffles here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_cap_collapses_boilerplate_bucket_to_rep_pairs(spark):
    sh = D.doc_shingles(_corpus(spark), "doc_id", "text").persist()
    try:
        bands = D.lsh_band_keys(sh).persist()
        uncapped = {
            (r["doc_a"], r["doc_b"])
            for r in D.lsh_pairs_from_bands(bands, max_bucket=None).collect()
        }
        capped = {
            (r["doc_a"], r["doc_b"]) for r in D.lsh_pairs_from_bands(bands).collect()
        }
        # without the guard the boilerplate bucket is quadratic
        assert len(uncapped) >= N_BOILER * (N_BOILER - 1) // 2
        # with it, the hot bucket collapses to its m-1 representative
        # pairs (rep = min id = 0) and every honest-bucket pair
        # survives — the cap bounds the work without eating signal
        rep_pairs = {(0, i) for i in range(1, N_BOILER)}
        honest = {(a, b) for a, b in uncapped if a >= 1000 and b >= 1000}
        assert capped == honest | rep_pairs
        bands.unpersist()
    finally:
        sh.unpersist()


def test_exact_dedup_still_catches_capped_boilerplate(spark):
    # the documents the cap skips are exact duplicates by construction —
    # the designated catcher (hash-groupBy / chunk_dedup) still sees them
    ex = D.exact_dedup(_corpus(spark), "text", "doc_id")
    boiler_row = ex.filter(F.col("dup_ct") == N_BOILER).collect()
    assert len(boiler_row) == 1 and boiler_row[0]["keeper_id"] == 0


def test_incremental_cap_is_corpus_side_and_overlap_bounded(spark):
    docs = _corpus(spark)
    sh = D.doc_shingles(docs, "doc_id", "text").persist()
    try:
        bands = D.lsh_band_keys(sh).persist()
        # batch = one boilerplate doc + one honest near-dup probe
        batch_b = bands.filter(F.col("doc_id").isin(0, 1001))
        corp_b = bands.filter(~F.col("doc_id").isin(0, 1001))
        uncapped = {
            (r["doc_a"], r["doc_b"])
            for r in D.lsh_candidates_against(batch_b, corp_b, max_bucket=None).collect()
        }
        capped = {
            (r["doc_a"], r["doc_b"])
            for r in D.lsh_candidates_against(batch_b, corp_b).collect()
        }
        # uncapped: the boilerplate doc hits every stored boilerplate copy
        assert len(uncapped) >= N_BOILER - 1
        # capped: the hot CORPUS bucket keeps only its min-id
        # representative row (doc 1), so the batch's boilerplate doc
        # still pairs against it — batch x 1 instead of batch x m —
        # and candidates through honest corpus buckets survive
        assert capped == {(a, b) for a, b in uncapped if b >= 1000} | {(0, 1)}
        bands.unpersist()
    finally:
        sh.unpersist()


def test_rhp_cap_drops_dense_cluster_bucket(spark):
    # a dense embedding cluster (250 near-identical vectors) lands on
    # one RHP band signature per band -> quadratic candidates; the cap
    # drops those buckets while honest sparse-bucket pairs survive
    from gmall_flink_0526_spark.operators import similarity as S

    import numpy as np

    rng = np.random.default_rng(3)
    # exactly identical vectors (re-embedded duplicate content): all 250
    # share every band signature, so every cluster bucket is hot. Noise
    # would flip borderline sign bits and shed sub-cap variant buckets —
    # a legitimate escape, but not what this test pins.
    base = [float(x) for x in rng.normal(0, 1, 16)]
    rows = [(i, base) for i in range(250)]
    # two honest near-identical outliers + scattered vectors
    out = rng.normal(0, 1, 16) * -1.0
    rows += [(1000, [float(x) for x in out]), (1001, [float(x) for x in out * 1.01])]
    rows += [(1100 + i, [float(x) for x in rng.normal(0, 1, 16)]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sigs = S.rhp_band_sigs(emb, dim=16).persist()
    try:
        uncapped = {
            (r["vec_a"], r["vec_b"])
            for r in S.rhp_candidate_pairs(sigs, max_bucket=None).collect()
        }
        capped = {
            (r["vec_a"], r["vec_b"])
            for r in S.rhp_candidate_pairs(sigs, max_bucket=200).collect()
        }
        assert len(uncapped) >= 250 * 249 // 2  # quadratic without the guard
        # the dense cluster collapses to its min-id representative's
        # pairs: every hot-bucket candidate has the rep (vec 0) on the
        # left — with only 2^rows possible band values a couple of
        # scattered vectors also collide into the hot bucket and pair
        # against the rep (the cosine verify downstream rejects them).
        # Every pair whose vecs sit in honest (sub-cap) buckets
        # survives — (1000, 1001) collide somewhere because they are
        # near-identical
        cluster_pairs = {(a, b) for a, b in capped if a < 1000 or b < 1000}
        assert {(0, i) for i in range(1, 250)} <= cluster_pairs
        assert all(a == 0 for a, _ in cluster_pairs)
        assert (1000, 1001) in capped
    finally:
        sigs.unpersist()


def test_simhash_cap_collapses_boilerplate_bucket_to_rep_pairs(spark):
    docs = _corpus(spark)
    fp = D.simhash(docs, "doc_id", "text", bits=32).persist()
    try:
        uncapped = D.simhash_near_dup_pairs(fp, bits=32, max_hamming=3, bands=4, max_bucket=None)
        capped = D.simhash_near_dup_pairs(fp, bits=32, max_hamming=3, bands=4)
        # identical docs share a fingerprint -> one quadratic bucket per band
        assert uncapped.count() >= N_BOILER * (N_BOILER - 1) // 2
        # the hot bucket keeps its representative pairs (0, i) at
        # Hamming 0 — identical fingerprints verify trivially
        boiler = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in capped.filter(F.col("doc_a") < 1000).collect()
        }
        assert boiler == {(0, i, 0) for i in range(1, N_BOILER)}
    finally:
        fp.unpersist()


def test_mutated_boilerplate_block_dedups_to_one_representative(spark, tmp_path):
    """The cap's semantic hole, closed: a block of 250 NEAR-duplicate
    (non-identical — each copy carries a unique trailing token) docs
    exceeds MAX_BUCKET, so the old drop-style cap would have skipped
    candidate generation entirely and exact dedup could not catch the
    mutated copies — 250 survivors. With representative capping, every
    member pairs against the hot bucket's min-id rep (verified empiric
    fixture: all 4 band buckets are hot with rep 0 and every doc sits
    in at least one), Jaccard ~0.93 verifies, connected components
    collapse the block, and the end-to-end ``dedup_survivors`` output
    keeps exactly ONE boilerplate doc. Checked against the DuckDB
    oracle so the rule is defined semantics on both engines."""
    from gmall_flink_0526_spark.plans.catalog import CATALOG
    from gmall_flink_0526_spark.plans import queries as _load

    from .conftest import assert_matches_oracle, duck_con

    _load()
    base = (
        "terms of service all rights reserved cookie policy navigation home about "
        "contact privacy legal copyright twenty twenty four company incorporated "
        "all trademarks acknowledged subscribe newsletter footer links sitemap "
    ) * 3
    rows = [(i, base + f"variant{i:04d}") for i in range(N_BOILER)]
    rows += [
        (1000, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (1001, "the quick brown fox jumps over the lazy dog near the river bank now"),
        (1002, "completely unrelated text about spark execution plans and shuffles here"),
    ]
    # hot-bucket RESIDUE (SCALE.md's documented cap limitation): ten
    # docs that are ~40% the boilerplate block's text + a tail shared
    # among the ten with a mutation every 10 tokens. Jaccard vs the
    # block rep ~0.36 (below the 0.5 bar -> the rep pairs never verify)
    # and every 16-token chunk window spans a mutation (the chunk gate
    # ratio lands ~0.36 < 0.6) — yet ~80% of each doc's shingles occur
    # in > 5 docs, so corpus_build's shingle-coverage gate drops them
    # without needing any pair. A control doc with the same 40%
    # boilerplate head but a fully unique tail stays under the 0.5
    # coverage bar (the gate keys on corpus-wide repetition, not on
    # touching boilerplate) — asserted against the gate directly below,
    # because since r7 corpus_build ALSO runs the decontamination gate
    # and a 250-id block always contains stand-in eval members
    # (doc_id % 97 == 0 -> ids 0/97/194 are boilerplate), whose shared
    # 5-grams rightly drop the control from the shipped corpus.
    res_head = base.split()[:40]
    tail = (
        "the quick brown fox jumps over the lazy dog near the river bank today "
        "while morning light settles over the quiet valley and the old mill wheel "
        "turns slowly beside the stream where children often play during summer "
        "afternoons and travelers rest under the shade of ancient oak trees"
    ).split()
    for j in range(500, 510):
        t = list(res_head)
        for rep in range(3):  # long enough to clear the quality gate
            t += [w if p % 10 != 7 else f"mut{j}r{rep}p{p}" for p, w in enumerate(tail)]
        rows.append((j, " ".join(t)))
    ctl = list(res_head)
    for rep in range(4):
        ctl += [f"u{rep}p{p}" if p % 3 == 0 else w for p, w in enumerate(tail)]
    rows.append((600, " ".join(ctl)))
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "source": ["web"] * len(rows),
            },
            schema=pa.schema(
                [("doc_id", pa.int64()), ("text", pa.string()), ("source", pa.string())]
            ),
        ),
        str(tmp_path / "documents.parquet"),
    )
    # corpus_build's r15 semantic gate reads the embeddings table; give
    # this corpus vectors where the eval side (doc_id % 7 == 0) lives in
    # dims 0..31 and the train side in dims 32..63 — every train-eval
    # cosine is exactly 0, so the semantic gate provably flags NOTHING
    # here and the test keeps certifying the token-level gates alone
    def _vec(i: int) -> list[float]:
        v = [0.0] * 64
        v[(i % 32) + (0 if i % 7 == 0 else 32)] = 1.0 + (i % 5)
        return v

    ids = [r[0] for r in rows]
    pq.write_table(
        pa.table(
            {
                "vec_id": ids,
                "embedding": [_vec(i) for i in ids],
                "label": [0] * len(ids),
            },
            schema=pa.schema(
                [
                    ("vec_id", pa.int64()),
                    ("embedding", pa.list_(pa.float32())),
                    ("label", pa.int32()),
                ]
            ),
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    spec = CATALOG["dedup_survivors"]
    out = spec.fn(spark, str(tmp_path)).persist()
    try:
        kept = {r["doc_id"] for r in out.collect()}
        boiler = {i for i in kept if i < N_BOILER}
        assert boiler == {0}, f"expected one boilerplate survivor, got {sorted(boiler)}"
        # honest docs all survive: 1000/1001 are near-dups at Jaccard
        # ~0.85 but deterministically collide in none of the 4 bands
        # (a genuine LSH false negative, identical on both engines),
        # and 1002 stands alone
        assert {1000, 1001, 1002} <= kept
        assert_matches_oracle(
            out, duck_con(str(tmp_path)), spec.oracle, name="mutated_boiler"
        )
    finally:
        out.unpersist()
    # corpus_build composes the chunk-level boilerplate gate on top of
    # the representative-capped LSH stage: every boilerplate doc —
    # including the LSH survivor, which is itself >= 60% chunks shared
    # by 250 docs — is out of the shipped corpus, and the rule is
    # oracle-defined on both engines
    cb = CATALOG["corpus_build"]
    cb_out = cb.fn(spark, str(tmp_path)).persist()
    try:
        cb_kept = {r["doc_id"] for r in cb_out.collect()}
        assert not (cb_kept & set(range(N_BOILER)))
        # the residue block is out of the shipped corpus — including
        # any member the PAIRWISE stage kept (`kept` is
        # dedup_survivors' output on this same corpus: members that
        # pair among themselves collapse to min-id survivors, members
        # below the bar against everything survive LSH entirely) —
        # because the coverage gate needs no pairs at all
        assert kept & set(range(500, 510)), "fixture broken: LSH dropped all residue"
        assert not (cb_kept & set(range(500, 510)))
        # ...while the same-shaped control with a unique tail stays
        # UNDER the coverage bar — the coverage gate itself would ship
        # it (keying on corpus-wide repetition, not on touching
        # boilerplate)...
        from gmall_flink_0526_spark.plans.dedup import shingle_many_doc_cov
        from gmall_flink_0526_spark.plans.llmprep import BOILER_DOC_MIN, DUP_COV_MAX

        cov = shingle_many_doc_cov(spark, str(tmp_path), BOILER_DOC_MIN).filter(
            F.col("doc_id") == 600
        ).collect()
        assert cov and cov[0]["scov"] < DUP_COV_MAX
        # ...but the r7 decontamination gate drops it from the shipped
        # corpus: its boilerplate head shares 5-grams with the
        # stand-in eval members of the block (ids 0/97/194)
        assert 600 not in cb_kept
        assert_matches_oracle(
            cb_out, duck_con(str(tmp_path)), cb.oracle, name="mutated_boiler_cb"
        )
    finally:
        cb_out.unpersist()


def test_incdedup_stream_oracle_matches_app_on_boilerplate_corpus(spark, tmp_path):
    """The streaming incremental-dedup ORACLE must mirror the app's cap
    at its exact scopes — batch-local for in-batch pairs, kept-store
    for cross pairs — not the one-shot queries' global cap.

    250 identical docs split ~84/83/83 across the 3 epochs is the
    distinguishing corpus: per-epoch occupancy stays under MAX_BUCKET
    (in-batch dedup fires, each slice keeps its min id) and the kept
    store holds a single survivor (cross dedup drops the later slices'
    minima too), so the app keeps exactly ONE boilerplate doc. An
    oracle that mis-scoped the cap globally (250 > MAX_BUCKET) would
    fire the representative path instead of the sub-cap self-join and
    diverge from the app's epoch-scoped plan."""
    from gmall_flink_0526_spark.plans.catalog import CATALOG
    from gmall_flink_0526_spark.plans import queries as _load  # populate CATALOG

    from .conftest import assert_matches_oracle, duck_con

    _load()
    base = "terms of service all rights reserved cookie policy navigation home about "
    rows = [(i, base * 3) for i in range(250)]
    uniq = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "spark execution plans turn logical operators into physical stages",
        "watermarks bound state for event time joins and window aggregates",
        "parquet footers carry schema and statistics for pruning scans",
        "shuffle partitions decide how wide exchanges hash their rows",
        "broadcast joins replicate the small side to every executor task",
    ]
    rows += [(1000 + i, t) for i, t in enumerate(uniq)]
    # a cross-epoch honest near-dup pair (sub-cap bucket): 2001 % 3 = 0
    # lands in epoch 0, and 2000 % 3 = 2 arrives two epochs later —
    # the later copy must be cross-dropped against the stored one
    nd = "completely original sentence about incremental signatures and stores today"
    rows += [(2000, nd + " now"), (2001, nd + " now please")]
    # single parquet FILE like the driver testdata (a Spark directory
    # write would break duck_con's read_parquet on the same path)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]},
            schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        ),
        str(tmp_path / "documents.parquet"),
    )

    spec = CATALOG["dedup_incremental_stream"]
    out = spec.fn(spark, str(tmp_path)).persist()
    try:
        kept = {r["doc_id"] for r in out.collect()}
        boiler = {i for i in kept if i < 250}
        assert boiler == {0}, f"expected one boilerplate survivor, got {sorted(boiler)}"
        assert all(1000 + i in kept for i in range(len(uniq)))
        # 2001 (epoch 0) survives; 2000 (epoch 2) is a cross-store dup
        assert 2001 in kept and 2000 not in kept
        assert_matches_oracle(out, duck_con(str(tmp_path)), spec.oracle, name="incdedup")
    finally:
        out.unpersist()


def test_ngram_jaccard_source_block_cap_fires_and_matches_oracle(spark, tmp_path):
    """`ngram_jaccard_pairs` blocks on the provenance source — a key
    whose occupancy grows LINEARLY with the corpus, so the uncapped
    self-join was the engine's last Θ(Σ per-block²) pair generator.
    This corpus makes one hot source (250 mutated near-dup copies,
    > MAX_BUCKET) and one honest sub-cap source; the capped query must
    pair hot-source members only against the block's min-id rep (m-1
    pairs, not m(m-1)/2), keep the honest source's full pairwise
    output, and match the DuckDB oracle that defines the same rule."""
    from gmall_flink_0526_spark.plans.catalog import CATALOG
    from gmall_flink_0526_spark.plans import queries as _load

    from .conftest import assert_matches_oracle, duck_con

    _load()
    base = (
        "terms of service all rights reserved cookie policy navigation home about "
        "contact privacy legal copyright subscribe newsletter footer links sitemap "
    ) * 2
    rows = [(i, base + f"variant{i:04d}", "hot") for i in range(N_BOILER)]
    rows += [
        (1000, "the quick brown fox jumps over the lazy dog near the river bank today", "ok"),
        (1001, "the quick brown fox jumps over the lazy dog near the river bank now", "ok"),
        (1002, "completely unrelated text about spark execution plans and shuffles", "ok"),
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "source": [r[2] for r in rows],
            },
            schema=pa.schema(
                [("doc_id", pa.int64()), ("text", pa.string()), ("source", pa.string())]
            ),
        ),
        str(tmp_path / "documents.parquet"),
    )
    spec = CATALOG["ngram_jaccard_pairs"]
    out = spec.fn(spark, str(tmp_path)).persist()
    try:
        pairs = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
        hot = {(a, b) for a, b in pairs if a < N_BOILER and b < N_BOILER}
        # linear: every hot pair has the rep (doc 0) on the left
        assert hot == {(0, i) for i in range(1, N_BOILER)}
        # honest block keeps full pairwise (1000/1001 near-dups pass
        # the 0.02 floor; 1002 shares enough unigram-shingle overlap
        # only if jaccard >= 0.02 — whatever the values, both engines
        # agree, which the oracle compare pins)
        assert (1000, 1001) in pairs
        assert_matches_oracle(
            out, duck_con(str(tmp_path)), spec.oracle, name="ngram_src_cap"
        )
    finally:
        out.unpersist()


def test_semdedup_adaptive_k_grows_with_corpus_and_matches_oracle(spark, tmp_path):
    """SemDeDup's k is derived from the corpus — k = max(KM_K,
    ceil(n / SEMDEDUP_TARGET_CLUSTER)) — so mean cluster occupancy
    stays ~target as the corpus grows instead of cluster sizes
    ballooning toward the quadratic the hot-cluster cap exists to
    stop. 640 vectors -> k = 10 (> the fixed KM_K = 8): the audit must
    report 10 seeded clusters with ~64 mean occupancy, and the DuckDB
    oracle must derive the SAME k from COUNT(*) and land on identical
    clusters (the rule is defined semantics, not a Spark heuristic)."""
    import numpy as np
    import pyarrow as pa

    from gmall_flink_0526_spark.plans.catalog import CATALOG
    from gmall_flink_0526_spark.plans import queries as _load
    from gmall_flink_0526_spark.plans.similarity import _semdedup_k

    from .conftest import assert_matches_oracle, duck_con

    _load()
    assert _semdedup_k(640) == 10 and _semdedup_k(500) == 8

    rng = np.random.default_rng(11)
    centers = rng.normal(0, 1.0, size=(10, 16))
    rows_vec = []
    for i in range(640):
        c = i % 10
        rows_vec.append(centers[c] * 0.4 + rng.normal(0, 0.05, 16))
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(640), pa.int64()),
                "embedding": pa.array(
                    [[float(x) for x in v] for v in rows_vec], pa.list_(pa.float32())
                ),
                "label": pa.array([i % 10 for i in range(640)], pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    spec = CATALOG["embedding_cluster_stats"]
    out = spec.fn(spark, str(tmp_path)).persist()
    try:
        stats = {r["c"]: r["n_vecs"] for r in out.collect()}
        assert len(stats) == 10  # k grew past the fixed KM_K = 8
        assert sum(stats.values()) == 640
        assert max(stats.values()) <= 3 * 64  # occupancy ~target, not n/8
        assert_matches_oracle(
            out, duck_con(str(tmp_path)), spec.oracle, name="semdedup_adaptive_k"
        )
    finally:
        out.unpersist()
    # the pair stage over the same adaptive fit also agrees cross-engine
    sd = CATALOG["embedding_semdedup"]
    sd_out = sd.fn(spark, str(tmp_path)).persist()
    try:
        assert_matches_oracle(
            sd_out, duck_con(str(tmp_path)), sd.oracle, name="semdedup_adaptive_pairs"
        )
    finally:
        sd_out.unpersist()


def test_semdedup_join_path_assignment_matches_oracle_past_literal_k(spark, tmp_path):
    """2240 vectors -> k = 35 > KM_LITERAL_MAX, so the fit and the
    final assignment run through with_cluster's broadcast-join argmin
    strategy; the DuckDB oracle re-derives the same fit from scratch —
    if the join path's doubles or tie-breaks diverged from the
    literal-fold contract, the cluster stats would not hash-match."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gmall_flink_0526_spark.operators import similarity as sim
    from gmall_flink_0526_spark.plans.catalog import CATALOG
    from gmall_flink_0526_spark.plans import queries as _load
    from gmall_flink_0526_spark.plans.similarity import _semdedup_k

    from .conftest import assert_matches_oracle, duck_con

    _load()
    n = 2240
    assert _semdedup_k(n) == 35 > sim.KM_LITERAL_MAX

    rng = np.random.default_rng(17)
    centers = rng.normal(0, 1.0, size=(12, 8))
    vecs = [centers[i % 12] * 0.5 + rng.normal(0, 0.08, 8) for i in range(n)]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [[float(x) for x in v] for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([i % 12 for i in range(n)], pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    spec = CATALOG["embedding_cluster_stats"]
    out = spec.fn(spark, str(tmp_path)).persist()
    try:
        assert out.count() > sim.KM_LITERAL_MAX  # non-empty, large-k fit
        assert_matches_oracle(
            out, duck_con(str(tmp_path)), spec.oracle, name="join_path_k35"
        )
    finally:
        out.unpersist()


def test_ngram_jaccard_null_source_block_is_unblockable(spark, tmp_path):
    """NULL provenance must be unblockable, not a hot block of its own:
    the rep-cap branch is a window (which groups NULL keys) + filter
    with no equality join to drop them, so without the explicit NULL
    filter a >MAX_BUCKET NULL-source block emitted Spark-only rep
    pairs that the oracle's equality joins never produce. 210 NULL-
    source near-dup docs must contribute ZERO pairs on both engines."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gmall_flink_0526_spark.plans.catalog import CATALOG
    from gmall_flink_0526_spark.plans import queries as _load

    from .conftest import assert_matches_oracle, duck_con

    _load()
    base = "terms of service all rights reserved cookie policy navigation home about " * 3
    rows = [(i, base + f"v{i:04d}", None) for i in range(210)]  # > MAX_BUCKET
    rows += [
        (1000, "the quick brown fox jumps over the lazy dog near the river bank today", "ok"),
        (1001, "the quick brown fox jumps over the lazy dog near the river bank now", "ok"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "source": [r[2] for r in rows],
            },
            schema=pa.schema(
                [("doc_id", pa.int64()), ("text", pa.string()), ("source", pa.string())]
            ),
        ),
        str(tmp_path / "documents.parquet"),
    )
    spec = CATALOG["ngram_jaccard_pairs"]
    out = spec.fn(spark, str(tmp_path)).persist()
    try:
        pairs = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
        assert pairs == {(1000, 1001)}  # nothing from the NULL block
        assert_matches_oracle(
            out, duck_con(str(tmp_path)), spec.oracle, name="ngram_null_source"
        )
    finally:
        out.unpersist()


def test_emb_incremental_stream_dedups_dense_block_across_epochs(spark, tmp_path):
    """The embedding incremental app's distinguishing corpus, mirroring
    the MinHash one: 300 near-identical vectors whose ids spread across
    all 3 replay epochs (vec_id % 3) — in-batch dedup keeps each
    epoch's min id, cross-store dedup drops the later epochs' minima
    against the stored epoch-0 representative, so exactly ONE dense
    vector survives. An across-epoch honest pair (2001 in epoch 0,
    2000 arriving in epoch 2) pins the cross-store drop direction.
    Oracle-matched, so the bootstrap-fit + cap scopes are defined
    semantics on both engines."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gmall_flink_0526_spark.plans.catalog import CATALOG
    from gmall_flink_0526_spark.plans import queries as _load

    from .conftest import assert_matches_oracle, duck_con

    _load()
    rng = np.random.default_rng(23)
    base = rng.normal(0, 1, 8)
    # honest one-hot vectors take the LOWEST epoch-0 ids (3j) so the
    # bootstrap fit seeds 8 DISTINCT centroids — seeding from the
    # near-identical dense block instead splits the blob across
    # near-identical centroids, which is defined (oracle-matched)
    # behavior but not the single-cluster scenario this test pins
    rows = []
    for j in range(8):
        v = [0.0] * 8
        v[j] = 1.0 + float(rng.normal(0, 0.01))
        rows.append((3 * j, v))
    rows += [
        (100 + i, [float(x) for x in base + rng.normal(0, 0.01, 8)]) for i in range(300)
    ]
    nd = -base  # far from the dense block
    rows.append((2001, [float(x) for x in nd]))          # 2001 % 3 = 0 -> epoch 0
    rows.append((2000, [float(x) for x in nd * 1.01]))   # 2000 % 3 = 2 -> epoch 2
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    spec = CATALOG["embedding_incremental_stream"]
    out = spec.fn(spark, str(tmp_path)).persist()
    try:
        kept = {r["vec_id"] for r in out.collect()}
        dense = {i for i in kept if 100 <= i < 400}
        # epoch 0's dense minimum (102: 100 lands in epoch 1, 101 in
        # epoch 2) survives; every later copy cross-drops against it
        assert dense == {102}, f"expected one dense survivor, got {sorted(dense)[:10]}"
        assert {3 * j for j in range(8)} <= kept  # honest vectors all ship
        assert 2001 in kept and 2000 not in kept  # cross-epoch drop direction
        assert_matches_oracle(
            out, duck_con(str(tmp_path)), spec.oracle, name="emb_inc_stream"
        )
    finally:
        out.unpersist()
