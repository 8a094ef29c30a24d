"""Deduplication queries over ``documents`` / ``embeddings`` — the
training-data-pipeline dedup suite (exact, MinHash+LSH, n-gram
Jaccard, SimHash, embedding-cosine near-dup)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import dedup as D
from ..operators.cache import corpus_persist
from ..session import load_tables
from .catalog import register, register_setup
from .text import SQL_TOKS

JACCARD_THRESHOLD = 0.5

# Partitioning for the connected-components loop at catalog scale: the
# verified near-dup pair graph is orders of magnitude smaller than the
# corpus (hundreds of edges at sf0.1), so the iterative shuffles run at
# a small fixed width; at 100 TB pass a count sized to the edge volume
# (the operator parameter exists for exactly that).
CC_PARTITIONS = 8

# -- corpus-scoped intermediates ----------------------------------------
#
# The shingle / signature / band-key tables are pure functions of the
# corpus dir — the tables a production corpus materializes ONCE and
# keeps (SCALE.md). Cached across catalog queries via corpus_persist:
# ten LSH-family queries stop re-tokenizing and re-hashing the same
# corpus, exactly as ten production jobs would all join the one stored
# signature table.


def corpus_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return corpus_persist(
        spark, "shingles3", sf_dir,
        lambda: D.doc_shingles(docs, "doc_id", "text"),
    )


def corpus_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_persist(
        spark, "sigs", sf_dir,
        lambda: D.minhash_sigs(corpus_shingles(spark, sf_dir)),
    )


def corpus_band_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_persist(
        spark, "bands", sf_dir,
        lambda: D.band_keys_from_sigs(corpus_sigs(spark, sf_dir)),
    )


def corpus_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node, comp): connected components over the corpus's verified
    LSH near-dup pairs — the dedup decision itself, which
    dedup_clusters, dedup_survivors, dedup_token_retention and
    corpus_build all consume. Corpus-scoped like the signature tables:
    the heavy Jaccard-verify stage and the iterative CC loop run once
    per corpus per process instead of once per consumer."""
    from ..operators.graph import connected_components

    def build():
        sh = corpus_shingles(spark, sf_dir)
        pairs = (
            D.jaccard_verify(sh, D.lsh_pairs_from_bands(corpus_band_keys(spark, sf_dir)))
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .select("doc_a", "doc_b")
        )
        return connected_components(pairs, "doc_a", "doc_b", num_partitions=CC_PARTITIONS)

    return corpus_persist(spark, "components", sf_dir, build)


def corpus_shingle_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, gh): the corpus shingle table exploded to fixed-width
    16-hex md5 keys — the inverted-index base shared by the
    duplicate-coverage signal, corpus_build's coverage gate and its
    histogram audit. Corpus-scoped like the signature tables: built
    once per corpus per process, shuffles move 16-hex keys instead of
    shingle text."""
    from ..operators.partitioning import spread

    def build():
        sh = corpus_shingles(spark, sf_dir)
        return spread(sh.select("doc_id", F.explode("s").alias("g")), "doc_id").select(
            "doc_id", F.substring(F.md5("g"), 1, 16).alias("gh")
        )

    return corpus_persist(spark, "shingle_hashes", sf_dir, build)


def shingle_many_doc_cov(spark: SparkSession, sf_dir: str, min_docs: int) -> DataFrame:
    """(doc_id, scov): per-doc fraction of distinct shingles occurring
    in more than ``min_docs`` documents — the statistic behind
    corpus_build's coverage gate and dup_coverage_histogram. One count
    shuffle on the hash key + one doc-keyed agg; linear in total
    shingles, no pairs."""
    exh = corpus_shingle_hashes(spark, sf_dir)
    cnt = exh.groupBy("gh").agg(F.count("*").alias("doc_ct"))
    return (
        exh.join(cnt, "gh")
        .groupBy("doc_id")
        .agg(
            (
                F.sum((F.col("doc_ct") > min_docs).cast("int")) / F.count("*")
            ).alias("scov")
        )
    )


# Shared oracle CTEs for the inverted-index shape (require ``sh`` from
# SQL_SHINGLES3 in scope).
SQL_SHEX = """
  shex AS (SELECT doc_id, substr(md5(g), 1, 16) AS gh
           FROM (SELECT doc_id, unnest(s) AS g FROM sh)),
  shcnt AS (SELECT gh, COUNT(*) AS doc_ct FROM shex GROUP BY gh)
"""


def sql_shingle_cov(min_docs: int) -> str:
    """The shcov CTE twin of :func:`shingle_many_doc_cov`."""
    return f"""
  shcov AS (
    SELECT doc_id,
           CAST(SUM(CASE WHEN doc_ct > {min_docs} THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS scov
    FROM shex JOIN shcnt USING (gh)
    GROUP BY doc_id
  )
"""


# -- shared oracle CTEs -------------------------------------------------

SQL_SHINGLES3 = f"""
  toks AS (SELECT doc_id, {SQL_TOKS} AS t FROM documents),
  sh AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                ELSE [] END) AS s
    FROM toks
  )
"""

_MINHASHES = ",\n             ".join(
    f"list_aggregate(list_transform(s, x -> substr(md5('{i}#' || x), 1, {D.HASH_PREFIX})), 'min')"
    for i in range(D.MINHASH_K)
)

_BANDS = ", ".join(
    "md5(" + " || '|' || ".join(f"m[{b * D.LSH_ROWS + r + 1}]" for r in range(D.LSH_ROWS)) + ")"
    for b in range(D.LSH_BANDS)
)

SQL_LSH_BANDS = f"""
  mh AS (
    SELECT doc_id, [{_MINHASHES}] AS m
    FROM sh WHERE len(s) > 0
  ),
  bands AS (
    SELECT doc_id, b, [{_BANDS}][b + 1] AS bk
    FROM mh, (SELECT unnest(range(0, {D.LSH_BANDS})) AS b) bb
  )
"""

# Candidate generation mirrors the Spark side's hot-bucket guard
# (operators/dedup.MAX_BUCKET): bucket keys with occupancy past the cap
# are capped to their min-id representative's (rep, member) pairs —
# linear instead of quadratic — on BOTH engines, so the cap is part of
# the query's defined semantics, not a divergence. A hot bucket of
# near-duplicates therefore still dedups against one representative.
SQL_LSH_CANDIDATES = f"""
  {SQL_LSH_BANDS.strip().strip(',')},
  bstat AS (
    SELECT b, bk, COUNT(*) AS bct, MIN(doc_id) AS rep
    FROM bands GROUP BY b, bk
  ),
  cand AS (
    SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
    FROM bands a
    JOIN bstat ON a.b = bstat.b AND a.bk = bstat.bk
              AND bstat.bct <= {D.MAX_BUCKET}
    JOIN bands c
      ON a.b = c.b AND a.bk = c.bk AND a.doc_id < c.doc_id
    UNION
    SELECT t.rep AS doc_a, bands.doc_id AS doc_b
    FROM bands JOIN bstat t ON bands.b = t.b AND bands.bk = t.bk
    WHERE t.bct > {D.MAX_BUCKET} AND bands.doc_id > t.rep
  )
"""


# Parameterized twins of the shared CTEs above, for oracles that run
# the shingle/LSH chain over a DERIVED corpus (adversarial replication,
# exact-dedup survivors) — or twice in one statement. The legacy
# constants stay byte-identical (their queries' certified oracle text
# must not churn); these generate the same derivations with a source
# table and a CTE-name suffix.


def sql_shingles3_from(src: str, x: str = "") -> str:
    """toks{x}/sh{x}: the SQL_SHINGLES3 derivation over ``src``."""
    return f"""
  toks{x} AS (SELECT doc_id, {SQL_TOKS} AS t FROM {src}),
  sh{x} AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                ELSE [] END) AS s
    FROM toks{x}
  )
"""


def sql_lsh_candidates_from(x: str = "") -> str:
    """mh{x}/bands{x}/bstat{x}/cand{x}: the SQL_LSH_CANDIDATES
    derivation (hot-bucket rep cap included) over ``sh{x}``."""
    return f"""
  mh{x} AS (
    SELECT doc_id, [{_MINHASHES}] AS m
    FROM sh{x} WHERE len(s) > 0
  ),
  bands{x} AS (
    SELECT doc_id, b, [{_BANDS}][b + 1] AS bk
    FROM mh{x}, (SELECT unnest(range(0, {D.LSH_BANDS})) AS b) bb
  ),
  bstat{x} AS (
    SELECT b, bk, COUNT(*) AS bct, MIN(doc_id) AS rep
    FROM bands{x} GROUP BY b, bk
  ),
  cand{x} AS (
    SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
    FROM bands{x} a
    JOIN bstat{x} t0 ON a.b = t0.b AND a.bk = t0.bk
              AND t0.bct <= {D.MAX_BUCKET}
    JOIN bands{x} c
      ON a.b = c.b AND a.bk = c.bk AND a.doc_id < c.doc_id
    UNION
    SELECT t.rep AS doc_a, bn.doc_id AS doc_b
    FROM bands{x} bn JOIN bstat{x} t ON bn.b = t.b AND bn.bk = t.bk
    WHERE t.bct > {D.MAX_BUCKET} AND bn.doc_id > t.rep
  )
"""


def sql_verified_pairs_from(x: str, out: str) -> str:
    """{out}: cand{x} Jaccard-verified against sh{x} at the catalog
    threshold — the (doc_a, doc_b) near-dup pair set."""
    return f"""
  {out} AS (
    SELECT cand{x}.doc_a, cand{x}.doc_b
    FROM cand{x}
    JOIN sh{x} a ON cand{x}.doc_a = a.doc_id
    JOIN sh{x} b ON cand{x}.doc_b = b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) >= {JACCARD_THRESHOLD}
  )
"""


# The EXACT threshold-join pair set as oracle CTEs (requires ``sh{x}``
# in scope): brute-force shared-shingle candidates + Jaccard verify —
# DuckDB's equivalent of the prefix-filter join's output (the pruning
# is lossless, so brute force IS the same set). ONE derivation,
# suffix-parameterized like the shingle/LSH builders above, so the
# threshold and verify expression can never desynchronize between the
# batch truth and a derived-corpus consumer.


def sql_exact_pairs_from(x: str = "") -> str:
    return f"""
  tok{x} AS (SELECT doc_id, unnest(s) AS g FROM sh{x}),
  bf{x} AS (
    SELECT a.doc_id AS da, b.doc_id AS db
    FROM tok{x} a JOIN tok{x} b ON a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ),
  exact_pairs{x} AS (
    SELECT bf{x}.da AS doc_a, bf{x}.db AS doc_b
    FROM bf{x} JOIN sh{x} a ON bf{x}.da = a.doc_id
            JOIN sh{x} b ON bf{x}.db = b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) >= {JACCARD_THRESHOLD}
  )
"""


SQL_EXACT_PAIRS = sql_exact_pairs_from("")


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash,
           COUNT(*) AS dup_ct,
           MIN(doc_id) AS keeper_id
    FROM documents
    GROUP BY md5(text)
    """,
    doc="Exact dedup: hash-groupBy on the document digest; one shuffle "
    "keyed by the digest, keeper = min id.",
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents")
    return D.exact_dedup(t["documents"], "text", "doc_id")


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {SQL_SHINGLES3},
    {SQL_LSH_CANDIDATES}
    SELECT doc_a, doc_b,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
    FROM cand JOIN sh a ON cand.doc_a = a.doc_id
              JOIN sh b ON cand.doc_b = b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(list_concat(a.s, b.s))) >= {JACCARD_THRESHOLD}
    """,
    doc="MinHash+LSH near-dup detection: 3-gram shingles -> 16 seeded "
    "md5 minhashes -> 4 bands x 4 rows -> self-join on band buckets for "
    "candidates -> exact Jaccard verify >= 0.5. Candidate generation is "
    "one co-partitioned shuffle on the bucket key; the O(n^2) cross "
    "join never materializes — the property that holds at 100 TB.",
    tags=("dedup", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shingles and band keys come from the corpus-scoped cache: the
    # tokenize/shingle/signature passes run once per corpus per
    # process, as production's stored signature table would
    sh = corpus_shingles(spark, sf_dir)
    pairs = D.lsh_pairs_from_bands(corpus_band_keys(spark, sf_dir))
    verified = D.jaccard_verify(sh, pairs)
    return verified.filter(F.col("jaccard") >= JACCARD_THRESHOLD)


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH {SQL_SHINGLES3},
    sstat AS (
      SELECT source, COUNT(*) AS sct, MIN(doc_id) AS rep
      FROM documents WHERE source IS NOT NULL GROUP BY source
    ),
    bpairs AS (
      SELECT da.doc_id AS doc_a, db.doc_id AS doc_b
      FROM documents da
      JOIN sstat ON da.source = sstat.source AND sstat.sct <= {D.MAX_BUCKET}
      JOIN documents db ON da.source = db.source AND da.doc_id < db.doc_id
      UNION
      SELECT t.rep AS doc_a, d.doc_id AS doc_b
      FROM documents d JOIN sstat t ON d.source = t.source
      WHERE t.sct > {D.MAX_BUCKET} AND d.doc_id > t.rep
    )
    SELECT bpairs.doc_a, bpairs.doc_b,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
    FROM bpairs JOIN sh a ON bpairs.doc_a = a.doc_id
                JOIN sh b ON bpairs.doc_b = b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(list_concat(a.s, b.s))) >= 0.02
    """,
    doc="n-gram Jaccard similarity within source buckets — blocked "
    "pairwise comparison, with the SAME representative hot-bucket cap "
    "as every LSH family (operators/dedup.MAX_BUCKET): a source block "
    "past the cap contributes its min-id representative's m-1 pairs "
    "instead of m(m-1)/2, on BOTH engines. Source blocks grow "
    "LINEARLY with the corpus (unlike content-hash buckets), so the "
    "uncapped form is Θ(Σ per-source²) — the one quadratic the rest "
    "of the engine was engineered to avoid; with the cap the pair "
    "count is Σ min(block, cap)·cap-ish, i.e. linear in corpus size.",
    tags=("dedup", "jaccard"),
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents")
    # NULL provenance is unblockable, not a block of its own: an
    # equality self-join drops NULL keys, but hot_bucket_split's
    # window would group them into one bucket and the rep branch has
    # no equality join to drop them — filter first so both engines
    # define the same rule (the oracle's joins drop NULLs natively)
    docs = t["documents"].filter(F.col("source").isNotNull()).select("source", "doc_id")
    # the one banded self-join, keyed by provenance source: normal
    # blocks full-pairwise, hot blocks rep-capped — identical wiring
    # to the (band, bk) / cluster-id families
    blocked = D.lsh_pairs_from_bands(
        docs, keys=("source",), id_col="doc_id", out=("doc_a", "doc_b")
    )
    sh = corpus_shingles(spark, sf_dir)
    return D.jaccard_verify(sh, blocked).filter(F.col("jaccard") >= 0.02)


@register(
    "prefix_filter_near_dup",
    oracle=f"""
    WITH {SQL_SHINGLES3},
    tok AS (SELECT doc_id, unnest(s) AS g FROM sh),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT cand.doc_a, cand.doc_b,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
    FROM cand JOIN sh a ON cand.doc_a = a.doc_id
              JOIN sh b ON cand.doc_b = b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(list_concat(a.s, b.s))) >= {JACCARD_THRESHOLD}
    """,
    doc="EXACT threshold similarity join via prefix filtering (the "
    "PPJoin family's core principle) — the LOSSLESS counterpart to "
    "the probabilistic LSH bands: order every doc's shingles by "
    "ascending global frequency (rarest first, ties by value), keep "
    "only the prefix of length n - ceil(t*n) + 1, and two docs are "
    "candidates IFF their prefixes share a shingle — any pair with "
    "Jaccard >= t provably does, so unlike MinHash there are NO "
    "false negatives to tune away; a length filter (t*max_n <= "
    "min_n, a necessary condition) prunes further before the exact "
    "verify. The ORACLE is the brute-force all-shared-shingle-pairs "
    "join — so a green row certifies the losslessness theorem "
    "itself on this corpus, the same oracle-stronger-than-impl "
    "pattern as the stream twins. 100 TB shape: the prefix explode "
    "carries ~(1-t) of each doc's shingles and those are its RAREST "
    "(the frequency ordering is what keeps candidate buckets small "
    "— a hot boilerplate shingle is at the END of every prefix "
    "order, so it never generates candidates); the heavy stages are "
    "one global df count and one equi-join on prefix shingles, both "
    "map-side-combining; production adds PPJoin's positional filter "
    "to tighten candidates further, pruning only (the verify stays "
    "exact either way).",
    tags=("dedup", "jaccard", "prefix-filter"),
)
def prefix_filter_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prefix_filter_pairs(spark, sf_dir)


def prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact threshold-join pair set (doc_a, doc_b, jaccard >= t)
    via prefix filtering — shared by `prefix_filter_near_dup` (which
    IS this) and `lsh_recall_exact` (which uses it as the ground
    truth the LSH pair set is measured against); corpus-persisted
    like the signature chain so the two consumers pay one build.
    Candidate generation lives in
    ``operators/dedup.prefix_filter_candidates`` (hypothesis-tested
    against a Python brute-force model — the losslessness theorem is
    pinned on adversarial sets, not just these corpora)."""

    def build():
        t = JACCARD_THRESHOLD
        sh = corpus_shingles(spark, sf_dir)
        cand = D.prefix_filter_candidates(sh, t)
        return D.jaccard_verify(sh, cand).filter(F.col("jaccard") >= t)

    return corpus_persist(spark, "prefix_pairs", sf_dir, build)


@register(
    "lsh_recall_exact",
    oracle=f"""
    WITH {SQL_SHINGLES3},
    {SQL_LSH_CANDIDATES},
    lshv AS (
      SELECT cand.doc_a, cand.doc_b FROM cand
      JOIN sh a ON cand.doc_a = a.doc_id
      JOIN sh b ON cand.doc_b = b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) >= {JACCARD_THRESHOLD}
    ),
    tok AS (SELECT doc_id, unnest(s) AS g FROM sh),
    bf AS (
      SELECT a.doc_id AS da, b.doc_id AS db
      FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT bf.da AS doc_a, bf.db AS doc_b
      FROM bf JOIN sh a ON bf.da = a.doc_id
              JOIN sh b ON bf.db = b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) >= {JACCARD_THRESHOLD}
    ),
    agg AS (
      SELECT COUNT(*) FILTER (WHERE e.doc_a IS NOT NULL) AS n_exact,
             COUNT(*) FILTER (WHERE m.doc_a IS NOT NULL) AS n_lsh,
             COUNT(*) FILTER (WHERE e.doc_a IS NOT NULL
                                AND m.doc_a IS NOT NULL) AS n_hit
      FROM exact e FULL OUTER JOIN lshv m
        ON e.doc_a = m.doc_a AND e.doc_b = m.doc_b
    )
    SELECT n_exact, n_lsh, n_hit,
           CASE WHEN n_exact > 0
                THEN CAST(n_hit AS DOUBLE) / n_exact END AS recall
    FROM agg
    """,
    doc="LSH recall measured against EXACT truth — the calibration "
    "read the 13-band x 4-row MinHash configuration stands on, now "
    "externally value-checked instead of argued (the "
    "minhash_estimate_audit / ann_recall_ivf pattern): ground truth = "
    "the prefix-filter threshold join (provably lossless), candidate "
    "set = the production banded LSH pairs (hot-bucket rep cap "
    "included), both Jaccard-verified at the same threshold, compared "
    "by one pair-keyed full outer join. recall = n_hit/n_exact is "
    "exactly the probability mass the banding scheme's S-curve "
    "gives up at t, PLUS the rep cap's deliberate loss — the two "
    "knobs a 100 TB dedup run trades against pair volume. The "
    "verified-LSH set is a SUBSET of truth by construction (verify "
    "is exact), so n_lsh = n_hit is itself an invariant the oracle "
    "re-derives. Sub-kilobyte tail: both pair sets are corpus-sparse; "
    "the heavy stages are the same shared corpus-scoped "
    "shingle/band tables every LSH query reuses.",
    tags=("dedup", "lsh", "audit", "prefix-filter"),
)
def lsh_recall_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = corpus_shingles(spark, sf_dir)
    exact = prefix_filter_pairs(spark, sf_dir).select("doc_a", "doc_b")
    lsh = (
        D.jaccard_verify(
            sh, D.lsh_pairs_from_bands(corpus_band_keys(spark, sf_dir))
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select(F.col("doc_a").alias("la"), F.col("doc_b").alias("lb"))
    )
    j = exact.join(
        lsh,
        (exact["doc_a"] == lsh["la"]) & (exact["doc_b"] == lsh["lb"]),
        "full_outer",
    )
    agg = j.agg(
        F.count(F.when(F.col("doc_a").isNotNull(), 1)).alias("n_exact"),
        F.count(F.when(F.col("la").isNotNull(), 1)).alias("n_lsh"),
        F.count(
            F.when(F.col("doc_a").isNotNull() & F.col("la").isNotNull(), 1)
        ).alias("n_hit"),
    )
    # Zero-pair corpora: Spark's Divide yields NULL at 0/0 while
    # DuckDB's double division is version-dependent (NaN/inf) — guard
    # BOTH sides identically so the degenerate case stays bit-identical
    # (NULL recall means "no truth pairs to recall against").
    return agg.select(
        "n_exact",
        "n_lsh",
        "n_hit",
        F.when(
            F.col("n_exact") > 0,
            F.col("n_hit").cast("double") / F.col("n_exact"),
        ).alias("recall"),
    )


# -- the adversarial-corpus mitigation, certified -------------------------
#
# SCALE.md's 10x probe measured LSH recall 0.025 on a 600-copy
# boilerplate block: the hot-bucket rep cap deliberately trades the
# block's quadratic pair set for linear (rep, member) pairs. The
# documented mitigation is "run exact dedup first". This query turns
# that prose into a certified number by BUILDING the adversarial
# corpus inside the query (doc 0's text replicated REP_COPIES times —
# derivable identically by both engines, no side fixture), measuring
# raw recall on the identical-text truth, then recall after exact
# dedup against the prefix-filter exact truth.
REP_COPIES = 256  # > operators/dedup.MAX_BUCKET so the rep cap fires
REP_BASE_ID = 1_000_000  # clear of every fixture's doc_id range


def _sql_lsh_recall_post_dedup() -> str:
    return f"""
    WITH adv AS MATERIALIZED (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT {REP_BASE_ID} + r AS doc_id, d.text
      FROM range(0, {REP_COPIES}) t(r)
      CROSS JOIN (SELECT text FROM documents WHERE doc_id = 0) d
    ),
    {sql_shingles3_from("adv", "a")},
    {sql_lsh_candidates_from("a")},
    {sql_verified_pairs_from("a", "lshva")},
    texts AS MATERIALIZED (SELECT doc_id, md5(text) AS th FROM adv),
    idp AS (
      SELECT CAST(SUM(ct * (ct - 1) // 2) AS BIGINT) AS n_id_pairs_raw
      FROM (SELECT COUNT(*) AS ct FROM texts GROUP BY th)
    ),
    rawhit AS (
      SELECT COUNT(*) AS n_lsh_id_hits_raw
      FROM lshva v JOIN texts ta ON v.doc_a = ta.doc_id
                   JOIN texts tb ON v.doc_b = tb.doc_id
      WHERE ta.th = tb.th
    ),
    keep AS (SELECT MIN(doc_id) AS doc_id FROM adv GROUP BY md5(text)),
    surv AS MATERIALIZED (
      SELECT adv.doc_id, adv.text FROM adv JOIN keep USING (doc_id)
    ),
    {sql_shingles3_from("surv", "s")},
    {sql_lsh_candidates_from("s")},
    {sql_verified_pairs_from("s", "lshvs")},
    {sql_exact_pairs_from("s")},
    post AS (
      SELECT COUNT(*) FILTER (WHERE e.doc_a IS NOT NULL) AS n_exact_post,
             COUNT(*) FILTER (WHERE e.doc_a IS NOT NULL
                                AND m.doc_a IS NOT NULL) AS n_hit_post
      FROM exact_pairss e FULL OUTER JOIN lshvs m
        ON e.doc_a = m.doc_a AND e.doc_b = m.doc_b
    )
    SELECT (SELECT COUNT(*) FROM adv) AS n_docs_raw,
           (SELECT COUNT(*) FROM surv) AS n_survivors,
           idp.n_id_pairs_raw,
           rawhit.n_lsh_id_hits_raw,
           CASE WHEN idp.n_id_pairs_raw > 0
                THEN CAST(rawhit.n_lsh_id_hits_raw AS DOUBLE)
                     / idp.n_id_pairs_raw END AS recall_raw,
           post.n_exact_post,
           post.n_hit_post,
           CASE WHEN post.n_exact_post > 0
                THEN CAST(post.n_hit_post AS DOUBLE)
                     / post.n_exact_post END AS recall_post
    FROM idp, rawhit, post
    """


@register(
    "lsh_recall_post_dedup",
    oracle=_sql_lsh_recall_post_dedup(),
    doc="The adversarial-LSH mitigation, certified (r11 VERDICT #3): "
    "SCALE.md measured recall 0.025 under the hot-bucket rep cap on "
    "a replicated-boilerplate corpus; the production guidance was "
    "'run exact dedup first' — prose until now. The query derives "
    "the adversarial corpus IN-PLAN (doc 0's text replicated "
    f"{REP_COPIES}x > MAX_BUCKET, ids offset to {REP_BASE_ID} — both "
    "engines rebuild it bit-identically from the parquet alone), "
    "then certifies both halves: recall_raw = capped-LSH hits over "
    "the identical-text pair truth (counted analytically per text "
    "group, sum ct*(ct-1)/2 — no quadratic enumeration), expected "
    "~2/REP_COPIES; recall_post = LSH over the exact-dedup SURVIVORS "
    "measured against the prefix-filter exact truth, expected 1.0 on "
    "this corpus (the r11 natural-corpus measurement, now green "
    "under the adversarial fixture too). Both divisions zero-guarded "
    "identically both sides. Scale shape: the raw chain is the "
    "production capped-LSH path (linear in the block); the only "
    "quadratic object, the identical-pair TRUTH, is never "
    "materialized — counted from group sizes.",
    tags=("dedup", "lsh", "audit", "prefix-filter", "adversarial"),
)
def lsh_recall_post_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cache import scoped_persist

    docs = load_tables(spark, sf_dir, "documents")["documents"].select(
        "doc_id", "text"
    )
    # Precondition, checked not assumed (r12 advice): the replica ids
    # start at REP_BASE_ID, so a fixture whose own ids reach that range
    # would silently alias replicas onto real docs ON BOTH ENGINES —
    # the certified row would stay green while measuring a different
    # corpus. One-row validator collect, the limit(1) pattern.
    mx = docs.agg(F.max("doc_id").alias("mx")).first()["mx"]
    if mx is not None and mx >= REP_BASE_ID:
        raise ValueError(
            f"lsh_recall_post_dedup: fixture doc_id range reaches {mx} "
            f">= REP_BASE_ID={REP_BASE_ID}; raise REP_BASE_ID above the "
            "corpus id range so replica ids cannot collide"
        )
    base = docs.filter(F.col("doc_id") == 0).select("text")
    copies = (
        spark.range(REP_COPIES)
        .crossJoin(F.broadcast(base))
        .select(
            (F.lit(REP_BASE_ID) + F.col("id")).cast("long").alias("doc_id"),
            "text",
        )
    )
    adv = scoped_persist(docs.union(copies))

    def verified_lsh(sh: DataFrame, bands: DataFrame) -> DataFrame:
        # bands arrives PERSISTED at the call site: lsh_pairs_from_bands
        # consumes its input ~4x (hot-bucket agg, annotation join, both
        # self-join sides) — unpersisted, each consumption recomputes
        # the 16-md5-per-shingle signature stack (the
        # lsh_candidate_pairs persist rationale; measured r16: this
        # query 32 s -> with both rungs' reuse 13 s solo).
        cand = D.lsh_pairs_from_bands(bands)
        return (
            D.jaccard_verify(sh, cand)
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .select("doc_a", "doc_b")
        )

    # adv = documents ∪ REP_COPIES copies of doc 0's TEXT — and shingles
    # / MinHash band keys are pure per-doc functions of the text, so the
    # adv tables are the corpus-scoped memos (shared with the whole LSH
    # family) UNION one broadcast row replicated per copy id: no second
    # tokenize/16-md5 pass over the corpus, values identical by
    # construction (the oracle recomputes from scratch and still
    # hash-matches). The copies DO change bucket occupancy — doc 0's
    # buckets blow past the rep cap, which is the adversarial behavior
    # this audit exists to measure — and that happens downstream in
    # lsh_pairs_from_bands over the unioned table, exactly as before.
    rep_ids = spark.range(REP_COPIES).select(
        (F.lit(REP_BASE_ID) + F.col("id")).cast("long").alias("doc_id")
    )
    base_sh = corpus_shingles(spark, sf_dir)
    sh0 = base_sh.filter(F.col("doc_id") == 0).select("s")
    sha = scoped_persist(
        base_sh.unionByName(rep_ids.crossJoin(F.broadcast(sh0)).select("doc_id", "s"))
    )
    base_bands = corpus_band_keys(spark, sf_dir)
    bands0 = base_bands.filter(F.col("doc_id") == 0).select("band", "bk")
    bands_a = scoped_persist(
        base_bands.unionByName(
            rep_ids.crossJoin(F.broadcast(bands0)).select("doc_id", "band", "bk")
        )
    )
    lshva = verified_lsh(sha, bands_a)
    texts = scoped_persist(adv.select("doc_id", F.md5("text").alias("th")))
    idp = (
        texts.groupBy("th")
        .agg(F.count("*").alias("ct"))
        .agg(F.sum(F.expr("ct * (ct - 1) div 2")).alias("n_id_pairs_raw"))
    )
    ta = texts.select(F.col("doc_id").alias("da"), F.col("th").alias("tha"))
    tb = texts.select(F.col("doc_id").alias("db"), F.col("th").alias("thb"))
    rawhit = (
        lshva.join(ta, lshva["doc_a"] == ta["da"])
        .join(tb, lshva["doc_b"] == tb["db"])
        .filter(F.col("tha") == F.col("thb"))
        .agg(F.count("*").alias("n_lsh_id_hits_raw"))
    )
    keep = adv.groupBy(F.md5("text").alias("th")).agg(
        F.min("doc_id").alias("doc_id")
    )
    surv = scoped_persist(adv.join(keep.select("doc_id"), "doc_id"))
    # Survivors are a SUBSET of adv with text unchanged, and shingles /
    # minhash band keys are pure per-doc functions of (doc_id, text) —
    # so the survivor rung's tables are id-semi-joins of the raw rung's
    # persisted ones, not a second tokenize/16-md5 pass over the corpus
    # (value-identical by construction; the oracle recomputes from
    # scratch and still hash-matches).
    surv_ids = surv.select("doc_id")
    shs = scoped_persist(sha.join(surv_ids, "doc_id", "left_semi"))
    bands_s = scoped_persist(bands_a.join(surv_ids, "doc_id", "left_semi"))
    lshvs = verified_lsh(shs, bands_s).select(
        F.col("doc_a").alias("la"), F.col("doc_b").alias("lb")
    )
    # Exact truth over the survivors = the corpus-persisted exact pair
    # table (prefix filter is LOSSLESS and the verify is exact, so the
    # full-corpus pair set restricted to surviving endpoints IS the
    # survivor-corpus pair set — candidate-generation differences can't
    # matter for an exact join). Survivors ⊆ documents: replica ids all
    # share doc 0's text, so exact dedup keeps doc 0 and drops every
    # replica — the semi-joins below never need replica rows.
    exacts = (
        prefix_filter_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .join(surv_ids.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi")
        .join(surv_ids.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi")
    )
    post = (
        exacts.join(
            lshvs,
            (exacts["doc_a"] == lshvs["la"]) & (exacts["doc_b"] == lshvs["lb"]),
            "full_outer",
        )
        .agg(
            F.count(F.when(F.col("doc_a").isNotNull(), 1)).alias("n_exact_post"),
            F.count(
                F.when(F.col("doc_a").isNotNull() & F.col("la").isNotNull(), 1)
            ).alias("n_hit_post"),
        )
    )
    n_raw = adv.agg(F.count("*").alias("n_docs_raw"))
    n_surv = surv.agg(F.count("*").alias("n_survivors"))
    row = (
        n_raw.crossJoin(F.broadcast(n_surv))
        .crossJoin(F.broadcast(idp))
        .crossJoin(F.broadcast(rawhit))
        .crossJoin(F.broadcast(post))
    )
    return row.select(
        "n_docs_raw",
        "n_survivors",
        "n_id_pairs_raw",
        "n_lsh_id_hits_raw",
        F.when(
            F.col("n_id_pairs_raw") > 0,
            F.col("n_lsh_id_hits_raw").cast("double") / F.col("n_id_pairs_raw"),
        ).alias("recall_raw"),
        "n_exact_post",
        "n_hit_post",
        F.when(
            F.col("n_exact_post") > 0,
            F.col("n_hit_post").cast("double") / F.col("n_exact_post"),
        ).alias("recall_post"),
    )


# -- corpus-vertex PageRank over the similarity graph --------------------
#
# Fixed partition width for the rank-shuffle loop at catalog scale
# (the CC_PARTITIONS rationale: 5 iterations x 32-way tiny tasks is
# pure scheduler overhead at test SF); at 100 TB size it to the
# corpus like every other num_partitions parameter here.
DOC_PR_PARTITIONS = 8


def _sql_doc_pagerank(weighted: bool = False) -> str:
    """Chained-CTE mirror of operators/graph.pagerank_partitioned over
    the document similarity graph: one CTE pair (dangling sum, rank
    step) per power iteration, every floating fan-in
    decimal-accumulated (sql_sum) so both engines carry bit-identical
    doubles between steps — the behavior_pagerank chaining argument,
    now WITH the dangling-mass redistribute term (on this graph most
    documents are singletons, so ds carries most of the mass).

    ``weighted=True`` swaps the unit-weight edge prologue for the
    jaccard-weighted one: w = the verified Jaccard (an int/int IEEE
    division, bit-identical both engines), per-source normalization
    through a DECIMAL-accumulated degree (sql_sum — mirroring the
    operator's exact_sum, the only way a float out-degree can be
    order-insensitive). The iteration chain is IDENTICAL in both
    variants — the weight never appears past ``nrm``."""
    from ..functions.exact import sql_sum
    from .logs import PAGERANK_D, PAGERANK_ITERS, PAGERANK_RESET

    # every r{{i}} is referenced THREE times (dangling sum, contrib
    # join, next node list) and nrm once PER iteration: left to the
    # planner's inlining heuristic the pair derivation re-expands
    # per reference (measured: the inlined chain ran minutes at
    # sf0.001 vs sub-second materialized) — AS MATERIALIZED is the
    # oracle's equivalent of the Spark side's localCheckpoint.
    its = []
    prev = "r0"
    for i in range(1, PAGERANK_ITERS + 1):
        its.append(f"""
    ds{i} AS MATERIALIZED (
      SELECT COALESCE(CAST(SUM(CAST(pr AS DECIMAL(30,6))) AS DOUBLE), 0.0) AS ds
      FROM {prev} WHERE NOT has_out
    ),
    r{i} AS MATERIALIZED (
      SELECT p.node, p.has_out,
             {PAGERANK_RESET} + {PAGERANK_D}
               * (COALESCE(c.s, 0.0) + x.ds / nn.n) AS pr
      FROM {prev} p CROSS JOIN ds{i} x CROSS JOIN nn
      LEFT JOIN (
        SELECT nrm.dst AS node, {sql_sum("q.pr * nrm.p")} AS s
        FROM nrm JOIN {prev} q ON q.node = nrm.src AND q.has_out
        GROUP BY nrm.dst
      ) c ON c.node = p.node
    )""")
        prev = f"r{i}"
    jac = (
        "CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)"
        " / len(list_distinct(list_concat(a.s, b.s)))"
    )
    if weighted:
        edge_cte = f"""
    wpairs AS MATERIALIZED (
      SELECT bf.da AS doc_a, bf.db AS doc_b, {jac} AS jaccard
      FROM bf JOIN sh a ON bf.da = a.doc_id
              JOIN sh b ON bf.db = b.doc_id
      WHERE {jac} >= {JACCARD_THRESHOLD}
    ),
    e AS (SELECT doc_a AS src, doc_b AS dst, jaccard AS w FROM wpairs
          UNION ALL SELECT doc_b, doc_a, jaccard FROM wpairs),
    degt AS (SELECT src, {sql_sum('w')} AS deg FROM e GROUP BY 1),
    nrm AS MATERIALIZED (
      SELECT e.src, e.dst, e.w / d.deg AS p
      FROM e JOIN degt d USING (src)),"""
    else:
        edge_cte = """
    e AS (SELECT doc_a AS src, doc_b AS dst, 1 AS w FROM exact_pairs
          UNION ALL SELECT doc_b, doc_a, 1 FROM exact_pairs),
    degt AS (SELECT src, SUM(w) AS deg FROM e GROUP BY 1),
    nrm AS MATERIALIZED (
      SELECT e.src, e.dst,
             CAST(e.w AS DOUBLE) / CAST(d.deg AS DOUBLE) AS p
      FROM e JOIN degt d USING (src)),"""
    return f"""
    WITH {SQL_SHINGLES3},
    {SQL_EXACT_PAIRS},{edge_cte}
    srcs AS (SELECT DISTINCT src AS node FROM nrm),
    nd AS (SELECT d.doc_id AS node, s.node IS NOT NULL AS has_out
           FROM documents d LEFT JOIN srcs s ON d.doc_id = s.node),
    nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nd),
    r0 AS MATERIALIZED (SELECT node, has_out, 1.0 AS pr FROM nd),
    {",".join(its)}
    SELECT node AS doc_id, pr / nn.n AS pagerank
    FROM {prev} CROSS JOIN nn
    """


@register(
    "doc_pagerank",
    oracle=_sql_doc_pagerank(),
    doc="PageRank over the corpus-sized document similarity graph — "
    "the iterative-join path proven at CORPUS vertex scale (r11 "
    "VERDICT #2). Nodes = every document (most are dangling "
    "singletons: the redistribute term is load-bearing, not "
    "decorative); edges = the exact prefix-filter threshold pairs "
    "(symmetrized, unit weight) — the similarity graph a dedup run "
    "already materializes, here re-consumed to rank documents by "
    "duplication centrality (a boilerplate-detection signal: high "
    "rank = the hub of a near-dup neighborhood). Contrast "
    "behavior_pagerank, whose 25-node graph rides broadcast joins: "
    "HERE each of the K=5 steps SHUFFLES the corpus-sized rank table "
    "into a co-partitioned merge join against the once-partitioned "
    "edge table — zero BroadcastHashJoin in the loop (plan-pinned), "
    "the only broadcast the 1-row dangling-mass scalar. Ranks are "
    "carried scaled by N so the decimal-accumulation quantum stays "
    "relative at any corpus size; the oracle divides once at the "
    "end, exactly as the operator does. 100 TB: per-iteration cost "
    "= one rank shuffle + one edge-key aggregate, both linear in "
    "edges; lineage localCheckpoint-truncated per step.",
    tags=("documents", "graph", "dedup", "prefix-filter", "agg"),
)
def doc_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank_partitioned
    from .logs import PAGERANK_D, PAGERANK_ITERS, PAGERANK_RESET

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    pairs = prefix_filter_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .withColumn("w", F.lit(1))
    )
    nodes = docs.select(F.col("doc_id").alias("node"))
    pr = pagerank_partitioned(
        nodes,
        edges,
        iters=PAGERANK_ITERS,
        d=float(PAGERANK_D),
        reset=float(PAGERANK_RESET),
        num_partitions=DOC_PR_PARTITIONS,
    )
    return pr.select(F.col("node").alias("doc_id"), "pagerank")


@register(
    "doc_pagerank_weighted",
    oracle=_sql_doc_pagerank(weighted=True),
    doc="Jaccard-WEIGHTED PageRank over the document similarity graph "
    "(r12 VERDICT #5): edge weight = the verified Jaccard from the "
    "prefix-filter table, normalized per source, through the SAME "
    "pagerank_partitioned loop as doc_pagerank — rank flows in "
    "proportion to similarity mass, so a hub tightly duplicated by "
    "its neighborhood outranks one loosely touching many docs: the "
    "curation signal the unit-weight loop only approximates. Proves "
    "the operator weight-generic: the only float-weight hazard is "
    "the out-degree sum, which the operator decimal-accumulates "
    "(order-insensitive), letting the oracle mirror the whole chain "
    "bit-for-bit — w itself is an int/int IEEE division and the "
    "iteration CTEs are shared verbatim with the unit-weight oracle. "
    "Scale shape identical to doc_pagerank: edges partitioned once, "
    "per-step one rank shuffle into a co-partitioned merge join, "
    "zero BroadcastHashJoin in the loop.",
    tags=("documents", "graph", "dedup", "prefix-filter", "agg"),
)
def doc_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank_partitioned
    from .logs import PAGERANK_D, PAGERANK_ITERS, PAGERANK_RESET

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    pairs = prefix_filter_pairs(spark, sf_dir).select("doc_a", "doc_b", "jaccard")
    edges = pairs.select(
        F.col("doc_a").alias("src"),
        F.col("doc_b").alias("dst"),
        F.col("jaccard").alias("w"),
    ).union(
        pairs.select(
            F.col("doc_b").alias("src"),
            F.col("doc_a").alias("dst"),
            F.col("jaccard").alias("w"),
        )
    )
    nodes = docs.select(F.col("doc_id").alias("node"))
    pr = pagerank_partitioned(
        nodes,
        edges,
        iters=PAGERANK_ITERS,
        d=float(PAGERANK_D),
        reset=float(PAGERANK_RESET),
        num_partitions=DOC_PR_PARTITIONS,
    )
    return pr.select(F.col("node").alias("doc_id"), "pagerank")


# -- weighted label-propagation communities over the similarity graph ----

LP_ROUNDS = 3


def _sql_doc_communities() -> str:
    """Chained-CTE mirror of operators/graph.label_propagation over the
    jaccard-weighted similarity graph: one (votes, winners, labels) CTE
    triple per synchronous round. The per-label weight sum is
    decimal-accumulated (sql_sum = the operator's exact_sum), so the
    argmax both engines rank is over bit-identical doubles; the winner
    is ROW_NUMBER ordered (ws DESC, lab) — the window twin of the
    operator's max(struct(ws, -lab))."""
    from ..functions.exact import sql_sum

    jac = (
        "CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)"
        " / len(list_distinct(list_concat(a.s, b.s)))"
    )
    rounds = []
    prev = "l0"
    for i in range(1, LP_ROUNDS + 1):
        rounds.append(f"""
    v{i} AS (
      SELECT e.dst AS node, l.lab AS lab, {sql_sum('e.w')} AS ws
      FROM e JOIN {prev} l ON l.node = e.src
      GROUP BY 1, 2
    ),
    w{i} AS (
      SELECT node, lab
      FROM (SELECT node, lab,
                   ROW_NUMBER() OVER (PARTITION BY node
                                      ORDER BY ws DESC, lab) AS rn
            FROM v{i})
      WHERE rn = 1
    ),
    l{i} AS MATERIALIZED (
      SELECT p.node, COALESCE(w{i}.lab, p.lab) AS lab
      FROM {prev} p LEFT JOIN w{i} ON p.node = w{i}.node
    )""")
        prev = f"l{i}"
    return f"""
    WITH {SQL_SHINGLES3},
    {SQL_EXACT_PAIRS},
    wpairs AS MATERIALIZED (
      SELECT bf.da AS doc_a, bf.db AS doc_b, {jac} AS jaccard
      FROM bf JOIN sh a ON bf.da = a.doc_id
              JOIN sh b ON bf.db = b.doc_id
      WHERE {jac} >= {JACCARD_THRESHOLD}
    ),
    e AS (SELECT doc_a AS src, doc_b AS dst, jaccard AS w FROM wpairs
          UNION ALL SELECT doc_b, doc_a, jaccard FROM wpairs),
    l0 AS (SELECT doc_id AS node, doc_id AS lab FROM documents),
    {",".join(rounds)}
    SELECT l.node AS doc_id, l.lab AS community, s.ct AS community_size
    FROM {prev} l JOIN (SELECT lab, COUNT(*) AS ct FROM {prev} GROUP BY lab) s
      ON l.lab = s.lab
    """


@register(
    "doc_communities",
    oracle=_sql_doc_communities(),
    doc=f"Weighted label-propagation communities over the document "
    f"similarity graph — {LP_ROUNDS} synchronous rounds of "
    "operators/graph.label_propagation on the same jaccard-weighted "
    "verified-pair edges doc_pagerank_weighted ranks. One rung finer "
    "than dedup_clusters' connected components: each doc adopts the "
    "label with the LARGEST incident similarity mass (ties to the "
    "smallest label), so a weak bridge between two dense near-dup "
    "neighborhoods no longer fuses them into one cluster — the "
    "community granularity a curation pass actually samples from. "
    "Deterministic end to end: fixed round count, decimal-accumulated "
    "vote sums, integer tie-breaks — the oracle re-derives every round "
    "as chained CTEs. Scale shape = the partitioned rank loop's: edges "
    "partitioned once and persisted, per round one node-sized label "
    "shuffle into co-partitioned merge joins, zero broadcast in the "
    "loop, lineage checkpoint-truncated.",
    tags=("documents", "graph", "dedup", "prefix-filter", "agg"),
)
def doc_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import label_propagation

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    pairs = prefix_filter_pairs(spark, sf_dir).select("doc_a", "doc_b", "jaccard")
    edges = pairs.select(
        F.col("doc_a").alias("src"),
        F.col("doc_b").alias("dst"),
        F.col("jaccard").alias("w"),
    ).union(
        pairs.select(
            F.col("doc_b").alias("src"),
            F.col("doc_a").alias("dst"),
            F.col("jaccard").alias("w"),
        )
    )
    nodes = docs.select(F.col("doc_id").alias("node"))
    lab = label_propagation(
        nodes, edges, iters=LP_ROUNDS, num_partitions=DOC_PR_PARTITIONS
    )
    sizes = lab.groupBy("lab").agg(F.count("*").alias("community_size"))
    return lab.join(sizes, "lab").select(
        F.col("node").alias("doc_id"),
        F.col("lab").alias("community"),
        "community_size",
    )


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {SQL_SHINGLES3},
    {SQL_LSH_CANDIDATES},
    pairs AS (
      SELECT doc_a, doc_b
      FROM cand JOIN sh a ON cand.doc_a = a.doc_id
                JOIN sh b ON cand.doc_b = b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / len(list_distinct(list_concat(a.s, b.s))) >= {JACCARD_THRESHOLD}
    ),
    e AS (SELECT doc_a AS s, doc_b AS d FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach(n, r) AS (
      SELECT s, s FROM e
      UNION
      SELECT e.d, reach.r FROM reach JOIN e ON e.s = reach.n
    ),
    comp AS (SELECT n AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY n)
    SELECT doc_id, cluster_id, cluster_size
    FROM comp JOIN (SELECT cluster_id, COUNT(*) AS cluster_size
                    FROM comp GROUP BY cluster_id) sz USING (cluster_id)
    """,
    doc="Dedup cluster assignment — the step after pairwise detection: "
    "connected components over the verified LSH near-dup pairs "
    "(min-label propagation + pointer jumping, O(log diameter) rounds "
    "of bounded node-keyed shuffles — the large-star/small-star shape, "
    "never a driver-side graph), keeper = min doc per component. The "
    "oracle re-derives components with a recursive reachability CTE.",
    tags=("dedup", "lsh", "graph"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import with_cluster_sizes

    return with_cluster_sizes(
        corpus_components(spark, sf_dir), num_partitions=CC_PARTITIONS
    )


@register(
    "dedup_survivors",
    oracle=f"""
    WITH RECURSIVE {SQL_SHINGLES3},
    {SQL_LSH_CANDIDATES},
    pairs AS (
      SELECT doc_a, doc_b
      FROM cand JOIN sh a ON cand.doc_a = a.doc_id
                JOIN sh b ON cand.doc_b = b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / len(list_distinct(list_concat(a.s, b.s))) >= {JACCARD_THRESHOLD}
    ),
    e AS (SELECT doc_a AS s, doc_b AS d FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach(n, r) AS (
      SELECT s, s FROM e
      UNION
      SELECT e.d, reach.r FROM reach JOIN e ON e.s = reach.n
    ),
    comp AS (SELECT n AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY n)
    SELECT doc_id, TRUE AS was_clustered FROM comp WHERE doc_id = cluster_id
    UNION ALL
    SELECT d.doc_id, FALSE AS was_clustered FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM comp)
    """,
    doc="End-to-end dedup output — the corpus that survives "
    "deduplication: every document not in any near-dup cluster, plus "
    "exactly one canonical representative (min doc_id) per cluster. "
    "Composition of the LSH candidate join, Jaccard verify, and "
    "connected components, finished with one doc-keyed left join "
    "against the corpus — the shape of a production 'write the deduped "
    "dataset' job, where everything upstream is bucketed/bounded and "
    "the final pass is a hash join on the id.",
    tags=("dedup", "lsh", "graph"),
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents")
    comp = corpus_components(spark, sf_dir)
    docs = t["documents"].select("doc_id")
    return (
        docs.join(comp, docs["doc_id"] == comp["node"], "left")
        .filter(F.col("node").isNull() | (F.col("node") == F.col("comp")))
        .select("doc_id", F.col("node").isNotNull().alias("was_clustered"))
    )


@register(
    "dedup_token_retention",
    oracle=f"""
    WITH RECURSIVE {SQL_SHINGLES3},
    {SQL_LSH_CANDIDATES},
    pairs AS (
      SELECT doc_a, doc_b
      FROM cand JOIN sh a ON cand.doc_a = a.doc_id
                JOIN sh b ON cand.doc_b = b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / len(list_distinct(list_concat(a.s, b.s))) >= {JACCARD_THRESHOLD}
    ),
    e AS (SELECT doc_a AS s, doc_b AS d FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach(n, r) AS (
      SELECT s, s FROM e
      UNION
      SELECT e.d, reach.r FROM reach JOIN e ON e.s = reach.n
    ),
    comp AS (SELECT n AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY n),
    kept AS (
      SELECT doc_id FROM comp WHERE doc_id = cluster_id
      UNION ALL
      SELECT d.doc_id FROM documents d
      WHERE d.doc_id NOT IN (SELECT doc_id FROM comp)
    ),
    tok AS (SELECT doc_id, len(t) AS n_toks FROM toks)
    SELECT d.source,
           COUNT(*) AS docs_total,
           CAST(SUM(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_kept,
           CAST(SUM(n_toks) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN k.doc_id IS NOT NULL THEN n_toks ELSE 0 END) AS BIGINT)
             AS tokens_kept
    FROM documents d
    JOIN tok USING (doc_id)
    LEFT JOIN kept k USING (doc_id)
    GROUP BY d.source
    """,
    doc="What deduplication costs each source's token mixture — the "
    "report a data-recipe owner reads next to domain_mixture_weights "
    "before retraining on a deduped corpus: per provenance source, "
    "document and token counts before and after LSH dedup "
    "(survivors = min-id representative per near-dup cluster + every "
    "unclustered doc, exactly dedup_survivors' rule). Same bounded "
    "pair/CC machinery as the dedup itself plus one doc-keyed left "
    "join and one grouped agg — nothing here outgrows the dedup run "
    "it reports on.",
    tags=("dedup", "lsh", "graph", "audit"),
)
def dedup_token_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import textops
    from ..operators.partitioning import spread

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"]
    comp = corpus_components(spark, sf_dir)
    tokc = textops.with_tokens(spread(docs.select("doc_id", "source", "text"), "doc_id")).select(
        "doc_id", "source", F.size("toks").alias("n_toks")
    )
    j = tokc.join(comp, tokc["doc_id"] == comp["node"], "left")
    kept = F.col("node").isNull() | (F.col("node") == F.col("comp"))
    return j.groupBy("source").agg(
        F.count("*").alias("docs_total"),
        F.sum(kept.cast("bigint")).alias("docs_kept"),
        F.sum(F.col("n_toks").cast("bigint")).alias("tokens_total"),
        F.sum(F.when(kept, F.col("n_toks")).otherwise(0).cast("bigint")).alias("tokens_kept"),
    )


@register(
    "simhash_fingerprint",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({SQL_TOKS}) AS tok FROM documents
    ), h AS (
      SELECT doc_id,
             (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 4096
           + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) * 256
           + (strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(md5(tok), 4, 1)) - 1) AS hv
      FROM toks
    ), votes AS (
      SELECT doc_id, j,
             SUM(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h, (SELECT unnest(range(0, {D.SIMHASH_BITS})) AS j) jj
      GROUP BY doc_id, j
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS simhash
    FROM votes
    GROUP BY doc_id
    """,
    doc=f"SimHash ({D.SIMHASH_BITS}-bit) document fingerprint: per-token "
    "md5 bit votes -> sign vector packed to a long. Explode + two "
    "grouped aggregations — shuffle-parallel, no per-doc state.",
    tags=("dedup", "simhash"),
)
def simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents")
    return D.simhash(t["documents"], "doc_id", "text")


# -- incremental (new-batch vs corpus) dedup ----------------------------

NEW_MOD = 5  # fixture split: doc_id % 5 == 0 is the "incoming batch"


@register(
    "dedup_incremental",
    oracle=f"""
    WITH {SQL_SHINGLES3},
    {SQL_LSH_BANDS},
    cstat AS (
      SELECT b, bk, COUNT(*) AS bct, MIN(doc_id) AS rep
      FROM bands WHERE doc_id % {NEW_MOD} != 0
      GROUP BY b, bk
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
      FROM bands a
      JOIN bands c ON a.b = c.b AND a.bk = c.bk
      JOIN cstat ON cstat.b = c.b AND cstat.bk = c.bk
      WHERE a.doc_id % {NEW_MOD} = 0 AND c.doc_id % {NEW_MOD} != 0
        AND (cstat.bct <= {D.MAX_BUCKET} OR c.doc_id = cstat.rep)
    )
    SELECT doc_a, doc_b,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
    FROM cand JOIN sh a ON cand.doc_a = a.doc_id
              JOIN sh b ON cand.doc_b = b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(list_concat(a.s, b.s))) >= {JACCARD_THRESHOLD}
    """,
    doc="Incremental dedup — the continuous-ingest shape: an incoming "
    "batch (doc_id % 5 == 0 stands in for 'today's crawl') is checked "
    "against the existing corpus by joining its MinHash band keys "
    "against the corpus signature table, then Jaccard-verifying only "
    "the cross-set candidates. Cost is proportional to the new batch "
    "and its bucket overlap — corpus^2 never appears, and the corpus "
    "side is a precomputed signature table a production pipeline "
    "materializes once (operators/dedup.lsh_band_keys).",
    tags=("dedup", "lsh", "incremental"),
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = corpus_shingles(spark, sf_dir)
    bands = corpus_band_keys(spark, sf_dir)
    new_b = bands.filter(F.col("doc_id") % NEW_MOD == 0)
    corp_b = bands.filter(F.col("doc_id") % NEW_MOD != 0)
    cand = D.lsh_candidates_against(new_b, corp_b)
    return D.jaccard_verify(sh, cand).filter(F.col("jaccard") >= JACCARD_THRESHOLD)


@register(
    "lsh_bucket_audit",
    oracle=f"""
    WITH {SQL_SHINGLES3},
    {SQL_LSH_BANDS},
    bsz AS (SELECT b, bk, COUNT(*) AS sz FROM bands GROUP BY b, bk)
    SELECT sz AS bucket_size,
           COUNT(*) AS n_buckets,
           CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS cand_pairs,
           CAST(SUM(CASE WHEN sz > {D.MAX_BUCKET}
                         THEN sz - 1 ELSE sz * (sz - 1) // 2 END)
                AS BIGINT) AS kept_pairs,
           sz > {D.MAX_BUCKET} AS capped
    FROM bsz
    GROUP BY sz
    """,
    doc="LSH bucket-occupancy audit — the observability half of the "
    "hot-bucket guard (operators/dedup.MAX_BUCKET): the band-key "
    "occupancy histogram, the m*(m-1)/2 candidate-pair cost each "
    "occupancy level implies, which levels the cap collapses to "
    "representative pairs, and the m-1 pairs each capped bucket keeps "
    "(kept_pairs vs cand_pairs is the quadratic work the guard saved). "
    "Two grouped aggregations over the band table, bucket-keyed then "
    "size-keyed.",
    tags=("dedup", "lsh", "audit"),
)
def lsh_bucket_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the corpus-scoped band table IS the materialization barrier the
    # 16-minhash stage needs (the r4 lesson: without it Catalyst
    # re-evaluates the tokenizer ~11x per row — 27 s vs 1.4 s at sf0.1)
    bsz = corpus_band_keys(spark, sf_dir).groupBy("band", "bk").agg(F.count("*").alias("sz"))
    return bsz.groupBy("sz").agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.expr("sz * (sz - 1) div 2")).cast("long").alias("cand_pairs"),
        F.sum(
            F.expr(
                f"CASE WHEN sz > {D.MAX_BUCKET} THEN sz - 1"
                " ELSE sz * (sz - 1) div 2 END"
            )
        )
        .cast("long")
        .alias("kept_pairs"),
    ).select(
        F.col("sz").alias("bucket_size"),
        "n_buckets",
        "cand_pairs",
        "kept_pairs",
        (F.col("sz") > D.MAX_BUCKET).alias("capped"),
    )


@register(
    "near_dup_rate_by_source",
    oracle=f"""
    WITH {SQL_SHINGLES3},
    {SQL_LSH_CANDIDATES},
    vp AS (
      SELECT doc_a, doc_b
      FROM cand JOIN sh a ON cand.doc_a = a.doc_id
                JOIN sh b ON cand.doc_b = b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / len(list_distinct(list_concat(a.s, b.s))) >= {JACCARD_THRESHOLD}
    ),
    partners AS (
      SELECT doc_a AS doc_id FROM vp UNION SELECT doc_b FROM vp
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           COUNT(p.doc_id) AS n_near_dup
    FROM documents d LEFT JOIN partners p USING (doc_id)
    GROUP BY d.source
    """,
    doc="Near-duplication rate per provenance `source` — the curation "
    "audit a crawl pipeline reports before dropping a feed: verified "
    "near-dup membership (LSH candidates + Jaccard verify, bounded as "
    "everywhere) aggregated over the source dimension with one "
    "id-keyed left join and one shuffle on source.",
    tags=("dedup", "lsh", "audit"),
)
def near_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"]
    sh = corpus_shingles(spark, sf_dir)
    vp = (
        D.jaccard_verify(sh, D.lsh_pairs_from_bands(corpus_band_keys(spark, sf_dir)))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    partners = (
        vp.select(F.col("doc_a").alias("doc_id"))
        .union(vp.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("_m", F.lit(1))
    )
    return (
        docs.select("doc_id", "source")
        .join(partners, "doc_id", "left")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.count("_m").alias("n_near_dup"))
    )


@register(
    "minhash_estimate_audit",
    oracle=f"""
    WITH {SQL_SHINGLES3},
    {SQL_LSH_CANDIDATES},
    agr AS (
      SELECT doc_a, doc_b,
             CAST(len(list_filter(list_transform(range(1, {D.MINHASH_K} + 1),
                                                 i -> a.m[i] = b.m[i]),
                                  x -> x)) AS INTEGER) AS agree_ct
      FROM cand JOIN mh a ON cand.doc_a = a.doc_id
                JOIN mh b ON cand.doc_b = b.doc_id
    ),
    vj AS (
      SELECT cand.doc_a, cand.doc_b,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
      FROM cand JOIN sh a ON cand.doc_a = a.doc_id
                JOIN sh b ON cand.doc_b = b.doc_id
    )
    SELECT agree_ct,
           agree_ct / {D.MINHASH_K}.0 AS est_jaccard,
           COUNT(*) AS n_pairs,
           CAST(SUM(CAST(jaccard AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
             AS mean_jaccard
    FROM agr JOIN vj USING (doc_a, doc_b)
    GROUP BY agree_ct
    """,
    doc=f"MinHash estimator calibration — same cross-method-audit family "
    "as ann_recall_ivf and lang_id_confusion: for every LSH candidate "
    "pair, the signature-agreement estimate (matching positions / "
    f"{D.MINHASH_K}) is binned against the decimal-accumulated mean of "
    "the EXACT shingle Jaccard. The curve that decides whether k=16 "
    "signatures are enough before a 100 TB dedup run trusts them. "
    "Shapes: the signature table is materialized once and feeds both "
    "banding and agreement (minhash_sigs/band_keys_from_sigs); the "
    "audit itself is two pair-keyed joins over the capped candidate "
    "set — audit cost tracks candidates, never corpus².",
    tags=("dedup", "lsh", "audit"),
)
def minhash_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = corpus_shingles(spark, sf_dir)
    # one corpus-scoped signature pass feeds banding AND agreement
    sigs = corpus_sigs(spark, sf_dir)
    pairs = D.lsh_pairs_from_bands(corpus_band_keys(spark, sf_dir))
    est = (
        pairs.join(sigs.select(F.col("doc_id").alias("doc_a"), F.col("mh").alias("ma")), "doc_a")
        .join(sigs.select(F.col("doc_id").alias("doc_b"), F.col("mh").alias("mb")), "doc_b")
        .withColumn(
            "agree_ct",
            F.size(F.filter(F.zip_with("ma", "mb", lambda x, y: x == y), lambda b: b)),
        )
        .select("doc_a", "doc_b", "agree_ct")
    )
    verified = D.jaccard_verify(sh, pairs)
    return (
        est.join(verified, ["doc_a", "doc_b"])
        .groupBy("agree_ct")
        .agg(
            F.count("*").alias("n_pairs"),
            (F.sum(F.col("jaccard").cast("decimal(30,6)")).cast("double") / F.count("*")).alias(
                "mean_jaccard"
            ),
        )
        .select(
            "agree_ct",
            (F.col("agree_ct") / F.lit(float(D.MINHASH_K))).alias("est_jaccard"),
            "n_pairs",
            "mean_jaccard",
        )
    )


DUP_COV_HIGH = 0.5


@register(
    "duplicate_ngram_coverage",
    oracle=f"""
    WITH {SQL_SHINGLES3},
    {SQL_SHEX},
    cov AS (
      SELECT doc_id,
             COUNT(*) AS n_shingles,
             CAST(SUM(CASE WHEN doc_ct >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS dup_shingles
      FROM shex JOIN shcnt USING (gh)
      GROUP BY doc_id
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(CAST(dup_shingles AS DOUBLE) / n_shingles
                         AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
             AS mean_dup_cov,
           CAST(SUM(CASE WHEN CAST(dup_shingles AS DOUBLE) / n_shingles
                              >= {DUP_COV_HIGH} THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_high
    FROM cov JOIN documents d USING (doc_id)
    GROUP BY d.source
    """,
    doc="Duplicate-n-gram coverage per source — the Gopher/RefinedWeb "
    "boilerplate signal: for each document, the fraction of its "
    "distinct 3-gram shingles that also occur in at least one OTHER "
    "document; aggregated per provenance source (decimal-exact mean + "
    f"count of docs above {DUP_COV_HIGH}). Unlike the pairwise dedup "
    "queries this is an inverted-index shape — explode to (doc, "
    "shingle-hash), one count shuffle on the fixed-width 16-hex hash "
    "key, one join back, one doc-keyed agg — linear in total shingles "
    "with no self-join, so it runs corpus-wide at 100 TB where "
    "pairwise metrics must be capped. Docs with fewer than 3 tokens "
    "have no shingles and are excluded by construction.",
    tags=("dedup", "text", "audit"),
)
def duplicate_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"]
    # the corpus-scoped shingle-hash table is the materialization
    # barrier the explode needs (feeding the staged tokenize->shingle
    # chain straight into Generate re-inlines it — measured 20 s vs
    # 2.4 s + 0.4 s at sf0.1) AND the shared inverted-index base for
    # corpus_build's coverage gate + dup_coverage_histogram
    exh = corpus_shingle_hashes(spark, sf_dir)
    cnt = exh.groupBy("gh").agg(F.count("*").alias("doc_ct"))
    cov = (
        exh.join(cnt, "gh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("doc_ct") >= 2, 1).otherwise(0)).alias("dup_shingles"),
        )
        .withColumn("dup_cov", F.col("dup_shingles").cast("double") / F.col("n_shingles"))
    )
    return (
        cov.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            (F.sum(F.col("dup_cov").cast("decimal(30,6)")).cast("double") / F.count("*")).alias(
                "mean_dup_cov"
            ),
            F.sum(F.when(F.col("dup_cov") >= DUP_COV_HIGH, 1).otherwise(0)).alias("docs_high"),
        )
    )


# -- exact substring-level dedup (Lee et al. ExactSubstr) ----------------


def _sql_substr_res_tail(L: int | None = None) -> str:
    """The wide/res CTE tail of the substring-dedup derivation —
    requires ``toks`` (doc_id, t, ...) and ``st`` (doc_id, starts) in
    scope; shared verbatim by the batch oracle and the incremental
    stream's unrolled per-epoch oracle (the Spark twins share
    operators/dedup.substring_cut_rows the same way). ``L`` defaults
    to the engine constant; the run length is a PARAMETER of the
    derivation (Lee et al. use L=50 tokens), not a baked constant —
    substring_dedup_l16 certifies a second instance."""
    L = D.SUBSTR_RUN if L is None else L
    return f"""
    wide AS (
      SELECT t.doc_id, t.t, len(t.t) AS n_tokens,
             COALESCE(s.starts, CAST([] AS BIGINT[])) AS starts
      FROM toks t LEFT JOIN st s USING (doc_id)
    ),
    res AS (
      SELECT doc_id, n_tokens,
             CASE WHEN len(starts) > 0 THEN
               list_sum(list_transform(range(1, len(starts) + 1),
                 i -> CASE WHEN i = 1 THEN {L}
                      ELSE least({L}, starts[i] - starts[i-1]) END))
             ELSE 0 END AS n_removed,
             CASE WHEN len(starts) = 0 THEN 0
                  WHEN len(starts) = 1 THEN 1
                  ELSE 1 + len(list_filter(range(2, len(starts) + 1),
                       i -> starts[i] - starts[i-1] > {L})) END AS n_spans,
             md5(COALESCE(array_to_string(
               list_filter(t, (x, i) ->
                 len(list_filter(starts,
                     s -> s <= i - 1 AND i - 1 < s + {L})) = 0), ' '), '')) AS cut_hash
      FROM wide
    )"""


def _sql_substring_cut(L: int | None = None) -> str:
    """The full-corpus per-doc substring-dedup derivation as DuckDB
    CTEs ending in ``res`` (doc_id, n_tokens, n_removed, n_spans,
    cut_hash) — the exact mirror of operators/dedup.substring_cut:
    same window hash, same interval-union fold over sorted starts,
    same 0-based keep test (DuckDB lambda indexes are 1-based, hence
    the i - 1 in the shared tail). ``L`` parameterizes the run
    length end to end (window build + tail)."""
    L = D.SUBSTR_RUN if L is None else L
    return f"""
    toks AS (SELECT doc_id, {SQL_TOKS} AS t FROM documents),
    gr AS (SELECT doc_id, t, unnest(range(1, len(t) - {L} + 2)) AS i FROM toks),
    grams AS (SELECT doc_id, i - 1 AS pos,
                     substr(md5(array_to_string(t[i:i+{L - 1}], ' ')), 1, 16) AS gh
              FROM gr),
    dup AS (SELECT gh FROM (SELECT gh, COUNT(DISTINCT doc_id) AS dc
                            FROM grams GROUP BY gh) WHERE dc >= 2),
    st AS (SELECT doc_id, list_sort(list(pos)) AS starts
           FROM grams JOIN dup USING (gh) GROUP BY doc_id),
    {_sql_substr_res_tail(L)}"""


@register(
    "substring_dedup",
    oracle=f"""
    WITH {_sql_substring_cut()}
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_removed AS BIGINT) AS n_removed,
           CAST(n_spans AS BIGINT) AS n_spans, cut_hash
    FROM res
    """,
    doc="Exact substring-level dedup — the Lee et al. (2022) "
    "ExactSubstr recipe the catalog's duplicate_ngram_coverage only "
    "AUDITED (it measured duplicate mass; this removes it): every "
    "maximal token run >= L that repeats across documents is cut, "
    "the rest of each document kept. Distributed via sorted-shingle "
    "adjacency (the scalable suffix-array stand-in): length-L "
    "windows keyed by 16-hex hash, repeated windows mark covered "
    "positions, interval-union per doc = exactly the tokens inside "
    "some >= L duplicated run. Linear in total shingles — one count "
    "shuffle + one doc-keyed agg, NO pair join: the boilerplate "
    "block that makes pairwise dedup quadratic costs one hot "
    "map-side-combined count cell here. Emits the per-doc audit row "
    "with the cut corpus content-addressed (cut_hash pins every "
    "kept token, so the green row certifies the REMOVAL, not just "
    "the counts). All-integer + hex surface: bit-identity needs no "
    "decimal bridge.",
    tags=("documents", "dedup", "substring", "text"),
)
def substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    cut = D.substring_cut(docs, "doc_id", "text")
    return cut.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_removed").cast("long").alias("n_removed"),
        F.col("n_spans").cast("long").alias("n_spans"),
        "cut_hash",
    )


SUBSTR_RUN_LONG = 16  # the second certified L (Lee et al. use 50)


@register(
    "substring_dedup_l16",
    oracle=f"""
    WITH {_sql_substring_cut(SUBSTR_RUN_LONG)}
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_removed AS BIGINT) AS n_removed,
           CAST(n_spans AS BIGINT) AS n_spans, cut_hash
    FROM res
    """,
    doc="substring_dedup at L=16 — certifying that the run length is "
    "a PARAMETER of the whole derivation (operator + oracle), not a "
    "baked constant (r12 VERDICT #6; Lee et al. run L=50 tokens in "
    "production). Same linear sorted-shingle-adjacency pipeline, "
    "wider windows: coverage at 2L is a SUBSET of coverage at L "
    "(every duplicated >=2L run is made of duplicated >=L runs over "
    "the same tokens — hypothesis-pinned), so raising L only ever "
    "keeps more text; the per-doc rows here differ from the L=8 row "
    "exactly where a repeated run is >= 8 but < 16 tokens long.",
    tags=("documents", "dedup", "substring", "text"),
)
def substring_dedup_l16(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    cut = D.substring_cut(docs, "doc_id", "text", run_len=SUBSTR_RUN_LONG)
    return cut.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_removed").cast("long").alias("n_removed"),
        F.col("n_spans").cast("long").alias("n_spans"),
        "cut_hash",
    )


@register(
    "substring_dedup_audit",
    oracle=f"""
    WITH {_sql_substring_cut()}
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN r.n_removed > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_affected,
           CAST(SUM(r.n_tokens) AS BIGINT) AS tok_total,
           CAST(SUM(r.n_removed) AS BIGINT) AS tok_removed,
           CAST(SUM(r.n_spans) AS BIGINT) AS spans_total,
           CASE WHEN SUM(r.n_tokens) > 0
                THEN CAST(SUM(r.n_removed) AS DOUBLE) / SUM(r.n_tokens)
           END AS removal_rate
    FROM res r JOIN documents d USING (doc_id)
    GROUP BY d.source
    """,
    doc="Removal audit for substring_dedup, grouped by source: how "
    "much token mass the cut removes and how it concentrates — the "
    "go/no-go read a production run checks before committing a cut "
    "corpus (a source losing half its mass is a crawl-config bug, "
    "not dedup). removal_rate is one integer-ratio double division "
    "(identical bits both engines), zero-guarded per the "
    "lsh_recall_exact precedent. Same linear pipeline as "
    "substring_dedup plus one source-keyed agg.",
    tags=("documents", "dedup", "substring", "stats"),
)
def substring_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    cut = D.substring_cut(docs, "doc_id", "text")
    return (
        cut.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("n_removed") > 0, 1).otherwise(0)).alias(
                "docs_affected"
            ),
            F.sum("n_tokens").alias("tok_total"),
            F.sum("n_removed").alias("tok_removed"),
            F.sum("n_spans").alias("spans_total"),
        )
        .select(
            "source",
            "n_docs",
            "docs_affected",
            "tok_total",
            "tok_removed",
            "spans_total",
            F.when(
                F.col("tok_total") > 0,
                F.col("tok_removed").cast("double") / F.col("tok_total"),
            ).alias("removal_rate"),
        )
    )


# -- named corpus-scoped setups (bench ledger lines; see catalog.SETUPS)


@register_setup("lsh_signature_store")
def _setup_lsh_signature_store(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the shingle -> minhash-signature -> band-key chain —
    the tables a production corpus stores once (SCALE.md); every
    MinHash-family query joins them instead of re-hashing the corpus."""
    corpus_band_keys(spark, sf_dir).count()
    corpus_shingles(spark, sf_dir).count()


@register_setup("lsh_components")
def _setup_lsh_components(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the verified near-dup connected components — the
    corpus's dedup decision, consumed by the cluster/survivor/
    retention/corpus_build family."""
    corpus_components(spark, sf_dir).count()


@register_setup("shingle_hash_index")
def _setup_shingle_hash_index(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the exploded 16-hex shingle-hash inverted-index
    base shared by the duplicate-coverage family."""
    corpus_shingle_hashes(spark, sf_dir).count()


@register_setup("prefix_pair_table")
def _setup_prefix_pair_table(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the exact prefix-filter threshold-join pair set —
    the ground-truth table `prefix_filter_near_dup` emits and
    `lsh_recall_exact` measures the LSH candidates against."""
    prefix_filter_pairs(spark, sf_dir).count()
