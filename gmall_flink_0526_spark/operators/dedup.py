"""Deduplication operators for training-data pipelines.

Four families, each a plain DataFrame op that scales by partitioning:

- exact: hash-groupBy on a canonical text digest (one shuffle).
- MinHash + LSH: shingle -> k minhashes -> banded bucket keys ->
  self-join on (band, key) for candidates -> exact Jaccard verify.
  Only candidate pairs are verified, never the full O(n^2) cross join —
  this is the property that survives a 100x scale-up.
- SimHash: per-token hash bit-votes -> fingerprint; near-dups share
  fingerprints (or differ in few bits).
- Embedding cosine near-dup: bucket by a coarse key (here the label /
  IVF centroid) and compare only within buckets.

All hashing is md5-hex (portable: identical in Spark, DuckDB, Python),
and all reductions are min/sum over arrays — JVM expressions, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .cache import scoped_persist
from .partitioning import bounded_broadcast, spread
from .textops import shingles, tokenize

MINHASH_K = 16
LSH_BANDS = 4
LSH_ROWS = MINHASH_K // LSH_BANDS
HASH_PREFIX = 16  # hex chars of md5 kept per minhash

# Hot-bucket guard: an LSH bucket shared by m documents yields
# m*(m-1)/2 candidate pairs — quadratic work AQE can only parallelize,
# never shrink. Buckets past this occupancy are boilerplate by
# definition (identical navigation chrome, license headers, templated
# pages) and are CAPPED to representative-based dedup: instead of the
# m*(m-1)/2 self-join pairs, a hot bucket contributes the m-1 pairs
# (rep, member) against its min-id representative — linear, and a
# bucket of 200+ NEAR-duplicates (not exact copies) still dedups
# against the representative instead of silently passing through.
# Exact/chunk dedup (plans/llmprep.chunk_dedup) catches what the
# representative misses (member-to-member dups not similar to the
# rep). Every production-scale LSH dedup caps this way.
MAX_BUCKET = 200


def hot_bucket_split(
    bands: DataFrame,
    keys: tuple[str, ...],
    id_col: str,
    max_bucket: int,
    carry: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """Split a bucket-key table into (normal rows, hot-bucket rep pairs).

    Normal rows (bucket occupancy <= ``max_bucket``) go to the usual
    self-join. Each hot bucket is collapsed to the m-1 representative
    pairs ``(rep=min id, member)`` — linear in bucket size — returned
    as a frame with columns ``(_rep_id, <id_col>)`` plus, for every
    name in ``carry``, the member's column and the representative's as
    ``_rep_<name>`` (taken from the min-id row via a struct-min, so
    the representative's payload rides along for verification).

    Occupancy + struct-min come from a grouped agg that PARTIAL-
    aggregates map-side — a pathological mega-bucket contributes one
    partial row per input partition instead of funneling every member
    through one window task. Only the HOT buckets' stats (past the
    cap — boilerplate tail, by construction a tiny fraction of
    distinct bucket keys) are broadcast back — through
    :func:`~..partitioning.bounded_broadcast`, because the hot table
    is bounded only by ``n_rows / max_bucket``: on a pathological
    corpus where many buckets barely exceed the cap it could outgrow
    Spark's broadcast hard cap, so past the row guard the hint is
    dropped (warned) and the annotation join shuffles instead of
    failing the job. On the sane path the join stays map-side and
    ``bands`` keeps its incoming partitioning; the
    first exchange of bucket rows stays the candidate self-join's own,
    which now never sees a hot bucket. NULL bucket keys never match
    the broadcast side and land in ``normal``, where the equality
    self-join drops them — same rule the oracles' joins apply natively
    (callers with nullable keys filter first to keep the rule
    explicit).
    """
    hot = (
        bands.groupBy(*keys)
        .agg(
            F.count("*").alias("_bct"),
            F.min(F.struct(F.col(id_col), *[F.col(c) for c in carry])).alias("_repst"),
        )
        .filter(F.col("_bct") > max_bucket)
        .drop("_bct")
    )
    ann = bands.join(bounded_broadcast(hot, what="hot-bucket stats"), list(keys), "left")
    normal = ann.filter(F.col("_repst").isNull()).select(*bands.columns)
    rep_pairs = (
        ann.filter(
            F.col("_repst").isNotNull()
            & (F.col(id_col) > F.col("_repst")[id_col])
        )
        .select(
            F.col("_repst")[id_col].alias("_rep_id"),
            F.col(id_col),
            *[F.col("_repst")[c].alias(f"_rep_{c}") for c in carry],
            *[F.col(c) for c in carry],
        )
    )
    return normal, rep_pairs


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: md5-groupBy; keeper = min id per digest group."""
    return (
        df.withColumn("text_hash", F.md5(F.col(text_col)))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("dup_ct"),
            F.min(F.col(id_col)).alias("keeper_id"),
        )
    )


def doc_shingles(docs: DataFrame, id_col: str, text_col: str, ngram: int = 3) -> DataFrame:
    """(doc_id, s=array of distinct n-gram shingles), built in two
    staged projections so tokenize and the shingle window each run
    exactly once per row (see textops.tokenize's lambda-inlining note —
    the unstaged form is O(tokens x shingles x k) regex splits)."""
    docs = spread(docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")), "doc_id")
    toks = docs.select("doc_id", tokenize(F.col("_t")).alias("toks"))
    return toks.select("doc_id", F.array_distinct(shingles(F.col("toks"), ngram)).alias("s"))


def _seeded_minhash(shingles_col, seed: int):
    # seed is bound by this enclosing function, NOT a lambda default:
    # a two-parameter lambda (``lambda s, seed=i``) makes PySpark pass
    # the ARRAY INDEX as the second argument — the "seed" becomes a
    # Column whose repr gets baked into the literal, silently turning
    # the signature into unstable garbage.
    return F.array_min(
        F.transform(
            shingles_col,
            lambda s: F.substring(F.md5(F.concat(F.lit(f"{seed}#"), s)), 1, HASH_PREFIX),
        )
    )


def minhash_signature(shingles_col, k: int = MINHASH_K):
    """Array of k minhashes over a *materialized* shingle-array column:
    seed-prefixed md5, lexicographic min per seed. Matches the Python
    model ``min(md5(f"{seed}#{x}")[:HASH_PREFIX] for x in shingles)``
    and the DuckDB oracle's list_aggregate(..., 'min')."""
    return F.array(*[_seeded_minhash(shingles_col, i) for i in range(k)])


def minhash_sigs(sh: DataFrame) -> DataFrame:
    """(doc_id, mh): the k-minhash signature table over a shingle
    DataFrame (doc_id, s). Split out of :func:`lsh_band_keys` so
    consumers that need BOTH the signatures and the band keys (the
    estimator-calibration audit) materialize the expensive signature
    stage exactly once."""
    return (
        sh.filter(F.size("s") > 0)
        .select("doc_id", minhash_signature(F.col("s")).alias("mh"))
        .filter(F.col("mh")[0].isNotNull())
    )


def band_keys_from_sigs(sigs: DataFrame) -> DataFrame:
    """(doc_id, band, bk) from an (already materialized) signature
    table (doc_id, mh) — the banding half of :func:`lsh_band_keys`."""
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws("|", *[F.col("mh")[b * LSH_ROWS + r] for r in range(LSH_ROWS)])
                        ).alias("bk"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bk")


def lsh_band_keys(sh: DataFrame) -> DataFrame:
    """(doc_id, band, bk): banded MinHash bucket keys over a shingle
    DataFrame (doc_id, s). This is the signature table a production
    corpus materializes ONCE and keeps — both one-shot self-join dedup
    and incremental new-vs-corpus dedup are joins against it."""
    return band_keys_from_sigs(minhash_sigs(sh))


def lsh_pairs_from_bands(
    bands: DataFrame,
    max_bucket: int | None = MAX_BUCKET,
    *,
    keys: tuple[str, ...] = ("band", "bk"),
    id_col: str = "doc_id",
    out: tuple[str, str] = ("doc_a", "doc_b"),
) -> DataFrame:
    """Candidate pairs from an (already materialized/persisted) bucket-key
    table: hot buckets capped to their min-id representative's m-1
    pairs (see :data:`MAX_BUCKET` / :func:`hot_bucket_split`), normal
    buckets self-joined on the bucket key, id-ordered, distinct.

    The ``keys``/``id_col``/``out`` parameters make this the one banded
    self-join for every LSH family — MinHash (band, bk)/doc_id and
    random-hyperplane (band, bsig)/vec_id share the cap wiring."""
    if max_bucket is None:
        rep_pairs = None
    else:
        bands, rep = hot_bucket_split(bands, keys, id_col, max_bucket)
        rep_pairs = rep.select(
            F.col("_rep_id").alias(out[0]), F.col(id_col).alias(out[1])
        )
    a = bands.alias("a")
    b = bands.alias("b")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    for k in keys:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    pairs = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias(out[0]), F.col(f"b.{id_col}").alias(out[1])
    )
    if rep_pairs is not None:
        pairs = pairs.unionByName(rep_pairs)
    return pairs.distinct()


def lsh_candidate_pairs(sh: DataFrame) -> DataFrame:
    """MinHash LSH over a shingle DataFrame (doc_id, s) -> candidate
    pairs. Persist ``sh`` at the call site when it is also used for
    verification.

    The self-join is on the band bucket key, so Spark hash-partitions
    on (band, key): candidate generation is a single co-partitioned
    shuffle, and skewed buckets are split by AQE. Bands are persisted so
    the self-join's two sides don't recompute the signatures.
    """
    # scoped: released when the next catalog query starts (cache.py) —
    # ReuseExchange does NOT cover this self-join (measured), persist
    # halves candidate-generation time by computing signatures once
    return lsh_pairs_from_bands(scoped_persist(lsh_band_keys(sh)))


def lsh_candidates_against(
    new_bands: DataFrame,
    corpus_bands: DataFrame,
    max_bucket: int | None = MAX_BUCKET,
) -> DataFrame:
    """Incremental LSH candidates: new-batch band keys joined against
    the corpus signature table — cost is proportional to the NEW batch
    and its bucket overlap, never to corpus^2. (doc_a = new doc,
    doc_b = corpus doc.)

    The hot-bucket cap applies to the CORPUS side: the store is what
    grows without bound, and a boilerplate store bucket of m docs costs
    batch x m pairs per micro-batch forever. A hot corpus bucket is
    capped to its min-id REPRESENTATIVE row (not dropped): each new
    doc still pairs against one stored row per hot bucket, so a store
    bucket of 200+ near-duplicates keeps deduping incoming copies at
    batch x 1 cost instead of silently letting them through. The batch
    side is bounded by the micro-batch contract and stays uncapped. To
    keep the store un-shuffled (the property that holds at 100 TB),
    the occupancy count runs AFTER a broadcast semi-join down to the
    buckets the batch touches — every corpus row of a touched bucket
    survives that semi-join, so the restricted count equals the true
    store occupancy for exactly the buckets that matter, at overlap
    cost. The count is a grouped agg (map-side partial — a hot store
    bucket contributes one partial row per partition, not m rows
    through one window task) and only the HOT buckets' (key, rep)
    rows come back broadcast, so the store side never exchanges —
    the :func:`hot_bucket_split` form, keep-rep flavored.

    The hot table is bounded only by touched-buckets / ``max_bucket``
    — on a pathological store (many buckets barely past the cap) it
    could outgrow the broadcast hard cap, so the hint goes through
    :func:`~..partitioning.bounded_broadcast` like its
    ``hot_bucket_split`` twin: past the row guard the annotation join
    shuffles (warned) instead of failing the job. Streaming callers
    drain the guard's scoped persist per epoch (see the incremental
    apps' ``finally``); the ``touched`` batch-side broadcast below
    stays raw — bounded by the micro-batch contract."""
    if max_bucket is not None:
        touched = F.broadcast(new_bands.select("band", "bk").distinct())
        corpus_touched = corpus_bands.join(touched, ["band", "bk"], "left_semi")
        hot = (
            corpus_touched.groupBy("band", "bk")
            .agg(F.count("*").alias("_bct"), F.min("doc_id").alias("_rep"))
            .filter(F.col("_bct") > max_bucket)
            .select("band", "bk", "_rep")
        )
        corpus_bands = (
            corpus_touched.join(
                bounded_broadcast(hot, what="corpus hot-bucket reps"), ["band", "bk"], "left"
            )
            .filter(F.col("_rep").isNull() | (F.col("doc_id") == F.col("_rep")))
            .drop("_rep")
        )
    a = new_bands.alias("a")
    b = corpus_bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bk") == F.col("b.bk"))
            # re-ingesting an already-stored doc_id must not self-match
            # (jaccard 1.0 with itself would drop every replayed doc)
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_verify(sh: DataFrame, pairs: DataFrame, sh_b: DataFrame | None = None) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs, given the shingle
    DataFrame (doc_id, s) — persist it at the call site if it also fed
    candidate generation. Int cardinalities -> deterministic double
    ratio.

    ``sh_b`` (optional): a separate shingle frame for the ``doc_b``
    side. Incremental dedup passes the (persisted) batch shingles as
    ``sh`` and the corpus signature store as ``sh_b`` — each side is
    then scanned exactly once, instead of a union scanned twice."""
    # the intersect/union folds are the heavy stage; a blocked-pairs
    # input built via broadcast join inherits the scan's split count
    pairs = spread(pairs, "doc_a")
    j = (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("s", "sa"), "doc_a")
        .join(
            (sh if sh_b is None else sh_b)
            .withColumnRenamed("doc_id", "doc_b")
            .withColumnRenamed("s", "sb"),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sa", "sb")).cast("double")
            / F.size(F.array_union("sa", "sb")),
        )
    )
    return j.select("doc_a", "doc_b", "jaccard")


def prefix_filter_candidates(sh: DataFrame, threshold: float) -> DataFrame:
    """Candidate pairs for an EXACT Jaccard-threshold self-join via
    prefix filtering (the PPJoin family's core principle): order each
    doc's shingles by ascending global frequency (ties by value), keep
    the prefix of length n - ceil(t*n) + 1, and emit (doc_a < doc_b)
    pairs whose prefixes share a shingle and pass the necessary size
    condition t * |larger| <= |smaller|. COMPLETE by the prefix
    principle — any pair with J >= t shares a prefix shingle under a
    common total order — so downstream exact verification loses
    nothing (hypothesis-pinned against a brute-force model; the
    catalog's `prefix_filter_near_dup` oracle re-proves it per
    corpus). Scale shape: the prefix explode carries ~(1-t) of each
    doc's shingles and those are its RAREST — a hot boilerplate
    shingle sorts to the END of every prefix order and never
    generates candidates, so candidate buckets stay small without any
    cap (contrast lsh_pairs_from_bands' MAX_BUCKET rep cap, which is
    a deliberate loss). Production adds PPJoin's positional filter —
    pruning only; completeness is unaffected.

    The threshold is interpreted as the nearest rational with
    denominator <= 1e9 and BOTH bounds run in exact BIGINT arithmetic
    — float ceil would shorten the prefix whenever fl(t*n) rounds up
    across an integer (IEEE 0.8 * 15 = 12.000000000000002, ceil 13
    vs the canonical 12: one prefix element lost = possible false
    negatives), and the float size bound rejects the borderline
    |small| = t*|large| pair the same way. Integer ceil and
    cross-multiplication have no such edge."""
    pref = prefix_rows(sh, threshold)
    return _prefix_pairs_from(pref, pref, threshold)


def prefix_rows(sh: DataFrame, threshold: float, order: str = "df") -> DataFrame:
    """(doc_id, g, n): each doc's prefix shingles of length
    n - ceil(t*n) + 1 under a COMMON TOTAL ORDER, plus its shingle
    count — the reusable half of :func:`prefix_filter_candidates`.

    ``order="df"`` is the production rarity order (ascending global
    frequency, ties by value): hot shingles sort to the END of every
    prefix window and rarely enter one — the pruning that keeps
    candidate buckets small. ``order="hash"`` orders by the shingle's
    16-hex md5 (ties by value): a CONTENT-DEFINED order that never
    changes as the corpus grows, so a doc's prefix can be computed
    ONCE at arrival and stored — the property the incremental
    similarity-graph app needs (a df order would re-prefix the whole
    corpus every batch as frequencies shift). COMPLETENESS holds for
    ANY common total order (the prefix principle only needs both docs
    of a qualifying pair ordered the same way — hypothesis-pinned for
    both orders); the hash order just gives up the rarity pruning,
    which production recovers by running exact dedup first."""
    from fractions import Fraction

    from pyspark.sql import Window as W

    fr = Fraction(threshold).limit_denominator(10**9)
    num, den = fr.numerator, fr.denominator
    tok = sh.select("doc_id", F.explode("s").alias("g"))
    if order == "df":
        dfreq = tok.groupBy("g").agg(F.count("*").alias("df"))
        tok = tok.join(dfreq, "g")
        w = W.partitionBy("doc_id").orderBy("df", "g")
    elif order == "hash":
        tok = tok.withColumn("_hk", F.substring(F.md5("g"), 1, 16))
        w = W.partitionBy("doc_id").orderBy("_hk", "g")
    else:
        raise ValueError(f"prefix_rows: unknown order {order!r}")
    sizes = sh.select("doc_id", F.size("s").alias("n"))
    # prefix length n - ceil(t*n) + 1 with exact integer ceil
    ceil_tn = F.expr(f"(cast({num} as bigint) * n + {den} - 1) div {den}")
    return (
        tok.select("doc_id", "g", F.row_number().over(w).alias("pos"))
        .join(sizes, "doc_id")
        .filter(F.col("pos") <= F.col("n") - ceil_tn + 1)
        .select("doc_id", "g", "n")
    )


def _prefix_pairs_from(
    pref_a: DataFrame, pref_b: DataFrame, threshold: float
) -> DataFrame:
    """Candidate pairs between two prefix-row tables (same order,
    same threshold): shared prefix shingle + the necessary size bound
    in exact cross-multiplied integers."""
    from fractions import Fraction

    fr = Fraction(threshold).limit_denominator(10**9)
    num, den = fr.numerator, fr.denominator
    a, b = pref_a.alias("a"), pref_b.alias("b")
    return (
        a.join(b, "g")
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            # necessary size condition for J >= t: t * |larger| <= |smaller|,
            # cross-multiplied into exact integers
            & (
                F.lit(num).cast("long") * F.greatest("a.n", "b.n")
                <= F.lit(den).cast("long") * F.least("a.n", "b.n")
            )
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def prefix_filter_candidates_against(
    pref_new: DataFrame, pref_all: DataFrame, threshold: float
) -> DataFrame:
    """Candidate pairs with at least one side from ``pref_new``,
    against ``pref_all`` (which INCLUDES the new side, so in-batch
    pairs surface too) — the incremental form: a pair qualifies at
    the epoch its LATER doc arrives, when both docs are present under
    the same (content-defined) prefix order, so accumulating these
    per epoch reconstructs the full-corpus threshold join exactly.
    Pairs are normalized (doc_a = smaller id) and deduped; arrival
    order and id order are independent (a new doc may carry a smaller
    id than stored docs), hence the least/greatest instead of
    prefix_filter_candidates' a < b."""
    from fractions import Fraction

    fr = Fraction(threshold).limit_denominator(10**9)
    num, den = fr.numerator, fr.denominator
    a, b = pref_new.alias("a"), pref_all.alias("b")
    return (
        a.join(b, "g")
        .filter(
            (F.col("a.doc_id") != F.col("b.doc_id"))
            & (
                F.lit(num).cast("long") * F.greatest("a.n", "b.n")
                <= F.lit(den).cast("long") * F.least("a.n", "b.n")
            )
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


# -- exact substring-level dedup (the Lee et al. "ExactSubstr" recipe) --
#
# Deduplicating Training Data Makes Language Models Better (Lee et al.
# 2022) removes any >= L-token run that repeats across the corpus,
# keeping the rest of the document — finer-grained than whole-doc
# near-dup removal (a unique article quoting a boilerplate license
# keeps the article, loses the license). The paper builds a suffix
# array; the distributed stand-in is SORTED-SHINGLE ADJACENCY: every
# length-L token window, keyed by content hash — a window repeated
# across >= 2 documents marks L covered positions in each, and the
# union of covered positions is exactly the set of tokens lying inside
# SOME duplicated run of length >= L (a maximal duplicated run of
# length m >= L contributes m - L + 1 duplicated windows whose union
# re-covers all m tokens). Linear in total shingles — one count
# shuffle on the 16-hex window key, one doc-keyed agg, NO pair join:
# the 600-copy boilerplate block that makes pairwise dedup quadratic
# costs this operator nothing but a hot count cell (map-side
# combined).

SUBSTR_RUN = 8  # L: minimum duplicated token-run length removed


def gram_positions(docs: DataFrame, id_col: str, text_col: str, run_len: int = SUBSTR_RUN) -> DataFrame:
    """(doc_id, pos, gh): every length-``run_len`` token window with
    its 0-based start position; gh = 16-hex md5 of the space-joined
    window (shuffles move fixed-width keys, never window text)."""
    return gram_positions_from(doc_tokens(docs, id_col, text_col), run_len)


def gram_positions_from(toks: DataFrame, run_len: int = SUBSTR_RUN) -> DataFrame:
    """:func:`gram_positions` over an already-staged (doc_id, toks)
    frame — callers that also need the token frame for the cut pass
    (substring_cut, the streaming app) tokenize ONCE and feed both."""
    return toks.select(
        "doc_id", F.posexplode(shingles(F.col("toks"), run_len)).alias("pos", "g")
    ).select("doc_id", "pos", F.substring(F.md5("g"), 1, 16).alias("gh"))


def duplicated_run_starts(grams: DataFrame, min_docs: int = 2) -> DataFrame:
    """(doc_id, starts): per document, the SORTED 0-based start
    positions of its windows that repeat in >= ``min_docs`` distinct
    documents. The count is a two-stage distinct aggregate on the hash
    key (map-side partials); the join back moves only (pos, gh)."""
    dup = (
        grams.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("dc"))
        .filter(F.col("dc") >= min_docs)
        .select("gh")
    )
    return (
        grams.join(dup, "gh")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("starts"))
    )


def substring_cut(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    run_len: int = SUBSTR_RUN,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document substring-dedup result: (doc_id, n_tokens,
    n_removed, n_spans, cut_hash).

    - n_removed: tokens inside some cross-doc duplicated run — the
      union of [s, s+L) over the sorted starts, folded as
      sum(min(L, s_i - s_{i-1})) (first start contributes L): exact
      interval-union size without materializing per-token rows.
    - n_spans: maximal duplicated regions (a new region starts when
      the gap to the previous start exceeds L — overlap OR adjacency
      merge, so two abutting runs are one contiguous removed region).
    - cut_hash: md5 of the kept tokens (space-joined) — the cut
      corpus itself, content-addressed so the certified row stays
      bytes-small while pinning every kept token. The keep test is
      O(tokens x starts) per document — bounded by doc length squared
      WITHIN one row, never cross-doc; production corpora with
      megabyte docs would binary-search the sorted starts instead.

    Documents with no duplicated window pass through whole
    (n_removed = 0, cut_hash = hash of all tokens). Tokenization is
    the engine's standard fold (lowercase, whitespace), so the cut
    text is canonical token text, not raw bytes — the audit, not the
    re-emitted corpus, is the certified surface.
    """
    # ONE staged tokenize feeds both the window pass and the cut pass
    # (scoped-persisted: the regex split is the per-byte cost here)
    toks = scoped_persist(doc_tokens(docs, id_col, text_col))
    starts = duplicated_run_starts(gram_positions_from(toks, run_len), min_docs)
    return substring_cut_rows(toks, starts, run_len)


def doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, toks): the spread+staged tokenize projection shared by
    the per-window and per-doc passes."""
    base = spread(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")),
        "doc_id",
    )
    return base.select("doc_id", tokenize(F.col("_t")).alias("toks"))


def substring_cut_rows(
    toks: DataFrame, starts: DataFrame, run_len: int = SUBSTR_RUN
) -> DataFrame:
    """The per-doc cut/audit projection given an externally-derived
    duplicated-start table — split out of :func:`substring_cut` so the
    incremental streaming app can feed starts computed against its
    epoch-store window index while sharing the exact expression tree
    (same fold, same keep test, same hash)."""
    L = run_len
    j = toks.join(starts, "doc_id", "left").select(
        "doc_id",
        "toks",
        F.coalesce(F.col("starts"), F.array().cast("array<int>")).alias("starts"),
    )
    st = F.col("starts")
    k = F.size(st)
    # interval-union size over same-length sorted intervals
    contrib = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.when(i == 1, F.lit(L)).otherwise(
            F.least(F.lit(L), F.element_at(st, i) - F.element_at(st, i - 1))
        ),
    )
    n_removed = F.when(
        k > 0, F.aggregate(contrib, F.lit(0), lambda a, x: a + x)
    ).otherwise(F.lit(0))
    # maximal regions: breaks where the gap exceeds L (sequence(2, k)
    # guarded — Spark's sequence(2, 1) would count DOWN)
    n_spans = (
        F.when(k == 0, F.lit(0))
        .when(k == 1, F.lit(1))
        .otherwise(
            F.lit(1)
            + F.size(
                F.filter(
                    F.sequence(F.lit(2), k),
                    lambda i: F.element_at(st, i) - F.element_at(st, i - 1) > L,
                )
            )
        )
    )
    kept = F.filter(
        F.col("toks"),
        lambda t, i: ~F.exists(st, lambda s: (s <= i) & (i < s + F.lit(L))),
    )
    return j.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        n_removed.alias("n_removed"),
        n_spans.alias("n_spans"),
        F.md5(F.concat_ws(" ", kept)).alias("cut_hash"),
    )


SIMHASH_BITS = 16


def simhash(docs: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash fingerprint: per-token md5 -> first bits//4 hex chars ->
    bit votes (+1/-1 per occurrence) -> sign vector packed to a long.

    Implementation is explode + two grouped aggregations — pure
    shuffle-based, no per-doc state, so it scales with partitions.
    The input is spread first: the chain fans every token out x
    ``bits`` vote rows, so a single-split scan (one parquet file
    locally; a heavily-filtered scan at scale) would otherwise pin
    tokens x bits of CPU onto ONE task — the r16-adjudicated cause of
    simhash_near_dup's bench drift (the doc_tokens precedent).
    """
    nhex = bits // 4
    base = spread(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")),
        "doc_id",
    )
    tok = base.select("doc_id", F.explode(tokenize(F.col("_t"))).alias("tok"))
    hv = tok.withColumn("hv", F.conv(F.substring(F.md5("tok"), 1, nhex), 16, 10).cast("long"))
    votes = (
        hv.select(
            "doc_id",
            "hv",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
        )
        .withColumn("vote", F.when(F.expr("(hv >> j) & 1") == 1, 1).otherwise(-1))
        .groupBy("doc_id", "j")
        .agg(F.sum("vote").alias("s"))
    )
    return votes.groupBy("doc_id").agg(
        # shift in BIGINT: a plain 1 << j is an INT shift and wraps
        # negative at j=31, diverging from any 64-bit oracle
        F.sum(F.when(F.col("s") > 0, F.expr("CAST(1 AS BIGINT) << j")).otherwise(0))
        .cast("long")
        .alias("simhash")
    )


def simhash_near_dup_pairs(
    fp: DataFrame,
    bits: int = SIMHASH_BITS,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int | None = MAX_BUCKET,
) -> DataFrame:
    """Near-dup pairs from simhash fingerprints: banded candidate join +
    exact Hamming verify.

    Pigeonhole: two fingerprints within ``max_hamming`` (< ``bands``)
    bit flips agree on at least one of ``bands`` equal-width bit bands,
    so candidates = pairs sharing (band_index, band_value) — an
    equi-join hash-partitioned on the band key, never all-pairs (the
    multi-index simhash recipe). Verify = popcount(xor) on candidates
    only. ``fp`` needs columns (doc_id, simhash). Hot (band, value)
    buckets past ``max_bucket`` are capped to their min-id
    representative's m-1 pairs (carrying the representative's
    fingerprint for the Hamming verify) — the same quadratic-blowup
    guard as the MinHash path (:data:`MAX_BUCKET` /
    :func:`hot_bucket_split`).
    """
    width = bits // bands
    mask = (1 << width) - 1
    banded = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.expr(f"(simhash >> {b * width}) & {mask}").alias("bv"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.b", "bb.bv")
    if max_bucket is None:
        rep_cand = None
    else:
        banded, rep = hot_bucket_split(
            banded, ("b", "bv"), "doc_id", max_bucket, carry=("simhash",)
        )
        rep_cand = rep.select(
            F.col("_rep_id").alias("doc_a"),
            F.col("doc_id").alias("doc_b"),
            F.col("_rep_simhash").alias("sa"),
            F.col("simhash").alias("sb"),
        )
    a, c = banded.alias("a"), banded.alias("c")
    cand = a.join(
        c,
        (F.col("a.b") == F.col("c.b"))
        & (F.col("a.bv") == F.col("c.bv"))
        & (F.col("a.doc_id") < F.col("c.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("c.doc_id").alias("doc_b"),
        F.col("a.simhash").alias("sa"),
        F.col("c.simhash").alias("sb"),
    )
    if rep_cand is not None:
        cand = cand.unionByName(rep_cand)
    cand = cand.distinct()
    return (
        cand.withColumn("hamming", F.expr("bit_count(sa ^ sb)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def contaminated_docs(
    docs: DataFrame,
    eval_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
    grams: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any
    ``ngram``-token shingle with an evaluation set.

    ``eval_pred`` is a Column predicate over ``docs`` selecting the
    eval side; the complement is the training side. The (expensive)
    shingle pass runs ONCE over the whole corpus — scoped-persisted —
    then both sides reduce to (id, shingle-md5) and meet in one
    equi-join on the hash: the same bucketed shape as LSH candidates.
    Eval hashes are distinct'd (broadcast-sized in practice); no
    document ever compares against another directly. Output:
    (doc_id, hit_ct) per contaminated training doc.

    ``grams`` (optional): an externally materialized ``(doc_id, gh)``
    gram-hash table for the SAME (docs, ngram) — the corpus-scoped
    index a production pipeline stores next to its LSH signatures, so
    the decon family shares one shingle pass instead of each query
    repeating it. ``eval_pred`` must be expressible over ``doc_id``
    (every catalog caller's is).
    """
    if grams is None:
        sh = scoped_persist(doc_shingles(docs, id_col, text_col, ngram=ngram))
        grams = sh.select("doc_id", F.explode("s").alias("g")).withColumn("gh", F.md5("g"))
    train = grams.filter(~eval_pred).select("doc_id", "gh")
    ev = grams.filter(eval_pred).select("gh").distinct()
    return train.join(ev, "gh").groupBy("doc_id").agg(F.count("*").alias("hit_ct"))


# -- Bloom-prefiltered decontamination ----------------------------------
#
# `contaminated_docs` ships EVERY training shingle into an equi-join
# against the eval gram table — correct, but at 100 TB the train side
# of that join is the whole corpus's shingle stream. The standard
# production fix is a Bloom filter: collapse the eval set's gram
# hashes into a fixed-size bitset (here 2^14 bits = 2 KiB), ship the
# bitset to every executor, and drop >99% of train shingles MAP-SIDE
# before anything shuffles; only bloom-positive shingles reach the
# exact verification join, so the output is still EXACT (the bloom
# only over-approximates). The bitset is built from md5 slices, so
# the whole filter — positions, packing, membership — is bit-identical
# in Spark, DuckDB and Python, which is what lets the oracle re-derive
# the candidate counts (false positives included) and not just the
# verified hits.
BLOOM_BITS_MIN_LOG2 = 14  # filter floor: 2^14 bits = 2 KiB
BLOOM_LOAD = 16           # target bits per eval gram (fp ~1e-3 per gram)
BLOOM_WORD = 32        # bits packed per word (shift < 32: no engine overflows)
BLOOM_HASHES = 3       # independent positions = 8-hex-char md5 slices


def bloom_width(eval_grams: int) -> int:
    """Filter width for an eval set of ``eval_grams`` distinct gram
    hashes: the next power of two >= BLOOM_LOAD bits per gram, floored
    at 2^BLOOM_BITS_MIN_LOG2 — the SemDeDup-adaptive-k precedent
    applied to the sketch: the width SCALES with the benchmark side
    (still tiny next to the corpus: ~2 MB per 10^6 eval grams), so the
    per-gram false-positive rate stays ~1e-3 at every scale instead of
    saturating. Integer-exact (bit_length, no libm), so DuckDB
    re-derives the identical width from COUNT(*)."""
    if eval_grams <= 0:
        return 1 << BLOOM_BITS_MIN_LOG2
    return 1 << max(BLOOM_BITS_MIN_LOG2, (BLOOM_LOAD * eval_grams - 1).bit_length())


def eval_gram_count(
    docs: DataFrame,
    eval_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 5,
) -> int:
    """Distinct eval-side gram-hash count — THE quantity
    :func:`bloom_width` sizes the filter from, defined once so
    :func:`bloom_decontaminate`'s self-derived width and a caller's
    memoized width can never drift (same shingling, same md5, same
    distinct). EAGER: one small count job; the eval predicate pushes
    to the scan so only the benchmark slice is read."""
    # scoped persist before the explode — the plan barrier that stops
    # CollapseProject re-inlining tokenize into the shingle lambda
    # (per-element re-evaluation; textops.tokenize's note)
    ev_sh = scoped_persist(
        doc_shingles(docs.filter(eval_pred), id_col, text_col, ngram=ngram)
    )
    return int(
        ev_sh.select(F.explode("s").alias("g"))
        .select(F.md5("g").alias("gh"))
        .agg(F.countDistinct("gh"))
        .collect()[0][0]
    )


def _bloom_positions(gh, bits: int):
    """BLOOM_HASHES bit positions for one md5-hex column: consecutive
    8-hex-char slices parsed as integers, mod the filter width."""
    return [
        F.conv(F.substring(gh, 1 + 8 * i, 8), 16, 10).cast("long") % bits
        for i in range(BLOOM_HASHES)
    ]


def _bloom_bit(p_name: str):
    """Single-bit mask (as BIGINT) for the staged position column
    named ``p_name`` — shift stays < BLOOM_WORD, inside every
    engine's defined range."""
    return F.expr(
        f"shiftleft(cast(1 as bigint), cast(pmod({p_name}, {BLOOM_WORD}) as int))"
    )


def bloom_word_table(gram_hashes: DataFrame, bits: int) -> DataFrame:
    """Packed Bloom word table from a column of md5 gram hashes: every
    hash contributes BLOOM_HASHES bit positions, positions pack into
    bits/BLOOM_WORD words by bit-or. One map-side-combinable grouped
    agg, <= bits/BLOOM_WORD result rows. OR-MERGEABLE: the word table
    of a union of gram sets equals the per-set tables bit-or'd per
    word — which is what lets the streaming ``bloom_filter_app``
    maintain the filter as an epoch-addressed store (the CMS
    precedent, with bit_or for addition). ``gram_hashes`` must expose
    the hash as column ``gh``."""
    return (
        gram_hashes.select(
            F.explode(F.array(*_bloom_positions(F.col("gh"), bits))).alias("p")
        )
        .select(F.floor(F.col("p") / BLOOM_WORD).alias("w"), _bloom_bit("p").alias("m"))
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("bits"))
    )


def bloom_decontaminate(
    docs: DataFrame,
    eval_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 5,
    bits: int | None = None,
    bloom_words: DataFrame | None = None,
    grams: DataFrame | None = None,
) -> DataFrame:
    """Decontamination with a Bloom prefilter on the train side.

    Same INPUTS as :func:`contaminated_docs` (one corpus-wide shingle
    pass, eval side = ``eval_pred``) but a WIDER output: a row per
    training doc with >=1 bloom-CANDIDATE shingle, which includes docs
    whose only candidates are Bloom false positives (``hit_ct = 0``).
    A consumer using the doc_id set as a kill list (the way
    ``corpus_build`` consumes ``contaminated_docs``) MUST filter
    ``hit_ct >= 1`` first — the unfiltered set would purge clean
    documents. The rows with ``hit_ct >= 1`` are exactly
    ``contaminated_docs``' output. Train shingles are screened against
    a Bloom bitset of the eval gram hashes:

    1. eval gram hashes -> BLOOM_HASHES positions each -> bit-or into
       bits/BLOOM_WORD packed words — a table sized by the BENCHMARK
       side only (~half a row per eval gram), tiny next to the corpus;
    2. every train shingle probes its BLOOM_HASHES words through
       broadcast left joins — map-side, no shuffle of the train side;
    3. only shingles with ALL probe bits set (bloom candidates: true
       hits + deterministic false positives) reach the exact
       verification join against the distinct eval hashes.

    ``bits`` is the filter width; when None it is derived from the
    eval side via :func:`bloom_width` — EAGER (one small count job
    over the eval docs only, predicate pushed to the scan; callers
    that know the width pass it and stay lazy). ``bloom_words``
    optionally supplies an EXTERNALLY MAINTAINED (w, bits) word table
    — e.g. the OR-merged view of the streaming ``bloom_filter_app``'s
    epoch store — instead of building it here; it MUST have been
    built with the same ``bits`` width and over (a superset of) the
    eval grams, or the screen loses its no-false-negative guarantee.
    The exact verification join against the distinct eval hashes is
    unconditional either way, so a superset filter only costs false
    candidates, never wrong output. Output per training
    doc with >=1 bloom-candidate shingle: (doc_id, cand_ct, hit_ct) —
    candidate vs exactly-verified shingle counts; cand_ct - hit_ct is
    the false-positive overhead actually paid, the number a 100 TB
    operator watches to size the width.
    """
    if bits is None:
        bits = bloom_width(eval_gram_count(docs, eval_pred, id_col, text_col, ngram))
    if grams is None:
        # ``grams``: same external-index contract as contaminated_docs'
        sh = scoped_persist(doc_shingles(docs, id_col, text_col, ngram=ngram))
        grams = sh.select("doc_id", F.explode("s").alias("g")).withColumn("gh", F.md5("g"))
    ev = grams.filter(eval_pred).select("gh").distinct()

    if bloom_words is not None:
        bloom = bloom_words  # externally maintained, width contract above
    else:
        bloom = bloom_word_table(ev, bits)
    # one guard + persist shared by the three probe joins: the word
    # table is bounded by bits/BLOOM_WORD (~n_ev/2 rows), but a
    # pathologically large eval set should degrade to a shuffled probe
    # join, not an OOM
    guard = bounded_broadcast(bloom, what="bloom word table")

    cand = grams.filter(~eval_pred).select("doc_id", "gh")
    for i, p in enumerate(_bloom_positions(F.col("gh"), bits)):
        cand = cand.withColumn(f"_p{i}", p)
    for i in range(BLOOM_HASHES):
        cand = cand.withColumn(
            f"_w{i}", F.floor(F.col(f"_p{i}") / BLOOM_WORD)
        ).withColumn(f"_m{i}", _bloom_bit(f"_p{i}"))
    for i in range(BLOOM_HASHES):
        side = guard.select(
            F.col("w").alias(f"_bw{i}"), F.col("bits").alias(f"_bits{i}")
        )
        cand = cand.join(side, cand[f"_w{i}"] == side[f"_bw{i}"], "left")
    keep = None
    for i in range(BLOOM_HASHES):
        hit = F.col(f"_bits{i}").bitwiseAND(F.col(f"_m{i}")) != 0
        hit = F.coalesce(hit, F.lit(False))
        keep = hit if keep is None else (keep & hit)
    cand = cand.filter(keep).select("doc_id", "gh")

    verified = cand.join(
        ev.select(F.col("gh"), F.lit(1).alias("_hit")), "gh", "left"
    )
    return verified.groupBy("doc_id").agg(
        F.count("*").alias("cand_ct"),
        F.count("_hit").alias("hit_ct"),
    )
