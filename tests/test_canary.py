"""Engine-upgrade canaries: pin the exact semantics of the Spark
expressions the dedup/similarity family depends on for CROSS-ENGINE
agreement with the DuckDB oracles. These are the expressions most
likely to drift across Spark versions (or diverge between engines):
``bit_count``/``conv``/shifts back the SimHash path, md5-hex ordering
backs every MinHash signature. A failure here means the engine changed
under us — fix the operators before trusting any green oracle run.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bitops_and_conv_semantics_pinned(spark):
    row = (
        spark.range(1)
        .select(
            # bit_count is a popcount over the 64-bit two's-complement
            # pattern (simhash Hamming verify relies on this)
            F.expr("bit_count(CAST(-1 AS BIGINT))").alias("bc_neg1"),
            F.expr("bit_count(CAST(5 AS BIGINT))").alias("bc_5"),
            F.expr("bit_count(CAST(6 AS BIGINT) ^ CAST(5 AS BIGINT))").alias("bc_xor"),
            # conv(hex, 16, 10) returns a DECIMAL-ish string; the cast
            # to long is exact for <= 15 hex chars (simhash uses 4-8)
            F.conv(F.lit("ff"), 16, 10).cast("long").alias("conv_ff"),
            F.conv(F.lit("0a1b"), 16, 10).cast("long").alias("conv_4hex"),
            F.conv(F.lit("deadbeef"), 16, 10).cast("long").alias("conv_8hex"),
            # BIGINT shift: << must NOT wrap at bit 31 (the INT-shift
            # trap documented in operators/dedup.simhash)
            F.expr("CAST(1 AS BIGINT) << 33").alias("shl_33"),
            F.expr("(CAST(6 AS BIGINT) >> 1) & 1").alias("shr_bit"),
            # md5 returns lowercase hex; lexicographic min over these
            # strings IS the MinHash reduction on both engines
            F.md5(F.lit("abc")).alias("md5_abc"),
            F.least(F.md5(F.lit("abc")), F.md5(F.lit("abd"))).alias("md5_min"),
        )
        .collect()[0]
    )
    assert row.bc_neg1 == 64
    assert row.bc_5 == 2
    assert row.bc_xor == 2  # 6 ^ 5 = 3 -> two bits
    assert row.conv_ff == 255
    assert row.conv_4hex == 0x0A1B
    assert row.conv_8hex == 0xDEADBEEF
    assert row.shl_33 == 2**33
    assert row.shr_bit == 1
    assert row.md5_abc == "900150983cd24fb0d6963f7d28e17f72"
    # md5('abd') = '4911e5…' sorts below md5('abc') = '900150…'
    assert row.md5_min == "4911e516e5aa21d327512e0c8b197616"


def test_bucket_and_fold_expression_semantics_pinned(spark):
    """Round-5 additions: packing_length_histogram's exact power-of-two
    bucketing (bin + shiftleft-by-column), minhash_estimate_audit's
    per-position agreement fold (zip_with + filter), and the
    float->DOUBLE->decimal cast rule the k-means centroids rely on —
    a DIRECT float->decimal cast uses the float's shortest decimal
    repr on the JVM but the exact binary expansion in DuckDB, so the
    operators must always widen through double first (measured:
    158/32k embedding elements round differently on the direct path)."""
    import duckdb

    row = (
        spark.range(1)
        .select(
            F.bin(F.lit(4).cast("long")).alias("bin4"),
            F.expr("CAST(shiftleft(1L, length(bin(5 - 1))) AS BIGINT)").alias("bkt5"),
            F.expr("CAST(shiftleft(1L, length(bin(4 - 1))) AS BIGINT)").alias("bkt4"),
            F.expr("CAST(shiftleft(1L, length(bin(1024 - 1))) AS BIGINT)").alias("bkt1024"),
            F.size(
                F.filter(
                    F.zip_with(
                        F.array(F.lit("a"), F.lit("b"), F.lit("c")),
                        F.array(F.lit("a"), F.lit("x"), F.lit("c")),
                        lambda x, y: x == y,
                    ),
                    lambda b: b,
                )
            ).alias("agree"),
        )
        .collect()[0]
    )
    assert row.bin4 == "100"
    assert row.bkt5 == 8 and row.bkt4 == 4 and row.bkt1024 == 1024
    assert row.agree == 2

    # the six float values whose DIRECT float->decimal casts diverged
    # across engines in round 5: pin that the DOUBLE-widened path
    # agrees with DuckDB on every one — that agreement is the
    # invariant the k-means centroid accumulation actually needs.
    vals = [-0.188021, 0.078975, 0.130507, 0.285939, -0.340627, 0.228989]
    sdf = (
        spark.createDataFrame([(float(v),) for v in vals], "v float")
        .select(F.col("v").cast("double").cast("decimal(30,6)").alias("d"))
        .collect()
    )
    con = duckdb.connect()
    for (srow,), v in zip([(r.d,) for r in sdf], vals):
        orow = con.execute(
            f"SELECT CAST(CAST(CAST({v!r} AS FLOAT) AS DOUBLE) AS DECIMAL(30,6))"
        ).fetchone()[0]
        assert float(srow) == float(orow), (v, srow, orow)
