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
