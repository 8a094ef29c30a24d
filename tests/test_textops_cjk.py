"""CJK tokenizer (U1's Chinese-segmentation contract): latin/digit
runs stay whole lowercase tokens, CJK runs become overlapping
character bigrams, punctuation/whitespace separates runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_flink_0526_spark.operators import textops


def _toks(spark, s: str) -> list[str]:
    df = spark.createDataFrame([(s,)], "t string")
    return df.select(textops.tokenize_cjk(F.col("t")).alias("k")).collect()[0]["k"]


def test_latin_runs_whole(spark):
    assert _toks(spark, "Hello World 42") == ["hello", "world", "42"]


def test_cjk_run_bigrams(spark):
    assert _toks(spark, "中文分词") == ["中文", "文分", "分词"]


def test_single_cjk_char(spark):
    assert _toks(spark, "中") == ["中"]


def test_mixed_runs(spark):
    # latin and CJK runs split at the script boundary
    assert _toks(spark, "你好世界hello") == ["你好", "好世", "世界", "hello"]


def test_punctuation_separates_runs(spark):
    # comma breaks the CJK run: no bigram spans it
    assert _toks(spark, "中文,分词") == ["中文", "分词"]


def test_whitespace_tokenize_fails_on_cjk(spark):
    # the motivating gap: whitespace split returns the sentence whole
    df = spark.createDataFrame([("中文分词测试",)], "t string")
    ws = df.select(textops.tokenize(F.col("t")).alias("k")).collect()[0]["k"]
    assert ws == ["中文分词测试"]
