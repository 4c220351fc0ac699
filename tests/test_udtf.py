"""Python UDTF surface (SURVEY.md §2.10): the one row -> N rows shape.

The engine's hot paths use built-ins (explode(split())) — this pins the
Spark 4 UDTF API as the escape hatch for table functions built-ins
can't express, and proves it agrees with the built-in on the case they
both cover."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="pos int, sentence string")
class SplitSentences:
    """Emit (position, trimmed sentence) per '.'-terminated fragment."""

    def eval(self, text: str):  # noqa: A002
        if text is None:
            return
        for i, raw in enumerate(text.split(".")):
            s = raw.strip()
            if s:
                yield i, s


def test_udtf_matches_builtin_explode(spark):
    df = spark.createDataFrame(
        [(1, "Alpha beta. Gamma.  Delta"), (2, None), (3, "  ")],
        "id long, text string",
    )
    df.createOrReplaceTempView("t_udtf_docs")
    spark.udtf.register("split_sentences", SplitSentences)

    got = spark.sql(
        """
        SELECT t.id, s.pos, s.sentence
        FROM t_udtf_docs t, LATERAL split_sentences(t.text) s
        """
    ).collect()
    assert sorted(map(tuple, got)) == [
        (1, 0, "Alpha beta"),
        (1, 1, "Gamma"),
        (1, 2, "Delta"),
    ]

    builtin = (
        spark.table("t_udtf_docs")
        .select(
            "id",
            F.posexplode(F.split("text", r"\.")).alias("pos", "raw"),
        )
        .select("id", "pos", F.trim("raw").alias("sentence"))
        .where(F.col("sentence") != "")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, builtin))
