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


# ---------------------------------------------------------------------------
# Iterative BPE trainer (operators/bpe.py) vs a pure-Python reference
# ---------------------------------------------------------------------------
import re as _re
from collections import Counter as _Counter


def _ref_bpe_train(texts, rounds):
    """Reference trainer: freq-weighted vocab, count all adjacent symbol
    positions, merge the (count desc, pair asc) arg-max left-to-right
    greedily — the Sennrich et al. 2016 algorithm."""
    vocab = _Counter()
    for t in texts:
        vocab.update(_re.findall("[a-z]+", (t or "").lower()))
    segs = {w: list(w) for w in vocab}
    merges = []
    for r in range(1, rounds + 1):
        counts = _Counter()
        for w, freq in vocab.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((r, a, b, cnt))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges


def test_bpe_train_matches_reference_on_fixture(spark):
    """Hand-checkable corpus: the merge sequence (rules AND weighted
    counts) must equal the pure-Python reference exactly."""
    from crawlingbigdatavisionaid_spark.operators.bpe import bpe_train

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe_train(docs, rounds=6)
    assert got == _ref_bpe_train(texts, 6)


def test_bpe_merge_is_leftmost_nonoverlapping(spark):
    """'aaaa' + rule (a,a) must segment as (aa)(aa) — the fold must not
    chain-merge into a(aa)a or (aaa)a."""
    from crawlingbigdatavisionaid_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    got = bpe_train(docs, rounds=2)
    # round 1: (a,a) appears 3 times per word x 2 words = 6
    assert got[0] == (1, "a", "a", 6)
    # round 2: segmentation is [aa, aa] -> pair (aa, aa) twice
    assert got[1] == (2, "aa", "aa", 2)


def test_bpe_train_round1_matches_oracle_checked_top_pair(spark):
    """Round 1 of the trainer == bpe_top_merges' (oracle-checked) top
    pair: char segmentation makes freq-weighted type counting equal
    per-instance counting."""
    from crawlingbigdatavisionaid_spark.operators.bpe import bpe_train
    from crawlingbigdatavisionaid_spark.plans.registry import query_map
    from crawlingbigdatavisionaid_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    (r, a, b, cnt), *_ = bpe_train(docs, rounds=1)
    top = query_map()["bpe_top_merges"](spark, sf).first()
    assert (f"{a} {b}", cnt) == (top.pair, top.cnt)


def test_bpe_train_matches_reference_on_random_corpora(spark):
    """Property: 5 seeded random corpora, full-sequence equality."""
    import random

    from crawlingbigdatavisionaid_spark.operators.bpe import bpe_train

    for seed in range(5):
        rng = random.Random(seed)
        words = [
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
            for _ in range(30)
        ]
        texts = [
            " ".join(rng.choice(words) for _ in range(rng.randint(3, 15)))
            for _ in range(8)
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        assert bpe_train(docs, rounds=4) == _ref_bpe_train(texts, 4), seed


def _ref_bpe_encode(word: str, merges: tuple[tuple[str, str], ...]) -> list[str]:
    """Canonical priority-queue BPE encoder: repeatedly merge the
    LOWEST-RANK adjacent pair present, leftmost first."""
    rank = {pair: i for i, pair in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        best, best_i = None, None
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, best_i = r, i
        if best is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def test_bpe_encode_chained_replace_equals_priority_encoder(spark):
    """The chained-replace identity bpe_encode_by_lang relies on:
    applying each merge exhaustively in rank order must equal the
    canonical lowest-rank-first encoder — segmentation, not just
    counts — over random words AND the adversarial chain/overlap
    shapes ('aaaa', 'table' built via 4 chained ranks)."""
    import random

    from pyspark.sql import functions as F

    from crawlingbigdatavisionaid_spark.plans.text import (
        _BPE_MERGES,
        _bpe_spark_encode,
    )

    rng = random.Random(7)
    words = ["aaaa", "table", "tab", "stable", "row", "rower", "vvalue"] + [
        "".join(rng.choice("abelortvwins") for _ in range(rng.randint(1, 10)))
        for _ in range(60)
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r.w: r.s
        for r in df.select("w", _bpe_spark_encode(F.col("w")).alias("s")).collect()
    }
    for w in words:
        want = "".join(f"<{s}>" for s in _ref_bpe_encode(w, _BPE_MERGES))
        assert got[w] == want, (w, got[w], want)


def test_bpe_train_then_encode_composes(spark):
    """End-to-end tokenizer pipeline: merges LEARNED by the distributed
    trainer plug straight into the chained-replace encoder, and the
    resulting segmentation of every corpus word equals the reference
    priority encoder run on the same learned rules."""
    from pyspark.sql import functions as F

    from crawlingbigdatavisionaid_spark.functions.text import (
        bpe_encode_expr,
        tokens,
    )
    from crawlingbigdatavisionaid_spark.operators.bpe import bpe_train

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = [(a, b) for _, a, b, _ in bpe_train(docs, rounds=8)]
    words = (
        docs.select(F.explode(tokens("text")).alias("w")).distinct().collect()
    )
    got = {
        r.w: r.s
        for r in docs.select(F.explode(tokens("text")).alias("w"))
        .distinct()
        .select("w", bpe_encode_expr(F.col("w"), merges).alias("s"))
        .collect()
    }
    for r in words:
        want = "".join(f"<{s}>" for s in _ref_bpe_encode(r.w, tuple(merges)))
        assert got[r.w] == want, (r.w, got[r.w], want)
