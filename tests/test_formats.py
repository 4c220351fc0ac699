"""Format round-trips, corrupt-row quarantine, and binaryFile pruning."""

from __future__ import annotations

from crawlingbigdatavisionaid_spark.sources.formats import (
    read_binary_files,
    read_csv,
    read_jsonl,
    split_corrupt,
    write_csv,
    write_jsonl,
)

SCHEMA = "doc_id long, title string, score double"


def _frame(spark):
    return spark.createDataFrame(
        [(1, "alpha", 0.5), (2, "beta", 1.25), (3, None, None)], SCHEMA
    )


def test_jsonl_round_trip(spark, tmp_path):
    p = str(tmp_path / "j")
    write_jsonl(_frame(spark), p)
    clean, bad = split_corrupt(read_jsonl(spark, p, SCHEMA))
    assert bad.count() == 0
    assert sorted(map(tuple, clean.collect())) == sorted(
        map(tuple, _frame(spark).collect())
    )


def test_csv_round_trip(spark, tmp_path):
    p = str(tmp_path / "c")
    write_csv(_frame(spark), p)
    clean, _ = split_corrupt(read_csv(spark, p, SCHEMA))
    assert sorted(map(tuple, clean.collect())) == sorted(
        map(tuple, _frame(spark).collect())
    )


def test_malformed_json_rows_quarantine_not_fail(spark, tmp_path):
    p = tmp_path / "mixed"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "title": "ok", "score": 1.0}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "title": "also ok", "score": 2.0}\n'
    )
    clean, bad = split_corrupt(read_jsonl(spark, str(p), SCHEMA))
    assert clean.count() == 2
    assert bad.count() == 1
    assert "not json" in bad.first()[0]


def test_binary_files_glob_prunes_by_name(spark, tmp_path):
    p = tmp_path / "blobs"
    p.mkdir()
    (p / "a.img").write_bytes(b"\x89fakeimg")
    (p / "b.img").write_bytes(b"\x89fakeimg2")
    (p / "notes.txt").write_text("not a blob")
    df = read_binary_files(spark, str(p), glob="*.img")
    rows = df.collect()
    assert len(rows) == 2
    assert all(r.path.endswith(".img") for r in rows)
    assert {bytes(r.content) for r in rows} == {b"\x89fakeimg", b"\x89fakeimg2"}


def test_orc_round_trip(spark, tmp_path):
    from crawlingbigdatavisionaid_spark.sources.formats import (
        read_orc,
        write_orc,
    )

    p = str(tmp_path / "o")
    write_orc(_frame(spark), p)
    back = read_orc(spark, p, SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, _frame(spark).collect())
    )


def test_orc_predicate_pushdown(spark, tmp_path):
    from crawlingbigdatavisionaid_spark.sources.formats import (
        read_orc,
        write_orc,
    )

    p = str(tmp_path / "o2")
    write_orc(_frame(spark), p)
    plan = (
        read_orc(spark, p)
        .where("doc_id = 2")
        .select("title")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "doc_id" in plan
