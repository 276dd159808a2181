"""Corrupt-record-tolerant JSONL ingestion."""

from pyspark.sql.types import LongType, StringType, StructField, StructType

from iatlas_cbioportal_export_spark.sources.readers import read_jsonl_tracked

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def test_read_jsonl_tracked_routes_malformed(spark, tmp_path):
    src = tmp_path / "docs.jsonl"
    src.write_text(
        '{"doc_id": 1, "text": "ok one"}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "ok two"}\n'
        '{"doc_id": 3, "text": "truncated...\n'
    )
    good, bad = read_jsonl_tracked(spark, str(src), SCHEMA)
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    bad_rows = [r["corrupt_record"] for r in bad.collect()]
    assert len(bad_rows) == 2
    assert "not json" in bad_rows[0] or "not json" in bad_rows[1]


def test_read_jsonl_tracked_all_clean(spark, tmp_path):
    src = tmp_path / "clean.jsonl"
    src.write_text('{"doc_id": 1, "text": "a"}\n{"doc_id": 2, "text": "b"}\n')
    good, bad = read_jsonl_tracked(spark, str(src), SCHEMA)
    assert good.count() == 2
    assert bad.count() == 0
