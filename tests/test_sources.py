"""Table-IO seam: parquet fallback now, Iceberg DDL contract for prod."""

from html_parser_spark.sources.tables import (
    EXTRACTED_DDL,
    TRANSCRIPTS_DDL,
    iceberg_available,
    read_table,
)


def test_parquet_fallback(spark):
    assert not iceberg_available(spark)
    df = read_table(spark, "/root/testdata/sf0.001/documents.parquet")
    assert df.count() > 0


def test_ddl_contract():
    # partition transforms that make the resume anti-join bucket-local
    assert "bucket(512, conv_id)" in TRANSCRIPTS_DDL
    assert "bucket(512, conv_id)" in EXTRACTED_DDL
    assert "days(ts)" in TRANSCRIPTS_DDL
    for ddl in (TRANSCRIPTS_DDL, EXTRACTED_DDL):
        assert "USING iceberg" in ddl
