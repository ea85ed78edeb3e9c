"""Source/sink format coverage beyond parquet: JSON and CSV round-trips.

Parquet is the engine's native format (typed, columnar, pushdown-friendly);
JSON/CSV are the interchange paths an ingest pipeline actually receives.
These tests pin that a schema'd read reproduces the written rows — including
array columns (JSON) and quoted free text with delimiters/newlines (CSV)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_api_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_json_roundtrip_preserves_embeddings(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings").limit(50)
    path = str(tmp_path / "emb_json")
    emb.write.json(path)
    back = spark.read.schema(emb.schema).json(path)
    assert back.count() == 50
    assert back.schema == emb.schema
    joined = back.alias("b").join(emb.alias("o"), "vec_id")
    # textual float round-trip must preserve values to float32 resolution
    bad = joined.filter(
        F.exists(
            F.zip_with("b.embedding", "o.embedding", lambda a, b: F.abs(a - b)),
            lambda d: d > 1e-6,
        )
    )
    assert bad.count() == 0


def test_csv_roundtrip_quotes_free_text(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "source", "n_chars", "text"
    ).limit(100)
    path = str(tmp_path / "docs_csv")
    docs.write.option("header", True).csv(path)
    back = (
        spark.read.schema(docs.schema)
        .option("header", True)
        .option("multiLine", True)
        .csv(path)
    )
    assert back.count() == 100
    mismatch = back.alias("b").join(docs.alias("o"), "doc_id").filter(
        (F.col("b.text") != F.col("o.text")) | (F.col("b.lang") != F.col("o.lang"))
    )
    assert mismatch.count() == 0


def test_compact_parquet_shrinks_files_keeps_rows(spark, tmp_path):
    import glob

    from vector_db_api_spark.sources.tables import compact_parquet

    path = str(tmp_path / "many")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "n_chars")
    # simulate 8 micro-batch appends → many small files
    for i in range(8):
        docs.filter(F.col("doc_id") % 8 == i).write.mode("append").parquet(path)
    before = len(glob.glob(path + "/**/*.parquet", recursive=True))
    total = spark.read.parquet(path).count()

    rows, after = compact_parquet(spark, path, partition_by=("lang",))
    assert rows == total
    assert after < before
    back = spark.read.parquet(path)
    assert back.count() == total
    # partition layout preserved → lang filters still prune
    assert back.filter(F.col("lang") == "en").count() == docs.filter(
        F.col("lang") == "en"
    ).count()
