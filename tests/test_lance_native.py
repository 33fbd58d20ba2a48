"""Native Lance reader (sources/lance_native.py) against the
reference's OWN committed test datasets (/root/reference/test-data —
real 'Lance File 2.0' files written by com.lancedb.lance 0.24.0): the
decoded rows must equal the literal INSERT values the reference's
FlinkSqlDemo.java:129-135 wrote, UTF-8 / timestamp / multi-fragment
metadata must round-trip, a Spark read must feed this repo's vector
search, and anything outside the documented format subset must refuse
loudly."""

import os
import shutil

import pytest

from lance_flink_spark.sources.lance_native import (
    LanceNativeDataset,
    UnsupportedLanceFeature,
)

REF = "/root/reference/test-data"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference test-data not present"
)


def test_db1_exact_rows():
    t = LanceNativeDataset(f"{REF}/lance-db1").to_arrow()
    d = t.to_pydict()
    assert d["id"] == [1, 2, 3, 4, 5]
    assert d["title"] == [
        "Introduction to AI",
        "Machine Learning Guide",
        "Deep Learning Basics",
        "Neural Networks",
        "Computer Vision",
    ]
    # float32 ladders: row i is [0.1+0.1i ... 0.4+0.1i]
    for i, emb in enumerate(d["embedding"]):
        assert emb == pytest.approx(
            [0.1 * (i + 1), 0.1 * (i + 2), 0.1 * (i + 3), 0.1 * (i + 4)],
            abs=1e-6,
        )


def test_db2_utf8_and_timestamps():
    ds = LanceNativeDataset(f"{REF}/lance-db2")
    assert ds.versions() == [1]
    t = ds.to_arrow()
    d = t.to_pydict()
    assert t.num_rows == 5
    assert d["title"][0] == "Flink入门指南"  # multi-byte UTF-8 intact
    assert d["category"][:3] == ["tutorial", "practice", "database"]
    assert str(t.schema.field("create_time").type) == "timestamp[ms]"
    assert d["create_time"][0].year == 2024


def test_spark_read_feeds_vector_search(spark):
    """End-to-end parity shape with LanceVectorSearchTest: read the
    native vector table through Spark and run this repo's brute knn —
    id 1 must be its own nearest neighbor under L2, and the reversed
    vector (id 3) must rank last among the ladder rows."""
    from lance_flink_spark.operators.similarity import knn

    df = LanceNativeDataset(f"{REF}/lance-vector-search").read(spark)
    assert df.schema["title"].dataType.simpleString() == "string"
    assert df.schema["embedding"].dataType.simpleString() == "array<float>"
    q = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8]
    got = knn(df.withColumnRenamed("id", "vec_id"), q, 3, metric="l2").collect()
    assert got[0]["vec_id"] == 1 and got[0]["distance"] == 0.0
    assert all(r["vec_id"] != 3 for r in got[:2])  # reversed vector is far


def test_unsupported_features_refuse_loudly(tmp_path_str):
    root = os.path.join(tmp_path_str, "bad")
    shutil.copytree(f"{REF}/lance-db1", root)
    os.chmod(root, 0o755)
    data_dir = os.path.join(root, "data")
    os.chmod(data_dir, 0o755)
    name = os.listdir(data_dir)[0]
    p = os.path.join(data_dir, name)
    os.chmod(p, 0o644)
    blob = bytearray(open(p, "rb").read())
    blob[-4:] = b"XXXX"  # corrupt the magic
    open(p, "wb").write(bytes(blob))
    with pytest.raises(UnsupportedLanceFeature, match="magic"):
        LanceNativeDataset(root).to_arrow()


def test_manifest_fragment_metadata():
    from lance_flink_spark.sources.lance_native import parse_manifest

    raw = open(f"{REF}/lance-db1/_versions/1.manifest", "rb").read()
    fields, frags, version = parse_manifest(raw)
    assert version == 1
    assert [f.name for f in fields] == ["id", "title", "embedding"]
    assert fields[2].logical == "list"
    assert fields[2].children[0].logical == "float"
    assert len(frags) == 1 and frags[0].physical_rows == 5
    assert frags[0].field_ids == [0, 1, 2, 3]


def test_sql_surface_reads_native_table(spark, tmp_path_str):
    """The reference connector's own SQL shape over REAL Lance data:
    CREATE TABLE WITH ('connector'='lance', 'path'=<native dir>)
    registers a read-only table; SELECT/joins/aggregates work, every
    mutating statement refuses with a copy-out hint, and CTAS into a
    parquet-backed table makes the data mutable."""
    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine

    eng = SqlEngine(spark, Catalog(tmp_path_str + "/wh"))
    eng.execute(
        f"""CREATE TABLE lance_documents (id BIGINT, title STRING,
            embedding ARRAY<FLOAT>)
            WITH ('connector' = 'lance', 'path' = '{REF}/lance-db1')"""
    )
    got = eng.execute(
        "SELECT COUNT(*) AS n, MIN(id) AS lo, MAX(id) AS hi FROM lance_documents"
    ).first()
    assert (got["n"], got["lo"], got["hi"]) == (5, 1, 5)
    top = eng.execute(
        "SELECT title FROM lance_documents WHERE id = 3"
    ).first()["title"]
    assert top == "Deep Learning Basics"
    for stmt in (
        "INSERT INTO lance_documents VALUES (9, 'x', ARRAY[0.0])",
        "DELETE FROM lance_documents WHERE id = 1",
        "UPDATE lance_documents SET title = 'y' WHERE id = 1",
    ):
        with pytest.raises(ValueError, match="READ-ONLY native"):
            eng.execute(stmt)
    # copy-out path: CTAS into a parquet-backed table, then mutate
    eng.execute("CREATE TABLE docs_rw AS SELECT * FROM lance_documents")
    eng.execute("DELETE FROM docs_rw WHERE id <= 2")
    assert eng.execute("SELECT COUNT(*) AS n FROM docs_rw").first()["n"] == 3


def test_sql_vector_search_over_native_table(spark, tmp_path_str):
    """flink-sql-demo.sql's vector_search() against the reference's
    REAL vector dataset: exact brute KNN over the decoded native scan
    — id 1 is its own nearest neighbor, the reversed vector ranks
    outside the top-2."""
    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine

    eng = SqlEngine(spark, Catalog(tmp_path_str + "/wh2"))
    eng.execute(
        f"""CREATE TABLE vs (id BIGINT, title STRING, embedding ARRAY<FLOAT>)
            WITH ('connector' = 'lance', 'path' = '{REF}/lance-vector-search')"""
    )
    got = eng.execute(
        "SELECT * FROM vector_search('vs', 'embedding', "
        "ARRAY[0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8], 3, 'L2')"
    ).collect()
    assert len(got) == 3
    assert got[0]["id"] == 1 and got[0]["distance"] == 0.0
    assert all(r["id"] != 3 for r in got[:2])
