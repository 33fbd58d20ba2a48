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
    registers a native table; SELECT/joins/aggregates work, UPDATE
    refuses with a copy-out hint (INSERT/DELETE are native-write tested
    separately), and CTAS into a parquet-backed table gives full
    mutability."""
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
    # UPDATE/MERGE write natively since r14 (TestNativeUpdateMerge —
    # exercised on COPIES; this table points at the read-only
    # reference datasets, so only reads run here)
    # copy-out path: CTAS into a parquet-backed table, then mutate
    eng.execute("CREATE TABLE docs_rw AS SELECT * FROM lance_documents")
    eng.execute("DELETE FROM docs_rw WHERE id <= 2")
    assert eng.execute("SELECT COUNT(*) AS n FROM docs_rw").first()["n"] == 3


def test_sql_native_writes(spark, tmp_path_str):
    """INSERT INTO / DELETE FROM a NATIVE Lance table (round 13): the
    reference demo's flagship INSERT lands real 'Lance File 2.0'
    fragments; DELETE writes Arrow deletion files; both version the
    manifest and refresh the registered view. UPDATE / INSERT
    OVERWRITE stay loud refusals."""
    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import LanceNativeDataset

    root = os.path.join(tmp_path_str, "db1_copy")
    shutil.copytree(f"{REF}/lance-db1", root)
    for r, dirs, files in os.walk(root):
        for d in dirs:
            os.chmod(os.path.join(r, d), 0o755)
        for f in files:
            os.chmod(os.path.join(r, f), 0o644)
    os.chmod(root, 0o755)
    eng = SqlEngine(spark, Catalog(tmp_path_str + "/whw"))
    eng.execute(
        f"""CREATE TABLE docs (id BIGINT, title STRING,
            embedding ARRAY<FLOAT>)
            WITH ('connector' = 'lance', 'path' = '{root}')"""
    )
    eng.execute(
        "INSERT INTO docs VALUES (6, 'Reinforcement Learning', "
        "ARRAY[0.6, 0.7, 0.8, 0.9])"
    )
    got = eng.execute(
        "SELECT COUNT(*) AS n, MAX(id) AS hi FROM docs"
    ).first()
    assert (got["n"], got["hi"]) == (6, 6)
    assert LanceNativeDataset(root).versions() == [1, 2]
    eng.execute("DELETE FROM docs WHERE id IN (1, 6)")
    ids = sorted(
        r["id"] for r in eng.execute("SELECT id FROM docs").collect()
    )
    assert ids == [2, 3, 4, 5]
    assert LanceNativeDataset(root).versions() == [1, 2, 3]
    # appended rows keep the dataset's exact physical types: a second
    # native reader decodes the mixed (reference-written + our-written)
    # fragment set bit-consistently
    t = LanceNativeDataset(root).to_arrow(2)
    assert t.num_rows == 6 and str(t.schema.field("embedding").type) in (
        "large_list<item: float>", "list<item: float>",
    )
    # UPDATE writes natively since r14: one-commit tombstone + append,
    # here onto a REFERENCE-written dataset copy
    eng.execute("UPDATE docs SET title = 'x' WHERE id = 2")
    assert (
        eng.execute("SELECT title FROM docs WHERE id = 2").first()["title"]
        == "x"
    )
    assert LanceNativeDataset(root).versions() == [1, 2, 3, 4]
    # DELETE with no matches is a no-op, not a new version
    eng.execute("DELETE FROM docs WHERE id = 999")
    assert LanceNativeDataset(root).versions() == [1, 2, 3, 4]


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


# ---------- round 13: write side, nulls, deletion files ----------


def _nullable_table():
    import datetime

    import pyarrow as pa

    return pa.table(
        {
            "id": pa.array([1, 2, None, 4, 5], type=pa.int64()),
            "n32": pa.array([10, None, 30, 40, 50], type=pa.int32()),
            "score": pa.array([0.5, None, 1.5, None, 2.5], type=pa.float64()),
            "title": pa.array(["a", "入門", None, "d", ""], type=pa.string()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, i + 1) for i in range(4)] + [None],
                type=pa.timestamp("ms"),
            ),
            "emb": pa.array(
                [[0.1, 0.2], None, [0.3], [], [0.5, None]],
                type=pa.list_(pa.float32()),
            ),
        }
    )


def test_write_read_roundtrip_with_nulls(tmp_path_str):
    """write_dataset emits 'Lance File 2.0' files with validity
    bitmaps; the reader reconstructs every null (incl. null lists,
    empty lists, and null ELEMENTS inside lists) bit-exactly."""
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import write_dataset

    t = _nullable_table()
    ds = write_dataset(os.path.join(tmp_path_str, "ds"), t)
    back = ds.to_arrow()
    exp = t.cast(
        pa.schema(
            [
                pa.field("id", pa.int64()),
                pa.field("n32", pa.int32()),
                pa.field("score", pa.float64()),
                pa.field("title", pa.large_utf8()),
                pa.field("ts", pa.timestamp("ms")),
                pa.field("emb", pa.large_list(pa.float32())),
            ]
        )
    )
    assert back.equals(exp)


def test_append_and_time_travel(tmp_path_str):
    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        append_to_dataset,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "ds")
    t = _nullable_table()
    write_dataset(root, t)
    assert append_to_dataset(root, t) == 2
    ds = LanceNativeDataset(root)
    assert ds.versions() == [1, 2]
    assert ds.to_arrow().num_rows == 10  # latest: both fragments
    assert ds.to_arrow(1).num_rows == 5  # time travel


def test_append_schema_mismatch_refuses(tmp_path_str):
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        append_to_dataset,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "ds")
    write_dataset(root, _nullable_table())
    with pytest.raises(UnsupportedLanceFeature, match="schema mismatch"):
        append_to_dataset(root, pa.table({"id": pa.array([1], type=pa.int64())}))


def test_deletion_files_roundtrip(tmp_path_str):
    """delete_rows writes per-fragment Arrow deletion files (the
    spec's ARROW_ARRAY type) unioned across versions; reads mask the
    rows; time travel still sees them."""
    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        append_to_dataset,
        delete_rows,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "ds")
    write_dataset(root, _nullable_table())
    append_to_dataset(root, _nullable_table())
    # physical offsets span fragments: 0,2 in frag 0; 7 in frag 1
    v = delete_rows(root, [0, 2, 7])
    assert v == 3
    ds = LanceNativeDataset(root)
    got = ds.to_arrow()
    assert got.num_rows == 7
    assert got.column("id").to_pylist() == [2, 4, 5, 1, 2, 4, 5]
    # second delete unions with the existing deletion file
    delete_rows(root, [1])
    assert LanceNativeDataset(root).to_arrow().column("id").to_pylist() == [
        4, 5, 1, 2, 4, 5,
    ]
    # time travel reads pre-delete versions unmasked
    assert LanceNativeDataset(root).to_arrow(2).num_rows == 10


def test_deletion_count_mismatch_refuses(tmp_path_str):
    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        delete_rows,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "ds")
    write_dataset(root, _nullable_table())
    delete_rows(root, [0, 1])
    # corrupt the manifest's num_deleted by rewriting a bigger count
    ds = LanceNativeDataset(root)
    fields, frags, version = ds._manifest()
    frags[0].deletion.num_deleted = 99
    from lance_flink_spark.sources.lance_native import (
        _schema_fields_of_existing,
        _write_manifest,
    )

    _write_manifest(root, version + 1, _schema_fields_of_existing(fields), frags)
    with pytest.raises(UnsupportedLanceFeature, match="manifest says 99"):
        LanceNativeDataset(root).to_arrow()


def test_unknown_deletion_file_type_refuses(tmp_path_str):
    """Roaring BITMAP deletions decode since round 14; an UNKNOWN
    file_type still refuses loudly."""
    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        _schema_fields_of_existing,
        _write_manifest,
        delete_rows,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "ds")
    write_dataset(root, _nullable_table())
    delete_rows(root, [0])
    ds = LanceNativeDataset(root)
    fields, frags, version = ds._manifest()
    frags[0].deletion.file_type = 7  # outside the spec's two types
    _write_manifest(root, version + 1, _schema_fields_of_existing(fields), frags)
    with pytest.raises(UnsupportedLanceFeature, match="deletion file type"):
        LanceNativeDataset(root).to_arrow()


def test_file_version_gate(tmp_path_str):
    """Legacy-v1 / 2.1 footers refuse by version, not by garbage
    offsets (ADVICE r12)."""
    import struct

    from lance_flink_spark.sources.lance_native import write_dataset

    root = os.path.join(tmp_path_str, "ds")
    ds = write_dataset(root, _nullable_table())
    data = os.path.join(root, "data")
    p = os.path.join(data, os.listdir(data)[0])
    blob = bytearray(open(p, "rb").read())
    # footer major/minor live at bytes [-8:-4] as two u16
    struct.pack_into("<HH", blob, len(blob) - 8, 0, 2)
    open(p, "wb").write(bytes(blob))
    with pytest.raises(UnsupportedLanceFeature, match="file version 0.2"):
        ds.to_arrow()


def test_reordered_field_ids_map_instead_of_refusing(tmp_path_str):
    """r12's refusal on reordered data-file field ids is superseded by
    r14's field-id MAP (the schema-evolution read path): a DataFile
    whose parallel (fields, column_indices) arrays list the schema in
    a different order decodes each field from its RECORDED column —
    bit-exactly, not swapped. Non-parallel arrays (the truly ambiguous
    shape) still refuse."""
    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        _schema_fields_of_existing,
        _write_manifest,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "ds")
    write_dataset(root, _nullable_table())
    ds = LanceNativeDataset(root)
    before = ds.to_arrow()
    fields, frags, version = ds._manifest()
    # reverse BOTH arrays: an honest relabeling of the same file
    frags[0].field_ids = list(reversed(frags[0].field_ids))
    frags[0].column_indices = list(reversed(frags[0].column_indices))
    _write_manifest(root, version + 1, _schema_fields_of_existing(fields), frags)
    assert LanceNativeDataset(root).to_arrow().equals(before)
    # non-parallel arrays can't be mapped — refuse, don't guess
    frags[0].column_indices = frags[0].column_indices[:-1]
    _write_manifest(root, version + 2, _schema_fields_of_existing(fields), frags)
    with pytest.raises(UnsupportedLanceFeature, match="parallel"):
        LanceNativeDataset(root).to_arrow()


def test_foreign_storage_format_refuses(tmp_path_str):
    import struct

    from lance_flink_spark.sources.lance_native import (
        _enc_int,
        _enc_len,
        parse_manifest,
    )

    body = _enc_int(3, 1) + _enc_len(15, _enc_len(1, b"iceberg"))
    with pytest.raises(UnsupportedLanceFeature, match="iceberg"):
        parse_manifest(struct.pack("<I", len(body)) + body)


def test_spark_read_nullable_schema(spark, tmp_path_str):
    """Null-bearing columns keep their Spark types (long/int stay
    integral — no pandas float64 widening)."""
    from lance_flink_spark.sources.lance_native import write_dataset

    ds = write_dataset(os.path.join(tmp_path_str, "ds"), _nullable_table())
    df = ds.read(spark)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "int", "double", "string", "timestamp_ntz", "array<float>",
    ] or [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "int", "double", "string", "timestamp", "array<float>",
    ]
    rows = df.orderBy("n32").collect()
    assert rows[0]["id"] == 2 and rows[0]["n32"] is None


def test_native_ctas_and_merge_refusal(spark, tmp_path_str):
    """CTAS with 'storage'='native' writes a real native Lance
    directory; the unconditional MERGE (a refusal until r14) now
    upserts through the one-commit tombstone+append path."""
    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import LanceNativeDataset

    eng = SqlEngine(spark, Catalog(tmp_path_str + "/wh"))
    path = os.path.join(tmp_path_str, "native_out")
    eng.execute(
        f"""CREATE TABLE nat WITH ('connector'='lance',
            'path'='{path}', 'storage'='native') AS
            SELECT id, CAST(id * 1.5 AS DOUBLE) AS score,
                   CONCAT('row-', CAST(id AS STRING)) AS title
            FROM RANGE(5)"""
    )
    assert LanceNativeDataset(path).versions() == [1]
    got = eng.execute(
        "SELECT COUNT(*) AS n, SUM(score) AS s FROM nat"
    ).first()
    assert got["n"] == 5 and got["s"] == pytest.approx(15.0)
    eng.execute(
        "MERGE INTO nat USING (SELECT 9 AS id, 1.0 AS score, 'x' AS t) ON id"
    )
    got = eng.execute(
        "SELECT COUNT(*) AS n, SUM(score) AS s FROM nat"
    ).first()
    assert got["n"] == 6 and got["s"] == pytest.approx(16.0)


def test_distributed_read_equals_driver_read(spark, tmp_path_str):
    """read_distributed decodes one fragment per executor task
    (mapInPandas) — rows, types (incl. nullable ints staying integral
    and null floats staying null, not NaN) and deletion masks must
    equal the driver-side read; partition count == fragment count."""
    import datetime

    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        delete_rows,
        read_distributed,
        write_dataset,
    )

    t = pa.table(
        {
            "id": pa.array(list(range(50)), type=pa.int64()),
            "n32": pa.array(
                [None if i % 11 == 0 else i for i in range(50)], type=pa.int32()
            ),
            "score": pa.array(
                [None if i % 13 == 0 else i / 4 for i in range(50)],
                type=pa.float64(),
            ),
            "title": pa.array(
                [None if i % 7 == 0 else f"t{i}" for i in range(50)]
            ),
            "ts": pa.array(
                [
                    datetime.datetime(2024, 1, 1, 0, i % 60) if i % 5 else None
                    for i in range(50)
                ],
                type=pa.timestamp("ms"),
            ),
            "emb": pa.array(
                [[float(i), 0.5] if i % 3 else None for i in range(50)],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    root = os.path.join(tmp_path_str, "dist")
    write_dataset(root, t, max_rows_per_file=16)  # 4 fragments
    delete_rows(root, [0, 17, 33, 49])
    ds = LanceNativeDataset(root)
    dist = read_distributed(ds, spark)
    assert dist.rdd.getNumPartitions() == 4
    a = sorted(tuple(r) for r in dist.collect())
    b = sorted(tuple(r) for r in ds.read(spark).collect())
    assert len(a) == 46 and a == b
    assert [
        (f.name, f.dataType.simpleString()) for f in dist.schema.fields
    ] == [(f.name, f.dataType.simpleString()) for f in ds.read(spark).schema.fields]


def test_multi_page_columns_roundtrip(tmp_path_str):
    """max_rows_per_page splits primitive/timestamp/STRING columns
    into multiple self-contained pages (how production fragments page
    long text); the reader assembles them per page — nulls included.
    List columns stay single-page by contract."""
    import datetime

    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        _schema_fields_of,
        read_fragment_table,
        write_fragment_file,
    )

    t = pa.table(
        {
            "id": pa.array(list(range(23)), type=pa.int64()),
            "title": pa.array(
                [None if i % 7 == 0 else "x" * i for i in range(23)]
            ),
            "ts": pa.array(
                [
                    datetime.datetime(2024, 1, 1, 0, i) if i % 5 else None
                    for i in range(23)
                ],
                type=pa.timestamp("ms"),
            ),
            "emb": pa.array(
                [[float(i)] if i % 3 else None for i in range(23)],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    fields, _blob = _schema_fields_of(pa, t.schema)
    p = os.path.join(tmp_path_str, "paged.lance")
    write_fragment_file(p, t, max_rows_per_page=5)
    back = read_fragment_table(p, fields)
    assert back.equals(t.cast(back.schema))


def test_binary_columns_roundtrip_and_spark(spark, tmp_path_str):
    """'binary' columns (the multimodal payload type) round-trip
    through the native format — nulls, empty blobs and NUL bytes
    intact — and surface in Spark as BinaryType."""
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        write_dataset,
    )

    payloads = [b"\x89PNG\r\n", None, b"", b"\x00" * 100, bytes(range(256))]
    t = pa.table(
        {
            "id": pa.array(list(range(5)), type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )
    ds = write_dataset(os.path.join(tmp_path_str, "bin"), t)
    assert ds.to_arrow().column("payload").to_pylist() == payloads
    df = ds.read(spark)
    assert df.schema["payload"].dataType.simpleString() == "binary"
    got = {r["id"]: r["payload"] for r in df.collect()}
    assert bytes(got[0]) == b"\x89PNG\r\n" and got[1] is None
    assert bytes(got[4]) == bytes(range(256))


def test_struct_columns_roundtrip_and_spark(spark, tmp_path_str):
    """Flat struct columns (the multimodal-metadata shape) round-trip:
    the struct header consumes no data column, children decode
    independently nullable; NULL struct VALUES refuse loudly (a header
    validity column is outside the subset). Spark sees a StructType."""
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        UnsupportedLanceFeature,
        write_dataset,
    )

    metas = [
        {"w": 640, "h": 480, "codec": "png"},
        {"w": None, "h": 100, "codec": None},
        {"w": 1, "h": 2, "codec": "jpeg"},
    ]
    t = pa.table(
        {
            "id": pa.array([1, 2, 3], type=pa.int64()),
            "meta": pa.array(
                metas,
                type=pa.struct(
                    [("w", pa.int64()), ("h", pa.int32()), ("codec", pa.string())]
                ),
            ),
        }
    )
    ds = write_dataset(os.path.join(tmp_path_str, "st"), t)
    assert ds.to_arrow().column("meta").to_pylist() == metas
    df = ds.read(spark)
    assert (
        df.schema["meta"].dataType.simpleString()
        == "struct<w:bigint,h:int,codec:string>"
    )
    rows = {r["id"]: r["meta"] for r in df.collect()}
    assert rows[2]["w"] is None and rows[1]["codec"] == "png"
    with pytest.raises(UnsupportedLanceFeature, match="NULL struct"):
        write_dataset(
            os.path.join(tmp_path_str, "st2"),
            pa.table(
                {"m": pa.array([{"w": 1}, None], type=pa.struct([("w", pa.int64())]))}
            ),
        )
    with pytest.raises(UnsupportedLanceFeature, match="nested"):
        write_dataset(
            os.path.join(tmp_path_str, "st3"),
            pa.table(
                {
                    "m": pa.array(
                        [{"v": [1.0]}],
                        type=pa.struct([("v", pa.list_(pa.float32()))]),
                    )
                }
            ),
        )


def test_sql_time_travel_on_native_table(spark, tmp_path_str):
    """`SELECT ... FROM nat VERSION AS OF n` resolves through the
    native manifest chain: pre-INSERT and pre-DELETE versions read
    their exact historical row sets."""
    import pyarrow as pa

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import write_dataset

    root = os.path.join(tmp_path_str, "tt")
    write_dataset(
        root,
        pa.table({"id": pa.array([1, 2, 3], type=pa.int64())}),
    )
    eng = SqlEngine(spark, Catalog(tmp_path_str + "/whtt"))
    eng.execute(
        f"CREATE TABLE nat_tt (id BIGINT) WITH ('connector'='lance', 'path'='{root}')"
    )
    eng.execute("INSERT INTO nat_tt VALUES (4)")      # v2
    eng.execute("DELETE FROM nat_tt WHERE id = 1")    # v3
    cur = {r["id"] for r in eng.execute("SELECT id FROM nat_tt").collect()}
    v1 = {
        r["id"]
        for r in eng.execute("SELECT id FROM nat_tt VERSION AS OF 1").collect()
    }
    v2 = {
        r["id"]
        for r in eng.execute("SELECT id FROM nat_tt VERSION AS OF 2").collect()
    }
    assert cur == {2, 3, 4} and v1 == {1, 2, 3} and v2 == {1, 2, 3, 4}


def test_native_meta_tables(spark, tmp_path_str):
    """nat$history / nat$files / nat$deletes read the native manifest
    chain (driver-side metadata only) — Iceberg-style introspection
    over real Lance layouts."""
    import pyarrow as pa

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import write_dataset

    root = os.path.join(tmp_path_str, "meta")
    write_dataset(
        root, pa.table({"id": pa.array([1, 2, 3, 4], type=pa.int64())})
    )
    eng = SqlEngine(spark, Catalog(tmp_path_str + "/whm"))
    eng.execute(
        f"CREATE TABLE natm (id BIGINT) WITH ('connector'='lance', 'path'='{root}')"
    )
    eng.execute("INSERT INTO natm VALUES (5)")
    eng.execute("DELETE FROM natm WHERE id IN (2, 5)")
    hist = eng.execute(
        "SELECT version, fragments FROM natm$history ORDER BY version"
    ).collect()
    assert [(r["version"], r["fragments"]) for r in hist] == [(1, 1), (2, 2), (3, 2)]
    files = eng.execute(
        "SELECT physical_rows, live_rows FROM natm$files ORDER BY physical_rows"
    ).collect()
    assert [(r["physical_rows"], r["live_rows"]) for r in files] == [(1, 0), (4, 3)]
    dels = eng.execute("SELECT COUNT(*) AS n FROM natm$deletes").first()["n"]
    assert dels == 2


def test_append_preserves_nondense_field_ids(tmp_path_str):
    """ADVICE r13: append_to_dataset must encode the manifest from the
    EXISTING fields — a dataset whose field ids aren't dense 0..n-1
    (library-written after add-column evolution) would otherwise be
    renumbered by the first append, making every pre-existing fragment
    refuse on read."""
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        _schema_fields_of_existing,
        _write_manifest,
        append_to_dataset,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "nondense")
    write_dataset(
        root,
        pa.table(
            {
                "a": pa.array([1, 2], type=pa.int64()),
                "b": pa.array(["x", "y"], type=pa.large_utf8()),
            }
        ),
    )
    ds = LanceNativeDataset(root)
    fields, frags, _v = ds._manifest()
    # simulate add-column evolution: shift every field id by +5
    for f in fields:
        f.fid += 5
        for c in f.children:
            c.fid += 5
            c.parent += 5
    for fr in frags:
        fr.field_ids = [i + 5 for i in fr.field_ids]
    _write_manifest(root, 2, _schema_fields_of_existing(fields), frags)

    v = append_to_dataset(
        root,
        pa.table(
            {
                "a": pa.array([3], type=pa.int64()),
                "b": pa.array(["z"], type=pa.large_utf8()),
            }
        ),
    )
    assert v == 3
    ds2 = LanceNativeDataset(root)
    t = ds2.to_arrow()
    assert sorted(t.to_pydict()["a"]) == [1, 2, 3]
    fields2, frags2, _ = ds2._manifest()
    assert [f.fid for f in fields2] == [5, 6]  # ids NOT renumbered
    assert frags2[-1].field_ids == [5, 6]  # new fragment uses them too


def test_native_insert_never_materializes_on_driver(spark, tmp_path_str, monkeypatch):
    """ADVICE r13 asked for the 4M gate to fire before toArrow();
    round 14 goes further — SQL INSERT INTO a native table writes
    fragments EXECUTOR-side, so a >4M-row load succeeds with ZERO
    driver row materialization. toArrow is wrapped in a tripwire that
    only tolerates the empty schema probe."""
    import pyarrow as pa
    from pyspark.sql import DataFrame

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import write_dataset

    root = os.path.join(tmp_path_str, "gate")
    write_dataset(root, pa.table({"id": pa.array([-1], type=pa.int64())}))
    eng = SqlEngine(spark, Catalog(tmp_path_str + "/whg"))
    eng.execute(
        f"CREATE TABLE natg (id BIGINT) WITH ('connector'='lance', 'path'='{root}')"
    )
    spark.range(4_000_001).createOrReplaceTempView("natg_big")

    orig = DataFrame.toArrow

    def _guard(self):
        t = orig(self)
        assert t.num_rows == 0, "driver materialized data rows"
        return t

    monkeypatch.setattr(DataFrame, "toArrow", _guard)
    eng.execute("INSERT INTO natg SELECT id FROM natg_big")
    got = spark.table("natg")
    assert got.count() == 4_000_002
    assert got.agg({"id": "max"}).first()[0] == 4_000_000


def test_varlen_page_shape_validated_independently():
    """ADVICE r13: varlen page validation must not echo the page's own
    declared payload size — offsets width, validity width, and
    payload==last-end are each checked independently."""
    import numpy as np

    from lance_flink_spark.sources.lance_native import (
        UnsupportedLanceFeature,
        _varlen_page,
    )

    ends = np.array([2, 3], "<i8").tobytes()  # rows ["ab", "c"]
    payload = b"abc"
    blob = ends + payload
    v, arro, (doff, dsz) = _varlen_page(blob, [0, 16], [16, 3], 2)
    assert v is None and (doff, dsz) == (16, 3)
    assert np.frombuffer(arro, "<i8").tolist() == [0, 2, 3]

    # nullable: one leading validity byte
    blob3 = b"\x03" + ends + payload
    v, _arro, _d = _varlen_page(blob3, [0, 1, 17], [1, 16, 3], 2)
    assert v == b"\x03"

    # payload size disagrees with the decoded end offsets
    with pytest.raises(UnsupportedLanceFeature, match="end-offsets say"):
        _varlen_page(ends + b"abcd", [0, 16], [16, 4], 2)
    # offsets buffer not rows*8
    with pytest.raises(UnsupportedLanceFeature, match="offsets buffer"):
        _varlen_page(b"\x03" + ends[:8] + payload, [0, 1, 9], [1, 8, 3], 2)
    # zero-row page with a nonzero payload
    with pytest.raises(UnsupportedLanceFeature, match="end-offsets say"):
        _varlen_page(b"abc", [0, 0], [0, 3], 0)
    # four buffers is never the flat value layout
    with pytest.raises(UnsupportedLanceFeature, match="aren't"):
        _varlen_page(blob3 + b"\x00", [0, 1, 17, 20], [1, 16, 3, 1], 2)


def test_sql_native_read_is_distributed(spark, tmp_path_str):
    """VERDICT r13 (the one `weak` item): the native-table SQL surface
    must route through read_distributed — one executor task per
    fragment, MapInArrow in the plan, NO driver materialization of
    the data pages. Pins partition count == fragment count for plain
    SELECT, time travel, and the post-DELETE re-registration."""
    import pyarrow as pa

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import write_dataset

    root = os.path.join(tmp_path_str, "dist")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array(range(30), type=pa.int64()),
                "v": pa.array([float(i) * 0.5 for i in range(30)]),
            }
        ),
        max_rows_per_file=10,  # 3 fragments
    )
    eng = SqlEngine(spark, Catalog(tmp_path_str + "/whd"))
    eng.execute(
        f"CREATE TABLE natd (id BIGINT, v DOUBLE) "
        f"WITH ('connector'='lance', 'path'='{root}')"
    )
    df = spark.table("natd")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Arrow-native distributed read (r15): the per-fragment decode
    # yields RecordBatches straight from the pyarrow table
    assert "MapInArrow" in plan
    assert df.rdd.getNumPartitions() == 3  # one task per fragment
    assert sorted(r["id"] for r in df.collect()) == list(range(30))

    # DELETE computes offsets through the distributed read and the
    # re-registered view stays distributed
    eng.execute("DELETE FROM natd WHERE id < 5")
    df2 = spark.table("natd")
    assert "MapInArrow" in df2._jdf.queryExecution().executedPlan().toString()
    assert df2.count() == 25

    # time travel pins a version-specific distributed view
    tt = eng.execute("SELECT COUNT(*) AS n FROM natd VERSION AS OF 1")
    assert tt.first()["n"] == 30

    # vector-search-eligible native reads go through the same path:
    # __phys offsets arrive per-fragment with correct global bases
    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        read_distributed,
    )

    offs = read_distributed(
        LanceNativeDataset(root), spark, version=1, with_offsets=True
    )
    rows = {r["id"]: r["__phys"] for r in offs.collect()}
    assert rows == {i: i for i in range(30)}  # base-correct across fragments


def test_distributed_write_roundtrip_mixed_types(spark, tmp_path_str):
    """write_dataset_distributed: executor tasks write 'Lance File
    2.0' fragments (uuid names, physical-schema casts), driver commits
    only the manifest — and the result decodes bit-equal through both
    the driver and distributed readers, nulls/lists/timestamps
    included."""
    import datetime

    from pyspark.sql import Row

    from lance_flink_spark.sources.lance_native import (
        write_dataset_distributed,
    )

    rows = [
        Row(
            id=i,
            score=None if i % 7 == 0 else float(i) * 0.25,
            title=None if i % 11 == 0 else f"doc-{i}",
            emb=[float(i), float(i) + 0.5],
            ts=datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i),
        )
        for i in range(500)
    ]
    df = spark.createDataFrame(rows).repartition(6)
    root = os.path.join(tmp_path_str, "dw")
    ds = write_dataset_distributed(root, df)
    _fields, frags, _v = ds._manifest()
    assert 1 <= len(frags) <= 6 and sum(f.physical_rows for f in frags) == 500
    t = ds.to_arrow()
    got = {r["id"]: r for r in t.to_pylist()}
    assert len(got) == 500
    assert got[7]["score"] is None and got[11]["title"] is None
    assert got[3]["title"] == "doc-3" and got[3]["emb"] == [3.0, 3.5]
    assert got[3]["score"] == pytest.approx(0.75)


def test_distributed_write_splits_fragments_by_rows(spark, tmp_path_str):
    """The per-task flush threshold splits big partitions into
    multiple fragments, keeping each under the reader's in-task decode
    gate."""
    from lance_flink_spark.sources.lance_native import (
        write_dataset_distributed,
    )

    df = spark.range(1000).repartition(2)
    root = os.path.join(tmp_path_str, "dwsplit")
    ds = write_dataset_distributed(root, df, max_rows_per_file=150)
    _f, frags, _v = ds._manifest()
    assert len(frags) >= 7  # ceil(500/150)=4 per partition
    assert all(fr.physical_rows <= 300 for fr in frags)
    assert sorted(ds.to_arrow().to_pydict()["id"]) == list(range(1000))


def test_distributed_append_onto_reference_dataset(spark, tmp_path_str):
    """Executor-parallel append lands bit-compatibly on a dataset the
    REFERENCE stack wrote (lance-db2: utf8 + timestamp[ms]) — old
    fragments still decode, new rows ride new fragments, field ids
    preserved."""
    import datetime

    from pyspark.sql import Row

    from lance_flink_spark.sources.lance_native import (
        append_to_dataset_distributed,
    )

    root = os.path.join(tmp_path_str, "refapp")
    shutil.copytree(f"{REF}/lance-db2", root)
    t0 = LanceNativeDataset(root).to_arrow()
    schema_df = LanceNativeDataset(root).read(spark)
    new = spark.createDataFrame(
        [
            Row(
                doc_id=100 + i,
                title=f"追加-{i}",
                content=f"appended row {i}",
                embedding=[0.1 * i, 0.2 * i, 0.3 * i, 0.4 * i],
                category="append",
                create_time=datetime.datetime(2025, 6, 1, 12, i),
            )
            for i in range(3)
        ],
        schema=schema_df.schema,
    )
    v = append_to_dataset_distributed(root, new)
    after = LanceNativeDataset(root)
    assert after.versions()[-1] == v
    t1 = after.to_arrow()
    assert t1.num_rows == t0.num_rows + 3
    d = t1.to_pydict()
    assert "追加-0" in d["title"] and d["title"][: t0.num_rows] == t0.to_pydict()["title"]
    # time travel: the pre-append version still serves exactly t0
    assert after.to_arrow(version=1).num_rows == t0.num_rows


class TestRoaringDeletions:
    """Roaring-bitmap deletion files (VERDICT r13 #3) — portable
    serialization per the public RoaringFormatSpec: decode is pinned
    against hand-assembled byte fixtures (not just our own encoder),
    all three container types round-trip, and the BITMAP deletion
    path masks rows end-to-end."""

    def test_decode_handbuilt_array_container(self):
        import struct

        import numpy as np

        from lance_flink_spark.sources.lance_native import decode_roaring

        # no-run cookie, 1 container, key=0, card=3 (stored card-1=2),
        # offset header (always present for 12347), values 1,5,9
        buf = (
            struct.pack("<I", 12347)
            + struct.pack("<I", 1)
            + struct.pack("<HH", 0, 2)
            + struct.pack("<I", 4 + 4 + 4 + 4)
            + struct.pack("<HHH", 1, 5, 9)
        )
        assert decode_roaring(buf).tolist() == [1, 5, 9]

    def test_decode_handbuilt_run_container(self):
        import struct

        from lance_flink_spark.sources.lance_native import decode_roaring

        # run cookie with size=1 in high bits, 1-byte run flag (set),
        # key=1 card=5 (stored 4), no offset header (size < 4),
        # one run: start=10 len=4 → 10..14 in chunk 1 (i.e. +65536)
        buf = (
            struct.pack("<I", 12346 | (0 << 16))
            + b"\x01"
            + struct.pack("<HH", 1, 4)
            + struct.pack("<H", 1)
            + struct.pack("<HH", 10, 4)
        )
        got = decode_roaring(buf).tolist()
        assert got == [65536 + v for v in range(10, 15)]

    def test_roundtrip_all_container_types(self):
        import numpy as np

        from lance_flink_spark.sources.lance_native import (
            decode_roaring,
            encode_roaring,
        )

        # array (sparse), bitmap (dense >4096 in one chunk), spread
        # across three 16-bit chunks
        vals = np.concatenate(
            [
                np.array([3, 77, 1000], dtype="uint32"),
                np.arange(65536, 65536 + 5000, dtype="uint32"),  # bitmap
                np.array([200_000, 200_002], dtype="uint32"),
            ]
        )
        assert decode_roaring(encode_roaring(vals)).tolist() == vals.tolist()
        # run-container variant of the same set
        assert (
            decode_roaring(encode_roaring(vals, use_runs=True)).tolist()
            == vals.tolist()
        )
        # empty bitmap round-trips both ways
        assert decode_roaring(encode_roaring([])).tolist() == []
        assert decode_roaring(encode_roaring([], use_runs=True)).tolist() == []

    def test_unknown_cookie_and_trailing_bytes_refuse(self):
        import struct

        from lance_flink_spark.sources.lance_native import (
            decode_roaring,
            encode_roaring,
        )

        with pytest.raises(UnsupportedLanceFeature, match="cookie"):
            decode_roaring(struct.pack("<II", 99999, 0))
        with pytest.raises(UnsupportedLanceFeature, match="trailing"):
            decode_roaring(encode_roaring([1, 2, 3]) + b"\x00")

    def test_bitmap_deletion_end_to_end(self, spark, tmp_path_str):
        """delete_rows(deletion_format='bitmap') writes a .bin roaring
        file + BITMAP manifest type; driver AND distributed reads mask
        identically; a second (arrow) delete unions on top."""
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            delete_rows,
            read_distributed,
            write_dataset,
        )

        root = os.path.join(tmp_path_str, "roar")
        write_dataset(
            root,
            pa.table({"id": pa.array(range(100), type=pa.int64())}),
            max_rows_per_file=50,  # 2 fragments
        )
        v = delete_rows(root, [0, 1, 60], deletion_format="bitmap")
        ds = LanceNativeDataset(root)
        _f, frags, _ = ds._manifest()
        assert frags[0].deletion.file_type == 1
        assert os.path.exists(
            os.path.join(
                root,
                "_deletions",
                f"0-{frags[0].deletion.read_version}-{frags[0].deletion.id}.bin",
            )
        )
        live = sorted(ds.to_arrow().to_pydict()["id"])
        assert live == [i for i in range(100) if i not in (0, 1, 60)]
        dist = sorted(
            r["id"] for r in read_distributed(ds, spark).collect()
        )
        assert dist == live
        # union a follow-up arrow-format delete on the same fragment
        delete_rows(root, [2])
        live2 = sorted(LanceNativeDataset(root).to_arrow().to_pydict()["id"])
        assert live2 == [i for i in range(100) if i not in (0, 1, 2, 60)]
        assert v == 2


class TestNativeIndexSection:
    """Manifest-level `_indices` awareness (VERDICT r13 #4): the
    IndexSection the reference's LanceIndexBuilder persists into the
    dataset is parsed so SHOW INDEXES reports it and vector_search
    says WHY it brute-forces; payload decode stays a loud refusal
    boundary (the library's own binary format)."""

    def _mk(self, tmp_path_str, name="natx"):
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import (
            LanceIndexMeta,
            write_dataset,
            write_index_section,
        )

        root = os.path.join(tmp_path_str, name)
        write_dataset(
            root,
            pa.table(
                {
                    "id": pa.array(range(20), type=pa.int64()),
                    "embedding": pa.array(
                        [[float(i), float(i) + 1.0] for i in range(20)],
                        type=pa.large_list(pa.float32()),
                    ),
                }
            ),
            max_rows_per_file=10,
        )
        write_index_section(
            root,
            1,
            [
                LanceIndexMeta(
                    uuid="00112233445566778899aabbccddeeff",
                    name="embedding_idx",
                    field_ids=[1],
                    dataset_version=1,
                    fragment_ids=[0, 1],
                    details_type="lance.table.VectorIndexDetails",
                )
            ],
        )
        return root

    def test_roundtrip_and_plain_manifest_unaffected(self, tmp_path_str):
        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            read_index_section,
        )

        root = self._mk(tmp_path_str)
        mpath = os.path.join(root, "_versions", "1.manifest")
        ixs = read_index_section(mpath)
        assert len(ixs) == 1
        ix = ixs[0]
        assert ix.name == "embedding_idx" and ix.field_ids == [1]
        assert ix.uuid == "00112233445566778899aabbccddeeff"
        assert ix.dataset_version == 1 and ix.fragment_ids == [0, 1]
        assert ix.details_type == "lance.table.VectorIndexDetails"
        # the manifest itself still parses + the data still reads
        t = LanceNativeDataset(root).to_arrow()
        assert t.num_rows == 20

    def test_no_index_section_returns_empty(self, tmp_path_str):
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import (
            read_index_section,
            write_dataset,
        )

        root = os.path.join(tmp_path_str, "plain")
        write_dataset(root, pa.table({"id": pa.array([1], type=pa.int64())}))
        assert read_index_section(
            os.path.join(root, "_versions", "1.manifest")
        ) == []
        # the reference's own committed manifests carry no field 6
        assert read_index_section(f"{REF}/lance-db1/_versions/1.manifest") == []

    def test_dangling_offset_refuses(self, tmp_path_str):
        from lance_flink_spark.sources.lance_native import (
            read_index_section,
        )

        root = self._mk(tmp_path_str, "natbad")
        mpath = os.path.join(root, "_versions", "1.manifest")
        raw = open(mpath, "rb").read()
        # truncate the section payload
        open(mpath, "wb").write(raw[:-6])
        with pytest.raises(UnsupportedLanceFeature, match="overruns"):
            read_index_section(mpath)

    def test_show_indexes_and_vector_search_fallback(self, spark, tmp_path_str):
        import warnings

        from lance_flink_spark.sources.catalog import Catalog
        from lance_flink_spark.sources.ddl import SqlEngine

        root = self._mk(tmp_path_str, "natsql")
        eng = SqlEngine(spark, Catalog(tmp_path_str + "/whx"))
        eng.execute(
            f"CREATE TABLE natsql (id BIGINT, embedding ARRAY<FLOAT>) "
            f"WITH ('connector'='lance', 'path'='{root}')"
        )
        rows = eng.execute("SHOW INDEXES ON natsql").collect()
        assert len(rows) == 1
        r = rows[0]
        assert "embedding" in r["column"]
        assert r["using"] == "lance.table.VectorIndexDetails"
        assert r["version"] == 1 and r["fresh"]
        # vector_search warns WHY it brute-forces, and stays exact
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            got = eng.execute(
                "SELECT * FROM vector_search('natsql', 'embedding', "
                "ARRAY[5.0, 6.0], 3)"
            ).collect()
        assert any("brute-force" in str(x.message) for x in w)
        assert got[0]["id"] == 5 and got[0]["distance"] == 0.0
        # an INSERT bumps the version: the index is now stale
        eng.execute("INSERT INTO natsql VALUES (99, ARRAY[9.0, 9.0])")
        r2 = eng.execute("SHOW INDEXES ON natsql").first()
        assert r2["version"] == 1 and not r2["fresh"]


class TestNativeProjectionAndCount:
    """Round-14 scan shortcuts: column projection prunes the
    per-fragment decode (pages of unselected columns are NEVER read —
    proven by corrupting them), and COUNT(*) answers from manifest +
    deletion files with zero data pages (proven by deleting the data
    files outright)."""

    def _mk(self, spark, tmp_path_str, name):
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import write_dataset

        root = os.path.join(tmp_path_str, name)
        write_dataset(
            root,
            pa.table(
                {
                    "id": pa.array(range(40), type=pa.int64()),
                    "title": pa.array([f"t-{i}" for i in range(40)]),
                    "score": pa.array([float(i) * 0.5 for i in range(40)]),
                }
            ),
            max_rows_per_file=20,
        )
        return root

    def test_projection_skips_unread_columns(self, spark, tmp_path_str):
        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            read_distributed,
        )

        root = self._mk(spark, tmp_path_str, "proj")
        ds = LanceNativeDataset(root)
        t = ds.to_arrow(columns=["score", "id"])
        assert t.column_names == ["score", "id"]  # projection order kept
        assert t.num_rows == 40
        # distributed twin
        df = read_distributed(ds, spark, columns=["id"])
        assert df.columns == ["id"]
        assert sorted(r["id"] for r in df.collect()) == list(range(40))
        with pytest.raises(UnsupportedLanceFeature, match="projection"):
            ds.to_arrow(columns=["nope"])

    def test_projection_never_touches_pruned_pages(self, spark, tmp_path_str):
        """Stronger than 'returns fewer columns': after the title
        column's pages are TRUNCATED in every fragment file, a full
        decode refuses while the id/score projection still decodes —
        the pruned pages were provably never range-checked."""
        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
        )

        root = self._mk(spark, tmp_path_str, "projcorrupt")
        ds = LanceNativeDataset(root)
        _f, frags, _v = ds._manifest()
        for fr in frags:
            p = os.path.join(root, "data", fr.path)
            blob = bytearray(open(p, "rb").read())
            # stomp the title END-OFFSETS (monotone int64 ladder right
            # after the id column's values): make ends[-1] disagree
            # with the payload size so decode refuses
            import numpy as np

            raw = bytes(blob)
            ids = np.arange(20, 40, dtype="<i8").tobytes() if fr.frag_id else np.arange(0, 20, dtype="<i8").tobytes()
            i = raw.find(ids) + len(ids)  # title offsets start here
            last = i + 19 * 8  # ends[-1] of the 20-row page
            blob[last : last + 8] = (2**40).to_bytes(8, "little")
            open(p, "wb").write(bytes(blob))
        ds2 = LanceNativeDataset(root)
        with pytest.raises(UnsupportedLanceFeature):
            ds2.to_arrow()  # full decode hits the corrupted column
        t = ds2.to_arrow(columns=["id", "score"])  # pruned: never reads it
        assert t.num_rows == 40

    def test_sql_pruned_select_and_metadata_count(self, spark, tmp_path_str):
        from lance_flink_spark.sources.catalog import Catalog
        from lance_flink_spark.sources.ddl import SqlEngine

        root = self._mk(spark, tmp_path_str, "projsql")
        eng = SqlEngine(spark, Catalog(tmp_path_str + "/whp"))
        eng.execute(
            f"CREATE TABLE natp (id BIGINT, title STRING, score DOUBLE) "
            f"WITH ('connector'='lance', 'path'='{root}')"
        )
        got = eng.execute("SELECT id, score FROM natp WHERE id < 5")
        assert got.columns == ["id", "score"]
        assert sorted(r["id"] for r in got.collect()) == [0, 1, 2, 3, 4]
        eng.execute("DELETE FROM natp WHERE id >= 30")
        # COUNT(*) fast path: answers from metadata, deletion-aware
        assert eng.execute("SELECT COUNT(*) AS n FROM natp").first()["n"] == 30
        assert (
            eng.execute("SELECT COUNT(*) AS n FROM natp VERSION AS OF 1")
            .first()["n"] == 40
        )
        # prove no data page is opened: remove the data files entirely
        for f in os.listdir(os.path.join(root, "data")):
            os.remove(os.path.join(root, "data", f))
        assert eng.execute("SELECT COUNT(*) AS n FROM natp").first()["n"] == 30
        # aggregates beyond COUNT(*) still go through the real scan —
        # with the files gone, that path must now fail, proving the
        # count didn't silently serve stale data for everything
        with pytest.raises(Exception):  # noqa: B017 - any scan error
            eng.execute("SELECT SUM(score) AS s FROM natp").collect()


class TestSchemaEvolutionAndCompaction:
    """Round 14: ADD/DROP COLUMN as metadata-only manifest commits
    (Lance's evolution model — reads map each schema field to its file
    column through the DataFile's parallel fields/column_indices
    arrays, synthesizing NULL for fields a fragment pre-dates) and
    bin-pack compaction (consecutive fragments merge one-task-per-bin,
    deletion files and dropped-column bytes materialize away, row
    order preserved)."""

    def _mk(self, tmp, name, rows=10, per_file=3):
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import write_dataset

        root = os.path.join(tmp, name)
        t = pa.table(
            {
                "id": pa.array(range(rows), pa.int64()),
                "name": pa.array(
                    [f"d{i}" if i % 4 else None for i in range(rows)],
                    pa.large_utf8(),
                ),
                "emb": pa.array(
                    [[float(i), float(i + 1)] for i in range(rows)],
                    pa.large_list(pa.float32()),
                ),
            }
        )
        write_dataset(root, t, max_rows_per_file=per_file)
        return root, t

    def test_add_column_nulls_then_append_carries_it(self, tmp_path_str):
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import (
            add_column,
            append_to_dataset,
            LanceNativeDataset,
        )

        root, _t = self._mk(tmp_path_str, "evo1")
        v = add_column(root, "score", pa.float64())
        assert v == 2
        got = LanceNativeDataset(root).to_arrow()
        assert got.column_names == ["id", "name", "emb", "score"]
        assert got.column("score").null_count == got.num_rows
        # appended rows carry real values; old rows stay NULL
        t2 = pa.table(
            {
                "id": pa.array([100], pa.int64()),
                "name": pa.array(["new"], pa.large_utf8()),
                "emb": pa.array([[9.0]], pa.large_list(pa.float32())),
                "score": pa.array([0.5], pa.float64()),
            }
        )
        append_to_dataset(root, t2)
        got = LanceNativeDataset(root).to_arrow()
        assert got.column("score").to_pylist()[-1] == 0.5
        assert got.column("score").null_count == got.num_rows - 1
        # projection of ONLY the added column still needs no data pages
        # from old fragments beyond row counts
        only = LanceNativeDataset(root).to_arrow(columns=["score"])
        assert only.num_rows == got.num_rows

    def test_drop_column_hides_pages_old_versions_travel(self, tmp_path_str):
        from lance_flink_spark.sources.lance_native import (
            drop_column,
            LanceNativeDataset,
        )

        root, t = self._mk(tmp_path_str, "evo2")
        drop_column(root, "name")
        ds = LanceNativeDataset(root)
        got = ds.to_arrow()
        assert got.column_names == ["id", "emb"]
        assert got.num_rows == t.num_rows
        # dropped id never reused: next add gets a FRESH id
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import add_column

        add_column(root, "name2", pa.large_utf8())
        fields, _f, _v = LanceNativeDataset(root)._manifest()
        ids = [f.fid for f in fields]
        assert ids == sorted(ids) and len(set(ids)) == len(ids)
        # time travel: version 1 still reads the original column
        old = ds.to_arrow(version=1)
        assert old.column_names == ["id", "name", "emb"]
        assert old.equals(t)

    def test_evolution_refusals(self, tmp_path_str):
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import (
            add_column,
            drop_column,
            write_dataset,
            write_index_section,
            LanceNativeDataset,
        )

        root, _t = self._mk(tmp_path_str, "evo3")
        with pytest.raises(ValueError, match="already exists"):
            add_column(root, "name", pa.large_utf8())
        with pytest.raises(ValueError, match="no column"):
            drop_column(root, "nope")
        with pytest.raises(UnsupportedLanceFeature, match="struct"):
            add_column(root, "meta", pa.struct([("a", pa.int64())]))
        # an index covering the column blocks the drop
        from lance_flink_spark.sources.lance_native import LanceIndexMeta

        v = LanceNativeDataset(root).versions()[-1]
        write_index_section(
            root,
            v,
            [
                LanceIndexMeta(
                    uuid="deadbeef" * 4,
                    name="idx_name",
                    field_ids=[1],
                    dataset_version=v,
                )
            ],
        )
        with pytest.raises(UnsupportedLanceFeature, match="covered by index"):
            drop_column(root, "name")
        # struct-bearing datasets evolve too (round 14: struct headers
        # carry a column index, so the field-id map places columns) —
        # TestStructSchemaEvolution pins the full lifecycle
        sroot = os.path.join(tmp_path_str, "evo3s")
        st = pa.table(
            {
                "id": pa.array([1], pa.int64()),
                "meta": pa.array(
                    [{"a": 1}], pa.struct([("a", pa.int64())])
                ),
            }
        )
        write_dataset(sroot, st)
        add_column(sroot, "x", pa.int64())
        drop_column(sroot, "meta")
        got = LanceNativeDataset(sroot).to_arrow()
        assert got.column_names == ["id", "x"]
        assert got.column("x").to_pylist() == [None]
        # the only column can't drop
        oroot = os.path.join(tmp_path_str, "evo3o")
        write_dataset(oroot, pa.table({"id": pa.array([1], pa.int64())}))
        with pytest.raises(UnsupportedLanceFeature, match="only column"):
            drop_column(oroot, "id")

    def test_compaction_preserves_content_and_order(self, tmp_path_str):
        import numpy as np

        from lance_flink_spark.sources.lance_native import (
            compact_dataset,
            delete_rows,
            LanceNativeDataset,
        )

        root, _t = self._mk(tmp_path_str, "cmp1", rows=30, per_file=4)
        delete_rows(root, list(np.arange(0, 30, 3)))
        ds = LanceNativeDataset(root)
        pre = ds.to_arrow()
        v = compact_dataset(root)
        assert v == 3
        ds2 = LanceNativeDataset(root)
        _f, frags, _v = ds2._manifest()
        assert len(frags) == 1  # 8 small fragments merged into one
        assert all(fr.deletion is None for fr in frags)
        post = ds2.to_arrow()
        assert post.equals(pre)  # content AND row order
        # old version still time-travels to the pre-compaction layout
        assert ds2.to_arrow(version=2).equals(pre)
        # nothing left to do: version does not advance
        assert compact_dataset(root) == v

    def test_compaction_is_incremental(self, tmp_path_str):
        """A lone clean fragment over the targets passes through
        untouched (same file, same fragment id) — compaction cost is
        proportional to the small/dirty tail, not the dataset."""
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import (
            append_to_dataset,
            compact_dataset,
            LanceNativeDataset,
        )

        root, _t = self._mk(tmp_path_str, "cmp2", rows=1000, per_file=1000)
        big = LanceNativeDataset(root)._manifest()[1][0]
        for i in range(3):
            append_to_dataset(
                root,
                pa.table(
                    {
                        "id": pa.array([2000 + i], pa.int64()),
                        "name": pa.array(["x"], pa.large_utf8()),
                        "emb": pa.array([[1.0]], pa.large_list(pa.float32())),
                    }
                ),
            )
        compact_dataset(root, target_rows=1000)
        _f, frags, _v = LanceNativeDataset(root)._manifest()
        assert [fr.path for fr in frags][0] == big.path  # untouched
        assert frags[0].frag_id == big.frag_id
        assert len(frags) == 2  # the 3 tail rows merged into one
        assert frags[1].physical_rows == 3

    def test_distributed_compaction_equals_driver(self, spark, tmp_path_str):
        import numpy as np

        from lance_flink_spark.sources.lance_native import (
            compact_dataset,
            delete_rows,
            drop_column,
            LanceNativeDataset,
        )

        root, _t = self._mk(tmp_path_str, "cmp3", rows=40, per_file=6)
        drop_column(root, "emb")  # evolved fragments materialize the drop
        delete_rows(root, list(np.arange(1, 40, 5)))
        pre = LanceNativeDataset(root).to_arrow()
        v = compact_dataset(root, spark, target_rows=20)
        ds = LanceNativeDataset(root)
        assert ds.to_arrow().equals(pre)
        _f, frags, _v = ds._manifest()
        assert len(frags) == 2  # 40-8=32 live rows under target 20/bin
        # rewritten fragments carry the CURRENT (non-dense) field ids
        fields, _fr, _ = ds._manifest()
        from lance_flink_spark.sources.lance_native import _depth_first_ids

        assert all(fr.field_ids == _depth_first_ids(fields) for fr in frags)

    def test_sql_alter_and_optimize_native(self, spark, tmp_path_str):
        import pyarrow as pa

        from lance_flink_spark.sources.catalog import Catalog
        from lance_flink_spark.sources.ddl import SqlEngine
        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            write_dataset,
        )

        root = os.path.join(tmp_path_str, "sqlevo")
        write_dataset(
            root,
            pa.table(
                {
                    "id": pa.array(range(10), pa.int64()),
                    "name": pa.array([f"d{i}" for i in range(10)], pa.large_utf8()),
                }
            ),
            max_rows_per_file=3,
        )
        eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "whw")))
        eng.execute(
            f"CREATE TABLE docs (id BIGINT, name STRING) "
            f"WITH ('connector'='lance', 'path'='{root}')"
        )
        eng.execute("ALTER TABLE docs ADD COLUMN score DOUBLE")
        r = eng.execute("SELECT COUNT(*) AS n, COUNT(score) AS ns FROM docs").first()
        assert (r["n"], r["ns"]) == (10, 0)
        eng.execute("INSERT INTO docs VALUES (10, 'new', 0.5)")
        r = eng.execute("SELECT COUNT(*) AS n, COUNT(score) AS ns FROM docs").first()
        assert (r["n"], r["ns"]) == (11, 1)
        eng.execute("DELETE FROM docs WHERE id % 3 = 0")
        eng.execute("ALTER TABLE docs DROP COLUMN name")
        assert eng.execute("SELECT * FROM docs").columns == ["id", "score"]
        assert len(LanceNativeDataset(root)._manifest()[1]) == 5
        eng.execute("OPTIMIZE docs")
        assert len(LanceNativeDataset(root)._manifest()[1]) == 1
        got = sorted(r["id"] for r in eng.execute("SELECT id FROM docs").collect())
        assert got == [1, 2, 4, 5, 7, 8, 10]
        # pre-evolution version still serves the original schema
        assert eng.execute("SELECT * FROM docs VERSION AS OF 1").columns == [
            "id",
            "name",
        ]
        with pytest.raises(ValueError, match="ZORDER"):
            eng.execute("OPTIMIZE docs ZORDER BY (id)")


class TestNativeUpdateMerge:
    """Round 14: UPDATE / MERGE on native tables — Lance's rewrite
    shape (deletion files + executor-written replacement fragments) in
    ONE manifest commit, closing the last native-write refusal."""

    def _eng(self, spark, tmp, rows=10):
        import pyarrow as pa

        from lance_flink_spark.sources.catalog import Catalog
        from lance_flink_spark.sources.ddl import SqlEngine
        from lance_flink_spark.sources.lance_native import write_dataset

        root = os.path.join(tmp, "updm")
        write_dataset(
            root,
            pa.table(
                {
                    "id": pa.array(range(rows), pa.int64()),
                    "name": pa.array([f"d{i}" for i in range(rows)], pa.large_utf8()),
                    "qty": pa.array([float(i * 10) for i in range(rows)], pa.float64()),
                }
            ),
            max_rows_per_file=4,
        )
        eng = SqlEngine(spark, Catalog(os.path.join(tmp, "whw")))
        eng.execute(
            f"CREATE TABLE docs (id BIGINT, name STRING, qty DOUBLE) "
            f"WITH ('connector'='lance', 'path'='{root}')"
        )
        return eng, root

    def test_update_one_commit_time_travel(self, spark, tmp_path_str):
        eng, root = self._eng(spark, tmp_path_str)
        eng.execute(
            "UPDATE docs SET qty = qty * 2, name = concat(name, '!') "
            "WHERE id % 3 = 0"
        )
        ds = LanceNativeDataset(root)
        assert ds.versions() == [1, 2]  # delete + append in ONE commit
        got = {r["id"]: (r["name"], r["qty"]) for r in
               eng.execute("SELECT * FROM docs").collect()}
        assert len(got) == 10
        assert got[0] == ("d0!", 0.0) and got[9] == ("d9!", 180.0)
        assert got[1] == ("d1", 10.0)  # unmatched rows untouched
        # pre-update version still serves the original values
        old = ds.to_arrow(version=1).to_pydict()
        assert old["qty"][9] == 90.0
        # SET expressions see PRE-update values (standard SQL): a
        # second update referencing qty uses the committed state
        eng.execute("UPDATE docs SET qty = qty + 1 WHERE id = 0")
        assert (
            eng.execute("SELECT qty FROM docs WHERE id = 0").first()["qty"]
            == 1.0
        )

    def test_update_no_match_no_commit(self, spark, tmp_path_str):
        eng, root = self._eng(spark, tmp_path_str)
        eng.execute("UPDATE docs SET qty = 0 WHERE id > 1000")
        assert LanceNativeDataset(root).versions() == [1]
        with pytest.raises(ValueError, match="not a column"):
            eng.execute("UPDATE docs SET nope = 1")

    def test_merge_upsert_and_conditional(self, spark, tmp_path_str):
        eng, root = self._eng(spark, tmp_path_str)
        eng.execute(
            "MERGE INTO docs USING (SELECT 1 AS id, 'ONE' AS name, "
            "999.0 AS qty UNION ALL SELECT 100, 'NEW', 5.0) ON id"
        )
        got = {r["id"]: (r["name"], r["qty"]) for r in
               eng.execute("SELECT * FROM docs").collect()}
        assert len(got) == 11
        assert got[1] == ("ONE", 999.0) and got[100] == ("NEW", 5.0)
        assert LanceNativeDataset(root).versions() == [1, 2]  # atomic
        eng.execute(
            "MERGE INTO docs USING (SELECT 2 AS id, 'x' AS name, 1.0 AS qty "
            "UNION ALL SELECT 4, 'y', 2.0 UNION ALL SELECT 200, 'z', 3.0) "
            "ON id "
            "WHEN MATCHED AND t.qty > 30 THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET qty = t.qty + s.qty "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        got = {r["id"]: r["qty"] for r in
               eng.execute("SELECT id, qty FROM docs").collect()}
        assert 4 not in got          # matched, qty 40 > 30 → DELETE
        assert got[2] == 21.0        # matched, 20 + 1 → UPDATE
        assert got[200] == 3.0       # not matched → INSERT
        assert got[5] == 50.0        # no clause fired → untouched

    def test_merge_duplicate_source_keys_refuse(self, spark, tmp_path_str):
        eng, _root = self._eng(spark, tmp_path_str)
        with pytest.raises(ValueError, match="duplicate"):
            eng.execute(
                "MERGE INTO docs USING (SELECT 1 AS id, 'a' AS name, "
                "1.0 AS qty UNION ALL SELECT 1, 'b', 2.0) ON id"
            )

    def test_update_after_evolution(self, spark, tmp_path_str):
        """UPDATE on a schema-evolved table: the rewrite conforms every
        touched row to the CURRENT schema (nulls materialized), old
        fragments keep reading through the field-id map."""
        eng, root = self._eng(spark, tmp_path_str)
        eng.execute("ALTER TABLE docs ADD COLUMN score DOUBLE")
        eng.execute("UPDATE docs SET score = qty / 10 WHERE id < 3")
        got = {r["id"]: r["score"] for r in
               eng.execute("SELECT id, score FROM docs").collect()}
        assert got[0] == 0.0 and got[2] == 2.0
        assert got[5] is None


def test_insert_overwrite_native(spark, tmp_path_str):
    """INSERT OVERWRITE a native table (a refusal until r14): the new
    manifest version holds ONLY the new fragments; the pre-overwrite
    version stays time-travelable (Lance overwrite semantics, matching
    the V2 datasource's mode('overwrite'))."""
    import pyarrow as pa

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import write_dataset

    root = os.path.join(tmp_path_str, "ow")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array(range(5), pa.int64()),
                "name": pa.array([f"d{i}" for i in range(5)], pa.large_utf8()),
            }
        ),
    )
    eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "whw")))
    eng.execute(
        f"CREATE TABLE docs (id BIGINT, name STRING) "
        f"WITH ('connector'='lance', 'path'='{root}')"
    )
    eng.execute("INSERT OVERWRITE docs SELECT 100 AS id, 'only' AS name")
    rows = eng.execute("SELECT * FROM docs").collect()
    assert [(r["id"], r["name"]) for r in rows] == [(100, "only")]
    old = eng.execute("SELECT COUNT(*) AS n FROM docs VERSION AS OF 1").first()
    assert old["n"] == 5


def test_native_truncate_restore_vacuum(spark, tmp_path_str):
    """The remaining native lifecycle statements (round 14): TRUNCATE
    commits an empty version (a delete, time travel keeps working),
    RESTORE re-commits an old manifest as the new latest
    (metadata-only rollback), and VACUUM physically removes every
    file only dropped versions reference — Lance's
    cleanup_old_versions."""
    import pyarrow as pa

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import write_dataset

    root = os.path.join(tmp_path_str, "lc")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array(range(8), pa.int64()),
                "name": pa.array([f"d{i}" for i in range(8)], pa.large_utf8()),
            }
        ),
        max_rows_per_file=3,
    )
    eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "whw")))
    eng.execute(
        f"CREATE TABLE docs (id BIGINT, name STRING) "
        f"WITH ('connector'='lance', 'path'='{root}')"
    )
    eng.execute("DELETE FROM docs WHERE id = 0")  # v2, deletion file
    eng.execute("TRUNCATE TABLE docs")  # v3, empty
    assert eng.execute("SELECT COUNT(*) AS n FROM docs").first()["n"] == 0
    assert (
        eng.execute("SELECT COUNT(*) AS n FROM docs VERSION AS OF 2").first()[
            "n"
        ]
        == 7
    )
    eng.execute("RESTORE TABLE docs TO VERSION AS OF 2")  # v4 == v2
    assert eng.execute("SELECT COUNT(*) AS n FROM docs").first()["n"] == 7
    ds = LanceNativeDataset(root)
    assert ds.versions() == [1, 2, 3, 4]
    # vacuum to the latest version only: the truncate fragment and
    # nothing the restored manifest references goes away
    deleted = [
        r["deleted_file"]
        for r in eng.execute("VACUUM docs KEEP 1").collect()
    ]
    assert any(d.startswith("_versions/3") for d in deleted)
    assert any(d.startswith("data/") for d in deleted)  # truncate frag
    ds = LanceNativeDataset(root)
    assert ds.versions() == [4]
    assert eng.execute("SELECT COUNT(*) AS n FROM docs").first()["n"] == 7
    # the kept version's deletion file survived the vacuum
    assert (
        sorted(r["id"] for r in eng.execute("SELECT id FROM docs").collect())
        == list(range(1, 8))
    )


def test_native_change_feed(spark, tmp_path_str):
    """read_changes_distributed (round 14): inserts from appeared
    fragments, deletes from deletion-file growth WITH pre-image
    values, an UPDATE commit carrying its delete+insert pair under one
    _commit_version, metadata-only commits silent, rows rendered in
    to_version's schema, and a loud refusal across fragment-replacing
    commits (compaction)."""
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        add_column,
        append_to_dataset,
        compact_dataset,
        delete_rows,
        read_changes_distributed,
        update_rows_distributed,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "cdc")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array(range(6), pa.int64()),
                "v": pa.array([float(i) for i in range(6)], pa.float64()),
            }
        ),
        max_rows_per_file=3,
    )  # v1
    append_to_dataset(
        root,
        pa.table(
            {"id": pa.array([10], pa.int64()), "v": pa.array([7.0], pa.float64())}
        ),
    )  # v2
    delete_rows(root, [0, 4])  # v3
    add_column(root, "q", pa.float64())  # v4: metadata-only, silent
    update_rows_distributed(
        root,
        spark.createDataFrame([(1, 99.0, 0.5)], "id long, v double, q double"),
        [1],
    )  # v5: delete+insert in ONE commit
    got = sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in read_changes_distributed(root, spark, 0).collect()
    )
    assert got == [
        (1, "insert", 0, 0.0),
        (1, "insert", 1, 1.0),
        (1, "insert", 2, 2.0),
        (1, "insert", 3, 3.0),
        (1, "insert", 4, 4.0),
        (1, "insert", 5, 5.0),
        (2, "insert", 10, 7.0),
        (3, "delete", 0, 0.0),   # pre-image values
        (3, "delete", 4, 4.0),
        (5, "delete", 1, 1.0),   # the update's retract...
        (5, "insert", 1, 99.0),  # ...and its new image
    ]
    # windowed read: only (2, 3]
    win = read_changes_distributed(root, spark, 2, 3)
    assert sorted(r["id"] for r in win.collect()) == [0, 4]
    # rows render in to_version's schema (q exists, null pre-evolution)
    feed = read_changes_distributed(root, spark, 0)
    assert "q" in feed.columns
    # compaction replaces fragments: refuse past it, fine before it
    compact_dataset(root)  # v6
    with pytest.raises(UnsupportedLanceFeature, match="REPLACES"):
        read_changes_distributed(root, spark, 0)
    assert read_changes_distributed(root, spark, 0, 5).count() == 11


def test_table_changes_tvf_and_show_create(spark, tmp_path_str):
    """SQL surface of the native change feed + SHOW CREATE TABLE on a
    native table (round 14)."""
    import pyarrow as pa

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import write_dataset

    root = os.path.join(tmp_path_str, "tvf")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array(range(5), pa.int64()),
                "v": pa.array([float(i) for i in range(5)], pa.float64()),
            }
        ),
    )
    eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "whw")))
    eng.execute(
        f"CREATE TABLE docs (id BIGINT, v DOUBLE) "
        f"WITH ('connector'='lance', 'path'='{root}')"
    )
    eng.execute("DELETE FROM docs WHERE id = 3")
    eng.execute("UPDATE docs SET v = v * 10 WHERE id = 0")
    got = sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in eng.execute(
            "SELECT * FROM table_changes('docs', 1)"
        ).collect()
    )
    assert got == [
        (2, "delete", 3, 3.0),
        (3, "delete", 0, 0.0),
        (3, "insert", 0, 0.0 * 10),
    ]
    # windowed form
    assert (
        eng.execute("SELECT * FROM table_changes('docs', 1, 2)").count() == 1
    )
    stmt = eng.execute("SHOW CREATE TABLE docs").first()["create_statement"]
    assert "'connector' = 'lance'" in stmt and root in stmt
    assert "id BIGINT" in stmt and "v DOUBLE" in stmt


@pytest.fixture()
def ds_spark_native(spark):
    from lance_flink_spark.sources import spark_datasource as dsx

    dsx.register(spark)
    return spark


def test_driver_read_survives_emptied_fragment(spark, tmp_path_str):
    """Regression (r14): pyspark's createDataFrame(pa.Table) TRUNCATES
    at the first empty chunk — a fragment whose rows are all deleted
    produced a silently-short driver-side read(). combine_chunks
    before the bridge; the arrow read and the Spark read must agree."""
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        delete_rows,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "emptied")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array(range(9), pa.int64()),
                "v": pa.array([float(i) for i in range(9)], pa.float64()),
            }
        ),
        max_rows_per_file=3,
    )
    delete_rows(root, [3, 4, 5])  # the MIDDLE fragment empties
    ds = LanceNativeDataset(root)
    assert ds.to_arrow().num_rows == 6
    got = sorted(r["id"] for r in ds.read(spark).collect())
    assert got == [0, 1, 2, 6, 7, 8]


class TestNativeUpsertSink:
    """UpsertNativeSink (round 14): the keyed-changelog fold landing
    in a NATIVE dataset, one manifest commit per micro-batch."""

    def _batch(self, spark, rows):
        return spark.createDataFrame(
            rows, "k string, v double, seq long, _op string"
        )

    def test_fold_guards_and_delete_memory(self, spark, tmp_path_str):
        from lance_flink_spark.streaming.upsert import UpsertNativeSink

        root = os.path.join(tmp_path_str, "nupsert")
        sink = UpsertNativeSink(root, "k", seq_cols=["seq"])
        sink.write_batch(
            self._batch(
                spark, [("a", 1.0, 1, "U"), ("b", 2.0, 1, "U"), ("c", 3.0, 1, "U")]
            ),
            0,
        )
        sink.write_batch(
            self._batch(
                spark,
                [("a", 10.0, 3, "U"), ("b", 0.0, 2, "D"), ("d", 4.0, 2, "U")],
            ),
            1,
        )
        # stale post-delete 'b' must NOT resurrect; stale 'a' ignored
        sink.write_batch(
            self._batch(spark, [("b", 99.0, 1, "U"), ("a", 5.0, 2, "U")]), 2
        )
        ds = LanceNativeDataset(root)
        got = sorted(
            (r["k"], r["v"], r["seq"]) for r in ds.read(spark).collect()
        )
        assert got == [("a", 10.0, 3), ("c", 3.0, 1), ("d", 4.0, 2)]
        # a no-change batch commits nothing; a replayed batch no-ops
        vs = ds.versions()
        sink.write_batch(
            self._batch(
                spark,
                [("a", 10.0, 3, "U"), ("b", 0.0, 2, "D"), ("d", 4.0, 2, "U")],
            ),
            1,
        )
        assert LanceNativeDataset(root).versions() == vs

    def test_fully_native_replication_loop(self, ds_spark_native, tmp_path_str):
        """native source table → readChanges stream → UpsertNativeSink
        → native replica: the replica equals the source's live rows."""
        import pyarrow as pa

        from lance_flink_spark.streaming.upsert import UpsertNativeSink
        from lance_flink_spark.sources.lance_native import (
            delete_rows,
            update_rows_distributed,
            write_dataset,
        )

        spark = ds_spark_native
        src = os.path.join(tmp_path_str, "cdc_src")
        write_dataset(
            src,
            pa.table(
                {
                    "k": pa.array([f"k{i}" for i in range(8)], pa.large_utf8()),
                    "v": pa.array([float(i) for i in range(8)], pa.float64()),
                }
            ),
        )
        delete_rows(src, [2])
        update_rows_distributed(
            src,
            spark.createDataFrame([("k5", 50.0)], "k string, v double"),
            [5],
        )
        replica = os.path.join(tmp_path_str, "cdc_replica")
        # an UPDATE commit's delete+insert pair shares _commit_version;
        # the insert must win the fold — derive a tie-broken sequence
        sink = UpsertNativeSink(
            replica, "k", op_col="_change_type",
            seq_cols=["_seq"],
            delete_ops=("delete",),
        )
        sdf = (
            spark.readStream.format("lance_native")
            .option("path", src)
            .option("readChanges", "true")
            .load()
        )
        # _commit_version doubles as the sequence; _change_type as op.
        # Project the op/seq columns the sink folds on.
        q = (
            sink.attach(
                sdf.selectExpr(
                    "k",
                    "v",
                    "_commit_version * 2 + IF(_change_type = 'insert', 1, 0)"
                    " AS _seq",
                    "_change_type",
                ),
                os.path.join(tmp_path_str, "cdc_loop_ck"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = sorted(
            (r["k"], r["v"])
            for r in LanceNativeDataset(replica).read(spark).collect()
        )
        want = sorted(
            (r["k"], r["v"])
            for r in LanceNativeDataset(src).read(spark).collect()
        )
        assert got == want and len(want) == 7


def test_native_create_index_and_search(spark, tmp_path_str):
    """CREATE INDEX on a NATIVE table (round 14): OUR sidecar IVF
    index over the distributed native read, entries addressed by
    global physical offset — Lance's address+mask model. A DELETE-only
    commit stays servable (current masks anti-joined at query time,
    no rebuild); a fragment-set change (INSERT) is stale → warn +
    exact brute. SCALAR refuses."""
    import warnings

    import numpy as np
    import pyarrow as pa

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import write_dataset

    rng = np.random.default_rng(7)
    n, d = 400, 8
    vecs = rng.normal(size=(n, d)).astype("float32")
    root = os.path.join(tmp_path_str, "natidx")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.large_list(pa.float32())
                ),
            }
        ),
        max_rows_per_file=100,
    )
    eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "whw")))
    eng.execute(
        f"CREATE TABLE docs (id BIGINT, embedding ARRAY<FLOAT>) "
        f"WITH ('connector'='lance', 'path'='{root}')"
    )
    with pytest.raises(ValueError, match="SCALAR"):
        eng.execute("CREATE INDEX ON docs (id) USING SCALAR")
    r = eng.execute(
        "CREATE INDEX ON docs (embedding) USING IVF_FLAT "
        "WITH ('index.num-partitions'='8')"
    ).first()
    assert (r["using"], r["version"]) == ("IVF_FLAT", 1)
    q = vecs[5].tolist()
    qsql = "ARRAY[" + ",".join(str(x) for x in q) + "]"
    got = eng.execute(
        f"SELECT * FROM vector_search('docs', 'embedding', {qsql}, 3, 'L2')"
    ).collect()
    assert got[0]["id"] == 5 and got[0]["distance"] == 0.0
    # DELETE-only drift: the index serves with the mask applied
    eng.execute("DELETE FROM docs WHERE id = 5")
    got2 = eng.execute(
        f"SELECT * FROM vector_search('docs', 'embedding', {qsql}, 3, 'L2')"
    ).collect()
    assert 5 not in [x["id"] for x in got2] and len(got2) == 3
    # INSERT changes the fragment set: stale → warn + exact brute
    eng.execute(
        "INSERT INTO docs VALUES (9999, ARRAY["
        + ",".join(str(x) for x in q)
        + "])"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got3 = eng.execute(
            f"SELECT * FROM vector_search('docs', 'embedding', {qsql}, 2, 'L2')"
        ).collect()
    assert any("STALE" in str(x.message) for x in w)
    assert got3[0]["id"] == 9999


def test_native_show_and_drop_sidecar_index(spark, tmp_path_str):
    """SHOW INDEXES lists OUR sidecar index beside library-built ones
    (fresh = unchanged fragment set); DROP INDEX removes it and
    vector_search goes back to brute."""
    import numpy as np
    import pyarrow as pa

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import write_dataset

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(60, 4)).astype("float32")
    root = os.path.join(tmp_path_str, "sidx")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array(range(60), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.large_list(pa.float32())
                ),
            }
        ),
    )
    eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "whw")))
    eng.execute(
        f"CREATE TABLE docs (id BIGINT, embedding ARRAY<FLOAT>) "
        f"WITH ('connector'='lance', 'path'='{root}')"
    )
    eng.execute(
        "CREATE INDEX ON docs (embedding) USING IVF_FLAT "
        "WITH ('index.num-partitions'='4')"
    )
    rows = {r["column"]: r for r in eng.execute("SHOW INDEXES ON docs").collect()}
    assert rows["embedding"]["using"] == "SIDECAR_VECTOR"
    assert rows["embedding"]["fresh"] is True
    eng.execute("INSERT INTO docs VALUES (100, ARRAY[0.0, 0.0, 0.0, 0.0])")
    rows = {r["column"]: r for r in eng.execute("SHOW INDEXES ON docs").collect()}
    assert rows["embedding"]["fresh"] is False  # fragment set changed
    eng.execute("DROP INDEX ON docs (embedding) USING IVF_FLAT")
    assert eng.execute("SHOW INDEXES ON docs").count() == 0
    with pytest.raises(ValueError, match="no sidecar index"):
        eng.execute("DROP INDEX ON docs (embedding)")


def test_index_vacuum_compact_interplay(spark, tmp_path_str):
    """Maintenance interplay (round 14): VACUUM never touches OUR
    sidecar index dir (it is not version-referenced); OPTIMIZE changes
    the fragment set so the sidecar reports stale and vector_search
    falls back to exact brute; update_rows_distributed refuses a
    mismatched replacement schema."""
    import warnings

    import numpy as np
    import pyarrow as pa

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import (
        UnsupportedLanceFeature,
        update_rows_distributed,
        write_dataset,
    )

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(90, 4)).astype("float32")
    root = os.path.join(tmp_path_str, "mx")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array(range(90), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.large_list(pa.float32())
                ),
            }
        ),
        max_rows_per_file=30,
    )
    eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "whw")))
    eng.execute(
        f"CREATE TABLE docs (id BIGINT, embedding ARRAY<FLOAT>) "
        f"WITH ('connector'='lance', 'path'='{root}')"
    )
    eng.execute(
        "CREATE INDEX ON docs (embedding) USING IVF_FLAT "
        "WITH ('index.num-partitions'='4')"
    )
    eng.execute("DELETE FROM docs WHERE id % 9 = 0")
    eng.execute("VACUUM docs KEEP 1")
    # the sidecar survived the vacuum and still serves (delete-only)
    q = vecs[7].tolist()
    qsql = "ARRAY[" + ",".join(str(x) for x in q) + "]"
    got = eng.execute(
        f"SELECT * FROM vector_search('docs', 'embedding', {qsql}, 2, 'L2')"
    ).collect()
    assert got[0]["id"] == 7
    # compaction rewrites the fragment set: stale → warn + exact brute
    eng.execute("OPTIMIZE docs")
    rows = {r["column"]: r for r in eng.execute("SHOW INDEXES ON docs").collect()}
    assert rows["embedding"]["fresh"] is False
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got2 = eng.execute(
            f"SELECT * FROM vector_search('docs', 'embedding', {qsql}, 2, 'L2')"
        ).collect()
    assert any("STALE" in str(x.message) for x in w)
    assert got2[0]["id"] == 7
    # replacement-schema mismatch refuses loudly
    with pytest.raises(UnsupportedLanceFeature, match="schema mismatch"):
        update_rows_distributed(
            root,
            spark.createDataFrame([(1, "nope")], "id long, other string"),
            [0],
        )


def test_native_insert_honors_write_max_rows(spark, tmp_path_str):
    """The table's declared write.max-rows-per-file rides into the
    executor-side fragment flush on native INSERT (LanceOptions
    parity — the same option the parquet-backed sink honors)."""
    import pyarrow as pa

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import write_dataset

    root = os.path.join(tmp_path_str, "wopt")
    write_dataset(root, pa.table({"id": pa.array([0], pa.int64())}))
    eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "whw")))
    eng.execute(
        f"CREATE TABLE docs (id BIGINT) WITH ('connector'='lance', "
        f"'path'='{root}', 'write.max-rows-per-file'='10')"
    )
    eng.execute("INSERT INTO docs SELECT id FROM RANGE(35)")
    _f, frags, _v = LanceNativeDataset(root)._manifest()
    assert all(fr.physical_rows <= 10 for fr in frags)
    assert eng.execute("SELECT COUNT(*) AS n FROM docs").first()["n"] == 36


def test_change_feed_refuses_vacuumed_base(spark, tmp_path_str):
    """A vacuumed-away from_version has no diffable state — treating
    the first surviving manifest as bootstrap inserts would silently
    skip the retractions committed in the gap. Refuse loudly;
    from_version=0 (full re-bootstrap) still serves."""
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        delete_rows,
        read_changes_distributed,
        vacuum_dataset,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "vcdc")
    write_dataset(
        root, pa.table({"id": pa.array(range(6), pa.int64())})
    )  # v1
    delete_rows(root, [1])  # v2
    delete_rows(root, [2])  # v3
    vacuum_dataset(root, keep_versions=1)  # only v3 remains
    with pytest.raises(ValueError, match="vacuumed"):
        read_changes_distributed(root, spark, 1)
    boot = read_changes_distributed(root, spark, 0)
    assert sorted(r["id"] for r in boot.collect()) == [0, 3, 4, 5]
    assert {r["_change_type"] for r in boot.collect()} == {"insert"}


def test_concurrent_manifest_commit_conflicts(tmp_path_str):
    """Native commits are rename-if-absent (round 14): two writers
    racing to the same version raise NativeCommitConflict for the
    loser instead of silently clobbering the winner's manifest — the
    Lance conditional-put / parquet-Dataset CommitConflict contract.
    The loser's fragment files orphan and VACUUM reclaims them."""
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        NativeCommitConflict,
        append_to_dataset,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "race")
    write_dataset(root, pa.table({"id": pa.array([1], pa.int64())}))
    t2 = pa.table({"id": pa.array([2], pa.int64())})
    append_to_dataset(root, t2)  # commits version 2
    # a writer whose snapshot predates version 2 loses the race:
    # simulate by restoring the stale snapshot's view of "next = 2"
    from lance_flink_spark.sources import lance_native as ln

    fields, frags, _v = LanceNativeDataset(root)._manifest(1)
    with pytest.raises(NativeCommitConflict, match="concurrently"):
        ln._write_manifest(
            root, 2, ln._schema_fields_of_existing(fields), frags
        )
    # the winner's commit is intact
    assert LanceNativeDataset(root).to_arrow().num_rows == 2


def test_append_retries_past_commit_race(spark, tmp_path_str):
    """Appends COMMUTE: a distributed append whose snapshot went stale
    (another writer committed first) re-plates its already-written
    fragments onto the fresh snapshot instead of failing — Lance's
    append retry rule. Both writers' rows survive."""
    import pyarrow as pa

    from lance_flink_spark.sources import lance_native as ln
    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        append_to_dataset_distributed,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "aprace")
    write_dataset(root, pa.table({"id": pa.array([1], pa.int64())}))
    # inject a competing commit BETWEEN the append's snapshot read and
    # its manifest write: the first attempt must hit the conflict, the
    # retry loop re-plates onto the racer's snapshot
    real = ln._write_manifest
    state = {"raced": False}

    def racing_write(r, version, blob, frags):
        if not state["raced"]:
            state["raced"] = True
            fields1, frags1, _ = LanceNativeDataset(root)._manifest(1)
            real(r, version, ln._schema_fields_of_existing(fields1), frags1)
        return real(r, version, blob, frags)

    ln._write_manifest = racing_write
    try:
        append_to_dataset_distributed(
            root, spark.createDataFrame([(7,)], "id long")
        )
    finally:
        ln._write_manifest = real
    assert state["raced"]
    ds = LanceNativeDataset(root)
    assert ds.versions() == [1, 2, 3]  # racer's v2, append retried to v3
    assert sorted(ds.to_arrow().column("id").to_pylist()) == [1, 7]


def test_show_versions_native(spark, tmp_path_str):
    """SHOW VERSIONS on a native table answers from the manifest chain
    + deletion-file counts alone (version, fragments, live_rows)."""
    import pyarrow as pa

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import write_dataset

    root = os.path.join(tmp_path_str, "showv")
    write_dataset(root, pa.table({"id": pa.array(range(5), pa.int64())}))
    eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "whw")))
    eng.execute(
        f"CREATE TABLE docs (id BIGINT) WITH ('connector'='lance', 'path'='{root}')"
    )
    eng.execute("DELETE FROM docs WHERE id = 0")
    got = [
        (r["version"], r["fragments"], r["live_rows"])
        for r in eng.execute("SHOW VERSIONS IN docs").collect()
    ]
    assert got == [(1, 1, 5), (2, 1, 4)]


def test_vector_search_over_native_path(spark, tmp_path_str):
    """vector_search('<dataset path>', ...) — the reference's
    path-addressed form — detects the native layout and brute-forces
    over the distributed scan without any CREATE TABLE."""
    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine

    eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "whw")))
    got = eng.execute(
        f"SELECT * FROM vector_search('{REF}/lance-vector-search', "
        "'embedding', ARRAY[0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8], 3, 'L2')"
    ).collect()
    assert got[0]["id"] == 1 and got[0]["distance"] == 0.0
    assert len(got) == 3


def test_mutation_refuses_stale_offset_snapshot(tmp_path_str):
    """Offset-addressed mutations are not commutative: offsets resolved
    against one snapshot must refuse once another commit (here a
    compaction, which re-addresses rows) lands first — silent
    mis-tombstoning is the failure mode this guards."""
    import pyarrow as pa
    import pytest

    from lance_flink_spark.sources.lance_native import (
        NativeCommitConflict,
        LanceNativeDataset,
        append_to_dataset,
        delete_rows,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "stale")
    write_dataset(root, pa.table({"id": pa.array(range(10), pa.int64())}))
    v1 = LanceNativeDataset(root)._manifests[-1]
    # another writer commits before our delete lands
    v2 = append_to_dataset(
        root, pa.table({"id": pa.array([100], pa.int64())})
    )
    with pytest.raises(NativeCommitConflict, match="re-resolve"):
        delete_rows(root, [0, 1], expected_version=v1)
    # re-resolved at the current version: proceeds
    v3 = delete_rows(root, [0, 1], expected_version=v2)
    assert LanceNativeDataset(root).live_row_count(v3) == 9
    # unguarded call (library API, caller owns consistency) still works
    delete_rows(root, [2])


class TestStructSchemaEvolution:
    """ADD/DROP COLUMN on struct-bearing datasets (round 14 close of
    the last evolution refusal): struct headers now carry a column
    index (their first child's column) so DataFile arrays stay
    parallel and the field-id map can place every column after the
    schema changes; fragments from before that convention refuse
    evolution with a compact-first hint and OPTIMIZE heals them."""

    def _mk(self, tmp_path_str, name):
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import write_dataset

        root = os.path.join(tmp_path_str, name)
        t = pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int64()),
                "meta": pa.array(
                    [
                        {"w": 10, "h": 20},
                        {"w": 11, "h": 21},
                        {"w": 12, "h": None},
                    ],
                    pa.struct([("w", pa.int64()), ("h", pa.int64())]),
                ),
                "lang": pa.array(["en", "de", "fr"]),
            }
        )
        write_dataset(root, t)
        return root

    def test_struct_plates_are_parallel(self, tmp_path_str):
        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
        )

        root = self._mk(tmp_path_str, "sp")
        _fields, frags, _v = LanceNativeDataset(root)._manifest()
        fr = frags[0]
        # depth-first: id, meta, meta.w, meta.h, lang — meta shares
        # its first child's column, so 5 entries over 4 data columns
        assert fr.field_ids == [0, 1, 2, 3, 4]
        assert fr.column_indices == [0, 1, 1, 2, 3]

    def test_add_and_drop_around_struct(self, tmp_path_str):
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            add_column,
            append_to_dataset,
            arrow_schema_of,
            drop_column,
        )

        root = self._mk(tmp_path_str, "ev")
        add_column(root, "quality", pa.float64())  # v2
        nds = LanceNativeDataset(root)
        fields, _f, _v = nds._manifest()
        t2 = pa.table(
            {
                "id": pa.array([4], pa.int64()),
                "meta": pa.array(
                    [{"w": 40, "h": 41}],
                    pa.struct([("w", pa.int64()), ("h", pa.int64())]),
                ),
                "lang": pa.array(["it"]),
                "quality": pa.array([0.9], pa.float64()),
            }
        ).cast(arrow_schema_of(fields))
        append_to_dataset(root, t2)  # v3
        got = LanceNativeDataset(root).to_arrow()
        assert got.num_rows == 4
        # pre-evolution fragment reads NULL quality through the map
        assert got.column("quality").to_pylist() == [None, None, None, 0.9]
        assert got.column("meta").to_pylist()[0] == {"w": 10, "h": 20}
        assert got.column("meta").to_pylist()[3] == {"w": 40, "h": 41}
        drop_column(root, "lang")  # v4
        got = LanceNativeDataset(root).to_arrow()
        assert got.column_names == ["id", "meta", "quality"]
        assert got.column("meta").to_pylist()[2] == {"w": 12, "h": None}
        # time travel: the pre-drop version still carries lang
        old = LanceNativeDataset(root).to_arrow(version=3)
        assert old.column("lang").to_pylist() == ["en", "de", "fr", "it"]
        drop_column(root, "meta")  # v5: drop the struct itself
        got = LanceNativeDataset(root).to_arrow()
        assert got.column_names == ["id", "quality"]
        assert got.column("id").to_pylist() == [1, 2, 3, 4]

    def test_compaction_materializes_struct_evolution(self, tmp_path_str):
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            add_column,
            compact_dataset,
            delete_rows,
        )

        root = self._mk(tmp_path_str, "cp")
        add_column(root, "quality", pa.float64())
        delete_rows(root, [1])
        v = compact_dataset(root)
        nds = LanceNativeDataset(root)
        _fields, frags, _ = nds._manifest(v)
        # rewritten clean: no deletions, current-schema plates
        assert all(fr.deletion is None for fr in frags)
        assert all(
            len(fr.field_ids) == len(fr.column_indices) for fr in frags
        )
        got = nds.to_arrow()
        assert got.column("id").to_pylist() == [1, 3]
        assert got.column("meta").to_pylist() == [
            {"w": 10, "h": 20},
            {"w": 12, "h": None},
        ]
        assert got.column("quality").to_pylist() == [None, None]

    def test_legacy_struct_fragments_refuse_then_heal(self, tmp_path_str):
        import pyarrow as pa
        import pytest

        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            UnsupportedLanceFeature,
            _schema_fields_of_existing,
            _write_manifest,
            add_column,
            compact_dataset,
        )

        root = self._mk(tmp_path_str, "lg")
        nds = LanceNativeDataset(root)
        fields, frags, v = nds._manifest()
        # simulate a fragment written before struct headers carried a
        # column index: data columns only, non-parallel with field_ids
        for fr in frags:
            fr.column_indices = [0, 1, 2, 3]
        _write_manifest(
            root, v + 1, _schema_fields_of_existing(fields), frags
        )
        # the legacy shape still READS at its own schema...
        assert LanceNativeDataset(root).to_arrow().num_rows == 3
        # ...but refuses evolution until compaction rewrites it
        with pytest.raises(UnsupportedLanceFeature, match="OPTIMIZE"):
            add_column(root, "quality", pa.float64())
        compact_dataset(root, target_rows=2)  # forces a rewrite bin
        add_column(root, "quality", pa.float64())
        got = LanceNativeDataset(root).to_arrow()
        assert got.column("quality").to_pylist() == [None, None, None]
        assert got.column("meta").to_pylist()[1] == {"w": 11, "h": 21}


def test_drop_indexed_column_refuses_sidecar_binding(spark, tmp_path_str):
    """DROP COLUMN of a column covered by a SIDECAR vector index
    refuses (same rule as the manifest IndexSection check) — an
    orphaned binding would keep vector_search serving ghost results
    for a column that no longer exists; after DROP INDEX the column
    drops, and a search on it fails as an unknown column."""
    import numpy as np
    import pyarrow as pa
    import pytest

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import write_dataset

    root = os.path.join(tmp_path_str, "idxdrop")
    rng = np.random.default_rng(0)
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array(range(20), pa.int64()),
                "emb": pa.array(
                    [rng.normal(size=4).tolist() for _ in range(20)],
                    pa.large_list(pa.float32()),
                ),
                "extra": pa.array(["x"] * 20, pa.large_utf8()),
            }
        ),
    )
    eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "wh_idxdrop")))
    eng.execute(
        f"CREATE TABLE tix (id BIGINT, emb ARRAY<FLOAT>, extra STRING) "
        f"WITH ('connector' = 'lance', 'path' = '{root}')"
    )
    eng.execute(
        "CREATE INDEX ON tix (emb) USING IVF_FLAT "
        "WITH ('index.num-partitions' = '2')"
    )
    with pytest.raises(ValueError, match="DROP INDEX"):
        eng.execute("ALTER TABLE tix DROP COLUMN emb")
    # still indexed and searchable
    got = eng.execute(
        "SELECT * FROM vector_search('tix', 'emb', "
        "ARRAY[0.1, 0.2, 0.3, 0.4], 3)"
    )
    assert got.count() == 3
    eng.execute("DROP INDEX ON tix (emb)")
    eng.execute("ALTER TABLE tix DROP COLUMN emb")
    with pytest.raises(Exception):
        eng.execute(
            "SELECT * FROM vector_search('tix', 'emb', "
            "ARRAY[0.1, 0.2, 0.3, 0.4], 3)"
        ).collect()


class TestEvolutionGuardHardening:
    """Round-14 extension review fixes: the evolution guard must
    refuse every fragment the post-evolution field-id map could not
    read (not just non-parallel lengths), OPTIMIZE must heal exactly
    those fragments, cross-field column collisions refuse at read,
    and multi-column ALTERs are atomic-or-refused ONE-commit."""

    def _mk_struct(self, tmp_path_str, name):
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import write_dataset

        root = os.path.join(tmp_path_str, name)
        write_dataset(
            root,
            pa.table(
                {
                    "id": pa.array([1, 2, 3], pa.int64()),
                    "meta": pa.array(
                        [{"w": 10}, {"w": 11}, {"w": 12}],
                        pa.struct([("w", pa.int64())]),
                    ),
                }
            ),
        )
        return root

    def test_empty_column_indices_struct_refuses_then_heals(
        self, tmp_path_str
    ):
        """A struct-bearing fragment with NO column_indices reads fine
        unevolved (range fallback never engages) but would wedge after
        ADD COLUMN — the guard must refuse BEFORE the commit, and
        OPTIMIZE must rewrite it (the documented heal), not skip it as
        clean."""
        import pyarrow as pa
        import pytest

        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            UnsupportedLanceFeature,
            _schema_fields_of_existing,
            _write_manifest,
            add_column,
            compact_dataset,
        )

        root = self._mk_struct(tmp_path_str, "eci")
        nds = LanceNativeDataset(root)
        fields, frags, v = nds._manifest()
        frags[0].column_indices = []
        _write_manifest(root, v + 1, _schema_fields_of_existing(fields), frags)
        assert LanceNativeDataset(root).to_arrow().num_rows == 3
        with pytest.raises(UnsupportedLanceFeature, match="OPTIMIZE"):
            add_column(root, "x", pa.int64())
        # pre-evolution OPTIMIZE must NOT treat it as clean
        assert compact_dataset(root) > v + 1
        add_column(root, "x", pa.int64())
        got = LanceNativeDataset(root).to_arrow()
        assert got.column("meta").to_pylist() == [
            {"w": 10}, {"w": 11}, {"w": 12},
        ]
        assert got.column("x").to_pylist() == [None, None, None]

    def test_empty_field_ids_refuses_then_heals(self, tmp_path_str):
        """A fragment with NO DataFile field ids cannot be field-id
        mapped after any schema change — evolution refuses, OPTIMIZE
        rewrites it with full metadata, evolution then proceeds."""
        import pyarrow as pa
        import pytest

        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            UnsupportedLanceFeature,
            _schema_fields_of_existing,
            _write_manifest,
            add_column,
            compact_dataset,
        )

        root = os.path.join(tmp_path_str, "efi")
        from lance_flink_spark.sources.lance_native import write_dataset

        write_dataset(
            root,
            __import__("pyarrow").table(
                {"id": __import__("pyarrow").array([1, 2], "int64")}
            ),
        )
        nds = LanceNativeDataset(root)
        fields, frags, v = nds._manifest()
        frags[0].field_ids = []
        frags[0].column_indices = []
        _write_manifest(root, v + 1, _schema_fields_of_existing(fields), frags)
        assert LanceNativeDataset(root).to_arrow().num_rows == 2
        with pytest.raises(UnsupportedLanceFeature, match="field ids"):
            add_column(root, "x", pa.int64())
        compact_dataset(root)
        add_column(root, "x", pa.int64())
        got = LanceNativeDataset(root).to_arrow()
        assert got.column("id").to_pylist() == [1, 2]
        assert got.column("x").to_pylist() == [None, None]

    def test_cross_field_column_collision_refuses(self, tmp_path_str):
        """Two DISTINCT top-level fields claiming the same file column
        (unique fids, colliding column_indices) must refuse — one
        field's bytes would silently decode as the other's."""
        import pytest

        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            UnsupportedLanceFeature,
            _schema_fields_of_existing,
            _write_manifest,
            write_dataset,
        )

        root = os.path.join(tmp_path_str, "coll")
        import pyarrow as pa

        write_dataset(
            root,
            pa.table(
                {
                    "a": pa.array([1, 2], pa.int64()),
                    "b": pa.array([3, 4], pa.int64()),
                }
            ),
        )
        nds = LanceNativeDataset(root)
        fields, frags, v = nds._manifest()
        # reorder so the evolved map path engages, then collide
        frags[0].field_ids = [1, 0]
        frags[0].column_indices = [0, 0]
        _write_manifest(root, v + 1, _schema_fields_of_existing(fields), frags)
        with pytest.raises(UnsupportedLanceFeature, match="ambiguously"):
            LanceNativeDataset(root).to_arrow()

    def test_multi_column_alter_is_atomic_one_commit(
        self, spark, tmp_path_str
    ):
        """ALTER TABLE ... ADD/DROP of a column LIST commits exactly
        ONE manifest version, and a refusal mid-list (struct ADD,
        index-covered DROP) leaves NO column added or dropped."""
        import numpy as np
        import pyarrow as pa
        import pytest

        from lance_flink_spark.sources.catalog import Catalog
        from lance_flink_spark.sources.ddl import SqlEngine
        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            write_dataset,
        )

        root = os.path.join(tmp_path_str, "atomic")
        rng = np.random.default_rng(0)
        write_dataset(
            root,
            pa.table(
                {
                    "id": pa.array(range(20), pa.int64()),
                    "emb": pa.array(
                        [rng.normal(size=4).tolist() for _ in range(20)],
                        pa.large_list(pa.float32()),
                    ),
                    "extra": pa.array(["x"] * 20, pa.large_utf8()),
                }
            ),
        )
        eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "cat")))
        eng.execute(
            f"CREATE TABLE tat (id BIGINT) "
            f"WITH ('connector'='lance', 'path'='{root}')"
        )
        v0 = LanceNativeDataset(root)._manifests[-1]
        eng.execute("ALTER TABLE tat ADD COLUMNS (x BIGINT, y DOUBLE)")
        nds = LanceNativeDataset(root)
        assert nds._manifests[-1] == v0 + 1  # ONE commit for both
        assert {"x", "y"} <= {f.name for f in nds._manifest()[0]}
        # refusal mid-list leaves nothing applied
        with pytest.raises(Exception, match="struct"):
            eng.execute(
                "ALTER TABLE tat ADD COLUMNS (z BIGINT, s STRUCT<a: BIGINT>)"
            )
        names = {f.name for f in LanceNativeDataset(root)._manifest()[0]}
        assert "z" not in names and "s" not in names
        eng.execute(
            "CREATE INDEX ON tat (emb) USING IVF_FLAT "
            "WITH ('index.num-partitions'='2')"
        )
        with pytest.raises(ValueError, match="sidecar"):
            eng.execute("ALTER TABLE tat DROP COLUMN extra, emb")
        names = {f.name for f in LanceNativeDataset(root)._manifest()[0]}
        assert "extra" in names and "emb" in names  # nothing dropped
        v1 = LanceNativeDataset(root)._manifests[-1]
        eng.execute("ALTER TABLE tat DROP COLUMN x, y")
        nds = LanceNativeDataset(root)
        assert nds._manifests[-1] == v1 + 1  # ONE commit for both
        assert {"x", "y"} & {f.name for f in nds._manifest()[0]} == set()


class TestMultiDataFileFragments:
    """The spec's ``DataFragment.files`` list (round-14 extension):
    Lance's zero-rewrite ``add_columns`` backfill appends a data file
    holding only the new columns to each fragment; a fragment's table
    is the horizontal zip of its files' rows. The reader resolves each
    schema field to the ONE file that records its ids; maintenance
    (vacuum / compaction / t$files / change feed) is multi-file-aware.
    Cite: lance format table.proto ``DataFragment.files`` — before
    this round the parser silently kept only the LAST file."""

    def _mk_backfilled(self, tmp_path_str, name="mf"):
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import (
            LanceDataFile,
            LanceNativeDataset,
            _encode_field,
            _schema_fields_of_existing,
            _write_manifest,
            write_dataset,
            write_fragment_file,
        )

        root = os.path.join(tmp_path_str, name)
        write_dataset(
            root,
            pa.table(
                {
                    "id": pa.array([1, 2, 3], pa.int64()),
                    "name": pa.array(["a", "b", "c"]),
                }
            ),
        )
        # hand-build the backfill: one extra data file carrying ONLY
        # the new column's values at the same row offsets
        extra = pa.table({"score": pa.array([0.5, 1.5, 2.5], pa.float64())})
        fname = "backfill-0.lance"
        write_fragment_file(os.path.join(root, "data", fname), extra)
        nds = LanceNativeDataset(root)
        fields, frags, v = nds._manifest()
        frags[0].extra_files.append(LanceDataFile(fname, [2], [0]))
        blob = _schema_fields_of_existing(fields) + _encode_field(
            "score", 2, -1, "double"
        )
        _write_manifest(root, v + 1, blob, frags)
        return root

    def test_roundtrip_projection_and_encoding(self, tmp_path_str):
        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
        )

        root = self._mk_backfilled(tmp_path_str)
        nds = LanceNativeDataset(root)
        # manifest encode→parse preserved the extra file
        _f, frags, _v = nds._manifest()
        assert len(frags[0].extra_files) == 1
        got = nds.to_arrow()
        assert got.column_names == ["id", "name", "score"]
        assert got.column("score").to_pylist() == [0.5, 1.5, 2.5]
        assert got.column("id").to_pylist() == [1, 2, 3]
        # projection decodes only the owning file's pages
        one = nds.to_arrow(columns=["score"])
        assert one.column_names == ["score"]
        assert one.column("score").to_pylist() == [0.5, 1.5, 2.5]
        both = nds.to_arrow(columns=["score", "id"])
        assert both.column_names == ["score", "id"]

    def test_deletion_masks_apply_to_the_zip(self, tmp_path_str):
        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            delete_rows,
        )

        root = self._mk_backfilled(tmp_path_str)
        delete_rows(root, [1])
        got = LanceNativeDataset(root).to_arrow()
        assert got.column("id").to_pylist() == [1, 3]
        assert got.column("score").to_pylist() == [0.5, 2.5]

    def test_compaction_consolidates_and_evolution_works(
        self, tmp_path_str
    ):
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            add_column,
            compact_dataset,
        )

        root = self._mk_backfilled(tmp_path_str)
        # evolution on a multi-file fragment: guard resolves per file
        add_column(root, "tag", pa.large_utf8())
        got = LanceNativeDataset(root).to_arrow()
        assert got.column("tag").to_pylist() == [None] * 3
        assert got.column("score").to_pylist() == [0.5, 1.5, 2.5]
        # compaction consolidates the zip into ONE data file
        v = compact_dataset(root)
        _f, frags, _ = LanceNativeDataset(root)._manifest(v)
        assert all(not fr.extra_files for fr in frags)
        after = LanceNativeDataset(root).to_arrow()
        assert after.column("score").to_pylist() == [0.5, 1.5, 2.5]
        assert after.column("id").to_pylist() == [1, 2, 3]

    def test_vacuum_keeps_backfill_files(self, tmp_path_str):
        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            vacuum_dataset,
        )

        root = self._mk_backfilled(tmp_path_str)
        vacuum_dataset(root, keep_versions=1)
        got = LanceNativeDataset(root).to_arrow()
        assert got.column("score").to_pylist() == [0.5, 1.5, 2.5]

    def test_row_count_mismatch_refuses(self, tmp_path_str):
        import pyarrow as pa
        import pytest

        from lance_flink_spark.sources.lance_native import (
            LanceDataFile,
            LanceNativeDataset,
            UnsupportedLanceFeature,
            _encode_field,
            _schema_fields_of_existing,
            _write_manifest,
            write_dataset,
            write_fragment_file,
        )

        root = os.path.join(tmp_path_str, "mm")
        write_dataset(
            root, pa.table({"id": pa.array([1, 2, 3], pa.int64())})
        )
        short = pa.table({"score": pa.array([9.0], pa.float64())})
        write_fragment_file(os.path.join(root, "data", "short.lance"), short)
        nds = LanceNativeDataset(root)
        fields, frags, v = nds._manifest()
        frags[0].extra_files.append(LanceDataFile("short.lance", [1], [0]))
        blob = _schema_fields_of_existing(fields) + _encode_field(
            "score", 1, -1, "double"
        )
        _write_manifest(root, v + 1, blob, frags)
        with pytest.raises(UnsupportedLanceFeature, match="zip"):
            LanceNativeDataset(root).to_arrow()

    def test_double_claimed_field_refuses(self, tmp_path_str):
        import pytest

        from lance_flink_spark.sources.lance_native import (
            LanceDataFile,
            LanceNativeDataset,
            UnsupportedLanceFeature,
            _schema_fields_of_existing,
            _write_manifest,
        )

        root = self._mk_backfilled(tmp_path_str, "dc")
        nds = LanceNativeDataset(root)
        fields, frags, v = nds._manifest()
        # second file claims field 0, which the primary already has
        frags[0].extra_files.append(
            LanceDataFile(frags[0].extra_files[0].path, [0], [0])
        )
        _write_manifest(root, v + 1, _schema_fields_of_existing(fields), frags)
        with pytest.raises(UnsupportedLanceFeature, match="ambiguously"):
            LanceNativeDataset(root).to_arrow()

    def test_change_feed_refuses_across_backfill(self, spark, tmp_path_str):
        import pytest

        from lance_flink_spark.sources.lance_native import (
            UnsupportedLanceFeature,
            read_changes_distributed,
        )

        root = self._mk_backfilled(tmp_path_str, "cf")
        with pytest.raises(UnsupportedLanceFeature, match="data-file list"):
            read_changes_distributed(root, spark, 1).collect()

    def test_distributed_read_zips_files(self, spark, tmp_path_str):
        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            read_distributed,
        )

        root = self._mk_backfilled(tmp_path_str, "dr")
        got = read_distributed(LanceNativeDataset(root), spark).collect()
        assert sorted((r["id"], r["score"]) for r in got) == [
            (1, 0.5), (2, 1.5), (3, 2.5),
        ]


class TestAddColumnBackfill:
    """Zero-rewrite ADD COLUMN ... AS (expr) — Lance's
    add_columns(transforms): executors compute the expression per
    fragment and write one single-column data file; a single manifest
    commit plates the field; existing files are untouched."""

    def _mk(self, tmp_path_str, name="bf"):
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import (
            append_to_dataset,
            write_dataset,
        )

        root = os.path.join(tmp_path_str, name)
        write_dataset(
            root,
            pa.table(
                {
                    "id": pa.array([1, 2, 3], pa.int64()),
                    "b": pa.array([0.5, 1.5, 2.5], pa.float64()),
                }
            ),
        )
        append_to_dataset(
            root,
            pa.table(
                {
                    "id": pa.array([4, 5], pa.int64()),
                    "b": pa.array([3.5, 4.5], pa.float64()),
                }
            ),
        )
        return root

    def test_backfill_values_align_at_physical_offsets(
        self, spark, tmp_path_str
    ):
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            add_column_backfill,
            delete_rows,
        )

        root = self._mk(tmp_path_str)
        # delete BEFORE the backfill: the new file still aligns at
        # physical offsets, masked rows' values are never served
        delete_rows(root, [1])
        v = add_column_backfill(root, "c", pa.float64(), "id * 2.0 + b", spark)
        nds = LanceNativeDataset(root)
        got = nds.to_arrow()
        assert sorted(
            zip(got.column("id").to_pylist(), got.column("c").to_pylist())
        ) == [(1, 2.5), (3, 8.5), (4, 11.5), (5, 14.5)]
        _f, frags, _ = nds._manifest()
        assert [len(fr.extra_files) for fr in frags] == [1, 1]
        # existing files untouched; time travel pre-dates the column
        assert nds.to_arrow(version=v - 1).column_names == ["id", "b"]

    def test_backfill_validates_before_cluster_work(
        self, spark, tmp_path_str
    ):
        import pyarrow as pa
        import pytest

        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            add_column_backfill,
        )

        root = self._mk(tmp_path_str, "bfv")
        with pytest.raises(Exception):  # analyzer: unknown column
            add_column_backfill(root, "c", pa.float64(), "nope + 1", spark)
        with pytest.raises(ValueError, match="already exists"):
            add_column_backfill(root, "b", pa.float64(), "id", spark)
        # neither refusal committed anything
        assert len(LanceNativeDataset(root)._manifests) == 2

    def test_sql_backfill_and_downstream_lifecycle(
        self, spark, tmp_path_str
    ):
        from lance_flink_spark.sources.catalog import Catalog
        from lance_flink_spark.sources.ddl import SqlEngine
        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
        )

        root = self._mk(tmp_path_str, "bfs")
        eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "cat")))
        eng.execute(
            f"CREATE TABLE bft (id BIGINT) "
            f"WITH ('connector'='lance', 'path'='{root}')"
        )
        eng.execute(
            "ALTER TABLE bft ADD COLUMN c DOUBLE AS (id * 10.0 + b)"
        )
        got = eng.execute(
            "SELECT id, c FROM bft ORDER BY id"
        ).collect()
        assert [(r["id"], r["c"]) for r in got] == [
            (1, 10.5), (2, 21.5), (3, 32.5), (4, 43.5), (5, 54.5),
        ]
        # constant backfill decodes no pages at all
        eng.execute("ALTER TABLE bft ADD COLUMN tag STRING AS ('x')")
        assert {
            r["tag"] for r in eng.execute("SELECT tag FROM bft").collect()
        } == {"x"}
        # compaction consolidates the zip; values survive
        eng.execute("OPTIMIZE bft")
        nds = LanceNativeDataset(root)
        _f, frags, _ = nds._manifest()
        assert all(not fr.extra_files for fr in frags)
        after = eng.execute("SELECT id, c, tag FROM bft ORDER BY id").collect()
        assert [(r["id"], r["c"], r["tag"]) for r in after][:2] == [
            (1, 10.5, "x"), (2, 21.5, "x"),
        ]

    def test_backfill_refuses_on_catalog_tables(self, spark, tmp_path_str):
        import pytest

        from lance_flink_spark.sources.catalog import Catalog
        from lance_flink_spark.sources.ddl import SqlEngine

        eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "cat2")))
        # parquet-backed catalog table: the statement refuses with the
        # rewrite hint instead of silently adding an empty column
        eng.execute(
            f"CREATE TABLE pq (id BIGINT) WITH "
            f"('path'='{os.path.join(tmp_path_str, 'pq')}')"
        )
        eng.execute("INSERT INTO pq VALUES (1)")
        with pytest.raises(ValueError, match="zero-rewrite"):
            eng.execute("ALTER TABLE pq ADD COLUMN c DOUBLE AS (id + 1)")


def test_backfill_refuses_non_row_local_expressions(spark, tmp_path_str):
    """A window/aggregate expression plans an Exchange between the
    per-fragment decode and the per-fragment write, scattering a
    fragment's rows across tasks — the backfill refuses at PLAN time
    (values computed from other rows could not align at physical
    offsets)."""
    import pyarrow as pa
    import pytest

    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        UnsupportedLanceFeature,
        add_column_backfill,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "bfw")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int64()),
                "b": pa.array([0.5, 1.5, 2.5], pa.float64()),
            }
        ),
    )
    with pytest.raises(UnsupportedLanceFeature, match="row-local"):
        add_column_backfill(
            root, "c", pa.float64(),
            "avg(b) OVER (ORDER BY id)", spark,
        )
    assert len(LanceNativeDataset(root)._manifests) == 1  # no commit


def test_native_index_overwrite_and_backfill_drift(spark, tmp_path_str):
    """Fragment IDENTITY, not ids: INSERT OVERWRITE renumbers
    fragments from 0, so an overwrite with the SAME fragment count
    passed the old id-only staleness check and would have served the
    old data's offsets against new rows. The binding now carries
    (frag_id, data-file path) pairs — uuid names make them
    rewrite-proof — while a column BACKFILL (which relocates nothing)
    correctly keeps the index servable."""
    import warnings

    import numpy as np
    import pyarrow as pa

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import write_dataset

    root = os.path.join(tmp_path_str, "idxow")
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(20, 4)).astype("float32")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array(range(20), pa.int64()),
                "emb": pa.array(
                    [v.tolist() for v in vecs], pa.large_list(pa.float32())
                ),
            }
        ),
        max_rows_per_file=10,  # two fragments
    )
    eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "cat")))
    eng.execute(
        f"CREATE TABLE dow (id BIGINT) "
        f"WITH ('connector'='lance', 'path'='{root}')"
    )
    eng.execute(
        "CREATE INDEX ON dow (emb) USING IVF_FLAT "
        "WITH ('index.num-partitions'='2')"
    )
    q = vecs[7].tolist()
    qsql = "ARRAY[" + ",".join(str(x) for x in q) + "]"
    got = eng.execute(
        f"SELECT * FROM vector_search('dow', 'emb', {qsql}, 1, 'L2')"
    ).collect()
    assert got[0]["id"] == 7
    # a BACKFILL keeps every (frag_id, path): index still serves
    eng.execute("ALTER TABLE dow ADD COLUMN d DOUBLE AS (id * 1.0)")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got2 = eng.execute(
            f"SELECT * FROM vector_search('dow', 'emb', {qsql}, 1, 'L2')"
        ).collect()
    assert not any("STALE" in str(x.message) for x in w)
    assert got2[0]["id"] == 7
    # OVERWRITE with the SAME fragment count: ids coincide, paths
    # don't — stale → warn + exact brute over the NEW rows
    eng.execute("DROP INDEX ON dow (emb)")
    eng.execute(
        "CREATE INDEX ON dow (emb) USING IVF_FLAT "
        "WITH ('index.num-partitions'='2')"
    )
    rows = ", ".join(
        f"({i + 100}, ARRAY[{i}.0, 0.0, 0.0, 0.0], {i}.0)"
        for i in range(4)
    )
    eng.execute(f"INSERT OVERWRITE dow VALUES {rows}")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got3 = eng.execute(
            "SELECT * FROM vector_search('dow', 'emb', "
            "ARRAY[2.0, 0.0, 0.0, 0.0], 1, 'L2')"
        ).collect()
    assert any("STALE" in str(x.message) for x in w)
    assert got3[0]["id"] == 102


def test_native_index_id_coinciding_rewrite_refuses(spark, tmp_path_str):
    """The exact hole the identity binding closes: a rewrite whose
    fragment IDS coincide with the bound set (OVERWRITE renumbers from
    0) but whose data-file PATHS differ must NOT serve — under the old
    id-only check it did. Simulated by pointing the binding's frag_sig
    at other paths while keeping ids and the legacy frag_ids field
    current."""
    import json
    import warnings

    import numpy as np
    import pyarrow as pa

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "idxco")
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(10, 4)).astype("float32")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array(range(10), pa.int64()),
                "emb": pa.array(
                    [v.tolist() for v in vecs], pa.large_list(pa.float32())
                ),
            }
        ),
    )
    eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "catco")))
    eng.execute(
        f"CREATE TABLE dco (id BIGINT) "
        f"WITH ('connector'='lance', 'path'='{root}')"
    )
    eng.execute(
        "CREATE INDEX ON dco (emb) USING IVF_FLAT "
        "WITH ('index.num-partitions'='2')"
    )
    nds = LanceNativeDataset(root)
    binding = os.path.join(
        eng._native_index_dir(nds, "emb"), "_native_binding.json"
    )
    meta = json.load(open(binding))
    assert meta["frag_sig"]  # identity recorded at build time
    # same ids, different files — what a same-count OVERWRITE looks
    # like from the binding's perspective
    meta["frag_sig"] = [[fid, "rewritten.lance"] for fid, _p in meta["frag_sig"]]
    json.dump(meta, open(binding, "w"))
    q = vecs[3].tolist()
    qsql = "ARRAY[" + ",".join(str(x) for x in q) + "]"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = eng.execute(
            f"SELECT * FROM vector_search('dco', 'emb', {qsql}, 1, 'L2')"
        ).collect()
    assert any("STALE" in str(x.message) for x in w)
    assert got[0]["id"] == 3  # brute fallback is still exact
    # legacy binding without frag_sig: the id-only fallback still serves
    del meta["frag_sig"]
    meta["frag_ids"] = sorted(
        fr.frag_id for fr in nds._manifest()[1]
    )
    json.dump(meta, open(binding, "w"))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got2 = eng.execute(
            f"SELECT * FROM vector_search('dco', 'emb', {qsql}, 1, 'L2')"
        ).collect()
    assert not any("STALE" in str(x.message) for x in w)
    assert got2[0]["id"] == 3


def test_mutations_on_backfilled_table_keep_alignment(spark, tmp_path_str):
    """UPDATE / MERGE on a multi-datafile (backfilled) table: the
    mutation reads through the file zip (replacement rows carry the
    backfilled column's values), tombstones mask the zip, and new
    fragments are single-file full-schema."""
    import pyarrow as pa

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import write_dataset

    root = os.path.join(tmp_path_str, "upbf")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4], pa.int64()),
                "v": pa.array([10.0, 20.0, 30.0, 40.0], pa.float64()),
            }
        ),
    )
    eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "ucat")))
    eng.execute(
        f"CREATE TABLE ub (id BIGINT) "
        f"WITH ('connector'='lance', 'path'='{root}')"
    )
    eng.execute("ALTER TABLE ub ADD COLUMN w DOUBLE AS (v * 2)")
    eng.execute("UPDATE ub SET v = v + 100 WHERE id <= 2")
    got = sorted(
        (r["id"], r["v"], r["w"])
        for r in eng.execute("SELECT * FROM ub").collect()
    )
    # w keeps the PRE-update backfill values (computed from original v)
    assert got == [
        (1, 110.0, 20.0), (2, 120.0, 40.0), (3, 30.0, 60.0), (4, 40.0, 80.0),
    ]
    eng.execute("MERGE INTO ub USING (SELECT 5 AS id, 50.0 AS v, 99.0 AS w) ON id")
    got2 = sorted(
        (r["id"], r["v"], r["w"])
        for r in eng.execute("SELECT * FROM ub").collect()
    )
    assert got2 == got + [(5, 50.0, 99.0)]


def test_multi_column_backfill_one_commit(spark, tmp_path_str):
    """ADD COLUMNS mixing computed and plain columns: ONE commit, ONE
    extra data file per fragment carrying ALL the computed columns
    (one decode pass), plain columns riding file-less (read NULL)."""
    import pyarrow as pa

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "mcbf")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int64()),
                "v": pa.array([10.0, 20.0, 30.0], pa.float64()),
            }
        ),
    )
    eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "mcat")))
    eng.execute(
        f"CREATE TABLE mc (id BIGINT) "
        f"WITH ('connector'='lance', 'path'='{root}')"
    )
    v0 = LanceNativeDataset(root)._manifests[-1]
    eng.execute(
        "ALTER TABLE mc ADD COLUMNS (a DOUBLE AS (v * 2), plainc BIGINT, "
        "b BIGINT AS (id + 100))"
    )
    nds = LanceNativeDataset(root)
    assert nds._manifests[-1] == v0 + 1  # ONE commit for all three
    _f, frags, _ = nds._manifest()
    assert [len(fr.extra_files) for fr in frags] == [1]  # ONE file
    got = sorted(
        (r["id"], r["a"], r["plainc"], r["b"])
        for r in eng.execute("SELECT id, a, plainc, b FROM mc").collect()
    )
    assert got == [
        (1, 20.0, None, 101), (2, 40.0, None, 102), (3, 60.0, None, 103),
    ]
    # a refusal mid-list (duplicate name) commits NOTHING
    import pytest

    with pytest.raises(ValueError, match="already exists"):
        eng.execute(
            "ALTER TABLE mc ADD COLUMNS (x DOUBLE AS (v), a DOUBLE AS (v))"
        )
    names = {f.name for f in LanceNativeDataset(root)._manifest()[0]}
    assert "x" not in names


def test_dropped_backfill_column_id_never_reused(spark, tmp_path_str):
    """Review fix (reproduced corruption): field-id allocation must
    scan EVERY data file including backfill extras — backfill 'score',
    DROP it, plain-ADD 'fresh': 'fresh' must get a FRESH id and read
    NULL, never the dropped score's bytes out of the stale extra
    file."""
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        add_column,
        add_column_backfill,
        drop_column,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "fidreuse")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int64()),
                "name": pa.array(["a", "b", "c"]),
            }
        ),
    )
    add_column_backfill(root, "score", pa.float64(), "id * 0.5", spark)
    drop_column(root, "score")
    add_column(root, "fresh", pa.float64())
    got = LanceNativeDataset(root).to_arrow()
    assert got.column("fresh").to_pylist() == [None, None, None]


def test_backfill_case_insensitive_refs_and_literals(spark, tmp_path_str):
    """Review fixes: a case-variant column reference (legal in Spark
    SQL) must decode the column, and a string literal like 'Sorted'
    in the expression must not trip the row-locality plan guard."""
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        add_columns_backfill,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "cibf")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array([1, 2], pa.int64()),
                "status": pa.array(["Sorted", "Raw"]),
            }
        ),
    )
    add_columns_backfill(
        root,
        [
            ("dbl", pa.float64(), "ID * 2.0"),
            ("flag", pa.int64(),
             "CASE WHEN status = 'Sorted' THEN 1 ELSE 0 END"),
        ],
        spark,
    )
    got = LanceNativeDataset(root).to_arrow()
    assert got.column("dbl").to_pylist() == [2.0, 4.0]
    assert got.column("flag").to_pylist() == [1, 0]


def test_backfill_list_splits_past_comparison_operators(
    spark, tmp_path_str
):
    """Review fix (reproduced): '<'/'>' are comparison operators, not
    brackets — a multi-column list whose expressions compare must
    still split into its items."""
    import pyarrow as pa

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import write_dataset

    root = os.path.join(tmp_path_str, "cmpbf")
    write_dataset(
        root,
        pa.table(
            {
                "a": pa.array([1, 5], pa.int64()),
                "b": pa.array([3, 3], pa.int64()),
            }
        ),
    )
    eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "ccat")))
    eng.execute(
        f"CREATE TABLE cmp (a BIGINT) "
        f"WITH ('connector'='lance', 'path'='{root}')"
    )
    eng.execute(
        "ALTER TABLE cmp ADD COLUMNS (gt BIGINT AS "
        "(CASE WHEN a > b THEN 1 ELSE 0 END), "
        "lt BIGINT AS (CASE WHEN a < b THEN 1 ELSE 0 END))"
    )
    got = sorted(
        (r["a"], r["gt"], r["lt"])
        for r in eng.execute("SELECT a, gt, lt FROM cmp").collect()
    )
    assert got == [(1, 0, 1), (5, 1, 0)]


def test_session_min_partition_num_is_numeric(spark):
    """Review fix (reproduced): 2 * cpus on the env STRING was string
    repetition ('3232'), silently shattering every scan into 64 KB
    tasks."""
    v = spark.conf.get("spark.sql.files.minPartitionNum")
    assert v.isdigit() and 2 <= int(v) <= 4096
    assert int(v) == 2 * spark.sparkContext.defaultParallelism or \
        int(v) == int(os.environ.get("SPARK_GRAFT_MIN_PARTITION_NUM", -1))


class TestMergeColumns:
    """Lance's Dataset.merge: attach new columns by key join,
    zero-rewrite — per-fragment data files at physical offsets."""

    def _mk(self, tmp_path_str, name="mg"):
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import (
            append_to_dataset,
            write_dataset,
        )

        root = os.path.join(tmp_path_str, name)
        write_dataset(
            root,
            pa.table(
                {
                    "id": pa.array([1, 2, 3], pa.int64()),
                    "v": pa.array([10.0, 20.0, 30.0], pa.float64()),
                }
            ),
        )
        append_to_dataset(
            root,
            pa.table(
                {
                    "id": pa.array([4, 5], pa.int64()),
                    "v": pa.array([40.0, 50.0], pa.float64()),
                }
            ),
        )
        return root

    def test_merge_aligns_under_deletes_and_missing_keys(
        self, spark, tmp_path_str
    ):
        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            delete_rows,
            merge_columns,
        )

        root = self._mk(tmp_path_str)
        delete_rows(root, [2])  # physical offset 2 = id 3
        src = spark.createDataFrame(
            [(1, "one", 1.5), (3, "three", 3.5), (5, "five", 5.5),
             (99, "x", 0.0)],
            "id long, label string, score double",
        )
        v = merge_columns(root, src, "id", spark)
        got = LanceNativeDataset(root).to_arrow()
        assert sorted(
            zip(
                got.column("id").to_pylist(),
                got.column("label").to_pylist(),
                got.column("score").to_pylist(),
            )
        ) == [
            (1, "one", 1.5), (2, None, None), (4, None, None),
            (5, "five", 5.5),
        ]
        # zero-rewrite: both fragments just gained one extra file
        _f, frags, _ = LanceNativeDataset(root)._manifest()
        assert [len(fr.extra_files) for fr in frags] == [1, 1]
        # pre-merge version time-travels clean
        assert LanceNativeDataset(root).to_arrow(version=v - 1)\
            .column_names == ["id", "v"]

    def test_merge_refusals(self, spark, tmp_path_str):
        import pytest

        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            merge_columns,
        )

        root = self._mk(tmp_path_str, "mgr")
        dup = spark.createDataFrame(
            [(1, "a"), (1, "b")], "id long, label string"
        )
        with pytest.raises(ValueError, match="duplicate"):
            merge_columns(root, dup, "id", spark)
        clash = spark.createDataFrame([(1, 9.0)], "id long, v double")
        with pytest.raises(ValueError, match="already exists"):
            merge_columns(root, clash, "id", spark)
        keyless = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError, match="only the key"):
            merge_columns(root, keyless, "id", spark)
        with pytest.raises(ValueError, match="not a column"):
            merge_columns(
                root,
                spark.createDataFrame([(1, 2.0)], "zz long, s double"),
                "zz", spark,
            )
        # nothing committed by any refusal
        assert len(LanceNativeDataset(root)._manifests) == 2

    def test_sql_merge_columns_and_compaction(self, spark, tmp_path_str):
        from lance_flink_spark.sources.catalog import Catalog
        from lance_flink_spark.sources.ddl import SqlEngine
        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
        )

        root = self._mk(tmp_path_str, "mgs")
        eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "gcat")))
        eng.execute(
            f"CREATE TABLE mg (id BIGINT) "
            f"WITH ('connector'='lance', 'path'='{root}')"
        )
        eng.execute(
            "ALTER TABLE mg MERGE COLUMNS "
            "(SELECT id, v * 10 AS v10 FROM mg WHERE id % 2 = 1) ON id"
        )
        got = sorted(
            (r["id"], r["v10"])
            for r in eng.execute("SELECT id, v10 FROM mg").collect()
        )
        assert got == [
            (1, 100.0), (2, None), (3, 300.0), (4, None), (5, 500.0),
        ]
        eng.execute("OPTIMIZE mg")
        after = sorted(
            (r["id"], r["v10"])
            for r in eng.execute("SELECT id, v10 FROM mg").collect()
        )
        assert after == got
        _f, frags, _ = LanceNativeDataset(root)._manifest()
        assert all(not fr.extra_files for fr in frags)


def test_rename_column_metadata_only(spark, tmp_path_str):
    """RENAME COLUMN is a metadata-only commit — field ids never
    change, so data files / deletion files keep decoding, appends
    carry the new name onto the same ids, time travel shows the old
    name, and an index-covered column refuses (the sidecar binds by
    name)."""
    import pyarrow as pa
    import pytest

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        delete_rows,
        rename_column,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "rn")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int64()),
                "v": pa.array([10.0, 20.0, 30.0], pa.float64()),
            }
        ),
    )
    delete_rows(root, [1])
    v = rename_column(root, "v", "value")
    got = LanceNativeDataset(root).to_arrow()
    assert got.column_names == ["id", "value"]
    assert got.column("value").to_pylist() == [10.0, 30.0]
    old = LanceNativeDataset(root).to_arrow(version=v - 1)
    assert old.column_names == ["id", "v"]
    with pytest.raises(ValueError, match="no column"):
        rename_column(root, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        rename_column(root, "id", "value")
    # SQL form + post-rename lifecycle (insert carries the new name)
    eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "rcat")))
    eng.execute(
        f"CREATE TABLE rn (id BIGINT) "
        f"WITH ('connector'='lance', 'path'='{root}')"
    )
    eng.execute("ALTER TABLE rn RENAME COLUMN value TO score")
    eng.execute("INSERT INTO rn VALUES (9, 90.0)")
    got2 = sorted(
        (r["id"], r["score"])
        for r in eng.execute("SELECT id, score FROM rn").collect()
    )
    assert got2 == [(1, 10.0), (3, 30.0), (9, 90.0)]
    # index-covered rename refuses
    import numpy as np

    rng = np.random.default_rng(1)
    root2 = os.path.join(tmp_path_str, "rni")
    write_dataset(
        root2,
        pa.table(
            {
                "id": pa.array(range(10), pa.int64()),
                "emb": pa.array(
                    [rng.normal(size=4).tolist() for _ in range(10)],
                    pa.large_list(pa.float32()),
                ),
            }
        ),
    )
    eng.execute(
        f"CREATE TABLE rni (id BIGINT) "
        f"WITH ('connector'='lance', 'path'='{root2}')"
    )
    eng.execute(
        "CREATE INDEX ON rni (emb) USING IVF_FLAT "
        "WITH ('index.num-partitions'='2')"
    )
    with pytest.raises(ValueError, match="sidecar"):
        eng.execute("ALTER TABLE rni RENAME COLUMN emb TO vec")


def test_alter_column_type_cast(spark, tmp_path_str):
    """ALTER COLUMN x TYPE t (Lance alter_columns cast): a
    column-scoped rewrite in one commit — each fragment gains one data
    file of cast values at physical offsets, the schema replaces the
    field in place with a FRESH id (the old id's pages are never
    decoded again), other columns' bytes never move, old versions
    time-travel to the old type, and deletions keep masking."""
    import pyarrow as pa
    import pytest

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        UnsupportedLanceFeature,
        cast_column,
        delete_rows,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "cast")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int64()),
                "v": pa.array([10.9, 20.1, 30.5], pa.float64()),
            }
        ),
    )
    delete_rows(root, [1])
    v = cast_column(root, "v", pa.int64(), spark)
    got = LanceNativeDataset(root).to_arrow()
    assert got.schema.field("v").type == pa.int64()
    assert got.column("v").to_pylist() == [10, 30]  # Spark cast truncates
    assert got.column("id").to_pylist() == [1, 3]
    old = LanceNativeDataset(root).to_arrow(version=v - 1)
    assert old.schema.field("v").type == pa.float64()
    assert old.column("v").to_pylist() == [10.9, 30.5]
    with pytest.raises(ValueError, match="no column"):
        cast_column(root, "nope", pa.int64(), spark)
    with pytest.raises(UnsupportedLanceFeature, match="struct"):
        cast_column(
            root, "v", pa.struct([("a", pa.int64())]), spark
        )
    # SQL spelling + post-cast INSERT carries the new type
    eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "castcat")))
    eng.execute(
        f"CREATE TABLE ct (id BIGINT) "
        f"WITH ('connector'='lance', 'path'='{root}')"
    )
    eng.execute("ALTER TABLE ct ALTER COLUMN v TYPE STRING")
    eng.execute("INSERT INTO ct VALUES (9, 'ninety')")
    got2 = sorted(
        (r["id"], r["v"])
        for r in eng.execute("SELECT id, v FROM ct").collect()
    )
    assert got2 == [(1, "10"), (3, "30"), (9, "ninety")]


def test_attach_family_refuses_reserved_names(spark, tmp_path_str):
    """__-prefixed column names collide with the attach plumbing's
    __frag/__pos address columns — refuse up front."""
    import pyarrow as pa
    import pytest

    from lance_flink_spark.sources.lance_native import (
        add_columns_backfill,
        merge_columns,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "resv")
    write_dataset(root, pa.table({"id": pa.array([1, 2], pa.int64())}))
    with pytest.raises(ValueError, match="reserved"):
        add_columns_backfill(
            root, [("__pos", pa.int64(), "id")], spark
        )
    with pytest.raises(ValueError, match="reserved"):
        merge_columns(
            root,
            spark.createDataFrame([(1, 2.0)], "id long, __frag double"),
            "id", spark,
        )


def test_udf_backfill_dhash_over_native_blobs(spark, tmp_path_str):
    """The composition the zero-rewrite family exists for: a native
    table of PNG blobs gains a perceptual dHash column computed by a
    Python batch function on the executors — no blob is rewritten, the
    hashes align at physical offsets under deletions, and a groupBy on
    the new column finds the pixel-duplicates."""
    import numpy as np
    import pyarrow as pa

    from lance_flink_spark.functions.multimodal import encode_png
    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        add_column_backfill_udf,
        delete_rows,
        write_dataset,
    )

    x = np.arange(16)[None, :]
    y = np.arange(16)[:, None]

    def img(p, ft):
        g = (x * 13 * (p + 1) + y * 7) % 251
        return encode_png(
            np.stack([g, g, g], axis=2).astype(np.uint8), filter_type=ft
        )

    # 6 blobs, 3 pixel-classes, varying PNG filters within a class
    blobs = [img(i % 3, i % 4) for i in range(6)]
    root = os.path.join(tmp_path_str, "udfbf")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array(range(6), pa.int64()),
                "content": pa.array(blobs, pa.large_binary()),
            }
        ),
    )
    delete_rows(root, [4])  # id=4 (class 1)

    def hash_batch(pdf):
        from lance_flink_spark.functions.multimodal import dhash64

        return [dhash64(bytes(c)) for c in pdf["content"]]

    add_column_backfill_udf(
        root, "dhash", pa.int64(), ["content"], hash_batch, spark
    )
    got = LanceNativeDataset(root).to_arrow()
    by_class = {}
    for i, h in zip(got.column("id").to_pylist(), got.column("dhash").to_pylist()):
        by_class.setdefault(i % 3, set()).add(h)
    assert all(len(v) == 1 for v in by_class.values())  # class → 1 hash
    assert len({next(iter(v)) for v in by_class.values()}) == 3
    assert 4 not in got.column("id").to_pylist()  # deletion still masks


def test_attach_preserves_nullable_big_int64(spark, tmp_path_str):
    """Review fix: the attach pipeline must never cross a default
    arrow→pandas boundary — a null-bearing int64 would widen to
    float64 (nulls → NaN, values past 2^53 silently lose precision).
    Both the Catalyst backfill and the Python-UDF backfill round-trip
    2^53+1 and NULLs bit-exactly (mapInArrow writer + extension-dtype
    frames)."""
    import pandas as pd
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        add_column_backfill,
        add_column_backfill_udf,
        write_dataset,
    )

    big = (1 << 53) + 1  # float64 rounds this to 2^53
    root = os.path.join(tmp_path_str, "bigint")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int64()),
                "v": pa.array([big, None, big + 2], pa.int64()),
            }
        ),
    )
    add_column_backfill(root, "c", pa.int64(), "v + 1", spark)

    def fn(pdf):
        # extension dtype: null arrives as pd.NA, big ints intact
        return [
            None if x is pd.NA else int(x) * 2 for x in pdf["v"]
        ]

    add_column_backfill_udf(root, "d", pa.int64(), ["v"], fn, spark)
    got = LanceNativeDataset(root).to_arrow()
    assert got.column("c").to_pylist() == [big + 1, None, big + 3]
    assert got.column("d").to_pylist() == [big * 2, None, (big + 2) * 2]


class TestDistributedMutations:
    """Round 15: predicate mutations resolve matched offsets and write
    deletion files INSIDE per-fragment executor tasks
    (lance_native.mutate_rows_distributed) — no driver row gate, the
    driver commits only the manifest from name-plates."""

    def _mk(self, tmp, name="dm", rows=30, per_file=10):
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import write_dataset

        root = os.path.join(tmp, name)
        write_dataset(
            root,
            pa.table(
                {
                    "id": pa.array(range(rows), pa.int64()),
                    "v": pa.array([float(i) for i in range(rows)]),
                }
            ),
            max_rows_per_file=per_file,
        )
        return root

    def test_aligned_delete_skips_shuffle_same_result(
        self, spark, tmp_path_str
    ):
        """r15: offsets from a per-fragment read through narrow ops
        stay one-fragment-per-partition, so offsets_aligned=True writes
        deletion files without the tag+repartition stage — and the
        result is identical to the shuffled path."""
        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            mutate_rows_distributed,
            read_distributed,
        )

        root = self._mk(tmp_path_str, name="dma")  # 3 fragments
        nds = LanceNativeDataset(root)
        offs = (
            read_distributed(nds, spark, with_offsets=True)
            .filter("id % 3 = 0")
            .select("__phys")
        )
        v = mutate_rows_distributed(root, offs, offsets_aligned=True)
        assert v == 2
        got = sorted(
            r["id"]
            for r in read_distributed(
                LanceNativeDataset(root), spark
            ).collect()
        )
        assert got == [i for i in range(30) if i % 3 != 0]
        _f, frags, _v = LanceNativeDataset(root)._manifest()
        assert all(fr.deletion is not None for fr in frags)

    def test_aligned_delete_misuse_refuses_before_commit(
        self, spark, tmp_path_str
    ):
        """A shuffled offsets frame splits one fragment's offsets
        across tasks: the duplicate-plate probe must refuse BEFORE any
        manifest commit (orphaned uniquely-named files only)."""
        import pytest

        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            mutate_rows_distributed,
            read_distributed,
        )

        root = self._mk(tmp_path_str, name="dmm")  # 3 fragments
        nds = LanceNativeDataset(root)
        offs = (
            read_distributed(nds, spark, with_offsets=True)
            .filter("id % 3 = 0")
            .select("__phys")
            .repartition(8)  # breaks the alignment contract
        )
        with pytest.raises(RuntimeError, match="split across"):
            mutate_rows_distributed(root, offs, offsets_aligned=True)
        # no commit happened: table unchanged, still version 1
        _f, frags, v = LanceNativeDataset(root)._manifest()
        assert v == 1
        assert all(fr.deletion is None for fr in frags)

    def test_delete_only_one_task_per_fragment(self, spark, tmp_path_str):
        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            mutate_rows_distributed,
            read_distributed,
            resolve_deletions_distributed,
        )

        root = self._mk(tmp_path_str)  # 3 fragments
        nds = LanceNativeDataset(root)
        offs = (
            read_distributed(nds, spark, with_offsets=True)
            .filter("id % 3 = 0")
            .select("__phys")
        )
        v = mutate_rows_distributed(root, offs)
        assert v == 2
        # one deletion task per fragment — the partition-count pin
        assert resolve_deletions_distributed.last_num_partitions == 3
        got = sorted(
            r["id"]
            for r in read_distributed(
                LanceNativeDataset(root), spark
            ).collect()
        )
        assert got == [i for i in range(30) if i % 3 != 0]
        # every touched fragment got exactly one deletion file, named
        # with a RANDOM id (not the version) per the Lance spec
        _f, frags, _v = LanceNativeDataset(root)._manifest()
        for fr in frags:
            assert fr.deletion is not None
            assert fr.deletion.num_deleted in (3, 4)
            assert fr.deletion.id not in (0, 1, 2)  # random, not version

    def test_update_shape_one_commit(self, spark, tmp_path_str):
        from pyspark.sql import functions as F

        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            mutate_rows_distributed,
            read_distributed,
        )

        root = self._mk(tmp_path_str, "dmu")
        nds = LanceNativeDataset(root)
        full = read_distributed(nds, spark, with_offsets=True)
        matched = full.filter("id >= 25")
        updated = matched.select("id", (F.col("v") * 100).alias("v"))
        v = mutate_rows_distributed(root, matched.select("__phys"), updated)
        assert v == 2  # delete + append in ONE manifest version
        got = {
            r["id"]: r["v"]
            for r in read_distributed(LanceNativeDataset(root), spark).collect()
        }
        assert len(got) == 30
        assert got[25] == 2500.0 and got[24] == 24.0

    def test_no_match_no_manifest_churn(self, spark, tmp_path_str):
        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            mutate_rows_distributed,
            read_distributed,
        )

        root = self._mk(tmp_path_str, "dmn")
        nds = LanceNativeDataset(root)
        offs = (
            read_distributed(nds, spark, with_offsets=True)
            .filter("id > 1000")
            .select("__phys")
        )
        assert mutate_rows_distributed(root, offs) == 1
        assert LanceNativeDataset(root).versions() == [1]

    def test_out_of_range_offset_refuses(self, spark, tmp_path_str):
        from lance_flink_spark.sources.lance_native import (
            mutate_rows_distributed,
        )

        root = self._mk(tmp_path_str, "dmo")
        bad = spark.createDataFrame([(99,)], "__phys long")
        with pytest.raises(Exception, match="out of range"):
            mutate_rows_distributed(root, bad)

    def test_unions_existing_deletions(self, spark, tmp_path_str):
        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            delete_rows,
            mutate_rows_distributed,
            read_distributed,
        )

        root = self._mk(tmp_path_str, "dmx")
        delete_rows(root, [0, 1], deletion_format="bitmap")  # v2, driver path
        nds = LanceNativeDataset(root)
        offs = (
            read_distributed(nds, spark, with_offsets=True)
            .filter("id IN (2, 3)")
            .select("__phys")
        )
        assert mutate_rows_distributed(root, offs) == 3
        got = sorted(
            r["id"]
            for r in read_distributed(LanceNativeDataset(root), spark).collect()
        )
        assert got == list(range(4, 30))

    def test_expected_version_conflict(self, spark, tmp_path_str):
        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            NativeCommitConflict,
            delete_rows,
            mutate_rows_distributed,
            read_distributed,
        )

        root = self._mk(tmp_path_str, "dmc")
        nds = LanceNativeDataset(root)
        offs = (
            read_distributed(nds, spark, with_offsets=True)
            .filter("id = 0")
            .select("__phys")
        )
        delete_rows(root, [29])  # someone else commits v2
        with pytest.raises(NativeCommitConflict):
            mutate_rows_distributed(root, offs, expected_version=1)

    def test_sql_delete_over_4m_rows_ungated(self, spark, tmp_path_str):
        """The r13/r14 4M driver gate is GONE from predicate
        mutations: a >4M-row native DELETE resolves every matched
        offset executor-side and passes."""
        from pyspark.sql import functions as F

        from lance_flink_spark.sources.catalog import Catalog
        from lance_flink_spark.sources.ddl import SqlEngine
        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            write_dataset_distributed,
        )

        root = os.path.join(tmp_path_str, "big")
        n = 4_400_000
        df = (
            spark.range(n)
            .select(F.col("id"), (F.col("id") % 7).alias("g"))
            .repartition(4)
        )
        write_dataset_distributed(root, df)
        eng = SqlEngine(spark, Catalog(tmp_path_str + "/whbig"))
        eng.execute(
            f"CREATE TABLE big (id BIGINT, g BIGINT) "
            f"WITH ('connector'='lance', 'path'='{root}')"
        )
        eng.execute("DELETE FROM big WHERE g < 6")  # ~3.77M... 
        eng.execute("DELETE FROM big WHERE g = 6")  # total > 4M deleted
        assert spark.table("big").count() == 0
        _f, frags, _v = LanceNativeDataset(root)._manifest()
        assert sum(fr.deletion.num_deleted for fr in frags) == n


def test_backfill_plan_node_names_pin(spark, tmp_path_str):
    """ADVICE r14: the backfill row-locality guard keys off physical
    plan NODE names — pin that Spark still prints them (MapInPandas,
    Exchange, Sort, HashAggregate), so a Spark-version rename shows
    up as THIS failing test instead of blanket backfill refusals."""
    from pyspark.sql import functions as F

    df = spark.range(100).select(F.col("id"), (F.col("id") % 5).alias("g"))
    agg = df.groupBy("g").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan and "Exchange" in plan
    # sort on a derived column — Range's native ordering on `id`
    # would let Catalyst elide a Sort over the raw sequence
    srt = df.orderBy(F.col("g").desc())
    assert "Sort" in srt._jdf.queryExecution().executedPlan().toString()
    mip = df.mapInPandas(lambda it: it, df.schema)
    assert "MapInPandas" in mip._jdf.queryExecution().executedPlan().toString()


class TestLance21Bitpacked:
    """Round 15: the 2.1 READ subset — footer (2, 1) accepted, flat
    pages plus the BITPACKED integer encoding (encodings.proto
    Bitpacked: compressed_bits_per_value / uncompressed_bits_per_value
    / signed) decode bit-exactly; every other encoding still refuses
    loudly."""

    def _table(self):
        import pyarrow as pa

        return pa.table(
            {
                "a": pa.array(
                    [0, 5, 1023, None, 7, 2**33, 12, 3], pa.int64()
                ),
                "b": pa.array(
                    [-4, 100, -1, 7, None, 0, 31, -128], pa.int32()
                ),
                "f": pa.array(
                    [0.5, None, 2.25, -1.0, 3.5, 9.75, 0.0, 1.125],
                    pa.float64(),
                ),
                "s": pa.array(
                    ["x", "yy", None, "zzz", "", "q", "ww", "e"],
                    pa.string(),
                ),
            }
        )

    def test_roundtrip_bit_exact(self, tmp_path_str):
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import (
            read_fragment_table,
            write_fragment_file_21,
            _schema_fields_of,
        )

        t = self._table()
        fields, _ = _schema_fields_of(pa, t.schema)
        p = os.path.join(tmp_path_str, "f21.lance")
        write_fragment_file_21(p, t, max_rows_per_page=3)
        got = read_fragment_table(p, fields)
        for c in t.column_names:
            assert got.column(c).to_pylist() == t.column(c).to_pylist(), c

    def test_bitpack_codec_edges(self):
        import numpy as np

        from lance_flink_spark.sources.lance_native import (
            _bitpack,
            _bitunpack,
        )

        for vals, bits, signed in [
            (np.array([0, 1, 2, 7], dtype="<i8"), 3, False),
            (np.array([-4, 3, -1, 0], dtype="<i8"), 3, True),
            (np.array([2**63 - 1, -(2**63), -1], dtype="<i8"), 64, True),
            (np.array([0], dtype="<i8"), 1, False),
        ]:
            got = _bitunpack(
                _bitpack(vals, bits), len(vals), bits, signed, "<i8"
            )
            assert got.tolist() == vals.tolist(), (bits, signed)

    def test_unknown_encoding_refuses(self, tmp_path_str):
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import (
            _enc_int,
            _enc_len,
            _page_encoding,
            read_fragment_table,
            write_fragment_file,
            _schema_fields_of,
        )

        # a foreign encoding message classifies OPAQUE — decoded as
        # flat with the buffer-shape check as the loud backstop (the
        # reference's own 2.0 files carry an Any-wrapped ArrayEncoding
        # on plain flat pages)
        assert _page_encoding(_enc_len(3, b"miniblock-ish"))[0] == "opaque"
        assert (
            _page_encoding(
                _enc_len(1, b"/lance.encodings.ArrayEncoding")
            )[0]
            == "opaque"
        )
        assert _page_encoding(b"")[0] == "flat"
        # a (2, 1) file whose page declares an unknown encoding:
        # patch the enc bytes of a flat file through the writer's
        # low-level params is involved — the parser-level refusal
        # above plus the version-gate below pin the loud paths
        t = pa.table({"a": pa.array([1, 2], pa.int64())})
        fields, _ = _schema_fields_of(pa, t.schema)
        p = os.path.join(tmp_path_str, "legacy.lance")
        write_fragment_file(p, t, file_version=(0, 1))
        with pytest.raises(UnsupportedLanceFeature, match="0.1"):
            read_fragment_table(p, fields)

    def test_dataset_with_21_fragment(self, spark, tmp_path_str):
        """A dataset whose data file was (re)written as 2.1 bitpacked
        reads identically through the full native read path —
        driver-side AND distributed."""
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            read_distributed,
            write_dataset,
            write_fragment_file_21,
        )

        root = os.path.join(tmp_path_str, "ds21")
        t = pa.table(
            {
                "id": pa.array(range(20), pa.int64()),
                "v": pa.array([i * 1.5 for i in range(20)]),
            }
        )
        ds = write_dataset(root, t)
        _f, frags, _v = ds._manifest()
        write_fragment_file_21(
            os.path.join(root, "data", frags[0].path), t
        )
        got = LanceNativeDataset(root).to_arrow()
        assert got.column("id").to_pylist() == list(range(20))
        assert got.column("v").to_pylist() == [i * 1.5 for i in range(20)]
        rows = sorted(
            r["id"]
            for r in read_distributed(
                LanceNativeDataset(root), spark
            ).collect()
        )
        assert rows == list(range(20))


def test_arrow_schema_jobless_equivalence(spark):
    """r15 pin: _df_arrow_schema derives the Arrow schema from the
    plan (to_arrow_schema) — it must equal what Spark's own Arrow
    transfer produces for every type family the native writer
    handles, or the jobless shortcut silently changes mutation
    schema checks."""
    from lance_flink_spark.sources.lance_native import _df_arrow_schema

    df = spark.createDataFrame(
        [(1, "a", 1.5)], "id long, s string, v double"
    ).selectExpr(
        "id", "s", "v",
        "current_timestamp() AS ts",
        "timestamp_ntz'2020-01-01' AS tntz",
        "array(1.0F) AS emb",
        "cast(null AS binary) AS b",
        "cast(7 AS int) AS i32",
        "cast(2.5 AS float) AS f32",
    )
    assert _df_arrow_schema(df) == df.limit(0).toArrow().schema


def test_repartition_count_matches_target(spark):
    """r15 pin: repartition(n, col) physically produces n partitions —
    the invariant behind resolve_deletions_distributed's
    one-deletion-task-per-fragment accounting."""
    df = spark.range(100).selectExpr("id", "id % 3 AS g")
    assert df.repartition(7, "g").rdd.getNumPartitions() == 7
