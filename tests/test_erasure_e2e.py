"""Right-to-be-forgotten lifecycle: DELETE WHERE erases a user
logically; vacuum after the mutation physically removes every byte of
the superseded files — verified by scanning the remaining parquet
files' raw contents. The compliance story a versioned lakehouse must
actually deliver (time travel is a liability here, so it is expired
too)."""

from pathlib import Path

from pyspark.sql import Row

from lance_flink_spark.sources.dataset import Dataset

SECRET = "FORGET-ME-7739-SENTINEL"


def test_user_erasure_leaves_no_bytes(spark, tmp_path_str):
    ds = Dataset(tmp_path_str + "/ds")
    rows = [Row(id=i, user="alice" if i % 10 == 0 else f"u{i}",
                note=SECRET if i % 10 == 0 else f"note-{i}")
            for i in range(200)]
    ds.write(spark.createDataFrame(rows))

    # the sentinel is on disk before erasure
    def raw_bytes():
        out = b""
        for p in Path(tmp_path_str + "/ds").rglob("*.parquet"):
            out += p.read_bytes()
        return out

    assert SECRET.encode() in raw_bytes()

    ds.delete_where(spark, "user = 'alice'")
    # logically gone immediately...
    assert ds.read(spark).filter("user = 'alice'").count() == 0
    # ...but old versions still hold the bytes until vacuum
    assert SECRET.encode() in raw_bytes()

    deleted = ds.vacuum(keep_versions=1, orphan_grace_seconds=0)
    assert deleted  # the superseded pre-delete files went away
    assert SECRET.encode() not in raw_bytes()

    # the dataset still reads fine and time travel to the pre-delete
    # version is correctly refused (expired, not silently wrong)
    assert ds.read(spark).count() == 180
    import pytest

    with pytest.raises(ValueError, match="expired"):
        ds.read(spark, version=1)
