"""AggregateInfo spec semantics — mirrors AggregateExecutorTest /
AggregateInfoTest."""

import pytest
from pyspark.sql import Row

from lance_flink_spark.operators.aggregate import AggregateCall, AggregateInfo


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            Row(k="a", v=1.0, u=10),
            Row(k="a", v=2.0, u=10),
            Row(k="b", v=3.0, u=20),
            Row(k="b", v=None, u=30),
        ]
    )


def test_global_aggs(spark, df):
    out = (
        AggregateInfo()
        .count_star("cnt")
        .add("count", "v", "cnt_v")
        .add("sum", "v", "s")
        .add("avg", "v", "m")
        .add("min", "v", "lo")
        .add("max", "v", "hi")
        .apply(df)
        .first()
    )
    assert out["cnt"] == 4
    assert out["cnt_v"] == 3  # COUNT(col) skips nulls (AggregateExecutor.java:102)
    assert out["s"] == 6.0 and out["m"] == 2.0
    assert out["lo"] == 1.0 and out["hi"] == 3.0


def test_group_by(spark, df):
    out = {
        r["k"]: r["cnt"]
        for r in AggregateInfo().count_star("cnt").grouped_by("k").apply(df).collect()
    }
    assert out == {"a": 2, "b": 2}


def test_count_distinct(spark, df):
    out = AggregateInfo().add("count_distinct", "u", "d").apply(df).first()
    assert out["d"] == 3


def test_required_columns_pruning(df):
    spec = AggregateInfo().add("sum", "v", "s").grouped_by("k")
    assert spec.required_columns == ["k", "v"]


def test_validation():
    with pytest.raises(ValueError):
        AggregateCall("median", "v", "m")
    with pytest.raises(ValueError):
        AggregateCall("sum", None, "s")
    with pytest.raises(ValueError):
        AggregateInfo().apply(None)
