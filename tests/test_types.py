"""Arrow ↔ Spark type mapping — mirrors LanceTypeConverterTest."""

import pyarrow as pa
import pytest
from pyspark.sql import types as T

from lance_flink_spark.sources.types import (
    arrow_schema_to_spark,
    arrow_type_to_spark,
    spark_type_to_arrow,
)


@pytest.mark.parametrize(
    "arrow_t,spark_t",
    [
        (pa.int8(), T.ByteType()),
        (pa.int16(), T.ShortType()),
        (pa.int32(), T.IntegerType()),
        (pa.int64(), T.LongType()),
        (pa.float32(), T.FloatType()),
        (pa.float64(), T.DoubleType()),
        (pa.string(), T.StringType()),
        (pa.bool_(), T.BooleanType()),
        (pa.binary(), T.BinaryType()),
        (pa.date32(), T.DateType()),
    ],
)
def test_primitives(arrow_t, spark_t):
    assert arrow_type_to_spark(arrow_t) == spark_t


def test_timestamp_and_decimal():
    assert arrow_type_to_spark(pa.timestamp("us")) == T.TimestampType()
    assert arrow_type_to_spark(pa.decimal128(10, 2)) == T.DecimalType(10, 2)


def test_vector_column_mapping():
    # FixedSizeList<Float> ↔ ARRAY<FLOAT> — the embedding column type
    assert arrow_type_to_spark(pa.list_(pa.float32(), 64)) == T.ArrayType(T.FloatType())
    assert arrow_type_to_spark(pa.list_(pa.float32())) == T.ArrayType(T.FloatType())


def test_nested_struct_maps_to_arrow_struct_type():
    """StructType below top level must map to pa.struct (a DataType),
    not pa.schema — pa.list_(Schema)/pa.field(name, Schema) raise
    (LanceTypeConverter maps Struct to an Arrow Struct type)."""
    import pyarrow as pa

    from lance_flink_spark.sources.types import (
        arrow_type_to_spark,
        spark_type_to_arrow,
    )

    inner = T.StructType(
        [T.StructField("x", T.DoubleType()), T.StructField("y", T.StringType())]
    )
    at = spark_type_to_arrow(inner)
    assert isinstance(at, pa.StructType)
    # struct nested in array and in struct both construct cleanly
    arr = spark_type_to_arrow(T.ArrayType(inner))
    assert pa.types.is_list(arr) and pa.types.is_struct(arr.value_type)
    outer = spark_type_to_arrow(
        T.StructType([T.StructField("pt", inner), T.StructField("id", T.LongType())])
    )
    assert pa.types.is_struct(outer)
    # and round-trips back to the same Spark type
    assert arrow_type_to_spark(at) == inner


def test_struct_roundtrip():
    s = pa.schema([("id", pa.int64()), ("emb", pa.list_(pa.float32()))])
    spark_schema = arrow_schema_to_spark(s)
    assert spark_schema == T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("emb", T.ArrayType(T.FloatType())),
        ]
    )


def test_spark_to_arrow():
    assert spark_type_to_arrow(T.ArrayType(T.FloatType())) == pa.list_(pa.float32())
    assert spark_type_to_arrow(T.TimestampType()) == pa.timestamp("us")
    with pytest.raises(TypeError):
        spark_type_to_arrow(T.NullType())


def test_unsupported_arrow_type():
    with pytest.raises(TypeError):
        arrow_type_to_spark(pa.duration("s"))
