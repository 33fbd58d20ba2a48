"""Arrow ↔ Spark type mapping.

Parity with converter/LanceTypeConverter.java:1-440 (Arrow ↔ Flink):
Int8/16/32/64 → byte/short/int/long, Float32/64 → float/double,
String, Boolean, Binary, Date32 → date, Timestamp → timestamp,
(FixedSize)List<Float> → array<float>, Struct → struct.

Spark already converts Arrow record batches natively (pandas-UDF
exchange); this module provides the explicit schema-level mapping the
reference exposes, used by the multimodal/mapInPandas plumbing and the
catalog when creating tables from Arrow data.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import types as T

_ARROW_TO_SPARK_PRIMITIVE = {
    pa.int8(): T.ByteType(),
    pa.int16(): T.ShortType(),
    pa.int32(): T.IntegerType(),
    pa.int64(): T.LongType(),
    pa.uint8(): T.ShortType(),
    pa.uint16(): T.IntegerType(),
    pa.uint32(): T.LongType(),
    pa.float16(): T.FloatType(),
    pa.float32(): T.FloatType(),
    pa.float64(): T.DoubleType(),
    pa.string(): T.StringType(),
    pa.large_string(): T.StringType(),
    pa.bool_(): T.BooleanType(),
    pa.binary(): T.BinaryType(),
    pa.large_binary(): T.BinaryType(),
    pa.date32(): T.DateType(),
    pa.date64(): T.DateType(),
}


def arrow_type_to_spark(t: pa.DataType) -> T.DataType:
    if t in _ARROW_TO_SPARK_PRIMITIVE:
        return _ARROW_TO_SPARK_PRIMITIVE[t]
    if pa.types.is_timestamp(t):
        return T.TimestampType()
    if pa.types.is_decimal(t):
        return T.DecimalType(t.precision, t.scale)
    if pa.types.is_fixed_size_binary(t):
        return T.BinaryType()
    # FixedSizeList<Float> ↔ ARRAY<FLOAT> — the vector column mapping
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return T.ArrayType(arrow_type_to_spark(t.value_type))
    if pa.types.is_struct(t):
        return T.StructType(
            [T.StructField(f.name, arrow_type_to_spark(f.type), f.nullable) for f in t]
        )
    if pa.types.is_map(t):
        return T.MapType(arrow_type_to_spark(t.key_type), arrow_type_to_spark(t.item_type))
    raise TypeError(f"unsupported arrow type: {t}")


_SPARK_TO_ARROW_PRIMITIVE = {
    T.ByteType(): pa.int8(),
    T.ShortType(): pa.int16(),
    T.IntegerType(): pa.int32(),
    T.LongType(): pa.int64(),
    T.FloatType(): pa.float32(),
    T.DoubleType(): pa.float64(),
    T.StringType(): pa.string(),
    T.BooleanType(): pa.bool_(),
    T.BinaryType(): pa.binary(),
    T.DateType(): pa.date32(),
    T.TimestampType(): pa.timestamp("us"),
}


def spark_type_to_arrow(t: T.DataType) -> pa.DataType:
    if t in _SPARK_TO_ARROW_PRIMITIVE:
        return _SPARK_TO_ARROW_PRIMITIVE[t]
    if isinstance(t, T.DecimalType):
        return pa.decimal128(t.precision, t.scale)
    if isinstance(t, T.ArrayType):
        return pa.list_(spark_type_to_arrow(t.elementType))
    if isinstance(t, T.StructType):
        # a real Arrow struct DataType — NOT pa.schema, which is only
        # valid at top level (pa.list_(Schema)/pa.field(.., Schema)
        # raise); matches LanceTypeConverter's Struct mapping
        return pa.struct(
            [
                pa.field(f.name, spark_type_to_arrow(f.dataType), f.nullable)
                for f in t.fields
            ]
        )
    if isinstance(t, T.MapType):
        return pa.map_(spark_type_to_arrow(t.keyType), spark_type_to_arrow(t.valueType))
    raise TypeError(f"unsupported spark type: {t}")


def arrow_schema_to_spark(schema: pa.Schema) -> T.StructType:
    return T.StructType(
        [T.StructField(f.name, arrow_type_to_spark(f.type), f.nullable) for f in schema]
    )


def spark_schema_to_arrow(schema: T.StructType) -> pa.Schema:
    return pa.schema(
        [pa.field(f.name, spark_type_to_arrow(f.dataType), f.nullable) for f in schema.fields]
    )
