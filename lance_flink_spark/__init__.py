"""lance_flink_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of the Flink↔Lance connector
(reference: /root/reference, kaori-seasons/lance-flink).

Spark-first design: DataFrame/SQL plans optimized by Catalyst, parquet
datasets with manifest metadata, Structured Streaming for the stream
side, and vectorized (Arrow/pandas-UDF) paths only where built-in
functions can't express the semantics.
"""

from lance_flink_spark.session import get_spark, unpersist_all

__all__ = ["get_spark", "unpersist_all"]
__version__ = "0.1.0"
