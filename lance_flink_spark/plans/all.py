"""Import every module that registers queries, populating the registry.

Grown as operators land; __spark_entry__ and bench.py import this.
"""

import lance_flink_spark.plans.aggregates  # noqa: F401
import lance_flink_spark.plans.analytics  # noqa: F401
import lance_flink_spark.plans.events  # noqa: F401
import lance_flink_spark.plans.quality  # noqa: F401
import lance_flink_spark.plans.relational_extra  # noqa: F401
import lance_flink_spark.plans.storage  # noqa: F401
import lance_flink_spark.plans.tpch  # noqa: F401
import lance_flink_spark.plans.tpch_more  # noqa: F401
import lance_flink_spark.plans.temporal_skew  # noqa: F401
import lance_flink_spark.plans.text_dedup  # noqa: F401
import lance_flink_spark.plans.vectors  # noqa: F401
