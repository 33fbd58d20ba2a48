from lance_flink_spark.sources.dataset import Dataset, DatasetOptions
from lance_flink_spark.sources.catalog import Catalog

__all__ = ["Dataset", "DatasetOptions", "Catalog"]
