"""Warehouse catalog: databases + tables over versioned datasets.

Parity with the reference's LanceCatalog (table/LanceCatalog.java:1-854,
LanceCatalogFactory.java): a warehouse directory holds databases
(subdirectories), each table is a Dataset. Supports create/drop/list/
rename for both levels, plus registering tables as Spark temp views so
the full spark.sql surface (the reference's Table API/SQL layer) works
against them.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from lance_flink_spark.sources import fsio
from lance_flink_spark.sources.dataset import Dataset

DB_META = "_database.json"


class CatalogError(Exception):
    pass


class Catalog:
    def __init__(self, warehouse: str, default_database: str = "default"):
        self.warehouse = warehouse
        fsio.makedirs(warehouse)
        self.default_database = default_database
        if not self.database_exists(default_database):
            self.create_database(default_database)

    # ---------- databases ----------

    def _db_path(self, name: str) -> str:
        return fsio.join(self.warehouse, name)

    def create_database(self, name: str, ignore_if_exists: bool = False) -> None:
        p = self._db_path(name)
        if fsio.exists(p):
            if ignore_if_exists:
                return
            raise CatalogError(f"database {name} already exists")
        fsio.makedirs(p)
        fsio.write_text_atomic(fsio.join(p, DB_META), json.dumps({"name": name}))

    def database_exists(self, name: str) -> bool:
        return fsio.exists(fsio.join(self._db_path(name), DB_META))

    def list_databases(self) -> list[str]:
        return sorted(
            d for d in fsio.listdir(self.warehouse) if self.database_exists(d)
        )

    def drop_database(self, name: str, cascade: bool = False) -> None:
        if not self.database_exists(name):
            raise CatalogError(f"database {name} does not exist")
        if self.list_tables(name) and not cascade:
            raise CatalogError(f"database {name} is not empty")
        fsio.delete(self._db_path(name), recursive=True)

    # ---------- tables ----------

    def _table_path(self, db: str, table: str) -> str:
        return fsio.join(self._db_path(db), table)

    def table_exists(self, db: str, table: str) -> bool:
        return fsio.exists(fsio.join(self._table_path(db, table), "_manifest.json"))

    def list_tables(self, db: str) -> list[str]:
        if not self.database_exists(db):
            raise CatalogError(f"database {db} does not exist")
        p = self._db_path(db)
        return sorted(t for t in fsio.listdir(p) if self.table_exists(db, t))

    def create_table(self, db: str, table: str, df: DataFrame, mode: str = "errorifexists") -> Dataset:
        """Create (or overwrite) a table from a DataFrame."""
        if not self.database_exists(db):
            raise CatalogError(f"database {db} does not exist")
        exists = self.table_exists(db, table)
        if exists and mode == "errorifexists":
            raise CatalogError(f"table {db}.{table} already exists")
        ds = Dataset(self._table_path(db, table))
        ds.write(df, mode="overwrite" if exists else "append")
        return ds

    def load_table(self, db: str, table: str) -> Dataset:
        if not self.table_exists(db, table):
            raise CatalogError(f"table {db}.{table} does not exist")
        return Dataset(self._table_path(db, table))

    def drop_table(self, db: str, table: str) -> None:
        if not self.table_exists(db, table):
            raise CatalogError(f"table {db}.{table} does not exist")
        fsio.delete(self._table_path(db, table), recursive=True)

    def rename_table(self, db: str, old: str, new: str) -> None:
        if not self.table_exists(db, old):
            raise CatalogError(f"table {db}.{old} does not exist")
        if self.table_exists(db, new):
            raise CatalogError(f"table {db}.{new} already exists")
        fsio.rename(self._table_path(db, old), self._table_path(db, new))

    # ---------- logical views (catalog objects, Flink semantics) ----------
    #
    # Flink non-TEMPORARY views are CATALOG objects: the SELECT text is
    # persisted in warehouse metadata and visible to every session over
    # the same warehouse (the reference's views live in LanceCatalog the
    # same way). One _views.json per database, creation order preserved
    # (JSON objects keep insertion order) so view-over-view re-expansion
    # replays correctly in a new engine.

    VIEWS_META = "_views.json"

    def _views_path(self, db: str) -> str:
        return fsio.join(self._db_path(db), self.VIEWS_META)

    def list_views(self, db: str) -> dict[str, str]:
        """{view_name: select_text} in creation order; {} if none."""
        p = self._views_path(db)
        if not fsio.exists(p):
            return {}
        return json.loads(fsio.read_text(p))

    def save_view(self, db: str, name: str, select: str) -> None:
        if not self.database_exists(db):
            raise CatalogError(f"database {db} does not exist")
        views = self.list_views(db)
        views[name] = select
        fsio.write_text_atomic(self._views_path(db), json.dumps(views, indent=1))

    def drop_view(self, db: str, name: str) -> None:
        views = self.list_views(db)
        if name in views:
            del views[name]
            fsio.write_text_atomic(
                self._views_path(db), json.dumps(views, indent=1)
            )

    # ---------- SQL surface ----------

    def register(self, spark: SparkSession, db: str, table: str, view: str | None = None) -> DataFrame:
        """Expose a catalog table to spark.sql as a temp view — the
        equivalent of the reference's DynamicTableSource registration."""
        df = self.load_table(db, table).read(spark)
        df.createOrReplaceTempView(view or table)
        return df

    def insert_into(self, db: str, table: str, df: DataFrame, overwrite: bool = False) -> int:
        """INSERT INTO / INSERT OVERWRITE (LanceDynamicTableSink.java)."""
        ds = self.load_table(db, table)
        return ds.write(df, mode="overwrite" if overwrite else "append")
