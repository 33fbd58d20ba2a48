"""Catalog CRUD + SQL registration — mirrors LanceCatalog tests."""

import pytest
from pyspark.sql import Row

from lance_flink_spark.sources.catalog import Catalog, CatalogError


def _df(spark, n=10):
    return spark.createDataFrame([Row(id=i, v=i * 2) for i in range(n)])


def test_database_lifecycle(tmp_path_str):
    cat = Catalog(tmp_path_str)
    assert cat.list_databases() == ["default"]
    cat.create_database("db1")
    assert cat.list_databases() == ["db1", "default"]
    with pytest.raises(CatalogError):
        cat.create_database("db1")
    cat.create_database("db1", ignore_if_exists=True)
    cat.drop_database("db1")
    assert cat.list_databases() == ["default"]


def test_table_lifecycle(spark, tmp_path_str):
    cat = Catalog(tmp_path_str)
    cat.create_table("default", "t1", _df(spark))
    assert cat.list_tables("default") == ["t1"]
    with pytest.raises(CatalogError):
        cat.create_table("default", "t1", _df(spark))
    cat.rename_table("default", "t1", "t2")
    assert cat.list_tables("default") == ["t2"]
    assert cat.load_table("default", "t2").read(spark).count() == 10
    cat.drop_table("default", "t2")
    assert cat.list_tables("default") == []


def test_sql_registration_and_insert(spark, tmp_path_str):
    cat = Catalog(tmp_path_str)
    cat.create_table("default", "t", _df(spark, 5))
    cat.register(spark, "default", "t", view="cat_t_test")
    assert spark.sql("SELECT SUM(v) AS s FROM cat_t_test").first()["s"] == 20
    cat.insert_into("default", "t", _df(spark, 3))
    assert cat.load_table("default", "t").read(spark).count() == 8
    cat.insert_into("default", "t", _df(spark, 2), overwrite=True)
    assert cat.load_table("default", "t").read(spark).count() == 2


def test_drop_nonempty_database_needs_cascade(spark, tmp_path_str):
    cat = Catalog(tmp_path_str)
    cat.create_database("d")
    cat.create_table("d", "t", _df(spark, 1))
    with pytest.raises(CatalogError):
        cat.drop_database("d")
    cat.drop_database("d", cascade=True)
    assert not cat.database_exists("d")
