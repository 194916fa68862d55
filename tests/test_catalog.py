"""Catalog-managed table mode of load_tables (the Iceberg seam).

The sandbox has no Iceberg jars, so these tests register external
tables in the built-in session catalog with ``saveAsTable`` and drive
``load_tables(spark, "catalog:<ns>")`` — the identical
``spark.read.table`` code path an Iceberg catalog serves once the
runtime jar + catalog conf are supplied to spark-submit (README
"Table format")."""

from __future__ import annotations

import pytest

from relation_extraction_cdr_spark.plans.queries import QUERIES
from relation_extraction_cdr_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.001"
NS = "graft_catalog_test"


@pytest.fixture(scope="module")
def catalog_ns(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("catalog_tables")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {NS}")
    for name in ("documents", "region"):
        (
            spark.read.parquet(f"{SF_DIR}/{name}.parquet")
            .write.mode("overwrite")
            .option("path", str(root / name))
            .saveAsTable(f"{NS}.{name}")
        )
    yield NS
    spark.sql(f"DROP DATABASE IF EXISTS {NS} CASCADE")


def test_load_tables_catalog_mode(spark, catalog_ns):
    got = load_tables(spark, f"catalog:{catalog_ns}", ("documents", "region"))
    assert set(got) == {"documents", "region"}
    parquet_n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert got["documents"].count() == parquet_n


def test_load_tables_catalog_missing_raises(spark, catalog_ns):
    with pytest.raises(FileNotFoundError, match="lineitem"):
        load_tables(spark, f"catalog:{catalog_ns}", ("documents", "lineitem"))


def test_query_runs_unchanged_against_catalog(spark, catalog_ns):
    """A registered query produces identical rows whether its sf_dir is
    a parquet directory or a catalog namespace — the whole plan layer is
    source-agnostic through the load_tables seam."""
    q = QUERIES["q17_lang_id"]
    from_parquet = sorted(map(tuple, q(spark, SF_DIR).collect()))
    from_catalog = sorted(map(tuple, q(spark, f"catalog:{catalog_ns}").collect()))
    assert from_catalog == from_parquet


def _iceberg_on_classpath(spark) -> bool:
    """True iff the Iceberg Spark runtime jar is loadable in this JVM."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 - jar probe
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_iceberg_writeto_append_and_snapshot_read(spark, tmp_path):
    """The executable Iceberg path beyond the catalog seam: create a
    triples table with ``writeTo(...).createOrReplace()``, append a
    second commit with ``writeTo(...).append()``, verify TWO snapshots
    in the metadata table, and time-travel-read the first snapshot back
    at its original row count.

    SKIPPED when the Iceberg runtime jar is absent (this sandbox);
    on a real cluster, run with
    ``spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-
    4.0_2.13:<ver>`` and it executes as-is — v2 catalogs are looked up
    lazily, so the catalog conf set here at runtime is sufficient."""
    if not _iceberg_on_classpath(spark):
        pytest.skip(
            "Iceberg runtime jar not on the classpath; runnable via "
            "spark-submit --packages org.apache.iceberg:iceberg-spark-runtime"
        )
    cat = "graft_it"
    spark.conf.set(f"spark.sql.catalog.{cat}", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set(f"spark.sql.catalog.{cat}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{cat}.warehouse", str(tmp_path / "wh"))

    triples = QUERIES["q30_cdr_triples"](spark, SF_DIR)
    n0 = triples.count()
    tbl = f"{cat}.db.triples"
    triples.writeTo(tbl).using("iceberg").createOrReplace()
    triples.limit(1).writeTo(tbl).append()

    snaps = spark.sql(f"SELECT snapshot_id, committed_at FROM {tbl}.snapshots")
    assert snaps.count() >= 2
    first_id = snaps.orderBy("committed_at").first()["snapshot_id"]
    assert spark.table(tbl).count() == n0 + 1
    back = spark.read.option("snapshot-id", first_id).table(tbl)
    assert back.count() == n0  # time travel reads the pre-append commit
