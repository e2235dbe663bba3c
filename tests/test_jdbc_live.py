"""LIVE JDBC conformance (S4-S6): Spark bundles the Derby embedded driver,
so the real ``spark.read.jdbc`` path — stats pre-scan, COUNT-then-chunk
plan, partitioned parallel read, predicate pushdown — runs end-to-end in
the sandbox against an actual SQL database, closing the 'plan tested /
fetch untestable' gap from earlier rounds.

Reference flow under test: ``app/services/redshift_service.py:272-309`` /
``rds_service.py:361-392`` (COUNT pre-scan then chunked fetch; here the
chunks are key ranges, not offsets)."""

from __future__ import annotations

import pytest

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    """An embedded Derby database with a 5,000-row orders-like table."""
    db = tmp_path_factory.mktemp("derby") / "livedb"
    url = f"jdbc:derby:{db};create=true"
    df = spark.range(0, 5000).selectExpr(
        "id AS o_key",
        "CAST(id % 97 AS INT) AS o_cust",
        "CAST(id * 1.5 AS DOUBLE) AS o_total",
    )
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "orders_t")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    return url


class TestLiveJdbc:
    def test_stats_prescan(self, spark, derby):
        from pii_detector_spark.sources.jdbc import jdbc_table_stats

        total, lo, hi = jdbc_table_stats(
            spark, derby, "orders_t", "o_key", driver=DRIVER
        )
        assert (total, lo, hi) == (5000, 0, 4999)

    def test_partitioned_read_full_flow(self, spark, derby):
        """stats → plan → partitioned read: every row exactly once, with
        the planned parallelism."""
        from pii_detector_spark.sources.jdbc import read_jdbc_table

        df = read_jdbc_table(
            spark, derby, "orders_t", "o_key",
            chunk_rows=1000, driver=DRIVER,
        )
        assert df.rdd.getNumPartitions() == 5  # ceil(5000/1000)
        rows = df.collect()
        assert len(rows) == 5000
        keys = sorted(r["o_key"] for r in rows)
        assert keys == list(range(5000))  # exactly once, no seams

    def test_filter_pushdown_reaches_the_database(self, spark, derby):
        """A filter on the partition key must appear as a PushedFilters
        entry in the JDBC scan (server-side WHERE, not a post-scan
        filter)."""
        from pii_detector_spark.sources.jdbc import (
            plan_jdbc_read,
            read_jdbc,
        )

        plan = plan_jdbc_read("orders_t", "o_key", 5000, 0, 4999,
                              chunk_rows=1000)
        df = read_jdbc(spark, derby, plan, driver=DRIVER).filter(
            "o_cust = 13"
        )
        assert df.count() == len([i for i in range(5000) if i % 97 == 13])
        plan_str = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan_str and "O_CUST" in plan_str.upper()

    def test_predicates_form_covers_exactly_once(self, spark, derby):
        """The predicates= variant (range_predicates) against the live DB:
        disjoint covering, one partition per predicate."""
        from pii_detector_spark.sources.jdbc import range_predicates

        preds = range_predicates('"o_key"', 0, 4999, 4)
        df = spark.read.jdbc(
            url=derby,
            table="orders_t",
            predicates=preds,
            properties={"driver": DRIVER},
        )
        assert df.rdd.getNumPartitions() == len(preds)
        assert df.count() == 5000
        assert df.select("o_key").distinct().count() == 5000


def test_stats_null_partition_column(spark, tmp_path_factory):
    """ADVICE r4 (low): non-empty table whose partition column is entirely
    NULL must raise a clear ValueError naming the column, not a bare
    TypeError from int(None)."""
    from pii_detector_spark.sources.jdbc import jdbc_table_stats

    db = tmp_path_factory.mktemp("derby_null") / "nulldb"
    url = f"jdbc:derby:{db};create=true"
    df = spark.range(0, 10).selectExpr(
        "id AS o_key", "CAST(NULL AS INT) AS all_null"
    )
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "nulls_t")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    with pytest.raises(ValueError, match="all_null"):
        jdbc_table_stats(spark, url, "nulls_t", "all_null", driver=DRIVER)


class TestCatalogEnumeration:
    """VERDICT r4 #4: the reference's list-tables-with-sizes step
    (redshift_service.py:191-270, snowflake_service.py:181-229,
    rds_service.py:251-343), live against Derby's SYS catalog."""

    @pytest.fixture(scope="class")
    def warehouse(self, spark, tmp_path_factory):
        db = tmp_path_factory.mktemp("derby_cat") / "catdb"
        url = f"jdbc:derby:{db};create=true"
        for name, n in (("T_ORDERS", 300), ("T_CUSTS", 40)):
            df = spark.range(0, n).selectExpr("id AS k", "id * 2 AS v")
            (
                df.write.format("jdbc")
                .option("url", url).option("dbtable", name)
                .option("driver", DRIVER).mode("overwrite").save()
            )
        return url

    def test_enumerates_user_tables_with_counts(self, spark, warehouse):
        from pii_detector_spark.sources.jdbc import list_jdbc_tables

        infos = list_jdbc_tables(spark, warehouse, driver=DRIVER)
        by_name = {i.table: i for i in infos}
        # only USER tables — Derby's dozens of SYS.* catalog relations
        # must not leak into the listing
        assert set(by_name) == {"T_ORDERS", "T_CUSTS"}
        assert by_name["T_ORDERS"].rows == 300
        assert by_name["T_CUSTS"].rows == 40
        assert by_name["T_ORDERS"].schema  # Derby default: user schema

    def test_counts_skippable(self, spark, warehouse):
        from pii_detector_spark.sources.jdbc import list_jdbc_tables

        infos = list_jdbc_tables(
            spark, warehouse, with_counts=False, driver=DRIVER
        )
        assert {i.rows for i in infos} == {-1}

    def test_unknown_dialect_raises(self, spark):
        from pii_detector_spark.sources.jdbc import list_jdbc_tables

        with pytest.raises(ValueError, match="no catalog query"):
            list_jdbc_tables(spark, "jdbc:exoticdb:whatever")

    def test_scan_whole_catalog_through_planned_path(self, spark, warehouse):
        """Enumerate → read EVERY table via the partitioned planned path;
        row sets come back exactly once each."""
        from pii_detector_spark.sources.jdbc import scan_jdbc_catalog

        dfs = scan_jdbc_catalog(
            spark, warehouse,
            partition_column_for=lambda info: "k",
            chunk_rows=100, driver=DRIVER,
        )
        # schema-qualified keys: same-named tables in two schemas must
        # not silently overwrite each other
        assert {k.split(".", 1)[1] for k in dfs} == {"T_ORDERS", "T_CUSTS"}
        orders = next(v for k, v in dfs.items() if k.endswith("T_ORDERS"))
        custs = next(v for k, v in dfs.items() if k.endswith("T_CUSTS"))
        assert orders.rdd.getNumPartitions() == 3  # ceil(300/100)
        assert sorted(r["k"] for r in orders.collect()) == list(range(300))
        assert sorted(r["k"] for r in custs.collect()) == list(range(40))
