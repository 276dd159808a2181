"""SQL text API surface: the engine's tables registered as temp views are
queryable with ANSI SQL through the same Catalyst planner — results must
equal the DataFrame-built twins (SURVEY §1: users can keep their SQL)."""

import pytest


@pytest.fixture(scope="module")
def views(spark):
    sf = "/root/testdata/sf0.001"
    for t in ("lineitem", "orders", "customer", "nation", "region"):
        spark.read.parquet(f"{sf}/{t}.parquet").createOrReplaceTempView(t)
    return sf


def test_sql_text_equals_dataframe_q1(spark, views):
    import __spark_entry__ as e

    sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    df = e.queries()["tpch_q1_pricing_summary"](spark, views)
    got = {
        (r["l_returnflag"], r["l_linestatus"]): (r["sum_qty"], r["count_order"])
        for r in sql.collect()
    }
    want = {
        (r["l_returnflag"], r["l_linestatus"]): (r["sum_qty"], r["count_order"])
        for r in df.collect()
    }
    assert got == want


def test_sql_text_window_and_cte(spark, views):
    # CTE + window + qualify-style filter through SQL text
    out = spark.sql(
        """
        WITH ranked AS (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC,
                                               o_orderkey) AS rn
            FROM orders
        )
        SELECT o_custkey, o_orderkey FROM ranked WHERE rn = 1
        """
    )
    # one row per customer, and it is that customer's max price order
    n_cust = spark.sql("SELECT count(DISTINCT o_custkey) AS n FROM orders")
    assert out.count() == n_cust.collect()[0]["n"]


def test_sql_text_join_plans_broadcast(spark, views):
    df = spark.sql(
        """
        SELECT /*+ BROADCAST(nation) */ n_name, count(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )
    qe = df._jdf.queryExecution()
    jmode = (
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("simple")
    )
    assert "BroadcastHashJoin" in qe.explainString(jmode)
    assert df.count() > 0
