"""TPC-H-style analytical plans over the star schema (engine showcase).

The reference has no numeric aggregations at all (SURVEY.md §2.4), so these
are extension queries proving the engine's analytical tier: multi-way joins
with broadcast dimensions, map-side partial aggregation, top-k.

Determinism contract: money math goes through decimal (exact, engine-
independent) and is cast to double only at the output edge, so results
hash-match any correct engine bit-for-bit. ``sum(double)`` would depend on
partitioning order — never used here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_D = "decimal(18,2)"


def _dec(c: str):
    return F.col(c).cast(_D)


def pricing_summary(lineitem: DataFrame, ship_cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) pricing summary.

    One scan, one shuffle on a 6-value key; every sum partial-aggregates
    map-side. The date filter pushes down to the parquet scan.
    """
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(_D) - _dec("l_discount"))
    charge = disc_price * (F.lit(1).cast(_D) + _dec("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(ship_cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            F.round(
                F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_qty"),
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_price"),
            F.round(
                F.sum(_dec("l_discount")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-03-15",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: top-k open orders by discounted revenue.

    customer is the small side → broadcast into orders; the orders→lineitem
    join shuffles on orderkey (the only unavoidable shuffle); top-k is a
    global sort of the tiny aggregate, tie-broken by orderkey for
    determinism.
    """
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(_D) - _dec("l_discount"))
    cut = F.lit(cutoff).cast("timestamp")
    open_orders = orders.filter(F.col("o_orderdate") < cut).join(
        F.broadcast(
            customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
        ),
        orders["o_custkey"] == F.col("c_custkey"),
    )
    return (
        lineitem.filter(F.col("l_shipdate") > cut)
        .join(open_orders, lineitem["l_orderkey"] == open_orders["o_orderkey"])
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(k)
    )


def volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    date_from: str = "1995-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year.

    Both nation lookups broadcast (two aliases of the same tiny dim); the
    orders⋈lineitem shuffle on orderkey is the only fact shuffle — customer
    and supplier join broadcast after their nation filters cut them down.
    """
    vol = _dec("l_extendedprice") * (F.lit(1).cast(_D) - _dec("l_discount"))
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin(nation_a, nation_b))
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin(nation_a, nation_b))
    supp = supplier.join(F.broadcast(n1), "s_nationkey").select(
        "s_suppkey", "supp_nation"
    )
    cust = customer.join(F.broadcast(n2), "c_nationkey").select(
        "c_custkey", "cust_nation"
    )
    ord_c = orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]).select(
        "o_orderkey", "cust_nation"
    )
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(F.broadcast(supp), lineitem["l_suppkey"] == supp["s_suppkey"])
        .join(ord_c, lineitem["l_orderkey"] == ord_c["o_orderkey"])
        .filter(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(vol), 2).cast("double").alias("revenue"))
    )


def returned_item_report(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue lost to returned items in
    a quarter. Broadcast nation; orders date filter pushes to the scan;
    deterministic top-k tiebreak on custkey."""
    rev = _dec("l_extendedprice") * (F.lit(1).cast(_D) - _dec("l_discount"))
    ord_f = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    returned = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", rev.alias("rev")
    )
    return (
        returned.join(ord_f, returned["l_orderkey"] == ord_f["o_orderkey"])
        .join(customer, F.col("o_custkey") == customer["c_custkey"])
        .join(
            F.broadcast(nation),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum("rev"), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def promo_revenue_share(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1996-03-01",
    date_to: str = "1996-04-01",
    promo_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q14 shape: promotional revenue share for one month — part
    broadcast into the date-filtered lineitem scan, conditional + total sums
    in one aggregate, ratio at the edge."""
    rev = _dec("l_extendedprice") * (F.lit(1).cast(_D) - _dec("l_discount"))
    joined = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    ).join(
        F.broadcast(part.select("p_partkey", "p_type")),
        lineitem["l_partkey"] == F.col("p_partkey"),
    )
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == promo_type, rev).otherwise(F.lit(0).cast(_D))).cast("double")
            / F.sum(rev).cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty_sum: float = 250.0,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q18 shape: customers whose single orders exceed a quantity
    threshold — aggregate-filter on lineitem produces the (tiny) qualifying
    orderkey set, which re-joins as a broadcast; deterministic top-k."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > min_qty_sum)
    )
    return (
        orders.join(F.broadcast(big), orders["o_orderkey"] == big["l_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(k)
    )


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13 shape: histogram of customers by order count, INCLUDING
    zero-order customers — left outer join then two-level aggregation (the
    first groupBy keys on custkey, the second on the tiny count domain)."""
    per_cust = (
        customer.select("c_custkey")
        .join(orders.select("o_custkey", "o_orderkey"),
              customer["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def top_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue — the
    revenue aggregate self-joins against its own max (a one-row broadcast),
    keeping ties like the spec's subquery formulation."""
    rev = _dec("l_extendedprice") * (F.lit(1).cast(_D) - _dec("l_discount"))
    by_supp = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("total_revenue"))
    )
    max_rev = by_supp.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        by_supp.join(F.broadcast(max_rev), by_supp["total_revenue"] == max_rev["max_revenue"])
        .join(supplier, by_supp["l_suppkey"] == supplier["s_suppkey"])
        .select(
            F.col("s_suppkey"), "s_name", "total_revenue"
        )
    )


def order_priority_check(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-07-01",
    returnflag: str = "R",
) -> DataFrame:
    """TPC-H Q4 shape: order counts by priority for orders in a date window
    having at least one qualifying lineitem (EXISTS → left-semi join).

    (The driver's lineitem has no commit/receipt dates, so the EXISTS
    predicate is 'has a returned item' — the plan shape is Q4's: pushed-down
    date filter on orders, distinct-key semi join, 5-value groupBy.)
    """
    qualifying = lineitem.filter(F.col("l_returnflag") == returnflag).select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(qualifying, on="o_orderkey", how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def forecast_revenue_change(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    discount_lo: float = 0.05,
    discount_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6: one-row filtered aggregate — the pure pushdown showcase.
    Every predicate (shipdate range, discount band, quantity cap) reaches the
    parquet scan; the aggregate is a map-side partial over decimal (exact)."""
    rev = _dec("l_extendedprice") * _dec("l_discount")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
            & (F.col("l_discount") >= discount_lo)
            & (F.col("l_discount") <= discount_hi)
            & (F.col("l_quantity") < max_qty)
        )
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
    )


def local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where customer and supplier share
    the nation, within one region and order-date year.

    nation⋈region collapses to a broadcast dim; supplier joins broadcast;
    the two fact joins (orders⋈customer, lineitem⋈orders) shuffle on their
    keys with AQE handling skew. 'Local' = c_nationkey == s_nationkey.
    """
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(_D) - _dec("l_discount"))
    nr = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        nation["n_regionkey"] == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    cust = customer.join(
        F.broadcast(nr.withColumnRenamed("n_nationkey", "c_nationkey")), "c_nationkey"
    ).select("c_custkey", F.col("c_nationkey").alias("cust_nation"), "n_name")
    supp = supplier.select("s_suppkey", F.col("s_nationkey").alias("supp_nation"))
    ord_f = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    return (
        lineitem.select("l_orderkey", "l_suppkey", revenue.alias("rev"))
        .join(ord_f, F.col("l_orderkey") == ord_f["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .filter(F.col("cust_nation") == F.col("supp_nation"))
        .groupBy("n_name")
        .agg(F.round(F.sum("rev"), 2).cast("double").alias("revenue"))
    )
