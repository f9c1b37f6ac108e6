"""Third batch of TPC-H-shaped analytics: nation-pair volumes (Q7),
market share (Q8), distribution via double aggregation (Q13), top-1
with a scalar-subquery threshold (Q15), correlated-average filters
(Q17). The driver schema has no partsupp table, so partsupp-based
queries (Q2/Q9/Q11/Q20) are out of reach; these five cover the
remaining join/subquery shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from raft_c_spark.functions.exact import dec, sql_dec, sql_sum_expr
from raft_c_spark.plans.tpch import _SQL_DISC_PRICE, _disc_price
from raft_c_spark.sources.testdata import load_table


def q_nation_volume_shipping(spark, sf_dir):
    """Q7-shaped: revenue shipped between two nation pairs per year
    (supplier nation ↔ customer nation, both directions)."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    # orders is fact-sized — shuffle join on orderkey, no hint
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q_national_market_share(spark, sf_dir):
    """Q8-shaped: share of a nation's suppliers in ECONOMY-part revenue
    per order year."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    vol = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == F.col("s_nk"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            _disc_price().alias("volume"),
            F.col("supp_nation"),
        )
    )
    target = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
            F.lit(0).cast("decimal(14,4)")
        )
    ).cast("double")
    total = F.sum("volume").cast("double")
    return (
        vol.groupBy("o_year")
        .agg((target / total).alias("mkt_share"), total.alias("total_volume"))
        .orderBy("o_year")
    )


def q_customer_order_distribution(spark, sf_dir):
    """Q13-shaped: distribution of customers by order count (double
    aggregation with a left join keeping zero-order customers)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("c_count"))
    )


def q_top_supplier(spark, sf_dir):
    """Q15-shaped: supplier(s) with the maximum 1996 revenue — scalar
    max as a re-aggregation join, not a window over the whole frame."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    rev = l.groupBy("l_suppkey").agg(
        F.sum(_disc_price()).cast("double").alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(top), rev.total_revenue == top.mx)
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q_small_quantity_revenue(spark, sf_dir):
    """Q17-shaped: revenue from lineitems below 50%% of their part's
    average quantity (correlated-average as a re-aggregation broadcast
    join)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    l = load_table(spark, sf_dir, "lineitem")
    avg_qty = l.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.sum(dec("l_quantity", "9,2")).cast("double") / F.count("l_quantity")).alias(
            "avg_qty"
        )
    )
    # avg_qty is |part|-sized (grows with SF) — shuffle join on
    # partkey; only the filtered part dimension keeps its hint
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(avg_qty, l.l_partkey == F.col("ap"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice", "9,2")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


QUERIES = {
    "tpch_nation_volume_shipping": q_nation_volume_shipping,
    "tpch_national_market_share": q_national_market_share,
    "tpch_customer_order_distribution": q_customer_order_distribution,
    "tpch_top_supplier": q_top_supplier,
    "tpch_small_quantity_revenue": q_small_quantity_revenue,
}

ORACLES = {
    "tpch_nation_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               {sql_sum_expr(_SQL_DISC_PRICE)} AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "tpch_national_market_share": f"""
        SELECT o_year,
               target / total AS mkt_share,
               total AS total_volume
        FROM (
            SELECT year(o_orderdate) AS o_year,
                   CAST(SUM(CASE WHEN n_name = 'NATION_3'
                                 THEN {_SQL_DISC_PRICE}
                                 ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
                       AS target,
                   {sql_sum_expr(_SQL_DISC_PRICE)} AS total
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            WHERE p_type = 'ECONOMY'
            GROUP BY o_year
        )
    """,
    "tpch_customer_order_distribution": """
        SELECT c_count, COUNT(*) AS n_customers
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    "tpch_top_supplier": f"""
        WITH rev AS (
            SELECT l_suppkey, {sql_sum_expr(_SQL_DISC_PRICE)} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    "tpch_small_quantity_revenue": f"""
        WITH aq AS (
            SELECT l_partkey AS ap,
                   CAST(SUM({sql_dec('l_quantity', '9,2')}) AS DOUBLE)
                       / COUNT(l_quantity) AS avg_qty
            FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(SUM({sql_dec('l_extendedprice', '9,2')}) AS DOUBLE) / 7.0
                   AS avg_yearly,
               COUNT(*) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN aq ON l_partkey = ap
        WHERE p_brand = 'Brand#3'
          AND l_quantity < 0.5 * avg_qty
    """,
}
