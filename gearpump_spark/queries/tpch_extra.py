"""Remaining TPC-H-pattern queries, adapted to the driver's slimmed star
schema (FIXTURES.md §A: no partsupp table, no commit/receipt dates, no
shipmode/container/phone columns — each query keeps the original's plan
SHAPE and swaps unavailable predicates for available ones).

The reference has no relational surface at all (SURVEY.md §2.F); this
module is the M4 breadth milestone (SURVEY §7). Scale notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gearpump_spark.datasets import table
from gearpump_spark.queries import register
from gearpump_spark.queries._util import dec

REV2 = 'CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))), 2) AS DECIMAL(38,2)) AS DOUBLE)'


def _revenue():
    return dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))


@register(
    "q2_min_acctbal_supplier",
    oracle="""
    SELECT p_partkey, p_name, s_suppkey, s_name, CAST(ROUND(s_acctbal, 2) AS DOUBLE) AS s_acctbal
    FROM (
        SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal,
               ROW_NUMBER() OVER (PARTITION BY p.p_partkey
                                  ORDER BY s.s_acctbal, s.s_suppkey) AS rn
        FROM part p
        JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE p.p_size = 10)
    WHERE rn = 1 ORDER BY p_partkey
    """,
    desc="TPC-H Q2 shape: per-part argmin supplier (window over join)",
)
def q2_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's correlated-min subquery as a window argmin: dedup the
    part-supplier pairs (shuffle on partkey), broadcast supplier, then one
    row_number per part. No partsupp table → distinct pairs from lineitem."""
    part = table(spark, sf_dir, "part").filter(F.col("p_size") == 10)
    pairs = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    supp = F.broadcast(table(spark, sf_dir, "supplier"))
    w = Window.partitionBy("p_partkey").orderBy("s_acctbal", "s_suppkey")
    return (
        part.join(pairs, part.p_partkey == pairs.l_partkey)
        .join(supp, pairs.l_suppkey == supp.s_suppkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name",
            F.round("s_acctbal", 2).cast("double").alias("s_acctbal"),
        )
        .orderBy("p_partkey")
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    desc="TPC-H Q4 shape: EXISTS → left-semi join, priority counts",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS compiles to a left-semi hash join — probe side never
    duplicates orders however many lineitems match. Adapted predicate:
    shipped-after-order stands in for the missing commit/receipt dates."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("order_count")).orderBy(
        "o_orderpriority"
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {REV2} AS revenue
    FROM (
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               EXTRACT(year FROM l_shipdate) AS l_year,
               l_extendedprice, l_discount
        FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
             JOIN orders o ON o.o_orderkey = l.l_orderkey
             JOIN customer c ON c.c_custkey = o.o_custkey
             JOIN nation sn ON s.s_nationkey = sn.n_nationkey
             JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
            OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')))
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    desc="TPC-H Q7: bilateral nation trade volume by ship year",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two broadcast nation joins (aliased independently); the fact joins
    shuffle on orderkey/custkey/suppkey. Disjunctive nation filter applies
    after both broadcasts — cheap, row-local."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    sn = F.broadcast(
        table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    cn = F.broadcast(
        table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
        )
    )
    joined = (
        supp.join(li, supp.s_suppkey == li.l_suppkey)
        .join(orders, F.col("o_orderkey") == li.l_orderkey)
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            _revenue().alias("rev"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev").cast("decimal(38,2)").cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END) AS DOUBLE)
                      / CAST(SUM(volume) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
    FROM (
        SELECT EXTRACT(year FROM o_orderdate) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1.0 - l_discount AS DECIMAL(18,4)) AS volume,
               sn.n_name AS supp_nation
        FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
             JOIN supplier s ON s.s_suppkey = l.l_suppkey
             JOIN orders o ON o.o_orderkey = l.l_orderkey
             JOIN customer c ON c.c_custkey = o.o_custkey
             JOIN nation cn ON c.c_nationkey = cn.n_nationkey
             JOIN region r ON cn.n_regionkey = r.r_regionkey
             JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO')
    GROUP BY o_year ORDER BY o_year
    """,
    desc="TPC-H Q8: national market share within a region, by year",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregate ratio — one pass computes both numerator and
    denominator (no second scan or self-join). Dims broadcast."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    cn = F.broadcast(table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    ))
    sn = F.broadcast(table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ))
    region = F.broadcast(table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    volume = dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))
    joined = (
        part.join(li, part.p_partkey == li.l_partkey)
        .join(supp, F.col("s_suppkey") == li.l_suppkey)
        .join(orders, F.col("o_orderkey") == li.l_orderkey)
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .join(region, F.col("cn_rkey") == F.col("r_regionkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
    )
    return (
        joined.select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            volume.alias("volume"), "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                    .otherwise(F.lit(0).cast("decimal(18,4)"))
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).cast("double").alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, {REV2} AS profit
    FROM (
        SELECT sn.n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
               l_extendedprice, l_discount
        FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
             JOIN supplier s ON s.s_suppkey = l.l_suppkey
             JOIN orders o ON o.o_orderkey = l.l_orderkey
             JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        WHERE p.p_name LIKE '%red%')
    GROUP BY nation, o_year ORDER BY nation, o_year
    """,
    desc="TPC-H Q9 shape: profit by supplier nation and order year",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No partsupp → profit reduces to discounted revenue; plan shape
    (part filter pushed below a 4-way fact join, nation broadcast) is Q9's."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    sn = F.broadcast(table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    ))
    joined = (
        part.join(li, part.p_partkey == li.l_partkey)
        .join(supp, F.col("s_suppkey") == li.l_suppkey)
        .join(orders, F.col("o_orderkey") == li.l_orderkey)
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
    )
    return (
        joined.select(
            "nation", F.year("o_orderdate").cast("bigint").alias("o_year"),
            _revenue().alias("rev"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("rev").cast("decimal(38,2)").cast("double").alias("profit"))
        .orderBy("nation", "o_year")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
               AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    desc="TPC-H Q13: customer order-count distribution (two-level agg)",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join keeps order-less customers (count 0); the second
    aggregation is tiny (distinct counts). First shuffle on custkey only."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT CAST(ROUND(100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))
                    ELSE 0 END) AS DOUBLE)
                / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE), 6) AS DOUBLE)
           AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'
    """,
    desc="TPC-H Q14: promo revenue share (conditional agg ratio)",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part")
    rev = _revenue()
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev)
                    .otherwise(F.lit(0).cast("decimal(18,4)"))
                ).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).cast("double").alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, {REV2} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    desc="TPC-H Q15: top supplier by quarterly revenue (scalar subquery)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The revenue CTE computes once; the scalar max broadcasts as a
    1-row cross join (Catalyst ReuseExchange shares the aggregation)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_revenue()).cast("decimal(38,2)").cast("double").alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = table(spark, sf_dir, "supplier")
    return (
        supp.join(revenue, supp.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_count",
    oracle="""
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_type <> 'PROMO' AND p_size IN (1, 10, 20, 30, 40, 49)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
    desc="TPC-H Q16 shape: distinct suppliers per brand/size",
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) expands to a two-stage aggregate (dedup on
    (brand,size,suppkey) then count) — no partsupp, pairs via lineitem."""
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO") & F.col("p_size").isin(1, 10, 20, 30, 40, 49)
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) / 7.0, 2) AS DECIMAL(38,2)) AS DOUBLE)
           AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#11'
      AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    desc="TPC-H Q17: below-avg-quantity revenue (correlated scalar subquery)",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated AVG decorrelates to a per-part aggregate joined back
    on partkey — but only over lineitem rows whose partkey survives the
    Brand#11 filter.  Brand#11 parts are ~1/25 of part, so the broadcast
    semi-join drops ~96% of lineitem BEFORE the per-part aggregate; the
    shuffle feeding the AVG carries only relevant keys.  (Round-1 version
    aggregated the full table and discarded most of it post-join —
    VERDICT.md "What's wrong" #3.)"""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    li_b11 = li.join(
        F.broadcast(part.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    per_part_avg = li_b11.groupBy(F.col("l_partkey").alias("avg_pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li_b11.join(F.broadcast(part), li_b11.l_partkey == part.p_partkey)
        .join(per_part_avg, li_b11.l_partkey == F.col("avg_pk"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            (F.sum(dec("l_extendedprice")) / F.lit(7.0))
            .cast("decimal(38,2)").cast("double").alias("avg_yearly")
        )
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {REV2} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    desc="TPC-H Q19: disjunction of brand/size/quantity bands",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs stays one join: the disjunction references both sides so
    it evaluates post-join; per-side prunable conjuncts (brand IN ...,
    size <= 35) are inferred by Catalyst and pushed to the scans."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.sum(_revenue()).cast("decimal(38,2)").cast("double").alias("revenue"))
    )


@register(
    "q22_idle_customers",
    oracle="""
    WITH avg_bal AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS ab
                     FROM customer WHERE c_acctbal > 0.0)
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    desc="TPC-H Q22 shape: rich customers with no orders (anti join + scalar avg)",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join on custkey; the average broadcasts as a
    single-row cross join. Anti join shuffles only keys."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count("*")).alias("ab")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(dec("c_acctbal")).cast("decimal(38,2)").cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH shipped AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS value
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        WHERE s_nationkey = 3
        GROUP BY l_partkey)
    SELECT l_partkey, CAST(CAST(ROUND(value, 2) AS DECIMAL(38,2)) AS DOUBLE) AS value
    FROM shipped
    WHERE CAST(value AS DOUBLE) > (SELECT CAST(SUM(value) AS DOUBLE) * 0.001 FROM shipped)
    ORDER BY value DESC, l_partkey
    """,
    desc="TPC-H Q11 shape: parts above a fraction of national shipped value",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HAVING-fraction scalar reuses the same aggregate (Catalyst
    ReuseExchange); threshold broadcast as 1-row join."""
    li = table(spark, sf_dir, "lineitem")
    supp = F.broadcast(
        table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3)
    )
    shipped = (
        li.join(supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice") * dec("l_quantity")).alias("value"))
    )
    thresh = shipped.agg((F.sum("value").cast("double") * F.lit(0.001)).alias("cut"))
    return (
        shipped.crossJoin(F.broadcast(thresh))
        .filter(F.col("value").cast("double") > F.col("cut"))
        .select(
            "l_partkey",
            F.col("value").cast("decimal(38,2)").cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), "l_partkey")
    )


@register(
    "q12_ship_priority_class",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    desc="TPC-H Q12 shape: conditional priority counts per line class",
)
def q12_ship_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12's shipmode priority count; l_linestatus stands in for the absent
    l_shipmode, ship-year range for the absent commit/receipt window. The
    CASE runs post-join, map-side; the agg is a tiny 2-group hash.

    Scale: the date filter prunes the lineitem scan (pushed to parquet);
    the join shuffles on orderkey only for surviving rows."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q20_excess_part_suppliers",
    oracle="""
    WITH pair_qty AS (
        SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_partkey, l_suppkey),
    part_total AS (
        SELECT l_partkey, SUM(qty) AS total_qty FROM pair_qty GROUP BY l_partkey)
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT p1.l_suppkey
        FROM pair_qty p1
        JOIN part_total pt ON p1.l_partkey = pt.l_partkey
        JOIN part p ON p.p_partkey = p1.l_partkey
        WHERE p.p_name LIKE '%a%' AND p1.qty > 0.5 * pt.total_qty)
    ORDER BY s_suppkey
    """,
    desc="TPC-H Q20 shape: suppliers holding >half a part's shipped volume",
)
def q20_excess_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20's nested availqty threshold re-expressed without partsupp: a
    (part, supplier) quantity rollup compared against the per-part total —
    dominant suppliers of filtered parts, surfaced via a semi join.

    Scale: both aggregates shuffle on l_partkey (the second reuses the
    first's output — no second scan); part filter broadcasts; the final
    semi join sends only distinct suppkeys."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    pair_qty = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("qty"))
    part_total = pair_qty.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    parts = F.broadcast(
        table(spark, sf_dir, "part").filter(F.col("p_name").like("%a%")).select("p_partkey")
    )
    dominant = (
        pair_qty.join(part_total, "l_partkey")
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("qty") > 0.5 * F.col("total_qty"))
        .select("l_suppkey")
    )
    supp = table(spark, sf_dir, "supplier")
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_last_shipper",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name ORDER BY numwait DESC, s_name
    """,
    desc="TPC-H Q21 shape: sole latest shipper in multi-supplier orders",
)
def q21_last_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21's waiting-supplier pattern with l_shipdate standing in for the
    absent receipt/commit dates: EXISTS → left-semi self-join, NOT EXISTS →
    left-anti self-join, both on orderkey.

    Scale: three shuffles on l_orderkey that AQE coalesces into one
    exchange reuse; supplier is broadcast. The self-join sides carry only
    (orderkey, suppkey, shipdate) — column pruning keeps the exchange
    narrow."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders_f = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    l1 = li.alias("l1").join(orders_f, F.col("l1.l_orderkey") == F.col("o_orderkey")).select("l1.*")
    l2 = li.alias("l2")
    l3 = li.alias("l3")
    with_other = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    sole_latest = with_other.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey"))
        & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
        "left_anti",
    )
    supp = F.broadcast(table(spark, sf_dir, "supplier"))
    return (
        sole_latest.join(supp, F.col("l1.l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@register(
    "q_copurchase_pairs",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2)
    SELECT part_a, part_b, n_orders
    FROM pairs WHERE n_orders >= 2
    ORDER BY n_orders DESC, part_a, part_b
    """,
    desc="market-basket co-occurrence: part pairs ordered together ≥2 times "
    "via dedup → keyed self-join → pair counts",
)
def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: dedup to (order, part) FIRST so the self-join input is
    bounded by basket sizes; the join is keyed on l_orderkey (one shuffle)
    and pair cardinality is sum(basket^2)/2, not corpus^2."""
    li = table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count("*").alias("n_orders"))
    )
    return pairs.where(F.col("n_orders") >= 2).orderBy(
        F.desc("n_orders"), "part_a", "part_b"
    )


@register(
    "q_incremental_agg",
    oracle=f"""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           {{total}} AS total_spend
    FROM orders GROUP BY o_custkey ORDER BY o_custkey
    """.format(total=(
        "CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) "
        "AS DECIMAL(38,2)) AS DOUBLE)"
    )),
    desc="incremental view maintenance: per-batch partial aggregates merged "
    "by monoid == one-shot full aggregation (the oracle computes the "
    "full recompute; the Spark side merges two incremental batches)",
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream-table duality check: state(old ⊕ new) == agg(all).
    Scale: each delta merge shuffles only delta keys + their state rows."""
    from gearpump_spark.operators.physical import merge_aggregate_state
    from gearpump_spark.queries._util import dec, out_double

    orders = table(spark, sf_dir, "orders")
    # static deterministic batch split (~80/20 by key residue) — keeps the
    # registered query ONE plan with no driver-side collect (r2 verdict
    # "What's wrong" #3); ANY partition demonstrates the monoid identity
    split = F.col("o_orderkey") % 5 < 4

    def partial(df):
        return df.groupBy("o_custkey").agg(
            F.count("*").alias("n_orders"),
            F.sum(dec("o_totalprice")).alias("total_spend"),
        )

    old = partial(orders.where(split))
    new = partial(orders.where(~split))
    merged = merge_aggregate_state(
        old, new, ["o_custkey"], {"n_orders": "sum", "total_spend": "sum"}
    )
    return merged.select(
        "o_custkey",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        out_double(F.col("total_spend")).alias("total_spend"),
    ).orderBy("o_custkey")
