"""Decision-support query shapes (TPC-H Q7/Q11/Q12/Q13/Q17/Q18/Q22
families) the round-1 workload did not yet cover, each oracle-paired.

These exist to widen *plan-shape* coverage beyond the reference's own
queries (SURVEY §2.3-§2.6 derive equi-joins, group-counts, and top-k from
`/root/reference/sparktoELKstream.py`; a user switching engines will also
run the standard warehouse shapes): left-outer count distributions,
HAVING over a grouped aggregate joined back to facts, correlated per-group
averages, global-scalar thresholds, and scalar + anti-join combinations.

Scale rules applied throughout:

- Money math routes through DECIMAL (exact, partition-order-free), cast
  to double only at the output edge.
- Threshold comparisons against an average are expressed multiplicatively
  (``2 * qty * cnt < sum`` instead of ``qty < 0.5 * sum/cnt``) so both
  engines compare exact decimals and no division-rounding can flip a
  boundary row.
- Only true dims (nation, the one-row global aggregates) are broadcast;
  every SF-proportional table (customer, supplier, part, the per-order
  aggregate) goes through a shuffle join AQE can re-plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.sources.files import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _dec_revenue() -> F.Column:
    """Exact line revenue: extendedprice * (1 - discount) in DECIMAL."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(3,0)") - F.col("l_discount").cast("decimal(4,2)")
    )


def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts, with the
    order predicate folded into the LEFT JOIN condition (so zero-order
    customers survive with count 0). Two-level aggregation: the first
    groupBy shuffles on c_custkey; the second operates on a customers-sized
    frame of (custkey, count) pairs and AQE coalesces it."""
    customer = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey",
                                                "o_orderpriority")
    joined = customer.join(
        orders,
        (customer.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != "1-URGENT"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_ORDER_COUNT_DIST_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 300, joined
    back to orders + customer for the report. The HAVING aggregate shrinks
    lineitem to a tiny (orderkey, sum) frame *before* the joins — AQE sees
    its true size at runtime and broadcasts it, so the big fact is scanned
    once and never re-shuffled."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


_LARGE_ORDERS_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 300) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue of lineitems whose quantity is below half
    the per-part average. The correlated scalar subquery becomes a grouped
    aggregate joined back on l_partkey (one shuffle each side, same key —
    Spark reuses the exchange). The sub-average test is multiplicative
    (2*qty*cnt < sum) so the comparison is exact decimal arithmetic on
    both engines, immune to division rounding at the boundary."""
    li = _t(spark, sf_dir, "lineitem")
    qty_dec = F.col("l_quantity").cast("decimal(18,2)")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(qty_dec).alias("_sq"), F.count("*").alias("_cnt")
    ).withColumnRenamed("l_partkey", "_pk")
    matched = li.join(per_part, li.l_partkey == F.col("_pk")).filter(
        qty_dec * F.lit(2) * F.col("_cnt") < F.col("_sq")
    )
    return matched.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / 7.0,
            2,
        ).alias("avg_yearly"),
        F.count("*").alias("n"),
    )


_SMALL_QTY_ORACLE = """
WITH per_part AS (
  SELECT l_partkey AS pk,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
         count(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0,
             2) AS avg_yearly,
       count(*) AS n
FROM lineitem JOIN per_part ON l_partkey = pk
WHERE CAST(l_quantity AS DECIMAL(18,2)) * 2 * cnt < sq
"""


def q_top_parts_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue exceeds a fraction (0.02%) of
    total revenue. The global total is a one-row aggregate broadcast into
    the filter (no second scan of the per-part frame); the threshold test
    is multiplicative (val*5000 > total) to stay in exact decimals."""
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(F.sum(_dec_revenue()).alias("_val"))
    total = per_part.agg(F.sum("_val").alias("_tot"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("_val") * 5000 > F.col("_tot"))
        .select(
            "l_partkey",
            # round the DECIMAL first (exact HALF_UP both engines), THEN
            # cast — round-after-cast diverges on .xx5 values that are not
            # exactly representable as doubles.
            F.round(F.col("_val"), 2).cast("double").alias("value"),
        )
        .orderBy(F.col("value").desc(), F.col("l_partkey"))
    )


_TOP_PARTS_ORACLE = """
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS val
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(round(val, 2) AS DOUBLE) AS value
FROM per_part
WHERE val * 5000 > (SELECT sum(val) FROM per_part)
ORDER BY value DESC, l_partkey
"""


def q_returnflag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: high/low-priority line counts per return flag —
    conditional aggregation over the orders ⋈ lineitem join, both counts
    in one pass (no second scan, no second shuffle)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


_RETURNFLAG_PRIORITY_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between customer-nation and
    supplier-nation pairs by ship year. Five-way join where only the two
    nation lookups are broadcast; lineitem flows through exactly one
    scan, and the (pair, year) aggregate is KBs regardless of input size.
    Pairs are deduped by requiring cust_nation < supp_nation."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), customer.c_nationkey == F.col("_ck"))
        .join(F.broadcast(n2), supplier.s_nationkey == F.col("_sk"))
        .filter(F.col("cust_nation") < F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_dec_revenue()), 2).cast("double").alias("volume"))
        .orderBy("cust_nation", "supp_nation", "l_year")
    )


_NATION_TRADE_ORACLE = """
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
         AS volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE n1.n_name < n2.n_name
GROUP BY cust_nation, supp_nation, l_year
ORDER BY cust_nation, supp_nation, l_year
"""


def q_acctbal_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance and
    no urgent order, grouped by nation. Combines a global-scalar threshold
    (broadcast one-row aggregate, multiplicative comparison bal*cnt > sum)
    with an anti-join whose probe-side filter is pushed to the orders
    scan."""
    customer = _t(spark, sf_dir, "customer")
    bal_dec = F.col("c_acctbal").cast("decimal(18,2)")
    pos = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(bal_dec).alias("_s"), F.count("*").alias("_cnt")
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        customer.join(F.broadcast(pos))
        .filter(bal_dec * F.col("_cnt") > F.col("_s"))
        .join(urgent, customer.c_custkey == urgent.o_custkey, "leftanti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(bal_dec), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


_ACCTBAL_ORACLE = """
WITH pos AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s, count(*) AS cnt
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, count(*) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS totacctbal
FROM customer, pos
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cnt > s
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


QUERIES = {
    "order_count_distribution": q_order_count_distribution,
    "large_orders": q_large_orders,
    "small_quantity_revenue": q_small_quantity_revenue,
    "top_parts_by_value": q_top_parts_by_value,
    "returnflag_priority": q_returnflag_priority,
    "nation_trade_volume": q_nation_trade_volume,
    "acctbal_opportunity": q_acctbal_opportunity,
}

ORACLES = {
    "order_count_distribution": _ORDER_COUNT_DIST_ORACLE,
    "large_orders": _LARGE_ORDERS_ORACLE,
    "small_quantity_revenue": _SMALL_QTY_ORACLE,
    "top_parts_by_value": _TOP_PARTS_ORACLE,
    "returnflag_priority": _RETURNFLAG_PRIORITY_ORACLE,
    "nation_trade_volume": _NATION_TRADE_ORACLE,
    "acctbal_opportunity": _ACCTBAL_ORACLE,
}
