"""Decision-support query shapes (TPC-H Q2/Q4/Q6/Q7/Q8/Q9/Q11/Q12/Q13/
Q15/Q16/Q17/Q18/Q19/Q20/Q21/Q22 families; Q14 lives in
``workloads_ext.q_promo_revenue`` — with Q9, every one of the 22 TPC-H
query families is now represented across the workload modules) that the
round-1 workload did not yet cover, each
oracle-paired. Shapes needing columns the dataset lacks are
adapted: partsupp is derived from distinct lineitem (part, supplier)
pairs, and Q4/Q21 lateness uses shipdate-vs-orderdate (no
commit/receipt dates).

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


def q_priority_order_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders in one quarter having
    at least one "late" line (shipped >60 days after the order date; the
    dataset has no commit/receipt dates, so lateness is adapted to
    shipdate-vs-orderdate). The EXISTS becomes a LEFT SEMI join: the date
    window prunes the orders scan (pushed filter), the semi join carries
    the non-equi lateness test as a residual on the orderkey equi-join,
    and emits each order at most once — no post-join distinct needed."""
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1996-04-01"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "leftsemi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_PRIORITY_EXISTS_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue delta from a what-if discount change — a
    pure scan-side query. All three predicates (ship year, discount band,
    quantity cap) push to the parquet scan (`PushedFilters` carries them;
    row groups outside the year are skipped on footer stats), only two
    columns are read, and the aggregate is a one-row map-side combine:
    the canonical "scan, don't shuffle" plan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * F.col("l_discount").cast("decimal(4,2)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n"),
        )
    )


_FORECAST_REVENUE_ORACLE = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE)
         AS revenue,
       count(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
"""


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier-nation's share of ECONOMY-part revenue
    sold into ASIA, per order year. Six-way join in one pass over
    lineitem; nation/region lookups are broadcast; the share is a
    conditional-sum ratio computed inside the same (year) aggregate, so
    numerator and denominator never require a second scan. Division
    happens once per output row on exact decimal sums cast to double —
    identical on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n_cust = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_cnk"), F.col("n_regionkey").alias("_crk")
    )
    region = _t(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    ).select("r_regionkey")
    n_supp = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    rev = _dec_revenue()
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n_cust), customer.c_nationkey == F.col("_cnk"))
        .join(F.broadcast(region), F.col("_crk") == F.col("r_regionkey"))
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n_supp), supplier.s_nationkey == F.col("_snk"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(
                        F.lit(0).cast("decimal(18,2)")
                    )
                ).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


_MARKET_SHARE_ORACLE = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(
         CAST(sum(CASE WHEN n2.n_name = 'NATION_2'
                  THEN CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(4,2)))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE),
         4) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY o_year
ORDER BY o_year
"""


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue over one
    quarter. The per-supplier aggregate is computed once; its one-row max
    is broadcast back as the filter threshold (no window over a global
    ORDER BY — that would single-partition; no second scan of lineitem).
    Equality is tested on exact decimals, so ties are reported exactly as
    the spec demands."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(_dec_revenue()).alias("_rev")
    )
    best = per_supp.agg(F.max("_rev").alias("_best"))
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_supp.join(F.broadcast(best))
        .filter(F.col("_rev") == F.col("_best"))
        .join(supplier, F.col("l_suppkey") == supplier.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("_rev"), 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


_TOP_SUPPLIER_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(round(rev, 2) AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE rev = (SELECT max(rev) FROM revenue)
ORDER BY s_suppkey
"""


def q_supplier_cnt_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many suppliers can provide each part profile.
    The part↔supplier relationship is derived from lineitem (the dataset
    has no partsupp): a distinct (partkey, suppkey) projection — one
    shuffle on a pair key that is near-uniform by construction. Suppliers
    in deficit (negative balance — the stand-in for Q16's complaints
    filter) are removed with a broadcast anti-join BEFORE the distinct, so
    excluded rows never pay the shuffle. count(DISTINCT) then reuses the
    same grouping columns."""
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"),
              "leftanti")
        .distinct()
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        pairs.join(part, pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


_SUPPLIER_CNT_ORACLE = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
      WHERE l_suppkey NOT IN
        (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 14, 19, 23, 36, 45, 49)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each mid-size STANDARD part, the EUROPE
    supplier(s) offering it at minimum cost. Cost is the cheapest observed
    line price per (part, supplier) (no partsupp table). The correlated
    MIN subquery becomes a per-part window over the (part, supplier)
    aggregate — ONE lineitem scan and two hash exchanges, where the
    aggregate+join-back formulation re-evaluated the whole offers
    subtree on both join sides (two scans, five exchanges; plan-pinned
    in test_min_cost_supplier_reuses_partkey_shuffle). Never a per-part
    loop, never a window over a global sort. Part/nation/region prune
    early; only true dims are broadcast."""
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("_price"),
    )
    offers = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("_price").alias("_cost"))
    )
    # Correlated MIN as a PER-PART window over the offers aggregate, not
    # a second aggregate + equality join back: the join-back formulation
    # evaluates the whole offers subtree twice (two lineitem scans, five
    # hash exchanges — no exchange reuse across the self-join), where
    # the window costs one extra l_partkey exchange over single-computed
    # offers. Partitioned by part — never a global-order window.
    from pyspark.sql.window import Window

    cheapest_w = Window.partitionBy("l_partkey")
    best = offers.withColumn("_min_cost", F.min("_cost").over(cheapest_w)).filter(
        F.col("_cost") == F.col("_min_cost")
    )
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = (
        _t(spark, sf_dir, "region")
        .filter(F.col("r_name") == "EUROPE")
        .select("r_regionkey")
    )
    return (
        best.join(supplier, best.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            F.col("_cost").cast("double").alias("min_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


_MIN_COST_ORACLE = """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey,
       CAST(cost AS DOUBLE) AS min_cost
FROM offers
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
WHERE cost = (SELECT min(cost) FROM offers o2
              WHERE o2.l_partkey = offers.l_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three brand/size/quantity
    conjunct blocks. The part-only disjuncts are pre-filtered onto the
    part scan (brand IN + size cap — what Q19 expects the optimizer to
    infer) and the lineitem-only envelope (quantity ≤ 30) onto the
    lineitem scan, so both sides prune before the equi-join; the full
    disjunction remains as the post-join residual for exactness."""
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3")
        & (F.col("p_size") >= 1)
    ).select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    b = F.col("p_brand")
    s = F.col("p_size")
    q = F.col("l_quantity")
    blocks = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#3") & s.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(blocks)
        .agg(
            F.round(F.sum(_dec_revenue()), 2).cast("double").alias("revenue"),
            F.count("*").alias("n"),
        )
    )


_DISJUNCTIVE_ORACLE = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
         AS revenue,
       count(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def q_lone_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone held up a multi-supplier
    order (shipped >90 days after the order date while every co-supplier
    shipped on time; adapted to shipdate — no receipt/commit dates). Q21's
    EXISTS / NOT EXISTS self-join pair is folded into ONE pass: per
    (orderkey, suppkey) a late flag, then the per-order supplier/late
    counts as WINDOW aggregates over the orderkey partition — lineitem is
    scanned once and never self-joined, and the window key is the
    high-cardinality orderkey so there is no hot partition. The culprit
    rows are those with ≥2 suppliers and exactly one late one."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey",
                                              "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    flagged = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
                ).cast("int")
            ).alias("is_late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        flagged.withColumn("n_supp", F.count("*").over(w))
        .withColumn("n_late", F.sum("is_late").over(w))
        .filter(
            (F.col("is_late") == 1)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late") == 1)
        )
        .join(supplier, flagged.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


_LONE_LATE_ORACLE = """
WITH flagged AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
             THEN 1 ELSE 0 END) AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey, l_suppkey
), per_order AS (
  SELECT l_orderkey AS ok, count(*) AS n_supp, sum(is_late) AS n_late
  FROM flagged GROUP BY l_orderkey
)
SELECT s_name, count(*) AS numwait
FROM flagged
JOIN per_order ON l_orderkey = ok
JOIN supplier ON l_suppkey = s_suppkey
WHERE is_late = 1 AND n_supp >= 2 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per-nation, per-year profit on parts whose name
    matches a pattern. The dataset has no partsupp, so unit cost is
    proxied as 60% of ``p_retailprice`` (exact DECIMAL math — the join
    shape, not the cost model, is what Q9 exercises).

    Plan shape: one pass over lineitem; the name-filtered part slice
    prunes lineitem early (join order puts the selective part join
    first), supplier joins on suppkey with no hint (SF-proportional —
    AQE decides), nation is a broadcast dim, and orders contributes only
    the year. Aggregation is a map-side-combinable decimal sum on
    (nation, year) — 25×7 groups, no skew."""
    li = _t(spark, sf_dir, "lineitem")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    cost = (
        F.col("p_retailprice").cast("decimal(18,2)")
        * F.lit("0.6").cast("decimal(2,1)")
        * F.col("l_quantity").cast("decimal(9,0)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", "o_year")
        .agg(
            F.round(F.sum(_dec_revenue() - cost), 2)
            .cast("double")
            .alias("profit")
        )
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


_PRODUCT_PROFIT_ORACLE = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(round(sum(
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(4,2)))
         - CAST(p_retailprice AS DECIMAL(18,2))
           * CAST(0.6 AS DECIMAL(2,1))
           * CAST(l_quantity AS DECIMAL(9,0))
       ), 2) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY n_name, o_year
ORDER BY n_name ASC, o_year DESC
"""


def q_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who shipped a large
    volume (>100 units across a year) of some PROMO part — the chained
    semi-join query (supplier ← IN ← per-(supp,part) HAVING ← IN ←
    part filter). Each IN becomes a LEFT SEMI join; the part filter and
    ship-year window prune their scans; the per-(supp,part) aggregate
    shrinks lineitem before any supplier data moves. Only the nation
    lookup is broadcast."""
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    heavy = (
        li.join(part, li.l_partkey == part.p_partkey, "leftsemi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 100)
        .select("l_suppkey")
        .distinct()
    )
    supplier = _t(spark, sf_dir, "supplier")
    nation = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    return (
        supplier.join(heavy, supplier.s_suppkey == heavy.l_suppkey, "leftsemi")
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select("s_name", F.col("s_acctbal").alias("acctbal"))
        .orderBy("s_name")
    )


_EXCESS_SHIPPERS_ORACLE = """
SELECT s_name, s_acctbal AS acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 100)
ORDER BY s_name
"""


def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality suite (operators/quality): null
    fraction, key uniqueness, value range, accepted set — ALL compiled
    into one aggregation scan per table — plus referential integrity
    (orders→customer, lineitem→orders) as left-anti-join orphan
    fractions. The publish gate a lake pipeline runs before exposing a
    table; the report frame is the artifact."""
    from egal_yet_another_earthquake_project_spark.operators import quality as dq

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    lineitem = _t(spark, sf_dir, "lineitem")
    o_checks = dq.run_checks(
        orders,
        [
            dq.not_null("o_orderkey"),
            dq.not_null("o_custkey"),
            dq.unique("o_orderkey"),
            dq.in_range("o_totalprice", 0, 600000),
            dq.accepted_values("o_orderstatus", ("F", "O", "P")),
        ],
    )
    l_checks = dq.run_checks(
        lineitem,
        [
            dq.not_null("l_orderkey"),
            dq.in_range("l_discount", 0, 0.1),
            dq.in_range("l_quantity", 1, 50),
        ],
    )
    fk1 = dq.fk_check(orders, "o_custkey", customer, "c_custkey")
    fk2 = dq.fk_check(lineitem, "l_orderkey", orders, "o_orderkey")
    return (
        o_checks.unionByName(fk1)
        .unionByName(l_checks)
        .unionByName(fk2)
        .orderBy("check_name")
    )


_DQ_REPORT_ORACLE = """
WITH o AS (
  SELECT 'not_null(o_orderkey)' AS check_name,
         avg(CAST(o_orderkey IS NULL AS DOUBLE)) AS metric, 0.0 AS threshold
  FROM orders
  UNION ALL
  SELECT 'not_null(o_custkey)',
         avg(CAST(o_custkey IS NULL AS DOUBLE)), 0.0 FROM orders
  UNION ALL
  SELECT 'unique(o_orderkey)',
         1.0 - CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(o_orderkey), 0.0
  FROM orders
  UNION ALL
  SELECT 'in_range(o_totalprice,0,600000)',
         avg(CAST(o_totalprice IS NOT NULL
                  AND o_totalprice NOT BETWEEN 0 AND 600000 AS DOUBLE)), 0.0
  FROM orders
  UNION ALL
  SELECT 'accepted_values(o_orderstatus)',
         avg(CAST(o_orderstatus IS NOT NULL
                  AND o_orderstatus NOT IN ('F','O','P') AS DOUBLE)), 0.0
  FROM orders
  UNION ALL
  SELECT 'fk(o_custkey)',
         CAST((SELECT count(*) FROM orders x
               WHERE x.o_custkey IS NOT NULL
                 AND NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = x.o_custkey)) AS DOUBLE)
           / (SELECT count(*) FROM orders), 0.0
  UNION ALL
  SELECT 'not_null(l_orderkey)',
         avg(CAST(l_orderkey IS NULL AS DOUBLE)), 0.0 FROM lineitem
  UNION ALL
  SELECT 'in_range(l_discount,0,0.1)',
         avg(CAST(l_discount IS NOT NULL
                  AND l_discount NOT BETWEEN 0 AND 0.1 AS DOUBLE)), 0.0
  FROM lineitem
  UNION ALL
  SELECT 'in_range(l_quantity,1,50)',
         avg(CAST(l_quantity IS NOT NULL
                  AND l_quantity NOT BETWEEN 1 AND 50 AS DOUBLE)), 0.0
  FROM lineitem
  UNION ALL
  SELECT 'fk(l_orderkey)',
         CAST((SELECT count(*) FROM lineitem x
               WHERE x.l_orderkey IS NOT NULL
                 AND NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_orderkey = x.l_orderkey)) AS DOUBLE)
           / (SELECT count(*) FROM lineitem), 0.0
)
SELECT check_name, round(metric, 6) AS metric,
       CAST(threshold AS DOUBLE) AS threshold,
       metric <= threshold AS passed
FROM o ORDER BY check_name
"""


QUERIES = {
    "order_count_distribution": q_order_count_distribution,
    "large_orders": q_large_orders,
    "small_quantity_revenue": q_small_quantity_revenue,
    "top_parts_by_value": q_top_parts_by_value,
    "returnflag_priority": q_returnflag_priority,
    "nation_trade_volume": q_nation_trade_volume,
    "acctbal_opportunity": q_acctbal_opportunity,
    "priority_order_exists": q_priority_order_exists,
    "forecast_revenue": q_forecast_revenue,
    "market_share": q_market_share,
    "top_supplier": q_top_supplier,
    "supplier_cnt_by_part": q_supplier_cnt_by_part,
    "min_cost_supplier": q_min_cost_supplier,
    "disjunctive_revenue": q_disjunctive_revenue,
    "lone_late_supplier": q_lone_late_supplier,
    "excess_shippers": q_excess_shippers,
    "product_profit": q_product_profit,
    "dq_report": q_dq_report,
}

ORACLES = {
    "order_count_distribution": _ORDER_COUNT_DIST_ORACLE,
    "large_orders": _LARGE_ORDERS_ORACLE,
    "small_quantity_revenue": _SMALL_QTY_ORACLE,
    "top_parts_by_value": _TOP_PARTS_ORACLE,
    "returnflag_priority": _RETURNFLAG_PRIORITY_ORACLE,
    "nation_trade_volume": _NATION_TRADE_ORACLE,
    "acctbal_opportunity": _ACCTBAL_ORACLE,
    "priority_order_exists": _PRIORITY_EXISTS_ORACLE,
    "forecast_revenue": _FORECAST_REVENUE_ORACLE,
    "market_share": _MARKET_SHARE_ORACLE,
    "top_supplier": _TOP_SUPPLIER_ORACLE,
    "supplier_cnt_by_part": _SUPPLIER_CNT_ORACLE,
    "min_cost_supplier": _MIN_COST_ORACLE,
    "disjunctive_revenue": _DISJUNCTIVE_ORACLE,
    "lone_late_supplier": _LONE_LATE_ORACLE,
    "excess_shippers": _EXCESS_SHIPPERS_ORACLE,
    "product_profit": _PRODUCT_PROFIT_ORACLE,
    "dq_report": _DQ_REPORT_ORACLE,
}
