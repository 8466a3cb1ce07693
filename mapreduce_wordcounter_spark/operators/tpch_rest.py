"""The remaining TPC-H query shapes (Q2, Q8, Q9, Q11, Q12, Q15, Q16,
Q20, Q21, Q22) — completing all 22 shapes alongside relational.py's set.

The driver corpus (TESTDATA.md) has no ``partsupp`` table and lineitem
lacks shipmode/commitdate/receiptdate, so the five partsupp-dependent
queries derive their part-supplier cost/quantity relation from lineitem
itself (per-pair MIN unit price stands in for ps_supplycost, per-pair
shipped quantity for ps_availqty) and Q12's shipmode becomes the
ship-delay class. Every adaptation preserves the query's *shape* — the
thing Catalyst has to plan correctly: Q2's decorrelated per-group MIN
join-back, Q8's conditional-share aggregation, Q9's profit expression
over a derived cost, Q11's HAVING-over-global-scalar, Q15's
MAX-scalar equality, Q16's NOT-IN + count-distinct, Q20's two-level
quantity threshold semi-join, Q21's EXISTS/NOT-EXISTS double
correlation, Q22's scalar-average + anti-join.

Reference parity: the reference (main.go:115-171) has one hard-coded
aggregation; this module is pure additional engine surface mandated by
SURVEY.md §2.3's "relational breadth" line.

Determinism: every float aggregate goes through the micro-unit
quantization of functions/numeric.py (exact BIGINT sums on both
engines); ratios/averages divide two exact integers in double space
(one correctly-rounded IEEE op, identical everywhere). Threshold
comparisons (Q11, Q20, Q22) are pure BIGINT inequalities — no float
threshold crosses an engine boundary. Overflow headroom is documented
per query; all bounds hold to sf ≥ 1 and the 100 TB posture swaps
BIGINT micro-units for DECIMAL(38,6) as numeric.py documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_wordcounter_spark.functions.numeric import (
    SCALE,
    dsum,
    quantize,
    sql_dsum,
)
from mapreduce_wordcounter_spark.registry import query
from mapreduce_wordcounter_spark.tables import load_table

_t = load_table

# Shared oracle fragment: the lineitem-derived part-supplier cost
# relation (micro-unit MIN unit price per (part, supplier) pair).
_SQL_PS_COST = """
    SELECT l_partkey, l_suppkey,
           MIN(CAST(FLOOR(l_extendedprice / l_quantity * 1000000.0 + 0.5)
                    AS BIGINT)) AS cost_micro
    FROM lineitem GROUP BY l_partkey, l_suppkey
"""


def _ps_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem-derived (part, supplier, cost_micro): the partsupp
    stand-in. One shuffle on (l_partkey, l_suppkey) — a uniform
    composite key, no skew; at 100 TB this is the same profile as any
    pair-grain aggregate (map-side combine shrinks it to one row per
    pair per task before the exchange)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(quantize(F.col("l_extendedprice") / F.col("l_quantity"))).alias(
            "cost_micro"
        )
    )


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH ps AS ({_SQL_PS_COST}),
    eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'),
    pp AS (SELECT p_partkey, p_name FROM part
           WHERE p_size <= 10 AND p_type = 'STANDARD'),
    el AS (
        SELECT ps.l_partkey, ps.cost_micro,
               eu.s_suppkey, eu.s_name, eu.s_acctbal, eu.n_name, pp.p_name
        FROM ps
        JOIN pp ON ps.l_partkey = pp.p_partkey
        JOIN eu ON ps.l_suppkey = eu.s_suppkey),
    mc AS (SELECT l_partkey, MIN(cost_micro) AS min_cost_micro
           FROM el GROUP BY l_partkey)
    SELECT el.s_acctbal, el.s_name, el.n_name,
           el.l_partkey AS p_partkey, el.p_name,
           CAST(el.cost_micro AS DOUBLE) / 1000000.0 AS supply_cost
    FROM el JOIN mc ON el.l_partkey = mc.l_partkey
                   AND el.cost_micro = mc.min_cost_micro
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each qualifying part,
    the EUROPE supplier(s) achieving the minimum supply cost. The
    correlated ``cost = (SELECT MIN ...)`` decorrelates into a per-part
    MIN over the already-filtered eligible relation joined back on
    (partkey, cost) equality — the same rewrite Catalyst performs for
    correlated scalars, written explicitly so the plan is pinned.

    Scale: nation/region dims broadcast; the part filter (size+type,
    ~0.3% selectivity) and supplier-region join shuffle on their keys
    with AQE free to broadcast at small scale. The min-cost join-back
    reuses the partkey partitioning of the per-part MIN — one effective
    exchange for the whole decorrelation."""
    ps = _ps_cost(spark, sf_dir)
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pp = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_name")
    )
    el = (
        ps.join(pp, ps.l_partkey == pp.p_partkey)
        .join(eu, ps.l_suppkey == eu.s_suppkey)
        .select("l_partkey", "cost_micro", "s_name", "s_acctbal", "n_name", "p_name")
    )
    mc = el.groupBy("l_partkey").agg(F.min("cost_micro").alias("min_cost_micro"))
    mc = mc.select(F.col("l_partkey").alias("mk"), "min_cost_micro")
    return (
        el.join(
            mc,
            (F.col("l_partkey") == F.col("mk"))
            & (F.col("cost_micro") == F.col("min_cost_micro")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            (F.col("cost_micro").cast("double") / SCALE).alias("supply_cost"),
        )
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume_micro
                         ELSE 0 END) AS DOUBLE)
               / CAST(SUM(volume_micro) AS DOUBLE) AS mkt_share
    FROM (
        SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
               CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 1000000.0
                          + 0.5) AS BIGINT) AS volume_micro,
               ns.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        JOIN region r ON nc.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    ) v
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): NATION_3's share of the
    ASIA-customer ECONOMY-part volume, by order year. The share is a
    conditional sum over the SAME grouped relation — one aggregation,
    no self-join — and divides two exact micro-unit BIGINTs in double
    space (single correctly-rounded IEEE division, engine-exact;
    int64 micro-volume sums stay < 2^63 to sf ≥ 1, numeric.py).

    Scale: the seven-table join keeps every dimension broadcast
    (nation ×2, region, and the type-filtered part list) so the only
    shuffles are lineitem⋈orders and orders⋈customer on their natural
    keys; year-grain aggregation is ~7 output rows."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select(F.col("n_nationkey").alias("c_nk"))
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ns = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(asia_nations), c.c_nationkey == F.col("c_nk"))
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == F.col("s_nk"))
    )
    v = joined.select(
        F.year("o_orderdate").cast("long").alias("o_year"),
        quantize(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "volume_micro"
        ),
        "supp_nation",
    )
    return v.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume_micro"))
                .otherwise(F.lit(0))
            ).cast("double")
            / F.sum("volume_micro").cast("double")
        ).alias("mkt_share")
    )


@query(
    "q9_product_profit",
    oracle=f"""
    WITH rc AS (
        SELECT l_partkey,
               MIN(CAST(FLOOR(l_extendedprice / l_quantity * 1000000.0 + 0.5)
                        AS BIGINT)) AS rc_micro
        FROM lineitem GROUP BY l_partkey)
    SELECT nation, o_year, {sql_dsum('profit', 'sum_profit')}
    FROM (
        SELECT n.n_name AS nation,
               EXTRACT(YEAR FROM l.l_shipdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount)
                   - CAST(rc.rc_micro AS DOUBLE) / 1000000.0 * l.l_quantity
                   AS profit
        FROM lineitem l
        JOIN rc ON l.l_partkey = rc.l_partkey
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
    ) t
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year). With no
    partsupp, the reference cost is the corpus-wide minimum unit price
    per part (micro-quantized so it is the SAME exact integer on both
    engines); profit = revenue − ref_cost·quantity is then a fixed
    sequence of correctly-rounded IEEE double ops, and the final sum
    re-quantizes — order-independent on both engines.

    Scale: rc is part-cardinality — deliberately NOT broadcast (at
    100 TB it is hundreds of millions of rows; the join shuffles on
    partkey, the same key the aggregate just produced, so AQE coalesces
    the exchange). Supplier join shuffles on suppkey; nation
    broadcasts. Identical posture to relational.py's q17."""
    li = _t(spark, sf_dir, "lineitem")
    rc = li.groupBy("l_partkey").agg(
        F.min(quantize(F.col("l_extendedprice") / F.col("l_quantity"))).alias(
            "rc_micro"
        )
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    t = (
        li.join(rc, "l_partkey")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.col("rc_micro").cast("double") / SCALE * F.col("l_quantity")
            ).alias("profit"),
        )
    )
    return t.groupBy("nation", "o_year").agg(dsum(F.col("profit"), "sum_profit"))


@query(
    "q11_important_stock",
    oracle="""
    WITH nat AS (
        SELECT s_suppkey FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_7'),
    pv AS (
        SELECT l.l_partkey,
               SUM(CAST(FLOOR(l.l_extendedprice * 1000000.0 + 0.5) AS BIGINT))
                   AS value_micro
        FROM lineitem l JOIN nat ON l.l_suppkey = nat.s_suppkey
        GROUP BY l.l_partkey),
    tot AS (SELECT SUM(value_micro) AS total_micro FROM pv)
    SELECT pv.l_partkey,
           CAST(pv.value_micro AS DOUBLE) / 1000000.0 AS value
    FROM pv, tot
    WHERE pv.value_micro * 1000 > tot.total_micro
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part inventory value for
    one nation's suppliers, HAVING value above a fraction (0.1%) of
    that nation's total — the scalar-subquery-in-HAVING shape. The
    threshold compares ``value_micro * 1000 > total_micro`` in pure
    BIGINT (headroom: total nation micro-value ×1000 < 2^63 up to
    sf ≈ 10; no float threshold near an engine boundary).

    Scale: one shuffle on partkey for the per-part sum; the global
    total is a 1-row scalar broadcast back (whitelisted bounded BNLJ,
    same as relational.py's scalar_subquery)."""
    nat = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    pv = (
        li.join(nat, li.l_suppkey == nat.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(quantize(F.col("l_extendedprice"))).alias("value_micro"))
    )
    tot = pv.agg(F.sum("value_micro").alias("total_micro"))
    return (
        pv.join(F.broadcast(tot))
        .filter(F.col("value_micro") * 1000 > F.col("total_micro"))
        .select(
            "l_partkey",
            (F.col("value_micro").cast("double") / SCALE).alias("value"),
        )
    )


@query(
    "q12_ship_priority_classes",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY
    GROUP BY l.l_linestatus
    """,
)
def q12_ship_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / priority classes): with no
    l_shipmode column, the class key is l_linestatus and "late" is a
    ship-delay predicate (shipped ≥ 90 days after order). The
    conditional dual count over one join is the Q12 signature; counts
    are exact integers.

    Scale: single lineitem⋈orders shuffle on orderkey; the non-equi
    delay predicate is a post-join filter on already-matched rows (not
    a join condition), so the join stays hash/sort-merge."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linestatus", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0
                              + 0.5) AS BIGINT)) AS rev_micro
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey),
    mx AS (SELECT MAX(rev_micro) AS max_micro FROM rev)
    SELECT s.s_suppkey, s.s_name,
           CAST(rev.rev_micro AS DOUBLE) / 1000000.0 AS total_revenue
    FROM rev, mx, supplier s
    WHERE rev.l_suppkey = s.s_suppkey
      AND rev.rev_micro = mx.max_micro
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    keep the supplier(s) equal to the global MAX — the view + scalar
    MAX equality shape. Revenue is an exact micro-unit BIGINT so the
    MAX-equality never hinges on a float ulp.

    Scale: one shuffle on suppkey (map-side combined); the MAX is a
    1-row scalar broadcast (whitelisted bounded BNLJ); supplier join
    broadcasts the surviving ~1-row left side under AQE."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(quantize(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "rev_micro"
        )
    )
    mx = rev.agg(F.max("rev_micro").alias("max_micro"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("rev_micro") == F.col("max_micro"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_micro").cast("double") / SCALE).alias("total_revenue"),
        )
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON ps.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND ps.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier counts by part attributes): distinct
    part-supplier pairs from lineitem (the partsupp stand-in), a
    triple-attribute part filter, a NOT IN supplier exclusion
    (negative balance as the "complaints" analog — s_suppkey is
    non-null so NOT IN ≡ anti join), then COUNT(DISTINCT supplier).

    Scale: the pair-distinct and the count-distinct both shuffle on
    composite keys that Spark plans as expand+two-phase aggregates;
    the excluded-supplier list is broadcast-sized (a filter over the
    smallest fact table) and planned as a broadcast anti join."""
    pairs = (
        _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_dominant_shippers",
    oracle="""
    WITH q AS (
        SELECT l.l_suppkey, l.l_partkey,
               SUM(CAST(FLOOR(l.l_quantity * 1000000.0 + 0.5) AS BIGINT))
                   AS qty_micro
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#3'
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey, l.l_partkey),
    pt AS (SELECT l_partkey, SUM(qty_micro) AS total_micro
           FROM q GROUP BY l_partkey)
    SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
    FROM q
    JOIN pt ON q.l_partkey = pt.l_partkey
    JOIN supplier s ON q.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE q.qty_micro * 2 > pt.total_micro
    """,
)
def q20_dominant_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers who
    shipped more than half of a target part family's 1996 volume —
    the two-level quantity aggregate (per pair, then per part)
    compared as a threshold, then a semi-join up to supplier/nation.
    ``qty_micro * 2 > total_micro`` is pure BIGINT.

    Scale: pair-grain then part-grain aggregates reuse the partkey
    partitioning (AQE coalesces the second exchange); the brand filter
    prunes lineitem BEFORE the first shuffle via the broadcast part
    list; DISTINCT is supplier-cardinality, trivially small."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    q = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(quantize(F.col("l_quantity"))).alias("qty_micro"))
    )
    pt = q.groupBy("l_partkey").agg(F.sum("qty_micro").alias("total_micro"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        q.join(pt, "l_partkey")
        .filter(F.col("qty_micro") * 2 > F.col("total_micro"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )


@query(
    "q21_waiting_orders",
    oracle="""
    SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders o ON l1.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_5'
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    EXISTS / NOT EXISTS double correlation. A NATION_5 supplier's
    returned ('R', the "late" analog) line on a finished order counts
    iff ANOTHER supplier touched the order (semi join) and NO other
    supplier also returned on it (anti join). Both correlations are
    equi on orderkey with the suppkey inequality as a join residual —
    hash/sort-merge joins, never nested-loop.

    Scale: three shuffles on orderkey (the probe plus the two
    correlated sides), all the same key so AQE reuses the exchange;
    the nation-filtered supplier dim broadcasts (q7's posture)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    n5 = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n5), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
    )
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    waited = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("ok2"))
            & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("ok3"))
            & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
    )
    return waited.groupBy("s_suppkey", "s_name").agg(F.count("*").alias("numwait"))


@query(
    "q22_global_sales_opportunity",
    oracle=f"""
    WITH cust AS (
        SELECT c.c_custkey, c.c_acctbal, n.n_name,
               CAST(FLOOR(c.c_acctbal * 1000000.0 + 0.5) AS BIGINT) AS bal_micro
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE n.n_name IN ('NATION_1', 'NATION_3', 'NATION_5', 'NATION_13',
                           'NATION_17', 'NATION_21', 'NATION_23')),
    st AS (SELECT SUM(bal_micro) AS sum_micro, COUNT(*) AS cnt
           FROM cust WHERE c_acctbal > 0.0)
    SELECT n_name, COUNT(*) AS numcust, {sql_dsum('c_acctbal', 'totacctbal')}
    FROM cust, st
    WHERE cust.bal_micro * st.cnt > st.sum_micro
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = cust.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY n_name
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers in seven
    target nations with above-average positive balance and no RECENT
    orders (the corpus has no fully order-less customers, so "lapsed
    since 1999" keeps the anti join non-vacuous) — scalar-average
    subquery + anti join. The above-average test is
    ``bal_micro · cnt > sum_micro`` in pure BIGINT (cross-multiplied
    so no float average is ever materialized; headroom 1e10 micro ×
    1e7 customers < 2^63 at sf ≥ 1).

    Scale: the 7-nation dim broadcasts; the average is a 1-row scalar
    broadcast (whitelisted bounded BNLJ); the anti join against orders
    shuffles on custkey — the only large exchange."""
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(
            "NATION_1", "NATION_3", "NATION_5", "NATION_13",
            "NATION_17", "NATION_21", "NATION_23",
        )
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "c_acctbal",
            "n_name",
            quantize(F.col("c_acctbal")).alias("bal_micro"),
        )
    )
    st = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum("bal_micro").alias("sum_micro"), F.count("*").alias("cnt")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(st))
        .filter(F.col("bal_micro") * F.col("cnt") > F.col("sum_micro"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            dsum(F.col("c_acctbal"), "totacctbal"),
        )
    )
