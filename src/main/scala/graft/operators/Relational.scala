package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Graft

/** The reference engine's relational surface (SURVEY.md §2), re-expressed as
  * declarative DataFrame plans so Catalyst owns pushdown, pruning, join
  * selection and codegen.
  *
  * The reference (williamxww/maple) declares this surface across
  * `plans/FileScanNode.java`, `plans/ProjectNode.java`, `plans/SelectNode.java`,
  * `plans/NestedLoopsJoinNode.java`, `plans/SortNode.java`,
  * `plans/HashedGroupAggregateNode.java` and the `nanosql.g` grammar — much of
  * it stubbed (GROUP BY, DISTINCT, LIKE, IN/EXISTS, set ops, LIMIT are
  * parse-only there; see SURVEY.md §2 status column). Here every declared
  * operator is implemented with full standard SQL semantics and checked
  * against a DuckDB oracle.
  *
  * Determinism notes (the driver hash-compares against DuckDB):
  *  - float SUM/AVG go through DECIMAL casts so accumulation order (Spark's
  *    partition-parallel partial aggregates vs DuckDB's single-node scan)
  *    cannot perturb low bits;
  *  - every ORDER BY ... LIMIT has a unique tie-break key;
  *  - NULL sort order is always explicit (Spark default is NULLS FIRST asc,
  *    DuckDB default is NULLS LAST).
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Graft.table(s, dir, n)

  /** Exact float aggregation: round each addend to a fixed scale, sum as
    * decimal (associative + exact), surface as double. Mirrors the oracle's
    * `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`. */
  private def sumd(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Same exactness as [[sumd]] but quantized to LONG units instead of
    * decimal: the sum is a plain codegen'd long addition (~40% faster than
    * Spark's decimal aggregate on the hot aggregation queries), still
    * associative/partition-order independent, and mirrored by the oracle as
    * `CAST(SUM(CAST(FLOOR(x*10^s + 0.5) AS BIGINT)) AS DOUBLE) / 10^s`.
    * floor(x+0.5), not round(): Spark's Round on DoubleType allocates a
    * BigDecimal PER ROW (measured 4× on q67's five moment sums), floor is
    * pure codegen double math, and the two agree on the POSITIVE domain
    * every caller is in (HALF_UP). Exact while |sum| < 2^53/10^s — wide
    * enough for any per-group total here; [[sumd]] remains for
    * unbounded-scale cases. */
  private def sumq(c: Column, scale: Int = 2): Column = {
    val f = math.pow(10, scale)
    sum(floor(c * f + 0.5).cast("long")).cast("double") / f
  }

  val defs: Seq[QueryDef] = Seq(

    // ── 2.1/2.2 scan + filter + project ────────────────────────────────────
    QueryDef(
      "q01_scan_filter",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_quantity") > 30 && col("l_discount") < 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
              FROM lineitem WHERE l_quantity > 30 AND l_discount < 0.05""")),

    QueryDef(
      "q02_project_expr",
      (s, d) => t(s, d, "lineitem").select(
        col("l_orderkey"),
        col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        (col("l_partkey") % 10).as("pk_mod")),
      Some("""SELECT l_orderkey, l_linenumber,
                     l_extendedprice * (1 - l_discount) AS revenue,
                     l_partkey % 10 AS pk_mod
              FROM lineitem""")),

    QueryDef(
      "q03_between",
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderdate").between("1995-01-01", "1996-12-31"))
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("o_totalprice")),
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_totalprice
              FROM orders
              WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                                    AND TIMESTAMP '1996-12-31'""")),

    QueryDef(
      "q04_like",
      (s, d) => t(s, d, "part")
        .filter(col("p_name").like("%a%") && !col("p_type").like("%BRASS%"))
        .select("p_partkey", "p_name", "p_type"),
      Some("""SELECT p_partkey, p_name, p_type FROM part
              WHERE p_name LIKE '%a%' AND p_type NOT LIKE '%BRASS%'""")),

    QueryDef(
      "q05_rlike",
      (s, d) => t(s, d, "part")
        .filter(col("p_name").rlike("a.*e"))
        .select("p_partkey", "p_name"),
      Some("""SELECT p_partkey, p_name FROM part
              WHERE regexp_matches(p_name, 'a.*e')""")),

    QueryDef(
      "q06_in_list",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_returnflag").isin("A", "R") &&
          col("l_linenumber").isin(1, 3, 5))
        .select("l_orderkey", "l_linenumber", "l_returnflag"),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
              WHERE l_returnflag IN ('A','R') AND l_linenumber IN (1,3,5)""")),

    QueryDef(
      "q07_null_semantics",
      (s, d) => t(s, d, "orders").select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "F", lit(null)).otherwise(col("o_totalprice")).as("v"))
        .select(
          col("o_orderkey"), col("v"),
          col("v").isNull.as("v_is_null"),
          coalesce(col("v"), lit(-1.0)).as("v_or_default")),
      Some("""SELECT o_orderkey, v, v IS NULL AS v_is_null,
                     COALESCE(v, -1.0) AS v_or_default
              FROM (SELECT o_orderkey,
                           CASE WHEN o_orderstatus = 'F' THEN NULL
                                ELSE o_totalprice END AS v
                    FROM orders)""")),

    // ── 2.4 aggregation ────────────────────────────────────────────────────
    QueryDef(
      "q10_agg_pricing_summary", // TPC-H Q1 shape
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sumq(col("l_quantity")).as("sum_qty"),
          sumq(col("l_extendedprice")).as("sum_base_price"),
          sumq(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
          (sumq(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
                     CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS sum_qty,
                     CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS sum_base_price,
                     CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000 AS sum_disc_price,
                     (CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100) / COUNT(*) AS avg_qty,
                     COUNT(*) AS count_order
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '1998-09-02'
              GROUP BY l_returnflag, l_linestatus""")),

    QueryDef(
      "q11_agg_having",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n"), sumq(col("l_quantity")).as("sum_qty"))
        .filter(col("n") > 30),
      Some("""SELECT l_partkey, COUNT(*) AS n,
                     CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS sum_qty
              FROM lineitem GROUP BY l_partkey HAVING COUNT(*) > 30""")),

    QueryDef(
      "q12_count_distinct",
      // Two COUNT(DISTINCT) on different columns would make Catalyst
      // EXPAND the fact table 3x into one big exchange; three separate
      // pruned-scan aggregations each partial-aggregate map-side (the
      // exchanges carry ~distinct-count rows, never fact rows) and join
      // back on the 3-row group key. Measured at sf0.1 best-of-3: 1.03 -> 0.48 s.
      (s, d) => {
        val li = t(s, d, "lineitem")
        val dp = li.select(col("l_returnflag"), col("l_partkey")).distinct()
          .groupBy("l_returnflag").agg(count(lit(1)).as("d_parts"))
        val ds = li.select(col("l_returnflag"), col("l_suppkey")).distinct()
          .groupBy("l_returnflag").agg(count(lit(1)).as("d_supps"))
        val n = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        dp.join(ds, "l_returnflag").join(n, "l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS d_parts,
                     COUNT(DISTINCT l_suppkey) AS d_supps, COUNT(*) AS n
              FROM lineitem GROUP BY l_returnflag""")),

    QueryDef(
      "q13_min_max",
      (s, d) => t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("min_date"),
          date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("max_date")),
      Some("""SELECT o_orderstatus, MIN(o_totalprice) AS min_price,
                     MAX(o_totalprice) AS max_price,
                     strftime(MIN(o_orderdate), '%Y-%m-%d') AS min_date,
                     strftime(MAX(o_orderdate), '%Y-%m-%d') AS max_date
              FROM orders GROUP BY o_orderstatus""")),

    QueryDef(
      "q14_rollup",
      (s, d) => {
        val c = t(s, d, "customer"); val n = t(s, d, "nation"); val r = t(s, d, "region")
        // The alias qualifier sidesteps Spark's spurious ambiguous-self-join
        // detection on rollup grouping columns (SPARK dataset-id tagging).
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .select("r_name", "n_name", "c_acctbal").as("j")
          .rollup(col("j.r_name"), col("j.n_name"))
          .agg(count(lit(1)).as("n_cust"), sumd(col("c_acctbal")).as("sum_bal"))
      },
      Some("""SELECT r_name, n_name, COUNT(*) AS n_cust,
                     CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY ROLLUP(r_name, n_name)""")),

    QueryDef(
      "q15_percentiles", // exact percentile with linear interpolation,
                         // computed rank-based in two passes. Spark's own
                         // `percentile` is a TypedImperativeAggregate whose
                         // buffer holds every (value, count) of the group —
                         // O(group size) executor memory, an OOM at 100 TB.
                         // Here the raw rows pass through ONE hash aggregate
                         // into the (group, value) -> count distribution
                         // (map-side combine, fixed-size buffers), cumulative
                         // 0-based rank ranges come from a window over that
                         // distribution (bounded by the value DOMAIN, not the
                         // row count, and disk-spillable), and the 12 target
                         // ranks broadcast-join back to pick the two values
                         // each percentile interpolates between:
                         //   q = (k+1-pos)*v[k] + (pos-k)*v[k+1],
                         //   pos = p*(n-1), k = floor(pos)
                         // — the same two-sided form Spark's Percentile and
                         // DuckDB's quantile_cont use, so results are
                         // bit-identical (EngineSqlSpec proves it vs the SQL
                         // `percentile` spelling).
      (s, d) => {
        val o = t(s, d, "orders").select(col("o_orderstatus").as("g"),
          col("o_totalprice").as("v"))
        val n = o.groupBy("g").agg(count(lit(1)).as("n"))
        // percentile/quantile_cont IGNORE NULLs while COUNT(*) does not:
        // ranks come from the NULL-free values, `n` stays the raw count
        // (latent here — orders has no NULL prices — but the parity claim
        // must hold on any input)
        val vv = o.filter(col("v").isNotNull)
        val nv = vv.groupBy("g").agg(count(lit(1)).as("nv"))
        val dist = vv.groupBy("g", "v").agg(count(lit(1)).as("c"))
        // value v covers 0-based ranks [lo0, hi) of its group
        val cum = dist.select(col("g"), col("v"), col("c"),
            sum(col("c")).over(Window.partitionBy("g").orderBy("v")).as("hi"))
          .select(col("g"), col("v"), (col("hi") - col("c")).as("lo0"),
            col("hi"))
        val ranks = nv.select(col("g").as("rg"), explode(array(
            lit(0.5), lit(0.9))).as("p"), col("nv"))
          .select(col("rg"), col("p"),
            (col("p") * (col("nv") - lit(1)).cast("double")).as("pos"))
          .select(col("rg"), col("p"), col("pos"),
            floor(col("pos")).cast("long").as("k"))
          .select(col("rg"), col("p"), col("pos"), col("k"),
            explode(array(col("k"), col("k") + 1)).as("r"))
        val vals = cum.join(broadcast(ranks),
          col("g") === col("rg") && col("r") >= col("lo0") &&
            col("r") < col("hi"))
        val q = vals.groupBy("g", "p", "pos", "k").agg(
            max(when(col("r") === col("k"), col("v"))).as("vlo"),
            max(when(col("r") === col("k") + 1, col("v"))).as("vhi"))
          .select(col("g"), col("p"),
            when(col("pos") === col("k").cast("double"), col("vlo"))
              .otherwise((col("k") + 1 - col("pos")) * col("vlo") +
                (col("pos") - col("k")) * col("vhi")).as("q"))
        q.groupBy("g")
          .agg(max(when(col("p") === 0.5, col("q"))).as("median_price"),
            max(when(col("p") === 0.9, col("q"))).as("p90_price"))
          .join(n, "g")
          .select(col("g").as("o_orderstatus"), col("median_price"),
            col("p90_price"), col("n"))
      },
      Some("""SELECT o_orderstatus,
                     quantile_cont(o_totalprice, 0.5) AS median_price,
                     quantile_cont(o_totalprice, 0.9) AS p90_price,
                     COUNT(*) AS n
              FROM orders GROUP BY o_orderstatus""")),

    QueryDef(
      "q16_stats_moments", // stddev / variance / correlation (rounded: the
                           // accumulation algorithms differ across engines)
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_discount")), 6).as("var_disc"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price")),
      Some("""SELECT l_returnflag,
                     ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
                     ROUND(var_samp(l_discount), 6) AS var_disc,
                     ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
              FROM lineitem GROUP BY l_returnflag""")),

    QueryDef(
      "q17_cube",
      (s, d) => t(s, d, "orders")
        .select(col("o_orderstatus"), col("o_orderpriority"), col("o_totalprice"))
        .as("o")
        .cube(col("o.o_orderstatus"), col("o.o_orderpriority"))
        .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("total")),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""")),

    // ── 2.3 joins ──────────────────────────────────────────────────────────
    QueryDef(
      "q20_join_inner",
      (s, d) => t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sumd(col("o_totalprice")).as("total"), count(lit(1)).as("n_orders")),
      Some("""SELECT n_name,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
                     COUNT(*) AS n_orders
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_name""")),

    QueryDef(
      "q21_join_left",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          sumd(coalesce(col("o_totalprice"), lit(0.0))).as("total")),
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
                     CAST(SUM(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey""")),

    QueryDef(
      "q22_join_right_antiselect", // customers with no orders, via RIGHT JOIN
      (s, d) => t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"), "right")
        .filter(col("o_orderkey").isNull)
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name
              FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
              WHERE o_orderkey IS NULL""")),

    QueryDef(
      "q23_join_full",
      (s, d) => {
        val byCust = t(s, d, "customer").groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_cust"))
        val bySupp = t(s, d, "supplier").groupBy("s_nationkey")
          .agg(count(lit(1)).as("n_supp"))
        byCust.join(bySupp, col("c_nationkey") === col("s_nationkey"), "full")
          .select(
            coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      },
      Some("""SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
                     COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
              FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) a
              FULL OUTER JOIN
                   (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) b
              ON c_nationkey = s_nationkey""")),

    QueryDef(
      "q24_join_semi", // IN (subquery) => left_semi
      (s, d) => t(s, d, "customer")
        .join(
          t(s, d, "orders").filter(col("o_totalprice") > 100000).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE c_custkey IN
                (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)""")),

    QueryDef(
      "q25_join_anti", // NOT EXISTS => left_anti
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 200000).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_acctbal"),
      Some("""SELECT c_custkey, c_acctbal FROM customer c
              WHERE NOT EXISTS
                (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                   AND o.o_totalprice > 200000)""")),

    QueryDef(
      "q26_join_cross",
      (s, d) => t(s, d, "region").crossJoin(t(s, d, "nation"))
        .select("r_name", "n_name"),
      Some("SELECT r_name, n_name FROM region CROSS JOIN nation")),

    QueryDef(
      "q27_join_using", // NATURAL/USING semantics: single shared key column
      (s, d) => {
        val a = t(s, d, "nation").select(col("n_name"), col("n_regionkey").as("rk"))
        val b = t(s, d, "region").select(col("r_name"), col("r_regionkey").as("rk"))
        a.join(b, Seq("rk")).select("rk", "n_name", "r_name")
      },
      Some("""SELECT rk, n_name, r_name
              FROM (SELECT n_name, n_regionkey AS rk FROM nation) a
              NATURAL JOIN (SELECT r_name, r_regionkey AS rk FROM region) b""")),

    QueryDef(
      "q28_theta_join", // non-equi θ-join (reference ThetaJoinNode.java:17)
      (s, d) => {
        val p = t(s, d, "part").filter(col("p_size") <= 3)
          .select("p_partkey", "p_size")
        val small = t(s, d, "supplier").filter(col("s_suppkey") <= 20)
          .select("s_suppkey")
        small.join(broadcast(p), col("p_partkey") < col("s_suppkey"))
          .groupBy("s_suppkey").agg(count(lit(1)).as("n_smaller_parts"))
      },
      Some("""SELECT s_suppkey, COUNT(*) AS n_smaller_parts
              FROM (SELECT s_suppkey FROM supplier WHERE s_suppkey <= 20) s
              JOIN (SELECT p_partkey, p_size FROM part WHERE p_size <= 3) p
                ON p.p_partkey < s.s_suppkey
              GROUP BY s_suppkey""")),

    // ── 2.5 sort / limit / distinct / set ops ──────────────────────────────
    QueryDef(
      "q30_topk",
      (s, d) => t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select("o_orderkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    QueryDef(
      "q31_sort_nulls_first",
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "O", lit(null))
            .otherwise(col("o_totalprice")).as("v"))
        .orderBy(col("v").asc_nulls_first, col("o_orderkey").asc)
        .limit(50),
      Some("""SELECT o_orderkey,
                     CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS v
              FROM orders
              ORDER BY v ASC NULLS FIRST, o_orderkey LIMIT 50""")),

    QueryDef(
      "q32_distinct",
      (s, d) => t(s, d, "lineitem").select("l_returnflag", "l_linestatus").distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    QueryDef(
      "q33_union_distinct",
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .union(t(s, d, "supplier").select(col("s_nationkey")))
        .distinct(),
      Some("""SELECT c_nationkey AS nk FROM customer
              UNION SELECT s_nationkey FROM supplier""")),

    QueryDef(
      "q34_intersect",
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey"))),
      Some("""SELECT c_nationkey AS nk FROM customer
              INTERSECT SELECT s_nationkey FROM supplier""")),

    QueryDef(
      "q35_except",
      (s, d) => t(s, d, "nation").select(col("n_nationkey").as("nk"))
        .except(t(s, d, "supplier").select(col("s_nationkey"))),
      Some("""SELECT n_nationkey AS nk FROM nation
              EXCEPT SELECT s_nationkey FROM supplier""")),

    QueryDef(
      "q36_limit_offset", // LIMIT/OFFSET (parse-only in the reference,
                          // SelectClause.java:87-92; no grammar rule)
      (s, d) => t(s, d, "orders")
        .orderBy(col("o_orderkey"))
        .offset(100)
        .limit(50)
        .select("o_orderkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_orderkey LIMIT 50 OFFSET 100""")),

    // ── 2.6 scalar expressions / functions ─────────────────────────────────
    QueryDef(
      "q40_math_fns",
      (s, d) => t(s, d, "nation").select(
        col("n_nationkey"),
        abs(col("n_nationkey") - 12).as("abs_v"),
        ceil(sqrt(col("n_nationkey"))).as("ceil_sqrt"),
        floor(sqrt(col("n_nationkey"))).as("floor_sqrt"),
        pow(col("n_nationkey"), 2).as("sq"),
        round(sin(col("n_nationkey")), 6).as("sin6"),
        round(cos(col("n_nationkey")), 6).as("cos6"),
        round(atan2(col("n_nationkey"), lit(3)), 6).as("atan2_6"),
        round(tan(col("n_nationkey")), 4).as("tan4"),
        round(asin(col("n_nationkey") / 25.0), 6).as("asin6"),
        round(acos(col("n_nationkey") / 25.0), 6).as("acos6"),
        round(atan(col("n_nationkey")), 6).as("atan6")),
      Some("""SELECT n_nationkey, ABS(n_nationkey - 12) AS abs_v,
                     CAST(CEIL(SQRT(n_nationkey)) AS BIGINT) AS ceil_sqrt,
                     CAST(FLOOR(SQRT(n_nationkey)) AS BIGINT) AS floor_sqrt,
                     POW(n_nationkey, 2) AS sq,
                     ROUND(SIN(n_nationkey), 6) AS sin6,
                     ROUND(COS(n_nationkey), 6) AS cos6,
                     ROUND(ATAN2(n_nationkey, 3), 6) AS atan2_6,
                     ROUND(TAN(n_nationkey), 4) AS tan4,
                     ROUND(ASIN(n_nationkey / 25.0), 6) AS asin6,
                     ROUND(ACOS(n_nationkey / 25.0), 6) AS acos6,
                     ROUND(ATAN(n_nationkey), 6) AS atan6
              FROM nation""")),

    QueryDef(
      "q41_string_fns",
      (s, d) => t(s, d, "nation")
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .select(
          col("n_nationkey"),
          concat(col("n_name"), lit("_"), col("r_name")).as("nr"),
          upper(col("n_name")).as("up"),
          lower(col("r_name")).as("lo"),
          length(col("n_name")).as("len"),
          substring(col("n_name"), 1, 3).as("pre3"),
          greatest(col("n_nationkey"), col("n_regionkey") * 5).as("g"),
          least(col("n_nationkey"), col("n_regionkey") * 5).as("l")),
      Some("""SELECT n_nationkey, CONCAT(n_name, '_', r_name) AS nr,
                     UPPER(n_name) AS up, LOWER(r_name) AS lo,
                     CAST(LENGTH(n_name) AS INT) AS len,
                     SUBSTRING(n_name, 1, 3) AS pre3,
                     GREATEST(n_nationkey, n_regionkey * 5) AS g,
                     LEAST(n_nationkey, n_regionkey * 5) AS l
              FROM nation JOIN region ON n_regionkey = r_regionkey""")),

    QueryDef(
      "q42_case_when",
      (s, d) => t(s, d, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 150000, "big")
          .when(col("o_totalprice") > 50000, "mid")
          .otherwise("small").as("bucket"),
        when(col("o_orderstatus") === "F", lit(1)).otherwise(lit(0)).as("is_f")),
      Some("""SELECT o_orderkey,
                     CASE WHEN o_totalprice > 150000 THEN 'big'
                          WHEN o_totalprice > 50000 THEN 'mid'
                          ELSE 'small' END AS bucket,
                     CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_f
              FROM orders""")),

    QueryDef(
      "q43_int_division", // reference keeps int/int integer (ArithmeticOperator.java:271)
      (s, d) => t(s, d, "lineitem").select(
        col("l_orderkey"),
        col("l_linenumber"),
        expr("l_partkey div 7").as("d"),
        (col("l_partkey") % 7).as("m"),
        expr("(l_partkey - 1000) div 7").as("dneg")),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey // 7 AS d,
                     l_partkey % 7 AS m, (l_partkey - 1000) // 7 AS dneg
              FROM lineitem""")),

    QueryDef(
      "q45_conditional_fns", // IF / IFNULL / NULLIF (FunctionDirectory.java:38-62)
      (s, d) => t(s, d, "orders").select(
        col("o_orderkey"),
        expr("if(o_totalprice > 100000, 'hi', 'lo')").as("if_v"),
        expr("ifnull(nullif(o_orderstatus, 'O'), 'open')").as("ifnull_v"),
        expr("nullif(o_orderpriority, '1-URGENT')").as("nullif_v")),
      Some("""SELECT o_orderkey,
                     IF(o_totalprice > 100000, 'hi', 'lo') AS if_v,
                     IFNULL(NULLIF(o_orderstatus, 'O'), 'open') AS ifnull_v,
                     NULLIF(o_orderpriority, '1-URGENT') AS nullif_v
              FROM orders""")),

    // ── subqueries (reference InOperator/ExistsOperator/ScalarSubquery stubs)
    QueryDef(
      "q44_scalar_subquery",
      (s, d) => {
        val o = t(s, d, "orders")
        val avgP = o.agg(
          (sumd(col("o_totalprice")) / count(lit(1))).as("avg_price"))
        o.crossJoin(broadcast(avgP))
          .filter(col("o_totalprice") > col("avg_price") * 1.5)
          .select("o_orderkey", "o_totalprice")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_totalprice >
                (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                 FROM orders) * 1.5""")),

    // ── window functions (beyond the reference; SURVEY §2.5 extension) ─────
    QueryDef(
      "q50_window_rank",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        val wAll = Window.partitionBy("o_custkey")
        t(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(wAll)
            .cast("double").as("cust_total"))
          .filter(col("rn") <= 3)
      },
      Some("""SELECT * FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rn,
                       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                            OVER (PARTITION BY o_custkey) AS DOUBLE) AS cust_total
                FROM orders)
              WHERE rn <= 3""")),

    QueryDef(
      "q51_window_lag_lead",
      (s, d) => {
        // o_orderkey is unique => deterministic frame ordering
        val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
        t(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
                     LAG(o_totalprice, 1) OVER w AS prev_price,
                     LEAD(o_totalprice, 1) OVER w AS next_price
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""")),

    QueryDef(
      "q18_custom_udaf", // typed Aggregator (reference AggregateFunction.java)
      (s, d) => {
        import s.implicits._
        val g = udaf(graft.functions.GcdAggregator)
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(g(col("l_partkey") * 4 + 2).as("gcd_v"), count(lit(1)).as("n"))
      },
      // gcd is order-independent, so DuckDB's unordered list() is a valid
      // oracle formulation of the same aggregate
      Some("""SELECT l_returnflag,
                     list_reduce(list(l_partkey * 4 + 2), (a, b) -> gcd(a, b)) AS gcd_v,
                     COUNT(*) AS n
              FROM lineitem GROUP BY l_returnflag""")),

    QueryDef(
      "q19_approx_agg", // sketch aggregates: HLL + percentile sketch. Sketch
                        // INTERNALS differ per engine, so the verifiable
                        // contract is a tolerance bracket: each engine
                        // asserts its OWN sketch against its OWN exact
                        // value, and the asserted booleans (plus the exact
                        // anchors) hash-compare across engines.
      (s, d) => {
        // ONE scan of the fact table: GROUPING SETS ((flag, partkey),
        // (flag, price)) expands each row into both keyings, partial
        // aggregation collapses them map-side, and everything downstream
        // works off the slim pre-aggregate (|parts| + |price domain| rows
        // per flag). The earlier two-scan form (sketch pass + rank pass
        // with a broadcast join back) was correct but paid the fact scan
        // twice — 7.5× the oracle at sf0.1 with no shuffle to blame.
        //  - exact_parts / hll: the partkey grouping set IS the distinct
        //    key set, so COUNT of it is exact and the HLL sketch over it
        //    equals the HLL over raw rows (duplicate-insensitive) — and no
        //    COUNT(DISTINCT) ever meets a sketch in one agg, so Spark's
        //    distinct-expansion (measured 5× on the fused form) never fires.
        //  - the median bracket comes from the price grouping set by RANK
        //    over an equi-width price HISTOGRAM (width 64): raw prices are
        //    near-unique per row (measured ~598k distinct in 600k rows —
        //    an ungrouped price set would shuffle row cardinality and sort
        //    it in one window partition per flag), but the TPC-H price
        //    domain is SF-independent (qty 1..50 × retailprice ~[900,2100]
        //    => ~1.6k buckets at ANY corpus size), so the bucketed
        //    histogram partial-aggregates map-side and the per-flag
        //    cumulative-sum window is constant-bounded. f = cum(b)/n for
        //    the smallest bucket with cum >= n/2 sits within one bucket
        //    share of 0.5 — asserted to land in [0.4, 0.6]. The set a row
        //    belongs to reads off the null key (pb IS NULL <=> partkey
        //    set) — no Filter node, so nothing pushes below the shared
        //    aggregate.
        val wcum = Window.partitionBy("l_returnflag")
          .orderBy(col("pb").asc_nulls_first)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wtot = Window.partitionBy("l_returnflag")
        val priceSet = col("l_partkey").isNull
        t(s, d, "lineitem")
          .select(col("l_returnflag"), col("l_partkey"),
            floor(col("l_extendedprice") / 64).cast("long").as("pb"))
          .groupingSets(
            Seq(Seq(col("l_returnflag"), col("l_partkey")),
              Seq(col("l_returnflag"), col("pb"))),
            col("l_returnflag"), col("l_partkey"), col("pb"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("ntot", sum(when(priceSet, col("cnt"))).over(wtot))
          .withColumn("cum",
            sum(when(priceSet, col("cnt")).otherwise(0)).over(wcum))
          .groupBy("l_returnflag")
          .agg(
            count(when(col("pb").isNull, 1)).as("exact_parts"),
            approx_count_distinct(when(col("pb").isNull, col("l_partkey")))
              .as("hll"),
            max(col("ntot")).as("n"),
            min(when(priceSet &&
              col("cum") >= col("ntot").cast("double") * 0.5, col("cum")))
              .as("cmed"))
          .select(col("l_returnflag"), col("exact_parts"),
            (abs(col("hll").cast("double") / col("exact_parts") - 1)
              < 0.05).as("hll_within_5pct"),
            (col("cmed").cast("double") / col("n"))
              .between(0.40, 0.60).as("median_bracketed"))
      },
      Some("""WITH sk AS (
                SELECT l_returnflag,
                       COUNT(DISTINCT l_partkey) AS exact_parts,
                       approx_count_distinct(l_partkey) AS hll_parts,
                       approx_quantile(l_extendedprice, 0.5) AS amed
                FROM lineitem GROUP BY l_returnflag),
              frac AS (
                SELECT l.l_returnflag,
                       CAST(SUM(CASE WHEN l.l_extendedprice <= sk.amed
                                     THEN 1 ELSE 0 END) AS DOUBLE)
                         / COUNT(*) AS f
                FROM lineitem l JOIN sk ON l.l_returnflag = sk.l_returnflag
                GROUP BY l.l_returnflag)
              SELECT sk.l_returnflag,
                     CAST(sk.exact_parts AS BIGINT) AS exact_parts,
                     ABS(CAST(sk.hll_parts AS DOUBLE) / sk.exact_parts - 1)
                       < 0.05 AS hll_within_5pct,
                     f BETWEEN 0.40 AND 0.60 AS median_bracketed
              FROM sk JOIN frac ON sk.l_returnflag = frac.l_returnflag""")),

    QueryDef(
      "q52_asof_window", // as-of association: latest prior 'view' per user
                         // at each 'purchase' (windowed last-ignore-nulls —
                         // the co-partitioned form of an as-of join)
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        t(s, d, "events")
          .withColumn("prior_view_id",
            last(when(col("event_type") === "view", col("event_id")), true).over(w))
          .filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "prior_view_id")
      },
      Some("""SELECT event_id, user_id, prior_view_id FROM (
                SELECT event_id, user_id, event_type,
                       LAST_VALUE(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
                         OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_view_id
                FROM events)
              WHERE event_type = 'purchase'""")),

    QueryDef(
      "q53_pivot", // crosstab: event counts per user x type
      (s, d) => t(s, d, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
        .count()
        .na.fill(0L),
      Some("""SELECT user_id,
                     COUNT(*) FILTER (event_type = 'view') AS view,
                     COUNT(*) FILTER (event_type = 'click') AS click,
                     COUNT(*) FILTER (event_type = 'purchase') AS purchase,
                     COUNT(*) FILTER (event_type = 'signup') AS signup,
                     COUNT(*) FILTER (event_type = 'error') AS error
              FROM events GROUP BY user_id""")),

    QueryDef(
      "q65_ratio_to_report", // percent-of-total window: each order-status
                             // group's share of all revenue. The total is a
                             // whole-partition window SUM over the DECIMAL
                             // aggregates (exact, order-independent); only
                             // the final share division runs in double, on
                             // identical operands in both engines.
      (s, d) => {
        val w = Window.partitionBy()
        t(s, d, "orders")
          .groupBy("o_orderstatus")
          .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev_d"))
          .select(col("o_orderstatus"),
            col("rev_d").cast("double").as("revenue"),
            round(col("rev_d").cast("double") /
              sum(col("rev_d")).over(w).cast("double"), 6).as("share"))
      },
      Some("""SELECT o_orderstatus,
             |       CAST(rev_d AS DOUBLE) AS revenue,
             |       ROUND(CAST(rev_d AS DOUBLE) /
             |             CAST(SUM(rev_d) OVER () AS DOUBLE), 6) AS share
             |FROM (SELECT o_orderstatus,
             |        SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d
             |      FROM orders GROUP BY o_orderstatus)""".stripMargin)),

    QueryDef(
      "q64_funnel", // ordered-event funnel: users who viewed, then clicked
                    // at/after their first view, then purchased at/after
                    // that first qualifying click. Each stage is a
                    // groupBy-min plus a semi-join-shaped filter against
                    // the previous stage's frontier — at scale, three
                    // shuffles on user_id, each smaller than the last.
                    // All timestamp comparisons run at MICROsecond
                    // precision in both engines (the oracle casts DuckDB's
                    // nanosecond parquet timestamps down), so a sub-µs gap
                    // can never flip a stage count between engines.
      (s, d) => {
        val ev = t(s, d, "events").select("user_id", "event_type", "ts")
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("vt"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("ts") >= col("vt"))
          .groupBy("user_id").agg(min(col("ts")).as("ct"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("ts") >= col("ct"))
          .groupBy("user_id").agg(min(col("ts")).as("pt"))
        v.agg(count(lit(1)).as("n_users"))
          .select(lit("1_view").as("stage"), col("n_users"))
          .union(c.agg(count(lit(1)).as("n_users"))
            .select(lit("2_click").as("stage"), col("n_users")))
          .union(p.agg(count(lit(1)).as("n_users"))
            .select(lit("3_purchase").as("stage"), col("n_users")))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, ts::TIMESTAMP AS ts FROM events),
             |v AS (SELECT user_id, MIN(ts) AS vt FROM ev
             |      WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, MIN(e.ts) AS ct
             |      FROM ev e JOIN v ON e.user_id = v.user_id
             |      WHERE e.event_type = 'click' AND e.ts >= v.vt
             |      GROUP BY e.user_id),
             |p AS (SELECT e.user_id, MIN(e.ts) AS pt
             |      FROM ev e JOIN c ON e.user_id = c.user_id
             |      WHERE e.event_type = 'purchase' AND e.ts >= c.ct
             |      GROUP BY e.user_id)
             |SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
             |UNION ALL
             |SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM c
             |UNION ALL
             |SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM p""".stripMargin)),

    QueryDef(
      "q63_unpivot", // wide -> long (the inverse of q53's pivot, composed
                     // on q53's own output): Spark's native `unpivot`
                     // (Dataset.unpivot / UNPIVOT), zero-count cells kept —
                     // the round trip conserves every (user, type) cell
      (s, d) => t(s, d, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
        .count()
        .na.fill(0L)
        .unpivot(Array(col("user_id")),
          Array(col("view"), col("click"), col("purchase"), col("signup"),
            col("error")),
          "event_type", "n"),
      Some("""WITH p AS (
             |  SELECT user_id,
             |         COUNT(*) FILTER (event_type = 'view') AS view,
             |         COUNT(*) FILTER (event_type = 'click') AS click,
             |         COUNT(*) FILTER (event_type = 'purchase') AS purchase,
             |         COUNT(*) FILTER (event_type = 'signup') AS signup,
             |         COUNT(*) FILTER (event_type = 'error') AS error
             |  FROM events GROUP BY user_id)
             |SELECT user_id, 'view' AS event_type, view AS n FROM p
             |UNION ALL SELECT user_id, 'click', click FROM p
             |UNION ALL SELECT user_id, 'purchase', purchase FROM p
             |UNION ALL SELECT user_id, 'signup', signup FROM p
             |UNION ALL SELECT user_id, 'error', error FROM p""".stripMargin)),

    QueryDef(
      "q55_window_distribution", // rank-distribution window functions:
                                 // ntile / percent_rank / cume_dist over a
                                 // unique ordering (event_id tiebreak keeps
                                 // every engine's answer identical)
      (s, d) => {
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        t(s, d, "orders")
          .filter(col("o_orderkey") <= 2000)
          .select(col("o_orderkey"), col("o_orderstatus"),
            ntile(4).over(w).as("quartile"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"))
      },
      Some("""SELECT o_orderkey, o_orderstatus,
                     CAST(NTILE(4) OVER w AS INT) AS quartile,
                     ROUND(PERCENT_RANK() OVER w, 6) AS pr,
                     ROUND(CUME_DIST() OVER w, 6) AS cd
              FROM orders WHERE o_orderkey <= 2000
              WINDOW w AS (PARTITION BY o_orderstatus
                           ORDER BY o_totalprice, o_orderkey)""")),

    QueryDef(
      "q56_grouping_sets", // explicit GROUPING SETS (beyond q14 ROLLUP /
                           // q17 CUBE): mixed granularities in one pass,
                           // with GROUPING() to disambiguate generated nulls
      (s, d) => t(s, d, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_prio")),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                     CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
                     CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
              FROM orders
              GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                      (o_orderstatus), ())""")),

    QueryDef(
      "q54_range_join", // equi + range predicate: events within 1 min of a
                        // purchase by the same user (SMJ + range filter;
                        // at scale, bucket ts into coarse bins for an
                        // equi-join candidate step)
      (s, d) => {
        val e = t(s, d, "events")
        val p = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
            col("ts").as("p_ts"))
        e.as("x").join(p,
            col("x.user_id") === col("p_user") &&
              col("x.event_id") =!= col("p_id") &&
              col("x.ts") >= col("p_ts") &&
              col("x.ts") <= col("p_ts") + expr("INTERVAL 1 MINUTE"))
          .select(col("p_id"), col("x.event_id").as("nearby_id"),
            col("x.event_type").as("nearby_type"))
      },
      Some("""SELECT p.event_id AS p_id, x.event_id AS nearby_id,
                     x.event_type AS nearby_type
              FROM events x
              JOIN (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'purchase') p
                ON x.user_id = p.user_id AND x.event_id != p.event_id
               AND x.ts >= p.ts AND x.ts <= p.ts + INTERVAL 1 MINUTE""")),

    // ── events table: time-bucketed aggregation (batch shape of streaming) ─
    QueryDef(
      "q61_sessionize", // gaps-and-islands sessionization (30-min gap) —
                        // the oracle-checkable batch twin of the streaming
                        // session_window in graft.streaming.EventStreams
      (s, d) => {
        val byUser = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        val newSession = when(
          col("ts").cast("long") - lag(col("ts"), 1).over(byUser).cast("long")
            > 1800, 1).otherwise(0)
        t(s, d, "events")
          .withColumn("new_s", coalesce(newSession, lit(0)))
          .withColumn("session_idx",
            sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "session_idx")
          .agg(
            count(lit(1)).as("n_events"),
            date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"))
      },
      Some("""SELECT user_id, session_idx, COUNT(*) AS n_events,
                     strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                     strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
              FROM (SELECT user_id, ts,
                      CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
                    FROM (SELECT user_id, event_id, ts,
                            CASE WHEN epoch(ts) - epoch(LAG(ts, 1) OVER (
                                   PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                                 THEN 1 ELSE 0 END AS new_s
                          FROM events))
              GROUP BY user_id, session_idx""")),

    QueryDef(
      "q60_events_hourly",
      (s, d) => t(s, d, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), sumd(col("value"), 4).as("sum_value")),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                     event_type, COUNT(*) AS n,
                     CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
              FROM events GROUP BY 1, 2""")),

    QueryDef(
      "q57_window_range_frame", // value-RANGE window frame (vs the row
                                // frames of q50/q51): per-customer trailing
                                // 30-day revenue. The frame is over integer
                                // days-since-epoch, so tie handling (all
                                // peers in frame) and the frame boundary
                                // are value-based and engine-identical;
                                // the sum uses the DECIMAL-cast pattern so
                                // partition order can't perturb bits.
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("d")
          .rangeBetween(-30, 0)
        t(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            datediff(col("o_orderdate").cast("date"), lit("1970-01-01"))
              .as("d"),
            col("o_totalprice"))
          .select(col("o_orderkey"), col("o_custkey"), col("d"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
              .cast("double").as("rev_30d"),
            count(lit(1)).over(w).cast("long").as("n_30d"))
      },
      Some("""SELECT o_orderkey, o_custkey, d,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             |         PARTITION BY o_custkey ORDER BY d
             |         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
             |         AS rev_30d,
             |       CAST(COUNT(*) OVER (
             |         PARTITION BY o_custkey ORDER BY d
             |         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT)
             |         AS n_30d
             |FROM (SELECT o_orderkey, o_custkey,
             |        CAST(date_diff('day', DATE '1970-01-01',
             |                       CAST(o_orderdate AS DATE)) AS INT) AS d,
             |        o_totalprice
             |      FROM orders)""".stripMargin)),

    QueryDef(
      "q62_time_gap_fill", // sparse -> dense time series: an hourly spine
                           // (min..max hour, generated in-plan from a
                           // 1-row bounds aggregate — no driver loop, no
                           // collect) cross-joined with the type dimension,
                           // left-joined to the sparse hourly counts,
                           // gaps filled with 0. Spine size = hours x
                           // types regardless of data volume, so both
                           // joins broadcast at any corpus scale.
      (s, d) => {
        val ev = t(s, d, "events")
          .select(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        val hourly = ev.groupBy("h", "event_type").agg(count(lit(1)).as("n"))
        val spine = hourly.agg(min("h").as("h0"), max("h").as("h1"))
          .select(explode(sequence(col("h0"), col("h1"),
            expr("INTERVAL 1 HOUR"))).as("h"))
        val types = ev.select("event_type").distinct()
        spine.crossJoin(types)
          .join(hourly, Seq("h", "event_type"), "left")
          .select(date_format(col("h"), "yyyy-MM-dd HH:00").as("hour"),
            col("event_type"), coalesce(col("n"), lit(0L)).as("n"))
      },
      Some("""WITH hourly AS (
             |  SELECT date_trunc('hour', ts) AS h, event_type,
             |         CAST(COUNT(*) AS BIGINT) AS n
             |  FROM events GROUP BY h, event_type),
             |bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
             |spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
             |          FROM bounds),
             |types AS (SELECT DISTINCT event_type FROM events)
             |SELECT strftime(s.h, '%Y-%m-%d %H:00') AS hour, t.event_type,
             |       CAST(COALESCE(c.n, 0) AS BIGINT) AS n
             |FROM spine s CROSS JOIN types t
             |LEFT JOIN hourly c ON c.h = s.h AND c.event_type = t.event_type""".stripMargin)),

    QueryDef(
      "q46_string_agg", // ordered LISTAGG/STRING_AGG (§2.4 extension; SQL:2016
                        // T625): per-group concatenation is only
                        // deterministic with an explicit order, so the plan
                        // sorts INSIDE the aggregated array (collect_list →
                        // array_sort → join) rather than relying on any
                        // engine's input order. Scale: per-group state is
                        // the member list — bounded here by suppliers per
                        // nation; for unbounded groups prefer q30's top-k
                        // or a capped slice(array_sort(...), 1, k).
      (s, d) => t(s, d, "supplier")
        .groupBy(col("s_nationkey").cast("int").as("s_nationkey"))
        .agg(count(lit(1)).as("n_supps"),
          array_join(array_sort(collect_list(col("s_name"))), ",")
            .as("names")),
      Some("""SELECT CAST(s_nationkey AS INT) AS s_nationkey,
             |       CAST(COUNT(*) AS BIGINT) AS n_supps,
             |       STRING_AGG(s_name, ',' ORDER BY s_name) AS names
             |FROM supplier GROUP BY s_nationkey""".stripMargin)),

    QueryDef(
      "q66_mode", // exact per-group MODE with a deterministic tie-break
                  // (most-frequent value, smallest first — both DuckDB's
                  // mode() and any hash-based plan have unspecified ties, so
                  // the query spells the rule out). Scale shape: the value
                  // histogram is a partial-aggregated (group, value) count —
                  // never a per-group value buffer (the q15 lesson) — and
                  // the arg-max window runs over the collapsed histogram,
                  // whose size is distinct values per group, not rows.
      (s, d) => {
        val counts = t(s, d, "lineitem")
          .groupBy(col("l_returnflag"), col("l_quantity").as("mode_qty"))
          .agg(count(lit(1)).as("mode_count"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("l_returnflag")
          .orderBy(col("mode_count").desc, col("mode_qty").asc)
        counts.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") === 1)
          .select("l_returnflag", "mode_qty", "mode_count")
      },
      Some("""SELECT l_returnflag, mode_qty, mode_count FROM (
             |  SELECT l_returnflag, mode_qty, mode_count,
             |         ROW_NUMBER() OVER (PARTITION BY l_returnflag
             |           ORDER BY mode_count DESC, mode_qty) AS rnk
             |  FROM (SELECT l_returnflag, l_quantity AS mode_qty,
             |               CAST(COUNT(*) AS BIGINT) AS mode_count
             |        FROM lineitem GROUP BY 1, 2))
             |WHERE rnk = 1""".stripMargin)),

    QueryDef(
      "q67_regression_aggs", // REGR_SLOPE/REGR_INTERCEPT/CORR (§2.4
                             // extension; SQL:2003 T621) computed the
                             // engine-exact way: the five moment sums are
                             // DECIMAL (associative, partition-order
                             // independent), and the closed-form formulas
                             // run on the exact sums as doubles with
                             // identical operation order in both engines —
                             // native float regr_* aggregates would be
                             // run-order dependent and can't hash-compare.
      (s, d) => {
        // Quantized-LONG moments, not decimal: syy's magnitude (~1e14 at
        // scale 4) overflows the compact-long decimal representation,
        // dropping Spark's decimal Sum into per-row BigDecimal arithmetic
        // (measured 2.0 s vs 0.4 s for comparable sums). And floor(x+0.5)
        // instead of round(): Spark's Round on DoubleType allocates a
        // BigDecimal per row, while floor is pure codegen double math —
        // identical HALF_UP result for the all-positive inputs here, and
        // the oracle mirrors FLOOR(x*100 + 0.5) term for term. At scale 2
        // every moment fits 2^53 with room (syy sum ≤ ~6e17 unscaled).
        def sumf(c: Column): Column =
          sum(floor(c * 100 + 0.5).cast("long")).cast("double") / 100
        val x = col("l_quantity"); val y = col("l_extendedprice")
        val m = t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).cast("double").as("n"),
            sumf(x).as("sx"), sumf(y).as("sy"),
            sumf(x * x).as("sxx"), sumf(y * y).as("syy"),
            sumf(x * y).as("sxy"))
        val cov = col("n") * col("sxy") - col("sx") * col("sy")
        val varx = col("n") * col("sxx") - col("sx") * col("sx")
        val vary = col("n") * col("syy") - col("sy") * col("sy")
        val slope = cov / varx
        m.select(col("l_returnflag"),
          round(slope, 6).as("slope"),
          round((col("sy") - slope * col("sx")) / col("n"), 6).as("intercept"),
          round(cov / (sqrt(varx) * sqrt(vary)), 6).as("corr"))
      },
      Some("""WITH m AS (
             |  SELECT l_returnflag,
             |         CAST(COUNT(*) AS DOUBLE) AS n,
             |         CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS sx,
             |         CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS sy,
             |         CAST(SUM(CAST(FLOOR(l_quantity * l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS sxx,
             |         CAST(SUM(CAST(FLOOR(l_extendedprice * l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS syy,
             |         CAST(SUM(CAST(FLOOR(l_quantity * l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS sxy
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag,
             |       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
             |       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
             |         AS intercept,
             |       ROUND((n * sxy - sx * sy) /
             |             (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6) AS corr
             |FROM m""".stripMargin)),

    QueryDef(
      "q68_correlated_subquery", // CORRELATED aggregate subquery (TPC-H Q17
                                 // shape): lineitems below 20% of their own
                                 // part's average quantity, restricted to
                                 // one brand. The oracle states it as the
                                 // correlated form; the plan is the
                                 // DECORRELATED equivalent Catalyst itself
                                 // would produce — per-key aggregate joined
                                 // back — which is also the scale shape: the
                                 // brand filter broadcasts into BOTH the
                                 // probe and the aggregate side, so the
                                 // per-part average is computed only for the
                                 // ~1/25 of parts that can match, and the
                                 // avg⋈probe join reuses the aggregate's
                                 // l_partkey exchange (ReuseExchange).
      (s, d) => {
        val parts = t(s, d, "part")
          .filter(col("p_brand") === "Brand#23").select("p_partkey")
        val li = t(s, d, "lineitem")
          .select("l_partkey", "l_quantity", "l_extendedprice")
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .drop("p_partkey")
        val avgQ = li.groupBy("l_partkey")
          .agg((sumd(col("l_quantity")) / count(lit(1))).as("avg_q"))
        li.join(avgQ, "l_partkey")
          .filter(col("l_quantity") < col("avg_q") * 0.2)
          .agg((sumd(col("l_extendedprice")) / 7.0).as("avg_yearly"))
      },
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             |         / 7.0 AS avg_yearly
             |FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
             |WHERE p_brand = 'Brand#23'
             |  AND l_quantity < 0.2 * (
             |    SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |             / COUNT(*)
             |    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin)),

    QueryDef(
      "q69_histogram", // equi-width histogram (width_bucket-style binning) —
                       // the profiling primitive behind every optimizer
                       // stats collector and data-quality dashboard. Bucket
                       // assignment is map-side integer math on the scan,
                       // the groupBy moves one partial row per (flag,
                       // bucket) per partition, counts are exact integers:
                       // a 100 TB histogram is one scan + a 60-row shuffle.
      (s, d) => {
        val bucket = least(floor(col("l_extendedprice") / 10000), lit(9))
          .cast("int")
        t(s, d, "lineitem")
          .select(col("l_returnflag"), bucket.as("bucket"),
            col("l_extendedprice"))
          .groupBy("l_returnflag", "bucket")
          .agg(count(lit(1)).as("n"),
            sumd(col("l_extendedprice")).as("bucket_value"))
      },
      Some("""SELECT l_returnflag,
             |       CAST(LEAST(FLOOR(l_extendedprice / 10000), 9) AS INT)
             |         AS bucket,
             |       CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             |         AS bucket_value
             |FROM lineitem GROUP BY 1, 2""".stripMargin)),

    QueryDef(
      "q70_ohlc", // time-series resample: per (hour, event_type) OHLC bars
                  // (open/high/low/close + count) — the downsampling shape
                  // every metrics store runs. Open/close are picked by
                  // row_number over (ts, event_id) — a deterministic TOTAL
                  // order, where min_by/max_by would tie-break
                  // arbitrarily — and both windows share one (hour, type)
                  // exchange. Values are carried, never summed, so there
                  // is no float-order hazard at any partitioning.
                  // Timestamp comparisons run at microsecond precision in
                  // both engines (the oracle downcasts its nanosecond
                  // parquet timestamps, the q64 rule).
      (s, d) => {
        val hour = date_format(date_trunc("hour", col("ts")),
          "yyyy-MM-dd HH:mm:ss")
        val wAsc = Window.partitionBy("hour", "event_type")
          .orderBy(col("ts"), col("event_id"))
        val wDesc = Window.partitionBy("hour", "event_type")
          .orderBy(col("ts").desc, col("event_id").desc)
        t(s, d, "events")
          .select(hour.as("hour"), col("event_type"), col("ts"),
            col("event_id"), col("value"))
          .withColumn("rn_a", row_number().over(wAsc))
          .withColumn("rn_d", row_number().over(wDesc))
          .groupBy("hour", "event_type")
          .agg(count(lit(1)).as("n"),
            max(when(col("rn_a") === 1, col("value"))).as("open"),
            max(when(col("rn_d") === 1, col("value"))).as("close"),
            min(col("value")).as("low"),
            max(col("value")).as("high"))
      },
      Some("""WITH base AS (
             |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
             |           AS hour,
             |         event_type, ts::TIMESTAMP AS ts, event_id, value
             |  FROM events),
             |r AS (
             |  SELECT *,
             |         ROW_NUMBER() OVER (PARTITION BY hour, event_type
             |           ORDER BY ts, event_id) AS rn_a,
             |         ROW_NUMBER() OVER (PARTITION BY hour, event_type
             |           ORDER BY ts DESC, event_id DESC) AS rn_d
             |  FROM base)
             |SELECT hour, event_type, CAST(COUNT(*) AS BIGINT) AS n,
             |       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
             |       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
             |       MIN(value) AS low, MAX(value) AS high
             |FROM r GROUP BY hour, event_type""".stripMargin)),

    QueryDef(
      "q71_retention", // cohort retention — the classic product-analytics
                       // triangle: users cohorted by first-active ISO week,
                       // retention = the share of each cohort active again
                       // N weeks later. Activity collapses to distinct
                       // (user, week) FIRST (the exchange carries user-week
                       // rows, not raw events), the per-user cohort hangs
                       // off the same user-keyed exchange, and cohort sizes
                       // are a dimension-bounded frame joined back
                       // broadcast. week_offset is exact integer day
                       // arithmetic (div 7 — both week starts are Mondays
                       // by ISO date_trunc in both engines); rate divides
                       // identical longs and rounds HALF_UP. At 100 TB the
                       // only corpus-sized shuffle is the user-week
                       // distinct; everything after is cohort×weeks-sized.
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"),
            to_date(date_trunc("week", col("ts"))).as("wk"))
          .distinct()
        val cohort = ev.groupBy("user_id").agg(min(col("wk")).as("cw"))
        val sizes = cohort.groupBy("cw")
          .agg(count(lit(1)).as("cohort_n"))
        ev.join(cohort, "user_id")
          .select(col("cw"),
            expr("datediff(wk, cw) div 7").as("week_offset"))
          .groupBy("cw", "week_offset")
          .agg(count(lit(1)).as("n_active"))
          .join(broadcast(sizes), "cw")
          .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
            col("week_offset"), col("n_active"), col("cohort_n"),
            round(col("n_active").cast("double") /
              col("cohort_n").cast("double"), 6).as("retention"))
      },
      Some("""WITH uw AS (
             |  SELECT DISTINCT user_id,
             |         CAST(date_trunc('week', ts) AS DATE) AS wk
             |  FROM events),
             |cohort AS (SELECT user_id, MIN(wk) AS cw FROM uw
             |           GROUP BY user_id),
             |sizes AS (SELECT cw, COUNT(*) AS cohort_n FROM cohort
             |          GROUP BY cw),
             |act AS (
             |  SELECT c.cw, (u.wk - c.cw) // 7 AS week_offset,
             |         COUNT(*) AS n_active
             |  FROM uw u JOIN cohort c USING (user_id)
             |  GROUP BY 1, 2)
             |SELECT strftime(a.cw, '%Y-%m-%d') AS cohort_week,
             |       a.week_offset, a.n_active, s.cohort_n,
             |       ROUND(CAST(a.n_active AS DOUBLE) /
             |             CAST(s.cohort_n AS DOUBLE), 6) AS retention
             |FROM act a JOIN sizes s USING (cw)""".stripMargin)),

    QueryDef(
      "q72_rfm", // RFM user segmentation — recency/frequency/monetary
                 // quartile scores (4 = best: most recent, most frequent,
                 // highest spend), the classic marketing-analytics cut of
                 // an event stream. One corpus-sized exchange (the user
                 // groupBy, partial-aggregated map-side). The quartile
                 // scores are NTILE(4) in closed form over a DISTRIBUTED
                 // global rank — an unpartitioned NTILE window would
                 // funnel the whole user dimension through one task three
                 // times (fine at sf0.1, the classic single-task sort
                 // bottleneck at 10⁸–10⁹ users). Two-phase range rank
                 // instead, over ONE range partitioning for all three
                 // metrics (the round-6 form re-sampled and re-shuffled
                 // the user table once per metric — 3 sampling jobs; the
                 // gap was pure scheduling latency): each user explodes
                 // to three (metric_id, value) rows — recency negated so
                 // ASC order matches NTILE ... ORDER BY r DESC — and one
                 // repartitionByRange on (metric_id, value, user_id)
                 // clusters each metric into contiguous partition runs.
                 // A heavy value still SPREADS across partitions by
                 // user_id range, so value skew cannot re-create the
                 // funnel. Per-(partition, metric) counts become
                 // cumulative offsets via a (3·|partitions|)²-bounded
                 // self-join (no unpartitioned window anywhere), a
                 // (pid, metric)-partitioned row_number supplies the
                 // remainder, and the NTILE bucket of (rank, n) is
                 // arithmetic: the first n%4 buckets take ceil(n/4)
                 // ranks, the rest floor(n/4) — bit-identical to the
                 // oracle's NTILE(4) with the same tie-break. The pivot
                 // back to one row per user is a user_id groupBy (the
                 // DOUBLE metric values are exact: day counts and event
                 // counts are integers < 2^53, and monetary is already
                 // the DECIMAL-cast sum cast to double).
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("dt"), col("value"))
        val users = ev.groupBy("user_id")
          .agg(max(col("dt")).as("last_d"), count(lit(1)).as("f"),
            sumd(col("value")).as("m"))
        val anchored = users
          .crossJoin(broadcast(ev.agg(max(col("dt")).as("maxd"))))
          .select(col("user_id"), datediff(col("maxd"), col("last_d"))
            .as("r"), col("f"), col("m"))
          .crossJoin(broadcast(users.agg(count(lit(1)).as("n"))))
        import org.apache.spark.sql.expressions.Window
        def ntile4(rk: Column, n: Column): Column = {
          val base = floor(n / lit(4)).cast("long")
          val rem = (n % lit(4)).cast("long")
          val cut = rem * (base + lit(1))
          when(rk <= cut,
            floor((rk + base) / (base + lit(1))).cast("long"))
            .otherwise(rem +
              floor((rk - cut + base - lit(1)) / base).cast("long"))
        }
        val metricRows = anchored
          .select(col("user_id"), col("r"), col("f"), col("m"), col("n"),
            explode(array(
              struct(lit(0).as("mid"), (-col("r")).cast("double").as("v")),
              struct(lit(1).as("mid"), col("f").cast("double").as("v")),
              struct(lit(2).as("mid"), col("m").as("v")))).as("e"))
          .select(col("user_id"), col("r"), col("f"), col("m"), col("n"),
            col("e.mid").as("mid"), col("e.v").as("v"))
        val parted = metricRows
          .repartitionByRange(col("mid").asc, col("v").asc,
            col("user_id").asc)
          .withColumn("pid", spark_partition_id())
        val hist = parted.groupBy("pid", "mid").agg(count(lit(1)).as("c"))
        val offs = hist
          .join(hist.select(col("mid").as("m2"), col("pid").as("p2"),
            col("c").as("c2")),
            col("m2") === col("mid") && col("p2") < col("pid"), "left")
          .groupBy("pid", "mid")
          .agg(coalesce(sum(col("c2")), lit(0L)).as("off"))
        val w = Window.partitionBy("pid", "mid")
          .orderBy(col("v").asc, col("user_id").asc)
        // materialize the rank BEFORE ntile4 references it (the bucket
        // arithmetic uses rk three times; inlining would plan three
        // identical row_number window expressions)
        val scoredRows = parted.join(broadcast(offs), Seq("pid", "mid"))
          .withColumn("rk", col("off") + row_number().over(w))
          .withColumn("sc", ntile4(col("rk"), col("n")))
        scoredRows.groupBy("user_id")
          .agg(max(col("r")).as("r"), max(col("f")).as("f"),
            max(col("m")).as("m"),
            max(when(col("mid") === 0, col("sc"))).as("r_s"),
            max(when(col("mid") === 1, col("sc"))).as("f_s"),
            max(when(col("mid") === 2, col("sc"))).as("m_s"))
          .select(col("user_id"), col("r"), col("f"), col("m"),
            col("r_s"), col("f_s"), col("m_s"),
            concat(col("r_s"), col("f_s"), col("m_s")).as("segment"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, CAST(ts::TIMESTAMP AS DATE) AS dt, value
             |  FROM events),
             |u AS (SELECT user_id, MAX(dt) AS last_d,
             |             CAST(COUNT(*) AS BIGINT) AS f,
             |             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             |               AS m
             |      FROM ev GROUP BY user_id),
             |a AS (SELECT user_id,
             |             CAST((SELECT MAX(dt) FROM ev) - last_d AS INT)
             |               AS r, f, m
             |      FROM u)
             |SELECT user_id, r, f, m, r_s, f_s, m_s,
             |       CAST(r_s AS VARCHAR) || CAST(f_s AS VARCHAR) ||
             |       CAST(m_s AS VARCHAR) AS segment
             |FROM (SELECT user_id, r, f, m,
             |        NTILE(4) OVER (ORDER BY r DESC, user_id) AS r_s,
             |        NTILE(4) OVER (ORDER BY f ASC, user_id) AS f_s,
             |        NTILE(4) OVER (ORDER BY m ASC, user_id) AS m_s
             |      FROM a)""".stripMargin)),

    QueryDef(
      "q73_event_cooccurrence", // market-basket association over the event
                                // stream, with 30-min sessions as baskets
                                // (q61's gaps-and-islands kernel): for
                                // every unordered pair of event types, the
                                // number of sessions containing both, with
                                // support (share of all sessions) and lift
                                // (observed / expected-under-independence).
                                // Scale shape: sessionization is the
                                // user-partitioned window q61 documents;
                                // the corpus-sized work after it is ONE
                                // distinct of (user, session, type); the
                                // self-join's per-basket fan-out is bounded
                                // by the event-type domain squared (d98's
                                // bounded self-join discipline — |types| is
                                // a catalog dimension, not data-sized), and
                                // the per-type totals + basket count are
                                // domain-sized broadcasts. support and lift
                                // are single divisions of exact integers
                                // (< 2^53), so both engines produce
                                // bit-identical doubles.
      (s, d) => {
        val byUser = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        val newSession = when(
          col("ts").cast("long") - lag(col("ts"), 1).over(byUser).cast("long")
            > 1800, 1).otherwise(0)
        // ONE sessionize + distinct execution. Round 13: the pinned
        // repartition this used to rely on is NOT reuse-safe — column
        // pruning specializes each consumer's copy of the subtree BELOW
        // the pin (pairs need all 3 columns, perType only event_type,
        // total only the session key), and the profiled plan materialized
        // THREE variant exchanges, re-running the corpus-sized sessionize
        // window per consumer. localCheckpoint materializes the distinct
        // session set once — the same bytes the pin already wrote to
        // shuffle disk, now written once and actually shared.
        val ue = t(s, d, "events")
          .withColumn("new_s", coalesce(newSession, lit(0)))
          .withColumn("session_idx",
            sum(col("new_s")).over(
              byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .select(col("user_id"), col("session_idx"), col("event_type"))
          .distinct()
          // CORPUS-scale frame (|distinct session-events| ≤ |events|), so
          // the lineage cut goes through Graft.cut: reliable storage when
          // GRAFT_CHECKPOINT_DIR is set (executor loss on a preemptible
          // cluster would otherwise fail the job — localCheckpoint blocks
          // are unrecoverable), localCheckpoint in single-JVM bench/tests.
          .transform(Graft.cut(_))
        val pairs = ue
          .select(col("user_id"), col("session_idx"),
            col("event_type").as("et_a"))
          .join(ue.select(col("user_id"), col("session_idx"),
            col("event_type").as("et_b")), Seq("user_id", "session_idx"))
          .filter(col("et_a") < col("et_b"))
          .groupBy("et_a", "et_b").agg(count(lit(1)).as("n_ab"))
        val perType = ue.groupBy("event_type").agg(count(lit(1)).as("n_t"))
        val total = ue.agg(
          countDistinct(col("user_id"), col("session_idx")).as("n_baskets"))
        pairs
          .join(broadcast(perType.select(col("event_type").as("et_a"),
            col("n_t").as("n_a"))), "et_a")
          .join(broadcast(perType.select(col("event_type").as("et_b"),
            col("n_t").as("n_b"))), "et_b")
          .crossJoin(broadcast(total))
          .select(col("et_a"), col("et_b"), col("n_ab"),
            col("n_a"), col("n_b"),
            round(col("n_ab").cast("double") /
              col("n_baskets").cast("double"), 6).as("support"),
            round(col("n_ab").cast("double") *
              col("n_baskets").cast("double") /
              (col("n_a").cast("double") * col("n_b").cast("double")), 6)
              .as("lift"))
      },
      Some("""WITH s AS (
             |  SELECT user_id, event_type,
             |         CAST(SUM(new_s) OVER (
             |           PARTITION BY user_id ORDER BY ts, event_id
             |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
             |  FROM (SELECT user_id, event_id, ts, event_type,
             |          CASE WHEN epoch(ts) - epoch(LAG(ts, 1) OVER (
             |                 PARTITION BY user_id ORDER BY ts, event_id))
             |                 > 1800
             |               THEN 1 ELSE 0 END AS new_s
             |        FROM events)),
             |ue AS (SELECT DISTINCT user_id, session_idx, event_type
             |       FROM s),
             |tot AS (SELECT CAST(COUNT(DISTINCT (user_id, session_idx))
             |          AS BIGINT) AS n_b FROM ue),
             |pt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t
             |       FROM ue GROUP BY 1),
             |pr AS (SELECT a.event_type AS et_a, b.event_type AS et_b,
             |              CAST(COUNT(*) AS BIGINT) AS n_ab
             |       FROM ue a
             |       JOIN ue b ON a.user_id = b.user_id
             |                AND a.session_idx = b.session_idx
             |                AND a.event_type < b.event_type
             |       GROUP BY 1, 2)
             |SELECT et_a, et_b, n_ab, pa.n_t AS n_a, pb.n_t AS n_b,
             |       ROUND(CAST(n_ab AS DOUBLE) /
             |             CAST(tot.n_b AS DOUBLE), 6) AS support,
             |       ROUND(CAST(n_ab AS DOUBLE) * CAST(tot.n_b AS DOUBLE)
             |             / (CAST(pa.n_t AS DOUBLE) *
             |                CAST(pb.n_t AS DOUBLE)), 6) AS lift
             |FROM pr
             |JOIN pt pa ON pr.et_a = pa.event_type
             |JOIN pt pb ON pr.et_b = pb.event_type
             |CROSS JOIN tot""".stripMargin)),

    QueryDef(
      "q74_session_transitions", // first-order Markov transition matrix
                                 // over in-session event SEQUENCES — the
                                 // ordered counterpart of q73's unordered
                                 // co-occurrence (user-path analysis:
                                 // "after a view, what happens next?").
                                 // For every (from, to) event-type pair:
                                 // consecutive-within-session occurrence
                                 // count, the from-type's total outgoing
                                 // transitions, and the conditional
                                 // probability. Scale shape: ONE
                                 // user-partitioned window pass computes
                                 // the session index (q61's
                                 // gaps-and-islands) AND the successor via
                                 // lead over the SAME (partition, order)
                                 // spec — cross-session successors are
                                 // nulled by comparing the led session
                                 // index, so no second exchange keyed by
                                 // session is ever needed. After the
                                 // window the corpus collapses to the
                                 // |types|²-bounded transition counts;
                                 // the row-total frame broadcasts back.
                                 // p is one division of exact integers —
                                 // bit-identical across engines.
      (s, d) => {
        val byUser = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        val newSession = when(
          col("ts").cast("long") - lag(col("ts"), 1).over(byUser).cast("long")
            > 1800, 1).otherwise(0)
        val trans = t(s, d, "events")
          .withColumn("new_s", coalesce(newSession, lit(0)))
          .withColumn("session_idx",
            sum(col("new_s")).over(
              byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
          .withColumn("to_sess", lead(col("session_idx"), 1).over(byUser))
          .filter(col("to_type").isNotNull &&
            col("to_sess") === col("session_idx"))
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        val fromTot = trans.groupBy("from_type")
          .agg(sum(col("n")).cast("long").as("n_from"))
        trans.join(broadcast(fromTot), "from_type")
          .select(col("from_type"), col("to_type"), col("n"),
            col("n_from"),
            round(col("n").cast("double") /
              col("n_from").cast("double"), 6).as("p"))
      },
      Some("""WITH s AS (
             |  SELECT user_id, event_id, ts, event_type,
             |         CAST(SUM(new_s) OVER (
             |           PARTITION BY user_id ORDER BY ts, event_id
             |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
             |  FROM (SELECT user_id, event_id, ts, event_type,
             |          CASE WHEN epoch(ts) - epoch(LAG(ts, 1) OVER (
             |                 PARTITION BY user_id ORDER BY ts, event_id))
             |                 > 1800
             |               THEN 1 ELSE 0 END AS new_s
             |        FROM events)),
             |tr AS (
             |  SELECT event_type AS from_type,
             |         LEAD(event_type, 1) OVER w AS to_type,
             |         LEAD(session_idx, 1) OVER w AS to_sess,
             |         session_idx
             |  FROM s WINDOW w AS (PARTITION BY user_id
             |                      ORDER BY ts, event_id)),
             |cnt AS (SELECT from_type, to_type,
             |               CAST(COUNT(*) AS BIGINT) AS n
             |        FROM tr
             |        WHERE to_type IS NOT NULL AND to_sess = session_idx
             |        GROUP BY 1, 2),
             |ft AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
             |       FROM cnt GROUP BY 1)
             |SELECT c.from_type, c.to_type, c.n, f.n_from,
             |       ROUND(CAST(c.n AS DOUBLE) /
             |             CAST(f.n_from AS DOUBLE), 6) AS p
             |FROM cnt c JOIN ft f USING (from_type)""".stripMargin)),

    QueryDef(
      "q75_tpch_regional_revenue", // TPC-H Q5 shape — the canonical
                                   // 6-table join-order test: per-nation
                                   // revenue where customer and supplier
                                   // share a nation inside one region and
                                   // one order year. The plan-quality
                                   // showcase: everything is DECLARED —
                                   // pruned scans with pushed filters,
                                   // equi-joins in algebra order — and
                                   // Catalyst + AQE pick the physical
                                   // strategy. Only region→nation carries
                                   // an explicit broadcast (a true
                                   // catalog dimension at ANY scale);
                                   // customer/supplier/orders are left
                                   // unhinted because at 100 TB they are
                                   // fact-sized and must be free to
                                   // shuffle-join — at bench scale AQE
                                   // promotes them to broadcast on its
                                   // own, which is exactly the
                                   // scale-adaptive behavior wanted.
                                   // Revenue is the quantized-long exact
                                   // sum (sumq), so the group totals are
                                   // partition-order independent.
      (s, d) => {
        val nat = t(s, d, "nation")
          .join(broadcast(t(s, d, "region")
            .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val cust = t(s, d, "customer").select("c_custkey", "c_nationkey")
        val supp = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") >= "1996-01-01" &&
            col("o_orderdate") < "1997-01-01")
          .select("o_orderkey", "o_custkey")
        val li = t(s, d, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_extendedprice",
            "l_discount")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(sumq(col("l_extendedprice") * (lit(1) - col("l_discount")),
            4).as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT n_name,
             |       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
             |              * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000
             |         AS revenue,
             |       COUNT(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |              AND s_nationkey = c_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY n_name""".stripMargin)),

    QueryDef(
      "q76_tpch_market_share", // TPC-H Q8 shape — national market share:
                               // of all PROMO-part revenue sold into ASIA
                               // customers, what fraction came from
                               // NATION_7 suppliers, per order year. The
                               // two-sided dimension pattern: nation joins
                               // BOTH fact legs (customer region
                               // membership and supplier identity), so the
                               // 25-row nation/region frames broadcast
                               // twice while the three fact tables
                               // (lineitem, orders, customer) stay free to
                               // shuffle-join. The share is a conditional
                               // aggregate over ONE joined stream — no
                               // second pass, no self-join. Numerator and
                               // denominator are quantized-long exact, so
                               // the 6-dp share is bit-identical across
                               // engines and partition orders.
      (s, d) => {
        val asiaNations = t(s, d, "nation")
          .join(broadcast(t(s, d, "region")
            .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("asia_nk"))
        val suppNation = t(s, d, "nation")
          .select(col("n_nationkey").as("sn_nk"),
            col("n_name").as("supp_nation"))
        val pts = t(s, d, "part").filter(col("p_type") === "PROMO")
          .select("p_partkey")
        val cust = t(s, d, "customer").select("c_custkey", "c_nationkey")
          .join(broadcast(asiaNations), col("c_nationkey") === col("asia_nk"))
          .select("c_custkey")
        val ord = t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_orderdate")
        val volq = floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 10000 + 0.5).cast("long")
        t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            volq.as("volq"))
          .join(broadcast(pts), col("l_partkey") === col("p_partkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "supplier")
            .select("s_suppkey", "s_nationkey")
            .join(broadcast(suppNation), col("s_nationkey") === col("sn_nk"))
            .select("s_suppkey", "supp_nation")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            (sum(when(col("supp_nation") === "NATION_7", col("volq"))
              .otherwise(0L)).cast("double") / 10000).as("nation_volume"),
            (sum(col("volq")).cast("double") / 10000).as("total_volume"),
            round(sum(when(col("supp_nation") === "NATION_7", col("volq"))
              .otherwise(0L)).cast("double") /
              sum(col("volq")).cast("double"), 6).as("mkt_share"))
      },
      Some("""SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)
             |         AS o_year,
             |       CAST(SUM(CASE WHEN n2.n_name = 'NATION_7'
             |                     THEN volq ELSE 0 END) AS DOUBLE) / 10000
             |         AS nation_volume,
             |       CAST(SUM(volq) AS DOUBLE) / 10000 AS total_volume,
             |       ROUND(CAST(SUM(CASE WHEN n2.n_name = 'NATION_7'
             |                          THEN volq ELSE 0 END) AS DOUBLE) /
             |             CAST(SUM(volq) AS DOUBLE), 6) AS mkt_share
             |FROM (SELECT l_orderkey, l_partkey, l_suppkey,
             |             CAST(FLOOR(l_extendedprice * (1 - l_discount)
             |               * 10000 + 0.5) AS BIGINT) AS volq
             |      FROM lineitem) l
             |JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO'
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation n1 ON c_nationkey = n1.n_nationkey
             |JOIN region ON n1.n_regionkey = r_regionkey
             |             AND r_name = 'ASIA'
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation n2 ON s_nationkey = n2.n_nationkey
             |GROUP BY 1""".stripMargin)),

    QueryDef(
      "q77_tpch_small_qty",    // TPC-H Q17 shape — the canonical
                               // CORRELATED SCALAR SUBQUERY, decorrelated:
                               // "lineitems whose quantity is below half
                               // the average for their part". The naive
                               // form re-scans lineitem per part; the
                               // scale shape is ONE restricted scan,
                               // grouped per part, joined back — and both
                               // the per-part aggregate and the join key
                               // on l_partkey, so the single exchange is
                               // reused across agg and join (no second
                               // shuffle). The threshold compare is exact
                               // integer algebra: qty < avg/2  ⇔
                               // 2·q100·cnt < sum(q100), so no float
                               // division can flip a boundary row between
                               // engines.
      (s, d) => {
        val pts = t(s, d, "part").filter(col("p_brand") === "Brand#4")
          .select("p_partkey")
        val li = t(s, d, "lineitem")
          .select(col("l_partkey"),
            floor(col("l_quantity") * 100 + 0.5).cast("long").as("q100"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("long")
              .as("ep100"))
          .join(broadcast(pts), col("l_partkey") === col("p_partkey"))
          .select("l_partkey", "q100", "ep100")
        val perPart = li.groupBy("l_partkey")
          .agg(sum(col("q100")).as("sq"), count(lit(1)).as("cnt"))
        li.join(perPart, "l_partkey")
          .filter(lit(2) * col("q100") * col("cnt") < col("sq"))
          .agg((sum(col("ep100")).cast("double") / 100 / 7.0)
            .as("avg_yearly"),
            count(lit(1)).as("n_small"))
      },
      Some("""WITH li AS (
             |  SELECT l_partkey,
             |         CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)
             |           AS q100,
             |         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
             |           AS ep100
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  WHERE p_brand = 'Brand#4'),
             |ag AS (SELECT l_partkey, CAST(SUM(q100) AS BIGINT) AS sq,
             |              COUNT(*) AS cnt
             |       FROM li GROUP BY 1)
             |SELECT CAST(SUM(ep100) AS DOUBLE) / 100 / 7.0 AS avg_yearly,
             |       COUNT(*) AS n_small
             |FROM li JOIN ag USING (l_partkey)
             |WHERE 2 * q100 * cnt < sq""".stripMargin)),

    QueryDef(
      "q78_tpch_large_orders", // TPC-H Q18 shape — large-volume orders:
                               // GROUP BY + HAVING as a SEMI-style
                               // reduction feeding a join. The aggregate
                               // runs FIRST (lineitem collapses to
                               // per-order totals before touching orders/
                               // customer), so the expensive fact-fact
                               // join happens on the ~0.1% surviving
                               // HAVING — the order every optimizer wants
                               // and the one declared here. Top-k via
                               // TakeOrderedAndProject (no global sort),
                               // tie-broken on the unique order key.
      (s, d) => {
        val big = t(s, d, "lineitem")
          .select(col("l_orderkey"),
            floor(col("l_quantity") * 100 + 0.5).cast("long").as("q100"))
          .groupBy("l_orderkey")
          .agg(sum(col("q100")).as("sq100"))
          .filter(col("sq100") > 300 * 100)
        big.join(t(s, d, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"),
            (col("sq100").cast("double") / 100).as("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(20)
      },
      Some("""WITH big AS (
             |  SELECT l_orderkey,
             |         CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS sq100
             |  FROM lineitem GROUP BY 1
             |  HAVING SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT))
             |         > 30000)
             |SELECT c_name, c_custkey, o_orderkey, o_orderdate,
             |       o_totalprice,
             |       CAST(sq100 AS DOUBLE) / 100 AS total_qty
             |FROM big
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_totalprice DESC, o_orderkey ASC
             |LIMIT 20""".stripMargin)),

    QueryDef(
      "q79_tpch_sleepers",     // TPC-H Q22 shape — dormant high-balance
                               // accounts: customers with an above-
                               // average positive balance and NO order in
                               // the most recent window (the synthetic
                               // keys are dense, so Q22's literal
                               // "never ordered" set is empty — the
                               // recency filter keeps the anti-join
                               // non-vacuous while preserving the shape),
                               // grouped by nation. Two classic patterns
                               // in one plan: a SCALAR subquery threshold
                               // (the positive-balance average, one
                               // broadcast row) and NOT EXISTS as a
                               // LEFT ANTI join against the fact table.
                               // The threshold compare is exact integer
                               // algebra — bal > avg ⇔ bal·n > sum over
                               // quantized longs — so no engine rounds a
                               // boundary customer differently. The anti
                               // join shuffles both sides on custkey at
                               // real scale (correct: orders is fact-
                               // sized); AQE promotes at bench scale.
      (s, d) => {
        val cust = t(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
            floor(col("c_acctbal") * 100 + 0.5).cast("long").as("bq"))
        val thr = cust.filter(col("bq") > 0)
          .agg(sum(col("bq")).as("s"), count(lit(1)).as("n"))
        cust.crossJoin(broadcast(thr))
          .filter(col("bq") * col("n") > col("s"))
          .join(t(s, d, "orders")
            .filter(col("o_orderdate") >= "2000-01-01")
            .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("numcust"),
            (sum(col("bq")).cast("double") / 100).as("totacctbal"))
      },
      Some("""WITH cust AS (
             |  SELECT c_custkey, c_nationkey,
             |         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bq
             |  FROM customer),
             |thr AS (SELECT CAST(SUM(bq) AS BIGINT) AS s,
             |               COUNT(*) AS n
             |        FROM cust WHERE bq > 0)
             |SELECT c_nationkey, COUNT(*) AS numcust,
             |       CAST(SUM(bq) AS DOUBLE) / 100 AS totacctbal
             |FROM cust CROSS JOIN thr
             |WHERE bq * n > s
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
             |GROUP BY c_nationkey""".stripMargin)),

    QueryDef(
      "q80_tpch_supplier_variety", // TPC-H Q16 shape — supplier variety
                               // per part attribute: how many DISTINCT
                               // suppliers ship each (brand, type, size)
                               // combination, excluding a blocked supplier
                               // set (the NOT IN subquery). The blocked
                               // set anti-joins broadcast and part prunes
                               // via a broadcast join — both map-side —
                               // and the single distinct aggregate's own
                               // PARTIAL (group key + suppkey) collapses
                               // duplicate pairs before the only corpus-
                               // sized exchange. Deliberately no separate
                               // `.distinct()` first: COUNT(DISTINCT)
                               // already dedups map-side, and a
                               // pre-distinct adds a THIRD full shuffle
                               // of the pair stream for nothing (3 → 2
                               // exchanges; at sf0.1 the win is modest —
                               // the string-keyed hash agg dominates —
                               // but at 100 TB the saved exchange is a
                               // full pair-stream shuffle); a single
                               // distinct agg also never Expands.
      (s, d) => {
        val blocked = t(s, d, "supplier")
          .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
        val pts = t(s, d, "part")
          .filter(col("p_brand") =!= "Brand#4" && col("p_type") =!= "PROMO")
          .select("p_partkey", "p_brand", "p_type", "p_size")
        // tableParallelBy: the string-keyed distinct partial aggregate
        // is the query's whole cost and a single-row-group input would
        // run it on one core (profiled 0.95 s CPU single-task); hashing
        // on l_partkey (high-cardinality) skips the round-robin
        // repartition's local input sort.
        Graft.tableParallelBy(s, d, "lineitem", "l_partkey")
          .select(col("l_partkey"), col("l_suppkey"))
          .join(broadcast(blocked),
            col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(pts, col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      },
      Some("""SELECT p_brand, p_type, p_size,
             |       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)
             |         AS supplier_cnt
             |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
             |JOIN part ON p_partkey = l_partkey
             |WHERE p_brand <> 'Brand#4' AND p_type <> 'PROMO'
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
             |                        WHERE s_acctbal < 0)
             |GROUP BY 1, 2, 3""".stripMargin)),

    QueryDef(
      "q81_tpch_late_orders",  // TPC-H Q4 shape — order-priority check:
                               // of one quarter's orders, how many had at
                               // least one lineitem shipped > 30 days
                               // after the order date, per priority
                               // class. The canonical EXISTS-with-
                               // CORRELATED-PREDICATE: a LEFT SEMI join
                               // whose condition mixes the equi key
                               // (orderkey) with a non-equi compare
                               // referencing BOTH sides (shipdate vs
                               // order date + 30d) — the equi part still
                               // drives the join strategy, the residual
                               // rides as a join filter, and each order
                               // counts ONCE no matter how many late
                               // lines (semi, not inner+distinct). The
                               // date filter prunes orders at the scan.
      (s, d) => {
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") >= "1996-01-01" &&
            col("o_orderdate") < "1996-04-01")
          .select("o_orderkey", "o_orderdate", "o_orderpriority")
        val li = t(s, d, "lineitem").select("l_orderkey", "l_shipdate")
        ord.join(li,
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") +
                expr("INTERVAL 30 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
             |FROM orders o
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1996-04-01'
             |  AND EXISTS (SELECT 1 FROM lineitem l
             |              WHERE l.l_orderkey = o.o_orderkey
             |                AND l.l_shipdate > o.o_orderdate
             |                    + INTERVAL 30 DAY)
             |GROUP BY o_orderpriority""".stripMargin)),

    QueryDef(
      "q82_tpch_waiting_suppliers", // TPC-H Q21 shape — the hardest
                               // classic: suppliers who were the SOLE
                               // late shipper on a multi-supplier
                               // finished order (lateness adapted to
                               // this schema as shipdate > order date +
                               // 30d, q81's convention). Canonically two
                               // correlated SELF-joins on the fact table
                               // (EXISTS another supplier; NOT EXISTS
                               // another LATE supplier); here ONE
                               // per-order aggregation replaces both:
                               // dedup to (order, supplier, any-late),
                               // then per order count suppliers and late
                               // suppliers — a waiter's order needs
                               // nsupp ≥ 2 ∧ nlate = 1. The two-level
                               // agg partial-collapses map-side and
                               // never Expands (no multi-distinct), and
                               // the fact table is scanned/shuffled a
                               // bounded number of times instead of
                               // three self-join legs at 100 TB. The
                               // oracle runs the CANONICAL EXISTS/NOT
                               // EXISTS form — two independently derived
                               // plans must agree row-for-row. Top-10 by
                               // numwait with s_name tiebreak (unique),
                               // via TakeOrdered, never a global sort.
      (s, d) => {
        val ord = t(s, d, "orders")
          .filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate")
        val lf = t(s, d, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_shipdate")
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_suppkey"),
            (col("l_shipdate") > col("o_orderdate") +
              expr("INTERVAL 30 DAYS")).as("late"))
        val stats = lf
          .groupBy("l_orderkey", "l_suppkey")
          .agg(max(col("late")).as("slate"))
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("nsupp"),
            sum(when(col("slate"), 1L).otherwise(0L)).as("nlate"))
          .filter(col("nsupp") >= 2 && col("nlate") === 1)
          .select("l_orderkey")
        lf.filter(col("late"))
          .join(stats, "l_orderkey")
          .groupBy("l_suppkey")
          .agg(count(lit(1)).as("numwait"))
          .join(broadcast(t(s, d, "supplier")
            .select("s_suppkey", "s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .orderBy(col("numwait").desc, col("s_name").asc)
          .select("s_name", "numwait")
          .limit(10)
      },
      Some("""WITH lf AS (
             |  SELECT l.l_orderkey, l.l_suppkey,
             |         l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
             |           AS late
             |  FROM lineitem l JOIN orders o
             |    ON o.o_orderkey = l.l_orderkey
             |  WHERE o.o_orderstatus = 'F')
             |SELECT s_name, numwait FROM (
             |  SELECT w.l_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
             |  FROM lf w
             |  WHERE w.late
             |    AND EXISTS (SELECT 1 FROM lf o2
             |                WHERE o2.l_orderkey = w.l_orderkey
             |                  AND o2.l_suppkey <> w.l_suppkey)
             |    AND NOT EXISTS (SELECT 1 FROM lf o3
             |                    WHERE o3.l_orderkey = w.l_orderkey
             |                      AND o3.l_suppkey <> w.l_suppkey
             |                      AND o3.late)
             |  GROUP BY 1) wa
             |JOIN supplier ON s_suppkey = wa.l_suppkey
             |ORDER BY numwait DESC, s_name
             |LIMIT 10""".stripMargin)),

    QueryDef(
      "q83_tpch_cust_distribution", // TPC-H Q13 shape — customer order-
                               // count distribution: how many customers
                               // placed 0, 1, 2, … non-urgent orders.
                               // The canonical LEFT OUTER JOIN + DOUBLE
                               // aggregation, with the zero bucket alive
                               // (customers with no qualifying orders
                               // must appear — an inner join would drop
                               // them). Spark-first: count per customer
                               // on the ORDERS side first (fact-sized
                               // agg whose partials collapse map-side),
                               // then LEFT join the slim count frame to
                               // the customer spine and histogram — the
                               // joined stream is never re-shuffled,
                               // unlike the join-then-group form, and at
                               // 100 TB the saved exchange is the full
                               // customer×orders stream. coalesce(cnt,0)
                               // keeps the zero bucket exact.
      (s, d) => {
        val cnts = t(s, d, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("cnt"))
        t(s, d, "customer").select("c_custkey")
          .join(cnts, col("c_custkey") === col("o_custkey"), "left")
          .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
      },
      Some("""SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
             |FROM (
             |  SELECT COALESCE(cnt, 0) AS c_count
             |  FROM customer LEFT JOIN (
             |    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt
             |    FROM orders WHERE o_orderpriority <> '1-URGENT'
             |    GROUP BY 1) oc
             |  ON c_custkey = oc.o_custkey)
             |GROUP BY 1""".stripMargin)),

    QueryDef(
      "q84_tpch_top_supplier",  // TPC-H Q15 shape — the top supplier by
                               // one quarter's revenue: the classic
                               // aggregate-then-compare-to-its-own-MAX
                               // (the reference grammar's CREATE VIEW +
                               // scalar subquery; Spark reuses the agg
                               // exchange for both consumers). Revenue
                               // is quantized to LONG units BEFORE the
                               // max-equality compare, so the "achieves
                               // the maximum" predicate is exact integer
                               // algebra — no engine rounds the boundary
                               // supplier differently — and only the
                               // surfaced column divides back to
                               // currency. One fact scan, one supplier-
                               // keyed agg; the 1-row max broadcasts and
                               // the name decoration joins broadcast.
      (s, d) => {
        val rev = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= "1996-01-01" &&
            col("l_shipdate") < "1996-04-01")
          .select(col("l_suppkey"),
            floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * 10000 + 0.5).cast("long").as("rq"))
          .groupBy("l_suppkey")
          .agg(sum(col("rq")).as("rq"))
        val mx = rev.agg(max(col("rq")).as("mrq"))
        rev.crossJoin(broadcast(mx))
          .filter(col("rq") === col("mrq"))
          .join(broadcast(t(s, d, "supplier")
            .select("s_suppkey", "s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            (col("rq").cast("double") / 10000).as("total_revenue"))
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey,
             |         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
             |             * 10000 + 0.5) AS BIGINT)) AS rq
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate < TIMESTAMP '1996-04-01'
             |  GROUP BY 1)
             |SELECT s_suppkey, s_name, CAST(rq AS DOUBLE) / 10000
             |         AS total_revenue
             |FROM rev JOIN supplier ON s_suppkey = l_suppkey
             |WHERE rq = (SELECT MAX(rq) FROM rev)""".stripMargin)),

    QueryDef(
      "q85_tpch_returned_items", // TPC-H Q10 shape — the returned-item
                               // report: customers ranked by the revenue
                               // they returned in one quarter (flag 'R'),
                               // decorated with their nation. The shape
                               // this adds to the inventory: a top-k
                               // over a HIGH-CARDINALITY group key
                               // (customer) fed by a 4-table join — the
                               // revenue agg groups on the join key it
                               // arrived partitioned by (custkey, one
                               // exchange serves join and agg), the
                               // nation decoration broadcasts AFTER the
                               // aggregate (|customers| rows, not the
                               // fact stream), and the top-20 is
                               // TakeOrdered, never a global sort.
                               // Revenue in exact LONG units until the
                               // surfaced column (q84's discipline);
                               // c_custkey tiebreak makes the LIMIT
                               // boundary deterministic.
      (s, d) => {
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") >= "1996-01-01" &&
            col("o_orderdate") < "1996-04-01")
          .select("o_orderkey", "o_custkey")
        val ret = t(s, d, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"),
            floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * 10000 + 0.5).cast("long").as("rq"))
        val cust = t(s, d, "customer")
          .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
        ret.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_custkey")
          .agg(sum(col("rq")).as("rq"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")
            .select("n_nationkey", "n_name")),
            col("c_nationkey") === col("n_nationkey"))
          .orderBy(col("rq").desc, col("c_custkey").asc)
          .select(col("c_custkey"), col("c_name"),
            (col("rq").cast("double") / 10000).as("revenue"),
            col("c_acctbal"), col("n_name"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name,
             |       CAST(rq AS DOUBLE) / 10000 AS revenue,
             |       c_acctbal, n_name
             |FROM (
             |  SELECT o_custkey,
             |         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
             |             * 10000 + 0.5) AS BIGINT)) AS rq
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE l_returnflag = 'R'
             |    AND o_orderdate >= TIMESTAMP '1996-01-01'
             |    AND o_orderdate < TIMESTAMP '1996-04-01'
             |  GROUP BY 1) r
             |JOIN customer ON c_custkey = r.o_custkey
             |JOIN nation ON n_nationkey = c_nationkey
             |ORDER BY rq DESC, c_custkey
             |LIMIT 20""".stripMargin)),

    QueryDef(
      "q86_tpch_shipping_priority", // TPC-H Q3 shape — the unshipped-
                               // orders report: revenue still open per
                               // order for one market segment, top-10.
                               // The canonical 3-table join with date
                               // predicates on BOTH fact sides; the
                               // segment filter reaches the customer
                               // scan, both date filters reach their
                               // scans (PushedFilters), and the segment
                               // membership is a LEFT SEMI — an order
                               // has exactly one customer, but semi
                               // states the intent and never widens the
                               // row. The group key (l_orderkey) is the
                               // key the lineitem join already shuffled
                               // on, so one exchange serves join + agg;
                               // top-10 is TakeOrdered (no global sort
                               // of |orders| rows at 100 TB). Revenue in
                               // exact LONG units until surfaced
                               // (q84's discipline); l_orderkey tiebreak
                               // pins the LIMIT boundary.
      (s, d) => {
        val cust = t(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") < "1997-01-01")
          .select("o_orderkey", "o_custkey", "o_orderdate",
            "o_orderpriority")
          .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
        t(s, d, "lineitem")
          .filter(col("l_shipdate") > "1997-01-01")
          .select(col("l_orderkey"),
            floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * 10000 + 0.5).cast("long").as("rq"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(sum(col("rq")).as("rq"))
          .orderBy(col("rq").desc, col("l_orderkey").asc)
          .select(col("l_orderkey"),
            (col("rq").cast("double") / 10000).as("revenue"),
            col("o_orderdate"), col("o_orderpriority"))
          .limit(10)
      },
      Some("""SELECT l_orderkey,
             |       CAST(rq AS DOUBLE) / 10000 AS revenue,
             |       o_orderdate, o_orderpriority
             |FROM (
             |  SELECT l_orderkey,
             |         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
             |             * 10000 + 0.5) AS BIGINT)) AS rq,
             |         o_orderdate, o_orderpriority
             |  FROM customer
             |  JOIN orders ON c_custkey = o_custkey
             |  JOIN lineitem ON l_orderkey = o_orderkey
             |  WHERE c_mktsegment = 'BUILDING'
             |    AND o_orderdate < TIMESTAMP '1997-01-01'
             |    AND l_shipdate > TIMESTAMP '1997-01-01'
             |  GROUP BY l_orderkey, o_orderdate, o_orderpriority)
             |ORDER BY rq DESC, l_orderkey
             |LIMIT 10""".stripMargin)),

    QueryDef(
      "q87_tpch_big_orders",   // TPC-H Q18 shape — large-volume
                               // customers: orders whose total quantity
                               // exceeds a threshold, decorated with the
                               // customer. Canonically an IN over a
                               // grouped HAVING subquery that re-scans
                               // lineitem; here ONE per-order aggregate
                               // serves both the filter and the surfaced
                               // sum_qty (the canonical form aggregates
                               // the fact table twice — at 100 TB that
                               // is a second full scan+shuffle for a
                               // frame the first agg already holds).
                               // Quantity sums in the exact DECIMAL
                               // pattern so the >300 boundary is the
                               // same row set in both engines; the
                               // having frame is |big orders| (tiny),
                               // so its joins to orders/customer
                               // broadcast the AGGREGATED side, never
                               // the fact stream. Top-100 TakeOrdered
                               // by o_totalprice with o_orderkey
                               // tiebreak.
      (s, d) => {
        val big = t(s, d, "lineitem")
          .select("l_orderkey", "l_quantity")
          .groupBy("l_orderkey")
          .agg(sumd(col("l_quantity")).as("sum_qty"))
          .filter(col("sum_qty") > 300)
        big.join(t(s, d, "orders")
            .select("o_orderkey", "o_custkey", "o_orderdate",
              "o_totalprice"),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer").select("c_custkey", "c_name"),
            col("o_custkey") === col("c_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty")
          .limit(100)
      },
      Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate,
             |       o_totalprice, sum_qty
             |FROM (
             |  SELECT l_orderkey,
             |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
             |              AS DOUBLE) AS sum_qty
             |  FROM lineitem GROUP BY 1) lq
             |JOIN orders ON o_orderkey = lq.l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |WHERE sum_qty > 300
             |ORDER BY o_totalprice DESC, o_orderkey
             |LIMIT 100""".stripMargin)),

    QueryDef(
      "q88_tpch_volume_shipping", // TPC-H Q7 shape — volume shipping
                               // between two trade blocs: revenue by
                               // (supplier nation, customer nation,
                               // ship year) for flows crossing bloc
                               // A (nations 0-4) ↔ bloc B (nations
                               // 20-24), two shipping years. The shape
                               // this adds: a 6-table join where the
                               // same dimension (nation) decorates TWO
                               // different fact foreign keys, with the
                               // canonical disjunctive PAIR predicate
                               // ((A,B) OR (B,A)). Spark-first: each
                               // nation leg is pre-filtered to its
                               // bloc union BEFORE joining (the 25-row
                               // broadcast prunes suppliers/customers
                               // at their scans — the fact stream
                               // shrinks at the earliest join, not at
                               // the final filter), and only the
                               // residual cross-pair disjunction runs
                               // after both legs are attached. Joins
                               // ordered fact→orders→customer (the
                               // orderkey join is the big shuffle;
                               // everything after rides broadcast).
                               // YEAR() on a pushed date-range scan;
                               // revenue in exact LONG units.
      (s, d) => {
        val blocs = broadcast(t(s, d, "nation")
          .filter(col("n_nationkey") < 5 || col("n_nationkey") >= 20)
          .select(col("n_nationkey"), col("n_name"),
            (col("n_nationkey") < 5).as("bloc_a")))
        val supp = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
          .join(blocs, col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"),
            col("bloc_a").as("s_bloc_a"))
        val cust = t(s, d, "customer").select("c_custkey", "c_nationkey")
          .join(blocs, col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"),
            col("bloc_a").as("c_bloc_a"))
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= "1996-01-01" &&
            col("l_shipdate") < "1998-01-01")
          .select(col("l_orderkey"), col("l_suppkey"),
            year(col("l_shipdate")).as("l_year"),
            floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * 10000 + 0.5).cast("long").as("rq"))
          .join(t(s, d, "orders").select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .filter(col("s_bloc_a") =!= col("c_bloc_a"))
          .groupBy("supp_nation", "cust_nation", "l_year")
          .agg((sum(col("rq")).cast("double") / 10000).as("revenue"))
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |       CAST(YEAR(l_shipdate) AS INTEGER) AS l_year,
             |       CAST(SUM(CAST(FLOOR(l_extendedprice
             |           * (1 - l_discount) * 10000 + 0.5) AS BIGINT))
             |         AS DOUBLE) / 10000 AS revenue
             |FROM lineitem
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |JOIN supplier ON s_suppkey = l_suppkey
             |JOIN nation n1 ON n1.n_nationkey = s_nationkey
             |JOIN nation n2 ON n2.n_nationkey = c_nationkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND ((n1.n_nationkey < 5 AND n2.n_nationkey >= 20)
             |    OR (n1.n_nationkey >= 20 AND n2.n_nationkey < 5))
             |GROUP BY 1, 2, 3""".stripMargin)),

    QueryDef(
      "q89_tpch_dormant_accounts", // TPC-H Q22 shape — the global-
                               // sales-opportunity report adapted to
                               // this schema: customers with above-
                               // average positive balances and NO
                               // RECENT orders (canonical Q22's "no
                               // orders at all" is vacuous here — every
                               // synthetic customer has ancient
                               // orders; dormancy since 2000-01-01
                               // keeps the intent). Three classic
                               // pieces in one plan: a SCALAR subquery
                               // threshold (1-row broadcast cross —
                               // never a shuffle), an ANTI join against
                               // the fact table (orders pruned to the
                               // recent window AT THE SCAN, projected
                               // to the join key only), and a final
                               // small agg by nation. The threshold is
                             // exact-decimal sum / count surfaced as
                               // one IEEE division, so both engines
                               // compare against bit-identical
                               // doubles.
      (s, d) => {
        val cust = t(s, d, "customer")
          .select("c_custkey", "c_nationkey", "c_acctbal")
        val thr = cust.filter(col("c_acctbal") > 0)
          .agg((sumd(col("c_acctbal")) / count(lit(1))).as("thr"))
        val recent = t(s, d, "orders")
          .filter(col("o_orderdate") >= "2000-01-01")
          .select("o_custkey")
        cust.crossJoin(broadcast(thr))
          .filter(col("c_acctbal") > col("thr"))
          .join(recent, col("c_custkey") === col("o_custkey"),
            "left_anti")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("numcust"),
            sumd(col("c_acctbal")).as("totacctbal"))
      },
      Some("""SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
             |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
             |         AS DOUBLE) AS totacctbal
             |FROM customer
             |WHERE c_acctbal > (
             |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
             |             AS DOUBLE) / COUNT(*)
             |    FROM customer WHERE c_acctbal > 0)
             |  AND NOT EXISTS (
             |    SELECT 1 FROM orders
             |    WHERE o_custkey = c_custkey
             |      AND o_orderdate >= TIMESTAMP '2000-01-01')
             |GROUP BY 1""".stripMargin)),

    QueryDef(
      "q90_tpch_discounted_revenue", // TPC-H Q19 shape — the disjunctive
                               // cross-side predicate: revenue from three
                               // (brand, size-range, quantity-range)
                               // bundles, where each OR arm references
                               // BOTH join inputs, so the disjunction can
                               // only run as a join residual. The classic
                               // Q19 optimization is stated explicitly:
                               // each side ALSO gets the derived superset
                               // of its own columns (quantity ∈ [1,45]
                               // on lineitem; brand ∈ {3} ∧ size ∈ [1,35]
                               // on part — implied by the disjunction, so
                               // semantics are unchanged) pushed to the
                               // SCAN, which at 100 TB is the difference
                               // between joining the full fact table and
                               // joining the bundles' slice; the brand-
                               // pruned part side broadcasts. Exact LONG
                               // revenue units; 1-row audit output keeps
                               // the match count alongside the sum.
      (s, d) => {
        val li = t(s, d, "lineitem")
          .filter(col("l_quantity") >= 1 && col("l_quantity") <= 45)
          .select(col("l_partkey"), col("l_quantity"),
            floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * 10000 + 0.5).cast("long").as("rq"))
        val pt = t(s, d, "part")
          .filter(col("p_brand")
            .isin("Brand#13", "Brand#22", "Brand#25") &&
            col("p_size") >= 1 && col("p_size") <= 35)
          .select("p_partkey", "p_brand", "p_size")
        li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#13" &&
              col("p_size") <= 15 &&
              col("l_quantity") >= 1 && col("l_quantity") <= 15) ||
            (col("p_brand") === "Brand#22" &&
              col("p_size") <= 25 &&
              col("l_quantity") >= 10 && col("l_quantity") <= 30) ||
            (col("p_brand") === "Brand#25" &&
              col("l_quantity") >= 20 && col("l_quantity") <= 45))
          .agg(count(lit(1)).as("n_items"),
            (sum(col("rq")).cast("double") / 10000).as("revenue"))
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
             |       CAST(SUM(CAST(FLOOR(l_extendedprice
             |           * (1 - l_discount) * 10000 + 0.5) AS BIGINT))
             |         AS DOUBLE) / 10000 AS revenue
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
             |       AND l_quantity BETWEEN 1 AND 15)
             |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25
             |       AND l_quantity BETWEEN 10 AND 30)
             |   OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 35
             |       AND l_quantity BETWEEN 20 AND 45)""".stripMargin)),

    QueryDef(
      "q91_tpch_promo_revenue", // TPC-H Q14 shape — conditional
                               // aggregation against a broadcast dim:
                               // what share of one month's revenue came
                               // from PROMO parts. The month predicate is
                               // a scan-pushed range on the fact table
                               // (at 100 TB shipdate min/max row-group
                               // pruning reads ~1/80th of the corpus);
                               // part projects to (key, type) and
                               // broadcasts; the CASE rides inside ONE
                               // partial aggregate — never two passes or
                               // a filtered self-union. Both the promo
                               // and total sums are exact LONG units, so
                               // the ratio divides two exact doubles
                               // (IEEE-deterministic vs the oracle).
      (s, d) => {
        val li = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= "1997-09-01" &&
            col("l_shipdate") < "1997-10-01")
          .select(col("l_partkey"),
            floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * 10000 + 0.5).cast("long").as("rq"))
        val pt = t(s, d, "part").select("p_partkey", "p_type")
        li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
          .agg(
            (sum(when(col("p_type") === "PROMO", col("rq"))
              .otherwise(0L)).cast("double") / 10000)
              .as("promo_revenue"),
            (sum(col("rq")).cast("double") / 10000).as("total_revenue"))
          .select(col("promo_revenue"), col("total_revenue"),
            (lit(100.0) * col("promo_revenue") / col("total_revenue"))
              .as("promo_pct"))
      },
      Some("""WITH m AS (
             |  SELECT p_type,
             |         CAST(FLOOR(l_extendedprice * (1 - l_discount)
             |             * 10000 + 0.5) AS BIGINT) AS rq
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
             |    AND l_shipdate < TIMESTAMP '1997-10-01'),
             |a AS (
             |  SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rq
             |                       ELSE 0 END) AS DOUBLE) / 10000
             |           AS promo_revenue,
             |         CAST(SUM(rq) AS DOUBLE) / 10000 AS total_revenue
             |  FROM m)
             |SELECT promo_revenue, total_revenue,
             |       100.0 * promo_revenue / total_revenue AS promo_pct
             |FROM a""".stripMargin)),

    QueryDef(
      "q92_tpch_product_profit", // TPC-H Q9 shape — product-type profit
                               // by (supplier nation, year): the widest
                               // classic star, adapted to this schema
                               // (no partsupp table, so supply cost is
                               // proxied as 60% of p_retailprice per
                               // unit — the SHAPE, a fact scanned once
                               // against three dims with a derived
                               // profit expression, is what's being
                               // exercised). The p_name LIKE filter
                               // prunes the part build side BEFORE
                               // broadcast; supplier and nation
                               // broadcast whole (O(10^4)/O(10^2) rows
                               // at any SF — dims scale with entities,
                               // not events); profit quantizes to LONG
                               // units BEFORE the sum (FLOOR(x+0.5)
                               // mirrored verbatim by the oracle, so
                               // negative-margin rows agree too), and
                               // the (nation × year) group count is
                               // O(10^2) — the partial agg collapses
                               // map-side and the final exchange moves
                               // hundreds of rows at 100 TB.
      (s, d) => {
        val pt = t(s, d, "part")
          .filter(col("p_name").like("%widget%"))
          .select("p_partkey", "p_retailprice")
        val sup = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
        val nat = t(s, d, "nation").select("n_nationkey", "n_name")
        val li = t(s, d, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"),
            col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            year(col("l_shipdate")).as("o_year"))
        li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .select(col("n_name").as("nation"), col("o_year"),
            floor((col("l_extendedprice") * (lit(1) - col("l_discount")) -
              lit(0.6) * col("p_retailprice") * col("l_quantity"))
              * 10000 + 0.5).cast("long").as("aq"))
          .groupBy("nation", "o_year")
          .agg((sum(col("aq")).cast("double") / 10000).as("sum_profit"))
      },
      Some("""SELECT n_name AS nation,
             |       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER)
             |         AS o_year,
             |       CAST(SUM(CAST(FLOOR((l_extendedprice
             |             * (1 - l_discount)
             |             - 0.6 * p_retailprice * l_quantity)
             |           * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000
             |         AS sum_profit
             |FROM lineitem
             |JOIN part ON p_partkey = l_partkey
             |JOIN supplier ON s_suppkey = l_suppkey
             |JOIN nation ON n_nationkey = s_nationkey
             |WHERE p_name LIKE '%widget%'
             |GROUP BY n_name, o_year""".stripMargin)),

    QueryDef(
      "q93_tpch_min_cost_supplier", // TPC-H Q2 shape — the min-cost
                               // supplier per part: the defining feature
                               // is the CORRELATED SCALAR MIN subquery
                               // (cost = MIN(cost) over the same part).
                               // This schema has no partsupp, so the
                               // supply relation derives from lineitem:
                               // per (part, supplier), the best unit
                               // price ever quoted, in exact CENTS
                               // (FLOOR(x*100+0.5) BEFORE the MIN — both
                               // engines min the same longs, so ties are
                               // ties in both). The correlated MIN is a
                               // WINDOW over the supply frame — ONE
                               // extra exchange on partkey, where the
                               // naive self-join-against-groupBy spells
                               // two plus a join — and ALL tied
                               // suppliers survive, as in the classic.
                               // part prunes (size band) before its
                               // broadcast; supplier broadcasts whole
                               // (dims scale with entities, not events).
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // |parts-in-band|-bounded dim, consumed by the semi pre-filter
        // AND the final join: materialized once (column pruning otherwise
        // forks the broadcast's part scan per consumer)
        val pt = Graft.cut(t(s, d, "part")
          .filter(col("p_size").between(10, 20))
          .select("p_partkey", "p_name"))
        // Pre-filter the big side BEFORE the aggregation exchange (guide
        // §3.2): the size band keeps ~22% of parts, and both the window
        // and the final join are per-partkey, so dropping whole partkeys
        // up front is equivalence-preserving (the part join would drop
        // them anyway) while the supply shuffle and the window frame
        // shrink ~4.5×. Broadcast left-semi — map-side, no new exchange.
        // (A repartition(l_partkey) serving both the aggregate and the
        // window via the subset rule was MEASURED SLOWER — 0.71 → 1.0 s —
        // because it forfeits the map-side partial aggregation: the saved
        // exchange carried 2 MB of partials, the single one carries 3 MB
        // of raw rows plus an unfused full aggregate.)
        val supply = t(s, d, "lineitem")
          .join(broadcast(pt),
            col("l_partkey") === col("p_partkey"), "left_semi")
          .select(col("l_partkey"), col("l_suppkey"),
            floor(col("l_extendedprice") / col("l_quantity") * 100 + 0.5)
              .cast("long").as("cents"))
          .groupBy("l_partkey", "l_suppkey")
          .agg(min(col("cents")).as("cost_cents"))
        val best = supply
          .withColumn("min_cost",
            min(col("cost_cents")).over(
              Window.partitionBy(col("l_partkey"))))
          .filter(col("cost_cents") === col("min_cost"))
        best
          .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
          .join(broadcast(t(s, d, "supplier")
            .select("s_suppkey", "s_name", "s_acctbal")),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("p_partkey"), col("p_name"), col("s_name"),
            col("s_acctbal"),
            (col("cost_cents").cast("double") / 100).as("supply_cost"))
      },
      Some("""WITH supply AS (
             |  SELECT l_partkey, l_suppkey,
             |         MIN(CAST(FLOOR(l_extendedprice / l_quantity * 100
             |                        + 0.5) AS BIGINT)) AS cost_cents
             |  FROM lineitem GROUP BY 1, 2)
             |SELECT p_partkey, p_name, s_name, s_acctbal,
             |       CAST(cost_cents AS DOUBLE) / 100 AS supply_cost
             |FROM supply
             |JOIN part ON p_partkey = l_partkey
             |JOIN supplier ON s_suppkey = l_suppkey
             |WHERE p_size BETWEEN 10 AND 20
             |  AND cost_cents = (SELECT MIN(s2.cost_cents) FROM supply s2
             |                    WHERE s2.l_partkey = supply.l_partkey)"""
        .stripMargin)),

    QueryDef(
      "q94_tpch_important_parts", // TPC-H Q11 shape — the important-
                               // stock cut: per-group value compared
                               // against a GLOBAL SCALAR (the classic's
                               // HAVING > (SELECT SUM(...) * fraction)).
                               // The cut here is 1.2× the MEAN part
                               // value rather than a fixed fraction of
                               // the total: the classic scales its
                               // fraction by 1/SF for exactly this
                               // reason (part count grows with SF, so
                               // any fixed fraction degenerates to all-
                               // or-nothing); anchoring to the mean
                               // keeps ~17% selectivity at every SF
                               // with the same plan shape. Value
                               // quantizes to cents pre-sum and the
                               // compare is INTEGER (val·n·10 >
                               // total·12) — no float edge can split
                               // the engines. The global (total, n) is
                               // a 1-row aggregate cross-joined
                               // broadcast (the documented scalar
                               // idiom): lineitem is scanned twice —
                               // inherent to the shape, the scalar
                               // needs every part — but both scans
                               // collapse map-side into O(|parts|)
                               // partials and the broadcast side is ONE
                               // row at any SF.
      (s, d) => {
        val v = t(s, d, "lineitem")
          .select(col("l_partkey"),
            floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * 100 + 0.5).cast("long").as("cents"))
          .groupBy(col("l_partkey").as("p_partkey"))
          .agg(sum(col("cents")).as("val_cents"))
        v.crossJoin(broadcast(
            v.agg(sum(col("val_cents")).as("total_cents"),
              count(lit(1)).as("n_parts"))))
          .filter(col("val_cents") * col("n_parts") * 10 >
            col("total_cents") * 12)
          .select(col("p_partkey"),
            (col("val_cents").cast("double") / 100).as("part_value"))
      },
      Some("""WITH v AS (
             |  SELECT l_partkey AS p_partkey,
             |         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
             |                        * 100 + 0.5) AS BIGINT)) AS val_cents
             |  FROM lineitem GROUP BY 1),
             |g AS (SELECT SUM(val_cents) AS total_cents,
             |             COUNT(*) AS n_parts FROM v)
             |SELECT p_partkey, CAST(val_cents AS DOUBLE) / 100
             |         AS part_value
             |FROM v, g
             |WHERE val_cents * n_parts * 10 > total_cents * 12"""
        .stripMargin)),

    QueryDef(
      "q95_tpch_revenue_delta", // TPC-H Q6 shape — the forecasting
                               // revenue-change query: ONE scan, every
                               // predicate pushed to parquet (date
                               // range, discount band, quantity cap),
                               // one 1-row global aggregate. The
                               // discount band compares against
                               // explicit DOUBLE literals in both
                               // engines (DuckDB would otherwise parse
                               // 0.05 as DECIMAL and promote — same
                               // value here, but explicit beats
                               // implicit); revenue quantizes to
                               // 10^-4 units pre-sum. The point of
                               // carrying the simplest classic: it
                               // pins the scan-only fast path —
                               // PushedFilters, no exchange but the
                               // final 1-row collapse.
      (s, d) => {
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= "1995-01-01" &&
            col("l_shipdate") < "1996-01-01" &&
            col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
            col("l_quantity") < 24)
          .select(floor(col("l_extendedprice") * col("l_discount")
            * 10000 + 0.5).cast("long").as("u"))
          .agg((sum(col("u")).cast("double") / 10000).as("revenue"))
      },
      Some("""SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount
             |                            * 10000 + 0.5) AS BIGINT))
             |            AS DOUBLE) / 10000 AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
             |  AND l_shipdate < TIMESTAMP '1996-01-01'
             |  AND l_discount >= CAST(0.03 AS DOUBLE)
             |  AND l_discount <= CAST(0.07 AS DOUBLE)
             |  AND l_quantity < 24""".stripMargin)),

    QueryDef(
      "q96_tpch_excess_suppliers", // TPC-H Q20 shape — suppliers with
                               // excess share: the defining NESTED-IN
                               // chain (suppliers IN a set derived from
                               // a per-(part,supplier) aggregate judged
                               // against a per-part total). Adapted to
                               // this schema over lineitem: within the
                               // widget part family, a supplier who
                               // shipped more than an EIGHTH of a
                               // part's total volume (suppliers per
                               // part grow with SF, so the classic's
                               // half-share cut degenerates to empty
                               // beyond toy scale; 12.5% keeps a
                               // non-empty, SF-stable answer with the
                               // identical plan shape). Quantities are integer-
                               // valued doubles — rounded to LONG
                               // before summing so the half-share
                               // compare (2*qty > total) is exact
                               // integer in both engines. Volume aggs
                               // run on the part-pruned fact (broadcast
                               // part filter first); the per-part total
                               // is a WINDOW over the (part, supplier)
                               // rollup — one exchange, no self-join —
                               // and the final IN is a broadcastable
                               // LEFT SEMI onto the supplier dim.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val pp = t(s, d, "part")
          .filter(col("p_name").like("%widget%")).select("p_partkey")
        val vol = t(s, d, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"),
            floor(col("l_quantity") + 0.5).cast("long").as("q"))
          .join(broadcast(pp), col("l_partkey") === col("p_partkey"))
          .groupBy("l_partkey", "l_suppkey")
          .agg(sum(col("q")).as("qty"))
        val excess = vol
          .withColumn("total",
            sum(col("qty")).over(Window.partitionBy(col("l_partkey"))))
          .filter(col("qty") * 8 > col("total"))
          .select(col("l_suppkey")).distinct()
        t(s, d, "supplier").select("s_suppkey", "s_name")
          .join(excess, col("s_suppkey") === col("l_suppkey"),
            "left_semi")
      },
      Some("""WITH vol AS (
             |  SELECT l_partkey, l_suppkey,
             |         SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS qty
             |  FROM lineitem
             |  JOIN part ON p_partkey = l_partkey
             |  WHERE p_name LIKE '%widget%'
             |  GROUP BY 1, 2),
             |tot AS (SELECT l_partkey, SUM(qty) AS total FROM vol
             |        GROUP BY 1)
             |SELECT s_suppkey, s_name FROM supplier
             |WHERE s_suppkey IN (SELECT l_suppkey FROM vol
             |                    JOIN tot USING (l_partkey)
             |                    WHERE qty * 8 > total)""".stripMargin)),

    QueryDef(
      "q97_tpch_priority_shipping", // TPC-H Q12 shape — shipping-mode
                               // priority audit: per line class (this
                               // schema has no l_shipmode; l_returnflag
                               // plays the low-cardinality mode
                               // column), how many LATE lines belonged
                               // to critical- vs normal-priority
                               // orders. The defining features survive
                               // intact: fact-to-orders equi join, a
                               // lateness predicate referencing both
                               // sides (shipdate vs orderdate + 60d),
                               // and the conditional-count pair (CASE
                               // IN-list inside SUM). orders carries
                               // only (key, date, priority) into the
                               // join; the group count is |flags| —
                               // the final exchange moves 3 rows at
                               // any SF.
      (s, d) => {
        val hi = Seq("1-URGENT", "2-HIGH")
        val ord = t(s, d, "orders")
          .select("o_orderkey", "o_orderdate", "o_orderpriority")
        t(s, d, "lineitem")
          .filter(col("l_shipdate") < "1997-01-01")
          .select("l_orderkey", "l_shipdate", "l_returnflag")
          .join(ord, col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") +
              expr("INTERVAL 60 DAYS"))
          .groupBy(col("l_returnflag"))
          .agg(
            sum(when(col("o_orderpriority").isin(hi: _*), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(col("o_orderpriority").isin(hi: _*), 0L)
              .otherwise(1L)).as("low_line_count"))
      },
      Some("""SELECT l_returnflag,
             |       CAST(SUM(CASE WHEN o_orderpriority IN
             |                          ('1-URGENT', '2-HIGH')
             |                     THEN 1 ELSE 0 END) AS BIGINT)
             |         AS high_line_count,
             |       CAST(SUM(CASE WHEN o_orderpriority IN
             |                          ('1-URGENT', '2-HIGH')
             |                     THEN 0 ELSE 1 END) AS BIGINT)
             |         AS low_line_count
             |FROM lineitem
             |JOIN orders ON o_orderkey = l_orderkey
             |WHERE l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
             |GROUP BY l_returnflag""".stripMargin))
  )
}
