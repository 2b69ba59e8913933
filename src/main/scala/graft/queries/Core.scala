package graft.queries

import graft.{Num, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core relational operators (SURVEY.md §2.3–§2.6) re-expressed on the
  * harness tables. Each query is a pure `(SparkSession, sfDir) => DataFrame`
  * with a DuckDB oracle twin in [[oracles]].
  *
  * Scale notes are inline per query: every plan here is a single scan →
  * (optional shuffle-by-key) → result, with filters/pruning pushed into the
  * parquet reader, partial aggregation before every shuffle, and broadcast
  * joins for dimension tables — the shapes that survive a 1000-executor
  * 100 TB run unchanged.
  */
object Core {
  private val Dec = DecimalType(18, 2)

  /** Flagship (SURVEY §7.3): TPC-H Q1 shape — filter → groupBy → multi-agg
    * → sort. Reference pattern: parquet_operations.py:163-173.
    * Scale: scan + partial/final HashAggregate on 6 groups; shuffle volume
    * is O(partitions × groups), independent of row count. */
  def q01PricingSummary(spark: SparkSession, d: String): DataFrame = {
    val disc  = col("l_extendedprice").cast(Dec) * (lit(1) - col("l_discount").cast(Dec))
    val charge = disc * (lit(1) + col("l_tax").cast(Dec))
    Tables.lineitem(spark, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Num.dsum(col("l_quantity")).as("sum_qty"),
        Num.dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(disc).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        Num.davg(col("l_quantity")).as("avg_qty"),
        Num.davg(col("l_extendedprice")).as("avg_price"),
        Num.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** D1–D4: projection + comparison/conjunction/contains filters.
    * All three predicates reach the parquet scan (PushedFilters). */
  def q02FilterProject(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .filter(col("o_totalprice") > 150000 &&
              col("o_orderstatus") === "O" &&
              col("o_orderpriority").contains("URGENT"))
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      .orderBy("o_orderkey")

  /** D6–D8: withColumn arithmetic, string split + array index + cast,
    * lower/upper. Row-level double math is expression-identical to the
    * oracle, so raw doubles compare exactly. */
  def q03WithColumnSplit(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .withColumn("prio_num", split(col("o_orderpriority"), "-").getItem(0).cast("int"))
      .withColumn("status_lc", lower(col("o_orderstatus")))
      .withColumn("price_with_fee", col("o_totalprice") * lit(1.05))
      .select("o_orderkey", "prio_num", "status_lc", "price_with_fee")
      .orderBy("o_orderkey")

  /** J1/A9: fact ⋈ fact equi-join + multi-agg. orders⋈customer shuffles on
    * the join key; at scale AQE coalesces/skew-splits post-shuffle. */
  def q04JoinAgg(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
           Num.dsum(col("o_totalprice")).as("sum_price"),
           Num.davg(col("o_totalprice")).as("avg_price"))
      .orderBy("c_mktsegment")

  /** Broadcast dimension join chain (customer ⋈ nation ⋈ region).
    * nation/region are O(100) rows at any SF — explicit broadcast() keeps
    * them out of the shuffle even if stats are missing. */
  def q05BroadcastDims(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d)
      .join(broadcast(Tables.nation(spark, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
           Num.dsum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy("r_name")

  /** J4/D11: outer join + fillna(0) (graph_basics.py:55-62 shape).
    * Customers merged with their order counts; missing side → 0. */
  def q06OuterJoinFillna(spark: SparkSession, d: String): DataFrame = {
    val cnts = Tables.orders(spark, d)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("n_orders"), Num.dsum(col("o_totalprice")).as("spend"))
    Tables.customer(spark, d).select("c_custkey", "c_mktsegment")
      .join(cnts, Seq("c_custkey"), "full_outer")
      .na.fill(0, Seq("n_orders")).na.fill(0.0, Seq("spend"))
      .select("c_custkey", "c_mktsegment", "n_orders", "spend")
      .orderBy("c_custkey")
  }

  /** J1/J3 shape: self-join 2-hop — parts co-occurring in the same order
    * (graph_basics.py:91-107 friends-of-friends transplanted). Join is
    * key-local per order (shuffle on l_orderkey, small groups), then a
    * bounded top-k — no O(E²) blowup because order size is bounded. */
  def q07SelfJoin2Hop(spark: SparkSession, d: String): DataFrame = {
    // distinct first: co-occurrence is a set property (a part listed twice
    // in one order is still one co-occurrence); also shrinks the join.
    // ops.Scale.coorderPairsFast is the join-free 3× faster twin.
    val li = Tables.lineitem(spark, d).select("l_orderkey", "l_partkey").distinct()
    li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("n_coorders"))
      .orderBy(col("n_coorders").desc, col("part_a"), col("part_b"))
      .limit(20)
  }

  /** J5: cross join (rdd cartesian analog) — only ever on bounded dims. */
  def q08CrossJoin(spark: SparkSession, d: String): DataFrame =
    Tables.region(spark, d).crossJoin(Tables.nation(spark, d))
      .select(col("r_name"), col("n_name"))
      .orderBy("r_name", "n_name")

  /** Stretch ch.11: anti join — customers with no order above 200k, per
    * segment. left_anti never materializes the matching side's payload. */
  def q09AntiJoin(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d)
      .join(Tables.orders(spark, d).filter(col("o_totalprice") > 300000),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_no_big_orders"))
      .orderBy("c_mktsegment")

  /** Stretch ch.11: semi join — parts that appear in at least one lineitem. */
  def q10SemiJoin(spark: SparkSession, d: String): DataFrame =
    Tables.part(spark, d)
      .join(Tables.lineitem(spark, d), col("p_partkey") === col("l_partkey"), "left_semi")
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n_parts"))
      .orderBy("p_brand")

  /** A11: distinct. */
  def q11Distinct(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d).select("l_returnflag", "l_linestatus")
      .distinct().orderBy("l_returnflag", "l_linestatus")

  /** O2/O3: top-k — Spark plans TakeOrderedAndProject (per-partition top-k,
    * then driver merge of k×partitions rows — no global sort). */
  def q12TopK(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** A12 via countDistinct + conditional agg. */
  def q13CountDistinct(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
           count(lit(1)).as("n_events"),
           Num.dsum(col("value")).as("sum_value"))
      .orderBy("event_type")

  /** Set ops (§2.7): union / intersect / except on nation-key sets. */
  def q14SetOps(spark: SparkSession, d: String): DataFrame = {
    val custN = Tables.customer(spark, d).select(col("c_nationkey").as("nationkey")).distinct()
    val suppN = Tables.supplier(spark, d).select(col("s_nationkey").as("nationkey")).distinct()
    val both   = custN.intersect(suppN).withColumn("which", lit("both"))
    val cOnly  = custN.except(suppN).withColumn("which", lit("customer_only"))
    val sOnly  = suppN.except(custN).withColumn("which", lit("supplier_only"))
    both.union(cOnly).union(sOnly).orderBy("which", "nationkey")
  }

  /** A10/§3.3: SQL entry point over temp views. */
  def q15SqlAgg(spark: SparkSession, d: String): DataFrame = {
    Tables.customer(spark, d).createOrReplaceTempView("customer_v")
    spark.sql(s"""
      SELECT c_mktsegment,
             COUNT(*) AS headcount,
             ${Num.sqlDavg("c_acctbal")} AS avg_bal,
             MAX(c_acctbal) AS max_bal
      FROM customer_v
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""")
  }

  /** Ch.08 stretch: ranking window — latest event per user.
    * Single shuffle on user_id; rank + filter is one window pass. */
  def q16WindowRank(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")
  }

  /** Ch.08 stretch: running (prefix) sum per user — decimal accumulation so
    * the fold is exact and order-stable. */
  def q17WindowRunning(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, d)
      .filter(col("user_id") < 20)
      .withColumn("running_value", sum(col("value").cast(Dec)).over(w).cast("double"))
      .select("user_id", "event_id", "running_value")
      .orderBy("user_id", "event_id")
  }

  /** Time bucketing (streaming batch-twin): per-day per-type counts.
    * date_trunc is a scalar expression — bucketing never shuffles raw rows
    * beyond the single groupBy. */
  def q18TimeBuckets(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
               col("event_type"))
      .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("sum_value"))
      .orderBy("day", "event_type")

  /** Rollup (stretch §2.5 gap): subtotals by returnflag, linestatus.
    * Null grouping slots are coalesced to 'ALL' for oracle stability. */
  def q19Rollup(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), Num.dsum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
              coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
              col("n"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  /** Cube (all 2² grouping combinations) with grouping_id — the subtotal
    * lattice rollup only walks one path of. grouping_id's bitmask
    * disambiguates a real NULL group value from a subtotal slot, which
    * `coalesce('ALL')` alone cannot. */
  def q80Cube(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"),
           count(lit(1)).as("n"), Num.dsum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
              coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
              col("gid").cast("int").as("gid"), col("n"), col("sum_qty"))
      .orderBy("gid", "returnflag", "linestatus")

  /** Explicit GROUPING SETS — the custom lattice rollup and cube are
    * special cases of: exactly ((returnflag, linestatus), (returnflag),
    * ()) here, skipping the (linestatus)-only slice a cube would compute
    * and charge for. Through the SQL surface since the DataFrame API has
    * no groupingSets; grouping_id disambiguates subtotal slots from real
    * NULLs exactly as in q80. */
  def q100GroupingSets(spark: SparkSession, d: String): DataFrame = {
    Tables.lineitem(spark, d).createOrReplaceTempView("lineitem_gs")
    spark.sql(s"""
      SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             COALESCE(l_linestatus, 'ALL') AS linestatus,
             CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
             COUNT(*) AS n, ${Num.sqlDsum("l_quantity")} AS sum_qty
      FROM lineitem_gs
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY gid, returnflag, linestatus""")
  }

  /** TPC-H Q5-shape flagship: revenue per nation for local-supplier
    * orders in one region and one order year — a 6-table join whose
    * physical shape is entirely Catalyst's to choose (the three dimension
    * tables broadcast; the customer/orders/lineitem chain shuffles on its
    * keys; the c_nationkey = s_nationkey "local supplier" predicate rides
    * the supplier join). Revenue = Σ price × (1 − discount) computed in
    * DECIMAL so the sum is exact and associative (2-dec × 2-dec = exact
    * 4-dec products — a raw double sum would be partition-order
    * dependent). */
  def q82RegionalRevenue(spark: SparkSession, d: String): DataFrame = {
    val Dec = org.apache.spark.sql.types.DecimalType(18, 2)
    Tables.customer(spark, d)
      .join(Tables.orders(spark, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, d),
        col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(Tables.nation(spark, d), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, d), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA" &&
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
      .groupBy(col("n_name"))
      .agg(sum(col("l_extendedprice").cast(Dec) *
               (lit(1).cast(Dec) - col("l_discount").cast(Dec)))
             .cast("double").as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Correlated scalar subquery (TPC-H Q17 shape) through the SQL
    * surface: items ordered in below-half-average quantity FOR THEIR
    * PART. Catalyst decorrelates the subquery into an aggregate + join —
    * the plan you'd write by hand — rather than per-row re-execution.
    * Quantities are integer-valued, so AVG's double sum is exact at any
    * partitioning and the comparison is engine-portable. */
  def q83Correlated(spark: SparkSession, d: String): DataFrame = {
    Tables.lineitem(spark, d).createOrReplaceTempView("lineitem_v")
    spark.sql(s"""
      SELECT l_partkey, COUNT(*) AS n_small,
             ${Num.sqlDsum("l_extendedprice")} AS small_revenue
      FROM lineitem_v l1
      WHERE l_quantity < (SELECT 0.5 * AVG(l_quantity)
                          FROM lineitem_v l2
                          WHERE l2.l_partkey = l1.l_partkey)
      GROUP BY l_partkey
      ORDER BY l_partkey""")
  }

  /** NOT IN subquery through the SQL surface: customers with no orders
    * above a price floor. NOT IN is NOT the same operator as NOT EXISTS /
    * left_anti — its three-valued NULL semantics (one NULL in the
    * subquery result empties the output) force Catalyst to plan a
    * null-AWARE anti join, a distinct physical feature from the
    * left_anti of q09. Both engines implement ANSI semantics, so the
    * oracle is the same SQL. The subquery column here is non-null
    * (orderkeys), which keeps the result non-degenerate while still
    * exercising the null-aware plan. */
  def q99NotIn(spark: SparkSession, d: String): DataFrame = {
    Tables.customer(spark, d).createOrReplaceTempView("customer_v")
    Tables.orders(spark, d).createOrReplaceTempView("orders_v")
    spark.sql("""
      SELECT c_mktsegment, COUNT(*) AS n_customers
      FROM customer_v
      WHERE c_custkey NOT IN (SELECT o_custkey FROM orders_v
                              WHERE o_totalprice > 350000)
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""")
  }

  /** Pivot (stretch): event_type → columns, one row per day. The oracle
    * uses portable conditional aggregation; Spark uses pivot with an
    * explicit value list (no extra pass to discover values). */
  def q20Pivot(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0)
      .orderBy("day")

  /** JSON path extraction (events.props) — get_json_object stays inside
    * codegen; no UDF. */
  def q21JsonExtract(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** A7 (partition-level combine) with a deterministic global result:
    * mapPartitions computes per-partition (min,max,sum,count) partials,
    * then one tiny final reduce — the dna_base_count_ver_3 pattern. Output
    * is partition-invariant so it has a plain SQL oracle. */
  def q22MapPartitionsStats(spark: SparkSession, d: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val partials = Tables.lineitem(spark, d)
      .select(col("l_quantity")).as[Double]
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          var mn = Double.MaxValue; var mx = Double.MinValue
          var s = BigDecimal(0); var n = 0L
          it.foreach { v =>
            if (v < mn) mn = v
            if (v > mx) mx = v
            s += BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
            n += 1
          }
          Iterator((mn, mx, s.toString, n))
        }
      }
    partials
      .map(p => (p._1, p._2, p._3, p._4))
      .toDF("mn", "mx", "s", "n")
      .agg(min(col("mn")).as("min_qty"),
           max(col("mx")).as("max_qty"),
           sum(col("s").cast(DecimalType(28, 2))).cast("double").as("sum_qty"),
           sum(col("n")).as("n_rows"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"   -> (q01PricingSummary _),
    "q02_filter_project"    -> (q02FilterProject _),
    "q03_withcolumn_split"  -> (q03WithColumnSplit _),
    "q04_join_agg"          -> (q04JoinAgg _),
    "q05_broadcast_dims"    -> (q05BroadcastDims _),
    "q06_outer_join_fillna" -> (q06OuterJoinFillna _),
    "q07_selfjoin_2hop"     -> (q07SelfJoin2Hop _),
    "q08_cross_join"        -> (q08CrossJoin _),
    "q09_anti_join"         -> (q09AntiJoin _),
    "q10_semi_join"         -> (q10SemiJoin _),
    "q11_distinct"          -> (q11Distinct _),
    "q12_topk"              -> (q12TopK _),
    "q13_count_distinct"    -> (q13CountDistinct _),
    "q14_set_ops"           -> (q14SetOps _),
    "q15_sql_agg"           -> (q15SqlAgg _),
    "q16_window_rank"       -> (q16WindowRank _),
    "q17_window_running"    -> (q17WindowRunning _),
    "q18_time_buckets"      -> (q18TimeBuckets _),
    "q19_rollup"            -> (q19Rollup _),
    "q80_cube"              -> (q80Cube _),
    "q82_regional_revenue"  -> (q82RegionalRevenue _),
    "q83_correlated"        -> (q83Correlated _),
    "q99_notin_nullaware"   -> (q99NotIn _),
    "q100_grouping_sets"    -> (q100GroupingSets _),
    "q20_pivot"             -> (q20Pivot _),
    "q21_json_extract"      -> (q21JsonExtract _),
    "q22_mappartitions_stats" -> (q22MapPartitionsStats _),
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> s"""
      SELECT l_returnflag, l_linestatus,
             ${Num.sqlDsum("l_quantity")} AS sum_qty,
             ${Num.sqlDsum("l_extendedprice")} AS sum_base_price,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS STRING) AS DOUBLE) AS sum_disc_price,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS STRING) AS DOUBLE) AS sum_charge,
             ${Num.sqlDavg("l_quantity")} AS avg_qty,
             ${Num.sqlDavg("l_extendedprice")} AS avg_price,
             ${Num.sqlDavg("l_discount")} AS avg_disc,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "q02_filter_project" -> """
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      FROM orders
      WHERE o_totalprice > 150000 AND o_orderstatus = 'O'
        AND o_orderpriority LIKE '%URGENT%'
      ORDER BY o_orderkey""",
    "q03_withcolumn_split" -> """
      SELECT o_orderkey,
             CAST(SPLIT_PART(o_orderpriority, '-', 1) AS INT) AS prio_num,
             LOWER(o_orderstatus) AS status_lc,
             o_totalprice * 1.05 AS price_with_fee
      FROM orders ORDER BY o_orderkey""",
    "q04_join_agg" -> s"""
      SELECT c_mktsegment, COUNT(*) AS n_orders,
             ${Num.sqlDsum("o_totalprice")} AS sum_price,
             ${Num.sqlDavg("o_totalprice")} AS avg_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q05_broadcast_dims" -> s"""
      SELECT r_name, COUNT(*) AS n_customers,
             ${Num.sqlDsum("c_acctbal")} AS sum_acctbal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""",
    "q06_outer_join_fillna" -> s"""
      SELECT COALESCE(c.c_custkey, o.c_custkey) AS c_custkey,
             c.c_mktsegment,
             COALESCE(o.n_orders, 0) AS n_orders,
             COALESCE(o.spend, 0.0) AS spend
      FROM (SELECT c_custkey, c_mktsegment FROM customer) c
      FULL OUTER JOIN (
        SELECT o_custkey AS c_custkey, COUNT(*) AS n_orders,
               ${Num.sqlDsum("o_totalprice")} AS spend
        FROM orders GROUP BY o_custkey) o
      USING (c_custkey)
      ORDER BY c_custkey""",
    "q07_selfjoin_2hop" -> """
      WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_coorders
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      ORDER BY n_coorders DESC, part_a, part_b
      LIMIT 20""",
    "q08_cross_join" -> """
      SELECT r_name, n_name FROM region CROSS JOIN nation
      ORDER BY r_name, n_name""",
    "q09_anti_join" -> """
      SELECT c_mktsegment, COUNT(*) AS n_no_big_orders
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q10_semi_join" -> """
      SELECT p_brand, COUNT(*) AS n_parts
      FROM part
      WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      GROUP BY p_brand ORDER BY p_brand""",
    "q11_distinct" -> """
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus""",
    "q12_topk" -> """
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q13_count_distinct" -> s"""
      SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
             COUNT(*) AS n_events, ${Num.sqlDsum("value")} AS sum_value
      FROM events GROUP BY event_type ORDER BY event_type""",
    "q14_set_ops" -> """
      WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
           sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
      SELECT nationkey, 'both' AS which FROM cn INTERSECT SELECT nationkey, 'both' FROM sn
      UNION ALL
      SELECT nationkey, 'customer_only' FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
      UNION ALL
      SELECT nationkey, 'supplier_only' FROM (SELECT nationkey FROM sn EXCEPT SELECT nationkey FROM cn)
      ORDER BY which, nationkey""",
    "q15_sql_agg" -> s"""
      SELECT c_mktsegment, COUNT(*) AS headcount,
             ${Num.sqlDavg("c_acctbal")} AS avg_bal,
             MAX(c_acctbal) AS max_bal
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q16_window_rank" -> """
      SELECT user_id, event_id, event_type, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1 ORDER BY user_id""",
    "q17_window_running" -> """
      SELECT user_id, event_id,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_value
      FROM events WHERE user_id < 20
      ORDER BY user_id, event_id""",
    "q18_time_buckets" -> s"""
      SELECT STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day, event_type,
             COUNT(*) AS n, ${Num.sqlDsum("value")} AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY day, event_type""",
    "q19_rollup" -> s"""
      SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             COALESCE(l_linestatus, 'ALL') AS linestatus,
             COUNT(*) AS n, ${Num.sqlDsum("l_quantity")} AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus""",
    "q80_cube" -> s"""
      SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             COALESCE(l_linestatus, 'ALL') AS linestatus,
             CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
             COUNT(*) AS n, ${Num.sqlDsum("l_quantity")} AS sum_qty
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY gid, returnflag, linestatus""",
    "q82_regional_revenue" -> """
      SELECT n_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                  AS DOUBLE) AS revenue,
             COUNT(*) AS n_items
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q100_grouping_sets" -> s"""
      SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             COALESCE(l_linestatus, 'ALL') AS linestatus,
             CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
             COUNT(*) AS n, ${Num.sqlDsum("l_quantity")} AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY gid, returnflag, linestatus""",
    "q99_notin_nullaware" -> """
      SELECT c_mktsegment, COUNT(*) AS n_customers
      FROM customer
      WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                              WHERE o_totalprice > 350000)
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",
    "q83_correlated" -> s"""
      SELECT l_partkey, COUNT(*) AS n_small,
             ${Num.sqlDsum("l_extendedprice")} AS small_revenue
      FROM lineitem l1
      WHERE l_quantity < (SELECT 0.5 * AVG(l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l1.l_partkey)
      GROUP BY l_partkey
      ORDER BY l_partkey""",
    "q20_pivot" -> """
      SELECT STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
             COUNT(*) FILTER (event_type = 'click')    AS click,
             COUNT(*) FILTER (event_type = 'view')     AS view,
             COUNT(*) FILTER (event_type = 'purchase') AS purchase,
             COUNT(*) FILTER (event_type = 'signup')   AS signup,
             COUNT(*) FILTER (event_type = 'error')    AS error
      FROM events GROUP BY 1 ORDER BY day""",
    "q21_json_extract" -> """
      SELECT event_type,
             CAST(SUM(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
             MAX(CAST(props->>'$.k' AS INT)) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type""",
    "q22_mappartitions_stats" -> s"""
      SELECT MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
             ${Num.sqlDsum("l_quantity")} AS sum_qty, COUNT(*) AS n_rows
      FROM lineitem""",
  )
}
