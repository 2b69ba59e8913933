package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities: the join/aggregation shapes needed at 100 TB that the
  * small-SF queries don't force — key-salting for skew, bucketed tables
  * for exchange-free co-located joins.
  *
  * AQE (on by default in our sessions) handles moderate runtime skew; the
  * explicit salt here is for the pathological hot-key case where one key
  * exceeds a single executor's memory even after AQE splits.
  */
object Scale {

  /** Salted inner equi-join for skewed left keys: the left side gets a
    * random salt in [0, salts); the right side is replicated `salts` ways
    * (explode). Correct for inner equi-joins: every (key, salt) pair on
    * the left finds exactly the one replicated right row. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      (rand(seed = 42) * salts).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Write a DataFrame as a bucketed, sorted table: joins and
    * aggregations on the bucket key then run with NO exchange (bucket
    * pruning + SortMergeJoin over pre-sorted buckets). Standing-index
    * callers should key `table` by (dataset, app id) via
    * [[Scratch.bucketedTable]] — a fixed name makes two concurrent
    * drivers silently cross-read each other's table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      // absolute scratch path: callers may run from any cwd
      .option("path", bucketPath(table))
      .saveAsTable(table)

  /** The warehouse path backing [[writeBucketed]]'s `table`. */
  def bucketPath(table: String): String =
    sys.props("java.io.tmpdir") + s"/graft_buckets/$table"

  /** Join-free co-occurrence pairs: collect each group's distinct sorted
    * items, expand pairs with nested array transforms, aggregate. Same
    * result as the distinct self-join (PlanAuditSpec asserts equality) at
    * ~3× the speed when group sizes are small (measured at sf0.1: 0.86s
    * vs 2.5s): one groupBy shuffle of rows instead of shuffling both join
    * sides, and the quadratic pair expansion happens on in-memory arrays.
    *
    * `maxGroupSize` is the supernode guard: groups larger than it are
    * dropped after the (cheap, linear) collect_set and before the
    * quadratic expansion, bounding per-group work by maxGroupSize². The
    * capped result is a subset of the uncapped pairs restricted to small
    * groups (PropertySpec checks the subset property). */
  def coOccurrencePairs(df: DataFrame, groupCol: String, itemCol: String,
                        maxGroupSize: Int = Int.MaxValue): DataFrame =
    df.select(col(groupCol).as("g"), col(itemCol).as("item"))
      .groupBy("g").agg(sort_array(collect_set(col("item"))).as("items"))
      .filter(size(col("items")) <= maxGroupSize)
      .select(explode(expr(
        """flatten(transform(items, (x, i) ->
             transform(slice(items, i + 2, size(items)),
                       y -> struct(x AS item_a, y AS item_b))))""")).as("p"))
      .groupBy(col("p.item_a"), col("p.item_b"))
      .agg(count(lit(1)).as("n_groups"))

  /** Shuffle-exchange count in a plan — the unit-test currency for "did
    * this shuffle when it didn't need to". Broadcast exchanges don't
    * count (they move a small side, not the data). */
  def countExchanges(df: DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0) // AQE toString repeats the pre-AQE plan
      .linesIterator.count(l => l.contains("Exchange") &&
        !l.contains("ReusedExchange") && !l.contains("BroadcastExchange"))

  /** Supplier revenue through an explicitly SALTED join: lineitem's
    * suppkey gets a random salt, supplier is replicated `salts` ways, and
    * the join runs on (key, salt) — the manual hot-key treatment for when
    * one key exceeds an executor even after AQE's skew split. The point
    * the oracle pins: salting is INVISIBLE in the result — any salt
    * assignment joins each row to exactly its one replicated partner, so
    * the aggregate equals the plain join's (the DuckDB oracle IS the
    * unsalted join). Decimal-exact sums keep it bitwise. */
  def qSaltedAgg(spark: SparkSession, d: String): DataFrame = {
    val li = graft.Tables.lineitem(spark, d)
      .select(col("l_suppkey").as("suppkey"), col("l_extendedprice"))
    val sup = graft.Tables.supplier(spark, d)
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    saltedJoin(li, sup, "suppkey", salts = 8)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        graft.Num.dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("s_nationkey")
  }

  /** Null-skew-safe left outer join. SQL semantics say a NULL join key
    * never matches — but a shuffle join still SHUFFLES every null-keyed
    * row, and they all hash to the SAME partition (hash(null) is a
    * constant): on a 100 TB fact table where an optional foreign key is
    * 90% null, that is one straggler task holding 90% of the table while
    * 999 executors idle. The rewrite routes null-keyed rows around the
    * join entirely — they exit as scan → filter → union, touching no
    * exchange on the join key — and only the matchable minority joins.
    * Result-identical to the plain left join by construction (the oracle
    * IS the plain join). */
  def leftJoinNullSkewSafe(left: DataFrame, right: DataFrame,
                           key: String): DataFrame = {
    val matched = left.filter(col(key).isNotNull).join(right, Seq(key), "left")
    val rightOnly = right.columns.filterNot(_ == key)
    val nullSide = rightOnly.foldLeft(left.filter(col(key).isNull)) {
      (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    matched.unionByName(nullSide.select(matched.columns.map(col).toIndexedSeq: _*))
  }

  /** q106: orders carry a 90%-null optional key (every 10th customer);
    * the mktsegment rollup must be identical to the plain left join while
    * the null majority never enters the join exchange (PlanAuditSpec pins
    * both). */
  def qNullSkewJoin(spark: SparkSession, d: String): DataFrame = {
    val o = graft.Tables.orders(spark, d)
      .withColumn("big_cust",
        when(col("o_custkey") % 10 === 0, col("o_custkey")))
      .select(col("big_cust"), col("o_totalprice"))
    val c = graft.Tables.customer(spark, d)
      .select(col("c_custkey").as("big_cust"), col("c_mktsegment"))
    leftJoinNullSkewSafe(o, c, "big_cust")
      .groupBy(coalesce(col("c_mktsegment"), lit("unmatched")).as("segment"))
      .agg(count(lit(1)).as("n_orders"),
        graft.Num.dsum(col("o_totalprice")).as("total_price"))
      .orderBy("segment")
  }

  /** Join-key skew diagnostics — the DIAGNOSIS step in front of this
    * module's mitigation toolkit (is the key null-heavy → [[leftJoinNullSkewSafe]];
    * is one key hot → [[saltedJoin]] / AQE skew split; is the dimension
    * small → broadcast). One pass builds per-key group sizes; every
    * metric after that runs over the |keys| group-size table, not the
    * corpus — and the group-size percentiles are selected via
    * [[Percentiles.nearestRankViaBuckets]] (two-level histogram), so even
    * the key table never passes through a single-task global sort: at
    * 100 TB a join's key table is billions of rows, and an unpartitioned
    * rank window over it would be the one-straggler shape this very
    * report exists to diagnose (PlanAuditSpec pins its absence).
    *
    * Group-size percentiles use nearest-rank integer math (the q107
    * discipline: rank (p·n + 99) div 100 — an actual order statistic,
    * bit-exact on any engine), so the whole report is oracle-exact.
    * Degenerate corpora degrade gracefully: a 100%-null key (exactly the
    * pathology this diagnostic targets) reports null_fraction = 1.0 with
    * null group metrics instead of an empty result. */
  def keySkewReport(df: DataFrame, keyCol: String): DataFrame = {
    val sizes = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
      .filter(col("k").isNotNull)
    val nulls = df.filter(col(keyCol).isNull)
      .agg(count(lit(1)).as("null_rows"))
    val agg = sizes.agg(
        sum(col("c")).as("nonnull_rows"),
        count(lit(1)).as("keys_total"),
        max(col("c")).as("max_group"))
      .crossJoin(broadcast(nulls))
    val pcts = Percentiles.nearestRankViaBuckets(
      sizes.select(lit(1).as("g"), col("c")), "g", "c",
      percents = Seq(50, 99), bucketWidth = 1024.0)
    // One-row pivot of the (pct, value) rows. A global agg over an EMPTY
    // pcts (all-null key) still yields one row — of nulls — so the cross
    // join preserves the report instead of eliminating it.
    val pctRow = broadcast(pcts.agg(
      min(when(col("pct") === 50, col("value"))).as("p50_group"),
      min(when(col("pct") === 99, col("value"))).as("p99_group")))
    agg.crossJoin(pctRow).select(
        (coalesce(col("nonnull_rows"), lit(0L)) + col("null_rows")).as("rows_total"),
        col("null_rows"), col("keys_total"), col("max_group"),
        col("p50_group"), col("p99_group"))
      .withColumn("null_fraction",
        col("null_rows").cast("double") / col("rows_total"))
      .withColumn("skew_ratio",
        col("max_group").cast("double") / col("p50_group"))
      .select(
        expr("stack(8, 'rows_total', CAST(rows_total AS DOUBLE), " +
          "'null_rows', CAST(null_rows AS DOUBLE), " +
          "'null_fraction', null_fraction, " +
          "'keys_total', CAST(keys_total AS DOUBLE), " +
          "'max_group', CAST(max_group AS DOUBLE), " +
          "'p50_group', CAST(p50_group AS DOUBLE), " +
          "'p99_group', CAST(p99_group AS DOUBLE), " +
          "'skew_ratio', skew_ratio) AS (metric, value)"))
      .orderBy("metric")
  }

  /** q110: skew report over the q106 derived key (90% null, uniform
    * non-null tail) — the report that would have told you to reach for
    * the null-bypass rewrite. */
  def qSkewReport(spark: SparkSession, d: String): DataFrame =
    keySkewReport(
      graft.Tables.orders(spark, d).withColumn("big_cust",
        when(col("o_custkey") % 10 === 0, col("o_custkey"))),
      "big_cust")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q92_salted_agg" -> (qSaltedAgg _),
    "q106_nullskew_join" -> (qNullSkewJoin _),
    "q110_skew_report" -> (qSkewReport _))

  val oracles: Map[String, String] = Map(
    "q92_salted_agg" -> s"""
      SELECT s_nationkey, COUNT(*) AS n_items,
             ${graft.Num.sqlDsum("l_extendedprice")} AS revenue
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_nationkey ORDER BY s_nationkey""",
    "q106_nullskew_join" -> s"""
      WITH o AS (
        SELECT CASE WHEN o_custkey % 10 = 0 THEN o_custkey END AS big_cust,
               o_totalprice
        FROM orders)
      SELECT COALESCE(c_mktsegment, 'unmatched') AS segment,
             COUNT(*) AS n_orders,
             ${graft.Num.sqlDsum("o_totalprice")} AS total_price
      FROM o LEFT JOIN customer ON big_cust = c_custkey
      GROUP BY 1 ORDER BY segment""",
    "q110_skew_report" -> """
      WITH d AS (
        SELECT CASE WHEN o_custkey % 10 = 0 THEN o_custkey END AS k
        FROM orders),
      s AS (SELECT k, COUNT(*) AS c FROM d WHERE k IS NOT NULL GROUP BY k),
      r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c, k) AS rn FROM s),
      a AS (
        SELECT CAST(SUM(c) AS BIGINT) AS nonnull_rows,
               COUNT(*) AS keys_total,
               CAST(MAX(c) AS BIGINT) AS max_group,
               (SELECT COUNT(*) FROM d WHERE k IS NULL) AS null_rows
        FROM s),
      p AS (
        SELECT a.*,
          (SELECT CAST(c AS BIGINT) FROM r
            WHERE rn = (50 * a.keys_total + 99) // 100) AS p50_group,
          (SELECT CAST(c AS BIGINT) FROM r
            WHERE rn = (99 * a.keys_total + 99) // 100) AS p99_group
        FROM a)
      SELECT metric, value FROM (
        SELECT 'rows_total' AS metric,
               CAST(nonnull_rows + null_rows AS DOUBLE) AS value FROM p
        UNION ALL SELECT 'null_rows', CAST(null_rows AS DOUBLE) FROM p
        UNION ALL SELECT 'null_fraction',
          CAST(null_rows AS DOUBLE) / (nonnull_rows + null_rows) FROM p
        UNION ALL SELECT 'keys_total', CAST(keys_total AS DOUBLE) FROM p
        UNION ALL SELECT 'max_group', CAST(max_group AS DOUBLE) FROM p
        UNION ALL SELECT 'p50_group', CAST(p50_group AS DOUBLE) FROM p
        UNION ALL SELECT 'p99_group', CAST(p99_group AS DOUBLE) FROM p
        UNION ALL SELECT 'skew_ratio',
          CAST(max_group AS DOUBLE) / p50_group FROM p)
      ORDER BY metric""")
}
