package graft.queries

import graft.{Num, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic data design patterns — the reference's declared-but-pending
  * chapters 09/10 (README.md:146-150): top-N per group, histogram/binning,
  * secondary sort, inverted index, percentiles. Each is the canonical
  * distributed formulation: windows and ordered aggregates, never
  * driver-side loops. */
object Patterns {

  /** Top-N per group (ch. 09's flagship pattern): 3 highest-value orders
    * per market segment. rank-over-window = one shuffle on the group key;
    * no global sort. */
  def q48TopNPerGroup(spark: SparkSession, d: String): DataFrame = {
    val joined = Tables.orders(spark, d)
      .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    joined.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_mktsegment"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("c_mktsegment"), col("rk"))
  }

  /** Histogram / binning: fixed-width 50k buckets over order totals.
    * Bin id is a scalar expression → single aggregation, no shuffle of
    * raw values beyond the groupBy. */
  def q49Histogram(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .groupBy(floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), Num.dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("bucket")

  /** Secondary sort: per-user event-type sequence ordered by (ts,
    * event_id), first 5 shown. The distributed form is sort-within-group
    * via ordered collect (sort_array over structs) — never a global sort,
    * never assuming input order. Rendered as a '|'-joined string so the
    * driver's pandas compare (which can't hash array cells) can verify it. */
  def q50SecondarySort(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy("user_id")
      .agg(concat_ws("|", slice(expr(
        "transform(sort_array(collect_list(struct(ts, event_id, event_type))), x -> x.event_type)"),
        1, 5)).as("first5_types"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")

  /** Inverted index (search-engine pattern; bonus tf_idf sibling):
    * term → document-frequency + first postings, bounded output. */
  def q51InvertedIndex(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), explode(graft.text.Text.tokens).as("term"))
      .groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"),
           concat_ws("|", expr(
             "transform(slice(sort_array(collect_set(doc_id)), 1, 5), x -> cast(x as string))"))
             .as("postings_head"))
      .orderBy("term")

  /** Exact percentiles (linear interpolation) of a 2-decimal measure,
    * rounded at 4dp: above fp divergence between engines' interpolation
    * order, below the data's resolution. One row per quantile so the
    * driver compares plain doubles.
    *
    * Uses [[graft.ops.Percentiles.grouped]] — the STATS-DISPATCHED entry
    * point (round 7; the similarityJoin τ-dispatch precedent): one probe
    * of the hottest group's row count routes small groups to
    * [[graft.ops.Percentiles.viaWindowRank]] (`row_number` per group —
    * fewest stages, wins on latency while per-group sort tasks stay
    * small) and hot groups to
    * [[graft.ops.Percentiles.viaBucketSelection]] (two-level histogram —
    * per-task work bounded by the value domain, so one huge group can't
    * serialize the plan into a single spilling sort task). Neither regime
    * ever buffers a group's values in an aggregation buffer (Spark's
    * `percentile` aggregate does — an OOM on hot groups at 100 TB).
    * PatternsSpec pins all formulations equal, BENCHMARKS.md has the
    * measured matrix and the crossover. Same interpolation formula as
    * quantile_cont → the oracle is unchanged. */
  def q52Percentiles(spark: SparkSession, d: String): DataFrame =
    graft.ops.Percentiles.grouped(
        Tables.lineitem(spark, d), "l_returnflag", "l_extendedprice",
        Seq(0.25, 0.5, 0.75), bucketWidth = 100)
      .select(col("l_returnflag"), col("qi"),
        round(col("quantile"), 4).as("quartile"), col("n"))
      .orderBy("l_returnflag", "qi")

  /** q52's REGIME-PINNING twin: the same exact quartiles with the
    * bucket-selection plan FORCED (no dispatch — q52 itself now
    * stats-dispatches and takes this plan whenever the hottest group
    * exceeds [[graft.ops.Percentiles.SortPathMaxGroupRows]]). Registered
    * separately (same oracle as q52) so the bucket regime keeps its own
    * per-round benchmark row at every sf — at sf0.1, where the dispatch
    * correctly picks the sort form, this row is what keeps measuring the
    * regime the dispatch would take at sf1+: window-rank is
    * GROUP-COUNT-bound (3 l_returnflag groups ⇒ 3 single-threaded sort
    * tasks over 60M rows, 42 s solo at sf10) while bucket selection's
    * per-task work is bounded by histogram rows, never group size
    * (8.4 s at sf10). */
  def q120PercentilesBuckets(spark: SparkSession, d: String): DataFrame =
    graft.ops.Percentiles.viaBucketSelection(
        Tables.lineitem(spark, d), "l_returnflag", "l_extendedprice",
        Seq(0.25, 0.5, 0.75), bucketWidth = 100)
      .select(col("l_returnflag"), col("qi"),
        round(col("quantile"), 4).as("quartile"), col("n"))
      .orderBy("l_returnflag", "qi")

  /** Top-N per group via the bounded-heap aggregate
    * ([[graft.functions.TopKByScore]]): identical results to the window
    * formulation (q48) with O(groups × k) shuffle instead of O(rows) —
    * the ranking twin of map-side combine. Oracle = same SQL as q48. */
  def q53TopKAgg(spark: SparkSession, d: String): DataFrame = {
    val top3 = udaf(new graft.functions.TopKByScore(3))
    Tables.orders(spark, d)
      .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(top3(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("c_mktsegment"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("c_mktsegment"), (col("pos") + 1).as("rk"),
              col("entry._2").as("o_orderkey"), col("entry._1").as("o_totalprice"))
      .orderBy("c_mktsegment", "rk")
  }

  /** Structured → hierarchical (ch. 10 classic): nest each order's line
    * items as an ordered array of structs — the denormalization pattern
    * for document stores / nested parquet. One groupBy; array ordered by
    * line number for determinism. */
  def q57NestLineitems(spark: SparkSession, d: String): DataFrame = {
    // The operator under test is the nesting aggregation; the trailing
    // posexplode flattens it back only so the driver (whose pandas compare
    // can't hash array cells) can verify the nested content + order.
    val nested = Tables.lineitem(spark, d)
      .filter(col("l_orderkey") < 100)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_items"),
           sort_array(collect_list(struct(col("l_linenumber"), col("l_quantity"))))
             .as("items"))
    nested
      .select(col("l_orderkey"), col("n_items"),
        posexplode(col("items")).as(Seq("pos", "item")))
      .select(col("l_orderkey"), col("n_items"), col("pos").cast("int").as("pos"),
        col("item.l_linenumber").as("l_linenumber"),
        col("item.l_quantity").as("l_quantity"))
      .orderBy("l_orderkey", "pos")
  }

  /** RANGE-frame window (value-based sliding window): per event, count
    * and exact sum of the same user's events in the PRECEDING HOUR — a
    * time-window aggregate no ROWS frame can express (the frame width is
    * measured in event-time, not row count). The order key is integer
    * microseconds (`rangeBetween` needs a numeric order column); the same
    * numeric RANGE frame runs on the DuckDB side, and peers (equal
    * timestamps) are included identically by RANGE semantics, so the
    * result is deterministic without a tiebreak. One shuffle on user_id. */
  def q84RangeFrame(spark: SparkSession, d: String): DataFrame = {
    val Dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L) // 1 hour in microseconds
    Tables.events(spark, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("n_last_hour", count(lit(1)).over(w))
      .withColumn("sum_last_hour",
        sum(col("value").cast(Dec)).over(w).cast("double"))
      .filter(col("user_id") < 10)
      .select("user_id", "event_id", "n_last_hour", "sum_last_hour")
      .orderBy("user_id", "event_id")
  }

  /** Ranking-function family (pending ch. 08 completeness): row_number,
    * dense_rank (on a coarser key), ntile quartiles, lead — one partition
    * key, so Catalyst computes all four with a single exchange. */
  def q58RankFamily(spark: SparkSession, d: String): DataFrame = {
    val byPrice = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val byBucket = Window.partitionBy(col("c_mktsegment"))
      .orderBy(floor(col("o_totalprice") / 50000).desc)
    Tables.orders(spark, d)
      .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .withColumn("rn", row_number().over(byPrice))
      .withColumn("bucket_rank", dense_rank().over(byBucket))
      .withColumn("quartile", ntile(4).over(byPrice))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(byPrice))
      // percent_rank = (rank-1)/(n-1), cume_dist = rows≤cur/n: identical
      // integer-ratio doubles on both engines — no rounding needed
      .withColumn("pct_rank", percent_rank().over(byPrice))
      .withColumn("cume", cume_dist().over(byPrice))
      // first_value/nth_value use the default ORDER BY frame (unbounded
      // preceding → current row): nth_value(2) is NULL at rn=1 — the
      // standard frame-respecting semantics, identical in DuckDB
      .withColumn("top_price", first(col("o_totalprice")).over(byPrice))
      .withColumn("second_price", nth_value(col("o_totalprice"), 2).over(byPrice))
      .filter(col("rn") <= 5)
      .select(col("c_mktsegment"), col("rn").cast("int").as("rn"),
        col("bucket_rank").cast("int").as("bucket_rank"),
        col("quartile").cast("int").as("quartile"),
        col("o_totalprice"), col("next_price"),
        col("pct_rank"), col("cume"),
        col("top_price"), col("second_price"))
      .orderBy("c_mktsegment", "rn")
  }

  /** Feature engineering (pending ch. 12): per-user time-series features —
    * lag, delta, and a bounded rolling window (previous 5 events). One
    * window partition serves every feature; the rolling sum uses the
    * decimal buffer so frames are exact at any parallelism. */
  def q63Features(spark: SparkSession, d: String): DataFrame = {
    val Dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prev5 = w.rowsBetween(-5, -1)
    Tables.events(spark, d)
      .filter(col("user_id") < 10)
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("delta", col("value") - lag(col("value"), 1).over(w))
      .withColumn("roll_sum_5",
        sum(col("value").cast(Dec)).over(prev5).cast("double"))
      .withColumn("roll_cnt_5", count(lit(1)).over(prev5))
      .select("user_id", "event_id", "value", "prev_value", "delta",
        "roll_sum_5", "roll_cnt_5")
      .orderBy("user_id", "event_id")
  }

  /** Cumulative distinct users per day. The naive form (distinct over an
    * expanding prefix) is quadratic; the scalable rewrite maps each user
    * to their FIRST day (one aggregation), counts first-appearances per
    * day, and prefix-sums — linear + one tiny window. */
  def q64CumulativeUsers(spark: SparkSession, d: String): DataFrame = {
    val firstSeen = Tables.events(spark, d)
      .groupBy("user_id")
      .agg(min(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")).as("first_day"))
    firstSeen.groupBy(col("first_day").as("day"))
      .agg(count(lit(1)).as("new_users"))
      .withColumn("cumulative_users",
        sum(col("new_users")).over(
          Window.orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("day")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q64_cumulative_users" -> (q64CumulativeUsers _),
    "q63_features"        -> (q63Features _),
    "q58_rank_family"     -> (q58RankFamily _),
    "q84_range_frame"     -> (q84RangeFrame _),
    "q57_nest_lineitems"  -> (q57NestLineitems _),
    "q53_topk_agg"        -> (q53TopKAgg _),
    "q48_topn_per_group"  -> (q48TopNPerGroup _),
    "q49_histogram"       -> (q49Histogram _),
    "q50_secondary_sort"  -> (q50SecondarySort _),
    "q51_inverted_index"  -> (q51InvertedIndex _),
    "q52_percentiles"     -> (q52Percentiles _),
    "q120_percentiles_buckets" -> (q120PercentilesBuckets _),
  )

  val oracles: Map[String, String] = Map(
    "q64_cumulative_users" -> """
      WITH first_seen AS (
        SELECT user_id, MIN(STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d')) AS first_day
        FROM events GROUP BY user_id),
      per_day AS (
        SELECT first_day AS day, COUNT(*) AS new_users
        FROM first_seen GROUP BY first_day)
      SELECT day, new_users,
             CAST(SUM(new_users) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumulative_users
      FROM per_day ORDER BY day""",
    "q63_features" -> """
      SELECT user_id, event_id, value,
             LAG(value, 1) OVER w AS prev_value,
             value - LAG(value, 1) OVER w AS delta,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS DOUBLE) AS roll_sum_5,
             COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS roll_cnt_5
      FROM events WHERE user_id < 10
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id""",
    "q84_range_frame" -> """
      SELECT user_id, event_id, n_last_hour, sum_last_hour FROM (
        SELECT user_id, event_id,
               COUNT(*) OVER w AS n_last_hour,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS STRING) AS DOUBLE)
                 AS sum_last_hour
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW))
      WHERE user_id < 10
      ORDER BY user_id, event_id""",
    "q58_rank_family" -> """
      SELECT c_mktsegment, CAST(rn AS INT) AS rn,
             CAST(bucket_rank AS INT) AS bucket_rank,
             CAST(quartile AS INT) AS quartile, o_totalprice, next_price,
             pct_rank, cume, top_price, second_price
      FROM (
        SELECT c_mktsegment, o_totalprice,
          ROW_NUMBER() OVER w AS rn,
          DENSE_RANK() OVER (PARTITION BY c_mktsegment
                             ORDER BY FLOOR(o_totalprice / 50000) DESC) AS bucket_rank,
          NTILE(4) OVER w AS quartile,
          LEAD(o_totalprice, 1) OVER w AS next_price,
          PERCENT_RANK() OVER w AS pct_rank,
          CUME_DIST() OVER w AS cume,
          FIRST_VALUE(o_totalprice) OVER w AS top_price,
          NTH_VALUE(o_totalprice, 2) OVER w AS second_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY o_totalprice DESC, o_orderkey))
      WHERE rn <= 5 ORDER BY c_mktsegment, rn""",
    "q57_nest_lineitems" -> """
      SELECT l_orderkey, COUNT(*) OVER (PARTITION BY l_orderkey) AS n_items,
             CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_quantity) - 1 AS INT) AS pos,
             l_linenumber, l_quantity
      FROM lineitem WHERE l_orderkey < 100
      ORDER BY l_orderkey, pos""",
    "q53_topk_agg" -> """
      SELECT c_mktsegment, CAST(rk AS INT) AS rk, o_orderkey, o_totalprice FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders JOIN customer ON o_custkey = c_custkey)
      WHERE rk <= 3 ORDER BY c_mktsegment, rk""",
    "q48_topn_per_group" -> """
      SELECT c_mktsegment, CAST(rk AS INT) AS rk, o_orderkey, o_totalprice FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders JOIN customer ON o_custkey = c_custkey)
      WHERE rk <= 3 ORDER BY c_mktsegment, rk""",
    "q49_histogram" -> s"""
      SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
             COUNT(*) AS n, ${Num.sqlDsum("o_totalprice")} AS sum_price
      FROM orders GROUP BY 1 ORDER BY bucket""",
    "q50_secondary_sort" -> """
      SELECT user_id,
             array_to_string((list(event_type ORDER BY ts, event_id))[1:5], '|')
               AS first5_types,
             COUNT(*) AS n_events
      FROM events GROUP BY user_id ORDER BY user_id""",
    "q51_inverted_index" -> s"""
      SELECT term, COUNT(DISTINCT doc_id) AS df,
             array_to_string(
               list_transform(list_sort(list(DISTINCT doc_id))[1:5],
                              x -> CAST(x AS VARCHAR)), '|') AS postings_head
      FROM (SELECT doc_id, unnest(${graft.text.Text.duckTokens}) AS term
            FROM documents)
      GROUP BY term ORDER BY term""",
    "q52_percentiles" -> """
      SELECT l_returnflag, CAST(qi AS INT) AS qi, quartile, n FROM (
        SELECT l_returnflag,
               unnest(list_transform(
                 quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]),
                 x -> round(x, 4))) AS quartile,
               generate_subscripts(
                 quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]), 1) AS qi,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag)
      ORDER BY l_returnflag, qi""",
    // q120 computes the IDENTICAL quartiles by a different physical plan;
    // the ground truth is the same SQL as q52's.
    "q120_percentiles_buckets" -> """
      SELECT l_returnflag, CAST(qi AS INT) AS qi, quartile, n FROM (
        SELECT l_returnflag,
               unnest(list_transform(
                 quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]),
                 x -> round(x, 4))) AS quartile,
               generate_subscripts(
                 quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]), 1) AS qi,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag)
      ORDER BY l_returnflag, qi""",
  )
}
