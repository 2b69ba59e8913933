package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed percentiles (linear interpolation, `quantile_cont`
  * semantics) for grouped data — the 100 TB formulations. Spark's built-in
  * `percentile` aggregate buffers every (value, count) of a group inside
  * one aggregation buffer: value-domain-bounded for low-cardinality
  * measures but an OOM liability on hot groups with wide domains.
  *
  * Two memory-safe formulations, measured at sf0.1 local[8] steady state
  * (see BENCHMARKS.md for the full matrix):
  *
  *  - [[viaWindowRank]] — `row_number` per group + straddling-rank filter.
  *    One exchange, sort-based, spills via UnsafeExternalSorter. Fastest
  *    simple plan (~1.0 s) but the per-group sort runs in ONE task: fine
  *    when groups are many, a parallelism wall when one group is huge.
  *  - [[viaBucketSelection]] — two-level histogram selection. A coarse
  *    `floor(v/W)` histogram (map-side partial agg → O(groups × domain/W)
  *    shuffle) locates the bucket holding each target rank; an exact-value
  *    histogram over only the candidate buckets picks the straddling order
  *    statistics. No operator ever sorts or buffers raw rows; every window
  *    runs over histogram rows, so parallelism and memory are bounded by
  *    the VALUE DOMAIN, not the data size. Costs more stages (~1.2 s
  *    local; pure scheduling latency that amortizes at scale).
  *
  * Both interpolate `v_lo + (p − lo)·(v_hi − v_lo)` at `p = 1 + q·(n−1)` —
  * the formula Spark's `percentile` and DuckDB's `quantile_cont` share; q
  * and integer n are binary-exact doubles, so results are deterministic
  * across engines. PatternsSpec pins all three formulations equal.
  *
  * Output: one row per (group, quantile): groupCol, qi (1-based int),
  * quantile value, n (group count).
  */
object Percentiles {

  /** Dispatch threshold for [[grouped]]/[[nearestRankGrouped]]: the largest
    * per-group row count the window-rank (single-task-per-group sort) form
    * is allowed to handle before the bucket-selection form takes over.
    *
    * Measured crossover (QueryProbe solo, local[32], q52 shape on
    * lineitem.l_extendedprice, 3 groups — BENCHMARKS.md round-7 table):
    * at max-group ≈ 0.3M rows (sf0.1) the sort form still wins
    * (~1.0 vs ~1.2 s — bucket pays its extra fixed stages of
    * scheduling); by ≈ 3M (sf1) the sort form loses 3× and at ≈ 30M
    * (sf10) 5× (42 vs 8.4 s), the gap growing as n·log n in ONE task vs
    * fully-parallel histogram scans. 512k sits just under the measured
    * crossing, and a single-task sort of 512k rows is also comfortably
    * within one executor's memory at cluster scale — above it,
    * parallelism (not memory) is what the bucket form buys. */
  val SortPathMaxGroupRows: Long = graft.Tuning.SortPathMaxGroupRows

  /** One cheap scan answering "how hot is the hottest group?" — the
    * runtime statistic the [[grouped]] dispatch keys on (plan-time stats
    * can't see group skew). Reads ONLY the group column (parquet prunes
    * the rest; for dictionary-encoded group columns this is a fraction of
    * the data) and partial-aggregates map-side, so the shuffle is
    * O(distinct groups). Callers that already track table statistics skip
    * it via `maxGroupRowsHint`. */
  def probeMaxGroupRows(df: DataFrame, groupCol: String): Long =
    df.groupBy(col(groupCol)).agg(count(lit(1)).as("cnt"))
      .agg(coalesce(max(col("cnt")), lit(0L)))
      .head.getLong(0)

  /** STATS-DISPATCHED grouped exact percentiles — the registered q52 path
    * (the similarityJoin τ-dispatch precedent: one public entry point, the
    * engine picks the physical regime). Both regimes return bit-identical
    * results (PatternsSpec pins them equal), so the choice is purely
    * physical:
    *
    *  - hottest group ≤ [[SortPathMaxGroupRows]] → [[viaWindowRank]]:
    *    fewest stages, per-group sort tasks are small, wins on latency.
    *  - hottest group above it → [[viaBucketSelection]]: per-task work
    *    bounded by the value domain, immune to group size/skew — the
    *    100 TB regime, where a hot group would serialize the sort form
    *    into one spilling task.
    *
    * The dispatch statistic comes from [[probeMaxGroupRows]] (one
    * group-column scan) unless the caller supplies `maxGroupRowsHint`. */
  def grouped(df: DataFrame, groupCol: String, valueCol: String,
              quantiles: Seq[Double], bucketWidth: Double,
              maxGroupRowsHint: Option[Long] = None,
              sortPathMaxGroupRows: Long = SortPathMaxGroupRows): DataFrame = {
    val hottest = maxGroupRowsHint.getOrElse(probeMaxGroupRows(df, groupCol))
    if (hottest > sortPathMaxGroupRows)
      viaBucketSelection(df, groupCol, valueCol, quantiles, bucketWidth)
    else viaWindowRank(df, groupCol, valueCol, quantiles)
  }

  private def interpolated(vLo: Column, vHi: Column, p: Column): Column =
    vLo + (p - floor(p)) * (vHi - vLo)

  /** Running rank ranges over a (g, b, cnt) coarse histogram, as a
    * TWO-LEVEL distributed prefix sum. A per-group running window would be
    * a single task whenever one group dominates (keySkewReport's input IS
    * one group); instead the running sum partitions by
    * (group, super-bucket) — never more than `SuperSpan` histogram rows
    * per task — and the cross-super-bucket carry comes from a broadcast
    * non-equi join over super-bucket TOTALS (≤ domain/(width·span) rows).
    * Returns (g, b, cnt, hi_rank, lo_rank); no unpartitioned window
    * anywhere (the registry-wide PlanAuditSpec sweep enforces this). */
  private def cumulativeRanks(hist: DataFrame): DataFrame = {
    val SuperSpan = 256
    val h = hist.withColumn("sb", floor(col("b") / SuperSpan).cast("long"))
    val local = h.withColumn("local_hi", sum(col("cnt")).over(
      Window.partitionBy(col("g"), col("sb")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sbTot = h.groupBy(col("g").as("tg"), col("sb").as("tsb"))
      .agg(sum(col("cnt")).as("sb_cnt"))
    val sbPrev = sbTot.join(
        broadcast(sbTot.select(col("tg").as("pg"), col("tsb").as("psb"),
          col("sb_cnt").as("p_cnt"))),
        col("tg") === col("pg") && col("psb") < col("tsb"), "left")
      .groupBy(col("tg"), col("tsb"))
      .agg(coalesce(sum(col("p_cnt")), lit(0L)).as("prev_cnt"))
    local.join(sbPrev, col("g") === col("tg") && col("sb") === col("tsb"))
      .withColumn("hi_rank", col("local_hi") + col("prev_cnt"))
      .withColumn("lo_rank", col("hi_rank") - col("cnt") + 1)
      .select(col("g"), col("b"), col("cnt"), col("hi_rank"), col("lo_rank"))
  }

  /** Window-rank formulation: one exchange, per-group single-task sort. */
  def viaWindowRank(df: DataFrame, groupCol: String, valueCol: String,
                    quantiles: Seq[Double]): DataFrame = {
    val li = df.select(col(groupCol).as("g"), col(valueCol).as("v"))
    val ranked = li.withColumn("rn", row_number().over(
      Window.partitionBy(col("g")).orderBy(col("v"))))
    val spec = li.groupBy(col("g").as("sg")).agg(count(lit(1)).as("n"))
      .select(col("sg"), col("n"),
        posexplode(typedlit(quantiles)).as(Seq("qi0", "q")))
      .withColumn("p", lit(1.0) + col("q") * (col("n") - 1).cast("double"))
      .withColumn("lo", floor(col("p")).cast("long"))
      .withColumn("hi", ceil(col("p")).cast("long"))
    ranked.join(broadcast(spec),
        col("g") === col("sg") &&
          (col("rn") === col("lo") || col("rn") === col("hi")))
      .groupBy(col("sg"), col("qi0"), col("n"), col("p"), col("lo"))
      .agg(min(when(col("rn") === col("lo"), col("v"))).as("v_lo"),
           min(when(col("rn") === col("hi"), col("v"))).as("v_hi"))
      .select(col("sg").as(groupCol),
        (col("qi0") + 1).cast("int").as("qi"),
        interpolated(col("v_lo"), col("v_hi"), col("p")).as("quantile"),
        col("n"))
  }

  /** Nearest-rank order statistics via the [[viaBucketSelection]] two-level
    * histogram: the EXACT value at 1-based rank `(p·n + 99) div 100` per
    * group for each integer percent p — the q107 winsorized-stats integer
    * rank discipline, bit-exact on any engine. No raw-row sort and no
    * unpartitioned window anywhere: every window runs over histogram rows
    * bounded by the VALUE DOMAIN (`domain / bucketWidth` coarse rows;
    * ≤ distinct-values-per-bucket exact rows), never the data size — the
    * formulation [[graft.ops.Scale.keySkewReport]] needs, where the input
    * is a per-key group-size table with potentially billions of keys.
    * Output: (groupCol, pct, value, n). */
  def nearestRankViaBuckets(df: DataFrame, groupCol: String, valueCol: String,
                            percents: Seq[Int], bucketWidth: Double): DataFrame = {
    val li = df.select(col(groupCol).as("g"), col(valueCol).as("v"))
    val bucket = floor(col("v") / bucketWidth).cast("long")

    // Pass 1: coarse histogram + running rank ranges ([[cumulativeRanks]]:
    // two-level distributed prefix sum, no unpartitioned window).
    val hist = li.groupBy(col("g"), bucket.as("b")).agg(count(lit(1)).as("cnt"))
    val cum = cumulativeRanks(hist)

    // Integer target ranks (n per group reuses hist's exchange).
    val targets = hist.groupBy(col("g").as("sg")).agg(sum(col("cnt")).as("n"))
      .select(col("sg"), col("n"), explode(typedlit(percents)).as("pct"))
      .withColumn("t", expr("(pct * n + 99) div 100"))

    // Which coarse bucket holds each target rank, and the rank within it.
    val located = targets.join(cum,
        col("sg") === col("g") && col("t").between(col("lo_rank"), col("hi_rank")))
      .select(col("sg"), col("pct"), col("n"), col("t"),
        col("b").as("tb"), (col("t") - col("lo_rank") + 1).as("k"))

    // Pass 2: exact-value histogram restricted to candidate buckets.
    val candBuckets = located.select(col("sg").as("cg"), col("tb").as("cb")).distinct()
    val vhist = li.join(broadcast(candBuckets),
        col("g") === col("cg") && bucket === col("cb"))
      .groupBy(col("g"), col("cb").as("vb"), col("v"))
      .agg(count(lit(1)).as("vcnt"))
    val vcum = vhist.withColumn("v_hi_rank", sum(col("vcnt")).over(
        Window.partitionBy(col("g"), col("vb")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("v_lo_rank", col("v_hi_rank") - col("vcnt") + 1)

    located.join(vcum,
        col("sg") === vcum("g") && col("tb") === col("vb") &&
          col("k").between(col("v_lo_rank"), col("v_hi_rank")))
      .select(col("sg").as(groupCol), col("pct"), col("v").as("value"), col("n"))
  }

  /** Two-level bucket-selection formulation: no raw-row sort anywhere,
    * full parallelism at any scale. `bucketWidth` sets the coarse bucket
    * size in value units; candidate buckets then hold at most
    * `bucketWidth × (distinct values per unit)` histogram rows regardless
    * of data size (e.g. 2-decimal currency → ≤ 100·W values/bucket). */
  def viaBucketSelection(df: DataFrame, groupCol: String, valueCol: String,
                         quantiles: Seq[Double], bucketWidth: Double): DataFrame = {
    val li = df.select(col(groupCol).as("g"), col(valueCol).as("v"))
    val bucket = floor(col("v") / bucketWidth).cast("long")

    // Pass 1: coarse histogram + running rank ranges ([[cumulativeRanks]]:
    // two-level distributed prefix sum — a per-group running window here
    // would serialize the whole formulation into one task whenever a
    // single group dominates, the exact wall this formulation exists to
    // avoid).
    val hist = li.groupBy(col("g"), bucket.as("b")).agg(count(lit(1)).as("cnt"))
    val cum = cumulativeRanks(hist)

    // Quantile spec: n per group (reuses hist's exchange), target ranks.
    val spec = hist.groupBy(col("g").as("sg")).agg(sum(col("cnt")).as("n"))
      .select(col("sg"), col("n"),
        posexplode(typedlit(quantiles)).as(Seq("qi0", "q")))
      .withColumn("p", lit(1.0) + col("q") * (col("n") - 1).cast("double"))
    val targets = spec.select(col("sg"), col("qi0"), col("n"), col("p"),
      explode(array(floor(col("p")).cast("long"), ceil(col("p")).cast("long"))).as("t"))

    // Which coarse bucket holds each target rank, and the rank within it.
    val located = targets.join(cum,
        col("sg") === col("g") && col("t").between(col("lo_rank"), col("hi_rank")))
      .select(col("sg"), col("qi0"), col("n"), col("p"), col("t"),
        col("b").as("tb"), (col("t") - col("lo_rank") + 1).as("k"))

    // Pass 2: exact-value histogram restricted to candidate buckets.
    val candBuckets = located.select(col("sg").as("cg"), col("tb").as("cb")).distinct()
    val vhist = li.join(broadcast(candBuckets),
        col("g") === col("cg") && bucket === col("cb"))
      .groupBy(col("g"), col("cb").as("vb"), col("v"))
      .agg(count(lit(1)).as("vcnt"))
    val vcum = vhist.withColumn("v_hi_rank", sum(col("vcnt")).over(
        Window.partitionBy(col("g"), col("vb")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("v_lo_rank", col("v_hi_rank") - col("vcnt") + 1)

    // The k-th smallest value within a bucket is the value whose
    // cumulative range covers k; assemble v_lo/v_hi and interpolate.
    located.join(vcum,
        col("sg") === vcum("g") && col("tb") === col("vb") &&
          col("k").between(col("v_lo_rank"), col("v_hi_rank")))
      .groupBy(col("sg"), col("qi0"), col("n"), col("p"))
      .agg(min(when(col("t") === floor(col("p")).cast("long"), col("v"))).as("v_lo"),
           min(when(col("t") === ceil(col("p")).cast("long"), col("v"))).as("v_hi"))
      .select(col("sg").as(groupCol),
        (col("qi0") + 1).cast("int").as("qi"),
        interpolated(col("v_lo"), col("v_hi"), col("p")).as("quantile"),
        col("n"))
  }
}
