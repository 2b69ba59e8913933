package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, sum}
object Bench {

  /** Flagship queries carry `ops.Observed` counters through the bench:
    * zero-extra-pass row/volume metrics that give a wall-time delta its
    * missing denominator (time moved — did VOLUME?). Each counter sums an
    * output column that is itself an input-side count, so the artifact
    * records how many source rows the query actually aggregated, not just
    * how long it took. The observed frames are `collect()`ed (outputs are
    * a handful of rows) so the metrics land on the acted-on QueryExecution
    * synchronously — `count()` plans a separate QE (Observed scaladoc). */
  private val observes: Map[String, DataFrame => DataFrame] = Map(
    "q01_pricing_summary" -> (df => graft.ops.Observed.withCounters(df,
      "obs", count(lit(1)).as("out_rows"),
      sum(col("count_order")).as("lineitems_aggregated"))),
    "q82_regional_revenue" -> (df => graft.ops.Observed.withCounters(df,
      "obs", count(lit(1)).as("out_rows"),
      sum(col("n_items")).as("joined_items"))),
    "q96_dataset_build" -> (df => graft.ops.Observed.withCounters(df,
      "obs", count(lit(1)).as("out_rows"),
      sum(col("n_chunks")).as("chunks"),
      sum(col("chunk_tokens")).as("chunk_tokens"))))

  /** Queries whose plans already carry IN-PLAN `observe` nodes (wedge
    * count, sampled-edge count, PQ shortlist size, CC rounds, index
    * ingest volumes — the expensive-tail and standing-index queries where
    * a budget breach needs its volume context, r9/r10). They are
    * collect()ed so the metrics land on the acted-on QueryExecution, and
    * every named observation row is harvested — no wrapper needed. */
  private val observedInPlan = Set("q123_triangles", "q124_triangles_sampled",
    "q104_pq_ann", "q122_pq_scan", "q73_dedup_clusters", "q126_pq_batch",
    "q125_gram_index", "q127_shingle_index", "q128_shingle_bucketed",
    "q129_ivf_pq", "q130_triangles_budget", "q131_ivf_pq_residual")

  /** The standing indexes, force-built in a SEPARATELY-TIMED ingest pass
    * before warmup (r11 verdict task #1). Through r11, first-touch ingest
    * cost landed on whichever registry query touched each index first —
    * warmup *usually* absorbed it, but warmup failures were silent, and
    * when the driver box's warmup did not establish an index the timed
    * q125/q126 read 8–16 s against reuse-path budgets (two consecutive
    * red gates on accounting, not plans). Now the accounting is
    * deterministic by construction: each Bench JVM builds every index it
    * will need HERE, on a named `xN_ingest_*` line with its own budget in
    * tools/check_bench.py, and the query lines always measure the serving
    * path their typicals describe (the honest production split — ingest
    * is a once-per-corpus cost, serving is the hot path). Failures are
    * LOUD: a dead ingest is recorded in `failed`, which check_bench
    * treats as exit 1.
    *
    * Entry: (ingest line name, registry queries that read the index,
    * ensure fn). The query set scopes the pass under
    * SPARK_GRAFT_BENCH_ONLY / fork mode — a child benching one query
    * builds only that query's indexes. Short ids x1…x7 keep the compact
    * JSON line's one-prefix-per-entry convention collision-free. */
  private val standingIngests
      : Seq[(String, Set[String], (SparkSession, String) => String)] = Seq(
    ("x1_ingest_gram", Set("q125_gram_index"),
      (s, d) => { val (_, c) = graft.dedup.Dedup.ensureGramIndex(s, d)
        s"postings=${c._1}" }),
    ("x2_ingest_shingle", Set("q127_shingle_index"),
      (s, d) => { val (_, c) = graft.dedup.Dedup.ensureShingleIndex(s, d)
        s"postings=${c._2}" }),
    ("x3_ingest_shingle_bkt", Set("q128_shingle_bucketed"),
      (s, d) => { val (_, c) = graft.dedup.Dedup.ensureShingleBucketed(s, d)
        s"postings=${c._2}" }),
    ("x4_ingest_pq", Set("q122_pq_scan", "q126_pq_batch"),
      (s, d) => { val (_, n, _) = graft.similarity.Pq.pqIngest(s, d)
        s"vectors=$n" }),
    ("x5_ingest_ivfpq", Set("q129_ivf_pq"),
      (s, d) => { val (_, _, n, _) = graft.similarity.IvfPq.ivfPqIngest(s, d)
        s"vectors=$n" }),
    ("x6_ingest_ivfpq_res", Set("q131_ivf_pq_residual"),
      (s, d) => { val (_, _, n, _) =
        graft.similarity.IvfPq.ivfPqIngest(s, d, residual = true)
        s"vectors=$n" }),
    ("x7_ingest_semdedup", Set("q134_semdedup_direct"),
      (s, d) => { val (n, kept) =
        graft.similarity.Similarity.semDeDupIngest(s, d)
        // planes is DERIVED from corpus size since r13 (r12 verdict
        // task #3: fixed planes=8 made this line grow 5.2x at 10x
        // data); read the resolved dial back from the marker payload
        // so the ingest record carries it
        val planes = graft.ops.Standing
          .current(graft.ops.Scratch.root(s, d, "semdedup_idx"))
          .map(_._2.trim.split(" ")(0)).getOrElse("?")
        s"planes=$planes n=$n kept=$kept" }))

  /** Per-query JVM isolation (`SPARK_GRAFT_BENCH_FORK=1`): run every
    * registry query in a FRESH child JVM and aggregate the children's
    * JSON. In-suite numbers share one JVM across 242 executions, and
    * ContextCleaner reclaims old broadcast/shuffle state only after GC —
    * at sf≥1 that inflates late queries up to 8× vs solo (q71 35 s
    * in-suite vs 4.3 s solo at sf10, BENCHMARKS.md). Forked numbers
    * reproduce solo QueryProbe within noise, so regressions at big sf are
    * attributable from the artifact alone. The default stays in-suite:
    * at sf0.1 the distortion is ≤ noise and one JVM is ~10× cheaper than
    * 121 session startups. */
  private def runForked(sfDir: String): Unit = {
    val opens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .map(p => s"--add-opens=java.base/$p=ALL-UNNAMED")
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    // SPARK_GRAFT_BENCH_ONLY narrows the forked sweep the same way it
    // narrows the in-suite pass (each child still gets exactly one name)
    val names = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(ns) =>
        SparkEntry.queries.keys.toSeq.filter(ns.split(",").toSet).sorted
      case None => SparkEntry.queries.keys.toSeq.sorted
    }
    val results = names.map { name =>
      val cmd = (Seq(javaBin) ++ opens ++ Seq(
        s"-Xmx${sys.env.getOrElse("SPARK_GRAFT_FORK_MEM", "8g")}",
        "-Dspark.ui.enabled=false",
        "-cp", System.getProperty("java.class.path"), "graft.Bench"))
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment.put("SPARK_GRAFT_BENCH_ONLY", name)
      pb.environment.remove("SPARK_GRAFT_BENCH_FORK")
      pb.redirectErrorStream(false)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      System.err.println(s"BENCH_FORK $name")
      val p = pb.start()
      val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
      p.waitFor()
      // child emits {"..."queries":{"<name>":sec}...}; pull the one number
      val pat = ("\"" + java.util.regex.Pattern.quote(name) + "\":([0-9.]+)").r
      val sec = pat.findFirstMatchIn(out).map(_.group(1).toDouble).getOrElse {
        System.err.println(s"BENCH_FORK_FAIL $name (exit=${p.exitValue})"); -1.0
      }
      // propagate the child's own `failed` entries (its ingest pass —
      // a dead ingest must reach the parent artifact's failed field, or
      // fork mode silently reintroduces the quiet-red-gate class the
      // ingest split exists to kill; r12 review find). xN timings are
      // intentionally NOT aggregated: each child rebuilds its own
      // indexes as per-JVM setup, so summing would overstate the
      // once-per-corpus cost the in-suite xN lines price.
      val childFailed = "\"failed\":\\[([^\\]]*)\\]".r
        .findFirstMatchIn(out).map(_.group(1)).getOrElse("")
        .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty).toSeq
      (name, sec, childFailed)
    }
    // A dead child records -1.0; keep it OUT of the headline total (a
    // negative sentinel summed in silently shrinks the number the judge
    // reads) and name it in an explicit "failed" field instead.
    val (ok, bad) = results.partition(_._2 >= 0)
    val failed = (bad.map(_._1) ++ results.flatMap(_._3)).distinct
    emit(ok.map(r => r._1 -> r._2).toMap, sfDir, failed)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (sys.env.get("SPARK_GRAFT_BENCH_FORK").contains("1")) return runForked(sfDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // see Sessions.local: partition count should track shuffle volume;
    // the env knob is the local stand-in for that cluster-sizing rule
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // Spill, don't die: by default SMJ/cartesian buffer all rows of one
      // join key on-heap (ExternalAppendOnlyUnsafeRowArray stays an
      // ArrayBuffer until this row threshold), so one hot key at a big sf
      // is an executor OOM — seen at sf10, stage-1030 smj_findNextJoinRows.
      // Past the threshold the buffer becomes an UnsafeExternalSorter,
      // which spills under memory pressure. Same setting in Sessions.local.
      .config("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", graft.Tuning.JoinBufferSpillRows.toString)
      .config("spark.sql.cartesianProductExec.buffer.in.memory.threshold", graft.Tuning.JoinBufferSpillRows.toString)
      // 238 query executions share this JVM; ContextCleaner reclaims old
      // broadcasts/shuffles only after their weak refs are GC'd, and a
      // large heap may not GC for many queries — stale executor state
      // then inflates later queries (measured at sf10: q71 35 s in-suite
      // vs 4.3 s solo). Default periodicGC is 30min; tighten it.
      .config("spark.cleaner.periodicGC.interval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_BENCH_ONLY=<name[,name]>: bench a subset (the fork
    // children run exactly one query each)
    // SORTED name order, not Map order: a HashMap's iteration order
    // reshuffles whenever the key SET changes, so adding one query used
    // to re-deal every query's in-suite neighborhood — r11 measured q14
    // (0.4 s solo, 3 KB shuffle) reading 1.1–3.9 s purely because the
    // 131→133 re-deal parked it right behind q123's 456 MB wedge
    // shuffle. Sorted order pins each query's predecessor across rounds:
    // in-suite deltas compare apples to apples, and a new qNNN appends
    // near its numeric neighbors instead of reshuffling the deck.
    val queries = (sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(names) =>
        val keep = names.split(",").toSet
        SparkEntry.queries.filter { case (n, _) => keep(n) }
      case None => SparkEntry.queries
    }).toSeq.sortBy(_._1)
    // INGEST pass (before warmup): force-build every standing index any
    // selected query reads, each on its own timed line — see
    // standingIngests. Deterministic first-touch accounting: the timed
    // query pass below always measures the serving (reuse) path.
    val selected = queries.map(_._1).toSet
    val ingests = standingIngests.filter(_._2.exists(selected))
    val ingestFailed = scala.collection.mutable.ArrayBuffer[String]()
    val ingestResults = ingests.map { case (name, _, fn) =>
      System.err.println(s"BENCH_INGEST $name")
      val t0 = System.nanoTime()
      try {
        val stats = fn(spark, sfDir)
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"BENCH_INGEST_DONE $name $sec%.2fs $stats")
        name -> sec
      } catch {
        case e: Throwable =>
          // LOUD: a dead ingest means every query over this index will
          // pay first-touch (or fail) — record it so check_bench exits 1
          System.err.println(s"BENCH_INGEST_FAIL $name: $e")
          ingestFailed += name
          name -> (System.nanoTime() - t0) / 1e9
      }
    }
    // Warmup pass: JIT + codegen compilation + parquet footer caches. The
    // timed pass then measures steady-state query compute, which is what a
    // long-lived cluster session sees. Progress goes to stderr so a JVM
    // death (OOM → SparkUncaughtExceptionHandler exits) names its query.
    // SPARK_GRAFT_BENCH_NOWARM=1 skips it — for A/B sweeps of a config
    // knob at big sf, where both arms are equally cold and a second full
    // pass doubles the sweep's wall cost for no comparative signal.
    // Failures print (r11 verdict: the silent catch discarded the only
    // evidence when the driver box's warmup died mid-pass) but don't
    // abort — the timed pass will surface the same failure as BENCH_FAIL.
    if (!sys.env.get("SPARK_GRAFT_BENCH_NOWARM").contains("1"))
      queries.foreach { case (name, fn) =>
        System.err.println(s"BENCH_WARM $name")
        try fn(spark, sfDir).count() catch {
          case e: Throwable => System.err.println(s"BENCH_WARM_FAIL $name: $e")
        }
      }
    // One explicit GC between passes: the timed pass starts from a clean
    // old gen instead of inheriting the warmup's garbage.
    System.gc()
    val observedOut = scala.collection.mutable.LinkedHashMap[String, String]()
    // SPARK_GRAFT_BENCH_GC_BEFORE=<name[,name]>: explicit System.gc()
    // immediately before the named queries' timed runs — the r12
    // experiment knob for the in-suite multiplier on the heavy-shuffle
    // lines (q123/q124 read 2-3.4x their solo time late in a 134-query
    // session; the hypothesis is accumulated old-gen state, and a
    // pre-query full GC isolates it). Diagnostic only — not set by the
    // driver; results recorded in BENCHMARKS.md.
    val gcBefore = sys.env.get("SPARK_GRAFT_BENCH_GC_BEFORE")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    // One timed execution of `name` — shared by the timed pass and the
    // solo-retry pass so both readings time the identical action
    // (collect for observed queries, count otherwise). stdout stays a
    // single JSON line; failures go to stderr so a broken query is
    // visible instead of silently benching as wall-clock-to-throw.
    def runTimed(name: String, fn: (SparkSession, String) => DataFrame,
                 harvest: Boolean): Double = {
      val t0 = System.nanoTime()
      try {
        val wrapped = observes.get(name).map(w => w(fn(spark, sfDir)))
          .orElse(if (observedInPlan(name)) Some(fn(spark, sfDir)) else None)
        wrapped match {
          case Some(df) =>
            df.collect()
            // harvest EVERY named observation in the executed plan (the
            // "obs" wrapper and any in-plan nodes), merged flat; a field
            // name shared by several observations (q129's four per-query
            // probe scans each count scanned_rows) is qualified by its
            // observation name so the JSON object has no duplicate keys
            val fields = df.queryExecution.observedMetrics.toSeq
              .sortBy(_._1)
              .flatMap { case (nm, row) =>
                row.schema.fieldNames.zip(row.toSeq)
                  .map { case (f, v) => (nm, f, v) } }
            val dup = fields.groupBy(_._2).collect {
              case (f, vs) if vs.size > 1 => f }.toSet
            if (harvest && fields.nonEmpty)
              observedOut(name) = fields
                .map { case (nm, f, v) =>
                  "\"" + (if (dup(f)) s"${nm}_$f" else f) + "\":" + jsonValue(v) }
                .mkString("{", ",", "}")
          case None => fn(spark, sfDir).count()
        }
      } catch {
        case e: Throwable => System.err.println(s"BENCH_FAIL $name: $e")
      }
      (System.nanoTime() - t0) / 1e9
    }
    val results = queries.map { case (name, fn) =>
      System.err.println(s"BENCH_RUN $name")
      if (gcBefore(name)) System.gc()
      name -> runTimed(name, fn, harvest = true)
    }
    // SOLO-RETRY adjudication (r12 verdict task #1). Three consecutive
    // rounds shipped a red gate on a line that probed fine solo — the
    // shared host has multi-hour noisy-neighbor windows where one query's
    // in-suite reading lands 3-6x its steady state with byte-identical
    // shuffle volume (r12: q124 44.9 s in-suite vs 6.1-7.6 s solo), and
    // check_bench's whole-suite box factor cannot catch a window that
    // degrades MID-RUN. So Bench itself adjudicates: compute the exact
    // budget model the gate uses (graft.Budgets == check_bench.py,
    // lockstep pinned by BudgetSyncSpec), and re-run each over-budget
    // QUERY line once, solo, at the end of the suite — quiet-tail timing
    // with a fresh GC, the same action, the same JVM warmth. Both
    // readings ship in the artifact (`retry` field); check_bench passes
    // the line as NOISY when the retry is within budget and keeps FAIL
    // when it is not (a real plan regression is slow twice). Ingest
    // lines never retry: each xN builds persistent standing state, so a
    // second run would measure a different (reuse/no-op) code path.
    val retry =
      if (sys.env.get("SPARK_GRAFT_BENCH_NORETRY").contains("1")) Nil
      else {
        val box = Budgets.boxFactor(ingestResults ++ results)
        val qmap = queries.toMap
        results.filter { case (n, sec) => sec > Budgets.budget(n, box) }
          .map { case (name, sec) =>
            System.err.println(
              f"BENCH_RETRY $name (in-suite $sec%.2fs > budget " +
                f"${Budgets.budget(name, box)}%.2fs at box $box%.2f)")
            System.gc()
            name -> runTimed(name, qmap(name), harvest = false)
          }
      }
    emit((ingestResults ++ results).toMap, sfDir,
      failed = ingestFailed.toSeq, observed = observedOut.toSeq,
      retry = retry)
    spark.stop()
  }

  /** Render one observed-metric value as VALID JSON regardless of its
    * runtime type: current counters are longs and SQL nulls, but a future
    * Double observation can carry NaN/Infinity (invalid JSON bare) and a
    * string-typed one needs quoting+escaping — raw toString would emit a
    * silently-broken artifact line. */
  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case d: Double if d.isNaN || d.isInfinite => "null"
    case f: Float if f.isNaN || f.isInfinite => "null"
    case n: Byte => n.toString
    case n: Short => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Float => n.toString
    case n: Double => n.toString
    case n: java.math.BigDecimal => n.toString
    case n: BigDecimal => n.toString
    case b: Boolean => b.toString
    case other => // strings and anything exotic: quoted, escaped
      "\"" + other.toString.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
  }

  // Output layout matters: the driver's BENCH_r{N}.json retains only the
  // FINAL 2000 chars of stdout (measured constant across r4–r7), so a
  // single verbose line (~4.5 KB at 123 queries) always lost its front
  // half — 46/123 per-query entries were unrecoverable from r7's
  // artifact. Two lines fix it:
  //   1. the verbose line (full names, seconds) for humans and local logs;
  //   2. a COMPACT line printed LAST — short id (name up to the first
  //      '_', unique across the registry) → integer milliseconds —
  //      ~1.6 KB at 123 queries, so the tail capture keeps it whole.
  // Compact entries are ordered cheapest-first: if the suite ever
  // outgrows the capture, truncation eats sub-second rows from the front
  // and tools/check_bench.py's regex fallback still sees every expensive
  // query. The total/metadata fields close BOTH lines so the last bytes
  // of any capture carry the headline number.
  private def emit(results: Map[String, Double], sfDir: String,
                   failed: Seq[String] = Nil,
                   observed: Seq[(String, String)] = Nil,
                   retry: Seq[(String, Double)] = Nil): Unit = {
    def ms(v: Double): Double = math.rint(v * 1000) / 1000
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // observed counters ride the verbose line only — the compact line's
    // byte budget is what survives the driver's tail capture
    val obsJson = observed.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // solo-retry readings (over-budget lines re-run at suite end). On
    // BOTH lines: the retry map is empty on a quiet box and a handful of
    // entries in a noisy window, so it fits the compact line's tail-
    // capture byte budget — and the gate's adjudication must survive the
    // driver's 2000-char capture or the retry was measured for nothing.
    val retryVerbose = retry.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val retryCompact = retry.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + math.rint(v * 1000).toLong
    }.mkString("{", ",", "}")
    val meta = s""""n_queries":${results.size},"n_failed":${failed.size},""" +
      s""""unit":"sec","metric":"total","value":${ms(total)}"""
    println(s"""{"queries":$qs,"failed":$failedJson,"observed":$obsJson,""" +
      s""""retry":$retryVerbose,"sf":"$sfDir",$meta}""")
    val qms = results.toSeq.sortBy(_._2).map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + math.rint(v * 1000).toLong
    }.mkString("{", ",", "}")
    println(s"""{"qms":$qms,"failed":$failedJson,"retry":$retryCompact,""" +
      s""""sf":"$sfDir",$meta}""")
  }
}
