package graft

import graft.functions.exprs
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("FloatVecDot kernel is bitwise-equal to the SQL sequential fold") {
    val df = Tables.embeddings(spark, sf).limit(200)
      .select(col("vec_id"), col("embedding"))
    val both = df.select(
      exprs.vecDot(col("embedding"), col("embedding")).as("kernel"),
      expr(Similarity.dotSql("embedding", "embedding")).as("sql"))
    assert(both.filter(col("kernel") =!= col("sql")).count() == 0)
  }

  test("hashed-set Jaccard equals string-set Jaccard") {
    val docs = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("b c d", "c d e", "d e f")),
      (3L, Seq("x y z"))).toDF("id", "shingles")
    val hs = docs.select(col("id"), exprs.hashSetSorted(col("shingles")).as("hs"),
      col("shingles"))
    val pairs = hs.as("a").join(hs.as("b"), col("a.id") < col("b.id"))
      .select(
        exprs.sortedIntersectCount(col("a.hs"), col("b.hs")).as("kernel"),
        size(array_intersect(col("a.shingles"), col("b.shingles"))).as("builtin"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("gramN hashed-set cardinality == distinct string n-gram count") {
    val docs = Tables.documents(spark, sf).limit(200)
      .withColumn("toks", graft.text.Text.tokens)
      .filter(size(col("toks")) >= 8)
    val diff = docs.select(
        size(graft.functions.exprs.gramNSetSorted(col("toks"), 8)).as("kernel"),
        expr("""size(array_distinct(transform(sequence(0, size(toks) - 8),
                  i -> concat_ws(' ', slice(toks, i + 1, 8)))))""").as("strings"))
      .filter(col("kernel") =!= col("strings"))
    assert(diff.count() == 0)
  }

  test("minhash3gram: identical token streams share all 16 minhashes") {
    val toks = Seq("the", "quick", "brown", "fox", "jumps")
    val df = Seq((1L, toks), (2L, toks), (3L, Seq("entirely", "other", "words", "here")))
      .toDF("id", "toks")
      .select(col("id"), exprs.minhash3gram(col("toks"), 16).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("RewriteTokenize optimizer rule swaps the HOF pattern for the kernel") {
    spark.experimental.extraOptimizations =
      Seq(graft.functions.RewriteTokenize)
    try {
      val df = Tables.documents(spark, sf).limit(100)
        .select(col("doc_id"), expr(graft.text.Text.tokensSql).as("toks"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("tokenize_lower"),
        s"rule did not fire:\n$optimized")
      assert(!optimized.contains("lambdafunction"), "HOF should be gone")
      // results identical to the unrewritten form
      spark.experimental.extraOptimizations = Nil
      val plain = Tables.documents(spark, sf).limit(100)
        .select(col("doc_id"), expr(graft.text.Text.tokensSql).as("toks"))
        .collect().map(_.toString).sorted
      spark.experimental.extraOptimizations =
        Seq(graft.functions.RewriteTokenize)
      val rewritten = df.collect().map(_.toString).sorted
      assert(rewritten.sameElements(plain))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("kernel tokenizer == HOF split/filter form on the full corpus") {
    val docs = Tables.documents(spark, sf)
    val diff = docs.select(
        graft.text.Text.tokens.as("kernel"),
        expr(graft.text.Text.tokensSql).as("hof"))
      .filter(col("kernel") =!= col("hof"))
    assert(diff.count() == 0)
  }

  test("kernels skip null array elements (== filtering them out first)") {
    // SQL-registered forms don't constrain containsNull — a null element
    // must not NPE, and must hash identically to the null-free array.
    val withNulls = Seq((1L, Seq[String]("a", null, "b", "c", null, "d")))
      .toDF("id", "toks")
    val clean = Seq((1L, Seq("a", "b", "c", "d"))).toDF("id", "toks")
    def all(df: org.apache.spark.sql.DataFrame) = df.select(
      exprs.minhashSignature(col("toks"), 8).as("mh"),
      exprs.simhash64(col("toks")).as("sh"),
      exprs.minhash3gram(col("toks"), 8).as("mh3"),
      exprs.hashSetSorted(col("toks")).as("hs"),
      exprs.gram3SetSorted(col("toks")).as("g3"),
      exprs.gramNSetSorted(col("toks"), 2).as("gn")).head
    assert(all(withNulls) == all(clean))
  }

  test("float_vec_dot rejects mismatched vector lengths") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(exprs.vecDot(col("a"), col("b"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => c.getMessage != null &&
        c.getMessage.contains("mismatched vector lengths")))
  }

  test("kernel tokenizer matches lower()+split on non-ASCII text") {
    // UTF8String.toLowerCase (what lower() uses) — not the JVM default
    // locale — so 'İ' and 'ß' behave identically in both forms.
    val df = Seq((1L, "İstanbul STRASSE ß Ärger ÇAĞRI naïve"),
                 (2L, "ŻÓŁĆ Grüße ΕΛΛΑΔΑ"))
      .toDF("doc_id", "text")
    val diff = df.select(
        graft.text.Text.tokens.as("kernel"),
        expr(graft.text.Text.tokensSql).as("hof"))
      .filter(col("kernel") =!= col("hof"))
    assert(diff.count() == 0)
  }

  test("rounding trap (SURVEY §7.5#1): Spark rounds the decimal repr, HALF_UP") {
    // 2.675 is stored as 2.67499999…; Spark's round() works on the shortest
    // decimal representation (BigDecimal.valueOf) with HALF_UP → 2.68,
    // while engines rounding the raw binary (and Python's banker's round)
    // give 2.67. This is why oracle-compared outputs never round values
    // that sit structurally on a rounding boundary (see graft.Num).
    val r = spark.range(1).select(round(lit(2.675), 2)).head.getDouble(0)
    assert(r == 2.68)
  }

  test("custom expressions callable from SQL after registration") {
    graft.functions.Registry.register(spark)
    Tables.documents(spark, sf).limit(10).createOrReplaceTempView("docs_v")
    val rows = spark.sql(
      """SELECT doc_id, simhash64(split(lower(text), '[^a-z]+')) AS sh,
                float_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
                              array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
                zorder2(doc_id, doc_id + 1) AS z
         FROM docs_v""").collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getDouble(2) == 11.0))
    rows.foreach(r => assert(r.getLong(3) ==
      graft.functions.SpatialKernels.zOrder2(r.getLong(0), r.getLong(0) + 1)))
  }

  test("zorder2 stays inside whole-stage codegen") {
    val df = Tables.lineitem(spark, sf).limit(100)
      .select(exprs.zorder2(col("l_partkey"), col("l_suppkey")).as("z"))
      .groupBy("z").count()
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val line = p.linesIterator.find(_.contains("zorder2"))
    assert(line.isDefined && line.get.contains("*("),
      s"zorder2 fell out of codegen:\n${p.take(800)}")
  }

  test("custom expressions survive codegen (no interpreter fallback crash)") {
    // Force both codegen and interpreted paths: wholeStage on (default) and off.
    val df = Tables.documents(spark, sf).limit(50)
      .select(exprs.simhash64(graft.text.Text.tokens).as("sh"))
    val on = df.collect().map(_.getLong(0)).sorted
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = df.collect().map(_.getLong(0)).sorted
      assert(on.sameElements(off))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
