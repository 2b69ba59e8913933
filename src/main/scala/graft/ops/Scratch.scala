package graft.ops

import org.apache.spark.sql.SparkSession

/** Collision-free scratch roots for per-query standing indexes and demo
  * sinks (PQ codes, gram postings, FASTA/ORC/partition demos).
  *
  * Round 8 shipped these under FIXED tmpdir names (`graft_pq_codes`,
  * `graft_gram_index`, …), which made two concurrent drivers — or one
  * bench re-pointed at a different sf mid-flight — silently cross-read
  * each other's index: the reader sees a complete, well-formed parquet
  * table for the WRONG corpus, so the failure is wrong answers, not an
  * error. The root here is a pure function of (dataset dir, Spark
  * application id): same session + same data reuses its own index, any
  * other (session, data) pair lands on a disjoint path.
  *
  * Every root handed out is registered for recursive deletion in a JVM
  * shutdown hook, so Bench/Verify runs clean up after themselves instead
  * of accreting one abandoned index per (app, sf) pair in /tmp. The hook
  * is best-effort by design (a SIGKILL skips it) — the app-id suffix
  * already guarantees a later run never READS an orphan.
  */
object Scratch {

  private val created = scala.collection.mutable.LinkedHashSet.empty[String]
  private var hooked = false

  /** Scratch root for a standing index / demo sink of `kind` over the
    * dataset at `d`, unique per (dataset, Spark application). */
  def root(spark: SparkSession, d: String, kind: String): String =
    synchronized {
      val path = sys.props("java.io.tmpdir") +
        s"/graft_${kind}_${dsKey(d)}_${spark.sparkContext.applicationId}"
      register(path)
      path
    }

  /** Collision-free BUCKETED-TABLE name of `kind` over dataset `d` — the
    * `saveAsTable` twin of [[root]]: a fixed table name (plus
    * Scale.writeBucketed's fixed path convention) would reintroduce the
    * concurrent cross-read/overwrite class [[root]] exists to eliminate.
    * Table identifiers allow only [a-zA-Z0-9_], so the app id is
    * sanitized; the backing warehouse path (Scale's `graft_buckets/<table>`
    * convention) is registered for the same shutdown cleanup as parquet
    * roots. */
  def bucketedTable(spark: SparkSession, d: String, kind: String): String =
    synchronized {
      val app = spark.sparkContext.applicationId
        .map(c => if (c.isLetterOrDigit) c else '_')
      val name = s"graft_${kind}_${dsKey(d)}_$app"
      register(sys.props("java.io.tmpdir") + s"/graft_buckets/$name")
      name
    }

  /** Register an additional scratch path for the shutdown-hook cleanup —
    * for sidecars that ride next to a [[root]]/[[bucketedTable]] path
    * (e.g. the shingle index's `_sets` table). */
  def track(path: String): Unit = synchronized { register(path) }

  private def dsKey(d: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString

  private def register(path: String): Unit = {
    if (created.add(path) && !hooked) {
      hooked = true
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        Scratch.synchronized(created.foreach(p => deleteRec(new java.io.File(p))))))
    }
    ()
  }

  /** Recursive delete, shared by the shutdown hook, index compaction,
    * and tests — one definition instead of per-site copies. */
  private[graft] def deleteRec(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete()
    ()
  }
}
