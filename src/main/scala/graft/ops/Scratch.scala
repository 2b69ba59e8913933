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
      val ds = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      val path = sys.props("java.io.tmpdir") +
        s"/graft_${kind}_${ds}_${spark.sparkContext.applicationId}"
      if (created.add(path) && !hooked) {
        hooked = true
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          Scratch.synchronized(created.foreach(p => deleteRec(new java.io.File(p))))))
      }
      path
    }

  private def deleteRec(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete()
    ()
  }
}
