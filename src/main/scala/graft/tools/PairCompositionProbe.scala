package graft.tools

import graft.{Sessions, Tables}
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Composition of the similarity-join PAIR-aggregation shuffle — the
  * family's measured dominant cost (r10 verdict): for each candidate
  * pair surviving the join's lossless prunes, the exchange carries one
  * partially-aggregated row per g-BUCKET the pair co-occurs in. This
  * probe decomposes that volume by pair class: a near-dup pair (hundreds
  * of shared grams) collapses to ≤ nbuckets rows, while a chance pair
  * (1–2 shared grams) carries 1–2 rows — so whether bucket-count or
  * chance-pair cardinality owns the shuffle decides which lever can
  * shrink it (fewer buckets vs pair pruning). Prints, per τ: candidate
  * pairs, total co-occurrence rows, post-partial-agg rows (Σ buckets
  * touched), and the split of that volume between pairs sharing 1, 2–9,
  * and ≥10 grams, plus how many candidates the final J ≥ τ filter keeps.
  *
  * Usage: runMain graft.tools.PairCompositionProbe <sfDir> [buckets]
  */
object PairCompositionProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("localdata/sf1")
    val buckets = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = Sessions.local("graft-pair-comp")
    val root = graft.ops.Scratch.root(spark, d, "pair_comp_sets")
    Dedup.shingleIndexIngest(Tables.documents(spark, d), root)
    val posting = Dedup.shinglePostings(Dedup.shingleIndex(spark, root))
      .withColumn("bkt", pmod(hash(col("g")), lit(buckets)))
      .persist()
    posting.count()
    for ((tn, td) <- Seq((1L, 20L), (1L, 2L))) {
      val perPair = posting.as("a").join(posting.as("b"),
          col("a.g") === col("b.g") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * lit(td) >= col("b.n") * lit(tn) &&
          col("b.n") * lit(td) >= col("a.n") * lit(tn))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.n").as("n_a"), col("b.n").as("n_b"))
        .agg(count(lit(1)).as("inter"),
          countDistinct(col("a.bkt")).as("bkts"))
      val cls = when(col("inter") === 1, "1")
        .when(col("inter") <= 9, "2-9").otherwise("10+")
      val rep = perPair
        .withColumn("cls", cls)
        .withColumn("passes", col("inter") * lit(td) >=
          (col("n_a") + col("n_b") - col("inter")) * lit(tn))
        .groupBy("cls")
        .agg(count(lit(1)).as("pairs"), sum("inter").as("coocc_rows"),
          sum("bkts").as("shuffle_rows"),
          sum(when(col("passes"), 1L).otherwise(0L)).as("final_pairs"))
        .orderBy("cls")
        .collect()
      println(s"PAIRCOMP tau=$tn/$td buckets=$buckets " + rep.map(r =>
        s"[cls=${r.getString(0)} pairs=${r.getLong(1)} coocc=${r.getLong(2)}" +
          s" shufrows=${r.getLong(3)} final=${r.getLong(4)}]").mkString(" "))
    }
    spark.stop()
  }
}
