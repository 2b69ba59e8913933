package graft

import graft.text.BpeTrain

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("BPE training reproduces the classic hand-computed merge sequence") {
    // the canonical BPE teaching corpus: hug x10, pug x5, pun x12, bun x4,
    // hugs x5. Pair counts by hand:
    //   round 1: ug = 10+5+5 = 20 wins (hu 15, pu 17, un 16, bu 4, gs 5)
    //   round 2: un = 12+4 = 16 wins (h-ug 15, pu now 12)
    //   round 3: h-ug = 15 wins (p-un 12)
    val docs = Seq(
      ("hug " * 10) + ("pug " * 5) + ("pun " * 12) + ("bun " * 4) + ("hugs " * 5)
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (merges, ws) = BpeTrain.train(docs, nMerges = 3)
    ws.unpersist()
    val got = merges.map(m => (m.rank, m.left, m.right, m.weighted_count))
    assert(got == Seq((1, "u", "g", 20L), (2, "u", "n", 16L), (3, "h", "ug", 15L)),
      s"unexpected merge sequence: $got")
  }

  test("BPE training is deterministic and stops when no pairs remain") {
    val docs = Seq((1L, "ab ab ab cd")).toDF("doc_id", "text")
    val (m1, w1) = BpeTrain.train(docs, nMerges = 10)
    w1.unpersist()
    val (m2, w2) = BpeTrain.train(docs.repartition(5), nMerges = 10)
    w2.unpersist()
    assert(m1 == m2, "merge table must be partition-invariant")
    // "ab" and "cd" are 2-char words: after merging each, nothing remains
    assert(m1.length == 2)
    assert(m1.map(_.merged).toSet == Set("ab", "cd"))
  }

  test("corpus encode: distributed apply == driver encode, compresses vs chars") {
    val docs = Seq(
      ("hug " * 10) + ("pug " * 5) + ("pun " * 12) + ("bun " * 4) + ("hugs " * 5)
    ).zipWithIndex.map { case (t, i) => (i.toLong, t, "s0") }
      .toDF("doc_id", "text", "source")
    val (merges, ws) = BpeTrain.train(docs.select("doc_id", "text"), nMerges = 3)
    ws.unpersist()
    val enc = BpeTrain.encodeCorpus(docs, merges).collect()
    // every word encodes to the same length the driver-side encoder gives
    val words = Map("hug" -> 1, "pug" -> 2, "pun" -> 2, "bun" -> 2, "hugs" -> 2)
    words.foreach { case (w, n) =>
      assert(BpeTrain.encode(w, merges).length == n, s"driver encode of $w")
    }
    // 10*1 + 5*2 + 12*2 + 4*2 + 5*2 = 62 subwords over 36 words
    assert(enc.length == 36)
    assert(enc.map(_.getInt(2)).sum == 62)
    // strictly better than the char-level baseline (119 chars)
    assert(enc.map(_.getInt(2)).sum < docs.head().getString(1).count(_.isLetter))
  }

  test("batched trainer reproduces the sequential merge table exactly") {
    // the real corpus shape: documents table at the smallest SF — natural
    // tie structure, sharers, and window truncation all exercised
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val (seq_, w1) = BpeTrain.train(docs, nMerges = 20)
    w1.unpersist()
    for (lookahead <- Seq(2, 8, 256)) { // tiny windows force the tail bound
      val (bat, w2) = BpeTrain.trainBatched(docs, nMerges = 20, lookahead)
      assert(bat == seq_, s"lookahead=$lookahead diverged from sequential")
      // final vocab state must match too (same merges applied)
      def symTotal(ws: org.apache.spark.sql.Dataset[BpeTrain.WordSyms]) =
        ws.toDF().agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.size(
            org.apache.spark.sql.functions.col("syms")))).head().getLong(0)
      assert(symTotal(w1) == symTotal(w2), "post-merge symbol totals must match")
      w2.unpersist()
    }
  }

  test("selectBatch: safety bounds on hand-built windows") {
    // disjoint prefix, sharer stops the batch AND bounds trailing ties:
    // (a,b)=9 safe; (c,d)=7 ties with the sharer (b,x)=7 → trimmed
    assert(BpeTrain.selectBatch(Seq(("a", "b", 9L), ("c", "d", 7L),
      ("b", "x", 7L)), complete = true) == Seq(("a", "b", 9L)))
    // sharer below the accepted counts: both stay
    assert(BpeTrain.selectBatch(Seq(("a", "b", 9L), ("c", "d", 7L),
      ("b", "x", 5L)), complete = true) ==
      Seq(("a", "b", 9L), ("c", "d", 7L)))
    // truncated window: the tail bound trims members at the window minimum
    assert(BpeTrain.selectBatch(Seq(("a", "b", 9L), ("c", "d", 7L)),
      complete = false) == Seq(("a", "b", 9L)))
    // complete sharer-free window: everything is safe, ties included
    assert(BpeTrain.selectBatch(Seq(("a", "b", 7L), ("c", "d", 7L)),
      complete = true) == Seq(("a", "b", 7L), ("c", "d", 7L)))
    // argmax is always exact: batch never empties even when q2 shares-ties
    assert(BpeTrain.selectBatch(Seq(("a", "b", 7L), ("b", "c", 7L)),
      complete = true) == Seq(("a", "b", 7L)))
  }

  test("encode round trip: learned merges tokenize seen and unseen words") {
    val docs = Seq(
      ("hug " * 10) + ("pug " * 5) + ("pun " * 12) + ("bun " * 4) + ("hugs " * 5)
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (merges, ws) = BpeTrain.train(docs, nMerges = 3)
    ws.unpersist()
    // seen word fully merged by rank-3 table
    assert(BpeTrain.encode("hug", merges) == Seq("hug"))
    // unseen word reuses learned subwords: b + ug
    assert(BpeTrain.encode("bug", merges) == Seq("b", "ug"))
    // unseen characters stay atomic
    assert(BpeTrain.encode("zq", merges) == Seq("z", "q"))
  }
}
