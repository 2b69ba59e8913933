package graft

import graft.queries.Extra

class ExtraSpec extends SparkSpec {

  test("all Extra queries return rows at sf0.001") {
    Extra.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name empty")
    }
  }

  test("approx_count_distinct within 5% of exact") {
    Extra.approxVsExactDistinct(spark, sf).collect().foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("as-of join: every matched click precedes its purchase") {
    val ev = Tables.events(spark, sf)
      .select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    Extra.q43AsofJoin(spark, sf).collect().foreach { r =>
      if (!r.isNullAt(2)) {
        val p = ev(r.getLong(0)); val c = ev(r.getLong(2))
        assert(!c.after(p), s"click $c after purchase $p")
      }
    }
  }

  test("sessionize: session count between 1 and event count per user") {
    Extra.q42Sessionize(spark, sf).collect().foreach { r =>
      val sessions = r.getLong(1); val events = r.getLong(2)
      assert(sessions >= 1 && sessions <= events)
    }
  }

  test("partition pruning query reads only the filtered year") {
    val df = Extra.q44PartitionPruning(spark, sf)
    val months = df.collect().map(_.getInt(0))
    assert(months.nonEmpty && months.forall(m => m >= 1 && m <= 12))
  }
}
