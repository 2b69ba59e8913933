package graft

import graft.graph.Graph
import graft.sources.IO

class GraphSpec extends SparkSpec {
  private def res(name: String) = getClass.getResource(s"/fixtures/$name").getPath
  private lazy val social = IO.csvInfer(spark, res("social_network.csv"))
  private lazy val flights = IO.csvInfer(spark, res("flights.csv"))

  test("vertex set = union of endpoints, distinct") {
    val vs = Graph.vertices(social).collect().map(_.getString(0)).sorted
    assert(vs.sameElements(Array("alice", "bob", "carol", "dave", "erin")))
  }

  test("degrees: exact in/out/total with fillna(0) semantics") {
    val deg = Graph.degrees(social).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // hand-derived from the fixture edge list
    assert(deg("alice") == ((2L, 3L, 5L)))
    assert(deg("bob")   == ((3L, 1L, 4L)))
    assert(deg("carol") == ((2L, 3L, 5L)))
    assert(deg("dave")  == ((2L, 2L, 4L)))
    assert(deg("erin")  == ((1L, 1L, 2L)))
  }

  test("degreesFast single-pass == degrees outer-join formulation") {
    val a = Graph.degrees(social).collect().map(_.toString).sorted
    val b = Graph.degreesFast(social).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    val f = Graph.degreesFast(flights).collect().map(_.toString).sorted
    val g = Graph.degrees(flights).collect().map(_.toString).sorted
    assert(f.sameElements(g))
  }

  test("bidirectional pairs: reciprocal edges deduped a<b") {
    val pairs = Graph.bidirectional(social).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("alice", "bob"), ("carol", "dave"), ("alice", "carol")))
  }

  test("2-hop excludes trivial round trips") {
    val hops = Graph.twoHop(flights).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(hops.contains(("AAA", "BBB", "DDD"))) // AAA→BBB→DDD
    assert(hops.contains(("BBB", "CCC", "AAA"))) // BBB→CCC→AAA
    assert(!hops.exists(h => h._1 == h._3), "round trips must be excluded")
  }

  test("triangles: oriented a<b<c, counted once") {
    val tris = Graph.triangles(social).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // undirected edges: a-b, b-c, c-d, a-c, d-e, e-a, b-d ⇒ two triangles
    assert(tris == Set(("alice", "bob", "carol"), ("bob", "carol", "dave")))
  }

  test("oriented triangles: set-equal to the triple self-join, hub included") {
    def triSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // fixture graph: both formulations enumerate the same triangles
    assert(triSet(Graph.trianglesOriented(social)) == triSet(Graph.triangles(social)))
    // seeded random graph WITH a deliberate supernode ("hub" touches every
    // vertex) — the case trianglesCapped must drop and this plan must keep
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 40
    val base = (1 to 260).map { _ =>
      (s"v${rnd.nextInt(n)}", s"v${rnd.nextInt(n)}")
    }.filter(e => e._1 != e._2)
    val hub = (0 until n).map(i => ("hub", s"v$i"))
    val edges = (base ++ hub).toDF("src", "dst")
    val a = triSet(Graph.trianglesOriented(edges))
    val b = triSet(Graph.triangles(edges))
    assert(a == b, s"oriented ${a.size} vs reference ${b.size}")
    assert(a.exists(t => t._1 == "hub" || t._2 == "hub" || t._3 == "hub"),
      "fixture must actually exercise the supernode")
  }

  test("DOULION: deterministic md5 sparsifier + concentrated estimate") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, least, greatest}
    // triangle-rich seeded graph with a hub (the q123 fixture, denser):
    // enough triangles that p=1/2 concentration is testable, small enough
    // to census exactly in-test
    val rnd = new scala.util.Random(11)
    val n = 60
    val base = (1 to 1400).map { _ =>
      (s"v%02d".format(rnd.nextInt(n)), s"v%02d".format(rnd.nextInt(n)))
    }.filter(e => e._1 != e._2)
    val hub = (0 until n).map(i => ("hub", s"v%02d".format(i)))
    val edges = (base ++ hub).toDF("src", "dst")
    // sparsified set: subset of the canonical undirected edges, u<v form,
    // deterministic across invocations, roughly half kept
    val canon = edges
      .select(least(col("src"), col("dst")).as("src"),
              greatest(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    def edgeSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val kept = edgeSet(Graph.sparsifyUndirected(edges, 1, 2))
    val all = edgeSet(canon)
    assert(kept.subsetOf(all))
    assert(kept == edgeSet(Graph.sparsifyUndirected(edges, 1, 2)),
      "md5 coin must be deterministic")
    assert(math.abs(kept.size.toDouble / all.size - 0.5) < 0.1,
      s"kept ${kept.size}/${all.size}, expected ~half")
    // keep=1/1 is the identity sample
    assert(edgeSet(Graph.sparsifyUndirected(edges, 1, 1)) == all)
    // estimate: exact integer scaling of the sampled census, and within
    // the q124 bound (20%) of the exact count on this triangle-rich graph
    val exact = Graph.trianglesOriented(edges).count()
    val r = Graph.trianglesSampled(edges, 1, 2).collect().head
    val (nSampled, est) = (r.getLong(0), r.getLong(1))
    assert(est == nSampled * 8, "p=1/2 scale-up must be exact integer 8x")
    assert(math.abs(est - exact) * 5 <= exact,
      s"estimate $est vs exact $exact out of the 20% bound")
    // the sampled census is the exact census of the sparsified graph
    assert(nSampled == Graph.trianglesOriented(
      Graph.sparsifyUndirected(edges, 1, 2)).count())
  }

  test("K-pass bucketed census == trianglesOriented (count and corner sum)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(13)
    // numeric ids incl. a hub vertex (id 999): the corner-sum contract
    // needs numeric vertices (q123's shape — partkeys)
    val numEdges = ((1 to 900)
      .map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2) ++ (0L until 40L).map(i => (999L, i)))
      .toDF("src", "dst")
    val exact = Graph.trianglesOriented(numEdges)
      .agg(count(lit(1)), sum(col("a") + col("b") + col("c")).cast("long"))
      .collect().head
    for (passes <- Seq(1, 4)) {
      val (n, cs) = Graph.trianglesCensusBucketed(numEdges, passes)
      assert(n == exact.getLong(0) && cs == exact.getLong(1),
        s"passes=$passes: ($n, $cs) != (${exact.getLong(0)}, ${exact.getLong(1)})")
    }
  }

  test("budget-adaptive DOULION: fraction math clamps both ends; " +
       "budget ≥ |E| is the exact regime; sampled regime == the " +
       "fixed-fraction census at the derived fraction") {
    import spark.implicits._
    // pure fraction math: round-half-up ratio, clamped to [floor, den]
    assert(Graph.adaptiveKeepFraction(100, 50) == 512)
    assert(Graph.adaptiveKeepFraction(100, 200) == 1024,
      "target ≥ |E| must keep everything")
    assert(Graph.adaptiveKeepFraction(1000000, 1) == 64,
      "concentration floor must clamp tiny targets")
    assert(Graph.adaptiveKeepFraction(3, 1) == (1024 + 1) / 3,
      "round-half-up: (1024·1 + 3/2)/3")
    val rnd = new scala.util.Random(19)
    val edges = ((1 to 900)
      .map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2) ++ (0L until 40L).map(i => (999L, i)))
      .toDF("src", "dst")
    // exact regime: a budget the whole graph fits in → keep_num = den,
    // n_sampled = exact census, est = exact census
    val exact = Graph.trianglesOriented(edges).count()
    val big = Graph.trianglesSampledBudget(edges, targetEdges = 100000)
      .collect().head
    assert(big.getLong(1) == 1024L, "small graph must land in keep-all")
    assert(big.getLong(2) == exact && big.getLong(3) == exact,
      "keep-all regime must BE the exact census")
    // sampled regime: the budget output must equal the fixed-fraction
    // census run at the fraction the probe derives — adaptivity adds a
    // probe, never a different estimator
    val nEdges = big.getLong(0)
    val target = nEdges / 3
    val derived = Graph.adaptiveKeepFraction(nEdges, target)
    assert(derived > 64 && derived < 1024, "fixture must exercise mid-range")
    val budget = Graph.trianglesSampledBudget(edges, target).collect().head
    assert(budget.getLong(1) == derived)
    val fixed = Graph.trianglesSampled(edges, derived, 1024).collect().head
    assert((budget.getLong(2), budget.getLong(3)) ==
      (fixed.getLong(0), fixed.getLong(1)))
  }

  test("trianglesSampled scales by round-half-up, not floor, for keepNum > 1") {
    import spark.implicits._
    // keep 2/3 scales by 27/8 — floor division biased every non-multiple
    // DOWN (the r8 ADVICE find); est must equal round-half-up(n·27/8)
    val rnd = new scala.util.Random(7)
    val edges = (1 to 900)
      .map(_ => (s"v%02d".format(rnd.nextInt(40)), s"v%02d".format(rnd.nextInt(40))))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val r = Graph.trianglesSampled(edges, 2, 3).collect().head
    val (n, est) = (r.getLong(0), r.getLong(1))
    assert(n > 0, "sampled census must be non-trivial on this graph")
    assert(est == (n * 27 + 4) / 8,
      s"expected round-half-up (n=$n → ${(n * 27 + 4) / 8}), got $est")
  }

  test("supernode cap: capped triangles are a subset avoiding hot vertices") {
    def triSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val full = triSet(Graph.triangles(social))
    for (cap <- Seq(1L, 3L, 4L, 5L, 100L)) {
      val capped = triSet(Graph.trianglesCapped(social, cap))
      assert(capped.subsetOf(full), s"cap=$cap produced non-subset triangles")
      // no corner of a surviving triangle may exceed the cap
      val deg = Graph.degreesFast(social).collect()
        .map(r => r.getString(0) -> r.getLong(3)).toMap
      capped.foreach { case (a, b, c) =>
        assert(Seq(a, b, c).forall(deg(_) <= cap),
          s"cap=$cap kept a supernode corner in ($a,$b,$c)")
      }
    }
    // a generous cap keeps everything
    assert(triSet(Graph.trianglesCapped(social, 100L)) == full)
    // capDegrees drops exactly the edges touching hot vertices
    val hotFree = Graph.capDegrees(social, 4L).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(hotFree.nonEmpty)
    assert(!hotFree.exists(e => e._1 == "alice" || e._2 == "alice" ||
                                e._1 == "carol" || e._2 == "carol"),
      "alice/carol have degree 5 > 4 and must be excluded")
  }

  test("connected components: chains, rings, isolated vertices, min labels") {
    import spark.implicits._
    // components: chain 0-1-2-3-4, ring 10-11-12-10, pair 20-21;
    // isolated vertices 30, 31
    val edges = Seq((1L, 0L), (1L, 2L), (2L, 3L), (4L, 3L),
      (10L, 11L), (11L, 12L), (12L, 10L), (21L, 20L)).toDF("src", "dst")
    val vertices = (Seq(0L, 1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 21L, 30L, 31L))
      .toDF("id")
    val labels = Graph.connectedComponents(edges, vertices)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(
      0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 31L))
    // a longer chain exercises multi-round propagation (diameter 29)
    val chain = (0L until 29L).map(i => (i, i + 1)).toDF("src", "dst")
    val chainV = (0L to 29L).toDF("id")
    val chainLabels = Graph.connectedComponents(chain, chainV)
      .collect().map(_.getLong(1)).distinct
    assert(chainLabels.sameElements(Array(0L)),
      "a 30-vertex chain must collapse to one component")
  }

  test("large-star/small-star CC == min-label CC; converges in O(log n) rounds") {
    import spark.implicits._
    def partition(labels: Map[Long, Long]): Set[Set[Long]] =
      labels.groupBy(_._2).values.map(_.keySet.toSet).toSet
    // randomized graphs: nodes 0..39, seeded edge choices
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val edges = (1 to 25).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }.distinct.toDF("src", "dst")
      val vertices = (0L until 40L).toDF("id")
      val simple = Graph.connectedComponents(edges, vertices)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val (fastDf, _) = Graph.connectedComponentsFast(edges, vertices)
      val fast = fastDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(partition(fast) == partition(simple), s"trial $trial diverged")
      // star-forest labels are component minima, same as min-label's
      assert(fast == simple, s"trial $trial: labels differ")
    }
    // a 64-chain has diameter 63; star rounds must stay logarithmic
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("src", "dst")
    val chainV = (0L to 63L).toDF("id")
    val (labels, rounds) = Graph.connectedComponentsFast(chain, chainV)
    assert(labels.select("label").distinct().count() == 1)
    assert(rounds <= 12, s"expected O(log n) rounds on a 64-chain, used $rounds")
  }

  test("route fallback: direct when present, 2-hop otherwise") {
    val direct = Graph.routesWithFallback(flights, "AAA", "BBB").collect()
    assert(direct.length == 2 && direct.forall(_.isNullAt(1)))
    val connecting = Graph.routesWithFallback(flights, "BBB", "EEE").collect()
    assert(connecting.nonEmpty && connecting.forall(!_.isNullAt(1)))
  }

  test("pageRank: symmetric cycle is uniform; sinks accumulate rank") {
    import spark.implicits._
    // 2-cycle with equal weights: ranks must be exactly equal, ≈ 0.5 each
    val cyc = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "wt")
    val cr = Graph.pageRankFixedPoint(cyc, iters = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cr("a") == cr("b"), s"symmetric nodes must tie: $cr")
    assert(math.abs(cr("a") - 500000000000L) < 1000000L, s"≈0.5 each: $cr")
    // star a→c, b→c: c gets teleport + both contributions, strictly above a,b
    val star = Seq(("a", "c", 1L), ("b", "c", 1L)).toDF("src", "dst", "wt")
    val sr = Graph.pageRankFixedPoint(star, iters = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sr("c") > sr("a") && sr("a") == sr("b"), s"star ranks: $sr")
  }

  test("converged pageRank: stops before the cap, same ranking as fixed run") {
    import spark.implicits._
    val edges = Seq(("a", "b", 3L), ("b", "c", 1L), ("c", "a", 2L),
      ("a", "c", 1L), ("c", "b", 5L)).toDF("src", "dst", "wt")
    val (ranks, rounds) = Graph.pageRankConverged(edges)
    assert(rounds > 1 && rounds < 50, s"expected early convergence, ran $rounds")
    val conv = ranks.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fixed = Graph.pageRankFixedPoint(edges, iters = 30).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // stop rule: within the contraction bound tol/(1-0.85) of the deep run
    conv.foreach { case (id, r) =>
      assert(math.abs(r - fixed(id)) <= 1000000000L * 7,
        s"$id: converged=$r fixed30=${fixed(id)}")
    }
    // and the induced ranking order agrees
    assert(conv.toSeq.sortBy(-_._2).map(_._1) ==
           fixed.toSeq.sortBy(-_._2).map(_._1))
  }

  test("pageRank fixed-point is partition-invariant (bit-identical)") {
    import spark.implicits._
    val edges = Seq(("a", "b", 3L), ("b", "c", 1L), ("c", "a", 2L),
      ("a", "c", 1L), ("c", "b", 5L)).toDF("src", "dst", "wt")
    val one = Graph.pageRankFixedPoint(edges.repartition(1), 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val many = Graph.pageRankFixedPoint(edges.repartition(7), 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(one.sameElements(many), "integer ranks must not depend on partitioning")
  }
}
