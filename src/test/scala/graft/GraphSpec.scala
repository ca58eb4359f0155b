package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Property gates for the graph module (q149/q150/q151) on synthetic
  * graphs where the expected answer is hand-computable — the oracle
  * hash gate pins engine parity; these pin the SEMANTICS.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges(e: (Long, Long, Long)*) =
    e.toDF("src", "dst", "w")

  // --- q149 attention layer ---------------------------------------

  test("attention layer: a self-loop-only node reproduces its own features") {
    val feats = Seq((1L, 10L, -20L), (2L, 100L, 200L)).toDF("part_id", "e1", "e2")
    // node 1 isolated (self-loop only); node 2 also self-loop only
    val ed = edges((1L, 1L, 1L), (2L, 2L, 1L))
    val out = Graph.attLayer(ed, feats, Seq("e1", "e2"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (10L, -20L))
    assert(out(2L) == (100L, 200L))
  }

  test("attention layer: output is a weighted mean (inside the neighbor hull)") {
    val feats = Seq((1L, 0L), (2L, 100L), (3L, 50L)).toDF("part_id", "e1")
    val ed = edges((1L, 1L, 1L), (1L, 2L, 3L), (1L, 3L, 2L))
    val z = Graph.attLayer(ed, feats, Seq("e1"))
      .filter($"part_id" === 1L).select("e1").as[Long].head()
    assert(z >= 0L && z <= 100L, s"weighted mean must stay in [0, 100], got $z")
  }

  test("attention layer: sign-agreeing neighbors attract more attention") {
    // node 1 (+,+) has two equal-weight neighbors: node 2 agrees on
    // both signs, node 3 disagrees on both — the output must land
    // strictly closer to node 2's features than the unweighted mean
    val feats = Seq(
      (1L, 10L, 10L), (2L, 1000L, 1000L), (3L, -1000L, -1000L))
      .toDF("part_id", "e1", "e2")
    val ed = edges((1L, 2L, 1L), (1L, 3L, 1L))
    val z = Graph.attLayer(ed, feats, Seq("e1", "e2"))
      .filter($"part_id" === 1L).select("e1").as[Long].head()
    // score(1→2) = 1·(1+2) = 3, score(1→3) = 1·(1+0) = 1 →
    // z = round((3·1000 − 1·1000)/4) = 500; the unweighted mean is 0
    assert(z == 500L, s"attention must tilt toward the agreeing neighbor, got $z")
  }

  test("gat autoencoder runs end-to-end, covers every part, deterministically") {
    val d = "/root/testdata/sf0.001"
    val out = Graph.gatEmbedding(spark, d)
    val nParts = Tables.lineitem(spark, d).select("l_partkey").distinct().count()
    assert(out.count() == nParts, "one latent row per traded part")
    val a = out.collect().map(_.toSeq).toVector
    val b = Graph.gatEmbedding(spark, d).collect().map(_.toSeq).toVector
    assert(a == b, "gat embedding must be run-to-run deterministic")
    spark.catalog.clearCache()
  }

  // --- q150 pagerank ----------------------------------------------

  test("pagerank: hub of a star outranks the leaves; isolated node floors at 150000") {
    val nodes = (1L to 6L).toDF("part_id")
    // star: hub 1 — leaves 2..5 (symmetric edges, w = 1); node 6 isolated
    val ed = edges(
      (2L to 5L).flatMap(l => Seq((1L, l, 1L), (l, 1L, 1L))): _*)
    val pr = Graph.pagerankOf(nodes, ed)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((2L to 5L).forall(l => pr(1L) > pr(l)), s"hub must outrank leaves: $pr")
    assert(pr(6L) == 150000L, s"isolated node holds the damping floor: ${pr(6L)}")
    assert((2L to 5L).map(pr).toSet.size == 1, "symmetric leaves must tie exactly")
  }

  test("pagerank: rank mass never exceeds the initial mass (truncation only loses)") {
    val nodes = (1L to 4L).toDF("part_id")
    val ed = edges((1L, 2L, 1L), (2L, 1L, 1L), (2L, 3L, 2L), (3L, 2L, 2L),
      (3L, 4L, 1L), (4L, 3L, 1L))
    val total = Graph.pagerankOf(nodes, ed).agg(sum("pr")).as[Long].head()
    assert(total <= 4L * 1000000L, s"integer PageRank drops mass, never mints it: $total")
    assert(total > 4L * 150000L)
  }

  // --- q151 triangles ---------------------------------------------

  test("triangles: K4 plus a pendant edge counts 4 triangles, cc = 800000") {
    val und = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), // K4
      (4L, 5L)) // pendant
      .toDF("u", "v")
    val r = Graph.trianglesOf(und).collect().head
    assert(r.getAs[Long]("n_nodes") == 5L)
    assert(r.getAs[Long]("n_edges") == 7L)
    assert(r.getAs[Long]("n_triangles") == 4L)
    // wedges: deg(1..3)=3 → 3 each, deg(4)=4 → 6, deg(5)=1 → 0 ⇒ 15;
    // cc = 3·4·1e6 div 15
    assert(r.getAs[Long]("global_cc_micro") == 800000L)
    spark.catalog.clearCache()
  }

  test("K-batched census equals the single-pass census for every K (q151 scale path)") {
    // every wedge lands in exactly one md5 batch of its orientation
    // source, so the batched sum must equal the single-pass count
    // EXACTLY, for any K — on a fixture with hubs, pendants, and a
    // triangle-free appendix so batches are non-trivially populated
    val und = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), // K4
      (4L, 5L), (5L, 6L), (6L, 7L), (4L, 7L), // square on 4-5-6-7
      (8L, 9L), (8L, 10L), (9L, 10L), // disjoint triangle
      (10L, 11L)) // pendant
      .toDF("u", "v")
    val single = Graph.triCensusRaw(und).collect().head
    for (k <- Seq(2, 3, 7)) {
      val batched = Graph.triCensusBatchedRaw(und, k).collect().head
      for (c <- Seq("n_triangles", "n_nodes", "n_edges", "wdg"))
        assert(batched.getAs[Long](c) == single.getAs[Long](c),
          s"K=$k batched $c diverged")
      spark.catalog.clearCache()
    }
    spark.catalog.clearCache()
  }

  test("triangles: triangle-free bipartite graph counts zero") {
    val und = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L))
      .toDF("u", "v")
    val r = Graph.trianglesOf(und).collect().head
    assert(r.getAs[Long]("n_triangles") == 0L)
    assert(r.getAs[Long]("global_cc_micro") == 0L)
    spark.catalog.clearCache()
  }

  // --- q168 sampled triangles --------------------------------------

  test("sampled triangles: survivor census and 1/p scalings replay in BigInt") {
    // K6: 20 triangles, 15 edges — big enough that the p=25% md5 toss
    // keeps a nonempty survivor graph deterministically
    val und = (1L to 6L).flatMap(a => (a + 1 to 6L).map(a -> _)).toDF("u", "v")
    val r = Graph.sampledTrianglesOf(und).collect().head
    // replay the toss in plain Scala against the same md5 primitive
    val kept = (1L to 6L).flatMap(a => (a + 1 to 6L).map(a -> _)).filter { case (u, v) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$u:$v".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 100 < Graph.TriSampleP
    }
    val deg = kept.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map(_._2.size.toLong)
    val wdg = deg.map(d => d * (d - 1) / 2).sum
    val ks = kept.toSet
    val tris = (for {
      (a, b) <- ks; (b2, c) <- ks if b2 == b && ks((a, c))
    } yield (a, b, c)).size.toLong
    assert(r.getAs[Long]("n_edges_sampled") == kept.size.toLong)
    assert(r.getAs[Long]("n_edges_est") == kept.size.toLong * 4)
    assert(r.getAs[Long]("n_triangles_sampled") == tris)
    assert(r.getAs[Long]("n_triangles_est") == tris * 64)
    val ccExp =
      if (wdg == 0) null
      else Long.box(((BigInt(tris) * 64 * 3 * 1000000) / (BigInt(wdg) * 16)).toLong)
    assert(r.getAs[Any]("global_cc_est_micro") == ccExp,
      s"cc must be the single widened integer div (wdg=$wdg tris=$tris)")
    spark.catalog.clearCache()
  }

  test("sampled triangles: p=100 variant would equal the exact census (estimator sanity)") {
    // the estimator's bias comes only from sampling; with every edge
    // kept the scaled-down arithmetic must reproduce the exact kernel
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val exact = Graph.trianglesOf(und).collect().head
    val raw = Graph.triCensusRaw(und).collect().head
    assert(raw.getAs[Long]("n_triangles") == exact.getAs[Long]("n_triangles"))
    assert(
      (BigInt(raw.getAs[Long]("n_triangles")) * 3 * 1000000 /
        BigInt(raw.getAs[Long]("wdg"))).toLong
        == exact.getAs[Long]("global_cc_micro"),
      "trianglesOf is exactly triCensusRaw + the cc fold")
    spark.catalog.clearCache()
  }

  // --- q167 incremental triangles ----------------------------------

  test("triangle delta: exercises all three inclusion-exclusion terms by hand") {
    // base: path 1—2—3 plus edge (4,5). delta adds (1,3) [closes a
    // T1 triangle via two base edges], (2,4) and (2,5) [two delta
    // edges at center 2 whose closing pair (4,5) is base → a T2
    // triangle], and the delta-only triangle (6,7),(7,8),(6,8) [T3].
    // Duplicate delta edge (1,2) must be ignored (already in base).
    val base = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("u", "v")
    val delta = Seq((1L, 3L), (2L, 4L), (2L, 5L), (6L, 7L), (7L, 8L), (6L, 8L), (1L, 2L))
      .toDF("u", "v")
    val r = Graph.triangleDelta(base, delta).collect().head
    assert(r.getAs[Long]("n_edges_delta_new") == 6L, "the (1,2) duplicate must not count")
    assert(r.getAs[Long]("tri_touched") == 3L, "one T1 + one T2 + one T3 triangle")
    spark.catalog.clearCache()
  }

  test("incremental triangles equal the batch census on the corpus (sf0.001)") {
    val d = sf("sf0.001")
    val out = SparkEntry.queries("q167_incremental_triangles")(spark, d).collect().head
    val batch = Graph.trianglesOf(
      Graph.coEdges(spark, d)
        .filter(col("src") < col("dst"))
        .select(col("src").as("u"), col("dst").as("v"))).collect().head
    assert(out.getAs[Long]("n_triangles") == batch.getAs[Long]("n_triangles"),
      "incremental total must equal the batch recount of the merged graph")
    assert(out.getAs[Long]("n_edges_base") + out.getAs[Long]("n_edges_delta_new")
      == batch.getAs[Long]("n_edges"),
      "base + new delta edges must partition the merged edge set")
    assert(out.getAs[Long]("new_triangles")
      == out.getAs[Long]("n_triangles") - out.getAs[Long]("n_triangles_base"))
    spark.catalog.clearCache()
  }

  // --- q169 incremental k-core --------------------------------------

  test("kcore delta: promotion cascade, anchored support, and final degrees by hand") {
    // base: K4 {1,2,3,4} (the core) + fringe 5,6 hanging off {1,2}
    // and 8 hanging off {5,6} (peeled over TWO base rounds) + leaf 7.
    // delta: (5,6) promotes 5 and 6 TOGETHER (each needs the other —
    // the mutual-support case a naive greedy grow misses), the
    // closure must pull 8 in through non-core edges and then re-peel
    // it out (cdeg(8)=0), (2,7) raises 7 to deg 2 < 3 (not promoted),
    // and the duplicate (1,2) must be ignored.
    val base = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (2L, 5L), (1L, 6L), (2L, 6L),
      (5L, 8L), (6L, 8L), (1L, 7L)).toDF("u", "v")
    val coreB = Graph.kcoreOf(base)
    assert(coreB.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L),
      "base core must be exactly the K4")
    val delta = Seq((5L, 6L), (2L, 7L), (1L, 2L)).toDF("u", "v")
    val out = Graph.kcoreDelta(base, coreB, delta).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(out == Seq(
      (1L, 5L, true), (2L, 5L, true), (3L, 3L, true), (4L, 3L, true),
      (5L, 3L, false), (6L, 3L, false)),
      s"promotion/cascade/degree repair wrong: $out")
    spark.catalog.clearCache()
  }

  test("incremental k-core equals the batch peel of the merged graph (sf0.001)") {
    val d = sf("sf0.001")
    val out = SparkEntry.queries("q169_incremental_kcore")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val batch = Graph.kcore(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == batch,
      "anchored repair must reproduce the batch peel of base ∪ delta exactly")
    spark.catalog.clearCache()
  }

  test("base-bucket peel converges within the fixed rounds (sf0.001) — the anchor's premise") {
    // the anchored-repair identity assumes the pinned base core IS the
    // base fixpoint; certify the 90% bucket like q157 certifies the
    // full graph
    val d = sf("sf0.001")
    val bli = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pid"))
      .filter(graft.functions.TextFns.h60(col("l_orderkey").cast("string")) % 100 < 90)
    val undB = Graph.edgesOf(bli)
      .filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
      .localCheckpoint(true)
    val (fix, rounds) = Graph.kcoreFixpointOf(undB)
    assert(rounds <= Graph.PeelRounds,
      s"base bucket needs $rounds peel rounds; the pinned index uses ${Graph.PeelRounds}")
    val fixed = Graph.kcoreOf(undB).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fix.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == fixed)
    spark.catalog.clearCache()
  }

  test("q169 affected-closure saturates within ClosureRounds on the graded buckets — the repair's premise") {
    // the q169 oracle re-peels the merged graph from scratch (it does
    // NOT replay the closure), so an unsaturated closure would be a
    // silent parity divergence: certify saturation on the exact frames
    // kcoreDelta expands over, at both the unit and the GRADED scale
    Seq("sf0.001", "sf0.01").foreach { sfN =>
      val (nonCoreEdges, seed) = Graph.closureInputsOf(spark, sf(sfN))
      val (_, rounds) = Graph.closureFixpointOf(nonCoreEdges, seed)
      assert(rounds <= Graph.ClosureRounds,
        s"$sfN closure needs $rounds expansion rounds; q169 applies only ${Graph.ClosureRounds}")
      spark.catalog.clearCache()
    }
  }

  test("closure certificate detects an unsaturated fixed-round expansion (chain fixture)") {
    // a 12-hop non-core chain seeded at one end needs 11 expansion
    // rounds — the fixed ClosureRounds=5 provably does NOT saturate it,
    // so the certificate's rounds count is a real detector, and the
    // saturated set is the whole chain while the 5-round set is not
    val chain = (1L to 11L).map(i => (i, i + 1)).toDF("u", "v")
    val seedDf = Seq(1L).toDF("n")
    val (sat, rounds) = Graph.closureFixpointOf(chain, seedDf)
    assert(rounds > Graph.ClosureRounds,
      s"chain must exceed the fixed rounds, took $rounds")
    assert(sat.count() == 12, "saturated closure reaches the whole chain")
    spark.catalog.clearCache()
  }

  // --- q156 personalized pagerank ----------------------------------

  /** Plain-Scala replay of the fixed-point PPR recurrence — the
    * hand-checkable reference the distributed plan must match exactly.
    */
  private def simPpr(nodes: Seq[Long], es: Seq[(Long, Long, Long)],
                     seeds: Set[Long], iters: Int): Map[Long, Long] = {
    val deg = es.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var pr = nodes.map(i => i -> (if (seeds(i)) 1000000L else 0L)).toMap
    for (_ <- 1 to iters) {
      val inflow = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s2, d2, w) <- es; p = pr(s2); if p > 0 && deg.getOrElse(s2, 0L) > 0)
        inflow(d2) += (p * w) / deg(s2)
      pr = pr.map { case (k, _) =>
        k -> ((if (seeds(k)) 150000L else 0L) + 85 * inflow(k) / 100)
      }
    }
    pr
  }

  test("ppr: matches an exact scalar replay; teleport only at seeds") {
    // symmetric path 1—2—…—8 plus a disconnected pair 10—11; seed {1}
    val nodes = (1L to 8L) ++ Seq(10L, 11L)
    val es = ((1L to 7L).flatMap(i => Seq((i, i + 1, 1L), (i + 1, i, 1L))) ++
      Seq((10L, 11L, 1L), (11L, 10L, 1L)))
    val out = Graph.pprOf(nodes.toDF("part_id"), edges(es: _*),
      Seq(1L).toDF("part_id"))
      .collect().map(r => r.getAs[Long]("part_id") ->
        (r.getAs[Int]("rnk"), r.getAs[Long]("seed"), r.getAs[Long]("pr"))).toMap
    val exp = simPpr(nodes, es, Set(1L), Graph.PrIters).filter(_._2 > 0)
    assert(out.view.mapValues(_._3).toMap == exp,
      s"distributed PPR must equal the scalar replay: got $out expected $exp")
    // rank mass can only ENTER at the seed: the disconnected component
    // and anything farther than PrIters hops stay at exactly zero
    assert(!out.contains(10L) && !out.contains(11L),
      "components unreachable from the seeds must carry zero rank")
    assert(!out.contains(7L) && !out.contains(8L),
      s"${Graph.PrIters} iterations reach at most distance ${Graph.PrIters}")
    // the seed teleports every round, but its single path-neighbor
    // receives the seed's ENTIRE outflow (deg(seed)=1) and may
    // out-accumulate it — rank concentrates within one hop of the seed
    assert(out(1L)._1 <= 2 && out(1L)._2 == 1L,
      s"the seed stays within the top-2 of its own neighborhood: ${out(1L)}")
    assert(Set(1L, 2L).contains(out.minBy(_._2._1)._1),
      "the top-ranked node is the seed or its direct neighbor")
    // rnk is dense 1..n in pr-desc order
    assert(out.values.map(_._1).toSeq.sorted == (1 to out.size).toSeq)
    spark.catalog.clearCache()
  }

  test("ppr e2e: deterministic, ≤8 seed rows, dense ranks on the corpus") {
    val d = "/root/testdata/sf0.001"
    val a = Graph.personalizedPagerank(spark, d).collect()
    assert(a.length == 50, "top-50 recommendation surface")
    assert(a.map(_.getAs[Int]("rnk")).toSeq == (1 to 50).toSeq)
    val nSeeds = a.count(_.getAs[Long]("seed") == 1L)
    assert(nSeeds >= 1 && nSeeds <= 8, s"seed rows in top-50: $nSeeds")
    val b = Graph.personalizedPagerank(spark, d).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "run-to-run deterministic")
    spark.catalog.clearCache()
  }

  // --- q159 incremental pagerank -----------------------------------

  /** Plain-Scala replay of the q150 recurrence from an explicit
    * initial rank vector — covers both the cold and the warm start.
    */
  private def simPr(nodes: Seq[Long], es: Seq[(Long, Long, Long)],
                    init: Map[Long, Long], iters: Int): Map[Long, Long] = {
    val deg = es.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var pr = nodes.map(i => i -> init(i)).toMap
    for (_ <- 1 to iters) {
      val inflow = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s2, d2, w) <- es; dg = deg.getOrElse(s2, 0L); if dg > 0)
        inflow(d2) += (pr(s2) * w) / dg
      pr = pr.map { case (k, _) => k -> (150000L + 85 * inflow(k) / 100) }
    }
    pr
  }

  test("incremental pagerank: warm start equals the exact scalar replay; new nodes surface") {
    // base: symmetric path 1—2—3; delivery adds node 4 (3—4) and
    // reinforces 1→2 by +2
    val baseNodes = (1L to 3L)
    val baseEs = Seq((1L, 2L, 1L), (2L, 1L, 1L), (2L, 3L, 1L), (3L, 2L, 1L))
    val mergedEs = Seq((1L, 2L, 3L), (2L, 1L, 1L), (2L, 3L, 1L), (3L, 2L, 1L),
      (3L, 4L, 1L), (4L, 3L, 1L))
    val basePr = Graph.pagerankOf(baseNodes.toDF("part_id"), edges(baseEs: _*))
    val out = Graph.warmStart(
      (1L to 4L).toDF("part_id"), basePr, edges(mergedEs: _*))
      .collect()
      .map(r => r.getAs[Long]("part_id") ->
        (r.getAs[Long]("deg"), r.getAs[Long]("pr_base"), r.getAs[Long]("pr_warm"))).toMap
    val baseSim = simPr(baseNodes, baseEs, baseNodes.map(_ -> 1000000L).toMap, Graph.PrIters)
    val warmSim = simPr(1L to 4L, mergedEs,
      (1L to 4L).map(i => i -> baseSim.getOrElse(i, 1000000L)).toMap, Graph.WarmIters)
    (1L to 4L).foreach { i =>
      assert(out(i)._3 == warmSim(i), s"node $i: warm rank must equal the scalar replay")
    }
    assert(out(4L)._2 == 0L, "a delivery-only node carries pr_base = 0")
    (1L to 3L).foreach(i => assert(out(i)._2 == baseSim(i), s"node $i keeps its base rank"))
    val mdeg = mergedEs.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    (1L to 4L).foreach(i => assert(out(i)._1 == mdeg(i), s"node $i: merged degree"))
    spark.catalog.clearCache()
  }

  test("incremental pagerank: an empty delivery is the base's deterministic continuation") {
    val nodes = (1L to 3L)
    val es = Seq((1L, 2L, 1L), (2L, 1L, 1L), (2L, 3L, 1L), (3L, 2L, 1L))
    val basePr = Graph.pagerankOf(nodes.toDF("part_id"), edges(es: _*))
    val out = Graph.warmStart(nodes.toDF("part_id"), basePr, edges(es: _*))
      .collect().map(r => r.getAs[Long]("part_id") -> r.getAs[Long]("pr_warm")).toMap
    val cont = simPr(nodes, es,
      simPr(nodes, es, nodes.map(_ -> 1000000L).toMap, Graph.PrIters), Graph.WarmIters)
    nodes.foreach(i => assert(out(i) == cont(i),
      s"node $i: empty delta = ${Graph.PrIters}+${Graph.WarmIters} rounds of the base graph"))
    spark.catalog.clearCache()
  }

  // --- q157 k-core -------------------------------------------------

  test("kcore: K4 survives peeling, pendant chain falls out, fixpoint in 2 rounds") {
    val und = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), // K4
      (4L, 5L), (5L, 6L)) // pendant chain
      .toDF("u", "v")
    val fixed = Graph.kcoreOf(und).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixed == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"3-core of K4+chain is exactly the K4 at degree 3: $fixed")
    val (core, rounds) = Graph.kcoreFixpointOf(und)
    assert(core.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == fixed,
      "fixed-round form equals the fixpoint on a converged graph")
    assert(rounds == 2, s"K4+chain: one peel + one no-change check, got $rounds")
    spark.catalog.clearCache()
  }

  test("kcore detector: a long cascade is NOT converged in 5 rounds, and shows it") {
    // squared path v1..v20 (edges i—i+1, i—i+2): interior degree 4,
    // but peeling unravels exactly one vertex from each end per round
    // — the classic deep-cascade adversary. Its true 3-core is EMPTY;
    // after 5 rounds a middle segment survives whose endpoint degrees
    // are < k, so non-convergence is visible in the output itself.
    val und = ((1L to 19L).map(i => (i, i + 1)) ++ (1L to 18L).map(i => (i, i + 2)))
      .toDF("u", "v")
    val after5 = Graph.kcoreOf(und).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after5.nonEmpty, "5 rounds must NOT finish the 20-node cascade")
    assert(after5.keySet == (6L to 15L).toSet,
      s"rounds 1..5 peel v1..v5 and v16..v20: ${after5.keySet.toSeq.sorted}")
    assert(after5.values.min < Graph.CoreK,
      "sub-k degrees in the round-5 output certify non-convergence")
    val (core, rounds) = Graph.kcoreFixpointOf(und)
    assert(core.count() == 0, "the true 3-core of the squared path is empty")
    assert(rounds > Graph.PeelRounds, s"cascade needs > 5 rounds, took $rounds")
    spark.catalog.clearCache()
  }

  test("kcore convergence certificate on the graded corpus (sf0.01)") {
    // proves the q157 fixed-5-round oracle form IS the true k-core on
    // the co-purchase graph the driver grades — and that every core
    // member meets the k threshold
    val und = Graph.undEdges(spark, "/root/testdata/sf0.01").cache()
    val fixed = Graph.kcoreOf(und).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (coreDf, rounds) = Graph.kcoreFixpointOf(und)
    val core = coreDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixed == core,
      s"5 peel rounds reach the fixpoint on sf0.01 (fixpoint took $rounds rounds)")
    assert(rounds <= Graph.PeelRounds)
    assert(core.values.forall(_ >= Graph.CoreK), "every core member has degree ≥ k")
    spark.catalog.clearCache()
  }

  // --- q171 connected components ------------------------------------

  test("cc: two components, an isolated node, min-id labels, sizes") {
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("part_id")
    val und = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("u", "v")
    val out = Graph.ccOf(nodes, und).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L), (20L, 20L, 1L)),
      s"component labels/sizes wrong: $out")
    spark.catalog.clearCache()
  }

  test("cc: pointer jumping converges a 20-node path in 5 rounds") {
    // pure neighbor-min needs diameter = 19 rounds; the alternating
    // jump doubles reach per round (≥ 2^5 = 32 > 19)
    val nodes = (1L to 20L).toDF("part_id")
    val und = (1L to 19L).map(i => (i, i + 1)).toDF("u", "v")
    val lbl = Graph.ccLabels(nodes, und, Graph.CcRounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl.values.toSet == Set(1L), s"all 20 path nodes must reach label 1: $lbl")
    // and the detector: with only 2 rounds (reach ~7) the path is NOT
    // done, and non-convergence is visible from the output alone — an
    // edge whose endpoints disagree
    val part = Graph.ccLabels(nodes, und, 2).cache()
    val disagree = und
      .join(part.select(col("part_id").as("u"), col("lbl").as("lu")), Seq("u"))
      .join(part.select(col("part_id").as("v"), col("lbl").as("lv")), Seq("v"))
      .filter(col("lu") =!= col("lv")).count()
    assert(disagree > 0, "2 rounds must leave a disagreeing edge on the 20-path")
    spark.catalog.clearCache()
  }

  test("cc convergence certificate on the graded corpus (sf0.01)") {
    // proves the q171 fixed-5-round oracle form IS the true component
    // labeling on the co-purchase graph the driver grades
    val d = sf("sf0.01")
    val nodes = Tables.lineitem(spark, d).select(col("l_partkey").as("part_id")).distinct()
    val und = Graph.undEdges(spark, d).localCheckpoint(true)
    val fixed = Graph.ccLabels(nodes, und, Graph.CcRounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (fixDf, rounds) = Graph.ccFixpointOf(nodes, und)
    val fix = fixDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixed == fix,
      s"5 cc rounds reach the fixpoint on sf0.01 (fixpoint took $rounds rounds)")
    assert(rounds <= Graph.CcRounds)
    spark.catalog.clearCache()
  }

  // --- q173 graph report card ----------------------------------------

  test("graph report card: every statistic by hand on a fixture") {
    // components {1,2,3}, {10,11}, isolated 20: n=6, m=3, max_deg=2,
    // avg_deg = 2·3/6 = 1.0 → 1000000 micro, isolated=1, 3 components,
    // giant {1,2,3} → share 3/6 = 500000 micro
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("part_id")
    val und = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("u", "v")
    val r = Graph.graphReportOf(nodes, und).collect().head
    assert(r.getAs[Long]("n_nodes") == 6L)
    assert(r.getAs[Long]("n_edges") == 3L)
    assert(r.getAs[Long]("max_deg") == 2L)
    assert(r.getAs[Long]("avg_deg_micro") == 1000000L)
    assert(r.getAs[Long]("isolated_parts") == 1L)
    assert(r.getAs[Long]("n_components") == 3L)
    assert(r.getAs[Long]("giant_n") == 3L)
    assert(r.getAs[Long]("giant_share_micro") == 500000L)
    spark.catalog.clearCache()
  }

  test("graph report card: edge-free graph degrades to all-isolated") {
    val nodes = Seq(7L, 8L).toDF("part_id")
    val und = Seq.empty[(Long, Long)].toDF("u", "v")
    val r = Graph.graphReportOf(nodes, und).collect().head
    assert(r.getAs[Long]("n_edges") == 0L)
    assert(r.getAs[Long]("max_deg") == 0L)
    assert(r.getAs[Long]("isolated_parts") == 2L)
    assert(r.getAs[Long]("n_components") == 2L)
    assert(r.getAs[Long]("giant_n") == 1L)
    spark.catalog.clearCache()
  }

  // --- q172 incremental connected components -------------------------

  test("cc delta: quotient merge, new-node attach, duplicate delta edge") {
    // base: components {1,2}, {5,6}, isolated 9. delta: (2,5) merges
    // the two base components THROUGH their representatives, (9,30)
    // attaches a delivery-born node to 9, and the duplicate (1,2)
    // must be ignored. Expected merged comps: {1,2,5,6}→1, {9,30}→9.
    val undB = Seq((1L, 2L), (5L, 6L)).toDF("u", "v")
    val nodesB = Seq(1L, 2L, 5L, 6L, 9L).toDF("part_id")
    val ccB = Graph.ccLabels(nodesB, undB, Graph.CcRounds)
      .select(col("part_id"), col("lbl").as("comp"))
    val undD = Seq((2L, 5L), (9L, 30L), (1L, 2L)).toDF("u", "v")
    val dNodes = Seq(2L, 5L, 9L, 30L).toDF("part_id")
    val out = Graph.ccDelta(undB, ccB, undD, dNodes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (1L, 1L, 1L), (2L, 1L, 1L), (5L, 5L, 1L), (6L, 5L, 1L),
      (9L, 9L, 9L), (30L, 0L, 9L)),
      s"quotient merge wrong: $out")
    spark.catalog.clearCache()
  }

  test("incremental components equal the batch labeling of the merged graph (sf0.001)") {
    val d = sf("sf0.001")
    val out = SparkEntry.queries("q172_incremental_components")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val batch = Graph.connectedComponents(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == batch,
      "quotient repair must reproduce the batch labeling of base ∪ delta exactly")
    spark.catalog.clearCache()
  }

  test("base-bucket cc converges within the fixed rounds (sf0.001) — the anchor's premise") {
    // the quotient-merge identity assumes the pinned base labels ARE
    // the base fixpoint; certify the 90% bucket like q169 does
    val d = sf("sf0.001")
    val bli = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pid"))
      .filter(graft.functions.TextFns.h60(col("l_orderkey").cast("string")) % 100 < 90)
    val undB = Graph.edgesOf(bli)
      .filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
      .localCheckpoint(true)
    val nodesB = bli.select(col("pid").as("part_id")).distinct()
    val fixed = Graph.ccLabels(nodesB, undB, Graph.CcRounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (fixDf, rounds) = Graph.ccFixpointOf(nodesB, undB)
    assert(fixDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == fixed,
      s"base bucket needs $rounds cc rounds; the pinned index uses ${Graph.CcRounds}")
    assert(rounds <= Graph.CcRounds)
    spark.catalog.clearCache()
  }

  // --- round 13: cross-JVM standing indexes ([[graft.IndexStore]]) ---

  /** Index-served ≡ inline-built, for every published graph index.
    * This is the staleness net for the cross-JVM store: a code change
    * that alters an index's CONTENT without bumping its formatVersion
    * would otherwise silently serve the previous JVM's artifact —
    * here the published parts are read back and compared field-for-
    * field against a fresh inline derivation on the graded corpus.
    */
  test("standing graph indexes serve exactly what an inline build derives (sf0.001)") {
    val d = sf("sf0.001")
    val liAll = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pid"))
    val li90 = liAll
      .filter(graft.functions.TextFns.h60(col("l_orderkey").cast("string")) % 100 < 90)
    val und = Graph.edgesOf(li90)
      .filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
      .localCheckpoint(true)

    // co_edges (full corpus)
    val coServed = Graph.coEdges(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val coInline = Graph.edgesOf(liAll).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(coServed == coInline, "co_edges index diverges from inline derivation")

    // k-core index: edges part + core part
    val (kEd, kCo) = Graph.baseCoreIndex(spark, d)
    assert(operators.Snapshots.read(spark, kEd).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      == und.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
      "kcore edges part diverges")
    assert(operators.Snapshots.read(spark, kCo).collect().map(_.getLong(0)).sorted.toSeq
      == Graph.kcoreOf(und).collect().map(_.getLong(0)).sorted.toSeq,
      "kcore core part diverges")

    // triangle index: adjacency arrays (set column → compare sorted) + census stats
    val (tAdj, tSt) = Graph.baseTriIndex(spark, d)
    def adjRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).sorted.toSeq)).sortBy(_._1).toSeq
    assert(adjRows(operators.Snapshots.read(spark, tAdj))
      == adjRows(Graph.adjacencyArrays(und)), "tri adjacency part diverges")
    assert(operators.Snapshots.read(spark, tSt).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Graph.trianglesOf(und).select(col("n_edges"), col("n_triangles")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq,
      "tri stats part diverges")

    // cc index: labels part
    val (_, cLb) = Graph.baseCcIndex(spark, d)
    val nodesB = li90.select(col("pid").as("part_id")).distinct()
    assert(operators.Snapshots.read(spark, cLb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      == Graph.ccLabels(nodesB, und, Graph.CcRounds).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
      "cc labels part diverges")

    // pagerank index: converged ranks part (edges part = directed edgesOf)
    val (pEd, pPr) = Graph.basePrIndex(spark, d)
    val edB = Graph.edgesOf(li90)
    assert(operators.Snapshots.read(spark, pEd).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      == edB.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq,
      "pr edges part diverges")
    val degB = edB.groupBy(col("src")).agg(sum(col("w")).as("deg"))
    val init = nodesB
      .join(degB.withColumnRenamed("src", "part_id"), Seq("part_id"), "left")
      .select(col("part_id"), coalesce(col("deg"), lit(0L)).as("deg"),
        lit(1000000L).as("pr"))
    assert(operators.Snapshots.read(spark, pPr).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      == Graph.prIterate(init, edB, Graph.PrIters)
        .select(col("part_id"), col("pr")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
      "pr ranks part diverges")
    spark.catalog.clearCache()
  }

  /** The maintenance verb closing the q159 lifecycle: the advanced
    * version's ranks/edges must equal exactly what the serve computed,
    * the two parts land under ONE manifest (atomic — no torn
    * edges-without-ranks state), and every prior version stays
    * readable after another advance.
    */
  test("advancePrIndex commits the merged graph + warmed ranks atomically; prior versions stay readable") {
    val d = sf("sf0.001")
    val dir = Scratch.fresh("adv_pr_")
    val v1 = Graph.advancePrIndex(spark, d, dir)
    assert(v1 == 1)
    val adv = operators.Snapshots.read(spark, dir, Some(v1)).cache()
    // ranks part ≡ the q159 serve
    val served = Graph.incrementalPagerank(spark, d)
      .select(col("part_id"), col("pr_warm")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(adv.filter(col("kind") === "r")
      .select(col("part_id"), col("pr")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq == served,
      "advanced ranks must equal the delivery serve")
    // edges part ≡ the merged edge set (base ∪ delta, weights summed)
    val (edDir, _) = Graph.basePrIndex(spark, d)
    val dli = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pid"))
      .filter(graft.functions.TextFns.h60(col("l_orderkey").cast("string")) % 100 >= 90)
    val merged = operators.Snapshots.read(spark, edDir)
      .unionByName(Graph.edgesOf(dli))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(adv.filter(col("kind") === "e")
      .select(col("src"), col("dst"), col("w")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq == merged,
      "advanced edges must equal the merged edge set")
    // lineage: a second advance is a NEW version; v1 stays readable
    val v2 = Graph.advancePrIndex(spark, d, dir)
    assert(v2 == 2)
    assert(operators.Snapshots.read(spark, dir, Some(v1))
      .filter(col("kind") === "r").count()
      == operators.Snapshots.read(spark, dir, Some(v2))
        .filter(col("kind") === "r").count(),
      "prior advanced version must stay readable with its full rank set")
    spark.catalog.clearCache()
  }
}
