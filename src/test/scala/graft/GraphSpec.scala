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

  test("triangles: triangle-free bipartite graph counts zero") {
    val und = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L))
      .toDF("u", "v")
    val r = Graph.trianglesOf(und).collect().head
    assert(r.getAs[Long]("n_triangles") == 0L)
    assert(r.getAs[Long]("global_cc_micro") == 0L)
    spark.catalog.clearCache()
  }
}
