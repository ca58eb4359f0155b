package graft

import graft.functions.TopKAgg
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The native top-k aggregate: equality with the row_number-window
  * formulation on arbitrary data (partial + merge paths exercised by
  * forcing many input partitions), serialization round-trip via the
  * shuffle, and edge cases (group smaller than k, k = 1, ties).
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  /** Run `body` over `n` deterministic samples of `gen` (the
    * scalatestplus bridge is not in the offline dependency set).
    */
  private def forAllSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"v", $"id")
    df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select($"g", $"rn", $"id", $"v")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
  }

  private def viaNative(df: org.apache.spark.sql.DataFrame, k: Int) = {
    TopKAgg.register(spark)
    df.groupBy($"g")
      .agg(expr(s"graft_top_k(struct(v, id), $k)").as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).cast("int").as("rn"), $"col.id", $"col.v")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
  }

  test("graft_top_k equals the window formulation on random multi-partition data") {
    val rows = Gen.listOfN(400,
      Gen.zip(Gen.choose(0, 7), Gen.choose(-1000, 1000)))
    forAllSamples(rows, n = 10) { xs =>
      // unique ids make the (v, id) ordering total, so both sides agree on ties
      val df = xs.zipWithIndex
        .map { case ((g, v), i) => (g, i.toLong, v.toDouble) }
        .toDF("g", "id", "v")
        .repartition(16) // many partitions -> partial buffers + merge() path
      assert(viaNative(df, 3) == viaWindow(df, 3))
    }
  }

  test("graft_top_k handles k=1 and groups smaller than k") {
    val df = Seq(
      (1, 10L, 5.0), (1, 11L, 3.0), (1, 12L, 7.0),
      (2, 20L, 1.0) // single-row group, k larger than group
    ).toDF("g", "id", "v").repartition(8)
    assert(viaNative(df, 5) == viaWindow(df, 5))
    assert(viaNative(df, 1) == viaWindow(df, 1))
  }

  test("graft_top_k keeps at most k rows per group per partition ahead of the shuffle") {
    TopKAgg.register(spark)
    val df = (0 until 10000).map(i => (i % 4, i.toLong, (i * 37 % 997).toDouble))
      .toDF("g", "id", "v")
    val plan = df.groupBy($"g")
      .agg(expr("graft_top_k(struct(v, id), 3)").as("top"))
      .queryExecution.executedPlan.toString
    // partial + final ObjectHashAggregate around one exchange: the map
    // side reduces each partition to k values per group before shuffling
    assert(plan.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      s"expected partial+final ObjectHashAggregate:\n$plan")
  }

  test("partial buffer holds at most k entries under update, merge, and serialization") {
    // drives the aggregate directly — THE scale claim: what crosses the
    // shuffle is the serialized partial, so its entry count must stay
    // bounded by k no matter how many rows a partition feeds it
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.LongType
    val agg = graft.functions.TopKAgg(
      BoundReference(0, LongType, nullable = false), Literal(3))
    val buf = agg.createAggregationBuffer()
    (0 until 10000).foreach { i =>
      agg.update(buf, InternalRow((i * 2654435761L) % 9973))
      assert(buf.size <= 3, s"buffer grew past k after ${i + 1} updates")
    }
    val buf2 = agg.createAggregationBuffer()
    (0 until 10000).foreach(i => agg.update(buf2, InternalRow(i.toLong % 7919)))
    val merged = agg.merge(buf, buf2)
    assert(merged.size <= 3, "merge of two full partials must stay bounded")
    val bytes = agg.serialize(merged)
    assert(agg.deserialize(bytes).size <= 3, "shuffled partial must carry <= k entries")
    // and the survivors are the true global minima of everything fed in
    val expect = ((0 until 10000).map(i => (i * 2654435761L) % 9973) ++
      (0 until 10000).map(i => i.toLong % 7919)).sorted.take(3)
    val got = agg.eval(merged)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .toLongArray().toSeq
    assert(got == expect, s"expected $expect, got $got")
  }
}
