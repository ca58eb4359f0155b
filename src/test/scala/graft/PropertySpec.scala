package graft

import graft.operators.AsOf
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks (SURVEY.md §5.4): as-of join totality/partial
  * coverage and hash-family invariants over generated ScalaCheck inputs
  * (Gen driven directly with fixed seeds — the scalatestplus bridge is
  * not in the offline dependency set).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Run `body` over `n` deterministic samples of `gen`. */
  private def forAllSamples[A](gen: Gen[A], n: Int = 20)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private val timesGen: Gen[(List[Long], List[Long])] = for {
    lefts <- Gen.nonEmptyListOf(Gen.choose(0L, 1000L))
    rights <- Gen.nonEmptyListOf(Gen.choose(0L, 1000L))
  } yield (lefts.distinct, rights.distinct)

  test("as-of: every left row appears exactly once; match is the floor right time") {
    forAllSamples(timesGen) { case (lefts, rights) =>
      val l = lefts.map(t => (1L, t)).toDF("k", "t")
      val r = rights.map(t => (1L, t, t)).toDF("k", "rt", "payload")
      val out = AsOf.backward(l, r, "t", "rt", Seq("k"), Seq("payload"))
        .collect().map(row => row.getLong(1) -> Option(row.get(2)).map(_.asInstanceOf[Long]))
      // totality: one output row per left row, no dupes, no drops
      assert(out.length == lefts.length)
      // correctness: payload is the greatest right time <= t (or none)
      out.foreach { case (t, got) =>
        val expect = rights.filter(_ <= t).sorted.lastOption
        assert(got == expect, s"t=$t got=$got expect=$expect")
      }
    }
  }

  test("minhash family: values stay in [0, P) and identical sets give identical minima") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFns
    forAllSamples(Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty)), n = 8) { words =>
      val df = words.distinct.toDF("w")
        .select(TextFns.hmod(col("w")).as("h"))
        .select((0 until 4).map(j => min(TextFns.minhashJ(col("h"), lit(j))).as(s"m$j")): _*)
      val row = df.head()
      (0 until 4).foreach { j =>
        val v = row.getLong(j)
        assert(v >= 0 && v < TextFns.P)
      }
      // determinism: same input, same signature
      assert(df.head() == row)
    }
  }

  test("jaccard from shingle-set joins is within [0,1] and 1 iff identical sets") {
    forAllSamples(Gen.zip(
      Gen.nonEmptyListOf(Gen.choose(1, 50)),
      Gen.nonEmptyListOf(Gen.choose(1, 50))), n = 50) { case (a0, b0) =>
      val a = a0.toSet
      val b = b0.toSet
      val inter = a.intersect(b).size.toDouble
      val j = inter / (a.size + b.size - inter)
      assert(j >= 0.0 && j <= 1.0)
      assert((j == 1.0) == (a == b))
    }
  }

  private val keyedGen: Gen[(List[(Long, Long)], List[(Long, Long)])] = for {
    lefts <- Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 200L)))
    rights <- Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 200L)))
  } yield (lefts.distinct, rights.distinct)

  test("as-of: sort-merge and broadcast-range formulations agree on random keyed data") {
    forAllSamples(keyedGen, n = 15) { case (lefts, rights) =>
      val l = lefts.map { case (k, t) => (k, t) }.toDF("k", "t")
      val r = rights.map { case (k, t) => (k, t, t * 10) }.toDF("k", "rt", "payload")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect()
          .map(row => (row.getLong(0), row.getLong(1), Option(row.get(2))))
          .sortBy(x => (x._1, x._2)).toSeq
      val sm = canon(AsOf.backward(l, r, "t", "rt", Seq("k"), Seq("payload")))
      val bc = canon(AsOf.backwardBroadcast(l, r, "t", "rt", Seq("k"), Seq("payload")))
      assert(sm == bc, s"formulations diverge:\n sm=$sm\n bc=$bc")
    }
  }

  test("forward as-of is the ceiling right time; nearest picks the closer, ties backward") {
    forAllSamples(timesGen) { case (lefts, rights) =>
      val l = lefts.map(t => (1L, t)).toDF("k", "t")
      val r = rights.map(t => (1L, t, t * 10)).toDF("k", "rt", "payload")
      val fwd = AsOf.forward(l, r, "t", "rt", Seq("k"), Seq("payload"))
        .collect().map(row => row.getLong(1) -> Option(row.get(2)).map(_.asInstanceOf[Long]))
      assert(fwd.length == lefts.length)
      fwd.foreach { case (t, got) =>
        val expect = rights.filter(_ >= t).sorted.headOption.map(_ * 10)
        assert(got == expect, s"forward t=$t got=$got expect=$expect")
      }
      val near = AsOf.nearest(l, r, "t", "rt",
          by = Seq("k"), leftKey = Seq("t"), rightPayload = Seq("payload", "rt"))
        .collect().map(row => row.getLong(1) -> Option(row.get(2)).map(_.asInstanceOf[Long]))
      assert(near.length == lefts.length)
      near.foreach { case (t, got) =>
        val back = rights.filter(_ <= t).sorted.lastOption
        val ahead = rights.filter(_ >= t).sorted.headOption
        val expect = (back, ahead) match {
          case (Some(b), Some(a)) => Some(if (a - t < t - b) a else b) // tie -> backward
          case (b, a) => b.orElse(a)
        }
        assert(got == expect.map(_ * 10), s"nearest t=$t got=$got expect=$expect")
      }
    }
  }

  test("two-phase global cumsum equals the single-window prefix sum on random data") {
    import org.apache.spark.sql.functions._
    val rowsGen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 100000L), Gen.choose(-1000.0, 1000.0)))
      .map(_.distinctBy(_._1)) // unique sort key: the helper's total-order contract
    forAllSamples(Gen.zip(rowsGen, Gen.choose(2, 9)), n = 12) { case (rows, nParts) =>
      val df = rows.toDF("k", "v")
        .repartition(5) // arbitrary input layout
        .withColumn("vm", col("v").cast(Det.Money))
      val out = operators.Relational.globalCumsum(df, Seq("k"), "vm", nParts)
        .select(col("k"), col("running_total"))
        .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
      var acc = java.math.BigDecimal.ZERO
      rows.sortBy(_._1).foreach { case (k, v) =>
        acc = acc.add(java.math.BigDecimal.valueOf(v).setScale(6, java.math.RoundingMode.HALF_UP))
        assert(out(k).compareTo(acc) == 0, s"k=$k got=${out(k)} expect=$acc (n=$nParts)")
      }
    }
  }
}
