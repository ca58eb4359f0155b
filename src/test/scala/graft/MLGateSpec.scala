package graft

import graft.operators.MLOps
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.functions._

/** Property gates for the ML queries whose outputs cannot be expressed
  * as DuckDB oracle SQL (library-specific numerics): q58's PCA variance
  * summary and q67's silhouette. Instead of "returns rows", these pin
  * the mathematical contract — a valid deterministic variance spectrum,
  * and the evaluator's silhouette agreeing with an exact from-scratch
  * recomputation of the squared-euclidean silhouette definition.
  */
class MLGateSpec extends SparkSpec {

  private def pcaVariances: Array[Double] =
    SparkEntry.queries("q58_pca_variance")(spark, sf("sf0.001"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))

  test("q140 training gate: each subspace-iteration round strictly raises the captured energy") {
    // Independent recomputation: G from the collected integer sequence
    // matrix (exact BigInt products), captured energy of a basis V as
    // Σ_j (v_jᵀ G v_j)/(v_jᵀ v_j) — the Rayleigh-quotient sum subspace
    // iteration maximizes. The md5-sign init (basis 0) is exactly
    // q127's random projection, so basis 0 → basis LearnIters strictly
    // improving IS "learning beats the random projection", measured.
    val d = sf("sf0.001")
    val pq = graft.Tables.lineitem(spark, d)
      .groupBy(
        col("l_partkey").as("p"),
        (year(col("l_shipdate")) * 4 + quarter(col("l_shipdate"))).cast("int").as("t"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("rev"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val ts = pq.map(_._2).distinct.sorted
    val ti = ts.zipWithIndex.toMap
    val byPart = pq.groupBy(_._1)
    val gm = Array.ofDim[Double](ts.length, ts.length)
    byPart.values.foreach { rows =>
      for ((_, t1, r1) <- rows; (_, t2, r2) <- rows)
        gm(ti(t1))(ti(t2)) += (BigInt(r1) * BigInt(r2)).toDouble
    }
    def energy(basis: Array[org.apache.spark.sql.Row]): Double = {
      val cols = basis.groupBy(_.getInt(1)).values.map { rs =>
        val v = Array.ofDim[Double](ts.length)
        rs.foreach(r => v(ti(r.getInt(0))) = r.getDouble(2))
        v
      }
      cols.map { v =>
        val gv = gm.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
        v.zip(gv).map { case (a, b) => a * b }.sum / v.map(x => x * x).sum
      }.sum
    }
    val energies = MLOps.learnedBases(spark, d).map(b => energy(b.collect()))
    assert(energies.length == MLOps.LearnIters + 1)
    energies.sliding(2).foreach { case Seq(prev, next) =>
      assert(next > prev,
        s"every training round must raise the captured energy: $energies")
    }
    assert(energies.last > energies.head * 1.5,
      s"the trained basis must clearly beat the random-projection init: $energies")
  }

  test("q58: explained variance is a valid, descending, deterministic spectrum") {
    val ev = pcaVariances
    assert(ev.length == 4, s"expected 4 components, got ${ev.length}")
    assert(ev.forall(v => v >= 0.0 && v <= 1.0), s"variance ratios out of [0,1]: ${ev.mkString(",")}")
    assert(ev.sliding(2).forall(p => p(0) >= p(1) - 1e-12),
      s"explained variance must be non-increasing: ${ev.mkString(",")}")
    assert(ev.sum <= 1.0 + 1e-9, s"ratios sum over 1: ${ev.sum}")
    // the top 4 of 8 nonnegative variance ratios necessarily carry at
    // least half the total variance
    assert(ev.sum >= 0.5 - 1e-9, s"top-4 components must explain >= half the variance: ${ev.sum}")
    assert(pcaVariances.sameElements(ev), "PCA spectrum must be run-to-run deterministic")
  }

  test("q58: deterministic spectrum tracks MLlib PCA's explained variance") {
    // the oracle-replayed subspace iteration and the library eigensolve
    // must agree on the spectrum (same z-matrix; differences are finite
    // iterations + population-vs-sample scaling, both small)
    val det = pcaVariances
    val z = MLOps.zscored(spark, sf("sf0.001")).na.drop()
    val vec = new VectorAssembler()
      .setInputCols(MLOps.MatrixFeatures.map(c => s"z_$c").toArray).setOutputCol("fv")
    val mllib = new org.apache.spark.ml.feature.PCA()
      .setInputCol("fv").setOutputCol("pc").setK(4)
      .fit(vec.transform(z)).explainedVariance.toArray
    det.zip(mllib).zipWithIndex.foreach { case ((d, m), i) =>
      assert(math.abs(d - m) <= 0.03,
        s"component $i: deterministic $d vs MLlib $m drift > 0.03 " +
          s"(det=${det.mkString(",")} mllib=${mllib.mkString(",")})")
    }
  }

  test("A12 trajectory with MLlib kmeans labels: 4 clusters, sane moments, deterministic") {
    val z = MLOps.zscored(spark, sf("sf0.001"))
    val labels = MLOps
      .kmeansCanonical(z, MLOps.MatrixFeatures.map(c => s"z_$c"), "part_id", 4)
      .select(col("part_id"), col("cluster"))
    val rows = MLOps.trajectory(spark, sf("sf0.001"), labels).collect()
    assert(rows.map(_.getInt(0)).toSet == Set(0, 1, 2, 3),
      "every canonical cluster id must appear in the trajectory")
    rows.foreach { r =>
      assert(r.getLong(3) >= 1, s"empty (cluster, quarter) group emitted: $r")
      assert(r.getDouble(4) > 0.0, s"quarterly mean revenue must be positive: $r")
      assert(r.getDouble(5) >= 0.0, s"std must be non-negative: $r")
    }
    // quarters are contiguous calendar keys, rows ordered by (cluster, y, q)
    val ordered = rows.map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(ordered.sameElements(ordered.sorted), "trajectory must be ordered by cluster, y, q")
    val again = MLOps.trajectory(spark, sf("sf0.001"), labels).collect()
    assert(rows.sameElements(again), "trajectory must be run-to-run deterministic")
  }

  /** Exact classic silhouette (squared euclidean, own-cluster n/(n−1)
    * correction, singletons → 0) from collected (cluster, coords)
    * points via per-cluster sufficient statistics.
    */
  private def exactSilhouette(pts: Array[(Int, Array[Double])]): Double = {
    // exact mean squared distance from x to cluster C:
    //   avg_{y in C} ||x-y||^2 = ||x||^2 + (sum_{y} ||y||^2)/|C| - 2 (x . sum_y y)/|C|
    // own-cluster dissimilarity rescales by n/(n-1) (the ||x-x||^2 = 0
    // self term contributes nothing and must not dilute the mean);
    // silhouette of a singleton-cluster point is 0 by definition.
    val dim = pts.head._2.length
    val stats = pts.groupBy(_._1).map { case (c, arr) =>
      val n = arr.length
      val sumVec = Array.fill(dim)(0.0)
      var sumSq = 0.0
      arr.foreach { case (_, v) =>
        var i = 0
        while (i < dim) { sumVec(i) += v(i); sumSq += v(i) * v(i); i += 1 }
      }
      c -> (n, sumVec, sumSq)
    }
    val sils = pts.map { case (c, x) =>
      val xx = x.map(v => v * v).sum
      def meanSqDist(cl: Int): Double = {
        val (n, sv, sq) = stats(cl)
        val dot = x.indices.map(i => x(i) * sv(i)).sum
        xx + sq / n - 2.0 * dot / n
      }
      val (nOwn, _, _) = stats(c)
      if (nOwn == 1) 0.0
      else {
        val a = meanSqDist(c) * nOwn / (nOwn - 1)
        val b = stats.keys.filter(_ != c).map(meanSqDist).min
        (b - a) / math.max(a, b)
      }
    }
    sils.sum / sils.length
  }

  test("MLlib evaluator silhouette matches an exact squared-euclidean recomputation") {
    // fit the MLlib pipeline and score it with ClusteringEvaluator,
    // then recompute the same definition from scratch — pins that the
    // library surface agrees with the formula q67's oracle-gated
    // deterministic variant implements
    val zCols = MLOps.MatrixFeatures.map(c => s"z_$c")
    val assembled = new VectorAssembler()
      .setInputCols(zCols.toArray).setOutputCol("fv")
      .transform(MLOps.zscored(spark, sf("sf0.001")).na.drop())
    val fitted = new KMeans()
      .setK(4).setSeed(42L).setFeaturesCol("fv").setPredictionCol("cluster")
      .fit(assembled).transform(assembled)
    val reported = new org.apache.spark.ml.evaluation.ClusteringEvaluator()
      .setFeaturesCol("fv").setPredictionCol("cluster").setMetricName("silhouette")
      .evaluate(fitted)
    val pts = fitted.select(col("cluster"), col("fv")).collect().map { r =>
      (r.getInt(0), r.getAs[org.apache.spark.ml.linalg.Vector](1).toArray)
    }
    val exact = exactSilhouette(pts)
    assert(math.abs(exact - reported) <= 5e-5 + 1e-9,
      s"evaluator silhouette $reported drifts from exact recomputation $exact")
  }

  test("q67: deterministic silhouette equals the exact recomputation over its own labels") {
    val rows = SparkEntry.queries("q67_silhouette")(spark, sf("sf0.001")).collect()
    assert(rows.map(_.getInt(0)).toSeq.sorted.head == -1, "overall row (cluster -1) must exist")
    val overall = rows.find(_.getInt(0) == -1).get.getDouble(2)
    assert(overall >= -1.0 && overall <= 1.0, s"silhouette out of range: $overall")
    // recompute from the micro-integer coordinates q67 scores (the 6-dp
    // z-scores), over the same fixed-centroid assignment
    val pts = MLOps.centroidLabeled(spark, sf("sf0.001"))
      .select(col("cluster") +: MLOps.MatrixFeatures.map(f => col(s"z_$f")): _*)
      .collect().map { r =>
        (r.getInt(0), (1 to MLOps.MatrixFeatures.length)
          .map(i => math.floor(r.getDouble(i) * 1000000.0 + 0.5)).toArray)
      }
    val exact = exactSilhouette(pts)
    assert(math.abs(exact - overall) <= 1e-9,
      s"q67 overall silhouette $overall drifts from exact recomputation $exact")
    // per-cluster rows: n_pts sums to the corpus, clusters 0..3 present or absent consistently
    val per = rows.filter(_.getInt(0) >= 0)
    assert(per.map(_.getLong(1)).sum == pts.length, "per-cluster counts must cover every part")
  }

  test("driver-side training arithmetic is bit-identical to Spark's decimal(38,12) path") {
    // The r17 optimization moved the q58/q140 training rounds onto the
    // driver (MLOps.subspaceIterLocal); the equivalence claim is that
    // dec12/dsum12Local replay cast(double AS DECIMAL(38,12)) → SUM →
    // cast(double) EXACTLY. Pin it on adversarial values: 12-dp ties
    // (HALF_UP direction), shortest-repr vs binary-expansion
    // separators, negatives, denormal-ish magnitudes, sign flips.
    val grids: Seq[Seq[Double]] = Seq(
      Seq(0.1, 0.2, 0.3, -0.7, 1e-13, -1e-13),
      Seq(1.0000000000005, -2.0000000000015, 0.0000000000025), // 12-dp ties
      Seq(math.Pi, -math.E, 1.0 / 3.0, -2.0 / 3.0, 0.1 + 0.2),
      Seq(-0.0, 0.0, 4.9e-324, -4.9e-324),
      (1 to 50).map(i => math.sin(i.toDouble) / 7.0),
      Seq(123456.789012345678, -98765.432109876543))
    import org.apache.spark.sql.functions._
    grids.zipWithIndex.foreach { case (g, i) =>
      val sparkSum = spark.createDataFrame(
        spark.sparkContext.parallelize(g.map(Tuple1(_)), 3))
        .toDF("x")
        .agg(sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 12)))
          .cast("double")).collect()(0).getDouble(0)
      val localSum = MLOps.dsum12Local(g)
      assert(java.lang.Double.doubleToLongBits(sparkSum)
        == java.lang.Double.doubleToLongBits(localSum),
        s"grid $i: spark dsum12 $sparkSum != driver dsum12Local $localSum")
    }
    // h60/sign twin: the md5-derived ±1 init must match TextFns.h60
    val ts = Seq(1, 7, 7990, 8021); val js = 1 to 4
    val sparkSigns = spark.createDataFrame(
      spark.sparkContext.parallelize(for (t <- ts; j <- js) yield (t, j), 2))
      .toDF("t", "j")
      .select(col("t"), col("j"),
        when(graft.functions.TextFns.h60(concat(
          col("t").cast("string"), lit(","), col("j").cast("string"), lit("v"))) % 2 === 0,
          lit(1.0)).otherwise(lit(-1.0)).as("v"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    for (t <- ts; j <- js)
      assert(MLOps.signLocal(t, j) == sparkSigns((t, j)),
        s"sign($t,$j): driver ${MLOps.signLocal(t, j)} != spark ${sparkSigns((t, j))}")
  }
}
