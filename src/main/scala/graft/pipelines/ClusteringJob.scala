package graft.pipelines

import graft.operators.MLOps
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's clustering pipeline
  * (`/root/reference/src/pipelines/clustering.py:56-136`): read the
  * warehouse-shaped source, derive the 8-feature per-product matrix
  * (single conditional-aggregation pass — the reference's two fact
  * scans fused), z-score with POPULATION std (sklearn parity), KMeans
  * k=4 seed=42, canonical relabel, land `product_clustering` + ledger.
  */
object ClusteringJob {

  val K = 4

  /** Pure transform: per-product features + canonical cluster id. */
  def build(spark: SparkSession, srcDir: String): DataFrame = {
    val feats = MLOps.features(spark, srcDir)
    val z = MLOps.zscored(spark, srcDir)
    val zCols = z.columns.filter(_.startsWith("z_")).toSeq
    val clustered = MLOps.kmeansCanonical(z, zCols, "part_id", K)
    feats.join(clustered.select(col("part_id"), col("cluster")), Seq("part_id"))
  }

  def run(spark: SparkSession, srcDir: String, warehouseDir: String): Unit = {
    build(spark, srcDir)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$warehouseDir/product_clustering")
    EtlJob.appendLog(spark, warehouseDir, "ClusteringJob")
  }

  /** The clustering pipeline with the DETERMINISTIC labeler (nearest
    * trained centroid, the oracle-replayable q74/q145 assignment) in
    * place of MLlib KMeans: same features, same landing table, same
    * ledger — the arm the end-to-end hash gate (q185) composes,
    * because MLlib's k-means|| labels are partitioning-specific and
    * can never sit under a cross-engine hash. [[run]] remains the
    * MLlib surface, certificate-gated via q57/KMeansSpec.
    */
  def runDeterministic(spark: SparkSession, srcDir: String, warehouseDir: String): Unit = {
    MLOps.features(spark, srcDir).na.drop()
      .join(MLOps.centroidLabels(spark, srcDir).select(col("part_id"), col("cluster")),
        Seq("part_id"))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$warehouseDir/product_clustering")
    EtlJob.appendLog(spark, warehouseDir, "ClusteringJob")
  }
}
