package graft

/** Prints the names of HEAD's benched queries (Q.bench == true), one
  * per line — the ground truth `tools/ritual_check.sh` compares the
  * committed `bench_canonical_r{N}.json` against, so a canonical
  * record that predates the last feature commit fails mechanically
  * instead of being discovered at judging time (round-13 defect).
  * Needs no SparkSession: query declaration is pure metadata.
  */
object BenchList {
  def main(args: Array[String]): Unit =
    SparkEntry.benchQueries.map(_.name).sorted.foreach(println)
}
