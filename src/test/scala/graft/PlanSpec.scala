package graft

/** Plan-shape pins for the scale-critical properties (SURVEY.md §4):
  * filters and projections must reach the parquet scan, provably-small
  * dimensions must broadcast, and the single-pass feature matrix must
  * scan the fact exactly once. These are the properties that decide
  * whether a plan survives a 100× scale-up, so they are asserted, not
  * assumed.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf("sf0.001")).queryExecution.executedPlan.toString

  test("time/flag filters are pushed to the parquet scan (q02)") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), s"shipdate filter not pushed:\n$p")
    assert(p.contains("EqualTo(l_returnflag,R)"), s"returnflag filter not pushed:\n$p")
  }

  test("column pruning reaches the scan (q02 reads 4 columns, not 16)") {
    val p = plan("q02_filter_project")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    val cols = "l_\\w+".r.findAllIn(readSchema.split("ReadSchema").last).toSet
    assert(cols == Set("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate", "l_returnflag"),
      s"scan reads wrong columns: $cols")
  }

  test("snowflake dimensions broadcast (q06)") {
    val p = plan("q06_snowflake_join")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), s"small dims must not sort-merge:\n$p")
  }

  test("membership filter is a semi join, not a collected list (q03)") {
    val p = plan("q03_semi_join")
    assert(p.contains("LeftSemi"), s"expected left-semi join:\n$p")
  }

  test("feature matrix scans the fact exactly once (q54 single-pass)") {
    val p = plan("q54_product_features")
    val factScans = p.linesIterator.count(l => l.contains("FileScan") && l.contains("lineitem"))
    assert(factScans == 1, s"fact must be scanned once, found $factScans:\n$p")
  }

  test("feature matrix has no Expand (q54 two-level agg, single distinct)") {
    // two countDistinct groups in one aggregate would plan an Expand
    // that triples every fact row before the shuffle; the (part, order)
    // pre-aggregation leaves one distinct and no Expand
    val p = plan("q54_product_features")
    assert(!p.contains("Expand"), s"q54 regressed to a multi-distinct Expand:\n$p")
  }

  test("as-of interval assignment broadcasts the dimension (q08)") {
    val p = plan("q08_asof_interval")
    assert(p.contains("Broadcast"), s"expected broadcast in as-of join:\n$p")
  }

  test("top-k by aggregate is distributed TakeOrderedAndProject, not a global window (q17)") {
    val p = plan("q17_topk_parts")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected per-partition top-k + driver merge (TakeOrderedAndProject):\n$p")
    // the rank window must consume the 15-row limit output, never the
    // unbounded per-part aggregate: the plan would then hold a Window
    // directly over the aggregate with no preceding TakeOrdered
    val winIdx = p.indexOf("Window")
    val topIdx = p.indexOf("TakeOrderedAndProject")
    assert(winIdx >= 0 && winIdx < topIdx,
      s"rank window must sit above (consume) the TakeOrdered output:\n$p")
  }

  test("keyset pagination pushes the cursor to the scan and takes ordered (q75)") {
    val p = plan("q75_keyset_pagination")
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$p")
    assert(p.contains("PushedFilters: [Or(GreaterThan(o_orderdate"),
      s"cursor predicate must reach the parquet scan:\n$p")
  }

  test("JSON extraction parses once via from_json, never per-field re-parse (q39)") {
    val p = plan("q39_json_extract")
    assert(!p.contains("get_json_object"),
      s"per-field get_json_object re-parses the payload for every field:\n$p")
    assert(p.contains("from_json"), s"expected typed from_json parse:\n$p")
  }

  test("minhash signature pipeline stays at three exchanges (q46)") {
    // repartition after the single-split scan + shingle DISTINCT +
    // groupBy(doc_id): the measured-optimal formulation. A regression to
    // the exploded per-(doc, j) form adds two more keyed exchanges.
    val p = plan("q46_minhash_bands")
    val exchanges = p.linesIterator.count(l => l.contains("Exchange") && !l.contains("Reused"))
    assert(exchanges <= 4, s"q46 grew extra shuffles ($exchanges):\n$p")
  }

  test("native top-k broadcasts the query vectors (q64)") {
    val p = operators.Similarity.nativeTopk(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$p")
  }

  test("connected components output plan is bounded regardless of rounds (q84)") {
    // each propagation round localCheckpoints, truncating lineage — a
    // regression to cache() grows the final plan by a join + agg per
    // round (and the driver's analysis time with it)
    val p = plan("q84_dup_clusters")
    val exchanges = p.linesIterator.count(l => l.contains("Exchange") && !l.contains("Reused"))
    assert(exchanges <= 4, s"q84 final plan must not carry per-round lineage ($exchanges):\n$p")
    assert(!p.contains("FileScan"),
      s"q84 output must read checkpointed labels, not re-derive from source:\n$p")
  }

  test("native top-k aggregates map-side, no window shuffle (q92)") {
    val p = plan("q92_topk_native")
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      s"expected partial+final ObjectHashAggregate:\n$p")
    assert(!p.contains("Window"), s"q92 must not fall back to a window sort:\n$p")
  }

  test("decontamination broadcasts the eval shingle set (q91)") {
    val p = plan("q91_decontamination")
    assert(p.contains("BroadcastHashJoin"), s"eval side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"train side must stream, never sort-merge against eval:\n$p")
  }
}
