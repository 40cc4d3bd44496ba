package graft

/** Plan-shape regression net over the ENTIRE driver battery.
  *
  * The scale claims in COVERAGE.md (no all-pairs joins, pruned parquet
  * scans, pushed predicates, broadcast dimension joins) have so far been
  * pinned per-operator (AnnSpec / DedupSpec / SpanVoteSpec). This spec
  * sweeps every `SparkEntry.queries` entry at sf0.001 so a refactor that
  * quietly degrades ANY query's plan — a dropped join key turning an
  * equi-join into a cartesian product, a struct repack defeating column
  * pruning — fails in `sbt test` rather than at 100-TB scale. Plans are
  * inspected pre-execution (planning is cheap; nothing here runs the
  * query beyond what construction itself does).
  */
class PlanSweepSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("no battery query plans a cartesian product or nested-loop join") {
    // Every join in the battery is an equi-join (grid buckets, LSH bands,
    // hash keys) or an explicit broadcast hash join. A CartesianProduct /
    // BroadcastNestedLoopJoin anywhere means a join key was lost — the
    // canonical "works at sf0.001, dies at 100 TB" regression.
    //
    // ONE documented exception: t07 is the exact brute-force ANN
    // baseline, which is all-pairs BY DEFINITION — its
    // BroadcastNestedLoopJoin with the bounded query set on the build
    // side (corpus scanned once, never shuffled) is the plan the
    // operator's contract prescribes (Ann.bruteForceTopK scaladoc).
    val allowed = Map("t07_ann_topk" -> Set("BroadcastNestedLoopJoin"))
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan = planOf(name)
      val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
        .filter(plan.contains)
        .filterNot(allowed.getOrElse(name, Set.empty))
      if (bad.nonEmpty) Some(s"$name: ${bad.mkString(",")}") else None
    }
    assert(offenders.isEmpty, s"quadratic join shapes: ${offenders.mkString("; ")}")
  }

  test("q01 scan prunes lineitem to the aggregated columns") {
    val read = planOf("q01_agg").linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n")
    assert(read.contains("l_returnflag"), read)
    assert(!read.contains("l_shipdate") && !read.contains("l_orderkey"),
      s"scan reads columns q01 never touches: $read")
  }

  test("documents scans prune the text-only pipelines") {
    // t02 exact dedup needs only (doc_id, text); reading lang/source/
    // n_chars at 100 TB is pure wasted IO.
    val read = planOf("t02_exact_dedup").linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n")
    assert(read.contains("doc_id"), read)
    assert(!read.contains("n_chars") && !read.contains("source"),
      s"dedup scan reads unused document columns: $read")
  }

  test("ANN query-side predicate is pushed to the parquet scan") {
    val plan = planOf("t07_ann_topk")
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("LessThan(vec_id,8)"),
      s"vec_id<8 not pushed to scan:\n$plan")
  }

  test("dimension joins broadcast the small side") {
    val plan = planOf("q02_broadcast_join")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"dimension join fell back to sort-merge:\n$plan")
  }
}
