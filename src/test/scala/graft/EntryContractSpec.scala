package graft

import minietl.SparkTestBase
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Enforces the driver-output-type contract from SparkEntry's header: every
  * registered query's FINAL columns must be DOUBLE / BIGINT / INT / STRING /
  * BOOL / DATE / TIMESTAMP. DECIMAL outputs hash-mismatch in the driver
  * (pandas reads them as Python Decimal, the DuckDB oracle's .df() renders
  * float64 — `Decimal('8784.30') != 8784.3`); ARRAY / MAP / STRUCT outputs
  * crash the driver's pandas row sort (`unhashable type: numpy.ndarray`).
  * Decimals and arrays remain welcome INTERNALLY for exactness.
  *
  * Schemas are resolved lazily against sf0.001 — batch queries never
  * execute; the three streaming queries drain their one AvailableNow batch.
  */
class EntryContractSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def violation(dt: DataType): Boolean = dt match {
    case _: DecimalType => true
    case _: ArrayType | _: MapType | _: StructType => true
    case FloatType => true // float32 renders differently from float64
    case _ => false
  }

  test("every registered query emits only driver-safe output column types") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val schema = fn(spark, sfDir).schema
      schema.fields.collect {
        case f if violation(f.dataType) => s"$name.${f.name}: ${f.dataType.sql}"
      }
    }
    assert(bad.isEmpty,
      s"driver-unsafe output columns (see SparkEntry header contract):\n  ${bad.mkString("\n  ")}")
  }

  test("headline scans push filters and prune columns (plan contract)") {
    // q1: the l_shipdate predicate must reach the parquet reader and the
    // read schema must hold only the referenced columns (7 of 16) — this is
    // the difference between scanning 100 TB and scanning the needed slice.
    val q1 = SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(q1.contains("PushedFilters:") && q1.contains("l_shipdate"),
      s"q1 date predicate not pushed:\n$q1")
    val readSchema = "ReadSchema:.*".r.findFirstIn(q1).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_partkey"),
      s"q1 reads unreferenced columns: $readSchema")

    // q6: all predicates pushed, 4-column read schema
    val q6 = SparkEntry.queries("q6_forecast_revenue")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(q6.contains("PushedFilters:") && q6.contains("l_discount"),
      s"q6 predicates not pushed:\n$q6")

    // the documents scans prune to the referenced columns too: q_lang_id
    // reads (doc_id, text)-ish slices, never the full row — at corpus
    // scale the text column dominates I/O, so reading ONLY what a query
    // references is the plan property that matters most
    val qt = SparkEntry.queries("q_token_stats")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val tSchema = "ReadSchema:.*".r.findFirstIn(qt).getOrElse("")
    assert(!tSchema.contains("source") && !tSchema.contains("lang"),
      s"q_token_stats reads unreferenced documents columns: $tSchema")

    // the embeddings scan prunes: q_ann_topk references (vec_id, embedding)
    // but not label
    val qa = SparkEntry.queries("q_ann_topk")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val aSchema = "ReadSchema:.*".r.findAllIn(qa).mkString(" ")
    assert(!aSchema.contains("label"),
      s"q_ann_topk reads unreferenced embeddings columns: $aSchema")
  }

  test("ANN top-k ranks in two phases: no corpus-sized single-per-query window (plan contract)") {
    // Similarity.topKPerQuery contract: the FIRST window over the scored
    // frame must partition by (q_id, __pid) — the balanced local phase —
    // and only the survivor-sized global window may partition by q_id
    // alone. A single q_id-partitioned window over the scored set is the
    // superlinear shape the 1000× probe caught (23.6× time for 10× data).
    // the OPTIMIZED LOGICAL plan: the AQE-wrapped physical plan hides its
    // subtree until execution, and the logical Window shape (post column
    // pruning) is the contract anyway
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    def windows(name: String) = SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.optimizedPlan.collect { case w: LWindow => w }
    Seq("q_ann_topk", "q_lsh_ann", "q_ivf_ann").foreach { name =>
      val ws = windows(name)
      assert(ws.size === 2, s"$name: expected local+global windows, got ${ws.size}")
      val partSizes = ws.map(_.partitionSpec.size).sorted
      assert(partSizes === Seq(1, 2),
        s"$name window partition specs: ${ws.map(_.partitionSpec.map(_.sql))}")
    }
    // int8 rerank: pre-rank local+global plus the exact-stage window = 3,
    // and the local ranking phase sees only the slim (q_id, n_id, acos)
    // row — never the code/vector arrays — after column pruning
    val ws8 = windows("q_ann_topk_int8")
    assert(ws8.size === 3, s"int8: expected 3 windows, got ${ws8.size}")
    val localPhase = ws8.filter(_.partitionSpec.size == 2)
    assert(localPhase.nonEmpty, "int8: local (q_id, __pid) phase missing")
    val localCols = localPhase.head.child.output.map(_.name).toSet
    assert(!localCols.exists(c => c.contains("codes") || c.contains("vec")),
      s"int8 local ranking phase carries array columns through its exchange: $localCols")
  }

  test("q_ivf_ann oracle apply fails fast before training; get/contains obey the Map contract") {
    // Before the query trains, the key is simply ABSENT: get returns None,
    // contains/getOrElse behave like any Map's (no Map-contract violation).
    // Only the unconditional apply() throws the actionable sequencing error.
    // (If an earlier suite in this JVM already ran the query, all paths
    // resolve instead.)
    val pre = SparkEntry.oracleSql
    if (!pre.iterator.exists(_._1 == "q_ivf_ann")) {
      assert(pre.get("q_ivf_ann").isEmpty)
      assert(!pre.contains("q_ivf_ann"))
      assert(pre.getOrElse("q_ivf_ann", "absent") === "absent")
      val e = intercept[IllegalStateException] { pre("q_ivf_ann") }
      assert(e.getMessage.contains("before the q_ivf_ann query ran"))
    }
    SparkEntry.queries("q_ivf_ann")(spark, sfDir).collect()
    assert(SparkEntry.oracleSql("q_ivf_ann").nonEmpty)
    assert(SparkEntry.oracleSql.get("q_ivf_ann").exists(_.nonEmpty))
  }
}
