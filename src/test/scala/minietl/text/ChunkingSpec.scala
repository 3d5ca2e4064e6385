package minietl.text

import minietl.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class ChunkingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("chunkDocuments covers every token with overlapping windows") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("id", "text")
    val out = Chunking.chunkDocuments(docs, "id", "text", chunkSize = 4, stride = 3)
      .orderBy("chunk_idx")
      .as[(Long, Long, String, Long)].collect().toSeq
    // starts stop at 6 (the first window reaching the end) — no trailing
    // "t10" window, which would be a strict subset of chunk 2
    assert(out === Seq(
      (1L, 0L, "t1 t2 t3 t4", 4L),
      (1L, 1L, "t4 t5 t6 t7", 4L),
      (1L, 2L, "t7 t8 t9 t10", 4L)))
  }

  test("chunkDocuments never emits a window contained in the previous one") {
    // 49..64-token docs at chunkSize=64/stride=48: one window covers all;
    // the old start rule emitted a second, fully-contained window
    val docs = Seq(
      (1L, (1 to 49).map(_ => "w").mkString(" ")),
      (2L, (1 to 64).map(_ => "w").mkString(" ")),
      (3L, (1 to 65).map(_ => "w").mkString(" "))).toDF("id", "text")
    val out = Chunking.chunkDocuments(docs, "id", "text", chunkSize = 64, stride = 48)
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
    // the 65-token doc's tail window still covers token 65 (starts at 48)
    val tail = Chunking.chunkDocuments(docs, "id", "text", chunkSize = 64, stride = 48)
      .filter("id = 3 and chunk_idx = 1").select("n_tokens").as[Long].head()
    assert(tail === 17L)
  }

  test("chunkDocuments: a doc shorter than one window is a single chunk") {
    val docs = Seq((1L, "a b")).toDF("id", "text")
    val out = Chunking.chunkDocuments(docs, "id", "text", chunkSize = 8, stride = 8)
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(out === Seq((1L, 0L, "a b", 2L)))
    assertThrows[IllegalArgumentException](
      Chunking.chunkDocuments(docs, "id", "text", chunkSize = 4, stride = 5))
  }

  test("packSequences lays docs head-to-tail per shard with boundary spans") {
    val docs = Seq(
      (1L, "a", (1 to 6).map(_ => "w").mkString(" ")),   // 6 tokens → seq 0, off 0
      (2L, "a", (1 to 5).map(_ => "w").mkString(" ")),   // seq 0, off 6 (spans into seq 1)
      (3L, "a", "w w"),                                  // cum 11 → seq 1, off 3
      (4L, "b", "w w w")).toDF("id", "shard", "text")    // fresh shard → seq 0, off 0
    val out = Chunking.packSequences(docs, "id", "text", capacity = 8, Seq("shard"))
      .orderBy("id")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, "a", 6L, 0L, 0L),
      (2L, "a", 5L, 0L, 6L),
      (3L, "a", 2L, 1L, 3L),
      (4L, "b", 3L, 0L, 0L)))
  }

  test("chunkDocuments drops NULL-text rows (documented policy)") {
    val docs = Seq((1L, Some("a b")), (2L, None)).toDF("id", "text")
    assert(Chunking.chunkDocuments(docs, "id", "text", 4, 4)
      .select("id").as[Long].collect().toSeq === Seq(1L))
  }

  test("packSequences: tied ids still get non-overlapping token ranges (ROWS frame)") {
    val docs = Seq((5L, "a", "w w"), (5L, "a", "w w w")).toDF("id", "shard", "text")
    val out = Chunking.packSequences(docs, "id", "text", capacity = 8, Seq("shard"))
      .select("n_tokens", "offset").as[(Long, Long)].collect().toSeq
      .map { case (n, off) => (off, off + n) }.sortBy(_._1)
    // contiguous, non-overlapping coverage of [0, 5) — the default RANGE
    // frame would put both rows at nonzero overlapping offsets
    assert(out.head._1 === 0L)
    assert(out(1)._1 === out.head._2)
    assert(out(1)._2 === 5L)
  }

  test("packSequences refuses an accidental global window") {
    val docs = Seq((1L, "w")).toDF("id", "text")
    assertThrows[IllegalArgumentException](
      Chunking.packSequences(docs, "id", "text", capacity = 8, Seq.empty))
    // explicit opt-in works
    assert(Chunking.packSequences(docs, "id", "text", capacity = 8, Seq.empty,
      allowGlobal = true).count() === 1)
  }
}
