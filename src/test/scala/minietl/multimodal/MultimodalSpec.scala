package minietl.multimodal

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs = Seq((1L, "hello world"), (2L, "abc"), (3L, ""))
    .toDF("doc_id", "text")

  test("fakeMedia produces the media schema with payload bytes") {
    val m = Multimodal.fakeMedia(docs, "doc_id", "text")
    assert(m.schema.fieldNames.toSeq === Seq("media_id", "content", "meta"))
    val r = m.filter(col("media_id") === 1).select("content").collect()(0)
    assert(new String(r.getAs[Array[Byte]](0), "UTF-8") === "hello world")
  }

  test("decodeStub is deterministic and bounded in [-1, 1)") {
    val f1 = Multimodal.decodeStub("hello".getBytes, 8)
    val f2 = Multimodal.decodeStub("hello".getBytes, 8)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.forall(v => v >= -1.0 && v < 1.0))
    assert(Multimodal.decodeStub(null, 4).length === 4)
  }

  test("decodeStub slot math matches the documented strided rolling hash") {
    // "abc" at dim 2: slot0 folds bytes {a=97, c=99}: (97*131+99)=12806;
    // slot1 folds {b=98}: 98. Scale: n/2^19 - 1 (exact doubles).
    val f = Multimodal.decodeStub("abc".getBytes, 2)
    assert(f(0) === 12806.0 / 524288.0 - 1.0)
    assert(f(1) === 98.0 / 524288.0 - 1.0)
    // order-sensitive within a stride
    assert(Multimodal.decodeStub("cba".getBytes, 2)(0) !== f(0))
  }

  test("extractFeatures yields declared schema, n_bytes, fixed-dim features") {
    val out = Multimodal.extractFeatures(Multimodal.fakeMedia(docs, "doc_id", "text"), 16)
    assert(out.schema.fieldNames.toSeq === Seq("media_id", "n_bytes", "features"))
    val rows = out.orderBy("media_id").collect()
    assert(rows.map(_.getLong(1)).toSeq === Seq(11L, 3L, 0L))
    assert(rows.forall(_.getSeq[Double](2).size === 16))
  }

  test("resize emits fixed-size payloads with refreshed meta") {
    val m = Multimodal.fakeMedia(docs, "doc_id", "text")
    val out = Multimodal.resize(m, targetBytes = 4).orderBy("media_id").collect()
    // non-empty payloads resample to exactly targetBytes; empty stays empty
    assert(out.take(2).forall(_.getAs[Array[Byte]]("content").length === 4))
    assert(out(2).getAs[Array[Byte]]("content").length === 0)
    assert(out.forall(_.getStruct(2).getString(0) === "fake/resized"))
    // deterministic: first byte of "hello world" survives nearest-neighbor
    assert(out(0).getAs[Array[Byte]]("content")(0) === 'h'.toByte)
    // empty payload resamples to zeros without error
    assert(Multimodal.resize(m.filter(col("media_id") === 3), 4).count() === 1)
  }

  test("sampleFrames explodes fixed slices and drops empty payloads") {
    val m = Multimodal.fakeMedia(Seq((1L, "abcdefgh")).toDF("doc_id", "text"), "doc_id", "text")
    val frames = Multimodal.sampleFrames(m, frames = 4).orderBy("frame_idx").collect()
    assert(frames.length === 4)
    val joined = frames.map(r => new String(r.getAs[Array[Byte]]("frame_bytes"), "UTF-8")).mkString
    assert(joined === "abcdefgh")
  }
}
