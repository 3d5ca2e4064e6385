package minietl.multimodal

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PerceptualHashSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Closed-form dHash56 straight from the gradient formula — the same
    * arithmetic the DuckDB oracle runs, written independently of the
    * production decode path.
    */
  private def expectedHash(id: Long): Long = {
    val w = (8 + id % 5).toInt; val h = (8 + id % 4).toInt
    val a = (1 + (id * 7) % 251).toInt; val b = (1 + (id * 13) % 249).toInt
    val c = (id % 256).toInt
    def gray(x: Int, y: Int) = (a * x + b * y + c) % 256
    var hash = 0L
    for (j <- 0 until 8; i <- 0 until 7) {
      val g1 = gray((i + 1) * w / 8, j * h / 8)
      val g0 = gray(i * w / 8, j * h / 8)
      if (g1 > g0) hash |= 1L << (j * 7 + i)
    }
    hash
  }

  test("dHash56 of a real PNG decode matches the closed-form formula") {
    (0L until 40L).foreach { id =>
      val w = (8 + id % 5).toInt; val h = (8 + id % 4).toInt
      val png = PerceptualHash.gradientPng(w, h, (1 + (id * 7) % 251).toInt,
        (1 + (id * 13) % 249).toInt, (id % 256).toInt)
      assert(PerceptualHash.dHash56(png) === Some(expectedHash(id)),
        s"id=$id")
    }
  }

  test("dHash56 stays in [0, 2^56) — never sign-wraps") {
    (0L until 200L).foreach { id =>
      val hsh = expectedHash(id)
      assert(hsh >= 0L && hsh < (1L << 56))
    }
  }

  test("undecodable payloads yield null hash rows") {
    val media = Seq((1L, Array[Byte](1, 2, 3)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "content")
    val out = PerceptualHash.dHashes(media).collect()
    assert(out.length === 2)
    out.foreach(r => assert(r.isNullAt(r.fieldIndex("dhash"))))
  }

  test("dedupNear: exact dups collapse, transitive chains merge past " +
    "maxDist, far images and undecodable rows survive") {
    // 8x8 images whose dHash bits are chosen exactly: pixel (i+1, j)
    // ascends over (i, j) iff bit j*7+i is requested (w=h=8 makes the
    // sampling grid the identity)
    def bitImg(bits: Set[Int]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 8).foreach { j =>
        var v = 100
        img.setRGB(0, j, v * 0x010101)
        (0 until 7).foreach { i =>
          if (bits(j * 7 + i)) v += 10
          img.setRGB(i + 1, j, v * 0x010101)
        }
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, bitImg(Set())),            // canonical
      (2L, bitImg(Set())),            // exact dup of 1
      (3L, bitImg(Set(0))),           // dist 1 from 1
      (4L, bitImg(Set(0, 1))),        // dist 1 from 3, 2 from 1
      (5L, bitImg(Set(0, 1, 2, 3))),  // dist 2 from 4 — but 4 from 1!
      (6L, bitImg(Set(10, 20, 30, 40, 50))), // >= 4 from everything
      (7L, Array[Byte](1, 2, 3))      // undecodable — must pass through
    ).toDF("media_id", "content")
    val kept = PerceptualHash.dedupNear(media, "media_id", "content")
      .select("media_id").as[Long].collect().toSet
    // 5 is dropped only through the 1-3-4-5 chain (dist(1,5)=4 > maxDist):
    // transitivity is what this asserts
    assert(kept === Set(1L, 6L, 7L))
    // tighter dial: maxDist=1 breaks the 4-5 link, 5 survives
    val kept1 = PerceptualHash.dedupNear(media, "media_id", "content", maxDist = 1)
      .select("media_id").as[Long].collect().toSet
    assert(kept1 === Set(1L, 5L, 6L, 7L))
  }

  test("corrupt payloads never throw: every truncation/bit-flip of a real " +
    "PNG and GIF degrades to None (NonFatal contract, ADVICE r14)") {
    // ImageIO readers throw RuntimeExceptions (not just IOException) on
    // malformed real-world images; sweep every truncation length and a
    // byte-flip at every offset through the REAL decode paths and require
    // the hash to degrade to None or a value — never an escaped exception
    val png = PerceptualHash.gradientPng(9, 10, 7, 13, 5)
    val gif = {
      val img = new java.awt.image.BufferedImage(
        9, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 10).foreach(y => (0 until 9).foreach(x =>
        img.setRGB(x, y, (7 * x + 13 * y + 5) % 256 * 0x010101)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "gif", bos)
      bos.toByteArray
    }
    Seq(png, gif).foreach { bytes =>
      (0 until bytes.length).foreach { n =>
        PerceptualHash.dHash56(java.util.Arrays.copyOf(bytes, n)) // must not throw
        val flipped = bytes.clone(); flipped(n) = (flipped(n) ^ 0x5a).toByte
        PerceptualHash.dHash56(flipped) // must not throw
      }
    }
  }

  test("banded hammingPairs equals brute-force all-pairs for distance 1..3") {
    // crafted fixture: clusters of bit-flipped variants around distinct
    // bases, flips spread across DIFFERENT 14-bit bands (the adversarial
    // case for a banded join), plus exact dups (distance 0, must NOT
    // appear) and isolated far-away hashes
    val rnd = new scala.util.Random(7)
    val bases = Seq.fill(6)(rnd.nextLong() & ((1L << 56) - 1))
    val rows = bases.zipWithIndex.flatMap { case (base, g) =>
      Seq(
        (g * 100L + 0L, base),
        (g * 100L + 1L, base ^ (1L << 3)),                        // d=1, band 0
        (g * 100L + 2L, base ^ (1L << 15) ^ (1L << 29)),          // d=2, bands 1+2
        (g * 100L + 3L, base ^ (1L << 2) ^ (1L << 30) ^ (1L << 45)), // d=3, 3 bands
        (g * 100L + 4L, base),                                    // exact dup: d=0
        (g * 100L + 5L, ~base & ((1L << 56) - 1)))                // far away
    }
    val hashes = rows.toDF("media_id", "dhash")
    val banded = PerceptualHash.hammingPairs(hashes, "media_id", "dhash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d >= 1 && d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(brute.size >= 6 * 6, "fixture must produce near-dup pairs")
    assert(banded === brute)
  }

  test("gradient corpus near-dups at corpus scale match brute force") {
    // the real corpus path end-to-end (decode → hash → band join) over a
    // stride of ids wide enough that parameter patterns actually recur
    val ids = spark.range(0, 300).select((col("id") * 37L).as("doc_id"))
    val imgs = PerceptualHash.syntheticGradientImages(ids, "doc_id")
    val hashes = PerceptualHash.dHashes(imgs).cache()
    val banded = PerceptualHash.hammingPairs(hashes, "media_id", "dhash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hs = hashes.collect().map(r => (r.getLong(0), r.getLong(3)))
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d >= 1 && d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(banded === brute)
    hashes.unpersist()
  }

  test("over-cap band buckets are dropped from pairing (census contract)") {
    // 30 hashes sharing band 0's value (and everything else) would give
    // C(30,2) pairs at distance 1; a cap of 10 on that bucket must kill
    // them, while a small disjoint cluster in a different value survives
    val hot = (0L until 30L).map(i => (i, 0L ^ (if (i % 2 == 0) 0L else 1L << 2)))
    // the cool pair's band-0 and band-1 values (5 and 9) are UNIQUE to it,
    // so its own buckets stay size-2 even though it shares the all-zero
    // band-3 bucket with the hot cluster
    val cool = Seq((100L, 5L | (9L << 14)), (101L, (5L | (9L << 14)) ^ (1L << 30)))
    val hashes = (hot ++ cool).toDF("media_id", "dhash")
    val capped = PerceptualHash.hammingPairs(hashes, "media_id", "dhash", 3,
      maxBucketSize = 10).collect()
    // the hot cluster shares EVERY band value (bands 1-3 are all zero for
    // both variants; band 0 differs between the two variants but each
    // variant's bucket alone exceeds 10) — all its pairs must vanish
    assert(capped.forall(r => r.getLong(0) >= 100L),
      s"hot-bucket pairs survived: ${capped.mkString(",")}")
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((100L, 101L)))
    // with the cap above the bucket sizes, the same fixture yields the
    // full brute-force pair set again
    val uncapped = PerceptualHash.hammingPairs(hashes, "media_id", "dhash", 3,
      maxBucketSize = 1000).count()
    assert(uncapped > 100)
  }

  test("maxDist beyond the pigeonhole guarantee is rejected") {
    val hashes = Seq((1L, 0L)).toDF("media_id", "dhash")
    intercept[IllegalArgumentException] {
      PerceptualHash.hammingPairs(hashes, "media_id", "dhash", 4)
    }
  }
}
