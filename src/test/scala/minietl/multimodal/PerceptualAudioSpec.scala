package minietl.multimodal

import minietl.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class PerceptualAudioSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** 228-sample (57 windows × 4) mono WAV whose energy-contour bits are
    * chosen exactly: window w's amplitude ascends over window w-1 iff bit
    * w-1 is requested (equal otherwise), so `bit(w) = E(w+1) > E(w)` is
    * the requested set.
    */
  private def bitWav(bits: Set[Int]): Array[Byte] = {
    val samples = new Array[Short](PerceptualAudio.Windows * 4)
    var amp = 100
    (0 until PerceptualAudio.Windows).foreach { w =>
      if (w > 0 && bits(w - 1)) amp += 10
      (0 until 4).foreach(k => samples(w * 4 + k) = amp.toShort)
    }
    Multimodal.pcm16Wav(samples, 8000)
  }

  test("energyHash56 of a real WAV decode matches the closed-form formula") {
    // replay the oracle arithmetic in Scala over the syntheticWavs family
    def expected(id: Long): Long = {
      val n = (300 + id % 101).toInt
      val a1 = (131 * id) % 20001 - 10000
      val a2 = (257 * id + 19) % 20001 - 10000
      def e(w: Int): Long = {
        val lo = w * n / 57; val hi = (w + 1) * n / 57
        val evens = (hi + 1) / 2 - (lo + 1) / 2
        val odds = hi / 2 - lo / 2
        evens * a1 * a1 + odds * a2 * a2
      }
      (0 until 56).map(w => if (e(w + 1) > e(w)) 1L << w else 0L).sum
    }
    val ids = Seq(0L, 1L, 7L, 42L, 100L, 257L, 999L)
    val wavs = Multimodal.syntheticWavs(ids.toDF("doc_id"), "doc_id")
      .select("media_id", "content").collect()
    wavs.foreach { r =>
      val id = r.getLong(0)
      val got = PerceptualAudio.energyHash56(r.getAs[Array[Byte]](1))
      assert(got === Some(expected(id)), s"id $id")
      assert(got.get >= 0L && got.get < (1L << 56))
    }
  }

  test("crafted contour bits round-trip through a real encode+decode") {
    val sets = Seq(Set.empty[Int], Set(0), Set(0, 1, 55), Set(13, 27, 41))
    sets.foreach { bits =>
      val got = PerceptualAudio.energyHash56(bitWav(bits))
      assert(got === Some(bits.map(1L << _).sum), s"bits $bits")
    }
  }

  test("dedupNear: exact dups collapse, transitive chains merge past " +
    "maxDist, far clips and undecodable rows survive") {
    val media = Seq(
      (1L, bitWav(Set())),            // canonical
      (2L, bitWav(Set())),            // exact dup of 1
      (3L, bitWav(Set(0))),           // dist 1 from 1
      (4L, bitWav(Set(0, 1))),        // dist 1 from 3, 2 from 1
      (5L, bitWav(Set(0, 1, 2, 3))),  // dist 2 from 4 — but 4 from 1!
      (6L, bitWav(Set(10, 20, 30, 40, 50))), // >= 4 from everything
      (7L, Array[Byte](1, 2, 3))      // undecodable — must pass through
    ).toDF("media_id", "content")
    val kept = PerceptualAudio.dedupNear(media, "media_id", "content")
      .select("media_id").as[Long].collect().toSet
    assert(kept === Set(1L, 6L, 7L))
    val kept1 = PerceptualAudio
      .dedupNear(media, "media_id", "content", maxDist = 1)
      .select("media_id").as[Long].collect().toSet
    assert(kept1 === Set(1L, 5L, 6L, 7L))
    // exact mode: only the byte-identical pair folds
    val keptExact = PerceptualAudio.dedupExact(media, "media_id", "content")
      .select("media_id").as[Long].collect().toSet
    assert(keptExact === Set(1L, 3L, 4L, 5L, 6L, 7L))
  }

  test("corrupt payloads never throw OR HANG: every truncation and " +
    "bit-flip of a real WAV degrades to None or a value — in the hash AND " +
    "in decodeAudio") {
    // this fuzz found a real hang: a bit-flipped header can declare a
    // frame geometry that makes AudioInputStream.readAllBytes spin on
    // 0-byte reads forever (observed 30+ min of CPU); both decode paths
    // now read through the bounded Multimodal.readPcmBounded
    val wav = bitWav(Set(3, 5))
    (0 until wav.length).foreach { n =>
      PerceptualAudio.energyHash56(java.util.Arrays.copyOf(wav, n))
      val flipped = wav.clone(); flipped(n) = (flipped(n) ^ 0x5a).toByte
      PerceptualAudio.energyHash56(flipped)
      Multimodal.decodeAudio(flipped)
    }
  }
}
