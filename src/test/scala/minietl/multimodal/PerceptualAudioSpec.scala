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

  /** Mono PCM_SIGNED WAV at an arbitrary byte-aligned bit depth (the JDK
    * WAVE writer accepts 8/16/24/32), little-endian samples.
    */
  private def pcmWav(samples: Array[Int], bits: Int, rate: Int = 8000): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val bps = bits / 8
    val pcm = new Array[Byte](samples.length * bps)
    var i = 0
    while (i < samples.length) {
      var b = 0
      while (b < bps) {
        pcm(i * bps + b) = ((samples(i) >> (8 * b)) & 0xff).toByte
        b += 1
      }
      i += 1
    }
    val fmt = new AudioFormat(rate.toFloat, bits, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("24/32-bit PCM does not overflow the energy fold: a wide clip " +
    "hashes identically to its 16-bit twin (ADVICE r15 #1)") {
    // the same waveform at three depths: 16-bit samples s, 24-bit s<<8,
    // 32-bit s<<16 — the uniform precision shift must recover the exact
    // 16-bit fold, so all three hashes are EQUAL. Full-scale amplitudes so
    // that, without the shift, a single 32-bit sample² (~2^62) wraps the
    // accumulator at the second sample and scrambles the contour.
    val s16 = Array.tabulate(PerceptualAudio.Windows * 4) { i =>
      val w = i / 4
      if (w % 3 == 0) 32000 else if (w % 3 == 1) -31000 else 500
    }
    val h16 = PerceptualAudio.energyHash56(pcmWav(s16, 16))
    assert(h16.isDefined && h16.get != 0L)
    assert(PerceptualAudio.energyHash56(pcmWav(s16.map(_ << 8), 24)) === h16)
    assert(PerceptualAudio.energyHash56(pcmWav(s16.map(_ << 16), 32)) === h16)
    // regression shape: a CONSTANT full-scale 32-bit clip has all window
    // energies equal -> hash 0; pre-fix the wrapped accumulators made the
    // comparisons effectively random
    val const32 = Array.fill(PerceptualAudio.Windows * 4)(Int.MaxValue & ~0xffff)
    assert(PerceptualAudio.energyHash56(pcmWav(const32, 32)) === Some(0L))
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
