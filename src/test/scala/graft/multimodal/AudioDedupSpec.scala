package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Audio near-dup tier ([[AudioDedup]]): the energy-delta hash is
  * invariant to resampling and amplitude scaling, separates distinct
  * material, and the banded pair/keep machinery mirrors the image
  * tier's. */
class AudioDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wavBytes(sampleRate: Int, samples: Seq[Short]): Array[Byte] = {
    val data = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { data.write(v & 0xff); data.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    def ascii(s: String): Unit = data.write(s.getBytes("US-ASCII"))
    val dataLen = samples.length * 2
    ascii("RIFF"); le32(36 + dataLen); ascii("WAVE")
    ascii("fmt "); le32(16)
    le16(1); le16(1) // PCM, mono
    le32(sampleRate); le32(sampleRate * 2)
    le16(2); le16(16)
    ascii("data"); le32(dataLen)
    samples.foreach(s => le16(s & 0xffff))
    data.toByteArray
  }

  /** A time-parametric waveform (so re-synthesizing at another rate IS a
    * resampled copy): a tone whose AMPLITUDE ENVELOPE walks a seeded
    * random staircase over 65 equal time slots — strong energy margins
    * between adjacent frames, seed-distinct envelopes. */
  private def clip(seed: Int, rate: Int, seconds: Double = 1.0,
                   gain: Double = 1.0): Array[Byte] = {
    val rnd = new java.util.Random(seed * 104729L + 7)
    val env = Array.fill(65)(0.1 + 0.9 * rnd.nextDouble())
    val n = (rate * seconds).toInt
    val samples = (0 until n).map { i =>
      val slot = ((i.toLong * 65) / n).toInt
      val t = i.toDouble / rate
      val v = gain * env(slot) * math.sin(2 * math.Pi * 440 * t)
      (v * 16384).toShort
    }
    wavBytes(rate, samples)
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("aHash invariances: a resampled copy and an amplitude-scaled copy " +
    "stay within 3 bits; distinct envelopes are far apart; garbage and " +
    "too-short clips produce no hash") {
    val h0 = AudioDedup.aHash(clip(1, 16000)).get
    val hResampled = AudioDedup.aHash(clip(1, 8000)).get
    val hScaled = AudioDedup.aHash(clip(1, 16000, gain = 0.5)).get
    assert(hamming(h0, hResampled) <= 3,
      s"resampling moved ${hamming(h0, hResampled)} bits")
    assert(hamming(h0, hScaled) <= 3,
      s"amplitude scaling moved ${hamming(h0, hScaled)} bits")
    val hOther = AudioDedup.aHash(clip(2, 16000)).get
    assert(hamming(h0, hOther) > 10,
      s"distinct envelopes only ${hamming(h0, hOther)} bits apart")
    assert(AudioDedup.aHash(Array.fill[Byte](64)(7)).isEmpty)
    assert(AudioDedup.aHash(null).isEmpty)
    assert(AudioDedup.aHash(wavBytes(8000, Seq.fill(32)(100: Short))).isEmpty,
      "sub-65-sample clip must not fingerprint")
  }

  test("nearDupPairs + dedupAudio: planted variants pair and collapse to " +
    "one survivor (largest payload), distinct and garbage rows pass") {
    val rows = Seq(
      (1L, clip(1, 16000)),            // base
      (2L, clip(1, 8000)),             // resampled copy (smaller payload)
      (3L, clip(1, 16000, gain = 0.5)), // scaled copy
      (4L, clip(2, 16000)),            // distinct
      (9L, Array.fill[Byte](100)(3))   // garbage
    ).toDF("media_id", "media")
    val pairs = AudioDedup.nearDupPairs(rows, "media", "media_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)), s"scaled copy unpaired: $pairs")
    assert(pairs.exists(p => p._1 == 2L || p._2 == 2L),
      s"resampled copy unpaired: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"distinct clip paired: $pairs")
    assert(!pairs.exists(p => p._1 == 9L || p._2 == 9L),
      s"garbage paired: $pairs")
    val out = AudioDedup.dedupAudio(rows, "media", "media_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 9L))
    assert(Set(1L, 2L, 3L).map(out(_)._1).size == 1,
      s"variants split across components: $out")
    val kept = out.filter(_._2._2).keySet
    // 16 kHz clips carry the most samples -> ids 1 and 3 tie on payload
    // size? no: same rate+length => same bytes; 1 < 3 wins the tie
    assert(kept == Set(1L, 4L, 9L), s"keep policy broke: $kept")
  }

  test("streaming twin (IncrementalAudioDedup): cross-batch variants " +
    "drop against stored claims, replay reproduces, reopened store " +
    "persists") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-audiodedup").toString
    val d = new graft.streaming.IncrementalAudioDedup(spark, root)
    d.init()
    val b1 = Seq(
      (1L, clip(1, 16000)),
      (2L, clip(1, 8000)),           // resampled near-dup of 1
      (3L, clip(2, 16000)),
      (9L, Array.fill[Byte](40)(5))  // garbage passes unexamined
    ).toDF("media_id", "media")
    val out1 = d.filterAndClaim(b1, "media", "media_id")
      .select("media_id").as[Long].collect().toSet
    assert(out1 == Set(1L, 3L, 9L), s"batch-1 keep set: $out1")
    val b2 = Seq(
      (10L, clip(1, 16000, gain = 0.7)), // scaled copy of batch-1's 1
      (11L, clip(3, 16000))              // new material
    ).toDF("media_id", "media")
    val out2 = d.filterAndClaim(b2, "media", "media_id")
      .select("media_id").as[Long].collect().toSet
    assert(out2 == Set(11L), s"batch-2 keep set: $out2")
    assert(d.filterAndClaim(b2, "media", "media_id").count() == 1L,
      "replay diverged")
    val d2 = new graft.streaming.IncrementalAudioDedup(spark, root)
    d2.init()
    assert(d2.filterAndClaim(
      Seq((20L, clip(1, 16000))).toDF("media_id", "media"),
      "media", "media_id").count() == 0L,
      "reopened store must still hold batch-1's claims")
  }
}
