package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaDecoder, MediaRow}

/** Multimodal plumbing: payload/metadata schema, batched decode shape,
  * frame sampling, metadata resize. The decode itself is the documented
  * stub — these tests pin the Spark-side mechanics.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.sources.GraftSession.local()

  private def docs = {
    import spark.implicits._
    Seq((0L, "alpha beta gamma"), (1L, "delta epsilon"), (2L, "zeta eta theta"))
      .toDF("doc_id", "text")
  }

  test("mediaTable: 256-byte opaque payload + typed metadata, type cycles by doc_id") {
    val m = Multimodal.mediaTable(docs).collect()
    assert(m.map(_.getString(1)).toSeq == Seq("image", "audio", "video"))
    assert(m.forall(_.getAs[Array[Byte]]("payload").length == 256))
    val r0 = m.head
    assert(r0.getInt(2) == 32 && r0.getInt(3) == 32)
  }

  test("fake decoder: chunk-sum features, deterministic, fixed width") {
    val payload = Array.tabulate(256)(i => i.toByte)
    val f = MediaDecoder.fake.features(payload, 8)
    assert(f.length == 8)
    // chunk 0 = bytes 0..31 -> sum = 31*32/2 = 496
    assert(f(0) == 496.0 / 255.0)
    assert(f.toSeq == MediaDecoder.fake.features(payload, 8).toSeq)
  }

  test("real decoder is an explicit stub") {
    intercept[UnsupportedOperationException] {
      MediaDecoder.real.features(Array[Byte](1, 2, 3), 8)
    }
  }

  test("extractFeatures: mapPartitions pipeline preserves ids and emits n features") {
    import spark.implicits._
    val out = Multimodal.extractFeatures(
      Multimodal.mediaTable(docs).as[MediaRow], MediaDecoder.fake, 8).collect()
    assert(out.length == 3)
    assert(out.forall(_.features.length == 8))
    assert(out.forall(_.n_bytes == 256L))
    assert(out.map(_.doc_id).sorted.toSeq == Seq(0L, 1L, 2L))
  }

  test("sampleFrames: video-only, strided 32-byte frames") {
    import spark.implicits._
    val frames = Multimodal.sampleFrames(
        Multimodal.mediaTable(docs).as[MediaRow], stride = 3)
      .collect()
    // only doc 2 is video; 256/32 = 8 frames, stride 3 -> 0, 3, 6
    assert(frames.map(_.getLong(0)).distinct.toSeq == Seq(2L))
    assert(frames.map(_.getInt(1)).sorted.toSeq == Seq(0, 3, 6))
    assert(frames.forall(_.getAs[Array[Byte]]("frame_bytes").length == 32))
  }

  test("resizeMeta caps the max dimension, preserves aspect via floor") {
    val resized = Multimodal.resizeMeta(Multimodal.mediaTable(docs), maxDim = 64)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))).toMap
    // doc 0: 32x32 within cap -> unchanged
    assert(resized(0L) == ((32, 32)))
    // doc 1: 48x48 within cap
    assert(resized(1L) == ((48, 48)))
    // doc 2: 64x64 exactly at cap
    assert(resized(2L) == ((64, 64)))
  }

  private def phashOf(payloads: Seq[(Long, Array[Byte])], nPatch: Int): Map[Long, Seq[Long]] = {
    import spark.implicits._
    Multimodal.perceptualHash(
        payloads.toDF("doc_id", "payload").as[Multimodal.MediaBytes], nPatch)
      .collect().map(h => h.doc_id -> h.bands).toMap
  }

  private def hamming(a: Seq[Long], b: Seq[Long]): Int =
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum

  test("perceptualHash: tail bytes past the decoded grid are invisible; a point edit moves few bits") {
    val rnd = new scala.util.Random(7)
    val base = Array.fill[Byte](256)(rnd.nextInt(256).toByte)
    val tailed = base ++ Array.fill[Byte](16)(0x5a.toByte) // container re-encode
    val edited = base.clone(); (100 until 104).foreach(i => edited(i) = 0x7f.toByte)
    val other = Array.fill[Byte](256)(rnd.nextInt(256).toByte) // unrelated
    for (p <- Seq(64, 128, 256)) {
      val h = phashOf(Seq(0L -> base, 1L -> tailed, 2L -> edited, 3L -> other), p)
      assert(hamming(h(0L), h(1L)) == 0, s"tail append changed the hash at p=$p")
      // a 4-byte edit touches at most ceil(4 / chunk) patches; mean
      // movement can flip a few threshold-adjacent bits beyond them
      assert(hamming(h(0L), h(2L)) <= 8, s"point edit moved too many bits at p=$p")
      assert(hamming(h(0L), h(3L)) > p / 4, s"unrelated payloads too close at p=$p")
      // band packing: 8 bands, each value within its p/8-bit domain
      assert(h(0L).length == Multimodal.PHashBands)
      assert(h(0L).forall(v => v >= 0L && v < (1L << (p / 8))))
    }
  }

  test("phashPatches: width ladder holds bucket population, capped at the decode grid") {
    import Multimodal.{phashPatches, PHashBucketTarget}
    // boundary algebra: smallest p with target << (p/8) >= n
    assert(phashPatches(1L) == 64)
    assert(phashPatches(PHashBucketTarget.toLong << 8) == 64)
    assert(phashPatches((PHashBucketTarget.toLong << 8) + 1) == 128)
    assert(phashPatches(PHashBucketTarget.toLong << 16) == 128)
    assert(phashPatches((PHashBucketTarget.toLong << 16) + 1) == 256)
    assert(phashPatches(Long.MaxValue / 4) == 256) // grid cap
  }
}
