package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, decoded and feature-extracted in
  * batched partition passes.
  *
  * The Spark-side mechanics are real and tested — schema, partitioning,
  * batch shape (`mapPartitions` over a typed Dataset, the Scala analog of
  * a Pandas-UDF `mapInPandas` pipeline: one JVM pass per partition,
  * amortized setup per batch, no per-row closure overhead). The actual
  * codec call is STUBBED: this container has no image/audio libraries, so
  * [[MediaDecoder.real]] is a clearly-marked placeholder and the pipeline
  * runs a deterministic fake whose output is reproducible in SQL (so even
  * the multimodal path is oracle-checked).
  *
  * Scale notes: payloads stay opaque through the scan (no decode unless a
  * query asks for features); decode parallelism is partition-level, so
  * `spark.sql.files.maxPartitionBytes` sizes the unit of work; metadata
  * predicates (media_type, dimensions) prune before any byte is touched.
  */
object Multimodal {

  /** One media object: typed metadata + opaque payload. */
  final case class MediaRow(
      doc_id: Long, media_type: String, width: Int, height: Int,
      payload: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long, media_type: String, width: Int, height: Int,
      n_bytes: Long, features: Seq[Double])

  /** Decoder seam. `real` is the production codec hook — intentionally
    * unimplemented here (no codec libs in this container); `fake` is the
    * deterministic stand-in used by queries and tests.
    */
  trait MediaDecoder extends Serializable {
    /** payload bytes -> fixed-width feature vector */
    def features(payload: Array[Byte], nFeatures: Int): Array[Double]
  }

  object MediaDecoder {
    /** Production decoder (libjpeg/ffmpeg/... binding). STUB. */
    val real: MediaDecoder = new MediaDecoder {
      def features(payload: Array[Byte], nFeatures: Int): Array[Double] =
        throw new UnsupportedOperationException(
          "real codecs unavailable in this environment — use MediaDecoder.fake")
    }

    /** Deterministic fake: feature k = (sum of unsigned bytes of chunk k)
      * / 255.0. Chunked exactly like a real patch/frame featurizer, and
      * cheap enough to oracle-check.
      */
    val fake: MediaDecoder = new MediaDecoder {
      def features(payload: Array[Byte], nFeatures: Int): Array[Double] = {
        val chunk = math.max(1, payload.length / nFeatures)
        Array.tabulate(nFeatures) { k =>
          val from = k * chunk
          val until = math.min(payload.length, from + chunk)
          var s = 0L
          var i = from
          while (i < until) { s += payload(i) & 0xff; i += 1 }
          s.toDouble / 255.0
        }
      }
    }
  }

  /** Synthesize a deterministic media table from `documents`: payload =
    * 16 chained md5 blocks of the text (256 opaque bytes), media_type and
    * dimensions derived from doc_id. Stands in for a real
    * `spark.read.format("binaryFile")` scan.
    */
  def mediaTable(docs: DataFrame): DataFrame = {
    val hexBlocks = (0 until 16).map(j => md5(concat(col("text"), lit(s":$j"))))
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      (lit(32) + (col("doc_id") % 8) * 16).cast("int").as("width"),
      (lit(32) + (col("doc_id") % 5) * 16).cast("int").as("height"),
      unhex(concat(hexBlocks: _*)).as("payload"))
  }

  /** Batched decode + featurize over partitions — the mapInPandas-shaped
    * stage. Decoder instantiated once per partition (amortized setup),
    * rows streamed through it.
    */
  def extractFeatures(media: Dataset[MediaRow], decoder: MediaDecoder,
                      nFeatures: Int): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.doc_id, r.media_type, r.width, r.height,
          r.payload.length.toLong,
          decoder.features(r.payload, nFeatures).toSeq)
      }
    }
  }

  /** Band split of [[perceptualHash]]: patch bits pack as 8 bands of
    * nPatch/8 bits. 8 bands make Hamming-&le;7 banding recall EXACT by
    * pigeonhole (a pair differing in at most 7 bits leaves at least one
    * band untouched), so any verify threshold below 8 needs no
    * multi-probe and the banded candidate set equals the all-pairs one
    * AT EVERY width — widening the hash only shrinks bucket
    * populations, never recall.
    */
  final val PHashBands = 8

  /** [[phashPatches]]' per-band-bucket population target. */
  final val PHashBucketTarget = 64

  /** The width&harr;scale rule (the `knnScaledBits` treatment for the
    * perceptual-hash space): smallest patch count whose per-band bucket
    * space holds the corpus at ~[[PHashBucketTarget]] rows per bucket —
    * band width is nPatch/8 bits, so buckets per band = 2^(nPatch/8).
    * At a FIXED width the (band, key) candidate join is
    * N²/2^(nPatch/8): quadratic — the 10x probe read 55x before this
    * rule. Capped at 256 because this container's fake decode grid is
    * the 256-byte payload (1 byte/patch floor); a real decoder at
    * production payload sizes extends the ladder (the patch grid is
    * whatever the decode seam emits).
    */
  def phashPatches(n: Long): Int =
    Seq(64, 128, 256)
      .find(p => (PHashBucketTarget.toLong << (p / 8)) >= n)
      .getOrElse(256)

  /** Media row reduced to what perceptual hashing needs. */
  final case class MediaBytes(doc_id: Long, payload: Array[Byte])

  /** doc_id + the 8 per-band values of its nPatch-bit perceptual hash. */
  final case class MediaPHash(doc_id: Long, bands: Seq[Long])

  /** Average-hash perceptual fingerprint (the aHash member of the
    * pHash family: patch intensities vs their global mean — Zauner,
    * "Implementation and Benchmarking of Perceptual Image Hash
    * Functions", 2010): the payload is decoded to an `nPatch`-patch
    * intensity grid (here: the deterministic fake decoder's integer
    * chunk sums — the production pHash swaps in a real decode + DCT at
    * [[MediaDecoder.real]]'s seam), bit k = 1 iff nPatch*s_k > Σs
    * (all-integer, so the tie behaviour is exact on every engine),
    * packed into [[PHashBands]] band values for Hamming banding.
    * Row-local mapPartitions — payload bytes NEVER leave their
    * partition; only the 8 band ints shuffle (the mm_dedup discipline).
    * `nPatch` must be a multiple of [[PHashBands]]; derive it from the
    * corpus size via [[phashPatches]] so bucket populations hold as the
    * corpus grows.
    *
    * Robustness model (what makes it PERCEPTUAL rather than exact): any
    * byte change outside the decoded grid (container/metadata tails) is
    * invisible; a localized content edit moves one patch sum and the
    * global mean, flipping only bits near the mean threshold — small
    * Hamming distance — while unrelated payloads land ~nPatch/2 apart.
    */
  def perceptualHash(media: Dataset[MediaBytes], nPatch: Int): Dataset[MediaPHash] = {
    require(nPatch % PHashBands == 0, s"nPatch $nPatch not a multiple of $PHashBands")
    implicit val enc = Encoders.product[MediaPHash]
    media.mapPartitions { rows =>
      rows.map { r =>
        val p = r.payload
        val chunk = math.max(1, p.length / nPatch)
        val sums = Array.tabulate(nPatch) { k =>
          val from = k * chunk
          val until = math.min(p.length, from + chunk)
          var s = 0L
          var i = from
          while (i < until) { s += p(i) & 0xff; i += 1 }
          s
        }
        val total = sums.sum
        val perBand = nPatch / PHashBands
        val bands = Array.tabulate(PHashBands) { b =>
          var v = 0L
          var j = 0
          while (j < perBand) {
            if (nPatch.toLong * sums(b * perBand + j) > total) v |= (1L << j)
            j += 1
          }
          v
        }
        MediaPHash(r.doc_id, bands.toSeq)
      }
    }
  }

  /** Frame sampling for video rows: every `stride`-th 32-byte block of
    * the payload becomes a "frame" (mirrors keyframe extraction: metadata
    * row per frame, payload slice as the frame bytes).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.toDF()
      .filter(col("media_type") === "video")
      .withColumn("n_frames", floor(length(col("payload")) / lit(32)).cast("int"))
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), col("n_frames") - 1), i => i % lit(stride) === 0)))
      .select(col("doc_id"), col("frame_idx"),
        expr("substring(payload, frame_idx * 32 + 1, 32)").as("frame_bytes"))
  }

  /** Metadata-level resize (the cheap path real pipelines take before
    * decode): scale dimensions, payload untouched.
    */
  def resizeMeta(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim).cast("double") / greatest(col("width"), col("height")).cast("double"))
    media
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }
}
