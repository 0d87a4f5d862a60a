package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaDecoder, MediaRow}
import graft.sources.Tables

/** Multimodal-plumbing queries: a synthetic binary media table derived
  * from `documents` (real `binary` column + typed metadata), pushed
  * through the batched decode/featurize/frame-sample/resize stages. The
  * decode stub is deterministic (byte-chunk sums), so even these paths
  * have DuckDB oracles — the oracle recomputes the same features from the
  * payload's hex representation.
  */
object MultimodalQueries {

  final val NFeatures = 8

  private def media(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaTable(Tables.documents(s, dir))

  /** Payload hex (512 chars) as built by mediaTable — oracle-side mirror. */
  private val payloadHexSql: String =
    (0 until 16).map(j => s"md5(concat(text, ':$j'))").mkString("concat(", ", ", ")")

  private def featureSql(k: Int): String = {
    // chunk k covers bytes [k*32, k*32+32) = hex chars [k*64+1, +64)
    s"""CAST(list_aggregate(list_transform(generate_series(0, 31),
       |      i -> CAST(concat('0x', substr(hx, ${k * 64} + 2*i + 1, 2)) AS BIGINT)), 'sum') AS DOUBLE) / 255.0
       |    AS f$k""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Batched decode + featurize (mapPartitions, typed Dataset) — the
    // mapInPandas-shaped stage with the deterministic fake decoder.
    "mm_features" -> ((s, dir) => {
      import s.implicits._
      val rows = media(s, dir).as[MediaRow]
      val feats = Multimodal.extractFeatures(rows, MediaDecoder.fake, NFeatures).toDF()
      feats.select(
          Seq(col("doc_id"), col("media_type"), col("width"), col("height"), col("n_bytes")) ++
            (0 until NFeatures).map(k => element_at(col("features"), k + 1).as(s"f$k")): _*)
        .orderBy("doc_id")
    }),

    // BINARY CONTENT DEDUP — the multimodal form of dedup_exact: media
    // payloads fingerprinted by content hash, grouped, keeper = min id.
    // The op every crawl pipeline runs on images (the same picture is
    // re-hosted thousands of times); byte-identical payloads only —
    // perceptual near-dup is the embedding path (dedup_embedding over
    // visual embeddings). Runs over the dedup corpus so the planted
    // exact arm (+10M ids) yields real multi-copy groups. The hash is
    // computed on the payload bytes row-locally; only the 32-char fp
    // and ids shuffle, never the payloads.
    "mm_dedup" -> ((s, dir) => {
      val m = Multimodal.mediaTable(DedupQueries.corpus(s, dir))
      m.select(col("doc_id"), md5(lower(hex(col("payload")))).as("fp"))
        .groupBy("fp")
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
        .orderBy("fp")
    }),

    // Metadata-level resize: dimension math without touching payloads.
    "mm_resize" -> ((s, dir) =>
      Multimodal.resizeMeta(media(s, dir), maxDim = 64)
        .select("doc_id", "media_type", "width", "height", "out_width", "out_height")
        .orderBy("doc_id")),

    // Keyframe sampling from video payloads: binary slicing, hex out.
    "mm_frames" -> ((s, dir) => {
      import s.implicits._
      Multimodal.sampleFrames(media(s, dir).as[MediaRow], stride = 3)
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          lower(hex(col("frame_bytes"))).as("frame_hex"))
        .orderBy("doc_id", "frame_idx")
    })
  )

  def oracleSql: Map[String, String] = Map(

    // fp over the payload's lowercase hex — the oracle's payload IS
    // that hex (mediaTable unhexes the same md5 concat), so both
    // engines digest identical bytes
    "mm_dedup" ->
      s"""WITH ${graft.queries.DedupQueries.corpusCte}, hxt AS (
         |  SELECT doc_id, $payloadHexSql AS hx FROM corpus
         |)
         |SELECT md5(hx) AS fp, MIN(doc_id) AS keeper,
         |       CAST(COUNT(*) AS BIGINT) AS n_copies
         |FROM hxt GROUP BY fp ORDER BY fp""".stripMargin,

    "mm_features" ->
      s"""WITH hx AS (
         |  SELECT doc_id,
         |    ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
         |    CAST(32 + (doc_id % 8) * 16 AS INT) AS width,
         |    CAST(32 + (doc_id % 5) * 16 AS INT) AS height,
         |    $payloadHexSql AS hx
         |  FROM documents
         |)
         |SELECT doc_id, media_type, width, height,
         |  CAST(length(hx) / 2 AS BIGINT) AS n_bytes,
         |  ${(0 until NFeatures).map(featureSql).mkString(",\n  ")}
         |FROM hx ORDER BY doc_id""".stripMargin,

    "mm_resize" ->
      """SELECT doc_id,
        |  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
        |  CAST(32 + (doc_id % 8) * 16 AS INT) AS width,
        |  CAST(32 + (doc_id % 5) * 16 AS INT) AS height,
        |  CAST(FLOOR((32 + (doc_id % 8) * 16) * LEAST(CAST(1.0 AS DOUBLE),
        |       CAST(64 AS DOUBLE) / CAST(GREATEST(32 + (doc_id % 8) * 16, 32 + (doc_id % 5) * 16) AS DOUBLE))) AS INT) AS out_width,
        |  CAST(FLOOR((32 + (doc_id % 5) * 16) * LEAST(CAST(1.0 AS DOUBLE),
        |       CAST(64 AS DOUBLE) / CAST(GREATEST(32 + (doc_id % 8) * 16, 32 + (doc_id % 5) * 16) AS DOUBLE))) AS INT) AS out_height
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_frames" ->
      s"""WITH hx AS (
         |  SELECT doc_id, $payloadHexSql AS hx
         |  FROM documents WHERE doc_id % 3 = 2
         |), frames AS (
         |  SELECT doc_id, unnest(list_filter(generate_series(0, CAST(length(hx)/64 AS INT) - 1),
         |                        i -> i % 3 = 0)) AS frame_idx, hx
         |  FROM hx
         |)
         |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
         |       substr(hx, frame_idx * 64 + 1, 64) AS frame_hex
         |FROM frames ORDER BY doc_id, frame_idx""".stripMargin
  )
}
