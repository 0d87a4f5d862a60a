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

  /** mm_near_dup verify threshold — well under the ~32 expected Hamming
    * distance of unrelated 64-bit hashes, and under [[Multimodal
    * .PHashBands]] so the banding is recall-exact (pigeonhole).
    */
  final val PHashHammingMax = 6

  private def media(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaTable(Tables.documents(s, dir))

  /** mm_near_dup's corpus: the base media payloads plus the two planted
    * re-encode arms (built in HEX land so the DuckDB oracle constructs
    * byte-identical payloads from the same md5 chain).
    */
  private[graft] def nearDupMedia(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val hx = concat((0 until 16).map(j => md5(concat(col("text"), lit(s":$j")))): _*)
    val base = docs.select(col("doc_id"), unhex(hx).as("payload"))
    // container re-encode: appended block sits past the decoded grid
    val armA = docs.filter(col("doc_id") % 7 === 5)
      .select((col("doc_id") + 20000000L).as("doc_id"),
        unhex(concat(hx, md5(lit("reenc-tail")))).as("payload"))
    // content edit: bytes 100..103 (hex chars 201..208) overwritten —
    // exactly one patch of the 64-patch grid moves
    val armB = docs.filter(col("doc_id") % 11 === 3)
      .select((col("doc_id") + 30000000L).as("doc_id"),
        unhex(concat(substring(hx, 1, 200), lit("deadbeef"),
          substring(hx, 209, 1000000))).as("payload"))
    base.unionByName(armA).unionByName(armB)
  }

  /** The shared perceptual-pair pipeline (derived-width hash, banded
    * candidates, Hamming verify) — one definition for mm_near_dup and
    * mm_dedup_clusters. Returns (corpus ids, verified pairs
    * (id_a, id_b, hamming), patch count).
    */
  private def nearDupPairs(s: SparkSession, dir: String): (DataFrame, DataFrame, Int) = {
    import s.implicits._
    // materialize once: the md5x16 + unhex payload build otherwise
    // re-runs for the width count, the hash pass, and (in
    // mm_dedup_clusters) the node set
    val media = nearDupMedia(s, dir).localCheckpoint(true)
    val nPatch = Multimodal.phashPatches(media.count())
    val ph = Multimodal.perceptualHash(
        media.as[Multimodal.MediaBytes], nPatch)
      .toDF().localCheckpoint(true) // feeds banding + both verify sides
    val banded = ph.withColumn("keys",
      array((0 until Multimodal.PHashBands).map(b =>
        element_at(col("bands"), b + 1)): _*))
    val pairs = graft.operators.Dedup.candidatePairs(
      banded, "doc_id", "keys", Int.MaxValue)
    val ham = (0 until Multimodal.PHashBands).map(b =>
      bit_count(element_at(col("bands_a"), b + 1)
        .bitwiseXOR(element_at(col("bands_b"), b + 1))).cast("long"))
      .reduce(_ + _)
    val verified = pairs
      .join(ph.select(col("doc_id").as("id_a"), col("bands").as("bands_a")), "id_a")
      .join(ph.select(col("doc_id").as("id_b"), col("bands").as("bands_b")), "id_b")
      .withColumn("hamming", ham)
      .filter(col("hamming") <= PHashHammingMax)
      .select("id_a", "id_b", "hamming")
    (media.select("doc_id"), verified, nPatch)
  }

  /** Payload hex (512 chars) as built by mediaTable — oracle-side mirror. */
  private val payloadHexSql: String =
    (0 until 16).map(j => s"md5(concat(text, ':$j'))").mkString("concat(", ", ", ")")

  private def featureSql(k: Int): String = {
    // chunk k covers bytes [k*32, k*32+32) = hex chars [k*64+1, +64)
    s"""CAST(list_aggregate(list_transform(generate_series(0, 31),
       |      i -> CAST(concat('0x', substr(hx, ${k * 64} + 2*i + 1, 2)) AS BIGINT)), 'sum') AS DOUBLE) / 255.0
       |    AS f$k""".stripMargin
  }

  /** mnd (hex corpus + arms), nd_p (derived width), ph (per-band hash
    * values), mm_pairs (all-pairs Hamming verify) — the oracle mirror
    * of [[nearDupPairs]], shared by mm_near_dup and mm_dedup_clusters.
    * `basePred` filters the BASE leg (the retraction oracle's
    * corpus-without); the width in nd_p always derives from the FULL
    * population — the frozen-width contract (a takedown never
    * retrains), mirrored by the Spark side freezing nPatch before any
    * delete.
    */
  private def mmNearDupCtes: String = mmNearDupCtesOver("TRUE")

  private def mmNearDupCtesOver(basePred: String): String =
    s"""mnd AS (
       |  SELECT doc_id, $payloadHexSql AS hx FROM documents WHERE $basePred
       |  UNION ALL
       |  SELECT doc_id + 20000000, concat($payloadHexSql, md5('reenc-tail'))
       |  FROM documents WHERE doc_id % 7 = 5
       |  UNION ALL
       |  SELECT doc_id + 30000000,
       |    concat(substr($payloadHexSql, 1, 200), 'deadbeef', substr($payloadHexSql, 209))
       |  FROM documents WHERE doc_id % 11 = 3
       |), nd_p AS (
       |  SELECT CAST(COALESCE(MIN(p), 256) AS INT) AS p FROM (
       |    SELECT UNNEST([64, 128, 256]) AS p
       |  ) pp
       |  WHERE (CAST(${Multimodal.PHashBucketTarget} AS BIGINT) << (p // 8))
       |          >= (SELECT (SELECT COUNT(*) FROM documents)
       |              + (SELECT COUNT(*) FROM documents WHERE doc_id % 7 = 5)
       |              + (SELECT COUNT(*) FROM documents WHERE doc_id % 11 = 3))
       |), ph AS (
       |  SELECT doc_id,
       |    list_transform(generate_series(0, 7), b ->
       |      list_aggregate(list_transform(generate_series(0, pb - 1), j ->
       |        CASE WHEN np * sums[pb * b + j + 1] > total
       |             THEN (CAST(1 AS BIGINT) << j) ELSE 0 END),
       |        'sum')) AS bands
       |  FROM (
       |    SELECT doc_id, sums, list_aggregate(sums, 'sum') AS total, np, pb
       |    FROM (
       |      SELECT doc_id, np, np // 8 AS pb,
       |        list_transform(generate_series(0, np - 1), k ->
       |          list_aggregate(list_transform(generate_series(0, ch - 1), i ->
       |            CAST(concat('0x', substr(hx, (k * ch + i) * 2 + 1, 2)) AS BIGINT)),
       |            'sum')) AS sums
       |      FROM (SELECT doc_id, hx, (SELECT p FROM nd_p) AS np,
       |                   GREATEST(1, (length(hx) // 2) // (SELECT p FROM nd_p)) AS ch
       |            FROM mnd) z
       |    ) y
       |  ) x
       |), mm_pairs AS (
       |  SELECT id_a, id_b, hamming FROM (
       |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |      CAST(list_aggregate(list_transform(generate_series(1, 8), j ->
       |        bit_count(xor(a.bands[j], b.bands[j]))), 'sum') AS BIGINT) AS hamming
       |    FROM ph a JOIN ph b ON a.doc_id < b.doc_id
       |  ) p WHERE hamming <= $PHashHammingMax
       |)""".stripMargin

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

    // PERCEPTUAL media near-dup — the operator real crawls need most on
    // media columns: the dominant duplicate mode is not byte-identical
    // re-posts (mm_dedup's case) but RE-ENCODED re-hosts — same
    // content, different bytes. Two planted arms model it: a container
    // re-encode (+20M ids — one appended md5 block: payload bytes
    // differ, decoded grid untouched, Hamming 0, invisible to
    // mm_dedup) and a localized content edit (+30M ids — 4 bytes
    // overwritten mid-payload: one patch moves, Hamming small). The
    // pipeline is the dedup_simhash shape on the perceptual hash:
    // row-local fingerprint (payloads never shuffle — only 8 band ints
    // leave the scan), (band, key) equi-join candidates, Hamming
    // verify. The hash WIDTH derives from a corpus count
    // (Multimodal.phashPatches — the knnScaledBits rule): per-band
    // bucket population holds ~constant as the corpus grows, keeping
    // the candidate join linear (the fixed 64-bit form read 55x at the
    // 10x probe; the derived width is the registered form). 8 bands
    // at ANY width are recall-exact for the <=PHashHammingMax verify by
    // pigeonhole, so the banded plan stays bit-identical to the
    // oracle's all-pairs reference, and the width is SURFACED as an
    // n_patches column (the sim_knn_graph stride discipline).
    "mm_near_dup" -> ((s, dir) => {
      val (_, verified, nPatch) = nearDupPairs(s, dir)
      verified
        .select(col("id_a"), col("id_b"), col("hamming"),
          lit(nPatch.toLong).as("n_patches"))
        .orderBy("id_a", "id_b")
    }),

    // The MAINTAINED perceptual index — mm_near_dup's (band, key)
    // signature space persisted and fed by probe-then-append ingests
    // (the dedup_incremental treatment for media): trainPhash FREEZES
    // the hash width from the corpus-snapshot count (the frozen-
    // codebook rule — a batch can never fork the hash family; the
    // documented re-index trigger fires when growth crosses the next
    // phashPatches threshold, see AnnIndex.trainPhash), then each
    // ingest PROBES the store first — verified pairs against the index
    // plus within the batch, the index read partition-pruned to the
    // batch's key dirs — and APPENDS its posting rows after. Postings
    // are additive state, so the append is the SegmentStore shape:
    // O(batch), zero reads of existing state (unlike the key-replace
    // minhash/PQ upserts). Every pair surfaces at exactly the ingest
    // where its second member arrives, so the accumulated probe
    // outputs converge to the one-shot mm_near_dup pair set — the
    // same oracle hash-gates both. Fixed-batch probe cost is bounded
    // by bucket populations, held at ~PHashBucketTarget by the frozen
    // width until the re-index trigger.
    "mm_near_dup_incremental" -> ((s, dir) => {
      val idxDir = graft.sources.TempDirs.scratch("graft_phidx_")
      val media = nearDupMedia(s, dir).localCheckpoint(true)
      val nPatch = Multimodal.phashPatches(media.count())
      graft.sources.AnnIndex.trainPhash(s, idxDir, nPatch)
      val pairs = (0 until 3).map { i =>
        val b = media.filter(pmod(col("doc_id"), lit(3L)) === i)
        // hash the round's batch ONCE (payload decode + banding), then
        // probe and append off the same staged frame
        val staged = graft.sources.AnnIndex.stagePhashBatch(s, idxDir, b)
        // materialize the probe BEFORE the append mutates the store it
        // reads — load-bearing, not an optimization
        val p = graft.sources.AnnIndex
          .probePhashStaged(s, idxDir, staged, PHashHammingMax)
          .localCheckpoint(true)
        graft.sources.AnnIndex.upsertPhashStaged(s, idxDir, staged)
        p
      }.reduce(_ unionByName _)
      pairs
        .select(col("id_a"), col("id_b"), col("hamming"),
          lit(nPatch.toLong).as("n_patches"))
        .orderBy("id_a", "id_b")
    }),

    // TAKEDOWN on the perceptual posting store
    // ([[graft.sources.AnnIndex.deletePhash]]) — the media takedown
    // (DMCA/CSAM) semantics: the store holds the base corpus + the
    // content-edit arm; the re-encode arm's SOURCE payloads (base
    // doc_id % 7 = 5) are then retracted — touched key-directory
    // rewrites only, width FROZEN (a takedown never retrains) — and
    // the re-encode arm arrives as tomorrow's probe batch. Every
    // re-encode previously byte-matched its source (Hamming 0); post-
    // takedown those matches are GONE, and a re-encode pairs only
    // where a SURVIVING near-copy of its content exists (its source
    // also carried the %11 content edit — the armB-mediated residual),
    // which is exactly what "the payload was taken down" must mean:
    // re-uploads are caught by surviving evidence only. Oracle:
    // all-pairs at the frozen width over the corpus-without, restricted
    // to pairs touching the probe arm.
    "mm_near_dup_retract" -> ((s, dir) => {
      val idxDir = graft.sources.TempDirs.scratch("graft_phdel_")
      val media = nearDupMedia(s, dir).localCheckpoint(true)
      val nPatch = Multimodal.phashPatches(media.count()) // frozen pre-delete
      graft.sources.AnnIndex.trainPhash(s, idxDir, nPatch)
      val armA = media.filter(col("doc_id") >= 20000000L &&
        col("doc_id") < 30000000L)
      graft.sources.AnnIndex.upsertPhash(s, idxDir,
        media.filter(col("doc_id") < 20000000L || col("doc_id") >= 30000000L))
      graft.sources.AnnIndex.deletePhash(s, idxDir,
        media.filter(col("doc_id") < 10000000L && col("doc_id") % 7 === 5)
          .select("doc_id"))
      graft.sources.AnnIndex.probePhash(s, idxDir, armA, PHashHammingMax)
        .select(col("id_a"), col("id_b"), col("hamming"),
          lit(nPatch.toLong).as("n_patches"))
        .orderBy("id_a", "id_b")
    }),

    // The APPLIED perceptual dedup — mm_near_dup's pairs closed into
    // components (the dedup_clusters treatment for media): a re-hosted
    // image re-encoded twice links a~b, b~c, and pairwise output alone
    // would retire only one copy; the component closure emits every
    // media row with its canonical cluster id (min doc_id — the
    // keeper) and cluster size, so the dedup a crawl actually runs is
    // "keep rows where doc_id = cluster_id". BSP min-label
    // propagation over the banded pairs, rounds bounded by component
    // diameter (here: the planted chains), recursive-CTE oracle.
    "mm_dedup_clusters" -> ((s, dir) => {
      val (ids, verified, _) = nearDupPairs(s, dir)
      val cc = graft.operators.Dedup.connectedComponents(
        ids.select(col("doc_id").as("id")), verified.select("id_a", "id_b"))
      val sizes = cc.groupBy("label").agg(count(lit(1)).as("cluster_size"))
      cc.join(sizes, "label")
        .select(col("id").as("doc_id"), col("label").as("cluster_id"),
          col("cluster_size"))
        .orderBy("doc_id")
    }),

    // BAND-BUCKET health report for the perceptual-hash space — the
    // RE-INDEX TRIGGER metric trainPhash's frozen-width contract
    // references (the pq_code_stats / sim_ann_bucket_stats discipline
    // for media): per band, the live bucket count, the hottest
    // bucket's population, and the row total, next to the derived
    // width. When max_bucket (or n_rows / n_buckets) outruns
    // PHashBucketTarget, corpus growth has crossed the next
    // phashPatches threshold and the maintained index
    // (mm_near_dup_incremental) is due a rebuild at the wider width —
    // the monitoring row that turns the width ladder from a rule into
    // a policy. All-integer, so it hash-gates; over the PERSISTED
    // store the same report is one groupBy on the postings table
    // (identical values — postings mirror these hashes). Scale shape:
    // one map-side-combined (band, key) count, output bounded by
    // bands x live buckets.
    "mm_band_stats" -> ((s, dir) => {
      import s.implicits._
      val media = nearDupMedia(s, dir).localCheckpoint(true)
      val nPatch = Multimodal.phashPatches(media.count())
      val ph = Multimodal.perceptualHash(
        media.as[Multimodal.MediaBytes], nPatch).toDF()
      ph.select(posexplode(col("bands")).as(Seq("band", "key")))
        .groupBy(col("band").cast("long").as("band"), col("key"))
        .agg(count(lit(1)).as("n"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_buckets"),
          max("n").as("max_bucket"),
          sum("n").cast("long").as("n_rows"))
        .withColumn("n_patches", lit(nPatch.toLong))
        .orderBy("band")
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

    // perceptual-hash reference: same hex-built corpus + arms, same
    // all-integer aHash (patches*s_k > total) at the same
    // corpus-derived width (nd_p mirrors Multimodal.phashPatches —
    // the knn_s pattern), but candidates via a plain all-pairs join —
    // equal to the Spark side's banded plan BECAUSE 8 bands at any
    // width are recall-exact at Hamming <= PHashHammingMax
    "mm_near_dup" ->
      s"""WITH $mmNearDupCtes
         |SELECT id_a, id_b, hamming,
         |       (SELECT CAST(p AS BIGINT) FROM nd_p) AS n_patches
         |FROM mm_pairs ORDER BY id_a, id_b""".stripMargin,

    // per-band bucket populations from the shared ph CTE; all-integer
    "mm_band_stats" ->
      s"""WITH $mmNearDupCtes, mbs AS (
         |  SELECT b.band, ph.bands[b.band + 1] AS key FROM ph
         |  CROSS JOIN (SELECT UNNEST(generate_series(0, ${Multimodal.PHashBands - 1})) AS band) b
         |), pop AS (
         |  SELECT band, key, COUNT(*) AS n FROM mbs GROUP BY 1, 2
         |)
         |SELECT CAST(band AS BIGINT) AS band,
         |  CAST(COUNT(*) AS BIGINT) AS n_buckets,
         |  CAST(MAX(n) AS BIGINT) AS max_bucket,
         |  CAST(SUM(n) AS BIGINT) AS n_rows,
         |  (SELECT CAST(p AS BIGINT) FROM nd_p) AS n_patches
         |FROM pop GROUP BY band ORDER BY band""".stripMargin,

    // maintained-index convergence: probe-then-append ingests emit each
    // pair exactly once, at the ingest where its second member arrives,
    // so the accumulated output IS the one-shot pair set
    "mm_near_dup_incremental" ->
      s"""WITH $mmNearDupCtes
         |SELECT id_a, id_b, hamming,
         |       (SELECT CAST(p AS BIGINT) FROM nd_p) AS n_patches
         |FROM mm_pairs ORDER BY id_a, id_b""".stripMargin,

    // the corpus-without at the FROZEN width, pairs touching the probe
    // arm only — build → delete → probe must equal discovery over a
    // corpus that never contained the retracted payloads
    "mm_near_dup_retract" ->
      s"""WITH ${mmNearDupCtesOver("NOT (doc_id % 7 = 5)")}
         |SELECT id_a, id_b, hamming,
         |       (SELECT CAST(p AS BIGINT) FROM nd_p) AS n_patches
         |FROM mm_pairs
         |WHERE (id_a >= 20000000 AND id_a < 30000000)
         |   OR (id_b >= 20000000 AND id_b < 30000000)
         |ORDER BY id_a, id_b""".stripMargin,

    // the dedup_clusters recursive closure over the perceptual pairs:
    // min reachable id per media row == the component's keeper
    "mm_dedup_clusters" ->
      s"""WITH RECURSIVE $mmNearDupCtes,
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM mm_pairs
         |  UNION ALL
         |  SELECT id_b AS src, id_a AS dst FROM mm_pairs
         |), reach AS (
         |  SELECT doc_id AS id, doc_id AS r FROM mnd
         |  UNION
         |  SELECT e.dst AS id, r.r FROM reach r JOIN edges e ON e.src = r.id
         |), lbl AS (
         |  SELECT id, CAST(MIN(r) AS BIGINT) AS cluster_id FROM reach GROUP BY id
         |), szs AS (
         |  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
         |  FROM lbl GROUP BY 1
         |)
         |SELECT l.id AS doc_id, l.cluster_id, s.cluster_size
         |FROM lbl l JOIN szs s USING (cluster_id)
         |ORDER BY doc_id""".stripMargin,

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
