package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming maintenance for the two newest maintained models — BM25
  * corpus stats and the cluster assignment — via `foreachBatch` over a
  * micro-batched stream, converging to the batch fold (the phash/LSH
  * maintenance discipline): the SAME ingest call serves a batch staging
  * and a streaming sink, so "maintained under a stream" is a spec-gated
  * property, not a claim.
  */
class StreamingMaintenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.sources.GraftSession.local()

  test("BM25 stats: foreachBatch ingests converge to the one-batch fold (additive partials)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 120L).map { i =>
      val extra = if (i % 3 == 0) " stream vector" else if (i % 3 == 1) " window" else " batch batch"
      (i, s"alpha beta gamma doc$i$extra")
    }
    val streamPath =
      s"${graft.sources.TempDirs.scratch("graft_bmstream_")}/segments"
    val onePath =
      s"${graft.sources.TempDirs.scratch("graft_bmone_")}/segments"
    // reference: the WHOLE corpus as one ingest
    graft.queries.TextQueries.bm25IngestStats(
      graft.queries.TextQueries.bm25Base(docs.toDF("doc_id", "text")), onePath)
    // stream: three micro-batches, each appending its partials
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        graft.queries.TextQueries.bm25IngestStats(
          graft.queries.TextQueries.bm25Base(batch), streamPath)
      }.start()
    try {
      mem.addData(docs.filter(_._1 < 40L): _*)
      q.processAllAvailable()
      mem.addData(docs.filter(d => d._1 >= 40L && d._1 < 80L): _*)
      q.processAllAvailable()
      mem.addData(docs.filter(_._1 >= 80L): _*)
      q.processAllAvailable()
    } finally q.stop()
    def stats(path: String) = graft.queries.TextQueries
      .bm25StatsFromStore(spark, path).head().toSeq
    assert(stats(streamPath) == stats(onePath))
    // and the micro-batched store really holds >1 segment pre-merge
    assert(graft.sources.SegmentStore.segmentIds(spark, streamPath).size >= 3)
  }

  test("takedowns arrive ON the stream: negated partials converge to the build-without; zero-drop fold reclaims") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.SegmentStore
    val path = s"${graft.sources.TempDirs.scratch("graft_tdstream_")}/segments"
    // production shape: adds and GDPR takedowns interleave on ONE
    // stream as signed records; every micro-batch lands through the
    // same zero-read signed-partial append (in-batch add+retract of
    // the same key cancels inside the batch's groupBy — also covered)
    val adds = (0L until 60L).flatMap { u =>
      Seq((u, "click", 1L)) ++ (if (u % 2 == 0) Seq((u, "view", 1L)) else Nil)
    }
    val takedownUsers = (0L until 60L).filter(_ % 5 == 3).toSet
    val retracts = adds.filter(a => takedownUsers(a._1))
      .map(a => (a._1, a._2, -1L))
    val mem = MemoryStream[(Long, String, Long)]
    val stream = mem.toDF().toDF("user_id", "dist", "sign")
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        SegmentStore.append(
          b.groupBy(col("dist"), col("user_id").cast("string").as("bin"))
            .agg(sum("sign").as("count")), path)
      }.start()
    try {
      mem.addData(adds.take(50): _*)
      q.processAllAvailable()
      // users >= 48 are ADDED in this same micro-batch (adds.drop(50)
      // starts at u=34) — their retracts cancel inside the batch
      mem.addData(adds.drop(50) ++ retracts.filter(_._1 >= 48L): _*)
      q.processAllAvailable()
      mem.addData(retracts.filter(_._1 < 48L): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = SegmentStore.merged(spark, path, Seq("dist", "bin"), "count")
      .filter(col("count") > 0).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = adds.filterNot(a => takedownUsers(a._1))
      .groupBy(a => (a._2, a._1.toString))
      .map { case (k, v) => k -> v.size.toLong }
    assert(got == want, "stream-retracted read diverged from the build-without")
    // retracted mass is tombstones until the zero-drop fold reclaims it
    val pre = SegmentStore.tombstoneStats(spark, path, Seq("dist", "bin"),
      "count").head()
    assert(pre.getLong(1) == retracts.size.toLong && pre.getBoolean(4),
      s"expected ${retracts.size} fully-cancelled keys pre-fold: $pre")
    SegmentStore.compact(spark, path, Seq("dist", "bin"), "count",
      dropCancelled = true)
    val post = SegmentStore.tombstoneStats(spark, path, Seq("dist", "bin"),
      "count").head()
    assert(post.getLong(1) == 0L && post.getLong(3) == want.size.toLong,
      s"zero-drop fold did not reclaim to exactly the live keys: $post")
  }

  test("cluster assignment: foreachBatch pair ingests converge to the one-shot clustering") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val nodes = (1L to 40L)
    // chains {1..4}, {10..13}, pair {20,21}, the rest isolated; edges
    // arrive SPLIT ACROSS micro-batches so cross-batch transitive
    // merges must fire (1-2 in batch 1, 2-3 in batch 2, ...)
    val edges = Seq((1L, 2L), (10L, 11L), (20L, 21L),
      (2L, 3L), (11L, 12L), (3L, 4L), (12L, 13L))
    val storePath =
      s"${graft.sources.TempDirs.scratch("graft_ccstream_")}/assign"
    nodes.toDF("id").select(col("id"), col("id").as("label"))
      .withColumn("part",
        pmod(col("label"), lit(graft.queries.DedupQueries.CcParts)))
      .write.partitionBy("part").parquet(storePath)
    val mem = MemoryStream[(Long, Long)]
    val stream = mem.toDF().toDF("id_a", "id_b")
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        graft.queries.DedupQueries.ccIngest(spark, storePath, batch)
      }.start()
    try {
      mem.addData(edges.take(3): _*)
      q.processAllAvailable()
      mem.addData(edges.slice(3, 5): _*)
      q.processAllAvailable()
      mem.addData(edges.drop(5): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(storePath).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    val want = graft.operators.Dedup.connectedComponents(
        nodes.toDF("id"), edges.toDF("id_a", "id_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got(4L) == 1L && got(13L) == 10L && got(21L) == 20L)
    // re-delivery: the assignment is at a fixpoint for these edges, so
    // repeating the last pair batch must leave every label unchanged
    graft.queries.DedupQueries.ccIngest(spark, storePath,
      edges.drop(5).toDF("id_a", "id_b"))
    val replayed = spark.read.parquet(storePath).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    assert(replayed == got, "cluster store changed under re-delivered pairs")
  }

  test("streaming IVF maintenance: the retrain policy fires mid-stream at the batch where the gauge crossed; the healed index equals the fresh build") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val Dim = 64
    def vExpr(id: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), lit(Dim)),
        j => (pmod(id * lit(31) + j * lit(17), lit(100)) - lit(50)).cast("double") / lit(50.0))
    val dir = graft.sources.TempDirs.scratch("graft_ivfstream_")
    graft.sources.AnnIndex.saveIvf(
      spark.range(200).select(col("id").as("vec_id"), vExpr(col("id")).as("v")),
      k = 8, sampleSize = 128, iters = 2, dim = Dim, salt = 7, dir = dir)
    val dial = graft.sources.AnnIndex.ivfDriftStats(spark, dir, lit(true))
      .collect()(0).getDouble(2) - 0.02
    val retrainedAt = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = mem.toDF().toDF("vec_id").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // ids < 1000 are same-distribution; ids >= 1000 are the drifted
        // crawl wave (+2.0 per component — a new domain cluster)
        val vecs = batch.select(col("vec_id"),
          when(col("vec_id") < 1000L, vExpr(col("vec_id")))
            .otherwise(transform(vExpr(col("vec_id") - 1000L), x => x + lit(2.0)))
            .as("v"))
        if (graft.sources.AnnIndex.upsertIvfWithPolicy(spark, dir, vecs,
          8, 128, 2, Dim, 7, dial)) retrainedAt += batchId
        ()
      }.start()
    try {
      mem.addData(200L until 300L: _*) // healthy batch 0
      q.processAllAvailable()
      mem.addData(300L until 400L: _*) // healthy batch 1
      q.processAllAvailable()
      mem.addData(1000L until 1200L: _*) // the drift wave: batch 2
      q.processAllAvailable()
    } finally q.stop()
    assert(retrainedAt.toSeq == Seq(2L),
      s"retrain fired at batches $retrainedAt, expected exactly the wave batch")
    // healed index == fresh one-shot build over everything live
    val union = spark.range(400).select(col("id").as("vec_id"), vExpr(col("id")).as("v"))
      .unionByName(spark.range(200).select((col("id") + lit(1000L)).as("vec_id"),
        transform(vExpr(col("id")), x => x + lit(2.0)).as("v")))
      .localCheckpoint(true)
    val freshDir = graft.sources.TempDirs.scratch("graft_ivfstream_fresh_")
    graft.sources.AnnIndex.saveIvf(union, k = 8, sampleSize = 128, iters = 2,
      dim = Dim, salt = 7, dir = freshDir)
    val qs = union.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    def probe(d: String) = graft.sources.AnnIndex.probeIvf(spark, d, qs, 5, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(probe(dir) == probe(freshDir))
  }

  test("streaming PQ maintenance: the batch dial fires mid-stream at the drift wave's batch; healed codes equal the fresh build") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val Dim = 64
    def vExpr(id: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), lit(Dim)),
        j => (pmod(id * lit(31) + j * lit(17), lit(100)) - lit(50)).cast("double") / lit(50.0))
    def vecsOf(ids: org.apache.spark.sql.DataFrame) = ids.select(col("vec_id"),
      when(col("vec_id") < 1000L, vExpr(col("vec_id")))
        .otherwise(transform(vExpr(col("vec_id") - 1000L), x => x + lit(2.0)))
        .as("v"))
    val store = vecsOf(spark.range(400).select(col("id").as("vec_id"))
        .unionByName(spark.range(1000, 1200).select(col("id").as("vec_id"))))
      .localCheckpoint(true)
    val dir = graft.sources.TempDirs.scratch("graft_pqstream_")
    graft.sources.AnnIndex.trainPq(
      vecsOf(spark.range(200).select(col("id").as("vec_id"))),
      m = 4, sub = 16, k = 8, sampleSize = 128, iters = 2, salt = 11, dir = dir)
    graft.sources.AnnIndex.upsertPq(spark, dir,
      vecsOf(spark.range(200).select(col("id").as("vec_id"))))
    val dial = graft.sources.AnnIndex.pqDriftStats(spark, dir,
        store.filter(col("vec_id") < 200), lit(true))
      .collect()(0).getDouble(2) - 0.05
    val retrainedAt = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("vec_id").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (graft.sources.AnnIndex.upsertPqWithPolicy(spark, dir, store,
          vecsOf(batch.toDF()), 128, 2, 11,
          minMeanCcos = -1.0, minBatchMeanCcos = dial)) retrainedAt += batchId
        ()
      }.start()
    try {
      mem.addData(200L until 300L: _*) // healthy batch 0
      q.processAllAvailable()
      mem.addData(300L until 400L: _*) // healthy batch 1
      q.processAllAvailable()
      mem.addData(1000L until 1200L: _*) // the drift wave: batch 2
      q.processAllAvailable()
    } finally q.stop()
    assert(retrainedAt.toSeq == Seq(2L),
      s"PQ retrain fired at batches $retrainedAt, expected exactly the wave batch")
    val freshDir = graft.sources.TempDirs.scratch("graft_pqstream_fresh_")
    graft.sources.AnnIndex.savePq(store, m = 4, sub = 16, k = 8,
      sampleSize = 128, iters = 2, salt = 11, dir = freshDir)
    def codes(d: String) = spark.read.parquet(s"$d/codes")
      .select("vec_id", "code0", "code1", "code2", "code3")
      .collect().map(_.toSeq).toSet
    assert(codes(dir) == codes(freshDir))
  }

  test("streaming IVFPQ maintenance: the routing dial fires mid-stream; healed index equals the fresh build") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val Dim = 64
    def vExpr(id: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), lit(Dim)),
        j => (pmod(id * lit(31) + j * lit(17), lit(100)) - lit(50)).cast("double") / lit(50.0))
    def vecsOf(ids: org.apache.spark.sql.DataFrame) = ids.select(col("vec_id"),
      when(col("vec_id") < 1000L, vExpr(col("vec_id")))
        .otherwise(transform(vExpr(col("vec_id") - 1000L), x => x + lit(2.0)))
        .as("v"))
    val store = vecsOf(spark.range(400).select(col("id").as("vec_id"))
        .unionByName(spark.range(1000, 1200).select(col("id").as("vec_id"))))
      .localCheckpoint(true)
    val dir = graft.sources.TempDirs.scratch("graft_ivfpqstream_")
    graft.sources.AnnIndex.trainIvfPq(
      vecsOf(spark.range(200).select(col("id").as("vec_id"))),
      ivfK = 8, sampleSize = 128, iters = 2, dim = Dim, ivfSalt = 7,
      m = 4, sub = 16, pqK = 8, pqSalt = 11, dir = dir)
    graft.sources.AnnIndex.upsertIvfPq(spark, dir,
      vecsOf(spark.range(200).select(col("id").as("vec_id"))))
    val dial = graft.sources.AnnIndex.ivfpqDriftStats(spark, dir,
        store.filter(col("vec_id") < 200), lit(true))
      .collect()(0).getDouble(2) - 0.05
    val retrainedAt = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("vec_id").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (graft.sources.AnnIndex.upsertIvfPqWithPolicy(spark, dir, store,
          vecsOf(batch.toDF()), 8, 128, 2, Dim, 7, 11,
          minMeanCcos = -1.0, minBatchMeanCcos = dial)) retrainedAt += batchId
        ()
      }.start()
    try {
      mem.addData(200L until 400L: _*) // healthy batch 0
      q.processAllAvailable()
      mem.addData(1000L until 1200L: _*) // the drift wave: batch 1
      q.processAllAvailable()
    } finally q.stop()
    assert(retrainedAt.toSeq == Seq(1L),
      s"IVFPQ retrain fired at batches $retrainedAt, expected exactly the wave batch")
    val freshDir = graft.sources.TempDirs.scratch("graft_ivfpqstream_fresh_")
    graft.sources.AnnIndex.saveIvfPq(store, ivfK = 8, sampleSize = 128,
      iters = 2, dim = Dim, ivfSalt = 7, m = 4, sub = 16, pqK = 8,
      pqSalt = 11, dir = freshDir)
    def codes(d: String) = spark.read.parquet(s"$d/codes")
      .select(col("vec_id"), col("cell").cast("long"),
        col("code0"), col("code1"), col("code2"), col("code3"))
      .collect().map(_.toSeq).toSet
    assert(codes(dir) == codes(freshDir))
  }

  test("streaming LSH maintenance: the population width rule fires mid-stream; healed index equals the fresh build at the derived width") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val Dim = 64
    def vExpr(id: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), lit(Dim)),
        j => (pmod(id * lit(31) + j * lit(17), lit(100)) - lit(50)).cast("double") / lit(50.0))
    val dir = graft.sources.TempDirs.scratch("graft_lshstream_")
    graft.sources.AnnIndex.saveLsh(
      spark.range(400).select(col("id").as("vec_id"), vExpr(col("id")).as("v")),
      nBits = 6, dim = Dim, dir = dir) // capacity 8 << 6 = 512
    val rebucketedAt = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("vec_id").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (graft.sources.AnnIndex.upsertLshWithPolicy(spark, dir,
          batch.toDF().select(col("vec_id"), vExpr(col("vec_id")).as("v")),
          bucketTarget = 8, maxBits = 16)) rebucketedAt += batchId
        ()
      }.start()
    try {
      mem.addData(400L until 480L: _*) // in capacity: batch 0
      q.processAllAvailable()
      mem.addData(480L until 700L: _*) // the growth wave: batch 1
      q.processAllAvailable()
    } finally q.stop()
    assert(rebucketedAt.toSeq == Seq(1L),
      s"rebucket fired at batches $rebucketedAt, expected exactly the wave batch")
    assert(spark.read.parquet(s"$dir/meta").head().getAs[Int]("n_bits") == 7)
    val union = spark.range(700).select(col("id").as("vec_id"),
      vExpr(col("id")).as("v"))
    val freshDir = graft.sources.TempDirs.scratch("graft_lshstream_fresh_")
    graft.sources.AnnIndex.saveLsh(union, nBits = 7, dim = Dim, dir = freshDir)
    def rows(d: String) = spark.read.parquet(s"$d/corpus")
      .select("vec_id", "bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(dir) == rows(freshDir))
  }

  test("streaming phash maintenance: the width trigger fires mid-stream; healed postings equal the fresh build at the wider width") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Multimodal
    val hx = concat((0 until 16).map(j =>
      md5(concat(col("doc_id").cast("string"), lit(s":$j")))): _*)
    def media(ids: org.apache.spark.sql.DataFrame) =
      ids.withColumn("payload", unhex(hx))
    val n0 = 16300L
    val store = media(spark.range(n0 + 300L).select(col("id").as("doc_id")))
      .localCheckpoint(true)
    val dir = graft.sources.TempDirs.scratch("graft_phstream_")
    graft.sources.AnnIndex.trainPhash(spark, dir, Multimodal.phashPatches(n0))
    graft.sources.AnnIndex.upsertPhash(spark, dir,
      media(spark.range(n0).select(col("id").as("doc_id"))))
    val reindexedAt = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("doc_id").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (graft.sources.AnnIndex.upsertPhashWithPolicy(spark, dir,
          media(batch.toDF()), store)) reindexedAt += batchId
        ()
      }.start()
    try {
      mem.addData(n0 until (n0 + 50L): _*) // under threshold: batch 0
      q.processAllAvailable()
      mem.addData((n0 + 50L) until (n0 + 300L): _*) // crosses it: batch 1
      q.processAllAvailable()
    } finally q.stop()
    assert(reindexedAt.toSeq == Seq(1L),
      s"re-index fired at batches $reindexedAt, expected exactly the crossing batch")
    assert(spark.read.parquet(s"$dir/meta").head().getAs[Int]("n_patches") == 128)
    val freshDir = graft.sources.TempDirs.scratch("graft_phstream_fresh_")
    graft.sources.AnnIndex.trainPhash(spark, freshDir, 128)
    graft.sources.AnnIndex.upsertPhash(spark, freshDir, store)
    def postings(d: String) = spark.read.parquet(s"$d/postings")
      .groupBy(col("band").cast("long").as("band"), col("key")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(postings(dir) == postings(freshDir))
  }

  test("streaming token artifact: adds + takedowns on one stream maintain the export; converges to the one-call build; re-delivery is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = "/root/testdata/sf0.001"
    val P = graft.queries.PipelineQueries
    def docsOf(ids: Seq[Long]) = ids.toDF("doc_id")
    def onDisk(d: String) = spark.read.parquet(d)
      .select(col("shard").cast("long"), col("seq_id"), col("pos"),
        col("doc_id"), col("token_id"))
      .collect().map(_.toSeq).toSet
    val allIds = graft.sources.Tables.documents(spark, corpus)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq // sf0.001 corpus
    val (b1, b2) = allIds.splitAt(allIds.length / 2)
    val retracted = allIds.filter(_ % 9 == 2)
    // reference: the surviving doc set built in ONE bootstrap call
    val oneDir = s"${graft.sources.TempDirs.scratch("graft_tokone_")}/export"
    P.seqTokensMaintain(spark, corpus, oneDir,
      Some(docsOf(allIds.filterNot(retracted.contains))), None)
    // stream: signed doc-id micro-batches through the SAME call
    val exportDir = s"${graft.sources.TempDirs.scratch("graft_tokstr_")}/export"
    val mem = MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("doc_id", "sign").writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val adds = b.filter(col("sign") > 0).select("doc_id")
        val dels = b.filter(col("sign") < 0).select("doc_id")
        P.seqTokensMaintain(spark, corpus, exportDir,
          if (adds.isEmpty) None else Some(adds),
          if (dels.isEmpty) None else Some(dels))
      }.start()
    try {
      mem.addData(b1.map(d => (d, 1L)): _*) // bootstraps the absent dir
      q.processAllAvailable()
      mem.addData(b2.map(d => (d, 1L)): _*)
      q.processAllAvailable()
      // takedowns, one arriving WITH a same-batch re-add: retract wins
      mem.addData(retracted.map(d => (d, -1L)) :+ (retracted.head, 1L): _*)
      q.processAllAvailable()
      val settled = onDisk(exportDir)
      assert(settled == onDisk(oneDir),
        "streamed token artifact diverged from the one-call build")
      // at-least-once: re-delivering a whole surviving add batch upserts
      // identical rows — the artifact must not change
      mem.addData(b2.filterNot(retracted.contains).map(d => (d, 1L)): _*)
      q.processAllAvailable()
      assert(onDisk(exportDir) == settled,
        "re-delivered add batch mutated the settled artifact")
    } finally q.stop()
  }

  test("mm maintenance stream: signed add/takedown batches converge to the one-call build; re-delivery is a no-op; patches travel with their doc") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = "/root/testdata/sf0.001"
    val P = graft.queries.PipelineQueries
    def docsOf(ids: Seq[Long]) = ids.toDF("doc_id")
    def onDisk(d: String) = spark.read.parquet(d)
      .select(col("shard").cast("long"), col("seq_id"), col("pos"),
        col("doc_id"), col("token_id"), col("patch_idx"))
      .collect().map(_.toSeq).toSet
    val allIds = graft.sources.Tables.documents(spark, corpus)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val (b1, b2) = allIds.splitAt(allIds.length / 2)
    // retract a set that INCLUDES image docs (doc_id % 3 == 0), so the
    // takedown provably removes patch slots (media references) too
    val retracted = allIds.filter(_ % 9 == 3) // every third is % 3 == 0
    assert(retracted.exists(_ % 3 == 0))
    val oneDir = s"${graft.sources.TempDirs.scratch("graft_mmone_")}/export"
    P.seqMmMaintain(spark, corpus, oneDir,
      Some(docsOf(allIds.filterNot(retracted.contains))), None)
    val exportDir = s"${graft.sources.TempDirs.scratch("graft_mmstr_")}/export"
    val mem = MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("doc_id", "sign").writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val adds = b.filter(col("sign") > 0).select("doc_id")
        val dels = b.filter(col("sign") < 0).select("doc_id")
        P.seqMmMaintain(spark, corpus, exportDir,
          if (adds.isEmpty) None else Some(adds),
          if (dels.isEmpty) None else Some(dels))
      }.start()
    try {
      mem.addData(b1.map(d => (d, 1L)): _*) // bootstraps the absent dir
      q.processAllAvailable()
      mem.addData(b2.map(d => (d, 1L)): _*)
      q.processAllAvailable()
      mem.addData(retracted.map(d => (d, -1L)): _*)
      q.processAllAvailable()
      val settled = onDisk(exportDir)
      assert(settled == onDisk(oneDir),
        "streamed mm artifact diverged from the one-call build")
      // no retracted doc's patch slots survive anywhere
      assert(!settled.exists(r => retracted.contains(r(3))),
        "a retracted doc's slots (incl. media refs) survived the takedown")
      // at-least-once: re-delivering surviving adds is a no-op
      mem.addData(b1.filterNot(retracted.contains).map(d => (d, 1L)): _*)
      q.processAllAvailable()
      assert(onDisk(exportDir) == settled,
        "re-delivered mm add batch mutated the settled artifact")
    } finally q.stop()
  }

  test("token maintenance: a retract-only FIRST batch is a no-op on the absent store, and the next add still bootstraps cleanly") {
    import spark.implicits._
    val corpus = "/root/testdata/sf0.001"
    val P = graft.queries.PipelineQueries
    def onDisk(d: String) = spark.read.parquet(d)
      .select(col("shard").cast("long"), col("seq_id"), col("pos"),
        col("doc_id"), col("token_id"))
      .collect().map(_.toSeq).toSet
    val ids = graft.sources.Tables.documents(spark, corpus).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val d = s"${graft.sources.TempDirs.scratch("graft_tokboot_")}/export"
    // out-of-order delivery: the takedown lands before any data has —
    // the store must not be left in a state the next batch can't read
    // (a bare _SUCCESS dir used to kill read.parquet's schema inference)
    P.seqTokensMaintain(spark, corpus, d, None,
      Some(ids.take(3).toDF("doc_id")))
    P.seqTokensMaintain(spark, corpus, d, Some(ids.toDF("doc_id")), None)
    val one = s"${graft.sources.TempDirs.scratch("graft_tokboot_one_")}/export"
    P.seqTokensMaintain(spark, corpus, one, Some(ids.toDF("doc_id")), None)
    assert(onDisk(d) == onDisk(one),
      "early-takedown-then-add diverged from the clean bootstrap")
  }

  test("retract-only backfill: a legacy artifact missing _tokenizer becomes self-describing on its next takedown batch when the frozen BPE artifact is materialized") {
    import spark.implicits._
    val corpus = "/root/testdata/sf0.001"
    val P = graft.queries.PipelineQueries
    val ids = graft.sources.Tables.documents(spark, corpus).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val d = s"${graft.sources.TempDirs.scratch("graft_tokbackfill_")}/export"
    // stage the LEGACY state: shards on disk, no _tokenizer dir (ship
    // happened before the tokenizer-shipping discipline existed)
    P.seqTokensMaintain(spark, corpus, d, Some(ids.toDF("doc_id")), None)
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tokDir = new org.apache.hadoop.fs.Path(s"$d/_tokenizer")
    assert(fs.exists(tokDir)) // the add batch shipped it
    fs.delete(tokDir, true)   // make it legacy
    // the frozen BPE artifact IS materialized (the add batch above
    // ensured it), so a takedown-only batch must backfill the ship —
    // presence probe + vocab-sized write, no corpus-scale training
    P.seqTokensMaintain(spark, corpus, d, None,
      Some(ids.take(2).toDF("doc_id")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$d/_tokenizer/vocab")),
      "retract-only batch left the legacy artifact non-self-describing")
    // and the shipped vocab is the frozen one: the manifest's
    // tokenizer_fp gate reads it without throwing, and a later add
    // batch passes the drift check against it
    P.seqTokensMaintain(spark, corpus, d, Some(ids.take(2).toDF("doc_id")), None)
  }

  test("token repack crash recovery: re-running the same batch over a half-applied artifact converges (shard dirs independent + upsert idempotent)") {
    import spark.implicits._
    val corpus = "/root/testdata/sf0.001"
    val P = graft.queries.PipelineQueries
    def onDisk(d: String) = spark.read.parquet(d)
      .select(col("shard").cast("long"), col("seq_id"), col("pos"),
        col("doc_id"), col("token_id"))
      .collect().map(_.toSeq).toSet
    val allIds = graft.sources.Tables.documents(spark, corpus)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val retracted = allIds.filter(_ % 11 == 4)
    // the state the batch is applied TO, and the state it must reach
    val preDir = s"${graft.sources.TempDirs.scratch("graft_tokcr_pre_")}/export"
    P.seqTokensMaintain(spark, corpus, preDir, Some(allIds.toDF("doc_id")), None)
    val wantDir = s"${graft.sources.TempDirs.scratch("graft_tokcr_want_")}/export"
    P.seqTokensMaintain(spark, corpus, wantDir,
      Some(allIds.filterNot(retracted.contains).toDF("doc_id")), None)
    // apply the takedown fully, then SIMULATE a crash mid-overwrite:
    // dynamic partition overwrite is per-dir, so a crash leaves a MIX
    // of new dirs and old dirs — restore the PRE state into half of
    // the touched shard dirs
    val liveDir = s"${graft.sources.TempDirs.scratch("graft_tokcr_live_")}/export"
    P.seqTokensMaintain(spark, corpus, liveDir, Some(allIds.toDF("doc_id")), None)
    P.seqTokensMaintain(spark, corpus, liveDir, None,
      Some(retracted.toDF("doc_id")))
    val touched = retracted
      .map(d => graft.functions.HashKernels.md5Long60(P.PackSalt,
        org.apache.spark.unsafe.types.UTF8String.fromString(d.toString))
        % P.PackShards).distinct.sorted
    val rollBack = touched.take(math.max(1, touched.size / 2))
    rollBack.foreach { sh =>
      val dst = new java.io.File(s"$liveDir/shard=$sh")
      val src = new java.io.File(s"$preDir/shard=$sh")
      dst.mkdirs() // a fully-vacated dir was dropped; crash resurrects it
      dst.listFiles.foreach(_.delete())
      src.listFiles.foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          new java.io.File(dst, f.getName).toPath)
      }
    }
    assert(onDisk(liveDir) != onDisk(wantDir),
      "crash simulation did not actually corrupt the artifact")
    // recovery = re-run the SAME maintenance batch
    P.seqTokensMaintain(spark, corpus, liveDir, None,
      Some(retracted.toDF("doc_id")))
    assert(onDisk(liveDir) == onDisk(wantDir),
      "replaying the takedown over the half-applied artifact did not converge")
  }

  test("tokenizer drift fails maintenance LOUDLY: a changed corpus vocab must not mix ids into a shipped artifact") {
    import spark.implicits._
    val corpus = "/root/testdata/sf0.001"
    val P = graft.queries.PipelineQueries
    // a variant corpus whose alphabet (hence vocab ids) differs —
    // the letters e/t/a become digits the base corpus never contains
    val variant = graft.sources.TempDirs.scratch("graft_tokdrift_")
    graft.sources.Tables.documents(spark, corpus)
      .withColumn("text", translate(col("text"), "eta", "019"))
      .write.mode("overwrite").parquet(s"$variant/documents.parquet")
    val ids = graft.sources.Tables.documents(spark, corpus).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val d = s"${graft.sources.TempDirs.scratch("graft_tokdrift_exp_")}/export"
    // bootstrap under the base corpus's frozen tokenizer...
    P.seqTokensMaintain(spark, corpus, d, Some(ids.take(20).toDF("doc_id")), None)
    // ...then a later batch arrives tokenized under a DIFFERENT vocab:
    // the presence probe alone would append new-vocab ids next to the
    // survivors' old-vocab ids and the manifest's tokenizer_fp
    // (computed from the shipped old vocab) would mask the mix
    val e = intercept[IllegalArgumentException] {
      P.seqTokensMaintain(spark, variant, d,
        Some(ids.slice(20, 30).toDF("doc_id")), None)
    }
    assert(e.getMessage.contains("tokenizer drift"), e.getMessage)
    // same-vocab maintenance still flows
    P.seqTokensMaintain(spark, corpus, d,
      Some(ids.slice(20, 30).toDF("doc_id")), None)
  }
}
