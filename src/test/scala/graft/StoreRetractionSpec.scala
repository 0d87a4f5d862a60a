package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Takedown on the two user-keyed maintained stores (funnel,
  * retention). The driver's oracle gate proves the REPORT converges to
  * the corpus-without; these pins prove the STORE state itself — the
  * retracted ids are gone from every leg, a partition directory the
  * delete fully vacates is dropped, and the funnel's bloom sidecar is
  * re-frozen from the post-delete store with an exact recount and no
  * false negative on any survivor (the property the routed tombstone
  * check rides on).
  */
class StoreRetractionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.sources.GraftSession.local()

  private val R = graft.queries.RelationalQueries

  private def retractedPred = col("user_id").isNotNull && col("user_id") % 10 === 7

  test("funnel re-delivery: repeating an ingest leaves every store leg and the read bit-identical") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val storeDir = graft.sources.TempDirs.scratch("graft_funredel_")
    val t = (d: String) => lit(s"2024-01-$d 00:00:00").cast("timestamp")
    val bulk = ev.filter(col("ts").isNull || col("ts") < t("21"))
    val day1 = ev.filter(col("ts") >= t("21") && col("ts") < t("25"))
    R.funnelIngest(spark, storeDir, bulk, t("03"))
    R.funnelIngest(spark, storeDir, day1, t("05"))
    def state() = {
      def rows(p: String) = spark.read.parquet(s"$storeDir/$p")
        .collect().map(_.toSeq).toSeq
        .map(_.map { case b: Array[Byte] => b.toSeq; case x => x })
        .sortBy(_.toString)
      (rows("results"), rows("pending"), rows("bloom"))
    }
    val before = state()
    // the foreachBatch restart case: day 1 re-delivered at the same
    // watermark — finalized users tombstone-drop, pending rows collapse
    // in the set-union, the sidecar sees zero new finalized ids
    R.funnelIngest(spark, storeDir, day1, t("05"))
    val after = state()
    assert(after._1 == before._1, "results changed under re-delivery")
    assert(after._2 == before._2, "pending buffer changed under re-delivery")
    assert(after._3 == before._3, "bloom sidecar changed under re-delivery")
  }

  test("retention re-delivery: repeating the entire staged ingest leaves both stores and the matrix bit-identical") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val storeDir = graft.sources.TempDirs.scratch("graft_retredel_")
    R.retentionIngestStaged(spark, storeDir, ev)
    def state() = (
      spark.read.parquet(s"$storeDir/cohort")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString),
      spark.read.parquet(s"$storeDir/pairs")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString),
      R.retentionStoreRead(spark, storeDir).collect().map(_.toSeq).toSeq)
    val before = state()
    // re-deliver EVERY batch: first-batch-wins set-union must no-op
    R.retentionIngestStaged(spark, storeDir, ev)
    val after = state()
    assert(after == before, "retention stores changed under re-delivery")
    assert(before._1.nonEmpty && before._2.nonEmpty)
  }

  test("funnel takedown: ids leave both store legs, sidecar recounted exactly, survivors never false-negative") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val storeDir = graft.sources.TempDirs.scratch("graft_funr_spec_")
    R.funnelIncremental(spark, ev, Some(storeDir))
    val resPath = s"$storeDir/results"
    val pendPath = s"$storeDir/pending"
    val bloomPath = s"$storeDir/bloom"
    // the takedown set: every %10==7 user PLUS one user known to be
    // pending, so BOTH store legs do real work (at sf0.001 no %10==7
    // user happens to still be in flight — without the pick the
    // pending-leg delete would pass vacuously)
    val pendingPick = spark.read.parquet(pendPath)
      .filter(col("user_id").isNotNull && col("user_id") % 10 =!= 7)
      .select("user_id").head().getLong(0)
    val delPred = retractedPred || col("user_id") === pendingPick
    val finBefore = spark.read.parquet(resPath).filter(delPred).count()
    val pendBefore = spark.read.parquet(pendPath).filter(delPred).count()
    assert(finBefore > 0, "no retracted user finalized — vacuous staging")
    assert(pendBefore > 0, "no retracted user pending — vacuous staging")
    val nBefore =
      spark.read.parquet(bloomPath).head().getAs[Long]("n_items")

    val del = ev.filter(delPred).select("user_id").distinct()
      .localCheckpoint(true)
    val delParts = del.select(pmod(col("user_id"), lit(16L)).as("part"))
      .distinct().collect().map(_.getLong(0)).toSeq
    for (p <- Seq(resPath, pendPath))
      graft.sources.AnnIndex.deleteRowsInParts(
        spark, p, "user_id", "part", del, delParts)
    R.funnelSidecarRebuild(spark, resPath, bloomPath)

    // store-level absence on both legs
    assert(spark.read.parquet(resPath).filter(delPred).count() == 0,
      "retracted users survive in the finalized store")
    assert(spark.read.parquet(pendPath).filter(delPred).count() == 0,
      "retracted users survive in the pending store")
    // sidecar: exact recount, and complete over the survivors
    val row = spark.read.parquet(bloomPath).head()
    val survivors = spark.read.parquet(resPath)
      .filter(col("user_id").isNotNull).select("user_id")
      .collect().map(_.getLong(0)) // sf0.001 finalized set — spec-bounded
    assert(row.getAs[Long]("n_items") == survivors.length.toLong,
      s"sidecar n_items ${row.getAs[Long]("n_items")} != exact ${survivors.length}")
    assert(row.getAs[Long]("n_items") < nBefore,
      "recount did not drop after the takedown")
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("bf")))
    assert(survivors.nonEmpty && survivors.forall(bf.mightContain),
      "rebuilt sidecar missed a surviving finalized id — false negative")
    // the read-time union over the post-takedown store equals the
    // one-shot funnel over the corpus-without (the oracle identity,
    // pinned here against the library's own chain)
    val got = R.funnelStoreRead(spark, resPath, pendPath,
      sys.error("store is non-empty")).collect().toSeq
    val want = graft.streaming.StreamOps.funnel(
        ev.filter(!delPred),
        R.FunnelClickWindowHours * 3600L * 1000L,
        R.FunnelBuyWindowHours * 3600L * 1000L, "1 hour")
      .orderBy("user_id").collect().toSeq
    assert(got == want, "post-takedown read diverged from the chain-without")
  }

  test("takedown drops a partition directory it fully vacates") {
    import spark.implicits._
    val path = s"${graft.sources.TempDirs.scratch("graft_vac_spec_")}/t"
    // part 0 holds ONLY retracted keys; part 1 holds a survivor
    Seq((16L, "a"), (32L, "b"), (17L, "c"))
      .toDF("user_id", "payload")
      .withColumn("part", pmod(col("user_id"), lit(16L)))
      .repartition(col("part"))
      .write.partitionBy("part").parquet(path)
    val del = Seq(16L, 32L).toDF("user_id")
    graft.sources.AnnIndex.deleteRowsInParts(
      spark, path, "user_id", "part", del, Seq(0L, 1L))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/part=0")),
      "fully-vacated partition directory survives")
    assert(spark.read.parquet(path).select("user_id")
      .as[Long].collect().toSeq == Seq(17L),
      "survivor row lost or retracted row kept")
  }

  test("retention takedown: ids leave both legs and the report equals the ingest-without") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val storeDir = graft.sources.TempDirs.scratch("graft_retr_spec_")
    R.retentionIngestStaged(spark, storeDir, ev)
    assert(spark.read.parquet(s"$storeDir/cohort")
      .filter(retractedPred).count() > 0, "vacuous staging")
    val del = ev.filter(retractedPred).select("user_id").distinct()
      .localCheckpoint(true)
    val delParts = del.select(pmod(col("user_id"), lit(16L)).as("part"))
      .distinct().collect().map(_.getLong(0)).toSeq
    for (leg <- Seq("cohort", "pairs"))
      graft.sources.AnnIndex.deleteRowsInParts(
        spark, s"$storeDir/$leg", "user_id", "part", del, delParts)
    for (leg <- Seq("cohort", "pairs"))
      assert(spark.read.parquet(s"$storeDir/$leg")
        .filter(retractedPred).count() == 0,
        s"retracted users survive in the $leg store")
    // the post-takedown report equals a store built WITHOUT them —
    // staged the same way, so the only difference is the takedown
    val cleanDir = graft.sources.TempDirs.scratch("graft_retc_spec_")
    R.retentionIngestStaged(spark, cleanDir, ev.filter(!retractedPred))
    val got = R.retentionStoreRead(spark, storeDir).collect().toSeq
    val want = R.retentionStoreRead(spark, cleanDir).collect().toSeq
    assert(got == want, "post-takedown report diverged from ingest-without")
  }

  test("deferred sidecar re-freeze: takedowns below the stale dial serve through the stale bloom; past it the policy rebuilds exactly") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val storeDir = graft.sources.TempDirs.scratch("graft_fundefer_")
    R.funnelIncremental(spark, ev, Some(storeDir))
    val resPath = s"$storeDir/results"
    val pendPath = s"$storeDir/pending"
    val bloomPath = s"$storeDir/bloom"
    val bytesBefore = spark.read.parquet(bloomPath).head()
      .getAs[Array[Byte]]("bf").toSeq
    val nFrozen = spark.read.parquet(bloomPath).head().getAs[Long]("n_items")

    def takedown(pred: org.apache.spark.sql.Column): Long = {
      val del = ev.filter(col("user_id").isNotNull && pred)
        .select("user_id").distinct().localCheckpoint(true)
      val delParts = del.select(pmod(col("user_id"), lit(16L)).as("part"))
        .distinct().collect().map(_.getLong(0)).toSeq
      for (p <- Seq(resPath, pendPath))
        graft.sources.AnnIndex.deleteRowsInParts(
          spark, p, "user_id", "part", del, delParts)
      val n = del.count()
      R.funnelSidecarRetire(spark, bloomPath, n)
      n
    }

    // ~10% of users: below the 25% dial — the policy must NOT pay the
    // store-sized re-freeze; the stale sidecar keeps serving (retracted
    // members are false positives, the exact anti-join already fixed)
    takedown(col("user_id") % 10 === 7)
    assert(!R.funnelSidecarMaintain(spark, resPath, bloomPath),
      "policy paid the re-freeze below the stale dial")
    val mid = spark.read.parquet(bloomPath).head()
    assert(mid.getAs[Array[Byte]]("bf").toSeq == bytesBefore
      && mid.getAs[Long]("n_items") == nFrozen,
      "sidecar changed without a rebuild")
    // the report stays exact THROUGH the stale window — the bloom is
    // routing only, never truth
    val got1 = R.funnelStoreRead(spark, resPath, pendPath,
      sys.error("store is non-empty")).collect().toSeq
    val want1 = graft.streaming.StreamOps.funnel(
        ev.filter(col("user_id").isNull || col("user_id") % 10 =!= 7),
        R.FunnelClickWindowHours * 3600L * 1000L,
        R.FunnelBuyWindowHours * 3600L * 1000L, "1 hour")
      .orderBy("user_id").collect().toSeq
    assert(got1 == want1, "stale-bloom window broke the report")

    // three more deciles: the ledger crosses the dial — one rebuild,
    // exact recount, ledger reset
    takedown(col("user_id") % 10 === 1 || col("user_id") % 10 === 3
      || col("user_id") % 10 === 5)
    assert(R.funnelSidecarMaintain(spark, resPath, bloomPath),
      "policy skipped the re-freeze past the stale dial")
    val row = spark.read.parquet(bloomPath).head()
    val survivors = spark.read.parquet(resPath)
      .filter(col("user_id").isNotNull).select("user_id")
      .collect().map(_.getLong(0)) // sf0.001 finalized set — spec-bounded
    assert(row.getAs[Long]("n_items") == survivors.length.toLong,
      "rebuild recount is not exact")
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("bf")))
    assert(survivors.nonEmpty && survivors.forall(bf.mightContain),
      "rebuilt sidecar missed a survivor")
    // ledger reset: the next small takedown is below the dial again
    takedown(col("user_id") % 10 === 9)
    assert(!R.funnelSidecarMaintain(spark, resPath, bloomPath),
      "retired ledger did not reset at the rebuild")
  }
}
