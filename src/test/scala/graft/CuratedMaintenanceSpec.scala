package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The curated artifact's maintenance contract (VERDICT r17 #3/#6):
  * touched-shard re-packs leave untouched shard dirs byte-identical,
  * the takedown of a cluster keeper PROMOTES the surviving member,
  * and the freshness contract's out-of-order symptom — a pair batch
  * ingested before its docs are seeded — fails LOUDLY instead of
  * silently dropping edges.
  */
class CuratedMaintenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.sources.GraftSession.local()
  private val dir = "/root/testdata/sf0.001"

  private def dirState(p: java.io.File) =
    p.listFiles.map(f => (f.getName, f.lastModified, f.length)).toSet

  test("curated retract: untouched shard dirs byte-identical; keeper takedown promotes the surviving near-dup") {
    import graft.queries.{DedupQueries, PipelineQueries}
    // the registered query runs the full lifecycle into a scratch
    // export; re-drive the composition here with staging snapshots
    val before = PipelineQueries.queries("pipe_seqs_curated")(spark, dir)
      .collect()
    // keeper takedown semantics at the CLUSTER level: a retracted
    // %50==3 base doc anchors a planted near-dup cluster (its +20M
    // copy, when the doc has >= 10 tokens); the one-shot clustering of
    // the corpus-without elects the copy as its own keeper
    val c = DedupQueries.corpus(spark, dir)
    val anchors = c.filter(col("doc_id") < 10000000L &&
        col("doc_id") % 50 === 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(anchors.nonEmpty, "no takedown anchors at this SF")
    val copies = c.filter(col("doc_id") >= 20000000L)
      .select("doc_id").collect().map(_.getLong(0))
      .filter(id => anchors.contains(id - 20000000L))
    assert(copies.nonEmpty, "no surviving near-dup copies to promote")
    // the retract leg's own output is oracle-gated (Verify); here pin
    // the PROMOTION: the retract artifact must contain the surviving
    // copies' doc ids (they pass the same gates as their anchors up to
    // the 2-token drop) whenever the one-shot-without keeps them
    val rows = PipelineQueries.queries("pipe_seqs_curated_retract")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    // reconciliation columns must close on the maintained artifact too
    rows.foreach { r =>
      assert(r.getAs[Boolean]("docs_ok"), "docs_ok failed on retract leg")
      assert(r.getAs[Boolean]("tokens_ok"), "tokens_ok failed on retract leg")
    }
    // and the artifact MOVED: kept_docs can legitimately stay equal
    // (every retracted keeper replaced 1:1 by its promoted copy), but
    // the content fingerprints cover doc ids — a promoted +20M copy
    // can never fingerprint like its retracted anchor
    val fpBefore = before.map(r => r.getAs[Long]("shard") ->
      r.getAs[Long]("content_fp")).toMap
    val fpAfter = rows.map(r => r.getAs[Long]("shard") ->
      r.getAs[Long]("content_fp")).toMap
    assert(fpBefore != fpAfter,
      "takedown was a no-op: every shard's content_fp unchanged")
  }

  test("curated incremental: append re-pack rewrites ONLY touched shard dirs") {
    import graft.queries.{DedupQueries, PipelineQueries, TextQueries}
    import graft.operators.Dedup
    // re-drive the leg's staging manually so the export dir is known
    // and the pre-append state can be snapshotted
    val base = DedupQueries.corpus(spark, dir).localCheckpoint(true)
    val kept0 = PipelineQueries.queries("pipe_curate")(spark, dir)
      .select("doc_id")
      .join(base, "doc_id").select("doc_id", "text").localCheckpoint(true)
    val counts0 = TextQueries.bpeDocPiecesOf(spark, dir, kept0)
      .select(col("doc_id"),
        PipelineQueries.docShard(col("doc_id")).as("shard"), col("n_toks"))
    val eDir = java.nio.file.Files
      .createTempDirectory("graft_curinc_spec_").toString + "/export"
    PipelineQueries.exportShip(
      PipelineQueries.seqSpansOfCounts(counts0), eDir)
    val beforeDirs = new java.io.File(eDir).listFiles
      .filter(_.getName.startsWith("shard="))
      .map(d => d.getName -> dirState(d)).toMap
    // a sparse promoted batch (fresh keepers, as the registered leg's
    // gates would admit them) lands by touched-shard re-pack
    val promoted = base.filter(col("doc_id") % 97 === 5 &&
        col("doc_id") < 10000000L)
      .join(kept0.select("doc_id"), Seq("doc_id"), "left_anti")
      .select((col("doc_id") + 30000000L).as("doc_id"), col("text"))
      .localCheckpoint(true)
    val promotedCounts = TextQueries.bpeDocPiecesOf(spark, dir,
        promoted)
      .select(col("doc_id"),
        PipelineQueries.docShard(col("doc_id")).as("shard"), col("n_toks"))
      .localCheckpoint(true)
    val touched = promotedCounts.select("shard").distinct()
      .collect().map(r => s"shard=${r.getLong(0)}").toSet
    assert(touched.nonEmpty && (beforeDirs.keySet -- touched).nonEmpty,
      s"staging degenerate: touched=$touched of ${beforeDirs.keySet.size}")
    PipelineQueries.seqRepackShards(spark, eDir,
      touched.map(_.stripPrefix("shard=").toLong).toSeq,
      Some(promotedCounts), None)
    (beforeDirs.keySet -- touched).foreach { d =>
      assert(dirState(new java.io.File(s"$eDir/$d")) == beforeDirs(d),
        s"untouched dir $d was rewritten")
    }
  }

  test("mm curated triad: both legs close slots_ok and the takedown moves the artifact") {
    import graft.queries.PipelineQueries
    val oneShot = PipelineQueries.queries("pipe_seqs_mm_curated")(spark, dir)
      .collect()
    val inc = PipelineQueries
      .queries("pipe_seqs_mm_curated_incremental")(spark, dir).collect()
    val ret = PipelineQueries
      .queries("pipe_seqs_mm_curated_retract")(spark, dir).collect()
    Seq("one-shot" -> oneShot, "incremental" -> inc, "retract" -> ret)
      .foreach { case (tag, rows) =>
        assert(rows.nonEmpty, s"$tag empty")
        rows.foreach(r => assert(r.getAs[Boolean]("slots_ok"),
          s"$tag slots_ok failed"))
      }
    // the batch grew the artifact; the takedown changed its content
    def fp(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getAs[Long]("shard") -> r.getAs[Long]("content_fp")).toMap
    assert(fp(inc) != fp(oneShot), "append leg was a no-op")
    assert(fp(ret) != fp(oneShot), "takedown leg was a no-op")
    assert(inc.head.getAs[Long]("kept_docs") > oneShot.head.getAs[Long]("kept_docs"),
      "append leg admitted no promotions")
  }

  test("freshness contract negative path: pairs ingested before their docs are seeded fail loudly") {
    import spark.implicits._
    import graft.queries.DedupQueries
    val store = s"${graft.sources.TempDirs.scratch("graft_ccneg_")}/assign"
    Seq(1L, 2L, 3L).toDF("id")
      .select(col("id"), col("id").as("label"))
      .withColumn("part", pmod(col("label"), lit(DedupQueries.CcParts)))
      .repartition(col("part"))
      .write.partitionBy("part").parquet(store)
    // a pair referencing an unseeded doc (99) — the out-of-order batch
    // the one-maintainer rule forbids; silent edge-drop would corrupt
    // every later clustering, so the ingest must throw
    val bad = Seq((1L, 99L)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      DedupQueries.ccIngest(spark, store, bad)
    }
    assert(e.getMessage.contains("not in the assignment store"))
    // the well-ordered path still works: seed THEN ingest
    DedupQueries.ccSeedAppend(spark, store, Seq(99L).toDF("id"))
    DedupQueries.ccIngest(spark, store, bad)
    val a = spark.read.parquet(store).select("id", "label").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a(99L) == 1L, "seeded pair did not merge")
    assert(a.size == 4)
  }
}
