package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{PipelineQueries, TextQueries}
import graft.sources.Tables

/** Dev tool: the sequence-artifact maintenance scale receipts for
  * BASELINE.md (not part of the driver contract). Two modes over the
  * SAME harness — `runMain graft.TokenProbe [factors...]` for the text
  * token artifact, `runMain graft.TokenProbe mm [factors...]` for the
  * MULTIMODAL artifact (patch-placeholder slots interleaved, patch_idx
  * carried through the shared slot-repack engine).
  *
  * Round 15 made the shipped token artifact self-describing (rows carry
  * doc_id, so survivor sequences are recoverable from the artifact
  * itself) and gave it a micro-batch maintenance entry point
  * ([[PipelineQueries.seqTokensMaintain]]). The scale claim this probe
  * measures: maintenance cost is
  *
  *   O(batch tokenize) + (touched shards / PackShards) x artifact I/O
  *
  * — never a corpus re-tokenize and never a full-artifact rewrite —
  * while the full rebuild (assemble + ship everything) grows linearly
  * with the corpus. At a FIXED [[PipelineQueries.PackShards]] each
  * shard dir itself grows with the corpus, so a batch touching the
  * same 2 shards pays 2/32 of a growing artifact (the fraction law
  * this probe shows at 1x vs Nx); a deployment holds the per-shard
  * size constant by scaling PackShards with the corpus, which turns
  * the same law into flat per-batch cost. The tokenizer is frozen
  * per corpus (BpeStore artifact) — its one-time training is timed
  * separately so neither side's number hides it.
  *
  * The mm mode prices the SAME law for [[PipelineQueries.seqMmMaintain]]
  * — the patch branch and the media-reference column ride the shared
  * engine, so the round-15 token receipt covered the code path but not
  * the mm artifact's own constants (wider rows, the interleave's union
  * branch); this mode closes that.
  *
  * Per corpus size it prints: train_s (one-time), rebuild_s (assemble
  * + ship all), maintain_s (a ~fixed batch of adds+takedowns confined
  * to 2 shards, through the one entry point), and the converged
  * artifact's row count as the correctness witness (maintained ==
  * rebuilt-over-final-corpus, checked exactly).
  */
object TokenProbe {
  def main(args: Array[String]): Unit = {
    val (mm, factorArgs) = args.toList match {
      case "mm" :: rest => (true, rest)
      case rest         => (false, rest)
    }
    val factors = if (factorArgs.nonEmpty) factorArgs.map(_.toInt) else List(1, 4)
    val base = "/root/testdata/sf0.1"
    val spark = graft.sources.GraftSession.local("local[8]", 16)
    spark.sparkContext.setLogLevel("WARN")

    val assemble: (SparkSession, String) => DataFrame =
      if (mm) PipelineQueries.seqMmTokens else PipelineQueries.seqTokens
    val maintain: (SparkSession, String, String,
        Option[DataFrame], Option[DataFrame]) => Unit =
      if (mm) PipelineQueries.seqMmMaintain else PipelineQueries.seqTokensMaintain
    val valueCols = if (mm) Seq("token_id", "patch_idx") else Seq("token_id")
    val probeName = if (mm) "mm_maintain" else "token_maintain"

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    factors.foreach { f =>
      val stage = graft.sources.TempDirs.scratch(s"graft_tokprobe${f}x_")
      ProbeStaging.stageDocuments(spark, base, stage, f)

      val nDocs = Tables.documents(spark, stage).count()
      // one-time tokenizer training, charged to neither side
      val trainS = time { TextQueries.bpeEnsureArtifact(spark, stage) }

      val shardOf = graft.functions.Md5Long60Expr(
        col("doc_id").cast("string"), PipelineQueries.PackSalt) %
        lit(PipelineQueries.PackShards.toLong)
      val all = Tables.documents(spark, stage).select(col("doc_id"),
        shardOf.as("shard"))
      // the maintenance batch lives in shards {0, 1} and is FIXED-SIZE
      // at every factor (the steady-state deployment shape): adds = the
      // slice's first 400 %7==3 docs (held out of the initial build),
      // takedowns = its first 200 %50==7 docs
      val inSlice = col("shard") < 2L
      // the adds batch CARRIES ITS TEXT (the deployed micro-batch
      // shape — a batch arrives as data, it is not re-read from the
      // corpus); the text join here is batch staging, outside the
      // timed maintain
      val adds = all.filter(inSlice && col("doc_id") % 7 === 3)
        .select("doc_id").orderBy("doc_id").limit(400)
        .join(Tables.documents(spark, stage).select("doc_id", "text"),
          Seq("doc_id"))
        .localCheckpoint(true)
      val dels = all.filter(inSlice && col("doc_id") % 7 =!= 3 &&
          col("doc_id") % 50 === 7)
        .select("doc_id").orderBy("doc_id").limit(200)
        .localCheckpoint(true)

      // full rebuild: assemble + ship EVERYTHING except the held-out adds
      val exp = graft.sources.TempDirs.scratch(s"graft_tokprobe_exp${f}x_")
      val initial = assemble(spark, stage)
        .join(adds, Seq("doc_id"), "left_anti")
      val rebuildS = time { PipelineQueries.exportShip(initial, exp) }

      // one maintenance micro-batch through the single entry point
      val maintainS = time {
        maintain(spark, stage, exp, Some(adds.toDF()), Some(dels.toDF()))
      }

      // correctness witness: maintained artifact == the one-shot
      // assembly of the FINAL corpus (exact anti-join count, both
      // ways). A takedown re-packs its shards — offsets recompute over
      // the survivors — so the expected state is the assembly of the
      // corpus-without-dels (re-slotted), NOT the full assembly minus
      // the deleted rows. The re-slot arithmetic is value-agnostic
      // (g = seq_id*L + pos rebased on survivor offsets), so the same
      // witness covers the mm artifact with patch_idx carried along.
      val L = PipelineQueries.PackSeqLen.toLong
      val surv = assemble(spark, stage)
        .join(dels, Seq("doc_id"), "left_anti")
        .select(Seq(col("shard"), col("doc_id"),
          (col("seq_id") * lit(L) + col("pos")).as("g")) ++
          valueCols.map(col): _*)
      val g0 = surv.groupBy("shard", "doc_id")
        .agg(min("g").as("g0"), count(lit(1)).as("n_toks"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val offs = g0.withColumn("tok_off", sum("n_toks").over(w) - col("n_toks"))
      val keyCols = Seq("shard", "seq_id", "pos", "doc_id") ++ valueCols
      val want = surv.join(offs, Seq("shard", "doc_id"))
        .select(Seq(col("shard"),
          floor((col("tok_off") + col("g") - col("g0")).cast("double")
            / lit(L.toDouble)).cast("long").as("seq_id"),
          pmod(col("tok_off") + col("g") - col("g0"), lit(L)).as("pos"),
          col("doc_id")) ++ valueCols.map(col): _*)
        .select(keyCols.map(col): _*)
      val got = spark.read.parquet(exp)
        .select((Seq(col("shard").cast("long").as("shard"), col("seq_id"),
          col("pos"), col("doc_id")) ++ valueCols.map(col)): _*)
      // multiplicity-aware compare: per-key counts PER SIDE must agree
      // (a plain union-count-==2 check is blind to a row duplicated on
      // one side and absent on the other)
      val mismatch = got.withColumn("side", lit(1L))
        .unionByName(want.withColumn("side", lit(-1L)))
        .groupBy(keyCols.map(col): _*)
        .agg(sum("side").as("d"), count(lit(1)).as("n"))
        .filter(col("d") =!= 0L || col("n") =!= 2L).count()
      val nTok = got.count()

      println(f"""{"probe":"$probeName%s","factor":$f,"n_docs":$nDocs,""" +
        f""""n_slots":$nTok,"train_s":$trainS%.2f,"rebuild_s":$rebuildS%.2f,""" +
        f""""maintain_s":$maintainS%.2f,"adds":${adds.count()},""" +
        f""""dels":${dels.count()},"mismatch_rows":$mismatch}""")
    }
    spark.stop()
  }
}
