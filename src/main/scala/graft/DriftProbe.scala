package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.queries

/** Dev tool: the retrain-lifecycle receipt for BASELINE.md (not part of
  * the driver contract).
  *
  * Stages the drifted-corpus scenario of `sim_ann_ivf_retrain` /
  * `sim_ann_pq_retrain` at 1x and Nx corpus size and measures the three
  * numbers the quantizer-health gauges exist for:
  *
  *   - recall@10 of WAVE queries (the new distribution's own users) on
  *     the STALE quantizer after the frozen-quantizer upsert — the
  *     degradation the gauge detects;
  *   - the same recall after the retrain — the recovery that justifies
  *     paying for it;
  *   - the retrain's wall cost (Lloyd over the live corpus + the full
  *     re-assign/re-encode + swap) at 1x vs Nx — the 100 TB line item:
  *     the re-encode is O(live corpus), unlike every other maintenance
  *     path in the index family (upsert/delete are batch-bounded).
  *
  * Corpus at Nx follows ScaleProbe's embedding recipe (ids shifted,
  * dims rotated per copy: genuinely different vectors, fixed query set).
  */
object DriftProbe {
  final val K = 10

  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 10
    val base = "/root/testdata/sf0.1"
    val spark = graft.sources.GraftSession.local("local[8]", 16)
    spark.sparkContext.setLogLevel("WARN")

    def corpusAt(f: Int): DataFrame = {
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
      (0 until f).map { c =>
        val rot =
          if (c == 0) col("embedding")
          else concat(slice(col("embedding"), c + 1, 64 - c),
            slice(col("embedding"), 1, c))
        emb.select((col("vec_id") + lit(c.toLong * 100000000L)).as("vec_id"),
          Dedup.toDoubleVec(rot).as("v"))
      }.reduce(_ unionByName _)
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // recall@K of `res` (q_id, c_id) against brute truth on the union
    def recallOf(res: DataFrame, truth: DataFrame): Double = {
      val hits = truth.select("q_id", "c_id")
        .join(res.select("q_id", "c_id"), Seq("q_id", "c_id"), "left_semi")
        .count()
      val tot = truth.count()
      hits.toDouble / tot.toDouble
    }

    for (f <- Seq(1, factor)) {
      val all = corpusAt(f).localCheckpoint(true)
      val n = all.count()
      val off = all.agg(max("vec_id")).collect()(0).getLong(0) + 1L
      val wave = all.filter(col("vec_id") % 3 === 0)
        .select((col("vec_id") + lit(off)).as("vec_id"),
          transform(col("v"), x => x + lit(2.0)).as("v"))
        .localCheckpoint(true)
      val union = all.unionByName(wave).localCheckpoint(true)
      // 5 wave queries — the new distribution probing its own corpus
      val q = wave.orderBy("vec_id").limit(5).localCheckpoint(true)
      val truth = Similarity.bruteForceTopK(q, union, K).localCheckpoint(true)

      // ---------------------------------------------------------- IVF
      // drifted ingest under a frozen quantizer shows up two ways: the
      // gauge (wave rows quantize worse than base rows) and CELL
      // IMBALANCE — the wave piles into the few stale cells nearest its
      // new region, so probes of the hot cells scan a store-sized
      // partition. Both should recover after retrain.
      def maxShare(dir: String): Double = {
        val pops = spark.read.parquet(s"$dir/assign")
          .groupBy("cell").count().agg(max("count"), sum("count")).head()
        pops.getLong(0).toDouble / pops.getLong(1).toDouble
      }
      // rows a wave probe actually scans: population of its top-`np` cells
      def probeMass(dir: String, np: Int = 2): Double = {
        val cents = broadcast(
          graft.sources.AnnIndex.ivfCentroids(spark, dir))
        val pops = spark.read.parquet(s"$dir/assign")
          .groupBy(col("cell").cast("long").as("cent_id")).count()
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("q_id")
          .orderBy(col("ccos").desc, col("cent_id"))
        q.select(col("vec_id").as("q_id"), col("v").as("q_v"))
          .crossJoin(cents)
          .withColumn("ccos", Dedup.cosine(col("q_v"), col("cv")))
          .withColumn("crn", row_number().over(w))
          .filter(col("crn") <= np)
          .join(pops, Seq("cent_id"))
          .groupBy("q_id").agg(sum("count").as("rows"))
          .agg(avg("rows")).head().getDouble(0)
      }
      val ivfDir = graft.sources.TempDirs.scratch("graft_driftivf_")
      graft.sources.AnnIndex.saveIvf(all, 16, 256, 2, 64, 7, ivfDir)
      graft.sources.AnnIndex.upsertIvf(spark, ivfDir, wave)
      val gauge = graft.sources.AnnIndex
        .ivfDriftStats(spark, ivfDir, col("vec_id") >= off)
        .collect().map(r => r.getBoolean(0) -> r.getDouble(2)).toMap
      val (shareStale, massStale) = (maxShare(ivfDir), probeMass(ivfDir))
      val stale = recallOf(
        graft.sources.AnnIndex.probeIvf(spark, ivfDir,
          q.select(col("vec_id").as("q_id"), col("v").as("q_v")), K, 2), truth)
      val tIvf = time {
        graft.sources.AnnIndex.retrainIvf(spark, ivfDir, 16, 256, 2, 64, 7)
      }
      val gauge2 = graft.sources.AnnIndex
        .ivfDriftStats(spark, ivfDir, col("vec_id") >= off)
        .collect().map(r => r.getBoolean(0) -> r.getDouble(2)).toMap
      val (shareFresh, massFresh) = (maxShare(ivfDir), probeMass(ivfDir))
      val fresh = recallOf(
        graft.sources.AnnIndex.probeIvf(spark, ivfDir,
          q.select(col("vec_id").as("q_id"), col("v").as("q_v")), K, 2), truth)
      // matched-scan-budget leg: the stale index's recall is bought by
      // scanning the hot cell — compare the retrained index given a
      // similar row budget (deeper nProbe over now-small cells)
      val mass4 = probeMass(ivfDir, 4)
      val fresh4 = recallOf(
        graft.sources.AnnIndex.probeIvf(spark, ivfDir,
          q.select(col("vec_id").as("q_id"), col("v").as("q_v")), K, 4), truth)
      println(f"IVF  ${f}x n=$n gauge wave=${gauge(true)}%.4f->${gauge2(true)}%.4f " +
        f"base=${gauge(false)}%.4f max_cell_share=$shareStale%.3f->$shareFresh%.3f " +
        f"probe_rows=$massStale%.0f->$massFresh%.0f " +
        f"recall=$stale%.3f->$fresh%.3f " +
        f"(nProbe=4: rows=$mass4%.0f recall=$fresh4%.3f) retrain_s=$tIvf%.2f")

      // ----------------------------------------------------------- PQ
      val pqDir = graft.sources.TempDirs.scratch("graft_driftpq_")
      graft.sources.AnnIndex.trainPq(all, 4, 16, 8, 256, 2, 11, pqDir)
      graft.sources.AnnIndex.upsertPq(spark, pqDir, all)
      graft.sources.AnnIndex.upsertPq(spark, pqDir, wave)
      val pqGauge = graft.sources.AnnIndex
        .pqDriftStats(spark, pqDir, union, col("vec_id") >= off)
        .collect().map(r => r.getBoolean(0) -> r.getDouble(2)).toMap
      val pqStale = recallOf(
        graft.sources.AnnIndex.probePq(spark, pqDir, q, K, 4, 16), truth)
      val tPq = time {
        graft.sources.AnnIndex.retrainPq(spark, pqDir, union, 256, 2, 11)
      }
      // the PQ recovery receipt is RECONSTRUCTION quality: after the
      // re-fit + re-encode, wave rows quantize as well as base rows
      val pqGauge2 = graft.sources.AnnIndex
        .pqDriftStats(spark, pqDir, union, col("vec_id") >= off)
        .collect().map(r => r.getBoolean(0) -> r.getDouble(2)).toMap
      val pqFresh = recallOf(
        graft.sources.AnnIndex.probePq(spark, pqDir, q, K, 4, 16), truth)
      println(f"PQ   ${f}x n=$n gauge wave=${pqGauge(true)}%.4f->${pqGauge2(true)}%.4f " +
        f"base=${pqGauge(false)}%.4f->${pqGauge2(false)}%.4f " +
        f"recall=$pqStale%.3f->$pqFresh%.3f retrain_s=$tPq%.2f")

      // -------------------------------------------------------- IVF+PQ
      val ipDir = graft.sources.TempDirs.scratch("graft_driftivfpq_")
      graft.sources.AnnIndex.trainIvfPq(all, 16, 256, 2, 64, 7, 4, 16, 8, 11, ipDir)
      graft.sources.AnnIndex.upsertIvfPq(spark, ipDir, all)
      graft.sources.AnnIndex.upsertIvfPq(spark, ipDir, wave)
      val ipGauge = graft.sources.AnnIndex
        .ivfpqDriftStats(spark, ipDir, union, col("vec_id") >= off)
        .collect().map(r => r.getBoolean(0) -> r.getDouble(2)).toMap
      val ipStale = recallOf(graft.sources.AnnIndex.probeIvfPq(
        spark, ipDir, q.select(col("vec_id").as("q_id"), col("v").as("q_v")),
        union, K, 2, 4, 16, 50), truth)
      val tIp = time {
        graft.sources.AnnIndex.retrainIvfPq(spark, ipDir, union, 16, 256, 2, 64, 7, 11)
      }
      val ipGauge2 = graft.sources.AnnIndex
        .ivfpqDriftStats(spark, ipDir, union, col("vec_id") >= off)
        .collect().map(r => r.getBoolean(0) -> r.getDouble(2)).toMap
      val ipFresh = recallOf(graft.sources.AnnIndex.probeIvfPq(
        spark, ipDir, q.select(col("vec_id").as("q_id"), col("v").as("q_v")),
        union, K, 2, 4, 16, 50), truth)
      println(f"IVFPQ ${f}x n=$n gauge wave=${ipGauge(true)}%.4f->${ipGauge2(true)}%.4f " +
        f"base=${ipGauge(false)}%.4f recall=$ipStale%.3f->$ipFresh%.3f " +
        f"retrain_s=$tIp%.2f")
    }
    spark.stop()
  }
}
