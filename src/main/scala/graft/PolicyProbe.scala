package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev tool: the gauge-amortization receipt for BASELINE.md (not part
  * of the driver contract).
  *
  * Round 14 wired the IVF retrain policy into the ingest loop, but its
  * gauge read was one FULL store scan per batch — fine at driver scale,
  * the dominant ingest term at 100 TB with small batches (the VERDICT's
  * one prospective scale flag). This probe measures the fix:
  *
  *   - config `full`   — checkEvery = 1, no sampling (round-14 shape);
  *   - config `amort`  — checkEvery = K (one store scan per K batches),
  *     gaugeSampleMod = 8 (the scan reads a deterministic 1/8 sample),
  *     plus the per-batch O(batch) batch-population dial.
  *
  * Reported per store size: mean per-batch ingest wall under each
  * config, the bare upsert wall (the floor no policy can beat), and —
  * the detection half of the trade — whether a drifted wave still
  * retrains AT ITS OWN BATCH under `amort` (it must: the batch dial is
  * store-size-independent, which is also the dilution fix — a small
  * degenerate wave can't hide inside a big healthy store's mean).
  */
object PolicyProbe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 40
    val base = "/root/testdata/sf0.1"
    val spark = graft.sources.GraftSession.local("local[8]", 16)
    spark.sparkContext.setLogLevel("WARN")

    def corpusAt(f: Int): DataFrame = {
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
      (0 until f).map { c =>
        val rot =
          if (c == 0) col("embedding")
          else concat(slice(col("embedding"), c % 63 + 1, 64 - c % 63),
            slice(col("embedding"), 1, c % 63))
        emb.select((col("vec_id") + lit(c.toLong * 100000000L)).as("vec_id"),
          Dedup.toDoubleVec(rot).as("v"))
      }.reduce(_ unionByName _)
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val all = corpusAt(factor).localCheckpoint(true)
    val n = all.count()
    // 8 ingest batches of ~n/40 rows each + the base store
    val baseStore = all.filter(pmod(col("vec_id"), lit(5L)) =!= 0L)
      .localCheckpoint(true)
    val batches = (0 until 8).map { i =>
      all.filter(pmod(col("vec_id"), lit(5L)) === 0L &&
          pmod(col("vec_id") / lit(5L), lit(8L)) === i.toLong)
        .localCheckpoint(true)
    }
    val off = all.agg(max("vec_id")).collect()(0).getLong(0) + 1L
    val wave = all.filter(col("vec_id") % 37 === 0)
      .select((col("vec_id") + lit(off)).as("vec_id"),
        transform(col("v"), x => x + lit(2.0)).as("v"))
      .localCheckpoint(true)
    println(s"POLICY n=$n base=${baseStore.count()} wave=${wave.count()}")

    def stage(tag: String, checkEvery: Int, sampleMod: Long,
              batchDial: Double): Unit = {
      val dir = graft.sources.TempDirs.scratch(s"graft_polprobe_${tag}_")
      graft.sources.AnnIndex.saveIvf(baseStore, 16, 256, 2, 64, 7, dir)
      val storeMean = graft.sources.AnnIndex
        .ivfDriftStats(spark, dir, lit(true)).collect()(0).getDouble(2)
      var healthyRetrains = 0
      val perBatch = batches.map { b =>
        time {
          if (graft.sources.AnnIndex.upsertIvfWithPolicy(spark, dir, b,
            16, 256, 2, 64, 7, minMeanCcos = storeMean - 0.1,
            minBatchMeanCcos = batchDial, checkEvery = checkEvery,
            gaugeSampleMod = sampleMod)) healthyRetrains += 1
        }
      }
      // the bare upsert floor (same batches, no policy at all)
      val bareDir = graft.sources.TempDirs.scratch(s"graft_polbare_${tag}_")
      graft.sources.AnnIndex.saveIvf(baseStore, 16, 256, 2, 64, 7, bareDir)
      val bare = batches.map(b => time {
        graft.sources.AnnIndex.upsertIvf(spark, bareDir, b)
      })
      var waveFired = false
      val waveT = time {
        waveFired = graft.sources.AnnIndex.upsertIvfWithPolicy(spark, dir,
          wave, 16, 256, 2, 64, 7, minMeanCcos = storeMean - 0.1,
          minBatchMeanCcos = batchDial, checkEvery = checkEvery,
          gaugeSampleMod = sampleMod)
      }
      println(f"POLICY config=$tag store_mean=$storeMean%.4f " +
        f"mean_batch_s=${perBatch.sum / 8}%.2f " +
        f"bare_upsert_s=${bare.sum / 8}%.2f healthy_retrains=$healthyRetrains%d " +
        f"wave_batch_s=$waveT%.2f wave_retrained=$waveFired%b")
      // post-hoc population split: what the wave's own mean actually was
      if (!waveFired) {
        val g = graft.sources.AnnIndex
          .ivfDriftStats(spark, dir, col("vec_id") >= off)
          .collect().map(r => r.getBoolean(0) -> r.getDouble(2)).toMap
        println(f"POLICY config=$tag wave_mean=${g.getOrElse(true, -1.0)}%.4f " +
          f"base_mean=${g.getOrElse(false, -1.0)}%.4f")
      }
    }

    // round-14 shape: full store gauge every batch, no batch dial
    stage("full", checkEvery = 1, sampleMod = 1L,
      batchDial = Double.NegativeInfinity)
    // amortized: store scan every 8th batch on a 1/8 sample; the
    // O(batch) batch dial carries wave detection at every batch
    val probeDial = {
      // derive the batch dial from the measured populations: midway
      // between the base store's mean and the staged wave's own mean
      val d = graft.sources.TempDirs.scratch("graft_poldial_")
      graft.sources.AnnIndex.saveIvf(baseStore, 16, 256, 2, 64, 7, d)
      graft.sources.AnnIndex.upsertIvf(spark, d, wave)
      val g = graft.sources.AnnIndex
        .ivfDriftStats(spark, d, col("vec_id") >= off)
        .collect().map(r => r.getBoolean(0) -> r.getDouble(2)).toMap
      println(f"POLICY dial_base=${g(false)}%.4f dial_wave=${g(true)}%.4f")
      (g(true) + g(false)) / 2.0
    }
    stage("amort", checkEvery = 8, sampleMod = 8L, batchDial = probeDial)

    spark.stop()
  }
}
