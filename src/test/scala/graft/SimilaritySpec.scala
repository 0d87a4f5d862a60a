package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** Scale-design properties of the ANN quantizer and the embedding-dedup
  * blocking: the quantities that must stay bounded as the corpus grows.
  */
class SimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.sources.GraftSession.local()

  /** n deterministic 64-dim vectors (values in [-1, 1)). */
  private def synthVecs(n: Int) = {
    spark.range(n.toLong).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)),
        j => (pmod(col("id") * lit(31) + j * lit(17), lit(100)) - lit(50)).cast("double") / lit(50.0)
      ).as("v"))
  }

  test("kmeansCentroids: centroid count bounded by k at any corpus size") {
    val small = Similarity.kmeansCentroids(synthVecs(300), 16, 256, 2, 64, 7)
    val large = Similarity.kmeansCentroids(synthVecs(3000), 16, 256, 2, 64, 7)
    assert(small.count() <= 16)
    assert(large.count() <= 16) // 10x the corpus, same quantizer size
  }

  test("kmeansCentroids: deterministic (same data => identical centroids)") {
    val a = Similarity.kmeansCentroids(synthVecs(500), 8, 128, 2, 64, 7)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    val b = Similarity.kmeansCentroids(synthVecs(500), 8, 128, 2, 64, 7)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    assert(a.length == b.length && a.zip(b).forall { case (x, y) =>
      x._1 == y._1 && x._2 == y._2 })
  }

  test("kmeansCentroids: centroids partition the corpus into non-trivial cells") {
    val vecs = synthVecs(500)
    val cents = broadcast(Similarity.kmeansCentroids(vecs, 16, 256, 2, 64, 7))
    val assigned = vecs.crossJoin(cents)
      .withColumn("cc", Dedup.cosine(col("v"), col("cv")))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("cc").desc, col("cent_id"))))
      .filter(col("rn") === 1)
    val cells = assigned.groupBy("cent_id").count().collect()
    assert(cells.map(_.getLong(1)).sum == 500)
    assert(cells.length > 1, "all vectors in one cell: quantizer degenerate")
  }

  test("signBandKeys: exact copies collide on every band") {
    val vecs = synthVecs(100)
      .select(col("vec_id"), col("v"),
        Dedup.signBandKeys(col("v"), 4, 16).as("keys"))
    val copies = vecs.select((col("vec_id") + 1000000L).as("vec_id"), col("v"), col("keys"))
    val joined = vecs.alias("a").join(copies.alias("b"),
        col("a.vec_id") + 1000000L === col("b.vec_id"))
      .select(col("a.keys").as("ka"), col("b.keys").as("kb"))
      .collect()
    assert(joined.forall(r => r.getSeq[Long](0) == r.getSeq[Long](1)))
    assert(vecs.select(size(col("keys"))).distinct().collect().map(_.getInt(0)).toSeq == Seq(4))
  }

  test("multi-probe LSH lifts recall over single-probe at fixed nBits") {
    // the tuning claim the sim_ann_recall metric exists for: probing the
    // Hamming-1 neighborhood must never lose candidates (the identity
    // mask is probe 0) and, on real data, must find strictly more
    val dir = "/root/testdata/sf0.001"
    val recall = graft.queries.SimilarityQueries.queries("sim_ann_recall")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val qids = recall.keys.map(_._2).toSeq.distinct
    qids.foreach { q =>
      assert(recall(("lsh_mp", q)) >= recall(("lsh", q)),
        s"multi-probe lost recall for query $q")
    }
    val lift = qids.map(q => recall(("lsh_mp", q)) - recall(("lsh", q))).sum
    assert(lift > 0.0, "multi-probe showed no recall lift on testdata")

    // IVF probe depth: a deeper probe searches a superset of cells, so
    // per-query recall is monotone in nProbe — the trade the parameter
    // exists to tune (more cells searched = more cost, never less
    // recall). "ivf" is the default depth (IvfProbe = 2).
    qids.foreach { q =>
      assert(recall(("ivf", q)) >= recall(("ivf_p1", q)),
        s"nProbe=2 lost recall vs nProbe=1 for query $q")
      assert(recall(("ivf_p4", q)) >= recall(("ivf", q)),
        s"nProbe=4 lost recall vs nProbe=2 for query $q")
    }
  }
}
