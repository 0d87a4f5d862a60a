package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Approximate-nearest-neighbor queries over `embeddings`: brute-force
  * cosine top-k (the exactness baseline) and sign-hyperplane LSH (the
  * bucketed scale path). Query set = vec_id < 5.
  */
object SimilarityQueries {

  final val K = 10
  final val LshBits = 6
  final val Dim = 64

  private lazy val Signs = Similarity.signMatrix(LshBits, Dim)

  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), Dedup.toDoubleVec(col("embedding")).as("v"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "sim_ann_brute" -> ((s, dir) => {
      val all = vecs(s, dir)
      Similarity.bruteForceTopK(all.filter(col("vec_id") < 5), all, K)
        .orderBy("q_id", "rnk")
    }),

    // IVF-style ANN: a deterministic coarse quantizer (centroids =
    // vec_id % 29 == 3, broadcast) assigns every vector to its nearest
    // cell; queries probe their top-2 cells only. The candidate scan is
    // bounded by cell sizes instead of the full corpus — the scale path
    // when the LSH bucket distribution is too skewed. Real deployments
    // swap the modulo centroids for k-means means; the plan shape
    // (broadcast quantizer -> cell equi-join -> per-query top-k) is
    // identical.
    "sim_ann_ivf" -> ((s, dir) => {
      val all = vecs(s, dir)
      val cents = broadcast(all.filter(col("vec_id") % 29 === 3)
        .select(col("vec_id").as("cent_id"), col("v").as("cv")))
      val wAssign = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cent_id"))
      // Persist only what both consumers read — top-2 cells per vector,
      // centroid vectors and scores dropped (at scale this IS the stored
      // cell-assignment table: 2 small rows per vector, not the
      // vector x centroid score matrix).
      val ranked = all.crossJoin(cents)
        .withColumn("ccos", Dedup.cosine(col("v"), col("cv")))
        .withColumn("crn", row_number().over(wAssign))
        .filter(col("crn") <= 2)
        .select("vec_id", "v", "cent_id", "crn")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val assign = ranked.filter(col("crn") === 1)
        .select(col("vec_id").as("c_id"), col("cent_id").as("cell"), col("v").as("c_v"))
      val probes = ranked.filter(col("vec_id") < 5 && col("crn") <= 2)
        .select(col("vec_id").as("q_id"), col("cent_id").as("cell"), col("v").as("q_v"))
      val scored = broadcast(probes).join(assign, Seq("cell"))
        .filter(col("q_id") =!= col("c_id"))
        .withColumn("cosine", Dedup.cosine(col("q_v"), col("c_v")))
      val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("c_id"))
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= K)
        .select("q_id", "rnk", "c_id", "cosine")
        .orderBy("q_id", "rnk")
    }),

    "sim_ann_lsh" -> ((s, dir) => {
      val all = vecs(s, dir).withColumn("bucket", Similarity.lshBucket(col("v"), Signs))
      val q = broadcast(all.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("v").as("q_v"), col("bucket")))
      val c = all.select(col("vec_id").as("c_id"), col("v").as("c_v"), col("bucket"))
      val scored = q.join(c, Seq("bucket")).filter(col("q_id") =!= col("c_id"))
        .withColumn("cosine", Dedup.cosine(col("q_v"), col("c_v")))
      val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("c_id"))
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= K)
        .select("q_id", "rnk", "c_id", "cosine")
        .orderBy("q_id", "rnk")
    })
  )

  // ---------------------------------------------------------------- oracle

  private val dotSql: (String, String) => String = (a, b) =>
    s"list_aggregate(list_transform(list_zip($a, $b), s -> s[1] * s[2]), 'sum')"

  private def cosineSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** Bucket expression mirroring [[Similarity.lshBucket]]: literal ±1
    * signs folded through the identical sequential dot product.
    */
  private def bucketSql(v: String): String =
    Signs.zipWithIndex.map { case (row, p) =>
      val arr = row.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
      s"(CASE WHEN ${dotSql(v, s"CAST($arr AS DOUBLE[])")} >= 0.0 THEN CAST(${1L << p} AS BIGINT) ELSE 0 END)"
    }.mkString("\n    + ")

  def oracleSql: Map[String, String] = Map(

    "sim_ann_brute" ->
      s"""WITH vecs AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), scored AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |         ${cosineSql("q.v", "c.v")} AS cosine
         |  FROM vecs q JOIN vecs c ON q.vec_id < 5 AND q.vec_id != c.vec_id
         |), ranked AS (
         |  SELECT q_id, c_id, cosine,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS BIGINT) AS rnk
         |  FROM scored
         |)
         |SELECT q_id, rnk, c_id, cosine FROM ranked WHERE rnk <= $K
         |ORDER BY q_id, rnk""".stripMargin,

    "sim_ann_ivf" ->
      s"""WITH vecs AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), cents AS (
         |  SELECT vec_id AS cent_id, v AS cv FROM vecs WHERE vec_id % 29 = 3
         |), ranked AS (
         |  SELECT a.vec_id, a.v, c.cent_id,
         |         ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |                            ORDER BY ${cosineSql("a.v", "c.cv")} DESC, c.cent_id) AS crn
         |  FROM vecs a CROSS JOIN cents c
         |), assign AS (
         |  SELECT vec_id AS c_id, cent_id AS cell, v AS c_v FROM ranked WHERE crn = 1
         |), probes AS (
         |  SELECT vec_id AS q_id, cent_id AS cell, v AS q_v
         |  FROM ranked WHERE vec_id < 5 AND crn <= 2
         |), scored AS (
         |  SELECT q_id, c_id, ${cosineSql("q_v", "c_v")} AS cosine
         |  FROM probes JOIN assign USING (cell)
         |  WHERE q_id != c_id
         |), rankedq AS (
         |  SELECT q_id, c_id, cosine,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS BIGINT) AS rnk
         |  FROM scored
         |)
         |SELECT q_id, rnk, c_id, cosine FROM rankedq WHERE rnk <= $K
         |ORDER BY q_id, rnk""".stripMargin,

    "sim_ann_lsh" ->
      s"""WITH vecs AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), bucketed AS (
         |  SELECT vec_id, v,
         |    ${bucketSql("v")} AS bucket
         |  FROM vecs
         |), scored AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |         ${cosineSql("q.v", "c.v")} AS cosine
         |  FROM bucketed q JOIN bucketed c ON q.bucket = c.bucket
         |  WHERE q.vec_id < 5 AND q.vec_id != c.vec_id
         |), ranked AS (
         |  SELECT q_id, c_id, cosine,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS BIGINT) AS rnk
         |  FROM scored
         |)
         |SELECT q_id, rnk, c_id, cosine FROM ranked WHERE rnk <= $K
         |ORDER BY q_id, rnk""".stripMargin
  )
}
