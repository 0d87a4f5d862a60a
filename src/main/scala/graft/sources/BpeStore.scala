package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Persisted BPE tokenizer artifact — the [[AnnIndex]] frozen-artifact
  * discipline (trainPq / savePerm) applied to the merge list: training
  * runs ONCE, the learned merge sequence is frozen under `dir/merges`,
  * and every apply loads it instead of re-deriving it — the artifact a
  * production pipeline actually ships (a tokenizer file), and the
  * decoupling that stops apply's cost and determinism from riding on
  * the training loop.
  *
  * The merge list is K rows (K = the configured merge budget — a
  * constant, thousands at production scale), so the driver-side
  * load/save is bounded by construction, like the OPQ permutation.
  */
object BpeStore {

  /** One learned round: (rank, lhs, rhs, pair_count, n_pieces,
    * n_piece_types) — the training report row, persisted whole so the
    * train query's output can be reproduced from the artifact alone.
    */
  type Round = (Long, String, String, Long, Long, Long)

  def save(spark: SparkSession, dir: String, rounds: Seq[Round]): Unit = {
    import spark.implicits._
    rounds.toDF("merge_rank", "lhs", "rhs", "pair_count", "n_pieces",
        "n_piece_types")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/merges")
  }

  def load(spark: SparkSession, dir: String): Seq[Round] =
    spark.read.parquet(s"$dir/merges")
      .orderBy("merge_rank")
      .collect() // K rows — the artifact is constant-sized
      .toSeq.map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("pair_count"),
        r.getAs[Long]("n_pieces"), r.getAs[Long]("n_piece_types")))

  def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/merges")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("part-"))
  }

  /** The corpus BASE ALPHABET, frozen next to the merges — a shipped
    * tokenizer is merges + alphabet, and freezing both is what keeps a
    * MAINTENANCE batch from paying a corpus-wide distinct-characters
    * scan per call just to rebuild the id table (the 100 TB ingest-loop
    * tax graft.TokenProbe measured). Sorted on write; bounded (the
    * character inventory of the corpus).
    */
  def saveAlphabet(spark: SparkSession, dir: String,
      alphabet: Seq[String]): Unit = {
    import spark.implicits._
    alphabet.sorted.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toDF("ord", "ch")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/alphabet")
  }

  /** None when the artifact predates the alphabet file (e.g. frozen by
    * the train query directly) — callers derive once and backfill.
    */
  def loadAlphabet(spark: SparkSession, dir: String): Option[Seq[String]] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/alphabet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) ||
      !fs.listStatus(p).exists(_.getPath.getName.startsWith("part-"))) None
    else Some(spark.read.parquet(s"$dir/alphabet")
      .orderBy("ord").collect().map(_.getAs[String]("ch")).toSeq)
  }
}
