package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-7 surface additions: exact per-group reservoir
  * caps, BPE-ish piece extraction edge cases, and k-NN-graph shape.
  */
class PipelineSurfaceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.sources.GraftSession.local()
  private val dir = "/root/testdata/sf0.001"

  /** Low 60 bits (first 15 hex chars) of md5 — the Md5Long60Expr /
    * DuckDB md5-prefix twin used by the fp-fold tie-back pins. */
  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.take(15), 16)
  }

  test("pipe_export_incremental: a sparse append rewrites ONLY its touched shard dirs; result equals the one-shot pack") {
    import org.apache.spark.sql.functions._
    import graft.queries.PipelineQueries
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").localCheckpoint(true)
    val sparse = col("doc_id") % 97 === 5 // a handful of docs -> few shards
    val eDir = java.nio.file.Files
      .createTempDirectory("graft_exinc_spec_").toString + "/export"
    PipelineQueries.exportShip(
      PipelineQueries.packedSeqsOf(docs.filter(not(sparse))), eDir)
    // snapshot every shard dir's file listing + mtimes before the append
    def dirState(p: java.io.File) =
      p.listFiles.map(f => (f.getName, f.lastModified, f.length)).toSet
    val before = new java.io.File(eDir).listFiles
      .filter(_.getName.startsWith("shard="))
      .map(d => d.getName -> dirState(d)).toMap
    val touched = docs.filter(sparse)
      .select((graft.functions.Md5Long60Expr(col("doc_id").cast("string"),
        PipelineQueries.PackSalt) % lit(PipelineQueries.PackShards.toLong))
        .as("shard"))
      .distinct().collect().map(r => s"shard=${r.getLong(0)}").toSet
    assert(touched.nonEmpty && (before.keySet -- touched).nonEmpty,
      s"staging degenerate: touched=$touched of ${before.keySet.size} dirs")
    PipelineQueries.exportAppend(spark, docs.filter(sparse), eDir)
    // untouched dirs: byte-identical file listing (never rewritten)
    (before.keySet -- touched).foreach { d =>
      assert(dirState(new java.io.File(s"$eDir/$d")) == before(d),
        s"untouched dir $d was rewritten by the append")
    }
    // and the delta-maintained artifact equals the one-shot pack
    val got = spark.read.parquet(eDir)
      .select(col("doc_id"), col("shard").cast("long").as("shard"),
        col("n_tokens"), col("offset"), col("seq_id"))
      .collect().map(_.toSeq).toSet
    val want = PipelineQueries.packedSeqsOf(docs)
      .collect().map(_.toSeq).toSet
    assert(got == want, "delta export diverged from the one-shot pack")
  }

  test("sample_reservoir: every stratum capped at ReservoirN with contiguous ranks") {
    val res = graft.queries.PipelineQueries.queries("sample_reservoir")(spark, dir)
    val perLang = res.groupBy("lang")
      .agg(count(lit(1)).as("n"), max("rnk").as("mx"), min("rnk").as("mn"))
      .collect()
    assert(perLang.nonEmpty)
    perLang.foreach { r =>
      val (n, mx, mn) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n <= graft.queries.PipelineQueries.ReservoirN)
      assert(mn == 1L && mx == n, s"ranks not contiguous for ${r.getString(0)}")
    }
  }

  test("sample_reservoir: deterministic across runs") {
    val q = graft.queries.PipelineQueries.queries("sample_reservoir")
    val a = q(spark, dir).collect().map(_.toSeq).toSeq
    val b = q(spark, dir).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("bpePieces: splits letter/digit/punct runs and keeps the leading space glued") {
    import spark.implicits._
    val rows = Seq("", "hello world", "ab12cd!", "a  b").toDF("text")
      .select(graft.operators.TextAnalysis.bpePieces(col("text")).as("p"))
      .collect().map(_.getSeq[String](0).toList)
    assert(rows(0) == Nil)
    assert(rows(1) == List("hello", " world"))
    assert(rows(2) == List("ab", "12", "cd", "!"))
    // double space: second space has no run to glue to and is unmatched
    assert(rows(3) == List("a", " b"))
  }

  test("text_tokens: zero-guards hold on empty text (no nulls reach the driver compare)") {
    import spark.implicits._
    // run the same expression tree the query uses, on edge-case docs
    val d = Seq((1L, ""), (2L, "   "), (3L, "one two")).toDF("doc_id", "text")
    val base = d.select(col("doc_id"),
      graft.operators.TextAnalysis.bpePieces(col("text")).as("p"),
      graft.operators.TextAnalysis.tokenCount(col("text")).cast("long").as("n_ws_tokens"),
      length(col("text")).cast("long").as("n_chars"))
    val out = base.select(col("doc_id"),
        when(size(col("p")) > 0,
          col("n_chars").cast("double") / size(col("p")).cast("double"))
          .otherwise(lit(0.0)).as("chars_per_token"),
        when(col("n_ws_tokens") > 0,
          size(col("p")).cast("double") / col("n_ws_tokens").cast("double"))
          .otherwise(lit(0.0)).as("fertility"))
      .collect()
    assert(out.forall(r => !r.anyNull))
  }

  test("dedup_semantic: perturbed variants cluster with their base only transitively") {
    val r = graft.queries.DedupQueries.queries("dedup_semantic")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val byId = r.map(t => t._1 -> t._2).toMap
    val bases = r.map(_._1).filter(id => id < 10000000L && id % 10 == 3)
    assert(bases.nonEmpty)
    // Banding recall on perturbed variants is high but not guaranteed
    // (a variant whose sign bits flip in all 4 bands is deterministically
    // missed — same miss in the oracle). Captured variants MUST label to
    // their base (the component min), and most must be captured.
    val variants = bases.flatMap(b => Seq(b -> (b + 20000000L), b -> (b + 30000000L)))
    val captured = variants.filter { case (b, v) => byId(v) != v }
    captured.foreach { case (b, v) =>
      assert(byId(v) == b, s"variant $v labeled ${byId(v)}, expected base $b")
    }
    assert(captured.size * 10 >= variants.size * 7,
      s"banding captured only ${captured.size}/${variants.size} planted variants")
    // exact copies are identical vectors => identical bands => ALWAYS captured
    val exacts = r.map(_._1).filter(id => id < 10000000L && id % 10 < 3)
    assert(exacts.nonEmpty)
    exacts.foreach(b => assert(byId(b + 10000000L) == byId(b)))
  }

  test("text_rarity: broadcast-head plan equals the naive token-shuffle join") {
    // rarityCounts replaces tok ⋈ vocab (skewed shuffle) with a bounded
    // broadcast of the non-rare head set; the results must be the exact
    // same integers. Rebuild the naive form here and compare row sets.
    val denom = graft.queries.TextQueries.RarityDenom.toLong
    val d = graft.sources.Tables.documents(spark, dir)
    val tok = d.select(col("doc_id"),
      explode(graft.operators.TextAnalysis.tokens(col("text"))).as("tok"))
    val vocab = tok.groupBy("tok").agg(count(lit(1)).as("c"))
    val tot = vocab.agg(sum("c").cast("long").as("t"))
    val naive = tok.join(vocab, "tok").crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(when(col("c") * lit(denom) <= col("t"), 1L).otherwise(0L)).as("n_rare"))
      .withColumn("rare_frac",
        col("n_rare").cast("double") / col("n_tokens").cast("double"))
      .collect().map(_.toSeq).toSet
    val fast = graft.queries.TextQueries.queries("text_rarity")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(fast == naive)
    // and the corpus actually exercises both sides of the boundary
    assert(fast.exists(r => r(3).asInstanceOf[Double] > 0.0))
    assert(fast.exists(r => r(3).asInstanceOf[Double] < 1.0))
  }

  test("knnScaledBits: integer width rule holds per-bucket population ~B") {
    import graft.queries.SimilarityQueries._
    // floor at the default width, grows by ~log2 of the corpus
    assert(knnScaledBits(1L) == LshBits)
    assert(knnScaledBits(8L << LshBits) == LshBits)           // exactly full
    assert(knnScaledBits((8L << LshBits) + 1) == LshBits + 1) // one over
    assert(knnScaledBits(5000L) == 10)                        // sf0.1 corpus
    assert(knnScaledBits(Long.MaxValue) == KnnMaxBits)        // capped
    // the rule's invariant: bucket space at the chosen width holds the
    // corpus at <= B per bucket (except at the cap)
    Seq(100L, 512L, 5000L, 1000000L).foreach { n =>
      val w = knnScaledBits(n)
      assert((KnnBucketTarget.toLong << w) >= n || w == KnnMaxBits, s"n=$n w=$w")
    }
  }

  test("knnSampleStride: power-of-two stride bounds the fixed-width sample") {
    import graft.queries.SimilarityQueries._
    // stride 1 (whole corpus) at every driver test scale
    assert(knnSampleStride(500L) == 1L)
    assert(knnSampleStride(2000L) == 1L)
    assert(knnSampleStride(KnnSampleCap) == 1L)
    assert(knnSampleStride(KnnSampleCap + 1) == 2L)
    // the rule's invariant: N / stride <= Cap, stride a power of two
    Seq(1L, 4096L, 20000L, 1000000L, 1L << 40).foreach { n =>
      val s = knnSampleStride(n)
      assert((s & (s - 1)) == 0L, s"stride $s not a power of two")
      assert(n <= s * KnnSampleCap, s"n=$n stride=$s exceeds cap")
    }
  }

  test("rarityCounts edges: empty head set, dominant token, and singleton docs") {
    import spark.implicits._
    val denom = graft.queries.TextQueries.RarityDenom.toLong
    def naive(tok: org.apache.spark.sql.DataFrame) = {
      val vocab = tok.groupBy("tok").agg(count(lit(1)).as("c"))
      val tot = vocab.agg(sum("c").cast("long").as("t"))
      tok.join(vocab, "tok").crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_tokens"),
          sum(when(col("c") * lit(denom) <= col("t"), 1L).otherwise(0L)).as("n_rare"))
        .collect().map(_.toSeq).toSet
    }
    def fast(tok: org.apache.spark.sql.DataFrame) =
      graft.queries.TextQueries.rarityCounts(tok).collect().map(_.toSeq).toSet
    // uniform corpus: every token holds 1/3 of the mass -> head = all
    // three, zero rare tokens anywhere
    val uniform = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("doc_id", "tok")
    assert(fast(uniform) == naive(uniform))
    assert(fast(uniform).forall(_(2) == 0L))
    // dominant token + a long unique tail: head = the dominant token
    // only, tail all rare (tail count * denom > total requires total
    // >= denom distinct-ish tokens)
    val dominant = spark.range(600).select(lit(0L).as("doc_id"), lit("the").as("tok"))
      .unionByName(spark.range(600).select(lit(1L).as("doc_id"),
        concat(lit("w"), col("id")).as("tok")))
    assert(fast(dominant) == naive(dominant))
    val byDoc = fast(dominant).map(r => r(0) -> r(2)).toMap
    assert(byDoc(0L) == 0L)   // the hot doc is all head tokens
    assert(byDoc(1L) == 600L) // the tail doc is all rare
  }

  test("dedup_substring: exact-copy pairs recover the full-document run") {
    import graft.queries.DedupQueries
    val L = DedupQueries.SubstrLen
    val pairs = DedupQueries.queries("dedup_substring")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val toks = DedupQueries.corpus(spark, dir)
      .select(col("doc_id"), size(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every exact-arm pair (d, d+10M) with >= L tokens shares ALL its
    // windows on one diagonal: longest run = the whole doc, n_shared =
    // the full window count
    val exact = toks.keys.filter(id => id < 10000000L && toks.contains(id + 10000000L)
      && toks(id) >= L).toList
    assert(exact.nonEmpty)
    exact.foreach { id =>
      val t = toks(id).toLong
      val (n, longest) = pairs((id, id + 10000000L))
      assert(longest == t, s"doc $id: longest $longest != $t")
      assert(n == t - L + 1, s"doc $id: n_shared $n != ${t - L + 1}")
    }
    // near-arm pairs (d, d+20M) drop the 2 leading tokens: the shared
    // run is the suffix
    toks.keys.filter(id => id < 10000000L && toks.contains(id + 20000000L)
      && toks(id) - 2 >= L).foreach { id =>
      val (_, longest) = pairs((id, id + 20000000L))
      assert(longest == toks(id).toLong - 2, s"near $id: $longest")
    }
  }

  test("text_pii: raw redaction is complete and ties back to the fp fold") {
    import graft.queries.TextQueries
    val raw = TextQueries.piiReport(spark, dir).orderBy("doc_id").collect()
    assert(raw.nonEmpty)
    val email = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""".r
    var injected = 0
    raw.foreach { r =>
      val red = r.getString(4)
      // redaction is COMPLETE: no residual email survives, and every
      // injected marker class got its placeholder
      assert(email.findFirstIn(red).isEmpty, s"doc ${r.getLong(0)} leaks email")
      if (r.getLong(0) % 7 == 0) {
        assert(red.contains("<EMAIL>"), s"doc ${r.getLong(0)} email not redacted")
        injected += 1
      }
      if (r.getLong(0) % 11 == 0)
        assert(red.contains("<PHONE>"), s"doc ${r.getLong(0)} phone not redacted")
      if (r.getLong(0) % 13 == 0)
        assert(red.contains("<IP>"), s"doc ${r.getLong(0)} ip not redacted")
    }
    assert(injected > 0)
    // tie-back: registered compare columns == (length, md5-60) of raw
    val reg = graft.queries.TextQueries.queries("text_pii")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    assert(reg.size == raw.length)
    raw.foreach { r =>
      val (len, fp) = reg(r.getLong(0))
      assert(len == r.getString(4).length.toLong)
      assert(fp == md5_60(s"${TextQueries.PiiSalt}:${r.getString(4)}"))
    }
  }

  test("pipe_seqs_tokens_packed: raw streams reconcile and tie back to the fp folds") {
    import graft.queries.PipelineQueries
    val raw = PipelineQueries.seqTokensPacked(spark, dir)
      .orderBy("shard", "seq_id").collect()
    assert(raw.nonEmpty)
    raw.foreach { r =>
      val (nToks, nDocs) = (r.getLong(2), r.getLong(3))
      val toks = r.getString(4).split(",")
      val starts = r.getString(5).split(",").map(_.toLong)
      assert(toks.length.toLong == nToks, "tokens CSV length != n_toks")
      assert(starts.length.toLong == nDocs, "doc_starts CSV length != n_docs")
      assert(starts.head == 0L && starts.forall(p => p >= 0 && p < nToks))
      assert(starts.sorted.sameElements(starts), "doc_starts not ascending")
    }
    val reg = PipelineQueries.queries("pipe_seqs_tokens_packed")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(reg.size == raw.length)
    raw.foreach { r =>
      val (tl, tf, sl, sf) = reg((r.getLong(0), r.getLong(1)))
      assert(tl == r.getString(4).length.toLong)
      assert(tf == md5_60(s"${PipelineQueries.PackSalt}:${r.getString(4)}"))
      assert(sl == r.getString(5).length.toLong)
      assert(sf == md5_60(s"${PipelineQueries.PackSalt}:${r.getString(5)}"))
    }
  }

  test("ft_json: raw wire pages parse, reconcile, and tie back to the fp fold") {
    import graft.queries.ForgetQueries
    // RAW §1.4 JSON pages — the byte-level surface behind the
    // registered query's (data_len, data_fp) BIGINT folds
    val pages = ForgetQueries.jsonPages(spark, dir)
      .orderBy("dist", "page").collect()
    assert(pages.nonEmpty)
    val binRe = """\{"bin":"((?:[^"\\]|\\.)*)","count":(\d+),"p":(\d\.\d{9})\}""".r
    pages.groupBy(_.getString(0)).foreach { case (dist, rs) =>
      val z = rs.head.getLong(2)
      var total = 0L
      rs.foreach { r =>
        val data = r.getString(5)
        assert(data.startsWith("[") && data.endsWith("]"), s"$dist page envelope")
        val entries = binRe.findAllMatchIn(data).toSeq
        // every page entry matches the wire grammar exactly (no partial
        // matches hiding malformed records between them)
        assert(entries.map(_.matched).mkString("[", ",", "]") == data,
          s"$dist page has bytes outside the bin-record grammar")
        entries.foreach { m =>
          total += m.group(2).toLong
          // rendered p is count/z rounded to 9 places (HALF_UP) — gate
          // with a half-ulp tolerance, not a re-rounding (rint is
          // half-even and could disagree exactly on .5 boundaries)
          val p = m.group(3).toDouble
          assert(math.abs(p - m.group(2).toDouble / z) <= 5e-10 + 1e-12)
        }
      }
      assert(total == z, s"$dist: page masses $total != z $z")
    }
    // tie-back: registered compare columns == (length, md5-60) of raw
    val reg = ForgetQueries.queries("ft_json")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(5), r.getLong(6)))
      .toMap
    assert(reg.size == pages.length)
    pages.foreach { r =>
      val (len, fp) = reg((r.getString(0), r.getLong(1)))
      assert(len == r.getString(5).length.toLong)
      assert(fp == md5_60(s"${ForgetQueries.JsonFpSalt}:${r.getString(5)}"))
    }
  }

  test("dedup_substring_scrub: keep-first, exact copies die, counts reconcile") {
    import graft.queries.DedupQueries
    // the RAW rebuilt text — byte-level surface behind the registered
    // query's (clean_len, clean_fp) BIGINT folds
    val rows = DedupQueries.substringScrubbed(spark, dir)
      .orderBy("doc_id").collect()
    assert(rows.nonEmpty)
    // tie-back: the registered compare columns are exactly
    // (length, md5-60("ScrubSalt:" + text)) of the raw clean_text
    val reg = DedupQueries.queries("dedup_substring_scrub")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    assert(reg.size == rows.length)
    rows.foreach { r =>
      val (id, clean) = (r.getLong(0), r.getString(4))
      val (len, fp) = reg(id)
      assert(len == clean.length.toLong, s"doc $id clean_len mismatch")
      assert(fp == md5_60(s"${DedupQueries.ScrubSalt}:$clean"),
        s"doc $id clean_fp mismatch")
    }
    rows.foreach { r =>
      val (id, nTok, removed, clean) =
        (r.getLong(0), r.getLong(1), r.getLong(3), r.getString(4))
      // clean_text token count == n_tokens - tokens_removed
      val cleanToks = if (clean.isEmpty) 0L
        else clean.split(" ").count(_.nonEmpty).toLong
      assert(cleanToks == nTok - removed, s"doc $id: $cleanToks != $nTok-$removed")
      assert(removed <= nTok, s"doc $id over-removed")
    }
    // keep-first: spans only ever scrub the HIGHER id of a pair, so
    // (a) every exact copy (+10M arm) dies entirely, (b) every scrubbed
    // doc is some pair's id_b, and (c) the globally lowest paired doc
    // can never be scrubbed (it is nobody's id_b) — one canonical copy
    // of duplicated content always survives.
    val pairs = DedupQueries.queries("dedup_substring")(spark, dir).collect()
    val bIds = pairs.map(_.getLong(1)).toSet
    val exactCopies = rows.map(_.getLong(0)).filter(_ >= 10000000L)
      .filter(_ < 20000000L)
    assert(exactCopies.nonEmpty)
    exactCopies.foreach { id =>
      val r = rows.find(_.getLong(0) == id).get
      assert(r.getLong(3) == r.getLong(1), s"copy $id not fully scrubbed")
    }
    rows.foreach(r => assert(bIds.contains(r.getLong(0)),
      s"scrubbed doc ${r.getLong(0)} is nobody's id_b"))
    val minPaired = (pairs.map(_.getLong(0)) ++ pairs.map(_.getLong(1))).min
    assert(!rows.exists(_.getLong(0) == minPaired),
      s"lowest paired doc $minPaired was scrubbed")
  }

  test("pipe_source_cap: caps bind, ranks contiguous, kept docs dominate dropped") {
    import graft.queries.PipelineQueries
    val kept = PipelineQueries.queries("pipe_source_cap")(spark, dir).collect()
    assert(kept.nonEmpty)
    val bySrc = kept.groupBy(_.getString(1))
    bySrc.foreach { case (src, rs) =>
      val ranks = rs.map(_.getLong(3)).sorted.toList
      assert(ranks.size <= PipelineQueries.SourceCap)
      assert(ranks == (1L to ranks.size).toList, s"ranks not contiguous for $src")
    }
    // no dropped doc outranks a kept one within its source
    val all = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        graft.operators.TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val keptIds = kept.map(_.getLong(0)).toSet
    bySrc.foreach { case (src, rs) =>
      if (rs.length == PipelineQueries.SourceCap) {
        val worstKept = rs.map(_.getDouble(2)).min
        all.filter(a => a._2 == src && !keptIds.contains(a._1)).foreach { a =>
          assert(a._3 <= worstKept, s"dropped ${a._1} outranks kept in $src")
        }
      }
    }
  }

  test("sim_knn_graph: no self-edges, at most KnnK neighbors, ranks contiguous") {
    val g = graft.queries.SimilarityQueries.queries("sim_knn_graph")(spark, dir)
    val rows = g.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)), "self-edge found")
    val perQ = rows.groupBy(_.getLong(0))
    perQ.foreach { case (q, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted.toList
      assert(ranks.size <= graft.queries.SimilarityQueries.KnnK)
      assert(ranks == (1L to ranks.size).toList, s"ranks not contiguous for q=$q")
    }
    // the sampling cap is SURFACED: a stride column present on every row,
    // 1 at test scale (full corpus — the graph is not a silent sample)
    assert(g.columns.contains("stride"), "stride column missing")
    assert(rows.forall(_.getAs[Long]("stride") == 1L), "expected stride 1 at test scale")
  }

  test("pq_code_stats: grid spans exactly the codes relation's value domain") {
    val sq = graft.queries.SimilarityQueries
    val stats = sq.queries("pq_code_stats")(spark, dir).collect()
    assert(stats.length == sq.PqM * sq.PqK)
    val emitted = stats.map(r => r.getAs[Long]("code")).toSet
    // every code id the report emits must be a value the encoder can
    // actually produce (cent_ids number 1..PqK) — a 0-based grid would
    // report a phantom dead code 0 and silently drop code PqK
    assert(emitted == (1L to sq.PqK.toLong).toSet,
      s"grid domain $emitted != encoder domain 1..${sq.PqK}")
    // populations per subspace must account for every encoded vector:
    // shares sum to 1 within each m
    stats.groupBy(_.getAs[Long]("m")).foreach { case (m, rs) =>
      val share = rs.map(_.getAs[Double]("share")).sum
      assert(math.abs(share - 1.0) < 1e-9, s"shares for m=$m sum to $share, not 1")
    }
  }

  test("text_lm_surprisal: planted-OOV docs outrank every clean doc; backoff fires; head LM broadcastable") {
    val tq = graft.queries.TextQueries
    val rows = tq.queries("text_lm_surprisal")(spark, dir).collect()
    assert(rows.nonEmpty)
    val (noisy, clean) = rows.partition(_.getAs[Long]("doc_id") % 20 == 0)
    assert(noisy.nonEmpty && clean.nonEmpty)
    // the filter's job: junk-planted docs score above clean docs. At
    // this 50-doc SF integer-bit quantization can tie single docs (at
    // sf0.01 the separation is strict per-doc: min noisy 5.12 > max
    // clean 4.93), so pin the mean gap plus every noisy doc at or
    // above every clean doc
    val minNoisy = noisy.map(_.getAs[Double]("mean_bits")).min
    val maxClean = clean.map(_.getAs[Double]("mean_bits")).max
    assert(minNoisy >= maxClean,
      s"inversion: min noisy $minNoisy < max clean $maxClean")
    val avgNoisy = noisy.map(_.getAs[Double]("mean_bits")).sum / noisy.length
    val avgClean = clean.map(_.getAs[Double]("mean_bits")).sum / clean.length
    assert(avgNoisy > avgClean,
      s"no mean separation: $avgNoisy <= $avgClean")
    assert(noisy.forall(_.getAs[Long]("n_unseen") >= 3L),
      "planted junk bigrams were not scored through the backoff")
    assert(clean.forall(r => r.getAs[Long]("n_bigrams") == 0L ||
      r.getAs[Long]("n_unseen") * 20L <= r.getAs[Long]("n_bigrams")),
      "clean docs should be near-fully covered by the train LM")
    // the mass bound behind the broadcast, checked numerically: the
    // head set (bigrams each holding > 1/LmHeadBound of train LM mass)
    // must be strictly smaller than LmHeadBound — that is what makes
    // broadcasting it unconditional at any corpus size
    // the SAME bigram stream the query trains on (lmBigrams is the
    // single definition — a drifting inline copy here would silently
    // measure a different distribution than the query uses)
    val d = graft.sources.Tables.documents(spark, dir)
    val bg = tq.lmBigrams(d).filter(col("doc_id") % 10 =!= 0)
    val counts = bg.groupBy("g").count()
    val total = counts.agg(sum("count")).collect()(0).getLong(0)
    val headN = counts
      .filter(col("count") * tq.LmHeadBound.toLong > total).count()
    assert(headN < tq.LmHeadBound, s"head set $headN >= ${tq.LmHeadBound}")
  }

  test("ft_counts_incremental: segment-store increments converge to the one-shot counts") {
    val fq = graft.queries.ForgetQueries
    val one = fq.queries("ft_counts")(spark, dir).collect().map(_.toSeq).toSeq
    val inc = fq.queries("ft_counts_incremental")(spark, dir).collect().map(_.toSeq).toSeq
    assert(inc == one, "maintained increment store diverged from the one-shot counts")
  }

  test("text_lm_incremental: append-only count segments converge to the one-shot LM") {
    val tq = graft.queries.TextQueries
    // the log-structured store's contract: sum-of-partial-counts across
    // appended segments (+ one mid-sequence compact) equals the one-shot
    // counts, so the scored output is bit-identical
    val one = tq.queries("text_lm_surprisal")(spark, dir).collect().map(_.toSeq).toSeq
    val inc = tq.queries("text_lm_incremental")(spark, dir).collect().map(_.toSeq).toSeq
    assert(inc == one, "maintained-LM scoring diverged from the one-shot LM")
  }

  test("rel_fuzzy_join: plants match their source, mangles never match, misses are starvation only") {
    val rows = graft.queries.RelationalQueries
      .queries("rel_fuzzy_join")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (probe, m, cands) = (r.getAs[Long]("probe_key"),
        r.getAs[Long]("match_key"), r.getAs[Long]("n_candidates"))
      if (probe % 4 == 3)
        assert(m == -1L, s"mangled probe $probe matched $m") // beyond FuzzyK
      else if (m >= 0)
        assert(m == probe, s"probe $probe false-linked to $m")
      else
        // a missed plant is legal ONLY via blocking starvation (every
        // informative gram df-pruned) — never a verify loss
        assert(cands == 0L, s"probe $probe had $cands candidates yet no match")
    }
    // the blocking stays banded: per-probe candidates are bounded by
    // (informative grams per name, <= 16 for these 18-char names) x the
    // df cap — and empirically sit far below the corpus size
    val maxC = rows.map(_.getAs[Long]("n_candidates")).max
    assert(maxC <= 16L * graft.queries.RelationalQueries.FuzzyMaxDf,
      s"candidate fan-out $maxC exceeds the grams x df bound")
    val corpus = graft.sources.Tables.customer(spark, dir).count()
    assert(maxC < corpus, s"fan-out $maxC is corpus-sized — blocking is not banding")
    // and the plants overwhelmingly link: at most 2 starved probes
    val nonMangle = rows.filter(_.getAs[Long]("probe_key") % 4 != 3)
    val missed = nonMangle.count(_.getAs[Long]("match_key") == -1L)
    assert(missed <= 2, s"$missed of ${nonMangle.length} plants unmatched")
  }

  test("text_bm25: top-N descending, positive head score, TakeOrdered plan (no global sort)") {
    val df = graft.queries.TextQueries.queries("text_bm25")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= graft.queries.TextQueries.Bm25TopN)
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "report is not score-descending")
    // the synthetic corpus carries the query terms: the head doc must
    // actually score, or the idf/tf plumbing is dead
    assert(scores.head > 0.0)
  }

  test("text_bpe_train: K deterministic merges, compression monotone, one new piece type per round") {
    val rows = graft.queries.TextQueries
      .queries("text_bpe_train")(spark, dir).collect()
    assert(rows.length == graft.queries.TextQueries.BpeMerges)
    // pair counts are positive and the winning pair is applied: total
    // weighted pieces strictly DECREASE, by at most the pair count —
    // each merged occurrence removes one symbol, but a SELF-ADJACENT
    // winner (lhs == rhs) counts overlapping pairs ("aaa" holds 2
    // (a,a) pairs yet merges once), so exact equality only holds when
    // no counted occurrence overlaps another
    rows.foreach(r => assert(r.getAs[Long]("pair_count") > 0L))
    val np = rows.map(_.getAs[Long]("n_pieces"))
    np.zip(np.tail).zip(rows.tail).foreach { case ((prev, cur), r) =>
      val pc = r.getAs[Long]("pair_count")
      assert(cur < prev && cur >= prev - pc,
        s"round ${r.getAs[Long]("merge_rank")}: pieces $prev -> $cur " +
          s"outside (prev - pair_count, prev) for pair_count $pc")
    }
    // each round mints exactly one new piece type (the merged symbol;
    // constituents may or may not survive elsewhere, so types grow by
    // AT MOST one and never shrink by more than two — here the corpus
    // keeps constituents alive, so it's +1 exactly)
    val nt = rows.map(_.getAs[Long]("n_piece_types"))
    nt.zip(nt.tail).foreach { case (a, b) => assert(b <= a + 1) }
    // a learned merge can itself be merged later (the "m"+"er" shape)
    // — the lhs/rhs strings are non-empty tokens over the corpus
    // alphabet, and ranks are 1..K in order
    assert(rows.map(_.getAs[Long]("merge_rank")).toSeq ==
      (1 to graft.queries.TextQueries.BpeMerges).map(_.toLong))
    rows.foreach { r =>
      assert(r.getAs[String]("lhs").nonEmpty && r.getAs[String]("rhs").nonEmpty)
    }
  }

  test("text_bpe_apply: segmentation bounded by chars and words, merges actually compress") {
    val rows = graft.queries.TextQueries
      .queries("text_bpe_apply")(spark, dir).collect()
    assert(rows.nonEmpty)
    // per-doc: at least one piece per word, never more pieces than
    // characters (a merge can only shrink the char segmentation)
    val chars = graft.queries.TextQueries.queries("text_stats")(spark, dir)
      .select("doc_id", "n_token_chars").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_token_chars")).toMap
    var merged = 0L
    rows.foreach { r =>
      val (id, w, p, f) = (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_pieces"), r.getAs[Double]("fertility"))
      assert(p >= w, s"doc $id: fewer pieces than words")
      assert(p <= chars(id), s"doc $id: more pieces than characters")
      merged += chars(id) - p
      if (w > 0) assert(math.abs(f - p.toDouble / w.toDouble) == 0.0)
    }
    // the learned merges fire somewhere: the corpus-wide segmentation
    // is strictly below the character baseline
    assert(merged > 0L, "no merge ever applied — training and apply are disconnected")
  }

  test("text_bm25_incremental: staged additive stats converge bit-for-bit to the one-shot report") {
    val oneShot = graft.queries.TextQueries
      .queries("text_bm25")(spark, dir).collect().map(_.toSeq).toSeq
    val maintained = graft.queries.TextQueries
      .queries("text_bm25_incremental")(spark, dir).collect().map(_.toSeq).toSeq
    assert(oneShot.nonEmpty)
    assert(maintained == oneShot,
      "maintained BM25 stats diverged from the one-shot corpus aggregate")
  }

  test("rel_fuzzy_join_fallback: exactly the starved probes escalate; plants recover their source, zero false links") {
    val primary = graft.queries.RelationalQueries
      .queries("rel_fuzzy_join")(spark, dir).collect()
    val starved = primary.filter(_.getAs[Long]("n_candidates") == 0L)
      .map(_.getAs[Long]("probe_key")).sorted
      .take(graft.queries.RelationalQueries.FuzzyFallbackCap).toSet
    assert(starved.nonEmpty, "no starved probe on this corpus — the fallback spec is vacuous")
    val rows = graft.queries.RelationalQueries
      .queries("rel_fuzzy_join_fallback")(spark, dir).collect()
    // the unpruned blocking is priced PER ESCALATED PROBE: its input is
    // exactly the (rate-limited) starved set, nothing else reaches it
    assert(rows.map(_.getAs[Long]("probe_key")).toSet == starved,
      "fallback probe set != the primary path's (capped) starvation set")
    rows.foreach { r =>
      val (probe, m, cands) = (r.getAs[Long]("probe_key"),
        r.getAs[Long]("match_key"), r.getAs[Long]("n_candidates"))
      // the lifted cap must actually admit candidates — that is the
      // whole point of escalating
      assert(cands > 0L, s"starved probe $probe still has no candidates under the lifted cap")
      if (probe % 4 == 3) assert(m == -1L, s"mangled probe $probe matched $m")
      else assert(m == probe, s"starved probe $probe linked to $m, not its source")
    }
  }

  test("rel_fuzzy_join_queue: >cap starved probes drain across runs oldest-first, all link, depth returns to 0") {
    import org.apache.spark.sql.functions._
    // synthetic staging that exceeds the drain cap: dfCap = 0 starves
    // EVERY probe (no gram survives the cap), 5 starved probes arrive
    // 4/1/0 across three runs against drainCap = 2, so the queue MUST
    // carry probes across runs: run 1 drains 2 of its 4, run 2 drains
    // the two LEFT-OVER run-1 probes (oldest-first) before touching
    // its own arrival, run 3 drains the last.
    val spark2 = spark
    import spark2.implicits._
    val cust = (1 to 60).map(i => (i.toLong, f"Entity#$i%04d"))
      .toDF("c_custkey", "c_name")
    val probes = cust.filter(col("c_custkey") <= 5)
      .select(col("c_custkey").as("probe_key"),
        concat(lit("X"),
          col("c_name").substr(lit(2), length(col("c_name")))).as("dirty_name"))
    val batches = Seq(
      probes.filter(col("probe_key") <= 4),
      probes.filter(col("probe_key") === 5),
      probes.filter(lit(false)))
    val rows = graft.queries.RelationalQueries.fuzzyQueueStaged(
      spark, cust, batches, gram = 3, dfCap = 0, drainCap = 2,
      storeDir = graft.sources.TempDirs.scratch("graft_fqspec_"))
      .collect()
    assert(rows.length == 5)
    // eventually ALL drained — nothing left queued, depth back to 0
    assert(rows.forall(_.getAs[Long]("drained_run") != -1L),
      "a starved probe was never drained within capacity >= backlog")
    val byRun = rows.groupBy(_.getAs[Long]("drained_run"))
      .view.mapValues(_.map(_.getAs[Long]("probe_key")).sorted.toSeq).toMap
    assert(byRun(1L) == Seq(1L, 2L), s"run-1 drains: ${byRun(1L)}")
    // the carry-over + oldest-first pin: run 2 serves run-1 leftovers,
    // not its own fresh arrival
    assert(byRun(2L) == Seq(3L, 4L), s"run-2 drains: ${byRun(2L)}")
    assert(rows.filter(_.getAs[Long]("drained_run") == 2L)
      .forall(_.getAs[Long]("enq_run") == 1L),
      "run 2 drained a younger probe while older ones waited")
    assert(byRun(3L) == Seq(5L), s"run-3 drains: ${byRun(3L)}")
    // per-run depth health report: 2 left after run 1, 1 after run 2
    // (run-2 arrival still queued), 0 after run 3
    val depth = rows.map(r => r.getAs[Long]("drained_run") ->
      r.getAs[Long]("depth_after")).toMap
    assert(depth == Map(1L -> 2L, 2L -> 1L, 3L -> 0L), depth.toString)
    // zero false links: every drained probe recovers exactly its source
    rows.foreach { r =>
      assert(r.getAs[Long]("match_key") == r.getAs[Long]("probe_key"),
        s"probe ${r.getAs[Long]("probe_key")} linked to ${r.getAs[Long]("match_key")}")
      assert(r.getAs[Long]("dist") == 1L)
    }
  }

  test("rel_fuzzy_join_banded: match set is a superset of the scaled form's, zero false links") {
    val scaled = graft.queries.RelationalQueries
      .queries("rel_fuzzy_join_scaled")(spark, dir).collect()
      .map(r => r.getAs[Long]("probe_key") -> r.getAs[Long]("match_key")).toMap
    val banded = graft.queries.RelationalQueries
      .queries("rel_fuzzy_join_banded")(spark, dir).collect()
    assert(banded.nonEmpty)
    banded.foreach { r =>
      val (probe, m) = (r.getAs[Long]("probe_key"), r.getAs[Long]("match_key"))
      if (probe % 4 == 3) assert(m == -1L, s"mangled probe $probe matched $m")
      else if (m >= 0) assert(m == probe, s"probe $probe false-linked to $m")
      // banding only WIDENS the candidate set: anything the scaled
      // form matched, the banded form matches identically
      if (scaled(probe) >= 0)
        assert(m == scaled(probe),
          s"probe $probe: banded lost the scaled form's match")
    }
    val bandedMatched = banded.count(_.getAs[Long]("match_key") >= 0)
    val scaledMatched = scaled.values.count(_ >= 0)
    assert(bandedMatched >= scaledMatched,
      s"banded matched $bandedMatched < scaled $scaledMatched")
  }

  test("rel_fuzzy_join_band_stats: report reconciles with the join; dropping the zero-marginal band preserves the match set") {
    import org.apache.spark.sql.functions.col
    val stats = graft.queries.RelationalQueries
      .queries("rel_fuzzy_join_band_stats")(spark, dir).collect()
    assert(stats.map(_.getAs[Long]("band")).toSeq == Seq(0L, 1L, 2L, 3L))
    stats.foreach { r =>
      assert(r.getAs[Long]("kept_mass") <= r.getAs[Long]("gram_mass"))
      assert(r.getAs[Long]("n_kept_grams") <= r.getAs[Long]("n_grams"))
      assert(r.getAs[Long]("marginal_matches") <=
        r.getAs[Long]("covered_matches"))
    }
    // every band's covered count is bounded by the join's matched total
    val q = graft.queries.RelationalQueries.scaledFuzzyGram(
      graft.sources.Tables.customer(spark, dir).count())
    def matchSet(bands: Seq[Int]) = {
      val (_, verified) = graft.queries.RelationalQueries
        .fuzzyBandedVerified(spark, dir, q, bands)
      verified.filter(col("dist") >= 0)
        .select("probe_key", "c_custkey", "dist").collect()
        .groupBy(_.getAs[Long]("probe_key"))
        .view.mapValues(_.map(r =>
          (r.getAs[Number]("dist").longValue(),
            r.getAs[Long]("c_custkey"))).min).toMap
    }
    val full = matchSet(0 until graft.queries.RelationalQueries.FuzzyBands)
    val matched = stats.map(_.getAs[Long]("covered_matches")).max
    assert(matched <= full.size, s"covered $matched > matched ${full.size}")
    // the COST DIAL: at least one band carries zero marginal recall on
    // this corpus (the round-12 ablation names stride-2), and removing
    // it leaves the per-probe best match IDENTICAL — the "less gram
    // mass at identical recall" deployment move, now spec-pinned
    val zeroMarginal = stats.filter(r =>
      r.getAs[Long]("marginal_matches") == 0L).map(_.getAs[Long]("band"))
    assert(zeroMarginal.nonEmpty, "no droppable band on this corpus")
    assert(zeroMarginal.contains(1L),
      s"stride-2 expected zero-marginal, got bands ${zeroMarginal.toSeq}")
    val ablated = matchSet((0 until graft.queries.RelationalQueries.FuzzyBands)
      .filterNot(_ == 1))
    assert(ablated == full,
      "dropping the zero-marginal stride-2 band changed the match set")
    // the dial is CONNECTED: the deployed band set is exactly the full
    // set minus the measured zero-marginal band, and the deployed join
    // returns the identical per-probe best match
    assert(graft.queries.RelationalQueries.FuzzyBandsDeployed == Seq(0, 2, 3),
      "deployed band set drifted from the measured ablation")
    assert(matchSet(graft.queries.RelationalQueries.FuzzyBandsDeployed) == full,
      "the deployed band set changed the match set")
  }

  test("rel_fuzzy_join_scaled: width ladder rule holds; coincides with the fixed-width join where the rule lands on 3") {
    import graft.queries.RelationalQueries.scaledFuzzyGram
    // the integer ladder: 3 at driver scale, widening with log10(N),
    // capped at 6 (the Gravano recall bound for 18-char names, k = 2)
    assert(scaledFuzzyGram(1500) == 3)
    assert(scaledFuzzyGram(15000) == 4)
    assert(scaledFuzzyGram(45000) == 5)
    assert(scaledFuzzyGram(100000000L) == 6)
    val fixed = graft.queries.RelationalQueries
      .queries("rel_fuzzy_join")(spark, dir).collect().map(_.toSeq).toSeq
    val scaled = graft.queries.RelationalQueries
      .queries("rel_fuzzy_join_scaled")(spark, dir).collect()
    assert(scaled.nonEmpty && scaled.forall(_.getAs[Long]("gram_width") == 3L))
    assert(scaled.map(_.toSeq.dropRight(1)).toSeq == fixed,
      "scaled join at width 3 diverged from the fixed-width join")
  }

  test("rel_sessionize: sessions are disjoint past the gap, mixed sizes, conversion flag consistent") {
    val rows = graft.queries.RelationalQueries
      .queries("rel_sessionize")(spark, dir).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("n_events"))
    assert(n.exists(_ == 1L) && n.exists(_ > 1L),
      "gap yields no session-size mix — the merge never fires or never breaks")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("converted") == (r.getAs[Long]("n_purchases") > 0L))
      assert(r.getAs[Long]("duration_secs") >= 0L)
    }
    // the session invariant: a user's next session STARTS strictly after
    // the previous one's end (= last event + gap) — the break rule
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getAs[java.sql.Timestamp]("s_start").getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[java.sql.Timestamp]("s_start").getTime >
            a.getAs[java.sql.Timestamp]("s_end").getTime,
            s"user $u sessions overlap or touch inside the gap")
        case _ => ()
      }
    }
  }

  test("rel_anomaly_days: exactly the planted burst flags; the evidence columns decide the flag") {
    val rows = graft.queries.RelationalQueries
      .queries("rel_anomaly_days")(spark, dir).collect()
    assert(rows.nonEmpty)
    val flagged = rows.filter(_.getAs[Boolean]("is_anomaly"))
    assert(flagged.length == 1, s"${flagged.length} anomalies, want the plant only")
    assert(flagged.head.getAs[String]("event_type") == "click" &&
      flagged.head.getAs[String]("day") == "2024-01-15",
      s"flagged ${flagged.head}")
    // the emitted evidence must BE the decision (no hidden state):
    // margin_bits = bitlen(1 + dev2 div (bound+1)), so dev2 > bound
    // ⟺ the integral ratio >= 1 ⟺ margin_bits >= 2 — exactly
    rows.foreach { r =>
      assert((r.getAs[Long]("margin_bits") >= 2L) ==
        r.getAs[Boolean]("is_anomaly"),
        s"margin/decision drift on $r")
    }
    // the decimal evidence twin: every invariant holds per type
    val inv = graft.queries.RelationalQueries
      .queries("rel_anomaly_days_invariant")(spark, dir).collect()
    assert(inv.nonEmpty)
    inv.foreach { r =>
      assert(r.getAs[Boolean]("dev_sum_zero") &&
        r.getAs[Boolean]("bound_nonneg") &&
        r.getAs[Boolean]("planted_flagged"), s"invariant broken: $r")
    }
  }

  test("pipe_quality_nb: planted labels recovered exactly on the held-out slice") {
    val rows = graft.queries.PipelineQueries
      .queries("pipe_quality_nb")(spark, dir).collect()
    assert(rows.nonEmpty)
    // the classifier's job on its own synthesis: zero confusion — every
    // planted doc scores positive, every clean doc negative (the margin
    // at sf0.01 is min spam +102 vs max ham -17; quantization noise
    // cannot cross zero at any tested SF)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("pred_spam") == r.getAs[Boolean]("is_spam"),
        s"misclassified doc ${r.getAs[Long]("doc_id")}: " +
          s"score ${r.getAs[Long]("nb_score")}")
    }
    // both classes must actually appear in the held-out slice
    assert(rows.exists(_.getAs[Boolean]("is_spam")))
    assert(rows.exists(!_.getAs[Boolean]("is_spam")))
  }

  test("pipe_seqs: spans tile every sequence to exactly PackSeqLen (shard-last excepted) and partition every doc's tokens") {
    import graft.queries.PipelineQueries
    val spans = PipelineQueries.seqSpans(spark, dir).localCheckpoint(true)
    val L = PipelineQueries.PackSeqLen.toLong

    // 1. per (shard, seq_id): spans fill exactly L slots, except the
    //    shard's LAST (still-filling) sequence
    val fills = spans.groupBy("shard", "seq_id")
      .agg(sum(col("tok_end") - col("tok_begin")).as("fill"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val lastSeq = fills.keys.groupBy(_._1).map { case (sh, ks) => sh -> ks.map(_._2).max }
    fills.foreach { case ((sh, sq), fill) =>
      if (sq == lastSeq(sh)) assert(fill <= L, s"overfull last seq ($sh,$sq): $fill")
      else assert(fill == L, s"sequence ($sh,$sq) filled $fill != $L")
    }

    // 2. per doc: spans are contiguous, start at 0, end at the doc's
    //    total piece count (nothing lost or duplicated at boundaries)
    val docSpans = spans.orderBy("doc_id", "tok_begin")
      .select("doc_id", "tok_begin", "tok_end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val pieces = graft.queries.TextQueries.bpeDocPieces(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docSpans.foreach { case (doc, ss) =>
      val sorted = ss.sortBy(_._2)
      assert(sorted.head._2 == 0L, s"doc $doc spans start at ${sorted.head._2}")
      sorted.sliding(2).foreach {
        case Array((_, _, e), (_, b, _)) => assert(e == b, s"doc $doc gap at $e/$b")
        case _ => ()
      }
      assert(sorted.last._3 == pieces(doc), s"doc $doc spans end early")
    }

    // 3. within a sequence, spans tile [0, fill) in doc_id order —
    //    the loader's concatenation map is unambiguous
    val bySeq = spans.select("shard", "seq_id", "doc_id", "seq_off", "tok_begin", "tok_end")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(5) - r.getLong(4))))
      .groupBy(_._1)
    bySeq.foreach { case (k, vs) =>
      val inOrder = vs.map(_._2).sortBy(_._1) // doc_id order
      var cursor = 0L
      inOrder.foreach { case (_, off, len) =>
        assert(off == cursor, s"seq $k: span at $off, expected $cursor")
        cursor += len
      }
    }
  }

  test("pipe_seqs_export triad: append and takedown rewrite ONLY touched shard dirs; both equal the from-scratch pack") {
    import graft.queries.{PipelineQueries => P, TextQueries}
    val counts = TextQueries.bpeDocPieces(spark, dir)
      .select(col("doc_id"),
        (graft.functions.Md5Long60Expr(col("doc_id").cast("string"),
          P.PackSalt) % lit(P.PackShards.toLong)).as("shard"),
        col("n_toks"))
      .localCheckpoint(true)
    def dirState(p: java.io.File) =
      p.listFiles.map(f => (f.getName, f.lastModified, f.length)).toSet
    def snapshot(eDir: String) = new java.io.File(eDir).listFiles
      .filter(_.getName.startsWith("shard="))
      .map(d => d.getName -> dirState(d)).toMap
    def spansOnDisk(eDir: String) = spark.read.parquet(eDir)
      .select(col("shard").cast("long"), col("seq_id"), col("doc_id"),
        col("tok_begin"), col("tok_end"), col("seq_off"))
      .collect().map(_.toSeq).toSet

    // --- append leg
    val sparse = col("doc_id") % 97 === 5
    val incDir = java.nio.file.Files
      .createTempDirectory("graft_seqinc_spec_").toString + "/export"
    P.exportShip(P.seqSpansOfCounts(counts.filter(not(sparse))), incDir)
    val beforeInc = snapshot(incDir)
    val batch = counts.filter(sparse)
    val touchedInc = batch.select("shard").distinct()
      .collect().map(r => s"shard=${r.getLong(0)}").toSet
    assert(touchedInc.nonEmpty && (beforeInc.keySet -- touchedInc).nonEmpty)
    P.seqRepackShards(spark, incDir,
      touchedInc.map(_.stripPrefix("shard=").toLong).toSeq, Some(batch), None)
    (beforeInc.keySet -- touchedInc).foreach { d =>
      assert(dirState(new java.io.File(s"$incDir/$d")) == beforeInc(d),
        s"untouched dir $d rewritten by the seq append")
    }
    assert(spansOnDisk(incDir) ==
      P.seqSpansOfCounts(counts).collect().map(_.toSeq).toSet,
      "seq append diverged from the one-shot pack")

    // --- takedown leg
    val retrPred = col("doc_id") % 50 === 7
    val retDir = java.nio.file.Files
      .createTempDirectory("graft_seqret_spec_").toString + "/export"
    P.exportShip(P.seqSpansOfCounts(counts), retDir)
    val beforeRet = snapshot(retDir)
    val retracted = counts.filter(retrPred).select("doc_id").localCheckpoint(true)
    val touchedRet = counts.filter(retrPred).select("shard").distinct()
      .collect().map(r => s"shard=${r.getLong(0)}").toSet
    assert(touchedRet.nonEmpty && (beforeRet.keySet -- touchedRet).nonEmpty)
    P.seqRepackShards(spark, retDir,
      touchedRet.map(_.stripPrefix("shard=").toLong).toSeq, None, Some(retracted))
    (beforeRet.keySet -- touchedRet).foreach { d =>
      assert(dirState(new java.io.File(s"$retDir/$d")) == beforeRet(d),
        s"untouched dir $d rewritten by the seq takedown")
    }
    assert(spansOnDisk(retDir) ==
      P.seqSpansOfCounts(counts.filter(not(retrPred))).collect().map(_.toSeq).toSet,
      "seq takedown diverged from the from-scratch pack of the corpus-without")
  }

  test("pipe_seqs_tokens: the assembled stream is exactly the span map's concatenation; no token lost to the vocab join") {
    import graft.queries.PipelineQueries
    val L = PipelineQueries.PackSeqLen.toLong
    val toks = PipelineQueries.seqTokens(spark, dir).localCheckpoint(true)

    // 1. coverage: the inner vocab join drops NOTHING — the assembled
    //    token count equals the frozen tokenizer's total piece count
    //    (a piece missing from the vocab would silently vanish here)
    val nToks = toks.count()
    val nPieces = graft.queries.TextQueries.bpeDocPieces(spark, dir)
      .agg(sum("n_toks")).collect()(0).getLong(0)
    assert(nToks == nPieces, s"assembled $nToks tokens != $nPieces pieces")

    // 2. slot tiling: within each (shard, seq_id), pos covers exactly
    //    [0, fill) with no gap or double-fill
    val bad = toks.groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n"), countDistinct("pos").as("nd"),
        min("pos").as("mn"), max("pos").as("mx"))
      .filter(col("n") =!= col("nd") || col("mn") =!= 0L ||
        col("mx") =!= col("n") - 1L || col("n") > lit(L))
      .count()
    assert(bad == 0L, "a sequence's slots are gapped, doubled, or overfull")

    // 3. equivalence with the span map: assembling sequence slots by
    //    slicing each doc's piece list through its span (the loader's
    //    read path) yields the identical (shard, seq_id, pos, token_id)
    //    set — the direct stream arithmetic and the span map can never
    //    disagree
    val pieces = graft.queries.TextQueries.bpeDocPieceList(spark, dir)
    val vocab = broadcast(graft.queries.TextQueries.bpeVocab(spark, dir))
    val viaSpans = PipelineQueries.seqSpans(spark, dir)
      .join(pieces, Seq("doc_id"))
      .select(col("shard"), col("seq_id"), col("doc_id"), col("seq_off"),
        posexplode(slice(col("pieces"), (col("tok_begin") + 1L).cast("int"),
          (col("tok_end") - col("tok_begin")).cast("int")))
          .as(Seq("i", "piece")))
      .select(col("shard"), col("seq_id"),
        (col("seq_off") + col("i")).as("pos"), col("doc_id"), col("piece"))
      .join(vocab, Seq("piece"))
      .select("shard", "seq_id", "pos", "doc_id", "token_id")
    assert(viaSpans.exceptAll(toks).isEmpty && toks.exceptAll(viaSpans).isEmpty,
      "span-sliced assembly diverged from the direct token stream")
  }

  test("pipe_seqs_tokens triad: token re-packs touch only their shard dirs, recover survivors from the artifact, and equal the one-shot assembly") {
    import graft.queries.{PipelineQueries => P}
    val tokens = P.seqTokens(spark, dir).localCheckpoint(true)
    def dirState(p: java.io.File) =
      p.listFiles.map(f => (f.getName, f.lastModified, f.length)).toSet
    def snapshot(eDir: String) = new java.io.File(eDir).listFiles
      .filter(_.getName.startsWith("shard="))
      .map(d => d.getName -> dirState(d)).toMap
    def onDisk(eDir: String) = spark.read.parquet(eDir)
      .select(col("shard").cast("long"), col("seq_id"), col("pos"),
        col("doc_id"), col("token_id"))
      .collect().map(_.toSeq).toSet

    // --- takedown leg: survivors come from the STORED rows (nothing
    //     re-tokenized), only the retracted docs' shard dirs rewrite
    val retrPred = col("doc_id") % 50 === 7
    val retDir = java.nio.file.Files
      .createTempDirectory("graft_tokret_spec_").toString + "/export"
    P.exportShip(tokens, retDir)
    val beforeRet = snapshot(retDir)
    val retracted = tokens.filter(retrPred).select("doc_id").distinct()
      .localCheckpoint(true)
    val touchedRet = tokens.filter(retrPred).select("shard").distinct()
      .collect().map(r => s"shard=${r.getLong(0)}").toSet
    assert(touchedRet.nonEmpty && (beforeRet.keySet -- touchedRet).nonEmpty)
    P.seqRepackTokenShards(spark, retDir,
      touchedRet.map(_.stripPrefix("shard=").toLong).toSeq, None, Some(retracted))
    (beforeRet.keySet -- touchedRet).foreach { d =>
      assert(dirState(new java.io.File(s"$retDir/$d")) == beforeRet(d),
        s"untouched dir $d rewritten by the token takedown")
    }
    assert(onDisk(retDir) ==
      tokensWithout(tokens, retrPred).collect().map(_.toSeq).toSet,
      "token takedown diverged from the from-scratch assembly of the corpus-without")

    // --- append leg: ship corpus-minus-batch, re-tokenize ONLY the
    //     batch, re-pack its touched dirs — equals the full one-shot
    val sparse = col("doc_id") % 97 === 5
    val incDir = java.nio.file.Files
      .createTempDirectory("graft_tokinc_spec_").toString + "/export"
    P.exportShip(tokensWithout(tokens, sparse), incDir)
    val beforeInc = snapshot(incDir)
    val batchTok = tokens.filter(sparse)
      .select(col("shard"), col("doc_id"),
        (col("seq_id") * lit(P.PackSeqLen.toLong) + col("pos")).as("g"),
        col("token_id"))
    // reconstruct batch (shard, doc_id, j, token_id) via per-doc min g
    val g0 = batchTok.groupBy("shard", "doc_id").agg(min("g").as("g0"))
    val batchRows = batchTok.join(g0, Seq("shard", "doc_id"))
      .select(col("shard"), col("doc_id"), (col("g") - col("g0")).as("j"),
        col("token_id")).localCheckpoint(true)
    val touchedInc = batchRows.select("shard").distinct()
      .collect().map(r => s"shard=${r.getLong(0)}").toSet
    assert(touchedInc.nonEmpty && (beforeInc.keySet -- touchedInc).nonEmpty)
    P.seqRepackTokenShards(spark, incDir,
      touchedInc.map(_.stripPrefix("shard=").toLong).toSeq, Some(batchRows), None)
    (beforeInc.keySet -- touchedInc).foreach { d =>
      assert(dirState(new java.io.File(s"$incDir/$d")) == beforeInc(d),
        s"untouched dir $d rewritten by the token append")
    }
    assert(onDisk(incDir) == tokens.collect().map(_.toSeq).toSet,
      "token append diverged from the one-shot assembly")

    // --- guard leg: a batch row whose shard is NOT in the touched
    //     set must fail LOUDLY (silent acceptance would overwrite that
    //     shard dir with only the batch's rows, dropping survivors)
    val wrong = batchRows.limit(1)
      .select((col("shard") + 1L).as("shard"), col("doc_id"), col("j"),
        col("token_id"))
    val mis = intercept[IllegalArgumentException] {
      P.seqRepackTokenShards(spark, incDir,
        wrong.select("shard").collect().map(_.getLong(0) + 1L).toSeq,
        Some(wrong), None)
    }
    assert(mis.getMessage.contains("touched"), mis.getMessage)
  }

  /** One-shot token assembly of the corpus minus a doc predicate —
    * recomputed through the SAME slot arithmetic over the surviving
    * docs' (doc-local) token rows, the reference every re-pack leg
    * must match.
    */
  private def tokensWithout(tokens: org.apache.spark.sql.DataFrame,
      pred: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    import graft.queries.{PipelineQueries => P}
    import org.apache.spark.sql.expressions.Window
    val L = P.PackSeqLen.toLong
    val surv = tokens.filter(not(pred))
      .select(col("shard"), col("doc_id"),
        (col("seq_id") * lit(L) + col("pos")).as("g"), col("token_id"))
    val g0 = surv.groupBy("shard", "doc_id").agg(min("g").as("g0"),
      count(lit(1)).as("n_toks"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = g0.withColumn("tok_off", sum("n_toks").over(w) - col("n_toks"))
    surv.join(offs, Seq("shard", "doc_id"))
      .select(col("shard"),
        floor((col("tok_off") + col("g") - col("g0")).cast("double")
          / lit(L.toDouble)).cast("long").as("seq_id"),
        pmod(col("tok_off") + col("g") - col("g0"), lit(L)).as("pos"),
        col("doc_id"), col("token_id"))
  }

  test("pipe_seqs_mm: patch slots tile contiguously after each image doc's text; the shard stream has no gap or overlap") {
    import graft.queries.{PipelineQueries => P}
    val L = P.PackSeqLen.toLong
    val rows = P.seqMmTokens(spark, dir)
      .select(col("shard"), (col("seq_id") * lit(L) + col("pos")).as("g"),
        col("doc_id"), col("token_id"), col("patch_idx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

    // 1. per doc: patch rows exist iff doc_id % 3 == 0, exactly
    //    MmSeqPatches of them, contiguous AFTER the text run, idx in order
    rows.groupBy(_._3).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_._2)
      val (text, patch) = sorted.partition(_._5 == -1L)
      if (doc % 3 == 0) {
        assert(patch.length == P.MmSeqPatches, s"doc $doc: ${patch.length} patches")
        assert(patch.map(_._5).toSeq == (0L until P.MmSeqPatches.toLong),
          s"doc $doc: patch_idx out of order")
        assert(patch.forall(_._4 == P.MmPatchTok))
        if (text.nonEmpty)
          assert(patch.head._2 == text.last._2 + 1,
            s"doc $doc: patches not adjacent to text")
      } else assert(patch.isEmpty, s"doc $doc: unexpected patches")
      // the doc's whole sample is one contiguous g-run
      val gs = sorted.map(_._2)
      assert(gs.zip(gs.tail).forall { case (a, b) => b == a + 1 },
        s"doc $doc: sample not contiguous")
    }

    // 2. per shard: g tiles 0..N-1 exactly (the packing law)
    rows.groupBy(_._1).foreach { case (sh, rs) =>
      val gs = rs.map(_._2).sorted
      assert(gs.head == 0L && gs.last == gs.length - 1L &&
        gs.distinct.length == gs.length, s"shard $sh: stream gaps/overlaps")
    }

    // 3. text rows are the seqTokens stream under the widened offsets:
    //    same per-doc token_id sequence, exactly
    val mmText = rows.filter(_._5 == -1L).groupBy(_._3).view
      .mapValues(_.sortBy(_._2).map(_._4).toSeq).toMap
    val pure = P.seqTokens(spark, dir)
      .select((col("seq_id") * lit(L) + col("pos")).as("g"),
        col("doc_id"), col("token_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._2).view.mapValues(_.sortBy(_._1).map(_._3).toSeq).toMap
    assert(mmText == pure, "mm text stream diverged from seqTokens")
  }

  test("repack touched-set guards: a batch row in an unlisted shard fails LOUDLY on both artifacts, stored dirs untouched") {
    import graft.queries.{PipelineQueries => P}
    import spark.implicits._
    def dirState(eDir: String) = new java.io.File(eDir).listFiles
      .filter(_.getName.startsWith("shard="))
      .map(d => d.getName ->
        d.listFiles.map(f => (f.getName, f.lastModified, f.length)).toSet)
      .toMap

    // --- span artifact: stored docs in shards 0 and 1
    val counts = Seq((10L, 0L, 5L), (11L, 1L, 7L))
      .toDF("doc_id", "shard", "n_toks")
    val spanDir = java.nio.file.Files
      .createTempDirectory("graft_guard_span_").toString + "/export"
    P.exportShip(P.seqSpansOfCounts(counts), spanDir)
    val beforeSpan = dirState(spanDir)
    val badCounts = Seq((12L, 1L, 3L)).toDF("doc_id", "shard", "n_toks")
    val e1 = intercept[IllegalArgumentException] {
      P.seqRepackShards(spark, spanDir, Seq(0L), Some(badCounts), None)
    }
    assert(e1.getMessage.contains("touched"))
    assert(dirState(spanDir) == beforeSpan, "guard failure still wrote dirs")

    // --- token artifact: bootstrap shards 0 and 1, then the bad batch
    val tokDir = java.nio.file.Files
      .createTempDirectory("graft_guard_tok_").toString + "/export"
    val seed = Seq((0L, 10L, 0L, 3L), (0L, 10L, 1L, 4L), (1L, 11L, 0L, 5L))
      .toDF("shard", "doc_id", "j", "token_id")
    P.seqRepackTokenShards(spark, tokDir, Seq(0L, 1L), Some(seed), None)
    val beforeTok = dirState(tokDir)
    val badTok = Seq((1L, 12L, 0L, 6L)).toDF("shard", "doc_id", "j", "token_id")
    val e2 = intercept[IllegalArgumentException] {
      P.seqRepackTokenShards(spark, tokDir, Seq(0L), Some(badTok), None)
    }
    assert(e2.getMessage.contains("touched"))
    assert(dirState(tokDir) == beforeTok, "guard failure still wrote dirs")

    // --- retraction side: a takedown doc whose (hash) shard is outside
    // `touched` must fail loudly, not silently keep the doc's rows
    val someDoc = 12345L
    val docShard = graft.sources.Tables.documents(spark, dir).sparkSession
      .range(1).select(
        (graft.functions.Md5Long60Expr(lit(someDoc.toString), P.PackSalt)
          % lit(P.PackShards.toLong)).as("s"))
      .head().getLong(0)
    val otherShard = (docShard + 1) % P.PackShards.toLong
    val e3 = intercept[IllegalArgumentException] {
      P.seqRepackTokenShards(spark, tokDir, Seq(otherShard), None,
        Some(Seq(someDoc).toDF("doc_id")))
    }
    assert(e3.getMessage.contains("no-op"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      P.seqRepackShards(spark, spanDir, Seq(otherShard), None,
        Some(Seq(someDoc).toDF("doc_id")))
    }
    assert(e4.getMessage.contains("no-op"), e4.getMessage)
  }
}
