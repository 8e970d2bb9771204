package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkFixture, SparkEntry}

/** Cheap structural guards — the value-level check is the external
  * DuckDB oracle compare (tools/check_oracle.py, driver t2). */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("every declared query runs and returns rows on sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, SparkFixture.sfDir).count()
      // q17_except: all nationkeys have suppliers at some SFs;
      // l2_embedding_cosine: fixture embeddings have no >=0.9 pairs
      if (n == 0 && name != "q17_except" && name != "l2_embedding_cosine") Some(name) else None
    }
    assert(empty.isEmpty, s"queries with zero rows: $empty")
  }

  test("oracle map only references declared queries; flagship entry works") {
    val undeclared = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(undeclared.isEmpty, s"oracles without queries: $undeclared")
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("ann (lsh + ivf) recall vs brute force stays above the data-limited floor") {
    val bf = SparkEntry.queries("l3_knn_bruteforce")(spark, SparkFixture.sfDir)
      .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(name: String): Double = {
      val ann = SparkEntry.queries(name)(spark, SparkFixture.sfDir)
        .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (bf & ann).size.toDouble / bf.size
    }
    val lsh = recall("l3_ann_lsh")
    val ivf = recall("l3_ann_ivf")
    val km = recall("l3_ann_ivf_kmeans")
    info(s"recall@10: lsh=$lsh ivf=$ivf ivf_kmeans=$km")
    // fixture embeddings are near-random (top-10 cosine ~0.37), which
    // bounds any bucketed/probed ANN on this data; multi-probe (3
    // Hamming-1 flips/table) lifted lsh from 0.27 to 0.53 on this seed
    assert(lsh >= 0.4, s"lsh recall collapsed: $lsh")
    assert(ivf >= 0.1, s"ivf recall collapsed: $ivf")
    assert(km >= 0.1, s"ivf_kmeans recall collapsed: $km")
  }

  test("filtered ann: every hit satisfies the predicate, and recall vs the FILTERED brute force holds the floor") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables(spark, SparkFixture.sfDir, "embeddings")
    val allowedIds = e.filter(col("label").isin(2, 5, 7))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ann = SparkEntry.queries("l3_ann_filtered")(spark, SparkFixture.sfDir)
      .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ann.nonEmpty, "filtered ann returned nothing")
    assert(ann.forall { case (_, v) => allowedIds.contains(v) },
      "a filtered-ann hit violates the metadata predicate")
    // FILTERED brute force: exact cosine top-10 among allowed vectors
    // only — the correct recall reference for a selector search
    val q = e.filter(col("vec_id").isin(0, 1, 2))
      .select(col("vec_id").as("qid"), col("embedding"))
    val cand = e.filter(col("label").isin(2, 5, 7))
      .select(col("vec_id").as("vid"))
      .crossJoin(q.select("qid"))
      .filter(col("vid") =!= col("qid"))
    val bf = graft.ops.CorpusOps.refine(cand, e, q, topK = 10)
      .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = ann.toSet
    val rec = (bf & hit).size.toDouble / bf.size
    info(s"filtered recall@10: $rec (allowed ${allowedIds.size} vectors)")
    // the fixture's near-random embeddings bound probed ANN recall
    // (the l3_ann_ivf floor class); the filter thins the probed lists
    // further — the floor is deliberately data-limited, not 1.0
    assert(rec >= 0.1, s"filtered-ann recall collapsed: $rec")
  }

  test("hybrid rrf: the fused ranking equals the hand-unrolled two-ranking join, exactly") {
    import org.apache.spark.sql.functions._
    val lex = SparkEntry.queries("l4_bm25")(spark, SparkFixture.sfDir)
      .select("doc_id", "rnk").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    val vec = SparkEntry.queries("l3_knn_bruteforce")(spark, SparkFixture.sfDir)
      .filter(col("qid") === 0)
      .select("vid", "rn").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    assert(lex.nonEmpty && vec.nonEmpty)
    // hand-unrolled RRF: exact integer contributions, id tie-break
    val expected = (lex ++ vec)
      .map { case (id, r) => id -> (1000000000000L / (60L + r)) }
      .groupBy(_._1).toSeq
      .map { case (id, cs) => (id, cs.map(_._2).sum, cs.size.toLong) }
      .sortBy { case (id, s, _) => (-s, id) }.take(10)
      .zipWithIndex.map { case ((id, s, n), i) => (i + 1, id, s, n) }
    val got = SparkEntry.queries("l3_hybrid_rrf")(spark, SparkFixture.sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected,
      s"fusion diverged from the hand-unrolled join:\n$got\nvs\n$expected")
    // the agreement signal: at least one id must appear in both lists
    // on this fixture, or the fusion degenerates to concatenation
    assert(got.exists(_._4 == 2L) == (lex.map(_._1).toSet & vec.map(_._1).toSet).nonEmpty)
  }

  test("knn graph: every vector gets exactly 5 ranked neighbors, none itself") {
    val g = SparkEntry.queries("l3_knn_graph")(spark, SparkFixture.sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val n = SparkEntry.queries("l3_knn_bruteforce")(spark, SparkFixture.sfDir)
      .select("qid").distinct().count() // 3 — just to touch the fixture
    assert(n == 3)
    val perQ = g.groupBy(_._1)
    // the IVF candidate bound (4 of 32 lists over 500 vectors) always
    // yields ≥5 candidates on the fixture; each query's ranks are 1..5
    assert(perQ.values.forall(_.map(_._2).sorted.toSeq == Seq(1, 2, 3, 4, 5)),
      "a query is missing ranks")
    assert(g.forall { case (q, _, v) => q != v }, "self-edge in the knn graph")
    assert(perQ.size == 500, s"expected 500 query vectors, got ${perQ.size}")
  }

  test("hnsw: recall >= the flat graph search at strictly fewer scored candidates") {
    val rows = SparkEntry.queries("l3_ann_hnsw")(spark, SparkFixture.sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (flatScored, flatHits) = rows("flat")
    val (hnswScored, hnswHits) = rows("hnsw")
    info(s"flat: $flatHits/30 hits at $flatScored scored; " +
      s"hnsw: $hnswHits/30 hits at $hnswScored scored")
    // the hierarchy's contract: reach at least the flat traversal's
    // recall while scoring strictly fewer (query, candidate) pairs —
    // the descent replaces a beam round and the blind entry spread
    assert(hnswHits >= flatHits,
      s"hnsw recall fell below flat: $hnswHits < $flatHits")
    assert(hnswScored < flatScored,
      s"hnsw scored as much as flat: $hnswScored >= $flatScored")
    assert(flatHits >= 27, s"flat baseline collapsed: $flatHits/30")
  }

  test("incremental hnsw: maintained-index search quality >= rebuilt from-scratch") {
    // the maintenance contract: inserting the batch into the FROZEN
    // index (batch-vs-stored scoring only) must not degrade search
    // quality vs paying the full n^1.5 rebuild — hits against the
    // exact brute-force top-10, summed over the 3 queries
    val res = SparkEntry.queries("l3_ann_hnsw_incremental")(spark, SparkFixture.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val exact = SparkEntry.queries("l3_knn_bruteforce")(spark, SparkFixture.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def hits(m: String): Int =
      res.filter(_._1 == m).count { case (_, q, v) => exact((q, v)) }
    val (hm, hr) = (hits("maintained"), hits("rebuilt"))
    info(s"maintained: $hm/30 hits; rebuilt: $hr/30 hits")
    assert(res.count(_._1 == "maintained") == 30 &&
      res.count(_._1 == "rebuilt") == 30,
      "both methods must return full top-10 lists for all 3 queries")
    // the two indexes legitimately differ at the margin (a rebuild
    // re-ranks stored lists with batch candidates; insertion adds
    // fresh reverse links) — across fixtures each wins by at most one
    // hit (sf0.01: 30 vs 29 maintained ahead; sf0.001: 29 vs 30).
    // The maintenance contract is NO DEGRADATION beyond that margin.
    assert(hm >= hr - 1,
      s"maintained-index search degraded vs the rebuilt index: $hm vs $hr")
    assert(hm >= 27, s"maintained baseline collapsed: $hm/30")
    assert(hr >= 27, s"rebuilt baseline collapsed: $hr/30")
  }

  test("ann compaction: degree returns to the build cap, search quality holds the one-hit margin") {
    // (a) the degree audit compaction exists for: the maintained
    // adjacency's max out-degree EXCEEDS the build cap (symmetrized
    // insertion adds reverse links past top-5), and compaction brings
    // it back to exactly the cap
    import org.apache.spark.sql.functions._
    val e = graft.Tables(spark, SparkFixture.sfDir, "embeddings")
    // a deliberately inflated adjacency: union of top-5 lists and
    // their reversals (the insertion shape) — degree > 5 for hub nodes
    val res = SparkEntry.queries("l3_knn_graph")(spark, SparkFixture.sfDir)
      .select(col("qid").as("a"), col("vid").as("b"))
    val inflated = res.union(res.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    val maxBefore = inflated.groupBy("a").count().agg(max("count")).head().getLong(0)
    assert(maxBefore > 5,
      s"symmetrized adjacency should exceed the cap somewhere (got $maxBefore) — audit is vacuous")
    val compacted = graft.ops.CorpusOps.compactAdjacency(inflated, e, 5)
    val maxAfter = compacted.groupBy("a").count().agg(max("count")).head().getLong(0)
    assert(maxAfter == 5,
      s"compaction must restore the build-time cap: max degree $maxAfter")
    // kept edges are each node's TOP-5 by cosine: spot-audit one hub
    // node — its kept list must be a subset of its inflated list
    val hub = inflated.groupBy("a").count().orderBy(col("count").desc)
      .head().getLong(0)
    val keptOfHub = compacted.filter(col("a") === hub)
      .collect().map(_.getLong(1)).toSet
    val inflatedOfHub = inflated.filter(col("a") === hub)
      .collect().map(_.getLong(1)).toSet
    assert(keptOfHub.size == 5 && keptOfHub.subsetOf(inflatedOfHub))
    // (b) search quality: the compacted maintained index stays within
    // the hnsw_incremental one-hit margin of the REBUILT index
    val exact = SparkEntry.queries("l3_knn_bruteforce")(spark, SparkFixture.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val comp = SparkEntry.queries("l3_ann_compact")(spark, SparkFixture.sfDir)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(comp.length == 30, "compacted search must return full top-10 lists")
    val hc = comp.count(exact)
    val hr = SparkEntry.queries("l3_ann_hnsw_incremental")(spark, SparkFixture.sfDir)
      .collect().filter(_.getString(0) == "rebuilt")
      .map(r => (r.getLong(1), r.getLong(3))).count(exact)
    info(s"compacted: $hc/30 hits; rebuilt: $hr/30 hits")
    assert(hc >= hr - 1,
      s"compacted-index search degraded beyond the margin: $hc vs rebuilt $hr")
    assert(hc >= 27, s"compacted baseline collapsed: $hc/30")
  }

  test("cluster sample: centroid count adapts to corpus size, quota holds per cluster") {
    // k = max(32, ceil(sqrt(n))): at n = 2000 that is 45 centroids, and
    // each centroid vector assigns to itself (cos = 1.0 maximum), so
    // exactly 45 clusters appear in the kept output — a fixed k = 32
    // would cap this at 32 and fail here.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-csample").toString
    val rnd = new scala.util.Random(7)
    (0L until 2000L).map(i => (i, Array.fill(8)(rnd.nextFloat()), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(dir + "/embeddings.parquet")
    val kept = SparkEntry.queries("l3_cluster_sample_kept")(spark, dir)
    val byCid = kept.groupBy("cid").count().collect()
    assert(byCid.length == 45,
      s"expected 45 adaptive clusters at n=2000, got ${byCid.length}")
    assert(byCid.forall(_.getLong(1) <= 8), "a cluster exceeded its quota")
  }

  test("vocab oov: rates are [0,1], and the top-256 vocab covers most tokens") {
    val rows = SparkEntry.queries("l4_vocab_oov")(spark, SparkFixture.sfDir).collect()
    assert(rows.forall { r =>
      val rate = r.getAs[Double]("oov_rate")
      rate >= 0.0 && rate <= 1.0 && r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tok")
    })
    val tot = rows.map(_.getAs[Long]("n_tok")).sum.toDouble
    val oov = rows.map(_.getAs[Long]("n_oov")).sum.toDouble
    // the fixture vocabulary is small; a 256-word vocab must cover the
    // bulk of the token stream or the frequency cut is broken
    assert(oov / tot < 0.5, s"top-256 vocab covers only ${1 - oov / tot} of tokens")
  }

  test("pq adc recall vs exact L2 top-10 stays above the quantization floor") {
    // PQ ranks by (approximate) L2, so its honest reference is the
    // EXACT L2 top-10, not the cosine brute force the other ANN
    // variants share.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val e = graft.Tables(spark, SparkFixture.sfDir, "embeddings")
    val q = e.filter(col("vec_id").isin(0, 1, 2))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy("qid").orderBy(col("d2r").asc, col("vid").asc)
    val exact = e.select(col("vec_id").as("vid"), col("embedding").as("ve"))
      .join(broadcast(q), col("vid") =!= col("qid"))
      .withColumn("d2r", round(graft.functions.VectorExprs.vec_l2sq(col("qe"), col("ve")), 6))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(name: String): Double = {
      val got = SparkEntry.queries(name)(spark, SparkFixture.sfDir)
        .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val pq = recallOf("l3_ann_pq")
    val ivfpq = recallOf("l3_ann_ivfpq")
    info(s"recall@10 vs exact L2: pq=$pq ivfpq=$ivfpq")
    // 8 subspaces x 16 seed centroids on near-random fixture vectors —
    // coarse, but ADC must still beat random top-10 by a wide margin;
    // ivfpq additionally pays the 4/32-list probe coverage
    assert(pq >= 0.1, s"pq recall collapsed: $pq")
    assert(ivfpq >= 0.05, s"ivfpq recall collapsed: $ivfpq")
  }

  test("pack_sequences pieces tile every non-final sequence exactly") {
    import org.apache.spark.sql.functions._
    val p = SparkEntry.queries("l8_pack_sequences")(spark, SparkFixture.sfDir)
    // sum(len)==256 && span [0,256) per (shard, seq) implies gapless,
    // overlap-free tiling (overlap would push sum above the span)
    val per = p.groupBy("shard", "seq")
      .agg(sum("len").as("tot"), min("off").as("mn"),
           max(col("off") + col("len")).as("mx"))
    val last = p.groupBy("shard").agg(max("seq").as("lastSeq"))
    val bad = per.join(last, "shard").filter(col("seq") < col("lastSeq"))
      .filter(col("tot") =!= 256 || col("mn") =!= 0 || col("mx") =!= 256)
    assert(bad.count() == 0, "non-final sequence not exactly tiled")
    // conservation: every corpus token lands in exactly one piece
    val docsTok = graft.Tables(spark, SparkFixture.sfDir, "documents")
      .agg(sum(size(split(col("text"), " ")).cast("long"))).collect()(0).getLong(0)
    val packed = p.agg(sum("len")).collect()(0).getLong(0)
    assert(packed == docsTok, s"packed $packed tokens vs corpus $docsTok")
  }

  test("ppl buckets are balanced per language, ordered by perplexity, keep = head+middle") {
    import org.apache.spark.sql.functions._
    val b = SparkEntry.queries("l8_ppl_bucket")(spark, SparkFixture.sfDir)
    val skew = b.groupBy("lang", "bucket").count()
      .groupBy("lang").agg((max("count") - min("count")).as("d"))
      .filter(col("d") > 1)
    assert(skew.count() == 0, "ntile bucket sizes differ by more than 1 within a language")
    val bounds = b.groupBy("lang", "bucket").agg(min("ppl").as("lo"), max("ppl").as("hi"))
    val inverted = bounds.as("a").join(bounds.as("b"),
        col("a.lang") === col("b.lang") && col("a.bucket") + 1 === col("b.bucket"))
      .filter(col("a.hi") > col("b.lo"))
    assert(inverted.count() == 0, "bucket k holds higher perplexity than bucket k+1")
    assert(b.filter((col("bucket") <= 2) =!= col("keep")).count() == 0)
  }

  test("classifier scores are sigmoid-bounded with the exact feature count") {
    import org.apache.spark.sql.functions._
    val c = SparkEntry.queries("l4_classifier")(spark, SparkFixture.sfDir)
    assert(c.filter(col("score") <= 0 || col("score") >= 1).count() == 0)
    // n_feat = words + bigrams = 2w-1 for w >= 2, else w
    val docs = graft.Tables(spark, SparkFixture.sfDir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("nw"))
    val bad = c.join(docs, "doc_id")
      .filter(col("n_feat") =!=
        when(col("nw") >= 2, col("nw") * 2 - 1).otherwise(col("nw")))
    assert(bad.count() == 0, "feature count drifted from 2w-1")
  }

  test("trained classifier: gradient descent actually reduces train log-loss vs the zero model") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("l4_classifier_train")(spark, SparkFixture.sfDir).collect()
    val w = out.filter(_.getString(0) == "w").sortBy(_.getLong(1)).map(_.getDouble(2))
    assert(w.length == 4, "expected 4 trained weights")
    assert(w.exists(_ != 0.0), "training never moved off the zero init")
    val scores = out.filter(_.getString(0) == "s")
    assert(scores.nonEmpty)
    assert(scores.forall(r => r.getDouble(2) > 0 && r.getDouble(2) < 1),
      "held-out score escaped (0,1)")
    // independent check of REAL learning: recompute the two log-losses
    // on the train split from raw docs (plain Scala, no query code)
    val docs = graft.Tables(spark, SparkFixture.sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      .collect().filter(_.getLong(0) % 5 != 0)
    val stop = Set("the", "and", "of", "to", "a", "in", "is", "that")
    def ll(wv: Array[Double]): Double = docs.map { r =>
      val ws = r.getString(1).split(" ", -1)
      val x1 = ws.count(stop) / ws.length.toDouble
      val x2 = math.min(r.getLong(3), 500L) / 500.0
      val txt = r.getString(1)
      val x3 = txt.count("aeiou".contains(_)) / math.max(txt.length, 1).toDouble
      val y = if (r.getString(2) == "en") 1.0 else 0.0
      val p = 1.0 / (1.0 + math.exp(-(wv(0) + wv(1) * x1 + wv(2) * x2 + wv(3) * x3)))
      -(y * math.log(p) + (1 - y) * math.log(1 - p))
    }.sum / docs.length
    val lossTrained = ll(w)
    val lossZero = ll(Array(0.0, 0.0, 0.0, 0.0)) // = ln 2
    info(f"train log-loss: zero=$lossZero%.4f trained=$lossTrained%.4f")
    assert(lossTrained < lossZero, "8 GD steps failed to beat the zero model")
  }

  test("cluster keeper: exactly one keeper per cluster, and it has the top quality") {
    import org.apache.spark.sql.functions._
    val k = SparkEntry.queries("l6_cluster_keeper")(spark, SparkFixture.sfDir)
    val perCluster = k.groupBy("cluster_id")
      .agg(sum(when(col("is_keeper"), 1).otherwise(0)).as("nk"),
           max("quality").as("qmax"),
           max(when(col("is_keeper"), col("quality"))).as("qkeep"))
    assert(perCluster.filter(col("nk") =!= 1).count() == 0, "cluster without exactly one keeper")
    assert(perCluster.filter(col("qkeep") =!= col("qmax")).count() == 0,
      "keeper is not the highest-quality member")
  }

  test("Lloyd-trained PQ codebook beats the seed codebook once data feeds the centroids") {
    // at sf0.001 (200 vectors / 16 centroids per subspace) Lloyd is
    // data-starved and can lose to the seed init — the honest claim is
    // at sf0.01+, where training lifted recall 0.267 -> 0.367 on this
    // seed; pin the lift there
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.01"
    val e = graft.Tables(spark, dir, "embeddings")
    val q = e.filter(col("vec_id").isin(0, 1, 2))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy("qid").orderBy(col("d2r").asc, col("vid").asc)
    val exact = e.select(col("vec_id").as("vid"), col("embedding").as("ve"))
      .join(broadcast(q), col("vid") =!= col("qid"))
      .withColumn("d2r", round(graft.functions.VectorExprs.vec_l2sq(col("qe"), col("ve")), 6))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(name: String): Double = {
      val got = SparkEntry.queries(name)(spark, dir)
        .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val pq = recallOf("l3_ann_pq")
    val pqTrained = recallOf("l3_ann_pq_trained")
    info(s"recall@10 vs exact L2 at sf0.01: pq=$pq pq_trained=$pqTrained")
    assert(pqTrained > pq, s"training did not lift pq recall at sf0.01: $pqTrained <= $pq")
  }

  test("residual encoding lifts IVF-PQ recall over the raw-vector composite at sf0.01") {
    // the IVFADC refinement: coding residuals against the coarse
    // centroid spends the 8-byte budget on what the coarse quantizer
    // didn't explain (measured 0.267 -> 0.333 on this fixture)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.01"
    val e = graft.Tables(spark, dir, "embeddings")
    val q = e.filter(col("vec_id").isin(0, 1, 2))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy("qid").orderBy(col("d2r").asc, col("vid").asc)
    val exact = e.select(col("vec_id").as("vid"), col("embedding").as("ve"))
      .join(broadcast(q), col("vid") =!= col("qid"))
      .withColumn("d2r", round(graft.functions.VectorExprs.vec_l2sq(col("qe"), col("ve")), 6))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(name: String): Double = {
      val got = SparkEntry.queries(name)(spark, dir)
        .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val raw = recallOf("l3_ann_ivfpq")
    val res = recallOf("l3_ann_ivfpq_residual")
    info(s"recall@10 vs exact L2 at sf0.01: ivfpq=$raw ivfpq_residual=$res")
    assert(res > raw, s"residual encoding did not lift ivfpq recall: $res <= $raw")
  }

  test("exact re-rank refine restores recall@10 to >= 0.9 at sf0.01") {
    // the refine contract: with top-R=100 candidate coverage, the
    // exact cosine re-rank recovers the true neighbors the ADC
    // ordering scrambles (measured 0.967 on this fixture)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.01"
    val e = graft.Tables(spark, dir, "embeddings")
    val q = e.filter(col("vec_id").isin(0, 1, 2))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy("qid").orderBy(col("simr").desc, col("vid").asc)
    val exact = e.select(col("vec_id").as("vid"), col("embedding").as("ve"))
      .join(broadcast(q), col("vid") =!= col("qid"))
      .withColumn("simr", round(
        graft.functions.VectorExprs.vec_dot(col("qe"), col("ve")) /
          (graft.functions.VectorExprs.vec_norm(col("qe")) *
           graft.functions.VectorExprs.vec_norm(col("ve"))), 6))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("l3_ann_refined")(spark, dir)
      .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    info(s"refined recall@10 vs exact cosine at sf0.01: $recall")
    assert(recall >= 0.9, s"refine failed to restore recall: $recall < 0.9")
  }

  test("pagerank: top-20 ranks are a contiguous descending probability list") {
    val rows = SparkEntry.queries("q44_pagerank")(spark, SparkFixture.sfDir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(rows.length == 20)
    assert(rows.map(_._1).toSeq == (1 to 20), "ranks must be 1..20 in order")
    assert(rows.forall { case (_, _, pr) => pr > 0.0 && pr < 1.0 },
      "every rank is a probability strictly inside (0,1)")
    assert(rows.sliding(2).forall { case Array(a, b) => a._3 >= b._3 },
      "ranks must be non-increasing down the list")
    assert(rows.forall { case (_, node, _) => node.startsWith("s") || node.startsWith("c") })
  }

  test("bpe merges: 3 well-formed merges with non-increasing weighted counts") {
    val rows = SparkEntry.queries("l4_bpe_merges")(spark, SparkFixture.sfDir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(rows.length == 3)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3))
    assert(rows.forall { case (_, s1, s2, merged, _) => merged == s1 + s2 },
      "merged token must be the concatenation of the pair")
    // a merge can only destroy or preserve pair occurrences, never add
    // more than it had — so the greedy max is non-increasing
    assert(rows.sliding(2).forall { case Array(a, b) => a._5 >= b._5 },
      s"max pair count increased across merges: ${rows.map(_._5).mkString(",")}")
    assert(rows.forall(_._5 > 0))
  }

  test("edit distance runs over exactly the near-dup pair set with bounded similarity") {
    val pairs = SparkEntry.queries("l2_jaccard_pairs")(spark, SparkFixture.sfDir)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ed = SparkEntry.queries("l2_edit_distance")(spark, SparkFixture.sfDir).collect()
    assert(ed.map(r => (r.getLong(0), r.getLong(1))).toSet == pairs,
      "edit-distance verification must cover the near-dup pair set exactly")
    assert(ed.forall { r =>
      val (lev, sim) = (r.getInt(3), r.getDouble(4))
      lev >= 0 && sim >= 0.0 && sim <= 1.0
    }, "lev >= 0 and normalized similarity in [0,1]")
  }

  test("bpe encode: per doc, words <= tokens <= chars and compression >= 1") {
    val rows = SparkEntry.queries("l4_bpe_encode")(spark, SparkFixture.sfDir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (nw, nc, nt, _) => nw <= nt && nt <= nc },
      "every word is >= 1 token, every token >= 1 char")
    assert(rows.forall(_._4 >= 1.0), "compression = chars/tokens >= 1")
  }

  test("weighted sample: 100 contiguous ranks with descending in-(0,1) keys") {
    val rows = SparkEntry.queries("l8_weighted_sample")(spark, SparkFixture.sfDir)
      .collect().map(r => (r.getInt(0), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 100)
    assert(rows.map(_._1).toSeq == (1 to 100))
    assert(rows.forall { case (_, q, k) => q >= 0.3 && k > 0.0 && k < 1.0 },
      "quality floor 0.3; keys strictly inside (0,1)")
    assert(rows.sliding(2).forall { case Array(a, b) => a._3 >= b._3 },
      "keys non-increasing down the ranks")
  }

  test("min_by/max_by agree with the window spelling of the same extremum") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val o = graft.Tables(spark, SparkFixture.sfDir, "orders")
    val w = Window.partitionBy("o_orderpriority").orderBy(col("o_orderkey").desc)
    val viaWindow = o.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_orderpriority"), col("o_orderstatus"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    val got = SparkEntry.queries("q43_minmax_by")(spark, SparkFixture.sfDir)
      .select("o_orderpriority", "last_status")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got == viaWindow, "max_by(status, orderkey) must equal the rank-1 window row")
  }
}
