package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class TableOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("upsert: update row wins entirely (including nulls), inserts and pass-throughs keep") {
    val base = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "s", "n")
    val updates = Seq((2L, null.asInstanceOf[String], 99), (4L, "d", 40)).toDF("k", "s", "n")
    val got = TableOps.upsert(base, updates, Seq("k"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getInt(2))).toSet
    // whole-row semantics: key 2's null s REPLACES "b" (row replacement,
    // not per-column coalesce)
    assert(got == Set((1L, Some("a"), 10), (2L, None, 99), (3L, Some("c"), 30),
      (4L, Some("d"), 40)))
  }

  test("upsert works when updates derive from the base table (self-join lineage)") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val updates = base.filter(col("k") === 2).withColumn("s", lit("b2"))
    val got = TableOps.upsert(base, updates, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b2")))
  }

  test("cdcApply: highest sequence wins; a winning tombstone erases the key") {
    val log = Seq(
      (1L, 1L, "upsert", "x"), (1L, 3L, "upsert", "y"), (1L, 2L, "delete", ""),
      (2L, 1L, "upsert", "a"), (2L, 2L, "delete", ""),
      (3L, 5L, "upsert", "z")).toDF("k", "seq", "op", "v")
    val got = TableOps.cdcApply(log, Seq("k"), "seq", "op")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // key 1: seq 3 upsert outranks the earlier delete; key 2: delete wins -> gone
    assert(got == Set((1L, "y"), (3L, "z")))
  }

  test("cdcApply: a NULL op on the winning row fails loudly; on a losing row it is ignored") {
    // losing null op (key 1, seq 1): never inspected — the upsert wins
    val ok = Seq(
      (1L, 1L, null.asInstanceOf[String], "x"), (1L, 2L, "upsert", "y"))
      .toDF("k", "seq", "op", "v")
    val got = TableOps.cdcApply(ok, Seq("k"), "seq", "op")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "y")))
    // winning null op: the plain op != 'delete' filter would silently
    // DROP the key (null predicate) — the contract is to fail instead
    val bad = Seq(
      (2L, 1L, "upsert", "a"), (2L, 2L, null.asInstanceOf[String], "b"))
      .toDF("k", "seq", "op", "v")
    val ex = intercept[Exception] {
      TableOps.cdcApply(bad, Seq("k"), "seq", "op").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null && m.contains("NULL op")),
      s"expected the null-op contract error, got: $ex")
  }

  test("scd2 collapses unchanged runs into intervals with an open current row") {
    val ch = Seq(
      (1L, 10L, "A", 1L), (1L, 20L, "A", 2L), (1L, 30L, "B", 3L), (1L, 40L, "A", 4L),
      (2L, 10L, "C", 5L)).toDF("k", "ts", "v", "id")
    val got = TableOps.scd2(ch, "k", "ts", "v", tieBreak = Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    // run A[10,30) -> B[30,40) -> A[40,current); the ts=20 no-change row vanishes
    assert(got == Set((1L, "A", 10L, 30L), (1L, "B", 30L, 40L), (1L, "A", 40L, -1L),
      (2L, "C", 10L, -1L)))
  }
test("maintainAgg: merged deltas equal a full recompute, new keys included") {
    val hist = Seq((1L, 5), (1L, 7), (2L, 11)).toDF("k", "n")
    val batch = Seq((2L, 2), (3L, 100)).toDF("k", "n")
    def mv(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(count(lit(1)).as("cnt"), sum("n").as("s"))
    val maintained = TableOps.maintainAgg(mv(hist), mv(batch), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val recomputed = mv(hist.union(batch))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(maintained == recomputed, s"$maintained vs $recomputed")
    assert(maintained.exists(_._1 == 3L), "batch-only key must appear")
  }

  test("maintainDistinct: batch decomposition is invisible; estimates track truth") {
    // 3000 distinct values per key, arriving as 3 batches vs 2
    // differently-cut batches vs another 3-way cut: every maintained
    // chain must estimate identically (register state is
    // set-determined), and near the truth at lgK=11
    val rows = spark.range(6000L)
      .selectExpr("cast(id % 2 as bigint) as k", "cast(id / 2 as bigint) as v")
    def sk(df: org.apache.spark.sql.DataFrame) =
      TableOps.distinctSketch(df, Seq("k"), "v", lgK = 11)
    def est(mv: org.apache.spark.sql.DataFrame) =
      mv.select(col("k"), hll_sketch_estimate(col("sketch")).as("e"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val threeWay = TableOps.maintainDistinct(
      TableOps.maintainDistinct(sk(rows.filter("v < 1000")),
        sk(rows.filter("v >= 1000 and v < 2000")), Seq("k")),
      sk(rows.filter("v >= 2000")), Seq("k"))
    val twoWay = TableOps.maintainDistinct(sk(rows.filter("v % 2 = 0")),
      sk(rows.filter("v % 2 = 1")), Seq("k"))
    val oddCut = TableOps.maintainDistinct(
      TableOps.maintainDistinct(sk(rows.filter("v % 3 = 0")),
        sk(rows.filter("v % 3 = 1")), Seq("k")),
      sk(rows.filter("v % 3 = 2")), Seq("k"))
    val (e3, e2, eo) = (est(threeWay), est(twoWay), est(oddCut))
    assert(e3 == e2 && e2 == eo, s"decomposition leaked into the estimate: $e3 / $e2 / $eo")
    e3.values.foreach(e => assert(math.abs(e - 3000L) <= 150, s"estimate $e too far from 3000"))
    // a key present only in the delta appears; only in the view survives
    val viewOnly = sk(rows.filter("k = 0"))
    val deltaOnly = sk(rows.filter("k = 1"))
    val merged = est(TableOps.maintainDistinct(viewOnly, deltaOnly, Seq("k")))
    assert(merged.keySet == Set(0L, 1L), s"got ${merged.keySet}")
  }

  test("maintainJoin: maintained view equals a full recompute, multiplicities included") {
    // A is 1:N against B; deltas land on BOTH sides, including a key
    // (4) present only via the deltas — the ΔA⋈ΔB term must catch it
    val a  = Seq((1L, "a1"), (2L, "a2")).toDF("k", "av")
    val da = Seq((3L, "a3"), (4L, "a4")).toDF("k", "av")
    val b  = Seq((1L, 10), (1L, 11), (3L, 30)).toDF("k", "bv")
    val db = Seq((2L, 20), (1L, 12), (4L, 40), (4L, 41)).toDF("k", "bv")
    val viewCols = Seq("k", "av", "bv")
    val mv0 = a.join(b, Seq("k")).select(viewCols.map(col): _*)
    def bag(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
    val maintained = bag(TableOps.maintainJoin(mv0, a, da, b, db, Seq("k")))
    val recomputed = bag(a.union(da).join(b.union(db), Seq("k"))
      .select(viewCols.map(col): _*))
    // MULTISET equality: duplicate join outputs (1:N fan-out) must
    // carry the same multiplicity, not just the same distinct set
    assert(maintained == recomputed, s"$maintained vs $recomputed")
    assert(maintained.keys.exists(_._1 == 4L), "delta-only key must appear")
    // one-sided ingest: an empty ΔB degenerates to mv ∪ ΔA⋈B
    val oneSided = bag(TableOps.maintainJoin(mv0, a, da, b,
      db.limit(0), Seq("k")))
    val oneRecomputed = bag(a.union(da).join(b, Seq("k"))
      .select(viewCols.map(col): _*))
    assert(oneSided == oneRecomputed, s"$oneSided vs $oneRecomputed")
  }

  test("maintainJoinCounted: deletes with fan-out, delete+reinsert nets zero") {
    // A: key 1 (will be DELETED — its 2 view rows must vanish), key 2
    // (deleted then reinserted with a new value — net one change).
    // B: 1:N rows; key 2 also gains a B-side delete.
    val a  = Seq((1L, "a1", 1L), (2L, "a2", 1L)).toDF("k", "av", "_mult")
    val da = Seq((1L, "a1", -1L),                  // delete a fan-out row
                 (2L, "a2", -1L), (2L, "a2x", 1L), // delete + reinsert
                 (3L, "a3", 1L)).toDF("k", "av", "_mult")
    val b  = Seq((1L, 10, 1L), (1L, 11, 1L), (2L, 20, 1L), (3L, 30, 1L))
      .toDF("k", "bv", "_mult")
    val db = Seq((2L, 20, -1L), (2L, 21, 1L)).toDF("k", "bv", "_mult")
    val viewCols = Seq("k", "av", "bv")
    val mv0 = TableOps.consolidate(
      a.withColumnRenamed("_mult", "_ml")
        .join(b.withColumnRenamed("_mult", "_mr"), Seq("k"))
        .select(col("k"), col("av"), col("bv"),
          (col("_ml") * col("_mr")).as("_mult")),
      viewCols)
    val got = TableOps.maintainJoinCounted(mv0, a, da, b, db, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)) -> r.getLong(3)).toMap
    // final snapshots: A = {2->a2x, 3->a3}, B = {1->10, 1->11, 2->21, 3->30}
    val want = Map((2L, "a2x", 21) -> 1L, (3L, "a3", 30) -> 1L)
    assert(got == want, s"$got vs $want")
    // deleted key 1 must not survive anywhere (both its fan-out rows gone)
    assert(!got.keys.exists(_._1 == 1L), s"deleted key leaked: $got")
  }

  test("maintainAggCounted: deletes update sums/counts; an emptied group vanishes") {
    // view: per-key SUM(v)/COUNT over the base snapshot
    val base = Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L))
      .toDF("k", "sum_v")
    val mv0 = base.groupBy("k")
      .agg(sum("sum_v").as("sum_v"), count(lit(1)).as("cnt"))
    // batch: key 1 loses one row, key 2 is EMPTIED, key 3 gains a row,
    // key 4 is brand new
    val batch = Seq(
      (1L, 10L, -1L),
      (2L, 5L, -1L),
      (3L, 3L, 1L),
      (4L, 100L, 1L)).toDF("k", "sum_v", "_mult")
    val got = TableOps.maintainAggCounted(mv0, batch, Seq("k"), Seq("sum_v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = Map(1L -> (20L, 1L), 3L -> (10L, 2L), 4L -> (100L, 1L))
    assert(got == want, s"$got vs $want")
    assert(!got.contains(2L), s"emptied group survived: $got")
  }

  test("maintainValueCounts/readMinMax: deleting the extremum promotes the runner-up exactly") {
    val base = Seq((1L, 10L), (1L, 20L), (1L, 20L), (2L, 5L)).toDF("k", "v")
    val aux0 = base.groupBy("k", "v").agg(count(lit(1)).as("cnt"))
    // delete ONE of key 1's two 20s: max must stay 20 (count 2 -> 1)
    val b1 = Seq((1L, 20L, -1L)).toDF("k", "v", "_mult")
    val aux1 = TableOps.maintainValueCounts(aux0, b1, Seq("k"), "v")
    val r1 = TableOps.readMinMax(aux1, Seq("k"), "v")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(r1 == Map(1L -> (10L, 20L, 2L), 2L -> (5L, 5L, 1L)), r1.toString)
    // delete the LAST 20: the runner-up (10) must become the max —
    // the case insert-only zone maps cannot recover from
    val b2 = Seq((1L, 20L, -1L)).toDF("k", "v", "_mult")
    val aux2 = TableOps.maintainValueCounts(aux1, b2, Seq("k"), "v")
    val r2 = TableOps.readMinMax(aux2, Seq("k"), "v")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(r2 == Map(1L -> (10L, 10L, 1L), 2L -> (5L, 5L, 1L)), r2.toString)
    // empty key 2 entirely: it must vanish from the read
    val b3 = Seq((2L, 5L, -1L)).toDF("k", "v", "_mult")
    val aux3 = TableOps.maintainValueCounts(aux2, b3, Seq("k"), "v")
    val r3 = TableOps.readMinMax(aux3, Seq("k"), "v")
      .collect().map(_.getLong(0)).toSet
    assert(r3 == Set(1L), s"emptied key survived: $r3")
  }

  test("readQuantile: exact median off the counted multiset, shifts under deletes; p=1 is max") {
    val base = Seq((1L, 10L), (1L, 20L), (1L, 30L), (1L, 30L)).toDF("k", "v")
    val aux0 = base.groupBy("k", "v").agg(count(lit(1)).as("cnt"))
    def med(aux: org.apache.spark.sql.DataFrame, p: String) =
      TableOps.readQuantile(aux, Seq("k"), "v", new java.math.BigDecimal(p))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // n=4: position ceil(0.5*4)=2 -> 20
    assert(med(aux0, "0.5") == Seq((1L, 20L, 4L)))
    // delete 10 and 20: n=2, position 1 -> 30 (the duplicate pair
    // collapses to ONE aux row with count 2 — positions still exact)
    val b = Seq((1L, 10L, -1L), (1L, 20L, -1L)).toDF("k", "v", "_mult")
    val aux1 = TableOps.maintainValueCounts(aux0, b, Seq("k"), "v")
    assert(med(aux1, "0.5") == Seq((1L, 30L, 2L)))
    // p = 1 reads the max; p = 0.25 of the original reads the 1st
    assert(med(aux1, "1") == Seq((1L, 30L, 2L)))
    assert(med(aux0, "0.25") == Seq((1L, 10L, 4L)))
  }

  test("deleteBatchByKey: a dimension-key delete cascades through the pipeline with no fact tombstones") {
    // dim a: (k, grp); fact b: (k, v) with fan-out. View = per-grp SUM(v)/COUNT.
    val a = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("k", "grp")
      .withColumn("_mult", lit(1L))
    val b = Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L)).toDF("k", "sum_v")
      .withColumn("_mult", lit(1L))
    val mv0 = a.drop("_mult").join(b.drop("_mult"), Seq("k"))
      .groupBy("grp").agg(sum("sum_v").as("sum_v"), count(lit(1)).as("cnt"))
    // the delete arrives as a KEY list (dim key 1) — fact side untouched
    val da = TableOps.deleteBatchByKey(a, Seq(Tuple1(1L)).toDF("k"), Seq("k"))
    assert(da.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq == Seq((1L, -1L)))
    val db = b.limit(0)
    val got = TableOps.maintainPipelineCounted(mv0, a, da, b, db,
        joinKeys = Seq("k"), aggKeys = Seq("grp"), sumCols = Seq("sum_v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // both of key 1's fact rows vanish from grp x via the ΔA⋈B term alone
    assert(got == Map("x" -> (5L, 1L), "y" -> (7L, 1L)), got.toString)
    // double delete (dim key AND one of its fact rows): ΔA⋈ΔB nets to −1
    val db2 = TableOps.deleteBatchByKey(b, Seq((1L, 10L)).toDF("k", "sum_v"),
      Seq("k", "sum_v"))
    val got2 = TableOps.maintainPipelineCounted(mv0, a, da, b, db2,
        joinKeys = Seq("k"), aggKeys = Seq("grp"), sumCols = Seq("sum_v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got2 == Map("x" -> (5L, 1L), "y" -> (7L, 1L)),
      s"doubly-deleted pair double-applied: $got2")
  }

  test("readTopK: leaderboard slots off the counted multiset — runner-up promotion on a deleted #1") {
    // key g: 10 (x1), 9 (x2), 7 (x1) — top-3 slots are 10, 9, 9
    val aux0 = Seq(("g", 10L, 1L), ("g", 9L, 2L), ("g", 7L, 1L))
      .toDF("k", "v", "cnt")
    def slots(aux: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      TableOps.readTopK(aux, Seq("k"), "v", 3)
        .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(slots(aux0) == Seq((1L, 10L), (2L, 9L), (3L, 9L)))
    // delete the current #1: its aux row vanishes, 9 promotes to rank
    // 1 and the 7 enters the board — no recompute, no tombstones
    val aux1 = TableOps.maintainValueCounts(aux0,
      Seq(("g", 10L, -1L)).toDF("k", "v", "_mult"), Seq("k"), "v")
    assert(slots(aux1) == Seq((1L, 9L), (2L, 9L), (3L, 7L)),
      "runner-up must slide into rank 1 after the #1 is deleted")
    // fewer values than k: the board just ends early
    val aux2 = TableOps.maintainValueCounts(aux1,
      Seq(("g", 9L, -2L)).toDF("k", "v", "_mult"), Seq("k"), "v")
    assert(slots(aux2) == Seq((1L, 7L)))
    // ascending flips the board to a bottom-k
    val asc = TableOps.readTopK(aux0, Seq("k"), "v", 2, ascending = true)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(asc == Seq((1L, 7L), (2L, 9L)))
    // a corrupt aux (non-positive count) fails loudly, never emits
    // phantom ranks
    val bad = Seq(("g", 5L, 0L)).toDF("k", "v", "cnt")
    val e = intercept[Exception] {
      TableOps.readTopK(bad, Seq("k"), "v", 2).collect()
    }
    assert(e.getMessage.contains("non-positive count") ||
      e.getCause != null && e.getCause.getMessage.contains("non-positive count"))
  }

  test("deleteBatchByKey: a consolidated snapshot with |_mult| > 1 is fully cancelled") {
    // consolidate() output legally carries count 2 for a duplicated row;
    // a flat -1 stamp would remove only ONE copy and the key would
    // silently survive the delete — the batch must NEGATE the count.
    val stored = Seq((1L, 10L, 2L), (2L, 20L, 1L)).toDF("k", "sum_v", "_mult")
    val mv0 = Seq(("g", 40L, 3L)).toDF("grp", "sum_v", "cnt") // 2*10 + 20
    val db = TableOps.deleteBatchByKey(stored, Seq(Tuple1(1L)).toDF("k"), Seq("k"))
    assert(db.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq == Seq((1L, -2L)),
      "delete batch must carry the NEGATED stored count, not -1")
    val got = TableOps.maintainAggCounted(mv0,
        db.withColumn("grp", lit("g")).select("grp", "sum_v", "_mult"),
        Seq("grp"), Seq("sum_v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("g" -> (20L, 1L)), s"key-1 residue left behind: $got")
    // a snapshot WITHOUT the mult column is +1-per-row: stamped -1
    val plain = Seq((1L, 10L), (2L, 20L)).toDF("k", "sum_v")
    val dp = TableOps.deleteBatchByKey(plain, Seq(Tuple1(2L)).toDF("k"), Seq("k"))
    assert(dp.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq == Seq((2L, -1L)))
  }

  test("maintainAggCounted: delete+reinsert of the same row nets to no change") {
    val base = Seq((1L, 10L), (2L, 20L)).toDF("k", "sum_v")
    val mv0 = base.groupBy("k")
      .agg(sum("sum_v").as("sum_v"), count(lit(1)).as("cnt"))
    val batch = Seq((1L, 10L, -1L), (1L, 10L, 1L)).toDF("k", "sum_v", "_mult")
    val got = TableOps.maintainAggCounted(mv0, batch, Seq("k"), Seq("sum_v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // identical to the untouched view — the net-zero batch is invisible
    assert(got == Map(1L -> (10L, 1L), 2L -> (20L, 1L)), got.toString)
  }

  test("maintainZoneMap bloom merge: maintained == rebuilt BIT-FOR-BIT; new keys pass through; an uncovered side nulls the merge") {
    import org.apache.spark.sql.functions._
    import graft.functions.BloomExprs
    def stats(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(
        min("v").as("mn_v"), max("v").as("mx_v"),
        BloomExprs.bloom_filter_agg(xxhash64(col("v")), 100L).as("bf_v"))
    val base = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("k", "v")
    val delta = Seq((2L, 21L), (3L, 30L)).toDF("k", "v")
    val maintained = TableOps.maintainZoneMap(stats(base), stats(delta),
        Seq("k"), Seq("mn_v"), Seq("mx_v"), bloomStatCols = Seq("bf_v"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Array[Byte]](3).toSeq)).toMap
    val rebuilt = stats(base.unionByName(delta))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Array[Byte]](3).toSeq)).toMap
    // same build params both sides -> the merged bloom's BITS equal the
    // from-scratch build over the union (OR of set bits); key 1 is
    // mv-only, key 3 delta-only, key 2 the genuine merge
    assert(maintained == rebuilt,
      s"maintained zone stats (incl. blooms) diverged from the rebuild")
    // probe semantics survive the merge: key 2's bloom knows both rows
    val m2 = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(maintained(2L)._3.toArray))
    def h(v: Long): Long =
      org.apache.spark.sql.catalyst.expressions.XxHash64(
        Seq(org.apache.spark.sql.catalyst.expressions.Literal(v)), 42L)
        .eval(null).asInstanceOf[Long]
    assert(m2.mightContainLong(h(20L)) && m2.mightContainLong(h(21L)))
    // a present-but-uncovered side (NULL bloom) nulls the merge — a
    // sketch missing rows would wrongly prune; the reader treats NULL
    // as "constrains nothing"
    val uncovered = stats(base).withColumn("bf_v",
      when(col("k") === 2L, lit(null).cast("binary")).otherwise(col("bf_v")))
    val merged = TableOps.maintainZoneMap(uncovered, stats(delta),
        Seq("k"), Seq("mn_v"), Seq("mx_v"), bloomStatCols = Seq("bf_v"))
      .filter(col("k") === 2L).select("bf_v").head()
    assert(merged.isNullAt(0),
      "merging an uncovered bloom must stay NULL, not fabricate coverage")
  }

  test("vacuumVersions: retained batch ids resolve IDENTICALLY post-vacuum; below the horizon resolution fails loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft-vac").toString
    // sparse commit history: versions 0, 2, 5, 7 (micro-batches 1, 3,
    // 4, 6 re-read their predecessor — the first-existing-<= rule)
    Seq(0L, 2L, 5L, 7L).foreach { v =>
      Seq((v, s"v$v")).toDF("k", "s").write.parquet(TableOps.versionPath(root, v))
    }
    assert(TableOps.listVersions(spark, root) == Seq(0L, 2L, 5L, 7L))
    // pre-vacuum resolution snapshot over every id the store serves
    val pre = (0L to 9L).map(id => id -> TableOps.resolveVersion(spark, root, id)).toMap
    assert(pre(1L) == 0L && pre(4L) == 2L && pre(6L) == 5L && pre(9L) == 7L)
    // vacuum to keepFrom = 4: the FLOOR is version 2 (largest <= 4) —
    // it must be KEPT (ids 3/4 still resolve to it); only v=0 deletes
    val deleted = TableOps.vacuumVersions(spark, root, keepFrom = 4L)
    assert(deleted == Seq(0L), s"deleted: $deleted")
    assert(TableOps.listVersions(spark, root) == Seq(2L, 5L, 7L))
    assert(TableOps.vacuumHorizon(spark, root).contains(2L))
    // EVERY id >= the floor resolves exactly as before the vacuum
    (2L to 9L).foreach { id =>
      assert(TableOps.resolveVersion(spark, root, id) == pre(id),
        s"resolution of batch $id changed across the vacuum")
    }
    // a retained version's content is untouched (replay bit-identity)
    assert(spark.read.parquet(TableOps.versionPath(root, 2L))
      .as[(Long, String)].collect().toSeq == Seq((2L, "v2")))
    // below the horizon: LOUD failure, never a silently newer snapshot
    val e = intercept[IllegalStateException] {
      TableOps.resolveVersion(spark, root, 1L)
    }
    assert(e.getMessage.contains("vacuum"), e.getMessage)
    // idempotent re-vacuum: nothing left to delete, horizon stable
    assert(TableOps.vacuumVersions(spark, root, 4L).isEmpty)
    assert(TableOps.vacuumHorizon(spark, root).contains(2L))
    // a later vacuum advances monotonically: keepFrom 7 keeps only 7
    assert(TableOps.vacuumVersions(spark, root, 7L) == Seq(2L, 5L))
    assert(TableOps.listVersions(spark, root) == Seq(7L))
    assert(TableOps.vacuumHorizon(spark, root).contains(7L))
  }

  test("vacuum vs OPEN reader: losing a resolved version's files mid-scan fails LOUDLY, never as a silent empty result") {
    // The operational contract (SCALING.md: single writer, vacuum
    // keepFrom trails every reader's resolved version by the replay
    // window): this spec pins what happens when the contract is
    // VIOLATED — a reader that resolved version v and then loses v's
    // files to a concurrent vacuum must surface an error, not an
    // empty/partial result. Two reader shapes: a DataFrame whose file
    // listing predates the vacuum (scan hits deleted files), and a
    // fresh read of the vacuumed path (listing fails). Either way the
    // failure is loud; a silent 0-count would fail this test.
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-vacrd").toString
    Seq(0L, 1L, 2L).foreach { v =>
      spark.range(100L * v, 100L * v + 100).toDF("k")
        .coalesce(1).write.parquet(TableOps.versionPath(root, v))
    }
    val resolved = TableOps.resolveVersion(spark, root, 0L)
    val openReader = spark.read.parquet(TableOps.versionPath(root, resolved))
    assert(openReader.count() == 100) // the listing is bound pre-vacuum
    assert(TableOps.vacuumVersions(spark, root, keepFrom = 2L) == Seq(0L, 1L))
    // shape 1: the pre-vacuum listing scans deleted files -> loud
    val e1 = intercept[Exception] { openReader.select(sum("k")).collect() }
    val msg1 = (Iterator.iterate(e1: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.toString)).mkString(" | ")
    assert(msg1.toLowerCase.contains("exist") ||
        msg1.contains("FileNotFound"),
      s"expected a missing-file failure, got: $msg1")
    // shape 2: a fresh read of the vacuumed version's path -> loud
    intercept[Exception] {
      spark.read.parquet(TableOps.versionPath(root, 0L)).collect()
    }
    // and the RESOLUTION layer already refuses below the horizon
    intercept[IllegalStateException] {
      TableOps.resolveVersion(spark, root, 0L)
    }
  }

  test("vacuum marker: overwriting a LEGACY checksummed marker never leaves a stale .crc sidecar") {
    // Cross-version hazard: the pre-round-17 delete-then-rename commit
    // went through the checksum layer (LocalFileSystem), leaving the
    // marker a `.{name}.crc` sidecar; the OVERWRITE-rename commits at
    // the RAW layer, which would strand that sidecar describing stale
    // content — and every later fs.open(marker) would die with
    // ChecksumException. The fix drops the sidecar before renaming;
    // this pins a legacy-shaped marker surviving a new-code vacuum.
    val root = java.nio.file.Files.createTempDirectory("graft-vaccrc").toString
    Seq(0L, 2L).foreach { v =>
      Seq((v, s"v$v")).toDF("k", "s").write.parquet(TableOps.versionPath(root, v))
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(conf)
    // legacy-shaped marker: written THROUGH the checksum layer, so the
    // sidecar exists and matches this content
    val marker = new org.apache.hadoop.fs.Path(p, "_VACUUM_HORIZON")
    val out = fs.create(marker, true)
    try out.write("0\n".getBytes("UTF-8")) finally out.close()
    assert(fs.exists(new org.apache.hadoop.fs.Path(p, "._VACUUM_HORIZON.crc")),
      "fixture assumption broken: the local fs did not write a crc sidecar")
    assert(TableOps.vacuumHorizon(spark, root).contains(0L))
    // new-code vacuum overwrites the marker with a different horizon
    assert(TableOps.vacuumVersions(spark, root, keepFrom = 2L) == Seq(0L))
    // the horizon reads CLEANLY — a stale sidecar would throw
    // ChecksumException here (and on every later resolveVersion)
    assert(TableOps.vacuumHorizon(spark, root).contains(2L))
    assert(TableOps.resolveVersion(spark, root, 5L) == 2L)
  }

  test("vacuumVersions: keepFrom below every version is a no-op; an empty store resolves loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft-vac2").toString
    Seq((1L, "a")).toDF("k", "s").write.parquet(TableOps.versionPath(root, 5L))
    // no version <= 3 exists: nothing deletable, no horizon written
    assert(TableOps.vacuumVersions(spark, root, 3L).isEmpty)
    assert(TableOps.vacuumHorizon(spark, root).isEmpty)
    assert(TableOps.resolveVersion(spark, root, 6L) == 5L)
    val e = intercept[IllegalStateException] {
      TableOps.resolveVersion(spark, root, 3L)
    }
    assert(e.getMessage.contains("no snapshot"), e.getMessage)
  }
}
