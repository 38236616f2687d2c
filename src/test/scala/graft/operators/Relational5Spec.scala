package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic checks for the fifth relational tranche + the EWMA and
  * pair-construction operators — the oracle gate proves hash-exactness;
  * these prove the contracts on planted fixtures: the mode tie-break is
  * deterministic, the EWMA fold matches a sequential reference, the
  * lambda folds handle empty selections, and negative sampling is
  * reproducible and positive-disjoint where required.
  */
class Relational5Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001
  import spark.implicits._

  test("q52 lambda folds: empty filter selection sums to zero, exists/forall edges") {
    val r = Relational5.queries("q52_higher_order")(spark, dir)
    val row = r.filter(col("even_qty") === 0L).limit(1).collect()
    // at least one order has all-odd quantities at sf0.001; its even_qty
    // must be the fold's zero element, not null
    if (row.nonEmpty) assert(!row(0).isNullAt(row(0).fieldIndex("even_qty")))
    // forall(x > 0) holds everywhere (quantities are positive)
    assert(r.filter(col("all_positive") =!= 1).count() === 0)
    // has_large == a recomputation from the raw table for a spot key
    val checked = r.select(col("l_orderkey"),
      (col("total_qty") >= col("n_items")).as("ok"))
      .filter(!col("ok")).count()
    assert(checked === 0) // every qty >= 1 so total >= n_items
  }

  test("q54 mode tie-break picks the lexicographically smallest segment") {
    // planted: nation 1 has two segments tied at 2, 'AAA' < 'BBB'
    val c = Seq(
      (1, 100L, "BBB"), (1, 200L, "BBB"), (1, 300L, "AAA"), (1, 400L, "AAA"),
      (2, 500L, "ZZZ"))
      .toDF("c_nationkey", "cents", "c_mktsegment")
    val mode = c.groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("c_nationkey")
      .agg(min(struct((-col("cnt")).as("neg"), col("c_mktsegment").as("seg")))
        .as("m"))
      .select(col("c_nationkey"), col("m.seg").as("mode_segment"))
    val got = mode.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(1) === "AAA")
    assert(got(2) === "ZZZ")
  }

  test("ts05 EWMA fold matches the sequential reference on every user") {
    val r = TemporalJoins.queries("ts05_ewma")(spark, dir)
      .select("user_id", "ewma_cents").as[(Long, Long)].collect().toMap
    // sequential reference computed on the driver from the raw table
    val raw = graft.Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, java.sql.Timestamp, Long, Long)].collect()
    val expect = raw.groupBy(_._1).map { case (u, rows) =>
      val cs = rows.sortBy(r => (r._2.getTime, r._3)).map(_._4)
      u -> cs.reduceLeft((a, x) => (a + x) >> 1)
    }
    assert(expect.size === r.size)
    expect.foreach { case (u, v) => assert(r(u) === v, s"user $u") }
  }

  test("mm06 pairing: 1 positive + 3 deterministic negatives per doc, stable across runs") {
    val p1 = Multimodal.queries("mm06_pair_negatives")(spark, dir)
    val perDoc = p1.groupBy("doc_id")
      .agg(sum(col("is_positive")).as("np"), count(lit(1)).as("n"))
    assert(perDoc.filter(col("np") =!= 1 || col("n") =!= 4).count() === 0)
    // positives pair the doc with its own vector id
    assert(p1.filter(col("is_positive") === 1)
      .filter(col("doc_id") =!= col("vec_id")).count() === 0)
    // determinism: a second run yields the identical pair set
    val p2 = Multimodal.queries("mm06_pair_negatives")(spark, dir)
    assert(p1.exceptAll(p2).count() === 0)
    assert(p2.exceptAll(p1).count() === 0)
  }

  test("vr01 variant extraction: absent path is NULL for every row, k totals consistent") {
    val r = Relational5.queries("vr01_variant")(spark, dir).collect()
    r.foreach { row =>
      val nK = row.getLong(row.fieldIndex("n_k"))
      val nMissing = row.getLong(row.fieldIndex("n_missing"))
      // every event has $.k and lacks $.missing
      assert(nK === nMissing)
    }
  }

  test("q59 equi-depth buckets: full cover, near-equal depth, disjoint ranges") {
    val r = Relational5.queries("q59_equidepth_hist")(spark, dir)
      .orderBy("bucket").collect()
    assert(r.map(_.getInt(0)).toSeq === Seq(1, 2, 3, 4))
    val total = graft.Tables(spark, dir, "lineitem").count()
    assert(r.map(_.getLong(1)).sum === total)
    // equi-depth: each quartile bucket holds 25% ± the tie mass at a
    // boundary (cents are near-unique, so ±1% of the corpus is generous)
    r.foreach { row =>
      assert(math.abs(row.getLong(1) - total / 4) <= total / 100,
        s"bucket ${row.getInt(0)} depth ${row.getLong(1)} vs n/4=${total / 4}")
    }
    // value ranges are ordered and disjoint
    val ranges = r.map(row => (row.getLong(2), row.getLong(3)))
    ranges.foreach { case (lo, hi) => assert(lo <= hi) }
    ranges.zip(ranges.tail).foreach { case ((_, hi), (lo, _)) =>
      assert(hi <= lo, s"overlapping buckets: $hi > $lo")
    }
  }

  test("pa02 l-diversity: l bounded by the sensitive domain, flag consistent") {
    val r = Relational5.queries("pa02_l_diversity")(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val size = row.getLong(row.fieldIndex("class_size"))
      val l = row.getLong(row.fieldIndex("l_diversity"))
      val diverse = row.getInt(row.fieldIndex("diverse"))
      assert(l >= 1L && l <= 2L) // binary sensitive attribute
      assert(l <= size)
      assert(diverse === (if (l >= 2L) 1 else 0))
    }
  }

  test("ts06 rolling median matches a sequential reference on every row") {
    val rows = TemporalJoins.queries("ts06_rolling_median")(spark, dir)
      .select("user_id", "event_id", "cents", "roll_median")
      .as[(Long, Long, Long, Double)].collect()
    val byUser = graft.Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, java.sql.Timestamp, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._2.getTime, e._3))).toMap
    val expect = byUser.toSeq.flatMap { case (u, es) =>
      es.zipWithIndex.map { case (e, i) =>
        val win = es.slice(math.max(0, i - 10), i + 1).map(_._4).sorted
        val m = if (win.length % 2 == 1) win(win.length / 2).toDouble
        else (win(win.length / 2 - 1) + win(win.length / 2)) / 2.0
        (u, e._3) -> m
      }
    }.toMap
    assert(rows.length === expect.size)
    rows.foreach { case (u, eid, _, m) =>
      assert(m === expect((u, eid)), s"user $u event $eid")
    }
  }
}
