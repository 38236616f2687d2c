package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The ss03 plane-count rule: log₂ growth with corpus size, pinned at the
  * minimum across every oracle-scale corpus (so the hash-gated oracle's
  * inlined 4-plane signature stays exact).
  */
class SimilarityScaleSpec extends AnyFunSuite {

  test("plane count pins at 4 through the oracle scales, grows log2 beyond") {
    assert(SimilarityOps.planesFor(500) === 4)   // sf0.001–0.01 corpora
    assert(SimilarityOps.planesFor(2000) === 4)  // sf0.1 corpus
    assert(SimilarityOps.planesFor(2048) === 4)  // pin range upper edge
    // beyond the pin range the BUCKET, not the corpus, is the constant:
    // the r13 30× rehearsal's 60 k corpus must NOT resolve to MinPlanes
    // (it did with the old 4096 target — ~3750-vector buckets spilled the
    // disk dry in dd08's vector join-back)
    assert(SimilarityOps.planesFor(2049) === 5)
    assert(SimilarityOps.planesFor(60000) === 9)
    assert(SimilarityOps.planesFor(1L << 20) === 13)
    assert(SimilarityOps.planesFor(1L << 30) === 23)
  }

  test("scale-aware oracle: pinned at driver scales, regenerated beyond") {
    // the cross-engine contract behind SparkEntry.oracleSqlFor: at every
    // driver testdata corpus (≤ 2 048 vectors) the regenerated SQL IS the
    // static oracle map's SQL, so the driver hash gate sees no change...
    for (n <- Seq(200L, 2000L, 2048L)) {
      assert(SimilarityOps.nearDupPairsCteSqlFor(n)
        === SimilarityOps.nearDupPairsCteSql, s"n=$n")
      for ((k, sql) <- SimilarityOps.oracleAt(n))
        assert(sql === SimilarityOps.oracle(k), s"$k n=$n")
      assert(GraphOps.oracleAt(n) === GraphOps.oracle, s"n=$n")
      assert(DedupClusters.oracleAt(n)("dd08_semantic_clusters")
        === DedupClusters.oracle("dd08_semantic_clusters"), s"n=$n")
    }
    // ...while the 10× ladder fixture's 20 k vectors regenerate with the
    // ENGINE's geometry (planesFor(20000)=8 → 4 tables): a 4th signature
    // column and 4 candidate branches — the pinned SQL would disagree on
    // LSH recall there, which the exact-cosine filter cannot repair
    val at10x = SimilarityOps.nearDupPairsCteSqlFor(20000)
    assert(at10x.contains("AS s3") && !at10x.contains("AS s4"))
    assert(SimilarityOps.bandTablesFor(SimilarityOps.planesFor(20000)) === 4)
    // every spliced consumer regenerates from the same CTE; ss03/ss08's
    // single-table signature regenerates its plane count the same way
    // (8 planes → a 128-weight CASE term only an 8th plane produces)
    val single = Set("ss03_ann_lsh", "ss08_filtered_ann")
    for ((k, sql) <- SimilarityOps.oracleAt(20000) ++
        DedupClusters.oracleAt(20000) ++ GraphOps.oracleAt(20000))
      assert(if (single(k)) sql.contains("THEN 128 ELSE")
             else sql.contains("AS s3"), k)
    // table growth caps at 8 (s0..s7) no matter the corpus
    val huge = SimilarityOps.nearDupPairsCteSqlFor(1L << 30)
    assert(huge.contains("AS s7") && !huge.contains("AS s8"))
    // the full membership of the class — Verify's skip-the-count guard
    // keys off this set, so a new scale-dependent oracle must be added
    // HERE (and to an oracleAt) or subset ladder runs dump stale SQL
    assert(graft.SparkEntry.scaleDependentOracleKeys === Set(
      "ss03_ann_lsh", "ss08_filtered_ann", "ss05_ann_rerank",
      "dd07_embedding_lsh_neardup", "dd08_semantic_clusters",
      "gr01_pagerank", "gr02_triangles", "gr03_bfs_hops",
      "rec01_recursive_cte"))
  }

  test("expected bucket occupancy stays bounded once the rule engages") {
    for (n <- Seq(1L << 17, 1L << 20, 1L << 26, 1L << 30, 1L << 36)) {
      val p = SimilarityOps.planesFor(n)
      val expectedOccupancy = n.toDouble / (1L << p)
      assert(expectedOccupancy <= SimilarityOps.TargetBucket.toDouble,
        s"n=$n p=$p occupancy=$expectedOccupancy")
    }
  }

  test("ss07 k-means converges planted groups to shared clusters") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("ss07").toString
    // two groups of identical vectors along orthogonal axes: every member
    // must land in its group's cluster after the Lloyd iterations, with
    // deterministic min-id tie-breaks on identical dot products
    def vec(axis: Int): Seq[Float] =
      Seq.tabulate(64)(i => if (i == axis) 1.0f else 0.0f)
    (Seq.tabulate(4)(i => (i.toLong, vec(0), 0)) ++
      Seq.tabulate(4)(i => ((10 + i).toLong, vec(1), 1)))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    val rows = SimilarityOps.queries("ss07_kmeans")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 8)
    val byCluster = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster.values.toSet === Set(Set(0L, 1L, 2L, 3L),
      Set(10L, 11L, 12L, 13L)), byCluster.toString)
    assert(rows.forall(_._3 === 4L)) // both clusters report 4 members
  }

  test("ss09 PQ: a query's exact duplicate holds the ADC floor at zero") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("ss09").toString
    // each fixture vector sits exactly ON codebook entry c=i in every
    // sub-space: the float (grid + 0.5)/10⁴ floors to the grid integer
    // under the ×10⁴ fixed-point quantization even for negative grid
    // values (the +0.5 keeps the double image strictly inside
    // [grid, grid+1)), so codes(vec i) = (i,i,i,i) with zero
    // quantization error. The query row itself is excluded (vec_id ≠
    // qid), so its exact duplicate q+3 — same codes, ADC(q, q+3) =
    // ADC(q, q) = 0 — must hold rank 1, and every non-duplicate's
    // distinct codes score strictly positive.
    def vec(i: Int): Seq[Float] =
      Seq.tabulate(64) { dd =>
        val m = dd / 16; val d = dd % 16
        ((((m * 31 + i * 13 + d * 11) % 8) - 4) * 500 + 0.5f) / 10000f
      }
    Seq((0L, vec(0), 0), (1L, vec(1), 0), (2L, vec(2), 0),
      (3L, vec(0), 0), (4L, vec(1), 1), (5L, vec(2), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    val rows = SimilarityOps.queries("ss09_pq_ann")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    for (q <- 0L to 2L) {
      val g = rows.filter(_._1 == q).sortBy(_._4)
      assert(g.head._2 === q + 3, g.mkString(","))
      assert(g.head._3 === 0L, "exact duplicate must score ADC 0")
      assert(g.tail.forall(_._3 > 0L),
        "non-duplicates must score strictly positive ADC: " + g.mkString(","))
      val sorted = g.map(_._3)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    }
  }

  test("embCount cache evicts least-recently-used past the cap") {
    SimilarityOps.embCountCache.synchronized {
      SimilarityOps.embCountCache.clear()
      for (i <- 0 until SimilarityOps.EmbCountCacheMax + 10)
        SimilarityOps.embCountCache.put(s"/dir$i", ("fp", i.toLong))
      assert(SimilarityOps.embCountCache.size() ===
        SimilarityOps.EmbCountCacheMax)
      // oldest inserts evicted, newest retained
      assert(!SimilarityOps.embCountCache.containsKey("/dir0"))
      assert(SimilarityOps.embCountCache.containsKey(
        s"/dir${SimilarityOps.EmbCountCacheMax + 9}"))
      // access-ordered: touching the eldest survivor protects it from the
      // next insert; the then-eldest untouched entry goes instead
      SimilarityOps.embCountCache.get("/dir10")
      SimilarityOps.embCountCache.put("/newcomer", ("fp", -1L))
      assert(SimilarityOps.embCountCache.containsKey("/dir10"))
      assert(!SimilarityOps.embCountCache.containsKey("/dir11"))
      SimilarityOps.embCountCache.clear()
    }
  }
}
