package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The blow-up tool's own failure modes (r13 review wave): a bad factor
  * must fail BEFORE any table lands, a factor beyond the embedding
  * dimension must rotate modulo dim instead of crashing mid-run, and the
  * events leg must survive the INT64 TIMESTAMP(NANOS) parquet vintage every
  * other reader in the repo already tolerates.
  */
class ScaleUpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Minimal source dir with every table ScaleUp touches; embeddings get
    * dimension `dim` so a small factor can exceed it.
    */
  private def tinySrc(dim: Int): String = {
    val src = Files.createTempDirectory("scaleup-src").toString
    def save(t: String)(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$src/$t.parquet")
    save("region")(Seq((0L, "r")).toDF("r_regionkey", "r_name"))
    save("nation")(Seq((0L, "n")).toDF("n_nationkey", "n_name"))
    save("customer")(Seq((1L, "c")).toDF("c_custkey", "c_name"))
    save("supplier")(Seq((1L, "s")).toDF("s_suppkey", "s_name"))
    save("part")(Seq((1L, "p")).toDF("p_partkey", "p_name"))
    save("orders")(Seq((1L, 1L)).toDF("o_orderkey", "o_custkey"))
    save("lineitem")(Seq((1L, 1L, 1L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey"))
    save("events")(Seq((1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("event_id", "user_id", "ts"))
    save("documents")(Seq((1L, "alpha beta", 10L))
      .toDF("doc_id", "text", "n_chars"))
    save("embeddings")(Seq((1L, (1 to dim).map(_.toFloat)))
      .toDF("vec_id", "embedding"))
    src
  }

  test("factor < 1 fails fast, before ANY table is written") {
    val src = tinySrc(4)
    val out = Files.createTempDirectory("scaleup-out").resolve("o").toString
    intercept[IllegalArgumentException] {
      ScaleUp.write(spark, src, out, 0)
    }
    assert(!Files.exists(Paths.get(out)),
      "a rejected factor must leave no half-built output")
  }

  test("factor beyond the embedding dimension rotates modulo dim, no crash") {
    val src = tinySrc(4)
    val out = Files.createTempDirectory("scaleup-out").toString
    ScaleUp.write(spark, src, out, 6) // 6 > dim 4: pre-fix negative slice
    val em = spark.read.parquet(s"$out/embeddings.parquet")
      .orderBy("vec_id")
      .select("embedding").as[Seq[Float]].collect()
    assert(em.length === 6)
    assert(em.forall(_.length === 4), "rotation must preserve dimension")
    val base = Seq(1f, 2f, 3f, 4f)
    assert(em(0) === base)
    assert(em(1) === Seq(2f, 3f, 4f, 1f)) // rotate left 1
    assert(em(4) === base) // k=4 ≡ 0 (mod 4): documented correlation limit
    assert(em(5) === Seq(2f, 3f, 4f, 1f)) // k=5 ≡ 1 (mod 4)
    // stacked facts really are factor-many disjoint copies
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.count() === 6)
    assert(docs.select("doc_id").distinct().count() === 6)
    // entity names are decorrelated per copy (else name-similarity queries
    // owe a quadratic answer over the duplicates — r13 ladder finding),
    // and the suffixes are PAIRWISE >= 2 edits apart: plain ~k suffixes
    // were themselves distance-1 neighbors and er01 still paired every
    // cross-copy duplicate (r13 review)
    val names = spark.read.parquet(s"$out/customer.parquet")
      .select("c_name").as[String].collect().toSet
    assert(names === Set("c", "c~11", "c~22", "c~33", "c~44", "c~55"), names)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (x <- names; y <- names if x < y)
      assert(lev(x, y) >= 2, s"suffixed names must not be edit-1 adjacent: $x / $y")
  }

  test("decorrelate mode: intra-copy cosines exact, alias copies distinct") {
    // the sign-flip is a diagonal ±1 orthogonal transform: within a copy
    // both vectors flip the same coordinates, so every intra-copy dot
    // product (hence cosine) must be EXACTLY preserved — the ladder's
    // validity rests on this. Across copies, k ≡ k' (mod dim) must no
    // longer be identical (the rotation-alias the flag exists to break).
    val src = Files.createTempDirectory("scaleup-src").toString
    def save(t: String)(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$src/$t.parquet")
    save("region")(Seq((0L, "r")).toDF("r_regionkey", "r_name"))
    save("nation")(Seq((0L, "n")).toDF("n_nationkey", "n_name"))
    save("customer")(Seq((1L, "c")).toDF("c_custkey", "c_name"))
    save("supplier")(Seq((1L, "s")).toDF("s_suppkey", "s_name"))
    save("part")(Seq((1L, "p")).toDF("p_partkey", "p_name"))
    save("orders")(Seq((1L, 1L)).toDF("o_orderkey", "o_custkey"))
    save("lineitem")(Seq((1L, 1L, 1L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey"))
    save("events")(Seq((1L, 1L,
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("event_id", "user_id", "ts"))
    save("documents")(Seq((1L, "alpha beta", 10L))
      .toDF("doc_id", "text", "n_chars"))
    // two base vectors with a known dot product, dim 4
    save("embeddings")(Seq(
      (1L, Seq(1f, 2f, 3f, 4f)), (2L, Seq(4f, 3f, 2f, 1f)))
      .toDF("vec_id", "embedding"))
    val out = Files.createTempDirectory("scaleup-out").toString
    ScaleUp.write(spark, src, out, 6, decorrelateEmbeddings = true)
    val em = spark.read.parquet(s"$out/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().toMap
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val baseDot = dot(em(1L), em(2L))
    val stride = 1000000000L
    for (k <- 1 until 6) {
      val (a, b) = (em(k * stride + 1L), em(k * stride + 2L))
      assert(dot(a, b) === baseDot,
        s"copy $k must preserve the intra-copy dot product exactly")
      assert(dot(a, a) === dot(em(1L), em(1L)), s"copy $k norm drifted")
    }
    // rotation alone made copy 4 ≡ copy 0 (mod dim 4) IDENTICAL — the
    // sign flip must break that alias
    assert(em(4L * stride + 1L) !== em(1L),
      "alias copy k=dim must differ from copy 0 under decorrelate")
    // and the default mode stays byte-identical to the old behavior
    val out2 = Files.createTempDirectory("scaleup-out").toString
    ScaleUp.write(spark, src, out2, 6)
    val plain = spark.read.parquet(s"$out2/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    assert(plain(4L * stride + 1L) === plain(1L),
      "default mode keeps the documented rotation alias")
  }

  test("events leg survives the INT64 TIMESTAMP(NANOS) vintage") {
    val src = tinySrc(4)
    // swap in the nanos-vintage fixture (Spark cannot write one itself)
    val nanos = Paths.get("src/test/resources/fixtures/nanos/events.parquet")
    val dest = Paths.get(s"$src/events.parquet")
    def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      if (Files.isDirectory(from)) {
        Files.createDirectories(to)
        val s = Files.list(from)
        try s.iterator().forEachRemaining(p =>
          copyTree(p, to.resolve(p.getFileName)))
        finally s.close()
      } else Files.copy(from, to, StandardCopyOption.REPLACE_EXISTING)
    }
    def deleteTree(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.iterator().forEachRemaining(deleteTree)
        finally s.close()
      }
      Files.deleteIfExists(p)
    }
    deleteTree(dest)
    copyTree(nanos, dest)
    val out = Files.createTempDirectory("scaleup-out").toString
    ScaleUp.write(spark, src, out, 2) // pre-fix: "Illegal Parquet type"
    val ev = graft.Tables.events(spark, out) // normalizeEvents handles LONG
    assert(ev.count() === 6) // 3 fixture rows × 2 copies
    assert(ev.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }
}
