package graft.operators

import java.nio.file.Files
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Planted-fixture behavior for the corpus-hygiene operators: the oracle
  * gate proves exactness on the synthetic corpus; these prove the operators
  * actually FIRE on contaminated / repetitive / PII-bearing documents.
  */
class CorpusFiltersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("corpusf").toString
    val leaked = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    Seq(
      // doc 0: benchmark doc (0 % 20 == 0)
      (0L, leaked, "en", "bench", leaked.length.toLong),
      // doc 21: verbatim half of the benchmark doc → many shared 5-grams
      (21L, "alpha beta gamma delta epsilon zeta eta theta different tail here",
        "en", "web", 60L),
      // doc 22: clean
      (22L, "totally unrelated words about query engines and big shuffles now",
        "en", "web", 60L),
      // doc 23: pathological repetition
      (23L, "spam spam spam spam spam spam spam spam spam spam",
        "en", "web", 49L),
      // doc 24: PII-bearing
      (24L, "contact me at alice.smith@example.org or +1 (555) 123-4567 thanks",
        "en", "web", 64L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("dd09 finds the exact cross-doc 8-token span, ignores within-doc repeats") {
    // docs 0 and 21 share exactly their first 8 tokens ("alpha .. theta");
    // doc 23's spam-run repeats only WITHIN itself (count-distinct-doc < 2)
    val spans = CorpusFilters.queries("dd09_substring_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSet
    assert(spans == Set((0L, 0, 7, 8), (21L, 0, 7, 8)))
  }

  test("dc01 flags the doc sharing >=3 five-grams with the benchmark set") {
    val rows = CorpusFilters.queries("dc01_decontaminate")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(!rows.contains(0L)) // benchmark docs are excluded from the output
    assert(rows(21L)._1 >= 3 && rows(21L)._2 == 1) // contaminated
    assert(rows(22L) == ((0, 0))) // clean doc: zero overlap
  }

  test("tx10 repetition signals separate spam from prose") {
    val rows = CorpusFilters.queries("tx10_repetition")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(2), r.getDouble(3), r.getInt(4))).toMap
    val (dupSpam, topSpam, flagSpam) = rows(23L)
    assert(dupSpam > 0.8) // 10 copies of one word
    assert(topSpam == 1.0) // every bigram is "spam spam"
    assert(flagSpam == 1)
    val (_, _, flagClean) = rows(22L)
    assert(flagClean == 0)
  }

  test("tx11 counts and redacts planted email + phone") {
    val rows = CorpusFilters.queries("tx11_pii_redact")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    val (nEmail, nPhone, redactedMd5) = rows(24L)
    assert(nEmail == 1)
    assert(nPhone == 1)
    assert(redactedMd5 ===
      md5hex("contact me at <EMAIL> or <PHONE> thanks"))
    // documents without PII pass through byte-identical
    assert(rows(22L)._3 === md5hex(
      "totally unrelated words about query engines and big shuffles now"))
  }

  test("tx12 temperature mix downsamples the head source, keeps the tail") {
    import spark.implicits._
    val d = Files.createTempDirectory("tempmix").toString
    val rows =
      (0 until 40).map(i => (i.toLong, s"head doc $i", "en", "big", 10L)) ++
        (100 until 105).map(i => (i.toLong, s"tail doc $i", "en", "small", 10L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val got = CorpusFilters.queries("tx12_temperature_mix")(spark, d).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(got("big") == 20)  // head capped at K (quota 20 of 40 docs)
    assert(got("small") == 5) // quota ceil(20*sqrt(5/40)) = 8 > 5 → all kept
  }

  test("dd09 property: equals brute-force span merge on random corpora") {
    import spark.implicits._
    val k = 8
    val rng = new scala.util.Random(1234)
    val vocab = Array("a", "b", "c", "d", "e", "f")
    (1 to 3).foreach { trial =>
      val base = (0L until 20L).map { id =>
        id -> Array.fill(15 + rng.nextInt(26))(vocab(rng.nextInt(vocab.length)))
      }.toMap
      // plant a cross-doc duplicate run: 10 tokens of doc 3 pasted into doc 7
      val src = base(3L)
      val planted = src.slice(2, math.min(12, src.length))
      val docsMap = base.updated(7L,
        base(7L).take(5) ++ planted ++ base(7L).drop(5))
      val d = Files.createTempDirectory(s"dd09p$trial").toString
      docsMap.toSeq.map { case (id, w) =>
        (id, w.mkString(" "), "en", "web", w.mkString(" ").length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$d/documents.parquet")
      // brute-force reference: dup grams by distinct-doc count, then merge
      val owners = scala.collection.mutable.Map.empty[String, Set[Long]]
        .withDefaultValue(Set.empty)
      for ((id, w) <- docsMap; if w.length >= k; i <- 0 to w.length - k)
        owners(w.slice(i, i + k).mkString(" ")) += id
      val dup = owners.filter(_._2.size >= 2).keySet
      val expect = docsMap.toSeq.flatMap { case (id, w) =>
        val hits = (0 to w.length - k)
          .filter(i => w.length >= k && dup(w.slice(i, i + k).mkString(" ")))
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        hits.foreach { p =>
          if (spans.nonEmpty && p <= spans.last._2 + 1)
            spans(spans.length - 1) = (spans.last._1,
              math.max(spans.last._2, p + k - 1))
          else spans += ((p, p + k - 1))
        }
        spans.map { case (a, b) => (id, a, b, b - a + 1) }
      }.toSet
      val got = CorpusFilters.queries("dd09_substring_spans")(spark, d)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
      assert(got == expect, s"trial $trial mismatch")
      assert(expect.exists(_._1 == 7L), s"trial $trial: planted span missing")
    }
  }

  test("dd07 emits exactly the bucket-mate pairs at cosine >= 0.4 (precision 1)") {
    val sf = TestSpark.sf0001
    val got = SimilarityOps.queries("dd07_embedding_lsh_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    assert(got.forall(_._3 >= 0.4)) // precision is exact by construction
    // every emitted pair must be a true cos>=0.4 pair of the brute-force set
    val brute = {
      import org.apache.spark.sql.functions._
      val e = graft.Tables(spark, sf, "embeddings").select(
        col("vec_id"),
        col("embedding").as("v"))
        .withColumn("nrm", sqrt(graft.functions.GraftFunctions.dot_product(col("v"), col("v"))))
      val a = e.select(col("vec_id").as("id1"), col("v").as("v1"), col("nrm").as("n1"))
      val b = e.select(col("vec_id").as("id2"), col("v").as("v2"), col("nrm").as("n2"))
      a.join(b, col("id2") > col("id1"))
        .select(col("id1"), col("id2"),
          round(graft.functions.GraftFunctions.dot_product(col("v1"), col("v2"))
            / (col("n1") * col("n2")), 6).as("cos"))
        .filter(col("cos") >= 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(got.forall(p => brute.contains((p._1, p._2))))
    // multi-table amplification: recall must beat any single 4-plane table's
    // theoretical ceiling for mid-cosine pairs; empirically assert a floor
    assert(got.length.toDouble / brute.size >= 0.2,
      s"recall ${got.length}/${brute.size}")
  }

  test("tx15 ranks a document's distinctive term above corpus-wide words") {
    // doc 23 ("spam" x10): tf=10, and "spam" appears in no other doc, so
    // its score dominates; rk 1 must be "spam" with tf=10, df=1
    val rows = CorpusFilters.queries("tx15_tfidf")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getInt(5)), (r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows((23L, 1)) == (("spam", 10L, 1L)))
    // every doc emits at most 3 terms, ranks 1..3 dense
    val byDoc = rows.keys.groupBy(_._1)
    byDoc.foreach { case (_, ks) =>
      val ranks = ks.map(_._2).toList.sorted
      assert(ranks == (1 to ranks.size).toList)
      assert(ranks.size <= 3)
    }
    // within a document, scores are non-increasing with rank
    CorpusFilters.queries("tx15_tfidf")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(5), r.getLong(4)))
      .groupBy(_._1).values.foreach { g =>
        val byRank = g.sortBy(_._2).map(_._3)
        assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
      }
  }

  test("ss06 flags the vector pointing away from its label centroid") {
    import spark.implicits._
    val d = Files.createTempDirectory("ss06").toString
    // label 0: a tight cluster along +e0 plus one anti-aligned outlier;
    // label 1: a clean cluster along +e1 (no outliers)
    def vec(main: Int, sign: Float): Seq[Float] =
      Seq.tabulate(64)(i => if (i == main) sign else 0.01f)
    Seq(
      (0L, vec(0, 1.0f), 0),
      (1L, vec(0, 1.0f), 0),
      (2L, vec(0, 1.0f), 0),
      (3L, vec(0, -1.0f), 0), // outlier: anti-aligned with its centroid
      (10L, vec(1, 1.0f), 1),
      (11L, vec(1, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    val rows = SimilarityOps.queries("ss06_embedding_outliers")(spark, d)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getInt(3))).toMap
    assert(rows(3L)._2 == 1, s"outlier not flagged: ${rows(3L)}")
    assert(rows(3L)._1 < 0, "anti-aligned vector must have negative cosine")
    Seq(0L, 1L, 2L, 10L, 11L).foreach { id =>
      assert(rows(id)._2 == 0, s"inlier $id flagged: ${rows(id)}")
      assert(rows(id)._1 > 0.5)
    }
  }

  test("tx18 inverted index: df is the true doc frequency, postings sorted and bounded") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val out = TextOps.queries("tx18_inverted_index")(spark, sf).cache()
    try {
      assert(out.count() > 0)
      val rows = out.collect()
      rows.foreach { r =>
        val df = r.getLong(r.fieldIndex("df"))
        val posting = r.getString(r.fieldIndex("sample_postings"))
          .split(",").map(_.toLong).toSeq
        assert(df >= 50L)
        assert(posting.length === math.min(df, 20L).toInt)
        assert(posting === posting.sorted, s"unsorted postings for ${r.getString(0)}")
      }
      // spot-check one term's df and smallest postings against the corpus
      val w = rows.head.getString(0)
      val truth = graft.Tables(spark, sf, "documents")
        .select(col("doc_id"),
          explode(split(lower(col("text")), " ")).as("t"))
        .filter(col("t") === w).select("doc_id").distinct()
      val ids = truth.collect().map(_.getLong(0)).sorted
      assert(rows.head.getLong(1) === ids.length.toLong)
      assert(rows.head.getString(2) ===
        ids.take(20).mkString(","))
    } finally out.unpersist()
  }

  test("tx19 BPE applies merges by rank over TOKENS, not raw chars") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = Files.createTempDirectory("tx19").toString
    // 'the theory': chars t h e _ t h e o r y; 't h'->'th' fires twice,
    // then 'o r'->'or' merges the (o, r) pair — and no rule touches the
    // inside of a fused 'th' token (the collision-free table property)
    Seq((0L, "the theory", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val r = TextOps.queries("tx19_bpe_encode")(spark, d).collect()(0)
    assert(r.getInt(r.fieldIndex("n_tokens")) === 7)
    assert(r.getString(r.fieldIndex("head_tokens")) === "th|e|_|th|e|or|y")
  }

  test("tx02 survives an empty document (ANSI divide-by-zero) and tx09 packs " +
    "a null-lang document (r14 review null/edge injection)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = Files.createTempDirectory("txnull").toString
    Seq(
      (0L, "some plain text here.", Some("en"), "s", 21L),
      (1L, "", Some("en"), "s", 0L), // empty: length 0 divides tx02's ratio
      (2L, "ein kleiner text", Option.empty[String], "s", 16L) // null lang
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    // tx02: under Spark 4's default ANSI mode an unguarded double/0 THROWS
    // and kills the job; the contract (and the oracle) is a NULL ratio
    val tx02 = TextOps.queries("tx02_quality")(spark, d).collect()
    assert(tx02.length === 3)
    val empty = tx02.find(_.getLong(0) == 1L).get
    assert(empty.isNullAt(empty.fieldIndex("punct_ratio")),
      s"empty doc must yield NULL punct_ratio, got $empty")
    // tx09: the null-lang doc must appear in the packing (its own
    // partition, like the oracle's PARTITION BY lang), not vanish through
    // a non-null-safe join
    val tx09 = TextOps.queries("tx09_sequence_pack")(spark, d).collect()
    assert(tx09.length === 3, s"a doc vanished from packing: ${tx09.toSeq}")
    assert(tx09.exists(r => r.getLong(0) == 2L && !r.isNullAt(3)),
      "the null-lang doc must carry a pack id")
  }

  test("tx21 BM25 matches a sequential fixed-point reference on the gate table") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = CorpusFilters.queries("tx21_bm25")(spark, TestSpark.sf0001)
      .select("doc_id", "n_terms", "score_fp").as[(Long, Long, Long)]
      .collect()
    // driver-side reference: same cleared-denominator arithmetic in BigInt
    val qTerms = Set("spark", "vector", "stream")
    val toks = graft.Tables(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      .as[(Long, Seq[String])].collect()
    val nDocs = BigInt(toks.length)
    val avgdl = toks.map(_._2.size).map(BigInt(_)).sum / nDocs
    val tf = toks.flatMap { case (id, w) =>
      w.filter(qTerms).groupBy(identity).map { case (t, xs) =>
        (id, t, BigInt(xs.length)) }
    }
    val df = tf.groupBy(_._2).map { case (t, xs) => t -> BigInt(xs.length) }
    val dl = toks.map { case (id, w) => id -> BigInt(w.size) }.toMap
    val expect = tf.groupBy(_._1).map { case (id, rows) =>
      val score = rows.map { case (_, t, f) =>
        ((nDocs * 1000000 / df(t)) * 44 * f * avgdl) /
          (20 * avgdl * f + 6 * avgdl + 18 * dl(id))
      }.sum
      (id, rows.length, score)
    }.toSeq.sortBy(r => (-r._3, r._1)).take(20)
    assert(got.length === expect.length)
    got.zip(expect).foreach { case ((gid, gn, gs), (eid, en, es)) =>
      assert(gid === eid); assert(BigInt(gn) === BigInt(en))
      assert(BigInt(gs) === es, s"doc $gid")
    }
  }
}
