package graft.operators

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Near-duplicate detection at scale: MinHash+LSH and SimHash over
  * `documents` (builder brief / SURVEY §2.3). Both are approximate →
  * rows-only harness check; invariants are asserted in the test suite
  * (e.g., a doc is always a near-dup of itself if duplicated verbatim).
  *
  * Scale notes (100 TB): both pipelines avoid the O(n²) pair space.
  *  - MinHash: shingle → k minhashes (row-local, codegen'd higher-order
  *    exprs) → banded signatures → shuffle ON (band, band_hash) only —
  *    candidate pairs come from an equi-join, so cost follows bucket
  *    sizes, not n². Band/row counts (8×2 over k=16) tune the S-curve.
  *  - SimHash: 64-bit signature via per-bit majority vote (one shuffle on
  *    doc_id for the bit aggregation), then candidates via equality on any
  *    16-bit chunk (pigeonhole: hamming ≤ 3 ⇒ some chunk equal).
  */
object MinHashDedup {
  type Q = (SparkSession, String) => DataFrame

  private val K = 16      // minhash functions
  private val BANDS = 8   // bands of 2 rows each

  /** doc_id + 3-word shingles (whole text if shorter than 3 words).
    * `words` is materialized first so the per-shingle lambda slices a column
    * reference — inlining `split` into the lambda re-tokenizes the text once
    * per shingle, turning tokenization O(words) into O(words²) per doc.
    */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .select(col("doc_id"), expr(
        """transform(sequence(1, greatest(size(words) - 2, 1)),
          | i -> concat_ws(' ', slice(words, i, 3)))""".stripMargin)
        .as("shingles"))

  /** Adds the minhash signature array `mhs` + per-band mh columns. The
    * signature comes from the one-pass [[graft.functions.MinHashArray]]
    * codegen kernel — K separate `array_min(transform(...))` expressions
    * re-traverse the shingle array K times through interpreted lambdas.
    */
  private def minhashed(df: DataFrame): DataFrame = {
    val withSig = df.withColumn("mhs",
      graft.functions.MinHashArray(col("shingles"), K))
    (0 until K).foldLeft(withSig) { (d, k) =>
      d.withColumn(s"mh$k", element_at(col("mhs"), k + 1))
    }
  }

  val queries: Map[String, Q] = ListMap(
    // MinHash + LSH banding: candidate pairs + estimated Jaccard.
    "dd02_minhash_lsh" -> ((s, dir) => {
      val mh = minhashed(shingled(s, dir))
      // Materialize signatures before the self-join: both join branches
      // would otherwise recompute the whole shingle→minhash pipeline. At
      // lake scale this step is a signature table written to storage.
      val bands = mh.select(col("doc_id"), col("mhs"), explode(array(
        (0 until BANDS).map(j => struct(lit(j).as("band"),
          xxhash64(col(s"mh${2 * j}"), col(s"mh${2 * j + 1}")).as("bh"))): _*))
        .as("b"))
        .select(col("doc_id"), col("mhs"), col("b.band"), col("b.bh"))
        .persist()
      val a = bands.select(col("doc_id").as("id1"), col("mhs").as("mh1"),
        col("band"), col("bh"))
      val b = bands.select(col("doc_id").as("id2"), col("mhs").as("mh2"),
        col("band"), col("bh"))
      a.join(b, Seq("band", "bh")).filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          round(expr(
            s"size(filter(zip_with(mh1, mh2, (x, y) -> x = y), v -> v)) / ${K}D"),
            4).as("est_jaccard"))
        .distinct()
        .orderBy(desc("est_jaccard"), asc("id1"), asc("id2"))
    }),

    // SimHash: 64-bit signature, candidates by 16-bit chunk equality.
    "dd03_simhash" -> ((s, dir) => {
      val tok = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .select(col("doc_id"), xxhash64(col("w")).as("h"))
      val bitAggs = (0 until 64).map(bit =>
        sum(when(shiftright(col("h"), bit).bitwiseAND(1) === 1, 1).otherwise(-1))
          .as(s"b$bit"))
      val sums = tok.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
      val sig = (0 until 64)
        .map(bit => when(col(s"b$bit") > 0, lit(1L << bit)).otherwise(0L))
        .reduce((x, y) => x.bitwiseOR(y))
      val sigs = sums.select(col("doc_id"), sig.as("sig"))
      // materialized for the same reason as the minhash band table
      val chunks = sigs.select(col("doc_id"), col("sig"), explode(array(
        (0 until 4).map(i => struct(lit(i).as("chunk"),
          shiftright(col("sig"), 16 * i).bitwiseAND(0xFFFFL).as("cv"))): _*))
        .as("c"))
        .select(col("doc_id"), col("sig"), col("c.chunk"), col("c.cv"))
        .persist()
      val a = chunks.select(col("doc_id").as("id1"), col("sig").as("sig1"),
        col("chunk"), col("cv"))
      val b = chunks.select(col("doc_id").as("id2"), col("sig").as("sig2"),
        col("chunk"), col("cv"))
      a.join(b, Seq("chunk", "cv")).filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          expr("bit_count(sig1 ^ sig2)").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 24)
        .orderBy(asc("hamming"), asc("id1"), asc("id2"))
        .limit(200)
    }),
  )

  /** Approximate candidate generation — no SQL oracle (rows-only check). */
  val oracle: Map[String, String] = ListMap.empty
}
