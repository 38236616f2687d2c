package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupClustersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("connected components: chain, triangle, singleton") {
    // chain 1-2-3-4 (diameter 3 — needs >1 propagation round),
    // triangle 10-11-12, singleton 99
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 99L).toDF("id")
    val edges = Seq((2L, 3L), (1L, 2L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("a", "b")
    val got = DedupClusters.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      99L -> 99L))
  }

  test("dd06 invariants: every doc labeled, labels are component minima") {
    val out = DedupClusters.queries("dd06_dedup_clusters")(
      spark, TestSpark.sf0001)
    val rows = out.select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect()
    val nDocs = graft.Tables(spark, TestSpark.sf0001, "documents").count()
    assert(rows.length.toLong === nDocs)
    // representative id is itself a member of the cluster, and minimal
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min === cid)
      assert(members.forall(_._3 === members.length.toLong))
    }
    // the fixture corpus has planted near-dups → at least one real cluster
    assert(byCluster.exists(_._2.length > 1))
  }
}
