package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("per-group top-k with score desc, id asc tie-break") {
    val ds = Seq(
      ("a", 1.0, 1L), ("a", 3.0, 2L), ("a", 2.0, 3L), ("a", 3.0, 4L),
      ("b", 5.0, 9L)
    ).toDS()
    val out = ds.groupByKey(_._1)
      .agg(TopKAgg.topK[(String, Double, Long)](2)(t => (t._2, t._3))
        .toColumn.name("top"))
      .collect().toMap
    assert(out("a") == Seq((3.0, 2L), (3.0, 4L))) // ties broken by id asc
    assert(out("b") == Seq((5.0, 9L)))
  }

  test("topKLong ranks exactly past 2^53 where a Double heap would tie") {
    // two scores that collide when rounded to Double (same 2^53-scale
    // neighborhood, differ by 1): the Long heap must order them exactly
    val big = (1L << 60) + 4096L
    val ds = Seq(("g", big, 1L), ("g", big + 1L, 2L), ("g", big - 1L, 3L)).toDS()
    assert(big.toDouble == (big + 1L).toDouble) // the Double heap CAN'T see this gap
    val out = ds.groupByKey(_._1)
      .agg(TopKAgg.topKLong[(String, Long, Long)](2)(t => (t._2, t._3))
        .toColumn.name("top"))
      .collect().toMap
    assert(out("g") == Seq((big + 1L, 2L), (big, 1L)))
  }

  test("topKLong orders Long.MinValue correctly (no negation overflow)") {
    // -Long.MinValue == Long.MinValue, so a (-s, id) tuple ordering would
    // sort MinValue as the LARGEST score; the explicit comparator must
    // rank it strictly last
    val ds = Seq(
      ("g", Long.MinValue, 1L), ("g", 0L, 2L),
      ("g", Long.MaxValue, 3L), ("g", -1L, 4L)
    ).toDS()
    val out = ds.groupByKey(_._1)
      .agg(TopKAgg.topKLong[(String, Long, Long)](4)(t => (t._2, t._3))
        .toColumn.name("top"))
      .collect().toMap
    assert(out("g") ==
      Seq((Long.MaxValue, 3L), (0L, 2L), (-1L, 4L), (Long.MinValue, 1L)))
  }

  test("agrees with the window row_number formulation on real embeddings") {
    val knn = Similarity.knnJoin(
      graft.Tables.embeddings(spark, "/root/testdata/sf0.001"),
      graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
        .filter($"vec_id" % 200 === 0),
      "vec_id", "embedding", k = 3)
    val windowed = knn.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"), r.getAs[Long]("vec_id")))
      .toSet

    val scored = Similarity.knnJoin(
      graft.Tables.embeddings(spark, "/root/testdata/sf0.001"),
      graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
        .filter($"vec_id" % 200 === 0),
      "vec_id", "embedding", k = Int.MaxValue) // unfiltered scores
      .select($"qid", $"cos_r", $"vec_id").as[(Long, Double, Long)]
    val agged = scored.groupByKey(_._1)
      .agg(TopKAgg.topK[(Long, Double, Long)](3)(t => (t._2, t._3))
        .toColumn.name("top"))
      .collect()
      .flatMap { case (qid, top) =>
        top.zipWithIndex.map { case ((_, id), i) => (qid, (i + 1).toLong, id) } }
      .toSet
    assert(agged == windowed)
  }
}
