package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property tests for the batch-construction operators over
  * ScalaCheck-generated corpora (fixed seeds — deterministic):
  * [[Packing.concatChunkIndex]]'s spans must exactly partition each
  * shard's token stream, and its chunk arithmetic must agree with a
  * straight sequential re-computation; [[Packing.packByBudget]] packs
  * must be contiguous in order and overflow only by their final
  * document. */
class PackingPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private type Doc = (String, Long, Long) // (shard, id, weight)
  private val genDoc: Gen[Doc] = for {
    shard <- Gen.oneOf("a", "b", "c")
    id <- Gen.choose(1L, 500L)
    w <- Gen.frequency(8 -> Gen.choose(1L, 40L), 1 -> Gen.const(0L),
      1 -> Gen.choose(100L, 300L)) // mostly small, some zero, some oversize
  } yield (shard, id, w)
  private val genCorpus: Gen[List[Doc]] =
    Gen.listOfN(60, genDoc).map(_.distinctBy(d => (d._1, d._2)))

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("concatChunkIndex spans exactly partition every shard's stream") {
    (1L to 8L).foreach { seed =>
      val corpus = sample(genCorpus, seed)
      val df = corpus.toDF("shard", "doc_id", "tok")
      val rows = Packing.concatChunkIndex(df, "doc_id", "tok", Seq("shard"), 16L)
        .select("shard", "doc_id", "tok", "start_off", "end_off",
          "first_chunk", "last_chunk", "n_chunks")
        .collect()
      rows.groupBy(_.getString(0)).foreach { case (shard, rs) =>
        val inOrder = rs.sortBy(_.getLong(1))
        // sequential re-computation
        var cum = 0L
        inOrder.foreach { r =>
          val w = r.getLong(2)
          assert(r.getLong(3) == cum, s"shard $shard: start_off mismatch")
          assert(r.getLong(4) == cum + w, s"shard $shard: end_off mismatch")
          if (w > 0) {
            assert(r.getLong(5) == cum / 16, "first_chunk")
            assert(r.getLong(6) == (cum + w - 1) / 16, "last_chunk")
            assert(r.getLong(7) == (cum + w - 1) / 16 - cum / 16 + 1, "n_chunks")
          } else {
            assert(r.isNullAt(5) && r.isNullAt(6) && r.getLong(7) == 0L,
              "zero-weight doc must have no chunks")
          }
          cum += w
        }
        // spans partition [0, total): adjacency is implied by start == cum
        assert(inOrder.last.getLong(4) == cum)
      }
      assert(rows.nonEmpty)
    }
  }

  test("packByBudget packs are contiguous and overflow only by their last doc") {
    (11L to 16L).foreach { seed =>
      val corpus = sample(genCorpus, seed)
      val df = corpus.toDF("shard", "doc_id", "tok")
      val budget = 32L
      val rows = Packing.packByBudget(df, "doc_id", "tok", Seq("shard"), budget)
        .select("shard", "doc_id", "tok", "pack_id")
        .collect()
      rows.groupBy(_.getString(0)).foreach { case (shard, rs) =>
        val inOrder = rs.sortBy(_.getLong(1))
        // pack ids are non-decreasing in document order (contiguity)
        val packSeq = inOrder.map(_.getLong(3)).toSeq
        assert(packSeq == packSeq.sorted, s"shard $shard: packs not contiguous")
        // each doc's pack equals exclusive-prefix-sum div budget
        var cum = 0L
        inOrder.foreach { r =>
          assert(r.getLong(3) == cum / budget,
            s"shard $shard doc ${r.getLong(1)}: pack id mismatch")
          cum += r.getLong(2)
        }
      }
    }
  }
}
