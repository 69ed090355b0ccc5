package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator (SURVEY.md §7 — the one genuine UDAF):
  * keeps the k highest-scoring (score, id) pairs per group in a bounded
  * min-heap buffer.
  *
  * Scale rationale: the window formulation (`row_number over (partition by
  * g order by score desc) <= k`) must shuffle and SORT every row of every
  * group; this aggregator reduces map-side to k rows per group per
  * partition (partial aggregation), so the shuffle carries ≤ k·partitions
  * rows per group and nothing is ever fully sorted. For k=10 over millions
  * of candidates per group that is the difference between a spill-heavy
  * sort and a trivial merge.
  */
object TopKAgg {

  type Entry = (Double, Long) // (score, id)

  final case class Buf(var items: List[Entry])

  /** Top-k of `extract`-ed (score, id) pairs per group, sorted descending
    * by score with ascending-id tie-break. */
  def topK[I](k: Int)(extract: I => Entry): Aggregator[I, Buf, Seq[Entry]] =
    new Aggregator[I, Buf, Seq[Entry]] {

      private def ord: Ordering[Entry] =
        Ordering.by[Entry, (Double, Long)] { case (s, id) => (-s, id) }

      private def bounded(xs: List[Entry]): List[Entry] =
        xs.sorted(ord).take(k)

      def zero: Buf = Buf(Nil)

      def reduce(b: Buf, a: I): Buf = {
        b.items = bounded(extract(a) :: b.items)
        b
      }

      def merge(b1: Buf, b2: Buf): Buf = {
        b1.items = bounded(b1.items ::: b2.items)
        b1
      }

      def finish(b: Buf): Seq[Entry] = bounded(b.items)

      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Seq[Entry]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
}
