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

  type LongEntry = (Long, Long) // (score, id)

  final case class LongBuf(var items: List[LongEntry])

  /** [[topK]] with an exact Long score — for integer-scored rankings
    * (BM25's fixed-point contract): a Double-keyed heap is exact only
    * below 2^53, but BM25 per-term contributions can reach ~1.5e15 inside
    * the documented 2^63 arithmetic bound, so a few shared terms push sums
    * past 2^53 and Double rounding could misrank near-ties against an
    * oracle's exact BIGINT ordering. Long comparisons carry the full
    * contract. Sorted descending by score, ascending-id tie-break. */
  def topKLong[I](k: Int)(extract: I => LongEntry): Aggregator[I, LongBuf, Seq[LongEntry]] =
    new Aggregator[I, LongBuf, Seq[LongEntry]] {

      // explicit comparator, not Ordering.by(-s): negation overflows at
      // Long.MinValue (-Long.MinValue == Long.MinValue), which would
      // misplace that score in a general-purpose utility
      private def ord: Ordering[LongEntry] = new Ordering[LongEntry] {
        def compare(a: LongEntry, b: LongEntry): Int = {
          val c = java.lang.Long.compare(b._1, a._1) // score descending
          if (c != 0) c else java.lang.Long.compare(a._2, b._2) // id ascending
        }
      }

      private def bounded(xs: List[LongEntry]): List[LongEntry] =
        xs.sorted(ord).take(k)

      def zero: LongBuf = LongBuf(Nil)

      def reduce(b: LongBuf, a: I): LongBuf = {
        b.items = bounded(extract(a) :: b.items)
        b
      }

      def merge(b1: LongBuf, b2: LongBuf): LongBuf = {
        b1.items = bounded(b1.items ::: b2.items)
        b1
      }

      def finish(b: LongBuf): Seq[LongEntry] = bounded(b.items)

      def bufferEncoder: Encoder[LongBuf] = Encoders.product[LongBuf]
      def outputEncoder: Encoder[Seq[LongEntry]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
}
