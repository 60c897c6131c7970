package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** [[TopKAggregator]]'s string-payload sibling: the k highest-count
  * (count, term) pairs per group in O(k) memory, partial-aggregating
  * map-side. Built for corpus vocabulary queries (top terms per
  * language) where the per-group candidate set — distinct terms — is
  * itself huge at scale, so a window row_number over it would sort
  * billions of rows per group; the heap shuffles O(partitions × k).
  *
  * Order: higher count wins; equal counts prefer the lexicographically
  * SMALLER term (same tie-break as `ORDER BY count DESC, term ASC`).
  */
case class ScoredTerm(score: Long, term: String)

class TopKTermAggregator(k: Int)
  extends Aggregator[ScoredTerm, List[ScoredTerm], Seq[ScoredTerm]] {

  // "greater" = better: high score first, then REVERSED string order so
  // the lexicographically smaller term ranks higher on count ties
  private val ord: Ordering[ScoredTerm] =
    Ordering.by[ScoredTerm, (Long, String)](s => (s.score, s.term))(
      Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))

  override def zero: List[ScoredTerm] = Nil

  /** Insert keeping the buffer sorted ascending (head = weakest), max k. */
  override def reduce(buf: List[ScoredTerm], a: ScoredTerm): List[ScoredTerm] =
    if (buf.size < k) (a :: buf).sorted(ord)
    else if (ord.gt(a, buf.head)) (a :: buf.tail).sorted(ord)
    else buf

  override def merge(b1: List[ScoredTerm], b2: List[ScoredTerm]): List[ScoredTerm] =
    (b1 ++ b2).sorted(ord).takeRight(k)

  /** Final: best first. */
  override def finish(buf: List[ScoredTerm]): Seq[ScoredTerm] =
    buf.sorted(ord.reverse)

  override def bufferEncoder: Encoder[List[ScoredTerm]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[ScoredTerm]]()
  override def outputEncoder: Encoder[Seq[ScoredTerm]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredTerm]]()
}
