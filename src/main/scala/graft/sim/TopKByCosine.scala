package graft.sim

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY §2.11): bounded top-k by fixed-point cosine.
  *
  * Versus a window `row_number() <= k` the aggregator never sorts the
  * full candidate set — each partition keeps a k-bounded buffer and
  * merges are k+k → k, so the per-query cost is O(n log k) map-side
  * with only k rows crossing the shuffle per (query, partition). That
  * is the 100 TB-friendly shape for ANN re-ranking.
  *
  * Ordering is total and deterministic: descending cos_e6, ascending
  * neighbor id as tiebreak — identical to the window formulation.
  */
case class ScoredNeighbor(neighborId: Long, cosE6: Long)

class TopKByCosine(k: Int)
    extends Aggregator[ScoredNeighbor, List[ScoredNeighbor], Seq[ScoredNeighbor]] {

  private def better(a: ScoredNeighbor, b: ScoredNeighbor): Boolean =
    a.cosE6 > b.cosE6 || (a.cosE6 == b.cosE6 && a.neighborId < b.neighborId)

  private def insert(buf: List[ScoredNeighbor], x: ScoredNeighbor): List[ScoredNeighbor] = {
    val (pre, post) = buf.span(better(_, x))
    (pre ::: x :: post).take(k)
  }

  override def zero: List[ScoredNeighbor] = Nil

  override def reduce(buf: List[ScoredNeighbor], x: ScoredNeighbor): List[ScoredNeighbor] =
    if (buf.length == k && better(buf.last, x)) buf else insert(buf, x)

  override def merge(a: List[ScoredNeighbor], b: List[ScoredNeighbor]): List[ScoredNeighbor] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[ScoredNeighbor]): Seq[ScoredNeighbor] = buf

  override def bufferEncoder: Encoder[List[ScoredNeighbor]] =
    Encoders.kryo[List[ScoredNeighbor]]

  override def outputEncoder: Encoder[Seq[ScoredNeighbor]] =
    Encoders.kryo[Seq[ScoredNeighbor]]
}
