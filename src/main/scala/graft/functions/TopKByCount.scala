package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing the top-k values by occurrence count
  * within a group — the engine's surface for custom UDAFs (SURVEY §2.7),
  * shaped like the reference's bounded in-map combiner
  * (`AggregatingHashCounter.h:15-130`: bounded hash state, partial
  * flushes) but with Spark managing the partial/merge lifecycle.
  *
  * State is a bounded count map: above `maxState` entries the rarest
  * entries flush (the reference flushes its lowest-count half the same
  * way), which keeps executor memory constant on adversarial cardinality.
  * Results are deterministic: ties break on the value itself.
  */
class TopKByCount(k: Int, maxState: Int = 4096)
    extends Aggregator[String, mutable.Map[String, Long], Seq[String]] {

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  private def shrink(b: mutable.Map[String, Long]): mutable.Map[String, Long] =
    if (b.size <= maxState) b
    else {
      // keep the maxState/2 most frequent (ties by value) — same policy
      // as the reference's lowest-half flush
      val keep = b.toSeq.sortBy { case (v, n) => (-n, v) }.take(maxState / 2)
      mutable.Map(keep: _*)
    }

  override def reduce(b: mutable.Map[String, Long], a: String): mutable.Map[String, Long] = {
    b.update(a, b.getOrElse(a, 0L) + 1L)
    shrink(b)
  }

  override def merge(x: mutable.Map[String, Long], y: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    for ((v, n) <- y) x.update(v, x.getOrElse(v, 0L) + n)
    shrink(x)
  }

  override def finish(b: mutable.Map[String, Long]): Seq[String] =
    b.toSeq.sortBy { case (v, n) => (-n, v) }.take(k).map(_._1)

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

object TopKByCount {
  /** Typed-column form usable in `KeyValueGroupedDataset.agg(...)`. */
  def topK(k: Int, maxState: Int = 4096): TypedColumn[String, Seq[String]] =
    new TopKByCount(k, maxState).toColumn
}
