package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAFs (the `Aggregator[IN, BUF, OUT]` slot SURVEY.md §2.10
  * reserves). `sort_array(collect_list(...))` covers the ordered-collect
  * need in SQL-oracle queries; these typed forms serve Dataset pipelines
  * where an encoder-checked aggregation reads better than Column wrangling.
  */
object Aggregators {

  /** Ordered collect: gathers values and returns them sorted — the
    * deterministic counterpart of collect_list (whose order is partition-
    * scheduling-dependent). Merge is append + single sort at finish. */
  def sortedList: Aggregator[String, mutable.ArrayBuffer[String], Seq[String]] =
    new Aggregator[String, mutable.ArrayBuffer[String], Seq[String]] {
      def zero: mutable.ArrayBuffer[String] = mutable.ArrayBuffer.empty
      def reduce(b: mutable.ArrayBuffer[String], a: String): mutable.ArrayBuffer[String] = {
        if (a != null) b += a; b
      }
      def merge(x: mutable.ArrayBuffer[String], y: mutable.ArrayBuffer[String]) = x ++= y
      def finish(b: mutable.ArrayBuffer[String]): Seq[String] = b.sorted.toSeq
      def bufferEncoder: Encoder[mutable.ArrayBuffer[String]] =
        Encoders.kryo[mutable.ArrayBuffer[String]]
      def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
    }

  /** Exact top-k by score with a bounded per-partition heap — the typed
    * form of the top-k pattern: the buffer never exceeds k entries, so
    * partial aggregation ships k rows per partition, not the group. */
  def topKByScore(k: Int): Aggregator[(String, Long), mutable.ArrayBuffer[(String, Long)], Seq[String]] =
    new Aggregator[(String, Long), mutable.ArrayBuffer[(String, Long)], Seq[String]] {
      private def trim(b: mutable.ArrayBuffer[(String, Long)]) = {
        val s = b.sortBy { case (id, score) => (-score, id) }
        s.take(k)
      }
      def zero = mutable.ArrayBuffer.empty
      def reduce(b: mutable.ArrayBuffer[(String, Long)], a: (String, Long)) = {
        b += a
        if (b.length > 2 * k) trim(b).to(mutable.ArrayBuffer) else b
      }
      def merge(x: mutable.ArrayBuffer[(String, Long)], y: mutable.ArrayBuffer[(String, Long)]) =
        trim(x ++= y).to(mutable.ArrayBuffer)
      def finish(b: mutable.ArrayBuffer[(String, Long)]): Seq[String] =
        trim(b).map(_._1).toSeq
      def bufferEncoder = Encoders.kryo[mutable.ArrayBuffer[(String, Long)]]
      def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
    }
}
