package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregation for vector columns (SURVEY.md §2.11 gap: the
  * reference has no custom aggregate; a centroid is the canonical one a
  * vector pipeline needs — e.g. as IVF coarse centroids).
  *
  * Implemented as an `Aggregator` (partial + merge), so Spark executes
  * it as a map-side-combined hash aggregate: each partition reduces its
  * rows into one (sum, count) buffer and only buffers shuffle — at
  * 1000 executors the network moves `dim` doubles per partition, not
  * per row.
  */
object VectorAggregators {

  /** (element-wise sum, count) buffer; sums sized lazily on first row. */
  type CentroidBuf = (Array[Double], Long)

  private object CentroidAggregator
      extends Aggregator[Seq[Float], CentroidBuf, Seq[Double]] {
    override def zero: CentroidBuf = (Array.emptyDoubleArray, 0L)

    override def reduce(b: CentroidBuf, v: Seq[Float]): CentroidBuf = {
      if (v == null) b
      else {
        val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
        var i = 0
        while (i < v.length && i < sums.length) {
          sums(i) += v(i); i += 1
        }
        (sums, b._2 + 1)
      }
    }

    override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
      if (a._1.isEmpty) b
      else if (b._1.isEmpty) a
      else {
        // Accumulate into the longer buffer so ragged inputs never
        // overrun, mirroring reduce's min-length guard.
        val (big, small) = if (a._1.length >= b._1.length) (a, b) else (b, a)
        var i = 0
        while (i < small._1.length) { big._1(i) += small._1(i); i += 1 }
        (big._1, a._2 + b._2)
      }
    }

    override def finish(b: CentroidBuf): Seq[Double] =
      if (b._2 == 0) Seq.empty
      else b._1.map(_ / b._2).toSeq

    // ExpressionEncoder stores the sums as an unsafe primitive double
    // array — far smaller shuffle buffers than java serialization.
    override def bufferEncoder: Encoder[CentroidBuf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Element-wise mean of an `array<float>` column as `array<double>`. */
  def centroid(embedding: Column): Column =
    udaf(CentroidAggregator).apply(embedding)
}
