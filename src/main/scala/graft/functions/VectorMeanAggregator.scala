package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise mean of embedding vectors as a typed Aggregator:
  * partial (sum, count) buffers per partition, merged associatively —
  * ONE small shuffle of |cells| × dims doubles, versus the
  * posexplode formulation that multiplies the corpus row count by
  * the dimension (64×) and shuffles it twice. Accumulation is in
  * double (same as avg()); the final cast to float quantizes away
  * ULP-level summation-order differences, which is what makes the
  * downstream integer cell assignment cross-engine stable.
  */
final case class VecSumBuf(sum: Array[Double], n: Long)

class VectorMeanAggregator extends Aggregator[Seq[Float], VecSumBuf, Seq[Float]] {

  override def zero: VecSumBuf = VecSumBuf(Array.emptyDoubleArray, 0L)

  override def reduce(b: VecSumBuf, v: Seq[Float]): VecSumBuf = {
    val s = if (b.sum.length == 0) new Array[Double](v.length) else b.sum
    var i = 0
    while (i < v.length && i < s.length) { s(i) += v(i); i += 1 }
    VecSumBuf(s, b.n + 1)
  }

  override def merge(x: VecSumBuf, y: VecSumBuf): VecSumBuf =
    if (x.sum.length == 0) y
    else if (y.sum.length == 0) x
    else {
      val s = x.sum.clone()
      var i = 0
      while (i < s.length && i < y.sum.length) { s(i) += y.sum(i); i += 1 }
      VecSumBuf(s, x.n + y.n)
    }

  override def finish(b: VecSumBuf): Seq[Float] =
    if (b.n == 0) Seq.empty
    else b.sum.map(d => (d / b.n).toFloat).toSeq

  override def bufferEncoder: Encoder[VecSumBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[VecSumBuf]()
  override def outputEncoder: Encoder[Seq[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()
}
