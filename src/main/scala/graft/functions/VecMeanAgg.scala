package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing the element-wise MEAN of numeric vectors —
  * the reduce side of one message-passing round (`graph/Propagate`): the
  * buffer carries (element-wise double sums, count), reduce adds a vector,
  * merge adds buffers — fully decomposable, so Spark applies MAP-SIDE
  * partial aggregation and a mega-degree hub shuffles one partial vector
  * per upstream partition instead of its whole neighborhood (the UDAF
  * advantage over collect_list-then-fold, which ships every neighbor
  * vector to one reducer).
  *
  * Input is Seq[Double] — callers up-cast float features losslessly and
  * double features pass through untruncated (Propagate casts to
  * array<double>; an earlier array<float> signature silently rounded
  * stacked-round doubles back to 24-bit mantissas). Sums are doubles;
  * vectors must share one dimension per group — a mismatch fails loudly
  * rather than silently truncating. Null/empty vectors are ignored (they
  * contribute neither sum nor count); an all-null group yields null.
  * Vectors containing NULL ELEMENTS must be fenced by the caller (the
  * primitive-seq encoder rejects them at runtime — Propagate drops them
  * with a forall(isNotNull) filter).
  */
class VecMeanAgg extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(buf: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    if (v == null || v.isEmpty) buf
    else {
      val (s, n) = buf
      if (n == 0L) {
        val fresh = new Array[Double](v.length)
        var i = 0
        while (i < v.length) { fresh(i) = v(i); i += 1 }
        (fresh, 1L)
      } else {
        require(s.length == v.length,
          s"VecMeanAgg: dimension mismatch (${s.length} vs ${v.length})")
        var i = 0
        while (i < s.length) { s(i) += v(i); i += 1 }
        (s, n + 1L)
      }
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._2 == 0L) b
    else if (b._2 == 0L) a
    else {
      require(a._1.length == b._1.length,
        s"VecMeanAgg: dimension mismatch (${a._1.length} vs ${b._1.length})")
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0L) null else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]](),
      Encoders.scalaLong)
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
