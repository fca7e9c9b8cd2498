package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF example — the Spark analog of the reference's custom
  * aggregate surface (`functions/AggregateFunction.java:7-34`,
  * clear/addValue/getResult lifecycle → Aggregator's zero/reduce/merge/
  * finish). GCD is associative, commutative and exact on longs, so the
  * result is identical for any partitioning — the property every custom
  * distributed aggregate must have.
  */
object GcdAggregator extends Aggregator[Long, Long, Long] {
  @annotation.tailrec
  def gcd(a: Long, b: Long): Long = if (b == 0) math.abs(a) else gcd(b, a % b)

  override def zero: Long = 0L
  override def reduce(acc: Long, x: Long): Long = gcd(acc, x)
  override def merge(a: Long, b: Long): Long = gcd(a, b)
  override def finish(acc: Long): Long = acc
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
