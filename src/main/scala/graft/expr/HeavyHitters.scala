package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy hitters: the k-counter frequent-elements summary
  * (Misra & Gries 1982), with the MERGEABLE combine of Agarwal et al.,
  * "Mergeable Summaries" (PODS 2012) — so it runs as an ordinary partial
  * aggregate: every partition folds its rows into an O(k) counter map, the
  * exchange carries k (token, count) pairs per group per partition, and
  * merges preserve the error bound additively.
  *
  * Guarantees (n = group row count): every item with true frequency
  * > n/(k+1) is present in the output, and each reported count is a LOWER
  * bound within n/(k+1) of the true frequency. The counts themselves
  * depend on arrival order/partitioning (like any MG summary), so this can
  * never hash-match a serial oracle — verification is the two guarantees,
  * spec'd against exact counts in ScalaTest.
  *
  * This is the at-scale "what are the top tokens" answer the exact
  * pl_vocab aggregation gives for a vocabulary that FITS — here memory is
  * O(k) per group regardless of vocabulary size.
  *
  * Buffer ops: update is O(1) amortized by a count-mass argument: each
  * update adds at most 1 to the total stored count, and each O(k)
  * decrement-all pass subtracts exactly k from it, so over n updates the
  * decrement passes do O(n) total work (a pass need not free a slot when
  * every counter is ≥2 — the bound comes from the mass it burns, not from
  * evictions). Merge is O(k log k) for the (k+1)-th-largest reduction.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string child, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val t = v.asInstanceOf[UTF8String]
    buf.get(t) match {
      case Some(c) => buf.update(t, c + 1)
      case None if buf.size < k =>
        // clone: eval's UTF8String may point into a reused row buffer
        buf.update(t.clone(), 1L)
      case None =>
        // full and unseen: decrement every counter, drop zeros (the
        // classic MG step — the incoming item is absorbed as error)
        val dead = buf.iterator.filter(_._2 == 1L).map(_._1).toArray
        buf.mapValuesInPlace((_, c) => c - 1)
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(a: mutable.HashMap[UTF8String, Long],
                     b: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > k) {
      // reduce back to k: subtract the (k+1)-th largest count from all
      // (Agarwal et al. §3 — error bounds add across merges)
      val counts = a.values.toArray.sorted(Ordering[Long].reverse)
      val m = counts(k)
      val dead = a.iterator.filter(_._2 <= m).map(_._1).toArray
      a.mapValuesInPlace((_, c) => c - m)
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    // deterministic OUTPUT order for a given summary: count desc, token asc
    val rows = buf.toArray.sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) => InternalRow(t, c) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val bytes = t.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}
