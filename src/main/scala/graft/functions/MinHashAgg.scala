package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.ops.Dedup

/** MinHash signature as a *distributive aggregate*: input rows are single
  * shingle hashes (one per row, e.g. from `explode`), output is the
  * `numHashes`-long signature — elementwise min of permuted hashes.
  *
  * This is the 100 TB shape of minhash: the buffer is a fixed 64-long
  * array, `update` is O(numHashes) per shingle, and `merge` is an
  * elementwise min — so Spark runs it with map-side partial aggregation
  * and the shuffle carries one small signature per group instead of every
  * shingle. (The per-document UDF in [[graft.ops.Dedup]] computes the same
  * signature when a document fits in one row; this aggregate covers
  * shingle sets too large for that, and group keys spanning many rows.)
  *
  * Permutation parameters are the same splitmix64-derived (a, b) pairs as
  * `Dedup.minhashSignature`, so both paths produce identical signatures.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  // a non-Long child is an analysis error, not a runtime ClassCastException
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_agg requires a BIGINT shingle-hash column, got ${child.dataType.catalogString}")

  // (a, b) per hash function, identical to Dedup.minhashSignature
  @transient private lazy val params: Array[(Long, Long)] =
    Array.tabulate(numHashes)(Dedup.mixParams)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var h = 0
      while (h < numHashes) {
        val (a, b) = params(h)
        val p = Dedup.permute(x, a, b)
        if (p < buf(h)) buf(h) = p
        h += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numHashes * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "minhash_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Column API: `df.groupBy(key).agg(minhashAgg($"shingle_hash"))`. */
  def minhashAgg(c: Column, numHashes: Int = 64): Column =
    graft.functions.exprColumn(
      MinHashAgg(graft.functions.columnExpr(c), numHashes)
        .toAggregateExpression())
}
