package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native
  * `TypedImperativeAggregate` — the Catalyst surface for aggregates
  * whose state is an object, not a fixed-width row (runs as
  * ObjectHashAggregate with real partial/final merge across
  * partitions).
  *
  * The buffer holds at most `capacity` (token → lower-bound count)
  * entries; inserting a new token into a full buffer decrements every
  * counter by the evicted minimum (the classic k-counter stream
  * algorithm). Merge adds the two buffers' counters then re-trims to
  * capacity — the mergeable-summaries construction, so the guarantee
  * survives ANY partition split and merge order: every token with true
  * frequency > n/(capacity+1) is present in the final buffer. The
  * sketch's COUNTS are order-dependent lower bounds, so the operator
  * contract (see `agg_heavy_hitters`) only ever consumes the candidate
  * KEY SET and re-counts exactly — propose approximately, dispose
  * exactly, like every sketch in this engine.
  *
  * State is O(capacity) per partial aggregate regardless of input
  * size — at 100 TB each task carries a few-KB map and the final merge
  * touches #partitions × capacity entries, never the corpus.
  */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(capacity > 0, "heavy_hitters capacity must be positive")

  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  /** Misra-Gries insert with weight w (w > 1 for merges). */
  private def add(
      buf: mutable.HashMap[UTF8String, Long], k: UTF8String, w: Long): Unit = {
    buf.get(k) match {
      case Some(c) => buf.update(k, c + w)
      case None =>
        buf.update(k, w)
        if (buf.size > capacity) {
          val d = buf.valuesIterator.min
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.mapValuesInPlace((_, c) => c - d)
          buf.foreach { case (key, c) => if (c <= 0) dead += key }
          dead.foreach(buf.remove)
        }
    }
  }

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    // .copy(): the evaluated UTF8String may point into a reused row
    // buffer; the map outlives the row.
    if (v != null) add(buf, v.asInstanceOf[UTF8String].copy(), 1L)
    buf
  }

  override def merge(
      b1: mutable.HashMap[UTF8String, Long],
      b2: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (k, c) => add(b1, k, c) }
    b1
  }

  /** Candidate key set, sorted for a deterministic array rendering. */
  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any =
    new GenericArrayData(buf.keysIterator.toArray.sortBy(_.toString).toArray[Any])

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes
      out.writeInt(b.length)
      out.write(b)
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

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "heavy_hitters"
}

object HeavyHitters {

  private val ident = FunctionIdentifier("heavy_hitters")

  private[graft] def build(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"heavy_hitters expects (column, capacity literal), got ${children.length} args")
    val cap = children(1) match {
      case Literal(c: Int, _) => c
      case other => throw new IllegalArgumentException(
        s"heavy_hitters capacity must be an integer literal, got $other")
    }
    HeavyHitters(children.head, cap)
  }

  private[graft] val info =
    new ExpressionInfo(classOf[HeavyHitters].getName, "heavy_hitters")

  /** Idempotent per-session registration (same contract as
    * [[VectorExpressions.register]]: the driver may hand queries an
    * externally-built session without the extensions hook).
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(ident, info, build(_))
    }
  }

  /** Column-API entry point. */
  def sketch(spark: SparkSession, col: Column, capacity: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "heavy_hitters", col, org.apache.spark.sql.functions.lit(capacity))
  }
}
