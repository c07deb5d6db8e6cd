package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, UnaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the KPL `AggregatedRecord` wire walk.
  *
  * Input: one validated frame BODY (the hex-text protobuf carrier —
  * structural bytes as 2 hex chars, length-delimited payloads raw; see
  * ScaleOps `scan_kpl_deaggregate`). Output: the frame's messages as
  * `array<struct<msg: string, pk: string>>`, each record's
  * `partition_key_index` already resolved through the frame's
  * deduplicated `partition_key_table` (null when an index points past
  * the table — a producer bug surfaced as data, never a throw).
  *
  * Why an Expression and not the higher-order-function spelling it
  * replaced: the tag/varint walk is ~12–17 chained varint reads per
  * frame plus per-record slicing, and every probe in the HOF spelling
  * (`aggregate` fold + `filter`/`transform` lambdas over the offset
  * table) is an interpreted expression tree re-evaluated per element —
  * measured 4.2 s at sf0.1 for the walk alone, ~1 ms per 10-message
  * frame. This expression performs the identical walk as one imperative
  * JVM pass per frame (microseconds). Interpreted-mode only
  * (CodegenFallback): the output is an array of structs, where
  * generated-code construction buys nothing — the per-frame method call
  * IS the fast path, and the surrounding explode/from_json pipeline
  * keeps its own codegen.
  *
  * Wire layout walked (all varints LEB128 over BINARY byte counts,
  * carried as hex text — 2 chars per structural byte, payloads at
  * 1 char/byte): repeated `0x0A ‖ varint(len) ‖ key` partition-key
  * entries, then per message `0x1A ‖ varint(reclen) ‖ [0x08 ‖
  * varint(pk_index)] ‖ [0x1A ‖ varint(datalen) ‖ data]`. A structurally
  * inconsistent frame (offsets running past the end — unreachable
  * behind the md5 gate) stops the walk and yields the messages decoded
  * so far, mirroring the HOF fold's stop-at-end behavior.
  */
case class KplDeagg(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("msg", StringType), StructField("pk", StringType))))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"kpl_deagg expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val body = input.asInstanceOf[UTF8String].toString
    val n = body.length
    def hexByte(o: Int): Int = {
      // Character.digit handles both cases; staging emits uppercase
      val hi = Character.digit(body.charAt(o), 16)
      val lo = Character.digit(body.charAt(o + 1), 16)
      if (hi < 0 || lo < 0) -1 else (hi << 4) | lo
    }
    val pks = scala.collection.mutable.ArrayBuffer.empty[String]
    val recs = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    var o = 0
    var ok = true
    while (ok && o + 4 <= n) {
      val tag = hexByte(o)
      // LEB128 varint at o+2 (1 or 2 bytes — the staging envelope)
      val b0 = hexByte(o + 2)
      if (b0 < 0) ok = false
      else {
        val twoByte = b0 >= 128
        if (twoByte && o + 6 > n) ok = false
        else {
          val len = if (twoByte) (b0 - 128) + 128 * hexByte(o + 4) else b0
          val w = if (twoByte) 2 else 1
          val payload = o + 2 + 2 * w
          // a non-hex char in the varint's second byte yields a NEGATIVE
          // len that would slip past the end-bound guard and throw from
          // substring — mirror the record path's jlen < 0 stop
          if (len < 0) ok = false
          else if (tag == 0x0A) {
            if (payload + len > n) ok = false
            else { pks += body.substring(payload, payload + len); o = payload + len }
          } else if (tag == 0x1A) {
            // record payload: 0x08 ‖ varint(idx) ‖ 0x1A ‖ varint(jlen) ‖ data
            if (payload + 6 > n) ok = false
            else {
              val i0 = hexByte(payload + 2)
              val iTwo = i0 >= 128
              val idx = if (iTwo) (i0 - 128) + 128 * hexByte(payload + 4) else i0
              val jloc = payload + 4 + (if (iTwo) 4 else 2)
              if (jloc + 2 > n) ok = false
              else {
                val j0 = hexByte(jloc)
                val jTwo = j0 >= 128
                // a two-byte jlen needs its SECOND byte in bounds before
                // hexByte reads charAt(jloc+3) — stop, don't overrun
                if (jTwo && jloc + 4 > n) ok = false
                else {
                  val jlen = if (jTwo) (j0 - 128) + 128 * hexByte(jloc + 2) else j0
                  val ms = jloc + (if (jTwo) 4 else 2)
                  if (jlen < 0 || ms + jlen > n) ok = false
                  else { recs += ((body.substring(ms, ms + jlen), idx)); o = ms + jlen }
                }
              }
            }
          } else ok = false
        }
      }
    }
    new GenericArrayData(recs.map { case (m, i) =>
      InternalRow(UTF8String.fromString(m),
        if (i >= 0 && i < pks.length) UTF8String.fromString(pks(i)) else null)
    }.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): KplDeagg =
    copy(child = newChild)
}

object KplExpressions {

  private val ident = FunctionIdentifier("kpl_deagg")

  /** Idempotent registration (the driver contract hands query functions
    * an arbitrary session — same rationale as `dot_f`).
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[KplDeagg].getName, "kpl_deagg"),
        (children: Seq[Expression]) => {
          require(children.length == 1,
            s"kpl_deagg expects exactly 1 argument, got ${children.length}")
          KplDeagg(children.head)
        })
    }
  }

  /** Column-API entry point. */
  def kplDeagg(spark: SparkSession, body: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("kpl_deagg", body)
  }
}
