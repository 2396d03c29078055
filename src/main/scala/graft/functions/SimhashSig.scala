package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 64-bit SimHash of a token array — the row-local twin of the
  * packed explode + vote-sum aggregate in `Dedup` (kept as the
  * verification probe; bit-equality spec-pinned).
  *
  * Same rationale as [[MinhashSig]]/[[WinnowFps]]: the aggregate
  * formulation pays an explode plus a 17-column hash-aggregate shuffle
  * per corpus pass; this node computes the identical hash in one loop
  * per row — token xxhash64 (seed 42, the builtin's bytes-path), per-bit
  * vote counts, majority `2·count > n`, packed into one long.
  *
  * Empty token arrays hash to 0, matching both the HOF `Dedup.simHash`
  * and the aggregate's explode_outer null-token path. Null ELEMENTS are
  * skipped (excluded from both the votes and the majority denominator),
  * matching the aggregate probe's `when(__t.isNull, 0)` handling — the
  * function is registered in the session FunctionRegistry, so a SQL
  * caller can feed it any ARRAY<STRING> shape, including
  * containsNull=true arrays from explode_outer/collect_list. */
case class SimhashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_sig expects ARRAY<STRING> tokens, got ${other.catalogString}")
  }

  override def nullSafeEval(in: Any): Any = {
    val toks = in.asInstanceOf[ArrayData]
    val total = toks.numElements()
    val cnt = new Array[Int](64)
    var n = 0L
    var i = 0
    while (i < total) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(
          t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0L) cnt(b) += 1
          b += 1
        }
        n += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (2L * cnt(b) > n) sim |= (1L << b)
      b += 1
    }
    sim
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash_sig"
}
