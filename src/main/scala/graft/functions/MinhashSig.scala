package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native row-local OPH minhash signature over a token array — the
  * streaming-safe twin of `Dedup.minhashSigs` (whose explode + groupBy
  * shape cannot run inside a streaming scan stage without becoming a
  * stateful operator).
  *
  * Why a custom expression (same rationale as [[DotProduct]]): the HOF
  * formulation (`aggregate` fold over shingle hashes, `zip_with` slot
  * update per element) interprets its lambdas per element×slot —
  * measured 150 s for a 5k-doc batch at sf0.1, ~50× the whole pipeline.
  * This node runs the identical arithmetic as ONE tight JVM loop per
  * row: shingle → xxhash64 → 4 region rehashes → slot min, then
  * global-min densification.
  *
  * Value contract (pinned by StreamingCurationSpec against the batch
  * aggregate): slot `r·(k/m) + (xxhash64(h, r) mod k/m)` holds the min
  * region rehash over the doc's shingles, empty slots densify to the
  * global min; shingle hash = `xxhash64(concat_ws(" ", slice(toks, i,
  * n)))` with Spark's seed-42 chaining, docs shorter than n tokens
  * contribute one whole-text shingle. */
case class MinhashSig(child: Expression, shingleSize: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  private val Regions = 4
  require(shingleSize >= 1, s"shingleSize must be >= 1: $shingleSize")
  require(numHashes >= Regions && numHashes % Regions == 0,
    s"numHashes must be a positive multiple of $Regions: $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig expects ARRAY<STRING> tokens, got ${other.catalogString}")
  }

  override def nullSafeEval(in: Any): Any = {
    val toks = in.asInstanceOf[ArrayData]
    val len = toks.numElements()
    val nSh = math.max(len - shingleSize + 1, 1)
    val per = numHashes / Regions
    val acc = new Array[Long](numHashes)
    val filled = new Array[Boolean](numHashes)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < nSh) {
      val end = math.min(i + shingleSize, len)
      val parts = new Array[UTF8String](end - i)
      var j = i
      while (j < end) { parts(j - i) = toks.getUTF8String(j); j += 1 }
      val sh = UTF8String.concatWs(sep, parts: _*)
      // xxhash64(string): seed-42 hash of the UTF8 bytes — byte-for-byte
      // the InterpretedHashFunction path of the builtin.
      val h = XXH64.hashUnsafeBytes(
        sh.getBaseObject, sh.getBaseOffset, sh.numBytes, 42L)
      var r = 0
      while (r < Regions) {
        // xxhash64(h, r) chains: seed 42 → hashLong(h) → hashInt(r).
        val hr = XXH64.hashInt(r, XXH64.hashLong(h, 42L))
        val slot = r * per + (((hr % per) + per) % per).toInt
        if (!filled(slot) || hr < acc(slot)) { acc(slot) = hr; filled(slot) = true }
        r += 1
      }
      i += 1
    }
    // Densify empty slots with the global min — every rehash lands in
    // exactly one slot of its region, so the min over filled slots IS
    // the min over all rehashes.
    var g = Long.MaxValue
    var s = 0
    while (s < numHashes) {
      if (filled(s) && acc(s) < g) g = acc(s)
      s += 1
    }
    s = 0
    while (s < numHashes) {
      if (!filled(s)) acc(s) = g
      s += 1
    }
    new GenericArrayData(acc)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}
