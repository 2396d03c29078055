package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints (Schleimer et al. 2003, the MOSS
  * algorithm) — the hot-loop twin of the SQL-array formulation in
  * `TextAnalysis.winnowFingerprints` (kept as the verification probe;
  * bit-equality spec-pinned).
  *
  * Why a custom expression (same rationale as [[MinhashSig]]): the SQL
  * formulation materializes the char array, the k-term rolling-hash
  * lambda, and log₂(w) sparse-table projection arrays PER ROW — each an
  * allocation the size of the document — and the winnow pass is the
  * dominant cost of every fingerprint consumer (winnow_profile,
  * containment_*, passage_overlap, decontaminate_*). This node runs the
  * identical arithmetic as one tight JVM loop per row: k-term polynomial
  * hash per gram position, then an O(n) monotonic-deque sliding-window
  * minimum, then sorted-distinct selection.
  *
  * Value contract (bit-equal to the SQL probe): gram hash at 1-based
  * position i = (Σ_j code(char i+j) · B^(k-1-j)) mod M with B=257,
  * M=1e9+7 — the sum fits a long for k ≤ 16 so one final mod matches
  * the SQL `(t1 + … + tk) % M` exactly; n < k → (0, []); 0 < n_grams <
  * w → the single global min; else the distinct minima of every
  * width-w window, sorted ascending. Char codes are UTF-16 code units
  * (≡ `ascii()` per split("") element for the BMP text the normalize
  * step produces; the fixture and the oracle are ASCII). */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 2 && k <= 16, s"need 2 <= k <= 16 (overflow-free sum): $k")
  require(w >= 1, s"need w >= 1: $w")

  private val M = 1000000007L
  private val B = 257L

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("fingerprints",
      ArrayType(LongType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow_fps expects STRING (normalized text), got ${other.catalogString}")
  }

  // pows(j) = B^(k-1-j) mod M — highest power first, same as the probe.
  private lazy val pows: Array[Long] = {
    val p = Array.fill(k)(1L)
    var j = k - 2
    while (j >= 0) { p(j) = p(j + 1) * B % M; j -= 1 }
    p
  }

  override def nullSafeEval(in: Any): Any = {
    val s = in.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n < k) return new GenericInternalRow(
      Array[Any](0L, new GenericArrayData(Array.empty[Long])))
    val nh = n - k + 1
    val hashes = new Array[Long](nh)
    var i = 0
    while (i < nh) {
      var h = 0L
      var j = 0
      while (j < k) { h += s.charAt(i + j).toLong * pows(j); j += 1 }
      hashes(i) = h % M
      i += 1
    }
    val set = new java.util.TreeSet[java.lang.Long]()
    if (nh < w) {
      var m = Long.MaxValue
      i = 0
      while (i < nh) { if (hashes(i) < m) m = hashes(i); i += 1 }
      set.add(m)
    } else {
      // monotonic deque of indices: front holds the window minimum
      val dq = new Array[Int](nh)
      var head = 0
      var tail = 0
      i = 0
      while (i < nh) {
        while (tail > head && hashes(dq(tail - 1)) >= hashes(i)) tail -= 1
        dq(tail) = i
        tail += 1
        if (dq(head) <= i - w) head += 1
        if (i >= w - 1) set.add(hashes(dq(head)))
        i += 1
      }
    }
    val arr = new Array[Long](set.size)
    var p = 0
    val it = set.iterator
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    new GenericInternalRow(
      Array[Any](nh.toLong, new GenericArrayData(arr)))
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow_fps"
}
