package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MOSS winnowing (Schleimer et al., SIGMOD 2003) as ONE native pass:
  * `graft_winnow(text, k, w, base, mod)` returns the per-window k-gram
  * hash minima — `array<bigint>` of length `n_grams − w + 1` (empty when
  * the text is shorter than `k + w − 1` codepoints).
  *
  * Why a custom Expression (SURVEY.md §7.3 preference order b): the
  * composable formulation (`winnow_fingerprints`: posexplode every gram
  * position → md5 each k-char substring → min-over-window → trailing
  * filter) is semantically right but pays (a) one md5 + substring
  * allocation PER CHARACTER of corpus, and (b) a doc_id shuffle + sort
  * for the window frame — at 100 TB that is a full-corpus exchange for
  * what is per-document-local work. This expression computes the gram
  * hashes with a true O(n) rolling recurrence (each next hash from the
  * previous in O(1), no per-gram rehash) and the window minima with an
  * O(n) monotonic deque, entirely inside the row — the whole query
  * becomes scan → project → per-row array aggregates, NO shuffle, and
  * the projection stays inside WholeStageCodegen (doGenCode calls a
  * static JVM kernel, the same shape Spark's own regexp expressions use).
  *
  * Cross-engine determinism (what makes `winnow_rolling` driver-hard):
  * the gram hash is the mod-M Horner polynomial over CODEPOINTS —
  * h(c0..c4) = ((((c0·B + c1) % M)·B + c2) % M …) % M — which DuckDB
  * states per-position with `unicode(substr(t, i, 1))` arithmetic. The
  * rolling recurrence h' = ((h − c_out·B^{k−1})·B + c_in) mod M is
  * algebraically the same value, so the oracle match PROVES the O(n·k)→
  * O(n) strength reduction is value-preserving, not approximately so.
  *
  * Guarantee inherited from the paper: any shared substring of length
  * ≥ k + w − 1 between two documents contributes at least one common
  * selected fingerprint.
  */
case class RollingWinnow(child: Expression, k: Int, w: Int, base: Long, mod: Long)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k and w must be >= 1 (got k=$k, w=$w)")
  require(base > 0 && mod > 1 && mod <= Int.MaxValue.toLong * 2,
    // mod ≤ ~2^32 keeps 0x10FFFF·(mod−1) (the outgoing-codepoint product)
    // inside Long; the engine default mod is the prime 1e9+7
    s"need 0 < base and 1 < mod <= 2^32 (got base=$base, mod=$mod)")
  require(base <= Long.MaxValue / (mod + 0x110000L),
    // the kernel's largest intermediate is (mod−1)·base + maxCodepoint;
    // graft_winnow is SQL-reachable, so a user-supplied huge base must be
    // a clean error, not a silent Long overflow returning wrong hashes
    s"base * (mod + 0x110000) must fit in a signed 64-bit Long " +
      s"(got base=$base, mod=$mod; max base here is ${Long.MaxValue / (mod + 0x110000L)})")

  // analysis-time rejection of non-string children (a raw ClassCastException
  // from nullSafeEval otherwise — graft_winnow is exposed through the SQL
  // surface, so misuse must fail during analysis, not mid-task).
  // checkInputDataTypes rather than ExpectsInputTypes: AbstractDataType is
  // private[sql] in Spark 4, unusable from a third-party package
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_winnow requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    RollingWinnow.compute(input.asInstanceOf[UTF8String], k, w, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingWinnow.compute($c, $k, $w, ${base}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): RollingWinnow =
    copy(child = newChild)
}

object RollingWinnow {
  /** The kernel: codepoint array → rolling gram hashes → deque minima.
    * Called from both interpreted eval and generated code.
    */
  def compute(text: UTF8String, k: Int, w: Int, base: Long, mod: Long): ArrayData = {
    // codepoints, not UTF-16 chars: DuckDB's substr/unicode are
    // codepoint-oriented, and this is the unit the oracle hashes
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    val nGrams = n - k + 1
    val nWindows = nGrams - w + 1
    if (nWindows <= 0) return new GenericArrayData(Array.emptyLongArray)

    // B^(k-1) mod M — the weight of the outgoing codepoint
    var bk = 1L
    var j = 0
    while (j < k - 1) { bk = bk * base % mod; j += 1 }

    val grams = new Array[Long](nGrams)
    // first gram: Horner with mod at each step (the oracle's exact formula)
    var h = 0L
    j = 0
    while (j < k) { h = (h * base + cps(j)) % mod; j += 1 }
    grams(0) = h
    // rolling: drop cps(i-1), shift, admit cps(i+k-1); add mod before the
    // subtraction so the intermediate stays non-negative (% is a JVM
    // remainder, not a floor mod). Max intermediate ≈ mod·base ≈ 1.3e11
    // at the default (1e9+7, 131) — far inside Long.
    var i = 1
    while (i < nGrams) {
      h = ((h + mod - cps(i - 1) * bk % mod) % mod * base + cps(i + k - 1)) % mod
      grams(i) = h
      i += 1
    }

    // sliding-window minima via monotonic deque: indices of candidate
    // minima in increasing hash order; amortized O(1) per gram
    val out = new Array[Long](nWindows)
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    i = 0
    while (i < nGrams) {
      // evict candidates that left the window [i-w+1, i]
      while (head < tail && deque(head) <= i - w) head += 1
      // evict candidates dominated by the incoming gram (>= keeps the
      // RIGHTMOST minimal index — irrelevant to the VALUE minima emitted
      // here, but the standard winnowing tie rule, kept for when callers
      // want positions)
      while (head < tail && grams(deque(tail - 1)) >= grams(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (i >= w - 1) out(i - w + 1) = grams(deque(head))
      i += 1
    }
    new GenericArrayData(out)
  }
}
