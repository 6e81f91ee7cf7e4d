package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact int64 dot product of two `array<bigint>` columns as a native
  * Catalyst expression with whole-stage codegen.
  *
  * Why a custom Expression (SURVEY.md §7.3 preference order b): the
  * composable alternative `aggregate(zip_with(a, b, (x,y) -> x*y), 0, +)`
  * allocates an intermediate array per row and falls back to interpreted
  * evaluation (higher-order functions don't codegen), which dominates the
  * ANN scoring loop. This fuses to one branch-free loop inside the
  * generated code — the hot path of `Similarity` stays inside
  * WholeStageCodegen. Semantics are identical: exact integer sum,
  * order-independent.
  */
case class DotProductI64(left: Expression, right: Expression)
    extends BinaryExpression {
  // checkInputDataTypes rather than ExpectsInputTypes (AbstractDataType is
  // private[sql] in Spark 4): the generated loop reads elements as LONG,
  // so a raw float embedding passed from ad-hoc SQL without quantizing
  // must be an ANALYSIS error — unchecked it surfaces as an
  // UnsupportedOperationException from the parquet dictionary reader deep
  // inside codegen (found by the r11 local-cluster checks)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.ArrayType
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires two ARRAY<BIGINT> arguments, got ${l.sql} and ${r.sql}; " +
          "quantize float embeddings first (e.g. transform(e, x -> cast(round(x * 10000) as bigint)))")
    }
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot"
  // null result for ragged/null-element inputs, not only null inputs
  override def nullable: Boolean = true

  /** Null semantics match the DuckDB oracle formulation
    * (`list_zip` pads the shorter list with NULL → NULL product → NULL
    * sum): a length mismatch or a NULL element yields NULL, never a
    * silently truncated or garbage sum. The well-formed fast path (equal
    * lengths, no nulls — every engine call site) is one extra compare plus
    * a per-element null-bit test.
    */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var i = 0
    var s = 0L
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductI64 =
    copy(left = newLeft, right = newRight)
}

/** Session registration for the engine's native SQL functions, so they are
  * callable from both the Column API (`expr("graft_dot(a, b)")`) and the
  * ad-hoc SQL surface.
  */
object GraftFunctions {
  private[functions] def lshKeysBuilder(exprs: Seq[Expression]): Expression = {
    def intArg(i: Int): Int = exprs(i).eval().asInstanceOf[Number].intValue()
    def longArg(i: Int): Long = exprs(i).eval().asInstanceOf[Number].longValue()
    LshTableKeys(exprs(0), intArg(1), intArg(2), intArg(3), intArg(4), longArg(5))
  }

  private[functions] def winnowBuilder(exprs: Seq[Expression]): Expression = {
    def intArg(i: Int): Int = exprs(i).eval().asInstanceOf[Number].intValue()
    def longArg(i: Int): Long = exprs(i).eval().asInstanceOf[Number].longValue()
    RollingWinnow(exprs(0), intArg(1), intArg(2), longArg(3), longArg(4))
  }

  private[functions] def lshSigBuilder(exprs: Seq[Expression]): Expression = {
    def intArg(i: Int): Int = exprs(i).eval().asInstanceOf[Number].intValue()
    def longArg(i: Int): Long = exprs(i).eval().asInstanceOf[Number].longValue()
    LshSignature(exprs(0), intArg(1), intArg(2), longArg(3))
  }

  private[functions] def lshFirstAgreeBuilder(exprs: Seq[Expression]): Expression = {
    def intArg(i: Int): Int = exprs(i).eval().asInstanceOf[Number].intValue()
    def longArg(i: Int): Long = exprs(i).eval().asInstanceOf[Number].longValue()
    LshFirstAgree(exprs(0), intArg(1), intArg(2), intArg(3), intArg(4), longArg(5))
  }

  // one registration per session, and none at all when the session was
  // built withExtensions(GraftExtensions) (the functions already exist):
  // createOrReplaceTempFunction logs a "replaced a previously registered
  // function" WARN on re-registration, and register() is called per
  // query-build (Similarity.quantized) — memoize like Tables.registerAll
  // so driver-parsed stdout stays clean
  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit = synchronized {
    if (registered.add(spark) &&
        !spark.sessionState.functionRegistry.functionExists(
          new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_dot", exprs => DotProductI64(exprs(0), exprs(1)), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_lsh_keys", lshKeysBuilder, "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_nfc", exprs => NfcNormalize(exprs(0)), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_might_contain", mightContainBuilder, "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_jaro_winkler", exprs => JaroWinklerSim(exprs(0), exprs(1)), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_winnow", winnowBuilder, "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_lsh_sig", lshSigBuilder, "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_lsh_first_agree", lshFirstAgreeBuilder, "built-in")
    }
  }

  /** graft_might_contain(bloomBytes, longValue): Spark's own
    * `BloomFilterMightContain` predicate (the expression behind runtime
    * row-level filtering) exposed as a callable function, so an
    * explicitly-built sketch (`df.stat.bloomFilter` over `xxhash64`
    * longs — the same putLong/mightContainLong path) can prefilter a scan
    * as a foldable literal. Codegen'd; no UDF.
    */
  private[functions] def mightContainBuilder(exprs: Seq[Expression]): Expression =
    org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))
}

/** SparkSessionExtensions wiring: sessions built with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.functions.GraftExtensions`) get the
  * engine's native functions without manual registration — the standard
  * deployment path for a Spark library on a shared cluster.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProductI64].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProductI64(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_lsh_keys"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[LshTableKeys].getName, "graft_lsh_keys"),
      GraftFunctions.lshKeysBuilder _))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_nfc"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NfcNormalize].getName, "graft_nfc"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs(0))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_might_contain"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain",
        "graft_might_contain"),
      GraftFunctions.mightContainBuilder _))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_jaro_winkler"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[JaroWinklerSim].getName, "graft_jaro_winkler"),
      (exprs: Seq[Expression]) => JaroWinklerSim(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_winnow"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[RollingWinnow].getName, "graft_winnow"),
      GraftFunctions.winnowBuilder _))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_lsh_sig"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[LshSignature].getName, "graft_lsh_sig"),
      GraftFunctions.lshSigBuilder _))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_lsh_first_agree"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[LshFirstAgree].getName, "graft_lsh_first_agree"),
      GraftFunctions.lshFirstAgreeBuilder _))
    // pure range joins (inequality-only conditions) rewrite to the
    // bucketed equi-join plan instead of a nested loop / cartesian
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // naive levenshtein-bounded joins rewrite to the q-gram-blocked
    // equi-join plan (FuzzyJoinRewrite scaladoc)
    e.injectOptimizerRule(_ => graft.plans.FuzzyJoinRewrite)
  }
}
