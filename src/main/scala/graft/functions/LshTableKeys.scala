package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All sign-LSH hash-table keys of one quantized vector in a single fused
  * pass: `sigBits` seeded ±1-hyperplane sign bits, then `tables` keys of
  * `bandBits` sampled bits each — `array<bigint>` out, one element per
  * table (key = table·2^bandBits + bucket).
  *
  * Why a custom Expression (SURVEY.md §7.3 preference order b): the
  * composable formulation is `sigBits` separate graft_dot calls against
  * literal arrays plus `tables`·`bandBits` shift/mask column expressions —
  * measured to bloat the generated class enough that Janino compilation
  * dominated the whole query (~10 s at sf0.1). This expression does the
  * identical arithmetic in one compiled Scala loop; codegen delegates to
  * it via a bound reference (the `invoke` pattern), so the surrounding
  * stage stays in whole-stage codegen.
  *
  * Plane/bit derivation is EXACTLY the sequence the composed version drew
  * from `scala.util.Random(seed)` — same seed → same hyperplanes → same
  * buckets, so the recall measurements carry over.
  */
case class LshTableKeys(
    child: Expression,
    dims: Int,
    sigBits: Int,
    tables: Int,
    bandBits: Int,
    seed: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_keys"

  @transient private lazy val (planes: Array[Array[Long]], tableBits: Array[Array[Int]]) = {
    val rnd = new scala.util.Random(seed)
    val p = Array.fill(sigBits)(Array.fill(dims)(if (rnd.nextBoolean()) 1L else -1L))
    val tb = Array.fill(tables)(rnd.shuffle((0 until sigBits).toList).take(bandBits).toArray)
    (p, tb)
  }

  /** one fused pass; public so generated code can call it */
  def computeKeys(q: ArrayData): ArrayData = {
    val n = math.min(q.numElements(), dims)
    val sig = new Array[Boolean](sigBits)
    var j = 0
    while (j < sigBits) {
      val w = planes(j)
      var s = 0L
      var i = 0
      while (i < n) { s += q.getLong(i) * w(i); i += 1 }
      sig(j) = s > 0
      j += 1
    }
    val keys = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      val idxs = tableBits(t)
      var b = 0L
      var k = 0
      while (k < idxs.length) { if (sig(idxs(k))) b |= (1L << k); k += 1 }
      keys(t) = t.toLong * (1L << bandBits) + b
      t += 1
    }
    new GenericArrayData(keys)
  }

  override def nullSafeEval(input: Any): Any =
    computeKeys(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, q => {
      val ref = ctx.addReferenceObj("lshKeys", this, classOf[LshTableKeys].getName)
      s"${ev.value} = $ref.computeKeys($q);"
    })

  override protected def withNewChildInternal(newChild: Expression): LshTableKeys =
    copy(child = newChild)
}
