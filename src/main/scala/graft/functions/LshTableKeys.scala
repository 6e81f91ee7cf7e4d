package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** THE single derivation of the sign-LSH scheme: `sigBits` seeded ±1
  * hyperplanes, then per-table bit subsets, drawn from ONE
  * `scala.util.Random(seed)` stream in this exact order. Every
  * expression that participates in the scheme (keys, signatures, the
  * first-agreeing-table filter) derives from here — two call sites with
  * independently-written derivations would drift silently and collapse
  * recall with no error.
  */
object LshDerivation {
  def planesAndTables(dims: Int, sigBits: Int, tables: Int, bandBits: Int,
                      seed: Long): (Array[Array[Long]], Array[Array[Int]]) = {
    val rnd = new scala.util.Random(seed)
    val p = Array.fill(sigBits)(Array.fill(dims)(if (rnd.nextBoolean()) 1L else -1L))
    val tb = Array.fill(tables)(rnd.shuffle((0 until sigBits).toList).take(bandBits).toArray)
    (p, tb)
  }
}

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

  @transient private lazy val (planes: Array[Array[Long]], tableBits: Array[Array[Int]]) =
    LshDerivation.planesAndTables(dims, sigBits, tables, bandBits, seed)

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

/** The raw `sigBits`-bit sign signature of one quantized vector, packed
  * into a single BIGINT (bit j = sign(⟨q, w_j⟩), same hyperplanes as
  * [[LshTableKeys]] — the derivation is shared, so bucket keys and
  * signatures can never disagree). `sigBits ≤ 64` by construction.
  *
  * Exists for the minimal-table candidate emission in
  * `Similarity.rawCandidates`: carrying the one-long signature through
  * the bucket join lets the join output be filtered to exactly one
  * instance per colliding pair ([[LshFirstAgree]]) BEFORE any payload
  * join or verify runs — at wide-table configs the candidate stream is
  * `tables`× the distinct-pair count, and that duplication used to be
  * paid through the whole verify pipeline.
  */
case class LshSignature(
    child: Expression,
    dims: Int,
    sigBits: Int,
    seed: Long) extends UnaryExpression {

  require(sigBits <= 64, s"signature must pack into one long: sigBits=$sigBits")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_sig"

  // planes are the PREFIX of the shared Random stream — tables/bandBits
  // only affect draws after them, so any values parameterize identically
  @transient private lazy val planes: Array[Array[Long]] =
    LshDerivation.planesAndTables(dims, sigBits, tables = 1, bandBits = 1, seed)._1

  /** public so generated code can call it */
  def computeSig(q: ArrayData): Long = {
    val n = math.min(q.numElements(), dims)
    var sig = 0L
    var j = 0
    while (j < sigBits) {
      val w = planes(j)
      var s = 0L
      var i = 0
      while (i < n) { s += q.getLong(i) * w(i); i += 1 }
      if (s > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    computeSig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, q => {
      val ref = ctx.addReferenceObj("lshSig", this, classOf[LshSignature].getName)
      s"${ev.value} = $ref.computeSig($q);"
    })

  override protected def withNewChildInternal(newChild: Expression): LshSignature =
    copy(child = newChild)
}

/** First (lowest-index) hash table on which two signatures agree, given
  * their XOR: table t agrees iff `(diff & mask(t)) == 0`, where mask(t)
  * ORs the bits table t samples — the same subsets [[LshTableKeys]]
  * draws. Returns −1 when no table agrees (cannot happen for a pair
  * produced by a bucket join, by definition of the bucket key).
  *
  * Early-exits at the first agreeing table, so the expected cost per
  * bucket-join instance is the first-collision index, not `tables`.
  */
case class LshFirstAgree(
    child: Expression,
    dims: Int,
    sigBits: Int,
    tables: Int,
    bandBits: Int,
    seed: Long) extends UnaryExpression {

  require(sigBits <= 64, s"signature must pack into one long: sigBits=$sigBits")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lsh_first_agree"

  @transient private lazy val masks: Array[Long] =
    LshDerivation.planesAndTables(dims, sigBits, tables, bandBits, seed)._2
      .map(_.foldLeft(0L)((m, idx) => m | (1L << idx)))

  /** public so generated code can call it */
  def firstAgree(diff: Long): Int = {
    var t = 0
    while (t < tables) {
      if ((diff & masks(t)) == 0L) return t
      t += 1
    }
    -1
  }

  override def nullSafeEval(input: Any): Any =
    firstAgree(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, diff => {
      val ref = ctx.addReferenceObj("lshAgree", this, classOf[LshFirstAgree].getName)
      s"${ev.value} = $ref.firstAgree($diff);"
    })

  override protected def withNewChildInternal(newChild: Expression): LshFirstAgree =
    copy(child = newChild)
}
