package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the hot paths.
  *
  * Spark's higher-order functions (transform / exists / aggregate) evaluate
  * their lambda as an interpreted Expression per ELEMENT — measured at
  * ~1.7M elements/s/8-cores on the token arrays, which caps the whole
  * validation suite. These two expressions replace the per-element lambda
  * trees with tight primitive loops inside whole-stage codegen (plus an
  * equivalent interpreted eval), at identical semantics:
  *
  *  - [[TokenArrayGen]]   ≡ transform(sequence(0, n-1), i -> (orig*A + i*B + C) % V)
  *  - [[ArrayIntBounds]]  ≡ exists(arr, t -> t IS NULL OR t < lo OR t > hi)
  *
  * Both are verified element-for-element against the HOF formulation in
  * ExpressionsSpec.
  */
final case class TokenArrayGen(orig: Expression, n: Expression,
                               a: Long, b: Long, c: Long, vocab: Long)
    extends BinaryExpression {

  // elements are stored as int: a vocab past Int.MaxValue would silently
  // truncate here while the fused TokenGenBounds compares the pre-.toInt
  // long — fused and unfused plans would diverge (ADVICE r3)
  require(vocab > 0 && vocab <= Int.MaxValue, s"vocab out of int range: $vocab")

  override def left: Expression = orig
  override def right: Expression = n
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "token_array_gen"

  // Fills the UnsafeArrayData backing buffer directly — a single write pass
  // over freshly-zeroed bytes, instead of fromPrimitiveArray's
  // zero-int[]/fill/zero-byte[]/copy (4 memory passes). This expression is
  // the bench generator's hot loop; memory traffic IS the bottleneck.
  @inline private def fill(oo: Long, len: Int): AnyRef = {
    val header = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .calculateHeaderPortionInBytes(len)
    val numBytes = header + 4L * len
    val data = new Array[Byte](numBytes.toInt)
    val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
    org.apache.spark.unsafe.Platform.putLong(data, off, len.toLong)
    var i = 0
    while (i < len) {
      org.apache.spark.unsafe.Platform.putInt(data, off + header + 4L * i,
        ((oo * a + i * b + c) % vocab).toInt)
      i += 1
    }
    val res = new org.apache.spark.sql.catalyst.expressions.UnsafeArrayData()
    res.pointTo(data, off, numBytes.toInt)
    res
  }

  override protected def nullSafeEval(o: Any, nv: Any): Any =
    fill(o.asInstanceOf[Long], nv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (o, nv) => {
      val data = ctx.freshName("data")
      val header = ctx.freshName("header")
      val numBytes = ctx.freshName("numBytes")
      val i = ctx.freshName("i")
      val tmp = ctx.freshName("uarr")
      val off = "org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET"
      s"""
         |int $header = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.calculateHeaderPortionInBytes($nv);
         |int $numBytes = $header + 4 * $nv;
         |byte[] $data = new byte[$numBytes];
         |org.apache.spark.unsafe.Platform.putLong($data, $off, (long) $nv);
         |for (int $i = 0; $i < $nv; $i++) {
         |  org.apache.spark.unsafe.Platform.putInt($data, $off + $header + 4L * $i,
         |    (int)((($o * ${a}L + $i * ${b}L + ${c}L) % ${vocab}L)));
         |}
         |org.apache.spark.sql.catalyst.expressions.UnsafeArrayData $tmp =
         |  new org.apache.spark.sql.catalyst.expressions.UnsafeArrayData();
         |$tmp.pointTo($data, $off, $numBytes);
         |${ev.value} = $tmp;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(orig = newLeft, n = newRight)
}

/** true ⇔ any element is NULL or outside [lo, hi]; false for empty arrays;
  * NULL input → NULL (callers guard with isNotNull).
  */
final case class ArrayIntBounds(child: Expression, lo: Long, hi: Long)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "array_int_bounds_violated"

  // getInt reads a 4-byte stride: anything but array<int> would silently
  // read garbage — reject it at analysis time (ADVICE r1, medium)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<int>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    var i = 0
    while (i < len) {
      if (arr.isNullAt(i)) return true
      val v = arr.getInt(i)
      if (v < lo || v > hi) return true
      i += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val found = ctx.freshName("found")
      s"""
         |boolean $found = false;
         |for (int $i = 0; $i < $c.numElements() && !$found; $i++) {
         |  if ($c.isNullAt($i)) { $found = true; }
         |  else {
         |    int $v = $c.getInt($i);
         |    if ($v < ${lo}L || $v > ${hi}L) { $found = true; }
         |  }
         |}
         |${ev.value} = $found;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Producer/consumer fusion of [[ArrayIntBounds]] over [[TokenArrayGen]]:
  * checking the bounds of a GENERATED array needs no array — recompute each
  * element in a register loop and compare. Eliminates the per-row array
  * allocation (~2 KB/row of TLAB traffic: the dominant DRAM cost of the
  * validation row pass over in-memory synthetic input at bench scale).
  * Introduced only by the optimizer rule graft.plans.FuseGenChecks; never
  * constructed by user-facing code. Requires n >= 0 (TokenArrayGen itself
  * throws on negative lengths, so any plan this replaces into could not
  * have evaluated a negative n either).
  */
final case class TokenGenBounds(orig: Expression, n: Expression,
                                a: Long, b: Long, c: Long, vocab: Long,
                                lo: Long, hi: Long)
    extends BinaryExpression {

  // mirror TokenArrayGen's int-range guard: this expression compares the
  // pre-.toInt long, so the two forms only agree while vocab fits in int
  require(vocab > 0 && vocab <= Int.MaxValue, s"vocab out of int range: $vocab")

  override def left: Expression = orig
  override def right: Expression = n
  override def dataType: DataType = BooleanType
  override def prettyName: String = "token_gen_bounds_violated"

  override protected def nullSafeEval(o: Any, nv: Any): Any = {
    val oo = o.asInstanceOf[Long]
    val len = nv.asInstanceOf[Int]
    var i = 0
    while (i < len) {
      val v = (oo * a + i * b + c) % vocab
      if (v < lo || v > hi) return true
      i += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (o, nv) => {
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val found = ctx.freshName("found")
      s"""
         |boolean $found = false;
         |for (int $i = 0; $i < $nv && !$found; $i++) {
         |  long $v = ($o * ${a}L + $i * ${b}L + ${c}L) % ${vocab}L;
         |  if ($v < ${lo}L || $v > ${hi}L) { $found = true; }
         |}
         |${ev.value} = $found;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(orig = newLeft, n = newRight)
}

/** Variable-step token generator for the span-family fixture:
  * tokens[i] = (orig*a + i*(b + s*orig) + c) % vocab — the per-doc step
  * (s odd ⟹ steps distinct per orig below the vocab modulus) is what makes
  * cross-doc k-gram duplication in that corpus exactly the planted block
  * (see SyntheticTokens.spanned). A separate expression rather than a
  * TokenArrayGen parameter so the FuseGenChecks rewrites — whose fused
  * TokenGenBounds replays the CONSTANT-step formula — can never match a
  * variable-step generator. CodegenFallback: the per-row tight loop
  * dominates; this runs in fixtures, not the bench hot path. Intermediates:
  * i ≤ n ≤ vocab, step ≤ b + s·orig — callers keep orig·a and i·step far
  * below 2^63 (same contract as TokenArrayGen).
  */
final case class VarStepTokenGen(orig: Expression, n: Expression,
                                 a: Long, b: Long, s: Long, c: Long,
                                 vocab: Long)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(vocab > 0 && vocab <= Int.MaxValue, s"vocab out of int range: $vocab")

  override def left: Expression = orig
  override def right: Expression = n
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "var_step_token_gen"

  override protected def nullSafeEval(o: Any, nv: Any): Any = {
    val oo = o.asInstanceOf[Long]
    val len = nv.asInstanceOf[Int]
    val step = b + s * oo
    val header = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .calculateHeaderPortionInBytes(len)
    val numBytes = header + 4L * len
    val data = new Array[Byte](numBytes.toInt)
    val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
    org.apache.spark.unsafe.Platform.putLong(data, off, len.toLong)
    var i = 0
    while (i < len) {
      org.apache.spark.unsafe.Platform.putInt(data, off + header + 4L * i,
        ((oo * a + i * step + c) % vocab).toInt)
      i += 1
    }
    val res = new org.apache.spark.sql.catalyst.expressions.UnsafeArrayData()
    res.pointTo(data, off, numBytes.toInt)
    res
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(orig = newLeft, n = newRight)
}

object exprs {
  import org.apache.spark.sql.graftbridge.Bridge.{toCol, toExpr}

  /** tokens[i] = (orig*a + i*b + c) % vocab for i in [0, n). */
  def token_array_gen(orig: Column, n: Column, a: Long, b: Long, c: Long, vocab: Long): Column =
    toCol(TokenArrayGen(toExpr(orig), toExpr(n), a, b, c, vocab))

  /** tokens[i] = (orig*a + i*(b + s*orig) + c) % vocab for i in [0, n). */
  def var_step_token_gen(orig: Column, n: Column, a: Long, b: Long, s: Long,
                         c: Long, vocab: Long): Column =
    toCol(VarStepTokenGen(toExpr(orig), toExpr(n), a, b, s, c, vocab))

  /** true ⇔ some element is null or out of [lo, hi]. */
  def array_int_bounds_violated(arr: Column, lo: Long, hi: Long): Column =
    toCol(ArrayIntBounds(toExpr(arr), lo, hi))
}
