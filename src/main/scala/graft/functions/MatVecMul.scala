package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: dense matrix x vector product.
  *
  * `mat_vec_mul(matrix, vec)` — `matrix` is a flat ROW-MAJOR
  * array<double> of length rows x n, `vec` an array<double> of length n;
  * the result is the length-`rows` product as array<float> (the engine's
  * embedding storage type, so a rotated corpus is schema-identical to the
  * raw one).
  *
  * Why a native expression: the OPQ rotation ([[graft.ext.Similarity]]
  * `opqRotation`/`rotate`) applies a dims x dims orthonormal matrix to
  * every corpus vector — a per-row dims² multiply-add loop. The
  * declarative spelling (dims separate zip_with/aggregate HOF columns)
  * runs INTERPRETED per element; this is one fused codegen loop with no
  * intermediate arrays, the same extension-ladder rung as
  * [[CosineSimilarity]]. The matrix rides the plan as a foldable literal
  * (a few KB), so the rotation is a shuffle-free narrow projection that
  * stays inside whole-stage codegen.
  *
  * Semantics: null input -> null; a vector whose length is zero or does
  * not divide the matrix length -> null (corrupt embedding, same contract
  * as [[CosineSimilarity]]'s dimension-mismatch null); null elements in
  * EITHER argument contribute 0 (skip, the null-element convention of the
  * other array kernels — the function is registered in SQL and callable
  * on arbitrary arrays, so matrix cells get the same guard as vector
  * cells; reading a null slot via getDouble would be undefined and could
  * disagree between the interpreted and codegen paths).
  */
case class MatVecMul(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "mat_vec_mul"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val m = a.asInstanceOf[ArrayData]
    val v = b.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n == 0 || m.numElements() % n != 0) return null
    val rows = m.numElements() / n
    val out = new Array[Float](rows)
    var i = 0
    while (i < rows) {
      var acc = 0.0
      var j = 0
      while (j < n) {
        if (!v.isNullAt(j) && !m.isNullAt(i * n + j)) {
          acc += m.getDouble(i * n + j) * v.getDouble(j)
        }
        j += 1
      }
      out(i) = acc.toFloat
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val rows = ctx.freshName("rows")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |int $n = $b.numElements();
         |if ($n == 0 || $a.numElements() % $n != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $rows = $a.numElements() / $n;
         |  float[] $out = new float[$rows];
         |  for (int $i = 0; $i < $rows; $i++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      if (!$b.isNullAt($j) && !$a.isNullAt($i * $n + $j)) {
         |        $acc += $a.getDouble($i * $n + $j) * $b.getDouble($j);
         |      }
         |    }
         |    $out[$i] = (float) $acc;
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |      .fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MatVecMul =
    copy(left = newLeft, right = newRight)
}
