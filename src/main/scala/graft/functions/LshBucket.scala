package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.graft.Internals
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Packed hyperplane sign-bit bucket of a float embedding — the hot scalar
  * of the LSH ANN/near-dup operators (p07/p15), as one fused codegen loop.
  * Semantics match the higher-order-function spelling exactly (left-to-right
  * double-widened dot per plane, `> 0` sign test, bit p set for plane p),
  * but without materializing `planes` zip_with arrays per row: the plane
  * matrix rides along as a referenced constant object.
  */
case class LshBucket(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lsh_bucket"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    var bucket = 0
    var p = 0
    while (p < matrix.length) {
      val plane = matrix(p)
      val n = math.min(arr.numElements(), plane.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += arr.getFloat(i).toDouble * plane(i); i += 1 }
      if (dot > 0) bucket |= 1 << p
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.addReferenceObj("lshPlanes", matrix, "double[][]")
      val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p")
      val plane = ctx.freshName("plane")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
        int $bucket = 0;
        for (int $p = 0; $p < $mat.length; $p++) {
          double[] $plane = $mat[$p];
          int $n = java.lang.Math.min($a.numElements(), $plane.length);
          double $dot = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $dot += ((double) $a.getFloat($i)) * $plane[$i];
          }
          if ($dot > 0) $bucket |= 1 << $p;
        }
        ${ev.value} = $bucket;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

/** Index of the hyperplane with the smallest |dot| against the embedding —
  * the bucket bit a just-missed near-neighbor most likely sits across.
  * Drives margin-directed multi-probe (Lv et al., "Multi-Probe LSH"): flip
  * ONLY this bit instead of all `planes` Hamming-1 neighbors, recovering
  * most of the lost recall at 2x candidate volume instead of (planes+1)x.
  * Same fused loop and dot semantics as [[LshBucket]].
  */
case class LshMarginBit(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lsh_margin_bit"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    var best = 0
    var bestAbs = Double.MaxValue
    var p = 0
    while (p < matrix.length) {
      val plane = matrix(p)
      val n = math.min(arr.numElements(), plane.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += arr.getFloat(i).toDouble * plane(i); i += 1 }
      val abs = math.abs(dot)
      if (abs < bestAbs) { bestAbs = abs; best = p }
      p += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.addReferenceObj("lshPlanes", matrix, "double[][]")
      val best = ctx.freshName("best")
      val bestAbs = ctx.freshName("bestAbs")
      val p = ctx.freshName("p")
      val plane = ctx.freshName("plane")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val abs = ctx.freshName("abs")
      val i = ctx.freshName("i")
      s"""
        int $best = 0;
        double $bestAbs = Double.MAX_VALUE;
        for (int $p = 0; $p < $mat.length; $p++) {
          double[] $plane = $mat[$p];
          int $n = java.lang.Math.min($a.numElements(), $plane.length);
          double $dot = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $dot += ((double) $a.getFloat($i)) * $plane[$i];
          }
          double $abs = java.lang.Math.abs($dot);
          if ($abs < $bestAbs) { $bestAbs = $abs; $best = $p; }
        }
        ${ev.value} = $best;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): LshMarginBit =
    copy(child = newChild)
}

object LshBucket {
  /** The registered function decodes (family, table, planes) literals back
    * into the plane sub-matrix via the provider installed by [[bind]] —
    * function registries pass Expressions, not arbitrary objects. `family`
    * selects the plane source (0 = seeded gaussian, 1 = portable
    * md5-derived) so entries with different verification postures can
    * coexist without racing on a rebindable global.
    */
  @volatile private var planeProvider: (Int, Int, Int) => Array[Array[Double]] = _

  def bind(provider: (Int, Int, Int) => Array[Array[Double]]): Unit =
    planeProvider = provider

  private def intLit(e: Expression): Int =
    e.asInstanceOf[Literal].value.asInstanceOf[Number].intValue

  def register(spark: SparkSession): Unit = {
    Internals.registerExprFunction(spark, "lsh_bucket",
      args => LshBucket(args(0),
        planeProvider(intLit(args(1)), intLit(args(2)), intLit(args(3)))))
    Internals.registerExprFunction(spark, "lsh_margin_bit",
      args => LshMarginBit(args(0),
        planeProvider(intLit(args(1)), intLit(args(2)), intLit(args(3)))))
  }

  def apply(spark: SparkSession, emb: Column, table: Int, planes: Int,
      family: Int = 0): Column = {
    register(spark)
    call_function("lsh_bucket", emb, lit(family), lit(table), lit(planes))
  }

  def marginBit(spark: SparkSession, emb: Column, table: Int, planes: Int,
      family: Int = 0): Column = {
    register(spark)
    call_function("lsh_margin_bit", emb, lit(family), lit(table), lit(planes))
  }
}
