package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import graft.util.DetHash

/** Native one-pass MinHash signature: k universal-hash permutations
  * `min_h floorMod(floorMod(h, p)·a_s + b_s, p)` over an `array<long>` of
  * shingle hashes, all k computed in a SINGLE fused loop via `doGenCode`.
  *
  * The composable HOF formulation ([[graft.ops.DedupOps
  * .minhashSignatureFromHashesHof]]) walks the array k times through
  * interpreted lambdas — the dominant cost of the dedup pipelines (k=32 →
  * 32 traversals/row). This expression is bit-identical to it
  * (FunctionsSpec asserts so, including the empty-array → all-null
  * signature edge) and stays inside whole-stage codegen.
  */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {

  private val P = 2147483647L // 2^31 - 1

  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  // same SplitMix64-seeded coefficients as the HOF formulation
  private lazy val coefA: Array[Long] = Array.tabulate(k)(s =>
    1L + java.lang.Math.floorMod(DetHash.splitmix64(seed ^ (2L * s)), P - 1))
  private lazy val coefB: Array[Long] = Array.tabulate(k)(s =>
    java.lang.Math.floorMod(DetHash.splitmix64(seed ^ (2L * s + 1)), P))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k)) // all nulls
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val hm = java.lang.Math.floorMod(arr.getLong(i), P)
      var s = 0
      while (s < k) {
        val v = java.lang.Math.floorMod(hm * coefA(s) + coefB(s), P)
        if (v < out(s)) out(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(out.map(Long.box): Array[Any])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", coefA, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", coefB, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val out = ctx.freshName("out"); val hm = ctx.freshName("hm"); val v = ctx.freshName("v")
      val boxed = ctx.freshName("boxed")
      s"""
         |int $n = $arr.numElements();
         |Object[] $boxed = new Object[$k];
         |if ($n > 0) {
         |  long[] $out = new long[$k];
         |  java.util.Arrays.fill($out, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $hm = java.lang.Math.floorMod($arr.getLong($i), ${P}L);
         |    for (int $s = 0; $s < $k; $s++) {
         |      long $v = java.lang.Math.floorMod($hm * $aRef[$s] + $bRef[$s], ${P}L);
         |      if ($v < $out[$s]) $out[$s] = $v;
         |    }
         |  }
         |  for (int $s = 0; $s < $k; $s++) $boxed[$s] = java.lang.Long.valueOf($out[$s]);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($boxed);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native one-pass 64-bit SimHash over an `array<long>` of token hashes:
  * per-bit majority votes accumulated in a single loop. The HOF
  * formulation ([[graft.ops.DedupOps.simhashFromHashesHof]]) builds 64
  * separate interpreted `aggregate` expressions — 64 array traversals per
  * row; this is one traversal with 64 counter updates, bit-identical
  * (FunctionsSpec) and codegen'd.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val votes = ctx.freshName("votes"); val h = ctx.freshName("h"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $arr.numElements();
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $arr.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) if ($votes[$b] > 0) $sig |= (1L << $b);
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashFunctions {
  import org.apache.spark.sql.{graftglue => g}

  def minhash_signature(hashes: Column, k: Int, seed: Long = 42L): Column =
    g.column(MinHashSignature(g.expression(hashes), k, seed))

  def simhash64(hashes: Column): Column =
    g.column(SimHash64(g.expression(hashes)))
}
