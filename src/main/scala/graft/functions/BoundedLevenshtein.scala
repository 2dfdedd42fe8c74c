package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Levenshtein distance CAPPED at K —
  * returns the exact distance when it is ≤ K, and K+1 otherwise.
  *
  * The fuzzy-matching verify step only ever asks "is the distance ≤ K"
  * for small K (2 here), but the builtin `levenshtein` fills the full
  * O(n·m) DP matrix before the comparison throws most of it away. The
  * banded formulation (Ukkonen) visits only the 2K+1-wide diagonal
  * band — O(K·min(n,m)) — and exits as soon as the whole band exceeds
  * K, which for typical non-matching candidate pairs happens within a
  * few rows. At web-vocabulary candidate volumes the verify step is
  * the hot loop, so the asymptotic drop is the difference between
  * "verify is free next to candidate generation" and "verify is the
  * bottleneck". Fully code-generated (static call from the generated
  * code), stays inside whole-stage codegen.
  */
case class BoundedLevenshtein(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) if k >= 0 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"bounded_levenshtein expects (string, string) and k >= 0, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString}), k=$k")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    BoundedLevenshtein.boundedDist(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BoundedLevenshtein.boundedDist(" +
        s"$a.toString(), $b.toString(), $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedLevenshtein =
    copy(left = newLeft, right = newRight)
}

object BoundedLevenshtein {

  /** Banded Levenshtein: exact distance if ≤ k, else k+1. Visits only
    * the |i−j| ≤ k diagonal band and bails out the first time every
    * cell of a row exceeds k. Public + static-forwarded so generated
    * code calls it directly. */
  def boundedDist(s: String, t: String, k: Int): Int = {
    val n = s.length
    val m = t.length
    if (math.abs(n - m) > k) return k + 1
    if (n == 0) return m // ≤ k by the guard above
    if (m == 0) return n
    // prev/curr hold one DP row each, but only cells in the band are
    // ever read; cells outside it stay at the k+1 sentinel
    val inf = k + 1
    var prev = new Array[Int](m + 1)
    var curr = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      java.util.Arrays.fill(curr, inf)
      if (lo == 1) curr(0) = if (i <= k) i else inf
      var best = curr(0)
      val si = s.charAt(i - 1)
      j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (si == t.charAt(j - 1)) 0 else 1)
        val del = prev(j) + 1
        val ins = curr(j - 1) + 1
        var v = if (sub < del) sub else del
        if (ins < v) v = ins
        if (v > inf) v = inf
        curr(j) = v
        if (v < best) best = v
        j += 1
      }
      if (best >= inf) return inf // whole band over the cap — early exit
      val tmp = prev; prev = curr; curr = tmp
      i += 1
    }
    math.min(prev(m), inf)
  }

  /** Column-API entry point. */
  def bounded_levenshtein(a: Column, b: Column, k: Int): Column =
    GraftSqlBridge.column(BoundedLevenshtein(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b), k))
}
