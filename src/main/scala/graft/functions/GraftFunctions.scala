package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector ops (builder brief:
  * "a native Catalyst Expression (with doGenCode) beats a Scala UDF").
  *
  * `graft_dot(a, b)` — dot product of two array<double> columns as a
  * single codegen'd loop. Semantically identical to
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)` —
  * the same left-to-right summation order, so results stay bit-identical
  * with the DuckDB oracle — but it runs inside whole-stage codegen instead
  * of the interpreted higher-order-function evaluator (one virtual call
  * per *vector* rather than several per *element*).
  *
  * NULL semantics mirror the HOF form exactly (RewriteDotProduct swaps one
  * for the other session-wide, so any divergence would silently change
  * user answers): a null array → null; unequal lengths → null (zip_with
  * null-pads the shorter side and `x * y` is null-intolerant); any null
  * element → null (the fold's `acc + v` absorbs it).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<double> (registration is engine-internal; the
  // call sites cast explicitly)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {

  import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
  import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

  /** Idempotent session registration; afterwards `graft_dot`,
    * `graft_bloom_agg` and `graft_might_contain` are usable in any
    * SQL/selectExpr string.
    *
    * The bloom pair surfaces Spark's own runtime-filter machinery
    * (`BloomFilterAggregate` / `BloomFilterMightContain`, the engine
    * behind joinside bloom pruning) as callable functions, so an operator
    * can BUILD a filter over a reference relation in one distributed
    * aggregate (partial blooms OR-merge — combiner-friendly at any
    * parallelism) and APPLY it map-side as a plain Filter predicate over
    * a corpus that then never shuffles. `graft_bloom_agg(xxhash64(x), n
    * [, bits])` → binary; `graft_might_contain(bloomBinary,
    * xxhash64(x))` → boolean (the binary must be foldable — a literal —
    * exactly like the runtime-filter rewrite emits).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs =>
        if (exprs.length >= 3) new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
        else new BloomFilterAggregate(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
    RewriteDotProduct.install(spark)
  }
}

/** Optimizer rule: rewrite the interpreted higher-order-function dot
  * product
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, x) -> acc + x)
  * into the codegen'd [[DotProduct]] kernel. Users (and the engine's own
  * SQL) can write the declarative HOF form and still get the fast path —
  * the summation order is identical, so results are bit-equal.
  *
  * Registered per-session via `install` (and by GraftFunctions.register);
  * `GraftExtensions` exposes the same through the standard
  * `spark.sql.extensions` mechanism.
  */
object RewriteDotProduct
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions.{
    Add, ArrayAggregate, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0.0d, org.apache.spark.sql.types.DoubleType) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
                Seq(x2: NamedLambdaVariable, y2: NamedLambdaVariable), _)),
            zero,
            LambdaFunction(Add(acc1: NamedLambdaVariable, v1: NamedLambdaVariable, _),
              Seq(acc2: NamedLambdaVariable, v2: NamedLambdaVariable), _),
            finish @ LambdaFunction(fv: NamedLambdaVariable, Seq(fv2: NamedLambdaVariable), _))
          if isZero(zero) &&
            x1.exprId == x2.exprId && y1.exprId == y2.exprId &&
            acc1.exprId == acc2.exprId && v1.exprId == v2.exprId &&
            fv.exprId == fv2.exprId =>
        DotProduct(a, b)
    }

  private val installed =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())

  def install(spark: SparkSession): Unit =
    if (installed.add(spark.sessionState.toString)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    }
}

/** Standard extension entry point:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * injects graft_dot and the rewrite rule into every session.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectOptimizerRule(_ => RewriteDotProduct)
  }
}
