package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String-array expressions for the corpus-filter pipeline. */
object ArrayExpressions {

  /** Elements of `tokens` not present in `remove`, order and
    * duplicates preserved — `filter(tokens, t -> !array_contains(
    * remove, t))`, but codegen'd. Spark's higher-order `filter` is a
    * `CodegenFallback`: every element runs an interpreted lambda with
    * a boxed `array_contains` walk, which is the dominant cost of a
    * corpus-scale boilerplate strip (a single sf1 scan task burned
    * minutes in `ArrayFilter.nullSafeEval`). This compiles to a
    * nested primitive loop over `UTF8String.equals`.
    *
    * `array_except` is NOT equivalent: it dedups the output and
    * reorders nothing but drops duplicate survivors — a document
    * rewrite must keep repeated tokens.
    */
  def removeAll(tokens: Column, remove: Column): Column =
    ColumnBridge.column(ArrayRemoveAll(
      ColumnBridge.expression(tokens), ColumnBridge.expression(remove)))
}

/** See [[ArrayExpressions.removeAll]]. The pipeline feeds it
  * `split` / `collect_list` outputs (never null elements), but the
  * expression is also registered as a public SQL function, so null
  * elements must not crash a task: a null token is DROPPED (matching
  * the documented `filter(tokens, t -> !array_contains(remove, t))`
  * equivalent, where the null-propagating predicate filters the
  * element out) and null entries in the remove set are ignored (no
  * string equals null) — so `containsNull = false` on the output
  * stays truthful. The remove side is scanned linearly per token —
  * it is a boilerplate/stop set, small by construction; for large
  * remove sets prefer an equi-join.
  */
case class ArrayRemoveAll(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "array_remove_all"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string> inputs, " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val rem = b.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val m = rem.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var hit = false
        var j = 0
        while (!hit && j < m) {
          if (!rem.isNullAt(j) && t.equals(rem.getUTF8String(j))) hit = true
          j += 1
        }
        if (!hit) out.add(t)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gad = classOf[GenericArrayData].getName
    val utf8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val hit = ctx.freshName("hit")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |java.util.ArrayList<$utf8> $out = new java.util.ArrayList<$utf8>($n);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  $utf8 $t = $a.getUTF8String($i);
         |  boolean $hit = false;
         |  for (int $j = 0; !$hit && $j < $m; $j++) {
         |    if (!$b.isNullAt($j) && $t.equals($b.getUTF8String($j))) $hit = true;
         |  }
         |  if (!$hit) $out.add($t);
         |}
         |${ev.value} = new $gad($out.toArray());
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayRemoveAll =
    copy(left = newLeft, right = newRight)
}
