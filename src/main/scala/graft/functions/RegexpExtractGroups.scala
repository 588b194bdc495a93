package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import java.util.regex.{Matcher, Pattern}

/** `regexp_extract_groups(line, pattern)` — one regex execution returning ALL capture
  * groups as `array<string>`, or NULL when the line does not match.
  *
  * Why it exists: the log_format structuring scan (SURVEY §2.1 S2) needs every header
  * of the compiled format. Built-ins force one `regexp_extract` per header plus an
  * `rlike` for the matched flag — 7 executions of the same pattern per line for an
  * HDFS-style format. This expression makes structuring one match per line; headers
  * project out of the array for free. Native codegen (no UDF), null-safe, pattern
  * compiled once per task via mutable state — same approach as Spark's own
  * `RegExpExtract` (expression surface modeled on the public Spark source).
  */
case class RegexpExtractGroups(subject: Expression, regexp: Expression)
    extends BinaryExpression {

  override def left: Expression = subject
  override def right: Expression = regexp
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "regexp_extract_groups"

  // interpreted path: cache the compiled pattern across rows
  @transient private var lastRegex: UTF8String = _
  @transient private var pattern: Pattern = _

  override def nullSafeEval(s: Any, r: Any): Any = {
    val regex = r.asInstanceOf[UTF8String]
    if (pattern == null || !regex.equals(lastRegex)) {
      lastRegex = regex.clone()
      pattern = Pattern.compile(regex.toString)
    }
    val m: Matcher = pattern.matcher(s.asInstanceOf[UTF8String].toString)
    if (!m.find()) null
    else {
      val n = m.groupCount()
      val arr = new Array[Any](n)
      var i = 0
      while (i < n) {
        val g = m.group(i + 1)
        arr(i) = if (g == null) null else UTF8String.fromString(g)
        i += 1
      }
      new GenericArrayData(arr)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patternClass = classOf[Pattern].getName
    val arrayClass = classOf[GenericArrayData].getName
    val lastRegexTerm = ctx.addMutableState("UTF8String", "lastRegexGrp")
    val patternTerm = ctx.addMutableState(patternClass, "patternGrp")
    val m = ctx.freshName("matcher")
    val n = ctx.freshName("nGroups")
    val arr = ctx.freshName("groupArr")
    val g = ctx.freshName("group")
    val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, (subj, regex) => {
      s"""
        if ($patternTerm == null || !$regex.equals($lastRegexTerm)) {
          $lastRegexTerm = ($regex).clone();
          $patternTerm = $patternClass.compile($lastRegexTerm.toString());
        }
        java.util.regex.Matcher $m = $patternTerm.matcher($subj.toString());
        if ($m.find()) {
          int $n = $m.groupCount();
          Object[] $arr = new Object[$n];
          for (int $i = 0; $i < $n; $i++) {
            String $g = $m.group($i + 1);
            $arr[$i] = ($g == null) ? null : UTF8String.fromString($g);
          }
          ${ev.value} = new $arrayClass($arr);
        } else {
          ${ev.isNull} = true;
        }
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(subject = newLeft, regexp = newRight)
}

object RegexpExtractGroups {
  def apply(line: Column, pattern: String): Column =
    ColumnBridge.column(RegexpExtractGroups(ColumnBridge.expression(line),
      org.apache.spark.sql.catalyst.expressions.Literal(pattern)))
}
