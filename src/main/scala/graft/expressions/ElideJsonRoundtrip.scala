package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, JsonToStructs, Literal}
import org.apache.spark.sql.catalyst.expressions.json.StructsToJsonEvaluator
import org.apache.spark.sql.catalyst.expressions.objects.Invoke
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** `from_json(to_json(struct(...)))` elision, ported to Spark 4.
  *
  * Upstream's `OptimizeCsvJsonExprs` (SPARK-32948) folds the roundtrip to
  * the struct itself when the parse schema equals the struct's type and
  * both sides carry no options — but since `to_json` became
  * `RuntimeReplaceable` (Spark 4.x), `ReplaceExpressions` (the FIRST
  * optimizer batch) rewrites `StructsToJson` into
  * `Invoke(StructsToJsonEvaluator, "evaluate", child)` before that rule
  * ever sees the pattern, so the elision is dead upstream: a minimal
  * all-nullable `from_json(to_json(struct(a, b)))` keeps both the
  * serialize and the interpreted `JsonToStructs` parse in the optimized
  * plan (verified on 4.1.2). This rule matches the POST-replacement form
  * and applies the same fold with the same guards, plus a stricter
  * field-type allowlist (atomic types whose JSON text roundtrip is
  * value-exact; upstream folded any equal schema).
  *
  * The rewrite is value-preserving, not semantics-narrowing: a payload
  * that is a real stored string still takes the parse path — only a
  * payload provably built from a local struct in the same plan folds to
  * a plain (whole-stage-codegen) projection. At 100 TB this is the
  * difference between an interpreted Jackson serialize+parse per row and
  * no per-row work at all on the engine's single-parse JSON idiom (q51)
  * whenever the producer and consumer land in one plan.
  *
  * Registered in the operator-optimization fixed point (via
  * [[GraftExtensions]]), so `SimplifyExtractValueOps`/`CollapseProject`
  * re-run after the fold and collapse `struct(...).field` accesses into
  * direct column references.
  */
object ElideJsonRoundtrip extends Rule[LogicalPlan] {

  /** Types whose to_json text parses back bit-exactly under from_json
    * with an empty options map: integral/boolean/string verbatim; float/
    * double via Jackson's shortest-roundtrip printing (NaN/±Inf survive
    * through the default allowNonNumericNumbers); decimal prints at its
    * scale; date prints/parses ISO. Timestamps and nested types are
    * excluded (format- and zone-sensitive).
    */
  private def roundtripExact(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType |
        StringType | DoubleType | FloatType | DateType => true
    case _: DecimalType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case j: JsonToStructs if j.options.isEmpty =>
      j.child match {
        case inv: Invoke
            if inv.functionName == "evaluate" && inv.arguments.length == 1 &&
              (inv.targetObject match {
                case Literal(ev: StructsToJsonEvaluator, _) =>
                  // j.dataType (not j.schema): from_json's output type is
                  // the nullable-forced schema — comparing the forced type
                  // (as upstream's rule did) guarantees the fold never
                  // tightens the static nullability the consumer saw
                  ev.options.isEmpty && ev.timeZoneId == j.timeZoneId &&
                    j.dataType == inv.arguments.head.dataType &&
                    (j.dataType match {
                      case s: StructType => s.fields.forall(f => roundtripExact(f.dataType))
                      case _ => false
                    })
                case _ => false
              }) =>
          inv.arguments.head
        case _ => j
      }
  }
}
