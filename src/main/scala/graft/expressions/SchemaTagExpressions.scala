package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.DataType

/** Identity at runtime; re-DECLARES the child's dataType as `tagged`
  * (sameType-equal — only nullability/metadata may differ).
  *
  * Why it exists: Spark's parquet writer derives NESTED field ids
  * from the output attribute's DataType (inner StructField metadata),
  * and there is no Column-API way to attach inner metadata without
  * changing semantics — a struct() rebuild turns a NULL parent into a
  * struct of nulls, and a CaseWhen null-guard strips inner metadata
  * in branch-type unification (probed empirically). An alias's
  * explicitMetadata only covers the TOP level. This tag covers the
  * rest: zero-cost pass-through (the child's ExprCode IS this
  * expression's — Spark's own TaggingExpression shape, KnownNotNull),
  * carrying the id-stamped type to the write boundary. */
case class TypeTagged(child: Expression, tagged: DataType)
    extends UnaryExpression {
  // deferred to analysis: the child arrives UNRESOLVED from the
  // Column API (its dataType would throw here)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    // catalogString is the nullability/metadata-insensitive shape
    // (sameType is private[sql])
    if (child.dataType.catalogString == tagged.catalogString)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"TypeTagged: ${child.dataType.catalogString} is not the " +
          s"same type as ${tagged.catalogString} — the tag may only " +
          "change metadata/nullability, never the type")

  override def dataType: DataType = tagged
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = child.genCode(ctx)
  override protected def withNewChildInternal(
      newChild: Expression): TypeTagged = copy(child = newChild)
}
