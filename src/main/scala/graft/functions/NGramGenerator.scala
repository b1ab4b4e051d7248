package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-generating function (SURVEY §2C, the Generator
  * extension point): emits one row per word n-gram of a string column
  * — `(pos, ngram)` — without materializing the shingle array per row
  * first (the built-in route is split → transform → posexplode, which
  * allocates the full array before exploding).
  *
  * Non-codegen (CodegenFallback) like several built-in generators;
  * the surrounding plan stays in WholeStageCodegen around the
  * Generate node.
  */
case class NGramGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val words = v.asInstanceOf[UTF8String].toString
        .toLowerCase(java.util.Locale.ROOT).trim.split("\\s+")
      if (words.length < n) Nil
      else (0 to words.length - n).map { i =>
        InternalRow(i, UTF8String.fromString(words.slice(i, i + n).mkString(" ")))
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): NGramGenerator =
    copy(child = c)
}
