package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Coercions

/** Declarative schema coercion — the reference's `Schema<T>` surface
  * (src/ts/types.ts:17-31; coercion rules src/ts/row.ts:620-706):
  * 8 column types, opt-in per column, nullable flag, default value,
  * non-nullable-null → error.
  *
  * Lowered as one projection of pure Column expressions (no UDFs): each
  * typed column becomes `coerce(raw)`, nulls replaced by `default` or
  * recorded in an error frame. Runs inside whole-stage codegen.
  */
object SchemaCoercion {

  /** Column spec: reference type names `string | number | integer | float |
    * boolean | date | currency | percent`.
    */
  final case class ColSpec(
      tpe: String,
      nullable: Boolean = true,
      default: Option[String] = None)

  final case class Coerced(df: DataFrame, errors: DataFrame)

  private def coerce(c: Column, tpe: String): Column = tpe match {
    case "string"            => c.cast("string")
    case "number" | "float"  => Coercions.numberLoose(c)
    case "integer"           => Coercions.integerLoose(c)
    case "boolean"           => Coercions.boolLoose(c)
    case "date"              => Coercions.dateIso(c)
    case "currency"          => Coercions.currencyLoose(c)
    case "percent"           => Coercions.percentLoose(c)
    case other => throw new IllegalArgumentException(s"unknown column type: $other")
  }

  /** Apply a schema to a (string-typed) frame. Returns the coerced frame
    * plus an error frame with one row per non-nullable violation
    * (errType=Validation, code=InvalidCast — reference errors.ts:6-37).
    */
  def apply(df: DataFrame, schema: Map[String, ColSpec]): Coerced = {
    val out = df.select(df.columns.toSeq.map { name =>
      schema.get(name) match {
        case Some(spec) =>
          val coerced = coerce(col(s"`$name`"), spec.tpe)
          val withDefault = spec.default match {
            case Some(d) => coalesce(coerced, coerce(lit(d), spec.tpe))
            case None    => coerced
          }
          withDefault.as(name)
        case None => col(s"`$name`")
      }
    }: _*)

    val checks = schema.collect {
      case (name, spec) if !spec.nullable && spec.default.isEmpty =>
        val bad = coerce(col(s"`$name`"), spec.tpe).isNull
        (name, bad)
    }.toSeq
    val errors =
      if (checks.isEmpty)
        df.sparkSession.emptyDataFrame
          .select(lit("").as("errType"), lit("").as("code"),
            lit("").as("message"), lit(0L).as("row")).limit(0)
      else
        checks.map { case (name, bad) =>
          df.filter(bad).select(
            lit("Validation").as("errType"),
            lit("InvalidCast").as("code"),
            concat(lit(s"non-nullable column '$name' coerced to null from '"),
              coalesce(col(s"`$name`").cast("string"), lit("null")), lit("'"))
              .as("message"),
            lit(null).cast("long").as("row"))
        }.reduce(_ union _)

    Coerced(out, errors)
  }
}
