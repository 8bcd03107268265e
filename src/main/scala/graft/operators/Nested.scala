package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Dot-notation ⇔ nested-struct conversion (reference: src/ts/nested.ts
  * flatten/unflatten 27-118, CSVRow.toNestedObject row.ts:540-543,
  * unparse flattenObjects unparse.ts:89-94).
  *
  * Spark structs are strictly richer than the reference's JS objects —
  * these helpers translate at the schema level (pure projections, no data
  * movement).
  */
object Nested {

  /** structs → dot-named flat columns, recursively:
    * {user:{name,age}} → user.name, user.age
    */
  def flatten(df: DataFrame): DataFrame = {
    def cols(prefix: String, schema: StructType, path: String): Seq[Column] =
      schema.fields.toSeq.flatMap { f =>
        val full = if (path.isEmpty) s"`${f.name}`" else s"$path.`${f.name}`"
        val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case st: StructType => cols(name, st, full)
          case _ => Seq(col(full).as(name))
        }
      }
    val flat = cols("", df.schema, "")
    df.select(flat: _*)
  }

  /** dot-named flat columns → nested structs, recursively:
    * user.name, user.age → user: struct<name,age>. Non-dotted columns pass
    * through in their original relative order (reference nested.ts:100-118).
    */
  def unflatten(df: DataFrame): DataFrame = {
    // group columns by their head segment, preserving first-seen order
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[String]]
    df.columns.foreach { c =>
      val head = c.split("\\.", 2)(0)
      groups.getOrElseUpdate(head, scala.collection.mutable.ArrayBuffer.empty) += c
    }
    def build(head: String, members: Seq[String]): Column = {
      if (members == Seq(head)) col(s"`$head`")
      else {
        // a scalar column equal to another column's struct prefix cannot
        // coexist with it ("a" vs "a.b" — one name can't be both a value
        // and a struct); fail with the conflict instead of a stray
        // ArrayIndexOutOfBounds from the tail split below
        if (members.contains(head))
          throw new IllegalArgumentException(
            s"cannot unflatten: column '$head' conflicts with nested " +
              s"columns ${members.filterNot(_ == head).mkString(", ")}")
        // members all start with "head."; recurse on the tails
        val tails = members.map(_.split("\\.", 2)(1))
        val sub = scala.collection.mutable.LinkedHashMap
          .empty[String, scala.collection.mutable.ArrayBuffer[String]]
        tails.foreach { t =>
          val h = t.split("\\.", 2)(0)
          sub.getOrElseUpdate(h, scala.collection.mutable.ArrayBuffer.empty) += t
        }
        val fields = sub.map { case (h, ms) =>
          val full = ms.map(m => s"$head.$m")
          (if (ms.toSeq == Seq(h)) col(s"`$head.$h`") else buildNested(head + "." + h, full.toSeq))
            .as(h)
        }.toSeq
        struct(fields: _*)
      }
    }
    def buildNested(prefix: String, members: Seq[String]): Column = {
      val tails = members.map(_.stripPrefix(prefix + "."))
      val sub = scala.collection.mutable.LinkedHashMap
        .empty[String, scala.collection.mutable.ArrayBuffer[String]]
      tails.foreach { t =>
        val h = t.split("\\.", 2)(0)
        sub.getOrElseUpdate(h, scala.collection.mutable.ArrayBuffer.empty) += t
      }
      val fields = sub.map { case (h, ms) =>
        if (ms.length > 1 && ms.contains(h))
          throw new IllegalArgumentException(
            s"cannot unflatten: column '$prefix.$h' conflicts with nested " +
              s"columns under the same name")
        (if (ms.toSeq == Seq(h)) col(s"`$prefix.$h`")
         else buildNested(s"$prefix.$h", ms.map(m => s"$prefix.$m").toSeq)).as(h)
      }.toSeq
      struct(fields: _*)
    }
    val out = groups.map { case (head, members) =>
      build(head, members.toSeq).as(head)
    }.toSeq
    df.select(out: _*)
  }
}
