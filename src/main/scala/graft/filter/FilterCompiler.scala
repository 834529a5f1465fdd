package graft.filter

import graft.model.{FilterCondition, FilterOps}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles a conjunctive [[FilterCondition]] list into a single Catalyst
  * `Column` predicate — no UDFs, fully codegen-able, and pushdown-friendly
  * (a compiled predicate over parquet columns lands in `PushedFilters`).
  *
  * Semantics are locked to the reference evaluator
  * (/root/reference/beametrics/filter.py:13-45, verified against
  * /root/reference/tests/test_filter.py:95-120):
  *
  *  - conjunction of all conditions; empty list ⇒ always true
  *  - `equals`: string-typed runtime value compared to the config string;
  *    a non-string runtime value never equals a config string ⇒ false
  *  - `contains`: substring test, only defined on string values; else false
  *  - `greater_than`/`less_than`: numeric runtime values only (numeric
  *    *strings* do NOT match — Python `isinstance` guard); config value
  *    parsed as double, unparsable config ⇒ false
  *  - unknown operator ⇒ false; missing field / null ⇒ false
  *
  * Two compilation modes, per SURVEY.md §2.2 / §7.5:
  *  - [[compile(conds:Seq[graft\.model\.FilterCondition],schema:org\.apache\.spark\.sql\.types\.StructType)*
  *    typed mode]]: the input has a declared schema; per-field static types
  *    let every type guard resolve at plan time (to `lit(false)` when the
  *    reference would always return False).
  *  - [[compileSchemaless schemaless mode]]: the input is
  *    `MapType(String, String)` from JSON. JSON numbers were stringified by
  *    the parse, so numeric comparisons `try_cast` the string; documented
  *    divergence from the reference: a JSON number compares `equals` via its
  *    canonical string rendering, and numeric-looking strings DO satisfy
  *    greater_than/less_than (the runtime type distinction is lost).
  */
object FilterCompiler {

  /** Typed mode: exact reference semantics for a known input schema. */
  def compile(conds: Seq[FilterCondition], schema: StructType): Column =
    conds.map(compileTyped(_, schema)).reduceOption(_ && _).getOrElse(lit(true))

  /** Schemaless mode: predicate over a `MapType(String,String)` column. */
  def compileSchemaless(conds: Seq[FilterCondition], msg: Column): Column =
    conds.map(compileMap(_, msg)).reduceOption(_ && _).getOrElse(lit(true))

  private def compileTyped(c: FilterCondition, schema: StructType): Column = {
    val dt = schema.fields.find(_.name == c.field).map(_.dataType)
    dt match {
      case None => lit(false) // msg.get(field) ⇒ None ⇒ no operator matches
      case Some(t) =>
        val f = col(c.field)
        c.operator match {
          case FilterOps.Equals =>
            t match {
              case StringType => f === lit(c.value) // null === x ⇒ null ⇒ dropped by filter
              case _          => lit(false)         // non-string value vs string config ⇒ False
            }
          case FilterOps.Contains =>
            t match {
              case StringType => f.contains(c.value)
              case _          => lit(false)
            }
          case FilterOps.GreaterThan =>
            numericCompare(t, f, c.value, gt = true)
          case FilterOps.LessThan =>
            numericCompare(t, f, c.value, gt = false)
          case _ => lit(false) // unknown operator (/root/reference/beametrics/filter.py:42)
        }
    }
  }

  private def numericCompare(t: DataType, f: Column, v: String, gt: Boolean): Column =
    t match {
      case _: NumericType =>
        parseDouble(v) match {
          case Some(d) => if (gt) f > lit(d) else f < lit(d)
          case None    => lit(false) // float(cond.value) raises ⇒ evaluator returns False
        }
      case _ => lit(false) // isinstance(value,(int,float)) guard: strings never match
    }

  private def compileMap(c: FilterCondition, msg: Column): Column = {
    // try_element_at, not element_at: ANSI mode (Spark 4 default) makes
    // element_at throw on a missing map key; reference semantics are
    // msg.get(field) ⇒ None ⇒ condition false.
    val f = try_element_at(msg, lit(c.field))
    c.operator match {
      case FilterOps.Equals   => f === lit(c.value)
      case FilterOps.Contains => f.contains(c.value)
      case FilterOps.GreaterThan =>
        parseDouble(c.value) match {
          case Some(d) => f.try_cast(DoubleType) > lit(d)
          case None    => lit(false)
        }
      case FilterOps.LessThan =>
        parseDouble(c.value) match {
          case Some(d) => f.try_cast(DoubleType) < lit(d)
          case None    => lit(false)
        }
      case _ => lit(false)
    }
  }

  /** Decimal-literal grammar only: Scala's `toDouble` accepts Java suffix
    * forms ("100d", "1.5f") that Python's float() — the reference's parse,
    * whose failure means the condition never matches — rejects.
    * (Remaining micro-divergences documented: Python also accepts
    * underscore separators and inf/nan, which no sane config uses.)
    */
  private val DoubleLit = """[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?""".r

  private def parseDouble(s: String): Option[Double] = {
    val t = s.trim
    if (DoubleLit.matches(t))
      try Some(t.toDouble)
      catch { case _: NumberFormatException => None }
    else None
  }
}
