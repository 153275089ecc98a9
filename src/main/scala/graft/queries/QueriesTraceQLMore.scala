package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Testdata

/** TraceQL surface, part 2 (SURVEY.md §2.4): by()/coalesce/select
  * pipeline stages, and the structural operators the reference parses
  * but rejects — parent `<` and negated-child `!>` (parity-plus;
  * reference traceql/spanset_op.go:89-102 rejects them at build time).
  */
object QueriesTraceQLMore extends QueryPack {

  private def q(name: String, oracle: String)(f: Testdata => DataFrame): Q =
    Q(name, (s: SparkSession, dir: String) => f(Testdata(s, dir)), Some(oracle))

  private val oracleSpans =
    """SELECT l_orderkey AS trace_id, l_linenumber AS span_id,
      |  CASE WHEN l_linenumber > 1 THEN l_linenumber // 2 END AS parent_span_id,
      |  l_returnflag AS returnflag, l_linestatus AS linestatus, l_quantity AS quantity
      |FROM lineitem""".stripMargin

  private def spans(td: Testdata): DataFrame =
    Fixtures.materializedSpans(td.spark, td.dir, "tqm") {
      buildSpans(td)
    }

  private def buildSpans(td: Testdata): DataFrame =
    td.lineitem.select(
      col("l_orderkey").as("trace_id"),
      col("l_linenumber").as("span_id"),
      when(col("l_linenumber") > 1, floor(col("l_linenumber") / 2).cast("int"))
        .as("parent_span_id"),
      col("l_returnflag").as("returnflag"),
      col("l_linestatus").as("linestatus"),
      col("l_quantity").as("quantity"))

  /** `{ quantity > 20 } | by(linestatus) | count() > 3 | select(sum)` —
    * spanset partitioning by a field, aggregate + scalar filter, extra
    * projection (reference traceql/pipeline.go:44-55, traceqlengine
    * by/coalesce/select).
    */
  val byCoalesceSelect: Q = q(
    "traceql_by_select",
    s"""WITH spans AS ($oracleSpans)
       |SELECT trace_id, linestatus, COUNT(*) AS n,
       |  CAST(SUM(CAST(quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
       |FROM spans WHERE quantity > 20
       |GROUP BY trace_id, linestatus HAVING COUNT(*) > 3
       |ORDER BY trace_id, linestatus""".stripMargin
  ) { td =>
    spans(td)
      .filter(col("quantity") > 20)
      .groupBy(col("trace_id"), col("linestatus"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("quantity")).as("sum_qty"))
      .filter(col("n") > 3)
      .orderBy("trace_id", "linestatus")
  }

  /** Parent op `{quantity > 45} < {returnflag="R"}` — parents of
    * matching children (reference PARSES but rejects this,
    * spanset_op.go:89-102; the join is the child op transposed).
    */
  val parentOp: Q = q(
    "traceql_parent_op",
    s"""WITH spans AS ($oracleSpans)
       |SELECT p.trace_id, COUNT(*) AS n_pairs
       |FROM spans p JOIN spans c
       |  ON c.trace_id = p.trace_id AND c.parent_span_id = p.span_id
       |WHERE p.returnflag = 'R' AND c.quantity > 45
       |GROUP BY p.trace_id ORDER BY p.trace_id""".stripMargin
  ) { td =>
    val s = spans(td)
    val p = s.filter(col("returnflag") === "R")
      .select(col("trace_id"), col("span_id")).alias("p")
    val c = s.filter(col("quantity") > 45)
      .select(col("trace_id"), col("parent_span_id")).alias("c")
    p.join(c, col("c.trace_id") === col("p.trace_id") &&
        col("c.parent_span_id") === col("p.span_id"))
      .groupBy(col("p.trace_id").as("trace_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("trace_id")
  }

  /** Negated child `{linestatus="F"} !> {quantity > 30}` — matching
    * spans with NO matching child, via left-anti join (parity-plus:
    * rejected by the reference's builder).
    */
  val negatedChild: Q = q(
    "traceql_negated_child",
    s"""WITH spans AS ($oracleSpans)
       |SELECT trace_id, COUNT(*) AS n_spans
       |FROM spans p
       |WHERE linestatus = 'F' AND NOT EXISTS (
       |  SELECT 1 FROM spans c
       |  WHERE c.trace_id = p.trace_id AND c.parent_span_id = p.span_id
       |    AND c.quantity > 30)
       |GROUP BY trace_id ORDER BY trace_id""".stripMargin
  ) { td =>
    val s = spans(td)
    val p = s.filter(col("linestatus") === "F")
      .select(col("trace_id"), col("span_id")).alias("p")
    val c = s.filter(col("quantity") > 30)
      .select(col("trace_id").as("c_trace_id"),
        col("parent_span_id").as("c_parent")).alias("c")
    p.join(c, col("c_trace_id") === col("p.trace_id") &&
        col("c_parent") === col("p.span_id"), "left_anti")
      .groupBy(col("trace_id"))
      .agg(count(lit(1)).as("n_spans"))
      .orderBy("trace_id")
  }

  override def queries: Seq[Q] = Seq(byCoalesceSelect, parentOp, negatedChild)
}
