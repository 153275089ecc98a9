package graft.logql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector-matching binop evaluation shared by the LogQL and PromQL
  * planners (reference logqlmetric/bin_op.go:13-254 and the vendored
  * PromQL engine's one-to-one / many-to-one matching).
  *
  * Input frames carry (bucketCol, labels: Map[String,String], value:
  * Double). The match key is the on()/ignoring()-filtered label map
  * rendered through a SORTED entry list, so maps built in different
  * key orders on the two sides still compare equal.
  *
  * Scale notes: one-to-one matching is an equi-join on (bucket, key) —
  * co-partitioned after the upstream aggregations. group_left/right
  * broadcast the "one" side (an info-series frame, small by
  * construction), the same shape as the reference's hand query.
  */
object VectorMatching {
  import Ast.VectorMatch

  /** THE series-identity key: a label map rendered through a SORTED
    * entry list. Every place a label map becomes a join or group key
    * must use this — map_concat/label_replace/group_left build maps in
    * different entry orders, and raw to_json(map_entries(...)) would
    * silently fail to match equal label sets.
    */
  def streamKey(labels: Column): Column =
    to_json(array_sort(map_entries(labels)))

  /** Sorted-entries grouping key — the canonical series identity
    * WITHOUT the JSON rendering: equality matches [[streamKey]]
    * exactly (that key IS the JSON of this array), the key is
    * hash-aggregable, and the label map rebuilds in place with
    * map_from_entries — no serialize on the input side, no parse on
    * the output side. Use for PURE AGGREGATION keys; joins and
    * windows that need a string key keep [[streamKey]].
    */
  def entriesKey(labels: Column): Column = array_sort(map_entries(labels))

  /** Inverse of [[entriesKey]] — exact (keys are unique, order is the
    * canonical sorted order).
    */
  def labelsOfEntries(key: Column): Column = map_from_entries(key)

  /** The label map rebuilt from its [[streamKey]] — bit-exact inverse
    * (to_json/from_json round-trip string entries losslessly; the map
    * comes back in canonical sorted-entry order). Aggregations that
    * group on a string `__stream` use this INSTEAD of carrying the map
    * through a `first(labels)` aggregate: a map-typed aggregation
    * buffer is not hash-aggregable, so `first(map)` silently demotes
    * the whole aggregation to SortAggregate — a per-partition
    * O(n log n) sort outside whole-stage codegen on EVERY vector-agg
    * path (r19; the rebuild runs once per output group, the demoted
    * sort ran over every input row).
    */
  def labelsOfStreamKey(key: Column): Column =
    map_from_entries(from_json(key,
      org.apache.spark.sql.types.DataTypes.createArrayType(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("key",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.StringType))))))

  /** `sum by (keep)` over an already-planned series frame — the ONE
    * shared implementation behind the planners' shared-operand binop
    * rollups (LogQL `sharedRollup`, PromQL's Bin sumBy). It mirrors
    * the direct `sum by` aggregation cases exactly: labels reduce to
    * the kept keys, the group key is the canonical [[streamKey]], and
    * the sum runs once over the frame's rows — so a rollup derived
    * through here is bit-identical to planning the aggregation
    * directly over the same frame.
    */
  def sumBySeries(in: DataFrame, keep: Seq[String],
      bucketCol: String): DataFrame =
    in.withColumn("labels",
        map_filter(col("labels"), (k, _) => k.isin(keep: _*)))
      .withColumn("__stream", entriesKey(col("labels")))
      .groupBy(col(bucketCol), col("__stream"))
      .agg(sum(col("value")).as("value"))
      .select(col(bucketCol),
        labelsOfEntries(col("__stream")).as("labels"), col("value"))

  private def filteredLabels(labels: Column, m: VectorMatch): Column = {
    val arr = array(m.labels.map(lit): _*)
    if (m.on) map_filter(labels, (k, _) => array_contains(arr, k))
    else map_filter(labels, (k, _) => !array_contains(arr, k))
  }

  private def matchKey(labels: Column, m: VectorMatch): Column =
    to_json(array_sort(map_entries(filteredLabels(labels, m))))

  private val cmpOps = Set(">", "<", ">=", "<=", "==", "!=")

  /** IEEE-754 binary arithmetic (upstream PromQL is Go float math):
    * x/0 is ±Inf (NaN at 0/0), x%0 is NaN — Spark's ANSI operators
    * would error out instead, so zero divisors take a guarded branch.
    */
  private[graft] def arith(op: String, l: Column, r: Column): Column = op match {
    case "+" => l + r
    case "-" => l - r
    case "*" => l * r
    case "/" =>
      when(r === 0.0,
        when(l > 0, lit(Double.PositiveInfinity))
          .when(l < 0, lit(Double.NegativeInfinity))
          .otherwise(lit(Double.NaN)))
        .otherwise(l / r)
    case "%" =>
      when(r === 0.0, lit(Double.NaN)).otherwise(l % r)
    case "^" => pow(l, r)
    case "atan2" => atan2(l, r)
    case ">" => l > r
    case "<" => l < r
    case ">=" => l >= r
    case "<=" => l <= r
    case "==" => l === r
    case "!=" => l =!= r
  }

  /** Evaluate `l op r` under the given matching; both frames have
    * (bucketCol, labels, value), and so does the result.
    */
  def bin(op: String, l: DataFrame, r: DataFrame, m: VectorMatch,
      bucketCol: String, boolMod: Boolean = false): DataFrame = op match {
    case "and" =>
      l.withColumn("__mk", matchKey(col("labels"), m))
        .join(r.select(col(bucketCol),
            matchKey(col("labels"), m).as("__mk")).distinct(),
          Seq(bucketCol, "__mk"), "left_semi")
        .select(col(bucketCol), col("labels"), col("value"))
    case "unless" =>
      l.withColumn("__mk", matchKey(col("labels"), m))
        .join(r.select(col(bucketCol),
            matchKey(col("labels"), m).as("__mk")).distinct(),
          Seq(bucketCol, "__mk"), "left_anti")
        .select(col(bucketCol), col("labels"), col("value"))
    case "or" =>
      val lk = l.withColumn("__mk", matchKey(col("labels"), m))
      val extra = r.withColumn("__mk", matchKey(col("labels"), m))
        .join(lk.select(col(bucketCol), col("__mk")).distinct(),
          Seq(bucketCol, "__mk"), "left_anti")
      lk.select(col(bucketCol), col("labels"), col("value"))
        .unionAll(extra.select(col(bucketCol), col("labels"), col("value")))
    case _ =>
      m.groupSide match {
        case None =>
          // one-to-one: result labels are the match labels
          val lk = l.select(col(bucketCol),
            matchKey(col("labels"), m).as("__mk"),
            filteredLabels(col("labels"), m).as("labels"), col("value"))
          val rk = r.select(col(bucketCol),
            matchKey(col("labels"), m).as("__mk"), col("value").as("__rv"))
          val j = lk.join(rk, Seq(bucketCol, "__mk"))
          finish(op, j, col("value"), col("__rv"), bucketCol, boolMod)
        case Some(side) =>
          // many-to-one: the many side keeps its labels (+ include
          // labels copied from the one side); the one side broadcasts
          val (many, one) = if (side == "left") (l, r) else (r, l)
          val incArr = array(m.include.map(lit): _*)
          val oneK = one.select(col(bucketCol),
            matchKey(col("labels"), m).as("__mk"), col("value").as("__ov"),
            map_filter(col("labels"), (k, _) => array_contains(incArr, k)).as("__inc"))
          val j = many.withColumn("__mk", matchKey(col("labels"), m))
            .join(broadcast(oneK), Seq(bucketCol, "__mk"))
            .withColumn("labels", map_concat(
              map_filter(col("labels"), (k, _) => !array_contains(incArr, k)),
              col("__inc")))
          // operand order follows the written query: l op r
          val (lv, rv) =
            if (side == "left") (col("value"), col("__ov"))
            else (col("__ov"), col("value"))
          finish(op, j, lv, rv, bucketCol, boolMod)
      }
  }

  /** `many op (sum by (k) (many))` evaluated WITHOUT the join: when
    * the "one" side would be [[sumBySeries]] of the SAME planned frame
    * over exactly the on() keys (and there are no include labels), the
    * one-value every many row joins against is just the sum of its own
    * (bucket, match-key) group — a window aggregate over the many
    * frame. The join can never drop rows (each many row contributes to
    * its own group, so a matching one row always exists) and group_left
    * keeps the many side's labels unchanged, so result rows are
    * identical; values re-aggregate bit-exactly under the callers'
    * gates (integral counts — the sharedRollup distributivity
    * argument; window and hash-agg sums differ only in addition
    * order). Plan effect vs the rollup+join: the second aggregation,
    * the broadcast build and the join disappear — one exchange on
    * (bucket, key) + WindowExec instead (measured r19: 2 fewer jobs
    * on the sub-second binop path, where job count IS the wall).
    */
  def binSelfGrouped(op: String, many: DataFrame, m: VectorMatch,
      bucketCol: String, manySide: String,
      boolMod: Boolean = false): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(bucketCol), matchKey(col("labels"), m))
    val j = many.withColumn("__ov", sum(col("value")).over(w))
    val (lv, rv) =
      if (manySide == "left") (col("value"), col("__ov"))
      else (col("__ov"), col("value"))
    finish(op, j, lv, rv, bucketCol, boolMod)
  }

  private[logql] def finish(op: String, j: DataFrame, lv: Column, rv: Column,
      bucketCol: String, boolMod: Boolean = false): DataFrame = {
    val v = arith(op, lv, rv)
    if (cmpOps(op) && boolMod)
      // `bool` keeps every matched pair, the value collapsing to 0/1
      j.select(col(bucketCol), col("labels"),
        when(v, 1.0).otherwise(0.0).as("value"))
    else if (cmpOps(op))
      j.filter(v).select(col(bucketCol), col("labels"), lv.as("value"))
    else
      j.select(col(bucketCol), col("labels"), v.as("value"))
  }
}
