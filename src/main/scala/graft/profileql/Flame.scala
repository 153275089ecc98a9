package graft.profileql

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ProfileQL render path: selector → merged flamegraph → Pyroscope
  * flamebearer JSON ("single" format: interned names + per-level
  * [xOffsetΔ, total, self, nameIdx] quads, offsets delta-encoded
  * against the end of the previous sibling) — reference
  * profileqlengine/flamebearer.go:11-126, profilehandler.go:164-223.
  *
  * Split of work: the MERGE (sum per distinct stack) is distributed —
  * one groupBy over the matching samples; only the merged per-stack
  * totals reach the driver, bounded by the number of distinct stacks
  * (a flamegraph is only renderable when that is small; `maxNodes`
  * folds the tail into "other" like the reference's minValue rule).
  *
  * Profiles frame contract: `ts_us Long, name String,
  * labels Map[String,String], stack Array[String] (root→leaf),
  * value Long`.
  */
object Flame {

  /** One selector matcher: label, operator (= != =~ !~), value. */
  private[graft] final case class Matcher(label: String, op: String, value: String)

  /** `name{k="v",k2!="x",k3=~"a|b"}` — the ProfileQL selector the
    * render endpoint accepts (reference profileql/parser.go:10-230).
    * A real tokenizer: quoted values may contain commas and escaped
    * quotes; all four matcher operators are recognized, and anything
    * else is rejected explicitly rather than misparsed as equality on
    * a mangled label name.
    */
  private[graft] def parseSelector(q: String): (String, Seq[Matcher]) = {
    val brace = q.indexOf('{')
    if (brace < 0) return (q.trim, Nil)
    val name = q.substring(0, brace).trim
    val close = q.lastIndexOf('}')
    require(close > brace, s"unterminated selector body in: $q")
    val body = q.substring(brace + 1, close)
    var i = 0
    def skipWs(): Unit = while (i < body.length && body(i).isWhitespace) i += 1
    val ms = mutable.ArrayBuffer.empty[Matcher]
    skipWs()
    while (i < body.length) {
      val ls = i
      while (i < body.length && (body(i).isLetterOrDigit || body(i) == '_' ||
        body(i) == '.')) i += 1
      val label = body.substring(ls, i)
      require(label.nonEmpty, s"expected label name at offset $i in: {$body}")
      skipWs()
      val op =
        if (body.startsWith("=~", i)) { i += 2; "=~" }
        else if (body.startsWith("!=", i)) { i += 2; "!=" }
        else if (body.startsWith("!~", i)) { i += 2; "!~" }
        else if (i < body.length && body(i) == '=') { i += 1; "=" }
        else throw new IllegalArgumentException(
          s"expected matcher operator (= != =~ !~) after '$label' in: {$body}")
      skipWs()
      require(i < body.length && body(i) == '"',
        s"expected quoted value after '$label$op' in: {$body}")
      i += 1
      val sb = new StringBuilder
      while (i < body.length && body(i) != '"') {
        if (body(i) == '\\' && i + 1 < body.length) {
          i += 1
          sb += (body(i) match {
            case 'n' => '\n'; case 't' => '\t'; case c => c
          })
        } else sb += body(i)
        i += 1
      }
      require(i < body.length, s"unterminated quoted value in: {$body}")
      i += 1 // closing quote
      ms += Matcher(label, op, sb.result())
      skipWs()
      if (i < body.length) {
        require(body(i) == ',', s"expected ',' between matchers in: {$body}")
        i += 1; skipWs()
      }
    }
    (name, ms.toSeq)
  }

  /** Matching samples merged per distinct stack (the distributed
    * part), truncated distributed-side: only the `maxStacks` heaviest
    * stacks reach the driver; the remainder's total comes back as ONE
    * aggregate so the rendered tree still sums to the true total. A
    * pathological corpus (unbounded distinct stacks) can therefore
    * never balloon the driver.
    */
  private def mergedStacks(profiles: DataFrame, query: String,
      fromUs: Option[Long], untilUs: Option[Long],
      maxStacks: Int): (Seq[(Seq[String], Long)], Long) = {
    val (name, matchers) = parseSelector(query)
    var df = profiles
    if (name.nonEmpty) df = df.filter(col("name") === name)
    matchers.foreach { m =>
      val v = element_at(col("labels"), m.label)
      df = df.filter(m.op match {
        case "="  => v === m.value
        case "!=" => !(v <=> m.value) // absent label also matches !=
        case "=~" => v.rlike("^(?:" + m.value + ")$")
        case "!~" => !coalesce(v.rlike("^(?:" + m.value + ")$"), lit(false))
      })
    }
    fromUs.foreach(t => df = df.filter(col("ts_us") >= t))
    untilUs.foreach(t => df = df.filter(col("ts_us") <= t))
    val agg = df.groupBy(col("stack")).agg(sum(col("value")).as("total"))
      .persist()
    try {
      val top = agg.orderBy(col("total").desc).limit(maxStacks).collect()
        .map(r => (r.getSeq[String](0), r.getLong(1))).toSeq
      val grand = agg.agg(coalesce(sum(col("total")), lit(0L))).head().getLong(0)
      (top, grand - top.map(_._2).sum)
    } finally { agg.unpersist(): Unit }
  }

  private final class Node(val name: String) {
    var total = 0L
    var self = 0L
    val children = mutable.SortedMap.empty[String, Node]
  }

  /** Flamebearer JSON for `query` over the profiles frame.
    * `maxStacks` bounds what the distributed merge ships to the
    * driver; the folded remainder renders as a root-level "other"
    * frame so numTicks stays the true total.
    */
  def flamebearer(profiles: DataFrame, query: String,
      fromUs: Option[Long] = None, untilUs: Option[Long] = None,
      maxNodes: Int = 0, maxStacks: Int = 1 << 16): String = {
    val (top, dropped) =
      mergedStacks(profiles, query, fromUs, untilUs, maxStacks)
    val stacks =
      if (dropped > 0) top :+ (Seq("other") -> dropped) else top
    val root = new Node("total")
    stacks.foreach { case (frames, v) =>
      root.total += v
      var cur = root
      frames.foreach { f =>
        cur = cur.children.getOrElseUpdate(f, new Node(f))
        cur.total += v
      }
      cur.self += v
    }

    // fold threshold: keep at most maxNodes nodes by total, fold the
    // rest into per-parent "other" nodes (reference minValue rule)
    val minVal: Long =
      if (maxNodes <= 0) 0L
      else {
        val totals = mutable.ArrayBuffer.empty[Long]
        def collect(n: Node): Unit = { totals += n.total; n.children.values.foreach(collect) }
        collect(root)
        if (totals.size <= maxNodes) 0L
        else totals.sortBy(-_).apply(maxNodes - 1)
      }

    val names = mutable.ArrayBuffer.empty[String]
    val nameIndex = mutable.HashMap.empty[String, Int]
    def intern(n: String): Int = nameIndex.getOrElseUpdate(n, {
      names += (if (names.isEmpty) "total" else n); names.size - 1
    })
    val levels = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Long]]
    var maxSelf = 0L
    def walk(n: Node, level: Int, xOffset: Long): Unit = {
      if (n.self > maxSelf) maxSelf = n.self
      val idx = intern(n.name)
      if (level == levels.size) levels += mutable.ArrayBuffer.empty[Long]
      levels(level) ++= Seq(xOffset, n.total, n.self, idx.toLong)
      var childX = xOffset + n.self
      var otherTotal = 0L
      n.children.values.foreach { c =>
        if (minVal > 0 && c.total < minVal) otherTotal += c.total
        else { walk(c, level + 1, childX); childX += c.total }
      }
      if (otherTotal > 0) {
        val o = new Node("other"); o.total = otherTotal; o.self = otherTotal
        walk(o, level + 1, childX)
      }
    }
    walk(root, 0, 0L)
    // delta-encode x offsets against the end of the previous sibling
    levels.foreach { l =>
      var prev = 0L
      var i = 0
      while (i < l.size) {
        val abs = l(i)
        l(i) = abs - prev
        prev = abs + l(i + 1)
        i += 4
      }
    }

    val namesJson = names.map(graft.api.ApiEncoders.jsonString).mkString(",")
    val levelsJson = levels.map(_.mkString("[", ",", "]")).mkString(",")
    s"""{"version":1,"flamebearer":{"names":[$namesJson],"levels":[$levelsJson],""" +
      s""""numTicks":${root.total},"maxSelf":$maxSelf},""" +
      s""""metadata":{"format":"single","spyName":"graft","sampleRate":100,"units":"samples"}}"""
  }

  private final class DiffNode(val name: String) {
    var lTotal = 0L; var lSelf = 0L
    var rTotal = 0L; var rSelf = 0L
    val children = mutable.SortedMap.empty[String, DiffNode]
  }

  /** Pyroscope "double"-format diff flamebearer: baseline (left) and
    * comparison (right) selections merged into ONE tree, each level a
    * run of [xLeftΔ, leftTotal, leftSelf, xRightΔ, rightTotal,
    * rightSelf, nameIdx] septets with the two x offsets delta-encoded
    * per side (public flamebearer diff format). The reference declines
    * diffs outright (profilehandler/querier.go:33 "no representation
    * … diffs") — parity-plus here; the distributed part is the same
    * bounded per-stack merge as [[flamebearer]], run once per side.
    */
  def flamebearerDiff(profiles: DataFrame,
      leftQuery: String, rightQuery: String,
      leftFromUs: Option[Long] = None, leftUntilUs: Option[Long] = None,
      rightFromUs: Option[Long] = None, rightUntilUs: Option[Long] = None,
      maxStacks: Int = 1 << 16): String = {
    def stacksOf(q: String, f: Option[Long], u: Option[Long]) = {
      val (top, dropped) = mergedStacks(profiles, q, f, u, maxStacks)
      if (dropped > 0) top :+ (Seq("other") -> dropped) else top
    }
    val root = new DiffNode("total")
    def add(frames: Seq[String], v: Long, left: Boolean): Unit = {
      if (left) root.lTotal += v else root.rTotal += v
      var cur = root
      frames.foreach { f =>
        cur = cur.children.getOrElseUpdate(f, new DiffNode(f))
        if (left) cur.lTotal += v else cur.rTotal += v
      }
      if (left) cur.lSelf += v else cur.rSelf += v
    }
    stacksOf(leftQuery, leftFromUs, leftUntilUs)
      .foreach { case (fs, v) => add(fs, v, left = true) }
    stacksOf(rightQuery, rightFromUs, rightUntilUs)
      .foreach { case (fs, v) => add(fs, v, left = false) }

    val names = mutable.ArrayBuffer.empty[String]
    val nameIndex = mutable.HashMap.empty[String, Int]
    def intern(n: String): Int = nameIndex.getOrElseUpdate(n, {
      names += (if (names.isEmpty) "total" else n); names.size - 1
    })
    val levels = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Long]]
    var maxSelf = 0L
    def walk(n: DiffNode, level: Int, xL: Long, xR: Long): Unit = {
      maxSelf = math.max(maxSelf, math.max(n.lSelf, n.rSelf))
      val idx = intern(n.name)
      if (level == levels.size) levels += mutable.ArrayBuffer.empty[Long]
      levels(level) ++= Seq(xL, n.lTotal, n.lSelf, xR, n.rTotal, n.rSelf,
        idx.toLong)
      var cxL = xL + n.lSelf
      var cxR = xR + n.rSelf
      n.children.values.foreach { c =>
        walk(c, level + 1, cxL, cxR)
        cxL += c.lTotal; cxR += c.rTotal
      }
    }
    walk(root, 0, 0L, 0L)
    // delta-encode both x streams against the previous sibling's end
    levels.foreach { l =>
      var prevL = 0L
      var prevR = 0L
      var i = 0
      while (i < l.size) {
        val absL = l(i); val absR = l(i + 3)
        l(i) = absL - prevL; l(i + 3) = absR - prevR
        prevL = absL + l(i + 1); prevR = absR + l(i + 4)
        i += 7
      }
    }
    val namesJson = names.map(graft.api.ApiEncoders.jsonString).mkString(",")
    val levelsJson = levels.map(_.mkString("[", ",", "]")).mkString(",")
    s"""{"version":1,"flamebearer":{"names":[$namesJson],"levels":[$levelsJson],""" +
      s""""numTicks":${root.lTotal + root.rTotal},"maxSelf":$maxSelf},""" +
      s""""leftTicks":${root.lTotal},"rightTicks":${root.rTotal},""" +
      s""""metadata":{"format":"double","spyName":"graft","sampleRate":100,"units":"samples"}}"""
  }

  /** Distinct label names on matching profiles (Labels endpoint). */
  def labelNames(profiles: DataFrame): Seq[String] =
    profiles.select(explode(map_keys(col("labels"))).as("k"))
      .distinct().orderBy("k").collect().map(_.getString(0)).toSeq

  /** Distinct values of one label (LabelValues endpoint). */
  def labelValues(profiles: DataFrame, label: String): Seq[String] =
    profiles.select(element_at(col("labels"), label).as("v"))
      .filter(col("v").isNotNull)
      .distinct().orderBy("v").collect().map(_.getString(0)).toSeq

  /** Distinct profile names (GetApps endpoint). */
  def apps(profiles: DataFrame): Seq[String] =
    profiles.select(col("name")).distinct().orderBy("name")
      .collect().map(_.getString(0)).toSeq
}
