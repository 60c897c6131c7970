package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (time-series point-in-time lookup): for each left row, the
  * most recent right row with rightTime <= leftTime (within an optional
  * tolerance), per key.
  *
  * Spark has no built-in as-of join (SURVEY.md §2.B). Two compositions:
  *
  *   - `asOf`: the union + last(ignoreNulls) trick — one shuffle on
  *     (key), one partition-local sort over the merged timeline, no join
  *     at all. Scales like a sort-merge join but touches each input once;
  *     right rows with equal timestamps resolve to the LATEST (ordered by
  *     time, side marker, seq).
  *   - `asOfRange`: plain range-join composition (join on key + time
  *     inequality, keep max right time per left row) — simpler plan,
  *     quadratic within key×tolerance windows; fine when the right side
  *     or the tolerance window is small.
  */
object AsOfJoin {

  /** Name equality under the session's spark.sql.caseSensitive (default
    * false) — so all three as-of forms classify key/time/payload columns
    * exactly the way `col(...)` will later resolve them. */
  private def nameMatcher(df: DataFrame): (String, String) => Boolean = {
    val cs = df.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean
    (a, b) => if (cs) a == b else a.equalsIgnoreCase(b)
  }

  /** Right-side payload column names, with the collision guard every
    * form applies identically. */
  private def payloadColumns(left: DataFrame, right: DataFrame, key: String,
                             rightTime: String, what: String): Seq[String] = {
    val same = nameMatcher(left)
    val payload = right.columns.toSeq.filterNot(c => same(c, key) || same(c, rightTime))
    val overlap = payload.filter(p => left.columns.exists(same(_, p)))
    require(overlap.isEmpty,
      s"$what: right payload columns collide with left columns: $overlap — rename before joining")
    payload
  }

  /** Union-timeline as-of join.
    * @param left      probe side; columns are preserved
    * @param right     reference side; its non-key/non-time columns are
    *                  appended (null when nothing is at-or-before)
    * @param key       equi-key column name present on both sides
    * @param leftTime  event-time column on left
    * @param rightTime event-time column on right
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String): DataFrame = {
    val same = nameMatcher(left)
    val payload = payloadColumns(left, right, key, rightTime, "asOf")
    // The right payload travels as ONE nullable struct (null on left-side
    // rows): last(ignoreNulls) then picks the latest right row atomically.
    // Filling columns independently would splice values from different
    // right rows whenever the latest row has a null field.
    val payloadStruct = struct(payload.map(col): _*)
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_p", lit(null).cast(
        org.apache.spark.sql.types.StructType(payload.map(c => right.schema(c)))))
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_p", payloadStruct)
      .withColumns(left.columns.toSeq.filterNot(c => same(c, key))
        .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)

    val cols = Seq(key, "_t", "_side", "_p") ++ left.columns.toSeq.filterNot(same(_, key))
    val merged = l.select(cols.map(col): _*).unionByName(r.select(cols.map(col): _*))

    // right rows sort before left rows at equal time (side 0 < 1), so a
    // left row sees a right row stamped at exactly its own time. Among
    // right rows tied on (key, time), the payload struct breaks the tie
    // deterministically (identical structs are value-identical anyway).
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t").asc, col("_side").asc, col("_p").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = merged.withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
    filled.filter(col("_side") === 1)
      .select((left.columns.toSeq.map(col) ++
        payload.map(c => col(s"_p.$c").as(c))): _*)
  }

  /** Native-exec as-of join: same semantics as [[asOf]] (asserted
    * row-identical in JoinsSpec) through graft's own Catalyst operator —
    * [[graft.plans.AsOfJoinNode]] planned by
    * [[graft.plans.AsOfJoinStrategy]] (a GraftSession registers it; any
    * session can via spark.sql.extensions=...GraftExtensions) into a
    * merge-scan [[graft.plans.AsOfJoinExec]]: hash-cluster + sort both
    * sides, then one O(|L|+|R|) forward pass per partition. No timeline
    * union and no window state — at scale this is a sort-merge join's
    * exchange with strictly less post-shuffle work. */
  def asOfNative(left: DataFrame, right: DataFrame, key: String,
                 leftTime: String, rightTime: String): DataFrame =
    asOfNativeImpl(left, right, key, leftTime, rightTime, None)

  /** Native exec with bounded lookback: latest right row in
    * [leftTime - tolerance, leftTime] — [[asOfRange]]'s semantics on
    * non-null keys (asserted identical in JoinsSpec, including a
    * randomized cross-check) at merge-scan cost: the range-join
    * composition expands every key×window candidate before its window
    * picks one winner per left row; this stays O(|L|+|R|) with O(1)
    * state, checking the single buffered match against the floor.
    * NULL KEYS follow the native/window discipline (null matches null,
    * like [[asOf]] and the no-tolerance native form — asserted in
    * JoinsSpec) where asOfRange's SQL join drops them; the composed
    * pair asOf/asOfRange already disagree the same way. */
  def asOfNative(left: DataFrame, right: DataFrame, key: String,
                 leftTime: String, rightTime: String, tolerance: Column): DataFrame =
    asOfNativeImpl(left, right, key, leftTime, rightTime, Some(tolerance))

  private def asOfNativeImpl(left: DataFrame, right: DataFrame, key: String,
                             leftTime: String, rightTime: String,
                             tolerance: Option[Column]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
    // resolve like the DataFrame APIs do: honor spark.sql.caseSensitive
    // (default false, via the shared nameMatcher every as-of form uses),
    // and reject ambiguity rather than picking a winner
    val sameName = nameMatcher(left)
    val payloadNames = payloadColumns(left, right, key, rightTime, "asOfNative")
    // the tolerance floor is computed as a LEFT-side column BEFORE the
    // plan is captured, so the analyzer owns the datetime arithmetic
    // (timestamp - interval etc.); the node excludes it from the output
    val boundName = "_graft_asof_lo"
    val lDf = tolerance match {
      case Some(tol) =>
        // withColumn would silently REPLACE a same-named user column and
        // the node would then drop it from the output — refuse instead
        require(!left.columns.exists(sameName(_, boundName)),
          s"asOfNative: left side already has a column named '$boundName' " +
            "(reserved for the internal tolerance bound) — rename it")
        left.withColumn(boundName, col(leftTime) - tol)
      case None => left
    }
    val lPlan = lDf.queryExecution.analyzed
    // fresh exprIds on the right so self-as-of joins don't alias — the
    // analyzer's DeduplicateRelations does this for Join nodes; we build
    // the node post-analysis, so we do it ourselves
    val rBase = right.queryExecution.analyzed
    val rPlan = Project(rBase.output.map(a => Alias(a, a.name)()), rBase)
    def attr(plan: LogicalPlan, name: String, side: String) = {
      val hits = plan.output.filter(a => sameName(a.name, name))
      require(hits.size <= 1,
        s"asOfNative: column '$name' is ambiguous on $side side: ${hits.map(_.name)}")
      hits.headOption.getOrElse(
        throw new IllegalArgumentException(s"asOfNative: no column '$name' on $side side"))
    }
    val lk = attr(lPlan, key, "left"); val lt = attr(lPlan, leftTime, "left")
    val rk = attr(rPlan, key, "right"); val rt = attr(rPlan, rightTime, "right")
    require(lk.dataType == rk.dataType,
      s"asOfNative: key type mismatch: ${lk.dataType.sql} vs ${rk.dataType.sql}")
    require(lt.dataType == rt.dataType,
      s"asOfNative: time type mismatch: ${lt.dataType.sql} vs ${rt.dataType.sql}")
    val payload = payloadNames.map(attr(rPlan, _, "right"))
    val lo = tolerance.map { _ =>
      val b = attr(lPlan, boundName, "left")
      require(b.dataType == lt.dataType,
        s"asOfNative: tolerance floor type ${b.dataType.sql} != time type ${lt.dataType.sql}")
      b
    }
    org.apache.spark.sql.graft.bridge.dataFrame(left.sparkSession,
      graft.plans.AsOfJoinNode(lPlan, rPlan, lk, rk, lt, rt, payload, lo))
  }

  /** FORWARD as-of join: for each left row, the EARLIEST right row with
    * rightTime >= leftTime per key — the "next reading after the event"
    * lookup (DuckDB/pandas call this direction 'forward'). Composed by
    * running [[asOf]] over NEGATED timelines: negation reverses the
    * time order, so backward-latest becomes forward-earliest, and every
    * property the backward form carries (single shuffle, atomic payload
    * struct, equal-time inclusivity, deterministic ties) transfers
    * unchanged. Timestamps negate through unix_micros; numerics negate
    * arithmetically. The matched right time rides along as payload
    * (`rightTime` stays a visible output column). */
  def asOfForward(left: DataFrame, right: DataFrame, key: String,
                  leftTime: String, rightTime: String): DataFrame = {
    val same = nameMatcher(left)
    require(!(left.columns ++ right.columns).exists(same(_, "_fwd_t")),
      "asOfForward: column _fwd_t is reserved — rename it")
    // resolve the time columns the way every other as-of form does
    // (per spark.sql.caseSensitive), not by exact schema lookup
    def negated(df: DataFrame, c: String): Column = {
      val field = df.schema.fields.find(f => same(f.name, c)).getOrElse(
        throw new IllegalArgumentException(
          s"asOfForward: no column $c in [${df.columns.mkString(", ")}]"))
      field.dataType match {
        case org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType => -unix_micros(col(field.name))
        case _: org.apache.spark.sql.types.NumericType => -col(field.name)
        case t => throw new IllegalArgumentException(
          s"asOfForward: unsupported time type ${t.sql} for $c")
      }
    }
    // the original right time column is EXCLUDED, exactly as the
    // backward form excludes its rightTime — so the two directions
    // accept the same input shapes (same-name time columns included)
    asOf(left.withColumn("_fwd_t", negated(left, leftTime)),
        right.withColumn("_fwd_t", negated(right, rightTime))
          .drop(right.columns.filter(same(_, rightTime)): _*),
        key, "_fwd_t", "_fwd_t")
      .drop("_fwd_t")
  }

  /** Range-join composition with tolerance: latest right row in
    * [leftTime - tolerance, leftTime]. */
  def asOfRange(left: DataFrame, right: DataFrame, key: String,
                leftTime: String, rightTime: String,
                tolerance: Column): DataFrame = {
    val payload = payloadColumns(left, right, key, rightTime, "asOfRange")
    // unique row tag so identical left rows keep their multiplicity
    // (partitioning by the left columns alone would merge them)
    val tagged = left.withColumn("_lrow", monotonically_increasing_id())
    val lt = col("l." + leftTime)
    val rt = col("r." + rightTime)
    val joined = tagged.alias("l").join(right.alias("r"),
      col("l." + key) === col("r." + key) && rt <= lt && rt >= lt - tolerance,
      "left")
    // deterministic among right rows tied on time: the LARGEST payload
    // wins (descending, null fields smallest) — the same winner asOf's
    // last() over _p ascending-nulls-first picks, so the two forms agree
    // on tied inputs (asserted in JoinsSpec).
    val rightPayload = payload.map(c => col("r." + c).desc_nulls_last)
    val w = Window
      .partitionBy(col("l._lrow"))
      .orderBy(rt.desc_nulls_last +: rightPayload: _*)
    joined.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_lrow")
      .drop(col("r." + key))
  }
}
