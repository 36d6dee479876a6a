package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single latest right row whose
  * `rightTime <= leftTime` within the same key (SCD-2 lookup: "the rate
  * effective at this due date", reference `interest_rate_schedule` →
  * installment semantics).
  *
  * Spark has no as-of operator, and expressing it as a range join
  * (`ON l.key = r.key AND l.t >= r.from AND l.t < r.to`) plans as a
  * nested-loop per key group — quadratic in rows-per-key, a scale
  * killer on a billion-installment fact. This is the preference-(a)
  * composition instead (SURVEY.md §2 custom-operator ladder): UNION the
  * two inputs tagged by side, one window partitioned by key ordered by
  * (time, side-tag), and a running `last(value, ignoreNulls)` carries
  * the most recent right value forward into each left row. ONE shuffle
  * on the key, linear work, AQE-skew-splittable — the same plan shape
  * at any scale.
  *
  * The right row's value columns travel as ONE struct, not per-column
  * `last` calls: the struct is non-null for every right row even when
  * individual fields are null, so the join carries the matched row
  * ATOMICALLY — per-column ignoreNulls would skip a null field and
  * resurrect it from an OLDER row, fabricating a row that never
  * existed.
  *
  * Tie semantics: a right row at exactly `leftTime` wins (inclusive
  * `<=`), because the right tag sorts before the left tag at equal
  * time. Duplicate right timestamps within a key are made DETERMINISTIC
  * by a final sort key on the value bundle itself (the largest bundle
  * under struct ordering wins) whenever the value types are orderable —
  * engines with an arbitrary-tie ASOF (DuckDB) may pick a different
  * survivor, so keeping (key, rightTime) unique is still the contract
  * for cross-engine reproducibility; this tiebreaker only pins THIS
  * implementation's choice across runs/retries. Left rows before any
  * right row get NULL values (left-join semantics). Left and right
  * column names must be disjoint apart from the keys.
  *
  * [[asOfJoinForward]] is the pandas-merge_asof `direction='forward'`
  * twin — EARLIEST right row at/after the left time — with an optional
  * match `tolerance`: the same one-shuffle union+window shape with the
  * time ordering reversed, and (when a tolerance is given) the carried
  * right time checked against the horizon, out-of-tolerance matches
  * nulled atomically (the whole bundle, never per column). */
object AsOf {

  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame =
    asOfImpl(left, right, keys, leftTime, rightTime, forward = false, tolerance = None)

  /** Forward as-of: for each left row, the EARLIEST right row with
    * `rightTime >= leftTime` in the key, optionally only when
    * `rightTime - leftTime <= tolerance` (numeric time columns; the
    * tolerance is in the column's own units). */
  def asOfJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, tolerance: Option[Long] = None): DataFrame =
    asOfImpl(left, right, keys, leftTime, rightTime, forward = true, tolerance)

  private def asOfImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, forward: Boolean,
      tolerance: Option[Long]): DataFrame = {
    val valueCols = right.columns.toSeq.filterNot(c => keys.contains(c) || c == rightTime)
    val leftCols = left.columns.toSeq
    require(valueCols.intersect(leftCols).isEmpty,
      s"right value columns ${valueCols.mkString(",")} collide with left columns")
    val tag = "__graft_asof_tag"
    val t = "__graft_asof_time"
    val bundle = "__graft_asof_val"
    val rt = "__graft_asof_rt"
    require(!(leftCols ++ valueCols).exists(c => c == tag || c == t || c == bundle || c == rt),
      "input already has internal as-of columns")
    tolerance.foreach { tol =>
      require(tol >= 0, s"tolerance must be nonnegative, got $tol")
      require(right.schema(rightTime).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"tolerance needs a numeric time column, $rightTime is ${right.schema(rightTime).dataType}")
    }

    // the matched right TIME always travels with the bundle: the
    // tolerance check must read the time of the row actually carried,
    // not re-derive it
    val bundleFields = valueCols.map(c =>
      org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)) :+
      org.apache.spark.sql.types.StructField(rt, right.schema(rightTime).dataType)
    val bundleType = org.apache.spark.sql.types.StructType(bundleFields)
    val l = left
      .withColumn(t, col(leftTime))
      .withColumn(tag, lit(1))
      .select((keys.map(col) :+ col(t) :+ col(tag)) ++
        leftCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(bundleType).as(bundle): _*)
    val r = right
      // a NULL rightTime can never satisfy the as-of inequality (DuckDB
      // ASOF agrees); without this filter NULLS FIRST ordering would
      // carry such a row into every left row
      .filter(col(rightTime).isNotNull)
      .withColumn(t, col(rightTime))
      .withColumn(tag, lit(0))
      .select((keys.map(col) :+ col(t) :+ col(tag)) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(valueCols.map(col) :+ col(rightTime).as(rt): _*).as(bundle): _*)

    // bundle as the last sort key: two right rows tied on (t, tag) order
    // by their value struct, so the carried row is deterministic under
    // shuffle/retry (left rows have a NULL bundle — their relative order
    // is irrelevant, each just reads the running last). Skipped for
    // unorderable value types (maps), where the uniqueness contract is
    // the only guarantee.
    val bundleOrderable = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(bundleType)
    // forward direction reverses ONLY the time ordering: the running
    // last() then carries the nearest FUTURE right row; the right tag
    // still sorts before the left tag at equal time, so >= stays
    // inclusive
    val timeOrd = if (forward) col(t).desc else col(t).asc
    val order = Seq(timeOrd, col(tag).asc) ++
      (if (bundleOrderable) Seq(col(bundle).asc_nulls_first) else Nil)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn(bundle, last(col(bundle), ignoreNulls = true).over(w))
      .filter(col(tag) === 1)
    val gated = tolerance.fold(carried) { tol =>
      // out-of-horizon match -> the WHOLE bundle nulls (atomic row
      // semantics, same reason the bundle exists at all)
      val within = (col(s"$bundle.$rt") - col(t)) <= tol
      carried.withColumn(bundle, when(within, col(bundle)))
    }
    gated.select((keys.map(col) ++ leftCols.filterNot(keys.contains).map(col)) ++
      valueCols.map(c => col(s"$bundle.$c").as(c)): _*)
  }
}
