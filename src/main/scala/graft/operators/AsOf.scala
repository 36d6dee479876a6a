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
  * column names must be disjoint apart from the keys. */
object AsOf {

  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val valueCols = right.columns.toSeq.filterNot(c => keys.contains(c) || c == rightTime)
    val leftCols = left.columns.toSeq
    require(valueCols.intersect(leftCols).isEmpty,
      s"right value columns ${valueCols.mkString(",")} collide with left columns")
    val tag = "__graft_asof_tag"
    val t = "__graft_asof_time"
    val bundle = "__graft_asof_val"
    require(!(leftCols ++ valueCols).exists(c => c == tag || c == t || c == bundle),
      "input already has internal as-of columns")

    val bundleType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val l = left
      .withColumn(t, col(leftTime))
      .withColumn(tag, lit(1))
      .select((keys.map(col) :+ col(t) :+ col(tag)) ++
        leftCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(bundleType).as(bundle): _*)
    val r = right
      // a NULL rightTime can never satisfy rightTime <= leftTime (DuckDB
      // ASOF agrees); without this filter NULLS FIRST ordering would
      // carry such a row into every left row
      .filter(col(rightTime).isNotNull)
      .withColumn(t, col(rightTime))
      .withColumn(tag, lit(0))
      .select((keys.map(col) :+ col(t) :+ col(tag)) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(valueCols.map(col): _*).as(bundle): _*)

    // bundle as the last sort key: two right rows tied on (t, tag) order
    // by their value struct, so the carried row is deterministic under
    // shuffle/retry (left rows have a NULL bundle — their relative order
    // is irrelevant, each just reads the running last). Skipped for
    // unorderable value types (maps), where the uniqueness contract is
    // the only guarantee.
    val bundleOrderable = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(bundleType)
    val order = Seq(col(t).asc, col(tag).asc) ++
      (if (bundleOrderable) Seq(col(bundle).asc_nulls_first) else Nil)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(bundle, last(col(bundle), ignoreNulls = true).over(w))
      .filter(col(tag) === 1)
      .select((keys.map(col) ++ leftCols.filterNot(keys.contains).map(col)) ++
        valueCols.map(c => col(s"$bundle.$c").as(c)): _*)
  }
}
