package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.KmvDistinct

/** One-pass table profiling — the "look before you pipeline" summary a
  * warehouse runs ahead of every backfill (dbt's `analyze` habit, the
  * reference's pre-load sanity checks): per column, the row count, null
  * count, a distinct-cardinality estimate, and min/max.
  *
  * The 100 TB discipline is in the aggregate choice: ALL metrics for ALL
  * columns compute in ONE partial+final aggregation pass — counts and
  * min/max are trivially partial-aggregable, and the distinct estimate is
  * the [[KmvDistinct]] sketch (bounded ≤k-longs state) instead of
  * `countDistinct`, because N exact distincts in one agg make Catalyst
  * Expand every input row N ways (an N× scan blow-up), and a per-column
  * pass is N scans. One narrow scan, one single-partition exchange of a
  * few hundred bytes, deterministic output — so the whole profile, the
  * estimates included, hash-checks against a SQL oracle.
  *
  * Strings hash into KMV space through [[graft.ext.MinHash.stringHash]]
  * (the engine-agnostic char sum the near-dup family already proves);
  * numerics through [[KmvDistinct.hashColumn]] (an empty string hashes
  * to the 0-slot rather than NULL, so '' still counts as a distinct
  * value — only true NULLs are excluded). Min/max aggregate on the
  * NATIVE column type and cast to string AFTERWARDS, so numerics report
  * their true extremes (a pre-cast min would rank "1000" < "9") while
  * every column lands in one uniform (col_name, n_rows, n_nulls,
  * distinct_est, min_str, max_str) schema.
  */
object Profile {

  /** Profile `numericCols` ++ `stringCols` of `df` in one aggregation
    * pass; one output row per column, input order preserved. */
  def profile(df: DataFrame, numericCols: Seq[String], stringCols: Seq[String],
      k: Int = 64): DataFrame = {
    require(numericCols.nonEmpty || stringCols.nonEmpty, "no columns to profile")
    // names are interpolated into the stack() expression string — reject
    // anything that isn't a plain identifier rather than mis-parse it
    (numericCols ++ stringCols).foreach(c =>
      require(c.matches("[A-Za-z_][A-Za-z0-9_]*"), s"unsupported column name '$c'"))
    require((numericCols ++ stringCols).distinct.size == numericCols.size + stringCols.size,
      s"duplicate profiled column in ${numericCols ++ stringCols}")
    val hashed: Seq[(String, Column)] =
      numericCols.map(c => c -> KmvDistinct.hashColumn(col(c))) ++
        stringCols.map { c =>
          // stringHash('') is NULL (empty char array) — coalesce it to the
          // 0-slot so '' counts as a value; true NULLs stay NULL (skipped)
          c -> when(col(c).isNull, lit(null).cast("long"))
            .otherwise(KmvDistinct.hashColumn(
              coalesce(graft.ext.MinHash.stringHash(col(c)), lit(0L))))
        }
    val aggExprs: Seq[Column] =
      count(lit(1L)).as("n_rows") +: hashed.flatMap { case (name, h) => Seq(
        count(col(name)).as(s"nn_$name"),
        KmvDistinct.kmv(h, k).as(s"kmv_$name"),
        min(col(name)).cast("string").as(s"mn_$name"),
        max(col(name)).cast("string").as(s"mx_$name"))
      }
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val stackArgs = hashed.map { case (name, _) =>
      s"'$name', nn_$name, kmv_$name, mn_$name, mx_$name" }.mkString(", ")
    one.selectExpr("n_rows",
        s"stack(${hashed.size}, $stackArgs) AS (col_name, n_nonnull, distinct_est, min_str, max_str)")
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_nulls"),
        col("distinct_est"), col("min_str"), col("max_str"))
  }

  /** Most-frequent values per column — the profiler's companion report
    * (top-k values with counts, the "what's actually in this column"
    * view). NOT one `groupBy` per column (N scans) and NOT a rank
    * window (shuffles+sorts every distinct value): ONE narrow per-row
    * explode into (col_name, value) pairs, ONE keyed count whose
    * partial aggregation collapses the stream to the distinct-value
    * cardinality before the exchange, then the custom
    * [[org.apache.spark.sql.graft.TopKPerGroup]] operator prunes to k
    * per column with map-side bounded heaps BELOW its exchange. NULLs
    * are excluded ([[profile]] already counts them); ties break by
    * value, so the report is deterministic and oracle-checkable. */
  def topValues(df: DataFrame, cols: Seq[String], k: Int = 5): DataFrame = {
    require(cols.nonEmpty, "no columns to report")
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("value"))): _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.value").as("value"))
      .filter(col("value").isNotNull)
    val counted = pairs.groupBy(col("col_name"), col("value"))
      .agg(count(lit(1L)).as("cnt"))
    org.apache.spark.sql.graft.TopKPerGroup.topK(counted,
      Seq(col("col_name")), Seq(col("cnt").desc, col("value").asc), k)
  }
}
