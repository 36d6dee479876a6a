package graft.dq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** dbt-test semantics (reference `models/staging/schema.yml:1-30`) as
  * violation probes: each check returns the COUNT of violating rows (0 =
  * pass), mirroring how `dbt test` fails on nonzero probe results.
  *
  *  - not_null  -> filter(col.isNull)
  *  - unique    -> groupBy(key).count.filter(count > 1)
  *  - relationships (FK) -> child left-anti-join parent
  *
  * Each probe is one scan + (for unique/FK) one shuffle on the tested
  * key — the same plan shape at any scale; the FK anti-join broadcasts
  * the parent when small and degrades to shuffle join otherwise.
  */
object Checks {

  def notNullViolations(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNull)

  def uniqueViolations(df: DataFrame, columns: Seq[String]): DataFrame =
    df.groupBy(columns.map(col): _*).count().filter(col("count") > 1)

  /** Rows of `child` whose `key` has no match in `parent` (FK orphans). */
  def relationshipViolations(child: DataFrame, parent: DataFrame, key: String): DataFrame =
    child.join(parent.select(col(key)).distinct(), Seq(key), "left_anti")

  /** dbt's fourth generic test (`accepted_values`, not used by the
    * reference's schema.yml but standard in the family): non-null values
    * of `column` outside the allowed list. NULLs pass — that's
    * not_null's job, matching dbt's separation of the two tests. */
  def acceptedValuesViolations(df: DataFrame, column: String,
      values: Seq[String]): DataFrame = {
    require(values.nonEmpty, "accepted_values needs a nonempty list")
    df.filter(col(column).isNotNull && !col(column).isin(values: _*))
  }

  def counted(name: String, df: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("violations")).select(lit(name).as("check_name"), col("violations"))

  /** The reference's declared test suite over the analog staging tables,
    * as one (check_name, violations) summary frame. */
  def suite(arrears: DataFrame, loans: DataFrame, payments: DataFrame): DataFrame =
    Seq(
      counted("loans_loan_id_not_null", notNullViolations(loans, "loan_id")),
      counted("loans_loan_id_unique", uniqueViolations(loans, Seq("loan_id"))),
      counted("arrears_loan_id_not_null", notNullViolations(arrears, "loan_id")),
      counted("arrears_as_of_date_not_null", notNullViolations(arrears, "as_of_date")),
      counted("arrears_loan_fk", relationshipViolations(arrears, loans, "loan_id")),
      counted("payments_loan_fk", relationshipViolations(payments, loans, "loan_id")),
      counted("payments_amount_not_null", notNullViolations(payments, "amount_received"))
    ).reduce(_.union(_))
}
