package graft.schema

import org.apache.spark.sql.types._

/** Declared schemas for the full reference data model (SURVEY.md §1.4:
  * all 17 OLTP tables, columns per FIXTURES.md / the generator's INSERT
  * lists) plus the staging shapes. The engine's schema policy is FIXED
  * AND EAGER (SURVEY.md §1.3): sources are read against these
  * StructTypes and cast at the staging boundary — schema inference is a
  * dev-utility concern, never part of the engine.
  *
  * Type mapping: bigint→Long, int→Integer, numeric money→Decimal(18,2),
  * numeric rate→Decimal(10,6), date→Date, timestamp→Timestamp (UTC),
  * boolean→Boolean, text→String (SURVEY.md §1.2).
  */
object Schemas {

  private val Money = DecimalType(18, 2)
  private val Rate = DecimalType(10, 6)

  private def s(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = true) })

  // ------------------------------------------------------------- OLTP

  val borrower: StructType = s(
    "borrower_id" -> LongType, "full_name" -> StringType, "birth_date" -> DateType,
    "segment" -> StringType, "created_at" -> TimestampType)

  val application: StructType = s(
    "application_id" -> LongType, "borrower_id" -> LongType,
    "application_date" -> DateType, "channel" -> StringType,
    "requested_amount" -> Money, "status" -> StringType, "created_at" -> TimestampType)

  val loanContract: StructType = s(
    "loan_id" -> LongType, "borrower_id" -> LongType, "application_id" -> LongType,
    "product_type" -> StringType, "currency" -> StringType,
    "origination_date" -> DateType, "disbursement_date" -> DateType,
    "maturity_date" -> DateType, "principal_original" -> Money,
    "principal_current" -> Money, "term_months" -> IntegerType,
    "interest_rate_type" -> StringType, "interest_rate_current" -> Rate,
    "repayment_method" -> StringType, "payment_frequency" -> StringType,
    "grace_period_months" -> IntegerType, "status" -> StringType)

  val loanDisbursement: StructType = s(
    "disbursement_id" -> LongType, "loan_id" -> LongType,
    "disbursement_date" -> DateType, "amount" -> Money, "channel" -> StringType)

  val interestRateSchedule: StructType = s(
    "rate_schedule_id" -> LongType, "loan_id" -> LongType,
    "effective_from" -> DateType, "effective_to" -> DateType,
    "annual_rate" -> Rate, "rate_index" -> StringType, "margin" -> Rate)

  val repaymentSchedule: StructType = s(
    "schedule_id" -> LongType, "loan_id" -> LongType, "installment_no" -> IntegerType,
    "due_date" -> DateType, "principal_due" -> Money, "interest_due" -> Money,
    "fees_due" -> Money, "total_due" -> Money,
    "opening_balance" -> Money, "closing_balance" -> Money)

  val repaymentPayment: StructType = s(
    "payment_id" -> LongType, "loan_id" -> LongType, "payment_date" -> DateType,
    "value_date" -> DateType, "amount_received" -> Money, "currency" -> StringType,
    "payment_channel" -> StringType, "external_reference" -> StringType,
    "posted_flag" -> BooleanType, "created_at" -> TimestampType)

  val paymentAllocation: StructType = s(
    "allocation_id" -> LongType, "payment_id" -> LongType, "loan_id" -> LongType,
    "allocated_to" -> StringType, "amount_allocated" -> Money)

  val arrearsDpdStatus: StructType = s(
    "loan_id" -> LongType, "as_of_date" -> DateType, "days_past_due" -> IntegerType,
    "past_due_amount_total" -> Money, "past_due_principal" -> Money,
    "past_due_interest" -> Money, "past_due_fees" -> Money,
    "oldest_unpaid_due_date" -> DateType, "early_arrears_flag" -> BooleanType,
    "default_flag" -> BooleanType, "nonperforming_flag" -> BooleanType,
    "arrears_bucket" -> StringType)

  val feesAndCharges: StructType = s(
    "fee_id" -> LongType, "loan_id" -> LongType, "fee_type" -> StringType,
    "fee_date" -> DateType, "amount" -> Money, "capitalization_flag" -> BooleanType)

  val penaltyInterestEvents: StructType = s(
    "penalty_id" -> LongType, "loan_id" -> LongType, "event_date" -> DateType,
    "base_amount" -> Money, "penalty_rate" -> Rate, "days_late" -> IntegerType,
    "penalty_amount" -> Money)

  val directDebitMandate: StructType = s(
    "mandate_id" -> LongType, "borrower_id" -> LongType, "loan_id" -> LongType,
    "mandate_reference" -> StringType, "iban_masked" -> StringType,
    "status" -> StringType, "signed_date" -> DateType)

  val repaymentCollectionInstruction: StructType = s(
    "instruction_id" -> LongType, "loan_id" -> LongType, "mandate_id" -> LongType,
    "due_date" -> DateType, "amount" -> Money, "status" -> StringType,
    "return_reason" -> StringType)

  val forbearanceRestructureEvent: StructType = s(
    "event_id" -> LongType, "loan_id" -> LongType, "event_type" -> StringType,
    "event_date" -> DateType, "old_terms" -> StringType, "new_terms" -> StringType,
    "probation_flag" -> BooleanType)

  val collectionsCase: StructType = s(
    "case_id" -> LongType, "loan_id" -> LongType, "opened_date" -> DateType,
    "closed_date" -> DateType, "stage" -> StringType, "assigned_team" -> StringType,
    "recovery_expected_flag" -> BooleanType)

  val writeOffAndRecovery: StructType = s(
    "writeoff_id" -> LongType, "loan_id" -> LongType, "writeoff_date" -> DateType,
    "writeoff_amount_principal" -> Money, "writeoff_amount_interest" -> Money,
    "writeoff_amount_fees" -> Money, "recovery_date" -> DateType,
    "recovery_amount" -> Money)

  val auditDecisionAndOpsLog: StructType = s(
    "audit_id" -> LongType, "entity_type" -> StringType, "entity_id" -> LongType,
    "event" -> StringType, "event_timestamp" -> TimestampType, "actor" -> StringType)

  /** All 17 OLTP tables by reference name. */
  val oltp: Map[String, StructType] = Map(
    "borrower" -> borrower,
    "application" -> application,
    "loan_contract" -> loanContract,
    "loan_disbursement" -> loanDisbursement,
    "interest_rate_schedule" -> interestRateSchedule,
    "repayment_schedule" -> repaymentSchedule,
    "repayment_payment" -> repaymentPayment,
    "payment_allocation" -> paymentAllocation,
    "arrears_dpd_status" -> arrearsDpdStatus,
    "fees_and_charges" -> feesAndCharges,
    "penalty_interest_events" -> penaltyInterestEvents,
    "direct_debit_mandate" -> directDebitMandate,
    "repayment_collection_instruction" -> repaymentCollectionInstruction,
    "forbearance_restructure_event" -> forbearanceRestructureEvent,
    "collections_case" -> collectionsCase,
    "write_off_and_recovery" -> writeOffAndRecovery,
    "audit_decision_and_ops_log" -> auditDecisionAndOpsLog)
}
