package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for pandas-compatible null/NaN key semantics.
  *
  * The reference library (pd-utils) inherits pandas groupby behavior:
  * NaN group keys are silently dropped from aggregation, so rows with a
  * missing key receive a NULL aggregate after merge-back — EXCEPT in
  * `transform` mode, where NaN keys are sentinel-filled and form their
  * own group (reference: pd_utils/merge.py:57-89). Spark `groupBy`
  * keeps null keys, so the agg path must mask them explicitly.
  */
package object internal {

  /** True iff the column value is "missing" in the pandas sense:
    * NULL, or NaN for floating-point columns.
    */
  def isMissing(df: DataFrame, c: String): Column = {
    df.schema(c).dataType match {
      case DoubleType | FloatType => col(c).isNull || isnan(col(c))
      case _                      => col(c).isNull
    }
  }

  /** True iff any of the given key columns is missing. */
  def anyMissing(df: DataFrame, keys: Seq[String]): Column =
    keys.map(k => isMissing(df, k)).reduce(_ || _)

  /** Drop rows whose group keys contain a missing value (pandas
    * groupby-agg semantics).
    */
  def dropMissingKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.where(!anyMissing(df, keys))

  def toCols(names: Seq[String]): Seq[Column] = names.map(col)
}
