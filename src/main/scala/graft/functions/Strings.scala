package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** String scalar helpers (pd_utils/transform.py:295-387). */
object Strings {

  /** US state name ↔ 2-letter abbreviation (the reference's 50-entry
    * literal dict, pd_utils/transform.py:295-364). Unmatched values
    * pass through. Implemented as a literal map lookup + coalesce —
    * codegen'd, no join.
    */
  val stateToAbbrev: Map[String, String] = Map(
    "Alabama" -> "AL", "Alaska" -> "AK", "Arizona" -> "AZ", "Arkansas" -> "AR",
    "California" -> "CA", "Colorado" -> "CO", "Connecticut" -> "CT",
    "Delaware" -> "DE", "Florida" -> "FL", "Georgia" -> "GA", "Hawaii" -> "HI",
    "Idaho" -> "ID", "Illinois" -> "IL", "Indiana" -> "IN", "Iowa" -> "IA",
    "Kansas" -> "KS", "Kentucky" -> "KY", "Louisiana" -> "LA", "Maine" -> "ME",
    "Maryland" -> "MD", "Massachusetts" -> "MA", "Michigan" -> "MI",
    "Minnesota" -> "MN", "Mississippi" -> "MS", "Missouri" -> "MO",
    "Montana" -> "MT", "Nebraska" -> "NE", "Nevada" -> "NV",
    "New Hampshire" -> "NH", "New Jersey" -> "NJ", "New Mexico" -> "NM",
    "New York" -> "NY", "North Carolina" -> "NC", "North Dakota" -> "ND",
    "Ohio" -> "OH", "Oklahoma" -> "OK", "Oregon" -> "OR",
    "Pennsylvania" -> "PA", "Rhode Island" -> "RI", "South Carolina" -> "SC",
    "South Dakota" -> "SD", "Tennessee" -> "TN", "Texas" -> "TX",
    "Utah" -> "UT", "Vermont" -> "VT", "Virginia" -> "VA",
    "Washington" -> "WA", "West Virginia" -> "WV", "Wisconsin" -> "WI",
    "Wyoming" -> "WY"
  )

  private def litMap(m: Map[String, String]): Column =
    map(m.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  /** Maps `col` between state names and abbreviations; `toAbbrev=true`
    * maps full name → abbreviation, false the reverse.
    */
  def stateAbbrev(df: DataFrame, colName: String, toAbbrev: Boolean = true): DataFrame = {
    val m = if (toAbbrev) stateToAbbrev else stateToAbbrev.map(_.swap)
    df.withColumn(colName, coalesce(element_at(litMap(m), col(colName)), col(colName)))
  }

  /** Concatenates stringified columns with `_`
    * (pd_utils/transform.py:367-387). */
  def joinColStrings(df: DataFrame, cols: Seq[String], outCol: String = "joined"): DataFrame =
    df.withColumn(outCol, concat_ws("_", cols.map(c => col(c).cast("string")): _*))
}
