package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's dedup-compute-expand optimization as a public
  * operator (pd_utils/merge.py:157-191, apply_func_to_unique_and_merge):
  * apply an expensive function once per DISTINCT value of a column,
  * then expand back to the original shape.
  *
  * Spark-first shape: distinct → compute → broadcast left join. With
  * codegen'd expressions this is rarely needed (the reference uses it
  * for to_datetime parsing), but for genuinely expensive functions
  * (UDF model calls, heavyweight parsing) it turns O(rows) work into
  * O(distinct values) with a broadcast join back — the classic
  * pattern at any scale, since the distinct side is small by premise.
  */
object Merge {

  /** @param f computed once per distinct `inCol` value; result
    *          attached to every row as `outCol`.
    *
    * Null keys match like pandas merge (NaN joins NaN), via null-safe
    * equality.
    */
  def applyFuncToUniqueAndMerge(
      df: DataFrame,
      inCol: String,
      f: Column => Column,
      outCol: String
  ): DataFrame = {
    val mapped = df
      .select(col(inCol))
      .distinct()
      .select(col(inCol).as("__in__"), f(col(inCol)).as(outCol))
    df.join(broadcast(mapped), df(inCol) <=> mapped("__in__"), "left")
      .drop("__in__")
  }
}
