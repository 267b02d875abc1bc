package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL-over-DataFrames and condition-filter surface.
  *
  * Reference: pd_utils/query.py. The reference runs queries through
  * pandasql/SQLite with frames bound positionally to the table names
  * regex-extracted from the query text (pd_utils/query.py:62-87);
  * here the same binding contract front-ends `spark.sql` (a strict
  * superset of the SQLite subset the reference exercises). No dtype
  * restoration needed — Spark SQL preserves types.
  */
object Query {

  private val tableRe = "(?i)(?:\\bfrom\\b|\\bjoin\\b)\\s+([A-Za-z_][A-Za-z0-9_]*)".r

  /** Table names referenced in FROM/JOIN clauses, first-seen order,
    * deduplicated (pd_utils/query.py:80-87).
    */
  def extractTableNames(query: String): Seq[String] =
    tableRe.findAllMatchIn(query).map(_.group(1)).toSeq.distinct

  /** Binds `dfs` positionally to the extracted table names and runs
    * the query (pd_utils/query.py:44-77).
    */
  def sql(dfs: Seq[DataFrame], query: String): DataFrame = {
    require(dfs.nonEmpty, "need at least one DataFrame")
    val names = extractTableNames(query)
    require(
      names.size == dfs.size,
      s"query references ${names.size} tables but ${dfs.size} DataFrames passed"
    )
    val spark = dfs.head.sparkSession
    dfs.zip(names).foreach { case (df, n) => df.createOrReplaceTempView(n) }
    // spark.sql analyzes eagerly, so the resolved plan no longer needs
    // the views — drop them to avoid leaking stale bindings into later
    // calls (the reference binds per-call via locals()).
    val out = spark.sql(query)
    names.take(dfs.size).foreach(spark.catalog.dropTempView)
    out
  }

  /** Keeps rows where `col <condition>` holds for ANY ("or") or ALL
    * ("and") of the given columns (pd_utils/query.py:8-41). Conditions
    * are SQL fragments like "== 1" or "> 0.05"; backtick quoting
    * replaces the reference's identifier sanitization.
    */
  def selectRowsByConditionOnColumns(
      df: DataFrame,
      cols: Seq[String],
      condition: String = "== 1",
      logic: String = "or"
  ): DataFrame = {
    val preds = cols.map(c => expr(s"`$c` $condition"))
    val combined = logic.toLowerCase match {
      case "or"  => preds.reduce(_ || _)
      case "and" => preds.reduce(_ && _)
      case other => throw new IllegalArgumentException(s"logic must be and/or, got '$other'")
    }
    df.filter(combined)
  }
}
