package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.internal._

/** Percentile-cutoff portfolio assignment (decile sorts etc.).
  *
  * Reference: pd_utils/port.py:16-440. NOT ntile: buckets are bounded
  * by per-group percentile *values* (NumPy linear interpolation), not
  * equal row counts — they differ whenever ties straddle a cutoff.
  *
  * Boundary semantics (SURVEY §2.7 caveat): the per-group array path
  * takes the FIRST bucket with bot <= x <= top
  * (pd_utils/port.py:312-315) which equals
  * `1 + #{interior cutoffs strictly below x}`; the whole-frame/hard-
  * cutoff path overwrites low→high so an exact-boundary value lands in
  * the HIGHER bucket, i.e. `1 + #{interior cutoffs <= x}`, with
  * unmatched rows (outside [lo, hi]) left at 0
  * (pd_utils/port.py:263-268). Both are implemented faithfully.
  * NaN/±inf group values always map to portfolio 0.
  */
object Portfolio {

  private def badValue(x: Column): Column =
    x.isNull || isnan(x) || x === Double.PositiveInfinity || x === Double.NegativeInfinity

  /** percentiles 0, 1/n, ..., 1 for ngroups buckets. */
  def equalPercentiles(ngroups: Int): Seq[Double] =
    (0 to ngroups).map(_.toDouble / ngroups)

  /** Assign portfolio 1..n per row by bucketing `groupvar` between
    * per-group percentile cutoffs.
    *
    * @param cutoffs      hard cutoff values (whole-frame path; bounds
    *                     are extended by the global min/max like
    *                     pd_utils/port.py:77-83).
    * @param quantCutoffs explicit interior quantiles in (0,1).
    * @param cutDf        compute cutoffs on a different dataset with
    *                     1:1 matching by-groups (pd_utils/port.py:37-39).
    *
    * Scale: cutoffs are one exact-percentile aggregation per group
    * (single shuffle), broadcast-joined back; assignment is a codegen
    * when-chain — no per-group materialization.
    */
  def portfolio(
      df: DataFrame,
      groupvar: String,
      ngroups: Int = 10,
      byvars: Seq[String] = Nil,
      cutoffs: Seq[Double] = Nil,
      quantCutoffs: Seq[Double] = Nil,
      cutDf: Option[DataFrame] = None,
      portvar: String = "portfolio"
  ): DataFrame =
  {
    val (out, release) =
      portfolioWithCleanup(df, groupvar, ngroups, byvars, cutoffs, quantCutoffs, cutDf, portvar)
    graft.Cleanup.defer(release)
    out
  }

  /** [[portfolio]] plus the release handle for the exact-percentile
    * pipeline's internal persist ([[Percentiles.cutsWithCleanup]]) —
    * a no-op thunk on the hard-cutoff path. Call after the consuming
    * action.
    */
  def portfolioWithCleanup(
      df: DataFrame,
      groupvar: String,
      ngroups: Int = 10,
      byvars: Seq[String] = Nil,
      cutoffs: Seq[Double] = Nil,
      quantCutoffs: Seq[Double] = Nil,
      cutDf: Option[DataFrame] = None,
      portvar: String = "portfolio"
  ): (DataFrame, () => Unit) = {
    val x = col(groupvar)
    if (cutoffs.nonEmpty) {
      // hard-cutoff whole-frame path: extend with global min/max, then
      // last-match (higher bucket wins at boundary equality). The
      // min/max stay IN the plan as a broadcast-cross-joined scalar
      // aggregate — composing this operator triggers no Spark job.
      val src = cutDf.getOrElse(df)
      val mm = src.agg(min(x).cast("double").as("__mn__"), max(x).cast("double").as("__mx__"))
      val sorted = cutoffs.sorted
      val loB = least(col("__mn__"), lit(sorted.head))
      val hiB = greatest(col("__mx__"), lit(sorted.last))
      val count = sorted.map(c => (x >= lit(c)).cast("int")).reduce(_ + _)
      val port = when(badValue(x) || x < loB || x > hiB, lit(0))
        .otherwise(lit(1) + count)
      (df.crossJoin(broadcast(mm))
        .withColumn(portvar, port)
        .drop("__mn__", "__mx__"), () => ())
    } else {
      val ps: Seq[Double] =
        if (quantCutoffs.nonEmpty) (0.0 +: quantCutoffs.sorted) :+ 1.0
        else equalPercentiles(ngroups)
      val interiorPs = ps.drop(1).dropRight(1)
      val src = cutDf.getOrElse(df)
      // exact percentiles (NumPy linear interpolation parity — never
      // approx_percentile; goldens pin interpolated cut values).
      val clean = when(badValue(x), lit(null)).otherwise(x)
      if (byvars.nonEmpty) {
        // per-group path: FIRST match (lower bucket) on boundary ties,
        // replicating _portfolio_match (pd_utils/port.py:312-315).
        // Cuts via the distributed exact-percentile plan — bit-equal
        // to the builtin aggregate without its per-group value-map
        // buffer (Percentiles scaladoc).
        val (cuts, cleanup) =
          Percentiles.cutsWithCleanup(src, clean, byvars, interiorPs, "__cuts__")
        val joined = df.join(broadcast(cuts), byvars, "left")
        val count = interiorPs.indices
          .map(i => (x > element_at(col("__cuts__"), i + 1)).cast("int"))
          .reduceOption(_ + _)
          .getOrElse(lit(0))
        (joined
          .withColumn(portvar, when(badValue(x), lit(0)).otherwise(lit(1) + count))
          .drop("__cuts__"), cleanup)
      } else {
        // whole-frame path: _sort_into_ports overwrites low→high, so a
        // value equal to a shared boundary lands in the HIGHER bucket
        // (pd_utils/port.py:263-268) — hence >=, unlike the per-group
        // path above. Lazy scalar agg, broadcast back into the plan.
        val (cuts, cleanup) =
          Percentiles.cutsWithCleanup(src, clean, Nil, interiorPs, "__cuts__")
        val count = interiorPs.indices
          .map(i => (x >= element_at(col("__cuts__"), i + 1)).cast("int"))
          .reduceOption(_ + _)
          .getOrElse(lit(0))
        (df.crossJoin(broadcast(cuts))
          .withColumn(portvar, when(badValue(x), lit(0)).otherwise(lit(1) + count))
          .drop("__cuts__"), cleanup)
      }
    }
  }

  /** portfolio() then averages() within (byvars × portfolio)
    * (pd_utils/port.py:157-208). Returns the averages frame only —
    * the reference's `avgonly=True` form.
    */
  def portfolioAverages(
      df: DataFrame,
      groupvar: String,
      avgvars: Seq[String],
      ngroups: Int = 10,
      byvars: Seq[String] = Nil,
      cutDf: Option[DataFrame] = None,
      wtvar: Option[String] = None,
      count: Option[String] = None,
      portvar: String = "portfolio"
  ): DataFrame =
    portfolioAveragesWithDetail(df, groupvar, avgvars, ngroups, byvars, cutDf, wtvar, count, portvar)._1

  /** The reference's default return shape: (averages, the individual
    * observations with their portfolio assignments)
    * (pd_utils/port.py:203-208). Both frames share the single
    * portfolio-assignment plan, so Catalyst reuses the cutoff
    * aggregation if both are consumed.
    */
  def portfolioAveragesWithDetail(
      df: DataFrame,
      groupvar: String,
      avgvars: Seq[String],
      ngroups: Int = 10,
      byvars: Seq[String] = Nil,
      cutDf: Option[DataFrame] = None,
      wtvar: Option[String] = None,
      count: Option[String] = None,
      portvar: String = "portfolio"
  ): (DataFrame, DataFrame) = {
    val (avgs, ports, _) =
      portfolioAveragesDetailCleanup(df, groupvar, avgvars, ngroups, byvars, cutDf, wtvar, count, portvar)
    (avgs, ports)
  }

  /** [[portfolioAveragesWithDetail]] plus the [[portfolioWithCleanup]]
    * release handle for the exact-percentile persist.
    */
  def portfolioAveragesDetailCleanup(
      df: DataFrame,
      groupvar: String,
      avgvars: Seq[String],
      ngroups: Int = 10,
      byvars: Seq[String] = Nil,
      cutDf: Option[DataFrame] = None,
      wtvar: Option[String] = None,
      count: Option[String] = None,
      portvar: String = "portfolio"
  ): (DataFrame, DataFrame, () => Unit) = {
    val (ports, cleanup) =
      portfolioWithCleanup(df, groupvar, ngroups, byvars, cutDf = cutDf, portvar = portvar)
    val avgs = GroupOps.averages(ports, avgvars, byvars :+ portvar, wtvar, count)
    (avgs, ports, cleanup)
  }

  /** Long top portfolio minus short bottom portfolio, aligned on
    * byvars (pd_utils/port.py:211-260): equi self-join replaces the
    * reference's index alignment.
    *
    * CONTRACT: `df` must be the PRE-AGGREGATED portfolio-returns
    * frame — one row per (byvars, portfolio), i.e. the first element
    * of [[portfolioAverages]] — never row-level data. The global
    * max/min portfolio lookup below funnels the input through a
    * single-partition window (that is what makes the upstream plan
    * evaluate exactly once), which is O(|byvars| x ngroups) rows by
    * contract but would be a serial bottleneck on raw data. PlanSpec
    * pins that the driver query's window input is post-aggregation.
    */
  /** Rows the single-partition window may legally see — generous for
    * one task (the contract frame is |byvars-combos| x ngroups, i.e.
    * tens to thousands) but small enough that a raw row-level frame
    * at any real scale is rejected instead of silently serialized.
    */
  private val MaxLongShortInputRows = 1 << 20

  /** Plans whose top (below projections/filters/sorts/aliases) is an
    * aggregation or an in-memory literal relation satisfy the
    * pre-aggregated contract structurally — no job needed.
    */
  private def aggregatedTop(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    plan match {
      case p: Project       => aggregatedTop(p.child)
      case f: Filter        => aggregatedTop(f.child)
      case s: Sort          => aggregatedTop(s.child)
      case a: SubqueryAlias => aggregatedTop(a.child)
      case _: Aggregate     => true
      case _: LocalRelation => true
      case _                => false
    }
  }

  def longShortPortfolio(
      df: DataFrame,
      portvar: String,
      byvars: Seq[String],
      retvars: Seq[String],
      shortBottom: Boolean = true
  ): DataFrame = {
    // Runtime contract guard (VERDICT r4 #4 / r5 #3): the
    // single-partition window below is safe ONLY for the
    // pre-aggregated portfolio-returns frame. Structurally aggregated
    // (or provably small) plans pass with no extra work; anything
    // else (a checkpointed memo, an arbitrary caller frame) gets an
    // assert_true over count(*) ON THE SAME unpartitioned window
    // spec, so the check rides the window that is already being
    // computed — composition stays lazy (no build-time job), and a
    // caller who feeds raw row-level data fails loudly at execution
    // instead of silently serializing through one task.
    val analyzed = df.queryExecution.analyzed
    val structurallyOk = aggregatedTop(analyzed) ||
      analyzed.maxRows.exists(_ <= MaxLongShortInputRows)
    // Global max/min portfolio numbers come from an unpartitioned
    // window over the input, so the upstream plan is evaluated
    // exactly ONCE (the previous scalar-agg + crossJoin form ran it
    // twice — with a whole pipeline upstream that doubled the scan).
    // An empty-partition window funnels through a single task, which
    // is safe HERE by contract: like the reference's index alignment
    // (pd_utils/port.py:246-252), the input must have one row per
    // (byvars, portfolio) — an already-aggregated frame of
    // |byvars-combos| x ngroups rows, never the raw data.
    val wAll = Window.partitionBy()
    val base = df
      .withColumn("__mx__", max(col(portvar)).over(wAll))
      .withColumn("__mn__", min(col(portvar)).over(wAll))
    val withMM =
      if (structurallyOk) base
      else base
        .withColumn("__nrows__", count(lit(1)).over(wAll))
        .where(assert_true(
          col("__nrows__") <= lit(MaxLongShortInputRows.toLong),
          lit(s"longShortPortfolio input must be the pre-aggregated portfolio-returns frame " +
            s"(one row per (byvars, portfolio) — the first element of portfolioAveragesWithDetail); " +
            s"got a non-aggregated input larger than $MaxLongShortInputRows rows — " +
            s"aggregate it first (portfolioAverages) instead of passing row-level data")
        ).isNull)
        .drop("__nrows__")
    val (longSel, shortSel) =
      if (shortBottom) (col(portvar) === col("__mx__"), col(portvar) === col("__mn__"))
      else (col(portvar) === col("__mn__"), col(portvar) === col("__mx__"))
    val tagged = withMM
      .filter(longSel || shortSel)
      .withColumn("__is_long__", longSel)
    // pandas index alignment keeps a byvars group that has only one
    // side, with a null return (reference: long_df - short_df); the
    // conditional aggregation reproduces that exactly
    val aggs = retvars.map(c =>
      (max(when(col("__is_long__"), col(c))) - max(when(!col("__is_long__"), col(c)))).as(c))
    tagged
      .groupBy(toCols(byvars): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
