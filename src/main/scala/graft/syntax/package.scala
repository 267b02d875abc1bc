package graft

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators._
import graft.functions.{Dates, Strings}

/** Fluent extension-method surface (SURVEY §7.0): every operator as
  * `df.someOp(...)`, mirroring how the reference reads at call sites
  * (`pd_utils.groupby_merge(df, ...)` -> `df.groupbyMerge(...)`).
  * Import `graft.syntax._` to enable.
  */
package object syntax {

  implicit class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {

    // --- group ops (§2.4, §2.5) ----------------------------------
    def groupbyMerge(byvars: Seq[String], funcStr: String, subset: Seq[String] = Nil,
        replace: Boolean = false): DataFrame =
      GroupOps.groupbyMerge(df, byvars, funcStr, subset, replace)

    def groupbyTransform(byvars: Seq[String], subset: Seq[String],
        f: (Column, org.apache.spark.sql.expressions.WindowSpec) => Column,
        suffix: String = "transform", replace: Boolean = false): DataFrame =
      GroupOps.groupbyTransform(df, byvars, subset, f, suffix, replace)

    def groupbyIndex(byvars: Seq[String], sortvars: Seq[String] = Nil,
        ascending: Boolean = true): DataFrame =
      GroupOps.groupbyIndex(df, byvars, sortvars, ascending)

    def averages(avgvars: Seq[String], byvars: Seq[String], wtvar: Option[String] = None,
        count: Option[String] = None): DataFrame =
      GroupOps.averages(df, avgvars, byvars, wtvar, count)

    def varChangeByGroups(vars: Seq[String], byvars: Seq[String], datevar: String,
        numlags: Int = 1, tiebreakCols: Seq[String] = Nil): DataFrame =
      GroupOps.varChangeByGroups(df, vars, byvars, datevar, numlags, tiebreakCols)

    // --- cumulate / winsorize / portfolio (§2.5, §2.7) -----------
    def cumulate(cumvars: Seq[String], method: String, periodvar: String,
        byvars: Seq[String], time: Seq[Int] = Nil, grossify: Boolean = false,
        replace: Boolean = false): DataFrame =
      Cumulate.cumulate(df, cumvars, method, periodvar, byvars, time, grossify, replace)

    def winsorize(pct: (Double, Double), subset: Seq[String] = Nil,
        byvars: Seq[String] = Nil, bot: Boolean = true, top: Boolean = true): DataFrame =
      Winsorize.winsorize(df, pct, subset, byvars, bot, top)

    def portfolio(groupvar: String, ngroups: Int = 10, byvars: Seq[String] = Nil,
        cutoffs: Seq[Double] = Nil, quantCutoffs: Seq[Double] = Nil,
        cutDf: Option[DataFrame] = None, portvar: String = "portfolio"): DataFrame =
      Portfolio.portfolio(df, groupvar, ngroups, byvars, cutoffs, quantCutoffs, cutDf, portvar)

    def portfolioAverages(groupvar: String, avgvars: Seq[String], ngroups: Int = 10,
        byvars: Seq[String] = Nil, cutDf: Option[DataFrame] = None,
        wtvar: Option[String] = None, count: Option[String] = None,
        portvar: String = "portfolio"): DataFrame =
      Portfolio.portfolioAverages(df, groupvar, avgvars, ngroups, byvars, cutDf, wtvar, count, portvar)

    def longShortPortfolio(portvar: String, byvars: Seq[String], retvars: Seq[String],
        shortBottom: Boolean = true): DataFrame =
      Portfolio.longShortPortfolio(df, portvar, byvars, retvars, shortBottom)

    // --- joins (§2.3) --------------------------------------------
    def leftMergeLatest(df2: DataFrame, on: Seq[String], leftDatevar: String = "Date",
        rightDatevar: String = "Date", maxOffset: Option[Column] = None,
        broadcastRight: Boolean = false): DataFrame =
      AsOf.leftMergeLatest(df, df2, on, leftDatevar, rightDatevar, maxOffset, broadcastRight)

    def applyFuncToUniqueAndMerge(inCol: String, f: Column => Column, outCol: String): DataFrame =
      Merge.applyFuncToUniqueAndMerge(df, inCol, f, outCol)

    // --- reshape (§2.9) ------------------------------------------
    def longToWide(groupvars: Seq[String], values: Seq[String], colindex: Seq[String] = Nil,
        orderCols: Seq[String] = Nil,
        agg: Column => Column = c => org.apache.spark.sql.functions.first(c, ignoreNulls = true),
        colindexOnly: Boolean = false): DataFrame =
      Reshape.longToWide(df, groupvars, values, colindex, orderCols, agg, colindexOnly)

    def expandTime(time: Seq[Int], datevar: String = "Date", freq: String = "m",
        newdate: String = "Shift Date", shiftvar: String = "Shift"): DataFrame =
      Reshape.expandTime(df, time, datevar, freq, newdate, shiftvar)

    def expandMonths(datevar: String = "Date", newdatevar: String = "Daily Date",
        tradeDays: Boolean = true): DataFrame =
      Reshape.expandMonths(df, datevar, newdatevar, tradeDays)

    // --- fills (§2.9) --------------------------------------------
    def fillnaByGroups(byvars: Seq[String], orderCols: Seq[String],
        excludeCols: Seq[String] = Nil, strVars: String = "first",
        numVars: String = "mean"): DataFrame =
      Fill.fillnaByGroups(df, byvars, orderCols, excludeCols, strVars, numVars)

    def addMissingGroupRows(groupIdCols: Seq[String], nonGroupIdCols: Seq[String],
        fillMethod: Option[String] = Some("ffill"), fillLimit: Option[Int] = None): DataFrame =
      Fill.addMissingGroupRows(df, groupIdCols, nonGroupIdCols, fillMethod, fillLimit)

    def fillExcludedRows(byvars: Seq[String], fillvars: Seq[String] = Nil,
        fillValue: Option[Any] = None): DataFrame =
      Fill.fillExcludedRows(df, byvars, fillvars, fillValue)

    def dropMissingGroupRows(fillIdCols: Seq[String]): DataFrame =
      Fill.dropMissingGroupRows(df, fillIdCols)

    // --- stats / regression (§2.8) -------------------------------
    def regBy(yvar: String, xvars: Seq[String], groupvars: Seq[String],
        cons: Boolean = true, stderr: Boolean = false, merge: Boolean = false): DataFrame =
      RegBy.regBy(df, yvar, xvars, groupvars, cons, stderr, merge)

    def formattedCorrDf(cols: Seq[String]): DataFrame = Stats.formattedCorrDf(df, cols)

    // --- filters / strings / dates (§2.2, §2.10, §2.11) ----------
    def selectRowsByConditionOnColumns(cols: Seq[String], condition: String = "== 1",
        logic: String = "or"): DataFrame =
      Query.selectRowsByConditionOnColumns(df, cols, condition, logic)

    def stateAbbrev(colName: String, toAbbrev: Boolean = true): DataFrame =
      Strings.stateAbbrev(df, colName, toAbbrev)

    def joinColStrings(cols: Seq[String], outCol: String = "joined"): DataFrame =
      Strings.joinColStrings(df, cols, outCol)

    def yearMonthFromDate(datevar: String = "Date"): DataFrame =
      Dates.yearMonthFromDate(df, datevar)

    // --- training-data pipeline (beyond the reference) ------------
    def dedupExact(idCol: String, textCol: String): DataFrame =
      pipeline.Dedup.dedupExact(df, idCol, textCol)

    def minhashCandidates(idCol: String, textCol: String, shingleWords: Int = 3,
        numHashes: Int = 8, bands: Int = 4, maxBucketSize: Int = 1000): DataFrame =
      pipeline.Dedup.minhashCandidates(df, idCol, textCol, shingleWords, numHashes, bands, maxBucketSize)

    def nearDupGroups(idCol: String, textCol: String, jaccardThreshold: Double): DataFrame =
      pipeline.Dedup.nearDupGroups(df, idCol, textCol, jaccardThreshold)

    def dedupLines(idCol: String, textCol: String, outCol: String = "text_dedup"): DataFrame =
      pipeline.Dedup.dedupLines(df, idCol, textCol, outCol)

    def deterministicSample(keyCols: Seq[String], fraction: Double, salt: String = ""): DataFrame =
      pipeline.Sampling.deterministicSample(df, keyCols, fraction, salt)

    def assignSplit(keyCols: Seq[String], fractions: Seq[(String, Double)],
        salt: String = "", rest: String = "rest"): DataFrame =
      pipeline.Sampling.assignSplit(df, keyCols, fractions, salt, rest)

    def capPerGroup(byvars: Seq[String], n: Int, orderCols: Seq[Column]): DataFrame =
      pipeline.Sampling.capPerGroup(df, byvars, n, orderCols)

    def decontaminate(evalSet: DataFrame, idCol: String, textCol: String,
        n: Int = 13, minOverlap: Int = 1): DataFrame =
      pipeline.Contamination.decontaminate(df, evalSet, idCol, textCol, n, minOverlap)

    def charWindowContaminatedIds(evalSet: DataFrame, idCol: String, textCol: String,
        window: Int = 50, stride: Int = 10, minOverlap: Int = 1): DataFrame =
      pipeline.Contamination.charWindowContaminatedIds(
        df, evalSet, idCol, textCol, window, stride, minOverlap)

    def qualityFeatures(textCol: String, prefix: String = "q_"): DataFrame =
      pipeline.TextAnalysis.qualityFeatures(df, textCol, prefix)

    def piiCounts(textCol: String, prefix: String = "pii_"): DataFrame =
      pipeline.TextAnalysis.piiCounts(df, textCol, prefix)

    def tfIdf(idCol: String, textCol: String, minDocFreq: Int = 1): DataFrame =
      pipeline.TextAnalysis.tfIdf(df, idCol, textCol, minDocFreq)

    def semDedup(idCol: String, vecCol: String, threshold: Double,
        nlist: Int = 16, centroids: Option[DataFrame] = None,
        maxCellSize: Int = 100000): DataFrame =
      pipeline.Dedup.semDedup(df, idCol, vecCol, threshold, nlist,
        centroids = centroids, maxCellSize = maxCellSize)

    def chunkDocuments(idCol: String, textCol: String, chunkSize: Int,
        overlap: Int = 0): DataFrame =
      pipeline.TextAnalysis.chunkDocuments(df, idCol, textCol, chunkSize, overlap)

    def gopherQuality(idCol: String, textCol: String, minWords: Int = 50,
        maxWords: Int = 100000): DataFrame =
      pipeline.TextAnalysis.gopherQuality(df, idCol, textCol, minWords, maxWords)

    def c4Clean(idCol: String, textCol: String, minWordsPerLine: Int = 5,
        minKeptLines: Int = 3): DataFrame =
      pipeline.TextAnalysis.c4Clean(df, idCol, textCol, minWordsPerLine, minKeptLines)

    def sessionize(keys: Seq[String], tsCol: String, gapSeconds: Long): DataFrame =
      operators.GroupOps.sessionize(df, keys, tsCol, gapSeconds)

    def corpusStats(byvars: Seq[String], textCol: String): DataFrame =
      pipeline.TextAnalysis.corpusStats(df, byvars, textCol)

    def nfcNormalize(textCol: String, outCol: String = "text_nfc"): DataFrame =
      df.withColumn(outCol, pipeline.TextAnalysis.nfcNormalize(org.apache.spark.sql.functions.col(textCol)))

    def stripAccents(textCol: String, outCol: String = "text_ascii"): DataFrame =
      df.withColumn(outCol, pipeline.TextAnalysis.stripAccents(org.apache.spark.sql.functions.col(textCol)))

    def bigramCrossEntropy(idCol: String, textCol: String, k: Double = 0.5): DataFrame =
      pipeline.TextAnalysis.bigramCrossEntropy(df, idCol, textCol, k)

    def mixtureSample(groupCol: String, weights: Map[String, Double], keyCols: Seq[String],
        salt: String = "", defaultWeight: Double = 1.0): DataFrame =
      pipeline.Sampling.mixtureSample(df, groupCol, weights, keyCols, salt, defaultWeight)

    def packSequences(idCol: String, lengthCol: String, capacity: Long,
        salt: String = ""): DataFrame =
      pipeline.Sampling.packSequences(df, idCol, lengthCol, capacity, salt)

    def winnowFingerprints(idCol: String, textCol: String,
        k: Int = 5, w: Int = 4): DataFrame =
      pipeline.TextAnalysis.winnowFingerprintRows(df, idCol, textCol, k, w)

    def pointInInterval(intervals: DataFrame, pointCol: String, startCol: String,
        endCol: String, equiKeys: Seq[String] = Nil, bucketWidth: Long = 1L): DataFrame =
      operators.RangeJoin.pointInInterval(
        df, intervals, pointCol, startCol, endCol, equiKeys, bucketWidth)

    def writePartitioned(path: String, partitionCols: Seq[String],
        sortCols: Seq[String] = Nil, maxRecordsPerFile: Long = 0L,
        filesPerPartition: Int = 1): Unit =
      sources.Sink.writePartitioned(
        df, path, partitionCols, sortCols, maxRecordsPerFile, filesPerPartition)
  }
}
