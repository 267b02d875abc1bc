package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{ReadFile, Sas7bdat}
import graft.testing.{SasFixture, SasWriter}
import graft.testing.SasWriter.Col

/** SAS7BDAT reader (the load_sas ingestion path,
  * pd_utils/load.py:7-42). Fixtures come from the test-only
  * [[SasWriter]]; the writer's byte layout is cross-validated against
  * pandas.read_sas (an independent reader) in scripts/check_sas.py so
  * writer and reader cannot share a misunderstanding of the format.
  */
class Sas7bdatSpec extends SparkSuite {

  private def tmpPath(name: String): String = {
    val dir = Files.createTempDirectory("sas7bdat-spec").toFile
    dir.deleteOnExit()
    new java.io.File(dir, name).getAbsolutePath
  }

  private val cols = SasFixture.columns
  private def sampleRows(n: Int): Seq[Seq[Any]] = SasFixture.rows(n)

  test("round-trip: schema, values, missing doubles/strings, DATE conversion") {
    val p = tmpPath("fix.sas7bdat")
    SasWriter.write(p, cols, sampleRows(500)) // 500 rows spans 4 data pages
    val df = Sas7bdat.read(spark, p)
    assert(df.schema == StructType(Seq(
      StructField("id", DoubleType), StructField("ret", DoubleType),
      StructField("evtdate", DateType), StructField("ticker", StringType))))
    assert(df.count() == 500)
    val rows = df.orderBy("id").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getDouble(0) == i.toDouble)
      if (i % 7 == 3) assert(r.isNullAt(1), s"row $i: missing numeric not null")
      else assert(math.abs(r.getDouble(1) - (i * 0.25 - 10)) < 1e-12)
      assert(r.getDate(2).toString == java.time.LocalDate.of(2000, 1, 1).plusDays(i).toString)
      if (i % 11 == 5) assert(r.isNullAt(3), s"row $i: blank string not null")
      else assert(r.getString(3) == s"T${i % 97}")
    }
  }

  private def assertFixture(df: org.apache.spark.sql.DataFrame, n: Int): Unit = {
    assert(df.count() == n)
    val rows = df.orderBy("id").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getDouble(0) == i.toDouble)
      if (i % 7 == 3) assert(r.isNullAt(1)) else assert(math.abs(r.getDouble(1) - (i * 0.25 - 10)) < 1e-12)
      assert(r.getDate(2).toString == java.time.LocalDate.of(2000, 1, 1).plusDays(i).toString)
      if (i % 11 == 5) assert(r.isNullAt(3)) else assert(r.getString(3) == s"T${i % 97}")
    }
  }

  test("RLE-compressed (COMPRESS=CHAR) file round-trips identically to uncompressed") {
    val p = tmpPath("rle.sas7bdat")
    SasWriter.write(p, cols, sampleRows(500), compression = "rle") // rows span several subheader pages
    assertFixture(Sas7bdat.read(spark, p), 500)
  }

  test("RDC-compressed (COMPRESS=BINARY) file round-trips identically to uncompressed") {
    val p = tmpPath("rdc.sas7bdat")
    SasWriter.write(p, cols, sampleRows(500), compression = "rdc")
    assertFixture(Sas7bdat.read(spark, p), 500)
  }

  test("rdcCompress/rdcDecompress round-trip arbitrary byte rows, including command edges") {
    val rnd = new scala.util.Random(11)
    val abc = Array.tabulate[Byte](12)(i => ('a' + i % 3).toByte)
    val cases = Seq(
      Array.fill[Byte](100)(0),                          // long run (cmd 1)
      Array.fill[Byte](10)(7),                           // short run (cmd 0)
      Array.tabulate[Byte](40)(i => i.toByte),           // pure literals + ctrl-word refills
      abc ++ abc ++ abc ++ abc,                          // short pattern refs (cmd 3..15)
      Array.tabulate[Byte](8)(_.toByte) ++ Array.tabulate[Byte](300)(i => (i % 8).toByte), // long pattern (cmd 2, overlapping)
      Array.fill[Byte](19)(3) ++ Array.tabulate[Byte](5)(_.toByte) ++ Array.fill[Byte](4114)(9) ++ abc, // run-length caps
      Array.tabulate[Byte](5000)(_ => rnd.nextInt(4).toByte) // random compressible soup
    )
    cases.zipWithIndex.foreach { case (row, k) =>
      val comp = SasWriter.rdcCompress(row)
      val back = graft.sources.Sas7bdat.rdcDecompress(comp, 0, comp.length, row.length)
      assert(back.sameElements(row), s"case $k failed round-trip")
    }
  }

  test("rleCompress/rleDecompress round-trip arbitrary byte rows, including opcode edges") {
    val rnd = new scala.util.Random(7)
    val cases = Seq(
      Array.fill[Byte](100)(0),                         // long zero fill
      Array.fill[Byte](100)(' '.toByte),                // long space fill
      Array.fill[Byte](200)(7),                         // repeat chains (0xC0 x several)
      Array.tabulate[Byte](300)(i => i.toByte),         // pure literal, >64 (copy64 path)
      Array.tabulate[Byte](10)(i => i.toByte),          // short literal
      (Array.fill[Byte](3)(' '.toByte) ++ Array.tabulate[Byte](5)(_.toByte)
        ++ Array.fill[Byte](17)(0) ++ Array.fill[Byte](16)(' '.toByte)), // mixed short/long fills
      Array.tabulate[Byte](5000)(_ => rnd.nextInt(4).toByte)             // random compressible soup
    )
    cases.zipWithIndex.foreach { case (row, k) =>
      val comp = SasWriter.rleCompress(row)
      val back = graft.sources.Sas7bdat.rleDecompress(comp, 0, comp.length, row.length)
      assert(back.sameElements(row), s"case $k failed round-trip")
    }
  }

  test("DataSourceV2: spark.read.format(\"sas7bdat\") reads all layouts; pruning reaches the scan") {
    val p = tmpPath("v2.sas7bdat")
    SasWriter.write(p, cols, sampleRows(500), compression = "rdc")
    assertFixture(spark.read.format("sas7bdat").load(p), 500)
    // REAL column pruning: the projection narrows the scan itself
    // (readSchema/description), not a post-scan Project
    val pruned = spark.read.format("sas7bdat").load(p).select("id", "ticker")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("[id,ticker]"), s"scan not pruned to [id,ticker]:\n$plan")
    assert(pruned.count() == 500)
    assert(pruned.orderBy("id").limit(1).head().getDouble(0) == 0.0)
    // convertDates=false keeps raw SAS day counts, same as the RDD path
    val raw = spark.read.format("sas7bdat").option("convertDates", "false").load(p)
    assert(raw.schema("evtdate").dataType == DoubleType)
    assert(raw.orderBy("id").select("evtdate").head().getDouble(0) == 14610.0)
  }

  test("32-bit layout round-trips identically (4-byte ints, 16-byte bit offset)") {
    val p = tmpPath("fix32.sas7bdat")
    SasWriter.write(p, cols, sampleRows(300), u64 = false)
    val df = Sas7bdat.read(spark, p)
    assert(df.count() == 300)
    val rows = df.orderBy("id").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getDouble(0) == i.toDouble)
      if (i % 7 == 3) assert(r.isNullAt(1)) else assert(math.abs(r.getDouble(1) - (i * 0.25 - 10)) < 1e-12)
      assert(r.getDate(2).toString == java.time.LocalDate.of(2000, 1, 1).plusDays(i).toString)
      if (i % 11 == 5) assert(r.isNullAt(3)) else assert(r.getString(3) == s"T${i % 97}")
    }
  }

  test("convertDates=false leaves SAS day counts as raw doubles") {
    val p = tmpPath("raw.sas7bdat")
    SasWriter.write(p, cols, sampleRows(3))
    val df = Sas7bdat.read(spark, p, convertDates = false)
    assert(df.schema("evtdate").dataType == DoubleType)
    assert(df.orderBy("id").collect().map(_.getDouble(2)).toSeq == Seq(14610.0, 14611.0, 14612.0))
  }

  test("readFile dispatches .sas7bdat; loadSas reuses its parquet side-cache") {
    val p = tmpPath("cache.sas7bdat")
    SasWriter.write(p, cols, sampleRows(20))
    assert(ReadFile.readFile(spark, p).count() == 20)
    val viaCache = ReadFile.loadSas(spark, p)
    assert(viaCache.count() == 20)
    val cacheFile = new java.io.File(p.stripSuffix(".sas7bdat") + ".parquet")
    assert(cacheFile.exists, "loadSas did not materialize the sibling parquet cache")
    // second read comes from the cache (parquet scan, no sas parse)
    val second = ReadFile.loadSas(spark, p)
    assert(second.queryExecution.executedPlan.toString.contains("parquet"))
    assert(second.count() == 20)
  }

  test("empty table and non-SAS file are handled cleanly") {
    val p = tmpPath("empty.sas7bdat")
    SasWriter.write(p, cols, Nil)
    val df = Sas7bdat.read(spark, p)
    assert(df.count() == 0 && df.schema.fieldNames.toSeq == Seq("id", "ret", "evtdate", "ticker"))
    val bogus = tmpPath("bogus.sas7bdat")
    Files.write(java.nio.file.Paths.get(bogus), Array.fill[Byte](512)(7))
    val err = intercept[IllegalArgumentException](Sas7bdat.read(spark, bogus))
    assert(err.getMessage.contains("magic"))
  }

  test("datetime format maps to timestamp (seconds since 1960)") {
    val p = tmpPath("dt.sas7bdat")
    val dtCols = Seq(Col("k", isNum = true), Col("when", isNum = true, format = "DATETIME"))
    // 2000-01-01T00:00:10 = 40 years of seconds + 10
    val secs = 14610.0 * 86400 + 10
    SasWriter.write(p, dtCols, Seq(Seq[Any](java.lang.Double.valueOf(1.0), java.lang.Double.valueOf(secs))))
    val df = Sas7bdat.read(spark, p)
    assert(df.schema("when").dataType == TimestampType)
    val got = df.select(date_format(col("when"), "yyyy-MM-dd HH:mm:ss")).head().getString(0)
    assert(got == "2000-01-01 00:00:10")
  }
}
