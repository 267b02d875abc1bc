package graft

import org.apache.spark.sql.functions._

import graft.operators.{Query, Stats}
import graft.functions.Strings
import graft.testing.TestKit

/** Query / string / stats operators
  * (pd_utils/query.py, pd_utils/transform.py:295-387, pd_utils/corr.py).
  */
class QueryStringsSpec extends SparkSuite {

  test("extractTableNames: FROM/JOIN, first-seen order, dedup (pd_utils/query.py:80-87)") {
    val q = "SELECT * FROM a JOIN b ON a.x = b.x LEFT JOIN c ON 1=1 WHERE a.x IN (SELECT x FROM b)"
    assert(Query.extractTableNames(q) == Seq("a", "b", "c"))
  }

  test("sql binds frames positionally and drops its temp views (pd_utils/query.py:44-77)") {
    val s = spark; import s.implicits._
    val d1 = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val d2 = Seq((1L, 10.0)).toDF("id", "w")
    val out = Query.sql(Seq(d1, d2), "SELECT t1.id, t1.v, t2.w FROM t1 JOIN t2 ON t1.id = t2.id")
    assert(out.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq == Seq((1L, "x", 10.0)))
    assert(!spark.catalog.tableExists("t1") && !spark.catalog.tableExists("t2"))
  }

  test("selectRowsByConditionOnColumns or/and (pd_utils/query.py:8-41)") {
    val s = spark; import s.implicits._
    val df = Seq((1, 1, 0), (2, 0, 0), (3, 1, 1)).toDF("id", "a", "b")
    assert(Query.selectRowsByConditionOnColumns(df, Seq("a", "b"), "== 1", "or").count() == 2)
    assert(Query.selectRowsByConditionOnColumns(df, Seq("a", "b"), "== 1", "and").count() == 1)
  }

  test("state_abbrev maps names both ways, unmatched pass through (pd_utils/transform.py:295-364)") {
    val s = spark; import s.implicits._
    val df = Seq("Texas", "New York", "Narnia").toDF("st")
    val out = Strings.stateAbbrev(df, "st").collect().map(_.getString(0)).toSeq
    assert(out == Seq("TX", "NY", "Narnia"))
    val back = Strings.stateAbbrev(Seq("TX", "Narnia").toDF("st"), "st", toAbbrev = false)
      .collect().map(_.getString(0)).toSeq
    assert(back == Seq("Texas", "Narnia"))
  }

  test("join_col_strings concatenates with underscore (pd_utils/transform.py:367-387)") {
    val s = spark; import s.implicits._
    val out = Strings.joinColStrings(Seq((1L, "a")).toDF("x", "y"), Seq("x", "y"), "k")
    assert(out.select("k").head().getString(0) == "1_a")
  }

  test("corrPairs: exact self-corr, null-safe on constant columns (ADVICE r1 low)") {
    val s = spark; import s.implicits._
    val df = Seq((1.0, 2.0, 5.0), (2.0, 4.0, 5.0), (3.0, 6.0, 5.0)).toDF("a", "b", "c")
    val out = Stats.corrPairs(df, Seq("a", "b", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(math.abs(out(("a", "b")).get - 1.0) < 1e-12)
    assert(out(("a", "c")).isEmpty) // zero-variance -> null, not NPE
    val fmt = Stats.formattedCorrDf(df, Seq("a", "b", "c"))
    assert(fmt.count() == 3)
  }

  test("toCopyPaste renders a paste-able Seq literal (pd_utils/testing.py:4-28)") {
    val s = spark; import s.implicits._
    val lit = TestKit.toCopyPaste(Seq((1L, "x", 1.5)).toDF("id", "v", "r"))
    assert(lit.contains("Seq(") && lit.contains("(1L, \"x\", 1.5d)") && lit.contains(".toDF(\"id\", \"v\", \"r\")"))
  }

  test("readFile dispatches on extension (pd_utils/optimize/load/__init__.py:6-22)") {
    val out = graft.sources.ReadFile.readFile(spark, "/root/testdata/sf0.001/region.parquet")
    assert(out.count() == 5)
    intercept[IllegalArgumentException] {
      graft.sources.ReadFile.readFile(spark, "/tmp/nope.xyz")
    }
  }

  test("readFile reads jsonl, tsv, and gzip'd text sources") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-readfile").toString
    Files.writeString(Paths.get(s"$dir/d.jsonl"),
      """{"id":1,"t":"a"}""" + "\n" + """{"id":2,"t":"b"}""" + "\n")
    val jl = graft.sources.ReadFile.readFile(spark, s"$dir/d.jsonl")
    assert(jl.count() == 2 && jl.columns.sorted.sameElements(Array("id", "t")))
    Files.writeString(Paths.get(s"$dir/d.tsv"), "id\tt\n1\ta\n2\tb\n")
    val tsv = graft.sources.ReadFile.readFile(spark, s"$dir/d.tsv")
    assert(tsv.count() == 2 && tsv.columns.sameElements(Array("id", "t")))
    // gz suffix strips to the logical extension; Spark's codec reads it
    val gzPath = Paths.get(s"$dir/e.jsonl.gz")
    val gz = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gzPath))
    gz.write("""{"id":3,"t":"c"}""".getBytes("UTF-8")); gz.write('\n'); gz.close()
    val back = graft.sources.ReadFile.readFile(spark, gzPath.toString)
    assert(back.count() == 1 && back.head().getLong(0) == 3L)
  }

  test("readCached writes then reuses a parquet cache (pd_utils/load.py:7-42)") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftcache").toString
    val src = s"$dir/src.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(src), "id,v\n1,a\n2,b\n")
    val cache = s"$dir/cache.parquet"
    val first = graft.sources.ReadFile.readCached(spark, src, cache)
    assert(first.count() == 2)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(cache)))
    val again = graft.sources.ReadFile.readCached(spark, src, cache)
    assert(again.count() == 2)
  }
}
