package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.operators.{AsOf, Cumulate, Portfolio, Winsorize}
import graft.pipeline.{IvfIndex, Similarity}

/** Property tests the reference never had (SURVEY §5): structural
  * invariants that must hold for ANY input, not just the goldens.
  * Small generated frames; 10 cases per property keeps the suite
  * fast while still sweeping group sizes/values.
  */
class PropertySpec extends SparkSuite {

  /** Raw ScalaCheck generators (the scalatest bridge isn't in the
    * offline dependency set); each property sweeps `n` samples.
    */
  private def forAllSamples[A](g: Gen[A], n: Int = 10)(body: A => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(n).foreach(body)

  private val groupGen: Gen[List[(String, Double)]] = for {
    n <- Gen.choose(2, 25)
    keys <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    vals <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
  } yield keys.zip(vals)

  test("int8 quantize kernel == the three-lambda expression form, incl. adversarial .5 boundaries (r15)") {
    // the fused VectorKernel.int8Quantize claims bit-identity with
    // the HOF chain it replaced (array_max(transform(abs))/127 +
    // transform(round(x/s))) BY ARGUMENT (scale-0 decimal-HALF_UP ==
    // binary half-away); this sweeps random vectors PLUS vectors
    // engineered to land code ratios ON and JUST BELOW k.5 — the
    // exact inputs where a floor(x+0.5) shortcut diverges
    val s = spark; import s.implicits._
    def oldForm(df: org.apache.spark.sql.DataFrame): Array[(Long, Seq[Int], Double)] = {
      val v = col("v").cast("array<double>")
      df.withColumn("__s__", array_max(transform(v, x => abs(x))) / 1.27e2)
        .withColumn("__c__",
          when(col("__s__") === 0.0d, transform(v, _ => lit(0)))
            .otherwise(transform(v, x => round(x / col("__s__"), 0).cast("int"))))
        .select(col("id"), col("__c__"), col("__s__"))
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2))).sortBy(_._1)
    }
    def newForm(df: org.apache.spark.sql.DataFrame): Array[(Long, Seq[Int], Double)] =
      Similarity.quantizeInt8(df, "v", "__c__", "__s__")
        .select(col("id"), col("__c__"), col("__s__"))
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2))).sortBy(_._1)
    val rnd = new scala.util.Random(7)
    val random = (0L until 200L).map(i =>
      (i, Array.fill(16)((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(6) - 3))))
    // boundary rigs: with max |x| pinned so scale = m/127, component
    // k.5*scale has ratio EXACTLY k.5 when representable, and
    // nextDown/nextUp neighbors probe both sides of the boundary
    val boundary = (1000L until 1200L).map { i =>
      val m = 1.0 + (i % 7).toDouble / 3.0
      val scale = m / 127.0
      val k = (i % 120).toInt
      val onB = (k + 0.5) * scale
      (i, Array(m, -m, onB, math.nextAfter(onB, 0.0), math.nextAfter(onB, 1e9),
        -onB, math.nextAfter(-onB, 0.0), math.nextAfter(-onB, -1e9),
        k * scale, -(k * scale), 0.0, scale / 2.0, -scale / 2.0,
        math.nextAfter(scale / 2.0, 0.0), 63.5 * scale, -63.5 * scale))
    }
    val zeros = Seq((5000L, Array.fill(16)(0.0)))
    // equivalence domain: NaN-free vectors — on NaN inputs the kernel
    // DELIBERATELY diverges from the old form (see the r16 NaN case
    // below); no in-repo path feeds NaN (dropZeroVectors excludes it)
    val df = (random ++ boundary ++ zeros).toDF("id", "v")
    val (o, n) = (oldForm(df), newForm(df))
    assert(o.length == n.length)
    o.zip(n).foreach { case ((oi, oc, os), (ni, nc, ns)) =>
      assert(oi == ni)
      assert(java.lang.Double.doubleToRawLongBits(os) == java.lang.Double.doubleToRawLongBits(ns),
        s"scale diverged for id $oi: $os vs $ns")
      assert(oc == nc, s"codes diverged for id $oi: $oc vs $nc (scale $os)")
    }
  }

  test("int8 quantize treats any-NaN vectors like the zero vector: scale 0.0, all-zero codes (r16)") {
    // the pre-r16 kernel propagated NaN into the scale (codes were
    // already 0 via NaN.toInt), so a corrupt embedding slipped past
    // zero-vector guards with a NaN scale; the pinned contract makes
    // it indistinguishable from the zero vector (scale 0.0), which
    // every Similarity path excludes
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Array(1.0, Double.NaN, 3.0)),        // NaN mid-vector
      (2L, Array(Double.NaN, Double.NaN, Double.NaN)), // all NaN
      (3L, Array(5.0, -2.0, 0.5))               // control: NaN-free
    ).toDF("id", "v")
    val out = Similarity.quantizeInt8(df, "v", "__c__", "__s__")
      .select(col("id"), col("__c__"), col("__s__"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2))).sortBy(_._1)
    assert(out(0)._3 == 0.0 && out(0)._2 == Seq(0, 0, 0),
      s"NaN-bearing vector must quantize like the zero vector, got ${out(0)}")
    assert(out(1)._3 == 0.0 && out(1)._2 == Seq(0, 0, 0))
    assert(out(2)._3 == 5.0 / 127.0 && out(2)._2 == Seq(127, -51, 13),
      s"NaN-free vectors must be untouched by the guard, got ${out(2)}")
    // dropZeroVectors excludes NaN vectors explicitly (NaN orders
    // GREATER than every number in Spark, so dot > 0 alone KEPT them
    // — and their NaN cosine ranked above every real neighbor): with
    // ids 1-2 NaN and the query excluded from its own neighbors, the
    // corpus must be empty
    val kept = Similarity.bruteForceTopK(
      df, df.where(col("id") === 3L), "id", "v", k = 5).count()
    assert(kept == 0L, "NaN corpus vectors must be excluded from top-k serving")
  }

  test("pqSearch drops zero/NaN queries like every other top-k entry point (r17)") {
    // pre-r17, pqSearch skipped the query-side dropZeroVectors: a
    // zero/NaN query's score divided 0/0 — null in Spark (ranked
    // last) but NaN in DuckDB (ranked FIRST desc), so its entire
    // top-k was engine-dependent garbage; the stored-PQ serving path
    // shared the gap. Both now apply the shared filter.
    val s = spark; import s.implicits._
    val corpus = (0 until 64).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 13 + d * 7)))
    }.toDF("id", "v")
    val queries = Seq(
      (1000L, Array.fill(8)(0.0)),                       // zero
      (1001L, Array.tabulate(8)(d => if (d == 3) Double.NaN else 1.0)), // NaN
      (0L, Array.tabulate(8)(d => math.sin(d * 7)))      // real (id 0's vector)
    ).toDF("id", "v")
    val model = Similarity.pqFit(corpus, "id", "v", dims = 8, m = 2, ksub = 4,
      iters = 1, nlist = 4, nprobe = 4, persist = false)
    val served = Similarity.pqSearch(model, queries, "id", "v", k = 3)
      .select("query_id").distinct().collect().map(_.getLong(0)).toSet
    assert(served == Set(0L),
      s"only the real query may be served from pqSearch, got $served")
    // the stored-PQ layout honors the same contract
    val path = java.nio.file.Files.createTempDirectory("graft-pq-nan").toString + "/idx"
    IvfIndex.buildPq(corpus, "id", "v", path, dims = 8, m = 2, ksub = 4, nlist = 4)
    val servedStored = IvfIndex.searchTopK(spark, path, queries, "id", "v", k = 3, nprobe = 4)
      .select("query_id").distinct().collect().map(_.getLong(0)).toSet
    assert(servedStored == Set(0L),
      s"only the real query may be served from the stored PQ layout, got $servedStored")
    SparkEntry.runPendingCleanups()
  }

  test("winsorize output is always within the clamp bounds and preserves row count") {
    forAllSamples(groupGen) { rows =>
      if (rows.size >= 2) {
        val s = spark; import s.implicits._
        val df = rows.zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }.toDF("id", "k", "x")
        val out = Winsorize.winsorize(df, (0.1, 0.1), Seq("x"), Seq("k"))
        assert(out.count() == rows.size)
        // every group's output range is within its input range (clamping never expands)
        val joined = out.groupBy("k").agg(min("x").as("omin"), max("x").as("omax"))
          .join(df.groupBy("k").agg(min("x").as("imin"), max("x").as("imax")), "k")
        joined.collect().foreach { r =>
          assert(r.getDouble(1) >= r.getDouble(3) - 1e-9, "out min below in min")
          assert(r.getDouble(2) <= r.getDouble(4) + 1e-9, "out max above in max")
        }
      }
    }
  }

  test("portfolio assigns every non-null row a bucket in [1, ngroups]") {
    forAllSamples(groupGen) { rows =>
      if (rows.size >= 2) {
        val s = spark; import s.implicits._
        val df = rows.zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }.toDF("id", "k", "x")
        val out = Portfolio.portfolio(df, "x", ngroups = 3, byvars = Seq("k"))
        val ports = out.select("portfolio").collect().map(_.getInt(0))
        assert(ports.forall(p => p >= 1 && p <= 3))
        // monotonicity: within a group, a larger x never gets a smaller bucket
        val byGroup = out.select("k", "x", "portfolio").collect()
          .map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
          .groupBy(_._1)
        byGroup.values.foreach { g =>
          val sorted = g.sortBy(_._2)
          sorted.sliding(2).foreach {
            case Array((_, _, p1), (_, _, p2)) => assert(p1 <= p2, "bucket not monotone in value")
            case _ =>
          }
        }
      }
    }
  }

  test("cumulate 'first': final cum value equals the product of the non-window-0 rows") {
    forAllSamples(groupGen) { rows =>
      if (rows.size >= 2) {
        val s = spark; import s.implicits._
        // returns near 1 so products stay finite
        val df = rows.zipWithIndex.map { case ((k, v), i) => (i.toLong, k, 1.0 + v / 1000.0) }
          .toDF("t", "k", "r")
        val out = Cumulate.cumulate(df, Seq("r"), "first", "t", Seq("k"))
        val globalMinT = df.agg(min("t")).head().getLong(0)
        val expected = df.where(col("t") =!= globalMinT)
          .groupBy("k").agg(expr("exp(sum(ln(r)))").as("prod"))
        val lastCum = out.where(col("t") =!= globalMinT)
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy(col("t").desc)))
          .where(col("rn") === 1).select("k", "cum_r")
        val cmp = expected.join(lastCum, "k").collect()
        cmp.foreach { r =>
          assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-9 * math.max(1, math.abs(r.getDouble(1))))
        }
      }
    }
  }

  private val asofGen: Gen[(List[(String, Int)], List[(String, Int, Double)])] = for {
    nl <- Gen.choose(1, 20)
    nr <- Gen.choose(0, 20)
    lks <- Gen.listOfN(nl, Gen.oneOf("a", "b"))
    lds <- Gen.listOfN(nl, Gen.choose(0, 60))
    rks <- Gen.listOfN(nr, Gen.oneOf("a", "b"))
    rds <- Gen.listOfN(nr, Gen.choose(0, 60))
    rvs <- Gen.listOfN(nr, Gen.choose(-10.0, 10.0))
  } yield (lks.zip(lds), rks.lazyZip(rds).lazyZip(rvs).toList)

  private def day(n: Int): java.sql.Date =
    java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(n))

  test("as-of join invariants: matched date <= left date, staleness bound respected (VERDICT r3 #10)") {
    forAllSamples(asofGen, n = 8) { case (lrows, rrows) =>
      val s = spark; import s.implicits._
      val l = lrows.zipWithIndex.map { case ((k, d), i) => (i.toLong, k, day(d)) }
        .toDF("id", "k", "ldate")
      val r = rrows.zipWithIndex.map { case ((k, d, v), i) => (k, day(d), v, i.toLong) }
        .toDF("k", "rdate", "v", "rid")
        .dropDuplicates("k", "rdate") // one row per (key, date) like a real quote table
      // plain as-of: every match is at or before the left date, and is
      // the LATEST such right date for that key
      val out = AsOf.leftMergeLatest(l, r.drop("rid"), Seq("k"), "ldate", "rdate")
      assert(out.count() == l.count(), "left rows must be preserved")
      val rByKey = r.collect().map(x => (x.getString(0), x.getDate(1).toLocalDate)).toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      out.collect().foreach { row =>
        val k = row.getString(row.fieldIndex("k"))
        val ld = row.getDate(row.fieldIndex("ldate")).toLocalDate
        val rdIdx = row.fieldIndex("rdate")
        val eligible = rByKey.getOrElse(k, Nil).filter(!_.isAfter(ld))
        if (row.isNullAt(rdIdx)) assert(eligible.isEmpty, s"match missing though $eligible eligible")
        else {
          val rd = row.getDate(rdIdx).toLocalDate
          assert(!rd.isAfter(ld), "matched date after left date")
          assert(rd == eligible.max, "not the latest eligible right date")
        }
      }
      // staleness bound: with max_offset = 7 days no match is older
      val capped = AsOf.leftMergeLatest(l, r.drop("rid"), Seq("k"), "ldate", "rdate",
        maxOffset = Some(expr("INTERVAL 7 DAYS")))
      capped.collect().foreach { row =>
        val rdIdx = row.fieldIndex("rdate")
        if (!row.isNullAt(rdIdx)) {
          val gap = java.time.temporal.ChronoUnit.DAYS.between(
            row.getDate(rdIdx).toLocalDate, row.getDate(row.fieldIndex("ldate")).toLocalDate)
          assert(gap >= 0 && gap <= 7, s"staleness bound violated: $gap days")
        }
      }
    }
  }

  test("LSH bucket assignment is deterministic across partitioning (VERDICT r3 #10)") {
    val s = spark; import s.implicits._
    val vecs = (0 until 100).map(i => (i.toLong, Array.tabulate(12)(d => math.sin(i * 31 + d * 7))))
      .toDF("id", "v")
    def buckets(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), Similarity.lshBucket(col("v"), planes = 8, dims = 12, seed = 42).as("b"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val one = buckets(vecs.coalesce(1))
    val many = buckets(vecs.repartition(13))
    assert(one == many, "bucket ids changed under repartitioning")
    assert(one.values.forall(b => b.length == 8 && b.forall(c => c == '0' || c == '1')))
  }

  test("connectedComponents matches a union-find oracle on random graphs") {
    val edgeListGen: Gen[List[(Long, Long)]] = for {
      nNodes <- Gen.choose(2, 40)
      nEdges <- Gen.choose(1, 60)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0L, nNodes.toLong - 1)
        b <- Gen.choose(0L, nNodes.toLong - 1)
      } yield (a, b))
    } yield edges.filter { case (a, b) => a != b }
    forAllSamples(edgeListGen, n = 8) { edges =>
      if (edges.nonEmpty) {
        val s = spark; import s.implicits._
        // driver-side union-find oracle
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        // min-id per component = the expected cluster label
        val byRoot = nodes.groupBy(find)
        val expected = byRoot.values.flatMap(ns => ns.map(_ -> ns.min)).toMap
        val fast = graft.pipeline.Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(fast == expected, s"CC (local solve) mismatch on edges $edges")
        val loop = graft.pipeline.Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b",
            localSolveMaxEdges = 0)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(loop == expected, s"CC (distributed loop) mismatch on edges $edges")
      }
    }
  }

  test("grossify(cumulate) is consistent: grossify of (r-1) equals plain cumulate of r minus 1") {
    forAllSamples(groupGen) { rows =>
      if (rows.size >= 2) {
        val s = spark; import s.implicits._
        val df = rows.zipWithIndex.map { case ((k, v), i) => (i.toLong, k, 1.0 + v / 1000.0) }
          .toDF("t", "k", "r")
        val plain = Cumulate.cumulate(df, Seq("r"), "first", "t", Seq("k"))
          .select(col("t"), col("k"), (col("cum_r") - 1).as("cum"))
        val gross = Cumulate.cumulate(df.withColumn("r", col("r") - 1), Seq("r"), "first", "t", Seq("k"), grossify = true)
          .select(col("t"), col("k"), col("cum_r").as("cum"))
        val diff = plain.join(gross, Seq("t", "k"))
          .select(abs(plain("cum") - gross("cum")).as("d"))
          .agg(max("d")).head().getDouble(0)
        assert(diff < 1e-9)
      }
    }
  }

  test("upsertRelocating tracks an in-memory latest-state model under random relocations") {
    val s = spark; import s.implicits._
    // keys move freely between partitions batch to batch (the IVF
    // cell-reassignment shape); after every upsert the layout must
    // read back as exactly the model's latest state per key
    val batchGen = for {
      n <- Gen.choose(1, 6)
      ks <- Gen.listOfN(n, Gen.choose(0L, 12L))
      ps <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
      vs <- Gen.listOfN(n, Gen.choose(0.0, 100.0))
    } yield ks.lazyZip(ps).lazyZip(vs).toList.distinctBy(_._1) // key-unique batch
    val dir = java.nio.file.Files.createTempDirectory("graft-reloc-prop").toString + "/t"
    val model = scala.collection.mutable.Map.empty[Long, (String, Double)]
    forAllSamples(batchGen, n = 8) { batch =>
      val df = batch.toDF("id", "part", "v")
      // the caller contract: name the old partitions of keys the
      // batch may be moving (derived from the model, like the IVF
      // keymap sidecar derives it from disk)
      val oldParts = batch.flatMap { case (k, p, _) =>
        model.get(k).collect { case (op, _) if op != p => op }
      }.distinct
      graft.sources.Sink.upsertRelocating(s, dir, df, Seq("id"), Seq("part"),
        oldPartitions = if (oldParts.isEmpty) None else Some(oldParts.toDF("part")),
        sortCols = Seq("id"))
      batch.foreach { case (k, p, v) => model(k) = (p, v) }
      val back = graft.sources.Sink.readPartitioned(s, dir)
        .select("id", "part", "v")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
      assert(back == model.toMap,
        s"layout diverged from the model after batch $batch:\n got $back\nwant ${model.toMap}")
    }
  }

  test("SAS RLE codec round-trips arbitrary byte rows (any run structure, any alphabet)") {
    // byte soups biased toward runs of 0x00/0x20 (the SAS-common
    // padding bytes with dedicated opcodes) plus fully random noise
    val rowGen: Gen[Array[Byte]] = for {
      n <- Gen.choose(1, 3000)
      mode <- Gen.choose(0, 2)
      bytes <- Gen.listOfN(n, mode match {
        case 0 => Gen.oneOf[Byte](0.toByte, ' '.toByte, 7.toByte) // long runs
        case 1 => Gen.choose(-128, 127).map(_.toByte)          // noise
        case 2 => Gen.oneOf[Byte](0.toByte, 1.toByte, 2.toByte, ' '.toByte) // mixed
      })
    } yield bytes.toArray
    forAllSamples(rowGen, n = 60) { row =>
      val comp = graft.testing.SasWriter.rleCompress(row)
      val back = graft.sources.Sas7bdat.rleDecompress(comp, 0, comp.length, row.length)
      assert(back.sameElements(row), s"RLE round-trip failed for ${row.length}-byte row")
    }
  }

  test("SAS RDC codec round-trips arbitrary byte rows (runs, patterns, noise)") {
    // soups biased toward the RDC command classes: long byte runs
    // (short/long RLE), repeated motifs at varying periods (short and
    // long LZ back-references, incl. overlapping), and random noise
    // (pure literal + control-word refill paths)
    val rowGen: Gen[Array[Byte]] = for {
      n <- Gen.choose(1, 3000)
      mode <- Gen.choose(0, 3)
      bytes <- mode match {
        case 0 => Gen.listOfN(n, Gen.oneOf[Byte](0.toByte, 9.toByte))          // runs
        case 1 => Gen.choose(1, 12).map(p => List.tabulate(n)(i => (i % p).toByte)) // periodic motifs
        case 2 => Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte))          // noise
        case 3 => Gen.listOfN(n, Gen.oneOf[Byte](0.toByte, 1.toByte, 2.toByte, 3.toByte)) // mixed
      }
    } yield bytes.toArray
    forAllSamples(rowGen, n = 60) { row =>
      val comp = graft.testing.SasWriter.rdcCompress(row)
      val back = graft.sources.Sas7bdat.rdcDecompress(comp, 0, comp.length, row.length)
      assert(back.sameElements(row), s"RDC round-trip failed for ${row.length}-byte row")
    }
  }

  test("corrupt compressed payloads fail as diagnosable errors, never AIOOBE") {
    val rnd = new scala.util.Random(23)
    val row = Array.tabulate[Byte](200)(i => (i % 7).toByte)
    val rle = graft.testing.SasWriter.rleCompress(row)
    val rdc = graft.testing.SasWriter.rdcCompress(row)
    for (_ <- 0 until 200) {
      // random truncation and random single-byte corruption of both streams
      def mangle(src: Array[Byte]): Array[Byte] = {
        val cut = 1 + rnd.nextInt(src.length)
        val a = java.util.Arrays.copyOf(src, cut)
        if (rnd.nextBoolean() && a.nonEmpty) a(rnd.nextInt(a.length)) = rnd.nextInt(256).toByte
        a
      }
      def decodeEither(f: => Array[Byte]): Unit =
        try { f; () } catch {
          case _: IllegalStateException | _: IllegalArgumentException => () // diagnosable
          case e: ArrayIndexOutOfBoundsException => fail(s"raw AIOOBE escaped: $e")
        }
      val mRle = mangle(rle)
      val mRdc = mangle(rdc)
      decodeEither(graft.sources.Sas7bdat.rleDecompress(mRle, 0, mRle.length, row.length))
      decodeEither(graft.sources.Sas7bdat.rdcDecompress(mRdc, 0, mRdc.length, row.length))
    }
  }

  /** Degenerate-document generator for the Gopher quality filter:
    * empty texts, whitespace-only lines, all-bullet / all-ellipsis
    * docs, symbol soups, and ordinary prose, stacked in random line
    * mixes — the boundary shapes a 100 TB crawl actually contains.
    */
  private val gopherDocGen: Gen[String] = {
    val lineGen = Gen.oneOf(
      Gen.const(""),
      Gen.const("   "),
      Gen.const("\t \t"),
      Gen.const("• bullet item one"),
      Gen.const("- dashed item"),
      Gen.const("* starred item"),
      Gen.const("to be continued..."),
      Gen.const("trailing unicode ellipsis…"),
      Gen.const("### ## # symbol soup # ..."),
      Gen.const("12345 67890 11111 22222"),
      Gen.const("the cat sat on the mat and looked at the dog with interest."),
      Gen.listOfN(8, Gen.oneOf("alpha", "beta", "gamma", "42", "x")).map(_.mkString(" ")))
    Gen.frequency(
      1 -> Gen.const(""),
      1 -> Gen.const(" \n \n "),
      8 -> Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, lineGen).map(_.mkString("\n"))))
  }

  test("gopherQuality invariants hold on degenerate documents (VERDICT r6 #7)") {
    val s = spark; import s.implicits._
    forAllSamples(Gen.listOfN(12, gopherDocGen), n = 8) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = graft.pipeline.TextAnalysis.gopherQuality(df, "doc_id", "text").collect()
      assert(out.length == texts.size, "one output row per input row")
      out.foreach { r =>
        val text = texts(r.getLong(0).toInt)
        val nWords = r.getInt(r.fieldIndex("n_words"))
        val meanLen = r.getDouble(r.fieldIndex("mean_word_len"))
        val symbol = r.getDouble(r.fieldIndex("symbol_ratio"))
        val bullet = r.getDouble(r.fieldIndex("bullet_frac"))
        val ellipsis = r.getDouble(r.fieldIndex("ellipsis_frac"))
        val alpha = r.getDouble(r.fieldIndex("alpha_frac"))
        val nStop = r.getInt(r.fieldIndex("n_stop"))
        val keep = r.getInt(r.fieldIndex("keep"))
        // ranges: fractions bounded, counts non-negative, keep binary
        assert(nWords >= 0 && meanLen >= 0 && symbol >= 0 && nStop >= 0)
        assert(bullet >= 0 && bullet <= 1, s"bullet_frac $bullet out of [0,1]")
        assert(ellipsis >= 0 && ellipsis <= 1, s"ellipsis_frac $ellipsis out of [0,1]")
        assert(alpha >= 0 && alpha <= 1 + 1e-9, s"alpha_frac $alpha out of [0,1]")
        assert(keep == 0 || keep == 1)
        // empty / whitespace-only documents: all ratios at their
        // guarded zero, never kept. NOTE n_words may be 1-2, not 0:
        // Spark's trim strips ASCII spaces ONLY, so tab/newline
        // padding splits into empty tokens — the DuckDB oracle has
        // the same trim semantics (q_token_count pins the parity),
        // and the minWords floor drops such docs regardless
        if (text.replaceAll("\\s", "").isEmpty) {
          assert(meanLen == 0.0 && symbol == 0.0 && alpha == 0.0,
            s"empty doc stats leak: words=$nWords mean=$meanLen sym=$symbol alpha=$alpha")
          assert(nWords <= 2, s"whitespace-only doc counted $nWords words")
          assert(keep == 0, "an empty document must never be kept")
        }
        // all-bullet documents trip the bullet_frac > 0.9 drop
        val lines = text.split("\n", -1)
        if (lines.nonEmpty && lines.forall(l => Set("•", "-", "*").contains(l.trim.take(1)))) {
          assert(bullet == 1.0 && keep == 0, s"all-bullet doc kept: bullet=$bullet keep=$keep")
        }
        // keep == 1 implies every individual threshold actually holds
        // (the flag is the conjunction, recomputed from the row)
        if (keep == 1) {
          assert(nWords >= 50 && nWords <= 100000 && meanLen >= 3 && meanLen <= 10 &&
            symbol <= 0.1 && bullet <= 0.9 && ellipsis <= 0.3 && alpha >= 0.8 && nStop >= 2,
            s"keep=1 but a threshold fails: $r")
        }
      }
    }
  }

  test("random byte corruption of container payloads never throws (poison safety)") {
    import org.scalacheck.Gen
    import graft.pipeline.{Multimodal, WebIngest}
    import graft.testing.{MediaFixture, WebFixture}
    // EVERY parser runs over EVERY (possibly corrupted) payload kind —
    // at 100 TB a JPEG will reach the WARC splitter and vice versa,
    // and a poison row must degrade to null/unknown, never kill a task
    val caseGen = for {
      kind <- Gen.choose(0, 5)
      i <- Gen.choose(0L, 40L)
      nFlips <- Gen.choose(1, 8)
      seed <- Gen.choose(0, Int.MaxValue)
    } yield (kind, i, nFlips, seed)
    forAllSamples(Gen.listOfN(40, caseGen), n = 3) { cases =>
      for ((kind, i, nFlips, seed) <- cases) {
        val base = kind match {
          case 0 => MediaFixture.payload(i)
          case 1 => MediaFixture.mp4Payload(i)
          case 2 => WebFixture.warcHttpPayload(i)
          case 3 => WebFixture.chunkedPayload(i)
          case 4 => MediaFixture.imagePayload(i)
          case _ => WebFixture.gzipPayload(i)
        }
        val rnd = new scala.util.Random(seed)
        val b = base.clone()
        for (_ <- 0 until nFlips if b.nonEmpty) {
          val p = rnd.nextInt(b.length)
          b(p) = (b(p) ^ (1 << rnd.nextInt(8))).toByte
        }
        Multimodal.parseMediaHeader(b)
        Multimodal.mp4SampleTable(b)
        Multimodal.decodeImage(b)
        Multimodal.decodeWavSamples(b)
        Multimodal.wavAudioFeatures(b)
        WebIngest.warcSplit(b)
        WebIngest.dechunk(b)
        WebIngest.gunzip(b)
        WebIngest.httpParse(b, 0, b.length)
      }
    }
  }

  test("urlCanonical is idempotent: canon(canon(u)) == canon(u)") {
    val s = spark; import s.implicits._
    import org.scalacheck.Gen
    // generated URLs spanning the rule space (plus raw garbage, which
    // passes through trimmed and must also be a fixed point)
    val urlGen: Gen[String] = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "ftp", "")
      www <- Gen.oneOf("", "www.", "WWW.")
      host <- Gen.oneOf("Example.com", "a.B.c", "host7.example.COM")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/A/b", "/A/b/", "/x//")
      query <- Gen.oneOf("", "?b=2&a=1", "?utm_source=x", "?a=1&utm_medium=m&b=2", "?&&a=1")
      frag <- Gen.oneOf("", "#f", "#a=b")
      sep <- Gen.oneOf("://", "")
    } yield if (scheme.isEmpty || sep.isEmpty) s"$host$path$query$frag"
            else s"$scheme$sep$www$host$port$path$query$frag"
    forAllSamples(Gen.listOfN(60, urlGen)) { urls =>
      val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
      val once = graft.pipeline.UrlOps.withCanonicalUrl(df, "url")
        .select(col("id"), col("url_canon").as("url"))
      val twice = graft.pipeline.UrlOps.withCanonicalUrl(once, "url")
      val bad = twice.where(col("url") =!= col("url_canon"))
        .select("url", "url_canon").collect()
      assert(bad.isEmpty, s"not a fixed point: ${bad.take(3).mkString(", ")}")
    }
  }

  /** Independent RFC 9309 evaluator for the robots property test:
    * regex pattern matching (quoted segments joined by `.*`,
    * lookingAt for prefix semantics) and a functional group fold —
    * deliberately nothing in common with UrlOps' iterative greedy
    * matcher beyond the spec itself.
    */
  private def refRobotsEval(robots: String, userAgent: String, path: String): Boolean = {
    import java.util.regex.Pattern
    val prod = userAgent.toLowerCase(java.util.Locale.ROOT)
      .takeWhile(c => (c >= 'a' && c <= 'z') || c == '_' || c == '-')
    final case class PG(toks: List[String], rules: scala.collection.mutable.Buffer[(Boolean, String)])
    val gs = scala.collection.mutable.Buffer.empty[PG]
    var pendingToks = List.empty[String]
    var active: PG = null
    var prevWasUa = false
    for (raw <- robots.split("\n", -1)) {
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      val c = line.indexOf(':')
      if (c > 0) {
        val f = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        val v = line.substring(c + 1).trim
        if (f == "user-agent") {
          if (!prevWasUa) { pendingToks = Nil; active = null }
          pendingToks = v.toLowerCase(java.util.Locale.ROOT) :: pendingToks
          prevWasUa = true
        } else {
          if (prevWasUa && pendingToks.nonEmpty && active == null) {
            active = PG(pendingToks, scala.collection.mutable.Buffer.empty)
            gs += active
          }
          prevWasUa = false
          if ((f == "allow" || f == "disallow") && v.nonEmpty && active != null)
            active.rules += ((f == "allow", v))
        }
      }
    }
    if (prevWasUa && pendingToks.nonEmpty && active == null)
      gs += PG(pendingToks, scala.collection.mutable.Buffer.empty)
    def tokMatches(t: String): Boolean = t == "*" || (t.nonEmpty && prod.startsWith(t))
    def tokLen(t: String): Int = if (t == "*") 0 else t.length
    def patMatches(pat: String, p: String): Boolean = {
      val anchored = pat.endsWith("$")
      val body = (if (anchored) pat.dropRight(1) else pat)
        .split("\\*", -1).map(Pattern.quote).mkString(".*")
      val m = Pattern.compile("^" + body + (if (anchored) "$" else "")).matcher(p)
      if (anchored) m.matches() else m.lookingAt()
    }
    val lens = for (g <- gs; t <- g.toks if tokMatches(t)) yield tokLen(t)
    if (lens.isEmpty) return true
    val best = lens.max
    val merged = gs.filter(_.toks.exists(t => tokLen(t) == best && tokMatches(t))).flatMap(_.rules)
    val hits = merged.filter { case (_, pat) => patMatches(pat, path) }
    if (hits.isEmpty) true
    else {
      val maxLen = hits.map(_._2.length).max
      hits.filter(_._2.length == maxLen).exists(_._1) // Allow wins ties
    }
  }

  test("robotsAllowed matches an independent regex evaluator on random corpora (VERDICT r8 #8)") {
    import graft.pipeline.UrlOps.robotsAllowed
    val patGen: Gen[String] = for {
      n <- Gen.choose(0, 4)
      parts <- Gen.listOfN(n, Gen.oneOf("a", "b", "ab", "*", "/", "x", "$"))
      anchor <- Gen.oneOf("", "", "$")
    } yield "/" + parts.mkString + anchor
    val groupTextGen: Gen[String] = for {
      nua <- Gen.choose(1, 3)
      toks <- Gen.listOfN(nua, Gen.oneOf("*", "graftbot", "graft", "bot", "mega", "megabot", "graftbot-news"))
      uaCase <- Gen.oneOf("User-agent", "user-agent", "USER-AGENT", "User-Agent")
      // between the UA run and the rules: nothing, a field that closes
      // the run (crawl-delay), or lines the parser must no-op through
      extra <- Gen.oneOf(List.empty[String], List("Crawl-delay: 5"), List("# comment"), List(""))
      nrules <- Gen.choose(0, 4)
      rules <- Gen.listOfN(nrules, for {
        kind <- Gen.oneOf("Allow", "Disallow", "allow", "DISALLOW")
        pat <- Gen.frequency(9 -> patGen, 1 -> Gen.const("")) // empty value = no rule
      } yield s"$kind: $pat")
    } yield (toks.map(t => s"$uaCase: $t") ++ extra ++ rules).mkString("\n")
    val caseGen: Gen[(String, String, String)] = for {
      ngroups <- Gen.choose(1, 4)
      groups <- Gen.listOfN(ngroups, groupTextGen)
      ua <- Gen.oneOf("GraftBot/1.0 (+http://example.com/bot)",
        "Mozilla/5.0 (compatible; GraftBot/1.0)", "graftbot-news/2",
        "MegaBot", "mega", "Bot/0.1", "unknown-agent/9", "")
      nseg <- Gen.choose(0, 6)
      segs <- Gen.listOfN(nseg, Gen.oneOf("a", "b", "x", "/"))
    } yield (groups.mkString("\n\n"), ua, "/" + segs.mkString)
    forAllSamples(caseGen, n = 200) { case (robots, ua, path) =>
      val got = robotsAllowed(robots, ua, path)
      val want = refRobotsEval(robots, ua, path)
      assert(got == want,
        s"robotsAllowed=$got, reference=$want for ua='$ua' path='$path' robots:\n$robots")
    }
  }

  test("winnow kernel == naive reference over random texts, all (k, w)") {
    val s = spark; import s.implicits._
    // an independent naive evaluator (same spec as PipelineSpec's,
    // here swept over random texts and parameter pairs)
    def naive(text: String, k: Int, w: Int): Set[(Int, Long)] = {
      val t = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.replaceAll("\\s+", " ")
      if (t.length < k) return Set.empty
      val hs = (0 to t.length - k).map { j =>
        t.substring(j, j + k).foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
      }
      (0 to math.max(hs.length - w, 0)).map { st =>
        val win = hs.zipWithIndex.slice(st, math.min(st + w, hs.length))
        val mh = win.map(_._1).min
        (win.filter(_._1 == mh).map(_._2).max, mh)
      }.toSet
    }
    val textGen = for {
      n <- Gen.choose(0, 60)
      cs <- Gen.listOfN(n, Gen.frequency(
        (6, Gen.alphaLowerChar), (2, Gen.numChar), (1, Gen.const(' ')),
        (1, Gen.oneOf('!', '.', 'X', 'é'))))
      k <- Gen.choose(1, 8)
      w <- Gen.choose(1, 6)
    } yield (cs.mkString, k, w)
    forAllSamples(textGen, n = 120) { case (text, k, w) =>
      val got = graft.pipeline.TextAnalysis
        .winnowFingerprintRows(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", k, w)
        .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
      assert(got == naive(text, k, w),
        s"winnow mismatch for k=$k w=$w text='$text': got $got want ${naive(text, k, w)}")
    }
  }

  test("exact percentile cuts: both physical paths equal the builtin on random frames") {
    // random group keys INCLUDING NULL, heavy duplicates, NaN/null
    // values, random percentile vectors — the distributed rank
    // pipeline and the builtin aggregate must agree bitwise on all
    // of it (the r12 NULL-group fix came from exactly this gap)
    val s = spark; import s.implicits._
    val frameGen = for {
      n <- Gen.choose(3, 35)
      keys <- Gen.listOfN(n, Gen.oneOf("a", "b", null, "c"))
      vals <- Gen.listOfN(n, Gen.frequency(
        (6, Gen.choose(-50.0, 50.0)),
        (3, Gen.oneOf(1.0, 2.0, 2.0, 7.5)), // duplicates
        (1, Gen.oneOf(Double.NaN, Double.NaN))))
      nps <- Gen.choose(1, 4)
      ps <- Gen.listOfN(nps, Gen.choose(0.0, 1.0))
    } yield (keys.zip(vals), ps)
    val key = "graft.percentiles.distributedThresholdBytes"
    forAllSamples(frameGen, n = 8) { case (rows, ps) =>
      val df = rows.zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }
        .toDF("id", "k", "v")
      val builtin = df.groupBy("k")
        .agg(percentile(when(isnan(col("v")), lit(null)).otherwise(col("v")),
          lit(ps.toArray)).as("c"))
        .collect()
        .map(r => Option(r.getString(0)) ->
          Option(r.getSeq[java.lang.Double](1)).map(_.toList))
        .toMap
      Seq("0", null).foreach { forced =>
        if (forced == null) spark.conf.unset(key) else spark.conf.set(key, forced)
        try {
          val got = graft.operators.Percentiles.cuts(df, col("v"), Seq("k"), ps)
            .collect()
            .map(r => Option(r.getString(0)) ->
              Option(r.getSeq[java.lang.Double](1)).map(_.toList))
            .toMap
          // groups whose every value is NaN produce no row (distributed)
          // or a null-array row (builtin groupBy still emits the key);
          // compare on the non-degenerate groups and require the
          // degenerate ones to carry no values on either side
          (builtin.keySet ++ got.keySet).foreach { k =>
            val b = builtin.get(k).flatten.getOrElse(Nil).filter(_ != null)
            val g = got.get(k).flatten.getOrElse(Nil).filter(_ != null)
            assert(b == g, s"path=$forced group=$k ps=$ps rows=$rows: got $g want $b")
          }
        } finally spark.conf.unset(key)
      }
      graft.Cleanup.drain()
    }
  }
}
