package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Scratch divergence hunter for the speculative BPE trainer (test
  * sourceset; not part of the library). Randomly samples tiny-alphabet
  * corpora and compares the forced-distributed trainer to the
  * sequential reference. Usage: Test/runMain graft.pipeline.BpeHunt <seed0> <n>
  */
object BpeHunt {
  def localTrain(texts: Seq[String], numMerges: Int): Seq[(String, String)] = {
    var vocab: Map[Vector[String], Long] = texts
      .flatMap(_.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w.map(_.toString).toVector -> ws.size.toLong }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (toks, c) =>
        toks.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ => ()
        }
      }
      val eligible = counts.filter(_._2 >= 2)
      if (eligible.isEmpty) done = true
      else {
        val (pair, _) = eligible.minBy { case ((a, b), c) => (-c, a, b) }
        merges += pair
        vocab = vocab.map { case (toks, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i < toks.length - 1 && toks(i) == pair._1 && toks(i + 1) == pair._2) {
              out += pair._1 + pair._2; i += 2
            } else { out += toks(i); i += 1 }
          }
          out.result() -> c
        }.groupBy(_._1).map { case (t, m) => t -> m.values.sum }
      }
    }
    merges.toSeq
  }

  def main(args: Array[String]): Unit = {
    val seed0 = if (args.length > 0) args(0).toLong else 1L
    val n = if (args.length > 1) args(1).toInt else 200
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.conf.set("graft.bpe.driverVocabLimit", "0")
    var found = 0
    for (seed <- seed0 until (seed0 + n) if found < 3) {
      val rnd = new scala.util.Random(seed)
      val nDocs = 1 + rnd.nextInt(3)
      val docs = (0 until nDocs).map { _ =>
        val nWords = 1 + rnd.nextInt(6)
        (0 until nWords).map { _ =>
          val len = 1 + rnd.nextInt(10)
          (0 until len).map(_ => if (rnd.nextBoolean()) "a" else "b").mkString
        }.mkString(" ")
      }
      for (cand <- Seq("4", "6", "512"); win <- Seq("12"); samp <- Seq("1", (1 << 16).toString)) {
        spark.conf.set("graft.bpe.speculationSample", samp)
        spark.conf.set("graft.bpe.candidatePairs", cand)
        spark.conf.set("graft.bpe.speculationWindow", win)
        val nm = 14
        val got = TextAnalysis.bpeTrainMerges(docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"), "text", nm)
        val want = localTrain(docs, nm)
        if (got != want) {
          found += 1
          println(s"DIVERGE seed=$seed cand=$cand win=$win samp=$samp")
          println(s"  corpus=${docs.mkString(" || ")}")
          println(s"  got =$got")
          println(s"  want=$want")
        }
      }
    }
    if (found == 0) println("NO-DIVERGENCE")
    spark.stop()
  }
}
