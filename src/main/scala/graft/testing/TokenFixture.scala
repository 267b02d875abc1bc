package graft.testing

/** Closed-form BPE fixtures for [[graft.pipeline.TextAnalysis
  * .bpeTokensUdf]]: a tiny trained merge table and texts whose final
  * tokenization is known in closed form, so the oracle emits the
  * expected token count directly while the engine runs the real
  * greedy merge loop.
  *
  * Under [[merges]]: "hello" -> 1 token (the full merge chain),
  * "helz" -> 2 (h+e, he+l, then stuck), "xyz" -> 2 (x+y, stuck),
  * "abc" -> 3 (no merges apply).
  */
object TokenFixture {

  val merges: Seq[(String, String)] =
    Seq("h" -> "e", "he" -> "l", "hel" -> "l", "hell" -> "o", "x" -> "y")

  def text(i: Long): String = {
    val a = 1 + (i % 4).toInt
    val b = (i % 3).toInt
    val c = 1 + (i % 5).toInt
    val d = (i % 2).toInt
    (Seq.fill(a)("hello") ++ Seq.fill(b)("helz") ++
      Seq.fill(c)("xyz") ++ Seq.fill(d)("abc")).mkString(" ")
  }

  /** (1 + i%4)*1 + (i%3)*2 + (1 + i%5)*2 + (i%2)*3, mirrored in SQL. */
  def expectedTokens(i: Long): Long =
    (1 + i % 4) + (i % 3) * 2 + (1 + i % 5) * 2 + (i % 2) * 3
}
