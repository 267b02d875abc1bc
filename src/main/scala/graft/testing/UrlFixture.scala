package graft.testing

/** Closed-form messy-URL fixtures for [[graft.pipeline.UrlOps]]: the
  * canonical content of row i is keyed on n = i % 100 (so five rows
  * share each canonical URL), and the messiness variant cycles with
  * i / 100 — reversed param order, uppercase scheme/host + default
  * port + fragment, `www.` + utm_* params, trailing slashes, and
  * gclid/fbclid trackers. Every variant canonicalizes to
  * [[canonical]](n), which the DuckDB oracle emits directly — the
  * strongest possible check: the oracle states the ANSWER, not a
  * reimplementation of the parser.
  */
object UrlFixture {

  /** The canonical URL of content class n (mirrored in oracle SQL).
    * The path keeps a capital letter: canonicalization must preserve
    * path case while lowering scheme and host.
    */
  def canonical(n: Long): String =
    s"http://host${n % 7}.example.com/Doc/$n?a=${n % 13}&b=${n % 7}"

  /** Outlink fixtures (mirrored by the q_outlinks oracle): a page at
    * /a/b/ depth with one href per resolution rule — absolute,
    * scheme-relative, root-relative, path-relative, dot-segment, and
    * two non-navigational links the extractor must drop.
    */
  def pageUrl(i: Long): String = s"http://www.Example.com/a/b/page$i.html"

  def pageHtml(i: Long): String =
    s"""<html><body>
       |<a href="HTTPS://Other.com/Abs$i">x</a>
       |<a href='//cdn.example.org/lib$i.js'>y</a>
       |<a href="/root/p$i?x=1">z</a>
       |<a href="sub/page$i">w</a>
       |<a href="../up$i">v</a>
       |<a href="javascript:void(0)">j</a>
       |<a href="#frag">f</a>
       |</body></html>""".stripMargin

  /** robots.txt fixtures (mirrored by the q_robots oracle): a `*`
    * group (prefix Disallow overridden by a longer Allow) and a
    * `graftbot` group (anchored + wildcard Disallows, a Crawl-delay
    * line the parser must skip). Even ids crawl as GraftBot (the
    * specific group wins), odd as OtherBot (falls back to `*`).
    * Expected verdicts: GraftBot blocked on paths 3 (`/only$` exact)
    * and 5 (`/img*jpg`); OtherBot blocked on path 1 (`/private`
    * prefix, path 2 rescued by the longer Allow).
    */
  /** The fallback group carries a closed-form Crawl-delay (2 + i%5)
    * and the file two Sitemap lines — the metadata q_robots_meta
    * reads; both are verdict-neutral for q_robots (they close no UA
    * run that allow/disallow lines would not).
    */
  def robotsTxt(i: Long): String =
    s"""# fixture $i
       |Sitemap: https://ex$i.example.com/sitemap0.xml
       |User-agent: *
       |Disallow: /private
       |Allow: /private/ok
       |Crawl-delay: ${2 + i % 5}
       |
       |User-agent: graftbot
       |Disallow: /only$$
       |Disallow: /img*jpg
       |Crawl-delay: 5
       |Sitemap: https://ex$i.example.com/sitemap1.xml.gz
       |""".stripMargin

  def robotsUa(i: Long): String = if (i % 2 == 0) "GraftBot/1.0" else "OtherBot/2.0"

  /** Path keyed on (i / 2) % 6 — DECORRELATED from the i % 2 UA
    * choice (i % 6 would share the factor 2 and leave half the
    * (ua, path) combinations untested — both bots must see every
    * path shape for the oracle to gate the anchored, wildcard and
    * Allow-rescue rules).
    */
  def robotsPath(i: Long): String = ((i / 2) % 6) match {
    case 0 => s"/public/x$i"
    case 1 => s"/private/x$i"
    case 2 => s"/private/ok/x$i"
    case 3 => "/only"
    case 4 => s"/only/sub$i"
    case _ => s"/img$i.jpg"
  }

  def messyUrl(i: Long): String = {
    val n = i % 100
    val h = n % 7; val x = n % 13; val y = n % 7
    (i / 100) % 5 match {
      case 0 => s"http://host$h.example.com/Doc/$n?b=$y&a=$x"
      case 1 => s"HTTP://Host$h.Example.COM:80/Doc/$n?b=$y&a=$x#sec$i"
      case 2 => s"http://www.host$h.example.com/Doc/$n?utm_source=feed&a=$x&b=$y&utm_campaign=c$i"
      case 3 => s"http://host$h.example.com/Doc/$n//?a=$x&b=$y"
      case _ => s"http://host$h.example.com/Doc/$n?gclid=g$i&b=$y&fbclid=f$i&a=$x#x"
    }
  }

  /** Closed-form sitemap fixtures (mirrored by the q_sitemap
    * oracle): even i a `<urlset>` of 2 + i%5 page urls (locs carry
    * an `&amp;` entity the parser must decode and whitespace it must
    * trim; even entries carry a lastmod, odd ones none), odd i a
    * `<sitemapindex>` of 2 + i%5 child sitemaps; every i % 11 == 10
    * payload is not a sitemap at all and yields no entries. The
    * urlset root carries the protocol xmlns, blocks carry stray
    * attributes and the XML is deliberately whitespace-noisy — the
    * lenient-crawler surface.
    */
  def sitemapEntryCount(i: Long): Int = (2 + i % 5).toInt

  def sitemapLoc(i: Long, j: Int): String =
    if (i % 2 == 0) s"https://ex$i.example.com/p/$j?a=${j % 3}&b=$i"
    else s"https://ex$i.example.com/sitemap$j.xml.gz"

  def sitemapLastmod(i: Long, j: Int): String = s"20${10 + i % 15}-0${1 + j % 9}-15"

  def sitemapXml(i: Long): String = {
    if (i % 11 == 10) return s"<html><body>not a sitemap $i</body></html>"
    val n = sitemapEntryCount(i)
    if (i % 2 == 0) {
      val urls = (0 until n).map { j =>
        val loc = sitemapLoc(i, j).replace("&", "&amp;")
        val lm = if (j % 2 == 0) s"\n    <lastmod> ${sitemapLastmod(i, j)} </lastmod>" else ""
        s"""  <url data-extra="x$j">\n    <loc>\n      $loc\n    </loc>$lm\n  </url>"""
      }
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
        urls.mkString("\n") + "\n</urlset>\n"
    } else {
      val maps = (0 until n).map { j =>
        val lm = if (j % 2 == 0) s"<lastmod>${sitemapLastmod(i, j)}</lastmod>" else ""
        s"<sitemap><loc> ${sitemapLoc(i, j)} </loc>$lm</sitemap>"
      }
      "<?xml version=\"1.0\"?><sitemapindex>" + maps.mkString + "</sitemapindex>"
    }
  }
}
