package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-keyed dedup — the first dedup pass of
  * every web-crawl corpus (pages are re-crawled under trivially
  * different URLs far more often than their text changes).
  *
  * The canonical form follows the common crawl-pipeline rules:
  * lowercase scheme and host, strip a `www.` host prefix, strip the
  * scheme's default port (`:80` http / `:443` https), drop the
  * fragment, drop tracking query params (`utm_*`, `gclid`, `fbclid`),
  * sort the surviving params byte-wise, and collapse the path's
  * trailing slashes (root stays `/`; an empty path becomes `/`).
  * Path CASE is preserved — paths are case-sensitive on most servers,
  * so lowercasing them would merge distinct documents.
  *
  * Built entirely from Spark's native string/array expressions (one
  * pass of regexps + a lambda filter/sort over the split params) —
  * no UDF, no JVM URL parser (java.net.URL resolves hosts; URI
  * throws on the malformed URLs a 100 TB crawl is full of). Strings
  * without a `scheme://` pass through trimmed and otherwise
  * untouched: poison rows degrade, never throw.
  */
object UrlOps {

  private val trackingPrefixes = Seq("utm_", "gclid=", "fbclid=")

  /** Canonical form of a URL column (see object doc for the rules). */
  def urlCanonical(u: Column): Column = {
    val t = trim(u)
    // fragment first: nothing after '#' survives in any component
    val noFrag = regexp_replace(t, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = regexp_extract(rest, "^([^/?]*)", 1)
    val tail = rest.substr(length(hostport) + 1, lit(1 << 24))
    val hostLower = lower(hostport)
    val hostNoPort = when(scheme === "http", regexp_replace(hostLower, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostLower, ":443$", ""))
      .otherwise(hostLower)
    val host = regexp_replace(hostNoPort, "^www\\.", "")
    val path = regexp_extract(tail, "^([^?]*)", 1)
    val query = tail.substr(length(path) + 2, lit(1 << 24))
    val kept = filter(split(query, "&"), p =>
      length(p) > 0 && !trackingPrefixes.map(pre => p.startsWith(pre)).reduce(_ || _))
    val params = array_join(array_sort(kept), "&")
    val normPath = {
      val collapsed = regexp_replace(path, "/+$", "")
      when(collapsed === "", lit("/")).otherwise(collapsed)
    }
    val canon = concat(scheme, lit("://"), host, normPath,
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
    // no scheme -> not a URL we understand: pass through trimmed
    when(scheme === "", t).otherwise(canon)
  }

  /** Attach `url_canon` derived from `urlCol`. Pure per-row codegen'd
    * expressions — pipelines with the scan, no shuffle.
    */
  def withCanonicalUrl(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("url_canon", urlCanonical(col(urlCol)))

  /** The canonical HOST of a URL column (the [[urlCanonical]] host
    * rules alone: lowercase, default port stripped, `www.` prefix
    * dropped) — the grouping key for host-level aggregation (per-host
    * crawl budgets, [[Graph.hostEdges]] domain centrality). Strings
    * without a `scheme://` yield the empty string: poison rows
    * degrade, never throw.
    */
  def urlHost(u: Column): Column = {
    val noFrag = regexp_replace(trim(u), "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostLower = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val hostNoPort = when(scheme === "http", regexp_replace(hostLower, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostLower, ":443$", ""))
      .otherwise(hostLower)
    when(scheme === "", lit("")).otherwise(regexp_replace(hostNoPort, "^www\\.", ""))
  }

  // ---- outlink extraction (the web-graph primitive) ---------------

  private val baseRe = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*).*$".r

  /** RFC 3986 dot-segment removal over a path (no query/fragment).
    * "." segments drop, ".." pops (never past the root). The
    * trailing-slash-after-dot-segment nuance is normalized away —
    * [[urlCanonical]] collapses trailing slashes downstream anyway.
    */
  private def removeDotSegments(p: String): String = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    for (seg <- p.split("/", -1)) seg match {
      case "." => ()
      case ".." => if (out.nonEmpty) out.remove(out.length - 1)
      case s => out += s
    }
    val joined = out.filter(_.nonEmpty).mkString("/")
    "/" + joined
  }

  /** Resolve an href against its page URL (RFC 3986 §5 reference
    * resolution, the subset a crawl needs): absolute URLs pass
    * through; `//host/...` inherits the base scheme; `/path` is
    * root-relative; anything else resolves against the base path's
    * directory with dot segments removed. Non-navigational schemes
    * (javascript/mailto/data/tel) and un-parseable bases return null.
    * Pure string work — no java.net (URI throws on crawl-grade
    * garbage).
    */
  def resolveHref(base: String, href: String): String = {
    if (base == null || href == null) return null
    val h = href.trim
    if (h.isEmpty) return null
    if (h.matches("^[A-Za-z][A-Za-z0-9+.-]*://.*")) return h
    // ANY other scheme'd reference (javascript:, mailto:, about:,
    // sms:, news:...) is absolute per RFC 3986 but not a web
    // document — drop it rather than merge it with the base path
    // into a phantom edge. (A relative first segment containing ':'
    // must be written './a:b' per the RFC, so this is the spec rule,
    // not a heuristic.)
    if (h.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")) return null
    base match {
      case baseRe(scheme, auth, basePath) =>
        if (h.startsWith("//")) scheme + ":" + h
        else {
          // split the reference's own path from its query
          val q = h.indexOf('?')
          val (refPath, refQuery) = if (q >= 0) (h.substring(0, q), h.substring(q)) else (h, "")
          val merged =
            if (refPath.isEmpty) basePath // query-only ref: RFC 3986 §5.3 keeps the base path
            else if (refPath.startsWith("/")) refPath
            else {
              val dir = basePath.lastIndexOf('/') match {
                case -1 => "/"
                case k => basePath.substring(0, k + 1)
              }
              dir + refPath
            }
          scheme + "://" + auth + removeDotSegments(merged) + refQuery
        }
      case _ => null
    }
  }

  private val resolveHrefUdf = udf((base: String, href: String) => resolveHref(base, href))

  /** Extract a page's outlinks: `href` values of `<a>` tags (single-
    * or double-quoted; pure-fragment links skipped), resolved against
    * the page URL and canonicalized — one `(idCol, link_idx,
    * outlink)` row per surviving link. The edge list of the web
    * graph, ready for link-analysis scoring. Extraction is a
    * codegen'd `regexp_extract_all`; only the resolver is a scalar
    * UDF. Per-row work, no shuffle.
    */
  def outlinks(df: DataFrame, idCol: String, urlCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol), col(urlCol).as("__base__"),
        // href must follow whitespace or a quote: \bhref would also
        // match data-href (the hyphen is a word boundary), and the
        // greedy [^>]* could then backtrack onto the WRONG attribute
        posexplode(regexp_extract_all(col(htmlCol),
          lit("(?i)<a\\b[^>]*[\\s'\"]href\\s*=\\s*['\"]([^'\"#]+)"), lit(1)))
          .as(Seq("link_idx", "__href__")))
      .withColumn("outlink", urlCanonical(resolveHrefUdf(col("__base__"), col("__href__"))))
      .where(col("outlink").isNotNull)
      .select(col(idCol), col("link_idx"), col("outlink"))

  // ---- robots.txt (RFC 9309) evaluation ---------------------------

  /** One parsed robots.txt rule: allow/disallow + its path pattern
    * (RFC 9309 syntax: literal prefix, `*` wildcards, `$` end
    * anchor).
    */
  private final case class RobotsRule(allow: Boolean, pattern: String)

  /** Does `pattern` match `path` under RFC 9309 rules? `*` matches
    * any span, a trailing `$` anchors the end, otherwise the pattern
    * is a prefix match. Iterative greedy matcher — no regex
    * compilation per row.
    */
  private def robotsMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    // greedy segment match: split on '*', find segments left to right
    val segs = p.split("\\*", -1)
    var pos = 0
    var first = true
    for (seg <- segs.dropRight(1)) {
      if (first) {
        if (!path.startsWith(seg, pos)) return false
        pos += seg.length
        first = false
      } else if (seg.nonEmpty) {
        val k = path.indexOf(seg, pos)
        if (k < 0) return false
        pos = k + seg.length
      }
    }
    val last = segs.last
    if (segs.length == 1) {
      // no wildcard: plain prefix (or exact with anchor)
      if (anchored) path == p else path.startsWith(p)
    } else if (anchored) {
      path.endsWith(last) && path.length - last.length >= pos
    } else {
      if (last.isEmpty) true else path.indexOf(last, pos) >= 0
    }
  }

  /** Evaluate robots.txt for (userAgent, path) — RFC 9309: groups
    * select by case-insensitive match of their user-agent token
    * against the crawler's PRODUCT TOKEN — the leading
    * letters/underscores/hyphens run of the UA string, i.e.
    * `GraftBot/1.0 (+http://…)` matches as `graftbot` (RFC 9309
    * §2.2.1; substring matching over the full UA would let a generic
    * token like `bot` capture every crawler whose comment mentions
    * one). `*` is the fallback matching all. All groups with the
    * winning token merge (the longest matching token wins when
    * several match, e.g. a prefix token vs the exact one); the
    * decision is the longest-pattern-match among the merged rules,
    * Allow winning length ties; no matching rule (or no matching
    * group, or unparseable input) means allowed — robots.txt is
    * advisory-restrictive, so absence of a rule is permission.
    */
  /** One parsed robots.txt group: its UA tokens, rules, and the
    * first parseable non-negative Crawl-delay seen in it (-1 when
    * absent — Crawl-delay is de-facto, not RFC 9309, but every
    * polite crawler honors it).
    */
  private final class RobotsGroup(val uas: List[String]) {
    val rules = scala.collection.mutable.ArrayBuffer.empty[RobotsRule]
    var crawlDelay: Double = -1
  }

  /** The RFC 9309 product token of a crawler UA string: its leading
    * letters/underscores/hyphens run, lowercased.
    */
  private def productToken(userAgent: String): String = {
    val uaFull = if (userAgent == null) "" else userAgent.toLowerCase(java.util.Locale.ROOT)
    uaFull.takeWhile(c => (c >= 'a' && c <= 'z') || c == '_' || c == '-')
  }

  /** Parse robots.txt into its groups plus the file-global `Sitemap:`
    * values (RFC 9309 §2.2.4: sitemaps are not group-scoped).
    */
  private def parseRobots(robots: String): (Seq[RobotsGroup], Seq[String]) = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[RobotsGroup]
    val sitemaps = scala.collection.mutable.ArrayBuffer.empty[String]
    var curUas: List[String] = Nil
    var cur: RobotsGroup = null
    var uaRun = false // consecutive UA lines share one group
    // a group REGISTERS as soon as its UA run ends on ANY field —
    // a group holding only Crawl-delay (no allow/disallow) must
    // still exist, because an empty specific group SHADOWS '*' and
    // means fully allowed (RFC 9309)
    def closeUaRun(): Unit = {
      uaRun = false
      if (curUas.nonEmpty && cur == null) {
        cur = new RobotsGroup(curUas)
        groups += cur
      }
    }
    for (raw <- robots.split("\n", -1)) {
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!uaRun) { curUas = Nil; cur = null }
            curUas = value.toLowerCase(java.util.Locale.ROOT) :: curUas
            uaRun = true
          case "allow" | "disallow" =>
            closeUaRun()
            // an empty Disallow value means "allow everything":
            // representable as no rule at all
            if (cur != null && value.nonEmpty)
              cur.rules += RobotsRule(field == "allow", value)
          case "crawl-delay" =>
            closeUaRun()
            if (cur != null && cur.crawlDelay < 0)
              value.toDoubleOption.filter(_ >= 0).foreach(cur.crawlDelay = _)
          case "sitemap" =>
            closeUaRun()
            if (value.nonEmpty) sitemaps += value
          case _ => closeUaRun() // unknown fields
        }
      }
    }
    closeUaRun() // a file ending inside a UA run still defines the group
    (groups.toSeq, sitemaps.toSeq)
  }

  /** The groups a crawler obeys: the ones carrying the longest UA
    * token that prefixes the crawler's product token (prefix, not
    * equality, so a `graftbot` group still captures a
    * `graftbot-news` crawler — the RFC 9309 most-specific-group
    * convention); `*` is the length-0 fallback. Empty when nothing
    * matches (not even `*`).
    */
  private def selectGroups(groups: Seq[RobotsGroup], ua: String): Seq[RobotsGroup] = {
    var bestLen = -1
    for (g <- groups; tok <- g.uas)
      if (tok == "*" || (tok.nonEmpty && ua.startsWith(tok))) {
        val l = if (tok == "*") 0 else tok.length
        if (l > bestLen) bestLen = l
      }
    if (bestLen < 0) Nil
    else groups.filter(_.uas.exists(tok =>
      (if (tok == "*") 0 else tok.length) == bestLen &&
        // an EMPTY token matches nothing (mirroring the scoring
        // pass): ua.startsWith("") is vacuously true and would
        // merge a group the selector already rejected
        (tok == "*" || (tok.nonEmpty && ua.startsWith(tok)))))
  }

  def robotsAllowed(robots: String, userAgent: String, path: String): Boolean = {
    if (robots == null || path == null) return true
    val selected = selectGroups(parseRobots(robots)._1, productToken(userAgent))
    if (selected.isEmpty) return true
    // decision: longest matching pattern wins, Allow wins ties
    var decision = true
    var matchLen = -1
    for (g <- selected; r <- g.rules if robotsMatches(r.pattern, path)) {
      if (r.pattern.length > matchLen ||
          (r.pattern.length == matchLen && r.allow && !decision)) {
        matchLen = r.pattern.length
        decision = r.allow
      }
    }
    decision
  }

  /** The Crawl-delay the crawler should honor: the MINIMUM delay
    * among its selected groups that declare one (merged groups could
    * disagree; the conservative read is the polite one). -1 when no
    * selected group declares a delay, or no group matches.
    */
  def robotsCrawlDelay(robots: String, userAgent: String): Double = {
    if (robots == null) return -1
    val withDelay = selectGroups(parseRobots(robots)._1, productToken(userAgent))
      .filter(_.crawlDelay >= 0)
    if (withDelay.isEmpty) -1 else withDelay.map(_.crawlDelay).min
  }

  /** Every `Sitemap:` value in the file, in order — group-agnostic
    * per RFC 9309 §2.2.4. Empty for null input.
    */
  def robotsSitemaps(robots: String): Seq[String] =
    if (robots == null) Nil else parseRobots(robots)._2

  private val robotsUdf = udf((robots: String, ua: String, path: String) =>
    robotsAllowed(robots, ua, path))

  /** Attach `allowed`: the robots.txt verdict for each (robots, ua,
    * path) row. Per-row work, no shuffle — join the host's robots
    * payload onto its pages first (a broadcast join for any real
    * host count).
    */
  def withRobotsDecision(df: DataFrame, robotsCol: String, uaCol: String,
                         pathCol: String): DataFrame =
    df.withColumn("allowed", robotsUdf(col(robotsCol), col(uaCol), col(pathCol)))

  private val crawlDelayUdf = udf((robots: String, ua: String) => robotsCrawlDelay(robots, ua))
  private val sitemapsUdf = udf((robots: String) => robotsSitemaps(robots))

  /** Attach `crawl_delay` (the UA's selected-group minimum, -1 when
    * undeclared) and `sitemaps` (the file's Sitemap values, group-
    * agnostic) — the politeness/discovery half of the robots
    * surface, feeding the host scheduler and [[sitemapEntries]].
    */
  def withRobotsMeta(df: DataFrame, robotsCol: String, uaCol: String): DataFrame =
    df.withColumn("crawl_delay", crawlDelayUdf(col(robotsCol), col(uaCol)))
      .withColumn("sitemaps", sitemapsUdf(col(robotsCol)))

  /** Keep one row per canonical URL — the lowest `idCol` (the usual
    * "earliest crawl wins" rule; pass a different preference column
    * for recency-wins). One hash-aggregate shuffle keyed on the
    * canonical string, the [[Dedup.dedupExact]] shape.
    *
    * Rows whose url column is NULL pass through untouched: a missing
    * URL is the absence of a key, not a shared key — grouping nulls
    * together would silently collapse every url-less document into
    * one survivor.
    */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val withCanon = withCanonicalUrl(df, urlCol)
    val keyed = withCanon.where(col("url_canon").isNotNull)
    val keepers = keyed
      .groupBy(col("url_canon"))
      .agg(min(col(idCol)).as(idCol))
    // semi-join on BOTH (url_canon, id): keying on id alone would
    // assume globally unique ids — a duplicated id that wins one
    // canonical class would also keep its rows in classes it lost
    keyed.join(keepers, Seq("url_canon", idCol), "left_semi")
      .unionByName(withCanon.where(col("url_canon").isNull))
  }

  // ---- sitemap.xml parsing ----------------------------------------

  /** Decode the five predefined XML entities (the ones the sitemap
    * protocol requires escaping in `<loc>`). Numeric character
    * references are passed through untouched — a rarity in sitemap
    * URLs, and keeping the chain pure builtins keeps the whole
    * parse codegen'd.
    */
  private def xmlUnescape(c: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&amp;" -> "&") // &amp; LAST: "&amp;lt;" means literal "&lt;"
    steps.foldLeft(c) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }
  }

  /** Explode sitemap XML into its entries — `<urlset>` page URLs and
    * `<sitemapindex>` child sitemaps in one frame, distinguished by
    * `kind` ('url' / 'sitemap'), with the entity-decoded `loc` and
    * the optional `lastmod` (null when absent). The whole parse is
    * codegen'd builtins (block + field extraction via
    * `regexp_extract_all` with DOTALL, crawl-tolerant of attributes,
    * whitespace and namespace noise — the lenient stance every real
    * crawler takes, since feed XML is routinely malformed); rows
    * that aren't sitemaps simply contribute no entries. Per-row
    * work, no shuffle.
    */
  def sitemapEntries(df: DataFrame, idCol: String, xmlCol: String): DataFrame = {
    def family(kind: String, block: String): DataFrame =
      df.select(col(idCol),
          posexplode(regexp_extract_all(col(xmlCol),
            lit(s"(?is)<$block(?:\\s[^>]*)?>(.*?)</$block\\s*>"), lit(1)))
            .as(Seq("entry_idx", "__blk__")))
        .select(col(idCol), lit(kind).as("kind"), col("entry_idx"),
          xmlUnescape(nullif(regexp_extract(col("__blk__"),
            "(?is)<loc(?:\\s[^>]*)?>\\s*(.*?)\\s*</loc\\s*>", 1), lit(""))).as("loc"),
          nullif(regexp_extract(col("__blk__"),
            "(?is)<lastmod(?:\\s[^>]*)?>\\s*(.*?)\\s*</lastmod\\s*>", 1), lit("")).as("lastmod"))
        .where(col("loc").isNotNull)
    // <url> blocks never nest in <sitemap> blocks (disjoint roots),
    // so the union is a disjoint partition of the entries
    family("url", "url").unionByName(family("sitemap", "sitemap"))
  }
}
