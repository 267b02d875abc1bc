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
      .select(col(idCol))
    keyed.join(keepers, Seq(idCol), "left_semi")
      .unionByName(withCanon.where(col("url_canon").isNull))
  }
}
