package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL hygiene for web-crawl corpora. The reference carries a per-doc
  * `url` field through its whole pipeline (filters.py:632,653 — doc
  * metadata) but never processes it; large-corpus practice (CCNet,
  * RefinedWeb) dedups by NORMALIZED url and filters by domain
  * blocklist before any content work, because it's orders of magnitude
  * cheaper than content dedup. These are the column functions for that
  * stage — all row-local codegen'd string ops (regexp over Java/RE2
  * common syntax, mirrorable in the oracle), so the stage is a pure
  * map over the scan at any scale.
  */
object Url {

  /** Lowercased host[:port] part. */
  def hostport(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1))

  /** Path part (may be empty), before query/fragment. */
  def path(url: Column): Column =
    regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)

  /** Query string without the leading '?' (empty if none). */
  def query(url: Column): Column =
    regexp_extract(url, "\\?([^#]*)", 1)

  /** Host with the default-https port and a leading www. stripped. */
  def host(url: Column): Column =
    regexp_replace(regexp_replace(hostport(url), ":443$", ""), "^www\\.", "")

  /** Naive registered domain: the last two host labels. (Deliberately
    * NOT the public-suffix list — no external data; documents the
    * divergence: co.uk-style suffixes fold to the suffix itself.) */
  def registeredDomain(url: Column): Column =
    regexp_extract(host(url), "([^.]+\\.[^.]+)$", 1)

  /** Canonical form for URL-level dedup: https-folded scheme,
    * lowercased host, default port and www. stripped, trailing path
    * slash stripped, utm_* tracking params removed, fragment dropped. */
  def normalize(url: Column): Column = {
    val cpath = regexp_replace(path(url), "/$", "")
    val cq = regexp_replace(
      regexp_replace(query(url), "(^|&)utm_[^&]*", ""), "^&", "")
    concat(lit("https://"), host(url), cpath,
      when(cq =!= "", concat(lit("?"), cq)).otherwise(lit("")))
  }

  /** Slash-count path depth. */
  def pathDepth(url: Column): Column = {
    val p = path(url)
    (length(regexp_replace(p, "/$", "")) -
      length(regexp_replace(regexp_replace(p, "/$", ""), "/", ""))).cast("long")
  }
}
