package graft.extra

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII / URL scrubbing for training corpora: redact emails, URLs and IPv4
  * addresses and count what was removed — the standard pre-training scrub
  * pass (and its audit trail). Pure `regexp_replace`/`regexp_extract_all`
  * column expressions: codegen'd, shuffle-free, linear at any scale.
  *
  * Pattern dialect note: Spark compiles Java regex, DuckDB (the oracle)
  * RE2 — the patterns below stay inside the common subset (character
  * classes, bounded repetition, `\b`), no backrefs or lookaround, so both
  * engines match identically.
  */
object TextScrub {

  // (?i): emails/URLs are case-insensitive in the wild ("John@Example.COM",
  // "HTTPS://...") and must not escape redaction; the inline flag is in the
  // Java-regex/RE2 common subset
  val UrlRe = "(?i)https?://[^\\s]+"
  val EmailRe = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redaction order matters (a URL may contain an email-shaped userinfo or
    * an IP host): URLs first, then emails, then bare IPs — fixed here and
    * mirrored in the oracle.
    */
  def scrubbed(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlRe, "<URL>"),
        EmailRe, "<EMAIL>"),
      Ipv4Re, "<IP>")

  /** Per-document scrub + audit counts. `scrubbed_hash` stands in for the
    * (possibly huge) redacted text so downstream equality checks stay
    * cheap; callers wanting the text use [[scrubbed]] directly.
    *
    * @return (doc_id, n_urls, n_emails, n_ips, scrubbed_hash)
    */
  def scrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol).as("doc_id"),
      size(regexp_extract_all(t, lit(UrlRe), lit(0))).cast("long").as("n_urls"),
      size(regexp_extract_all(regexp_replace(t, UrlRe, "<URL>"),
        lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(
        regexp_replace(regexp_replace(t, UrlRe, "<URL>"), EmailRe, "<EMAIL>"),
        lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      md5(scrubbed(t)).as("scrubbed_hash"))
  }
}
