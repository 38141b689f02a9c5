package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text scrubbing for training corpora: remove emails/URLs (the common
  * PII/noise pass before tokenization). Pure codegen'd regexp columns —
  * embarrassingly parallel, no shuffle. Regexes restricted to syntax
  * shared by Java regex and RE2 so the SQL oracle matches exactly.
  */
object TextClean {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"

  def scrubEmails(c: Column): Column = regexp_replace(c, EmailRe, "")
  def scrubUrls(c: Column): Column = regexp_replace(c, UrlRe, "")
  def scrub(c: Column): Column = scrubUrls(scrubEmails(c))

  def hasEmail(c: Column): Column = c.rlike(EmailRe)
  def hasUrl(c: Column): Column = c.rlike(UrlRe)
}
