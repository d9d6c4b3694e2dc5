package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text corpus — the compliance pass
  * every production training-data pipeline runs before anything else sees
  * the text (emails, phone numbers, and IP addresses are the canonical
  * structured-PII classes; cf. the BigScience/Dolma data-prep pipelines).
  * The reference has no analog (it is a stock ETL); this sits in the
  * training-data extension surface next to [[Dedup]] / [[TextOps]].
  *
  * Scale design: pure row-wise `regexp_count`/`regexp_replace` — codegen'd
  * Catalyst expressions, a single linear scan, no UDF, no shuffle, no
  * driver involvement. At 100 TB this pass is scan-bound by construction:
  * it pipelines inside whole-stage codegen with whatever filter/projection
  * precedes it, and the parquet reader only materializes the text column
  * plus whatever the caller selects.
  *
  * Relation to [[TextOps.redact]]: that is the generic in-place
  * pattern-chain scrubber (caller-supplied patterns, text overwritten);
  * this pass adds per-class DETECTION counts and a separate `redacted`
  * column, and restricts its patterns to the oracle-checkable subset
  * below — use TextOps.redact for ad-hoc scrubbing, this for the audited
  * compliance pass.
  *
  * Determinism contract: the patterns use only the regex subset with
  * identical semantics in Java (Spark) and RE2 (DuckDB oracle) — ASCII
  * character classes, bounded repetition, and ASCII `\b` word boundaries;
  * no backrefs, no lookaround (RE2 has neither), no Unicode classes (Java
  * `\d` is ASCII-only by default, matching RE2). Redaction replaces ALL
  * occurrences in the order email -> phone -> IP (the classes cannot
  * overlap: emails contain `@`, phones contain no dots, IPs no dashes).
  */
object Pii {

  /** Conservative ASCII email shape: local part, `@`, dotted domain, TLD
    * of 2+ letters. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style dashed phone: 3-3-4 digit groups, word-bounded so longer
    * digit runs don't partially match. */
  val phonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Dotted-quad IPv4, word-bounded (accepts out-of-range octets like
    * 999.1.1.1 — standard for a redaction pass, which over-redacts by
    * design rather than leaking). */
  val ipPattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  private val classes: Seq[(String, String, String)] = Seq(
    ("n_emails", emailPattern, "[EMAIL]"),
    ("n_phones", phonePattern, "[PHONE]"),
    ("n_ips", ipPattern, "[IP]"))

  /** Adds per-class match counts (`n_emails`, `n_phones`, `n_ips`) and a
    * `redacted` column with every match replaced by its class tag. Null
    * text yields zero counts and null redacted. */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val counted = classes.foldLeft(docs) { case (df, (name, pat, _)) =>
      df.withColumn(name,
        coalesce(regexp_count(col(textCol), lit(pat)), lit(0)).cast("long"))
    }
    val redacted: Column = classes.foldLeft(col(textCol)) {
      case (c, (_, pat, tag)) => regexp_replace(c, lit(pat), lit(tag))
    }
    counted.withColumn("redacted", redacted)
  }
}
