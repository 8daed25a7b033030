package graft.queries

/** Shared DuckDB-SQL fragments for oracles that gate the SAME operator
  * from more than one query (the curate_corpus lesson, round-6 advice:
  * two hand-maintained copies of one pipeline's SQL silently drift).
  * `gopher_rules`, `pii_redact` and the streaming `streaming_curate`
  * composition all read from here, so a rule change edits ONE string.
  */
object GopherOracle {

  /** The metric CTE chain (`t` → `m` → `g` → `d`) over `src`, carrying
    * doc_id and text through — mirrors [[graft.ops.TextOps.gopherRules]]
    * metric-for-metric (integer cross-multiplied rules, word-3-gram
    * duplicate counts).
    */
  def ctes(src: String): String =
    s"""t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM $src),
       |m AS (SELECT doc_id, text, toks, len(toks)::BIGINT AS n,
       |             list_sum(list_transform(toks, x -> len(x)))::BIGINT AS sum_len,
       |             len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::BIGINT AS n_alpha,
       |             len(list_intersect(list_distinct(toks),
       |                 ['the','a','of','and','to','in','is','on']))::BIGINT AS n_stop
       |      FROM t),
       |g AS (SELECT *,
       |             CASE WHEN n >= 3 THEN
       |               list_transform(range(1, (n - 1)::INTEGER),
       |                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |             ELSE []::VARCHAR[] END AS grams
       |      FROM m),
       |d AS (SELECT *, len(grams)::BIGINT AS n_grams,
       |             (len(grams) - len(list_distinct(grams)))::BIGINT AS n_dup
       |      FROM g)""".stripMargin

  /** The keep conjunction over `d`'s columns (default thresholds). */
  val keepCondition: String =
    """n >= 20 AND n <= 100000 AND sum_len >= 2 * n AND sum_len <= 10 * n
      |         AND n_alpha * 10 >= n * 8 AND n_stop >= 2
      |         AND n_dup * 5 <= n_grams""".stripMargin
}

object PiiOracle {

  /** The planted-PII fixture CTE (named `p`): a deterministic email +
    * IPv4 + phone derived from doc_id appended to each text — the same
    * formula `pii_redact`'s Spark side and the streaming-curate staged
    * input compute, so both engines see the identical input.
    */
  val plantedCte: String =
    // concat operators sit at line ENDS: a fragment line starting with
    // `||` would lose its first pipe to the EMBEDDING template's
    // stripMargin (applied after interpolation)
    """p AS (SELECT doc_id,
      |             text || ' contact u' || doc_id || '@mail.example.com from 10.' ||
      |             (doc_id % 250) || '.0.' || (doc_id % 100) ||
      |             ' call 555-' || (doc_id % 9000 + 1000) AS text
      |           FROM documents)""".stripMargin

  /** PII count + redaction SELECT columns over a `text` column —
    * patterns from the Java-regex ∩ RE2 common subset, identical to
    * [[graft.ops.TextOps.redactPii]]'s order (email → IP → phone).
    */
  val selectColumns: String =
    """len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
      |       len(regexp_extract_all(text, '([0-9]{1,3}\.){3}[0-9]{1,3}'))::BIGINT AS n_ips,
      |       len(regexp_extract_all(text, '555-[0-9]{4}'))::BIGINT AS n_phones,
      |       regexp_replace(regexp_replace(regexp_replace(text,
      |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |         '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
      |         '555-[0-9]{4}', '<PHONE>', 'g') AS redacted""".stripMargin
}
