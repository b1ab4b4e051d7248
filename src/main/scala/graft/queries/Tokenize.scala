package graft.queries

/** THE whitespace-normalize tokenizer — the single definition every
  * text operator (dedup, text analysis, packing, decontamination)
  * shares, as a Spark-SQL / DuckDB expression pair producing identical
  * token lists. Token counts feed packing budgets, dedup signatures
  * and quality stats; a second, drifted definition would silently make
  * those disagree, so don't inline this expression anywhere.
  *
  * `spark`/`duck`: lowercase, collapse runs of whitespace, split on
  * single spaces. An all-whitespace or empty document yields [""] —
  * operators that must not see empty edge tokens use the trimmed pair.
  *
  * `sparkTrim`/`duckTrim`: same, plus edge-whitespace trim, matching
  * what the NGramGenerator (which trims) sees.
  */
object Tokenize {

  /** Spark: tokenized `text` column (untrimmed). */
  val spark: String =
    "split(regexp_replace(lower(text), '\\\\s+', ' '), ' ')"

  /** DuckDB twin of [[spark]]. */
  val duck: String =
    "string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')"

  /** Spark: tokenized `text` column, edge whitespace trimmed first. */
  val sparkTrim: String =
    "split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ')"

  /** DuckDB twin of [[sparkTrim]]. */
  val duckTrim: String =
    "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"
}
