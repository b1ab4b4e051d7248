package graft

import org.apache.spark.sql.functions._

/** Pins the BPE merge-application mechanics q_text_bpe_merge2 relies
  * on: `replace` over 0x1F-joined symbols must behave as the BPE rule
  * (left-to-right, non-overlapping), and the separator construction
  * must produce exactly one separator between characters — the
  * properties the DuckDB twin was probe-verified to share.
  */
class BpeMergeSpec extends SparkSpec {

  private val SEP = ""

  private def syms(word: String, mergePair: String): Seq[String] = {
    import spark.implicits._
    Seq((word, mergePair)).toDF("w", "mp")
      .select(expr(
        """split(
          |  replace(
          |    substring(regexp_replace(w, '(.)', concat('$1', char(31))), 1, 2 * length(w) - 1),
          |    concat(substring(mp, 1, 1), char(31), substring(mp, 2, 1)),
          |    mp),
          |  char(31))""".stripMargin).as("syms"))
      .head().getSeq[String](0)
  }

  test("separator insertion yields one symbol per char, no trailing sep") {
    assert(syms("abc", "xy") === Seq("a", "b", "c"))
  }

  test("merge applies at every non-overlapping site") {
    assert(syms("abab", "ab") === Seq("ab", "ab"))
  }

  test("overlapping run merges left-to-right: aaa -> [aa, a]") {
    assert(syms("aaa", "aa") === Seq("aa", "a"))
  }

  test("merged symbol does not re-pair with a following char") {
    // after merging 'ab' in "aba", the residue is [ab, a] — the 'b'
    // inside the merged symbol must not pair with the trailing 'a'
    assert(syms("aba", "ab") === Seq("ab", "a"))
  }

  test("single-char word survives as one symbol") {
    assert(syms("x", "ab") === Seq("x"))
  }
}
