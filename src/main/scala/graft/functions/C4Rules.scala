package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C4-style line and page cleaning (Raffel et al. 2020 §2.2 — the public
  * recipe behind the C4 corpus, reused by most web-scale curation stacks):
  *
  *   line level — keep a line only if it (a) ends in terminal punctuation,
  *   (b) has at least `MinWordsPerLine` words, (c) does not mention
  *   "javascript" (the boilerplate-warning heuristic);
  *
  *   page level — keep a page only if at least `MinLinesPerPage` lines
  *   survive and the raw text contains neither "lorem ipsum" nor a curly
  *   brace (template/code leakage).
  *
  * Pure `functions._` composition: every lambda below references ONLY its
  * own argument (the HOF re-evaluation gotcha does not bite — the lines
  * array is evaluated once per row, the per-line predicates run per
  * element), so the whole thing stays inside whole-stage codegen with no
  * UDF. Narrow, shuffle-free, linear in corpus bytes — the same plan shape
  * as the PII scrub.
  */
object C4Rules {

  val MinWordsPerLine = 3
  val MinLinesPerPage = 5

  /** Trimmed lines that pass the three C4 line rules, in order. */
  def keptLines(text: Column): Column =
    filter(
      transform(split(text, "\n"), l => trim(l)),
      l =>
        l.rlike("[.!?\"]$") &&
          size(split(l, "\\s+")) >= MinWordsPerLine &&
          !contains(lower(l), lit("javascript")))

  /** Cleaned page text: surviving lines re-joined with '\n'. */
  def cleanedText(text: Column): Column =
    array_join(keptLines(text), "\n")

  /** Page-level keep decision over the SURVIVING lines + raw-text bans. */
  def keepPage(text: Column): Column =
    size(keptLines(text)) >= MinLinesPerPage &&
      !contains(lower(text), lit("lorem ipsum")) &&
      !contains(text, lit("{"))
}
