package graft.operators

/** Shared DuckDB oracle-SQL fragments for the text operators.
  *
  * These are the SINGLE copies of the tokenization/shingling SQL that
  * must stay in lockstep with the Spark-side kernels
  * ([[graft.functions.TextExpressions.Tokens]] /
  * [[graft.functions.TextExpressions.WordShingles]]): every oracle that
  * tokenizes interpolates these, so a tokenizer change updates all
  * oracles at once instead of drifting file by file.
  */
private[operators] object OracleSql {

  /** DuckDB twin of TextExpressions.tokens over a `text` column:
    * lowercase, split on whitespace runs, drop empties.
    */
  val Toks: String =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"""

  /** DuckDB twin of TextExpressions.word_shingles(_, 3) over a `toks`
    * list: distinct word 3-grams; short docs yield the single
    * whole-document shingle.
    */
  val Shingles3: String =
    """list_distinct(CASE WHEN len(toks) >= 3
        THEN list_transform(range(len(toks) - 2), i -> array_to_string(toks[i + 1:i + 3], ' '))
        ELSE [array_to_string(toks, ' ')] END)"""
}
