package graft

/** SQL string-literal rendering shared by every oracle-SQL generator
  * (Bm25.rankSql, KmvSketch.algebraSql, the TextQueries multiSearch /
  * ngram / PMI oracles). Single quotes double per ANSI SQL — identical
  * in DuckDB and Spark SQL — so a phrase or label containing an
  * apostrophe renders as a valid literal instead of cutting the
  * statement short (round-15 ADVICE fix; all call sites were fixed
  * internal constants, the hazard was latent).
  */
object SqlLit {

  /** `abc'def` → `'abc''def'` */
  def str(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Comma-joined literal list for IN (...) / array [...] bodies. */
  def list(xs: Seq[String]): String = xs.map(str).mkString(", ")
}
