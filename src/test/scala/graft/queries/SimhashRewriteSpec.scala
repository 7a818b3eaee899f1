package graft.queries

import graft.testkit.SparkSpec

/** r12 optimization pin: d04's per-token bit extraction was rewritten from
  * 64 `instr('0123456789abcdef', substring(h, p, 1))` aggregate updates to
  * two `conv`-parsed longs + shift/mask (guide §1.2 step 2). The signature
  * definition did NOT change — this spec recomputes d04 through the ORIGINAL
  * expression text (still exported for the DuckDB oracle via
  * [[TextQueries.simhashBitExprs]]/[[TextQueries.simhashAssembleExpr]]) and
  * requires bit-identical signatures for every document. */
class SimhashRewriteSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("d04 conv/shift rewrite is bit-identical to the instr/substring formulation") {
    val toks = "split(regexp_replace(lower(trim(text)), '\\\\s+', ' '), ' ')"
    val bitSums = TextQueries.simhashBitExprs("div", "instr")
      .map(org.apache.spark.sql.functions.expr)
    val original = Tables.documents(spark, d)
      .selectExpr("doc_id", s"explode($toks) AS tok")
      .selectExpr("doc_id", "md5(CAST(tok AS BINARY)) AS h")
      .groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .selectExpr("doc_id",
        s"CAST(${TextQueries.simhashAssembleExpr} AS BIGINT) AS simhash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rewritten = TextQueries.d04SimHash(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rewritten.keySet == original.keySet)
    val diff = rewritten.collect { case (id, v) if original(id) != v => id }
    assert(diff.isEmpty, s"signatures diverge for doc_ids: ${diff.take(10).mkString(", ")}")
    assert(original.nonEmpty)
  }
}
