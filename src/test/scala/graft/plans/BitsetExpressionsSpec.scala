package graft.plans

import graft.testkit.SparkSpec

class BitsetExpressionsSpec extends SparkSpec {

  test("tokens_to_bitset + bitset_jaccard via SQL, registered at runtime") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT bitset_jaccard(
        |  tokens_to_bitset(array('a','b','c'), map('a',0,'b',1,'c',2,'d',3)),
        |  tokens_to_bitset(array('b','c','d'), map('a',0,'b',1,'c',2,'d',3))) AS j""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(r - 0.5) < 1e-12) // |{b,c}| / |{a,b,c,d}| = 2/4
  }

  test("bitset_jaccard handles unequal lengths and empty sets") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT bitset_jaccard(X'01', X'0101') AS j").head().getDouble(0) == 0.5)
    assert(spark.sql("SELECT bitset_jaccard(X'', X'') AS j").head().getDouble(0) == 0.0)
  }

  test("bitset_jaccard participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    // range source so constant folding can't pre-evaluate the expression
    val df = spark.range(2)
      .selectExpr("id", "unhex(lpad(hex(id + 1), 2, '0')) AS a", "X'03' AS b")
      .selectExpr("id", "bitset_jaccard(a, b) AS j")
    val rows = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WholeStageCodegen") || p.contains("*("),
      "expected codegen'd plan:\n" + p)
    assert(rows(0L) == 0.5) // 0x01 vs 0x03: inter 1, union 2
    assert(rows(1L) == 0.5) // 0x02 vs 0x03: inter 1, union 2
  }

  test("vec_dot: bit-equal to the HOF fold, codegen'd") {
    GraftFunctions.register(spark)
    // range source so constant folding can't pre-evaluate; irrational-ish
    // values so any fold-order difference would show in the last ulp
    val df = spark.range(100)
      .selectExpr("id",
        "transform(sequence(0, 15), i -> sin(id * 16 + i)) AS a",
        "transform(sequence(0, 15), i -> cos(id * 16 + i)) AS b")
      .selectExpr("id",
        "vec_dot(a, b) AS fast",
        "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (s, x) -> s + x) AS hof")
    val rows = df.collect()
    assert(rows.forall(r => r.getDouble(1) == r.getDouble(2)),
      "vec_dot must be bit-identical to the sequential HOF fold")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WholeStageCodegen") || p.contains("*("),
      "expected codegen'd plan:\n" + p)
  }

  test("unknown token is ignored by tokens_to_bitset") {
    GraftFunctions.register(spark)
    val j = spark.sql(
      """SELECT bitset_jaccard(
        |  tokens_to_bitset(array('a','zzz'), map('a',0,'b',1)),
        |  tokens_to_bitset(array('a'), map('a',0,'b',1))) AS j""".stripMargin)
      .head().getDouble(0)
    assert(j == 1.0)
  }
}
