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

  test("bitset_contain: asymmetric, codegen'd, |∅| → 0.0") {
    GraftFunctions.register(spark)
    // A = {0}, B = {0,1}: A fully inside B, B half inside A
    assert(spark.sql("SELECT bitset_contain(X'01', X'03')").head().getDouble(0) == 1.0)
    assert(spark.sql("SELECT bitset_contain(X'03', X'01')").head().getDouble(0) == 0.5)
    // empty left side: containment of nothing is 0.0, not NaN/divide-by-zero
    assert(spark.sql("SELECT bitset_contain(X'00', X'03')").head().getDouble(0) == 0.0)
    // unequal lengths: the longer side's tail counts only toward its own |A|
    assert(spark.sql("SELECT bitset_contain(X'0101', X'01')").head().getDouble(0) == 0.5)
    // runs inside whole-stage codegen (range source defeats constant folding)
    val df = spark.range(2)
      .selectExpr("id", "unhex(lpad(hex(id + 1), 2, '0')) AS a")
      .selectExpr("id", "bitset_contain(a, X'01') AS c")
    val p = df.queryExecution.executedPlan.toString
    val rows = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(p.contains("WholeStageCodegen") || p.contains("*("),
      "expected codegen'd plan:\n" + p)
    assert(rows(0L) == 1.0 && rows(1L) == 0.0) // {0}⊆{0}; {1}∩{0}=∅
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

  test("tokens_to_hashbits: bit index = first 5 md5 hex digits mod width") {
    GraftFunctions.register(spark)
    val width = 4096
    def expectedBits(toks: Seq[String]): Set[Int] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      toks.map { t =>
        val hex = md.digest(t.getBytes("UTF-8")).take(3).map(b => f"$b%02x").mkString
        Integer.parseInt(hex.take(5), 16) % width
      }.toSet
    }
    val toks = Seq("the", "quick", "brown", "fox", "")
    val bytes = spark.sql(
      s"SELECT tokens_to_hashbits(array(${toks.map(t => s"'$t'").mkString(",")}), $width) AS b")
      .head().getAs[Array[Byte]](0)
    assert(bytes.length == width / 8)
    val setBits = (0 until width).filter(i => (bytes(i >> 3) & (1 << (i & 7))) != 0).toSet
    assert(setBits == expectedBits(toks))
  }

  test("tokens_to_hashbits + bitset_jaccard equals position-set jaccard") {
    GraftFunctions.register(spark)
    // dup tokens collapse (set semantics), identical sets give 1.0
    val j = spark.sql(
      """SELECT bitset_jaccard(
        |  tokens_to_hashbits(array('x','y','x'), 4096),
        |  tokens_to_hashbits(array('y','x'), 4096)) AS j""".stripMargin)
      .head().getDouble(0)
    assert(j == 1.0)
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
