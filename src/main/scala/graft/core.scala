package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One verifiable engine query: a Spark plan builder plus (optionally) an
  * equivalent ANSI SQL text the driver runs in DuckDB as the correctness
  * oracle. Queries with no SQL-expressible oracle get a rows-only check.
  */
final case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def queries: Seq[GQuery]
}

/** Parquet fixture loaders. All engine operators read these tables; at
  * cluster scale the same code path reads partitioned parquet directories,
  * so every query keeps projection/filter pushdown reachable by the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Schema-by-path cache: the fixture files are immutable for the life
    * of a run, so the parquet footer is read ONCE per path per JVM and
    * every later load passes the schema explicitly — skipping the
    * per-call schema-inference job (guide §6: listing/planning overhead;
    * at cluster scale explicit schemas also avoid footer sampling over
    * thousands of files). Caches METADATA only, never data or results. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      org.apache.spark.sql.types.StructType]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** events.parquet has shipped `ts` in two physical layouts across driver
    * generations: parquet TIMESTAMP(NANOS), which Spark's reader only
    * accepts as a raw long (spark.sql.legacy.parquet.nanosAsLong), and
    * plain TIMESTAMP(MICROS), which reads as TIMESTAMP_NTZ. Either way we
    * expose the same three columns — the ns long (`ts_ns`), the µs long
    * (`ts_us`) and a proper µs timestamp (`ts`) — so operators and oracle
    * SQL (DuckDB `epoch_ns(ts)` = µs·1000 on a micros file) match
    * bit-for-bit. The session timezone is pinned UTC, making the NTZ→
    * TIMESTAMP cast the identity on the stored micros, exactly how DuckDB
    * treats the naive timestamp.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_us", expr("ts_ns div 1000"))
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        val cols = raw.columns.map {
          case "ts" =>
            (unix_micros(col("ts").cast("timestamp")) * lit(1000L)).as("ts_ns")
          case c => col(c)
        }
        raw.select(cols.toIndexedSeq: _*)
          .withColumn("ts_us", expr("ts_ns div 1000"))
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    }
  }
}

/** Shared helpers that keep results bit-identical between Spark and the
  * DuckDB oracle:
  *   - money/quantity aggregates run in DECIMAL (exact, associative — safe
  *     under any partitioning/shuffle order) and are cast to DOUBLE only in
  *     the final output;
  *   - `dround` rounds a double with pure IEEE ops (mul/add/floor/div) that
  *     are bit-deterministic in both engines, unlike round() whose tie
  *     handling differs between implementations.
  */
object Bits {
  val Dec: String = "decimal(12,2)"

  def dec(c: Column): Column = c.cast(Dec)

  def dround(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** SQL text mirror of dround, for oracle queries. */
  def droundSql(e: String, digits: Int): String = {
    val p = "1" + "0" * digits
    s"FLOOR(($e) * $p.0 + 0.5) / $p.0"
  }
}
