package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus interchange — the de-facto wire format of LLM training
  * corpora (one JSON document per line). Splittable line-based reads,
  * explicit schema (no runaway inference pass over 100 TB), corrupt
  * lines quarantined instead of failing the job.
  *
  * Implementation note: lines are read as text and parsed with
  * `from_json`, NOT `spark.read.json` + `_corrupt_record` — the
  * built-in corrupt column may not be the only referenced column of a
  * raw-file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN), which breaks
  * innocuous queries like `clean(df).count()` after column pruning.
  * A parsed struct + ordinary derived columns has no such trap, and
  * one text scan + codegen'd Jackson parse is the same I/O shape.
  */
object CorpusJsonl {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  /** Read a JSONL corpus: well-formed lines parse into the documents
    * schema; malformed lines carry their raw text in `_corrupt_record`
    * (from_json in PERMISSIVE mode yields a struct either way — the
    * corrupt field inside the struct is the discriminator).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val parseSchema = schema.add(StructField("_corrupt_record", StringType))
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(from_json(col("value"), parseSchema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")).as("j"))
      .select(
        col("j.doc_id").as("doc_id"),
        col("j.text").as("text"),
        col("j.lang").as("lang"),
        col("j.source").as("source"),
        col("j._corrupt_record").as("_corrupt_record"))
  }

  def clean(df: DataFrame): DataFrame =
    df.filter(col("_corrupt_record").isNull).drop("_corrupt_record")

  def corruptRecords(df: DataFrame): DataFrame =
    df.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))

  /** Write a corpus as JSONL, `shards` files (bounded file count — at
    * 100 TB pick shards from target file size, not row count).
    */
  def write(documents: DataFrame, path: String, shards: Int = 8): Unit =
    documents
      .repartition(shards, pmod(col("doc_id"), lit(shards.toLong)))
      .write.mode("overwrite").json(path)
}
