package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Incremental file ingest — the Spark-native replacement for the
  * reference's CloudWatch → Lambda → "did today's files land?" chain
  * (reference: Lambda Function.py; SURVEY §2.9 C1/C2): a file-source
  * stream with `Trigger.AvailableNow` processes exactly the files that
  * have arrived since the last run and stops. The checkpoint IS the
  * readiness bookkeeping — re-running never reprocesses a file (repair
  * runs and crashes included), which is the exactly-once property the
  * Lambda's name-set check only approximates.
  */
object IngestStream {

  /** Drain new parquet files under `inDir` into `outDir` (append-only
    * parquet sink), tracking progress in `checkpoint`. Run repeatedly:
    * each invocation picks up only unseen files. */
  def drainOnce(spark: SparkSession, inDir: String, outDir: String,
      checkpoint: String, schema: StructType): StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(inDir)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
}
