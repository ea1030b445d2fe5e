package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.ingest.IngestJob
import graft.model.IndexMetadata
import graft.store.VectorStore

/**
 * Incremental ingest (SURVEY §1.1 "Stream" extension point): a Structured
 * Streaming file source watches the docs directory and runs the SAME
 * per-row operators as the batch pipeline — decode → chunk → normalize →
 * embed are all stateless, so the lineage is reused verbatim
 * (`IngestJob.decodeAndProject` / `IngestJob.vectorize`). Each micro-batch
 * appends to the vectors table through `foreachBatch`, keeping the
 * [[VectorStore]] layout and `index_metadata.json` count consistent.
 *
 * The reference has no streaming (its 500 ms GUI timer is UI polling,
 * SURVEY §1.1); its checkpoint/resume machinery (C2) maps to the streaming
 * checkpoint directory here.
 */
object StreamingIngest {

  /** Schema of the `binaryFile` source (required for streaming reads). */
  val binarySchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  def start(spark: SparkSession, docsDir: String, warehouse: String, db: String,
      cfg: IngestJob.Config = IngestJob.Config(),
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val store = new VectorStore(spark, warehouse)
    val binary = spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .load(docsDir)
    val docs = IngestJob.decodeAndProject(binary)

    docs.writeStream
      .option("checkpointLocation", s"${store.dbDir(db)}/_ingest_checkpoint")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val vectors = IngestJob.vectorize(batch, cfg)
          vectors.write.mode("append")
            .option("maxRecordsPerFile", 100000)
            .parquet(s"${store.dbDir(db)}/vectors")
          batch.select(col("file_name"), col("hash"), col("file_path"),
            col("text").as("page_content"))
            .write.mode("append").parquet(s"${store.dbDir(db)}/documents")
          vectors.select(col("id").as("chunk_id"), col("metadata.hash").as("hash"))
            .write.mode("append").parquet(s"${store.dbDir(db)}/chunk_doc_map")
          store.writeIndexMetadata(db, IndexMetadata(
            distance_metric = "cosine", dimensions = cfg.dim,
            vector_type = "float32", index_type = "FLAT",
            num_vectors = store.vectors(db).count()))
        }
      }
      .start()
  }
}

/**
 * Streaming analytics over the `events` shape (SURVEY §2.9 extension):
 * watermarked tumbling-window aggregation — the streaming twin of batch
 * Q38, which the DuckDB oracle verifies in batch mode.
 */
object StreamingOps {

  /** Tumbling-window counts/sums per event_type with late-data watermark. */
  def windowedEventStats(events: DataFrame, windowLength: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count("*").as("n"), sum("value").as("s"))
      .select(col("window.start").as("h"), col("event_type"), col("n"), col("s"))
}
