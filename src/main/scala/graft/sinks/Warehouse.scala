package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.model.Layer

/** Table layout of the engine — the Spark-native replacement for the
  * reference's Postgres `content.*` schema.
  *
  * Every per-feature table is parquet partitioned by `tdei_dataset_id`,
  * written with dynamic partition overwrite. That makes a re-load of the
  * same dataset idempotent — the Spark idiom replacing the reference's
  * `delete_dataset_records_by_id($1)` pre-clean + transactional reload
  * (`src/service/extract-load-service.ts:291-295`,
  * `src/database/data-source.ts:33-65`). Replays overwrite exactly the
  * partitions they produce, so a failed load is repaired by re-running —
  * the at-least-once story the queue semantics require.
  *
  * Scale note: partitioning by dataset id means a 1000-executor load of N
  * archives touches only its own partitions (no global shuffle, no table
  * lock); per-layer writes are narrow maps over the parsed records.
  */
final class Warehouse(spark: SparkSession, val root: String) {

  def tablePath(table: String): String = s"$root/content_$table"

  /** content.node / edge / zone / extension_* feature tables. */
  def writeFeatures(table: String, df: DataFrame): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("tdei_dataset_id")
      .parquet(tablePath(table))

  /** Per-dataset overwrite for keyed metadata tables (dataset, stats,
    * extension_file): one partition per dataset id = an upsert.
    */
  def upsertByDataset(table: String, df: DataFrame): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("tdei_dataset_id")
      .parquet(tablePath(table))

  /** Append-only response log (K10). */
  def appendResponses(df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(tablePath("response"))

  def table(name: String): DataFrame = spark.read.parquet(tablePath(name))

  def tableExists(name: String): Boolean = {
    val p = new Path(tablePath(name))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Path of one dataset's partition within a table. */
  def partitionPath(table: String, datasetId: String): String =
    s"${tablePath(table)}/tdei_dataset_id=$datasetId"

  def partitionExists(table: String, datasetId: String): Boolean = {
    val p = new Path(partitionPath(table, datasetId))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Explicit cross-table pre-clean (A1). Dynamic partition overwrite
    * already replaces partitions we re-write; this additionally removes a
    * dataset's rows from layer tables the re-load does NOT touch (e.g. a
    * reload that dropped a layer) — full parity with
    * `delete_dataset_records_by_id`.
    */
  def deleteDatasetRecords(datasetId: String): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val tables = Layer.all.map(_.table).distinct ++
      Seq("extension_file", "dataset", "stats")
    tables.foreach { t =>
      val dir = new Path(s"${tablePath(t)}/tdei_dataset_id=$datasetId")
      val fs = dir.getFileSystem(hconf)
      if (fs.exists(dir)) fs.delete(dir, true)
    }
  }
}
