package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The shared lifecycle of every persisted dedup index — text MinHash
  * ([[Dedup.writeNearDupIndex]]), image ([[Multimodal.writeImageNearDupIndex]]),
  * audio ([[Audio.writeAudioNearDupIndex]]), video
  * ([[Video.writeVideoNearDupIndex]]). One contract, four signature
  * families:
  *
  *  - '''Fail-loud params sidecar.''' Signatures hashed under different
  *    parameters would silently never match; every reader validates the
  *    writer's recorded params first and refuses anything else.
  *  - '''Delete-sidecar-first overwrite''' (the TokenizerArtifacts
  *    contract): a rebuild deletes the sidecar BEFORE touching any
  *    data, so a crash mid-rewrite leaves a no-sidecar index that every
  *    reader rejects — never a stale sidecar blessing mixed-generation
  *    parquet. The sidecar is recreated last, after all data sides and
  *    the batch purge land.
  *  - '''Rebuild drops append batches.''' Committed batches from a
  *    previous index generation would otherwise survive the base
  *    overwrite and leak old rows into every later admission.
  *  - '''Transactional appends.''' A batch stages ALL its sides under
  *    `batches/<uuid>/` and becomes visible only when the single
  *    atomic [[Dedup.CommitMarker]] file lands; readers
  *    ([[Dedup.indexSidePaths]]) list committed batches only, so a
  *    crash between side writes leaves an invisible orphan directory,
  *    never a half-batch.
  *
  * An index is one or more named parquet "sides" (the 8-byte `sigs`
  * table for the perceptual families; `bands` + `grams` for text
  * MinHash) — the side list is the only thing that varies, so it is
  * the parameter.
  */
private[graft] object SigIndex {

  /** The raw params-sidecar JSON — fail-loud when the sidecar is
    * absent (not an index, or a crash-mid-rewrite leftover).
    */
  def readParams(spark: SparkSession, indexPath: String,
      sidecarName: String, writerName: String, who: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(indexPath, sidecarName)
    val fs = p.getFileSystem(conf)
    require(fs.exists(p),
      s"$who: $indexPath has no $sidecarName — not a " +
        s"$writerName artifact (or the sidecar was deleted); " +
        "rebuild the index")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Exact-match params validation — the shared refusal message. */
  def requireParams(persisted: String, expected: String,
      indexPath: String, who: String): Unit =
    require(persisted == expected,
      s"$who: index at $indexPath was built under $persisted, " +
        s"requested $expected — rebuild the index or match its " +
        "parameters")

  /** Overwrite-build the index: delete the sidecar first, overwrite
    * every data side, drop all append batches from the previous
    * generation, then write the sidecar last (the recovery points of
    * the crash contract above, in that order).
    */
  def write(spark: SparkSession, path: String, sidecarName: String,
      paramsJson: String, sides: Seq[(String, DataFrame)]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path, sidecarName)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) fs.delete(p, false)
    sides.foreach { case (side, df) =>
      df.write.mode("overwrite").parquet(s"$path/$side")
    }
    val batches = new Path(path, "batches")
    val bfs = batches.getFileSystem(conf)
    if (bfs.exists(batches)) bfs.delete(batches, true)
    val out = fs.create(p, true)
    try out.write(paramsJson.getBytes("UTF-8"))
    finally out.close()
  }

  /** Transactionally append one batch: stage every side under
    * `batches/<uuid>/`, then one atomic marker create commits them
    * all. Params validation is the CALLER's job (before any write).
    */
  def appendBatch(spark: SparkSession, indexPath: String,
      sides: Seq[(String, DataFrame)]): Unit = {
    val batchId = java.util.UUID.randomUUID().toString
    val batchDir = s"$indexPath/batches/$batchId"
    sides.foreach { case (side, df) =>
      df.write.mode("overwrite").parquet(s"$batchDir/$side")
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val marker = new Path(batchDir, Dedup.CommitMarker)
    marker.getFileSystem(conf).create(marker, true).close()
  }
}
