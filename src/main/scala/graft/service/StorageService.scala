package graft.service

import java.io.InputStream
import java.time.LocalDate

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** K11 — file upload util (reference `src/service/storage-service.ts:13-33`):
  * `getFolderPath` builds the `yyyy/M/projectGroupId/recordId` layout
  * (month unpadded, JS `getMonth()+1`), `uploadFile` streams a body into
  * a container (default `osw`) and returns the remote URL. Re-expressed
  * over Hadoop FileSystem so any supported store (local, HDFS, s3a,
  * abfs) is a valid container root.
  */
final class StorageService(hadoopConf: Configuration, storageRoot: String) {

  /** `yyyy/M/projectGroupId/recordId` — month is NOT zero-padded. */
  def getFolderPath(projectGroupId: String, recordId: String,
      today: LocalDate = LocalDate.now()): String =
    s"${today.getYear}/${today.getMonthValue}/$projectGroupId/$recordId"

  /** Stream `body` to `containerName/filePath`, creating parents; returns
    * the remote URL (the fully-qualified path). `contentType` is carried
    * for signature parity — Hadoop FS has no content-type metadata; blob
    * store implementations would map it.
    */
  def uploadFile(filePath: String, contentType: String = "application/zip",
      body: InputStream, containerName: String = "osw"): String = {
    val dest = new Path(s"$storageRoot/$containerName/$filePath")
    val fs = dest.getFileSystem(hadoopConf)
    val out = fs.create(dest, true)
    try {
      val buf = new Array[Byte](64 * 1024) // reference CHUNK_SIZE parity
      var n = body.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        n = body.read(buf)
      }
    } finally out.close()
    fs.makeQualified(dest).toString
  }
}
