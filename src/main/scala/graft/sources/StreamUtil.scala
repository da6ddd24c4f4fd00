package graft.sources

import org.apache.hadoop.conf.Configuration

/** Shared plumbing for the streaming file sources
  * ([[GeoJsonZipSource]], [[WarcSource]]).
  */
private[sources] object StreamUtil {

  /** Close `closeable` as soon as the iterator reports exhaustion
    * (idempotent — the task-completion backstop may close again).
    */
  def closeOnExhaustion[T](it: Iterator[T],
      closeable: java.io.Closeable): Iterator[T] = new Iterator[T] {
    private var closed = false
    override def hasNext: Boolean = {
      val h = it.hasNext
      if (!h && !closed) { closed = true; closeable.close() }
      h
    }
    override def next(): T = it.next()
  }

  /** Driver-side resolution of a path/glob/directory into files —
    * one driver RPC per load; the per-file bytes stay on executors.
    */
  def resolveFiles(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = Option(fs.globStatus(p)) match {
      case None | Some(Array()) =>
        throw new java.io.FileNotFoundException(path)
      case Some(arr) => arr.toSeq
    }
    matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq.filter(_.isFile)
      else Seq(st)
    }.map(_.getPath.toString)
  }
}

/** Hadoop Configuration is not Serializable; ship it to tasks via its
  * own writable form (same trick Spark's internal wrapper uses).
  */
private[sources] final class SerializableHadoopConf(
    @transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject(); value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
