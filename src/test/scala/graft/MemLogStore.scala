package graft

import org.apache.spark.sql.SparkSession

/** Deliberately NON-FILESYSTEM [[graft.sources.LogStore]]: manifests live
  * in a JVM-wide map and the CAS is `putIfAbsent` — no rename, no files,
  * no atomic-rename assumption anywhere. Driving the whole TableLog
  * conflict/protocol suite through this proves the commit guarantees are
  * carried by the LogStore INTERFACE contract, not by any property of the
  * underlying filesystem (the seam an S3-style conditional-put
  * implementation plugs into).
  */
class MemLogStore extends graft.sources.LogStore {
  import MemLogStore.files
  import scala.jdk.CollectionConverters._

  override def list(spark: SparkSession, dir: String): Seq[String] =
    files.keySet.asScala.toSeq
      .filter(_.startsWith(dir + "/"))
      .map(_.stripPrefix(dir + "/"))
      .filterNot(_.contains("/"))

  override def read(spark: SparkSession, path: String): String =
    Option(files.get(path))
      .getOrElse(throw new java.io.FileNotFoundException(path))

  override def writeIfAbsent(spark: SparkSession, path: String,
      content: String): Boolean =
    files.putIfAbsent(path, content) == null

  override def writeOverwrite(spark: SparkSession, path: String,
      content: String): Unit = { files.put(path, content); () }

  override def exists(spark: SparkSession, path: String): Boolean =
    files.containsKey(path)

  override def delete(spark: SparkSession, path: String): Unit =
    { files.remove(path); () }
}

object MemLogStore {
  val files = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def clear(): Unit = files.clear()
}
