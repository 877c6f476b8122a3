package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicReference}

import org.apache.spark.sql.SparkSession

/** [[MemLogStore]] with a ONE-SHOT conflict injector: the first
  * `writeIfAbsent` whose path ends with the armed suffix first lands a
  * COMPETING writer's content at that path (winning the CAS), then lets
  * the caller's attempt proceed — which deterministically loses. This is
  * how the rebase specs interleave two writers without racing threads:
  * the "other writer" commits at exactly the moment this writer tries.
  */
class ConflictOnceStore extends MemLogStore {
  override def writeIfAbsent(spark: SparkSession, path: String,
      content: String): Boolean = {
    import ConflictOnceStore._
    val t = target.get()
    if (t != null && path.endsWith(t) && fired.compareAndSet(false, true))
      super.writeIfAbsent(spark, path, competing.get())
    super.writeIfAbsent(spark, path, content)
  }
}

object ConflictOnceStore {
  private[graft] val target = new AtomicReference[String](null)
  private[graft] val competing = new AtomicReference[String](null)
  private[graft] val fired = new AtomicBoolean(true)

  /** Arm the injector: the next writeIfAbsent of a path ending in
    * `pathSuffix` is preceded by the competing content landing there.
    */
  def arm(pathSuffix: String, competingContent: String): Unit = {
    target.set(pathSuffix)
    competing.set(competingContent)
    fired.set(false)
  }
}
