package graft.core

/** Tiny local-filesystem helpers shared by the offline store swap and
  * tests. (Cluster deployments talk to object stores / table formats and
  * never touch these.) */
object Fs {
  def deleteRecursively(f: java.io.File): Unit = if (f.exists()) {
    if (f.isDirectory) f.listFiles.foreach(deleteRecursively)
    f.delete()
  }
}
