package graft.core

/** Tiny local-filesystem helpers shared by the offline store swap and
  * tests. (Cluster deployments talk to object stores / table formats and
  * never touch these.) */
object Fs {

  /** listFiles with the null case made explicit: File.listFiles returns
    * null both for "not a directory" and for I/O errors, which otherwise
    * surfaces as an NPE far from the cause. */
  def listOrThrow(dir: java.io.File): Array[java.io.File] =
    Option(dir.listFiles()).getOrElse(
      throw new java.io.IOException(s"cannot list directory $dir"))

  /** listFiles treating unreadable/missing as empty (for opportunistic
    * cleanup passes where absence is fine). */
  def listOrEmpty(dir: java.io.File): Array[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty)

  def deleteRecursively(f: java.io.File): Unit = if (f.exists()) {
    if (f.isDirectory) listOrThrow(f).foreach(deleteRecursively)
    if (!f.delete() && f.exists())
      throw new java.io.IOException(s"cannot delete $f")
  }
}
