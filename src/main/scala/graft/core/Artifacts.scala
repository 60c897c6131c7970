package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Atomic publish for multi-file index artifacts (BM25 postings+stats,
  * decontamination grams+bloom, verified-pairs sets, IVF codebooks).
  *
  * The failure mode this closes: an index directory holding TWO
  * interdependent artifacts written sequentially (grams then bloom) can
  * be left half-new by a crash between the writes — new grams paired
  * with a stale bloom silently re-admits contamination (false negatives,
  * the one error class the bloom design otherwise rules out). Writing
  * everything under `<path>.staging` and RENAMING the directory into
  * place makes the pair switch together: readers see the old complete
  * index or the new complete index, never a mix.
  *
  * Rename is atomic on HDFS and POSIX filesystems. On object stores
  * (S3A) rename is copy+delete — there the publish is not atomic but
  * still all-or-nothing per artifact pair up to the final swap window;
  * production object-store deployments should front this with a
  * manifest/catalog pointer swap instead.
  *
  * The swap is rename-ASIDE, not delete-then-rename: the previous index
  * moves to `<path>.old` before the staging dir takes its place, so no
  * crash point destroys the only complete copy. A crash between the two
  * renames leaves `<path>` briefly missing with `<path>.old` complete —
  * [[recover]] (run automatically at the next publish, and callable by
  * readers that meet a missing path) restores it. `<path>.old` is
  * deleted only after the new index is in place.
  */
object Artifacts {

  /** Run `write` against a staging directory, then swap it into `path`.
    * Any failure inside `write` leaves the current `path` untouched;
    * a rename failure after the aside-move restores the previous index. */
  def publishAtomic(spark: SparkSession, path: String)(write: String => Unit): Unit = {
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(path + ".staging")
    val aside = new Path(path + ".old")
    recover(spark, path)
    if (fs.exists(staging)) fs.delete(staging, true)
    write(staging.toString)
    if (fs.exists(aside)) fs.delete(aside, true)
    if (fs.exists(target) && !fs.rename(target, aside))
      throw new java.io.IOException(
        s"publishAtomic: aside-rename $target -> $aside failed")
    if (!fs.rename(staging, target)) {
      // restore the previous index before failing — never leave nothing
      if (fs.exists(aside)) fs.rename(aside, target)
      throw new java.io.IOException(
        s"publishAtomic: rename $staging -> $target failed")
    }
    fs.delete(aside, true)
  }

  /** Heal the crash-between-renames window: if `path` is missing but a
    * complete `<path>.old` exists, rename it back. Idempotent; no-op
    * when `path` exists. Returns true if a restore happened. */
  def recover(spark: SparkSession, path: String): Boolean = {
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val aside = new Path(path + ".old")
    if (!fs.exists(target) && fs.exists(aside)) fs.rename(aside, target)
    else false
  }
}
