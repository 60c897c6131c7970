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
  */
object Artifacts {

  /** Run `write` against a staging directory, then swap it into `path`.
    * Any failure inside `write` leaves the current `path` untouched. */
  def publishAtomic(spark: SparkSession, path: String)(write: String => Unit): Unit = {
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(path + ".staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    write(staging.toString)
    if (fs.exists(target)) fs.delete(target, true)
    if (!fs.rename(staging, target))
      throw new java.io.IOException(
        s"publishAtomic: rename $staging -> $target failed")
  }
}
