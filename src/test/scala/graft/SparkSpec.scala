package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session: one local SparkSession for the whole JVM test run. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(name: String): String = s"/root/testdata/$name"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = graft.core.GraftSession.builder("graft-test", Some("local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      // Pinned for the WHOLE test JVM: suites run in parallel against
      // this one shared session, so a test that set/unset the provider
      // around its transformWithState query raced every concurrently
      // running transformWithState test (x91's novelty gate failed with
      // STATE_STORE_MULTIPLE_COLUMN_FAMILIES whenever its window landed
      // while no setter was active). With the session default already
      // RocksDB, the per-test save/restore blocks become no-ops.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
