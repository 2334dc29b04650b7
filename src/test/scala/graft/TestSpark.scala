package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole ScalaTest run (forked JVM). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.build(4)

  /** Smallest SF — specs assert semantics, not throughput. */
  val sfDir = "/root/testdata/sf0.001"

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
