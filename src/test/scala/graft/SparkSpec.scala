package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM. */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Tables.configure(s)
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** The engine root's NEWEST committed catalog sidecar — the numbered
    * generation file when any exist, the legacy single-file sidecar
    * otherwise. Specs that simulate torn/stale catalogs rewrite this
    * file in place. */
  def newestCatalogPath(root: String): java.nio.file.Path = {
    val gens = Option(new java.io.File(root).list()).toSeq.flatten
      .flatMap { n =>
        "^__catalog\\.(\\d+)\\.json$".r.findFirstMatchIn(n)
          .map(m => (m.group(1).toLong, n))
      }.sortBy(_._1)
    java.nio.file.Paths.get(root,
      gens.lastOption.map(_._2).getOrElse("__catalog.json"))
  }
}
