package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

object Dedup {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracles: Map[String, String] = Map()
}
