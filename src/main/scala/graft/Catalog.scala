package graft

import org.apache.spark.sql.SparkSession

/** SQL surface: registers the sfDir star schema as temp views so
  * every engine capability is reachable from `spark.sql(...)` text as
  * well as the DataFrame API — the analogue of the reference's
  * metastore-backed access from Hive/Pig/PySpark (SURVEY.md §3).
  * Custom functions get SQL names too (graft.functions.registerAll).
  */
object Catalog {
  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    Tables.all.foreach { name =>
      Tables.table(spark, sfDir, name).createOrReplaceTempView(name)
    }
    // events needs the nanos→micros conversion applied
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
    graft.functions.registerAll(spark)
  }
}
