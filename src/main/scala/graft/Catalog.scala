package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

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

  /** PERSISTENT catalog — the missing half of the HCatalog analogue
    * (reference README.md:126: tables registered once, visible to
    * every engine; README.md:223-226: HiveContext reads them by name).
    * Temp views die with the session; this file-backed registry
    * survives a restart: `saveCatalog` records (name, format,
    * location, schema) as JSONL under `metaDir`, and [[loadCatalog]]
    * re-registers every entry in a FRESH session with the DECLARED
    * schema — the catalog owns the schema, the reader never re-infers
    * it (the property that makes schema-on-read consistent across
    * engines and across CSV/JSON sources where inference could
    * drift). Metadata is one tiny JSONL file; tables stay where they
    * are — registering 100 TB costs the same as registering 100 KB. */
  def saveCatalog(spark: SparkSession, metaDir: String,
      entries: Seq[(String, String, String)],
      schemas: Map[String, String] = Map.empty): Long = {
    import spark.implicits._
    val rows = entries.map { case (name, format, location) =>
      // self-describing formats (parquet/orc) contribute their own
      // schema; text formats (csv/json) need the DDL pinned by the
      // caller — inference at load time is exactly what a catalog
      // exists to prevent
      val schema = schemas.get(name)
        .map(ddl => StructType.fromDDL(ddl).json)
        .getOrElse(spark.read.format(format).load(location).schema.json)
      (name, format, location, schema)
    }
    rows.toDF("name", "format", "location", "schema_json")
      .coalesce(1) // one metadata file; rows = catalog size, not data
      .write.mode("overwrite").json(metaDir)
    entries.length.toLong
  }

  /** Re-register every [[saveCatalog]] entry as a view in `spark`
    * (typically a brand-new session: `spark.newSession()` or the next
    * JVM entirely). Returns the registered names. */
  def loadCatalog(spark: SparkSession, metaDir: String): Seq[String] = {
    val entries = spark.read.json(metaDir)
      .select("name", "format", "location", "schema_json")
      .collect() // catalog-sized: one row per registered table
    entries.map { r =>
      val (name, format, location, schemaJson) =
        (r.getString(0), r.getString(1), r.getString(2), r.getString(3))
      spark.read.format(format)
        .schema(DataType.fromJson(schemaJson).asInstanceOf[StructType])
        .load(location)
        .createOrReplaceTempView(name)
      name
    }.toSeq
  }
}
