package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persist-on-write catalog: the session-temp views of
  * [[graft.queries.SqlSurface.registerViews]] make `spark.sql` usable,
  * but a real engine's tables outlive the session. Two lanes:
  *
  *  - [[saveTable]]: `saveAsTable` with an explicit external location —
  *    works against ANY catalog implementation (the driver's Verify
  *    session runs the in-memory catalog), data + schema land in
  *    parquet and the table is queryable by name.
  *  - [[openSession]]: a Hive-metastore-backed session (embedded Derby
  *    at a caller-chosen path, same embedded-Derby surface as the JDBC
  *    sink lane) in which saved tables SURVIVE a full session+context
  *    restart — the "catalog like a real engine's" contract
  *    (CatalogPersistenceSpec restarts the JVM-wide SparkContext and
  *    reads the table back by name).
  *
  * Scale note: the metastore holds only metadata (schema, location,
  * partitions); data stays parquet in the warehouse dir, so catalog
  * persistence adds zero data movement at any SF.
  */
object CatalogSurface {

  /** Open (or reopen) a metastore-backed session: Hive external
    * catalog over embedded Derby at `metastoreDir`, table data under
    * `warehouseDir`. Reopening with the same dirs sees every table
    * earlier sessions saved. */
  def openSession(
      warehouseDir: String,
      metastoreDir: String,
      master: String = "local[4]"): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", warehouseDir)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$metastoreDir/metastore_db;create=true")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
  }

  /** Save `df` as a named external parquet table at `path` (explicit
    * location → catalog-implementation-agnostic), replacing any
    * previous registration of the name. */
  def saveTable(df: DataFrame, name: String, path: String): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $name")
    df.write.mode("overwrite").format("parquet")
      .option("path", path).saveAsTable(name)
  }
}
