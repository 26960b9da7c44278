package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** L11 executor: drive a schema diff through REAL catalog DDL instead
  * of only reporting it — the apply side of the reference's warehouse
  * schema sync (warehouse/integrations/postgres/postgres.go
  * CreateTable/AddColumns DDL path; diff precedence in
  * warehouse/schema/schema.go:294-342).
  *
  * The diff input is schema-sized (tables × columns), so collecting it
  * on the driver is a metadata operation, exactly like the reference's
  * in-memory ColumnMap. Statements execute against the Spark session
  * catalog; on a real deployment the same statements go to the
  * warehouse over JDBC — the planning/diff layer is identical and only
  * the connection swaps.
  */
object Ddl {

  /** Warehouse logical type → Spark SQL DDL type (datatype.go:11-48;
    * `text` is physically STRING on Spark — the logical distinction is
    * tracked in table properties, mirroring how the reference tracks
    * VARCHAR(512) vs TEXT on Redshift).
    */
  def sqlType(whType: String): String = whType match {
    case "int"      => "BIGINT"
    case "float"    => "DOUBLE"
    case "boolean"  => "BOOLEAN"
    case "datetime" => "TIMESTAMP"
    case "string" | "text" | "json" => "STRING"
    case other => throw new IllegalArgumentException(s"unknown warehouse type: $other")
  }

  /** Warehouse logical type → ANSI/Derby DDL type for the JDBC path
    * (postgres.go dataTypesMap equivalent: text/json widen past the
    * varchar cap, datetime is a real TIMESTAMP column).
    */
  def sqlTypeJdbc(whType: String): String = whType match {
    case "int"      => "BIGINT"
    case "float"    => "DOUBLE"
    case "boolean"  => "BOOLEAN"
    case "datetime" => "TIMESTAMP"
    case "string"   => "VARCHAR(512)"
    case "text" | "json" => "LONG VARCHAR"
    case other => throw new IllegalArgumentException(s"unknown warehouse type: $other")
  }

  /** Max in-place VARCHAR width for the widen-on-upgrade path (Derby's
    * VARCHAR ceiling; the postgres deployment would use TEXT instead).
    */
  private val jdbcTextWidth = 32672

  /** The same schema-diff execution over a REAL JDBC connection — the
    * reference's actual DDL path (postgres.go CreateTable/AddColumn
    * run over database/sql). Embedded Derby in tests; a production
    * deployment only swaps the url. The whole diff is validated before
    * any statement executes, exactly like `applySchemaDiff`: an
    * alter-only entry for a missing table refuses up front rather than
    * silently no-oping or aborting midway. `add` actions CREATE the
    * table or ALTER ADD COLUMN; `alter_to_text` re-types the column
    * in place (Derby permits widening a VARCHAR, so string→text
    * becomes SET DATA TYPE VARCHAR(32672) and >512-char
    * values load afterwards) AND persists the logical upgrade to a
    * `graft_column_types` registry table over the same connection —
    * the JDBC twin of the catalog path's `graft.coltype`
    * TBLPROPERTIES — so the warehouse type survives even on dialects
    * whose physical column cannot widen. Returns every executed
    * statement in execution order.
    */
  def applySchemaDiffJdbc(url: String, diff: DataFrame): Seq[String] = {
    val rows = diff.select("table_name", "column_name", "column_type", "action")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val stmts = scala.collection.mutable.ArrayBuffer[String]()
      def run(sql: String): Unit = { conn.createStatement().execute(sql); stmts += sql }
      // identifier-fold-agnostic metadata probes: Derby stores
      // unquoted names upper-case, postgres lower-case — probe both
      // (plus verbatim) so "only swap the url" holds
      def folds(name: String) = Seq(name, name.toUpperCase, name.toLowerCase).distinct
      def tableExists(t: String): Boolean = folds(t).exists { n =>
        val rs = conn.getMetaData.getTables(null, null, n, null)
        try rs.next() finally rs.close()
      }
      def columnType(t: String, c: String): Option[String] = {
        val hits = for {
          tn <- folds(t); cn <- folds(c)
          ty <- {
            val rs = conn.getMetaData.getColumns(null, null, tn, cn)
            try if (rs.next()) Some(rs.getString("TYPE_NAME")) else None
            finally rs.close()
          }
        } yield ty
        hits.headOption
      }
      val grouped = rows.groupBy(_._1).toSeq.sortBy(_._1)
      // validate the WHOLE diff before executing anything (parity with
      // the catalog path): refuse, don't half-apply. Alters must name
      // an existing VARCHAR column — a missing column or one the
      // dialect cannot widen in place would otherwise throw midway
      // with earlier tables' DDL already committed.
      grouped.foreach { case (table, cols) =>
        require(tableExists(table) || cols.exists(_._4 == "add"),
          s"diff alters table $table which does not exist and gets no columns")
        cols.filter(_._4 == "alter_to_text").foreach { case (_, c, _, _) =>
          val ty = columnType(table, c)
          require(ty.isDefined,
            s"diff upgrades column $table.$c which does not exist")
          require(ty.exists(_.toUpperCase.startsWith("VARCHAR")),
            s"diff upgrades column $table.$c of type ${ty.get}, which cannot widen in place")
        }
      }
      def recordUpgrade(table: String, c: String, t: String): Unit = {
        if (!tableExists("graft_column_types"))
          run("CREATE TABLE graft_column_types (table_name VARCHAR(128), " +
            "column_name VARCHAR(128), wh_type VARCHAR(32))")
        // parameterized DML: identifiers land as VALUES, never spliced
        // into SQL text (a quote in a user-derived column name must
        // not break — or inject into — the registry statements)
        def exec(sql: String, args: String*): Unit = {
          val ps = conn.prepareStatement(sql)
          try {
            args.zipWithIndex.foreach { case (a, i) => ps.setString(i + 1, a) }
            ps.execute()
          } finally ps.close()
          stmts += sql
        }
        exec("DELETE FROM graft_column_types WHERE table_name = ? AND column_name = ?", table, c)
        exec("INSERT INTO graft_column_types VALUES (?, ?, ?)", table, c, t)
      }
      grouped.foreach { case (table, cols) =>
        val adds = cols.filter(_._4 == "add").sortBy(_._2)
        val alters = cols.filter(_._4 == "alter_to_text").sortBy(_._2)
        if (!tableExists(table) && adds.nonEmpty) {
          val colDdl = adds.map { case (_, c, t, _) => s"$c ${sqlTypeJdbc(t)}" }.mkString(", ")
          run(s"CREATE TABLE $table ($colDdl)")
        } else adds.foreach { case (_, c, t, _) =>
          run(s"ALTER TABLE $table ADD COLUMN $c ${sqlTypeJdbc(t)}")
        }
        alters.foreach { case (_, c, t, _) =>
          run(s"ALTER TABLE $table ALTER COLUMN $c SET DATA TYPE VARCHAR($jdbcTextWidth)")
          recordUpgrade(table, c, t)
        }
      }
      stmts.toSeq
    } finally conn.close()
  }

  /** Logical warehouse types recorded by `applySchemaDiffJdbc`
    * upgrades: (table, column) → wh_type. Empty before any upgrade.
    */
  def jdbcColumnTypes(url: String): Map[(String, String), String] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val meta = conn.getMetaData.getTables(null, null, "GRAFT_COLUMN_TYPES", null)
      val exists = try meta.next() finally meta.close()
      if (!exists) Map.empty
      else {
        val rs = conn.createStatement()
          .executeQuery("SELECT table_name, column_name, wh_type FROM graft_column_types")
        val b = Map.newBuilder[(String, String), String]
        try while (rs.next()) b += ((rs.getString(1), rs.getString(2)) -> rs.getString(3))
        finally rs.close()
        b.result()
      }
    } finally conn.close()
  }

  /** Apply a diff shaped like `l11_schema_diff`'s output
    * (table_name, column_name, column_type, action∈{add,alter_to_text})
    * to `db`: missing tables are CREATEd with their added columns, new
    * columns on existing tables become ALTER TABLE ADD COLUMNS, and
    * string→text upgrades are recorded as a `graft.coltype.<col>`
    * table property (physically still STRING). Returns the executed
    * statements in execution order.
    */
  def applySchemaDiff(spark: SparkSession, db: String, diff: DataFrame): Seq[String] = {
    val rows = diff.select("table_name", "column_name", "column_type", "action")
      .collect() // schema-sized metadata, never event data
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    val stmts = scala.collection.mutable.ArrayBuffer[String]()
    def run(sql: String): Unit = { spark.sql(sql); stmts += sql }
    run(s"CREATE DATABASE IF NOT EXISTS $db")
    val grouped = rows.groupBy(_._1).toSeq.sortBy(_._1)
    // validate the WHOLE diff before executing anything: an
    // alter-only entry for a missing table must refuse up front, not
    // abort midway with earlier tables' DDL already applied
    grouped.foreach { case (table, cols) =>
      require(spark.catalog.tableExists(s"$db.$table") || cols.exists(_._4 == "add"),
        s"diff alters table $table which does not exist and gets no columns")
    }
    grouped.foreach { case (table, cols) =>
      val adds = cols.filter(_._4 == "add").sortBy(_._2)
      val alters = cols.filter(_._4 == "alter_to_text").sortBy(_._2)
      val exists = spark.catalog.tableExists(s"$db.$table")
      if (!exists && adds.nonEmpty) {
        val colDdl = adds.map { case (_, c, t, _) => s"$c ${sqlType(t)}" }.mkString(", ")
        run(s"CREATE TABLE $db.$table ($colDdl) USING PARQUET")
      } else if (adds.nonEmpty) {
        val colDdl = adds.map { case (_, c, t, _) => s"$c ${sqlType(t)}" }.mkString(", ")
        run(s"ALTER TABLE $db.$table ADD COLUMNS ($colDdl)")
      }
      if (alters.nonEmpty) {
        val props = alters.map { case (_, c, t, _) => s"'graft.coltype.$c' = '$t'" }.mkString(", ")
        run(s"ALTER TABLE $db.$table SET TBLPROPERTIES ($props)")
      }
    }
    stmts.toSeq
  }
}
