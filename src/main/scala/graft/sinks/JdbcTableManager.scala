package graft.sinks

import java.sql.{Connection, DatabaseMetaData, DriverManager, Types}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.types._

import graft.config.JdbcConnection

/** Live JDBC table lifecycle: existence probe via metadata, CREATE
  * (+PK/index) when missing, schema-gate + ALTER when present — the
  * connected half of the reference's writer
  * (cda-client JdbcOutputWriter.scala:293-320 existence check and
  * create, 146-279 consistency gate, 614-665 index creation), with
  * [[JdbcDdl]]/[[SchemaGate]] supplying the pure SQL.
  */
object JdbcTableManager {

  sealed trait Action
  case object Created extends Action
  case object Unchanged extends Action
  final case class Evolved(statements: Seq[String]) extends Action
  /** Schema drift the gate refuses to auto-fix; callers skip the batch
    * (the reference's warn-and-bypass).
    */
  final case class Bypassed(reasons: Seq[String]) extends Action

  def withConnection[A](conn: JdbcConnection)(f: Connection => A): A = {
    val c = if (conn.jdbcUsername.isEmpty) DriverManager.getConnection(conn.jdbcUrl)
      else DriverManager.getConnection(conn.jdbcUrl, conn.jdbcUsername, conn.jdbcPassword)
    try f(c) finally c.close()
  }

  /** Current table schema from JDBC metadata, or None if the table
    * does not exist. Unquoted identifiers are stored uppercased by
    * Derby/Oracle and as-is elsewhere, so probe both forms (the
    * reference switches per platform, JdbcOutputWriter.scala:297-302).
    */
  def tableSchema(c: Connection, schema: String, table: String): Option[StructType] = {
    val meta = c.getMetaData
    def columnsFor(s: String, t: String): Seq[StructField] = {
      val rs = meta.getColumns(null, s, t, null)
      val buf = ArrayBuffer.empty[StructField]
      try while (rs.next()) {
        buf += StructField(
          rs.getString("COLUMN_NAME"),
          sparkType(rs.getInt("DATA_TYPE"), rs.getInt("COLUMN_SIZE"), rs.getInt("DECIMAL_DIGITS")),
          rs.getInt("NULLABLE") != DatabaseMetaData.columnNoNulls)
      } finally rs.close()
      buf.toSeq
    }
    val exact = columnsFor(schema, table)
    val found = if (exact.nonEmpty) exact else columnsFor(schema.toUpperCase, table.toUpperCase)
    if (found.isEmpty) None else Some(StructType(found))
  }

  /** Ensure `table` exists and can accept a batch with `incoming`
    * schema. Creates table + PK + secondary index when missing (PK and
    * index only when their columns exist in the schema), applies
    * gate-approved ALTERs when present.
    */
  def ensureTable(conn: JdbcConnection, incoming: StructType, table: String,
                  writeType: JdbcDdl.WriteType, keyCols: Seq[String] = Seq("id"),
                  largeTextFields: Set[String] = Set.empty): Action = {
    val platform = JdbcDdl.platformForUrl(conn.jdbcUrl)
    val qualified = s"${conn.jdbcSchema}.$table"
    withConnection(conn) { c =>
      tableSchema(c, conn.jdbcSchema, table) match {
        case None =>
          val names = incoming.fields.map(_.name).toSet
          // key columns must be NOT NULL for the PK to be legal
          val forKeys = StructType(incoming.fields.map(f =>
            if (keyCols.contains(f.name)) f.copy(nullable = false) else f))
          val create = JdbcDdl.createTableDdl(platform, forKeys, qualified, writeType, largeTextFields)
          val pk = writeType match {
            case JdbcDdl.Raw =>
              val rawPk = Seq("id", "gwcbi___seqval_hex", "gwcbi___operation")
              if (rawPk.forall(names.contains)) Some(JdbcDdl.primaryKeyDdl(qualified, JdbcDdl.Raw))
              else None
            case JdbcDdl.Merged =>
              if (keyCols.forall(names.contains)) Some(JdbcDdl.primaryKeyDdl(qualified, keyCols))
              else None
          }
          val idx = JdbcDdl.secondaryIndexDdl(qualified)
            .filter(_ => names.contains("publicid") || names.contains("typecode"))
          val stmts = Seq(create) ++ pk ++ idx
          val st = c.createStatement()
          try stmts.foreach(st.execute) finally st.close()
          Created
        case Some(existing) =>
          SchemaGate.check(existing, incoming, platform, qualified, largeTextFields) match {
            case SchemaGate.Consistent => Unchanged
            case SchemaGate.Evolve(alters) =>
              val st = c.createStatement()
              try alters.foreach(st.execute) finally st.close()
              Evolved(alters)
            case SchemaGate.Bypass(reasons) => Bypassed(reasons)
          }
      }
    }
  }

  /** JDBC metadata type → Spark type (inverse of [[JdbcDdl]]'s
    * forward mapping; lossy where SQL is — SMALLINT covers both
    * ShortType and Derby-mapped ByteType).
    */
  private def sparkType(jdbcType: Int, size: Int, scale: Int): DataType = jdbcType match {
    case Types.BIGINT => LongType
    case Types.INTEGER => IntegerType
    case Types.SMALLINT => ShortType
    case Types.TINYINT => ByteType
    case Types.DOUBLE | Types.FLOAT => DoubleType
    case Types.REAL => FloatType
    case Types.BOOLEAN | Types.BIT => BooleanType
    case Types.VARCHAR | Types.CHAR | Types.LONGVARCHAR | Types.CLOB |
         Types.NVARCHAR | Types.NCHAR | Types.LONGNVARCHAR => StringType
    case Types.TIMESTAMP => TimestampType
    case Types.DATE => DateType
    case Types.DECIMAL | Types.NUMERIC => DecimalType(size, math.max(scale, 0))
    case Types.BINARY | Types.VARBINARY | Types.LONGVARBINARY | Types.BLOB => BinaryType
    case other => throw new IllegalArgumentException(s"Unmapped JDBC type code $other")
  }
}
