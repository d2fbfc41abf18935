package graft.sinks

import org.apache.spark.sql.types._

/** Relational-DDL generation for JDBC targets — the pure-function
  * core of the reference's JDBC writer
  * (cda-client JdbcOutputWriter.scala:537-665): CREATE TABLE with
  * per-platform type mapping, large-text overrides, NOT NULL key
  * columns, PK/index statements, and ALTER TABLE ADD for schema
  * evolution. No connection required, fully unit-testable.
  */
object JdbcDdl {

  sealed trait DbPlatform { def name: String }
  case object SqlServer extends DbPlatform { val name = "Microsoft SQL Server" }
  case object Postgres extends DbPlatform { val name = "PostgreSQL" }
  case object OracleDb extends DbPlatform { val name = "Oracle" }
  /** Embedded platform used for in-process end-to-end verification of
    * the whole JDBC path (DDL → raw append → merged apply → read-back).
    */
  case object Derby extends DbPlatform { val name = "Apache Derby" }

  sealed trait WriteType
  case object Raw extends WriteType
  case object Merged extends WriteType

  def platformForUrl(url: String): DbPlatform = {
    val u = url.toLowerCase
    if (u.contains("sqlserver")) SqlServer
    else if (u.contains("postgresql")) Postgres
    else if (u.contains("oracle")) OracleDb
    else if (u.contains("derby")) Derby
    else throw new IllegalArgumentException(s"Unsupported database platform url: $url")
  }

  def quote(ident: String): String = "\"" + ident + "\""

  /** String/large-string/binary platform types
    * (JdbcOutputWriter.scala:575-593).
    */
  private def stringType(p: DbPlatform): String = p match {
    case SqlServer | Postgres | Derby => "VARCHAR(1333)"
    case OracleDb => "VARCHAR2(1333)"
  }
  private def largeStringType(p: DbPlatform): String = p match {
    case SqlServer => "VARCHAR(max)"
    case Postgres => "VARCHAR"
    case OracleDb => "VARCHAR2(32767)"
    case Derby => "CLOB"
  }
  private def binaryType(p: DbPlatform): String = p match {
    case SqlServer => "VARBINARY(max)"
    case Postgres => "bytea"
    case OracleDb | Derby => "BLOB"
  }

  /** Scalar type mapping for the remaining Spark SQL types. */
  private def scalarType(p: DbPlatform, dt: DataType): String = dt match {
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case DoubleType => "DOUBLE PRECISION"
    case FloatType => "REAL"
    case ShortType => "INTEGER"
    case ByteType => if (p == Derby) "SMALLINT" else "BYTE"
    case BooleanType => p match {
      case OracleDb => "NUMBER(1)"
      case Derby => "BOOLEAN"
      case _ => "BIT(1)"
    }
    case TimestampType => if (p == SqlServer) "DATETIME2" else "TIMESTAMP"
    case DateType => "DATE"
    case t: DecimalType =>
      if (p == OracleDb && t.scale == 0) s"NUMBER(${t.precision})"
      else s"DECIMAL(${t.precision},${t.scale})"
    case other =>
      throw new IllegalArgumentException(s"Can't map type ${other.simpleString} for ${p.name}")
  }

  /** One column definition: `"name" TYPE [NOT NULL]`. */
  def columnDefinition(p: DbPlatform, tableName: String, fieldName: String,
                       dataType: DataType, nullable: Boolean,
                       largeTextFields: Set[String] = Set.empty): String = {
    val tableNoSchema = tableName.substring(tableName.indexOf('.') + 1)
    val typeDef = dataType match {
      case StringType =>
        if (largeTextFields.contains(s"$tableNoSchema.$fieldName")) largeStringType(p)
        else stringType(p)
      case BinaryType => binaryType(p)
      case dt => scalarType(p, dt)
    }
    val nullQualifier = if (nullable) "" else " NOT NULL"
    s"${quote(fieldName)} $typeDef$nullQualifier"
  }

  /** Key columns forced NOT NULL (JdbcOutputWriter.scala:542-547). */
  def notNullColumns(writeType: WriteType): Set[String] = writeType match {
    case Raw => Set("id", "gwcbi___operation", "gwcbi___seqval_hex")
    case Merged => Set("id", "gwcbi___operation", "gwcbi___seqval_hex",
      "publicid", "retired", "typecode")
  }

  /** CREATE TABLE with columns in alphabetic order (the reference
    * sorts so DDL strings are comparable across schema sources).
    */
  def createTableDdl(p: DbPlatform, schema: StructType, tableName: String,
                     writeType: WriteType,
                     largeTextFields: Set[String] = Set.empty): String = {
    val notNull = notNullColumns(writeType)
    val cols = schema.fields.sortBy(_.name).map { f =>
      val nullable = !notNull.contains(f.name) && f.nullable
      columnDefinition(p, tableName, f.name, f.dataType, nullable, largeTextFields)
    }
    s"CREATE TABLE $tableName (${cols.mkString(", ")})"
  }

  /** ALTER TABLE ADD statements for columns present in the new batch
    * schema but missing from the existing table schema
    * (JdbcOutputWriter.scala:209-232).
    */
  def alterAddColumnsDdl(p: DbPlatform, existing: StructType, incoming: StructType,
                         qualifiedTable: String,
                         largeTextFields: Set[String] = Set.empty): Seq[String] = {
    val have = existing.fields.map(_.name.toLowerCase).toSet
    incoming.fields.filterNot(f => have.contains(f.name.toLowerCase)).map { f =>
      val colDef = columnDefinition(p, qualifiedTable, f.name, f.dataType, f.nullable, largeTextFields)
      s"ALTER TABLE $qualifiedTable ADD $colDef"
    }.toIndexedSeq
  }

  /** Primary-key DDL: raw log PK is (id, seqval, operation); merged
    * state PK is (id) (JdbcOutputWriter.scala:633-643).
    */
  def primaryKeyDdl(qualifiedTable: String, writeType: WriteType): String = {
    val tableNoSchema = qualifiedTable.substring(qualifiedTable.indexOf('.') + 1)
    val cols = writeType match {
      case Merged => Seq("id")
      case Raw => Seq("id", "gwcbi___seqval_hex", "gwcbi___operation")
    }
    s"ALTER TABLE $qualifiedTable ADD CONSTRAINT ${tableNoSchema}_pk PRIMARY KEY " +
      cols.map(quote).mkString("(", ", ", ")")
  }

  /** PK over caller-chosen key columns — for merged tables whose
    * entity key is not the reference's literal `id`.
    */
  def primaryKeyDdl(qualifiedTable: String, keyCols: Seq[String]): String = {
    val tableNoSchema = qualifiedTable.substring(qualifiedTable.indexOf('.') + 1)
    s"ALTER TABLE $qualifiedTable ADD CONSTRAINT ${tableNoSchema}_pk PRIMARY KEY " +
      keyCols.map(quote).mkString("(", ", ", ")")
  }

  /** Secondary index for merged tables: typecode for typelist tables,
    * publicid otherwise (JdbcOutputWriter.scala:646-656).
    */
  def secondaryIndexDdl(qualifiedTable: String): Option[String] = {
    val tableNoSchema = qualifiedTable.substring(qualifiedTable.indexOf('.') + 1)
    val isTypelist = Seq("pctl_", "cctl_", "bctl_", "abtl_").exists(tableNoSchema.startsWith)
    val col = if (isTypelist) "typecode" else "publicid"
    Some(s"CREATE INDEX ${tableNoSchema}_idx1 ON $qualifiedTable (${quote(col)})")
  }
}
