package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide output-dtype lint for the contract surface.
  *
  * The driver's correctness comparator hashes the Verify parquet
  * against a DuckDB result; two rounds produced values-equal rows
  * that could never hash-match because the SURFACE dtype was outside
  * what both engines canonicalize identically (r11: array<double>
  * centroids; r12: DECIMAL(38,0) scatter — decimal128 on the pyarrow
  * side, float64 on the DuckDB side). This spec turns the
  * comparator's implicit contract into a compile-against-it gate:
  * every output field of every `SparkEntry.queries` entry must be an
  * integral, double/float, string, boolean, date/timestamp, or a
  * decimal of precision ≤ 18 (fits decimal64 — both engines agree).
  * Arrays/maps/structs/binary/wide decimals are banned at the
  * contract surface; queries that genuinely produce them must
  * flatten (posexplode long form — the r11 fix) or stringify the
  * exact integer form (the r12 fix).
  */
class ContractDtypeLintSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  /** The allowlist: dtypes the driver's pyarrow↔DuckDB comparator
    * canonicalizes identically on both sides.
    */
  private def hashable(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: DoubleType | _: FloatType | _: StringType | _: BooleanType |
         _: DateType | _: TimestampType | _: TimestampNTZType => true
    case d: DecimalType => d.precision <= 18
    case _ => false
  }

  test("every contract query's output schema is driver-hashable") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // .schema forces analysis, not execution, for the PLAN — but
        // some registry entries (ann_ivfpq, ann_ivf_indexed) train and
        // save an index inside the query CONSTRUCTOR before returning
        // the DataFrame, so those few do run index-build jobs here.
        // The builds are cached per JVM (computeIfAbsent), so the
        // first-run cost lands once, on whichever spec asks first.
        val schema = fn(spark, sf).schema
        schema.fields.collect {
          case f if !hashable(f.dataType) =>
            s"$name.${f.name}: ${f.dataType.sql}"
        }
    }
    assert(violations.isEmpty,
      s"non-hashable contract outputs:\n  ${violations.mkString("\n  ")}")
  }

  test("the lint rejects the r12 failure (wide decimal) and the r11 failure (array)") {
    import spark.implicits._
    // the r12 emb_class_scatter projection shape: DECIMAL(38,0)
    val wide = Seq((1L, 2L)).toDF("n", "ss")
      .select((col("n").cast("decimal(19,0)") * col("ss").cast("decimal(19,0)"))
        .cast("decimal(38,0)").as("scatter_num"))
    assert(wide.schema.fields.exists(f => !hashable(f.dataType)),
      "lint must reject DECIMAL(38,0)")
    // the r11 emb_centroids shape: array<double>
    val arr = Seq(1).toDF("x").select(array(lit(1.0), lit(2.0)).as("centroid"))
    assert(arr.schema.fields.exists(f => !hashable(f.dataType)),
      "lint must reject ARRAY<DOUBLE>")
    // and accepts the fixed forms
    assert(wide.select(col("scatter_num").cast("string"))
      .schema.fields.forall(f => hashable(f.dataType)))
  }
}
