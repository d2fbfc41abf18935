package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe (r18): print optimizer size estimates for the inputs
  * the probe-pin gate must route, next to their true row counts.
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def show(name: String, df: DataFrame): Unit = {
      val st = df.queryExecution.optimizedPlan.stats
      val actual = df.count()
      println(f"[stats] $name%-28s sizeInBytes=${st.sizeInBytes}%-14s " +
        s"rowCount=${st.rowCount} actual=$actual " +
        f"bytesPerRow=${st.sizeInBytes.toDouble / math.max(1L, actual)}%.1f")
    }

    val li = graft.sources.TableCatalog.lineitem(spark, sfDir)
    // q93's perValue: checkpointed (value -> weight) table
    val cents = (col("l_extendedprice").cast("decimal(18,2)") * 100)
      .cast("long")
    val perValueRaw = li
      .select(cents.as("v"), col("l_quantity").cast("long").as("q"))
      .groupBy(col("v")).agg(sum(col("q")).as("w"))
    show("q93_perValue_raw", perValueRaw)
    show("q93_perValue_ckpt", perValueRaw.localCheckpoint(true))

    // q137-style count table: (g, x) counts off lineitem
    val rows = li.select(col("l_returnflag").as("g"),
      col("l_quantity").cast("long").as("x"))
    val counts = rows.groupBy(col("g"), col("x")).agg(count(lit(1)).as("cnt"))
    show("q137_cells_raw", counts)
    show("q137_cells_ckpt", counts.localCheckpoint(true))

    // orders-scale rank input (q103-ish): per-customer aggregate
    val o = graft.sources.TableCatalog.orders(spark, sfDir)
    val perCust = o.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("tot"))
      .withColumn("t", col("tot").cast("decimal(18,2)").cast("long"))
    show("q103_perCust_raw", perCust)

    spark.stop()
  }
}
