package graft

import org.apache.spark.sql.SparkSession

/** Fresh-JVM smoke for the SparkSessionExtensions injection point:
  * builds a session with graft.plans.GraftExtensions and resolves the
  * injected functions from pure SQL. */
object ExtDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(Some("local[2]"), shufflePartitions = 2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = spark.sql(
      """SELECT
        |  cosine_sim(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
        |             array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS c,
        |  dot_product(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS d,
        |  size(minhash_sig(array('a','b','c'), 8, 7)) AS k,
        |  size(minhash_shingle_sig(array('a','b','c','d'), 3, 16, 7)) AS ks,
        |  int_dot_product(
        |    quantize_vector(array(CAST(1.0 AS FLOAT), CAST(-0.5 AS FLOAT)),
        |                    array(2.0D, 0.5D)),
        |    quantize_vector(array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT)),
        |                    array(2.0D, 0.5D))) AS qd,
        |  zorder2(3L, 1L) AS z,
        |  range_bucket(4.5D, array(1.0D, 3.0D, 7.0D)) AS rb,
        |  nfc_normalize('é') AS nfc,
        |  strip_accents('é') AS sa
        |""".stripMargin).collect().head
    println(s"EXT_COSINE=${r.getDouble(0)} EXT_DOT=${r.getDouble(1)} " +
      s"EXT_K=${r.getInt(2)} EXT_KS=${r.getInt(3)} EXT_QD=${r.getLong(4)} " +
      s"EXT_Z=${r.getLong(5)} EXT_RB=${r.getInt(6)} " +
      s"EXT_NFC_LEN=${r.getString(7).length} EXT_SA=${r.getString(8)}")
    spark.stop()
  }
}
