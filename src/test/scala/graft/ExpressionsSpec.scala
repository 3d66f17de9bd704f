package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftExtensions

/** Native Catalyst expression (C13) + SQL registration via extensions. */
class ExpressionsSpec extends AnyFunSuite {

  lazy val spark = {
    val s = SparkTestSession.get
    GraftExtensions.register(s)
    s
  }
  import spark.implicits._

  test("DmsToDecimal parses valid strings and nulls malformed ones") {
    val df = Seq(
      """38 deg 55' 58.80" N""",
      """77 deg 2' 11.40" W""",
      """12 deg 30' 0.0" X""", // bad direction
      "garbage",
      """5 deg x' 1.0" N""").toDF("s")
      .select(expr("dms_to_decimal(s)").as("d"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(math.abs(got(0).get - 38.933) < 1e-9)
    assert(math.abs(got(1).get + 77.0365) < 1e-4)
    assert(got(2).isEmpty && got(3).isEmpty && got(4).isEmpty)
  }

  test("native expression agrees with the regexp formulation on the q28 corpus") {
    val c = Tables.customer(spark, "/root/testdata/sf0.001")
      .withColumn("dms", format_string("%d deg %d' %.1f\" %s",
        col("c_custkey") % 90, (col("c_custkey") * 7) % 60,
        (col("c_custkey") % 600).cast("double") / 10.0,
        when(col("c_custkey") % 2 === 0, "N").otherwise("S")))
    val cmp = c.select(
      graft.functions.Gps.dmsToDecimal(col("dms")).as("re"),
      expr("dms_to_decimal(dms)").as("native"))
    assert(cmp.filter(col("re") =!= col("native")).count() == 0)
    assert(cmp.filter(col("native").isNull).count() == 0)
  }

  test("SQL surface: dms_to_decimal and html_post_text registered on the session") {
    val r = spark.sql("""SELECT dms_to_decimal("38 deg 55' 58.80\" N") AS d,
                        |  html_post_text('<div class="post--card--wrapper">hi</div>') AS t
                        |""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 38.933) < 1e-9)
    assert(r.getString(1) == "hi")
  }

  test("SQL surface: winnow_fingerprints matches the Column API on raw text") {
    graft.plans.GraftExtensions.register(spark)
    val text = "  the   quick\tbrown fox jumps over the lazy dog  "
    val viaSql = spark.sql(s"SELECT winnow_fingerprints('$text') AS fp")
      .head().getSeq[String](0).toSet
    val viaCol = Seq(text).toDF("t")
      .select(graft.functions.TextFns.winnowedFingerprints(
        org.apache.spark.sql.functions.col("t")).as("fp"))
      .head().getSeq[String](0).toSet
    assert(viaSql == viaCol && viaSql.nonEmpty)
  }

  test("codegen: two calls in one projection over a non-nullable child compile") {
    // regression: a fixed-name codegen local collided when nullSafeCodeGen
    // emitted the block unbraced (non-nullable child); CODEGEN_ONLY would fail
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val r = Seq(("""1 deg 0' 0.0" N""", """2 deg 0' 0.0" S"""))
        .toDF("a", "b")
        .select(expr("dms_to_decimal(a)").as("da"), expr("dms_to_decimal(b)").as("db"))
        .head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
      assert(math.abs(r.getDouble(1) + 2.0) < 1e-9)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("codegen path: expression evaluates inside a wider codegen'd projection") {
    val df = Tables.customer(spark, "/root/testdata/sf0.001")
      .withColumn("dms", concat((col("c_custkey") % 90).cast("string"),
        lit(" deg 10' 30.0\" S")))
      .select((expr("dms_to_decimal(dms)") * -1).as("pos"))
      .agg(sum("pos"))
    assert(!df.head().isNullAt(0))
  }
}
