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

  test("CosineSim matches the HOF form bit-for-bit on real embeddings") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("a_id") < col("b_id"))
    val diff = pairs
      .select(expr("cosine_sim(a, b)").as("native"),
        graft.functions.Vectors.cosine(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof")) // bitwise-equal doubles compare equal
      .count()
    assert(diff == 0, "native expression must equal the HOF fold exactly")
  }

  test("CosineSim null semantics: null/mismatched/null-element inputs yield null") {
    val rows = Seq(
      (Array(1f, 0f), Array(1f, 0f)),   // cos = 1
      (Array(1f, 0f), Array(0f, 1f))    // cos = 0
    ).toDF("a", "b")
      .unionByName(Seq((null, Array(1f, 0f))).toDF("a", "b"))
      .unionByName(Seq((Array(1f, 0f, 0f), Array(1f, 0f))).toDF("a", "b"))
      .unionByName(Seq((Array(0f, 0f), Array(1f, 0f))).toDF("a", "b")) // zero-norm
      .select(expr("cosine_sim(a, b)").as("c")).collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-15)
    assert(math.abs(rows(1).getDouble(0)) < 1e-15)
    assert(rows(2).isNullAt(0) && rows(3).isNullAt(0) && rows(4).isNullAt(0))
  }

  // -- KmvDistinct: the native TypedImperativeAggregate ---------------------

  /** The md5 uniform the engine's sampling/sketch family uses. */
  private def mdUniform(c: org.apache.spark.sql.Column) =
    (conv(substring(md5(c.cast("string")), 1, 13), 16, 10)
      .cast("long").cast("double") + 0.5) / lit(4503599627370496.0)

  test("KmvDistinct is exact below k and within the KMV error bound above it") {
    val df = (1 to 5000).map(_.toLong).toDF("id")
      .select(col("id"), mdUniform(col("id")).as("u"))
    // exact tier: k larger than the distinct count
    val small = df.filter(col("id") <= 100)
      .agg(expr("kmv_distinct(u, 256)")).head().getLong(0)
    assert(small == 100L)
    // sketch tier: 5000 distinct at k=256 (rel std err ~1/sqrt(254) ~ 6.3%)
    val est = df.agg(expr("kmv_distinct(u, 256)")).head().getLong(0)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.2, s"estimate $est")
  }

  test("KmvDistinct is partitioning-invariant (merge is order/shape independent)") {
    val base = (1 to 3000).map(i => (i % 7, i.toLong)).toDF("g", "id")
      .select(col("g"), mdUniform(col("id")).as("u"))
    def run(parts: Int): Map[Int, Long] =
      base.repartition(parts).groupBy(col("g"))
        .agg(expr("kmv_distinct(u, 64)").as("e"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val one = run(1)
    assert(one == run(13) && one == run(32))
    // duplicates don't move the estimate: the state is distinct-valued
    val dup = base.union(base).union(base).groupBy(col("g"))
      .agg(expr("kmv_distinct(u, 64)").as("e"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(dup == one)
  }

  test("KmvDistinct ignores nulls and returns 0 for an empty group") {
    val df = Seq[java.lang.Double](null, null).toDF("u")
    assert(df.agg(expr("kmv_distinct(u, 16)")).head().getLong(0) == 0L)
  }

  test("KmvDistinct q92 shape: sketch vs exact truth per group (lineitem)") {
    // the sketch-vs-exact comparison that used to ride along inside q92 —
    // moved here because the exact countDistinct forces the Expand-based
    // multi-distinct plan + full-cardinality shuffle the sketch exists to
    // avoid (the registered q92 is sketch-only by design)
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val u = mdUniform(col("l_partkey"))
    val rows = li
      .select(col("l_returnflag"), col("l_partkey"), u.as("u"))
      .groupBy(col("l_returnflag"))
      .agg(expr("kmv_distinct(u, 256)").as("kmv_nd"),
        countDistinct(col("l_partkey")).as("exact_nd"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("kmv_nd").toDouble
      val ex = r.getAs[Long]("exact_nd").toDouble
      // k=256 → rel std err ~1/sqrt(254) ≈ 6.3%; 3σ bound (exact below k)
      assert(math.abs(est - ex) / ex <= 0.2,
        s"group ${r.get(0)}: kmv=$est exact=$ex")
    }
  }

  test("HtmlPostText compiles under CODEGEN_ONLY and keeps the UDF's null contract") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      graft.plans.GraftExtensions.register(spark)
      val rows = Seq(
        Some("""<div class="post--card--wrapper">Hello <b>world</b></div>"""),
        Some("""<div class="other">nope</div>"""),
        None)
        .toDF("html")
        // compose with built-ins: the whole projection must stay codegen'd
        .select(upper(expr("html_post_text(html)")).as("t"))
        .collect().map(_.getString(0))
      assert(rows.toSeq == Seq("HELLO WORLD", "", ""),
        "null and wrapper-less pages extract to the empty string")
      // eval (interpreted) path agrees — constant folding uses it
      assert(graft.plans.HtmlPostText(
        org.apache.spark.sql.catalyst.expressions.Literal(null,
          org.apache.spark.sql.types.StringType))
        .eval(null).toString == "")
      // SQL coercion parity with the old UDF: a bare NULL literal
      // (NullType) implicit-casts instead of failing analysis
      assert(spark.sql("SELECT html_post_text(NULL)").head().getString(0) == "")
      // and arity errors are analysis errors, not head-of-empty-list
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT html_post_text()").head()
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("CosineSim compiles under CODEGEN_ONLY (no interpreted fallback)") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val r = Seq((Array(3f, 4f), Array(3f, 4f))).toDF("a", "b")
        .select(expr("cosine_sim(a, b)").as("c")).head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }
}
