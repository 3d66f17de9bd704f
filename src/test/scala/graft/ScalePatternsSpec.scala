package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale patterns the 100 TB deployment relies on, demonstrated and
  * plan-asserted at test scale: bucketed co-located joins (no shuffle),
  * two-phase salted aggregation for skew, and AQE being active. */
class ScalePatternsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  test("bucketed tables co-locate the join: no Exchange above either scan") {
    // managed tables land in the default spark-warehouse dir (static conf);
    // DROP TABLE below removes the files
    val d = "/root/testdata/sf0.001"
    Tables.lineitem(spark, d).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, d).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    // disable broadcast so the join strategy decision is about co-location,
    // not table size
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_quantity")).as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      // bucketed SMJ: no shuffle exchange feeding the join
      val joinPart = plan.split("SortMergeJoin")(1)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!joinPart.split("HashAggregate").head.contains("Exchange hashpartitioning"),
        s"expected no shuffle below the bucketed join:\n$plan")
      assert(joined.collect().nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("salted two-phase aggregation equals the direct aggregation") {
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d)
    // phase 1: aggregate on (key, salt); phase 2: merge salts per key.
    // At 100 TB this bounds any single reducer's share of a hot key.
    val salted = ev
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"), round(sum(col("v")), 2).as("v"))
    val direct = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
    val s1 = salted.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val s2 = direct.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(s1 == s2)
  }

  test("AQE is active in the session (runtime re-planning at scale)") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
  }

  test("partitioned layout prunes partitions at the scan (PartitionFilters)") {
    // the 100 TB data-layout pattern: write the corpus partitioned by a
    // low-cardinality predicate column; a filter on it must prune entire
    // directories at planning time, not read-and-discard rows
    val d = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-partitioned").toString
    Tables.documents(spark, d).write.partitionBy("lang").mode("overwrite").parquet(out)
    val expected = Tables.documents(spark, d).filter(col("lang") === "en").count()
    // behavioral proof: poison every OTHER partition's files with garbage —
    // a scan that fails to prune would try to read them and error
    java.nio.file.Files.list(java.nio.file.Paths.get(out)).forEach { p =>
      val name = p.getFileName.toString
      if (name.startsWith("lang=") && name != "lang=en")
        java.nio.file.Files.list(p).forEach { f =>
          if (f.getFileName.toString.endsWith(".parquet"))
            java.nio.file.Files.write(f, "not parquet".getBytes)
        }
    }
    // explicit schema, as any at-scale reader: schema inference would read
    // every partition's footers before pruning can apply
    val schema = Tables.documents(spark, d).schema
    val q = spark.read.schema(schema).parquet(out).filter(col("lang") === "en")
      .select(col("doc_id"), col("n_chars"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    assert(q.count() == expected) // succeeds ONLY if the poisoned dirs were pruned
  }

  test("schema evolution: mergeSchema unions columns across parquet batches") {
    // the lake-side twin of U1's schema-merging union: batches written
    // months apart carry different column sets; a mergeSchema read must
    // surface the union with nulls where a batch lacks a column
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a")).toDF("id", "old_col").write.parquet(s"$dir/batch=1")
    Seq((2L, "b", 42.0)).toDF("id", "old_col", "new_col").write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "old_col", "new_col", "batch"))
    val byId = merged.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).getAs[Any]("new_col") == null) // old batch: null-filled
    assert(byId(2L).getAs[Double]("new_col") == 42.0)
  }

  test("globalOrdinal under heavy key skew: range sampling splits ties via the tiebreak") {
    import spark.implicits._
    // one key value owns 50% of the rows — the shape that melts a naive
    // range partitioner keyed on the sort column alone. The caller
    // contract (sortExprs must be a TOTAL order, tiebreak included) is
    // what lets repartitionByRange split the hot key across partitions:
    // boundaries are sampled over (k, id), not k.
    val n = 100000
    val df = (1 to n).map(i =>
        (i.toLong, if (i % 2 == 0) 42L else (i * 2654435761L) % 1000))
      .toDF("id", "k")
    val parts = 16
    val sizes = graft.ops.Ordinal
      .rangeSortedStage(df, Seq(col("k"), col("id")), parts)
      .rdd.mapPartitions(it => Iterator(it.size)).collect()
    val mean = n.toDouble / parts
    info(s"partition sizes under 50% hot key: min=${sizes.min} max=${sizes.max} mean=$mean")
    assert(sizes.sum == n)
    assert(sizes.max <= 2 * mean,
      s"hot key not split: partition sizes ${sizes.mkString(",")} vs mean $mean")
    // and the ordinal itself stays dense and correctly ordered
    val got = graft.ops.Ordinal.globalOrdinal(df, Seq(col("k"), col("id")), parts)
      .select(col("pos"), col("id"), col("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).sorted.toSeq == (1L to n.toLong).toSeq)
    assert(got.sortBy(_._1).map(t => (t._3, t._2)).toSeq ==
      got.map(t => (t._3, t._2)).sortBy(identity).toSeq)
  }

  test("q62 HLL approx distinct stays within 5% of the exact counts") {
    val d = "/root/testdata/sf0.001"
    val exact = ops.Relational.q05DistinctCount(spark, d).head()
    val approx = ops.Relational.q62ApproxDistinct(spark, d).head()
    Seq(0, 1).foreach { i =>
      val e = exact.getLong(i).toDouble
      val a = approx.getLong(i).toDouble
      assert(math.abs(a - e) / e <= 0.05,
        s"col $i: approx $a vs exact $e exceeds 5% relative error")
    }
  }
}
