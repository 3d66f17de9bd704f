package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFns, Vectors}

/** Dev utility: stage-by-stage timings for the similarity/dedup kernels.
  * Run: sbt "runMain graft.tools.Profile /root/testdata/sf0.1" */
object Profile {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warmup
    Tables.documents(spark, d).count()

    time("docs scan")(Tables.documents(spark, d).count())
    val sh = Tables.documents(spark, d)
      .select(col("doc_id"), TextFns.wordShingles(col("text"), 3).as("sh"))
    time("shingles")(sh.count())
    val hs = sh.select(col("doc_id"), transform(col("sh"), x => xxhash64(x)).as("hs"))
    time("shingles+hash")(hs.count())
    time("shingles+hash+32minhash")(
      hs.select(col("doc_id"), array((0 until 32).map(i =>
        array_min(transform(col("hs"), h => xxhash64(h, lit(i))))): _*).as("sig")).count())

    val e = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    time("emb scan")(e.count())
    time("norms HOF")(e.select(Vectors.norm2(col("embedding")).as("n")).agg(sum("n")).collect())

    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    val pairs = broadcast(a).join(b, col("va") < col("vb"))
    time("pairs count only")(pairs.count())
    time("pairs dot HOF")(
      pairs.select(Vectors.dot(col("ea"), col("eb")).as("x")).agg(sum("x")).collect())
    val cosUdf = udf { (x: Seq[Float], y: Seq[Float]) =>
      var i = 0; var dp = 0.0; var na = 0.0; var nb = 0.0
      while (i < x.length) {
        val xd = x(i).toDouble; val yd = y(i).toDouble
        dp += xd * yd; na += xd * xd; nb += yd * yd; i += 1
      }
      dp / math.sqrt(na * nb)
    }
    time("pairs cos UDF")(
      pairs.select(cosUdf(col("ea"), col("eb")).as("x")).agg(sum("x")).collect())

    // kernel: broadcast primitive matrix + tight loop
    time("pairs cos kernel") {
      import spark.implicits._
      val vecs = e.as[(Long, Array[Float])].collect().sortBy(_._1)
      val norms = vecs.map { case (_, v) =>
        var i = 0; var s2 = 0.0
        while (i < v.length) { s2 += v(i).toDouble * v(i); i += 1 }
        math.sqrt(s2)
      }
      val bcV = spark.sparkContext.broadcast(vecs)
      val bcN = spark.sparkContext.broadcast(norms)
      e.as[(Long, Array[Float])].mapPartitions { it =>
        val all = bcV.value; val ns = bcN.value
        it.flatMap { case (id, v) =>
          var na = 0.0; var i = 0
          while (i < v.length) { na += v(i).toDouble * v(i); i += 1 }
          val nA = math.sqrt(na)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          var j = 0
          while (j < all.length) {
            val (id2, w) = all(j)
            if (id2 > id) {
              var dp = 0.0; var k = 0
              while (k < v.length) { dp += v(k).toDouble * w(k); k += 1 }
              val cos = dp / (nA * ns(j))
              if (cos >= 0.4) out += ((id, id2, cos))
            }
            j += 1
          }
          out
        }
      }.toDF("a", "b", "c").count()
    }

    // dedup q38 stage breakdown
    time("q38 full")(graft.ops.Dedup.q38MinhashDedup(spark, d).count())
    time("q39 full")(graft.ops.Dedup.q39NgramJaccard(spark, d).count())
    time("q40 full")(graft.ops.Dedup.q40SimhashDedup(spark, d).count())
    time("q45 full")(graft.ops.Similarity.q45AnnIvf(spark, d).count())

    // q38 sub-stages
    {
      import org.apache.spark.sql.functions.{posexplode, element_at}
      val hs38 = Tables.documents(spark, d)
        .select(col("doc_id"), TextFns.wordShingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
        .select(col("doc_id"), transform(col("sh"), x => xxhash64(x)).as("hs"))
      val sig38 = hs38.select(col("doc_id"), org.apache.spark.sql.functions.array(
        (0 until 32).map(i => array_min(transform(col("hs"), h => xxhash64(h, lit(i))))): _*).as("sig")).cache()
      time("q38 sig cache")(sig38.count())
      val bands38 = sig38.select(col("doc_id"),
        posexplode(org.apache.spark.sql.functions.array((0 until 16).map { j =>
          xxhash64(lit(j), element_at(col("sig"), j * 2 + 1), element_at(col("sig"), j * 2 + 2))
        }: _*)).as(Seq("band", "bhash")))
      time("q38 bands")(bands38.count())
      val cand38 = bands38.as("x").join(bands38.as("y"),
        col("x.band") === col("y.band") && col("x.bhash") === col("y.bhash") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
      time("q38 cand join")(cand38.count())
      sig38.unpersist()
    }

    // q39 kernel variants
    val docs39 = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), (col("n_chars") / 100).cast("long").as("bucket"),
        array_sort(transform(TextFns.wordShingles(col("text"), 3), x => xxhash64(x))).as("hs"))
      .filter(size(col("hs")) > 0)
    time("q39 prep only")(docs39.count())
    val joined = docs39.as("x").join(docs39.as("y"),
      col("x.lang") === col("y.lang") && col("x.bucket") === col("y.bucket") &&
        col("x.doc_id") < col("y.doc_id"))
    time("q39 join only")(joined.count())
    val jacSeq = udf { (a: Seq[Long], b: Seq[Long]) =>
      var i = 0; var j = 0; var n = 0
      while (i < a.length && j < b.length) {
        val x = a(i); val y = b(j)
        if (x == y) { n += 1; i += 1; j += 1 } else if (x < y) i += 1 else j += 1
      }
      n.toDouble / (a.length + b.length - n)
    }
    val jacArr = udf { (a: Array[Long], b: Array[Long]) =>
      var i = 0; var j = 0; var n = 0
      while (i < a.length && j < b.length) {
        val x = a(i); val y = b(j)
        if (x == y) { n += 1; i += 1; j += 1 } else if (x < y) i += 1 else j += 1
      }
      n.toDouble / (a.length + b.length - n)
    }
    time("q39 seq udf")(joined.select(jacSeq(col("x.hs"), col("y.hs")).as("j"))
      .filter(col("j") >= 0.5).count())
    time("q39 arr udf")(joined.select(jacArr(col("x.hs"), col("y.hs")).as("j"))
      .filter(col("j") >= 0.5).count())
    val inter = size(array_intersect(col("x.hs"), col("y.hs"))).cast("double")
    time("q39 array_intersect")(joined
      .select((inter / (size(col("x.hs")) + size(col("y.hs")) - inter)).as("j"))
      .filter(col("j") >= 0.5).count())
    val docs39c = docs39.cache()
    docs39c.count()
    val joinedC = docs39c.as("x").join(docs39c.as("y"),
      col("x.lang") === col("y.lang") && col("x.bucket") === col("y.bucket") &&
        col("x.doc_id") < col("y.doc_id"))
    time("q39 arr udf cached")(joinedC.select(jacArr(col("x.hs"), col("y.hs")).as("j"))
      .filter(col("j") >= 0.5).count())
    spark.stop()
  }
}
