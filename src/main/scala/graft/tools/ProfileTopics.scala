package graft.tools

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{CountVectorizer, RegexTokenizer, StopWordsRemover}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.{Embed, Topics}

/** Dev utility: stage-by-stage timings for the topic pipeline (q50/q51).
  * Run: sbt "runMain graft.tools.ProfileTopics /root/testdata/sf0.1" */
object ProfileTopics {
  import Profile.time

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warmup
    graft.Tables.documents(spark, d).count()

    val docs = graft.Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val tok = new RegexTokenizer().setInputCol("text").setOutputCol("raw_toks")
      .setPattern("\\W+").setToLowercase(true)
    val stop = new StopWordsRemover().setInputCol("raw_toks").setOutputCol("toks")
      .setStopWords(Topics.CustomStopwords)
    val cv = new CountVectorizer().setInputCol("toks").setOutputCol("tf")
      .setMinDF(2).setVocabSize(5000)
    val fittedPipe = time("pipeline fit (tok+stop+CV)")(
      new Pipeline().setStages(Array(tok, stop, cv)).fit(docs))
    val counted = fittedPipe.transform(docs)

    val toVec = org.apache.spark.ml.functions.array_to_vector(col("emb_arr"))
    val features = Embed.embedDocuments(spark, d)
      .withColumnRenamed("embedding", "emb_arr")
      .select(col("doc_id"), toVec.as("features"))
      .cache()
    time("features materialize")(features.count())
    val km = time("kmeans fit")(
      new KMeans().setK(10).setSeed(42L).setMaxIter(10).setFeaturesCol("features")
        .fit(features))
    time("kmeans fit (random init)")(
      new KMeans().setK(10).setSeed(42L).setMaxIter(10).setFeaturesCol("features")
        .setInitMode("random").fit(features))
    time("kmeans fit (random init, tol 1e-3)")(
      new KMeans().setK(10).setSeed(42L).setMaxIter(10).setFeaturesCol("features")
        .setInitMode("random").setTol(1e-3).fit(features))
    time("kmeans fit (random, coalesce8)")(
      new KMeans().setK(10).setSeed(42L).setMaxIter(10).setFeaturesCol("features")
        .setInitMode("random").fit(features.coalesce(8).cache()))
    val clustered = time("kmeans transform")(
      { val c = km.transform(features).select(col("doc_id"), col("prediction").as("topic")); c.count(); c })

    val withTopics = counted
      .withColumn("n_toks", size(col("toks")))
      .join(clustered, Seq("doc_id"))
      .withColumn("topic", when(col("n_toks") === 0, lit(-1)).otherwise(col("topic")))
      .select(col("doc_id"), col("topic"), col("toks"))
      .cache()
    time("withTopics materialize")(withTopics.count())

    val counts = withTopics.groupBy(col("topic")).agg(count(lit(1)).as("n"))
    val total = withTopics.agg(count(lit(1)).as("total"))
    val info = counts.crossJoin(broadcast(total))
      .select(col("topic"), col("n"), round(col("n") * 100.0 / col("total"), 2).as("pct"))
      .orderBy(col("topic"))
    time("info evaluate")(info.collect())

    time("full fit() (memoized path, fresh key)")(
      Topics.fit(spark, d, k = 10, topTermsK = 5).topicInfo.collect())

    spark.stop()
  }
}
