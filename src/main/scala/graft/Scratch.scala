package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiling scratchpad (not part of the shipped surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val docs = graft.model.Tables.documents(spark, sfDir)
    time("docs.count")(docs.count())
    val ids = graft.llm.Dedup.shingleSets(docs)
      .select(col("doc_id"), graft.llm.Dedup.hashId(col("s")).as("sid"))
      .cache()
    time("ids materialize")(ids.count())
    val hot = ids.groupBy("sid").agg(count(lit(1)).as("df"))
      .where(col("df") > graft.llm.Dedup.MaxShingleDf).select("sid")
    time("hot.count")(println("hot=" + hot.count()))
    val shF = ids.join(broadcast(hot), Seq("sid"), "left_anti")
    val pairsH = shF.as("a").hint("SHUFFLE_HASH").join(shF.as("b").hint("SHUFFLE_HASH"),
        col("a.sid") === col("b.sid") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    time("pairs.count (SHJ ids)")(pairsH.count())
    time("pairs.count (SHJ warm)")(pairsH.count())
    val pairsM = shF.as("a").join(shF.as("b"),
        col("a.sid") === col("b.sid") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    time("pairs.count (SMJ ids)")(pairsM.count())
    spark.stop()
  }
}
