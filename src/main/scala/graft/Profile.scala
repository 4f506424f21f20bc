package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.corpus.Transcripts
import graft.index.DocIds

/** Scratch profiling main — phase-by-phase timings of the build. */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    val n = args.headOption.map(_.toLong).getOrElse(5000L)
    t("generate.count")(Transcripts.generate(spark, n).count())
    val raw = Transcripts.generate(spark, n)
    t("dedup.count")(DocIds.dedup(raw).count())
    val docs = DocIds.assign(DocIds.dedup(raw), 32)
    t("assign(materialize)")(docs.count())
    val dir = java.nio.file.Files.createTempDirectory("prof").toString
    t("docs.write")(docs.write.parquet(s"$dir/docs"))
    val docsP = spark.read.parquet(s"$dir/docs")
    t("explode.count") {
      docsP.select(col("docId"), explode(Analyzer.tokensCol(col("text"))).as("term")).count()
    }
    // round-1 shape (kept for comparison): shuffle-backed tf aggregation
    t("tfAgg(groupBy).count") {
      docsP.select(col("docId"), col("dl"),
        explode(Analyzer.tokensCol(col("text"))).as("term"))
        .groupBy(col("term"), col("docId"), col("dl"))
        .agg(count(lit(1)).cast("int").as("tf")).count()
    }
    // current shape: per-doc tf in the tokenize map pass (zero shuffle)
    val b = new graft.index.IndexBuilder(spark, dir, "prof")
    val postings = b.postingsOf(docsP)
    t("postingsOf(mapP).count")(postings.count())
    t("postings.write")(postings.write.parquet(s"$dir/postings"))
    val p = spark.read.parquet(s"$dir/postings")
    t("dictDirect.count")(b.dictDirect(p).count())
    t("dictSalted.count")(b.dictSalted(p, 16).count())
    t("sortRange.write") {
      // for reference: what the sampled range shuffle used to cost
      p.repartitionByRange(32, col("term"), col("docId"))
        .sortWithinPartitions(col("term"), col("docId"))
        .write.parquet(s"$dir/sorted")
    }
    t("IndexBuilder.build") {
      val d2 = java.nio.file.Files.createTempDirectory("prof-idx").toString
      new graft.index.IndexBuilder(spark, d2, "prof",
        graft.index.IndexConfig(partitions = 32)).build(docs)
      d2
    }
    spark.stop()
  }
}
