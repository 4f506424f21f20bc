package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.Transcripts
import graft.index.{DocIds, IndexBuilder, IndexConfig}
import graft.model.Scored
import graft.query.Oracle

/** Emits the golden top-k CSV for the reference query set over the
  * seed-42 corpus (FIXTURES.md §2) — produced by the exhaustive oracle,
  * checked into src/test/resources/goldens.csv, asserted by GoldenSpec
  * against BOTH the oracle (drift guard) and the WAND engine.
  *
  * Usage: sbt "runMain graft.GoldenGen"  (rewrites the resource file)
  */
object GoldenGen {
  val NConvs = 400L
  val K = 10

  val queries: Seq[String] = Seq(
    "zanzibar", "zanzibar quasar lattice", "cinnabar monolith archipelago",
    "perihelion vellum", "the", "the a of", "the zanzibar",
    "t100 t2000 t30000", "one have t999", "definitely-notavocab-word",
    "The, A; OF!", "t10 t11 t12 t13", "t1 t500000x the"
  )

  def goldenLines(spark: SparkSession): Seq[String] = {
    import spark.implicits._
    val docs = DocIds.dedupAndAssign(Transcripts.generate(spark, NConvs), 8).toDF()
    queries.zipWithIndex.flatMap { case (q, qi) =>
      Oracle.topK(docs, q, K).as[Scored].collect().toSeq.zipWithIndex.map {
        case (s, rank) => s"q$qi\t$q\t${rank + 1}\t${s.docId}\t${s.score}"
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = java.nio.file.Paths.get("src/test/resources/goldens.csv")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      ("# query_idx\tquery\trank\tdocId\tscore (exhaustive oracle, seed-42 corpus, nConvs=400, k=10)\n" +
        goldenLines(spark).mkString("\n") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote ${out.toAbsolutePath}")
    spark.stop()
  }
}
