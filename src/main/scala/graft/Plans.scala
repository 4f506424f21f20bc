package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints `explain("formatted")` for the operators
  * whose physical plans matter at scale (pushdown, pruning, broadcast,
  * codegen spans). Used to keep the plans honest — see PLANS.md.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_filter_keyword", "q_filter_range", "q_agg_lineitem",
        "q_join_broadcast", "q_topk_orders", "q_tf", "q_df")
    for (n <- names) {
      println(s"\n===================== $n =====================")
      try println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Exception => println(s"(failed: $e)") }
    }

    // index block scan: shard dirs must partition-prune, termId must push down
    println("\n===================== index block scan =====================")
    import org.apache.spark.sql.functions._
    val idxDir = java.nio.file.Files.createTempDirectory("plans-idx").toString
    val docs = graft.index.DocIds.assign(
      graft.corpus.Transcripts.generate(spark, 100L), 4)
    new graft.index.IndexBuilder(spark, idxDir, "plans",
      graft.index.IndexConfig(partitions = 4)).build(docs)
    val ids = spark.read.parquet(s"$idxDir/dict")
      .filter(col("term").isin("the", "zanzibar"))
      .select("termId", "shard").collect()
    val blocks = spark.read.parquet(s"$idxDir/blocks")
      .filter(col("shard").isin(ids.map(_.getInt(1)).toSeq: _*) &&
        col("termId").isin(ids.map(_.getLong(0)).toSeq: _*))
    println(blocks.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))

    // fuzzy/suggest cold dict scan: the stored bare-token `len` range
    // must PUSH DOWN to parquet (round-7) so levenshtein evaluates only
    // on length-plausible rows
    println("\n===================== fuzzy dict scan (len pushdown) =====================")
    val w = "zanzibat"
    val dictScan = spark.read.parquet(s"$idxDir/dict")
      .filter(col("len").between(lit(w.length - 1), lit(w.length + 1)) &&
        levenshtein(lit(w), col("term")) <= lit(1))
    println(dictScan.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))

    // expansion cold path (round-8, review "What's wrong #1"): the
    // deterministic term-asc cap must live IN the plan —
    // TakeOrderedAndProject BELOW the collect (per-partition heaps of
    // ≤ maxExpansions), so a low-selectivity regexp / infix wildcard
    // on a 10^9-term dictionary returns ≤ cap rows to the driver
    println("\n===================== regexp expansion cold path (cap in plan) =====================")
    val regexpScan = spark.read.parquet(s"$idxDir/dict")
      .filter(col("term").rlike("^(?:.*an.*)$"))
      .orderBy(col("term")).limit(50)
    println(regexpScan.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))

    // per-token expansion (match-fuzzy / phrase-suggest slots): the
    // rank-≤-cap window must rewrite to WindowGroupLimit (pre-shuffle
    // per-partition group limits) — the driver sees ≤ tokens × cap rows
    println("\n===================== per-token fuzzy expansion (WindowGroupLimit) =====================")
    val toks = array(lit("zanzibat"), lit("quasat"))
    val wtok = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__tok")).orderBy(col("term").asc)
    val perTok = spark.read.parquet(s"$idxDir/dict")
      .filter(col("len").between(lit(5), lit(9)))
      .select(col("term"), explode(filter(toks,
        t => levenshtein(t, col("term")) <= lit(2))).as("__tok"))
      .withColumn("__rn", row_number().over(wtok))
      .filter(col("__rn") <= lit(50))
    println(perTok.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))

    // k-bounded doc fetch (round-8, review #8): resolve/rescore joins
    // must push the literal In(docId, ...) to the doc-store parquet
    // scan (PushedFilters) so row-group min/max prune instead of
    // streaming the full 2-column store through the broadcast join
    println("\n===================== k-bounded doc resolve (In pushdown) =====================")
    val searcher0 = new graft.query.Searcher(spark, idxDir, 8)
    println(searcher0.searchResolved("zanzibar quasar", 5).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))

    // completion suggester cold path (round-8 stretch): the popularity
    // cap must live IN the plan — TakeOrderedAndProject over the
    // prefix-pruned dict scan (PushedFilters: StringStartsWith), so the
    // driver sees ≤ k rows at any vocabulary size
    println("\n===================== completion suggester (cap in plan + prefix pushdown) =====================")
    val compl = new graft.query.Searcher(spark, idxDir, 8).suggestCompletion("za", 5)
    println(compl.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))

    // nested aggregation tree (round-7): EVERY level must come from ONE
    // Expand + ONE partial/final HashAggregate pair over ONE match-set
    // join — no per-level pass, no extra shuffle per depth
    println("\n===================== nested agg tree (one rollup pass) =====================")
    val searcher = new graft.query.Searcher(spark, idxDir, 8)
    val tree = searcher.nestedAgg("the", Seq(
      graft.query.TermsLevel("role", "k1"),
      graft.query.DateHistLevel("ts", "day", "k2")), statField = Some("dl"))
    println(tree.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))

    // percolator (round-8 stretch): reverse search must be ONE
    // shuffle-free pass — no Exchange anywhere; the rule set rides a
    // broadcast variable, not a join
    println("\n===================== percolate (shuffle-free single pass) =====================")
    val perc = graft.query.Percolator.percolate(spark,
      spark.read.parquet(s"$idxDir/docs"), Seq(
        graft.query.Percolator.StoredQuery("r1", "zanzibar quasar"),
        graft.query.Percolator.StoredQuery("r2", "merge sort",
          graft.query.Percolator.Phrase)))
    println(perc.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))

    // _explain (round-8 stretch): the breakdown must come from the
    // TERM-pruned block scan (termId isin pushdown) — never a corpus
    // or full-postings scan for one document
    println("\n===================== _explain (term-pruned block scan) =====================")
    val expl = searcher.explain("zanzibar quasar", 1L)
    println(expl.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
