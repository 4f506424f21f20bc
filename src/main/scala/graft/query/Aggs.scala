package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Nested / composite aggregation trees (round-6 review "What's missing
  * #1" — the top remaining ES user surface: Kibana-style multi-level
  * bucket dashboards, e.g. terms→date_histogram→stats or
  * terms→terms→count, over the dynamic-mapped keyword/date fields the
  * reference's ES mapping exposes, mapping.json:4-25).
  *
  * Execution shape: ONE match-set join + ONE `rollup` aggregation — a
  * single shuffle pass computes EVERY level of the bucket tree (each
  * prefix grouping set is one tree level: depth d rows are the level-d
  * buckets with their own doc counts and metrics, exactly ES's nested
  * response flattened). `rollup` is Spark's grouping-sets expansion:
  * map-side partial aggregation applies per grouping set, the shuffle
  * keys on the grouping-set id + keys, and no level needs its own pass
  * over the match set — at 10^12 docs the cost is one pass regardless
  * of tree depth. Per-level `size` caps (ES terms-agg bucket pruning)
  * prune AFTER the one-pass agg on the (tiny) bucket frame: ranked by
  * (count desc, key asc — ES's default deterministic order) within the
  * parent bucket, descendants of dropped buckets pruned via semi-joins
  * on the bucket frame itself, never a second match-set pass.
  *
  * Bucket-key NULL convention: rollup rows use NULL for aggregated-out
  * deeper keys, so a NULL in a real bucket key would be ambiguous —
  * callers aggregate on non-null fields (the `depth` column
  * disambiguates programmatically: a level-d row has exactly d
  * non-aggregated keys).
  *
  * Empty match set → EMPTY frame (Spark grouping-sets semantics: no
  * input groups, no rows — including the grand-total set). Note the
  * divergence from plain SQL `GROUP BY ROLLUP`, which emits a 0-count
  * grand-total row on empty input; the DuckDB twin carries
  * `HAVING count(*) > 0` (a no-op on any non-empty input, where every
  * grouping-set row counts ≥ 1) to pin the same contract.
  */
sealed trait BucketLevel {
  /** Source column of this level's bucket key. */
  def field: String

  /** Output column name of this level's bucket key. */
  def as: String

  /** ES terms-agg `size` (> 0 keeps the top `size` buckets per parent
    * by doc count desc, key asc); 0 = all buckets. Non-terms levels
    * are never size-capped (ES shape).
    */
  def size: Int = 0
}

/** `terms` bucket over a keyword/numeric field. */
final case class TermsLevel(field: String, as: String,
    override val size: Int = 0) extends BucketLevel

/** `date_histogram` (calendar_interval = a `date_trunc` unit). */
final case class DateHistLevel(field: String, interval: String,
    as: String) extends BucketLevel

/** Fixed-width numeric `histogram` (bucket = floor(v/width)·width). */
final case class HistogramLevel(field: String, width: Long,
    as: String) extends BucketLevel

object Aggs {

  /** The bucket-key projection of one level. */
  private def keyCol(l: BucketLevel): Column = l match {
    case TermsLevel(f, as, _) => col(f).as(as)
    case DateHistLevel(f, iv, as) => date_trunc(iv, col(f)).as(as)
    case HistogramLevel(f, w, as) =>
      (floor(col(f) / lit(w)) * lit(w)).cast("long").as(as)
  }

  /** One-pass nested aggregation over `joined` — the (docId ⋈ match
    * set) frame carrying every level's source column (+ `statField`).
    * Output: one row per bucket at EVERY tree level — key columns (NULL
    * = aggregated out at this level), `depth` (number of defined keys;
    * 0 = the grand-total row), `n_docs`, and min/max/avg/sum of
    * `statField` when given. Deterministically ordered (depth asc, keys
    * asc NULLS FIRST).
    */
  def nestedAggOf(joined: DataFrame, levels: Seq[BucketLevel],
      statField: Option[String]): DataFrame = {
    require(levels.nonEmpty, "nested aggregation needs >= 1 bucket level")
    require(levels.map(_.as).distinct.size == levels.size,
      "bucket levels must have distinct output names")
    val names = levels.map(_.as)
    val base = joined.select(levels.map(keyCol) ++ statField.map(col): _*)
    // depth = levels − Σ grouping(k): grouping() is 1 when the rollup
    // aggregated the key out — the exact GROUPING() bit DuckDB computes,
    // so the SQL twin reproduces depth verbatim
    val depth = (lit(levels.size) -
      names.map(n => grouping(col(n)).cast("int")).reduce(_ + _)).as("depth")
    val statAggs = statField.toSeq.flatMap { f =>
      Seq(min(col(f)).as("min"), max(col(f)).as("max"),
        round(avg(col(f)), 6).as("avg"), sum(col(f)).as("sum"))
    }
    val aggCols = Seq(depth, count(lit(1)).as("n_docs")) ++ statAggs
    val full = base.rollup(names.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
    // per-level terms `size` pruning on the bucket frame (post-agg,
    // cheap): keep top-size per parent at depth i+1, drop descendants
    var out = full
    for ((l, i) <- levels.zipWithIndex if l.size > 0) {
      val kept =
        if (i == 0)
          // root level: TakeOrderedAndProject (per-partition heaps),
          // never an unpartitioned window over the bucket frame
          out.filter(col("depth") === lit(1))
            .orderBy(col("n_docs").desc, col(names(0)).asc)
            .limit(l.size)
            .select(col(names(0)))
        else {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(names.take(i).map(col): _*)
            .orderBy(col("n_docs").desc, col(names(i)).asc)
          out.filter(col("depth") === lit(i + 1))
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") <= lit(l.size))
            .select(names.take(i + 1).map(col): _*)
        }
      // rows at depth ≤ i are ancestors/totals (unaffected); rows with
      // this level defined must descend from a kept bucket. The prune
      // join is NULL-SAFE (<=>): a real NULL bucket key at depth i+1 is
      // unambiguous (depth separates it from rollup NULLs) and must
      // survive its own size selection — a plain equi-join would
      // silently drop it and every descendant (round-7 review)
      val keyNames = names.take(i + 1)
      val keptR = kept.toDF(keyNames.map("__kept_" + _): _*)
      val cond = keyNames.map(n => col(n) <=> col(s"__kept_$n")).reduce(_ && _)
      out = out.filter(col("depth") <= lit(i))
        .unionByName(out.filter(col("depth") > lit(i))
          .join(keptR, cond, "left_semi"))
    }
    out.orderBy(col("depth").asc +: names.map(col(_).asc_nulls_first): _*)
  }

  /** ES `composite` aggregation (round-7 review "What's missing #3" —
    * the scalable bucket-EXPORT path when a terms source has 10^7
    * buckets): FLAT distinct key tuples of `levels` (each a composite
    * `source`), deterministically ordered keys-asc, paged by an
    * EXCLUSIVE lexicographic `after` cursor — exactly ES's after_key
    * contract (the caller passes the last returned tuple; pages are
    * disjoint and exhaustive). Per page: the cursor filter applies on
    * the aggregated bucket frame (post-agg, tiny) and
    * `orderBy(keys).limit(size)` plans as TakeOrderedAndProject — per-
    * partition heaps of ≤ size buckets, so a deep page never sorts the
    * full bucket frame. Docs missing ANY key column are omitted (ES
    * composite default, missing_bucket = false). `statField` adds the
    * same min/max/avg/sum metrics as [[nestedAggOf]].
    */
  def compositeAggOf(joined: DataFrame, levels: Seq[BucketLevel],
      statField: Option[String], size: Int,
      after: Option[Seq[Any]]): DataFrame = {
    require(levels.nonEmpty, "composite aggregation needs >= 1 source")
    require(size > 0, "composite size must be positive")
    require(levels.map(_.as).distinct.size == levels.size,
      "composite sources must have distinct output names")
    require(after.forall(_.size == levels.size),
      s"after cursor must carry exactly ${levels.size} key values")
    val names = levels.map(_.as)
    val statAggs = statField.toSeq.flatMap { f =>
      Seq(min(col(f)).as("min"), max(col(f)).as("max"),
        round(avg(col(f)), 6).as("avg"), sum(col(f)).as("sum"))
    }
    val aggCols = Seq(count(lit(1)).as("n_docs")) ++ statAggs
    val grouped = joined.select(levels.map(keyCol) ++ statField.map(col): _*)
      .filter(names.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(names.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
    val paged = after match {
      case None => grouped
      case Some(cursor) =>
        // exclusive lexicographic (k1..kd) > (a1..ad)
        val pred = names.zip(cursor).foldRight(lit(false)) {
          case ((nm, a), rest) => col(nm) > lit(a) || (col(nm) === lit(a) && rest)
        }
        grouped.filter(pred)
    }
    paged.orderBy(names.map(col(_).asc): _*).limit(size)
  }

  // ---- pipeline aggregations (round-7 review "What's missing #4"):
  // Kibana dashboard math over an ALREADY-aggregated bucket frame —
  // window/arithmetic passes, never a second match-set pass. They
  // compose over [[compositeAggOf]] pages or one level of a
  // [[nestedAggOf]] tree; the input is bucket-sized, so even the
  // unpartitioned (no parent keys) window is bounded by the bucket
  // count, not the corpus.

  /** ES `bucket_script`: a per-bucket arithmetic column over the
    * bucket frame's existing metric columns.
    */
  def bucketScript(buckets: DataFrame, as: String, expr: Column): DataFrame =
    buckets.withColumn(as, expr)

  /** ES `derivative`: value(bucket) − value(previous bucket) within
    * each parent bucket, ordered by `orderKey` asc (the histogram
    * axis); the first bucket's derivative is NULL (ES omits it).
    */
  def derivative(buckets: DataFrame, parentKeys: Seq[String],
      orderKey: String, of: String, as: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(parentKeys.map(col): _*).orderBy(col(orderKey).asc)
    buckets.withColumn(as, col(of) - lag(col(of), 1).over(w))
  }

  /** ES `cumulative_sum`: running sum of `of` within each parent
    * bucket, ordered by `orderKey` asc.
    */
  def cumulativeSum(buckets: DataFrame, parentKeys: Seq[String],
      orderKey: String, of: String, as: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(parentKeys.map(col): _*).orderBy(col(orderKey).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    buckets.withColumn(as, sum(col(of)).over(w))
  }

  /** ES `avg_bucket` (a sibling pipeline agg): one row — the average
    * of `of` across the bucket frame.
    */
  def avgBucket(buckets: DataFrame, of: String): DataFrame =
    buckets.agg(avg(col(of)).as("avg_bucket"))

  /** ES `moving_avg` (2.x simple model) / `moving_fn` avg: the mean of
    * `of` over the trailing `window` buckets (current included) within
    * each parent bucket, ordered by `orderKey` asc; the leading
    * partial windows average what exists (ES behavior).
    */
  def movingAvg(buckets: DataFrame, parentKeys: Seq[String], orderKey: String,
      of: String, window: Int, as: String): DataFrame = {
    require(window >= 1, "moving_avg window must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(parentKeys.map(col): _*).orderBy(col(orderKey).asc)
      .rowsBetween(-(window - 1).toLong,
        org.apache.spark.sql.expressions.Window.currentRow)
    buckets.withColumn(as, avg(col(of)).over(w))
  }

  /** ES `serial_diff`: value(bucket) − value(`lagN` buckets earlier)
    * within each parent bucket; the first `lagN` buckets are NULL (ES
    * omits them).
    */
  def serialDiff(buckets: DataFrame, parentKeys: Seq[String], orderKey: String,
      of: String, lagN: Int, as: String): DataFrame = {
    require(lagN >= 1, "serial_diff lag must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(parentKeys.map(col): _*).orderBy(col(orderKey).asc)
    buckets.withColumn(as, col(of) - lag(col(of), lagN).over(w))
  }

  /** ES `stats_bucket` (sibling pipeline agg): ONE row of (n_buckets,
    * min, max, avg, sum) over the bucket frame's `of` metric —
    * subsumes max_bucket / min_bucket / sum_bucket / avg_bucket.
    */
  def statsBucket(buckets: DataFrame, of: String): DataFrame =
    buckets.agg(count(col(of)).as("n_buckets"), min(col(of)).as("min"),
      max(col(of)).as("max"), avg(col(of)).as("avg"), sum(col(of)).as("sum"))
}
