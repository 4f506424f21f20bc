package graft.query

import graft.index.Codec
import graft.model.{PostingBlock, Scored}

/** Block-max WAND top-k over compressed posting blocks (north_rule:
  * "BM25 top-k query executor using posting-list intersection with
  * block-max WAND pruning"; Ding & Suel, SIGIR'11 pattern). Exact:
  * pruning uses per-term global upper bounds and per-block max scores
  * with a small safety margin, so it never skips a doc that could enter
  * the top-k; every surviving doc is scored with the exact BM25 sum in
  * ascending term order — bit-identical to the exhaustive oracle
  * (SURVEY.md §7.5 float-determinism decisions).
  */
object Wand {
  private val Margin = 1e-7

  /** The full positional-cursor interface the intersection executor
    * drives: a required AND/phrase list is anything that can report a
    * block-level bound + horizon (for the block-max early exit),
    * positions (for phrase slots) and an exact score contribution.
    * [[TermIterator]] is the single-posting-list instance;
    * [[UnionPosIterator]] the multi-term disjunction slot
    * (`match_phrase_prefix`'s expanded last position).
    */
  trait PosCursor extends DocCursor {
    def term: String
    def ub: Double
    def exhausted: Boolean
    def blockMax: Double
    def blockLast: Long
    def shallowSeek(target: Long): Unit
    def advancePast(doc: Long): Unit
    def positions: Array[Int]
    def score: Double
  }

  /** One term's posting cursor over its block list (blocks sorted by
    * firstDocId; docId-disjoint — guaranteed by build: range-partitioned
    * runs within docId-range buckets). Blocks are decoded lazily; block
    * skipping never decodes skipped blocks.
    *
    * `staleBlockMax = true` ignores the STORED per-block maxScore and
    * re-derives a valid bound from the block's maxTf (stats-independent)
    * as score(maxTf, dl = 0) — needed when the index is queried under
    * DIFFERENT global stats than it was built with (cross-segment search
    * over merged segments: stored maxScore encodes per-segment df/N/avgdl
    * and is no longer an upper bound).
    */
  final class TermIterator(
      val term: String,
      blocksIn: Array[PostingBlock],
      val ub: Double,
      df: Long,
      n: Long,
      avgdl: Double,
      staleBlockMax: Boolean = false,
      /** Score multiplier (ES per-field boost — `multi_match` weights).
        * Scales `score` AND both block-max bounds, so pruning stays
        * sound; callers must pass a pre-scaled `ub`.
        */
      boost: Double = 1.0,
      /** dis_max group this INSTANCE is attributed to (shared-term
        * sub-queries build one iterator per (group, term) —
        * [[BestFields.groupsOf]]); Int.MinValue = unset, attribution
        * falls back to the term-keyed [[BestFields.fieldOf]] map.
        */
      val groupOrdinal: Int = Int.MinValue
  ) extends PosCursor {
    private val blocks = blocksIn.sortBy(b => (b.firstDocId, b.lastDocId))
    private var bi = 0
    private var dec: Codec.DecodedBlock = _
    private var posDec: Array[Array[Int]] = _
    private var pos = 0
    /** Blocks actually decoded (pruning-effectiveness metric: block skips
      * and block-max early exits avoid decodes entirely).
      */
    var decodes: Long = 0L
    var curDoc: Long = _
    decodeCurrent()

    private def decodeCurrent(): Unit = {
      if (bi >= blocks.length) { curDoc = Long.MaxValue; dec = null; posDec = null }
      else {
        dec = Codec.decodeBlock(blocks(bi)); posDec = null; pos = 0
        decodes += 1; curDoc = dec.docIds(0)
      }
    }

    /** Token positions of the current posting (ascending). Requires an
      * index built with storePositions (the default).
      */
    def positions: Array[Int] = {
      if (posDec == null) {
        posDec = Codec.decodePositions(blocks(bi), dec.tfs)
        require(posDec != null,
          s"index stores no positions for term '$term' — build with storePositions=true")
      }
      posDec(pos)
    }

    def exhausted: Boolean = curDoc == Long.MaxValue

    /** Max score of the block that contains (or is the first after) the
      * current position — used for the block-max refinement.
      */
    def blockMax: Double =
      if (bi >= blocks.length) 0.0
      else if (staleBlockMax) boost * Bm25.score(blocks(bi).maxTf, df, 0, n, avgdl)
      else boost * blocks(bi).maxScore

    /** Last docId of the current block (skip horizon). */
    def blockLast: Long = if (bi >= blocks.length) Long.MaxValue else blocks(bi).lastDocId

    /** Shallow block seek: advance the block pointer (no decode) until the
      * current block's lastDocId >= target. Invalidates the in-block
      * position, so callers must follow with nextGEQ(target) before
      * reading scores; curDoc stays a lower bound.
      */
    def shallowSeek(target: Long): Unit = {
      if (bi < blocks.length && blocks(bi).lastDocId >= target) return
      while (bi < blocks.length && blocks(bi).lastDocId < target) bi += 1
      dec = null; posDec = null; pos = 0
      if (bi >= blocks.length) curDoc = Long.MaxValue
    }

    def nextGEQ(target: Long): Unit = {
      if (curDoc >= target && dec != null) return
      while (bi < blocks.length && blocks(bi).lastDocId < target) { bi += 1; dec = null; posDec = null }
      if (bi >= blocks.length) { curDoc = Long.MaxValue; dec = null; posDec = null; return }
      if (dec == null) { dec = Codec.decodeBlock(blocks(bi)); posDec = null; pos = 0; decodes += 1 }
      // in-block scan (blocks are <=128 entries; galloping not worth it)
      while (dec.docIds(pos) < target) pos += 1
      curDoc = dec.docIds(pos)
    }

    def advancePast(doc: Long): Unit = nextGEQ(doc + 1)

    /** Exact (boost-scaled) BM25 contribution at the current position. */
    def score: Double = boost * Bm25.score(dec.tfs(pos), df, dec.dls(pos), n, avgdl)
  }

  /** Membership-only cursor over a sorted docId stream — what filter /
    * must_not clauses need (curDoc/nextGEQ, never scores). TermIterator
    * is the single-posting-list instance; [[UnionCursor]] the
    * disjunction.
    */
  trait DocCursor {
    def curDoc: Long
    def nextGEQ(target: Long): Unit
  }

  /** Membership cursor over a SORTED, distinct docId array — what
    * tombstone exclusion needs (cross-segment last-write-wins upsert:
    * superseded docs are skipped like `must_not` lists, but the list
    * lives in the tombstone store, not in postings). Galloping + binary
    * search advance: O(log gap) per nextGEQ.
    */
  final class SortedArrayCursor(ids: Array[Long]) extends DocCursor {
    private var i = 0
    def curDoc: Long = if (i < ids.length) ids(i) else Long.MaxValue
    def nextGEQ(target: Long): Unit = {
      if (curDoc >= target) return
      var lo = i
      var step = 1
      while (lo + step < ids.length && ids(lo + step) < target) { lo += step; step <<= 1 }
      var a = lo
      var b = math.min(ids.length, lo + step + 1)
      while (a < b) {
        val m = (a + b) >>> 1
        if (ids(m) < target) a = m + 1 else b = m
      }
      i = a
    }
  }

  /** Disjunction of posting lists as one cursor (ES `terms` / `range`
    * filter clauses: doc matches if it carries ANY of the clause's
    * values). curDoc = min over members; members are advanced lazily on
    * nextGEQ. Linear min-scan per advance — filter clauses expand to a
    * handful of field values (and each advance is amortized against the
    * galloping block skips inside the members), so a heap buys nothing
    * at this fan-in.
    */
  final class UnionCursor(members: Seq[TermIterator]) extends DocCursor {
    private val ms = members.toArray
    private var cur = if (ms.isEmpty) Long.MaxValue else ms.map(_.curDoc).min
    def curDoc: Long = cur
    def nextGEQ(target: Long): Unit = {
      if (cur >= target) return
      var min = Long.MaxValue
      var i = 0
      while (i < ms.length) {
        if (ms(i).curDoc < target) ms(i).nextGEQ(target)
        if (ms(i).curDoc < min) min = ms(i).curDoc
        i += 1
      }
      cur = min
    }
  }

  /** Disjunction of posting lists as ONE required positional slot — the
    * `match_phrase_prefix` rewrite (Lucene's MultiPhraseQuery position):
    * the doc matches the slot when ANY member term occurs, and the
    * slot's positions are the members' merged occurrence positions.
    * Score contribution is 0 (the engine's documented phrase-scoring
    * rule sums the FIXED phrase terms; the expanded slot gates
    * membership only), so `blockMax = 0` keeps block-max pruning sound
    * and `blockLast = MaxValue` never constrains the skip horizon (a
    * zero bound is valid over any span).
    */
  final class UnionPosIterator(val term: String, members: Array[TermIterator])
      extends PosCursor {
    require(members.nonEmpty, "empty prefix-slot expansion")
    val ub = 0.0
    private var cur = members.map(_.curDoc).min
    def curDoc: Long = cur
    def nextGEQ(target: Long): Unit = {
      if (cur >= target) return
      var min = Long.MaxValue
      var i = 0
      while (i < members.length) {
        if (members(i).curDoc < target) members(i).nextGEQ(target)
        if (members(i).curDoc < min) min = members(i).curDoc
        i += 1
      }
      cur = min
    }
    def advancePast(doc: Long): Unit = nextGEQ(doc + 1)
    def shallowSeek(target: Long): Unit = {
      var i = 0
      while (i < members.length) { members(i).shallowSeek(target); i += 1 }
      if (exhausted) cur = Long.MaxValue
    }
    def exhausted: Boolean = members.forall(_.exhausted)
    def blockMax: Double = 0.0
    def blockLast: Long = Long.MaxValue
    def score: Double = 0.0
    /** Merged ascending occurrence positions of the members sitting on
      * the current doc (each aligned member's in-block position is valid
      * after the nextGEQ that aligned it).
      */
    def positions: Array[Int] = {
      val bufs = members.iterator.filter(_.curDoc == cur).map(_.positions).toArray
      if (bufs.length == 1) bufs(0)
      else bufs.flatten.distinct.sorted
    }
  }

  /** ES `multi_match` best_fields combination (the multi_match DEFAULT
    * mode): per doc, each field's matched terms sum to a per-field score
    * s_f (ascending namespaced-term order, the engine-wide rule); the
    * doc's score is s_best + tieBreaker · Σ s_others. Evaluated as ONE
    * fold over all matched contributions in ascending namespaced-term
    * order with weight 1 on the best field's terms and `tieBreaker` on
    * the rest, so tieBreaker = 1 is BIT-identical to the most_fields
    * sum and tieBreaker = 0 to the best field's own sum. Ties on s_f
    * resolve to the field whose terms sort first (`%`-namespaced fields
    * before the un-namespaced main text). Pruning stays sound for
    * tieBreaker ∈ [0, 1]: every weight ≤ 1, so per-term/block bounds
    * over-estimate the weighted contribution.
    */
  final class BestFields(val fieldOf: Map[String, Int], val nFields: Int,
      val tieBreaker: Double,
      /** non-null = dis_max over sub-queries that may SHARE analyzed
        * terms (round-7 review "What's missing #5"): a term belongs to
        * EVERY listed group ordinal, and the executors build ONE
        * scored iterator per (group, term) — each instance carries its
        * ordinal ([[TermIterator.groupOrdinal]]), so a shared term
        * contributes to each containing group's sum independently (ES
        * dis_max scores each sub-query in isolation). Pruning stays
        * sound: every instance carries its FULL ub, so Σ ub over
        * instances ≥ Σ_g s_g ≥ the weighted dis-max score for any
        * tie_breaker ∈ [0, 1]. null = attribution by [[fieldOf]].
        */
      val groupsOf: Map[String, Seq[Int]] = null) extends Serializable {
    require(tieBreaker >= 0.0 && tieBreaker <= 1.0,
      s"tie_breaker must be in [0, 1], got $tieBreaker")
  }

  object BestFields {
    /** Build the term → field-ordinal map for `fields` × `toks`
      * (ordinals in ascending namespaced-prefix order — `%`-fields by
      * name, the main "text" field last, matching global term order).
      */
    def of(fields: Seq[String], toks: Seq[String], tieBreaker: Double): BestFields = {
      val ordered = fields.distinct.sortBy(f =>
        if (f == "text") "\uffff" else graft.index.FieldTerms.textTerm(f, ""))
      val ordOf = ordered.zipWithIndex.toMap
      val m = for (f <- ordered; t <- toks.distinct)
        yield graft.index.FieldTerms.textTerm(f, t) -> ordOf(f)
      new BestFields(m.toMap, ordered.size, tieBreaker)
    }
  }

  private final case class HeapEntry(score: Double, docId: Long)
  // min-heap: worst entry on top = lowest score, then LARGEST docId
  // (ties rank by docId asc, so the largest docId is the weakest).
  private val heapOrd: Ordering[HeapEntry] =
    Ordering.by[HeapEntry, (Double, Long)](e => (-e.score, e.docId))

  /** Align `filters` at `doc`: returns `doc` if every filter list
    * contains it, else a docId ≥ the first position where all filters
    * COULD align again (the max of their curDocs) — the caller skips its
    * scored cursors there. Filters are membership-only (ES bool `filter`
    * context): they never contribute score, so they play no part in
    * pivot/upper-bound pruning — they only veto candidates.
    */
  private def filtersAlignAt(filters: Array[DocCursor], doc: Long): Long = {
    var next = doc
    var i = 0
    while (i < filters.length) {
      filters(i).nextGEQ(doc)
      val c = filters(i).curDoc
      if (c > next) next = c
      i += 1
    }
    next
  }

  /** Is `doc` present in any exclusion list (ES bool `must_not`)? */
  private def excludedAt(excludes: Array[DocCursor], doc: Long): Boolean = {
    var i = 0
    while (i < excludes.length) {
      excludes(i).nextGEQ(doc)
      if (excludes(i).curDoc == doc) return true
      i += 1
    }
    false
  }

  /** Disjunctive (OR) BM25 top-k — the ES `match` query shape (SURVEY.md
    * J3/T1). `lists` must be keyed by distinct terms — EXCEPT shared-
    * term dis_max instances ([[BestFields.groupsOf]]): one iterator per
    * (group, term) is valid because each instance scores and bounds
    * independently (two cursors on one posting list behave like two
    * terms with identical postings). `filters` are
    * required-but-unscored lists (ES bool `filter` context — typically
    * fielded keyword terms like `#role:user`); `excludes` veto their docs
    * (`must_not`). Both default empty = plain WAND, and neither affects
    * pruning soundness: filters/excludes only REMOVE candidates, and the
    * pivot bound Σub over scored lists stays a valid upper bound.
    *
    * `shoulds` are OPTIONAL scoring lists (ES bool `should` context,
    * term-disjoint from `lists`): a matched should term adds its BM25
    * contribution but is never required — except that a qualifying doc
    * must match ≥ `minShould` of them (`minimum_should_match`). `lists`
    * is the required group: when non-empty a doc must match ≥ 1 of it
    * (the ES `match`-in-`must` shape); when empty, shoulds alone drive
    * the query (pure m-of-n). Scores stay deterministic: ONE sum over
    * all matched terms in ascending term order, exactly the no-should
    * rule. Pruning stays sound: both groups' upper bounds enter the
    * pivot sum, and the group-count requirements only REMOVE candidates.
    *
    * `after` implements ES `search_after` on the (score desc, docId asc)
    * sort key: only docs ranked strictly after it are offered. It cannot
    * seed θ (qualifying docs score ≤ after.score by definition), so it
    * prunes nothing — it guarantees exact page continuation.
    */
  def topK(lists: Seq[TermIterator], k: Int,
      filters: Seq[DocCursor] = Nil,
      excludes: Seq[DocCursor] = Nil,
      shoulds: Seq[TermIterator] = Nil,
      minShould: Int = 0,
      after: Scored = null,
      /** non-null = combine per-field sums best_fields-style
        * ([[BestFields]]); null = the plain one-sum (most_fields) rule.
        * OR-mode only.
        */
      bestFields: BestFields = null): Array[Scored] = {
    if ((lists.isEmpty && shoulds.isEmpty) || k <= 0) return Array.empty
    val fArr = filters.toArray
    val eArr = excludes.toArray
    val mustN = lists.size
    val shouldSet = shoulds.map(_.term).toSet
    require(!lists.exists(l => shouldSet.contains(l.term)),
      "must and should term groups must be disjoint")
    // fixed scoring order: term asc over the MERGED groups
    val byTerm = (lists ++ shoulds).sortBy(_.term).toArray
    val isShould = byTerm.map(it => shouldSet.contains(it.term))
    val bf = bestFields
    // best_fields scratch (reused per candidate — no per-doc allocation):
    // contribution + matched flag per list, one accumulator per field.
    // Terms outside the multi_match field map (bool `should` terms riding
    // a best_fields query) get ordinal -1 — a 'no field' bucket whose
    // contributions always carry weight 1.0 (ES adds separate bool
    // clauses at full weight) and never enter any field's dis-max sum.
    val bfFieldIdx: Array[Int] =
      if (bf == null) null
      else byTerm.map(it =>
        // shared-term dis_max instances carry their own group ordinal;
        // everything else resolves through the term-keyed field map
        if (it.groupOrdinal != Int.MinValue) it.groupOrdinal
        else bf.fieldOf.getOrElse(it.term, -1))
    val bfContrib: Array[Double] = if (bf == null) null else new Array[Double](byTerm.length)
    val bfMatched: Array[Boolean] = if (bf == null) null else new Array[Boolean](byTerm.length)
    val bfSums: Array[Double] = if (bf == null) null else new Array[Double](bf.nFields)
    val heap = scala.collection.mutable.PriorityQueue.empty[HeapEntry](heapOrd)
    var theta = Double.NegativeInfinity
    def offer(score: Double, docId: Long): Unit = {
      if (after != null &&
        !(score < after.score || (score == after.score && docId > after.docId))) return
      if (heap.size < k) {
        heap.enqueue(HeapEntry(score, docId))
        if (heap.size == k) theta = heap.head.score
      } else if (score > heap.head.score) {
        heap.dequeue()
        heap.enqueue(HeapEntry(score, docId))
        theta = heap.head.score
      }
    }

    val iters = byTerm.clone() // sorted by curDoc during the loop
    def sortIters(): Unit = java.util.Arrays.sort(iters, Ordering.by[TermIterator, Long](_.curDoc))

    sortIters()
    var running = true
    while (running) {
      // pivot selection on term upper bounds
      var acc = 0.0
      var p = 0
      var found = false
      while (p < iters.length && !found) {
        if (!iters(p).exhausted) {
          acc += iters(p).ub
          if (acc + Margin > theta) found = true else p += 1
        } else p = iters.length
      }
      if (!found || p >= iters.length || iters(p).exhausted) running = false
      else {
        val pivotDoc = iters(p).curDoc
        if (iters(0).curDoc == pivotDoc) {
          // block-max refinement: shallow-seek lists 0..p to pivotDoc's blocks
          var i = 0
          var blockSum = 0.0
          while (i <= p) { iters(i).shallowSeek(pivotDoc); blockSum += iters(i).blockMax; i += 1 }
          // lists beyond p that already sit on pivotDoc also contribute
          while (i < iters.length && iters(i).curDoc == pivotDoc) { blockSum += iters(i).blockMax; i += 1 }
          if (blockSum + Margin <= theta) {
            // cannot qualify anywhere in these blocks: jump past the
            // nearest block horizon (capped by the next list's curDoc)
            var horizon = Long.MaxValue
            var j = 0
            while (j <= p) { horizon = math.min(horizon, iters(j).blockLast); j += 1 }
            var target = if (horizon == Long.MaxValue) Long.MaxValue else horizon + 1
            if (p + 1 < iters.length) target = math.min(target, iters(p + 1).curDoc)
            target = math.max(target, pivotDoc + 1)
            j = 0
            while (j <= p) { iters(j).nextGEQ(target); j += 1 }
          } else {
            val fNext = if (fArr.isEmpty) pivotDoc else filtersAlignAt(fArr, pivotDoc)
            if (fNext != pivotDoc || excludedAt(eArr, pivotDoc)) {
              // filtered out: skip every list sitting on pivotDoc forward
              // (to the filters' next possible doc when that is known)
              val target = math.max(pivotDoc + 1, fNext)
              var t = 0
              while (t < byTerm.length) {
                if (byTerm(t).curDoc == pivotDoc) byTerm(t).nextGEQ(target)
                t += 1
              }
            } else {
              // fully score pivotDoc: exact sum in ascending TERM order,
              // counting group matches for the must-≥1 / minShould rules
              var s = 0.0
              var nMust = 0
              var nShould = 0
              var t = 0
              if (bf == null) {
                while (t < byTerm.length) {
                  val it = byTerm(t)
                  if (it.curDoc == pivotDoc) {
                    it.nextGEQ(pivotDoc); s += it.score
                    if (isShould(t)) nShould += 1 else nMust += 1
                  }
                  t += 1
                }
              } else {
                // best_fields: pass 1 collects contributions + per-field
                // sums (ascending term order — fields are contiguous in
                // it); pass 2 re-folds them weighted (1 on the best
                // field, tieBreaker elsewhere) in the SAME global order,
                // so tb = 1 reproduces the most_fields sum bit-exactly
                java.util.Arrays.fill(bfSums, 0.0)
                while (t < byTerm.length) {
                  val it = byTerm(t)
                  if (it.curDoc == pivotDoc) {
                    it.nextGEQ(pivotDoc)
                    val c = it.score
                    bfContrib(t) = c
                    bfMatched(t) = true
                    if (bfFieldIdx(t) >= 0) bfSums(bfFieldIdx(t)) += c
                    if (isShould(t)) nShould += 1 else nMust += 1
                  } else bfMatched(t) = false
                  t += 1
                }
                var best = 0
                var bmax = bfSums(0)
                var f = 1
                while (f < bfSums.length) {
                  if (bfSums(f) > bmax) { bmax = bfSums(f); best = f }
                  f += 1
                }
                t = 0
                while (t < byTerm.length) {
                  if (bfMatched(t)) {
                    val w = if (bfFieldIdx(t) < 0 || bfFieldIdx(t) == best) 1.0
                      else bf.tieBreaker
                    s += w * bfContrib(t)
                  }
                  t += 1
                }
              }
              if ((mustN == 0 || nMust >= 1) && nShould >= minShould) offer(s, pivotDoc)
              t = 0
              while (t < byTerm.length) {
                if (byTerm(t).curDoc == pivotDoc) byTerm(t).advancePast(pivotDoc)
                t += 1
              }
            }
          }
          sortIters()
        } else {
          // advance the first list (smallest curDoc) up to the pivot
          iters(0).nextGEQ(pivotDoc)
          sortIters()
        }
      }
    }
    heap.dequeueAll.map((e: HeapEntry) => Scored(e.docId, e.score)).toArray
      .sortBy(s => (-s.score, s.docId))
  }

  /** Conjunctive (AND) top-k: docs containing ALL terms, BM25-scored —
    * posting-list intersection via nextGEQ galloping (SURVEY.md J2) with
    * block-max early exit once the heap is full (a block span whose
    * Σ blockMax cannot beat θ is skipped without decoding any block).
    */
  def topKConjunctive(lists: Seq[PosCursor], k: Int,
      filters: Seq[DocCursor] = Nil,
      excludes: Seq[DocCursor] = Nil,
      shoulds: Seq[TermIterator] = Nil,
      minShould: Int = 0,
      after: Scored = null): Array[Scored] =
    intersectTopK(lists, k, phrase = null, filters, excludes, shoulds, minShould, after)

  /** Phrase top-k: docs containing the terms at ADJACENT positions in
    * `phrase` order (ES `match_phrase` over analyzed fields — SURVEY.md
    * "What's missing #1", positional postings). Scoring: the standard
    * BM25 sum over the phrase's distinct terms (each term scores once,
    * ascending term order — same rule as the AND path), restricted to
    * docs where the exact phrase occurs. `lists` must carry one iterator
    * per DISTINCT phrase term.
    */
  def topKPhrase(lists: Seq[PosCursor], phrase: Seq[String], k: Int,
      filters: Seq[DocCursor] = Nil,
      excludes: Seq[DocCursor] = Nil,
      shoulds: Seq[TermIterator] = Nil,
      minShould: Int = 0,
      after: Scored = null,
      /** ES `slop` — full Lucene sloppy-phrase semantics (positional
        * moves; reordered terms match from slop ≥ 2); 0 = exact
        * adjacency. See [[phraseAt]].
        */
      slop: Int = 0,
      /** ≥ 0 = Lucene `span_first`: the phrase must have an occurrence
        * whose span END (last token's 0-based position + 1) is ≤
        * `spanEnd` — i.e. it starts inside the field's first `spanEnd`
        * tokens. Exact-adjacency only (slop must be 0); −1 = off.
        */
      spanEnd: Int = -1): Array[Scored] = {
    if (phrase == null || phrase.isEmpty) return Array.empty
    require(spanEnd < 0 || slop == 0, "span_first requires slop == 0")
    intersectTopK(lists, k, phrase, filters, excludes, shoulds, minShould, after, slop,
      spanEnd)
  }

  /** Does the phrase occur at the current (aligned) doc within `slop`?
    * slots(j) is the iterator of phrase position j; all slots sit on
    * the same doc. Semantics: the Lucene/ES SLOPPY-PHRASE model —
    * there exist DISTINCT token positions p_0 … p_{m−1}, one per slot,
    * whose offset-ADJUSTED positions q_i = p_i − i satisfy
    * max(q) − min(q) ≤ slop (each unit of slop is one positional move;
    * REORDERED terms match from slop ≥ 2 — a transposed bigram has
    * width 2). slop = 0 forces all q equal = exact in-order adjacency
    * (`match_phrase`), answered by the O(Σ positions) greedy
    * minimal-chain scan.
    */
  private def phraseAt(slots: Array[PosCursor], slop: Int,
      /** ≥ 0 = `span_first`: additionally require an occurrence ending
        * at 0-based position < spanEnd (Lucene SpanFirstQuery: span
        * end() ≤ end). Single-term and exact-adjacency phrases only —
        * [[topKPhrase]] rejects slop > 0 with spanEnd.
        */
      spanEnd: Int = -1): Boolean = {
    val m = slots.length
    if (m == 1) {
      val ps = slots(0).positions
      // positions are ascending: the FIRST occurrence decides span_first
      return ps.length > 0 && (spanEnd < 0 || ps(0) + 1 <= spanEnd)
    }
    if (slop == 0) {
      // adjacency chain from start st spans [st, st + m) — end = st + m
      val st = adjacentAt(slots)
      return st >= 0 && (spanEnd < 0 || st + m <= spanEnd)
    }
    var hasRepeat = false
    var i = 0
    while (i < m && !hasRepeat) {
      var j = i + 1
      while (j < m && !hasRepeat) { if (slots(i) eq slots(j)) hasRepeat = true; j += 1 }
      i += 1
    }
    if (!hasRepeat) sloppyDistinctAt(slots, slop) else sloppyRepeatsAt(slots, slop)
  }

  /** Exact in-order adjacency (slop = 0): greedy minimal chain — for
    * each start in slot 0, extend each later slot to its minimal
    * position past the previous; pointers only move forward across
    * starts, O(Σ positions) total. Returns the EARLIEST matching start
    * position (starts ascend, so it is also the minimal-end chain —
    * what `span_first` needs), or −1 when the phrase does not occur.
    */
  private def adjacentAt(slots: Array[PosCursor]): Int = {
    val pos = slots.map(_.positions)
    val m = slots.length
    val ptr = new Array[Int](m)
    var s = 0
    while (s < pos(0).length) {
      val start = pos(0)(s)
      var prev = start
      var j = 1
      while (j < m) {
        val pj = pos(j)
        while (ptr(j) < pj.length && pj(ptr(j)) <= prev) ptr(j) += 1
        if (ptr(j) >= pj.length) return -1 // exhausted: no later start can match
        prev = pj(ptr(j))
        j += 1
      }
      if (prev - start == m - 1) return start
      s += 1
    }
    -1
  }

  /** Sloppy match, all slots DISTINCT terms: the classic k-list minimal
    * range scan over the adjusted position lists — hold one pointer per
    * list, test the current window, advance the list holding the
    * minimum. Finds the minimal achievable width (positions across
    * different terms are distinct by construction), O(Σ positions · m).
    */
  private def sloppyDistinctAt(slots: Array[PosCursor], slop: Int): Boolean = {
    val pos = slots.map(_.positions)
    val m = slots.length
    val ptr = new Array[Int](m)
    var running = true
    while (running) {
      var mn = Int.MaxValue
      var mx = Int.MinValue
      var mnI = 0
      var i = 0
      while (i < m) {
        val v = pos(i)(ptr(i)) - i
        if (v < mn) { mn = v; mnI = i }
        if (v > mx) mx = v
        i += 1
      }
      if (mx - mn <= slop) return true
      ptr(mnI) += 1
      if (ptr(mnI) >= pos(mnI).length) running = false
    }
    false
  }

  /** Sloppy match with REPEATED phrase terms (rare): distinctness of
    * the chosen positions inside a repeated term's slot group matters.
    * Try every candidate window origin w ∈ {p − slot offset}; within
    * [w, w + slop] each term group's constraint is a staircase of
    * intervals [w+o, w+slop+o] over ascending offsets o, for which the
    * ascending greedy assignment (smallest unused feasible position per
    * offset) is exact. O(candidates × Σ positions).
    */
  private def sloppyRepeatsAt(slots: Array[PosCursor], slop: Int): Boolean = {
    val m = slots.length
    val groups: Array[(Array[Int], Array[Int])] = {
      val seen = scala.collection.mutable.ArrayBuffer[(PosCursor, scala.collection.mutable.ArrayBuffer[Int])]()
      var i = 0
      while (i < m) {
        seen.find(_._1 eq slots(i)) match {
          case Some((_, offs)) => offs += i
          case None => seen += ((slots(i), scala.collection.mutable.ArrayBuffer(i)))
        }
        i += 1
      }
      seen.map { case (it, offs) => (it.positions, offs.toArray) }.toArray
    }
    val candidates = scala.collection.mutable.SortedSet[Int]()
    var i = 0
    while (i < m) {
      val ps = slots(i).positions
      var j = 0
      while (j < ps.length) { candidates += ps(j) - i; j += 1 }
      i += 1
    }
    candidates.exists { w =>
      groups.forall { case (ps, offs) =>
        var pi = 0
        offs.forall { o =>
          while (pi < ps.length && ps(pi) < w + o) pi += 1
          if (pi < ps.length && ps(pi) <= w + slop + o) { pi += 1; true } else false
        }
      }
    }
  }

  private def intersectTopK(
      lists: Seq[PosCursor],
      k: Int,
      phrase: Seq[String],
      filters: Seq[DocCursor] = Nil,
      excludes: Seq[DocCursor] = Nil,
      shoulds: Seq[TermIterator] = Nil,
      minShould: Int = 0,
      after: Scored = null,
      slop: Int = 0,
      spanEnd: Int = -1
  ): Array[Scored] = {
    if (lists.isEmpty || k <= 0) return Array.empty
    val fArr = filters.toArray
    val eArr = excludes.toArray
    val byTerm = lists.sortBy(_.term).toArray
    val shouldArr = shoulds.sortBy(_.term).toArray
    require(!shouldArr.exists(s => byTerm.exists(_.term == s.term)),
      "must and should term groups must be disjoint")
    // optional-group score headroom for the early-exit bound (Σ global
    // ubs — sound; shoulds never drive the candidate loop)
    val shouldUbSum = shouldArr.map(_.ub).sum
    // scoring order: term asc over the MERGED groups (same determinism
    // rule as topK); merged(i) aligned-at-candidate ⇒ contributes
    val merged = (byTerm ++ shouldArr).sortBy(_.term)
    val slots: Array[PosCursor] =
      if (phrase == null) null
      else {
        val m = byTerm.map(it => it.term -> it).toMap
        require(phrase.forall(m.contains), "phrase terms must each have an iterator")
        phrase.map(m).toArray
      }
    val heap = scala.collection.mutable.PriorityQueue.empty[HeapEntry](heapOrd)
    var theta = Double.NegativeInfinity
    def offer(s: Double, docId: Long): Unit = {
      if (after != null &&
        !(s < after.score || (s == after.score && docId > after.docId))) return
      if (heap.size < k) {
        heap.enqueue(HeapEntry(s, docId))
        if (heap.size == k) theta = heap.head.score
      } else if (s > heap.head.score) {
        heap.dequeue(); heap.enqueue(HeapEntry(s, docId))
        theta = heap.head.score
      }
    }
    var candidate = byTerm.map(_.curDoc).max
    while (candidate != Long.MaxValue) {
      var skipped = false
      if (heap.size == k) {
        // block-max early exit: bound the best score reachable inside the
        // current block span WITHOUT decoding (shallowSeek moves block
        // pointers only); if it can't beat θ, jump past the nearest block
        // horizon. (Sound under search_after too: θ is the k-th best
        // QUALIFYING score, and skipping docs that cannot beat θ never
        // removes a page member.)
        var i = 0
        var blockSum = shouldUbSum
        var horizon = Long.MaxValue
        var dead = false
        while (i < byTerm.length && !dead) {
          byTerm(i).shallowSeek(candidate)
          if (byTerm(i).exhausted) dead = true
          else {
            blockSum += byTerm(i).blockMax
            horizon = math.min(horizon, byTerm(i).blockLast)
            i += 1
          }
        }
        if (dead) { candidate = Long.MaxValue; skipped = true }
        else if (blockSum + Margin <= theta) {
          candidate = math.max(candidate + 1, horizon + 1)
          skipped = true
        }
      }
      if (!skipped) {
        var aligned = true
        var i = 0
        while (i < byTerm.length && aligned) {
          byTerm(i).nextGEQ(candidate)
          if (byTerm(i).curDoc != candidate) { candidate = byTerm(i).curDoc; aligned = false }
          i += 1
        }
        if (aligned && candidate != Long.MaxValue && fArr.nonEmpty) {
          // required-but-unscored filter lists must also contain the doc
          val fNext = filtersAlignAt(fArr, candidate)
          if (fNext != candidate) { candidate = fNext; aligned = false }
        }
        if (aligned && candidate != Long.MaxValue) {
          if (!excludedAt(eArr, candidate) &&
            (slots == null || phraseAt(slots, slop, spanEnd))) {
            // advance shoulds to the candidate and count matches
            var nShould = 0
            var j = 0
            while (j < shouldArr.length) {
              shouldArr(j).nextGEQ(candidate)
              if (shouldArr(j).curDoc == candidate) nShould += 1
              j += 1
            }
            if (nShould >= minShould) {
              // must lists are all aligned here; shoulds contribute only
              // when aligned (checked via curDoc) — one term-asc sum
              var s = 0.0
              var t = 0
              while (t < merged.length) {
                if (merged(t).curDoc == candidate) s += merged(t).score
                t += 1
              }
              offer(s, candidate)
            }
          }
          val next = candidate + 1
          byTerm.foreach(_.nextGEQ(next))
          candidate = byTerm.map(_.curDoc).max
        }
      }
    }
    heap.dequeueAll.map((e: HeapEntry) => Scored(e.docId, e.score)).toArray
      .sortBy(s => (-s.score, s.docId))
  }
}
