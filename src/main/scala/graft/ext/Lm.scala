package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model perplexity — the model-based
  * quality signal (CCNet/Gopher style) that [[TextAnalysis.qualityScore]]'s
  * surface heuristics cannot provide: gibberish salted with common
  * stopwords sails through length/alpha/stopword ratios, but its tokens
  * are rare under the corpus LM, so its perplexity spikes.
  *
  * The LM is trained ON the scored corpus itself (self-inclusive — the
  * standard corpus-triage setup: one aggregate to train, one scan to
  * score) with add-k smoothing (k = 0.5), so every statistic is a pure
  * deterministic function of the corpus and both queries carry FULL
  * DuckDB oracles.
  *
  * Cross-engine float discipline: a per-doc sum of raw DOUBLE log-probs
  * would hash-diverge (shuffled aggregation order + non-associative
  * addition). Each token's log-prob is truncated to DECIMAL(28,12) FIRST
  * — decimal addition is exact and order-free, so the groupBy sum is
  * deterministic in any engine at any partitioning; the 1e-12 grid is 4
  * orders below the 1e-6 rounding of the reported columns and 4 orders
  * above double ulp noise. The final exp() runs on the ROUNDED average
  * so both engines evaluate it on bit-identical input.
  *
  * Scale: unigram = one token-count shuffle + one token-keyed join (the
  * vocab side auto-broadcasts when small, shuffles when not) + one
  * doc-keyed rollup. Bigram adds pair-keyed twins of the same shape.
  * Nothing is corpus-global; no windows; no driver loops.
  */
object Lm {

  import TextOps._

  private val K = 0.5
  private val LpDec = "decimal(28,12)"

  private def tokensOf(docs: DataFrame): DataFrame =
    scanParallel(docs)
      .select(col("doc_id"), wsTokens(lower(col("text"))).as("ts"))

  /** (t, lp) unigram log-prob table + the broadcastable totals frame. */
  private def unigramLp(toks: DataFrame): (DataFrame, DataFrame) = {
    // vocab counts feed both the totals aggregate and the log-prob
    // projection - fence so the token-count shuffle runs once
    val v = toks.groupBy("t").agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val tot = v.agg(sum("n").as("total"), count(lit(1)).as("vsz"))
    val lp = v.crossJoin(broadcast(tot))
      .select(col("t"),
        log((col("n") + K) / (col("total") + (col("vsz") + 1) * K))
          .cast(LpDec).as("lp"))
    (lp, tot)
  }

  private def report(scored: DataFrame): DataFrame = {
    val avgNll = round(-(col("slp").cast("double")) / col("n_tokens"), 6)
    scored.select(col("doc_id"), col("n_tokens"),
      avgNll.as("avg_nll_r"),
      round(exp(avgNll), 4).as("ppl_r"))
  }

  /** Per-doc unigram perplexity: (doc_id, n_tokens, avg_nll_r, ppl_r). */
  def perplexity(docs: DataFrame): DataFrame = {
    val toks = tokensOf(docs).select(col("doc_id"), explode(col("ts")).as("t"))
    val (lp, _) = unigramLp(toks)
    report(
      toks.join(lp, "t")
        .groupBy("doc_id")
        .agg(sum("lp").as("slp"), count(lit(1)).as("n_tokens")))
  }

  // ------------------------------------------------ fixed-vocab model
  // The deployable form of the LM gate: a TRUNCATED top-K vocabulary
  // trained once (one aggregate + one bounded collect), log-probs
  // quantized to integer NANO-NATS (floor(lp·1e9) — floor, not round:
  // half-up vs half-away differ on negatives across engines). Integer
  // sums are exact and order-free, so a streaming mapPartitions scorer
  // with a broadcast hash map produces BIT-IDENTICAL scores to the
  // batch explode+join twin — and to the DuckDB oracle UP TO the one
  // stated bound: the per-token quantization itself can sit 1 nano-nat
  // apart cross-engine when a 1-ulp ln difference straddles a grid
  // boundary (see [[lpNano]] — the JVM twins share Math.log, so the
  // stream/batch identity is unconditional; only the cross-ENGINE
  // claim carries the ulp caveat).

  /** Nano-nat log-prob of an in-vocab token under the add-k model.
    * KNOWN FLOAT EDGE (ADVICE r6): floor(ln·1e9) makes the SUMS exact
    * and order-free, but the ln itself is computed per engine — Java
    * Math.log and DuckDB ln can differ by 1 ulp, and when that ulp
    * straddles a nano-nat grid boundary the two engines quantize one
    * token apart. Accepted per the repo's oracle float-edge policy
    * (never observed on the fixtures; a coarser grid would shrink the
    * window, not close it — only a shared ln implementation could). */
  private def lpNano(n: Column, total: Column, vsz: Column): Column =
    floor(log((n + K) / (total + (vsz + 1) * K)) * 1e9).cast("long")

  /** The trained fixed-vocab model: top-`topK` tokens by count (ties →
    * lexicographic) with nano-nat log-probs, plus the unknown-token
    * log-prob. Driver-bounded: the collect is ≤ topK rows. */
  def nanoModel(docs: DataFrame, topK: Int = 4096): (Map[String, Long], Long) = {
    val toks = tokensOf(docs).select(explode(col("ts")).as("t"))
    val v = toks.groupBy("t").agg(count(lit(1)).as("n"))
    val tot = v.agg(sum("n").as("total"), count(lit(1)).as("vsz")).head()
    val (total, vsz) = (tot.getLong(0), tot.getLong(1))
    // top-K via orderBy+limit (TakeOrderedAndProject — per-partition
    // partial top-K), NOT a partitionless row_number window, which would
    // sort the whole vocabulary on one task
    val top = v.orderBy(col("n").desc, col("t")).limit(topK)
      .select(col("t"), lpNano(col("n"), lit(total), lit(vsz)).as("lpn"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val unk = math.floor(math.log(K / (total + (vsz + 1) * K)) * 1e9).toLong
    (top, unk)
  }

  /** Batch scorer under the fixed-vocab model, fully in-plan (explode +
    * top-K join + exact long sum): (doc_id, n_tokens, avg_nll_r). The
    * streaming mapPartitions scorer reproduces these values exactly. */
  def nanoScores(docs: DataFrame, topK: Int = 4096): DataFrame = {
    // fence the VOCAB COUNTS only (r19 optimization, measured): v
    // feeds the totals aggregate and the top-K selection - one token
    // shuffle instead of two. The exploded-token frame stays unfenced:
    // it is scan-shaped and cheap to recompute, and materializing
    // every token cost more in barrier jobs than it saved.
    val toks = tokensOf(docs).select(col("doc_id"), explode(col("ts")).as("t"))
    val v = toks.groupBy("t").agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val tot = v.agg(sum("n").as("total"), count(lit(1)).as("vsz"))
    // same top-K-without-a-global-window shape as nanoModel
    val top = v.orderBy(col("n").desc, col("t")).limit(topK)
      .crossJoin(broadcast(tot))
      .select(col("t"), lpNano(col("n"), col("total"), col("vsz")).as("lpn"))
    val unk = floor(log(lit(K) / (col("total") + (col("vsz") + 1) * K)) * 1e9)
      .cast("long").as("unk_lpn")
    toks
      // top is <= topK rows by construction (limit) at ANY corpus
      // size - broadcast it so the token table is never shuffled for
      // this join (guide §3.1; the fenced v carries no stats, so the
      // planner would otherwise sort-merge)
      .join(broadcast(top), Seq("t"), "left")
      .crossJoin(broadcast(tot.select(unk)))
      .groupBy("doc_id")
      .agg(sum(coalesce(col("lpn"), col("unk_lpn"))).as("s"),
        count(lit(1)).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        round(-(col("s").cast("double") / 1e9) / col("n_tokens"), 6)
          .as("avg_nll_r"))
  }

  /** The per-row Scala twin of [[nanoScores]] for the streaming seam:
    * identical tokenization (trim→split, trailing empties kept exactly
    * as Spark's `split`), identical integer sums. */
  private[graft] def scoreRow(
      text: String, model: Map[String, Long], unk: Long): (Long, Int) = {
    // lowercase through Spark's own code path (UTF8String.toLowerCase —
    // what lower(col) executes), NOT String.toLowerCase(ROOT): the two
    // can disagree on non-ASCII text under a non-ROOT default locale
    // (tr_TR dotted/dotless I), which would break the documented
    // bit-identical stream/batch contract (ADVICE r6)
    val lowered = org.apache.spark.unsafe.types.UTF8String
      .fromString(text).toLowerCase.toString
    // Spark's trim strips ONLY the space character; Java String.trim
    // strips every char <= U+0020 (tabs, newlines) and would change the
    // token list — e.g. "a b\n" is [a, b, ""] under Spark's
    // split(trim(x)) but [a, b] under Java trim — breaking the
    // bit-identical stream/batch contract
    var b = 0
    var e = lowered.length
    while (b < e && lowered.charAt(b) == ' ') b += 1
    while (e > b && lowered.charAt(e - 1) == ' ') e -= 1
    val toks = java.util.regex.Pattern.compile("\\s+")
      .split(lowered.substring(b, e), -1)
    var s = 0L
    var i = 0
    while (i < toks.length) { s += model.getOrElse(toks(i), unk); i += 1 }
    (s, toks.length)
  }

  /** Per-source language-model drift: observed-vocab KL divergence of
    * each source's add-k unigram distribution from the corpus-wide one —
    * the "which source changed under me" dashboard a mixed-corpus
    * pipeline reads next to [[TextAnalysis.sourceMixture]]'s weights.
    * KL is summed over each source's OBSERVED tokens (a truncated KL:
    * absent tokens contribute ≈0 under add-k anyway), every term
    * truncated to DECIMAL(28,18) before the order-free per-source sum.
    * Output: (source, n_tokens, n_vocab, kl_r). Two token-keyed count
    * shuffles + one skinny join — nothing corpus-global. */
  def sourceLmDivergence(docs: DataFrame): DataFrame = {
    val toks = tokensOf(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), explode(col("ts")).as("t"))
    val st = toks.groupBy("source", "t").agg(count(lit(1)).as("nst"))
    val stot = st.groupBy("source").agg(sum("nst").as("ts_n"))
    val ct = st.groupBy("t").agg(sum("nst").as("n"))
    val tot = ct.agg(sum("n").as("total"), count(lit(1)).as("vsz"))
    val ps = (col("nst") + K) / (col("ts_n") + (col("vsz") + 1) * K)
    val pc = (col("n") + K) / (col("total") + (col("vsz") + 1) * K)
    st.join(ct, "t")
      .join(stot, "source")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("ts_n"),
        (ps * (log(ps) - log(pc))).cast("decimal(28,18)").as("term"))
      .groupBy("source")
      .agg(max("ts_n").as("n_tokens"), count(lit(1)).as("n_vocab"),
        sum("term").as("kl"))
      .select(col("source"), col("n_tokens"), col("n_vocab"),
        round(col("kl").cast("double"), 6).as("kl_r"))
      .orderBy("source")
  }

  /** Per-doc bigram perplexity: the first token scores under the unigram
    * LM, every following token under p(b|a) with add-k over the context
    * count. Same decimal-sum discipline; same output shape. */
  def perplexityBigram(docs: DataFrame): DataFrame = {
    // deliberately NOT fenced (r19 optimization round): tl is
    // corpus-sized - materializing it costs a barrier job locally and
    // a corpus-scale spill at 100 TB, while recomputing it is one
    // scan-shaped tokenize pass per consumer. Only the TYPE-bounded
    // frames below (vocab / pair counts) are fenced.
    val tl = tokensOf(docs)
    val toks = tl.select(col("doc_id"), explode(col("ts")).as("t"))
    val (ulp, tot) = unigramLp(toks)
    val bg = tl
      .select(col("doc_id"),
        explode(when(size(col("ts")) >= 2,
          transform(sequence(lit(1), size(col("ts")) - 1),
            i => struct(
              element_at(col("ts"), i).as("a"),
              element_at(col("ts"), i + 1).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>")))
          .as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
    val cb = bg.groupBy("a", "b").agg(count(lit(1)).as("nab"))
      .localCheckpoint(false)
    val cc = cb.groupBy("a").agg(sum("nab").as("na"))
    val blp = cb.join(cc, "a").crossJoin(broadcast(tot))
      .select(col("a"), col("b"),
        log((col("nab") + K) / (col("na") + (col("vsz") + 1) * K))
          .cast(LpDec).as("lp"))
    val first = tl.where(size(col("ts")) >= 1)
      .select(col("doc_id"), element_at(col("ts"), 1).as("t"))
    // ONE doc-keyed aggregate over the UNION of both levels' scored
    // rows (r19 optimization, guide §2.4): the per-level groupBys were
    // already partial-aggregated map-side, but each paid its own
    // doc-keyed exchange and the levels then re-joined on doc_id —
    // three doc-keyed stages where one suffices. Decimal sums are
    // order-free, so the union changes nothing about the result: every
    // doc with ≥ 1 token has a first-token row (the unigram join key
    // always hits — ulp is built from the same corpus), and bigram
    // rows simply add in.
    report(
      first.join(ulp, "t").select(col("doc_id"), col("lp"))
        .unionByName(bg.join(blp, Seq("a", "b"))
          .select(col("doc_id"), col("lp")))
        .groupBy("doc_id")
        .agg(sum("lp").as("slp"), count(lit(1)).as("n_tokens")))
  }

  /** Interpolated Kneser–Ney bigram perplexity — the canonical n-gram
    * smoothing (discount D = 3/4):
    *
    *   p(b|a) = (n(a,b) − D)/n(a·) + D·N1+(a·)/n(a·) · pc(b)
    *   pc(b)  = (N1+(·b) + K) / (B + K·(V+1))
    *
    * where N1+(a·)/N1+(·b) are distinct-continuation counts and B the
    * number of distinct bigram types. Scoring the training corpus means
    * n(a,b) ≥ 1 and n(a·) ≥ 1 for every scored bigram, so the raw KN
    * terms need no unseen-event branch; the continuation distribution
    * is add-K smoothed (K = 0.5 — a documented deviation from the
    * textbook) so DOC-INITIAL-ONLY tokens, which never occur as a
    * continuation, keep support when the first token scores under pc.
    * Both engines evaluate the probability with the identical IEEE
    * expression shape, then the same DECIMAL(28,12) truncation makes
    * the per-doc sum exact and order-free (the file-header discipline).
    *
    * Scale: the same pair-keyed shuffles as [[perplexityBigram]] plus
    * two distinct-continuation aggregates of the bigram-type frame —
    * nothing corpus-global beyond two broadcastable scalar frames. */
  /** The KN discount (D = 3/4, textbook). */
  private val KnD = 0.75

  /** Bigram-level KN building blocks shared STRUCTURALLY by
    * [[perplexityKn]] and [[perplexityKn3]] — one definition site, so
    * the "p2 is EXACTLY the bigram level" invariant cannot drift by
    * copy-paste (review r15 second pass). */
  private case class KnFrames(bg: DataFrame, cb: DataFrame,
      cw: DataFrame, btot: DataFrame, vsz: DataFrame, p2tab: DataFrame)

  private def knPcDen: org.apache.spark.sql.Column =
    col("btypes") + lit(0.5) * (col("vsz") + 1)

  private def knFrames(tl: DataFrame): KnFrames = {
    // callers hand a FENCED tl; cb below feeds four consumers
    // (continuation counts, totals, the p2 table) and p2tab feeds two
    // or three more per KN order - fence both so the bigram-type
    // shuffle and the p2 join pipeline run once each
    val bg = tl
      .select(col("doc_id"),
        explode(when(size(col("ts")) >= 2,
          transform(sequence(lit(1), size(col("ts")) - 1),
            i => struct(
              element_at(col("ts"), i).as("a"),
              element_at(col("ts"), i + 1).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>")))
          .as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
    val cb = bg.groupBy("a", "b").agg(count(lit(1)).as("nab"))
      .localCheckpoint(false)
    val cc = cb.groupBy("a")
      .agg(sum("nab").as("na"), count(lit(1)).as("n1a"))
    val cw = cb.groupBy("b").agg(count(lit(1)).as("n1b"))
    val btot = cb.agg(count(lit(1)).as("btypes"))
    // vocabulary size WITHOUT a corpus-wide token groupBy (r20, guide
    // §2.3/§2.4): every token of every doc either stands adjacent to
    // another token — and then appears as `a` or `b` of some bigram
    // TYPE, all of which the fenced cb already holds — or is the sole
    // token of its document. So |vocab| = |distinct(cb.a ∪ cb.b ∪
    // first-token-of-1-token-docs)|: the r19 shape re-tokenized and
    // exchange-grouped EVERY corpus token just to count distinct types;
    // this shuffles 2·|bigram types| + |1-token docs| rows instead.
    // The count is provably identical, so every smoothed probability
    // (knPcDen reads vsz) is bit-identical.
    val vsz = cb.select(col("a").as("t"))
      .unionByName(cb.select(col("b").as("t")))
      .unionByName(tl.where(size(col("ts")) === 1)
        .select(element_at(col("ts"), 1).as("t")))
      .agg(count_distinct(col("t")).as("vsz"))
    // the bigram KN probability as ONE reusable DOUBLE column — both
    // engines (and both KN orders) compose the identical IEEE value
    val p2tab = cb.join(cc, "a").join(cw, "b")
      .crossJoin(broadcast(btot)).crossJoin(broadcast(vsz))
      .select(col("a"), col("b"),
        ((col("nab") - KnD) / col("na")
          + (lit(KnD) * col("n1a")) / col("na")
            * ((col("n1b") + 0.5) / knPcDen)).as("p2"))
      .localCheckpoint(false)
    KnFrames(bg, cb, cw, btot, vsz, p2tab)
  }

  /** First-token scores under the smoothed continuation distribution
    * (LEFT join: a doc-initial-only token has no continuation row). */
  private def knFirstLp(tl: DataFrame, f: KnFrames): DataFrame = {
    val first = tl.where(size(col("ts")) >= 1)
      .select(col("doc_id"), element_at(col("ts"), 1).as("t"))
    first.join(f.cw.withColumnRenamed("b", "t"), Seq("t"), "left")
      .crossJoin(broadcast(f.btot)).crossJoin(broadcast(f.vsz))
      .select(col("doc_id"),
        log((coalesce(col("n1b"), lit(0L)) + 0.5) / knPcDen)
          .cast(LpDec).as("lp"))
  }

  def perplexityKn(docs: DataFrame): DataFrame = {
    val tl = tokensOf(docs) // corpus-sized: unfenced by design (see perplexityBigram)
    val f = knFrames(tl)
    val blp = f.p2tab.select(col("a"), col("b"),
      log(col("p2")).cast(LpDec).as("lp"))
    // one doc-keyed aggregate over the union of both levels — see the
    // perplexityBigram comment (guide §2.4; result identical: order-free
    // decimal sums, and knFirstLp already yields a row for every doc
    // with ≥ 1 token)
    report(
      knFirstLp(tl, f).select(col("doc_id"), col("lp"))
        .unionByName(f.bg.join(blp, Seq("a", "b"))
          .select(col("doc_id"), col("lp")))
        .groupBy("doc_id")
        .agg(sum("lp").as("slp"), count(lit(1)).as("n_tokens")))
  }

  /** Trigram interpolated Kneser–Ney — the full recursive chain:
    *
    *   p3(c|a,b) = (n(abc) − D)/n(ab·) + D·N1+(ab·)/n(ab·) · p2(c|b)
    *
    * with p2 EXACTLY [[perplexityKn]]'s bigram level (raw counts
    * interpolated into the smoothed continuation distribution — using
    * the raw-count rather than the continuation-count middle order is
    * the documented deviation that keeps every denominator ≥ 1 under
    * self-scoring: n(ab·) ≥ 1 because the scored trigram itself
    * witnesses it, n(b·) ≥ 1 because bigram (b,c) exists). Per doc:
    * token 1 under pc, token 2 under p2, tokens 3.. under p3. The p2
    * probability is materialized as ONE double column and reused by
    * both the second-token scores and the trigram interpolation, so
    * both engines compose the identical IEEE value; ln then truncates
    * to DECIMAL(28,12) as everywhere in this file. */
  def perplexityKn3(docs: DataFrame): DataFrame = {
    val D = KnD
    val tl = tokensOf(docs) // corpus-sized: unfenced by design (see perplexityBigram)
    val f = knFrames(tl)
    val tg = tl
      .select(col("doc_id"),
        explode(when(size(col("ts")) >= 3,
          transform(sequence(lit(1), size(col("ts")) - 2),
            i => struct(
              element_at(col("ts"), i).as("a"),
              element_at(col("ts"), i + 1).as("b"),
              element_at(col("ts"), i + 2).as("c"))))
          .otherwise(array()
            .cast("array<struct<a:string,b:string,c:string>>")))
          .as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"),
        col("p.c").as("c"))
    // trigram TYPE counts: bounded by distinct trigrams, feeds both
    // the continuation aggregate and the scoring join - fence (§2.4)
    val t3 = tg.groupBy("a", "b", "c").agg(count(lit(1)).as("nabc"))
      .localCheckpoint(false)
    val t3c = t3.groupBy("a", "b")
      .agg(sum("nabc").as("nabdot"), count(lit(1)).as("n1ab"))
    val tlp = t3.join(t3c, Seq("a", "b"))
      .join(f.p2tab.select(col("a").as("b"), col("b").as("c"), col("p2")),
        Seq("b", "c"))
      .select(col("a"), col("b"), col("c"),
        log((col("nabc") - D) / col("nabdot")
          + (lit(D) * col("n1ab")) / col("nabdot") * col("p2"))
          .cast(LpDec).as("lp"))
    val blp2 = f.p2tab.select(col("a"), col("b"),
      log(col("p2")).cast(LpDec).as("lp"))
    val second = tl.where(size(col("ts")) >= 2)
      .select(col("doc_id"), element_at(col("ts"), 1).as("a"),
        element_at(col("ts"), 2).as("b"))
    // one doc-keyed aggregate over the union of all three levels — see
    // the perplexityBigram comment (guide §2.4): the three per-level
    // groupBys paid three doc-keyed exchanges and two doc-keyed outer
    // joins; the union pays one exchange and the map-side partial
    // aggregate compacts each level's rows before it. Order-free
    // decimal sums make the result identical.
    report(
      knFirstLp(tl, f).select(col("doc_id"), col("lp"))
        .unionByName(second.join(blp2, Seq("a", "b"))
          .select(col("doc_id"), col("lp")))
        .unionByName(tg.join(tlp, Seq("a", "b", "c"))
          .select(col("doc_id"), col("lp")))
        .groupBy("doc_id")
        .agg(sum("lp").as("slp"), count(lit(1)).as("n_tokens")))
  }
}
