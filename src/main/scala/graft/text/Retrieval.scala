package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sparse retrieval over the corpus: inverted-index construction and
  * BM25 ranked search. The index is the classic training-data-pipeline
  * audit/serving structure (term -> postings); BM25 is the standard
  * lexical scorer used for eval-set decontamination lookups and
  * retrieval-based data mixing (reference analog: the dashboard's
  * keyword drill-downs over query text, e.g.
  * Dashboard_Historical_Final.py's per-type filters — generalized here
  * to ranked full-text search).
  *
  * Scale shape: tokenize+explode is scan-fused; term aggregation is ONE
  * shuffle on the term key; the query set is tiny and broadcast; the
  * per-query top-k goes through a rank-limit window that Spark rewrites
  * to WindowGroupLimit (per-partition partial top-k before the shuffle),
  * so no single reducer ever sees more than partitions*k candidate rows.
  *
  * Determinism: all index stats are integers; BM25 keeps the engine
  * contract of [[TextAnalysis.unigramLogProb]] — the only transcendental
  * (idf's ln) is rounded to 6 decimals into DECIMAL(18,6) immediately,
  * the tf saturation term is an exact integer rational evaluated with
  * one correctly-rounded double division, and per-document sums run in
  * DECIMAL (order-independent, engine-exact).
  */
object Retrieval {

  private def tokens(df: DataFrame, text: org.apache.spark.sql.Column,
                     id: org.apache.spark.sql.Column): DataFrame =
    df.select(id.as("doc_id"), explode(split(text, " ")).as("term"))

  /** Per-(term, doc) frequencies — the raw postings. One shuffle. */
  def termFrequencies(df: DataFrame, text: org.apache.spark.sql.Column,
                      id: org.apache.spark.sql.Column): DataFrame =
    tokens(df, text, id).groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** Inverted index: one row per term with document frequency, total
    * term frequency, and the postings list serialized as
    * `"doc:tf,doc:tf,…"` ordered by doc id. The serialized form is the
    * portable/auditable shape; at scale the natural layout is the
    * un-serialized (term, doc_id, tf) frame written bucketed by term —
    * `collect_list` per term is bounded by that term's df, which for a
    * stopword-like term is corpus-sized: shard hot terms by
    * `(term, doc_id % nShards)` first if the serialized form is really
    * needed at 100 TB.
    */
  def invertedIndex(df: DataFrame, text: org.apache.spark.sql.Column,
                    id: org.apache.spark.sql.Column): DataFrame =
    termFrequencies(df, text, id)
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("total_tf"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("tf")))),
            s => concat(s.getField("doc_id").cast("string"), lit(":"),
              s.getField("tf").cast("string"))),
          ",").as("postings"))

  /** BM25 top-k per query (k1 = 1.2, b = 0.75, Lucene idf
    * `ln((N+1)/(df+0.5))`).
    *
    * The tf-saturation factor `tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
    * is evaluated as the exact integer rational
    * `22·tf·L / (10·tf·L + 3·L + 9·dl·N)` (avgdl = L/N multiplied
    * through; k1 = 6/5, b = 3/4) — one double division, correctly
    * rounded, identical in any IEEE engine. BIGINT bound: the largest
    * intermediate is ~10·tf·L; at a 10^13-token corpus move these three
    * products to DECIMAL(38,0) (same plan shape).
    *
    * `queries` is a literal (query_id, terms) set — broadcast, never
    * shuffled, and semi-joined into the token stream BEFORE the tf
    * aggregation, so every shuffle in the plan carries only query-term
    * postings (a corpus-wide stopword in the query is the worst case,
    * bounded by that term's df). Repeated query terms score once
    * (standard bag-of-words BM25 collapses duplicates via the tf join).
    */
  def bm25TopK(df: DataFrame, text: org.apache.spark.sql.Column,
               id: org.apache.spark.sql.Column,
               queries: Seq[(Int, Seq[String])], k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val q = queries.flatMap { case (qid, ts) => ts.distinct.map(t => (qid, t)) }
      .toDF("query_id", "term")
    val qterms = queries.flatMap(_._2).distinct.toDF("term")

    // Query-term postings only: the broadcast semi-join prunes the
    // exploded token stream in the scan stage, before any shuffle.
    val tf = tokens(df, text, id)
      .join(broadcast(qterms), Seq("term"), "left_semi")
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

    // r20: doc length is size(split(text)) — a scan-side projection, not
    // a second corpus explode + doc-keyed shuffle (guide §2.4). The
    // isNotNull filter mirrors the explode form exactly: a NULL text
    // exploded to zero rows, so it never had a dl row.
    val dl = df.filter(text.isNotNull)
      .select(id.as("doc_id"), size(split(text, " ")).cast("long").as("dl"))
    val g = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))

    val idf = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(g))
      .select(col("term"),
        round(log((col("n_docs").cast("double") + 1.0) /
          (col("df").cast("double") + 0.5)), 6)
          .cast("decimal(18,6)").as("idf6"))

    val num = (lit(22L) * col("tf") * col("total_len")).cast("double")
    val den = (lit(10L) * col("tf") * col("total_len") +
      lit(3L) * col("total_len") + lit(9L) * col("dl") * col("n_docs"))
      .cast("double")
    val scored = tf
      .join(broadcast(q), Seq("term"))
      .join(broadcast(idf), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(g))
      .select(col("query_id"), col("doc_id"),
        round(col("idf6").cast("double") * (num / den), 6)
          .cast("decimal(18,6)").as("s6"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("s6")).as("score6"))

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score6").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("score6").cast("double").as("score"))
  }

  /** Frozen BM25 corpus statistics (the static "model" half): the
    * 6-decimal idf per query term plus (n_docs, total_len). Bounded by
    * the query vocabulary — collect and embed as literals.
    */
  final case class Bm25Stats(idf6: Map[String, java.math.BigDecimal],
                             nDocs: Long, totalLen: Long)

  /** Compute [[Bm25Stats]] from a corpus — same arithmetic as
    * [[bm25TopK]]'s in-plan idf, so scores against the frozen stats are
    * bit-identical to the joined form.
    */
  def bm25CorpusStats(df: DataFrame, text: org.apache.spark.sql.Column,
                      id: org.apache.spark.sql.Column,
                      queries: Seq[(Int, Seq[String])]): Bm25Stats = {
    val spark = df.sparkSession
    import spark.implicits._
    val qterms = queries.flatMap(_._2).distinct.toDF("term")
    val dl = tokens(df, text, id).groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"))
    val Array(nDocs, totalLen) = dl
      .agg(count(lit(1)).cast("long"), sum(col("dl")).cast("long"))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val idf = tokens(df, text, id)
      .join(broadcast(qterms), Seq("term"), "left_semi")
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .select(col("term"),
        round(log((lit(nDocs).cast("double") + 1.0) /
          (col("df").cast("double") + 0.5)), 6)
          .cast("decimal(18,6)").as("idf6"))
      .collect()
      .map(r => r.getString(0) -> r.getDecimal(1)).toMap
    Bm25Stats(idf, nDocs, totalLen)
  }

  /** Serve-time BM25 scoring against frozen [[Bm25Stats]] — one wide
    * score column per query, computed in a single PROJECTION: per-term
    * tf via the native codegen'd set-membership count, the same
    * integer-rational saturation and DECIMAL-summed per-term scores as
    * [[bm25TopK]]. No join, no aggregation, no shuffle — so it runs
    * unchanged on a STREAMING frame in append mode ("freeze the corpus
    * stats, score documents as they arrive"), proven batch≡stream
    * bit-exact in StreamingSpec. Query terms unseen in the stats corpus
    * contribute nothing (the same contract as [[bm25TopK]], where an
    * absent term has no postings to join).
    */
  def bm25ScoreWithStats(docs: DataFrame, text: org.apache.spark.sql.Column,
                         id: org.apache.spark.sql.Column,
                         queries: Seq[(Int, Seq[String])],
                         stats: Bm25Stats): DataFrame = {
    import graft.expr.TextStatsExpressions
    val t = split(text, " ")
    val dl = size(t).cast("long")
    val zero = lit(java.math.BigDecimal.ZERO).cast("decimal(18,6)")
    val scoreCols = queries.map { case (qid, ts) =>
      val terms = ts.distinct.filter(stats.idf6.contains)
      val termScores = terms.map { term =>
        val tf = TextStatsExpressions.countInSet(t, Seq(term)).cast("long")
        val num = (lit(22L) * tf * lit(stats.totalLen)).cast("double")
        val den = (lit(10L) * tf * lit(stats.totalLen) +
          lit(3L) * lit(stats.totalLen) + lit(9L) * dl * lit(stats.nDocs))
          .cast("double")
        val idf = lit(stats.idf6(term)).cast("decimal(18,6)").cast("double")
        when(tf > 0, round(idf * (num / den), 6).cast("decimal(18,6)"))
          .otherwise(zero)
      }
      val total =
        if (termScores.isEmpty) zero else termScores.reduce(_ + _)
      total.cast("decimal(18,6)").cast("double").as(s"score_q$qid")
    }
    docs.select((id.as("doc_id") +: scoreCols): _*)
  }

  /** Top-k tf·idf keywords per document — the topical fingerprint used
    * for corpus audits ("what is this cluster about") and cheap topic
    * drill-downs. idf is the same Lucene variant as [[bm25TopK]], rounded
    * into DECIMAL(18,6) at the term level; the per-term score is one
    * correctly-rounded double multiply (idf × integer tf), re-rounded to
    * 6 decimals — engine-exact. Ties break on the term string.
    *
    * Scale shape: tf and idf are each ONE shuffle on the term key (idf is
    * vocab-wide by definition); the per-document top-k goes through the
    * WindowGroupLimit rank pushdown like [[bm25TopK]].
    */
  def tfidfKeywords(df: DataFrame, text: org.apache.spark.sql.Column,
                    id: org.apache.spark.sql.Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // r20 (the q21 move on the postings): the old shape evaluated the
    // explode→groupBy postings TWICE (once for idf, once for the score
    // join) across ~5 exchanges. Partitioning the token stream by term
    // ONCE satisfies the (term, doc) aggregate's clustering, the per-term
    // document frequency is a second aggregate over the SAME exchange
    // (hash(term) partitioning survives the groupBy), and the join-back
    // is partition-local — one explode, two exchanges total (term, then
    // doc for the rank window). Deliberately NOT a count window over
    // partitionBy(term): WindowExec buffers a partition group in memory,
    // and a stopword's postings are corpus-sized — the aggregate+join
    // shape streams a hot term instead of funneling it.
    val tfBase = tokens(df, text, id)
      .repartition(col("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val dfCnt = tfBase.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // MERGE hint: both sides are hash(term)-partitioned already, so the
    // sort-merge join is exchange-free and the dfCnt side's scan reuses
    // tfBase's exchange (AQE stage reuse); the planner's auto-broadcast
    // would instead re-derive dfCnt through its own exchange. At 100 TB
    // dfCnt is vocab-sized — partition-local is the right strategy there
    // too, not a broadcast.
    val tf = tfBase.join(dfCnt.hint("MERGE"), Seq("term"))
    val g = df.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score6").desc, col("term"))
    tf.crossJoin(broadcast(g))
      .select(col("doc_id"), col("term"),
        round(round(log((col("n_docs").cast("double") + 1.0) /
            (col("df").cast("double") + 0.5)), 6).cast("decimal(18,6)")
            .cast("double") * col("tf"), 6)
          .cast("decimal(18,6)").as("score6"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("term"), col("score6").cast("double").as("score"))
  }

  /** Reciprocal-rank fusion of N ranked lists (the standard hybrid-search
    * combiner: lexical BM25 + vector KNN, or any mix). Each input frame
    * is `(id, rank)` with rank starting at 1; a document's fused score is
    * `Σ_lists 1e9 div (k0 + rank)` — EXACT integer arithmetic (integer
    * division of the scaled constant), so fusion is knife-edge-free on
    * any engine. Documents missing from a list contribute 0 from it.
    * The lists are top-k-bounded by construction, so the fusion join is
    * tiny regardless of corpus size — scale lives in the upstream
    * retrievers, not here.
    */
  def rrfFuse(lists: Seq[DataFrame], k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val tagged = lists.zipWithIndex.map { case (l, i) =>
      l.select(col("id"), col("rank").cast("long").as(s"rank_$i"))
    }
    val joined = tagged.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val contribs = lists.indices.map { i =>
      coalesce(expr(s"1000000000L div ($k0 + rank_$i)"), lit(0L))
    }
    joined.select(
      (col("id") +: (contribs.reduce(_ + _).as("rrf_nano") +:
        lists.indices.map(i => col(s"rank_$i")))): _*)
  }
}
