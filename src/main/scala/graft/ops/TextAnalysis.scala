package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-corpus analysis operators: token statistics, quality scoring,
  * language identification, fingerprinting. All map-only (no shuffle)
  * except where noted — the shape that scales linearly to 100 TB.
  */
object TextAnalysis {

  /** THE whitespace/case normalization — lowercase, trim, collapse
    * runs of whitespace to single spaces. One definition shared by
    * every text operator (tokens, hashes, shingles, n-grams, sketches)
    * and mirrored expression-for-expression in the DuckDB oracles; a
    * change here must reach all of them together or dedup operators
    * silently disagree with each other and their oracles. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Whitespace tokens of normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword count estimate: words plus punctuation marks plus
    * one extra token per 6 chars of long words (mirrors byte-pair
    * behaviour on rare words without a vocab file). */
  def approxBpeTokenCount(text: Column): Column = {
    val words = tokens(text)
    val punct = length(regexp_replace(text, "[\\p{L}\\p{N}\\s]", ""))
    val longWordExtra = aggregate(words, lit(0),
      (acc, w) => acc + greatest(lit(0), floor((length(w) - 1) / 6).cast("int")))
    size(words) + punct + longWordExtra
  }

  /** Mean token length in double precision (deterministic: integer sums
    * divided once). */
  def meanTokenLength(text: Column): Column = {
    val t = tokens(text)
    aggregate(t, lit(0), (acc, w) => acc + length(w)).cast("double") /
      size(t).cast("double")
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[\\p{L}\\p{N}\\s]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Ratio of tokens that appear in the given stopword list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    size(array_intersect(t, array(stopwords.map(lit): _*))).cast("double") /
      greatest(size(t), lit(1)).cast("double")
  }

  /** Heuristic quality score in [0,1]: rewards mid-length documents,
    * penalizes extreme punctuation and degenerate mean word lengths.
    * Pure integer/double arithmetic on the components above. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / lit(20.0), lit(1.0))
    val wordLen = meanTokenLength(text)
    val wordLenScore = when(wordLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    round((lenScore * 0.4 + wordLenScore * 0.3 + punctScore * 0.3), 6)
  }

  /** Adaptive band filter: keep rows whose `valueCol` lies inside the
    * corpus's exact [loQ, hiQ] quantile band — the data-driven length
    * cut (drop the shortest/longest tails) that replaces hand-tuned
    * thresholds when corpus composition shifts. Two passes over the
    * data: a one-row exact-percentile aggregate, broadcast back as a
    * nested-loop join of one row — no shuffle of the corpus itself. */
  def quantileBandFilter(df: DataFrame, valueCol: String,
                         loQ: Double, hiQ: Double): DataFrame = {
    require(loQ >= 0 && hiQ <= 1 && loQ <= hiQ,
      s"need 0 <= loQ <= hiQ <= 1, got [$loQ, $hiQ]")
    val bounds = df.agg(
      expr(s"percentile($valueCol, $loQ)").as("__graft_lo"),
      expr(s"percentile($valueCol, $hiQ)").as("__graft_hi"))
    df.crossJoin(broadcast(bounds))
      .filter(col(valueCol) >= col("__graft_lo") &&
        col(valueCol) <= col("__graft_hi"))
      .drop("__graft_lo", "__graft_hi")
  }

  /** Tiny per-language marker vocabularies for the n-gram/stopword
    * language-ID heuristic. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with", "for", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "avec", "un", "une", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "con", "un", "una", "para"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  /** Language ID: per language, score = matching marker-token count;
    * predict the argmax (ties broken toward the lexicographically last
    * language code — struct max), "und" when nothing matches. Map-only —
    * one pass, no shuffle. */
  def langId(text: Column,
             markers: Map[String, Seq[String]] = LangMarkers): Column = {
    val t = tokens(text)
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(array_intersect(t, array(words.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
  }

  /** Content fingerprint: sha256 of whitespace/case-normalized text —
    * the exact-dup key. */
  def fingerprint(text: Column): Column = Dedup.normalizedHash(text)

  /** Winnowing-style rolling fingerprints: hash every k-gram (character
    * level), keep the minimum hash per window of w consecutive k-grams.
    * Output per row: array of selected hashes (document sketch).
    *
    * Column variant — only safe on SHORT text: `norm` is an expression,
    * and Catalyst inlines it into the per-gram lambda (recomputing the
    * regex per gram). Use [[winnowingSketches]] for corpora. */
  def winnowingSketch(text: Column, k: Int = 8, w: Int = 4): Column = {
    val norm = normalize(text)
    sketchOf(norm, k, w)
  }

  /** Corpus-scale winnowing: normalization AND the gram array are
    * projected as real columns in separate stages, so each is computed
    * once per row instead of once per lambda element (multi-reference
    * aliases survive CollapseProject — same pathology and fix as
    * Dedup.shingleHashes). Output: (idCol, sketch). */
  def winnowingSketches(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 8, w: Int = 4): DataFrame =
    df.select(col(idCol),
        normalize(col(textCol)).as("__norm"))
      .select(col(idCol), gramsOf(col("__norm"), k).as("__grams"))
      .select(col(idCol), windowsOf(col("__grams"), w).as("sketch"))

  private def sketchOf(norm: Column, k: Int, w: Int): Column =
    windowsOf(gramsOf(norm, k), w)

  private def gramsOf(norm: Column, k: Int): Column =
    when(length(norm) >= k,
      transform(sequence(lit(1), length(norm) - k + 1),
        i => xxhash64(norm.substr(i, lit(k)))))
      .otherwise(array(xxhash64(norm)))

  private def windowsOf(grams: Column, w: Int): Column =
    array_distinct(
      when(size(grams) >= w,
        transform(sequence(lit(0), size(grams) - w),
          i => array_min(slice(grams, i + 1, lit(w)))))
        .otherwise(array(array_min(grams))))

  /** 31^j multipliers for the polynomial rolling hash (j < 9 keeps the
    * whole k-gram sum below 2^46 — exact in long arithmetic, no
    * modulus). */
  private def pow31(j: Int): Long = (0 until j).foldLeft(1L)((a, _) => a * 31L)

  /** Engine-portable rolling-hash fingerprint: min over all character
    * k-gram polynomial hashes of the ASCII-projected normalized text
    * (Σ ascii(c_j)·31^j per gram — Rabin-Karp's rolling polynomial,
    * evaluated directly since k is small). Unlike the xxhash-based
    * [[winnowingSketch]], every step is plain integer arithmetic any
    * engine reproduces exactly, so the result is oracle-checkable.
    * Non-ASCII characters are dropped first: Spark's ascii() reads the
    * leading UTF-8 byte while other engines return the code point, so
    * only the ASCII subset hashes identically everywhere. Map-only.
    *
    * The caller must pass a MATERIALIZED column (not an expression) —
    * the per-gram lambda references it k+1 times and Catalyst inlines
    * single-use alias expressions into lambdas (see
    * [[graft.ops.Dedup.shingleHashes]]). Use [[rollingFingerprints]]
    * for the safe frame-level form. */
  def rollingFingerprint(asciiNorm: Column, k: Int = 8): Column =
    array_min(transform(
      sequence(lit(1), length(asciiNorm) - (k - 1)),
      i => (0 until k).map(j =>
        ascii(asciiNorm.substr(i + j, lit(1))).cast("long") * lit(pow31(j)))
        .reduce(_ + _)))

  /** ASCII projection + space-padding to k of normalized text — the
    * input contract of [[rollingFingerprint]] (padding guarantees at
    * least one gram for short/empty docs). Null text is treated as
    * empty, so the fingerprint is TOTAL — a null would otherwise
    * propagate to a null gram array and a row the oracle's
    * unnest(generate_series(1, NULL)) silently drops. */
  def asciiNormalized(text: Column, k: Int = 8): Column = {
    val a = regexp_replace(normalize(coalesce(text, lit(""))), "[^ -~]", "")
    // rpad with a column length: never truncates (len >= length(a))
    call_function("rpad", a, greatest(length(a), lit(k)), lit(" "))
  }

  /** Frame-level rolling fingerprint: (idCol, n_grams, fingerprint) with
    * the normalized text materialized between stages (lambda-inlining
    * rule). */
  def rollingFingerprints(df: DataFrame, idCol: String, textCol: String,
                          k: Int = 8): DataFrame =
    df.select(col(idCol), asciiNormalized(col(textCol), k).as("__t"))
      .select(col(idCol),
        (length(col("__t")) - (k - 1)).as("n_grams"),
        rollingFingerprint(col("__t"), k).as("fingerprint"))

  /** TF-IDF scores per (document, term): tf = term count in the doc,
    * idf = ln(N / df) with N = corpus size and df = documents
    * containing the term. The classic relevance weight (Salton &
    * Buckley 1988) — and the cheap first-pass ranking signal before
    * embeddings. Scale shape: token explode is map-only; tf and df are
    * partial-agg groupBys; the df join is keyed by the term (never
    * doc × doc); N is a one-row broadcast. The tf frame is
    * localCheckpoint'ed — df derives from tf, and without the barrier
    * both join sides would re-run the corpus explode + aggregation
    * from scratch (tf is the compact distinct-(doc,term) frame, far
    * smaller than the explode it summarizes). A window-over-term
    * alternative would avoid the barrier but hot-spot stopword terms
    * (every row of a corpus-wide term lands on one reducer). Output:
    * (idCol, term, tf, tfidf[round 6]). */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    require(idCol != "term" && idCol != "tf" && idCol != "tfidf",
      s"idCol '$idCol' collides with tfIdf's output columns")
    val terms = df
      // alias barrier: keep the tokenizer out of the generate-filter
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(col("__toks")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val docFreq = tf.groupBy(col("term")) // tf rows are distinct (id,term)
      .agg(count(lit(1)).as("__df"))
    val nDocs = df.agg(countDistinct(col(idCol)).as("__n"))
    tf.join(docFreq, "term")
      .crossJoin(broadcast(nDocs))
      .select(col(idCol), col("term"), col("tf"),
        round(col("tf") * log(col("__n").cast("double") / col("__df")), 6)
          .as("tfidf"))
  }

  /** BM25 (Okapi) ranked retrieval over the corpus for a fixed bag of
    * query terms — the classic sparse-retrieval scorer (the lexical
    * complement of the dense [[graft.ops.Similarity]] family in a
    * RAG / eval-retrieval pipeline):
    *
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))
    *   idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))
    *
    * Scale shape: one tokenize+explode pass FILTERED to the query
    * terms before any shuffle (the grouped frame carries only
    * |docs-with-a-hit| × |terms| rows, not the corpus's full posting
    * list); document length rides along from the same pass (max of a
    * per-row constant, no second scan); df per term and the corpus
    * (N, avgdl) constants are metadata-sized broadcasts. Result is one
    * row per matching document — ranking/limiting is the caller's
    * (top-k composes with `orderBy(...).limit(k)`'s
    * TakeOrderedAndProject). Scores rounded to 6 decimals: ln ulp
    * differences across engines vanish, ordering becomes
    * cross-engine-stable. Corpus text is scanned twice, both map-only:
    * once filtered to query-term postings, once for the global
    * (N, avgdl) constants — filtering the posting pass BEFORE its
    * shuffle matters more at scale than the second scan costs. */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val terms = df
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).as("__dl"),
        explode(col("__toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    // per-(doc, term) frequency; __dl is constant per doc, max() carries it
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("__tf"), max(col("__dl")).as("__dl"))
      .localCheckpoint() // consumed twice: df(t) below + the score join
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val corpus = df.agg(
      count(lit(1)).as("__n"),
      sum(size(tokens(col(textCol))).cast("long")).as("__len"))
    val scored = tf
      .join(broadcast(docFreq), "term")
      .crossJoin(broadcast(corpus))
      .withColumn("__avgdl", col("__len").cast("double") / col("__n"))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) /
          (col("__df") + lit(0.5))))
      .withColumn("__s",
        col("__idf") * col("__tf") * lit(k1 + 1.0) /
          (col("__tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("__dl") / col("__avgdl"))))
    scored.groupBy(col(idCol))
      .agg(round(sum(col("__s")), 6).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
  }

  /** Multi-query BM25: score a whole QUERY TABLE against the corpus in
    * one pass — the retrieval shape a curation pipeline actually runs
    * (topic tagging, eval-set retrieval, per-topic sampling), where
    * looping [[bm25]] per query would rescan the corpus |queries|
    * times.
    *
    * `queries` carries (`queryIdCol`, `termsCol`: array<string>);
    * duplicate terms inside one query score once. Scale shape: the
    * corpus tokenizes+explodes ONCE, filtered map-side (broadcast
    * semi-join) to the union of all query terms before any shuffle; tf
    * and df are the same per-(doc,term) partial-agg groupBys as
    * [[bm25]] regardless of query count; the query table fans scored
    * postings out by term via a broadcast join (queries are small by
    * construction — they are human- or eval-authored). The per-query
    * top-k tail is [[graft.functions.BoundedTopKAgg]]: ≤ `topK` rows
    * per query cross the final shuffle — no rank window over the full
    * (query × doc) score matrix. Queries with zero hits simply emit no
    * rows (they never acquire postings), matching the SQL oracle.
    * Ties rank deterministically (bm25 desc, id asc). */
  def bm25Multi(docs: DataFrame, idCol: String, textCol: String,
                queries: DataFrame, queryIdCol: String, termsCol: String,
                topK: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val qTerms = queries
      .select(col(queryIdCol), explode(col(termsCol)).as("term"))
      .distinct()
    val wanted = qTerms.select("term").distinct()
    val terms = docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).as("__dl"),
        explode(col("__toks")).as("term"))
      .join(broadcast(wanted), Seq("term"), "left_semi")
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("__tf"), max(col("__dl")).as("__dl"))
      .localCheckpoint() // consumed twice: df(t) + the score join
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val corpus = docs.agg(
      count(lit(1)).as("__n"),
      sum(size(tokens(col(textCol))).cast("long")).as("__len"))
    val scored = tf
      .join(broadcast(docFreq), "term")
      .join(broadcast(qTerms), "term")
      .crossJoin(broadcast(corpus))
      .withColumn("__avgdl", col("__len").cast("double") / col("__n"))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) /
          (col("__df") + lit(0.5))))
      .withColumn("__s",
        col("__idf") * col("__tf") * lit(k1 + 1.0) /
          (col("__tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("__dl") / col("__avgdl"))))
    val perDoc = scored.groupBy(col(queryIdCol), col(idCol))
      .agg(round(sum(col("__s")), 6).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
    perDoc.groupBy(col(queryIdCol))
      .agg(graft.functions.BoundedTopKAgg.minK(
        struct((-col("bm25")).as("ns"), col(idCol).as("id"),
          col("n_terms_hit").as("nh")), topK).as("__top"))
      .select(col(queryIdCol),
        posexplode(col("__top")).as(Seq("__pos", "__s")))
      .select(col(queryIdCol),
        (col("__pos") + 1).cast("int").as("rank"),
        col("__s.id").as(idCol),
        (-col("__s.ns")).as("bm25"),
        col("__s.nh").as("n_terms_hit"))
  }

  /** Fixed-size token chunking with overlap — context-window prep for
    * embedding / RAG / training pipelines: each document becomes
    * ceil(max(n_tokens,1) / (chunk − overlap)) rows of
    * (id, chunk_id, n_tokens, chunk_text), consecutive chunks sharing
    * `overlapTokens` tokens. Tokens are the shared [[tokens]]
    * definition, so chunk boundaries agree with every other text
    * operator. Map-only (generator + slice column algebra, no
    * shuffle, no UDF) — scales linearly; the trailing chunk may be
    * shorter than `chunkTokens` (never empty), and no chunk is ever a
    * pure subset of its predecessor: starts run only to
    * `size − overlap` (further starts would add zero new tokens —
    * duplicate rows an embedding/dedup consumer would index twice),
    * which still covers every token because consecutive starts are
    * `chunk − overlap` apart. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      "overlap must be in [0, chunkTokens)")
    val step = chunkTokens - overlapTokens
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(1),
          greatest(size(col("__toks")) - overlapTokens, lit(1)),
          lit(step))).as(Seq("chunk_id", "__start")))
      .withColumn("__chunk",
        slice(col("__toks"), col("__start"), lit(chunkTokens)))
      .select(col(idCol), col("chunk_id"),
        size(col("__chunk")).as("n_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }

  /** Corpus word-n-gram (collocation) counts: for every n-token
    * window over the shared tokenizer, the number of occurrences and
    * of distinct containing docs — the frequency table behind
    * collocation mining, boilerplate discovery, and vocab induction
    * beyond unigrams. One explode + one groupBy keyed by the gram —
    * work follows gram frequency, shuffle rows are (gram, id) pairs.
    * Docs shorter than n contribute nothing. Uses explode_outer +
    * null-filter as the generate barrier (InferFiltersFromGenerate
    * skips outer generates — see SCALE.md's measured pathology; a
    * plain explode would re-inline the tokenizer per element). */
  def ngramCounts(df: DataFrame, idCol: String, textCol: String,
                  n: Int): DataFrame = {
    require(n >= 1, "n must be positive")
    // tokenize ONCE per row behind an alias: the gram lambda references
    // the token array three times (condition, bound, slice) and inlining
    // tokens() into the per-index lambda would re-run the regex split
    // per gram — the winnowingSketches/__norm pathology. Multi-reference
    // aliases survive CollapseProject.
    val toks = col("__toks")
    val grams = when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - n + 1),
          i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(lit(null).cast("array<string>"))
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode_outer(grams).as("ngram"))
      .filter(col("ngram").isNotNull)
      .groupBy("ngram")
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
  }

  /** Token-id encoding — the last prep step before training: every
    * token of every document mapped through a vocabulary frame
    * (term → vocab_id) to (id, pos, term_id) rows, OOV tokens → -1.
    * The vocabulary broadcasts (vocabularies are small by
    * construction); the corpus explodes once map-side and never
    * shuffles — output order is recoverable from (id, pos), so
    * downstream packing/batching can reassemble sequences without
    * this operator imposing a sort. */
  def termIds(df: DataFrame, idCol: String, textCol: String,
              vocab: DataFrame, termCol: String = "term",
              vocabIdCol: String = "vocab_id"): DataFrame = {
    val v = vocab.select(col(termCol).as("__term"),
      col(vocabIdCol).as("__vid"))
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        posexplode(col("__toks")).as(Seq("pos", "__term")))
      .join(broadcast(v), Seq("__term"), "left_outer")
      .select(col(idCol), col("pos"),
        coalesce(col("__vid"), lit(-1)).as("term_id"))
  }

  /** Per-document token (Shannon) entropy in nats — the information-
    * density quality signal: boilerplate, keyword stuffing, and
    * generator spam all sit far below natural prose for their length.
    * H = ln(n) − Σ cᵢ·ln(cᵢ)/n over per-distinct-token counts cᵢ.
    *
    * Scale shape: counts come from a RUN-LENGTH pass over the sorted
    * token array — sort_array + three codegen'd higher-order passes
    * (change-points → run starts → run lengths) — so the whole
    * operator is map-only column algebra: no explode, no groupBy, no
    * shuffle, nothing keyed by doc. The explode+groupBy(id,token)
    * alternative ships one shuffle row per token occurrence (~10⁹ rows
    * per TB); this ships zero. Per-doc cost is O(t log t) in the
    * token count, the same order as tokenizing. Output: (idCol,
    * n_tokens, entropy). Empty docs: the tokenizer yields [""] → one
    * token, entropy 0. */
  def tokenEntropy(df: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    // sorted tokens aliased ONCE: the change-point lambda references
    // the array per element and inlining the sort+regex split per index
    // would be the winnowingSketches O(t²) pathology
    val toks = col("__toks")
    val n = size(toks)
    // 0-based indices where a new run of equal tokens starts
    // (element_at is 1-based: element_at(toks, i) is the PREVIOUS
    // element of 0-based index i)
    val starts = filter(
      transform(sequence(lit(0), n - 1), i =>
        when(i === 0 || element_at(toks, i + 1) =!= element_at(toks, i),
          i).otherwise(lit(-1))),
      x => x >= 0)
    // run length = next start − this start (last run ends at n)
    val runEnds = concat(slice(col("__starts"), lit(2), n), array(n))
    val counts = zip_with(col("__starts"), runEnds, (s, e) => e - s)
    val sumClogC = aggregate(col("__counts"), lit(0.0d),
      (acc, c) => acc + c.cast("double") * log(c.cast("double")))
    df.select(col(idCol), sort_array(tokens(col(textCol))).as("__toks"))
      .select(col(idCol), toks, starts.as("__starts"))
      .select(col(idCol), toks, counts.as("__counts"))
      .select(col(idCol), size(toks).as("n_tokens"),
        (log(size(toks).cast("double")) -
          sumClogC / size(toks).cast("double")).as("entropy"))
  }

  /** Keep documents whose token entropy is at least `minEntropy` nats
    * — the repetition/spam cut that length and stopword ratios miss.
    * Map-only (see [[tokenEntropy]]).
    *
    * The entropy column crosses a single-element explode_outer(array)
    * before the filter: predicate pushdown substitutes project aliases
    * into the pushed condition, and pushing `entropy >= min` through
    * tokenEntropy's staged projects re-inlines the sorted token array
    * into the per-index lambdas — the winnowingSketches O(t²)
    * pathology, measured at 20 s vs 1.5 s at sf0.1. A filter on a
    * Generate's OUTPUT cannot push below the Generate, so entropy is
    * computed exactly once per row; the barrier itself adds one
    * row-preserving generate (no row blow-up, no shuffle). */
  def entropyFilter(df: DataFrame, idCol: String, textCol: String,
                    minEntropy: Double): DataFrame =
    tokenEntropy(df, idCol, textCol)
      .select(col(idCol), col("n_tokens"),
        explode_outer(array(col("entropy"))).as("entropy"))
      .filter(col("entropy") >= minEntropy)

  /** Corpus-unigram language-model score per document: the mean
    * negative log probability of the doc's tokens under the corpus's
    * OWN unigram distribution — the cheap perplexity proxy (CCNet
    * lineage) that flags gibberish and off-distribution docs without
    * an external LM: common-word prose scores low, random strings and
    * vocab-stuffing score high. Output:
    * (idCol, n_tokens, avg_neg_logprob) in nats.
    *
    * Scale shape: one token explode feeding a (doc,term) partial-agg
    * groupBy (the tf frame, localCheckpoint'ed — the corpus-frequency
    * side derives from it, and without the barrier both sides would
    * re-run the explode); corpus frequencies are a vocab-sized re-agg;
    * the probe join is keyed by the term over DISTINCT (doc,term) rows
    * — work follows document frequency, the accepted tfIdf shape.
    * Total token count reaches every row as a one-row broadcast. */
  def unigramLogProb(df: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    val tf = df
      // alias barrier: keep the tokenizer out of the generate-filter
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(col("__toks")).as("__term"))
      .groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).as("__tf"))
      .localCheckpoint()
    val freq = tf.groupBy(col("__term")).agg(sum(col("__tf")).as("__c"))
    val total = freq.agg(sum(col("__c")).cast("double").as("__n"))
    tf.join(freq, "__term")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).as("n_tokens"),
        (sum(col("__tf") *
            -(log(col("__c").cast("double")) - log(col("__n")))) /
          sum(col("__tf")).cast("double")).as("avg_neg_logprob"))
  }

  /** Corpus-level language histogram (one shuffle). */
  def langHistogram(df: DataFrame, textCol: String): DataFrame =
    df.groupBy(langId(col(textCol)).as("predicted_lang"))
      .agg(count(lit(1)).as("n"))

  // ------------------------------------------------------ PII redaction

  /** Conservative regexes shared with the DuckDB oracle — RE2-safe
    * subset (no backrefs/lookaround), so Spark (java.util.regex) and
    * DuckDB (RE2) match identically. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ]?[0-9]{0,4}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redact emails / phone numbers / IPv4 addresses with typed
    * placeholder tokens — the standard pre-training scrub. Map-only. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Count of PII matches before redaction (for corpus audit stats). */
  def piiCount(text: Column): Column =
    size(split(text, EmailPattern)) - 1 +
      (size(split(text, Ipv4Pattern)) - 1) +
      (size(split(text, PhonePattern)) - 1)

  /** Repetition statistics per document — the Gopher-style repetition
    * signals a pre-training scrub filters on: duplicate-token fraction
    * (1 − distinct/total) and top-bigram fraction (2 · occurrences of
    * the most frequent word bigram / tokens). Docs shorter than
    * `minTokens` are excluded (the fractions are meaningless there;
    * minTokens ≥ 2 also guarantees every surviving doc has at least
    * one bigram, keeping the lambda indices in range).
    * Shape: map-only bigram explode + two groupBys keyed by doc —
    * shuffle-bounded, no driver state.
    * Output: (idCol, n_tokens, dup_token_frac, top_bigram_frac). */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
                      minTokens: Int = 4): DataFrame = {
    require(minTokens >= 2,
      "minTokens must be >= 2 - a bigram needs two tokens")
    val toks = col("__graft_toks")
    val base = df.select(col(idCol), tokens(col(textCol)).as("__graft_toks"))
      .filter(size(toks) >= minTokens)
      .select(col(idCol), toks,
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("__nd"))
    // explode_outer: sequence(0, size-2) is non-empty for size >= 2 —
    // outer changes no rows but skips InferFiltersFromGenerate (whose
    // pushed filter would re-inline the bigram lambda; see Dedup)
    val bigrams = base.select(col(idCol), col("n_tokens"), col("__nd"),
      explode_outer(transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ",
          element_at(toks, i + 1), element_at(toks, i + 2)))).as("__bg"))
    val top = bigrams
      .groupBy(col(idCol), col("__bg")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(max(col("__c")).as("__top"))
    base.join(top, Seq(idCol))
      .select(col(idCol), col("n_tokens"),
        (lit(1.0d) - col("__nd").cast("double") / col("n_tokens")
          .cast("double")).as("dup_token_frac"),
        (col("__top").cast("double") * 2.0d / col("n_tokens")
          .cast("double")).as("top_bigram_frac"))
  }

  /** EXACT corpus heavy hitters without a full-vocabulary shuffle —
    * the two-pass sketch-then-recount pattern:
    *
    *  1. one pass folds every token into a Misra-Gries sketch
    *     ([[graft.functions.HeavyHittersAgg]], capacity `m`) PLUS the
    *     exact token total n — a single aggregation whose shuffle
    *     payload is one m-entry row per partition, not one row per
    *     distinct term;
    *  2. the candidate terms (guaranteed to include every term with
    *     frequency > n/(m+1)) broadcast back as a map-side semi-join
    *     filter, and a second pass counts ONLY candidate rows exactly
    *     — a groupBy over ≤ m distinct keys.
    *
    * The result — terms with exact count ≥ ceil(n · minFrac) — is
    * provably identical to the full `groupBy(term).count` answer as
    * long as `minFrac > 1/(m+1)` (enforced), because no qualifying
    * term can be missing from the sketch. Compare `topTerms`: same
    * answer, but its shuffle carries the whole vocabulary — at 100 TB
    * this version crosses the wire with O(partitions · m) candidate
    * state + O(m) recount keys.
    *
    * Output: (term, cnt) — exact counts, SQL-oracle-checkable. */
  def heavyHitterTerms(df: DataFrame, textCol: String,
                       minFrac: Double, m: Int = 4096): DataFrame = {
    require(minFrac > 0 && minFrac < 1, s"minFrac in (0,1), got $minFrac")
    require(minFrac > 1.0 / (m + 1),
      s"minFrac=$minFrac below the sketch guarantee 1/(m+1)=${1.0 / (m + 1)}: " +
        "a qualifying term could evade the sketch; raise m or minFrac")
    val toks = df.select(explode(tokens(col(textCol))).as("term"))
    val sketch = toks.agg(
      graft.functions.HeavyHittersAgg.sketch(col("term"), m).as("__sk"),
      count(lit(1)).as("__n"))
    val cands = sketch.select(
      explode(col("__sk.term")).as("term"), col("__n"))
    // threshold in exact integer arithmetic: ceil(n * minFrac) with
    // minFrac expressed as a scaled-integer ratio, identical on any
    // engine (no double rounding at the cut)
    val fracScaled = math.round(minFrac * 1e9)
    toks.join(broadcast(cands), Seq("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"), max(col("__n")).as("__n"))
      .filter(col("cnt").cast(org.apache.spark.sql.types.DecimalType(38, 0))
        * lit(1000000000L)
        >= col("__n").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * lit(fracScaled))
      .select(col("term"), col("cnt"))
  }

  /** TF-IDF cosine similarity self-join: document pairs whose sparse
    * TF-IDF vectors (over the INFORMATIVE term set — terms with
    * df ≤ maxDf; the stopword cut that both defines the metric and
    * bounds the blocking) have cosine ≥ `threshold`. The lexical
    * entity-resolution / template-near-dup shape — catches rearranged
    * or partially overlapping documents that edit-distance
    * ([[FuzzyJoin]]) and shingle-Jaccard ([[Dedup]]) miss.
    *
    * Exact-deterministic scoring (the [[Similarity.kmeansAssign]]
    * discipline): weights w = tf·ln(1 + N/df) quantize to 1e-4 units
    * as BIGINTs immediately, so pair dot products and norm sums are
    * associative integer arithmetic — partition order cannot move a
    * pair across the threshold, and one fixed-order double expression
    * (int dot / (sqrt·sqrt)) reproduces bit-for-bit in any engine.
    *
    * Scale shape: candidate pairs come from a TERM-KEYED self-join of
    * the (doc, term, wq) frame — the all-pairs product never
    * materializes, and the df cap bounds the per-term fanout at
    * maxDf² rows (Σ_t df_t·min(df_t,cap) total); norms ride a
    * doc-keyed partial agg. At 100 TB the df cap is the knob: it is
    * both the IDF floor (terms that frequent carry ~no signal) and the
    * hard bound on join skew. */
  def tfidfCosineJoin(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double, maxDf: Long): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold in (0,1], got $threshold")
    require(maxDf >= 2, s"maxDf must be >= 2 (pairs need two docs), got $maxDf")
    val terms = df
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(col("__toks")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("__tf"))
      .localCheckpoint() // consumed by df(t), norms, and both join sides
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
    val nDocs = df.agg(countDistinct(col(idCol)).as("__n"))
    val weights = tf
      .join(docFreq, "term")
      .crossJoin(broadcast(nDocs))
      .select(col(idCol), col("term"),
        floor(col("__tf") * log(lit(1.0) +
            col("__n").cast("double") / col("__df").cast("double")) *
          lit(10000.0) + lit(0.5)).cast("long").as("__wq"))
      .localCheckpoint() // norms + both pair sides; exact ints from here
    val norms = weights.groupBy(col(idCol))
      .agg(sum(col("__wq") * col("__wq")).as("__n2"))
    val a = weights.select(col(idCol).as("id_a"), col("term"),
      col("__wq").as("__wa"))
    val b = weights.select(col(idCol).as("id_b"), col("term"),
      col("__wq").as("__wb"))
    val dots = a.join(b, "term")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("__wa") * col("__wb")).as("__dot"))
    dots
      .join(norms.select(col(idCol).as("id_a"), col("__n2").as("__na")), "id_a")
      .join(norms.select(col(idCol).as("id_b"), col("__n2").as("__nb")), "id_b")
      .withColumn("cos", col("__dot").cast("double") /
        (sqrt(col("__na").cast("double")) * sqrt(col("__nb").cast("double"))))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** BPE merge-candidate pair counts — the inner loop of byte-pair-
    * encoding tokenizer training: for every adjacent character pair
    * inside a word, the total corpus occurrence count (weighted by
    * word frequency). The highest-count pair is the next BPE merge.
    *
    * Scale shape — the insight that makes BPE trainable at 100 TB: the
    * corpus collapses to its WORD-FREQUENCY table first (one shuffle,
    * partial-agg; vocabulary-sized output), and all pair arithmetic
    * runs over that vocab table (|vocab|·avg_len rows), never over the
    * corpus. A driver loop applying merges re-derives pairs from the
    * same vocab-sized frame per round — the corpus is scanned exactly
    * once regardless of merge count.
    *
    * Output: (pair string — the two adjacent chars, cnt). Words
    * shorter than 2 chars contribute nothing. */
  def bpePairCounts(df: DataFrame, textCol: String): DataFrame = {
    val words = df.select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
    val wf = words.groupBy(col("w")).agg(count(lit(1)).as("__wf"))
    wf.select(col("__wf"),
        explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("__wf")).as("cnt"))
  }

  /** Train a BPE merge table: the classic sequential algorithm (count
    * weighted adjacent symbol pairs → merge the most frequent →
    * repeat) run DRIVER-SIDE over the collapsed word-frequency table —
    * exactly how reference tokenizer trainers work: the corpus is
    * scanned ONCE (one shuffle to the word-frequency aggregate, the
    * same collapse `bpePairCounts` uses) and every merge round is
    * in-memory arithmetic over the vocabulary, never a corpus rescan.
    * `maxWords` caps the collected vocabulary (top by frequency,
    * lexicographic tiebreak) — the standard train-on-capped-vocab
    * trade; at 100 TB cap or pre-sample, the encode pass is unchanged.
    *
    * Deterministic: ties in pair counts break lexicographically.
    * Returns merges in rank order, ready for
    * [[graft.functions.BpeEncodeExpr.bpeEncode]]. */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int,
               maxWords: Int = 100000): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val wf = df.select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("w")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var words: Array[(Array[String], Long)] = wf.map { case (w, c) =>
      // code-point-safe initial symbol split
      val syms = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        syms += w.substring(i, i + n)
        i += n
      }
      (syms.toArray, c)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      for ((syms, c) <- words; j <- 0 until syms.length - 1)
        counts.updateWith((syms(j), syms(j + 1)))(
          o => Some(o.getOrElse(0L) + c))
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var k = 0
          while (k < syms.length) {
            if (k < syms.length - 1 &&
                syms(k) == best._1 && syms(k + 1) == best._2) {
              out += syms(k) + syms(k + 1)
              k += 2
            } else { out += syms(k); k += 1 }
          }
          (out.toArray, c)
        }
      }
    }
    merges.toSeq
  }

  /** Inverted index with BOUNDED posting lists: per term, the document
    * frequency and the `maxPostings` smallest doc ids (sorted) — the
    * retrieval/index-build shape. The postings tail is
    * [[graft.functions.BoundedTopKAgg]], so a stopword appearing in
    * every document carries at most `maxPostings` ids per partition
    * through the shuffle instead of materializing its full (unbounded)
    * posting list the way `collect_list` + `slice` would; `df_docs`
    * stays exact regardless of the cap. One distinct on (term, doc)
    * then one term-keyed aggregation.
    * Output: (term, df_docs, postings array<bigint>). */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
                    maxPostings: Int): DataFrame = {
    require(maxPostings > 0, s"maxPostings must be positive, got $maxPostings")
    df.select(col(idCol).cast("long").as("__doc"),
        explode(tokens(col(textCol))).as("term"))
      .distinct()
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df_docs"),
        graft.functions.BoundedTopKAgg.minK(col("__doc"), maxPostings)
          .as("postings"))
  }

  /** HTML → text for web-corpus ingest: drop script/style blocks
    * (their CONTENT is code, not prose — tag-stripping alone would
    * leak it into the corpus), drop comments, strip remaining tags,
    * decode the six common entities, collapse whitespace. Pure
    * regexp-chain column expression — map-only, codegen'd, and
    * deliberately RE2-compatible (no backreferences/lookbehind:
    * `[\s\S]` instead of dotall, per-tag patterns instead of `\1`) so
    * the DuckDB oracle runs the IDENTICAL chain. Not a full HTML5
    * parser by design: boilerplate-stripping at corpus scale wants a
    * cheap total function, not a DOM. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?i)<script[^>]*>[\\s\\S]*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?i)<style[^>]*>[\\s\\S]*?</style>", " ")
    val noComment = regexp_replace(noStyle, "<!--[\\s\\S]*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) =>
        regexp_replace(c, e, java.util.regex.Matcher.quoteReplacement(r)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** PMI-scored collocations: adjacent-bigram pointwise mutual
    * information, PMI(w1,w2) = ln( P(w1,w2) / (P(w1)·P(w2)) ) with
    * bigram probability over total bigrams and unigram probabilities
    * over total tokens — the collocation-mining signal ("new york"
    * scores high, "of the" near zero) used for tokenizer vocab
    * candidates and phrase-aware dedup keys. `minCount` floors the
    * bigram count (PMI is noise-dominated on rare pairs).
    *
    * Scale shape: two token-keyed partial-agg shuffles (bigram counts,
    * unigram counts — both collapse map-side to vocab-sized frames),
    * then two vocab-keyed equi-joins and a broadcast of the two
    * 1-row totals. The PMI arithmetic is exact-integer ratios pushed
    * through one ln — deterministic on both engines, so the oracle
    * hash-matches despite the double. No per-row UDF, no window.
    * Output: (w1, w2, c12, pmi). */
  def collocations(df: DataFrame, textCol: String,
                   minCount: Long = 5): DataFrame = {
    val toks = df.select(tokens(col(textCol)).as("t"))
    val bigrams = toks.select(explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val unigrams = toks.select(explode(col("t")).as("w"))
    val pairCounts = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val uniCounts = unigrams.groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val totals = bigrams.agg(count(lit(1)).as("p"))
      .crossJoin(unigrams.agg(count(lit(1)).as("u")))
    pairCounts
      .join(uniCounts.select(col("w").as("w1"), col("cw").as("c1")),
        Seq("w1"))
      .join(uniCounts.select(col("w").as("w2"), col("cw").as("c2")),
        Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c12"),
        round(log(
          (col("c12").cast("double") * col("u") * col("u")) /
            (col("p").cast("double") * col("c1") * col("c2"))), 6)
          .as("pmi"))
  }
}
