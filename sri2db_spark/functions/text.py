"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs. Each operator has a deterministic
definition so a SQL oracle can reproduce it exactly.

Operators: tokenization + token counting (whitespace and BPE-ish regex),
stopword/quality scoring, heuristic language ID, shingle fingerprinting
(winnowing-style min-hash of md5 over k-word shingles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Small multilingual stopword lists for the heuristic language scorer.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
}

# BPE-ish token pattern: letter runs, digit runs, single other non-space chars.
TOKEN_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def token_count_regex(text: Column) -> Column:
    """BPE-ish token count via regex extraction (letters/digits/punct runs)."""
    return F.array_size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0))


def stopword_count(text: Column, stopwords: tuple[str, ...] = STOPWORDS["en"]) -> Column:
    arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(arr, t)))


def avg_word_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return total.cast("double") / F.size(toks).cast("double")


def quality_score(text: Column) -> Column:
    """Deterministic [0,1]-ish quality heuristic from integer counts:
    0.5·stopword_ratio + 0.3·min(avg_word_len/8, 1) + 0.2·len_score,
    len_score = min(n_tokens/200, 1). All arithmetic is double over exact
    integer counts, so any engine reproduces it bit-identically."""
    n = token_count_ws(text).cast("double")
    stop_ratio = stopword_count(text).cast("double") / n
    awl = avg_word_len(text)
    return (
        F.lit(0.5) * stop_ratio
        + F.lit(0.3) * F.least(awl / F.lit(8.0), F.lit(1.0))
        + F.lit(0.2) * F.least(n / F.lit(200.0), F.lit(1.0))
    )


def lang_score(text: Column, lang: str) -> Column:
    return stopword_count(text, STOPWORDS[lang]).cast("double") / token_count_ws(
        text
    ).cast("double")


def lang_id(text: Column) -> Column:
    """Heuristic n-gram/stopword language ID: argmax stopword-hit ratio over
    the configured languages; 'und' when no language scores ≥ 2%.
    Ties break in fixed language order (en, de, fr)."""
    en, de, fr = (lang_score(text, l) for l in ("en", "de", "fr"))
    return (
        F.when((en >= de) & (en >= fr) & (en >= 0.02), F.lit("en"))
        .when((de >= fr) & (de >= 0.02), F.lit("de"))
        .when(fr >= 0.02, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Array of k-word shingles (consecutive word k-grams), space-joined.
    Documents shorter than k words yield a single shingle = the whole text."""
    toks = tokens(text)
    parts = [F.element_at(toks, i) for i in range(1, k + 1)]

    def shingle_at(i: Column) -> Column:
        return F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(k)]
        )

    return F.when(
        F.size(toks) >= k,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (k - 1)), shingle_at),
    ).otherwise(F.array(text))


def canonicalize_text(text: Column) -> Column:
    """Dedup canonical form: lowercase, replace every character that is not
    a Unicode letter, digit, or space with a space, collapse whitespace
    runs, trim. Catches the case/punctuation/spacing variants that defeat
    raw content hashing (the standard pre-hash normalization in web-corpus
    dedup). Unicode-aware on purpose: an ASCII-only class would
    canonicalize every CJK/Cyrillic/Arabic document to the empty string,
    and a dedup keep-rule grouping on that would collapse an entire
    language's content into one "duplicate" group. Only engine-portable
    pieces — ``lower`` + ``\\p{L}\\p{N}`` character classes, supported
    identically by Java regex and RE2/DuckDB — so oracles reproduce it
    byte-for-byte.

    Callers grouping on this form for dedup MUST still exclude empty
    canonical forms (all-punctuation/whitespace documents): empty means
    "no canonical content", not "same content".
    """
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^\p{L}\p{N} ]", " ")
    t = F.regexp_replace(t, " +", " ")
    return F.trim(t)


def fingerprint(text: Column, k: int = 5) -> Column:
    """Winnowing-style document fingerprint: lexicographic min of md5 over all
    k-word shingles. Stable under content reordering-resistant matching and
    reproducible in any engine with md5."""
    return F.array_min(F.transform(word_shingles(text, k), lambda s: F.md5(s)))


def add_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach the standard text-analysis feature columns."""
    t = F.col(text_col)
    return (
        df.withColumn("n_tokens_ws", token_count_ws(t))
        .withColumn("n_tokens_re", token_count_regex(t))
        .withColumn("stopword_ratio", stopword_count(t).cast("double") / token_count_ws(t))
        .withColumn("avg_word_len", avg_word_len(t))
        .withColumn("quality", quality_score(t))
        .withColumn("lang_pred", lang_id(t))
        .withColumn("fingerprint", fingerprint(t))
    )


# --------------------------------------------------------------------------
# Training-data pipeline transforms: chunking, redaction, packing, sampling
# --------------------------------------------------------------------------

EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
PHONE_RE = "\\+?[0-9][0-9 ()-]{7,}[0-9]"


def chunk_documents(
    df: DataFrame, id_col: str, text_col: str, chunk_words: int = 64, stride: int = 48
) -> DataFrame:
    """Split documents into overlapping word-window chunks — the standard
    pre-embedding chunker. One narrow projection + posexplode; no shuffle.

    Chunk i covers words [i·stride, i·stride + chunk_words); the last window
    starts at the final stride position that still introduces new words.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(chunk_words)) / F.lit(stride)).cast("int") + 1
    )
    chunk_ids = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        chunk_ids,
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.concat_ws(
                " ", F.slice(toks, i * stride + 1, chunk_words)
            ).alias("chunk_text"),
        ),
    )
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(chunks).alias("c")
    ).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic PII scrubbing: emails and phone-like digit runs replaced
    by typed placeholders (regexp_replace — JVM-side, RE2-compatible)."""
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"),
        PHONE_RE,
        "<PHONE>",
    )
    return df.withColumn("text_redacted", scrubbed).withColumn(
        "n_redactions",
        F.size(F.split(scrubbed, "<EMAIL>|<PHONE>")) - 1,
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_tokens: int = 512,
    n_parts: int | None = None,
    token_count=None,
) -> DataFrame:
    """Contiguous sequence packing: assign docs (in id order) to training
    sequences of ~target_tokens by cumulative token count — the deterministic,
    shuffle-light form of context-window packing (greedy bin packing needs a
    sequential pass; contiguous packing is its scalable approximation).
    Returns (doc_id, n_tokens, seq_id).

    The global running sum is a DISTRIBUTED two-pass prefix sum, never a
    single unpartitioned window (``Window.orderBy`` with no partition
    funnels the whole table through ONE task — the exact shape Spark
    itself warns about, fatal at 100 TB): range-repartition on the id so
    partition index order IS id order, take the running sum WITHIN each
    partition, then shift each partition by the cumulative total of its
    predecessors (n_parts driver-side scalars, broadcast back). The
    partitioned data is localCheckpoint-ed so the totals pass and the
    output pass see the identical partitioning — which also means this
    function EXECUTES at call time (two jobs) and keeps the checkpointed
    (doc_id, n_tokens) projection pinned for the returned frame's
    lifetime: the unavoidable cost of a prefix sum's barrier, paid on a
    two-column projection, never the full table."""
    from pyspark.sql import Window  # noqa: PLC0415

    spark = df.sparkSession
    if n_parts is None:
        n_parts = max(2, spark.sparkContext.defaultParallelism)
    # token_count: Column→Column counter seam (budget-faithful BPE via
    # functions.tokenize.bpe_tokenizer); whitespace stays the default
    n_tok = (token_count or token_count_ws)(F.col(text_col))
    parted = (
        df.select(F.col(id_col).alias("doc_id"), n_tok.alias("n_tokens"))
        .repartitionByRange(n_parts, "doc_id")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_local = Window.partitionBy("__pid").orderBy(F.col("doc_id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # per-partition totals: n_parts rows to the driver, prefix-summed
    # in partition-index order (range partitioning assigns ascending id
    # ranges to ascending partition ids — pinned by tests)
    totals = parted.groupBy("__pid").agg(F.sum("n_tokens").alias("__tot")).collect()
    run = 0
    offsets = []
    for r in sorted(totals, key=lambda r: r["__pid"]):
        offsets.append((r["__pid"], run))
        # an all-null-text partition sums to None (F.sum skips nulls):
        # contributes nothing, exactly like the old window behavior
        run += r["__tot"] or 0
    from ..localframe import local_df  # noqa: PLC0415

    off = local_df(spark, offsets or [(0, 0)], "__pid int, __off bigint")
    cum = F.sum("n_tokens").over(w_local) + F.col("__off")
    return (
        parted.join(F.broadcast(off), "__pid")
        .select(
            "doc_id",
            "n_tokens",
            F.floor((cum - F.col("n_tokens")) / F.lit(target_tokens))
            .cast("long")
            .alias("seq_id"),
        )
    )


def deterministic_sample(df: DataFrame, id_col: str, rate_pct: int = 10) -> DataFrame:
    """Reproducible sampling by key arithmetic (id % 100 < rate_pct) —
    engine-portable, unlike hash- or RNG-based sampling."""
    return df.filter(F.pmod(F.col(id_col), F.lit(100)) < rate_pct)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates_pct: dict[str, int],
    default_pct: int = 10,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff
    ``id % 100 < pct(stratum)`` — the data-mixing knob of a training
    pipeline (e.g. upsample scarce languages) with exact, reproducible
    rates and no RNG. One codegen filter, no shuffle."""
    pct = F.lit(default_pct)
    for name, p in sorted(rates_pct.items()):
        pct = F.when(F.col(strata_col) == name, F.lit(p)).otherwise(pct)
    return df.filter(F.pmod(F.col(id_col), F.lit(100)) < pct)


def tfidf_topk(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Per-document top-k terms by tf·idf: (doc_id, term, score, rank).

    idf is the division form (N+1)/(df+1) rather than its logarithm: the
    ranking is identical (log is monotone) and IEEE division is exactly
    rounded, so scores reproduce bit-for-bit on any engine — ln() differs
    in the last ulp across math libraries. Plan: one explode + two
    hash-aggregations + a broadcast-sized df join + per-doc window.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.count()
    score = F.col("tf").cast("double") * (
        F.lit(float(n_docs + 1)) / (F.col("df").cast("double") + F.lit(1.0))
    )
    scored = tf.join(dfreq, "term").select("doc_id", "term", score.alias("score"))
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def repetition_metrics(
    df: DataFrame, id_col: str, text_col: str, k: int = 2
) -> DataFrame:
    """Per-document repetition signals (the Gopher-style repetition filter
    family): (doc_id, n_ngrams, n_distinct, dup_ngram_frac, top_ngram_frac).

    ``dup_ngram_frac`` = 1 − distinct/total word-k-grams — high for docs that
    loop the same phrases; ``top_ngram_frac`` = occurrences of the most
    frequent k-gram / total — high for single-phrase spam. Both are IEEE
    divisions of exact integer counts, so any engine reproduces them
    bit-for-bit. Plan: one explode + two map-side-combined hash
    aggregations keyed by doc — no joins, scale-linear.
    """
    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), k)).alias("g"),
    )
    per = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    agg = per.groupBy("doc_id").agg(
        F.sum("c").alias("n_ngrams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    tot = F.col("n_ngrams").cast("double")
    return agg.select(
        "doc_id",
        "n_ngrams",
        "n_distinct",
        (F.lit(1.0) - F.col("n_distinct").cast("double") / tot).alias("dup_ngram_frac"),
        (F.col("top_c").cast("double") / tot).alias("top_ngram_frac"),
    )


def boilerplate_shingles(
    docs: DataFrame, id_col: str, text_col: str, k: int = 3, min_docs: int = 10
) -> DataFrame:
    """Corpus-level boilerplate dictionary (the CCNet-style shared-fragment
    detector, shingle-based because documents need not have line structure):
    (shingle, n_docs) for every k-word shingle appearing in ≥ ``min_docs``
    distinct documents.

    ``array_distinct`` per document first, so a plain COUNT equals the
    distinct-document count — one exploded hash aggregation, no
    count-distinct shuffle. The ≥min_docs filter keeps only heavy hitters,
    so the output is tiny relative to the corpus at any scale.
    """
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), k))).alias("shingle"),
    )
    return (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def boilerplate_fraction(
    docs: DataFrame, id_col: str, text_col: str, k: int = 3, min_docs: int = 10
) -> DataFrame:
    """Per-document boilerplate load: (doc_id, n_shingles, n_boilerplate,
    boilerplate_frac) — the fraction of a doc's shingle occurrences that are
    corpus-wide boilerplate (from :func:`boilerplate_shingles`).

    The dictionary is the heavy-hitter set — orders of magnitude smaller
    than the corpus — so the probe join is broadcast. The expensive part —
    regex-splitting every document into k-word shingles — happens ONCE: the
    corpus is reduced to per-(doc, shingle) occurrence counts and persisted;
    both the dictionary aggregation and the per-document probe read that
    (much smaller) pair table instead of re-shingling the corpus.
    """
    pair = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_shingles(F.col(text_col), k)).alias("shingle"),
        )
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .persist()
    )
    # each pair row IS one distinct (doc, shingle): a plain COUNT per shingle
    # equals the distinct-document count — no count-distinct shuffle
    bp = (
        pair.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("shingle")
    )
    flagged = pair.join(F.broadcast(bp.withColumn("__bp", F.lit(1))), "shingle", "left")
    agg = flagged.groupBy("doc_id").agg(
        F.sum("n_occ").alias("n_shingles"),
        F.sum(F.col("n_occ") * F.coalesce(F.col("__bp"), F.lit(0))).alias("n_boilerplate"),
    )
    return agg.select(
        "doc_id",
        "n_shingles",
        "n_boilerplate",
        (F.col("n_boilerplate").cast("double") / F.col("n_shingles").cast("double")).alias(
            "boilerplate_frac"
        ),
    )


def ngram_overlap_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
) -> DataFrame:
    """Benchmark decontamination probe: corpus docs sharing ≥1 k-word
    shingle with the benchmark set, as (doc_id, n_overlapping).

    The benchmark's distinct shingle set is small → broadcast; the corpus
    side streams through one explode + broadcast semi-join + count — no
    corpus shuffle until the tiny per-doc aggregation. This is the standard
    eval-set leak filter for training corpora.
    """
    bset = benchmark.select(
        F.explode(F.array_distinct(word_shingles(F.col(text_col), k))).alias("s")
    ).distinct()
    dg = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), k))).alias("s"),
    )
    return (
        dg.join(F.broadcast(bset), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlapping"))
    )


def weighted_sample_topk(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    group_col: str | None = None,
    k: int = 5,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): each row draws priority −ln(u)/w and the k smallest
    priorities per group win — inclusion probability proportional to weight,
    exactly the data-mixing primitive a training pipeline needs ("sample 5
    docs per language, longer docs more likely").

    No RNG anywhere: u ∈ (0,1] derives from the first 48 bits of
    md5(id) — portable, so any engine with md5 replays the identical
    sample. One codegen projection + one per-group top-k window
    (WindowGroupLimit at scale, no full sort).

    Returns (group, id, weight, rank); priority itself is excluded from the
    output (ln() may differ in the last ulp across math libraries — order is
    unaffected unless two priorities collide within 1 ulp, vanishing odds).
    """
    two48 = float(1 << 48)
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10).cast("long")
        + F.lit(1)
    ).cast("double") / F.lit(two48)
    priority = -F.log(u) / F.col(weight_col).cast("double")
    grp = [group_col] if group_col else []
    w = Window.partitionBy(*grp).orderBy(F.col("__priority").asc(), F.col(id_col).asc())
    return (
        df.select(*grp, id_col, weight_col, priority.alias("__priority"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("__priority")
    )


def char_gini_diversity(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Character-diversity quality score per document: Gini impurity of the
    character distribution, 1 − Σ (cᵢ/N)². Low values flag junk documents
    (one repeated character/symbol); high values indicate natural text.

    Chosen over Shannon entropy deliberately: Gini needs only integer counts
    and one final division — exact and engine-portable — where entropy's
    ln() differs in the last ulp across math libraries. Plan: explode chars →
    one map-side-combined count aggregation → per-doc integer sums.

    Returns (id, n_chars, gini).
    """
    chars = F.expr(f"transform(sequence(1, length({text_col})), i -> substring({text_col}, i, 1))")
    per_char = (
        df.select(F.col(id_col).alias("id"), F.explode(chars).alias("ch"))
        .groupBy("id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per_char.groupBy("id").agg(
        F.sum("c").alias("n_chars"),
        (
            F.lit(1.0)
            - F.sum(F.col("c") * F.col("c")).cast("double")
            / (F.sum("c") * F.sum("c")).cast("double")
        ).alias("gini"),
    )


def source_quality_stats(
    df: DataFrame, id_col: str, text_col: str, source_col: str, lang_col: str
) -> DataFrame:
    """Per-(source, lang) corpus curation scorecard: document count, total /
    mean length, and how many documents are exact duplicates of content seen
    anywhere in the corpus — the signal used to prune low-quality crawl
    sources. Exact integer aggregates + one final division; the duplicate
    flag comes from a corpus-wide md5 content count joined back (shuffle on
    content hash, then on (source, lang) — both map-side combined).
    """
    hashed = df.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        F.length(text_col).alias("len"),
        F.md5(text_col).alias("content_hash"),
    )
    counts = hashed.groupBy("content_hash").agg(F.count(F.lit(1)).alias("n_copies"))
    return (
        hashed.join(counts, "content_hash")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("len").alias("total_chars"),
            (F.sum("len").cast("double") / F.count(F.lit(1)).cast("double")).alias("avg_chars"),
            F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0)).alias("n_dup_docs"),
        )
    )


def vocab_coverage(
    df: DataFrame, id_col: str, text_col: str, vocab_size: int = 1000
) -> DataFrame:
    """Per-document vocabulary coverage: the fraction of a doc's tokens that
    fall inside the corpus's top-``vocab_size`` terms by document frequency
    (ties broken lexicographically). A cheap unigram-LM proxy: low coverage
    flags gibberish, OCR noise, and out-of-domain text without any model.

    Plan: one doc-frequency aggregation → top-k (tiny, broadcast back) →
    one explode + broadcast semi-match + per-doc ratio of exact integer
    counts. The vocab is O(vocab_size) rows — always broadcastable.

    Returns (id, n_tokens, n_in_vocab, coverage).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:  # single-file input: spread the explode
        df = df.repartition(target)
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    vocab = (
        toks.select("id", "tok")
        .distinct()
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .select("tok")
    )
    flagged = toks.join(
        F.broadcast(vocab.withColumn("__in", F.lit(1))), "tok", "left"
    )
    return flagged.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.coalesce(F.col("__in"), F.lit(0))).alias("n_in_vocab"),
        (
            F.sum(F.coalesce(F.col("__in"), F.lit(0))).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("coverage"),
    )


def segment_dedup_stats(
    df: DataFrame, id_col: str, text_col: str, seg_words: int = 10
) -> DataFrame:
    """CCNet-style paragraph-level exact dedup, adapted to flat text: split
    each document into consecutive non-overlapping ``seg_words``-word
    segments, hash each, and mark a segment duplicated when its content
    appears in ≥2 distinct documents. The classic transform drops duplicated
    paragraphs; this returns the bookkeeping a pipeline needs to do that:
    (id, n_segments, n_dup_segments, n_tokens, n_tokens_kept) where
    ``n_tokens_kept`` counts tokens in segments unique to this document.

    Plan: sequence+slice builds segments inside codegen (no Python), one
    explode, one md5 hash-aggregation for the global distinct-doc count
    (array_distinct per doc first so COUNT == distinct-doc count), a probe
    join back, and one per-doc aggregation. Two shuffles total, both
    map-side combined; segment hashes are uniform so no skew — the same
    plan holds at 100 TB (the duplicate dictionary is NOT broadcast; the
    probe is a shuffle join sized by the corpus, which AQE handles).
    """
    toks = F.split(F.col(text_col), " ")
    n_segs = F.ceil(F.size(toks) / F.lit(float(seg_words))).cast("int")
    seg_arr = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * seg_words + 1, seg_words)),
    )
    segs = df.select(F.col(id_col).alias("id"), F.explode(seg_arr).alias("seg")).select(
        "id", F.md5("seg").alias("h"), F.size(F.split(F.col("seg"), " ")).alias("seg_toks")
    )
    # distinct (id, h) first so the count is a distinct-document count
    ndocs = (
        segs.select("id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    flagged = segs.join(ndocs, "h")
    dup = (F.col("n_docs") >= 2).cast("int")
    return flagged.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(dup).alias("n_dup_segments"),
        F.sum("seg_toks").alias("n_tokens"),
        F.sum(F.when(F.col("n_docs") >= 2, 0).otherwise(F.col("seg_toks"))).alias(
            "n_tokens_kept"
        ),
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """Deterministic BM25 retrieval: score every document against a fixed
    term set and return the top-``k`` as (id, score, rank).

    Two documented deviations make it bit-reproducible on any engine:
    the idf is the division form (N − df + 0.5)/(df + 0.5) WITHOUT the
    logarithm (per-term monotone; ln() differs in the last ulp across math
    libraries), and the per-term contributions are combined in the FIXED
    order of ``query_terms`` (one conditional aggregate per term, then a
    left-associative double sum) — no order-nondeterministic SUM over
    doubles anywhere.

    Plan: tokens are filtered to the query terms BEFORE the tf aggregation,
    so the expensive explode→agg path carries only matching rows (a ~|Q|/|V|
    fraction of the corpus); df-per-term is a tiny aggregate joined back by
    term (broadcast); doc length and the corpus-average length come from one
    exact integer aggregate, broadcast-cross-joined into the scoring plan —
    the whole query is ONE lazy plan, no driver collect blocking between
    the stats pass and the scoring pass. Top-k is orderBy+limit
    (per-partition map-side top-k, k rows to the driver).
    """
    qarr = F.array(*[F.lit(t) for t in query_terms])
    lens = df.select(
        F.col(id_col).alias("id"), token_count_ws(F.col(text_col)).alias("dl")
    )
    # 1-row stats joined in as columns: sum(dl) is an exact bigint, so
    # double-casting then dividing is bit-identical to the former
    # driver-side float(total)/float(n)
    stats = lens.agg(
        F.count(F.lit(1)).cast("double").alias("__n_docs"),
        (
            F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("__avgdl"),
    )

    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term")
    ).filter(F.array_contains(qarr, F.col("term")))
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    idf = (F.col("__n_docs") - F.col("df").cast("double") + F.lit(0.5)) / (
        F.col("df").cast("double") + F.lit(0.5)
    )
    tf_d = F.col("tf").cast("double")
    dl_norm = F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.col("__avgdl")
    contrib = idf * (tf_d * F.lit(k1 + 1.0)) / (tf_d + F.lit(k1) * dl_norm)

    # Pivot: one column per query term (each doc contributes ≤1 row per term,
    # so the per-term SUM aggregates a single value — exact), then add in
    # fixed term order.
    per_term = (
        tf.join(F.broadcast(dfreq), "term")
        .join(lens, "id")
        .crossJoin(F.broadcast(stats))
        .groupBy("id")
        .agg(
            *[
                F.sum(F.when(F.col("term") == t, contrib)).alias(f"__c_{i}")
                for i, t in enumerate(query_terms)
            ]
        )
    )
    score = F.coalesce(F.col("__c_0"), F.lit(0.0))
    for i in range(1, len(query_terms)):
        score = score + F.coalesce(F.col(f"__c_{i}"), F.lit(0.0))
    scored = per_term.select("id", score.alias("score"))
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    return (
        scored.orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
    )


def ngram_topk(
    df: DataFrame, id_col: str, text_col: str, n: int = 2, k: int = 20
) -> DataFrame:
    """Corpus-level top-``k`` word n-grams with counts: (gram, c, rank) —
    the n-gram LM count table used for contamination screens and corpus
    fingerprinting, truncated to the global head.

    Plan: one explode + one map-side-combined hash aggregation, then
    TakeOrderedAndProject for the global top-k (per-partition top-k on the
    map side, k rows per partition to the driver — never a full sort).
    Ties break lexicographically so the cut is deterministic.
    """
    grams = df.select(F.explode(word_shingles(F.col(text_col), n)).alias("gram"))
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.col("c").desc(), F.col("gram").asc())
    return (
        counts.orderBy(F.col("c").desc(), F.col("gram").asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
    )


def mixing_rates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    weights: dict[str, float],
    budget_tokens: int,
    token_count=None,
) -> DataFrame:
    """Training-mixture planner: given target mixture ``weights`` per source
    and a total token ``budget_tokens``, compute the per-source sampling
    rate that realizes the mixture: rate = min(1, budget·weight / tokens).
    Returns (source, n_docs, n_tokens, weight, sample_rate) — the driver
    table a pipeline feeds into deterministic_sample per source.

    One exact integer aggregation over the corpus; the output is
    O(#sources) rows. All divisions are IEEE over exact integers.
    """
    per = (
        df.select(
            F.col(source_col).alias("source"),
            # token_count seam: budget-faithful (e.g. BPE) counting —
            # the budget is denominated in whatever the trainer counts
            (token_count or token_count_ws)(F.col(text_col)).alias("n_tok"),
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )
    if weights:
        wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
        weight = F.coalesce(wmap[F.col("source")], F.lit(0.0))
    else:
        # empty map() is VOID-typed and map()[string] fails analysis —
        # no targets means every source weighs 0 (rate 0), not an error
        weight = F.lit(0.0)
    rate = F.least(
        F.lit(1.0),
        F.lit(float(budget_tokens)) * weight / F.col("n_tokens").cast("double"),
    )
    return per.select(
        "source", "n_docs", "n_tokens", weight.alias("weight"), rate.alias("sample_rate")
    )


def split_assign(
    df: DataFrame, id_col: str, train_pct: int = 98, val_pct: int = 1
) -> DataFrame:
    """Deterministic train/val/test split assignment: a content-independent
    md5 hash of the id picks a bucket in [0,100); buckets fill train, then
    val, then test. Hash-based (not ``id % N``) so sequential or clustered
    ids cannot bias a split; stable across runs/engines with no RNG.
    Returns (id, bucket, split). Pure projection — no shuffle.
    """
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
            "long"
        ),
        F.lit(100),
    )
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.select(
        F.col(id_col).alias("id"), bucket.alias("bucket"), split.alias("split")
    )


def bigram_lm_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """CCNet-style language-model quality signal without an external model:
    train a bigram LM on the corpus itself (one counting pass) and score each
    document by its mean conditional bigram probability. Junk text (random
    strings, boilerplate soup, wrong-language fragments) scores low because
    its bigrams are rare relative to their first word.

    Add-one (Laplace) smoothing over the first-word vocabulary V:
    p(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V). Smoothing is what makes the
    signal discriminate — unsmoothed MLE scores a never-seen-context junk
    bigram a perfect 1.0 (its unique w1 makes it "certain").

    Division-form on exact integer counts — no log/exp — so every float is
    reproduced bit-for-bit by any IEEE engine (the DuckDB oracle included);
    the per-doc mean uses the quantized-exact sum (floor(p·1e12) as int64)
    so it is independent of aggregation order.

    Plan shape at 100 TB: one explode, two count aggregations, and one join
    keyed by bigram (the LM "table" stays distributed — never collected);
    AQE's skew-join split handles the stop-bigram hot keys. Returns
    (id, n_bigrams, mean_bigram_p).
    """
    bg = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), 2)).alias("bg"),
    ).withColumn("w1", F.element_at(F.split(F.col("bg"), " "), 1))
    cbg = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("cbg"))
    cw1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("cw1"))
    vocab = bg.agg(F.countDistinct("w1").alias("V"))
    p = (
        bg.join(cbg, "bg")
        .join(cw1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "id",
            (
                (F.col("cbg") + F.lit(1)).cast("double")
                / (F.col("cw1") + F.col("V")).cast("double")
            ).alias("p"),
        )
    )
    return p.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.sum(F.floor(F.col("p") * F.lit(1e12)).cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1e12)
        ).alias("mean_bigram_p"),
    )


def _ws_tokens_expr(text_col: str):
    """Whitespace tokens with empties dropped — the ONE tokenization the
    span-dedup family shares (gram enumeration and the coverage totals
    must count under the same definition, or coverage ratios silently
    skew; DuckDB mirror: ``list_filter(string_split(text,' '), …)``)."""
    return F.expr(f"filter(split({text_col}, ' '), x -> x <> '')")


def _token_gram_occurrences(
    df: DataFrame, id_col: str, text_col: str, w: int
) -> DataFrame:
    """Every w-token window of every document as (id, pos, gram) — the
    building block of exact substring-level dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better": duplicated
    SPANS, not just duplicated documents, drive memorization).

    All JVM expressions: whitespace-split (empties dropped), a
    ``transform(sequence(...))`` window enumeration, one ``posexplode``.
    The explode yields ~tokens-per-doc rows per document — the same row
    volume every shingle operator here already shuffles — and the
    downstream groupBy is map-side combined.
    """
    toks = _ws_tokens_expr(text_col)
    grams = F.expr(
        f"CASE WHEN size(__t) >= {w} THEN "
        f"transform(sequence(1, size(__t)-{w}+1), "
        f"i -> array_join(slice(__t, i, {w}), ' ')) "
        "ELSE CAST(array() AS array<string>) END"
    )
    return (
        df.select(F.col(id_col).alias("id"), toks.alias("__t"))
        .select("id", F.posexplode(grams).alias("pos0", "gram"))
        .select("id", (F.col("pos0") + 1).alias("pos"), "gram")
    )


def duplicated_spans(
    df: DataFrame, id_col: str, text_col: str, w: int = 8, min_docs: int = 2
) -> DataFrame:
    """Exact duplicated w-token spans ACROSS documents: every w-gram that
    appears in at least ``min_docs`` distinct documents, with its document
    and occurrence counts. The cross-document report behind substring
    dedup — document-level fingerprints (minhash/simhash) miss a
    boilerplate paragraph pasted into thousands of otherwise-unique pages;
    this is the operator that finds it. Returns (gram, n_docs,
    n_occurrences); one hash-shuffle on the gram."""
    occ = _token_gram_occurrences(df, id_col, text_col, w)
    return occ.groupBy("gram").agg(
        F.countDistinct("id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    ).filter(F.col("n_docs") >= min_docs)


def duplicated_span_coverage(
    df: DataFrame, id_col: str, text_col: str, w: int = 8, min_docs: int = 2
) -> DataFrame:
    """Per-document duplicated-span coverage: how many of a document's
    tokens sit inside at least one w-gram that also appears in
    ``min_docs``-1 other documents. The Lee-et-al. curation metric — a
    high ``dup_tokens/total_tokens`` ratio marks boilerplate-heavy or
    near-copied documents that document-level dedup keeps.

    Shape: the gram groupBy (one shuffle) marks duplicated grams; hit
    positions join back co-partitioned on the gram; the per-document
    interval union ([pos, pos+w) spans overlap heavily) is the classic
    running-max window, partitioned by document — never a global sort.
    Output is all-integer (doc id, total_tokens, dup_tokens): ratios are
    left to the caller, so no double crosses an engine boundary."""
    # persist: same two-consumer shape as dedup_corpus_spans — the dup
    # aggregation and the join back cannot share an exchange (partial-agg
    # rows vs raw rows), so the corpus w-gram explode would run twice
    occ = _token_gram_occurrences(df, id_col, text_col, w).persist()
    dup = (
        occ.groupBy("gram")
        .agg(F.countDistinct("id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("gram")
    )
    hits = occ.join(dup, "gram").select("id", "pos")
    return _span_coverage_table(df, id_col, text_col, hits, w, "dup_tokens")


def _span_union_per_doc(hits: DataFrame, w: int) -> DataFrame:
    """(id, pos) hit positions → (id, covered): size of the union of the
    intervals [pos, pos+w) per id — the running-max window form
    (doc-partitioned, never a global sort; heavy overlap collapses in one
    pass)."""
    wspec = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = F.greatest(
        F.lit(0),
        (F.col("pos") + F.lit(w))
        - F.greatest(F.col("pos"), F.coalesce(F.max(F.col("pos") + F.lit(w)).over(wspec), F.lit(0))),
    )
    return hits.select("id", contrib.alias("c")).groupBy("id").agg(
        F.sum("c").alias("covered")
    )


def _span_coverage_table(
    df: DataFrame, id_col: str, text_col: str, hits: DataFrame, w: int, out_col: str
) -> DataFrame:
    """Join per-doc covered-token counts back onto every input doc
    (zero-filled). NULL text -> NULL total (matches the oracle's
    len(NULL); Spark's non-ANSI size(NULL) would otherwise return -1 and
    poison ratios)."""
    covered = _span_union_per_doc(hits, w)
    totals = df.select(
        F.col(id_col).alias("id"),
        F.when(
            F.col(text_col).isNotNull(), F.size(_ws_tokens_expr(text_col))
        )
        .cast("bigint")
        .alias("total_tokens"),
    )
    return totals.join(covered, "id", "left").select(
        F.col("id").alias(id_col),
        "total_tokens",
        F.coalesce(F.col("covered"), F.lit(0)).cast("bigint").alias(out_col),
    )


def contaminated_span_coverage(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 8,
) -> DataFrame:
    """Span-level decontamination measure: for every TRAINING document,
    how many of its tokens sit inside at least one w-token gram that also
    occurs anywhere in the BENCHMARK corpus. Document-level n-gram
    overlap (``ngram_overlap_contamination``) flags whole documents; this
    is the surgical form — the per-token contamination mass that decides
    between dropping a document and splicing out the contaminated spans
    (the GPT-3 appendix-C / Lee-et-al. decontamination recipe).

    Returns all-integer ``(id, total_tokens, contaminated_tokens)``.

    Shape: one distinct-gram aggregation over the benchmark side (small —
    benchmarks are tiny next to training corpora), one co-partitioned
    gram join against the training occurrences, then the per-doc interval
    union — identical physics to :func:`duplicated_span_coverage` (one
    gram shuffle, doc-partitioned running-max window, never a global
    sort)."""
    occ = _token_gram_occurrences(train, id_col, text_col, w)
    bgrams = (
        _token_gram_occurrences(bench, id_col, text_col, w)
        .select("gram")
        .distinct()
    )
    hits = occ.join(bgrams, "gram").select("id", "pos")
    return _span_coverage_table(
        train, id_col, text_col, hits, w, "contaminated_tokens"
    )


def decontaminate_corpus(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 8,
    drop_threshold_e6: int = 500_000,
    margin: int = 2,
) -> DataFrame:
    """The ACTION half of span-level benchmark decontamination — emit the
    decontaminated corpus, not just the report
    (:func:`contaminated_span_coverage` is the measurement half). The
    Lee-et-al. / GPT-3 appendix-C "remove" recipe:

    - **drop**: a training document whose contaminated-token fraction
      strictly exceeds ``drop_threshold_e6``/1e6 is removed wholesale
      (one audit row, ``seg = 0``, NULL ``clean_text``).
    - **splice**: below the threshold, every contaminated w-gram window
      is cut out with ``margin`` extra tokens on each side (overlapping
      cut intervals merged), and each maximal surviving token run is
      re-chunked as its OWN output row (``seg`` = 1-based ordinal).
      Emitting segments as separate rows — never re-joining across a
      splice point — is what makes the guarantee hold: a w-gram inside a
      kept segment occupies w consecutive ORIGINAL positions all outside
      the cut union, so re-measuring the output against the same
      benchmark yields zero contamination mass (property-tested).
    - **keep**: zero contamination → the document passes through
      unchanged (``seg = 1``). A splice that leaves no surviving segment
      degrades to **drop**.

    The drop decision uses the UN-margined contamination mass (exactly
    what ``contaminated_span_coverage`` reports); the cut intervals are
    the margined ones. The threshold compare is exact-integer
    (``contaminated·1e6 > threshold_e6·total``) so any engine replays it
    bit-for-bit.

    Returns ``(id, seg, action, n_dropped_spans, total_tokens,
    contaminated_tokens, clean_text)``.

    Shape at 100 TB: identical physics to the measurement — one
    distinct-gram aggregation on the (small) benchmark side, one
    co-partitioned gram join, then doc-partitioned windows over the HIT
    rows only (bounded by contamination mass, far below corpus size; the
    hit set is localCheckpoint-materialized once and feeds both the
    coverage union and the cut-interval merge). The splice itself is a
    per-row JVM array expression — no Python, no extra shuffle."""
    occ = _token_gram_occurrences(train, id_col, text_col, w)
    bgrams = (
        _token_gram_occurrences(bench, id_col, text_col, w)
        .select("gram")
        .distinct()
    )
    hits = occ.join(bgrams, "gram").select("id", "pos")
    return _splice_corpus(
        train, hits, id_col, text_col, w, drop_threshold_e6, margin
    )


def dedup_corpus_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 8,
    min_docs: int = 2,
    drop_threshold_e6: int = 500_000,
    margin: int = 0,
) -> DataFrame:
    """Exact substring-level dedup ACTION (Lee et al. 2022, ExactSubstr —
    the "remove" half; :func:`duplicated_span_coverage` is the report):
    for every w-token gram appearing in ≥ ``min_docs`` distinct
    documents, the LOWEST-id document keeps its occurrences and every
    other document has those gram windows cut out (±``margin``) and is
    re-chunked — same drop/splice/keep emitter and schema as
    :func:`decontaminate_corpus` (documents above the un-margined
    dup-token threshold are dropped wholesale with an audit row).

    The keeper is per gram, so overlapping duplicate families resolve
    deterministically; a keeper can still lose OTHER grams it doesn't
    own. Guarantee (property-tested): re-measuring
    ``duplicated_spans(min_docs=2)`` over the keep/splice output KEYED BY
    THE ORIGINAL id finds no cross-document duplicated gram — every
    surviving duplicated gram survives only in its keeper. Re-chunking
    prevents junction grams, exactly as in decontamination.

    Returns ``(id, seg, action, n_dropped_spans, total_tokens,
    dup_tokens, clean_text)``.

    Shape at 100 TB: one gram shuffle (groupBy gram: distinct-doc count +
    min id, map-side combined), one co-partitioned join back, then the
    shared splice machinery over HIT rows only."""
    # persist: the occurrence explode feeds TWO consumers — the keeper
    # aggregation and the join back — and they do NOT share an exchange
    # (the groupBy's exchange carries partially aggregated rows; the join
    # side needs the raw (id, pos, gram) rows), so without the cache the
    # w-gram explode of the whole corpus runs twice. Reclaimed by the
    # context cleaner with the result (same discipline as the LSH band
    # frame).
    occ = _token_gram_occurrences(df, id_col, text_col, w).persist()
    keeper = (
        occ.groupBy("gram")
        .agg(F.countDistinct("id").alias("nd"), F.min("id").alias("keeper"))
        .filter(F.col("nd") >= min_docs)
        .select("gram", "keeper")
    )
    hits = (
        occ.join(keeper, "gram")
        .filter(F.col("id") != F.col("keeper"))
        .select("id", "pos")
    )
    return _splice_corpus(
        df, hits, id_col, text_col, w, drop_threshold_e6, margin,
        hit_col="dup_tokens",
    )


def _splice_corpus(
    train: DataFrame,
    hits: DataFrame,
    id_col: str,
    text_col: str,
    w: int,
    drop_threshold_e6: int,
    margin: int,
    hit_col: str = "contaminated_tokens",
) -> DataFrame:
    """Shared drop/splice/re-chunk emitter behind
    :func:`decontaminate_corpus` and :func:`dedup_corpus_spans`: given the
    (id, pos) w-gram HIT positions to remove, drop documents whose
    un-margined hit-token fraction exceeds the threshold, cut the
    margined merged intervals out of the rest, and emit each maximal
    surviving token run as its own row. See the public wrappers for the
    guarantee discussion."""
    # hit positions feed BOTH the un-margined coverage union and the
    # margined cut-interval merge — materialize once
    hits = hits.localCheckpoint(eager=True)
    covered = _span_union_per_doc(hits, w)

    # margined cut intervals [max(1, pos-margin), pos+w+margin), merged
    # per doc with the standard sort + running-max-end group assignment
    iv = hits.select(
        "id",
        F.greatest(F.lit(1), F.col("pos") - F.lit(margin)).alias("s"),
        (F.col("pos") + F.lit(w + margin)).alias("e"),
    )
    wprev = (
        Window.partitionBy("id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grp = iv.select(
        "id",
        "s",
        "e",
        F.sum(
            (F.col("s") > F.coalesce(F.max("e").over(wprev), F.lit(0))).cast("bigint")
        )
        .over(wrun)
        .alias("grp"),
    )
    spans = grp.groupBy("id", "grp").agg(F.min("s").alias("s"), F.max("e").alias("e"))
    spans_agg = spans.groupBy("id").agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("spans")
    )

    doc = train.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("__text"),
        _ws_tokens_expr(text_col).alias("__t"),
    )
    base = doc.join(covered, "id", "left").join(spans_agg, "id", "left")
    total = (
        F.when(F.col("__text").isNotNull(), F.size("__t"))
        .cast("bigint")
        .alias("total_tokens")
    )
    cont = F.coalesce(F.col("covered"), F.lit(0)).cast("bigint")
    nspans = (
        F.when(F.col("spans").isNull(), F.lit(0))
        .otherwise(F.size("spans"))
        .cast("bigint")
    )
    # maximal kept runs between the merged cut intervals: boundary i of
    # 0..k is [prev end, next start-1]; ends past the token count filter
    # out naturally (slice clamps, st<=en rejects empty)
    segs = F.expr(
        "transform("
        "  filter("
        "    transform(sequence(0, size(spans)), i -> named_struct("
        "      'st', CASE WHEN i = 0 THEN 1 ELSE element_at(spans, i).e END,"
        "      'en', CASE WHEN i = size(spans) THEN size(__t)"
        "            ELSE element_at(spans, i + 1).s - 1 END)),"
        "    x -> x.st <= x.en),"
        "  x -> array_join(slice(__t, x.st, x.en - x.st + 1), ' '))"
    )
    enriched = base.select(
        "id",
        "__text",
        total,
        cont.alias(hit_col),
        nspans.alias("n_dropped_spans"),
        F.when(F.col("spans").isNull(), F.expr("CAST(array() AS array<string>)"))
        .otherwise(segs)
        .alias("__segs"),
    )
    action = (
        F.when(F.col(hit_col) == 0, F.lit("keep"))
        .when(
            F.col(hit_col) * F.lit(1_000_000)
            > F.lit(int(drop_threshold_e6)) * F.col("total_tokens"),
            F.lit("drop"),
        )
        # a splice that leaves nothing is a drop
        .when(F.size("__segs") == 0, F.lit("drop"))
        .otherwise(F.lit("splice"))
    )
    enriched = enriched.withColumn("action", action).withColumn(
        "__out",
        F.when(F.col("action") == "keep", F.array(F.col("__text")))
        .when(F.col("action") == "drop", F.expr("array(CAST(NULL AS string))"))
        .otherwise(F.col("__segs")),
    )
    return enriched.select(
        "id",
        "action",
        F.when(F.col("action") == "keep", F.lit(0).cast("bigint"))
        .otherwise(F.col("n_dropped_spans"))
        .alias("n_dropped_spans"),
        "total_tokens",
        hit_col,
        F.posexplode("__out").alias("seg0", "clean_text"),
    ).select(
        F.col("id").alias(id_col),
        F.when(F.col("action") == "drop", F.lit(0))
        .otherwise(F.col("seg0") + 1)
        .cast("bigint")
        .alias("seg"),
        "action",
        "n_dropped_spans",
        "total_tokens",
        hit_col,
        "clean_text",
    )


def calibrate_quality(
    df: DataFrame, id_col: str, text_col: str, source_col: str
) -> DataFrame:
    """Per-source quality calibration: each document's quality score is
    converted to a percentile WITHIN its source and a decile bucket.
    Raw quality heuristics are not comparable across sources (a forum
    corpus and an encyclopedia have different score distributions);
    mixture planners sample by within-source percentile instead —
    "keep the top 30% of each source" — which needs exactly this table.

    Returns ``(id, source, qbin, pr_e6, decile)``: qbin = floor(1e6 ×
    quality) (the integer quality grid), pr_e6 = percent_rank on that
    grid scaled to [0, 1e6] (ties share a rank, like SQL PERCENT_RANK),
    decile = min(9, pr_e6 div 100_000).

    Scale shape: a naive PERCENT_RANK window partitions by source — a
    handful of partitions, each holding its whole source's rows: the
    classic skewed-window trap at 100 TB. This plan instead aggregates a
    per-(source, qbin) HISTOGRAM (bounded at 10^6+1 bins per source no
    matter the corpus size), computes the CDF with a window over that
    bounded frame, and joins the percentiles back co-partitioned on
    (source, qbin) — the corpus-sized pass is one hash aggregation and
    one shuffle join, never a per-source sort. All ranking arithmetic is
    exact integers, so any engine reproduces it bit-for-bit (the oracle
    uses the window form; same semantics, different physical plan)."""
    q = df.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        F.floor(F.lit(1_000_000.0) * quality_score(F.col(text_col)))
        .cast("bigint")
        .alias("qbin"),
    )
    # materialize the narrow (id, source, qbin) frame once: it feeds BOTH
    # the histogram build and the join probe — without this the
    # per-document quality_score expression (the dominant corpus cost)
    # evaluates twice. localCheckpoint (not persist) so the storage is
    # dropped with the lineage when the frame is garbage-collected rather
    # than pinned for the application lifetime of a long-lived session.
    q = q.localCheckpoint(eager=True)
    hist = q.groupBy("source", "qbin").agg(F.count(F.lit(1)).alias("cnt"))
    # NULLS LAST pinned explicitly: Spark's ASC default is NULLS FIRST but
    # the DuckDB oracle's RANK() defaults to NULLS LAST — a NULL qbin
    # (NULL text) must rank above every real bin in BOTH engines or
    # `below` diverges in both directions for mixed sources
    wcdf = (
        Window.partitionBy("source")
        .orderBy(F.col("qbin").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wtot = Window.partitionBy("source")
    cdf = hist.select(
        "source",
        "qbin",
        F.coalesce(F.sum("cnt").over(wcdf), F.lit(0)).alias("below"),
        F.sum("cnt").over(wtot).alias("n_src"),
    )
    # guard n_src == 1 BEFORE the div: under ANSI (Spark 4's default) an
    # unguarded div-by-zero aborts the job for a single-document source
    pr = F.when(
        F.col("n_src") > 1,
        F.expr("(below * 1000000) div (n_src - 1)"),
    ).otherwise(F.lit(0).cast("bigint"))
    # null-safe join keys: a NULL source (or a NULL qbin from NULL text)
    # still groups in the histogram, so an equi-join would silently DROP
    # those rows from the calibration table — every input row must get a
    # percentile, like the window form the oracle replays
    cdf = cdf.select(
        F.col("source").alias("__src"),
        F.col("qbin").alias("__qb"),
        "below",
        "n_src",
    )
    return (
        q.join(
            cdf,
            F.col("source").eqNullSafe(F.col("__src"))
            & F.col("qbin").eqNullSafe(F.col("__qb")),
        )
        .select("id", "source", "qbin", pr.alias("pr_e6"))
        .withColumn(
            "decile",
            F.least(F.lit(9).cast("bigint"), F.expr("pr_e6 div 100000")),
        )
    )


GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The Gopher quality-rule filter (Rae et al. 2021, "Scaling Language
    Models", appendix A1.1) as per-document flags — the standard rule set
    a web-scale curation pipeline applies before any model-based scoring:

    - word count in [min_words, max_words]
    - mean word length in [3, 10] chars
    - symbol-word ratio (``#`` / ``...``) ≤ 10%
    - < 90% of lines start with a bullet, < 30% end with an ellipsis
    - ≥ 80% of words contain an alphabetic character
    - ≥ 2 of the 8 Gopher stopwords present

    Every decision is an EXACT-INTEGER cross-multiplied comparison
    (``3·n_words ≤ total_chars ≤ 10·n_words``, ``10·n_sym ≤ n_words``,
    …) so a relational engine replays the keep bit identically; the
    reported ratios are integer-scaled (``…_e6 = (x·1e6) div n``). All
    pure-JVM array expressions over one projection — no shuffle, no
    Python. NULL text → NULL metrics, ``keep = false``.

    Returns ``(id, n_words, mean_wl_e6, alpha_frac_e6, symbol_frac_e6,
    bullet_frac_e6, ellipsis_frac_e6, n_stop, keep)``.
    """
    t = text_col
    toks = f"filter(split({t}, ' '), x -> x <> '')"
    lines = f"split({t}, '\\n')"
    nw = f"size({toks})"
    tc = f"aggregate({toks}, 0L, (a, x) -> a + length(x))"
    na = f"size(filter({toks}, x -> x rlike '[A-Za-z]'))"
    ns = f"size(filter({toks}, x -> x like '%#%' or x like '%...%'))"
    nl = f"size({lines})"
    nb = (
        f"size(filter({lines}, l -> trim(l) like '-%' or "
        f"trim(l) like '*%' or trim(l) like '•%'))"
    )
    ne = (
        f"size(filter({lines}, l -> trim(l) like '%...' or "
        f"trim(l) like '%…'))"
    )
    nstop = "(" + " + ".join(
        f"if(array_contains({toks}, '{s}'), 1, 0)" for s in GOPHER_STOPS
    ) + ")"
    keep = (
        f"coalesce({nw} >= {min_words} AND {nw} <= {max_words} "
        f"AND 3 * {nw} <= {tc} AND {tc} <= 10 * {nw} "
        f"AND 10 * {ns} <= {nw} "
        f"AND 10 * {nb} < 9 * {nl} AND 10 * {ne} < 3 * {nl} "
        f"AND 5 * {na} >= 4 * {nw} "
        f"AND {nstop} >= 2, false)"
    )
    return df.select(
        F.col(id_col),
        F.expr(f"cast({nw} as bigint)").alias("n_words"),
        F.expr(
            f"cast(if({nw} > 0, ({tc} * 1000000) div {nw}, null) as bigint)"
        ).alias("mean_wl_e6"),
        F.expr(
            f"cast(if({nw} > 0, (cast({na} as bigint) * 1000000) div {nw}, "
            "null) as bigint)"
        ).alias("alpha_frac_e6"),
        F.expr(
            f"cast(if({nw} > 0, (cast({ns} as bigint) * 1000000) div {nw}, "
            "null) as bigint)"
        ).alias("symbol_frac_e6"),
        F.expr(
            f"cast(if({nl} > 0, (cast({nb} as bigint) * 1000000) div {nl}, "
            "null) as bigint)"
        ).alias("bullet_frac_e6"),
        F.expr(
            f"cast(if({nl} > 0, (cast({ne} as bigint) * 1000000) div {nl}, "
            "null) as bigint)"
        ).alias("ellipsis_frac_e6"),
        F.expr(f"cast({nstop} as int)").alias("n_stop"),
        F.expr(keep).alias("keep"),
    )


# (threshold_pct applied as num*100 <= pct*total_chars — exact integers)
GOPHER_REP_THRESHOLDS = {
    "top": {2: 20, 3: 18, 4: 16},
    "dup": {5: 15, 6: 14, 7: 13, 8: 12, 9: 11, 10: 10},
}


def gopher_repetition_flags(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """The Gopher REPETITION filter table (Rae et al. 2021 A1.1, second
    half) — the companion of :func:`gopher_quality_flags`:

    - duplicate line / paragraph fraction ≤ 30% (occurrence-counted)
    - duplicate line / paragraph CHAR fraction ≤ 20%
    - top k-gram char fraction: 2-gram ≤ 20%, 3 ≤ 18%, 4 ≤ 16%
    - duplicated k-gram char fraction: 5..10-gram ≤ 15..10%

    Char mass is the public-implementation form (occurrences × gram
    string length, not exact span union); the "top" metric is the max
    char mass of any single k-gram — deterministic with no tie-break
    ambiguity. Every keep decision is an exact-integer cross-multiplied
    comparison (``num·100 ≤ pct·total_chars``), so the oracle replays
    the bit. NULL text → NULL metrics, ``keep = false``.

    Plan shape: every rule is PER-DOCUMENT, so nothing needs a shuffle
    at all — each gram/line/paragraph array is sorted IN-ROW and the
    duplicate and top masses are read off the sorted runs (run starts =
    positions where the sorted value changes; run ends symmetric). The
    whole 13-rule table is a chain of narrow JVM projections —
    embarrassingly parallel, zero Exchange, the shape that costs one
    corpus scan at 100 TB. (An earlier (doc, k, gram)-shuffle form
    measured 107.8 s at sf10; this projection form replaces it.)
    """
    t = text_col
    toks = f"filter(split({t}, ' '), x -> x <> '')"

    def runs(col: str) -> dict[str, str]:
        """Metric exprs over a SORTED array column ``col`` (1-based
        element_at): occurrence count / dup occurrence count / dup char
        mass via the duplicated-family indicator (equal to a neighbor in
        sort order), top char mass via run starts×ends."""
        n = f"size({col})"
        ind = (
            f"(i > 1 AND element_at({col}, i) = element_at({col}, i - 1)) "
            f"OR (i < {n} AND element_at({col}, i) = element_at({col}, i + 1))"
        )
        agg = (
            f"CASE WHEN {n} > 0 THEN aggregate(sequence(1, {n}), 0L, "
            "(a, i) -> a + IF({ind}, {w}, 0L)) ELSE 0L END"
        )
        starts = (
            f"CASE WHEN {n} > 0 THEN filter(sequence(1, {n}), "
            f"i -> i = 1 OR element_at({col}, i) != element_at({col}, i - 1)) "
            "ELSE CAST(array() AS array<int>) END"
        )
        ends = (
            f"CASE WHEN {n} > 0 THEN filter(sequence(1, {n}), "
            f"i -> i = {n} OR element_at({col}, i) != element_at({col}, i + 1)) "
            "ELSE CAST(array() AS array<int>) END"
        )
        top = (
            f"coalesce(array_max(zip_with({starts}, {ends}, "
            f"(s, e) -> cast(e - s + 1 as bigint) "
            f"* length(element_at({col}, s)))), 0L)"
        )
        return {
            "n": f"cast({n} as bigint)",
            "dup_cnt": agg.format(ind=ind, w="1L"),
            "dup_mass": agg.format(
                ind=ind, w=f"cast(length(element_at({col}, i)) as bigint)"
            ),
            "top_mass": top,
        }

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(t)).cast("bigint").alias("total_chars"),
        F.expr(toks).alias("__t"),
        F.expr(f"array_sort(filter(split({t}, '\\n'), x -> x <> ''))").alias(
            "__ln"
        ),
        F.expr(
            f"array_sort(filter(split({t}, '\\n\\n'), x -> x <> ''))"
        ).alias("__pg"),
    )
    sizes = sorted({*GOPHER_REP_THRESHOLDS["top"], *GOPHER_REP_THRESHOLDS["dup"]})
    sorted_cols = {
        k: F.expr(
            f"CASE WHEN size(__t) >= {k} THEN array_sort(transform("
            f"sequence(1, size(__t) - {k} + 1), "
            f"i -> array_join(slice(__t, i, {k}), ' '))) "
            "ELSE CAST(array() AS array<string>) END"
        ).alias(f"__s{k}")
        for k in sizes
    }
    staged = base.select("doc_id", "total_chars", "__ln", "__pg", *sorted_cols.values())

    metric_cols = [F.col("doc_id"), F.col("total_chars")]
    conds = []
    tc = "total_chars"
    for arr, prefix, pct_cnt in (("__ln", "ln", 30), ("__pg", "pg", 30)):
        r = runs(arr)
        metric_cols.append(
            F.expr(
                f"cast(if({r['n']} > 0, ({r['dup_cnt']} * 1000000) div {r['n']}, "
                "null) as bigint)"
            ).alias(f"{prefix}_dup_frac_e6")
        )
        metric_cols.append(
            F.expr(
                f"cast(if({tc} > 0, ({r['dup_mass']} * 1000000) div {tc}, "
                "null) as bigint)"
            ).alias(f"{prefix}_dupchar_frac_e6")
        )
        conds.append(F.expr(f"{r['dup_cnt']} * 100 <= {pct_cnt} * {r['n']}"))
        conds.append(F.expr(f"{r['dup_mass']} * 100 <= 20 * {tc}"))
    for kind, table in GOPHER_REP_THRESHOLDS.items():
        for k, pct in table.items():
            r = runs(f"__s{k}")
            num = r["top_mass"] if kind == "top" else r["dup_mass"]
            metric_cols.append(
                F.expr(
                    f"cast(if({tc} > 0, ({num} * 1000000) div {tc}, null) "
                    "as bigint)"
                ).alias(f"{kind}{k}_char_frac_e6")
            )
            conds.append(F.expr(f"{num} * 100 <= {pct} * {tc}"))
    keep = conds[0]
    for c in conds[1:]:
        keep = keep & c
    metric_cols.append(
        F.coalesce(keep & F.col(tc).isNotNull(), F.lit(False)).alias("keep")
    )
    # metric order must match the original (oracle column set unchanged):
    # ln_dup, pg_dup fracs first, then dupchar fracs, then gram fracs —
    # the driver compare sorts by name, so only the NAME SET matters
    return staged.select(*metric_cols)


def gopher_repetition_sql(relation: str = "documents") -> str:
    """DuckDB mirror of :func:`gopher_repetition_flags`, generated from
    the same ``GOPHER_REP_THRESHOLDS`` table so the engines cannot
    drift."""
    sizes = sorted({*GOPHER_REP_THRESHOLDS["top"], *GOPHER_REP_THRESHOLDS["dup"]})
    ks = ", ".join(f"({k})" for k in sizes)
    top_cols = ",\n                 ".join(
        f"max(CASE WHEN k = {k} THEN topnum END) AS top{k}_num"
        for k in GOPHER_REP_THRESHOLDS["top"]
    )
    dup_cols = ",\n                 ".join(
        f"max(CASE WHEN k = {k} THEN dupnum END) AS dup{k}_num"
        for k in GOPHER_REP_THRESHOLDS["dup"]
    )
    frac = []
    conds = []
    for prefix, den, pct in (("ln_dup", "ln_n", 30), ("pg_dup", "pg_n", 30)):
        frac.append(
            f"CAST(CASE WHEN COALESCE({den}, 0) > 0 THEN "
            f"(COALESCE({prefix}, 0) * 1000000) // {den} END AS BIGINT) "
            f"AS {prefix}_frac_e6"
        )
        conds.append(f"COALESCE({prefix}, 0) * 100 <= {pct} * COALESCE({den}, 0)")
    for prefix in ("ln_dupchar", "pg_dupchar"):
        frac.append(
            f"CAST(CASE WHEN total_chars > 0 THEN "
            f"(COALESCE({prefix}, 0) * 1000000) // total_chars END AS BIGINT) "
            f"AS {prefix}_frac_e6"
        )
        conds.append(f"COALESCE({prefix}, 0) * 100 <= 20 * total_chars")
    for kind, table in GOPHER_REP_THRESHOLDS.items():
        for k, pct in table.items():
            col = f"{kind}{k}_num"
            frac.append(
                f"CAST(CASE WHEN total_chars > 0 THEN "
                f"(COALESCE({col}, 0) * 1000000) // total_chars END AS BIGINT) "
                f"AS {kind}{k}_char_frac_e6"
            )
            conds.append(f"COALESCE({col}, 0) * 100 <= {pct} * total_chars")
    keep = " AND ".join(conds)
    frac_sql = ",\n               ".join(frac)
    return f"""
        WITH base AS MATERIALIZED (
          SELECT doc_id, CAST(length(text) AS BIGINT) AS total_chars,
                 list_filter(string_split(text, ' '), x -> x <> '') AS t,
                 list_filter(string_split(text, chr(10)), x -> x <> '') AS lna,
                 list_filter(string_split(text, chr(10) || chr(10)),
                             x -> x <> '') AS pga
          FROM {relation}),
        ks(k) AS (VALUES {ks}),
        occ AS (
          SELECT b.doc_id, ks.k,
                 array_to_string(b.t[u.i:u.i + ks.k - 1], ' ') AS g
          FROM base b, ks,
               UNNEST(generate_series(1, greatest(len(b.t) - ks.k + 1, 0)))
                 AS u(i)),
        per AS (
          SELECT doc_id, k, g, count(*) AS c FROM occ GROUP BY doc_id, k, g),
        byk AS (
          SELECT doc_id, k,
                 CAST(max(c * length(g)) AS BIGINT) AS topnum,
                 CAST(COALESCE(SUM(CASE WHEN c >= 2 THEN c * length(g) END),
                               0) AS BIGINT) AS dupnum
          FROM per GROUP BY doc_id, k),
        gr AS (
          SELECT doc_id,
                 {top_cols},
                 {dup_cols}
          FROM byk GROUP BY doc_id),
        lnagg AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS ln_n,
                 CAST(COALESCE(sum(CASE WHEN c >= 2 THEN c END), 0)
                      AS BIGINT) AS ln_dup,
                 CAST(COALESCE(sum(CASE WHEN c >= 2 THEN c * length(u) END),
                               0) AS BIGINT) AS ln_dupchar
          FROM (SELECT doc_id, u, count(*) AS c
                FROM (SELECT doc_id, unnest(lna) AS u FROM base) q
                GROUP BY doc_id, u) q2
          GROUP BY doc_id),
        pgagg AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS pg_n,
                 CAST(COALESCE(sum(CASE WHEN c >= 2 THEN c END), 0)
                      AS BIGINT) AS pg_dup,
                 CAST(COALESCE(sum(CASE WHEN c >= 2 THEN c * length(u) END),
                               0) AS BIGINT) AS pg_dupchar
          FROM (SELECT doc_id, u, count(*) AS c
                FROM (SELECT doc_id, unnest(pga) AS u FROM base) q
                GROUP BY doc_id, u) q2
          GROUP BY doc_id)
        SELECT b.doc_id, b.total_chars,
               {frac_sql},
               COALESCE(({keep}) AND b.total_chars IS NOT NULL, false) AS keep
        FROM base b
        LEFT JOIN gr USING (doc_id)
        LEFT JOIN lnagg USING (doc_id)
        LEFT JOIN pgagg USING (doc_id)
    """


def c4_quality_flags(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020 §2.2) as per-document
    flags — the third member of the classic rule-filter triad next to
    :func:`gopher_quality_flags` / :func:`gopher_repetition_flags`:

    - a line is RETAINED iff it ends in terminal punctuation
      (``. ! ? "``), has ≥ 3 words, and does not mention "javascript"
      (case-insensitive);
    - the page is dropped if it contains "lorem ipsum" (case-
      insensitive) or a curly brace, or has fewer than 5 sentences
      (terminal-punctuation marks counted over the text) or no retained
      line.

    Exact-integer / exact-string decisions only (ASCII patterns, so
    lowercasing is engine-identical); one pure-JVM projection, no
    shuffle. NULL text → NULL metrics, ``keep = false``.

    Returns ``(id, n_lines, n_kept_lines, kept_line_frac_e6,
    n_sentences, has_lorem, has_brace, keep)``.
    """
    t = text_col
    lines = f"filter(split({t}, '\\n'), x -> x <> '')"
    lkeep = (
        f"filter({lines}, l -> trim(l) rlike '[.!?\"]$' "
        "AND size(filter(split(l, ' '), x -> x <> '')) >= 3 "
        "AND NOT lower(l) like '%javascript%')"
    )
    nl = f"size({lines})"
    nk = f"size({lkeep})"
    nsent = (
        f"length(regexp_replace({t}, '[^.!?]', ''))"
    )
    lorem = f"lower({t}) like '%lorem ipsum%'"
    brace = f"{t} like '%{{%'"
    return df.select(
        F.col(id_col),
        F.expr(f"cast({nl} as bigint)").alias("n_lines"),
        F.expr(f"cast({nk} as bigint)").alias("n_kept_lines"),
        F.expr(
            f"cast(if({nl} > 0, (cast({nk} as bigint) * 1000000) div {nl}, "
            "null) as bigint)"
        ).alias("kept_line_frac_e6"),
        F.expr(f"cast({nsent} as bigint)").alias("n_sentences"),
        F.expr(lorem).alias("has_lorem"),
        F.expr(brace).alias("has_brace"),
        F.expr(
            f"coalesce(NOT ({lorem}) AND NOT ({brace}) "
            f"AND {nsent} >= 5 AND {nk} >= 1, false)"
        ).alias("keep"),
    )
