"""Text-analysis operators for LLM training-data pipelines.

All hot paths are built-in JVM expressions (split/regexp/length/md5) —
no Python in the row path, so whole-stage codegen applies and the same
code scans 100 TB of documents with nothing but a parquet scan + one
optional aggregation shuffle. Per SURVEY.md section 2b these are the
``q_text_*`` / ``q_token_count`` / ``q_text_fingerprint`` rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish tokenizer regex: alpha runs, digit runs, or single non-space
# symbols — a deterministic stand-in for a subword tokenizer's pre-split.
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"

# Tiny per-language marker lexicons for the n-gram/keyword heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "with", "for"],
    "de": ["der", "und", "nicht", "das"],
    "fr": ["le", "et", "pas", "les"],
    "es": ["el", "que", "los", "por"],
    "zh": ["de5", "shi4", "bu4", "le5"],
}


def word_tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count_regex(text: Column) -> Column:
    """Token count under the BPE-ish regex pre-split."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0)))


def text_stats(documents: DataFrame) -> DataFrame:
    """Corpus stats per language: docs, whitespace tokens, chars."""
    return (
        documents.select(
            "lang",
            F.size(word_tokens(F.col("text"))).alias("n_tok"),
            F.length("text").alias("n_ch"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.round(F.avg("n_ch"), 4).alias("avg_chars"),
            F.max("n_ch").alias("max_chars"),
        )
    )


def _marker_score(text: Column, markers: list[str]) -> Column:
    """Occurrences of the language's marker words in the text.

    Non-overlapping left-to-right regexp count on space-padded text —
    the same semantics DuckDB's regexp_extract_all applies in the
    oracle, so both sides agree on strings like "the and" where the
    first match consumes the shared delimiter space.
    """
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    pattern = "|".join(f" {w} " for w in markers)
    return F.regexp_count(padded, F.lit(pattern))


def language_id(documents: DataFrame) -> DataFrame:
    """Keyword-marker language ID: argmax of per-language marker hits,
    ties (and zero evidence) resolve to 'en'. Deterministic, pure
    expression — mirrors an n-gram scorer's shape without a model."""
    scored = documents.select(
        "doc_id",
        "lang",
        *[
            _marker_score(F.col("text"), ws).alias(f"score_{lang}")
            for lang, ws in LANG_MARKERS.items()
        ],
    )
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("en")
    # First language (in fixed order) achieving the max wins; 0 -> 'en'.
    for lang in reversed(langs):
        pred = F.when(F.col(f"score_{lang}") == best, lang).otherwise(pred)
    pred = F.when(best == 0, "en").otherwise(pred)
    return scored.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("correct"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Heuristic quality scoring: length, alpha ratio, mean token length,
    stopword ratio — the standard cheap pre-filters for LLM corpora."""
    toks = F.size(word_tokens(F.col("text")))
    alpha = F.length(F.regexp_replace("text", "[^a-z]", ""))
    stop_hits = _marker_score(F.col("text"), LANG_MARKERS["en"])
    return documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        toks.alias("n_tokens"),
        (F.length("text").cast("double") / toks).alias("chars_per_token"),
        (alpha.cast("double") / F.length("text")).alias("alpha_ratio"),
        stop_hits.cast("int").alias("en_stopword_hits"),
        F.when((toks >= 20) & (alpha.cast("double") / F.length("text") > 0.7), "keep")
        .when(toks >= 5, "review")
        .otherwise("drop")
        .alias("quality_bucket"),
    )


ROLLHASH_BASE = 31
ROLLHASH_MOD = 2**32


def _word_hash(w: Column) -> Column:
    """Cross-engine word hash — the shared house md5 int
    (operators/prep.py::md5_int32)."""
    from kafka_s3_etl_spark.operators.prep import md5_int32

    return md5_int32(w)


def rolling_hash(documents: DataFrame) -> DataFrame:
    """Karp-Rabin rolling fingerprint over the word sequence:
    h = fold(h * B + hash(word) mod 2^32). Order-sensitive (unlike a
    bag-of-words md5), so reordered near-dups get different prints.
    Pure JVM fold via ``aggregate`` — intermediate values stay < 2^37,
    safely inside bigint under ANSI overflow checking."""
    rolled = F.aggregate(
        F.transform(F.split(F.col("text"), " "), _word_hash),
        F.lit(0).cast("bigint"),
        lambda acc, x: F.pmod(acc * ROLLHASH_BASE + x, F.lit(ROLLHASH_MOD)),
    )
    return documents.select("doc_id", rolled.alias("roll_fp"))


# The corpus stopword set for the cleaning op (both present in the
# synthetic vocabulary, so the transform is observable in tests).
STOPWORDS = ("a", "the")

# n-gram width for the repetition heuristic (Gopher uses 2..4-gram dup
# fractions; 3 matches the shingle width used elsewhere).
SHINGLE_FOR_REP = 3


def vocab_topk(documents: DataFrame, top_n: int = 100) -> DataFrame:
    """Vocabulary construction: the ``top_n`` most frequent whitespace
    tokens with their occurrence and document frequencies — the counting
    pass a BPE/unigram tokenizer trainer runs first.

    Scale shape: explode + count is one map-side-combined aggregation
    over the corpus; the counts table is vocabulary-sized (millions of
    rows at 100 TB, not corpus-sized), and the top-N is
    ``orderBy().limit()`` — Spark plans TakeOrdered, a per-partition
    heap + driver merge, never a global sort. Only the final rank
    window runs single-partition, over exactly ``top_n`` rows."""
    from pyspark.sql.window import Window

    toks = documents.select(
        "doc_id", F.explode(word_tokens(F.col("text"))).alias("token")
    )
    counts = toks.groupBy("token").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    top = counts.orderBy(F.col("n_occurrences").desc(), "token").limit(top_n)
    w = Window.orderBy(F.col("n_occurrences").desc(), "token")
    return top.withColumn("rnk", F.row_number().over(w).cast("int"))


def remove_stopwords(documents: DataFrame) -> DataFrame:
    """Stopword-removal cleaning pass: per document, the token counts
    before/after and the cleaned text. Pure per-row expressions (array
    filter + join) — no shuffle, scans the corpus once at any scale."""
    toks = word_tokens(F.col("text"))
    kept = F.filter(toks, lambda w: ~w.isin(*STOPWORDS))
    return documents.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(kept).cast("int").alias("n_kept"),
        F.array_join(kept, " ").alias("clean_text"),
    )


def gram_array_over_w(n: int = SHINGLE_FOR_REP) -> Column:
    """Word n-gram array computed from a PRE-SPLIT token column ``w``.

    The tokens MUST come from a projected column, never ``split(text)``
    inlined in the lambda: an inlined split re-tokenizes the whole text
    once per gram index — O(words^2) per document (measured 30x slower
    on the sf0.1 corpus). Guarded so short docs yield an empty array
    (Spark's sequence(0, -1) counts DOWN, unlike DuckDB's empty range).
    """
    return F.expr(
        f"if(size(w) >= {n}, "
        f"transform(sequence(0, size(w) - {n}), i -> "
        f"concat_ws(' ', slice(w, i + 1, {n}))), "
        f"array())"
    )


def repetition_score(documents: DataFrame, n: int = SHINGLE_FOR_REP) -> DataFrame:
    """Gopher-style repetition heuristic: the fraction of duplicated
    word n-grams per document (1 - distinct/total). Boilerplate and
    degenerate generations repeat n-grams; natural prose mostly doesn't.

    Shape: explode grams once -> ONE aggregation with count +
    count(distinct hash), map-side combined. The tempting pure-row
    alternative (size(grams) / size(array_distinct(grams)) in a
    projection) evaluates the interpreted gram-transform once PER
    REFERENCE — and any pre-projected token/gram column gets re-inlined
    by CollapseProject — measured ~9s vs ~0.6s at sf0.1. Grams shuffle
    as 8-byte hashes, never strings; docs shorter than ``n`` words have
    no gram rows and re-enter via the left join with ratio 0.
    """
    toks = documents.select("doc_id", word_tokens(F.col("text")).alias("w")).filter(
        F.size("w") >= 1
    )
    grams = toks.filter(F.size("w") >= n).select(
        "doc_id",
        F.explode(gram_array_over_w(n)).alias("g"),
    )
    counted = grams.select("doc_id", F.xxhash64("g").alias("h")).groupBy(
        "doc_id"
    ).agg(
        F.count("*").cast("int").alias("n_grams"),
        F.countDistinct("h").cast("int").alias("n_distinct"),
    )
    ratio = F.when(
        F.col("n_grams") > 0,
        1.0 - F.col("n_distinct").cast("double") / F.col("n_grams").cast("double"),
    ).otherwise(0.0)
    return (
        toks.select("doc_id")
        .join(counted, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_distinct",
            ratio.alias("dup_ratio"),
            (ratio > 0.2).alias("repetitive"),
        )
    )


CHUNK_TOKENS = 32


def chunk_windows(documents: DataFrame, chunk_size: int = CHUNK_TOKENS) -> DataFrame:
    """Context-window chunking: split each document's token sequence
    into fixed-size windows with document-relative indexes — the
    shaping pass that feeds fixed-context LM pretraining. The explode
    is the only fan-out (sum of chunks = corpus token count / size);
    no shuffle, chunk assembly is per-row."""
    w = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(w) / F.lit(float(chunk_size))).cast("int")
    chunked = (
        documents.filter(F.size(w) >= 1)
        .select("doc_id", w.alias("w"), n_chunks.alias("nc"))
        .select(
            "doc_id",
            "w",
            F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("chunk_idx"),
        )
    )
    piece = F.slice(F.col("w"), F.col("chunk_idx") * chunk_size + 1, chunk_size)
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(piece).cast("int").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (content-defined identity for exact-dup detection across formats)."""
    normalized = F.regexp_replace(F.lower(F.col("text")), "\\s+", " ")
    return documents.select(
        "doc_id",
        F.md5(normalized).alias("fp"),
        token_count_regex(F.col("text")).cast("int").alias("n_bpe_tokens"),
    )


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(documents: DataFrame, query_terms: list[str]) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed term set —
    the retrieval-quality filter of a training-data pipeline (and the
    scoring half of BM25 decontamination against an eval benchmark).

    Built on the exact-integer sparse matrix of ``q_term_doc_stats``
    (tf, df, doc_len are exact counts; the float weighting happens once
    per (doc, matched term)). idf uses the +1 variant
    (ln(1 + (N-df+0.5)/(df+0.5))) so scores stay positive for terms in
    more than half the corpus. Corpus constants (N, avgdl) arrive via a
    1-row broadcast cross join, never a driver round-trip.

    Scale shape: the explode feeds ONE map-side-combined tf aggregation
    filtered to the query terms — candidate rows are |terms| * |docs
    containing them|, not the corpus token count; df is an aggregation
    of THAT small set. The per-doc score sum is rounded (aggregate-only
    rounding rule) so summation order can't flip a value hash.

    Returns (doc_id, matched_terms, round(score, 4) as bm25).
    """
    toks = documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    # doc_len is a per-row expression (size == exploded count), NOT a
    # second explode + aggregation shuffle over the whole corpus.
    dl = documents.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("doc_len")
    )
    consts = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("doc_len") / F.count("*")).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("token").isin(query_terms))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf")
        + BM25_K1
        * (1 - BM25_B + BM25_B * F.col("doc_len") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(consts))
        .select("doc_id", (idf * tf_part).alias("term_score"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("matched_terms"),
            F.round(F.sum("term_score"), 4).alias("bm25"),
        )
    )


def lm_quality_score(documents: DataFrame) -> DataFrame:
    """CCNet-style unigram-LM quality score: per document the average
    token log-probability under the corpus's own unigram distribution
    (low scores = rare-token-heavy / off-distribution documents — the
    classic perplexity filter for training-data curation).

    Hash-exact across engines despite the floats: ln() is computed ONCE
    per distinct vocabulary word (not per occurrence) and immediately
    quantized to integer micro-nats; per-document totals then accumulate
    in exact BIGINT (count x quantized-logprob) and divide once at the
    end — summation order cannot perturb the result. The only float
    hazard left is a quantization boundary landing within 1 ulp of a
    cross-engine ln() difference (~1e-10 per vocab word).

    Scale shape: two aggregations on (token) and (doc_id, token) with
    map-side combine, a join on token (vocab-sized side — Spark picks
    broadcast at small scale, shuffle at corpus scale), and a final
    doc-keyed aggregation. No Python, no collect, no window.
    """
    toks = documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").alias("t"))
    lpq = vocab.crossJoin(F.broadcast(total)).select(
        "token",
        F.expr(
            "CAST(ROUND(ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000)"
            " AS BIGINT)"
        ).alias("lpq"),
    )
    doc_tok = toks.groupBy("doc_id", "token").agg(F.count("*").alias("ndt"))
    return (
        doc_tok.join(lpq, "token")
        .groupBy("doc_id")
        .agg(
            F.sum("ndt").cast("bigint").alias("n_tokens"),
            F.sum(F.expr("ndt * lpq")).alias("s"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr("CAST(s AS DOUBLE) / 1e6 / CAST(n_tokens AS DOUBLE)").alias(
                "avg_logprob"
            ),
        )
    )


BPE_MERGES = [
    ("table", "hash"),
    ("part", "filter"),
    ("customer", "join"),
    ("merge", "group"),
    ("slow", "key"),
    ("big", "order"),
]


def bpe_encode(
    documents, merges: list[tuple[str, str]] = BPE_MERGES
):
    """Apply a FIXED ordered BPE merge list to every document — the
    ENCODE step a trained tokenizer performs (q_bpe_merges mines the
    merge table; this applies it; fertility/OOV analyze the result).
    Each merge rewrites every non-overlapping occurrence of 'a b' to
    'ab' left-to-right via one JVM regexp_replace, chained in merge
    order — the exact greedy semantics of BPE application at the word
    level, whole-stage codegen'd, no Python. Java and RE2 agree on
    literal-word \\b patterns and global left-to-right replacement, so
    the encoded STRINGS are engine-exact and hash-gateable.

    Merge tokens must be regex-safe (alphanumeric — asserted); the
    pinned default list is the top adjacent pairs of the corpus (the
    shipped-tokenizer shape: trained once, applied to any corpus).

    Returns (doc_id, n_tokens, n_bpe_tokens, enc_text).
    """
    from pyspark.sql import functions as F

    for a, b in merges:
        if not (a.isalnum() and b.isalnum()):
            raise ValueError(f"merge tokens must be alphanumeric: {a!r},{b!r}")
    col = F.col("text")
    for a, b in merges:
        col = F.regexp_replace(col, rf"\b{a} {b}\b", a + b)
    return documents.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.size(F.split(col, " ")).cast("bigint").alias("n_bpe_tokens"),
        col.alias("enc_text"),
    )


# ------------------------------------------------ winnowing (batch 49)


def winnow_selected(
    documents: DataFrame, k: int = 4, w: int = 4
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    SIGMOD '03 — the MOSS sketch): md5 hashes of the k-token grams, the
    leftmost-minimal ``(hash, pos)`` of every window of ``w``
    consecutive grams is selected. Guarantee: any run of ``w + k - 1``
    tokens shared by two documents yields at least one shared
    fingerprint, at ~``1/w`` storage density.

    Returns distinct ``(doc_id, n_grams, sg, sp)`` selections. Single
    corpus scan, single doc_id exchange: the gram window, the
    doc-length count, and the winnow frame-min all ride the same
    partitioning, and the gram md5 is projected once before the
    frame-min (never recomputed per frame)."""
    from pyspark.sql.window import Window

    toks = documents.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", j).over(wd).alias(f"t{j}") for j in range(1, k)]
    grams = (
        toks.select("doc_id", "pos", "tok", *leads)
        .filter(F.col(f"t{k - 1}").isNotNull())
        .select(
            "doc_id",
            "pos",
            F.md5(
                F.concat_ws(" ", "tok", *[f"t{j}" for j in range(1, k)])
            ).alias("g"),
        )
    )
    wf = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    win = grams.select(
        "doc_id",
        F.count("*").over(Window.partitionBy("doc_id")).alias("n_grams"),
        F.min(F.struct("g", "pos")).over(wf).alias("sel"),
        F.count("*").over(wf).alias("cnt"),
    )
    return (
        win.filter(F.col("cnt") == w)
        .select(
            "doc_id",
            "n_grams",
            F.col("sel.g").alias("sg"),
            F.col("sel.pos").alias("sp"),
        )
        .distinct()
    )


def winnow_fingerprints(
    documents: DataFrame, k: int = 4, w: int = 4
) -> DataFrame:
    """Per-document winnowing summary over :func:`winnow_selected`:
    counts plus an order-canonical md5 digest of the distinct selected
    fingerprint SET (sorted concat), so a value hash over the output
    pins the exact selection."""
    return (
        winnow_selected(documents, k=k, w=w)
        .groupBy("doc_id")
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.count("*").alias("n_selected"),
            F.countDistinct("sg").alias("n_distinct_fp"),
            F.md5(
                F.concat_ws("", F.sort_array(F.collect_set("sg")))
            ).alias("fp_digest"),
        )
        .select(
            "doc_id", "n_grams", "n_selected", "n_distinct_fp", "fp_digest"
        )
    )


# ------------------------------------- content-defined chunking (batch 50)


def cdc_chunks(
    documents: DataFrame, k: int = 4, threshold: str = "20000000"
) -> DataFrame:
    """Content-defined chunking at token granularity (the LBFS/restic
    rolling-hash boundary rule): a chunk boundary falls AFTER any
    position whose k-token context md5 sorts below ``threshold`` (a
    fixed-width hex prefix; '20000000' cuts ~1/8 of positions). Because
    the boundary test looks only at a local context window, an
    insertion re-chunks just its neighborhood — chunk identity
    survives shifts, the property that makes CDC dedup work (property-
    tested in tests/test_llm_ops.py).

    Returns (doc_id, chunk_id, chunk_g = md5 of the chunk text,
    tok_len). Single corpus scan, one doc_id exchange for the
    boundary-flag and prefix-sum windows, one map-side-combined chunk
    rebuild."""
    from pyspark.sql.window import Window

    toks = documents.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    lags = [F.lag("tok", j).over(wd).alias(f"l{j}") for j in range(1, k)]
    ctx = toks.select("doc_id", "pos", "tok", *lags).select(
        "doc_id",
        "pos",
        "tok",
        F.when(
            F.col(f"l{k - 1}").isNotNull()
            & (
                F.md5(
                    F.concat_ws(
                        " ", *[f"l{j}" for j in range(k - 1, 0, -1)], "tok"
                    )
                )
                < threshold
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("cut"),
    )
    wprev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ch = ctx.select(
        "doc_id",
        "pos",
        "tok",
        F.coalesce(F.sum("cut").over(wprev), F.lit(0)).alias("chunk_id"),
    )
    return ch.groupBy("doc_id", "chunk_id").agg(
        F.md5(
            F.expr(
                "concat_ws(' ', transform(array_sort(collect_list("
                "struct(pos, tok))), s -> s.tok))"
            )
        ).alias("chunk_g"),
        F.count("*").alias("tok_len"),
    )
