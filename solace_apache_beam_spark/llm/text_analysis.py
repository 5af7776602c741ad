"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting. All built-in array/string expressions
(map-side, codegen'd, zero shuffle) — at 100 TB these run at scan speed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solace_apache_beam_spark.functions.caching import attach_plan_caches
from solace_apache_beam_spark.functions.hashing import h32, h64, words_expr
from solace_apache_beam_spark.functions.partitioning import (
    TOKENIZE_SPREAD_MIN_BYTES,
    spread_scan,
)

# Minimal per-language stopword profiles for the n-gram/stopword
# heuristic language id (public common stopwords).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "un", "que", "pour", "dans", "est", "les"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
    "zh": ["de", "shi", "bu", "le", "zai", "you", "wo", "ta", "men", "zhe"],
}

FINGERPRINT_MASK = (1 << 57) - 1  # 31*h + w stays < 2^63 under this mask


def _stop_score(words, lang: str):
    lst = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.when(F.array_contains(lst, w), 1).otherwise(0),
    )


def _lang_scores_udf():
    """Arrow kernel: word array -> struct of per-language stopword hit
    counts, ALL languages in one token pass (a dict lookup per token
    against the 50-entry stopword->languages table). Replaces five
    interpreted aggregate-HOFs that each rescanned every token against
    a 10-element array_contains — same integer counts (exact), one
    evaluation of the tokenizing split instead of five, ~L x 10 fewer
    comparisons per token. NULL words (NULL text) -> NULL scores — the
    same NULL-propagation the interpreted aggregate had and the oracle
    pins with CASE WHEN words IS NULL THEN NULL (the documents
    randomized differential enforces this corner); an EMPTY word array
    scores 0 on both engines."""
    from pyspark.sql.functions import pandas_udf

    langs = list(STOPWORDS)
    lut: dict[str, tuple[int, ...]] = {}
    for i, lg in enumerate(langs):
        for w in STOPWORDS[lg]:
            lut[w] = lut.get(w, ()) + (i,)
    fields = ", ".join(f"score_{lg}: bigint" for lg in langs)

    @pandas_udf(f"struct<{fields}>")
    def scores(words: pd.Series) -> pd.DataFrame:
        n_l = len(langs)
        get = lut.get
        rows = []
        for ws in words:
            if ws is None:
                rows.append([None] * n_l)
                continue
            c = [0] * n_l
            for w in ws:
                hit = get(w)
                if hit is not None:
                    for i in hit:
                        c[i] += 1
            rows.append(c)
        return pd.DataFrame(
            {
                f"score_{lg}": pd.array(
                    [r[i] for r in rows], dtype="Int64"
                )
                for i, lg in enumerate(langs)
            }
        )

    return scores


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language id: per-language hit count over tokens,
    argmax with lexicographic tiebreak. Output: (id, score_<lang>...,
    predicted_lang). Scores come from ONE Arrow token pass (see
    _lang_scores_udf); the argmax stays a JVM expression over them."""
    words = words_expr(text_col)
    scored = df.select(
        F.col(id_col), _lang_scores_udf()(words).alias("_sc")
    ).select(
        F.col(id_col),
        *[F.col(f"_sc.score_{lg}").alias(f"score_{lg}") for lg in STOPWORDS],
    )
    # argmax by score desc, then lang asc (deterministic)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in STOPWORDS])
    pred = F.coalesce(
        *[
            F.when(F.col(f"score_{lg}") == best, F.lit(lg))
            for lg in sorted(STOPWORDS)
        ]
    )
    return scored.withColumn("predicted_lang", pred)


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Heuristic quality features + combined score: length, word count,
    mean word length, punctuation/digit/stopword ratios. Ratios are
    int/int divisions and the score is a fixed expression tree — exact
    across engines. ``extra_cols`` pass through untouched (e.g. a
    source column for per-source gating)."""
    words = words_expr(text_col)
    n_chars = F.length(F.col(text_col)).cast("long")
    n_words = F.size(words).cast("long")
    n_punct = (
        n_chars
        - F.length(F.regexp_replace(F.col(text_col), r"[\p{Punct}]", "")).cast("long")
    )
    n_digits = (
        n_chars - F.length(F.regexp_replace(F.col(text_col), r"[0-9]", "")).cast("long")
    )
    n_stop = _stop_score(words, "en")
    out = df.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        n_punct.alias("n_punct"),
        n_digits.alias("n_digits"),
        n_stop.alias("n_stopwords"),
    )
    safe_words = F.greatest(F.col("n_words"), F.lit(1))
    safe_chars = F.greatest(F.col("n_chars"), F.lit(1))
    return (
        out.withColumn(
            "avg_word_len",
            (F.col("n_chars") - (F.col("n_words") - 1)).cast("double") / safe_words,
        )
        .withColumn("punct_ratio", F.col("n_punct").cast("double") / safe_chars)
        .withColumn("digit_ratio", F.col("n_digits").cast("double") / safe_chars)
        .withColumn("stopword_ratio", F.col("n_stopwords").cast("double") / safe_words)
        .withColumn(
            "quality",
            F.lit(0.4) * F.col("stopword_ratio")
            + F.lit(0.3) * (F.lit(1.0) - F.col("punct_ratio"))
            + F.lit(0.3) * (F.lit(1.0) - F.col("digit_ratio")),
        )
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish regex tokens
    (letter-runs / digit-runs / single other), and a subword estimate
    (ceil(len/4) per word — the ~4-chars-per-token rule of thumb)."""
    words = words_expr(text_col)
    bpe_pattern = r"[\p{L}]+|[0-9]+|[^\s\p{L}0-9]"
    return df.select(
        F.col(id_col),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long").alias("n_ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(bpe_pattern)).cast("long").alias("n_bpe_tokens"),
        F.aggregate(
            words,
            F.lit(0).cast("long"),
            lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("long"),
        ).alias("n_subword_est"),
    )


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive document fingerprint: polynomial rolling hash
    fold h = (h*31 + hash(word)) & (2^57-1) over the word sequence.

    Arrow UDF computes the fold in Python integers — bit-identical to
    the oracle's sequential list_reduce because the mask is a power-of-
    two modulus (the fold is exactly sum(h_i * 31^(n-i)) mod 2^57,
    association-free), and ~10x faster than the interpreted
    aggregate-HOF + per-element md5 expression it replaces."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def fp(words: pd.Series) -> pd.Series:
        md5 = hashlib.md5
        from_bytes = int.from_bytes
        # per-batch token memo (Zipfian repeats); digest()[:4] big-endian
        # == int(hexdigest()[:8], 16) — identical hash values, no hex
        # round-trip
        memo: dict[str, int] = {}
        out = []
        for ws in words:
            if ws is None:
                # NULL text -> NULL fingerprint: absent content has no
                # measurement (0 is the VALID fingerprint of EMPTY
                # content — claiming it for absent content would alias
                # the two); same principle as multimodal's None-payload
                # -> no features. The randomized documents differential
                # caught the previous behavior: a crash (TypeError on
                # the None array) — the poison-record class again.
                out.append(None)
                continue
            acc = 0
            for w in ws:
                h = memo.get(w)
                if h is None:
                    h = from_bytes(md5(w.encode("utf-8")).digest()[:4], "big")
                    memo[w] = h
                acc = (acc * 31 + h) & FINGERPRINT_MASK
            out.append(acc)
        return pd.Series(out, dtype="Int64")

    words = words_expr(text_col)
    return df.select(F.col(id_col), fp(words).alias("fingerprint"))


EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"


def normalize_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Canonical text normalization for dedup/training prep: lowercase,
    strip everything but letters/digits/spaces, collapse whitespace.
    Pure codegen'd string expressions — map-side at any scale."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^\p{L}\p{N} ]", " "),
            r"  +",
            " ",
        )
    )
    return df.select(F.col(id_col), norm.alias("normalized"))


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrub (training-data hygiene): emails then phone-shaped
    number groups replaced with typed placeholders, with match counts
    for audit. Order matters (emails first — a phone regex must not eat
    an address's digits); both engines apply the same order."""
    emails_out = F.regexp_replace(F.col(text_col), EMAIL_PATTERN, "<EMAIL>")
    redacted = F.regexp_replace(emails_out, PHONE_PATTERN, "<PHONE>")
    return df.select(
        F.col(id_col),
        redacted.alias("redacted"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(EMAIL_PATTERN), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(emails_out, F.lit(PHONE_PATTERN), 0))
        .cast("long")
        .alias("n_phones"),
    )


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_budget: int = 512,
) -> DataFrame:
    """Sequence packing for training export: greedy first-fit of
    documents into fixed-token-budget bins, per partition (mapInPandas —
    packing is inherently sequential, so the sequence is scoped to a
    partition and bins are keyed (partition, local_bin) for global
    uniqueness; no cross-partition coordination or driver collect).

    Deterministic given a deterministic partitioning of the input —
    callers that need run-to-run identical bins should repartition by a
    key column first (hash partitioning is content-addressed). Documents
    longer than the budget get a bin of their own (never split here;
    chunk upstream if splitting is wanted).

    Output: (bin_id string, doc_id, n_tokens, bin_fill)."""
    from collections.abc import Iterator

    from pyspark.sql.functions import spark_partition_id

    # NULL ids excluded like pack_sequences_canonical (a bin member
    # must be addressable; int(None) would also crash the kernel)
    counted = df.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col),
        # NULL text -> size() is NULL in ANSI Spark; treat as 0 tokens
        F.coalesce(F.size(words_expr(text_col)), F.lit(0)).alias("n_tokens"),
        spark_partition_id().alias("_pid"),
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fill: dict[int, tuple[int, int]] = {}  # pid -> (bin_idx, used)
        for pdf in batches:
            out_bin, out_doc, out_tok, out_fill = [], [], [], []
            for doc, n, pid in zip(pdf[id_col], pdf["n_tokens"], pdf["_pid"]):
                n = int(n)
                bin_idx, used = fill.get(pid, (0, 0))
                if used > 0 and used + n > token_budget:
                    bin_idx, used = bin_idx + 1, 0
                used += n
                fill[pid] = (bin_idx, used)
                out_bin.append(f"{pid}-{bin_idx}")
                out_doc.append(int(doc))
                out_tok.append(n)
                out_fill.append(used)
            yield pd.DataFrame(
                {
                    "bin_id": out_bin,
                    id_col: out_doc,
                    "n_tokens": out_tok,
                    "bin_fill": out_fill,
                }
            )

    return counted.mapInPandas(
        pack, f"bin_id string, {id_col} long, n_tokens long, bin_fill long"
    )


def source_quality_gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    low_quality_threshold: float = 0.5,
    max_low_fraction: float = 0.3,
    min_docs: int = 10,
) -> DataFrame:
    """Per-source corpus gating: aggregate each source's doc count,
    low-quality fraction (quality < ``low_quality_threshold``), and
    mean doc length, then decide keep/drop — the crawl-source filter a
    training pipeline applies before spending tokens on a domain.

    Exactness: every aggregate is integer-derived (counts and int
    sums), so the one groupBy shuffle is order-independent and the
    oracle replays it bit-for-bit; the only doubles are final
    divisions of exact integers. Scale: map-side partial aggregation
    means the shuffle carries one row per (partition, source).

    Output: (source, n_docs, n_low_quality, low_quality_fraction,
    avg_chars, keep)."""
    q = quality_score(df, text_col, id_col, extra_cols=(source_col,))
    stats = q.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("quality") < low_quality_threshold, 1).otherwise(0)
        ).cast("long").alias("n_low_quality"),
        F.sum("n_chars").alias("total_chars"),
    )
    low_frac = F.col("n_low_quality") / F.col("n_docs")
    return stats.select(
        F.col(source_col),
        "n_docs",
        "n_low_quality",
        low_frac.alias("low_quality_fraction"),
        (F.col("total_chars") / F.col("n_docs")).alias("avg_chars"),
        (
            (low_frac <= F.lit(max_low_fraction))
            & (F.col("n_docs") >= F.lit(min_docs))
        ).alias("keep"),
    )


def text_repetition(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Intra-document repetition signals (the Gopher-rules family —
    boilerplate and degenerate generations repeat themselves):

    - top_word_fraction: occurrences of the most frequent word / total
      words
    - dup_2gram_fraction / dup_3gram_fraction: 1 - distinct/total word
      n-grams

    All four counts come from ONE Arrow token pass per doc (round 14);
    the fractions stay JVM double divisions over the returned integers,
    so every value is bit-identical to the former formulation. The
    former plan exploded the token stream into a (doc, word) aggregate,
    re-aggregated per doc, and merge-joined back onto an interpreted
    per-position gram transform — two exchanges of token-level data, a
    join, and ~12 us/slice interpreted gram construction, ALL replaced
    by a zero-shuffle map stage (scan-speed at 100 TB, no token ever
    leaves its scan task). Distinct n-grams are counted as word TUPLES,
    which is exactly the count of distinct joined strings because
    tokens from the [^\\p{L}]+ split can never contain the join
    separator.

    Output: (id, n_words, top_word_fraction, dup_2gram_fraction,
    dup_3gram_fraction) for docs with at least one word."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(
        "struct<n_words: bigint, top_c: bigint, d2: bigint, d3: bigint>"
    )
    def rep(words: pd.Series) -> pd.DataFrame:
        from collections import Counter

        n_w, top_c, d2, d3 = [], [], [], []
        for ws in words:
            if ws is None:
                # NULL text: no row downstream (the n_words>=1 filter
                # drops NULLs exactly like the former size(words)>=1
                # pre-filter)
                n_w.append(None), top_c.append(None)
                d2.append(None), d3.append(None)
                continue
            n = len(ws)
            n_w.append(n)
            top_c.append(max(Counter(ws).values()) if n else 0)
            d2.append(len(set(zip(ws, ws[1:]))) if n >= 2 else 0)
            d3.append(len(set(zip(ws, ws[1:], ws[2:]))) if n >= 3 else 0)
        return pd.DataFrame(
            {
                "n_words": pd.array(n_w, dtype="Int64"),
                "top_c": pd.array(top_c, dtype="Int64"),
                "d2": pd.array(d2, dtype="Int64"),
                "d3": pd.array(d3, dtype="Int64"),
            }
        )

    # asNondeterministic: the n_words filter references the kernel's
    # OUTPUT; without the mark the optimizer copies the kernel below
    # the filter (guide-§4.4 duplication, same as _doc_shingles)
    kern = rep.asNondeterministic()
    base = df.select(
        F.col(id_col), kern(words_expr(text_col)).alias("_r")
    ).filter(F.col("_r.n_words") >= 1)

    def _dup_frac(n: int, d_col: str):
        total = F.col("_r.n_words") - (n - 1)
        return F.when(
            F.col("_r.n_words") >= n,
            F.lit(1.0) - F.col(f"_r.{d_col}") / total,
        ).otherwise(F.lit(0.0))

    return base.select(
        F.col(id_col),
        F.col("_r.n_words").alias("n_words"),
        (F.col("_r.top_c") / F.col("_r.n_words")).alias("top_word_fraction"),
        _dup_frac(2, "d2").alias("dup_2gram_fraction"),
        _dup_frac(3, "d3").alias("dup_3gram_fraction"),
    )


def pack_sequences_canonical(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_budget: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """Canonical (run-to-run AND engine-to-engine deterministic)
    sequence packing: documents are hash-sharded by
    ``h64('pack:' || id) % n_shards``, ordered by id within the shard,
    and packed greedy next-fit into fixed-token-budget bins. Unlike
    :func:`pack_sequences` (partition-scoped, fastest, ordering follows
    the input partitioning) this variant's bins are a pure function of
    the data, so a DuckDB recursive CTE can replay them row-for-row —
    the correctness-gate form.

    Scale: token counting and shard assignment stay JVM-side; the
    per-shard pandas kernel sees ONLY (doc_id, n_tokens) int pairs —
    a shard of 100M docs is ~1.6 GB of ints, and ``n_shards`` is the
    knob that bounds it (packing inside a shard is inherently
    sequential: one O(n) pass). Documents longer than the budget get a
    bin of their own; never split here.

    Output: (bin_id string 'shard-binidx', doc_id, n_tokens, bin_fill)."""
    # a NULL id has no canonical position (the shard hash and the
    # in-shard order are both functions of the id) — excluded, exactly
    # like the oracle's NULL-propagating 'pack:' || id; the concat
    # (not concat_ws) keeps the hash NULL-propagating for consistency
    # with sampling._bucket
    counted = df.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col),
        # NULL text -> size() is NULL in ANSI Spark; treat as 0 tokens
        F.coalesce(F.size(words_expr(text_col)), F.lit(0)).alias("n_tokens"),
        (
            h64(F.concat(F.lit("pack:"), F.col(id_col).cast("string")))
            % n_shards
        ).alias("shard"),
    )

    def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        pdf = pdf.sort_values(id_col)
        bin_idx, used = 0, 0
        out_bin, out_fill = [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if used > 0 and used + n > token_budget:
                bin_idx, used = bin_idx + 1, 0
            used += n
            out_bin.append(f"{shard}-{bin_idx}")
            out_fill.append(used)
        return pd.DataFrame(
            {
                "bin_id": out_bin,
                id_col: pdf[id_col].to_numpy(),
                "n_tokens": pdf["n_tokens"].to_numpy(),
                "bin_fill": out_fill,
            }
        )

    return counted.groupBy("shard").applyInPandas(
        pack, f"bin_id string, {id_col} long, n_tokens long, bin_fill long"
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window chunking for context windows / RAG prep: word
    chunks of ``chunk_tokens`` starting every ``stride`` tokens
    (overlap = chunk_tokens - stride). Pure array expressions — one
    explode, no Python, no shuffle. Output: (id, chunk_idx, chunk_text,
    n_chunk_tokens)."""
    words = words_expr(text_col)
    base = df.select(F.col(id_col), words.alias("words")).filter(
        F.size("words") > 0
    )
    starts = F.sequence(F.lit(0), F.size("words") - 1, F.lit(stride))
    chunks = base.select(
        F.col(id_col), "words", F.explode(starts).alias("start")
    )
    piece = F.slice("words", F.col("start") + 1, chunk_tokens)
    return chunks.select(
        F.col(id_col),
        (F.col("start") / stride).cast("long").alias("chunk_idx"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
    )


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 1000,
) -> DataFrame:
    """Corpus vocabulary: the top_k words by total occurrences (ties
    broken lexicographically), with document frequency — the
    tokenizer-vocab / stopword-discovery primitive. One (word) keyed
    agg with map-side combine; the top-k is a TakeOrdered over the
    aggregated (distinct-word-sized) frame, never the token stream.
    Output: (rank, word, n_occurrences, n_docs)."""
    from pyspark.sql.window import Window

    counts = (
        spread_scan(
            df.select(F.col(id_col), F.col(text_col)),
            min_bytes=TOKENIZE_SPREAD_MIN_BYTES,
        )
        .select(F.col(id_col), F.explode(words_expr(text_col)).alias("word"))
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct(F.col(id_col)).alias("n_docs"),
        )
    )
    # limit first: TakeOrderedAndProject does a DISTRIBUTED partial
    # top-k (per-partition heaps merged at the driver) — a global
    # row_number window would funnel every distinct word through one
    # task. The rank window then runs over top_k rows only.
    top = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("word").asc()
    ).limit(top_k)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("word").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "word", "n_occurrences", "n_docs"
    )


def bm25_components(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
) -> DataFrame:
    """Per-(doc, term) BM25 raw components: term frequency, document
    frequency, document length, corpus size. Scores are left to the
    caller as score = idf(df_t, N) * tf*(k1+1)/(tf + k1*(1-b+b*len/avg))
    — deliberately NOT computed here: idf needs log(), and libm log is
    not guaranteed bit-identical across engines, so the engine-exact
    contract stops at the integer components (everything here is a
    count). Terms below ``min_df`` docs are dropped (the long tail that
    dominates index size at corpus scale). PRECONDITION: ``id_col`` is
    unique (one row per document — the invariant every operator in this
    engine's documents model assumes); doc_len rides map-side as
    size(words) per row, which equals the per-doc token total only when
    a doc is exactly one row. The precondition is ENFORCED in-plan:
    the corpus-count aggregation (which the operator pays anyway)
    also counts raw rows, and an ``assert_true`` fails the job loudly
    when they differ — silent tf/doc_len inconsistency is not a mode
    this operator has.

    Scale: one explode + (doc, term) agg feeds everything else —
    document LENGTH rides MAP-SIDE as size(words) before the explode
    (it equals sum(tf) per doc, but deriving it that way cost a second
    aggregation over the tf frame plus a doc-keyed merge join — the
    same count-window class the ngram prefix ranking shed in round 6;
    round 7 removed it after bm25_components drifted to 1.45x its
    anchor), and document frequency is a count per term over the tf
    frame (the token stream is read once). Document frequency comes
    from a whole-partition COUNT window over the one (term) exchange
    (round 14 — the former dfreq aggregate + pinned sort-merge join
    consumed the tf frame twice, which is why tf had to be persisted,
    and exchanged it a second time for the join; the window needs the
    same (term) exchange the join did, counts the identical value, and
    leaves tf single-consumer so the persist disappears too). The only
    broadcast is the single-row corpus count. Output:
    (doc_id, term, tf, df, doc_len, n_docs_total)."""
    from pyspark.sql.window import Window

    # two-step projection: CollapseProject keeps the tokenizer single-
    # evaluation because the outer select references `words` twice
    w = spread_scan(
        df.select(F.col(id_col), F.col(text_col)),
        min_bytes=TOKENIZE_SPREAD_MIN_BYTES,
    ).select(F.col(id_col), words_expr(text_col).alias("words"))
    tokens = w.select(
        F.col(id_col),
        F.size("words").cast("long").alias("doc_len"),
        F.explode("words").alias("term"),
    )
    tf = tokens.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("doc_len").alias("doc_len")
    )
    tf_df = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).filter(F.col("df") >= min_df)
    # the single-row corpus aggregation doubles as the uniqueness
    # guard: count(*) rides the same agg (no extra job/shuffle), and
    # the filter keeps the assert_true in the plan (a projected-away
    # column would be pruned). assert_true is NULL on success, so
    # isNull() passes the one row through.
    n_total = (
        df.agg(
            F.countDistinct(F.col(id_col)).alias("n_docs_total"),
            F.count(F.lit(1)).alias("_rows"),
        )
        .filter(
            F.assert_true(
                F.col("_rows") == F.col("n_docs_total"),
                F.lit(
                    "bm25_components: id_col must be unique "
                    "(one row per document) — duplicate ids would make "
                    "tf sum across rows while doc_len stays per-row"
                ),
            ).isNull()
        )
        .select("n_docs_total")
    )
    return attach_plan_caches(
        tf_df.crossJoin(F.broadcast(n_total)).select(
            id_col, "term", "tf", "df", "doc_len", "n_docs_total"
        ),
        (),
    )
