"""LLM-data-pipeline queries (SURVEY.md §7 M4): dedup family, similarity
search, text analysis, multimodal — each registered with a DuckDB oracle
that replays the identical computation (same md5-derived hashes, same
permutation coefficients, same fold order), so MinHash/SimHash/LSH run
under the exact value-hash gate rather than a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solace_apache_beam_spark.functions.hashing import (
    MERSENNE_61,
    WORDS_SQL,
    h32_sql,
    h64_sql,
    minhash_coeffs,
)
from solace_apache_beam_spark.llm.text_analysis import FINGERPRINT_MASK, STOPWORDS
from solace_apache_beam_spark.registry import query
from solace_apache_beam_spark.session import load_table

# ---------------------------------------------------------------------------
# Shared DuckDB SQL fragments (mirror functions/hashing.py exactly)
# ---------------------------------------------------------------------------

# Aliases of the canonical fragments in functions/hashing.py — NOT
# second definitions (same single-source rule as operators/text.py's
# TOKENIZER_PATTERN: the Spark side hashes via hashing.h32/h64 and
# tokenizes via TOKEN_PATTERN; a drifting local copy would break every
# minhash/simhash/fingerprint gate silently).
_WORDS = WORDS_SQL.format(text="text")
_h32 = h32_sql
_h64 = h64_sql


def _stop_sql(lang: str) -> str:
    # the coalesce exists for EMPTY word lists (DuckDB list_sum([]) is
    # NULL where Spark's F.aggregate([], 0, ...) returns its 0 init) —
    # it must not also swallow NULL words: on a NULL text every other
    # feature is NULL on both engines and Spark's aggregate over a NULL
    # array is NULL, so the guard keeps n_stopwords NULL there too
    # (found by the randomized documents differential in
    # tests/test_properties_queries.py)
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"CASE WHEN words IS NULL THEN NULL ELSE "
        f"CAST(coalesce(list_sum([CASE WHEN list_contains([{lst}], x) THEN 1 ELSE 0 END "
        f"for x in words]), 0) AS BIGINT) END"
    )


# per-doc distinct shingle-HASH set (dedup after hashing, matching the
# Spark-side Arrow UDF — a 32-bit collision merges the same pair on
# both engines)
_DOC_BASE = f"""
  w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
  hs AS (SELECT doc_id,
                list_distinct([{_h32("array_to_string(words[i:i+2], ' ')")}
                               for i in generate_series(1, len(words) - 2)]) AS hlist
         FROM w WHERE len(words) >= 3)
"""

_N_PERM, _N_BANDS = 16, 4

# LSH bucket-membership cap (mirrors minhash_lsh_pairs max_bucket=1000:
# buckets larger than this are dropped on BOTH engines — the skew guard
# that keeps one degenerate band hash from concentrating O(n^2) pairs)
_MAX_BUCKET = 1000


def _minhash_fragments(
    n_perm: int,
    n_bands: int,
    src: str,
    sfx: str,
    threshold: float = 0.5,
    max_bucket: int = _MAX_BUCKET,
) -> dict[str, str]:
    """The four CTE fragments of one MinHash-LSH pass — signature,
    LSH bands, capped candidate pairs, exact-Jaccard-verified pairs —
    over shingle-set CTE ``src``, every CTE name suffixed ``sfx``.

    SINGLE SOURCE for the oracle-side MinHash pass: the module-level
    (16, 4) fragments (``_MINHASH_BASE``/``_CAND_SQL``, shared by five
    oracles) and the rescue oracle's two parameterized passes all
    assemble from here, so an edit to the pass logic (cap rule, jaccard
    formula, band hashing) cannot de-synchronize one gate from another
    (round-8 review: the previous hand-written module-level copy was
    exactly that drift hazard). ``threshold`` and ``max_bucket`` are
    parameters like n_perm/n_bands (ADVICE r8: hard-coding them meant
    an oracle assembled at a different verify threshold would silently
    diverge from its Spark side); the defaults interpolate to the exact
    text every existing oracle already carries."""
    rows = n_perm // n_bands
    sig_items = ", ".join(
        f"list_min([({a} * h + {b}) % {MERSENNE_61} for h in hlist])"
        for a, b in minhash_coeffs(n_perm)
    )
    bands_sql = " UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band, "
        + _h64(f"array_to_string(sig{sfx}[{bi * rows + 1}:{(bi + 1) * rows}], ',')")
        + f" AS band_hash FROM sig{sfx}"
        for bi in range(n_bands)
    )
    return {
        "sig": f"sig{sfx} AS (SELECT doc_id, [{sig_items}] AS sig{sfx} FROM {src})",
        "bands": f"bands{sfx} AS ({bands_sql})",
        "cand": f"""cand{sfx} AS (
      SELECT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM bands{sfx} l
      JOIN bands{sfx} r ON l.band = r.band AND l.band_hash = r.band_hash
                       AND l.doc_id < r.doc_id
      JOIN (SELECT band, band_hash FROM bands{sfx}
            GROUP BY 1, 2 HAVING count(*) <= {max_bucket}) ok
        ON l.band = ok.band AND l.band_hash = ok.band_hash
      GROUP BY 1, 2
    )""",
        "pairs": f"""pairs{sfx} AS (
      SELECT doc_a, doc_b,
             len(list_intersect(sa.hlist, sb.hlist)) * 1.0
               / len(list_distinct(list_concat(sa.hlist, sb.hlist))) AS jaccard
      FROM cand{sfx}
      JOIN {src} sa ON cand{sfx}.doc_a = sa.doc_id
      JOIN {src} sb ON cand{sfx}.doc_b = sb.doc_id
      WHERE jaccard >= {threshold}
    )""",
    }


_PASS_DEFAULT = _minhash_fragments(_N_PERM, _N_BANDS, "hs", "")

_MINHASH_BASE = f"""
  {_DOC_BASE},
  {_PASS_DEFAULT["sig"]},
  {_PASS_DEFAULT["bands"]}
"""

_CAND_SQL = f"""
    {_PASS_DEFAULT["cand"]}
"""


# SimHash pair oracle — 60-bit signatures, 15-bit band slices, skew cap
# replayed. Shared verbatim by dedup_simhash_pairs (literal n_bands=4)
# and dedup_simhash_pairs_auto (n_bands="auto", which resolves to 4
# below the 8.19M-signature horizon — see that query's rationale).
_SIMHASH_PAIRS_ORACLE = f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
    h AS (SELECT doc_id, [{_h64("x")} for x in words] AS hlist FROM w WHERE len(words) > 0),
    sig AS (
      SELECT doc_id,
             CAST(list_sum([
               CASE WHEN CAST(list_sum([
                      CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END
                    for h in hlist]) AS BIGINT) > 0
                    THEN (1::BIGINT << b) ELSE 0 END
             for b in generate_series(0, 59)]) AS BIGINT) AS simhash
      FROM h
    ),
    bands AS (
      SELECT doc_id, b.band, (simhash >> (b.band * 15)) & 32767 AS val
      FROM sig, (SELECT unnest(generate_series(0, 3)) AS band) b
    ),
    ok AS (SELECT band, val FROM bands
           GROUP BY 1, 2 HAVING count(*) <= {_MAX_BUCKET}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
      JOIN ok ON ok.band = a.band AND ok.val = a.val
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sa.simhash, sb.simhash)) AS BIGINT) AS hamming
    FROM cand
    JOIN sig sa ON cand.doc_a = sa.doc_id
    JOIN sig sb ON cand.doc_b = sb.doc_id
    WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
    """


def _minhash_pass_sql(n_perm: int, n_bands: int, src: str, sfx: str) -> str:
    """One full MinHash-LSH pass (signature -> bands -> capped
    candidates -> exact-Jaccard-verified pairs >= 0.5), assembled from
    the same :func:`_minhash_fragments` the module-level (16, 4)
    fragments come from — the rescue oracle replays BOTH the screen
    preset and the HIGH_RECALL preset in one statement with the same
    coefficient stream (functions/hashing.py minhash_coeffs) as the
    Spark side."""
    f = _minhash_fragments(n_perm, n_bands, src, sfx)
    return f"""
    {f["sig"]},
    {f["bands"]},
    {f["cand"]},
    {f["pairs"]}
"""


# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------


@query(
    "training_data_pipeline",
    oracle=f"""
    -- end-to-end composition: quality gate -> near-dup removal
    -- (MinHash-LSH, keep the smaller id of each pair) -> split
    -- assignment -> per-split manifest. Every stage reuses the exact
    -- fragments of its standalone query.
    WITH {_MINHASH_BASE},
    {_CAND_SQL},
    dupb AS (
      SELECT DISTINCT doc_b
      FROM cand
      JOIN hs sa ON cand.doc_a = sa.doc_id
      JOIN hs sb ON cand.doc_b = sb.doc_id
      WHERE len(list_intersect(sa.hlist, sb.hlist)) * 1.0
              / len(list_distinct(list_concat(sa.hlist, sb.hlist))) >= 0.5
    ),
    scored AS (
      SELECT doc_id,
             0.4 * (CAST({_stop_sql("en")} AS DOUBLE) / greatest(len(words), 1))
               + 0.3 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / greatest(length(text), 1))
               + 0.3 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / greatest(length(text), 1)) AS quality,
             len(words) AS n_tokens
      FROM (SELECT doc_id, text, {_WORDS} AS words FROM documents)
    ),
    clean AS (
      SELECT s.doc_id, s.n_tokens
      FROM scored s
      WHERE s.quality >= 0.5
        AND s.doc_id NOT IN (SELECT doc_b FROM dupb)
    ),
    assigned AS (
      SELECT doc_id, n_tokens,
             CASE WHEN b < 8000 THEN 'train'
                  WHEN b < 9000 THEN 'val' ELSE 'test' END AS split
      FROM (SELECT doc_id, n_tokens,
                   ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   % 10000 AS b
            FROM clean)
    )
    SELECT split, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM assigned GROUP BY 1
    """,
)
def training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship composition: quality-gate the corpus, drop MinHash
    near-duplicates (keep the smaller id of each pair), assign
    deterministic train/val/test splits, and emit the per-split
    manifest — one declarative DataFrame graph; Catalyst fuses the
    stages (the quality scan and the token count share one read)."""
    from solace_apache_beam_spark.functions.sampling import assign_splits
    from solace_apache_beam_spark.llm.dedup import minhash_lsh_pairs
    from solace_apache_beam_spark.llm.text_analysis import quality_score

    docs = load_table(spark, sf_dir, "documents")
    dup_b = minhash_lsh_pairs(docs).select(F.col("doc_b").alias("doc_id")).distinct()
    # ONE projection for quality + n_tokens (round 14, same merge as
    # curation_pipeline): the former base/scored branches were 1:1
    # per-row derivations of the same scan joined back on doc_id —
    # n_tokens IS quality_score's n_words (identical size(words_expr)
    # expression), and the inner join's only other effect on the
    # engine's unique-id documents model was dropping NULL doc_ids,
    # now an explicit filter. Proven by oracle parity at sf0.01/sf0.1.
    clean = (
        quality_score(docs)
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id", "quality", F.col("n_words").alias("n_tokens"))
        .filter(F.col("quality") >= 0.5)
        .join(dup_b, "doc_id", "left_anti")
    )
    return assign_splits(clean, "doc_id").groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )


@query(
    "vocab_top_words",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
    tok AS (SELECT doc_id, unnest(words) AS word FROM w),
    counts AS (SELECT word, count(*) AS n_occurrences,
                      count(DISTINCT doc_id) AS n_docs
               FROM tok GROUP BY 1),
    top AS (SELECT *, CAST(row_number() OVER (ORDER BY n_occurrences DESC, word)
                           AS BIGINT) AS rank
            FROM counts)
    SELECT rank, word, n_occurrences, n_docs FROM top WHERE rank <= 1000
    """,
)
def vocab_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-1000 words by occurrences (lexicographic
    ties) + document frequency; distributed partial top-k, never a
    global rank of the token stream."""
    from solace_apache_beam_spark.llm.text_analysis import vocabulary

    return vocabulary(load_table(spark, sf_dir, "documents"))


@query(
    "bm25_components",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
    tok AS (SELECT doc_id, unnest(words) AS term FROM w),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf
              GROUP BY 1 HAVING count(*) >= 2),
    dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS doc_len FROM tf GROUP BY 1),
    nt AS (SELECT count(DISTINCT doc_id) AS n_docs_total FROM documents)
    SELECT tf.doc_id, tf.term, tf.tf, dfreq.df, dl.doc_len, nt.n_docs_total
    FROM tf
    JOIN dfreq ON tf.term = dfreq.term
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN nt
    """,
)
def bm25_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact BM25 components per (doc, term >= min_df): tf,
    df, doc length, corpus size — scoring (which needs libm log, not
    bit-portable) is one expression away for the caller."""
    from solace_apache_beam_spark.llm.text_analysis import bm25_components

    return bm25_components(load_table(spark, sf_dir, "documents"))


@query(
    "multimodal_resize",
    oracle="""
    -- restated over hex (round 9, same rationale as frame_sample /
    -- features): byte values come from hex pairs of the UTF-8
    -- encoding, valid for any text. Byte j (0-based) lands in cell
    -- floor(j * 8 / n); cell value = integer mean of its bytes (exact
    -- BIGINT sum, one IEEE division — identical on both engines).
    WITH d AS (SELECT doc_id, hex(encode(text)) AS hx,
                      octet_length(encode(text)) AS n
               FROM documents WHERE octet_length(encode(text)) > 0),
    b AS (SELECT doc_id, n, unnest(generate_series(1, n)) AS i, hx FROM d),
    c AS (SELECT doc_id,
                 CAST(((i - 1) * 8) // n AS INT) AS cell,
                 ('0x' || substr(hx, 2 * i - 1, 2))::INT AS v
          FROM b)
    SELECT doc_id, cell, sum(v) * 1.0 / count(*) AS value
    FROM c GROUP BY 1, 2
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-average resize of binary payloads to 8 cells (the 1-D
    shape of area-interpolation image resizing) — scalar rows under
    the exact value-hash gate."""
    from solace_apache_beam_spark.llm.multimodal import (
        attach_binary_payload,
        resize_payload,
    )

    docs = load_table(spark, sf_dir, "documents")
    return resize_payload(attach_binary_payload(docs))


_KM_CELLS, _KM_ITERS = 8, 2


def _km_iter_sql(it: int) -> str:
    """One Lloyd iteration: assignment under c{it}, integer-sum centroid
    update, empty cells keep c{it}'s centroid -> c{it+1}."""
    return f"""
    a{it} AS (
      SELECT vec_id, qv, cid, cos,
             row_number() OVER (
               PARTITION BY vec_id
               ORDER BY (CASE WHEN isnan(cos) THEN CAST('-infinity' AS DOUBLE)
                         ELSE cos END) DESC, cid) AS rn
      FROM (
        SELECT q.vec_id, q.qv, c.cid,
               list_inner_product(q.qv, c.cv)
                 / (sqrt(list_inner_product(q.qv, q.qv))
                    * sqrt(list_inner_product(c.cv, c.cv))) AS cos
        FROM q, c{it} c
      )
    ),
    asg{it} AS (SELECT vec_id, qv, cid AS cell FROM a{it} WHERE rn = 1),
    sums{it} AS (
      SELECT cell, pos, sum(v) AS s, count(*) AS cnt
      FROM (SELECT cell, unnest(generate_series(1, len(qv))) AS pos,
                   unnest(qv) AS v
            FROM asg{it})
      GROUP BY 1, 2
    ),
    newc{it} AS (
      SELECT cell AS cid, list(round(s / cnt) ORDER BY pos) AS cv
      FROM sums{it} GROUP BY 1
    ),
    c{it + 1} AS (
      SELECT p.cid, coalesce(n.cv, p.cv) AS cv
      FROM c{it} p LEFT JOIN newc{it} n ON p.cid = n.cid
    )"""


_KM_SQL = f"""
    WITH q AS (
      SELECT vec_id,
             [CAST(round(CAST(x AS DOUBLE) * 1048576) AS DOUBLE)
              for x in embedding] AS qv
      -- same undecoded-row filter as _QE: kmeans_assign never sees
      -- NULL vectors on the Spark side
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    c0 AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < {_KM_CELLS}),
    {", ".join(_km_iter_sql(i) for i in range(_KM_ITERS))},
    final AS (
      SELECT q.vec_id, c.cid,
             list_inner_product(q.qv, c.cv)
               / (sqrt(list_inner_product(q.qv, q.qv))
                  * sqrt(list_inner_product(c.cv, c.cv))) AS cos
      FROM q, c{_KM_ITERS} c
    ),
    ranked AS (
      SELECT vec_id, cid AS cell, cos,
             row_number() OVER (
               PARTITION BY vec_id
               ORDER BY (CASE WHEN isnan(cos) THEN CAST('-infinity' AS DOUBLE)
                         ELSE cos END) DESC, cid) AS rn
      FROM final
    )
    SELECT vec_id, cell, round(cos, 6) AS cos_sim FROM ranked WHERE rn = 1
"""


@query("ivf_kmeans_assign", oracle=_KM_SQL)
def ivf_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized Lloyd k-means (2 fixed iterations, integer-exact
    updates) + nearest-centroid cell assignment — the trained coarse
    quantizer for IVF; the oracle replays the entire training loop
    bit-for-bit in SQL."""
    from solace_apache_beam_spark.llm.similarity import kmeans_assign

    return kmeans_assign(
        load_table(spark, sf_dir, "embeddings"),
        n_cells=_KM_CELLS,
        n_iters=_KM_ITERS,
    )


_SEMDEDUP_TAU = 0.4

# SemDeDup oracle: the SAME Lloyd-training + assignment replay as
# _KM_SQL (q / c0 / iterations / final / ranked are structurally
# identical — kept separate so neither oracle's text depends on the
# other's rotation state), then within-cell pairing with the
# integer-exact quantized cosine, threshold on the 6-decimal ROUNDED
# value, greedy keep-first (dup_of = smallest lower-id member at or
# above tau). n2 > 0 guards mirror the kernel's isfinite mask: a
# zero-norm vector's NaN cosine satisfies >= tau in DuckDB (NaN ranks
# greatest) while the Spark kernel drops it.
_SEMDEDUP_SQL = f"""
    WITH q AS (
      SELECT vec_id,
             [CAST(round(CAST(x AS DOUBLE) * 1048576) AS DOUBLE)
              for x in embedding] AS qv
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    c0 AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < {_KM_CELLS}),
    {", ".join(_km_iter_sql(i) for i in range(_KM_ITERS))},
    final AS (
      SELECT q.vec_id, c.cid,
             list_inner_product(q.qv, c.cv)
               / (sqrt(list_inner_product(q.qv, q.qv))
                  * sqrt(list_inner_product(c.cv, c.cv))) AS cos
      FROM q, c{_KM_ITERS} c
    ),
    ranked AS (
      SELECT vec_id, cid AS cell, cos,
             row_number() OVER (
               PARTITION BY vec_id
               ORDER BY (CASE WHEN isnan(cos) THEN CAST('-infinity' AS DOUBLE)
                         ELSE cos END) DESC, cid) AS rn
      FROM final
    ),
    asg AS (
      SELECT r.vec_id, r.cell, q.qv,
             list_inner_product(q.qv, q.qv) AS n2
      FROM ranked r JOIN q USING (vec_id) WHERE r.rn = 1
    ),
    pairs AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             round(list_inner_product(a.qv, b.qv)
                   / (sqrt(a.n2) * sqrt(b.n2)), 6) AS cos
      FROM asg a JOIN asg b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE a.n2 > 0 AND b.n2 > 0
    ),
    dups AS (
      SELECT ib AS vec_id, min(ia) AS dup_of
      FROM pairs WHERE cos >= {_SEMDEDUP_TAU} GROUP BY ib
    )
    SELECT s.vec_id, s.cell, d.dup_of IS NOT NULL AS is_dup, d.dup_of
    FROM asg s LEFT JOIN dups d ON s.vec_id = d.vec_id
"""


@query("semantic_dedup", oracle=_SEMDEDUP_SQL)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication (arXiv:2303.09540): quantized
    Lloyd k-means cells + within-cell cosine pruning at tau=0.4 with a
    deterministic greedy keep-first rule — the oracle replays the whole
    training loop, the cell assignment, AND the in-cell pair pruning
    bit-for-bit in SQL."""
    from solace_apache_beam_spark.llm.similarity import semantic_dedup as sd

    return sd(
        load_table(spark, sf_dir, "embeddings"),
        n_cells=_KM_CELLS,
        n_iters=_KM_ITERS,
        threshold=_SEMDEDUP_TAU,
    ).select("vec_id", "cell", "is_dup", "dup_of")


_PQ_M, _PQ_K, _PQ_ITERS, _PQ_TOPK = 4, 8, 1, 5


def _pq_sub_sql(s: int, src: str = "q0") -> str:
    """Subspace ``s`` of the PQ oracle: subvector slice (integer-div
    bounds — Spark ``div`` / DuckDB ``//`` agree), seed centroids
    (subvectors of ids < k), ``_PQ_ITERS`` Lloyd iterations under exact
    squared-L2 (three list_inner_products of integer-valued doubles —
    the same d2 the Arrow kernel computes), then the final encode
    assignment. Ties break ORDER BY d2, cid = numpy argmin-first over
    id-sorted centroids. Empty cells keep the previous centroid.
    ``src`` picks the vector CTE (column ``q``): q0 for raw vectors,
    rv0 for coarse-centroid residuals (the by_residual oracle)."""
    cte = [
        f"""s{s}v AS (
      SELECT vec_id,
             [q[i] for i in generate_series(len(q) * {s} // {_PQ_M} + 1,
                                            len(q) * {s + 1} // {_PQ_M})] AS v
      FROM {src})""",
        f"s{s}c0 AS (SELECT vec_id AS cid, v AS cv FROM s{s}v WHERE vec_id < {_PQ_K})",
    ]
    d2 = (
        "list_inner_product(a.v, a.v) - 2 * list_inner_product(a.v, c.cv)"
        " + list_inner_product(c.cv, c.cv)"
    )
    for it in range(_PQ_ITERS):
        cte += [
            f"""s{s}a{it} AS (
      SELECT vec_id, v, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      FROM (SELECT a.vec_id, a.v, c.cid, {d2} AS d2
            FROM s{s}v a, s{s}c{it} c))""",
            f"s{s}g{it} AS (SELECT vec_id, v, cid AS cell FROM s{s}a{it} WHERE rn = 1)",
            f"""s{s}m{it} AS (
      SELECT cell, pos, sum(x) AS sm, count(*) AS cnt
      FROM (SELECT cell, unnest(generate_series(1, len(v))) AS pos,
                   unnest(v) AS x
            FROM s{s}g{it})
      GROUP BY 1, 2)""",
            f"""s{s}n{it} AS (
      SELECT cell AS cid, list(round(sm / cnt) ORDER BY pos) AS cv
      FROM s{s}m{it} GROUP BY 1)""",
            f"""s{s}c{it + 1} AS (
      SELECT p.cid, coalesce(n.cv, p.cv) AS cv
      FROM s{s}c{it} p LEFT JOIN s{s}n{it} n ON p.cid = n.cid)""",
        ]
    cte += [
        f"""s{s}e AS (
      SELECT vec_id, cid, cv,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      FROM (SELECT a.vec_id, c.cid, c.cv, {d2} AS d2
            FROM s{s}v a, s{s}c{_PQ_ITERS} c))""",
        f"s{s}code AS (SELECT vec_id, cid, cv FROM s{s}e WHERE rn = 1)",
    ]
    return ",\n    ".join(cte)


# Shared PQ oracle prefix: quantized vectors (DOUBLE lists, same
# convention as _KM_SQL) + per-subspace codebook training and encoding.
_PQ_SUBSPACES = ",\n    ".join(_pq_sub_sql(s) for s in range(_PQ_M))
_PQ_PREFIX = f"""
    WITH q0 AS (
      SELECT vec_id,
             [CAST(round(CAST(x AS DOUBLE) * 1048576) AS DOUBLE)
              for x in embedding] AS q
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    {_PQ_SUBSPACES}
"""

_PQ_CODES_SELECT = ", ".join(
    f"s{s}code.cid AS code_{s}" for s in range(_PQ_M)
)
_PQ_CODES_JOIN = " JOIN ".join(f"s{s}code USING (vec_id)" for s in range(_PQ_M))
_PQ_RECON = " || ".join(f"s{s}code.cv" for s in range(_PQ_M))


@query(
    "pq_code_assign",
    oracle=f"""
    {_PQ_PREFIX}
    SELECT q0.vec_id, {_PQ_CODES_SELECT}
    FROM q0 JOIN {_PQ_CODES_JOIN}
    """,
)
def pq_code_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding ({_PQ_M} subspaces x {_PQ_K} codes,
    L2 subquantizers trained with the engine-exact Lloyd loop) — the
    oracle replays every subspace's training and the code assignment
    bit-for-bit. This is the compressed representation 100 TB embedding
    stores shuffle instead of raw vectors."""
    from solace_apache_beam_spark.llm.similarity import pq_encode

    enc = pq_encode(
        load_table(spark, sf_dir, "embeddings"),
        m=_PQ_M,
        k_codes=_PQ_K,
        n_iters=_PQ_ITERS,
    )
    return enc.select(
        "vec_id",
        *[F.col("codes")[s].alias(f"code_{s}") for s in range(_PQ_M)],
    )


# ann_pq_cosine (flat-PQ asymmetric search over pq_topk) was a
# registered gate through round 12; consolidated round 13 (VERDICT r12
# Next #6, registry growth freeze): ann_ivf_pq_cosine's oracle already
# replays the identical PQ train/encode/reconstruct/ADC-score brute arm
# inside its probed cells, so the flat variant's gate row was a
# superseded baseline. The pq_topk kernel keeps randomized-differential
# coverage in test_properties_similarity.test_pq_topk_matches_reference.

_IVF_PQ_NPROBE = 2

# IVF-PQ oracle = the coarse-quantizer replay (same CTE block as
# _SEMDEDUP_SQL: q/c0/iterations/final/ranked) + the PQ replay
# (_PQ_SUBSPACES) + cell-routed asymmetric scoring with multi-probe
# query routing (rn <= nprobe).
_IVF_PQ_SQL = f"""
    WITH q AS (
      SELECT vec_id,
             [CAST(round(CAST(x AS DOUBLE) * 1048576) AS DOUBLE)
              for x in embedding] AS qv
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    c0 AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < {_KM_CELLS}),
    {", ".join(_km_iter_sql(i) for i in range(_KM_ITERS))},
    final AS (
      SELECT q.vec_id, c.cid,
             list_inner_product(q.qv, c.cv)
               / (sqrt(list_inner_product(q.qv, q.qv))
                  * sqrt(list_inner_product(c.cv, c.cv))) AS cos
      FROM q, c{_KM_ITERS} c
    ),
    ranked AS (
      SELECT vec_id, cid AS cell, cos,
             row_number() OVER (
               PARTITION BY vec_id
               ORDER BY (CASE WHEN isnan(cos) THEN CAST('-infinity' AS DOUBLE)
                         ELSE cos END) DESC, cid) AS rn
      FROM final
    ),
    cells AS (SELECT vec_id, cell FROM ranked WHERE rn = 1),
    -- query-side multi-probe routing: each query searches its nprobe
    -- nearest cells (corpus vectors stay in exactly one cell, so the
    -- pair set cannot duplicate)
    probe AS (SELECT vec_id, cell FROM ranked WHERE rn <= {_IVF_PQ_NPROBE}),
    q0 AS (
      SELECT vec_id,
             [CAST(round(CAST(x AS DOUBLE) * 1048576) AS DOUBLE)
              for x in embedding] AS q
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    {_PQ_SUBSPACES},
    recon AS (
      SELECT q0.vec_id, {_PQ_RECON} AS r
      FROM q0 JOIN {_PQ_CODES_JOIN}
    ),
    qcell AS (
      SELECT q0.vec_id, q0.q, list_inner_product(q0.q, q0.q) AS n2, g.cell
      FROM q0 JOIN probe g USING (vec_id)
    ),
    rcell AS (
      SELECT r.vec_id, r.r, list_inner_product(r.r, r.r) AS rn2, g.cell
      FROM recon r JOIN cells g USING (vec_id)
    ),
    -- n2/rn2 > 0 mirror the kernel's isfinite mask (see knn_brute_cosine)
    pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round(list_inner_product(a.q, b.r)
                   / (sqrt(a.n2) * sqrt(b.rn2)), 6) AS cos_sim
      FROM qcell a JOIN rcell b
        ON a.cell = b.cell AND a.vec_id != b.vec_id
      WHERE a.vec_id < 100 AND a.n2 > 0 AND b.rn2 > 0
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM pairs
    ) WHERE rank <= {_PQ_TOPK}
"""


_PQ_SUBSPACES_RES = ",\n    ".join(
    _pq_sub_sql(s, "rv0") for s in range(_PQ_M)
)

# Residual IVF-PQ oracle (by_residual=true, the FAISS default): the
# same coarse replay, then PQ trains on and encodes the RESIDUAL
# x - coarse_centroid (exact integer differences), and reconstruction
# is centroid + pq(residual).
_IVF_PQ_RES_SQL = f"""
    WITH q AS (
      SELECT vec_id,
             [CAST(round(CAST(x AS DOUBLE) * 1048576) AS DOUBLE)
              for x in embedding] AS qv
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    c0 AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < {_KM_CELLS}),
    {", ".join(_km_iter_sql(i) for i in range(_KM_ITERS))},
    final AS (
      SELECT q.vec_id, c.cid,
             list_inner_product(q.qv, c.cv)
               / (sqrt(list_inner_product(q.qv, q.qv))
                  * sqrt(list_inner_product(c.cv, c.cv))) AS cos
      FROM q, c{_KM_ITERS} c
    ),
    ranked AS (
      SELECT vec_id, cid AS cell, cos,
             row_number() OVER (
               PARTITION BY vec_id
               ORDER BY (CASE WHEN isnan(cos) THEN CAST('-infinity' AS DOUBLE)
                         ELSE cos END) DESC, cid) AS rn
      FROM final
    ),
    probe AS (SELECT vec_id, cell FROM ranked WHERE rn <= {_IVF_PQ_NPROBE}),
    q0 AS (
      SELECT vec_id,
             [CAST(round(CAST(x AS DOUBLE) * 1048576) AS DOUBLE)
              for x in embedding] AS q
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    -- per-vector coarse centroid (rn=1 cell) and the residual
    cellcv AS (
      SELECT r.vec_id, r.cell, c.cv
      FROM ranked r JOIN c{_KM_ITERS} c ON r.cell = c.cid
      WHERE r.rn = 1
    ),
    rv0 AS (
      SELECT q0.vec_id,
             [q0.q[i] - g.cv[i]
              for i in generate_series(1, len(q0.q))] AS q
      FROM q0 JOIN cellcv g USING (vec_id)
    ),
    {_PQ_SUBSPACES_RES},
    pqr AS (
      SELECT q0.vec_id, {_PQ_RECON} AS r
      FROM q0 JOIN {_PQ_CODES_JOIN}
    ),
    recon AS (
      SELECT p.vec_id,
             [g.cv[i] + p.r[i]
              for i in generate_series(1, len(p.r))] AS r
      FROM pqr p JOIN cellcv g USING (vec_id)
    ),
    qcell AS (
      SELECT q0.vec_id, q0.q, list_inner_product(q0.q, q0.q) AS n2, g.cell
      FROM q0 JOIN probe g USING (vec_id)
    ),
    rcell AS (
      SELECT r.vec_id, r.r, list_inner_product(r.r, r.r) AS rn2, g.cell
      FROM recon r JOIN cellcv g USING (vec_id)
    ),
    -- n2/rn2 > 0 mirror the kernel's isfinite mask (see knn_brute_cosine)
    pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round(list_inner_product(a.q, b.r)
                   / (sqrt(a.n2) * sqrt(b.rn2)), 6) AS cos_sim
      FROM qcell a JOIN rcell b
        ON a.cell = b.cell AND a.vec_id != b.vec_id
      WHERE a.vec_id < 100 AND a.n2 > 0 AND b.rn2 > 0
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM pairs
    ) WHERE rank <= {_PQ_TOPK}
"""


@query("ann_ivf_pq_residual", oracle=_IVF_PQ_RES_SQL)
def ann_ivf_pq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ search (by_residual=true, the FAISS default):
    PQ codebooks train on and encode x - coarse_centroid, and the
    searched reconstruction is centroid + pq(residual) — better recall
    at the same bitrate. The oracle replays coarse training, residual
    computation, residual-PQ training/encoding, multi-probe routing,
    and the ranked search."""
    from solace_apache_beam_spark.llm.similarity import ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_topk(
        emb,
        emb.filter(F.col("vec_id") < 100),
        n_cells=_KM_CELLS,
        n_iters=_KM_ITERS,
        m=_PQ_M,
        k_codes=_PQ_K,
        n_iters_pq=_PQ_ITERS,
        k=_PQ_TOPK,
        nprobe=_IVF_PQ_NPROBE,
        by_residual=True,
    ).select("query_id", "neighbor_id", "cos_sim", "rank")


@query("ann_ivf_pq_cosine", oracle=_IVF_PQ_SQL)
def ann_ivf_pq_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search (the FAISS IndexIVFPQ shape): trained coarse cells
    route each query to its {_IVF_PQ_NPROBE} nearest inverted lists
    (multi-probe — the recall lever), where its exact vector is scored
    against PQ reconstructions. The oracle replays coarse training, PQ
    training, encoding, multi-probe routing, and the ranked search."""
    from solace_apache_beam_spark.llm.similarity import ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_topk(
        emb,
        emb.filter(F.col("vec_id") < 100),
        n_cells=_KM_CELLS,
        n_iters=_KM_ITERS,
        m=_PQ_M,
        k_codes=_PQ_K,
        n_iters_pq=_PQ_ITERS,
        k=_PQ_TOPK,
        nprobe=_IVF_PQ_NPROBE,
    ).select("query_id", "neighbor_id", "cos_sim", "rank")


_SPAN_N = 8


@query(
    "duplicate_spans",
    oracle=f"""
    -- NULL-id docs excluded on both engines (no identity => no match
    -- to report); dup = the identical word {_SPAN_N}-gram occurs in
    -- another doc; match_doc = smallest other doc sharing any dup span.
    -- Grams are keyed by the 60-bit md5-prefix hash of the gram text on
    -- BOTH engines (round 15 — the Spark side shuffles 8-byte keys, and
    -- hashing the identical UTF-8 bytes here means a collision merges
    -- the same grams everywhere: the shingle pipelines' argument)
    WITH w AS (SELECT doc_id, {{_WORDS}} AS words FROM documents
               WHERE doc_id IS NOT NULL),
    base AS (SELECT doc_id, words FROM w WHERE len(words) >= {_SPAN_N}),
    grams AS (
      SELECT doc_id, i AS pos,
             {_h64(f"array_to_string(words[i:i+{_SPAN_N - 1}], ' ')")} AS gram
      FROM (SELECT doc_id, words,
                   unnest(generate_series(1, len(words) - {_SPAN_N - 1})) AS i
            FROM base)
    ),
    gd AS (SELECT DISTINCT gram, doc_id FROM grams),
    ranked AS (
      SELECT gram, doc_id,
             row_number() OVER (PARTITION BY gram ORDER BY doc_id) AS rn
      FROM gd
    ),
    stats AS (
      SELECT gram, count(*) AS n_docs,
             min(CASE WHEN rn = 1 THEN doc_id END) AS m1,
             min(CASE WHEN rn = 2 THEN doc_id END) AS m2
      FROM ranked GROUP BY gram
    ),
    spans AS (
      SELECT g.doc_id, s.n_docs >= 2 AS dup,
             CASE WHEN g.doc_id <> s.m1 THEN s.m1 ELSE s.m2 END AS om
      FROM grams g JOIN stats s USING (gram)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_spans,
           sum(CASE WHEN dup THEN 1 ELSE 0 END) * 1.0 / count(*)
             AS dup_span_ratio,
           min(CASE WHEN dup THEN om END) AS match_doc
    FROM spans GROUP BY doc_id
    """.replace("{_WORDS}", _WORDS),
)
def duplicate_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span detection (Lee et al. 2021 exact-substring
    dedup at word-{_SPAN_N}-gram granularity): per-doc counts of spans
    whose text recurs in another document, plus the smallest matching
    doc — the span-level memorization/boilerplate curation signal."""
    from solace_apache_beam_spark.llm.dedup import duplicate_spans

    return duplicate_spans(
        load_table(spark, sf_dir, "documents"), n=_SPAN_N
    ).select("doc_id", "n_spans", "n_dup_spans", "dup_span_ratio", "match_doc")


@query(
    "embedding_centroids",
    oracle=f"""
    -- quantized integer sums: order-independent, so the vectorized
    -- Spark aggregation and this sequential fold agree bit-for-bit;
    -- the mean is ONE IEEE division of exact integers. NULL labels
    -- group together on both engines.
    WITH q AS (
      SELECT label,
             [CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)
              for x in embedding] AS qv
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    e AS (SELECT label, unnest(generate_series(1, len(qv))) AS i, qv FROM q)
    SELECT label, CAST(i - 1 AS INT) AS pos,
           CAST(sum(qv[i]) AS DOUBLE) / (count(*) * 1048576.0) AS centroid,
           count(*) AS n_vectors
    FROM e GROUP BY label, i
    """,
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (class prototypes): exact quantized
    integer sums make the grouped mean order-independent and
    engine-exact — one scalar row per (label, dimension)."""
    from solace_apache_beam_spark.llm.similarity import label_centroids

    return label_centroids(load_table(spark, sf_dir, "embeddings")).select(
        "label", "pos", "centroid", "n_vectors"
    )


# SQ8 oracle prefix: per-dim (min, max) of the quantized corpus, the
# affine 0..255 code, and the integer-grid reconstruction — every
# arithmetic step is either exact integers or ONE IEEE division, so
# Spark's codegen transforms and this SQL agree bit-for-bit.
_SQ8_PREFIX = """
    WITH q0 AS (
      SELECT vec_id,
             [CAST(round(CAST(x AS DOUBLE) * 1048576) AS DOUBLE)
              for x in embedding] AS q
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    el AS (
      SELECT vec_id, i AS pos, q[i] AS v
      FROM (SELECT vec_id, q, unnest(generate_series(1, len(q))) AS i
            FROM q0)
    ),
    st AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM el GROUP BY pos),
    enc AS (
      SELECT e.vec_id, e.pos,
             CAST(CASE WHEN s.mx > s.mn
                       THEN round((e.v - s.mn) * 255.0 / (s.mx - s.mn))
                       ELSE 0 END AS BIGINT) AS code,
             s.mn, s.mx
      FROM el e JOIN st s USING (pos)
    ),
    rec AS (
      SELECT vec_id, pos, code,
             mn + round(code * (mx - mn) / 255.0) AS r
      FROM enc
    )
"""


@query(
    "sq8_code_assign",
    oracle=f"""
    {_SQ8_PREFIX}
    SELECT vec_id, CAST(pos - 1 AS INT) AS pos, code FROM enc
    """,
)
def sq8_code_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization codes (the FAISS SQ8 codec): per-dim
    affine map of the quantized corpus range onto 0..255 — whole-stage
    codegen end to end (stats ride as array literals), oracle replays
    stats + coding per (vector, dimension)."""
    from solace_apache_beam_spark.llm.similarity import sq8_encode

    enc = sq8_encode(load_table(spark, sf_dir, "embeddings"))
    return enc.select(
        "vec_id", F.posexplode("codes").alias("pos", "code")
    )


@query(
    "ann_sq8_cosine",
    oracle=f"""
    {_SQ8_PREFIX},
    recon AS (SELECT vec_id, list(r ORDER BY pos) AS r FROM rec GROUP BY vec_id),
    qn AS (SELECT vec_id, q, list_inner_product(q, q) AS n2 FROM q0),
    rc AS (SELECT vec_id, r, list_inner_product(r, r) AS rn2 FROM recon),
    -- n2/rn2 > 0 mirror the kernel's isfinite mask (see knn_brute_cosine)
    pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round(list_inner_product(a.q, b.r)
                   / (sqrt(a.n2) * sqrt(b.rn2)), 6) AS cos_sim
      FROM qn a, rc b
      WHERE a.vec_id < 100 AND a.vec_id != b.vec_id
        AND a.n2 > 0 AND b.rn2 > 0
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM pairs
    ) WHERE rank <= {_PQ_TOPK}
    """,
)
def ann_sq8_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8-compressed approximate top-{_PQ_TOPK} cosine search: exact
    query vectors against integer-grid SQ8 reconstructions — 4x memory
    at near-exact recall (0.980 recall@5 measured at sf0.1). The
    oracle replays stats, coding, reconstruction, and the ranked
    search."""
    from solace_apache_beam_spark.llm.similarity import sq8_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return sq8_topk(emb, emb.filter(F.col("vec_id") < 100), k=_PQ_TOPK).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


_CURATION_SPAN_N, _CURATION_SPAN_CAP = 8, 0.5

# curation_pipeline oracle: the round-11 capstone composition. Every
# stage replays its standalone query's fragment verbatim (quality =
# training_data_pipeline's scored CTE; exact dedup = a window form of
# dedup_exact; spans = duplicate_spans' chain, sp-prefixed to avoid
# CTE-name collisions with the SemDeDup chain; semantic = the full
# _SEMDEDUP_SQL training+assignment+pruning replay over embeddings,
# joined on the 1:1 doc_id = vec_id alignment the driver data
# guarantees and embedding_coverage gates).
_CURATION_SQL = f"""
    WITH scored AS (
      SELECT doc_id,
             0.4 * (CAST({_stop_sql("en")} AS DOUBLE) / greatest(len(words), 1))
               + 0.3 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / greatest(length(text), 1))
               + 0.3 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / greatest(length(text), 1)) AS quality,
             len(words) AS n_tokens
      FROM (SELECT doc_id, text, {_WORDS} AS words FROM documents)
    ),
    exkeep AS (
      SELECT doc_id,
             min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
      FROM documents
    ),
    spw AS (SELECT doc_id, {_WORDS} AS words FROM documents
            WHERE doc_id IS NOT NULL),
    spbase AS (SELECT doc_id, words FROM spw
               WHERE len(words) >= {_CURATION_SPAN_N}),
    spgrams AS (
      -- 60-bit md5-prefix gram keys on both engines (round 15, same
      -- convention as duplicate_spans' oracle)
      SELECT doc_id,
             {_h64(f"array_to_string(words[i:i+{_CURATION_SPAN_N - 1}], ' ')")} AS gram
      FROM (SELECT doc_id, words,
                   unnest(generate_series(1, len(words) - {_CURATION_SPAN_N - 1})) AS i
            FROM spbase)
    ),
    spstats AS (
      SELECT gram, count(DISTINCT doc_id) AS n_docs FROM spgrams GROUP BY gram
    ),
    spratio AS (
      SELECT g.doc_id,
             sum(CASE WHEN s.n_docs >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*)
               AS dup_span_ratio
      FROM spgrams g JOIN spstats s USING (gram) GROUP BY g.doc_id
    ),
    q AS (
      SELECT vec_id,
             [CAST(round(CAST(x AS DOUBLE) * 1048576) AS DOUBLE)
              for x in embedding] AS qv
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    c0 AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < {_KM_CELLS}),
    {", ".join(_km_iter_sql(i) for i in range(_KM_ITERS))},
    final AS (
      SELECT q.vec_id, c.cid,
             list_inner_product(q.qv, c.cv)
               / (sqrt(list_inner_product(q.qv, q.qv))
                  * sqrt(list_inner_product(c.cv, c.cv))) AS cos
      FROM q, c{_KM_ITERS} c
    ),
    ranked AS (
      SELECT vec_id, cid AS cell, cos,
             row_number() OVER (
               PARTITION BY vec_id
               ORDER BY (CASE WHEN isnan(cos) THEN CAST('-infinity' AS DOUBLE)
                         ELSE cos END) DESC, cid) AS rn
      FROM final
    ),
    asg AS (
      SELECT r.vec_id, r.cell, q.qv,
             list_inner_product(q.qv, q.qv) AS n2
      FROM ranked r JOIN q USING (vec_id) WHERE r.rn = 1
    ),
    sempairs AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             round(list_inner_product(a.qv, b.qv)
                   / (sqrt(a.n2) * sqrt(b.n2)), 6) AS cos
      FROM asg a JOIN asg b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE a.n2 > 0 AND b.n2 > 0
    ),
    semdups AS (
      SELECT DISTINCT ib AS vec_id FROM sempairs WHERE cos >= {_SEMDEDUP_TAU}
    ),
    clean AS (
      SELECT s.doc_id, s.n_tokens
      FROM scored s
      JOIN exkeep e ON s.doc_id = e.doc_id
      LEFT JOIN spratio r ON s.doc_id = r.doc_id
      WHERE s.quality >= 0.5
        AND e.doc_id = e.keep_id
        AND coalesce(r.dup_span_ratio, 0) < {_CURATION_SPAN_CAP}
        AND s.doc_id NOT IN (SELECT vec_id FROM semdups)
    ),
    assigned AS (
      SELECT doc_id, n_tokens,
             CASE WHEN b < 8000 THEN 'train'
                  WHEN b < 9000 THEN 'val' ELSE 'test' END AS split
      FROM (SELECT doc_id, n_tokens,
                   ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   % 10000 AS b
            FROM clean)
    )
    SELECT split, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM assigned GROUP BY 1
"""


@query("curation_pipeline", oracle=_CURATION_SQL)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-11 capstone composition — every curation screen in one
    declarative graph: quality gate, exact dedup (keep the lowest id
    per content hash, window form so NULL texts group consistently),
    duplicated-span cap (drop docs whose word-8-gram dup ratio reaches
    0.5), SemDeDup semantic screen over the aligned embeddings, then
    deterministic splits and the per-split manifest. Catalyst fuses the
    text-derived stages over one documents scan."""
    from pyspark.sql.window import Window

    from solace_apache_beam_spark.functions.sampling import assign_splits
    from solace_apache_beam_spark.llm.dedup import duplicate_spans
    from solace_apache_beam_spark.llm.similarity import semantic_dedup as sd
    from solace_apache_beam_spark.llm.text_analysis import quality_score

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    # ONE projection carries quality, n_tokens and the exact-dedup
    # window (round 14): the former three separate branches (scored /
    # keep / base) were 1:1 per-row derivations of the SAME documents
    # scan, joined back on doc_id — three scans and two joins for
    # columns one select can produce. Value-identical: n_tokens ==
    # quality_score's n_words (the same size(words_expr) expression);
    # the keep window is carried verbatim; the inner joins' only
    # semantic content on a unique-id corpus (the engine's documents
    # invariant) was dropping NULL doc_ids, which the
    # doc_id == keep_id filter below already does (NULL == x is never
    # true). Proven by oracle parity at sf0.01 and sf0.1.
    merged = (
        quality_score(docs, extra_cols=("text",))
        .withColumn(
            "keep_id",
            F.min("doc_id").over(Window.partitionBy(F.md5("text"))),
        )
        .select(
            "doc_id",
            "quality",
            F.col("n_words").alias("n_tokens"),
            "keep_id",
        )
    )
    spans = duplicate_spans(docs, n=_CURATION_SPAN_N, with_match=False).select(
        "doc_id", "dup_span_ratio"
    )
    sem = sd(
        emb, n_cells=_KM_CELLS, n_iters=_KM_ITERS, threshold=_SEMDEDUP_TAU
    )
    semdups = sem.filter(F.col("is_dup")).select(
        F.col("vec_id").alias("doc_id")
    )
    clean = (
        merged
        .join(spans, "doc_id", "left")
        .filter(
            (F.col("quality") >= 0.5)
            & (F.col("doc_id") == F.col("keep_id"))
            & (
                F.coalesce(F.col("dup_span_ratio"), F.lit(0.0))
                < _CURATION_SPAN_CAP
            )
        )
        .join(semdups, "doc_id", "left_anti")
    )
    out = assign_splits(clean, "doc_id").groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    from solace_apache_beam_spark.functions.caching import attach_plan_caches

    return attach_plan_caches(
        out.select("split", "n_docs", "n_tokens"),
        sem.plan_caches._frames,
    )


@query(
    "training_shuffle_manifest",
    oracle="""
    -- NULL-id rows excluded on both engines: no key => no hash
    -- identity => no deterministic position in the permutation
    WITH h AS (
      SELECT doc_id,
             ('0x' || substr(md5('shuffle:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM documents
      WHERE doc_id IS NOT NULL
    )
    SELECT h % 8 AS shard,
           CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS BIGINT) AS pos,
           doc_id
    FROM h
    """,
)
def training_shuffle_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudorandom global shuffle addresses (shard, pos)
    per doc — the reproducible training-order permutation (orderBy(rand())
    is partitioning-dependent; this is a pure function of the key)."""
    from solace_apache_beam_spark.functions.sampling import training_shuffle

    return training_shuffle(load_table(spark, sf_dir, "documents"), "doc_id")


@query(
    "text_repetition",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
    base AS (SELECT doc_id, words, CAST(len(words) AS BIGINT) AS n_words
             FROM w WHERE len(words) >= 1),
    wc AS (SELECT doc_id, x AS word, count(*) AS c
           FROM (SELECT doc_id, unnest(words) AS x FROM base)
           GROUP BY 1, 2),
    top AS (SELECT doc_id, max(c) AS top_c FROM wc GROUP BY 1),
    grams AS (SELECT doc_id, n_words,
      CASE WHEN n_words >= 2 THEN 1.0 -
        len(list_distinct([array_to_string(words[i:i+1], ' ')
                           for i in generate_series(1, len(words) - 1)]))
        * 1.0 / (n_words - 1) ELSE 0.0 END AS dup_2gram_fraction,
      CASE WHEN n_words >= 3 THEN 1.0 -
        len(list_distinct([array_to_string(words[i:i+2], ' ')
                           for i in generate_series(1, len(words) - 2)]))
        * 1.0 / (n_words - 2) ELSE 0.0 END AS dup_3gram_fraction
      FROM base)
    SELECT g.doc_id, g.n_words,
           top.top_c * 1.0 / g.n_words AS top_word_fraction,
           g.dup_2gram_fraction, g.dup_3gram_fraction
    FROM grams g JOIN top ON g.doc_id = top.doc_id
    """,
)
def text_repetition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-doc repetition signals: top-word fraction and
    duplicate word-n-gram fractions (boilerplate/degenerate-generation
    filters for training corpora)."""
    from solace_apache_beam_spark.llm.text_analysis import text_repetition

    return text_repetition(load_table(spark, sf_dir, "documents"))


@query(
    "embedding_coverage",
    oracle="""
    WITH assigned AS (
      SELECT doc_id,
             CASE WHEN b < 8000 THEN 'train'
                  WHEN b < 9000 THEN 'val' ELSE 'test' END AS split
      FROM (SELECT doc_id,
                   ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   % 10000 AS b
            FROM documents)
    )
    SELECT split, count(*) AS n_docs,
           CAST(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_with_embedding,
           sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / count(*)
             AS coverage
    FROM assigned a LEFT JOIN embeddings e ON a.doc_id = e.vec_id
    GROUP BY 1
    """,
)
def embedding_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-to-embedding alignment per split: which documents have a
    vector (doc_id = vec_id), per train/val/test — the coverage
    manifest before any embedding-dependent stage. One keyed equi-join
    + one small agg."""
    from solace_apache_beam_spark.functions.sampling import assign_splits

    docs = assign_splits(load_table(spark, sf_dir, "documents"), "doc_id")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("_vid")
    )
    joined = docs.join(emb, docs.doc_id == F.col("_vid"), "left")
    return joined.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("_vid").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_with_embedding"),
        (
            F.sum(F.when(F.col("_vid").isNotNull(), 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("coverage"),
    )


@query(
    "decontamination_report",
    oracle=f"""
    WITH {_DOC_BASE},
    hold AS (SELECT DISTINCT unnest(hlist) AS shingle FROM hs
             WHERE doc_id % 10 = 0),
    tr AS (SELECT doc_id, hlist FROM hs WHERE doc_id % 10 <> 0),
    cnt AS (
      SELECT t.doc_id, count(*) AS n_cont
      FROM (SELECT doc_id, unnest(hlist) AS shingle FROM tr) t
      JOIN hold ON t.shingle = hold.shingle
      GROUP BY 1
    )
    SELECT tr.doc_id,
           CAST(len(tr.hlist) AS BIGINT) AS n_shingles,
           CAST(coalesce(cnt.n_cont, 0) AS BIGINT) AS n_contaminated,
           coalesce(cnt.n_cont, 0) * 1.0 / len(tr.hlist) AS contamination
    FROM tr LEFT JOIN cnt ON tr.doc_id = cnt.doc_id
    """,
)
def decontamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per train doc (doc_id % 10 != 0),
    the fraction of its shingles found anywhere in the holdout corpus
    (doc_id % 10 = 0) — the test-set-leakage hygiene pass."""
    from solace_apache_beam_spark.llm.dedup import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    return decontaminate(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
    )


@query(
    "incremental_dedup",
    oracle=f"""
    WITH {_MINHASH_BASE},
    newdocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0),
    corpdocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 0),
    exact AS (
      SELECT n.doc_id AS doc_id, min(c.doc_id) AS match_id
      FROM newdocs n JOIN corpdocs c ON md5(n.text) = md5(c.text)
      GROUP BY 1
    ),
    bn AS (SELECT doc_id AS new_id, band, band_hash FROM bands
           WHERE doc_id % 4 = 0
             AND doc_id NOT IN (SELECT doc_id FROM exact)),
    bc AS (SELECT doc_id AS corp_id, band, band_hash FROM bands
           WHERE doc_id % 4 <> 0),
    ok AS (SELECT band, band_hash FROM bc
           GROUP BY 1, 2 HAVING count(*) <= {_MAX_BUCKET}),
    cand AS (
      SELECT DISTINCT bn.new_id, bc.corp_id
      FROM bn
      JOIN ok ON bn.band = ok.band AND bn.band_hash = ok.band_hash
      JOIN bc ON bn.band = bc.band AND bn.band_hash = bc.band_hash
    ),
    ver AS (
      SELECT new_id, corp_id,
             len(list_intersect(sn.hlist, sc.hlist)) * 1.0
               / len(list_distinct(list_concat(sn.hlist, sc.hlist))) AS jaccard
      FROM cand
      JOIN hs sn ON cand.new_id = sn.doc_id
      JOIN hs sc ON cand.corp_id = sc.doc_id
    ),
    near AS (
      SELECT new_id, corp_id AS match_id, jaccard,
             row_number() OVER (PARTITION BY new_id
                                ORDER BY jaccard DESC, corp_id) AS rn
      FROM ver WHERE jaccard >= 0.5
    )
    SELECT doc_id, 'exact_dup' AS status, match_id,
           CAST(NULL AS DOUBLE) AS jaccard
    FROM exact
    UNION ALL
    SELECT new_id AS doc_id, 'near_dup' AS status, match_id, jaccard
    FROM near WHERE rn = 1
    UNION ALL
    SELECT doc_id, 'unique' AS status, CAST(NULL AS BIGINT) AS match_id,
           CAST(NULL AS DOUBLE) AS jaccard
    FROM newdocs
    WHERE doc_id NOT IN (SELECT doc_id FROM exact)
      AND doc_id NOT IN (SELECT new_id FROM near WHERE rn = 1)
    """,
)
def incremental_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup an incoming batch (doc_id % 4 = 0) against the reference
    corpus (the rest): exact content-hash check, then MinHash-LSH
    near-dup against the corpus band index, batch-vs-corpus only —
    the continuously-ingesting pipeline shape where the corpus index
    is precomputed and only the batch is signatured per run."""
    from solace_apache_beam_spark.llm.dedup import incremental_dedup

    docs = load_table(spark, sf_dir, "documents")
    return incremental_dedup(
        docs.filter(F.col("doc_id") % 4 == 0),
        docs.filter(F.col("doc_id") % 4 != 0),
    )


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by 128-bit content hash; keep lowest doc_id per group.
    One shuffle on the hash."""
    from solace_apache_beam_spark.llm.dedup import exact_dedup_groups

    return exact_dedup_groups(load_table(spark, sf_dir, "documents"))


@query(
    "minhash_band_hashes",
    oracle=f"WITH {_MINHASH_BASE} SELECT doc_id, band, band_hash FROM bands",
)
def minhash_band_hashes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature + LSH band hashes per document (all map-side;
    the oracle replays every permutation bit-for-bit)."""
    from solace_apache_beam_spark.llm.dedup import minhash_band_hashes

    return minhash_band_hashes(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_MINHASH_BASE},
    {_CAND_SQL}
    SELECT doc_a, doc_b,
           len(list_intersect(sa.hlist, sb.hlist)) * 1.0
             / len(list_distinct(list_concat(sa.hlist, sb.hlist))) AS jaccard
    FROM cand
    JOIN hs sa ON cand.doc_a = sa.doc_id
    JOIN hs sb ON cand.doc_b = sb.doc_id
    WHERE jaccard >= 0.5
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs: band-bucket candidates verified with
    exact shingle Jaccard, threshold 0.5."""
    from solace_apache_beam_spark.llm.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_minhash_rescue",
    # the oracle replays BOTH passes of the screen-then-rescue
    # composition: the (16, 4) DEFAULT over the whole corpus and the
    # (64, 32) HIGH_RECALL over the mod-4 partition (the partition the
    # recall measurements use, scripts/measure_rescue.py), then
    # resolves overlap screen-first — the same min-priority rule as the
    # Spark-side min(struct) aggregation. Jaccard is the identical
    # exact int/int double in both passes, so min(jaccard) per pair is
    # a no-op value-wise.
    oracle=f"""
    WITH {_DOC_BASE},
    {_minhash_pass_sql(16, 4, "hs", "_s")},
    hp AS (SELECT * FROM hs WHERE doc_id % 4 = 0),
    {_minhash_pass_sql(64, 32, "hp", "_r")},
    u AS (
      SELECT doc_a, doc_b, jaccard, 0 AS prio, 'screen' AS source FROM pairs_s
      UNION ALL
      SELECT doc_a, doc_b, jaccard, 1 AS prio, 'rescue' AS source FROM pairs_r
    )
    SELECT doc_a, doc_b, min(jaccard) AS jaccard,
           CASE WHEN min(prio) = 0 THEN 'screen' ELSE 'rescue' END AS source
    FROM u GROUP BY 1, 2
    """,
)
def dedup_minhash_rescue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Screen-then-rescue MinHash composition (the round-7 operator,
    gated round 8 — VERDICT r7 Next #2): corpus-wide DEFAULT screen
    plus HIGH_RECALL rescue on the mod-4 partition of interest, union
    with provenance, screen winning on overlap."""
    from solace_apache_beam_spark.llm.dedup import minhash_lsh_pairs_rescue

    return minhash_lsh_pairs_rescue(
        load_table(spark, sf_dir, "documents"), F.col("doc_id") % 4 == 0
    )


@query(
    "dedup_simhash",
    # 60-bit signature over the 60-bit md5-prefix token hash (round 6,
    # was 32/32: 8-bit band slices saturate the bucket cap past ~256k
    # docs). 60 = the widest md5-hex-prefix integer that stays
    # non-negative in BIGINT on both engines — no sign-bit cases in the
    # shift/popcount arithmetic.
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
    h AS (SELECT doc_id, [{_h64("x")} for x in words] AS hlist FROM w WHERE len(words) > 0)
    SELECT doc_id,
           CAST(list_sum([
             CASE WHEN CAST(list_sum([
                    CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END
                  for h in hlist]) AS BIGINT) > 0
                  THEN (1::BIGINT << b) ELSE 0 END
           for b in generate_series(0, 59)]) AS BIGINT) AS simhash
    FROM h
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash signatures (near-dup = equal/near-equal
    signatures); map-side only."""
    from solace_apache_beam_spark.llm.dedup import simhash_signatures

    return simhash_signatures(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_ngram_jaccard",
    # the oracle enumerates candidates from ANY shared shingle (a
    # superset of the prefix-filter candidates, which are provably
    # complete for J >= t) and computes the same full-universe exact
    # Jaccard — both engines agree on every pair at/above threshold
    oracle=f"""
    WITH {_DOC_BASE},
    inv AS (SELECT doc_id, unnest(hlist) AS shingle FROM hs),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    sz AS (SELECT doc_id, count(*) AS sz FROM inv GROUP BY 1)
    SELECT doc_a, doc_b,
           n_inter * 1.0 / (sa.sz + sb.sz - n_inter) AS jaccard
    FROM inter
    JOIN sz sa ON inter.doc_a = sa.doc_id
    JOIN sz sb ON inter.doc_b = sb.doc_id
    WHERE n_inter * 1.0 / (sa.sz + sb.sz - n_inter) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram Jaccard pairs >= 0.5 via a prefix-filtered similarity
    join (AllPairs/PPJoin): rarest-first prefixes generate a complete
    candidate set for the threshold; exact intersect/union on the full
    shingle sets verifies. TRUE full-universe Jaccard — no df-cutoff
    bias (the former retained-universe form also paid sum C(df,2) pair
    instances, measured 6.75B at the 100x stress point)."""
    from solace_apache_beam_spark.llm.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


_LANGS_SORTED = sorted(STOPWORDS)
_PRED_SQL = "CASE " + " ".join(
    f"WHEN score_{lg} = best THEN '{lg}'" for lg in _LANGS_SORTED
) + " END"


@query(
    "text_language_id",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
    scored AS (
      SELECT doc_id,
             {", ".join(f"{_stop_sql(lg)} AS score_{lg}" for lg in STOPWORDS)}
      FROM w
    ),
    m AS (SELECT *, greatest({", ".join(f"score_{lg}" for lg in STOPWORDS)}) AS best FROM scored)
    SELECT doc_id, {", ".join(f"score_{lg}" for lg in STOPWORDS)},
           {_PRED_SQL} AS predicted_lang
    FROM m
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language id with per-language scores and
    deterministic argmax."""
    from solace_apache_beam_spark.llm.text_analysis import language_id

    return language_id(load_table(spark, sf_dir, "documents"))


@query(
    "text_quality",
    oracle=f"""
    WITH w AS (SELECT doc_id, text, {_WORDS} AS words FROM documents),
    base AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(words) AS BIGINT) AS n_words,
             CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS BIGINT) AS n_punct,
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
             {_stop_sql("en")} AS n_stopwords
      FROM w
    )
    SELECT *,
           CAST(n_chars - (n_words - 1) AS DOUBLE) / greatest(n_words, 1) AS avg_word_len,
           CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) AS punct_ratio,
           CAST(n_digits AS DOUBLE) / greatest(n_chars, 1) AS digit_ratio,
           CAST(n_stopwords AS DOUBLE) / greatest(n_words, 1) AS stopword_ratio,
           0.4 * (CAST(n_stopwords AS DOUBLE) / greatest(n_words, 1))
             + 0.3 * (1.0 - CAST(n_punct AS DOUBLE) / greatest(n_chars, 1))
             + 0.3 * (1.0 - CAST(n_digits AS DOUBLE) / greatest(n_chars, 1)) AS quality
    FROM base
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features (length/punct/digit/stopword ratios) + combined
    score; map-side."""
    from solace_apache_beam_spark.llm.text_analysis import quality_score

    return quality_score(load_table(spark, sf_dir, "documents"))


@query(
    "source_quality_gate",
    oracle=f"""
    WITH w AS (SELECT doc_id, source, text, {_WORDS} AS words FROM documents),
    base AS (
      SELECT doc_id, source,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(words) AS BIGINT) AS n_words,
             CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS BIGINT) AS n_punct,
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
             {_stop_sql("en")} AS n_stopwords
      FROM w
    ),
    scored AS (
      SELECT *,
             0.4 * (CAST(n_stopwords AS DOUBLE) / greatest(n_words, 1))
               + 0.3 * (1.0 - CAST(n_punct AS DOUBLE) / greatest(n_chars, 1))
               + 0.3 * (1.0 - CAST(n_digits AS DOUBLE) / greatest(n_chars, 1)) AS quality
      FROM base
    ),
    stats AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(CASE WHEN quality < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality,
             sum(n_chars) AS total_chars
      FROM scored GROUP BY 1
    )
    SELECT source, n_docs, n_low_quality,
           n_low_quality * 1.0 / n_docs AS low_quality_fraction,
           total_chars * 1.0 / n_docs AS avg_chars,
           (n_low_quality * 1.0 / n_docs <= 0.3 AND n_docs >= 10) AS keep
    FROM stats
    """,
)
def source_quality_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source keep/drop gate from integer-exact quality aggregates
    (crawl-source filtering before training export)."""
    from solace_apache_beam_spark.llm.text_analysis import source_quality_gate

    return source_quality_gate(load_table(spark, sf_dir, "documents"))


@query(
    "text_token_counts",
    oracle=f"""
    WITH w AS (SELECT doc_id, text, {_WORDS} AS words FROM documents)
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[\\p{{L}}]+|[0-9]+|[^\\s\\p{{L}}0-9]')) AS BIGINT) AS n_bpe_tokens,
           -- the coalesce covers EMPTY word lists only (list_sum([])
           -- is NULL, Spark's aggregate init is 0); NULL words stays
           -- NULL like the other two counts (same guard as _stop_sql)
           CASE WHEN words IS NULL THEN NULL ELSE
             CAST(coalesce(list_sum([CAST(ceil(length(x) / 4.0) AS BIGINT) for x in words]), 0) AS BIGINT)
           END AS n_subword_est
    FROM w
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace / BPE-ish-regex / subword-estimate token counts."""
    from solace_apache_beam_spark.llm.text_analysis import token_counts

    return token_counts(load_table(spark, sf_dir, "documents"))


@query(
    "text_fingerprint",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents)
    SELECT doc_id,
           -- NULL text -> NULL fingerprint (absent content has no
           -- measurement; DuckDB's list_prepend(0, NULL) would
           -- otherwise fold to 0, aliasing NULL text with EMPTY text)
           CASE WHEN words IS NULL THEN NULL ELSE
             list_reduce(
               list_prepend(0::BIGINT, [{_h32("x")} for x in words]),
               (acc, x) -> (acc * 31 + x) & {FINGERPRINT_MASK}
             )
           END AS fingerprint
    FROM w
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash fingerprint over the word sequence
    (order-sensitive, sequential fold on both engines)."""
    from solace_apache_beam_spark.llm.text_analysis import fingerprints

    return fingerprints(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

# Fixed-point embedding CTE: q = round(x * 2^20) held as BIGINT. Dots
# and squared norms are then exact integer sums — identical under any
# summation order, so the Spark side can use vectorized numpy matmul
# (every intermediate < 2^53 is exact in float64) while this SQL folds
# sequentially, and the values still agree bit-for-bit.
_QE = """
  qe AS (SELECT vec_id,
                [CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT) for x in embedding] AS q
         -- undecoded rows carry no vector (similarity.py filters them
         -- in every packer/bucketizer); without the filter a NULL
         -- embedding maps to q NULL whose n2 list_prepend-folds to 0
         -- and the row scores as a phantom zero vector
         FROM embeddings WHERE embedding IS NOT NULL),
  qn AS (SELECT vec_id, q,
                list_reduce(list_prepend(0::BIGINT, [x * x for x in q]),
                            (s, x) -> s + x) AS n2
         FROM qe)
"""
_QDOT = (
    "list_reduce(list_prepend(0::BIGINT, "
    "[a.q[i] * b.q[i] for i in generate_series(1, len(a.q))]), (s, x) -> s + x)"
)
_QCOS = (
    f"round(CAST({_QDOT} AS DOUBLE) / "
    "(sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))), 6)"
)


@query(
    "knn_brute_cosine",
    oracle=f"""
    WITH {_QE},
    -- n2 > 0 mirrors the Spark kernel's np.isfinite mask: a zero-norm
    -- vector has NaN cosine with everything, which DuckDB would sort
    -- ABOVE every real score (NaN ranks greatest) while Spark drops it
    pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_QCOS} AS cos_sim
      FROM qn a, qn b
      WHERE a.vec_id < 100 AND a.vec_id != b.vec_id
        AND a.n2 > 0 AND b.n2 > 0
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM pairs
    ) WHERE rank <= 10
    """,
)
def knn_brute_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force top-10 cosine neighbors for the first 100
    vectors (query set broadcast; corpus never shuffles)."""
    from solace_apache_beam_spark.llm.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, emb.filter(F.col("vec_id") < 100)).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


_N_PLANES, _ANN_K = 4, 5


def _plane_dot(p: int) -> str:
    """Integer projection of the quantized vector onto hyperplane p
    (coefficients +-1 from md5("p:d"))."""
    coef = (
        f"((('0x' || substr(md5('{p}:' || CAST(i - 1 AS VARCHAR)), 1, 8))::BIGINT & 1) * 2 - 1)"
    )
    return (
        f"list_reduce(list_prepend(0::BIGINT, [q[i] * {coef} "
        f"for i in generate_series(1, len(q))]), (s, x) -> s + x)"
    )


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN {_plane_dot(p)} >= 0 THEN {1 << p} ELSE 0 END)"
    for p in range(_N_PLANES)
)


@query(
    "ann_lsh_cosine",
    oracle=f"""
    WITH {_QE},
    bucketed AS (
      SELECT vec_id, q, n2, CAST({_BUCKET_SQL} AS BIGINT) AS bucket
      FROM qn
    ),
    -- n2 > 0: zero-norm guard matching the kernel's isfinite mask
    -- (see knn_brute_cosine)
    pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_QCOS} AS cos_sim
      FROM bucketed a JOIN bucketed b
        ON a.bucket = b.bucket AND a.vec_id != b.vec_id
      WHERE a.n2 > 0 AND b.n2 > 0
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM pairs
    ) WHERE rank <= {_ANN_K}
    """,
)
def ann_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 neighbors via random-hyperplane LSH buckets +
    in-bucket brute force (the 100 TB scale path; bucket count is the
    recall/cost knob)."""
    from solace_apache_beam_spark.llm.similarity import ann_lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_lsh_topk(emb, n_planes=_N_PLANES, k=_ANN_K).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


# Shared verbatim by embedding_neardup (route="exact") and
# embedding_neardup_auto (route="auto") — the same deliberate aliasing
# as _SIMHASH_PAIRS_ORACLE: below neardup_auto_route's 64-block horizon
# (262,144 vectors at dense ids; counted on the kernel's own
# id//block_size block population per ADVICE r9) the auto route IS the
# exact plan, so the gate proves the count-and-route derivation
# end-to-end against the unchanged exact truth; a derivation bug that
# flipped to the LSH route at gate scale would drop cross-bucket pairs
# and hash-mismatch.
_NEARDUP_ORACLE = f"""
    WITH {_QE}
    -- n2 > 0: zero-norm guard matching the kernel's isfinite mask (a
    -- NaN cosine satisfies >= 0.4 in DuckDB; Spark drops the pair)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_QCOS} AS cos_sim
    FROM qn a, qn b
    WHERE a.vec_id < b.vec_id AND a.n2 > 0 AND b.n2 > 0 AND {_QCOS} >= 0.4
    """


# embedding_neardup (the FIXED exact route) was a registered gate
# through round 12; consolidated round 13 (VERDICT r12 Next #6,
# registry growth freeze): embedding_neardup_auto runs the SAME oracle
# verbatim and routes to the same exact kernel at every gate scale, so
# the fixed-route row was a superseded baseline. The exact route keeps
# randomized-differential coverage in test_properties_similarity.
# test_neardup_pairs_matches_reference(route="exact").


@query("embedding_neardup_auto", oracle=_NEARDUP_ORACLE)
def embedding_neardup_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs with the corpus-size-derived route
    (``route="auto"`` — count the BLOCK population the exact kernel
    would pack, stay exact at or below the 64-block horizon (262,144
    vectors at dense ids), switch to LSH-bucketed candidates above it;
    VERDICT r8 Next #1, the last prose-only scale escape made
    executable; routing counts blocks, not rows, per ADVICE r9). Gate
    scale sits below the horizon, so this must reproduce the exact
    oracle verbatim THROUGH the derivation."""
    from solace_apache_beam_spark.llm.similarity import neardup_pairs

    return neardup_pairs(
        load_table(spark, sf_dir, "embeddings"), route="auto"
    ).select("id_a", "id_b", "cos_sim")


def _table_bucket_sql(t: int, n_planes: int) -> str:
    """Bucket id of multi-table neardup LSH table ``t`` — sign bits of
    the quantized vector's integer projections onto planes
    [t*n_planes, (t+1)*n_planes) (the plane_offset stream of
    similarity._plane_coeffs), offset by t << n_planes exactly like
    neardup_pairs_lsh's table union."""
    bits = " + ".join(
        f"(CASE WHEN {_plane_dot(t * n_planes + p)} >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(n_planes)
    )
    return f"CAST({bits} + {t << n_planes} AS BIGINT)"


_NEARDUP_LSH_PLANES, _NEARDUP_LSH_TABLES = 4, 2

# The LSH route's own gate (VERDICT r10 Next #1): unlike _NEARDUP_ORACLE
# (exact all-pairs truth the below-horizon routes must reproduce), this
# oracle REPLAYS the scale path's candidate generation — per table,
# bucket on the seeded hyperplane signs; pairs must collide in >= 1
# table (OR-construction, DISTINCT collapses multi-table hits exactly
# like the kernel's dedup_pairs distinct); in-bucket scoring is the
# same integer-quantized cosine. Deterministic because the planes are
# an md5 stream, so the approximate route is value-hash reproducible —
# the same replay pattern dedup_minhash_lsh's oracle proves for
# MinHash banding. Sub-blocking inside a bucket is batching only and
# cannot change the output.
_NEARDUP_LSH_ORACLE = f"""
    WITH {_QE},
    bucketed AS (
      {" UNION ALL ".join(
        f"SELECT vec_id, q, n2, {_table_bucket_sql(t, _NEARDUP_LSH_PLANES)} AS bucket FROM qn"
        for t in range(_NEARDUP_LSH_TABLES)
      )}
    )
    -- n2 > 0: zero-norm guard matching the kernel's isfinite mask
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, {_QCOS} AS cos_sim
    FROM bucketed a JOIN bucketed b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE a.n2 > 0 AND b.n2 > 0 AND {_QCOS} >= 0.4
    """


@query("embedding_neardup_lsh", oracle=_NEARDUP_LSH_ORACLE)
def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs through the LSH-bucketed corpus-scale
    route ITSELF (threshold 0.4, pinned 4 planes x 2 tables — 16 real
    buckets per table at gate scale, so the plan genuinely takes the
    bucketed branch rather than the single-bucket degenerate form).
    The auto gate (embedding_neardup_auto) proves the routing
    derivation below the horizon; this row proves the above-horizon
    path's own semantics against a DuckDB replay of the hyperplane
    bucketing + in-bucket integer-quantized cosine (VERDICT r10 Next
    #1 — previously verified only by differentials and measured
    recall)."""
    from solace_apache_beam_spark.llm.similarity import neardup_pairs_lsh

    return neardup_pairs_lsh(
        load_table(spark, sf_dir, "embeddings"),
        threshold=0.4,
        n_planes=_NEARDUP_LSH_PLANES,
        n_tables=_NEARDUP_LSH_TABLES,
    ).select("id_a", "id_b", "cos_sim")


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id, 'text' AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata columns (modality, byte size,
    checksum) — the multimodal record shape."""
    from solace_apache_beam_spark.llm.multimodal import attach_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    return attach_binary_payload(docs).drop("payload")


@query(
    "multimodal_features",
    oracle="""
    -- round 14 (real decode path): the Spark side wraps each doc's
    -- UTF-8 bytes as an actual 24-bit BMP (attach_bmp_payload, width 4
    -- so rows are padding-free), REAL-decodes it (decode_image), and
    -- histograms the decoded pixel samples. Because the BMP wrap is
    -- lossless over whole 12-byte rows and a histogram is
    -- order-invariant, the decoded-sample histogram equals the
    -- histogram over the first (octet_length // 12) * 12 text bytes —
    -- which DuckDB computes via the hex trick (one byte = one hex
    -- pair; ('0x' || pair)::INT is the byte value). Wrong header
    -- offsets/strides on the decode side change the sample multiset
    -- and break the match; row/channel ORDER is pinned separately by
    -- the byte-level pytest vectors. Docs shorter than one pixel row
    -- produce no record (absent-media convention) — mirrored by the
    -- used > 0 filter.
    WITH d AS (SELECT doc_id, hex(encode(text)) AS hx,
                      (octet_length(encode(text)) // 12) * 12 AS used
               FROM documents WHERE text IS NOT NULL
                 AND octet_length(encode(text)) >= 12),
    pos AS (SELECT doc_id, hx, used,
                   unnest(generate_series(1, used)) AS i
            FROM d),
    cnt AS (SELECT doc_id,
                   ('0x' || substr(hx, 2 * i - 1, 2))::INT % 16 AS bin,
                   count(*) AS c
            FROM pos GROUP BY 1, 2),
    bins AS (SELECT doc_id, used, unnest(generate_series(0, 15)) AS bin
             FROM d)
    SELECT bins.doc_id, CAST(bins.bin AS INT) AS bin,
           coalesce(cnt.c, 0) / CAST(bins.used AS DOUBLE) AS value
    FROM bins LEFT JOIN cnt ON bins.doc_id = cnt.doc_id AND bins.bin = cnt.bin
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over REAL-decoded image payloads: each doc's
    bytes wrapped as a 24-bit BMP, decoded by the pure-python codec
    (decode_image), normalized byte histogram over the decoded pixel
    samples, posexploded to (doc_id, bin, value) scalars for the exact
    value-hash gate. Per-bin values are integer counts divided once in
    IEEE double — identical on both engines. (Round 14: consolidates
    the former raw-payload histogram — extract_features keeps its own
    pytest coverage — so the registry stays at 83 under the growth
    freeze while the decode path gains a driver oracle gate.)"""
    from solace_apache_beam_spark.llm.multimodal import (
        attach_bmp_payload,
        decode_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = decode_features(attach_bmp_payload(docs))
    return feats.select(
        "doc_id", F.posexplode("features").alias("bin", "value")
    ).withColumn("bin", F.col("bin").cast("int"))


@query(
    "multimodal_frame_sample",
    oracle="""
    -- restated over hex (round 9): frames are BYTE slices, so both
    -- engines slice the hex encoding (one byte = one hex pair; frame
    -- fi covers hex chars [fi*128+1, fi*128+128]) and hash THAT hex
    -- string — md5(VARCHAR) exists on both engines where md5(BLOB)
    -- does not in DuckDB 1.0. Valid for arbitrary payload bytes
    -- (multi-byte UTF-8, invalid-UTF-8 media bytes alike); the former
    -- md5(substring(text)) form needed an ASCII-only corpus. NULL
    -- text: generate_series(0, NULL) unnests to nothing — frame_sample
    -- likewise skips None payloads.
    WITH d AS (SELECT doc_id, hex(encode(text)) AS hx,
                      octet_length(encode(text)) AS nb
               FROM documents),
    f AS (SELECT doc_id, unnest(generate_series(0, nb // 64 - 1)) AS fi, hx
          FROM d)
    SELECT doc_id, CAST(fi AS INT) AS frame_idx,
           md5(substr(hx, fi * 128 + 1, 128)) AS frame_md5
    FROM f WHERE fi % 4 = 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads (every 4th 64-byte frame) via
    mapInPandas; the gate compares md5 OVER THE HEX of each frame (raw
    binary columns don't string-compare across engines, and DuckDB 1.0
    has no md5(BLOB) — hashing the hex encoding is the portable
    checksum of the bytes themselves)."""
    from solace_apache_beam_spark.llm.multimodal import (
        attach_binary_payload,
        frame_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return frame_sample(attach_binary_payload(docs)).select(
        "doc_id", "frame_idx", F.md5(F.hex("frame")).alias("frame_md5")
    )


@query(
    "text_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text),
                '[^\\p{L}\\p{N} ]', ' ', 'g'), '  +', ' ', 'g')) AS normalized
    FROM documents
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical normalization (lowercase / strip punctuation / collapse
    whitespace) — the standard pre-dedup canonicalizer."""
    from solace_apache_beam_spark.llm.text_analysis import normalize_text

    return normalize_text(load_table(spark, sf_dir, "documents"))


@query(
    "text_pii_redact",
    oracle=r"""
    WITH e AS (
      SELECT doc_id, text,
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g') AS emails_out
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(emails_out,
             '[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(emails_out,
             '[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS BIGINT) AS n_phones
    FROM e
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction with audit counts (emails before phone-shaped
    numbers on both engines)."""
    from solace_apache_beam_spark.llm.text_analysis import redact_pii

    return redact_pii(load_table(spark, sf_dir, "documents"))


_N_CELLS = 16


@query(
    "ann_ivf_cosine",
    oracle=f"""
    WITH {_QE},
    c AS (SELECT vec_id AS cid, q AS cq, n2 AS cn2 FROM qn WHERE vec_id < {_N_CELLS}),
    -- the isnan CASE mirrors _assign_cells' NaN -> -inf argmax mask
    -- (a zero-norm CENTROID would otherwise rank FIRST in DuckDB's
    -- DESC order, where Spark never picks it); same guard as _KM_SQL
    scored AS (
      SELECT vec_id, q, n2, cid,
             row_number() OVER (
               PARTITION BY vec_id
               ORDER BY (CASE WHEN isnan(cos) THEN CAST('-infinity' AS DOUBLE)
                         ELSE cos END) DESC, cid) AS rn
      FROM (
        SELECT e.vec_id, e.q, e.n2, c.cid,
               CAST(list_reduce(list_prepend(0::BIGINT,
                    [e.q[i] * c.cq[i] for i in generate_series(1, len(e.q))]),
                    (s, x) -> s + x) AS DOUBLE)
                 / (sqrt(CAST(e.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) AS cos
        FROM qn e CROSS JOIN c
      ) e
    ),
    assigned AS (SELECT vec_id, q, n2, cid AS cell FROM scored WHERE rn = 1),
    -- n2 > 0: zero-norm guard matching the kernel's isfinite mask
    pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_QCOS} AS cos_sim
      FROM assigned a JOIN assigned b
        ON a.cell = b.cell AND a.vec_id != b.vec_id
      WHERE a.n2 > 0 AND b.n2 > 0
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM pairs
    ) WHERE rank <= {_ANN_K}
    """,
)
def ann_ivf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN (coarse-quantizer cells + in-cell brute force) —
    the centroid-bucketed sibling of ann_lsh_cosine; same single
    corpus shuffle, keyed by cell."""
    from solace_apache_beam_spark.llm.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, n_cells=_N_CELLS, k=_ANN_K).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


@query(
    "dedup_simhash_pairs",
    # 60-bit signatures, 15-bit band slices (round 6, was 32/8-bit:
    # 256 buckets/band saturates the skew cap past ~256k docs — the
    # VERDICT-r5 scale cliff). Oracle replays the widened arithmetic
    # bit-for-bit; everything stays non-negative BIGINT.
    oracle=_SIMHASH_PAIRS_ORACLE,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3) via band-bucket candidates
    + exact popcount verify, at the 60-bit/15-bit-band default (32,768
    buckets per band). Pigeonhole over 4 bands guarantees the banded
    candidate set is a superset of every qualifying pair; the oracle
    replays the banded form INCLUDING the max-bucket skew guard, so a
    dropped degenerate bucket drops identically on both engines."""
    from solace_apache_beam_spark.llm.dedup import simhash_hamming_pairs

    return simhash_hamming_pairs(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_simhash_pairs_auto",
    # SAME oracle as dedup_simhash_pairs, deliberately: below the
    # 8.19M-signature horizon simhash_auto_bands returns the literal
    # 4-band default (tests/test_scale_guards.py pins the switch
    # points), so the gate proves the auto path END-TO-END — count the
    # signature population, derive the band count, run the banded
    # pipeline — against the unchanged 4-band truth. A divergence in
    # the derivation (e.g. widening at gate scale) would band
    # differently and hash-mismatch.
    oracle=_SIMHASH_PAIRS_ORACLE,
)
def dedup_simhash_pairs_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with the corpus-size-derived band count
    (``n_bands="auto"`` — the round-7 band-saturation escape, gated
    round 8 per VERDICT r7 Next #2)."""
    from solace_apache_beam_spark.llm.dedup import simhash_hamming_pairs

    return simhash_hamming_pairs(
        load_table(spark, sf_dir, "documents"), n_bands="auto"
    )


@query(
    "sample_documents_10pct",
    oracle="""
    SELECT doc_id FROM documents
    WHERE ('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
          % 10000 < 1000
    """,
)
def sample_documents_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% corpus sample by key hash — reproducible under
    any partitioning (unlike df.sample's per-partition RNG)."""
    from solace_apache_beam_spark.functions.sampling import hash_sample

    return hash_sample(
        load_table(spark, sf_dir, "documents"), "doc_id", rate_bp=1000
    ).select("doc_id")


@query(
    "split_train_val_test",
    oracle="""
    SELECT doc_id,
           CASE WHEN b < 8000 THEN 'train'
                WHEN b < 9000 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id,
                 ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                 % 10000 AS b
          FROM documents)
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by key hash — disjoint,
    exhaustive, stable across runs and engines."""
    from solace_apache_beam_spark.functions.sampling import assign_splits

    return assign_splits(load_table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "split"
    )


@query(
    "corpus_stats",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len({_WORDS})) AS BIGINT) AS total_tokens,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_docs
    FROM documents
    """,
)
def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus summary (docs, tokens, chars, distinct contents) —
    the pre-flight numbers every ingest run reports."""
    from solace_apache_beam_spark.functions.hashing import words_expr

    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(words_expr("text"))).cast("long").alias("total_tokens"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.countDistinct(F.md5("text")).alias("n_distinct_docs"),
    )


@query(
    "stratified_sample_lineitem",
    oracle="""
    SELECT l_orderkey * 8 + l_linenumber AS li_key, l_returnflag
    FROM lineitem
    WHERE ('0x' || substr(md5('strat:' || CAST(l_orderkey * 8 + l_linenumber AS VARCHAR)), 1, 15))::BIGINT
          % 10000 < CASE l_returnflag WHEN 'A' THEN 500
                                      WHEN 'N' THEN 100
                                      WHEN 'R' THEN 2000 ELSE 0 END
    """,
)
def stratified_sample_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling (different rates per return
    flag) — rebalancing skewed strata without a shuffle: membership is
    a map-side hash predicate."""
    from solace_apache_beam_spark.functions.sampling import stratified_sample

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "li_key", F.col("l_orderkey") * 8 + F.col("l_linenumber")
    )
    return stratified_sample(
        li, "li_key", "l_returnflag", {"A": 500, "N": 100, "R": 2000}
    ).select("li_key", "l_returnflag")


@query(
    "training_shard_stats",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, {_WORDS} AS words,
             CASE WHEN b < 8000 THEN 'train'
                  WHEN b < 9000 THEN 'val' ELSE 'test' END AS split,
             ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             % 8 AS shard
      FROM (SELECT doc_id, text,
                   ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   % 10000 AS b
            FROM documents)
    )
    SELECT split, shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(words)) AS BIGINT) AS n_tokens
    FROM assigned GROUP BY 1, 2
    """,
)
def training_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard layout for training export: split assignment + hash-bucket
    shard id, with per-shard doc/token counts — the manifest a shard
    writer emits. All map-side until the one small aggregate."""
    from solace_apache_beam_spark.functions.hashing import h64, words_expr
    from solace_apache_beam_spark.functions.sampling import assign_splits

    docs = assign_splits(load_table(spark, sf_dir, "documents"), "doc_id")
    sharded = docs.withColumn(
        "shard",
        # concat (NULL-propagating) like sampling._bucket: a NULL
        # doc_id gets a NULL shard on both engines
        h64(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))) % 8,
    )
    return sharded.groupBy("split", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(words_expr("text"))).cast("long").alias("n_tokens"),
    )


@query(
    "sequence_packing",
    oracle=f"""
    -- canonical packing is a pure function of the data (hash shards,
    -- doc_id order within shard, greedy next-fit), so the sequential
    -- recurrence replays as a recursive CTE stepping rn = 1, 2, ...
    -- across all shards in parallel
    WITH RECURSIVE w AS (
      -- NULL ids excluded: no canonical position (the Spark side
      -- filters them before sharding)
      SELECT doc_id, CAST(coalesce(len({_WORDS}), 0) AS BIGINT) AS n_tokens,
             ('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             % 8 AS shard
      FROM documents
      WHERE doc_id IS NOT NULL
    ),
    rw AS (
      SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      FROM w
    ),
    pk AS (
      SELECT shard, rn, doc_id, n_tokens,
             0::BIGINT AS bin_idx, n_tokens AS fill
      FROM rw WHERE rn = 1
      UNION ALL
      SELECT rw.shard, rw.rn, rw.doc_id, rw.n_tokens,
             CASE WHEN pk.fill > 0 AND pk.fill + rw.n_tokens > 512
                  THEN pk.bin_idx + 1 ELSE pk.bin_idx END,
             CASE WHEN pk.fill > 0 AND pk.fill + rw.n_tokens > 512
                  THEN rw.n_tokens ELSE pk.fill + rw.n_tokens END
      FROM pk JOIN rw ON rw.shard = pk.shard AND rw.rn = pk.rn + 1
    )
    SELECT CAST(shard AS VARCHAR) || '-' || CAST(bin_idx AS VARCHAR) AS bin_id,
           doc_id, n_tokens, fill AS bin_fill
    FROM pk
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical greedy next-fit sequence packing into 512-token bins
    (training export shape): hash-sharded, doc_id-ordered within shard —
    bins are a pure function of the data, replayed row-for-row by the
    recursive-CTE oracle. The partition-scoped no-shuffle variant
    (pack_sequences) remains for pipelines that don't need canonical
    bins; its invariants are exact-tested in tests/test_multimodal.py."""
    from solace_apache_beam_spark.llm.text_analysis import pack_sequences_canonical

    return pack_sequences_canonical(
        load_table(spark, sf_dir, "documents"), token_budget=512
    )


@query(
    "chunk_documents",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
    s AS (SELECT doc_id, words,
                 unnest(generate_series(0, len(words) - 1, 48)) AS start
          FROM w WHERE len(words) > 0)
    SELECT doc_id,
           CAST(start / 48 AS BIGINT) AS chunk_idx,
           array_to_string(words[start + 1 : start + 64], ' ') AS chunk_text,
           CAST(len(words[start + 1 : start + 64]) AS BIGINT) AS n_chunk_tokens
    FROM s
    """,
)
def chunk_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (64-token chunks every 48 tokens) — the
    context-window prep op; map-side explode, zero shuffle."""
    from solace_apache_beam_spark.llm.text_analysis import chunk_documents

    return chunk_documents(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_MINHASH_BASE},
    {_CAND_SQL},
    pairs AS (
      SELECT doc_a, doc_b
      FROM cand
      JOIN hs sa ON cand.doc_a = sa.doc_id
      JOIN hs sb ON cand.doc_b = sb.doc_id
      WHERE len(list_intersect(sa.hlist, sb.hlist)) * 1.0
            / len(list_distinct(list_concat(sa.hlist, sb.hlist))) >= 0.5
    ),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
    )
    SELECT node AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY 1
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: MinHash-LSH pairs -> connected components
    (min-label propagation; the oracle computes the same components with
    a recursive reachability CTE). Output: every doc in a dup cluster
    with its canonical (minimum-id) representative."""
    from solace_apache_beam_spark.llm.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return connected_components(minhash_lsh_pairs(docs))


@query(
    "dedup_rate_report",
    oracle="""
    WITH g AS (SELECT md5(text) AS h, count(*) AS n_copies
               FROM documents GROUP BY 1)
    SELECT n_copies,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(n_copies) AS BIGINT) AS n_docs
    FROM g GROUP BY 1
    """,
)
def dedup_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-rate histogram (how many content groups have k copies)
    — the dedup summary an ingest run publishes. Two small aggregates,
    the second over one row per distinct content."""
    docs = load_table(spark, sf_dir, "documents")
    groups = docs.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("n_copies")
    )
    return groups.groupBy("n_copies").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_copies").alias("n_docs"),
    )
