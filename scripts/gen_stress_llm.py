"""Generate the 100x LLM-family stress set (documents + embeddings).

Same generator discipline as the round-3 10x run (PLANS.md "10x stress
run"): each cluster seed gets near-duplicate variants produced by light
word-level edits, so the pair-generating operators face a realistic
30-50%-near-dup corpus rather than independent random text (which would
produce almost no true pairs and understate the shuffle).

Shape at 100x (vs sf0.1's 5,000 docs / 2,000 embeddings):

- documents: 50,000 cluster seeds x 10 variants = 500,000 rows.
  Each seed is a FRESH Zipf-sampled word sequence over a 50,000-word
  synthetic vocabulary (doc lengths follow the sf0.1 originals);
  variants come from LIGHT mutation (1-2 word edits), so each cluster
  is a genuine near-dup clique. True-pair count = 50,000 x C(10,2) =
  2.25M -- 10x the 10x run's pair load, 100x its row load.

  Why synthetic vocabulary and not mutations of the sf0.1 originals:
  the driver's documents table draws from a 31-WORD vocabulary, so its
  trigram space saturates at ~30k distinct shingles. Deriving 500k
  docs from it yields avg shingle df ~900 and ~2.5 BILLION document
  pairs that genuinely share shingles -- for ANY complete exact-Jaccard
  method the candidate set IS that size (measured: 6.75B pair
  instances in the df<=1000 band; prefix filtering still left 5.0B).
  That measures vocabulary degeneracy, not operator scaling. Real web
  corpora are singleton-dominated (most shingles appear once); the
  Zipf vocab reproduces that regime: clique shingles have df ~10 and
  cross-clique sharing is incidental, so the pair stream tracks the
  2.25M true near-dup pairs. Degenerate-bucket GUARDS (caps dropping
  over-populated buckets) are exercised separately by
  tests/test_scale_guards.py on purpose-built skew fixtures.
- embeddings: 20,000 jittered seeds x 10 variants = 200,000 rows.
  Variants get small Gaussian noise (sigma=0.01 on unit-ish vectors) so
  within-cluster cosine stays ~0.999; seed jitter (sigma=0.5) keeps
  clusters apart.

Other tables are hard-linked from sf0.1 so registry queries that join
against them still load. Deterministic (fixed numpy seed). Usage:

    python scripts/gen_stress_llm.py /tmp/stress100x_llm
"""
from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
# seeds per sf0.1 original: 10 -> the 100x point (500k docs / 200k
# vectors); argv[2] overrides (1 -> the 10x point) for scaling curves
SEED_FACTOR = 10
VARIANTS = 10        # light-mutation near-dups per cluster seed
EMB_SEED_FACTOR = 10
EMB_VARIANTS = 10

WORDS = None  # vocabulary pool for replacements, built from the corpus


def _mutate(rng: np.random.Generator, words: list[str], n_edits: int) -> list[str]:
    out = list(words)
    for _ in range(n_edits):
        if not out:
            break
        op = rng.integers(0, 3)
        i = int(rng.integers(0, len(out)))
        if op == 0:
            out[i] = WORDS[int(rng.integers(0, len(WORDS)))]
        elif op == 1 and len(out) > 3:
            del out[i]
        else:
            out.insert(i, WORDS[int(rng.integers(0, len(WORDS)))])
    return out


VOCAB_SIZE = 50_000


def gen_documents(out_dir: str, rng: np.random.Generator) -> None:
    global WORDS
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    texts = t["text"].to_pylist()
    langs = t["lang"].to_pylist()
    sources = t["source"].to_pylist()
    lengths = [max(5, len(s.split())) for s in texts]

    # Zipf-ish synthetic vocabulary: p(rank) ~ 1/(rank+10)^0.9 — common
    # words repeat across docs (realistic df head) while the long tail
    # keeps most shingles near-singleton (realistic df tail).
    # LETTERS ONLY: the operators tokenize on [^\p{L}]+ (the reference's
    # word-count split), so a digit-bearing vocab ("w18427") collapses
    # every token to "w" — one identical shingle per doc, all buckets
    # over-cap, zero pair volume. Base-26 encoding keeps 50k distinct
    # letters-only words.
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def _word(i: int) -> str:
        i += 26 ** 3  # >= 4 letters: distinct from the sf0.1 vocabulary
        s = ""
        while i:
            s += alpha[i % 26]
            i //= 26
        return s

    WORDS = [_word(i) for i in range(VOCAB_SIZE)]
    p = 1.0 / np.power(np.arange(VOCAB_SIZE, dtype=np.float64) + 10.0, 0.9)
    p /= p.sum()

    n_seeds = len(texts) * SEED_FACTOR
    seed_lengths = [lengths[i % len(lengths)] for i in range(n_seeds)]
    # one vectorized draw for every seed word
    flat = rng.choice(VOCAB_SIZE, size=int(sum(seed_lengths)), p=p)

    ids, out_texts, out_langs, out_sources, out_n = [], [], [], [], []
    next_id = 0
    off = 0
    for si in range(n_seeds):
        ln = seed_lengths[si]
        seed_words = [WORDS[j] for j in flat[off : off + ln]]
        off += ln
        orig = si // SEED_FACTOR
        for _v in range(VARIANTS):
            var = _mutate(rng, seed_words, int(rng.integers(1, 3)))
            s = " ".join(var)
            ids.append(next_id)
            out_texts.append(s)
            out_langs.append(langs[orig])
            out_sources.append(sources[orig])
            out_n.append(len(s))
            next_id += 1
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(out_langs, pa.string()),
            "source": pa.array(out_sources, pa.string()),
            "n_chars": pa.array(out_n, pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"),
                   row_group_size=50_000)
    print(f"documents: {tbl.num_rows} rows")


def gen_embeddings(out_dir: str, rng: np.random.Generator) -> None:
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    base = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    labels = np.asarray(t["label"].to_pylist(), dtype=np.int32)
    n, dim = base.shape
    vecs, labs = [], []
    for i in range(n):
        for _s in range(EMB_SEED_FACTOR):
            seed = base[i] + rng.normal(0, 0.5, dim).astype(np.float32)
            for _v in range(EMB_VARIANTS):
                vecs.append(seed + rng.normal(0, 0.01, dim).astype(np.float32))
                labs.append(labels[i])
    arr = np.stack(vecs)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(arr.shape[0]), pa.int64()),
            "embedding": pa.array([v for v in arr.tolist()],
                                  pa.list_(pa.float32())),
            "label": pa.array(labs, pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"),
                   row_group_size=50_000)
    print(f"embeddings: {tbl.num_rows} rows")


def main() -> None:
    global SEED_FACTOR, EMB_SEED_FACTOR
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress100x_llm"
    if len(sys.argv) > 2:
        SEED_FACTOR = EMB_SEED_FACTOR = int(sys.argv[2])
    if len(sys.argv) > 3:  # decouple: a 1000x doc run keeps 100x vectors
        EMB_SEED_FACTOR = int(sys.argv[3])
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(100)
    gen_documents(out_dir, rng)
    gen_embeddings(out_dir, rng)
    for name in os.listdir(SRC):
        if name.endswith(".parquet") and name not in (
            "documents.parquet", "embeddings.parquet"
        ):
            dst = os.path.join(out_dir, name)
            if not os.path.exists(dst):
                try:
                    os.link(os.path.join(SRC, name), dst)
                except OSError:
                    shutil.copy2(os.path.join(SRC, name), dst)
    _verify_corpus_shape(out_dir)
    print(f"stress set ready at {out_dir}")


def _verify_corpus_shape(out_dir: str) -> None:
    """Fail AT GENERATION if the corpus is degenerate — the check that
    would have caught the digit-vocab token collapse (every word
    tokenized to "w" under the operators' [^\p{L}]+ split) before any
    stress run spent an hour timing a zero-pair workload. Asserts the
    intended near-dup regime: singleton-dominated shingle tail, a
    clique band, and no heavy-df head."""
    import duckdb

    con = duckdb.connect()
    doc = os.path.join(out_dir, "documents.parquet")
    row = con.execute(f"""
        WITH words AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '[^a-zA-Z]+'), x -> x <> '') w
          FROM read_parquet('{doc}')),
        sh AS (SELECT DISTINCT doc_id, w[g.i]||'|'||w[g.i+1]||'|'||w[g.i+2] s
          FROM words CROSS JOIN LATERAL
            (SELECT unnest(range(1, greatest(len(w)-2,0)+1)) i) g),
        df AS (SELECT s, count(*) df FROM sh GROUP BY s)
        SELECT count(*) FILTER (df = 1),
               count(*) FILTER (df BETWEEN 2 AND 50),
               count(*) FILTER (df > 1000),
               count(*) FROM df""").fetchone()
    singles, clique, heavy, total = row
    assert total > 0, "no shingles at all — tokenizer/vocab mismatch"
    assert singles / total > 0.2, (
        f"singleton share {singles}/{total} — vocabulary too small or "
        "token-collapsed; pair ops would measure a degenerate workload")
    assert clique > 0, "no clique-band shingles — variants are not near-dups"
    assert heavy / total < 0.01, (
        f"{heavy}/{total} shingles with df>1000 — heavy head means "
        "Omega(sum df^2) candidate mass, not operator scaling")
    print(f"corpus shape ok: {singles} singleton / {clique} clique-band "
          f"/ {heavy} heavy of {total} shingles")


if __name__ == "__main__":
    main()
