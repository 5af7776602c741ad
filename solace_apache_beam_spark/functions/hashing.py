"""Portable deterministic hashing + shingling.

Engine-portable hash: the correctness oracle re-computes every hash in
DuckDB, so the hash must be identical there — Spark's xxhash64/hash are
not available in DuckDB, md5 is. A 60-bit (or 32-bit) integer is taken
from the md5 hex prefix:

    Spark : CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)
    DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT

At scale this is pure map-side codegen'd work (md5 + string slice +
base conversion), no shuffle, no Python.

MinHash permutations use (a*h + b) mod P with h < 2^32 and a,b < 2^31 so
every intermediate fits signed 64-bit (max < 2^63), P = 2^61-1.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_61 = (1 << 61) - 1
TOKEN_PATTERN = r"[^\p{L}]+"


def h64(col: Column | str) -> Column:
    """60-bit portable hash of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h32(col: Column | str) -> Column:
    """32-bit portable hash (fits minhash modular arithmetic)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def h64_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def h32_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


def minhash_coeffs(n_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs; a odd, both < 2^31."""
    out = []
    for p in range(n_perm):
        a = 2 * ((p * 1103515245 + 12345) % 1073741823) + 1
        b = (p * 69069 + 362437) % 2147483648
        out.append((a, b))
    return out


def words_expr(text_col: str) -> Column:
    """Tokenize to non-empty word array (same [^\\p{L}]+ split as the
    word-count chain, common/ExampleUtils.java:77)."""
    return F.filter(
        F.split(F.col(text_col), TOKEN_PATTERN), lambda x: x != F.lit("")
    )


WORDS_SQL = "list_filter(regexp_split_to_array({text}, '[^\\p{{L}}]+'), x -> x <> '')"


def shingles_expr(words: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a word array — map-side only.
    Guarded for size < n (Spark's sequence(0, negative) would count
    DOWN, not produce an empty array)."""
    return F.when(
        F.size(words) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_sql(words: str, n: int = 3) -> str:
    return (
        f"list_distinct([array_to_string({words}[i:i+{n - 1}], ' ') "
        f"for i in generate_series(1, len({words}) - {n - 1})])"
    )
