"""Scalar helper functions shared by the extension operators.

Everything here is built from JVM-side ``pyspark.sql.functions`` so it stays
inside whole-stage codegen — no Python UDFs on these hot paths.

Cross-engine determinism: the correctness oracle is DuckDB, whose built-in
``hash()`` differs from Spark's murmur3/xxhash64.  ``md5_long`` is a 60-bit
hash both engines compute identically (md5 hex prefix → integer), used
everywhere a hash value is part of a checked result (minhash, simhash,
fingerprints).  Engine-internal hashes (joins, shuffles) still use Spark's
native functions.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column
from pyspark.sql import functions as F

#: modulus / multiplier for rolling fingerprints (fits comfortably in int64)
FP_MOD = 1_000_000_007
FP_MUL = 31


def minhash_params(k: int, seed: int = 97) -> list[tuple[int, int]]:
    """k universal-hash parameter pairs (a, b) for
    ``h_i(x) = ((x % FP_MOD) * a + b) % FP_MOD`` — derives k hash
    functions from ONE md5 per input (16× fewer md5 evaluations than
    salting the input k times).  All operands stay < 1e9 so the product
    is < 1e18 — no int64 overflow on either engine (both are
    overflow-strict).  Deterministic: both the Spark expression and the
    generated oracle SQL embed the same constants.
    """
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, FP_MOD), rng.randrange(0, FP_MOD)) for _ in range(k)]


def universal_hash(base: Column, a: int, b: int) -> Column:
    """``h(base) = ((base % FP_MOD) * a + b) % FP_MOD`` (see
    :func:`minhash_params`)."""
    return ((base % F.lit(FP_MOD)) * F.lit(a) + F.lit(b)) % F.lit(FP_MOD)


def universal_hash_sql(expr: str, a: int, b: int) -> str:
    """DuckDB rendering of :func:`universal_hash`."""
    return f"((({expr}) % {FP_MOD}) * {a} + {b}) % {FP_MOD}"


def md5_long(col: Column | str, salt: int | str | None = None) -> Column:
    """Deterministic 60-bit hash: first 15 hex digits of md5 as a long.

    DuckDB equivalent: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(c, F.lit(f"|{salt}"))
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str, salt: int | str | None = None) -> str:
    """The DuckDB SQL rendering of :func:`md5_long` (oracle generation)."""
    if salt is not None:
        expr = f"({expr} || '|{salt}')"
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (documents fixture is space-separated)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def word_ngrams(tok: Column, n: int) -> Column:
    """Array of space-joined word n-grams from a token array.

    ``n=1`` is the token array itself; for ``n>1`` zips ``n`` shifted
    slices of the token array and joins each zipped struct with spaces.
    Documents shorter than ``n`` tokens yield an empty array.  (DuckDB
    oracles render the same values with ``list_transform(range(...))``.)

    Shape matters here: the earlier formulation — ``transform(sequence(
    1, size-n+1), i -> concat_ws(element_at(tok, i), ...))`` — captures
    ``tok`` inside the lambda, and interpreted higher-order-function
    evaluation re-computes the captured subtree (typically
    ``split(text, ' ')``) once PER ELEMENT: O(len²) per document, a
    multi-minute straggler on a single 100 k-word document.  The slice
    form evaluates ``tok`` ``n`` times per row total; the lambda touches
    only its own variable.
    """
    if n == 1:
        return tok
    sz = F.size(tok)
    # all n slices share the same length; guard docs shorter than n tokens
    # (slice() throws on negative length) with an empty-array branch
    length = sz - (n - 1)
    zipped = F.arrays_zip(
        *[F.slice(tok, i + 1, length).alias(f"g{i}") for i in range(n)]
    )
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[f"g{i}"] for i in range(n)])
    )
    return F.when(sz >= n, grams).otherwise(F.array().cast("array<string>"))


def dot_product_fixed(a: Column, b: Column, dim: int) -> Column:
    """``Σ a[i]·b[i]`` for a known, fixed dimension — unrolled into plain
    codegen arithmetic.  Higher-order functions (``zip_with`` +
    ``aggregate``) execute interpreted per element, which dominates cost
    when evaluated once per *pair* in a join; the unrolled form compiles.

    Left-associated sum in the same order as :func:`cosine_similarity`'s
    sequential fold, so compositions produce bit-identical doubles.
    """
    return reduce(
        add,
        (
            F.element_at(a, i + 1).cast("double")
            * F.element_at(b, i + 1).cast("double")
            for i in range(dim)
        ),
    )


def l2_norm(vec: Column) -> Column:
    """Euclidean norm via the sequential fold (same summation order as
    :func:`cosine_similarity`'s denominator).  Evaluate this once per
    *row* before a pair join — then the per-pair expression is only the
    dot product, small enough for whole-stage codegen's 64 KB method
    limit."""
    vd = F.transform(vec, lambda x: x.cast("double"))
    return F.sqrt(F.aggregate(vd, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity_fixed(a: Column, b: Column, dim: int) -> Column:
    """Cosine for a known, fixed dimension (see :func:`dot_product_fixed`;
    prefer precomputing :func:`l2_norm` per side when used after a join)."""
    na = F.sqrt(dot_product_fixed(a, a, dim))
    nb = F.sqrt(dot_product_fixed(b, b, dim))
    return dot_product_fixed(a, b, dim) / (na * nb)


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns, computed in float64.

    Element-wise product via ``zip_with`` + sequential ``aggregate`` —
    all JVM-side; matches DuckDB's
    ``list_cosine_similarity(CAST(a AS DOUBLE[]), CAST(b AS DOUBLE[]))``.
    """
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)
