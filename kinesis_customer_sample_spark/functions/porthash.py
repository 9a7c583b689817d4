"""Portable deterministic hashing + vector math, defined ONCE and emitted in
two SQL dialects (Spark SQL and DuckDB) so hash-dependent operators —
MinHash-LSH, SimHash, winnowing fingerprints — are *hash-match*
oracle-checkable instead of rows-only (SURVEY.md §2B marks these ◐; this
module upgrades them to ✅).

Design constraints:
- Pure int64 arithmetic, every step reduced mod P = 1e9+7 so no intermediate
  exceeds ~9e10 (int64-safe in both engines; DuckDB errors on overflow
  rather than wrapping, so native xxhash64/md5-to-int tricks are out).
- Only functions with identical cross-engine semantics: `ascii` (codepoint),
  `length`, `substring`, lambda transform/reduce. Spark's `aggregate` takes
  an init value; DuckDB's `list_reduce` does not, so the init is prepended.

At 100 TB the same expressions run unchanged: they are whole-stage-codegen'd
JVM expressions (no Python), linear in token count, and shuffle nothing by
themselves.
"""

from __future__ import annotations

MOD_P = 1_000_000_007

# fixed odd multiplier / offset streams for the minhash permutation family
_PERM_MUL_BASE = 17
_PERM_OFF = 2_654_435_761 % MOD_P  # Knuth multiplicative constant, reduced


def _char_codes(s: str, *, dialect: str) -> str:
    if dialect == "spark":
        # NOT sequence(1, length(s)): Spark's sequence steps DOWNWARD when
        # start > stop, so an empty string yields indices [1, 0] and a
        # nonzero hash while DuckDB's generate_series(1, 0) is empty
        # (caught by tests/test_properties.py). sequence(0, n) is always
        # ascending; slicing off the leading 0 gives [] for n = 0.
        idx = f"slice(sequence(0, length({s})), 2, length({s}))"
        return f"transform({idx}, i -> ascii(substring({s}, i, 1)))"
    return f"list_transform(generate_series(1, length({s})), i -> ascii(substring({s}, i, 1)))"


def tok_hash_expr(s: str, *, dialect: str) -> str:
    """Polynomial rolling hash of a string: h=7; h = (h*31 + code) % P."""
    codes = _char_codes(s, dialect=dialect)
    if dialect == "spark":
        return (
            f"aggregate({codes}, CAST(7 AS BIGINT), "
            f"(a, c) -> (a * 31 + c) % {MOD_P})"
        )
    return (
        f"list_reduce(list_prepend(7::BIGINT, {codes}), "
        f"(a, c) -> (a * 31 + c) % {MOD_P})"
    )


def minhash_perm_expr(h: str, i: int) -> str:
    """The i-th universal-hash permutation of an already-reduced hash value.
    Same text in both dialects (pure arithmetic)."""
    mul = _PERM_MUL_BASE + 2 * i
    return f"(({h} * {mul} + {i} * {_PERM_OFF}) % {MOD_P})"


def band_hash_expr(parts: list[str]) -> str:
    """Combine minhash values of one LSH band into a single bucket id.
    Same text in both dialects (pure arithmetic, left fold)."""
    acc = "7"
    for p in parts:
        acc = f"(({acc}) * 31 + ({p})) % {MOD_P}"
    return acc


def cosine_expr(a: str, b: str, *, dialect: str, digits: int = 6) -> str:
    """Cosine similarity of two float arrays, rounded in-query (registry
    rule: round inside so float32→double summation can't drift a ulp)."""
    if dialect == "spark":
        dot = (
            f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        n1 = f"sqrt(aggregate({a}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
        n2 = f"sqrt(aggregate({b}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
        return f"round({dot} / ({n1} * {n2}), {digits})"
    # cast to DOUBLE[] *before* the similarity: DuckDB accumulates FLOAT[]
    # inputs in float32, which diverges from Spark's double math in the 6th
    # decimal on ~1/500 pairs
    return f"round(list_cosine_similarity({a}::DOUBLE[], {b}::DOUBLE[])::DOUBLE, {digits})"


def norm_expr(a: str) -> str:
    """L2 norm of a float array (Spark dialect) — computed once per ROW, so
    the interpreted aggregate cost is per-corpus, not per-pair."""
    return (
        f"sqrt(aggregate({a}, CAST(0.0 AS DOUBLE), "
        f"(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    )


def l2sq64_expr(a: str, b: str, *, dialect: str) -> str:
    """Squared L2 distance of two 64-dim float arrays, unrolled into 64
    explicit double terms summed left-to-right. Because both dialects
    evaluate the IDENTICAL sequence of IEEE-double operations (cast, sub,
    mul, left-assoc add), the result is bit-equal across engines — which
    makes argmin-over-distances (cluster assignment) oracle-safe without
    any rounding epsilon. Same codegen rationale as dot64_expr."""
    if dialect == "spark":
        elem = lambda v, i: f"CAST(element_at({v}, {i}) AS DOUBLE)"  # noqa: E731
    else:
        elem = lambda v, i: f"{v}[{i}]::DOUBLE"  # noqa: E731
    return " + ".join(
        f"({elem(a, i)} - {elem(b, i)}) * ({elem(a, i)} - {elem(b, i)})"
        for i in range(1, 65)
    )


def dot64_expr(a: str, b: str, *, dialect: str = "spark") -> str:
    """Explicit 64-term dot product: unrolled element_at arithmetic stays
    inside whole-stage codegen, where zip_with/aggregate lambdas are
    interpreted per element — the difference is 0.6 s vs 0.8-4.5 s
    (GC-sensitive) on ~1M pairs at sf0.1. Left-to-right addition matches
    the fold order of the lambda form. The duckdb dialect emits the SAME
    left-assoc IEEE sequence over ::DOUBLE casts, so the two engines'
    doubles are bit-equal (the l2sq64_expr argument) — which makes
    floor-µ quantization of a cosine deterministic without any rounding
    tolerance."""
    if dialect == "spark":
        elem = lambda v, i: f"CAST(element_at({v}, {i}) AS DOUBLE)"  # noqa: E731
    else:
        elem = lambda v, i: f"{v}[{i}]::DOUBLE"  # noqa: E731
    return " + ".join(f"{elem(a, i)} * {elem(b, i)}" for i in range(1, 65))


def norm64_expr(a: str, *, dialect: str = "spark") -> str:
    """L2 norm of a 64-dim float array as the unrolled left-assoc sum of
    squares under one sqrt — the bit-equal cross-dialect twin of
    norm_expr's lambda fold (0.0 + v1² + v2² + … and v1² + v2² + … are
    the identical IEEE sequence because 0.0 + x == x exactly)."""
    return f"sqrt({dot64_expr(a, a, dialect=dialect)})"
