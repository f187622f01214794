"""Engine-portable deterministic text hashing.

Every dedup/fingerprint operator in this package hashes tokens/shingles with
the same primitive: the first 15 hex digits of md5, read as a base-16 integer,
reduced mod a 31-bit prime. The point of this (vs ``xxhash64``) is that the
identical value is computable in ANSI-ish SQL on any engine
(``('0x'||substr(md5(t),1,15))::bigint % p`` in DuckDB), which makes
MinHash / SimHash / fingerprint outputs *exactly* oracle-checkable — no
float tolerance, no engine-specific hash. 60 bits of md5 keeps the product
``a*h + b`` inside int64 for the universal-hash family below.

The permutation family is the classic Carter–Wegman ``(a*h + b) mod p``
universal hashing (public textbook construction; also how Spark ML's
MinHashLSH builds its perms). Coefficients are fixed pseudo-random values
derived from the perm index with Knuth's multiplicative constant so both the
Spark plan and the SQL oracle can regenerate them independently.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_31 = (1 << 31) - 1  # 2_147_483_647
KNUTH = 2654435761  # Knuth multiplicative hash constant (public)


def perm_coeffs(n_perms: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal-hash family; a != 0."""
    out = []
    for j in range(n_perms):
        a = (KNUTH * (j + 1) + 1) % MERSENNE_31
        b = (40503 * (j + 1) + 7) % MERSENNE_31
        out.append((a or 1, b))
    return out


def md5_hash60(c: Column) -> Column:
    """First 60 bits of md5(utf8(c)) as a non-negative BIGINT mod p."""
    return (
        F.conv(F.substring(F.md5(F.encode(c, "UTF-8")), 1, 15), 16, 10)
        .cast("long") % F.lit(MERSENNE_31)
    )


# SQL fragment templates for the DuckDB oracle (kept adjacent to the Spark
# definition so they can never drift apart silently; parity is pytest-gated).
def sql_hash60(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT % {MERSENNE_31})"


def sql_perm(expr: str, a: int, b: int) -> str:
    return f"(({a} * {expr} + {b}) % {MERSENNE_31})"


def perm_col(h: Column, a: int, b: int) -> Column:
    return (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_31)
