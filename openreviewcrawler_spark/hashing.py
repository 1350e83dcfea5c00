"""MurmurHash3 (x86_32) — the URL hash of the engine.

The north rule mandates MurmurHash3 for URL hashing. Spark's built-in
``F.hash(col)`` *is* Murmur3 x86_32 with seed 42 (see Apache Spark,
``org.apache.spark.sql.catalyst.expressions.Murmur3Hash`` /
``org.apache.spark.unsafe.hash.Murmur3_x86_32`` — public source), so the
engine hot path stays entirely JVM-side: ``url_hash = F.hash(canon_url)``.

This module provides the bit-exact pure-Python twin used by the single-node
oracle (tests assert equality against ``F.hash`` on every fixture URL).
Spark's variant differs from the canonical Murmur3 tail handling: each
remaining byte past the 4-byte-aligned prefix is sign-extended and pushed
through a full mixK1/mixH1 round (hashUnsafeBytes semantics).

Reference-parity note: the reference keeps a Python ``set`` of seen keys
(/root/reference/crawler.py:25,34,54); our seen-set keys are Murmur3 hashes
of canonical URLs with the exact string retained for collision-exact
confirmation.
"""

from __future__ import annotations

_MASK32 = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593

SPARK_HASH_SEED = 42


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _MASK32
    k1 = _rotl32(k1, 15)
    return (k1 * _C2) & _MASK32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK32
    h1 ^= h1 >> 16
    return h1


def murmur3_32(data: bytes, seed: int = SPARK_HASH_SEED) -> int:
    """Murmur3 x86_32 over bytes, Spark ``hashUnsafeBytes`` tail semantics.

    Returns a signed 32-bit int, identical to Spark's ``F.hash`` on a
    StringType column containing the UTF-8 decoding of ``data``.
    """
    h1 = seed & _MASK32
    n = len(data)
    aligned = n - n % 4
    for i in range(0, aligned, 4):
        word = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(word))
    for i in range(aligned, n):
        b = data[i]
        if b >= 0x80:  # JVM bytes are signed; sign-extend to 32 bits
            b -= 256
        h1 = _mix_h1(h1, _mix_k1(b & _MASK32))
    out = _fmix(h1, n)
    return out - (1 << 32) if out >= (1 << 31) else out


def murmur3_str(s: str, seed: int = SPARK_HASH_SEED) -> int:
    """Hash a unicode string exactly as Spark's ``F.hash(string_col)``."""
    return murmur3_32(s.encode("utf-8"), seed)
