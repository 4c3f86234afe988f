"""Stable (process-independent) hashing for dedup keys and signatures.

Python's built-in ``hash()`` over strings is salted per process
(PYTHONHASHSEED), so any dedup key or stored signature derived from it
cannot be reproduced by a resumed run — a resumed run would re-admit
duplicates of every non-finite unique and could never match stored
``expr<hash>`` signatures again.  Every persistent identity in the engine
therefore goes through the digest below (the reference used sha256 for the
same purpose, general_method_paper_reproduction.py:1278-1281).
"""

from __future__ import annotations

import functools
from hashlib import blake2b

# Dedup keys live in a uint64 space partitioned by bit 63:
#   bit 63 == 0 : finite numeric-fingerprint keys ((fp_a << 32) | fp_b,
#                 masked) — see pipeline.DiscoveryEngine._fp_keys
#   bit 63 == 1 : structural keys (non-finite-fingerprint candidates)
STRUCT_TAG = 1 << 63
FP_MASK = STRUCT_TAG - 1  # clears bit 63 so fp keys can't collide with tags


def stable_hash64(s: str) -> int:
    """64-bit blake2b digest of a string (stable across processes)."""
    return int.from_bytes(blake2b(s.encode(), digest_size=8).digest(), "big")


def struct_key_for_expr(expr_str: str) -> int:
    """Structural dedup key for an expression string (tape path / legacy
    resume fallback): stable digest, tagged into the struct key space."""
    return (stable_hash64(expr_str) & FP_MASK) | STRUCT_TAG


@functools.lru_cache(maxsize=None)
def op_salt(op_name: str) -> int:
    """Stable 32-bit per-op salt for vectorized structural keys."""
    return stable_hash64(op_name) & 0x7FFFFFFF
