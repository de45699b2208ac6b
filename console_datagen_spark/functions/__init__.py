"""Column-expression helpers (all JVM-side built-ins — no Python UDFs)."""

from .hashing import HASH_PRIME, minhash_coeffs, token_id  # noqa: F401
from .vector import cosine, dot, norm, to_double_vec  # noqa: F401
from .text import shingles, tokens  # noqa: F401
