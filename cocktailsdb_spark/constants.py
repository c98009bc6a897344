"""Shared literal constants used by BOTH the Spark operators and their
generated DuckDB oracle SQL (registry_ops.py). Keeping a single source of
truth here is what makes the oracle twins exact."""

from __future__ import annotations

HEXDIGITS = "0123456789abcdef"

# doc_fingerprint_rolling (operators/text.py): polynomial rolling hash
FP_MOD = 1_000_000_007
FP_BASE = 131
FP_POWERS = [pow(FP_BASE, k, FP_MOD) for k in range(8)]

# lang_id stopword profiles (operators/text.py). Overlaps between languages
# are fine — scores are computed per-language; ties resolve by the fixed
# precedence order below.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "in", "is", "you", "that", "it", "for"],
    "de": ["der", "die", "und", "den", "von", "zu", "das", "mit", "sich", "des"],
    "es": ["de", "la", "que", "el", "en", "los", "se", "del", "las", "por"],
    "fr": ["le", "de", "et", "les", "des", "un", "une", "du", "dans", "est"],
    "zh": ["的", "一", "是", "不", "了", "人", "我", "在", "有", "他"],
}
LANG_PRECEDENCE = ["en", "de", "es", "fr", "zh"]

# ivf_topk (operators/similarity.py): K pseudo-random separating hyperplanes
# with small integer coordinates — deterministic, identical literals on both
# engines. plane[k][j] = ((j*31 + k*17) % 7) - 3
N_PLANES = 4
EMB_DIM = 64


def make_planes(n_planes: int, dim: int = EMB_DIM) -> list[list[int]]:
    """The PLANES formula at an arbitrary plane count — the bucket-count
    knob for operators whose partition cardinality must grow with corpus
    size (semantic_dedup_scaled: +1 plane per doubling keeps the
    per-bucket population bounded). ``make_planes(N_PLANES)`` is exactly
    :data:`PLANES`, so the default configurations stay oracle-shared.

    The legacy formula is periodic in k with period 7 (k·17 mod 7
    cycles), so planes 7+ come from a SECOND generator over modulus 9
    (coefficients coprime to 9, values −4..4 — NOT structurally disjoint
    from the legacy −3..3 family, since −4..4 is a superset; the 16
    planes' pairwise distinctness is pinned empirically by
    tests/test_dedup.py::test_make_planes_default_identity_and_cap,
    which compares the per-plane value tuples); that family
    is periodic with period 9, capping the total at 16 distinct planes
    (65k sub-buckets per cell — beyond that, store cell ids at write
    time). A request past the cap is a named error, never a silently
    duplicated plane that halves the real bucket count."""
    if n_planes > 16:
        raise ValueError(
            "plane generators yield 16 distinct members (7 mod-7 legacy + "
            "9 mod-9); extend the generator before requesting more"
        )
    out = [
        [((j * 31 + k * 17) % 7) - 3 for j in range(dim)]
        for k in range(min(n_planes, 7))
    ]
    out += [
        [((j * 29 + k * 23 + 5) % 9) - 4 for j in range(dim)]
        for k in range(n_planes - 7)
    ]
    return out


PLANES: list[list[int]] = make_planes(N_PLANES)

# simhash (operators/dedup.py): 64-bit simhash built from the first 16 hex
# chars of md5(token) — md5 is the one hash both engines share. The
# fingerprint is carried as SIMHASH_BANDS × 16-bit band ints (band 0 = most
# significant) + a packed hex string: 4 banded ints sidestep int64 sign
# issues AND are exactly the LSH join keys. 4 bands of 16 bits give full
# candidate recall for hamming distance ≤ 3 (pigeonhole: ≤3 flipped bits
# leave ≥1 band untouched) — covers max_hamming=2 with margin, fixing the
# 16-bit/2-band under-dimensioning flagged in round 1.
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 16
SIMHASH_BITS = SIMHASH_BANDS * SIMHASH_BAND_BITS

# quality score weights (operators/text.py)
QUALITY_W_STOP = 0.4
QUALITY_W_LEN = 0.3
QUALITY_W_DIGIT = 0.3

# BPE-ish token regex (operators/text.py): letter runs, digit runs, single
# other non-space chars — same char-class dialect in Spark (Java regex) and
# DuckDB (RE2).
BPE_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

# sessionization gap (operators/events.py), seconds
SESSION_GAP_SEC = 1800
