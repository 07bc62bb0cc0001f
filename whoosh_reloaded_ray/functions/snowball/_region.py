"""Shared Snowball region helpers (R1/R2/RV are defined identically
across the standard-stemmer family; see the algorithm overview at
snowballstem.org/texts/r1r2.html)."""

from __future__ import annotations


def r1_start(word: str, vowels: str) -> int:
    """Index where R1 begins: after the first non-vowel that follows a
    vowel; len(word) if no such position."""
    for i in range(1, len(word)):
        if word[i] not in vowels and word[i - 1] in vowels:
            return i + 1
    return len(word)


def r2_start(word: str, vowels: str) -> int:
    r1 = r1_start(word, vowels)
    for i in range(r1 + 1, len(word)):
        if word[i] not in vowels and word[i - 1] in vowels:
            return i + 1
    return len(word)


def rv_standard(word: str, vowels: str) -> int:
    """Start index of RV as the REFERENCE transcription computes it.

    Deviation from the published definition, replicated on purpose: the
    two-initial-vowels branch is guarded by a SUBSTRING test
    (``word[:2] in vowels``) rather than per-character membership, so
    e.g. Spanish "aa..."/"ía..." words fall into the word[3:] branch
    while "ae..." words follow the next-consonant rule.  Verified
    equivalent to the reference helper over 300k random words."""
    n = len(word)
    if n < 2:
        return n
    if word[1] not in vowels:
        for i in range(2, n):
            if word[i] in vowels:
                return i + 1
        return n
    if word[:2] in vowels:  # reference substring quirk
        for i in range(2, n):
            if word[i] not in vowels:
                return i + 1
        return n
    return min(3, n)


def scandinavian_r1(word: str, vowels: str) -> int:
    """Scandinavian variant: R1 is adjusted so at least 3 letters
    precede it (but never beyond the end of the word)."""
    r1 = r1_start(word, vowels)
    if r1 < 3:
        r1 = 3
    return min(r1, len(word))
