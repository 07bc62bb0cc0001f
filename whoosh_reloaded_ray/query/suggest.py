"""Spelling suggestions — behavioral parity with the reference's
ReaderCorrector (spelling.py:46-115).

The reference intersects a Levenshtein NFA (automata/lev.py: insert /
delete / substitute, NO transposition) with the sorted term dictionary,
then ranks candidates by ``score = -(maxdist + 0.5/frequency)`` — i.e. BY
COLLECTION FREQUENCY descending (the distance term is the constant
``maxdist``!), ties alphabetically.  We reproduce exactly that: candidate
terms come from the segment term dictionaries (pruned by the prefix bound
and a +-maxdist length filter — the sorted-parquet analogue of the DFA
intersection), verified with a banded edit-distance DP.
"""

from __future__ import annotations

import numpy as np


def levenshtein_within(a: str, b: str, k: int) -> bool:
    """True iff editdistance(a, b) <= k (row DP with early exit)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return False
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        ca = a[i - 1]
        cur = [i]
        best = i
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            cur.append(v)
            if v < best:
                best = v
        if best > k:
            return False
        prev = cur
    return prev[lb] <= k


def suggest(searcher, field: str, text: str, limit: int = 5, maxdist: int = 2, prefix: int = 0):
    """Reference Corrector.suggest: up to ``limit`` in-vocabulary words
    within ``maxdist`` edits (sharing a ``prefix``), ranked by frequency
    desc then alphabetically.  The checked word itself is excluded."""
    lo = text[:prefix] if prefix else None
    hi = (text[:prefix] + "￿") if prefix else None
    cands = set()
    workers = [searcher.local] if searcher.executor != "ray" else None
    if workers is None:
        specs = [(field, lo, hi, False, False)]
        merged = searcher._expand(specs)
        vocab = merged[specs[0]]
    else:
        vocab = set()
        for r in searcher.local.readers:
            vocab.update(r.expand_terms(field, start=lo, end=hi))
        vocab = sorted(vocab)
    for term in vocab:
        if term != text and levenshtein_within(text, term, maxdist):
            cands.add(term)
    if not cands:
        return []
    freqs = searcher.frequencies([(field, t) for t in cands])
    items = [(-(maxdist + 0.5 / (freqs[(field, t)] or 1)), t) for t in cands]
    # the reference keeps a bounded heap of the LARGEST (score, text) tuples
    # (ties at the cut prefer lexicographically later text), then displays
    # sorted by (-score, text) — replicate both phases exactly
    items.sort(reverse=True)
    items = items[:limit]
    items.sort(key=lambda x: (-x[0], x[1]))
    return [t for _, t in items]


def _rank(items, limit: int):
    """Reference Corrector.suggest selection (spelling.py:46-73): bounded
    heap of the LARGEST (score, text) tuples, displayed by (-score, text)."""
    import heapq

    heap: list = []
    for item in items:
        if len(heap) < limit:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)
    return [s for _, s in sorted(heap, key=lambda x: (-x[0], x[1]))]


class ListCorrector:
    """Suggestions from a plain word list (reference ListCorrector,
    spelling.py:117-151): score = -(smallest automaton distance >= 1), so
    ranking is distance ascending, ties alphabetical.  Like the reference,
    the checked word itself is NOT excluded (a distance-1 automaton accepts
    its center word)."""

    def __init__(self, wordlist):
        self.wordlist = list(wordlist)

    def _suggestions(self, text: str, maxdist: int, prefix: int):
        pre = text[:prefix]
        for w in self.wordlist:
            if prefix and not w.startswith(pre):
                continue
            for mxd in range(1, maxdist + 1):
                if levenshtein_within(text, w, mxd):
                    yield (-mxd, w)
                    break

    def suggest(self, text: str, limit: int = 5, maxdist: int = 2, prefix: int = 0):
        return _rank(self._suggestions(text, maxdist, prefix), limit)


class MultiCorrector:
    """Merges sub-correctors' suggestions, combining duplicate scores with
    ``op`` (reference MultiCorrector, spelling.py:154-172)."""

    def __init__(self, correctors, op=max):
        self.correctors = correctors
        self.op = op

    def _suggestions(self, text: str, maxdist: int, prefix: int):
        seen: dict = {}
        for corr in self.correctors:
            for score, sug in corr._suggestions(text, maxdist, prefix):
                seen[sug] = self.op(seen[sug], score) if sug in seen else score
        return ((score, sug) for sug, score in seen.items())

    def suggest(self, text: str, limit: int = 5, maxdist: int = 2, prefix: int = 0):
        return _rank(self._suggestions(text, maxdist, prefix), limit)
