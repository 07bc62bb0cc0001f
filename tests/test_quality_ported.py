"""Reference tests/test_quality.py ported (all 5 scenarios).

Exercises the per-term statistics the block-quality machinery is built on
(reference reading.TermInfo + reader field-length bounds): weight, doc
frequency, min/max stored length (lossy byte quantization — asserted
through the same byte_to_length(length_to_byte(x)) round trip the
reference's _discreet helper uses), max per-doc weight, and min/max
matching docnum — including across a second, unmerged segment
(commit(merge=False)).  test_replacements is matcher-internal
(ListMatcher.replace) with no observable engine behavior — covered
instead by the WAND pruning parity tests (tests/test_wand.py)."""

from __future__ import annotations

import random

import pytest

from whoosh_reloaded_ray import compat as wrr
from whoosh_reloaded_ray.functions.quant import BYTE_TO_LENGTH, length_to_byte


def _discreet(length: int) -> int:
    # ref test_quality.py:9-10
    return int(BYTE_TO_LENGTH[length_to_byte(length)])


def _ix(tmp_path, name="qix"):
    schema = wrr.Schema(t=wrr.TEXT())
    return wrr.create_in(str(tmp_path / name), schema)


def test_max_field_length(ray_session, tmp_path):
    # ref :12-22 (coarser steps: each iteration is a full commit here)
    ix = _ix(tmp_path)
    most = 0
    for i in range(1, 200, 49):
        w = ix.writer()
        w.add_document(t=" ".join(["word"] * i))
        w.commit(merge=False)
        most = max(most, i)
        with ix.reader() as r:
            assert r.max_field_length("t") == _discreet(most)


def test_minmax_field_length(ray_session, tmp_path):
    # ref :25-41
    ix = _ix(tmp_path)
    rng = random.Random(42)
    least, most = 999999, 0
    for _ in range(4):
        w = ix.writer()
        count = rng.randint(1, 100)
        least = min(count, least)
        most = max(count, most)
        w.add_document(t=" ".join(["word"] * count))
        w.commit(merge=False)
        with ix.reader() as r:
            assert r.min_field_length("t") == _discreet(least)
            assert r.max_field_length("t") == _discreet(most)


def test_term_stats(ray_session, tmp_path):
    # ref :44-91
    ix = _ix(tmp_path)
    w = ix.writer()
    w.add_document(t="alfa bravo charlie delta echo")
    w.add_document(t="bravo charlie delta echo foxtrot")
    w.add_document(t="charlie delta echo foxtrot golf")
    w.add_document(t="delta echo foxtrot")
    w.add_document(t="echo foxtrot golf hotel india juliet")
    w.add_document(t="foxtrot alfa alfa alfa")
    w.commit()

    with ix.reader() as r:
        ti = r.term_info("t", "alfa")
        assert ti.weight() == 4.0
        assert ti.doc_frequency() == 2
        assert ti.min_length() == _discreet(4)
        assert ti.max_length() == _discreet(5)
        assert ti.max_weight() == 3.0

        assert r.term_info("t", "echo").min_length() == _discreet(3)

        assert r.doc_field_length(3, "t") == _discreet(3)
        assert r.min_field_length("t") == _discreet(3)
        assert r.max_field_length("t") == _discreet(6)

    w = ix.writer()
    w.add_document(t="alfa")
    w.add_document(t="bravo charlie")
    w.add_document(t="echo foxtrot tango bravo")
    w.add_document(t="golf hotel")
    w.add_document(t="india")
    w.add_document(t="juliet alfa bravo charlie delta echo foxtrot")
    w.commit(merge=False)

    with ix.reader() as r:
        ti = r.term_info("t", "alfa")
        assert ti.weight() == 6.0
        assert ti.doc_frequency() == 4
        assert ti.min_length() == _discreet(1)
        assert ti.max_length() == _discreet(7)
        assert ti.max_weight() == 3.0

        assert r.term_info("t", "echo").min_length() == _discreet(3)
        assert r.min_field_length("t") == _discreet(1)
        assert r.max_field_length("t") == _discreet(7)


def test_min_max_id(ray_session, tmp_path):
    # ref :94-133
    schema = wrr.Schema(id=wrr.STORED(), t=wrr.TEXT())
    ix = wrr.create_in(str(tmp_path / "mmix"), schema)
    w = ix.writer()
    w.add_document(id=0, t="alfa bravo charlie")
    w.add_document(id=1, t="bravo charlie delta")
    w.add_document(id=2, t="charlie delta echo")
    w.add_document(id=3, t="delta echo foxtrot")
    w.add_document(id=4, t="echo foxtrot golf")
    w.commit()

    with ix.reader() as r:
        ti = r.term_info("t", "delta")
        assert (ti.min_id(), ti.max_id()) == (1, 3)
        ti = r.term_info("t", "alfa")
        assert (ti.min_id(), ti.max_id()) == (0, 0)
        ti = r.term_info("t", "foxtrot")
        assert (ti.min_id(), ti.max_id()) == (3, 4)

    w = ix.writer()
    w.add_document(id=5, t="foxtrot golf hotel")
    w.add_document(id=6, t="golf hotel alfa")
    w.add_document(id=7, t="hotel alfa bravo")
    w.add_document(id=8, t="alfa bravo charlie")
    w.commit(merge=False)

    with ix.reader() as r:
        ti = r.term_info("t", "delta")
        assert (ti.min_id(), ti.max_id()) == (1, 3)
        ti = r.term_info("t", "alfa")
        assert (ti.min_id(), ti.max_id()) == (0, 8)
        ti = r.term_info("t", "foxtrot")
        assert (ti.min_id(), ti.max_id()) == (3, 5)
