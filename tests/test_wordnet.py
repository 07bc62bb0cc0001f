"""WordNet thesaurus parity (reference lang/wordnet.py) on a synthetic
wn_s.pl fixture, plus storage round-trip and query expansion."""

from __future__ import annotations

import io

from whoosh_reloaded_ray.lang import wordnet

WN_S = """\
s(100001740,1,'entity',n,1,11).
s(100002056,1,'thing',n,12,0).
s(100002056,2,'entity',n,2,0).
s(202551380,1,'hail',v,3,0).
s(202551380,2,'acclaim',v,1,6).
s(202551380,3,'herald',v,2,1).
s(202028722,1,'hail',v,2,0).
s(202028722,2,'come',v,16,1).
s(300024073,1,'angry',a,1,2).
s(300024073,2,'furious',s,1,0).
s(100024073,1,'multi_word',n,1,0).
s(100024074,1,'x99',n,1,0).
% a comment line that must be skipped
sk(100001740,1,'entity%1:03:00::').
"""


def _ref_module(whoosh):
    from whoosh.lang import wordnet as ref_wn

    return ref_wn


def test_parse_parity(whoosh):
    ref_wn = _ref_module(whoosh)
    w2n, n2w = wordnet.parse_file(io.StringIO(WN_S))
    rw2n, rn2w = ref_wn.parse_file(io.StringIO(WN_S))
    assert dict(w2n) == dict(rw2n)
    assert dict(n2w) == dict(rn2w)
    # collocations / non-alpha words are skipped by both
    assert "multi_word" not in w2n and "x99" not in w2n


def test_synonyms_parity(whoosh):
    ref_wn = _ref_module(whoosh)
    ours = wordnet.Thesaurus.from_file(io.StringIO(WN_S))
    theirs = ref_wn.Thesaurus.from_file(io.StringIO(WN_S))
    for word in sorted(ours.w2n):
        assert ours.synonyms(word) == theirs.synonyms(word), word
    assert ours.synonyms("hail") == ["acclaim", "come", "herald"]
    assert ours.synonyms("HAIL") == ["acclaim", "come", "herald"]  # lowercased
    assert ours.synonyms("entity") == ["thing"]


def test_from_filename(tmp_path):
    p = tmp_path / "wn_s.pl"
    p.write_text(WN_S)
    t = wordnet.Thesaurus.from_filename(str(p))
    assert t.synonyms("angry") == ["furious"]


def test_storage_roundtrip(ray_session, tmp_path):
    t = wordnet.Thesaurus.from_file(io.StringIO(WN_S))
    t.to_storage(str(tmp_path))
    t2 = wordnet.Thesaurus.from_storage(str(tmp_path))
    for word in sorted(t.w2n):
        assert t2.synonyms(word) == t.synonyms(word), word
    assert t2.synonyms("notaword") == []


def test_expand_query():
    from whoosh_reloaded_ray.query import And, Or, Term

    t = wordnet.Thesaurus.from_file(io.StringIO(WN_S))
    q = And([Term("text", "hail"), Term("text", "plainword")])
    e = wordnet.expand_query(q, t, boost=0.5)
    assert isinstance(e, And)
    ex = e.subqueries[0]
    assert isinstance(ex, Or)
    assert [s.text for s in ex.subqueries] == ["hail", "acclaim", "come", "herald"]
    assert ex.subqueries[1].boost == 0.5
    # term without synonyms unchanged
    assert e.subqueries[1] == Term("text", "plainword")
