"""Reference tests/test_classify.py ported (all 9 scenarios: 7 base plus
the Bo2/KL whole-suite reruns, here a model parametrization).

The reference's optional ``vector=formats.Frequency()`` variants collapse
into the plain-TEXT path: our vectors always derive from the source
parquet forward index, so vectored and unvectored schemas answer
identically (asserted in test_more_like_this by running both schemas).
"""

from __future__ import annotations

import pytest

from whoosh_reloaded_ray import classify
from whoosh_reloaded_ray import compat as wrr
from whoosh_reloaded_ray.query import Term

MODELS = [classify.Bo1Model, classify.Bo2Model, classify.KLModel]

DOMAIN = [
    "A volume that is a signed distance field used for collision"
    " calculations.  The turbulence is damped near the collision object"
    " to prevent particles from passing through.",
    "When particles cross the SDF boundary they have their velocities"
    " reversed according to the SDF normal and are pushed outside of the"
    " SDF.",
    "The distance at which the particles start to slow down due to a"
    " collision object.",
    "There are several different ways to update a particle system in"
    " response to an external velocity field. They are broadly categorized"
    " as Force, Velocity, and Position updates.",
    "Instead of applying a force in the direction of the velocity field,"
    " the force is applied relative to the difference between the"
    " particle's velocity and the velocity field.  This effectively adds"
    " an implicit drag that causes the particles to match the velocity"
    " field.",
    "In Velocity Blend mode, the amount to mix in the field velocity every"
    " timestep.",
    "In Velocity Blend mode, the amount to add the curlnoise velocity to"
    " the particle's velocity.  This can be useful in addition to"
    " advectbyvolume to layer turbulence on a velocity field.",
]

TEXT = "How do I use a velocity field for particles"


@pytest.fixture(scope="module")
def domain_ix(ray_session, tmp_path_factory):
    schema = wrr.Schema(
        path=wrr.ID(stored=True), content=wrr.TEXT(), extra=wrr.TEXT()
    )
    ix = wrr.create_in(str(tmp_path_factory.mktemp("classify")), schema)
    from string import ascii_lowercase

    w = ix.writer()
    for letter, content in zip(ascii_lowercase, DOMAIN):
        w.add_document(path=f"/{letter}", content=content, extra="")
    w.commit()
    return ix


@pytest.mark.parametrize("model", MODELS)
def test_add_text(domain_ix, model):
    # ref test_classify.py:39-51 (+ :147-164 model reruns)
    with domain_ix.reader() as r:
        exp = classify.Expander(r, "content", model=model)
        exp.add_text(TEXT)
        assert {t[0] for t in exp.expanded_terms(3)} == {
            "particles", "velocity", "field",
        }
        exp = classify.Expander(r, "extra", model=model)
        exp.add_text(TEXT)
        assert exp.expanded_terms(3) == []


@pytest.mark.parametrize("model", MODELS)
def test_keyterms(domain_ix, model):
    # ref :54-61
    with domain_ix.searcher() as s:
        docnum = s.document_number(path="/a")
        keys = list(s.key_terms([docnum], "content", numterms=3, model=model))
        assert [t[0] for t in keys] == ["collision", "calculations", "damped"]
        keys = list(s.key_terms([docnum], "extra", numterms=3, model=model))
        assert keys == []


@pytest.mark.parametrize("model", MODELS)
def test_keyterms_from_text(domain_ix, model):
    # ref :64-70
    with domain_ix.searcher() as s:
        keys = list(s.key_terms_from_text("content", TEXT, model=model))
        assert {t[0] for t in keys} == {"particles", "velocity", "field"}
        keys = list(s.key_terms_from_text("extra", TEXT, model=model))
        assert keys == []


@pytest.mark.parametrize("model", [classify.Bo2Model, classify.KLModel])
def test_more_like_this(ray_session, tmp_path, model):
    # ref :73-105 (stored-text, vectored, and text=-supplied variants)
    docs = [
        "alfa bravo charlie delta echo foxtrot golf",
        "delta echo foxtrot golf hotel india juliet",
        "echo foxtrot golf hotel india juliet kilo",
        "foxtrot golf hotel india juliet kilo lima",
        "golf hotel india juliet kilo lima mike",
        "foxtrot golf hotel india alfa bravo charlie",
    ]

    def _check(name, **kwargs):
        schema = wrr.Schema(id=wrr.ID(stored=True), text=wrr.TEXT(stored=True))
        ix = wrr.create_in(str(tmp_path / name), schema)
        with ix.writer() as w:
            for i, text in enumerate(docs, 1):
                w.add_document(id=str(i), text=text)
        with ix.searcher() as s:
            docnum = s.document_number(id="1")
            r = s.more_like(docnum, "text", model=model, **kwargs)
            assert [hit["id"] for hit in r] == ["6", "2", "3"]

    _check(f"ml-{model.__name__}")
    _check(f"mlt-{model.__name__}", text=docs[0])


@pytest.mark.parametrize("model", MODELS)
def test_more_like(ray_session, tmp_path, model):
    # ref :108-123
    schema = wrr.Schema(id=wrr.ID(stored=True), text=wrr.TEXT(stored=True))
    ix = wrr.create_in(str(tmp_path / f"morelike-{model.__name__}"), schema)
    with ix.writer() as w:
        w.add_document(id="1", text="alfa bravo charlie")
        w.add_document(id="2", text="bravo charlie delta")
        w.add_document(id="3", text="echo")
        w.add_document(id="4", text="delta echo foxtrot")
        w.add_document(id="5", text="echo echo echo")
        w.add_document(id="6", text="foxtrot golf hotel")
        w.add_document(id="7", text="golf hotel india")
    with ix.searcher() as s:
        docnum = s.document_number(id="3")
        r = s.more_like(docnum, "text", model=model)
        assert [hit["id"] for hit in r] == ["5", "4"]


@pytest.mark.parametrize("model", MODELS)
def test_empty_more_like(ray_session, tmp_path, model):
    # ref :126-137
    schema = wrr.Schema(text=wrr.TEXT())
    ix = wrr.create_in(str(tmp_path / f"empty-{model.__name__}"), schema)
    with ix.searcher() as s:
        assert s.doc_count() == 0
        r = s.search(Term("a", "b"))
        assert r.scored_length() == 0
        assert r.key_terms("text", model=model) == []
        ex = classify.Expander(s.reader(), "text", model=model)
        assert ex.expanded_terms(1) == []


@pytest.mark.parametrize("model", MODELS)
def test_fake_more_like(model):
    # ref :140-144
    from whoosh_reloaded_ray import reading

    schema = wrr.Schema(text=wrr.TEXT())
    reader = reading.EmptyReader(schema)
    ex = classify.Expander(reader, "text", model=model)
    assert ex.expanded_terms(1) == []
