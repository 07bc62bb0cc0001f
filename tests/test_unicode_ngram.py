"""Unicode text end-to-end parity + NGRAM field end-to-end.

The regex token pattern uses re.UNICODE \\w semantics (accented latin,
cyrillic, CJK word chars all match) — index build and BM25 ranking must
agree with whoosh on such corpora, not just ASCII."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from whoosh_reloaded_ray.query import And, Or, Phrase, Term
from whoosh_reloaded_ray.state.searcher import IndexSearcher

UNICODE_DOCS = [
    "Café au lait für alle — naïve approach. Müller straße",
    "Привет мир; тестовое сообщение для поиска",
    "日本語のテキスト 検索エンジン テスト",
    "Mixed café text with MÜLLER and Straße tokens",
    "çok güzel bir gün — öğrenme motorü",
    "naïve café über alles straße mir",
    "résumé déjà-vu cliché café",
]


@pytest.fixture(scope="module")
def pair(ray_session, whoosh, tmp_path_factory):
    from whoosh_reloaded_ray.pipelines.build import build_index
    from whoosh_reloaded_ray.schema import IndexSchema, id_field, text_field

    d = tmp_path_factory.mktemp("unicorpus")
    path = str(d / "docs.parquet")
    tbl = pa.table(
        {
            "key": pa.array([str(i) for i in range(len(UNICODE_DOCS))]),
            "body": pa.array(UNICODE_DOCS),
        }
    )
    pq.write_table(tbl, path)
    idx = str(tmp_path_factory.mktemp("uniidx"))
    schema = IndexSchema(fields=[id_field("key"), text_field("body")])
    build_index([path], idx, schema=schema, num_shards=2, partition_rows=16)
    ours = IndexSearcher(idx)

    from whoosh import fields, index

    wdir = str(tmp_path_factory.mktemp("uniwhoosh"))
    ix = index.create_in(wdir, fields.Schema(key=fields.ID(stored=True), body=fields.TEXT))
    w = ix.writer()
    for i, t in enumerate(UNICODE_DOCS):
        w.add_document(key=str(i), body=t)
    w.commit()
    return ours, ix


@pytest.mark.parametrize(
    "term", ["café", "müller", "straße", "мир", "日本語のテキスト", "naïve", "über"]
)
def test_unicode_term_parity(pair, term):
    ours, ix = pair
    from whoosh.query import Term as WT

    res = ours.search(Term("body", term), limit=None)
    with ix.searcher() as s:
        theirs = [(h.docnum, h.score) for h in s.search(WT("body", term), limit=None)]
    assert res["docnum"].to_pylist() == [d for d, _ in theirs], term
    np.testing.assert_allclose(
        res["score"].to_pylist(), [sc for _, sc in theirs], atol=1e-6
    )


def test_unicode_phrase_parity(pair):
    ours, ix = pair
    from whoosh.query import Phrase as WPhrase

    res = ours.search(Phrase("body", ["café", "über"]), limit=None)
    with ix.searcher() as s:
        theirs = [h.docnum for h in s.search(WPhrase("body", ["café", "über"]), limit=None)]
    assert res["docnum"].to_pylist() == theirs


def test_ngram_field_end_to_end(ray_session, whoosh, tmp_path_factory):
    """NGRAM-analyzed field: build + substring-style search parity."""
    from whoosh_reloaded_ray.functions.analysis import ngram_analyzer
    from whoosh_reloaded_ray.pipelines.build import build_index
    from whoosh_reloaded_ray.schema import FieldSpec, IndexSchema, id_field

    docs = ["hello world", "yellow mellow", "worldwide web", "held weld"]
    d = tmp_path_factory.mktemp("ngramcorpus")
    path = str(d / "docs.parquet")
    pq.write_table(
        pa.table({"key": pa.array([str(i) for i in range(len(docs))]), "body": pa.array(docs)}),
        path,
    )
    idx = str(tmp_path_factory.mktemp("ngramidx"))
    schema = IndexSchema(
        fields=[
            id_field("key"),
            FieldSpec(
                name="body", kind="text", analyzer=ngram_analyzer(minsize=3, maxsize=3),
                scorable=True, positions=False,
            ),
        ]
    )
    build_index([path], idx, schema=schema, num_shards=2, partition_rows=8)
    ours = IndexSearcher(idx)

    from whoosh import fields, index

    wdir = str(tmp_path_factory.mktemp("ngramwhoosh"))
    ix = index.create_in(
        wdir, fields.Schema(key=fields.ID(stored=True), body=fields.NGRAM(minsize=3, maxsize=3))
    )
    w = ix.writer()
    for i, t in enumerate(docs):
        w.add_document(key=str(i), body=t)
    w.commit()

    from whoosh.query import Term as WT

    for gram in ["ell", "wor", "eld"]:
        res = ours.search(Term("body", gram), limit=None)
        with ix.searcher() as s:
            theirs = [(h.docnum, h.score) for h in s.search(WT("body", gram), limit=None)]
        assert res["docnum"].to_pylist() == [dd for dd, _ in theirs], gram
        np.testing.assert_allclose(
            res["score"].to_pylist(), [sc for _, sc in theirs], atol=1e-6
        )
