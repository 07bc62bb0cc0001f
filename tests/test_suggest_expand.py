"""Spelling suggestion + key-term expansion parity vs whoosh
(reference spelling.py ReaderCorrector, classify.py Bo1/Bo2/KL)."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow.parquet as pq
import pytest

from whoosh_reloaded_ray.sources.corpus import generate_transcripts
from whoosh_reloaded_ray.state.searcher import IndexSearcher


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("secorpus")
    path = str(d / "transcripts.parquet")
    generate_transcripts(path, n_turns=700, avg_turn_words=20, seed=53, rows_per_file=175)
    return path


@pytest.fixture(scope="module")
def our_index(corpus, ray_session, tmp_path_factory):
    from whoosh_reloaded_ray.pipelines.build import build_index

    idx_dir = str(tmp_path_factory.mktemp("seindex"))
    build_index([corpus], idx_dir, num_shards=4, partition_rows=175)
    return IndexSearcher(idx_dir)


@pytest.fixture(scope="module")
def whoosh_index(corpus, whoosh, tmp_path_factory):
    from whoosh import fields, index

    schema = fields.Schema(
        conv_id=fields.ID(stored=True),
        turn_idx=fields.NUMERIC(int, stored=True),
        text=fields.TEXT(stored=True, spelling=True),
    )
    d = str(tmp_path_factory.mktemp("sewhoosh"))
    ix = index.create_in(d, schema)
    w = ix.writer(limitmb=128)
    for row in pq.read_table(corpus).to_pylist():
        w.add_document(conv_id=row["conv_id"], turn_idx=row["turn_idx"], text=row["text"])
    w.commit()
    return ix


@pytest.fixture(scope="module")
def vocab(corpus):
    from whoosh_reloaded_ray.functions.analysis import make_analyzer, standard_analyzer

    analyze = make_analyzer(standard_analyzer())
    ctr = Counter()
    for t in pq.read_table(corpus, columns=["text"])["text"].to_pylist():
        ctr.update(tok for tok, _ in analyze(t))
    return [w for w, _ in ctr.most_common()]


def test_suggest_parity(our_index, whoosh_index, vocab):
    with whoosh_index.searcher() as ws:
        corr = ws.corrector("text")
        for word in vocab[10:16] + vocab[len(vocab) // 2 : len(vocab) // 2 + 4]:
            # misspell: drop 2nd char
            misspelled = word[0] + word[2:]
            theirs = corr.suggest(misspelled, limit=5, maxdist=2)
            ours = our_index.suggest("text", misspelled, limit=5, maxdist=2)
            assert ours == theirs, f"{misspelled!r}: {ours} != {theirs}"


def test_suggest_prefix_and_limit(our_index, whoosh_index, vocab):
    word = vocab[3]
    misspelled = word + "x"
    with whoosh_index.searcher() as ws:
        corr = ws.corrector("text")
        theirs = corr.suggest(misspelled, limit=3, maxdist=1, prefix=1)
    ours = our_index.suggest("text", misspelled, limit=3, maxdist=1, prefix=1)
    assert ours == theirs


@pytest.mark.parametrize("model_name", ["Bo1Model", "Bo2Model", "KLModel"])
def test_key_terms_parity(our_index, whoosh_index, model_name):
    from whoosh import classify as wclassify

    from whoosh_reloaded_ray.query import expand

    wmodel = getattr(wclassify, model_name)
    omodel = getattr(expand, model_name)
    docnums = [3, 17, 42, 99]
    with whoosh_index.searcher() as ws:
        theirs = ws.key_terms(docnums, "text", numterms=8, model=wmodel)
    ours = our_index.key_terms(docnums, "text", numterms=8, model=omodel)
    assert [t for t, _ in ours] == [t for t, _ in theirs]
    np.testing.assert_allclose(
        [w for _, w in ours], [w for _, w in theirs], atol=1e-9
    )


def test_more_like_excludes_source(our_index):
    res = our_index.more_like(5, "text", limit=10)
    assert res.num_rows > 0
    assert 5 not in res["docnum"].to_pylist()


def test_variations_generator():
    """The variation generator (morph_en-exact as of round 3; equality-
    fuzzed vs the reference in test_morph_en.py) covers the common
    inflection families."""
    from whoosh_reloaded_ray.query.variations import variations

    v = variations("pull")
    assert {"pull", "pulls", "pulled", "pulling", "puller"} <= v
    v = variations("carry")
    assert {"carry", "carries", "carried", "carrying"} <= v
    v = variations("making")
    assert {"making", "make", "makes"} <= v
    # reference morph_en parity: "-ings" expands only to the "-ing" form
    # (the old toolkit also produced render/renders/rendered)
    v = variations("renderings")
    assert {"rendering", "renderings"} == v
    v = variations("rendering")
    assert {"render", "rendering"} <= v
    # non-words pass through untouched
    assert variations("x1") == {"x1"}


def test_variations_query(our_index, vocab):
    """Variations(field, word) == scored Or over the generated variants
    that exist in the index (ExpandingTerm semantics)."""
    from whoosh_reloaded_ray.query import Or, Term, Variations
    from whoosh_reloaded_ray.query.variations import variations

    word = vocab[10]
    existing = sorted(
        t for t in variations(word) if our_index.doc_frequency("text", t) > 0
    )
    assert word in existing
    res = our_index.search(Variations("text", word), limit=None)
    ref = our_index.search(Or([Term("text", t) for t in existing]), limit=None)
    if len(existing) == 1:
        ref = our_index.search(Term("text", existing[0]), limit=None)
    assert res["docnum"].to_pylist() == ref["docnum"].to_pylist()
    np.testing.assert_allclose(
        res["score"].to_numpy(), ref["score"].to_numpy(), atol=1e-9
    )


def test_list_multi_corrector_parity(whoosh, vocab):
    """ListCorrector / MultiCorrector vs the reference on a word list."""
    from whoosh.spelling import ListCorrector as WLC
    from whoosh.spelling import MultiCorrector as WMC

    from whoosh_reloaded_ray.query.suggest import ListCorrector, MultiCorrector

    words = sorted(vocab[:300])
    target = vocab[20]
    ours = ListCorrector(words)
    theirs = WLC(words)
    for text in (target, target[:-1] + "x", "zzz"):
        for maxdist in (1, 2):
            for prefix in (0, 1):
                a = ours.suggest(text, limit=5, maxdist=maxdist, prefix=prefix)
                b = theirs.suggest(text, limit=5, maxdist=maxdist, prefix=prefix)
                assert a == b, (text, maxdist, prefix, a, b)

    # the reference's MultiCorrector._suggestions yields (sug, score)
    # REVERSED (spelling.py:163-172), so its suggest() crashes with a
    # TypeError — verify that, then check ours implements the documented
    # semantics (merged union, op-combined scores)
    half1, half2 = sorted(words[:150]), sorted(words[150:])
    mtheirs = WMC([WLC(half1), WLC(half2)], op=max)
    import pytest as _pytest

    with _pytest.raises(TypeError):
        mtheirs.suggest(target, limit=5, maxdist=2)
    mours = MultiCorrector([ListCorrector(half1), ListCorrector(half2)], op=max)
    for text in (target, target[:-1] + "x"):
        a = mours.suggest(text, limit=5, maxdist=2)
        b = ListCorrector(words).suggest(text, limit=5, maxdist=2)
        assert a == b, (text, a, b)  # union of disjoint halves == whole list


def test_most_frequent_distinctive_terms(our_index, whoosh_index, whoosh):
    """most_frequent_terms / most_distinctive_terms parity vs the
    reference reader APIs."""
    with whoosh_index.searcher() as s:
        r = s.reader()
        wf = [(f, t.decode()) for f, t in r.most_frequent_terms("text", 8)]
        wd = [(round(sc, 6), t.decode()) for sc, t in r.most_distinctive_terms("text", 8)]
        wfp = [(f, t.decode()) for f, t in r.most_frequent_terms("text", 5, prefix="a")]
    of = [(f, t) for f, t in our_index.most_frequent_terms("text", 8)]
    od = [(round(sc, 6), t) for sc, t in our_index.most_distinctive_terms("text", 8)]
    ofp = [(f, t) for f, t in our_index.most_frequent_terms("text", 5, prefix="a")]
    assert of == wf
    assert od == wd
    assert ofp == wfp
    lex = our_index.lexicon("text", prefix="ab")
    assert lex == sorted(lex) and all(t.startswith("ab") for t in lex)


def test_correct_query_parity(our_index, whoosh_index, whoosh, vocab):
    """Searcher.correct_query parity: corrected string + corrected-query
    hits match the reference (including HtmlFormatter emphasis)."""
    from whoosh.qparser import QueryParser as WQP

    from whoosh_reloaded_ray.query import highlight as hl
    from whoosh_reloaded_ray.query.parser import QueryParser
    from whoosh_reloaded_ray.schema import transcript_schema

    good, good2 = vocab[5], vocab[9]
    bad = good2[:-1] + ("x" if good2[-1] != "x" else "q")  # 1 edit away
    for qstring in (f"{good} {bad}", f'{good} AND "{bad}"', f"{bad}"):
        wq = WQP("text", whoosh_index.schema).parse(qstring)
        with whoosh_index.searcher() as s:
            wcorr = s.correct_query(wq, qstring)
            wstring = wcorr.string
            whits = sorted(h.docnum for h in s.search(wcorr.query, limit=None))
            whtml = wcorr.format_string(__import__("whoosh.highlight", fromlist=["HtmlFormatter"]).HtmlFormatter(classname="change"))
        oq = QueryParser("text", transcript_schema()).parse(qstring)
        ocorr = our_index.correct_query(oq, qstring)
        assert ocorr.string == wstring, (qstring, ocorr.string, wstring)
        ohits = sorted(
            our_index.search(ocorr.query, limit=None, scored=False)["docnum"].to_pylist()
        )
        assert ohits == whits, qstring
        ohtml = ocorr.format_string(hl.HtmlFormatter(tagname="strong", classname="change"))
        assert ohtml == whtml, (ohtml, whtml)


def test_spelling_field_unstemmed_suggestions(ray_session, whoosh, tmp_path_factory):
    """TEXT(spelling=True) with a stemming analyzer: suggestions come from
    the parallel unstemmed spell_ vocabulary, matching whoosh's separate
    spelling field (reference fields.py:296-330, 1123-1127)."""
    from whoosh import fields as wf
    from whoosh import index as windex
    from whoosh.analysis import StemmingAnalyzer

    from whoosh_reloaded_ray import compat as wrr
    from whoosh_reloaded_ray.functions.analysis import stemming_analyzer

    docs = [
        "rendering codes beautifully",
        "rendered code yesterday",
        "renders the coding pipeline",
        "printing pages",
    ]
    d = str(tmp_path_factory.mktemp("spellidx"))
    ix = wrr.create_in(
        d,
        wrr.Schema(body=wrr.TEXT(analyzer=stemming_analyzer(), spelling=True)),
    )
    w = ix.writer()
    for t in docs:
        w.add_document(body=t)
    w.commit()

    wd = str(tmp_path_factory.mktemp("spellwhoosh"))
    wix = windex.create_in(
        wd, wf.Schema(body=wf.TEXT(analyzer=StemmingAnalyzer(), spelling=True))
    )
    ww = wix.writer()
    for t in docs:
        ww.add_document(body=t)
    ww.commit()

    with wix.searcher() as ws:
        corr = ws.corrector("body")
        for word in ("renderin", "codez", "printin"):
            theirs = corr.suggest(word, limit=5)
            ours = ix.searcher()._s.suggest("body", word, limit=5)
            assert ours == theirs, (word, ours, theirs)
            # and they are unstemmed full words, not stems
            for t in ours:
                assert t in " ".join(docs).lower().split() or t.endswith(("ing", "ed", "s")), t
