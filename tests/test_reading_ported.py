"""Reference tests/test_reading.py ported (12 of 14 scenarios; ref line
numbers cited per test).

Skipped with justification:
- test_reader_subclasses (ref :448-453) — asserts the reference's own
  abstract-method checker over its SegmentReader/MultiReader class
  hierarchy; no engine behavior (we have a single Reader over pinned
  segment snapshots by design, SURVEY §1.3).
- the MultiReader cursor NotImplementedError tail of test_first_id (ref
  :329-331) — DECLARED DEVIATION: our cursor merges per-segment lexicons
  and works on multi-segment indexes too (asserted below).

Term-type deviation (declared in Reader.__iter__): reference terms are
utf-8 bytes, ours are str — ported assertions compare decoded text.
"""

from __future__ import annotations

import threading

import pytest

from whoosh_reloaded_ray import compat as wrr


def _create(tmp_path, name, **fields):
    return wrr.create_in(str(tmp_path / name), wrr.Schema(**fields))


def _rw_schema():
    return dict(
        f1=wrr.KEYWORD(stored=True),
        f2=wrr.KEYWORD(stored=False),
        f3=wrr.KEYWORD(stored=False),
    )


_DOCS = [
    dict(f1="A B C", f2="1 2 3", f3="X Y Z"),
    dict(f1="D E F", f2="4 5 6", f3="Q R S"),
    dict(f1="A E C", f2="1 4 6", f3="X Q S"),
    dict(f1="A A A", f2="2 3 5", f3="Y R Z"),
    dict(f1="A B", f2="1 2", f3="X Y"),
]


def _one_segment_index(tmp_path):
    ix = _create(tmp_path, "one", **_rw_schema())
    w = ix.writer()
    for d in _DOCS:
        w.add_document(**d)
    w.commit()
    return ix


def _multi_segment_index(tmp_path):
    ix = _create(tmp_path, "multi", **_rw_schema())
    w = ix.writer()
    w.add_document(**_DOCS[0])
    w.add_document(**_DOCS[1])
    w.commit()
    w = ix.writer()
    w.add_document(**_DOCS[2])
    w.add_document(**_DOCS[3])
    w.commit(merge=False)
    w = ix.writer()
    w.add_document(**_DOCS[4])
    w.commit(merge=False)
    return ix


def _stats(r):
    return [
        (fname, text, ti.doc_frequency(), ti.weight()) for (fname, text), ti in r
    ]


def _fstats(r):
    return [(text, ti.doc_frequency(), ti.weight()) for text, ti in r]


def test_readers(ray_session, tmp_path):
    # ref :61-104
    target = sorted(
        [
            ("f1", "A", 4, 6), ("f1", "B", 2, 2), ("f1", "C", 2, 2),
            ("f1", "D", 1, 1), ("f1", "E", 2, 2), ("f1", "F", 1, 1),
            ("f2", "1", 3, 3), ("f2", "2", 3, 3), ("f2", "3", 2, 2),
            ("f2", "4", 2, 2), ("f2", "5", 2, 2), ("f2", "6", 2, 2),
            ("f3", "Q", 2, 2), ("f3", "R", 2, 2), ("f3", "S", 2, 2),
            ("f3", "X", 3, 3), ("f3", "Y", 3, 3), ("f3", "Z", 2, 2),
        ]
    )
    stored = [{"f1": d["f1"]} for d in _DOCS]

    def t(ix):
        r = ix.reader()
        assert list(r.all_stored_fields()) == stored
        assert sorted(_stats(r)) == target

    t(_one_segment_index(tmp_path))
    ix = _multi_segment_index(tmp_path)
    assert len(ix._segments()) == 3
    t(ix)


def _inspection_docs():
    return [
        dict(title="My document",
             content="AA AA BB BB CC AA AA AA BB BB CC DD EE EE"),
        dict(title="My other document", content="AA AB BB CC EE EE AX AX DD"),
    ]


def test_term_inspection(ray_session, tmp_path):
    # ref :106-170
    ix = _create(tmp_path, "insp", title=wrr.TEXT(stored=True),
                 content=wrr.TEXT())
    w = ix.writer()
    for d in _inspection_docs():
        w.add_document(**d)
    w.commit()
    with ix.reader() as r:
        assert " ".join(r.field_terms("content")) == "aa ab ax bb cc dd ee"
        assert list(r.expand_prefix("content", "a")) == ["aa", "ab", "ax"]
        assert set(r.all_terms()) == {
            ("content", "aa"), ("content", "ab"), ("content", "ax"),
            ("content", "bb"), ("content", "cc"), ("content", "dd"),
            ("content", "ee"), ("title", "document"), ("title", "my"),
            ("title", "other"),
        }
        # (text, doc_freq, index_freq)
        assert _fstats(r.iter_field("content")) == [
            ("aa", 2, 6), ("ab", 1, 1), ("ax", 1, 2), ("bb", 2, 5),
            ("cc", 2, 3), ("dd", 2, 2), ("ee", 2, 4),
        ]
        assert _fstats(r.iter_field("content", prefix="c")) == [
            ("cc", 2, 3), ("dd", 2, 2), ("ee", 2, 4),
        ]
        assert list(r.most_frequent_terms("content")) == [
            (6, "aa"), (5, "bb"), (4, "ee"), (3, "cc"), (2, "dd"),
        ]
        assert list(r.most_frequent_terms("content", prefix="a")) == [
            (6, "aa"), (2, "ax"), (1, "ab"),
        ]
        assert list(r.most_distinctive_terms("content", 3)) == [
            (1.3862943611198906, "ax"),
            (0.6931471805599453, "ab"),
            (0.0, "ee"),
        ]


@pytest.mark.parametrize("merge", [True, False])
def test_term_inspection_unicode(ray_session, tmp_path, merge):
    # ref :551-577 test_term_inspection_{segment,multi}_reader (merge
    # param = one commit vs two unmerged generations); unicode terms
    AE, AU = "aé", "aú"
    ix = _create(tmp_path, f"uni{merge}", title=wrr.TEXT(stored=True),
                 content=wrr.TEXT())
    docs = [
        dict(title="My document",
             content="AA AA BB BB CC AA AA AA BB BB CC DD EE EE"),
        dict(title="My other document",
             content="AA AÉ BB CC EE EE Aú AÚ DD"),
    ]
    if merge:
        w = ix.writer()
        for d in docs:
            w.add_document(**d)
        w.commit()
    else:
        for d in docs:
            w = ix.writer()
            w.add_document(**d)
            w.commit(merge=False)
    with ix.reader() as r:
        assert " ".join(r.field_terms("content")) == f"aa {AE} {AU} bb cc dd ee"
        assert list(r.expand_prefix("content", "a")) == ["aa", AE, AU]
        assert _fstats(r.iter_field("content")) == [
            ("aa", 2, 6), (AE, 1, 1), (AU, 1, 2), ("bb", 2, 5),
            ("cc", 2, 3), ("dd", 2, 2), ("ee", 2, 4),
        ]
        assert list(r.most_frequent_terms("content", prefix="a")) == [
            (6, "aa"), (2, AU), (1, AE),
        ]
        assert list(r.most_distinctive_terms("content", 3)) == [
            (1.3862943611198906, AU),
            (0.6931471805599453, AE),
            (0.0, "ee"),
        ]


def test_vector_postings(ray_session, tmp_path):
    # ref :172-195 (vector_as("weight"); our vectors derive from the
    # source parquet forward index rather than a stored vector format)
    ix = _create(tmp_path, "vec", id=wrr.ID(stored=True, unique=True),
                 content=wrr.TEXT())
    w = ix.writer()
    w.add_document(id="1",
                   content="the quick brown fox jumped over the lazy dogs")
    w.commit()
    r = ix.reader()
    assert list(r.vector_as("weight", 0, "content")) == [
        ("brown", 1.0), ("dogs", 1.0), ("fox", 1.0), ("jumped", 1.0),
        ("lazy", 1.0), ("over", 1.0), ("quick", 1.0),
    ]


def test_stored_fields(ray_session, tmp_path):
    # ref :197-218
    ix = _create(tmp_path, "sf", a=wrr.ID(stored=True), b=wrr.STORED(),
                 c=wrr.KEYWORD(stored=False), d=wrr.TEXT(stored=True))
    w = ix.writer()
    w.add_document(a="1", b="a", c="zulu", d="Alfa")
    w.add_document(a="2", b="b", c="yankee", d="Bravo")
    w.add_document(a="3", b="c", c="xray", d="Charlie")
    w.commit()
    with ix.searcher() as sr:
        assert sr.stored_fields(0) == {"a": "1", "b": "a", "d": "Alfa"}
        assert sr.stored_fields(2) == {"a": "3", "b": "c", "d": "Charlie"}
        assert sr.document(a="1") == {"a": "1", "b": "a", "d": "Alfa"}
        assert sr.document(a="2") == {"a": "2", "b": "b", "d": "Bravo"}


def test_stored_fields2(ray_session, tmp_path):
    # ref :221-265
    schema = wrr.Schema(
        content=wrr.TEXT(stored=True),
        title=wrr.TEXT(stored=True),
        summary=wrr.STORED(),
        path=wrr.ID(stored=True),
    )
    assert schema.stored_names() == ["content", "path", "summary", "title"]
    ix = wrr.create_in(str(tmp_path / "sf2"), schema)
    w = ix.writer()
    w.add_document(content="Content of this document.",
                   title="This is the title", summary="This is the summary",
                   path="/main")
    w.add_document(content="Second document.", title="Second title",
                   summary="Summary numero due", path="/second")
    w.add_document(content="Third document.", title="Title 3",
                   summary="Summary treo", path="/san")
    w.commit()
    with ix.searcher() as s:
        doc = s.document(path="/main")
        assert doc is not None
        assert [doc[k] for k in sorted(doc.keys())] == [
            "Content of this document.", "/main", "This is the summary",
            "This is the title",
        ]


def test_all_stored_fields(ray_session, tmp_path):
    # ref :268-289 — Searcher.all_stored_fields skips deleted docs
    ix = _create(tmp_path, "asf", a=wrr.ID(stored=True), b=wrr.STORED())
    with ix.writer() as w:
        w.add_document(a="alfa", b="bravo")
        w.add_document(a="apple", b="bear")
        w.add_document(a="alpaca", b="beagle")
        w.add_document(a="aim", b="box")
    w = ix.writer()
    w.delete_by_term("a", "apple")
    w.delete_by_term("a", "aim")
    w.commit(merge=False)
    with ix.searcher() as s:
        assert s.doc_count_all() == 4
        assert s.doc_count() == 2
        sfs = [(sf["a"], sf["b"]) for sf in s.all_stored_fields()]
        assert sfs == [("alfa", "bravo"), ("alpaca", "beagle")]


def test_first_id(ray_session, tmp_path):
    # ref :292-331 (single- and multi-generation; the reference's
    # MultiReader raises NotImplementedError on cursor() — ours works on
    # multi-segment indexes, declared deviation asserted at the end)
    ix = _create(tmp_path, "fid1", path=wrr.ID(stored=True))
    w = ix.writer()
    for p in ("/a", "/b", "/c"):
        w.add_document(path=p)
    w.commit()
    r = ix.reader()
    docid = r.first_id("path", "/b")
    assert r.stored_fields(docid) == {"path": "/b"}

    ix = _create(tmp_path, "fid2", path=wrr.ID(stored=True))
    for batch in (("/a", "/b", "/c"), ("/d", "/e", "/f"), ("/g", "/h", "/i")):
        w = ix.writer()
        for p in batch:
            w.add_document(path=p)
        w.commit(merge=False)
    r = ix.reader()
    docid = r.first_id("path", "/e")
    assert r.stored_fields(docid) == {"path": "/e"}
    with pytest.raises(KeyError):
        r.first_id("path", "/zzz")
    cur = r.cursor("path")  # deviation: works multi-segment
    assert cur.text() == "/a"


def test_doc_count(ray_session, tmp_path):
    # ref :401-445
    ix = _create(tmp_path, "dc", id=wrr.NUMERIC())
    with ix.writer() as w:
        for i in range(10):
            w.add_document(id=i)
    r = ix.reader()
    assert r.doc_count() == 10
    assert r.doc_count_all() == 10

    w = ix.writer()
    for d in (2, 4, 6, 8):
        w.delete_document(d)
    w.commit()
    r = ix.reader()
    assert r.doc_count() == 6
    assert r.doc_count_all() == 10

    w = ix.writer()
    for i in range(10, 15):
        w.add_document(id=i)
    w.commit(merge=False)
    r = ix.reader()
    assert r.doc_count() == 11
    assert r.doc_count_all() == 15


def test_cursor(ray_session, tmp_path):
    # ref :456-489
    ix = _create(tmp_path, "cur", text=wrr.TEXT())
    with ix.writer() as w:
        w.add_document(text="papa quebec romeo sierra tango")
        w.add_document(text="foxtrot golf hotel india juliet")
        w.add_document(text="alfa bravo charlie delta echo")
        w.add_document(text="uniform victor whiskey x-ray")
        w.add_document(text="kilo lima mike november oskar")
        w.add_document(text="charlie alfa alfa bravo bravo bravo")
    with ix.reader() as r:
        cur = r.cursor("text")
        assert cur.text() == "alfa"
        assert cur.next() == "bravo"
        assert cur.text() == "bravo"
        assert cur.find(b"inc") == "india"
        assert cur.text() == "india"
        assert cur.first() == "alfa"
        assert cur.text() == "alfa"
        assert cur.find(b"zulu") is None
        assert cur.text() is None
        assert not cur.is_valid()
        assert cur.find(b"a") == "alfa"
        assert cur.term_info().weight() == 3
        assert cur.next() == "bravo"
        assert cur.term_info().weight() == 4
        assert cur.next() == "charlie"
        assert cur.term_info().weight() == 2


def test_nonexclusive_read(ray_session, tmp_path):
    # ref :372-398 — concurrent readers over a multi-generation index
    ix = _create(tmp_path, "nxr", text=wrr.TEXT())
    for num in "one two three four five".split():
        w = ix.writer()
        w.add_document(text=f"Test document {num}")
        w.commit(merge=False)

    errors = []

    def fn():
        try:
            for _ in range(5):
                r = ix.reader()
                assert list(r.field_terms("text")) == [
                    "document", "five", "four", "one", "test", "three", "two",
                ]
                r.close()
        except Exception as e:  # surfaced below: thread asserts don't fail pytest
            errors.append(e)

    ths = [threading.Thread(target=fn) for _ in range(5)]
    for th in ths:
        th.start()
    for th in ths:
        th.join()
    assert not errors


def test_delete_recovery(ray_session, tmp_path):
    # ref :334-370 — readers opened concurrently with committing writers
    # never see a torn index (counts reduced 50/10 -> 10/4: each of our
    # commits is a full Ray segment build)
    ix = _create(tmp_path, "delrec", text=wrr.TEXT())
    w = ix.writer()
    w.add_document(text="alfa bravo charlie delta")
    w.commit()
    errors = []

    def read_loop():
        try:
            for _ in range(10):
                r = ix.reader()
                list(r.field_terms("text"))
                r.close()
        except Exception as e:
            errors.append(e)

    def write_loop():
        try:
            for words in ("echo foxtrot", "golf hotel", "india juliet",
                          "kilo lima"):
                w = ix.writer()
                w.add_document(text=words)
                w.commit(merge=False)
        except Exception as e:
            errors.append(e)

    tr = threading.Thread(target=read_loop)
    tw = threading.Thread(target=write_loop)
    tw.start(); tr.start()
    tw.join(); tr.join()
    assert not errors
