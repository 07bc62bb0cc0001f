"""Reference tests/test_analysis.py ported wholesale (same test names,
same inputs/assertions) against the compat pipe-DSL token path.

Declared deviations:
- RamStorage becomes a tmp index dir (no RAM codec by design);
- reader terms are str, not utf-8 bytes — assertions compare text;
- test_unicode_blocks is NOT here (whoosh.support.unicode vendors the
  Unicode block table; no engine path uses it — see scripts/ported_sweep.py).
"""

from __future__ import annotations

from pickle import dumps

import pytest

from whoosh_reloaded_ray import analysis, compat as wrr, fields, qparser
from whoosh_reloaded_ray import formats as wformats


def test_regextokenizer():
    # ref test_analysis.py:8
    value = "AAAaaaBBBbbbCCCcccDDDddd"
    rex = analysis.RegexTokenizer("[A-Z]+")
    assert [t.text for t in rex(value)] == ["AAA", "BBB", "CCC", "DDD"]
    rex = analysis.RegexTokenizer("[A-Z]+", gaps=True)
    assert [t.text for t in rex(value)] == ["aaa", "bbb", "ccc", "ddd"]


def test_path_tokenizer():
    # ref :18
    value = "/alfa/bravo/charlie/delta/"
    pt = analysis.PathTokenizer()
    assert [t.text for t in pt(value)] == [
        "/alfa", "/alfa/bravo", "/alfa/bravo/charlie", "/alfa/bravo/charlie/delta",
    ]


def test_path_tokenizer2(ray_session, tmp_path_factory):
    # ref :29 (RamStorage -> tmp dir; bytes terms -> str)
    d = str(tmp_path_factory.mktemp("pathtok"))
    schema = wrr.Schema(path=wrr.TEXT(analyzer=analysis.PathTokenizer()))
    ix = wrr.create_in(d, schema)
    with ix.writer() as writer:
        writer.add_document(path="/alfa/brvo/charlie/delta/")
        writer.add_document(path="/home/user/file.txt")
    assert not ix.is_empty()
    with ix.reader() as reader:
        items = list(reader.all_terms())
    assert "path" in [field for field, value in items]
    assert "/alfa" in [value for field, value in items]


def test_composition1():
    # ref :46
    ca = analysis.RegexTokenizer() | analysis.LowercaseFilter()
    assert ca.__class__.__name__ == "CompositeAnalyzer"
    assert ca[0].__class__.__name__ == "RegexTokenizer"
    assert ca[1].__class__.__name__ == "LowercaseFilter"
    assert [t.text for t in ca("ABC 123")] == ["abc", "123"]


def test_composition2():
    # ref :54
    ca = analysis.RegexTokenizer() | analysis.LowercaseFilter()
    sa = ca | analysis.StopFilter()
    assert len(sa) == 3
    assert sa.__class__.__name__ == "CompositeAnalyzer"
    assert sa[0].__class__.__name__ == "RegexTokenizer"
    assert sa[1].__class__.__name__ == "LowercaseFilter"
    assert sa[2].__class__.__name__ == "StopFilter"
    assert [t.text for t in sa("The ABC 123")] == ["abc", "123"]


def test_composition3():
    # ref :66
    sa = analysis.RegexTokenizer() | analysis.StopFilter()
    assert sa.__class__.__name__ == "CompositeAnalyzer"


def test_composing_functions():
    # ref :71
    tokenizer = analysis.RegexTokenizer()

    def filter(tokens):
        for t in tokens:
            t.text = t.text.upper()
            yield t

    with pytest.raises(TypeError):
        tokenizer | filter


def test_shared_composition():
    # ref :84
    shared = analysis.RegexTokenizer(r"\S+") | analysis.LowercaseFilter()
    ana1 = shared | analysis.NgramFilter(3)
    ana2 = shared | analysis.DoubleMetaphoneFilter()
    assert [t.text for t in ana1("hello")] == ["hel", "ell", "llo"]
    assert [t.text for t in ana2("hello")] == ["HL"]


def test_multifilter():
    # ref :94
    f1 = analysis.LowercaseFilter()
    f2 = analysis.PassFilter()
    mf = analysis.MultiFilter(a=f1, b=f2)
    ana = analysis.RegexTokenizer(r"\S+") | mf
    text = "ALFA BRAVO CHARLIE"
    assert [t.text for t in ana(text, mode="a")] == ["alfa", "bravo", "charlie"]
    assert [t.text for t in ana(text, mode="b")] == ["ALFA", "BRAVO", "CHARLIE"]


def test_tee_filter():
    # ref :105
    target = "Alfa Bravo Charlie"
    f1 = analysis.LowercaseFilter()
    f2 = analysis.ReverseTextFilter()
    ana = analysis.RegexTokenizer(r"\S+") | analysis.TeeFilter(f1, f2)
    result = " ".join([t.text for t in ana(target)])
    assert result == "alfa aflA bravo ovarB charlie eilrahC"

    class ucfilter(analysis.Filter):
        def __call__(self, tokens):
            for t in tokens:
                t.text = t.text.upper()
                yield t

    f2 = analysis.ReverseTextFilter() | ucfilter()
    ana = analysis.RegexTokenizer(r"\S+") | analysis.TeeFilter(f1, f2)
    result = " ".join([t.text for t in ana(target)])
    assert result == "alfa AFLA bravo OVARB charlie EILRAHC"

    f1 = analysis.PassFilter()
    f2 = analysis.BiWordFilter()
    ana = (
        analysis.RegexTokenizer(r"\S+")
        | analysis.TeeFilter(f1, f2)
        | analysis.LowercaseFilter()
    )
    result = " ".join([t.text for t in ana("Alfa Bravo Charlie")])
    assert result == "alfa alfa-bravo bravo bravo-charlie charlie"


def test_intraword():
    # ref :131
    iwf = analysis.IntraWordFilter(mergewords=True, mergenums=True)
    ana = analysis.RegexTokenizer(r"\S+") | iwf

    def check(text, ls):
        assert [(t.pos, t.text) for t in ana(text)] == ls

    check("PowerShot)", [(0, "Power"), (1, "Shot"), (1, "PowerShot")])
    check("A's+B's&C's", [(0, "A"), (1, "B"), (2, "C"), (2, "ABC")])
    check(
        "Super-Duper-XL500-42-AutoCoder!",
        [
            (0, "Super"), (1, "Duper"), (2, "XL"), (2, "SuperDuperXL"),
            (3, "500"), (4, "42"), (4, "50042"), (5, "Auto"), (6, "Coder"),
            (6, "AutoCoder"),
        ],
    )


def test_intraword_chars():
    # ref :157
    iwf = analysis.IntraWordFilter(mergewords=True, mergenums=True)
    ana = analysis.RegexTokenizer(r"\S+") | iwf | analysis.LowercaseFilter()

    target = "WiKiWo-rd"
    tokens = [(t.text, t.startchar, t.endchar) for t in ana(target, chars=True)]
    assert tokens == [
        ("wi", 0, 2), ("ki", 2, 4), ("wo", 4, 6), ("rd", 7, 9),
        ("wikiword", 0, 9),
    ]

    target = "Zo WiKiWo-rd"
    tokens = [(t.text, t.startchar, t.endchar) for t in ana(target, chars=True)]
    assert tokens == [
        ("zo", 0, 2), ("wi", 3, 5), ("ki", 5, 7), ("wo", 7, 9),
        ("rd", 10, 12), ("wikiword", 3, 12),
    ]


def test_intraword_possessive():
    # ref :182
    iwf = analysis.IntraWordFilter(mergewords=True, mergenums=True)
    ana = analysis.RegexTokenizer(r"\S+") | iwf | analysis.LowercaseFilter()
    target = "O'Malley's-Bar"
    tokens = [(t.text, t.startchar, t.endchar) for t in ana(target, chars=True)]
    assert tokens == [
        ("o", 0, 1), ("malley", 2, 8), ("bar", 11, 14), ("omalleybar", 0, 14),
    ]


def test_word_segments():
    # ref :196
    wordset = set("alfa bravo charlie delta".split())
    cwf = analysis.CompoundWordFilter(wordset, keep_compound=True)
    ana = analysis.RegexTokenizer(r"\S+") | cwf
    target = "alfacharlie bravodelta delto bravo subalfa"
    tokens = [t.text for t in ana(target)]
    assert tokens == [
        "alfacharlie", "alfa", "charlie", "bravodelta", "bravo", "delta",
        "delto", "bravo", "subalfa",
    ]

    cwf = analysis.CompoundWordFilter(wordset, keep_compound=False)
    ana = analysis.RegexTokenizer(r"\S+") | cwf
    tokens = [t.text for t in ana(target)]
    assert tokens == ["alfa", "charlie", "bravo", "delta", "delto", "bravo",
                      "subalfa"]


def test_biword():
    # ref :224
    ana = analysis.RegexTokenizer(r"\w+") | analysis.BiWordFilter()
    result = [t.copy() for t in ana("the sign of four", chars=True,
                                    positions=True)]
    assert ["the-sign", "sign-of", "of-four"] == [t.text for t in result]
    assert [(0, 8), (4, 11), (9, 16)] == [(t.startchar, t.endchar)
                                          for t in result]
    assert [0, 1, 2] == [t.pos for t in result]

    result = [t.copy() for t in ana("single")]
    assert len(result) == 1
    assert result[0].text == "single"


def test_shingles():
    # ref :237
    ana = analysis.RegexTokenizer(r"\w+") | analysis.ShingleFilter(3, " ")
    source = "better a witty fool than a foolish wit"
    results = [t.copy() for t in ana(source, positions=True, chars=True)]
    assert [t.text for t in results] == [
        "better a witty", "a witty fool", "witty fool than", "fool than a",
        "than a foolish", "a foolish wit",
    ]
    assert [t.pos for t in results] == list(range(len(results)))
    for t in results:
        assert t.text == source[t.startchar:t.endchar]


def test_double_metaphone(whoosh):
    # ref :265 (the name table exercises the shared double_metaphone
    # algorithm; the filter asserts boosts; the field asserts process_text)
    from whoosh_reloaded_ray.functions.dmetaphone import double_metaphone

    names = {
        "maurice": ("MRS", None), "aubrey": ("APR", None),
        "cambrillo": ("KMPRL", "KMPR"), "heidi": ("HT", None),
        "katherine": ("K0RN", "KTRN"), "Thumbail": ("0MPL", "TMPL"),
        "catherine": ("K0RN", "KTRN"), "richard": ("RXRT", "RKRT"),
        "bob": ("PP", None), "eric": ("ARK", None), "geoff": ("JF", "KF"),
        "Through": ("0R", "TR"), "Schwein": ("XN", "XFN"),
        "dave": ("TF", None), "ray": ("R", None), "steven": ("STFN", None),
        "bryce": ("PRS", None), "randy": ("RNT", None),
        "bryan": ("PRN", None), "Rapelje": ("RPL", None),
        "brian": ("PRN", None), "otto": ("AT", None), "auto": ("AT", None),
        "Dallas": ("TLS", None), "maisey": ("MS", None),
        "zhang": ("JNK", None), "Chile": ("XL", None), "Jose": ("HS", None),
        "Arnow": ("ARN", "ARNF"), "solilijs": ("SLLS", None),
        "Parachute": ("PRKT", None), "Nowhere": ("NR", None),
        "Tux": ("TKS", None),
    }
    for name, expect in names.items():
        assert double_metaphone(name.lower()) == expect, name

    mf = (
        analysis.RegexTokenizer()
        | analysis.LowercaseFilter()
        | analysis.DoubleMetaphoneFilter()
    )
    results = [(t.text, t.boost) for t in mf("Spruce View")]
    assert results == [("SPRS", 1.0), ("F", 1.0), ("FF", 0.5)]

    mf = (
        analysis.RegexTokenizer()
        | analysis.LowercaseFilter()
        | analysis.DoubleMetaphoneFilter(combine=True)
    )
    results = [(t.text, t.boost) for t in mf("Spruce View")]
    assert results == [
        ("spruce", 1.0), ("SPRS", 1.0), ("view", 1.0), ("F", 1.0),
        ("FF", 0.5),
    ]

    namefield = fields.TEXT(analyzer=mf)
    texts = list(namefield.process_text("Spruce View", mode="query"))
    assert texts == ["spruce", "SPRS", "view", "F", "FF"]


def test_substitution():
    # ref :337
    mf = analysis.RegexTokenizer(r"\S+") | analysis.SubstitutionFilter("-", "")
    assert [t.text for t in mf("one-two th-re-ee four")] == [
        "onetwo", "threee", "four",
    ]
    mf = analysis.RegexTokenizer(r"\S+") | analysis.SubstitutionFilter(
        "([^=]*)=(.*)", r"\2=\1"
    )
    assert [t.text for t in mf("a=b c=d ef")] == ["b=a", "d=c", "ef"]


def test_porter2():
    # ref :357 (whoosh.lang.porter2.stem -> functions.porter2)
    from whoosh_reloaded_ray.functions.porter2 import porter2_stem as stem

    plurals = [
        "caresses", "flies", "dies", "mules", "denied", "died", "agreed",
        "owned", "humbled", "sized", "meeting", "stating", "siezing",
        "itemization", "sensational", "traditional", "reference",
        "colonizer", "plotted",
    ]
    singles = [stem(w) for w in plurals]
    assert singles == [
        "caress", "fli", "die", "mule", "deni", "die", "agre", "own",
        "humbl", "size", "meet", "state", "siez", "item", "sensat",
        "tradit", "refer", "colon", "plot",
    ]
    assert stem("bill's") == "bill"
    assert stem("y's") == "y"


def test_url():
    # ref :434
    sample = (
        "Visit https://github.com/sygil-dev/whoosh-reloaded or "
        "urn:isbn:5930502 or http://www.apple.com/."
    )
    anas = [
        analysis.SimpleAnalyzer(analysis.url_pattern),
        analysis.StandardAnalyzer(analysis.url_pattern, stoplist=None),
    ]
    for ana in anas:
        ts = [t.text for t in ana(sample)]
        assert ts == [
            "visit", "https://github.com/sygil-dev/whoosh-reloaded", "or",
            "urn:isbn:5930502", "or", "http://www.apple.com/",
        ]


def test_name_field(ray_session, tmp_path_factory):
    # ref :453
    d = str(tmp_path_factory.mktemp("namefield"))
    ana = (
        analysis.RegexTokenizer(r"\S+")
        | analysis.LowercaseFilter()
        | analysis.DoubleMetaphoneFilter(combine=True)
    )
    namefield = fields.TEXT(analyzer=ana, multitoken_query="or")
    schema = wrr.Schema(id=wrr.STORED(), name=namefield)
    ix = wrr.create_in(d, schema)
    w = ix.writer()
    w.add_document(id="one", name="Leif Ericson")
    w.commit()

    s = ix.searcher()
    qp = qparser.QueryParser("name", schema)
    q = qp.parse("leaf eriksen")
    r = s.search(q)
    assert len(r) == 1


def test_start_pos():
    # ref :471
    ana = analysis.RegexTokenizer(r"\S+") | analysis.LowercaseFilter()
    kw = {"positions": True}
    tks = wformats.tokens("alfa bravo charlie delta", ana, kw)
    assert [t.pos for t in tks] == [0, 1, 2, 3]

    kw["start_pos"] = 3
    ts = [t.copy() for t in wformats.tokens("A B C D".split(), ana, kw)]
    assert " ".join([t.text for t in ts]) == "A B C D"
    assert [t.pos for t in ts] == [3, 4, 5, 6]


def test_frowny_face():
    # ref :485
    ana = analysis.RegexTokenizer(r"\S+") | analysis.IntraWordFilter()
    tokens = [t.text for t in ana(":-(")]
    assert tokens == []
    tokens = [t.text for t in ana("LOL:)")]
    assert tokens == ["LOL"]


def test_ngrams():
    # ref :496
    s = "abcdefg h ij klm"
    tk = analysis.RegexTokenizer(r"\S+")

    def dotest(f):
        ana = tk | f
        tokens = ana(s, positions=True, chars=True)
        return "/".join(t.text for t in tokens)

    assert dotest(analysis.NgramFilter(3, 4)) == (
        "abc/abcd/bcd/bcde/cde/cdef/def/defg/efg/klm"
    )
    assert dotest(analysis.NgramFilter(3, 4, at="start")) == "abc/abcd/klm"
    assert dotest(analysis.NgramFilter(3, 4, at="end")) == "defg/efg/klm"

    ana = tk | analysis.NgramFilter(2, 5, at="end")
    tokens = [(t.text, t.startchar, t.endchar) for t in ana(s, chars=True)]
    assert tokens == [
        ("cdefg", 2, 7), ("defg", 3, 7), ("efg", 4, 7), ("fg", 5, 7),
        ("ij", 10, 12), ("klm", 13, 16), ("lm", 14, 16),
    ]


def test_language_analyzer():
    # ref :529
    domain = [
        ("da", "Jeg gik mig over s\xf8 og land", ["gik", "s\xf8", "land"]),
        ("nl", "Daar komt een muisje aangelopen", ["komt", "muisj", "aangelop"]),
        ("de", "Berlin war ihm zu gro\xdf, da baut' er sich ein Schlo\xdf.",
         ["berlin", "gross", "baut", "schloss"]),
        ("es", "Por el mar corren las liebres", ["mar", "corr", "liebr"]),
    ]
    for lang, source, target in domain:
        ana = analysis.LanguageAnalyzer(lang)
        words = [t.text for t in ana(source)]
        assert words == target


def test_la_pickleability():
    # ref :551
    ana = analysis.LanguageAnalyzer("en")
    _ = dumps(ana, -1)


def test_charset_pickeability(whoosh):
    # ref :556 (the 87k-entry Sphinx default table is loaded from the
    # reference package at test time — we parse it, never vendor it)
    from whoosh.support import charset

    from whoosh_reloaded_ray.functions.analysis import charset_table_to_dict

    charmap = charset_table_to_dict(charset.default_charset)
    ana = analysis.StandardAnalyzer() | analysis.CharsetFilter(charmap)
    _ = dumps(ana, -1)

    ana = analysis.CharsetTokenizer(charmap)
    _ = dumps(ana, -1)


def test_shingle_stopwords():
    # ref :566
    ana = (
        analysis.RegexTokenizer()
        | analysis.StopFilter(stoplist=None, minsize=3)
        | analysis.ShingleFilter(size=3)
    )
    texts = [t.text for t in
             ana("some other stuff and then some things To Check     ")]
    assert texts == [
        "some-other-stuff", "other-stuff-and", "stuff-and-then",
        "and-then-some", "then-some-things", "some-things-Check",
    ]

    ana = (
        analysis.RegexTokenizer()
        | analysis.LowercaseFilter()
        | analysis.StopFilter()
        | analysis.ShingleFilter(size=3)
    )
    texts = [t.text for t in
             ana("some other stuff and then some things To Check     ")]
    assert texts == [
        "some-other-stuff", "other-stuff-then", "stuff-then-some",
        "then-some-things", "some-things-check",
    ]


def test_biword_stopwords():
    # ref :597
    ana = (
        analysis.RegexTokenizer()
        | analysis.StopFilter(stoplist=None, minsize=3)
        | analysis.BiWordFilter()
    )
    texts = [t.text for t in ana("stuff and then some")]
    assert texts == ["stuff-and", "and-then", "then-some"]

    ana = (
        analysis.RegexTokenizer()
        | analysis.LowercaseFilter()
        | analysis.StopFilter()
        | analysis.BiWordFilter()
    )
    texts = [t.text for t in ana("stuff and then some")]
    assert texts == ["stuff-then", "then-some"]


def test_stop_lang():
    # ref :619
    stopper = analysis.RegexTokenizer() | analysis.StopFilter()
    ls = [token.text for token in stopper("this is a test")]
    assert ls == ["test"]

    es_stopper = analysis.RegexTokenizer() | analysis.StopFilter(lang="es")
    ls = [token.text for token in es_stopper("el lapiz es en la mesa")]
    assert ls == ["lapiz", "mesa"]


def test_issue358():
    # ref :637
    t = analysis.RegexTokenizer(r"\w+")
    with pytest.raises(analysis.CompositionError):
        _ = t | analysis.StandardAnalyzer()


def test_ngramwords_tokenizer():
    # ref :643 (construction only in the reference too)
    tk = analysis.CommaSeparatedTokenizer()
    tags = wrr.NGRAMWORDS(minsize=3, maxsize=50, tokenizer=tk, stored=True,
                          queryor=True)
    _ = wrr.Schema(tags=tags)
