"""Analyzer parity vs the real whoosh (imported from the reference tree as an
oracle — behavior comparison only)."""

from __future__ import annotations

import random
import string

import pytest

from whoosh_reloaded_ray.functions.analysis import (
    STOP_WORDS,
    id_analyzer,
    keyword_analyzer,
    make_analyzer,
    ngram_analyzer,
    porter_stem,
    simple_analyzer,
    standard_analyzer,
    stemming_analyzer,
)

SAMPLES = [
    "",
    "Hello, World!",
    "this is a test",
    "The quick brown fox JUMPED over the lazy dog's back",
    "foo.bar.baz version 3.2.1 released",
    "a an and of the to is",  # all stopwords
    "x y z aa bb",  # minsize filtering
    "tool_call(search_web) -> {'query': 'ray data map_batches'}",
    "Ünïcödé tëxt — naïve café 日本語 テスト",
    "CamelCase snake_case kebab-case dotted.name star*glob",
    "  leading and trailing   whitespace  ",
    "123 4567 89.01 1e9",
    "don't stop believing — it's can't won't",
]


def whoosh_tokens(whoosh, analyzer, text):
    return [(t.text, t.pos) for t in analyzer(text, positions=True)]


@pytest.fixture(scope="module")
def rng():
    return random.Random(42)


def random_texts(rng, n=200):
    words = [
        "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(1, 10)))
        for _ in range(50)
    ] + list(STOP_WORDS)
    out = []
    for _ in range(n):
        k = rng.randint(0, 30)
        toks = [rng.choice(words) for _ in range(k)]
        sep = rng.choice([" ", "  ", ", ", ". ", "\n"])
        out.append(sep.join(toks))
    return out


def test_standard_analyzer_parity(whoosh, rng):
    from whoosh.analysis import StandardAnalyzer

    ours = make_analyzer(standard_analyzer())
    theirs = StandardAnalyzer()
    for text in SAMPLES + random_texts(rng):
        assert ours(text) == whoosh_tokens(whoosh, theirs, text), repr(text)


def test_simple_analyzer_parity(whoosh, rng):
    from whoosh.analysis import SimpleAnalyzer

    ours = make_analyzer(simple_analyzer())
    theirs = SimpleAnalyzer()
    for text in SAMPLES + random_texts(rng):
        assert ours(text) == whoosh_tokens(whoosh, theirs, text), repr(text)


def test_id_and_keyword_analyzers(whoosh):
    from whoosh.analysis import IDAnalyzer, KeywordAnalyzer

    ours = make_analyzer(id_analyzer())
    theirs = IDAnalyzer()
    for text in ["Hello World", "x", "MiXeD Case"]:
        assert ours(text) == whoosh_tokens(whoosh, theirs, text)

    ours = make_analyzer(keyword_analyzer(lowercase=True, commas=True))
    theirs = KeywordAnalyzer(lowercase=True, commas=True)
    for text in ["a,b, c,D e", "one,two,three"]:
        assert ours(text) == whoosh_tokens(whoosh, theirs, text)


def test_ngram_analyzer_parity(whoosh):
    from whoosh.analysis import NgramAnalyzer

    ours = make_analyzer(ngram_analyzer(2, 4))
    theirs = NgramAnalyzer(minsize=2, maxsize=4)
    for text in ["hello", "ab", "a", "whoosh rocks"]:
        ours_terms = sorted(t for t, _ in ours(text))
        theirs_terms = sorted(t.text for t in theirs(text))
        assert ours_terms == theirs_terms, repr(text)


def test_porter_stem_parity(whoosh, rng):
    from whoosh.lang.porter import stem as whoosh_stem

    words = [
        "caresses", "ponies", "ties", "caress", "cats", "feed", "agreed",
        "plastered", "bled", "motoring", "sing", "conflated", "troubled",
        "sized", "hopping", "tanned", "falling", "hissing", "fizzed",
        "failing", "filing", "happy", "sky", "relational", "conditional",
        "rational", "valenci", "hesitanci", "digitizer", "conformabli",
        "radicalli", "differentli", "vileli", "analogousli", "vietnamization",
        "predication", "operator", "feudalism", "decisiveness", "hopefulness",
        "callousness", "formaliti", "sensitiviti", "sensibiliti", "triplicate",
        "formative", "formalize", "electriciti", "electrical", "hopeful",
        "goodness", "revival", "allowance", "inference", "airliner",
        "gyroscopic", "adjustable", "defensible", "irritant", "replacement",
        "adjustment", "dependent", "adoption", "homologou", "communism",
        "activate", "angulariti", "homologous", "effective", "bowdlerize",
        "probate", "rate", "cease", "controll", "roll", "generalization",
    ]
    words += ["".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(3, 12))) for _ in range(300)]
    for w in words:
        assert porter_stem(w) == whoosh_stem(w), w


def test_stemming_analyzer_parity(whoosh, rng):
    from whoosh.analysis import StemmingAnalyzer

    ours = make_analyzer(stemming_analyzer())
    theirs = StemmingAnalyzer()
    for text in SAMPLES + random_texts(rng, 100):
        assert ours(text) == whoosh_tokens(whoosh, theirs, text), repr(text)


def test_fancy_analyzer_parity(whoosh, rng):
    """FancyAnalyzer (IntraWordFilter + whitespace tokenizer) token/pos
    parity across split and merge configurations."""
    from whoosh.analysis import FancyAnalyzer

    from whoosh_reloaded_ray.functions.analysis import fancy_analyzer, make_analyzer

    samples = [
        "Should I call getInt or get_real?",
        "PowerShot SD500 and the Wi-Fi AutoCoder",
        "Super-Duper-XL500-42-AutoCoder!",
        "A's+B's&C's O'Neil's laptop",
        "mixedCASE camelCaseWords under_scored dashed-words",
        "numbers 123abc abc123 12ab34cd",
        "'leading 'quoted' trailing' x",
        "ALLCAPS lowercase MiXeD 42",
    ]
    for mergewords, mergenums in [(False, False), (True, False), (True, True)]:
        wana = FancyAnalyzer(mergewords=mergewords, mergenums=mergenums)
        ours = make_analyzer(
            fancy_analyzer(mergewords=mergewords, mergenums=mergenums)
        )
        for text in samples:
            theirs = [(t.text, t.pos) for t in wana(text, positions=True)]
            assert ours(text) == theirs, (mergewords, mergenums, text)


def test_word_combination_filters(whoosh):
    """CompoundWord / BiWord / Shingle filter parity on token streams."""
    from whoosh.analysis import (
        BiWordFilter,
        CompoundWordFilter,
        RegexTokenizer,
        ShingleFilter,
    )

    from whoosh_reloaded_ray.functions.analysis import (
        biword_filter,
        compound_word_filter,
        shingle_filter,
    )

    rt = RegexTokenizer(r"\S+")

    def wtoks(chain, text):
        return [(t.text, t.pos) for t in chain(text, positions=True)]

    base = lambda text: [(t.text, t.pos) for t in rt(text, positions=True)]

    text = "I do not like greeneggs and ham turbosquid"
    ws = {"green", "eggs", "turbo", "squid", "ham"}
    for keep in (True, False):
        theirs = wtoks(rt | CompoundWordFilter(ws, keep_compound=keep), text)
        ours = compound_word_filter(base(text), ws, keep_compound=keep)
        assert ours == theirs, keep

    text2 = "the sign of four"
    assert biword_filter(base(text2)) == wtoks(rt | BiWordFilter(), text2)
    assert biword_filter(base("single")) == wtoks(rt | BiWordFilter(), "single")

    text3 = "better a witty fool than a foolish wit"
    for size in (2, 3):
        theirs = wtoks(rt | ShingleFilter(size, "-"), text3)
        assert shingle_filter(base(text3), size=size, sep="-") == theirs
    assert shingle_filter(base("two words"), size=3) == wtoks(
        rt | ShingleFilter(3, "-"), "two words"
    )


def test_small_filters_and_path_tokenizer(whoosh):
    from whoosh.analysis import (
        DelimitedAttributeFilter,
        PathTokenizer,
        RegexTokenizer,
        ReverseTextFilter,
        StripFilter,
        SubstitutionFilter,
    )

    from whoosh_reloaded_ray.functions.analysis import (
        delimited_attribute_filter,
        path_tokenize,
        reverse_text_filter,
        strip_filter,
        substitution_filter,
    )

    rt = RegexTokenizer(r"\S+")
    base = lambda text: [(t.text, t.pos) for t in rt(text, positions=True)]
    text = "ab-cd ef-gh ij"

    theirs = [(t.text, t.pos) for t in (rt | ReverseTextFilter())(text, positions=True)]
    assert reverse_text_filter(base(text)) == theirs

    theirs = [(t.text, t.pos) for t in (rt | SubstitutionFilter("-", ""))(text, positions=True)]
    assert substitution_filter(base(text), "-", "") == theirs

    theirs = [(t.text, t.pos) for t in (rt | StripFilter())(text, positions=True)]
    assert strip_filter(base(text)) == theirs

    btext = "image render^2 file^0.5"
    theirs = [
        (t.text, t.pos, t.boost)
        for t in (rt | DelimitedAttributeFilter())(btext, positions=True)
    ]
    assert delimited_attribute_filter(base(btext)) == theirs

    ptheirs = [(t.text, t.pos) for t in PathTokenizer()("/a/b/c", positions=True)]
    assert path_tokenize("/a/b/c") == ptheirs


def test_ngramwords_analyzer_parity(whoosh):
    from whoosh.analysis import NgramWordAnalyzer

    from whoosh_reloaded_ray.functions.analysis import make_analyzer, ngramwords_analyzer

    texts = ["hello there world", "Tokenize THIS properly ok"]
    for minsize, maxsize, at in [(3, None, None), (2, 4, None), (3, 5, "start"), (3, 5, "end")]:
        wana = NgramWordAnalyzer(minsize, maxsize, at=at)
        ours = make_analyzer(ngramwords_analyzer(minsize, maxsize, at=at))
        for text in texts:
            theirs = [(t.text, t.pos) for t in wana(text, positions=True)]
            assert ours(text) == theirs, (minsize, maxsize, at, text)


def test_charset_filter_mechanism_parity(whoosh):
    """CharsetFilter translate mechanism parity using the reference's own
    accent map as oracle data (our shipped map is NFKD-derived)."""
    from whoosh.analysis import CharsetFilter, RegexTokenizer
    from whoosh.support.charset import accent_map

    from whoosh_reloaded_ray.functions.analysis import accent_fold_map, charset_filter

    rt = RegexTokenizer()
    text = "café naïve Müller straße résumé"
    theirs = [
        (t.text, t.pos)
        for t in (rt | CharsetFilter(accent_map))(text, positions=True)
    ]
    base = [(t.text, t.pos) for t in rt(text, positions=True)]
    assert charset_filter(base, accent_map) == theirs

    # our NFKD map folds the same examples
    ours = charset_filter(base, accent_fold_map())
    assert [t for t, _ in ours][:2] == ["cafe", "naive"]
    assert "resume" in [t for t, _ in ours]


def test_query_mode_ngram(whoosh):
    """Query-mode n-gram analysis: single gram size = min(max, len)
    (reference ngrams.py tokenizer :87-103 and filter :180-198)."""
    from whoosh.analysis import NgramAnalyzer, NgramWordAnalyzer

    from whoosh_reloaded_ray.functions.analysis import (
        make_analyzer,
        ngram_analyzer,
        ngramwords_analyzer,
    )

    for text in ("hello", "hi", "a", "data flow"):
        ours = [t for t, _ in make_analyzer(ngram_analyzer(2, 4), mode="query")(text)]
        theirs = [t.text for t in NgramAnalyzer(2, 4)(text, mode="query")]
        assert ours == theirs, (text, ours, theirs)

    for at in (None, "start", "end"):
        for text in ("hello world", "hi", "abcdefgh"):
            ours = [
                t
                for t, _ in make_analyzer(
                    ngramwords_analyzer(2, 4, at=at), mode="query"
                )(text)
            ]
            theirs = [
                t.text
                for t in NgramWordAnalyzer(2, maxsize=4, at=at)(text, mode="query")
            ]
            assert ours == theirs, (at, text, ours, theirs)


def test_query_mode_invariant_standard():
    """Standard analyzer is mode-invariant."""
    from whoosh_reloaded_ray.functions.analysis import make_analyzer, standard_analyzer

    s = standard_analyzer()
    text = "The quick brown foxes 123"
    assert make_analyzer(s)(text) == make_analyzer(s, mode="query")(text)


def test_field_query_analyzer_roundtrip():
    """FieldSpec.query_analyzer serializes through to_dict/from_dict."""
    from whoosh_reloaded_ray.functions.analysis import (
        ngram_analyzer,
        standard_analyzer,
    )
    from whoosh_reloaded_ray.schema import FieldSpec

    f = FieldSpec(
        name="body",
        kind="text",
        analyzer=ngram_analyzer(2, 4),
        query_analyzer=standard_analyzer(),
    )
    assert FieldSpec.from_dict(f.to_dict()) == f


def test_tee_filter(whoosh):
    """TeeFilter round-robin interleave parity (reference doctest cases)."""
    from whoosh.analysis import (
        LowercaseFilter,
        PassFilter,
        RegexTokenizer,
        ReverseTextFilter,
        TeeFilter,
    )

    from whoosh_reloaded_ray.functions.analysis import (
        biword_filter,
        reverse_text_filter,
        tee_filter,
    )

    target = "ALFA BRAVO CHARLIE"
    ana = RegexTokenizer(r"\S+") | TeeFilter(LowercaseFilter(), ReverseTextFilter())
    theirs = [t.text for t in ana(target)]
    toks = [(w, i) for i, w in enumerate(target.split())]
    ours = [
        t
        for t, _ in tee_filter(
            toks,
            lambda ts: [(x.lower(), p) for x, p in ts],
            reverse_text_filter,
        )
    ]
    assert ours == theirs

    from whoosh.analysis import BiWordFilter

    ana2 = RegexTokenizer(r"\S+") | TeeFilter(PassFilter(), BiWordFilter()) | LowercaseFilter()
    theirs2 = [t.text for t in ana2(target)]
    ours2 = [
        t.lower()
        for t, _ in tee_filter(toks, lambda ts: ts, biword_filter)
    ]
    assert ours2 == theirs2


def test_charset_tokenizer_parity(whoosh):
    """CharsetTokenizer parity: None-mapped chars break tokens, others
    translate (reference tokenizers.py:201-315)."""
    from whoosh.analysis import CharsetTokenizer

    charmap = {ord(" "): None, ord("\t"): None}
    for c in range(ord("A"), ord("Z") + 1):
        charmap[c] = chr(c).lower()
    for c in range(ord("a"), ord("z") + 1):
        charmap[c] = chr(c)
    charmap[ord("ß")] = "ss"

    from whoosh_reloaded_ray.functions.analysis import charset_tokenize

    for text in ("Straße ABC", "Hello  World", "ABCdef", ""):
        theirs = [t.text for t in CharsetTokenizer(charmap)(text)]
        ours = [t for t, _ in charset_tokenize(text, charmap)]
        assert ours == theirs, (text, ours, theirs)


def test_charset_table_parser_parity(whoosh):
    """charset_table_to_dict parses the Sphinx charset-table format
    identically to the reference (support/charset.py:1299) on the
    reference's own 87k-entry default_charset and on each item form.
    The /2 checkerboard form is validated against the documented spec
    only: the reference's assert has a precedence bug (charset.py:1368,
    ``toord - fromord % 2 == 0``) that crashes on any real /2 item."""
    from whoosh.support.charset import charset_table_to_dict as ref_parse
    from whoosh.support.charset import default_charset

    from whoosh_reloaded_ray.functions.analysis import (
        charset_table_to_dict,
        charset_tokenize,
    )

    assert charset_table_to_dict(default_charset) == dict(ref_parse(default_charset))

    tbl = "a..z, A..Z->a..z, 0..9, _, U+00C0->U+00E0"
    got = charset_table_to_dict(tbl)
    assert dict(ref_parse(tbl)) == got
    assert got[ord("Z")] == "z" and got[0xC0] == chr(0xE0)

    chk = charset_table_to_dict("U+0100..U+0106/2")
    assert chk[0x100] == chk[0x101] == chr(0x101)
    assert chk[0x106] == chk[0x107] == chr(0x107)

    # strict tokenize: undeclared chars (é, comma, space) are breaks;
    # declared uppercase translates (final token stays raw per the
    # reference's end-of-string quirk)
    toks = [t for t, _ in charset_tokenize("Héllo WORLD_x9 f,oo", got, strict=True)]
    assert toks == ["h", "llo", "world_x9", "f", "oo"]

    with pytest.raises(ValueError):
        charset_table_to_dict("a..z->A..Y")  # length mismatch
    with pytest.raises(ValueError):
        charset_table_to_dict("??bogus??")


def test_regex_tokenizer_gaps(whoosh):
    """RegexTokenizer(gaps=True) split mode parity (tokenizers.py:160-197)."""
    from whoosh.analysis import LowercaseFilter, RegexTokenizer

    from whoosh_reloaded_ray.functions.analysis import AnalyzerSpec, make_analyzer

    cases = [
        ("a,b,,c,", r","),
        ("hello, big,world", r",\s*"),
        (",leading,and,trailing,", r","),
        ("no-matches-here", r","),
        ("", r","),
        ("::a::bb::ccc", r"::"),
    ]
    for text, pattern in cases:
        ref = [
            t.text
            for t in (RegexTokenizer(pattern, gaps=True) | LowercaseFilter())(text)
        ]
        spec = AnalyzerSpec(kind="simple", pattern=pattern, gaps=True,
                            stopwords=None, minsize=0)
        ours = [w for w, _ in make_analyzer(spec)(text)]
        assert ours == ref, (text, pattern, ours, ref)
    # positions survive stop filtering in gap mode too
    ref_an = RegexTokenizer(r",", gaps=True) | LowercaseFilter()
    ref = [(t.text, t.pos) for t in ref_an("x,y,z", positions=True)]
    spec = AnalyzerSpec(kind="simple", pattern=r",", gaps=True, stopwords=None, minsize=0)
    assert make_analyzer(spec)("x,y,z") == ref


def test_porter2_parity(whoosh):
    """Porter2 black-box parity vs the reference snowball transcription."""
    import random

    from whoosh.lang.snowball.english import EnglishStemmer

    from whoosh_reloaded_ray.functions.porter2 import porter2_stem

    ref = EnglishStemmer().stem
    rng = random.Random(11)
    words = {"".join(rng.choice("abcdefghijklmnopqrstuvwxyz'") for _ in range(rng.randint(1, 14)))
             for _ in range(3000)}
    words |= {
        "realization", "realize", "organization", "generously", "communication",
        "arsenal", "dying", "skis", "inning", "proceeded", "controlled",
        "hopping", "hoping", "happily", "conditionally", "electriciti",
        "sensibiliti", "archaeology", "catalogi", "'twas", "enjoyed", "surveys",
    }
    for stem_suf in ("", "s", "ed", "ing", "ational", "iveness", "ization", "alli", "li"):
        words |= {w + stem_suf for w in ("rat", "hop", "form", "real", "critic")}
    for w in sorted(words):
        assert porter2_stem(w) == ref(w), w


def test_language_analyzer(whoosh):
    """LanguageAnalyzer parity: full chain for English; tokenize+stop for a
    language whose snowball stemmer we don't ship (declared gap)."""
    from whoosh.analysis import LanguageAnalyzer, LowercaseFilter, RegexTokenizer, StopFilter

    from whoosh_reloaded_ray.functions.analysis import language_analyzer, make_analyzer

    texts = [
        "The quick brown foxes were generously jumping over lazy dogs",
        "Nationalization of the railways was hotly debated",
        "",
    ]
    ours = make_analyzer(language_analyzer("en"))
    ref = LanguageAnalyzer("en")
    for t in texts:
        assert [w for w, _ in ours(t)] == [tok.text for tok in ref(t)], t
    # eng alias resolves like the reference's two_letter_code
    assert make_analyzer(language_analyzer("eng"))(texts[0]) == ours(texts[0])
    # full tokenize|lower|stop|stem chain parity for the snowball family
    lang_texts = {
        "es": "Por el mar corren las liebres y los conejos corriendo velozmente",
        "fr": "Les chevaux nationaux mangeaient rapidement des pommes délicieuses",
        "ru": "Быстрые коричневые лисицы прыгнули через ленивых собак",
        "de": "Die schnellen braunen Füchse sprangen über die faulen Hunde",
        "it": "Le volpi marroni saltavano velocemente sopra i cani pigri",
        "pt": "As raposas castanhas saltavam rapidamente sobre os cães",
        "nl": "De snelle bruine vossen sprongen over de luie honden",
        "da": "De hurtige brune ræve sprang over de dovne hunde",
        "no": "De raske brune revene hoppet over de late hundene",
        "sv": "De snabba bruna rävarna hoppade över de lata hundarna",
        "fi": "Nopeat ruskeat ketut hyppäsivät laiskojen koirien ylitse",
        "hu": "A gyors barna rókák átugrottak a lusta kutyákon",
        "ro": "Vulpile maronii săreau repede peste câinii leneși",
    }
    for lang, t in lang_texts.items():
        mine = make_analyzer(language_analyzer(lang))
        ref_la = LanguageAnalyzer(lang)
        assert [w for w, _ in mine(t)] == [tok.text for tok in ref_la(t)], lang
    # RegexTokenizer/StopFilter manual-chain equivalence still holds
    es = make_analyzer(
        language_analyzer("es").__class__(
            **{**language_analyzer("es").__dict__, "stemmer": None, "kind": "standard"}
        )
    )
    ref_es = RegexTokenizer() | LowercaseFilter() | StopFilter(lang="es")
    t = "Por el mar corren las liebres y los conejos"
    assert [w for w, _ in es(t)] == [tok.text for tok in ref_es(t)]


def test_double_metaphone_parity(whoosh):
    """Black-box parity vs the reference's public-domain transcription,
    including the G/GH stale-action fallthrough quirk."""
    import random

    from whoosh.lang.dmetaphone import double_metaphone as ref

    from whoosh_reloaded_ray.functions.dmetaphone import double_metaphone as mine

    rng = random.Random(5)
    words = {"".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                     for _ in range(rng.randint(1, 12))) for _ in range(4000)}
    words |= set(
        "jose sugar island carlisle smith schmidt school schermerhorn resnais "
        "thomas wasserman arnoff filipowicz breaux caesar chianti michael "
        "mcclellan bellocchio bacchus accident succeed edge ghislane hugh "
        "laugh mclaughlin cagney tagliaro biaggi cabrillo dumb campbell "
        "rogier zhao czerny focaccia aghast baghdad".split()
    )
    for w in sorted(words):
        assert mine(w) == ref(w), w


def test_dmetaphone_filter(whoosh):
    from whoosh.analysis import DoubleMetaphoneFilter, RegexTokenizer

    from whoosh_reloaded_ray.functions.analysis import dmetaphone_filter

    ref_an = RegexTokenizer() | DoubleMetaphoneFilter()
    text = "smith schmidt jose wright"
    toks = [(t.lower(), i) for i, t in enumerate(text.split())]
    ours = [t for t, _ in dmetaphone_filter(toks)]
    theirs = [t.text for t in ref_an(text)]
    assert ours == theirs
    # combine mode keeps originals in front of the codes
    ours_c = [t for t, _ in dmetaphone_filter(toks, combine=True)]
    theirs_c = [t.text for t in (RegexTokenizer() | DoubleMetaphoneFilter(combine=True))(text)]
    assert ours_c == theirs_c
