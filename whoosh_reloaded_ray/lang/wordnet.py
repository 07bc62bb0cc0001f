"""WordNet thesaurus: synonym lookup + query expansion.

Clean-room reimplementation of the reference's ``lang/wordnet.py:40-240``
surface: parse the WordNet prolog ``wn_s.pl`` synset file into
word->synset-ids / synset-id->words maps, look up synonyms, optionally
persist the maps as a searchable index, and expand queries with synonyms.

File format: lines ``s(100001740,1,'entity',n,1,11).`` — synset id first,
the quoted word third; non-alphabetic entries (multi-word collocations
with underscores, numbers) are skipped, words lowercase, exactly like the
reference parser.
"""

from __future__ import annotations

from collections import defaultdict


def parse_file(f):
    """Parse wn_s.pl (file-like, text or bytes lines) ->
    (word2nums, num2words)."""
    word2nums = defaultdict(list)
    num2words = defaultdict(list)
    for line in f:
        if isinstance(line, bytes):
            line = line.decode("utf-8", "replace")
        if not line.startswith("s("):
            continue
        body = line[2:]
        num = int(body[: body.index(",")])
        q1 = body.index("'")
        rest = body[q1 + 1 :]
        q2 = rest.index("'")
        word = rest[:q2].lower()
        if not word.isalpha():
            continue
        word2nums[word].append(num)
        num2words[num].append(word)
    return word2nums, num2words


def synonyms(word2nums, num2words, word: str) -> list:
    """Synonyms of ``word`` across all its synsets, sorted, excluding the
    word itself."""
    syns: set = set()
    for num in word2nums[word]:
        syns.update(num2words[num])
    syns.discard(word)
    return sorted(syns)


def make_index(dirname: str, word2nums, num2words, indexname: str = "THES"):
    """Persist the synonym maps as a searchable index (reference
    make_index, lang/wordnet.py:68-82: Schema(word=ID, syns=STORED))."""
    import os

    from .. import compat

    schema = compat.Schema(word=compat.ID(stored=True), syns=compat.STORED())
    ix = compat.create_in(os.path.join(dirname, indexname), schema)
    w = ix.writer()
    for word in sorted(word2nums):
        # stored as a space-joined string (synset words are alphabetic by
        # the parse filter), split back on lookup
        w.add_document(
            word=str(word), syns=" ".join(synonyms(word2nums, num2words, word))
        )
    w.commit()
    return ix


class Thesaurus:
    """``Thesaurus.from_filename("wn_s.pl").synonyms("hail")`` ->
    ``['acclaim', 'come', 'herald']`` (reference lang/wordnet.py:99-240).

    Load from the prolog file for in-memory lookup, or persist with
    ``to_storage(dirname)`` and reopen with ``from_storage(dirname)`` for
    on-disk lookup without re-parsing."""

    def __init__(self):
        self.w2n = None
        self.n2w = None
        self.searcher = None

    @classmethod
    def from_file(cls, fileobj) -> "Thesaurus":
        thes = cls()
        thes.w2n, thes.n2w = parse_file(fileobj)
        return thes

    @classmethod
    def from_filename(cls, filename: str) -> "Thesaurus":
        with open(filename, "rb") as f:
            return cls.from_file(f)

    @classmethod
    def from_storage(cls, dirname: str, indexname: str = "THES") -> "Thesaurus":
        import os

        from .. import compat

        thes = cls()
        ix = compat.open_dir(os.path.join(dirname, indexname))
        thes.searcher = ix.searcher()
        return thes

    def to_storage(self, dirname: str, indexname: str = "THES"):
        if not self.w2n or not self.n2w:
            raise Exception("No synonyms loaded")
        return make_index(dirname, self.w2n, self.n2w, indexname=indexname)

    def synonyms(self, word: str) -> list:
        word = word.lower()
        if self.searcher is not None:
            doc = self.searcher.document(word=word)
            return doc["syns"].split() if doc and doc.get("syns") else []
        return synonyms(self.w2n, self.n2w, word)


def expand_query(q, thesaurus: Thesaurus, boost: float = 1.0):
    """Query-expansion hook: every Term in the tree expands to
    ``Or([term] + [Term(syn) for syn in synonyms])``, synonyms at
    ``boost`` — the thesaurus-expansion pattern the reference documents
    for wordnet (Variations-style, but table-driven).  Non-Term nodes are
    rebuilt recursively; terms with no synonyms stay as-is."""
    import dataclasses

    from ..query import ast

    if isinstance(q, ast.Term):
        syns = thesaurus.synonyms(q.text)
        if not syns:
            return q
        return ast.Or(
            [q] + [ast.Term(q.field, s, boost=q.boost * boost) for s in syns]
        )
    subs = getattr(q, "subqueries", None)
    if subs is not None:
        return dataclasses.replace(
            q, subqueries=tuple(expand_query(s, thesaurus, boost) for s in subs)
        )
    binary = {
        name: expand_query(getattr(q, name), thesaurus, boost)
        for name in ("a", "b", "subquery")
        if hasattr(q, name)
    }
    if binary:
        return dataclasses.replace(q, **binary)
    return q
