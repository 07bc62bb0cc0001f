"""Import-path parity: every reference `whoosh.X` module a user imports
has a `whoosh_reloaded_ray.X` equivalent exposing the same public names
(checked against the names the reference's own tests import)."""

from __future__ import annotations


def test_alias_modules_import():
    from whoosh_reloaded_ray import (  # noqa: F401
        analysis, classify, collectors, fields, highlight, index, lang,
        qparser, query, reading, scoring, searching, sorting, spelling,
        writing,
    )

    assert fields.TEXT and fields.Schema and fields.SchemaClass
    assert index.create_in and index.open_dir and index.exists_in
    assert qparser.QueryParser and qparser.MultifieldParser
    assert writing.AsyncWriter and writing.BufferedWriter and writing.IndexWriter
    assert sorting.FieldFacet and sorting.TranslateFacet and sorting.Facets
    assert analysis.StandardAnalyzer and analysis.RegexTokenizer
    assert highlight.HtmlFormatter and highlight.ContextFragmenter
    assert classify.Bo1Model and classify.KLModel
    assert searching.Searcher and searching.Results and searching.Hit
    assert reading.IndexReader and reading.TermInfo
    assert spelling.ReaderCorrector and spelling.ListCorrector
    assert collectors.VectorCollector


def test_alias_end_to_end(ray_session, tmp_path_factory):
    """The canonical whoosh quickstart, written with ONLY alias-module
    imports (the reference's README flow)."""
    from whoosh_reloaded_ray.fields import ID, TEXT, Schema
    from whoosh_reloaded_ray.index import create_in
    from whoosh_reloaded_ray.qparser import QueryParser

    schema = Schema(title=TEXT(stored=True), path=ID(stored=True),
                    content=TEXT())
    d = str(tmp_path_factory.mktemp("quickstart"))
    ix = create_in(d, schema)
    writer = ix.writer(num_shards=2, partition_rows=64)
    writer.add_document(title="First document", path="/a",
                        content="This is the first document we've added!")
    writer.add_document(title="Second document", path="/b",
                        content="The second one is even more interesting!")
    writer.commit()
    with ix.searcher() as searcher:
        parser = QueryParser("content", ix.schema)
        results = searcher.search(parser.parse("first"))
        assert results[0]["title"] == "First document"
