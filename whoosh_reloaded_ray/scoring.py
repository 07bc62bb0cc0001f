"""Whoosh-named weighting models (reference scoring.py surface).

Each class is configuration-as-data: it carries the parameters and
``searcher_kwargs()`` translates them to IndexSearcher's scoring
arguments, so ``ix.searcher(weighting=scoring.TF_IDF())`` works like
the reference.  The score formulas themselves live vectorized in
query/exec.py (parity-tested per model in tests/test_weightings.py).
"""

from __future__ import annotations


class WeightingModel:
    """Base: subclasses map to one of the engine's model strings."""

    model = "bm25f"

    def searcher_kwargs(self) -> dict:
        return {"weighting": self.model}


class BM25F(WeightingModel):
    """BM25F (reference scoring.py:226-280): global B/K1 plus
    per-field B overrides given as ``<fieldname>_B`` keywords."""

    model = "bm25f"

    def __init__(self, B=0.75, K1=1.2, **kwargs):
        self.B = B
        self.K1 = K1
        self.field_B = {
            k[:-2]: v for k, v in kwargs.items() if k.endswith("_B")
        }

    def searcher_kwargs(self) -> dict:
        return {
            "weighting": "bm25f", "B": self.B, "K1": self.K1,
            "field_B": self.field_B,
        }


class TF_IDF(WeightingModel):
    model = "tfidf"


class Frequency(WeightingModel):
    model = "frequency"


class DFree(WeightingModel):
    model = "dfree"


class PL2(WeightingModel):
    model = "pl2"

    def __init__(self, c=1.0):
        self.c = c

    def searcher_kwargs(self) -> dict:
        return {"weighting": "pl2", "pl2_c": self.c}


class FunctionWeighting(WeightingModel):
    """Custom scoring hook.  The callable here takes
    ``(field, term, docnum, weight) -> score`` — this engine's
    vectorized-friendly signature, not the reference's
    ``(searcher, fieldname, text, matcher)`` (documented deviation:
    there is no per-doc matcher object to hand out)."""

    model = "fn"

    def __init__(self, fn):
        self.fn = fn

    def searcher_kwargs(self) -> dict:
        return {"weighting": "fn", "weighting_fn": self.fn}


class MultiWeighting(WeightingModel):
    """Per-field model override (reference scoring.py:430-470)."""

    def __init__(self, default, **fields):
        self.default = default
        self.fields = fields

    def searcher_kwargs(self) -> dict:
        kw = self.default.searcher_kwargs()
        kw["field_weighting"] = {
            f: w.model for f, w in self.fields.items()
        }
        return kw


class ReverseWeighting(WeightingModel):
    """Negates the wrapped model's scores (reference scoring.py:473-500)."""

    def __init__(self, weighting):
        self.weighting = weighting

    def searcher_kwargs(self) -> dict:
        kw = self.weighting.searcher_kwargs()
        kw["reverse_weighting"] = True
        return kw


def weighting_kwargs(weighting) -> dict:
    """Translate a weighting argument (model object, engine model
    string, or None) into IndexSearcher keyword arguments."""
    if weighting is None:
        return {}
    if isinstance(weighting, str):
        return {"weighting": weighting}
    if isinstance(weighting, type) and issubclass(weighting, WeightingModel):
        weighting = weighting()  # the reference accepts classes too
    if isinstance(weighting, WeightingModel):
        return weighting.searcher_kwargs()
    raise TypeError(f"unsupported weighting: {weighting!r}")
