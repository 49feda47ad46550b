"""The real-model embedding seam (stages/embed.py), exercised with a fake
``sentence_transformers`` module — the container has no model library, so
this is how the non-default branch (reference
services/embedding_service.py:15-16: load once, encode per batch) gets
executed in CI."""

from __future__ import annotations

import sys
import types

import numpy as np
import pyarrow as pa
import pytest

from teleharvest_ray.stages.embed import EmbeddingStage, _to_strings


class _FakeModel:
    constructed: list[str] = []

    def __init__(self, name: str):
        _FakeModel.constructed.append(name)
        self.name = name

    def encode(self, texts, show_progress_bar=False):
        assert isinstance(texts, list) and all(isinstance(t, str) for t in texts)
        # deterministic, text-dependent 2-d vectors
        return np.array([[float(len(t)), 1.0] for t in texts])


@pytest.fixture()
def fake_st(monkeypatch):
    mod = types.ModuleType("sentence_transformers")
    mod.SentenceTransformer = _FakeModel
    monkeypatch.setitem(sys.modules, "sentence_transformers", mod)
    _FakeModel.constructed.clear()
    return mod


def test_model_loads_once_per_actor_and_encodes_batches(fake_st):
    stage = EmbeddingStage(model="fake-mini")
    assert _FakeModel.constructed == ["fake-mini"]  # load at __init__, once

    t1 = pa.table({"text": pa.array(["ab", None, "cdef"], pa.string())})
    t2 = pa.table({"text": pa.array(["x"], pa.string())})
    o1 = stage(t1)
    o2 = stage(t2)
    # still exactly one construction after two batches
    assert _FakeModel.constructed == ["fake-mini"]
    emb = o1["embedding"].to_pylist()
    assert emb == [[2.0, 1.0], [0.0, 1.0], [4.0, 1.0]]  # null text encodes as ""
    assert o2["embedding"].to_pylist() == [[1.0, 1.0]]
    assert o1.schema.field("embedding").type == pa.list_(pa.float64())


def test_missing_library_raises_actionable_import_error(monkeypatch):
    monkeypatch.setitem(sys.modules, "sentence_transformers", None)
    with pytest.raises(ImportError, match="hashed_bow"):
        EmbeddingStage(model="some-model")


def test_to_strings_handles_arrow_and_lists():
    arr = pa.chunked_array([pa.array(["a", None]), pa.array(["b"])])
    assert _to_strings(arr) == ["a", "", "b"]
    assert _to_strings(["x", None]) == ["x", ""]
