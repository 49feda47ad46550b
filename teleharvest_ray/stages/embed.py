"""Actor-pool embedding stage — the A3 heavy load-once model seam.

The reference's one genuinely heavy per-process state is its sentence
embedding model, loaded once at service construction
(``/root/reference/services/embedding_service.py:15-16``) and reused for
every message. This stage recasts that as a Ray Data actor pool: the model
loads ONCE per actor in ``__init__``; ``__call__`` encodes a whole Arrow
batch vectorized.

Two backends behind one config knob (mirroring ``multimodal.py``'s PIL
import guard):

- ``"hashed_bow"`` (default): the deterministic 64-dim hashed bag-of-words
  proxy (``functions/textfuncs.py:hashed_bow``) — no external deps, stable
  across processes, used throughout the test suite.
- any other string: treated as a sentence-transformers model name. The
  import is guarded — this container has no model libraries, so the seam
  raises a clear ``ImportError`` here while remaining drop-in ready on a
  cluster image that ships the dependency.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..functions.textfuncs import BOW_DIM, hashed_bow


def _to_strings(texts) -> list:
    """Arrow column / sequence → list[str] with nulls as '' (the shape
    sentence-transformers' encode expects)."""
    if hasattr(texts, "to_pylist"):
        texts = texts.to_pylist()
    return ["" if t is None else t for t in texts]


class EmbeddingStage:
    """Callable-class stage for ``map_batches(EmbeddingStage, concurrency=N)``.

    Model construction happens once per actor (A1-A3 load-once pattern);
    each ``__call__`` appends a ``list<float>`` embedding column."""

    def __init__(self, model: str = "hashed_bow", text_col: str = "text",
                 out_col: str = "embedding", dim: int = BOW_DIM):
        self.text_col = text_col
        self.out_col = out_col
        if model == "hashed_bow":
            self._encode = lambda texts: hashed_bow(texts, dim=dim)
        else:
            try:
                from sentence_transformers import SentenceTransformer  # type: ignore
            except ImportError as e:
                raise ImportError(
                    f"embedding model {model!r} needs the sentence-transformers "
                    "package (not installed in this environment); use "
                    "model='hashed_bow' for the deterministic built-in proxy"
                ) from e
            m = SentenceTransformer(model)  # once per actor — NOT per batch
            self._encode = lambda texts: np.asarray(
                m.encode(_to_strings(texts), show_progress_bar=False), dtype=np.float64
            )

    def __call__(self, tbl: pa.Table) -> pa.Table:
        mat = self._encode(tbl[self.text_col])
        return tbl.append_column(
            self.out_col, pa.array(list(np.asarray(mat, dtype=np.float64)), pa.list_(pa.float64()))
        )


def embed_texts(
    ds: Dataset,
    model: str = "hashed_bow",
    text_col: str = "text",
    out_col: str = "embedding",
    concurrency: int = 4,
    batch_size: int = 2048,
) -> Dataset:
    """Attach an embedding column via an actor pool sized to the cluster.

    ``batch_size`` bounds per-actor peak memory (batch × dim floats);
    ``concurrency`` actors each pay the model load exactly once."""
    return ds.map_batches(
        EmbeddingStage,
        fn_constructor_kwargs={"model": model, "text_col": text_col, "out_col": out_col},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
