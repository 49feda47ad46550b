"""Pluggable scorer seam for the P8-P10 scoring sub-chain.

The reference abstracts its LLM evaluation/rewrite behind an ABC
(``services/interfaces.py:22-48``) so the processor never knows which model
scores a message. This is that seam recast for the columnar chain: a scorer
is any object with vectorized ``score`` / ``rewrite`` / ``score_alt``
methods over Arrow batches, resolved FROM A STRING in ``ValidationConfig``
(``scorer="builtin"`` or a ``"module:factory"`` dotted path), so the spec
serializes to workers and each process resolves + constructs its scorer
exactly once (lru_cache below = per-process load-once; heavy model state
belongs in the factory's constructed object).

The builtin scorer delegates to the deterministic kernels in
``functions/textfuncs.py`` — byte-class quality score, lowercase/collapse
rewrite, distinct-word alt score — which is what the oracle suite certifies.
A cluster deployment plugs in a real model with e.g.
``scorer="my_pkg.scorers:make_llm_scorer"`` without touching the chain.
"""

from __future__ import annotations

import functools
import importlib

import numpy as np
import pyarrow as pa

from . import textfuncs as tf


class BuiltinScorer:
    """Deterministic scorer (the default): vectorized textfuncs kernels.

    ``consumes_token_batch`` advertises that ``score_alt`` accepts the
    chain's shared ``TokenBatch`` (one tokenization pass feeds the alt
    score, token counts and hashed-BoW); scorers without the flag receive
    the rewritten text array instead.
    """

    consumes_token_batch = True

    def score(self, texts: pa.Array) -> np.ndarray:
        return tf.quality_score(texts)

    def rewrite(self, texts: pa.Array) -> pa.Array:
        return tf.rewrite_alt(texts)

    def score_alt(self, tok_or_texts) -> np.ndarray:
        return tf.alt_score(tok_or_texts)


@functools.lru_cache(maxsize=8)
def get_scorer(spec: str = "builtin"):
    """Resolve a scorer spec to a constructed scorer, once per process.

    ``"builtin"`` → :class:`BuiltinScorer`; ``"module:factory"`` → import
    ``module`` and call ``factory()`` (the injection point for real model
    scorers). Anything else raises ``ValueError``.
    """
    if spec == "builtin":
        return BuiltinScorer()
    if ":" in spec:
        mod_name, attr = spec.split(":", 1)
        factory = getattr(importlib.import_module(mod_name), attr)
        return factory()
    raise ValueError(f"unknown scorer spec {spec!r} (use 'builtin' or 'module:factory')")
