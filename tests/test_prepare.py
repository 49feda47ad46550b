"""End-to-end training-data preparation pipeline (pipelines/prepare.py)."""

from __future__ import annotations

import glob

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import ray.data as rd

from teleharvest_ray.pipelines.prepare import prepare_training_shards


def test_prepare_stages_and_export(ray_session, tmp_path):
    rng = np.random.default_rng(9)
    # long docs over a wide vocab so the Gopher gates (top-bigram <= 0.05,
    # dup-word <= 0.625) only fire on the PLANTED offenders
    vocab = [f"w{i}" for i in range(400)]
    n = 60
    texts = [" ".join(vocab[j] for j in rng.integers(0, 400, 300)) for _ in range(n)]
    texts[5] = "spam spam spam spam spam spam"  # dup-word gate kills it (id 5: % 13 != 0)
    texts[20] = texts[14]  # 20 dups a kept doc -> cluster collapse drops 20
    texts[27] = texts[26]  # 26 is bench (26 % 13 == 0): 27 is contaminated
    texts[30] = None  # null text: fails the quality gate
    docs = pd.DataFrame({"doc_id": np.arange(n), "text": pd.array(texts, dtype=object)})

    out = str(tmp_path / "prepared")
    m = prepare_training_shards(rd.from_pandas(docs), out, token_budget=64)

    n_bench = sum(1 for i in range(n) if i % 13 == 0)
    assert m["n_input"] == n and m["n_bench_heldout"] == n_bench
    assert m["n_quality"] == n - n_bench - 2  # spam + null dropped
    assert m["n_clean"] == m["n_quality"] - 1  # 27 contaminated
    assert m["n_final"] == m["n_clean"] - 1  # 20 collapsed into 14
    # export: hive-partitioned by split, ids disjoint and complete
    files = glob.glob(f"{out}/split=*/*.parquet")
    assert files
    exported = pd.concat([pq.read_table(f).to_pandas() for f in files])
    assert len(exported) == m["n_final"]
    assert 20 not in set(exported.doc_id) and 27 not in set(exported.doc_id)
    # every multi-doc shard respects the budget
    per_shard = exported.groupby("shard_id").agg(n=("doc_id", "size"), t=("tokens", "sum"))
    assert ((per_shard.n == 1) | (per_shard.t <= 64)).all()
    assert m["total_tokens"] == int(exported.tokens.sum())
    # a shard is the training unit: it must never straddle splits
    split_of = {}
    for f in files:
        split = f.split("split=")[1].split("/")[0]
        for sid in pq.read_table(f).to_pandas().shard_id.unique():
            assert split_of.setdefault(sid, split) == split, sid
