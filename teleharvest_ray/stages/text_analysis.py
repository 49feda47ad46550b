"""Text analysis stages: token stats, quality counts, language-ID heuristic,
document fingerprinting.

These generalize the reference's scalar text functions (SURVEY.md §2.7:
regex length/stop-word checks, quality evaluation parsing) into the text
toolkit a training-data pipeline needs. Everything is batch-vectorized
(pyarrow RE2 kernels / one pandas explode); the language-ID stage is the
canonical stateful actor-pool example (marker tables built once per actor).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash_strings, splitmix64
from ..functions.ngrams import chain_gram_hashes, explode_tokens

# tiny marker dictionaries (top function words); an n-gram model would slot
# into the same actor without changing the pipeline shape
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "ich", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "que", "dans"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "por", "que", "con"},
    "ru": {"и", "в", "не", "на", "что", "это", "с", "как", "по", "то"},
}


def token_stats(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    """n_tokens (\\S+ runs), n_chars (codepoints), n_bytes (utf-8) per row —
    all RE2/Arrow kernels, zero-copy in."""
    text = tbl[text_col]
    n_tokens = pc.count_substring_regex(text, pattern=r"\S+")
    n_chars = pc.utf8_length(text)
    n_bytes = pc.binary_length(text)
    out = tbl.append_column("n_tokens", n_tokens.cast(pa.int64()))
    out = out.append_column("n_chars", n_chars.cast(pa.int64()))
    out = out.append_column("n_bytes", n_bytes.cast(pa.int64()))
    return out


def quality_counts(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    """alnum_chars / nonspace_chars / stopword_tokens counts (quality-scoring
    raw features; the deterministic analog of the reference's LLM evaluation
    inputs, services/openai_service.py:35-45)."""
    text = tbl[text_col]
    alnum = pc.count_substring_regex(text, pattern=r"[^\W_]")
    nonspace = pc.count_substring_regex(text, pattern=r"\S")
    out = tbl.append_column("alnum_chars", alnum.cast(pa.int64()))
    out = out.append_column("nonspace_chars", nonspace.cast(pa.int64()))
    return out


class LangIdStage:
    """Actor-pool language-ID: marker lookup tables prepared once per actor
    (__init__), batches scored vectorized (__call__) — the A1/A3 load-once
    pattern (reference services/embedding_service.py:15-16)."""

    def __init__(self, markers: dict[str, set] | None = None):
        self.markers = markers or _LANG_MARKERS
        self.langs = sorted(self.markers)
        self.word_to_lang: dict[str, int] = {}
        for li, lang in enumerate(self.langs):
            for w in self.markers[lang]:
                self.word_to_lang.setdefault(w, li)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        s = batch["text"].str.lower().str.split()
        n = len(batch)
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        ex = s.explode()
        ex = ex[ex.notna()]
        if len(ex):
            mapped = ex.map(self.word_to_lang)
            hit = mapped.notna()
            if hit.any():
                rows = ex.index.to_numpy()[hit.to_numpy()].astype(np.int64)
                cols = mapped[hit].to_numpy().astype(np.int64)
                np.add.at(scores, (rows, cols), 1)
        best = scores.argmax(1)
        has_any = scores.max(1) > 0
        batch = batch.copy()
        batch["lang_pred"] = np.where(has_any, np.array(self.langs, dtype=object)[best], "und")
        return batch


#: polynomial base for the content fingerprint — small enough that every
#: (code_point * B^k mod 2^64) term fits an INT128, which is what lets the
#: DuckDB oracle reproduce the hash bit-exactly (queries.py q_fingerprint)
FP_BASE = 1000003


def fingerprint64(tbl: pa.Table, text_col: str = "text", out_col: str = "fingerprint") -> pa.Table:
    """64-bit content fingerprint of whitespace-normalized lowercase text.

    Classic polynomial rolling hash over code points —
    ``h = sum(cp_j * B^(L-1-j)) mod 2^64`` — finished with splitmix64. The
    polynomial form (not SipHash) is deliberate: every step is 64-bit
    wraparound arithmetic, so the exact hash is SQL-expressible and
    q_fingerprint is oracle-verified value-by-value. Null text maps to a
    null fingerprint. Vectorized: one utf-32 decode of the concatenated
    batch + a segmented sum; the only scalar loop is the max-doc-length
    power table."""
    norm = pc.utf8_lower(tbl[text_col])
    norm = pc.replace_substring_regex(norm, pattern=r"\s+", replacement=" ")
    norm = pc.utf8_trim_whitespace(norm)
    s = norm.to_pandas()
    mask = s.isna().to_numpy()
    texts = ["" if m else t for t, m in zip(s.tolist(), mask)]
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    cps = np.frombuffer("".join(texts).encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    h = np.zeros(len(texts), dtype=np.uint64)
    if cps.size:
        maxlen = int(lens.max())
        pows = np.empty(maxlen, dtype=np.uint64)
        pows[0] = 1
        b = np.uint64(FP_BASE)
        with np.errstate(over="ignore"):
            for k in range(1, maxlen):
                pows[k] = pows[k - 1] * b
            ends = np.cumsum(lens)
            # coefficient for flat position p of segment s is B^(end_s-1-p)
            idx = np.repeat(ends, lens) - 1 - np.arange(cps.size)
            prods = cps * pows[idx]
            nz = lens > 0
            h[nz] = np.add.reduceat(prods, (ends - lens)[nz])
    h = splitmix64(h)
    return tbl.append_column(out_col, pa.array(h.view(np.int64), pa.int64(), mask=mask))


#: RE2 patterns shared verbatim with the DuckDB oracle (both engines are
#: RE2-backed, so non-overlapping leftmost match counts agree exactly).
#: Conservative ASCII shapes — a production scan would tune per corpus.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "intl_phone": r"\+[0-9]{7,15}",
}

#: benchmark-contamination / quality markers scanned alongside PII (the
#: eval-set-leak audit); separate dict because redaction must NOT touch them
CONTAMINATION_PATTERNS: dict[str, str] = {
    "marker": r"(slow|error)",
}


def pii_scan(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc PII/contamination pattern counts (one vectorized RE2 pass per
    pattern — the pre-redaction audit step of a training-data pipeline)."""
    cols = {c: tbl[c] for c in tbl.column_names if c != text_col}
    for name, pat in {**PII_PATTERNS, **CONTAMINATION_PATTERNS}.items():
        cols[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(tbl[text_col], pattern=pat), pa.int64()
        )
    return pa.table(cols)


def redact(tbl: pa.Table, text_col: str = "text", token: str = "<PII>") -> pa.Table:
    """Replace every PII pattern match with ``token`` (the masking stage that
    pairs with :func:`pii_scan`; chained regex replaces, all vectorized)."""
    text = tbl[text_col]
    for pat in PII_PATTERNS.values():
        text = pc.replace_substring_regex(text, pattern=pat, replacement=token)
    return tbl.set_column(tbl.column_names.index(text_col), text_col, text)


#: Gopher-style repetition gates (Rae et al. 2021 table A1 shape, thresholds
#: re-centered on this corpus's distribution: dup-word median 0.54/p90 0.68,
#: top-bigram median 0.033/p90 0.069)
REPETITION_MAX_DUP_WORD_FRAC = 0.625
REPETITION_MAX_TOP_BIGRAM_FRAC = 0.05
#: degenerate docs (null/empty text, single word) pass both fraction gates
#: trivially (0.0/0.0) — gate them out instead of keeping exactly the junk
REPETITION_MIN_WORDS = 2


def repetition_stats(tbl: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Per-doc repetition quality stats, fully vectorized (one explode):

    - ``n_words``: tokens when split on single spaces (SQL ``string_split``)
    - ``dup_word_frac``: 1 - distinct/total words — catches word-loop spam
    - ``top_bigram_frac``: share of all bigrams taken by the most frequent
      one — catches phrase-loop spam (Gopher's top-2-gram filter)
    - ``keep``: 1 iff both fractions are under the corpus gates AND the doc
      has at least :data:`REPETITION_MIN_WORDS` words (null/empty/one-word
      docs would otherwise pass trivially with 0.0 fractions)

    The float expressions (``1 - d/t``, ``mx/tot``) are single IEEE double
    divisions in both numpy and the SQL oracle, so values match bit-exactly.
    """
    texts = tbl[text_col].to_numpy(zero_copy_only=False)
    nd = len(texts)
    rows, wh = explode_tokens(texts, sep=" ")  # shared kernel, SQL tokenization
    n_words = np.bincount(rows, minlength=nd).astype(np.int64)

    # distinct words per doc: sort (row, hash), count run starts per row
    order = np.lexsort((wh, rows))
    r2, h2 = rows[order], wh[order]
    new = np.r_[True, (r2[1:] != r2[:-1]) | (h2[1:] != h2[:-1])] if len(r2) else np.empty(0, bool)
    n_dist = np.bincount(r2[new] if len(r2) else r2, minlength=nd).astype(np.int64)

    # bigrams: shared rolling-hash chain of adjacent word hashes per doc
    bgr, bgh = chain_gram_hashes(rows, wh, 2)
    n_bg = np.bincount(bgr, minlength=nd).astype(np.int64)
    # top bigram count per doc: run lengths of sorted (row, hash), then a
    # segment-max over each row's runs
    mx = np.zeros(nd, np.int64)
    if len(bgr):
        o2 = np.lexsort((bgh, bgr))
        br, bh = bgr[o2], bgh[o2]
        starts = np.flatnonzero(np.r_[True, (br[1:] != br[:-1]) | (bh[1:] != bh[:-1])])
        runlen = np.diff(np.r_[starts, len(br)])
        srows = br[starts]
        rstart = np.flatnonzero(np.r_[True, srows[1:] != srows[:-1]])
        mx[srows[rstart]] = np.maximum.reduceat(runlen, rstart)

    wpos = n_words > 0
    dup = np.zeros(nd, np.float64)
    dup[wpos] = 1.0 - n_dist[wpos] / n_words[wpos]
    bpos = n_bg > 0
    top = np.zeros(nd, np.float64)
    top[bpos] = mx[bpos] / n_bg[bpos]
    keep = (
        (dup <= REPETITION_MAX_DUP_WORD_FRAC)
        & (top <= REPETITION_MAX_TOP_BIGRAM_FRAC)
        & (n_words >= REPETITION_MIN_WORDS)
    ).astype(np.int64)
    return pa.table(
        {
            id_col: tbl[id_col],
            "n_words": n_words,
            "dup_word_frac": dup,
            "top_bigram_frac": top,
            "keep": keep,
        }
    )


def dup_ngram_stats(
    tbl: pa.Table, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Gopher's duplicate-n-gram gate, generic in ``n``: per doc, the fraction
    of n-gram occurrences whose gram appears >= 2 times WITHIN the doc
    (Rae et al. 2021 count-based form; the top-bigram gate in
    :func:`repetition_stats` is the max-based sibling). One explode + one
    lexsort — the same run-length machinery, no per-row Python.

    ``dup_ngram_frac`` is a single IEEE division of two exact integers, so
    the SQL oracle (queries.q_dup_ngram_frac) matches bit-exactly."""
    texts = tbl[text_col].to_numpy(zero_copy_only=False)
    nd = len(texts)
    rows, wh = explode_tokens(texts, sep=" ")
    grows, ghash = chain_gram_hashes(rows, wh, n)
    n_grams = np.bincount(grows, minlength=nd).astype(np.int64)
    n_dup = np.zeros(nd, np.int64)
    if len(grows):
        order = np.lexsort((ghash, grows))
        gr, gh = grows[order], ghash[order]
        starts = np.flatnonzero(np.r_[True, (gr[1:] != gr[:-1]) | (gh[1:] != gh[:-1])])
        runlen = np.diff(np.r_[starts, len(gr)])
        dup_runs = runlen >= 2
        np.add.at(n_dup, gr[starts[dup_runs]], runlen[dup_runs])
    pos = n_grams > 0
    frac = np.zeros(nd, np.float64)
    frac[pos] = n_dup[pos] / n_grams[pos]
    return pa.table(
        {
            id_col: tbl[id_col],
            "n_grams": n_grams,
            "n_dup_grams": n_dup,
            "dup_ngram_frac": frac,
        }
    )


#: common word = appears in >= this many permille of all documents (integer
#: threshold ``df * 1000 >= n_docs * permille`` — exact in numpy and SQL)
OOV_MIN_DF_PERMILLE = 100


def df_partial(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch DISTINCT (word -> partial document frequency) counts — each
    document lives in exactly one batch, so within-batch distinct (doc, word)
    pairs are globally distinct and a vocabulary-sized ``groupby(word).sum``
    finishes the count. Shared by :func:`vocab_doc_freq` and the frequency
    spectrum (q_vocab_spectrum) so tokenization parity holds everywhere."""
    s = pd.Series(np.asarray(tbl[text_col].to_numpy(zero_copy_only=False), dtype=object))
    ex = s.str.split(" ").explode().dropna()
    if not len(ex):
        return pa.table({"word": pa.array([], pa.string()), "df": pa.array([], pa.int64())})
    pairs = pd.DataFrame({"row": ex.index.to_numpy(np.int64), "word": ex.to_numpy(object)})
    dfc = pairs.drop_duplicates().groupby("word", sort=False).size()
    return pa.table({"word": pa.array(dfc.index, pa.string()), "df": pa.array(dfc.to_numpy(np.int64))})


def doc_freq_dataset(ds, text_col: str = "text"):
    """The document-frequency table as a still-distributed Dataset (word, df):
    one vocabulary-rows-only shuffle; corpus text never leaves its block."""
    from ray.data.aggregate import Sum as _Sum

    return (
        ds.map_batches(lambda t: df_partial(t, text_col), batch_format="pyarrow")
        .groupby("word")
        .aggregate(_Sum("df", alias_name="df"))
    )


def vocab_doc_freq(ds, text_col: str = "text"):
    """Corpus document-frequency table as pandas (bounded: a df-thresholded
    vocabulary is heavy-tail-cut small even at corpus scale)."""
    return doc_freq_dataset(ds, text_col=text_col).to_pandas()


def common_vocabulary(ds, n_docs: int, text_col: str = "text", min_df_permille: int = OOV_MIN_DF_PERMILLE) -> frozenset:
    """Words whose document frequency is >= ``min_df_permille``/1000 of the
    corpus — the broadcast side of OOV scoring. At 100 TB this set is the
    heavy tail cut of the vocabulary (bounded above by 1000/min_df_permille
    distinct words per doc x nothing — df-threshold caps it at vocabulary
    head size), shipped once via ``ray.put``."""
    voc = vocab_doc_freq(ds, text_col=text_col)
    keep = voc["df"].to_numpy(np.int64) * 1000 >= np.int64(n_docs) * np.int64(min_df_permille)
    return frozenset(voc["word"].to_numpy(object)[keep])


class OOVStage:
    """Per-doc out-of-vocabulary scoring against a broadcast common-word set:
    the A4 broadcast pattern (``ray.put`` once on the driver, ``ray.get`` in
    ``__init__`` once per actor; reference services/similarity_service.py's
    published-set snapshot shape). Rare-word ratio is the classic
    frequency-based quality signal a training-data pipeline gates on."""

    def __init__(self, common_ref):
        import ray

        self.common = (
            common_ref
            if isinstance(common_ref, (set, frozenset))
            else ray.get(common_ref)
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        s = batch["text"].str.split(" ")
        ex = s.explode().dropna()
        n = len(batch)
        n_words = np.zeros(n, np.int64)
        n_oov = np.zeros(n, np.int64)
        if len(ex):
            rows = ex.index.to_numpy(np.int64)
            np.add.at(n_words, rows, 1)
            oov = ~ex.isin(self.common).to_numpy()
            np.add.at(n_oov, rows[oov], 1)
        pos = n_words > 0
        ratio = np.zeros(n, np.float64)
        ratio[pos] = n_oov[pos] / n_words[pos]
        out = batch[["doc_id"]].copy()
        out["n_words"] = n_words
        out["n_oov"] = n_oov
        out["oov_ratio"] = ratio
        return out


def json_int_field(tbl: pa.Table, col: str, key: str, out_col: str) -> pa.Table:
    """Vectorized FLAT-JSON integer field extraction: one RE2 kernel pass
    (``pc.extract_regex``) over a JSON-string column — the flatten step of a
    props/payload ingest, zero-copy in, no per-row parser. Rows without the
    key (or null) yield null.

    Semantics are REGEX, not a JSON parse: the first ``"key": <int>``
    occurrence anywhere in the string wins, nested objects are not
    distinguished from top level, and a float value yields its integer
    prefix. That is exactly the contract the q_props_stats oracle encodes
    (DuckDB ``regexp_extract`` with the same RE2 pattern), so the two sides
    agree BY CONSTRUCTION on any input; payloads needing real traversal
    belong in a parser stage, not this kernel."""
    import re as _re

    pat = r'"' + _re.escape(key) + r'"\s*:\s*(?P<v>-?\d+)'
    ext = pc.extract_regex(tbl[col], pattern=pat)
    vals = pc.cast(pc.struct_field(ext, "v"), pa.int64())
    return tbl.append_column(out_col, vals)
