"""Text-side functions: HTML text extraction, geo-entity parsing, and the
text-analysis kernels of a training-data pipeline (token counting, quality
scoring, language-ID heuristic, document fingerprinting).

All functions are pure, vectorized where practical, and deterministic —
the north_rule invariant is byte-identical extracted ``text`` per ``url``
at any parallelism level.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# HTML text nodes: maximal runs of non-tag characters between tags.
_TEXT_NODE = re.compile(r">([^<>]+)<")
_GEO = re.compile(r"@geo\((-?\d+\.\d{2}),(-?\d+\.\d{2})\)")
_TOKEN = re.compile(r"\S+")
_WORD = re.compile(r"[A-Za-z]+")
# ASCII whitespace tokenizer ([ \t\n\r\f\v]): re.ASCII makes \s match
# exactly the class the SQL oracles spell as '[\t\n\f\r \x0b]+' — plain
# str.split() splits on UNICODE whitespace (nbsp etc.) and would diverge
# from the RE2 replay
_WS_ASCII = re.compile(r"\s+", re.ASCII)


def _tokens(text: str) -> list:
    return [t for t in _WS_ASCII.split(text.lower()) if t]


def _token_table(texts):
    """Vectorized tokenizer over an Arrow string column: lowercase +
    ASCII-whitespace split + empty-drop, entirely in Arrow kernels.

    Returns (parent_row_indices int32 Array, tokens string Array) — the
    exploded (row, token) pairs in document order.  The whitespace class
    is spelled explicitly ('[\\t\\n\\f\\r \\x0b]+') because RE2's \\s
    excludes \\v; pc.utf8_lower is utf8proc-based, the same lowering
    DuckDB's lower() applies, so SQL oracles replay this byte-for-byte
    (parity with the scalar _tokens asserted in tests on the corpus).
    """
    low = pc.utf8_lower(texts)
    lists = pc.split_pattern_regex(low, pattern=r"[\t\n\f\r \x0b]+")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists)
    keep = pc.not_equal(flat, "")
    return pc.filter(parent, keep), pc.filter(flat, keep)


def extract_text(html: bytes) -> str:
    """Deterministic text extraction: text nodes of the HTML, joined by \\n.

    This is the extraction oracle of FIXTURES.md §1 — a pure function of
    ``html``.  Spatial stages must never perturb its output.
    """
    s = html.decode("utf-8", errors="strict")
    return "\n".join(m.group(1) for m in _TEXT_NODE.finditer(s))


def extract_text_batch(batch: pa.Table, html_col: str = "html", out_col: str = "text") -> pa.Table:
    """Batch text extraction, zero-copy over the Arrow buffers: the
    string column's value buffer IS the concatenated htmls, so text nodes
    (`>[^<>]+<` spans) are found with one vectorized bracket scan, and the
    output column is assembled as a single byte buffer + offsets — no
    Python string or match object is ever created.  Byte-identical to
    extract_text per row (the pure-Python oracle, asserted in tests).

    Row-boundary safety: every html starts with '<' and ends with '>', so
    adjacent rows meet as ">...<" with a zero-length gap — rejected by the
    non-empty-span condition, and no node can span rows (each row ends on
    a bracket)."""
    n_rows = len(batch)
    arr = batch[html_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if n_rows == 0:
        out = batch
        if out_col in out.column_names:
            out = out.drop_columns([out_col])
        return out.append_column(out_col, pa.array([], type=pa.string()))
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + n_rows + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lo, hi = offsets[0], offsets[-1]
    window = data[lo:hi]
    # '<' (60) and '>' (62) differ only in bit 1, so one masked compare
    # finds both — a third of the temp bytes of (w==60)|(w==62)
    pos = np.nonzero((window & 0xFD) == 60)[0] + lo
    if len(pos) >= 2:
        a = pos[:-1]
        b = pos[1:]
        node = (data[a] == 62) & (data[b] == 60) & (b > a + 1)
        starts = a[node] + 1
        ends = b[node]
    else:
        starts = ends = np.empty(0, dtype=np.int64)
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    if len(starts) == 0:
        return batch.append_column(out_col, pa.array([""] * n_rows, type=pa.string()))
    rows = np.searchsorted(offsets, starts, side="right") - 1
    lengths = ends - starts
    first_in_row = np.empty(len(rows), dtype=bool)
    first_in_row[0] = True
    np.not_equal(rows[1:], rows[:-1], out=first_in_row[1:])
    # assemble by mask-compress, not per-byte gather: keep every node span,
    # and for nodes followed by another node of the same row also keep the
    # closing '<' byte rewritten to '\n' — one copy, one cumsum, one
    # boolean index, all O(bytes) single passes
    not_last = np.empty(len(rows), dtype=bool)
    not_last[:-1] = ~first_in_row[1:]
    not_last[-1] = False
    buf = data[lo:hi].copy()
    s2 = starts - lo
    e2 = ends - lo
    buf[e2[not_last]] = 10  # '\n' over the tag's '<'
    e3 = e2 + not_last  # span end including the separator byte
    delta = np.zeros(len(buf) + 1, dtype=np.int8)
    delta[s2] = 1
    delta[e3] -= 1  # e3 can collide with nothing: spans are disjoint
    np.cumsum(delta[:-1], out=delta[:-1])
    mask = delta[:-1].view(bool)
    out = buf[mask]
    dest_len = lengths + not_last
    row_sizes = np.bincount(rows, weights=dest_len, minlength=n_rows).astype(np.int64)
    out_offsets64 = np.concatenate([[0], np.cumsum(row_sizes)])
    if out_offsets64[-1] < np.int64(2) ** 31:
        text_arr = pa.StringArray.from_buffers(
            n_rows,
            pa.py_buffer(out_offsets64.astype(np.int32).tobytes()),
            pa.py_buffer(out.tobytes()),
        )
    else:
        # a batch extracting >= 2 GiB of text needs 64-bit offsets —
        # from_buffers does not validate, so int32 here would silently
        # wrap and corrupt the text
        text_arr = pa.LargeStringArray.from_buffers(
            n_rows,
            pa.py_buffer(out_offsets64.tobytes()),
            pa.py_buffer(out.tobytes()),
        )
    return batch.append_column(out_col, text_arr)


def parse_geo_entities(text: str) -> list[tuple[float, float]]:
    """All @geo(lon,lat) mentions in document order."""
    return [(float(m.group(1)), float(m.group(2))) for m in _GEO.finditer(text)]


def parse_geo_entities_batch(batch: pa.Table, keys=("doc_id",)) -> pa.Table:
    """Explode pages → one row per geo entity.

    Output: key columns + entity_idx:int64, lon:double, lat:double,
    lon_1e2:int64, lat_1e2:int64 (integer cents — exact join/oracle keys).
    """
    texts = batch["text"].to_pylist()
    # one C-level scan over the batch; "\n" separators cannot split a match
    offsets = np.cumsum([0] + [len(t) + 1 for t in texts])
    blob = "\n".join(texts)
    starts = []
    lons = []
    lats = []
    for m in _GEO.finditer(blob):
        starts.append(m.start())
        lons.append(float(m.group(1)))
        lats.append(float(m.group(2)))
    rows = np.searchsorted(offsets, np.asarray(starts, dtype=np.int64), side="right") - 1
    lon_arr = np.asarray(lons, dtype=np.float64)
    lat_arr = np.asarray(lats, dtype=np.float64)
    # entity_idx: position within its row = i - first_match_index_of_row
    if len(rows):
        first_of_row = np.concatenate([[0], np.nonzero(np.diff(rows))[0] + 1])
        row_start = np.zeros(len(rows), dtype=np.int64)
        row_start[first_of_row] = first_of_row
        row_start = np.maximum.accumulate(row_start)
        idxs = np.arange(len(rows), dtype=np.int64) - row_start
    else:
        idxs = np.empty(0, dtype=np.int64)
    cols = {}
    for k in keys:
        cols[k] = batch[k].take(pa.array(rows, type=pa.int64()))
    cols["entity_idx"] = pa.array(idxs)
    cols["lon"] = pa.array(lon_arr)
    cols["lat"] = pa.array(lat_arr)
    cols["lon_1e2"] = pa.array(np.rint(lon_arr * 100).astype(np.int64))
    cols["lat_1e2"] = pa.array(np.rint(lat_arr * 100).astype(np.int64))
    return pa.table(cols)


# ---------------------------------------------------------------------------
# text analysis (training-data pipeline ops)


def token_count_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Whitespace token count + char count per row (vectorized Arrow kernels
    where available).  n_tokens = number of \\S+ runs."""
    counts = pc.count_substring_regex(batch[col], pattern=r"\S+")
    nchars = pc.utf8_length(batch[col])
    return batch.append_column("n_tokens", pc.cast(counts, pa.int64())).append_column(
        "n_chars_computed", pc.cast(nchars, pa.int64())
    )


_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "for", "on"},
    "de": {"der", "die", "das", "und", "ist", "in", "zu", "den", "von", "mit"},
    "fr": {"le", "la", "les", "et", "de", "des", "un", "une", "est", "en"},
    "es": {"el", "la", "los", "las", "y", "de", "un", "una", "es", "en"},
    "pt": {"o", "a", "os", "as", "e", "de", "um", "uma", "em", "para"},
}


def quality_score_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Heuristic quality features: length, mean token length, punctuation
    ratio, uppercase ratio.  Mirrors the usual webtext quality filters;
    all computed with exact integer/float arithmetic so an SQL oracle can
    reproduce them."""
    texts = batch[col]
    n_chars = pc.cast(pc.utf8_length(texts), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(texts, pattern=r"\S+"), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(texts, pattern=r"[.,;:!?]"), pa.int64())
    n_upper = pc.cast(pc.count_substring_regex(texts, pattern=r"[A-Z]"), pa.int64())
    denom = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
    out = batch.append_column("q_chars", n_chars)
    out = out.append_column("q_tokens", n_tokens)
    out = out.append_column("q_punct_ratio", pc.divide(pc.cast(n_punct, pa.float64()), pc.cast(denom, pa.float64())))
    out = out.append_column("q_upper_ratio", pc.divide(pc.cast(n_upper, pa.float64()), pc.cast(denom, pa.float64())))
    return out


class LangIdModel:
    """Stopword-profile language-ID heuristic — stateful stage (actor pool):
    profiles built once per actor in __init__, batches scored in __call__.

    Scoring is fully vectorized (the old per-row/per-word Python loop was
    a 100-TB hot-path smell): ASCII-letter runs are extracted with ONE
    Arrow regex split over the whole column (splitting BEFORE lowering
    keeps exact parity with `_WORD.findall` — unicode lowering can mint
    ASCII letters, e.g. the Kelvin sign), tokens hit the stopword
    vocabulary via a single `pc.index_in` hash probe, and per-(row, lang)
    hit counts are np.bincount sums.  Prediction = argmax over langs in
    sorted order with strict-greater semantics (numpy argmax takes the
    FIRST max, i.e. the alphabetically-first language — byte-identical
    to the scalar loop), 'und' when no stopword hit at all."""

    def __init__(self):
        self.langs = sorted(_STOPWORDS)
        vocab = sorted({w for prof in _STOPWORDS.values() for w in prof})
        self.vocab = pa.array(vocab, type=pa.string())
        # membership[lang_idx, vocab_idx]
        self.member = np.zeros((len(self.langs), len(vocab)), dtype=np.float64)
        pos = {w: i for i, w in enumerate(vocab)}
        for li, lang in enumerate(self.langs):
            for w in _STOPWORDS[lang]:
                self.member[li, pos[w]] = 1.0
        self.lang_arr = np.array(self.langs + ["und"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n_rows = len(texts)
        lists = pc.split_pattern_regex(texts, pattern=r"[^A-Za-z]+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, "")
        flat = pc.filter(flat, keep)
        parent = pc.filter(parent, keep).to_numpy(zero_copy_only=False)
        sw = pc.index_in(pc.ascii_lower(flat), value_set=self.vocab)
        valid = pc.is_valid(sw)
        swv = pc.filter(sw, valid).to_numpy(zero_copy_only=False).astype(np.int64)
        pv = parent[valid.to_numpy(zero_copy_only=False)]
        counts = np.zeros((n_rows, len(self.langs)), dtype=np.int64)
        for li in range(len(self.langs)):
            counts[:, li] = np.bincount(
                pv, weights=self.member[li, swv], minlength=n_rows
            ).astype(np.int64)
        best = counts.argmax(axis=1)  # first max == alphabetically-first lang
        best = np.where(counts.max(axis=1, initial=0) > 0, best, len(self.langs))
        preds = self.lang_arr[best]
        return batch.append_column("lang_pred", pa.array(preds, type=pa.string()))


_FNV64_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV64_PRIME = np.uint64(0x100000001B3)


def fnv1a64(data: bytes) -> int:
    """FNV-1a 64-bit hash (public domain algorithm) — the engine's stable
    document fingerprint; reproducible cross-language, unlike Python hash()."""
    h = _FNV64_OFFSET
    prime = _FNV64_PRIME
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    for b in arr:
        h = np.bitwise_xor(h, b)
        h = h * prime  # uint64 wraparound
    return int(h)


def fingerprint_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Stable 64-bit fingerprint per row (md5-low64, matching DuckDB's
    md5_number_lower for oracle parity) + FNV rolling hash."""
    import hashlib

    texts = batch[col].to_pylist()
    fps = []
    for t in texts:
        d = hashlib.md5(t.encode()).hexdigest()
        fps.append(d)
    return batch.append_column("fingerprint", pa.array(fps, type=pa.string()))


# ---------------------------------------------------------------------------
# document fingerprinting: winnowing (rolling k-gram hash + window minimum)

WINNOW_B = 131  # polynomial base; the SQL oracle replays the hash with
WINNOW_MOD = 1 << 32  # Horner's rule mod 2^32 per step, so ANY Unicode
# code point is overflow-safe on both sides (engine: uint64 natural wrap
# is exact mod 2^32 because 2^32 | 2^64)


def winnow_fingerprints_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 8,
) -> pa.Table:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the standard local fingerprinting scheme): polynomial
    k-gram hashes h[p] = sum(code[p+j] * B^(k-1-j)) mod 2^32, then per
    w-window the RIGHTMOST minimal hash position is selected; output is
    the distinct (doc_id, pos, gram_hash) rows.

    Vectorized per row: code points via utf-32 reinterpretation, gram
    hashes via a strided window multiply-sum in uint64 (the natural
    mod-2^64 wrap is exact mod 2^32 because 2^32 | 2^64), window argmin on
    the reversed strided view (first-min of reversed = rightmost-min).
    Docs with fewer than w grams yield no fingerprints (mirrors the SQL
    oracle's empty window range).  Map-only — embarrassingly parallel at
    any scale; expected fingerprint density is 2/(w+1) per position.
    """
    from numpy.lib.stride_tricks import sliding_window_view

    ids = batch[id_col].to_numpy(zero_copy_only=False)
    texts = batch[text_col].to_pylist()
    powers = (WINNOW_B ** np.arange(k - 1, -1, -1, dtype=np.uint64)).astype(np.uint64)
    out_id, out_pos, out_h = [], [], []
    for i, t in zip(ids.tolist(), texts):
        cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        n_grams = len(cp) - k + 1
        if n_grams < w:
            continue
        h = (sliding_window_view(cp, k) * powers[None, :]).sum(axis=1) % WINNOW_MOD
        wv = sliding_window_view(h, w)
        j = (w - 1) - np.argmin(wv[:, ::-1], axis=1)
        pos = np.unique(np.arange(len(wv)) + j)
        out_id.append(np.full(len(pos), i, dtype=np.int64))
        out_pos.append(pos.astype(np.int64))
        out_h.append(h[pos].astype(np.int64))
    if out_id:
        a, p, g = np.concatenate(out_id), np.concatenate(out_pos), np.concatenate(out_h)
    else:
        a = p = g = np.empty(0, dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(a, type=pa.int64()),
            "pos": pa.array(p, type=pa.int64()),
            "gram_hash": pa.array(g, type=pa.int64()),
        }
    )


def top_tokens(ds, k: int = 50, text_col: str = "text", id_col: str = "doc_id"):
    """Global top-k tokens by frequency (vocabulary head): lowercase,
    whitespace-split token counts combined map-side (the shuffle carries
    one (token, partial-count) row per task per distinct token — bounded
    by vocabulary, not corpus size), summed per token, then a pruned
    exact top-k sort.  Ties broken token-ascending; rank is 0-based.

    Output: token (string), n (int64), rank (int64).
    """
    import pandas as pd

    from ..stages.relational import top_k

    def partial(batch: pa.Table) -> pa.Table:
        _, toks = _token_table(batch[text_col])
        vc = pc.value_counts(toks)  # one Arrow hash pass, no Python loop
        return pa.table(
            {
                "token": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    summed = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )
    top = top_k(summed, ["n", "token"], k, descending=[True, False])

    def add_rank(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["n", "token"], ascending=[False, True], kind="mergesort"
        )
        df["rank"] = np.arange(len(df), dtype=np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    return top.repartition(1).map_batches(add_rank, batch_format="pyarrow")


def tfidf_top_terms(
    ds,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 16,
    materialize_input: bool = False,
):
    """Top-k characteristic terms per document by a tf-idf-style weight.

    DETERMINISM CONTRACT: ``ds`` is consumed twice (df pass, then the
    scoring pass) WITHOUT materializing, so upstream stages re-execute —
    they must be deterministic (parquet reads and pure map_batches are;
    sampling or unstable generator sources are NOT).  A nondeterministic
    upstream can surface a token in pass 2 that pass 1 never counted,
    which fails loudly (AssertionError below) rather than silently
    scoring with a wrong df.  Pass ``materialize_input=True`` to pin one
    snapshot in the object store (spillable) when upstream is not
    re-execution-stable.

    Weight = tf / (df + 1), compared exactly via the integer score
    tf * 1e6 // (df + 1) with token-ascending tie-break — no floating
    log, so ranking is bit-deterministic and SQL-replayable.

    Distributed shape (100-TB-safe, two streaming passes over the input):
      1. document frequencies via a map-side partial (one (token,
         n_docs_in_batch) row per task per distinct token) + a
         vocabulary-bounded groupby Sum — the shuffle carries partials
         bounded by |vocab| x |tasks|, never the corpus.
      2. the small df table is broadcast ONCE via ray.put; an actor pool
         builds a pandas hash index over it in __init__.
      3. ONE fused map stage explodes each document into (doc_id, token,
         tf) rows AND attaches df + the integer score in the same pass —
         the corpus-sized exploded term table is never materialized and
         never joined (no Dataset.join: Ray's hash-shuffle join is
         avoided; it breaks under Acero at high parallelism and would be
         an all-to-all of corpus-sized rows anyway).
      4. per-doc top-k via doc-hash-bucketed map_groups.

    Output: doc_id, token, tf, df, score_1e6, rank (0-based).
    """
    import pandas as pd

    import ray
    from ray.data.aggregate import Sum

    if materialize_input:
        ds = ds.materialize()

    def df_partial(batch: pa.Table) -> pa.Table:
        parent, toks = _token_table(batch[text_col])
        # distinct (doc, token) then count per token = docs-in-batch per token
        g = (
            pd.DataFrame(
                {"i": parent.to_numpy(zero_copy_only=False), "token": toks.to_pandas()}
            )
            .drop_duplicates()
            .groupby("token", sort=False)
            .size()
        )
        return pa.table(
            {
                "token": pa.array(g.index, type=pa.string()),
                "df": pa.array(g.to_numpy(), type=pa.int64()),
            }
        )

    df_small = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()  # vocabulary-bounded — small by construction
    )
    df_ref = ray.put(
        {
            "token": df_small["token"].to_numpy(),
            "df": df_small["df"].to_numpy().astype(np.int64),
        }
    )

    class TfIdfScorer:
        """Explode + score in one pass against the broadcast df table
        (hash index built once per actor)."""

        def __init__(self, ref):
            state = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.index = pd.Index(state["token"])
            self.df = state["df"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            parent, toks = _token_table(batch[text_col])
            ids_row = batch[id_col].to_numpy(zero_copy_only=False)
            g = (
                pd.DataFrame(
                    {
                        "i": parent.to_numpy(zero_copy_only=False),
                        "token": toks.to_pandas(),
                    }
                )
                .groupby(["i", "token"], sort=False)
                .size()
                .reset_index(name="tf")
            )
            ids = ids_row[g["i"].to_numpy()]
            pos = self.index.get_indexer(g["token"])
            if (pos < 0).any():  # every tf token was seen in the df pass
                raise AssertionError(
                    "token missing from broadcast df table: upstream of "
                    "tfidf_top_terms re-executed nondeterministically "
                    "between the df and scoring passes — pass "
                    "materialize_input=True (see docstring)"
                )
            dfv = self.df[pos]
            tfv = g["tf"].to_numpy().astype(np.int64)
            s = tfv * np.int64(1_000_000) // (dfv + np.int64(1))
            return pa.table(
                {
                    id_col: pa.array(ids, type=pa.int64()),
                    "token": pa.array(g["token"], type=pa.string()),
                    "tf": pa.array(tfv, type=pa.int64()),
                    "df": pa.array(dfv, type=pa.int64()),
                    "score_1e6": pa.array(s, type=pa.int64()),
                    "_h": pa.array(
                        ids % np.int64(num_partitions), type=pa.int64()
                    ),
                }
            )

    def topk_per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [id_col, "score_1e6", "token"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        g = g.groupby(id_col, as_index=False).head(k)
        g["rank"] = g.groupby(id_col).cumcount()
        return g.drop(columns=["_h"])

    return (
        ds.map_batches(
            TfIdfScorer,
            fn_constructor_args=(df_ref,),
            batch_format="pyarrow",
            concurrency=(1, 8),
        )
        .groupby("_h")
        .map_groups(topk_per_doc, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# PII redaction (email / IPv4) — RE2-safe patterns so a SQL oracle can
# replay the exact same substitutions

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


class PIIRedactor:
    """Actor stage: redact emails then IPv4s (order fixed so results are
    engine-independent).  Regexes compile ONCE per actor in __init__ —
    the stateful map_batches pattern.  Adds n_emails / n_ips counts and
    replaces the text column with the redacted version.
    """

    def __init__(self, col: str = "text"):
        import re

        self.col = col
        # re.ASCII: \b and \d in ASCII semantics, matching RE2 so the
        # SQL oracle's regexp_replace replay is byte-identical
        self.email = re.compile(PII_EMAIL, re.ASCII)
        self.ipv4 = re.compile(PII_IPV4, re.ASCII)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.col].to_pylist()
        red, ne, ni = [], [], []
        for t in texts:
            ne.append(len(self.email.findall(t)))
            t = self.email.sub("<EMAIL>", t)
            ni.append(len(self.ipv4.findall(t)))
            red.append(self.ipv4.sub("<IP>", t))
        i = batch.schema.get_field_index(self.col)
        out = batch.set_column(i, self.col, pa.array(red, type=pa.string()))
        out = out.append_column("n_emails", pa.array(ne, type=pa.int64()))
        return out.append_column("n_ips", pa.array(ni, type=pa.int64()))
