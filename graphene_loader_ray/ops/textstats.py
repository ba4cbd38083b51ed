"""Text analysis operators for training-data pipelines (instruction set:
language-ID, quality scoring, token counting, document fingerprinting).

All stages are actor pools (``map_batches(Cls, concurrency=...)``): regexes
and stopword tables compile once per actor (``__init__``), the per-batch
body is the vectorized hot path. Determinism: no randomness, no wall clock;
fingerprints use keyed blake2b, never Python's salted ``hash()``.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pyarrow as pa

from ray.data import Dataset

# the oracle-SQL twin of TOKEN_RE is `regexp_extract_all(text, '\\w+|[^\\w\\s]')`
TOKEN_PATTERN = r"\w+|[^\w\s]"
WORD_PATTERN = r"\w+"
# BPE-style pre-tokenizer (GPT-2-shaped: contraction suffixes, space-
# prefixed letter/digit/punct runs, residual whitespace) — deliberately
# lookahead-free so DuckDB's RE2 twin counts the SAME tokens
BPE_PATTERN = (r"'s|'t|'re|'ve|'m|'ll|'d"
               r"| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+")

# small per-language stopword tables (public, common knowledge)
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to a in is was for on with as by at it from"
                    .split()),
    "es": frozenset("el la los las de que y en un una es por con para del"
                    .split()),
    "de": frozenset("der die das und von zu mit ist im den des ein eine für"
                    .split()),
    "fr": frozenset("le la les de des et un une est dans pour par sur au"
                    .split()),
}
_CJK = re.compile(r"[一-鿿]")


class TokenCounter:
    """doc_id + text -> token/word/char counts + ratios (SQL-expressible;
    the oracle twin is in __ray_entry__.oracle_sql()['text_stats'])."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id") -> None:
        # re.ASCII: \w means [0-9A-Za-z_] exactly as in DuckDB's RE2, so the
        # SQL oracle twin counts the same tokens on non-ASCII text
        self.token_re = re.compile(TOKEN_PATTERN, re.ASCII)
        self.word_re = re.compile(WORD_PATTERN, re.ASCII)
        self.bpe_re = re.compile(BPE_PATTERN)
        self.stop_en = STOPWORDS["en"]
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_tokens, n_words, n_stop, n_bpe = [], [], [], []
        texts = batch[self.text_col].to_pylist()
        for text in texts:
            toks = self.token_re.findall(text or "")
            words = [t for t in toks if self.word_re.match(t)]
            n_tokens.append(len(toks))
            n_words.append(len(words))
            n_stop.append(sum(1 for w in words if w.lower() in self.stop_en))
            # BPE-ish count: non-whitespace pre-tokens (a real tokenizer
            # would map each to ≥1 merges; this is the standard cheap
            # training-token estimator)
            n_bpe.append(sum(1 for t in self.bpe_re.findall(text or "")
                             if not t.isspace()))
        n_chars = [len(t or "") for t in texts]
        return pa.table({
            "doc_id": batch[self.id_col],
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "n_stop": pa.array(n_stop, pa.int64()),
            "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
        })


class QualityScorer:
    """Heuristic quality + language-ID + winnowing fingerprint.

    quality/lang ARE SQL-expressible (regexp + list lambdas + CASE) —
    their DuckDB twin is ORACLE_SQL['text_quality'], hash-compared; the
    fingerprint is not (rolling keyed hashes) and ships as the separate
    rows-only `text_fingerprint` query, pinned by unit tests.

    quality = mean of four [0,1] signals: length band, word share of
    tokens, stopword presence, mean word length band (the
    length/punct/stopword recipe from the task card).
    language: CJK chars -> zh; else argmax stopword hits (ties -> 'en'
    first, then alphabetical); no hits -> 'und'.
    fingerprint: winnowing (Schleimer et al., SIGMOD'03) over 8-char
    rolling polynomial hashes (splitmix-finalized, vectorized), window 4;
    emitted as the min-selected hash hex.
    """

    K_GRAM = 8
    WINDOW = 4

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 with_fingerprint: bool = True) -> None:
        # re.ASCII like TokenCounter: \w == [0-9A-Za-z_] exactly as in
        # DuckDB's RE2, so the SQL twin tokenizes identically
        self.token_re = re.compile(TOKEN_PATTERN, re.ASCII)
        self.word_re = re.compile(WORD_PATTERN, re.ASCII)
        self.text_col, self.id_col = text_col, id_col
        # the rolling-hash fingerprint costs ~as much as everything else
        # combined; quality-only consumers switch it off
        self.with_fingerprint = with_fingerprint

    _FP_B = np.uint64(0x100000001B3)          # odd polynomial multiplier

    @staticmethod
    def _mix64(x: np.ndarray) -> np.ndarray:
        """splitmix64-style finalizer (same recipe as ops/sketch.py): the
        bare polynomial leaves high bits weakly mixed; winnowing's min
        selection needs uniform hashes."""
        with np.errstate(over="ignore"):
            x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
            x = (x ^ (x >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
        return x ^ (x >> np.uint64(33))

    def _fingerprint(self, text: str) -> tuple[str, int]:
        """Winnowing, fully vectorized: k fused multiply-adds build every
        k-gram polynomial hash at once (the per-character blake2b this
        replaces was the dominant per-doc cost), a sliding-window view
        takes the window minima, np.unique the selected set."""
        k, w = self.K_GRAM, self.WINDOW
        c = np.frombuffer(text.encode("utf-32-le"),
                          dtype=np.uint32).astype(np.uint64)
        n = len(c)
        m = max(n - k + 1, 1)                 # short text: one whole-gram
        h = np.zeros(m, np.uint64)
        with np.errstate(over="ignore"):
            for j in range(min(k, n)):
                h = h * self._FP_B + c[j:j + m]
        h = self._mix64(h)
        if len(h) <= w:
            mins = h.min(keepdims=True)
        else:
            mins = np.lib.stride_tricks.sliding_window_view(h, w) \
                .min(axis=1)
        selected = np.unique(mins)
        return f"{int(selected.min()):016x}", len(selected)

    def _lang(self, words_lower: list[str], text: str) -> str:
        if _CJK.search(text):
            return "zh"
        scores = {lang: sum(1 for w in words_lower if w in sw)
                  for lang, sw in STOPWORDS.items()}
        best = max(scores.values())
        if best == 0:
            return "und"
        top = sorted(l for l, s in scores.items() if s == best)
        return "en" if "en" in top else top[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        out = {"quality": [], "lang_guess": [], "fingerprint": [],
               "n_fingerprints": []}
        for text in batch[self.text_col].to_pylist():
            text = text or ""
            toks = self.token_re.findall(text)
            # word = token matching ASCII \w at position 0 (same predicate
            # as the SQL twin's regexp_matches(x, '^\w')); the previous
            # isalnum() test diverged on non-ASCII single-char tokens
            words = [t for t in toks if self.word_re.match(t)]
            words_lower = [w.lower() for w in words]
            n_stop = sum(1 for w in words_lower if w in STOPWORDS["en"])
            len_band = min(1.0, len(text) / 500.0)
            word_share = len(words) / len(toks) if toks else 0.0
            stop_band = min(1.0, 5.0 * n_stop / len(words)) if words else 0.0
            mwl = (sum(map(len, words)) / len(words)) if words else 0.0
            mwl_band = 1.0 - min(1.0, abs(mwl - 5.0) / 5.0)
            # round half-UP at 1e-6, exactly like DuckDB's round(x, 6)
            # (std::round(x*1e6)/1e6): python's bankers round() differs on
            # the quarter-valued halfway cases the /4.0 mean produces
            q_raw = (len_band + word_share + stop_band + mwl_band) / 4.0
            q = math.floor(q_raw * 1e6 + 0.5) / 1e6
            fp, nfp = self._fingerprint(text) if self.with_fingerprint \
                else ("", 0)
            out["quality"].append(q)
            out["lang_guess"].append(self._lang(words_lower, text))
            out["fingerprint"].append(fp)
            out["n_fingerprints"].append(nfp)
        return pa.table({
            "doc_id": ids,
            "quality": pa.array(out["quality"], pa.float64()),
            "lang_guess": pa.array(out["lang_guess"], pa.string()),
            "fingerprint": pa.array(out["fingerprint"], pa.string()),
            "n_fingerprints": pa.array(out["n_fingerprints"], pa.int64()),
        })


def winnow_fingerprint_sql(table: str, text_col: str = "text",
                           id_col: str = "doc_id", k: int = 8,
                           w: int = 4) -> str:
    """Generated DuckDB twin of QualityScorer._fingerprint (VERDICT r3
    #7) — the winnowing kernel is deterministic arithmetic over code
    points, so it IS SQL-expressible with uint64 emulation:

      chars   : one row per character (DuckDB's character iteration is
                codepoint-exact vs the engine's utf-32 view — tested)
      grams   : the k-gram polynomial hash via k lead() terms × the
                precomputed B^p mod 2^64 powers (HUGEINT sums stay below
                2^88, one final mod)
      mixed   : the splitmix64 finalizer; the 64×64 multiplies split at
                32 bits (lo*C + ((hi*C) mod 2^32)·2^32, all < 2^97)
                because HUGEINT caps at 2^127
      minima  : sliding-window min over w grams (ROWS BETWEEN), one
                window row per winnowing window
      agg     : fingerprint = min selected hash as lower hex,
                n_fingerprints = count(DISTINCT selected)

    Short docs (0 < n < k) hash one whole-text gram of degree n —
    expressed by the per-doc ``deg``; empty/null text contributes the
    engine's all-zero fingerprint via the UNION branch."""
    B = 0x100000001B3
    C1, C2 = 0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53
    M = 1 << 64
    pows = [pow(B, p, M) for p in range(k)]
    pows_lit = "[" + ", ".join(f"{p}::HUGEINT" for p in pows) + "]"
    terms = " + ".join(
        f"(CASE WHEN {j} < deg THEN COALESCE(lead(c, {j}) OVER w8, 0)"
        f" * list_extract({pows_lit}, deg - {j}) ELSE 0 END)"
        for j in range(k))

    def mulmod(a: str, c: int) -> str:
        return (f"((({a}) % 4294967296) * {c}::HUGEINT"
                f" + (((({a}) >> 32) * {c}::HUGEINT) % 4294967296)"
                f" * 4294967296) % {M}::HUGEINT")

    def xshift(a: str) -> str:
        return f"xor(({a}), ({a}) >> 33)"

    # splitmix64: x^=x>>33; x*=C1; x^=x>>33; x*=C2; x^=x>>33  (mod 2^64)
    mix = xshift(mulmod(xshift(mulmod(xshift("h"), C1)), C2))

    return f"""
        WITH docs AS (
          SELECT {id_col} AS doc_id, {text_col} AS t,
                 length({text_col})::BIGINT AS n,
                 LEAST({k}, length({text_col}))::BIGINT AS deg
          FROM {table}
          WHERE {text_col} IS NOT NULL AND length({text_col}) > 0),
        pos AS (
          -- scalar list range + unnest: the table function form rejects
          -- per-row (lateral) bounds
          SELECT doc_id, n, deg, t,
                 unnest(range(1, n + 1))::BIGINT AS i
          FROM docs),
        chars AS (
          SELECT doc_id, n, deg, i,
                 unicode(substr(t, i::INT, 1))::HUGEINT AS c
          FROM pos),
        grams AS (
          SELECT doc_id, n, deg, i, ({terms}) % {M}::HUGEINT AS h
          FROM chars
          WINDOW w8 AS (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN CURRENT ROW AND {k - 1} FOLLOWING)
          QUALIFY i <= n - deg + 1),
        mixed AS (
          SELECT doc_id, n, deg, i, {mix} AS f FROM grams),
        minima AS (
          SELECT doc_id,
                 min(f) OVER (PARTITION BY doc_id ORDER BY i
                              ROWS BETWEEN CURRENT ROW
                              AND {w - 1} FOLLOWING) AS fw
          FROM mixed
          QUALIFY i <= GREATEST(n - deg + 1 - {w} + 1, 1))
        SELECT doc_id,
               lower(lpad(to_hex(min(fw)::UBIGINT), 16, '0'))
                   AS fingerprint,
               count(DISTINCT fw)::BIGINT AS n_fingerprints
        FROM minima GROUP BY doc_id
        UNION ALL
        SELECT {id_col} AS doc_id,
               '0000000000000000' AS fingerprint, 1::BIGINT AS n_fingerprints
        FROM {table}
        WHERE {text_col} IS NULL OR length({text_col}) = 0
    """


class RepetitionScorer:
    """Gopher-style repetition signals per document (Rae et al. 2021's
    repetitious-text filters, adapted to the word level): the fraction of
    word occurrences that are repeats, and the share of all bigrams /
    trigrams taken by the single most common one. High values mark
    boilerplate / keyword-stuffed pages a training-data pipeline drops.

    Vectorized: one regex findall per doc (cached word→hash dict, C
    blake2b only on new words), then numpy unique/counts over uint64
    n-gram hashes — no per-n-gram Python. String-exactness vs the DuckDB
    twin rests on 64-bit no-collision (same documented assumption as the
    hashed-shingle dedup path, pinned by
    test_ngram_jaccard_hashed_equals_strings).

    Rounding: half-up at 1e-6 exactly like DuckDB's round(x, 6) (see
    QualityScorer). SQL twin: ORACLE_SQL['text_repetition'].
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id") -> None:
        from .dedup import ShingleHasher, combine_ngram_hashes
        self._combine = combine_ngram_hashes
        # ascii_words=True: tokenize with ASCII \w over lower(text), the
        # exact tokenization of the DuckDB twin's regexp_extract_all
        self._hasher = ShingleHasher(n=2, ascii_words=True)
        self.text_col, self.id_col = text_col, id_col

    @staticmethod
    def _round6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        n_words, dup_frac, top2, top3 = [], [], [], []
        for text in batch[self.text_col].to_pylist():
            wh = self._hasher.word_hashes(text or "")
            nw = len(wh)
            n_words.append(nw)
            if nw == 0:
                dup_frac.append(0.0)
            else:
                nd = np.unique(wh).size
                dup_frac.append(self._round6(1.0 - nd / nw))
            for out, n in ((top2, 2), (top3, 3)):
                if nw < n:
                    out.append(0.0)
                    continue
                grams = self._combine(wh, n)
                top = int(np.unique(grams, return_counts=True)[1].max())
                out.append(self._round6(top / (nw - n + 1)))
        return pa.table({
            "doc_id": batch[self.id_col],
            "n_words": pa.array(n_words, pa.int64()),
            "dup_word_frac": pa.array(dup_frac, pa.float64()),
            "top_bigram_frac": pa.array(top2, pa.float64()),
            "top_trigram_frac": pa.array(top3, pa.float64()),
        })


def repetition_stats(docs: Dataset, concurrency=(1, 8)) -> Dataset:
    return docs.map_batches(RepetitionScorer, batch_format="pyarrow",
                            batch_size=2048, concurrency=concurrency)


class TermPartials:
    """In-batch combiner for corpus term frequencies: each batch emits one
    (term, n) row per DISTINCT term, so the shuffle moves
    O(vocab × batches) rows instead of O(word occurrences) — the same
    pre-aggregation shape as the linker's in-actor combining. Counting is
    pandas value_counts (C), not a Python dict loop."""

    def __init__(self, text_col: str = "text") -> None:
        import re as _re
        self.word_re = _re.compile(WORD_PATTERN, _re.ASCII)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        words: list[str] = []
        for text in batch[self.text_col].to_pylist():
            words.extend(self.word_re.findall((text or "").lower()))
        if not words:
            return pa.table({"term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = pd.Series(words, dtype=object).value_counts(sort=False)
        return pa.table({"term": pa.array(vc.index.to_list(), pa.string()),
                         "n": pa.array(vc.to_numpy(), pa.int64())})


def term_frequencies(docs: Dataset, k: int = 50,
                     concurrency=(1, 8)) -> Dataset:
    """Corpus vocabulary head: top-k terms by occurrence count (ties by
    term). Combiner-first: partial counts per batch, a vocab-sized
    groupby-sum, then a vocab-sized sort+limit — the corpus itself is
    never shuffled."""
    from ray.data.aggregate import Sum

    return docs.map_batches(TermPartials, batch_format="pyarrow",
                            batch_size=2048, concurrency=concurrency) \
        .groupby("term").aggregate(Sum("n", alias_name="n")) \
        .sort(["n", "term"], descending=[True, False]).limit(k)


def token_stats(docs: Dataset, concurrency=(1, 8)) -> Dataset:
    return docs.map_batches(TokenCounter, batch_format="pyarrow",
                            batch_size=2048, concurrency=concurrency)


def quality(docs: Dataset, concurrency=(1, 8),
            with_fingerprint: bool = True) -> Dataset:
    return docs.map_batches(
        QualityScorer, batch_format="pyarrow", batch_size=2048,
        concurrency=concurrency,
        fn_constructor_kwargs={"with_fingerprint": with_fingerprint})
