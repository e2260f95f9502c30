"""Text-analysis operators for corpus curation: language ID, quality
scoring, token counting, and document fingerprinting.

All pure column expressions (portable to the DuckDB oracle); heuristics are
deliberately simple and deterministic — the point is the Spark-shaped
plumbing (no shuffles except explicit aggregations, no Python UDFs).
"""

from __future__ import annotations

import re

import pandas as pd  # noqa: F401 — pandas_udf resolves postponed type hints
from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword seeds for the n-gram/stopword-ratio heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un", "une"],
    "es": ["el", "la", "los", "y", "es", "un", "una"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (empty-string-safe)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND word/number/punct
    boundaries (a cheap stand-in for BPE vocab size estimation)."""
    pieces = F.regexp_extract_all(text, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0)
    return F.size(pieces)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(F.lower(text))
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + mean word length
    band + stopword presence. Deterministic, expression-only."""
    toks = tokens(text)
    n = F.size(toks)
    mean_len = F.when(n > 0, F.length(F.concat_ws("", toks)) / n).otherwise(F.lit(0.0))
    len_ok = F.when((n >= 10) & (n <= 100000), 0.4).otherwise(0.0)
    word_ok = F.when((mean_len >= 2.0) & (mean_len <= 12.0), 0.3).otherwise(0.0)
    stop_ok = F.when(stopword_ratio(text) > 0.05, 0.3).otherwise(0.0)
    return (len_ok + word_ok + stop_ok).cast("double")


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    return [(lang, stopword_ratio(text, lang)) for lang in STOPWORDS]


def lang_id(text: Column, min_ratio: float = 0.03) -> Column:
    """Argmax stopword-ratio language guess; 'und' (undetermined) when the
    best ratio doesn't exceed ``min_ratio``. Ties break by declaration
    order (en > de > fr > es), encoded as a preference field so the rule is
    a pure argmax — trivially reproducible in the SQL oracle."""
    scores = lang_scores(text)
    n = len(scores)
    candidates = F.array(
        *[
            F.struct(
                score.alias("score"),
                F.lit(n - i).alias("pref"),
                F.lit(lang).alias("lang"),
            )
            for i, (lang, score) in enumerate(scores)
        ]
    )
    best = F.element_at(F.sort_array(candidates, asc=False), 1)
    return F.when(best["score"] > min_ratio, best["lang"]).otherwise(F.lit("und"))


def doc_fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercase text.
    Stable across engines; use for exact-dup detection and incremental
    re-crawl diffing."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(normalized)


# PII patterns — identical semantics under Java regex (Spark) and RE2
# (DuckDB): no backrefs, no lookaround. Applied in a fixed order.
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d -]{7,}\d", "<PHONE>"),
]


def pii_scrub(text: Column) -> Column:
    """Redact common PII shapes (emails, IPv4 addresses, phone-like digit
    runs) — the standard pre-training scrub pass. Pure regexp_replace
    expressions; order matters (emails first, so their digits never
    half-match the phone pattern)."""
    out = text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def rolling_hash(text: Column, modulus: int = 1_000_000_007, base: int = 31) -> Column:
    """Polynomial rolling hash over characters (ord * base^i mod p) — the
    classic fingerprint primitive, as a fold expression. Engine-portable
    via aggregate/list_reduce."""
    chars = F.filter(F.split(text, ""), lambda c: c != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % modulus,
    )


# ---------------------------------------------------------------------------
# Repetition & document-shape quality signals (the Gopher/C4 rule family:
# Rae et al. 2021 "Scaling Language Models" App. A; Raffel et al. 2020 C4).
# All expression-only — each signal is one pass over the text column, no
# shuffle, no Python — and every rule is reproducible in ANSI-ish SQL so
# the DuckDB oracle checks the numbers, not just the plumbing.
# ---------------------------------------------------------------------------


def lines(text: Column) -> Column:
    """Non-empty trimmed lines."""
    return F.filter(
        F.transform(F.split(text, r"\n"), F.trim),
        lambda x: F.length(x) > 0,
    )


def duplicate_line_fraction(text: Column) -> Column:
    """Fraction of non-empty lines that repeat an earlier line —
    boilerplate/template detector (headers, nav bars, injected banners)."""
    ls = lines(text)
    n = F.size(ls)
    return F.when(n > 0, (n - F.size(F.array_distinct(ls))) / n).otherwise(F.lit(0.0))


def word_ngrams(text: Column, n: int = 2) -> Column:
    """All word n-grams in order (NOT distinct — repetition is the signal).

    Implemented as n shifted ``slice`` views zipped together (one struct per
    gram position) and a single ``concat_ws`` per gram — O(len·n) work per
    document. The previous formulation (``element_at`` with a computed index
    inside a ``transform`` lambda) was O(len²·n) interpreted expression work
    and measured ~6× slower on the documents corpus; ``arrays_zip``'s struct
    fields are positional ("0", "1", ...) for computed inputs, which the
    lambda relies on. Short docs guard: count <= 0 yields an empty array
    (slice/zip on a negative length would misbehave under ANSI mode)."""
    toks = tokens(text)
    count = F.size(toks) - (n - 1)
    shifted = [F.slice(toks, j + 1, count) for j in range(n)]
    grams = F.transform(
        F.arrays_zip(*shifted),
        lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(n)]),
    )
    return F.when(count > 0, grams).otherwise(F.array().cast("array<string>"))


def duplicate_ngram_fraction(text: Column, n: int = 2) -> Column:
    """Fraction of word n-grams that are repeats — the Gopher repetition
    rule (degenerate/looping text scores high)."""
    grams = word_ngrams(text, n)
    total = F.size(grams)
    return F.when(
        total > 0, (total - F.size(F.array_distinct(grams))) / total
    ).otherwise(F.lit(0.0))


def symbol_word_ratio(text: Column) -> Column:
    """Non-alphanumeric, non-whitespace characters per word."""
    n_sym = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    n_tok = token_count(text)
    return F.when(n_tok > 0, n_sym / n_tok).otherwise(F.lit(0.0))


def alpha_word_fraction(text: Column) -> Column:
    """Fraction of words containing at least one alphabetic character
    (C4 rule: drop pages of digits/markup)."""
    toks = tokens(text)
    n = F.size(toks)
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    return F.when(n > 0, n_alpha / n).otherwise(F.lit(0.0))


def ellipsis_line_fraction(text: Column) -> Column:
    """Fraction of lines ending in '...' (truncated scrapes)."""
    ls = lines(text)
    n = F.size(ls)
    n_ell = F.size(F.filter(ls, lambda x: x.endswith("...")))
    return F.when(n > 0, n_ell / n).otherwise(F.lit(0.0))


def gopher_repetition_signals(text: Column) -> list[tuple[str, Column]]:
    """The signal battery as (name, column) pairs, thresholds per the
    published rules (adapted to this corpus's scale)."""
    return [
        ("dup_line_frac", duplicate_line_fraction(text)),
        ("dup_2gram_frac", duplicate_ngram_fraction(text, 2)),
        ("dup_3gram_frac", duplicate_ngram_fraction(text, 3)),
        ("symbol_word_ratio", symbol_word_ratio(text)),
        ("alpha_word_frac", alpha_word_fraction(text)),
        ("ellipsis_line_frac", ellipsis_line_fraction(text)),
    ]


def passes_gopher_filters(text: Column) -> Column:
    """Composite keep/drop decision: duplicate-content and shape rules
    (thresholds from the Gopher appendix where applicable)."""
    return (
        (duplicate_line_fraction(text) < 0.30)
        & (duplicate_ngram_fraction(text, 2) < 0.20)
        & (symbol_word_ratio(text) < 0.50)
        & (alpha_word_fraction(text) > 0.60)
        & (ellipsis_line_fraction(text) < 0.30)
    )


def nfc_normalize_udf():
    """Arrow-batched NFC normalizer (LLM-corpus preprocessing staple:
    decomposed accents, compatibility forms, and mixed-source text must be
    normalized before dedup/tokenization or visually-identical strings
    hash differently). Spark has no unicode-normalize builtin, so this is
    a legitimate Pandas UDF: pure string transform, Arrow transfer, no
    per-row Python call overhead beyond the batch map."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.map(lambda x: None if x is None else unicodedata.normalize("NFC", x))

    return nfc


def chunk_spans(text: Column, chunk_tokens: int = 64, overlap: int = 16) -> Column:
    """Array of chunk structs ``(chunk_idx, chunk_text, n_tokens)`` for a
    sliding token window over whitespace tokens — the standard
    context-window splitter of an LLM training pipeline (documents longer
    than the model context become overlapping windows; short documents pass
    through as one chunk).

    Stride is ``chunk_tokens - overlap``; the number of chunks is
    ``1 + ceil(max(n - chunk_tokens, 0) / stride)`` so the final partial
    window is always emitted (no text is dropped). Pure column expressions
    over one ``sequence`` — no shuffle, no Python; the explode happens at
    the caller so this composes with any projection."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(text)
    n = F.size(toks)
    # exact integer ceil: (max(n - c, 0) + s - 1) div s
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(n - F.lit(chunk_tokens), F.lit(0)) + F.lit(stride - 1))
        / F.lit(stride)
    ).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.array_join(
                F.slice(toks, i * stride + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(F.lit(chunk_tokens), n - i * stride).cast("int").alias("n_tokens"),
        ),
    )


def upsample_counts(
    id_col: Column, source: Column, weights: dict[str, float], hash_mod: int = 10_000
) -> Column:
    """Deterministic per-row repetition count for data mixing: a source with
    weight 2.3 repeats every row twice and a 30% md5-selected subset a
    third time, so the expected multiplicity is exactly the weight with
    zero RNG (reproducible across engines, partitionings, and reruns —
    the property a training-data mixing step must have for run-to-run
    parity). Unlisted sources default to weight 1.0; weight 0 drops."""
    frac_expr = None
    base_expr = None
    for src, w in weights.items():
        base, frac_bp = int(w), int(round((w - int(w)) * hash_mod))
        b = F.when(source == src, F.lit(base))
        f = F.when(source == src, F.lit(frac_bp))
        base_expr = b if base_expr is None else base_expr.when(source == src, F.lit(base))
        frac_expr = f if frac_expr is None else frac_expr.when(source == src, F.lit(frac_bp))
    base_expr = base_expr.otherwise(F.lit(1))
    frac_expr = frac_expr.otherwise(F.lit(0))
    hash_bp = (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")
        % hash_mod
    )
    return (base_expr + F.when(hash_bp < frac_expr, 1).otherwise(0)).cast("int")


# ---------------------------------------------------------------------------
# Greedy longest-prefix subword tokenizer (WordPiece-style inference,
# Wu et al. '16 §4.1 / Devlin et al. '18): given a FIXED vocabulary of
# subword fragments, each word is segmented left-to-right by always taking
# the longest vocabulary fragment that prefixes the remaining suffix,
# falling back to a single character. This is the deterministic inference
# half of a learned tokenizer (the training half — merge learning — is a
# one-off driver-side job over a sample, not a per-row operator).
# ---------------------------------------------------------------------------

# Static demo vocabulary, grouped by fragment length (longest-match order).
# Any vocabulary works — determinism, not linguistics, is the contract.
SUBWORD_VOCAB: tuple[str, ...] = (
    "wind", "tabl", "valu", "quer", "filt", "cust", "omer", "colu",
    "scan", "fast", "slow", "sort", "merg", "stre", "park", "hash",
    "join", "line", "data",
    "agg", "row", "key", "the", "big", "dup", "eam", "umn", "der",
    "oup", "mal", "tch",
    "ba", "gr", "or", "sm", "sp", "er", "le", "ue", "ry", "ow",
)

_VOCAB_BY_LEN = {
    n: frozenset(v for v in SUBWORD_VOCAB if len(v) == n)
    for n in sorted({len(v) for v in SUBWORD_VOCAB}, reverse=True)
}
_MAX_FRAG = max(_VOCAB_BY_LEN)


def greedy_subwords(word: str) -> list[str]:
    """Segment one word: longest vocabulary prefix first, 1-char fallback."""
    out, p, n = [], 0, len(word)
    while p < n:
        for length in range(min(_MAX_FRAG, n - p), 1, -1):
            frag = word[p : p + length]
            if frag in _VOCAB_BY_LEN.get(length, ()):
                out.append(frag)
                p += length
                break
        else:
            out.append(word[p])
            p += 1
    return out


def subword_tokenize(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document subword stream: ``(id, n_subwords, subword_md5)`` where
    the md5 covers every token of every word in order, joined by ``|``.

    Spark side runs the greedy loop in ``mapInPandas`` (Arrow-batched; the
    per-word results are memoized per batch, so cost is O(distinct words),
    not O(tokens)) — this is the pattern for any learned tokenizer whose
    inference is a Python library call. Map-only: partition-local, no
    shuffle, linear at 100 TB."""
    import hashlib

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("n_subwords", LongType()),
            StructField("subword_md5", StringType()),
        ]
    )

    def run(batches):
        memo: dict[str, str] = {}
        for pdf in batches:
            ids, counts, digests = [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                for w in (text or "").strip().lower().split():
                    seg = memo.get(w)
                    if seg is None:
                        seg = "|".join(greedy_subwords(w))
                        memo[w] = seg
                    toks.append(seg)
                stream = "|".join(toks)
                ids.append(i)
                counts.append(0 if not stream else stream.count("|") + 1)
                digests.append(hashlib.md5(stream.encode()).hexdigest())
            yield pd.DataFrame(
                {id_col: ids, "n_subwords": counts, "subword_md5": digests}
            )

    return df.select(id_col, text_col).mapInPandas(run, schema)


def _winnow_picks(df, id_col: str = "doc_id", text_col: str = "text",
                  k: int = 4, w: int = 5):
    """Per-window winnowing picks BEFORE dedup: one (id, h, pos) row per
    gram position, duplicated whenever adjacent windows select the same
    gram. Kept separate so ``winnow_fingerprints`` can dedup inside its
    per-doc aggregate (``collect_set``) and reuse the window's
    hash(id) partitioning — ``.distinct()`` here would shuffle on
    (id, h, pos) and force the downstream groupBy(id) to shuffle AGAIN
    (guide §2.4: two operations keyed the same way share one exchange)."""
    from pyspark.sql import Window as W

    toks = tokens(F.lower(F.col(text_col)))
    ng = F.size(toks) - (k - 1)
    seq = F.when(ng >= 1, F.sequence(F.lit(1), ng)).otherwise(
        F.array().cast("array<int>")
    )
    grams = df.select(
        F.col(id_col).alias("id"),
        toks.alias("wds"),
        F.explode(seq).alias("pos"),
    ).select(
        "id",
        "pos",
        F.conv(
            F.substring(F.md5(F.array_join(F.slice("wds", F.col("pos"), k), " ").cast("binary")), 1, 12),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    frame = W.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    sel = F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np"))).over(frame)
    return grams.select("id", sel["h"].alias("h"), (-sel["np"]).alias("pos"))


def winnow_selections(df, id_col: str = "doc_id", text_col: str = "text",
                      k: int = 4, w: int = 5):
    """The raw winnowing selection set: (id, pos, h) of every selected
    k-gram hash (see ``winnow_fingerprints`` for the scheme). Exposed so
    overlap detection can join selection sets directly — two documents
    sharing a run of >= w+k-1 words are guaranteed a common h."""
    return _winnow_picks(df, id_col, text_col, k, w).distinct()


def winnow_fingerprints(df, id_col: str = "doc_id", text_col: str = "text",
                        k: int = 4, w: int = 5):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS scheme): hash every k-word gram, slide a window of
    ``w`` consecutive gram hashes, select the RIGHTMOST minimal hash per
    window; the distinct selected (position, hash) set is the fingerprint.
    Guarantees: any shared run long enough to span a full window yields a
    shared fingerprint, with density ~2/(w+1) — bounded-size sketches for
    plagiarism/overlap detection at corpus scale.

    Variant note: windows are slid over EVERY gram position (tail windows
    truncate at the document end) so documents shorter than w grams still
    contribute fingerprints; both engine and oracle implement this rule.

    Returns (id, n_fingerprints, fp_md5) where fp_md5 hashes the selected
    gram hashes in position order (proves the exact selection set).

    Scale shape: one explode (grams), ONE window pass per document
    partition (min over a w-row frame of (hash, -pos) structs — no w-way
    self-join), one distinct, one groupBy(doc). Per-doc work is linear in
    length; the SQL oracle uses the quadratic join formulation, the engine
    the O(n) frame — same selection set by construction."""
    # pre-dedup picks + collect_SET: the per-doc set dedup runs inside the
    # one groupBy(id), which reuses the selection window's hash(id)
    # partitioning — one exchange total after the scan, where the old
    # winnow_selections().distinct() + groupBy chain paid three
    # (window shuffle, distinct on (id,h,pos), re-shuffle on id)
    picked = _winnow_picks(df, id_col, text_col, k, w)
    ordered = F.transform(
        F.array_sort(F.collect_set(F.struct(F.col("pos"), F.col("h")))),
        lambda s: s["h"].cast("string"),
    )
    return picked.groupBy("id").agg(
        F.size(F.collect_set(F.struct(F.col("pos"), F.col("h"))))
        .cast("long").alias("n_fingerprints"),
        F.md5(F.array_join(ordered, ",").cast("binary")).alias("fp_md5"),
    )


def bpe_learn(
    docs,
    n_merges: int = 4,
    text_col: str = "text",
    min_word_len: int = 2,
):
    """Distributed BPE merge learning (Sennrich, Haddow & Birch, ACL'16):
    the tokenizer-training half of the subword stack (inference half:
    ``subword_tokenize``). Words become space-separated symbol sequences;
    each round counts adjacent symbol pairs corpus-wide (weighted by word
    frequency, overlapping occurrences counted — the reference
    ``get_stats`` convention), merges the most frequent pair everywhere,
    and repeats. Ties break lexicographically on (left, right) so the
    learned merge table is bit-reproducible on any engine — which is what
    lets a SQL oracle replay the ENTIRE unrolled loop.

    Scale shape: the word-frequency table is vocabulary-bounded (Heaps'
    law — millions of rows at 100 TB, not corpus-sized) and is
    localCheckpointed once; each round is one map-side-combined
    groupBy(pair) shuffle over symbol adjacencies plus a TakeOrdered(1)
    (distributed partial top-1 — exactly ONE row reaches the driver per
    merge, the kmeans-centroid contract). The merge rewrite is a literal
    string replace, map-only. Returns the learned merge table
    (merge_rank, merge_left, merge_right, merged, pair_count).
    """
    spark = docs.sparkSession
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("word")
        )
        .filter(F.length("word") >= min_word_len)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
        # ' w o r d ' — spaces delimit symbols; leading/trailing spaces make
        # every symbol boundary (incl. first/last) a literal-replace anchor
        .withColumn(
            "seq",
            F.concat(F.lit(" "), F.regexp_replace(F.col("word"), "(.)", "$1 ")),
        )
        .localCheckpoint(eager=True)
    )
    pair_expr = F.expr(
        "transform(sequence(0, size(syms)-2), i -> struct(syms[i] AS l, syms[i+1] AS r))"
    )
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = (
            words.withColumn("syms", F.split(F.trim(F.col("seq")), " "))
            .filter(F.size("syms") >= 2)
            .select(F.explode(pair_expr).alias("pr"), "freq")
            .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
        )
        best = (
            pairs.orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        b = best[0]
        merges.append((rank, b["l"], b["r"], b["l"] + b["r"], int(b["cnt"])))
        # greedy left-to-right merge fold (the reference merge_vocab scan):
        # a literal string replace would NOT work — consecutive matches
        # share their delimiting space, so runs like 'a a a a' merge only
        # every other pair. The fold keeps the exact semantics: a merged
        # symbol is never re-consumed as the LEFT side within the same pass
        # (endswith sees ' aa ', not ' a '). Symbols are [a-z]+ so embedding
        # them as SQL literals is injection-safe — ENFORCED here, next to
        # the interpolation, not left to the distant tokenizer regex: a
        # future split-pattern change (apostrophes, unicode) must fail loud
        # rather than silently emit malformed SQL.
        left, right = b["l"], b["r"]
        if not (re.fullmatch(r"[a-z]+", left) and re.fullmatch(r"[a-z]+", right)):
            raise ValueError(
                f"bpe_learn merge symbols must be [a-z]+ to embed as SQL "
                f"literals, got {left!r}, {right!r}"
            )
        words = words.withColumn(
            "seq",
            F.expr(
                "aggregate(split(trim(seq), ' '), ' ', (acc, s) -> "
                f"CASE WHEN s = '{right}' AND endswith(acc, ' {left} ') "
                f"THEN concat(substring(acc, 1, length(acc) - {len(left) + 1}), "
                f"'{left}{right} ') "
                "ELSE concat(acc, s, ' ') END)"
            ),
        )
    return spark.createDataFrame(
        merges,
        "merge_rank int, merge_left string, merge_right string, "
        "merged string, pair_count long",
    )
