"""Text analysis for large-scale corpus pipelines.

Every function here is a pure Column expression (JVM-side, whole-stage
codegen) EXCEPT the mandated pandas-UDF sha256, and each has an
ANSI/DuckDB-SQL twin in ``rook_spark.queries`` so the driver's oracle
can verify it value-for-value. Operating column: ``documents.text``.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# word-boundary stopword probes per language (tiny by design — a
# deterministic n-gram/stopword heuristic, not a trained model)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "a"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "y", "que", "las"],
}

#: BPE-ish token pattern: letter runs, digit runs, single other symbols
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def widen_narrow_scan(df):
    """Scale-adaptive parallelism floor for heavy per-row compute
    (tokenize → shingle → hash): when the input's split count is below
    the cluster's ``defaultParallelism`` — the classic case being ONE
    small parquet file, whose scan Spark plans as ONE task (optimization
    guide §2.5, "input skew: one huge unsplittable file") — round-robin
    repartition to full width so the per-row work parallelizes instead
    of running serially on one core. At corpus scale the input already
    has ≥ parallelism splits and this is a NO-OP (no shuffle added), so
    the rule is scale-adaptive, not a local-mode constant."""
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    # partition probe via the JVM plan directly: df.rdd would build the
    # Python-serializer RDD wrapper (~0.2 s of driver time per call —
    # material when every query build pays it); toRdd() answers the
    # same question in ~3 ms and runs no job either way
    if df._jdf.queryExecution().toRdd().getNumPartitions() < par:
        return df.repartition(par)
    return df


@F.pandas_udf(T.StringType())
def sha256_udf(s: pd.Series) -> pd.Series:
    """Vectorized Arrow sha256 — the mandated invariant kernel
    (BASELINE.json input_hint: pandas/Arrow UDF, no per-row Python in
    the JVM loop; batches cross once via Arrow). Cross-checked against
    the built-in ``F.sha2(col, 256)`` in tests."""
    return s.map(lambda x: hashlib.sha256(x.encode("utf-8")).hexdigest() if x is not None else None)


def sha256_builtin(col: str | Column) -> Column:
    """JVM-side sha256 — the fast path for production; bit-identical to
    :data:`sha256_udf` (tests assert it)."""
    return F.sha2(F.col(col) if isinstance(col, str) else col, 256)


def token_count(col: str = "text") -> Column:
    """Whitespace token count. Matches DuckDB
    ``length(regexp_split_to_array(trim(text), '\\s+'))`` with the
    empty-string guard."""
    t = F.trim(F.col(col))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, "\\s+"))).alias("n_tokens")


def bpe_token_estimate(col: str = "text") -> Column:
    """Sub-word-ish token estimate: count of BPE_PATTERN matches."""
    return F.regexp_count(F.col(col), F.lit(BPE_PATTERN)).alias("n_bpe_tokens")


def _stopword_hits(col: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(col), F.lit(pat))


def lang_scores(col: str = "text") -> dict[str, Column]:
    c = F.col(col)
    return {lang: _stopword_hits(c, ws) for lang, ws in LANG_STOPWORDS.items()}


def lang_id(col: str = "text") -> Column:
    """Deterministic language-ID heuristic: argmax of per-language
    stopword hit counts; 'und' when nothing matches. Ties break by the
    fixed language order (en, de, fr, es) — mirrored exactly in the SQL
    oracle so values compare equal."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_STOPWORDS)):  # earlier langs win ties
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr.alias("lang_pred")


def quality_score(col: str = "text") -> Column:
    """Deterministic quality heuristic in [0,1]: length saturation +
    alphabetic ratio + stopword density. Rounded to 4 decimals so the
    float compares exactly against the SQL oracle."""
    c = F.col(col)
    length = F.length(c).cast("double")
    alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", "")).cast("double")
    alpha_ratio = F.when(length > 0, alpha / length).otherwise(F.lit(0.0))
    ntok = F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(F.split(F.trim(c), "\\s+")))
    stop_ratio = F.when(
        ntok > 0, F.least(_stopword_hits(c, LANG_STOPWORDS["en"]).cast("double") / ntok, F.lit(1.0))
    ).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * F.least(length / F.lit(500.0), F.lit(1.0))
        + F.lit(0.3) * alpha_ratio
        + F.lit(0.3) * stop_ratio
    )
    return F.round(score, 4).alias("quality")


def fingerprint(col: str = "text") -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (md5 is available bit-identically in Spark and DuckDB, unlike
    xxhash64 — parity matters more than speed for the oracle; swap in
    ``F.xxhash64`` at scale)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(col), "\\s+", " ")))
    return F.md5(norm).alias("fingerprint")


def winnow_fingerprints_exploded(
    df, id_col: str = "doc_id", text_col: str = "text", k: int = 5, w: int = 4
):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): rolling hashes of char ``k``-grams
    over normalized text, keeping the minimum of each ``w``-window. The
    selected minima are position-robust local features: two documents
    sharing a long-enough substring share a fingerprint, which exact-md5
    fingerprinting cannot provide. The hash is the first 8 md5 hex chars
    as an integer so an independent SQL oracle reproduces it bit-for-bit
    (swap xxhash64 for raw speed at scale).

    Shape: ONE gram-array projection → posexplode → per-doc window min
    (rows between current and w-1 following). The gram array is
    referenced exactly once, ON PURPOSE: a nested higher-order-function
    formulation (transform over windows slicing a transform over grams)
    re-evaluates the gram array per window element after Catalyst's
    CollapseProject inlines it — O(n²·k) interpreted md5 calls, measured
    as a >25× slowdown that worsens under joins. The explode+window form
    is also the scale shape: it parallelizes across (doc, position), not
    across docs.

    Returns (id, fp) rows — distinct selected hashes per document; docs
    shorter than k+w-1 chars produce none.
    """
    from pyspark.sql.window import Window

    c = F.lower(F.regexp_replace(F.col(text_col), "\\s+", " "))
    # NB: Spark's sequence(1, 0) is DESCENDING [1, 0], not empty — short
    # docs must be guarded explicitly (DuckDB's generate_series(1,0) is [])
    grams = F.when(
        F.length(c) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(c) - k + 1),
            lambda i: F.conv(
                F.substring(F.md5(c.substr(i, F.lit(k))), 1, 8), 16, 10
            ).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    # grams is referenced EXACTLY once (the generator): any second
    # reference in the same select (e.g. size(grams) for full-window
    # filtering) is re-evaluated per exploded row — measured as 43M
    # instead of 147k md5 calls on the sf0.01 corpus. The trailing window
    # + pos filter needs only the position, so no second reference exists.
    exploded = widen_narrow_scan(df).select(
        F.col(id_col).alias("id"),
        F.posexplode(grams).alias("__pos", "__h"),
    )
    win = Window.partitionBy("id").orderBy("__pos").rowsBetween(-(w - 1), 0)
    return (
        exploded.withColumn("__m", F.min("__h").over(win))
        .where(F.col("__pos") >= w - 1)  # full (trailing) windows only
        .select(F.col("id").alias(id_col), F.col("__m").alias("fp"))
        .distinct()
    )


def winnow_fingerprints(
    df, id_col: str = "doc_id", text_col: str = "text", k: int = 5, w: int = 4
):
    """Array-per-doc form of :func:`winnow_fingerprints_exploded`; docs
    with no fingerprints (shorter than k+w-1) get an empty array."""
    fps = winnow_fingerprints_exploded(df, id_col, text_col, k, w)
    agg = fps.groupBy(id_col).agg(F.sort_array(F.collect_set("fp")).alias("winnow_fps"))
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("winnow_fps"), F.array().cast("array<long>"))
            .alias("winnow_fps"),
        )
    )


def chunk_documents(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 50,
    stride: int = 40,
):
    """Split documents into overlapping token-window chunks (the LLM
    training-data chunking op): windows of ``width`` whitespace tokens
    every ``stride`` tokens (``width - stride`` tokens of overlap so no
    boundary context is lost). One generator expression per row — the
    token array appears only inside the generator, so it is evaluated
    O(chunks) per row, never per-exploded-row (see
    winnow_fingerprints_exploded for the trap this avoids).

    Returns (id, chunk_id, chunk_text, n_chunk_tokens) rows; documents
    with no tokens produce none.
    """
    toks = F.split(F.trim(F.col(text_col)), "\\s+")
    chunk = lambda start: F.slice(toks, start, width)  # noqa: E731
    chunks = F.when(
        F.trim(F.col(text_col)) != "",
        F.transform(
            F.sequence(F.lit(1), F.size(toks), F.lit(stride)),
            lambda start: F.struct(
                ((start - 1) / stride).cast("int").alias("chunk_id"),
                F.array_join(chunk(start), " ").alias("chunk_text"),
                F.size(chunk(start)).alias("n_chunk_tokens"),
            ),
        ),
    ).otherwise(F.array().cast(
        "array<struct<chunk_id:int,chunk_text:string,n_chunk_tokens:int>>"
    ))
    return df.select(
        F.col(id_col), F.explode(chunks).alias("__c")
    ).select(
        id_col,
        F.col("__c.chunk_id").alias("chunk_id"),
        F.col("__c.chunk_text").alias("chunk_text"),
        F.col("__c.n_chunk_tokens").alias("n_chunk_tokens"),
    )


# ------------------------------------------------------------------ PII
# Patterns shared verbatim with the DuckDB oracle (queries.py
# doc_pii_redaction): Java-regex and RE2 agree on this subset — ASCII
# classes, bounded quantifiers, non-capturing groups, \b — which is the
# point: no lookaround, no backrefs, nothing engine-specific. The same
# restraint keeps them cheap inside whole-stage codegen at corpus scale.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"


def redact_pii(col: Column | str) -> Column:
    """Replace emails, IPv4 addresses, and phone-shaped digit runs with
    typed placeholders — the scrub every public-corpus pipeline runs
    before training. Pure ``regexp_replace`` chain (JVM-side, vectorized,
    no UDF); order matters: emails first (their digits must not feed the
    phone pattern), then IPs (dotted digits are not phone runs), then
    phones. Heuristic by design — a redactor must over-match rather than
    under-match, so phone catches any plausible separator-laced digit
    run."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    c = F.regexp_replace(c, PII_IPV4, "<IP>")
    return F.regexp_replace(c, PII_PHONE, "<PHONE>")


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-row match counts for each PII class (computed BEFORE
    redaction): the audit axis — a corpus slice whose counts spike is a
    leaky source, not a slightly dirtier one."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        "n_emails": F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL), F.lit(0))),
        "n_ips": F.size(F.regexp_extract_all(c, F.lit(PII_IPV4), F.lit(0))),
        "n_phones": F.size(F.regexp_extract_all(c, F.lit(PII_PHONE), F.lit(0))),
    }


def gopher_quality(
    df, id_col: str = "doc_id", text_col: str = "text",
    min_mean_word_len: float = 3.0, max_mean_word_len: float = 10.0,
    min_distinct_frac: float = 0.2, max_top_bigram_frac: float = 0.2,
) -> "DataFrame":
    """Gopher-rule quality signals per document (the repetition/shape
    filters every public-corpus pipeline applies — Gopher §A1.1, Dolma):
    word count, mean word length, distinct-word fraction, and the
    fraction of all bigrams taken by the single most frequent bigram
    (the repetition smell), plus a combined keep/drop flag.

    Plan shape (the part that matters at 10^10 docs): the per-doc scalar
    stats are pure codegen expressions on the scan — no lambda HOFs
    (``aggregate``/``transform`` execute interpreted per row; the IVF
    expression path was demoted for exactly that). The bigram frequency
    needs per-doc grouping, done as posexplode → lead() window →
    two-level partial-aggregable groupBy, all keyed by the id — ONE
    shuffle of the tokenized corpus, no joins back to the text.
    Zero-bigram docs (≤1 token) left-join back as frac 0."""
    from pyspark.sql import Window

    df = widen_narrow_scan(df)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_words = F.size(toks)
    scal = df.select(
        id_col,
        n_words.alias("n_words"),
        F.round(F.length(F.concat_ws("", toks))
                / F.nullif(n_words, F.lit(0)).cast("double"), 4
                ).alias("mean_word_len"),
        F.round(F.size(F.array_distinct(toks))
                / F.nullif(n_words, F.lit(0)).cast("double"), 4
                ).alias("distinct_word_frac"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    bg = (
        df.select(id_col, F.posexplode(toks).alias("pos", "tok"))
        .select(id_col, "pos",
                F.concat_ws(" ", F.col("tok"), F.lead("tok").over(w)).alias("bg"),
                F.lead("tok").over(w).alias("nxt"))
        .where(F.col("nxt").isNotNull())
        .groupBy(id_col, "bg").agg(F.count("*").alias("c"))
        .groupBy(id_col).agg(
            F.round((F.max("c") / F.sum("c")).cast("double"), 4)
            .alias("top_bigram_frac"))
    )
    out = scal.join(bg, id_col, "left").na.fill({"top_bigram_frac": 0.0})
    return out.select(
        id_col, "n_words", "mean_word_len", "distinct_word_frac",
        "top_bigram_frac",
        (
            (F.col("mean_word_len") >= min_mean_word_len)
            & (F.col("mean_word_len") <= max_mean_word_len)
            & (F.col("distinct_word_frac") >= min_distinct_frac)
            & (F.col("top_bigram_frac") <= max_top_bigram_frac)
        ).alias("keep"),
    )


# Gopher §A1.1 repetition thresholds (Rae et al., Table A1): a document
# is dropped when the single most frequent n-gram covers more than this
# fraction of its characters (n = 2..4) or when characters inside
# DUPLICATED n-grams exceed this fraction (n = 5..10).
GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def gopher_repetition(
    df, id_col: str = "doc_id", text_col: str = "text",
    top_ns: tuple = (2, 3, 4), dup_ns: tuple = (5, 6, 7, 8, 9, 10),
    top_max: dict | None = None, dup_max: dict | None = None,
) -> "DataFrame":
    """The n-gram half of Gopher's repetition table (§A1.1) —
    ``gopher_quality`` covers the word-shape rules and the single
    top-BIGRAM count fraction; this computes the CHARACTER-mass family:

    - ``top_{n}gram_char_frac`` (n in ``top_ns``): characters covered by
      the most frequent n-gram (count × its non-separator char length)
      over the doc's total non-whitespace characters. Ties on count
      break by char mass (max over tied n-grams), so the value is
      order-insensitive and oracle-reproducible.
    - ``dup_{n}gram_char_frac`` (n in ``dup_ns``): occurrence-weighted
      char mass of all n-grams appearing ≥2 times, over total chars,
      clamped to 1.0 (overlapping occurrences double-count — documented
      deviation from Gopher's positional coverage, which needs per-char
      interval logic SQL can't express; the clamp keeps it a fraction).
    - ``keep``: every fraction at or under its threshold (defaults =
      Gopher Table A1 via GOPHER_TOP_NGRAM_MAX / GOPHER_DUP_NGRAM_MAX).

    Plan shape at 10^10 docs: ONE posexplode of the token stream, one
    window (partitioned by id) computing max(n)-1 leads in a single
    pass, an explode into (n, gram) rows — max(n)-1 × token mass, the
    honest cost of the operator — then three partial-aggregable
    groupBys that all hash on the id, so the tokenized corpus shuffles
    once and the per-(id, n[, gram]) reductions combine map-side. No
    joins back to the text, no lambda HOFs (the IVF lesson), no UDFs.
    Docs with fewer than 2 tokens have no n-grams and drop out (same
    on the DuckDB oracle side — consistent by construction).
    """
    from functools import reduce as _reduce
    from operator import and_ as _and

    from pyspark.sql import Window

    top_max = dict(GOPHER_TOP_NGRAM_MAX, **(top_max or {}))
    dup_max = dict(GOPHER_DUP_NGRAM_MAX, **(dup_max or {}))
    ns = sorted(set(top_ns) | set(dup_ns))
    max_n = max(ns)

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = widen_narrow_scan(df).select(
        id_col,
        F.length(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", ""))
        .alias("__tc"),
        F.posexplode(toks).alias("pos", "t0"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = base.select(
        id_col, "__tc", "t0",
        *[F.lead("t0", k).over(w).alias(f"t{k}") for k in range(1, max_n)],
    )
    # one struct per requested n per position; null where the doc ends
    arr = F.array(*[
        F.when(
            F.col(f"t{n - 1}").isNotNull(),
            F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(" ", *[F.col(f"t{k}") for k in range(n)]).alias("g"),
            ),
        )
        for n in ns
    ])
    grams = (
        leads.select(id_col, "__tc", F.explode(arr).alias("ng"))
        .where(F.col("ng").isNotNull())
        .select(id_col, "__tc", F.col("ng.n").alias("n"), F.col("ng.g").alias("g"))
    )
    counts = grams.groupBy(id_col, "__tc", "n", "g").agg(F.count("*").alias("c"))
    cl = F.col("c") * (F.length("g") - (F.col("n") - 1))
    pern = counts.groupBy(id_col, "__tc", "n").agg(
        # struct max orders by count first, then char mass — identical to
        # the oracle's max(c*L) FILTER (WHERE c = max(c))
        F.max(F.struct(F.col("c").alias("c"), cl.alias("cl"))).alias("__top"),
        F.sum(F.when(F.col("c") >= 2, cl).otherwise(F.lit(0))).alias("__dup"),
    )
    per_doc = pern.groupBy(id_col, "__tc").agg(
        *[F.max(F.when(F.col("n") == n, F.col("__top.cl"))).alias(f"__top{n}")
          for n in top_ns],
        *[F.max(F.when(F.col("n") == n, F.col("__dup"))).alias(f"__dup{n}")
          for n in dup_ns],
    )
    sel, conds = [F.col(id_col)], []
    for n in top_ns:
        frac = F.round(
            F.coalesce(F.col(f"__top{n}") / F.col("__tc"), F.lit(0.0)), 4)
        sel.append(frac.alias(f"top_{n}gram_char_frac"))
        conds.append(frac <= F.lit(top_max[n]))
    for n in dup_ns:
        frac = F.round(
            F.least(F.lit(1.0),
                    F.coalesce(F.col(f"__dup{n}") / F.col("__tc"), F.lit(0.0))),
            4)
        sel.append(frac.alias(f"dup_{n}gram_char_frac"))
        conds.append(frac <= F.lit(dup_max[n]))
    return per_doc.select(*sel, _reduce(_and, conds).alias("keep"))


def top_ngrams(
    df,
    ns: tuple[int, ...] = (1, 2, 3),
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_salts: int = 64,
):
    """Corpus-level n-gram frequency table, top ``k`` per gram length —
    the stop-gram / boilerplate-phrase inventory step of a corpus
    pipeline (the most frequent n-grams ARE the site chrome, cookie
    banners, and license boilerplate you then strip or down-weight).

    Scale shape: whitespace tokenization + per-doc gram construction is
    one narrow ``transform`` over the token array (no window, no
    self-join); the explode is the operator's honest ``len(ns)`` ×
    token-mass cost; the count is one partial-aggregable groupBy on
    (n, gram). The global top-k is the dangerous part at 100 TB — a
    window partitioned by ``n`` would put EVERY distinct gram of a
    length (billions, corpus vocab) in one task — so it reuses
    :func:`rook_spark.functions.sampling.group_cap`'s salted two-phase
    top-k with the gram string as the salt key: per-salt top-k first
    (bounded tasks), then a final window over ≤ k×n_salts survivors.

    Returns (n, gram, cnt, gram_rank), rank 1-based per n, ties broken
    by gram ascending so the table is deterministic.
    """
    from pyspark.sql.window import Window

    from rook_spark.functions.sampling import group_cap

    # ONE posexplode of the token stream + one id-keyed window computing
    # all leads in a single pass (the gopher_repetition shape) — 3×
    # faster measured than the sequence/slice HOF construction, which
    # Spark evaluates INTERPRETED per row. The trade: the window
    # shuffles the token stream on doc id once; the HOF path avoids
    # that shuffle but pays interpreted CPU on every token — wrong side
    # of the trade everywhere we measured.
    max_n = max(ns)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    ex = widen_narrow_scan(df).select(
        F.col(id_col), F.posexplode(toks).alias("__pos", "t0")
    )
    w = Window.partitionBy(id_col).orderBy("__pos")
    led = ex.select(
        "t0", *[F.lead("t0", j).over(w).alias(f"t{j}") for j in range(1, max_n)]
    )
    # ONE (n, gram) struct array per position, exploded once — the
    # gopher_repetition shape: the r5 form unioned one frame per n,
    # paying one Sort+Window pass per n>1 over the same exchange (plan:
    # 2 Sort+Window + 3-way Union → 1 Sort+Window + 1 Generate); rows
    # are identical because a null lead at t{n-1} means the doc ended
    # before position+n, exactly the rows the old per-n filter dropped
    arr = F.array(*[
        F.when(
            F.lit(n == 1) | F.col(f"t{n - 1}").isNotNull(),
            F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(" ", *[F.col(f"t{j}") for j in range(n)]).alias("gram"),
            ),
        )
        for n in ns
    ])
    all_grams = (
        led.select(F.explode(arr).alias("ng"))
        .where(F.col("ng").isNotNull())
        .select(F.col("ng.n").alias("n"), F.col("ng.gram").alias("gram"))
    )
    counts = all_grams.groupBy("n", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    return group_cap(
        counts, group_col="n", cap=k,
        order_by=[F.col("cnt").desc()], id_col="gram", n_salts=n_salts,
        rank_col="gram_rank",
    ).select("n", "gram", "cnt", "gram_rank")
