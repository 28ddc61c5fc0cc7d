"""Text analysis operators over document tables.

Everything here is built-in `pyspark.sql.functions` column algebra —
no Python UDFs — so the hot path is whole-stage codegen and scales
linearly with executors. Language-ID and fingerprinting are
deliberately deterministic (hash/stopword heuristics) so they are
reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# tiny deterministic stopword lists per language for the n-gram/stopword
# language-ID heuristic (extend freely; heuristic quality is not the point —
# determinism + distributed shape is)
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "que", "los"),
}

TOKEN_SPLIT_RE = r"\s+"
# BPE-ish pre-tokenizer: runs of letters, runs of digits, or single
# non-space symbols — a cheap stand-in for GPT-style pre-tokenization.
BPE_ISH_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def tokens(col) -> Column:
    return F.split(col, TOKEN_SPLIT_RE)


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality stats: lengths, token counts, ratios.

    ``avg_token_len``'s numerator (total token chars) is
    ``length(concat_ws('', tokens))`` — one codegen string op instead
    of a per-element higher-order ``aggregate`` lambda. A/B at sf0.1
    (min-of-4, noop sink): concat_ws 0.119 s vs aggregate 0.227 s vs
    explode+agg 0.236 s, values identical — so the single-expression
    form is both the fastest and the simplest shape here, and it
    keeps the whole operator one scan with agg-only shuffle.
    """
    t = tokens(F.col(text_col))
    stop_en = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    n_tokens = F.size(t)
    return df.select(
        "*",
        F.length(text_col).alias("n_chars_computed"),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
        F.round(F.length(F.concat_ws("", t)) / n_tokens, 6).alias("avg_token_len"),
        F.round(
            F.size(F.filter(t, lambda x: F.array_contains(stop_en, x))) / n_tokens, 6
        ).alias("stopword_ratio"),
        F.size(F.expr(f"regexp_extract_all({text_col}, '{BPE_ISH_RE}', 0)")).alias(
            "n_bpe_tokens"
        ),
    )


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-hit language ID: score = count of language stopwords
    present in the token set; argmax with deterministic tie-break on
    language code; 'und' when no stopwords hit at all."""
    t = F.array_distinct(tokens(F.col(text_col)))
    scores = []
    for lang in sorted(STOPWORDS):
        sw = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
        scores.append(
            F.struct(
                F.size(F.filter(t, lambda x: F.array_contains(sw, x))).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    # argmax by (score, lang): struct comparison is lexicographic, so ties
    # on score resolve to the lexicographically greatest language code —
    # deterministic, and mirrored exactly by the SQL oracle's CASE chain.
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        out_col,
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality pre-filter: length window + punctuation and
    stopword gates, composed into a [0,1] score. Thresholds mirror
    common training-data pipeline defaults; everything is codegen."""
    t = tokens(F.col(text_col))
    stop_en = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    n_chars = F.length(text_col)
    n_tokens = F.size(t)
    stopword_ratio = F.round(
        F.size(F.filter(t, lambda x: F.array_contains(stop_en, x))) / n_tokens, 6
    )
    punct_ratio = F.round(
        F.length(F.regexp_replace(F.col(text_col), r"[a-zA-Z0-9 ]", "")) / n_chars, 6
    )
    upper_ratio = F.round(
        F.length(F.regexp_replace(F.col(text_col), r"[^A-Z]", "")) / n_chars, 6
    )
    out = df.select(
        "*",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        stopword_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        upper_ratio.alias("upper_ratio"),
    )
    score = F.round(
        F.when(F.col("n_tokens").between(20, 10000), F.lit(0.4)).otherwise(0.0)
        + F.when(F.col("punct_ratio") < 0.2, F.lit(0.3)).otherwise(0.0)
        + F.when(F.col("stopword_ratio") > 0.01, F.lit(0.3)).otherwise(0.0),
        6,
    )
    return out.withColumn("quality_score", score)


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, app. A1.1 —
    public): per document, the fraction of 2-gram occurrences taken
    by the single most frequent 2-gram (`top_bigram_frac`) and by
    2-grams occurring more than once (`dup_bigram_frac`). High values
    flag boilerplate/spam for training-data filtering.

    Distributed shape: explode bigrams → (doc, bigram) count →
    per-doc agg. Both aggregations are map-side combinable hash aggs
    on keys that include the doc id, so there is no skew beyond the
    largest single document and no per-row quadratic higher-order
    function — the shape that survives 100 TB. Docs with <2 tokens
    have no bigrams and drop out (the oracle mirrors this).
    """
    toks = tokens(F.col(text_col))
    # pre-partition on the doc id (explicit count): both aggs below
    # contain the id, so the whole operator runs exchange-free off
    # one text-level shuffle (same pattern as corpus_frequency_score)
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    d2 = (
        df.repartition(n_parts, F.col(id_col))
        .select(id_col, toks.alias("__toks"))
        .filter(F.size("__toks") >= 2)
    )
    bg = d2.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("__toks") - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("__toks"), i + 1),
                    F.element_at(F.col("__toks"), i + 2),
                ),
            )
        ).alias("__bigram"),
    )
    counts = bg.groupBy(id_col, "__bigram").agg(F.count(F.lit(1)).alias("__cnt"))
    return counts.groupBy(id_col).agg(
        F.sum("__cnt").alias("n_bigrams"),
        F.max("__cnt").alias("top_bigram_count"),
        F.round(F.max("__cnt") / F.sum("__cnt"), 6).alias("top_bigram_frac"),
        F.round(
            F.sum(F.when(F.col("__cnt") > 1, F.col("__cnt")).otherwise(F.lit(0)))
            / F.sum("__cnt"),
            6,
        ).alias("dup_bigram_frac"),
    )


# PII-ish span patterns, deliberately restricted to syntax with
# identical semantics in Java regex (Spark) and RE2 (DuckDB oracle):
# ASCII classes, bounded repetition, \b word boundaries — no
# lookaround, no backrefs. Dict order IS the redaction order.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{7,15}",
}


def pii_scrub(
    df: DataFrame, text_col: str = "text", out_col: str = "text_scrubbed"
) -> DataFrame:
    """Count and redact PII-ish spans (emails, IPv4 addresses,
    international phone numbers) — the scrub stage every
    training-data pipeline runs before tokenization. Per-pattern
    counts (`n_email`, ...) are computed on the ORIGINAL text;
    redaction applies the patterns sequentially in `PII_PATTERNS`
    order, replacing each span with `<EMAIL>`/`<IPV4>`/`<PHONE>`.
    Pure regexp column algebra — codegen end to end, no shuffle."""
    out = df
    scrubbed = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))),
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return out.withColumn(out_col, scrubbed)


def contamination_check(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark-contamination scan: per corpus document, the
    fraction of its distinct n-token grams that appear anywhere in
    the benchmark (eval-set) corpus — the decontamination gate every
    pretraining pipeline runs (cf. the n-gram overlap checks in the
    GPT-3/PaLM dataset reports; public methodology).

    Distributed shape: both sides explode to (id, gram), distinct,
    then a LEFT equi-join on the gram string and one per-doc agg.
    The benchmark side is an eval suite — tiny relative to the
    corpus — so the planner broadcasts it under the auto-threshold
    and the corpus grams never shuffle; with a huge benchmark the
    same plan degrades gracefully to a sort-merge join on the gram.
    Docs with fewer than ``n`` tokens have no grams and drop out
    (the oracle mirrors this).
    """
    gram_expr = (
        f"explode(transform(sequence(0, size(__toks) - {n}), "
        f"i -> concat_ws(' ', slice(__toks, i + 1, {n}))))"
    )

    def grams(d: DataFrame) -> DataFrame:
        # pre-partition on the doc id (explicit count): the distinct
        # on (id, gram) and the final per-doc agg both contain the
        # id, so they run exchange-free off this one text-level
        # shuffle (same pattern as the bigram family)
        n_parts = d.sparkSession.sparkContext.defaultParallelism
        return (
            d.repartition(n_parts, F.col(id_col))
            .select(id_col, tokens(F.col(text_col)).alias("__toks"))
            .filter(F.size("__toks") >= n)
            .select(id_col, F.expr(gram_expr).alias("__gram"))
            .distinct()
        )

    bench_grams = grams(benchmark).select("__gram").distinct()
    corpus_grams = grams(df)
    joined = corpus_grams.join(
        bench_grams.withColumn("__hit", F.lit(1)), on="__gram", how="left"
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_contaminated"),
        F.round(
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))) / F.count(F.lit(1)), 6
        ).alias("contamination_frac"),
    )


def top_ngrams(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    k: int = 100,
) -> DataFrame:
    """Corpus-wide top-k n-grams by occurrence count (vocabulary /
    BPE-merge seeding, boilerplate discovery). Deterministic order:
    count desc, gram asc.

    Distributed shape: explode → hash agg with map-side combine →
    global top-k, which Spark executes as per-partition top-k +
    single small merge (TakeOrderedAndProject) — the count table
    never collects anywhere, only k rows reach the final stage.
    """
    gram_expr = (
        f"explode(transform(sequence(0, size(__toks) - {n}), "
        f"i -> concat_ws(' ', slice(__toks, i + 1, {n}))))"
    )
    return (
        df.select(tokens(F.col(text_col)).alias("__toks"))
        .filter(F.size("__toks") >= n)
        .select(F.expr(gram_expr).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("gram").asc())
        .limit(k)
    )


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lowercased text. Cross-engine stable."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.withColumn(out_col, F.md5(norm))


def corpus_frequency_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-shape corpus-frequency scoring: how COMMON each
    document's bigrams are across the whole corpus. Training-data
    pipelines use the statistical twin of this (a KenLM perplexity
    filter) to separate fluent text from gibberish; here the language
    model is the corpus itself — per-doc mean corpus frequency of its
    bigrams, in exact integer arithmetic so the score is
    engine-portable (no log/float summation-order hazards).

    Distributed shape — the real pipeline shape at 100 TB:
    1. one explode + hash agg builds the corpus bigram table
       (map-side combined; key cardinality ≈ distinct bigrams);
    2. per-doc bigram multiset joins the table ON THE BIGRAM — a
       shuffle join whose both sides are combiner-reduced slim rows,
       never raw text;
    3. per-doc agg of integer sums; the only division happens at the
       end, rounded identically in both engines.
    """
    toks = tokens(F.col(text_col))
    # pre-partition on the doc id (explicit count): the (doc, bigram)
    # agg contains the id, so it runs exchange-free off this one
    # text-level shuffle, and bigram materialization parallelizes by
    # row count instead of input file layout
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    d2 = (
        df.repartition(n_parts, F.col(id_col))
        .select(id_col, toks.alias("__toks"))
        .filter(F.size("__toks") >= 2)
    )
    bg = d2.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("__toks") - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("__toks"), i + 1),
                    F.element_at(F.col("__toks"), i + 2),
                ),
            )
        ).alias("__bigram"),
    )
    # per-(doc, bigram) multiplicities — combiner-reduced before any join
    doc_bg = bg.groupBy(id_col, "__bigram").agg(F.count(F.lit(1)).alias("__m"))
    # corpus frequency per bigram, derived from the same reduced table
    corpus = doc_bg.groupBy("__bigram").agg(F.sum("__m").alias("__cf"))
    joined = doc_bg.join(corpus, "__bigram")
    return joined.groupBy(id_col).agg(
        F.sum("__m").alias("n_bigrams"),
        F.sum(F.col("__m") * F.col("__cf")).alias("sum_corpus_freq"),
        F.round(F.sum(F.col("__m") * F.col("__cf")) / F.sum("__m"), 6).alias(
            "avg_corpus_freq"
        ),
        F.sum(F.when(F.col("__cf") == 1, F.col("__m")).otherwise(F.lit(0))).alias(
            "n_hapax"
        ),
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    positions_per_shard: int = 4096,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
    SIGMOD'03, public): hash every character k-gram of the normalized
    text, slide a ``window`` over consecutive k-gram hashes, and keep
    each window's minimum — the classic local fingerprinting scheme
    behind MOSS-style near-dup/plagiarism detection, guaranteeing a
    shared fingerprint for any match of length ≥ window + k - 1.

    One row per (doc, distinct fingerprint). Shape: positions explode
    to rows, ONE md5 per k-gram (codegen — same OUTPUT as a rolling
    Rabin-Karp hash, and the 32-bit md5 lane is computable
    identically in the oracle), then the window minimum is a frame
    aggregate over the per-doc position order — one hash shuffle on
    the doc id, O(len) hashes per doc. Deliberately NOT nested
    ``transform`` lambdas: Catalyst's projection collapse inlines an
    array-expression reference into the consuming lambda, so an
    array-of-hashes referenced from a sliding-window transform would
    recompute every k-gram hash once per window — O(len²) md5 calls
    per document.

    Straggler bound: the window partitions by (doc, position shard),
    not the bare doc id — each shard owns ``positions_per_shard``
    window starts and carries a ``window + k − 2`` character overlap
    so every window-min is computed from exactly the same k-gram
    hashes as the unsharded scheme (identical output, property- and
    equivalence-tested). Without this, ONE pathological document
    (1 GB of text → ~10⁹ exploded rows) is a single straggler task;
    with it, the largest window partition is ~``positions_per_shard``
    rows regardless of document length.
    """
    from pyspark.sql import Window

    B = int(positions_per_shard)
    if B < 1:
        raise ValueError("positions_per_shard must be >= 1")
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    d = df.select(id_col, norm.alias("__norm")).filter(
        F.length("__norm") >= k + window - 1
    )
    # window-start positions 1..__nstarts; shard s owns starts
    # [s*B+1, (s+1)*B] and its chunk carries window+k-2 overlap chars
    # so the shard computes every hash its own window-mins need
    sharded = d.select(
        id_col,
        (F.length("__norm") - (k - 1) - (window - 1)).alias("__nstarts"),
        "__norm",
        F.explode(
            F.sequence(
                F.lit(0),
                ((F.length("__norm") - (k - 1) - (window - 1) - 1) / B).cast("long"),
            )
        ).alias("__s"),
    ).select(
        id_col,
        "__nstarts",
        "__s",
        F.substring(
            F.col("__norm"), (F.col("__s") * B + 1).cast("int"), B + window + k - 2
        ).alias("__chunk"),
    )
    # Explicit-count repartition on the window's OWN keys, at CHUNK
    # granularity: (a) the per-position md5 hashing below lands
    # after this exchange, so it parallelizes by chunk count instead
    # of input file layout (a single-file corpus would otherwise
    # hash everything in one task — measured 3.5 s → ~1 s at sf0.1);
    # (b) HashPartitioning(id, __s) satisfies the window's required
    # distribution, so this REPLACES the window's position-level
    # exchange (~len rows) with a chunk-level one (~len/B rows) —
    # one shuffle either way, ours is the cheaper one. The count is
    # explicit because AQE would coalesce a small chunk shuffle into
    # few partitions, exactly wrong ahead of a B-fold generator.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    sharded = sharded.repartition(n_parts, F.col(id_col), F.col("__s"))
    pos = sharded.select(
        id_col,
        "__nstarts",
        "__s",
        "__chunk",
        F.explode(
            F.sequence(F.lit(1), F.length("__chunk") - (k - 1))
        ).alias("__lpos"),
    )
    hashed = pos.select(
        id_col,
        "__nstarts",
        "__s",
        "__lpos",
        F.conv(
            F.substring(
                F.md5(F.substring(F.col("__chunk"), F.col("__lpos"), F.lit(k))), 1, 8
            ),
            16,
            10,
        )
        .cast("long")
        .alias("__h"),
    )
    w = Window.partitionBy(id_col, "__s").orderBy("__lpos").rowsBetween(0, window - 1)
    return (
        hashed.withColumn("__wm", F.min("__h").over(w))
        # emit only window starts the shard OWNS (overlap rows feed
        # frames but don't emit) that exist in the unsharded scheme
        .filter(
            (F.col("__lpos") <= B)
            & (F.col("__s") * B + F.col("__lpos") <= F.col("__nstarts"))
        )
        .select(id_col, F.col("__wm").alias("fingerprint"))
        .distinct()
    )


def winnow_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    max_doc_freq: int = 64,
    min_shared: int = 20,
) -> DataFrame:
    """MOSS-style near-duplicate candidates: document pairs sharing at
    least ``min_shared`` winnowing fingerprints.

    The join key is the fingerprint — never all-pairs — and
    fingerprints appearing in more than ``max_doc_freq`` documents
    are dropped first (boilerplate "stop-prints", the standard MOSS
    practice), which BOUNDS the self-join fan-out per key at
    ``max_doc_freq``² regardless of corpus size; the pair count agg
    is map-side combinable on the (id_a, id_b) key.
    """
    # persist: the fingerprint table feeds the doc-frequency agg AND
    # both self-join sides — without it the whole winnowing pipeline
    # (per-position md5 + window mins) recomputes per consumer
    # (measured 2.76 s -> 1.64 s warm at sf0.1). Same pattern as the
    # MinHash signature frame in q41.
    from maston_spark.caching import scoped_persist

    fps = scoped_persist(
        winnow_fingerprints(df, id_col, text_col, k=k, window=window)
    )
    freq = fps.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("__df"))
    rare = fps.join(
        freq.filter(F.col("__df") <= max_doc_freq).select("fingerprint"),
        "fingerprint",
    )
    a = rare.select(F.col(id_col).alias("id_a"), "fingerprint")
    b = rare.select(F.col(id_col).alias("id_b"), "fingerprint")
    return (
        a.join(b, "fingerprint")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )

def exact_substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Exact-substring duplication profile (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better" —
    public): per document, how much of its text is covered by
    ``k``-token grams that occur MORE THAN ONCE anywhere in the
    corpus (including within the same document). The paper removes
    those spans; this operator reports the span coverage so callers
    can filter or trim — `n_dup_grams` (duplicated gram starts),
    `n_dup_tokens` (tokens under the UNION of duplicated spans, exact
    interval-union arithmetic), and `dup_token_fraction`.

    Distributed shape, chosen for 100 TB:
    1. one explode builds (doc, start, gram) rows — O(k) work per
       start via `slice`, never a nested O(len²) lambda;
    2. the corpus-duplicate table is a map-side-combinable hash agg
       on the gram; grams stay strings (the operator's point is
       EXACTNESS, so no lossy 32-bit hash lane — the shuffle rows
       are ~k tokens wide, still slim);
    3. duplicated starts join back ON THE GRAM (equi-join, never
       all-pairs) and the covered-token count is an exact interval
       union via one per-doc window (running max of span ends) —
       integer arithmetic only, so the oracle matches bit-for-bit.

    The per-doc window ranges over DUPLICATED starts only (≤ doc
    length), the same per-document-bounded assumption as every other
    per-doc operator here. Docs shorter than ``k`` tokens have no
    grams and report zero duplication.
    """
    from pyspark.sql import Window

    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col), toks.alias("__toks")
    ).select(id_col, "__toks", F.size("__toks").cast("long").alias("n_tokens"))
    grams = base.filter(F.col("n_tokens") >= k).select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), (F.col("n_tokens") - k).cast("int")),
                lambda i: F.concat_ws(" ", F.slice("__toks", i + 1, k)),
            )
        ).alias("__start", "__gram"),
    )
    dup = (
        grams.groupBy("__gram")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("__gram")
    )
    dstarts = grams.join(dup, "__gram").select(id_col, "__start")
    w = (
        Window.partitionBy(id_col)
        .orderBy("__start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cov = dstarts.withColumn(
        "__prev_end", F.max(F.col("__start") + (k - 1)).over(w)
    ).withColumn(
        "__new_tokens",
        F.greatest(
            F.lit(0),
            (F.col("__start") + (k - 1))
            - F.greatest(F.col("__start") - 1, F.coalesce("__prev_end", F.lit(-1))),
        ),
    )
    agg = cov.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n_dup_grams"),
        F.sum("__new_tokens").alias("__n_dup_tokens"),
    )
    return base.join(agg, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("__n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
        F.coalesce("__n_dup_tokens", F.lit(0)).cast("long").alias("n_dup_tokens"),
        F.round(
            F.coalesce("__n_dup_tokens", F.lit(0)) / F.col("n_tokens"), 6
        ).alias("dup_token_fraction"),
    )


def bigram_lm_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Log-domain bigram language-model scoring (the CCNet/KenLM
    quality-filter shape, Wenzek et al. 2020 — public): train an
    add-one-smoothed bigram LM on the corpus itself, then score each
    document by bits-per-bigram cross-entropy
    ``H = -(1/n) Σ log2 (c(w1 w2) + 1) / (c(w1·) + V)`` and
    perplexity ``2^H``. Fluent in-distribution text scores low;
    gibberish and out-of-domain text score high. The integer-exact
    sibling (:func:`corpus_frequency_score`) avoids floats entirely;
    this one reports the standard LM units.

    Distributed shape: the LM "training" is two chained hash aggs on
    the (prefix, bigram) key — both map-side combinable, never raw
    text after the first explode; scoring joins the per-doc bigram
    multiset to the count tables ON THE BIGRAM (slim combiner-reduced
    rows both sides). The vocabulary size is the only scalar: a
    distinct-count collapsed to one driver value.
    """
    toks = tokens(F.col(text_col))
    # pre-partition on the doc id (explicit count) — same pattern as
    # corpus_frequency_score: the (doc, prefix, bigram) agg contains
    # the id, so it runs exchange-free off one text-level shuffle
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    base = df.repartition(n_parts, F.col(id_col)).select(
        F.col(id_col), toks.alias("__toks")
    )
    d2 = base.filter(F.size("__toks") >= 2)
    bg = d2.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("__toks") - 2),
                lambda i: F.struct(
                    F.element_at(F.col("__toks"), i + 1).alias("p"),
                    F.concat_ws(
                        " ",
                        F.element_at(F.col("__toks"), i + 1),
                        F.element_at(F.col("__toks"), i + 2),
                    ).alias("g"),
                ),
            )
        ).alias("__pg"),
    ).select(id_col, F.col("__pg.p").alias("__p"), F.col("__pg.g").alias("__g"))
    doc_bg = bg.groupBy(id_col, "__p", "__g").agg(F.count(F.lit(1)).alias("__m"))
    corpus_bg = doc_bg.groupBy("__p", "__g").agg(F.sum("__m").alias("__cb"))
    prefix_cnt = corpus_bg.groupBy("__p").agg(F.sum("__cb").alias("__cp"))
    # vocabulary size: tiny-by-construction driver scalar (one value)
    vocab_size = (
        base.select(F.explode("__toks").alias("__t")).agg(
            F.countDistinct("__t").alias("v")
        ).first()[0]
    )
    joined = doc_bg.join(corpus_bg, ["__p", "__g"]).join(prefix_cnt, "__p")
    h = -(
        F.sum(
            F.col("__m")
            * (F.log2(F.col("__cb") + 1) - F.log2(F.col("__cp") + vocab_size))
        )
        / F.sum("__m")
    )
    return joined.groupBy(id_col).agg(
        F.sum("__m").alias("n_bigrams"),
        F.round(h, 6).alias("bits_per_bigram"),
        F.round(F.pow(F.lit(2.0), h), 3).alias("ppl"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
) -> DataFrame:
    """Per-document top-``top_k`` terms by tf-idf — the classic
    keyword-extraction / topic-tagging stage (Salton & Buckley 1988;
    public). tf = term count / doc tokens; idf = ln(N / doc-freq).

    Distributed shape: (doc, term) counts are a map-side-combinable
    hash agg; document frequency is a second agg over the SAME
    reduced table (never raw text); the ranking is one per-doc window
    over the doc's DISTINCT terms. N is a one-value driver scalar.

    Cross-engine determinism: the rank orders by tf-idf rounded to
    9 decimals (then term ascending), so a sub-nanoscale libm
    difference between Spark's and the oracle's `ln` can never flip
    an ordering — near-ties collapse to the deterministic
    lexicographic tiebreak in both engines.
    """
    from pyspark.sql import Window

    toks = tokens(F.col(text_col))
    # pre-partition on the doc id (explicit count): the (doc, term)
    # agg and the per-doc ranking window both contain the id, so
    # they run exchange-free off this one text-level shuffle
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    base = df.repartition(n_parts, F.col(id_col)).select(
        F.col(id_col), toks.alias("__toks")
    )
    n_docs = base.count()  # one driver scalar
    doc_term = (
        base.select(
            id_col, F.size("__toks").alias("__n"), F.explode("__toks").alias("term")
        )
        .groupBy(id_col, "__n", "term")
        .agg(F.count(F.lit(1)).alias("tf_count"))
    )
    docfreq = doc_term.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    scored = doc_term.join(docfreq, "term").withColumn(
        "__tfidf",
        (F.col("tf_count") / F.col("__n"))
        * F.log(F.lit(float(n_docs)) / F.col("doc_freq")),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.round("__tfidf", 9).desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            id_col,
            "term",
            F.col("tf_count").cast("long").alias("tf_count"),
            F.col("doc_freq").cast("long").alias("doc_freq"),
            F.round("__tfidf", 6).alias("tfidf"),
            "rank",
        )
    )


def lexical_diversity(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document lexical diversity: distinct-token count,
    type-token ratio, and Shannon entropy of the within-document
    token distribution — the standard "is this document degenerate
    repetition or real language" signals used alongside Gopher's
    repetition rules (Rae et al. 2021; public).

    Scale shape: one map-side-combinable (doc, term) count agg, then
    one per-doc agg — raw text never shuffles, only (doc, term,
    count) rows. No window, no UDF, all codegen.

    Cross-engine determinism: each term's entropy contribution
    ``-p*ln p`` is rounded to 9 decimals and summed as
    DECIMAL(28,9) (exact, order-independent), so Spark's unordered
    sum and the oracle's match bit-for-bit.
    """
    toks = tokens(F.col(text_col))
    # pre-partition on the doc id (explicit count): both groupings
    # below contain the id, so they run exchange-free off this one
    # text-level shuffle, and tokenization parallelizes by row count
    # instead of input file layout (same pattern as dsir_log_weights)
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    doc_term = (
        df.repartition(n_parts, F.col(id_col))
        .select(F.col(id_col), F.size(toks).alias("n_tokens"), F.explode(toks).alias("term"))
        .groupBy(id_col, "n_tokens", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    p = F.col("cnt") / F.col("n_tokens")
    contrib = F.round(-p * F.log(p), 9).cast("decimal(28,9)")
    return doc_term.groupBy(id_col, "n_tokens").agg(
        F.count(F.lit(1)).cast("long").alias("distinct_tokens"),
        F.round(F.count(F.lit(1)) / F.col("n_tokens"), 6).alias("type_token_ratio"),
        F.round(F.sum(contrib).cast("double"), 6).alias("entropy"),
    ).select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "distinct_tokens",
        "type_token_ratio",
        "entropy",
    )


def exact_substring_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    keep_first: bool = False,
) -> DataFrame:
    """Exact-substring REMOVAL (the transform half of Lee et al.
    2021; :func:`exact_substring_spans` is the reporting half):
    rewrite each document with every token under the union of
    corpus-duplicated ``k``-gram spans removed, keeping the
    surviving tokens in their original order.

    ``keep_first=True`` is the paper's granularity: Lee et al.
    remove all but ONE occurrence of each duplicated substring, so
    the corpus keeps exactly one copy of the text instead of losing
    it everywhere. The exempt occurrence is the total-order minimum
    (doc_id, start) per gram — deterministic under any shuffle
    order. A token of an exempt occurrence can still fall inside a
    non-exempt occurrence of a DIFFERENT duplicated gram; coverage
    is the union over non-exempt occurrences, exactly as the default
    is the union over all of them. The default (``False``) removes
    every occurrence — the stricter variant used when any duplicated
    span is treated as boilerplate.

    Distributed shape: the duplicated-gram table is the same
    combiner-reduced gram agg as the spans operator; duplicated
    starts explode to at most k covered positions each (dup spans
    are the RARE subset); the corpus tokens anti-join those
    positions on (doc, position) — the doc-id pre-partition makes
    the token side exchange-free — and each document reassembles
    with one bounded per-doc sort (same per-document size assumption
    as every per-doc operator here; no driver collection anywhere).
    The keep-first exemption adds one min-struct aggregate on the
    SAME gram key the dup filter already shuffled on (co-partitioned
    — no extra exchange), never a window over all occurrences.
    """
    from pyspark.sql import Window  # noqa: F401  (parity with spans)

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    toks = tokens(F.col(text_col))
    base = (
        df.repartition(n_parts, F.col(id_col))
        .select(F.col(id_col), toks.alias("__toks"))
        .select(id_col, "__toks", F.size("__toks").cast("long").alias("n_tokens"))
    )
    grams = base.filter(F.col("n_tokens") >= k).select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), (F.col("n_tokens") - k).cast("int")),
                lambda i: F.concat_ws(" ", F.slice("__toks", i + 1, k)),
            )
        ).alias("__start", "__gram"),
    )
    dup = (
        grams.groupBy("__gram")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("__gram")
    )
    occ = grams.join(dup, "__gram")
    if keep_first:
        # exempt the per-gram minimum (doc_id, start) occurrence;
        # min over a struct is lexicographic, so the exemption is the
        # paper's "keep the first occurrence" under the corpus total
        # order — one more agg + join on the already-shuffled gram key
        first = occ.groupBy("__gram").agg(
            F.min(F.struct(F.col(id_col), F.col("__start"))).alias("__f")
        )
        occ = occ.join(first, "__gram").filter(
            ~(
                (F.col(id_col) == F.col("__f")[id_col])
                & (F.col("__start") == F.col("__f")["__start"])
            )
        ).drop("__f")
    covered = (
        occ
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("__start"), F.col("__start") + (k - 1))
            ).alias("__pos"),
        )
        .distinct()
    )
    tok_rows = base.select(
        id_col, "n_tokens", F.posexplode("__toks").alias("__pos", "__tok")
    )
    kept = tok_rows.join(covered, [id_col, "__pos"], "left_anti")
    rebuilt = kept.groupBy(id_col, "n_tokens").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept_tokens"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__pos"), F.col("__tok")))
                ),
                lambda s: s["__tok"],
            ),
        ).alias("text_dedup"),
    )
    # docs whose every token is covered vanish from `kept`; restore
    # them with an empty rewrite so the output is total
    return (
        base.select(id_col, "n_tokens")
        .join(rebuilt, [id_col, "n_tokens"], "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("n_kept_tokens", F.lit(0)).cast("long").alias(
                "n_kept_tokens"
            ),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """Okapi BM25 lexical ranking of documents against a fixed query
    term set (Robertson et al.; Lucene's ``ln(1 + (N-df+0.5)/(df+0.5))``
    idf variant) — the retrieval twin of the embedding cosine top-k,
    and the standard first stage of hybrid (lexical+vector) search.

    Distributed shape — what survives 100 TB:
    - corpus stats (N, avgdl) come from ONE slim aggregate (two longs),
      broadcast-cross-joined back (a 1-row broadcast, not a collect);
    - per-token work filters the token ARRAY to the query vocabulary
      BEFORE exploding, so the explode emits only query-term hits
      (|hits| rows, not |tokens| rows);
    - document frequency is a tiny per-term aggregate (≤ |query| rows)
      broadcast back into the scoring join;
    - the final global top-k is `orderBy().limit(k)` which Spark
      executes as per-partition top-k + single k-row merge
      (TakeOrderedAndProject) — the score table never collects.

    Per-term scores are rounded to 9 decimals and summed in
    DECIMAL(28,9) so the per-document sum is independent of partition
    merge order (exact cross-engine hash parity).
    """
    qset = F.array(*[F.lit(t) for t in query_terms])
    base = df.select(
        id_col, tokens(F.col(text_col)).alias("__toks")
    ).select(
        id_col,
        F.size("__toks").alias("dl"),
        F.filter(F.col("__toks"), lambda x: F.array_contains(qset, x)).alias(
            "__hits"
        ),
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        base.filter(F.size("__hits") > 0)
        .select(id_col, "dl", F.explode("__hits").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "__score_t",
            F.col("__idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
        F.round(
            F.sum(F.round(F.col("__score_t"), 9).cast("decimal(28,9)")).cast(
                "double"
            ),
            6,
        ).alias("bm25"),
    )
    return per_doc.orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    ).limit(top_k)


def nb_classify(
    train: DataFrame,
    test: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Multinomial naive-Bayes text classifier, trained and applied
    in-engine — the fastText-style model-based curation filter slot
    (quality/domain classifiers run after the rule gates; public
    algorithm, McCallum & Nigam 1998). Laplace-``alpha`` smoothing
    over the TRAINING vocabulary; test tokens outside it are dropped
    (standard NB convention).

    Distributed shape: training is two combiner aggs — (label, term)
    counts and label totals/priors — densified to the |labels|×|V|
    log-prob table (labels are few; the table is vocab-bounded and
    map-side joinable). Scoring filters each test doc's token array
    to the vocabulary BEFORE exploding, joins term log-probs
    (|hits|×|labels| rows), and takes one decimal-exact sum + argmax
    per (doc, label) — never a dense doc×vocab product. Ties break
    on the label string ascending.

    Exactness: log-probs round to 9 decimals; per-doc sums accumulate
    in DECIMAL(28,9) (order-independent); the argmax compares rounded
    decimal scores — an oracle replays every step bit-for-bit.

    Output: one row per test doc THAT HAS at least one in-vocabulary
    token — (id, label_pred, winning rounded log-score ``nb_score``).
    A doc of only OOV tokens produces no row (all its evidence was
    dropped); callers needing total coverage should coalesce missing
    ids to the prior argmax.
    """
    toks = tokens(F.col(text_col))
    tr = train.select(
        F.col(label_col).alias("__lab"), F.explode(toks).alias("term")
    )
    counts = tr.groupBy("__lab", "term").agg(
        F.count(F.lit(1)).alias("__c")
    )
    lab_tot = counts.groupBy("__lab").agg(F.sum("__c").alias("__tot"))
    vocab = counts.select("term").distinct()
    vsz = vocab.agg(F.count(F.lit(1)).alias("__v"))
    n_docs = train.groupBy(F.col(label_col).alias("__lab")).agg(
        F.count(F.lit(1)).alias("__nd")
    )
    n_all = train.agg(F.count(F.lit(1)).alias("__n"))
    # dense (label, term) log-prob table: ln((c+α)/(tot+α·V))
    dense = (
        lab_tot.join(vocab)
        .join(counts, ["__lab", "term"], "left")
        .join(F.broadcast(vsz))
        .select(
            "__lab",
            "term",
            F.round(
                F.log(
                    (F.coalesce("__c", F.lit(0)) + F.lit(alpha))
                    / (F.col("__tot") + F.lit(alpha) * F.col("__v"))
                ),
                9,
            ).cast("decimal(28,9)").alias("__lp"),
        )
    )
    priors = (
        n_docs.join(F.broadcast(n_all))
        .select(
            "__lab",
            F.round(
                F.log(F.col("__nd").cast("double") / F.col("__n")), 9
            ).cast("decimal(28,9)").alias("__prior"),
        )
    )
    hits = test.select(
        F.col(id_col), F.explode(toks).alias("term")
    ).join(F.broadcast(vocab), "term", "left_semi")
    scores = (
        hits.join(F.broadcast(dense), "term")
        .groupBy(id_col, "__lab")
        .agg(F.sum("__lp").alias("__s"))
        .join(F.broadcast(priors), "__lab")
        .select(
            id_col,
            "__lab",
            # re-cast the (38,9) sum to (28,9) BEFORE adding: Spark
            # resolves (38,9)+(28,9) by dropping the scale to 8
            (
                F.col("__s").cast("decimal(28,9)") + F.col("__prior")
            ).cast("decimal(28,9)").alias("__score"),
        )
    )
    # argmax with min-label tie-break: lexicographic min of
    # (-score, label) — decimal negation is exact
    w_best = scores.groupBy(id_col).agg(
        F.min(
            F.struct(
                (-F.col("__score")).alias("__neg"), F.col("__lab").alias("__l")
            )
        ).alias("__b")
    )
    return w_best.select(
        id_col,
        F.col("__b.__l").alias("label_pred"),
        F.round((-F.col("__b.__neg")).cast("double"), 6).alias("nb_score"),
    )


def query_likelihood_rank(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    mu: float = 2000.0,
    top_k: int = 20,
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty
    2001 — the language-modeling retrieval baseline, BM25's standard
    fusion partner): ``score(q,d) = Σ_t ln((tf_{t,d} + μ·P(t|C)) /
    (|d| + μ))``. Query terms absent from the corpus (P(t|C)=0, a
    −∞ contribution for every document equally) are dropped from the
    query, the usual OOV convention.

    Distributed shape — every document gets a score WITHOUT an
    all-(term, doc) product: the score decomposes as
    ``Σ_t ln(μP_t)  −  |q|·ln(|d|+μ)  +  Σ_{t∈hits}[ln(tf+μP_t) −
    ln(μP_t)]`` — a query-level constant (1-row agg over the ≤|q|
    term table, broadcast), a per-doc projection of the doc length,
    and hit-only adjustment rows. Token arrays filter to the query
    vocabulary BEFORE exploding (|hits| rows, not |tokens|); corpus
    stats are one slim agg. Per-term contributions round to 9
    decimals into DECIMAL(28,9) sums, so the score is independent of
    partition merge order (exact cross-engine parity).
    """
    qset = F.array(*[F.lit(t) for t in query_terms])
    base = df.select(
        id_col, tokens(F.col(text_col)).alias("__toks")
    ).select(
        id_col,
        F.size("__toks").cast("long").alias("dl"),
        F.filter(F.col("__toks"), lambda x: F.array_contains(qset, x)).alias(
            "__hits"
        ),
    )
    stats = base.agg(F.sum("dl").alias("__total"))
    hits = base.filter(F.size("__hits") > 0).select(
        id_col, F.explode("__hits").alias("term")
    )
    # corpus frequency of each query term (absent terms vanish here —
    # the OOV drop); P(t|C) = cf/total as one exact double division
    tt = (
        hits.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cf"))
        .join(F.broadcast(stats))
        .select(
            "term",
            (F.col("cf").cast("double") / F.col("__total")).alias("__p"),
        )
    )
    consts = tt.agg(
        F.sum(
            F.round(F.log(F.lit(mu) * F.col("__p")), 9).cast("decimal(28,9)")
        ).alias("__c0"),
        F.count(F.lit(1)).alias("__nq"),
    )
    tf = hits.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    adj = tf.join(F.broadcast(tt), "term").select(
        id_col,
        F.round(
            F.log(F.col("tf") + F.lit(mu) * F.col("__p"))
            - F.log(F.lit(mu) * F.col("__p")),
            9,
        ).cast("decimal(28,9)").alias("__adj"),
    )
    per_doc = adj.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
        F.sum("__adj").alias("__a"),
    )
    zero = F.lit(0).cast("decimal(28,9)")
    return (
        base.select(id_col, "dl")
        .join(per_doc, id_col, "left")
        .join(F.broadcast(consts))
        .select(
            id_col,
            F.coalesce("n_terms_matched", F.lit(0)).cast("long").alias(
                "n_terms_matched"
            ),
            # both operands sit on the 1e-9 grid, so the difference
            # is a grid POINT — round to 9 (exact), never to a coarser
            # grid whose midpoints the difference can land on exactly
            # (doc 428 at sf0.001 lands on -16.6604465, a round-6
            # midpoint the two engines break differently). The two
            # decimal sums are re-cast to (28,9) before adding:
            # (38,9)+(38,9) needs precision 39, which Spark resolves
            # by silently dropping the scale to 8 — losing the 9th
            # decimal this whole discipline exists to keep.
            F.round(
                (
                    F.col("__c0").cast("decimal(28,9)")
                    + F.coalesce("__a", zero).cast("decimal(28,9)")
                ).cast("double")
                - F.round(
                    F.col("__nq") * F.log(F.col("dl") + F.lit(mu)), 9
                ),
                9,
            ).alias("ql"),
        )
        .orderBy(F.col("ql").desc(), F.col(id_col).asc())
        .limit(top_k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) — the
    standard hybrid-retrieval combiner (lexical BM25 × vector ANN ×
    anything else that emits a ranking): ``fused(d) = Σ_i
    1/(k + rank_i(d))`` over every list containing d. Rank-based, so
    systems with incomparable score scales fuse without calibration.

    Distributed shape: union the (id, rank) lists (each already
    top-N-bounded by its producer — the input is |lists|·N rows, not
    corpus-sized), one hash agg for the fused sum, and a
    TakeOrderedAndProject top-k. Contributions round to 9 decimals
    into a DECIMAL(28,9) sum (order-independent, exact cross-engine);
    ties break on the id.
    """
    from functools import reduce

    tagged = reduce(
        lambda a, b: a.unionByName(b),
        [r.select(F.col(id_col), F.col(rank_col).alias("__r")) for r in rankings],
    )
    return (
        tagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lists"),
            # the decimal sum is on the 1e-9 grid — round to 9
            # (grid-exact), not coarser (midpoint hazard)
            F.round(
                F.sum(
                    F.round(
                        F.lit(1.0) / (F.lit(float(k)) + F.col("__r")), 9
                    ).cast("decimal(28,9)")
                ).cast("double"),
                9,
            ).alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(top_k)
    )


def top_pmi_bigrams(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Corpus-wide collocation extraction: top-k adjacent-token
    bigrams by pointwise mutual information,
    ``PMI(a,b) = ln(c_ab·T / (c_a·c_b))`` (Church & Hanks 1990) —
    phrase-mining / tokenizer-merge seeding over a training corpus.

    Distributed shape: bigram and unigram counts are two hash
    aggregates with map-side combine; the ``min_count`` support
    filter shrinks the bigram table BEFORE the two vocabulary joins
    (rare noise pairs — the vast majority at web scale — never reach
    a join); corpus total T is a 1-row broadcast. Bigram generation
    is pure column algebra (two `slice`+`zip_with` over the token
    array — the lambda touches only attribute inputs, keeping the
    operator O(len) per row under projection collapse).

    Deterministic order: PMI (rounded to 9) desc, bigram asc.
    """
    toks = df.select(tokens(F.col(text_col)).alias("__toks")).filter(
        F.size("__toks") >= 2
    )
    parts = toks.select(
        F.slice(F.col("__toks"), 1, F.size("__toks") - 1).alias("__a"),
        F.slice(F.col("__toks"), 2, F.size("__toks") - 1).alias("__b"),
        F.col("__toks"),
    )
    bigrams = (
        parts.select(
            F.explode(
                F.zip_with(
                    "__a", "__b", lambda a, b: F.concat(a, F.lit(" "), b)
                )
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    uni = (
        df.select(F.explode(tokens(F.col(text_col))).alias("__t"))
        .groupBy("__t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = uni.agg(F.sum("c").alias("t_tokens"))
    sp = F.split(F.col("bigram"), " ", 2)
    scored = (
        bigrams.withColumn("w1", sp.getItem(0))
        .withColumn("w2", sp.getItem(1))
        .join(
            F.broadcast(uni.select(F.col("__t").alias("w1"), F.col("c").alias("c_a"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("__t").alias("w2"), F.col("c").alias("c_b"))),
            "w2",
        )
        .join(F.broadcast(total))
        .withColumn(
            "__pmi",
            F.log(
                (F.col("c_ab").cast("double") * F.col("t_tokens"))
                / (F.col("c_a").cast("double") * F.col("c_b"))
            ),
        )
    )
    return (
        scored.select(
            "bigram",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.col("c_a").cast("long").alias("c_a"),
            F.col("c_b").cast("long").alias("c_b"),
            # + 0.0 canonicalizes IEEE -0.0 (round of a tiny negative
            # PMI) so cross-engine hashing can't split on zero's sign
            (F.round("__pmi", 6) + F.lit(0.0)).alias("pmi"),
        )
        .orderBy(F.round("__pmi", 9).desc(), F.col("bigram").asc())
        .limit(top_k)
    )


def source_token_kl(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source token-distribution divergence from the corpus:
    ``KL(P_s ‖ P_corpus) = Σ_t p_s(t)·ln(p_s(t)/p_c(t))`` — the
    data-mixing diagnostic (DoReMi / DSIR family): sources with high
    KL are lexically distinctive and get re-weighted when composing a
    training mix.

    Distributed shape: one explode feeds BOTH count tables
    ((source, term) and term marginals — the latter derived from the
    former, so the corpus is tokenized once); per-source and corpus
    totals are slim aggregates broadcast back; the per-term
    contribution is rounded to 9 decimals and summed in
    DECIMAL(28,9), making the reduction order-independent (exact
    cross-engine parity). Output is |sources| rows.

    KL here is always finite: every source term is a corpus term, so
    ``p_c(t) > 0`` wherever ``p_s(t) > 0``.
    """
    st = (
        df.select(group_col, F.explode(tokens(F.col(text_col))).alias("__t"))
        .groupBy(group_col, "__t")
        .agg(F.count(F.lit(1)).alias("c_st"))
    )
    term = st.groupBy("__t").agg(F.sum("c_st").alias("c_t"))
    s_tot = st.groupBy(group_col).agg(F.sum("c_st").alias("t_s"))
    grand = term.agg(F.sum("c_t").alias("t_all"))
    contrib = (
        st.join(F.broadcast(term), "__t")
        .join(F.broadcast(s_tot), group_col)
        .join(F.broadcast(grand))
        .withColumn(
            "__p_s", F.col("c_st").cast("double") / F.col("t_s")
        )
        .withColumn(
            "__p_c", F.col("c_t").cast("double") / F.col("t_all")
        )
        .withColumn(
            "__kl_t", F.col("__p_s") * F.log(F.col("__p_s") / F.col("__p_c"))
        )
    )
    return (
        contrib.groupBy(group_col)
        .agg(
            F.max("t_s").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_terms"),
            # + 0.0: a near-zero KL sum can round to IEEE -0.0, which
            # hashes differently from 0.0 cross-engine
            (
                F.round(
                    F.sum(
                        F.round(F.col("__kl_t"), 9).cast("decimal(28,9)")
                    ).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("kl_vs_corpus"),
        )
        .orderBy(group_col)
    )


def _apply_merges(col, pairs: list[str], joiner: str) -> Column:
    """Replay BPE merges in training order on a space-padded text
    column — THE one merge-application semantics, shared by training
    (:func:`bpe_merges` re-derives its working column through it each
    round) and serving (:func:`bpe_encode`), so the two sides cannot
    drift."""
    s = F.concat(F.lit(" "), col, F.lit(" "))
    for pair in pairs:
        s = F.replace(
            s,
            F.lit(f" {pair} "),
            F.lit(" " + pair.replace(" ", joiner) + " "),
        )
    return s


def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 3,
    joiner: str = "+",
) -> "DataFrame":
    """Fixed-iteration BPE merge training (Sennrich et al. 2016): per
    round, count all adjacent token pairs over the corpus, pick the
    most frequent (count desc, pair asc — deterministic), fuse it
    everywhere, repeat. Returns the merge table
    ``(step, pair, pair_count)`` — the artifact a tokenizer trainer
    persists; joins the engine's fixed-iteration family (PageRank,
    k-means Lloyd).

    Distributed shape per round: ONE pair-count hash aggregate with
    map-side combine (shuffle bounded by vocabulary², in practice the
    distinct-pair count) and a 1-row TakeOrdered collect — the corpus
    never leaves the cluster; the only driver data is the winning
    pair. Merge application is a literal space-delimited
    ``replace(' a b ', ' a+b ')`` over the padded text — leftmost
    non-overlapping WITH separator consumption, so a run like
    ``a a a a`` fuses to ``a+a a a`` (not textbook BPE's ``aa aa``);
    the deviation is deliberate: both engines implement the identical
    replace semantics, which keeps every round bit-reproducible and
    oracle-checkable, and token runs are vanishingly rare in real
    text.

    The working column re-derives from the ORIGINAL text each round
    via the accumulated merge list (a chain of n replaces — pure
    projection), so no intermediate corpus is persisted or shuffled.
    """
    merges: list[tuple[int, str, int]] = []

    def current(col):
        return _apply_merges(col, [p for _, p, _ in merges], joiner)

    for step in range(1, int(n_merges) + 1):
        toks = F.split(F.trim(current(F.col(text_col))), r"\s+")
        parts = df.select(toks.alias("__toks")).filter(
            F.size("__toks") >= 2
        ).select(
            F.slice(F.col("__toks"), 1, F.size("__toks") - 1).alias("__a"),
            F.slice(F.col("__toks"), 2, F.size("__toks") - 1).alias("__b"),
        )
        top = (
            parts.select(
                F.explode(
                    F.zip_with(
                        "__a", "__b", lambda a, b: F.concat(a, F.lit(" "), b)
                    )
                ).alias("pair")
            )
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        merges.append((step, top[0]["pair"], int(top[0]["c"])))

    return df.sparkSession.createDataFrame(
        [(s, p, c) for s, p, c in merges],
        "step int, pair string, pair_count long",
    )


def bpe_encode(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    joiner: str = "+",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Apply a trained BPE merge table (the output of
    :func:`bpe_merges`) to tokenize the corpus — the serving half of
    the tokenizer story (Sennrich et al. 2016 §3: merges learned once,
    then replayed in training order on any text). Returns per-document
    token accounting: ``(id..., n_base_tokens, n_bpe_tokens,
    n_fused_tokens, compression)`` where ``compression =
    n_base / n_bpe ≥ 1`` — the per-doc token-budget planner's input
    (how many sequence positions a document really costs after
    merging).

    Distributed shape: the merge table is collected ordered by step —
    it is the trained artifact a tokenizer SHIPS, bounded by
    ``n_merges`` rows regardless of corpus size — and replayed as a
    chain of literal ``replace`` projections, identical to the
    training-side application in :func:`bpe_merges`. The whole
    operator is ONE scan with zero shuffles (pure codegen
    projection); at 100 TB it parallelizes embarrassingly.

    ``compression`` rounds at 9 decimals: token counts are a few
    hundred at most, so the reduced denominator of the quotient never
    reaches the 2^10 needed to land exactly on a 1e-9 grid midpoint —
    both engines round the same IEEE double identically.
    """
    rows = merges.orderBy("step").collect()  # ≤ n_merges rows by construction
    s = _apply_merges(F.col(text_col), [r["pair"] for r in rows], joiner)
    toks = F.split(F.trim(s), r"\s+")
    base = F.split(F.trim(F.col(text_col)), r"\s+")
    return df.select(
        *id_cols,
        F.size(base).cast("long").alias("n_base_tokens"),
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.filter(toks, lambda x: x.contains(joiner)))
        .cast("long")
        .alias("n_fused_tokens"),
        F.round(F.size(base) / F.size(toks), 9).alias("compression"),
    )


def source_vocab_overlap(
    df: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Pairwise vocabulary Jaccard overlap between corpus sources —
    the data-mixing diagnostic that answers "which of my sources are
    near-copies of each other?" before choosing mixture weights
    (complements :func:`source_token_kl`, which compares each source
    to the corpus, not sources to each other). Returns one row per
    unordered source pair that shares at least one term:
    ``(source_a, source_b, vocab_a, vocab_b, n_shared, jaccard)``.

    Distributed shape: ONE tokenize feeds a distinct (source, term)
    table — bounded by |sources| x |vocab|, orders of magnitude
    smaller than the corpus, reached through a hash agg with partial
    combine — persisted across its three consumers (two self-join
    sides + per-source sizes). The self-join keys on the term, so
    per-key fan-out is at most |sources| rows a side (|sources|^2
    pairs per term) and the pair agg combines map-side down to at
    most |sources|^2/2 output rows. Size lookups are broadcast
    joins of |sources|-row tables. Nothing driver-side.
    """
    from maston_spark.caching import scoped_persist

    st = scoped_persist(
        df.select(
            F.col(source_col).alias("__src"),
            F.explode(tokens(F.col(text_col))).alias("__tok"),
        )
        .filter(F.col("__tok") != "")
        .distinct()
    )
    sizes = st.groupBy("__src").agg(
        F.count(F.lit(1)).cast("long").alias("vocab")
    )
    inter = (
        st.select(F.col("__src").alias("source_a"), "__tok")
        .join(st.select(F.col("__src").alias("source_b"), "__tok"), "__tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    return (
        inter.join(
            F.broadcast(
                sizes.select(
                    F.col("__src").alias("source_a"),
                    F.col("vocab").alias("vocab_a"),
                )
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("__src").alias("source_b"),
                    F.col("vocab").alias("vocab_b"),
                )
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "vocab_a",
            "vocab_b",
            "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def ccnet_buckets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): score
    every document with the corpus-trained bigram LM
    (:func:`bigram_lm_score`) and bucket by perplexity TERCILES —
    head = most fluent third (kept), middle (kept with caution),
    tail = most perplex third (dropped or down-weighted). The
    canonical CCNet curation gate, composed from two already-verified
    operators.

    Distributed shape: the LM scoring is the q96 plan (combiner
    count aggs + broadcast vocabulary stats); the tercile cut points
    come from :func:`maston_spark.relational.exact_percentiles`
    (distributed order statistics) and broadcast back as ONE row;
    the bucket label is a pure projection — no global sort, no
    single-partition window anywhere.
    """
    from maston_spark.relational import exact_percentiles

    scored = bigram_lm_score(df, id_col=id_col, text_col=text_col)
    edges = exact_percentiles(
        scored.select(F.lit(1).alias("__g"), "bits_per_bigram"),
        "__g",
        "bits_per_bigram",
        [1 / 3, 2 / 3],
        ["__e1", "__e2"],
    ).drop("__g")
    bucket = (
        F.when(F.col("bits_per_bigram") > F.col("__e2"), F.lit("tail"))
        .when(F.col("bits_per_bigram") > F.col("__e1"), F.lit("middle"))
        .otherwise(F.lit("head"))
    )
    return scored.join(F.broadcast(edges)).select(
        id_col, "n_bigrams", "bits_per_bigram", "ppl", bucket.alias("ccnet_bucket")
    )


def gopher_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_avg_token_len: float = 3.0,
    max_avg_token_len: float = 10.0,
    min_stopword_ratio: float = 0.02,
    max_top_bigram_frac: float = 0.08,
    max_dup_bigram_frac: float = 0.10,
) -> DataFrame:
    """Gopher-style quality-filter battery (Rae et al. 2021 app. A
    — public; thresholds adapted to this corpus's synthetic scale):
    every document gets a ``keep`` verdict plus the ordered list of
    rules it failed — token-count bounds, mean-word-length band,
    stopword floor, and the two repetition caps. The standard
    rule-based curation gate run before any model-based filter.

    Distributed shape: composes two already-verified one-scan
    operators (:func:`text_stats` — projection+agg only — and
    :func:`repetition_stats` — doc-id-pre-partitioned, exchange-free
    off one shuffle) with an id-keyed join; the verdict and reason
    list are pure projections. Docs with <2 tokens have no bigram
    stats; their repetition fractions coalesce to 0 (can't fail a
    repetition cap without bigrams).
    """
    s = text_stats(df.select(id_col, text_col), text_col).select(
        id_col, "n_tokens", "avg_token_len", "stopword_ratio"
    )
    r = repetition_stats(df, id_col=id_col, text_col=text_col).select(
        id_col, "top_bigram_frac", "dup_bigram_frac"
    )
    j = (
        s.join(r, id_col, "left")
        .withColumn("top_bigram_frac", F.coalesce("top_bigram_frac", F.lit(0.0)))
        .withColumn("dup_bigram_frac", F.coalesce("dup_bigram_frac", F.lit(0.0)))
    )
    reasons = F.filter(
        F.array(
            F.when(F.col("n_tokens") < min_tokens, F.lit("too_few_tokens")),
            F.when(F.col("n_tokens") > max_tokens, F.lit("too_many_tokens")),
            F.when(
                F.col("avg_token_len") < min_avg_token_len,
                F.lit("avg_token_len_low"),
            ),
            F.when(
                F.col("avg_token_len") > max_avg_token_len,
                F.lit("avg_token_len_high"),
            ),
            F.when(
                F.col("stopword_ratio") < min_stopword_ratio,
                F.lit("stopword_ratio_low"),
            ),
            F.when(
                F.col("top_bigram_frac") > max_top_bigram_frac,
                F.lit("top_bigram_frac_high"),
            ),
            F.when(
                F.col("dup_bigram_frac") > max_dup_bigram_frac,
                F.lit("dup_bigram_frac_high"),
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return j.select(
        id_col,
        "n_tokens",
        "avg_token_len",
        "stopword_ratio",
        "top_bigram_frac",
        "dup_bigram_frac",
        F.array_join(reasons, ",").alias("fail_reasons"),
        (F.size(reasons) == 0).alias("keep"),
    )


def strip_boilerplate_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_tokens: int = 5,
    min_docs: int = 3,
) -> DataFrame:
    """Frequent-prefix boilerplate removal (the anchored cousin of
    CCNet's shared-paragraph dedup, Wenzek et al. 2020 — crawls
    prepend the same cookie banner / license header to thousands of
    pages): any exact ``k_tokens``-token document prefix shared by at
    least ``min_docs`` documents is treated as boilerplate and
    stripped from every document carrying it. Returns
    ``(id, stripped, text_out)`` with ``stripped`` flagging affected
    docs; documents shorter than ``k_tokens`` pass through untouched.

    Distributed shape: ONE combiner-reduced groupBy over the k-token
    prefixes (each doc contributes exactly one row, so the agg input
    is |docs| rows, not corpus tokens) filtered by the document
    threshold, then one equi-join back on the prefix — no gram
    explosion (contrast :func:`exact_substring_spans`, the unanchored
    general case), no window, no driver state. The rewrite is a pure
    slice projection.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("__text"),
        toks.alias("__toks"),
    ).withColumn(
        "__prefix",
        F.when(
            F.size("__toks") >= k_tokens,
            F.array_join(F.slice("__toks", 1, k_tokens), " "),
        ),
    )
    frequent = (
        base.filter(F.col("__prefix").isNotNull())
        .groupBy("__prefix")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_docs)
        .select("__prefix", F.lit(True).alias("__hit"))
    )
    joined = base.join(frequent, "__prefix", "left")
    return joined.select(
        F.col("id").alias(id_col),
        F.coalesce(F.col("__hit"), F.lit(False)).alias("stripped"),
        F.when(
            F.col("__hit"),
            F.array_join(
                F.slice(
                    "__toks", k_tokens + 1, F.greatest(F.size("__toks") - k_tokens, F.lit(0))
                ),
                " ",
            ),
        )
        .otherwise(F.col("__text"))
        .alias("text_out"),
    )


def oov_rate(
    df: DataFrame,
    vocab_source: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Out-of-vocabulary audit: per source, the fraction of token
    OCCURRENCES not present in a reference vocabulary (the distinct
    tokens of ``vocab_source``, typically the train split) —
    ``(source, n_tokens, n_oov, oov_rate)``. The tokenizer/corpus QA
    gate run before mixing in a new crawl: a high OOV rate against
    the tokenizer-training corpus means the new source will shatter
    into byte-fallback garbage.

    Scale shape: the vocabulary reduces to a distinct-token table
    (combiner-reduced, |vocab| rows); corpus tokens aggregate to
    (source, token, count) — also combiner-reduced — before the
    vocab join, so the join input is bounded by |sources|×|vocab'|,
    never raw token occurrences. ``oov_rate`` is the raw IEEE
    quotient of two exact int64s.
    """
    vocab = (
        vocab_source.select(F.explode(tokens(F.col(text_col))).alias("__tok"))
        .filter(F.col("__tok") != "")
        .distinct()
    )
    tok_counts = (
        df.select(
            F.col(source_col).alias("__src"),
            F.explode(tokens(F.col(text_col))).alias("__tok"),
        )
        .filter(F.col("__tok") != "")
        .groupBy("__src", "__tok")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    # explicit broadcast: a freshly aggregated distinct-token frame has
    # no size statistics, and an unhinted vocab-shaped side may plan a
    # full shuffle (the q165 lesson — worth 3-4x at 10x data)
    marked = tok_counts.join(
        F.broadcast(vocab.withColumn("__in", F.lit(1))), "__tok", "left"
    )
    return (
        marked.groupBy("__src")
        .agg(
            F.sum("__c").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("__in").isNull(), F.col("__c")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            F.col("__src").alias(source_col),
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens")).alias("oov_rate"),
        )
    )


def vocab_richness_from_counts(
    counts: DataFrame,
    group_col: str = "group",
    count_col: str = "__c",
) -> DataFrame:
    """Closing math of the vocabulary-saturation family, shared by
    the batch operators AND the streaming monitor so the two paths
    cannot diverge (the cusum_from_counts discipline): from a
    per-(group, token) count table — one row per distinct token with
    its TOTAL count — emit per group ``(group, n_tokens, v_observed,
    n_singletons, n_doubletons, chao1, gt_unseen_mass,
    r1_adjusted)``: bias-corrected Chao1 richness
    ``V + n₁(n₁−1)/(2(n₂+1))`` (Chao 1984), the Good-Turing unseen
    probability mass ``n₁/N`` (Good 1953), and the GT singleton
    discount ``r₁* = 2·n₂/n₁`` — each an exact rational of integer
    frequency-of-frequency counts with one closing IEEE step
    (chao1 round 4, the ratios round 6; n₁ = 0 emits NULL
    r1_adjusted). The token identity never reaches this close —
    only its count — so the caller owns tokenization.

    Scale shape: ONE combiner-reduced aggregation over the count
    table (|vocab| rows in, |groups| rows out); the counts must be
    TRUE totals, not clamped — ``n_tokens = Σ count`` is part of
    the contract (a {1,2,≥3} clamp would halve state width but
    break it)."""
    agg = counts.groupBy(F.col(group_col).alias("group")).agg(
        F.sum(count_col).cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("v_observed"),
        F.sum((F.col(count_col) == 1).cast("long"))
        .cast("long")
        .alias("n_singletons"),
        F.sum((F.col(count_col) == 2).cast("long"))
        .cast("long")
        .alias("n_doubletons"),
    )
    n1 = F.col("n_singletons").cast("double")
    n2 = F.col("n_doubletons").cast("double")
    chao1 = F.col("v_observed").cast("double") + n1 * (n1 - 1.0) / (
        2.0 * (n2 + 1.0)
    )
    return agg.select(
        "group",
        "n_tokens",
        "v_observed",
        "n_singletons",
        "n_doubletons",
        F.round(chao1, 4).alias("chao1"),
        F.round(n1 / F.col("n_tokens").cast("double"), 6).alias(
            "gt_unseen_mass"
        ),
        F.when(
            F.col("n_singletons") > 0,
            F.round(F.lit(2.0) * n2 / n1, 6),
        ).alias("r1_adjusted"),
    ).orderBy("group")


def chao1_vocab_richness(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary-richness estimation per group — ``(group, n_tokens,
    v_observed, n_singletons, n_doubletons, chao1, gt_unseen_mass)``
    — the "how much vocabulary haven't we crawled yet" planning
    numbers: bias-corrected Chao1 species richness
    ``V + n₁(n₁−1)/(2(n₂+1))`` (Chao 1984; the n₂=0-safe form) and
    the Good-Turing unseen probability mass ``n₁/N`` (Good 1953) —
    both EXACT rationals of integer frequency-of-frequency counts
    with one closing IEEE division each, so the estimators grade
    cross-engine bit-for-bit. A corpus whose singleton share keeps
    growing is nowhere near vocabulary saturation; one whose
    gt_unseen_mass ≈ 0 has been crawled to exhaustion — the
    diminishing-returns signal a crawl budget reads.

    Scale shape: one combiner-reduced (group, token) frequency
    aggregation (the shuffle carries the vocabulary, never the
    corpus), then :func:`vocab_richness_from_counts` — the shared
    |vocab|-bounded frequency-of-frequencies close the streaming
    saturation monitor folds over its durable state."""
    tf = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy("g", "tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    return (
        vocab_richness_from_counts(tf, "g", "f")
        .drop("r1_adjusted")
        .withColumnRenamed("group", group_col)
        .orderBy(group_col)
    )


def readability_scores(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Flesch reading-ease per group from corpus-level totals — one
    row ``(group, n_docs, n_sentences, n_words, n_syllables,
    words_per_sentence, syllables_per_word, flesch)`` with
    ``flesch = 206.835 − 1.015·(W/S) − 84.6·(Y/W)`` (Flesch 1948 /
    Kincaid 1975 coefficients as literals). The classic quality
    prior a curation mix reads beside the Gopher gate: very low
    scores flag legalese/boilerplate, impossibly high ones flag
    word-salad.

    Determinism: sentences = runs of ``[.!?]+`` clamped to ≥1 per
    doc (prose without terminal punctuation is one sentence, not
    zero); words = whitespace tokens; syllables ≈ vowel-group runs
    (the standard dictionary-free heuristic — counts [aeiouy]+
    runs, so 'beautiful' → 4 groups ≈ syllables) — all exact
    integer counts off ONE regexp projection per doc,
    combiner-reduced per group, with the closing Flesch expression
    a fixed IEEE tree (round 6). No per-word explode: the
    vowel-group count over the whole text equals the sum over words
    because whitespace never matches the vowel class."""
    t = F.col(text_col)
    sent = F.greatest(F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1))
    words = F.size(F.split(F.trim(t), r"\s+"))
    syll = F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+"))
    per_doc = df.filter(t.isNotNull() & (F.length(F.trim(t)) > 0)).select(
        F.col(group_col).alias("group"),
        sent.cast("long").alias("__s"),
        words.cast("long").alias("__w"),
        syll.cast("long").alias("__y"),
    )
    agg = per_doc.groupBy("group").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__s").cast("long").alias("n_sentences"),
        F.sum("__w").cast("long").alias("n_words"),
        F.sum("__y").cast("long").alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast("double")
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast("double")
    return agg.select(
        "group",
        "n_docs",
        "n_sentences",
        "n_words",
        "n_syllables",
        F.round(wps, 6).alias("words_per_sentence"),
        F.round(spw, 6).alias("syllables_per_word"),
        F.when(
            F.col("n_words") > 0,
            F.round(
                F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6
            ),
        ).alias("flesch"),
    ).orderBy("group")


def good_turing_unseen(df: DataFrame, item_col: str) -> DataFrame:
    """Good-Turing unseen-mass estimate over an item stream — one row
    ``(n_items, vocab, n_singletons, n_doubletons, p_unseen,
    r1_adjusted)``: the probability the NEXT observation is a
    never-seen item is the singleton share ``n₁/N`` (Good 1953), and
    the Good-Turing discounted count for singletons is
    ``r₁* = 2·n₂/n₁`` — the coverage planner beside Chao1 (q237 asks
    'how much MORE vocabulary exists'; this asks 'how often will the
    very next token be new', the number an OOV-rate budget needs
    before the crawl grows).

    Exact shape: one item-count aggregation, one frequency-of-
    frequencies aggregation (both combiner-reduced; the second is
    |distinct counts|-bounded), exact integer ratios with two IEEE
    closes (round 6). NULL items drop; n₁ = 0 emits NULL
    ``r1_adjusted`` (nothing to discount) and p_unseen 0."""
    counts = (
        df.filter(F.col(item_col).isNotNull())
        .groupBy(F.col(item_col).alias("__i"))
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    fof = counts.groupBy("__c").agg(
        F.count(F.lit(1)).cast("long").alias("__f")
    )
    agg = fof.agg(
        F.sum(F.col("__c") * F.col("__f")).cast("long").alias("n_items"),
        F.sum("__f").cast("long").alias("vocab"),
        F.coalesce(
            F.sum(F.when(F.col("__c") == 1, F.col("__f"))), F.lit(0)
        )
        .cast("long")
        .alias("n_singletons"),
        F.coalesce(
            F.sum(F.when(F.col("__c") == 2, F.col("__f"))), F.lit(0)
        )
        .cast("long")
        .alias("n_doubletons"),
    )
    n1 = F.col("n_singletons").cast("double")
    n2 = F.col("n_doubletons").cast("double")
    return agg.select(
        "n_items",
        "vocab",
        "n_singletons",
        "n_doubletons",
        F.round(n1 / F.col("n_items").cast("double"), 6).alias("p_unseen"),
        F.when(
            F.col("n_singletons") > 0, F.round(F.lit(2.0) * n2 / n1, 6)
        ).alias("r1_adjusted"),
    )


def rake_keyphrases(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: "tuple[str, ...] | None" = None,
    top_k: int = 20,
    max_phrase_len: int = 4,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) — the corpus
    top-k ``(phrase, n_words, support, score)``: candidate phrases
    are maximal runs of content tokens between stopword/punctuation
    breaks, each word scores ``degree/frequency`` over the phrase
    co-occurrence graph, and a phrase scores the sum of its word
    scores — the phrase-level vocabulary lens the token-level PMI/
    tf-idf family can't give (those rank WORDS and bigrams; this
    surfaces 'supply chain disruption' as one unit).

    Determinism: tokens lowercase and must match ``^[a-z]+$`` to be
    content words (digits/punctuation break phrases, like the
    stopword list — the engine's fixed deterministic list by
    default); word scores round to the micro grid AS RATIONALS
    (``(2·deg·10⁶ + freq) div (2·freq)``, nonneg), so phrase scores
    are exact integer sums of grid values and the top-k order
    (score desc, phrase asc) is engine-independent.

    Scale shape: runs are found with ONE per-document
    gaps-and-islands window (partitioned by doc — bounded by doc
    length, never corpus); word statistics are combiner-reduced
    aggs over phrase words; scoring re-joins the |phrase-vocab| word
    table; the top-k is a TakeOrdered. Runs longer than
    ``max_phrase_len`` drop (a degenerate stopword-free wall of text
    is not a keyphrase; the cap bounds the phrase-word explode)."""
    sw = tuple(stopwords) if stopwords is not None else STOPWORDS["en"]
    sw_arr = F.array(*[F.lit(s) for s in sw])
    toks = (
        docs.filter(F.col(text_col).isNotNull() & F.col(id_col).isNotNull())
        .select(
            F.col(id_col).alias("__doc"),
            # literal single-space split (the repo's vocab/chao1
            # tokenization convention): consecutive whitespace yields
            # empty/non-content tokens that OCCUPY a position and so
            # BREAK a phrase run — `\s+` instead kept runs adjacent
            # across multi-space gaps, diverging from the oracle
            # (round-14 ADVICE low)
            F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias(
                "__pos", "__tok"
            ),
        )
        .filter(
            F.col("__tok").rlike("^[a-z]+$")
            & ~F.array_contains(sw_arr, F.col("__tok"))
        )
    )
    wd = Window.partitionBy("__doc").orderBy("__pos")
    runs = toks.select(
        "__doc",
        "__pos",
        "__tok",
        (F.col("__pos") - F.row_number().over(wd)).alias("__run"),
    )
    phrases = (
        runs.groupBy("__doc", "__run")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__tok"))
                    ),
                    lambda s: s["__tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).cast("int").alias("n_words"),
        )
        .filter(F.col("n_words") <= int(max_phrase_len))
    )
    from maston_spark.caching import scoped_persist

    phrases = scoped_persist(phrases)
    words = phrases.select(
        "n_words", F.explode(F.split("phrase", " ")).alias("__w")
    )
    wstats = words.groupBy("__w").agg(
        F.count(F.lit(1)).cast("long").alias("__freq"),
        F.sum("n_words").cast("long").alias("__deg"),
    )
    wscore = wstats.select(
        "__w",
        F.expr("(2 * __deg * 1000000 + __freq) div (2 * __freq)").alias(
            "__ws"
        ),
    )
    distinct = phrases.groupBy("phrase", "n_words").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )
    scored = (
        distinct.select(
            "phrase",
            "n_words",
            "support",
            F.explode(F.split("phrase", " ")).alias("__w"),
        )
        .join(wscore, "__w")
        .groupBy("phrase", "n_words", "support")
        .agg(F.sum("__ws").alias("__score"))
    )
    return scored.select(
        "phrase",
        "n_words",
        "support",
        (F.col("__score").cast("double") / F.lit(1e6)).alias("score"),
    ).orderBy(F.desc("score"), F.asc("phrase")).limit(int(top_k))


def contamination_counts(
    df: DataFrame,
    benchmark_grams: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-group ADDITIVE contamination counters — ``(group, n_docs,
    n_grams, n_hits, n_docs_hit)`` — the fold-ready half of the
    contamination gate: every column is a plain sum, so batch
    counters union+sum into running totals exactly (the q272/q283
    counter discipline), while :func:`contamination_check`'s per-doc
    fractions do not fold. ``benchmark_grams`` is the distinct
    eval-set gram frame (one column ``__gram``) — an eval suite is
    tiny, so it broadcasts and the corpus grams never shuffle for
    the probe. Docs with fewer than ``n`` tokens have no grams and
    drop (the :func:`contamination_check` contract).

    Tokenization is the LITERAL single-space split (the rake
    convention), not the ``\\s+`` regex — DuckDB oracles replay it
    as ``string_split(text, ' ')`` with identical empty-token
    semantics on every input (tabs, double spaces), so the q303
    cross-engine parity is by construction, not corpus luck."""
    gram_expr = (
        f"explode(transform(sequence(0, size(__toks) - {n}), "
        f"i -> concat_ws(' ', slice(__toks, i + 1, {n}))))"
    )
    grams = (
        df.filter(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
        .select(
            F.col(group_col).alias("group"),
            F.col(id_col).alias("__id"),
            F.split(F.col(text_col), " ").alias("__toks"),
        )
        .filter(F.size("__toks") >= n)
        .select("group", "__id", F.expr(gram_expr).alias("__gram"))
        .distinct()
    )
    probed = grams.join(
        F.broadcast(benchmark_grams.withColumn("__hit", F.lit(1))),
        on="__gram",
        how="left",
    )
    per_doc = probed.groupBy("group", "__id").agg(
        F.count(F.lit(1)).cast("long").alias("__g"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("__h"),
    )
    return per_doc.groupBy("group").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__g").cast("long").alias("n_grams"),
        F.sum("__h").cast("long").alias("n_hits"),
        F.sum((F.col("__h") > 0).cast("long")).cast("long").alias(
            "n_docs_hit"
        ),
    )


def contamination_from_counts(counts: DataFrame) -> DataFrame:
    """Close the contamination gate over (possibly folded)
    :func:`contamination_counts` counters — per group ``(group,
    n_docs, n_grams, n_contaminated, n_docs_contaminated,
    gram_frac, doc_rate)``. Shared verbatim by the streaming
    contamination-gate topology and its q303 batch twin, so the two
    paths CANNOT diverge (the q283/q296 shared-close discipline).
    Fractions round at 6 off exact integer counters."""
    return counts.select(
        "group",
        "n_docs",
        "n_grams",
        F.col("n_hits").alias("n_contaminated"),
        F.col("n_docs_hit").alias("n_docs_contaminated"),
        F.when(
            F.col("n_grams") > 0,
            F.round(F.col("n_hits") / F.col("n_grams"), 6),
        ).alias("gram_frac"),
        F.when(
            F.col("n_docs") > 0,
            F.round(F.col("n_docs_hit") / F.col("n_docs"), 6),
        ).alias("doc_rate"),
    ).orderBy("group")
