"""Text-analysis operators for training-data pipelines: token statistics,
quality scoring, language-ID heuristic, document fingerprinting.

All expressions are built-in ``pyspark.sql.functions`` (JVM-side, whole-stage
codegen) — the hot path never leaves the executor JVM, so throughput scales
with cores × partitions. Every operator has an exact DuckDB-SQL twin; the
only float ops are per-row divisions of integers (deterministic IEEE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A tiny per-language stopword marker set for the heuristic language guess.
# Deliberately simple/deterministic: the testdata's text is synthetic word
# salad, so this demonstrates the operator's plumbing, not linguistics.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of"),
    "es": ("el", "la", "los", "de"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "les", "des", "et"),
}


def _tokens(text_col: Column) -> Column:
    return F.filter(F.split(text_col, " "), lambda x: x != F.lit(""))


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_uniq, n_chars_seen, avg_token_len): whitespace + BPE-ish
    counting baseline. avg_token_len = int/int division (deterministic)."""
    toks = _tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.length(F.col(text_col)).alias("n_chars_seen"),
        (
            F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double")
            / F.size(toks)
        ).alias("avg_token_len"),
    )


def quality_expr(text_col: Column) -> Column:
    """The quality heuristic as a single COLUMN expression, so pipelines can
    filter on it inline (scan-side, no projection to (id, score) + semi-join
    back — r16: that join recomputed the whole upstream for the id side).
    Must stay the byte-exact expression ``quality_score`` rounds, or the two
    surfaces drift."""
    toks = _tokens(text_col)
    n = F.size(toks)
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n
    len_score = F.least(F.lit(1.0), n.cast("double") / F.lit(50.0))
    return F.round((uniq_ratio + len_score) / 2.0, 6)


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, uniq_ratio, len_score, quality): length/uniqueness-ratio quality
    heuristic (punctuation ratio omitted — the synthetic corpus has none;
    the ratio shape is what matters). All ratios are int/int divisions.
    ``quality`` must equal ``quality_expr`` exactly (shared subexpressions)."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n
    len_score = F.least(F.lit(1.0), n.cast("double") / F.lit(50.0))
    return df.select(
        F.col(id_col),
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(len_score, 6).alias("len_score"),
        quality_expr(F.col(text_col)).alias("quality"),
    )


def _marker_hits(text_col: Column, words: tuple[str, ...]) -> Column:
    """Occurrences of any marker word, counted by the padded-string trick
    ((len(s) - len(replace(s, m, ''))) / len(m)) — pure string ops, identical
    in DuckDB (no regex-engine divergence)."""
    padded = F.concat(F.lit(" "), text_col, F.lit(" "))
    total = F.lit(0).cast("bigint")
    for w in words:
        marker = f" {w} "
        total = total + (
            (F.length(padded) - F.length(F.replace(padded, F.lit(marker), F.lit(""))))
            / F.lit(len(marker))
        ).cast("bigint")
    return total


def lang_guess(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, lang_guess): argmax of per-language marker-word hit counts,
    'und' (undetermined) when all zero. Ties break by language order."""
    text = F.col(text_col)
    hits = {lang: _marker_hits(text, words) for lang, words in LANG_MARKERS.items()}
    best = F.lit("und")
    best_n = F.lit(0).cast("bigint")
    for lang, h in hits.items():
        better = h > best_n
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_n = F.when(better, h).otherwise(best_n)
    return df.select(F.col(id_col), best.alias("lang_guess"))


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, fp_norm, fp_shingle): two document fingerprints —
    md5 of the alnum-normalized text, and md5 of the sorted distinct token
    set (the key-collision / 'fingerprint clustering' variant)."""
    norm = F.md5(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""))
    shingle = F.md5(
        F.array_join(F.array_sort(F.array_distinct(_tokens(F.col(text_col)))), " ")
    )
    return df.select(F.col(id_col), norm.alias("fp_norm"), shingle.alias("fp_shingle"))


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, top_word_ratio, dup_2gram_ratio): Gopher-style repetition
    signals for quality filtering — the fraction of the doc taken by its
    most frequent word, and the fraction of duplicated word 2-grams.

    dup_2gram_ratio is pure per-row array math (no shuffle); top_word_ratio
    needs the per-(doc, word) histogram, one explode + one shuffle keyed by
    doc id — partition-parallel at any corpus size. Ratios are int/int
    divisions rounded to 6 places (exact in both engines)."""
    toks = _tokens(F.col(text_col))
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks"))

    g2 = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.concat_ws(" ", F.element_at("toks", i), F.element_at("toks", i + 1)),
    )
    dup2 = F.when(
        F.size("toks") >= 2,
        F.round(
            (F.size(g2) - F.size(F.array_distinct(g2))).cast("double") / F.size(g2), 6
        ),
    ).otherwise(F.lit(0.0))
    per_row = base.select("id", F.size("toks").alias("n"), dup2.alias("dup_2gram_ratio"))

    counts = (
        base.select("id", F.explode("toks").alias("w"))
        .groupBy("id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("mx"))
    )
    return (
        per_row.join(counts, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.when(F.col("n") > 0, F.round(F.col("mx").cast("double") / F.col("n"), 6))
            .otherwise(F.lit(0.0))
            .alias("top_word_ratio"),
            "dup_2gram_ratio",
        )
    )


GOPHER_STOPWORDS = ("the", "a")


def gopher_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 10_000,
) -> DataFrame:
    """(id, n_tokens, r_len, r_word_len, r_stop, r_rep, keep): the
    Gopher-style document quality rules (Rae et al. 2021, §A1.1), each as
    its own boolean so a pipeline can audit WHICH rule dropped a document:

    - r_len       token count in [min_tokens, max_tokens]
    - r_word_len  mean word length in [3, 10] characters
    - r_stop      >= 2 stopword occurrences ("the"/"a" here — the corpus
                  vocabulary's function words)
    - r_rep       most frequent word takes <= 10% of the document
    - keep        all of the above

    Every rule is integer cross-multiplied (3*n <= sum_len, 10*max_c <= n)
    — no float ratios, so Spark and the SQL oracle agree bit-for-bit. All
    map-only except the per-(doc, word) histogram behind r_rep: one explode
    + one shuffle keyed by doc id, partition-parallel at any corpus size
    (same shape as repetition_stats)."""
    toks = _tokens(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("t"), toks.alias("toks")
    )
    sum_len = F.aggregate(
        F.transform(F.col("toks"), F.length),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    per_row = base.select(
        "id",
        F.size("toks").alias("n"),
        sum_len.alias("sl"),
        _marker_hits(F.col("t"), GOPHER_STOPWORDS).alias("sh"),
    )
    counts = (
        base.select("id", F.explode("toks").alias("w"))
        .groupBy("id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("mx"))
    )
    j = per_row.join(counts, "id", "left").na.fill({"mx": 0})
    r_len = (F.col("n") >= min_tokens) & (F.col("n") <= max_tokens)
    r_word_len = (3 * F.col("n") <= F.col("sl")) & (F.col("sl") <= 10 * F.col("n"))
    r_stop = F.col("sh") >= 2
    r_rep = 10 * F.col("mx") <= F.col("n")
    return j.select(
        F.col("id").alias(id_col),
        F.col("n").cast("int").alias("n_tokens"),
        r_len.alias("r_len"),
        r_word_len.alias("r_word_len"),
        r_stop.alias("r_stop"),
        r_rep.alias("r_rep"),
        (r_len & r_word_len & r_stop & r_rep).alias("keep"),
    )


# Anchored, character-class-only patterns — identical semantics in Java
# regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround, no \w/\b.
EMAIL_PATTERN = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
PHONE_PATTERN = "[+][0-9]{1,2} [0-9]{3}-[0-9]{4}"


def redact_pii(
    df, id_col: str = "doc_id", text_col: str = "text"
) -> "DataFrame":
    """(id, n_emails, n_phones, redacted_md5): scrub emails then phone
    numbers to fixed tags, reporting match counts and the md5 of the
    scrubbed text (so full-string equality is checkable cheaply).

    Pure regexp_replace/regexp_count — JVM-side, whole-stage codegen; the
    100 TB path is a map-only scan with no shuffle at all."""
    text = F.col(text_col)
    n_emails = F.regexp_count(text, F.lit(EMAIL_PATTERN))
    cleaned1 = F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>")
    n_phones = F.regexp_count(cleaned1, F.lit(PHONE_PATTERN))
    cleaned2 = F.regexp_replace(cleaned1, PHONE_PATTERN, "<PHONE>")
    return df.select(
        F.col(id_col),
        n_emails.cast("int").alias("n_emails"),
        n_phones.cast("int").alias("n_phones"),
        F.md5(cleaned2).alias("redacted_md5"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size token-window chunking with overlap — the standard
    long-document split for training pipelines. One output row per chunk:
    (id, chunk_id, n_tokens, chunk_text), chunk_id 0-based in document
    order; stride = chunk_tokens - overlap; the FIRST chunk that reaches the
    document's end is the last (no fully-redundant tail chunks); empty docs
    emit nothing.

    Map-only: tokenize, generate the start-offset sequence, filter redundant
    tails, slice + re-join per start — one projection inside whole-stage
    codegen, zero shuffles, linear in corpus size. Engine-portable: 1-based
    offsets, pure integer arithmetic, mirrored by DuckDB list slicing."""
    if chunk_tokens < 1 or not (0 <= overlap < chunk_tokens):
        raise ValueError(
            f"need chunk_tokens >= 1 and 0 <= overlap < chunk_tokens, "
            f"got {chunk_tokens}, {overlap}"
        )
    stride = chunk_tokens - overlap
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    # starts: 1, 1+stride, ... ; keep a non-first start only if the previous
    # chunk did not already cover the document's end
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride)),
        lambda s: (s == 1) | (s - stride + (chunk_tokens - 1) < n),
    )
    return (
        df.select(F.col(id_col).alias("id"), toks.alias("__toks"), starts.alias("__starts"))
        .filter(F.size("__toks") > 0)
        .select("id", F.posexplode("__starts").alias("chunk_id", "__start"), "__toks")
        .select(
            "id",
            "chunk_id",
            F.size(F.slice("__toks", F.col("__start"), chunk_tokens)).alias("n_tokens"),
            F.array_join(
                F.slice("__toks", F.col("__start"), chunk_tokens), " "
            ).alias("chunk_text"),
        )
    )


# ---------------------------------------------------------------------------
# BPE application (the encode side of tokenizer training; the training loop
# itself lives in queries/text_stats.py where its DuckDB oracle is).
# ---------------------------------------------------------------------------


def _sql_quote(s: str) -> str:
    """Escape a symbol for splicing into a Spark SQL string literal —
    backslashes BEFORE quotes (Spark's default parser treats backslash as an
    escape inside literals; the reverse order would re-escape the quote
    escapes)."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def bpe_split_expr(word_col: str = "w") -> Column:
    """Character-split a word column into its initial BPE symbol array."""
    return F.expr(
        f"transform(sequence(1, length({word_col})), i -> substr({word_col}, i, 1))"
    )


def bpe_encode_expr(sym_col: str, merges: list[tuple[str, str]]) -> Column:
    """Apply an ORDERED list of learned BPE merge rules to a symbol-array
    column as nested JVM ``aggregate`` folds — ONE map-only projection, no
    shuffle, no Python in the loop. Each fold is a single left-to-right
    greedy pass (run overlaps resolved leftmost-first: 'aaaa' under (a,a)
    -> 'aa','aa'), which is exactly the semantics the training loop in
    ``queries/text_stats.py`` counts pairs under, and which its oracle's
    gaps-and-islands parity formulation replays without recursion.

    Scale shape: cost is O(symbols × rules) pure JVM expression work per
    row; at 100 TB the caller should apply this to the DISTINCT word
    vocabulary and join token counts back to the corpus, never re-encode
    every occurrence (see text_bpe_encode)."""
    expr = sym_col
    for left, right in merges:
        lq, rq, mq = _sql_quote(left), _sql_quote(right), _sql_quote(left + right)
        expr = f"""aggregate({expr}, cast(array() as array<string>), (acc, x) ->
              CASE WHEN size(acc) > 0
                        AND element_at(acc, -1) = '{lq}' AND x = '{rq}'
                   THEN concat(slice(acc, 1, size(acc) - 1), array('{mq}'))
                   ELSE concat(acc, array(x)) END)"""
    return F.expr(expr)


def canonical_url(url: Column) -> Column:
    """Canonicalize a URL for dedup (the Common-Crawl-style normalize pass
    that runs before URL-level dedup and host-level corpus stats): drop the
    #fragment, lowercase scheme and host, strip one leading 'www.', drop
    the scheme-default port (https:443 / http:80), drop utm_* tracking
    params (the order of surviving params is preserved), and strip trailing
    slashes from the path. Built from split_part / regexp_replace /
    higher-order filter only, so the whole normalization is ONE map-only
    projection inside whole-stage codegen — no UDF, no shuffle — and the
    DuckDB oracle mirrors it call-for-call."""
    u = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.split_part(u, F.lit("://"), F.lit(1)))
    rest = F.split_part(u, F.lit("://"), F.lit(2))
    hostport = F.split_part(rest, F.lit("/"), F.lit(1))
    pathq = F.substr(rest, F.length(hostport) + F.lit(1))
    host = F.regexp_replace(
        F.lower(F.split_part(hostport, F.lit(":"), F.lit(1))), r"^www\.", ""
    )
    port = F.split_part(hostport, F.lit(":"), F.lit(2))
    default_port = (
        F.when(scheme == "https", F.lit("443"))
        .when(scheme == "http", F.lit("80"))
        .otherwise(F.lit(""))
    )
    portpart = F.when(
        (port == "") | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_replace(F.split_part(pathq, F.lit("?"), F.lit(1)), "/+$", "")
    q = F.split_part(pathq, F.lit("?"), F.lit(2))
    q_clean = F.array_join(
        F.filter(F.split(q, "&"), lambda p: F.substring(p, 1, 4) != F.lit("utm_")),
        "&",
    )
    qpart = F.when(q_clean == "", F.lit("")).otherwise(F.concat(F.lit("?"), q_clean))
    return F.concat(scheme, F.lit("://"), host, portpart, path, qpart)
