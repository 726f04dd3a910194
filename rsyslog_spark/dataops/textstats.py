"""Text analysis for training-data curation: language-ID, quality
scoring, token counting, document fingerprinting.

All pure Column expressions (whole-stage codegen; zero Python). Each is
the deterministic skeleton of the production heuristic: the stopword
lists / weights are data, not code — swap in real tables via broadcast
without touching the operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# top-20 function words per language (standard public frequency lists;
# still data-not-code — swap for full tables via broadcast)
STOPWORDS = {
    "en": ["the", "of", "and", "a", "to", "in", "is", "it", "you",
           "that", "was", "for", "on", "are", "with", "as", "at", "be",
           "this", "have"],
    "es": ["de", "la", "que", "el", "en", "y", "a", "los", "se", "del",
           "las", "un", "por", "con", "no", "una", "su", "para", "es",
           "al"],
    "fr": ["de", "la", "le", "et", "les", "des", "en", "un", "du",
           "une", "que", "est", "pour", "qui", "dans", "a", "par",
           "plus", "pas", "au"],
    "de": ["der", "die", "und", "in", "den", "von", "zu", "das", "mit",
           "sich", "des", "auf", "ist", "im", "dem", "nicht",
           "ein", "eine", "als", "auch"],
}


def _toks(text_col: str) -> Column:
    return F.split(F.lower(F.col(text_col)), " +")


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds hit-count columns ``score_<lang>`` per language."""
    toks = _toks(text_col)
    for lang, words in STOPWORDS.items():
        hits = F.size(
            F.filter(toks, lambda t: t.isin(words))
        )
        df = df.withColumn(f"score_{lang}", hits)
    return df


def lang_id(df: DataFrame, text_col: str = "text",
            out: str = "lang_pred") -> DataFrame:
    """Predicted language = argmax stopword-hit rate; 'und' when no
    list scores > 0. Ties break by language code order (deterministic).
    """
    df = lang_scores(df, text_col)
    langs = sorted(STOPWORDS)
    # CASE chain over sorted langs picking the FIRST language whose
    # score equals the max — portable argmax with deterministic ties
    score_cols = [F.col(f"score_{lg}") for lg in langs]
    mx = F.greatest(*score_cols)
    pred = F.lit("und")
    for lg in reversed(langs):
        pred = F.when(
            (mx > 0) & (F.col(f"score_{lg}") == mx), F.lit(lg)
        ).otherwise(pred)
    return df.withColumn(out, pred)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a
    composite score in [0,1] (rounded to 4): the standard cheap
    pre-filters of a pretraining pipeline (C4-style heuristics)."""
    toks = _toks(text_col)
    n_chars = F.length(F.col(text_col))
    n_toks = F.size(toks)
    mean_tok = F.round(n_chars / F.greatest(n_toks, F.lit(1)), 4)
    non_alpha = F.length(
        F.regexp_replace(F.col(text_col), "[A-Za-z ]", "")
    )
    punct_ratio = F.round(non_alpha / F.greatest(n_chars, F.lit(1)), 4)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS["en"])))
    stop_ratio = F.round(stop_hits / F.greatest(n_toks, F.lit(1)), 4)
    length_ok = (n_chars >= 50) & (n_chars <= 100000)
    raw = (
        F.when(length_ok, 0.4).otherwise(0.0)
        + (1.0 - F.least(punct_ratio * 2, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3
    )
    # explicit HALF_UP via floor(x*1e4+0.5): the weighted sum of
    # 4-decimal ratios frequently lands EXACTLY on the 5th decimal, and
    # engines disagree on tie direction (Spark HALF_UP vs DuckDB's
    # banker-ish round) — pin the rule instead
    score = F.floor(raw * 10000 + 0.5) / 10000
    return (
        df.withColumn("n_tokens", n_toks.cast("long"))
        .withColumn("mean_tok_len", mean_tok)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stop_ratio", stop_ratio)
        .withColumn("quality", score)
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate
    (sum over words of ceil(len/4) — the usual chars/4 rule applied
    per word so whitespace never counts)."""
    toks = _toks(text_col)
    ws = F.size(toks).cast("long")
    bpe = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("long"),
    )
    return df.withColumn("ws_tokens", ws).withColumn("bpe_tokens", bpe)


def fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram: int = 8,
    keep: int = 4,
) -> DataFrame:
    """Min-k content fingerprint: the ``keep`` smallest md5 hashes of
    character ``gram``-grams, concatenated in order — a winnowing-style
    signature robust to small edits. (id, fp)."""
    pos = F.explode(
        F.sequence(
            F.lit(1),
            F.greatest(F.length(F.col(text_col)) - gram + 1, F.lit(1)),
        )
    ).alias("p")
    grams = df.select(F.col(id_col).alias("id"), F.col(text_col), pos).select(
        "id", F.md5(F.expr(f"substring({text_col}, p, {gram})")).alias("h")
    ).distinct()
    w = Window.partitionBy("id").orderBy("h")
    topk = grams.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= keep
    )
    return (
        topk.groupBy("id")
        .agg(F.sort_array(F.collect_list("h")).alias("hs"))
        .select("id", F.concat_ws("", "hs").alias("fp"))
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    Table A1 repetition filters), re-derived for single-line word-stream
    documents — (id, top_tok_frac, top2gram_char_frac,
    dup5gram_char_frac):

    - top_tok_frac: occurrences of the most frequent token / total
      tokens (Gopher cuts at > 0.2 for the most common *word*).
    - top2gram_char_frac: characters covered by the most frequent token
      2-gram (count x its non-space length) / total non-space
      characters; ties break (count desc, gram asc) so the value is
      deterministic.
    - dup5gram_char_frac: sum over token 5-grams occurring >= 2 times of
      count x non-space length, / total non-space characters.
      Overlapping occurrences each count (the cheap upper-bound form;
      can exceed 1 — it is a filter signal, not a probability).

    Tokenization is the corpus convention (split on single spaces,
    matching dedup.shingles). Grams shorter than the doc allow: docs
    with < 2 (< 5) tokens score 0.0 on the 2-gram (5-gram) signal.

    Scale shape: ONE mapInPandas pass, per-doc bounded state, zero
    shuffle — the same reasoning as dedup.shingles (a per-doc Counter
    beats exploding token x1 rows into two groupBy shuffles per
    signal at 10^12 docs).
    """
    import pandas as pd
    from collections import Counter

    id_type = df.schema[id_col].dataType.simpleString()

    def _stats(t: str) -> tuple:
        toks = (t or "").split(" ")
        total_chars = sum(len(x) for x in toks)
        if not toks or total_chars == 0:
            return 0.0, 0.0, 0.0
        tok_c = Counter(toks)
        top_tok = max(tok_c.values()) / len(toks)
        g2 = 0.0
        if len(toks) >= 2:
            c2 = Counter(
                " ".join(toks[j:j + 2]) for j in range(len(toks) - 1)
            )
            g, n = min(c2.items(), key=lambda kv: (-kv[1], kv[0]))
            g2 = n * (len(g) - 1) / total_chars
        g5 = 0.0
        if len(toks) >= 5:
            c5 = Counter(
                " ".join(toks[j:j + 5]) for j in range(len(toks) - 4)
            )
            g5 = sum(
                n * (len(g) - 4)
                for g, n in c5.items() if n >= 2
            ) / total_chars
        # no rounding: every term is an exact-int product/ratio, so the
        # IEEE doubles are bit-identical across engines; the comparison
        # layer canonicalizes to 6 dp on both sides
        return top_tok, g2, g5

    def _gen(pdfs):
        for pdf in pdfs:
            ids, a, b, c = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                tt, t2, d5 = _stats(t)
                ids.append(i)
                a.append(tt)
                b.append(t2)
                c.append(d5)
            yield pd.DataFrame({
                "id": ids, "top_tok_frac": a,
                "top2gram_char_frac": b, "dup5gram_char_frac": c,
            })

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        _gen,
        f"id {id_type}, top_tok_frac double, "
        "top2gram_char_frac double, dup5gram_char_frac double",
    )


def vocab_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int | None = None,
) -> DataFrame:
    """Corpus vocabulary table: (token, tf, df) — total occurrences and
    document frequency; with ``top_k``, the k most frequent tokens with
    a dense 1-based rank (ties by token, deterministic) for Zipf
    inspection.

    Scale shape — the skew-safe two-level wordcount: explode tokens ->
    groupBy(doc, token) (one shuffle, map-side combined, bounded per-doc
    state) -> groupBy(token) summing tf and counting rows for df (second
    shuffle over the already-collapsed (doc,token) frame). A single
    groupBy(token) with count_distinct(doc) would carry per-token doc
    sets through the shuffle — the two-level form keeps every
    aggregation state O(1). top_k is a sort+limit (Spark executes it as
    a per-partition TakeOrdered + driver merge, no full sort)."""
    toks = F.split(F.col(text_col), " ")
    per_doc = (
        df.select(F.col(id_col).alias("_d"), F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("_d", "token")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    stats = per_doc.groupBy("token").agg(
        F.sum("_c").alias("tf"),
        F.count(F.lit(1)).alias("df"),
    )
    if top_k is None:
        return stats
    top = stats.orderBy(F.desc("tf"), F.asc("token")).limit(top_k)
    w = Window.orderBy(F.desc("tf"), F.asc("token"))
    # rank window runs on the k-row result only — single tiny partition
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "token", "tf", "df"
    )
