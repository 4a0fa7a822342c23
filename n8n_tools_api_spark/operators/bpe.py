"""BPE merge learning — the tokenizer-training stage of a pretraining
pipeline, distributed the way the public recipe factors (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword
Units"; kept by GPT-2's byte-level variant): the corpus-scale job is
the WORD-FREQUENCY aggregation (one groupBy over every token in the
corpus — at 100 TB this is the shuffle that matters and it is a plain
map-side-combined count); merge learning then iterates over the
resulting vocabulary table, which is many orders of magnitude smaller
than the corpus but still distributed here (a web-scale vocab has
hundreds of millions of types — too big to collect, cheap to keep as a
DataFrame).

Pinned semantics (replayed exactly by the DuckDB oracle for a fixed
merge count):

* words are whitespace-split non-empty tokens, CASE PRESERVED; words
  containing the US delimiter (``\\x1f``, the symbol separator) are
  excluded from the vocabulary (documented guard — US never occurs in
  natural text);
* a word starts as its character sequence (unicode code points via
  ``substring`` — char semantics on both engines) plus the
  end-of-word marker ``</w>`` (the paper's convention, so merges can
  learn suffixes);
* each round counts ADJACENT SYMBOL PAIRS weighted by word frequency
  (exact BIGINT sums), picks the argmax with a total tie-break
  (count desc, then lexicographic (left, right)), and applies the
  merge to every word as a GREEDY LEFT-TO-RIGHT fold — the reference
  implementation's scan order: in ``aaaaa`` merging ``(a, a)`` yields
  ``aa aa a``. The fold is a string accumulator over the
  US-delimited symbol string (appending ``right`` to a merged
  accumulator IS the merge — no surgery), expressed as
  ``F.aggregate`` in Spark and ``list_reduce`` in DuckDB, verified to
  agree symbol-for-symbol;
* learning stops early when no pair reaches ``min_count`` (merging
  hapax pairs teaches nothing — the classic cutoff).

Scale shape: the corpus touches exactly one wide stage (the word
count). Every learning round is one map-side-combined pair-count
aggregation over SLIM (sym, freq) rows plus a single-row argmax; the
per-round best pair is collected to the driver (ONE bounded row per
round, the same budget as the components-loop convergence scalar —
operators/dedup.py:638) and folded back in as literals, so no
broadcast join is needed. Rounds are cut via RoundMaterializer
(local or reliable parquet) so round k never replays folds 1..k-1.
No UDFs anywhere — the fold is a codegen'd higher-order function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_US = "\x1f"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus-scale stage: (word, freq) over whitespace tokens."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = docs.select(
        F.explode(F.filter(F.split(F.trim(t), r"\s+"),
                           lambda w: w != "")).alias("word"))
    return (words.where(~F.col("word").contains(_US))
            .groupBy("word").agg(F.count("*").cast("bigint").alias("freq")))


def _initial_symbols(word: Column) -> Column:
    chars = F.transform(F.sequence(F.lit(1), F.length(word)),
                        lambda i: F.substring(word, i, 1))
    return F.concat(F.concat_ws(_US, chars), F.lit(_US + "</w>"))


def _apply_merge(sym_col: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of (left, right) over a US-delimited
    symbol string: when the accumulator's last symbol is ``left`` and
    the next symbol is ``right``, appending ``right`` WITHOUT a
    delimiter fuses them; otherwise append with the delimiter."""
    a, b = F.lit(left), F.lit(right)
    s = F.split(sym_col, _US)
    return F.aggregate(
        F.slice(s, 2, F.size(s) - 1), F.element_at(s, 1),
        lambda acc, x: F.when(
            (x == b) & ((acc == a) | acc.endswith(F.concat(F.lit(_US), a))),
            F.concat(acc, x),
        ).otherwise(F.concat(acc, F.lit(_US), x)))


def _pair_counts(words: DataFrame) -> DataFrame:
    s = F.split("sym", _US)
    # a fully merged word is ONE symbol; sequence(1, 0) would count
    # DOWN (the repo-documented Spark pitfall), so guard explicitly
    idxs = F.when(F.size(s) >= 2, F.sequence(F.lit(1), F.size(s) - 1)) \
            .otherwise(F.array().cast("array<int>"))
    pairs = words.select(
        "freq",
        F.explode(F.transform(
            idxs,
            lambda i: F.struct(F.element_at(s, i).alias("left"),
                               F.element_at(s, i + 1).alias("right")),
        )).alias("p"))
    return (pairs.groupBy("p.left", "p.right")
            .agg(F.sum("freq").cast("bigint").alias("pair_count")))


def bpe_learn(docs: DataFrame, n_merges: int, min_count: int = 2,
              text_col: str = "text",
              checkpoint_dir: str | None = None) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus (module docstring
    pins the semantics). Returns the merge table as a DataFrame:
    (rank, left, right, merged, pair_count), rank 0-based in learning
    order — the artifact a downstream tokenizer consumes."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    from n8n_tools_api_spark.operators.materialize import RoundMaterializer

    spark = docs.sparkSession
    mat = RoundMaterializer(checkpoint_dir)
    words = mat(
        word_frequencies(docs, text_col).select(
            "freq", _initial_symbols(F.col("word")).alias("sym")),
        "bpe_round0")
    merges: list[tuple[int, str, str, str, int]] = []
    prev_tag = "bpe_round0"
    for r in range(n_merges):
        best = (_pair_counts(words)
                .where(F.col("pair_count") >= min_count)
                .orderBy(F.desc("pair_count"), "left", "right")
                .limit(1).collect())  # ONE bounded row per round
        if not best:
            break  # no pair reaches min_count — classic early stop
        row = best[0]
        merges.append((r, row["left"], row["right"],
                       row["left"] + row["right"], row["pair_count"]))
        tag = f"bpe_round{r + 1}"
        words = mat(
            words.select(
                "freq",
                _apply_merge(F.col("sym"), row["left"], row["right"])
                .alias("sym")),
            tag)
        mat.release(prev_tag)
        prev_tag = tag
    return spark.createDataFrame(
        merges,
        "rank int, left string, right string, merged string, "
        "pair_count bigint")
