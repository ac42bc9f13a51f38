"""Byte-pair encoding: distributed training + encoding for tokenizer prep.

BPE per Sennrich, Haddow & Birch, "Neural Machine Translation of Rare
Words with Subword Units" (ACL 2016): start from characters, repeatedly
merge the most frequent adjacent symbol pair.  The training loop runs on
the WEIGHTED DISTINCT-WORD table, never the corpus:

* :func:`bpe_train` — the corpus-sized step is one distributed
  ``explode(words) → groupBy(word).count()``; the merge loop then fits
  on the collected (word, freq) vocabulary at the driver — the same
  batch-kernel shape as iplom/ael mining (``operators/mine.py``):
  vocab is KB–MB when the corpus is natural text, and a ``vocab_cap``
  guard fails loudly before collecting a pathological one.  Distributed
  == sequential exactly (counts are exact; ties break deterministically
  by (-count, pair) so no partition order leaks in).
* :func:`bpe_encode` — encodes each DISTINCT word once (an Arrow
  pandas_udf with a per-batch memo over the deduped word table, cost
  ∝ |vocab| not |corpus|) and joins the segmentations back broadcast,
  then reassembles per-doc token sequences with native array ops.

Determinism: greedy merges with (-freq, pair) ordering; encoding applies
merges by ascending rank (the standard BPE apply rule), so Spark and
the pure-python mirror (tests) produce identical token streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logparser_spark.functions.text import tokens_expr

#: end-of-word marker appended to each word's final character (paper §3.2)
EOW = "</w>"


# -- pure-python kernel (used by the driver fit AND the encode UDF) ----------


def _word_syms(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + EOW,)


def fit_merges(word_freqs: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Greedy BPE fit over a weighted vocabulary (exact, deterministic).

    Pair counts are maintained incrementally per merge; ties break by
    lexicographic pair so the result is independent of dict order.
    """
    vocab = {_word_syms(w): f for w, f in word_freqs.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + f
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges by ascending rank until none applies (standard BPE)."""
    if not word:
        return []
    syms = list(_word_syms(word))
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


# -- distributed operators ----------------------------------------------------


def word_freq_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over the corpus — the only corpus-sized step of
    training; Spark's hash aggregate partial-combines per partition so
    the shuffle carries distinct words per task, not tokens."""
    return (
        docs.select(F.explode(tokens_expr(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    vocab_cap: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Distributed BPE training: exact word counts in Spark, greedy merge
    fit at the driver over the (capped) weighted vocabulary."""
    wf = word_freq_table(docs, text_col)
    if vocab_cap is not None:
        est = wf.agg(F.approx_count_distinct("word", 0.02).alias("n")).first()["n"]
        if est > vocab_cap:
            raise ValueError(
                f"bpe_train: ~{est:,} distinct words exceed vocab_cap="
                f"{vocab_cap:,} — the driver fit would collect them all. "
                "Pre-filter/normalize the corpus or raise vocab_cap."
            )
    freqs = {r["word"]: r["freq"] for r in wf.collect()}
    return fit_merges(freqs, n_merges)


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc BPE token sequences: (id, bpe_tokens array<string>, n_bpe).

    The python merge loop runs ONCE PER DISTINCT WORD (Arrow pandas_udf
    over the deduped word table — cost ∝ |vocab|, not corpus size), and
    the (word → segmentation) map joins back broadcast; per-doc
    reassembly is a native posexplode + flatten ordered by word
    position.  Words are never shipped to python twice.
    """
    from pyspark.sql.functions import pandas_udf

    ranks = {p: i for i, p in enumerate(merges)}

    @pandas_udf("array<string>")
    def seg(words):  # pd.Series -> pd.Series (scalar Arrow batches)
        memo: dict[str, list[str]] = {}

        def one(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                got = memo[w] = encode_word(w, ranks)
            return got

        return words.map(one)

    exploded = docs.select(
        id_col, F.posexplode(tokens_expr(text_col)).alias("pos", "word")
    )
    vocab = exploded.select("word").distinct().withColumn("_seg", seg("word"))
    return (
        exploded.join(F.broadcast(vocab), "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", F.col("_seg")))
                    ),
                    lambda s: s["_seg"],
                )
            ).alias("bpe_tokens")
        )
        .select(
            id_col,
            "bpe_tokens",
            F.size("bpe_tokens").cast("bigint").alias("n_bpe"),
        )
    )
