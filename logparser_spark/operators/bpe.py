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
  ∝ |vocab| not |corpus|) and joins the segmentations back (broadcast
  when the estimated vocab fits, shuffle join above ``broadcast_cap``),
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


def _fit_merges_naive(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Reference fit: recompute ALL pair counts every merge.

    O(n_merges × Σ|word|) — kept only as the property-test mirror for
    :func:`fit_merges`; never call it with a large merge count.
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


def fit_merges(word_freqs: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Greedy BPE fit over a weighted vocabulary (exact, deterministic).

    Incremental, as in the original subword-nmt implementation: pair
    counts and a pair→words inverted index are maintained per merge, so
    each merge touches ONLY the words that contain the merged pair —
    O(Σ|affected word|) per merge instead of a full vocabulary rescan.
    The best pair comes from a lazy max-heap of ``(-count, pair)``
    entries: stale entries (count changed since push) are re-pushed with
    the current count on pop, so selection is exactly
    ``min(pairs, key=(-count, pair))`` — identical merges to the naive
    rescan loop (property-tested in ``tests/test_bpe.py``), ties broken
    lexicographically, independent of dict order.
    """
    import heapq

    # word store: parallel lists (symbol tuples are rewritten in place);
    # duplicate symbol tuples may coexist — pair counts only ever see
    # their SUM, so selection is unaffected.
    syms_of: list[tuple[str, ...]] = []
    freq_of: list[int] = []
    for w, f in word_freqs.items():
        if w:
            syms_of.append(_word_syms(w))
            freq_of.append(f)
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wid, syms in enumerate(syms_of):
        f = freq_of[wid]
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(wid)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, best = heapq.heappop(heap)
        cur = pair_counts.get(best, 0)
        if cur <= 0:
            continue  # fully-stale entry for a vanished pair
        if -negc != cur:
            heapq.heappush(heap, (-cur, best))  # refresh stale count
            continue
        merges.append(best)
        merged = best[0] + best[1]
        a, b = best
        changed: set[tuple[str, str]] = set()
        # only words containing `best` change (the inverted index is
        # exact: ids are added on pair creation, removed on pair loss)
        for wid in sorted(pair_words.pop(best, ())):
            syms = syms_of[wid]
            f = freq_of[wid]
            old_pairs = list(zip(syms, syms[1:]))
            out: list[str] = []
            i = 0
            n = len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_syms = tuple(out)
            syms_of[wid] = new_syms
            new_pairs = list(zip(new_syms, new_syms[1:]))
            for p in old_pairs:
                pair_counts[p] -= f
                changed.add(p)
            for p in new_pairs:
                pair_counts[p] = pair_counts.get(p, 0) + f
                changed.add(p)
            old_set, new_set = set(old_pairs), set(new_pairs)
            for p in old_set - new_set:
                s = pair_words.get(p)
                if s is not None:
                    s.discard(wid)
                    if not s:
                        del pair_words[p]
            for p in new_set - old_set:
                pair_words.setdefault(p, set()).add(wid)
        for p in changed:
            c = pair_counts.get(p, 0)
            if c <= 0:
                pair_counts.pop(p, None)
            elif p != best:
                heapq.heappush(heap, (-c, p))
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
    broadcast_cap: int | str | None = "auto",
) -> DataFrame:
    """Per-doc BPE token sequences: (id, bpe_tokens array<string>, n_bpe).

    The python merge loop runs ONCE PER DISTINCT WORD (Arrow pandas_udf
    over the deduped word table — cost ∝ |vocab|, not corpus size), and
    the (word → segmentation) map joins back; per-doc reassembly is a
    native posexplode + flatten ordered by word position.  Words are
    never shipped to python twice.  Docs whose tokenization is empty
    (null/blank text) are KEPT, with ``bpe_tokens = []`` and
    ``n_bpe = 0`` — output row count always equals input row count.

    ``broadcast_cap`` governs the segmentation join strategy.  The
    default ``"auto"`` adds NO hint and runs NO pre-pass: AQE measures
    the vocab's real size at the shuffle boundary and converts to a
    broadcast join exactly when it fits — zero extra jobs, lazy (safe
    to compose into plans that are never executed), and on a noisy
    web-scale corpus where the distinct-word frame (with array
    payloads) is many GB it correctly stays a shuffle join, which the
    exploded side already keys.  An integer cap instead runs an eager
    ``approx_count_distinct`` pre-pass over the corpus (one extra scan,
    triggered at CONSTRUCTION time) and force-broadcasts iff the
    estimate is at most the cap — for callers who must pin the join
    strategy at plan time.  ``broadcast_cap=None`` always broadcasts
    with no pre-pass (callers that KNOW the vocab is small, e.g. the
    bounded-bank entry query).
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
    if broadcast_cap is None:
        vocab = F.broadcast(vocab)
    elif broadcast_cap != "auto":
        est = exploded.agg(
            F.approx_count_distinct("word", 0.05).alias("n")
        ).first()["n"]
        if est <= broadcast_cap:
            vocab = F.broadcast(vocab)
    encoded = (
        exploded.join(vocab, "word")
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
    )
    # empty-tokenization docs produce no exploded rows — join them back so
    # they surface as ([], 0) instead of silently vanishing
    toks = F.coalesce("bpe_tokens", F.array().cast("array<string>"))
    return (
        docs.select(id_col)
        .join(encoded, id_col, "left")
        .select(
            id_col,
            toks.alias("bpe_tokens"),
            F.size(toks).cast("bigint").alias("n_bpe"),
        )
    )
