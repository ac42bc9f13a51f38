"""Deduplication operators for large-scale training-data pipelines.

All distributed-relational: exact (hash groupBy), MinHash+LSH
(shingle → minhash → band → bucket self-join), n-gram Jaccard verification,
SimHash, and embedding-cosine near-dup.  Hash functions are md5-based so
results are engine-independent (same answer from the DuckDB SQL oracles).

Scale notes
-----------
* Shingling/minhashing is explode + hash + min-aggregate — map-side
  combine keeps the shuffle at |docs|×|seeds| rows regardless of doc size.
* LSH banding turns the quadratic all-pairs problem into an equi-join on
  (band, band_key); only same-bucket pairs are materialized.  Hot buckets
  (boilerplate docs) are the skew risk — ``max_bucket_size`` drops
  pathological buckets explicitly and reports them, the standard
  web-dedup practice.
* Jaccard verification joins only candidate pairs (semi-join pushdown).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logparser_spark.functions.text import tokens_expr


# -- shingling ---------------------------------------------------------------


def shingles_expr(text_col: Column | str, n: int = 3) -> Column:
    """Array of word n-gram shingles; a doc shorter than n tokens yields
    its whole token string as the single shingle."""
    toks = tokens_expr(text_col)
    k = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def exploded_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    return df.select(F.col(id_col), F.explode(shingles_expr(text_col, n)).alias("shingle"))


# -- exact -------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group identical texts by md5; one row per distinct text."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min(id_col).alias("keeper_id"))
    )


# -- minhash + lsh -----------------------------------------------------------


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 16, shingle_n: int = 3
) -> DataFrame:
    """(id, seed, minhash): minhash_s(doc) = min over shingles of
    md5(seed || ':' || shingle).  Lexicographic min over hex digests is a
    valid uniform minhash family and is reproducible in any engine."""
    sh = exploded_shingles(df, id_col, text_col, shingle_n)
    seeds = F.explode(F.array(*[F.lit(i) for i in range(num_hashes)])).alias("seed")
    return (
        sh.select(F.col(id_col), "shingle")
        .select(F.col(id_col), "shingle", seeds)
        .select(
            F.col(id_col),
            "seed",
            F.md5(F.concat_ws(":", F.col("seed").cast("string"), "shingle")).alias("h"),
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_bands(sig: DataFrame, id_col: str, rows_per_band: int = 4) -> DataFrame:
    """Fold signatures into band keys: band b covers seeds
    [b*r, (b+1)*r); band_key = md5 of the seed-ordered minhash list."""
    banded = sig.withColumn("band", F.floor(F.col("seed") / rows_per_band))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
        lambda s: s["minhash"],
    )
    return banded.groupBy(id_col, "band").agg(
        F.md5(F.concat_ws(",", ordered)).alias("band_key")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    rows_per_band: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing ≥1 LSH bucket.

    Buckets larger than ``max_bucket_size`` (degenerate boilerplate) are
    dropped — explicit skew guard; count them upstream if reporting.
    """
    # the md5-heavy explode inherits the scan's split count; a small
    # input (one file → 1-2 splits) would serialize it onto 2 cores.
    # A 100 TB corpus has thousands of splits and skips this.
    src = df
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < parallelism:
        src = src.repartition(parallelism)
    bands = lsh_bands(
        minhash_signatures(src, id_col, text_col, num_hashes, shingle_n),
        id_col,
        rows_per_band,
    )
    # bucket-size guard via aggregation (no window needed)
    bucket_sizes = bands.groupBy("band", "band_key").agg(F.count(F.lit(1)).alias("bn"))
    ok_buckets = bucket_sizes.filter(F.col("bn") <= max_bucket_size).select("band", "band_key")
    bands = bands.join(ok_buckets, ["band", "band_key"], "inner")
    a = bands.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"], "inner")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# -- jaccard verification ----------------------------------------------------


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_n: int = 3,
    candidates: DataFrame | None = None,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for all (or candidate) pairs ≥ threshold.

    Scale ordering matters: when ``candidates`` is given, the shingle
    relation is semi-joined down to candidate docs BEFORE the quadratic
    shingle self-join (not after the pair aggregation) — at web scale the
    candidate set is tiny relative to the corpus, so the self-join only
    ever sees candidate docs.  ``max_shingle_df`` additionally drops
    shingles appearing in more than that many docs from BOTH the
    intersection and the set sizes (ultra-common shingles carry no
    dedup signal but drive the self-join quadratic); with it set the
    result is Jaccard over the capped shingle space, a documented
    approximation.  Default (None) preserves exact semantics.
    """
    sh = exploded_shingles(df, id_col, text_col, shingle_n)
    if candidates is not None:
        cand_ids = (
            candidates.select(F.col("id_a").alias(id_col))
            .unionByName(candidates.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        sh = sh.join(cand_ids, id_col, "left_semi")
    if max_shingle_df is not None:
        ok_sh = (
            sh.groupBy("shingle")
            .agg(F.count_distinct(id_col).alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(ok_sh, "shingle", "left_semi")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if candidates is not None:
        # restrict to exactly the candidate *pairs* (the id-level semi-join
        # above also admits cross pairs between unrelated candidates)
        pairs = pairs.join(candidates.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi")
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        pairs.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# -- simhash -----------------------------------------------------------------


def simhash_df(
    df: DataFrame, id_col: str, text_col: str, bits: int = 48, shingle_n: int = 3
) -> DataFrame:
    """(id, simhash): SimHash over word n-gram shingles.

    Bit j of the fingerprint is 1 iff the majority of the doc's distinct
    shingles have bit j set in the first ``bits`` bits of md5(shingle).
    Shingles (not unigrams): over corpora with a shared vocabulary,
    unigram majorities converge to the corpus-wide majority and every
    fingerprint collides (observed: ~47 % of all pairs at sf0.01 in r1).
    n-gram shingles are near-unique per doc, so unrelated fingerprints
    are independent and band collisions are rare.

    Plan shape (VERDICT r2 #7 — rebuilt in exploded-row form, the repo's
    own HOF lesson): shingles EXPLODE to rows, md5 runs once per shingle
    row inside whole-stage codegen, the ``bits`` per-bit counts are plain
    ``sum`` aggregates (map-side partial combine, one shuffle of
    ``bits`` longs per doc), and the fingerprint assembles from the
    aggregated counts in a final projection.  The previous
    ``transform``/``aggregate``/``zip_with`` higher-order-function form
    evaluated the md5-heavy lambdas interpreted, outside codegen —
    measured 1.33× slower on 80 k sf0.1 docs, identical fingerprints
    (BENCH/BASELINE.md r3 note).
    Pure native expressions, engine-portable (md5-based).
    """
    hex_chars = (bits + 3) // 4
    toks = shingles_expr(text_col, shingle_n)
    ex = df.select(F.col(id_col), F.explode(toks).alias("_sh"))
    h = F.conv(F.substring(F.md5(F.col("_sh")), 1, hex_chars), 16, 10).cast("long")
    agg = ex.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.shiftright(h, j).bitwiseAND(F.lit(1))).alias(f"_c{j}")
            for j in range(bits)
        ],
    )
    fp: Column | None = None
    for j in range(bits):
        term = (
            F.when(
                F.col(f"_c{j}") * 2 >= F.col("_n"),
                F.lit(1 << j).cast("long"),
            )
            .otherwise(F.lit(0).cast("long"))
        )
        fp = term if fp is None else fp.bitwiseOR(term)
    return agg.select(F.col(id_col), fp.alias("simhash"))


def simhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 48,
    band_bits: int = 12,
    shingle_n: int = 3,
    max_bucket_size: int = 1000,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs (id_a, id_b, hamming): equal simhash band → candidate,
    then verified by full-fingerprint hamming distance ≤ ``max_hamming``.

    Bands over-sized buckets (> ``max_bucket_size``, degenerate boilerplate)
    are dropped explicitly — same skew guard as :func:`lsh_candidate_pairs`;
    the hamming verification then kills the accidental single-band
    collisions that banding admits.  bits/band_bits bands; any pair within
    hamming distance bits/band_bits - 1 is guaranteed to share a band
    (pigeonhole), so recall is exact for hamming ≤ 3 at 48/12.
    """
    sh = simhash_df(df, id_col, text_col, bits, shingle_n)
    mask = (1 << band_bits) - 1
    n_bands = bits // band_bits
    banded = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), b * band_bits).bitwiseAND(F.lit(mask))
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "band_val"),
    )
    ok_buckets = (
        banded.groupBy("band", "band_val")
        .agg(F.count(F.lit(1)).alias("bn"))
        .filter(F.col("bn") <= max_bucket_size)
        .select("band", "band_val")
    )
    banded = banded.join(ok_buckets, ["band", "band_val"], "left_semi")
    a = banded.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("_sh_a"), "band", "band_val")
    b2 = banded.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("_sh_b"), "band", "band_val")
    return (
        a.join(b2, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming", F.bit_count(F.col("_sh_a").bitwiseXOR(F.col("_sh_b"))).cast("long")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def simhash_sql(
    docs_sql: str,
    id_col: str,
    shingles_sql: str,
    bits: int = 48,
    band_bits: int = 12,
    max_bucket_size: int = 1000,
    max_hamming: int = 3,
) -> str:
    """DuckDB-SQL twin of :func:`simhash_dedup`.

    ``docs_sql`` is a SELECT producing the doc table; ``shingles_sql`` is
    the expression producing the shingle array over its ``text`` column.
    Bit j of conv(substr(md5, 1, H), 16, 10) lives in hex char H - j//4
    (1-indexed), bit j%4 within the char — extracted with strpos
    arithmetic so no engine-specific hex-parse is needed.
    """
    hex_chars = (bits + 3) // 4
    mask = (1 << band_bits) - 1
    n_bands = bits // band_bits
    bit_sums = ", ".join(
        f"sum(((strpos('0123456789abcdef', substr(m, {hex_chars - j // 4}, 1)) - 1) "
        f"// {1 << (j % 4)}) % 2) AS b{j}"
        for j in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN b{j} * 2 >= n THEN {1 << j} ELSE 0 END)" for j in range(bits))
    return f"""
WITH docs AS ({docs_sql}),
sh AS (SELECT {id_col} AS did, unnest({shingles_sql}) AS s FROM docs),
hx AS (SELECT did, md5(s) AS m FROM sh),
bits AS (SELECT did, count(*) AS n, {bit_sums} FROM hx GROUP BY did),
fp AS (SELECT did, CAST({fp} AS BIGINT) AS simhash FROM bits),
bands AS (SELECT did, simhash, band, (simhash >> (band * {band_bits})) & {mask} AS band_val
          FROM fp CROSS JOIN (SELECT unnest(generate_series(0, {n_bands - 1})) AS band) g),
ok AS (SELECT band, band_val FROM bands GROUP BY band, band_val
       HAVING count(*) <= {max_bucket_size}),
bo AS (SELECT bands.* FROM bands JOIN ok USING (band, band_val))
SELECT DISTINCT a.did AS id_a, b.did AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM bo a JOIN bo b USING (band, band_val)
WHERE a.did < b.did AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


# -- duplicate-cluster resolution --------------------------------------------


def _two_phase_components(
    edges: DataFrame, max_iters: int
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14, Alg. 2).

    Converges in O(log² n) rounds regardless of component DIAMETER —
    the adversarial-chain complement to min-label propagation (which
    needs O(diameter) rounds).  Each round:

    * large-star: every node u links each STRICTLY GREATER neighbor to
      ``m(u) = min(Γ(u) ∪ {u})`` — long chains collapse toward local
      minima without ever increasing the edge count beyond 2|E|;
    * small-star: orienting each edge high→low, every node links its
      smaller neighbors (and itself) to its minimum neighbor — stars
      flatten onto their roots.

    At the fixpoint the edge set is exactly the star set
    ``(child, component-min)``.  Per round: two shuffles (the groupBy-min
    and the join back), plus a convergence check; the frame is
    ``localCheckpoint``-ed per round to truncate iterative lineage, and
    the SUPERSEDED round's checkpoint blocks are unpersisted as soon as
    the next round is materialized — without that, rounds accumulate in
    executor storage memory for the life of the session and every later
    allocation pays an eviction scan over the dead blocks (only the
    returned frame's blocks stay pinned).  ``edges`` must be (u, v) with
    u != v; returns the converged star edges ``(u=child, v=root)`` with
    root < child.
    """
    e = edges.select("u", "v").distinct().localCheckpoint()
    for _ in range(max_iters):
        # large-star over the symmetrized adjacency
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.col("u")).alias("m")
        )
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star over the high→low orientation
        ori = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v"))
        omins = ori.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            ori.join(omins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(omins.select(F.col("u"), F.col("m").alias("v")))
            .distinct()
            .localCheckpoint()
        )
        if small.count() == e.count() and small.exceptAll(e).isEmpty():
            e.unpersist()
            return small
        e.unpersist()  # `small` is eagerly checkpointed — safe to drop
        e = small
    raise RuntimeError(
        f"duplicate_clusters(two_phase): star rounds did not reach the "
        f"fixpoint within max_iters={max_iters} — raise max_iters "
        "(O(log² n) rounds suffice for any graph, so this bound should "
        "never bind below astronomically large inputs)"
    )


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
    on_nonconverged: str = "error",
    strategy: str = "label_prop",
) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS: connected
    components of the undirected pair graph, labeled by the component's
    minimum member id.

    Returns one row per doc that appears in any pair:
    ``(member_id, cluster_id)`` with ``cluster_id = min(member ids of the
    component)`` — so the canonical keeper of each cluster is the row
    where ``member_id == cluster_id``.

    Two strategies (both from Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14):

    * ``strategy="label_prop"`` (default) — iterative min-label
      propagation: each round every node takes the min of its own label
      and its neighbors'; convergence needs O(component diameter)
      rounds.  Near-dup graphs are dense little cliques plus short
      chains (diameter almost always ≤ 4), so this converges in a
      handful of rounds with ONE shuffle-join per round; ``max_iters``
      is a hard stop that fails loudly on adversarial chains.
    * ``strategy="two_phase"`` — alternating large-star/small-star
      (:func:`_two_phase_components`): O(log² n) rounds independent of
      diameter, two shuffles per round.  The right choice when the pair
      graph may contain long paths (e.g. chained near-dups from
      boilerplate drift); identical output, property-tested equal.

    Scale shape: per round one shuffle (edge join on ``src``) + one
    min-aggregate — no collect, no driver-side graph.  The label frame is
    ``localCheckpoint``-ed every round to truncate the iterative lineage
    (Spark's plan would otherwise grow linearly in rounds); on a real
    cluster prefer ``spark.sparkContext.setCheckpointDir`` + reliable
    ``checkpoint`` for executor-loss safety.  Labels are monotone
    non-increasing, so "no label decreased" is an exact fixpoint test.
    """
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    if strategy == "two_phase":
        # truncate the caller's pair plan FIRST: `nodes` below re-derives
        # from `e`, and the star result joins back onto it — without this
        # checkpoint the upstream tower (a minhash→LSH→Jaccard candidate
        # plan references its band subtree ~8× and the verify another
        # ~3×) is duplicated into the final plan, whose mere EXPLAIN
        # string OOMs a 1 GiB driver (observed: spark-submit curation job
        # with --cc-strategy two_phase over 500 docs).  label_prop
        # already truncates via its own `edges` checkpoint.
        e = e.localCheckpoint()
        und = e.select(F.col("src").alias("u"), F.col("dst").alias("v")).filter(
            F.col("u") != F.col("v")
        )
        stars = _two_phase_components(und, max_iters)
        labels = stars.select(
            F.col("u").alias("member_id"), F.col("v").alias("cluster_id")
        ).unionByName(
            stars.select(F.col("v").alias("member_id"), F.col("v").alias("cluster_id"))
        ).distinct()
        # nodes appearing ONLY in self-pairs are singletons (label = self)
        nodes = (
            e.select(F.col("src").alias("member_id"))
            .unionByName(e.select(F.col("dst").alias("member_id")))
            .distinct()
        )
        return nodes.join(labels, "member_id", "left").select(
            "member_id",
            F.coalesce("cluster_id", F.col("member_id")).alias("cluster_id"),
        )
    if strategy != "label_prop":
        raise ValueError(f"unknown strategy: {strategy!r}")
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    converged = False
    prev_upd = None
    for _ in range(max_iters):
        prop = (
            edges.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        upd = (
            labels.join(prop, "node", "left")
            .select(
                "node",
                F.col("label").alias("_old"),
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        # `upd` is eagerly materialized — the previous round's checkpoint
        # blocks are dead weight in executor storage memory from here on
        # (a long session would otherwise pay an eviction scan over every
        # past round on each new allocation); only the final round stays
        if prev_upd is not None:
            prev_upd.unpersist()
        prev_upd = upd
        labels = upd.select("node", "label")
        if upd.filter(F.col("label") < F.col("_old")).count() == 0:
            converged = True
            break
    if prev_upd is not None:
        # the returned labels derive from the LAST checkpoint only — the
        # symmetrized edge frame is no longer reachable from the result
        edges.unpersist()
    if not converged:
        # A component with diameter > max_iters would return SPLIT
        # clusters — a silently wrong answer (and an opaque downstream
        # hash-gate failure vs the exact recursive-CTE twin).  Mirror the
        # loud-failure policy of mine_templates/lke_fit.
        msg = (
            f"duplicate_clusters: min-label propagation did not reach the "
            f"fixpoint within max_iters={max_iters} rounds — a component "
            f"with diameter > {max_iters} exists; raise max_iters (or "
            "switch to the large-star/small-star variant for adversarial "
            "chain graphs)"
        )
        if on_nonconverged == "error":
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels.select(
        F.col("node").alias("member_id"), F.col("label").alias("cluster_id")
    )


def dedup_keep_canonical(
    df: DataFrame, clusters: DataFrame, id_col: str
) -> DataFrame:
    """Drop every clustered doc except its cluster's canonical keeper
    (the min-id member).  Docs in no cluster pass through untouched —
    this is the "resolved corpus" end of the dedup pipeline:
    pairs → :func:`duplicate_clusters` → keep-canonical."""
    losers = clusters.filter(F.col("member_id") != F.col("cluster_id")).select(
        F.col("member_id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def duplicate_clusters_sql(pairs_sql: str, out_id: str = "doc_id") -> str:
    """DuckDB twin of :func:`duplicate_clusters`: reachability closure by
    recursive CTE, then min label per node.  ``pairs_sql`` must produce
    ``(id_a, id_b)`` (extra columns ignored)."""
    return (
        "WITH RECURSIVE verified AS (" + pairs_sql + "), "
        "e AS (SELECT id_a AS src, id_b AS dst FROM verified "
        "UNION SELECT id_b, id_a FROM verified), "
        "walk(node, lbl) AS (SELECT src, src FROM e "
        "UNION SELECT e.dst, w.lbl FROM walk w JOIN e ON e.src = w.node) "
        f"SELECT node AS {out_id}, min(lbl) AS cluster_id FROM walk GROUP BY node"
    )


# -- incremental (batch-vs-corpus) dedup --------------------------------------


def incremental_dedup(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    rows_per_band: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_bucket_size: int = 1000,
    strategy: str = "label_prop",
) -> DataFrame:
    """Admit a NEW document batch against an existing canonical corpus:
    the continuous-ingest dedup shape (each crawl/delivery dedups against
    everything already kept, not against itself alone).

    Returns the admitted subset of ``new_docs`` (all its columns).  A new
    doc is dropped iff its near-dup cluster — connected components over
    the LSH→Jaccard-verified pair graph restricted to pairs touching at
    least one new doc — contains ANY corpus member (it duplicates kept
    data, possibly transitively), or it is a non-canonical member of an
    all-new cluster (in-batch duplicates resolve to their min id, same
    rule as :func:`dedup_keep_canonical`).

    Scale shape — the incremental property: corpus×corpus candidate
    pairs are NEVER materialized.  Both sides are minhash-banded
    (per-doc, so side-by-side == banding the union), the bucket-size
    guard applies to the UNION bucket, and the candidate join emits only
    new×corpus and new×new pairs — cost ∝ new-batch bucket overlap, not
    corpus².  Verification then runs candidates-first (shingles
    semi-joined to candidate docs before the quadratic join).  Ids must
    be globally unique across the two tables.
    """
    nd = new_docs.select(F.col(id_col), F.col(text_col))
    cd = corpus.select(F.col(id_col), F.col(text_col))
    parallelism = nd.sparkSession.sparkContext.defaultParallelism
    if nd.rdd.getNumPartitions() < parallelism:
        nd = nd.repartition(parallelism)
    if cd.rdd.getNumPartitions() < parallelism:
        cd = cd.repartition(parallelism)
    nb = lsh_bands(
        minhash_signatures(nd, id_col, text_col, num_hashes, shingle_n),
        id_col,
        rows_per_band,
    ).withColumn("_new", F.lit(True))
    cb = lsh_bands(
        minhash_signatures(cd, id_col, text_col, num_hashes, shingle_n),
        id_col,
        rows_per_band,
    ).withColumn("_new", F.lit(False))
    bands = nb.unionByName(cb)
    ok = bands.join(
        bands.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("bn"))
        .filter(F.col("bn") <= max_bucket_size)
        .select("band", "band_key"),
        ["band", "band_key"],
    )
    n_side = ok.filter("_new").select(
        F.col(id_col).alias("_n"), "band", "band_key"
    )
    c_side = ok.filter(~F.col("_new")).select(
        F.col(id_col).alias("_c"), "band", "band_key"
    )
    nc = n_side.join(c_side, ["band", "band_key"]).select(
        F.least("_n", "_c").alias("id_a"), F.greatest("_n", "_c").alias("id_b")
    )
    m = n_side.select(F.col("_n").alias("_m"), "band", "band_key")
    nn = (
        n_side.join(m, ["band", "band_key"])
        .filter(F.col("_n") < F.col("_m"))
        .select(F.col("_n").alias("id_a"), F.col("_m").alias("id_b"))
    )
    cands = nc.unionByName(nn).distinct()
    both = nd.unionByName(cd)
    verified = jaccard_pairs(
        both, id_col, text_col, threshold, shingle_n, candidates=cands
    )
    clusters = duplicate_clusters(verified, strategy=strategy)
    corpus_m = cd.select(F.col(id_col).alias("member_id"))
    bad = (
        clusters.join(corpus_m, "member_id", "left_semi")
        .select("cluster_id")
        .distinct()
    )
    new_members = clusters.join(
        new_docs.select(F.col(id_col).alias("member_id")), "member_id", "left_semi"
    )
    drop = (
        new_members.join(bad, "cluster_id", "left_semi")
        .select("member_id")
        .unionByName(
            new_members.join(bad, "cluster_id", "left_anti")
            .filter(F.col("member_id") != F.col("cluster_id"))
            .select("member_id")
        )
    )
    return new_docs.join(
        drop.select(F.col("member_id").alias(id_col)), id_col, "left_anti"
    )
