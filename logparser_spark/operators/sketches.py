"""Mergeable sketches: count-min frequencies + HyperLogLog distinct counts.

The count-min sketch (Cormode & Muthukrishnan, J. Algorithms '05) keeps a
``depth × width`` grid of counters; key k increments cell
``(i, h_i(k))`` for each of ``depth`` independent hash rows, and the
estimate is the MIN over rows (collisions only ever inflate — one-sided
error ≤ 2N/width with prob 1-(1/2)^depth).

Why a sketch when groupBy-count is exact: the sketch's size is
``depth × width`` CELLS regardless of key cardinality, so it map-side
combines to a constant-size partial per partition and merges by cell-wise
addition — the shape you want for per-executor or per-window frequency
state at 10^12 turns where the distinct-key set itself is shuffle-heavy.
(Same motivation as ``textstats.bottom_k_sketch`` for distinct counts.)

The HyperLogLog sketch (Flajolet, Fusy, Gandouet, Meunier — AofA '07)
keeps ``m = 2^log2m`` registers per group; key k sets register
``bucket(k)`` to max(ρ) where ρ = leading-zero run of the hash suffix
+ 1.  Registers merge by cell-wise MAX — the same mergeable-partial
shape as the CMS grid, so per-group state is ``m`` rows regardless of
key cardinality.  Unlike Spark's built-in ``approx_count_distinct``
(whose HLL++ hash is JVM-private), this one is built on the repo's md5
idiom end-to-end, so the DuckDB twin computes the IDENTICAL registers
and estimate — a hash-checkable approximate-distinct operator.

Determinism: hash rows use the repo's md5 bucket idiom
(:func:`logparser_spark.functions.hashing.bucket_expr` — not Murmur3
``F.hash``) so Spark, the DuckDB twins, and plain Python agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logparser_spark.functions.hashing import bucket_expr, bucket_sql


def _cms_col(key: Column, row: int, width: int) -> Column:
    return bucket_expr(F.concat(F.lit(f"cms{row}:"), key), width)


def _cms_col_sql(key_sql: str, row: int, width: int) -> str:
    return bucket_sql(f"'cms{row}:' || {key_sql}", width)


def cms_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the sketch as a (row, col, cnt) table — ≤ depth·width rows.

    One narrow explode (depth rows per input row) then a groupBy whose
    group count is bounded by the GRID, not the data; Spark's hash
    aggregate partial-combines each partition down to ≤ depth·width
    cells before the (tiny) shuffle.
    """
    k = F.col(key_col).cast("string")
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"), _cms_col(k, i, width).alias("col")
                )
                for i in range(depth)
            ]
        )
    ).alias("_c")
    return (
        df.select(cells)
        .groupBy(F.col("_c.row").alias("row"), F.col("_c.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch for every key row: (key_col, est).

    Keys fan out to their ``depth`` cells and equi-join the sketch on
    (row, col) — the sketch side is grid-bounded, so Catalyst broadcasts
    it; a cell never seen counts 0 (left join) though with the sketch
    built over the same stream every probed cell exists.
    """
    k = F.col(key_col).cast("string")
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _cms_col(k, i, width).alias("col")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("_c"),
    ).select(key_col, F.col("_c.row").alias("row"), F.col("_c.col").alias("col"))
    joined = probes.join(F.broadcast(sketch), ["row", "col"], "left").na.fill(
        {"cnt": 0}
    )
    return joined.groupBy(key_col).agg(F.min("cnt").alias("est"))


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Keys whose CMS estimate ≥ threshold: (key_col, est).

    One-sided: every TRUE heavy hitter survives (estimates never
    undercount); collision-inflated light keys may ride along — the
    classic sketch trade, bounded by 2N/width per row.
    """
    sk = cms_sketch(df, key_col, depth, width)
    distinct = df.select(key_col).distinct()
    return cms_estimate(distinct, sk, key_col, depth, width).filter(
        F.col("est") >= threshold
    )


#: suffix width in hex chars (40 bits) — ρ ∈ [1, 41]
_HLL_SUF_HEX = 10


def _hll_alpha(m: int) -> float:
    # bias-correction constant per the HLL paper §4; hll_cols restricts
    # log2m >= 8, so the m >= 128 branch covers every accepted m (the
    # paper's small-m constants alpha_16/alpha_32/alpha_64 differ)
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    log2m: int = 8,
) -> DataFrame:
    """Per-group HLL register table: (*keys, bucket, r) with r = max ρ.

    ``log2m`` must be a multiple of 4 (bucket = whole leading hex chars
    of md5 — keeps the twin a plain string expression).  ρ is derived
    from the NEXT 10 hex chars (a 40-bit suffix) purely with string ops
    (strip leading '0's + a CASE on the first nonzero hex char), so no
    engine-specific bit intrinsics are involved:

        ρ = 4 · (#leading zero hex chars) + ⌈zeros in first nonzero⌉ + 1

    Map-side this is a hash aggregate whose group count is bounded by
    |groups| · m, not the data — the constant-size partial that makes
    the sketch worth it at 10^12 rows; registers from disjoint splits
    merge by the same groupBy-MAX.
    """
    bucket, rho = hll_cols(value_col, log2m)
    return (
        # NULLs carry no identity: md5(NULL) would otherwise become a
        # phantom register that inflates n_buckets while contributing
        # nothing to the estimator sum — drop them like count(DISTINCT)
        df.filter(F.col(value_col).isNotNull())
        .select(*keys, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_cols(value_col: str, log2m: int = 8) -> tuple[Column, Column]:
    """(bucket, ρ) expressions for one value — the per-row map step,
    shared by the batch register builder and the streaming per-window
    variant (which must group by the raw window expression itself)."""
    if log2m % 4 or not 8 <= log2m <= 16:
        # lower bound 8: _hll_alpha uses the paper's m >= 128 constant
        raise ValueError("log2m must be a multiple of 4 in [8, 16]")
    bucket_hex = log2m // 4
    h = F.md5(F.col(value_col).cast("string"))
    suf = F.substring(h, bucket_hex + 1, _HLL_SUF_HEX)
    # regexp (not ltrim) — identical spelling to the DuckDB twin
    stripped = F.regexp_replace(suf, "^0+", "")
    lz = F.lit(_HLL_SUF_HEX) - F.length(stripped)
    first = F.substring(stripped, 1, 1)
    extra = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = F.when(F.length(stripped) == 0, 4 * _HLL_SUF_HEX + 1).otherwise(
        4 * lz + extra + 1
    )
    bucket = F.conv(F.substring(h, 1, bucket_hex), 16, 10).cast("int")
    return bucket, rho.cast("int")


def hll_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    log2m: int = 8,
) -> DataFrame:
    """Per-group approximate distinct count: (*keys, est, n_buckets).

    Estimator per the HLL paper: E = α·m²/Σ2^(−reg) with the empty
    registers contributing 2^0 each, switched to linear counting
    m·ln(m/V) when E ≤ 2.5m and V (empty registers) > 0.  Every term is
    either exact in binary doubles (2^−ρ sums) or rounded to 4 dp in the
    output, per the repo's cross-engine float policy.  Relative error of
    the raw estimator is ≈ 1.04/√m.

    Residual cross-engine risk: the linear-counting branch evaluates
    ``ln(m/V)`` with the engine's libm; Java ``Math.log`` vs DuckDB are
    not contractually bit-identical, so if that product sits within one
    ulp of a ``round(·, 4)`` boundary the hash compare could flip —
    measure-zero in practice (V is a small integer, m/V one of m
    rationals, and none of those logs lands on a 4-dp boundary for any
    tested m).  A driver-injected ``%.17e`` constant table over the m
    possible V values would remove even that, at the cost of coupling
    the oracle to log2m; documented rather than done.
    """
    m = 1 << log2m
    alpha = _hll_alpha(m)
    regs = hll_registers(df, keys, value_col, log2m)
    agg = regs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("_s"),
    )
    v = F.lit(m) - F.col("n_buckets")  # empty registers
    e_raw = F.lit(alpha * m * m) / (F.col("_s") + v.cast("double"))
    est = F.when(
        (e_raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(m) / v)
    ).otherwise(e_raw)
    return agg.select(
        *keys,
        F.round(est, 4).alias("est"),
        F.col("n_buckets").cast("bigint").alias("n_buckets"),
    )


def hll_distinct_sql(
    src: str,
    keys: list[str],
    value_col: str,
    log2m: int = 8,
) -> str:
    """DuckDB-SQL twin of :func:`hll_distinct` — identical md5 registers,
    identical estimator arithmetic."""
    bucket_hex = log2m // 4
    m = 1 << log2m
    # E-notation: DuckDB parses plain decimal literals as DECIMAL (which
    # overflows when multiplied), but exponent literals as DOUBLE — and
    # %.17e round-trips the exact python float Spark's F.lit ships
    amm = f"{_hll_alpha(m) * m * m:.17e}"
    ks = ", ".join(keys)
    h = f"md5(CAST({value_col} AS VARCHAR))"
    suf = f"substring({h}, {bucket_hex + 1}, {_HLL_SUF_HEX})"
    stripped = f"regexp_replace({suf}, '^0+', '')"
    return f"""
WITH rho AS (
  SELECT {ks},
         CAST(('0x' || substring({h}, 1, {bucket_hex})) AS INT) AS bucket,
         -- NULL values dropped below, mirroring the Spark filter
         CASE WHEN length({stripped}) = 0 THEN {4 * _HLL_SUF_HEX + 1}
              ELSE 4 * ({_HLL_SUF_HEX} - length({stripped}))
                   + (CASE substring({stripped}, 1, 1)
                      WHEN '1' THEN 3
                      WHEN '2' THEN 2 WHEN '3' THEN 2
                      WHEN '4' THEN 1 WHEN '5' THEN 1
                      WHEN '6' THEN 1 WHEN '7' THEN 1
                      ELSE 0 END) + 1
         END AS rho
  FROM {src} WHERE {value_col} IS NOT NULL),
regs AS (
  SELECT {ks}, bucket, max(rho) AS r FROM rho GROUP BY {ks}, bucket),
agg AS (
  SELECT {ks}, count(*) AS n_buckets, sum(power(2.0, -r)) AS s
  FROM regs GROUP BY {ks})
SELECT {ks},
       round(CASE WHEN {amm} / (s + ({m} - n_buckets)) <= 2.5 * {m}
                  AND n_buckets < {m}
             THEN {float(m):.17e} * ln({m} / CAST({m} - n_buckets AS DOUBLE))
             ELSE {amm} / (s + ({m} - n_buckets))
             END, 4) AS est,
       CAST(n_buckets AS BIGINT) AS n_buckets
FROM agg
"""


def cms_heavy_hitters_sql(
    src: str,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 256,
) -> str:
    """DuckDB-SQL twin of :func:`cms_heavy_hitters` (same md5 rows)."""
    key_s = f"CAST({key_col} AS VARCHAR)"
    cells = " UNION ALL ".join(
        f"SELECT {i} AS row, {_cms_col_sql(key_s, i, width)} AS col FROM {src}"
        for i in range(depth)
    )
    probes = " UNION ALL ".join(
        f"SELECT {key_col}, {i} AS row, {_cms_col_sql(key_s, i, width)} AS col "
        f"FROM (SELECT DISTINCT {key_col} FROM {src})"
        for i in range(depth)
    )
    return f"""
WITH sketch AS (
  SELECT row, col, count(*) AS cnt FROM ({cells}) GROUP BY row, col),
probes AS ({probes}),
est AS (
  SELECT {key_col}, min(coalesce(s.cnt, 0)) AS est
  FROM probes p LEFT JOIN sketch s USING (row, col)
  GROUP BY {key_col})
SELECT {key_col}, est FROM est WHERE est >= {threshold}
"""


# -- sample quantile sketch ---------------------------------------------------


def quantile_sample(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    id_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group uniform sample of ≤ k rows: (*keys, value, _rk).

    The sample is the BOTTOM-k rows by md5(id) — a deterministic uniform
    sample (md5 ranks are exchangeable with respect to values) that is
    MERGEABLE: the bottom-k of a union is contained in the union of
    per-split bottom-k's, so re-ranking merged sketches reproduces the
    global sample exactly (pinned by test).  Spark 4 plans the rank
    filter as a map-side ``WindowGroupLimit``: each map task ships at
    most k rows per group to the shuffle — per-group state constant in
    the data size, the property exact per-group sorts lack.
    """
    from pyspark.sql import Window

    rk = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(F.col("_rk"))
    return (
        # null values/ids are excluded on BOTH engines (they'd otherwise
        # sort differently: Spark NULLS FIRST vs DuckDB NULLS LAST)
        df.filter(F.col(value_col).isNotNull() & F.col(id_col).isNotNull())
        .select(*keys, F.col(value_col).alias("value"), rk.alias("_rk"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


#: rank denominator for sketch quantiles (same exact-integer rank rule
#: as operators/aggregate.grouped_percentiles)
_QS_DENOM = 10_000


def quantile_sketch(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    id_col: str,
    pcts: list[int],
    k: int = 256,
) -> DataFrame:
    """Approximate per-group quantiles from the bottom-k sample:
    (*keys, p_pct, est, n_sample).

    ``pcts`` are integer 100ths of a percent out of ``_QS_DENOM``
    (5000 = median) so the nearest-rank ``ceil(p·n)`` is exact integer
    arithmetic in both engines; ``est`` SELECTS an existing value (no
    interpolation), so cross-engine equality is exact.  DKW bound: the
    sample quantile's rank error is ≲ √(ln(2/δ)/2k) with prob 1−δ.
    """
    if not all(0 < p <= _QS_DENOM for p in pcts):
        raise ValueError(f"pcts must be integers in (0, {_QS_DENOM}]")
    sample = quantile_sample(df, keys, value_col, id_col, k)
    arr = F.array_sort(F.collect_list(F.struct("value", "_rk")))
    agg = sample.groupBy(*keys).agg(
        arr.alias("_a"), F.count(F.lit(1)).alias("n_sample")
    )
    out = agg.select(
        *keys,
        "n_sample",
        F.explode(F.array(*[F.lit(p) for p in pcts])).alias("p_pct"),
        F.col("_a"),
    )
    # rank = ceil(p·n/DENOM) in exact INTEGER arithmetic (`div`), never a
    # double ceil — the aggregate.grouped_percentiles off-by-one lesson
    rank = F.expr(
        f"CAST((p_pct * n_sample + {_QS_DENOM - 1}) div {_QS_DENOM} AS INT)"
    )
    return out.select(
        *keys,
        F.col("p_pct").cast("int").alias("p_pct"),
        F.element_at("_a", rank)["value"].alias("est"),
        F.col("n_sample").cast("bigint").alias("n_sample"),
    )


def quantile_sketch_sql(
    src: str,
    keys: list[str],
    value_col: str,
    id_col: str,
    pcts: list[int],
    k: int = 256,
) -> str:
    """DuckDB twin of :func:`quantile_sketch` (same md5 ranks, same
    integer nearest-rank)."""
    ks = ", ".join(keys)
    rk = f"md5(CAST({id_col} AS VARCHAR))"
    plist = ", ".join(str(p) for p in pcts)
    return f"""
WITH ranked AS (
  SELECT {ks}, {value_col} AS value, {rk} AS rk,
         row_number() OVER (PARTITION BY {ks} ORDER BY {rk}) AS rn
  FROM {src}
  WHERE {value_col} IS NOT NULL AND {id_col} IS NOT NULL),
sample AS (SELECT * FROM ranked WHERE rn <= {k}),
agg AS (
  SELECT {ks}, list(value ORDER BY value, rk) AS a,
         count(*) AS n_sample
  FROM sample GROUP BY {ks})
SELECT {ks}, CAST(p.p_pct AS INT) AS p_pct,
       a[CAST((p.p_pct * n_sample + {_QS_DENOM - 1}) // {_QS_DENOM} AS INT)]
         AS est,
       CAST(n_sample AS BIGINT) AS n_sample
FROM agg, (SELECT unnest([{plist}]) AS p_pct) p
"""
