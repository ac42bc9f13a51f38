"""Deterministic synthetic multi-turn transcript generator.

Schema is the authoritative graft input (``BASELINE.json`` input_hint):
``conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp``.

Two mirrored implementations:

* :func:`transcripts_df` — fully distributed: pure column expressions over
  ``spark.range(n)`` (no Python RNG, no UDF, no driver data) so the same
  generator scales from 1e3 to 1e12 rows and is embarrassingly parallel.
* :func:`transcripts_pdf` — an exact pandas mirror used by the sequential
  oracle tests; equality of the two is itself asserted in tests.

All derived values are integer arithmetic on the global turn number ``t``,
with multiplies reduced mod their modulus first so no intermediate exceeds
``(1e7-1) * 4435761 < 2^63`` — 64-bit safe for t < 2^39 (≈5.5e11 turns),
so both implementations agree bit-for-bit (the pandas mirror uses Python
ints, which never wrap; the Spark side must not wrap either).
Texts are rendered from a fixed bank of message templates with injected
parameters (IPs, ``blk_`` ids, hex ids, durations, paths) chosen so the
Drain masking rules and templating have known ground truth (FIXTURES.md §1).
Conversation sizes are skewed: ``skew_share`` of all turns land in
``conv000000`` to exercise salted aggregation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z

ROLES = ("user", "assistant", "system", "tool")
TOOLS = ("search", "exec", "browser", "db")

# (python format string, spark format_string pattern) share printf syntax.
TEMPLATE_BANK: tuple[str, ...] = (
    "Received block blk_%d of size %d from 10.0.%d.%d",
    "PacketResponder %d for block blk_%d terminating",
    "Verification succeeded for blk_%d",
    "Exception in receiveBlock for block blk_%d java.io.IOException: Connection reset",
    "user u%d logged in from 10.1.%d.%d:%d",
    "query q%d finished in %d ms rows=%d",
    "tool call %s started with payload 0x%x",
    "tool call %s finished status %d in %d ms",
    "retry %d of %d for request 0x%x",
    "cache miss for key 0x%x shard %d",
    "writing checkpoint %d to /srv/job/%d/ckpt",
    "scheduler assigned task %d to worker w%d",
    "heartbeat from worker w%d lag %d ms",
    "error code %d while opening /srv/job/%d/data",
    "compaction of level %d finished bytes=%d",
    "session 0x%x expired after %d ms",
    "planning query q%d with %d joins",
    "broadcast table t%d size %d bytes",
    "shuffle spill %d bytes in stage %d",
    "assistant response generated tokens=%d latency=%d ms",
)

N_TEMPLATES = len(TEMPLATE_BANK)


def _params_for(t: int) -> tuple[int, ...]:
    """Five deterministic parameter ints derived from the turn number."""
    return (
        # (t * 2654435761) % 1e7, computed as (t%1e7)*(2654435761%1e7)%1e7
        # so the Spark twin's int64 multiply cannot overflow (identical
        # value by modular arithmetic; 2654435761 % 1e7 == 4435761)
        ((t % 10_000_000) * 4_435_761) % 10_000_000,  # p0: big id

        (t * 97 + 13) % 100_000,         # p1: size / ms / bytes
        t % 200,                          # p2: small octet
        (t * 3) % 250,                    # p3: small octet
        (t * 31 + 7) % 1000,             # p4: port-ish / counter
    )


def _conv_turn(t: int, n_turns: int, n_convs: int, skew_share_pct: int) -> tuple[int, int]:
    """Map global turn number → (conv number, turn_idx), dense per conv."""
    skew_cut = n_turns * skew_share_pct // 100
    if t < skew_cut:
        return 0, t
    rest = t - skew_cut
    n_rest_convs = max(n_convs - 1, 1)
    return 1 + rest % n_rest_convs, rest // n_rest_convs


def _render_text_py(tpl_idx: int, tool: str, p: tuple[int, ...]) -> str:
    tpl = TEMPLATE_BANK[tpl_idx]
    args_by_tpl = _format_args(tpl_idx, tool, p)
    return tpl % args_by_tpl


def _format_args(tpl_idx: int, tool: str, p: tuple[int, ...]):
    """Argument tuple per template (mirrored in the Spark expression)."""
    p0, p1, p2, p3, p4 = p
    table = {
        0: (p0, p1, p2, p3),
        1: (p4, p0),
        2: (p0,),
        3: (p0,),
        4: (p0, p2, p3, p4),
        5: (p4, p1, p0),
        6: (tool or "none", p0),
        7: (tool or "none", p4 % 5, p1),
        8: (p4 % 7, 7, p0),
        9: (p0, p4 % 32),
        10: (p4, p2),
        11: (p0, p3),
        12: (p3, p1),
        13: (p4 % 256, p2),
        14: (p4 % 7, p1),
        15: (p0, p1),
        16: (p4, p4 % 12),
        17: (p3, p1),
        18: (p1, p4 % 50),
        19: (p1 % 4096, p4),
    }
    return table[tpl_idx]


def transcripts_pdf(
    n_turns: int, n_convs: int = 100, skew_share_pct: int = 0, t_start: int = 0
) -> pd.DataFrame:
    """Pandas mirror of :func:`transcripts_df` (oracle tests only).

    ``t_start`` shifts the global turn-number window (overflow-boundary
    tests run the same arithmetic at t ≈ 2³⁸)."""
    rows = []
    for t in range(t_start, t_start + n_turns):
        conv, turn_idx = _conv_turn(t, n_turns, n_convs, skew_share_pct)
        role = ROLES[t % 4]
        tool = TOOLS[(t // 4) % 4] if role == "tool" else ""
        tpl_idx = (t * 7 + conv) % N_TEMPLATES
        text = _render_text_py(tpl_idx, tool, _params_for(t))
        ts = EPOCH_2024 + turn_idx * 60 + conv % 37
        try:
            ts_val = pd.Timestamp(ts, unit="s")
        except (OverflowError, pd.errors.OutOfBoundsDatetime):
            # mirror-only limit: pandas ns-epoch caps at year ~2262;
            # overflow-boundary tests (t ≈ 2³⁸) compare non-ts columns
            ts_val = pd.NaT
        rows.append(
            {
                "conv_id": f"conv{conv:06d}",
                "turn_idx": turn_idx,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": ts_val,
            }
        )
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def transcripts_df(
    spark: SparkSession,
    n_turns: int,
    n_convs: int = 100,
    skew_share_pct: int = 0,
    num_partitions: int | None = None,
    t_start: int = 0,
) -> DataFrame:
    """Distributed generator: pure native expressions over ``spark.range``."""
    df = spark.range(
        t_start,
        t_start + n_turns,
        1,
        num_partitions or spark.sparkContext.defaultParallelism,
    )
    t = F.col("id")
    skew_cut = F.lit(n_turns * skew_share_pct // 100)
    n_rest = F.lit(max(n_convs - 1, 1))
    rest = t - skew_cut
    conv = F.when(t < skew_cut, F.lit(0)).otherwise(F.lit(1) + F.pmod(rest, n_rest))
    turn_idx = F.when(t < skew_cut, t).otherwise(F.floor(rest / n_rest))

    p0 = F.pmod(F.pmod(t, F.lit(10_000_000)) * F.lit(4_435_761), F.lit(10_000_000))
    p1 = F.pmod(t * 97 + 13, F.lit(100_000))
    p2 = F.pmod(t, F.lit(200))
    p3 = F.pmod(t * 3, F.lit(250))
    p4 = F.pmod(t * 31 + 7, F.lit(1000))

    role = F.element_at(F.array(*[F.lit(r) for r in ROLES]), (F.pmod(t, F.lit(4)) + 1).cast("int"))
    tool_cycle = F.element_at(
        F.array(*[F.lit(x) for x in TOOLS]), (F.pmod(F.floor(t / 4), F.lit(4)) + 1).cast("int")
    )
    tool = F.when(role == "tool", tool_cycle).otherwise(F.lit(""))
    tool_or_none = F.when(tool == "", F.lit("none")).otherwise(tool)

    tpl_idx = F.pmod(t * 7 + conv, F.lit(N_TEMPLATES))

    # Build the text with a lazy CASE chain of cheap concat/lpad/conv
    # expressions: only the selected template's string is computed per row.
    # (format_string/java.util.Formatter over an eager 20-element array was
    # ~20x more work per row and dominated generation wall-time.)
    def s(c) -> F.Column:
        return c.cast("string")

    def hx(c) -> F.Column:  # python's %x — lowercase hex
        return F.lower(F.conv(s(c), 10, 16))

    def cc(*parts) -> F.Column:
        return F.concat(*[F.lit(p) if isinstance(p, str) else p for p in parts])

    branches = [
        cc("Received block blk_", s(p0), " of size ", s(p1), " from 10.0.", s(p2), ".", s(p3)),
        cc("PacketResponder ", s(p4), " for block blk_", s(p0), " terminating"),
        cc("Verification succeeded for blk_", s(p0)),
        cc("Exception in receiveBlock for block blk_", s(p0),
           " java.io.IOException: Connection reset"),
        cc("user u", s(p0), " logged in from 10.1.", s(p2), ".", s(p3), ":", s(p4)),
        cc("query q", s(p4), " finished in ", s(p1), " ms rows=", s(p0)),
        cc("tool call ", tool_or_none, " started with payload 0x", hx(p0)),
        cc("tool call ", tool_or_none, " finished status ", s(F.pmod(p4, F.lit(5))),
           " in ", s(p1), " ms"),
        cc("retry ", s(F.pmod(p4, F.lit(7))), " of 7 for request 0x", hx(p0)),
        cc("cache miss for key 0x", hx(p0), " shard ", s(F.pmod(p4, F.lit(32)))),
        cc("writing checkpoint ", s(p4), " to /srv/job/", s(p2), "/ckpt"),
        cc("scheduler assigned task ", s(p0), " to worker w", s(p3)),
        cc("heartbeat from worker w", s(p3), " lag ", s(p1), " ms"),
        cc("error code ", s(F.pmod(p4, F.lit(256))), " while opening /srv/job/", s(p2), "/data"),
        cc("compaction of level ", s(F.pmod(p4, F.lit(7))), " finished bytes=", s(p1)),
        cc("session 0x", hx(p0), " expired after ", s(p1), " ms"),
        cc("planning query q", s(p4), " with ", s(F.pmod(p4, F.lit(12))), " joins"),
        cc("broadcast table t", s(p3), " size ", s(p1), " bytes"),
        cc("shuffle spill ", s(p1), " bytes in stage ", s(F.pmod(p4, F.lit(50)))),
        cc("assistant response generated tokens=", s(F.pmod(p1, F.lit(4096))),
           " latency=", s(p4), " ms"),
    ]
    text = branches[0]
    expr = None
    for i, b in enumerate(branches):
        expr = F.when(tpl_idx == i, b) if expr is None else expr.when(tpl_idx == i, b)
    text = expr.otherwise(F.lit(""))

    ts = F.timestamp_seconds(F.lit(EPOCH_2024) + turn_idx * 60 + F.pmod(conv, F.lit(37)))

    return df.select(
        # conv numbers stay < 1e6, so lpad == python's %06d here
        F.concat(F.lit("conv"), F.lpad(s(conv), 6, "0")).alias("conv_id"),
        turn_idx.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
