"""DuckDB SQL twin of the deterministic transcript generator + parse path.

The synthetic corpus (:mod:`logparser_spark.sources.transcripts`) is pure
modular arithmetic over the global turn number ``t`` plus a fixed
20-template bank, so the *expected* output of the flagship
parse→enrich→route→aggregate path is expressible in plain SQL with no
Spark and no Drain: re-derive ``(conv, turn_idx, role, tpl_idx, ts)``
from ``t``, map ``tpl_idx`` to the analytically-known mined template,
and take ``event_id = md5(template)[:8]``.

This turns the engine's core path — ``drain_assignments``,
``pipeline_sink_counts`` and the stable engine template tables — into
hash-checked driver-gate entries instead of rows-only checks.

Ground truth of the template mapping
------------------------------------
Masking (``DEFAULT_REX``) replaces ``blk_\\d+`` / IPv4(:port) / ``0x…``
hex / standalone integers with ``<*>``.  Tokens like ``u123`` / ``q42``
/ ``w7`` / ``t9`` survive masking (no word boundary between the letter
and the digits) but vary per row, as does the tool name — every miner
that groups by (token count, constant positions) therefore wildcard-?s
exactly those positions.  The result, per bank index, is the
``EXPECTED_TEMPLATES`` table below.  Empirically (pinned by the
``tests/test_entry_oracle_parity.py`` gate, which hash-compares every
engine's template table against this twin) drain, spell, iplom, ael,
logmine and lke all converge to exactly this
20-template set at every corpus size; lenma merges bank 15+19 (both
``… <*> ms`` tails) into one template; shiso and logsig produce
size-dependent extra splits, so their queries mine a PINNED 4000-turn
corpus and hash-check against the size-pinned literal tables below.

Scale note: the SQL twin generates ``n_turns`` rows inside DuckDB — it
is an *oracle*, used at sf≤0.01 (≤40 000 turns) by the driver gate; the
Spark side has no such bound.
"""

from __future__ import annotations

from logparser_spark.functions.hashing import bucket_sql

#: bank index → template the miners converge to (see module docstring).
EXPECTED_TEMPLATES: tuple[str, ...] = (
    "Received block <*> of size <*> from <*>",
    "PacketResponder <*> for block <*> terminating",
    "Verification succeeded for <*>",
    "Exception in receiveBlock for block <*> java.io.IOException: Connection reset",
    "user <*> logged in from <*>",
    "query <*> finished in <*> ms rows=<*>",
    "tool call <*> started with payload <*>",
    "tool call <*> finished status <*> in <*> ms",
    "retry <*> of <*> for request <*>",
    "cache miss for key <*> shard <*>",
    "writing checkpoint <*> to /srv/job/<*>/ckpt",
    "scheduler assigned task <*> to worker <*>",
    "heartbeat from worker <*> lag <*> ms",
    "error code <*> while opening /srv/job/<*>/data",
    "compaction of level <*> finished bytes=<*>",
    "session <*> expired after <*> ms",
    "planning query <*> with <*> joins",
    "broadcast table <*> size <*> bytes",
    "shuffle spill <*> bytes in stage <*>",
    "assistant response generated tokens=<*> latency=<*> ms",
)

#: LenMa (word-length-vector clustering) merges bank 15 and 19 — their
#: length vectors cosine-match — into one all-wildcard template.
LENMA_MERGED = "<*> <*> <*> <*> <*> ms"
LENMA_MERGED_IDXS = (15, 19)

#: engines whose mined set provably equals EXPECTED_TEMPLATES 1:1
#: (molfi's seeded NSGA-II + deterministic merge hill-climb converges to
#: the same set — verified at 2k/4k/8k/40k turns)
IDENTITY_ENGINES = ("drain", "spell", "iplom", "ael", "logmine", "lke", "molfi")

# generator constants — keep in lockstep with entry_queries._transcripts
N_CONVS = 200
SKEW_SHARE_PCT = 20
MAX_TURNS = 200_000  # _n_turns_for cap (sf0.1)
EPOCH_2024 = 1704067200


def expected_template_for(engine: str, tpl_idx: int) -> str:
    if engine == "lenma" and tpl_idx in LENMA_MERGED_IDXS:
        return LENMA_MERGED
    return EXPECTED_TEMPLATES[tpl_idx]


def _tpl_values(engine: str = "drain") -> str:
    rows = ", ".join(
        f"({i}, '{expected_template_for(engine, i)}')"
        for i in range(len(EXPECTED_TEMPLATES))
    )
    return f"(VALUES {rows}) AS tpl(tpl_idx, template)"


def transcripts_twin_cte() -> str:
    """CTE text producing the generator's ``(t, conv_id, turn_idx, role,
    tpl_idx, ts)`` for the driver's current scale.

    ``n_turns`` is recovered from the registered ``events`` view —
    ``least(4 * count(events), 200000)`` reproduces
    ``entry_queries._n_turns_for`` at every sf the gate runs at (events
    is 1e3/1e4/1e5 rows at sf 0.001/0.01/0.1).
    """
    n_rest = N_CONVS - 1
    return f"""
params AS (
  SELECT least((SELECT count(*) FROM events) * 4, {MAX_TURNS}) AS n_turns,
         (least((SELECT count(*) FROM events) * 4, {MAX_TURNS})
          * {SKEW_SHARE_PCT}) // 100 AS skew_cut
),
gen AS (
  SELECT range AS t,
         CASE WHEN range < skew_cut THEN 0
              ELSE 1 + ((range - skew_cut) % {n_rest}) END AS conv,
         CASE WHEN range < skew_cut THEN range
              ELSE (range - skew_cut) // {n_rest} END AS turn_idx
  FROM range({MAX_TURNS}) CROSS JOIN params
  WHERE range < n_turns
),
turns AS (
  SELECT t,
         'conv' || lpad(CAST(conv AS VARCHAR), 6, '0') AS conv_id,
         CAST(turn_idx AS INTEGER) AS turn_idx,
         CASE t % 4 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
                    WHEN 2 THEN 'system' ELSE 'tool' END AS role,
         CAST((t * 7 + conv) % 20 AS INTEGER) AS tpl_idx,
         epoch_ms(({EPOCH_2024} + turn_idx * 60 + (conv % 37)) * 1000) AS ts
  FROM gen
)"""


def sql_drain_assignments() -> str:
    """Expected (conv_id, turn_idx, event_id, matched) per turn."""
    return f"""
WITH {transcripts_twin_cte()}
SELECT conv_id, turn_idx,
       substring(md5(template), 1, 8) AS event_id,
       TRUE AS matched
FROM turns JOIN {_tpl_values()} USING (tpl_idx)
"""


def sql_pipeline_sink_counts(template_sink_buckets: int = 8) -> str:
    """Expected per-sink per-hour-window template counts.

    Mirrors ``with_sink_id`` (``role || '-t' || lpad(md5-bucket, 2, 0)``;
    every turn matches, so no ``dead`` sink) and ``sink_window_counts``
    (1-hour tumbling window == ``date_trunc('hour')`` in UTC).
    """
    ev = "substring(md5(template), 1, 8)"
    bucket = bucket_sql(ev, template_sink_buckets)
    return f"""
WITH {transcripts_twin_cte()},
assigned AS (
  SELECT role || '-t' || lpad(CAST({bucket} AS VARCHAR), 2, '0') AS sink_id,
         date_trunc('hour', ts) AS win_start,
         {ev} AS event_id
  FROM turns JOIN {_tpl_values()} USING (tpl_idx)
)
SELECT sink_id, win_start, event_id, CAST(count(*) AS BIGINT) AS n_turns
FROM assigned
GROUP BY sink_id, win_start, event_id
"""


# -- size-pinned literal oracles (shiso / logsig) ---------------------------
#
# shiso and logsig split templates in size-dependent ways (capacity-tree
# node splits / signature-group assignment drift), so no corpus-size-
# parametric SQL derivation exists.  Their driver queries therefore mine
# a PINNED 4000-turn corpus (``transcripts_df(n_turns=4000, n_convs=200,
# skew_share_pct=20)`` — the sf0.001 shape — at every sf), which makes
# the template table a fixed literal set: the engines are deterministic
# end-to-end (distributed == sequential, pinned by tests/test_shiso.py /
# test_logsig.py), so the output below is frozen once and re-verified on
# every run of tests/test_entry_oracle_parity.py.  Shiso keeps two
# clusters that RENDER the same template for three bank lines (same
# event_id, separate counts) — the literal table preserves those rows.

SHISO_PINNED_4000: tuple[tuple[str, int], ...] = (
    ("Exception in receiveBlock for block <*> java.io.IOException: Connection reset", 199),
    ("PacketResponder <*> for block <*> terminating", 203),
    ("Received block <*> of size <*> from <*>", 200),
    ("Verification succeeded for <*>", 199),
    ("assistant response generated tokens=<*> latency=<*> ms", 199),
    ("broadcast table <*> size <*> bytes", 200),
    ("broadcast table <*> size <*> bytes", 2),
    ("cache miss for key <*> shard <*>", 203),
    ("compaction of level <*> finished bytes=<*>", 200),
    ("error code <*> while opening /srv/job/<*>/data", 202),
    ("heartbeat from worker <*> lag <*> ms", 199),
    ("planning query <*> with <*> joins", 197),
    ("planning query <*> with <*> joins", 2),
    ("query <*> finished in <*> ms rows=<*>", 202),
    ("retry <*> of <*> for request <*>", 199),
    ("scheduler assigned task <*> to worker <*>", 199),
    ("session <*> expired after <*> ms", 199),
    ("shuffle spill <*> bytes in stage <*>", 199),
    ("tool call <*> finished status <*> in <*> ms", 200),
    ("tool call <*> started with payload <*>", 199),
    ("user <*> logged in from <*>", 196),
    ("user <*> logged in from <*>", 3),
    ("writing checkpoint <*> to /srv/job/<*>/ckpt", 199),
)

LOGSIG_PINNED_4000: tuple[tuple[str, int], ...] = (
    ("Exception in receiveBlock for block <*> java.io.IOException: Connection reset", 199),
    ("PacketResponder <*> for block terminating", 203),
    ("Received block of <*> from size", 399),
    ("Verification succeeded for <*>", 199),
    ("assistant response generated tokens=<*> latency=<*> ms", 199),
    ("broadcast table size <*> bytes", 202),
    ("cache miss for key <*> shard", 203),
    ("compaction of level <*> finished bytes=<*>", 200),
    ("error code <*> while opening /srv/job/<*>/data", 202),
    ("planning query with <*> joins", 199),
    ("query finished in <*> ms rows=<*>", 202),
    ("retry <*> of for request", 199),
    ("scheduler assigned task <*> to worker", 199),
    ("session <*> expired after ms", 199),
    ("shuffle spill <*> bytes in stage", 199),
    ("tool call none finished status <*> in ms", 200),
    ("tool call none started with payload <*>", 199),
    ("user logged in from <*>", 199),
    ("writing checkpoint <*> to /srv/job/<*>/ckpt", 199),
)

PINNED_TEMPLATE_TABLES: dict[str, tuple[tuple[str, int], ...]] = {
    "shiso": SHISO_PINNED_4000,
    "logsig": LOGSIG_PINNED_4000,
}

#: the corpus size the pinned tables were mined at (and that the
#: corresponding queries() entries mine at, at every sf)
PINNED_N_TURNS = 4_000


def sql_pinned_template_table(engine: str) -> str:
    """Literal (event_id, template, occurrences) oracle for an engine
    whose driver query mines the PINNED_N_TURNS corpus."""
    rows = PINNED_TEMPLATE_TABLES[engine]
    vals = ", ".join(f"('{t}', {c})" for t, c in rows)
    return (
        "SELECT substring(md5(template), 1, 8) AS event_id, template, "
        "CAST(occurrences AS BIGINT) AS occurrences "
        f"FROM (VALUES {vals}) t(template, occurrences)"
    )


def sql_template_table(engine: str) -> str:
    """Expected (event_id, template, occurrences) for an engine whose
    mined set is a deterministic function of the bank (IDENTITY_ENGINES
    1:1; lenma with the 15+19 merge)."""
    if engine not in IDENTITY_ENGINES and engine != "lenma":
        raise ValueError(f"no analytic template oracle for engine {engine!r}")
    return f"""
WITH {transcripts_twin_cte()}
SELECT substring(md5(template), 1, 8) AS event_id, template,
       CAST(count(*) AS BIGINT) AS occurrences
FROM turns JOIN {_tpl_values(engine)} USING (tpl_idx)
GROUP BY template
"""
