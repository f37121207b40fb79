"""Data-quality expectation checks: declarative constraint validation
over any table, one report row per rule.

The Deequ/Great-Expectations-style contract a production pipeline
runs before promoting a build: row-level conditions (non-null, range,
set membership, regex shape) and key-uniqueness constraints, each
reported as (rule_id, n_rows, n_violations, passed). The reference
(gbif/maps) validates its inputs implicitly through filters
(OccurrenceFilters.java) — this makes the contract explicit and
reportable, which is what a 100 TB ingest needs before a multi-hour
backfill consumes a bad snapshot.

Scale shapes:

- ALL row-level conditions evaluate in ONE scan — each rule is a
  ``sum(condition violated ? 1 : 0)`` aggregate over the same pass,
  map-side combined; adding a rule adds a column, not a scan;
- each uniqueness rule is one (key columns) aggregation
  (``n_rows - n_distinct`` violations); key sets share nothing so
  they shuffle independently — still one pass per key set, never a
  self-join;
- the report is rules-count rows: collect-safe at any corpus size.

Determinism: counts are exact integers; the rule_id order is the
caller's dict order (and the gate sorts by rule_id) — hash-stable
in both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def expectation_report(df: DataFrame,
                       conditions: dict[str, str] | None = None,
                       unique: dict[str, list[str]] | None = None
                       ) -> DataFrame:
    """Validate ``df`` against declarative expectations.

    ``conditions`` maps rule_id -> a row-level SQL predicate that
    every row must satisfy (NULL predicate results count as
    violations, like Deequ); ``unique`` maps rule_id -> the column
    list that must be duplicate-free (violations = n_rows minus
    distinct key count, i.e. the number of surplus rows; a row with
    any NULL key component is never a valid distinct key, so it
    counts toward the violations — Spark's count_distinct
    convention, mirrored explicitly in the oracle).

    Output: (rule_id, n_rows, n_violations, passed), one row per
    rule."""
    conditions = conditions or {}
    unique = unique or {}
    if not conditions and not unique:
        raise ValueError("expectation_report needs at least one rule")
    reports = []
    if conditions:
        aggs = [F.count("*").cast("long").alias("_n")]
        for i, cond in enumerate(conditions.values()):
            # coalesce the sum: over an EMPTY table sum() is NULL and
            # `passed` would be NULL instead of true — an empty table
            # violates nothing
            aggs.append(F.coalesce(F.sum(
                F.when(F.coalesce(F.expr(cond), F.lit(False)), 0)
                .otherwise(1)), F.lit(0)).cast("long").alias(f"_v{i}"))
        # ONE aggregation row for every condition rule, unpivoted via
        # stack — a per-rule union would re-plan (and re-scan) the
        # aggregation once per rule. Rule ids are interpolated into
        # the stack() SQL as string literals, so quotes must be
        # SQL-escaped or a rule id containing ' breaks the query
        # (ADVICE r7).
        stack = ", ".join(f"""'{rid.replace("'", "''")}', _v{i}"""
                          for i, rid in enumerate(conditions))
        reports.append(df.agg(*aggs).select(
            F.expr(f"stack({len(conditions)}, {stack}) "
                   "AS (rule_id, n_violations)"),
            F.col("_n").alias("n_rows"))
            .select("rule_id", "n_rows", "n_violations"))
    for rid, cols in unique.items():
        reports.append(df.agg(
            F.count("*").cast("long").alias("n_rows"),
            (F.count("*") - F.count_distinct(*[F.col(c) for c in cols]))
            .cast("long").alias("n_violations"))
            .select(F.lit(rid).alias("rule_id"), "n_rows",
                    "n_violations"))
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select("rule_id", "n_rows", "n_violations",
                      (F.col("n_violations") == 0).alias("passed"))


def column_stats(df: DataFrame,
                 cols: list[str] | None = None,
                 approx: bool = False,
                 rsd: float = 0.02) -> DataFrame:
    """Per-column profile of a snapshot — the raw material for
    cross-build drift detection: (column, n_rows, n_null,
    n_distinct), one row per column, ALL columns in ONE scan (the
    same stack-unpivot discipline as :func:`expectation_report`;
    Spark plans the multi-distinct aggregate as one expand pass).
    Exact integers, so the drift gate hash-matches bitwise.

    ``approx=True`` swaps ``count_distinct`` for HLL
    ``approx_count_distinct(rsd)``: the exact multi-distinct plan
    EXPANDS the input (one row per profiled column per input row)
    and shuffles every distinct value — fine at gate scale, the
    dominant cost on a 100 TB snapshot. The approx plan keeps the
    plain partial-aggregate shape (no Expand, fixed-size sketches
    merged map-side); drift tolerances must then absorb ~rsd of
    n_distinct noise, so keep the exact mode for hash gates."""
    cols = cols or df.columns
    aggs = [F.coalesce(F.count("*"), F.lit(0)).cast("long")
            .alias("_n")]
    for i, c in enumerate(cols):
        aggs.append(F.coalesce(F.sum(
            F.when(F.col(c).isNull(), 1).otherwise(0)), F.lit(0))
            .cast("long").alias(f"_u{i}"))
        distinct = (F.approx_count_distinct(F.col(c), rsd) if approx
                    else F.count_distinct(F.col(c)))
        aggs.append(F.coalesce(distinct, F.lit(0))
                    .cast("long").alias(f"_d{i}"))
    stack = ", ".join(
        f"""'{c.replace("'", "''")}', _u{i}, _d{i}"""
        for i, c in enumerate(cols))
    return (df.agg(*aggs).select(
        F.expr(f"stack({len(cols)}, {stack}) "
               "AS (column, n_null, n_distinct)"),
        F.col("_n").alias("n_rows"))
        .select("column", "n_rows", "n_null", "n_distinct"))


def snapshot_drift(old_stats: DataFrame, new_stats: DataFrame,
                   tol_permille: int = 100,
                   metrics: tuple[str, ...] = ("n_rows", "n_null",
                                               "n_distinct")
                   ) -> DataFrame:
    """Column-level drift between two snapshot profiles
    (:func:`column_stats` tables) — the anomaly check a 100 TB
    ingest runs before promoting a build over yesterday's: every
    (column, metric) pair long-format with the exact integer drift

        drift_permille = |new - old| * 1000 div max(old, 1)

    and ``flagged`` when it exceeds ``tol_permille`` OR the column
    exists on only one side (schema drift). Cost: the two profile
    scans; the diff itself is a columns-count join.

    ``metrics`` names the profile columns to unpivot — the default is
    the :func:`column_stats` shape; pass ``("n_rows", "sum_v",
    "min_v", "max_v")`` for :func:`numeric_stats` profiles."""
    mets = ", ".join(f"'{m}', {m}" for m in metrics)

    def unpivot(s: DataFrame, v: str) -> DataFrame:
        return s.select("column", F.expr(
            f"stack({len(metrics)}, {mets}) AS (metric, {v})"))

    j = (unpivot(old_stats, "old_value")
         .join(unpivot(new_stats, "new_value"),
               ["column", "metric"], "full_outer"))
    both = F.col("old_value").isNotNull() & F.col("new_value").isNotNull()
    drift = F.expr("abs(new_value - old_value) * 1000 "
                   "div greatest(old_value, 1)")
    return j.select(
        "column", "metric",
        F.coalesce("old_value", F.lit(-1)).cast("long")
        .alias("old_value"),
        F.coalesce("new_value", F.lit(-1)).cast("long")
        .alias("new_value"),
        F.when(both, drift).otherwise(F.lit(1000))
        .cast("long").alias("drift_permille"),
        (~both | (F.when(both, drift) > F.lit(tol_permille)))
        .alias("flagged"))


def numeric_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact integer range profile of INTEGER-typed columns —
    (column, n_rows, sum_v, min_v, max_v), all columns in ONE scan —
    the drift signal :func:`column_stats` cannot see: a column whose
    null/distinct counts hold while its value RANGE shifts (ids gone
    negative, a unit change, an epoch regression). BIGINT-exact in
    both engines, so the gate hash-matches bitwise; empty-table
    aggregates coalesce to 0 (the documented sentinel). Feed two
    profiles to :func:`snapshot_drift` with ``metrics=("n_rows",
    "sum_v", "min_v", "max_v")``."""
    aggs = [F.coalesce(F.count("*"), F.lit(0)).cast("long")
            .alias("_n")]
    for i, c in enumerate(cols):
        for tag, fn in (("s", F.sum), ("mn", F.min), ("mx", F.max)):
            aggs.append(F.coalesce(fn(F.col(c)), F.lit(0))
                        .cast("long").alias(f"_{tag}{i}"))
    stack = ", ".join(
        f"""'{c.replace("'", "''")}', _s{i}, _mn{i}, _mx{i}"""
        for i, c in enumerate(cols))
    return (df.agg(*aggs).select(
        F.expr(f"stack({len(cols)}, {stack}) "
               "AS (column, sum_v, min_v, max_v)"),
        F.col("_n").alias("n_rows"))
        .select("column", "n_rows", "sum_v", "min_v", "max_v"))


def keyed_delta(cur: DataFrame, prev: DataFrame,
                key_cols: list[str],
                compare_cols: list[str] | None = None) -> DataFrame:
    """Row-level CDC between two snapshots of a keyed table — the
    row-granular complement to :func:`snapshot_drift`'s column stats,
    and the natural feeder for incremental curation (re-dedup and
    re-score only what actually changed instead of the whole corpus).

    Output: key columns + ``change`` in {'added', 'removed',
    'changed'} + ``changed_cols`` (comma-joined differing column
    names in ``compare_cols`` order; '' for added/removed).
    Unchanged rows are dropped. Comparison is null-safe per column
    (``<=>``), never a serialized row hash — no cross-engine float/
    string formatting hazards, and the differing columns come free.

    Cost: ONE full-outer shuffle join on the key; the per-row compare
    is codegen'd column equality. At 100 TB both snapshots should be
    bucketed by the key so the join co-locates without a shuffle."""
    compare_cols = compare_cols or [
        c for c in cur.columns if c not in key_cols]
    if not compare_cols:
        raise ValueError(
            "keyed_delta needs at least one non-key column to compare")
    c = cur.select(*key_cols,
                   *[F.col(x).alias(f"_c_{x}") for x in compare_cols],
                   F.lit(1).alias("_in_cur"))
    p = prev.select(*key_cols,
                    *[F.col(x).alias(f"_p_{x}") for x in compare_cols],
                    F.lit(1).alias("_in_prev"))
    j = c.join(p, key_cols, "full_outer")
    diffs = [~F.col(f"_c_{x}").eqNullSafe(F.col(f"_p_{x}"))
             for x in compare_cols]
    any_diff = diffs[0]
    for d in diffs[1:]:
        any_diff = any_diff | d
    change = (F.when(F.col("_in_prev").isNull(), "added")
              .when(F.col("_in_cur").isNull(), "removed")
              .otherwise("changed"))
    both = F.col("_in_cur").isNotNull() & F.col("_in_prev").isNotNull()
    changed_cols = F.when(both, F.concat_ws(",", *[
        F.when(d, F.lit(x)) for x, d in zip(compare_cols, diffs)
    ])).otherwise(F.lit(""))
    return (j.where(~both | any_diff)
            .select(*key_cols, change.alias("change"),
                    changed_cols.alias("changed_cols")))


def keyed_delta_select() -> str:
    """DuckDB twin of the ``snapshot_delta`` gate: documents vs a
    deterministic prior snapshot (every 5th doc absent from the prior
    -> added; every 7th surviving doc's text reversed -> changed;
    synthetic prior-only ids -> removed)."""
    return """WITH prev AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 7 = 0 THEN reverse(text) ELSE text END
           AS text
  FROM documents WHERE doc_id % 5 <> 0
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, source, text
  FROM documents WHERE doc_id % 11 = 0),
j AS (SELECT cur.doc_id AS ck, prev.doc_id AS pk,
             cur.source AS cs, prev.source AS ps,
             cur.text AS ct, prev.text AS pt
      FROM documents cur FULL OUTER JOIN prev
        ON cur.doc_id = prev.doc_id)
SELECT COALESCE(ck, pk) AS doc_id,
       CASE WHEN pk IS NULL THEN 'added'
            WHEN ck IS NULL THEN 'removed'
            ELSE 'changed' END AS change,
       CASE WHEN pk IS NULL OR ck IS NULL THEN ''
            ELSE concat_ws(',',
              CASE WHEN cs IS DISTINCT FROM ps THEN 'source' END,
              CASE WHEN ct IS DISTINCT FROM pt THEN 'text' END)
       END AS changed_cols
FROM j
WHERE pk IS NULL OR ck IS NULL
   OR (cs IS DISTINCT FROM ps) OR (ct IS DISTINCT FROM pt)"""


def numeric_drift_select(tol_permille: int = 100) -> str:
    """DuckDB twin of the ``numeric_drift`` gate: events id columns
    vs a drifted twin (every 9th event dropped, user_id shifted
    +1000) through :func:`numeric_stats` + :func:`snapshot_drift`."""
    def stats(src: str) -> str:
        parts = []
        for c in ("event_id", "user_id"):
            parts.append(f"""SELECT '{c}' AS "column",
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(sum({c}), 0) AS BIGINT) AS sum_v,
       CAST(COALESCE(min({c}), 0) AS BIGINT) AS min_v,
       CAST(COALESCE(max({c}), 0) AS BIGINT) AS max_v
FROM {src}""")
        return "\nUNION ALL\n".join(parts)

    mets = ("('n_rows', n_rows), ('sum_v', sum_v), "
            "('min_v', min_v), ('max_v', max_v)")
    return f"""WITH drifted AS (
  SELECT event_id, user_id + 1000 AS user_id
  FROM events WHERE event_id % 9 <> 0),
os AS ({stats('events')}),
ns AS ({stats('drifted')}),
ol AS (SELECT "column", m.metric, m.v AS old_value
       FROM os, LATERAL (VALUES {mets}) m(metric, v)),
nl AS (SELECT "column", m.metric, m.v AS new_value
       FROM ns, LATERAL (VALUES {mets}) m(metric, v))
SELECT COALESCE(ol."column", nl."column") AS "column",
       COALESCE(ol.metric, nl.metric) AS metric,
       CAST(COALESCE(old_value, -1) AS BIGINT) AS old_value,
       CAST(COALESCE(new_value, -1) AS BIGINT) AS new_value,
       CAST(CASE WHEN old_value IS NOT NULL AND new_value IS NOT NULL
              THEN (abs(new_value - old_value) * 1000)
                   // greatest(old_value, 1)
              ELSE 1000 END AS BIGINT) AS drift_permille,
       (old_value IS NULL OR new_value IS NULL OR
        (abs(new_value - old_value) * 1000)
          // greatest(old_value, 1) > {tol_permille}) AS flagged
FROM ol FULL OUTER JOIN nl
  ON ol."column" = nl."column" AND ol.metric = nl.metric"""


def snapshot_drift_select(tol_permille: int = 100) -> str:
    """DuckDB twin of the ``snapshot_drift`` gate: documents vs a
    deterministically drifted twin (10% of rows dropped, text nulled
    on every 7th surviving doc)."""
    def stats(src: str) -> str:
        parts = []
        for c in ("doc_id", "source", "text"):
            parts.append(f"""SELECT '{c}' AS "column",
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
FROM {src}""")
        return "\nUNION ALL\n".join(parts)

    return f"""WITH drifted AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 7 = 0 THEN NULL ELSE text END AS text
  FROM documents WHERE doc_id % 10 <> 0),
os AS ({stats('documents')}),
ns AS ({stats('drifted')}),
ol AS (SELECT "column", m.metric, m.v AS old_value
       FROM os, LATERAL (VALUES ('n_rows', n_rows),
                                ('n_null', n_null),
                                ('n_distinct', n_distinct)) m(metric, v)),
nl AS (SELECT "column", m.metric, m.v AS new_value
       FROM ns, LATERAL (VALUES ('n_rows', n_rows),
                                ('n_null', n_null),
                                ('n_distinct', n_distinct)) m(metric, v))
SELECT COALESCE(ol."column", nl."column") AS "column",
       COALESCE(ol.metric, nl.metric) AS metric,
       CAST(COALESCE(old_value, -1) AS BIGINT) AS old_value,
       CAST(COALESCE(new_value, -1) AS BIGINT) AS new_value,
       CAST(CASE WHEN old_value IS NOT NULL AND new_value IS NOT NULL
              THEN (abs(new_value - old_value) * 1000)
                   // greatest(old_value, 1)
              ELSE 1000 END AS BIGINT) AS drift_permille,
       (old_value IS NULL OR new_value IS NULL OR
        (abs(new_value - old_value) * 1000)
          // greatest(old_value, 1) > {tol_permille}) AS flagged
FROM ol FULL OUTER JOIN nl
  ON ol."column" = nl."column" AND ol.metric = nl.metric"""


def evaluate_contract(df: DataFrame, contract: dict) -> dict:
    """Evaluate a build-promotion contract — the gate a pipeline
    driver runs on its INPUT before spending a multi-hour build on a
    bad snapshot. ``contract`` is ``{"conditions": {rule_id:
    predicate}, "unique": {rule_id: [cols]}, "waived": [rule_id]}``;
    waived rules are evaluated and recorded but never block.

    Returns ``{"report": [rule rows], "failed": [non-waived failed
    rule ids], "ok": bool}`` — collect-safe (rules-count rows)."""
    res = expectation_report(df, contract.get("conditions"),
                             contract.get("unique"))
    waived = set(contract.get("waived") or ())
    report = [r.asDict() for r in res.collect()]
    failed = sorted(r["rule_id"] for r in report
                    if not r["passed"] and r["rule_id"] not in waived)
    return {"report": report, "failed": failed, "ok": not failed}


_PROFILE_SCHEMA = ("column string, n_rows long, n_null long, "
                   "n_distinct long")


def promotion_gate(df: DataFrame, contract: dict,
                   prior_manifest: dict | None = None) -> dict:
    """The full build-promotion check a pipeline driver runs on its
    input: rule expectations (:func:`evaluate_contract`, when the
    contract has ``conditions``/``unique``), a recorded per-column
    ``profile`` (``contract["profile"] = [cols]``), and — when the
    PRIOR build's manifest carries a profile and the contract sets
    ``drift_tol_permille`` — a :func:`snapshot_drift` comparison
    against it (``drift_waived`` columns never block; a first build
    with no prior profile bootstraps without a drift check).

    Returns ``{"expectations": ..., "profile": [...], "drift": ...,
    "ok": bool}`` — every piece JSON-able for the manifest."""
    if not any(k in contract for k in ("conditions", "unique",
                                       "profile")):
        # a typo'd contract ({"condtions": ...}) must fail loudly,
        # not rubber-stamp the build
        raise ValueError(
            "promotion contract has no conditions/unique/profile "
            f"keys: {sorted(contract)}")
    out: dict = {"expectations": None, "profile": None,
                 "drift": None, "ok": True}
    if contract.get("conditions") or contract.get("unique"):
        out["expectations"] = evaluate_contract(df, contract)
        out["ok"] = out["expectations"]["ok"]
    cols = contract.get("profile")
    if cols:
        out["profile"] = [r.asDict()
                          for r in column_stats(df, cols).collect()]
        tol = contract.get("drift_tol_permille")
        prior = (prior_manifest or {}).get("profile")
        if tol is not None and prior:
            spark = df.sparkSession
            old = spark.createDataFrame(
                [(d["column"], d["n_rows"], d["n_null"],
                  d["n_distinct"]) for d in prior], _PROFILE_SCHEMA)
            new = spark.createDataFrame(
                [(d["column"], d["n_rows"], d["n_null"],
                  d["n_distinct"]) for d in out["profile"]],
                _PROFILE_SCHEMA)
            rows = [r.asDict() for r in
                    snapshot_drift(old, new, tol).collect()]
            waived = set(contract.get("drift_waived") or ())
            failed = sorted({r["column"] for r in rows
                             if r["flagged"]
                             and r["column"] not in waived})
            out["drift"] = {"report": rows, "failed": failed,
                            "ok": not failed}
            out["ok"] = out["ok"] and not failed
    return out


# gate configuration over the documents table — a realistic contract
# with one DELIBERATELY failing rule (n_chars >= 100) so the report
# proves it counts violations rather than just rubber-stamping
GATE_CONDITIONS = {
    "doc_id_not_null": "doc_id IS NOT NULL",
    "doc_id_non_negative": "doc_id >= 0",
    "text_not_null": "text IS NOT NULL",
    "n_chars_matches_text": "n_chars = length(text)",
    "n_chars_min_100": "n_chars >= 100",
    "source_shape": "source LIKE 'src%'",
}
GATE_UNIQUE = {
    "doc_id_unique": ["doc_id"],
    "source_doc_unique": ["source", "doc_id"],
}


def expectation_report_select() -> str:
    """DuckDB twin of expectation_report with the gate rules."""
    parts = []
    for rid, cond in GATE_CONDITIONS.items():
        parts.append(f"""SELECT '{rid}' AS rule_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(sum(CASE WHEN COALESCE({cond}, FALSE)
                         THEN 0 ELSE 1 END), 0)
            AS BIGINT) AS n_violations
FROM documents""")
    for rid, cols in GATE_UNIQUE.items():
        key = ", ".join(cols)
        notnull = " AND ".join(f"{c} IS NOT NULL" for c in cols)
        parts.append(f"""SELECT '{rid}' AS rule_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(DISTINCT ({key}))
              FILTER (WHERE {notnull}) AS BIGINT) AS n_violations
FROM documents""")
    u = "\nUNION ALL\n".join(parts)
    return f"""SELECT rule_id, n_rows, n_violations,
       (n_violations = 0) AS passed
FROM ({u})"""
