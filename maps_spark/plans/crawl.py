"""Crawl-scheduling driver: crawled pages -> next fetch plan.

The crawl sibling of :mod:`maps_spark.plans.web` — same
versioned-build / manifest-swap lifecycle — closing the loop a real
web pipeline runs between fetch rounds. Each stage is an engine
operator with its own oracle-checked gate; this driver composes them
and records the per-stage funnel:

1. **frontier** — :func:`operators.html.frontier_candidates`:
   outlinks resolved absolute + normalized, anti-joined against the
   crawled set, PageRank-scored per domain;
2. **robots** — :func:`operators.html.apply_robots` (skipped when
   ``rules=None``): disallow-prefix filtering per domain;
3. **politeness shards** — :func:`operators.html.frontier_shards`:
   per-host cap, host-hash shard assignment, written as
   ``shard=k`` hive partitions so fetch worker k reads its shard
   directory and owns all of its hosts' rate limits.

Scale: everything inherits the operators' shapes (one shared HTML
parse, norm_href-keyed anti-join + agg, broadcast PageRank table,
domain-partitioned cap window); the funnel counts are the only
driver-side values.
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from maps_spark.sources.tile_store import (finalise_build, read_manifest,
                                           write_manifest)


def run_crawl_plan(spark: SparkSession, pages: DataFrame,
                   out_root: str, rules: DataFrame | None = None,
                   per_host_cap: int = 5, n_shards: int = 8,
                   pr_iters: int = 3, versioned: bool = True,
                   keep_builds: int = 2) -> dict:
    """Run the scheduling pipeline; returns the manifest dict.

    ``pages`` is any (doc_id, source, html) frame of crawled pages;
    ``rules`` an optional (domain, disallow) robots table.
    """
    from maps_spark.operators.html import (apply_robots,
                                           frontier_candidates,
                                           frontier_shards,
                                           release_transients)

    t0 = time.time()
    build_id = time.strftime("%Y%m%d_%H%M%S") if versioned else None
    out_dir = f"{out_root}/builds/{build_id}" if versioned else out_root

    cand = frontier_candidates(pages, pr_iters=pr_iters)
    cand = cand.localCheckpoint()  # barrier: counted + filtered below
    release_transients()  # shared links frame served its purpose
    n_cand = cand.count()

    allowed = apply_robots(cand, rules) if rules is not None else cand
    plan = frontier_shards(allowed, per_host_cap, n_shards)
    plan = plan.localCheckpoint()  # barrier: stats + shard write
    n_allowed = allowed.count() if rules is not None else n_cand
    n_plan, n_hosts = plan.agg(
        F.count("*"), F.countDistinct("domain")).first()

    (plan.repartition("shard")
     .write.mode("overwrite").partitionBy("shard")
     .parquet(f"{out_dir}/fetch_plan"))

    manifest = {
        "stage": "crawl_plan", "per_host_cap": per_host_cap,
        "n_shards": n_shards, "pr_iters": pr_iters,
        "robots": rules is not None,
        "funnel": {"candidates": int(n_cand),
                   "allowed": int(n_allowed),
                   "planned": int(n_plan or 0),
                   "hosts": int(n_hosts or 0)},
        "build_sec": round(time.time() - t0, 2),
    }
    if versioned:
        finalise_build(out_root, build_id, manifest, keep=keep_builds)
    else:
        write_manifest(out_root, manifest)
    return read_manifest(out_root)


FETCH_PLAN_SCHEMA = ("norm_href string, domain string, "
                     "host_rank long, n_refs long, n_ref_docs long, "
                     "domain_rank long, shard long")


def read_fetch_plan(spark: SparkSession, out_root: str,
                    shard: int | None = None) -> DataFrame:
    """Fetch-worker entry: the active build's plan, optionally pruned
    to one shard directory (partition-pruned read — a worker never
    lists the other shards' files). An EMPTY plan (a converged crawl:
    everything already fetched or robots-blocked) writes no parquet
    part files under the dynamic partitioning, so the schema cannot
    be inferred — that normal terminal state comes back as an empty
    frame with the declared schema instead of an AnalysisException."""
    from pyspark.errors.exceptions.captured import AnalysisException

    from maps_spark.sources.tile_store import resolve_root
    try:
        df = spark.read.parquet(f"{resolve_root(out_root)}/fetch_plan")
        # Hive partition-column inference types shard=k as INT; the
        # empty-plan fallback declares it LONG — cast so both paths
        # match FETCH_PLAN_SCHEMA and union/compare cleanly.
        df = df.withColumn("shard", F.col("shard").cast("long"))
    except AnalysisException:
        df = spark.createDataFrame([], FETCH_PLAN_SCHEMA)
    return df.where(F.col("shard") == shard) if shard is not None else df
