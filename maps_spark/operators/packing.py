"""Sequence packing and document chunking for training-data prep.

Two standard steps between "curated documents" and "model batches":

- :func:`pack_sequences` lays documents end-to-end in a deterministic
  pseudo-random order (the same hash order as
  :func:`maps_spark.operators.corpus.hash_sample` — no RNG state) and
  chops the stream every ``budget`` tokens ("concat-then-chop"
  packing, the strategy used by most large-scale pretraining loaders).
  Output maps every document to its packed sequence id and the token
  offset where it begins, so a loader can materialize batches without
  re-scanning the corpus.
- :func:`chunk_documents` splits each document into overlapping
  fixed-size token windows (chunk/stride), the prep step for
  long-document training and for embedding-model corpora.

Scale notes: packing needs a GLOBAL running token count — the naive
``Window.orderBy`` with no partition key is a single-task sort that
dies at 100 TB. :func:`global_cumsum` instead range-partitions on the
order key, computes per-partition cumulative sums in parallel, and
closes the prefix with one bounded driver-side pass over the
per-partition totals (one row per partition — a few KB at any scale),
broadcast back as offsets. Exactly the classic distributed prefix-sum;
results are identical to the single-sort answer. Chunking is
embarrassingly parallel: split + sequence-explode + slice, all inside
whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from maps_spark.operators.corpus import _mix


def global_cumsum(df: DataFrame, value_col: str, order_cols: list[str],
                  partitions: int | None = None) -> DataFrame:
    """Add ``cum`` = running sum of ``value_col`` over the global order
    ``order_cols`` (inclusive of the current row), without a
    single-partition sort.

    Range-partition on the order key -> per-partition window cumsum ->
    per-partition totals (#partitions rows) prefix-summed on the driver
    and joined back as a broadcast offset. The totals collect is
    bounded by the partition count, not the data size.
    """
    spark = df.sparkSession
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (df.repartitionByRange(n, *order_cols)
              .withColumn("_pid", F.spark_partition_id()))
    w = (Window.partitionBy("_pid").orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = ranged.withColumn("_cum_local",
                              F.sum(value_col).over(w)).localCheckpoint()
    totals = {r["_pid"]: r["t"] for r in
              local.groupBy("_pid").agg(
                  F.sum(value_col).alias("t")).collect()}
    offs, acc = [], 0
    for pid in sorted(totals):
        offs.append((pid, acc))
        acc += totals[pid]
    off_df = spark.createDataFrame(offs, "_pid int, _off long")
    return (local.join(F.broadcast(off_df), "_pid")
            .withColumn("cum", (F.col("_cum_local") + F.col("_off"))
                        .cast("long"))
            .drop("_pid", "_cum_local", "_off"))


def pack_sequences(docs: DataFrame, budget: int = 512,
                   text_col: str = "text", id_col: str = "doc_id",
                   partitions: int | None = None) -> DataFrame:
    """Concat-then-chop packing plan: assign every document its packed
    sequence id and intra-sequence offset.

    Documents are ordered by the deterministic id mix (corpus-shuffle
    without RNG), token counts are whitespace tokens (matching
    :func:`maps_spark.operators.text.text_features`), and the token
    stream is cut every ``budget`` tokens. A document whose tokens
    straddle a cut spans ``n_seqs`` consecutive sequences — loaders
    that forbid straddling can re-pack the tail locally.

    Output: (doc_id, n_tokens, seq_id, seq_offset, n_seqs), all exact
    integers (oracle-safe).
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        _mix(F.col(id_col)).alias("ord"),
        F.size(F.split(F.col(text_col), " ")).cast("long")
        .alias("n_tokens"))
    cum = global_cumsum(base, "n_tokens", ["ord", "doc_id"], partitions)
    first = F.col("cum") - F.col("n_tokens")  # global index of first token
    seq = F.floor(first / budget).cast("long")
    return cum.select(
        "doc_id", "n_tokens",
        seq.alias("seq_id"),
        (first % budget).cast("long").alias("seq_offset"),
        (F.floor((F.col("cum") - 1) / budget).cast("long") - seq + 1)
        .alias("n_seqs"))


def pack_stats(packed: DataFrame, budget: int = 512) -> DataFrame:
    """Per-sequence occupancy of a packing plan: how many documents
    start in each sequence and how many of its tokens they contribute
    (straddling documents count toward the sequence they start in).
    Fill ratios near 1.0 everywhere except the final sequence mean the
    plan wastes no padding."""
    return (packed.groupBy("seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"))
        .select("seq_id", "n_docs", "n_tokens",
                F.floor(F.col("n_tokens") * 1_000_000 / budget)
                .cast("long").alias("fill_scaled")))


def chunk_documents(docs: DataFrame, chunk: int = 64, stride: int = 48,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Overlapping token windows per document: chunk size ``chunk``,
    step ``stride`` (overlap = chunk - stride). The final window of a
    document may be shorter than ``chunk``; every token appears in at
    least one window. Pure Column plumbing (split -> sequence ->
    posexplode -> slice) — no Python in the loop, fully codegen'd.

    Output: (doc_id, chunk_id, start_token, n_chunk_tokens, chunk_text).
    """
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(F.lit(0), F.size(toks) - 1, F.lit(stride))
    return (docs.select(F.col(id_col).alias("doc_id"),
                        toks.alias("toks"), starts.alias("starts"))
            .select("doc_id", "toks",
                    F.posexplode("starts").alias("chunk_id", "start"))
            .select(
                "doc_id",
                F.col("chunk_id").cast("long").alias("chunk_id"),
                F.col("start").cast("long").alias("start_token"),
                F.least(F.lit(chunk), F.size("toks") - F.col("start"))
                .cast("long").alias("n_chunk_tokens"),
                F.array_join(F.slice("toks", F.col("start") + 1,
                                     F.lit(chunk)), " ")
                .alias("chunk_text")))


def shard_assign(docs: DataFrame, n_shards: int = 8,
                 id_col: str = "doc_id",
                 partitions: int | None = None) -> DataFrame:
    """Deterministic global corpus shuffle + round-robin shard
    assignment — the "shuffle then shard" step that turns a curated
    corpus into data-parallel training inputs: rank every document by
    the RNG-free id mix (the same order :func:`pack_sequences` packs
    in), then deal ranks round-robin so shard sizes differ by at most
    one and worker k streams shard k in a reproducible order.

    The global rank comes from :func:`global_cumsum` (range-partition +
    bounded driver prefix close), NOT a single-partition window — the
    rank assignment scales.

    Output: (doc_id, row_idx, shard) with row_idx 0-based in the
    shuffled order and shard = row_idx % n_shards.
    """
    base = docs.select(F.col(id_col).alias("doc_id"),
                       _mix(F.col(id_col)).alias("ord"),
                       F.lit(1).cast("long").alias("_one"))
    cum = global_cumsum(base, "_one", ["ord", "doc_id"], partitions)
    idx = (F.col("cum") - 1).cast("long")
    return cum.select("doc_id", idx.alias("row_idx"),
                      (idx % n_shards).cast("long").alias("shard"))


def write_training_shards(docs: DataFrame, path: str, n_shards: int = 8,
                          id_col: str = "doc_id",
                          partitions: int | None = None) -> None:
    """Materialize the shuffled corpus as ``shard=k`` hive partitions,
    rows sorted by ``row_idx`` within each shard's files — a training
    loader reads its shard directory sequentially and sees the global
    shuffle order restricted to its rank, with no runtime shuffle and
    no RNG state to checkpoint.

    One corpus join against the (broadcast-sized per row) assignment,
    one shuffle keyed by shard; files are written sorted so resuming
    mid-epoch is an offset seek, not a re-sort.
    """
    asg = shard_assign(docs, n_shards, id_col, partitions)
    out = (docs.withColumnRenamed(id_col, "doc_id").join(asg, "doc_id")
           .repartition(n_shards, "shard")
           .sortWithinPartitions("shard", "row_idx"))
    out.write.mode("overwrite").partitionBy("shard").parquet(path)


def write_jsonl_shards(docs: DataFrame, path: str, n_shards: int = 8,
                       id_col: str = "doc_id",
                       partitions: int | None = None) -> None:
    """JSONL variant of :func:`write_training_shards` — the loader
    format most text-training stacks consume directly (one JSON object
    per line, ``shard=k`` directories, rows in global-shuffle order
    within each shard). Same deterministic assignment and same
    one-shuffle plan as the parquet writer; Spark's native JSON sink
    streams the lines (never a driver collect), and ``row_idx`` rides
    along so a resuming loader can seek by line offset.

    Parquet remains the analytical store; JSONL shards are the
    hand-off artifact at the training boundary.
    """
    asg = shard_assign(docs, n_shards, id_col, partitions)
    out = (docs.withColumnRenamed(id_col, "doc_id").join(asg, "doc_id")
           .repartition(n_shards, "shard")
           .sortWithinPartitions("shard", "row_idx"))
    out.write.mode("overwrite").partitionBy("shard").json(path)
