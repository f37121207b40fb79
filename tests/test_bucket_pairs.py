"""Focused equivalence tests for the collect-members pair core
(`dedup._bucket_member_pairs`) that replaced the LSH family's
{size agg + anti-join + self-join} shape in round 11: the pair SET,
the per-pair multiplicity, and the hot-bucket cap must match the old
join shape exactly on adversarial data (hot buckets at/over/under the
cap, singletons, duplicate pairs across buckets)."""

import pyspark.sql.functions as F


def _reference_pairs(buckets, keys, max_bucket):
    """The pre-r11 shape, kept as the test oracle: cap via size
    aggregation + broadcast anti-join, then a two-sided self-join."""
    sizes = buckets.groupBy(*keys).agg(F.count("*").alias("bsz"))
    capped = buckets.join(
        F.broadcast(sizes.where(F.col("bsz") > max_bucket)), keys,
        "left_anti")
    a, b = capped.alias("a"), capped.alias("b")
    return (a.join(b, keys)
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b")))


def test_bucket_member_pairs_equals_join_shape(spark):
    from maps_spark.operators.dedup import _bucket_member_pairs

    # adversarial bucket layout: a hot bucket exactly AT the cap (kept),
    # one just OVER it (dropped whole), singletons, and two buckets
    # sharing the same pair so multiplicity is exercised
    rows = []
    for d in range(5):            # bucket (0, 100): size 5 == cap -> kept
        rows.append((d, 0, 100))
    for d in range(6):            # bucket (0, 200): size 6 > cap -> dropped
        rows.append((d, 0, 200))
    rows.append((7, 1, 300))      # singleton -> no pairs
    for d in (11, 12):            # same pair in two buckets -> multiplicity 2
        rows.append((d, 1, 400))
        rows.append((d, 2, 400))
    buckets = spark.createDataFrame(rows, "doc_id long, band int, bh long")

    got = (_bucket_member_pairs(buckets, ["band", "bh"], 5)
           .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n")))
    want = (_reference_pairs(buckets, ["band", "bh"], 5)
            .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n")))
    g = {(r.doc_a, r.doc_b): r.n for r in got.collect()}
    w = {(r.doc_a, r.doc_b): r.n for r in want.collect()}
    assert g == w
    assert g[(11, 12)] == 2               # cross-bucket multiplicity
    assert all(a < b for a, b in g)       # orientation preserved
    assert not any(k in g for k in       # the over-cap bucket dropped
                   [(0, 5)])


def test_bucket_member_pairs_random_twin(spark):
    """Randomized twin: pair set + multiplicity identical to the join
    shape over a pseudo-random bucket table (deterministic seed via
    hash columns, no RNG)."""
    from maps_spark.operators.dedup import _bucket_member_pairs
    base = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.pmod(F.xxhash64("id"), F.lit(4)).cast("int").alias("band"),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(17)).alias("bh"))
    got = sorted((r.doc_a, r.doc_b, r.n) for r in
                 _bucket_member_pairs(base, ["band", "bh"], 50)
                 .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n"))
                 .collect())
    want = sorted((r.doc_a, r.doc_b, r.n) for r in
                  _reference_pairs(base, ["band", "bh"], 50)
                  .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n"))
                  .collect())
    assert got == want and len(got) > 0
