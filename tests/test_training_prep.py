"""End-to-end training-prep driver tests (plans/training.py)."""

import os

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL


def test_run_training_prep_end_to_end(spark, tmp_path):
    from maps_spark.plans.training import (read_training_shards,
                                           run_training_prep)
    root = str(tmp_path / "prep")
    m = run_training_prep(spark, SF_SMALL, root, n_shards=4,
                          seq_budget=128)
    f = m["funnel"]
    assert f["docs_in"] >= f["kept"] >= f["sampled"] > 0
    assert f["sequences"] > 0
    # no budget given -> no downsampling below the curation survivors
    assert f["sampled"] == f["kept"]
    back = read_training_shards(spark, root)
    assert back.count() == f["sampled"]
    assert {"doc_id", "text", "seq_id", "seq_offset", "row_idx",
            "shard"} <= set(back.columns)
    sizes = [r["count"] for r in back.groupBy("shard").count().collect()]
    assert len(sizes) <= 4 and max(sizes) - min(sizes) <= 1
    # curation really dropped something at this SF
    assert f["kept"] < f["docs_in"]
    # versioned lifecycle: a second run repoints and rotates
    m2 = run_training_prep(spark, SF_SMALL, root, n_shards=4,
                           seq_budget=128)
    builds = sorted(os.listdir(f"{root}/builds"))
    assert len(builds) <= 2 and m2["build_id"] == builds[-1]


def test_training_prep_budget_downsamples(spark, tmp_path):
    from maps_spark.plans.training import run_training_prep
    root = str(tmp_path / "prep2")
    m = run_training_prep(spark, SF_SMALL, root, budget_tokens=500,
                          n_shards=2, seq_budget=128)
    f = m["funnel"]
    assert 0 < f["sampled"] < f["kept"]
    assert f["sampled_tokens"] <= 4 * 500  # hash-rate slack, wide bound


def test_jsonl_shards_match_parquet_shards(spark, tmp_path):
    """The JSONL export carries exactly the parquet export's rows and
    order: same shard membership, same row_idx sequence, parseable
    line-by-line."""
    import json
    import os

    from maps_spark.operators.packing import (write_jsonl_shards,
                                              write_training_shards)
    docs = (spark.read.parquet(f"{SF_SMALL}/documents.parquet")
            .select("doc_id", "text", "source"))
    pq, jl = str(tmp_path / "pq"), str(tmp_path / "jl")
    write_training_shards(docs, pq, n_shards=4)
    write_jsonl_shards(docs, jl, n_shards=4)
    pq_rows = {(r.shard, r.doc_id): r.row_idx
               for r in spark.read.parquet(pq).collect()}
    jl_rows = {}
    order_ok = True
    for shard_dir in sorted(os.listdir(jl)):
        if not shard_dir.startswith("shard="):
            continue
        shard = int(shard_dir.split("=")[1])
        last = -1
        for fname in sorted(os.listdir(f"{jl}/{shard_dir}")):
            if not fname.endswith(".json"):
                continue
            with open(f"{jl}/{shard_dir}/{fname}") as f:
                for line in f:
                    obj = json.loads(line)
                    jl_rows[(shard, obj["doc_id"])] = obj["row_idx"]
                    order_ok &= obj["row_idx"] > last
                    last = obj["row_idx"]
    assert jl_rows == pq_rows and len(jl_rows) == docs.count()
    assert order_ok  # in-file order == global-shuffle order
