"""BPE trainer/encoder tests: golden example, roundtrip, determinism.

No DuckDB oracle (the merge loop is sequential by nature) — these tests
ARE the correctness pin for operators/bpe.py.
"""

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet").cache()


def test_train_bpe_golden_sennrich_example(spark):
    # the canonical example corpus: low(5) lower(2) newest(6) widest(3)
    rows = [(1, " ".join(["low"] * 5 + ["lower"] * 2
                         + ["newest"] * 6 + ["widest"] * 3))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from maps_spark.operators.bpe import train_bpe
    merges = train_bpe(df, n_merges=4)
    # 'es' (9) then 'est' (9) then 'est</w>' (9) dominate, then lo (7)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    assert merges[3] == ("l", "o")


def test_encode_word_greedy_rank_order():
    from maps_spark.operators.bpe import encode_word
    ranks = {("e", "s"): 0, ("es", "t"): 1, ("est", "</w>"): 2,
             ("l", "o"): 3, ("lo", "w"): 4}
    assert encode_word("lowest", ranks) == ["low", "est</w>"]
    assert encode_word("low", ranks) == ["low", "</w>"]
    assert encode_word("xyz", ranks) == ["x", "y", "z", "</w>"]


def test_bpe_roundtrip_and_compression(spark, docs):
    from maps_spark.operators.bpe import END, bpe_encode, train_bpe
    merges = train_bpe(docs, n_merges=100)
    assert len(merges) > 0
    enc = bpe_encode(docs, merges)
    joined = enc.join(docs.select("doc_id", "text"), "doc_id")
    for r in joined.limit(50).collect():
        # roundtrip: strip spaces, split on the end-of-word marker
        rebuilt = r["bpe_text"].replace(" ", "").split(END)[:-1] \
            if r["bpe_text"] else []
        orig = [w for w in r["text"].split(" ") if w]
        assert rebuilt == orig
        # merged subwords never exceed char count + one marker per word
        assert r["n_bpe_tokens"] >= r["n_tokens"] or r["n_tokens"] == 0


def test_train_bpe_deterministic(spark, docs):
    from maps_spark.operators.bpe import train_bpe
    assert train_bpe(docs, n_merges=30) == train_bpe(docs, n_merges=30)


def test_distributed_trainer_matches_driver_trainer(spark):
    """The fully distributed merge loop reproduces the driver-side
    trainer merge for merge on the classic Sennrich example, and its
    merge table carries the exact pair counts."""
    from maps_spark.operators.bpe import train_bpe, train_bpe_distributed
    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new")],
        "doc_id long, text string")
    want = train_bpe(docs, n_merges=5)
    rows = train_bpe_distributed(docs, n_merges=5).orderBy("rank").collect()
    assert [(r.lhs, r.rhs) for r in rows] == want
    assert [r.rank for r in rows] == list(range(5))
    assert all(r.pair_count >= 2 for r in rows)
    # first merge is (l, o): 'low' appears in 4+1 words weighted 5+1+1
    assert (rows[0].lhs, rows[0].rhs) == ("l", "o")
