"""The blocked (matmul) cosine top-k must agree with the declarative
SQL baseline that is oracle-checked against DuckDB."""

from pyspark.sql import functions as F

from nifi_processors_spark.operators.similarity import cosine_topk_blocked

SF = "/root/testdata/sf0.001"


def test_blocked_topk_matches_sql_baseline(spark):
    from nifi_processors_spark.plans.sql_queries import QUERIES

    baseline = QUERIES["emb_cosine_topk"][0](spark, SF)
    base = {
        (r["qid"], r["rk"]): (r["vec_id"], r["cos_sim"])
        for r in baseline.collect()
    }

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    blocked = cosine_topk_blocked(emb, q, k=5)
    got = {
        (r["qid"], r["rk"]): (r["vec_id"], r["cos_sim"])
        for r in blocked.collect()
    }
    assert got.keys() == base.keys()
    for key in base:
        assert got[key][0] == base[key][0], (key, got[key], base[key])
        assert abs(got[key][1] - base[key][1]) < 1e-9
