"""ANN quality tests: IVF and multi-probe SRP against the exact
brute-force baseline on real testdata embeddings."""

from __future__ import annotations

from pyspark.sql import functions as F

from kamu_engine_datafusion_spark.operators.similarity import (
    ivf_index,
    ivf_topk,
    ivf_write,
    srp_lsh_topk,
    topk_bruteforce,
)

SF = "/root/testdata/sf0.001"


def _corpus(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_ivf_recall_vs_bruteforce(spark):
    emb = _corpus(spark)
    query = emb.filter(F.col("vec_id") == 0)
    exact = [r["vec_id"] for r in topk_bruteforce(emb, query, k=10).collect()]

    assigned, model = ivf_index(emb, nlist=8)
    assigned = assigned.persist()
    approx = [
        r["vec_id"] for r in ivf_topk(assigned, model, query, k=10, nprobe=4).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert approx[0] == 0  # the query itself is always found
    assert recall >= 0.5  # nprobe=4 of nlist=8 must recover most of top-10
    # nprobe = nlist degenerates to exact search
    full = [
        r["vec_id"] for r in ivf_topk(assigned, model, query, k=10, nprobe=8).collect()
    ]
    assert full == exact
    assigned.unpersist()


def test_srp_multiprobe_recall_monotone(spark):
    emb = _corpus(spark)
    query = emb.filter(F.col("vec_id") == 0)
    exact = set(
        r["vec_id"] for r in topk_bruteforce(emb, query, k=10).collect()
    )

    def recall(probes: int) -> float:
        got = set(
            r["vec_id"]
            for r in srp_lsh_topk(
                emb, query, k=10, bits=6, hamming_probes=probes
            ).collect()
        )
        return len(got & exact) / 10

    r0, r4 = recall(0), recall(4)
    assert r4 >= r0  # probing more buckets never loses candidates
    assert r4 > 0  # and finds at least part of the true top-10


def test_ivf_partitioned_index_prunes_unprobed_lists(spark, tmp_path):
    """The written-partitioned IVF index must turn the nprobe filter into
    physical partition pruning: unprobed lists never reach the scan."""
    emb = _corpus(spark)
    query = emb.filter(F.col("vec_id") == 0)
    assigned, model = ivf_index(emb, nlist=8)
    idx_path = str(tmp_path / "ivf_index")
    ivf_write(assigned, idx_path)

    on_disk = spark.read.parquet(idx_path)
    out = ivf_topk(on_disk, model, query, k=10, nprobe=2, dim=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__list" in plan
    # pruning is physical: the scan reads at most nprobe of nlist lists
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "__list" in m.group(1), plan[:2000]

    # results identical to the in-memory path
    mem = [r["vec_id"] for r in ivf_topk(assigned, model, query, k=10, nprobe=2).collect()]
    disk = [r["vec_id"] for r in out.collect()]
    assert disk == mem
