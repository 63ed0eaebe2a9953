"""Semantics tests for simops' SemDeDup on a constructed embedding corpus.

The driver-table oracle gate (test_entry.py) pins Spark/DuckDB engine parity
on the synthetic embeddings; these pin the BEHAVIOR the operator exists for
— cluster-scoped near-dup dropping with a min-id keeper — on vectors whose
assignments and dot products are known by construction.  All components are
exactly representable in float32 so quantization is drift-free by design.
"""

import pytest

from htmlgraft import simops

DIM = 64


def _vec(*pairs):
    v = [0.0] * DIM
    for i, x in pairs:
        v[i] = x
    return v


@pytest.fixture(scope="module")
def sem_view(spark):
    # centroids: the first N_LIST vec_ids are unit basis vectors e_0..e_15
    rows = [(i, _vec((i, 1.0))) for i in range(simops.N_LIST)]
    # 100/101: identical vectors pointing at e_2 — cluster 2, and
    # quantized dot with centroid 2 = 750*1000 = 750000 >= SEM_TH
    rows += [(100, _vec((2, 0.75))), (101, _vec((2, 0.75)))]
    # 103/104: mutual near-dups (dot = 750*500*2 = 750000 >= SEM_TH) that
    # a tiny 0.125 pull assigns to DIFFERENT clusters (7 vs 9); their dot
    # with any centroid is 125000 < SEM_TH
    rows += [
        (103, _vec((20, 0.75), (21, 0.5), (7, 0.125))),
        (104, _vec((20, 0.5), (21, 0.75), (9, 0.125))),
    ]
    # 105: no near-dup anywhere (orthogonal to everything above SEM_TH)
    rows += [(105, _vec((30, 0.75), (3, 0.125)))]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).createOrReplaceTempView("sem_emb")
    return {vid for vid, _ in rows}


def test_semdedup_keeper_and_cluster_scope(spark, sem_view):
    out = {
        r["vec_id"]: (r["list_id"], r["is_kept"])
        for r in spark.sql(
            simops.semdedup_sql(duck=False, emb="sem_emb")
        ).collect()
    }
    assert set(out) == sem_view  # one verdict row per vector
    # coarse assignment: centroids self-assign; the pulls land as designed
    assert out[100][0] == 2 and out[101][0] == 2
    assert out[103][0] == 7 and out[104][0] == 9 and out[105][0] == 3
    # min-id keeper inside cluster 2: centroid 2 kept, both satellites drop
    assert out[2] == (2, 1)
    assert out[100][1] == 0 and out[101][1] == 0
    # cluster-scoped relaxation: 103/104 are near-dups of each other but
    # sit in different clusters, so BOTH survive (SemDeDup's documented
    # recall trade for never joining across clusters)
    assert out[103][1] == 1 and out[104][1] == 1
    # no near-dup -> kept; all centroids except none are kept
    assert out[105][1] == 1
    assert all(out[i][1] == 1 for i in range(simops.N_LIST))


def test_semdedup_drop_requires_smaller_kept_or_dropped_neighbor(spark, sem_view):
    """Every dropped vector must have SOME smaller-id near-dup in its own
    cluster (the pair that dropped it) — re-derived here from the raw
    vectors in Python, independently of the SQL."""
    rows = {
        r["vec_id"]: [int(round(x * 1000.0)) for x in r["embedding"]]
        for r in spark.sql("select * from sem_emb").collect()
    }
    out = {
        r["vec_id"]: (r["list_id"], r["is_kept"])
        for r in spark.sql(
            simops.semdedup_sql(duck=False, emb="sem_emb")
        ).collect()
    }
    for vid, (lid, kept) in out.items():
        dup_smaller = [
            a
            for a, (alid, _) in out.items()
            if a < vid
            and alid == lid
            and sum(x * y for x, y in zip(rows[a], rows[vid]))
            >= simops.SEM_TH
        ]
        assert (kept == 0) == bool(dup_smaller), (vid, dup_smaller)


def test_pq_pure_python_recompute(spark, sf_dir):
    """PQ encode and ADC search pinned by an independent Python recompute:
    quantization, 8x8 sampled codebooks, argmin code assignment (ties to
    the lowest code), per-query distance tables, and the exact top-k by
    summed table lookups.  Also pins self-exclusion and that the ADC
    distance of every reported neighbor equals the table-sum recompute."""
    from collections import defaultdict

    from htmlgraft import simops

    emb = {
        r["vec_id"]: [round(float(x) * 1000.0) for x in r["embedding"]]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    M, K, SD = simops.PQ_M, simops.PQ_K, 64 // simops.PQ_M

    def sub(v, m):
        return v[m * SD:(m + 1) * SD]

    def l2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    cb = {m: {k: sub(emb[k], m) for k in range(K)} for m in range(M)}
    enc = {
        vid: [min(range(K), key=lambda k: (l2(sub(v, m), cb[m][k]), k))
              for m in range(M)]
        for vid, v in emb.items()
    }

    got_codes = {
        (r["m"], r["code"]): (r["n_vectors"], r["min_vec_id"])
        for r in simops.run(spark, sf_dir, simops.pq_codes_sql).collect()
    }
    want_codes = defaultdict(list)
    for vid, codes in enc.items():
        for m, c in enumerate(codes):
            want_codes[(m, c)].append(vid)
    assert got_codes == {
        k: (len(v), min(v)) for k, v in want_codes.items()
    }

    got_topk = defaultdict(list)
    for r in simops.run(spark, sf_dir, simops.pq_topk_sql).collect():
        got_topk[r["q_id"]].append((r["n_id"], r["ad2"], r["rk"]))
    for q in range(simops.N_QUERIES):
        tab = {m: {k: l2(sub(emb[q], m), cb[m][k]) for k in range(K)}
               for m in range(M)}
        ad2 = {
            vid: sum(tab[m][enc[vid][m]] for m in range(M))
            for vid in emb if vid != q
        }
        want = sorted(ad2.items(), key=lambda kv: (kv[1], kv[0]))[
            :simops.TOP_K
        ]
        assert got_topk[q] == [
            (n, d, i + 1) for i, (n, d) in enumerate(want)
        ], q
        assert all(n != q for n, _, _ in got_topk[q])
