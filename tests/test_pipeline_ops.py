"""Training-data pipeline operators vs pure-Python references: dedup
(exact / MinHash-LSH / SimHash), ANN (brute force / LSH recall), text
analysis. These are the non-SQL-expressible queries' correctness pins."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_core_spark.functions.text import (
    LANG_MARKERS,
    STOPWORDS,
    _simhash_tokens,
    _str_hash64,
)
from crawler_core_spark.operators.ann import brute_force_topk, lsh_bucket_topk
from crawler_core_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    simhash_pairs,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
    (2, "the quick brown fox jumps over a lazy cat"),            # near dup of 0
    (3, "completely different text about spark engines and data"),
    (4, "spark engines and data pipelines process completely different text"),  # near dup of 3
    (5, "der schnelle braune fuchs und die katze"),
    (6, "unrelated words zebra quasar nebula falcon"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id: long, text: string")


def py_jaccard(a: str, b: str) -> float:
    sa, sb = set(a.split()), set(b.split())
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup(docs_df):
    out = {r["doc_id"]: r["group_n"] for r in exact_dedup(docs_df, "doc_id", "text").collect()}
    assert out[0] == 2          # doc 1 collapsed into doc 0
    assert 1 not in out
    assert out[3] == 1


def test_minhash_lsh_finds_dups_and_exact_jaccard(docs_df):
    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in minhash_lsh_pairs(docs_df, n_hashes=16, bands=8).collect()
    }
    assert (0, 1) in pairs
    assert pairs[(0, 1)]["est_jaccard"] == 1.0
    assert pairs[(0, 1)]["jaccard"] == 1.0
    # every reported exact jaccard matches the pure-python value
    texts = dict(DOCS)
    for (a, b), r in pairs.items():
        assert r["jaccard"] == pytest.approx(py_jaccard(texts[a], texts[b]), abs=1e-6)
    # near-dup of 0 (7/11 overlap) should surface with 8 bands of 2 rows
    assert (0, 2) in pairs or (1, 2) in pairs


def test_incremental_dedup_equals_cross_pairs(spark):
    """incremental_minhash_dedup at recall-complete parameters (1-row
    bands, no cap) must equal the exact NEW x CORPUS cross pairs — and
    never report a corpus-internal or new-internal pair."""
    from crawler_core_spark.operators.dedup import incremental_minhash_dedup

    corpus_rows = [(i, f"shared tokens alpha beta gamma delta doc{i % 3}") for i in range(6)]
    new_rows = [
        (100, "shared tokens alpha beta gamma delta doc0"),   # dup of 0/3
        (101, "totally novel content nothing matches here"),  # no dup
        (102, "shared tokens alpha beta gamma delta doc1"),   # dup of 1/4
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id: long, text: string")
    new = spark.createDataFrame(new_rows, "doc_id: long, text: string")
    got = {
        (r["new_id"], r["corpus_id"]): r["jaccard"]
        for r in incremental_minhash_dedup(
            new, corpus, n_hashes=16, bands=16, threshold=0.8, max_bucket=None
        ).collect()
    }
    texts = dict(corpus_rows) | dict(new_rows)
    want = {
        (n, c): round(py_jaccard(texts[n], texts[c]), 6)
        for n, _ in new_rows
        for c, _ in corpus_rows
        if py_jaccard(texts[n], texts[c]) >= 0.8
    }
    assert got == want
    assert all(n >= 100 > c for n, c in got)  # cross pairs only

    # production form: persisted (sigs, token-sets) projections — the
    # corpus text is never touched — must give the identical result
    from crawler_core_spark.operators.dedup import (
        corpus_token_sets,
        minhash_signatures,
    )

    sigs = minhash_signatures(corpus, "doc_id", "text", 16)
    toks = corpus_token_sets(corpus)
    got2 = {
        (r["new_id"], r["corpus_id"]): r["jaccard"]
        for r in incremental_minhash_dedup(
            new, n_hashes=16, bands=16, threshold=0.8, max_bucket=None,
            corpus_sigs=sigs, corpus_tokens=toks,
        ).collect()
    }
    assert got2 == want


def test_simhash_matches_python_reference(spark, docs_df):
    """The native plan (explode -> xxhash64 -> bit-sum aggregates) must
    reproduce the pure-Python simhash math; the per-token hash values come
    from Spark's own xxhash64 (collected once), so the test independently
    verifies the bit-aggregation, not the hash function."""
    from crawler_core_spark.operators.dedup import simhash_fingerprints

    got = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs_df, "doc_id", "text").collect()}
    all_toks = sorted({t for _, text in DOCS for t in text.split()})
    tok_df = spark.createDataFrame([(t,) for t in all_toks], "tok: string")
    spark_hash = {
        r["tok"]: r["h"] & 0xFFFFFFFFFFFFFFFF
        for r in tok_df.select("tok", F.xxhash64("tok").alias("h")).collect()
    }
    for doc_id, text in DOCS:
        want = _simhash_tokens([text.split()], hash_fn=lambda t: spark_hash[t])[0]
        assert got[doc_id] == want, doc_id
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(docs_df, max_hamming=3).collect()}
    assert pairs.get((0, 1)) == 0


def test_simhash_plan_has_no_python(docs_df):
    """The round-1 scale offender (pandas-UDF FNV loop) must be gone:
    no Arrow/Python eval node anywhere in the simhash plan."""
    from crawler_core_spark.operators.dedup import simhash_fingerprints

    plan = simhash_fingerprints(docs_df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_fnv_hash_deterministic():
    assert _str_hash64("the") == _str_hash64("the")
    assert _str_hash64("the") != _str_hash64("The")


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((4, 16)) * 3
    rows = []
    for i in range(200):
        c = centers[i % 4]
        rows.append((i, (c + rng.standard_normal(16) * 0.3).astype("float32").tolist(), i % 4))
    return rows, spark.createDataFrame(rows, "vec_id: long, embedding: array<float>, label: int")


def test_brute_force_topk_matches_numpy(vectors):
    rows, df = vectors
    q = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = brute_force_topk(df, q, k=5)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append((r["neighbor_id"], r["sim"]))
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    for qid in range(3):
        sims = (mat @ mat[qid]) / (norms * norms[qid])
        sims[qid] = -np.inf
        order = sorted(range(len(rows)), key=lambda i: (-round(sims[i], 6), i))[:5]
        want = [(i, round(sims[i], 6)) for i in order]
        assert by_q[qid] == want, qid


def test_lsh_recall_against_brute_force(vectors):
    _, df = vectors
    q = df.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact = brute_force_topk(df, q, k=5)
    approx = lsh_bucket_topk(df, q, k=5, n_planes=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # clustered data: same-cluster vectors mostly share the sign-bucket
    assert recall >= 0.5, recall
    # approximate results are a subset of the corpus with correct sims:
    # every (q, n) in both must carry the same similarity
    sims_e = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in exact.collect()}
    sims_a = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in approx.collect()}
    for k in e & a:
        assert sims_e[k] == pytest.approx(sims_a[k], abs=1e-6)


def test_text_functions(spark):
    from crawler_core_spark.functions.text import (
        fingerprint_col,
        lang_id_col,
        quality_score_col,
        stopword_ratio_col,
        token_count_col,
    )

    df = spark.createDataFrame(
        [(0, "the cat and the hat"), (1, "der hund und die katze"), (2, "xyzzy plugh")],
        "id: long, text: string",
    )
    rows = {r["id"]: r for r in df.select(
        "id",
        token_count_col("text").alias("n"),
        F.round(stopword_ratio_col("text"), 6).alias("sr"),
        lang_id_col("text").alias("lang"),
        fingerprint_col("text").alias("fp"),
        F.round(quality_score_col("text"), 6).alias("q"),
    ).collect()}
    assert rows[0]["n"] == 5
    assert rows[0]["sr"] == pytest.approx(3 / 5)
    assert rows[0]["lang"] == "en"
    assert rows[1]["lang"] == "de"
    assert rows[2]["lang"] == "und"
    assert rows[0]["q"] == pytest.approx(round((1 - 3 / 5) * (5 / 100), 6))
    # fingerprint is case-insensitive on the token stream
    fp2 = df.select(fingerprint_col(F.lit("THE CAT and the hat")).alias("fp")).first()["fp"]
    assert rows[0]["fp"] == fp2


def test_ivf_recall_against_brute_force(vectors):
    from crawler_core_spark.operators.ann import ivf_topk

    _, df = vectors
    q = df.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact = brute_force_topk(df, q, k=5)
    approx = ivf_topk(df, q, k=5, n_centroids=8, n_probe=2, sample=200)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # strongly clustered data + 2 probed cells of 8: near neighbors live
    # in the query's own cluster cell
    assert recall >= 0.7, recall
    # sims are exact cosines wherever both report the pair
    sims_e = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in exact.collect()}
    sims_a = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in approx.collect()}
    for key in e & a:
        assert sims_e[key] == pytest.approx(sims_a[key], abs=1e-6)


def test_ivfpq_recall_against_brute_force(vectors):
    """IVF-PQ with a REAL rerank cut (PQ-approximate ordering active):
    recall vs brute force on clustered vectors, exact sims on overlap —
    the codes-only probe join must not degrade below the IVF gate."""
    from crawler_core_spark.operators.ann import ivfpq_topk

    _, df = vectors
    q = df.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact = brute_force_topk(df, q, k=5)
    approx = ivfpq_topk(
        df, q, k=5, n_centroids=8, n_probe=2,
        n_subvectors=4, n_codes=8, rerank=20, sample=200,
    )
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.7, recall
    sims_e = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in exact.collect()}
    sims_a = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in approx.collect()}
    for key in e & a:
        assert sims_e[key] == pytest.approx(sims_a[key], abs=1e-6)


def test_ivfpq_rerank_exchange_is_codes_only(spark):
    """The PQ rerank cut's ONLY shuffle must carry (query_id,
    neighbor_id, approx) — never qvec or the codes — and Spark should
    apply the map-side partial top-k (WindowGroupLimit Partial) BEFORE
    the exchange.  Also pins that the ADC ordering is in the plan at all
    (a pruned codes column would silently un-gate the exhaustive twin)."""
    from crawler_core_spark.operators.ann import ivfpq_topk

    df = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=i) for i in range(8)]).alias("embedding"),
    )
    q = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = ivfpq_topk(
        df, q, k=3, n_centroids=4, n_probe=2,
        n_subvectors=2, n_codes=4, rerank=10, sample=60,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    ex = [i for i, l in enumerate(lines) if "Exchange hashpartitioning(query_id" in l]
    assert len(ex) == 1, plan  # one shuffle for the whole rerank+topk
    child = lines[ex[0] + 1]
    assert "WindowGroupLimit" in child and "approx" in child, child
    assert "Partial" in child, child  # map-side top-rerank before the wire
    assert "qvec" not in child and "codes" not in child, child
    assert "approx" in plan  # the ADC ordering survived optimization


def _numpy_cos_pairs(rows, threshold):
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    sims = (mat @ mat.T) / np.outer(norms, norms)
    out = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            s = round(float(sims[i, j]), 6)
            if s >= threshold:
                out[(rows[i][0], rows[j][0])] = s
    return out


def test_lsh_near_dup_pairs_recall_and_precision(vectors):
    """The embed-near-dup SCALE path: banded sign-LSH mining must find
    most true cos>=0.9 pairs (recall gate) and, because candidates are
    exact-verified, report ONLY true pairs with exact similarities."""
    from crawler_core_spark.operators.ann import lsh_near_dup_pairs

    rows, df = vectors
    want = _numpy_cos_pairs(rows, 0.9)
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in lsh_near_dup_pairs(
            df, threshold=0.9, n_planes=6, n_bands=10, max_bucket=None
        ).collect()
    }
    # precision is exact by construction: no pair outside the true set
    assert set(got) <= set(want), set(got) - set(want)
    recall = len(got) / len(want)
    assert recall >= 0.8, recall
    for k, s in got.items():
        assert s == pytest.approx(want[k], abs=1e-6)


def test_lsh_near_dup_pairs_exhaustive_equals_all_pairs(vectors):
    """n_planes=0 twin (the driver-oracle parameters): one bucket per
    band => candidate set is all-pairs => output EQUALS exact all-pairs."""
    from crawler_core_spark.operators.ann import lsh_near_dup_pairs

    rows, df = vectors
    want = _numpy_cos_pairs(rows, 0.5)
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in lsh_near_dup_pairs(
            df, threshold=0.5, n_planes=0, n_bands=1, max_bucket=None
        ).collect()
    }
    assert set(got) == set(want)
    for k, s in got.items():
        assert s == pytest.approx(want[k], abs=1e-6)


def test_lsh_near_dup_pairs_arrow_recall_and_precision(vectors):
    """impl="arrow" (one numpy matmul per batch instead of bands x planes
    x 4 xxhash expressions per element) must pass the SAME quality gates:
    exact precision (shared verify stage) + recall over true pairs."""
    from crawler_core_spark.operators.ann import lsh_near_dup_pairs

    rows, df = vectors
    want = _numpy_cos_pairs(rows, 0.9)
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in lsh_near_dup_pairs(
            df, threshold=0.9, n_planes=6, n_bands=10, max_bucket=None,
            impl="arrow",
        ).collect()
    }
    assert set(got) <= set(want), set(got) - set(want)
    recall = len(got) / len(want)
    assert recall >= 0.8, recall
    for k, s in got.items():
        assert s == pytest.approx(want[k], abs=1e-6)


def test_lsh_near_dup_pairs_arrow_exhaustive_equals_all_pairs(vectors):
    """Arrow-path n_planes=0 twin: the UDF short-circuits to one bucket
    per band, so the full pandas-UDF -> posexplode -> self-join -> verify
    pipeline must EQUAL the exact all-pairs result (the driver-oracle
    parameters for embed_near_dup_lsh_arrow_exhaustive)."""
    from crawler_core_spark.operators.ann import lsh_near_dup_pairs

    rows, df = vectors
    want = _numpy_cos_pairs(rows, 0.5)
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in lsh_near_dup_pairs(
            df, threshold=0.5, n_planes=0, n_bands=1, max_bucket=None,
            impl="arrow",
        ).collect()
    }
    assert set(got) == set(want)
    for k, s in got.items():
        assert s == pytest.approx(want[k], abs=1e-6)


def test_phash_near_dup_brute_force_parity_and_dup_detection(spark):
    """Image-payload visual dedup: banded-Hamming over the corpus phash
    column must EQUAL the brute-force popcount answer (pigeonhole banding
    is recall-complete at max_hamming=3), find a re-encoded pixel-exact
    duplicate at Hamming 0, and skip null-phash (decode-failed) rows."""
    from crawler_core_spark import synth
    from crawler_core_spark.functions.image import decode_image, phash_py
    from crawler_core_spark.operators.dedup import phash_near_dup

    pdf = synth.images_pandas(24, corrupt_every=0)
    rows = list(zip(pdf["image_id"], (int(p) for p in pdf["phash"])))
    # pixel-exact duplicate of img 0 (decode->rehash: png is lossless) and
    # a lightly perturbed copy (small brightness bump on a pixel lattice)
    arr = decode_image(bytes(pdf["bytes"][0]))
    pert = arr.copy()
    pert[::7, ::5] = np.clip(
        pert[::7, ::5].astype(np.int32) + 3, 0, 255
    ).astype(np.uint8)
    rows.append(("img-dup", phash_py(arr)))
    rows.append(("img-pert", phash_py(pert)))
    rows.append(("img-null", None))  # decode-failed row: must be excluded
    df = spark.createDataFrame(rows, "image_id: string, phash: long")

    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_dup(df, max_hamming=3, max_bucket=None).collect()
    }

    def pop(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    want = {}
    valid = [(i, p) for i, p in rows if p is not None]
    for x in range(len(valid)):
        for y in range(x + 1, len(valid)):
            (ia, ha), (ib, hb) = valid[x], valid[y]
            key = (ia, ib) if ia < ib else (ib, ia)
            h = pop(ha, hb)
            if h <= 3:
                want[key] = h
    assert got == want
    assert got[("img-00000", "img-dup")] == 0


def test_ivf_model_persistence_roundtrip(spark, vectors, tmp_path):
    """Train-once/probe-many: saved centroids reload exactly, a reprobe
    with the loaded model equals the fused train+probe result, and a
    re-save of the same model_id supersedes via saved_ver."""
    from crawler_core_spark.operators.ann import (
        ivf_topk,
        ivf_topk_with_centroids,
        load_centroids,
        save_centroids,
        train_centroids,
    )
    from crawler_core_spark.storage import TableStore

    rows, df = vectors
    store = TableStore(spark, str(tmp_path))
    cents = train_centroids(df, n_centroids=4, sample=64)
    save_centroids(store, cents, model_id="m1")
    assert load_centroids(store, "m1") == cents

    queries = df.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    fused = ivf_topk(df, queries, k=5, n_centroids=4, n_probe=4, sample=64)
    probed = ivf_topk_with_centroids(
        df, queries, load_centroids(store, "m1"), k=5, n_probe=4
    )
    assert sorted(map(tuple, fused.collect())) == sorted(
        map(tuple, probed.collect())
    )

    # re-save supersedes (saved_ver latest-wins), other models unaffected
    cents2 = train_centroids(df, n_centroids=4, sample=32)
    save_centroids(store, cents2, model_id="m1")
    save_centroids(store, cents, model_id="m2")
    assert load_centroids(store, "m1") == cents2
    assert load_centroids(store, "m2") == cents
    with pytest.raises(KeyError):
        load_centroids(store, "nope")
