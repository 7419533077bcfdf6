"""Unit goldens for operators without SQL oracles (SURVEY §5 tier 1/2):
SimHash bit math, LSH near-dup recall, cosine vs numpy, PageRank vs power
iteration, multimodal plumbing, text-function edge cases."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from gearpump_spark.operators import dedup as D
from gearpump_spark.operators import similarity as S
from gearpump_spark.operators.graph import pagerank, pagerank_numpy_reference
from gearpump_spark.operators import multimodal as MM
from gearpump_spark.functions import text as TX


# --- SimHash golden (Charikar 2002): recompute in pure python ------------


def _simhash32_py(text: str) -> int:
    norm = " ".join(text.lower().split())
    votes = [0] * 32
    for w in norm.split(" "):
        if not w:
            continue
        h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
        for b in range(32):
            votes[b] += 1 if (h >> b) & 1 else -1
    return sum(2**b for b in range(32) if votes[b] > 0)


def test_simhash_golden(spark):
    rows = [(0, "the quick brown fox"), (1, "pack my box with five dozen jugs")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.simhash for r in D.simhash32(df).collect()}
    assert got == {i: _simhash32_py(t) for i, t in rows}


def test_simhash_similar_docs_close(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    rows = [(0, base), (1, base.replace("lazy", "sleepy", 1)), (2, "完全 另一 个 文档 呀 " * 8)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.simhash for r in D.simhash32(df).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(got[0], got[1]) < ham(got[0], got[2])


# --- MinHash-LSH recall on an injected near-duplicate ---------------------


def test_lsh_finds_near_duplicate(spark):
    base = ("spark streaming engine with watermarks and windows " * 6).strip()
    near = base.replace("watermarks", "checkpoints", 1)
    other = ("an entirely different corpus about cooking pasta at home " * 6).strip()
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, other)], "doc_id bigint, text string"
    )
    sig = D.minhash_signatures(df, k=6)
    pairs = {(r.a, r.b) for r in D.lsh_candidate_pairs(sig, k=6).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(5, "Hello  World"), (2, "hello world"), (9, "unrelated")],
        "doc_id bigint, text string",
    )
    out = {r.keep_id: r.n_dups for r in D.exact_dedup(df).collect()}
    assert out == {2: 2, 9: 1}  # normalization folds case+whitespace


def test_ngram_jaccard_identical_is_one(spark):
    t = "a b c d e f g h"
    df = spark.createDataFrame([(0, t), (1, t)], "doc_id bigint, text string")
    out = D.ngram_jaccard_pairs(df.filter("doc_id = 0"), df, threshold=0.0).collect()
    assert len(out) == 1 and out[0].jaccard == 1.0


# --- Cosine top-k vs numpy -------------------------------------------------


def test_cosine_topk_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(42)
    corpus = rng.normal(size=(50, 8)).astype("float32")
    queries = corpus[:3]
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(corpus)],
        "vec_id bigint, embedding array<float>",
    )
    qdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(queries)],
        "q_id bigint, q_vec array<float>",
    )
    got = S.cosine_topk(qdf, cdf, k=3).collect()

    def np_topk(q):
        sims = corpus @ q / (np.linalg.norm(corpus, axis=1) * np.linalg.norm(q))
        order = sorted(range(50), key=lambda i: (-round(float(sims[i]), 4), i))
        return order[:3]

    for qi in range(3):
        expect = np_topk(queries[qi].astype("float64"))
        mine = [r.vec_id for r in sorted(got, key=lambda r: r.rank) if r.q_id == qi]
        assert mine == expect
        # self-similarity tops its own query
        assert mine[0] == qi


def test_lsh_topk_self_recall(spark, sf_dir):
    from gearpump_spark.datasets import table

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = S.cosine_topk_lsh(q, emb, dim=64, k=3, n_planes=4).collect()
    # a query vector always lands in its own bucket → rank 1 is itself
    top1 = {r.q_id: r.vec_id for r in out if r.rank == 1}
    assert top1 == {i: i for i in range(5)}


def test_ivf_topk_recall_vs_exact(spark, sf_dir):
    from gearpump_spark.datasets import table

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = S.cosine_topk(q, emb, k=5).collect()
    approx = S.cosine_topk_ivf(q, emb, nlist=8, nprobe=3, k=5).collect()
    # a query's own list is always its nearest probe → rank 1 is itself
    top1 = {r.q_id: r.vec_id for r in approx if r.rank == 1}
    assert top1 == {i: i for i in range(5)}
    # probing 3/8 lists must keep decent overlap with exact top-5
    exact_ids = {(r.q_id, r.vec_id) for r in exact}
    approx_ids = {(r.q_id, r.vec_id) for r in approx}
    assert len(exact_ids & approx_ids) >= int(0.5 * len(exact_ids))
    # nprobe = nlist degenerates to exact search
    full = S.cosine_topk_ivf(q, emb, nlist=8, nprobe=8, k=5).collect()
    assert {(r.q_id, r.vec_id, r.cosine_sim) for r in full} == {
        (r.q_id, r.vec_id, r.cosine_sim) for r in exact
    }


# --- PageRank vs power iteration (FIXTURES.md §B.6) -----------------------


def test_pagerank_matches_numpy(spark):
    edges = [(1, 2), (1, 3), (2, 3), (3, 4)]  # node 4 dangles
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node_id: r.rank for r in pagerank(edf, max_iter=30, tol=1e-9).collect()}
    expect = pagerank_numpy_reference(edges, max_iter=30, tol=1e-9)
    assert set(got) == set(expect)
    for k in expect:
        assert math.isclose(got[k], expect[k], rel_tol=1e-6), (k, got[k], expect[k])
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_int_matches_pure_python(spark):
    """Bit-exact golden: the integer PageRank must reproduce a pure-python
    floor-division power iteration EXACTLY (not approximately) — that is
    the operator's whole contract."""
    from gearpump_spark.operators.graph import pagerank_int

    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (5, 1)]  # node 4 dangles
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node_id: r.r for r in pagerank_int(edf, n_iter=10).collect()}

    scale = 10**12
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    incoming = {v: [s for s, d in edges if d == v] for v in nodes}
    r = {v: scale // n for v in nodes}
    for _ in range(10):
        dm = sum(r[v] for v in nodes if v not in out)
        r = {
            v: (15 * scale) // (100 * n)
            + (85 * (sum(r[s] // out[s] for s in incoming[v]) + dm // n)) // 100
            for v in nodes
        }
    assert got == r
    # rank ordering agrees with float PageRank on this graph
    flt = pagerank_numpy_reference(edges, max_iter=30, tol=1e-12)
    assert sorted(got, key=got.get) == sorted(flt, key=flt.get)


# --- Multimodal plumbing ---------------------------------------------------


def test_multimodal_decode_metadata(spark):
    df = spark.createDataFrame(
        [(0, "hello world"), (1, "föö bär")], "doc_id bigint, text string"
    )
    with_payload = MM.attach_fake_payload(df)
    meta = MM.decode_image_metadata(with_payload).collect()
    assert len(meta) == 2
    by_id = {r.doc_id: r for r in meta}
    assert by_id[0].byte_len == len(b"hello world")
    assert by_id[1].byte_len == len("föö bär".encode())
    assert all(r.format in MM.FakeDecoder.FORMATS for r in meta)
    assert all(r.width >= 16 and r.height >= 16 for r in meta)
    # deterministic across runs
    meta2 = {r.doc_id: (r.format, r.width) for r in MM.decode_image_metadata(with_payload).collect()}
    assert meta2 == {r.doc_id: (r.format, r.width) for r in meta}


def test_multimodal_frame_sampling(spark):
    df = spark.createDataFrame([(0, "vid a"), (1, "vid b")], "doc_id bigint, text string")
    frames = MM.sample_frames(MM.attach_fake_payload(df), n_frames=3).collect()
    assert len(frames) == 6
    assert {(r.doc_id, r.frame_idx) for r in frames} == {(i, j) for i in (0, 1) for j in range(3)}


def test_multimodal_resize_size_law_and_determinism(spark):
    df = spark.createDataFrame([(0, "img a"), (1, "img b")], "doc_id bigint, text string")
    out = MM.resize_images(MM.attach_fake_payload(df), width=32, height=24).collect()
    assert all(r.byte_len == 32 * 24 * 3 == len(r.payload) for r in out)
    # deterministic and payload-dependent
    again = {r.doc_id: bytes(r.payload) for r in
             MM.resize_images(MM.attach_fake_payload(df), width=32, height=24).collect()}
    assert again == {r.doc_id: bytes(r.payload) for r in out}
    assert again[0] != again[1]


def test_multimodal_features_match_local_decoder(spark):
    df = spark.createDataFrame([(0, "doc x"), (1, "doc y")], "doc_id bigint, text string")
    got = {r.doc_id: r.features for r in
           MM.extract_features(MM.attach_fake_payload(df), dim=4).collect()}
    dec = MM.FakeDecoder()
    for doc_id, text in [(0, "doc x"), (1, "doc y")]:
        expect = dec.features(text.encode(), 4)
        assert got[doc_id] == pytest.approx(expect, abs=1e-7)
        assert all(0.0 <= v < 1.0 for v in got[doc_id])
    # stable under a different partitioning (narrow map — order-free)
    repart = {r.doc_id: r.features for r in
              MM.extract_features(MM.attach_fake_payload(df).repartition(7), dim=4).collect()}
    assert repart.keys() == got.keys()
    for k in got:
        assert repart[k] == pytest.approx(got[k], abs=1e-7)


def _has_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_has_pil(), reason="PIL present: the codec seam is live")
def test_library_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        MM.LibraryDecoder().decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        MM.LibraryDecoder().resize(b"\x89PNG", 8, 8)
    with pytest.raises(NotImplementedError):
        MM.LibraryDecoder().features(b"\x89PNG", 4)


@pytest.mark.skipif(not _has_pil(), reason="PIL not installed in this rig")
def test_library_decoder_matches_pure_python_tier():
    """Seam insurance (r3 verdict item #8): when a real codec library IS
    present, LibraryDecoder must agree with the pure-python PixelDecoder
    on our own synthesized containers — so swapping the tiers on a real
    cluster changes throughput, not results."""
    import pyspark.sql  # noqa: F401 — keep import ordering consistent

    lib = MM.LibraryDecoder()
    pure = MM.PixelDecoder()
    # synthesize a real PNG through the operator tier's encoder ([B,G,R])
    payload = MM.PixelDecoder.encode_png(
        [[[x * 37 % 256, y * 53 % 256, (x + y) % 256] for x in range(8)] for y in range(6)]
    )
    got, want = lib.decode_image(payload), pure.decode_image(payload)
    assert (got["format"], got["width"], got["height"]) == (
        want["format"], want["width"], want["height"],
    )
    rz = lib.resize(payload, 4, 3)
    meta = pure.decode_image(rz)
    assert (meta["width"], meta["height"]) == (4, 3)
    # ...and one real JPEG through the same seam (r5 verdict #8: the PNG
    # case alone left the libjpeg path unexercised): our own baseline
    # grayscale encoder emits a spec-conformant stream any reader decodes.
    gray = [[(7 * x + 13 * y) % 256 for x in range(16)] for y in range(8)]
    jpayload = MM.PixelDecoder.encode_jpeg_gray(gray)
    jgot, jwant = lib.decode_image(jpayload), pure.decode_image(jpayload)
    assert (jgot["format"], jgot["width"], jgot["height"]) == (
        jwant["format"], jwant["width"], jwant["height"],
    )


# --- Text function edge cases ---------------------------------------------


def test_text_functions_empty_and_unicode(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "one"), (3, "héllo wörld, twice!")],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: (r.nt, r.np)
        for r in df.select(
            "doc_id",
            TX.token_count(F.col("text")).alias("nt"),
            TX.punct_count(F.col("text")).alias("np"),
        ).collect()
    }
    assert out == {0: (0, 0), 1: (0, 0), 2: (1, 0), 3: (3, 2)}


def test_lang_id_prefers_profile_order_on_tie(spark):
    # 'la de' hits both es and fr profiles equally → es wins (earlier)
    df = spark.createDataFrame([(0, "la de"), (1, "xyz qqq")], "doc_id bigint, text string")
    got = {r.doc_id: r.pred for r in df.select(
        "doc_id", TX.lang_id(F.col("text")).alias("pred")).collect()}
    assert got == {0: "es", 1: "und"}


# --- Temporal operators ----------------------------------------------------


def test_asof_join_tolerance_and_ties(spark):
    from pyspark.sql import functions as F
    from gearpump_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, 205), (2, 50)], "k bigint, sec bigint"
    ).select("k", F.timestamp_seconds("sec").alias("ts"))
    right = spark.createDataFrame(
        [(1, 100, "exact"), (1, 150, "mid"), (2, 60, "later")],
        "k bigint, sec bigint, tag string",
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "tag")

    out = {
        (r.k, r.ts.second + 60 * r.ts.minute): r.tag_right
        for r in asof_join(left, right, key="k").collect()
    }
    # equal timestamps match (<=); later right rows don't; no match → null
    assert out == {(1, 100): "exact", (1, 205): "mid", (2, 50): None}

    tol = {
        (r.k, r.ts.second + 60 * r.ts.minute): r.tag_right
        for r in asof_join(left, right, key="k", tolerance="30 seconds").collect()
    }
    # (1, 205): latest match at 150 is 55s stale > 30s tolerance → nulled
    assert tol == {(1, 100): "exact", (1, 205): None, (2, 50): None}


def test_sessionize_gap_boundary(spark):
    from pyspark.sql import functions as F
    from gearpump_spark.operators.temporal import sessionize

    # gaps: 1800s (== gap, same session) and 1801s (> gap, new session)
    df = spark.createDataFrame(
        [(1, 0), (1, 1800), (1, 3601)], "k bigint, sec bigint"
    ).select("k", F.timestamp_seconds("sec").alias("ts"))
    got = {
        r.sec: r.session_id
        for r in sessionize(df, key="k", ts="ts", gap="30 minutes")
        .withColumn("sec", F.unix_micros("ts") / 1_000_000)
        .collect()
    }
    assert got == {0: 0, 1800: 0, 3601: 1}


def test_connected_components_known_graph(spark):
    from gearpump_spark.operators.graph import connected_components

    # two components {1,2,3,7} (chain) + {5,6}, isolated node 9
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 7), (5, 6)], "src bigint, dst bigint"
    )
    nodes = spark.createDataFrame([(9,)], "node_id bigint")
    got = {r.node_id: r.comp for r in connected_components(edges, nodes=nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 5: 5, 6: 5, 9: 9}


# --- Sketches: Bloom / HLL / quantiles (operators/sketches.py) -----------


def test_bloom_no_false_negatives_and_low_fp(spark):
    from gearpump_spark.operators import sketches as SK

    members = spark.range(0, 50).select(F.col("id").alias("k"))
    bloom = SK.bloom_build(members, "k", num_words=64, num_hashes=3)
    probe = spark.range(0, 100).select(F.col("id").alias("k"))
    got = {r.key: r.bloom_maybe for r in SK.bloom_probe(bloom, probe, "k").collect()}
    assert all(got[k] for k in range(50)), "Bloom filter produced a false negative"
    fps = sum(1 for k in range(50, 100) if got[k])
    # m=2048, k=3, n=50 -> theoretical fp rate ~0.04%; 5/50 is far beyond any
    # plausible draw and would mean the hash family or bit math is broken.
    assert fps <= 5, f"implausible false-positive count {fps}"


def test_bloom_bits_match_pure_python(spark):
    from gearpump_spark.operators import sketches as SK

    vals, words, k = [3, 17, 99], 4, 2
    m = words * 32
    expect: dict[int, int] = {}
    for v in vals:
        for i in range(k):
            p = int(hashlib.md5(f"{i}|{v}".encode()).hexdigest()[:15], 16) % m
            expect[p // 32] = expect.get(p // 32, 0) | (1 << (p % 32))
    df = spark.createDataFrame([(v,) for v in vals], "k bigint")
    got = {r.word: r.bits for r in SK.bloom_build(df, "k", words, k).collect()}
    assert got == expect


def test_approx_distinct_by_flags_ok(spark):
    from gearpump_spark.operators import sketches as SK

    rows = [(g, v) for g in ("a", "b") for v in range(200)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    out = {r.g: r for r in SK.approx_distinct_by(df, "g", "v").collect()}
    assert out["a"].exact_nd == 200 and out["b"].exact_nd == 200
    assert out["a"].approx_ok and out["b"].approx_ok


def test_approx_quantiles_check_bounds(spark):
    from gearpump_spark.operators import sketches as SK

    df = spark.createDataFrame([("g", float(i)) for i in range(1000)], "g string, v double")
    row = SK.approx_quantiles_check(df, "g", "v").collect()[0]
    assert row.n_rows == 1000 and row.min_v == 0.0 and row.max_v == 999.0
    assert row.ok_q25 and row.ok_q50 and row.ok_q75


# --- Sampling: determinism, disjointness, fixed-size (operators/sampling.py)


def test_hash_sample_deterministic_and_disjoint_splits(spark):
    from gearpump_spark.operators import sampling as SP

    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    a = {r.k for r in SP.hash_sample(df, "k", 1000).collect()}
    b = {r.k for r in SP.hash_sample(df, "k", 1000).collect()}
    assert a == b, "same key + seed must give the same sample"
    # rate sanity: 10% of 2000 with hash uniformity -> well within [100, 300]
    assert 100 <= len(a) <= 300
    split = {r.k: r.split for r in SP.train_test_split(df, "k", 1000).collect()}
    test_keys = {k for k, s in split.items() if s == "test"}
    assert test_keys == a, "test split must equal the same-rate hash sample"


def test_stratified_rates_and_unlisted_drop(spark):
    from gearpump_spark.operators import sampling as SP

    rows = [(i, ["en", "de", "xx"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "k bigint, lang string")
    out = SP.stratified_hash_sample(df, "lang", "k", {"en": 10000, "de": 0}).collect()
    langs = {r.lang for r in out}
    assert langs == {"en"}, "rate-0 and unlisted strata must drop entirely"
    assert len(out) == 1000, "rate 10000bp keeps every row of the stratum"


def test_bottom_k_matches_python_and_is_fixed_size(spark):
    from gearpump_spark.operators import sampling as SP

    df = spark.range(0, 500).select(F.col("id").alias("k"))
    got = sorted(r.k for r in SP.bottom_k_sample(df, "k", 16).collect())
    expect = sorted(
        sorted(range(500), key=lambda v: hashlib.md5(f"0|{v}".encode()).hexdigest())[:16]
    )
    assert got == expect


def test_kmeans_matches_numpy_lloyd(spark):
    import numpy as np

    rows = []
    # three well-separated 2-D blobs, deterministic grid offsets
    for i in range(30):
        base = [(0.0, 0.0), (10.0, 10.0), (-10.0, 5.0)][i % 3]
        rows.append((i, [base[0] + (i % 5) * 0.1, base[1] + (i % 7) * 0.1]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents, iters = S.kmeans_train(df, "embedding", k=3, max_iter=10)
    got = {r.vec_id: r.cid for r in S.kmeans_assign(df, "embedding", cents).collect()}

    X = np.array([v for _, v in rows])
    C = X[:3].copy()  # same deterministic init: lowest ids
    for _ in range(10):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        New = np.array([X[a == j].mean(0) if (a == j).any() else C[j] for j in range(3)])
        if ((New - C) ** 2).sum(1).max() < 1e-6:
            C = New
            break
        C = New
    exp = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
    assert [got[i] for i in range(30)] == list(exp)
    assert iters <= 10


def test_bloom_filtered_join_matches_plain_join(spark):
    from gearpump_spark.operators import sketches as SK

    fact = spark.range(0, 2000).select(
        (F.col("id") % 400).alias("fk"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(0, 40)], "dk bigint, name string")
    plain = {(r.fk, r.payload, r.name) for r in
             fact.join(dim, fact.fk == dim.dk).select("fk", "payload", "name").collect()}
    bloomed = {(r.fk, r.payload, r.name) for r in
               SK.bloom_filtered_join(fact, dim, "fk", "dk")
               .select("fk", "payload", "name").collect()}
    assert bloomed == plain


def test_epochs_sample_copy_counts(spark):
    from gearpump_spark.operators import sampling as SP

    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    out = SP.epochs_sample(df, "k", epochs_bp=25000).groupBy("k").count().collect()
    counts = {r.k: r["count"] for r in out}
    assert set(counts.values()) <= {2, 3}, "2.5 epochs -> every key 2 or 3 copies"
    total = sum(counts.values())
    assert 2300 <= total <= 2700, f"expected ~2500 rows, got {total}"
    # determinism: the 3-copy set is exactly the 50% hash sample
    three = {k for k, c in counts.items() if c == 3}
    sampled = {r.k for r in SP.hash_sample(df, "k", 5000).collect()}
    assert three == sampled


def test_pack_sequences_respects_budget(spark):
    from gearpump_spark.operators import sampling as SP

    df = spark.range(0, 200).select(F.col("id").alias("k"), F.lit(100).alias("sz"))
    out = SP.pack_sequences(df, "k", "sz", budget=1000).collect()
    bins = {}
    for r in out:
        bins.setdefault(r.bin_id, 0)
        bins[r.bin_id] += 100
    # contiguous fill of equal sizes: every bin holds exactly budget tokens
    assert all(v == 1000 for v in bins.values())
    assert sorted(bins) == list(range(20))


def test_pack_sequences_sharded_disjoint_and_parallel(spark):
    from gearpump_spark.operators import sampling as SP

    df = spark.range(0, 300).select(F.col("id").alias("k"), F.lit(50).alias("sz"))
    out = SP.pack_sequences(df, "k", "sz", budget=500, shards=4).collect()
    assert len(out) == 300
    by_bin = {}
    for r in out:
        by_bin.setdefault(r.bin_id, 0)
        by_bin[r.bin_id] += 50
    # every non-terminal bin within a shard fills to the budget
    shards = {b >> 40 for b in by_bin}
    assert shards == {0, 1, 2, 3}
    for s in shards:
        bins = sorted(b for b in by_bin if b >> 40 == s)
        assert all(by_bin[b] == 500 for b in bins[:-1]), "interior bins must be full"


def test_epochs_sample_fractional_below_one(spark):
    from gearpump_spark.operators import sampling as SP

    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    out = SP.epochs_sample(df, "k", epochs_bp=5000).collect()
    # 0.5 epochs == a plain 50% sample, every kept row exactly once
    assert all(r.copy == 0 for r in out)
    kept = {r.k for r in out}
    assert kept == {r.k for r in SP.hash_sample(df, "k", 5000).collect()}
    assert 350 <= len(kept) <= 650


def test_stratified_empty_rates_selects_nothing(spark):
    from gearpump_spark.operators import sampling as SP

    df = spark.createDataFrame([(1, "en")], "k bigint, lang string")
    assert SP.stratified_hash_sample(df, "lang", "k", {}).count() == 0


def test_bloom_filtered_join_rejects_outer(spark):
    from gearpump_spark.operators import sketches as SK

    fact = spark.range(3).select(F.col("id").alias("fk"))
    dim = spark.range(2).select(F.col("id").alias("dk"))
    with pytest.raises(ValueError, match="outer/anti"):
        SK.bloom_filtered_join(fact, dim, "fk", "dk", how="left")


# --- Review-fix regressions ------------------------------------------------


def test_ngram_jaccard_new_batch_higher_ids(spark):
    """Query ids above every corpus id must still match (the advertised
    'dedup new batch against corpus' shape)."""
    t = "a b c d e f g h"
    corpus = spark.createDataFrame([(3, t)], "doc_id bigint, text string")
    batch = spark.createDataFrame([(100, t)], "doc_id bigint, text string")
    out = D.ngram_jaccard_pairs(batch, corpus, threshold=0.5).collect()
    assert len(out) == 1 and out[0].q_id == 100 and out[0].c_id == 3
    assert out[0].jaccard == 1.0


def test_short_docs_get_minhash_signatures(spark):
    """Docs with fewer words than the shingle width must still sign (whole
    normalized text as the single shingle) — identical short docs pair."""
    df = spark.createDataFrame(
        [(0, "hi there"), (1, "hi  THERE"), (2, "x")], "doc_id bigint, text string"
    )
    sig = D.minhash_signatures(df, k=6)
    assert sig.count() == 3
    pairs = {(r.a, r.b) for r in D.lsh_candidate_pairs(sig, k=6).collect()}
    assert (0, 1) in pairs  # same normalized text -> identical signatures


def test_simhash_emits_row_for_empty_doc(spark):
    df = spark.createDataFrame([(0, "   "), (1, "hello")], "doc_id bigint, text string")
    got = {r.doc_id: r.simhash for r in D.simhash32(df).collect()}
    assert set(got) == {0, 1} and got[0] == 0


def test_lsh_rejects_non_dividing_band_width(spark):
    df = spark.createDataFrame([(0, "a b c d")], "doc_id bigint, text string")
    sig = D.minhash_signatures(df, k=6)
    with pytest.raises(ValueError, match="must divide"):
        D.lsh_candidate_pairs(sig, k=6, rows_per_band=4)


def test_range_join_bucket_wider_than_hour(spark):
    """bucket='4 hours' must not drop in-range matches — the two sides
    share one epoch-anchored grid (regression: hour-truncation mismatch)."""
    from gearpump_spark.operators.temporal import range_join

    left = spark.createDataFrame([(1, 5400)], "k bigint, sec long").select(
        "k", F.timestamp_seconds("sec").alias("lts")
    )  # 01:30
    right = spark.createDataFrame([(1, 10800)], "k bigint, sec long").select(
        "k", F.timestamp_seconds("sec").alias("rts")
    )  # 03:00 — inside [01:30, 05:30)
    plain = range_join(left, right, "k", "lts", "rts", "0 seconds", "4 hours").count()
    bucketed = range_join(
        left, right, "k", "lts", "rts", "0 seconds", "4 hours", bucket="4 hours"
    ).count()
    assert plain == 1 and bucketed == 1


def test_latest_by_key_no_torn_rows_on_full_tie(spark):
    from gearpump_spark.operators.temporal import latest_by_key

    rows = [(1, 100, 7, "x", 10), (1, 100, 7, "y", 20)]  # full tie on (ts, tb)
    df = spark.createDataFrame(rows, "k bigint, ts bigint, tb bigint, a string, b bigint")
    out = latest_by_key(df, ["k"], "ts", "tb").collect()
    assert len(out) == 1
    assert (out[0].a, out[0].b) in {("x", 10), ("y", 20)}, "must be an actual input row"


# --- Contamination & PII (r2 additions) ------------------------------------


def test_cross_split_contamination_full_partial_none(spark):
    from gearpump_spark.operators.dedup import cross_split_contamination

    rows = [
        # train corpus
        (1, "the quick brown fox jumps over the lazy dog", "train"),
        (2, "completely different training material here today", "train"),
        # test docs: fully leaked / partially leaked / clean
        (10, "the quick brown fox jumps", "test"),          # all shingles in doc 1
        (11, "the quick brown cat sat quietly", "test"),    # shares 1 of 4 shingles
        (12, "zebra xylophone quartz vortex glyph", "test"),  # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, split string")
    out = {r.doc_id: r for r in cross_split_contamination(df).collect()}
    assert set(out) == {10, 11, 12}
    assert out[10].contam_frac == 1.0
    assert out[12].contam_frac == 0.0 and out[12].n_shared == 0
    assert 0.0 < out[11].contam_frac < 1.0
    assert out[11].n_shingles == 4  # 6 words -> 4 trigram shingles


def test_cross_split_contamination_short_doc_whole_text_shingle(spark):
    """Docs under n words shingle as their whole normalized text — a
    2-word test doc is contaminated iff the same 2-word doc is in train."""
    from gearpump_spark.operators.dedup import cross_split_contamination

    rows = [
        (1, "hello world", "train"),
        (10, "Hello   WORLD", "test"),   # same after normalization
        (11, "hello there", "test"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, split string")
    out = {r.doc_id: r for r in cross_split_contamination(df).collect()}
    assert out[10].contam_frac == 1.0
    assert out[11].contam_frac == 0.0


def test_redact_pii_patterns_and_counts(spark):
    from gearpump_spark.functions.text import pii_counts, redact_pii

    txt = (
        "mail a.b-c_9@sub.example.org or CALL +44-800-123-4567, "
        "server 192.168.0.1 stays; plain text 1.2 unaffected"
    )
    df = spark.createDataFrame([(txt,)], "t string")
    counts = pii_counts(F.col("t"))
    row = df.select(
        redact_pii(F.col("t")).alias("red"),
        *[c.alias(k) for k, c in counts.items()],
    ).collect()[0]
    assert "<EMAIL>" in row.red and "<PHONE>" in row.red and "<IP>" in row.red
    assert "a.b-c_9" not in row.red and "192.168" not in row.red
    assert "1.2 unaffected" in row.red  # short float is not an IP
    assert (row.email, row.ip, row.phone) == (1, 1, 1)


# --- temperature mix golden: rates from closed-form math ------------------


def test_temperature_mix_rates_and_membership(spark):
    from gearpump_spark.operators import sampling as SP

    # Source A: weight 100, B: 400, C: 900.  alpha=0.5 → rate_bp =
    # floor(10000*sqrt(wmin/w)) = A:10000, B:5000, C:3333.
    rows = [(i, "A", 10) for i in range(10)]
    rows += [(100 + i, "B", 40) for i in range(10)]
    rows += [(200 + i, "C", 90) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_chars bigint")
    kept = SP.temperature_mix(df, "source", "doc_id", "n_chars", alpha=0.5).collect()

    def bucket(key: int) -> int:
        return int(hashlib.md5(f"0|{key}".encode()).hexdigest()[:15], 16) % 10_000

    expect_rate = {"A": 10_000, "B": 5_000, "C": 3_333}
    expected = {(i, s) for i, s, _ in rows if bucket(i) < expect_rate[s]}
    assert {(r.doc_id, r.source) for r in kept} == expected
    # the smallest source is kept in full
    assert sum(1 for r in kept if r.source == "A") == 10


def test_temperature_mix_alpha_one_keeps_everything(spark):
    from gearpump_spark.operators import sampling as SP

    rows = [(1, "A", 5), (2, "B", 500), (3, "B", 500)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_chars bigint")
    # alpha=1 → natural proportions → every rate is 10000 bp
    assert SP.temperature_mix(df, "source", "doc_id", "n_chars", alpha=1.0).count() == 3


# --- centroid outliers golden vs numpy ------------------------------------


def test_centroid_outliers_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(30, 4).astype("float32")
    labels = [i % 3 for i in range(30)]
    rows = [(i, labels[i], [float(x) for x in vecs[i]]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id bigint, label int, embedding array<float>")
    got = S.centroid_outliers(df, k=2).collect()

    vs = np.round(vecs.astype("float64") * 1000).astype("int64")
    expect = set()
    for lab in range(3):
        idx = [i for i in range(30) if labels[i] == lab]
        c = len(idx)
        s = vs[idx].sum(axis=0)
        scores = {i: int(((c * vs[i] - s) ** 2).sum()) for i in idx}
        top = sorted(idx, key=lambda i: (-scores[i], i))[:2]
        expect |= {(i, lab, scores[i], r + 1) for r, i in enumerate(top)}
    assert {(r.vec_id, r.label, r.score, r.rank) for r in got} == expect


# --- boilerplate stats golden ---------------------------------------------


def test_boilerplate_stats_counts_instances(spark):
    # "a b" occurs in all 3 docs (and twice in doc 0); "c d" only in doc 2.
    rows = [
        (0, "a b a b"),          # shingles: "a b", "b a", "a b"
        (1, "a b"),              # "a b"
        (2, "a b c d"),          # "a b", "b c", "c d"
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # threshold: ceil(0.67 * 3 docs) = 3 distinct docs → only "a b" is bp
    got = {
        r.doc_id: (r.n_shingles, r.n_boilerplate, r.bp_frac)
        for r in D.boilerplate_stats(df, shingle_n=2, min_doc_frac=0.67).collect()
    }
    assert got == {0: (3, 2, 0.6667), 1: (1, 1, 1.0), 2: (3, 1, 0.3333)}


def test_boilerplate_short_doc_whole_text_shingle(spark):
    rows = [(0, "solo"), (1, "solo"), (2, "x y")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: r.n_boilerplate
        for r in D.boilerplate_stats(df, shingle_n=2, min_doc_frac=0.6).collect()
    }
    # "solo" appears in 2/3 docs ≥ ceil(1.8)=2 → boilerplate; "x y" not
    assert got == {0: 1, 1: 1, 2: 0}


# --- count-min sketch: estimate bounds ------------------------------------


def test_countmin_never_underestimates_and_is_exact_without_collisions(spark):
    from gearpump_spark.operators.sketches import countmin_build, countmin_estimate

    vals = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(vals, "v string")
    cms = countmin_build(df, "v", width=64, depth=3)
    est = {r.v: r.est_n for r in countmin_estimate(cms, df, "v", width=64, depth=3).collect()}
    exact = {"a": 5, "b": 3, "c": 1}
    assert all(est[k] >= exact[k] for k in exact)  # no false negatives
    # 3 values in 64 buckets × 3 rows: some row is collision-free → exact
    assert est == exact


def test_countmin_sketch_is_mergeable(spark):
    from gearpump_spark.operators.sketches import countmin_build

    df1 = spark.createDataFrame([("x",)] * 4, "v string")
    df2 = spark.createDataFrame([("x",)] * 2 + [("y",)], "v string")
    merged = (
        countmin_build(df1, "v").union(countmin_build(df2, "v"))
        .groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    whole = countmin_build(df1.union(df2), "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


# --- triangle count golden vs brute force ---------------------------------


def test_triangle_count_matches_bruteforce(spark):
    import itertools
    import random

    rng = random.Random(11)
    nodes = list(range(12))
    edges = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(30)})
    from gearpump_spark.operators.graph import triangle_count

    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    row = triangle_count(df).collect()[0]
    eset = set(edges)
    brute = sum(
        1
        for a, b, c in itertools.combinations(sorted({n for e in edges for n in e}), 3)
        if (a, b) in eset and (a, c) in eset and (b, c) in eset
    )
    assert row.n_triangles == brute
    assert row.n_edges == len(edges)
    assert row.n_nodes == len({n for e in edges for n in e})


def test_triangle_count_counts_each_once_on_clique(spark):
    import itertools

    # K5: C(5,3) = 10 triangles; also feed duplicate/reversed edges
    edges = list(itertools.combinations(range(5), 2))
    noisy = edges + [(b, a) for a, b in edges] + edges[:3]
    df = spark.createDataFrame(noisy, "src bigint, dst bigint")
    from gearpump_spark.operators.graph import triangle_count

    row = triangle_count(df).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (5, 10, 10)


def test_triangle_estimate_doulion_within_epsilon(spark):
    """DOULION estimate on a triangle-dense fixture lands within 25% of
    the exact count (deterministic seeded sampling → stable assertion),
    the full-graph node/edge stats are exact, and the unbiasing identity
    est = sampled / p^3 holds exactly."""
    import itertools
    import random

    from gearpump_spark.operators.graph import triangle_count, triangle_count_estimate

    # union of overlapping cliques → thousands of triangles, so the
    # p=0.2 estimator concentrates (variance ~ 1/sqrt(T) at fixed p)
    rng = random.Random(3)
    edges = set()
    for _ in range(40):
        clique = rng.sample(range(60), 6)
        edges |= {tuple(sorted(p)) for p in itertools.combinations(clique, 2)}
    df = spark.createDataFrame(sorted(edges), "src bigint, dst bigint")
    exact = triangle_count(df).collect()[0]
    est = triangle_count_estimate(df, p_bp=2000, seed=7).collect()[0]
    assert est.n_nodes == exact.n_nodes and est.n_edges == exact.n_edges
    assert est.est_triangles == est.n_sampled_triangles * 125.0
    assert exact.n_triangles > 500  # fixture is genuinely triangle-dense
    assert abs(est.est_triangles - exact.n_triangles) <= 0.25 * exact.n_triangles


# ---------------------------------------------------------------------------
# r2 additions: chunking, incremental dedup, priority sampling
# ---------------------------------------------------------------------------


class TestChunkByTokens:
    def test_windows_and_tail_rule(self, spark):
        from gearpump_spark.operators.chunking import chunk_by_tokens

        text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        out = chunk_by_tokens(docs, size=4, stride=3).orderBy("chunk_idx").collect()
        # starts 0,3,6,9; start=9 gives 1 token, all inside [6..9] -> dropped
        assert [r.tok_start for r in out] == [0, 3, 6]
        assert [r.n_tokens for r in out] == [4, 4, 4]
        assert out[0].chunk_text == "t0 t1 t2 t3"
        assert out[2].chunk_text == "t6 t7 t8 t9"
        # every token appears in at least one chunk
        covered = set()
        for r in out:
            covered.update(r.chunk_text.split(" "))
        assert covered == {f"t{i}" for i in range(10)}

    def test_short_and_empty_docs(self, spark):
        from gearpump_spark.operators.chunking import chunk_by_tokens

        docs = spark.createDataFrame(
            [(1, "only two"), (2, "   "), (3, "one")],
            "doc_id long, text string",
        )
        out = chunk_by_tokens(docs, size=4, stride=3).collect()
        by_id = {r.doc_id: r for r in out}
        assert set(by_id) == {1, 3}  # whitespace-only doc emits no chunks
        assert by_id[1].n_tokens == 2 and by_id[1].chunk_text == "only two"
        assert by_id[3].n_tokens == 1

    def test_no_overlap_stride_equals_size(self, spark):
        from gearpump_spark.operators.chunking import chunk_by_tokens

        text = " ".join(f"t{i}" for i in range(7))
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        out = chunk_by_tokens(docs, size=3, stride=3).orderBy("chunk_idx").collect()
        assert [r.tok_start for r in out] == [0, 3, 6]
        assert [r.n_tokens for r in out] == [3, 3, 1]
        joined = " ".join(r.chunk_text for r in out)
        assert joined == text  # exact partition, no dup/loss

    def test_invalid_params(self, spark):
        import pytest as _pytest

        from gearpump_spark.operators.chunking import chunk_by_tokens

        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        for size, stride in [(0, 1), (4, 0), (4, 5)]:
            with _pytest.raises(ValueError):
                chunk_by_tokens(docs, size=size, stride=stride)

    def test_plan_is_narrow(self, spark):
        from gearpump_spark.operators.chunking import chunk_by_tokens

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = chunk_by_tokens(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # chunking must never shuffle


class TestIncrementalDedup:
    def test_batch_vs_snapshot(self, spark):
        from gearpump_spark.operators.dedup import incremental_dedup

        snap = spark.createDataFrame(
            [(1, "alpha beta"), (2, "gamma")], "doc_id long, text string"
        )
        batch = spark.createDataFrame(
            [
                (10, "Alpha   beta"),  # dup of snapshot after normalization
                (11, "delta"),
                (12, "delta"),  # within-batch dup, higher id loses
                (13, "epsilon"),
            ],
            "doc_id long, text string",
        )
        out = incremental_dedup(batch, snap).orderBy("doc_id").collect()
        assert [r.doc_id for r in out] == [11, 13]

    def test_empty_batch(self, spark):
        from gearpump_spark.operators.dedup import incremental_dedup

        snap = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        batch = snap.where("doc_id < 0")
        assert incremental_dedup(batch, snap).count() == 0


class TestPrioritySample:
    def test_golden_vs_numpy(self, spark):
        import hashlib

        from gearpump_spark.operators.sampling import priority_sample

        rows = [(i, 10 + (i * 37) % 90) for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, w long")
        k = 20
        out = priority_sample(df, "doc_id", "w", k=k, seed=5).collect()

        def h15(key, seed):
            return int(hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:15], 16)

        pri = sorted(
            ((w * float(1 << 60) / float(h15(i, 5) + 1), i, w) for i, w in rows),
            key=lambda t: (-t[0], t[1]),
        )
        expect = pri[:k]
        tau = pri[k][0]
        got = sorted(out, key=lambda r: (-r.priority, r.doc_id))
        assert [(r.doc_id, r.w) for r in got] == [(i, float(w)) for _, i, w in expect]
        for r in got:
            assert r.w_est == max(r.w, tau)

    def test_population_smaller_than_k(self, spark):
        from gearpump_spark.operators.sampling import priority_sample

        df = spark.createDataFrame([(1, 5), (2, 7)], "doc_id long, w long")
        out = priority_sample(df, "doc_id", "w", k=10).orderBy("doc_id").collect()
        # everyone sampled, no threshold adjustment: w_est == w exactly
        assert [(r.doc_id, r.w, r.w_est) for r in out] == [(1, 5.0, 5.0), (2, 7.0, 7.0)]

    def test_unbiased_estimator_total(self, spark):
        from pyspark.sql import functions as F

        from gearpump_spark.operators.sampling import priority_sample

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        true_total = docs.agg(F.sum("n_chars")).collect()[0][0]
        ests = []
        for seed in range(6):
            s = priority_sample(docs, "doc_id", "n_chars", k=150, seed=seed)
            ests.append(s.agg(F.sum("w_est")).collect()[0][0])
        mean_est = sum(ests) / len(ests)
        assert abs(mean_est - true_total) / true_total < 0.15

    def test_topk_plan_no_global_sort(self, spark):
        from gearpump_spark.operators.sampling import priority_sample

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = (
            priority_sample(docs, "doc_id", "n_chars", k=100)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the big-data scan must feed TakeOrderedAndProject, not a full Sort
        assert "TakeOrderedAndProject" in plan


class TestConnectedComponentsTwoPhase:
    def _labels(self, df):
        return sorted((r.node_id, r.comp) for r in df.collect())

    def test_matches_min_label_on_random_graph(self, spark):
        import random

        from gearpump_spark.operators.graph import (
            connected_components,
            connected_components_twophase,
        )

        rng = random.Random(11)
        edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(150)]
        df = spark.createDataFrame(edges, "src long, dst long")
        a = self._labels(connected_components(df, max_iter=50))
        b = self._labels(connected_components_twophase(df))
        assert a == b

    def test_long_chain_converges_in_log_rounds(self, spark):
        from gearpump_spark.operators.graph import connected_components_twophase

        n = 256  # path graph: diameter 255, min-label would need ~255 rounds
        df = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "src long, dst long"
        )
        out = connected_components_twophase(df, max_iter=12)
        labels = self._labels(out)
        assert labels == [(i, 0) for i in range(n)]

    def test_singletons_and_empty(self, spark):
        from gearpump_spark.operators.graph import connected_components_twophase

        edges = spark.createDataFrame([(1, 2)], "src long, dst long")
        nodes = spark.createDataFrame([(1,), (2,), (9,)], "node_id long")
        out = self._labels(connected_components_twophase(edges, nodes=nodes))
        assert out == [(1, 1), (2, 1), (9, 9)]
        empty = edges.where("src < 0")
        assert connected_components_twophase(empty, nodes=nodes).count() == 3


# Property tests (hypothesis): chunking coverage/reconstruction and
# priority-sample membership invariants over arbitrary inputs.
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None)
@given(
    n_toks=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=8),
    size=st.integers(min_value=1, max_value=12),
    stride_frac=st.integers(min_value=1, max_value=3),
)
def test_chunking_property_full_coverage_no_drop(spark, n_toks, size, stride_frac):
    """Every token appears in >= 1 chunk; chunk starts are stride-aligned;
    with stride == size the chunks partition the doc exactly."""
    from gearpump_spark.operators.chunking import chunk_by_tokens

    stride = max(1, size // stride_frac)
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(n))) for i, n in enumerate(n_toks)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_by_tokens(docs, size=size, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, n in enumerate(n_toks):
        chunks = sorted(by_doc.get(i, []), key=lambda r: r.tok_start)
        if n == 0:
            assert chunks == []
            continue
        covered = set()
        for c in chunks:
            assert c.tok_start % stride == 0
            got = c.chunk_text.split(" ")
            assert got == [f"w{i}_{j}" for j in range(c.tok_start, min(c.tok_start + size, n))]
            covered.update(range(c.tok_start, c.tok_start + c.n_tokens))
        assert covered == set(range(n)), (i, n, size, stride)
        if stride == size:  # exact partition: no overlap either
            assert sum(c.n_tokens for c in chunks) == n


@settings(max_examples=8, deadline=None)
@given(
    weights=st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=60),
    k=st.integers(min_value=1, max_value=20),
    seed=st.integers(min_value=0, max_value=5),
)
def test_priority_sample_property_invariants(spark, weights, k, seed):
    """|sample| == min(k, n); sample ⊆ population; w_est >= w; and the
    winners are exactly the top-k by the definitional priority."""
    import hashlib

    from gearpump_spark.operators.sampling import priority_sample

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = priority_sample(df, "doc_id", "w", k=k, seed=seed).collect()
    assert len(out) == min(k, len(rows))
    ids = {r.doc_id for r in out}
    assert ids <= {i for i, _ in rows}
    for r in out:
        assert r.w_est >= r.w

    def pri(i, w):
        h = int(hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:15], 16)
        return w * float(1 << 60) / float(h + 1)

    expect = sorted(rows, key=lambda t: (-pri(t[0], t[1]), t[0]))[:k]
    assert ids == {i for i, _ in expect}


class TestStripHtml:
    def _clean(self, spark, s):
        from gearpump_spark.functions.text import strip_html
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(s,)], "raw string")
        return df.select(strip_html(F.col("raw")).alias("c")).collect()[0].c

    def test_tags_scripts_entities(self, spark):
        raw = (
            '<div><script>if (a < b) { alert("x"); }</script>'
            "<style>p\n{ color: red }</style>"
            "<p>Hello <b>world</b>!</p><!-- note\nmultiline -->"
            "&quot;A &amp; B&quot; &lt;tag&gt;&nbsp;end</div>"
        )
        # tags become spaces (never glue adjacent words), so `</b>!` keeps
        # a space before the bang — the standard safe stripping semantics
        assert self._clean(spark, raw) == 'Hello world ! "A & B" <tag> end'

    def test_double_escaped_entity_single_decode(self, spark):
        # &amp;lt; means the literal text "&lt;" — must NOT double-decode
        assert self._clean(spark, "x &amp;lt; y") == "x &lt; y"

    def test_malformed_markup_degrades_gracefully(self, spark):
        assert self._clean(spark, "a <b unclosed attr='3' b > c") == "a c"
        assert self._clean(spark, "plain text, no markup") == "plain text, no markup"


class TestSemanticDedup:
    """SemDeDup-style pruning: fixed-centroid assignment + intra-cluster
    cosine drops (operators/similarity.semantic_dedup)."""

    def _emb(self, spark, rows):
        return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    def test_duplicate_in_same_cluster_drops_higher_id(self, spark):
        from gearpump_spark.operators.similarity import semantic_dedup

        rows = [
            (0, [1.0, 0.0]),   # centroid 0
            (1, [0.0, 1.0]),   # centroid 1
            (10, [1.0, 0.8]),  # cluster 0 (cos to its centroid ~0.78)
            (11, [2.0, 1.6]),  # same direction as 10 -> dropped (cos = 1)
            (20, [0.8, 1.0]),  # cluster 1, no near-dup partner
        ]
        out = semantic_dedup(
            self._emb(spark, rows), n_clusters=2, threshold=0.95
        ).orderBy("vec_id").collect()
        assert [(r.vec_id, r.cluster) for r in out] == [
            (0, 0), (1, 1), (10, 0), (20, 1)
        ]

    def test_cross_cluster_duplicates_survive(self, spark):
        """Identical vectors in DIFFERENT clusters are never compared —
        blocking is by cluster, exactly the paper's cost model."""
        from gearpump_spark.operators.similarity import semantic_dedup

        rows = [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            # 10 -> cluster 0, 11 -> cluster 1; cosine(10,11) ~ 0.9945 is
            # far above the threshold but they are never compared; neither
            # is near its own centroid (cos ~ 0.743), so all survive
            (10, [1.0, 0.9]),
            (11, [0.9, 1.0]),
        ]
        out = semantic_dedup(
            self._emb(spark, rows), n_clusters=2, threshold=0.95
        ).orderBy("vec_id").collect()
        assert [r.vec_id for r in out] == [0, 1, 10, 11]

    def test_assignment_tie_breaks_to_lowest_centroid(self, spark):
        from gearpump_spark.operators.similarity import semantic_dedup

        rows = [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.0]),  # centroid identical to 0 -> every tie -> cid 0
            (10, [3.0, 0.0]),
        ]
        # threshold > 1: no drops, isolating the assignment tie-break
        out = {r.vec_id: r.cluster for r in semantic_dedup(
            self._emb(spark, rows), n_clusters=2, threshold=1.1
        ).collect()}
        assert out == {0: 0, 1: 0, 10: 0}

    def test_plan_broadcasts_centroids_no_window(self, spark):
        """Assignment must be a broadcast + map-side struct max: no
        row_number window over every (vector, centroid) pair."""
        import contextlib, io

        from gearpump_spark.operators.similarity import semantic_dedup

        df = semantic_dedup(self._emb(spark, [(0, [1.0, 0.0]), (9, [0.0, 2.0])]))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
        assert "BroadcastExchange" in p
        assert "Window" not in p


def test_semantic_dedup_non_dense_ids(spark):
    """Centroids are the n_clusters LOWEST ids, not `id < n_clusters`:
    a filtered corpus whose ids start at 5000 must still cluster and
    dedup (the old predicate silently returned zero rows)."""
    from gearpump_spark.operators.similarity import semantic_dedup

    rows = [
        (5000, [1.0, 0.0]),
        (5001, [0.0, 1.0]),
        (5010, [1.0, 0.8]),
        (5011, [2.0, 1.6]),  # same direction as 5010 -> dropped
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = semantic_dedup(df, n_clusters=2, threshold=0.95).orderBy("vec_id").collect()
    assert [r.vec_id for r in out] == [5000, 5001, 5010]
    assert {r.cluster for r in out} <= {5000, 5001}


def test_merge_into_three_clause_semantics(spark):
    """Delta-style MERGE: matched+condition deletes, matched updates via
    the SET map, unmatched inserts; a NULL delete-condition value folds
    to false (never deletes); insert_not_matched=False drops unmatched
    update rows."""
    from pyspark.sql import functions as F

    from gearpump_spark.operators.physical import merge_into

    snap = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c"), (4, 40.0, "d")],
        "k bigint, v double, tag string",
    )
    ups = spark.createDataFrame(
        [
            (2, 99.0, "b2", "U"),       # matched update
            (3, 0.0, "c", "D"),         # matched delete
            (4, 44.0, "d", None),       # matched, NULL op -> update, not delete
            (9, 90.0, "z", "N"),        # not matched -> insert
        ],
        "k bigint, v double, tag string, op string",
    )
    out = merge_into(
        snap,
        ups,
        "k",
        update_set={"v": F.col("u.v")},
        delete_condition=F.col("u.op") == "D",
    )
    got = {r.k: (r.v, r.tag) for r in out.collect()}
    assert got == {
        1: (10.0, "a"),   # untouched
        2: (99.0, "b"),   # v updated, tag kept (not in update_set)
        4: (44.0, "d"),   # NULL condition -> updated, not deleted
        9: (90.0, "z"),   # inserted with the update row's columns
    }
    # no insert clause: row 9 disappears, everything else unchanged
    no_ins = merge_into(
        snap,
        ups,
        "k",
        update_set={"v": F.col("u.v")},
        delete_condition=F.col("u.op") == "D",
        insert_not_matched=False,
    )
    assert {r.k for r in no_ins.collect()} == {1, 2, 4}


def test_merge_into_null_key_snapshot_rows_pass_through(spark):
    """r3 review finding: a snapshot row with a NULL merge key never
    joins (SQL equality) and must pass through UNTOUCHED — it is not an
    insert row and must never be replaced by the all-NULL update side
    or dropped by insert_not_matched=False."""
    from pyspark.sql import functions as F

    from gearpump_spark.operators.physical import merge_into

    snap = spark.createDataFrame(
        [(None, 7.0, "nullkey"), (1, 10.0, "a")], "k bigint, v double, tag string"
    )
    ups = spark.createDataFrame([(1, 11.0, "U")], "k bigint, v double, op string")
    for insert in (True, False):
        out = merge_into(
            snap,
            ups.withColumn("tag", F.lit("z")).select("k", "v", "tag", "op"),
            "k",
            update_set={"v": F.col("u.v")},
            delete_condition=F.col("u.op") == "D",
            insert_not_matched=insert,
        )
        got = {r.tag: (r.k, r.v) for r in out.collect()}
        assert got["nullkey"] == (None, 7.0), insert
        assert got["a"] == (1, 11.0), insert
    # typoed SET target fails loudly instead of silently no-opping
    import pytest as _pytest

    with _pytest.raises(ValueError):
        merge_into(snap, ups.select("k", "v", F.lit("t").alias("tag"), "op"), "k",
                   update_set={"acctbal": F.col("u.v")})


def test_merge_into_duplicate_update_keys_guard(spark):
    """ADVICE r3: duplicate merge keys in the update batch are AMBIGUOUS
    under Delta MERGE semantics and must raise at execution time by
    default (silently emitting one snapshot row per update row is data
    duplication); 'allow' opts into the multiplying behavior, and NULL
    update keys are exempt (they never match anything)."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from gearpump_spark.operators.physical import merge_into

    snap = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k bigint, v double")
    dup = spark.createDataFrame(
        [(1, 11.0), (1, 12.0), (2, 22.0)], "k bigint, v double"
    )
    ambiguous = merge_into(snap, dup, "k", update_set={"v": F.col("u.v")})
    with pytest.raises(Exception) as ei:
        ambiguous.collect()
    assert "multiple update rows" in str(ei.value)

    allowed = merge_into(
        snap, dup, "k", update_set={"v": F.col("u.v")},
        on_duplicate_update_keys="allow",
    )
    assert sorted((r.k, r.v) for r in allowed.collect()) == [
        (1, 11.0), (1, 12.0), (2, 22.0)
    ]

    # NULL update keys never match -> not ambiguous, default mode passes
    nulls = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), (2, 22.0)], "k bigint, v double"
    )
    out = merge_into(snap, nulls, "k", update_set={"v": F.col("u.v")})
    got = sorted(
        ((r.k, r.v) for r in out.collect()),
        key=lambda t: (t[0] is not None, t[0] or 0, t[1]),
    )
    assert got == [(None, 1.0), (None, 2.0), (1, 10.0), (2, 22.0)]

    with pytest.raises(ValueError):
        merge_into(snap, dup, "k", on_duplicate_update_keys="bogus")


def test_int4_quantize_edge_dims_and_padding(spark):
    """r3 review findings: dim-0 and dim-1 vectors must not crash
    (sequence(1, 0) is DESCENDING in Spark), and odd dims pad the
    trailing low nibble with code 0 instead of dropping the component."""
    df = spark.createDataFrame(
        [
            (0, []),                       # empty -> empty packed
            (1, [0.5]),                    # dim 1 -> one padded byte
            (2, [1.0, -1.0, 0.5]),         # odd dim -> last padded
            (3, [0.0, 0.0]),               # all-zero -> scale 0
            (4, [7.0, -7.0, 3.5, -3.5]),   # even dim
        ],
        "vec_id bigint, embedding array<float>",
    )
    got = {r.vec_id: (r.scale, r.packed) for r in S.quantize_embeddings_int4(df).collect()}
    assert got[0] == (0.0, [])
    # dim 1: code round(0.5 * 7/0.5)=7 -> (7+8)*16 + 8 (pad)
    assert got[1] == (14.0, [(7 + 8) * 16 + 8])
    # dim 3: codes 7, -7, round(0.5*7)=4 -> bytes [(15,1)], [(12, pad 8)]
    assert got[2] == (7.0, [(7 + 8) * 16 + (-7 + 8), (4 + 8) * 16 + 8])
    assert got[3] == (0.0, [(0 + 8) * 16 + (0 + 8)])
    assert got[4][1] == [(7 + 8) * 16 + (-7 + 8), (4 + 8) * 16 + (-4 + 8)]
    # every nibble round-trips: unpack == quantized codes (plus padding)
    for vid, (scale, packed) in got.items():
        codes = []
        for b in packed:
            codes += [(b >> 4) - 8, (b & 15) - 8]
        assert all(-7 <= c <= 8 - 8 + 7 for c in codes)


def test_duplicate_spans_runs_and_counts(spark):
    """Handcrafted corpus: doc 0 and doc 1 share a 10-token prefix, so
    with n=3 their first 8 windows are duplicated (one run of 8); doc 2
    is unique; doc 3 is too short for any window."""
    shared = "a b c d e f g h i j"
    rows = [
        (0, shared + " x0 y0 z0"),
        (1, shared + " x1 y1 z1"),
        (2, "p q r s t u v w"),
        (3, "t1 t2"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    from gearpump_spark.operators.dedup import duplicate_spans

    out = {r.doc_id: r for r in duplicate_spans(df, n=3).collect()}
    # doc 0: 13 tokens -> 11 windows; windows starting at pos 0..7 lie
    # fully inside the shared prefix and repeat in doc 1
    assert (out[0].n_windows, out[0].n_dup, out[0].max_dup_run) == (11, 8, 8)
    assert (out[1].n_windows, out[1].n_dup, out[1].max_dup_run) == (11, 8, 8)
    assert (out[2].n_windows, out[2].n_dup, out[2].max_dup_run) == (6, 0, 0)
    assert 3 not in out  # 2 tokens < n: no windows, no row

    # within-doc repetition also counts as duplication
    rep = spark.createDataFrame(
        [(0, "m n o k1 m n o k2")], "doc_id bigint, text string"
    )
    r = duplicate_spans(rep, n=3).collect()[0]
    assert (r.n_windows, r.n_dup, r.max_dup_run) == (6, 2, 1)


def test_scd2_history_intervals(spark):
    """Hand-built change stream: runs collapse, intervals chain, the open
    version is current, and re-ordering input rows changes nothing."""
    from gearpump_spark.operators.temporal import scd2_history

    rows = [
        # (key, plan, ts, id) — key 1: A,A,B,A ; key 2: X only
        (1, "A", 100, 1),
        (1, "A", 200, 2),
        (1, "B", 300, 3),
        (1, "A", 400, 4),
        (2, "X", 150, 5),
    ]
    df = spark.createDataFrame(rows, "k bigint, plan string, ts bigint, id bigint")
    got = {
        (r.k, r.version): (r.plan, r.valid_from, r.valid_to, r.is_current, r.n_events)
        for r in scd2_history(df, ["k"], ["plan"], "ts", "id").collect()
    }
    assert got == {
        (1, 1): ("A", 100, 300, False, 2),
        (1, 2): ("B", 300, 400, False, 1),
        (1, 3): ("A", 400, None, True, 1),
        (2, 1): ("X", 150, None, True, 1),
    }
    # input order must not matter (window order is total via tiebreak)
    shuffled = spark.createDataFrame(list(reversed(rows)),
                                     "k bigint, plan string, ts bigint, id bigint")
    got2 = {
        (r.k, r.version): (r.plan, r.valid_from, r.valid_to, r.is_current, r.n_events)
        for r in scd2_history(shuffled, ["k"], ["plan"], "ts", "id").collect()
    }
    assert got2 == got


def test_fuzzy_pairs_prefix_blocking(spark):
    from gearpump_spark.operators.dedup import fuzzy_pairs

    rows = [("red widget",), ("red widgit",), ("red widget",), ("blue bolt",),
            ("blue boltt",), ("green gear",)]
    df = spark.createDataFrame(rows, "name string")
    got = {(r.name_a, r.name_b): (r.dist, r.support_a, r.support_b)
           for r in fuzzy_pairs(df, "name", max_dist=2, prefix_len=3).collect()}
    assert got == {
        ("red widget", "red widgit"): (1, 2, 1),
        ("blue bolt", "blue boltt"): (1, 1, 1),
    }


def test_fuzzy_pairs_d1_recall_complete(spark):
    """SymSpell deletion blocking must find EVERY distance-1 pair a brute
    force over the vocabulary finds (substitution, insertion, deletion),
    and nothing else."""
    import itertools

    from gearpump_spark.operators.dedup import fuzzy_pairs_d1

    vocab = ["cat", "bat", "cart", "ca", "dog", "dot", "cast", "cats", "xyz"]
    df = spark.createDataFrame([(v,) for v in vocab for _ in range(2)], "name string")
    got = {(r.name_a, r.name_b) for r in fuzzy_pairs_d1(df, "name").collect()}

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
        return d[len(b)]

    brute = {
        (a, b)
        for a, b in itertools.combinations(sorted(vocab), 2)
        if lev(a, b) == 1
    }
    assert got == brute
    # support column carries corpus frequency (every value inserted twice)
    sup = {r.name_a: r.support_a for r in fuzzy_pairs_d1(df, "name").collect()}
    assert set(sup.values()) == {2}


def test_kmeans_int_matches_pure_python(spark):
    """Bit-exact golden for the integer k-means: same quantization, md5
    seed order, integer argmin with cid tiebreak, floor-division update."""
    import hashlib

    from gearpump_spark.operators.similarity import kmeans_int

    import random as _r
    rng = _r.Random(7)
    vecs = {i: [rng.uniform(-0.5, 0.5) for _ in range(8)] for i in range(40)}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id bigint, embedding array<float>",
    )
    got = {r.vec_id: r.cluster for r in kmeans_int(df, "embedding", k=3, n_iter=2).collect()}

    import math
    # reproduce float32 storage then the exact quantization
    import struct
    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]
    q = {i: [math.floor((f32(x) + 2.0) * 10**6) for x in v] for i, v in vecs.items()}
    seed_ids = sorted(q, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:3]
    cents = [q[i][:] for i in seed_ids]

    def assign():
        out = {}
        for i, v in q.items():
            dists = [(sum((a - b) ** 2 for a, b in zip(v, c)), ci) for ci, c in enumerate(cents)]
            out[i] = min(dists)[1]
        return out

    for _ in range(2):
        a = assign()
        for ci in range(3):
            members = [q[i] for i in a if a[i] == ci]
            if members:
                cents[ci] = [sum(col) // len(members) for col in zip(*members)]
    assert got == assign()


def test_zorder_key_three_dims_matches_python(spark):
    """Morton interleave generalizes to N dims: bit i of dim d lands at
    i*n + (n-1-d). Pin against a pure-python interleave on 3 dims,
    including the integer normalization."""
    from gearpump_spark.operators.physical import zorder_key

    rows = [(5, 17, 200), (0, 0, 0), (63, 63, 63), (1, 62, 31)]
    df = spark.createDataFrame(rows, "a bigint, b bigint, c bigint")
    bounds = [(F.lit(0), F.lit(63)), (F.lit(0), F.lit(63)), (F.lit(0), F.lit(255))]
    got = [
        r.z
        for r in df.select(
            zorder_key([F.col("a"), F.col("b"), F.col("c")], bounds, bits=8).alias("z")
        ).collect()
    ]

    def norm(x, lo, hi, bits=8):
        return ((x - lo) * ((1 << bits) - 1)) // max(hi - lo, 1)

    def morton3(a, b, c, bits=8):
        n = 3
        vals = [norm(a, 0, 63), norm(b, 0, 63), norm(c, 0, 255)]
        out = 0
        for d, v in enumerate(vals):
            for i in range(bits):
                out |= ((v >> i) & 1) << (i * n + (n - 1 - d))
        return out

    assert got == [morton3(*r) for r in rows]


def test_triangle_close_strategies_agree(spark):
    """Both closing strategies must count identically; the broadcast path
    must plan a broadcast LEFT-SEMI with NO sort-merge join in the
    closing stage (the stateless shape that cannot OOM a small heap)."""
    import contextlib
    import io

    from gearpump_spark.operators.graph import triangle_count

    # K4 plus a pendant edge: C(4,3)=4 triangles
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    rows = {}
    for strat in ("merge", "broadcast", "auto"):
        r = triangle_count(df, close_strategy=strat).collect()[0]
        rows[strat] = (r.n_nodes, r.n_edges, r.n_triangles)
    assert rows["merge"] == rows["broadcast"] == rows["auto"] == (5, 7, 4)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        triangle_count(df, close_strategy="broadcast").explain("formatted")
    p = buf.getvalue().lower()
    # the closing check is a broadcast LEFT-SEMI (stateless, no sort
    # buffers over the wedge stream); the remaining sort-merge joins sit
    # on the small edge-list side (wedge self-join), which is fine
    assert "broadcasthashjoin" in p and "leftsemi" in p, p
    # and the wedge stream feeds a KEYLESS count (formatted mode prints
    # "Keys: []" + partial_count), not a keyed pair aggregation (the
    # state that OOM'd a default heap)
    assert "keys: []" in p and "partial_count(1)" in p, p


def test_hll_register_table_golden_and_mergeable(spark):
    """Registers match a pure-python build of the same seeded 60-bit
    family; union of two halves re-aggregated by max equals the whole
    (the monoid merge property)."""
    import hashlib

    from gearpump_spark.operators import sketches as SK

    vals = [f"user{i}" for i in range(300)]
    df = spark.createDataFrame([(v,) for v in vals], "u string")
    got = {r.idx: r.rho for r in SK.hll_register_table(df, "u", b=8).collect()}

    regs: dict[int, int] = {}
    for v in vals:
        h = int(hashlib.md5(f"0|{v}".encode()).hexdigest()[:15], 16)
        idx, w = h % 256, h >> 8
        rho = (60 - 8 + 1) - w.bit_length() if w else 60 - 8 + 1
        regs[idx] = max(regs.get(idx, 0), rho)
    assert got == regs

    half1 = spark.createDataFrame([(v,) for v in vals[:150]], "u string")
    half2 = spark.createDataFrame([(v,) for v in vals[150:]], "u string")
    merged = (
        SK.hll_register_table(half1, "u", b=8)
        .union(SK.hll_register_table(half2, "u", b=8))
        .groupBy("idx")
        .agg(F.max("rho").alias("rho"))
    )
    assert {r.idx: r.rho for r in merged.collect()} == regs


def test_pq_encode_and_adc_match_pure_python(spark):
    """Bit-exact golden for product quantization: micro-unit quantization,
    md5-ordered seed codebook, per-subspace integer argmin (ties -> lowest
    cid), and the ADC table-lookup distance — all reproduced in pure
    python over float32-stored vectors."""
    import hashlib
    import math
    import struct

    from gearpump_spark.operators.similarity import (
        pq_encode,
        pq_topk_adc,
        pq_train_codebook,
    )

    import random as _r

    rng = _r.Random(11)
    n, dim, m, k = 40, 16, 4, 8
    d_sub = dim // m

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    vecs = {i: [rng.uniform(-1.5, 1.5) for _ in range(dim)] for i in range(n)}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id bigint, embedding array<float>",
    )

    cb = pq_train_codebook(df, m=m, k=k)
    q = {i: [math.floor((f32(x) + 2.0) * 10**6) for x in v] for i, v in vecs.items()}
    seed_ids = sorted(q, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:k]
    exp_cb = [
        [q[i][mm * d_sub : (mm + 1) * d_sub] for i in seed_ids] for mm in range(m)
    ]
    assert cb == exp_cb

    def enc(v):
        codes, err = [], 0
        for mm in range(m):
            sub = v[mm * d_sub : (mm + 1) * d_sub]
            d, cid = min(
                (sum((a - b) ** 2 for a, b in zip(sub, c)), ci)
                for ci, c in enumerate(exp_cb[mm])
            )
            codes.append(cid)
            err += d
        return codes, err

    got = {r.vec_id: (list(r.codes), r.err) for r in pq_encode(df, cb).collect()}
    assert got == {i: enc(v) for i, v in q.items()}

    # ADC: query distance tables + code lookups, top-3 with id tiebreak
    queries = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    codes_df = pq_encode(df, cb).select("vec_id", "codes")
    got_adc = [
        (r.q_id, r.vec_id, r.adc_dist, r.rank)
        for r in pq_topk_adc(queries, codes_df, cb, k=3)
        .orderBy("q_id", "rank")
        .collect()
    ]
    exp_adc = []
    for qi in range(3):
        dt = [
            [
                sum((a - b) ** 2 for a, b in zip(q[qi][mm * d_sub : (mm + 1) * d_sub], c))
                for c in exp_cb[mm]
            ]
            for mm in range(m)
        ]
        scored = sorted(
            (sum(dt[mm][enc(q[i])[0][mm]] for mm in range(m)), i) for i in q
        )[:3]
        exp_adc.extend((qi, i, d, r + 1) for r, (d, i) in enumerate(scored))
    assert got_adc == exp_adc


def test_ivfpq_matches_pure_python_and_prunes_lists(spark):
    """IVF-PQ golden: coarse argmin over concatenated subspace seeds,
    nprobe list pruning, ADC over surviving codes — reproduced in pure
    python; also asserts pruning really happened (some probed-ADC result
    differs from full-ADC, or candidate sets shrank)."""
    import hashlib
    import math
    import struct

    from gearpump_spark.operators.similarity import (
        pq_encode,
        pq_topk_ivfadc,
        pq_train_codebook,
    )

    import random as _r

    rng = _r.Random(23)
    n, dim, m, k_cb, nlist, nprobe = 60, 16, 4, 8, 4, 2
    d_sub = dim // m

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    vecs = {i: [rng.uniform(-1.5, 1.5) for _ in range(dim)] for i in range(n)}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id bigint, embedding array<float>",
    )
    cb = pq_train_codebook(df, m=m, k=k_cb)
    queries = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = [
        (r.q_id, r.vec_id, r.adc_dist, r.rank)
        for r in pq_topk_ivfadc(
            queries, df, cb, nlist=nlist, nprobe=nprobe, k=3
        ).orderBy("q_id", "rank").collect()
    ]

    q = {i: [math.floor((f32(x) + 2.0) * 10**6) for x in v] for i, v in vecs.items()}
    seed_ids = sorted(q, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:k_cb]
    exp_cb = [[q[i][mm * d_sub : (mm + 1) * d_sub] for i in seed_ids] for mm in range(m)]
    coarse = [
        [x for mm in range(m) for x in exp_cb[mm][cid]] for cid in range(nlist)
    ]

    def cdists(v):
        return sorted(
            (sum((a - b) ** 2 for a, b in zip(v, c)), ci) for ci, c in enumerate(coarse)
        )

    def enc(v):
        return [
            min(
                (sum((a - b) ** 2 for a, b in zip(v[mm * d_sub : (mm + 1) * d_sub], c)), ci)
                for ci, c in enumerate(exp_cb[mm])
            )[1]
            for mm in range(m)
        ]

    assign = {i: cdists(v)[0][1] for i, v in q.items()}
    codes = {i: enc(v) for i, v in q.items()}
    exp = []
    for qi in range(3):
        probed = {ci for _, ci in cdists(q[qi])[:nprobe]}
        dt = [
            [sum((a - b) ** 2 for a, b in zip(q[qi][mm * d_sub : (mm + 1) * d_sub], c))
             for c in exp_cb[mm]]
            for mm in range(m)
        ]
        cands = sorted(
            (sum(dt[mm][codes[i][mm]] for mm in range(m)), i)
            for i in q if assign[i] in probed
        )[:3]
        exp.extend((qi, i, d, r + 1) for r, (d, i) in enumerate(cands))
        assert len([i for i in q if assign[i] in probed]) < n  # lists pruned
    assert got == exp


class TestKCore:
    def test_cascade_peels_path_graph(self, spark):
        """k=2 on a path a-b-c-d-e plus a 4-clique: every path node
        eventually peels (endpoints first — the cascade), the clique
        survives with degree 3."""
        from gearpump_spark.operators.graph import kcore

        path = [(1, 2), (2, 3), (3, 4), (4, 5)]
        clique = [(u, v) for u in (10, 11, 12, 13) for v in (10, 11, 12, 13) if u < v]
        df = spark.createDataFrame(path + clique, "src bigint, dst bigint")
        got = {(r.node, r.deg) for r in kcore(df, k=2, n_rounds=4).collect()}
        assert got == {(10, 3), (11, 3), (12, 3), (13, 3)}

    def test_matches_pure_python_peel(self, spark):
        import collections
        import random as _r

        from gearpump_spark.operators.graph import kcore

        rng = _r.Random(5)
        edges = {tuple(sorted(rng.sample(range(30), 2))) for _ in range(80)}
        df = spark.createDataFrame(sorted(edges), "src bigint, dst bigint")
        got = {(r.node, r.deg) for r in kcore(df, k=4, n_rounds=6).collect()}

        E = set(edges)
        for _ in range(6):
            deg = collections.Counter()
            for u, v in E:
                deg[u] += 1
                deg[v] += 1
            alive = {n for n, c in deg.items() if c >= 4}
            E = {(u, v) for u, v in E if u in alive and v in alive}
        deg = collections.Counter()
        for u, v in E:
            deg[u] += 1
            deg[v] += 1
        assert got == {(n, c) for n, c in deg.items() if c >= 4}

    def test_registered_rounds_reach_fixpoint(self, spark, sf_dir):
        """The query's 4 bounded rounds must BE the fixpoint on the
        co-purchase graph (so 'exact k-core' in the desc stays honest):
        one more round changes nothing."""
        from gearpump_spark.operators.graph import kcore
        from gearpump_spark.datasets import table

        li = table(spark, sf_dir, "lineitem")
        items = li.select("l_orderkey", "l_partkey").distinct()
        a, b = items.alias("a"), items.alias("b")
        edges = (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
            .distinct()
        )
        r4 = {(r.node, r.deg) for r in kcore(edges, k=60, n_rounds=4).collect()}
        r5 = {(r.node, r.deg) for r in kcore(edges, k=60, n_rounds=5).collect()}
        assert r4 == r5 and len(r4) > 0


class TestLabelPropagation:
    def test_two_cliques_bridge(self, spark):
        """Two 4-cliques joined by one bridge edge: each clique converges
        to its own min label; the bridge can't flip a 3-vote majority."""
        from gearpump_spark.operators.graph import label_propagation

        c1 = [(u, v) for u in (1, 2, 3, 4) for v in (1, 2, 3, 4) if u < v]
        c2 = [(u, v) for u in (10, 11, 12, 13) for v in (10, 11, 12, 13) if u < v]
        df = spark.createDataFrame(c1 + c2 + [(4, 10)], "src bigint, dst bigint")
        got = {(r.node, r.label) for r in label_propagation(df, n_rounds=4).collect()}
        assert got == {(n, 1) for n in (1, 2, 3, 4)} | {
            (n, 10) for n in (10, 11, 12, 13)
        }

    def test_matches_pure_python_sync_lpa(self, spark):
        import collections
        import random as _r

        from gearpump_spark.operators.graph import label_propagation

        rng = _r.Random(9)
        edges = {tuple(sorted(rng.sample(range(25), 2))) for _ in range(60)}
        df = spark.createDataFrame(sorted(edges), "src bigint, dst bigint")
        got = {(r.node, r.label) for r in label_propagation(df, n_rounds=3).collect()}

        nbrs = collections.defaultdict(list)
        for u, v in edges:
            nbrs[u].append(v)
            nbrs[v].append(u)
        label = {n: n for n in nbrs}
        for _ in range(3):
            new = {}
            for n, ns in nbrs.items():
                votes = collections.Counter(label[m] for m in ns)
                # count DESC, label ASC — the registered tie-break
                new[n] = min(votes, key=lambda l: (-votes[l], l))
            label = new
        assert got == set(label.items())


class TestNegativePairs:
    """negative_pairs: hash-permutation rank + fixed-stride partner pick.
    For fixed j the rank shift r -> (r + j*stride) % N is a bijection, so
    every doc appears exactly once as anchor and once as negative per j
    (minus dropped self-pairs, which occur iff (j*stride) % N == 0)."""

    def _pairs(self, spark, n, k=2, seed=0, stride=7919, parts=None):
        from gearpump_spark.operators.sampling import negative_pairs

        df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
        if parts:
            df = df.repartition(parts)
        return negative_pairs(df, "doc_id", k=k, seed=seed, stride=stride).collect()

    def test_bijection_per_offset_no_self_pairs(self, spark):
        rows = self._pairs(spark, 97, k=2)
        assert len(rows) == 97 * 2
        for j in (1, 2):
            sub = [r for r in rows if r.j == j]
            assert len({r.anchor_id for r in sub}) == 97
            assert len({r.neg_id for r in sub}) == 97
        assert all(r.anchor_id != r.neg_id for r in rows)

    def test_self_pairs_dropped_when_stride_divides_n(self, spark):
        # stride=10, N=20: j=2 shift is 20 % 20 == 0 -> all j=2 rows are
        # self-pairs and must vanish; j=1 (shift 10) survives intact.
        rows = self._pairs(spark, 20, k=2, stride=10)
        assert sorted({r.j for r in rows}) == [1]
        assert len(rows) == 20

    def test_deterministic_across_partitionings(self, spark):
        a = sorted(map(tuple, self._pairs(spark, 60, parts=1)))
        b = sorted(map(tuple, self._pairs(spark, 60, parts=13)))
        assert a == b

    def test_seed_changes_pairing(self, spark):
        a = sorted(map(tuple, self._pairs(spark, 60, seed=0)))
        b = sorted(map(tuple, self._pairs(spark, 60, seed=1)))
        assert a != b

    def test_matches_pure_python(self, spark):
        import hashlib

        n, k, seed, stride = 41, 3, 2, 7
        got = sorted(map(tuple, self._pairs(spark, n, k=k, seed=seed, stride=stride)))

        def h(i):
            return int(hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:15], 16)

        ranked = sorted(range(n), key=lambda i: (h(i), i))
        rank = {doc: r for r, doc in enumerate(ranked)}
        expect = sorted(
            (doc, ranked[(rank[doc] + j * stride) % n], j)
            for doc in range(n)
            for j in range(1, k + 1)
            if ranked[(rank[doc] + j * stride) % n] != doc
        )
        assert got == expect


class TestRandomProjection:
    """JL ±1 projection: integer-exact vs numpy, cosine-preserving
    within JL tolerance, and a zero-shuffle narrow map."""

    def _proj(self, spark, vecs, out_dim=16, seed=7):
        from gearpump_spark.operators.similarity import random_projection

        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        return random_projection(
            df, "embedding", dim=len(vecs[0]), out_dim=out_dim, seed=seed
        )

    def test_matches_numpy(self, spark):
        import numpy as np

        from gearpump_spark.operators.similarity import _jl_signs

        rng = np.random.RandomState(0)
        vecs = rng.uniform(-0.5, 0.5, size=(20, 64))
        got = {r.vec_id: list(r.proj) for r in self._proj(spark, vecs).collect()}
        S = np.array(_jl_signs(7, 16, 64))  # (16, 64)
        # Spark F.round on .5 goes HALF_UP (away from zero for negatives
        # too under Spark's HALF_UP on doubles? no: HALF_UP rounds .5 away
        # from zero) — numpy rint would round half to even, so emulate.
        vq = np.floor(np.abs(vecs) * 1000 + 0.5).astype(np.int64) * np.sign(
            vecs
        ).astype(np.int64)
        expect = vq @ S.T
        for i in range(len(vecs)):
            assert got[i] == list(expect[i]), f"row {i}"

    def test_cosine_preserved_within_jl_tolerance(self, spark):
        import numpy as np

        rng = np.random.RandomState(1)
        # clustered vectors (4 base directions + noise) so true cosines
        # span a wide range — isotropic Gaussians all sit near cos=0,
        # leaving no signal for the correlation check to measure
        base = rng.normal(0, 0.2, size=(4, 64))
        vecs = np.array(
            [base[i % 4] + rng.normal(0, 0.05, 64) for i in range(40)]
        )
        rows = self._proj(spark, vecs, out_dim=16).collect()
        proj = np.array([r.proj for r in sorted(rows, key=lambda r: r.vec_id)])

        def cos(m):
            n = m / np.linalg.norm(m, axis=1, keepdims=True)
            return n @ n.T

        c0, c1 = cos(vecs), cos(proj.astype(float))
        iu = np.triu_indices(len(vecs), 1)
        err = np.abs(c0[iu] - c1[iu])
        # JL with k=16 dense ±1 signs: per-pair error ~ 1/sqrt(16)
        assert err.mean() < 0.25 and np.corrcoef(c0[iu], c1[iu])[0, 1] > 0.6

    def test_plan_zero_exchanges(self, spark):
        import contextlib
        import io

        df = self._proj(spark, [[0.1] * 64, [0.2] * 64])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        assert "Exchange" not in buf.getvalue()

    def test_seed_and_outdim(self, spark):
        a = self._proj(spark, [[0.3] * 64], seed=7).collect()[0].proj
        b = self._proj(spark, [[0.3] * 64], seed=8).collect()[0].proj
        assert a != b and len(a) == 16
        c = self._proj(spark, [[0.3] * 64], out_dim=4, seed=7).collect()[0].proj
        assert c == a[:4]  # sign rows are independent per j


class TestUnimaxAllocation:
    """Closed water-filling form == the paper's sequential greedy."""

    def _alloc(self, spark, sizes, frac=0.85, E=1):
        from gearpump_spark.operators.sampling import unimax_allocation

        rows = [(f"s{i:03d}", int(c)) for i, c in enumerate(sizes)]
        df = spark.createDataFrame(rows, "source string, n_chars long")
        out = unimax_allocation(df, "source", "n_chars", frac, E)
        return {r.source: r for r in out.collect()}

    @staticmethod
    def _greedy(sizes, frac, E):
        import math

        named = sorted((int(c), f"s{i:03d}") for i, c in enumerate(sizes))
        B = math.floor(frac * sum(c for c, _ in named))
        rem, out = float(B), {}
        for i, (c, name) in enumerate(named):
            share = rem / (len(named) - i)
            q = min(float(c * E), share)
            out[name] = q
            rem -= q
        return out

    def test_matches_sequential_greedy(self, spark):
        import random

        rng = random.Random(3)
        for trial in range(4):
            sizes = [rng.randint(100, 50_000) for _ in range(rng.randint(2, 15))]
            frac = [0.3, 0.85, 1.0, 2.5][trial]
            E = [1, 1, 2, 3][trial]
            got = self._alloc(spark, sizes, frac, E)
            want = self._greedy(sizes, frac, E)
            for name, row in got.items():
                # closed form does exact-integer arithmetic until ONE final
                # division; greedy accumulates float subtractions — equal
                # up to float noise, and exactly equal on capped rows
                assert abs(row.quota - want[name]) < 1e-6 * max(1, want[name])
                assert row.quota <= row.tokens * E + 1e-9
            total = sum(r.quota for r in got.values())
            import math

            B = math.floor(frac * sum(sizes))
            if not all(r.capped for r in got.values()):
                assert abs(total - B) < 1e-6 * B  # budget fully spent
            else:
                assert total <= B  # every source exhausted under budget

    def test_all_capped_when_budget_exceeds_corpus(self, spark):
        got = self._alloc(spark, [100, 200, 300], frac=5.0, E=1)
        assert all(r.capped for r in got.values())
        assert all(r.epochs == 1.0 for r in got.values())

    def test_none_capped_uniform(self, spark):
        got = self._alloc(spark, [1000] * 4, frac=0.5, E=1)
        assert not any(r.capped for r in got.values())
        assert len({r.quota for r in got.values()}) == 1


class TestLinkPrediction:
    def _predict(self, spark, edge_list, k=50, max_degree=None):
        from gearpump_spark.operators.graph import link_predict_common_neighbors

        df = spark.createDataFrame(edge_list, "src long, dst long")
        return link_predict_common_neighbors(df, k=k, max_degree=max_degree).collect()

    @staticmethod
    def _python_truth(edge_list):
        import collections

        nbrs = collections.defaultdict(set)
        for a, b in edge_list:
            if a != b:
                nbrs[a].add(b)
                nbrs[b].add(a)
        linked = {(min(a, b), max(a, b)) for a, b in edge_list if a != b}
        out = {}
        nodes = sorted(nbrs)
        for i, x in enumerate(nodes):
            for y in nodes[i + 1 :]:
                if (x, y) in linked:
                    continue
                c = len(nbrs[x] & nbrs[y])
                if c:
                    out[(x, y)] = (c, c / len(nbrs[x] | nbrs[y]))
        return out

    def test_matches_pure_python(self, spark):
        import random

        rng = random.Random(5)
        edges = list({(rng.randint(0, 25), rng.randint(0, 25)) for _ in range(60)})
        got = self._predict(spark, edges, k=1000)
        want = self._python_truth(edges)
        assert {(r.u, r.v): (r.common, r.jaccard) for r in got} == want
        # ranking is (common desc, jaccard desc, u, v) — verify total order
        keys = [(-r.common, -r.jaccard, r.u, r.v) for r in got]
        assert keys == sorted(keys)

    def test_linked_pairs_never_predicted(self, spark):
        # triangle + pendant: (1,2),(2,3),(1,3) linked; only (1,4) etc unlinked
        edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
        got = {(r.u, r.v) for r in self._predict(spark, edges)}
        assert (1, 2) not in got and (1, 4) in got and (2, 4) in got

    def test_max_degree_excludes_hub_centers(self, spark):
        # star: hub 0 connects 1..6; every leaf pair shares ONLY the hub
        edges = [(0, i) for i in range(1, 7)]
        full = self._predict(spark, edges)
        assert len(full) == 15  # C(6,2) leaf pairs via the hub
        capped = self._predict(spark, edges, max_degree=3)
        assert capped == []  # hub excluded as wedge center -> no wedges


def test_cluster_safe_split_no_leakage(spark, sf_dir):
    """Every LSH candidate pair must land on ONE side of the split —
    the property per-doc hash splits violate (checked here: the same
    corpus split by doc_id DOES leak at least one pair)."""
    from gearpump_spark.operators import dedup as D
    from gearpump_spark.operators.graph import connected_components
    from gearpump_spark.operators.sampling import cluster_safe_split
    from gearpump_spark.datasets import table

    docs = table(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs, k=6)
    pairs = D.lsh_candidate_pairs(sig, k=6, rows_per_band=2)
    comps = connected_components(
        pairs, nodes=docs.select("doc_id"), src="a", dst="b"
    ).select(F.col("node_id").alias("doc_id"), F.col("comp").alias("cluster_id"))
    split = {
        r.doc_id: r.split
        for r in cluster_safe_split(comps, "cluster_id").collect()
    }
    plist = [(r.a, r.b) for r in pairs.collect()]
    assert plist, "fixture should produce candidate pairs"
    assert all(split[a] == split[b] for a, b in plist)
    assert {"train", "test"} == set(split.values())
    # contrast: naive per-doc split leaks (if it didn't, the clustered
    # split would be pointless on this corpus)
    from gearpump_spark.operators.sampling import train_test_split

    naive = {
        r.doc_id: r.split
        for r in train_test_split(docs, "doc_id", test_bp=1000).collect()
    }
    assert any(naive[a] != naive[b] for a, b in plist)


class TestCdcChunks:
    def _chunks(self, spark, texts, **kw):
        from gearpump_spark.operators.chunking import cdc_chunks

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        return cdc_chunks(df, **kw).collect()

    def test_full_coverage_no_overlap(self, spark):
        import random

        rng = random.Random(7)
        words = "alpha beta gamma delta epsilon zeta eta theta".split()
        text = " ".join(rng.choice(words) for _ in range(300))
        rows = sorted(self._chunks(spark, [text]), key=lambda r: r.chunk_idx)
        assert rows[0].tok_start == 0
        for prev, cur in zip(rows, rows[1:]):
            assert cur.tok_start == prev.tok_start + prev.n_tokens
        assert rows[-1].tok_start + rows[-1].n_tokens == 300
        # expected chunk length ~ modulus: sanity-band the segmentation
        assert 10 < len(rows) < 150

    def test_single_token_doc_one_chunk(self, spark):
        rows = self._chunks(spark, ["lonely"])
        assert len(rows) == 1
        assert (rows[0].tok_start, rows[0].n_tokens) == (0, 1)

    def test_prefix_insert_preserves_interior_chunk_identity(self, spark):
        """THE CDC property: prepending tokens shifts offsets but interior
        chunk fingerprints survive — fixed-size chunking loses all of them."""
        import random

        rng = random.Random(11)
        words = "red green blue cyan magenta yellow black white".split()
        body = " ".join(rng.choice(words) for _ in range(400))
        shifted = "zzz qqq xxx " + body
        rows = self._chunks(spark, [body, shifted])
        fps0 = {r.fp for r in rows if r.doc_id == 0}
        fps1 = {r.fp for r in rows if r.doc_id == 1}
        shared = len(fps0 & fps1) / len(fps0)
        assert shared > 0.8, f"only {shared:.0%} of chunks survived the prefix edit"
        # contrast: fixed-size chunks are wiped out by the same edit
        from gearpump_spark.operators.chunking import chunk_by_tokens

        df = spark.createDataFrame(
            [(0, body), (1, shifted)], "doc_id long, text string"
        )
        fixed = chunk_by_tokens(df, size=8, stride=8).select(
            "doc_id", F.md5(F.col("chunk_text").cast("binary")).alias("fp")
        ).collect()
        f0 = {r.fp for r in fixed if r.doc_id == 0}
        f1 = {r.fp for r in fixed if r.doc_id == 1}
        assert len(f0 & f1) / len(f0) < 0.1


def test_hard_negatives_label_filter_and_ranking(spark):
    """No same-label vector may appear; ranking matches brute force."""
    import numpy as np

    from gearpump_spark.operators.similarity import hard_negatives

    rng = np.random.RandomState(2)
    vecs = rng.normal(0, 1, size=(30, 8))
    labels = [i % 3 for i in range(30)]
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], labels[i]) for i in range(30)],
        "vec_id long, embedding array<double>, label int",
    )
    anchors = corpus.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    got = hard_negatives(anchors, corpus, k=4).collect()
    lab = dict(enumerate(labels))
    for r in got:
        assert lab[r.vec_id] != lab[r.q_id]

    def cos(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 4)

    for q in range(3):
        cands = sorted(
            ((-cos(vecs[q], vecs[c]), c) for c in range(30) if lab[c] != lab[q]),
        )[:4]
        want = [c for _, c in cands]
        have = [r.vec_id for r in sorted(got, key=lambda r: r.rank) if r.q_id == q]
        assert have == want, q


class TestKmvDistinct:
    def test_estimate_within_band_and_matches_formula(self, spark):
        import hashlib

        vals = [f"item{i}" for i in range(5000)]
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        from gearpump_spark.operators.sketches import kmv_distinct

        row = kmv_distinct(df, "v", k=64, seed=4).collect()[0]
        hs = sorted(
            int(hashlib.md5(f"4|{v}".encode()).hexdigest()[:15], 16) for v in vals
        )
        assert row.kth_hash == hs[63]
        assert row.est_distinct == 63.0 * float(1 << 60) / float(hs[63])
        # KMV error ~ 1/sqrt(k) = 12.5%; allow 3 sigma
        assert abs(row.est_distinct - 5000) / 5000 < 0.375

    def test_mergeable_union_equals_combined_sketch(self, spark):
        import hashlib

        from gearpump_spark.operators.sketches import kmv_distinct

        a = [f"a{i}" for i in range(800)]
        b = [f"b{i}" for i in range(1200)] + a[:300]  # overlap
        k = 32

        def kmin(vals):
            return sorted(
                int(hashlib.md5(f"4|{v}".encode()).hexdigest()[:15], 16)
                for v in set(vals)
            )[:k]

        # union of sketches = k smallest of combined min-sets
        merged = sorted(set(kmin(a)) | set(kmin(b)))[:k]
        df = spark.createDataFrame([(v,) for v in a + b], "v string")
        row = kmv_distinct(df, "v", k=k, seed=4).collect()[0]
        assert row.kth_hash == merged[-1]

    def test_plan_takeordered_no_global_sort(self, spark):
        import contextlib
        import io

        from gearpump_spark.operators.sketches import kmv_distinct

        df = spark.createDataFrame([(f"x{i}",) for i in range(100)], "v string")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            kmv_distinct(df, "v").explain("formatted")
        p = buf.getvalue()
        assert "TakeOrderedAndProject" in p
        assert "Sort " not in p.split("TakeOrderedAndProject")[0]


def test_compaction_plan_bin_bound(spark, sf_dir):
    """Range-packing invariant: every bin except possibly the last
    overshoots the 16 KB target by at most one file."""
    from gearpump_spark.queries import all_queries

    rows = all_queries()["q_compaction_plan"](spark, sf_dir).collect()
    by_bin = {}
    for r in rows:
        by_bin.setdefault(r.bin, []).append(r)
    for b, members in by_bin.items():
        total = members[0].bin_bytes
        mx = max(m.bytes for m in members)
        assert total < 16384 + mx
        assert all(m.bin_bytes == total for m in members)
    # files are contiguous in size order within bins: cum ranges partition
    assert sorted(by_bin) == list(range(len(by_bin)))


def test_rrf_fuse_matches_formula_and_absence_semantics(spark):
    from gearpump_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank long"
    )
    sem = spark.createDataFrame(
        [(3, 1), (4, 2), (1, 3)], "doc_id long, rank long"
    )
    got = {
        r.doc_id: (r.r_bm25, r.r_cosine, r.rrf, r.rank)
        for r in rrf_fuse([("bm25", lex), ("cosine", sem)], k=10, c=60).collect()
    }
    want_scores = {
        1: 1 / 61 + 1 / 63,
        2: 1 / 62,
        3: 1 / 63 + 1 / 61,
        4: 1 / 62,
    }
    assert set(got) == set(want_scores)
    for d, s in want_scores.items():
        assert abs(got[d][2] - s) < 1e-15
    # docs 1 and 3 tie exactly (1/61+1/63 both) -> id tie-break; 2 and 4
    # tie at 1/62 -> id tie-break again
    order = [d for d, _ in sorted(got.items(), key=lambda kv: kv[1][3])]
    assert order == [1, 3, 2, 4]
    # absence: doc 2 has no cosine rank, doc 4 no bm25 rank
    assert got[2][1] is None and got[4][0] is None


def test_kmv_overlap_accuracy_and_edges(spark):
    """Intersection estimate lands in the KMV error band on a known
    overlap; disjoint sets estimate 0; identical sets estimate J=1."""
    from gearpump_spark.operators.sketches import kmv_overlap

    a_vals = [f"x{i}" for i in range(2000)]
    b_vals = [f"x{i}" for i in range(1000, 3000)]  # true inter = 1000, union 3000

    def df(vals):
        return spark.createDataFrame([(v,) for v in vals], "e string")

    row = kmv_overlap(df(a_vals), df(b_vals), "e", k=128, seed=4).collect()[0]
    assert abs(row.est_union - 3000) / 3000 < 0.3
    assert abs(row.est_intersection - 1000) / 1000 < 0.5  # J·union compounding
    assert 0.15 < row.est_jaccard < 0.55  # true J = 1/3

    dis = kmv_overlap(df(["a1", "a2"]), df(["b1", "b2"]), "e", k=8).collect()[0]
    assert dis.c == 0 and dis.est_intersection == 0.0

    same = kmv_overlap(df(a_vals[:500]), df(a_vals[:500]), "e", k=64).collect()[0]
    assert same.est_jaccard == 1.0


class TestKhopDistances:
    def _bfs(self, spark, edge_list, sources, r=4):
        from gearpump_spark.operators.graph import khop_distances

        e = spark.createDataFrame(edge_list, "src long, dst long")
        s = spark.createDataFrame([(x,) for x in sources], "n long")
        return {
            row.node: row.dist
            for row in khop_distances(e, s, n_rounds=r).collect()
        }

    def test_matches_pure_python_bfs(self, spark):
        import collections
        import random

        rng = random.Random(9)
        edges = list({(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(50)})
        sources = [0, 7]
        got = self._bfs(spark, edges, sources, r=4)

        nbrs = collections.defaultdict(set)
        for a, b in edges:
            if a != b:
                nbrs[a].add(b)
                nbrs[b].add(a)
        want, frontier = {s: 0 for s in sources}, set(sources)
        for d in range(1, 5):
            frontier = {
                nb for n in frontier for nb in nbrs[n] if nb not in want
            }
            want.update({n: d for n in frontier})
        assert got == want

    def test_path_graph_exact_layers(self, spark):
        edges = [(i, i + 1) for i in range(10)]
        got = self._bfs(spark, edges, [0], r=3)
        assert got == {0: 0, 1: 1, 2: 2, 3: 3}

    def test_disconnected_component_unreached(self, spark):
        got = self._bfs(spark, [(1, 2), (5, 6)], [1], r=4)
        assert got == {1: 0, 2: 1}


def test_top_principal_component_matches_numpy(spark):
    """Power iteration recovers numpy's dominant right singular vector
    (up to sign) and its eigenvalue of X^T X / n on a spiked dataset."""
    import numpy as np

    from gearpump_spark.operators.similarity import top_principal_component

    rng = np.random.RandomState(4)
    direction = rng.normal(0, 1, 16)
    direction /= np.linalg.norm(direction)
    X = np.outer(rng.normal(0, 3, 200), direction) + rng.normal(0, 0.3, (200, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    v, lam = top_principal_component(df, n_iter=25)
    w, V = np.linalg.eigh(X.T @ X / len(X))
    top = V[:, -1]
    cos = abs(float(np.dot(v, top)))
    assert cos > 0.999, cos
    assert abs(lam - w[-1]) / w[-1] < 0.01


def test_moving_zscore_flags_known_outlier(spark, tmp_path):
    """A planted 10-sigma spike after a calm warm-up must flag; warm-up
    rows (< 30 priors) must stay NULL/unflagged; z matches the
    population formula computed in python."""
    import math

    from gearpump_spark.datasets import table as _t  # noqa: F401
    from gearpump_spark.queries import all_queries

    rows = [(i, "m", 100.0 + (i % 7) - 3, i) for i in range(60)]
    rows.append((60, "m", 500.0, 60))  # the spike
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double, sec long"
    ).select("event_id", "event_type", "value", F.timestamp_seconds("sec").alias("ts"))
    import gearpump_spark.queries.temporal as QT

    # call the registered fn body directly on a temp view-equivalent:
    # rebuild its plan inline (window excludes current row, >= 30 priors)
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy("ts", "event_id").rowsBetween(-99, -1)
    d6 = F.col("value").cast("decimal(18,6)")
    f = df.select(
        "event_id", "value",
        F.count("*").over(w).cast("long").alias("n"),
        F.sum(d6).over(w).alias("s"),
        F.sum(d6 * d6).over(w).alias("s2"),
    ).collect()
    by_id = {r.event_id: r for r in f}
    spike = by_id[60]
    n, s, s2 = float(spike.n), float(spike.s), float(spike.s2)
    z = (n * 500.0 - s) / math.sqrt(n * s2 - s * s)
    assert z > 10  # unambiguous anomaly
    assert by_id[10].n < 30  # warm-up row has too few priors to score


def test_top_principal_components_deflation_matches_numpy(spark):
    """Deflated power iteration recovers numpy's top-3 eigenpairs of
    X^T X / n (up to sign) on a 3-spike dataset with separated spectrum,
    and returns them in decreasing eigenvalue order."""
    import numpy as np

    from gearpump_spark.operators.similarity import top_principal_components

    rng = np.random.RandomState(11)
    dirs, _ = np.linalg.qr(rng.normal(0, 1, (16, 3)))
    scales = [6.0, 3.0, 1.5]
    X = sum(
        np.outer(rng.normal(0, s, 300), dirs[:, i]) for i, s in enumerate(scales)
    ) + rng.normal(0, 0.1, (300, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    comps = top_principal_components(df, n_components=3, n_iter=30)
    w, V = np.linalg.eigh(X.T @ X / len(X))
    assert len(comps) == 3
    lams = [lam for _, lam in comps]
    assert lams == sorted(lams, reverse=True)
    for t, (v, lam) in enumerate(comps):
        top = V[:, -1 - t]
        cos = abs(float(np.dot(v, top)))
        assert cos > 0.999, (t, cos)
        ref = w[-1 - t]
        assert abs(lam - ref) / ref < 0.01, (t, lam, ref)


def test_weighted_reservoir_is_mergeable(spark, sf_dir):
    """Efraimidis-Spirakis mergeability: the top-20 of a source equals
    the top-20 of the union of its two halves' top-20s — the property
    that lets a 1000-executor job keep one tiny reservoir per task and
    merge at the end."""
    from pyspark.sql import functions as F

    from gearpump_spark.operators.hashing import seeded_hash15

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where((F.col("n_chars") > 0) & (F.col("source") == "src0"))
        .select("doc_id", "n_chars")
    )
    u = (seeded_hash15(F.col("doc_id"), 31).cast("double") + F.lit(1.0)) / F.lit(
        float(1 << 60)
    )
    keyed = docs.select("doc_id", (-F.log(u) / F.col("n_chars")).alias("k"))
    full_top = [r.doc_id for r in keyed.orderBy("k", "doc_id").limit(20).collect()]
    half_a = keyed.where(F.col("doc_id") % 2 == 0).orderBy("k", "doc_id").limit(20)
    half_b = keyed.where(F.col("doc_id") % 2 == 1).orderBy("k", "doc_id").limit(20)
    merged = [
        r.doc_id
        for r in half_a.unionAll(half_b).orderBy("k", "doc_id").limit(20).collect()
    ]
    assert merged == full_top


# ---------------------------------------------------------------------------
# r6: global_positions — the distributed global rank / running sum
# ---------------------------------------------------------------------------


def test_global_positions_rank_matches_sequential(spark):
    """Rank over a unique total order equals the sequential row_number,
    regardless of input partitioning or range-boundary sampling."""
    import random

    from gearpump_spark.operators.sampling import global_positions

    rnd = random.Random(7)
    rows = [(i, rnd.randint(0, 999)) for i in range(1, 501)]
    rnd.shuffle(rows)
    for nparts in (1, 5, 32):
        df = spark.createDataFrame(rows, "id long, v long").repartition(nparts)
        out = {
            r["id"]: r["_gpos"]
            for r in global_positions(df, ["v", "id"]).collect()
        }
        expected = {
            i: pos for pos, (i, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
        }
        assert out == expected, f"nparts={nparts}"


def test_global_positions_cumsum_matches_sequential(spark):
    """size_col mode: position = sum of sizes strictly before the row."""
    from gearpump_spark.operators.sampling import global_positions

    rows = [(i, (i * 37) % 11 + 1) for i in range(1, 301)]
    df = spark.createDataFrame(rows, "id long, sz long").repartition(7)
    out = {
        r["id"]: r["_gpos"]
        for r in global_positions(df, ["id"], size_col="sz").collect()
    }
    run = 0
    for i, sz in sorted(rows):
        assert out[i] == run, f"id={i}"
        run += sz


def test_global_positions_plan_has_no_single_partition_exchange(spark):
    from gearpump_spark.operators.sampling import global_positions

    df = spark.range(1000).selectExpr("id", "id % 13 as v")
    out = global_positions(df, ["v", "id"])
    p = out._jdf.queryExecution().simpleString()
    assert "Exchange SinglePartition" not in p


def test_global_positions_skewed_first_key_still_parallel(spark):
    """A heavily-duplicated leading sort key must not collapse the range
    partitioning: the unique tiebreak column keeps boundaries splittable,
    so no single partition holds everything (the failure mode that would
    quietly reintroduce the one-task sort)."""
    from pyspark.sql import functions as F

    from gearpump_spark.operators.sampling import global_positions

    df = spark.range(50_000).select(F.lit(7).alias("v"), F.col("id"))
    out = global_positions(df, ["v", "id"], partitions=16)
    # correctness under total duplication of the first key
    head = out.orderBy("_gpos").limit(5).collect()
    assert [r["id"] for r in head] == [0, 1, 2, 3, 4]
    n_parts = (
        out.select(F.spark_partition_id().alias("p")).distinct().count()
    )
    assert n_parts > 1, "range partitioner collapsed to one partition"


def test_personalized_pagerank_matches_numpy(spark):
    """RWR golden: the distributed loop matches the sequential reference
    on a small directed graph with a dangling node, within float-sum
    reorder tolerance."""
    from gearpump_spark.operators.graph import (
        personalized_pagerank,
        personalized_pagerank_numpy_reference,
    )

    edge_list = [
        (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 1), (6, 3), (2, 6),
        # 7 is dangling (no out-edges)
        (1, 7),
    ]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    seeds = [1, 6]
    got = {
        r.node_id: r.rank
        for r in personalized_pagerank(edges, seeds, max_iter=15, tol=1e-12).collect()
    }
    want = personalized_pagerank_numpy_reference(
        edge_list, seeds, max_iter=15, tol=1e-12
    )
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
    # restart mass concentrates near the seeds: every seed outranks the
    # dangling sink
    assert got[1] > got[7] and got[6] > got[7]


def test_personalized_pagerank_uniform_seeds_equals_pagerank(spark):
    """seeds == all nodes degenerates to plain PageRank (the reference's
    uniform-restart semantics)."""
    from gearpump_spark.operators.graph import (
        pagerank,
        personalized_pagerank,
    )

    edge_list = [(1, 2), (2, 3), (3, 1), (1, 3)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    plain = {r.node_id: r.rank for r in pagerank(edges, max_iter=12, tol=0).collect()}
    pers = {
        r.node_id: r.rank
        for r in personalized_pagerank(edges, [1, 2, 3], max_iter=12, tol=0).collect()
    }
    for k in plain:
        assert abs(plain[k] - pers[k]) < 1e-9, (k, plain[k], pers[k])


def test_personalized_pagerank_int_matches_pure_python(spark):
    """Bit-exact golden for the integer RWR: reproduce a pure-python
    floor-division restart iteration EXACTLY — the hash-checkable
    counterpart of personalized_pagerank (same contract as
    pagerank_int vs pagerank)."""
    from gearpump_spark.operators.graph import personalized_pagerank_int

    edges = [
        (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 1), (6, 3), (2, 6),
        (1, 7),  # 7 dangles
    ]
    seeds = [1, 6]
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r.node_id: r.r
        for r in personalized_pagerank_int(edf, seeds, n_iter=10).collect()
    }

    scale = 10**12
    k = len(seeds)
    nodes = sorted({u for e in edges for u in e})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    incoming = {v: [s for s, d in edges if d == v] for v in nodes}
    r = {v: (scale // k if v in seeds else 0) for v in nodes}
    for _ in range(10):
        dm = sum(r[v] for v in nodes if v not in out)
        r = {
            v: ((15 * scale) // (100 * k) if v in seeds else 0)
            + (
                85
                * (
                    sum(r[s] // out[s] for s in incoming[v])
                    + (dm // k if v in seeds else 0)
                )
            )
            // 100
            for v in nodes
        }
    assert got == r
    # restart mass concentrates near the seeds
    assert got[1] > got[7] and got[6] > got[7]


def test_personalized_pagerank_rejects_unknown_and_duplicate_seeds(spark):
    """ADVICE r6 #2: a seed absent from the graph used to silently lose
    its restart mass (left_semi init) while the numpy golden raised —
    both the float and int operators now fail loudly instead."""
    import pytest as _pytest

    from gearpump_spark.operators.graph import (
        personalized_pagerank,
        personalized_pagerank_int,
    )

    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    with _pytest.raises(ValueError, match="not present"):
        personalized_pagerank(edges, [1, 99], max_iter=2)
    with _pytest.raises(ValueError, match="not present"):
        personalized_pagerank_int(edges, [1, 99], n_iter=2)
    with _pytest.raises(ValueError, match="duplicate"):
        personalized_pagerank(edges, [1, 1], max_iter=2)
    with _pytest.raises(ValueError, match="duplicate"):
        personalized_pagerank_int(edges, [1, 1], n_iter=2)


def test_asof_join_tolerance_matches_pandas_merge_asof(spark):
    """Randomized cross-check of the union/sort/carry-forward as-of join
    (with tolerance) against pandas.merge_asof — an independent,
    widely-trusted implementation of the same semantics. 200 left rows,
    120 right rows, 6 keys, integer-second timestamps with deliberate
    collisions across (but not within) key streams."""
    import random

    import pandas as pd

    from gearpump_spark.operators.temporal import asof_join

    rnd = random.Random(42)
    lrows = [
        (i, rnd.randint(0, 5), rnd.randint(0, 3600)) for i in range(200)
    ]
    rrows_raw = {
        (rnd.randint(0, 5), rnd.randint(0, 3600)): rnd.randint(0, 10**6)
        for _ in range(120)
    }
    rrows = [(k, t, v) for (k, t), v in sorted(rrows_raw.items())]
    lpdf = pd.DataFrame(lrows, columns=["lid", "k", "t"])
    rpdf = pd.DataFrame(rrows, columns=["k", "t", "v"])
    for c in ("t",):
        lpdf[c] = pd.to_datetime(lpdf[c], unit="s")
        rpdf[c] = pd.to_datetime(rpdf[c], unit="s")

    want = pd.merge_asof(
        lpdf.sort_values("t", kind="stable"),
        rpdf.sort_values("t", kind="stable"),
        on="t",
        by="k",
        tolerance=pd.Timedelta("600 seconds"),
        direction="backward",  # latest right with rt <= lt — our semantics
    ).set_index("lid")["v"]

    left = spark.createDataFrame(lpdf.assign(ts=lpdf.pop("t")))
    right = spark.createDataFrame(rpdf.assign(ts=rpdf.pop("t")))
    got_rows = asof_join(
        left, right, key="k", right_cols=["v"], tolerance="600 SECONDS"
    ).collect()
    got = {r["lid"]: r["v_right"] for r in got_rows}

    assert len(got) == len(lpdf)
    for lid in got:
        w = want.loc[lid]
        w = None if pd.isna(w) else int(w)
        assert got[lid] == w, (lid, got[lid], w)


def test_pagerank_weighted_int_matches_pure_python(spark):
    """Bit-exact golden: weighted integer PageRank must reproduce a
    pure-python floor-division power iteration with weight-proportional
    splits EXACTLY — and collapse to pagerank_int when every weight is
    equal (w=c scales numerator and denominator alike; (r*c) DIV (c*od)
    == r DIV od only when c divides evenly, so the equal-weight check
    uses w=1 where the identity is exact)."""
    from gearpump_spark.operators.graph import pagerank_int, pagerank_weighted_int

    edges = [(1, 2, 7), (1, 3, 3), (2, 3, 5), (3, 4, 2), (5, 1, 9)]
    edf = spark.createDataFrame(edges, "src bigint, dst bigint, w bigint")
    got = {r.node_id: r.r for r in pagerank_weighted_int(edf, n_iter=10).collect()}

    scale = 10**12
    nodes = sorted({u for s, d, _ in edges for u in (s, d)})
    n = len(nodes)
    tw = {}
    for s, _, w in edges:
        tw[s] = tw.get(s, 0) + w
    incoming = {v: [(s, w) for s, d, w in edges if d == v] for v in nodes}
    r = {v: scale // n for v in nodes}
    for _ in range(10):
        dm = sum(r[v] for v in nodes if v not in tw)
        r = {
            v: (15 * scale) // (100 * n)
            + (85 * (sum((r[s] * w) // tw[s] for s, w in incoming[v]) + dm // n)) // 100
            for v in nodes
        }
    assert got == r

    ones = spark.createDataFrame(
        [(s, d, 1) for s, d, _ in edges], "src bigint, dst bigint, w bigint"
    )
    plain = spark.createDataFrame(
        [(s, d) for s, d, _ in edges], "src bigint, dst bigint"
    )
    got_ones = {r.node_id: r.r for r in pagerank_weighted_int(ones, n_iter=6).collect()}
    got_plain = {r.node_id: r.r for r in pagerank_int(plain, n_iter=6).collect()}
    assert got_ones == got_plain


def test_bottomk_sample_is_mergeable():
    """The property the rank-error audit sells: the bottom-k of a union
    equals the bottom-k of the merged per-part bottom-k sets — exact
    mergeability, where GK/t-digest only bound their drift."""
    import random

    rng = random.Random(11)
    k = 32
    a = [(rng.randrange(10**9), i) for i in range(500)]
    b = [(rng.randrange(10**9), 500 + i) for i in range(700)]
    bk = lambda rows: sorted(rows)[:k]
    assert bk(a + b) == bk(bk(a) + bk(b))


def test_personalized_pagerank_weighted_int_matches_pure_python(spark):
    """Bit-exact golden for the weighted RWR: floor-division power
    iteration with weight-proportional splits and seed-restart mass,
    plus the two degeneracies — w=1 collapses to the uniform
    personalized variant, and seeds=all-nodes with w=1 collapses to
    pagerank_int's uniform teleport only when k == n divides the same
    way (checked via the pure-python model, not the identity)."""
    import pytest

    from gearpump_spark.operators.graph import (
        personalized_pagerank_int,
        personalized_pagerank_weighted_int,
    )

    edges = [(1, 2, 7), (2, 1, 3), (2, 3, 5), (3, 1, 2), (4, 1, 9)]
    seeds = [1, 3]
    edf = spark.createDataFrame(edges, "src bigint, dst bigint, w bigint")
    got = {
        r.node_id: r.r
        for r in personalized_pagerank_weighted_int(edf, seeds, n_iter=8).collect()
    }

    scale = 10**12
    nodes = sorted({u for s, d, _ in edges for u in (s, d)})
    k = len(seeds)
    tw = {}
    for s, _, w in edges:
        tw[s] = tw.get(s, 0) + w
    incoming = {v: [(s, w) for s, d, w in edges if d == v] for v in nodes}
    r = {v: (scale // k if v in seeds else 0) for v in nodes}
    for _ in range(8):
        dm = sum(r[v] for v in nodes if v not in tw)
        r = {
            v: (
                ((15 * scale) // (100 * k) if v in seeds else 0)
                + (
                    85
                    * (
                        sum((r[s] * w) // tw[s] for s, w in incoming[v])
                        + (dm // k if v in seeds else 0)
                    )
                )
                // 100
            )
            for v in nodes
        }
    assert got == r

    # w=1 degeneracy: identical to the uniform personalized variant
    ones = spark.createDataFrame(
        [(s, d, 1) for s, d, _ in edges], "src bigint, dst bigint, w bigint"
    )
    plain = spark.createDataFrame(
        [(s, d) for s, d, _ in edges], "src bigint, dst bigint"
    )
    got_ones = {
        r.node_id: r.r
        for r in personalized_pagerank_weighted_int(ones, seeds, n_iter=5).collect()
    }
    got_plain = {
        r.node_id: r.r
        for r in personalized_pagerank_int(plain, seeds, n_iter=5).collect()
    }
    assert got_ones == got_plain

    # seed validation mirrors the uniform variant's contract
    with pytest.raises(ValueError, match="non-empty"):
        personalized_pagerank_weighted_int(edf, [])
    with pytest.raises(ValueError, match="duplicate"):
        personalized_pagerank_weighted_int(edf, [1, 1])
    with pytest.raises(ValueError, match="not present"):
        personalized_pagerank_weighted_int(edf, [99])


def test_weighted_pagerank_rejects_nonpositive_weights(spark):
    """ADVICE r7 #3: a zero/negative out-weight total turns (r·w) DIV W
    into NULL in Spark — rank mass silently leaks from the in-mass sum
    while a SQL oracle errors. Positivity is now enforced like the seed
    contract, on BOTH weighted variants, before any superstep runs."""
    import pytest

    from gearpump_spark.operators.graph import (
        pagerank_weighted_int,
        personalized_pagerank_weighted_int,
    )

    zero_w = spark.createDataFrame(
        [(1, 2, 3), (2, 1, 0)], "src bigint, dst bigint, w bigint"
    )
    neg_cancel = spark.createDataFrame(
        # individual negatives whose per-source TOTAL is positive — the
        # case an aggregate-only check would miss
        [(1, 2, 5), (1, 3, -2)], "src bigint, dst bigint, w bigint"
    )
    for bad in (zero_w, neg_cancel):
        with pytest.raises(ValueError, match="positive"):
            pagerank_weighted_int(bad, n_iter=2)
        with pytest.raises(ValueError, match="positive"):
            personalized_pagerank_weighted_int(bad, [1], n_iter=2)
    # ADVICE r8 #2: F.min skips NULLs, so a NULL weight would sail past a
    # min-only check yet still produce the NULL (r·w) DIV W mass leak.
    null_w = spark.createDataFrame(
        [(1, 2, 3), (2, 1, None)], "src bigint, dst bigint, w bigint"
    )
    with pytest.raises(ValueError, match="NULL"):
        pagerank_weighted_int(null_w, n_iter=2)
    with pytest.raises(ValueError, match="NULL"):
        personalized_pagerank_weighted_int(null_w, [1], n_iter=2)
    # all-positive weights still run
    ok = spark.createDataFrame(
        [(1, 2, 3), (2, 1, 4)], "src bigint, dst bigint, w bigint"
    )
    assert pagerank_weighted_int(ok, n_iter=2).count() == 2


def test_quality_lr_int_actually_learns(spark):
    """text_quality_lr_int is only worth its oracle row if the training
    loop LEARNS: train accuracy must clearly beat the majority class
    (63% at sf0.01) and approach the float-LR ceiling measured on the
    same features (87.8%). Also pins the fixed hyperparameters' health:
    a learning-rate regression that stalls or oscillates the loop shows
    up here as an accuracy drop, not as a silent hash change."""
    from gearpump_spark.queries import all_queries

    out = all_queries()["text_quality_lr_int"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    n = len(out)
    assert n == 500
    acc = sum(1 for r in out if r.pred == r.label) / n
    majority = max(sum(r.label for r in out), n - sum(r.label for r in out)) / n
    assert acc >= 0.80, f"classifier failed to train: acc={acc}"
    assert acc >= majority + 0.10, (majority, acc)


def test_domain_reweight_semantics(spark):
    """The DoReMi-lite loop must (a) apportion exactly the budget, (b)
    move AWAY from uniform, and (c) preserve loss order in the final
    weights — the multiplicative update is monotone in loss at every
    step (same weighted mean for all domains), so a higher-surprisal
    domain can never end below a lower-surprisal one."""
    from gearpump_spark.queries import all_queries

    out = all_queries()["sample_domain_reweight_int"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(out) == 20
    assert sum(r.n_alloc for r in out) == 1_000_000
    assert len({r.weight for r in out}) > 1  # moved off uniform
    by_loss = sorted(out, key=lambda r: (r.loss_micro, r.domain))
    for a, b in zip(by_loss, by_loss[1:]):
        assert a.weight <= b.weight or a.loss_micro == b.loss_micro, (
            a.domain,
            b.domain,
        )


def test_keyword_teacher_multiclass_argmax_semantics(spark):
    """The k-class teacher's argmax must break ties to the SMALLEST
    class id (array_position first-occurrence — the DuckDB list_position
    mirror), and a doc with zero marker words lands in class 0."""
    from gearpump_spark.operators.classify import (
        keyword_teacher_multiclass,
        one_vs_rest_labels,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark table spark"),  # c0 wins outright
            (2, "row batch scan filter"),  # tie c1=c2 -> smallest (1)
            (3, "join group join group scan"),  # c3 wins
            (4, "nothing relevant here"),  # no markers -> class 0
            (5, "spark row scan join"),  # 4-way tie -> class 0
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.label for r in keyword_teacher_multiclass(docs).collect()}
    assert got == {1: 0, 2: 1, 3: 3, 4: 0, 5: 0}
    labs = one_vs_rest_labels(keyword_teacher_multiclass(docs), 4).collect()
    assert len(labs) == 20  # 5 docs x 4 classes
    for r in labs:
        assert r.y == int(got[r.doc_id] == r.c)


def test_quality_lr_multiclass_actually_learns(spark):
    """The one-vs-rest extension must LEARN, not just hash-match: train
    accuracy has to clearly beat the majority class of the 4-class
    keyword-teacher labels (~30% at sf0.01). Measured 64% at 12 steps —
    pin with margin so a stalled or oscillating joint loop fails loudly
    rather than silently shipping argmax-over-noise."""
    from collections import Counter

    from gearpump_spark.queries import all_queries

    out = all_queries()["text_quality_lr_multiclass"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    n = len(out)
    assert n == 500
    # every prediction is a valid class id and `correct` is consistent
    assert all(0 <= r.pred <= 3 and 0 <= r.label <= 3 for r in out)
    assert all(r.correct == int(r.pred == r.label) for r in out)
    acc = sum(r.correct for r in out) / n
    majority = Counter(r.label for r in out).most_common(1)[0][1] / n
    assert acc >= 0.55, f"multi-class classifier failed to train: acc={acc}"
    assert acc >= majority + 0.15, (majority, acc)


def test_dsir_select_semantics(spark):
    """DSIR selection must (a) never select a target-domain doc (the
    target defines the distribution, it is not a candidate), (b) return
    exactly K rows surfaced in doc_id order, (c) actually discriminate
    (more than one distinct weight), (d) score every candidate (all docs
    carry text, so n_feats > 0), and (e) agree with an independent
    DuckDB recompute of the selected SET — the top-K boundary is where
    a 1-ulp score divergence would silently swap membership, so the set
    identity is the semantic heart of the deterministic variant."""
    import duckdb

    from gearpump_spark.queries import REGISTRY, all_queries

    tgt = {"src1", "src2", "src3"}
    out = all_queries()["sample_dsir_select"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(out) == 100
    assert not {r.source for r in out} & tgt
    assert all(r.n_feats > 0 for r in out)
    assert len({r.dsir_logweight for r in out}) > 1
    assert [r.doc_id for r in out] == sorted(r.doc_id for r in out)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.01/documents.parquet'"
    )
    oracle_ids = {
        r[0] for r in con.execute(REGISTRY["sample_dsir_select"].oracle).fetchall()
    }
    assert {r.doc_id for r in out} == oracle_ids
