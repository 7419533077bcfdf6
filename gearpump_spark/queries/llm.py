"""LLM-training-data pipeline queries (SURVEY.md §7 M5 — beyond the
reference surface, first-class per the north star): deduplication,
embedding similarity search, text analysis, multimodal metadata.

Oracle strategy: every hash-based operator uses md5 over seed-prefixed
input — a hash family both Spark and DuckDB evaluate identically — so even
MinHash/LSH is exactly DuckDB-checkable. Only SimHash (bit twiddling) and
PageRank (iterative) fall back to rows-only checks + pytest goldens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gearpump_spark.datasets import table
from gearpump_spark.operators import dedup as D
from gearpump_spark.operators import sampling as SP
from gearpump_spark.operators import similarity as S
from gearpump_spark.operators.hashing import SQL_H15 as _SQL_H15
from gearpump_spark.functions import text as TX
from gearpump_spark.queries import register

# Shared DuckDB CTE: normalized word 3-gram shingles per document.
# Mirrors operators/dedup.py word_shingles()+normalize_text() exactly.
_SQL_SHINGLES = """
    shingled AS (
        SELECT doc_id,
               UNNEST(CASE WHEN LEN(ws) < 3 THEN [ARRAY_TO_STRING(ws, ' ')]
                      ELSE LIST_TRANSFORM(RANGE(1, LEN(ws) - 1),
                           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END) AS shingle
        FROM (SELECT doc_id,
                     STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')), ' ') AS ws
              FROM documents)
    )
"""

# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    SELECT MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS fp,
           MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
    FROM documents GROUP BY 1 ORDER BY keep_id
    """,
    desc="exact dedup: normalized-content fingerprint + hash groupBy",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: shuffles (fp, id) only — never the document bodies."""
    return D.exact_dedup(table(spark, sf_dir, "documents")).orderBy("keep_id")


@register(
    "dedup_minhash_signature",
    oracle=f"""
    WITH {_SQL_SHINGLES}
    SELECT doc_id,
           MIN(MD5('0|' || shingle)) AS h0, MIN(MD5('1|' || shingle)) AS h1,
           MIN(MD5('2|' || shingle)) AS h2, MIN(MD5('3|' || shingle)) AS h3,
           MIN(MD5('4|' || shingle)) AS h4, MIN(MD5('5|' || shingle)) AS h5
    FROM shingled GROUP BY doc_id ORDER BY doc_id
    """,
    desc="MinHash signatures (k=6) over word 3-gram shingles, md5 hash family",
)
def dedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_signatures(table(spark, sf_dir, "documents"), k=6).orderBy("doc_id")


@register(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    sig AS (
        SELECT doc_id,
               MIN(MD5('0|' || shingle)) AS h0, MIN(MD5('1|' || shingle)) AS h1,
               MIN(MD5('2|' || shingle)) AS h2, MIN(MD5('3|' || shingle)) AS h3,
               MIN(MD5('4|' || shingle)) AS h4, MIN(MD5('5|' || shingle)) AS h5
        FROM shingled GROUP BY doc_id),
    bands AS (
        SELECT doc_id, b.band_idx,
               CASE b.band_idx
                    WHEN 0 THEN MD5(h0 || '|' || h1)
                    WHEN 1 THEN MD5(h2 || '|' || h3)
                    ELSE MD5(h4 || '|' || h5) END AS band_key
        FROM sig CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS band_idx) b)
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
    FROM bands x JOIN bands y
      ON x.band_idx = y.band_idx AND x.band_key = y.band_key
         AND x.doc_id < y.doc_id
    ORDER BY a, b
    """,
    desc="MinHash-LSH near-dup candidate pairs (3 bands × 2 rows)",
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the only joins are keyed on (band_idx, band_key) buckets —
    cost tracks bucket occupancy, never all-pairs."""
    sig = D.minhash_signatures(table(spark, sf_dir, "documents"), k=6)
    return D.lsh_candidate_pairs(sig, k=6, rows_per_band=2).orderBy("a", "b")


# Shared by dedup_clusters and dedup_clusters_twophase: both compute the
# SAME clustering (component id = min doc_id), differing only in the
# distributed fixpoint algorithm, so one oracle checks both.
# dedup_canonical_pick extends the CTE chain (split below) with the
# keep-the-best-copy selection.
_SQL_CLUSTERS_CTES = f"""
    WITH RECURSIVE {_SQL_SHINGLES},
    sig AS (
        SELECT doc_id,
               MIN(MD5('0|' || shingle)) AS h0, MIN(MD5('1|' || shingle)) AS h1,
               MIN(MD5('2|' || shingle)) AS h2, MIN(MD5('3|' || shingle)) AS h3,
               MIN(MD5('4|' || shingle)) AS h4, MIN(MD5('5|' || shingle)) AS h5
        FROM shingled GROUP BY doc_id),
    bands AS (
        SELECT doc_id, b.band_idx,
               CASE b.band_idx
                    WHEN 0 THEN MD5(h0 || '|' || h1)
                    WHEN 1 THEN MD5(h2 || '|' || h3)
                    ELSE MD5(h4 || '|' || h5) END AS band_key
        FROM sig CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS band_idx) b),
    pairs AS (
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM bands x JOIN bands y
          ON x.band_idx = y.band_idx AND x.band_key = y.band_key
             AND x.doc_id < y.doc_id),
    edges AS (SELECT a AS u, b AS v FROM pairs
              UNION SELECT b AS u, a AS v FROM pairs),
    cc(node_id, comp) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.v, cc.comp FROM cc JOIN edges e ON e.u = cc.node_id
        WHERE cc.comp < e.v),
    clusters AS (
        SELECT node_id AS doc_id, MIN(comp) AS cluster_id
        FROM cc GROUP BY node_id)
"""
_SQL_CLUSTERS = (
    _SQL_CLUSTERS_CTES + "SELECT doc_id, cluster_id FROM clusters ORDER BY doc_id"
)


@register(
    "dedup_clusters",
    oracle=_SQL_CLUSTERS,
    desc="near-dup clusters: MinHash-LSH pairs → connected components",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup pipeline ending: candidate pairs grouped into
    duplicate clusters (component id = min doc_id — the canonical
    representative to keep). Components via min-label propagation
    (operators/graph.py); the DuckDB oracle computes the same fixpoint
    with a recursive CTE."""
    from gearpump_spark.operators.graph import connected_components

    docs = table(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs, k=6)
    pairs = D.lsh_candidate_pairs(sig, k=6, rows_per_band=2)
    comps = connected_components(
        pairs, nodes=docs.select("doc_id"), src="a", dst="b"
    )
    return comps.select(
        F.col("node_id").alias("doc_id"), F.col("comp").alias("cluster_id")
    ).orderBy("doc_id")


@register(
    "dedup_clusters_twophase",
    oracle=_SQL_CLUSTERS,
    desc="same clustering via alternating large-star/small-star "
    "(Kiveris 2014) — O(log^2 n) rounds for adversarially deep components",
)
def dedup_clusters_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical output to dedup_clusters; the fixpoint runs as the
    two-phase star algorithm (operators/graph.py
    connected_components_twophase), the variant to choose at 100 TB when
    component shapes are unknown."""
    from gearpump_spark.operators.graph import connected_components_twophase

    docs = table(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs, k=6)
    pairs = D.lsh_candidate_pairs(sig, k=6, rows_per_band=2)
    comps = connected_components_twophase(
        pairs, nodes=docs.select("doc_id"), src="a", dst="b"
    )
    return comps.select(
        F.col("node_id").alias("doc_id"), F.col("comp").alias("cluster_id")
    ).orderBy("doc_id")


@register(
    "dedup_canonical_pick",
    oracle=_SQL_CLUSTERS_CTES
    + """,
    members AS (
        SELECT c.cluster_id, d.doc_id, d.n_chars
        FROM clusters c JOIN documents d USING (doc_id)),
    ranked AS (
        SELECT cluster_id, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY cluster_id
                                  ORDER BY n_chars DESC, doc_id ASC) AS rn,
               COUNT(*) OVER (PARTITION BY cluster_id) AS n_members,
               SUM(n_chars) OVER (PARTITION BY cluster_id) AS total_chars
        FROM members)
    SELECT cluster_id, doc_id AS canonical_id,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(total_chars - n_chars AS BIGINT) AS chars_dropped
    FROM ranked WHERE rn = 1 AND n_members >= 2 ORDER BY cluster_id
    """,
    desc="canonical-copy selection after near-dup clustering: per cluster "
    "keep the LONGEST member (ties -> smallest doc_id) and account the "
    "chars the dedup pass drops — the keep-the-best-copy step every "
    "production dedup pipeline ends with (singleton clusters excluded)",
)
def dedup_canonical_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composes the cluster fixpoint with the selection policy. Scale:
    the argmax is ONE map-side-combinable groupBy on cluster_id via
    max(struct(n_chars, -doc_id)) — no window function, no per-cluster
    sort; document bodies never move, only (cluster_id, doc_id, n_chars)
    triples reach the exchange."""
    from gearpump_spark.operators.graph import connected_components

    docs = table(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs, k=6)
    pairs = D.lsh_candidate_pairs(sig, k=6, rows_per_band=2)
    comps = connected_components(pairs, nodes=docs.select("doc_id"), src="a", dst="b")
    members = comps.select(
        F.col("node_id").alias("doc_id"), F.col("comp").alias("cluster_id")
    ).join(docs.select("doc_id", "n_chars"), "doc_id")
    best = F.max(F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id")))
    return (
        members.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_members"),
            F.sum("n_chars").alias("total_chars"),
            best.alias("best"),
        )
        .filter(F.col("n_members") >= 2)
        .select(
            "cluster_id",
            (-F.col("best.neg_id")).alias("canonical_id"),
            F.col("n_members").cast("bigint").alias("n_members"),
            (F.col("total_chars") - F.col("best.n_chars"))
            .cast("bigint")
            .alias("chars_dropped"),
        )
        .orderBy("cluster_id")
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    sh AS (SELECT DISTINCT doc_id, shingle FROM shingled),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT q.doc_id AS q_id, c.doc_id AS c_id, COUNT(*) AS inter
        FROM sh q JOIN sh c ON q.shingle = c.shingle AND q.doc_id <> c.doc_id
        WHERE q.doc_id < 10
        GROUP BY 1, 2)
    SELECT q_id, c_id,
           CAST(inter AS DOUBLE) / CAST(qs.n + cs.n - inter AS DOUBLE) AS jaccard
    FROM inter JOIN sizes qs ON qs.doc_id = q_id
               JOIN sizes cs ON cs.doc_id = c_id
    WHERE CAST(inter AS DOUBLE) / CAST(qs.n + cs.n - inter AS DOUBLE) >= 0.05
    ORDER BY q_id, c_id
    """,
    desc="exact n-gram Jaccard of query docs vs corpus via inverted shingle index",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    q = docs.filter(F.col("doc_id") < 10)
    out = D.ngram_jaccard_pairs(q, docs, threshold=0.05)
    return out.select(
        F.col("q_id"), F.col("c_id"), F.col("jaccard")
    ).orderBy("q_id", "c_id")


@register(
    "dedup_containment",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    sh AS (SELECT DISTINCT doc_id, shingle FROM shingled),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT q.doc_id AS q_id, c.doc_id AS c_id, COUNT(*) AS inter
        FROM sh q JOIN sh c ON q.shingle = c.shingle AND q.doc_id <> c.doc_id
        WHERE q.doc_id < 10
        GROUP BY 1, 2)
    SELECT q_id, c_id,
           ROUND(CAST(inter AS DOUBLE) / CAST(qs.n AS DOUBLE), 4) AS containment
    FROM inter JOIN sizes qs ON qs.doc_id = q_id
    WHERE ROUND(CAST(inter AS DOUBLE) / CAST(qs.n AS DOUBLE), 4) >= 0.05
    ORDER BY q_id, c_id
    """,
    desc="asymmetric n-gram containment c(q->d) = |A∩B|/|A| of query docs "
    "in corpus docs (Broder 1997's second measure): the quote/excerpt/"
    "boilerplate-subsumption detector — a paragraph copied into a long "
    "page scores ~0 Jaccard but containment ~1; inverted shingle index, "
    "never all-pairs",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/dedup.py ngram_containment_pairs — same inverted-index
    shape as ngram_jaccard_pairs; only |A| joins back (broadcast)."""
    docs = table(spark, sf_dir, "documents")
    q = docs.filter(F.col("doc_id") < 10)
    return (
        D.ngram_containment_pairs(q, docs, threshold=0.05)
        .select("q_id", "c_id", "containment")
        .orderBy("q_id", "c_id")
    )


@register(
    "dedup_url_canonical",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'HTTP' END)
               || '://'
               || (CASE doc_id % 3 WHEN 0 THEN 'Example.COM'
                                   WHEN 1 THEN 'example.com'
                                   ELSE 'WWW.example.com' END)
               || (CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END)
               || '/a/' || CAST(doc_id // 8 AS VARCHAR)
               || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END)
               || (CASE doc_id % 5 WHEN 0 THEN ''
                                   WHEN 1 THEN '?utm_source=x'
                                   WHEN 2 THEN '?id=7&utm_campaign=y'
                                   WHEN 3 THEN '?id=7'
                                   ELSE '?utm_medium=z&id=7' END)
               || (CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END) AS url
        FROM documents),
    defrag AS (SELECT doc_id, REGEXP_REPLACE(url, '#.*$', '') AS u FROM raw),
    split AS (
        SELECT doc_id,
               REGEXP_REPLACE(
                   REGEXP_REPLACE(LOWER(REGEXP_EXTRACT(u, '^[^/]+//[^/?]+')),
                                  ':80$', ''),
                   '//www\\.', '//') AS head,
               SUBSTR(u, LEN(REGEXP_EXTRACT(u, '^[^/]+//[^/?]+')) + 1) AS rest
        FROM defrag),
    pq AS (
        SELECT doc_id, head,
               REGEXP_REPLACE(CASE WHEN INSTR(rest, '?') > 0
                    THEN SUBSTR(rest, 1, INSTR(rest, '?') - 1)
                    ELSE rest END, '/+$', '') AS path,
               CASE WHEN INSTR(rest, '?') > 0
                    THEN ARRAY_TO_STRING(
                        LIST_FILTER(STR_SPLIT(SUBSTR(rest, INSTR(rest, '?') + 1), '&'),
                                    p -> NOT STARTS_WITH(p, 'utm_')), '&')
                    ELSE '' END AS q
        FROM split),
    canon AS (
        SELECT doc_id,
               head || path || CASE WHEN q <> '' THEN '?' || q ELSE '' END
                 AS canonical_url
        FROM pq)
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_variants,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
    FROM canon GROUP BY canonical_url ORDER BY canonical_url
    """,
    desc="URL canonicalization + exact dedup — the first pass of every "
    "web-crawl curation pipeline: lowercase scheme/host, strip default "
    "port :80, strip www., drop utm_* tracking params (preserving the "
    "rest of the query string), strip trailing slashes and fragments; "
    "messy variants are synthesized closed-form from doc_id so the "
    "oracle rebuilds them bit-identically; returns per-canonical-URL "
    "variant counts + the kept (min) doc id",
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure JVM string expressions end to end — zero UDFs; the only
    shuffle is the final canonical-URL groupBy. At 100 TB this is a
    map-side-combinable aggregate over the canonical key."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 2 == 0, F.lit("http")).otherwise(F.lit("HTTP")),
        F.lit("://"),
        F.when(d % 3 == 0, F.lit("Example.COM"))
        .when(d % 3 == 1, F.lit("example.com"))
        .otherwise(F.lit("WWW.example.com")),
        F.when(d % 4 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.concat(F.lit("/a/"), (d / 8).cast("long").cast("string")),
        F.when(d % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit(""))
        .when(d % 5 == 1, F.lit("?utm_source=x"))
        .when(d % 5 == 2, F.lit("?id=7&utm_campaign=y"))
        .when(d % 5 == 3, F.lit("?id=7"))
        .otherwise(F.lit("?utm_medium=z&id=7")),
        F.when(d % 6 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    u = F.regexp_replace(url, r"#.*$", "")
    rawhead = F.regexp_extract(u, r"^[^/]+//[^/?]+", 0)
    head = F.regexp_replace(
        F.regexp_replace(F.lower(rawhead), r":80$", ""), r"//www\.", "//"
    )
    rest = F.expr(
        "substring(_u, length(regexp_extract(_u, '^[^/]+//[^/?]+', 0)) + 1)"
    )
    qpos = F.instr(F.col("_rest"), "?")
    path = F.regexp_replace(
        F.when(qpos > 0, F.expr("substring(_rest, 1, instr(_rest, '?') - 1)"))
        .otherwise(F.col("_rest")),
        r"/+$",
        "",
    )
    qs = F.when(
        qpos > 0,
        F.array_join(
            F.filter(
                F.split(F.expr("substring(_rest, instr(_rest, '?') + 1)"), "&"),
                lambda p: ~p.startswith("utm_"),
            ),
            "&",
        ),
    ).otherwise(F.lit(""))
    canon = (
        docs.withColumn("_u", u)
        .withColumn("_head", head)
        .withColumn("_rest", rest)
        .withColumn("_path", path)
        .withColumn("_q", qs)
        .select(
            "doc_id",
            F.concat(
                F.col("_head"),
                F.col("_path"),
                F.when(F.col("_q") != "", F.concat(F.lit("?"), F.col("_q"))).otherwise(
                    F.lit("")
                ),
            ).alias("canonical_url"),
        )
    )
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.count("*").cast("bigint").alias("n_variants"),
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
        )
        .orderBy("canonical_url")
    )


_SQL_TEST_BUCKET = _SQL_H15.format(seed="'0'", key="doc_id") + " % 10000 < 1000"


@register(
    "dedup_contamination",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    sp AS (SELECT doc_id,
                  CASE WHEN {_SQL_TEST_BUCKET} THEN 'test' ELSE 'train' END AS split
           FROM documents),
    sh AS (SELECT DISTINCT s.doc_id, s.shingle, sp.split
           FROM shingled s JOIN sp USING (doc_id)),
    train_sh AS (SELECT DISTINCT shingle FROM sh WHERE split = 'train'),
    test_sh AS (SELECT doc_id, shingle FROM sh WHERE split = 'test'),
    tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM test_sh GROUP BY doc_id),
    shr AS (SELECT t.doc_id, COUNT(*) AS n_shared
            FROM test_sh t JOIN train_sh USING (shingle) GROUP BY t.doc_id)
    SELECT t.doc_id, t.n_shingles, COALESCE(s.n_shared, 0) AS n_shared,
           ROUND(CAST(COALESCE(s.n_shared, 0) AS DOUBLE)
                 / CAST(t.n_shingles AS DOUBLE), 4) AS contam_frac
    FROM tot t LEFT JOIN shr s USING (doc_id) ORDER BY t.doc_id
    """,
    desc="benchmark-contamination check: per test doc, fraction of its "
    "distinct 3-gram shingles present in ANY train doc (key-stable 10% "
    "test split; inverted shingle index, never all-pairs)",
)
def dedup_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = SP.train_test_split(table(spark, sf_dir, "documents"), "doc_id", test_bp=1000)
    return D.cross_split_contamination(docs).orderBy("doc_id")


# SimHash is bit-for-bit deterministic (integer votes over md5 token
# hashes), so it is fully oracle-expressible: DuckDB rebuilds the 32 vote
# columns with >>/& integer ops and the same '0x'-cast of md5's first 8 hex
# chars (converted from rows-only in r4 — the 'bit-level' label had
# conflated bit manipulation with non-determinism).
_SIMHASH_VOTES = ",\n        ".join(
    f"SUM(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
    for b in range(32)
)
_SIMHASH_FP = " + ".join(
    f"(CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
    for b in range(32)
)


@register(
    "dedup_simhash",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, UNNEST(LIST_FILTER(
            STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')), ' '),
            w -> w <> '')) AS w
        FROM documents),
    h AS (SELECT doc_id,
                 CAST(('0x' || SUBSTR(MD5(w), 1, 8)) AS BIGINT) AS hv
          FROM tok),
    votes AS (SELECT doc_id, {_SIMHASH_VOTES} FROM h GROUP BY doc_id),
    fp AS (SELECT doc_id, {_SIMHASH_FP} AS simhash FROM votes)
    SELECT d.doc_id, CAST(COALESCE(f.simhash, 0) AS BIGINT) AS simhash
    FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN fp f USING (doc_id)
    ORDER BY doc_id
    """,
    desc="32-bit SimHash fingerprints per document (Charikar 2002): "
    "integer ±1 bit votes over md5 token hashes — exact oracle, every "
    "fingerprint bit recomputed independently by DuckDB",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash32(table(spark, sf_dir, "documents")).orderBy("doc_id")


@register(
    "dedup_duplicate_spans",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id,
               STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' ') AS tk
        FROM documents),
    win AS (
        SELECT doc_id, CAST(i AS INT) - 1 AS pos,
               MD5(ARRAY_TO_STRING(tk[i:i+7], ' ')) AS fp
        FROM tok, UNNEST(RANGE(1, GREATEST(LEN(tk) - 7, 0) + 1)) AS t(i)),
    freq AS (SELECT fp, COUNT(*) AS c FROM win GROUP BY fp),
    flagged AS (
        SELECT w.doc_id, w.pos, (f.c >= 2) AS dup
        FROM win w JOIN freq f USING (fp)),
    per_doc AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
               CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        FROM flagged GROUP BY doc_id),
    runs AS (
        SELECT doc_id, CAST(MAX(run_len) AS BIGINT) AS max_dup_run FROM (
            SELECT doc_id, grp, COUNT(*) AS run_len FROM (
                SELECT doc_id, pos,
                       pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
                FROM flagged WHERE dup)
            GROUP BY doc_id, grp)
        GROUP BY doc_id)
    SELECT p.doc_id, p.n_windows, p.n_dup,
           CAST(COALESCE(r.max_dup_run, 0) AS BIGINT) AS max_dup_run
    FROM per_doc p LEFT JOIN runs r USING (doc_id)
    ORDER BY doc_id
    """,
    desc="substring-level duplication screen (Lee et al. 2022): 8-token "
    "sliding-window fingerprints, corpus-frequency flagging, longest "
    "consecutive duplicated run per doc (gaps-and-islands) — the "
    "shuffle-friendly stand-in for suffix-array substring dedup; all "
    "integers, exact oracle",
)
def dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/dedup.py duplicate_spans: only (fp, id, pos) rows reach
    any exchange — window text is md5'd away scan-side."""
    return D.duplicate_spans(table(spark, sf_dir, "documents"), n=8).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@register(
    "similarity_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
    scored AS (
        SELECT q.q_id, c.vec_id,
               ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(c.embedding) + 1),
                              i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.q_vec[i] AS DOUBLE)))
                     / (SQRT(LIST_SUM(LIST_TRANSFORM(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                        * SQRT(LIST_SUM(LIST_TRANSFORM(q.q_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                     4) AS cosine_sim
        FROM embeddings c CROSS JOIN q)
    SELECT q_id, vec_id, cosine_sim, rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                     ORDER BY cosine_sim DESC, vec_id) AS rank
        FROM scored)
    WHERE rank <= 5 ORDER BY q_id, rank
    """,
    desc="brute-force cosine top-k ANN baseline (query side broadcast)",
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = S.cosine_topk(q, emb, k=5)
    return out.select(
        "q_id", "vec_id", "cosine_sim", F.col("rank").cast("bigint").alias("rank")
    ).orderBy("q_id", "rank")


def _lsh_plane_component_sql(p: int) -> str:
    """Hyperplane p component j (= list index i - 1), the exact double
    operators/similarity.py _hyperplane computes: u32(md5('p|j')[:8])/2^31 - 1."""
    return (
        f"(CAST(('0x' || SUBSTR(MD5(CONCAT('{p}', '|', CAST(i - 1 AS VARCHAR))), 1, 8))"
        " AS BIGINT) / 2147483648.0 - 1.0)"
    )


# bucket bits for dim=64, n_planes=4 — the registered LSH query's shape
_LSH_BUCKET_SQL = " + ".join(
    "(CASE WHEN LIST_SUM(LIST_TRANSFORM(RANGE(1, 65), "
    f"i -> CAST(embedding[i] AS DOUBLE) * {_lsh_plane_component_sql(p)})) > 0 "
    f"THEN {1 << p} ELSE 0 END)"
    for p in range(4)
)


@register(
    "similarity_topk_lsh",
    # Approximate vs TRUE top-k, but bit-for-bit DETERMINISTIC: the
    # hyperplanes are seeded md5 (component = u32/2^31 - 1, exact in
    # double) and the projection is the same left-fold dot product the
    # exact-top-k oracle already hash-matches — so the bucket bits, and
    # hence the full result, are oracle-expressible (converted from
    # rows-only in r4).
    oracle=f"""
    WITH pl AS (
        SELECT vec_id, embedding,
               {_LSH_BUCKET_SQL} AS bucket
        FROM embeddings),
    q AS (SELECT vec_id AS q_id, embedding AS q_vec, bucket
          FROM pl WHERE vec_id < 5),
    scored AS (
        SELECT q.q_id, c.vec_id,
               ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(c.embedding) + 1),
                              i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.q_vec[i] AS DOUBLE)))
                     / (SQRT(LIST_SUM(LIST_TRANSFORM(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                        * SQRT(LIST_SUM(LIST_TRANSFORM(q.q_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                     4) AS cosine_sim
        FROM pl c JOIN q ON c.bucket = q.bucket)
    SELECT q_id, vec_id, cosine_sim, CAST(rank AS BIGINT) AS rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                    ORDER BY cosine_sim DESC, vec_id) AS rank
        FROM scored) WHERE rank <= 5
    ORDER BY q_id, rank
    """,
    desc="LSH-bucketed approximate cosine top-k (seeded-md5 random "
    "hyperplanes, scale path) — deterministic by construction, exact "
    "oracle recomputes the bucket bits and bucket-local ranking",
)
def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = S.cosine_topk_lsh(q, emb, dim=64, k=5, n_planes=4)
    return out.select(
        "q_id", "vec_id", "cosine_sim", F.col("rank").cast("bigint").alias("rank")
    ).orderBy("q_id", "rank")


@register(
    "similarity_topk_ivf",
    oracle=None,  # approximate by construction; recall asserted in pytest
    desc="IVF-bucketed approximate cosine top-k (coarse centroids + nprobe lists)",
)
def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FAISS-style IVF: train 8 coarse centroids (deterministic seeds + one
    Lloyd pass), shard the corpus into inverted lists, probe the 3 nearest
    lists per query. See operators/similarity.py for the scale story."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = S.cosine_topk_ivf(q, emb, nlist=8, nprobe=3, k=5)
    return out.select(
        "q_id", "vec_id", "cosine_sim", F.col("rank").cast("bigint").alias("rank")
    ).orderBy("q_id", "rank")


# squared L2 between a corpus embedding e and centroid embedding c, as the
# same left-fold of (e_i - c_i)^2 doubles that _sq_dist computes
_IVF_SQDIST_SQL = (
    "LIST_SUM(LIST_TRANSFORM(RANGE(1, 65), i -> "
    "(CAST({e}[i] AS DOUBLE) - CAST({c}[i] AS DOUBLE)) * "
    "(CAST({e}[i] AS DOUBLE) - CAST({c}[i] AS DOUBLE))))"
)


@register(
    "similarity_topk_ivf_seeded",
    # refine=False makes the IVF pipeline end-to-end closed-form: the
    # centroids ARE the 8 lowest-id embeddings (no Lloyd float mean), so
    # the oracle rebuilds the inverted lists, the nprobe=3 probe sets, and
    # the bucket-local ranking exactly. Keeps `similarity_topk_ivf`
    # (refined) registered alongside as the recall-tuned variant.
    oracle=f"""
    WITH cent AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cvec
        FROM embeddings ORDER BY vec_id LIMIT 8),
    corpus_assign AS (
        SELECT vec_id, embedding, cid FROM (
            SELECT e.vec_id, e.embedding, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                       {_IVF_SQDIST_SQL.format(e='e.embedding', c='c.cvec')},
                       c.cid) AS rn
            FROM embeddings e CROSS JOIN cent c)
        WHERE rn = 1),
    probes AS (
        SELECT q_id, q_vec, cid FROM (
            SELECT e.vec_id AS q_id, e.embedding AS q_vec, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                       {_IVF_SQDIST_SQL.format(e='e.embedding', c='c.cvec')},
                       c.cid) AS rn
            FROM embeddings e CROSS JOIN cent c
            WHERE e.vec_id < 5)
        WHERE rn <= 3),
    scored AS (
        SELECT p.q_id, a.vec_id,
               ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(a.embedding) + 1),
                              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(p.q_vec[i] AS DOUBLE)))
                     / (SQRT(LIST_SUM(LIST_TRANSFORM(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                        * SQRT(LIST_SUM(LIST_TRANSFORM(p.q_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                     4) AS cosine_sim
        FROM corpus_assign a JOIN probes p USING (cid))
    SELECT q_id, vec_id, cosine_sim, CAST(rank AS BIGINT) AS rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                    ORDER BY cosine_sim DESC, vec_id) AS rank
        FROM scored) WHERE rank <= 5
    ORDER BY q_id, rank
    """,
    desc="IVF approximate cosine top-k with closed-form seed centroids "
    "(no Lloyd refinement): the whole pipeline — inverted lists, nprobe "
    "probe sets, bucket-local ranking — is recomputed exactly by the "
    "DuckDB oracle; the refined variant stays registered as "
    "similarity_topk_ivf (rows-only: float means are summation-order-"
    "dependent)",
)
def similarity_topk_ivf_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = S.cosine_topk_ivf(q, emb, nlist=8, nprobe=3, k=5, refine=False)
    return out.select(
        "q_id", "vec_id", "cosine_sim", F.col("rank").cast("bigint").alias("rank")
    ).orderBy("q_id", "rank")


# Shared DuckDB CTE chain for product quantization (m=8 subspaces of 8
# dims, k=16 seeded centroids, micro-unit BIGINT coordinates — mirrors
# operators/similarity.py pq_train_codebook/pq_encode exactly):
#   sub    = per-(vector, subspace, dim) micro-unit coordinates
#   cb     = the codebook: sub-vectors of the 16 lowest-(md5(id), id) seeds
#   pqd    = integer sq-dist of every (vector, subspace) to every centroid
#   pqcode = the deterministic argmin (ties -> lowest cid) = the PQ code
_SQL_PQ = """
    pqsub AS MATERIALIZED (
        SELECT vec_id,
               (CAST(i AS BIGINT) - 1) // 8 AS m,
               (CAST(i AS BIGINT) - 1) % 8 AS j,
               CAST(FLOOR((CAST(embedding[CAST(i AS INT)] AS DOUBLE) + 2.0)
                          * 1000000) AS BIGINT) AS vi
        FROM embeddings, range(1, 65) t(i)),
    pqseeds AS MATERIALIZED (
        SELECT vec_id,
               CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                       vec_id) AS BIGINT) - 1 AS cid
        FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
    pqcb AS MATERIALIZED (
        SELECT s.cid, u.m, u.j, u.vi AS ci
        FROM pqseeds s JOIN pqsub u ON u.vec_id = s.vec_id),
    pqd AS MATERIALIZED (
        SELECT u.vec_id, u.m, c.cid,
               SUM((u.vi - c.ci) * (u.vi - c.ci)) AS dist
        FROM pqsub u JOIN pqcb c ON c.m = u.m AND c.j = u.j
        GROUP BY 1, 2, 3),
    pqcode AS MATERIALIZED (
        SELECT vec_id, m, cid, dist FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
                       ORDER BY dist, cid) AS rn
            FROM pqd) WHERE rn = 1)
"""


@register(
    "embedding_quantize_pq",
    oracle=f"""
    WITH {_SQL_PQ}
    SELECT vec_id,
           STRING_AGG(CAST(cid AS VARCHAR), ',' ORDER BY m) AS codes_str,
           CAST(SUM(dist) AS BIGINT) AS err
    FROM pqcode GROUP BY vec_id ORDER BY vec_id
    """,
    desc="product quantization (FAISS PQ analog): 64 float dims -> 8 "
    "nibble codes + per-vector integer squared error, against a seeded "
    "16-centroid-per-subspace codebook in micro-unit BIGINT arithmetic — "
    "a 64x storage cut for the 100 TB vector estate, completing the "
    "quantization ladder int8 (4x) -> int4 (8x) -> PQ (64x); every step "
    "(seeding, distances, argmin ties) hash-matches DuckDB exactly. "
    "Codes serialized via array_join (q_array_ops convention).",
)
def embedding_quantize_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/similarity.py pq_train_codebook + pq_encode: one bounded
    k-row collect for the codebook, then a pure narrow map (zero
    shuffles) — encoding 100 TB of embeddings is one scan-shaped stage;
    the codebook travels as m nested-array literals."""
    emb = table(spark, sf_dir, "embeddings")
    cb = S.pq_train_codebook(emb)
    return (
        S.pq_encode(emb, cb)
        .select(
            "vec_id",
            F.array_join(F.col("codes"), ",").alias("codes_str"),
            "err",
        )
        .orderBy("vec_id")
    )


@register(
    "similarity_topk_pq_adc",
    oracle=f"""
    WITH {_SQL_PQ},
    qdt AS (
        SELECT u.vec_id AS q_id, u.m, c.cid,
               SUM((u.vi - c.ci) * (u.vi - c.ci)) AS qd
        FROM pqsub u JOIN pqcb c ON c.m = u.m AND c.j = u.j
        WHERE u.vec_id < 5 GROUP BY 1, 2, 3),
    adc AS (
        SELECT t.q_id, a.vec_id, SUM(t.qd) AS adc_dist
        FROM pqcode a JOIN qdt t ON t.m = a.m AND t.cid = a.cid
        GROUP BY 1, 2)
    SELECT q_id, vec_id, CAST(adc_dist AS BIGINT) AS adc_dist,
           CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                     ORDER BY adc_dist, vec_id) AS rank FROM adc)
    WHERE rank <= 5 ORDER BY q_id, rank
    """,
    desc="PQ asymmetric-distance top-k (the FAISS IVF-PQ query path): "
    "each query precomputes an 8x16 integer distance table once, every "
    "corpus vector scores as 8 table lookups over its codes — the corpus "
    "is never decoded; integer sums make the ranking engine-independent "
    "(ties -> lowest vec_id), so even the approximate search path is "
    "hash-verified end-to-end",
)
def similarity_topk_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/similarity.py pq_topk_adc: distance tables built in a
    narrow map on the broadcast query side; the corpus side never
    shuffles — ADC over 100 TB of codes is a scan + 8 element_at
    lookups per (query, vector), then one per-query top-k."""
    emb = table(spark, sf_dir, "embeddings")
    cb = S.pq_train_codebook(emb)
    codes = S.pq_encode(emb, cb).select("vec_id", "codes")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return S.pq_topk_adc(q, codes, cb, k=5).orderBy("q_id", "rank")


@register(
    "similarity_topk_ivfpq",
    # The coarse quantizer derives from the SAME seeded codebook (coarse
    # centroid cid<8 = concatenated subspace centroids), so its distances
    # are sums of the per-subspace integer distances pqd already holds.
    oracle=f"""
    WITH {_SQL_PQ},
    pqcoarse AS MATERIALIZED (
        SELECT vec_id, cid, SUM(dist) AS cdist
        FROM pqd WHERE cid < 8 GROUP BY 1, 2),
    cassign AS (
        SELECT vec_id, cid FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                       ORDER BY cdist, cid) AS rn
            FROM pqcoarse) WHERE rn = 1),
    qprobes AS (
        SELECT vec_id AS q_id, cid FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                       ORDER BY cdist, cid) AS rn
            FROM pqcoarse WHERE vec_id < 5) WHERE rn <= 3),
    qdt AS (
        SELECT u.vec_id AS q_id, u.m, c.cid,
               SUM((u.vi - c.ci) * (u.vi - c.ci)) AS qd
        FROM pqsub u JOIN pqcb c ON c.m = u.m AND c.j = u.j
        WHERE u.vec_id < 5 GROUP BY 1, 2, 3),
    adc AS (
        SELECT t.q_id, a.vec_id, SUM(t.qd) AS adc_dist
        FROM pqcode a
        JOIN cassign ca ON ca.vec_id = a.vec_id
        JOIN qprobes p ON p.cid = ca.cid
        JOIN qdt t ON t.q_id = p.q_id AND t.m = a.m AND t.cid = a.cid
        GROUP BY 1, 2)
    SELECT q_id, vec_id, CAST(adc_dist AS BIGINT) AS adc_dist,
           CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                     ORDER BY adc_dist, vec_id) AS rank FROM adc)
    WHERE rank <= 5 ORDER BY q_id, rank
    """,
    desc="IVF-PQ top-k (the full FAISS search architecture, non-residual "
    "variant): corpus shards into 8 inverted lists by nearest coarse "
    "centroid AND compresses to 8 PQ nibble codes; each query probes its "
    "3 nearest lists and ADC-scores only those lists' codes — "
    "candidate-generation (IVF) and compression (PQ) composed, integer "
    "arithmetic end-to-end so every step hash-matches DuckDB",
)
def similarity_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/similarity.py pq_topk_ivfadc: corpus is ONE narrow map
    to (id, cid, codes) — writable as a cid-bucketed index; probe is an
    equi-join on cid with the broadcast query side; ADC touches
    ~nprobe/nlist of the corpus codes. At 100 TB this is the shape that
    works: 4-byte codes, bucketed lists, no corpus shuffle."""
    emb = table(spark, sf_dir, "embeddings")
    cb = S.pq_train_codebook(emb)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return S.pq_topk_ivfadc(q, emb, cb, nlist=8, nprobe=3, k=5).orderBy(
        "q_id", "rank"
    )


def _kcore_oracle() -> str:
    """Unrolled 4-round peel mirroring operators/graph.py kcore exactly:
    degree count -> survivor filter -> edge restriction, per round, all
    integer. MATERIALIZED everywhere — each round references the previous
    edge set three times."""
    return 'WITH\n    kitems AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),\n    ke0 AS MATERIALIZED (\n        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v\n        FROM kitems a JOIN kitems b\n          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),\n    kd0 AS MATERIALIZED (\n        SELECT n, COUNT(*) AS c FROM (\n            SELECT u AS n FROM ke0 UNION ALL SELECT v FROM ke0) GROUP BY n),\n    ka0 AS MATERIALIZED (SELECT n FROM kd0 WHERE c >= 60),\n    ke1 AS MATERIALIZED (\n        SELECT u, v FROM ke0\n        WHERE u IN (SELECT n FROM ka0) AND v IN (SELECT n FROM ka0)),\n    kd1 AS MATERIALIZED (\n        SELECT n, COUNT(*) AS c FROM (\n            SELECT u AS n FROM ke1 UNION ALL SELECT v FROM ke1) GROUP BY n),\n    ka1 AS MATERIALIZED (SELECT n FROM kd1 WHERE c >= 60),\n    ke2 AS MATERIALIZED (\n        SELECT u, v FROM ke1\n        WHERE u IN (SELECT n FROM ka1) AND v IN (SELECT n FROM ka1)),\n    kd2 AS MATERIALIZED (\n        SELECT n, COUNT(*) AS c FROM (\n            SELECT u AS n FROM ke2 UNION ALL SELECT v FROM ke2) GROUP BY n),\n    ka2 AS MATERIALIZED (SELECT n FROM kd2 WHERE c >= 60),\n    ke3 AS MATERIALIZED (\n        SELECT u, v FROM ke2\n        WHERE u IN (SELECT n FROM ka2) AND v IN (SELECT n FROM ka2)),\n    kd3 AS MATERIALIZED (\n        SELECT n, COUNT(*) AS c FROM (\n            SELECT u AS n FROM ke3 UNION ALL SELECT v FROM ke3) GROUP BY n),\n    ka3 AS MATERIALIZED (SELECT n FROM kd3 WHERE c >= 60),\n    ke4 AS MATERIALIZED (\n        SELECT u, v FROM ke3\n        WHERE u IN (SELECT n FROM ka3) AND v IN (SELECT n FROM ka3)),\n    kdf AS (\n        SELECT n, COUNT(*) AS c FROM (\n            SELECT u AS n FROM ke4 UNION ALL SELECT v FROM ke4) GROUP BY n)\n    SELECT n AS node, CAST(c AS BIGINT) AS deg FROM kdf WHERE c >= 60\n    ORDER BY node'


@register(
    "graph_kcore",
    oracle=_kcore_oracle(),
    desc="k-core decomposition (k=60) of the co-purchase graph via "
    "bounded-round peeling: 4 unrolled drop-degree-below-k cascades "
    "(enough to reach the fixpoint on this graph — verified by the "
    "convergence pytest), pure integer counting so the surviving "
    "(node, in-core degree) rows hash-match the unrolled DuckDB CTE "
    "chain exactly — the graph family density screen next to "
    "pagerank (influence), triangles (cohesion) and CC (membership)",
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/graph.py kcore: per round one map-side-combined degree
    groupBy (exchange carries O(nodes)) + two survivor semi-joins; the
    edge list only ever shrinks. Dense-core screening for curation:
    co-purchase/co-citation cores locate template/boilerplate clusters."""
    from gearpump_spark.operators.graph import kcore

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
    return kcore(edges, k=60, n_rounds=4).orderBy("node")


def _lpa_oracle() -> str:
    """Unrolled 3-round synchronous LPA mirroring operators/graph.py
    label_propagation exactly: neighbor-label vote counts -> argmax with
    (count DESC, label ASC) tie-break, per round."""
    head = """WITH
    kitems AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM kitems a JOIN kitems b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    nb AS MATERIALIZED (
        SELECT u AS n, v AS nbr FROM e UNION ALL SELECT v AS n, u AS nbr FROM e),
    l0 AS MATERIALIZED (SELECT DISTINCT n, n AS label FROM nb)"""
    rounds = []
    for i in range(3):
        rounds.append(
            f""",
    v{i + 1} AS MATERIALIZED (
        SELECT nb.n, l.label, COUNT(*) AS c
        FROM nb JOIN l{i} l ON nb.nbr = l.n GROUP BY nb.n, l.label),
    l{i + 1} AS MATERIALIZED (
        SELECT n, label FROM (
            SELECT n, label,
                   ROW_NUMBER() OVER (PARTITION BY n
                                      ORDER BY c DESC, label ASC) AS rn
            FROM v{i + 1}) WHERE rn = 1)"""
        )
    tail = """
    SELECT n AS node, CAST(label AS BIGINT) AS label FROM l3 ORDER BY node"""
    return head + "".join(rounds) + tail


@register(
    "graph_label_propagation",
    oracle=_lpa_oracle(),
    desc="community detection on the co-purchase graph via 3 rounds of "
    "synchronous label propagation (Raghavan 2007) with deterministic "
    "(count DESC, label ASC) tie-break — pure integer voting, so the "
    "(node, community) assignment hash-matches an unrolled DuckDB round "
    "chain exactly; completes the graph-curation toolkit: influence "
    "(pagerank), density (triangles/k-core), reachability (CC), and now "
    "COMMUNITIES, with no modularity float-optimization",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/graph.py label_propagation: per round one map-side-
    combined (node, label) vote count + an argmax reduce via
    max(struct(c, -label)) — no window function; adjacency built once and
    checkpointed, labels (node-sized) are the only per-round state."""
    from gearpump_spark.operators.graph import label_propagation

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
    return label_propagation(edges, n_rounds=3).orderBy("node")


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_SQL_TOKS = """
    toks AS (
        SELECT doc_id, lang, text,
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), w -> w <> '') AS tk
        FROM documents)
"""


@register(
    "text_doc_stats",
    oracle=f"""
    WITH {_SQL_TOKS}
    SELECT doc_id,
           CAST(LEN(tk) AS BIGINT) AS n_tokens,
           CAST(LENGTH(text) AS BIGINT) AS n_chars,
           CAST(LIST_SUM(LIST_TRANSFORM(tk, w -> LENGTH(w))) AS DOUBLE)
             / CAST(LEN(tk) AS DOUBLE) AS avg_token_len,
           CAST(LENGTH(REGEXP_REPLACE(text, '[^.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
           CAST(LENGTH(REGEXP_REPLACE(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digits,
           CAST(LEN(LIST_FILTER(LIST_TRANSFORM(tk, w -> LOWER(w)),
                w -> w IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stopwords
    FROM toks ORDER BY doc_id
    """,
    desc="per-document text statistics: tokens, chars, punct, digits, stopwords",
)
def text_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize once: the token array is materialized in the first
    projection and every array stat reads it — Catalyst does not dedupe
    identical split() calls across lambda expressions, so the naive form
    re-tokenizes per stat (~1.5× slower measured)."""
    docs = table(spark, sf_dir, "documents")
    t = F.col("text")
    base = docs.select("doc_id", t.alias("text"), TX.tokens(t).alias("tk"))
    return base.select(
        "doc_id",
        TX.token_count_of(F.col("tk")).alias("n_tokens"),
        TX.char_count(F.col("text")).alias("n_chars"),
        TX.avg_token_len_of(F.col("tk")).alias("avg_token_len"),
        TX.punct_count(F.col("text")).alias("n_punct"),
        TX.digit_count(F.col("text")).alias("n_digits"),
        TX.stopword_count_of(F.col("tk")).alias("n_stopwords"),
    ).orderBy("doc_id")


@register(
    "text_lang_profile",
    oracle=f"""
    WITH {_SQL_TOKS}
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(LEN(tk)) AS BIGINT) AS total_tokens,
           CAST(CAST(SUM(LEN(tk)) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_tokens,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
    FROM toks GROUP BY lang ORDER BY lang
    """,
    desc="corpus profile per language tag: doc counts, token/char volumes",
)
def text_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = F.col("text")
    per_doc = docs.select("lang", TX.token_count(t).alias("ntok"), TX.char_count(t).alias("nch"))
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ntok").alias("total_tokens"),
            (F.sum("ntok").cast("double") / F.count("*")).cast("double").alias("avg_tokens"),
            F.sum("nch").alias("total_chars"),
        )
        .orderBy("lang")
    )


@register(
    "text_lang_id",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
               LEN(LIST_FILTER(lt, w -> w IN ('the','a','of','and','to','in','is'))) AS s_en,
               LEN(LIST_FILTER(lt, w -> w IN ('el','la','de','y','que','los'))) AS s_es,
               LEN(LIST_FILTER(lt, w -> w IN ('le','la','de','et','les','des'))) AS s_fr,
               LEN(LIST_FILTER(lt, w -> w IN ('der','die','das','und','ist','ein'))) AS s_de
        FROM (SELECT doc_id, lang,
                     LIST_TRANSFORM(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'),
                                                w -> w <> ''), w -> LOWER(w)) AS lt
              FROM documents))
    SELECT doc_id, lang,
           CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en >= 1 THEN 'en'
                WHEN s_es >= s_fr AND s_es >= s_de AND s_es >= 1 THEN 'es'
                WHEN s_fr >= s_de AND s_fr >= 1 THEN 'fr'
                WHEN s_de >= 1 THEN 'de'
                ELSE 'und' END AS pred_lang
    FROM scored ORDER BY doc_id
    """,
    desc="stopword-profile language-ID heuristic (argmax, en-first ties)",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", TX.lang_id(F.col("text")).alias("pred_lang")
    ).orderBy("doc_id")


@register(
    "text_quality",
    oracle="""
    WITH q AS (
        SELECT doc_id,
               LEAST(CAST(LEN(tk) AS DOUBLE) / 20.0, 1.0)
               * GREATEST(1.0 - (CAST(LENGTH(REGEXP_REPLACE(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
                                 / GREATEST(CAST(LENGTH(text) AS DOUBLE), 1.0)) * 10.0, 0.0)
               * (CASE WHEN LEN(LIST_FILTER(LIST_TRANSFORM(tk, w -> LOWER(w)),
                            w -> w IN ('the','a','of','and','to','in','is'))) > 0
                       THEN 1.0 ELSE 0.5 END) AS quality
        FROM (SELECT doc_id, text,
                     LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), w -> w <> '') AS tk
              FROM documents))
    SELECT doc_id, quality FROM q WHERE quality >= 0.5 ORDER BY doc_id
    """,
    desc="heuristic quality score + filter (length/punct/stopword signals)",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", TX.quality_score(F.col("text")).alias("quality"))
        .filter(F.col("quality") >= 0.5)
        .orderBy("doc_id")
    )


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents ORDER BY doc_id
    """,
    desc="deterministic 128-bit content fingerprint per document",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", D.fingerprint(F.col("text")).alias("fp")).orderBy("doc_id")


# PII injection formula shared by the Spark query and its oracle: both
# engines append deterministic synthetic PII to the document text, then the
# Spark side redacts with functions/text.py patterns while the oracle runs
# the SAME patterns (single source: TX.PII_PATTERNS) via DuckDB regex.
_SQL_PII_INJECT = """
    SELECT doc_id, text
      || CASE WHEN doc_id % 3 = 0
              THEN ' contact user' || doc_id || '@example.com' ELSE '' END
      || CASE WHEN doc_id % 4 = 0
              THEN ' call +1-555-' || LPAD(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                   || '-0199' ELSE '' END
      || CASE WHEN doc_id % 5 = 0
              THEN ' host 10.0.' || (doc_id % 256) || '.7' ELSE '' END AS t
    FROM documents
"""


def _sql_redact_chain(col: str) -> str:
    out = col
    for _name, pat, repl in TX.PII_PATTERNS:
        out = f"REGEXP_REPLACE({out}, '{pat}', '{repl}', 'g')"
    return out


_SQL_PII_COUNTS = ", ".join(
    f"CAST(LEN(REGEXP_EXTRACT_ALL(t, '{pat}')) AS BIGINT) AS n_{name}"
    for name, pat, _repl in TX.PII_PATTERNS
)


@register(
    "text_pii_redact",
    oracle=f"""
    WITH injected AS ({_SQL_PII_INJECT})
    SELECT doc_id, {_SQL_PII_COUNTS},
           MD5({_sql_redact_chain("t")}) AS redacted_hash
    FROM injected ORDER BY doc_id
    """,
    desc="PII scrubbing: deterministic synthetic emails/phones/IPs injected "
    "per doc, then redacted by the shared regex chain; counts + md5 of the "
    "redacted text verify both detection and replacement byte-for-byte",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 3 == 0,
                F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                did % 4 == 0,
                F.concat(
                    F.lit(" call +1-555-"),
                    F.lpad((did % 1000).cast("string"), 3, "0"),
                    F.lit("-0199"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 5 == 0,
                F.concat(F.lit(" host 10.0."), (did % 256).cast("string"), F.lit(".7")),
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    counts = TX.pii_counts(F.col("t"))
    return injected.select(
        "doc_id",
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        F.md5(TX.redact_pii(F.col("t")).cast("binary")).alias("redacted_hash"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Multimodal metadata (binary payload plumbing; decode stubs in
# operators/multimodal.py are pytest-covered)
# ---------------------------------------------------------------------------


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CAST(STRLEN(text) AS BIGINT) AS byte_len,
           CAST(LENGTH(text) AS BIGINT) AS char_len,
           CASE WHEN STRLEN(text) > LENGTH(text) THEN 'multibyte' ELSE 'ascii' END AS enc_kind,
           MD5(text) AS content_hash
    FROM documents ORDER BY doc_id
    """,
    desc="opaque-payload metadata: byte length vs char length, content hash "
    "(the typed-metadata side of binary multimodal columns)",
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.octet_length(t).cast("bigint").alias("byte_len"),
        F.length(t).cast("bigint").alias("char_len"),
        F.when(F.octet_length(t) > F.length(t), "multibyte").otherwise("ascii").alias("enc_kind"),
        F.md5(t.cast("binary")).alias("content_hash"),
    ).orderBy("doc_id")


@register(
    "multimodal_image_real",
    oracle="""
    SELECT doc_id,
           'png' AS format,
           CAST(16 + doc_id % 64 AS INT) AS width,
           CAST(16 + (7 * doc_id) % 64 AS INT) AS height,
           CAST(CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 2 ELSE 4 END AS INT)
             AS n_channels
    FROM documents ORDER BY doc_id
    """,
    desc="REAL container bytes: synthesize a valid PNG per document "
    "(id-derived dims/color type), parse it back with the pure-python "
    "header decoder; the oracle states the closed-form parameters — a "
    "parser or synthesizer bug on either field breaks the hash",
)
def multimodal_image_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators.multimodal import (
        decode_image_metadata,
        synthesize_png_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    parsed = decode_image_metadata(synthesize_png_payloads(docs))
    return parsed.select("doc_id", "format", "width", "height", "n_channels").orderBy(
        "doc_id"
    )


@register(
    "multimodal_audio_real",
    oracle="""
    SELECT doc_id,
           CAST(44 + 4 * (1 + doc_id % 2) * (1 + doc_id % 3) AS BIGINT) AS byte_len,
           'wav' AS format,
           CAST(1 + doc_id % 2 AS INT) AS n_channels,
           CAST(8000 + (doc_id % 5) * 1000 AS INT) AS sample_rate,
           CAST(8 * (1 + doc_id % 3) AS INT) AS bits_per_sample
    FROM documents ORDER BY doc_id
    """,
    desc="REAL container bytes: synthesize a RIFF/WAV per document, parse "
    "it back with the header decoder (fmt-chunk walk); byte_len checks the "
    "whole container layout (44-byte header + 4 samples x block align)",
)
def multimodal_audio_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators.multimodal import (
        decode_audio_metadata,
        synthesize_wav_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    parsed = decode_audio_metadata(synthesize_wav_payloads(docs))
    return parsed.select(
        "doc_id", "byte_len", "format", "n_channels", "sample_rate", "bits_per_sample"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Additions: embedding near-dup, token counting, video-frame plumbing,
# iterative graph compute
# ---------------------------------------------------------------------------

_SQL_COS = """
    ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(a.embedding) + 1),
                   i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / (SQRT(LIST_SUM(LIST_TRANSFORM(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * SQRT(LIST_SUM(LIST_TRANSFORM(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)
"""


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label, {_SQL_COS} AS cosine_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_SQL_COS} >= 0.30
    ORDER BY id_a, id_b
    """,
    desc="embedding-cosine near-dup pairs, blocked by label (the IVF-style "
    "coarse partition); production threshold ~0.95, fixture embeddings are "
    "random so 0.30 exercises the same plan",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked pair generation: self-join ONLY within a label block (the
    quantizer cell), never the full cross product. Scale: pairs per block
    ~ (n/blocks)^2; shuffle keys on label; cosine is a JVM-side fold
    (operators/similarity.cosine) rounded before thresholding so the
    boundary is engine-stable."""
    emb = table(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("label"), F.col("embedding").alias("vec_a")
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("label").alias("label_b"),
        F.col("embedding").alias("vec_b"),
    )
    cos = F.round(S.cosine(F.col("vec_a"), F.col("vec_b")), 4)
    return (
        a.join(b, (F.col("label") == F.col("label_b")) & (F.col("id_a") < F.col("id_b")))
        .withColumn("cosine_sim", cos)
        .filter(F.col("cosine_sim") >= 0.30)
        .select("id_a", "id_b", "label", "cosine_sim")
        .orderBy("id_a", "id_b")
    )


def _cos_pair_sql(x: str, y: str) -> str:
    """DuckDB cosine between two named list columns, rounded to 4 — the
    same fold the Spark side computes via operators/similarity.cosine."""
    return f"""ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN({x}) + 1),
                   i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE)))
          / (SQRT(LIST_SUM(LIST_TRANSFORM({x}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
             * SQRT(LIST_SUM(LIST_TRANSFORM({y}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))), 4)"""


@register(
    "dedup_semantic",
    oracle=f"""
    WITH cent AS (SELECT vec_id AS cid, embedding AS cvec
                  FROM embeddings ORDER BY vec_id
                  LIMIT (SELECT GREATEST(8, COUNT(*) // 250)
                         FROM embeddings)),
    scored AS (
        SELECT e.vec_id, e.embedding, c.cid,
               {_cos_pair_sql('e.embedding', 'c.cvec')} AS cs
        FROM embeddings e, cent c),
    assigned AS (
        SELECT vec_id, embedding, cid AS cluster FROM (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
            FROM scored) WHERE rn = 1),
    drops AS (
        SELECT DISTINCT b.vec_id
        FROM assigned a JOIN assigned b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE {_cos_pair_sql('a.embedding', 'b.embedding')} >= 0.30)
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM assigned
    WHERE vec_id NOT IN (SELECT vec_id FROM drops)
    ORDER BY vec_id
    """,
    desc="SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the "
    "embedding space (deterministic fixed centroids = the k lowest-id "
    "vectors, k = max(8, n/250) so k GROWS with the corpus — the paper's "
    "k-means is an unverifiable fixpoint), then drop any vector whose "
    "cluster holds a lower-id vector with cosine >= 0.30 — with k ∝ n "
    "the intra-cluster pair cost n²/k stays LINEAR in the corpus",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivors of intra-cluster semantic pruning. Scale: centroids
    broadcast; argmax assignment is a map-side struct max (no per-vector
    window shuffle); only the salted intra-cluster pair join shuffles.
    k = max(8, n // 250) mirrors the paper's corpus-proportional cluster
    count (they use 50k at LAION scale): fixing k would make the pair
    join quadratic in the corpus — measured 36x on a 10x data step before
    k became data-derived. The count() action to size k is one cheap
    metadata-ish job, same pattern as IVF's trained-centroid literals."""
    emb = table(spark, sf_dir, "embeddings")
    k = max(8, emb.count() // 250)
    return S.semantic_dedup(emb, n_clusters=k, threshold=0.30).orderBy("vec_id")


@register(
    "text_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\s+'), w -> w <> '')) AS BIGINT) AS n_ws_tokens,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_pieces,
           CAST(LEN(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]+')) AS BIGINT) AS n_words
    FROM documents ORDER BY doc_id
    """,
    desc="token counting: whitespace tokens + BPE-style piece segmentation "
    "(letters / digits / punctuation runs)",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure JVM regex (no UDF): the BPE-ish pre-tokenizer pattern splits
    letter runs, digit runs, and single punctuation — the standard
    pre-segmentation before a real BPE merge table is applied."""
    docs = table(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", TX.WS_RE), lambda w: w != "")
    pieces = F.regexp_extract_all(
        # explicit RE2 whitespace set, not Java \s (which adds U+000B)
        F.col("text"), F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\f\\r]"), F.lit(0)
    )
    words = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z]+"), F.lit(0))
    return docs.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("n_ws_tokens"),
        F.size(pieces).cast("bigint").alias("n_pieces"),
        F.size(words).cast("bigint").alias("n_words"),
    ).orderBy("doc_id")


@register(
    "multimodal_frames",
    # frame_hash = md5(utf8(text) + frame_idx as 4 big-endian bytes); the
    # index bytes are CHR(0)*3 + CHR(i) for i < 128, so DuckDB's
    # VARCHAR-only md5 hashes the identical byte stream.
    oracle="""
    SELECT d.doc_id, CAST(f.i AS INT) AS frame_idx,
           MD5(d.text || CHR(0) || CHR(0) || CHR(0) ||
               CHR(CAST(f.i AS INT))) AS frame_hash
    FROM documents d, (SELECT UNNEST(RANGE(0, 3)) AS i) f
    WHERE d.doc_id < 200
    ORDER BY d.doc_id, frame_idx
    """,
    desc="video-frame sampling plumbing: one row per (payload, frame_idx) "
    "via Arrow-batched mapInPandas over a stubbed decoder; the fake frame "
    "hashes are closed-form md5, recomputed independently by the oracle",
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators import multimodal as MM

    # key-predicate subset, NOT limit(): limit takes partition-layout-
    # dependent rows and the processed set would differ across machines
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    with_payload = MM.attach_fake_payload(docs)
    return MM.sample_frames(with_payload, n_frames=3).orderBy("doc_id", "frame_idx")


@register(
    "multimodal_resize",
    # The fake resize emits a CTR-mode md5 keystream: 32*24*3 = 2304 bytes
    # = exactly 144 16-byte blocks, block k = md5(utf8(text) + "|32x24|k").
    # The content check hashes HEX(payload) (uppercase in both engines)
    # because DuckDB's md5 is VARCHAR-only — the oracle rebuilds the hex
    # stream block-by-block and must land on the identical digest.
    oracle="""
    WITH blocks AS (
        SELECT d.doc_id,
               b.k,
               UPPER(MD5(d.text || '|32x24|' || CAST(b.k AS VARCHAR))) AS hx
        FROM documents d, (SELECT UNNEST(RANGE(0, 144)) AS k) b
        WHERE d.doc_id < 200)
    SELECT doc_id,
           CAST(32 AS INT) AS width,
           CAST(24 AS INT) AS height,
           CAST(2304 AS BIGINT) AS byte_len,
           MD5(STRING_AGG(hx, '' ORDER BY k)) AS payload_hex_md5
    FROM blocks GROUP BY doc_id ORDER BY doc_id
    """,
    desc="image resize plumbing: payload -> fixed-raster payload via "
    "Arrow-batched mapInPandas over the stubbed decoder seam; every "
    "output byte is checked (oracle recomputes the CTR keystream and "
    "matches md5(hex(payload)))",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators import multimodal as MM

    # key-predicate subset, NOT limit(): limit takes partition-layout-
    # dependent rows and the processed set would differ across machines
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    with_payload = MM.attach_fake_payload(docs)
    return (
        MM.resize_images(with_payload, width=32, height=24)
        .select(
            "doc_id",
            "width",
            "height",
            "byte_len",
            F.md5(F.hex("payload")).alias("payload_hex_md5"),
        )
        .orderBy("doc_id")
    )


# One fake feature: float32(u32_be(md5(payload + i as 4 BE bytes)[:4]) / 2^32).
# The float64->float32->float64 round-trip is IEEE round-to-nearest in
# Python/Arrow and in DuckDB's REAL cast, and the 8-term left-to-right double
# sum is EXACT (each term has <= 24 significant bits; partial sums need <= 27
# — far inside double's 53), so no rounding is needed for cross-engine match.
def _fake_feature_sql(i: int) -> str:
    return (
        "CAST(CAST(CAST(('0x' || SUBSTR(MD5(text || CHR(0) || CHR(0) || "
        f"CHR(0) || CHR({i})), 1, 8)) AS BIGINT) / 4294967296.0 "
        "AS REAL) AS DOUBLE)"
    )


@register(
    "multimodal_features",
    oracle=f"""
    SELECT doc_id,
           {' + '.join(_fake_feature_sql(i) for i in range(8))} AS feat_sum,
           CAST(8 AS INT) AS dim
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
    desc="feature extraction plumbing: payload -> dense float vector "
    "(model-forward-pass seam), the embedding column similarity ops "
    "consume; the oracle recomputes every fake feature closed-form and "
    "the 8-term double sum is exact, so the hash check is bitwise",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators import multimodal as MM

    # key-predicate subset, NOT limit(): limit takes partition-layout-
    # dependent rows and the processed set would differ across machines
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    with_payload = MM.attach_fake_payload(docs)
    feats = MM.extract_features(with_payload, dim=8)
    return feats.select(
        "doc_id",
        F.aggregate("features", F.lit(0.0), lambda a, x: a + x).alias("feat_sum"),
        F.size("features").alias("dim"),
    ).orderBy("doc_id")


@register(
    "graph_pagerank",
    oracle=None,  # iterative fixpoint — not SQL-expressible; golden-checked
    # against a NumPy power iteration in tests/test_operators_unit.py
    desc="iterative PageRank over the part->supplier shipment graph "
    "(reference: examples/pagerank BSP loop)",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-side superstep loop (reference PageRankController ticks);
    each iteration = one shuffle keyed on dst + a broadcast scalar.
    Lineage cut per round via localCheckpoint (operators/graph.py)."""
    from gearpump_spark.operators.graph import pagerank

    li = table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_partkey") + F.lit(1_000_000)).alias("src"),
        F.col("l_suppkey").alias("dst"),
    ).distinct()
    ranks = pagerank(edges, max_iter=10, tol=1e-7)
    return ranks.select(
        "node_id", F.round("rank", 8).cast("double").alias("rank")
    ).orderBy("node_id")


@register(
    "graph_pagerank_personalized",
    oracle=None,  # iterative float fixpoint — golden-checked against the
    # NumPy RWR reference in tests/test_operators_unit.py
    desc="personalized PageRank / random walk with restart to a seed set "
    "(Haveliwala 2002): rank = proximity to the 5 lowest-id supplier "
    "seeds over the part->supplier shipment graph — the seed-expansion "
    "/ 'more like these' recommender; teleport AND dangling mass both "
    "restart to the seeds",
)
def graph_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same BSP superstep loop as graph_pagerank (one dst-keyed shuffle
    + a broadcast scalar per round, localCheckpoint lineage cuts); the
    restart vector is the only difference. Returns only nodes with
    rank above the noise floor (seeds + their neighborhoods) so the
    output is proximity-ranked, not corpus-sized."""
    from gearpump_spark.operators.graph import personalized_pagerank

    li = table(spark, sf_dir, "lineitem")
    # BOTH directions: the plain-pagerank digraph points part -> supplier
    # only, which makes every supplier dangling — a walk restarted AT
    # suppliers would never leave the seed set. The bipartite
    # supplier <-> part walk diffuses: seeds -> their parts -> co-supplying
    # suppliers -> ...
    ps = li.select(
        (F.col("l_partkey") + F.lit(1_000_000)).alias("src"),
        F.col("l_suppkey").alias("dst"),
    ).distinct()
    edges = ps.unionByName(
        ps.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = [r[0] for r in ps.select("dst").distinct().orderBy("dst").limit(5).collect()]
    ranks = personalized_pagerank(edges, seeds, max_iter=10, tol=1e-9)
    return (
        ranks.where(F.col("rank") > 1e-9)
        .select("node_id", F.round("rank", 8).cast("double").alias("rank"))
        .orderBy("node_id")
    )


def _pagerank_int_oracle(n_iter: int = 10, scale: int = 10**12) -> str:
    """Unrolled n_iter-step CTE chain mirroring operators/graph.py
    pagerank_int exactly — fixed iterations + all-integer arithmetic make
    the fixpoint loop SQL-expressible (float PageRank is not: its sums
    are summation-order-dependent).

    Every CTE is MATERIALIZED: pr{{k+1}} references pr{{k}} twice (dangling
    mass + contributions), so DuckDB's default CTE inlining re-evaluates
    the chain 2^n_iter times (>5 min at sf0.01); materialization makes it
    one pass per step (~0.5 s)."""
    blocks = [
        f"""
    edges AS MATERIALIZED (
        SELECT DISTINCT l_partkey + 1000000 AS src, l_suppkey AS dst
        FROM lineitem),
    nodes AS MATERIALIZED (
        SELECT src AS node_id FROM edges UNION SELECT dst FROM edges),
    nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
    outd AS MATERIALIZED (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
    pr0 AS MATERIALIZED (SELECT node_id, CAST({scale} // nn.n AS BIGINT) AS r
            FROM nodes CROSS JOIN nn)"""
    ]
    for k in range(n_iter):
        blocks.append(
            f""",
    d{k} AS MATERIALIZED (SELECT COALESCE(SUM(r), 0) AS dm FROM pr{k}
             WHERE node_id NOT IN (SELECT src FROM outd)),
    c{k} AS MATERIALIZED (SELECT e.dst AS node_id, SUM(p.r // o.od) AS im
             FROM edges e JOIN outd o ON e.src = o.src
             JOIN pr{k} p ON p.node_id = e.src GROUP BY e.dst),
    pr{k + 1} AS MATERIALIZED (
        SELECT n.node_id,
               CAST((15 * {scale}) // (100 * nn.n)
                    + (85 * (COALESCE(c.im, 0) + d{k}.dm // nn.n)) // 100
                 AS BIGINT) AS r
        FROM nodes n CROSS JOIN nn CROSS JOIN d{k}
        LEFT JOIN c{k} c USING (node_id))"""
        )
    return (
        "WITH"
        + "".join(blocks)
        + f"\n    SELECT node_id, r FROM pr{n_iter} ORDER BY node_id"
    )


@register(
    "graph_pagerank_int",
    oracle=_pagerank_int_oracle(10),
    desc="BIT-REPRODUCIBLE integer PageRank (micro-unit ranks, floor-"
    "division steps): same part->supplier graph and superstep plan as "
    "graph_pagerank, but every step is integer arithmetic, so the whole "
    "10-iteration fixpoint hash-matches a DuckDB CTE chain exactly — the "
    "auditable variant a governance pipeline can re-verify bit-for-bit",
)
def graph_pagerank_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/graph.py pagerank_int: one shuffle per superstep,
    localCheckpoint lineage cuts, all-BIGINT arithmetic."""
    from gearpump_spark.operators.graph import pagerank_int

    li = table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_partkey") + F.lit(1_000_000)).alias("src"),
        F.col("l_suppkey").alias("dst"),
    ).distinct()
    return pagerank_int(edges, n_iter=10).orderBy("node_id")


def _ppr_int_oracle(n_iter: int = 10, scale: int = 10**12, k: int = 5) -> str:
    """Unrolled CTE chain mirroring operators/graph.py
    personalized_pagerank_int exactly (fixed iterations + all-integer
    floor-division arithmetic make the RWR fixpoint SQL-expressible; the
    float variant graph_pagerank_personalized stays rows-only). Same
    MATERIALIZED discipline as _pagerank_int_oracle: each pr{{k}} is
    referenced twice per step, so inlining would re-evaluate 2^n_iter
    times."""
    blocks = [
        f"""
    ps AS MATERIALIZED (
        SELECT DISTINCT l_partkey + 1000000 AS src, l_suppkey AS dst
        FROM lineitem),
    edges AS MATERIALIZED (
        SELECT src, dst FROM ps UNION SELECT dst, src FROM ps),
    nodes AS MATERIALIZED (
        SELECT src AS node_id FROM edges UNION SELECT dst FROM edges),
    seeds AS MATERIALIZED (
        SELECT node_id FROM (SELECT DISTINCT dst AS node_id FROM ps)
        ORDER BY node_id LIMIT {k}),
    outd AS MATERIALIZED (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
    pr0 AS MATERIALIZED (
        SELECT n.node_id,
               CAST(CASE WHEN s.node_id IS NOT NULL
                         THEN {scale} // {k} ELSE 0 END AS BIGINT) AS r
        FROM nodes n LEFT JOIN seeds s ON s.node_id = n.node_id)"""
    ]
    for i in range(n_iter):
        blocks.append(
            f""",
    d{i} AS MATERIALIZED (SELECT COALESCE(SUM(r), 0) AS dm FROM pr{i}
             WHERE node_id NOT IN (SELECT src FROM outd)),
    c{i} AS MATERIALIZED (SELECT e.dst AS node_id, SUM(p.r // o.od) AS im
             FROM edges e JOIN outd o ON e.src = o.src
             JOIN pr{i} p ON p.node_id = e.src GROUP BY e.dst),
    pr{i + 1} AS MATERIALIZED (
        SELECT n.node_id,
               CAST(CASE WHEN s.node_id IS NOT NULL
                         THEN (15 * {scale}) // (100 * {k}) ELSE 0 END
                    + (85 * (COALESCE(c.im, 0)
                             + CASE WHEN s.node_id IS NOT NULL
                                    THEN d{i}.dm // {k} ELSE 0 END)) // 100
                 AS BIGINT) AS r
        FROM nodes n CROSS JOIN d{i}
        LEFT JOIN c{i} c ON c.node_id = n.node_id
        LEFT JOIN seeds s ON s.node_id = n.node_id)"""
        )
    return (
        "WITH"
        + "".join(blocks)
        + f"\n    SELECT node_id, r FROM pr{n_iter} ORDER BY node_id"
    )


@register(
    "graph_pagerank_personalized_int",
    oracle=_ppr_int_oracle(10),
    desc="BIT-REPRODUCIBLE integer personalized PageRank (random walk "
    "with restart to the 5 lowest-id supplier seeds, micro-unit ranks, "
    "floor-division steps) over the bipartite supplier<->part shipment "
    "graph: same restart semantics as graph_pagerank_personalized but "
    "every step is integer arithmetic, so the 10-iteration fixpoint "
    "hash-matches a DuckDB CTE chain exactly — completing the "
    "bit-reproducible family (pagerank_int, kmeans_int) for the last "
    "float-only fixpoint",
)
def graph_pagerank_personalized_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/graph.py personalized_pagerank_int: one dst-keyed
    shuffle per superstep, localCheckpoint lineage cuts, all-BIGINT
    arithmetic; only the k seed ids cross the driver boundary."""
    from gearpump_spark.operators.graph import personalized_pagerank_int

    li = table(spark, sf_dir, "lineitem")
    ps = li.select(
        (F.col("l_partkey") + F.lit(1_000_000)).alias("src"),
        F.col("l_suppkey").alias("dst"),
    ).distinct()
    edges = ps.unionByName(
        ps.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = [
        r[0] for r in ps.select("dst").distinct().orderBy("dst").limit(5).collect()
    ]
    return personalized_pagerank_int(edges, seeds, n_iter=10).orderBy("node_id")


def _pagerank_weighted_int_oracle(n_iter: int = 10, scale: int = 10**12) -> str:
    """Unrolled CTE chain mirroring operators/graph.py
    pagerank_weighted_int exactly. Same MATERIALIZED discipline as
    _pagerank_int_oracle (each pr{{k}} is referenced twice per step).
    The contribution term keeps the operator's product-then-floor order
    ((r * w) // tw — floor(r·w/W) != floor(r/W)·w) so the micro-unit
    truncation is identical across engines."""
    blocks = [
        f"""
    edges AS MATERIALIZED (
        SELECT l_partkey + 1000000 AS src, l_suppkey AS dst,
               SUM(CAST(l_quantity AS BIGINT)) AS w
        FROM lineitem GROUP BY 1, 2),
    nodes AS MATERIALIZED (
        SELECT src AS node_id FROM edges UNION SELECT dst FROM edges),
    nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
    outw AS MATERIALIZED (SELECT src, SUM(w) AS tw FROM edges GROUP BY src),
    pr0 AS MATERIALIZED (SELECT node_id, CAST({scale} // nn.n AS BIGINT) AS r
            FROM nodes CROSS JOIN nn)"""
    ]
    for k in range(n_iter):
        blocks.append(
            f""",
    d{k} AS MATERIALIZED (SELECT COALESCE(SUM(r), 0) AS dm FROM pr{k}
             WHERE node_id NOT IN (SELECT src FROM outw)),
    c{k} AS MATERIALIZED (SELECT e.dst AS node_id,
                                 SUM((p.r * e.w) // o.tw) AS im
             FROM edges e JOIN outw o ON e.src = o.src
             JOIN pr{k} p ON p.node_id = e.src GROUP BY e.dst),
    pr{k + 1} AS MATERIALIZED (
        SELECT n.node_id,
               CAST((15 * {scale}) // (100 * nn.n)
                    + (85 * (COALESCE(c.im, 0) + d{k}.dm // nn.n)) // 100
                 AS BIGINT) AS r
        FROM nodes n CROSS JOIN nn CROSS JOIN d{k}
        LEFT JOIN c{k} c USING (node_id))"""
        )
    return (
        "WITH"
        + "".join(blocks)
        + f"\n    SELECT node_id, r FROM pr{n_iter} ORDER BY node_id"
    )


@register(
    "graph_pagerank_weighted_int",
    oracle=_pagerank_weighted_int_oracle(10),
    desc="BIT-REPRODUCIBLE WEIGHTED PageRank (micro-unit ranks, floor-"
    "division steps): the part->supplier shipment graph with edge weight "
    "= total shipped quantity, so rank diffuses proportionally to freight "
    "volume instead of uniformly — the general transition matrix "
    "P(u,v)=w(u,v)/W(u) the reference's UpdateWeight messages carry "
    "(PageRankWorker.scala), with the uniform graph_pagerank_int as the "
    "w=1 special case; the 10-step fixpoint hash-matches a DuckDB CTE "
    "chain exactly",
)
def graph_pagerank_weighted_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/graph.py pagerank_weighted_int: one dst-keyed shuffle
    per superstep, localCheckpoint lineage cuts, all-BIGINT arithmetic
    ((r*w) DIV W stays under 2^63: rank <= 10^12, summed quantity per
    edge <= ~10^4)."""
    from gearpump_spark.operators.graph import pagerank_weighted_int

    li = table(spark, sf_dir, "lineitem")
    edges = (
        li.groupBy(
            (F.col("l_partkey") + F.lit(1_000_000)).alias("src"),
            F.col("l_suppkey").alias("dst"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("w"))
    )
    return pagerank_weighted_int(edges, n_iter=10).orderBy("node_id")


@register(
    "kmeans_clusters",
    oracle=None,  # iterative fixpoint (like graph_pagerank): rows-only check
    # + numpy-golden unit test (test_kmeans_matches_numpy_lloyd).
    desc="k-means over embeddings: deterministic init, driver fixpoint loop, "
    "narrow-map assignment — per-cluster sizes",
)
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: per iteration the corpus is touched by one narrow map + one
    k·dim-row shuffle; vectors never reach the driver."""
    emb = table(spark, sf_dir, "embeddings")
    cents, _ = S.kmeans_train(emb, "embedding", k=5, max_iter=5)
    return (
        S.kmeans_assign(emb, "embedding", cents)
        .groupBy("cid")
        .agg(F.count("*").alias("n_vecs"))
        .orderBy("cid")
    )


@register(
    "text_repetition",
    oracle=f"""
    WITH {_SQL_SHINGLES}
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           COUNT(DISTINCT shingle) AS n_distinct,
           CAST(COUNT(DISTINCT shingle) AS DOUBLE) / COUNT(*) AS distinct_ratio,
           CAST(COUNT(DISTINCT shingle) AS DOUBLE) / COUNT(*) < 0.6 AS repetitive
    FROM shingled GROUP BY doc_id ORDER BY doc_id
    """,
    desc="Gopher-style repetition filter: distinct/total 3-gram shingle ratio "
    "per document; low ratio flags boilerplate/spam",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signal (the Gopher 'repeated n-gram'
    quality rule). Scale: one shuffle on (doc_id) of shingle rows whose
    count is linear in corpus tokens; the ratio is an exact integer
    division surfaced as double."""
    docs = table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", F.explode(D.word_shingles(F.col("text"))).alias("shingle"))
    ratio = (F.count_distinct("shingle").cast("double") / F.count("*")).alias("distinct_ratio")
    return (
        sh.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count_distinct("shingle").alias("n_distinct"),
            ratio,
            (F.count_distinct("shingle").cast("double") / F.count("*") < 0.6).alias(
                "repetitive"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "text_gopher_rules",
    oracle="""
    WITH t AS (
        SELECT doc_id, text,
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '[ \\t\\n\\f\\r]+'),
                           w -> w <> '') AS tk
        FROM documents),
    m AS (
        SELECT doc_id,
               CAST(LEN(tk) AS BIGINT) AS n_words,
               CASE WHEN LEN(tk) = 0 THEN 0.0
                    ELSE CAST(LIST_SUM(LIST_TRANSFORM(tk, w -> LENGTH(w)))
                              AS DOUBLE) / LEN(tk) END AS mean_word_len,
               CASE WHEN LEN(tk) = 0 THEN 0.0
                    ELSE CAST(LEN(LIST_FILTER(tk,
                              w -> REGEXP_MATCHES(w, '[A-Za-z]')))
                              AS DOUBLE) / LEN(tk) END AS frac_alpha_words,
               CASE WHEN LEN(tk) = 0 THEN 0.0
                    ELSE CAST(LENGTH(text) - LENGTH(REPLACE(text, '#', ''))
                              + (LENGTH(text)
                                 - LENGTH(REPLACE(text, '...', ''))) / 3
                              AS DOUBLE) / LEN(tk) END AS symbol_ratio,
               CAST(LEN(LIST_FILTER(LIST_TRANSFORM(tk, w -> LOWER(w)),
                    w -> w IN ('the','be','to','of','and','that','have','with')))
                    AS BIGINT) AS stopword_hits
        FROM t)
    SELECT doc_id, n_words, mean_word_len, frac_alpha_words, symbol_ratio,
           stopword_hits,
           (n_words BETWEEN 50 AND 100000
            AND mean_word_len BETWEEN 3.0 AND 10.0
            AND symbol_ratio < 0.1
            AND frac_alpha_words >= 0.8
            AND stopword_hits >= 2) AS passes
    FROM m ORDER BY doc_id
    """,
    desc="the Gopher quality-rule battery (Rae 2021 A.1.1): word-count "
    "bounds, mean-word-length bounds, symbol-to-word ratio (# and "
    "ellipsis), alphabetic-word fraction, required-stopword hits, and "
    "the composite pass flag — the standard pre-training curation "
    "filter, all integer counting with IEEE-exact ratio divisions",
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All signals in ONE scan-local projection (zero shuffles, zero
    UDFs): array expressions over whitespace tokens stay inside
    whole-stage codegen, so at 100 TB this is scan-bound. Ratios are
    integer/integer IEEE divisions — exact in both engines."""
    docs = table(spark, sf_dir, "documents")
    tk = TX.tokens(F.col("text"))
    d = docs.select("doc_id", "text", tk.alias("tk"))
    n = F.size("tk")
    sum_len = F.aggregate(
        "tk", F.lit(0).cast("bigint"), lambda a, w: a + F.length(w)
    )
    n_alpha = F.size(F.filter("tk", lambda w: w.rlike("[A-Za-z]")))
    n_sym = (
        F.length("text")
        - F.length(F.replace("text", F.lit("#")))
        + (F.length("text") - F.length(F.replace("text", F.lit("..."))))
        / F.lit(3)
    )
    stop_hits = F.size(
        F.filter(
            F.transform("tk", F.lower),
            lambda w: w.isin("the", "be", "to", "of", "and", "that", "have", "with"),
        )
    ).cast("bigint")
    zero_guard = lambda num: F.when(n == 0, F.lit(0.0)).otherwise(  # noqa: E731
        num.cast("double") / n
    )
    m = d.select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        zero_guard(sum_len).alias("mean_word_len"),
        zero_guard(n_alpha).alias("frac_alpha_words"),
        zero_guard(n_sym).alias("symbol_ratio"),
        stop_hits.alias("stopword_hits"),
    )
    return m.select(
        "*",
        (
            F.col("n_words").between(50, 100000)
            & F.col("mean_word_len").between(3.0, 10.0)
            & (F.col("symbol_ratio") < 0.1)
            & (F.col("frac_alpha_words") >= 0.8)
            & (F.col("stopword_hits") >= 2)
        ).alias("passes"),
    ).orderBy("doc_id")


@register(
    "text_length_band_filter",
    oracle="""
    WITH d AS (SELECT doc_id, source, n_chars FROM documents),
    r AS (SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY n_chars, doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY source) AS n
          FROM d),
    lo AS (SELECT source, MAX(n_chars) AS lo FROM r
           WHERE rn = GREATEST(1, CEIL(0.05 * n)) GROUP BY source),
    hi AS (SELECT source, MAX(n_chars) AS hi FROM r
           WHERE rn = CEIL(0.95 * n) GROUP BY source)
    SELECT d.doc_id, d.source, d.n_chars, lo.lo, hi.hi,
           d.n_chars BETWEEN lo.lo AND hi.hi AS kept
    FROM d JOIN lo USING (source) JOIN hi USING (source)
    ORDER BY doc_id
    """,
    desc="per-source adaptive length filtering: keep documents inside the "
    "source's own [p5, p95] character-length band (discrete rank-based "
    "quantiles — exact integers, no interpolation) — the per-domain "
    "outlier screen web-scale curation applies before global rules, "
    "since a 'short' GitHub README and a 'short' tweet are different",
)
def text_length_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete quantiles by rank: one window sort partitioned by source
    (only (doc_id, source, n_chars) triples move), bounds broadcast back.
    At 100 TB with few sources the per-source sort is the skew risk —
    swap the window for approx_percentile(n_chars, [0.05, 0.95]) per
    source (a map-side-combinable agg) and accept epsilon-rank error;
    kept EXACT here because the oracle demands closed form."""
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w = W.partitionBy("source").orderBy("n_chars", "doc_id")
    wn = W.partitionBy("source")
    r = d.select(
        "*",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    lo = (
        r.filter(F.col("rn") == F.greatest(F.lit(1), F.ceil(0.05 * F.col("n"))))
        .groupBy("source")
        .agg(F.max("n_chars").alias("lo"))
    )
    hi = (
        r.filter(F.col("rn") == F.ceil(0.95 * F.col("n")))
        .groupBy("source")
        .agg(F.max("n_chars").alias("hi"))
    )
    return (
        d.join(F.broadcast(lo), "source")
        .join(F.broadcast(hi), "source")
        .select(
            "doc_id",
            "source",
            "n_chars",
            "lo",
            "hi",
            F.col("n_chars").between(F.col("lo"), F.col("hi")).alias("kept"),
        )
        .orderBy("doc_id")
    )


_BLOCKLIST = ("spark", "merge", "vector")


@register(
    "text_blocklist_filter",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               LIST_FILTER(LIST_TRANSFORM(
                   REGEXP_SPLIT_TO_ARRAY(LOWER(text), '[ \\t\\n\\f\\r]+'),
                   w -> w), w -> w <> '') AS tk
        FROM documents)
    SELECT doc_id,
           CAST(LEN(tk) AS BIGINT) AS n_tokens,
           CAST(LEN(LIST_FILTER(tk, w -> w IN {_BLOCKLIST!r})) AS BIGINT)
             AS n_blocked,
           CASE WHEN LEN(tk) = 0 THEN 0.0
                ELSE CAST(LEN(LIST_FILTER(tk, w -> w IN {_BLOCKLIST!r}))
                          AS DOUBLE) / LEN(tk) END AS blocked_frac,
           (CASE WHEN LEN(tk) = 0 THEN 0.0
                 ELSE CAST(LEN(LIST_FILTER(tk, w -> w IN {_BLOCKLIST!r}))
                           AS DOUBLE) / LEN(tk) END) < 0.10 AS kept
    FROM t ORDER BY doc_id
    """,
    desc="blocklist screening (C4-style badwords filter): per-doc count "
    "and fraction of exact-token blocklist hits plus the keep decision — "
    "the list rides as a literal IN-set (broadcast-free), token matching "
    "is whole-word so substrings never false-positive",
)
def text_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-local, zero shuffles: the blocklist is a literal isin() set
    folded into codegen. At a real 100 TB run the list grows to ~10^3
    terms — still a literal set (Catalyst converts large isin to a hash
    set); beyond that, a broadcast join on exploded tokens."""
    docs = table(spark, sf_dir, "documents")
    ltk = F.filter(
        F.split(F.lower(F.col("text")), TX.WS_RE), lambda t: t != ""
    )
    d = docs.select("doc_id", ltk.alias("tk"))
    n = F.size("tk")
    n_blocked = F.size(F.filter("tk", lambda w: w.isin(*_BLOCKLIST)))
    frac = F.when(n == 0, F.lit(0.0)).otherwise(n_blocked.cast("double") / n)
    return d.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        n_blocked.cast("bigint").alias("n_blocked"),
        frac.alias("blocked_frac"),
        (frac < 0.10).alias("kept"),
    ).orderBy("doc_id")


@register(
    "text_lang_confusion",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
               LEN(LIST_FILTER(lt, w -> w IN ('the','a','of','and','to','in','is'))) AS s_en,
               LEN(LIST_FILTER(lt, w -> w IN ('el','la','de','y','que','los'))) AS s_es,
               LEN(LIST_FILTER(lt, w -> w IN ('le','la','de','et','les','des'))) AS s_fr,
               LEN(LIST_FILTER(lt, w -> w IN ('der','die','das','und','ist','ein'))) AS s_de
        FROM (SELECT doc_id, lang,
                     LIST_TRANSFORM(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'),
                                                w -> w <> ''), w -> LOWER(w)) AS lt
              FROM documents)),
    pred AS (
        SELECT lang,
               CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en >= 1 THEN 'en'
                    WHEN s_es >= s_fr AND s_es >= s_de AND s_es >= 1 THEN 'es'
                    WHEN s_fr >= s_de AND s_fr >= 1 THEN 'fr'
                    WHEN s_de >= 1 THEN 'de'
                    ELSE 'und' END AS pred_lang
        FROM scored)
    SELECT lang, pred_lang, COUNT(*) AS n
    FROM pred GROUP BY lang, pred_lang ORDER BY lang, pred_lang
    """,
    desc="language-ID confusion matrix: tagged vs predicted language counts",
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation as a one-shuffle aggregation (the eval step a
    curation pipeline runs after any heuristic labeler)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("lang", TX.lang_id(F.col("text")).alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "pred_lang")
    )


@register(
    "text_vocab_coverage",
    oracle="""
    WITH words AS (
        SELECT LOWER(w) AS word FROM (
            SELECT UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'),
                                      w -> w <> '')) AS w
            FROM documents)),
    freq AS (SELECT word, COUNT(*) AS n FROM words GROUP BY word),
    ranked AS (
        SELECT word, n, ROW_NUMBER() OVER (ORDER BY n DESC, word) AS rk FROM freq),
    tot AS (SELECT SUM(n) AS total FROM freq)
    SELECT CAST(64 AS BIGINT) AS vocab_size,
           CAST(SUM(n) AS BIGINT) AS covered_tokens,
           CAST((SELECT total FROM tot) AS BIGINT) AS total_tokens,
           CAST(SUM(n) AS DOUBLE) / (SELECT total FROM tot) AS coverage
    FROM ranked WHERE rk <= 64
    """,
    desc="vocabulary coverage: share of corpus tokens covered by the "
    "top-64-word vocabulary (tokenizer sizing signal)",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: word frequency is one partial-agg shuffle; the top-V cut is a
    TakeOrdered (never a global sort); the final scalar join broadcasts."""
    docs = table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.filter(F.split("text", TX.WS_RE), lambda w: w != "")).alias("w")
    ).select(F.lower("w").alias("word"))
    freq = words.groupBy("word").agg(F.count("*").alias("n"))
    total = freq.agg(F.sum("n").alias("total"))
    top = freq.orderBy(F.desc("n"), "word").limit(64)
    return (
        top.agg(F.sum("n").alias("covered_tokens"))
        .crossJoin(F.broadcast(total))
        .select(
            F.lit(64).cast("bigint").alias("vocab_size"),
            F.col("covered_tokens").cast("bigint"),
            F.col("total").cast("bigint").alias("total_tokens"),
            (F.col("covered_tokens").cast("double") / F.col("total")).alias("coverage"),
        )
    )


@register(
    "embedding_outliers",
    oracle="""
    WITH e AS (
        SELECT vec_id, label, CAST(i AS BIGINT) AS pos,
               CAST(ROUND(CAST(v AS DOUBLE) * 1000, 0) AS BIGINT) AS vs
        FROM (SELECT vec_id, label,
                     UNNEST(embedding) AS v,
                     UNNEST(RANGE(0, LEN(embedding))) AS i
              FROM embeddings)),
    stats AS (
        SELECT label, pos, SUM(vs) AS s, COUNT(*) AS c
        FROM e GROUP BY label, pos),
    scored AS (
        SELECT e.vec_id, e.label,
               SUM((st.c * e.vs - st.s) * (st.c * e.vs - st.s)) AS score
        FROM e JOIN stats st ON e.label = st.label AND e.pos = st.pos
        GROUP BY e.vec_id, e.label)
    SELECT vec_id, label, CAST(score AS BIGINT) AS score,
           CAST(rank AS INT) AS rank
    FROM (SELECT vec_id, label, score,
                 ROW_NUMBER() OVER (PARTITION BY label
                                    ORDER BY score DESC, vec_id) AS rank
          FROM scored)
    WHERE rank <= 5
    ORDER BY label, rank
    """,
    desc="embedding outlier screen: top-5 per label by squared distance to "
    "the label centroid — all-integer fixed-point score, exact cross-engine",
)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination/mislabel screen. Scale: centroid sums are a tiny
    aggregate broadcast back; the corpus is scored in a narrow map and only
    the per-label top-k window shuffles (operators/similarity.py
    centroid_outliers)."""
    emb = table(spark, sf_dir, "embeddings")
    return (
        S.centroid_outliers(emb, "vec_id", "label", "embedding", k=5)
        .withColumn("rank", F.col("rank").cast("int"))
        .orderBy("label", "rank")
    )


@register(
    "text_boilerplate",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               UNNEST(CASE WHEN LEN(ws) < 2 THEN [ARRAY_TO_STRING(ws, ' ')]
                      ELSE LIST_TRANSFORM(RANGE(1, LEN(ws)),
                           i -> ws[i] || ' ' || ws[i+1]) END) AS shingle
        FROM (SELECT doc_id,
                     STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')), ' ') AS ws
              FROM documents)),
    bp AS (
        SELECT shingle FROM sh
        GROUP BY shingle
        HAVING COUNT(DISTINCT doc_id) >=
               CEIL(0.02 * (SELECT COUNT(*) FROM documents)))
    SELECT sh.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN bp.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boilerplate,
           CAST(ROUND(CAST(SUM(CASE WHEN bp.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                      / COUNT(*), 4) AS DOUBLE) AS bp_frac
    FROM sh LEFT JOIN bp ON sh.shingle = bp.shingle
    GROUP BY sh.doc_id
    ORDER BY sh.doc_id
    """,
    desc="boilerplate screen: per-doc fraction of word-2-gram instances "
    "whose corpus document-frequency is >= 2% of docs (C4-style filter)",
)
def text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: DF counts shuffle shingle keys only; the qualifying
    (high-DF) set is small by construction and broadcasts; threshold is a
    1-row cross join — one plan, no collect (operators/dedup.py
    boilerplate_stats)."""
    docs = table(spark, sf_dir, "documents")
    return D.boilerplate_stats(docs, shingle_n=2, min_doc_frac=0.02).orderBy("doc_id")


# Closed-form BMP raster dims (synthesize_bmp_payloads): w=2+id%6, h=1+id%5.
_BMP_W = "(2 + doc_id % 6)"
_BMP_H = "(1 + doc_id % 5)"


def _bmp_px_sum_sql(sx: str, sy: str, n: str) -> str:
    """DuckDB closed-form sum of all three channel bytes over `n` pixels,
    sampling source coordinates (sx, sy) as expressions of flat index k —
    mirrors synthesize_bmp_payloads' pixel formula exactly."""
    return f"""CAST(LIST_SUM(LIST_TRANSFORM(RANGE(0, {n}), k ->
          (doc_id + 3 * ({sx}) + 7 * ({sy})) % 256
        + (2 * doc_id + 5 * ({sx}) + ({sy})) % 256
        + (3 * doc_id + ({sx}) + 11 * ({sy})) % 256)) AS BIGINT)"""


@register(
    "multimodal_pixels_real",
    oracle=f"""
    SELECT doc_id,
           CAST({_BMP_W} AS INT) AS width,
           CAST({_BMP_H} AS INT) AS height,
           {_bmp_px_sum_sql(f"k % {_BMP_W}", f"k // {_BMP_W}", f"{_BMP_W} * {_BMP_H}")}
             AS px_sum
    FROM documents ORDER BY doc_id
    """,
    desc="REAL pixel decode: synthesize a 24-bit BMP per doc (closed-form "
    "raster), decode every byte back through the pure-python raster parser "
    "(bottom-up rows, stride padding) and checksum the pixels — the oracle "
    "recomputes the sum from pure arithmetic",
)
def multimodal_pixels_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators.multimodal import (
        pixel_stats,
        synthesize_bmp_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return pixel_stats(synthesize_bmp_payloads(docs)).orderBy("doc_id")


@register(
    "multimodal_resize_real",
    oracle=f"""
    SELECT doc_id,
           CAST(3 AS INT) AS width,
           CAST(2 AS INT) AS height,
           {_bmp_px_sum_sql(f"((k % 3) * {_BMP_W}) // 3",
                            f"((k // 3) * {_BMP_H}) // 2", "6")}
             AS px_sum
    FROM documents ORDER BY doc_id
    """,
    desc="REAL resize: nearest-neighbor resample of real BMP rasters to "
    "3x2 re-encoded as real BMP bytes, decoded back and checksummed; the "
    "oracle replays the source-index arithmetic ((dst*src)//dst_extent) "
    "channel by channel",
)
def multimodal_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators.multimodal import (
        PixelDecoder,
        pixel_stats,
        resize_images,
        synthesize_bmp_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    resized = resize_images(
        synthesize_bmp_payloads(docs), width=3, height=2, decoder=PixelDecoder()
    )
    return pixel_stats(resized).orderBy("doc_id")


@register(
    "multimodal_audio_samples_real",
    oracle="""
    WITH p AS (
        SELECT doc_id,
               4 * (1 + doc_id % 2) AS n,
               CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 100 ELSE 1000 END AS scale,
               LIST_TRANSFORM(RANGE(0, 4 * (1 + doc_id % 2)),
                              k -> (7 * doc_id + 13 * k) % 200 - 100) AS vals
        FROM documents)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(scale * LIST_SUM(vals) AS BIGINT) AS sample_sum,
           CAST(scale * LIST_MIN(vals) AS BIGINT) AS sample_min,
           CAST(scale * LIST_MAX(vals) AS BIGINT) AS sample_max
    FROM p ORDER BY doc_id
    """,
    desc="REAL PCM decode: WAV payloads carry closed-form 8/16/24-bit "
    "samples; the sample-level parser (signed widths, data-chunk walk) "
    "must reproduce the arithmetic sequence exactly",
)
def multimodal_audio_samples_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators.multimodal import (
        audio_sample_stats,
        synthesize_wav_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return audio_sample_stats(synthesize_wav_payloads(docs)).orderBy("doc_id")


@register(
    "graph_triangle_count",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
    SELECT (SELECT COUNT(*) FROM (SELECT u AS n FROM edges
                                  UNION SELECT v FROM edges)) AS n_nodes,
           (SELECT COUNT(*) FROM edges) AS n_edges,
           (SELECT COUNT(*) FROM edges e1
            JOIN edges e2 ON e2.u = e1.u AND e2.v > e1.v
            JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v) AS n_triangles
    """,
    desc="exact triangle count over the co-purchase graph via the "
    "degree-ordered node-iterator (oriented wedges + closing-edge "
    "semi-join); the oracle counts by brute 3-way join",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: low→high (degree, id) orientation bounds wedge fan-out by
    O(m^1.5) regardless of skew — the brute 3-way join the oracle runs
    would melt at 100 TB, the oriented plan would not
    (operators/graph.py triangle_count)."""
    from gearpump_spark.operators.graph import triangle_count

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
    return triangle_count(edges)


@register(
    "graph_triangle_estimate",
    oracle=f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    kept AS (
        SELECT u, v FROM edges
        WHERE {_SQL_H15.format(seed="'7'", key="(u || ',' || v)")} % 10000 < 2000),
    st AS (
        SELECT COUNT(*) AS n_sampled_triangles FROM kept e1
        JOIN kept e2 ON e2.u = e1.u AND e2.v > e1.v
        JOIN kept e3 ON e3.u = e1.v AND e3.v = e2.v)
    SELECT (SELECT COUNT(*) FROM (SELECT u AS n FROM edges
                                  UNION SELECT v FROM edges)) AS n_nodes,
           (SELECT COUNT(*) FROM edges) AS n_edges,
           (SELECT COUNT(*) FROM kept) AS n_sampled_edges,
           (SELECT n_sampled_triangles FROM st) AS n_sampled_triangles,
           (SELECT CAST(n_sampled_triangles * 125.0 AS DOUBLE) FROM st)
             AS est_triangles
    """,
    desc="DOULION sampled triangle estimate (KDD 2009): seeded-md5 edge "
    "sampling at p=0.2, exact count on the sparsified graph, 1/p^3 "
    "unbiasing — the near-linear 100 TB variant of the exact "
    "degree-ordered count; deterministic sampling makes even the "
    "sampled subcount hash-checkable against DuckDB",
)
def graph_triangle_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: wedge work drops by ~p^2 (closing join by p^3) vs the exact
    path while the estimator concentrates for triangle counts >> 1/p^3
    (operators/graph.py triangle_count_estimate)."""
    from gearpump_spark.operators.graph import triangle_count_estimate

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
    return triangle_count_estimate(edges, p_bp=2000, seed=7)


# ---------------------------------------------------------------------------
# Chunking / incremental dedup / document frequency (r2 additions)
# ---------------------------------------------------------------------------


@register(
    "text_chunk_windows",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), w -> w <> '') AS tk
        FROM documents),
    st AS (
        SELECT doc_id, tk, UNNEST(GENERATE_SERIES(0, LEN(tk) - 1, 24)) AS start
        FROM toks WHERE LEN(tk) > 0)
    SELECT doc_id,
           CAST(start // 24 AS BIGINT) AS chunk_idx,
           CAST(start AS BIGINT) AS tok_start,
           CAST(LEN(tk[start + 1 : start + 32]) AS BIGINT) AS n_tokens,
           ARRAY_TO_STRING(tk[start + 1 : start + 32], ' ') AS chunk_text
    FROM st
    WHERE start = 0 OR LEN(tk) > start + 8
    ORDER BY doc_id, chunk_idx
    """,
    desc="overlapping token-window chunking (size 32, stride 24) for "
    "context construction — pure narrow map, zero shuffles",
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators import chunking as CH

    docs = table(spark, sf_dir, "documents")
    return CH.chunk_by_tokens(docs, size=32, stride=24).orderBy("doc_id", "chunk_idx")


_SQL_SNAP = "(" + _SQL_H15.format(seed="'7'", key="doc_id") + " % 10000) < 8000"


@register(
    "dedup_incremental",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id,
               MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS fp,
               {_SQL_SNAP} AS in_snap
        FROM documents),
    keep AS (SELECT fp, MIN(doc_id) AS doc_id FROM fp WHERE NOT in_snap GROUP BY fp)
    SELECT doc_id, fp FROM keep
    WHERE fp NOT IN (SELECT fp FROM fp WHERE in_snap)
    ORDER BY doc_id
    """,
    desc="incremental crawl dedup: new batch (hash-stable 20%) exact-deduped "
    "within itself then anti-joined against the snapshot fingerprint index",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    bucket = SP.hash_bucket(F.col("doc_id"), seed=7)
    snapshot = docs.where(bucket < 8000)
    batch = docs.where(~(bucket < 8000))
    return D.incremental_dedup(batch, snapshot).orderBy("doc_id")


@register(
    "text_doc_freq",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), w -> w <> '') AS tk
        FROM documents),
    dw AS (SELECT DISTINCT doc_id, UNNEST(LIST_TRANSFORM(tk, w -> LOWER(w))) AS word
           FROM toks),
    dfc AS (SELECT word, COUNT(*) AS df_count FROM dw GROUP BY word),
    tot AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT word, CAST(df_count AS BIGINT) AS df_count,
           CAST(df_count AS DOUBLE) / CAST(n_docs AS DOUBLE) AS df_frac
    FROM dfc, tot
    WHERE CAST(df_count AS DOUBLE) / CAST(n_docs AS DOUBLE) >= 0.2
    ORDER BY df_count DESC, word
    """,
    desc="corpus stopword discovery: document frequency of lowercased "
    "tokens, words present in >= 20% of documents",
)
def text_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    dw = docs.select(
        F.explode(
            F.array_distinct(F.transform(TX.tokens(F.col("text")), F.lower))
        ).alias("word")
    )
    dfc = dw.groupBy("word").agg(F.count("*").cast("long").alias("df_count"))
    tot = docs.agg(F.count("*").alias("n_docs"))
    frac = F.col("df_count").cast("double") / F.col("n_docs").cast("double")
    return (
        dfc.crossJoin(F.broadcast(tot))
        .withColumn("df_frac", frac)
        .where(F.col("df_frac") >= 0.2)
        .select("word", "df_count", "df_frac")
        .orderBy(F.desc("df_count"), "word")
    )


@register(
    "text_tfidf_topterms",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               LIST_TRANSFORM(
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), w -> w <> ''),
                   w -> LOWER(w)) AS tk
        FROM documents),
    tf AS (SELECT doc_id, UNNEST(tk) AS word FROM toks),
    tfc AS (SELECT doc_id, word, COUNT(*) AS tf FROM tf GROUP BY doc_id, word),
    dfc AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY word),
    tot AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT t.doc_id, t.word, CAST(t.tf AS BIGINT) AS tf,
               CAST(d.df AS BIGINT) AS df,
               CAST(t.tf * n_docs AS DOUBLE) / CAST(d.df AS DOUBLE) AS score
        FROM tfc t JOIN dfc d USING (word), tot),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, word) AS rn
        FROM scored)
    SELECT doc_id, word, tf, df, score FROM ranked WHERE rn <= 3
    ORDER BY doc_id, score DESC, word
    """,
    desc="per-document top-3 terms by tf-idf (idf as exact rational N/df — "
    "no ln, so scores are IEEE-identical across engines)",
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction over the corpus. Shuffle budget: one on
    (doc_id, word) for tf, one on word for df, the df→tf join re-uses the
    word shuffle, one on doc_id for the per-doc top-k window — all keyed,
    no broadcast of the vocabulary (at 100 TB the vocab is itself huge)."""
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    # The token relation feeds the tf AND df aggregates, so the shared-
    # relation checkpoint looked indicated — but BOTH variants measured
    # SLOWER at sf0.1 (exploded one-row-per-token 0.86x, compact array
    # form 0.83x vs the plain shape, 3-run best-of paired A/B): each
    # consumer is an immediate fused explode→partial-agg over the scan,
    # so the duplicated regex tokenize costs less than writing and
    # re-reading the materialized blocks. Deliberately left lazy.
    words = docs.select(
        "doc_id",
        F.explode(F.transform(TX.tokens(F.col("text")), F.lower)).alias("word"),
    )
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_ = words.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    tot = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "word")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "word",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df").cast("double")).alias(
                "score"
            ),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), "word")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 3)
        .drop("_rn")
        .orderBy("doc_id", F.desc("score"), "word")
    )


@register(
    "text_bm25_topk",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               LIST_TRANSFORM(
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), w -> w <> ''),
                   w -> LOWER(w)) AS tk
        FROM documents),
    dl AS (SELECT doc_id, CAST(LEN(tk) AS BIGINT) AS dl FROM toks),
    words AS (SELECT doc_id, UNNEST(tk) AS word FROM toks),
    qw AS (SELECT doc_id, word FROM words
           WHERE word IN ('vector', 'merge', 'stream')),
    tfc AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
            FROM qw GROUP BY doc_id, word),
    dfc AS (SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
            FROM qw GROUP BY word),
    tot AS (SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n,
                   CAST((SELECT SUM(LEN(tk)) FROM toks) AS BIGINT) AS t),
    terms AS (
        SELECT f.doc_id, f.word,
               (22.0 * f.tf * t * (2 * n - 2 * d.df + 1)) /
               ((10.0 * f.tf * t + 3.0 * t + 9.0 * l.dl * n) * (2 * d.df + 1)) AS s
        FROM tfc f JOIN dfc d USING (word) JOIN dl l USING (doc_id), tot),
    pivoted AS (
        SELECT doc_id,
               COALESCE(MAX(CASE WHEN word = 'vector' THEN s END), 0.0)
             + COALESCE(MAX(CASE WHEN word = 'merge' THEN s END), 0.0)
             + COALESCE(MAX(CASE WHEN word = 'stream' THEN s END), 0.0) AS score
        FROM terms GROUP BY doc_id)
    SELECT doc_id, score FROM pivoted
    ORDER BY score DESC, doc_id LIMIT 10
    """,
    desc="BM25 retrieval top-10 for the query 'vector merge stream' "
    "(k1=1.2, b=0.75; rational Robertson idf (N-df+0.5)/(df+0.5) — no ln, "
    "so the integer-scaled score (22·tf·T·(2N-2df+1)) / "
    "((10·tf·T+3T+9·dl·N)·(2df+1)) is IEEE-identical across engines; "
    "per-term scores summed in fixed pivot order)",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-text BM25 retrieval. Scale design: tokens are filtered to the
    query terms BEFORE any shuffle (the tf aggregate carries only matching
    (doc_id, word) rows); df for a few terms is a broadcast; doc lengths
    join on doc_id (narrow 2-column shuffle); corpus totals are a 1-row
    broadcast; top-10 compiles to TakeOrderedAndProject. The per-term
    score sum pivots to a fixed syntactic order because IEEE addition is
    not associative — a SUM() over an unordered group would be
    partition-order-dependent. The same scorer also runs against a
    persistent inverted index (operators/retrieval.text_index_write /
    bm25_topk_from_index) with identical results — pinned in
    tests/test_plan_quality.py."""
    from gearpump_spark.operators.retrieval import bm25_topk

    docs = table(spark, sf_dir, "documents")
    return bm25_topk(docs, ("vector", "merge", "stream"), k=10)


@register(
    "text_bm25_topk_and",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               LIST_TRANSFORM(
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), w -> w <> ''),
                   w -> LOWER(w)) AS tk
        FROM documents),
    dl AS (SELECT doc_id, CAST(LEN(tk) AS BIGINT) AS dl FROM toks),
    words AS (SELECT doc_id, UNNEST(tk) AS word FROM toks),
    qw AS (SELECT doc_id, word FROM words
           WHERE word IN ('vector', 'merge', 'stream')),
    tfc AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
            FROM qw GROUP BY doc_id, word),
    dfc AS (SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
            FROM qw GROUP BY word),
    tot AS (SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n,
                   CAST((SELECT SUM(LEN(tk)) FROM toks) AS BIGINT) AS t),
    terms AS (
        SELECT f.doc_id, f.word,
               (22.0 * f.tf * t * (2 * n - 2 * d.df + 1)) /
               ((10.0 * f.tf * t + 3.0 * t + 9.0 * l.dl * n) * (2 * d.df + 1)) AS s
        FROM tfc f JOIN dfc d USING (word) JOIN dl l USING (doc_id), tot),
    pivoted AS (
        SELECT doc_id,
               COALESCE(MAX(CASE WHEN word = 'vector' THEN s END), 0.0)
             + COALESCE(MAX(CASE WHEN word = 'merge' THEN s END), 0.0)
             + COALESCE(MAX(CASE WHEN word = 'stream' THEN s END), 0.0) AS score
        FROM terms GROUP BY doc_id
        HAVING COUNT(*) = 3)
    SELECT doc_id, score FROM pivoted
    ORDER BY score DESC, doc_id LIMIT 10
    """,
    desc="conjunctive (boolean AND) BM25: only documents containing EVERY "
    "query term rank — the matched-term count rides the same pivot "
    "aggregate (no extra join); same engine-exact scorer as text_bm25_topk",
)
def text_bm25_topk_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators.retrieval import bm25_topk

    docs = table(spark, sf_dir, "documents")
    return bm25_topk(docs, ("vector", "merge", "stream"), k=10, require_all=True)


@register(
    "text_phrase_match",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               LIST_TRANSFORM(
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\s+'), w -> w <> ''),
                   w -> LOWER(w)) AS tk
        FROM documents),
    pos AS (
        SELECT doc_id, tk[i + 1] AS word, i AS pos
        FROM toks, UNNEST(RANGE(0, LEN(tk))) AS u(i)),
    a AS (SELECT doc_id, pos AS p0 FROM pos WHERE word = 'merge'),
    b AS (SELECT doc_id, pos - 1 AS p0 FROM pos WHERE word = 'stream'),
    m AS (SELECT a.doc_id, a.p0 FROM a JOIN b USING (doc_id, p0))
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM m GROUP BY doc_id ORDER BY doc_id
    """,
    desc="exact phrase search 'merge stream' via positional postings: "
    "term k joins at anchor position + k (the classic positional-index "
    "algorithm) — only the phrase terms' positions ever shuffle; also "
    "runs against a persistent positional inverted index with identical "
    "results (operators/retrieval.positional_index_write)",
)
def text_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators.retrieval import phrase_match

    docs = table(spark, sf_dir, "documents")
    return phrase_match(docs, ("merge", "stream"))


def _bpe_train_blocks(
    n_merges: int, min_freq: int, byte_level: bool = False
) -> "list[str]":
    """The unrolled BPE-trainer CTE chain shared by _bpe_exact_oracle and
    _bpe_greedy_oracle: bpe_words, v0, then per round k the pair counts
    p{k}, the 0-or-1-row argmax b{k}, and the rewritten vocab v{k+1}.
    byte_level mirrors bpe_train_bytes: case-PRESERVED word types whose
    base symbols are the uppercase hex byte pairs of the word's UTF-8
    encoding (HEX(ENCODE(w)) in DuckDB == F.hex(F.encode(w)) in Spark),
    instead of lowercased character symbols."""
    U = "chr(31)"
    word_expr = "w" if byte_level else "LOWER(w)"
    base_expr = (
        f"regexp_replace(HEX(ENCODE(word)), '(..)', {U} || '\\1' || {U}, 'g')"
        if byte_level
        else f"regexp_replace(word, '(.)', {U} || '\\1' || {U}, 'g')"
    )
    blocks = [
        f"""
    bpe_words AS MATERIALIZED (
      SELECT doc_id, {word_expr} AS word
      FROM documents,
           UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'),
                              x -> x <> '')) AS t(w)),
    v0 AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
             {base_expr} AS s
      FROM bpe_words GROUP BY word)"""
    ]
    for k in range(n_merges):
        blocks.append(
            f""",
    p{k} AS MATERIALIZED (
      SELECT pr[1] AS l, pr[2] AS r, SUM(cnt) AS freq
      FROM (SELECT cnt, UNNEST(list_zip(lst, lst[2:])) AS pr
            FROM (SELECT cnt,
                         string_split(trim(s, {U}), {U} || {U}) AS lst
                  FROM v{k}))
      WHERE pr[2] IS NOT NULL
      GROUP BY 1, 2),
    b{k} AS MATERIALIZED (
      SELECT l, r FROM p{k} WHERE freq >= {min_freq}
      ORDER BY freq DESC, l, r LIMIT 1),
    v{k + 1} AS MATERIALIZED (
      SELECT word, cnt,
             CASE WHEN b.l IS NULL THEN v.s
                  ELSE replace(v.s, {U} || b.l || {U} || {U} || b.r || {U},
                               {U} || b.l || b.r || {U}) END AS s
      FROM v{k} v LEFT JOIN b{k} b ON TRUE)"""
        )
    return blocks


BPE_ORACLE_N_APPLY = 48  # unrolled greedy steps; queries GUARD word length


def _bpe_greedy_oracle(
    n_merges: int = 16,
    min_freq: int = 2,
    n_apply: int = BPE_ORACLE_N_APPLY,
    byte_level: bool = False,
) -> str:
    """Unrolled mirror of the GREEDY BEST-RANK BPE encoder
    (operators/bpe.py _apply_merges — the real-world tokenizer API for
    unseen text, rows-only until r8): first the shared trainer chain
    derives the ranked merges b0..b{k}, then every word TYPE runs
    n_apply unrolled steps of "merge the minimum-(rank, index) adjacent
    pair" over a symbol LIST — the rank lookup is a MAP column
    (MAP_FROM_ENTRIES over the b{k} rows) probed inside a list lambda,
    the splice is list slicing, and a step with no rankable pair is a
    pass-through (so extra steps are no-ops, exactly the while-loop's
    exit). pick = rank*100000 + index reproduces min((rank, i)) as long
    as words stay under 100k symbols. A word can need up to len(word)-1
    merges (repetitive words chain the same merge), so the QUERIES guard
    max token length <= n_apply + 1 and raise rather than let the
    unrolled oracle silently truncate where the Spark encoder runs to
    fixpoint (the r8 self-audit's ADVICE-class find; corpora with longer
    tokens need a bigger n_apply) (greedy differs from the
    trainer's sequential-exhaustive segmentation — text_bpe_exact — on
    words where a later merge's output feeds an earlier-ranked pair,
    which is why this needed its own unroll instead of reusing v16)."""
    U = "chr(31)"
    blocks = _bpe_train_blocks(n_merges, min_freq, byte_level)
    merge_rows = " UNION ALL ".join(
        f"SELECT l, r, {k} AS rk FROM b{k}" for k in range(n_merges)
    )
    g0_expr = (
        "LIST_TRANSFORM(RANGE(1, LEN(HEX(ENCODE(word))) // 2 + 1),"
        " i -> SUBSTR(HEX(ENCODE(word)), CAST(2 * i - 1 AS INT), 2))"
        if byte_level
        else "LIST_TRANSFORM(RANGE(1, LEN(word) + 1),"
        " i -> SUBSTR(word, CAST(i AS INT), 1))"
    )
    blocks.append(
        f""",
    mp AS MATERIALIZED (
      SELECT MAP_FROM_ENTRIES(LIST((l || {U} || r, rk))) AS m
      FROM ({merge_rows})),
    wt AS MATERIALIZED (SELECT DISTINCT word FROM bpe_words),
    g0 AS MATERIALIZED (
      SELECT word, {g0_expr} AS syms
      FROM wt)"""
    )
    pick_expr = (
        "LIST_MIN(LIST_FILTER(LIST_TRANSFORM(RANGE(1, LEN(syms)), i -> "
        f"CASE WHEN ELEMENT_AT(m, syms[CAST(i AS INT)] || {U} || "
        "syms[CAST(i AS INT) + 1])[1] IS NOT NULL THEN "
        f"ELEMENT_AT(m, syms[CAST(i AS INT)] || {U} || "
        "syms[CAST(i AS INT) + 1])[1] * 100000 + i END), "
        "x -> x IS NOT NULL))"
    )
    for t in range(n_apply):
        blocks.append(
            f""",
    g{t + 1} AS MATERIALIZED (
      SELECT word,
             CASE WHEN pick IS NULL THEN syms
                  ELSE syms[1:CAST(pick % 100000 AS INT) - 1]
                       || [syms[CAST(pick % 100000 AS INT)]
                           || syms[CAST(pick % 100000 AS INT) + 1]]
                       || syms[CAST(pick % 100000 AS INT) + 2:LEN(syms)]
             END AS syms
      FROM (SELECT word, syms, {pick_expr} AS pick FROM g{t}, mp))"""
        )
    return (
        "WITH"
        + "".join(blocks)
        + f""",
    gsizes AS MATERIALIZED (
      SELECT word, CAST(LEN(syms) AS BIGINT) AS n_syms FROM g{n_apply}),
    agg AS (
      SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_ws,
             CAST(SUM(n_syms) AS BIGINT) AS n_bpe
      FROM bpe_words w JOIN gsizes USING (word) GROUP BY w.doc_id)
    SELECT d.doc_id,
           COALESCE(a.n_ws, 0) AS n_ws_tokens,
           COALESCE(a.n_bpe, 0) AS n_bpe_tokens
    FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id"""
    )


def _guard_bpe_token_length(docs, chars: bool) -> None:
    """The greedy encoder applies up to len(word)-1 merges; the unrolled
    oracle applies exactly BPE_ORACLE_N_APPLY. Enforce the sufficient
    bound (max token length <= n_apply + 1) LOUDLY instead of letting a
    long repetitive token make Spark run to fixpoint while the oracle
    silently truncates — one tiny agg, the r7 weight-validation
    discipline applied to an oracle parameter. ``chars`` picks the
    symbol count: characters (char-level) or UTF-8 octets (byte-level).
    Measured on the LOWERED token (ADVICE r8 #1): the trainer/encoder
    lowercase before segmenting, and lowercase-expanding codepoints
    (U+0130 'İ' -> 'i̇', 1 char -> 2, 2 octets -> 3) would otherwise let
    a token pass the guard yet exceed the oracle's unroll depth.
    """
    w = F.explode(TX.tokens(F.col("text"))).alias("w")
    low = F.lower("w")
    length = F.length(low) if chars else F.octet_length(low)
    mx = docs.select(w).agg(F.max(length).alias("mx")).collect()[0].mx or 0
    if mx - 1 > BPE_ORACLE_N_APPLY:
        raise ValueError(
            f"corpus has a token of {mx} symbols; the unrolled greedy "
            f"oracle applies at most {BPE_ORACLE_N_APPLY} merges per word "
            "— raise n_apply in _bpe_greedy_oracle or pre-truncate tokens"
        )


@register(
    "text_bpe_tokens",
    oracle=_bpe_greedy_oracle(),
    desc="REAL BPE (Sennrich 2016): train a 16-merge table over word-type "
    "counts (one corpus shuffle; per-iteration pair aggregation over the "
    "distributed vocabulary, driver sees 1 row/round), then tokenize via "
    "an Arrow-batched greedy encoder with a Zipf-friendly word cache — "
    "upgrades the regex BPE-ish pre-segmentation to the actual algorithm; "
    "ORACLE-BACKED as of r8 (the r1-r7 'rank-priority loop is not "
    "SQL-expressible' claim fell to a MAP-probed list-splice unroll: "
    "trainer chain -> rank map -> BPE_ORACLE_N_APPLY unrolled "
    "min-(rank,index) merge steps per word type), shrinking the "
    "rows-only cohort to 8; still "
    "pinned against the pure-python golden in tests/test_bpe.py",
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-corpus BPE compression stats per document. Deterministic:
    tie-breaks are total (freq DESC, pair lexicographic), so the merge
    table — and therefore every count — is engine-reproducible."""
    from gearpump_spark.operators.bpe import bpe_tokenize, bpe_train

    docs = table(spark, sf_dir, "documents")
    _guard_bpe_token_length(docs, chars=True)
    merges = bpe_train(docs, n_merges=16)
    return (
        bpe_tokenize(docs, merges)
        .select("doc_id", "n_ws_tokens", "n_bpe_tokens")
        .orderBy("doc_id")
    )


@register(
    "text_bpe_bytes",
    oracle=_bpe_greedy_oracle(byte_level=True),
    desc="BYTE-level BPE (the GPT-2 family setup): 256-byte UTF-8 "
    "alphabet as hex-pair symbols, so any string — accents, CJK, emoji — "
    "tokenizes with zero OOV and tokens spell their exact byte runs "
    "(lossless round-trip pinned in tests/test_bpe.py against a "
    "pure-python golden); same one-job-per-merge trainer cost model; "
    "ORACLE-BACKED as of r8 via the byte-level variant of the greedy "
    "MAP-probed list-splice unroll (hex-pair base symbols, case "
    "preserved) — rows-only cohort down to 7",
)
def text_bpe_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level BPE compression stats per document (case-preserving;
    merge table deterministic via total tie-breaks)."""
    from gearpump_spark.operators.bpe import bpe_tokenize_bytes, bpe_train_bytes

    docs = table(spark, sf_dir, "documents")
    _guard_bpe_token_length(docs, chars=False)
    merges = bpe_train_bytes(docs, n_merges=16)
    return (
        bpe_tokenize_bytes(docs, merges)
        .select("doc_id", "n_ws_tokens", "n_bpe_tokens")
        .orderBy("doc_id")
    )


WP_ORACLE_N_STEPS = BPE_ORACLE_N_APPLY + 1  # 1 char/step worst case


def _wordpiece_oracle(
    n_merges: int = 16,
    min_freq: int = 2,
    n_steps: int = WP_ORACLE_N_STEPS,
) -> str:
    """Unrolled mirror of the MAXIMAL-MUNCH WordPiece encoder
    (operators/bpe.py wordpiece_encode_word): the shared BPE trainer
    chain builds the vocabulary (corpus characters + merge products as a
    membership MAP), then every word TYPE runs n_steps unrolled rounds
    of 'consume the longest vocab prefix of the unconsumed suffix' —
    the prefix probe is LIST_MAX over a LIST_FILTER of candidate
    lengths, each probed against the MAP column; a round that finds no
    match consumes 1 (the UNK path) and a fully-consumed word is a
    pass-through, so extra rounds are no-ops. Worst case is one
    character per round, hence n_steps = max guarded token length
    (the queries reuse _guard_bpe_token_length)."""
    blocks = _bpe_train_blocks(n_merges, min_freq, byte_level=False)
    merge_rows = " UNION ALL ".join(
        f"SELECT l || r AS p FROM b{k}" for k in range(n_merges)
    )
    blocks.append(
        f""",
    wt AS MATERIALIZED (SELECT DISTINCT word FROM bpe_words),
    vm AS MATERIALIZED (
      SELECT MAP_FROM_ENTRIES(LIST((p, 1))) AS m FROM (
        SELECT DISTINCT p FROM (
          SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(word) + 1),
                        i -> SUBSTR(word, CAST(i AS INT), 1))) AS p
          FROM wt
          UNION ALL
          {merge_rows}))),
    s0 AS MATERIALIZED (SELECT word, 1 AS pos, 0 AS n FROM wt)"""
    )
    probe = (
        "LIST_MAX(LIST_FILTER(RANGE(1, LEN(word) - pos + 2), j -> "
        "ELEMENT_AT(m, SUBSTR(word, CAST(pos AS INT), CAST(j AS INT)))[1]"
        " IS NOT NULL))"
    )
    for t in range(n_steps):
        blocks.append(
            f""",
    s{t + 1} AS MATERIALIZED (
      SELECT word,
             CASE WHEN pos > LEN(word) THEN pos
                  ELSE pos + COALESCE(best, 1) END AS pos,
             CASE WHEN pos > LEN(word) THEN n ELSE n + 1 END AS n
      FROM (SELECT word, pos, n, {probe} AS best FROM s{t}, vm))"""
        )
    return (
        "WITH"
        + "".join(blocks)
        + f""",
    gsz AS MATERIALIZED (
      SELECT word, CAST(n AS BIGINT) AS n_wp FROM s{n_steps}),
    agg AS (
      SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_ws,
             CAST(SUM(n_wp) AS BIGINT) AS n_wp
      FROM bpe_words w JOIN gsz USING (word) GROUP BY w.doc_id)
    SELECT d.doc_id,
           COALESCE(a.n_ws, 0) AS n_ws_tokens,
           COALESCE(a.n_wp, 0) AS n_wp_tokens
    FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id"""
    )


@register(
    "text_wordpiece_tokens",
    oracle=_wordpiece_oracle(),
    desc="WordPiece-style MAXIMAL-MUNCH tokenizer (the BERT-family "
    "encode loop: longest vocabulary prefix wins, single-char UNK "
    "fallback) over the BPE-trained vocabulary (corpus characters + "
    "merge products — the standard trained-vocab/greedy-encode "
    "assembly), completing the tokenizer triad next to the char- and "
    "byte-level greedy-BPE encoders; oracle-backed from birth via a "
    "MAP-probed longest-prefix unroll (one round per consumed position, "
    "depth = the guarded max token length)",
)
def text_wordpiece_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document whitespace vs WordPiece token counts. Scale: the
    vocabulary is alphabet + n_merges bounded (collected once, rides
    into the Arrow map's closure); encoding is the same narrow
    mapInPandas + Zipf word cache as BPE — text never shuffles; the
    trainer is bpe_train's one-argmax-row-per-merge loop."""
    from gearpump_spark.operators.bpe import wordpiece_tokenize, wordpiece_vocab

    docs = table(spark, sf_dir, "documents")
    _guard_bpe_token_length(docs, chars=True)
    vocab = wordpiece_vocab(docs, n_merges=16)
    return (
        wordpiece_tokenize(docs, vocab)
        .select("doc_id", "n_ws_tokens", "n_wp_tokens")
        .orderBy("doc_id")
    )


def _unigram_oracle(
    n_merges: int = 16,
    min_freq: int = 2,
    n_steps: int = WP_ORACLE_N_STEPS,
) -> str:
    """Unrolled mirror of the UNIGRAM-LM VITERBI segmenter
    (operators/bpe.py unigram_encode_word): the shared BPE trainer chain
    seeds the piece inventory (corpus alphabet with weighted char counts
    + each merge product with its selection-time pair frequency, summed
    on string collision), scores become integer micro-ln-units
    s(p) = ROUND(LN f,6)·1e6 − ROUND(LN Σf,6)·1e6 (LN args integral),
    and every word TYPE runs n_steps unrolled DP rounds — one per
    character position, the r9 verdict's 'best-segmentation-so-far per
    position unrolls the same way' — carrying the whole Viterbi table as
    ONE LIST<BIGINT> column of packed keys (score·1024 − n_pieces, see
    UNIGRAM_TIE_BASE): round t appends
    max_j ks[t−j] + s(word[t−j+1 .. t])·1024 − 1 over vocab pieces
    probed in a MAP column; positions past the word are pass-throughs.
    The packed key makes max-score/min-pieces ONE integer max, so
    LIST_MAX decides ties identically in both engines."""
    blocks = _bpe_train_blocks(n_merges, min_freq, byte_level=False)
    merge_rows = " UNION ALL ".join(
        f"SELECT b.l || b.r AS p, pk.freq AS f FROM b{k} b "
        f"JOIN p{k} pk ON pk.l = b.l AND pk.r = b.r"
        for k in range(n_merges)
    )
    lnm = (
        "CAST(CAST(ROUND(LN(CAST({x} AS DOUBLE)), 6) AS DECIMAL(18,6))"
        " * 1000000 AS BIGINT)"
    )
    blocks.append(
        f""",
    cc AS (
      SELECT c AS p, SUM(cnt) AS f FROM (
        SELECT cnt, UNNEST(LIST_TRANSFORM(RANGE(1, LEN(word) + 1),
                    i -> SUBSTR(word, CAST(i AS INT), 1))) AS c
        FROM v0) GROUP BY 1),
    pc AS MATERIALIZED (
      SELECT p, CAST(SUM(f) AS BIGINT) AS f
      FROM (SELECT p, f FROM cc UNION ALL {merge_rows}) GROUP BY p),
    ptot AS (SELECT CAST(SUM(f) AS BIGINT) AS tot FROM pc),
    vm AS MATERIALIZED (
      SELECT MAP_FROM_ENTRIES(LIST((p, s))) AS m FROM (
        SELECT p, {lnm.format(x='f')} - {lnm.format(x='t.tot')} AS s
        FROM pc CROSS JOIN ptot t)),
    wt AS MATERIALIZED (SELECT DISTINCT word FROM bpe_words),
    s0 AS MATERIALIZED (SELECT word, [CAST(0 AS BIGINT)] AS ks FROM wt)"""
    )
    probe = (
        "ELEMENT_AT(m, SUBSTR(word, CAST({t} - j + 1 AS INT),"
        " CAST(j AS INT)))[1]"
    )
    for t in range(1, n_steps + 1):
        pr = probe.format(t=t)
        blocks.append(
            f""",
    s{t} AS MATERIALIZED (
      SELECT word,
             CASE WHEN {t} > LEN(word) THEN ks
                  ELSE LIST_APPEND(ks, cand) END AS ks
      FROM (SELECT word, ks,
                   LIST_MAX(LIST_FILTER(LIST_TRANSFORM(RANGE(1, {t} + 1),
                     j -> CASE WHEN {pr} IS NOT NULL
                               THEN ks[CAST({t} - j + 1 AS INT)]
                                    + {pr} * 1024 - 1 END),
                     x -> x IS NOT NULL)) AS cand
            FROM s{t - 1}, vm))"""
        )
    return (
        "WITH"
        + "".join(blocks)
        + f""",
    gsz AS MATERIALIZED (
      SELECT word,
             CAST((0 - ks[CAST(LEN(word) + 1 AS INT)]) % 1024 AS BIGINT)
               AS n_sp,
             0 - ((0 - ks[CAST(LEN(word) + 1 AS INT)]) // 1024) AS sc
      FROM s{n_steps}),
    agg AS (
      SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_ws,
             CAST(SUM(n_sp) AS BIGINT) AS n_sp,
             CAST(SUM(sc) AS BIGINT) AS lp
      FROM bpe_words w JOIN gsz USING (word) GROUP BY w.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(a.n_ws, 0) AS BIGINT) AS n_ws_tokens,
           CAST(COALESCE(a.n_sp, 0) AS BIGINT) AS n_sp_tokens,
           CAST(COALESCE(a.lp, 0) AS BIGINT) AS logprob_micro
    FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id"""
    )


@register(
    "text_sentencepiece_tokens",
    oracle=_unigram_oracle(),
    desc="SentencePiece-style UNIGRAM-LM segmentation (Kudo 2018): a "
    "trained piece inventory with integer micro-ln log-probabilities "
    "(BPE merge products at their selection-time frequencies + the "
    "corpus alphabet at weighted char counts — how SentencePiece seeds "
    "its unigram trainer from frequent substrings), Viterbi-decoded per "
    "word to the max-score / fewest-pieces segmentation; completes the "
    "tokenizer QUARTET (greedy BPE char + byte, WordPiece maximal "
    "munch, unigram Viterbi); oracle-backed from birth via a MAP-probed "
    "unroll carrying the DP table as one packed-key LIST<BIGINT> "
    "column (one round per character position, depth = the guarded max "
    "token length); exact decimal score surfaced as logprob_micro",
)
def text_sentencepiece_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document whitespace vs unigram-piece token counts plus the
    exact integer segmentation log-prob. Scale: the inventory is
    alphabet + n_merges bounded (one argmax row per merge plus one
    |alphabet|-row collect to the driver); encoding is the same narrow
    Arrow map + Zipf word cache as the other three encoders — text
    never shuffles, the DP is O(len²) per CACHED word type."""
    from gearpump_spark.operators.bpe import unigram_tokenize, unigram_vocab_scores

    docs = table(spark, sf_dir, "documents")
    _guard_bpe_token_length(docs, chars=True)
    scores = unigram_vocab_scores(docs, n_merges=16)
    return (
        unigram_tokenize(docs, scores)
        .select("doc_id", "n_ws_tokens", "n_sp_tokens", "logprob_micro")
        .orderBy("doc_id")
    )


@register(
    "pipeline_chunk_pack",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), w -> w <> '') AS tk
        FROM documents),
    st AS (
        SELECT doc_id, tk, UNNEST(GENERATE_SERIES(0, LEN(tk) - 1, 32)) AS start
        FROM toks WHERE LEN(tk) > 0),
    chunks AS (
        SELECT doc_id,
               CAST(start // 32 AS BIGINT) AS chunk_idx,
               CAST(LEN(tk[start + 1 : start + 32]) AS BIGINT) AS n_tokens,
               doc_id || ':' || CAST(start // 32 AS BIGINT) AS key
        FROM st),
    packed AS (
        SELECT doc_id, chunk_idx, n_tokens,
               CAST(CONCAT('0x', SUBSTR(MD5('1' || '|' || key), 1, 15)) AS BIGINT)
                 % 10000 % 8 AS shard,
               MD5('0' || '|' || key) AS h, key
        FROM chunks),
    binned AS (
        SELECT doc_id, chunk_idx, n_tokens,
               shard * 1099511627776
                 + CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY shard ORDER BY h, key
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       / 128) AS BIGINT) AS bin_id
        FROM packed)
    SELECT doc_id, chunk_idx, n_tokens, bin_id
    FROM binned ORDER BY doc_id, chunk_idx
    """,
    desc="end-to-end context construction: non-overlapping 32-token chunks "
    "packed into 128-token bins via 8-way sharded parallel packing",
)
def pipeline_chunk_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunking (narrow map) feeds sharded sequence packing (one window
    pass per shard, shards packed independently in parallel) — the shape
    that survives 100 TB, vs a single global packing order."""
    from gearpump_spark.operators import chunking as CH

    docs = table(spark, sf_dir, "documents")
    chunks = CH.chunk_by_tokens(docs, size=32, stride=32).withColumn(
        "key", F.concat_ws(":", F.col("doc_id"), F.col("chunk_idx"))
    )
    packed = SP.pack_sequences(chunks, "key", "n_tokens", budget=128, shards=8)
    return packed.select("doc_id", "chunk_idx", "n_tokens", "bin_id").orderBy(
        "doc_id", "chunk_idx"
    )


@register(
    "text_pmi_bigrams",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               LIST_TRANSFORM(
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), w -> w <> ''),
                   w -> LOWER(w)) AS tk
        FROM documents),
    u AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n
          FROM (SELECT UNNEST(tk) AS word FROM toks) GROUP BY word),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nu FROM u),
    bi AS (SELECT tk[i] AS w1, tk[i + 1] AS w2
           FROM toks, UNNEST(RANGE(1, LEN(tk))) AS r(i)
           WHERE LEN(tk) >= 2),
    b AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n12
          FROM bi GROUP BY w1, w2),
    nb AS (SELECT CAST(SUM(n12) AS BIGINT) AS nbt FROM b),
    top AS (SELECT w1, w2, n12 FROM b ORDER BY n12 DESC, w1, w2 LIMIT 50)
    SELECT t.w1, t.w2, t.n12,
           u1.n AS n1, u2.n AS n2,
           CAST(CAST(ROUND(LN(t.n12), 6) AS DECIMAL(18,6))
              + 2 * CAST(ROUND(LN(tot.nu), 6) AS DECIMAL(18,6))
              - CAST(ROUND(LN(nb.nbt), 6) AS DECIMAL(18,6))
              - CAST(ROUND(LN(u1.n), 6) AS DECIMAL(18,6))
              - CAST(ROUND(LN(u2.n), 6) AS DECIMAL(18,6)) AS DOUBLE) AS pmi
    FROM top t JOIN u u1 ON u1.word = t.w1 JOIN u u2 ON u2.word = t.w2,
         tot, nb
    ORDER BY t.n12 DESC, t.w1, t.w2
    """,
    desc="PMI collocation extraction (Church & Hanks 1990): pointwise "
    "mutual information of the corpus's 50 most frequent adjacent word "
    "pairs — pmi = ln(p(w1,w2)/(p(w1)p(w2))) decomposed into "
    "ROUNDED-LN DECIMAL TERMS (ln n12 + 2 ln N_u - ln N_b - ln n1 - "
    "ln n2, each rounded to 6dp before the exact decimal sum) so the "
    "score hash-matches despite five log terms; deterministic "
    "(count desc, bigram) tie-break, TakeOrdered top-k",
)
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The collocation/multi-word-expression miner (tokenizer-vocab
    candidates). Shuffle budget: one groupBy on bigram (map-side
    combined), one on word; the two unigram joins touch only the
    50-row top-k (broadcast); totals are 1-row cross joins. The top-k
    plans as TakeOrderedAndProject — never a global sort."""
    docs = table(spark, sf_dir, "documents")
    tk = F.transform(TX.tokens(F.col("text")), F.lower)
    # The tokenized corpus feeds the unigram and bigram legs, the unigram
    # counts feed THREE consumers (total + both top-pair joins) and the
    # bigram counts two (total + top-k) — fully lazy, every consumer
    # re-ran the tokenize scan (5 Generate subtrees in the r10 sweep).
    # Lazy localCheckpoints (r11 shared-relation discipline).
    toks = docs.select("doc_id", tk.alias("tk")).localCheckpoint(eager=False)
    uni = (
        toks.select(F.explode("tk").alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint(eager=False)
    )
    nu = uni.agg(F.sum("n").cast("long").alias("nu"))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("tk") - 1),
        lambda i: F.struct(
            F.element_at(F.col("tk"), i).alias("w1"),
            F.element_at(F.col("tk"), i + 1).alias("w2"),
        ),
    )
    bi = (
        toks.where(F.size("tk") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
    )
    b = (
        bi.groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("n12"))
        .localCheckpoint(eager=False)
    )
    nb = b.agg(F.sum("n12").cast("long").alias("nbt"))
    top = b.orderBy(F.desc("n12"), "w1", "w2").limit(50)

    def L(c):
        return F.round(F.log(c.cast("double")), 6).cast("decimal(18,6)")

    u1 = uni.select(F.col("word").alias("w1"), F.col("n").alias("n1"))
    u2 = uni.select(F.col("word").alias("w2"), F.col("n").alias("n2"))
    return (
        top.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            "n12",
            "n1",
            "n2",
            (
                L(F.col("n12"))
                + F.lit(2) * L(F.col("nu"))
                - L(F.col("nbt"))
                - L(F.col("n1"))
                - L(F.col("n2"))
            )
            .cast("double")
            .alias("pmi"),
        )
        .orderBy(F.desc("n12"), "w1", "w2")
    )


@register(
    "text_rare_bigram_frac",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               LIST_TRANSFORM(
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), w -> w <> ''),
                   w -> LOWER(w)) AS tk
        FROM documents),
    bi AS (
        SELECT doc_id,
               UNNEST(LIST_TRANSFORM(RANGE(1, LEN(tk)),
                      i -> tk[i] || ' ' || tk[i + 1])) AS bg
        FROM toks WHERE LEN(tk) >= 2),
    c AS (SELECT bg, COUNT(*) AS c2 FROM bi GROUP BY bg),
    j AS (SELECT doc_id, CASE WHEN c2 <= 2 THEN 1 ELSE 0 END AS rare
          FROM bi JOIN c USING (bg))
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(rare) AS BIGINT) AS n_rare,
           CAST(SUM(rare) AS DOUBLE) / COUNT(*) AS rare_frac
    FROM j GROUP BY doc_id ORDER BY doc_id
    """,
    desc="corpus-fit quality screen: fraction of a doc's bigrams that are "
    "rare (corpus count <= 2) in the corpus's own bigram model — a "
    "perplexity proxy with integer counts and one IEEE division, so it is "
    "bit-exact across engines (no log/pow)",
)
def text_rare_bigram_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gibberish/boilerplate screen in the CCNet spirit but self-trained:
    the corpus's own bigram counts stand in for an external LM. Shuffle
    budget: one groupBy on bigram (vocab-sized, map-side combined), the
    count join reuses that key, one final groupBy on doc_id."""
    docs = table(spark, sf_dir, "documents")
    tk = F.transform(TX.tokens(F.col("text")), F.lower)
    base = docs.select("doc_id", tk.alias("tk")).where(F.size("tk") >= 2)
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("tk") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("tk"), i), F.element_at(F.col("tk"), i + 1)
        ),
    )
    bi = base.select("doc_id", F.explode(bigrams).alias("bg"))
    c = bi.groupBy("bg").agg(F.count("*").alias("c2"))
    j = bi.join(c, "bg").select(
        "doc_id", F.when(F.col("c2") <= 2, F.lit(1)).otherwise(F.lit(0)).alias("rare")
    )
    return (
        j.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("rare").cast("long").alias("n_rare"),
            (F.sum("rare").cast("double") / F.count("*")).alias("rare_frac"),
        )
        .orderBy("doc_id")
    )


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH s AS (
        SELECT vec_id, embedding,
               COALESCE(CAST(LIST_MAX(LIST_TRANSFORM(embedding, x -> ABS(x)))
                             AS DOUBLE), 0.0) AS mx
        FROM embeddings)
    SELECT vec_id,
           CASE WHEN mx = 0 THEN 0.0 ELSE 127.0 / mx END AS scale,
           ARRAY_TO_STRING(LIST_TRANSFORM(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE)
                    * (CASE WHEN mx = 0 THEN 0.0 ELSE 127.0 / mx END)) AS INT)),
             ',') AS q_str
    FROM s ORDER BY vec_id
    """,
    desc="symmetric int8 embedding quantization (per-vector scale 127/max|x|) "
    "— 4x storage cut for the 100 TB vector estate; round-to-integer is the "
    "only rounding, identical across engines. Codes serialized via "
    "array_join (the q_array_ops convention): the driver canonicalizer "
    "sorts rows with pandas, which cannot factorize ndarray cells, so "
    "array outputs MUST leave the query as strings (r3 red).",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Narrow map, no shuffle: each vector quantizes independently. The
    float->double promotions are exact and ROUND at scale 0 (half away
    from zero) matches DuckDB bit-for-bit, so the oracle is exact."""
    emb = table(spark, sf_dir, "embeddings")
    mx = F.coalesce(
        F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x))).cast(
            "double"
        ),
        F.lit(0.0),
    )
    base = emb.select("vec_id", "embedding", mx.alias("mx"))
    scale = F.when(F.col("mx") == 0, F.lit(0.0)).otherwise(F.lit(127.0) / F.col("mx"))
    base = base.withColumn("scale", scale)
    q = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * F.col("scale")).cast("int"),
    )
    return base.select(
        "vec_id", "scale", F.array_join(q, ",").alias("q_str")
    ).orderBy("vec_id")


@register(
    "embedding_quantize_int4",
    oracle="""
    WITH s AS (
        SELECT vec_id, embedding,
               COALESCE(CAST(LIST_MAX(LIST_TRANSFORM(embedding, x -> ABS(x)))
                             AS DOUBLE), 0.0) AS mx
        FROM embeddings),
    q AS (
        SELECT vec_id,
               CASE WHEN mx = 0 THEN 0.0 ELSE 7.0 / mx END AS scale,
               LIST_TRANSFORM(embedding,
                   x -> CAST(ROUND(CAST(x AS DOUBLE)
                        * (CASE WHEN mx = 0 THEN 0.0 ELSE 7.0 / mx END)) AS INT))
                 AS qv
        FROM s)
    SELECT vec_id, scale,
           ARRAY_TO_STRING(
             LIST_TRANSFORM(RANGE(1, (LEN(qv) + 1) // 2 + 1),
               i -> CAST((qv[2 * i - 1] + 8) * 16
                    + CASE WHEN 2 * i <= LEN(qv) THEN qv[2 * i] + 8 ELSE 8 END
                 AS INT)),
             ',') AS packed_str
    FROM q ORDER BY vec_id
    """,
    desc="symmetric int4 embedding quantization with nibble packing "
    "(per-vector scale 7/max|x|, offset-binary codes, two per byte; odd "
    "dims pad the trailing low nibble with code 0, the FAISS-SQ4 "
    "convention) — an 8x storage cut for the 100 TB vector estate, all "
    "pure JVM array expressions; round-to-integer is the only rounding. "
    "Packed bytes serialized via array_join (q_array_ops convention) so "
    "the driver canonicalizer never sees a raw array cell.",
)
def embedding_quantize_int4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Narrow map, no shuffle (operators/similarity.py
    quantize_embeddings_int4) — halves int8's footprint again, the trade
    real vector stores (FAISS SQ4) make."""
    from gearpump_spark.operators.similarity import quantize_embeddings_int4

    emb = table(spark, sf_dir, "embeddings")
    return (
        quantize_embeddings_int4(emb)
        .select(
            "vec_id", "scale", F.array_join("packed", ",").alias("packed_str")
        )
        .orderBy("vec_id")
    )


@register(
    "multimodal_png_pixels_real",
    oracle=f"""
    SELECT doc_id,
           CAST({_BMP_W} AS INT) AS width,
           CAST({_BMP_H} AS INT) AS height,
           {_bmp_px_sum_sql(f"k % {_BMP_W}", f"k // {_BMP_W}", f"{_BMP_W} * {_BMP_H}")}
             AS px_sum
    FROM documents ORDER BY doc_id
    """,
    desc="REAL compressed-codec decode: synthesize an 8-bit RGB PNG per doc "
    "(same closed-form raster as the BMP tier, scanlines forward-filtered "
    "with all five spec filter types), zlib-inflate + unfilter every byte "
    "back in pure python and checksum the pixels — the oracle recomputes "
    "the sum from pure arithmetic",
)
def multimodal_png_pixels_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators.multimodal import (
        pixel_stats,
        synthesize_png_raster_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return pixel_stats(synthesize_png_raster_payloads(docs)).orderBy("doc_id")


@register(
    "multimodal_png_adam7_real",
    oracle=f"""
    WITH px AS (
        SELECT doc_id,
               k % (2 + doc_id % 6) AS x,
               k // (2 + doc_id % 6) AS y
        FROM documents, UNNEST(RANGE(0, {_BMP_W} * {_BMP_H})) AS t(k)
        WHERE k < (2 + doc_id % 6) * (1 + doc_id % 5))
    SELECT doc_id,
           CAST(CASE WHEN y % 2 = 1 THEN 7
                     WHEN x % 2 = 1 THEN 6
                     WHEN y % 4 = 2 THEN 5
                     WHEN x % 4 = 2 THEN 4
                     WHEN y % 8 = 4 THEN 3
                     WHEN x % 8 = 4 THEN 2
                     ELSE 1 END AS INT) AS pass_no,
           CAST(COUNT(*) AS BIGINT) AS n_px,
           CAST(SUM((3 * doc_id + x + 11 * y) % 256
                  + (2 * doc_id + 5 * x + y) % 256
                  + (doc_id + 3 * x + 7 * y) % 256) AS BIGINT) AS px_sum
    FROM px GROUP BY doc_id, pass_no
    ORDER BY doc_id, pass_no
    """,
    desc="REAL Adam7 interlaced-PNG decode audit (r6 verdict candidate): "
    "synthesize an interlace=1 PNG per doc (seven spec passes, empty "
    "passes skipped, filters restart per pass), decode through the full "
    "Adam7 reassembly scatter, then re-derive each pass's pixel "
    "membership from coordinates and checksum PER PASS — a misplaced "
    "pass shows up as that pass's sum diverging from the closed-form "
    "arithmetic oracle (the whole-image sum of the existing PNG tier "
    "cannot localize an interlace bug)",
)
def multimodal_png_adam7_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/multimodal.py synthesize_png_adam7_payloads +
    adam7_pass_stats: Arrow-batched narrow maps, payload bytes never
    shuffle, <=7 output rows per image."""
    from gearpump_spark.operators.multimodal import (
        adam7_pass_stats,
        synthesize_png_adam7_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return adam7_pass_stats(synthesize_png_adam7_payloads(docs)).orderBy(
        "doc_id", "pass_no"
    )


@register(
    "multimodal_png_resize_real",
    oracle=f"""
    SELECT doc_id,
           CAST(3 AS INT) AS width,
           CAST(2 AS INT) AS height,
           {_bmp_px_sum_sql(f"((k % 3) * {_BMP_W}) // 3",
                            f"((k // 3) * {_BMP_H}) // 2", "6")}
             AS px_sum
    FROM documents ORDER BY doc_id
    """,
    desc="REAL PNG->PNG resize: nearest-neighbor resample of real filtered "
    "PNG rasters to 3x2, re-encoded as real PNG bytes (filter-0 + zlib), "
    "decoded back and checksummed against the source-index arithmetic",
)
def multimodal_png_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators.multimodal import (
        PixelDecoder,
        pixel_stats,
        resize_images,
        synthesize_png_raster_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    resized = resize_images(
        synthesize_png_raster_payloads(docs), width=3, height=2, decoder=PixelDecoder()
    )
    return pixel_stats(resized).orderBy("doc_id")


@register(
    "dedup_chunk_exact",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), w -> w <> '') AS tk
        FROM documents),
    st AS (
        SELECT doc_id, tk, UNNEST(GENERATE_SERIES(0, LEN(tk) - 1, 32)) AS start
        FROM toks WHERE LEN(tk) > 0),
    ch AS (
        SELECT doc_id, CAST(start // 32 AS BIGINT) AS chunk_idx,
               MD5(ARRAY_TO_STRING(tk[start + 1 : start + 32], ' ')) AS fp
        FROM st),
    r AS (
        SELECT doc_id, chunk_idx, fp,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id, chunk_idx) AS rn,
               COUNT(*) OVER (PARTITION BY fp) AS n_dups
        FROM ch)
    SELECT fp, doc_id, chunk_idx, CAST(n_dups AS BIGINT) AS n_dups
    FROM r WHERE rn = 1 ORDER BY doc_id, chunk_idx
    """,
    desc="chunk-level exact dedup: 32-token non-overlapping chunks, one "
    "winner (min doc_id, chunk_idx) per distinct chunk text — the dedup "
    "granularity modern pipelines use so one boilerplate passage can't "
    "carry a whole document through",
)
def dedup_chunk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunks never shuffle their text: only the 16-byte fingerprint and
    coordinates reach the exchange (one shuffle on fp)."""
    from pyspark.sql import Window as W

    from gearpump_spark.operators import chunking as CH

    docs = table(spark, sf_dir, "documents")
    ch = CH.chunk_by_tokens(docs, size=32, stride=32).select(
        "doc_id", "chunk_idx", F.md5(F.col("chunk_text").cast("binary")).alias("fp")
    )
    w = W.partitionBy("fp")
    return (
        ch.withColumn("rn", F.row_number().over(w.orderBy("doc_id", "chunk_idx")))
        .withColumn("n_dups", F.count("*").over(w).cast("long"))
        .where(F.col("rn") == 1)
        .select("fp", "doc_id", "chunk_idx", "n_dups")
        .orderBy("doc_id", "chunk_idx")
    )


# HTML-injection formula shared by the Spark query and its oracle: both
# engines wrap the document text in markup; the Spark side strips it with
# functions/text.py strip_html while the oracle replays the SAME ordered
# regex/entity chain (single source: TX.HTML_STRIP_STEPS/HTML_ENTITIES).
_SQL_HTML_INJECT = """
    SELECT doc_id,
           '<html><head><style>p {color: red}</style></head><body><p class="x">'
           || text || '</p>'
           || CASE WHEN doc_id % 3 = 0
                   THEN '<script type="text/javascript">var x = 1 < 2;</script>'
                   ELSE '' END
           || CASE WHEN doc_id % 4 = 0 THEN '<!-- hidden
comment -->' ELSE '' END
           || CASE WHEN doc_id % 5 = 0
                   THEN '<p>&amp;lt; &nbsp;&quot;q&#39;s&quot;</p>' ELSE '' END
           || '</body></html>' AS raw
    FROM documents
"""


def _sql_strip_html(col: str) -> str:
    out = col
    for pat, repl in TX.HTML_STRIP_STEPS:
        out = f"REGEXP_REPLACE({out}, '{pat}', '{repl}', 'g')"
    for ent, ch in TX.HTML_ENTITIES:
        sq = ch.replace("'", "''")
        out = f"REPLACE({out}, '{ent}', '{sq}')"
    return f"TRIM(REGEXP_REPLACE({out}, '[ \\t\\n\\f\\r]+', ' ', 'g'))"


@register(
    "text_strip_html",
    oracle=f"""
    WITH h AS ({_SQL_HTML_INJECT})
    SELECT doc_id,
           CAST(LENGTH(raw) AS BIGINT) AS n_chars_raw,
           {_sql_strip_html("raw")} AS clean_text,
           CAST(LENGTH({_sql_strip_html("raw")}) AS BIGINT) AS n_chars_clean
    FROM h ORDER BY doc_id
    """,
    desc="crawl preprocessing: strip script/style/comment bodies and tags, "
    "decode common entities, collapse whitespace — pure JVM regex chain "
    "(C4-style front end), markup injected deterministically per doc",
)
def text_strip_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit('<html><head><style>p {color: red}</style></head><body><p class="x">'),
        F.col("text"),
        F.lit("</p>"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit('<script type="text/javascript">var x = 1 < 2;</script>'),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 0, F.lit("<!-- hidden\ncomment -->")).otherwise(
            F.lit("")
        ),
        F.when(
            F.col("doc_id") % 5 == 0, F.lit("<p>&amp;lt; &nbsp;&quot;q&#39;s&quot;</p>")
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    base = docs.select("doc_id", raw.alias("raw"))
    clean = TX.strip_html(F.col("raw"))
    return base.select(
        "doc_id",
        F.length("raw").cast("long").alias("n_chars_raw"),
        clean.alias("clean_text"),
        F.length(clean).cast("long").alias("n_chars_clean"),
    ).orderBy("doc_id")


@register(
    "multimodal_gif_pixels_real",
    oracle=f"""
    SELECT doc_id,
           CAST({_BMP_W} AS INT) AS width,
           CAST({_BMP_H} AS INT) AS height,
           {_bmp_px_sum_sql(f"k % {_BMP_W}", f"k // {_BMP_W}", f"{_BMP_W} * {_BMP_H}")}
             AS px_sum
    FROM documents ORDER BY doc_id
    """,
    desc="REAL LZW decode: synthesize a GIF89a per doc (same closed-form "
    "raster, palette + real variable-width LZW compression), decode every "
    "byte back in pure python and checksum the pixels against the "
    "arithmetic oracle — with this only JPEG pixel data remains stubbed",
)
def multimodal_gif_pixels_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators.multimodal import (
        GifDecoder,
        pixel_stats,
        synthesize_gif_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return pixel_stats(synthesize_gif_payloads(docs), decoder=GifDecoder()).orderBy(
        "doc_id"
    )


@register(
    "multimodal_gif_frames_real",
    oracle=f"""
    WITH fr AS (
        SELECT doc_id, UNNEST(RANGE(0, 2 + doc_id % 3)) AS f FROM documents)
    SELECT doc_id,
           CAST(f AS INT) AS frame_idx,
           CAST({_BMP_W} AS INT) AS width,
           CAST({_BMP_H} AS INT) AS height,
           CAST(LIST_SUM(LIST_TRANSFORM(RANGE(0, {_BMP_W} * {_BMP_H}), k ->
                 (doc_id + 3 * (k % {_BMP_W}) + 7 * (k // {_BMP_W}) + 13 * f) % 256
               + (2 * doc_id + 5 * (k % {_BMP_W}) + (k // {_BMP_W}) + 17 * f) % 256
               + (3 * doc_id + (k % {_BMP_W}) + 11 * (k // {_BMP_W}) + 19 * f) % 256))
             AS BIGINT) AS px_sum
    FROM fr ORDER BY doc_id, frame_idx
    """,
    desc="REAL video-style frame decode: animated GIF89a per doc (one LZW "
    "stream + local palette per frame), every frame decoded and "
    "checksummed against a closed-form per-frame arithmetic oracle",
)
def multimodal_gif_frames_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators.multimodal import (
        gif_frame_stats,
        synthesize_animated_gif_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return gif_frame_stats(synthesize_animated_gif_payloads(docs)).orderBy(
        "doc_id", "frame_idx"
    )


@register(
    "dedup_lsh_recall",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    samp AS (SELECT doc_id FROM documents
             WHERE CAST(CONCAT('0x', SUBSTR(MD5('9' || '|' || doc_id), 1, 15)) AS BIGINT) % 10000 < 2000),
    sh AS (SELECT DISTINCT s.doc_id, s.shingle FROM shingled s
           JOIN samp USING (doc_id)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    truth AS (
        SELECT a, b FROM inter
        JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
        WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5),
    sig AS (
        SELECT doc_id,
               MIN(MD5('0|' || shingle)) AS h0, MIN(MD5('1|' || shingle)) AS h1,
               MIN(MD5('2|' || shingle)) AS h2, MIN(MD5('3|' || shingle)) AS h3,
               MIN(MD5('4|' || shingle)) AS h4, MIN(MD5('5|' || shingle)) AS h5
        FROM shingled GROUP BY doc_id),
    bands AS (
        SELECT doc_id, bi.band_idx,
               CASE bi.band_idx
                    WHEN 0 THEN MD5(h0 || '|' || h1)
                    WHEN 1 THEN MD5(h2 || '|' || h3)
                    ELSE MD5(h4 || '|' || h5) END AS band_key
        FROM sig JOIN samp USING (doc_id)
        CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS band_idx) bi),
    cand AS (
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM bands x JOIN bands y
          ON x.band_idx = y.band_idx AND x.band_key = y.band_key
             AND x.doc_id < y.doc_id),
    hit AS (SELECT a, b FROM truth INTERSECT SELECT a, b FROM cand),
    m AS (SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
                 (SELECT COUNT(*) FROM cand) AS n_candidates,
                 (SELECT COUNT(*) FROM hit) AS n_hit)
    SELECT CAST(n_truth AS BIGINT) AS n_truth,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_hit AS BIGINT) AS n_hit,
           CASE WHEN n_candidates = 0 THEN 0.0
                ELSE CAST(n_hit AS DOUBLE) / CAST(n_candidates AS DOUBLE) END
             AS precision,
           CASE WHEN n_truth = 0 THEN 0.0
                ELSE CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE) END AS recall
    FROM m
    """,
    desc="LSH quality evaluation on a 20% hash-stable doc sample: "
    "banded-LSH candidates scored against exact Jaccard >= 0.5 ground "
    "truth (inverted shingle index) — precision/recall as exact rationals",
)
def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The measurement loop a production dedup pipeline needs: tune
    bands/rows against measured recall. Exact ground truth is inherently
    quadratic in shingle-bucket sizes, so it runs on a bounded hash-stable
    sample (the r2 scaling sweep measured the unsampled variant at 20x
    superlinear on the sf1 step) — at 100 TB, lower the sample rate to
    keep the sampled subset roughly constant-size; the estimate's variance
    depends on subset size, not corpus size. Both sides reuse the
    inverted shingle index; the three counts collapse to one row."""
    docs = SP.hash_sample(table(spark, sf_dir, "documents"), "doc_id", 2000, seed=9)
    # The distinct shingle set feeds FOUR legs (both sides of the exact-
    # Jaccard self-join + the size aggregate consumed twice as sa/sb), and
    # staying lazy re-ran the tokenize+shingle+explode+distinct subtree per
    # leg — the r11 plan audit counted the banding/shingling machinery 16
    # Generate nodes deep across 45 exchanges for this one query. Lazy
    # localCheckpoint (the wedge-tier discipline): shingle once, read the
    # blocks everywhere; truth and cand likewise each feed two consumers
    # (their count and the intersect).
    sh = (
        docs.select(
            "doc_id", F.explode(D.word_shingles(F.col("text"))).alias("shingle")
        ).distinct()
    ).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    truth = (
        inter.join(sa, F.col("sa.doc_id") == F.col("a"))
        .join(sb, F.col("sb.doc_id") == F.col("b"))
        .where(
            F.col("i").cast("double")
            / (F.col("sa.n") + F.col("sb.n") - F.col("i")).cast("double")
            >= 0.5
        )
        .select("a", "b")
        .localCheckpoint(eager=False)
    )
    # Signatures ride the SAME checkpointed shingle set (MIN is duplicate-
    # insensitive, so distinct shingles give identical MinHash values) —
    # the candidate leg no longer re-tokenizes the corpus at all.
    cand = D.lsh_candidate_pairs(
        D.minhash_signatures_from_shingles(sh, k=6), k=6, rows_per_band=2
    ).localCheckpoint(eager=False)
    hit = truth.intersect(cand.select("a", "b"))
    m = (
        truth.agg(F.count("*").alias("n_truth"))
        .crossJoin(cand.agg(F.count("*").alias("n_candidates")))
        .crossJoin(hit.agg(F.count("*").alias("n_hit")))
    )
    prec = F.when(F.col("n_candidates") == 0, F.lit(0.0)).otherwise(
        F.col("n_hit").cast("double") / F.col("n_candidates").cast("double")
    )
    rec = F.when(F.col("n_truth") == 0, F.lit(0.0)).otherwise(
        F.col("n_hit").cast("double") / F.col("n_truth").cast("double")
    )
    return m.select(
        F.col("n_truth").cast("long").alias("n_truth"),
        F.col("n_candidates").cast("long").alias("n_candidates"),
        F.col("n_hit").cast("long").alias("n_hit"),
        prec.alias("precision"),
        rec.alias("recall"),
    )


@register(
    "multimodal_jpeg_pixels_real",
    oracle=f"""
    SELECT doc_id,
           CAST({_BMP_W} AS INT) AS width,
           CAST({_BMP_H} AS INT) AS height,
           CAST({_BMP_W} * {_BMP_H} * 3 * ((37 * doc_id + 11) % 256) AS BIGINT)
             AS px_sum
    FROM documents ORDER BY doc_id
    """,
    desc="REAL baseline-JPEG decode: grayscale JPEG per doc (full Huffman "
    "entropy coding + FDCT on the encode side, Huffman + dequant + IDCT "
    "with the libjpeg DC-only integer fast path on decode); constant-gray "
    "rasters at DC quant 8 reconstruct bit-exactly, so the checksum has a "
    "pure-arithmetic oracle — every image container now decodes for real",
)
def multimodal_jpeg_pixels_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators.multimodal import (
        JpegDecoder,
        pixel_stats,
        synthesize_jpeg_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return pixel_stats(synthesize_jpeg_payloads(docs), decoder=JpegDecoder()).orderBy(
        "doc_id"
    )


@register(
    "multimodal_jpeg12_real",
    oracle=f"""
    SELECT doc_id,
           CAST({_BMP_W} AS INT) AS width,
           CAST({_BMP_H} AS INT) AS height,
           CAST({_BMP_W} * {_BMP_H} * 3 * (((37 * doc_id + 991) % 4096) // 16)
             AS BIGINT) AS px_sum
    FROM documents ORDER BY doc_id
    """,
    desc="REAL 12-bit extended-sequential (SOF1) JPEG decode: 16-bit DQT "
    "entries (Pq=1), level shift 2048, extended DC Huffman table carried "
    "in the DHT, samples presented as the high 8 bits — the medical/"
    "scientific-imaging precision variant; constant rasters reconstruct "
    "exactly through the DC-only integer path (closed-form oracle)",
)
def multimodal_jpeg12_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators.multimodal import (
        JpegDecoder,
        pixel_stats,
        synthesize_jpeg12_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return pixel_stats(synthesize_jpeg12_payloads(docs), decoder=JpegDecoder()).orderBy(
        "doc_id"
    )


def _sql_fl(expr: str) -> str:
    """floor(x+0.5) with [0,255] clamp — mirrors the python codec's
    rounding exactly (both sides IEEE doubles, identical op order)."""
    f = f"CAST(FLOOR(({expr}) + 0.5) AS BIGINT)"
    return f"LEAST(255, GREATEST(0, {f}))"


_SQL_JC = f"""
    rgb AS (
        SELECT doc_id,
               CAST((37 * doc_id + 11) % 256 AS DOUBLE) AS r,
               CAST((91 * doc_id + 53) % 256 AS DOUBLE) AS g,
               CAST((13 * doc_id + 199) % 256 AS DOUBLE) AS b
        FROM documents),
    ycc AS (
        SELECT doc_id,
               {_sql_fl("0.299 * r + 0.587 * g + 0.114 * b")} AS yy,
               {_sql_fl("128 - 0.168736 * r - 0.331264 * g + 0.5 * b")} AS cb,
               {_sql_fl("128 + 0.5 * r - 0.418688 * g - 0.081312 * b")} AS cr
        FROM rgb),
    dec AS (
        SELECT doc_id,
               {_sql_fl("yy + 1.772 * (cb - 128)")} AS eb,
               {_sql_fl("yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)")} AS eg,
               {_sql_fl("yy + 1.402 * (cr - 128)")} AS er
        FROM ycc)
"""


@register(
    "multimodal_jpeg_color_real",
    oracle=f"""
    WITH {_SQL_JC}
    SELECT d.doc_id,
           CAST({_BMP_W} AS INT) AS width,
           CAST({_BMP_H} AS INT) AS height,
           CAST({_BMP_W} * {_BMP_H} * (eb + eg + er) AS BIGINT) AS px_sum
    FROM dec d JOIN documents USING (doc_id) ORDER BY d.doc_id
    """,
    desc="REAL baseline 4:4:4 color JPEG decode: interleaved Y/Cb/Cr MCUs, "
    "per-component Huffman/dequant/IDCT, YCbCr->RGB with floor(x+0.5) "
    "rounding — the oracle replays the whole color round-trip in SQL "
    "doubles, so constant-color rasters are bit-exact end to end",
)
def multimodal_jpeg_color_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators.multimodal import (
        JpegDecoder,
        pixel_stats,
        synthesize_jpeg_color_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return pixel_stats(
        synthesize_jpeg_color_payloads(docs), decoder=JpegDecoder()
    ).orderBy("doc_id")


@register(
    "multimodal_jpeg_420_real",
    oracle=f"""
    WITH {_SQL_JC}
    SELECT d.doc_id,
           CAST({_BMP_W} AS INT) AS width,
           CAST({_BMP_H} AS INT) AS height,
           CAST({_BMP_W} * {_BMP_H} * (eb + eg + er) AS BIGINT) AS px_sum
    FROM dec d JOIN documents USING (doc_id) ORDER BY d.doc_id
    """,
    desc="REAL 4:2:0 chroma-subsampled JPEG decode (the wild's most common "
    "layout): 16x16 MCUs of four Y blocks + subsampled Cb/Cr, nearest "
    "upsample, YCbCr->RGB — constant chroma survives the 2x2 mean, so the "
    "4:4:4 color oracle checks this path bit-for-bit too",
)
def multimodal_jpeg_420_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators.multimodal import (
        JpegDecoder,
        pixel_stats,
        synthesize_jpeg_420_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return pixel_stats(
        synthesize_jpeg_420_payloads(docs), decoder=JpegDecoder()
    ).orderBy("doc_id")


@register(
    "multimodal_image_dedup",
    oracle="""
    WITH dims AS (
        SELECT doc_id, doc_id // 3 AS grp FROM documents),
    px AS (
        SELECT doc_id,
               2 + grp % 5 AS w, 1 + grp % 4 AS h,
               (41 * grp + 7) % 256 AS cr,
               (83 * grp + 29) % 256 AS cg,
               (29 * grp + 171) % 256 AS cb
        FROM dims),
    fp AS (
        SELECT doc_id, w, h,
               MD5(REPEAT(LOWER(LPAD(TO_HEX(cb), 2, '0')
                          || LPAD(TO_HEX(cg), 2, '0')
                          || LPAD(TO_HEX(cr), 2, '0')), w * h)) AS pixel_fp
        FROM px)
    SELECT pixel_fp, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(w) AS INT) AS width, CAST(MIN(h) AS INT) AS height
    FROM fp GROUP BY pixel_fp ORDER BY keep_id
    """,
    desc="container-invariant image dedup: every 3 consecutive docs hold "
    "the SAME raster stored as BMP vs PNG vs GIF — byte hashing sees 3 "
    "payloads, the decoded-pixel md5 sees one image; groups key on "
    "content, min-id winner. The oracle derives each fingerprint in "
    "closed form from the synthesizer arithmetic, so the REAL decode of "
    "all three containers is what's being hash-checked",
)
def multimodal_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image dedup on decoded pixels, not payload bytes. Scale: decode +
    fingerprint is a narrow Arrow map (payloads never shuffle); only the
    16-byte fingerprints reach the groupBy exchange — the exact-dedup
    cost model, applied to images."""
    from gearpump_spark.operators.multimodal import (
        GifDecoder,
        pixel_fingerprints,
        synthesize_multiformat_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    fps = pixel_fingerprints(
        synthesize_multiformat_payloads(docs), decoder=GifDecoder()
    )
    return (
        fps.groupBy("pixel_fp")
        .agg(
            F.min("doc_id").cast("long").alias("keep_id"),
            F.count("*").cast("long").alias("n_copies"),
            F.min("width").cast("int").alias("width"),
            F.min("height").cast("int").alias("height"),
        )
        .orderBy("keep_id")
        .select("pixel_fp", "keep_id", "n_copies", "width", "height")
    )


@register(
    "multimodal_video_real",
    oracle="""
    SELECT doc_id,
           'mp4' AS format,
           CAST(16 * (1 + doc_id % 5) AS INT) AS width,
           CAST(16 * (1 + doc_id % 4) AS INT) AS height,
           CAST(1000 * (1 + doc_id % 9) AS BIGINT) AS duration_ms,
           CAST(1000 * (1 + doc_id % 3) AS INT) AS timescale,
           CAST(1 + doc_id % 2 AS INT) AS n_tracks
    FROM documents ORDER BY doc_id
    """,
    desc="REAL video container bytes: synthesize a minimal ISO-BMFF (MP4) "
    "per document — ftyp + moov(mvhd + trak(tkhd)xN), spec-exact v0 box "
    "layout — and parse it back with the real box walker (movie "
    "timescale/duration, 16.16 fixed-point track dims, track count); "
    "completes the modality set: image, audio, AND video metadata all "
    "decode from real container bytes (frame decode stays behind the "
    "LibraryDecoder codec seam)",
)
def multimodal_video_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators.multimodal import (
        decode_video_metadata,
        synthesize_mp4_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return decode_video_metadata(synthesize_mp4_payloads(docs)).orderBy("doc_id")


@register(
    "multimodal_video_stsd",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'avc1' ELSE 'hev1' END AS video_codec,
           CASE WHEN doc_id % 3 = 0 THEN 'mp4a' ELSE NULL END AS audio_codec,
           CAST(12 * (1 + doc_id % 4) AS BIGINT) AS n_video_frames,
           CAST(600 * (1 + doc_id % 3) AS BIGINT) AS video_timescale
    FROM documents ORDER BY doc_id
    """,
    desc="REAL MP4 sample-table (stbl) walk: trak → mdia → mdhd/hdlr → "
    "minf → stbl → stsd codec fourcc + stsz frame count, per handler "
    "type — the codec-allowlist and frame-budget columns a video "
    "pipeline filters on before touching media bytes; synthesized "
    "containers carry real stsd/stts/stsz boxes (audio track present "
    "for every third doc)",
)
def multimodal_video_stsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes video metadata to the sample-table level (r2 verdict
    item #6): codec ids and per-track frame counts from real ISO-BMFF
    boxes (operators/multimodal.py sniff_video_tracks)."""
    from gearpump_spark.operators.multimodal import (
        decode_video_sample_tables,
        synthesize_mp4_stsd_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return decode_video_sample_tables(synthesize_mp4_stsd_payloads(docs)).orderBy(
        "doc_id"
    )


@register(
    "multimodal_audio_dedup",
    oracle="""
    WITH g AS (SELECT doc_id, doc_id // 3 AS grp FROM documents),
    fp AS (
        SELECT doc_id,
               MD5(ARRAY_TO_STRING(LIST_TRANSFORM(RANGE(0, 16),
                    k -> CAST((11 * grp + 17 * k) % 200 - 100 AS VARCHAR)),
                    ',')) AS audio_fp
        FROM g)
    SELECT audio_fp, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM fp GROUP BY audio_fp ORDER BY keep_id
    """,
    desc="bit-depth-invariant audio dedup: every 3 consecutive docs hold "
    "ONE waveform stored at 8/16/24-bit PCM — byte hashing sees 3 "
    "payloads, the depth-normalized (integer shift, exact) sample md5 "
    "sees one signal; the oracle derives each fingerprint in closed form "
    "from the synthesizer arithmetic, so the REAL decode of all three "
    "depths is hash-checked",
)
def multimodal_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio dedup on decoded, depth-normalized samples. Scale: decode +
    fingerprint is a narrow Arrow map; only 16-byte fingerprints reach
    the groupBy — the exact-dedup cost model, applied to audio."""
    from gearpump_spark.operators.multimodal import (
        audio_fingerprints,
        synthesize_multidepth_wav_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    fps = audio_fingerprints(synthesize_multidepth_wav_payloads(docs))
    return (
        fps.groupBy("audio_fp")
        .agg(
            F.min("doc_id").cast("long").alias("keep_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
        .orderBy("keep_id")
        .select("audio_fp", "keep_id", "n_copies")
    )


@register(
    "multimodal_phash_neardup",
    oracle=None,  # DCT-based hash: no SQL form — numpy-golden + pair tests
    desc="perceptual-hash (pHash) image NEAR-dup: luminance -> 32x32 -> "
    "2D DCT -> 8x8 low band minus DC, median-thresholded to 64 bits; "
    "brightness-shifted re-encodes collide (the shift lives in the "
    "excluded DC), unrelated images sit >= 10 bits apart (tested bound); "
    "fixture pairs "
    "(same noise pattern, +-8 brightness) group exactly 2-by-2",
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup groups on perceptual hashes. Scale: decode+hash is
    a narrow Arrow map; only 8-byte hashes reach the groupBy. For
    Hamming-tolerant matching at scale, band the 64 bits into 4x16-bit
    keys and bucket-join (the SimHash pipeline), never all-pairs."""
    from gearpump_spark.operators.multimodal import (
        phash_fingerprints,
        synthesize_noise_pair_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    fps = phash_fingerprints(synthesize_noise_pair_payloads(docs))
    return (
        fps.groupBy("phash")
        .agg(
            F.min("doc_id").cast("long").alias("keep_id"),
            F.count("*").cast("long").alias("n_near_dups"),
        )
        .orderBy("keep_id")
        .select("keep_id", "n_near_dups", "phash")
    )


@register(
    "multimodal_jpeg_dri_real",
    oracle=f"""
    WITH {_SQL_JC}
    SELECT d.doc_id,
           CAST({_BMP_W} AS INT) AS width,
           CAST({_BMP_H} AS INT) AS height,
           CAST({_BMP_W} * {_BMP_H} * (eb + eg + er) AS BIGINT) AS px_sum
    FROM dec d JOIN documents USING (doc_id) ORDER BY d.doc_id
    """,
    desc="REAL restart-marker JPEG decode (DRI interval 1: an RSTn after "
    "every MCU — byte realignment, marker stripping, DC-predictor reset "
    "at every boundary); the error-resilience feature most camera JPEGs "
    "carry, same closed-form color oracle",
)
def multimodal_jpeg_dri_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators.multimodal import (
        JpegDecoder,
        pixel_stats,
        synthesize_jpeg_dri_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return pixel_stats(
        synthesize_jpeg_dri_payloads(docs), decoder=JpegDecoder()
    ).orderBy("doc_id")


@register(
    "multimodal_jpeg_422_real",
    oracle=f"""
    WITH {_SQL_JC}
    SELECT d.doc_id,
           CAST({_BMP_W} AS INT) AS width,
           CAST({_BMP_H} AS INT) AS height,
           CAST({_BMP_W} * {_BMP_H} * (eb + eg + er) AS BIGINT) AS px_sum
    FROM dec d JOIN documents USING (doc_id) ORDER BY d.doc_id
    """,
    desc="REAL 4:2:2 JPEG decode (horizontal-only chroma subsampling, "
    "16x8 MCUs of 2 Y + Cb + Cr blocks) — the broadcast/DV chroma layout; "
    "same closed-form color oracle as 4:4:4/4:2:0 since constant chroma "
    "survives the 2-pixel mean exactly",
)
def multimodal_jpeg_422_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators.multimodal import (
        JpegDecoder,
        pixel_stats,
        synthesize_jpeg_422_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return pixel_stats(
        synthesize_jpeg_422_payloads(docs), decoder=JpegDecoder()
    ).orderBy("doc_id")


@register(
    "multimodal_jpeg_411_real",
    oracle=f"""
    WITH {_SQL_JC}
    SELECT d.doc_id,
           CAST({_BMP_W} AS INT) AS width,
           CAST({_BMP_H} AS INT) AS height,
           CAST({_BMP_W} * {_BMP_H} * (eb + eg + er) AS BIGINT) AS px_sum
    FROM dec d JOIN documents USING (doc_id) ORDER BY d.doc_id
    """,
    desc="REAL 4:1:1 JPEG decode (DV/NTSC chroma layout: horizontal-only "
    "quarter subsampling, 32x8 MCUs of 4 Y + Cb + Cr) — with 4:4:0 "
    "round-trip-tested alongside, every spec-legal one-axis sampling "
    "layout now has real encoded streams; same closed-form color oracle "
    "since constant chroma survives the 4-pixel mean exactly",
)
def multimodal_jpeg_411_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators.multimodal import (
        JpegDecoder,
        pixel_stats,
        synthesize_jpeg_411_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return pixel_stats(
        synthesize_jpeg_411_payloads(docs), decoder=JpegDecoder()
    ).orderBy("doc_id")


@register(
    "multimodal_jpeg_progressive_real",
    oracle=f"""
    WITH {_SQL_JC}
    SELECT d.doc_id,
           CAST({_BMP_W} AS INT) AS width,
           CAST({_BMP_H} AS INT) AS height,
           CAST({_BMP_W} * {_BMP_H} * (eb + eg + er) AS BIGINT) AS px_sum
    FROM dec d JOIN documents USING (doc_id) ORDER BY d.doc_id
    """,
    desc="REAL progressive-JPEG decode (SOF2): interleaved DC scan + "
    "per-component spectral-selection AC scans accumulate coefficients "
    "across scans before one IDCT — checked by the same closed-form color "
    "oracle; with this, every image container and layout the synthesizers "
    "emit decodes for real",
)
def multimodal_jpeg_progressive_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators.multimodal import (
        JpegDecoder,
        pixel_stats,
        synthesize_jpeg_progressive_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return pixel_stats(
        synthesize_jpeg_progressive_payloads(docs), decoder=JpegDecoder()
    ).orderBy("doc_id")


@register(
    "multimodal_jpeg_refined_real",
    oracle=f"""
    WITH {_SQL_JC}
    SELECT d.doc_id,
           CAST({_BMP_W} AS INT) AS width,
           CAST({_BMP_H} AS INT) AS height,
           CAST({_BMP_W} * {_BMP_H} * (eb + eg + er) AS BIGINT) AS px_sum
    FROM dec d JOIN documents USING (doc_id) ORDER BY d.doc_id
    """,
    desc="REAL successive-approximation progressive-JPEG decode: Al=1 "
    "first scans then Ah=1 DC/AC refinement scans (spec G.1.2.2/G.1.2.3) "
    "rebuild full-precision coefficients across FOUR passes per component "
    "— same closed-form color oracle; the codec matrix is now complete "
    "(no JPEG layout the synthesizers emit falls back to FakeDecoder)",
)
def multimodal_jpeg_refined_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gearpump_spark.operators.multimodal import (
        synthesize_jpeg_refined_pixel_stats,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    # Fused synth+decode (r11, guide §4): one mapInPandas stage instead of
    # two — payload bytes never cross the Arrow boundary. Same batch seams,
    # composed (see synthesize_jpeg_refined_pixel_stats).
    return synthesize_jpeg_refined_pixel_stats(docs).orderBy("doc_id")


@register(
    "dedup_fuzzy_names",
    oracle="""
    WITH vocab AS (
        SELECT s_name AS val, COUNT(*) AS support FROM supplier GROUP BY s_name),
    variants AS (
        SELECT val, support,
               UNNEST(list_distinct(list_append(
                   list_transform(range(1, LENGTH(val) + 1),
                       i -> substring(val, 1, CAST(i - 1 AS INT))
                            || substring(val, CAST(i + 1 AS INT), LENGTH(val))),
                   val))) AS variant
        FROM vocab),
    cand AS (
        SELECT DISTINCT a.val AS name_a, b.val AS name_b,
               a.support AS support_a, b.support AS support_b
        FROM variants a JOIN variants b USING (variant)
        WHERE a.val < b.val)
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist,
           support_a, support_b
    FROM cand WHERE levenshtein(name_a, name_b) = 1
    ORDER BY name_a, name_b
    """,
    desc="record-linkage fuzzy matching via SymSpell deletion-neighborhood "
    "blocking: every distinct name explodes into its |s|+1 single-char "
    "deletions, candidates = variant equi-join (pigeonhole-complete for "
    "edit distance 1, NO hot blocks — a shared 'Supplier#' prefix would "
    "collapse prefix blocking into one block), then exact levenshtein "
    "verification; corpus frequency rides as a support column",
)
def dedup_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/dedup.py fuzzy_pairs_d1 over supplier names: finds every
    pair of names one edit apart (single-digit typos in the id suffix)."""
    from gearpump_spark.operators.dedup import fuzzy_pairs_d1

    s = table(spark, sf_dir, "supplier")
    return fuzzy_pairs_d1(s, "s_name").select(
        "name_a",
        "name_b",
        F.col("dist").cast("bigint").alias("dist"),
        "support_a",
        "support_b",
    ).orderBy("name_a", "name_b")


def _kmeans_int_oracle(k: int = 4, dim: int = 64, n_iter: int = 3) -> str:
    """Unrolled Lloyd rounds mirroring operators/similarity.py kmeans_int:
    fixed iterations + integer micro-unit arithmetic make the fixpoint
    SQL-expressible (float k-means is summation-order-dependent). All
    CTEs MATERIALIZED — each round references the previous twice."""
    blocks = [
        f"""
    q AS MATERIALIZED (
      SELECT vec_id, CAST(i AS BIGINT) AS idx,
             CAST(FLOOR((CAST(embedding[CAST(i AS INT)] AS DOUBLE) + 2.0)
                        * 1000000) AS BIGINT) AS vi
      FROM embeddings, range(1, {dim + 1}) t(i)),
    seeds AS MATERIALIZED (
      SELECT vec_id,
             CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                     vec_id) AS BIGINT) - 1 AS cid
      FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}),
    c0 AS MATERIALIZED (
      SELECT s.cid, q.idx, q.vi AS ci FROM seeds s JOIN q ON q.vec_id = s.vec_id)"""
    ]
    for i in range(n_iter):
        blocks.append(
            f""",
    a{i} AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT q.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY SUM((q.vi - c.ci) * (q.vi - c.ci)), c.cid) AS rn
        FROM q JOIN c{i} c USING (idx)
        GROUP BY q.vec_id, c.cid) WHERE rn = 1),
    c{i + 1} AS MATERIALIZED (
      SELECT prev.cid, prev.idx, COALESCE(u.nc, prev.ci) AS ci
      FROM c{i} prev LEFT JOIN (
         SELECT a.cid, q.idx, SUM(q.vi) // COUNT(*) AS nc
         FROM a{i} a JOIN q ON q.vec_id = a.vec_id GROUP BY a.cid, q.idx) u
      ON u.cid = prev.cid AND u.idx = prev.idx)"""
        )
    return (
        "WITH"
        + "".join(blocks)
        + f"""
    SELECT vec_id, cid AS cluster FROM (
        SELECT q.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY SUM((q.vi - c.ci) * (q.vi - c.ci)), c.cid) AS rn
        FROM q JOIN c{n_iter} c USING (idx)
        GROUP BY q.vec_id, c.cid) WHERE rn = 1
    ORDER BY vec_id"""
    )


@register(
    "kmeans_clusters_int",
    oracle=_kmeans_int_oracle(),
    desc="BIT-REPRODUCIBLE k-means (micro-unit quantized coordinates, "
    "integer distance sums, floor-division centroid updates, md5-seeded "
    "init): the whole 3-round Lloyd fixpoint plus final assignment "
    "hash-matches an unrolled DuckDB CTE chain — the auditable companion "
    "to kmeans_clusters, whose float math is rows-only forever",
)
def kmeans_clusters_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/similarity.py kmeans_int: narrow-map assignment against
    one nested-array centroid literal, k*dim partial-agg rows per update,
    driver never sees a vector."""
    from gearpump_spark.operators.similarity import kmeans_int

    emb = table(spark, sf_dir, "embeddings")
    return kmeans_int(emb, "embedding", k=4, n_iter=3).orderBy("vec_id")


def _bpe_exact_oracle(n_merges: int = 16, min_freq: int = 2) -> str:
    """Unrolled BPE trainer mirroring operators/bpe.py bpe_train_vocab:
    each round counts adjacent-symbol pairs over the word-type vocab,
    picks argmax (freq DESC, then pair lexicographic), and rewrites every
    word left-to-right non-overlapping. Symbol arrays are encoded as
    CHR(31)-wrapped strings ("<U>sym<U><U>sym<U>...") so one replace() of
    '<U>l<U><U>r<U>' -> '<U>lr<U>' is EXACTLY the Spark-side fold in
    _merge_pair (replace() is left-to-right non-overlapping too, and the
    wrapping keeps adjacent matches from consuming a shared separator).
    A LEFT JOIN ON TRUE against the 0-or-1-row argmax makes the early
    stop (best freq < min_freq) a vocab pass-through. MATERIALIZED
    everywhere — each round references the previous twice."""
    U = "chr(31)"
    blocks = _bpe_train_blocks(n_merges, min_freq)
    return (
        "WITH"
        + "".join(blocks)
        + f""",
    sizes AS MATERIALIZED (
      SELECT word,
             CAST(LEN(string_split(trim(s, {U}), {U} || {U})) AS BIGINT)
               AS n_syms
      FROM v{n_merges}),
    agg AS (
      SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_ws,
             CAST(SUM(n_syms) AS BIGINT) AS n_bpe
      FROM bpe_words w JOIN sizes USING (word) GROUP BY w.doc_id)
    SELECT d.doc_id,
           COALESCE(a.n_ws, 0) AS n_ws_tokens,
           COALESCE(a.n_bpe, 0) AS n_bpe_tokens
    FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id"""
    )


@register(
    "text_bpe_exact",
    oracle=_bpe_exact_oracle(),
    desc="HASH-CHECKABLE BPE: the full 16-merge trainer (pair counts -> "
    "total-tiebreak argmax -> vocab rewrite, per round) plus corpus "
    "tokenization stats, where tokenization = the trained vocab's final "
    "symbol state (sequential-exhaustive merge application) — the whole "
    "training fixpoint hash-matches an unrolled DuckDB CTE chain, "
    "completing the bit-reproducible trio with graph_pagerank_int and "
    "kmeans_clusters_int (the greedy best-rank encoder for unseen text "
    "stays the rows-only real-world API in text_bpe_tokens)",
)
def text_bpe_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/bpe.py bpe_train_vocab: tokenization stats read straight
    off the trained word-type vocabulary (zero extra passes, no Python in
    the loop — the per-doc stats are one join + one groupBy)."""
    from gearpump_spark.functions import text as TX
    from gearpump_spark.operators.bpe import bpe_train_vocab

    docs = table(spark, sf_dir, "documents")
    _, vocab = bpe_train_vocab(docs, n_merges=16)
    words = docs.select(
        "doc_id",
        F.explode(F.transform(TX.tokens(F.col("text")), F.lower)).alias("word"),
    )
    agg = (
        words.join(vocab.select("word", F.size("syms").alias("n_syms")), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ws"),
            F.sum("n_syms").alias("n_bpe"),
        )
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_ws"), F.lit(0)).cast("bigint").alias("n_ws_tokens"),
            F.coalesce(F.col("n_bpe"), F.lit(0)).cast("bigint").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


def _ahash_hashes_cte() -> str:
    """The WITH-body producing `hashes(doc_id, ahash)` — the closed-form
    mirror of the aHash pipeline over the LCG noise-pair fixture
    (operators/multimodal.py synthesize_noise_pair_payloads): instead of
    iterating the per-pixel LCG 384 times, each pixel k gets jump
    constants (a_k, b_k) with s_k = (a_k * s0 + b_k) mod 2^31 —
    generated here, shipped as a 384-row VALUES table. Blocks/threshold/
    bits are pure integer (ahash63). Shared by the near-dup pair query
    and the composed media-curation pipeline so the two oracles carry
    identical constants by construction."""
    M31 = 2**31
    A, C = 1103515245, 12345
    rows = []
    a, b = 1, 0
    for k in range(384):
        a, b = (A * a) % M31, (A * b + C) % M31
        rows.append(f"({k},{a},{b})")
    values = ",".join(rows)
    return f"""
    WITH lcg(k, a, b) AS (VALUES {values}),
    docs0 AS (
        SELECT doc_id, (doc_id // 2) * 2654435761 % 4294967296 AS s0,
               doc_id % 2 AS odd
        FROM documents WHERE doc_id < 200),
    px AS (
        SELECT doc_id, k,
               40 + (((a * s0 + b) % 2147483648) >> 16) % 160 + 8 * odd AS v
        FROM docs0, lcg),
    blocks AS (
        SELECT doc_id, ((k // 24) // 2) * 8 + (k % 24) // 3 AS idx,
               SUM(v) AS bv
        FROM px GROUP BY doc_id, idx),
    tot AS (SELECT doc_id, SUM(bv) AS total FROM blocks GROUP BY doc_id),
    hashes AS (
        SELECT b.doc_id,
               SUM(CASE WHEN idx >= 1 AND bv * 64 >= total
                        THEN (CAST(1 AS BIGINT) << CAST(idx - 1 AS INT))
                        ELSE 0 END) AS ahash
        FROM blocks b JOIN tot t USING (doc_id) GROUP BY b.doc_id)"""


def _ahash_oracle() -> str:
    """aHash near-dup pairs: the shared hashes CTE + all-pairs popcount
    (200 hashes — the Spark side's banded join is the scale path, the
    oracle only needs truth)."""
    return (
        _ahash_hashes_cte()
        + """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
    FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
    ORDER BY id_a, id_b
    """
    )


@register(
    "multimodal_ahash_neardup",
    oracle=_ahash_oracle(),
    desc="HASH-CHECKABLE image near-dup: integer average-hash (block sums "
    "thresholded by cross-multiplication — no floats) over the LCG "
    "noise-pair fixture, paired by the 4x16-bit banded Hamming join "
    "(pigeonhole recall to 3 bits, never all-pairs); brightness-shifted "
    "re-encodes collide exactly as with pHash (the shift cancels in "
    "bv*64 - total), and the oracle reconstructs every pixel closed-form "
    "via LCG jump constants — the full decode->hash->band->pair pipeline "
    "is bit-verified, where the float-DCT pHash can only be goldened",
)
def multimodal_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/multimodal.py ahash_fingerprints +
    phash_candidate_pairs: decode + hash is a narrow Arrow map, only
    8-byte hashes reach the banded equi-join."""
    from gearpump_spark.operators.multimodal import (
        ahash_fingerprints,
        phash_candidate_pairs,
        synthesize_noise_pair_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )
    fps = ahash_fingerprints(synthesize_noise_pair_payloads(docs))
    return (
        phash_candidate_pairs(fps, max_hamming=3, hash_col="ahash")
        .select("id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming"))
        .orderBy("id_a", "id_b")
    )


def _phash_int_oracle() -> str:
    """Closed-form mirror of the INTEGER-DCT pHash pipeline over the LCG
    noise-pair fixture: pixels reconstructed via the same 384-row LCG
    jump table as _ahash_oracle, the 32x32 nearest-neighbor resample as
    an integer index grid, EXACT mean removal (1024·v − Σv over the
    resampled grid — a uniform brightness shift cancels identically),
    then the separable fixed-point DCT with the basis shipped as a
    256-row VALUES table built by the SAME Python expression the
    operator uses (operators/multimodal.py _phash_int_basis) — shared
    constants by construction, not by transcription. Median = the 32nd
    order statistic of the 63 non-DC coefficients (odd count, exact
    element). The twin join pins the shift-invariance claim: every
    even/odd fixture pair must land at Hamming 0."""
    from gearpump_spark.operators.multimodal import _phash_int_basis

    M31 = 2**31
    A, C = 1103515245, 12345
    rows = []
    a, b = 1, 0
    for k in range(384):
        a, b = (A * a) % M31, (A * b + C) % M31
        rows.append(f"({k},{a},{b})")
    lcg_values = ",".join(rows)
    basis = _phash_int_basis()
    basis_values = ",".join(
        f"({k},{n},{basis[k][n]})" for k in range(8) for n in range(32)
    )
    return f"""
    WITH lcg(k, a, b) AS (VALUES {lcg_values}),
    basis(kb, nb, c) AS (VALUES {basis_values}),
    docs0 AS (
        SELECT doc_id, (doc_id // 2) * 2654435761 % 4294967296 AS s0,
               doc_id % 2 AS odd
        FROM documents WHERE doc_id < 200),
    px AS (
        SELECT doc_id, k,
               40 + (((a * s0 + b) % 2147483648) >> 16) % 160 + 8 * odd AS v
        FROM docs0, lcg),
    res AS (
        SELECT p.doc_id, g.y, g.x, p.v
        FROM (SELECT y.y AS y, x.x AS x,
                     (y.y * 16 // 32) * 24 + (x.x * 24 // 32) AS k
              FROM range(0, 32) y(y) CROSS JOIN range(0, 32) x(x)) g
        JOIN px p ON p.k = g.k),
    tot AS (SELECT doc_id, SUM(v) AS s FROM res GROUP BY doc_id),
    gp AS (SELECT r.doc_id, r.y, r.x, 1024 * r.v - t.s AS gv
           FROM res r JOIN tot t USING (doc_id)),
    t1 AS (SELECT doc_id, b.kb AS k1, gp.x AS x, SUM(b.c * gv) AS tv
           FROM gp JOIN basis b ON b.nb = gp.y GROUP BY doc_id, b.kb, gp.x),
    dct AS (SELECT doc_id, k1, b.kb AS k2, CAST(SUM(b.c * tv) AS BIGINT) AS cv
            FROM t1 JOIN basis b ON b.nb = t1.x GROUP BY doc_id, k1, b.kb),
    low AS (SELECT doc_id, k1 * 8 + k2 AS idx, cv FROM dct
            WHERE NOT (k1 = 0 AND k2 = 0)),
    med AS (SELECT doc_id, cv AS m FROM (
            SELECT doc_id, cv,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cv) AS rn
            FROM low) WHERE rn = 32),
    hashes AS (
        SELECT l.doc_id,
               CAST(SUM(CASE WHEN l.cv > m.m
                        THEN (CAST(1 AS BIGINT) << CAST(l.idx - 1 AS INT))
                        ELSE 0 END) AS BIGINT) AS phash
        FROM low l JOIN med m USING (doc_id) GROUP BY l.doc_id)
    SELECT h.doc_id, h.phash AS phash_int,
           CAST(bit_count(xor(h.phash, h2.phash)) AS BIGINT) AS twin_hamming
    FROM hashes h JOIN hashes h2
      ON h2.doc_id = CASE WHEN h.doc_id % 2 = 0 THEN h.doc_id + 1
                          ELSE h.doc_id - 1 END
    ORDER BY h.doc_id
    """


@register(
    "multimodal_phash_int",
    oracle=_phash_int_oracle(),
    desc="HASH-CHECKABLE perceptual hash: the INTEGER-DCT pHash "
    "(luminance -> 32x32 nearest-neighbor resample -> exact "
    "cross-multiplied mean removal -> 2^11 fixed-point separable DCT-II "
    "-> 63 low-band coefficients thresholded at their exact median "
    "order statistic) over the LCG noise-pair fixture, plus the Hamming "
    "distance to each doc's brightness-shifted twin (provably 0: mean "
    "removal cancels uniform shifts identically, where float pHash only "
    "approximates it by dropping DC) — the r7 verdict's last named "
    "rows-only family converted to a full oracle row via the "
    "integer-micro-unit discipline (the JPEG integer IDCT and "
    "embedding_top_pc_int templates applied to the DCT)",
)
def multimodal_phash_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/multimodal.py phash_int_fingerprints: decode + DCT hash
    is a narrow Arrow-batched map (payloads never shuffle — only 8-byte
    hashes do); the twin pairing is a keyed equi-join on doc_id XOR 1,
    O(1) rows per doc. The banded Hamming scale path for arbitrary
    corpora is phash_candidate_pairs, already plan-pinned under
    multimodal_ahash_neardup with the same hash column contract."""
    from gearpump_spark.operators.multimodal import (
        phash_int_fingerprints,
        synthesize_noise_pair_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )
    fps = phash_int_fingerprints(synthesize_noise_pair_payloads(docs)).select(
        "doc_id", "phash"
    )
    twin = fps.select(
        F.expr(
            "CASE WHEN doc_id % 2 = 0 THEN doc_id + 1 ELSE doc_id - 1 END"
        ).alias("doc_id"),
        F.col("phash").alias("twin_hash"),
    )
    return (
        fps.join(twin, "doc_id")
        .select(
            "doc_id",
            F.col("phash").cast("bigint").alias("phash_int"),
            F.bit_count(F.col("phash").bitwiseXOR(F.col("twin_hash")))
            .cast("bigint")
            .alias("twin_hamming"),
        )
        .orderBy("doc_id")
    )


@register(
    "embedding_random_projection",
    oracle="""
    WITH u AS (
        SELECT vec_id, CAST(i AS BIGINT) - 1 AS pos,
               CAST(ROUND(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000)
                    AS BIGINT) AS x
        FROM embeddings, range(1, 65) t(i)),
    s AS (
        SELECT CAST(j.j AS BIGINT) AS j, CAST(p.pos AS BIGINT) AS pos,
               CASE WHEN CAST(CONCAT('0x',
                        SUBSTR(MD5('7|' || j.j || '|' || p.pos), 1, 15))
                        AS BIGINT) % 2 = 0
                    THEN 1 ELSE -1 END AS sgn
        FROM range(0, 16) j(j) CROSS JOIN range(0, 64) p(pos)),
    comp AS (
        SELECT vec_id, j, SUM(sgn * x) AS c
        FROM u JOIN s USING (pos) GROUP BY vec_id, j),
    agg AS (
        SELECT vec_id, LIST(c ORDER BY j) AS cs FROM comp GROUP BY vec_id)
    SELECT vec_id, ARRAY_TO_STRING(cs, ',') AS proj,
           CAST(LIST_SUM(LIST_TRANSFORM(cs, c -> c * c)) AS BIGINT) AS pnorm2
    FROM agg ORDER BY vec_id
    """,
    desc="Johnson-Lindenstrauss random projection 64->16 dims: dense "
    "seeded ±1 sign matrix over fixed-point integer coordinates — the "
    "100 TB pre-step that shrinks embeddings ~8x BEFORE anything "
    "shuffles, bit-identical across engines because every component is "
    "an integer fold (signs derived from the shared seeded-md5 parity "
    "in BOTH engines, never shipped); components serialized via "
    "array_join per the q_array_ops convention",
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/similarity.py random_projection: zero-shuffle narrow
    map (out_dim integer folds per row); cosine
    ordering survives within JL tolerance (tested in
    tests/test_operators_unit.py)."""
    from gearpump_spark.operators.similarity import random_projection

    emb = table(spark, sf_dir, "embeddings")
    out = random_projection(emb, "embedding", dim=64, out_dim=16, seed=7)
    pnorm2 = F.aggregate(
        F.col("proj"), F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )
    return out.select(
        "vec_id",
        F.array_join("proj", ",").alias("proj"),
        pnorm2.alias("pnorm2"),
    ).orderBy("vec_id")


@register(
    "graph_link_prediction",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        WHERE l_orderkey % 10 = 0),
    edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    adj AS (SELECT u AS n, v AS nb FROM edges
            UNION ALL SELECT v, u FROM edges),
    deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY n),
    wed AS (SELECT a1.n AS c, a1.nb AS x, a2.nb AS y
            FROM adj a1 JOIN adj a2 ON a1.n = a2.n AND a1.nb < a2.nb
            JOIN deg dc ON dc.n = a1.n AND dc.d <= 64),
    cn AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS common
           FROM wed GROUP BY x, y),
    cand AS (SELECT cn.* FROM cn
             LEFT JOIN edges e ON e.u = cn.x AND e.v = cn.y
             WHERE e.u IS NULL),
    scored AS (
        SELECT cand.x AS u, cand.y AS v, common,
               common / (dx.d + dy.d - common) AS jaccard
        FROM cand
        JOIN deg dx ON dx.n = cand.x
        JOIN deg dy ON dy.n = cand.y)
    SELECT u, v, common, jaccard FROM scored
    ORDER BY common DESC, jaccard DESC, u, v LIMIT 20
    """,
    desc="common-neighbor / Jaccard link prediction (Liben-Nowell 2003) "
    "over a 1-in-10 order sample of the co-purchase graph: top-20 "
    "UNLINKED part pairs by shared neighbors — the 'customers also "
    "bought' recommender; jaccard = common/(du+dv-common) is one IEEE "
    "division of bigints, exact cross-engine; degree-64 hub-center cap "
    "(super-node exclusion, mirrored in the oracle) bounds the wedge "
    "fan-out — the r5 Jaccard scale lesson applied to its sibling",
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/graph.py link_predict_common_neighbors: salted wedge
    self-join (triangle_count discipline — hub fan-out spread over
    16 salts, AQE-exempt width pin), map-side pair counts, anti-join
    against existing edges, one TakeOrderedAndProject."""
    from gearpump_spark.operators.graph import link_predict_common_neighbors

    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 10 == 0)
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
    return link_predict_common_neighbors(edges, k=20, max_degree=64)


@register(
    "multimodal_video_fps",
    oracle="""
    WITH p AS (
        SELECT doc_id,
               8 * (1 + doc_id % 3) AS c1, 20 + 10 * (doc_id % 4) AS d1,
               4 * (1 + doc_id % 2) AS c2, 25 AS d2,
               600 * (1 + doc_id % 3) AS ts
        FROM documents)
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'avc1' ELSE 'hev1' END AS video_codec,
           CAST(c1 + c2 AS BIGINT) AS n_video_frames,
           CAST(ts AS BIGINT) AS video_timescale,
           CAST(c1 * d1 + c2 * d2 AS BIGINT) AS video_stts_duration,
           CAST(ts * (c1 + c2) AS DOUBLE) / (c1 * d1 + c2 * d2) AS avg_fps
    FROM p ORDER BY doc_id
    """,
    desc="REAL stts frame-timing walk: MP4s synthesized with TWO stts "
    "runs of different tick deltas per video track; the walker sums "
    "count*delta over the run table and avg fps = timescale*frames/"
    "duration is one IEEE division of the walked bigints — the "
    "frame-rate filter column a video pipeline prunes on (e.g. drop "
    "screencasts < 5 fps) without touching media bytes",
)
def multimodal_video_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/multimodal.py sniff_video_tracks stts extension +
    decode_video_sample_tables(include_timing=True): narrow Arrow map,
    payloads never shuffle; oracle recomputes the two-run arithmetic
    closed-form so the REAL box walk is what's hash-checked."""
    from gearpump_spark.operators.multimodal import (
        decode_video_sample_tables,
        synthesize_mp4_fps_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    out = decode_video_sample_tables(
        synthesize_mp4_fps_payloads(docs), include_timing=True
    )
    return out.select(
        "doc_id",
        "video_codec",
        "n_video_frames",
        "video_timescale",
        "video_stts_duration",
        (
            (F.col("video_timescale") * F.col("n_video_frames")).cast("double")
            / F.col("video_stts_duration")
        ).alias("avg_fps"),
    ).orderBy("doc_id")


@register(
    "sample_cluster_split",
    oracle=_SQL_CLUSTERS_CTES
    + f""",
    labeled AS (
        SELECT doc_id, cluster_id,
               CASE WHEN {_SQL_H15.format(seed="'0'", key="cluster_id")}
                    % 10000 < 1000
                    THEN 'test' ELSE 'train' END AS split
        FROM clusters)
    SELECT doc_id, cluster_id, split FROM labeled ORDER BY doc_id
    """,
    desc="LEAKAGE-FREE train/test split: the 10% hash decision keys on "
    "the near-dup CLUSTER id (LSH -> connected components), not the "
    "doc id, so near-duplicates always land on the same side — the "
    "split discipline that keeps eval honest (per-doc hashing puts "
    "near-identical text in train AND test)",
)
def sample_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sampling.py cluster_safe_split over the dedup_clusters
    component ids: the split itself is a scan-local expression; the
    cluster ids come from the near-linear LSH + CC pipeline."""
    from gearpump_spark.operators.graph import connected_components
    from gearpump_spark.operators.sampling import cluster_safe_split

    docs = table(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs, k=6)
    pairs = D.lsh_candidate_pairs(sig, k=6, rows_per_band=2)
    comps = connected_components(
        pairs, nodes=docs.select("doc_id"), src="a", dst="b"
    ).select(F.col("node_id").alias("doc_id"), F.col("comp").alias("cluster_id"))
    return cluster_safe_split(comps, "cluster_id", test_bp=1000).orderBy("doc_id")


@register(
    "dedup_cdc_chunks",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), w -> w <> '') AS tk
        FROM documents),
    b AS (
        SELECT doc_id, tk,
               LIST_FILTER(RANGE(1, LEN(tk)),
                   i -> {_SQL_H15.format(seed="'9'", key="(tk[i] || ' ' || tk[i+1])")}
                        % 8 = 0) AS bpos
        FROM toks WHERE LEN(tk) > 0),
    seg AS (
        SELECT doc_id, tk,
               LIST_PREPEND(0, bpos) AS starts,
               LIST_APPEND(bpos, LEN(tk)) AS ends,
               UNNEST(GENERATE_SERIES(1, LEN(bpos) + 1)) AS j
        FROM b),
    ch AS (
        SELECT doc_id, CAST(j - 1 AS BIGINT) AS chunk_idx,
               CAST(starts[j] AS BIGINT) AS tok_start,
               CAST(ends[j] - starts[j] AS BIGINT) AS n_tokens,
               MD5(ARRAY_TO_STRING(tk[starts[j] + 1 : ends[j]], ' ')) AS fp
        FROM seg),
    r AS (
        SELECT doc_id, chunk_idx, tok_start, n_tokens, fp,
               ROW_NUMBER() OVER (PARTITION BY fp
                                  ORDER BY doc_id, chunk_idx) AS rn,
               COUNT(*) OVER (PARTITION BY fp) AS n_dups
        FROM ch)
    SELECT fp, doc_id, chunk_idx, tok_start, n_tokens,
           CAST(n_dups AS BIGINT) AS n_dups
    FROM r WHERE rn = 1 ORDER BY doc_id, chunk_idx
    """,
    desc="content-defined chunk dedup (gear/Rabin CDC over tokens): cut "
    "where the seeded hash of the 2-token window is 0 mod 8, so chunk "
    "identity survives prefix insertions/deletions — the edit-robust "
    "upgrade over fixed-size chunk dedup, where one inserted token "
    "shifts every later chunk; winner = min (doc_id, chunk_idx) per fp",
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/chunking.py cdc_chunks: boundary tests, segmentation,
    and fingerprints are array expressions in one narrow map; only
    16-byte fps + coordinates reach the dedup shuffle."""
    from pyspark.sql import Window as W

    from gearpump_spark.operators.chunking import cdc_chunks

    docs = table(spark, sf_dir, "documents")
    ch = cdc_chunks(docs, modulus=8, seed=9)
    w = W.partitionBy("fp")
    return (
        ch.withColumn("rn", F.row_number().over(w.orderBy("doc_id", "chunk_idx")))
        .withColumn("n_dups", F.count("*").over(w).cast("long"))
        .where(F.col("rn") == 1)
        .select("fp", "doc_id", "chunk_idx", "tok_start", "n_tokens", "n_dups")
        .orderBy("doc_id", "chunk_idx")
    )


@register(
    "similarity_hard_negatives",
    oracle="""
    WITH anchors AS (
        SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label
        FROM embeddings WHERE vec_id < 5),
    scored AS (
        SELECT a.q_id, e.vec_id,
               ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(e.embedding) + 1),
                         i -> CAST(e.embedding[i] AS DOUBLE)
                              * CAST(a.q_vec[i] AS DOUBLE)))
                     / (SQRT(LIST_SUM(LIST_TRANSFORM(e.embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                        * SQRT(LIST_SUM(LIST_TRANSFORM(a.q_vec,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                     4) AS cosine_sim
        FROM embeddings e CROSS JOIN anchors a
        WHERE e.label <> a.q_label)
    SELECT q_id, vec_id, cosine_sim, CAST(rank AS BIGINT) AS rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                    ORDER BY cosine_sim DESC, vec_id) AS rank
        FROM scored) WHERE rank <= 5
    ORDER BY q_id, rank
    """,
    desc="hard-negative mining for contrastive training: per anchor the "
    "top-5 most-similar vectors with a DIFFERENT label — near-misses "
    "that carry the gradient signal random negatives lack; anchors "
    "broadcast, label filter applied scan-local BEFORE ranking",
)
def similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/similarity.py hard_negatives: cosine_topk plan shape +
    one label-inequality filter; corpus never shuffles."""
    from gearpump_spark.operators.similarity import hard_negatives

    emb = table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    out = hard_negatives(anchors, emb, k=5)
    return out.select(
        "q_id", "vec_id", "cosine_sim", F.col("rank").cast("bigint").alias("rank")
    ).orderBy("q_id", "rank")


# BM25 CTE chain shared with text_bm25_topk (same engine-exact rational
# scorer), parameterized only by the rank depth the fusion consumes.
_SQL_BM25_RANKS = """
    toks AS (
        SELECT doc_id,
               LIST_TRANSFORM(
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), w -> w <> ''),
                   w -> LOWER(w)) AS tk
        FROM documents),
    dl AS (SELECT doc_id, CAST(LEN(tk) AS BIGINT) AS dl FROM toks),
    words AS (SELECT doc_id, UNNEST(tk) AS word FROM toks),
    qw AS (SELECT doc_id, word FROM words
           WHERE word IN ('vector', 'merge', 'stream')),
    tfc AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
            FROM qw GROUP BY doc_id, word),
    dfc AS (SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
            FROM qw GROUP BY word),
    tot AS (SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n,
                   CAST((SELECT SUM(LEN(tk)) FROM toks) AS BIGINT) AS t),
    terms AS (
        SELECT f.doc_id, f.word,
               (22.0 * f.tf * t * (2 * n - 2 * d.df + 1)) /
               ((10.0 * f.tf * t + 3.0 * t + 9.0 * l.dl * n) * (2 * d.df + 1)) AS s
        FROM tfc f JOIN dfc d USING (word) JOIN dl l USING (doc_id), tot),
    pivoted AS (
        SELECT doc_id,
               COALESCE(MAX(CASE WHEN word = 'vector' THEN s END), 0.0)
             + COALESCE(MAX(CASE WHEN word = 'merge' THEN s END), 0.0)
             + COALESCE(MAX(CASE WHEN word = 'stream' THEN s END), 0.0) AS score
        FROM terms GROUP BY doc_id),
    lex AS (
        SELECT doc_id, r FROM (
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                        AS BIGINT) AS r
            FROM pivoted) WHERE r <= 50)
"""


@register(
    "text_hybrid_rrf",
    oracle=f"""
    WITH {_SQL_BM25_RANKS},
    qv AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0),
    cos AS (
        SELECT e.vec_id AS doc_id,
               ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(e.embedding) + 1),
                         i -> CAST(e.embedding[i] AS DOUBLE)
                              * CAST(q.q_vec[i] AS DOUBLE)))
                     / (SQRT(LIST_SUM(LIST_TRANSFORM(e.embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                        * SQRT(LIST_SUM(LIST_TRANSFORM(q.q_vec,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                     4) AS sim
        FROM embeddings e CROSS JOIN qv q),
    sem AS (
        SELECT doc_id, r FROM (
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id)
                        AS BIGINT) AS r
            FROM cos) WHERE r <= 50),
    fused AS (
        SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
               l.r AS r_bm25, s.r AS r_cosine,
               COALESCE(1.0 / (60 + l.r), 0.0)
             + COALESCE(1.0 / (60 + s.r), 0.0) AS rrf
        FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id)
    SELECT doc_id, r_bm25, r_cosine, rrf,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
    """,
    desc="hybrid retrieval via reciprocal-rank fusion (Cormack 2009): "
    "BM25 lexical top-50 fused with embedding-cosine top-50 (query = "
    "doc 0's vector), rrf = 1/(60+r_lex) + 1/(60+r_sem) in fixed term "
    "order — the standard lexical+semantic combiner, engine-exact "
    "because each term is one IEEE division",
)
def text_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/retrieval.py rrf_fuse over bm25_topk + cosine ranks:
    each ranker reduces the corpus with TakeOrdered first, so fusion
    (pivot groupBy + sort) runs on <=100 rows, never the corpus."""
    from pyspark.sql import Window as W

    from gearpump_spark.operators.retrieval import bm25_topk, rrf_fuse
    from gearpump_spark.operators.similarity import cosine

    docs = table(spark, sf_dir, "documents")
    lexw = W.orderBy(F.desc("score"), F.col("doc_id"))
    lex = (
        bm25_topk(docs, ("vector", "merge", "stream"), k=50)
        .withColumn("rank", F.row_number().over(lexw))
    )
    emb = table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_vec")
    )
    scored = emb.crossJoin(F.broadcast(qv)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(cosine(F.col("embedding"), F.col("q_vec")), 4).alias("sim"),
    )
    semw = W.orderBy(F.desc("sim"), F.col("doc_id"))
    sem = (
        scored.orderBy(F.desc("sim"), "doc_id")
        .limit(50)
        .withColumn("rank", F.row_number().over(semw))
    )
    out = rrf_fuse([("bm25", lex), ("cosine", sem)], k=10, c=60)
    return out.select("doc_id", "r_bm25", "r_cosine", "rrf", "rank").orderBy(
        F.desc("rrf"), "doc_id"
    )


@register(
    "graph_khop_reach",
    oracle="""
    WITH RECURSIVE items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        WHERE l_orderkey % 10 = 0),
    edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    adj AS (SELECT u AS n, v AS nb FROM edges
            UNION ALL SELECT v, u FROM edges),
    srcs AS (SELECT DISTINCT n FROM adj WHERE n % 97 = 0),
    bfs(node, d) AS (
        SELECT n, CAST(0 AS BIGINT) FROM srcs
        UNION
        SELECT a.nb, bfs.d + 1
        FROM bfs JOIN adj a ON a.n = bfs.node
        WHERE bfs.d < 4)
    SELECT node, MIN(d) AS dist FROM bfs GROUP BY node ORDER BY node
    """,
    desc="bounded k-hop BFS reachability (4 hops) from the ~1% seed "
    "parts over the sampled co-purchase graph: exact shortest hop "
    "count per reached node — blast-radius / expansion analysis; "
    "frontier form (each round expands only newly-discovered nodes, "
    "Pregel's canonical BSP example), depth-capped recursive CTE oracle",
)
def graph_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/graph.py khop_distances: one frontier×adjacency join +
    one LEFT-ANTI per round, localCheckpoint lineage cuts — total work
    O(sum of frontier edges), never all-pairs."""
    from gearpump_spark.operators.graph import khop_distances

    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 10 == 0)
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
    nodes = edges.select(F.col("src").alias("n")).union(
        edges.select(F.col("dst").alias("n"))
    )
    srcs = nodes.where(F.col("n") % 97 == 0).distinct()
    out = khop_distances(edges, srcs, n_rounds=4)
    return out.select(F.col("node"), F.col("dist")).orderBy("node")


@register(
    "text_oov_rate",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               LIST_TRANSFORM(
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), w -> w <> ''),
                   w -> LOWER(w)) AS tk
        FROM documents),
    words AS (SELECT doc_id, UNNEST(tk) AS word FROM toks),
    vocab AS (
        SELECT word FROM (
            SELECT word, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word) AS rk
            FROM words GROUP BY word) WHERE rk <= 64),
    per_doc AS (
        SELECT w.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_oov
        FROM words w LEFT JOIN vocab v ON v.word = w.word
        GROUP BY w.doc_id)
    SELECT doc_id, n_tokens, n_oov,
           CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate
    FROM per_doc ORDER BY doc_id
    """,
    desc="per-document out-of-vocabulary rate against the corpus top-64 "
    "vocabulary — the tokenizer-fit signal curation uses to flag docs a "
    "fixed vocab would shred into bytes (boilerplate/code/foreign text); "
    "vocab broadcast, one explode shuffle keyed on doc_id, rate = one "
    "IEEE division",
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the vocab is a top-N aggregate compiled to
    TakeOrderedAndProject (per-partition heaps, never a global sort — the
    r5 verdict caught the row_number().over(global W) form, which is a
    single-task sort over every distinct word: 10^8-10^9 types on a
    100 TB corpus) that broadcasts; the per-doc rollup is the only corpus
    shuffle. At a real 32k vocab the broadcast is still KBs."""
    docs = table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
        ).alias("w"),
    ).select("doc_id", F.lower("w").alias("word"))
    vocab = (
        words.groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(64)
        .select("word")
    )
    flagged = words.join(
        F.broadcast(vocab.withColumn("_in", F.lit(1))), "word", "left"
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        (F.col("n_oov").cast("double") / F.col("n_tokens")).alias("oov_rate"),
    ).orderBy("doc_id")


@register(
    "embedding_matryoshka",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               LIST_TRANSFORM(embedding[1:16],
                   v -> CAST(ROUND(CAST(v AS DOUBLE) * 1000) AS BIGINT)) AS pq,
               LIST_TRANSFORM(embedding,
                   v -> CAST(ROUND(CAST(v AS DOUBLE) * 1000) AS BIGINT)) AS fq
        FROM embeddings)
    SELECT vec_id,
           ARRAY_TO_STRING(pq, ',') AS prefix,
           CAST(LIST_SUM(LIST_TRANSFORM(pq, x -> x * x)) AS BIGINT)
             AS prefix_norm2,
           CAST(LIST_SUM(LIST_TRANSFORM(fq, x -> x * x)) AS BIGINT)
             AS full_norm2,
           CAST(LIST_SUM(LIST_TRANSFORM(pq, x -> x * x)) AS DOUBLE)
             / LIST_SUM(LIST_TRANSFORM(fq, x -> x * x)) AS energy_ratio
    FROM q ORDER BY vec_id
    """,
    desc="Matryoshka (MRL) prefix truncation 64->16 dims: the first-16 "
    "fixed-point coordinates plus the energy-retention ratio "
    "||prefix||^2/||full||^2 (one IEEE division of integer norms) — the "
    "diagnostic that tells you whether an embedding family was "
    "MRL-trained (prefix carries the mass) before you cut storage 4x; "
    "zero-shuffle narrow map, prefix serialized via array_join",
)
def embedding_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-local: slice + two integer folds per row; at 100 TB pair
    with random_projection/int8 quantization as the storage ladder."""
    emb = table(spark, sf_dir, "embeddings")
    fx = lambda c: F.transform(  # noqa: E731
        c, lambda x: F.round(x.cast("double") * 1000, 0).cast("long")
    )
    q = emb.select(
        "vec_id",
        fx(F.slice("embedding", 1, 16)).alias("pq"),
        fx(F.col("embedding")).alias("fq"),
    )
    n2 = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0).cast("long"), lambda a, x: a + x * x
    )
    return q.select(
        "vec_id",
        F.array_join("pq", ",").alias("prefix"),
        n2(F.col("pq")).alias("prefix_norm2"),
        n2(F.col("fq")).alias("full_norm2"),
        (n2(F.col("pq")).cast("double") / n2(F.col("fq"))).alias("energy_ratio"),
    ).orderBy("vec_id")


@register(
    "embedding_covariance",
    oracle="""
    WITH v AS (
        SELECT vec_id,
               LIST_TRANSFORM(embedding[1:8],
                   x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        FROM embeddings),
    e AS (SELECT vec_id, i, qv[i] AS q FROM v, UNNEST(RANGE(1, 9)) AS t(i)),
    s AS (SELECT i, SUM(CAST(q AS DECIMAL(38,0))) AS si,
                 COUNT(*) AS n FROM e GROUP BY i),
    p AS (SELECT a.i AS i, b.i AS j,
                 SUM(CAST(a.q AS DECIMAL(38,0)) * b.q) AS sij
          FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
          GROUP BY a.i, b.i)
    SELECT CAST(p.i AS INT) AS i, CAST(p.j AS INT) AS j,
           CAST(sa.n AS BIGINT) AS n,
           CAST(CAST(p.sij AS DOUBLE) / sa.n
                - (CAST(sa.si AS DOUBLE) / sa.n)
                  * (CAST(sb.si AS DOUBLE) / sb.n) AS DOUBLE) AS cov
    FROM p JOIN s sa ON sa.i = p.i JOIN s sb ON sb.i = p.j
    ORDER BY i, j
    """,
    desc="exact covariance matrix of the first 8 embedding dimensions in "
    "fixed-point micro-units (the PCA/whitening input): integer moment "
    "sums S_i, S_ij accumulated as exact decimals, cov = S_ij/n - "
    "(S_i/n)(S_j/n) — a fixed IEEE op sequence on exact operands, "
    "bit-identical cross-engine; upper triangle, 36 rows",
)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE narrow aggregate pass computes all 8 first moments + 36 second
    moments as agg columns (zero explode, zero self-join — the oracle's
    explode+join is math-equivalent but NOT the 100 TB plan); the result
    row unpivots driver-side to (i, j, n, cov). At dim=64 the same pass
    carries 2,080 columns or tiles into a few passes; corpus is scanned
    once, never shuffled."""
    emb = table(spark, sf_dir, "embeddings")
    qd = emb.select(
        *[
            F.round(F.element_at("embedding", i).cast("double") * 1000, 0)
            .cast("long")
            .alias(f"q{i}")
            for i in range(1, 9)
        ]
    )
    aggs = [F.count("*").cast("long").alias("n")]
    aggs += [
        F.sum(F.col(f"q{i}").cast("decimal(38,0)")).alias(f"s{i}")
        for i in range(1, 9)
    ]
    aggs += [
        F.sum((F.col(f"q{i}").cast("decimal(38,0)") * F.col(f"q{j}")).cast(
            "decimal(38,0)"
        )).alias(f"s{i}_{j}")
        for i in range(1, 9)
        for j in range(i, 9)
    ]
    row = qd.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.lit(j).alias("j"),
                F.col("n").alias("n"),
                (
                    F.col(f"s{i}_{j}").cast("double") / F.col("n")
                    - (F.col(f"s{i}").cast("double") / F.col("n"))
                    * (F.col(f"s{j}").cast("double") / F.col("n"))
                ).cast("double").alias("cov"),
            )
            for i in range(1, 9)
            for j in range(i, 9)
        ]
    )
    return (
        row.select(F.explode(pairs).alias("p"))
        .select("p.i", "p.j", "p.n", "p.cov")
        .orderBy("i", "j")
    )


def _top_pc_int_oracle(n_iter: int = 8) -> str:
    """Unrolled integer max-norm power iteration over the exact scatter
    matrix C = n*S_ij - S_i*S_j of the first 8 embedding dims (same
    micro-unit quantization as embedding_covariance). Every step is
    sign-magnitude floor division on non-negative magnitudes (DuckDB //
    floors, Spark DIV truncates — they agree only on non-negatives, so
    negatives never reach a division), making the 8-iteration fixpoint
    hash-exact. The scatter matrix has the same eigenvectors as the
    covariance (it is n^2*cov), so the result IS the top PC direction in
    1e5 micro-units."""
    blocks = [
        """
    v8 AS MATERIALIZED (
        SELECT vec_id,
               LIST_TRANSFORM(embedding[1:8],
                   x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        FROM embeddings),
    e AS MATERIALIZED (
        SELECT vec_id, i, qv[i] AS q FROM v8, UNNEST(RANGE(1, 9)) AS t(i)),
    s AS MATERIALIZED (
        SELECT i, CAST(SUM(q) AS BIGINT) AS si, CAST(COUNT(*) AS BIGINT) AS n
        FROM e GROUP BY i),
    p AS MATERIALIZED (
        SELECT a.i AS i, b.i AS j, CAST(SUM(a.q * b.q) AS BIGINT) AS sij
        FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY a.i, b.i),
    craw AS MATERIALIZED (
        SELECT p.i, p.j, CAST(sa.n * p.sij - sa.si * sb.si AS BIGINT) AS c
        FROM p JOIN s sa ON sa.i = p.i JOIN s sb ON sb.i = p.j),
    sh AS MATERIALIZED (
        SELECT CASE WHEN LENGTH(BIN(GREATEST(MAX(ABS(c)), 1))) > 42
                    THEN LENGTH(BIN(GREATEST(MAX(ABS(c)), 1))) - 42
                    ELSE 0 END AS sbits
        FROM craw),
    cds AS MATERIALIZED (
        SELECT i, j,
               CAST(CASE WHEN c < 0
                         THEN -((-c) // (CAST(1 AS BIGINT) << sbits))
                         ELSE c // (CAST(1 AS BIGINT) << sbits) END
                    AS BIGINT) AS c
        FROM craw, sh),
    mx AS MATERIALIZED (SELECT GREATEST(MAX(ABS(c)), 1) AS mx FROM cds),
    cn AS MATERIALIZED (
        SELECT i, j,
               CAST(CASE WHEN c < 0 THEN -((-c) * 1000000 // mx)
                         ELSE c * 1000000 // mx END AS BIGINT) AS v
        FROM cds, mx),
    it0 AS MATERIALIZED (
        SELECT i, CAST(100000 AS BIGINT) AS x FROM (SELECT UNNEST(RANGE(1, 9)) AS i))"""
    ]
    for t in range(n_iter):
        blocks.append(
            f""",
    w{t} AS MATERIALIZED (
        SELECT c.i, CAST(SUM(c.v * p.x) AS BIGINT) AS w
        FROM cn c JOIN it{t} p ON c.j = p.i GROUP BY c.i),
    m{t} AS MATERIALIZED (SELECT GREATEST(MAX(ABS(w)), 1) AS mw FROM w{t}),
    it{t + 1} AS MATERIALIZED (
        SELECT i, CAST(CASE WHEN w < 0 THEN -((-w) * 100000 // mw)
                            ELSE w * 100000 // mw END AS BIGINT) AS x
        FROM w{t}, m{t})"""
        )
    return (
        "WITH"
        + "".join(blocks)
        + f"""
    SELECT CAST(i AS INT) AS i, CAST(x AS BIGINT) AS pc
    FROM it{n_iter} ORDER BY i"""
    )


@register(
    "embedding_top_pc_int",
    oracle=_top_pc_int_oracle(8),
    desc="BIT-REPRODUCIBLE top principal component (max-norm integer "
    "power iteration on the exact integer scatter matrix n*S_ij-S_i*S_j "
    "of the first 8 embedding dims, 1e5 micro-unit components): the "
    "hash-exact counterpart of the float deflated-power-iteration top "
    "PCs — same micro-unit discipline as kmeans_clusters_int/"
    "graph_pagerank_int, completing the verdict-r6 request to give the "
    "PCA family an oracle row; sign-magnitude floor divisions only, so "
    "Spark DIV and DuckDB // agree at every step",
)
def embedding_top_pc_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE distributed pass computes n, 8 first moments and 36 second
    moments as agg columns (zero explode/self-join — the oracle's
    explode+join is math-equivalent, not the 100 TB plan); the driver
    then runs the 8x8 integer power iteration on exactly 45 collected
    ints (dim^2-bounded, like kmeans' k*dim — at dim=64 it is 2,080
    ints), in arbitrary-precision Python mirroring the SQL's BIGINT
    steps bit-for-bit."""
    emb = table(spark, sf_dir, "embeddings")
    dim = 8
    qd = emb.select(
        *[
            F.round(F.element_at("embedding", i).cast("double") * 1000, 0)
            .cast("long")
            .alias(f"q{i}")
            for i in range(1, dim + 1)
        ]
    )
    aggs = [F.count("*").cast("long").alias("n")]
    aggs += [F.sum(f"q{i}").cast("long").alias(f"s{i}") for i in range(1, dim + 1)]
    aggs += [
        F.sum(F.col(f"q{i}") * F.col(f"q{j}")).cast("long").alias(f"s{i}_{j}")
        for i in range(1, dim + 1)
        for j in range(i, dim + 1)
    ]
    row = qd.agg(*aggs).collect()[0]
    n = row["n"]
    si = {i: row[f"s{i}"] for i in range(1, dim + 1)}
    sij = {}
    for i in range(1, dim + 1):
        for j in range(i, dim + 1):
            sij[(i, j)] = sij[(j, i)] = row[f"s{i}_{j}"]

    def sdiv(x: int, d: int) -> int:
        # sign-magnitude floor division: matches Spark DIV and DuckDB //
        # because the magnitude is non-negative on both sides
        return -((-x) // d) if x < 0 else x // d

    c = {
        (i, j): n * sij[(i, j)] - si[i] * si[j]
        for i in range(1, dim + 1)
        for j in range(1, dim + 1)
    }
    mx_raw = max(abs(v) for v in c.values()) or 1
    sbits = max(0, mx_raw.bit_length() - 42)
    c = {k: sdiv(v, 1 << sbits) for k, v in c.items()}
    mx = max(abs(v) for v in c.values()) or 1
    cn = {k: sdiv(v * 1_000_000, mx) for k, v in c.items()}
    v = {i: 100_000 for i in range(1, dim + 1)}
    for _ in range(8):
        w = {
            i: sum(cn[(i, j)] * v[j] for j in range(1, dim + 1))
            for i in range(1, dim + 1)
        }
        mw = max(abs(x) for x in w.values()) or 1
        v = {i: sdiv(w[i] * 100_000, mw) for i in range(1, dim + 1)}
    return spark.createDataFrame(
        [(i, v[i]) for i in range(1, dim + 1)], "i int, pc bigint"
    ).orderBy("i")


def _rs_plane(p: int, dim: int = 64) -> list[int]:
    """Integer LSH hyperplane for range search: coefficient j of plane p is
    (int(md5('rs{p}|{j}')[:8], 16) % 2001) - 1000 ∈ [-1000, 1000] — pure
    integer, so the projection SIGN is exact on both engines (the float
    hyperplanes in operators/similarity.lsh_project are fine for top-k
    recall but a sign flip at the boundary would break a hash-exact
    oracle)."""
    import hashlib

    return [
        (int(hashlib.md5(f"rs{p}|{j}".encode()).hexdigest()[:8], 16) % 2001) - 1000
        for j in range(dim)
    ]


_SQL_RS_COEF = (
    "((CAST(CONCAT('0x', SUBSTR(MD5('rs' || {p} || '|' || (j - 1)), 1, 8)) AS BIGINT)"
    " % 2001) - 1000)"
)


@register(
    "similarity_range_search",
    oracle=f"""
    WITH np AS (
        SELECT GREATEST(6, LEAST(16,
                   LEN(BIN(GREATEST((COUNT(*) - 1) // 8, 1))))) AS k
        FROM embeddings),
    q AS (
        SELECT vec_id,
               LIST_TRANSFORM(embedding,
                   x -> CAST(ROUND(CAST(x AS DOUBLE) * 100) AS BIGINT)) AS qv
        FROM embeddings),
    b AS (
        SELECT vec_id, qv,
               LIST_SUM(LIST_TRANSFORM(RANGE(0, (SELECT k FROM np)),
                   p -> CASE WHEN
                   LIST_SUM(LIST_TRANSFORM(RANGE(1, 65),
                       j -> qv[j] * {_SQL_RS_COEF.format(p="p")}))
                   > 0 THEN CAST(POW(2, p) AS BIGINT) ELSE 0 END)) AS bucket
        FROM q),
    pr AS (
        SELECT a.vec_id AS id_a, b2.vec_id AS id_b, a.bucket,
               LIST_SUM(LIST_TRANSFORM(RANGE(1, 65),
                        i -> a.qv[i] * b2.qv[i])) AS dot,
               LIST_SUM(LIST_TRANSFORM(a.qv, x -> x * x)) AS na,
               LIST_SUM(LIST_TRANSFORM(b2.qv, x -> x * x)) AS nb
        FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
    SELECT id_a, id_b, CAST(bucket AS BIGINT) AS bucket,
           ROUND(CAST(dot AS DOUBLE) / (SQRT(CAST(na AS DOUBLE))
                                        * SQRT(CAST(nb AS DOUBLE))), 4)
             AS cosine_sim
    FROM pr
    WHERE dot > 0 AND dot * dot * 100 >= 9 * na * nb
    ORDER BY id_a, id_b
    """,
    desc="range search (radius query): ALL pairs with cosine >= 0.30, "
    "LSH-bucketed — the similarity-search dual of top-k (near-dup mining "
    "wants every neighbor in a radius, not a fixed k). Integer "
    "sign-hyperplanes bucket the corpus, with the plane count ADAPTIVE "
    "in corpus size (clamp(bit_length((n-1)/8), 6, 16) — bucket "
    "occupancy stays ~8, so candidate pairs stay near-linear; the r6 "
    "sweep caught the fixed-6-plane form going 9x at the top step); "
    "candidates meet only inside a bucket; the threshold is the "
    "pure-integer predicate dot^2*100 >= 9*na*nb (no float boundary), "
    "cosine reported via IEEE-exact sqrt; production tau ~0.9, fixture "
    "embeddings are random so 0.30 exercises the same plan",
)
def similarity_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the corpus never cross-joins — the self-join keys on the
    LSH bucket, the same banded shape as MinHash LSH; plane count grows
    log2 with the corpus (one eager count — the documented
    strategy-choice exception), keeping per-bucket occupancy ~8 and the
    pair explosion linear. Integer quantization keeps every predicate
    exact. Recall < 1 by construction (bucket-blocked, like every LSH
    method); raise planes / add rotations for precision-recall trade."""
    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()
    n_planes = min(16, max(6, (max((n - 1) // 8, 1)).bit_length()))
    q = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 100, 0).cast("long")
        ).alias("qv"),
    )
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(c) for c in _rs_plane(p)])
        proj = F.aggregate(
            F.zip_with(F.col("qv"), plane, lambda x, c: x * c),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    b = q.withColumn("bucket", bucket)
    a = b.select(
        F.col("vec_id").alias("id_a"), F.col("qv").alias("qa"), "bucket"
    )
    c = b.select(
        F.col("vec_id").alias("id_b"), F.col("qv").alias("qb"), "bucket"
    )
    isum = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    pairs = (
        a.join(c, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "bucket",
            isum(F.zip_with("qa", "qb", lambda x, y: x * y)).alias("dot"),
            isum(F.transform("qa", lambda x: x * x)).alias("na"),
            isum(F.transform("qb", lambda x: x * x)).alias("nb"),
        )
    )
    return (
        pairs.filter(
            (F.col("dot") > 0)
            & (F.col("dot") * F.col("dot") * 100 >= 9 * F.col("na") * F.col("nb"))
        )
        .select(
            "id_a",
            "id_b",
            "bucket",
            F.round(
                F.col("dot").cast("double")
                / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))),
                4,
            ).alias("cosine_sim"),
        )
        .orderBy("id_a", "id_b")
    )


@register(
    "text_zipf_fit",
    oracle="""
    WITH w AS (
        SELECT UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(text), '\\s+'),
                                  x -> x <> '')) AS word
        FROM documents),
    cnts AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY word),
    top AS (SELECT word, cnt FROM cnts ORDER BY cnt DESC, word LIMIT 256),
    rk AS (SELECT cnt, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, word)
                            AS BIGINT) AS rank FROM top),
    terms AS (
        SELECT CAST(ROUND(LN(CAST(rank AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
               CAST(ROUND(LN(CAST(cnt AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
        FROM rk),
    agg AS (
        SELECT CAST(COUNT(*) AS DECIMAL(10,0)) AS n,
               CAST(SUM(x) AS DECIMAL(18,6)) AS sx,
               CAST(SUM(y) AS DECIMAL(18,6)) AS sy,
               CAST(ROUND(SUM(x * y), 6) AS DECIMAL(18,6)) AS sxy,
               CAST(ROUND(SUM(x * x), 6) AS DECIMAL(18,6)) AS sxx
        FROM terms)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cnts) AS n_types,
           CAST(n AS BIGINT) AS n_fit,
           CAST(CAST(ROUND(n * sxy - sx * sy, 6) AS DECIMAL(18,6)) AS DOUBLE)
           / CAST(CAST(ROUND(n * sxx - sx * sx, 6) AS DECIMAL(18,6)) AS DOUBLE)
             AS zipf_slope
    FROM agg
    """,
    desc="Zipf-law fit over the corpus frequency spectrum: OLS slope of "
    "log(freq) on log(rank) for the top-256 types — the classic corpus "
    "health check (natural text ~ -1; templated/boilerplate corpora "
    "deviate hard). Rounded-log-term decimal sums (the cross-engine LN "
    "discipline); slope is one IEEE division of exact decimals",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus touches one explode + one map-side-combinable word count;
    the fit runs on 256 rows via TakeOrderedAndProject (never a global
    sort); n_types is the same aggregate reused (lazy checkpoint)."""
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    cnts = (
        docs.select(
            F.explode(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    top = cnts.orderBy(F.desc("cnt"), "word").limit(256)
    rk = top.select(
        "cnt",
        F.row_number()
        .over(W.orderBy(F.desc("cnt"), "word"))
        .cast("bigint")
        .alias("rank"),
    )
    d6 = "decimal(18,6)"
    terms = rk.select(
        F.round(F.log(F.col("rank").cast("double")), 6).cast(d6).alias("x"),
        F.round(F.log(F.col("cnt").cast("double")), 6).cast(d6).alias("y"),
    )
    # Every decimal stays inside (18,6)/(10,0) bounds so no engine hits
    # its precision-overflow scale-reduction path (Spark reduces scale on
    # wide products, DuckDB doesn't — the r6 zipf lesson); products are
    # exact, ROUND(...,6) shrinks the unscaled value below 2^53 before
    # the only two double casts, and the slope is one IEEE division.
    agg = terms.agg(
        F.count("*").cast("decimal(10,0)").alias("n"),
        F.sum("x").cast("decimal(18,6)").alias("sx"),
        F.sum("y").cast("decimal(18,6)").alias("sy"),
        F.round(F.sum(F.col("x") * F.col("y")), 6).cast("decimal(18,6)").alias("sxy"),
        F.round(F.sum(F.col("x") * F.col("x")), 6).cast("decimal(18,6)").alias("sxx"),
    )
    n_types = cnts.agg(F.count("*").cast("bigint").alias("n_types"))
    num = F.round(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"), 6).cast(
        "decimal(18,6)"
    )
    den = F.round(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), 6).cast(
        "decimal(18,6)"
    )
    return n_types.crossJoin(agg).select(
        "n_types",
        F.col("n").cast("bigint").alias("n_fit"),
        (num.cast("double") / den.cast("double")).alias("zipf_slope"),
    )


@register(
    "graph_degree_distribution",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        WHERE l_orderkey % 10 = 0),
    edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    deg AS (
        SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT u AS n FROM edges UNION ALL SELECT v FROM edges)
        GROUP BY n)
    SELECT CAST(LENGTH(BIN(d)) - 1 AS BIGINT) AS log2_bin,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           MIN(d) AS min_deg, MAX(d) AS max_deg
    FROM deg GROUP BY log2_bin ORDER BY log2_bin
    """,
    desc="log2-binned degree distribution of the sampled co-purchase "
    "graph — THE skew diagnostic every graph plan decision here keys on "
    "(salting width, hub caps, broadcast vs merge closing); the bin is "
    "the INTEGER bit-length of the degree (LENGTH(BIN(d))-1 in both "
    "engines), so no float log can straddle a power of two",
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two map-side-combinable aggs (degree, then histogram) — the cheap
    pre-flight a 100 TB graph job runs to pick its skew strategy."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 10 == 0)
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("n"))
        .union(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("d"))
    )
    return (
        deg.groupBy(
            (F.length(F.bin(F.col("d"))) - 1).cast("long").alias("log2_bin")
        )
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.min("d").alias("min_deg"),
            F.max("d").alias("max_deg"),
        )
        .orderBy("log2_bin")
    )


@register(
    "multimodal_jfif_real",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN NULL ELSE 1 END AS version_major,
           CASE WHEN doc_id % 3 = 0 THEN NULL ELSE 2 END AS version_minor,
           CASE WHEN doc_id % 3 = 0 THEN NULL
                ELSE CAST(doc_id % 3 AS INT) END AS units,
           CASE WHEN doc_id % 3 = 0 THEN NULL
                ELSE CAST(72 + doc_id % 120 AS INT) END AS xdensity,
           CASE WHEN doc_id % 3 = 0 THEN NULL
                ELSE CAST(72 + (7 * doc_id) % 120 AS INT) END AS ydensity
    FROM documents ORDER BY doc_id
    """,
    desc="REAL APP0/JFIF density walk: JPEGs synthesized with (and every "
    "third doc WITHOUT) a JFIF segment — version/units/x-y density "
    "parsed back by the real marker walk, JFIF-less files yield NULLs "
    "instead of failing; the dpi prune columns a print/scan corpus "
    "filters on before decoding pixels",
)
def multimodal_jfif_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/multimodal.py sniff_jfif/decode_jfif_metadata: narrow
    Arrow map, payloads never shuffle; the APP0 segment is transparent
    to every existing decode path (length-skipping marker walks)."""
    from gearpump_spark.operators.multimodal import (
        decode_jfif_metadata,
        synthesize_jpeg_jfif_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return decode_jfif_metadata(synthesize_jpeg_jfif_payloads(docs)).orderBy(
        "doc_id"
    )


@register(
    "dedup_savings_report",
    oracle=_SQL_CLUSTERS_CTES
    + """,
    members AS (
        SELECT c.cluster_id, d.doc_id, d.n_chars
        FROM clusters c JOIN documents d USING (doc_id)),
    per_cluster AS (
        SELECT cluster_id,
               COUNT(*) AS n_members,
               SUM(n_chars) AS chars_total,
               MAX(n_chars) AS chars_kept
        FROM members GROUP BY cluster_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(n_members) AS BIGINT) AS n_docs,
           CAST(SUM(n_members - 1) AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN n_members > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_clusters,
           CAST(SUM(chars_total) AS BIGINT) AS chars_total,
           CAST(SUM(chars_total - chars_kept) AS BIGINT) AS chars_saved,
           CAST(SUM(chars_total - chars_kept) AS DOUBLE) / SUM(chars_total)
             AS savings_frac
    FROM per_cluster
    """,
    desc="dedup ROI report: one-row rollup of the LSH->CC clustering — "
    "clusters, docs dropped (keep the longest copy per cluster), chars "
    "saved and the savings fraction; the summary every curation run "
    "prints before anyone signs off on deleting data",
)
def dedup_savings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition: near-linear LSH + CC produce cluster ids; the report
    is two map-side-combinable aggs over (cluster_id, n_chars) pairs —
    document bodies never move."""
    from gearpump_spark.operators.graph import connected_components

    docs = table(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs, k=6)
    pairs = D.lsh_candidate_pairs(sig, k=6, rows_per_band=2)
    comps = connected_components(
        pairs, nodes=docs.select("doc_id"), src="a", dst="b"
    ).select(F.col("node_id").alias("doc_id"), F.col("comp").alias("cluster_id"))
    members = comps.join(docs.select("doc_id", "n_chars"), "doc_id")
    per_cluster = members.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        F.sum("n_chars").alias("chars_total"),
        F.max("n_chars").alias("chars_kept"),
    )
    return per_cluster.agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.sum("n_members").cast("long").alias("n_docs"),
        F.sum(F.col("n_members") - 1).cast("long").alias("n_dropped"),
        F.sum(F.when(F.col("n_members") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_clusters"),
        F.sum("chars_total").cast("long").alias("chars_total"),
        F.sum(F.col("chars_total") - F.col("chars_kept"))
        .cast("long")
        .alias("chars_saved"),
        (
            F.sum(F.col("chars_total") - F.col("chars_kept")).cast("double")
            / F.sum("chars_total")
        ).alias("savings_frac"),
    )


@register(
    "text_retrieval_eval",
    oracle=f"""
    WITH {_SQL_BM25_RANKS},
    qv AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0),
    cos AS (
        SELECT e.vec_id AS doc_id,
               ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(e.embedding) + 1),
                         i -> CAST(e.embedding[i] AS DOUBLE)
                              * CAST(q.q_vec[i] AS DOUBLE)))
                     / (SQRT(LIST_SUM(LIST_TRANSFORM(e.embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                        * SQRT(LIST_SUM(LIST_TRANSFORM(q.q_vec,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                     4) AS sim
        FROM embeddings e CROSS JOIN qv q),
    sem AS (
        SELECT doc_id, r FROM (
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id)
                        AS BIGINT) AS r
            FROM cos) WHERE r <= 10),
    rel AS (
        SELECT doc_id FROM (
            SELECT doc_id, COUNT(DISTINCT word) AS nw FROM qw
            GROUP BY doc_id) WHERE nw = 3),
    ranked AS (
        SELECT 'bm25' AS ranker, doc_id, r FROM lex WHERE r <= 10
        UNION ALL
        SELECT 'cosine', doc_id, r FROM sem),
    scored AS (
        SELECT ranked.ranker, ranked.r,
               CASE WHEN rel.doc_id IS NULL THEN 0 ELSE 1 END AS hit
        FROM ranked LEFT JOIN rel ON rel.doc_id = ranked.doc_id)
    SELECT ranker,
           CAST((SELECT COUNT(*) FROM rel) AS BIGINT) AS n_relevant,
           CAST(SUM(hit) AS BIGINT) AS hits_at_10,
           CAST(SUM(hit) AS DOUBLE) / 10.0 AS p_at_10,
           COALESCE(1.0 / MIN(CASE WHEN hit = 1 THEN r END), 0.0) AS mrr
    FROM scored GROUP BY ranker ORDER BY ranker
    """,
    desc="retrieval evaluation harness: precision@10 and MRR of the BM25 "
    "lexical and embedding-cosine rankers against an exact conjunctive-"
    "match relevance set — the eval loop every retrieval stack runs "
    "after swapping rankers; rank-reciprocal metrics only (one IEEE "
    "division), no log-discount nDCG whose libm could differ by engine",
)
def text_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both rank lists are TakeOrdered top-10s; relevance is a tiny
    conjunctive-match set; metrics aggregate <=20 rows."""
    from pyspark.sql import Window as W

    from gearpump_spark.operators.retrieval import bm25_topk, tokenized_docs
    from gearpump_spark.operators.similarity import cosine

    docs = table(spark, sf_dir, "documents")
    terms = ("vector", "merge", "stream")
    # One tokenize pass shared by the BM25 ranker AND the relevance set
    # (r11, the wedge-tier checkpoint lesson): both legs tokenize the same
    # corpus, and without the cut the plan carried two full regex-tokenize
    # subtrees. Lazy localCheckpoint — blocks materialize at first action.
    toks = tokenized_docs(docs).localCheckpoint(eager=False)
    lexw = W.orderBy(F.desc("score"), F.col("doc_id"))
    lex = (
        bm25_topk(docs, terms, k=10, toks=toks)
        .select("doc_id", F.row_number().over(lexw).cast("bigint").alias("r"))
    )
    emb = table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_vec"))
    scored = emb.crossJoin(F.broadcast(qv)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(cosine(F.col("embedding"), F.col("q_vec")), 4).alias("sim"),
    )
    semw = W.orderBy(F.desc("sim"), F.col("doc_id"))
    sem = (
        scored.orderBy(F.desc("sim"), "doc_id")
        .limit(10)
        .select("doc_id", F.row_number().over(semw).cast("bigint").alias("r"))
    )
    # Relevance leg reads the SAME checkpointed tokens (split-then-lower ≡
    # lower-then-split for this whitespace class: lowercasing never maps a
    # character into or out of [ \t\n\f\r], so the token multiset is
    # identical — oracle hash-verified).
    rel = (
        toks.select("doc_id", F.explode("tk").alias("word"))
        .where(F.col("word").isin(*terms))
        .groupBy("doc_id")
        .agg(F.count_distinct("word").alias("nw"))
        .where(F.col("nw") == 3)
        .select("doc_id")
    )
    ranked = lex.select(F.lit("bm25").alias("ranker"), "doc_id", "r").unionByName(
        sem.select(F.lit("cosine").alias("ranker"), "doc_id", "r")
    )
    scored2 = ranked.join(
        F.broadcast(rel.withColumn("_hit", F.lit(1))), "doc_id", "left"
    ).select("ranker", "r", F.coalesce(F.col("_hit"), F.lit(0)).alias("hit"))
    n_rel = rel.agg(F.count("*").cast("long").alias("n_relevant"))
    return (
        scored2.groupBy("ranker")
        .agg(
            F.sum("hit").cast("long").alias("hits_at_10"),
            (F.sum("hit").cast("double") / F.lit(10.0)).alias("p_at_10"),
            F.coalesce(
                F.lit(1.0)
                / F.min(F.when(F.col("hit") == 1, F.col("r"))),
                F.lit(0.0),
            ).alias("mrr"),
        )
        .crossJoin(F.broadcast(n_rel))
        .select("ranker", "n_relevant", "hits_at_10", "p_at_10", "mrr")
        .orderBy("ranker")
    )


@register(
    "embedding_top_pc",
    # rows-only: power iteration's float matvec is summation-order-
    # dependent (same class as pagerank/kmeans float flagships); the
    # numpy golden in tests/test_operators_unit.py holds the exactness
    # evidence (cos > 0.999 to the eigh component, eigenvalue within 1%)
    desc="dominant principal component of the embedding table via power "
    "iteration (one narrow-map dot + one combiner-friendly per-dim agg "
    "per round, dim floats to the driver) — the anisotropy probe run "
    "before JL/PQ when one direction dominates a contrastive embedding "
    "space; rows-only (float iterative), numpy-goldened",
)
def embedding_top_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/similarity.py top_principal_component. Emits one row:
    the unit component (rounded, joined) and the eigenvalue estimate."""
    from gearpump_spark.operators.similarity import top_principal_component

    emb = table(spark, sf_dir, "embeddings")
    v, lam = top_principal_component(emb, n_iter=12)
    comp = ",".join(f"{round(x, 6):.6f}" for x in v)
    return spark.createDataFrame(
        [(comp, float(round(lam, 6)))], "component string, eigenvalue double"
    )


@register(
    "multimodal_exif_real",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 4 = 0 THEN NULL
                ELSE CAST(1 + doc_id % 8 AS INT) END AS orientation,
           CASE WHEN doc_id % 4 = 0 THEN NULL
                WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order
    FROM documents ORDER BY doc_id
    """,
    desc="REAL APP1/Exif orientation walk: JPEGs synthesized with a "
    "minimal embedded TIFF (alternating II/MM byte order — BOTH "
    "endiannesses parsed from real bytes), every fourth doc without "
    "Exif yielding NULLs; the rotate-before-hash prerequisite that "
    "keeps pHash/resize from splitting one photo into 8 'distinct' ones",
)
def multimodal_exif_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/multimodal.py sniff_exif_orientation /
    decode_exif_orientation: narrow Arrow map, payloads never shuffle;
    APP1 is transparent to every decode path (length-skipping walks)."""
    from gearpump_spark.operators.multimodal import (
        decode_exif_orientation,
        synthesize_jpeg_exif_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return decode_exif_orientation(synthesize_jpeg_exif_payloads(docs)).orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# r5 additions: unigram LM scoring + character entropy (quality signals)
# ---------------------------------------------------------------------------
# Both metrics are log-based, and LN/LOG2 are NOT correctly rounded on
# either engine (measured: 124/5000 LN and 1574/5000 LOG2 values differ by
# 1 ulp between the JVM and libm). The discipline: round every log TERM to
# a fixed decimal scale first — a 1-ulp input wobble only matters within
# ~1e-13 of a rounding boundary (odds ~1e-9/term) — then CAST to DECIMAL
# and sum exactly, so partial-aggregation order can never move the result.


@register(
    "text_unigram_logprob",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, UNNEST(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]+')) AS tok
        FROM documents),
    vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    total AS (SELECT SUM(c) AS n FROM vocab),
    doc_tok AS (
        SELECT doc_id, tok, COUNT(*) AS m FROM toks GROUP BY doc_id, tok),
    terms AS (
        SELECT d.doc_id, d.m,
               CAST(ROUND(LN(CAST(v.c AS DOUBLE) / CAST(t.n AS DOUBLE)), 4)
                    AS DECIMAL(12,4)) AS lp
        FROM doc_tok d JOIN vocab v USING (tok) CROSS JOIN total t)
    SELECT doc_id,
           CAST(SUM(m) AS BIGINT) AS n_tokens,
           CAST(SUM(m * lp) AS DOUBLE) AS logprob_sum,
           CAST(SUM(m * lp) AS DOUBLE) / CAST(SUM(m) AS BIGINT) AS avg_logprob
    FROM terms GROUP BY doc_id ORDER BY doc_id
    """,
    desc="unigram LM quality score: corpus-estimated token probabilities, "
    "per-doc sum/avg log-likelihood — the cheapest perplexity proxy for "
    "corpus filtering (low avg_logprob = rare-token-heavy or junk text); "
    "log terms rounded to 4 decimals then summed as EXACT decimals so "
    "neither engine's 1-ulp LN wobble nor partial-agg order moves the "
    "result",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two shuffles (corpus vocab agg, per-doc agg) + one vocab join that
    AQE broadcasts when the vocab is small; the corpus total N rides in as
    a 1-row cross join, never a collect. At 100 TB the vocab join is the
    shuffle to watch — token-keyed, so Zipf skew on stopwords is bounded
    by the per-doc pre-aggregation (doc_tok collapses repeats BEFORE the
    join)."""
    docs = table(spark, sf_dir, "documents")
    # The token relation feeds the vocab aggregate AND the per-doc
    # counts, and the vocab feeds its total AND the scoring join — fully
    # lazy, each leg re-ran the regex-extract scan. Lazy localCheckpoints
    # (r11 shared-relation discipline): tokenize once, vocab agg once.
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z]+"), F.lit(0))
        ).alias("tok"),
    ).localCheckpoint(eager=False)
    vocab = (
        toks.groupBy("tok").agg(F.count("*").alias("c")).localCheckpoint(eager=False)
    )
    total = vocab.agg(F.sum("c").alias("n"))
    doc_tok = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("m"))
    lp = F.round(
        F.log(F.col("c").cast("double") / F.col("n").cast("double")), 4
    ).cast("decimal(12,4)")
    terms = doc_tok.join(vocab, "tok").crossJoin(F.broadcast(total)).select(
        "doc_id", "m", lp.alias("lp")
    )
    s = F.sum(F.col("m") * F.col("lp"))
    return (
        terms.groupBy("doc_id")
        .agg(
            F.sum("m").cast("bigint").alias("n_tokens"),
            s.cast("double").alias("logprob_sum"),
            (s.cast("double") / F.sum("m").cast("bigint")).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_char_entropy",
    oracle=r"""
    WITH chars AS (
        SELECT doc_id, UNNEST(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z ]')) AS ch
        FROM documents),
    counts AS (
        SELECT doc_id, ch, COUNT(*) AS c,
               SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS n
        FROM chars GROUP BY doc_id, ch),
    terms AS (
        SELECT doc_id, c, n,
               CAST(ROUND((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                          * LOG2(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 5)
                    AS DECIMAL(12,5)) AS t
        FROM counts)
    SELECT doc_id,
           CAST(MAX(n) AS BIGINT) AS n_chars,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(-SUM(t) AS DOUBLE) AS entropy_bits
    FROM terms GROUP BY doc_id ORDER BY doc_id
    """,
    desc="character-distribution entropy (bits): per-doc Shannon entropy "
    "over [a-z ] characters — a classic junk screen (natural language "
    "sits ~4.0-4.2 bits; keyboard mash, base64 blobs and repeated-char "
    "padding land far off); p*log2(p) terms rounded then summed as exact "
    "decimals (same cross-engine log discipline as text_unigram_logprob)",
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle (per-doc char counts; the window total rides the same
    partitioning). Character alphabet is bounded, so per-doc state is a
    few dozen rows regardless of corpus size."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z ]"), F.lit(0))
        ).alias("ch"),
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    counts = counts.withColumn(
        "n", F.sum("c").over(Window.partitionBy("doc_id"))
    )
    p = F.col("c").cast("double") / F.col("n").cast("double")
    t = F.round(p * F.log2(p), 5).cast("decimal(12,5)")
    return (
        counts.select("doc_id", "c", "n", t.alias("t"))
        .groupBy("doc_id")
        .agg(
            F.max("n").cast("bigint").alias("n_chars"),
            F.count("*").cast("bigint").alias("n_distinct"),
            (-F.sum("t")).cast("double").alias("entropy_bits"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# r5 additions: per-node clustering coefficient, IVF recall eval, multi-PC
# ---------------------------------------------------------------------------


@register(
    "graph_clustering_coeff",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    deg AS (
        SELECT n, COUNT(*) AS d FROM (
            SELECT u AS n FROM und UNION ALL SELECT v FROM und)
        GROUP BY n),
    oriented AS (
        SELECT CASE WHEN (du, u) < (dv, v) THEN u ELSE v END AS s,
               CASE WHEN (du, u) < (dv, v) THEN v ELSE u END AS t
        FROM und
        JOIN deg d1 ON d1.n = und.u
        JOIN deg d2 ON d2.n = und.v,
        LATERAL (SELECT d1.d AS du, d2.d AS dv) x),
    wedges AS (
        SELECT e1.s, e1.t AS t1, e2.t AS t2
        FROM oriented e1 JOIN oriented e2 ON e1.s = e2.s AND e1.t < e2.t),
    closing AS (
        SELECT LEAST(s, t) AS c1, GREATEST(s, t) AS c2 FROM oriented),
    tri AS (
        SELECT w.s, LEAST(w.t1, w.t2) AS c1, GREATEST(w.t1, w.t2) AS c2
        FROM wedges w SEMI JOIN closing c
          ON c.c1 = LEAST(w.t1, w.t2) AND c.c2 = GREATEST(w.t1, w.t2)),
    per_node AS (
        SELECT n, SUM(t) AS n_triangles FROM (
            SELECT s AS n, COUNT(*) AS t FROM tri GROUP BY s
            UNION ALL SELECT c1, COUNT(*) FROM tri GROUP BY c1
            UNION ALL SELECT c2, COUNT(*) FROM tri GROUP BY c2)
        GROUP BY n)
    SELECT deg.n AS node, CAST(deg.d AS BIGINT) AS degree,
           CAST(COALESCE(p.n_triangles, 0) AS BIGINT) AS n_triangles,
           CASE WHEN deg.d >= 2 THEN
               ROUND(2.0 * COALESCE(p.n_triangles, 0)
                     / (CAST(deg.d AS DOUBLE) * (CAST(deg.d AS DOUBLE) - 1.0)), 4)
           END AS coeff
    FROM deg LEFT JOIN per_node p ON p.n = deg.n
    ORDER BY degree DESC, node LIMIT 100
    """,
    desc="local clustering coefficient (top-100 hubs of the co-purchase "
    "graph): 2*tri(v)/(deg*(deg-1)) via the degree-ordered wedge join, "
    "with the closing join keeping corner identities so each triangle "
    "credits all three corners — the community-structure probe next to "
    "the global triangle count",
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/graph.py clustering_coefficient: salted wedge join,
    pinned exchange width, per-corner credits pre-aggregated before the
    3-way union; top-100 cut is TakeOrdered."""
    from gearpump_spark.operators.graph import clustering_coefficient

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
    return clustering_coefficient(edges, top_n=100)


@register(
    "similarity_ivf_recall",
    oracle=f"""
    WITH cent AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cvec
        FROM embeddings ORDER BY vec_id LIMIT 8),
    corpus_assign AS (
        SELECT vec_id, embedding, cid FROM (
            SELECT e.vec_id, e.embedding, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                       {_IVF_SQDIST_SQL.format(e='e.embedding', c='c.cvec')},
                       c.cid) AS rn
            FROM embeddings e CROSS JOIN cent c)
        WHERE rn = 1),
    probes AS (
        SELECT q_id, q_vec, cid FROM (
            SELECT e.vec_id AS q_id, e.embedding AS q_vec, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                       {_IVF_SQDIST_SQL.format(e='e.embedding', c='c.cvec')},
                       c.cid) AS rn
            FROM embeddings e CROSS JOIN cent c
            WHERE e.vec_id < 25)
        WHERE rn <= 3),
    ivf AS (
        SELECT q_id, vec_id FROM (
            SELECT s.*, ROW_NUMBER() OVER (PARTITION BY q_id
                        ORDER BY cosine_sim DESC, vec_id) AS rank FROM (
                SELECT p.q_id, a.vec_id,
                       ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(a.embedding) + 1),
                              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(p.q_vec[i] AS DOUBLE)))
                         / (SQRT(LIST_SUM(LIST_TRANSFORM(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                            * SQRT(LIST_SUM(LIST_TRANSFORM(p.q_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                         4) AS cosine_sim
                FROM corpus_assign a JOIN probes p USING (cid)) s)
        WHERE rank <= 5),
    brute AS (
        SELECT q_id, vec_id FROM (
            SELECT s.*, ROW_NUMBER() OVER (PARTITION BY q_id
                        ORDER BY cosine_sim DESC, vec_id) AS rank FROM (
                SELECT q.vec_id AS q_id, e.vec_id,
                       ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(e.embedding) + 1),
                              i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
                         / (SQRT(LIST_SUM(LIST_TRANSFORM(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                            * SQRT(LIST_SUM(LIST_TRANSFORM(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                         4) AS cosine_sim
                FROM embeddings e CROSS JOIN embeddings q
                WHERE q.vec_id < 25) s)
        WHERE rank <= 5)
    SELECT b.q_id,
           CAST(COUNT(i.vec_id) AS BIGINT) AS n_hits,
           CAST(COUNT(i.vec_id) AS DOUBLE) / 5.0 AS recall_at_5
    FROM brute b LEFT JOIN ivf i USING (q_id, vec_id)
    GROUP BY b.q_id ORDER BY b.q_id
    """,
    desc="ANN quality gate: recall@5 of the seeded-IVF index (nprobe=3 "
    "of 8 lists) against brute-force cosine truth for 25 queries — the "
    "measurement that decides nprobe/nlist before anyone trusts an "
    "approximate index; fully closed-form, so even the recall numbers "
    "hash-match",
)
def similarity_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute side: corpus-partitioned scan with the 25-query side
    broadcast (corpus never shuffles); IVF side probes 3/8 lists. The
    recall join keys on (q_id, vec_id) — 125 rows per side."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    truth = S.cosine_topk(q, emb, k=5).select("q_id", "vec_id")
    approx = S.cosine_topk_ivf(q, emb, nlist=8, nprobe=3, k=5, refine=False).select(
        "q_id", "vec_id", F.lit(1).alias("_hit")
    )
    return (
        truth.join(approx, ["q_id", "vec_id"], "left")
        .groupBy("q_id")
        .agg(
            F.count("_hit").cast("bigint").alias("n_hits"),
            (F.count("_hit").cast("double") / F.lit(5.0)).alias("recall_at_5"),
        )
        .orderBy("q_id")
    )


@register(
    "embedding_top_pcs",
    # rows-only: same float-matvec class as embedding_top_pc; the numpy
    # golden (tests/test_operators_unit.py) checks top-3 eigenvalues
    # within 1% and |cos| > 0.999 per component against numpy.linalg.eigh
    desc="top-3 principal components by power iteration with Hotelling "
    "deflation (Gram-Schmidt against found components each round, on the "
    "driver): the spectrum probe that decides how many directions to "
    "remove before JL/PQ — rows-only (float iterative), numpy-goldened",
)
def embedding_top_pcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/similarity.py top_principal_components: per round ONE
    narrow dot + one per-dim combiner agg; only k*dim floats ever reach
    the driver."""
    from gearpump_spark.operators.similarity import top_principal_components

    emb = table(spark, sf_dir, "embeddings")
    comps = top_principal_components(emb, n_components=3, n_iter=12)
    rows = [
        (i, ",".join(f"{round(x, 6):.6f}" for x in v), float(round(lam, 6)))
        for i, (v, lam) in enumerate(comps)
    ]
    return spark.createDataFrame(
        rows, "pc_idx int, component string, eigenvalue double"
    ).orderBy("pc_idx")


@register(
    "multimodal_mulaw_real",
    oracle="""
    WITH p AS (
        SELECT doc_id,
               LIST_TRANSFORM(RANGE(0, 8), k -> (5 * doc_id + 17 * k) % 256) AS bs
        FROM documents),
    dec AS (
        SELECT doc_id,
               LIST_TRANSFORM(bs, b -> CASE
                   WHEN (255 - b) >= 128 THEN
                       132 - ((((255 - b) % 16) * 8 + 132)
                              * CAST(POW(2, ((255 - b) // 16) % 8) AS BIGINT))
                   ELSE ((((255 - b) % 16) * 8 + 132)
                         * CAST(POW(2, ((255 - b) // 16) % 8) AS BIGINT)) - 132
               END) AS xs
        FROM p)
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                ELSE CAST(8 AS BIGINT) END AS n_samples,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                ELSE CAST(LIST_SUM(xs) AS BIGINT) END AS sample_sum,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                ELSE CAST(LIST_MIN(xs) AS BIGINT) END AS sample_min,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                ELSE CAST(LIST_MAX(xs) AS BIGINT) END AS sample_max
    FROM dec ORDER BY doc_id
    """,
    desc="REAL G.711 mu-law decode (ITU-T G.711, wFormatTag 7): "
    "log-companded bytes expanded to 16-bit linear PCM via the CCITT "
    "integer formula — pure integer arithmetic, so the oracle replays "
    "the expansion in SQL byte for byte; every 7th payload is a "
    "truncated container exercising the null path (telephony corpora "
    "are the classic mu-law estate)",
)
def multimodal_mulaw_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/multimodal.py _decode_mulaw_data: Arrow-batched narrow
    map; payload bytes never shuffle, only 4 aggregate ints per doc do."""
    from gearpump_spark.operators.multimodal import (
        audio_sample_stats,
        synthesize_wav_mulaw_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return audio_sample_stats(synthesize_wav_mulaw_payloads(docs)).orderBy("doc_id")


@register(
    "multimodal_alaw_real",
    oracle="""
    WITH p AS (
        SELECT doc_id,
               LIST_TRANSFORM(RANGE(0, 8),
                              k -> XOR((3 * doc_id + 29 * k) % 256, 85)) AS bs
        FROM documents),
    dec AS (
        SELECT doc_id,
               LIST_TRANSFORM(bs, a -> CASE
                   WHEN a >= 128 THEN
                       CASE WHEN (a // 16) % 8 = 0 THEN (a % 16) * 16 + 8
                            ELSE ((a % 16) * 16 + 264)
                                 * CAST(POW(2, (a // 16) % 8 - 1) AS BIGINT) END
                   ELSE
                       -(CASE WHEN (a // 16) % 8 = 0 THEN (a % 16) * 16 + 8
                              ELSE ((a % 16) * 16 + 264)
                                   * CAST(POW(2, (a // 16) % 8 - 1) AS BIGINT) END)
               END) AS xs
        FROM p)
    SELECT doc_id,
           CASE WHEN doc_id % 6 = 0 THEN NULL
                ELSE CAST(8 AS BIGINT) END AS n_samples,
           CASE WHEN doc_id % 6 = 0 THEN NULL
                ELSE CAST(LIST_SUM(xs) AS BIGINT) END AS sample_sum,
           CASE WHEN doc_id % 6 = 0 THEN NULL
                ELSE CAST(LIST_MIN(xs) AS BIGINT) END AS sample_min,
           CASE WHEN doc_id % 6 = 0 THEN NULL
                ELSE CAST(LIST_MAX(xs) AS BIGINT) END AS sample_max
    FROM dec ORDER BY doc_id
    """,
    desc="REAL G.711 A-law decode (ITU-T G.711, wFormatTag 6): XOR-0x55 "
    "toggled bytes expanded to 13-bit-magnitude linear PCM via the CCITT "
    "integer formula (seg 0: m*16+8; else (m*16+264)<<(seg-1); sign bit "
    "SET = positive) — pure integer arithmetic, so the oracle replays "
    "the expansion in SQL byte for byte; every 6th payload is a "
    "truncated container exercising the null path (A-law is the E1/"
    "European telephony estate, the mu-law sibling)",
)
def multimodal_alaw_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/multimodal.py _decode_alaw_data: Arrow-batched narrow
    map; payload bytes never shuffle, only 4 aggregate ints per doc do."""
    from gearpump_spark.operators.multimodal import (
        audio_sample_stats,
        synthesize_wav_alaw_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return audio_sample_stats(synthesize_wav_alaw_payloads(docs)).orderBy("doc_id")


@register(
    "embedding_center_project",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               LIST_TRANSFORM(embedding,
                   x -> CAST(FLOOR((CAST(x AS DOUBLE) + 2.0) * 1000000)
                             AS BIGINT)) AS qv
        FROM embeddings),
    dims AS (
        SELECT vec_id, CAST(i AS INT) - 1 AS j, qv[CAST(i AS INT)] AS v
        FROM q, UNNEST(RANGE(1, LEN(qv) + 1)) t(i)),
    mean AS (
        -- CAST: SUM(BIGINT) is HUGEINT in DuckDB; keep everything BIGINT
        SELECT j, CAST(SUM(v) // COUNT(*) AS BIGINT) AS m FROM dims GROUP BY j),
    centered AS (
        SELECT d.vec_id, d.j, d.v - m.m AS c FROM dims d JOIN mean m USING (j)),
    ranked AS (
        SELECT vec_id, j, c,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY ABS(c) DESC, j) AS rn
        FROM centered)
    SELECT s.vec_id, s.norm2_micro, r.j AS peak_dim,
           CAST(r.c AS BIGINT) AS peak_val
    FROM (SELECT vec_id, CAST(SUM(c * c) AS BIGINT) AS norm2_micro
          FROM centered GROUP BY vec_id) s
    JOIN ranked r ON r.vec_id = s.vec_id AND r.rn = 1
    ORDER BY s.vec_id
    """,
    desc="exact embedding centering: coordinates quantized to BIGINT "
    "micro-units (the PQ convention), per-dim floor-mean subtracted, "
    "per-vector centered norm-squared + dominant deviation dim — the "
    "mean-subtraction preprocessing before anisotropy correction, in "
    "pure integer arithmetic so the whole pass hash-checks (a float "
    "mean could never: summation order)",
)
def embedding_center_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One posexplode + per-dim agg (64 rows broadcast back) + one
    per-vector agg: the corpus is scanned twice, nothing but (dim) longs
    and per-vector scalars ever shuffle."""
    emb = table(spark, sf_dir, "embeddings")
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.floor((x.cast("double") + F.lit(2.0)) * F.lit(1000000.0)).cast(
            "long"
        ),
    )
    # The exploded (vec_id, j, v) relation feeds the per-dim mean AND the
    # centering join, and the centered relation feeds the norm aggregate
    # AND the peak window — fully lazy, each leg re-ran the posexplode
    # scan. Lazy localCheckpoints (r11 shared-relation discipline): the
    # corpus explodes once, centers once.
    dims = emb.select("vec_id", F.posexplode(qv).alias("j", "v")).localCheckpoint(
        eager=False
    )
    mean = dims.groupBy("j").agg(
        F.floor(F.sum("v") / F.count("*")).cast("long").alias("m")
    )
    centered = (
        dims.join(F.broadcast(mean), "j")
        .select("vec_id", "j", (F.col("v") - F.col("m")).alias("c"))
        .localCheckpoint(eager=False)
    )
    from pyspark.sql import Window as W

    norms = centered.groupBy("vec_id").agg(
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("norm2_micro")
    )
    w = W.partitionBy("vec_id").orderBy(F.abs(F.col("c")).desc(), "j")
    peaks = (
        centered.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", F.col("j").alias("peak_dim"), F.col("c").alias("peak_val"))
    )
    return (
        norms.join(peaks, "vec_id")
        .select("vec_id", "norm2_micro", "peak_dim", "peak_val")
        .orderBy("vec_id")
    )


@register(
    "multimodal_qoi_real",
    oracle="""
    SELECT doc_id,
           CAST(2 + doc_id % 5 AS INT) AS width,
           CAST(1 + doc_id % 4 AS INT) AS height,
           CAST(LIST_SUM(LIST_TRANSFORM(RANGE(0, (2 + doc_id % 5) * (1 + doc_id % 4)),
               k -> CASE
                   WHEN (k // (2 + doc_id % 5) + doc_id) % 3 = 0 THEN
                       (13 * doc_id) % 256 + (11 * doc_id) % 256
                       + (7 * doc_id) % 256
                   WHEN doc_id % 5 = 0 THEN
                       (doc_id + k % (2 + doc_id % 5) + k // (2 + doc_id % 5)) % 256
                       + (2 * doc_id + k % (2 + doc_id % 5) + k // (2 + doc_id % 5)) % 256
                       + (3 * doc_id + k % (2 + doc_id % 5) + k // (2 + doc_id % 5)) % 256
                   ELSE
                       (doc_id + 3 * (k % (2 + doc_id % 5)) + 7 * (k // (2 + doc_id % 5))) % 256
                       + (2 * doc_id + 5 * (k % (2 + doc_id % 5)) + (k // (2 + doc_id % 5))) % 256
                       + (3 * doc_id + (k % (2 + doc_id % 5)) + 11 * (k // (2 + doc_id % 5))) % 256
               END)) AS BIGINT) AS px_sum
    FROM documents ORDER BY doc_id
    """,
    desc="REAL QOI decode (qoiformat.org 2021): constant rows compress "
    "to RUN ops, unit-gradient docs to DIFF, formula rasters to "
    "LUMA/INDEX/RGB — the full 3-channel op set decoded back and "
    "checksummed against closed-form pixel arithmetic",
)
def multimodal_qoi_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/multimodal.py decode_qoi_arr / encode_qoi: sequential
    per-byte state machine (prev pixel + 64-slot table) inside an
    Arrow-batched narrow map; payloads never shuffle."""
    from gearpump_spark.operators.multimodal import (
        pixel_stats,
        synthesize_qoi_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return pixel_stats(synthesize_qoi_payloads(docs)).orderBy("doc_id")


@register(
    "multimodal_tiff_pixels_real",
    oracle="""
    SELECT doc_id,
           CAST(2 + doc_id % 6 AS INT) AS width,
           CAST(1 + doc_id % 5 AS INT) AS height,
           CAST(3 * LIST_SUM(LIST_TRANSFORM(
               RANGE(0, (2 + doc_id % 6) * (1 + doc_id % 5)),
               k -> (doc_id + 5 * (k % (2 + doc_id % 6))
                     + 3 * (k // (2 + doc_id % 6))) % 256)) AS BIGINT) AS px_sum
    FROM documents ORDER BY doc_id
    """,
    desc="REAL baseline-TIFF decode: classic header in BOTH byte orders "
    "(II and MM alternating), IFD walk with left-justified SHORT values, "
    "multi-strip assembly (RowsPerStrip=2), WhiteIsZero inversion every "
    "third doc — gray rasters checksummed against closed-form arithmetic "
    "(the decode-side twin of the Exif APP1 TIFF walk)",
)
def multimodal_tiff_pixels_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/multimodal.py decode_tiff_arr: the photometric
    normalization makes stored-inverted and stored-direct payloads hash
    identically, which is exactly what the oracle checks (px_sum is the
    NORMALIZED gray sum x3 regardless of id % 3)."""
    from gearpump_spark.operators.multimodal import (
        pixel_stats,
        synthesize_tiff_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return pixel_stats(synthesize_tiff_payloads(docs)).orderBy("doc_id")


# ---------------------------------------------------------------------------
# r5 additions: 1-bit (binary) quantization + Hamming search, winsorization
# ---------------------------------------------------------------------------

# sign-bit words shared by the quantizer and the Hamming searcher: bit j of
# the lo/hi word is 1 iff embedding[j] > 0 (ties at 0 stay 0). Two UINT32-
# range words per 64-dim vector, kept in BIGINT so neither engine touches
# the sign bit.
_SQL_SIGN_WORDS = """
        SELECT vec_id,
               CAST(LIST_SUM(LIST_TRANSFORM(RANGE(1, 33),
                   i -> CASE WHEN CAST(embedding[CAST(i AS INT)] AS DOUBLE) > 0
                             THEN CAST(POW(2, i - 1) AS BIGINT) ELSE 0 END))
                   AS BIGINT) AS w_lo,
               CAST(LIST_SUM(LIST_TRANSFORM(RANGE(33, 65),
                   i -> CASE WHEN CAST(embedding[CAST(i AS INT)] AS DOUBLE) > 0
                             THEN CAST(POW(2, i - 33) AS BIGINT) ELSE 0 END))
                   AS BIGINT) AS w_hi
        FROM embeddings"""


def _sign_words(emb: DataFrame) -> DataFrame:
    """(vec_id, w_lo, w_hi): 64 sign bits packed into two 32-bit words."""
    def word(lo: int, hi: int):
        bits = F.slice(F.col("embedding"), lo + 1, hi - lo)
        return F.aggregate(
            F.zip_with(
                bits,
                F.sequence(F.lit(0), F.lit(hi - lo - 1)),
                # pow, not shiftleft: pyspark's shiftleft takes a literal
                # bit count; 2^i is exact in double for i <= 31
                lambda x, i: F.when(
                    x.cast("double") > 0,
                    F.pow(F.lit(2.0), i.cast("double")).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    return emb.select("vec_id", word(0, 32).alias("w_lo"), word(32, 64).alias("w_hi"))


@register(
    "embedding_quantize_binary",
    oracle=f"""
    WITH words AS ({_SQL_SIGN_WORDS})
    SELECT vec_id, w_lo, w_hi,
           CAST(BIT_COUNT(w_lo) + BIT_COUNT(w_hi) AS INT) AS n_pos
    FROM words ORDER BY vec_id
    """,
    desc="1-bit (sign) embedding quantization: 64 dims -> two 32-bit "
    "words, a 32x storage cut — the coarsest tier of the quantization "
    "ladder (float -> int8 -> int4 -> PQ -> binary) and the standard "
    "first-pass filter for billion-vector search; pure integer, exact "
    "oracle",
)
def embedding_quantize_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Narrow map, no shuffle: the sequential zip_with fold packs sign
    bits JVM-side; nothing but (id, 2 longs, count) leaves the scan."""
    emb = table(spark, sf_dir, "embeddings")
    w = _sign_words(emb)
    return w.select(
        "vec_id",
        "w_lo",
        "w_hi",
        (F.bit_count("w_lo") + F.bit_count("w_hi")).cast("int").alias("n_pos"),
    ).orderBy("vec_id")


@register(
    "similarity_topk_hamming",
    oracle=f"""
    WITH words AS ({_SQL_SIGN_WORDS}),
    q AS (SELECT vec_id AS q_id, w_lo AS q_lo, w_hi AS q_hi
          FROM words WHERE vec_id < 25),
    scored AS (
        SELECT q.q_id, w.vec_id,
               CAST(BIT_COUNT(XOR(w.w_lo, q.q_lo))
                    + BIT_COUNT(XOR(w.w_hi, q.q_hi)) AS INT) AS hamming
        FROM words w CROSS JOIN q WHERE w.vec_id <> q.q_id)
    SELECT q_id, vec_id, hamming, CAST(rank AS BIGINT) AS rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                    ORDER BY hamming, vec_id) AS rank
        FROM scored) WHERE rank <= 5
    ORDER BY q_id, rank
    """,
    desc="Hamming-space top-k over sign-quantized embeddings: XOR + "
    "popcount per candidate (2 ALU ops against 64 float multiplies for "
    "cosine) — the binary pre-rank that makes a billion-vector first "
    "pass affordable before exact re-ranking; integer-exact, so even "
    "the approximate ranking hash-checks",
)
def similarity_topk_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 25-query side broadcasts; the corpus word table never
    shuffles (same shape as cosine_topk but with 16 bytes/vector of
    state instead of 256)."""
    emb = table(spark, sf_dir, "embeddings")
    words = _sign_words(emb)
    q = (
        words.where(F.col("vec_id") < 25)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("w_lo").alias("q_lo"),
            F.col("w_hi").alias("q_hi"),
        )
    )
    scored = (
        words.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            (
                F.bit_count(F.col("w_lo").bitwiseXOR(F.col("q_lo")))
                + F.bit_count(F.col("w_hi").bitwiseXOR(F.col("q_hi")))
            )
            .cast("int")
            .alias("hamming"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("q_id").orderBy("hamming", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 5)
        .orderBy("q_id", "rank")
    )


# ---------------------------------------------------------------------------
# r5 addition: MMR diversified re-ranking (unrolled greedy, exact oracle)
# ---------------------------------------------------------------------------

# round(cosine, 4) between two embedding lists in DuckDB — same tree as
# _cos_pair_sql but parameterized on arbitrary vector expressions.
_MMR_LAMBDA = 0.7


@register(
    "similarity_mmr_rerank",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS q_id, e.vec_id, e.embedding,
               ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(e.embedding) + 1),
                      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
                 / (SQRT(LIST_SUM(LIST_TRANSFORM(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * SQRT(LIST_SUM(LIST_TRANSFORM(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                 4) AS rel
        FROM embeddings e CROSS JOIN embeddings q
        WHERE q.vec_id < 10 AND e.vec_id <> q.vec_id),
    cand AS (
        -- r10k: relevance in EXACT integer 1e-4 units (rel is a 4-decimal
        -- double, so ROUND(rel*10000) is exact on both engines); all MMR
        -- scores below stay integer — a final ROUND(0.7a-0.3b, 4) would
        -- sit ON a rounding boundary half the time (inputs have 4
        -- decimals), and the engines' double-rounding disagrees there
        SELECT q_id, vec_id, embedding,
               CAST(ROUND(rel * 10000) AS BIGINT) AS r10k FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                        ORDER BY rel DESC, vec_id) AS rn
            FROM scored)
        WHERE rn <= 8),
    pairs AS (
        SELECT a.q_id, a.vec_id AS a_id, b.vec_id AS b_id,
               CAST(ROUND(
               LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(a.embedding) + 1),
                      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                 / (SQRT(LIST_SUM(LIST_TRANSFORM(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * SQRT(LIST_SUM(LIST_TRANSFORM(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
                 * 10000) AS BIGINT) AS s10k
        FROM cand a JOIN cand b
          ON a.q_id = b.q_id AND a.vec_id <> b.vec_id),
    s1 AS (
        SELECT q_id, vec_id, 7 * r10k AS score_1e5 FROM (
            SELECT q_id, vec_id, r10k,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY r10k DESC, vec_id) AS rn
            FROM cand) WHERE rn = 1),
    s2 AS (
        SELECT q_id, vec_id, score_1e5 FROM (
            SELECT c.q_id, c.vec_id,
                   7 * c.r10k - 3 * p.s10k AS score_1e5,
                   ROW_NUMBER() OVER (PARTITION BY c.q_id
                       ORDER BY 7 * c.r10k - 3 * p.s10k DESC,
                                c.vec_id) AS rn
            FROM cand c
            JOIN s1 ON s1.q_id = c.q_id AND c.vec_id <> s1.vec_id
            JOIN pairs p ON p.q_id = c.q_id AND p.a_id = c.vec_id
                        AND p.b_id = s1.vec_id)
        WHERE rn = 1),
    s3 AS (
        SELECT q_id, vec_id, score_1e5 FROM (
            SELECT c.q_id, c.vec_id,
                   7 * c.r10k - 3 * GREATEST(p1.s10k, p2.s10k) AS score_1e5,
                   ROW_NUMBER() OVER (PARTITION BY c.q_id
                       ORDER BY 7 * c.r10k - 3 * GREATEST(p1.s10k, p2.s10k)
                                DESC, c.vec_id) AS rn
            FROM cand c
            JOIN s1 ON s1.q_id = c.q_id AND c.vec_id <> s1.vec_id
            JOIN s2 ON s2.q_id = c.q_id AND c.vec_id <> s2.vec_id
            JOIN pairs p1 ON p1.q_id = c.q_id AND p1.a_id = c.vec_id
                         AND p1.b_id = s1.vec_id
            JOIN pairs p2 ON p2.q_id = c.q_id AND p2.a_id = c.vec_id
                         AND p2.b_id = s2.vec_id)
        WHERE rn = 1)
    SELECT q_id, CAST(pick AS INT) AS pick, vec_id,
           CAST(score_1e5 AS BIGINT) AS score_1e5
    FROM (SELECT q_id, 1 AS pick, vec_id, score_1e5 FROM s1
          UNION ALL SELECT q_id, 2, vec_id, score_1e5 FROM s2
          UNION ALL SELECT q_id, 3, vec_id, score_1e5 FROM s3)
    ORDER BY q_id, pick
    """,
    desc="MMR diversified re-ranking (Carbonell-Goldstein 1998): 3 "
    "greedy picks from a brute top-8 candidate pool per query, score = "
    "0.7*relevance - 0.3*max-similarity-to-picked — the standard "
    "redundancy killer between retrieval and a context window; the "
    "greedy recursion is UNROLLED (one plan stage per pick) so the "
    "whole thing stays declarative; scores emit in exact integer 1e-5 "
    "units (7*rel10k - 3*sim10k) so no rounding boundary can ever "
    "split the engines",
)
def similarity_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pools are top-8 per query (the corpus-side scan is the
    only big input; pools and pair sims are |Q|*8 and |Q|*64 rows).
    Each unrolled pick is a window argmax over the tiny pool — no
    driver loop, no UDF, and the plan depth is fixed at 3 regardless of
    corpus size."""
    from pyspark.sql import Window as W

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    sim_qc = F.round(S.cosine(F.col("q_vec"), F.col("embedding")), 4)
    scored = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", "embedding", sim_qc.alias("rel"))
    )
    wq = W.partitionBy("q_id").orderBy(F.desc("rel"), "vec_id")
    # r10k: relevance in exact integer 1e-4 units; all MMR scores stay
    # integer (a final ROUND(0.7a-0.3b, 4) sits ON a rounding boundary
    # half the time — 4-decimal inputs — where engine double-rounding
    # disagrees; integers cannot)
    cand = (
        scored.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= 8)
        .drop("rn")
        .withColumn("r10k", F.round(F.col("rel") * 10000).cast("long"))
    ).localCheckpoint(eager=False)  # consumed by pairs + all three picks
    a = cand.select(
        "q_id", F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_vec")
    )
    b = cand.select(
        "q_id", F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec")
    )
    pairs = (
        a.join(b, "q_id")
        .where(F.col("a_id") != F.col("b_id"))
        .select(
            "q_id",
            "a_id",
            "b_id",
            F.round(S.cosine(F.col("a_vec"), F.col("b_vec")) * 10000)
            .cast("long")
            .alias("s10k"),
        )
    ).localCheckpoint(eager=False)  # consumed by picks 2 and 3 (x3 legs)

    def argmax(df: DataFrame, score, out: str) -> DataFrame:
        w = W.partitionBy("q_id").orderBy(F.desc("_s"), "vec_id")
        return (
            df.withColumn("_s", score)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("q_id", F.col("vec_id").alias(out), F.col("_s").alias(f"{out}_score"))
        )

    base = cand.select("q_id", "vec_id", "r10k")
    s1 = argmax(base, F.lit(7) * F.col("r10k"), "s1")
    c2 = (
        base.join(s1, "q_id")
        .where(F.col("vec_id") != F.col("s1"))
        .join(
            pairs.withColumnRenamed("a_id", "vec_id").withColumnRenamed("b_id", "s1"),
            ["q_id", "vec_id", "s1"],
        )
    )
    s2 = argmax(c2, F.lit(7) * F.col("r10k") - F.lit(3) * F.col("s10k"), "s2")
    p1 = pairs.select(
        "q_id", F.col("a_id").alias("vec_id"), F.col("b_id").alias("s1"),
        F.col("s10k").alias("s10k1"),
    )
    p2 = pairs.select(
        "q_id", F.col("a_id").alias("vec_id"), F.col("b_id").alias("s2"),
        F.col("s10k").alias("s10k2"),
    )
    c3 = (
        base.join(s1.select("q_id", "s1"), "q_id")
        .join(s2.select("q_id", "s2"), "q_id")
        .where((F.col("vec_id") != F.col("s1")) & (F.col("vec_id") != F.col("s2")))
        .join(p1, ["q_id", "vec_id", "s1"])
        .join(p2, ["q_id", "vec_id", "s2"])
    )
    s3 = argmax(
        c3,
        F.lit(7) * F.col("r10k")
        - F.lit(3) * F.greatest(F.col("s10k1"), F.col("s10k2")),
        "s3",
    )
    out = (
        s1.select("q_id", F.lit(1).alias("pick"), F.col("s1").alias("vec_id"),
                  F.col("s1_score").alias("score_1e5"))
        .unionAll(
            s2.select("q_id", F.lit(2).alias("pick"), F.col("s2").alias("vec_id"),
                      F.col("s2_score").alias("score_1e5"))
        )
        .unionAll(
            s3.select("q_id", F.lit(3).alias("pick"), F.col("s3").alias("vec_id"),
                      F.col("s3_score").alias("score_1e5"))
        )
    )
    return out.select(
        "q_id",
        F.col("pick").cast("int"),
        "vec_id",
        F.col("score_1e5").cast("bigint").alias("score_1e5"),
    ).orderBy("q_id", "pick")


@register(
    "similarity_binary_rerank",
    oracle=f"""
    WITH words AS ({_SQL_SIGN_WORDS}),
    q AS (SELECT vec_id AS q_id, w_lo AS q_lo, w_hi AS q_hi
          FROM words WHERE vec_id < 25),
    prefilter AS (
        SELECT q_id, vec_id FROM (
            SELECT q.q_id, w.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.q_id
                       ORDER BY BIT_COUNT(XOR(w.w_lo, q.q_lo))
                                + BIT_COUNT(XOR(w.w_hi, q.q_hi)),
                                w.vec_id) AS rn
            FROM words w CROSS JOIN q WHERE w.vec_id <> q.q_id)
        WHERE rn <= 50),
    rerank AS (
        SELECT p.q_id, p.vec_id,
               ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(e.embedding) + 1),
                      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qe.embedding[i] AS DOUBLE)))
                 / (SQRT(LIST_SUM(LIST_TRANSFORM(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * SQRT(LIST_SUM(LIST_TRANSFORM(qe.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                 4) AS cosine_sim
        FROM prefilter p
        JOIN embeddings e ON e.vec_id = p.vec_id
        JOIN embeddings qe ON qe.vec_id = p.q_id)
    SELECT q_id, vec_id, cosine_sim, CAST(rank AS BIGINT) AS rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                    ORDER BY cosine_sim DESC, vec_id) AS rank
        FROM rerank) WHERE rank <= 5
    ORDER BY q_id, rank
    """,
    desc="two-stage binary search: Hamming top-50 prefilter over sign "
    "words (XOR+popcount, 16 bytes/vector) then exact cosine re-rank of "
    "the survivors — THE pattern 1-bit quantization exists for: the "
    "float corpus is touched for only 50 candidates per query instead "
    "of all of it; end-to-end integer+round4, so the whole cascade "
    "hash-checks",
)
def similarity_binary_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 1 never reads float vectors (word table only); stage 2 is a
    keyed join back to the corpus for |Q|*50 rows. At 100 TB the words
    table is 32 GB/billion vectors — memory-resident where the float
    corpus never could be."""
    from pyspark.sql import Window as W

    emb = table(spark, sf_dir, "embeddings")
    words = _sign_words(emb).localCheckpoint(eager=False)  # corpus + query side
    q = (
        words.where(F.col("vec_id") < 25)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("w_lo").alias("q_lo"),
            F.col("w_hi").alias("q_hi"),
        )
    )
    ham = (
        F.bit_count(F.col("w_lo").bitwiseXOR(F.col("q_lo")))
        + F.bit_count(F.col("w_hi").bitwiseXOR(F.col("q_hi")))
    )
    w1 = W.partitionBy("q_id").orderBy(ham, "vec_id")
    prefilter = (
        words.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("q_id"))
        .withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= 50)
        .select("q_id", "vec_id")
    )
    e = emb.select("vec_id", F.col("embedding").alias("c_vec"))
    qe = emb.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    rerank = (
        prefilter.join(e, "vec_id")
        .join(F.broadcast(qe), "q_id")
        .select(
            "q_id",
            "vec_id",
            F.round(S.cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("cosine_sim"),
        )
    )
    w2 = W.partitionBy("q_id").orderBy(F.desc("cosine_sim"), "vec_id")
    return (
        rerank.withColumn("rank", F.row_number().over(w2).cast("bigint"))
        .where(F.col("rank") <= 5)
        .select("q_id", "vec_id", "cosine_sim", "rank")
        .orderBy("q_id", "rank")
    )


@register(
    "graph_jaccard_neighbors",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    adj AS (SELECT u AS n, v AS m FROM und UNION ALL SELECT v, u FROM und),
    deg AS (SELECT n, COUNT(*) AS d FROM adj GROUP BY n),
    -- hub cap (super-node exclusion): wedge cost is sum(deg(center)^2)
    -- and has NO orientation trick, so centers above 64 neighbors are
    -- dropped before wedging; the cap is part of the op's spec
    centers AS (
        SELECT a.n, a.m FROM adj a JOIN deg dm ON dm.n = a.m
        WHERE dm.d <= 64),
    common AS (
        SELECT a.n AS x, b.n AS y, COUNT(*) AS cn
        FROM centers a JOIN centers b ON a.m = b.m AND a.n < b.n
        GROUP BY a.n, b.n),
    pairs AS (
        SELECT c.x, c.y, c.cn, da.d AS dx, db.d AS dy,
               ROUND(CAST(c.cn AS DOUBLE)
                     / CAST(da.d + db.d - c.cn AS DOUBLE), 4) AS jaccard
        FROM common c JOIN deg da ON da.n = c.x JOIN deg db ON db.n = c.y
        WHERE c.cn >= 3)
    SELECT x, y, CAST(cn AS BIGINT) AS n_common,
           CAST(dx AS BIGINT) AS deg_x, CAST(dy AS BIGINT) AS deg_y, jaccard
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY jaccard DESC, x, y) AS rn
          FROM pairs)
    WHERE rn <= 50 ORDER BY jaccard DESC, x, y
    """,
    desc="neighborhood Jaccard similarity (top-50 co-purchase pairs with "
    ">= 3 common neighbors, hub centers capped at degree 64 — super-node "
    "exclusion, the standard recsys move): |N(x) ∩ N(y)| / |N(x) ∪ N(y)| "
    "— the normalized cousin of common-neighbor link prediction",
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wedge-style common-neighbor count keyed on the shared neighbor —
    wedge cost is Σ deg(center)² with no orientation trick, so hub
    centers above the degree-64 cap are excluded BEFORE wedging; with
    the cap in place no center can skew a task, so the wedge join runs
    UNSALTED (link_predict_common_neighbors' capped mode — 2×|adj| rows
    through the exchange instead of 17×|adj|) and shuffle_hash-hinted;
    the cn >= 3 floor prunes the quadratic tail before ranking; top-50
    is TakeOrdered."""
    li = table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    und = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    ).localCheckpoint(eager=False)  # adj (x2), both wedge sides, degrees
    adj = und.select(F.col("u").alias("n"), F.col("v").alias("m")).unionAll(
        und.select(F.col("v").alias("n"), F.col("u").alias("m"))
    )
    deg = adj.groupBy("n").agg(F.count("*").alias("d"))
    centers = adj.join(
        F.broadcast(deg.where(F.col("d") > 64).withColumnRenamed("n", "m")),
        "m",
        "left_anti",
    )
    # r11: salt dropped — the degree-64 cap above already bounds every
    # center's fan-out (≤ 64² wedge rows per center), so no hub can exist
    # and the 16× salt replication bought nothing while shipping 17×|adj|
    # rows through the wedge exchange (the link_predict_common_neighbors
    # capped-mode lesson). One unsalted shuffled-hash join ships 2×|adj|
    # and keeps the quadratic join→filter→partial-agg span fused and
    # sort-free; the width stays pinned because AQE sizes the exchange
    # from the deceptively tiny adjacency input.
    x = centers.select(F.col("m"), F.col("n").alias("x"))
    y = centers.select(F.col("m"), F.col("n").alias("y"))
    n_parts = max(
        64, int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    )
    common = (
        x.repartition(n_parts, "m")
        .hint("shuffle_hash")
        .join(y, ["m"])
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("cn"))
        .where(F.col("cn") >= 3)
    )
    dx = deg.select(F.col("n").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("n").alias("y"), F.col("d").alias("dy"))
    pairs = common.join(dx.hint("shuffle_hash"), "x").join(
        dy.hint("shuffle_hash"), "y"
    ).select(
        "x",
        "y",
        "cn",
        "dx",
        "dy",
        F.round(
            F.col("cn").cast("double")
            / (F.col("dx") + F.col("dy") - F.col("cn")).cast("double"),
            4,
        ).alias("jaccard"),
    )
    return (
        pairs.orderBy(F.desc("jaccard"), "x", "y")
        .limit(50)
        .select(
            "x",
            "y",
            F.col("cn").cast("bigint").alias("n_common"),
            F.col("dx").cast("bigint").alias("deg_x"),
            F.col("dy").cast("bigint").alias("deg_y"),
            "jaccard",
        )
    )


@register(
    "multimodal_jpeg_lossless_real",
    oracle="""
    SELECT doc_id,
           CAST(2 + doc_id % 6 AS INT) AS width,
           CAST(1 + doc_id % 5 AS INT) AS height,
           CAST(3 * LIST_SUM(LIST_TRANSFORM(
               RANGE(0, (2 + doc_id % 6) * (1 + doc_id % 5)),
               k -> CASE WHEN doc_id % 4 = 0 THEN
                        ((17 * doc_id + 5 * (k % (2 + doc_id % 6))
                          + 3 * (k // (2 + doc_id % 6))) % 4096) // 16
                    ELSE
                        (doc_id + 5 * (k % (2 + doc_id % 6))
                         + 3 * (k // (2 + doc_id % 6))) % 256
                    END)) AS BIGINT) AS px_sum
    FROM documents ORDER BY doc_id
    """,
    desc="REAL lossless-JPEG decode (SOF3, T.81 Annex H — the DNG/"
    "medical variant): per-sample predictive Huffman coding through all "
    "seven spec predictors across the corpus, 8-bit AND 12-bit "
    "precisions; lossless, so every decoded sample equals the "
    "closed-form raster exactly (no DC-quant caveats needed)",
)
def multimodal_jpeg_lossless_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/multimodal.py _decode_lossless / encode_jpeg_lossless_gray:
    Arrow-batched narrow map; payloads never shuffle."""
    from gearpump_spark.operators.multimodal import (
        JpegDecoder,
        pixel_stats,
        synthesize_jpeg_lossless_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return pixel_stats(
        synthesize_jpeg_lossless_payloads(docs), decoder=JpegDecoder()
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# r5 fourth wave: graph assortativity, drift monitors, data-quality audits
# ---------------------------------------------------------------------------


@register(
    "graph_assortativity",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    adj AS (SELECT u AS n, v AS m FROM und UNION ALL SELECT v, u FROM und),
    deg AS (SELECT n, COUNT(*) AS d FROM adj GROUP BY n),
    ends AS (
        SELECT dx.d AS x, dy.d AS y
        FROM adj JOIN deg dx ON dx.n = adj.n JOIN deg dy ON dy.n = adj.m),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(CAST(x AS BIGINT) * x) AS BIGINT) AS sx2,
               CAST(SUM(CAST(x AS BIGINT) * y) AS BIGINT) AS sxy
        FROM ends)
    SELECT m AS n_directed_edges, sx AS sum_deg, sx2 AS sum_deg_sq,
           sxy AS sum_deg_prod,
           -- ratio in DOUBLE space: each sum converts exactly (< 2^53)
           -- and BIGINT products would overflow past ~sf1
           (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / (CAST(m AS DOUBLE) * CAST(sx2 AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS assortativity
    FROM s
    """,
    desc="degree assortativity (Newman 2002): Pearson correlation of "
    "endpoint degrees over the directed edge list — do hubs attach to "
    "hubs (assortative, r > 0) or to leaves (disassortative, r < 0)? "
    "Both edge directions included, so the two endpoint marginals "
    "coincide and r reduces to ONE integer-exact ratio cast to double "
    "— the whole statistic hash-checks",
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two shuffles (degree agg, two degree joins collapse to one keyed
    exchange each) then a keyless integer aggregate — the one-number
    skew diagnostic to run before choosing salting constants."""
    li = table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    und = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    ).localCheckpoint(eager=False)  # both adjacency directions
    adj = und.select(F.col("u").alias("n"), F.col("v").alias("m")).unionAll(
        und.select(F.col("v").alias("n"), F.col("u").alias("m"))
    )
    deg = adj.groupBy("n").agg(F.count("*").alias("d"))
    dx = deg.select(F.col("n"), F.col("d").alias("x"))
    dy = deg.select(F.col("n").alias("m"), F.col("d").alias("y"))
    ends = adj.join(dx, "n").join(dy, "m")
    s = ends.agg(
        F.count("*").cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x").cast("bigint") * F.col("x")).cast("bigint").alias("sx2"),
        F.sum(F.col("x").cast("bigint") * F.col("y")).cast("bigint").alias("sxy"),
    )
    return s.select(
        F.col("m").alias("n_directed_edges"),
        F.col("sx").alias("sum_deg"),
        F.col("sx2").alias("sum_deg_sq"),
        F.col("sxy").alias("sum_deg_prod"),
        (
            (
                F.col("m").cast("double") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            )
            / (
                F.col("m").cast("double") * F.col("sx2").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            )
        ).alias("assortativity"),
    )


@register(
    "q_psi_drift",
    oracle="""
    WITH mid AS (
        -- integer microsecond midpoint test (2*t < lo+hi): no interval
        -- halving, whose sub-microsecond rounding differs across engines
        SELECT epoch_us(MIN(ts)) + epoch_us(MAX(ts)) AS m2 FROM events),
    binned AS (
        SELECT event_type,
               LEAST(CAST(FLOOR(value / 50.0) AS INT), 9) AS bin,
               CASE WHEN 2 * epoch_us(ts) < (SELECT m2 FROM mid)
                    THEN 0 ELSE 1 END AS half
        FROM events),
    cells AS (
        SELECT event_type, bin,
               1 + SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS a,
               1 + SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS b
        FROM binned GROUP BY event_type, bin),
    tot AS (
        SELECT event_type, SUM(a) AS ta, SUM(b) AS tb
        FROM cells GROUP BY event_type),
    terms AS (
        SELECT c.event_type,
               CAST(ROUND((CAST(c.a AS DOUBLE) / t.ta
                           - CAST(c.b AS DOUBLE) / t.tb)
                          * LN((CAST(c.a AS DOUBLE) / t.ta)
                               / (CAST(c.b AS DOUBLE) / t.tb)), 6)
                    AS DECIMAL(14,6)) AS term
        FROM cells c JOIN tot t USING (event_type))
    SELECT event_type, CAST(SUM(term) AS DOUBLE) AS psi,
           CAST(SUM(term) AS DOUBLE) >= 0.2 AS drift_alert
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
    desc="population-stability-index drift monitor: per-type value "
    "distribution of the first half of the window vs the second (10 "
    "fixed 50-unit bins, add-1 smoothing), PSI = sum (p-q) ln(p/q) with "
    "the rounded-log-term decimal-sum discipline; >= 0.2 is the "
    "industry alert line — the monitor a feature pipeline runs before "
    "anyone retrains on drifted data",
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan + one (type, bin) aggregate (bounded cells); the time
    midpoint rides in as a broadcast 1-row aggregate, never a collect."""
    ev = table(spark, sf_dir, "events")
    mid = ev.agg(
        (F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))).alias("m2")
    )
    binned = ev.crossJoin(F.broadcast(mid)).select(
        "event_type",
        F.least(F.floor(F.col("value") / 50.0).cast("int"), F.lit(9)).alias("bin"),
        F.when(F.lit(2) * F.unix_micros("ts") < F.col("m2"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("half"),
    )
    cells = binned.groupBy("event_type", "bin").agg(
        (F.lit(1) + F.sum(F.when(F.col("half") == 0, 1).otherwise(0))).alias("a"),
        (F.lit(1) + F.sum(F.when(F.col("half") == 1, 1).otherwise(0))).alias("b"),
    )
    from pyspark.sql import Window as W

    wt = W.partitionBy("event_type")
    p = F.col("a").cast("double") / F.sum("a").over(wt)
    q = F.col("b").cast("double") / F.sum("b").over(wt)
    term = F.round((p - q) * F.log(p / q), 6).cast("decimal(14,6)")
    return (
        cells.select("event_type", term.alias("term"))
        .groupBy("event_type")
        .agg(F.sum("term").cast("double").alias("psi"))
        .select(
            "event_type", "psi", (F.col("psi") >= 0.2).alias("drift_alert")
        )
        .orderBy("event_type")
    )


# Benford first-digit probabilities log10(1 + 1/d), precomputed in Python
# and embedded as LITERALS on both sides — no cross-engine log10 in the
# plan at all (stronger than the rounded-term discipline when the log
# arguments are compile-time constants).
_BENFORD_P = [0.3010299957, 0.1760912591, 0.1249387366, 0.096910013,
              0.079181246, 0.0669467896, 0.057991947, 0.0511525224,
              0.0457574906]


@register(
    "q_benford_digits",
    oracle=f"""
    WITH digits AS (
        SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                    AS INT) AS d
        FROM orders WHERE o_totalprice >= 1),
    obs AS (SELECT d, COUNT(*) AS n FROM digits GROUP BY d),
    tot AS (SELECT SUM(n) AS t FROM obs),
    bp AS (
        SELECT UNNEST(RANGE(1, 10)) AS d,
               UNNEST([{", ".join(str(p) for p in _BENFORD_P)}]) AS p)
    SELECT bp.d AS digit,
           CAST(COALESCE(obs.n, 0) AS BIGINT) AS observed,
           ROUND(bp.p * t.t, 2) AS expected,
           ROUND((COALESCE(obs.n, 0) - bp.p * t.t)
                 * (COALESCE(obs.n, 0) - bp.p * t.t) / (bp.p * t.t), 4)
             AS chi2_term
    FROM bp LEFT JOIN obs ON obs.d = bp.d CROSS JOIN tot t
    ORDER BY digit
    """,
    desc="Benford first-digit audit over order totals: observed leading-"
    "digit counts vs log10(1+1/d) expectations (embedded as compile-time "
    "literals — no cross-engine log in the plan) with per-digit chi2 "
    "contributions — the classic fabricated-numbers screen for financial "
    "fact tables",
)
def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan + a 9-row aggregate; the digit extraction is a string
    head over the integer part (no float log in the hot path)."""
    od = table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    digits = od.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    obs = digits.groupBy("d").agg(F.count("*").alias("n"))
    tot = obs.agg(F.sum("n").alias("t"))
    bp = od.sparkSession.createDataFrame(
        [(d + 1, p) for d, p in enumerate(_BENFORD_P)], "d int, p double"
    )
    j = (
        F.broadcast(bp)
        .join(obs, "d", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("digit"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("observed"),
            F.round(F.col("p") * F.col("t"), 2).alias("expected"),
            F.round(
                (F.coalesce(F.col("n"), F.lit(0)) - F.col("p") * F.col("t"))
                * (F.coalesce(F.col("n"), F.lit(0)) - F.col("p") * F.col("t"))
                / (F.col("p") * F.col("t")),
                4,
            ).alias("chi2_term"),
        )
    )
    return j.orderBy("digit")


@register(
    "q_fd_violations",
    oracle="""
    WITH checks AS (
        SELECT 'l_orderkey->l_shipdate' AS fd, l_orderkey AS k,
               COUNT(DISTINCT l_shipdate) AS nv
        FROM lineitem GROUP BY l_orderkey
        UNION ALL
        SELECT 'l_orderkey->l_returnflag', l_orderkey,
               COUNT(DISTINCT l_returnflag)
        FROM lineitem GROUP BY l_orderkey
        UNION ALL
        SELECT 'l_partkey->l_extendedprice/l_quantity', l_partkey,
               COUNT(DISTINCT l_extendedprice / l_quantity)
        FROM lineitem WHERE l_quantity > 0 GROUP BY l_partkey)
    SELECT fd,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           ROUND(CAST(SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 4) AS violation_rate
    FROM checks GROUP BY fd ORDER BY fd
    """,
    desc="functional-dependency audit: candidate FDs checked by counting "
    "keys with more than one distinct dependent value (does an order "
    "ship on one date? does a part have one unit price?) — the "
    "data-quality contract check run before anyone trusts a key for "
    "dedup or joins",
)
def q_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One keyed aggregate per FD (map-side partial distinct), unioned
    at n_keys granularity — violation counting never re-shuffles rows."""
    li = table(spark, sf_dir, "lineitem")

    def check(name: str, key, dep, flt=None) -> DataFrame:
        d = li.where(flt) if flt is not None else li
        return (
            d.groupBy(key.alias("k"))
            .agg(F.countDistinct(dep).alias("nv"))
            .select(F.lit(name).alias("fd"), "k", "nv")
        )

    checks = (
        check("l_orderkey->l_shipdate", F.col("l_orderkey"), F.col("l_shipdate"))
        .unionAll(
            check(
                "l_orderkey->l_returnflag", F.col("l_orderkey"), F.col("l_returnflag")
            )
        )
        .unionAll(
            check(
                "l_partkey->l_extendedprice/l_quantity",
                F.col("l_partkey"),
                F.col("l_extendedprice") / F.col("l_quantity"),
                flt=F.col("l_quantity") > 0,
            )
        )
    )
    return (
        checks.groupBy("fd")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum((F.col("nv") > 1).cast("long")).cast("bigint").alias("n_violating"),
        )
        .select(
            "fd",
            "n_keys",
            "n_violating",
            F.round(
                F.col("n_violating").cast("double") / F.col("n_keys"), 4
            ).alias("violation_rate"),
        )
        .orderBy("fd")
    )


@register(
    "multimodal_wav_resample",
    oracle="""
    WITH p AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 100 ELSE 1000 END
                 AS scale,
               LIST_TRANSFORM(RANGE(0, 4),
                              k -> (7 * doc_id + 13 * k) % 200 - 100) AS v
        FROM documents),
    res AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN
                   LIST_TRANSFORM(RANGE(0, 2), k ->
                       CAST(FLOOR((scale * v[2 * CAST(k AS INT) + 1]
                                   + scale * v[2 * CAST(k AS INT) + 2]) / 2.0)
                            AS BIGINT))
               END AS xs
        FROM p)
    SELECT doc_id,
           CAST(LEN(xs) AS BIGINT) AS n_out,
           CAST(LIST_SUM(xs) AS BIGINT) AS out_sum,
           CAST(LIST_MIN(xs) AS BIGINT) AS out_min,
           CAST(LIST_MAX(xs) AS BIGINT) AS out_max
    FROM res ORDER BY doc_id
    """,
    desc="REAL PCM decimate-by-2 resample: pairwise floor-mean over "
    "decoded mono samples (8/16/24-bit, the box-filter half-rate step "
    "before audio feature extraction); stereo payloads yield NULLs "
    "(interleaved decimation would mix channels) — both paths "
    "hash-checked against the closed-form sample arithmetic",
)
def multimodal_wav_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/multimodal.py audio_resample_stats over the existing
    closed-form WAV corpus (mono = even doc ids); narrow Arrow map."""
    from gearpump_spark.operators.multimodal import (
        audio_resample_stats,
        synthesize_wav_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return audio_resample_stats(synthesize_wav_payloads(docs)).orderBy("doc_id")


@register(
    "text_kl_source_drift",
    oracle=r"""
    WITH toks AS (
        SELECT source, UNNEST(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]+')) AS tok
        FROM documents),
    sc AS (SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY source, tok),
    stot AS (SELECT source, SUM(c) AS t FROM sc GROUP BY source),
    cc AS (SELECT tok, SUM(c) AS cc FROM sc GROUP BY tok),
    ctot AS (SELECT SUM(cc) AS ct FROM cc),
    terms AS (
        SELECT sc.source,
               CAST(ROUND((CAST(sc.c AS DOUBLE) / st.t)
                          * LN((CAST(sc.c AS DOUBLE) / st.t)
                               / (CAST(cc.cc AS DOUBLE) / ct.ct)), 7)
                    AS DECIMAL(16,7)) AS term
        FROM sc JOIN stot st USING (source)
                JOIN cc USING (tok) CROSS JOIN ctot ct)
    SELECT source, CAST(SUM(term) AS DOUBLE) AS kl_nats
    FROM terms GROUP BY source ORDER BY source
    """,
    desc="per-source KL divergence from the corpus token distribution "
    "(KL(source || corpus), nats): the drift monitor that catches a "
    "crawl source going off-distribution before it contaminates a "
    "training mix; rounded-log-term decimal sums (the cross-engine LN "
    "discipline), no smoothing needed since the corpus majorizes every "
    "source",
)
def text_kl_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One explode + (source, tok) aggregate; corpus counts derive from
    the same aggregate (no second tokenization pass); totals ride in as
    window sums over bounded keys."""
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z]+"), F.lit(0))
        ).alias("tok"),
    )
    sc = toks.groupBy("source", "tok").agg(F.count("*").alias("c"))
    ws = W.partitionBy("source")
    wt = W.partitionBy("tok")
    wall = W.partitionBy()
    enriched = sc.select(
        "source",
        "c",
        F.sum("c").over(ws).alias("t"),
        F.sum("c").over(wt).alias("cc"),
    ).withColumn("ct", F.sum("c").over(wall))
    p = F.col("c").cast("double") / F.col("t")
    q = F.col("cc").cast("double") / F.col("ct")
    term = F.round(p * F.log(p / q), 7).cast("decimal(16,7)")
    return (
        enriched.select("source", term.alias("term"))
        .groupBy("source")
        .agg(F.sum("term").cast("double").alias("kl_nats"))
        .orderBy("source")
    )


@register(
    "graph_harmonic_centrality",
    oracle="""
    WITH RECURSIVE items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        WHERE l_orderkey % 10 = 0),
    edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    adj AS (SELECT u AS n, v AS nb FROM edges
            UNION ALL SELECT v, u FROM edges),
    srcs AS (SELECT DISTINCT n FROM adj WHERE n % 97 = 0),
    bfs(seed, node, d) AS (
        SELECT n, n, CAST(0 AS BIGINT) FROM srcs
        UNION
        SELECT bfs.seed, a.nb, bfs.d + 1
        FROM bfs JOIN adj a ON a.n = bfs.node
        WHERE bfs.d < 4),
    dist AS (
        SELECT seed, node, MIN(d) AS d FROM bfs
        WHERE node <> seed GROUP BY seed, node),
    cnts AS (
        SELECT seed,
               SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS c1,
               SUM(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS c2,
               SUM(CASE WHEN d = 3 THEN 1 ELSE 0 END) AS c3,
               SUM(CASE WHEN d = 4 THEN 1 ELSE 0 END) AS c4
        FROM dist GROUP BY seed)
    SELECT seed,
           CAST(c1 + c2 + c3 + c4 AS BIGINT) AS n_reached,
           CAST(c1 AS DOUBLE) + CAST(c2 AS DOUBLE) / 2
             + CAST(c3 AS DOUBLE) / 3 + CAST(c4 AS DOUBLE) / 4
             AS harmonic
    FROM cnts ORDER BY seed
    """,
    desc="bounded harmonic centrality per seed (4-hop horizon): "
    "sum of 1/dist over nodes reached from EACH seed via the labeled "
    "multi-source BFS — closeness-family centrality that, unlike raw "
    "reach counts, rewards SHORT paths; per-distance integer counts "
    "combine in one fixed-order expression, so the float value is "
    "engine-exact",
)
def graph_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/graph.py khop_distances_labeled: the frontier carries
    the seed label, one keyed join expands every seed's frontier per
    round; per-seed work is bounded by its 4-hop ball, never the graph."""
    from gearpump_spark.operators.graph import khop_distances_labeled

    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 10 == 0)
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
    nodes = edges.select(F.col("src").alias("n")).union(
        edges.select(F.col("dst").alias("n"))
    )
    srcs = nodes.where(F.col("n") % 97 == 0).distinct()
    out = khop_distances_labeled(edges, srcs, n_rounds=4)
    cnts = (
        out.where(F.col("node") != F.col("seed"))
        .groupBy("seed")
        .agg(
            F.sum((F.col("dist") == 1).cast("long")).alias("c1"),
            F.sum((F.col("dist") == 2).cast("long")).alias("c2"),
            F.sum((F.col("dist") == 3).cast("long")).alias("c3"),
            F.sum((F.col("dist") == 4).cast("long")).alias("c4"),
        )
    )
    return cnts.select(
        "seed",
        (F.col("c1") + F.col("c2") + F.col("c3") + F.col("c4"))
        .cast("bigint")
        .alias("n_reached"),
        (
            F.col("c1").cast("double")
            + F.col("c2").cast("double") / 2
            + F.col("c3").cast("double") / 3
            + F.col("c4").cast("double") / 4
        ).alias("harmonic"),
    ).orderBy("seed")


@register(
    "dedup_soft_weights",
    oracle=_SQL_CLUSTERS_CTES
    + """, sizes AS (
        SELECT cluster_id, COUNT(*) AS sz FROM clusters GROUP BY cluster_id)
    SELECT c.doc_id, c.cluster_id, CAST(s.sz AS BIGINT) AS cluster_size,
           CAST(CAST(1 AS DOUBLE) / s.sz AS DOUBLE) AS weight,
           (c.doc_id = c.cluster_id) AS is_canonical
    FROM clusters c JOIN sizes s USING (cluster_id)
    ORDER BY c.doc_id
    """,
    desc="soft dedup: instead of DROPPING near-duplicates, every doc "
    "gets training weight 1/cluster_size (the cluster contributes one "
    "document's worth of gradient no matter how many copies the crawl "
    "found) — the lossless alternative labs use when duplicates carry "
    "quality signal; weight is one exact integer division",
)
def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composes the MinHash-LSH → connected-components pipeline with one
    cluster-size aggregate broadcast back; 1/size is a single IEEE
    division of exact integers, so even the float weights hash-match."""
    from gearpump_spark.operators.graph import connected_components

    docs = table(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs, k=6)
    pairs = D.lsh_candidate_pairs(sig, k=6, rows_per_band=2)
    comps = connected_components(
        pairs, nodes=docs.select("doc_id"), src="a", dst="b"
    ).select(F.col("node_id").alias("doc_id"), F.col("comp").alias("cluster_id"))
    sizes = comps.groupBy("cluster_id").agg(F.count("*").alias("sz"))
    return (
        comps.join(F.broadcast(sizes), "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            F.col("sz").cast("bigint").alias("cluster_size"),
            (F.lit(1.0) / F.col("sz")).alias("weight"),
            (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# r7 second wave: q-gram language distance, longest duplicated n-gram,
# weighted PageRank (above, next to the int-PageRank family), PackBits TIFF,
# HLL intersection (queries/sketches.py), bottom-k rank-sketch audit
# ---------------------------------------------------------------------------


def _padded_trigrams(tok: DataFrame, *keys: str) -> DataFrame:
    """(keys..., g): word-boundary-padded character trigrams of column
    ``w`` — the Cavnar-Trenkle profile unit shared by the language
    distance and attribution queries (their oracles carry the same
    RANGE/SUBSTR form)."""
    pw = F.concat(F.lit("_"), F.lower(F.col("w")), F.lit("_"))
    return tok.select(
        *keys,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length(pw) - F.lit(2)),
                lambda i: pw.substr(i, F.lit(3)),
            )
        ).alias("g"),
    )


@register(
    "text_qgram_lang_distance",
    oracle="""
    WITH tok AS (
        SELECT lang,
               UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'),
                                  w -> w <> '')) AS w
        FROM documents),
    tg AS (
        SELECT lang,
               UNNEST(LIST_TRANSFORM(
                   RANGE(1, LENGTH('_' || LOWER(w) || '_') - 1),
                   i -> SUBSTR('_' || LOWER(w) || '_', CAST(i AS INT), 3))) AS g
        FROM tok),
    cnt AS (SELECT lang, g, COUNT(*) AS c FROM tg GROUP BY 1, 2),
    prof AS (
        SELECT lang, g, rk FROM (
            SELECT lang, g,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY c DESC, g) AS rk
            FROM cnt) WHERE rk <= 40),
    pairs AS (
        SELECT a.lang AS lang_a, bl.lang AS lang_b, a.g, a.rk AS rk_a
        FROM prof a CROSS JOIN (SELECT DISTINCT lang FROM prof) bl
        WHERE bl.lang <> a.lang)
    SELECT lang_a, lang_b,
           CAST(SUM(CASE WHEN b.rk IS NULL THEN 40
                         ELSE ABS(rk_a - b.rk) END) AS BIGINT) AS oop_distance
    FROM pairs LEFT JOIN prof b ON b.lang = pairs.lang_b AND b.g = pairs.g
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    desc="Cavnar-Trenkle (1994) q-gram profile distance between language "
    "corpora: per-language top-40 character-trigram rank profiles "
    "(word-boundary padded, cnt-desc/lexicographic tie-break) compared "
    "pairwise by the out-of-place measure (missing trigram costs the "
    "profile length) — the classic language-ID/typology distance, exact "
    "integer arithmetic end to end",
)
def text_qgram_lang_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the corpus collapses map-side into (lang, trigram) counts —
    bounded by vocabulary, not corpus size; the rank window partitions by
    lang (never a single-partition sort) over that bounded table, and the
    pairwise compare touches only |langs| * 40 profile rows (broadcast)."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    tok = docs.select("lang", F.explode(TX.tokens(F.col("text"))).alias("w"))
    tg = _padded_trigrams(tok, "lang")
    cnt = tg.groupBy("lang", "g").agg(F.count("*").alias("c"))
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("g"))
    )
    # The <=|langs|*40-row profile feeds THREE consumers (the language
    # list + both compare sides) and each re-derivation is a full corpus
    # trigram count + rank window. Lazy localCheckpoint (r11 shared-
    # relation discipline): one corpus pass, three tiny readers.
    prof = (
        cnt.select("lang", "g", rk.alias("rk"))
        .where(F.col("rk") <= 40)
        .localCheckpoint(eager=False)
    )
    langs = prof.select("lang").distinct().select(F.col("lang").alias("lang_b"))
    pairs = (
        prof.select(
            F.col("lang").alias("lang_a"), "g", F.col("rk").alias("rk_a")
        )
        .crossJoin(F.broadcast(langs))
        .where(F.col("lang_b") != F.col("lang_a"))
    )
    b = prof.select(
        F.col("lang").alias("lb"), F.col("g").alias("g_b"),
        F.col("rk").alias("rk_b"),
    )
    return (
        pairs.join(
            F.broadcast(b),
            (F.col("lang_b") == F.col("lb")) & (F.col("g") == F.col("g_b")),
            "left",
        )
        .groupBy("lang_a", "lang_b")
        .agg(
            F.sum(
                F.when(F.col("rk_b").isNull(), F.lit(40)).otherwise(
                    F.abs(F.col("rk_a") - F.col("rk_b"))
                )
            )
            .cast("bigint")
            .alias("oop_distance")
        )
        .orderBy("lang_a", "lang_b")
    )


@register(
    "text_longest_dup_ngram",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'),
                           w -> w <> '') AS tk
        FROM documents),
    sh AS (
        SELECT doc_id, s,
               UNNEST(LIST_TRANSFORM(RANGE(1, LEN(tk) - s + 2),
                   i -> ARRAY_TO_STRING(
                       LIST_SLICE(tk, CAST(i AS INT), CAST(i + s - 1 AS INT)),
                       ' '))) AS g
        FROM toks CROSS JOIN (SELECT UNNEST([2, 3, 4, 6, 8]) AS s)
        WHERE LEN(tk) >= s),
    dup AS (
        SELECT doc_id, s, g, COUNT(*) AS c
        FROM sh GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2),
    best AS (
        SELECT doc_id, s, g, c,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY s DESC, c DESC, g) AS rn
        FROM dup)
    SELECT t.doc_id,
           CAST(COALESCE(b.s, 0) AS BIGINT) AS max_dup_len,
           b.g AS dup_ngram,
           CAST(b.c AS BIGINT) AS dup_count
    FROM toks t LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
    ORDER BY doc_id
    """,
    desc="longest duplicated word n-gram per document over the size "
    "ladder {2,3,4,6,8} (the bounded stand-in for suffix-tree "
    "longest-repeated-substring): reports the max size with any "
    "shingle occurring twice plus the winning shingle "
    "(count-desc/lexicographic tie-break) — the span-level repetition "
    "signal behind Gopher's dup-ngram quality rules",
)
def text_longest_dup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: 5 bounded explodes of the token array (sizes are a fixed
    ladder, not data-driven), collapsed map-side by (doc, size, shingle);
    the argmax window partitions by doc_id over already-deduplicated
    shingle counts. A true suffix-automaton LRS is sequential per doc —
    the ladder form stays expression-level and mergeable."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    base = docs.select("doc_id", TX.tokens(F.col("text")).alias("tk"))
    sdf = spark.createDataFrame([(s,) for s in (2, 3, 4, 6, 8)], "s int")
    sh = (
        base.crossJoin(F.broadcast(sdf))
        .where(F.size("tk") >= F.col("s"))
        .select(
            "doc_id",
            "s",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - F.col("s") + 1),
                    lambda i: F.array_join(F.slice(F.col("tk"), i, F.col("s")), " "),
                )
            ).alias("g"),
        )
    )
    dup = (
        sh.groupBy("doc_id", "s", "g")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= 2)
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(
            F.desc("s"), F.desc("c"), F.asc("g")
        )
    )
    best = dup.select("doc_id", "s", "g", "c", rn.alias("rn")).where(
        F.col("rn") == 1
    )
    return (
        base.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("s"), F.lit(0)).cast("bigint").alias("max_dup_len"),
            F.col("g").alias("dup_ngram"),
            F.col("c").cast("bigint").alias("dup_count"),
        )
        .orderBy("doc_id")
    )


@register(
    "multimodal_tiff_packbits_real",
    oracle="""
    SELECT doc_id,
           CAST(3 + doc_id % 9 AS INT) AS width,
           CAST(1 + doc_id % 6 AS INT) AS height,
           CAST(3 * LIST_SUM(LIST_TRANSFORM(
               RANGE(0, (3 + doc_id % 9) * (1 + doc_id % 6)),
               k -> CASE CAST(doc_id % 3 AS INT)
                    WHEN 0 THEN (doc_id + 7 * (k // (3 + doc_id % 9))) % 256
                    WHEN 1 THEN (doc_id + 5 * (k % (3 + doc_id % 9))
                                 + 3 * (k // (3 + doc_id % 9))) % 256
                    ELSE (doc_id + 3 * (k // (3 + doc_id % 9))
                          + ((k % (3 + doc_id % 9)) // 2)) % 256 END))
             AS BIGINT) AS px_sum
    FROM documents ORDER BY doc_id
    """,
    desc="REAL PackBits-compressed TIFF decode (TIFF 6.0 §9, Compression "
    "32773): per-strip RLE streams covering every packet type — full-row "
    "replicate runs (constant rows), literal packets (strict gradients), "
    "length-2 replicates (pairwise rasters) and the reserved -128 no-op "
    "header a decoder must skip — in both byte orders with WhiteIsZero "
    "inversion every third doc; decoded gray rasters checksummed against "
    "closed-form pixel arithmetic",
)
def multimodal_tiff_packbits_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/multimodal.py _packbits_encode / PixelDecoder.
    _packbits_decode + decode_tiff_arr: sequential per-byte RLE state
    machine inside an Arrow-batched narrow map (same tier as the QOI op
    decoder); payloads never shuffle — only (doc_id, width, height,
    px_sum) rows do. The photometric normalization makes the inverted
    and direct storage classes hash identically, which is what the
    oracle checks."""
    from gearpump_spark.operators.multimodal import (
        pixel_stats,
        synthesize_tiff_packbits_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return pixel_stats(synthesize_tiff_packbits_payloads(docs)).orderBy("doc_id")


@register(
    "sample_curriculum_order",
    oracle="""
    WITH sc AS (
        SELECT doc_id,
               CAST(CASE WHEN LEN(tk) = 0 THEN 0
                    ELSE (1000000 * LEN(LIST_DISTINCT(tk))) // LEN(tk) END
                 AS BIGINT) AS score
        FROM (SELECT doc_id,
                     LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'),
                                 w -> w <> '') AS tk
              FROM documents))
    SELECT doc_id, score,
           CAST(ROW_NUMBER() OVER (ORDER BY score, doc_id) AS BIGINT)
             AS curriculum_pos
    FROM sc ORDER BY doc_id
    """,
    desc="curriculum ordering for training (easy -> hard by lexical "
    "diversity): every document gets its global 1-based position in the "
    "(score, doc_id) total order, score = micro-unit distinct-token "
    "ratio — the curriculum-learning schedule (Bengio 2009) as a "
    "data-prep pass; exact integer arithmetic end to end",
)
def sample_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sampling.py global_positions: the global rank is a
    range-repartition + per-partition offsets (two parallel exchanges, P
    longs to the driver) — never a single-task Window.orderBy; the score
    itself is a narrow map."""
    from gearpump_spark.operators.sampling import global_positions

    docs = table(spark, sf_dir, "documents")
    base = docs.select("doc_id", TX.tokens(F.col("text")).alias("tk"))
    score = (
        F.when(F.size("tk") == 0, F.lit(0))
        .otherwise(
            F.expr("(1000000 * size(array_distinct(tk))) DIV size(tk)")
        )
        .cast("long")
    )
    sc = base.select("doc_id", score.alias("score"))
    return (
        global_positions(sc, ["score", "doc_id"])
        .select(
            "doc_id",
            "score",
            (F.col("_gpos") + 1).cast("bigint").alias("curriculum_pos"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_hashed_ngram_features",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, LOWER(w) AS w FROM (
            SELECT doc_id,
                   UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'),
                                      t -> t <> '')) AS w
            FROM documents)),
    h AS (
        SELECT doc_id,
               {_SQL_H15.format(seed="'9'", key="w")} % 64 AS bucket,
               CASE WHEN {_SQL_H15.format(seed="'10'", key="w")} % 2 = 0
                    THEN 1 ELSE -1 END AS s
        FROM tok)
    SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
           CAST(SUM(s) AS BIGINT) AS val
    FROM h GROUP BY 1, 2 HAVING SUM(s) <> 0
    ORDER BY doc_id, bucket
    """,
    desc="feature hashing (the hashing trick, Weinberger 2009): 64-bucket "
    "signed unigram count vectors per document — bucket and sign from "
    "two independent seeded hashes, zero entries dropped — the "
    "fixed-width featurization fast quality/topic classifiers train on "
    "when a vocabulary is too big to materialize",
)
def text_hashed_ngram_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: tokens collapse map-side into (doc, bucket) partial sums —
    the shuffle carries at most 64 rows per document regardless of
    document length; no vocabulary table exists anywhere (the trick's
    whole point)."""
    from gearpump_spark.operators.hashing import seeded_hash15

    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("w0")
    ).select("doc_id", F.lower(F.col("w0")).alias("w"))
    h = tok.select(
        "doc_id",
        (seeded_hash15(F.col("w"), 9) % 64).alias("bucket"),
        F.when(seeded_hash15(F.col("w"), 10) % 2 == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("s"),
    )
    return (
        h.groupBy("doc_id", "bucket")
        .agg(F.sum("s").alias("val"))
        .where(F.col("val") != 0)
        .select(
            "doc_id",
            F.col("bucket").cast("bigint").alias("bucket"),
            F.col("val").cast("bigint").alias("val"),
        )
        .orderBy("doc_id", "bucket")
    )


def _quality_lr_blocks(n_steps: int = 16, lr_den: int = 3) -> str:
    """The trainer CTE chain of _quality_lr_oracle WITHOUT the final
    select, ending at w{n_steps} — reusable by composed-pipeline oracles
    that score with the trained weights and keep going."""
    return _quality_lr_oracle(n_steps, lr_den, final_select=False)


def _quality_lr_oracle(
    n_steps: int = 16,
    lr_den: int = 3,
    include_label: bool = True,
    final_select: bool = True,
) -> str:
    """Unrolled CTE chain mirroring the integer logistic-regression
    trainer in text_quality_lr_int step for step: hashed features +
    bias, the keyword-teacher label, the per-feature Σx² preconditioner,
    then n_steps of (margin → hard-sigmoid → error → gradient → weight
    update) with every division in sign-magnitude floor form (Spark DIV
    truncates, DuckDB // floors; they agree only on non-negative
    magnitudes). Same MATERIALIZED discipline as _bpe_exact_oracle —
    fx is referenced twice per step."""
    h9 = _SQL_H15.format(seed="'9'", key="w")
    h10 = _SQL_H15.format(seed="'10'", key="w")
    blocks = [
        f"""
    tok AS (
        SELECT doc_id, LOWER(w) AS w FROM (
            SELECT doc_id,
                   UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'),
                                      t -> t <> '')) AS w
            FROM documents)),
    fx AS MATERIALIZED (
        SELECT doc_id, CAST({h9} % 64 AS BIGINT) AS j,
               CAST(SUM(CASE WHEN {h10} % 2 = 0 THEN 1 ELSE -1 END)
                    AS BIGINT) AS x
        FROM tok GROUP BY 1, 2
        HAVING SUM(CASE WHEN {h10} % 2 = 0 THEN 1 ELSE -1 END) <> 0
        UNION ALL
        SELECT doc_id, CAST(64 AS BIGINT), CAST(1 AS BIGINT) FROM documents),
    lab AS MATERIALIZED (
        SELECT d.doc_id,
               CASE WHEN COALESCE(c.pos, 0) > COALESCE(c.neg, 0)
                    THEN 1 ELSE 0 END AS y
        FROM documents d LEFT JOIN (
            SELECT doc_id,
                   COUNT(*) FILTER (WHERE w IN ('spark', 'table')) AS pos,
                   COUNT(*) FILTER (WHERE w IN ('row', 'batch')) AS neg
            FROM tok GROUP BY doc_id) c USING (doc_id)),
    xs AS MATERIALIZED (
        SELECT j, GREATEST(CAST(SUM(x * x) AS BIGINT), 1) AS xs
        FROM fx GROUP BY j),
    w0 AS (SELECT CAST(UNNEST(RANGE(0, 65)) AS BIGINT) AS j,
                  CAST(0 AS BIGINT) AS w)"""
    ]
    for t in range(n_steps):
        blocks.append(
            f""",
    z{t} AS MATERIALIZED (
        SELECT f.doc_id, SUM(w.w * f.x) AS z
        FROM fx f JOIN w{t} w USING (j) GROUP BY f.doc_id),
    e{t} AS MATERIALIZED (
        SELECT z.doc_id,
               l.y * 1000000 - LEAST(GREATEST(
                   CASE WHEN z.z < 0 THEN -((-z.z) // 4) ELSE z.z // 4 END
                   + 500000, 0), 1000000) AS e
        FROM z{t} z JOIN lab l USING (doc_id)),
    g{t} AS (
        SELECT f.j, SUM(f.x * e.e) AS g
        FROM fx f JOIN e{t} e USING (doc_id) GROUP BY f.j),
    w{t + 1} AS MATERIALIZED (
        SELECT w.j,
               w.w + CASE WHEN COALESCE(g.g, 0) < 0
                          THEN -((-COALESCE(g.g, 0)) // ({lr_den} * x.xs))
                          ELSE COALESCE(g.g, 0) // ({lr_den} * x.xs) END AS w
        FROM w{t} w LEFT JOIN g{t} g USING (j) JOIN xs x USING (j))"""
        )
    if not final_select:
        return "WITH" + "".join(blocks)
    label_col = ",\n           CAST(l.y AS BIGINT) AS label" if include_label else ""
    blocks.append(
        f""",
    zf AS (
        SELECT f.doc_id, SUM(w.w * f.x) AS z
        FROM fx f JOIN w{n_steps} w USING (j) GROUP BY f.doc_id)
    SELECT l.doc_id, CAST(z.z AS BIGINT) AS margin,
           CAST(CASE WHEN z.z >= 0 THEN 1 ELSE 0 END AS BIGINT) AS pred{label_col}
    FROM zf z JOIN lab l USING (doc_id) ORDER BY l.doc_id"""
    )
    return "WITH" + "".join(blocks)


@register(
    "text_quality_lr_int",
    oracle=_quality_lr_oracle(),
    desc="BIT-REPRODUCIBLE trained quality classifier (the one LLM-"
    "pipeline family that was heuristic-only): full-batch integer "
    "logistic regression with a hard-sigmoid link over the r7 64-bucket "
    "signed hashed-unigram features + bias, distilled from a keyword "
    "teacher rule (the CCNet/fastText bootstrap pattern: heuristic "
    "labels in, generalizing classifier out) — 16 gradient steps, each "
    "one distributed agg pass, diagonal Σx² preconditioning (computed "
    "once, exact integers; raw GD stalls at the majority class on "
    "mixed-scale features), micro-unit weights with sign-magnitude "
    "floor divisions throughout; trains from 63% majority to ~85% "
    "accuracy vs the 87.8% float-LR ceiling on the same features, and "
    "the whole 16-step fixpoint hash-matches an unrolled DuckDB CTE "
    "chain (the pagerank_int discipline applied to SGD; reference "
    "workload analog: the wordcount->Sum pipeline of "
    "examples/streaming/wordcount/.../Sum.scala:26-60 extended to "
    "scored emission)",
)
def text_quality_lr_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale (the SGD loop at 100 TB): features collapse map-side to
    ≤65 rows per doc; each step is ONE doc-keyed agg (margins) + ONE
    feature-keyed agg (gradient, 65 keys with map-side partial combine);
    only 65 gradient ints cross the driver boundary per step — weights
    ride back as a broadcast. Overflow: |e| ≤ 1e6, so |g_j| ≤ n·L·1e6
    (~1e17 at n=1e9, L=100) and Σx² ≤ n·L² — inside BIGINT on both
    engines; weights stay micro-unit bounded because the hard sigmoid's
    saturated examples contribute zero gradient. fx/lab materialize once
    (localCheckpoint) and serve all 33 passes."""
    from gearpump_spark.operators import classify as CL

    docs = table(spark, sf_dir, "documents")
    fx = CL.hashed_features(docs).localCheckpoint(eager=False)
    lab = CL.keyword_teacher_labels(docs).localCheckpoint(eager=False)
    w = CL.train_lr_int(spark, fx, lab, n_steps=16, lr_den=3)
    wdf = spark.createDataFrame(
        [(j, w[j]) for j in range(CL.N_BUCKETS + 1)], "j long, w long"
    )
    zf = (
        fx.join(F.broadcast(wdf), "j")
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("x")).alias("z"))
    )
    return (
        zf.join(lab, "doc_id")
        .select(
            "doc_id",
            F.col("z").cast("bigint").alias("margin"),
            F.when(F.col("z") >= 0, 1).otherwise(0).cast("bigint").alias("pred"),
            F.col("y").cast("bigint").alias("label"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_quality_lr_stream_score",
    oracle=_quality_lr_oracle(n_steps=8, include_label=False),
    desc="STREAMING scored emission, end to end under the driver gate "
    "(r8 verdict 'Next round' #4: promote score_documents from "
    "operator+test to a registered query): train the integer LR batch-"
    "side (8 preconditioned gradient steps, same discipline as "
    "text_quality_lr_int), then score the corpus through a REAL "
    "Structured Streaming micro-batch pipeline — file source -> "
    "row-local lr_margin_expr narrow map -> memory sink, availableNow "
    "trigger — and return the drained sink. Exact because scoring is "
    "linear in integer arithmetic: the streamed margin equals the batch "
    "Σ w_j·x_j bit for bit regardless of batch boundaries, so the "
    "8-step unrolled CTE oracle hash-matches a result that actually "
    "flowed through the streaming engine (the reference's scored-"
    "emission Task, examples/streaming/wordcount/.../Sum.scala:26-60, "
    "without a state store)",
)
def text_quality_lr_stream_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: training is the bounded part (65 ints/step to the driver);
    the streaming scorer is a STATELESS narrow map — no shuffle, no
    state store, no watermark — so it runs identically under
    micro-batch or Trigger.Continuous and backpressures on source read
    alone. The memory sink here is the test harness; production sinks
    (parquet/kafka) take the same writeStream."""
    import uuid

    from gearpump_spark.operators import classify as CL
    from gearpump_spark.streaming.core import run_to_completion, stream_source_path

    docs = table(spark, sf_dir, "documents")
    fx = CL.hashed_features(docs).localCheckpoint(eager=False)
    lab = CL.keyword_teacher_labels(docs).localCheckpoint(eager=False)
    w = CL.train_lr_int(spark, fx, lab, n_steps=8, lr_den=3)
    # stream_source_path handles both fixture shapes: driver single-file
    # fixtures (one-char glob so FileStreamSource derives basePath from
    # the parent dir) and Spark-written directory fixtures (direct path).
    stream = spark.readStream.schema(docs.schema).parquet(
        stream_source_path(f"{sf_dir}/documents.parquet")
    )
    scored = CL.score_documents(stream, w).select("doc_id", "margin", "pred")
    out = run_to_completion(
        scored, f"lr_stream_score_{uuid.uuid4().hex[:8]}"
    )
    return out.orderBy("doc_id")


_MC_CLASS_WORDS = (
    ("spark", "table"),
    ("row", "batch"),
    ("scan", "filter"),
    ("join", "group"),
)
_MC_N_STEPS = 12


def _quality_lr_multiclass_oracle(
    n_steps: int = _MC_N_STEPS, lr_den: int = 3
) -> str:
    """Unrolled CTE chain mirroring train_lr_multiclass_int step for
    step: the _quality_lr_oracle template with the class id as a GROUP
    KEY — one z/e/g/w CTE quartet per step covers all k classes at once,
    exactly like the joint Spark plan. The k-class teacher label is the
    argmax over marker-word counts with first-occurrence tie-break
    (DuckDB list_position == Spark array_position semantics)."""
    h9 = _SQL_H15.format(seed="'9'", key="w")
    h10 = _SQL_H15.format(seed="'10'", key="w")
    k = len(_MC_CLASS_WORDS)
    cnt_cols = ", ".join(
        "COUNT(*) FILTER (WHERE w IN ({})) AS c{}".format(
            ", ".join(f"'{w}'" for w in ws), i
        )
        for i, ws in enumerate(_MC_CLASS_WORDS)
    )
    cnt_list = ", ".join(f"COALESCE(c.c{i}, 0)" for i in range(k))
    blocks = [
        f"""
    tok AS (
        SELECT doc_id, LOWER(w) AS w FROM (
            SELECT doc_id,
                   UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'),
                                      t -> t <> '')) AS w
            FROM documents)),
    fx AS MATERIALIZED (
        SELECT doc_id, CAST({h9} % 64 AS BIGINT) AS j,
               CAST(SUM(CASE WHEN {h10} % 2 = 0 THEN 1 ELSE -1 END)
                    AS BIGINT) AS x
        FROM tok GROUP BY 1, 2
        HAVING SUM(CASE WHEN {h10} % 2 = 0 THEN 1 ELSE -1 END) <> 0
        UNION ALL
        SELECT doc_id, CAST(64 AS BIGINT), CAST(1 AS BIGINT) FROM documents),
    cls AS MATERIALIZED (
        SELECT d.doc_id,
               CAST(LIST_POSITION([{cnt_list}],
                    LIST_MAX([{cnt_list}])) - 1 AS BIGINT) AS label
        FROM documents d LEFT JOIN (
            SELECT doc_id, {cnt_cols}
            FROM tok GROUP BY doc_id) c USING (doc_id)),
    cl AS (SELECT CAST(UNNEST(RANGE(0, {k})) AS BIGINT) AS c),
    lab AS MATERIALIZED (
        SELECT s.doc_id, cl.c,
               CASE WHEN s.label = cl.c THEN 1 ELSE 0 END AS y
        FROM cls s CROSS JOIN cl),
    xs AS MATERIALIZED (
        SELECT j, GREATEST(CAST(SUM(x * x) AS BIGINT), 1) AS xs
        FROM fx GROUP BY j),
    w0 AS (SELECT cl.c, jj.j, CAST(0 AS BIGINT) AS w FROM cl CROSS JOIN
           (SELECT CAST(UNNEST(RANGE(0, 65)) AS BIGINT) AS j) jj)"""
    ]
    for t in range(n_steps):
        blocks.append(
            f""",
    z{t} AS MATERIALIZED (
        SELECT f.doc_id, w.c, SUM(w.w * f.x) AS z
        FROM fx f JOIN w{t} w USING (j) GROUP BY f.doc_id, w.c),
    e{t} AS MATERIALIZED (
        SELECT z.doc_id, z.c,
               l.y * 1000000 - LEAST(GREATEST(
                   CASE WHEN z.z < 0 THEN -((-z.z) // 4) ELSE z.z // 4 END
                   + 500000, 0), 1000000) AS e
        FROM z{t} z JOIN lab l ON l.doc_id = z.doc_id AND l.c = z.c),
    g{t} AS (
        SELECT e.c, f.j, SUM(f.x * e.e) AS g
        FROM fx f JOIN e{t} e USING (doc_id) GROUP BY e.c, f.j),
    w{t + 1} AS MATERIALIZED (
        SELECT w.c, w.j,
               w.w + CASE WHEN COALESCE(g.g, 0) < 0
                          THEN -((-COALESCE(g.g, 0)) // ({lr_den} * x.xs))
                          ELSE COALESCE(g.g, 0) // ({lr_den} * x.xs) END AS w
        FROM w{t} w LEFT JOIN g{t} g ON g.c = w.c AND g.j = w.j
        JOIN xs x ON x.j = w.j)"""
        )
    blocks.append(
        f""",
    zf AS (
        SELECT f.doc_id, w.c, SUM(w.w * f.x) AS z
        FROM fx f JOIN w{n_steps} w USING (j) GROUP BY f.doc_id, w.c),
    rk AS (
        SELECT doc_id, c, z,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY z DESC, c ASC) AS rn
        FROM zf)
    SELECT r.doc_id, CAST(r.c AS BIGINT) AS pred,
           CAST(r.z AS BIGINT) AS margin,
           CAST(s.label AS BIGINT) AS label,
           CAST(CASE WHEN r.c = s.label THEN 1 ELSE 0 END AS BIGINT)
             AS correct
    FROM rk r JOIN cls s USING (doc_id) WHERE r.rn = 1
    ORDER BY r.doc_id"""
    )
    return "WITH" + "".join(blocks)


@register(
    "text_quality_lr_multiclass",
    oracle=_quality_lr_multiclass_oracle(),
    desc="BIT-REPRODUCIBLE multi-class document classifier (r8 verdict "
    "'Next round' #4): one-vs-rest integer logistic regression over the "
    "64-bucket signed hashed-unigram features + bias, distilled from a "
    "4-class keyword-teacher argmax rule (marker-word groups, ties to "
    "the smallest class id) — trained JOINTLY with the class id as a "
    "group key, so each of the 12 gradient steps is still ONE "
    "doc×class-keyed margin agg + ONE (class, feature)-keyed gradient "
    "agg regardless of k; k·65 = 260 gradient ints to the driver per "
    "step, same Σx² preconditioning / hard-sigmoid / sign-magnitude "
    "floor-division discipline as text_quality_lr_int, and the whole "
    "12-step fixpoint plus the final argmax prediction hash-matches an "
    "unrolled DuckDB CTE chain (reference analog: the wordcount "
    "Split->Sum scored-emission pipeline, "
    "examples/streaming/wordcount/.../Sum.scala:26-60, one score per "
    "class)",
)
def text_quality_lr_multiclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: fx collapses map-side to ≤65 rows/doc and is shared by all
    classes; the k-way fan-out touches only the ≤65-row feature frame
    joined with a BROADCAST weight table (k·65 rows), never the corpus;
    per step exactly two distributed aggs run (margins, gradients) with
    map-side partial combine on both. Prediction is one row_number
    window over k rows per doc. fx/cls/labs materialize once
    (localCheckpoint) and serve all 2·12+1 passes."""
    from pyspark.sql import Window as W

    from gearpump_spark.operators import classify as CL

    k = len(_MC_CLASS_WORDS)
    docs = table(spark, sf_dir, "documents")
    fx = CL.hashed_features(docs).localCheckpoint(eager=False)
    cls = CL.keyword_teacher_multiclass(
        docs, class_words=_MC_CLASS_WORDS
    ).localCheckpoint(eager=False)
    labs = CL.one_vs_rest_labels(cls, k).localCheckpoint(eager=False)
    w = CL.train_lr_multiclass_int(
        spark, fx, labs, n_classes=k, n_steps=_MC_N_STEPS, lr_den=3
    )
    wdf = spark.createDataFrame(
        [(c, j, w[(c, j)]) for (c, j) in sorted(w)], "c long, j long, w long"
    )
    zf = (
        fx.join(F.broadcast(wdf), "j")
        .groupBy("doc_id", "c")
        .agg(F.sum(F.col("w") * F.col("x")).alias("z"))
    )
    win = W.partitionBy("doc_id").orderBy(F.col("z").desc(), F.col("c").asc())
    rk = zf.withColumn("rn", F.row_number().over(win)).where(F.col("rn") == 1)
    return (
        rk.join(cls, "doc_id")
        .select(
            "doc_id",
            F.col("c").cast("bigint").alias("pred"),
            F.col("z").cast("bigint").alias("margin"),
            F.col("label").cast("bigint").alias("label"),
            (F.col("c") == F.col("label")).cast("bigint").alias("correct"),
        )
        .orderBy("doc_id")
    )


@register(
    "pipeline_quality_dedup_pack",
    oracle=_quality_lr_blocks(n_steps=8)
    + """,
    zq AS (
        SELECT f.doc_id, SUM(w.w * f.x) AS z
        FROM fx f JOIN w8 w USING (j) GROUP BY f.doc_id),
    surv AS MATERIALIZED (
        SELECT doc_id, text FROM (
            SELECT d.doc_id, d.text,
                   MIN(d.doc_id) OVER (PARTITION BY
                       MD5(TRIM(REGEXP_REPLACE(LOWER(d.text), '\\s+', ' ',
                                               'g')))) AS keeper
            FROM documents d JOIN zq ON zq.doc_id = d.doc_id AND zq.z >= 0)
        WHERE doc_id = keeper),
    toks AS (
        SELECT doc_id,
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), w -> w <> '') AS tk
        FROM surv),
    st AS (
        SELECT doc_id, tk, UNNEST(GENERATE_SERIES(0, LEN(tk) - 1, 32)) AS start
        FROM toks WHERE LEN(tk) > 0),
    chunks AS (
        SELECT doc_id,
               CAST(start // 32 AS BIGINT) AS chunk_idx,
               CAST(LEN(tk[start + 1 : start + 32]) AS BIGINT) AS n_tokens,
               doc_id || ':' || CAST(start // 32 AS BIGINT) AS key
        FROM st),
    packed AS (
        SELECT doc_id, chunk_idx, n_tokens,
               CAST(CONCAT('0x', SUBSTR(MD5('1' || '|' || key), 1, 15)) AS BIGINT)
                 % 10000 % 8 AS shard,
               MD5('0' || '|' || key) AS h, key
        FROM chunks),
    binned AS (
        SELECT doc_id, chunk_idx, n_tokens,
               shard * 1099511627776
                 + CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY shard ORDER BY h, key
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       / 128) AS BIGINT) AS bin_id
        FROM packed)
    SELECT doc_id, chunk_idx, n_tokens, bin_id
    FROM binned ORDER BY doc_id, chunk_idx
    """,
    desc="the COMPOSED training-data pipeline, one registered query (r8 "
    "verdict 'Next round' #8): ingest -> trained-quality-LR score (8 "
    "integer gradient steps, then the row-local margin expression) -> "
    "keep docs the classifier accepts -> exact dedup among survivors "
    "(normalized-content fingerprint, min-id keeper) -> 32-token "
    "chunking -> 8-way sharded 128-token sequence packing; every stage "
    "is an operator this engine already ships, chained end to end, and "
    "the whole thing — trained weights included — hash-matches one "
    "DuckDB CTE chain",
)
def pipeline_quality_dedup_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'this is a data-pipeline engine, not a query zoo' query.
    Scale shape per stage: training is the lr_int loop (two aggs/step,
    65 ints to the driver); scoring is a ROW-LOCAL narrow map (no fx
    join needed — by integer linearity the token fold equals the batch
    margin); dedup shuffles (fingerprint, id) only, bodies never move;
    chunking is a bounded narrow fan-out; packing is one window pass per
    shard, shards independent. No stage holds state the next stage
    re-derives — the corpus flows through once."""
    from gearpump_spark.operators import chunking as CH
    from gearpump_spark.operators import classify as CL

    docs = table(spark, sf_dir, "documents")
    fx = CL.hashed_features(docs).localCheckpoint(eager=False)
    lab = CL.keyword_teacher_labels(docs).localCheckpoint(eager=False)
    w = CL.train_lr_int(spark, fx, lab, n_steps=8, lr_den=3)
    qual = docs.where(CL.lr_margin_expr(w) >= 0)
    keep = D.exact_dedup(qual).select(F.col("keep_id").alias("doc_id"))
    surv = qual.join(keep, "doc_id").select("doc_id", "text")
    chunks = CH.chunk_by_tokens(surv, size=32, stride=32).withColumn(
        "key", F.concat_ws(":", F.col("doc_id"), F.col("chunk_idx"))
    )
    packed = SP.pack_sequences(chunks, "key", "n_tokens", budget=128, shards=8)
    return packed.select("doc_id", "chunk_idx", "n_tokens", "bin_id").orderBy(
        "doc_id", "chunk_idx"
    )


@register(
    "multimodal_bmp_rle8_real",
    oracle="""
    SELECT doc_id,
           CAST(4 + doc_id % 8 AS INT) AS width,
           CAST(1 + doc_id % 5 AS INT) AS height,
           CAST(3 * LIST_SUM(LIST_TRANSFORM(
               RANGE(0, (4 + doc_id % 8) * (1 + doc_id % 5)),
               k -> CASE CAST(doc_id % 4 AS INT)
                    WHEN 0 THEN (doc_id + 9 * (k // (4 + doc_id % 8))) % 256
                    WHEN 1 THEN (doc_id + 5 * (k % (4 + doc_id % 8))
                                 + 3 * (k // (4 + doc_id % 8))) % 256
                    WHEN 2 THEN (doc_id + 3 * (k // (4 + doc_id % 8))
                                 + ((k % (4 + doc_id % 8)) // 2)) % 256
                    ELSE CASE
                         WHEN k % (4 + doc_id % 8) IN (1, 2) THEN 0
                         WHEN k % (4 + doc_id % 8) = 0
                           THEN (doc_id + 11 * (k // (4 + doc_id % 8))) % 256
                         ELSE (doc_id + 7 * (k % (4 + doc_id % 8))
                               + 3 * (k // (4 + doc_id % 8))) % 256
                         END END))
             AS BIGINT) AS px_sum
    FROM documents ORDER BY doc_id
    """,
    desc="REAL RLE8-compressed palette BMP decode (Windows BI_RLE8): "
    "encoded runs, word-padded absolute mode, end-of-line / end-of-"
    "bitmap escapes AND the 0x00 0x02 delta jump (skipped pixels defined "
    "as index 0) over a grayscale palette, bottom-up rows — decoded "
    "rasters checksummed against closed-form pixel arithmetic (the "
    "Windows-side RLE twin of the TIFF PackBits path)",
)
def multimodal_bmp_rle8_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/multimodal.py synthesize_bmp_rle8_payloads /
    PixelDecoder._decode_bmp_rle8: per-byte RLE state machine with a
    2-D cursor (delta jumps) inside an Arrow-batched narrow map;
    payloads never shuffle. px_sum is storage-order-invariant, so the
    bottom-up flip cancels out of the oracle."""
    from gearpump_spark.operators.multimodal import (
        pixel_stats,
        synthesize_bmp_rle8_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return pixel_stats(synthesize_bmp_rle8_payloads(docs)).orderBy("doc_id")


def _ppr_weighted_int_oracle(n_iter: int = 10, scale: int = 10**12, k: int = 5) -> str:
    """Unrolled CTE chain mirroring operators/graph.py
    personalized_pagerank_weighted_int exactly — the _ppr_int_oracle
    template with weight-proportional contributions ((r·w) // W, the
    product-then-floor order of the weighted family). Same MATERIALIZED
    discipline: each pr{{k}} is referenced twice per step."""
    blocks = [
        f"""
    ps AS MATERIALIZED (
        SELECT l_partkey + 1000000 AS src, l_suppkey AS dst,
               SUM(CAST(l_quantity AS BIGINT)) AS w
        FROM lineitem GROUP BY 1, 2),
    edges AS MATERIALIZED (
        SELECT src, dst, w FROM ps
        UNION ALL SELECT dst, src, w FROM ps),
    nodes AS MATERIALIZED (
        SELECT src AS node_id FROM edges UNION SELECT dst FROM edges),
    seeds AS MATERIALIZED (
        SELECT node_id FROM (SELECT DISTINCT dst AS node_id FROM ps)
        ORDER BY node_id LIMIT {k}),
    outw AS MATERIALIZED (SELECT src, SUM(w) AS tw FROM edges GROUP BY src),
    pr0 AS MATERIALIZED (
        SELECT n.node_id,
               CAST(CASE WHEN s.node_id IS NOT NULL
                         THEN {scale} // {k} ELSE 0 END AS BIGINT) AS r
        FROM nodes n LEFT JOIN seeds s ON s.node_id = n.node_id)"""
    ]
    for i in range(n_iter):
        blocks.append(
            f""",
    d{i} AS MATERIALIZED (SELECT COALESCE(SUM(r), 0) AS dm FROM pr{i}
             WHERE node_id NOT IN (SELECT src FROM outw)),
    c{i} AS MATERIALIZED (SELECT e.dst AS node_id,
                                 SUM((p.r * e.w) // o.tw) AS im
             FROM edges e JOIN outw o ON e.src = o.src
             JOIN pr{i} p ON p.node_id = e.src GROUP BY e.dst),
    pr{i + 1} AS MATERIALIZED (
        SELECT n.node_id,
               CAST(CASE WHEN s.node_id IS NOT NULL
                         THEN (15 * {scale}) // (100 * {k}) ELSE 0 END
                    + (85 * (COALESCE(c.im, 0)
                             + CASE WHEN s.node_id IS NOT NULL
                                    THEN d{i}.dm // {k} ELSE 0 END)) // 100
                 AS BIGINT) AS r
        FROM nodes n CROSS JOIN d{i}
        LEFT JOIN c{i} c ON c.node_id = n.node_id
        LEFT JOIN seeds s ON s.node_id = n.node_id)"""
        )
    return (
        "WITH"
        + "".join(blocks)
        + f"\n    SELECT node_id, r FROM pr{n_iter} ORDER BY node_id"
    )


@register(
    "graph_pagerank_weighted_personalized_int",
    oracle=_ppr_weighted_int_oracle(10),
    desc="BIT-REPRODUCIBLE weighted personalized PageRank (random walk "
    "with restart over the shipment-volume-weighted supplier<->part "
    "graph, seeds = 5 lowest supplier ids): the recommendation-scoring "
    "walk where edge strength matters — completes the integer-PageRank "
    "matrix (uniform/weighted x global/personalized), every cell "
    "hash-matching a DuckDB CTE chain",
)
def graph_pagerank_weighted_personalized_int(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """operators/graph.py personalized_pagerank_weighted_int: one
    dst-keyed shuffle per superstep, localCheckpoint lineage cuts,
    all-BIGINT (r*w) DIV W arithmetic; only the k seed ids cross the
    driver boundary."""
    from gearpump_spark.operators.graph import personalized_pagerank_weighted_int

    li = table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        (F.col("l_partkey") + F.lit(1_000_000)).alias("src"),
        F.col("l_suppkey").alias("dst"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("w"))
    edges = ps.unionByName(
        ps.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    seeds = [
        r[0] for r in ps.select("dst").distinct().orderBy("dst").limit(5).collect()
    ]
    return personalized_pagerank_weighted_int(edges, seeds, n_iter=10).orderBy(
        "node_id"
    )


@register(
    "text_lang_attribution",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang,
               UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'),
                                  w -> w <> '')) AS w
        FROM documents),
    tg AS (
        SELECT doc_id, lang,
               UNNEST(LIST_TRANSFORM(
                   RANGE(1, LENGTH('_' || LOWER(w) || '_') - 1),
                   i -> SUBSTR('_' || LOWER(w) || '_', CAST(i AS INT), 3))) AS g
        FROM tok),
    lcnt AS (SELECT lang, g, COUNT(*) AS c FROM tg GROUP BY 1, 2),
    lprof AS (
        SELECT lang, g, rk FROM (
            SELECT lang, g,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY c DESC, g) AS rk
            FROM lcnt) WHERE rk <= 40),
    dcnt AS (SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY 1, 2),
    dprof AS (
        SELECT doc_id, g, rk FROM (
            SELECT doc_id, g,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY c DESC, g) AS rk
            FROM dcnt) WHERE rk <= 20),
    dist AS (
        SELECT d.doc_id, l.cand,
               SUM(CASE WHEN p.rk IS NULL THEN 40
                        ELSE ABS(d.rk - p.rk) END) AS dist
        FROM dprof d
        CROSS JOIN (SELECT DISTINCT lang AS cand FROM documents) l
        LEFT JOIN lprof p ON p.lang = l.cand AND p.g = d.g
        GROUP BY 1, 2),
    pick AS (
        SELECT doc_id, cand, dist,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY dist, cand) AS rn
        FROM dist)
    SELECT dd.doc_id, dd.lang, p.cand AS pred_lang,
           CAST(p.dist AS BIGINT) AS oop_distance,
           (p.cand = dd.lang) AS correct
    FROM documents dd
    LEFT JOIN (SELECT * FROM pick WHERE rn = 1) p USING (doc_id)
    ORDER BY dd.doc_id
    """,
    desc="Cavnar-Trenkle language ATTRIBUTION (the 1994 classifier, not "
    "just the profile distance): each document's top-20 trigram rank "
    "profile scored against every language's top-40 corpus profile by "
    "the out-of-place measure, argmin wins (distance then lang "
    "tie-break), with a correctness flag vs the fixture's lang tag — "
    "the n-gram language-ID used for corpus routing at crawl scale",
)
def text_lang_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: trigram counts collapse map-side by (lang, g) and (doc, g);
    the doc-profile rank windows by doc_id, the lang profile (|langs|*40
    rows) broadcasts into the scoring join — per doc the compare touches
    20*|langs| rows, linear in corpus size."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(TX.tokens(F.col("text"))).alias("w")
    )
    # The padded-trigram relation feeds the language-profile AND the
    # doc-profile counts — the shared-relation checkpoint looked
    # indicated, but materializing the exploded trigram-string relation
    # (~3x the token text) measured 0.89x vs recomputing it per leg
    # (isolated 4-run paired A/B; the trigram-LM/tfidf lesson): each leg
    # is a fused explode→partial-agg over the scan, cheaper than the
    # block write + two reads. Deliberately left lazy.
    tg = _padded_trigrams(tok, "doc_id", "lang")
    lcnt = tg.groupBy("lang", "g").agg(F.count("*").alias("c"))
    lrk = F.row_number().over(
        Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("g"))
    )
    lprof = (
        lcnt.select("lang", "g", lrk.alias("rk"))
        .where(F.col("rk") <= 40)
        .select(
            F.col("lang").alias("pl"), F.col("g").alias("pg"),
            F.col("rk").alias("prk"),
        )
    )
    dcnt = tg.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    drk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("g"))
    )
    dprof = dcnt.select("doc_id", "g", drk.alias("rk")).where(F.col("rk") <= 20)
    langs = docs.select("lang").distinct().select(F.col("lang").alias("cand"))
    dist = (
        dprof.crossJoin(F.broadcast(langs))
        .join(
            F.broadcast(lprof),
            (F.col("cand") == F.col("pl")) & (F.col("g") == F.col("pg")),
            "left",
        )
        .groupBy("doc_id", "cand")
        .agg(
            F.sum(
                F.when(F.col("prk").isNull(), F.lit(40)).otherwise(
                    F.abs(F.col("rk") - F.col("prk"))
                )
            ).alias("dist")
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.asc("dist"), F.asc("cand"))
    )
    pick = dist.select("doc_id", "cand", "dist", rn.alias("rn")).where(
        F.col("rn") == 1
    )
    return (
        docs.select("doc_id", "lang")
        .join(pick, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.col("cand").alias("pred_lang"),
            F.col("dist").cast("bigint").alias("oop_distance"),
            (F.col("cand") == F.col("lang")).alias("correct"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_bigram_lm_perplexity",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               LIST_TRANSFORM(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'),
                                          w -> w <> ''), w -> LOWER(w)) AS tk
        FROM documents),
    ucnt AS (SELECT w, COUNT(*) AS cu
             FROM (SELECT UNNEST(tk) AS w FROM tok) GROUP BY w),
    vv AS (SELECT COUNT(*) AS v FROM ucnt),
    bg AS (
        SELECT doc_id,
               UNNEST(LIST_TRANSFORM(RANGE(1, LEN(tk)),
                   i -> tk[CAST(i AS INT)] || ' '
                        || tk[CAST(i + 1 AS INT)])) AS b
        FROM tok WHERE LEN(tk) >= 2),
    bcnt AS (SELECT b, COUNT(*) AS cb FROM bg GROUP BY b),
    scored AS (
        SELECT g.doc_id,
               CAST(ROUND(LN(CAST(bc.cb + 1 AS DOUBLE)), 6)
                    AS DECIMAL(18,6))
               - CAST(ROUND(LN(CAST(uc.cu + vv.v AS DOUBLE)), 6)
                    AS DECIMAL(18,6)) AS t
        FROM bg g
        JOIN bcnt bc ON bc.b = g.b
        JOIN ucnt uc ON uc.w = SPLIT_PART(g.b, ' ', 1)
        CROSS JOIN vv),
    agg AS (SELECT doc_id, COUNT(*) AS n_bigrams, SUM(t) AS ll
            FROM scored GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           ROUND(CAST(a.ll AS DOUBLE), 6) AS sum_logprob,
           ROUND(EXP(-CAST(a.ll AS DOUBLE) / a.n_bigrams), 4) AS perplexity
    FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id
    """,
    desc="add-one-smoothed bigram language-model perplexity per document "
    "(LM trained on the whole corpus): P(w2|w1) = (c12+1)/(c1+V), each "
    "log term ROUND(LN,6)-decimal before the exact decimal sum (the "
    "rounded-log-term discipline), one EXP at the end — the classic "
    "fluency/quality score data pipelines gate training text on",
)
def text_bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: bigram and unigram counts collapse map-side (vocabulary-
    bounded); the scoring join shuffles doc bigrams on the bigram key —
    linear in corpus tokens; V rides a 1-row broadcast."""
    docs = table(spark, sf_dir, "documents")
    # The tokenized corpus feeds three legs (unigram counts + the bigram
    # relation twice), the bigram relation two (its count + the scoring
    # probe), the unigram counts two (V + the scoring join) — fully lazy,
    # each leg re-ran the regex tokenize scan. Lazy localCheckpoints (r11
    # shared-relation discipline): tokenize runs once.
    base = docs.select(
        "doc_id",
        F.transform(TX.tokens(F.col("text")), lambda w: F.lower(w)).alias("tk"),
    ).localCheckpoint(eager=False)
    ucnt = (
        base.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cu"))
        .localCheckpoint(eager=False)
    )
    vv = ucnt.agg(F.count("*").alias("v"))
    # bg itself stays LAZY (the trigram-twin lesson): materializing the
    # exploded bigram-string relation costs more than re-exploding it
    # from the checkpointed arrays, and the bg->bcnt scoring join
    # re-uses bg's own (b) exchange.
    bg = base.where(F.size("tk") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 1),"
                " i -> concat(element_at(tk, CAST(i AS INT)), ' ',"
                " element_at(tk, CAST(i + 1 AS INT))))"
            )
        ).alias("b"),
    )
    bcnt = bg.groupBy("b").agg(F.count("*").alias("cb"))
    scored = (
        bg.join(bcnt, "b")
        .join(
            ucnt, F.split(F.col("b"), " ").getItem(0) == F.col("w"), "inner"
        )
        .crossJoin(F.broadcast(vv))
        .select(
            "doc_id",
            (
                F.round(F.log((F.col("cb") + 1).cast("double")), 6).cast(
                    "decimal(18,6)"
                )
                - F.round(
                    F.log((F.col("cu") + F.col("v")).cast("double")), 6
                ).cast("decimal(18,6)")
            ).alias("t"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"), F.sum("t").alias("ll")
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias(
                "n_bigrams"
            ),
            F.round(F.col("ll").cast("double"), 6).alias("sum_logprob"),
            F.round(
                F.exp(-F.col("ll").cast("double") / F.col("n_bigrams")), 4
            ).alias("perplexity"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_trigram_lm_perplexity",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               LIST_TRANSFORM(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'),
                                          t -> t <> ''), t -> LOWER(t)) AS tk
        FROM documents),
    ucnt AS (SELECT UNNEST(tk) AS w FROM base),
    vv AS (SELECT COUNT(DISTINCT w) AS v FROM ucnt),
    tg AS (
        SELECT doc_id,
               UNNEST(LIST_TRANSFORM(RANGE(1, LEN(tk) - 1),
                   i -> tk[CAST(i AS INT)] || ' ' || tk[CAST(i + 1 AS INT)]
                        || ' ' || tk[CAST(i + 2 AS INT)])) AS g
        FROM base WHERE LEN(tk) >= 3),
    tcnt AS (SELECT g, COUNT(*) AS ct FROM tg GROUP BY g),
    ctx AS (SELECT SPLIT_PART(g, ' ', 1) || ' ' || SPLIT_PART(g, ' ', 2) AS c,
                   COUNT(*) AS cc
            FROM tg GROUP BY 1),
    scored AS (
        SELECT t.doc_id,
               CAST(ROUND(LN(CAST(tc.ct + 1 AS DOUBLE)), 6)
                    AS DECIMAL(18,6))
               - CAST(ROUND(LN(CAST(cx.cc + vv.v AS DOUBLE)), 6)
                    AS DECIMAL(18,6)) AS t
        FROM tg t
        JOIN tcnt tc ON tc.g = t.g
        JOIN ctx cx ON cx.c = SPLIT_PART(t.g, ' ', 1) || ' '
                              || SPLIT_PART(t.g, ' ', 2)
        CROSS JOIN vv),
    agg AS (SELECT doc_id, COUNT(*) AS n_trigrams, SUM(t) AS ll
            FROM scored GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(a.n_trigrams, 0) AS BIGINT) AS n_trigrams,
           ROUND(CAST(a.ll AS DOUBLE), 6) AS sum_logprob,
           ROUND(EXP(-CAST(a.ll AS DOUBLE) / a.n_trigrams), 4) AS perplexity
    FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id
    """,
    desc="add-one-smoothed TRIGRAM language-model perplexity per document "
    "(the r7 bigram LM extended one order, the roadmap candidate): "
    "P(w3|w1w2) = (c123+1)/(c12+V) with the context count taken over "
    "trigram prefixes (so probabilities normalize per context), every "
    "log term ROUND(LN,6)-decimal before the exact decimal sum — LN "
    "args stay integral per the bigram lesson (LN of a quotient is not "
    "cross-engine stable at 6dp)",
)
def text_trigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: trigram and context counts collapse map-side (vocabulary-
    bounded); the scoring join shuffles doc trigrams on the trigram key —
    linear in corpus tokens; V rides a 1-row broadcast. Same plan shape
    as text_bigram_lm_perplexity with one extra keyed join."""
    docs = table(spark, sf_dir, "documents")
    # The tokenized corpus feeds two legs (V + the trigram relation) and
    # the trigram relation three (its count, the context count, the
    # scoring probe) — fully lazy, each leg re-ran the regex tokenize
    # scan. Lazy localCheckpoints (r11 shared-relation discipline).
    base = docs.select(
        "doc_id",
        F.transform(TX.tokens(F.col("text")), lambda w: F.lower(w)).alias("tk"),
    ).localCheckpoint(eager=False)
    vv = (
        base.select(F.explode("tk").alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    # tg itself stays LAZY: materializing the trigram-string relation
    # (~3x the token text) measured SLOWER than re-exploding it from the
    # checkpointed arrays, and the tg->tcnt scoring join re-uses tg's
    # own (g) exchange anyway.
    tg = base.where(F.size("tk") >= 3).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 2),"
                " i -> concat(element_at(tk, CAST(i AS INT)), ' ',"
                " element_at(tk, CAST(i + 1 AS INT)), ' ',"
                " element_at(tk, CAST(i + 2 AS INT))))"
            )
        ).alias("g"),
    )
    tcnt = tg.groupBy("g").agg(F.count("*").alias("ct"))
    ctx_key = F.concat_ws(
        " ", F.split(F.col("g"), " ").getItem(0), F.split(F.col("g"), " ").getItem(1)
    )
    ctx = tg.select(ctx_key.alias("c")).groupBy("c").agg(
        F.count("*").alias("cc")
    )
    scored = (
        tg.join(tcnt, "g")
        .join(ctx, ctx_key == F.col("c"), "inner")
        .crossJoin(F.broadcast(vv))
        .select(
            "doc_id",
            (
                F.round(F.log((F.col("ct") + 1).cast("double")), 6).cast(
                    "decimal(18,6)"
                )
                - F.round(
                    F.log((F.col("cc") + F.col("v")).cast("double")), 6
                ).cast("decimal(18,6)")
            ).alias("t"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_trigrams"), F.sum("t").alias("ll")
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_trigrams"), F.lit(0)).cast("bigint").alias(
                "n_trigrams"
            ),
            F.round(F.col("ll").cast("double"), 6).alias("sum_logprob"),
            F.round(
                F.exp(-F.col("ll").cast("double") / F.col("n_trigrams")), 4
            ).alias("perplexity"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_backoff_lm_score",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               LIST_TRANSFORM(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'),
                                          t -> t <> ''), t -> LOWER(t)) AS tk
        FROM documents),
    trn AS (SELECT doc_id, tk FROM base WHERE doc_id % 2 = 0),
    n_tok AS (SELECT CAST(SUM(LEN(tk)) AS BIGINT) AS n FROM trn),
    vsz AS (SELECT COUNT(DISTINCT w) AS v
            FROM (SELECT UNNEST(tk) AS w FROM trn)),
    tgt AS (
        SELECT s['w1'] AS w1, s['w2'] AS w2, s['w3'] AS w3 FROM (
            SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(tk) - 1),
                i -> {'w1': tk[CAST(i AS INT)], 'w2': tk[CAST(i + 1 AS INT)],
                      'w3': tk[CAST(i + 2 AS INT)]})) AS s
            FROM trn WHERE LEN(tk) >= 3)),
    tga AS (
        SELECT doc_id, s['w1'] AS w1, s['w2'] AS w2, s['w3'] AS w3 FROM (
            SELECT doc_id,
                   UNNEST(LIST_TRANSFORM(RANGE(1, LEN(tk) - 1),
                i -> {'w1': tk[CAST(i AS INT)], 'w2': tk[CAST(i + 1 AS INT)],
                      'w3': tk[CAST(i + 2 AS INT)]})) AS s
            FROM base WHERE LEN(tk) >= 3)),
    tcnt AS (SELECT w1, w2, w3, COUNT(*) AS ct FROM tgt GROUP BY 1, 2, 3),
    c12 AS (SELECT w1, w2, COUNT(*) AS cc FROM tgt GROUP BY 1, 2),
    bgt AS (
        SELECT s['b1'] AS b1, s['b2'] AS b2 FROM (
            SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(tk)),
                i -> {'b1': tk[CAST(i AS INT)],
                      'b2': tk[CAST(i + 1 AS INT)]})) AS s
            FROM trn WHERE LEN(tk) >= 2)),
    bcnt AS (SELECT b1, b2, COUNT(*) AS bc FROM bgt GROUP BY 1, 2),
    c2 AS (SELECT b1 AS h1, COUNT(*) AS hc FROM bgt GROUP BY 1),
    ucnt AS (SELECT w, COUNT(*) AS uc
             FROM (SELECT UNNEST(tk) AS w FROM trn) GROUP BY 1),
    scored AS (
        SELECT t.doc_id,
               CASE WHEN tc.ct IS NOT NULL THEN 2
                    WHEN bc.bc IS NOT NULL THEN 1 ELSE 0 END AS tier,
               CASE WHEN tc.ct IS NOT NULL THEN
                      CAST(ROUND(LN(CAST(tc.ct AS DOUBLE)), 6)
                           AS DECIMAL(18,6))
                    - CAST(ROUND(LN(CAST(cx.cc AS DOUBLE)), 6)
                           AS DECIMAL(18,6))
                    WHEN bc.bc IS NOT NULL THEN
                      CAST(-0.916291 AS DECIMAL(18,6))
                    + CAST(ROUND(LN(CAST(bc.bc AS DOUBLE)), 6)
                           AS DECIMAL(18,6))
                    - CAST(ROUND(LN(CAST(h.hc AS DOUBLE)), 6)
                           AS DECIMAL(18,6))
                    ELSE
                      CAST(-1.832582 AS DECIMAL(18,6))
                    + CAST(ROUND(LN(CAST(COALESCE(u.uc, 0) + 1 AS DOUBLE)), 6)
                           AS DECIMAL(18,6))
                    - CAST(ROUND(LN(CAST(n.n + v.v AS DOUBLE)), 6)
                           AS DECIMAL(18,6))
               END AS t
        FROM tga t
        LEFT JOIN tcnt tc ON tc.w1 = t.w1 AND tc.w2 = t.w2 AND tc.w3 = t.w3
        LEFT JOIN c12 cx ON cx.w1 = t.w1 AND cx.w2 = t.w2
        LEFT JOIN bcnt bc ON bc.b1 = t.w2 AND bc.b2 = t.w3
        LEFT JOIN c2 h ON h.h1 = t.w2
        LEFT JOIN ucnt u ON u.w = t.w3
        CROSS JOIN n_tok n CROSS JOIN vsz v),
    agg AS (SELECT doc_id, COUNT(*) AS n_scored, SUM(t) AS ll,
                   SUM(CASE WHEN tier = 2 THEN 1 ELSE 0 END) AS tri,
                   SUM(CASE WHEN tier = 1 THEN 1 ELSE 0 END) AS bi,
                   SUM(CASE WHEN tier = 0 THEN 1 ELSE 0 END) AS uni
            FROM scored GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(a.n_scored, 0) AS BIGINT) AS n_scored,
           CAST(COALESCE(a.tri, 0) AS BIGINT) AS n_tri_hits,
           CAST(COALESCE(a.bi, 0) AS BIGINT) AS n_bi_hits,
           CAST(COALESCE(a.uni, 0) AS BIGINT) AS n_uni_floor,
           ROUND(CAST(a.ll AS DOUBLE), 6) AS sum_logscore
    FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id
    """,
    desc="STUPID-BACKOFF trigram scoring (Brants 2007 'Large Language "
    "Models in Machine Translation' — the LM smoothing DESIGNED for "
    "distributed count stores: no normalization pass, just counts and a "
    "fixed 0.4 backoff factor): n-gram counts train on the even-doc_id "
    "HALF of the corpus and score ALL docs, so the bigram/unigram "
    "backoff tiers actually fire on held-out text (self-trained "
    "counts would make backoff vacuous); per trigram position score = "
    "ln c123 - ln c12, else ln0.4 + ln c23 - ln c2, else 2ln0.4 + "
    "ln(c3+1) - ln(N+V) — every LN arg integral, every term a "
    "ROUND(LN,6) decimal, ln0.4 a shared 6dp literal, per-tier hit "
    "counts surfaced as exact integers. The gated score is the exact-"
    "decimal sum_logscore (ADVICE r9 #3: no EXP of a non-integral arg "
    "under the hash gate — perplexity is display-derivable as "
    "exp(-sum_logscore/n_scored))",
)
def text_backoff_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale (why Google built stupid backoff this way): counts are
    map-side-combined groupBys, never normalized — no second pass over
    the count store; scoring shuffles doc trigrams on their n-gram keys
    (5 keyed equi-joins, each against a vocabulary-bounded count table);
    N and V ride 1-row broadcasts. The train/score split is a narrow
    filter, not a shuffle."""
    docs = table(spark, sf_dir, "documents")
    # The tokenized corpus feeds EIGHT legs (n_tok, vsz, tcnt, c12, bcnt,
    # c2, ucnt via train, plus tga) — fully lazy, each leg re-ran the
    # regex tokenize scan (r11 plan audit: 8 tokenize subtrees for one
    # query). Lazy localCheckpoint materializes it once at first action;
    # every count table and the scoring stream read the blocks.
    base = docs.select(
        "doc_id",
        F.transform(TX.tokens(F.col("text")), lambda w: F.lower(w)).alias("tk"),
    ).localCheckpoint(eager=False)
    train = base.where(F.col("doc_id") % 2 == 0)
    n_tok = train.agg(F.sum(F.size("tk")).cast("long").alias("n"))
    vsz = train.select(F.explode("tk").alias("w")).agg(
        F.count_distinct("w").alias("v")
    )

    def tri(df: DataFrame, with_doc: bool) -> DataFrame:
        cols = (["doc_id"] if with_doc else []) + ["s.w1", "s.w2", "s.w3"]
        return (
            df.where(F.size("tk") >= 3)
            .select(
                *(["doc_id"] if with_doc else []),
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(tk) - 2), i -> struct("
                        "element_at(tk, CAST(i AS INT)) AS w1,"
                        " element_at(tk, CAST(i + 1 AS INT)) AS w2,"
                        " element_at(tk, CAST(i + 2 AS INT)) AS w3))"
                    )
                ).alias("s"),
            )
            .select(*cols)
        )

    tgt = tri(train, with_doc=False)
    tga = tri(base, with_doc=True)
    tcnt = tgt.groupBy("w1", "w2", "w3").agg(F.count("*").alias("ct"))
    c12 = tgt.groupBy("w1", "w2").agg(F.count("*").alias("cc"))
    big = (
        train.where(F.size("tk") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1), i -> struct("
                    "element_at(tk, CAST(i AS INT)) AS b1,"
                    " element_at(tk, CAST(i + 1 AS INT)) AS b2))"
                )
            ).alias("s")
        )
        .select("s.b1", "s.b2")
    )
    bcnt = big.groupBy("b1", "b2").agg(F.count("*").alias("bc"))
    c2 = big.groupBy("b1").agg(F.count("*").alias("hc")).withColumnRenamed(
        "b1", "h1"
    )
    ucnt = (
        train.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("uc"))
    )

    def rln(c):  # ROUND(LN(int), 6) as an exact decimal term
        return F.round(F.log(c.cast("double")), 6).cast("decimal(18,6)")

    ln04 = F.lit("-0.916291").cast("decimal(18,6)")
    ln04x2 = F.lit("-1.832582").cast("decimal(18,6)")
    scored = (
        tga.join(tcnt, ["w1", "w2", "w3"], "left")
        .join(c12, ["w1", "w2"], "left")
        .join(
            bcnt,
            (F.col("b1") == F.col("w2")) & (F.col("b2") == F.col("w3")),
            "left",
        )
        .join(c2, F.col("h1") == F.col("w2"), "left")
        .join(ucnt, F.col("w") == F.col("w3"), "left")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(vsz))
        .select(
            "doc_id",
            F.when(F.col("ct").isNotNull(), 2)
            .when(F.col("bc").isNotNull(), 1)
            .otherwise(0)
            .alias("tier"),
            F.when(F.col("ct").isNotNull(), rln(F.col("ct")) - rln(F.col("cc")))
            .when(
                F.col("bc").isNotNull(),
                ln04 + rln(F.col("bc")) - rln(F.col("hc")),
            )
            .otherwise(
                ln04x2
                + rln(F.coalesce(F.col("uc"), F.lit(0)) + 1)
                - rln(F.col("n") + F.col("v"))
            )
            .alias("t"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_scored"),
        F.sum("t").alias("ll"),
        F.sum(F.when(F.col("tier") == 2, 1).otherwise(0)).alias("tri"),
        F.sum(F.when(F.col("tier") == 1, 1).otherwise(0)).alias("bi"),
        F.sum(F.when(F.col("tier") == 0, 1).otherwise(0)).alias("uni"),
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_scored"), F.lit(0)).cast("bigint").alias(
                "n_scored"
            ),
            F.coalesce(F.col("tri"), F.lit(0)).cast("bigint").alias(
                "n_tri_hits"
            ),
            F.coalesce(F.col("bi"), F.lit(0)).cast("bigint").alias("n_bi_hits"),
            F.coalesce(F.col("uni"), F.lit(0)).cast("bigint").alias(
                "n_uni_floor"
            ),
            F.round(F.col("ll").cast("double"), 6).alias("sum_logscore"),
        )
        .orderBy("doc_id")
    )


_DRW_N_STEPS = 8
_DRW_SCALE = 1_000_000
_DRW_BUDGET = 1_000_000


def _domain_reweight_oracle(n_steps: int = _DRW_N_STEPS) -> str:
    """Unrolled mirror of sample_domain_reweight_int: per-domain mean
    unigram surprisal in integer 1e-4-ln units (the text_unigram_logprob
    rounded-decimal discipline, domain-grouped), then n_steps of
    multiplicative weights against the CURRENT mixture's weighted mean
    (20-row CTEs), then exact largest-remainder apportionment of the
    sample budget. Every division is on non-negative magnitudes
    (sign-magnitude where the excess can be negative)."""
    s, b = _DRW_SCALE, _DRW_BUDGET
    blocks = [
        f"""
    toks AS (
        SELECT source, UNNEST(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]+')) AS tok
        FROM documents),
    vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    total AS (SELECT SUM(c) AS n FROM vocab),
    src_tok AS (
        SELECT source, tok, COUNT(*) AS m FROM toks GROUP BY source, tok),
    terms AS (
        SELECT st.source, st.m,
               CAST(ROUND(LN(CAST(v.c AS DOUBLE) / CAST(t.n AS DOUBLE)), 4)
                    AS DECIMAL(12,4)) AS lp
        FROM src_tok st JOIN vocab v USING (tok) CROSS JOIN total t),
    loss AS MATERIALIZED (
        SELECT source,
               CAST(CAST(SUM(m * (0 - lp)) * 10000 AS BIGINT)
                    // CAST(SUM(m) AS BIGINT) AS BIGINT) AS loss
        FROM terms GROUP BY source),
    w0 AS (SELECT source, CAST({s} AS BIGINT) AS w FROM loss)"""
    ]
    for t in range(n_steps):
        blocks.append(
            f""",
    mu{t} AS (
        SELECT GREATEST(CAST(SUM(w.w * l.loss) AS BIGINT)
                        // CAST(SUM(w.w) AS BIGINT), 1) AS mu
        FROM w{t} w JOIN loss l USING (source)),
    w{t + 1} AS (
        SELECT w.source,
               GREATEST(w.w + CASE WHEN l.loss < m.mu
                    THEN -((w.w * (m.mu - l.loss)) // (4 * m.mu))
                    ELSE (w.w * (l.loss - m.mu)) // (4 * m.mu) END,
                    1) AS w
        FROM w{t} w JOIN loss l USING (source) CROSS JOIN mu{t} m)"""
        )
    blocks.append(
        f""",
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM w{n_steps}),
    base AS (
        SELECT source, w,
               ({b} * w) // t.tw AS q, ({b} * w) % t.tw AS r
        FROM w{n_steps} CROSS JOIN tot t),
    lo AS (SELECT CAST({b} - SUM(q) AS BIGINT) AS l FROM base),
    rk AS (
        SELECT source, w, q,
               ROW_NUMBER() OVER (ORDER BY r DESC, source ASC) AS rn
        FROM base)
    SELECT b.source AS domain,
           CAST(l2.loss AS BIGINT) AS loss_micro,
           CAST(b.w AS BIGINT) AS weight,
           CAST(b.q + CASE WHEN b.rn <= lo.l THEN 1 ELSE 0 END AS BIGINT)
             AS n_alloc
    FROM rk b JOIN loss l2 USING (source) CROSS JOIN lo
    ORDER BY domain"""
    )
    return "WITH" + "".join(blocks)


@register(
    "sample_domain_reweight_int",
    oracle=_domain_reweight_oracle(),
    desc="DoReMi-style TRAINED domain-mixture reweighting (Xie 2023, "
    "scaled to an integer fixpoint): per-domain mean unigram surprisal "
    "(rounded-decimal 1e-4-ln units — the perplexity-proxy 'excess "
    "loss') drives 8 multiplicative-weights steps against the CURRENT "
    "mixture's weighted mean — high-surprisal domains gain mass, the "
    "reference point moves with the mixture so the fixpoint is "
    "non-trivial — then the sample budget apportions by exact largest "
    "remainder (ties remainder DESC, domain ASC); the lr_int/"
    "pagerank_int integer discipline applied to mixture proportions, "
    "giving the sampling/mixing family its trained member",
)
def sample_domain_reweight_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: ONE corpus pass computes the per-domain loss (token-keyed
    vocab join with per-(domain, token) pre-aggregation — Zipf skew
    bounded exactly as in text_unigram_logprob); every reweighting step
    then touches only the |domains|-row weight frame (two 20-row joins
    + one scalar agg per step, all lazy in one plan — no driver state,
    no collect anywhere). The apportionment is one window over
    |domains| rows."""
    from pyspark.sql import Window as W

    s, b = _DRW_SCALE, _DRW_BUDGET
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z]+"), F.lit(0))
        ).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    src_tok = toks.groupBy("source", "tok").agg(F.count("*").alias("m"))
    lp = F.round(
        F.log(F.col("c").cast("double") / F.col("n").cast("double")), 4
    ).cast("decimal(12,4)")
    terms = src_tok.join(vocab, "tok").crossJoin(F.broadcast(total)).select(
        "source", "m", lp.alias("lp")
    )
    loss = (
        terms.groupBy("source")
        .agg(
            F.sum(F.col("m") * (F.lit(0) - F.col("lp"))).alias("_sp"),
            F.sum("m").cast("bigint").alias("_m"),
        )
        .select(
            "source",
            F.expr("CAST(_sp * 10000 AS BIGINT) DIV _m").alias("loss"),
        )
        .localCheckpoint(eager=False)
    )
    w = loss.select("source", F.lit(s).cast("bigint").alias("w"))
    for _t in range(_DRW_N_STEPS):
        mu = (
            w.join(loss, "source")
            .agg(
                F.sum(F.col("w") * F.col("loss")).cast("bigint").alias("_wl"),
                F.sum("w").cast("bigint").alias("_w"),
            )
            .select(
                F.greatest(
                    F.expr("_wl DIV _w"), F.lit(1).cast("bigint")
                ).alias("mu")
            )
        )
        delta = F.when(
            F.col("loss") < F.col("mu"),
            -F.expr("(w * (mu - loss)) DIV (4 * mu)"),
        ).otherwise(F.expr("(w * (loss - mu)) DIV (4 * mu)"))
        # per-round lineage cut (the pagerank_int/kcore idiom): w(t) feeds
        # BOTH mu(t) and w(t+1) — left lazy, each level re-executes its
        # predecessor's subtree twice and the 8-step chain goes 2^8
        # (measured 116 s vs 13 s on 20-row frames)
        w = (
            w.join(loss, "source")
            .crossJoin(F.broadcast(mu))
            .select(
                "source",
                F.greatest(F.col("w") + delta, F.lit(1).cast("bigint")).alias(
                    "w"
                ),
            )
            .localCheckpoint(eager=False)
        )
    tot = w.agg(F.sum("w").cast("bigint").alias("tw"))
    base = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "w",
        F.expr(f"({b} * w) DIV tw").alias("q"),
        F.expr(f"({b} * w) % tw").alias("r"),
    )
    lo = base.agg((F.lit(b) - F.sum("q")).cast("bigint").alias("l"))
    rk = base.withColumn(
        "rn",
        F.row_number().over(
            W.orderBy(F.col("r").desc(), F.col("source").asc())
        ),
    )
    return (
        rk.join(loss, "source")
        .crossJoin(F.broadcast(lo))
        .select(
            F.col("source").alias("domain"),
            F.col("loss").cast("bigint").alias("loss_micro"),
            F.col("w").cast("bigint").alias("weight"),
            (
                F.col("q")
                + F.when(F.col("rn") <= F.col("l"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_alloc"),
        )
        .orderBy("domain")
    )


@register(
    "dedup_lsh_scurve",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    nn AS (SELECT LEAST(10000, 1500000 // COUNT(*)) AS rate FROM documents),
    samp AS (SELECT doc_id FROM documents CROSS JOIN nn
             WHERE CAST(CONCAT('0x', SUBSTR(MD5('11' || '|' || doc_id), 1, 15))
                   AS BIGINT) % 10000 < nn.rate),
    sh AS (SELECT DISTINCT s.doc_id, s.shingle FROM shingled s
           JOIN samp USING (doc_id)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    pairs AS (
        SELECT sa.doc_id AS a, sb.doc_id AS b,
               COALESCE(i.i, 0) AS i,
               za.n + zb.n - COALESCE(i.i, 0) AS u
        FROM samp sa JOIN samp sb ON sa.doc_id < sb.doc_id
        JOIN sizes za ON za.doc_id = sa.doc_id
        JOIN sizes zb ON zb.doc_id = sb.doc_id
        LEFT JOIN inter i ON i.a = sa.doc_id AND i.b = sb.doc_id),
    sig AS (
        SELECT doc_id,
               MIN(MD5('0|' || shingle)) AS h0, MIN(MD5('1|' || shingle)) AS h1,
               MIN(MD5('2|' || shingle)) AS h2, MIN(MD5('3|' || shingle)) AS h3,
               MIN(MD5('4|' || shingle)) AS h4, MIN(MD5('5|' || shingle)) AS h5
        FROM sh GROUP BY doc_id),
    bands AS (
        SELECT doc_id, bi.band_idx,
               CASE bi.band_idx
                    WHEN 0 THEN MD5(h0 || '|' || h1)
                    WHEN 1 THEN MD5(h2 || '|' || h3)
                    ELSE MD5(h4 || '|' || h5) END AS band_key
        FROM sig
        CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS band_idx) bi),
    cand AS (
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM bands x JOIN bands y
          ON x.band_idx = y.band_idx AND x.band_key = y.band_key
             AND x.doc_id < y.doc_id),
    scored0 AS (
        SELECT CAST((10 * p.i) // p.u AS BIGINT) AS bucket,
               (c.a IS NOT NULL) AS hit,
               CAST(p.i AS DOUBLE) / CAST(p.u AS DOUBLE) AS q
        FROM pairs p LEFT JOIN cand c ON c.a = p.a AND c.b = p.b),
    scored AS (
        SELECT bucket, hit,
               CAST(ROUND(1 - (1 - q*q) * (1 - q*q) * (1 - q*q), 6)
                 AS DECIMAL(18,6)) AS pt
        FROM scored0)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_collisions,
           ROUND(CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS emp_rate,
           ROUND(CAST(SUM(pt) AS DOUBLE) / COUNT(*), 6) AS avg_theory
    FROM scored GROUP BY bucket ORDER BY bucket
    """,
    desc="LSH banding S-CURVE audit (Leskovec MMDS ch.3): over every pair "
    "of a 10% hash-stable doc sample, the EMPIRICAL banded-collision "
    "rate per exact-Jaccard decile next to the theoretical curve "
    "1-(1-s^r)^b (b=3, r=2) — the theory term computed in IEEE double "
    "as 1-(1-(i/u)^2)^3 with the identical operation order in both "
    "engines (the r7 integer rational u^6 wrapped BIGINT past u~1448, "
    "a silent Spark-side divergence for long documents — ADVICE r7 #2) "
    "— the tuning table that tells a dedup operator which "
    "similarity mass their band/row choice will catch or leak; the "
    "sample rate adapts as min(10000, 1500000//n_docs) basis points "
    "(~150 docs at every scale), the same double formula in both "
    "engines",
)
def dedup_lsh_scurve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete-pair ground truth is inherently quadratic, so it runs on
    a bounded hash-stable sample like dedup_lsh_recall (independent
    seed), with the rate SHRINKING as the corpus grows — rate_bp =
    min(10000, 1500000 // n_docs) holds the sampled set at ~150 docs at
    every scale, so the all-pairs cross join is a CONSTANT ~11k tiny
    rows whether the corpus is 500 docs or 500 billion (the advice
    dedup_lsh_recall documents, mechanized per the adaptive-parameter
    discipline: the oracle mirrors the same double formula). Exact
    intersections ride the inverted shingle index; the LSH side reuses
    minhash_signatures/lsh_candidate_pairs unchanged; curve variance
    depends on |S|, not corpus size."""
    from gearpump_spark.operators import sampling as SP2

    all_docs = table(spark, sf_dir, "documents")
    rate_bp = min(10000, 1_500_000 // all_docs.count())
    # The ~150-doc hash-stable sample feeds FOUR consumers (the shingle
    # set, both crossJoin sides of the all-pairs id list, the MinHash
    # side) and each otherwise re-runs the FULL-corpus scan + md5 sample
    # filter. Same for the distinct shingle set (sizes ×2 via both size
    # joins + both sides of the intersection self-join) and the tiny
    # per-doc size aggregate. Lazy localCheckpoints (r11 shared-relation
    # discipline): the corpus is scanned once, everything downstream
    # reads materialized blocks.
    docs = SP2.hash_sample(all_docs, "doc_id", rate_bp, seed=11).localCheckpoint(
        eager=False
    )
    sh = (
        docs.select(
            "doc_id", F.explode(D.word_shingles(F.col("text"))).alias("shingle")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = (
        sh.groupBy("doc_id").agg(F.count("*").alias("n")).localCheckpoint(eager=False)
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("ia"), F.col("b.doc_id").alias("ib"))
        .agg(F.count("*").alias("i"))
    )
    ids = docs.select("doc_id")
    pairs = (
        ids.select(F.col("doc_id").alias("pa"))
        .crossJoin(ids.select(F.col("doc_id").alias("pb")))
        .where(F.col("pa") < F.col("pb"))
        .join(sizes.select(F.col("doc_id").alias("pa"), F.col("n").alias("na")), "pa")
        .join(sizes.select(F.col("doc_id").alias("pb"), F.col("n").alias("nb")), "pb")
        .join(
            inter,
            (F.col("pa") == F.col("ia")) & (F.col("pb") == F.col("ib")),
            "left",
        )
        .select(
            "pa",
            "pb",
            F.coalesce(F.col("i"), F.lit(0)).alias("i"),
            (F.col("na") + F.col("nb") - F.coalesce(F.col("i"), F.lit(0))).alias("u"),
        )
    )
    sig = D.minhash_signatures(docs, k=6)
    cand = D.lsh_candidate_pairs(sig, k=6, rows_per_band=2).select(
        F.col("a").alias("ca"), F.col("b").alias("cb"), F.lit(True).alias("hit")
    )
    # Theory term 1-(1-s^2)^3 with s = i/u computed entirely in IEEE
    # double — identical op order to the oracle (q*q, then three-way
    # left-assoc product), so the engines agree bit-for-bit and nothing
    # overflows for ANY shingle-set size. The r7 form multiplied u^6 in
    # BIGINT, which wraps silently past u ~ 1448 while DuckDB raises
    # (ADVICE r7 #2).
    q = F.col("i").cast("double") / F.col("u").cast("double")
    t = F.lit(1.0) - q * q
    pt = F.round(F.lit(1.0) - t * t * t, 6).cast("decimal(18,6)")
    scored = pairs.join(
        cand, (F.col("pa") == F.col("ca")) & (F.col("pb") == F.col("cb")), "left"
    ).select(
        F.expr("(10 * i) DIV u").cast("bigint").alias("bucket"),
        F.coalesce(F.col("hit"), F.lit(False)).alias("hit"),
        pt.alias("pt"),
    )
    hits = F.sum(F.when(F.col("hit"), 1).otherwise(0))
    return (
        scored.groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            hits.cast("bigint").alias("n_collisions"),
            F.round(hits.cast("double") / F.count("*"), 6).alias("emp_rate"),
            F.round(F.sum("pt").cast("double") / F.count("*"), 6).alias(
                "avg_theory"
            ),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

# DSIR selects individual pretraining examples that look like a TARGET
# domain: hashed n-gram bucket counts estimate a target and a raw
# distribution, each candidate doc scores the sum of per-bucket log
# importance ratios over its n-gram occurrences, and the top-weighted
# docs are kept. The deterministic top-K variant below replaces the
# paper's Gumbel-noise resampling so both engines select the identical
# set (ties broken by doc_id). Companion to sample_domain_reweight_int:
# DoReMi reweights whole domains, DSIR picks individual examples.
_DSIR_TGT = "('src1', 'src2', 'src3')"
_DSIR_BUCKETS = 256
_DSIR_TOPK = 100
_DSIR_SEED = 13


@register(
    "sample_dsir_select",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, source,
               LIST_TRANSFORM(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'),
                                          t -> t <> ''), t -> LOWER(t)) AS tk
        FROM documents),
    feats AS (
        SELECT doc_id, source, UNNEST(tk) AS g FROM base
        UNION ALL
        SELECT doc_id, source,
               UNNEST(LIST_TRANSFORM(RANGE(1, LEN(tk)),
                   i -> tk[CAST(i AS INT)] || ' ' || tk[CAST(i + 1 AS INT)]))
                 AS g
        FROM base WHERE LEN(tk) >= 2),
    fb AS (SELECT doc_id, source,
                  {_SQL_H15.format(seed="'13'", key="g")} % {_DSIR_BUCKETS} AS b
           FROM feats),
    tc AS (SELECT b, COUNT(*) AS ct FROM fb
           WHERE source IN {_DSIR_TGT} GROUP BY b),
    rc AS (SELECT b, COUNT(*) AS cr FROM fb
           WHERE source NOT IN {_DSIR_TGT} GROUP BY b),
    tt AS (SELECT COUNT(*) AS nt FROM fb WHERE source IN {_DSIR_TGT}),
    rt AS (SELECT COUNT(*) AS nr FROM fb WHERE source NOT IN {_DSIR_TGT}),
    wt AS (
        SELECT g.b,
               CAST(ROUND(LN(CAST(COALESCE(tc.ct, 0) + 1 AS DOUBLE)), 6)
                    AS DECIMAL(18,6))
             - CAST(ROUND(LN(CAST(tt.nt + {_DSIR_BUCKETS} AS DOUBLE)), 6)
                    AS DECIMAL(18,6))
             - CAST(ROUND(LN(CAST(COALESCE(rc.cr, 0) + 1 AS DOUBLE)), 6)
                    AS DECIMAL(18,6))
             + CAST(ROUND(LN(CAST(rt.nr + {_DSIR_BUCKETS} AS DOUBLE)), 6)
                    AS DECIMAL(18,6)) AS lw
        FROM (SELECT UNNEST(RANGE({_DSIR_BUCKETS})) AS b) g
        LEFT JOIN tc USING (b) LEFT JOIN rc USING (b)
        CROSS JOIN tt CROSS JOIN rt),
    sc AS (SELECT f.doc_id, COUNT(*) AS n_feats, SUM(w.lw) AS s
           FROM fb f JOIN wt w USING (b)
           WHERE f.source NOT IN {_DSIR_TGT} GROUP BY f.doc_id),
    sel AS (
        SELECT c.doc_id, c.source,
               CAST(COALESCE(sc.n_feats, 0) AS BIGINT) AS n_feats,
               COALESCE(sc.s, CAST(0 AS DECIMAL(18,6))) AS s
        FROM (SELECT doc_id, source FROM documents
              WHERE source NOT IN {_DSIR_TGT}) c
        LEFT JOIN sc ON sc.doc_id = c.doc_id
        ORDER BY s DESC, c.doc_id LIMIT {_DSIR_TOPK})
    SELECT doc_id, source, n_feats,
           ROUND(CAST(s AS DOUBLE), 6) AS dsir_logweight
    FROM sel ORDER BY doc_id
    """,
    desc="DSIR data selection (Xie et al. 2023 'Data Selection for "
    "Language Models via Importance Resampling'), deterministic top-K "
    "variant: unigram+bigram features hash (seeded md5) into 256 "
    "buckets, target (src1-3) vs raw bucket counts give add-1-smoothed "
    "log importance ratios — four ROUND(LN,6) decimal terms per bucket, "
    "every LN arg integral — each candidate doc sums the ratio over its "
    "feature OCCURRENCES (exact decimal sum), and the 100 most "
    "target-like docs are kept (ties by doc_id; the paper's Gumbel "
    "resampling replaced by exact top-K so both engines select the "
    "identical set); companion to sample_domain_reweight_int — DoReMi "
    "reweights domains, DSIR selects examples",
)
def sample_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: bucket counts collapse map-side to <=256 rows per mapper
    (two shuffles of 256 rows); the 256-row weight table rides a
    broadcast into the scoring join, so the corpus shuffles once on
    doc_id for the per-doc sum; top-K is TakeOrdered (no global sort
    shuffle, no window). At 100 TB nothing but (doc_id, bucket) pairs
    ever moves."""
    from gearpump_spark.operators.hashing import seeded_hash15

    tgt = ["src1", "src2", "src3"]
    docs = table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        F.transform(TX.tokens(F.col("text")), lambda w: F.lower(w)).alias("tk"),
    )
    uni = base.select("doc_id", "source", F.explode("tk").alias("g"))
    big = base.where(F.size("tk") >= 2).select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 1),"
                " i -> concat(element_at(tk, CAST(i AS INT)), ' ',"
                " element_at(tk, CAST(i + 1 AS INT))))"
            )
        ).alias("g"),
    )
    # The hashed feature relation feeds FIVE legs (tc, rc, tt, rt and the
    # scoring sum) and each leg otherwise re-runs tokenize + both explodes
    # + union + hash over the corpus. Lazy localCheckpoint (the r11
    # shared-relation discipline): features materialize once, all five
    # legs read the blocks.
    fb = (
        uni.unionByName(big)
        .select(
            "doc_id",
            "source",
            (seeded_hash15(F.col("g"), _DSIR_SEED) % _DSIR_BUCKETS).alias("b"),
        )
        .localCheckpoint(eager=False)
    )
    is_tgt = F.col("source").isin(*tgt)
    tc = fb.where(is_tgt).groupBy("b").agg(F.count("*").alias("ct"))
    rc = fb.where(~is_tgt).groupBy("b").agg(F.count("*").alias("cr"))
    tt = fb.where(is_tgt).agg(F.count("*").alias("nt"))
    rt = fb.where(~is_tgt).agg(F.count("*").alias("nr"))

    def rln(c):
        return F.round(F.log(c.cast("double")), 6).cast("decimal(18,6)")

    wt = (
        spark.range(_DSIR_BUCKETS)
        .select(F.col("id").alias("b"))
        .join(tc, "b", "left")
        .join(rc, "b", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .select(
            "b",
            (
                rln(F.coalesce(F.col("ct"), F.lit(0)) + 1)
                - rln(F.col("nt") + _DSIR_BUCKETS)
                - rln(F.coalesce(F.col("cr"), F.lit(0)) + 1)
                + rln(F.col("nr") + _DSIR_BUCKETS)
            ).alias("lw"),
        )
    )
    sc = (
        fb.where(~is_tgt)
        .join(F.broadcast(wt), "b")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_feats"), F.sum("lw").alias("s"))
    )
    sel = (
        docs.where(~is_tgt)
        .select("doc_id", "source")
        .join(sc, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("bigint").alias("n_feats"),
            F.coalesce(F.col("s"), F.lit(0).cast("decimal(18,6)")).alias("s"),
        )
        .orderBy(F.col("s").desc(), "doc_id")
        .limit(_DSIR_TOPK)
    )
    return sel.select(
        "doc_id",
        "source",
        "n_feats",
        F.round(F.col("s").cast("double"), 6).alias("dsir_logweight"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Composed multimodal curation pipeline (the media analog of
# pipeline_quality_dedup_pack)
# ---------------------------------------------------------------------------


@register(
    "pipeline_media_dedup_shard",
    oracle=_ahash_hashes_cte()
    + f""",
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.ahash, b.ahash)) <= 3),
    surv AS (
        SELECT h.doc_id, h.ahash FROM hashes h
        WHERE h.doc_id NOT IN (SELECT id_b FROM pairs))
    SELECT doc_id, CAST(ahash AS BIGINT) AS ahash,
           {_SQL_H15.format(seed="'5'", key="doc_id")} % 8 AS shard
    FROM surv ORDER BY doc_id
    """,
    desc="composed MEDIA curation pipeline, every stage a shipped "
    "operator: synthesize real image payloads (LCG noise-pair fixture) "
    "-> decode + integer average-hash in one narrow Arrow map -> "
    "banded-Hamming near-dup pairs (4x16-bit bands, pigeonhole-exact "
    "recall to 3 bits, never all-pairs) -> greedy keeper dedup (drop "
    "any image with a near-dup partner of smaller id — each odd "
    "brightness-shifted twin dies to its even original) -> seeded-md5 "
    "sharding of the survivors for downstream parallel feature "
    "extraction; the media analog of pipeline_quality_dedup_pack, "
    "oracle-exact end-to-end because every pixel is reconstructed "
    "closed-form via the shared LCG jump-table CTE",
)
def pipeline_media_dedup_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: payload bytes live only inside the Arrow decode map — the
    shuffle carries (doc_id, 8-byte hash); pairing is the banded
    equi-join, dedup one anti-join on the pair list, sharding a pure
    row-local hash. At 100 TB of images nothing but fingerprints ever
    moves between executors."""
    from gearpump_spark.operators.hashing import seeded_hash15
    from gearpump_spark.operators.multimodal import (
        ahash_fingerprints,
        phash_candidate_pairs,
        synthesize_noise_pair_payloads,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )
    fps = ahash_fingerprints(synthesize_noise_pair_payloads(docs))
    pairs = phash_candidate_pairs(fps, max_hamming=3, hash_col="ahash")
    surv = fps.join(
        pairs.select(F.col("id_b").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    return surv.select(
        "doc_id",
        F.col("ahash").cast("bigint").alias("ahash"),
        (seeded_hash15(F.col("doc_id"), 5) % 8).alias("shard"),
    ).orderBy("doc_id")
