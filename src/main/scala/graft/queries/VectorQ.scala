package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextAnalysis
import graft.functions.TextAnalysis.{MinhashA, MinhashB, P}
import graft.operators.Similarity

/** Embedding similarity queries over `embeddings` (64-d float vectors):
  * brute-force cosine top-k (the exact baseline), a k-NN join for a query
  * set, random-hyperplane LSH ANN (the scale path), and per-label centroids.
  *
  * The oracle twins rebuild the identical index-ordered sequential folds
  * with `list_reduce`, from the same hyperplane constants, so even the LSH
  * bucketing is oracle-checked.
  */
object VectorQ {

  /** DuckDB twin of [[Similarity.dotD]]: sequential index-ordered fold. */
  private def sqlDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
    s"list_transform(range(1, len($a) + 1), " +
    s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x, y) -> x + y)"

  /** DuckDB twin of the whole-vector squared-L2 fold ([[graft.functions
    * .NearestResidual]] with the zero level-1 centroid: `(v_i − 0) − c_i`
    * is bitwise `v_i − c_i`, so the plain difference replays it). */
  private def sqlL2(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
    s"list_transform(range(1, len($a) + 1), " +
    s"i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))" +
    s" * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)))), (x, y) -> x + y)"

  /** DuckDB twin of [[Similarity.hyperplaneDot]]. */
  private def sqlHpDot(j: Int, v: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
    s"list_transform(range(1, len($v) + 1), " +
    s"i -> (CAST((${MinhashA(j)} * i + ${MinhashB(j)}) % $P AS DOUBLE) / 2147483647.0 - 0.5)" +
    s" * CAST($v[i] AS DOUBLE))), (x, y) -> x + y)"

  private def sqlBucket(v: String): String =
    (0 until 8).map(j =>
      s"CASE WHEN ${sqlHpDot(j, v)} > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")

  /** q30: brute-force cosine top-10 around vec_id 0 — scan + rerank, no
    * corpus shuffle (TakeOrderedAndProject). */
  val q30 = Q(
    "q30_knn_brute",
    s"""WITH n AS (SELECT vec_id, embedding,
       |                  sqrt(${sqlDot("embedding", "embedding")}) AS nrm
       |           FROM embeddings),
       |q AS (SELECT embedding AS qv, nrm AS qn FROM n WHERE vec_id = 0)
       |SELECT vec_id, ROUND(${sqlDot("embedding", "qv")} / (nrm * qn), 6) AS cos_r
       |FROM n, q
       |WHERE vec_id <> 0
       |ORDER BY cos_r DESC, vec_id
       |LIMIT 10""".stripMargin) { (s, dir) =>
    Similarity.cosineTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
      queryId = 0L, k = 10)
  }

  /** q31: k-NN join — every 100th vector as a query, top-3 neighbors each
    * (broadcast query set × corpus + one window shuffle on qid). */
  val q31 = Q(
    "q31_knn_join",
    s"""WITH n AS (SELECT vec_id, embedding,
       |                  sqrt(${sqlDot("embedding", "embedding")}) AS nrm
       |           FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding AS qv, nrm AS qn
       |      FROM n WHERE vec_id % 100 = 0),
       |sc AS (SELECT qid, vec_id,
       |              ROUND(${sqlDot("embedding", "qv")} / (nrm * qn), 6) AS cos_r
       |       FROM n, q WHERE vec_id <> qid),
       |r AS (SELECT qid, vec_id, cos_r,
       |             CAST(ROW_NUMBER() OVER (
       |               PARTITION BY qid ORDER BY cos_r DESC, vec_id) AS BIGINT) AS rank
       |      FROM sc)
       |SELECT qid, rank, vec_id, cos_r FROM r
       |WHERE rank <= 3
       |ORDER BY qid, rank""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    Similarity.knnJoin(emb, emb.filter(col("vec_id") % 100 === 0),
      "vec_id", "embedding", k = 3)
      .select("qid", "rank", "vec_id", "cos_r")
      .orderBy("qid", "rank")
  }

  /** q32: random-hyperplane LSH ANN — 8-bit bucket signature, candidates
    * share the query's bucket, exact rerank on candidates only. */
  val q32 = Q(
    "q32_ann_lsh",
    s"""WITH n AS (SELECT vec_id, embedding,
       |                  sqrt(${sqlDot("embedding", "embedding")}) AS nrm
       |           FROM embeddings),
       |b AS (SELECT vec_id, embedding, nrm,
       |             ${sqlBucket("embedding")} AS bucket
       |      FROM n),
       |q AS (SELECT embedding AS qv, nrm AS qn, bucket AS qb
       |      FROM b WHERE vec_id = 0)
       |SELECT vec_id, bucket,
       |       ROUND(${sqlDot("embedding", "qv")} / (nrm * qn), 6) AS cos_r
       |FROM b, q
       |WHERE vec_id <> 0 AND bucket = qb
       |ORDER BY cos_r DESC, vec_id
       |LIMIT 5""".stripMargin) { (s, dir) =>
    Similarity.annTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
      queryId = 0L, k = 5)
  }

  /** q86: MULTI-PROBE LSH ANN ([[Similarity.annTopKMultiProbe]]) — the
    * recall repair for q32's single bucket (the [[graft.operators
    * .AnnRecall]] audit measures single-probe near zero recall@10 at
    * fixture angles): candidates live in any bucket within Hamming 1 of
    * the query's, exact rerank on candidates. The Spark side enumerates
    * the 9 probe buckets driver-side (partition-prunable `isin`); the
    * oracle states the same set as `bit_count(xor(bucket, qb)) <= 1` —
    * provably identical memberships, different plan shapes on purpose. */
  val q86 = Q(
    "q86_ann_lsh_multiprobe",
    s"""WITH n AS (SELECT vec_id, embedding,
       |                  sqrt(${sqlDot("embedding", "embedding")}) AS nrm
       |           FROM embeddings),
       |b AS (SELECT vec_id, embedding, nrm,
       |             ${sqlBucket("embedding")} AS bucket
       |      FROM n),
       |q AS (SELECT embedding AS qv, nrm AS qn, bucket AS qb
       |      FROM b WHERE vec_id = 0)
       |SELECT vec_id, bucket,
       |       ROUND(${sqlDot("embedding", "qv")} / (nrm * qn), 6) AS cos_r
       |FROM b, q
       |WHERE vec_id <> 0 AND bit_count(xor(bucket, qb)) <= 1
       |ORDER BY cos_r DESC, vec_id
       |LIMIT 5""".stripMargin) { (s, dir) =>
    Similarity.annTopKMultiProbe(Tables.embeddings(s, dir), "vec_id",
      "embedding", queryId = 0L, k = 5, radius = 1)
  }

  /** q33: per-label centroids, long form (label, pos, centroid) — posexplode
    * + grouped average; rounding absorbs the engines' differing partial-sum
    * orders. */
  val q33 = Q(
    "q33_label_centroids",
    """SELECT label, i AS pos,
      |       ROUND(SUM(CAST(embedding[i] AS DOUBLE)) / COUNT(*), 6) AS centroid
      |FROM embeddings, UNNEST(range(1, len(embedding) + 1)) t(i)
      |GROUP BY label, i
      |ORDER BY label, pos""".stripMargin) { (s, dir) =>
    Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), (col("pos") + 1).cast("long").as("pos"))
      .agg(round(sum(col("v").cast("double")) / count(lit(1)), 6).as("centroid"))
      .orderBy("label", "pos")
  }

  /** q35: embedding-cosine near-duplicate pairs — label-blocked all-pairs
    * cosine above a threshold (the vector analog of q22; the LSH-bucketed
    * variant q32 is the scale path for candidate generation). Threshold
    * compare uses the rounded score both sides. */
  val q35 = Q(
    "q35_embedding_neardup",
    s"""WITH n AS (SELECT vec_id, label, embedding,
       |                  sqrt(${sqlDot("embedding", "embedding")}) AS nrm
       |           FROM embeddings),
       |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |             ROUND(${sqlDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cos_r
       |      FROM n a JOIN n b
       |        ON a.label = b.label AND a.vec_id < b.vec_id)
       |SELECT id_a, id_b, cos_r FROM p
       |WHERE cos_r >= 0.4
       |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    val base = Similarity.withNorm(Tables.embeddings(s, dir), "embedding")
      .select(col("vec_id"), col("label"), col("vecd"), col("norm"))
    val a = base.as("a")
    val b = base.as("b")
    a.join(b, col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(Similarity.cosine(col("a.vecd"), col("b.vecd"),
          col("a.norm"), col("b.norm")), 6).as("cos_r"))
      .filter(col("cos_r") >= 0.4)
      .orderBy("id_a", "id_b")
  }

  /** q40: IVF-style ANN — deterministic subsample centroids (vec_id % 50),
    * nearest-centroid cell assignment (cosine argmax, cent_id tie-break),
    * probe the query's 3 nearest cells, exact rerank on probed cells only.
    * The oracle re-derives the ENTIRE pipeline — assignment, probing,
    * rerank — with the same index-ordered folds, so even the approximate
    * path is hash-checked (IvfSpec additionally pins recall against the
    * brute-force ranking). */
  val q40 = Q(
    "q40_ann_ivf",
    s"""WITH n AS (SELECT vec_id, embedding,
       |                  sqrt(${sqlDot("embedding", "embedding")}) AS nrm
       |           FROM embeddings),
       |cents AS (SELECT vec_id AS cent_id, embedding AS cv, nrm AS cn
       |          FROM n WHERE vec_id % 50 = 0),
       |scored AS (SELECT vec_id, embedding, nrm, cent_id,
       |                  ${sqlDot("embedding", "cv")} / (nrm * cn) AS cent_cos
       |           FROM n, cents),
       |assigned AS (SELECT vec_id, embedding, nrm, cent_id AS cell FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY cent_cos DESC, cent_id) AS rn
       |    FROM scored) WHERE rn = 1),
       |q AS (SELECT embedding AS qv, nrm AS qn FROM n WHERE vec_id = 0),
       |probed AS (SELECT cent_id AS cell
       |           FROM cents, q
       |           ORDER BY ${sqlDot("cv", "qv")} / (cn * qn) DESC, cent_id
       |           LIMIT 3)
       |SELECT vec_id, cell,
       |       ROUND(${sqlDot("embedding", "qv")} / (nrm * qn), 6) AS cos_r
       |FROM assigned JOIN probed USING (cell), q
       |WHERE vec_id <> 0
       |ORDER BY cos_r DESC, vec_id
       |LIMIT 10""".stripMargin) { (s, dir) =>
    Similarity.ivfTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
      queryId = 0L, k = 10, centroidEvery = 50, nprobe = 3)
  }

  /** q87: one DISTRIBUTED k-means (Lloyd) update step ([[graft.operators
    * .Quantize.kmeansStep]]) — the oracle-visible tier of the trained-
    * codebook path: stride centroids, squared-L2 nearest assignment
    * (lowest-id ties, [[graft.operators.Quantize.lloyd]]'s exact distance
    * + tie discipline), per-cell coordinate means. The oracle re-derives
    * the assignment with the same index-ordered fold and ROW_NUMBER tie
    * rule, and the means with q33's ROUND(SUM/COUNT) convention. The
    * Spark plan is the one a 100 TB k-means round needs: in-scan codegen'd
    * assignment against the broadcast codebook, ONE partial-aggregated
    * (cell, pos) exchange. */
  val q87 = Q(
    "q87_kmeans_step",
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cv
       |               FROM embeddings WHERE vec_id % 50 = 0),
       |d AS (SELECT n.vec_id, cents.cent_id,
       |             ${sqlL2("n.embedding", "cents.cv")} AS dist
       |      FROM embeddings n, cents),
       |a AS (SELECT vec_id, cell FROM (
       |        SELECT vec_id, cent_id AS cell, ROW_NUMBER() OVER (
       |          PARTITION BY vec_id ORDER BY dist ASC, cent_id ASC) AS rn
       |        FROM d) WHERE rn = 1)
       |SELECT a.cell AS cent_id, CAST(t.i AS BIGINT) AS pos,
       |       CAST(COUNT(*) AS BIGINT) AS n_assigned,
       |       ROUND(SUM(CAST(n.embedding[t.i] AS DOUBLE)) / COUNT(*), 6) AS centroid_r
       |FROM a JOIN embeddings n USING (vec_id),
       |     UNNEST(range(1, len(n.embedding) + 1)) t(i)
       |GROUP BY a.cell, t.i
       |ORDER BY cent_id, pos""".stripMargin) { (s, dir) =>
    graft.operators.Quantize.kmeansStep(Tables.embeddings(s, dir),
      "vec_id", "embedding", every = 50)
  }

  /** q51: per-label top-3 vectors by L2 norm through the typed [[graft
    * .operators.TopKAgg]] Aggregator — the custom-UDAF tier under the
    * oracle gate. The aggregator ships ≤ k rows per group per partition
    * (map-side partial agg, no global sort); the oracle re-ranks with a
    * window, proving the bounded-buffer path returns exactly the window's
    * answer. Norms fold index-ordered, so scores agree bitwise. */
  val q51 = Q(
    "q51_topk_agg",
    s"""WITH n AS (SELECT label, vec_id,
       |                  sqrt(${sqlDot("embedding", "embedding")}) AS nrm
       |           FROM embeddings),
       |r AS (SELECT label, vec_id, nrm,
       |             ROW_NUMBER() OVER (
       |               PARTITION BY label ORDER BY nrm DESC, vec_id) AS rank
       |      FROM n)
       |SELECT CAST(label AS BIGINT) AS label, CAST(rank AS BIGINT) AS rank,
       |       vec_id, ROUND(nrm, 6) AS norm_r
       |FROM r WHERE rank <= 3
       |ORDER BY label, rank""".stripMargin) { (s, dir) =>
    import s.implicits._
    val base = Similarity.withNorm(Tables.embeddings(s, dir), "embedding")
      .select(col("label").cast("long").as("label"), col("vec_id"), col("norm"))
      .as[(Long, Long, Double)]
    val agg = graft.operators.TopKAgg.topK[(Long, Long, Double)](3) {
      case (_, id, nrm) => (nrm, id)
    }
    base.groupByKey(_._1).agg(agg.toColumn.name("top"))
      .flatMap { case (label, entries) =>
        entries.zipWithIndex.map { case ((nrm, id), i) =>
          (label, (i + 1).toLong, id, nrm)
        }
      }
      .toDF("label", "rank", "vec_id", "norm")
      .select(col("label"), col("rank"), col("vec_id"),
        round(col("norm"), 6).as("norm_r"))
      .orderBy("label", "rank")
  }

  /** q57: int8 embedding quantization audit ([[graft.operators.Quantize]])
    * — per-vector scale plus max/mean reconstruction error, the
    * storage-shrink step of a vector-store pipeline. Elementwise double
    * arithmetic with explicit half-up floor (engine `round` tie-breaking
    * differs), so the DuckDB twin is bit-identical pre-rounding. */
  val q57 = Q(
    "q57_int8_quantize",
    s"""WITH v AS (SELECT vec_id,
       |                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
       |           FROM embeddings WHERE vec_id < 200),
       |s AS (SELECT vec_id, vd,
       |             list_aggregate(list_transform(vd, x -> abs(x)), 'max') AS scale
       |      FROM v),
       |e AS (SELECT vec_id, scale,
       |             CASE WHEN scale = 0
       |                  THEN list_transform(vd, x -> abs(x))
       |                  ELSE list_transform(vd, x ->
       |                    abs(x - FLOOR(x * 127 / scale + 0.5) * scale / 127))
       |             END AS errs
       |      FROM s)
       |SELECT vec_id, ROUND(scale, 6) AS scale_r,
       |       ROUND(list_aggregate(errs, 'max'), 6) AS max_err_r,
       |       ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), errs),
       |                         (a, b) -> a + b) / len(errs), 6) AS mean_err_r
       |FROM e
       |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    graft.operators.Quantize
      .int8Audit(Tables.embeddings(s, dir).filter(col("vec_id") < 200),
        "vec_id", "embedding")
      .select(col("vec_id"), round(col("scale"), 6).as("scale_r"),
        round(col("max_err"), 6).as("max_err_r"),
        round(col("mean_err"), 6).as("mean_err_r"))
      .orderBy("vec_id")
  }

  /** q61: SemDeDup — cluster-confined semantic deduplication
    * ([[Similarity.semDedup]]): nearest-centroid cells (same deterministic
    * vec_id % 50 quantizer as q40), then within each cell every vector
    * with a lower-id neighbor at rounded cosine ≥ 0.4 is dropped,
    * reporting which keeper it duplicates. The oracle re-derives
    * assignment, within-cell pairs, and the keep-lowest-id policy. */
  val q61 = Q(
    "q61_semdedup",
    s"""WITH n AS (SELECT vec_id, embedding,
       |                  sqrt(${sqlDot("embedding", "embedding")}) AS nrm
       |           FROM embeddings),
       |cents AS (SELECT vec_id AS cent_id, embedding AS cv, nrm AS cn
       |          FROM n WHERE vec_id % 50 = 0),
       |scored AS (SELECT vec_id, embedding, nrm, cent_id,
       |                  ${sqlDot("embedding", "cv")} / (nrm * cn) AS cent_cos
       |           FROM n, cents),
       |assigned AS (SELECT vec_id, embedding, nrm, cent_id AS cell FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY cent_cos DESC, cent_id) AS rn
       |    FROM scored) WHERE rn = 1),
       |p AS (SELECT a.cell, a.vec_id AS id_a, b.vec_id AS id_b,
       |             ROUND(${sqlDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cos_r
       |      FROM assigned a JOIN assigned b
       |        ON a.cell = b.cell AND a.vec_id < b.vec_id)
       |SELECT id_b AS vec_id, cell, MIN(id_a) AS dup_of,
       |       CAST(COUNT(*) AS BIGINT) AS n_dups, MAX(cos_r) AS top_cos_r
       |FROM p WHERE cos_r >= 0.4
       |GROUP BY 1, 2
       |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    Similarity.semDedup(Tables.embeddings(s, dir), "vec_id", "embedding",
      minCos = 0.4, centroidEvery = 50)
      .orderBy("vec_id")
  }

  /** q67: the semantically deduplicated corpus ([[Similarity
    * .semDedupKeep]]) — q61's drop set applied as a left-anti join; the
    * oracle re-derives assignment, pairs, and the NOT IN. */
  val q67 = Q(
    "q67_semdedup_keep",
    s"""WITH n AS (SELECT vec_id, label, embedding,
       |                  sqrt(${sqlDot("embedding", "embedding")}) AS nrm
       |           FROM embeddings),
       |cents AS (SELECT vec_id AS cent_id, embedding AS cv, nrm AS cn
       |          FROM n WHERE vec_id % 50 = 0),
       |scored AS (SELECT vec_id, embedding, nrm, cent_id,
       |                  ${sqlDot("embedding", "cv")} / (nrm * cn) AS cent_cos
       |           FROM n, cents),
       |assigned AS (SELECT vec_id, embedding, nrm, cent_id AS cell FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY cent_cos DESC, cent_id) AS rn
       |    FROM scored) WHERE rn = 1),
       |dropped AS (SELECT DISTINCT b.vec_id
       |            FROM assigned a JOIN assigned b
       |              ON a.cell = b.cell AND a.vec_id < b.vec_id
       |            WHERE ROUND(${sqlDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) >= 0.4)
       |SELECT e.vec_id, CAST(e.label AS BIGINT) AS label
       |FROM embeddings e
       |WHERE e.vec_id NOT IN (SELECT vec_id FROM dropped)
       |ORDER BY e.vec_id""".stripMargin) { (s, dir) =>
    Similarity.semDedupKeep(Tables.embeddings(s, dir), "vec_id", "embedding",
      minCos = 0.4, centroidEvery = 50)
      .select(col("vec_id"), col("label").cast("long").as("label"))
      .orderBy("vec_id")
  }

  /** Shared CTE prefix re-deriving the TWO-LEVEL quantizer in SQL: the
    * level-1 assignment (cosine argmax, q40's pattern), the shared
    * residual codebook (the `every2`-stride subsample's residuals against
    * their OWN level-1 centroids), and the level-2 assignment (squared-L2
    * argmin over the codebook, lowest cent2_id tie-break) — every fold
    * index-ordered, so both [[graft.functions.NearestCentroid]] and
    * [[graft.functions.NearestResidual]] are replayed bitwise. */
  private def twoLevelCte(every1: Int, every2: Int): String = {
    // squared-L2 between row x's residual (vs centroid cv) and codebook
    // entry rv, as one sequential fold
    def sqlResDist(emb: String, cv: String, rv: String): String =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, len($emb) + 1), " +
      s"i -> ((CAST($emb[i] AS DOUBLE) - CAST($cv[i] AS DOUBLE)) - $rv[i])" +
      s" * ((CAST($emb[i] AS DOUBLE) - CAST($cv[i] AS DOUBLE)) - $rv[i]))), " +
      s"(x, y) -> x + y)"
    s"""n AS (SELECT vec_id, embedding,
       |             sqrt(${sqlDot("embedding", "embedding")}) AS nrm
       |      FROM embeddings),
       |c1 AS (SELECT vec_id AS cent_id, embedding AS cv, nrm AS cn
       |       FROM n WHERE vec_id % $every1 = 0),
       |s1 AS (SELECT n.vec_id, n.embedding, n.nrm, c1.cent_id,
       |              ${sqlDot("n.embedding", "c1.cv")} / (n.nrm * c1.cn) AS cent_cos
       |       FROM n, c1),
       |a1 AS (SELECT vec_id, embedding, nrm, cent_id AS cell1 FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY cent_cos DESC, cent_id) AS rn
       |    FROM s1) WHERE rn = 1),
       |c2 AS (SELECT a.vec_id AS cent2_id,
       |              list_transform(range(1, len(a.embedding) + 1),
       |                i -> CAST(a.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) AS rv
       |       FROM a1 a JOIN c1 c ON c.cent_id = a.cell1
       |       WHERE a.vec_id % $every2 = 0),
       |d2 AS (SELECT a.vec_id, a.cell1, c2.cent2_id,
       |              ${sqlResDist("a.embedding", "c.cv", "c2.rv")} AS dist
       |       FROM a1 a JOIN c1 c ON c.cent_id = a.cell1, c2),
       |a2 AS (SELECT vec_id, cent2_id AS cell2 FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY dist ASC, cent2_id) AS rn
       |    FROM d2) WHERE rn = 1),
       |asg AS (SELECT a1.vec_id, a1.embedding, a1.nrm, a1.cell1, a2.cell2
       |        FROM a1 JOIN a2 USING (vec_id))""".stripMargin
  }

  /** q70: SemDeDup over the TWO-LEVEL quantizer ([[Similarity
    * .semDedupTwoLevel]]) — the paper semantics with the cluster count no
    * longer capped by the per-task codebook budget: the composite
    * (cell1, cell2) vocabulary is |C1|·|C2| from |C1|+|C2| shipped
    * vectors, assignment fully in-scan. The oracle re-derives both
    * codebooks, both assignments, the within-composite-cell pairs, and
    * the keep-lowest-id policy. */
  val q70 = Q(
    "q70_semdedup_2level",
    s"""WITH ${twoLevelCte(50, 37)},
       |p AS (SELECT x.cell1, x.cell2, x.vec_id AS id_a, y.vec_id AS id_b,
       |             ROUND(${sqlDot("x.embedding", "y.embedding")} / (x.nrm * y.nrm), 6) AS cos_r
       |      FROM asg x JOIN asg y
       |        ON x.cell1 = y.cell1 AND x.cell2 = y.cell2 AND x.vec_id < y.vec_id)
       |SELECT id_b AS vec_id, cell1, cell2, MIN(id_a) AS dup_of,
       |       CAST(COUNT(*) AS BIGINT) AS n_dups, MAX(cos_r) AS top_cos_r
       |FROM p WHERE cos_r >= 0.4
       |GROUP BY 1, 2, 3
       |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    Similarity.semDedupTwoLevel(Tables.embeddings(s, dir), "vec_id", "embedding",
      minCos = 0.4, every1 = 50, every2 = 37)
      .orderBy("vec_id")
  }

  /** q71: IVF ANN over the TWO-LEVEL quantizer ([[Similarity
    * .ivfTopKTwoLevel]]) — hierarchical probe (nprobe1 level-1 cells by
    * query cosine, then nprobe2 codebook entries by the query's residual
    * per probed cell), exact rerank on the probed composite cells only.
    * The oracle replays the entire pipeline including the probe. */
  val q71 = Q(
    "q71_ann_ivf_2level",
    s"""WITH ${twoLevelCte(50, 37)},
       |q AS (SELECT embedding AS qv, nrm AS qn FROM n WHERE vec_id = 0),
       |p1 AS (SELECT cent_id, cv FROM c1, q
       |       ORDER BY ${sqlDot("c1.cv", "q.qv")} / (c1.cn * q.qn) DESC, cent_id
       |       LIMIT 3),
       |pp AS (SELECT cell1, cell2 FROM (
       |    SELECT p1.cent_id AS cell1, c2.cent2_id AS cell2,
       |           ROW_NUMBER() OVER (PARTITION BY p1.cent_id ORDER BY
       |             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |               list_transform(range(1, len(q.qv) + 1),
       |                 i -> ((CAST(q.qv[i] AS DOUBLE) - CAST(p1.cv[i] AS DOUBLE)) - c2.rv[i])
       |                    * ((CAST(q.qv[i] AS DOUBLE) - CAST(p1.cv[i] AS DOUBLE)) - c2.rv[i]))),
       |               (x, y) -> x + y) ASC, c2.cent2_id) AS rn
       |    FROM p1, c2, q) WHERE rn <= 2)
       |SELECT vec_id, cell1, cell2,
       |       ROUND(${sqlDot("asg.embedding", "q.qv")} / (asg.nrm * q.qn), 6) AS cos_r
       |FROM asg JOIN pp USING (cell1, cell2), q
       |WHERE vec_id <> 0
       |ORDER BY cos_r DESC, vec_id
       |LIMIT 10""".stripMargin) { (s, dir) =>
    Similarity.ivfTopKTwoLevel(Tables.embeddings(s, dir), "vec_id", "embedding",
      queryId = 0L, k = 10, every1 = 50, every2 = 37,
      nprobe1 = 3, nprobe2 = 2)
  }

  /** DuckDB twin of plane j of the 128-plane family (planes 0-15 are the
    * [[sqlHpDot]] planes; the family extends them — generated from the
    * same [[TextAnalysis.HplaneA]]/[[HplaneB]] constants the codegen'd
    * expression uses, so the dialects cannot drift). */
  private def sqlHplaneDot(j: Int, v: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
    s"list_transform(range(1, len($v) + 1), " +
    s"i -> (CAST((${TextAnalysis.HplaneA(j)} * i + ${TextAnalysis.HplaneB(j)}) % $P AS DOUBLE) / 2147483647.0 - 0.5)" +
    s" * CAST($v[i] AS DOUBLE))), (x, y) -> x + y)"

  /** 64-plane SRP signature over the [[graft.functions.HyperplaneSig
    * .LoOffset]] window (the degenerate hand-picked low planes are
    * excluded — see [[TextAnalysis.HplaneA]]). Bit 63's addend is BIGINT
    * min, spelled `-(2^63-1) - 1` because the bare literal does not
    * parse as BIGINT; term order 0..63 keeps every partial sum in
    * range. */
  private def sqlSig64(v: String): String =
    (0 until 64).map { j =>
      val bit = if (j == 63) "CAST(-9223372036854775807 AS BIGINT) - 1"
                else s"CAST(${1L << j} AS BIGINT)"
      s"CASE WHEN ${sqlHplaneDot(graft.functions.HyperplaneSig.LoOffset + j, v)} > 0" +
        s" THEN $bit ELSE CAST(0 AS BIGINT) END"
    }.mkString(" + ")

  /** q85: banded-signature embedding near-dup pairs
    * ([[Similarity.hyperplaneSigPairs]]) — the corpus-scale upgrade of
    * q35's label-blocked all-pairs: 64-plane SRP signatures in-scan,
    * 4×16-bit band candidates, exact-cosine verify (precision exact,
    * recall the SRP-LSH contract; candidates exact within
    * signature-Hamming 3 by pigeonhole), exercised as a
    * PLANTED-DUPLICATE recovery audit: every seventh vector is
    * re-planted scaled ×1.001 under id+10⁶ — positive scaling preserves
    * every projection's sign (hamming 0, cosine 1), so honest banding
    * must recover exactly the planted pairs, while the fixture's own
    * pairs (max cosine ≈ 0.51, ~66° apart) correctly band-collide
    * almost never (the old degenerate 8-bit tier admitted 17 of them by
    * accident — a candidate-volume symptom, not recall). The oracle
    * re-derives the planted corpus, all 64 plane folds from the same
    * constants, the masked 16-bit banding, and the rounded cosine
    * verify. */
  val q85 = Q(
    "q85_hyperplane_sig_pairs",
    s"""WITH corpus AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
       |  FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(1.001 AS DOUBLE))
       |  FROM embeddings WHERE vec_id % 7 = 0),
       |n AS (SELECT vec_id, embedding,
       |             sqrt(${sqlDot("embedding", "embedding")}) AS nrm
       |      FROM corpus),
       |s AS (SELECT vec_id, embedding, nrm, ${sqlSig64("embedding")} AS hsig
       |      FROM n),
       |grp AS (SELECT hsig, MIN(vec_id) AS rep FROM s GROUP BY hsig),
       |reps AS (SELECT s.vec_id, s.embedding, s.nrm, s.hsig
       |         FROM s JOIN grp ON s.hsig = grp.hsig AND s.vec_id = grp.rep),
       |star AS (SELECT grp.rep AS id_a, s.vec_id AS id_b,
       |                ROUND(${sqlDot("s.embedding", "r.embedding")} / (s.nrm * r.nrm), 6) AS cos_r
       |         FROM s JOIN grp ON s.hsig = grp.hsig AND s.vec_id <> grp.rep
       |         JOIN s r ON r.vec_id = grp.rep),
       |bands AS (SELECT vec_id, embedding, nrm, t.b AS band,
       |                 (hsig >> (16 * t.b)) & 65535 AS bkey
       |          FROM reps, range(0, 4) t(b)),
       |p AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b,
       |             ROUND(${sqlDot("x.embedding", "y.embedding")} / (x.nrm * y.nrm), 6) AS cos_r
       |      FROM bands x JOIN bands y
       |        ON x.band = y.band AND x.bkey = y.bkey AND x.vec_id < y.vec_id
       |      UNION ALL
       |      SELECT id_a, id_b, cos_r FROM star)
       |SELECT id_a, id_b, cos_r FROM p WHERE cos_r >= 0.9
       |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("embedding"))
    val planted = Tables.embeddings(s, dir)
      .filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x.cast("double") * lit(1.001))
          .as("embedding"))
    Similarity.hyperplaneSigPairs(emb.unionAll(planted),
      "vec_id", "embedding", minCos = 0.9)
      .orderBy("id_a", "id_b")
  }

  /** Shared PQ constants for q83/q84/q88: m subspaces over the 64-d
    * vectors, codebook = the `every`-stride subsample (entry index =
    * dense rank by vec_id, the ROW_NUMBER the oracle replays).
    *
    * m = 8 and rerank cand = 200 are the KNEE of the measured
    * recall-vs-cost curve (64-query batch sweep at sf0.1, recall@10 vs
    * brute truth): m=4 read adc 0.12 / rerank200 0.59; m=8 reads adc
    * 0.19 / rerank50 0.50 / RERANK200 0.84 (0.94 with the trained
    * codebook) at 8 codes per 64-d row (32× compression); m=16 buys
    * 0.98 at halved compression. Past cand=200 the curve flattens
    * (rerank1000 ≈ 1.0 at every m) — that is candidate-volume spend,
    * not codebook quality. The full knob table lives in SCALE.md. */
  private val PqM = 8
  private val PqEvery = 25
  private val PqRerankCand = 200

  /** DuckDB twin of one subspace's squared-L2 fold (subspace j is the
    * SQL-side variable `j`, 0-based; lists are 1-based so coordinate i of
    * subspace j is element j*subDim + i). */
  private def sqlPqDist(v: String, cv: String, subDim: Int,
                        jvar: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
    s"list_transform(range(1, $subDim + 1), " +
    s"i -> (CAST($v[$jvar * $subDim + i] AS DOUBLE) - CAST($cv[$jvar * $subDim + i] AS DOUBLE))" +
    s" * (CAST($v[$jvar * $subDim + i] AS DOUBLE) - CAST($cv[$jvar * $subDim + i] AS DOUBLE)))), " +
    s"(x, y) -> x + y)"

  private def pqCte(subDim: Int): String =
    s"""cb AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS e,
       |              embedding AS cv
       |       FROM embeddings WHERE vec_id % $PqEvery = 0),
       |d AS (SELECT n.vec_id, t.j AS sub, cb.e,
       |             ${sqlPqDist("n.embedding", "cb.cv", subDim, "t.j")} AS dist
       |      FROM embeddings n, range(0, $PqM) t(j), cb),
       |a AS (SELECT vec_id, sub, e AS code FROM (
       |        SELECT *, ROW_NUMBER() OVER (
       |          PARTITION BY vec_id, sub ORDER BY dist ASC, e ASC) AS rn
       |        FROM d) WHERE rn = 1)""".stripMargin

  /** q83: product-quantization encoding ([[graft.operators.Quantize
    * .pqEncode]]) — every 64-d vector compresses to m = 4 subspace codes
    * against the stride-subsample codebook (the deterministic stand-in
    * for k-means, like every centroid table in this module). The oracle
    * re-derives the codebook (dense rank by vec_id), every per-subspace
    * squared-L2 fold, and the lowest-index tie rule. Output exploded to
    * (vec_id, sub, code) scalar rows for hash comparison. */
  val q83 = Q(
    "q83_pq_encode",
    s"""WITH ${pqCte(64 / PqM)}
       |SELECT vec_id, CAST(sub AS BIGINT) AS sub, CAST(code AS BIGINT) AS code
       |FROM a ORDER BY vec_id, sub""".stripMargin) { (s, dir) =>
    // posexplode_outer + null filter (the q139 discipline): the inferred
    // generate filter would re-expand the m-subspace encoder 3x per row;
    // a valid vector's codes array is never empty, so the row set is
    // identical
    graft.operators.Quantize.pqEncode(Tables.embeddings(s, dir),
      "vec_id", "embedding", m = PqM, every = PqEvery)
      .select(col("vec_id"),
        posexplode_outer(col("codes")).as(Seq("sub", "code")))
      .filter(col("sub").isNotNull)
      .select(col("vec_id"), col("sub").cast("long").as("sub"), col("code"))
      .orderBy("vec_id", "sub")
  }

  /** q84: asymmetric-distance (ADC) top-k over the PQ codes
    * ([[graft.operators.Quantize.pqAdcTopK]]) — the query's exact
    * per-(subspace, entry) distance table, then every row scores as the
    * left-assoc sum of m table lookups (never a per-row float
    * recomputation — the PQ scan economics). The oracle builds the same
    * table in SQL and sums the same m terms in the same textual order,
    * so the approximate ranking hash-matches bit-for-bit. */
  val q84 = Q(
    "q84_pq_adc_topk",
    s"""WITH ${pqCte(64 / PqM)},
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |tab AS (SELECT cb.e, t.j AS sub,
       |               ${sqlPqDist("q.qv", "cb.cv", 64 / PqM, "t.j")} AS d
       |        FROM q, range(0, $PqM) t(j), cb),
       |codes AS (SELECT vec_id,
       |                 ${(0 until PqM).map(j =>
                            s"MAX(CASE WHEN sub = $j THEN code END) AS c$j")
                            .mkString(", ")}
       |          FROM a GROUP BY vec_id),
       |scored AS (SELECT codes.vec_id,
       |                  ${(0 until PqM).map(j =>
                             s"(SELECT d FROM tab WHERE sub = $j AND e = c$j)")
                             .mkString(" + ")} AS adc_dist
       |           FROM codes WHERE vec_id <> 0)
       |SELECT vec_id, ROUND(adc_dist, 6) AS adc_dist
       |FROM scored ORDER BY scored.adc_dist ASC, vec_id ASC LIMIT 10""".stripMargin) { (s, dir) =>
    graft.operators.Quantize.pqAdcTopK(Tables.embeddings(s, dir),
      "vec_id", "embedding", queryId = 0L, kNN = 10, m = PqM, every = PqEvery)
  }

  /** q88: ADC + EXACT-RERANK top-k ([[graft.operators.Quantize
    * .pqAdcRerankTopK]]) — the "refine" stage of IVFADC-style search:
    * the m-lookup ADC ranking keeps the `PqRerankCand` (200, the
    * measured knee — see [[PqM]]) nearest candidate ids, then ONLY
    * those candidates' full vectors are fetched (broadcast id semi-join
    * — at 100 TB, 200 point lookups) and re-ranked by exact cosine. The
    * oracle replays both stages: the unrounded ADC cut with q84's tie
    * rule, then q35's exact-cosine convention on the survivors. Recall
    * vs the brute oracle is measured by the `ann_recall` bench sidecar
    * (`pq_adc_rerank`). */
  val q88 = Q(
    "q88_pq_adc_rerank",
    s"""WITH ${pqCte(64 / PqM)},
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |tab AS (SELECT cb.e, t.j AS sub,
       |               ${sqlPqDist("q.qv", "cb.cv", 64 / PqM, "t.j")} AS d
       |        FROM q, range(0, $PqM) t(j), cb),
       |codes AS (SELECT vec_id,
       |                 ${(0 until PqM).map(j =>
                            s"MAX(CASE WHEN sub = $j THEN code END) AS c$j")
                            .mkString(", ")}
       |          FROM a GROUP BY vec_id),
       |scored AS (SELECT codes.vec_id,
       |                  ${(0 until PqM).map(j =>
                             s"(SELECT d FROM tab WHERE sub = $j AND e = c$j)")
                             .mkString(" + ")} AS adc_dist
       |           FROM codes WHERE vec_id <> 0),
       |cand AS (SELECT vec_id FROM scored
       |         ORDER BY scored.adc_dist ASC, vec_id ASC LIMIT $PqRerankCand),
       |n AS (SELECT vec_id, embedding,
       |             sqrt(${sqlDot("embedding", "embedding")}) AS nrm
       |      FROM embeddings),
       |qq AS (SELECT embedding AS qv2, sqrt(${sqlDot("embedding", "embedding")}) AS qn
       |       FROM embeddings WHERE vec_id = 0)
       |SELECT n.vec_id,
       |       ROUND(${sqlDot("n.embedding", "qq.qv2")} / (n.nrm * qq.qn), 6) AS cos_r
       |FROM cand JOIN n USING (vec_id), qq
       |ORDER BY cos_r DESC, n.vec_id ASC LIMIT 10""".stripMargin) { (s, dir) =>
    graft.operators.Quantize.pqAdcRerankTopK(Tables.embeddings(s, dir),
      "vec_id", "embedding", queryId = 0L, kNN = 10, cand = PqRerankCand,
      m = PqM, every = PqEvery)
  }

  /** Per-iteration CTE blocks of the EXACT distributed k-means replay
    * (q97): iteration i assigns every vector to its nearest c{i}
    * centroid (q87's squared-L2 fold + lowest-id tie), then c{i+1} is
    * the per-(cell, pos) mean computed as an id-ORDERED sequential fold
    * — `list_reduce(list_prepend(0.0, list(x ORDER BY vec_id)))`, the
    * bitwise mirror of the Spark side's sorted-collect fold — with
    * keep-previous for empty cells (per-pos COALESCE; an assigned cell
    * has every pos, an unassigned one has none). Unrolled textually
    * (iters is a fixed constant), so no recursive-CTE aggregation is
    * needed and every intermediate centroid stays in cross-engine
    * lockstep UNROUNDED. */
  private def sqlKmeansIters(every: Int, iters: Int): String =
    sqlKmeansItersOn("embeddings", "embedding", "", every, iters)

  /** The same unrolled exact-replay training over ANY (vec_id, `vcol`)
    * source CTE, with every derived CTE name prefixed `p` — the
    * generalization that lets q102 train the RESIDUAL book (source =
    * the residual table, prefix `r`) with the identical id-ordered
    * arithmetic. `${p}c$iters` is the trained codebook. The codebook
    * CTEs are `AS MATERIALIZED`: DuckDB inlines plain CTEs per
    * REFERENCE, and each round references the previous codebook twice,
    * so an unrolled chain re-expands exponentially in `iters` (at 6
    * rounds the inlined plan exhausted a 20k fd limit re-opening the
    * source parquet); materialization makes the replay linear, exactly
    * one evaluation per round — semantics unchanged. */
  private def sqlKmeansItersOn(src: String, vcol: String, p: String,
                               every: Int, iters: Int): String = {
    val blocks = (0 until iters).map { i =>
      s"""${p}d$i AS (SELECT e.vec_id, c.cent_id,
         |             ${sqlL2(s"e.$vcol", "c.cv")} AS dist
         |      FROM $src e, ${p}c$i c),
         |${p}a$i AS (SELECT vec_id, cell FROM (
         |        SELECT vec_id, cent_id AS cell, ROW_NUMBER() OVER (
         |          PARTITION BY vec_id ORDER BY dist ASC, cent_id ASC) AS rn
         |        FROM ${p}d$i) WHERE rn = 1),
         |${p}m$i AS (SELECT cell, pos,
         |             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |               list(x ORDER BY vec_id)), (p, q) -> p + q)
         |               / COUNT(*) AS v
         |      FROM (SELECT a.vec_id, a.cell, t.i AS pos,
         |                   CAST(e.$vcol[t.i] AS DOUBLE) AS x
         |            FROM ${p}a$i a JOIN $src e USING (vec_id),
         |                 UNNEST(range(1, len(e.$vcol) + 1)) t(i)) ${p}s$i
         |      GROUP BY cell, pos),
         |${p}c${i + 1} AS MATERIALIZED (SELECT g.cent_id,
         |             list(COALESCE(m.v, g.x0) ORDER BY g.pos) AS cv
         |      FROM (SELECT c.cent_id, t.i AS pos, c.cv[t.i] AS x0
         |            FROM ${p}c$i c, UNNEST(range(1, len(c.cv) + 1)) t(i)) g
         |      LEFT JOIN ${p}m$i m ON m.cell = g.cent_id AND m.pos = g.pos
         |      GROUP BY g.cent_id)""".stripMargin
    }
    s"""${p}c0 AS MATERIALIZED (SELECT vec_id AS cent_id,
       |             list_transform($vcol, x -> CAST(x AS DOUBLE)) AS cv
       |      FROM $src WHERE vec_id % $every = 0),
       |${blocks.mkString(",\n")}""".stripMargin
  }

  /** q97: TRAINED-codebook IVF ANN under the oracle gate — the quality
    * configuration a deployment actually runs (trained centroids, probed
    * IVF, exact rerank), hash-checked end to end. Training is
    * [[graft.operators.Quantize.kmeansTrainExact]]: three distributed
    * Lloyd rounds whose per-cell means are id-ordered folds, so the
    * oracle replays the ENTIRE training run bit-for-bit ([[
    * sqlKmeansIters]], unrolled CTEs) — no rounding firewall, no
    * fixture-pinned centroid table — then q40's proven probe tail
    * (cosine cell assignment, 3-cell probe, exact rerank) runs against
    * the trained codebook on both engines. The production trainer
    * ([[graft.operators.Quantize.kmeansTrain]], warm-started partial-agg
    * means) is pinned to this exact tier within 1e-9/coordinate by
    * QuantizeSpec; recall vs stride at these knobs is pinned by
    * AnnRecallSpec and published in the `ann_recall` sidecar. */
  val q97 = Q(
    "q97_ann_ivf_trained",
    s"""WITH ${sqlKmeansIters(50, 3)},
       |n AS (SELECT vec_id, embedding,
       |             sqrt(${sqlDot("embedding", "embedding")}) AS nrm
       |      FROM embeddings),
       |cents AS (SELECT cent_id, cv, sqrt(${sqlDot("cv", "cv")}) AS cn
       |          FROM c3),
       |scored AS (SELECT vec_id, embedding, nrm, cent_id,
       |                  ${sqlDot("embedding", "cv")} / (nrm * cn) AS cent_cos
       |           FROM n, cents),
       |assigned AS (SELECT vec_id, embedding, nrm, cent_id AS cell FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY cent_cos DESC, cent_id) AS rn
       |    FROM scored) WHERE rn = 1),
       |q AS (SELECT embedding AS qv, nrm AS qn FROM n WHERE vec_id = 0),
       |probed AS (SELECT cent_id AS cell
       |           FROM cents, q
       |           ORDER BY ${sqlDot("cv", "qv")} / (cn * qn) DESC, cent_id
       |           LIMIT 3)
       |SELECT vec_id, cell,
       |       ROUND(${sqlDot("embedding", "qv")} / (nrm * qn), 6) AS cos_r
       |FROM assigned JOIN probed USING (cell), q
       |WHERE vec_id <> 0
       |ORDER BY cos_r DESC, vec_id
       |LIMIT 10""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    val cents = graft.operators.Quantize.kmeansTrainExact(
      emb, "vec_id", "embedding", every = 50, iters = 3)
    Similarity.ivfTopKCents(emb, "vec_id", "embedding", cents,
      queryId = 0L, k = 10, nprobe = 3)
  }

  /** DuckDB twin of the residual squared-L2 fold against a TRAINED
    * (already-DOUBLE) centroid list: ((CAST(v[i]) − cv[i]) − rv[i])²
    * summed index-ordered — [[graft.functions.NearestResidual]]'s exact
    * arithmetic when level-1 centroids are trained doubles. */
  private def sqlResDistT(emb: String, cv: String, rv: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
    s"list_transform(range(1, len($emb) + 1), " +
    s"i -> ((CAST($emb[i] AS DOUBLE) - $cv[i]) - $rv[i])" +
    s" * ((CAST($emb[i] AS DOUBLE) - $cv[i]) - $rv[i]))), " +
    s"(x, y) -> x + y)"

  /** q102: the TRAINED two-level quantizer under the oracle gate —
    * q97's exact-replay discipline extended to BOTH codebook levels
    * ([[graft.operators.Quantize.twoLevelTrainExact]]): the oracle
    * replays SIX full Lloyd rounds over the corpus for the level-1 book
    * ([[sqlKmeansItersOn]], unrolled), the serving cosine cell1
    * assignment, the residual table `v − c1[cell1]`, six MORE Lloyd
    * rounds over those residuals for the level-2 book, both
    * assignments, and q71's hierarchical probe + exact rerank — at the
    * measured matched-cost knobs (nprobe 6/20, the best probed
    * operating point on the recall-vs-cost frontier; 6+6 is the
    * measured iteration knee where the replayable trainer matches
    * driver-sample Lloyd's recall at equal scan cost — see
    * [[graft.operators.Quantize.ivfTopKTwoLevelTrained]]). Codebook
    * SIZES match the q70/q71 stride twins (every 50/37), so the green
    * row pins codebook QUALITY, not configuration drift. */
  val q102 = Q(
    "q102_ann_2level_trained",
    s"""WITH ${sqlKmeansItersOn("embeddings", "embedding", "k", 50, 6)},
       |n AS (SELECT vec_id, embedding,
       |             sqrt(${sqlDot("embedding", "embedding")}) AS nrm
       |      FROM embeddings),
       |tc1 AS (SELECT cent_id, cv, sqrt(${sqlDot("cv", "cv")}) AS cn
       |        FROM kc6),
       |s1 AS (SELECT n.vec_id, n.embedding, n.nrm, c.cent_id,
       |              ${sqlDot("n.embedding", "c.cv")} / (n.nrm * c.cn) AS cent_cos
       |       FROM n, tc1 c),
       |a1 AS (SELECT vec_id, embedding, nrm, cent_id AS cell1 FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY cent_cos DESC, cent_id) AS rn
       |    FROM s1) WHERE rn = 1),
       |res AS MATERIALIZED (SELECT a.vec_id,
       |               list_transform(range(1, len(a.embedding) + 1),
       |                 i -> CAST(a.embedding[i] AS DOUBLE) - c.cv[i]) AS rvec
       |        FROM a1 a JOIN tc1 c ON c.cent_id = a.cell1),
       |${sqlKmeansItersOn("res", "rvec", "r", 37, 6)},
       |rb AS (SELECT cent_id AS cent2_id, cv AS rv FROM rc6),
       |d2 AS (SELECT a.vec_id, a.cell1, rb.cent2_id,
       |              ${sqlResDistT("a.embedding", "c.cv", "rb.rv")} AS dist
       |       FROM a1 a JOIN tc1 c ON c.cent_id = a.cell1, rb),
       |a2 AS (SELECT vec_id, cent2_id AS cell2 FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY dist ASC, cent2_id) AS rn
       |    FROM d2) WHERE rn = 1),
       |asg AS (SELECT a1.vec_id, a1.embedding, a1.nrm, a1.cell1, a2.cell2
       |        FROM a1 JOIN a2 USING (vec_id)),
       |q AS (SELECT embedding AS qv, nrm AS qn FROM n WHERE vec_id = 0),
       |p1 AS (SELECT cent_id, cv FROM tc1, q
       |       ORDER BY ${sqlDot("cv", "qv")} / (cn * qn) DESC, cent_id
       |       LIMIT 6),
       |pp AS (SELECT cell1, cell2 FROM (
       |    SELECT p1.cent_id AS cell1, rb.cent2_id AS cell2,
       |           ROW_NUMBER() OVER (PARTITION BY p1.cent_id ORDER BY
       |             ${sqlResDistT("q.qv", "p1.cv", "rb.rv")} ASC, rb.cent2_id) AS rn
       |    FROM p1, rb, q) WHERE rn <= 20)
       |SELECT vec_id, cell1, cell2,
       |       ROUND(${sqlDot("asg.embedding", "q.qv")} / (asg.nrm * q.qn), 6) AS cos_r
       |FROM asg JOIN pp USING (cell1, cell2), q
       |WHERE vec_id <> 0
       |ORDER BY cos_r DESC, vec_id
       |LIMIT 10""".stripMargin) { (s, dir) =>
    graft.operators.Quantize.ivfTopKTwoLevelTrained(
      Tables.embeddings(s, dir), "vec_id", "embedding", queryId = 0L,
      k = 10, every1 = 50, every2 = 37, iters1 = 6, iters2 = 6,
      nprobe1 = 6, nprobe2 = 20)
  }

  /** q93: embedding-space drift ([[graft.operators.Drift
    * .embeddingDrift]]) — per label, the cosine between the even- and
    * odd-slice centroid vectors (q33's rounded-centroid convention, then
    * the index-ordered cosine fold) — the vector-side counterpart of
    * q92's vocabulary drift. */
  val q93 = Q(
    "q93_embedding_drift",
    s"""WITH e AS (SELECT vec_id % 2 AS side, label, embedding FROM embeddings),
       |m AS (SELECT side, label, CAST(t.i AS BIGINT) AS pos,
       |             ROUND(SUM(CAST(embedding[t.i] AS DOUBLE)) / COUNT(*), 6) AS cv,
       |             CAST(COUNT(*) AS BIGINT) AS n
       |      FROM e, UNNEST(range(1, len(embedding) + 1)) t(i)
       |      GROUP BY side, label, t.i),
       |c AS (SELECT side, label, list(cv ORDER BY pos) AS cent, MAX(n) AS n
       |      FROM m GROUP BY side, label),
       |j AS (SELECT a.label, a.n AS n_a, b.n AS n_b,
       |             a.cent AS cva, b.cent AS cvb
       |      FROM c a JOIN c b ON a.label = b.label
       |      WHERE a.side = 0 AND b.side = 1)
       |SELECT label, n_a, n_b,
       |       ROUND(${sqlDot("cva", "cvb")} /
       |             (sqrt(${sqlDot("cva", "cva")}) * sqrt(${sqlDot("cvb", "cvb")})),
       |             6) AS cos_r
       |FROM j ORDER BY label""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    graft.operators.Drift.embeddingDrift(
      emb.filter(col("vec_id") % 2 === 0),
      emb.filter(col("vec_id") % 2 === 1), "label", "embedding")
      .orderBy("label")
  }

  /** q94: hard-negative mining ([[Similarity.hardNegatives]]) — per
    * query, the 5 nearest corpus vectors with a DIFFERENT label: the
    * contrastive-training pair generator (the highest-similarity
    * wrong-label rows are the negatives the objective learns from). The
    * oracle replays the label-mismatch predicate before the rank, so
    * same-label mass provably never enters the window. */
  val q94 = Q(
    "q94_hard_negatives",
    s"""WITH n AS (SELECT vec_id, label, embedding,
       |                  sqrt(${sqlDot("embedding", "embedding")}) AS nrm
       |           FROM embeddings),
       |q AS (SELECT vec_id AS qid, label AS qlabel, embedding AS qv, nrm AS qn
       |      FROM n WHERE vec_id % 100 = 0),
       |sc AS (SELECT qid, vec_id,
       |              ROUND(${sqlDot("embedding", "qv")} / (nrm * qn), 6) AS cos_r
       |       FROM n, q WHERE vec_id <> qid AND label <> qlabel),
       |r AS (SELECT qid, vec_id, cos_r,
       |             CAST(ROW_NUMBER() OVER (
       |               PARTITION BY qid ORDER BY cos_r DESC, vec_id) AS BIGINT) AS rank
       |      FROM sc)
       |SELECT qid, rank, vec_id, cos_r FROM r
       |WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    Similarity.hardNegatives(emb, emb.filter(col("vec_id") % 100 === 0),
      "vec_id", "embedding", "label", k = 5)
      .select("qid", "rank", "vec_id", "cos_r")
      .orderBy("qid", "rank")
  }

  /** q111: density-based pruning rank table ([[Similarity.densityRank]],
    * the SSL-prototypes method — drop the most prototypical `dropMilli`‰
    * of every cluster, keep the hard tail): q61's deterministic stride
    * quantizer and cosine-argmax assignment, prototypicality = rounded
    * cosine to the ASSIGNED centroid, per-cell rank (cos DESC, id ASC),
    * kept ⇔ `1000·rank > 300·n_cell` (multiplication form — the exact
    * floor semantics with no division). The oracle re-derives
    * assignment, the assigned-centroid cosine, both window columns, and
    * the kept predicate. */
  val q111 = Q(
    "q111_density_prune",
    s"""WITH n AS (SELECT vec_id, embedding,
       |                  sqrt(${sqlDot("embedding", "embedding")}) AS nrm
       |           FROM embeddings),
       |cents AS (SELECT vec_id AS cent_id, embedding AS cv, nrm AS cn
       |          FROM n WHERE vec_id % 50 = 0),
       |scored AS (SELECT vec_id, embedding, nrm, cent_id, cv, cn,
       |                  ${sqlDot("embedding", "cv")} / (nrm * cn) AS cent_cos
       |           FROM n, cents),
       |assigned AS (SELECT vec_id, cent_id AS cell,
       |                    ROUND(cent_cos, 6) AS cent_cos_r FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY cent_cos DESC, cent_id) AS rn
       |    FROM scored) WHERE rn = 1),
       |ranked AS (SELECT vec_id, cell, cent_cos_r,
       |                  CAST(ROW_NUMBER() OVER (
       |                    PARTITION BY cell
       |                    ORDER BY cent_cos_r DESC, vec_id) AS BIGINT) AS rank,
       |                  CAST(COUNT(*) OVER (PARTITION BY cell) AS BIGINT)
       |                    AS n_cell
       |           FROM assigned)
       |SELECT vec_id, cell, cent_cos_r, rank, n_cell,
       |       CAST(CASE WHEN 1000 * rank > 300 * n_cell THEN 1 ELSE 0 END
       |            AS BIGINT) AS kept
       |FROM ranked
       |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    Similarity.densityRank(Tables.embeddings(s, dir), "vec_id", "embedding",
      dropMilli = 300, centroidEvery = 50)
      .orderBy("vec_id")
  }

  /** q140: IVF STANDING-INDEX DELETION under the oracle gate — q138's
    * lifecycle discipline applied to [[graft.operators.VectorIndex]]:
    * each fresh run bootstraps a real index in owned scratch (the
    * `% 8 = 1` eighth of the `% 4 = 1` corpus quarter, stride-7
    * quantizer), APPENDS the `% 8 = 5` eighth as a tokened delta,
    * DELETES every third corpus vector with the delta still outstanding
    * (deletion doubles as a compaction), then probes top-10 at
    * nprobe 3. The oracle is q40's exact replay over the SURVIVING
    * vectors under the UNCHANGED quantizer — the frozen-quantizer
    * contract: deleting a centroid's source vector removes it from
    * results but never from the codebook (centroid 105 is exactly that
    * row), and a delete that dropped a cell directory or resurrected a
    * delta row breaks the hash. Memoized per (JVM, sfDir) like q138:
    * the correctness gate's fresh JVM always runs the full
    * bootstrap/append/delete path once; bench reps time the indexed
    * probe. */
  private val q140IdxCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  val q140 = Q(
    "q140_ivf_delete",
    s"""WITH n AS (SELECT vec_id, embedding,
       |                  sqrt(${sqlDot("embedding", "embedding")}) AS nrm
       |           FROM embeddings),
       |corp AS (SELECT * FROM n WHERE vec_id % 4 = 1),
       |cents AS (SELECT vec_id AS cent_id, embedding AS cv, nrm AS cn
       |          FROM corp WHERE vec_id % 8 = 1 AND vec_id % 7 = 0),
       |live AS (SELECT * FROM corp WHERE vec_id % 3 <> 0),
       |scored AS (SELECT vec_id, embedding, nrm, cent_id,
       |                  ${sqlDot("embedding", "cv")} / (nrm * cn) AS cent_cos
       |           FROM live, cents),
       |assigned AS (SELECT vec_id, embedding, nrm, cent_id AS cell FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY cent_cos DESC, cent_id) AS rn
       |    FROM scored) WHERE rn = 1),
       |q AS (SELECT embedding AS qv, nrm AS qn FROM n WHERE vec_id = 0),
       |probed AS (SELECT cent_id AS cell
       |           FROM cents, q
       |           ORDER BY ${sqlDot("cv", "qv")} / (cn * qn) DESC, cent_id
       |           LIMIT 3)
       |SELECT vec_id, cell,
       |       ROUND(${sqlDot("embedding", "qv")} / (nrm * qn), 6) AS cos_r
       |FROM assigned JOIN probed USING (cell), q
       |ORDER BY cos_r DESC, vec_id
       |LIMIT 10""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(s, dir)
    val idx = q140IdxCache.computeIfAbsent(dir, { d: String =>
      val corp = emb.filter(col("vec_id") % 4 === 1)
      val scratch = java.nio.file.Files
        .createTempDirectory("graft-q140-idx").toString
      graft.operators.VectorIndex.writeIndex(
        corp.filter(col("vec_id") % 8 === 1), "vec_id", "embedding",
        scratch, centroidEvery = 7)
      graft.operators.VectorIndex.appendIndex(
        corp.filter(col("vec_id") % 8 === 5), "vec_id", "embedding",
        scratch, batchId = 1L)
      val dead = corp.filter(col("vec_id") % 3 === 0)
        .select(col("vec_id").cast("long"))
        .collect().map(_.getLong(0)).toSeq
      graft.operators.VectorIndex.deleteIndex(s, scratch, dead)
      scratch
    })
    val qv = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    graft.operators.VectorIndex.topKIndexed(s, idx, qv, k = 10, nprobe = 3)
      .select(col("id").as("vec_id"), col("cell"), col("cos_r"))
  }

  val all: Seq[Q] = Seq(q30, q31, q32, q33, q35, q40, q51, q57, q61, q67,
    q70, q71, q83, q84, q85, q86, q87, q88, q93, q94, q97, q102, q111,
    q140)
}
