package graft.queries

import scala.util.chaining._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q.t

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  *   - `knn_brute`: exact cosine top-k for a query set — the correctness
  *     baseline, one broadcast of the (small) query side, map-side scoring,
  *     per-query top-k via window rank. At 100 TB the candidate side stays
  *     fully partition-parallel; only k rows per query cross the shuffle.
  *   - `knn_lsh`: the scale path — sign-random-projection LSH buckets from
  *     deterministic hyperplanes (hash-derived, no RNG state to ship),
  *     candidates meet in their bucket (shuffle on bucket id ⇒ O(n·k)
  *     candidate pairs instead of O(n²)), then exact re-rank inside buckets.
  *   - `knn_ivf`: IVF-style variant — label is the (given) coarse centroid
  *     assignment; probe = the query's own cell.
  *
  * Cosines are computed in double precision (element-wise promoted) with a
  * left-to-right fold, matching DuckDB's `list_dot_product` on `DOUBLE[]`
  * bit-for-bit, then rounded to 6 dp with vec_id tie-breaks so rank order is
  * engine-independent.
  */
object Similarity {

  /** Promote a float array column to double for exact cross-engine math. */
  private def dbl(c: Column): Column = transform(c, x => x.cast("double"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** All (query, candidate) cosine pairs for queries `vec_id < nQueries`.
    * Squared norms are computed once per vector in the scan projection, not
    * per pair; `sqrt(qn2 * n2)` keeps the oracle's exact expression tree so
    * the rounded cosine stays bit-identical.
    */
  private def scoredPairs(s: SparkSession, d: String, nQueries: Int): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = t(s, d, "embeddings").select(col("vec_id"), dbl(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < nQueries).select(col("vec_id").as("qid"), col("v").as("qv"))
    e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos", round(expr("cosine_similarity(qv, v)"), 6))
  }

  val all: Seq[Q] = Seq(
    // --- exact brute-force cosine top-k ---
    Q(
      "knn_brute",
      (s, d) => {
        val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
        scoredPairs(s, d, nQueries = 8)
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select("qid", "vec_id", "rank", "cos")
          .orderBy("qid", "rank")
      },
      Some("""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
        p AS (
          SELECT qid, vec_id,
                 round(list_dot_product(qv, v) /
                       sqrt(list_dot_product(qv, qv) * list_dot_product(v, v)), 6) AS cos
          FROM e CROSS JOIN q WHERE vec_id <> qid),
        r AS (
          SELECT qid, vec_id, cos,
                 row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rank
          FROM p)
        SELECT qid, vec_id, CAST(rank AS INTEGER) AS rank, cos
        FROM r WHERE rank <= 5 ORDER BY qid, rank
      """)
    ),

    // --- filtered vector search: metadata predicate inside retrieval ---
    // The production ANN feature plain top-k lacks: "nearest neighbors
    // WHERE <metadata predicate>" (cross-label retrieval here — candidates
    // must carry a different label than the probe). The predicate applies
    // BEFORE scoring, inside the join condition, so at scale it prunes the
    // candidate stream in the scan/join stage rather than post-filtering a
    // top-k that may then underfill — the classic filtered-search pitfall.
    // Same broadcast-probe brute shape and rounding as knn_brute.
    Q(
      "knn_filtered",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), col("label"), dbl(col("embedding")).as("v"))
        val q = e
          .filter(col("vec_id") < 8)
          .select(col("vec_id").as("qid"), col("label").as("qlabel"), col("v").as("qv"))
        val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
        e.join(broadcast(q), col("vec_id") =!= col("qid") && col("label") =!= col("qlabel"))
          .withColumn("cos", round(expr("cosine_similarity(qv, v)"), 6))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select("qid", "vec_id", "rank", "cos")
          .orderBy("qid", "rank")
      },
      Some("""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv FROM e WHERE vec_id < 8),
        p AS (
          SELECT qid, vec_id,
                 round(list_dot_product(qv, v) /
                       sqrt(list_dot_product(qv, qv) * list_dot_product(v, v)), 6) AS cos
          FROM e CROSS JOIN q WHERE vec_id <> qid AND label <> qlabel),
        r AS (
          SELECT qid, vec_id, cos,
                 row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rank
          FROM p)
        SELECT qid, vec_id, CAST(rank AS INTEGER) AS rank, cos
        FROM r WHERE rank <= 5 ORDER BY qid, rank
      """)
    ),

    // --- scalar-quantized ANN: int8 candidate generation + exact re-rank ---
    // The memory-bandwidth scale path: candidates rank by an INTEGER dot
    // product over symmetric-int8 codes (4× smaller vectors, exact
    // arithmetic → exact oracle, unlike the seeded/bucketed variants), then
    // only the top candidates pay the full-precision cosine. Quantization
    // preserves direction (unlike bucketing), so recall survives even on
    // near-random embeddings where LSH/IVF recall collapses.
    Q(
      "knn_quantized",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), dbl(col("embedding")).as("v"))
          .withColumn("amax", array_max(transform(col("v"), x => abs(x))))
          .filter(col("amax") > 0)
          .withColumn("scale", lit(127.0) / col("amax"))
          .withColumn("q8", transform(col("v"), x => round(x * col("scale")).cast("long")))
          .drop("amax", "scale")
        val qs = e
          .filter(col("vec_id") < 8)
          .select(col("vec_id").as("qid"), col("v").as("qv"), col("q8").as("qq"))
        val wCand = Window.partitionBy("qid").orderBy(desc("idot"), asc("vec_id"))
        val wFinal = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
        e.join(broadcast(qs), col("vec_id") =!= col("qid"))
          .withColumn(
            "idot",
            expr("aggregate(zip_with(q8, qq, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, x) -> acc + x)")
          )
          .withColumn("crank", row_number().over(wCand))
          .filter(col("crank") <= 32)
          .withColumn("cos", round(expr("cosine_similarity(qv, v)"), 6))
          .withColumn("rank", row_number().over(wFinal))
          .filter(col("rank") <= 5)
          .select("qid", "vec_id", "rank", "cos")
          .orderBy("qid", "rank")
      },
      Some("""
        WITH v AS (
          SELECT vec_id, embedding::DOUBLE[] AS e,
                 list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS amax
          FROM embeddings),
        q8 AS (
          SELECT vec_id, e,
                 list_transform(e, x -> CAST(round(x * (127.0 / amax)) AS BIGINT)) AS q
          FROM v WHERE amax > 0),
        qs AS (SELECT vec_id AS qid, e AS qe, q AS qq FROM q8 WHERE vec_id < 8),
        scored AS (
          SELECT qs.qid, q8.vec_id, q8.e, qs.qe,
                 CAST(list_dot_product(
                        list_transform(q8.q, x -> CAST(x AS DOUBLE)),
                        list_transform(qs.qq, x -> CAST(x AS DOUBLE))) AS BIGINT) AS idot
          FROM q8 CROSS JOIN qs WHERE q8.vec_id <> qs.qid),
        cand AS (
          SELECT *, row_number() OVER (PARTITION BY qid ORDER BY idot DESC, vec_id ASC) AS crank
          FROM scored),
        rer AS (
          SELECT qid, vec_id,
                 round(list_dot_product(qe, e) /
                       sqrt(list_dot_product(qe, qe) * list_dot_product(e, e)), 6) AS cos
          FROM cand WHERE crank <= 32),
        fin AS (
          SELECT qid, vec_id, cos,
                 row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rank
          FROM rer)
        SELECT qid, vec_id, CAST(rank AS INTEGER) AS rank, cos
        FROM fin WHERE rank <= 5 ORDER BY qid, rank
      """)
    ),

    // --- LSH-bucketed ANN: sign random projection with deterministic planes ---
    Q(
      "knn_lsh",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val nPlanes = 6
        // Deterministic hyperplane weights from md5 integer hashes:
        // w(p,i) = ((int(md5("p<p>_<i>")[0:15 hex]) mod 2001) - 1000)/1000.0.
        // All-integer derivation → the DuckDB oracle rebuilds the SAME
        // planes bit-for-bit (the sin()-based planes this replaces were not
        // cross-engine stable, which is why this query had no oracle). The
        // 6×64 weight table is metadata: computed once on the driver,
        // shipped as literals inside the projection expression.
        val planes: Seq[Seq[Double]] = (0 until nPlanes).map { p =>
          (0 until 64).map { i =>
            val md = java.security.MessageDigest.getInstance("MD5")
            val hex = md.digest(s"p${p}_$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
            ((java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2001) - 1000) / 1000.0
          }
        }
        val e = t(s, d, "embeddings").select(col("vec_id"), dbl(col("embedding")).as("v"))
        val withBits = (0 until nPlanes).foldLeft(e) { (df, p) =>
          val proj = aggregate(
            zip_with(col("v"), typedlit(planes(p)), (x, w) => x * w),
            lit(0.0),
            (acc, x) => acc + x
          )
          df.withColumn(s"bit_$p", when(proj >= 0, 1).otherwise(0))
        }
        val bucketed = withBits.withColumn(
          "bucket",
          (0 until nPlanes).map(p => col(s"bit_$p") * (1 << p)).reduce(_ + _)
        )
        val q = bucketed
          .filter(col("vec_id") < 8)
          .select(col("vec_id").as("qid"), col("v").as("qv"), col("bucket").as("qbucket"))
        val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
        bucketed
          .join(broadcast(q), col("bucket") === col("qbucket") && col("vec_id") =!= col("qid"))
          .withColumn("cos", round(expr("cosine_similarity(qv, v)"), 6))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select("qid", "vec_id", "rank", "cos")
          .orderBy("qid", "rank")
      },
      Some("""
        WITH planes AS (
          SELECT pp.p,
                 list_transform(range(0, 64),
                   i -> ((('0x' || substr(md5('p' || CAST(pp.p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 15))::BIGINT % 2001) - 1000) / 1000.0) AS w
          FROM range(0, 6) pp(p)),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        b AS (
          SELECT e.vec_id,
                 CAST(sum(CASE WHEN list_dot_product(e.v, pl.w) >= 0 THEN (1 << pl.p) ELSE 0 END) AS INTEGER) AS bucket
          FROM e CROSS JOIN planes pl GROUP BY e.vec_id),
        c AS (SELECT b.vec_id, e.v, b.bucket FROM b JOIN e USING (vec_id)),
        q AS (SELECT vec_id AS qid, v AS qv, bucket AS qbucket FROM c WHERE vec_id < 8),
        p2 AS (
          SELECT q.qid, c.vec_id,
                 round(list_dot_product(q.qv, c.v) /
                       sqrt(list_dot_product(q.qv, q.qv) * list_dot_product(c.v, c.v)), 6) AS cos
          FROM c JOIN q ON c.bucket = q.qbucket AND c.vec_id <> q.qid),
        r AS (
          SELECT qid, vec_id, cos,
                 row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rank
          FROM p2)
        SELECT qid, vec_id, CAST(rank AS INTEGER) AS rank, cos
        FROM r WHERE rank <= 5 ORDER BY qid, rank
      """)
    ),

    // --- IVF-style ANN: coarse cells = label, probe own cell, exact re-rank ---
    Q(
      "knn_ivf",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), col("label"), dbl(col("embedding")).as("v"))
        val q = e
          .filter(col("vec_id") < 8)
          .select(col("vec_id").as("qid"), col("label").as("qlabel"), col("v").as("qv"))
        val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
        e.join(broadcast(q), col("label") === col("qlabel") && col("vec_id") =!= col("qid"))
          .withColumn("cos", round(expr("cosine_similarity(qv, v)"), 6))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select("qid", "vec_id", "rank", "cos")
          .orderBy("qid", "rank")
      },
      Some("""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv FROM e WHERE vec_id < 8),
        p AS (
          SELECT qid, vec_id,
                 round(list_dot_product(qv, v) /
                       sqrt(list_dot_product(qv, qv) * list_dot_product(v, v)), 6) AS cos
          FROM e JOIN q ON label = qlabel WHERE vec_id <> qid),
        r AS (
          SELECT qid, vec_id, cos,
                 row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rank
          FROM p)
        SELECT qid, vec_id, CAST(rank AS INTEGER) AS rank, cos
        FROM r WHERE rank <= 5 ORDER BY qid, rank
      """)
    ),

    // --- IVF with *computed* coarse centroids (k-means, fixed seed) ---
    Q(
      "knn_ivf_kmeans",
      (s, d) => {
        // The honest IVF pipeline: learn the coarse quantizer instead of
        // borrowing the dataset's label column. Seeded k-means → cell
        // assignment → probe the query's own cell → exact re-rank.
        // Approximate by construction (cell boundaries) → rows-only check.
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.array_to_vector
        graft.functions.GraftFunctions.register(s)
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), dbl(col("embedding")).as("v"))
          .withColumn("features", array_to_vector(col("v")))
        val km = new KMeans().setK(16).setSeed(42L).setFeaturesCol("features").setPredictionCol("cell")
        val model = km.fit(e)
        val cells = model.transform(e).select(col("vec_id"), col("v"), col("cell"))
        // Multi-probe: each query searches its nProbe nearest cells (by
        // centroid cosine), not just its own — the standard IVF recall
        // lever. Centroids are driver-resident model state (k × dim,
        // metadata-scale), so probe sets compute locally and broadcast.
        val nProbe = 4
        val centroids = model.clusterCenters.map(_.toArray).zipWithIndex
        def cosArr(a: Array[Double], b: Array[Double]): Double = {
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < math.min(a.length, b.length)) {
            dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
          }
          dot / math.sqrt(na * nb)
        }
        val session = s
        import session.implicits._
        val qVecs = cells.filter(col("vec_id") < 8).select(col("vec_id"), col("v")).collect()
        val probes = qVecs.flatMap { r =>
          val qid = r.getLong(0)
          val qv = r.getSeq[Double](1).toArray
          centroids
            .map { case (c, idx) => (idx, cosArr(qv, c)) }
            .sortBy(-_._2)
            .take(nProbe)
            .map { case (cellIdx, _) => (qid, qv, cellIdx) }
        }.toSeq.toDF("qid", "qv", "qcell")
        val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
        val ivf5 = cells
          .join(broadcast(probes), col("cell") === col("qcell") && col("vec_id") =!= col("qid"))
          .withColumn("cos", round(expr("cosine_similarity(qv, v)"), 6))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select("qid", "vec_id")
        // QUANTIFIED check instead of rows-only: aggregate recall@5 against
        // the exact brute-force top-5, computed inside the query. The
        // k-means cells cannot be rebuilt by the SQL oracle, but the
        // CONTRACT can: the probed cells must recover >= 40% of the true
        // top-5 hits across the query set, so the oracle asserts the
        // boolean while the Spark side measures it. Measured aggregate
        // recall on the near-random synthetic embeddings: 0.50 / 0.55 /
        // 0.60 at sf0.001/0.01/0.1 with nProbe=4 of 16 cells (per-query
        // recall ranges 0..1 — these embeddings have no cluster structure,
        // so a per-query floor would be vacuous; data-limited, documented
        // in README).
        val brute5 = scoredPairs(s, d, nQueries = 8)
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select("qid", "vec_id")
        // MEASURED counts, not hardcoded 8×5: a degenerate table with fewer
        // than 8 vectors (or brute lists shorter than 5) would otherwise
        // mismatch the oracle's count or make the gate unreachable.
        val nq = qVecs.length.toLong
        val nBrute = brute5.count()
        ivf5
          .join(brute5, Seq("qid", "vec_id"))
          .agg(count(lit(1)).as("total_hits"))
          .select(
            lit(nq).as("n_queries"),
            (col("total_hits") >= lit(math.ceil(0.4 * nBrute))).as("recall_ok")
          )
      },
      Some("""
        SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS recall_ok
        FROM embeddings WHERE vec_id < 8
      """)
    ),

    // --- distributed-probe batch IVF: the millions-of-queries shape ---
    // The other ANN variants hold their (8-vector) query set on the driver
    // — right for an online-serving workload, wrong for batch kNN where
    // the probe side is itself a table. Here NOTHING collects: the query
    // set stays a DataFrame end-to-end. The only broadcast is the k×dim
    // centroid table (model state, metadata-sized at any corpus scale);
    // probe assignment is a broadcast cross join scored in codegen, ranked
    // by a qid-keyed window; candidate generation is a plain shuffle join
    // on cell id — at 100 TB with 10M queries that join shuffles both
    // sides by cell and stays fully partition-parallel. Cost model:
    // n·k centroid scores + (n·nProbe/k)·|cell| exact re-ranks, vs
    // brute's n·|corpus|.
    Q(
      "knn_ivf_dist",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), col("label"), dbl(col("embedding")).as("v"))
        // Batch probe table — a DataFrame, never .collect()ed.
        val q = e.filter(col("vec_id") < 64).select(col("vec_id").as("qid"), col("v").as("qv"))
        // Coarse centroids = per-cell mean via posexplode + avg: one
        // shuffle of n·dim rows keyed by (label, pos) (same pattern and
        // drift-rounding rationale as knn_centroid).
        val cent = e
          .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("label", "pos")
          .agg(avg("x").as("cx"))
          .groupBy("label")
          .agg(
            transform(
              array_sort(collect_list(struct(col("pos"), col("cx")))),
              st => st.getField("cx")
            ).as("cv")
          )
          .select(col("label").as("clabel"), col("cv"))
        val nProbe = 2
        val wProbe = Window.partitionBy("qid").orderBy(desc("ccos"), asc("clabel"))
        val probes = q
          .crossJoin(broadcast(cent))
          .withColumn("ccos", round(expr("cosine_similarity(qv, cv)"), 4))
          .withColumn("pr", row_number().over(wProbe))
          .filter(col("pr") <= nProbe)
          .select(col("qid"), col("qv"), col("clabel").as("pcell"))
        // Shuffle join on cell id — deliberately NOT broadcast: the probe
        // side scales with the query count.
        val wFinal = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
        e.join(probes, col("label") === col("pcell") && col("vec_id") =!= col("qid"))
          .withColumn("cos", round(expr("cosine_similarity(qv, v)"), 6))
          .withColumn("rank", row_number().over(wFinal))
          .filter(col("rank") <= 5)
          .select("qid", "vec_id", "rank", "cos")
          .orderBy("qid", "rank")
      },
      Some("""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        u AS (SELECT vec_id, label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e),
        c AS (SELECT label AS clabel, pos, avg(x) AS cx FROM u GROUP BY 1, 2),
        cvt AS (SELECT clabel, list(cx ORDER BY pos) AS cv FROM c GROUP BY 1),
        q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 64),
        pr AS (
          SELECT qid, qv, clabel,
                 row_number() OVER (PARTITION BY qid ORDER BY
                   round(list_dot_product(qv, cv) /
                         sqrt(list_dot_product(qv, qv) * list_dot_product(cv, cv)), 4) DESC,
                   clabel) AS pr
          FROM q CROSS JOIN cvt),
        p AS (SELECT qid, qv, clabel AS pcell FROM pr WHERE pr <= 2),
        cand AS (
          SELECT p.qid, e.vec_id,
                 round(list_dot_product(p.qv, e.v) /
                       sqrt(list_dot_product(p.qv, p.qv) * list_dot_product(e.v, e.v)), 6) AS cos
          FROM e JOIN p ON e.label = p.pcell AND e.vec_id <> p.qid),
        r AS (SELECT qid, vec_id, cos,
                     row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
              FROM cand)
        SELECT qid, vec_id, CAST(rank AS INTEGER) AS rank, cos
        FROM r WHERE rank <= 5 ORDER BY qid, rank
      """)
    ),

    // --- persisted-index probe: the build/probe split of knn_ivf_dist ---
    // A production pipeline builds the IVF index once (CLI `index-ann` /
    // AnnIndex.build) and probes it for months. The query ensures a
    // current index for the scale dir (change-detected on row count,
    // first Verify run builds it, later runs just probe), then runs the
    // probe side ONLY: broadcast the persisted k×dim centroid table,
    // assign nProbe cells in codegen, shuffle-join the partitioned cell
    // table (directory-pruned to the probed cells). Same semantics,
    // rounding and tie-breaks as knn_ivf_dist, so the same oracle checks
    // both — proving index persistence round-trips the plan's results.
    Q(
      "knn_ivf_indexed",
      (s, d) => {
        val indexDir = AnnIndex.ensureFor(s, d)
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), dbl(col("embedding")).as("v"))
        val probes =
          e.filter(col("vec_id") < 64).select(col("vec_id").as("qid"), col("v").as("qv"))
        AnnIndex.probe(s, indexDir, probes, nProbe = 2, k = 5).orderBy("qid", "rank")
      },
      Some("""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        u AS (SELECT vec_id, label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e),
        c AS (SELECT label AS clabel, pos, avg(x) AS cx FROM u GROUP BY 1, 2),
        cvt AS (SELECT clabel, list(cx ORDER BY pos) AS cv FROM c GROUP BY 1),
        q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 64),
        pr AS (
          SELECT qid, qv, clabel,
                 row_number() OVER (PARTITION BY qid ORDER BY
                   round(list_dot_product(qv, cv) /
                         sqrt(list_dot_product(qv, qv) * list_dot_product(cv, cv)), 4) DESC,
                   clabel) AS pr
          FROM q CROSS JOIN cvt),
        p AS (SELECT qid, qv, clabel AS pcell FROM pr WHERE pr <= 2),
        cand AS (
          SELECT p.qid, e.vec_id,
                 round(list_dot_product(p.qv, e.v) /
                       sqrt(list_dot_product(p.qv, p.qv) * list_dot_product(e.v, e.v)), 6) AS cos
          FROM e JOIN p ON e.label = p.pcell AND e.vec_id <> p.qid),
        r AS (SELECT qid, vec_id, cos,
                     row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
              FROM cand)
        SELECT qid, vec_id, CAST(rank AS INTEGER) AS rank, cos
        FROM r WHERE rank <= 5 ORDER BY qid, rank
      """)
    ),

    // --- int8 quantization planning (scale + exact integer checksums) ---
    Q(
      "vec_quantize",
      (s, d) => {
        // Symmetric int8 quantization: scale = 127/max|x|, q_i = round(x_i·s).
        // The emitted checksums are integer sums — order-independent, so the
        // oracle matches exactly; the scale itself is one IEEE divide on an
        // exact max, identical in both engines.
        t(s, d, "embeddings")
          .select(col("vec_id"), dbl(col("embedding")).as("v"))
          .withColumn("amax", array_max(transform(col("v"), x => abs(x))))
          .filter(col("amax") > 0)
          .withColumn("scale", lit(127.0) / col("amax"))
          .withColumn("q", transform(col("v"), x => round(x * col("scale")).cast("long")))
          .select(
            col("vec_id"),
            round(col("scale"), 6).as("scale"),
            expr("aggregate(q, CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("q_sum"),
            expr("aggregate(q, CAST(0 AS BIGINT), (acc, x) -> acc + abs(x))").as("q_l1")
          )
          .orderBy("vec_id")
      },
      Some("""
        WITH v AS (
          SELECT vec_id, embedding::DOUBLE[] AS e,
                 list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS amax
          FROM embeddings),
        sc AS (SELECT vec_id, e, 127.0 / amax AS scale FROM v WHERE amax > 0),
        q AS (SELECT vec_id, scale,
                     list_transform(e, x -> CAST(round(x * scale) AS BIGINT)) AS q
              FROM sc)
        SELECT vec_id, round(scale, 6) AS scale,
               CAST(list_sum(q) AS BIGINT) AS q_sum,
               CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS q_l1
        FROM q ORDER BY vec_id
      """)
    ),

    // --- mean-pooled per-label centroids + nearest-centroid assignment ---
    Q(
      "knn_centroid",
      (s, d) => {
        // Centroids via posexplode + avg per (label, dim) — one shuffle of
        // n·dim rows keyed by (label, pos), fully partition-parallel at any
        // scale. The k×dim centroid table is metadata-sized, so assignment
        // is a broadcast cross join scored inside codegen; only the argmin
        // window shuffles, keyed by vec_id. Distances are rounded to 4 dp
        // so engine-order FP drift in the avg can't flip the compare.
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), col("label"), dbl(col("embedding")).as("v"))
        val cent = e
          .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("label", "pos")
          .agg(avg("x").as("cx"))
          .groupBy("label")
          .agg(
            transform(
              array_sort(collect_list(struct(col("pos"), col("cx")))),
              st => st.getField("cx")
            ).as("cv")
          )
          .select(col("label").as("clabel"), col("cv"))
        val w = Window.partitionBy("vec_id").orderBy(asc("d2"), asc("clabel"))
        e.crossJoin(broadcast(cent))
          .withColumn(
            "d2",
            expr("aggregate(zip_with(v, cv, (a, b) -> (a - b) * (a - b)), 0.0d, (acc, x) -> acc + x)")
          )
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(
            col("vec_id"),
            col("clabel").as("nearest_label"),
            round(sqrt(col("d2")), 4).as("dist")
          )
          .orderBy("vec_id")
      },
      Some("""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        u AS (SELECT vec_id, label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e),
        c AS (SELECT label AS clabel, pos, avg(x) AS cx FROM u GROUP BY 1, 2),
        dd AS (SELECT u.vec_id, c.clabel, sum((u.x - c.cx) * (u.x - c.cx)) AS d2
               FROM u JOIN c ON u.pos = c.pos GROUP BY 1, 2),
        r AS (SELECT vec_id, clabel, d2,
                     row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
              FROM dd)
        SELECT vec_id, clabel AS nearest_label, round(sqrt(d2), 4) AS dist
        FROM r WHERE rn = 1 ORDER BY vec_id
      """)
    ),

    // --- diversity sampling: per cell, keep the k LEAST-central vectors ---
    // The coverage-selection step of embedding-space curation (the
    // complement of near-dup removal): after near-identical vectors are
    // deduped, training mixes keep the samples that EXPAND each region's
    // coverage — operationally, the k vectors furthest from their cell
    // centroid. Same scale shape as knn_centroid: centroids via one
    // (label,pos)-keyed shuffle, scoring in codegen against the broadcast
    // k×dim centroid table, selection via a per-cell window — every stage
    // partition-parallel at any corpus size.
    Q(
      "corpus_diversity_sample",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), col("label"), dbl(col("embedding")).as("v"))
        val cent = e
          .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("label", "pos")
          .agg(avg("x").as("cx"))
          .groupBy("label")
          .agg(
            transform(
              array_sort(collect_list(struct(col("pos"), col("cx")))),
              st => st.getField("cx")
            ).as("cv")
          )
          .select(col("label").as("clabel"), col("cv"))
        val w = Window.partitionBy("label").orderBy(asc("ccos"), asc("vec_id"))
        e.join(broadcast(cent), col("label") === col("clabel"))
          .withColumn("ccos", round(expr("cosine_similarity(v, cv)"), 4))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("label"), col("vec_id"), col("rank"), col("ccos").as("centroid_cos"))
          .orderBy("label", "rank")
      },
      Some("""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        u AS (SELECT vec_id, label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e),
        c AS (SELECT label AS clabel, pos, avg(x) AS cx FROM u GROUP BY 1, 2),
        cvt AS (SELECT clabel, list(cx ORDER BY pos) AS cv FROM c GROUP BY 1),
        sc AS (
          SELECT e.label, e.vec_id,
                 round(list_dot_product(e.v, cvt.cv) /
                       sqrt(list_dot_product(e.v, e.v) * list_dot_product(cvt.cv, cvt.cv)), 4) AS ccos
          FROM e JOIN cvt ON e.label = cvt.clabel),
        r AS (SELECT label, vec_id, ccos,
                     row_number() OVER (PARTITION BY label ORDER BY ccos ASC, vec_id ASC) AS rank
              FROM sc)
        SELECT label, vec_id, CAST(rank AS INTEGER) AS rank, ccos AS centroid_cos
        FROM r WHERE rank <= 5 ORDER BY label, rank
      """)
    ),

    // --- vector norms / stats (sanity surface for the vector column) ---
    Q(
      "vec_stats",
      (s, d) => {
        t(s, d, "embeddings")
          .select(
            col("vec_id"),
            size(col("embedding")).as("dim"),
            round(sqrt(dot(dbl(col("embedding")), dbl(col("embedding")))), 6).as("l2_norm")
          )
          .orderBy("vec_id")
      },
      Some("""
        SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
               round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2_norm
        FROM embeddings ORDER BY vec_id
      """)
    ),

    // --- semantic dedup: cluster-then-prune keep decisions (SemDeDup) ---
    // Abbas et al. 2023 (arXiv 2303.09540): cluster the embedding space,
    // call within-cluster pairs above a cosine threshold semantic
    // duplicates, and from each duplicate set keep the example with the
    // LOWEST similarity to its cluster centroid (prototypical examples are
    // redundant; outliers carry the information). The greedy per-cluster
    // loop of the paper is order-dependent, so the keep rule here is its
    // deterministic dominance closure: a vector is dropped iff SOME
    // cluster-mate within τ ranks strictly more central — i.e. smaller
    // (cos_to_centroid, vec_id) lexicographically. That makes the decision
    // a pure pair predicate: centroids via one (label,pos)-keyed shuffle
    // (same shape as knn_centroid), centroid scores map-side against the
    // broadcast k×dim table, the within-cluster pair pass reuses
    // dedup_embedding's salted self-join (shuffle on (label,salt), no
    // corpus broadcast, bounded S× replication), and the final keep flag is
    // a left-anti join on the dominated ids. Rounding: pair cosines 6 dp,
    // centroid cosines 4 dp (avg is engine-order FP; 4 dp absorbs the
    // drift — the knn_centroid precedent), ties broken on vec_id.
    Q(
      "dedup_semantic",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val tau = 0.25
        val S = 16
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), col("label"), dbl(col("embedding")).as("v"))
        val cent = e
          .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("label", "pos")
          .agg(avg("x").as("cx"))
          .groupBy("label")
          .agg(
            transform(
              array_sort(collect_list(struct(col("pos"), col("cx")))),
              st => st.getField("cx")
            ).as("cv")
          )
          .select(col("label").as("clabel"), col("cv"))
        // Scored vectors feed three roles (both pair-join sides + the final
        // keep projection); checkpoint so the centroid build + scoring runs
        // once, not three times.
        val scored = e
          .join(broadcast(cent), col("label") === col("clabel"))
          .withColumn("cos_c", round(expr("cosine_similarity(v, cv)"), 4))
          .select("vec_id", "label", "v", "cos_c")
          .pipe(graft.queries.Checkpoints.checkpoint)
        val P = graft.queries.Dedup.pairShufflePartitions(s)
        val a = scored
          .select(
            col("vec_id").as("i"), col("label"), col("v").as("va"), col("cos_c").as("ca"),
            pmod(col("vec_id"), lit(S)).cast("int").as("salt"))
          .repartition(P, col("label"), col("salt"))
        val b = scored
          .withColumn("salt2", explode(sequence(lit(0), lit(S - 1))))
          .select(
            col("vec_id").as("j"), col("label").as("label2"), col("v").as("vb"),
            col("cos_c").as("cb"), col("salt2"))
          .repartition(P, col("label2"), col("salt2"))
        val dropped = a
          .join(
            b,
            col("label") === col("label2") && col("salt") === col("salt2") && col("i") < col("j")
          )
          .withColumn("cos", round(expr("cosine_similarity(va, vb)"), 6))
          .filter(col("cos") >= tau)
          .select(
            when(
              col("ca") < col("cb") || (col("ca") === col("cb") && col("i") < col("j")),
              col("j")
            ).otherwise(col("i")).as("vec_id")
          )
          .distinct()
        scored
          .join(dropped.withColumn("is_dropped", lit(true)), Seq("vec_id"), "left")
          .select(
            col("vec_id"),
            col("label"),
            col("cos_c"),
            coalesce(!col("is_dropped"), lit(true)).as("keep")
          )
          .orderBy("vec_id")
      },
      Some("""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        u AS (SELECT label AS clabel, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e),
        c AS (SELECT clabel, pos, avg(x) AS cx FROM u GROUP BY 1, 2),
        cvt AS (SELECT clabel, list(cx ORDER BY pos) AS cv FROM c GROUP BY 1),
        cc AS (
          SELECT e.vec_id, e.label, e.v,
                 round(list_dot_product(e.v, cvt.cv) /
                       sqrt(list_dot_product(e.v, e.v) * list_dot_product(cvt.cv, cvt.cv)), 4) AS cos_c
          FROM e JOIN cvt ON e.label = cvt.clabel),
        dup AS (
          SELECT a.vec_id AS i, b.vec_id AS j, a.cos_c AS ca, b.cos_c AS cb
          FROM cc a JOIN cc b ON a.label = b.label AND a.vec_id < b.vec_id
          WHERE round(list_dot_product(a.v, b.v) /
                      sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)), 6) >= 0.25),
        dropped AS (
          SELECT DISTINCT CASE WHEN (ca < cb) OR (ca = cb AND i < j) THEN j ELSE i END AS vec_id
          FROM dup)
        SELECT cc.vec_id, cc.label, cc.cos_c,
               cc.vec_id NOT IN (SELECT vec_id FROM dropped) AS keep
        FROM cc ORDER BY cc.vec_id
      """)
    ),

    // --- margin-based bitext mining (Artetxe & Schwenk 2019) ---
    // The multilingual curation step: mine parallel pairs between a
    // "source" and "target" embedding space by MARGIN, not raw cosine —
    // cos(x,y) normalized by the mean of each side's nearest-neighbor
    // cosines, so a vector in a dense hub (high cosine to everything)
    // can't fake alignment. Here source = labels 0-4, target = 5-9.
    //
    // Scale plan — the full bipartite cosine matrix is never built:
    //   1. candidates via the IVF shape (same as knn_ivf_dist): only the
    //      k×dim per-cell centroid tables broadcast; each side's vectors
    //      assign to their top-2 opposite-side cells in codegen and meet
    //      candidates through a cell-keyed SHUFFLE join;
    //   2. the k-NN means (k=4) reduce the candidate stream per vector —
    //      partial top-k (WindowGroupLimit) before the shuffle;
    //   3. margin = 2·cos / (ax + ay) over the already-materialized
    //      candidate rows; top-1 per source vector, no global sort.
    // CELLS GROW WITH THE CORPUS: at gated SFs the cells are the fixed
    // label partition (DuckDB-reproducible — the oracle stays exact), but
    // a fixed cell count makes the candidate join O(n²/cells); above
    // `spark.graft.bitext.kmeansThreshold` total vectors (default 10k)
    // each side learns k ≈ √n seeded k-means cells instead (the
    // knn_ivf_kmeans machinery), so candidates stay ~O(n^1.5) at any
    // scale. `spark.graft.bitext.cells` (or SPARK_GRAFT_BITEXT_CELLS)
    // forces a mode: label | kmeans | exact (one cell = true all-pairs
    // margins, the recall reference) | auto. BitextCellsSpec pins the
    // kmeans-vs-exact margin-recall contract at the crossover.
    //
    // RECALL CONTRACT (the API-level statement, not just SCALE.md): the
    // k-means path is APPROXIMATE, and its recall vs `exact` depends on
    // whether the corpus HAS cluster structure — ≥ 0.8 on clusterable
    // data (BitextCellsSpec's planted corpus: 0.886), but on near-random
    // embeddings (the synthetic sf tables) a √n-cell quantizer captures
    // little and recall at the default probe width is ~0.2-0.4.
    // `spark.graft.bitext.nprobe` (SPARK_GRAFT_BITEXT_NPROBE, default 2)
    // widens the top-p cell assignment: candidate volume — and the
    // cell-join cost — scales ~linearly with it, recall rises toward 1 as
    // nprobe → cells. BitextCellsSpec pins measured floors on the
    // UNSTRUCTURED sf0.1 embeddings at nprobe 2 and 8. Determinism: the
    // k-means|| init can depend on partitioning despite the fixed seed,
    // so auto mode above the threshold is NOT oracle-reproducible —
    // Verify pins label mode for its dumps (see Verify.main), and any
    // hash-comparison run at >10k vectors must do the same.
    // FP discipline: cosines round to 6 dp; the k-NN means sum those as
    // exact DECIMALs and divide by the count (decimal→double is one
    // correctly-rounded conversion in both engines); the margin is a
    // ratio of unstructured values — safe — rounded to 6 dp with tgt_id
    // tiebreak.
    Q(
      "corpus_bitext_mine",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        // Q.widen (r15): same single-partition-scan hazard as knn_recall —
        // both sides' cell assignment and candidate cosine scoring fan out
        // from this checkpoint.
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), col("label").cast("int").as("label"), dbl(col("embedding")).as("v"))
          .pipe(Q.widen)
          .pipe(graft.queries.Checkpoints.checkpoint)
        val src = e.filter(col("label") < 5)
          .select(col("vec_id").as("sid"), col("label").as("slabel"), col("v").as("sv"))
        val tgt = e.filter(col("label") >= 5)
          .select(col("vec_id").as("tid"), col("label").as("tlabel"), col("v").as("tv"))
        def meanCentroids(side: DataFrame, vcol: String, cellCol: Column): DataFrame = side
          .select(cellCol.as("cell"), posexplode(col(vcol)).as(Seq("pos", "x")))
          .groupBy("cell", "pos")
          .agg(avg("x").as("cx"))
          .groupBy("cell")
          .agg(
            transform(
              array_sort(collect_list(struct(col("pos"), col("cx")))),
              st => st.getField("cx")
            ).as("cv")
          )
        // Seeded k-means side quantizer: k ≈ √n cells, centroid table is
        // model state (k×dim, metadata-scale — broadcastable at any n).
        // `n` is the side's precomputed row count (one count per side,
        // shared with the threshold probe) — callers guarantee n ≥ 64, so
        // k ≤ n always holds and KMeans.fit never sees an empty dataset.
        def kmeansCells(side: DataFrame, idCol: String, vcol: String, n: Long): (DataFrame, DataFrame) = {
          import org.apache.spark.ml.clustering.KMeans
          import org.apache.spark.ml.functions.array_to_vector
          val k = math.max(10, math.sqrt(n.toDouble).toInt)
          val feat = side.withColumn("features", array_to_vector(col(vcol)))
          val model = new KMeans()
            .setK(k)
            .setSeed(42L)
            .setFeaturesCol("features")
            .setPredictionCol("cell")
            .fit(feat)
          val assigned = model.transform(feat).select(col(idCol), col(vcol), col("cell"))
          val session = s
          import session.implicits._
          val cents = model.clusterCenters.toSeq
            .map(_.toArray.toSeq)
            .zipWithIndex
            .map { case (cv, i) => (i, cv) }
            .toDF("cell", "cv")
          (assigned, cents)
        }
        val mode = s.conf
          .getOption("spark.graft.bitext.cells")
          .orElse(sys.env.get("SPARK_GRAFT_BITEXT_CELLS"))
          .getOrElse("auto")
        val threshold = s.conf
          .getOption("spark.graft.bitext.kmeansThreshold")
          .orElse(sys.env.get("SPARK_GRAFT_BITEXT_KMEANS_THRESHOLD"))
          .getOrElse("10000")
          .toLong
        // One count per side (shared by the threshold probe and the
        // per-side k), instead of the former e.count() + a count inside
        // each kmeansCells call. A side below 64 vectors (or empty) falls
        // back to the label cells even in forced kmeans mode: KMeans.fit
        // throws on an empty dataset and k ≈ √n is meaningless there,
        // while the label path returns the small/empty result gracefully.
        // Both side counts come from ONE aggregate job over the
        // checkpointed base (r15: two back-to-back .count() actions were
        // two scheduler round-trips over the same materialized rows).
        val cntRow = e
          .agg(
            sum(when(col("label") < 5, 1L).otherwise(0L)).as("srcN"),
            sum(when(col("label") >= 5, 1L).otherwise(0L)).as("tgtN")
          )
          .first()
        val srcN = if (cntRow.isNullAt(0)) 0L else cntRow.getLong(0)
        val tgtN = if (cntRow.isNullAt(1)) 0L else cntRow.getLong(1)
        val useKmeans =
          (mode == "kmeans" || (mode == "auto" && srcN + tgtN > threshold)) &&
            math.min(srcN, tgtN) >= 64
        val (srcCells, srcCents, tgtCells, tgtCents) =
          if (mode == "exact")
            (
              src.select(col("sid"), col("sv"), lit(0).as("cell")),
              meanCentroids(src, "sv", lit(0)),
              tgt.select(col("tid"), col("tv"), lit(0).as("cell")),
              meanCentroids(tgt, "tv", lit(0))
            )
          else if (useKmeans) {
            val (sa, sc) = kmeansCells(src, "sid", "sv", srcN)
            val (ta, tc) = kmeansCells(tgt, "tid", "tv", tgtN)
            (sa, sc, ta, tc)
          } else
            (
              src.select(col("sid"), col("sv"), col("slabel").as("cell")),
              meanCentroids(src, "sv", col("slabel")),
              tgt.select(col("tid"), col("tv"), col("tlabel").as("cell")),
              meanCentroids(tgt, "tv", col("tlabel"))
            )
        // Probe width: each vector assigns to its top-`nprobe` opposite-
        // side cells (default 2 — the oracle SQL's pr <= 2; gated runs
        // must keep the default). Raising it trades candidate volume
        // (cost scales ~linearly in nprobe) for recall on corpora whose
        // structure the quantizer captures poorly — on UNSTRUCTURED
        // near-random embeddings the k-means cells at nprobe=2 recover
        // only ~0.2-0.4 of the exact margins (BitextCellsSpec pins the
        // measured floors); nprobe=8 is the measured sweet spot there.
        val nprobe = s.conf
          .getOption("spark.graft.bitext.nprobe")
          .orElse(sys.env.get("SPARK_GRAFT_BITEXT_NPROBE"))
          .getOrElse("2")
          .toInt
        val wS = Window.partitionBy("sid").orderBy(desc("ccos"), asc("cell"))
        val xCells = src
          .crossJoin(broadcast(tgtCents))
          .withColumn("ccos", round(expr("cosine_similarity(sv, cv)"), 4))
          .withColumn("pr", row_number().over(wS))
          .filter(col("pr") <= nprobe)
          .select(col("sid"), col("sv"), col("cell"))
        // Both the margin scoring and the src-side k-NN mean read candX —
        // checkpoint or the cell join + cosine pass runs twice.
        val candX = xCells
          .join(tgtCells, "cell")
          .withColumn("cos", round(expr("cosine_similarity(sv, tv)"), 6))
          .select("sid", "tid", "cos")
          .pipe(graft.queries.Checkpoints.checkpoint)
        val wT = Window.partitionBy("tid").orderBy(desc("ccos"), asc("cell"))
        val yCells = tgt
          .crossJoin(broadcast(srcCents))
          .withColumn("ccos", round(expr("cosine_similarity(tv, cv)"), 4))
          .withColumn("pr", row_number().over(wT))
          .filter(col("pr") <= nprobe)
          .select(col("tid"), col("tv"), col("cell"))
        val candY = yCells
          .join(srcCells, "cell")
          .withColumn("cos", round(expr("cosine_similarity(tv, sv)"), 6))
          .select("tid", "sid", "cos")
        val wX = Window.partitionBy("sid").orderBy(desc("cos"), asc("tid"))
        val aX = candX
          .withColumn("r", row_number().over(wX))
          .filter(col("r") <= 4)
          .groupBy("sid")
          .agg((sum(col("cos").cast("decimal(18,6)")).cast("double") / count(lit(1))).as("ax"))
        val wY = Window.partitionBy("tid").orderBy(desc("cos"), asc("sid"))
        val aY = candY
          .withColumn("r", row_number().over(wY))
          .filter(col("r") <= 4)
          .groupBy("tid")
          .agg((sum(col("cos").cast("decimal(18,6)")).cast("double") / count(lit(1))).as("ay"))
        val wM = Window.partitionBy("sid").orderBy(desc("margin"), asc("tid"))
        candX
          .join(aX, "sid")
          .join(aY, "tid")
          .withColumn("margin", round(lit(2.0) * col("cos") / (col("ax") + col("ay")), 6))
          .withColumn("rk", row_number().over(wM))
          .filter(col("rk") === 1)
          .select(col("sid").as("src_id"), col("tid").as("tgt_id"), col("cos"), col("margin"))
          .orderBy("src_id")
      },
      Some("""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        src AS (SELECT vec_id AS sid, label AS slabel, v AS sv FROM e WHERE label < 5),
        tgt AS (SELECT vec_id AS tid, label AS tlabel, v AS tv FROM e WHERE label >= 5),
        ut AS (SELECT tlabel, unnest(tv) AS x, generate_subscripts(tv, 1) AS pos FROM tgt),
        tc AS (SELECT tlabel AS cell, pos, avg(x) AS cx FROM ut GROUP BY 1, 2),
        tcv AS (SELECT cell, list(cx ORDER BY pos) AS cv FROM tc GROUP BY 1),
        us AS (SELECT slabel, unnest(sv) AS x, generate_subscripts(sv, 1) AS pos FROM src),
        sc AS (SELECT slabel AS cell, pos, avg(x) AS cx FROM us GROUP BY 1, 2),
        scv AS (SELECT cell, list(cx ORDER BY pos) AS cv FROM sc GROUP BY 1),
        xc AS (
          SELECT sid, sv, cell FROM (
            SELECT sid, sv, cell,
                   row_number() OVER (PARTITION BY sid ORDER BY
                     round(list_dot_product(sv, cv) /
                           sqrt(list_dot_product(sv, sv) * list_dot_product(cv, cv)), 4) DESC,
                     cell) AS pr
            FROM src CROSS JOIN tcv)
          WHERE pr <= 2),
        candx AS (
          SELECT xc.sid, t.tid,
                 round(list_dot_product(xc.sv, t.tv) /
                       sqrt(list_dot_product(xc.sv, xc.sv) * list_dot_product(t.tv, t.tv)), 6) AS cos
          FROM xc JOIN tgt t ON xc.cell = t.tlabel),
        yc AS (
          SELECT tid, tv, cell FROM (
            SELECT tid, tv, cell,
                   row_number() OVER (PARTITION BY tid ORDER BY
                     round(list_dot_product(tv, cv) /
                           sqrt(list_dot_product(tv, tv) * list_dot_product(cv, cv)), 4) DESC,
                     cell) AS pr
            FROM tgt CROSS JOIN scv)
          WHERE pr <= 2),
        candy AS (
          SELECT yc.tid, s.sid,
                 round(list_dot_product(yc.tv, s.sv) /
                       sqrt(list_dot_product(yc.tv, yc.tv) * list_dot_product(s.sv, s.sv)), 6) AS cos
          FROM yc JOIN src s ON yc.cell = s.slabel),
        ax AS (
          SELECT sid, CAST(sum(CAST(cos AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS ax
          FROM (SELECT sid, cos,
                       row_number() OVER (PARTITION BY sid ORDER BY cos DESC, tid) AS r
                FROM candx)
          WHERE r <= 4 GROUP BY sid),
        ay AS (
          SELECT tid, CAST(sum(CAST(cos AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS ay
          FROM (SELECT tid, cos,
                       row_number() OVER (PARTITION BY tid ORDER BY cos DESC, sid) AS r
                FROM candy)
          WHERE r <= 4 GROUP BY tid),
        m AS (
          SELECT c.sid, c.tid, c.cos,
                 round(2.0 * c.cos / (ax.ax + ay.ay), 6) AS margin
          FROM candx c JOIN ax ON c.sid = ax.sid JOIN ay ON c.tid = ay.tid),
        r AS (
          SELECT sid, tid, cos, margin,
                 row_number() OVER (PARTITION BY sid ORDER BY margin DESC, tid) AS rk
          FROM m)
        SELECT sid AS src_id, tid AS tgt_id, cos, margin
        FROM r WHERE rk = 1 ORDER BY src_id
      """)
    ),

    // --- embedding outlier detection: per-label centroid-cosine z ---
    // The embedding-QA alarm (mislabeled examples, encoder glitches,
    // corrupt vectors): within each label, score every vector's cosine to
    // the label centroid, then flag the tail by z-score against the
    // label's own cosine distribution — the relative criterion that works
    // whether a label is naturally tight or diffuse. Shuffle posture is
    // the knn_centroid family: one (label, pos)-keyed shuffle builds the
    // broadcast centroid table, cosines score map-side, and the moment
    // pass + z are keyed on the label (catalog-cardinality). Cross-engine
    // discipline: centroid cosines round at 4 dp (avg is engine-order FP;
    // the knn_centroid precedent), lift to EXACT 1e4-unit integers whose
    // label sums s1/s2 are order-independent, zero variance is the exact
    // min=max test (z = 0: a perfectly tight label has no outliers), and
    // the z chain is one identical correctly-rounded IEEE tree rounded at
    // 6 dp with vec_id tie-breaks. Top-3 LEAST-central per label emit.
    Q(
      "vec_outliers",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), col("label"), dbl(col("embedding")).as("v"))
        val cent = e
          .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("label", "pos")
          .agg(avg("x").as("cx"))
          .groupBy("label")
          .agg(
            transform(
              array_sort(collect_list(struct(col("pos"), col("cx")))),
              st => st.getField("cx")
            ).as("cv")
          )
          .select(col("label").as("clabel"), col("cv"))
        // Two consumers of the scored table (label moments + the z rows):
        // checkpoint, or the embedding scan + centroid join run twice.
        val scored = e
          .join(broadcast(cent), col("label") === col("clabel"))
          .withColumn("ccos", round(expr("cosine_similarity(v, cv)"), 4))
          // round() before the cast: the double product of a 4-dp value and
          // 10000 can sit an ulp below its integer, and a bare BIGINT cast
          // TRUNCATES in Spark but ROUNDS in DuckDB (the r7 lesson).
          .withColumn("m", round(col("ccos") * 10000).cast("long"))
          .select("label", "vec_id", "ccos", "m")
          .pipe(Checkpoints.checkpoint)
        val moments = scored
          .groupBy(col("label").as("mlabel"))
          .agg(
            count(lit(1)).as("n"),
            sum("m").as("s1"),
            sum(col("m") * col("m")).as("s2"),
            (max("m") === min("m")).as("flat")
          )
        val w = Window.partitionBy("label").orderBy(asc("z"), asc("vec_id"))
        scored
          .join(broadcast(moments), col("label") === col("mlabel"))
          .withColumn(
            "z",
            when(col("flat"), lit(0.0)).otherwise(
              round(
                (col("m").cast("double") - col("s1").cast("double") / col("n").cast("double")) /
                  sqrt(
                    (col("n").cast("double") * col("s2").cast("double") -
                      col("s1").cast("double") * col("s1").cast("double")) /
                      (col("n").cast("double") * (col("n").cast("double") - 1.0))
                  ),
                6
              )
            )
          )
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(
            col("label"),
            col("rank").cast("int").as("rank"),
            col("vec_id"),
            col("ccos").as("centroid_cos"),
            col("z")
          )
          .orderBy("label", "rank")
      },
      Some("""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        u AS (SELECT vec_id, label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e),
        c AS (SELECT label AS clabel, pos, avg(x) AS cx FROM u GROUP BY 1, 2),
        cvt AS (SELECT clabel, list(cx ORDER BY pos) AS cv FROM c GROUP BY 1),
        sc AS (
          SELECT e.label, e.vec_id,
                 round(list_dot_product(e.v, cvt.cv) /
                       sqrt(list_dot_product(e.v, e.v) * list_dot_product(cvt.cv, cvt.cv)), 4)
                   AS ccos
          FROM e JOIN cvt ON e.label = cvt.clabel),
        sm AS (SELECT label, vec_id, ccos, CAST(round(ccos * 10000) AS BIGINT) AS m FROM sc),
        mo AS (
          SELECT label AS mlabel, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(m) AS BIGINT) AS s1, CAST(sum(m * m) AS BIGINT) AS s2,
                 max(m) = min(m) AS flat
          FROM sm GROUP BY label),
        z AS (
          SELECT sm.label, sm.vec_id, sm.ccos,
                 CASE WHEN mo.flat THEN 0.0
                      ELSE round((CAST(sm.m AS DOUBLE) - CAST(mo.s1 AS DOUBLE) / mo.n)
                                 / sqrt((CAST(mo.n AS DOUBLE) * CAST(mo.s2 AS DOUBLE)
                                         - CAST(mo.s1 AS DOUBLE) * CAST(mo.s1 AS DOUBLE))
                                        / (CAST(mo.n AS DOUBLE) * (CAST(mo.n AS DOUBLE) - 1.0))), 6)
                 END AS z
          FROM sm JOIN mo ON sm.label = mo.mlabel),
        r AS (
          SELECT label, vec_id, ccos, z,
                 row_number() OVER (PARTITION BY label ORDER BY z ASC, vec_id ASC) AS rank
          FROM z)
        SELECT label, CAST(rank AS INTEGER) AS rank, vec_id, ccos AS centroid_cos, z
        FROM r WHERE rank <= 3 ORDER BY label, rank
      """)
    ),

    // --- top principal component: fixed-point power iteration ---
    // The embedding-QA drift detector: the dominant covariance direction
    // (and its explained-variance share) flags a collapsed or drifting
    // embedding space in one number per dimension. Iterative numerics are
    // the cross-engine trap (a floating-point power iteration drifts with
    // partition order — the q_pagerank lesson), so EVERYTHING here is
    // exact arithmetic until two final IEEE readouts:
    //   - inputs quantize once to 1e4-unit BIGINTs (round-before-cast);
    //   - the scatter matrix is the exact integer identity
    //     S = n·Σqqᵀ − (Σq)(Σq)ᵀ (covariance × n², so no mean division);
    //   - three power-iteration steps run over the 4096-row S table with
    //     DECIMAL products and a sign-aware renormalisation
    //     v ← sign(u)·((|u|·1e6) div max|u|) — Spark `div` equals DuckDB
    //     HUGEINT `//` on the non-negative operands we feed them;
    //   - loadings (v/1e6) and the Rayleigh share (vᵀSv/vᵀv)/tr(S) are
    //     single identical IEEE chains over exact integers, rounded 6 dp.
    // Scale: the ONLY volume-bearing stage is ONE imperative mapPartitions
    // pass (scatterFrom — the MLlib Gramian pattern) that accumulates
    // count, Σq and the upper-triangle Σqqᵀ into flat local arrays and
    // emits d(d+1)/2 + d + 1 partial rows per PARTITION — the corpus is
    // never exploded d²-wide and never joined; qi·qj ≤ 3.3e7 so the Long
    // partials hold past 10¹⁰ vectors. Everything downstream (S assembly,
    // iterations) is metadata-sized (≤ d² = 4096 rows) with broadcast
    // joins; S checkpoints once for the three iteration joins + trace +
    // Rayleigh numerator.
    Q(
      "vec_pca",
      (s, d) => {
        // Quantize + scatter via scatterFor: fresh checkpoints per
        // invocation by default, the pinned per-dir cache under
        // spark.graft.pca.reuseScatter=true (serving-shaped repeats).
        // The iteration + readout half is the shared funnel
        // (pcaFromScatter / pcaFromPartials), so the streaming drift
        // monitor (Engine.pcaDriftFrom) reproduces this query's
        // arithmetic LITERALLY. Fresh invocations hand the funnel the
        // checkpointed partial aggregate directly (the assembly identity
        // folds into the same task); reuse mode keeps consuming the
        // pinned ASSEMBLED S so cache entries stay the d²-row matrix.
        scatterFor(s, d) match {
          case Left(agg) => pcaFromPartials(agg)
          case Right(scatS) => pcaFromScatter(scatS)
        }
      },
      Some("""
        WITH base AS (
          SELECT [CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT) FOR x IN embedding] AS q,
                 vec_id
          FROM embeddings),
        e AS (
          SELECT vec_id, generate_subscripts(q, 1) - 1 AS i, unnest(q) AS qi FROM base),
        raw AS (
          SELECT a.i AS i, b.i AS j, CAST(sum(a.qi * b.qi) AS DECIMAL(20,0)) AS sraw
          FROM e a JOIN e b USING (vec_id) GROUP BY 1, 2),
        sums AS (SELECT i, CAST(sum(qi) AS DECIMAL(16,0)) AS s FROM e GROUP BY 1),
        nn AS (SELECT CAST(count(*) AS DECIMAL(12,0)) AS n FROM base),
        S AS (
          SELECT r.i, r.j, CAST(nn.n * r.sraw - si.s * sj.s AS DECIMAL(26,0)) AS sij
          FROM raw r CROSS JOIN nn
          JOIN sums si ON si.i = r.i JOIN sums sj ON sj.i = r.j),
        v0 AS (SELECT i, CAST(1000000 AS HUGEINT) AS v FROM sums),
        u1 AS (SELECT S.i, sum(CAST(S.sij AS HUGEINT) * v.v) AS u
               FROM S JOIN v0 v ON v.i = S.j GROUP BY S.i),
        m1 AS (SELECT greatest(max(abs(u)), CAST(1 AS HUGEINT)) AS m FROM u1),
        v1 AS (SELECT i, (CASE WHEN u < 0 THEN -1 ELSE 1 END)
                         * ((abs(u) * 1000000) // m) AS v
               FROM u1 CROSS JOIN m1),
        u2 AS (SELECT S.i, sum(CAST(S.sij AS HUGEINT) * v.v) AS u
               FROM S JOIN v1 v ON v.i = S.j GROUP BY S.i),
        m2 AS (SELECT greatest(max(abs(u)), CAST(1 AS HUGEINT)) AS m FROM u2),
        v2 AS (SELECT i, (CASE WHEN u < 0 THEN -1 ELSE 1 END)
                         * ((abs(u) * 1000000) // m) AS v
               FROM u2 CROSS JOIN m2),
        u3 AS (SELECT S.i, sum(CAST(S.sij AS HUGEINT) * v.v) AS u
               FROM S JOIN v2 v ON v.i = S.j GROUP BY S.i),
        m3 AS (SELECT greatest(max(abs(u)), CAST(1 AS HUGEINT)) AS m FROM u3),
        v3 AS (SELECT i, (CASE WHEN u < 0 THEN -1 ELSE 1 END)
                         * ((abs(u) * 1000000) // m) AS v
               FROM u3 CROSS JOIN m3),
        w AS (SELECT S.i, sum(CAST(S.sij AS HUGEINT) * v.v) AS w
              FROM S JOIN v3 v ON v.i = S.j GROUP BY S.i),
        scal AS (
          SELECT sum(v3.v * w.w) AS num, sum(v3.v * v3.v) AS den
          FROM v3 JOIN w ON w.i = v3.i),
        tr AS (SELECT CAST(sum(sij) AS DECIMAL(28,0)) AS tr FROM S WHERE i = j)
        SELECT CAST(v3.i AS INTEGER) AS dim,
               round(CAST(v3.v AS DOUBLE) / 1000000.0, 6) AS loading,
               round((CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
                     / CAST(tr AS DOUBLE), 6) AS ev_share
        FROM v3 CROSS JOIN scal CROSS JOIN tr ORDER BY dim
      """)
    ),

    // --- cluster quality: per-label cohesion vs nearest-centroid separation ---
    // The one-table answer to "are my labels/clusters actually separated?":
    // for each label, the mean cosine of its members to their own centroid
    // (cohesion), the most-confusable other label and the two centroids'
    // cosine (separation), and the margin between them — a collapsed or
    // mislabeled cluster shows a margin near (or below) zero. FP
    // discipline is the vec_outliers recipe: per-vector centroid cosines
    // round at 4 dp THEN lift to exact 1e4-unit integers (round-before-
    // cast), label sums are order-independent BIGINTs, the mean is the
    // sign-aware half-up integer division, and centroid-pair cosines round
    // at 4 dp before the exact max/tie-break. Plan: centroids are one
    // (label, pos)-keyed shuffle; member scoring is map-side against the
    // broadcast k×d centroid table; the pair table is k² rows — everything
    // after the first aggregate is metadata-sized at any corpus size.
    Q(
      "vec_cluster_quality",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), col("label"), dbl(col("embedding")).as("v"))
        val cent = e
          .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("label", "pos")
          .agg(avg("x").as("cx"))
          .groupBy("label")
          .agg(
            transform(
              array_sort(collect_list(struct(col("pos"), col("cx")))),
              st => st.getField("cx")
            ).as("cv")
          )
          // Three consumers (member scoring + both pair sides): checkpoint,
          // or the centroid build runs once per consumer.
          .pipe(Checkpoints.checkpoint)
        val coh = e
          .join(broadcast(cent.select(col("label").as("clabel"), col("cv"))),
            col("label") === col("clabel"))
          .withColumn("ccos", round(expr("cosine_similarity(v, cv)"), 4))
          .withColumn("m", round(col("ccos") * 10000).cast("long"))
          .groupBy("label")
          .agg(count(lit(1)).as("n_vecs"), sum("m").as("s4"))
          .withColumn(
            "coh4",
            expr(
              "CASE WHEN s4 >= 0 THEN (2 * s4 + n_vecs) div (2 * n_vecs) " +
                "ELSE -((2 * (-s4) + n_vecs) div (2 * n_vecs)) END"
            )
          )
        val pairs = cent
          .select(col("label"), col("cv"))
          .join(
            broadcast(cent.select(col("label").as("olabel"), col("cv").as("ov"))),
            col("label") =!= col("olabel")
          )
          .withColumn("pcos", round(expr("cosine_similarity(cv, ov)"), 4))
          .withColumn("sep4", round(col("pcos") * 10000).cast("long"))
        val wn = Window.partitionBy("label").orderBy(desc("sep4"), asc("olabel"))
        val nearest = pairs
          .withColumn("rk", row_number().over(wn))
          .filter(col("rk") === 1)
          .select(col("label"), col("olabel").as("nearest_label"), col("sep4"))
        coh
          .join(broadcast(nearest), "label")
          .select(
            col("label"),
            col("n_vecs"),
            round(col("coh4").cast("double") / lit(10000.0), 6).as("cohesion"),
            col("nearest_label"),
            round(col("sep4").cast("double") / lit(10000.0), 6).as("separation"),
            round((col("coh4") - col("sep4")).cast("double") / lit(10000.0), 6).as("margin")
          )
          .orderBy("label")
      },
      Some("""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        u AS (SELECT vec_id, label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e),
        c AS (SELECT label AS clabel, pos, avg(x) AS cx FROM u GROUP BY 1, 2),
        cvt AS (SELECT clabel, list(cx ORDER BY pos) AS cv FROM c GROUP BY 1),
        sc AS (
          SELECT e.label,
                 CAST(round(round(list_dot_product(e.v, cvt.cv) /
                       sqrt(list_dot_product(e.v, e.v) * list_dot_product(cvt.cv, cvt.cv)), 4)
                       * 10000) AS BIGINT) AS m
          FROM e JOIN cvt ON e.label = cvt.clabel),
        coh AS (
          SELECT label, CAST(count(*) AS BIGINT) AS n_vecs, CAST(sum(m) AS BIGINT) AS s4
          FROM sc GROUP BY 1),
        ch AS (
          SELECT label, n_vecs,
                 CASE WHEN s4 >= 0 THEN (2 * s4 + n_vecs) // (2 * n_vecs)
                      ELSE -((2 * (-s4) + n_vecs) // (2 * n_vecs)) END AS coh4
          FROM coh),
        pr AS (
          SELECT a.clabel AS label, b.clabel AS olabel,
                 CAST(round(round(list_dot_product(a.cv, b.cv) /
                       sqrt(list_dot_product(a.cv, a.cv) * list_dot_product(b.cv, b.cv)), 4)
                       * 10000) AS BIGINT) AS sep4
          FROM cvt a JOIN cvt b ON a.clabel <> b.clabel),
        nr AS (
          SELECT label, olabel AS nearest_label, sep4,
                 row_number() OVER (PARTITION BY label ORDER BY sep4 DESC, olabel ASC) AS rk
          FROM pr)
        SELECT ch.label, ch.n_vecs,
               round(CAST(coh4 AS DOUBLE) / 10000.0, 6) AS cohesion,
               nr.nearest_label,
               round(CAST(nr.sep4 AS DOUBLE) / 10000.0, 6) AS separation,
               round(CAST(coh4 - nr.sep4 AS DOUBLE) / 10000.0, 6) AS margin
        FROM ch JOIN nr ON nr.label = ch.label AND nr.rk = 1
        ORDER BY ch.label
      """)
    ),

    // --- exact-duplicate embeddings: the pipeline-bug detector ---
    // Bit-identical vectors in an embedding table almost always mean an
    // upstream bug (a stuck encoder, a repeated batch, a join fan-out) —
    // semantic near-dups are expected, exact dups are not. Vectors
    // quantize at 1e6 (round-before-cast) and hash to an md5 group key in
    // scan codegen — one map-side expression, then ONE partial-aggregated
    // groupBy onto distinct-content cardinality. The same shape as
    // media_dedup/dedup_exact, completing exact-dedup across all three
    // payload types (text / media / vectors).
    Q(
      "vec_exact_dups",
      (s, d) => {
        t(s, d, "embeddings")
          .select(
            col("vec_id"),
            expr(
              "md5(array_join(transform(embedding, " +
                "x -> CAST(CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS STRING)), ','))"
            ).as("content_hash")
          )
          .groupBy("content_hash")
          .agg(min("vec_id").as("keep_id"), count(lit(1)).as("n_copies"))
          .orderBy("content_hash")
      },
      Some("""
        WITH h AS (
          SELECT vec_id,
                 md5(array_to_string(
                   [CAST(CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS VARCHAR)
                    FOR x IN embedding], ',')) AS content_hash
          FROM embeddings)
        SELECT content_hash, min(vec_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
        FROM h GROUP BY 1 ORDER BY content_hash
      """)
    ),

    // --- ANN accuracy audit: recall@5 of every approximate method vs the
    // exact brute-force ground truth, swept across each method's tuning
    // knob (LSH planes 4/6/8, quantized candidate budget 8/16/32, IVF's
    // own-cell probe). A 100 TB user tunes nProbe/bands against THIS
    // table instead of flying blind — approximate search without a recall
    // contract is the classic silent-quality failure. Everything is exact
    // integer counting (hits, totals) except the one final IEEE division,
    // so the oracle is hash-exact. Scale shape: the ground truth and every
    // per-setting top-k are ≤ |queries|·k rows (metadata); the only
    // volume-bearing stages are the same broadcast-query map-side scoring
    // streams the underlying knn_* queries already run; shared inputs
    // (scan, LSH bits, quantized candidates) are checkpointed once, and
    // sweeping a knob reuses them instead of rescanning the corpus.
    Q(
      "knn_recall",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val k = 5
        // Q.widen (r15): the single-file scan plans ONE partition and all
        // seven retrieval variants' broadcast-join scoring inherits it —
        // the whole audit ran serially on one core (profiled: 33 stages,
        // nearly all 1-task, ~3 s summed run at sf0.1).
        val e = Checkpoints.checkpoint(
          Q.widen(
            t(s, d, "embeddings")
              .select(col("vec_id"), col("label"), dbl(col("embedding")).as("v"))
          )
        )
        val q = e
          .filter(col("vec_id") < 8)
          .select(col("vec_id").as("qid"), col("label").as("qlabel"), col("v").as("qv"))
        val wCos = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
        // Ground truth: the knn_brute top-k (rounded-cosine rank, vec_id
        // tie-break — identical membership per engine).
        val truth = Checkpoints.checkpoint(
          e.join(broadcast(q), col("vec_id") =!= col("qid"))
            .withColumn("cos", round(expr("cosine_similarity(qv, v)"), 6))
            .withColumn("rank", row_number().over(wCos))
            .filter(col("rank") <= k)
            .select("qid", "vec_id")
        )
        // IVF (label cells, probe = own cell) — the knn_ivf retrieval set.
        val ivfTop = e
          .join(broadcast(q), col("label") === col("qlabel") && col("vec_id") =!= col("qid"))
          .withColumn("cos", round(expr("cosine_similarity(qv, v)"), 6))
          .withColumn("rank", row_number().over(wCos))
          .filter(col("rank") <= k)
          .select("qid", "vec_id")
        // LSH sweep: derive 8 deterministic hyperplane bits ONCE, then a
        // setting nP reads the first nP bits — the knn_lsh plane recipe.
        val nMax = 8
        val planes: Seq[Seq[Double]] = (0 until nMax).map { p =>
          (0 until 64).map { i =>
            val md = java.security.MessageDigest.getInstance("MD5")
            val hex = md.digest(s"p${p}_$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
            ((java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2001) - 1000) / 1000.0
          }
        }
        val bits = Checkpoints.checkpoint(
          (0 until nMax).foldLeft(e.drop("label")) { (df, p) =>
            val proj = aggregate(
              zip_with(col("v"), typedlit(planes(p)), (x, w) => x * w),
              lit(0.0),
              (acc, x) => acc + x
            )
            df.withColumn(s"bit_$p", when(proj >= 0, 1).otherwise(0))
          }
        )
        val lshTops = Seq(4, 6, 8).map { nP =>
          val bk = bits.withColumn(
            "bucket",
            (0 until nP).map(p => col(s"bit_$p") * (1 << p)).reduce(_ + _)
          )
          val qb = bk
            .filter(col("vec_id") < 8)
            .select(col("vec_id").as("qid"), col("v").as("qv"), col("bucket").as("qbucket"))
          val top = bk
            .join(broadcast(qb), col("bucket") === col("qbucket") && col("vec_id") =!= col("qid"))
            .withColumn("cos", round(expr("cosine_similarity(qv, v)"), 6))
            .withColumn("rank", row_number().over(wCos))
            .filter(col("rank") <= k)
            .select("qid", "vec_id")
          ("lsh", nP, top)
        }
        // Quantized sweep: the knn_quantized int8 candidate stream ranked
        // ONCE at the max budget; a setting b filters crank <= b.
        val eq = e
          .drop("label")
          .withColumn("amax", array_max(transform(col("v"), x => abs(x))))
          .filter(col("amax") > 0)
          .withColumn("scale", lit(127.0) / col("amax"))
          .withColumn("q8", transform(col("v"), x => round(x * col("scale")).cast("long")))
          .drop("amax", "scale")
        val qq = eq
          .filter(col("vec_id") < 8)
          .select(col("vec_id").as("qid"), col("v").as("qv"), col("q8").as("qq"))
        val wIdot = Window.partitionBy("qid").orderBy(desc("idot"), asc("vec_id"))
        val cand = Checkpoints.checkpoint(
          eq.join(broadcast(qq), col("vec_id") =!= col("qid"))
            .withColumn(
              "idot",
              expr("aggregate(zip_with(q8, qq, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, x) -> acc + x)")
            )
            .withColumn("crank", row_number().over(wIdot))
            .filter(col("crank") <= 32)
            .withColumn("cos", round(expr("cosine_similarity(qv, v)"), 6))
        )
        val quantTops = Seq(8, 16, 32).map { b =>
          val top = cand
            .filter(col("crank") <= b)
            .withColumn("rank", row_number().over(wCos))
            .filter(col("rank") <= k)
            .select("qid", "vec_id")
          ("quantized", b, top)
        }
        // hits = |approx-top-k ∩ truth| per (method, setting); a global
        // count aggregate yields an explicit hits=0 row when a setting's
        // retrieval set is empty (sparse high-plane LSH buckets).
        val variants = Seq(("ivf", 1, ivfTop)) ++ lshTops ++ quantTops
        val hitRows = variants
          .map { case (m, set, df) =>
            df.join(truth, Seq("qid", "vec_id"))
              .agg(count(lit(1)).as("hits"))
              .select(lit(m).as("method"), lit(set).cast("int").as("setting"), col("hits"))
          }
          .reduce(_ union _)
        val tot = truth.agg(count(lit(1)).as("total"))
        hitRows
          .crossJoin(broadcast(tot))
          .withColumn("recall", col("hits").cast("double") / col("total"))
          .select("method", "setting", "hits", "total", "recall")
          .orderBy("method", "setting")
      },
      Some("""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv FROM e WHERE vec_id < 8),
        p AS (
          SELECT qid, vec_id,
                 round(list_dot_product(qv, v) /
                       sqrt(list_dot_product(qv, qv) * list_dot_product(v, v)), 6) AS cos
          FROM e CROSS JOIN q WHERE vec_id <> qid),
        truth AS (
          SELECT qid, vec_id FROM (
            SELECT qid, vec_id,
                   row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rank
            FROM p)
          WHERE rank <= 5),
        tot AS (SELECT count(*) AS total FROM truth),
        ivfp AS (
          SELECT q.qid, e.vec_id,
                 round(list_dot_product(q.qv, e.v) /
                       sqrt(list_dot_product(q.qv, q.qv) * list_dot_product(e.v, e.v)), 6) AS cos
          FROM e JOIN q ON e.label = q.qlabel AND e.vec_id <> q.qid),
        ivf AS (
          SELECT 'ivf' AS method, 1 AS setting, qid, vec_id FROM (
            SELECT qid, vec_id,
                   row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rank
            FROM ivfp)
          WHERE rank <= 5),
        planes AS (
          SELECT pp.p,
                 list_transform(range(0, 64),
                   i -> ((('0x' || substr(md5('p' || CAST(pp.p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 15))::BIGINT % 2001) - 1000) / 1000.0) AS w
          FROM range(0, 8) pp(p)),
        bits AS (
          SELECT e.vec_id, pl.p,
                 CASE WHEN list_dot_product(e.v, pl.w) >= 0 THEN 1 ELSE 0 END AS bit
          FROM e CROSS JOIN planes pl),
        lset(np) AS (VALUES (4), (6), (8)),
        bk AS (
          SELECT vec_id, np,
                 CAST(sum(CASE WHEN p < np THEN (bit << p) ELSE 0 END) AS INTEGER) AS bucket
          FROM bits CROSS JOIN lset GROUP BY vec_id, np),
        bc AS (SELECT bk.vec_id, bk.np, bk.bucket, e.v FROM bk JOIN e USING (vec_id)),
        lq AS (SELECT vec_id AS qid, np, bucket AS qbucket, v AS qv FROM bc WHERE vec_id < 8),
        lp AS (
          SELECT lq.np, lq.qid, bc.vec_id,
                 round(list_dot_product(lq.qv, bc.v) /
                       sqrt(list_dot_product(lq.qv, lq.qv) * list_dot_product(bc.v, bc.v)), 6) AS cos
          FROM bc JOIN lq ON bc.np = lq.np AND bc.bucket = lq.qbucket AND bc.vec_id <> lq.qid),
        lsh AS (
          SELECT 'lsh' AS method, np AS setting, qid, vec_id FROM (
            SELECT np, qid, vec_id,
                   row_number() OVER (PARTITION BY np, qid ORDER BY cos DESC, vec_id ASC) AS rank
            FROM lp)
          WHERE rank <= 5),
        v8 AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM e),
        q8 AS (
          SELECT vec_id, v,
                 list_transform(v, x -> CAST(round(x * (127.0 / amax)) AS BIGINT)) AS q
          FROM v8 WHERE amax > 0),
        qq AS (SELECT vec_id AS qid, v AS qv, q AS qcode FROM q8 WHERE vec_id < 8),
        qscored AS (
          SELECT qq.qid, q8.vec_id, q8.v, qq.qv,
                 CAST(list_dot_product(
                        list_transform(q8.q, x -> CAST(x AS DOUBLE)),
                        list_transform(qq.qcode, x -> CAST(x AS DOUBLE))) AS BIGINT) AS idot
          FROM q8 CROSS JOIN qq WHERE q8.vec_id <> qq.qid),
        qcand AS (
          SELECT *, row_number() OVER (PARTITION BY qid ORDER BY idot DESC, vec_id ASC) AS crank
          FROM qscored),
        qset(b) AS (VALUES (8), (16), (32)),
        qrer AS (
          SELECT qset.b, qcand.qid, qcand.vec_id,
                 round(list_dot_product(qcand.qv, qcand.v) /
                       sqrt(list_dot_product(qcand.qv, qcand.qv) * list_dot_product(qcand.v, qcand.v)), 6) AS cos
          FROM qcand CROSS JOIN qset WHERE qcand.crank <= qset.b),
        quant AS (
          SELECT 'quantized' AS method, b AS setting, qid, vec_id FROM (
            SELECT b, qid, vec_id,
                   row_number() OVER (PARTITION BY b, qid ORDER BY cos DESC, vec_id ASC) AS rank
            FROM qrer)
          WHERE rank <= 5),
        allsettings AS (
          SELECT * FROM (VALUES ('ivf', 1), ('lsh', 4), ('lsh', 6), ('lsh', 8),
                                ('quantized', 8), ('quantized', 16), ('quantized', 32)) s(method, setting)),
        tops AS (
          SELECT * FROM ivf UNION ALL SELECT * FROM lsh UNION ALL SELECT * FROM quant),
        hits AS (
          SELECT t.method, t.setting, count(*) AS hits
          FROM tops t JOIN truth USING (qid, vec_id) GROUP BY t.method, t.setting)
        SELECT a.method, a.setting, CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits, tot.total,
               CAST(COALESCE(h.hits, 0) AS DOUBLE) / tot.total AS recall
        FROM allsettings a LEFT JOIN hits h ON a.method = h.method AND a.setting = h.setting
        CROSS JOIN tot
        ORDER BY a.method, a.setting
      """)
    )
  )

  /** Serving-shaped reuse for repeated `vec_pca` over an UNCHANGED
    * embeddings dir: the eager quantize + scatter checkpoints re-run per
    * invocation by design (correct for a changing corpus, ~24% of the warm
    * bench total when the corpus never changes between calls). With
    * `spark.graft.pca.reuseScatter=true` the materialized d²-row scatter
    * matrix is cached per (application, dir) in a PINNED localCheckpoint
    * that `Checkpoints.release()` does not touch — trivially small
    * (≤ 4096 rows; MEMORY_AND_DISK, so eviction spills rather than loses
    * it). Entries are guarded by a METADATA-ONLY content fingerprint of
    * the embeddings file listing (names + lengths + mtimes — one
    * `listStatus`, no data pass): an in-place rewrite of the dir changes
    * the fingerprint, the stale pinned checkpoint is unpersisted and the
    * scatter rebuilt, so the serving shape can never return results for
    * data that is no longer on disk. Still opt-in (the fresh path is the
    * default); results are bit-identical to the uncached path
    * (PcaReuseSpec asserts equality across release() AND that an
    * overwrite invalidates). [[releaseScatterCache]] frees every pinned
    * entry and is wired into [[Checkpoints.releaseAll]].
    */
  private val scatterCache =
    scala.collection.mutable.HashMap.empty[String, (String, DataFrame)]

  private[graft] def pcaScatterCacheSize: Int = scatterCache.synchronized(scatterCache.size)

  /** Unpersist and forget every pinned scatter (session drain point). */
  def releaseScatterCache(): Unit = scatterCache.synchronized {
    scatterCache.values.foreach { case (_, df) =>
      try df.unpersist(blocking = false)
      catch { case _: Exception => () }
    }
    scatterCache.clear()
  }

  /** Fingerprint the dir's embeddings file listing — metadata only. */
  private def embFingerprint(s: SparkSession, d: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$d/embeddings.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val entries = fs
      .listStatus(p)
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
      .sortBy(_.getPath.getName)
      .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
    entries.mkString(";")
  }

  /** Left(checkpointed partial aggregate) on the fresh path — the funnel
    * assembles S itself, so no assembly joins and no second
    * materialization run per invocation — or Right(pinned assembled S)
    * in reuse mode, where the cache entry must stay the d²-row matrix
    * the old contract pinned (PcaReuseSpec asserts the two paths emit
    * bit-identical results).
    */
  private def scatterFor(s: SparkSession, d: String): Either[DataFrame, DataFrame] = {
    // No checkpoint: scatterFrom consumes the quantized corpus in exactly
    // ONE mapPartitions pass, so materializing it first would only add a
    // write+read of the whole corpus.
    def quantized = t(s, d, "embeddings")
      .select(
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))")
          .as("q")
      )
    val reuse =
      try s.conf.get("spark.graft.pca.reuseScatter", "false").toBoolean
      catch { case _: IllegalArgumentException => false }
    if (!reuse)
      Left(
        scatterPartials(quantized)
          .groupBy("i", "j")
          .agg(sum("p").as("p"))
          // ≤ d(d+1)/2 + d + 1 rows; the one materialization that
          // guarantees the corpus pass runs exactly once.
          .pipe(graft.queries.Checkpoints.checkpoint)
      )
    else Right {
      val key = s"${s.sparkContext.applicationId}|$d"
      val fp = embFingerprint(s, d)
      val hit = scatterCache.synchronized {
        scatterCache.get(key).collect { case (oldFp, df) if oldFp == fp => df }
      }
      hit.getOrElse {
        // Build OUTSIDE the lock: the eager localCheckpoint is a full
        // Spark job, and holding the global lock through it would
        // serialize concurrent reuse-mode PCA queries even across
        // unrelated embeddings dirs (advisor r11). Pinned = NOT
        // scope-tracked: materializes now, while the scope-tracked
        // quantized/sums checkpoints are still alive; they free with the
        // invoking query, the ≤4096-row S survives the session.
        val fresh = scatterFrom(quantized).localCheckpoint(true)
        scatterCache.synchronized {
          scatterCache.get(key) match {
            case Some((oldFp, df)) if oldFp == fp =>
              // Another thread won the same build race — keep its entry
              // (results are identical), drop our duplicate pin.
              try fresh.unpersist(blocking = false)
              catch { case _: Exception => () }
              df
            case stale =>
              // First sighting, or an in-place rewrite: drop the stale
              // pinned checkpoint (if any) and swap ours in.
              stale.foreach { case (_, old) =>
                try old.unpersist(blocking = false)
                catch { case _: Exception => () }
              }
              scatterCache.put(key, (fp, fresh))
              if (scatterCache.size > 8)
                org.slf4j.LoggerFactory
                  .getLogger(getClass)
                  .warn(
                    s"graft: pca scatter cache holds ${scatterCache.size} pinned entries " +
                      "(one per embeddings dir) — call Similarity.releaseScatterCache() " +
                      "if dirs are transient"
                  )
              fresh
          }
        }
      }
    }
  }

  /** Exact integer scatter matrix S = n·Σqqᵀ − (Σq)(Σq)ᵀ (covariance × n²,
    * so no mean division ever happens) from a frame with one quantized
    * BIGINT-array column `q` — the volume-bearing stage of `vec_pca`.
    *
    * ONE imperative pass per partition (the classic MLlib
    * `RowMatrix.computeGramianMatrix` pattern — genuine per-partition
    * accumulation, the case mapPartitions exists for): the row count, the
    * per-dimension sums and the UPPER-TRIANGLE outer product accumulate
    * into flat local Long arrays, so the corpus emits d(d+1)/2 + d + 1
    * partial rows per PARTITION instead of d² rows per VECTOR, and what
    * used to be three separate corpus passes (count, Σq, Σqqᵀ via a
    * d²-wide explode) folds into one. The tiny (i, j)-keyed aggregate that
    * merges partitions checkpoints once for its four consumers below, so
    * the pass runs exactly once. All arithmetic stays exact and
    * order-independent: Long partials sum per partition then across
    * partitions — the same total, in any order, as the old explode plan —
    * and |qi·qj| ≤ 3.3e7 for unit-norm inputs at the 1e4 quantization
    * bounds a partition at ~2.8e11 rows before Long overflow, far past
    * any real partition. The DECIMAL lift happens once, on the d²-row
    * result.
    */
  def scatterFrom(quantized: DataFrame): DataFrame =
    scatterAssemble(
      scatterPartials(quantized)
        .groupBy("i", "j")
        .agg(sum("p").as("p"))
        // ≤ d(d+1)/2 + d + 1 rows; materializing here guarantees the
        // corpus pass runs ONCE for the four assembly consumers.
        .pipe(graft.queries.Checkpoints.checkpoint)
    )

  /** Three power-iteration steps + the (dim, loading, ev_share) readout
    * over a MATERIALIZED scatter matrix (the `vec_pca` query's iteration
    * half, factored out so the streaming drift monitor runs the literally
    * same arithmetic over its merged cross-batch scatter).
    *
    * Optimization-round restructure (r15, guide §1.2/§5 — the driver
    * should do almost no work, and this stage was ALL driver work): the
    * iterations are metadata math over ≤ d² = 4096 rows, but the old
    * declarative form ran them as ~25 Spark jobs (three join+aggregate
    * steps, each with its own broadcast build, plus v3 checkpoint,
    * Rayleigh, trace) — at sf0.1 the stages summed to 0.75 s of a 2.2 s
    * wall, the rest pure driver planning/scheduling (measured with the
    * Profile listener). The d²-row table now funnels through ONE
    * single-partition mapPartitions task that runs the identical
    * fixed-point arithmetic in unbounded BigInteger — exact integer ops
    * are reorder-safe, so every intermediate equals the old DECIMAL
    * column values digit-for-digit — and emits (i, v3, num, den, tr) raw;
    * the two FP-sensitive readouts (decimal→double casts, the IEEE
    * divisions, round 6 dp) stay in the LITERAL same Spark expressions as
    * before, so the emitted doubles are bit-identical. The funnel is an
    * Exchange SinglePartition fed by the caller's materialized aggregate
    * — the bounded shape PlanSpec's single-partition guard admits; the
    * volume-bearing scatter pass above is untouched.
    */
  def pcaFromScatter(scat: DataFrame): DataFrame =
    pcaFunnel(
      scat.select(col("i").cast("int"), col("j").cast("int"), col("sij").cast("string")),
      assembled = true
    )

  /** The same iteration + readout straight off the MERGED (i, j, p)
    * partial rows ([[scatterPartials]] key contract), folding the exact
    * integer assembly S = n·Σqqᵀ − (Σq)(Σq)ᵀ into the same single
    * funnel task — the declarative [[scatterAssemble]] ran three
    * broadcast joins (each its own job + broadcast build) to compute a
    * pure integer identity over ≤ d² metadata rows. Callers pass the
    * checkpointed aggregate; the batch query and the streaming drift
    * monitor both route here. [[scatterAssemble]] stays for consumers
    * that need S itself.
    */
  def pcaFromPartials(agg: DataFrame): DataFrame =
    pcaFunnel(
      agg.select(col("i").cast("int"), col("j").cast("int"), col("p").cast("string")),
      assembled = false
    )

  /** Shared single-task fixed-point funnel. Input rows are (i, j, value)
    * strings: either the assembled S entries (`assembled = true`, full
    * matrix or upper triangle — entries land where they fall) or the raw
    * partial rows ((-1,-1,n), (i,-1,Σqᵢ), upper-triangle (i,j,Σqᵢqⱼ)).
    * All arithmetic until the final readout is unbounded BigInteger —
    * exact and reorder-safe, so every intermediate equals the old
    * DECIMAL column values digit-for-digit (BigInteger.divide truncates
    * toward zero ≡ Spark's integral `div` on the non-negative operands
    * fed here); the FP-sensitive readouts (decimal→double casts, IEEE
    * divisions, round 6 dp) stay in the literal same Spark expressions
    * as the old declarative plan, so the emitted doubles are
    * bit-identical.
    */
  private def pcaFunnel(rows3: DataFrame, assembled: Boolean): DataFrame = {
    val spark = rows3.sparkSession
    import spark.implicits._
    val raw = rows3
      .as[(Int, Int, String)]
      .repartition(1)
      .mapPartitions { it =>
        import java.math.BigInteger
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val zero = BigInteger.ZERO
          val d = rows.iterator.map(x => math.max(x._1, x._2)).max + 1
          val s = Array.ofDim[BigInteger](d, d)
          if (assembled) {
            rows.foreach { case (i, j, v) => s(i)(j) = new BigInteger(v) }
          } else {
            var n = zero
            val sums = Array.fill(d)(zero)
            val sraw = Array.ofDim[BigInteger](d, d)
            rows.foreach {
              case (-1, -1, v) => n = new BigInteger(v)
              case (i, -1, v) => sums(i) = new BigInteger(v)
              case (i, j, v) => sraw(i)(j) = new BigInteger(v)
            }
            // S is symmetric; partials carry i ≤ j only — mirror, then
            // S_ij = n·sraw_ij − s_i·s_j (the scatterAssemble identity).
            var i = 0
            while (i < d) {
              var j = i
              while (j < d) {
                val r = if (sraw(i)(j) == null) zero else sraw(i)(j)
                val sij = n.multiply(r).subtract(sums(i).multiply(sums(j)))
                s(i)(j) = sij
                s(j)(i) = sij
                j += 1
              }
              i += 1
            }
          }
          def sv(i: Int, j: Int): BigInteger = { val x = s(i)(j); if (x == null) zero else x }
          val million = BigInteger.valueOf(1000000L)
          def mult(v: Array[BigInteger]): Array[BigInteger] =
            Array.tabulate(d) { i =>
              var acc = zero
              var j = 0
              while (j < d) { acc = acc.add(sv(i, j).multiply(v(j))); j += 1 }
              acc
            }
          def renorm(u: Array[BigInteger]): Array[BigInteger] = {
            var m = BigInteger.ONE
            u.foreach { x => val a = x.abs; if (a.compareTo(m) > 0) m = a }
            u.map { x =>
              val q = x.abs.multiply(million).divide(m)
              if (x.signum < 0) q.negate else q
            }
          }
          var v = Array.fill(d)(million)
          var k = 0
          while (k < 3) { v = renorm(mult(v)); k += 1 }
          val w = mult(v)
          var num = zero; var den = zero; var tr = zero
          var i = 0
          while (i < d) {
            num = num.add(v(i).multiply(w(i)))
            den = den.add(v(i).multiply(v(i)))
            tr = tr.add(sv(i, i))
            i += 1
          }
          Iterator.range(0, d).map { i =>
            (i, v(i).longValueExact(), num.toString, den.toString, tr.toString)
          }
        }
      }
      .toDF("i", "v", "num", "den", "tr")
    raw
      .select(
        col("i").cast("int").as("dim"),
        round(col("v").cast("double") / lit(1000000.0), 6).as("loading"),
        round(
          (col("num").cast("decimal(38,0)").cast("double")
            / col("den").cast("decimal(22,0)").cast("double"))
            / col("tr").cast("decimal(28,0)").cast("double"),
          6
        ).as("ev_share")
      )
      .orderBy("dim")
  }

  /** Assemble S = n·Σqqᵀ − (Σq)(Σq)ᵀ from the MERGED (i, j, p) partial
    * rows (the [[scatterPartials]] key contract) — factored out of
    * [[scatterFrom]] because the partials are ADDITIVE: the streaming
    * drift monitor sums per-batch partials across batches and assembles
    * the exact same S the batch query would compute over the union.
    * `agg` must be materialized by the caller (four consumers).
    */
  def scatterAssemble(agg: DataFrame): DataFrame = {
    val nRow = agg
      .filter(col("i") === -1)
      .select(col("p").cast("decimal(12,0)").as("n"))
    val sums = agg
      .filter(col("i") >= 0 && col("j") === -1)
      .select(col("i"), col("p").cast("decimal(16,0)").as("s"))
    val upper = agg.filter(col("j") >= 0)
    // S is symmetric: the pass accumulates i ≤ j only; mirror the strict
    // upper triangle to recover the full d²-row matrix.
    val raw = upper
      .union(
        upper
          .filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("p"))
      )
      .select(col("i"), col("j"), col("p").cast("decimal(20,0)").as("sraw"))
    raw
      .crossJoin(broadcast(nRow))
      .join(broadcast(sums.select(col("i"), col("s").as("si"))), "i")
      .join(broadcast(sums.select(col("i").as("j"), col("s").as("sj"))), "j")
      .select(
        col("i"),
        col("j"),
        (col("n") * col("sraw") - col("si") * col("sj")).cast("decimal(26,0)").as("sij")
      )
  }

  /** The per-partition partial rows behind [[scatterFrom]], factored out so
    * PlanSpec can pin the volume-bearing stage's shape: (i, j, p) with
    * j ≥ i ≥ 0 for the upper-triangle products, (i, -1, Σqᵢ) for the
    * dimension sums, (-1, -1, n) for the row count. Equivalence with the
    * old explode plan under nulls: a null ELEMENT folds to 0 before the
    * primitive-array decode (contributing 0 to a sum ≡ the explode plan's
    * null-skipping), and a null/empty ROW still counts toward n, exactly
    * like the count(lit(1)) this replaces. Ragged dimensions grow the
    * accumulators to the longest row seen, so the emitted key set matches
    * the explode plan's (every i below the partition max appears).
    */
  private[graft] def scatterPartials(quantized: DataFrame): DataFrame = {
    val spark = quantized.sparkSession
    import spark.implicits._
    quantized
      .select(expr("transform(q, x -> coalesce(x, 0L))").as("q"))
      .as[Array[Long]]
      .mapPartitions { it =>
        var n = 0L
        var d = 0
        var sums = new Array[Long](0)
        var tri = new Array[Long](0) // row-major d×d square, upper half used
        def grow(nd: Int): Unit = {
          val ns = new Array[Long](nd)
          System.arraycopy(sums, 0, ns, 0, d)
          val nt = new Array[Long](nd * nd)
          var i = 0
          while (i < d) {
            var j = i
            while (j < d) { nt(i * nd + j) = tri(i * d + j); j += 1 }
            i += 1
          }
          sums = ns; tri = nt; d = nd
        }
        it.foreach { q =>
          n += 1
          if (q != null) {
            if (q.length > d) grow(q.length)
            var i = 0
            while (i < q.length) {
              val qi = q(i)
              sums(i) += qi
              val base = i * d
              var j = i
              while (j < q.length) { tri(base + j) += qi * q(j); j += 1 }
              i += 1
            }
          }
        }
        val out = Vector.newBuilder[(Int, Int, Long)]
        if (n > 0) out += ((-1, -1, n))
        var i = 0
        while (i < d) {
          out += ((i, -1, sums(i)))
          var j = i
          while (j < d) { out += ((i, j, tri(i * d + j))); j += 1 }
          i += 1
        }
        out.result().iterator
      }
      .toDF("i", "j", "p")
  }
}
