package graft.queries

import scala.util.chaining._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q.t

/** Corpus-construction operators a large-scale training-data pipeline runs
  * after per-document analysis (TextOps) and dedup (Dedup): benchmark
  * decontamination, repetition-based quality filtering (Gopher rules), and
  * token-budget mixture sampling.
  *
  * Scale posture is the design driver for all three:
  *  - decontamination broadcasts only the BENCHMARK n-gram set (eval suites
  *    are ~1e5 examples; the corpus side streams map-side and aggregates on
  *    doc_id — one keyed shuffle);
  *  - repetition metrics are pure per-row higher-order-function maps (zero
  *    shuffles before the output sort);
  *  - budget sampling shards its running token sums over (lang, bucket)
  *    keys so no single language funnels through one reducer — the
  *    per-language prefix table that stitches buckets together is
  *    metadata-sized (|langs|×|buckets| rows) and broadcasts.
  */
object Corpus {

  private[queries] def ws = split(lower(trim(col("text"))), " ")

  /** Deterministic 0..buckets-1 shard of a doc id (md5-derived, so both
    * engines and every run agree). Doc ids are non-negative, but pmod keeps
    * the contract explicit.
    */
  private[queries] def bucketOf(buckets: Int) =
    pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10).cast("long"), lit(buckets))

  /** The data-constrained repeat plan (Muennighoff et al.) over a
    * per-source mass table — the SHARED seam between the `corpus_epochs`
    * query and `CorpusBuilder`'s persisted repeat plan, so the stages.json
    * readout and the query agree by construction. Input: (source, mass
    * BIGINT). `budgetExpr` is evaluated with the broadcast totals
    * (`tot_pw`, `tot_mass`) in scope — the query passes `3 * tot_mass`,
    * the builder a literal `--budget-tokens`. All arithmetic is exact
    * integers (6-dp micro-unit pw lift, DECIMAL(38,0) product, integral
    * division); epochs is an int/int ratio rounded at 6 dp; the 4-epoch
    * cap compare and effective tokens are pure integer arithmetic. The
    * per-source table is checkpointed: it feeds both the output rows and
    * the broadcast total (the shared-subplan rule). Plan: one partial-
    * aggregated input plus a 1-row broadcast — |sources| rows at any
    * corpus size.
    */
  private[graft] def epochsPlanOver(perSourceMass: DataFrame, budgetExpr: Column): DataFrame = {
    val pw = perSourceMass
      .withColumn(
        "pw_int",
        (round(pow(col("mass").cast("double"), 0.7), 6).cast("decimal(28,6)") * 1000000)
          .cast("long")
      )
      .pipe(Checkpoints.checkpoint)
    val tot = pw.agg(sum("pw_int").as("tot_pw"), sum("mass").as("tot_mass"))
    pw.crossJoin(broadcast(tot))
      .withColumn("budget_tokens", budgetExpr.cast("long"))
      .withColumn(
        "target_tokens",
        expr("CAST((CAST(pw_int AS DECIMAL(38,0)) * budget_tokens) div tot_pw AS BIGINT)")
      )
      .withColumn(
        "epochs",
        round(col("target_tokens").cast("double") / col("mass").cast("double"), 6)
      )
      .withColumn("capped", col("target_tokens") > col("mass") * 4)
      .withColumn("effective_tokens", least(col("target_tokens"), col("mass") * 4))
      .select("source", "mass", "target_tokens", "epochs", "capped", "effective_tokens")
  }


  /** `corpus_repeat_apply`'s body, factored out so the resumable
    * `stream-repeat` pager ([[RepeatStream]]) consumes the SAME epoch
    * expansion the oracle-checked query emits. Unordered — the query adds
    * its presentation sort, the pager joins the corpus_shuffle deal and
    * pages in (source, epoch, shard, pos) order. See the query's Scaladoc
    * for the plan/FP discipline.
    */
  private[graft] def repeatApplyFrom(s: SparkSession, d: String): DataFrame = {
    // Three consumers of the projected doc table (mass aggregate,
    // bucket prefixes, running sum) — checkpoint: tokenize once.
    val docs = t(s, d, "documents")

          .select(
            col("doc_id"),
            col("source"),
            size(ws).cast("long").as("n_tokens"),
            bucketOf(32).as("bucket"),
            md5(col("doc_id").cast("string")).as("h")
          )
          .pipe(Checkpoints.checkpoint)
        // Two consumers (full-epoch fan-out + partial-epoch filter):
        // checkpoint, or the seam's plan — including its own eager
        // checkpoint — materializes once per consumer.
        val plan = Corpus
          .epochsPlanOver(
            docs.groupBy("source").agg(sum("n_tokens").as("mass")),
            expr("3 * tot_mass")
          )
          .withColumn("fullep", expr("effective_tokens div mass"))
          .withColumn("rem", expr("effective_tokens % mass"))
          .select("source", "fullep", "rem")
          .pipe(Checkpoints.checkpoint)
        val fullRows = docs
          .join(broadcast(plan), "source")
          .filter(col("fullep") > 0)
          .withColumn("epoch", explode(expr("sequence(0L, fullep - 1)")))
          .select("doc_id", "source", "epoch", "n_tokens")
        val bucketPrefix = docs
          .groupBy("source", "bucket")
          .agg(sum(col("n_tokens")).as("bt"))
          .withColumn(
            "bpre",
            coalesce(
              sum(col("bt")).over(
                Window.partitionBy("source").orderBy("bucket")
                  .rowsBetween(Window.unboundedPreceding, -1)
              ),
              lit(0L)
            )
          )
          .select("source", "bucket", "bpre")
        val intra = Window.partitionBy("source", "bucket").orderBy("h", "doc_id")
        val partRows = docs
          .withColumn(
            "cb",
            coalesce(
              sum(col("n_tokens")).over(intra.rowsBetween(Window.unboundedPreceding, -1)),
              lit(0L)
            )
          )
          .join(broadcast(bucketPrefix), Seq("source", "bucket"))
          .join(broadcast(plan), "source")
          .filter(col("bpre") + col("cb") < col("rem"))
          .select(col("doc_id"), col("source"), col("fullep").as("epoch"), col("n_tokens"))
        fullRows
          .unionByName(partRows)
  }

  /** The corpus_repeat_apply oracle (next to [[repeatApplyFrom]]). */
  private val RepeatApplyOracle = """
        WITH docs AS (
          SELECT doc_id, source,
                 CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS n_tokens,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 32 AS bucket,
                 md5(CAST(doc_id AS VARCHAR)) AS h
          FROM documents),
        per_src AS (
          SELECT source, CAST(sum(n_tokens) AS BIGINT) AS mass FROM docs GROUP BY source),
        pw AS (
          SELECT source, mass,
                 CAST(CAST(round(pow(CAST(mass AS DOUBLE), 0.7), 6) AS DECIMAL(28,6))
                      * 1000000 AS BIGINT) AS pw_int
          FROM per_src),
        tot AS (SELECT sum(pw_int) AS tot_pw, sum(mass) AS tot_mass FROM pw),
        planx AS (
          SELECT source,
                 CAST(least(tgt, mass * 4) // mass AS BIGINT) AS fullep,
                 CAST(least(tgt, mass * 4) % mass AS BIGINT) AS rem
          FROM (SELECT source, mass,
                       CAST((pw_int::HUGEINT * (3 * tot_mass)) // tot_pw AS BIGINT) AS tgt
                FROM pw CROSS JOIN tot)),
        fullrows AS (
          SELECT d.doc_id, d.source, CAST(unnest(generate_series(0, p.fullep - 1)) AS BIGINT) AS epoch,
                 d.n_tokens
          FROM docs d JOIN planx p USING (source) WHERE p.fullep > 0),
        bp AS (
          SELECT source, bucket,
                 coalesce(sum(sum(n_tokens)) OVER (
                   PARTITION BY source ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bpre
          FROM docs GROUP BY source, bucket),
        partrows AS (
          SELECT d.doc_id, d.source, p.fullep AS epoch, d.n_tokens
          FROM (SELECT d0.doc_id, d0.source, d0.n_tokens,
                       bp.bpre + coalesce(sum(d0.n_tokens) OVER (
                         PARTITION BY d0.source, d0.bucket ORDER BY d0.h, d0.doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
                FROM docs d0 JOIN bp ON d0.source = bp.source AND d0.bucket = bp.bucket) d
          JOIN planx p USING (source) WHERE d.before < p.rem)
        SELECT doc_id, source, epoch, n_tokens
        FROM (SELECT * FROM fullrows UNION ALL SELECT * FROM partrows) u
        ORDER BY source, epoch, doc_id
  """

  val all: Seq[Q] = Seq(
    // --- benchmark decontamination: n-gram overlap against an eval set ---
    // The standard GPT-3/PaLM recipe: a training document is contaminated
    // if it shares any n-gram with a held-out benchmark. The benchmark here
    // is a deterministic pseudo-eval slice (doc_id % 97 == 0); real
    // pipelines substitute their eval suites. n=3 is scaled to the
    // synthetic 31-word vocabulary so every SF yields non-trivial overlap
    // (production uses 8-13-gram windows — the plan is unchanged).
    //
    // Plan: benchmark n-grams -> distinct (small) -> BROADCAST; corpus
    // n-grams explode map-side, join map-side against the broadcast, and
    // the only shuffle is the per-doc hit count on doc_id. At 100 TB the
    // corpus side never shuffles its text.
    Q(
      "text_decontaminate",
      (s, d) => {
        val docs = t(s, d, "documents")
        val ngrams = expr(
          """transform(sequence(1, size(w) - 2),
                       i -> concat(element_at(w, i), ' ', element_at(w, i + 1), ' ',
                                   element_at(w, i + 2)))"""
        )
        // array_distinct BEFORE the explode: per-doc dedup happens map-side
        // inside codegen, so distinct (doc_id, gram) pairs materialize with
        // NO corpus-wide shuffle (an explode-then-distinct would exchange
        // every n-gram of every document — ~10x the corpus — just to drop
        // within-doc repeats that the array op removes for free).
        val withGrams = docs
          .select(col("doc_id"), ws.as("w"))
          .filter(size(col("w")) >= 3)
          .select(col("doc_id"), explode(array_distinct(ngrams)).as("gram"))
        val bench = broadcast(
          withGrams
            .filter(col("doc_id") % 97 === 0)
            .select(col("gram"))
            .distinct()
        )
        val train = withGrams.filter(col("doc_id") % 97 =!= 0)
        val hits = train
          .join(bench, "gram")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_hits"))
        docs
          .filter(col("doc_id") % 97 =!= 0)
          .select(col("doc_id"))
          .join(hits, Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            coalesce(col("n_hits") > 0, lit(false)).as("contaminated")
          )
          .orderBy("doc_id")
      },
      Some("""
        WITH g0 AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(w) - 1),
                        i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i AS INTEGER) + 1] || ' ' ||
                             w[CAST(i AS INTEGER) + 2])) AS gram
          FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents)
          WHERE len(w) >= 3),
        g AS (SELECT DISTINCT doc_id, gram FROM g0),
        bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
        hits AS (
          SELECT g.doc_id, count(*) AS n_hits
          FROM g JOIN bench USING (gram)
          WHERE g.doc_id % 97 <> 0
          GROUP BY g.doc_id)
        SELECT d.doc_id,
               coalesce(h.n_hits, 0) AS n_hits,
               coalesce(h.n_hits > 0, false) AS contaminated
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        WHERE d.doc_id % 97 <> 0
        ORDER BY d.doc_id
      """)
    ),

    // --- Gopher repetition rules: per-doc duplication metrics + gate ---
    // Rae et al. 2021 (Gopher, appendix A1.1) drop documents dominated by
    // repeated content. Word-level analogs of their rules, each a pure
    // per-row expression over the token array (the whole computation is one
    // WholeStageCodegen span; cost is O(distinct * n) per row, bounded by
    // the document length — no corpus-wide state, no shuffle):
    //   dup_word_frac   1 - distinct/total words
    //   top_word_frac   occurrences of the most frequent word / total
    //   top_bigram_frac occurrences of the most frequent bigram / bigrams
    // The keep gate mirrors Gopher's thresholds (0.2 / 0.18), tightened to
    // word level.
    Q(
      "text_repetition",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), ws.as("w"))
          .filter(size(col("w")) >= 2)
        val nW = size(col("w")).cast("double")
        val topWord = expr(
          "array_max(transform(array_distinct(w), x -> size(filter(w, y -> y = x))))"
        ).cast("double")
        val grams = expr(
          """transform(sequence(1, size(w) - 1),
                       i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"""
        )
        docs
          .withColumn("bg", grams)
          .select(
            col("doc_id"),
            (lit(1.0) - size(array_distinct(col("w"))) / nW).as("dup_word_frac"),
            (topWord / nW).as("top_word_frac"),
            (expr("array_max(transform(array_distinct(bg), x -> size(filter(bg, y -> y = x))))")
              .cast("double") / size(col("bg"))).as("top_bigram_frac")
          )
          .withColumn(
            "keep",
            col("top_word_frac") <= 0.2 && col("top_bigram_frac") <= 0.18
          )
          .orderBy("doc_id")
      },
      Some("""
        WITH x AS (
          SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
          FROM documents
          WHERE len(string_split(lower(trim(text)), ' ')) >= 2),
        y AS (
          SELECT doc_id, w,
                 list_transform(range(1, len(w)),
                   i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i AS INTEGER) + 1]) AS bg
          FROM x),
        m AS (
          SELECT doc_id,
                 1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS dup_word_frac,
                 CAST(list_max(list_transform(list_distinct(w),
                        x -> len(list_filter(w, y -> y = x)))) AS DOUBLE) / len(w) AS top_word_frac,
                 CAST(list_max(list_transform(list_distinct(bg),
                        x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE) / len(bg) AS top_bigram_frac
          FROM y)
        SELECT doc_id, dup_word_frac, top_word_frac, top_bigram_frac,
               top_word_frac <= 0.2 AND top_bigram_frac <= 0.18 AS keep
        FROM m ORDER BY doc_id
      """)
    ),

    // --- token-budget mixture sampling: fill per-language quotas ---
    // The training-mix operator: given mixture weights and a global token
    // budget (here 50% of the corpus, weights en .5 / de .2 / fr .15 /
    // es .1 / zh .05), take documents in a deterministic hash order until
    // each language's quota fills. A single window over lang would funnel
    // every language through one reducer at 100 TB, so the running sums are
    // sharded: docs land in (lang, md5-bucket) partitions (|langs|×32 keys
    // here; dial buckets up with corpus size), the intra-bucket cumulative
    // sum is a keyed window, and the cross-bucket offsets come from a
    // metadata-sized per-bucket total table that broadcasts back. A doc is
    // kept iff the tokens BEFORE it (bucket prefix + intra-bucket running
    // sum) sit inside the quota — the greedy prefix rule, evaluated
    // map-side after the broadcast join.
    Q(
      "corpus_token_budget",
      (s, d) => {
        // The projected doc table (no text column, ~60 B/row) feeds three
        // consumers: the grand total, the per-bucket sums, and the windowed
        // running sum. Checkpointing it reads the expensive text column
        // ONCE — un-checkpointed, Catalyst re-derives each consumer from
        // the scan and tokenizes the corpus three times.
        val docs = t(s, d, "documents")
          .select(
            col("doc_id"),
            col("lang"),
            size(ws).cast("long").as("n_tokens"),
            bucketOf(32).as("bucket"),
            md5(col("doc_id").cast("string")).as("h")
          )
          .pipe(graft.queries.Checkpoints.checkpoint)
        val total = docs.agg(sum(col("n_tokens")).as("grand_total"))
        // Per-(lang,bucket) totals -> per-bucket prefix within each lang:
        // |langs| * 32 rows, window cost is trivial, result broadcasts.
        val bucketPrefix = docs
          .groupBy("lang", "bucket")
          .agg(sum(col("n_tokens")).as("bucket_tokens"))
          .withColumn(
            "bucket_prefix",
            coalesce(
              sum(col("bucket_tokens")).over(
                Window.partitionBy("lang").orderBy("bucket")
                  .rowsBetween(Window.unboundedPreceding, -1)
              ),
              lit(0L)
            )
          )
          .select("lang", "bucket", "bucket_prefix")
        val intra = Window.partitionBy("lang", "bucket").orderBy("h", "doc_id")
        docs
          .withColumn(
            "cum_before",
            coalesce(
              sum(col("n_tokens")).over(intra.rowsBetween(Window.unboundedPreceding, -1)),
              lit(0L)
            )
          )
          .join(broadcast(bucketPrefix), Seq("lang", "bucket"))
          .crossJoin(broadcast(total))
          .withColumn("tokens_before", col("bucket_prefix") + col("cum_before"))
          .withColumn(
            "kept",
            // try_element_at: ANSI element_at throws on a missing map key
            // (a lang outside the mix would error the job); the oracle's
            // CASE falls back to the same 0.05 default.
            col("tokens_before").cast("double") <
              coalesce(expr("try_element_at(map('en', 0.50D, 'de', 0.20D, 'fr', 0.15D, 'es', 0.10D, 'zh', 0.05D), lang)"), lit(0.05)) *
              col("grand_total") * lit(0.5)
          )
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("tokens_kept")
          )
          .orderBy("lang")
      },
      Some("""
        WITH docs AS (
          SELECT doc_id, lang,
                 CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS n_tokens,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 32 AS bucket,
                 md5(CAST(doc_id AS VARCHAR)) AS h
          FROM documents),
        total AS (SELECT sum(n_tokens) AS grand_total FROM docs),
        bp AS (
          SELECT lang, bucket,
                 coalesce(sum(sum(n_tokens)) OVER (
                   PARTITION BY lang ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bucket_prefix
          FROM docs GROUP BY lang, bucket),
        cum AS (
          SELECT d.doc_id, d.lang, d.n_tokens,
                 bp.bucket_prefix + coalesce(sum(d.n_tokens) OVER (
                   PARTITION BY d.lang, d.bucket ORDER BY d.h, d.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
          FROM docs d JOIN bp ON d.lang = bp.lang AND d.bucket = bp.bucket),
        flagged AS (
          SELECT c.lang, c.n_tokens,
                 CAST(c.tokens_before AS DOUBLE) <
                   CASE c.lang WHEN 'en' THEN 0.50 WHEN 'de' THEN 0.20
                               WHEN 'fr' THEN 0.15 WHEN 'es' THEN 0.10
                               ELSE 0.05 END * t.grand_total * 0.5 AS kept
          FROM cum c CROSS JOIN total t)
        SELECT lang, count(*) AS n_docs,
               CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept
        FROM flagged GROUP BY lang ORDER BY lang
      """)
    ),

    // --- sequence packing: concat-and-chunk docs into training sequences ---
    // The sample-packing step between curation and the trainer: documents
    // are concatenated in a deterministic order and chunked into fixed
    // seq_len-token sequences (the GPT-style recipe — documents may cross
    // chunk boundaries; the attention mask handles the seam). A global
    // concatenation order would serialize the corpus through one sort, so
    // packing shards over the same md5 buckets as the budget sampler: each
    // of the 32 shards packs independently (one windowed running sum per
    // shard, partition-parallel), and only the LAST bin of each shard is
    // under-full — fill ratio degrades by at most shards·seq_len tokens
    // over the whole corpus, negligible at any real scale, in exchange for
    // embarrassing parallelism. Emitted per shard: docs, tokens, bin
    // count, fill ratio, and how many docs straddle a chunk boundary
    // (boundary docs cost loss-masking overhead, so pipelines track them).
    Q(
      "corpus_pack",
      (s, d) => {
        val seqLen = 512L
        val docs = t(s, d, "documents")
          .select(
            col("doc_id"),
            size(ws).cast("long").as("n_tokens"),
            bucketOf(32).as("bucket"),
            md5(col("doc_id").cast("string")).as("h")
          )
        val w = Window.partitionBy("bucket").orderBy("h", "doc_id")
        docs
          .withColumn(
            "before",
            coalesce(
              sum(col("n_tokens")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
              lit(0L)
            )
          )
          .withColumn(
            "crosses",
            expr(s"before div $seqLen") =!= expr(s"(before + n_tokens - 1) div $seqLen")
          )
          .groupBy("bucket")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("tokens"),
            expr(s"(sum(n_tokens) + ${seqLen - 1}) div $seqLen").as("n_bins"),
            sum(when(col("crosses"), 1L).otherwise(0L)).as("boundary_docs")
          )
          .withColumn(
            "fill_ratio",
            round(col("tokens").cast("double") / (col("n_bins") * seqLen).cast("double"), 6)
          )
          .select("bucket", "n_docs", "tokens", "n_bins", "boundary_docs", "fill_ratio")
          .orderBy("bucket")
      },
      Some("""
        WITH docs AS (
          SELECT doc_id,
                 CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS n_tokens,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 32 AS bucket,
                 md5(CAST(doc_id AS VARCHAR)) AS h
          FROM documents),
        cum AS (
          SELECT bucket, n_tokens,
                 coalesce(sum(n_tokens) OVER (
                   PARTITION BY bucket ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
          FROM docs)
        SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS tokens,
               CAST((sum(n_tokens) + 511) // 512 AS BIGINT) AS n_bins,
               CAST(sum(CASE WHEN before // 512 <> (before + n_tokens - 1) // 512
                             THEN 1 ELSE 0 END) AS BIGINT) AS boundary_docs,
               round(CAST(sum(n_tokens) AS DOUBLE) /
                     (CAST((sum(n_tokens) + 511) // 512 AS BIGINT) * 512.0), 6) AS fill_ratio
        FROM cum GROUP BY bucket ORDER BY bucket
      """)
    ),

    // --- mixture weights: α-smoothed per-source sampling proportions ---
    // The data-mixing step that precedes any multi-source training run:
    // given per-source token masses, sample sources proportionally to
    // mass^α (α=0.7, the multilingual-LM smoothing exponent from Conneau &
    // Lample's XLM recipe) so small sources are up-weighted without letting
    // them dominate. Per-source token counts are one partial-aggregated
    // groupBy over map-side `size(split(..))` (the text never shuffles);
    // the normalizer is a second aggregate over the |sources|-row table —
    // metadata-sized at any corpus scale, so the final division is a
    // 1-row broadcast join. pow() drift discipline: each mass^α rounds to
    // 6 dp and sums as DECIMAL, so the normalizer is exact and
    // engine-order-independent; only the final ratios are FP.
    Q(
      "corpus_mix_weights",
      (s, d) => {
        val perSource = t(s, d, "documents")
          .select(col("source"), size(ws).cast("long").as("n_tokens"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
          .withColumn(
            "pw",
            round(pow(col("n_tokens").cast("double"), 0.7), 6).cast("decimal(28,6)")
          )
          // perSource feeds BOTH the totals aggregate and the final join;
          // without a checkpoint the documents scan + tokenize groupBy (the
          // expensive full-corpus pass) recomputes. The checkpointed table
          // is |sources| rows — free to persist.
          .pipe(Checkpoints.checkpoint)
        val totals = perSource.agg(
          sum("n_tokens").as("tot_tokens"),
          sum("pw").as("tot_pw")
        )
        perSource
          .crossJoin(broadcast(totals))
          .select(
            col("source"),
            col("n_docs"),
            col("n_tokens"),
            round(col("n_tokens").cast("double") / col("tot_tokens").cast("double"), 6)
              .as("raw_frac"),
            round(col("pw").cast("double") / col("tot_pw").cast("double"), 6).as("weight")
          )
          .orderBy("source")
      },
      Some("""
        WITH per_src AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(len(string_split(lower(trim(text)), ' '))) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source),
        pw AS (
          SELECT *, CAST(round(pow(CAST(n_tokens AS DOUBLE), 0.7), 6) AS DECIMAL(28,6)) AS pw
          FROM per_src),
        tot AS (SELECT sum(n_tokens) AS tot_tokens, sum(pw) AS tot_pw FROM pw)
        SELECT source, n_docs, n_tokens,
               round(CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE), 6) AS raw_frac,
               round(CAST(pw AS DOUBLE) / CAST(tot_pw AS DOUBLE), 6) AS weight
        FROM pw CROSS JOIN tot ORDER BY source
      """)
    ),

    // --- corpus-LM quality scoring: unigram log-likelihood + buckets ---
    // The CCNet recipe (Wenzek et al. 2020) scores web documents with a
    // language model and splits each language into head/middle/tail
    // quality buckets. Here the LM is a unigram model estimated FROM the
    // corpus itself (add-one smoothing over the observed vocabulary), and
    // the buckets come from per-language score moments rather than a
    // per-language ntile: an exact tercile needs a full per-language SORT
    // (one reducer per language at 100 TB — the funnel corpus_token_budget
    // exists to avoid), whereas mean/stddev cutoffs aggregate in one
    // partial-agg pass to a |langs|-row table that BROADCASTS, keeping
    // bucket assignment map-side. FP discipline: per-token log-probs round
    // to 6 dp and sum as DECIMAL(18,6) (order-independent), the per-lang
    // moments sum those decimals (and their DECIMAL(38,12) squares)
    // exactly, and the final mean/std/compare chain is correctly-rounded
    // IEEE ops evaluated identically in both engines.
    Q(
      "corpus_lm_quality",
      (s, d) => {
        val docs = t(s, d, "documents")
        // tok feeds BOTH the vocab counts and the scored join below —
        // checkpoint it so the full-corpus explode runs once, not twice.
        // (The token table is corpus-sized, but one materialized pass still
        // beats two scan+split+explode passes, and the checkpoint spills.)
        val tok = docs
          .select(col("doc_id"), col("lang"), explode(ws).as("word"))
          .pipe(Checkpoints.checkpoint)
        val counts = tok.groupBy("word").agg(count(lit(1)).as("c"))
        val totals = counts.agg(
          sum("c").as("n_total"),
          count(lit(1)).as("vocab")
        )
        val logp = counts
          .crossJoin(broadcast(totals))
          .select(
            col("word"),
            round(
              log((col("c") + 1).cast("double") / (col("n_total") + col("vocab")).cast("double")),
              6
            ).cast("decimal(18,6)").as("logp")
          )
        // The doc-level score table feeds BOTH the per-lang moments and the
        // final bucket join; Catalyst does not share subplans, so without a
        // checkpoint the whole token-scoring pipeline (explode + vocab join
        // + doc aggregate — the expensive 100 TB part) would run twice.
        // The per-doc average rounds in EXACT INTEGER MICRO-UNITS, not via
        // round(double, 6): a 6-dp decimal sum divided by a small token
        // count lands on exact x.xxxxxx5 boundaries often (sf0.1 hit one:
        // -210.926201/62 = -3.4020355 exactly), and there the engines'
        // rounding paths disagree — Spark rounds the double's exact
        // decimal expansion (just below the boundary), DuckDB's
        // multiply-then-round re-rounds onto it. Half-up on integers
        // ((2|m|+n) div 2n, sign restored) is engine-independent by
        // construction; the final /1e6 is one correctly-rounded IEEE op.
        val scored = tok
          .join(logp, "word")
          .groupBy("doc_id", "lang")
          .agg(count(lit(1)).as("n_tokens"), sum("logp").as("sum_logp"))
          .withColumn("m", (col("sum_logp") * 1000000).cast("long"))
          .withColumn("avg_logp", Q.halfUpMicroAvg("m", "n_tokens"))
          .drop("m")
          .pipe(Checkpoints.checkpoint)
        val moments = scored
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n"),
            sum(col("avg_logp").cast("decimal(18,6)")).as("s1"),
            sum((col("avg_logp") * col("avg_logp")).cast("decimal(38,12)")).as("s2")
          )
          .select(
            col("lang"),
            (col("s1").cast("double") / col("n").cast("double")).as("mu"),
            // greatest(·, 0): E[x²]−mu² can land ~-5e-13 when a language's
            // scores are all equal (s2 rounds to 12 dp, mu² doesn't) —
            // sqrt of that is NaN here and an ERROR in DuckDB.
            sqrt(
              greatest(
                col("s2").cast("double") / col("n").cast("double") -
                  (col("s1").cast("double") / col("n").cast("double")) *
                  (col("s1").cast("double") / col("n").cast("double")),
                lit(0.0)
              )
            ).as("sd")
          )
        scored
          .join(broadcast(moments), "lang")
          .select(
            col("doc_id"),
            col("lang"),
            col("n_tokens"),
            col("avg_logp"),
            when(col("avg_logp") >= col("mu") + lit(0.25) * col("sd"), "head")
              .when(col("avg_logp") <= col("mu") - lit(0.25) * col("sd"), "tail")
              .otherwise("middle")
              .as("bucket")
          )
          .orderBy("doc_id")
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, lang, unnest(string_split(lower(trim(text)), ' ')) AS word
          FROM documents),
        counts AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY word),
        tot AS (SELECT sum(c) AS n_total, count(*) AS vocab FROM counts),
        logp AS (
          SELECT word,
                 CAST(round(ln(CAST(c + 1 AS DOUBLE) / CAST(n_total + vocab AS DOUBLE)), 6)
                      AS DECIMAL(18,6)) AS logp
          FROM counts CROSS JOIN tot),
        scored0 AS (
          SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(logp) * 1000000 AS BIGINT) AS m
          FROM tok JOIN logp USING (word)
          GROUP BY doc_id, lang),
        scored AS (
          SELECT doc_id, lang, n_tokens,
                 CAST(CASE WHEN m >= 0 THEN (2 * m + n_tokens) // (2 * n_tokens)
                           ELSE -((2 * (-m) + n_tokens) // (2 * n_tokens)) END AS DOUBLE)
                   / 1000000.0 AS avg_logp
          FROM scored0),
        mom AS (
          SELECT lang,
                 CAST(sum(CAST(avg_logp AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS mu,
                 sqrt(greatest(
                      CAST(sum(CAST(avg_logp * avg_logp AS DECIMAL(38,12))) AS DOUBLE) / count(*)
                      - (CAST(sum(CAST(avg_logp AS DECIMAL(18,6))) AS DOUBLE) / count(*))
                        * (CAST(sum(CAST(avg_logp AS DECIMAL(18,6))) AS DOUBLE) / count(*)),
                      0.0)) AS sd
          FROM scored GROUP BY lang)
        SELECT doc_id, lang, n_tokens, avg_logp,
               CASE WHEN avg_logp >= mu + 0.25 * sd THEN 'head'
                    WHEN avg_logp <= mu - 0.25 * sd THEN 'tail'
                    ELSE 'middle' END AS bucket
        FROM scored JOIN mom USING (lang)
        ORDER BY doc_id
      """)
    ),

    // --- DSIR importance weights: hashed-bigram target/raw log-ratio ---
    // Data Selection via Importance Resampling (Xie et al. 2023): select
    // raw-pool documents whose hashed n-gram feature distribution looks
    // like a target domain. Features are bigrams hashed into a FIXED
    // 256-bucket space (md5-derived, cross-engine stable), so the fitted
    // model — target and raw bucket distributions with add-one smoothing —
    // is a 256-row table at ANY corpus scale: per-(doc,bucket) counts
    // partial-aggregate map-side, the two global histograms are tiny
    // groupBys, and the per-bucket log-ratio λ_b broadcasts back onto the
    // per-doc counts for a map-side weighted sum. Target here: English
    // docs (select-multilingual-toward-English); production swaps in its
    // target-domain sample. λ_b rounds to 6 dp and the per-doc Σ c_b·λ_b
    // sums in DECIMAL — exact, engine-order-independent; `selected` means
    // logw > 0 (more target-like than raw-like), a map-side decision
    // rather than a global top-k sort.
    Q(
      "corpus_dsir_weights",
      (s, d) => {
        val docs = t(s, d, "documents")
        val grams = docs
          .select(col("doc_id"), col("lang"), ws.as("w"))
          .filter(size(col("w")) >= 2)
          .select(
            col("doc_id"),
            col("lang"),
            explode(
              expr("""transform(sequence(1, size(w) - 1),
                                i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))""")
            ).as("gram")
          )
          .withColumn(
            "b",
            pmod(conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long"), lit(256))
          )
        // Shared by the model fit (hist → λ) and the scoring probe — one
        // checkpoint stops the gram explode + count from running twice.
        val perDoc = grams
          .groupBy(col("doc_id"), col("lang"), col("b"))
          .agg(count(lit(1)).as("c"))
          .pipe(Checkpoints.checkpoint)
        val hist = perDoc
          .groupBy("b")
          .agg(
            sum(when(col("lang") === "en", col("c")).otherwise(0L)).as("tc"),
            sum(when(col("lang") =!= "en", col("c")).otherwise(0L)).as("rc")
          )
        val totals = hist.agg(sum("tc").as("nt"), sum("rc").as("nr"))
        val lambda = hist
          .crossJoin(broadcast(totals))
          .select(
            col("b"),
            round(
              log((col("tc") + 1).cast("double") / (col("nt") + 256).cast("double")) -
                log((col("rc") + 1).cast("double") / (col("nr") + 256).cast("double")),
              6
            ).cast("decimal(18,6)").as("lambda")
          )
        perDoc
          .filter(col("lang") =!= "en")
          .join(broadcast(lambda), "b")
          .groupBy("doc_id")
          .agg(
            sum("c").as("n_bigrams"),
            round(sum(col("c") * col("lambda")).cast("double"), 6).as("logw")
          )
          .withColumn("selected", col("logw") > 0)
          .orderBy("doc_id")
      },
      Some("""
        WITH g AS (
          SELECT doc_id, lang,
                 unnest(list_transform(range(1, len(w)),
                        i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i AS INTEGER) + 1])) AS gram
          FROM (SELECT doc_id, lang, string_split(lower(trim(text)), ' ') AS w FROM documents)
          WHERE len(w) >= 2),
        gb AS (
          SELECT doc_id, lang,
                 ('0x' || substr(md5(gram), 1, 15))::BIGINT % 256 AS b
          FROM g),
        per_doc AS (
          SELECT doc_id, lang, b, CAST(count(*) AS BIGINT) AS c
          FROM gb GROUP BY doc_id, lang, b),
        hist AS (
          SELECT b,
                 sum(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS tc,
                 sum(CASE WHEN lang <> 'en' THEN c ELSE 0 END) AS rc
          FROM per_doc GROUP BY b),
        tot AS (SELECT sum(tc) AS nt, sum(rc) AS nr FROM hist),
        lam AS (
          SELECT b,
                 CAST(round(ln(CAST(tc + 1 AS DOUBLE) / CAST(nt + 256 AS DOUBLE)) -
                            ln(CAST(rc + 1 AS DOUBLE) / CAST(nr + 256 AS DOUBLE)), 6)
                      AS DECIMAL(18,6)) AS lambda
          FROM hist CROSS JOIN tot)
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
               round(CAST(sum(c * lambda) AS DOUBLE), 6) AS logw,
               round(CAST(sum(c * lambda) AS DOUBLE), 6) > 0 AS selected
        FROM per_doc JOIN lam USING (b)
        WHERE lang <> 'en'
        GROUP BY doc_id
        ORDER BY doc_id
      """)
    ),

    // --- document chunking: overlapping fixed-size windows ---
    // The splitter every pretraining/RAG pipeline runs on long documents:
    // 64-token chunks on a 48-token stride (16-token overlap so no
    // boundary context is lost), each chunk identified by a content hash.
    // Emission contract: chunk starts are 1, 49, 97, … while
    // start ≤ max(n_tokens − overlap, 1) — a would-be final chunk lying
    // entirely inside the previous one is not emitted. The whole
    // computation is ONE map-side higher-order expression per row
    // (sequence → slice → md5 inside codegen): no shuffle at any corpus
    // size except the output sort, and the explode factor is bounded by
    // n/stride.
    Q(
      "corpus_chunk",
      (s, d) => {
        t(s, d, "documents")
          .select(col("doc_id"), ws.as("w"))
          .select(
            col("doc_id"),
            explode(expr(
              """transform(sequence(1, greatest(size(w) - 16, 1), 48), st -> struct(
                   CAST((st - 1) div 48 AS BIGINT) AS chunk_id,
                   CAST(size(slice(w, st, 64)) AS BIGINT) AS chunk_tokens,
                   md5(concat_ws(' ', slice(w, st, 64))) AS chunk_hash))"""
            )).as("c")
          )
          .select(col("doc_id"), col("c.chunk_id"), col("c.chunk_tokens"), col("c.chunk_hash"))
          .orderBy("doc_id", "chunk_id")
      },
      Some("""
        WITH w AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
        st AS (
          SELECT doc_id, w,
                 unnest(range(1, greatest(len(w) - 16, 1) + 1, 48)) AS s
          FROM w)
        SELECT doc_id,
               CAST((s - 1) // 48 AS BIGINT) AS chunk_id,
               CAST(len(w[CAST(s AS INTEGER) : CAST(s AS INTEGER) + 63]) AS BIGINT) AS chunk_tokens,
               md5(array_to_string(w[CAST(s AS INTEGER) : CAST(s AS INTEGER) + 63], ' ')) AS chunk_hash
        FROM st ORDER BY doc_id, chunk_id
      """)
    ),

    // --- NEAR-duplicate benchmark decontamination (fuzzy overlap) ---
    // text_decontaminate catches exact n-gram overlap; evaluation sets
    // also leak as paraphrases/reformatted copies whose exact n-grams
    // differ. The fuzzy rule (the Llama/GPT-4-report style): a training
    // doc is contaminated when it collides with ANY benchmark doc in >= 1
    // of its 4 MinHash LSH band buckets — the same 4x4 minhash16 banding
    // as dedup_minhash_lsh and the streaming near-dedup, so stream and
    // batch agree on candidate semantics. Plan: benchmark band keys are
    // eval-suite-sized -> distinct -> BROADCAST; the corpus side computes
    // its bands in one codegen pass and probes map-side; the only shuffle
    // is the per-doc hit count. The banded signature table is shared by
    // both roles through a checkpoint.
    Q(
      "corpus_decontaminate_near",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val bands = t(s, d, "documents")
          .select(
            col("doc_id"),
            expr("minhash16(array_distinct(split(lower(trim(text)), ' ')))").as("mh")
          )
          .select(
            col("doc_id"),
            explode(expr(
              """transform(sequence(0, 3), b -> struct(
                   b AS band,
                   array_join(transform(slice(mh, b*4 + 1, 4), x -> cast(x AS string)), ',') AS bh))"""
            )).as("bb")
          )
          .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
          .pipe(Checkpoints.checkpoint)
        val bench = broadcast(
          bands.filter(col("doc_id") % 97 === 0).select("band", "bh").distinct()
        )
        val hits = bands
          .filter(col("doc_id") % 97 =!= 0)
          .join(bench, Seq("band", "bh"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_hit_bands"))
        t(s, d, "documents")
          .filter(col("doc_id") % 97 =!= 0)
          .select("doc_id")
          .join(hits, Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            coalesce(col("n_hit_bands"), lit(0L)).as("n_hit_bands"),
            coalesce(col("n_hit_bands") > 0, lit(false)).as("contaminated")
          )
          .orderBy("doc_id")
      },
      Some("""
        WITH w AS (
          SELECT DISTINCT doc_id, word FROM (
            SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS word FROM documents)),
        h AS (
          SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT % 2147483647 AS hh FROM w),
        x AS (
          SELECT doc_id, t.i,
                 min(((2*t.i + 3) * hh + (104729*(t.i + 1)) % 2147483647) % 2147483647) AS mh
          FROM h CROSS JOIN range(0, 16) t(i) GROUP BY 1, 2),
        bands AS (
          SELECT doc_id, CAST(i // 4 AS INTEGER) AS band,
                 string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bh
          FROM x GROUP BY doc_id, i // 4),
        bench AS (SELECT DISTINCT band, bh FROM bands WHERE doc_id % 97 = 0),
        hits AS (
          SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_hit_bands
          FROM bands b JOIN bench USING (band, bh)
          WHERE b.doc_id % 97 <> 0 GROUP BY 1)
        SELECT d.doc_id, coalesce(h.n_hit_bands, 0) AS n_hit_bands,
               coalesce(h.n_hit_bands > 0, false) AS contaminated
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        WHERE d.doc_id % 97 <> 0 ORDER BY d.doc_id
      """)
    ),

    // --- benchmark leakage report: the decontamination flip side ---
    // corpus_decontaminate_near flags TRAINING docs; eval owners need the
    // reverse artifact — per BENCHMARK item, how many training documents
    // near-collide with it (the "which eval rows leak, and how badly"
    // report attached to every serious eval release). Same 4×4 minhash16
    // banding and checkpointed band table; the benchmark side (bands
    // CARRYING their doc ids — still eval-suite-sized) broadcasts, the
    // corpus probes map-side, candidate pairs dedupe on (bench, train)
    // and the per-bench count is a tiny aggregate. Zero-leak items emit
    // with 0 so the report covers the whole suite.
    Q(
      "corpus_leakage_report",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val bands = t(s, d, "documents")
          .select(
            col("doc_id"),
            expr("minhash16(array_distinct(split(lower(trim(text)), ' ')))").as("mh")
          )
          .select(
            col("doc_id"),
            explode(expr(
              """transform(sequence(0, 3), b -> struct(
                   b AS band,
                   array_join(transform(slice(mh, b*4 + 1, 4), x -> cast(x AS string)), ',') AS bh))"""
            )).as("bb")
          )
          .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
          .pipe(Checkpoints.checkpoint)
        val bench = broadcast(
          bands
            .filter(col("doc_id") % 97 === 0)
            .select(col("doc_id").as("bench_doc_id"), col("band"), col("bh"))
            .distinct()
        )
        val pairs = bands
          .filter(col("doc_id") % 97 =!= 0)
          .join(bench, Seq("band", "bh"))
          .select("bench_doc_id", "doc_id")
          .distinct()
        val counts = pairs.groupBy("bench_doc_id").agg(count(lit(1)).as("n_leaking_docs"))
        bands
          .filter(col("doc_id") % 97 === 0)
          .select(col("doc_id").as("bench_doc_id"))
          .distinct()
          // Both sides of the zero-fill join are eval-suite-sized; the
          // hint keeps the plan broadcast even under static estimation.
          .join(broadcast(counts), Seq("bench_doc_id"), "left")
          .select(
            col("bench_doc_id"),
            coalesce(col("n_leaking_docs"), lit(0L)).as("n_leaking_docs"),
            coalesce(col("n_leaking_docs") > 0, lit(false)).as("leaked")
          )
          .orderBy("bench_doc_id")
      },
      Some("""
        WITH w AS (
          SELECT DISTINCT doc_id, word FROM (
            SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS word FROM documents)),
        h AS (
          SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT % 2147483647 AS hh FROM w),
        x AS (
          SELECT doc_id, t.i,
                 min(((2*t.i + 3) * hh + (104729*(t.i + 1)) % 2147483647) % 2147483647) AS mh
          FROM h CROSS JOIN range(0, 16) t(i) GROUP BY 1, 2),
        bands AS (
          SELECT doc_id, CAST(i // 4 AS INTEGER) AS band,
                 string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bh
          FROM x GROUP BY doc_id, i // 4),
        bench AS (
          SELECT DISTINCT doc_id AS bench_doc_id, band, bh
          FROM bands WHERE doc_id % 97 = 0),
        pairs AS (
          SELECT DISTINCT bench.bench_doc_id, b.doc_id
          FROM bands b JOIN bench USING (band, bh)
          WHERE b.doc_id % 97 <> 0),
        c AS (
          SELECT bench_doc_id, CAST(count(*) AS BIGINT) AS n_leaking_docs
          FROM pairs GROUP BY 1)
        SELECT bd.bench_doc_id,
               coalesce(c.n_leaking_docs, 0) AS n_leaking_docs,
               coalesce(c.n_leaking_docs > 0, false) AS leaked
        FROM (SELECT DISTINCT doc_id AS bench_doc_id FROM bands WHERE doc_id % 97 = 0) bd
        LEFT JOIN c USING (bench_doc_id) ORDER BY bench_doc_id
      """)
    ),

    // --- vocabulary coverage curve (tokenizer-design artifact) ---
    // How much of the corpus token mass the top-k vocabulary words cover
    // (k = 10 / 100 / 1000) — the readout that sizes vocabularies and
    // predicts OOV rates before a tokenizer is trained. Word counts
    // partial-aggregate on the word key; the top-1000 slice comes from
    // TakeOrdered (distributed partial top-k — the vocabulary never
    // sorts through one reducer); the three cumulative masses reduce
    // over that BOUNDED 1000-row slice, and the total is a broadcast
    // 1-row aggregate. Coverage is exact-integer mass over mass at 6 dp.
    Q(
      "corpus_ngram_coverage",
      (s, d) => {
        val counts = t(s, d, "documents")
          .select(explode(ws).as("word"))
          .groupBy("word")
          .agg(count(lit(1)).as("n"))
          .pipe(Checkpoints.checkpoint) // two consumers: total + top slice
        val total = counts.agg(sum("n").as("total"))
        val top = counts
          .orderBy(desc("n"), asc("word"))
          .limit(1000)
          .withColumn("rk", row_number().over(Window.orderBy(desc("n"), asc("word"))))
        top
          .select(
            explode(
              array(
                when(col("rk") <= 10, lit(10)).otherwise(lit(null)).cast("int"),
                when(col("rk") <= 100, lit(100)).otherwise(lit(null)).cast("int"),
                when(col("rk") <= 1000, lit(1000)).otherwise(lit(null)).cast("int")
              )
            ).as("k"),
            col("n")
          )
          .filter(col("k").isNotNull)
          .groupBy("k")
          .agg(count(lit(1)).as("n_words"), sum("n").as("mass"))
          .crossJoin(broadcast(total))
          .withColumn(
            "coverage",
            round(col("mass").cast("double") / col("total").cast("double"), 6)
          )
          .select("k", "n_words", "mass", "coverage")
          .orderBy("k")
      },
      Some("""
        WITH c AS (
          SELECT word, CAST(count(*) AS BIGINT) AS n FROM (
            SELECT unnest(string_split(lower(trim(text)), ' ')) AS word FROM documents)
          GROUP BY word),
        tot AS (SELECT sum(n) AS total FROM c),
        top AS (
          SELECT n, row_number() OVER (ORDER BY n DESC, word) AS rk
          FROM c ORDER BY n DESC, word LIMIT 1000),
        e AS (
          SELECT k, n FROM top
          CROSS JOIN (SELECT unnest([10, 100, 1000]) AS k)
          WHERE rk <= k)
        SELECT CAST(e.k AS INTEGER) AS k, CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(e.n) AS BIGINT) AS mass,
               round(CAST(sum(e.n) AS DOUBLE) / t.total, 6) AS coverage
        FROM e CROSS JOIN tot t GROUP BY e.k, t.total ORDER BY k
      """)
    ),

    // --- deterministic train/val/test holdout manifest ---
    // The split every training run pins before anything else: docs deal
    // 98/1/1 into train/val/test by a seeded md5 bucket of the doc id —
    // stable across reruns, engines, and corpus growth (a doc's split
    // never changes when others arrive, unlike any rank-based split).
    // The emitted manifest is per-(split, lang) doc and token counts —
    // the artifact training configs reference. Plan: the split decision
    // is pure scan codegen (zero shuffles before the one partial
    // aggregate onto ≤3·|langs| rows at any corpus size).
    Q(
      "corpus_sample_holdout",
      (s, d) => {
        val bucket = pmod(
          conv(substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
            .cast("long"),
          lit(100)
        )
        val split = when(bucket < 98, "train").when(bucket < 99, "val").otherwise("test")
        t(s, d, "documents")
          .select(col("lang"), split.as("split"), size(ws).cast("long").as("n_tokens"))
          .groupBy("split", "lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"))
          .orderBy("split", "lang")
      },
      Some("""
        WITH x AS (
          SELECT lang,
                 CASE WHEN b < 98 THEN 'train' WHEN b < 99 THEN 'val' ELSE 'test' END AS split,
                 n_tokens
          FROM (
            SELECT lang,
                   ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                     % 100 AS b,
                   CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS n_tokens
            FROM documents))
        SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS tokens
        FROM x GROUP BY split, lang ORDER BY split, lang
      """)
    ),

    // --- sequence-packing APPLY: the per-document bin assignment ---
    // corpus_pack reports bin statistics; this materializes the layout a
    // trainer actually consumes (CorpusBuilder's pack stage, per doc):
    // md5-bucket shard, deterministic (h, doc_id) order within shard,
    // greedy running-sum offsets, seq id = offset div 512. All integer
    // arithmetic — exact across engines. Scale: one windowed pass per
    // 32-way shard, no global sort before the output ORDER BY.
    Q(
      "corpus_pack_apply",
      (s, d) => {
        val seqLen = 512L
        val w = Window.partitionBy("bucket").orderBy("h", "doc_id")
        t(s, d, "documents")
          .select(
            col("doc_id"),
            size(ws).cast("long").as("n_tokens"),
            bucketOf(32).as("bucket"),
            md5(col("doc_id").cast("string")).as("h")
          )
          .withColumn(
            "token_start",
            coalesce(
              sum(col("n_tokens")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
              lit(0L)
            )
          )
          .withColumn("seq_id", expr(s"token_start div $seqLen"))
          .withColumn(
            "crosses",
            expr(s"token_start div $seqLen") =!= expr(s"(token_start + n_tokens - 1) div $seqLen")
          )
          .select("doc_id", "bucket", "n_tokens", "token_start", "seq_id", "crosses")
          .orderBy("doc_id")
      },
      Some("""
        WITH docs AS (
          SELECT doc_id,
                 CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS n_tokens,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 32 AS bucket,
                 md5(CAST(doc_id AS VARCHAR)) AS h
          FROM documents),
        cum AS (
          SELECT doc_id, bucket, n_tokens,
                 CAST(coalesce(sum(n_tokens) OVER (
                   PARTITION BY bucket ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS token_start
          FROM docs)
        SELECT doc_id, bucket, n_tokens, token_start,
               CAST(token_start // 512 AS BIGINT) AS seq_id,
               token_start // 512 <> (token_start + n_tokens - 1) // 512 AS crosses
        FROM cum ORDER BY doc_id
      """)
    ),

    // --- token-budget APPLY: the per-document keep/drop decision ---
    // corpus_token_budget reports per-lang keep statistics under a fixed
    // mix; this is CorpusBuilder's stage 5 as a verifiable operator:
    // per-SOURCE budgets from the mass^0.7 mixture law over a 40% global
    // token budget, selection in deterministic md5-shard order. Budget
    // arithmetic is ALL integer: pw lifts to exact 6-dp micro-units
    // (decimal multiply, never a double cast), the global budget is
    // (2·total) div 5, and each source's share is a DECIMAL(38,0)
    // product with integral division — no FP boundary for the engines to
    // disagree on. Scale: the budget table is |sources| rows (broadcast);
    // running sums shard over (source, bucket).
    Q(
      "corpus_budget_apply",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(
            col("doc_id"),
            col("source"),
            size(ws).cast("long").as("n_tokens"),
            bucketOf(32).as("bucket"),
            md5(col("doc_id").cast("string")).as("h")
          )
          .pipe(Checkpoints.checkpoint)
        val perSource = docs
          .groupBy("source")
          .agg(sum("n_tokens").as("mass"))
          .withColumn(
            "pw_int",
            (round(pow(col("mass").cast("double"), 0.7), 6).cast("decimal(28,6)") * 1000000)
              .cast("long")
          )
        val tot = perSource.agg(
          sum("pw_int").as("tot_pw"),
          sum("mass").as("tot_mass")
        )
        val budgets = perSource
          .crossJoin(broadcast(tot))
          .withColumn(
            "budget",
            expr("CAST((CAST(pw_int AS DECIMAL(38,0)) * ((2 * tot_mass) div 5)) div tot_pw AS BIGINT)")
          )
          .select("source", "budget")
        val bucketPrefix = docs
          .groupBy("source", "bucket")
          .agg(sum("n_tokens").as("bt"))
          .withColumn(
            "bp",
            coalesce(
              sum(col("bt")).over(
                Window.partitionBy("source").orderBy("bucket")
                  .rowsBetween(Window.unboundedPreceding, -1)
              ),
              lit(0L)
            )
          )
          .select("source", "bucket", "bp")
        val intra = Window.partitionBy("source", "bucket").orderBy("h", "doc_id")
        docs
          .withColumn(
            "cb",
            coalesce(
              sum(col("n_tokens")).over(intra.rowsBetween(Window.unboundedPreceding, -1)),
              lit(0L)
            )
          )
          .join(broadcast(bucketPrefix), Seq("source", "bucket"))
          .join(broadcast(budgets), Seq("source"))
          .select(
            col("doc_id"),
            col("source"),
            col("n_tokens"),
            (col("bp") + col("cb") < col("budget")).as("kept")
          )
          .orderBy("doc_id")
      },
      Some("""
        WITH docs AS (
          SELECT doc_id, source,
                 CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS n_tokens,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 32 AS bucket,
                 md5(CAST(doc_id AS VARCHAR)) AS h
          FROM documents),
        per_src AS (
          SELECT source, sum(n_tokens) AS mass,
                 CAST(CAST(round(pow(CAST(sum(n_tokens) AS DOUBLE), 0.7), 6) AS DECIMAL(28,6))
                      * 1000000 AS BIGINT) AS pw_int
          FROM docs GROUP BY source),
        tot AS (SELECT sum(pw_int) AS tot_pw, sum(mass) AS tot_mass FROM per_src),
        budgets AS (
          SELECT source,
                 CAST((pw_int::HUGEINT * ((2 * tot_mass) // 5)) // tot_pw AS BIGINT) AS budget
          FROM per_src CROSS JOIN tot),
        bp AS (
          SELECT source, bucket,
                 coalesce(sum(sum(n_tokens)) OVER (
                   PARTITION BY source ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bp
          FROM docs GROUP BY source, bucket),
        cum AS (
          SELECT d.doc_id, d.source, d.n_tokens,
                 bp.bp + coalesce(sum(d.n_tokens) OVER (
                   PARTITION BY d.source, d.bucket ORDER BY d.h, d.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
          FROM docs d JOIN bp ON d.source = bp.source AND d.bucket = bp.bucket)
        SELECT c.doc_id, c.source, c.n_tokens, c.before < b.budget AS kept
        FROM cum c JOIN budgets b ON c.source = b.source
        ORDER BY c.doc_id
      """)
    ),

    // --- data-constrained repeat factors (epochs per source) ---
    // The "data recipe" readout for a token budget LARGER than the corpus
    // (Muennighoff et al., Scaling Data-Constrained Language Models):
    // when the training budget (here 3× the corpus mass) exceeds the
    // available tokens, each source REPEATS to fill its mixture share —
    // target_s = B · pw_s/Σpw with the mass^0.7 law, epochs_s =
    // target_s/mass_s — and repeats past ~4 epochs stop helping, so the
    // effective allocation caps there (the spill a planner would
    // re-mix). FP discipline: targets in exact integers (6-dp micro-unit
    // pw lift, DECIMAL(38,0) product, integral division — the
    // corpus_budget_apply recipe); epochs is an int/int ratio rounded at
    // 6 dp (safe IEEE); the cap compare and effective tokens are pure
    // integer arithmetic. Plan: one partial-aggregated groupBy on source
    // plus a 1-row broadcast total — |sources| rows at any corpus size.
    Q(
      "corpus_epochs",
      (s, d) => {
        // The shared epochsPlanOver seam (also the CorpusBuilder persisted
        // repeat plan): checkpointed per-source masses, broadcast total,
        // exact-integer targets; budget here is 3x the corpus mass.
        Corpus
          .epochsPlanOver(
            t(s, d, "documents")
              .groupBy("source")
              .agg(sum(size(ws).cast("long")).as("mass")),
            expr("3 * tot_mass")
          )
          .orderBy("source")
      },
      Some("""
        WITH per_src AS (
          SELECT source,
                 CAST(sum(CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT))
                      AS BIGINT) AS mass
          FROM documents GROUP BY source),
        pw AS (
          SELECT source, mass,
                 CAST(CAST(round(pow(CAST(mass AS DOUBLE), 0.7), 6) AS DECIMAL(28,6))
                      * 1000000 AS BIGINT) AS pw_int
          FROM per_src),
        tot AS (SELECT sum(pw_int) AS tot_pw, sum(mass) AS tot_mass FROM pw),
        tgt AS (
          SELECT source, mass,
                 CAST((pw_int::HUGEINT * (3 * tot_mass)) // tot_pw AS BIGINT) AS target_tokens
          FROM pw CROSS JOIN tot)
        SELECT source, mass, target_tokens,
               round(CAST(target_tokens AS DOUBLE) / mass, 6) AS epochs,
               target_tokens > mass * 4 AS capped,
               CAST(least(target_tokens, mass * 4) AS BIGINT) AS effective_tokens
        FROM tgt ORDER BY source
      """)
    ),

    // --- apply the repeat plan: the epoch-expanded training stream ---
    // corpus_epochs says HOW MANY epochs each source repeats for a
    // data-constrained budget; this MATERIALIZES that recipe (r10): every
    // doc of a source appears once per full epoch (0..full-1), plus a
    // partial epoch `full` filled in deterministic md5 order until the
    // remainder tokens are consumed — the corpus_token_budget selection
    // rule applied to the leftover budget, so the emitted stream's token
    // mass covers effective_tokens per source, overshooting only into
    // the final admitted doc (exact at zero remainder). Scale: the explode
    // factor is BOUNDED BY THE 4-EPOCH CAP (never a data-sized blowup);
    // the plan table is a |sources|-row broadcast; the partial-epoch
    // running sum shards over (source, bucket) with a broadcast
    // |sources|×32-row prefix table — the token_budget posture, no
    // global window. FP: everything integer (div/% on BIGINTs).
    Q(
      "corpus_repeat_apply",
      (s, d) => Corpus.repeatApplyFrom(s, d).orderBy("source", "epoch", "doc_id"),
      Some(RepeatApplyOracle)
    ),

    // --- quality-signal calibration: heuristic score vs LM log-likelihood ---
    // The "which quality gate should I trust" audit a curation pipeline
    // runs before picking thresholds: bucket docs by the HEURISTIC
    // curate score's decile and report each decile's mean LM avg-logp
    // (the corpus_lm_quality recipe), plus an OLS fit of logp ~ score
    // through the shared Q.olsFitOver seam — a near-zero slope means the
    // cheap heuristic is NOT a proxy for model quality on this corpus,
    // and a decile whose mean breaks the monotone trend localizes where
    // the heuristic lies. FP discipline: per-token logp rounds at 6 dp
    // and DECIMAL-sums (lm_quality recipe), per-doc means half-up in
    // exact micro-units, decile means likewise off round-before-cast
    // micro lifts; the heuristic score is an engine-identical IEEE chain
    // (text_quality relies on the same bit-identity). Plan: one token
    // shuffle + one doc aggregate (the lm_quality posture), a broadcast
    // vocab total, a ≤10-row decile rollup and a 1-row broadcast fit —
    // the per-doc table checkpoints for its two consumers.
    Q(
      "corpus_quality_calibration",
      (s, d) => {
        val docs = t(s, d, "documents")
        val tok = docs
          .select(col("doc_id"), explode(ws).as("word"))
          .pipe(Checkpoints.checkpoint)
        val counts = tok.groupBy("word").agg(count(lit(1)).as("c"))
        val totals = counts.agg(sum("c").as("n_total"), count(lit(1)).as("vocab"))
        val logp = counts
          .crossJoin(broadcast(totals))
          .select(
            col("word"),
            round(
              log((col("c") + 1).cast("double") / (col("n_total") + col("vocab")).cast("double")),
              6
            ).cast("decimal(18,6)").as("logp")
          )
        val scored = tok
          .join(logp, "word")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"), sum("logp").as("sum_logp"))
          .withColumn("m", (col("sum_logp") * 1000000).cast("long"))
          .withColumn("avg_logp", Q.halfUpMicroAvg("m", "n_tokens"))
          .select("doc_id", "avg_logp")
        val joined = scored
          .join(docs.select(col("doc_id"), TextOps.curateScore(col("text")).as("q")), "doc_id")
          .pipe(Checkpoints.checkpoint)
        val fit = Q.olsFitOver(
          joined.select(round(col("q"), 6).as("x"), col("avg_logp").as("y"))
        )
        joined
          .withColumn("decile", least(floor(col("q") * 10), lit(9)).cast("long"))
          .withColumn("lm", expr("CAST(round(avg_logp * 1000000) AS BIGINT)"))
          .groupBy("decile")
          .agg(count(lit(1)).as("n_docs"), sum("lm").as("mm"))
          .withColumn("mean_logp", Q.halfUpMicroAvg("mm", "n_docs"))
          .crossJoin(broadcast(fit.select(col("slope"), col("intercept"))))
          .select("decile", "n_docs", "mean_logp", "slope", "intercept")
          .orderBy("decile")
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS word
          FROM documents),
        counts AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY word),
        tot AS (SELECT sum(c) AS n_total, count(*) AS vocab FROM counts),
        logp AS (
          SELECT word,
                 CAST(round(ln(CAST(c + 1 AS DOUBLE) / CAST(n_total + vocab AS DOUBLE)), 6)
                      AS DECIMAL(18,6)) AS logp
          FROM counts CROSS JOIN tot),
        scored0 AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(logp) * 1000000 AS BIGINT) AS m
          FROM tok JOIN logp USING (word) GROUP BY doc_id),
        scored AS (
          SELECT doc_id,
                 CAST(CASE WHEN m >= 0 THEN (2 * m + n_tokens) // (2 * n_tokens)
                           ELSE -((2 * (-m) + n_tokens) // (2 * n_tokens)) END AS DOUBLE)
                   / 1000000.0 AS avg_logp
          FROM scored0),
        quality AS (
          SELECT doc_id,
                 least(CAST(len(string_split(lower(trim(text)), ' ')) AS DOUBLE) / 50.0, 1.0)
                   * 0.5
                 + (1.0 - CAST(len(list_filter(string_split(lower(trim(text)), ' '),
                        w -> w IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
                        / CAST(len(string_split(lower(trim(text)), ' ')) AS DOUBLE)) * 0.5 AS q
          FROM documents),
        joined AS (
          SELECT s.doc_id, s.avg_logp, qu.q
          FROM scored s JOIN quality qu ON s.doc_id = qu.doc_id),
        pts AS (
          SELECT CAST(round(q, 6) AS DECIMAL(18,6)) AS x,
                 CAST(avg_logp AS DECIMAL(18,6)) AS y
          FROM joined),
        a AS (
          SELECT CAST(count(*) AS BIGINT) AS n_points,
                 CAST(sum(x) AS DECIMAL(38,6)) AS sx,
                 CAST(sum(y) AS DECIMAL(38,6)) AS sy,
                 CAST(sum(x * y) AS DECIMAL(38,12)) AS sxy,
                 CAST(sum(x * x) AS DECIMAL(38,12)) AS sxx
          FROM pts),
        fit AS (
          SELECT round((CAST(n_points AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n_points AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
                 round((CAST(sy AS DOUBLE)
                        - ((CAST(n_points AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / (CAST(n_points AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                          * CAST(sx AS DOUBLE)) / CAST(n_points AS DOUBLE), 6) AS intercept
          FROM a),
        dec AS (
          SELECT least(CAST(floor(q * 10) AS BIGINT), 9) AS decile,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(CAST(round(avg_logp * 1000000) AS BIGINT)) AS BIGINT) AS mm
          FROM joined GROUP BY 1)
        SELECT decile, n_docs,
               CAST(CASE WHEN mm >= 0 THEN (2 * mm + n_docs) // (2 * n_docs)
                         ELSE -((2 * (-mm) + n_docs) // (2 * n_docs)) END AS DOUBLE)
                 / 1000000.0 AS mean_logp,
               f.slope, f.intercept
        FROM dec CROSS JOIN fit f
        ORDER BY decile
      """)
    ),

    // --- deterministic training-order shuffle (seeded, resumable) ---
    // The trainer-facing global permutation: every epoch needs a
    // reproducible pseudo-random document order, and a resumable job
    // needs to restart mid-epoch from a cursor. A global row_number is a
    // single-reducer sort at any scale, so the permutation SHARDs: each
    // doc hashes to one of 64 shards by md5(seed||id) and takes its
    // position within the shard from the same hash — reading shards in
    // (shard, pos) order IS the epoch order, and a cursor is just a
    // (shard, pos) pair. Changing the seed re-deals everything (a new
    // epoch permutation); the plan is one hash shuffle on the shard key
    // plus a per-shard window — no global sort but the presentation
    // ORDER BY.
    Q(
      "corpus_shuffle",
      (s, d) => {
        val h = md5(concat(lit("7:"), col("doc_id").cast("string")))
        val w = Window.partitionBy("shard").orderBy("h", "doc_id")
        t(s, d, "documents")
          .select(
            col("doc_id"),
            h.as("h"),
            pmod(conv(substring(h, 1, 15), 16, 10).cast("long"), lit(64)).as("shard")
          )
          .withColumn("pos", row_number().over(w).cast("long"))
          .select("doc_id", "shard", "pos")
          .orderBy("shard", "pos")
      },
      Some("""
        WITH h AS (
          SELECT doc_id, md5('7:' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
        sh AS (
          SELECT doc_id, h,
                 ('0x' || substr(h, 1, 15))::BIGINT % 64 AS shard
          FROM h)
        SELECT doc_id, shard,
               CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
        FROM sh ORDER BY shard, pos
      """)
    ),

    // --- per-document novelty: fraction of first-seen word trigrams ---
    // The marginal-contribution signal data-selection pipelines rank by
    // (e.g. "does this crawl snapshot add anything the corpus lacks?"):
    // a document's novelty is the fraction of its DISTINCT word trigrams
    // whose first appearance (min doc_id — ingestion order here) is this
    // document. Boilerplate-heavy late duplicates score near 0, genuinely
    // new material near 1 — the aggregate view the pairwise dedup family
    // can't give cheaply. Plan: distinct (doc, gram) pairs — one
    // gram+doc-keyed shuffle, never raw text — feed BOTH aggregates:
    // per-doc totals (doc-keyed count) and gram→min-doc (gram-keyed min,
    // partial-aggregated so a corpus-wide stop-trigram like "of the and"
    // combines map-side instead of funnelling rows to one reducer); novel
    // counts group that |vocab|-sized table by its min doc, and the final
    // doc-keyed join is |docs|×|docs|-sized — no pair join anywhere, so
    // the op is linear in corpus token volume at any scale. The pair set
    // is checkpointed once for its two consumers. Novelty is a safe
    // int/int ratio rounded at 6 dp.
    Q(
      "corpus_novelty",
      (s, d) => {
        val grams = t(s, d, "documents")
          .select(col("doc_id"), ws.as("w"))
          .filter(size(col("w")) >= 3)
          .select(
            col("doc_id"),
            explode(
              expr("""transform(sequence(1, size(w) - 2),
                                i -> concat(element_at(w, i), ' ', element_at(w, i + 1),
                                            ' ', element_at(w, i + 2)))""")
            ).as("g")
          )
          .distinct()
          .pipe(Checkpoints.checkpoint) // two consumers: totals + first-seen
        val total = grams.groupBy("doc_id").agg(count(lit(1)).as("grams"))
        val novel = grams
          .groupBy("g")
          .agg(min("doc_id").as("doc_id"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("novel"))
        total
          .join(novel, Seq("doc_id"), "left")
          .withColumn("novel", coalesce(col("novel"), lit(0L)))
          .withColumn(
            "novelty",
            round(col("novel").cast("double") / col("grams").cast("double"), 6)
          )
          .select("doc_id", "grams", "novel", "novelty")
          .orderBy("doc_id")
      },
      Some("""
        WITH t AS (
          SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
        f AS (SELECT doc_id, w FROM t WHERE len(w) >= 3),
        g AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, len(w) - 1),
                        i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i AS INTEGER) + 1]
                             || ' ' || w[CAST(i AS INTEGER) + 2])) AS g
          FROM f),
        tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS grams FROM g GROUP BY doc_id),
        fm AS (SELECT g, min(doc_id) AS doc_id FROM g GROUP BY g),
        nov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS novel FROM fm GROUP BY doc_id)
        SELECT t.doc_id, t.grams, CAST(COALESCE(n.novel, 0) AS BIGINT) AS novel,
               round(CAST(COALESCE(n.novel, 0) AS DOUBLE) / t.grams, 6) AS novelty
        FROM tot t LEFT JOIN nov n ON t.doc_id = n.doc_id ORDER BY t.doc_id
      """)
    ),

    // --- proportional source interleave (stride-scheduled mixing order) ---
    // The trainer-facing complement of corpus_shuffle: instead of one
    // global pseudo-random deal, every source's documents spread EVENLY
    // over the epoch — the r-th of a source's n docs runs at virtual time
    // (2r−1)/(2n) ∈ (0,1), so all sources finish together and no window of
    // training is ever dominated by one source (stride scheduling, the
    // deterministic analog of proportional sampling). A per-source global
    // rank is the scale hazard here — one giant source would row_number
    // through a single reducer — so the rank stitches exactly like
    // corpus_token_budget's running sums: docs land in (source, md5-bucket)
    // partitions, rank within the bucket is a keyed window over the hash
    // order, and the cross-bucket offsets come from a metadata-sized
    // (|sources|×32-row) per-bucket count table that broadcasts back. The
    // within-source order is therefore the (bucket, h) hash order — a
    // deterministic pseudo-random deal, same contract as corpus_shuffle.
    // vtime is ONE IEEE division of exact integers (identical cross-engine)
    // and (vtime, source, doc_id) IS the epoch order and the resume
    // cursor; the only global sort is the presentation ORDER BY.
    Q(
      "corpus_interleave",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(
            col("doc_id"),
            col("source"),
            bucketOf(32).as("bucket"),
            md5(concat(lit("7:"), col("doc_id").cast("string"))).as("h")
          )
          .pipe(Checkpoints.checkpoint) // three consumers: totals, prefixes, ranks
        val nSrc = docs.groupBy("source").agg(count(lit(1)).as("n_src"))
        val bucketPrefix = docs
          .groupBy("source", "bucket")
          .agg(count(lit(1)).as("bucket_n"))
          .withColumn(
            "bucket_prefix",
            coalesce(
              sum(col("bucket_n")).over(
                Window.partitionBy("source").orderBy("bucket")
                  .rowsBetween(Window.unboundedPreceding, -1)
              ),
              lit(0L)
            )
          )
          .select("source", "bucket", "bucket_prefix")
        val intra = Window.partitionBy("source", "bucket").orderBy("h", "doc_id")
        docs
          .withColumn("intra_rank", row_number().over(intra).cast("long"))
          .join(broadcast(bucketPrefix), Seq("source", "bucket"))
          .join(broadcast(nSrc), Seq("source"))
          .withColumn("src_rank", col("bucket_prefix") + col("intra_rank"))
          .withColumn(
            "vtime",
            (lit(2) * col("src_rank") - lit(1)).cast("double") /
              (lit(2) * col("n_src")).cast("double")
          )
          .select("doc_id", "source", "src_rank", "vtime")
          .orderBy("vtime", "source", "doc_id")
      },
      Some("""
        WITH docs AS (
          SELECT doc_id, source,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 32 AS bucket,
                 md5('7:' || CAST(doc_id AS VARCHAR)) AS h
          FROM documents),
        ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src FROM docs GROUP BY source),
        bp AS (
          SELECT source, bucket,
                 coalesce(sum(count(*)) OVER (
                   PARTITION BY source ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bucket_prefix
          FROM docs GROUP BY source, bucket),
        ranked AS (
          SELECT d.doc_id, d.source,
                 CAST(bp.bucket_prefix
                      + row_number() OVER (PARTITION BY d.source, d.bucket
                                           ORDER BY d.h, d.doc_id) AS BIGINT) AS src_rank
          FROM docs d JOIN bp ON d.source = bp.source AND d.bucket = bp.bucket)
        SELECT r.doc_id, r.source, r.src_rank,
               CAST(2 * r.src_rank - 1 AS DOUBLE) / CAST(2 * n.n_src AS DOUBLE) AS vtime
        FROM ranked r JOIN ns n ON r.source = n.source
        ORDER BY vtime, r.source, r.doc_id
      """)
    ),

    // --- source concentration: coverage curve + shares ---
    // The corpus-imbalance readout pipelines alarm on (one crawl dump
    // quietly becoming 80% of the tokens): per-source token mass, share,
    // and the cumulative share of the top-k sources in mass order. The
    // event-scale work is one partial-aggregated (source → token sum);
    // the ranking window runs single-partition BY DESIGN on the
    // |sources|-row aggregate — bounded by the source catalog, not the
    // corpus, exactly like q_anomaly_days' calendar window. Shares are
    // int/int divisions of exact token masses rounded at 6 dp; ties in
    // mass order break by source name.
    Q(
      "corpus_source_diversity",
      (s, d) => {
        // Two consumers (the ranked rows + the broadcast total): checkpoint
        // or the corpus tokenizes twice.
        val masses = t(s, d, "documents")
          .groupBy("source")
          .agg(sum(size(ws).cast("long")).as("mass"))
          .pipe(Checkpoints.checkpoint)
        val ord = Window.orderBy(desc("mass"), asc("source"))
        masses
          .withColumn("rank", row_number().over(ord).cast("int"))
          .withColumn("cum_mass", sum("mass").over(ord.rowsBetween(Window.unboundedPreceding, 0)))
          .crossJoin(broadcast(masses.agg(sum("mass").as("total"))))
          .withColumn("share", round(col("mass").cast("double") / col("total").cast("double"), 6))
          .withColumn(
            "cum_share",
            round(col("cum_mass").cast("double") / col("total").cast("double"), 6)
          )
          .select("rank", "source", "mass", "share", "cum_share")
          .orderBy("rank")
      },
      Some("""
        WITH m AS (
          SELECT source, CAST(sum(len(string_split(lower(trim(text)), ' '))) AS BIGINT) AS mass
          FROM documents GROUP BY source),
        t AS (SELECT sum(mass) AS total FROM m),
        r AS (
          SELECT source, mass,
                 CAST(row_number() OVER (ORDER BY mass DESC, source) AS INTEGER) AS rank,
                 CAST(sum(mass) OVER (ORDER BY mass DESC, source
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_mass
          FROM m)
        SELECT r.rank, r.source, r.mass,
               round(CAST(r.mass AS DOUBLE) / t.total, 6) AS share,
               round(CAST(r.cum_mass AS DOUBLE) / t.total, 6) AS cum_share
        FROM r CROSS JOIN t ORDER BY r.rank
      """)
    ),

    // --- cross-source duplication matrix: who copies whom ---
    // The provenance question behind source weighting: how many near-dup
    // pairs land WITHIN each source vs BETWEEN each source pair. Mirror
    // sites, syndication and scraped re-posts show up as heavy
    // off-diagonal cells; a source that mostly duplicates itself is a
    // template farm. The pair set is LITERALLY `dedup_minhash_lsh`'s
    // candidate set (the shared `lshCandidatePairsFrom` — banded bucket
    // join, never all-pairs); each side joins to the doc→source map on
    // its doc id (shuffle joins on corpus keys at scale, auto-broadcast
    // at test SF), the unordered source pair normalizes through
    // least/greatest, and the rollup partial-combines onto the
    // |sources|²-row key space.
    Q(
      "corpus_cross_source_dup",
      (s, d) => {
        val docs = t(s, d, "documents")
        val srcs = docs.select(col("doc_id"), col("source"))
        Dedup
          .lshCandidatePairsFrom(s, docs)
          .join(srcs.select(col("doc_id").as("d1"), col("source").as("s1")), "d1")
          .join(srcs.select(col("doc_id").as("d2"), col("source").as("s2")), "d2")
          .groupBy(
            least(col("s1"), col("s2")).as("source_a"),
            greatest(col("s1"), col("s2")).as("source_b")
          )
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("source_a", "source_b")
      },
      Some("""
        WITH w AS (
          SELECT DISTINCT doc_id, word FROM (
            SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS word FROM documents)),
        h AS (
          SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT % 2147483647 AS hh FROM w),
        x AS (
          SELECT doc_id, t.i,
                 min(((2*t.i + 3) * hh + (104729*(t.i + 1)) % 2147483647) % 2147483647) AS mh
          FROM h CROSS JOIN range(0, 16) t(i) GROUP BY 1, 2),
        banded AS (
          SELECT doc_id, i // 4 AS band, list(mh ORDER BY i) AS sig
          FROM x GROUP BY doc_id, i // 4),
        pairs AS (
          SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)
        SELECT least(da.source, db.source) AS source_a,
               greatest(da.source, db.source) AS source_b,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM pairs JOIN documents da ON pairs.d1 = da.doc_id
                   JOIN documents db ON pairs.d2 = db.doc_id
        GROUP BY 1, 2 ORDER BY source_a, source_b
      """)
    )
  )
}
