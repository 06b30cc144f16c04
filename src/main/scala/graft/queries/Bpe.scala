package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding token accounting (the trainer-facing token counts —
  * budgets/mixes/epochs quoted in tokenizer tokens, not whitespace tokens).
  *
  * Classic word-frequency BPE (Sennrich et al., ACL 2016, public
  * algorithm): learning runs over the DISTINCT-WORD table with corpus
  * counts as weights — vocabulary-sized, never corpus-sized — so each of
  * the K merge iterations is one aggregate over |vocab| rows plus a
  * one-row argmax `collect()` (metadata, the kmeans-centroid pattern). At
  * 100 TB the corpus contributes exactly one pass (the word count) and one
  * shuffle join (counts back onto docs); everything else is vocab-scale.
  *
  * Cross-engine determinism (the DuckDB oracle unrolls the same K stages):
  *   - BPE runs over `[a-z0-9]+` words only (the alphabet-bounded pair
  *     space); any other whitespace token counts as ONE token (an unknown
  *     token), so delimiter characters below can never occur in a symbol.
  *   - A segmentation is one string: symbols joined by `..` and wrapped in
  *     `..`  (e.g. `..h..e..y..`). Merging pair (a,b) is
  *     `replace(s, '.a..b.', '.ab.')` — both engines' plain `replace` scans
  *     left-to-right and resumes AFTER each replacement, which is exactly
  *     BPE's greedy non-overlapping merge (`aaaa` + (a,a) → `aa aa`), and
  *     the double-dot boundary keeps one dot on each side so adjacent
  *     matches still see their delimiter.
  *   - Merge rank ties break on (weighted count DESC, pair ASC) — exact
  *     integer counts, total order.
  */
object Bpe {

  /** Merges learned by default (the query's K and build-corpus's). */
  val DefaultMerges = 8

  private def symsOf(sCol: String): String =
    s"filter(split($sCol, '\\\\.\\\\.'), x -> x != '')"

  private def initialSeg(vw: DataFrame): DataFrame =
    vw.withColumn(
      "s",
      concat(
        lit(".."),
        array_join(
          expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
          ".."
        ),
        lit("..")
      )
    )

  /** Learn up to `k` merges over the weighted word table `vw`
    * (`word`, `wn`): returns the ORDERED merge pairs (`"a.b"` strings,
    * rank order) plus the segmented vocab. Checkpointed per iteration:
    * each merge both feeds the next pair count and the final
    * segmentation, and the argmax runs a job per iteration anyway.
    * Training is the expensive/stateful half — persist its output with
    * [[Tokenizer.build]] and re-apply it for months ([[segmentWith]]),
    * the same build/probe split as the ANN index.
    */
  def learn(vw: DataFrame, k: Int): (Vector[String], DataFrame) = {
    var vocab = Checkpoints.checkpoint(initialSeg(vw))
    val learned = Vector.newBuilder[String]
    var i = 0
    var exhausted = false
    while (i < k && !exhausted) {
      val best = vocab
        .select(col("wn"), expr(symsOf("s")).as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(
          col("wn"),
          explode(
            expr(
              "transform(sequence(1, size(syms) - 1), " +
                "i -> concat(element_at(syms, i), '.', element_at(syms, i + 1)))"
            )
          ).as("pr")
        )
        .groupBy("pr")
        .agg(sum("wn").as("c"))
        .orderBy(desc("c"), asc("pr"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val pr = best(0).getString(0)
        learned += pr
        val Array(a, b) = pr.split("\\.", 2)
        vocab = Checkpoints.checkpoint(
          vocab.withColumn("s", expr(s"replace(s, '.$a..$b.', '.$a$b.')"))
        )
      }
      i += 1
    }
    (learned.result(), vocab)
  }

  /** `(word, nsym)` after learning `k` merges over `vw` — trains inline. */
  def segmentationOver(vw: DataFrame, k: Int): DataFrame = {
    val (_, vocab) = learn(vw, k)
    vocab.select(col("word"), expr(s"CAST(size(${symsOf("s")}) AS BIGINT)").as("nsym"))
  }

  /** `(word, nsym)` from a PRE-LEARNED ordered merge list — the apply-only
    * path. No argmax jobs, no checkpoints: the whole merge sequence folds
    * into ONE nested-replace column expression (codegen'd, map-side), so
    * applying a persisted tokenizer to 100 TB is a single corpus pass.
    */
  def segmentWith(vw: DataFrame, merges: Seq[String]): DataFrame = {
    val seg = merges.foldLeft(initialSeg(vw)) { (acc, pr) =>
      val Array(a, b) = pr.split("\\.", 2)
      acc.withColumn("s", expr(s"replace(s, '.$a..$b.', '.$a$b.')"))
    }
    seg.select(col("word"), expr(s"CAST(size(${symsOf("s")}) AS BIGINT)").as("nsym"))
  }

  /** Per-doc counts after learning `k` merges on `docs` itself:
    * `(doc_id, n_words, n_bpe_tokens)` — whitespace tokens and their
    * BPE-applied mass (non-`[a-z0-9]+` tokens count 1).
    */
  def tokenCounts(docs: DataFrame, k: Int): DataFrame =
    tokenCountsOver(docs, segmentationOver(_, k))

  /** Per-doc counts applying a PRE-LEARNED merge list (see
    * [[segmentWith]]): the persisted-tokenizer serving path.
    */
  def tokenCountsWith(docs: DataFrame, merges: Seq[String]): DataFrame =
    tokenCountsOver(docs, segmentWith(_, merges))

  private def tokenCountsOver(docs: DataFrame, seg: DataFrame => DataFrame): DataFrame = {
    val dw = docs.select(
      col("doc_id"),
      explode(split(lower(trim(col("text"))), " ")).as("word")
    )
    val vw = dw
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy("word")
      .agg(count(lit(1)).as("wn"))
    dw.join(seg(vw), Seq("word"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(coalesce(col("nsym"), lit(1L))).as("n_bpe_tokens")
      )
  }
}
