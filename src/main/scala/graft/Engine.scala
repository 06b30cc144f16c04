package graft

import scala.util.chaining._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{
  DoubleType,
  IntegerType,
  LongType,
  StringType,
  StructField,
  StructType,
  TimestampType
}

import graft.log.{LogConfig, SparkLog}
import graft.server.{Acl, LogService}

/** Composition root — the analog of the reference's Agent
  * (reference: internal/agent/agent.go:49-68): wires the session, the
  * commit log, the service surface, and streaming ingest into one handle.
  * Raft/Serf/cmux collapse into Spark's driver/executor model (SURVEY §2.5):
  * the driver is the single writer (total order without consensus), any
  * executor serves relaxed reads, and the cluster manager owns membership.
  */
class Engine(
    val spark: SparkSession,
    val dataDir: String,
    val config: LogConfig = LogConfig(),
    val acl: Acl = Acl.rootOnly,
    val nodeName: String = "driver-0",
    /** Opt-in RocksDB state store for this engine's streaming queries
      * ([[curateFrom]]'s cross-batch dedup and any stateful pipeline run on
      * this session). The default HDFS-backed provider keeps every state
      * row on the JVM heap — fine for tests, hostile to a corpus-scale
      * dedup whose key set grows forever; RocksDB spills state to local
      * disk with bounded heap (SST + block cache) and changelog
      * checkpointing uploads per-batch deltas instead of full snapshots.
      */
    rocksdbStateStore: Boolean = false,
    /** Address this node advertises through GetServers — must be dialable
      * by clients when a network server fronts this engine (the balanced
      * client resolves members from it). Defaults to a non-network marker
      * for library-only use; `serve`/`serve-grpc` pass the real bind.
      */
    val rpcAddr: String = "local[*]",
    /** Additional cluster members to advertise (see [[LogService.peers]]). */
    val peers: Seq[graft.server.ServerInfo] = Nil,
    /** Whether this node is the cluster's single writer (the deployer's
      * Raft-leadership stand-in — see [[LogService.isLeader]]). A replica
      * serving a pull-replicated copy passes false and announces itself to
      * the leader via the membership layer.
      */
    val isLeader: Boolean = true,
    /** Liveness TTL for announced members (see [[Membership.ttlMillis]]). */
    val memberTtlMillis: Long = 0L,
    /** φ accrual suspicion threshold (see [[Membership.phiThreshold]]). */
    val memberPhiThreshold: Double = 0.0
) {
  if (rocksdbStateStore) Engine.enableRocksDBStateStore(spark)

  val log: SparkLog = SparkLog(spark, dataDir, config)
  val service: LogService =
    new LogService(
      log, acl, nodeName, rpcAddr, isLeader = isLeader, peers,
      memberTtlMillis = memberTtlMillis,
      memberPhiThreshold = memberPhiThreshold
    )

  graft.functions.GraftFunctions.register(spark)

  /** Streaming ingest: every micro-batch of `stream`'s `value` column
    * commits through the single-writer append path — the fsm.Apply of our
    * write path (reference: internal/log/distributed_fsm.go:25-46).
    * Exactly-once: the batch id commits inside the same atomic manifest
    * swap as the data (`appendDF` idempotence token), so a foreachBatch
    * retry after a crash between append and checkpoint re-applies nothing.
    */
  def ingest(
      stream: DataFrame,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      sourceName: String = "ingest"
  ): StreamingQuery =
    stream
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        val batch = df.select(col("value").cast("binary").as("value"))
        log.appendDF(batch, Some(sourceName -> batchId))
        ()
      }
      .start()

  /** Pull replication from a peer log (reference: the legacy Replicator,
    * internal/log/replicator.go:25-100 — a per-peer goroutine draining
    * `ConsumeStream(0)` into local `Produce`, which the reference's own
    * tests acknowledge can duplicate records, internal/agent/agent_test
    * .go:74). Our composition is strictly stronger: the graft streaming
    * source tails the peer with exact offset cursors, and ingest's
    * idempotence tokens make every batch exactly-once across restarts —
    * no dedup gap. Records are re-sequenced into LOCAL offsets, like the
    * reference's replicator (produce-side append, not offset cloning).
    */
  def replicateFrom(
      peerDir: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      maxRecordsPerBatch: Option[Long] = None
  ): StreamingQuery = {
    val reader = spark.readStream.format("graft")
    maxRecordsPerBatch.foreach(n => reader.option("maxRecordsPerBatch", n))
    ingest(
      reader.load(peerDir).select(col("value")),
      checkpoint,
      trigger,
      sourceName = s"replicate-${Engine.tokenSafe(peerDir)}"
    )
  }

  /** Streaming corpus curation: tail a raw document log (JSON payloads
    * `{"lang":…,"text":…}`), apply the training-data gates — language
    * allowlist, minimum length — drop exact duplicates ACROSS micro-batches
    * (stateful streaming dedup keyed on the normalized content hash), and
    * commit the survivors into THIS engine's log exactly-once. The
    * streaming twin of the batch `corpus_curate` query: a curated corpus
    * that stays current as raw documents keep arriving, with the same
    * offset-cursor tail + idempotence-token commit as [[replicateFrom]].
    *
    * Scale notes: the gates are stateless row filters (scan-stage codegen);
    * only the hash — 32 bytes per distinct kept document, not the text —
    * enters the dedup state store. The state is unbounded by design (a
    * duplicate is a duplicate forever); production deployments at corpus
    * scale should pair this with the RocksDB state store provider rather
    * than the in-memory default.
    */
  def curateFrom(
      peerDir: String,
      checkpoint: String,
      langs: Seq[String] = Seq("en"),
      minChars: Int = 50,
      trigger: Trigger = Trigger.ProcessingTime("1 second")
  ): StreamingQuery = {
    val docSchema = StructType(
      Seq(StructField("lang", StringType), StructField("text", StringType))
    )
    val curated = spark.readStream
      .format("graft")
      .load(peerDir)
      .select(
        col("value"),
        from_json(col("value").cast("string"), docSchema).as("doc")
      )
      .filter(
        col("doc.lang").isin(langs.map(x => x: Any): _*) &&
          length(trim(col("doc.text"))) >= minChars
      )
      .withColumn("text_hash", md5(lower(trim(col("doc.text")))))
      .dropDuplicates("text_hash")
      .select(col("value"))
    ingest(
      curated,
      checkpoint,
      trigger,
      sourceName = s"curate-${Engine.tokenSafe(peerDir)}"
    )
  }

  /** Streaming NEAR-dup corpus curation: [[curateFrom]]'s gates plus
    * MinHash-LSH near-duplicate suppression against the FULL history of
    * kept documents — the incremental form of the batch `dedup_minhash_lsh`
    * query, for pipelines that must admit new documents continuously
    * without re-running corpus-wide dedup.
    *
    * A document is dropped when any of its LSH band buckets (4 bands × 4
    * rows of the portable `minhash16` family — the same banding as the
    * batch query, so batch and stream agree on what "near-dup" means) is
    * already occupied by (a) a previously KEPT document from any earlier
    * micro-batch, via the persistent band index at `indexDir`, or (b) a
    * smaller-offset document in the same batch (bucket-representative
    * semantics: the earliest doc in a bucket survives, later ones drop —
    * deterministic because the peer log's offsets order every batch).
    *
    * SCALE POSTURE — history lives in STORAGE, not in streaming state:
    * the band index is a parquet table keyed (band, bh), appended one
    * `batch=<id>` partition per micro-batch, and the history probe is a
    * keyed shuffle join — the same shape as the batch LSH query, bounded
    * by the index size on disk, never by executor memory. No state store
    * is involved at all (contrast [[curateFrom]]'s exact-hash state): a
    * 100 TB corpus's signatures would crush any per-key state backend,
    * but as a parquet side table they are just another join input, and
    * [[Engine.compactNearIndex]] folds the per-batch partitions down so
    * the probe never degrades into a many-small-files scan.
    *
    * EXACTLY-ONCE — both writes are idempotent under foreachBatch retry:
    * the log append is token-guarded (same as [[ingest]]), and the index
    * write overwrites its own `batch=<id>` partition with content that is
    * a pure function of the (immutable) earlier partitions — the history
    * read excludes `batch >= id`, so a retry after a partial index write
    * recomputes the identical survivor set rather than seeing its own
    * debris and dropping everything.
    */
  def curateNearFrom(
      peerDir: String,
      checkpoint: String,
      indexDir: String,
      langs: Seq[String] = Seq("en"),
      minChars: Int = 50,
      /** Benchmark-decontamination blocklist: a static `gram` column of
        * 3-grams (the `text_decontaminate` recipe — lowercase, space-
        * joined). When set, any document sharing ≥1 n-gram with the list
        * is dropped BEFORE near-dedup, in the same streaming pass — the
        * GPT-3/PaLM eval-overlap rule as a curation gate. The list is
        * eval-suite-sized (metadata scale), so it broadcasts; the corpus
        * side explodes per-doc distinct grams map-side and the probe is a
        * broadcast semi-join — no extra shuffle of document text, and no
        * state: the stage is a pure function of (batch, blocklist), so
        * foreachBatch retries and checkpoint restarts replay it exactly.
        */
      benchmarkGrams: Option[DataFrame] = None,
      /** FUZZY benchmark decontamination (the `corpus_decontaminate_near`
        * rule): a static benchmark DOCUMENT frame (`text` column). Any
        * incoming doc colliding with a benchmark doc in ≥1 MinHash LSH
        * band is dropped — catching paraphrased/reformatted leaks whose
        * exact n-grams differ. The benchmark's band keys are computed
        * ONCE at stream start (eval-suite-sized, frozen via
        * localCheckpoint) and injected into the near-dedup probe as
        * pre-existing history, so the gate reuses the bands each batch
        * already computes — no extra MinHash pass, no extra shuffle, no
        * state: retries and restarts replay it exactly.
        */
      benchmarkDocs: Option[DataFrame] = None,
      /** Gopher-style repetition quality gate (Rae et al. 2021 A1.1, the
        * word-level rules of the batch `text_repetition` query): drop
        * documents whose most frequent word exceeds 20% of tokens or most
        * frequent bigram exceeds 18% of bigrams. A pure per-row expression
        * over the token array — stateless, fully inside scan-stage
        * codegen, so it adds no shuffle, no state, and retries/restarts
        * replay it exactly.
        */
      repetitionGate: Boolean = false,
      /** Model-based quality gate (the CCNet serving loop): score each
        * document's average token log-likelihood against the PERSISTED
        * unigram model at `(modelDir, minAvgLogp)` ([[queries.LmModel]],
        * fitted offline via CLI `fit-lm`) and drop documents below the
        * cutoff. OOV tokens score the model's floor, so out-of-domain
        * gibberish lands far below in-domain text. Stateless per batch
        * (model state lives in storage, vocabulary-sized), so
        * retries/restarts replay it exactly.
        */
      lmQuality: Option[(String, Double)] = None,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      /** Every N batches, fold index partitions ≤ batchId−1 into one
        * (0 = never). Folding stops the history probe degrading into a
        * one-directory-per-batch listing on long-running streams; the
        * current batch's own partition is never folded, so even a crash
        * between the fold and the checkpoint commit leaves a retry's
        * `batch < id` history view complete (see [[Engine.compactNearIndex]]).
        */
      autoCompactEvery: Int = 0
  ): StreamingQuery = {
    val docSchema = StructType(
      Seq(StructField("lang", StringType), StructField("text", StringType))
    )
    // Resolve the LM model ONCE, before the stream starts: the version
    // listing + parquet read happen here, not per micro-batch, and a
    // concurrent refit (which keeps a one-version grace window) can't
    // prune this stream's version out from under an in-flight batch.
    // Restart the stream to adopt a refit.
    val lmResolved = lmQuality.map { case (modelDir, minAvgLogp) =>
      val (model, floor) = graft.queries.LmModel.load(spark, modelDir)
      (model, floor, minAvgLogp)
    }
    // Benchmark band keys resolve ONCE, before the stream starts — a
    // static, frozen table the per-batch near-dedup probe treats as
    // pre-existing history.
    val benchBands = benchmarkDocs.map { bd =>
      graft.functions.GraftFunctions.register(spark)
      bd.select(
          expr("minhash16(array_distinct(split(lower(trim(text)), ' ')))").as("mh"))
        .select(explode(expr(
          """transform(sequence(0, 3), b -> struct(
               b AS band,
               array_join(transform(slice(mh, b*4 + 1, 4), x -> cast(x AS string)), ',') AS bh))"""
        )).as("bb"))
        .select(col("bb.band").as("band"), col("bb.bh").as("bh"))
        .distinct()
        .localCheckpoint(true)
    }
    val gated = spark.readStream
      .format("graft")
      .load(peerDir)
      .select(
        col("offset"),
        col("value"),
        from_json(col("value").cast("string"), docSchema).as("doc")
      )
      .filter(
        col("doc.lang").isin(langs.map(x => x: Any): _*) &&
          length(trim(col("doc.text"))) >= minChars
      )
      .select(col("offset"), col("value"), col("doc.text").as("text"))
    val source = s"curate-near-${Engine.tokenSafe(peerDir)}"
    gated.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        // Decontamination gate first: documents overlapping the benchmark
        // never reach the dedup index or the curated log, exactly as if
        // they were never in the corpus (matching the batch query's
        // contract on the same corpus).
        // Quality gate before decontamination: it is a free row filter
        // (codegen, no join), so running it first shrinks the gram
        // explode + broadcast probe to the documents that can survive.
        val quality = if (repetitionGate) Engine.repetitionGated(df) else df
        val lmGated = lmResolved match {
          case Some((model, floor, minAvgLogp)) =>
            Engine.lmQualityGated(quality, model, floor, minAvgLogp)
          case None => quality
        }
        val clean = benchmarkGrams match {
          case Some(bench) => Engine.decontaminate(lmGated, bench)
          case None        => lmGated
        }
        // Materialize the survivor set ONCE (it feeds two writes; without
        // this the history join would run twice, and the second run must
        // not observe the first write's own index partition).
        val survivors =
          Engine
            .nearDedupBatch(spark, clean, indexDir, batchId, extraHistory = benchBands)
            .localCheckpoint(true)
        try {
          // Peer-offset order: the joins above scramble row order, and the
          // curated log should be deterministic and arrival-ordered (the
          // sort is micro-batch-sized, not corpus-sized).
          log.appendDF(
            survivors.orderBy(col("offset")).select(col("value")),
            Some(source -> batchId))
          // Index write LAST (after the token-guarded append): a pure
          // per-partition overwrite, so any retry path converges.
          survivors
            .select(explode(col("bands")).as("bb"))
            .select(col("bb.band").as("band"), col("bb.bh").as("bh"))
            .write
            .mode("overwrite")
            .parquet(s"$indexDir/batch=$batchId")
        } finally survivors.unpersist()
        if (autoCompactEvery > 0 && batchId > 0 && batchId % autoCompactEvery == 0)
          // Fold ONLY strictly-earlier partitions: this batch's checkpoint
          // has not committed yet, so its own partition must stay intact
          // for a potential retry's history exclusion.
          Engine.compactNearIndex(spark, indexDir, batchId - 1)
        ()
      }
      .start()
  }

  /** Streaming MULTIMODAL feature extraction: tail the log's opaque binary
    * payloads and maintain a derived features table — the streaming twin of
    * the batch `media_features` query, for pipelines that ingest media
    * continuously and query features without re-decoding the corpus.
    *
    * Each micro-batch decodes per partition (one decoder amortized across
    * the partition's records — the mapInPandas execution shape) through the
    * SAME two-tier path as the batch query: recognized images take the real
    * pixel tier (decoded dims + 16-bin luma histogram), everything else the
    * deterministic byte-histogram stub, so mixed corpora stay total.
    *
    * EXACTLY-ONCE by the band-index recipe: each batch writes its own
    * `batch=<id>` partition with content that is a pure function of the
    * batch, so a foreachBatch retry overwrites identical data instead of
    * duplicating rows; readers just scan the parquet dir.
    */
  def mediaFeaturesFrom(
      peerDir: String,
      checkpoint: String,
      featuresDir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")
  ): StreamingQuery = {
    val session = spark
    import session.implicits._
    spark.readStream
      .format("graft")
      .load(peerDir)
      .select(col("offset"), col("value"))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        df.select(col("offset"), col("value"))
          .as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (off, blob) => Engine.mediaFeatureOf(off, blob) })
          .toDF()
          .write
          .mode("overwrite")
          .parquet(s"$featuresDir/batch=$batchId")
        ()
      }
      .start()
  }

  /** Streaming CHUNKER: tail the log's JSON documents and maintain a
    * derived chunk table — the streaming twin of the batch `corpus_chunk`
    * query (64-token chunks, 48-token stride, 16-token overlap, identical
    * emission contract), keyed by log offset instead of doc id. For
    * pipelines that ingest documents continuously and serve
    * retrieval-sized chunks without re-splitting the corpus.
    *
    * The split is the same single map-side higher-order expression as the
    * batch query — stateless per batch, so EXACTLY-ONCE falls out of the
    * band-index recipe: each batch writes its own `batch=<id>` partition
    * whose content is a pure function of the batch; a foreachBatch retry
    * overwrites identical data.
    */
  def chunksFrom(
      peerDir: String,
      checkpoint: String,
      chunksDir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")
  ): StreamingQuery = {
    val docSchema = StructType(
      Seq(StructField("lang", StringType), StructField("text", StringType))
    )
    spark.readStream
      .format("graft")
      .load(peerDir)
      .select(
        col("offset"),
        from_json(col("value").cast("string"), docSchema).as("doc")
      )
      .filter(col("doc.text").isNotNull)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        df.select(col("offset"), split(lower(trim(col("doc.text"))), " ").as("w"))
          .select(
            col("offset"),
            explode(expr(
              """transform(sequence(1, greatest(size(w) - 16, 1), 48), st -> struct(
                   CAST((st - 1) div 48 AS BIGINT) AS chunk_id,
                   CAST(size(slice(w, st, 64)) AS BIGINT) AS chunk_tokens,
                   md5(concat_ws(' ', slice(w, st, 64))) AS chunk_hash))"""
            )).as("c")
          )
          .select(col("offset"), col("c.chunk_id"), col("c.chunk_tokens"), col("c.chunk_hash"))
          .write
          .mode("overwrite")
          .parquet(s"$chunksDir/batch=$batchId")
        ()
      }
      .start()
  }

  /** Streaming EMBEDDING-DRIFT monitor: tail the log's JSON embedding
    * records (`{"vec_id": N, "embedding": [x, ...]}`) and maintain a
    * derived PCA table — after every micro-batch, the top principal
    * component and explained-variance share of ALL vectors ingested so
    * far, the collapse/drift alarm for a continuously-fed embedding
    * store. The readout is the LITERALLY shared `vec_pca` arithmetic
    * ([[graft.queries.Similarity.pcaFromScatter]] over
    * [[graft.queries.Similarity.scatterAssemble]]), so the streamed rows
    * are bit-exact equal to running the oracle-checked batch query over
    * the same vectors (StreamingPcaSpec asserts it).
    *
    * The full history is NEVER recomputed OR re-read: the Gramian
    * partials are ADDITIVE (exact integer sums), so alongside each
    * batch's own `gram/batch=<id>` partition the monitor maintains a
    * RUNNING merged partial `merged/batch=<id>` =
    * `merged/batch=<prev>` + `gram/batch=<id>` — per-batch input is two
    * ≤ d(d+1)/2 + d + 1-row partitions, independent of history size
    * (this is the log's own compaction discipline, [[SparkLog.compact]] /
    * reference snapshot D4, applied to a derived table). Batches older
    * than the previous commit are deleted after each commit, so every
    * monitor directory holds at most 2 partitions at any history length —
    * a monitor that runs for a year lists the same handful of files as
    * one that ran for a minute.
    *
    * EXACTLY-ONCE by the band-index recipe: each batch overwrites
    * (a) `gram/batch=<id>` — a pure function of the batch; (b)
    * `merged/batch=<id>` — a pure function of (the highest committed
    * merged partial below <id>, the batch), both deterministic at retry
    * time because batch <id> only runs after every earlier batch fully
    * committed and retention never deletes that predecessor until <id>'s
    * successor commits; and (c) `pc/batch=<id>` — a pure function of
    * (b). A foreachBatch retry therefore rewrites identical data.
    * Undecodable records are skipped, not fatal (the ingest house rule),
    * so n counts decoded vectors.
    */
  def pcaDriftFrom(
      peerDir: String,
      checkpoint: String,
      driftDir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")
  ): StreamingQuery = {
    val vecSchema = StructType(
      Seq(
        StructField("vec_id", LongType),
        StructField(
          "embedding",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)
        )
      )
    )
    spark.readStream
      .format("graft")
      .load(peerDir)
      .select(from_json(col("value").cast("string"), vecSchema).as("r"))
      .filter(col("r.embedding").isNotNull)
      .select(col("r.embedding").as("embedding"))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        Engine.driftStep(df, batchId, driftDir)
      }
      .start()
  }

  /** Streaming HEAVY HITTERS: tail the log's JSON events and maintain a
    * derived per-window top-k table — the product surface over
    * [[graft.streaming.EventStreams.streamingTopK]] (ONE bounded
    * SpaceSaving summary per event-time window, constant state bytes at
    * any user cardinality; the streaming twin of the batch
    * `q_heavy_hitters`). Records are JSON objects with `user_id` (long),
    * `ts` (timestamp) and optional `event_type`; undecodable records are
    * skipped, not fatal — an ingest pipeline must not wedge on one bad
    * row.
    *
    * Rows are FINAL by construction (they emit exactly once, when the
    * watermark closes their window), so exactly-once persistence is the
    * chunksFrom recipe: each micro-batch overwrites its own `batch=<id>`
    * partition whose content is a pure function of (restored state,
    * batch); readers just scan the parquet dir. Resumable: the
    * flatMapGroupsWithState state lives in the checkpoint, so a later run
    * picks up open windows where the last left off.
    */
  /** Tail the log as typed JSON events (`user_id` long, `ts` timestamp,
    * optional `event_type`) — the shared front end of the streaming
    * analytics verbs. Undecodable records are skipped, not fatal: an
    * ingest pipeline must not wedge on one bad row.
    */
  private def jsonEvents(
      peerDir: String
  ): org.apache.spark.sql.Dataset[graft.streaming.EventStreams.TypedEvent] = {
    val session = spark
    import session.implicits._
    val evSchema = StructType(
      Seq(
        StructField("user_id", LongType),
        StructField("ts", TimestampType),
        StructField("event_type", StringType)
      )
    )
    spark.readStream
      .format("graft")
      .load(peerDir)
      .select(from_json(col("value").cast("string"), evSchema).as("e"))
      .filter(col("e.user_id").isNotNull && col("e.ts").isNotNull)
      .select(
        col("e.user_id").as("user_id"),
        col("e.ts").as("ts"),
        coalesce(col("e.event_type"), lit("")).as("event_type")
      )
      .as[graft.streaming.EventStreams.TypedEvent]
  }

  /** [[jsonEvents]] plus the `value` field — the attribution stream needs
    * purchase amounts; absent/null values coalesce to 0.0 so a
    * typed-event-only producer still attributes (with zero revenue).
    */
  private def jsonValuedEvents(
      peerDir: String
  ): org.apache.spark.sql.Dataset[graft.streaming.EventStreams.ValuedEvent] = {
    val session = spark
    import session.implicits._
    val evSchema = StructType(
      Seq(
        StructField("user_id", LongType),
        StructField("ts", TimestampType),
        StructField("event_type", StringType),
        StructField("value", org.apache.spark.sql.types.DoubleType)
      )
    )
    spark.readStream
      .format("graft")
      .load(peerDir)
      .select(from_json(col("value").cast("string"), evSchema).as("e"))
      .filter(col("e.user_id").isNotNull && col("e.ts").isNotNull)
      .select(
        col("e.user_id").as("user_id"),
        col("e.ts").as("ts"),
        coalesce(col("e.event_type"), lit("")).as("event_type"),
        coalesce(col("e.value"), lit(0.0)).as("value")
      )
      .as[graft.streaming.EventStreams.ValuedEvent]
  }

  /** Exactly-once derived-table sink shared by the streaming analytics:
    * each micro-batch overwrites its own `batch=<id>` partition whose
    * content is a pure function of (restored state, batch), so a
    * foreachBatch retry is idempotent. Readers go through
    * [[graft.streaming.DerivedTable.readOpt]]: every `compactEvery`
    * batches (spark conf `spark.graft.derived.compactEvery`, default 16;
    * 0 disables) old partitions fold into a compaction generation
    * ([[graft.streaming.DerivedTable.compact]]), so a table written one
    * tiny directory per trigger forever stays a bounded listing.
    */
  private def derivedTableSink(
      rows: DataFrame,
      checkpoint: String,
      outDir: String,
      trigger: Trigger
  ): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        df.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        val every =
          df.sparkSession.conf.get("spark.graft.derived.compactEvery", "16").toInt
        val keep =
          df.sparkSession.conf.get("spark.graft.derived.keepBatches", "4").toInt
        if (every > 0 && batchId > 0 && batchId % every == 0)
          graft.streaming.DerivedTable.compact(df.sparkSession, outDir, keep)
        ()
      }
      .start()

  def topKFrom(
      peerDir: String,
      checkpoint: String,
      topkDir: String,
      windowMs: Long = 60L * 60 * 1000,
      k: Int = 3,
      capacity: Int = 64,
      watermarkDelay: String = "10 minutes",
      trigger: Trigger = Trigger.ProcessingTime("1 second")
  ): StreamingQuery =
    derivedTableSink(
      graft.streaming.EventStreams
        .streamingTopK(jsonEvents(peerDir), windowMs, k, capacity, watermarkDelay)
        .toDF(),
      checkpoint,
      topkDir,
      trigger
    )

  /** Streaming DAILY VOLUME: tail the log's JSON events and maintain the
    * derived (day, n) table feeding the anomaly readout — the streaming
    * half of the batch `q_anomaly_days` split at its natural seam: the
    * event-scale day count runs incrementally here (one state row per
    * OPEN day, rows final on watermark close), and the calendar-bounded
    * z-score arithmetic runs as a batch pass over the finalized table
    * ([[Engine.anomalyReport]], sharing `Temporal.anomalyOver` with the
    * oracle query so both surfaces flag identical rows). Same
    * exactly-once derived-table recipe as [[topKFrom]].
    */
  def dailyCountsFrom(
      peerDir: String,
      checkpoint: String,
      dailyDir: String,
      watermarkDelay: String = "1 hour",
      trigger: Trigger = Trigger.ProcessingTime("1 second")
  ): StreamingQuery =
    derivedTableSink(
      graft.streaming.EventStreams
        .streamingDailyCounts(jsonEvents(peerDir).toDF(), "ts", watermarkDelay),
      checkpoint,
      dailyDir,
      trigger
    )

  /** Streaming TRANSITIONS: tail the log's JSON events and maintain the
    * derived per-user (from, to) transition-pair table — the incremental
    * twin of the batch `q_event_flow` ([[graft.streaming.EventStreams
    * .streamingTransitions]]: event-time-ordered pairs correct under
    * out-of-order arrival, one scalar + watermark-horizon buffer per user,
    * idle users evicted). The matrix readout runs as a batch pass over
    * the finalized rows ([[Engine.flowReport]], sharing
    * `Temporal.flowOver` with the oracle query). Same exactly-once
    * derived-table recipe as [[topKFrom]].
    */
  def transitionsFrom(
      peerDir: String,
      checkpoint: String,
      flowDir: String,
      watermarkDelay: String = "10 minutes",
      idleTimeoutMs: Long = 24L * 60 * 60 * 1000,
      trigger: Trigger = Trigger.ProcessingTime("1 second")
  ): StreamingQuery =
    derivedTableSink(
      graft.streaming.EventStreams
        .streamingTransitions(jsonEvents(peerDir), watermarkDelay, idleTimeoutMs)
        .toDF(),
      checkpoint,
      flowDir,
      trigger
    )

  /** Streaming SESSIONS: tail the log's JSON events and maintain the
    * derived finalized-session table ([[graft.streaming.EventStreams
    * .sessionize]] — the same 30-minute gaps-and-islands contract as the
    * batch `q_sessionize`, sessions immutable only once the watermark
    * passes end + gap). The histogram readout runs as a batch pass over
    * the finalized rows ([[Engine.sessionHistReport]], sharing
    * `Temporal.durationHistOver` with the oracle query). Same
    * exactly-once derived-table recipe as [[topKFrom]].
    */
  def sessionsFrom(
      peerDir: String,
      checkpoint: String,
      sessDir: String,
      gapMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = "10 minutes",
      trigger: Trigger = Trigger.ProcessingTime("1 second")
  ): StreamingQuery = {
    val session = spark
    import session.implicits._
    derivedTableSink(
      graft.streaming.EventStreams
        .sessionize(
          jsonEvents(peerDir)
            .map(e => graft.streaming.EventStreams.Event(e.user_id, e.ts)),
          gapMs,
          watermarkDelay
        )
        .toDF(),
      checkpoint,
      sessDir,
      trigger
    )
  }

  /** Streaming ATTRIBUTION: tail the log's JSON events and maintain the
    * derived credited-purchase table — the incremental twin of the batch
    * `q_attribution` ([[graft.streaming.EventStreams
    * .streamingAttribution]]: event-time-ordered last-touch credit,
    * correct under out-of-order arrival, two scalars + watermark-horizon
    * buffer per user, idle users evicted). The channel rollup runs as a
    * batch pass over the finalized rows ([[Engine.attributionReport]],
    * sharing `Temporal.attributionOver` with the oracle query). Same
    * exactly-once derived-table recipe as [[topKFrom]].
    */
  def attributionFrom(
      peerDir: String,
      checkpoint: String,
      attrDir: String,
      watermarkDelay: String = "10 minutes",
      idleTimeoutMs: Long = 24L * 60 * 60 * 1000,
      trigger: Trigger = Trigger.ProcessingTime("1 second")
  ): StreamingQuery =
    derivedTableSink(
      graft.streaming.EventStreams
        .streamingAttribution(jsonValuedEvents(peerDir), watermarkDelay, idleTimeoutMs)
        .toDF(),
      checkpoint,
      attrDir,
      trigger
    )

  /** Streaming FUNNEL: tail the log's JSON events and maintain a derived
    * per-user stage table — the product surface over
    * [[graft.streaming.EventStreams.streamingFunnel]] (the incremental
    * twin of the batch `q_funnel`: ordered view→click→purchase within the
    * window, stage rows immutable once emitted, per-user scalar state).
    * Same exactly-once derived-table recipe as [[topKFrom]].
    */
  def funnelFrom(
      peerDir: String,
      checkpoint: String,
      funnelDir: String,
      windowMs: Long = 24L * 60 * 60 * 1000,
      watermarkDelay: String = "10 minutes",
      trigger: Trigger = Trigger.ProcessingTime("1 second")
  ): StreamingQuery =
    derivedTableSink(
      graft.streaming.EventStreams
        .streamingFunnel(jsonEvents(peerDir), windowMs, watermarkDelay)
        .toDF(),
      checkpoint,
      funnelDir,
      trigger
    )

  /** Batch view of the whole log (L6). */
  def toDF: DataFrame = log.toDF

  /** Register the log as a SQL temp view so `spark.sql("... FROM <name>")`
    * works directly; pairs with the native functions the engine registers
    * at construction. Returns the view name for convenience.
    */
  def registerView(name: String = "graft_log"): String = {
    spark.read.format("graft").load(dataDir).createOrReplaceTempView(name)
    name
  }

  /** Shutdown in reverse boot order (reference: agent.go:175-182) — the
    * session is caller-owned, so only engine state closes here.
    */
  def close(): Unit = ()
}

object Engine {
  def apply(spark: SparkSession, dataDir: String): Engine = new Engine(spark, dataDir)

  /** Batch anomaly readout over a streamed daily-counts table
    * ([[Engine.dailyCountsFrom]]'s output): re-runs the EXACT
    * `q_anomaly_days` arithmetic — the shared `Temporal.anomalyOver` —
    * over the finalized (day, n) rows, so the streaming surface and the
    * oracle-checked batch query flag identical days for identical counts.
    * Fails loudly if any day finalized twice: append mode emits a day
    * exactly once, so a duplicate means the derived table's exactly-once
    * contract broke (e.g. two writers on one dir) and a silent re-sum
    * would double-count the baseline.
    */
  def anomalyReport(spark: SparkSession, dailyDir: String): DataFrame = {
    val daily = graft.streaming.DerivedTable
      .read(spark, dailyDir)
      .select(col("day").cast("date").as("day"), col("n").cast("long").as("n"))
    val dup = daily.groupBy("day").count().filter(col("count") > 1).limit(1).collect()
    require(
      dup.isEmpty,
      s"day ${dup.headOption.map(_.get(0)).orNull} finalized more than once in $dailyDir — " +
        "the derived table lost exactly-once"
    )
    graft.queries.Temporal.anomalyOver(daily)
  }

  /** One micro-batch of the drift monitor ([[Engine!.pcaDriftFrom]]'s
    * foreachBatch body, extracted so the objstore crash-point sweep can
    * drive it directly — DriftCommitSpec crashes every PUT boundary of
    * the gram-write → merged-write → pc-write → retention-delete chain
    * and asserts torn state stays invisible and a retry converges).
    *
    * EXACTLY-ONCE by the band-index recipe: each write is a pure function
    * of fully-committed predecessors (see pcaDriftFrom's doc), so a retry
    * of `batchId` rewrites identical data at the same paths.
    */
  private[graft] def driftStep(df: DataFrame, batchId: Long, driftDir: String): Unit = {
    val session = df.sparkSession
    // Scoped: the merge/assembly checkpoints free with this batch even
    // when a caller composes the stream inside its own query build.
    graft.queries.Checkpoints.scoped {
      val quantized = df.select(
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))")
          .as("q")
      )
      graft.queries.Similarity
        .scatterPartials(quantized)
        .groupBy("i", "j")
        .agg(sum("p").as("p"))
        .write
        .mode("overwrite")
        .parquet(s"$driftDir/gram/batch=$batchId")
      // Highest committed merged partial below this batch. Every batch
      // below batchId committed fully before this one started
      // (structured streaming serializes batches), so prev's partition
      // is complete; prev is None only on the very first batch of a
      // drift dir.
      val prev = graft.streaming.DerivedTable
        .batchIds(session, s"$driftDir/merged")
        .filter(_ < batchId)
        .sorted
        .lastOption
      val gram = session.read.parquet(s"$driftDir/gram/batch=$batchId")
      val merged = prev
        .map(p => session.read.parquet(s"$driftDir/merged/batch=$p").unionByName(gram))
        .getOrElse(gram)
        .groupBy("i", "j")
        .agg(sum("p").as("p"))
        .pipe(graft.queries.Checkpoints.checkpoint)
      merged.write.mode("overwrite").parquet(s"$driftDir/merged/batch=$batchId")
      // r15: the funnel assembles S from the merged partials itself
      // (exact integer identity inside one task) — the former
      // scatterAssemble + its own checkpoint ran three broadcast joins
      // and an extra materialization job per batch for ≤ d² metadata
      // rows. Output bit-identical (StreamingPcaSpec / DriftSoak compare
      // against the assembled-path truth).
      graft.queries.Similarity
        .pcaFromPartials(merged)
        .write
        .mode("overwrite")
        .parquet(s"$driftDir/pc/batch=$batchId")
      // Retention: batches below prev can never be read again — a
      // retry of batchId needs only merged(prev) and its own batch —
      // so drop them. Bounds every dir at ≤ 2 partitions forever.
      prev.foreach { p =>
        Seq("gram", "merged", "pc").foreach { sub =>
          graft.streaming.DerivedTable
            .batchIds(session, s"$driftDir/$sub")
            .filter(_ < p)
            .foreach { old =>
              val dirPath = new org.apache.hadoop.fs.Path(s"$driftDir/$sub/batch=$old")
              val f = dirPath.getFileSystem(session.sparkContext.hadoopConfiguration)
              f.delete(dirPath, true)
            }
        }
      }
    }
    ()
  }

  /** Latest drift readout over a streamed PCA table
    * ([[Engine.pcaDriftFrom]]'s output): the (dim, loading, ev_share)
    * rows of the HIGHEST committed batch — bit-exact equal to the batch
    * `vec_pca` query over every vector ingested up to that batch. An
    * absent or empty drift table yields an EMPTY frame (the monitor may
    * not have committed a batch yet — Main prints its "no committed
    * drift readout yet" line off this), and a torn readout partition
    * (crash mid-write, before the streaming retry lands) is skipped in
    * favor of the newest one carrying a `_SUCCESS` commit marker.
    */
  def pcaDriftReport(spark: SparkSession, driftDir: String): DataFrame = {
    val schema = StructType(
      Seq(
        StructField("dim", IntegerType),
        StructField("loading", DoubleType),
        StructField("ev_share", DoubleType)
      )
    )
    val f = new org.apache.hadoop.fs.Path(driftDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Retention races (r13 advice): the monitor keeps only a depth-1 live
    // chain of pc/batch=<id> partitions, so a reader that resolved an id
    // and is still scanning when TWO more batches commit sees its files
    // deleted mid-scan. Re-resolve + retry on FileNotFound, and
    // materialize the d-row readout EAGERLY so the race window closes
    // inside this function instead of at the caller's later action.
    def isFileGone(e: Throwable): Boolean =
      e != null && (e.isInstanceOf[java.io.FileNotFoundException] || isFileGone(e.getCause))
    var attempts = 0
    var out: Option[DataFrame] = None
    while (out.isEmpty) {
      attempts += 1
      try {
        val ids = graft.streaming.DerivedTable.batchIds(spark, s"$driftDir/pc")
        val last = ids.reverse
          .find(id =>
            f.exists(new org.apache.hadoop.fs.Path(s"$driftDir/pc/batch=$id/_SUCCESS"))
          )
          // No marker anywhere (marksuccessfuljobs disabled): trust the newest.
          .orElse(ids.lastOption)
        out = Some(last match {
          case None =>
            spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          case Some(id) =>
            val readout = spark.read
              .parquet(s"$driftDir/pc/batch=$id")
              .select(col("dim"), col("loading"), col("ev_share"))
              .orderBy("dim")
            val rows = readout.collect() // ≤ d rows — eager, closes the race
            spark.createDataFrame(
              spark.sparkContext.parallelize(rows.toIndexedSeq),
              readout.schema
            )
        })
      } catch {
        case e: Throwable if isFileGone(e) && attempts < 3 =>
          // Back off past the prune window (a back-to-back re-list at a
          // 1 s trigger cadence can land in the same cycle it just raced).
          Thread.sleep(300L * attempts)
      }
    }
    out.get
  }

  /** Batch transition-matrix readout over a streamed transitions table
    * ([[Engine.transitionsFrom]]'s output): the literally shared
    * `Temporal.flowOver`, so the streaming surface and the oracle-checked
    * `q_event_flow` compute identical counts and probabilities for
    * identical pairs.
    */
  def flowReport(spark: SparkSession, flowDir: String): DataFrame =
    graft.queries.Temporal.flowOver(
      graft.streaming.DerivedTable.read(spark, flowDir).select(col("from_type"), col("to_type"))
    )

  /** Duration-histogram readout over a streamed finalized-session table
    * ([[Engine.sessionsFrom]]'s output): durations convert with
    * unix_timestamp truncation — the batch query's exact semantics — and
    * roll up through the literally shared `Temporal.durationHistOver`, so
    * the streaming surface and the oracle-checked
    * `q_session_duration_hist` bucket identical sessions identically.
    */
  def sessionHistReport(spark: SparkSession, sessDir: String): DataFrame =
    graft.queries.Temporal.durationHistOver(
      graft.streaming.DerivedTable
        .read(spark, sessDir)
        .select(
          (org.apache.spark.sql.functions.unix_timestamp(col("end"))
            - org.apache.spark.sql.functions.unix_timestamp(col("start"))).as("dur_s")
        )
    )

  /** Weekday-seasonality readout over the SAME streamed daily-counts table
    * the anomaly surface uses ([[Engine.dailyCountsFrom]]'s output): the
    * shared `Temporal.seasonalityOver`, whose per-day sums reproduce the
    * oracle-checked `q_seasonality` volume columns exactly (grouping by
    * weekday factors through grouping by day).
    */
  def seasonalityReport(spark: SparkSession, dailyDir: String): DataFrame =
    graft.queries.Temporal.seasonalityOver(
      graft.streaming.DerivedTable
        .read(spark, dailyDir)
        .select(col("day").cast("date").as("day"), col("n").cast("long").as("n"))
    )

  /** Batch attribution readout over a streamed credited-purchase table
    * ([[Engine.attributionFrom]]'s output): the literally shared
    * `Temporal.attributionOver`, so the streaming surface and the
    * oracle-checked `q_attribution` compute identical conversions,
    * revenue and shares for identical credited rows.
    */
  def attributionReport(spark: SparkSession, attrDir: String): DataFrame =
    graft.queries.Temporal.attributionOver(
      graft.streaming.DerivedTable.read(spark, attrDir).select(col("channel"), col("cents"))
    )

  /** One record's media features — mirrors the batch `media_features` row
    * shape keyed by log offset instead of doc id.
    */
  final case class MediaFeat(
      offset: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      hist_fp: String
  )

  /** The per-blob feature function both tiers share with the batch query:
    * real images decode (dims + luma histogram, n_frames = 1), everything
    * else takes the deterministic byte-arithmetic stub (dims from the
    * length, 16-bin byte histogram).
    */
  private[graft] def mediaFeatureOf(off: Long, blob: Array[Byte]): MediaFeat =
    graft.media.MediaDecoder.features(blob) match {
      case Some(pf) =>
        MediaFeat(off, blob.length, pf.width, pf.height, 1, pf.lumaHist.mkString(","))
      case None =>
        val n = if (blob == null) 0 else blob.length
        val (w, h, f) = graft.media.MediaDecoder.stubDims(blob)
        MediaFeat(off, n, w, h, f, graft.media.MediaDecoder.byteHist(blob).mkString(","))
    }

  /** Drop rows whose `text` shares any 3-gram with the broadcast
    * benchmark list — the decontamination stage of [[curateNearFrom]],
    * factored out so the spec can compare stream and batch verdicts on
    * identical input. `array_distinct` runs BEFORE the explode (per-doc
    * gram dedup inside codegen, same rationale as `text_decontaminate`).
    */
  private[graft] def decontaminate(df: DataFrame, bench: DataFrame): DataFrame = {
    val contaminated = df
      .select(col("offset"), split(lower(trim(col("text"))), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(
        col("offset"),
        explode(
          array_distinct(
            expr("""transform(sequence(1, size(w) - 2),
                    i -> concat(element_at(w, i), ' ', element_at(w, i + 1), ' ',
                                element_at(w, i + 2)))""")
          )
        ).as("gram")
      )
      .join(org.apache.spark.sql.functions.broadcast(bench.select("gram")), Seq("gram"), "left_semi")
      .select(col("offset"))
      .distinct()
    df.join(contaminated, Seq("offset"), "left_anti")
  }

  /** Keep rows whose average token log-likelihood under the (already
    * loaded) unigram model clears the cutoff — the streaming stage of the
    * [[queries.LmModel]] fit/score split, keyed on the batch's `offset`.
    */
  private[graft] def lmQualityGated(
      df: DataFrame,
      model: DataFrame,
      floor: Double,
      minAvgLogp: Double
  ): DataFrame =
    graft.queries.LmModel
      .scoreWith(df, model, floor, "offset")
      .filter(col("avg_logp") >= minAvgLogp)
      .drop("avg_logp")

  /** Keep rows passing the word-level Gopher repetition rules — the
    * streaming twin of the batch `text_repetition` query's `keep` flag,
    * factored out so the spec can compare stream and batch verdicts on
    * identical input. Documents with fewer than two words carry no
    * repetition evidence and pass (the batch query excludes them from its
    * output entirely). The `when` guard keeps `sequence(1, size(w)-1)`
    * from ever seeing descending bounds (Spark would emit [1,0], not
    * error), and makes the whole gate one codegen'd projection + filter.
    */
  private[graft] def repetitionGated(df: DataFrame): DataFrame =
    df.withColumn("w__", split(lower(trim(col("text"))), " "))
      // Bind the bigram array ONCE: repeating its construction inside the
      // outer filter lambda would rebuild it per distinct bigram (lambda-
      // scoped subexpressions don't hoist) — O(n²) concats per document.
      .withColumn(
        "bg__",
        when(size(col("w__")) < 2, array().cast("array<string>")).otherwise(
          expr("""transform(sequence(1, size(w__) - 1),
                  i -> concat(element_at(w__, i), ' ', element_at(w__, i + 1)))""")
        )
      )
      .withColumn(
        "keep__",
        when(size(col("w__")) < 2, lit(true)).otherwise(
          expr("""array_max(transform(array_distinct(w__),
                    x -> size(filter(w__, y -> y = x))))""").cast("double") /
            size(col("w__")).cast("double") <= 0.2 &&
            expr("""array_max(transform(array_distinct(bg__),
                    x -> size(filter(bg__, y -> y = x))))""").cast("double") /
              size(col("bg__")).cast("double") <= 0.18
        )
      )
      .filter(col("keep__"))
      .drop("w__", "bg__", "keep__")

  /** One micro-batch of LSH near-dedup for [[Engine.curateNearFrom]]:
    * returns the surviving docs `(offset, value, bands)` where `bands` is
    * the doc's 4 `(band, bh)` bucket keys. Pure function of `df` and the
    * index partitions with `batch < batchId` — the foundation of the
    * retry-idempotence argument in the caller's Scaladoc.
    */
  private[graft] def nearDedupBatch(
      spark: SparkSession,
      df: DataFrame,
      indexDir: String,
      batchId: Long,
      /** Additional static band keys treated as pre-existing history —
        * the fuzzy benchmark-decontamination hook: a doc colliding with
        * any of these buckets drops exactly as if an earlier batch had
        * claimed them.
        */
      extraHistory: Option[DataFrame] = None
  ): DataFrame = {
    // Same signature family and 4×4 banding as the batch dedup_minhash_lsh
    // query — stream and batch agree on candidate semantics.
    val withBands = df
      .withColumn("mh", expr("minhash16(array_distinct(split(lower(trim(text)), ' ')))"))
      .withColumn(
        "bands",
        expr(
          """transform(sequence(0, 3), b -> struct(
               b AS band,
               array_join(transform(slice(mh, b*4 + 1, 4), x -> cast(x AS string)), ',') AS bh))"""
        )
      )
      .select(col("offset"), col("value"), col("bands"))
    val bandRows = withBands
      .select(col("offset"), explode(col("bands")).as("bb"))
      .select(col("offset"), col("bb.band").as("band"), col("bb.bh").as("bh"))

    // History = every index partition from EARLIER batches only. The
    // strict bound is load-bearing twice: a retried batch must not see its
    // own debris, and partition pruning keeps the scan off the current
    // (possibly half-written) directory.
    val stored =
      try
        spark.read
          .parquet(indexDir)
          .filter(col("batch") < lit(batchId))
          .select(col("band"), col("bh"))
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          // First batch: no index yet.
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(Seq(
              StructField("band", org.apache.spark.sql.types.IntegerType),
              StructField("bh", StringType)))
          )
      }
    val history = extraHistory.fold(stored)(x =>
      stored.unionByName(x.select(col("band").cast("int").as("band"), col("bh"))))

    // Dropped docs: any bucket already held by history, or by a smaller
    // peer-offset doc in this batch (bucket-representative semantics; the
    // window is a keyed shuffle over bucket keys, never corpus-wide).
    val histHit = bandRows
      .join(history, Seq("band", "bh"), "left_semi")
      .select(col("offset"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bh"))
    val withinHit = bandRows
      .withColumn("mn", min(col("offset")).over(w))
      .filter(col("offset") > col("mn"))
      .select(col("offset"))
    val dropped = histHit.union(withinHit).distinct()
    withBands.join(dropped, Seq("offset"), "left_anti")
  }

  /** Fold the near-dup index's per-batch partitions ≤ `upTo` into the
    * single partition `batch=<upTo>` and delete the older directories —
    * run periodically so [[Engine.curateNearFrom]]'s history probe scans a
    * handful of well-sized files instead of one directory per micro-batch
    * ever processed. Safe to run between (not during) micro-batches.
    *
    * Crash-safe without coordination: the consolidated rows are
    * materialized BEFORE the overwrite (so the self-read conflict never
    * opens), the merged partition keeps `batch=<upTo>` (every future
    * batch's `batch < id` history filter still admits it), and a crash
    * between the write and the deletes only leaves duplicate (band, bh)
    * rows — invisible to the semi-join probe, removed by the next
    * compaction's `distinct`.
    */
  /** Compact to the SECOND-newest partition id on disk (None when fewer
    * than two exist). Deliberately not the newest: if the newest batch N
    * wrote its index partition but crashed before its checkpoint
    * committed, the stream will RETRY batch N with the history filter
    * `batch < N` — folding history into `batch=N` would hide it from that
    * retry and readmit every near-dup. Folding into N−1 is visible to a
    * retry of N and to every later batch, with no assumption about
    * whether N committed. (The `upTo` overload is for callers that KNOW
    * the commit state — e.g. between `processAllAvailable` calls.)
    */
  def compactNearIndex(spark: SparkSession, indexDir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val ids = fs.listStatus(p).toSeq.collect {
      case st if st.isDirectory && st.getPath.getName.startsWith("batch=") =>
        scala.util.Try(st.getPath.getName.stripPrefix("batch=").toLong).toOption
    }.flatten.sorted
    if (ids.length < 2) None
    else {
      val upTo = ids(ids.length - 2)
      compactNearIndex(spark, indexDir, upTo)
      Some(upTo)
    }
  }

  def compactNearIndex(spark: SparkSession, indexDir: String, upTo: Long): Unit = {
    val merged =
      try
        spark.read
          .parquet(indexDir)
          .filter(col("batch") <= lit(upTo))
          .select(col("band"), col("bh"))
          .distinct()
          .localCheckpoint(true)
      catch { case _: org.apache.spark.sql.AnalysisException => return }
    try {
      merged.write.mode("overwrite").parquet(s"$indexDir/batch=$upTo")
    } finally merged.unpersist()
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(indexDir))
    dirs.foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("batch=")) {
        val id = scala.util.Try(name.stripPrefix("batch=").toLong).toOption
        if (id.exists(_ < upTo)) fs.delete(st.getPath, true)
      }
    }
  }

  /** Session-level switch to the RocksDB state store provider (the config
    * is read at query START, so set it before starting stateful queries;
    * already-running queries keep their provider). Exposed separately from
    * the constructor flag so non-Engine pipelines (EventStreams) can opt
    * in on their own session.
    */
  def enableRocksDBStateStore(spark: SparkSession): Unit = {
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    // Per-batch changelog uploads instead of full SST snapshots — the
    // checkpoint cost scales with the batch's delta, not the state size.
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true"
    )
  }

  /** Collision-free idempotence-token namespace for a peer directory: the
    * sanitized path keeps tokens readable, the md5 suffix disambiguates
    * paths that sanitize identically (a bare 32-bit hashCode could collide
    * across peers, silently cross-wiring their exactly-once bookkeeping).
    */
  private[graft] def tokenSafe(dir: String): String = {
    val safe = dir.replaceAll("[^A-Za-z0-9_.-]", "_").takeRight(48)
    val digest = java.security.MessageDigest
      .getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .take(6)
      .map(b => f"$b%02x")
      .mkString
    s"$safe-$digest"
  }
}
