package graft

import org.apache.spark.sql.SparkSession

import graft.log.OffsetOutOfRangeException
import graft.server.{ConsumeRequest, PermissionDeniedException, ProduceRequest}

/** CLI entry point — the analog of the reference's cobra/viper command
  * (reference: cmd/proglog/main.go:44-73): flags + a handful of verbs over
  * one engine instance.
  *
  * Usage:
  * {{{
  *   graft.Main --data-dir DIR [--subject root] <command> [args]
  *   graft.Main --bootstrap HOST:PORT (produce <v>... | consume <off> | servers)
  *   commands:
  *     produce <value>...     append values, print assigned offsets
  *     consume <offset>       read one record
  *     stat                   lowest/highest offset + segment count
  *     servers                cluster topology
  *     truncate <lowest>      drop whole segments at or below <lowest>
  *     compact [targetBytes]  merge adjacent small sealed segments
  *     serve [port]           HTTP/JSON server (produce/consume/stat/servers/tail)
  *     serve-grpc [port]      gRPC server speaking the reference's log.v1.Log
  *                            protocol (plaintext; mTLS is available through
  *                            the GrpcLogServer API)
  *     replicate <peerDir> <checkpointDir>
  *                            catch-up pull replication from a peer log
  *                            (exactly-once; resumes from the checkpoint)
  * }}}
  *
  * `--bootstrap HOST:PORT` switches produce/consume/servers to REMOTE mode:
  * the verbs ride [[graft.server.grpc.BalancedLogClient]] over the
  * `log.v1.Log` protocol — no Spark session, no log directory, and no
  * writer-epoch claim (direct `--data-dir` verbs OPEN the log and therefore
  * fence any live server on the same directory; remote mode is how a second
  * process talks to a served log, exactly as reference clients go through
  * its gRPC server). Plaintext channel: the serving side assigns its
  * `anonymousSubject`; mTLS clients use the BalancedLogClient API directly.
  */
object Main {
  private def usage(): Nothing = {
    System.err.println(
      "usage: graft.Main --data-dir DIR [--config-file F] [--subject S] [--name N] [--acl-model-file F] [--acl-policy-file F] [--tls-keystore P12 --tls-truststore P12 [--tls-pass PW]] (produce <v>... | consume <off> | stat | servers | truncate <low> | retain <maxAgeS> <maxBytes> | export <outDir> | restore <exportDir> | compact [bytes] | serve [port] | serve-grpc [port] | serve-mux [port] | replicate <peerDir> <ckptDir> | curate-near <peerDir> <ckptDir> <indexDir> [benchGramsParquet] [--bench-docs P] [--repetition-gate] [--lm-model DIR [--lm-min X]] | compact-near-index <indexDir> | stream-topk <peerDir> <ckptDir> <outDir> [--window-ms N] [--k N] [--capacity N] [--watermark D] | stream-funnel <peerDir> <ckptDir> <outDir> [--window-ms N] [--watermark D] | stream-anomaly <peerDir> <ckptDir> <outDir> [--watermark D] | stream-flow <peerDir> <ckptDir> <outDir> [--watermark D] [--idle-ms N] | stream-attribution <peerDir> <ckptDir> <outDir> [--watermark D] [--idle-ms N] | stream-sessions <peerDir> <ckptDir> <outDir> [--watermark D] [--gap-ms N] | stream-pca-drift <peerDir> <ckptDir> <outDir> | stream-repeat <docsOrSfDir> <outDir> [--page-docs N] [--max-pages M] | fit-lm <docsOrSfDir> <modelDir> | build-tokenizer <docsOrSfDir> <indexDir> [--merges K] | index-ann <embeddings> <indexDir> | index-ann-append <embeddings> <indexDir> | index-ann-delete <idsParquet> <indexDir> | index-ann-recentre <indexDir> | build-corpus <docsOrSfDir> <outDir> [--bench-grams P] [--bench-docs P] [--lm-min X [--lm-model DIR]] [--budget-tokens N] [--seq-len L] [--tokenizer ws|bpe] | append-corpus <deltaDocsOrSfDir> <outDir> [same flags; --tokenizer ws only] | corpus-report <corpusOutDir> | events-report <eventsDir> | sales-report <sfDir> | embedding-report <embDir> | text-report <docsDir> | media-report <docsDir> | explain-doc <corpusOutDir> <docId>)\n" +
        "       graft.Main --data-dir DIR --follower --join HOST:PORT [--ttl S] [--phi X] (serve-grpc | serve-mux) [port]   (announce to a cluster; heartbeat every S/3; leave on shutdown)\n" +
        "       graft.Main --bootstrap HOST:PORT [--tls-keystore P12 --tls-truststore P12 [--tls-pass PW]] (produce <v>... | consume <off> | servers)"
    )
    sys.exit(2)
  }

  /** Remote mode: the verbs that make sense against a served log, routed
    * through the balanced client (produce → leader, consume → follower).
    */
  private def remoteMain(
      bootstrap: String,
      rest: List[String],
      tls: Option[graft.server.MtlsConfig]
  ): Unit = {
    val (host, port) = bootstrap.lastIndexOf(':') match {
      case -1 => usage()
      case i  => (bootstrap.substring(0, i), bootstrap.substring(i + 1).toInt)
    }
    // Client-side mTLS mirrors the reference's PeerTLSConfig dials
    // (internal/agent/agent.go:124-149): key store = this client's
    // identity (its CN is the ACL subject), trust store = server anchors.
    val client = new graft.server.grpc.BalancedLogClient(host, port, tls)
    try {
      rest match {
        case "produce" :: values if values.nonEmpty =>
          client
            .produceStream(values.map(_.getBytes("UTF-8")))
            .foreach(off => println(s"offset: $off"))
        case "consume" :: off :: Nil =>
          val rec = client.consume(off.toLong)
          println(s"offset: ${rec.offset} value: ${new String(rec.value, "UTF-8")}")
        case "servers" :: Nil =>
          client.servers.foreach(s =>
            println(s"id: ${s.id} addr: ${s.rpcAddr} leader: ${s.isLeader}")
          )
        case _ => usage()
      }
    } catch {
      case e: Throwable =>
        // Surface the reference's wire-level error contract when present
        // (5 = NOT_FOUND carrying the 404 detail, 7 = PermissionDenied).
        graft.server.grpc.GrpcLogClient.offsetErrorDetails(e) match {
          case Some((msg, _, 5)) => System.err.println(s"error 404: $msg"); sys.exit(1)
          case Some((msg, _, 7)) => System.err.println(s"error 403: $msg"); sys.exit(1)
          case _                 => System.err.println(s"error: ${e.getMessage}"); sys.exit(1)
        }
    } finally client.close()
  }

  /** Announce this node to the cluster through a bootstrap member
    * (the agent's StartJoinAddrs analog, reference:
    * internal/agent/agent.go:151-163 via Serf join): register, seed the
    * local view from the response, heartbeat at TTL/3 when liveness is on,
    * and depart on shutdown. Shared by serve-grpc and serve-mux.
    */
  /** stages.json repeat-plan entry (CorpusBuilder.repeatPlanJson shape):
    * source, mass, target_tokens, epochs, capped, effective_tokens. The
    * shared escape-aware regex lives next to the writer; group 1 needs
    * [[graft.queries.CorpusBuilder.unescapeJsonString]] before printing.
    */
  private def repeatPlanRe = graft.queries.CorpusBuilder.repeatPlanRe
  private def unescapeSrc(s: String) = graft.queries.CorpusBuilder.unescapeJsonString(s)

  /** Read a stream verb's derived table through the shared
    * compaction-aware reader ([[graft.streaming.DerivedTable.readOpt]] —
    * the raw dir scan would double-count rows in a compaction's
    * marker-to-prune crash window and lose folded batches after the
    * prune); None ONLY for the no-output-yet shape (nothing ever
    * committed). A genuinely corrupt or unreadable table propagates — it
    * must not print as "no finalized ... yet".
    */
  private def readDerived(
      spark: SparkSession,
      out: String
  ): Option[org.apache.spark.sql.DataFrame] =
    graft.streaming.DerivedTable.readOpt(spark, out)

  private def announceTo(addr: String, engine: Engine, ttlSeconds: Long): Unit = {
    val (h, p) = addr.lastIndexOf(':') match {
      case -1 => usage()
      case ix => (addr.substring(0, ix), addr.substring(ix + 1).toInt)
    }
    val self = engine.service.membership.local
    val peer = new graft.server.grpc.GrpcLogClient(h, p)
    val view = peer.join(self)
    view.servers.foreach(engine.service.membership.join)
    // Heartbeat cadence comes from the HUB's advertised TTL (JoinResponse
    // ttl_millis), not this node's own --ttl: the hub is the evictor, so
    // its clock is the one that matters. A joiner with no --ttl against a
    // TTL'd hub heartbeats anyway; mismatched flags can no longer get a
    // healthy member silently swept out of GetServers. The local --ttl
    // still governs this node's OWN registry sweeps.
    val beatMillis = if (view.ttlMillis > 0) view.ttlMillis else ttlSeconds * 1000L
    println(
      s"joined via $addr; cluster: ${view.servers.map(_.id).mkString(", ")}" +
        (if (beatMillis > 0) s"; heartbeat every ${beatMillis / 3} ms (hub ttl ${view.ttlMillis} ms)"
         else "")
    )
    // Liveness heartbeat: re-announce at TTL/3 so two beats can be lost
    // before the hub's sweep evicts us. A re-join is an idempotent upsert
    // on the hub — the announcement IS the beat.
    if (beatMillis > 0) {
      val beat = new Thread(() => {
        while (true) {
          Thread.sleep(math.max(1L, beatMillis / 3))
          // The returned view is this node's OWN liveness feed: topology
          // is hub-propagated, so re-seeding the local registry from each
          // beat's response is what refreshes the hub (and every peer) in
          // our own TTL'd view — discarding it would sweep the leader out
          // of this follower's GetServers answers after one TTL.
          try peer.join(self).servers.foreach(engine.service.membership.join)
          catch { case _: Exception => () } // hub briefly down: retry next beat
        }
      }, "membership-heartbeat")
      beat.setDaemon(true)
      beat.start()
    }
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try peer.leave(self.id)
      catch { case _: Exception => () }
      try peer.close()
      catch { case _: Exception => () }
    }))
  }

  def main(args: Array[String]): Unit = {
    var dataDir: Option[String] = None
    var bootstrap: Option[String] = None
    var subject = "root"
    var joinAddr: Option[String] = None
    var follower = false
    var nodeName: Option[String] = None
    // Liveness TTL in seconds: members must re-announce within this window
    // or GetServers evicts them (crash detection without gossip). 0 = off.
    var ttlSeconds = 0L
    // Phi accrual suspicion threshold for member liveness (adaptive
    // failure detection over the heartbeat inter-arrival distribution;
    // see Membership.phiThreshold). 0 = TTL-only. 8 is conventional.
    var phi = 0.0
    // mTLS for the serve verbs (reference: agent config ServerTLSConfig,
    // internal/agent/agent.go:124-149): key store = server identity, trust
    // store = client anchors. Password via --tls-pass or SPARK_GRAFT_TLS_PASS.
    var tlsKeyStore: Option[String] = None
    var tlsTrustStore: Option[String] = None
    var tlsPass: String = sys.env.getOrElse("SPARK_GRAFT_TLS_PASS", "changeit")
    // ACL files (reference: --acl-model-file / --acl-policy-file,
    // cmd/proglog/main.go:61-62). The model file is validated (it must be
    // the sub/obj/act allow model our map ACL implements); the policy file
    // becomes the serving Acl.
    var aclModelFile: Option[String] = None
    var aclPolicyFile: Option[String] = None
    var rest = List.empty[String]

    // --config-file (reference: viper config, cmd/proglog/main.go:49,76-88):
    // a key=value file supplies the same settings as the flags, and
    // explicit CLI flags win — achieved by applying the file FIRST, then
    // letting the normal flag pass overwrite. Keys are the flag names
    // without the leading dashes; unknown keys fail loudly.
    args.sliding(2).foreach {
      case Array("--config-file", path) =>
        java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path)).forEach { raw =>
          val line = raw.trim
          if (line.nonEmpty && !line.startsWith("#")) {
            val (k, v) = line.split("=", 2) match {
              case Array(k, v) => (k.trim, v.trim)
              case _ => { System.err.println(s"config-file: malformed line '$line'"); usage() }
            }
            k match {
              case "data-dir"       => dataDir = Some(v)
              case "bootstrap"      => bootstrap = Some(v)
              case "subject"        => subject = v
              case "join"           => joinAddr = Some(v)
              case "name"           => nodeName = Some(v)
              case "follower"       => follower = v.toBoolean
              case "ttl"            => ttlSeconds = v.toLong
              case "phi"            => phi = v.toDouble
              case "tls-keystore"   => tlsKeyStore = Some(v)
              case "tls-truststore" => tlsTrustStore = Some(v)
              case "tls-pass"       => tlsPass = v
              case "acl-model-file" => aclModelFile = Some(v)
              case "acl-policy-file" => aclPolicyFile = Some(v)
              case other =>
                System.err.println(s"config-file: unknown key '$other'"); usage()
            }
          }
        }
      case _ => ()
    }

    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--data-dir" if i + 1 < args.length  => dataDir = Some(args(i + 1)); i += 2
        case "--bootstrap" if i + 1 < args.length => bootstrap = Some(args(i + 1)); i += 2
        case "--subject" if i + 1 < args.length   => subject = args(i + 1); i += 2
        case "--join" if i + 1 < args.length      => joinAddr = Some(args(i + 1)); i += 2
        case "--name" if i + 1 < args.length      => nodeName = Some(args(i + 1)); i += 2
        case "--follower"                         => follower = true; i += 1
        case "--ttl" if i + 1 < args.length       => ttlSeconds = args(i + 1).toLong; i += 2
        case "--phi" if i + 1 < args.length       => phi = args(i + 1).toDouble; i += 2
        case "--tls-keystore" if i + 1 < args.length   => tlsKeyStore = Some(args(i + 1)); i += 2
        case "--tls-truststore" if i + 1 < args.length => tlsTrustStore = Some(args(i + 1)); i += 2
        case "--tls-pass" if i + 1 < args.length       => tlsPass = args(i + 1); i += 2
        case "--acl-model-file" if i + 1 < args.length  => aclModelFile = Some(args(i + 1)); i += 2
        case "--acl-policy-file" if i + 1 < args.length => aclPolicyFile = Some(args(i + 1)); i += 2
        case "--config-file" if i + 1 < args.length     => i += 2 // consumed in the pre-pass
        case "--data-dir" | "--bootstrap" | "--subject" | "--join" | "--name" | "--ttl" |
            "--phi" | "--tls-keystore" | "--tls-truststore" | "--tls-pass" |
            "--acl-model-file" | "--acl-policy-file" | "--config-file" => usage()
        case other                                => rest = rest :+ other; i += 1
      }
    }
    aclModelFile.foreach(graft.server.Acl.requireReferenceModel)
    val acl = aclPolicyFile
      .map(graft.server.Acl.fromPolicyFile)
      .getOrElse(graft.server.Acl.rootOnly)
    val tlsCfg: Option[graft.server.MtlsConfig] = (tlsKeyStore, tlsTrustStore) match {
      case (Some(ks), Some(ts)) => Some(graft.server.MtlsConfig(ks, tlsPass, ts, tlsPass))
      case (None, None)         => None
      case _                    => usage() // both stores or neither
    }
    if (rest.isEmpty) usage()
    if (bootstrap.isDefined) return remoteMain(bootstrap.get, rest, tlsCfg)
    val dir = dataDir.getOrElse(usage())

    val spark = SparkSession
      .builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // When serving, advertise a dialable address through GetServers so
    // balanced clients can resolve this node (SPARK_GRAFT_ADVERTISE
    // overrides for multi-host deployments where "localhost" is wrong).
    val advertised = rest match {
      case ("serve" | "serve-grpc" | "serve-mux") :: restArgs if restArgs.length <= 1 =>
        val defaultPort = rest.head match {
          case "serve"      => 8080
          case "serve-grpc" => 8400
          case _            => 8500
        }
        sys.env.getOrElse(
          "SPARK_GRAFT_ADVERTISE",
          s"localhost:${restArgs.headOption.map(_.toInt).getOrElse(defaultPort)}"
        )
      case _ => "local[*]"
    }
    if (phi > 0 && ttlSeconds <= 0) {
      // φ needs heartbeats (paced at ttl/3) to accrue intervals, and the
      // TTL is the bootstrap evictor for members that die before
      // phiMinSamples beats — a φ-only config can never evict them.
      System.err.println("--phi requires --ttl: heartbeats are paced by the TTL and the TTL governs the phi bootstrap window")
      sys.exit(2)
    }
    val engine = new Engine(
      spark,
      dir,
      acl = acl,
      nodeName = nodeName.getOrElse(if (follower) s"follower-$advertised" else "driver-0"),
      rpcAddr = advertised,
      isLeader = !follower,
      memberTtlMillis = ttlSeconds * 1000L,
      memberPhiThreshold = phi
    )

    try {
      rest match {
        case "produce" :: values if values.nonEmpty =>
          val acks = engine.service
            .produceStream(subject, values.iterator.map(v => ProduceRequest(v.getBytes("UTF-8"))))
            .toSeq
          acks.foreach(a => println(s"offset: ${a.offset}"))
        case "consume" :: off :: Nil =>
          val rec = engine.service.consume(subject, ConsumeRequest(off.toLong)).record
          println(s"offset: ${rec.offset} value: ${new String(rec.value, "UTF-8")}")
        case "stat" :: Nil =>
          println(
            s"lowest: ${engine.log.lowestOffset} highest: ${engine.log.highestOffset} " +
              s"segments: ${engine.log.segmentCount}"
          )
        case "servers" :: Nil =>
          engine.service.getServers.foreach(s =>
            println(s"id: ${s.id} addr: ${s.rpcAddr} leader: ${s.isLeader}")
          )
        case "truncate" :: low :: Nil =>
          engine.log.truncate(low.toLong)
          println(s"truncated below ${low.toLong}; lowest now ${engine.log.lowestOffset}")
        case "retain" :: age :: bytesCap :: Nil =>
          // Policy-driven retention (log.retention.{ms,bytes} analog):
          // age in seconds, size cap in bytes; 0 disables either bound.
          val dropped =
            engine.log.retain(maxAgeMillis = age.toLong * 1000L, maxBytes = bytesCap.toLong)
          println(s"retention dropped $dropped segments; lowest now ${engine.log.lowestOffset}")
        case "export" :: out :: Nil =>
          // L6 snapshot export: the ordered full-log reader as parquet —
          // the Snapshot half of the reference's FSM pair
          // (distributed_fsm.go:48-51); `restore` is the other half.
          engine.log.reader.write.parquet(out)
          val nExported = engine.log.currentManifest.segments.map(_.records).sum
          println(s"exported $nExported records to $out")
        case "restore" :: in :: Nil =>
          // fsm.Restore analog: reset at the export's first offset, rebuild
          // (reference: internal/log/distributed_fsm.go:53-83).
          engine.log.restore(in)
          println(
            s"restored; lowest: ${engine.log.lowestOffset} highest: ${engine.log.highestOffset} " +
              s"segments: ${engine.log.segmentCount}"
          )
        case "compact" :: restArgs if restArgs.length <= 1 =>
          val before = engine.log.segmentCount
          restArgs.headOption match {
            case Some(b) => engine.log.compact(b.toLong)
            case None    => engine.log.compact()
          }
          println(s"compacted: ${before} -> ${engine.log.segmentCount} segments")
        case "serve" :: restArgs if restArgs.length <= 1 =>
          // HTTP/JSON front end (reference: internal/server/http.go) —
          // blocks until killed.
          val srv = new graft.server.HttpLogServer(
            engine.service,
            restArgs.headOption.map(_.toInt).getOrElse(8080),
            tls = tlsCfg
          ).start()
          println(s"serving HTTP on port ${srv.boundPort}")
          Thread.currentThread.join()
        case "serve-mux" :: restArgs if restArgs.length <= 1 =>
          // Single-port assembly — the cmux role in the reference's agent
          // (agent.go:79-91): gRPC and HTTP/JSON share one listener, each
          // connection routed by its first bytes (HTTP/2 preface → gRPC).
          // Backends bind loopback-ephemeral; only the mux port is public.
          // Under --tls-* the backends own their mTLS handshakes and the
          // mux routes by ALPN peek — one published TLS port, CN auth
          // chain intact end-to-end.
          val grpcSrv = new graft.server.grpc.GrpcLogServer(
            engine.service, port = 0, tls = tlsCfg, anonymousSubject = subject,
            bindHost = Some("127.0.0.1")
          ).start()
          val httpSrv = new graft.server.HttpLogServer(
            engine.service, port = 0, tls = tlsCfg, bindHost = Some("127.0.0.1")
          ).start()
          val mux = new graft.server.PortMux(
            restArgs.headOption.map(_.toInt).getOrElse(8500),
            grpcSrv.boundPort,
            httpSrv.boundPort
          ).start()
          println(
            s"serving gRPC+HTTP multiplexed on port ${mux.boundPort} " +
              s"(backends: grpc ${grpcSrv.boundPort}, http ${httpSrv.boundPort})"
          )
          // Epidemic view propagation (Serf-convergence stand-in): relay
          // membership changes one hop + periodic push-pull anti-entropy.
          val muxPropagator = new graft.server.MembershipPropagator(
            engine.service.membership,
            new graft.server.grpc.GrpcMembershipTransport(tlsCfg),
            antiEntropyMillis = if (ttlSeconds > 0) ttlSeconds * 1000L / 2 else 30000L
          ).start()
          // The mux-served node is a full agent too: announce (and
          // heartbeat under --ttl) exactly like serve-grpc — peers dial
          // the advertised mux port, where gRPC routes by preface.
          joinAddr.foreach(announceTo(_, engine, ttlSeconds))
          try Thread.currentThread.join()
          finally muxPropagator.close()
        case "serve-grpc" :: restArgs if restArgs.length <= 1 =>
          // The reference's actual wire protocol (api/v1/log.proto) —
          // blocks until killed.
          val srv = new graft.server.grpc.GrpcLogServer(
            engine.service,
            restArgs.headOption.map(_.toInt).getOrElse(8400),
            tls = tlsCfg,
            // Plaintext dev mode: anonymous peers act as the CLI subject.
            anonymousSubject = subject
          ).start()
          println(s"serving gRPC on port ${srv.boundPort}")
          // Ops visibility: per-RPC counters on shutdown (the OpenCensus-
          // views stand-in — see GrpcLogServer.stats).
          Runtime.getRuntime.addShutdownHook(new Thread(() => {
            val lat = srv.latencies
            srv.stats.toSeq.sortBy(_._1).foreach { case (m, (calls, errors)) =>
              val p = lat.get(m).map(s =>
                f" p50=${s.p50Millis}%.1fms p95=${s.p95Millis}%.1fms p99=${s.p99Millis}%.1fms"
              ).getOrElse("")
              System.err.println(s"rpc $m: calls=$calls errors=$errors$p")
            }
            // Tail of the always-sample span ring (trace exporter stand-in).
            srv.recentTraces.takeRight(10).foreach { s =>
              System.err.println(
                f"trace ${s.traceId} ${s.method} ${s.durationNanos / 1e6}%.2fms ok=${s.ok}"
              )
            }
          }))
          // Epidemic view propagation (Serf-convergence stand-in): relay
          // membership changes one hop + periodic push-pull anti-entropy.
          val propagator = new graft.server.MembershipPropagator(
            engine.service.membership,
            new graft.server.grpc.GrpcMembershipTransport(tlsCfg),
            antiEntropyMillis = if (ttlSeconds > 0) ttlSeconds * 1000L / 2 else 30000L
          ).start()
          // Announce to the cluster (the agent's StartJoinAddrs analog,
          // reference: internal/agent/agent.go:151-163 via Serf join).
          joinAddr.foreach(announceTo(_, engine, ttlSeconds))
          try Thread.currentThread.join()
          finally propagator.close()
        case "replicate" :: peer :: ckpt :: Nil =>
          val q = engine.replicateFrom(
            peer,
            checkpoint = ckpt,
            trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()
          )
          q.processAllAvailable()
          q.awaitTermination()
          println(s"replicated from $peer; highest now ${engine.log.highestOffset}")
        case "curate-near" :: peer :: ckpt :: index :: rest =>
          // One-shot near-dup curation pass over the peer's backlog:
          // resumable (same checkpoint + index), exactly-once, LSH-deduped
          // against every previously kept document. Optional stages, all
          // in the same streaming pass: a positional parquet of benchmark
          // 3-grams (column `gram`) decontaminates; `--repetition-gate`
          // adds the Gopher word-repetition rules; `--lm-model DIR
          // [--lm-min X]` scores against the persisted unigram model
          // (fit-lm) and drops docs whose avg token log-likelihood is
          // below X (default -8.0).
          var repGate = false
          var lmModel: Option[String] = None
          var lmMin = -8.0
          var benchDocsPath: Option[String] = None
          val positional = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < rest.length) {
            rest(i) match {
              case "--repetition-gate" => repGate = true; i += 1
              case "--bench-docs" =>
                if (i + 1 >= rest.length) {
                  System.err.println("--bench-docs requires a parquet path"); usage()
                }
                benchDocsPath = Some(rest(i + 1)); i += 2
              case "--lm-model" =>
                if (i + 1 >= rest.length) {
                  System.err.println("--lm-model requires a model directory"); usage()
                }
                lmModel = Some(rest(i + 1)); i += 2
              case "--lm-min" =>
                if (i + 1 >= rest.length) { System.err.println("--lm-min requires a number"); usage() }
                lmMin = try rest(i + 1).toDouble
                catch {
                  case _: NumberFormatException =>
                    System.err.println(s"--lm-min: not a number: ${rest(i + 1)}"); usage()
                }
                i += 2
              case f if f.startsWith("--") =>
                System.err.println(s"unknown flag: $f"); usage()
              case p => positional += p; i += 1
            }
          }
          if (positional.length > 1) {
            System.err.println(s"at most one benchGramsParquet, got: ${positional.mkString(" ")}")
            usage()
          }
          if (lmModel.isEmpty && rest.contains("--lm-min")) {
            System.err.println("--lm-min only makes sense with --lm-model"); usage()
          }
          val q = engine.curateNearFrom(
            peer,
            checkpoint = ckpt,
            indexDir = index,
            benchmarkGrams = positional.headOption.map(b => spark.read.parquet(b)),
            benchmarkDocs = benchDocsPath.map(spark.read.parquet(_)),
            repetitionGate = repGate,
            lmQuality = lmModel.map(_ -> lmMin),
            trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()
          )
          q.processAllAvailable()
          q.awaitTermination()
          println(s"curated from $peer; highest now ${engine.log.highestOffset}")
        case "fit-lm" :: docs :: model :: Nil =>
          // Fit (or refit) the persistent unigram quality model from a
          // reference corpus — the build half of the CCNet fit/score
          // split; curate-near --lm-model scores against it. `docs` is a
          // documents parquet path or a testdata scale dir.
          val docsPath =
            if (new java.io.File(s"$docs/documents.parquet").exists()) s"$docs/documents.parquet"
            else docs
          val v = graft.queries.LmModel.fit(spark, spark.read.parquet(docsPath), model)
          val (_, rows, floor) = graft.queries.LmModel.current(spark, model).get
          println(s"fitted lm model v=$v at $model (docs=$rows, oov floor=$floor)")
        case "build-tokenizer" :: docs :: index :: btRest =>
          // Train the BPE merge table once and publish it versioned
          // (v=N/merges + _complete marker last) — the build half of the
          // tokenizer build/apply split; text_bpe_apply and token-budget
          // accounting probe the committed version. `docs` is a dir
          // containing documents.parquet (sf dir or corpus output).
          var merges = graft.queries.Bpe.DefaultMerges
          var bi = 0
          while (bi < btRest.length) {
            btRest(bi) match {
              case "--merges" if bi + 1 < btRest.length =>
                merges = btRest(bi + 1).toInt; bi += 2
              case f =>
                System.err.println(s"build-tokenizer: unknown flag $f"); usage()
            }
          }
          val v = graft.queries.Tokenizer.build(spark, docs, index, merges)
          val learned = graft.queries.Tokenizer.merges(spark, index)
          println(s"built tokenizer v=$v at $index (${learned.size} merges: ${learned.mkString(", ")})")
        case "index-ann" :: emb :: index :: Nil =>
          // Build (or rebuild) the persistent IVF index for an embeddings
          // table — the build half of the build/probe split; knn queries
          // and services probe it via AnnIndex.probe. `emb` is either an
          // embeddings parquet path or a testdata scale dir containing
          // embeddings.parquet.
          val embPath =
            if (new java.io.File(s"$emb/embeddings.parquet").exists()) s"$emb/embeddings.parquet"
            else emb
          val v = graft.queries.AnnIndex.build(spark, spark.read.parquet(embPath), index)
          println(s"built ann index v=$v at $index")
        case "index-ann-append" :: emb :: index :: Nil =>
          // Incremental maintenance: delta version over the current index
          // (nearest-existing-centroid assignment, base lists untouched).
          val embPath =
            if (new java.io.File(s"$emb/embeddings.parquet").exists()) s"$emb/embeddings.parquet"
            else emb
          val v = graft.queries.AnnIndex.append(spark, spark.read.parquet(embPath), index)
          println(s"appended ann index delta v=$v at $index")
        case "index-ann-delete" :: ids :: index :: Nil =>
          // Tombstone-delete vectors (a parquet with a vec_id column):
          // O(delta) — no inverted list rewrites; space reclaims at the
          // next recentre.
          val v = graft.queries.AnnIndex.delete(spark, spark.read.parquet(ids), index)
          println(s"tombstoned ann index delta v=$v at $index")
        case "index-ann-recentre" :: index :: Nil =>
          // Fold the delta chain into one consolidated version with
          // recomputed centroids (the staleness repair).
          val v = graft.queries.AnnIndex.recentre(spark, index)
          println(s"recentred ann index into v=$v at $index")
        case verb :: docs :: out :: buildRest
            if verb == "build-corpus" || verb == "append-corpus" =>
          // One-command corpus build: curate gates -> exact dedup -> LSH
          // near-dedup -> decontaminate -> LM gate -> mix-weighted token
          // budget -> sequence packing, with per-stage counts and a
          // versioned exactly-once commit (CorpusBuilder). append-corpus
          // runs the same stages incrementally: delta-only text compute
          // against the persisted state, pool-level budget/pack recompute.
          var benchGrams: Option[String] = None
          var benchDocs: Option[String] = None
          var lmMin: Option[Double] = None
          var lmModel: Option[String] = None
          var budget: Option[Long] = None
          var seqLen = 512L
          var tokenizer = "ws"
          var bi = 0
          while (bi < buildRest.length) {
            buildRest(bi) match {
              case "--tokenizer" if bi + 1 < buildRest.length =>
                tokenizer = buildRest(bi + 1); bi += 2
              case "--bench-grams" if bi + 1 < buildRest.length =>
                benchGrams = Some(buildRest(bi + 1)); bi += 2
              case "--bench-docs" if bi + 1 < buildRest.length =>
                benchDocs = Some(buildRest(bi + 1)); bi += 2
              case "--lm-min" if bi + 1 < buildRest.length =>
                lmMin = Some(buildRest(bi + 1).toDouble); bi += 2
              case "--lm-model" if bi + 1 < buildRest.length =>
                lmModel = Some(buildRest(bi + 1)); bi += 2
              case "--budget-tokens" if bi + 1 < buildRest.length =>
                budget = Some(buildRest(bi + 1).toLong); bi += 2
              case "--seq-len" if bi + 1 < buildRest.length =>
                seqLen = buildRest(bi + 1).toLong; bi += 2
              case f =>
                System.err.println(s"$verb: unknown flag $f"); usage()
            }
          }
          val docsPath =
            if (new java.io.File(s"$docs/documents.parquet").exists()) s"$docs/documents.parquet"
            else docs
          val run =
            if (verb == "build-corpus") graft.queries.CorpusBuilder.build _
            else graft.queries.CorpusBuilder.append _
          val (v, stageCounts) = run(
            spark,
            spark.read.parquet(docsPath),
            out,
            Seq("en", "de", "fr"),
            0.5,
            benchGrams.map(spark.read.parquet(_)),
            benchDocs.map(spark.read.parquet(_)),
            lmMin,
            lmModel,
            budget,
            seqLen,
            tokenizer
          )
          stageCounts.foreach(c => println(s"stage ${c.stage}: docs=${c.docs} tokens=${c.tokens}"))
          // Per-document lineage summary: the drops table partitions the
          // input (audit any doc with a point query on doc_id).
          spark.read
            .parquet(s"$out/v=$v/drops")
            .groupBy("stage")
            .count()
            .orderBy("stage")
            .collect()
            .foreach(r => println(s"dropped ${r.getString(0)}: ${r.getLong(1)}"))
          // With a token budget, the persisted data recipe: per-source
          // repeat schedule (corpus_epochs arithmetic) from stages.json.
          if (budget.isDefined) {
            // Hadoop-FS read, NOT java.nio: outDir may be hdfs://s3a://
            // (a local-only read here would fail AFTER the version
            // committed, exiting nonzero on a successful build).
            val sj = graft.queries.CorpusBuilder
              .readSmallFile(spark, s"$out/v=$v/stages.json")
            repeatPlanRe
              .findAllMatchIn(sj)
              .foreach(m =>
                println(
                  s"repeat ${unescapeSrc(m.group(1))}: mass=${m.group(2)} target=${m.group(3)} " +
                    s"epochs=${m.group(4)} capped=${m.group(5)} effective=${m.group(6)}"
                )
              )
          }
          println(s"committed corpus v=$v at $out")
        case "stream-topk" :: peer :: ckpt :: out :: tkRest =>
          // One-shot (resumable) pass over the peer log's event backlog:
          // maintain the derived per-window heavy-hitter table
          // (Engine.topKFrom — bounded SpaceSaving state per window, rows
          // finalized on watermark close, exactly-once batch partitions).
          var windowMs = 3600000L
          var k = 3
          var capacity = 64
          var watermark = "10 minutes"
          var ti = 0
          while (ti < tkRest.length) {
            tkRest(ti) match {
              case "--window-ms" if ti + 1 < tkRest.length =>
                windowMs = tkRest(ti + 1).toLong; ti += 2
              case "--k" if ti + 1 < tkRest.length =>
                k = tkRest(ti + 1).toInt; ti += 2
              case "--capacity" if ti + 1 < tkRest.length =>
                capacity = tkRest(ti + 1).toInt; ti += 2
              case "--watermark" if ti + 1 < tkRest.length =>
                watermark = tkRest(ti + 1); ti += 2
              case f =>
                System.err.println(s"stream-topk: unknown flag $f"); usage()
            }
          }
          val q = engine.topKFrom(
            peer, ckpt, out, windowMs, k, capacity, watermark,
            org.apache.spark.sql.streaming.Trigger.AvailableNow()
          )
          q.processAllAvailable()
          q.awaitTermination()
          val finalized =
            readDerived(spark, out)
          finalized.filter(_.columns.contains("window_start")) match {
            case Some(df) =>
              val total = df.count()
              df.orderBy("window_start", "rank").limit(20).collect().foreach { r =>
                println(
                  s"window ${r.getAs[java.sql.Timestamp]("window_start")} " +
                    s"rank ${r.getAs[Int]("rank")}: user ${r.getAs[Long]("user_id")} " +
                    s"est=${r.getAs[Long]("est_count")} -${r.getAs[Long]("max_overcount")}"
                )
              }
              println(s"finalized $total top-k rows at $out")
            case None => println(s"no finalized windows yet at $out")
          }
        case "stream-funnel" :: peer :: ckpt :: out :: fRest =>
          // One-shot (resumable) funnel pass over the peer log's event
          // backlog: maintain the derived per-user stage table
          // (Engine.funnelFrom — stage rows immutable once emitted,
          // exactly-once batch partitions).
          var fWindowMs = 24L * 60 * 60 * 1000
          var fWatermark = "10 minutes"
          var fi = 0
          while (fi < fRest.length) {
            fRest(fi) match {
              case "--window-ms" if fi + 1 < fRest.length =>
                fWindowMs = fRest(fi + 1).toLong; fi += 2
              case "--watermark" if fi + 1 < fRest.length =>
                fWatermark = fRest(fi + 1); fi += 2
              case f =>
                System.err.println(s"stream-funnel: unknown flag $f"); usage()
            }
          }
          val fq = engine.funnelFrom(
            peer, ckpt, out, fWindowMs, fWatermark,
            org.apache.spark.sql.streaming.Trigger.AvailableNow()
          )
          fq.processAllAvailable()
          fq.awaitTermination()
          val stages =
            readDerived(spark, out)
          stages.filter(_.columns.contains("stage")) match {
            case Some(df) =>
              df.groupBy("stage").count().orderBy("stage").collect().foreach { r =>
                println(s"stage ${r.getString(0)}: ${r.getLong(1)} users")
              }
              println(s"funnel table at $out (${df.count()} stage rows)")
            case None => println(s"no finalized funnel stages yet at $out")
          }
        case "stream-anomaly" :: peer :: ckpt :: out :: aRest =>
          // One-shot (resumable) pass over the peer log's event backlog:
          // maintain the derived finalized daily-counts table
          // (Engine.dailyCountsFrom — one state row per open day, rows
          // final on watermark close), then print the trailing-z-score
          // anomaly report (Engine.anomalyReport — the exact
          // q_anomaly_days arithmetic over the finalized days).
          var aWatermark = "1 hour"
          var ai = 0
          while (ai < aRest.length) {
            aRest(ai) match {
              case "--watermark" if ai + 1 < aRest.length =>
                aWatermark = aRest(ai + 1); ai += 2
              case f =>
                System.err.println(s"stream-anomaly: unknown flag $f"); usage()
            }
          }
          val aq = engine.dailyCountsFrom(
            peer, ckpt, out, aWatermark,
            org.apache.spark.sql.streaming.Trigger.AvailableNow()
          )
          aq.processAllAvailable()
          aq.awaitTermination()
          val dailyTable =
            readDerived(spark, out)
          dailyTable.filter(_.columns.contains("day")) match {
            case Some(df) =>
              val report = Engine.anomalyReport(spark, out).collect()
              report.foreach { r =>
                val zs = Option(r.get(3)).map(_.toString).getOrElse("null (flat baseline)")
                val flag = if (r.getBoolean(4)) "  << ANOMALY" else ""
                println(s"day ${r.getDate(0)}: n=${r.getLong(1)} mean=${r.getDouble(2)} z=$zs$flag")
              }
              // The same finalized table answers the staffing question:
              // the weekday profile (shared q_seasonality volume columns).
              Engine.seasonalityReport(spark, out).collect().foreach { r =>
                println(s"  ${r.getString(1)}: ${r.getLong(2)} events (share ${r.getDouble(3)})")
              }
              println(
                s"${df.count()} finalized days at $out, ${report.length} scored, " +
                  s"${report.count(_.getBoolean(4))} anomalous"
              )
            case None => println(s"no finalized days yet at $out")
          }
        case "stream-pca-drift" :: peer :: ckpt :: out :: Nil =>
          // One-shot (resumable) pass over the peer log's embedding-record
          // backlog: maintain the derived additive-Gramian PCA table
          // (Engine.pcaDriftFrom — one O(d²) partials partition per batch,
          // history merged, never recomputed), then print the latest
          // readout — bit-exact to the batch vec_pca query over every
          // vector ingested so far.
          val pq = engine.pcaDriftFrom(
            peer, ckpt, out,
            org.apache.spark.sql.streaming.Trigger.AvailableNow()
          )
          pq.processAllAvailable()
          pq.awaitTermination()
          val pcRows = Engine.pcaDriftReport(spark, out).collect()
          graft.queries.Checkpoints.release()
          if (pcRows.isEmpty) println(s"no committed drift readout yet at $out")
          else {
            val top = pcRows.maxBy(r => math.abs(r.getDouble(1)))
            pcRows.foreach(r => println(s"dim ${r.getInt(0)}: loading ${r.getDouble(1)}"))
            println(
              s"top component dim ${top.getInt(0)} (|loading| ${math.abs(top.getDouble(1))}), " +
                s"ev_share ${pcRows.head.getDouble(2)} — ${pcRows.length} dims at $out"
            )
          }
        case "stream-flow" :: peer :: ckpt :: out :: fwRest =>
          // One-shot (resumable) pass over the peer log's event backlog:
          // maintain the derived transition-pair table
          // (Engine.transitionsFrom — event-time-ordered pairs, scalar
          // per-user state, idle eviction), then print the transition
          // matrix (Engine.flowReport — the exact q_event_flow
          // aggregation over the finalized pairs).
          var fwWatermark = "10 minutes"
          var fwIdle = 24L * 60 * 60 * 1000
          var fwi = 0
          while (fwi < fwRest.length) {
            fwRest(fwi) match {
              case "--watermark" if fwi + 1 < fwRest.length =>
                fwWatermark = fwRest(fwi + 1); fwi += 2
              case "--idle-ms" if fwi + 1 < fwRest.length =>
                fwIdle = fwRest(fwi + 1).toLong; fwi += 2
              case f =>
                System.err.println(s"stream-flow: unknown flag $f"); usage()
            }
          }
          val fwq = engine.transitionsFrom(
            peer, ckpt, out, fwWatermark, fwIdle,
            org.apache.spark.sql.streaming.Trigger.AvailableNow()
          )
          fwq.processAllAvailable()
          fwq.awaitTermination()
          val pairTable =
            readDerived(spark, out)
          pairTable.filter(_.columns.contains("from_type")) match {
            case Some(df) =>
              val matrix = Engine.flowReport(spark, out).collect()
              matrix.foreach { r =>
                println(
                  s"${r.getString(0)} -> ${r.getString(1)}: n=${r.getLong(2)} p=${r.getDouble(3)}"
                )
              }
              println(s"${df.count()} finalized transitions at $out, ${matrix.length} matrix cells")
            case None => println(s"no finalized transitions yet at $out")
          }
        case "stream-repeat" :: docs :: out :: srRest =>
          // Resumable trainer-facing epoch stream: page the
          // corpus_repeat_apply expansion in (source, epoch, shard, pos)
          // order (the corpus_shuffle deal) into committed chunk-N
          // parquet dirs. Re-running continues from the last committed
          // chunk — exactly-once, crash-safe (RepeatStream Scaladoc).
          var pageDocs = 1000
          var maxPages = Int.MaxValue
          var si = 0
          while (si < srRest.length) {
            srRest(si) match {
              case "--page-docs" if si + 1 < srRest.length =>
                pageDocs = srRest(si + 1).toInt; si += 2
              case "--max-pages" if si + 1 < srRest.length =>
                maxPages = srRest(si + 1).toInt; si += 2
              case f =>
                System.err.println(s"stream-repeat: unknown flag $f"); usage()
            }
          }
          // Existence check via the Hadoop FS API, not java.io.File —
          // RepeatStream reads docs through Hadoop, so the guard must see
          // the same namespace (hdfs:// / s3a:// paths included).
          val docsParquet = new org.apache.hadoop.fs.Path(s"$docs/documents.parquet")
          val docsFs = docsParquet.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val docsDir =
            if (docsFs.exists(docsParquet)) docs
            else {
              System.err.println(s"stream-repeat: no documents.parquet under $docs")
              sys.exit(1)
            }
          val already = graft.queries.RepeatStream.committedSeqs(spark, out)
          if (already.nonEmpty)
            println(s"resuming after committed chunk ${already.last} (${already.size} chunks)")
          var pages = 0
          var drained = false
          try {
            while (pages < maxPages && !drained) {
              graft.queries.RepeatStream.emitNext(spark, docsDir, out, pageDocs) match {
                case Some((seq, rows, last)) =>
                  println(f"chunk $seq%06d: rows=$rows cursor=$last")
                  pages += 1
                case None =>
                  drained = true
              }
            }
            if (drained) println("stream drained: epoch stream fully emitted")
            else println(s"paused after $pages pages; re-run to continue")
          } catch {
            case e: graft.queries.RepeatStream.CorpusChangedException =>
              System.err.println(s"stream-repeat: ${e.getMessage}")
              sys.exit(1)
          }
        case "stream-sessions" :: peer :: ckpt :: out :: ssRest =>
          // One-shot (resumable) pass over the peer log's event backlog:
          // maintain the derived finalized-session table
          // (Engine.sessionsFrom — the batch q_sessionize gap contract,
          // sessions immutable once the watermark passes end + gap), then
          // print the dwell-time histogram (Engine.sessionHistReport —
          // the exact q_session_duration_hist bucketing).
          var ssWatermark = "10 minutes"
          var ssGap = 30L * 60 * 1000
          var ssi = 0
          while (ssi < ssRest.length) {
            ssRest(ssi) match {
              case "--watermark" if ssi + 1 < ssRest.length =>
                ssWatermark = ssRest(ssi + 1); ssi += 2
              case "--gap-ms" if ssi + 1 < ssRest.length =>
                ssGap = ssRest(ssi + 1).toLong; ssi += 2
              case f =>
                System.err.println(s"stream-sessions: unknown flag $f"); usage()
            }
          }
          val ssq = engine.sessionsFrom(
            peer, ckpt, out, ssGap, ssWatermark,
            org.apache.spark.sql.streaming.Trigger.AvailableNow()
          )
          ssq.processAllAvailable()
          ssq.awaitTermination()
          val sessTable =
            readDerived(spark, out)
          sessTable.filter(_.columns.contains("start")) match {
            case Some(df) =>
              val hist = Engine.sessionHistReport(spark, out).collect()
              hist.foreach { r =>
                println(s"bucket ${r.getLong(0)}: ${r.getLong(1)} sessions, " +
                  s"${r.getLong(2)}-${r.getLong(3)} s")
              }
              println(s"${df.count()} finalized sessions at $out, ${hist.length} buckets")
            case None => println(s"no finalized sessions yet at $out")
          }
        case "stream-attribution" :: peer :: ckpt :: out :: atRest =>
          // One-shot (resumable) pass over the peer log's event backlog:
          // maintain the derived credited-purchase table
          // (Engine.attributionFrom — event-time-ordered last-touch
          // credit, two scalars per user, idle eviction), then print the
          // channel rollup (Engine.attributionReport — the exact
          // q_attribution aggregation over the finalized rows).
          var atWatermark = "10 minutes"
          var atIdle = 24L * 60 * 60 * 1000
          var ati = 0
          while (ati < atRest.length) {
            atRest(ati) match {
              case "--watermark" if ati + 1 < atRest.length =>
                atWatermark = atRest(ati + 1); ati += 2
              case "--idle-ms" if ati + 1 < atRest.length =>
                atIdle = atRest(ati + 1).toLong; ati += 2
              case f =>
                System.err.println(s"stream-attribution: unknown flag $f"); usage()
            }
          }
          val atq = engine.attributionFrom(
            peer, ckpt, out, atWatermark, atIdle,
            org.apache.spark.sql.streaming.Trigger.AvailableNow()
          )
          atq.processAllAvailable()
          atq.awaitTermination()
          val credited =
            readDerived(spark, out)
          credited.filter(_.columns.contains("channel")) match {
            case Some(df) =>
              val rollup = Engine.attributionReport(spark, out).collect()
              rollup.foreach { r =>
                println(s"${r.getString(0)}: ${r.getLong(1)} conversions " +
                  s"(${r.getLong(2)} cents, share ${r.getDouble(3)})")
              }
              println(s"${df.count()} credited purchases at $out, ${rollup.length} channels")
            case None => println(s"no credited purchases yet at $out")
          }
        case "events-report" :: dir :: Nil =>
          // The one-command product-analytics dashboard over any directory
          // holding an events.parquet (a testdata sfDir or an exported
          // log): funnel, engagement, volume anomalies, top transition
          // cells and top journeys — each the oracle-checked query from
          // SparkEntry.queries, so the dashboard IS the verified surface.
          val qs = SparkEntry.queries
          def run(name: String) = qs(name)(spark, dir)
          println("== conversion funnel (view -> click -> purchase, 24h windows)")
          run("q_funnel").collect().foreach { r =>
            println(s"  ${r.getString(0)}: ${r.getLong(1)} users " +
              s"(conversion ${r.getDouble(2)})")
          }
          println("== engagement (most recent 7 active days)")
          run("q_active_users").orderBy(org.apache.spark.sql.functions.desc("day"))
            .limit(7).collect().reverse.foreach { r =>
              println(s"  ${r.getDate(0)}: dau=${r.getLong(1)} wau=${r.getLong(2)} " +
                s"mau=${r.getLong(3)} stickiness=${r.getDouble(4)}")
            }
          println("== acquisition (new vs returning, most recent 7 active days)")
          run("q_new_vs_returning").orderBy(org.apache.spark.sql.functions.desc("day"))
            .limit(7).collect().reverse.foreach { r =>
              println(s"  ${r.getDate(0)}: new=${r.getLong(2)} returning=${r.getLong(3)} " +
                s"(new_frac ${r.getDouble(4)})")
            }
          println("== volume anomalies (trailing-z over the 7 preceding active days)")
          val anom = run("q_anomaly_days").collect()
          val flagged = anom.filter(_.getBoolean(4))
          if (flagged.isEmpty) println(s"  none flagged across ${anom.length} scored days")
          else flagged.foreach { r =>
            println(s"  ${r.getDate(0)}: n=${r.getLong(1)} z=${r.get(3)}")
          }
          println("== top transition cells (P(next|current))")
          run("q_event_flow").orderBy(org.apache.spark.sql.functions.desc("n"))
            .limit(5).collect().foreach { r =>
              println(s"  ${r.getString(0)} -> ${r.getString(1)}: n=${r.getLong(2)} " +
                s"p=${r.getDouble(3)}")
            }
          println("== top journeys (first 8 steps per 30-min session)")
          run("q_session_paths").collect().take(5).foreach { r =>
            println(s"  #${r.getInt(0)} ${r.getString(1)} (${r.getLong(2)} sessions)")
          }
          println("== weekly growth accounting (new / retained / resurrected / churned)")
          run("q_growth_accounting").collect().foreach { r =>
            println(s"  week ${r.get(0)}: +${r.getLong(1)} new, ${r.getLong(2)} retained, " +
              s"${r.getLong(3)} resurrected, -${r.getLong(4)} churned")
          }
          println("== hourly profile (intraday volume curve, top 5 hours)")
          run("q_hourly_profile")
            .orderBy(org.apache.spark.sql.functions.desc("n_events"),
              org.apache.spark.sql.functions.col("hour"))
            .limit(5).collect().foreach { r =>
              println(s"  ${r.getLong(0)}:00 UTC: ${r.getLong(1)} events (share ${r.getDouble(2)})")
            }
          println("== weekday seasonality (volume profile)")
          run("q_seasonality").collect().foreach { r =>
            println(s"  ${r.getString(1)}: ${r.getLong(2)} events, " +
              s"${r.getLong(3)} users (share ${r.getDouble(4)})")
          }
          println("== last-touch attribution (purchases credited to the preceding channel)")
          run("q_attribution").collect().foreach { r =>
            println(s"  ${r.getString(0)}: ${r.getLong(1)} conversions " +
              s"(${r.getLong(2)} cents, share ${r.getDouble(3)})")
          }
          graft.queries.Checkpoints.release()
        case "sales-report" :: dir :: Nil =>
          // The commerce twin of events-report over the TPC-H-ish tables:
          // revenue rollup, regional revenue, monthly promo share, cohort
          // LTV, and supplier variety — each the oracle-checked query from
          // SparkEntry.queries, so the report IS the verified surface.
          val qs = SparkEntry.queries
          def run(name: String) = qs(name)(spark, dir)
          println("== revenue rollup by return flag / line status")
          run("q1_agg").collect().foreach { r =>
            println(f"  ${r.getString(0)}/${r.getString(1)}: ${r.getLong(7)} items, " +
              f"disc revenue ${r.getDouble(4)}%.2f")
          }
          println("== revenue by region")
          run("q5_region_revenue").collect().foreach { r =>
            println(f"  ${r.getString(0)}: ${r.getDouble(1)}%.2f (${r.getLong(2)} items)")
          }
          println("== promo revenue share (most recent 6 months)")
          run("q_promo_share").collect().takeRight(6).foreach { r =>
            println(f"  ${r.getInt(0)}: share ${r.getDouble(3)} " +
              f"(${r.getDouble(1)}%.2f of ${r.getDouble(2)}%.2f)")
          }
          println("== cohort LTV (5 earliest cohorts, latest month)")
          val ltv = run("q_ltv_cohorts").collect()
          ltv.map(_.getInt(0)).distinct.sorted.take(5).foreach { c =>
            val last = ltv.filter(_.getInt(0) == c).maxBy(_.getInt(1))
            println(s"  cohort $c: ${last.getInt(1) + 1} months, " +
              s"ltv ${last.getLong(5)} cents/member")
          }
          println("== supplier variety (top 5 part lines, tainted suppliers excluded)")
          run("q_supplier_variety").collect().take(5).foreach { r =>
            println(s"  ${r.getString(0)} ${r.getString(1)}: ${r.getLong(2)} suppliers")
          }
          println("== discount forecast (Q6: revenue from eliminating the 5-7% band)")
          run("q6_forecast_revenue").collect().foreach { r =>
            println(f"  ${r.getDouble(0)}%.2f across ${r.getLong(1)} lines")
          }
          println("== top returners (customers by returned-item revenue)")
          run("q_top_returners").collect().take(5).foreach { r =>
            println(f"  ${r.getString(1)} (${r.getString(2)}): " +
              f"${r.getDouble(3)}%.2f returned across ${r.getLong(4)} lines")
          }
          println("== repurchase cadence (day-gap buckets between consecutive orders)")
          run("q_purchase_intervals").collect().foreach { r =>
            println(s"  bucket ${r.getLong(0)}: ${r.getLong(1)} gaps, " +
              s"${r.getLong(2)}-${r.getLong(3)} days (mean ${r.getDouble(4)})")
          }
          graft.queries.Checkpoints.release()
        case "media-report" :: dir :: Nil =>
          // The media-QA dashboard over any directory holding a documents
          // table with binary payloads: blob shape, exact-duplicate
          // collapse, and perceptual near-dup pressure — each the
          // oracle-checked query from SparkEntry.queries. The fifth
          // dashboard (events / sales / embedding / text / media).
          val qs = SparkEntry.queries
          def run(name: String) = qs(name)(spark, dir)
          import org.apache.spark.sql.functions.{avg => savg, col => c, count => scount, countDistinct => scountd, max => smax, min => smin, round => sround, sum => ssum}
          println("== blob shape")
          run("media_meta")
            .agg(scount(c("doc_id")).as("n"), smin(c("n_bytes")).as("min_b"),
              smax(c("n_bytes")).as("max_b"), ssum(c("n_bytes")).as("total_b"),
              smax(c("width")).as("max_w"), smax(c("height")).as("max_h"))
            .collect().foreach { r =>
              println(s"  ${r.get(0)} blobs, ${r.get(1)}-${r.get(2)} bytes " +
                s"(${r.get(3)} total), max dims ${r.get(4)}x${r.get(5)}")
            }
          println("== exact duplicates (content-hash collapse)")
          val md = run("media_dedup")
          md.agg(scount(c("content_hash")).as("groups"), ssum(c("n_copies")).as("blobs"))
            .collect().foreach { r =>
              println(s"  ${r.get(1)} blobs collapse to ${r.get(0)} distinct contents")
            }
          println("== perceptual near-dup pressure (aHash banded pairs)")
          val pp = run("media_phash_pairs")
          pp.agg(scount(c("d1")).as("pairs"), sround(savg(c("hamming")), 2).as("mean_ham"),
            smin(c("hamming")).as("min_ham"))
            .collect().foreach { r =>
              println(s"  ${r.get(0)} candidate pairs, hamming mean ${r.get(1)} " +
                s"min ${r.get(2)}")
            }
          graft.queries.Checkpoints.release()
        case "text-report" :: dir :: Nil =>
          // The corpus-QA dashboard over any directory holding a
          // documents.parquet: per-source triage, language-ID confusion,
          // vocabulary health (Zipf slope), readability, length shape and
          // the cross-source duplication matrix — each the oracle-checked
          // query from SparkEntry.queries, so the report IS the verified
          // surface. Completes the dashboard quartet (events / sales /
          // embedding / text).
          val qs = SparkEntry.queries
          def run(name: String) = qs(name)(spark, dir)
          import org.apache.spark.sql.functions.{avg => savg, col => c, desc => sdesc, max => smax, min => smin, round => sround, sum => ssum}
          println("== per-source triage (docs, dup fraction, mean quality)")
          run("corpus_source_triage").collect().take(10).foreach { r =>
            val flag = if (r.getBoolean(4)) "  << FLAGGED" else ""
            println(s"  ${r.getString(0)}: ${r.getLong(1)} docs, dup ${r.getDouble(2)}, " +
              s"quality ${r.getDouble(3)}$flag")
          }
          println("== language-ID confusion (labeled vs predicted)")
          run("text_lang_confusion").collect().take(10).foreach { r =>
            println(s"  ${r.getString(0)} -> ${r.getString(1)}: ${r.getLong(2)} docs " +
              s"(rate ${r.getDouble(3)})")
          }
          println("== vocabulary health (Zipf fit over the top-1000 slice)")
          run("text_zipf_slope").collect().foreach { r =>
            println(s"  slope ${r.getDouble(1)} intercept ${r.getDouble(2)} " +
              s"(natural corpora sit near -1)")
          }
          println("== quality calibration (heuristic deciles vs LM mean logp; slope ~ 0 = heuristic is no proxy)")
          run("corpus_quality_calibration").collect().foreach { r =>
            println(s"  decile ${r.getLong(0)}: ${r.getLong(1)} docs, mean_logp ${r.getDouble(2)} " +
              s"(fit slope ${r.getDouble(3)} intercept ${r.getDouble(4)})")
          }
          println("== readability (FORCAST grade over raw docs)")
          run("text_readability")
            .agg(smin(c("forcast")).as("min"), sround(savg(c("forcast")), 2).as("mean"),
              smax(c("forcast")).as("max"))
            .collect().foreach { r =>
              println(s"  grade min=${r.getDouble(0)} mean=${r.getDouble(1)} max=${r.getDouble(2)}")
            }
          println("== length shape (log2 token buckets, all sources)")
          run("corpus_length_hist")
            .groupBy("bucket").agg(ssum(c("n_docs")).as("n_docs"))
            .orderBy("bucket")
            .collect().foreach { r =>
              println(s"  bucket ${r.getLong(0)}: ${r.getLong(1)} docs")
            }
          println("== character-class mix (tokenizer-design profile, first 5 sources)")
          run("text_char_classes").collect().take(5).foreach { r =>
            println(s"  ${r.getString(0)}: alpha ${r.getDouble(2)} digit ${r.getDouble(3)} " +
              s"space ${r.getDouble(4)} other ${r.getDouble(5)}")
          }
          println("== dedup proposal (keep-first over near-dup clusters)")
          run("dedup_reduction").collect().foreach { r =>
            println(s"  ${r.getLong(0)} docs -> ${r.getLong(1)} kept " +
              s"(doc reduction ${r.getDouble(2)}, token reduction ${r.getDouble(5)})")
          }
          println("== dedup threshold audit (pair-similarity deciles above tau)")
          run("dedup_sim_hist").collect().foreach { r =>
            println(s"  decile ${r.getLong(0)}: ${r.getLong(1)} pairs " +
              s"(j ${r.getDouble(2)}-${r.getDouble(3)})")
          }
          println("== cross-source duplication (top near-dup cells)")
          run("corpus_cross_source_dup")
            .orderBy(sdesc("n_pairs"), c("source_a"), c("source_b"))
            .collect().take(5).foreach { r =>
              val kind = if (r.getString(0) == r.getString(1)) "within" else "BETWEEN"
              println(s"  ${r.getString(0)} ~ ${r.getString(1)}: ${r.getLong(2)} pairs ($kind)")
            }
          graft.queries.Checkpoints.release()
        case "embedding-report" :: dir :: Nil =>
          // The embedding-QA dashboard over any directory holding an
          // embeddings.parquet: corpus shape, the dominant principal
          // component (collapse/drift detector), per-label cluster quality,
          // and the least-central members per label — each the
          // oracle-checked query from SparkEntry.queries, so the report IS
          // the verified surface.
          val qs = SparkEntry.queries
          def run(name: String) = qs(name)(spark, dir)
          println("== corpus shape")
          import org.apache.spark.sql.functions.{col => c, count => scount, max => smax, min => smin}
          run("vec_stats")
            .agg(scount(c("vec_id")).as("n"), smax(c("dim")).as("dim"),
              smin(c("l2_norm")).as("min_norm"), smax(c("l2_norm")).as("max_norm"))
            .collect().foreach { r =>
              println(s"  ${r.getLong(0)} vectors, dim=${r.getInt(1)}, " +
                s"l2 norm in [${r.getDouble(2)}, ${r.getDouble(3)}]")
            }
          println("== top principal component (fixed-point power iteration)")
          val pca = run("vec_pca").collect()
          println(s"  explained-variance share: ${pca.head.getDouble(2)}")
          pca.sortBy(r => (-math.abs(r.getDouble(1)), r.getInt(0))).take(5).foreach { r =>
            println(s"  dim ${r.getInt(0)}: loading ${r.getDouble(1)}")
          }
          println("== cluster quality (cohesion vs nearest-centroid separation)")
          run("vec_cluster_quality").collect().foreach { r =>
            println(s"  label ${r.get(0)}: n=${r.getLong(1)} cohesion=${r.getDouble(2)} " +
              s"nearest=${r.get(3)} separation=${r.getDouble(4)} margin=${r.getDouble(5)}")
          }
          println("== exact duplicates (bit-identical vectors, pipeline-bug alarm)")
          run("vec_exact_dups")
            .agg(scount(c("content_hash")).as("groups"),
              org.apache.spark.sql.functions.sum(c("n_copies")).as("vecs"))
            .collect().foreach { r =>
              println(s"  ${r.getLong(1)} vectors collapse to ${r.getLong(0)} distinct contents")
            }
          println("== least-central members (top outlier per label, z ascending)")
          run("vec_outliers").filter(c("rank") === 1).collect().foreach { r =>
            println(s"  label ${r.get(0)}: vec ${r.getLong(2)} " +
              s"centroid_cos=${r.getDouble(3)} z=${r.getDouble(4)}")
          }
          println("== ANN recall@5 vs exact brute force (tune nProbe/planes/budget HERE)")
          run("knn_recall").collect().foreach { r =>
            println(f"  ${r.getString(0)}%-10s setting=${r.getInt(1)}%-3d " +
              f"hits=${r.getLong(2)}%3d/${r.getLong(3)} recall=${r.getDouble(4)}%.3f")
          }
          graft.queries.Checkpoints.release()
        case "corpus-report" :: out :: Nil =>
          // One-stop build report from the persisted artifacts alone — no
          // pipeline recompute: the stage funnel (stages.json), the drop
          // histogram (drops parquet), and the packed layout summary.
          graft.queries.CorpusBuilder.current(spark, out) match {
            case None => System.err.println(s"no complete corpus build under $out"); sys.exit(1)
            case Some((v, docs)) =>
              import org.apache.spark.sql.functions.{col => c, countDistinct, max => smax, sum => ssum, count => scount, lit => slit}
              println(s"corpus v=$v at $out")
              val stagesJson = graft.queries.CorpusBuilder
                .readSmallFile(spark, s"$out/v=$v/stages.json")
              """\{"stage":"(\w+)","docs":(\d+),"tokens":(\d+)\}""".r
                .findAllMatchIn(stagesJson)
                .foreach(m =>
                  println(f"  stage ${m.group(1)}%-14s docs=${m.group(2)}%-8s tokens=${m.group(3)}")
                )
              // Data recipe, when the build carried a token budget: the
              // per-source repeat schedule (corpus_epochs arithmetic).
              """"tokenizer":"(\w+)"""".r
                .findFirstMatchIn(stagesJson)
                .foreach(m => println(s"  tokenizer=${m.group(1)}"))
              """"budget_tokens":(\d+)""".r
                .findFirstMatchIn(stagesJson)
                .foreach(m => println(s"  budget_tokens=${m.group(1)}"))
              repeatPlanRe
                .findAllMatchIn(stagesJson)
                .foreach(m =>
                  println(
                    f"  repeat ${unescapeSrc(m.group(1))}%-10s mass=${m.group(2)}%-8s target=${m.group(3)}%-8s " +
                      s"epochs=${m.group(4)} capped=${m.group(5)} effective=${m.group(6)}"
                  )
                )
              spark.read.parquet(s"$out/v=$v/drops")
                .groupBy("stage").agg(scount(slit(1)).as("n"))
                .orderBy("stage").collect()
                .foreach(r => println(s"  dropped ${r.getString(0)}: ${r.getLong(1)}"))
              val pack = spark.read.parquet(s"$out/v=$v/corpus")
                .agg(
                  scount(slit(1)).as("docs"),
                  ssum("n_tokens").as("tokens"),
                  countDistinct(c("bucket")).as("shards"),
                  smax("seq_id").as("max_seq")
                ).first()
              println(
                s"  packed: ${pack.getAs[Long]("docs")} docs / ${pack.getAs[Long]("tokens")} tokens " +
                  s"across ${pack.getAs[Long]("shards")} shards (max seq ${pack.getAs[Long]("max_seq")})"
              )
              // require, not assert: this audit-path consistency check must
              // survive -Xdisable-assertions (the rest of the codebase's
              // invariant style).
              require(
                pack.getAs[Long]("docs") == docs,
                s"packed table docs=${pack.getAs[Long]("docs")} != commit marker docs=$docs"
              )
          }
        case "explain-doc" :: out :: docId :: Nil =>
          // The lineage audit: why is doc X (not) in the corpus? One
          // pushed-down point filter against the current version's drops
          // and corpus tables (drops partitions the input, so exactly one
          // of the three verdicts below holds).
          graft.queries.CorpusBuilder.current(spark, out) match {
            case None => System.err.println(s"no complete corpus build under $out"); sys.exit(1)
            case Some((v, _)) =>
              val id = docId.toLong
              val dropped = spark.read
                .parquet(s"$out/v=$v/drops")
                .filter(org.apache.spark.sql.functions.col("doc_id") === id)
                .collect()
                .headOption
              val packed = spark.read
                .parquet(s"$out/v=$v/corpus")
                .filter(org.apache.spark.sql.functions.col("doc_id") === id)
                .collect()
                .headOption
              (dropped, packed) match {
                case (Some(r), _) =>
                  println(s"doc $id: DROPPED at stage ${r.getAs[String]("stage")} (v=$v)")
                case (None, Some(r)) =>
                  println(
                    s"doc $id: PACKED (v=$v, bucket ${r.getAs[Long]("bucket")}, " +
                      s"seq ${r.getAs[Long]("seq_id")}, token_start ${r.getAs[Long]("token_start")})"
                  )
                case (None, None) =>
                  println(s"doc $id: not in build v=$v's input")
              }
          }
        case "compact-near-index" :: index :: Nil =>
          Engine.compactNearIndex(spark, index) match {
            case Some(upTo) => println(s"compacted $index into batch=$upTo")
            case None       => println(s"no index partitions at $index")
          }
        case _ => usage()
      }
    } catch {
      case e: OffsetOutOfRangeException =>
        System.err.println(s"error 404: ${e.getMessage}"); sys.exit(1)
      case e: PermissionDeniedException =>
        System.err.println(s"error 403: ${e.getMessage}"); sys.exit(1)
    } finally {
      spark.stop()
    }
  }
}
