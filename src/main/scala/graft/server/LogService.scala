package graft.server

import org.apache.spark.sql.DataFrame

import graft.log.{LogRecord, OffsetOutOfRangeException, SparkLog}

/** Request/response surface mirroring the reference wire schema
  * (reference: api/v1/log.proto:22-48) as plain Scala — the engine is
  * library-first; a network layer can wrap these 1:1.
  */
final case class ProduceRequest(value: Array[Byte])
final case class ProduceResponse(offset: Long)
final case class ConsumeRequest(offset: Long)
final case class ConsumeResponse(record: LogRecord)

/** Cluster-topology row (reference: api/v1/log.proto:41-48). */
final case class ServerInfo(id: String, rpcAddr: String, isLeader: Boolean)

/** Denied action — carries gRPC PermissionDenied(7) semantics and the exact
  * message shape of the reference's Casbin deny path
  * (reference: internal/auth/authorizer.go:20-27: "%s not permitted to %s to %s").
  */
final case class PermissionDeniedException(subject: String, action: String, obj: String = "*")
    extends RuntimeException(s"$subject not permitted to $action to $obj") {
  val code: Int = 7 // gRPC PermissionDenied
}

/** Action names (reference: internal/server/server.go:42-46). */
object Action {
  val Produce = "produce"
  val Consume = "consume"
}

/** Map-based ACL standing in for the reference's Casbin model/policy files
  * (reference: test/model.conf, test/policy.csv — `root` may produce/consume
  * on object `*`; `nobody` may do nothing). Objects collapse to `*` exactly
  * as the reference uses them (reference: internal/server/server.go:101,112).
  */
final case class Acl(policy: Map[String, Set[String]]) {
  def isPermitted(subject: String, action: String): Boolean =
    policy.getOrElse(subject, Set.empty).contains(action)

  /** Throws PermissionDeniedException on deny, like Authorizer.Authorize
    * (reference: internal/auth/authorizer.go:20-27).
    */
  def authorize(subject: String, action: String): Unit =
    if (!isPermitted(subject, action)) throw PermissionDeniedException(subject, action)
}

object Acl {
  /** The reference test policy: root → produce+consume, everyone else → ∅. */
  def rootOnly: Acl = Acl(Map("root" -> Set(Action.Produce, Action.Consume)))

  /** Load a Casbin-style CSV policy (reference: test/policy.csv, loaded via
    * `--acl-policy-file`, cmd/proglog/main.go:62). Lines look like
    * `p, root, *, produce`; blank lines and `#` comments are skipped,
    * anything else malformed fails loudly — a silently-dropped policy line
    * is a privilege grant or denial the operator never sees. The object
    * column must be `*`: that is the only object the reference's servers
    * ever pass (internal/server/server.go:101,112), and our map ACL
    * collapses objects the same way.
    */
  def fromPolicyFile(path: String): Acl = {
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
    val grants = scala.collection.mutable.Map.empty[String, Set[String]]
    lines.forEach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        line.split(",").map(_.trim).toList match {
          case "p" :: subject :: obj :: action :: Nil =>
            require(obj == "*", s"unsupported policy object '$obj' in $path (only '*' is supported)")
            require(
              action == Action.Produce || action == Action.Consume,
              s"unknown action '$action' in $path"
            )
            grants(subject) = grants.getOrElse(subject, Set.empty) + action
          case _ =>
            throw new IllegalArgumentException(s"malformed policy line in $path: '$line'")
        }
      }
    }
    Acl(grants.toMap)
  }

  /** Accept an `--acl-model-file` (reference: test/model.conf via
    * cmd/proglog/main.go:61) by VALIDATING it is the reference's
    * allow-only sub/obj/act model. The map ACL hard-codes exactly that
    * model's semantics; loading a file with a different matcher or effect
    * and then ignoring it would silently change what the operator thinks
    * they deployed, so anything else is rejected.
    */
  def requireReferenceModel(path: String): Unit = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      "UTF-8"
    )
    def squash(s: String) = s.replaceAll("\\s+", "")
    val body = squash(text)
    val required = Seq(
      "r=sub,obj,act",
      "p=sub,obj,act",
      "e=some(where(p.eft==allow))",
      "m=r.sub==p.sub&&r.obj==p.obj&&r.act==p.act"
    )
    required.foreach { frag =>
      require(
        body.contains(frag),
        s"ACL model $path is not the supported sub/obj/act allow model (missing '$frag')"
      )
    }
  }
}

/** The gRPC server's operator surface (reference: internal/server/server.go)
  * re-expressed over SparkLog. Authentication (mTLS CN → subject,
  * reference: server.go:160-178) is out of engine scope: callers pass the
  * already-authenticated subject.
  */
class LogService(
    val log: SparkLog,
    val acl: Acl = Acl.rootOnly,
    val nodeName: String = "driver-0",
    val rpcAddr: String = "local[*]",
    /** Whether this node is the cluster's single writer. The reference
      * derives the flag from Raft leadership (distributed.go:188-202); here
      * the deployer states it — a replica serving a pull-replicated copy
      * (Engine.replicate) is a follower.
      */
    val isLeader: Boolean = true,
    /** Initial cluster members to advertise through GetServers — deployer
      * seeding for [[membership]], which then tracks runtime churn (each
      * peer row carries its own `isLeader`).
      */
    val peers: Seq[ServerInfo] = Nil,
    /** Liveness TTL for announced members (see [[Membership.ttlMillis]]);
      * 0 keeps announcement-only membership.
      */
    val memberTtlMillis: Long = 0L,
    /** φ accrual suspicion threshold (see [[Membership.phiThreshold]]);
      * 0 keeps TTL-only liveness.
      */
    val memberPhiThreshold: Double = 0.0
) {

  /** Live topology: deployer-seeded, then fed by Join/Leave announcements
    * (the Serf stand-in — see [[Membership]]).
    */
  val membership: Membership =
    new Membership(
      ServerInfo(nodeName, rpcAddr, isLeader = isLeader),
      peers,
      ttlMillis = memberTtlMillis,
      phiThreshold = memberPhiThreshold
    )

  /** A member announces itself (reference: discovery handler.Join,
    * membership.go:101-109). Mutating control-plane → produce permission,
    * the write-shaped ACL action. Returns the full post-join view so the
    * joiner learns the topology it just entered.
    */
  def join(subject: String, member: ServerInfo): Seq[ServerInfo] = {
    acl.authorize(subject, Action.Produce)
    membership.join(member)
    getServers
  }

  /** A member departs (reference: handler.Leave, membership.go:111-117). */
  def leave(subject: String, id: String): Unit = {
    acl.authorize(subject, Action.Produce)
    val _ = membership.leave(id)
  }

  /** R1 Produce (reference: internal/server/server.go:100-109). */
  def produce(subject: String, req: ProduceRequest): ProduceResponse = {
    acl.authorize(subject, Action.Produce)
    ProduceResponse(log.appendOne(req.value))
  }

  /** R2 Consume — typed 404 past the end (reference: server.go:111-120). */
  def consume(subject: String, req: ConsumeRequest): ConsumeResponse = {
    acl.authorize(subject, Action.Consume)
    ConsumeResponse(log.read(req.offset))
  }

  /** R3 ProduceStream: per-record acks carrying each assigned offset
    * (reference: server.go:122-136). The whole iterator commits through the
    * single-writer path in batches; acks preserve per-record granularity.
    */
  def produceStream(
      subject: String,
      requests: Iterator[ProduceRequest],
      batchSize: Int = 1024
  ): Iterator[ProduceResponse] = {
    acl.authorize(subject, Action.Produce)
    requests.grouped(batchSize).flatMap { batch =>
      val first = log.append(batch.map(_.value))
      batch.indices.map(i => ProduceResponse(first + i))
    }
  }

  /** R4 ConsumeStream, catch-up portion: every record from `offset` to the
    * current end, in order (reference: server.go:138-158 loops per record;
    * the batch read subsumes the loop). For the unbounded tail use [[tail]].
    */
  def consumeStream(subject: String, offset: Long): Iterator[LogRecord] = {
    acl.authorize(subject, Action.Consume)
    val hi = log.highestOffset
    if (log.currentManifest.segments.isEmpty || offset > hi) Iterator.empty
    else {
      val session = log.spark
      import session.implicits._
      import scala.jdk.CollectionConverters._
      import org.apache.spark.sql.functions.col
      // No global sort: the graft scan plans partitions in ascending offset
      // order (segments by base, parts by range) and each partition emits
      // ascending offsets, so toLocalIterator — which drains partitions in
      // plan order — already delivers log order. The former
      // `orderBy("offset")` added a range exchange plus its sampling pass
      // per call for nothing. Offset bounds push down to the scan.
      session.read
        .format("graft")
        .load(log.dir)
        .filter(col("offset") >= offset && col("offset") <= hi)
        .as[LogRecord]
        .toLocalIterator()
        .asScala
    }
  }

  /** R4 ConsumeStream, unbounded tail: the streaming DataFrame view — the
    * reference busy-polls for the next offset (reference: server.go:147-150),
    * Structured Streaming micro-batches replace the poll loop (SURVEY §2.6).
    */
  def tail(subject: String, from: Long = 0L): DataFrame = {
    acl.authorize(subject, Action.Consume)
    log.tail(from)
  }

  /** R5 GetServers: this node plus the live membership view (reference:
    * server.go:180-190, internal/log/distributed.go:188-202 — there the
    * list comes from the Raft configuration; here from deployer seeding
    * plus runtime Join/Leave churn). Single-node default: one leader row,
    * no followers.
    */
  def getServers: Seq[ServerInfo] = membership.list
}
