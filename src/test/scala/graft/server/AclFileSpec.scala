package graft.server

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Casbin-file ACL loading (reference: test/model.conf + test/policy.csv via
  * `--acl-model-file` / `--acl-policy-file`, cmd/proglog/main.go:61-62).
  * Mirrors server_test.go:286-308: a subject listed in the policy acts, an
  * unlisted subject gets the exact Casbin deny message with
  * PermissionDenied(7) semantics.
  */
class AclFileSpec extends AnyFunSuite {

  private def write(name: String, content: String): String = {
    val p = Files.createTempDirectory("acl").resolve(name)
    Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  private val referenceModel =
    """# Request definition
      |[request_definition]
      |r = sub, obj, act
      |
      |[policy_definition]
      |p = sub, obj, act
      |
      |[policy_effect]
      |e = some(where (p.eft == allow))
      |
      |[matchers]
      |m = r.sub == p.sub && r.obj == p.obj && r.act == p.act
      |""".stripMargin

  test("policy file in the reference's format grants exactly what it lists") {
    val acl = Acl.fromPolicyFile(write(
      "policy.csv",
      """p, root, *, produce
        |p, root, *, consume
        |
        |# a produce-only service account
        |p, ingester, *, produce
        |""".stripMargin
    ))
    assert(acl.isPermitted("root", Action.Produce))
    assert(acl.isPermitted("root", Action.Consume))
    assert(acl.isPermitted("ingester", Action.Produce))
    assert(!acl.isPermitted("ingester", Action.Consume))
    assert(!acl.isPermitted("nobody", Action.Produce))

    // Deny carries the exact Casbin message shape + code 7
    // (reference: internal/auth/authorizer.go:20-27).
    val e = intercept[PermissionDeniedException](acl.authorize("nobody", Action.Produce))
    assert(e.getMessage == "nobody not permitted to produce to *")
    assert(e.code == 7)
  }

  test("malformed policy lines and unknown actions fail loudly") {
    intercept[IllegalArgumentException](
      Acl.fromPolicyFile(write("bad1.csv", "p, root, *"))
    )
    intercept[IllegalArgumentException](
      Acl.fromPolicyFile(write("bad2.csv", "p, root, *, fly"))
    )
    intercept[IllegalArgumentException](
      Acl.fromPolicyFile(write("bad3.csv", "p, root, topic-a, produce"))
    )
  }

  test("the reference model file validates; a different matcher is rejected") {
    Acl.requireReferenceModel(write("model.conf", referenceModel))
    val tampered = referenceModel.replace("r.act == p.act", "r.act != p.act")
    intercept[IllegalArgumentException](
      Acl.requireReferenceModel(write("model2.conf", tampered))
    )
  }

  test("a file-loaded ACL drives LogService authorization end-to-end") {
    val acl = Acl.fromPolicyFile(write(
      "policy.csv",
      "p, writer, *, produce\np, reader, *, consume\n"
    ))
    val spark = graft.TestSpark.spark
    val dir = graft.TestSpark.tempDir("acl-svc")
    val log = graft.log.SparkLog(spark, dir)
    val svc = new LogService(log, acl)
    val off = svc.produce("writer", ProduceRequest("hello".getBytes("UTF-8"))).offset
    assert(off == 0L)
    assert(new String(svc.consume("reader", ConsumeRequest(0L)).record.value, "UTF-8") == "hello")
    val e = intercept[PermissionDeniedException](
      svc.produce("reader", ProduceRequest("nope".getBytes("UTF-8")))
    )
    assert(e.getMessage == "reader not permitted to produce to *")
    intercept[PermissionDeniedException](svc.consume("writer", ConsumeRequest(0L)))
  }
}
