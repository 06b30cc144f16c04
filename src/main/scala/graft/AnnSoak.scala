package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.AnnIndex

/** Soak drill for the ANN index's delete → recentre lifecycle at scale
  * (r9 verdict #6: `delete` was spec-tested only). Against the sf1
  * 20k-vector table it:
  *
  *   1. builds a base index, then tombstones ~10% of the vectors across
  *      THREE delete-only delta versions (marker row counts must track
  *      each wave exactly);
  *   2. asserts probe results over the tombstone chain equal a fresh
  *      build on the surviving set when every cell is probed — the
  *      guaranteed equality: the visible vector SET is identical, so with
  *      all inverted lists read, centroid drift cannot change candidates
  *      (at small nProbe the tombstone head keeps the BASE centroids by
  *      design — the documented staleness contract — so cell CHOICE may
  *      legitimately differ until recentre);
  *   3. asserts no tombstoned id ever surfaces in any probe result;
  *   4. recentres (folds the chain, drops tombstones physically, recomputes
  *      centroids over survivors) and re-asserts equality at SMALL nProbe
  *      too: a recentred index is artifact-identical to the fresh build —
  *      label-derived cells and survivor-mean centroids — so even the
  *      approximate probe must agree row for row;
  *   5. asserts the recentred version physically dropped the tombstones
  *      (cell row count = survivors) and collapsed the chain (no `_base`).
  *
  * Run: `sbt "runMain graft.AnnSoak [embDir] [workDir]"` (defaults
  * tmp/sf1, tmp/ann-soak); wired into `tools/round_gate.sh --soak`.
  */
object AnnSoak {

  def main(args: Array[String]): Unit = {
    val embDir = args.headOption.getOrElse("tmp/sf1")
    val work = if (args.length > 1) args(1) else "tmp/ann-soak"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = new java.io.File(work)
    if (dir.exists()) { def rm(f: java.io.File): Unit = { Option(f.listFiles).foreach(_.foreach(rm)); f.delete() }; rm(dir) }

    val emb = spark.read.parquet(s"$embDir/embeddings.parquet")
    val n = emb.count()
    val cellCount = emb.select("label").distinct().count().toInt
    println(s"[ann-soak] $n vectors, $cellCount cells from $embDir")

    // 64 deterministic probes drawn from the SURVIVING population (a probe
    // that is itself tombstoned would compare self-exclusion semantics,
    // not deletion semantics).
    def survives(c: org.apache.spark.sql.Column) = !pmod(c, lit(30)).isin(3, 13, 23)
    val probes = emb
      .filter(survives(col("vec_id")))
      .orderBy("vec_id")
      .limit(64)
      .select(
        col("vec_id").as("qid"),
        transform(col("embedding"), x => x.cast("double")).as("qv")
      )
      .cache()
    require(probes.count() == 64, "probe draw must be stable")

    // --- base index + three tombstone waves (vec_id % 30 in {3,13,23}) ---
    val live = s"$work/live"
    val v1 = AnnIndex.build(spark, emb, live)
    require(AnnIndex.current(spark, live).contains((v1, n)), "base marker must carry all rows")
    var expect = n
    for (wave <- Seq(3, 13, 23)) {
      val ids = emb.filter(pmod(col("vec_id"), lit(30)) === wave).select("vec_id")
      val waveN = ids.count()
      val v = AnnIndex.delete(spark, ids, live)
      expect -= waveN
      val cur = AnnIndex.current(spark, live)
      require(cur.map(_._1).contains(v) && cur.map(_._2).contains(expect),
        s"after wave $wave expected ($v, $expect) got $cur")
      println(s"[ann-soak] wave $wave: tombstoned $waveN, marker rows $expect")
    }
    val removed = n - expect
    require(removed >= n / 10 - 3 * 30 && removed <= n / 10 + 3 * 30,
      s"three waves of vec_id%30 must remove ~10%: $removed of $n")

    // --- fresh build on the surviving set ---
    val freshDir = s"$work/fresh"
    val survivorsDf = emb.filter(survives(col("vec_id")))
    AnnIndex.build(spark, survivorsDf, freshDir)

    def results(idx: String, nProbe: Int): Seq[(Long, Long, Int, Double)] = {
      import spark.implicits._
      AnnIndex.probe(spark, idx, probes, nProbe = nProbe, k = 5)
        .as[(Long, Long, Int, Double)].collect().toSeq.sorted
    }

    // (2) all-cells probe: tombstone chain == fresh build, row for row.
    val chainAll = results(live, cellCount)
    val freshAll = results(freshDir, cellCount)
    require(chainAll == freshAll,
      s"all-cell probe over the tombstone chain diverged from the fresh build " +
        s"(${chainAll.size} vs ${freshAll.size} rows)")
    println(s"[ann-soak] all-cell probe: ${chainAll.size} rows, chain == fresh")

    // (3) tombstoned ids are invisible at ANY nProbe.
    val goneIds = emb.filter(!survives(col("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    for (np <- Seq(2, 4, cellCount)) {
      val hit = results(live, np).map(_._2).toSet.intersect(goneIds)
      require(hit.isEmpty, s"tombstoned ids surfaced at nProbe=$np: ${hit.take(5)}")
    }
    println(s"[ann-soak] ${goneIds.size} tombstoned ids invisible at nProbe 2/4/$cellCount")

    // (4) recentre: artifact-identical to the fresh build — equality must
    // now hold at small nProbe too, and centroids must match exactly.
    val rv = AnnIndex.recentre(spark, live)
    require(AnnIndex.current(spark, live).contains((rv, expect)),
      "recentre must preserve the surviving row count")
    for (np <- Seq(2, 4, cellCount)) {
      val a = results(live, np)
      val b = results(freshDir, np)
      require(a == b, s"recentred probe diverged from fresh build at nProbe=$np")
    }
    def centroids(idx: String): Seq[(Int, Seq[Double])] = {
      import spark.implicits._
      val (v, _) = AnnIndex.current(spark, idx).get
      spark.read.parquet(s"$idx/v=$v/centroids")
        .select(col("cell").cast("int"), col("cv"))
        .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
    }
    require(centroids(live) == centroids(freshDir),
      "recentred centroids must equal the fresh build's survivor means")

    // (5) physical reclaim: the folded version holds exactly the survivors
    // and no chain pointer or delete table remains.
    val headDir = s"$live/v=$rv"
    val cellRows = spark.read.parquet(s"$headDir/cells").count()
    require(cellRows == expect, s"recentred cells hold $cellRows rows, expected $expect")
    require(!new java.io.File(s"$headDir/_base").exists(), "recentre must not chain")
    require(!new java.io.File(s"$headDir/deletes").exists(), "recentre must clear tombstones")

    println(s"[ann-soak] PASS: $n -> $expect vectors, 3 delta deletes, " +
      s"recentre folded to v=$rv artifact-identical to a fresh build")
    spark.stop()
  }
}
