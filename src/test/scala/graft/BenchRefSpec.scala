package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins `Bench.loadQuietRef` against the ACTUAL committed
  * `bench_quiet_ref.json` — the test whose absence shipped round 14's
  * silent disarm: a tooling refresh committed the ref pretty-printed,
  * the compact-only parser degraded to `Map.empty`, and the
  * quiet-reference plausibility check certified nothing for the rest
  * of the round while reporting success. Any future drift in either
  * the ref's on-disk format or the parser now fails HERE, at commit
  * time, instead of silently disabling the check at bench time.
  *
  * No SparkSession needed: `SparkEntry.queries` is a lazy map of
  * closures (building it runs nothing) and the parser is pure IO.
  */
class BenchRefSpec extends AnyFunSuite {

  test("committed bench_quiet_ref.json parses and covers the registry") {
    val refPath = "bench_quiet_ref.json"
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(refPath)),
      s"committed quiet ref $refPath missing from repo root")
    val ref = Bench.loadQuietRef(refPath)
    val registry = SparkEntry.queries.keySet
    // >= 0.95x: queries registered AFTER the last ref refresh are
    // legitimately unanchored; a ref covering less than 95% of the
    // tree (or zero — the round-14 failure) is stale or unparsed.
    assert(ref.size >= math.ceil(0.95 * registry.size).toInt,
      s"quiet ref parsed ${ref.size} entries for a ${registry.size}-query " +
        "registry — ref is stale, or the parser regressed on the committed format")
    // Every parsed entry must be a positive finite seconds value.
    ref.foreach { case (n, v) =>
      assert(v > 0 && v.isFinite, s"ref entry $n has nonsense value $v")
    }
    // Every ref name should be a live registration (a renamed/removed
    // query leaves a dead anchor — harmless but worth surfacing).
    val dead = ref.keySet -- registry
    assert(dead.isEmpty, s"quiet ref carries entries for unregistered queries: $dead")
  }

  test("loadQuietRef tolerates both compact and pretty-printed JSON") {
    def parse(text: String): Map[String, Double] = {
      val f = java.nio.file.Files.createTempFile("quietref", ".json")
      try {
        java.nio.file.Files.write(f,
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        Bench.loadQuietRef(f.toString)
      } finally java.nio.file.Files.deleteIfExists(f)
    }
    val compact =
      """{"metric":"total","value":3.0,"unit":"sec","queries":{"a":1.5,"b":1.5,"bad":-1}}"""
    val pretty =
      """|{
         | "metric": "total",
         | "value": 3.0,
         | "unit": "sec",
         | "queries": {
         |  "a": 1.5,
         |  "b": 1.5,
         |  "bad": -1
         | }
         |}""".stripMargin
    val expect = Map("a" -> 1.5, "b" -> 1.5) // -1 = failed entry, anchors nothing
    assert(parse(compact) == expect)
    assert(parse(pretty) == expect)
    assert(parse("{}").isEmpty)          // no queries map -> no ref
    assert(Bench.loadQuietRef("/nonexistent/path.json").isEmpty) // missing file -> no ref
  }

  test("merge-ref stamps the scale factor; loadQuietRefSf reads it back (sf-mismatch disarm)") {
    // The consumer disarms the plausibility check when the ref was
    // recorded at another scale (r17: an sf1 tour burned 225 s of
    // storm parking on a tag that was the sf0.1 ref disagreeing with
    // sf1 data). merge-ref carries the sf from its inputs; a ref
    // without one (pre-r17) parses to None and changes nothing.
    val dir = java.nio.file.Files.createTempDirectory("graft_refsf")
    val in = dir.resolve("in.json")
    java.nio.file.Files.write(in,
      """{"metric":"total","value":1.0,"unit":"sec","queries":{"q1":0.500},"sf":"/root/testdata/sf0.1"}"""
        .getBytes("UTF-8"))
    val out = dir.resolve("out.json").toString
    Bench.mergeRef(out, Seq(in.toString))
    assert(Bench.loadQuietRefSf(out).contains("sf0.1"))
    assert(Bench.loadQuietRef(out) == Map("q1" -> 0.5))
    assert(Bench.loadQuietRefSf("/nonexistent/path.json").isEmpty)
    val noSf = dir.resolve("nosf.json")
    java.nio.file.Files.write(noSf,
      """{"metric":"total","value":1.0,"unit":"sec","queries":{"q1":0.500}}""".getBytes("UTF-8"))
    assert(Bench.loadQuietRefSf(noSf.toString).isEmpty)
  }
}
