package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the scale-critical physical-plan
  * properties the round-1 review flagged, pinned so they cannot
  * silently regress. These assert on the executed plan of the real
  * registered queries over sf0.001.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("o4_paginate plans as TakeOrdered with offset, not a global window") {
    val p = plan("o4_paginate")
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
    assert(p.contains("offset=100"), p.take(500))
    assert(!p.contains("Window"), "no partition-less window over the fact")
  }

  test("a7_a8_argmax uses constant-state max_by, not collect_list") {
    val p = plan("a7_a8_argmax")
    assert(p.contains("max_by"))
    assert(!p.contains("collect_list"))
  }

  test("near-dup and ANN candidate generation never cross-joins the corpus") {
    // ann_cosine_topk intentionally broadcast-cross-joins the tiny QUERY
    // side; the corpus-sized self-joins must all be equi-joins.
    for (q <- Seq("dedup_minhash", "dedup_simhash", "ann_lsh_bucket")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
  }

  test("ann_lsh_bucket candidate join carries no embedding vectors") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val df = SparkEntry.queries("ann_lsh_bucket")(spark, dir)
    val candJoins = df.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.exists(_.references.exists(_.name == "key")) => j
    }
    assert(candJoins.nonEmpty, "expected a (band, key) candidate join")
    candJoins.foreach { j =>
      val cols = (j.left.output ++ j.right.output).map(_.name)
      assert(!cols.exists(n => n.contains("vec") || n.contains("embedding")),
        s"vectors ride the candidate shuffle: $cols")
    }
  }

  test("s6 year-partitioned layout prunes partitions on re-read") {
    val p = plan("s6_c13_sink_roundtrip") // building the df runs the write
    val scan = p.linesIterator.find(_.contains("PartitionFilters"))
    assert(scan.isDefined, "re-read scan exposes no PartitionFilters")
    assert(scan.get.contains("ano"), s"year filter did not reach the partition layer: $scan")
  }

  test("capped-history and corpus-prep windows are partitioned (no global window)") {
    import org.apache.spark.sql.catalyst.plans.logical
    for (q <- Seq("a9_capped_history", "pipeline_corpus_prep")) {
      val df = SparkEntry.queries(q)(spark, dir)
      val wins = df.queryExecution.optimizedPlan.collect { case w: logical.Window => w }
      assert(wins.nonEmpty, s"$q expected window nodes")
      wins.foreach(w =>
        assert(w.partitionSpec.nonEmpty, s"$q has a partition-less window: $w"))
    }
  }

  test("fact-view scans prune columns and push predicates") {
    val p = plan("f4_date_between")
    assert(p.contains("PushedFilters: [IsNotNull"), "pushdown reaches the scans")
    // lineitem scan must not read all 16 columns for this 5-column query
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(readSchemas.nonEmpty)
    assert(readSchemas.forall(_.split(",").length <= 8),
      s"a scan reads too many columns: $readSchemas")
  }

  test("category-dim join broadcasts the dim side (J2)") {
    val p = plan("j2_left_join_dim")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("cosineFast (codegen Expression) matches the HOF cosine bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    val vecs = Seq(
      (Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
      (Seq(0f, 0f, 0f), Seq(1f, 1f, 1f)),           // zero vector -> 0.0
      (Seq(-1.5f, 2.25f, 0.125f), Seq(3.5f, -0.75f, 9f)),
      (Seq(1e-30f, 1e30f, 1f), Seq(1e30f, 1e-30f, 1f))).toDF("a", "b")
    val rows = vecs.select(
      VectorFunctions.cosine(col("a"), col("b")).as("hof"),
      VectorFunctions.cosineFast(col("a"), col("b")).as("gen"))
      .as[(Double, Double)].collect()
    rows.foreach { case (hof, gen) => assert(hof == gen, s"$hof != $gen") }

    // mismatched lengths: both paths yield null
    val mism = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f))).toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b")).as("hof"),
        VectorFunctions.cosineFast(col("a"), col("b")).as("gen"))
      .as[(Option[Double], Option[Double])].head()
    assert(mism == ((None, None)))
  }

  test("graft_cosine is callable from SQL after registration") {
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._
    Seq((Seq(1f, 0f), Seq(1f, 0f))).toDF("a", "b").createOrReplaceTempView("v_cos")
    val r = spark.sql("SELECT graft_cosine(a, b) AS c FROM v_cos").as[Double].head()
    assert(r == 1.0)
  }

  test("joinAbc carries no forced broadcast hint; joinCategorias does (by design)") {
    import spark.implicits._
    val fact = Seq(("c1", "p1", 1.0)).toDF("cliente", "codigo_produto", "v")
    val abc = Seq(("c1", "A")).toDF("cliente", "abc")
    val dim = Seq(("p1", "n", "g", "s")).toDF("codigo_produto", "negocio", "grupo", "subgrupo")
    // client-cardinality side: AQE decides (no hint in the logical plan)
    assert(!operators.Enrich.joinAbc(fact, abc)
      .queryExecution.logical.toString.toLowerCase.contains("hint"))
    // dimension side: explicit broadcast is intended
    assert(operators.Enrich.joinCategorias(fact, dim)
      .queryExecution.logical.toString.toLowerCase.contains("hint"))
  }
}
