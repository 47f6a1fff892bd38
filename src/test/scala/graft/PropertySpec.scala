package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Abc

/** Property-based invariants for the ABC classifier (SURVEY §5.3),
  * run with plain ScalaCheck under ScalaTest.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val factGen: Gen[List[(String, Double)]] =
    Gen.nonEmptyListOf(for {
      c <- Gen.choose(1, 12).map(i => s"c$i")
      v <- Gen.oneOf(Gen.choose(0.0, 10000.0), Gen.const(0.0))
    } yield (c, v))

  private def run(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("ABC invariants hold for arbitrary fact lines") {
    run(Prop.forAll(factGen) { rows =>
      val fact = rows.toDF("cliente", "valor_orcado")
        .selectExpr("cliente", "cliente AS nome_cliente",
          "'X' AS uf", "'Y' AS cidade", "valor_orcado")
      val out = Abc.classify(fact)
        .select("cliente", "valor_total_orcado", "percentual",
          "percentual_acumulado", "abc", "ranking")
        .as[(String, Double, Double, Double, String, Int)].collect().toSeq

      val inClients = rows.map(_._1).toSet
      val total = rows.map(_._2).sum
      val eps = 1e-6

      val oneRowPerClient = out.map(_._1).toSet == inClients &&
        out.size == inClients.size
      val validClasses = out.forall(r => Set("A", "B", "C").contains(r._5))
      val pctSums = total == 0.0 || math.abs(out.map(_._3).sum - 100.0) < eps
      // cumulative percent is monotone in the window's own order
      val ordered = out.sortBy(r => (-r._2, r._1))
      val cumMonotone = ordered.zip(ordered.drop(1)).forall {
        case (a, b) => a._4 <= b._4 + eps
      }
      val boundaries = total == 0.0 || out.forall { r =>
        r._5 == (if (r._4 <= 80.0) "A" else if (r._4 <= 95.0) "B" else "C")
      }
      val zeroAllC = total != 0.0 || out.forall(_._5 == "C")
      // min-method rank: 1 + number of clients with strictly larger value
      val rankOk = out.forall { r =>
        r._6 == 1 + out.count(o => o._2 > r._2)
      }
      oneRowPerClient && validClasses && pctSums && cumMonotone &&
        boundaries && zeroAllC && rankOk
    })
  }

  test("union tagging preserves per-file filtered counts (AP:46-49)") {
    run(Prop.forAll(Gen.listOfN(3, Gen.listOf(Gen.oneOf("PENDENTE", "GANHO", "PERDIDO")))) {
      weeks =>
        val tagged = weeks.zipWithIndex.map { case (statuses, i) =>
          s"Semana $i" -> statuses.toDF("status_processo")
            .filter(org.apache.spark.sql.functions.col("status_processo") === "PENDENTE")
        }
        val expected = weeks.map(_.count(_ == "PENDENTE")).sum
        if (tagged.isEmpty) expected == 0
        else operators.Pendentes.unionSemanas(tagged).count() == expected
    })
  }
}
