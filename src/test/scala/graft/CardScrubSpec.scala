package graft

import graft.operators.Scrub
import org.apache.spark.sql.functions._

/** Luhn card scrub: the replacement/no-replacement boundary IS the
  * operator (a regex-only redactor can't tell a card from an order id),
  * so every class gets a pinned case. */
class CardScrubSpec extends SparkSpec {

  private def run(t: String): (String, Int, Int, String) = {
    val s = spark
    import s.implicits._
    val r = Seq(t).toDF("t")
      .select(Scrub.cardScrub(col("t")).as("c"))
      .select(col("c.scrubbed"), col("c.n_candidates"),
        col("c.n_valid"), col("c.valid_cards")).head()
    (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3))
  }

  test("valid cards redact across separator formats; invalid, " +
      "too-short and too-long runs survive") {
    // 4111111111111111 is the classic Luhn-valid test number
    assert(run("pay 4111 1111 1111 1111 now") ==
      ("pay <CC> now", 1, 1, "4111 1111 1111 1111"))
    assert(run("pay 4111-1111-1111-1111 now")._1 == "pay <CC> now")
    assert(run("pay 4111111111111111 now")._1 == "pay <CC> now")
    // last digit perturbed: candidate but NOT valid — text untouched
    assert(run("pay 4111 1111 1111 1112 now") ==
      ("pay 4111 1111 1111 1112 now", 1, 0, ""))
    // 12 digits: not a candidate at all
    assert(run("order 123456789012 now") ==
      ("order 123456789012 now", 0, 0, ""))
    // 20 digits: past the card-length ceiling
    assert(run("blob 12345678901234567890 end")._2 == 0)
    // 14-digit Diners test number, valid
    assert(run("d 30569309025904 e") == ("d <CC> e", 1, 1,
      "30569309025904"))
  }

  test("multiple cards keep appearance order; double separators break " +
      "a run; multi-byte text round-trips") {
    val (s2, c2, v2, list) =
      run("a 4111111111111111 b 30569309025904 c")
    assert((s2, c2, v2) == ("a <CC> b <CC> c", 2, 2))
    assert(list == "4111111111111111|30569309025904")
    // "--" between digits is not a single separator: two short runs
    assert(run("x 41111111--11111111 y")._2 == 0)
    // é/中 bytes copy verbatim around a redaction
    assert(run("é 中 4111111111111111 字") == ("é 中 <CC> 字", 1, 1,
      "4111111111111111"))
    // trailing separator stays outside the run
    assert(run("p 30569309025904- q")._1 == "p <CC>- q")
  }
}
