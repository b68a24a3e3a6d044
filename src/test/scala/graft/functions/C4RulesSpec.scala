package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class C4RulesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def one(text: String): (Seq[String], String, Boolean) = {
    import spark.implicits._
    val r = Seq(Tuple1(text)).toDF("text")
      .select(
        C4Rules.keptLines(col("text")).as("k"),
        C4Rules.cleanedText(col("text")).as("c"),
        C4Rules.keepPage(col("text")).as("p"))
      .collect().head
    (r.getAs[scala.collection.Seq[String]]("k").toSeq, r.getAs[String]("c"),
      r.getAs[Boolean]("p"))
  }

  test("line rules: terminal punctuation, min words, javascript ban") {
    val text = Seq(
      "This line survives fine.", // kept
      "No terminal punctuation here", // dropped: no . ! ? \"
      "Too short.", // dropped: < 3 words
      "Enable javascript to continue.", // dropped: javascript
      "  Trimmed line also survives!  ", // kept (trimmed)
      "Quoted line stays here\"").mkString("\n") // kept: closing quote
    val (kept, cleaned, _) = one(text)
    assert(kept == Seq("This line survives fine.", "Trimmed line also survives!",
      "Quoted line stays here\""))
    assert(cleaned == kept.mkString("\n"))
  }

  test("page rules: five surviving lines, lorem ipsum and brace bans") {
    val five = (1 to 5).map(i => s"Good sentence number $i.").mkString("\n")
    assert(one(five)._3)
    val four = (1 to 4).map(i => s"Good sentence number $i.").mkString("\n")
    assert(!one(four)._3)
    assert(!one(five + "\nSome Lorem Ipsum filler text.")._3)
    assert(!one(five + "\nfunction f() { return 1; }")._3)
  }

  test("degenerate inputs: empty text, no survivors") {
    val (kept, cleaned, page) = one("")
    assert(kept.isEmpty && cleaned == "" && !page)
    val (k2, c2, p2) = one("word salad with no punctuation at all")
    assert(k2.isEmpty && c2 == "" && !p2)
  }
}
