package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SIF pooling: frequency downweighting (stopwords matter less than rare
  * terms), bounded components, hand-checked single-token doc, dimension
  * contract, and partition invariance of the decimal-pooled result.
  */
class SifEmbedSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the cat sat"),
    (2L, "the dog ran"),
    (3L, "the the the quantum"),
    (4L, "quantum")
  ).toDF("doc_id", "text")

  private def run(df: org.apache.spark.sql.DataFrame) =
    SifEmbed.sifEmbeddings(df, "doc_id", "text")
      .orderBy("doc_id", "dim").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))

  test("shape: dim rows per doc, components bounded, token counts right") {
    val out = run(corpus)
    assert(out.length == 4 * 8)
    assert(out.forall { case (_, _, c, _) => c >= -1.0 && c <= 1.0 })
    assert(out.filter(_._1 == 1L).forall(_._4 == 3L))
    assert(out.filter(_._1 == 4L).forall(_._4 == 1L))
  }

  test("single-token doc equals that token's weighted vector") {
    // doc 4 is exactly "quantum": component = w(quantum) * v_d(quantum)
    val out = run(corpus).filter(_._1 == 4L)
    val h = graft.functions.TextHashing.hash64("quantum")
    // quantum appears 2x in an 11-token corpus
    val w = BigDecimal(0.001 / (0.001 + 2.0 / 11.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (d <- 0 until 8) {
      val v = (((h >>> (8 * d)) & 255L).toDouble - 127.5) / 127.5
      val expect = BigDecimal(w * v)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      assert(math.abs(out(d)._3 - expect.toDouble) < 5e-7,
        s"dim $d: ${out(d)._3} vs $expect")
    }
  }

  test("SIF weighting: sharing the rare term beats sharing the stopword") {
    // doc 3 shares 'quantum' with doc 4; doc 1 shares only 'the' with
    // doc 3. Downweighting must make the quantum doc the nearer neighbor.
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val out = run(corpus)
    def vec(id: Long) = out.filter(_._1 == id).sortBy(_._2).map(_._3)
    assert(cos(vec(3L), vec(4L)) > cos(vec(3L), vec(1L)),
      "the stopword-shared doc out-scored the rare-term-shared doc")
  }

  test("partition invariance: bit-identical components") {
    val a = run(corpus).toSeq
    assert(run(corpus.repartition(7, col("text"))).toSeq == a)
  }

  test("refuses out-of-range dim and non-positive smoothing") {
    intercept[IllegalArgumentException] {
      SifEmbed.sifEmbeddings(corpus, "doc_id", "text", dim = 9)
    }
    intercept[IllegalArgumentException] {
      SifEmbed.sifEmbeddings(corpus, "doc_id", "text", a = 0.0)
    }
  }
}
