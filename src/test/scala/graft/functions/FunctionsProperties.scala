package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the round-5 kernels — pure JVM, no Spark session:
  * the CDC chunker's partition/boundary laws (including the non-ASCII
  * fallback path) and the KMV aggregate's buffer algebra against a
  * brute-force reference. */
object FunctionsProperties extends Properties("graft.functions") {

  // --- content-defined chunking ------------------------------------

  private val cdc = CdcChunksExpression(Literal("x"), Literal(8), Literal(16))
  private def chunksOf(s: String, w: Int, d: Int): Seq[String] = {
    val out = CdcChunksExpression(Literal("x"), Literal(w), Literal(d))
      .compute(UTF8String.fromString(s), w, d)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
    (0 until out.numElements()).map(i => out.get(i, null).toString)
  }
  private def u32(bytes: Array[Byte]): Long = {
    val h = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    ((h(0) & 0xFFL) << 24) | ((h(1) & 0xFFL) << 16) |
      ((h(2) & 0xFFL) << 8) | (h(3) & 0xFFL)
  }

  val asciiGen: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar, 2 -> Gen.const(' '))).map(_.mkString)
  val unicodeGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar, 1 -> Gen.oneOf('机', '器', 'ひ', 'ら', 'ไ', 'ท'),
    1 -> Gen.const(' '))).map(_.mkString)
  val wGen: Gen[Int] = Gen.chooseNum(1, 12)
  val dGen: Gen[Int] = Gen.oneOf(2, 4, 8, 16, 64)

  property("cdc chunks partition the input exactly") =
    forAll(unicodeGen, wGen, dGen) { (s, w, d) =>
      val c = chunksOf(s, w, d)
      c.mkString == s && (s.isEmpty || c.forall(_.nonEmpty))
    }

  property("cdc boundaries match the brute-force rule (ascii fast path)") =
    forAll(asciiGen, wGen, dGen) { (s, w, d) =>
      val expected =
        if (s.isEmpty) Seq.empty[String]
        else {
          val cuts = (w until s.length).filter(i =>
            u32(s.substring(i - w, i).getBytes("UTF-8")) % d == 0)
          (0 +: cuts :+ s.length).sliding(2)
            .map { case Seq(a, b) => s.substring(a, b) }.toSeq
        }
      chunksOf(s, w, d) == expected
    }

  property("cdc below-window text is one whole chunk") =
    forAll(asciiGen.suchThat(_.nonEmpty), dGen) { (s, d) =>
      chunksOf(s, s.length + 1, d) == Seq(s)
    }

  // --- KMV buffer algebra -------------------------------------------

  private def kmv(k: Int) = KmvMinsAggregate(Literal(1L), k)
  private def bufferOf(k: Int, vs: Seq[Long]): java.util.TreeSet[java.lang.Long] = {
    val agg = kmv(k)
    val b = agg.createAggregationBuffer()
    // exercise the same insert path update() uses, via merge of singletons
    vs.foreach { v =>
      val s = agg.createAggregationBuffer(); s.add(v); agg.merge(b, s)
    }
    b
  }

  val valsGen: Gen[List[Long]] = Gen.listOf(Gen.chooseNum(0L, 500L))
  val kGen: Gen[Int] = Gen.chooseNum(2, 64)

  property("KMV buffer holds exactly the k smallest distinct values") =
    forAll(valsGen, kGen) { (vs, k) =>
      val b = bufferOf(k, vs)
      val expected = vs.distinct.sorted.take(k)
      import scala.jdk.CollectionConverters._
      b.asScala.toList.map(_.longValue) == expected
    }

  property("KMV merge == buffer of the concatenation (any split)") =
    forAll(valsGen, valsGen, kGen) { (a, b, k) =>
      val agg = kmv(k)
      val merged = agg.merge(bufferOf(k, a), bufferOf(k, b))
      merged == bufferOf(k, a ++ b)
    }

  property("KMV serialize/deserialize round-trips") =
    forAll(valsGen, kGen) { (vs, k) =>
      val agg = kmv(k)
      val b = bufferOf(k, vs)
      agg.deserialize(agg.serialize(b)) == b
    }
}
