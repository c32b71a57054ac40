package graft

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.TextKernels

/** Property tests for the codegen'd text kernels against independent naive
  * references (fresh md5 per call, Scala collections — none of the kernel
  * code paths). Pure JVM: the kernels' static entry points take ArrayData
  * directly, so hundreds of generated cases run without a Spark session.
  * Token alphabet includes multi-byte UTF-8 to pin byte-level hashing.
  */
object KernelProperties extends Properties("TextKernels") {

  private val tokenGen: Gen[String] =
    Gen.oneOf("a", "b", "c", "aa", "ab", "the", "x1", "é漢", "ß")
  private val toksGen: Gen[List[String]] = Gen.listOf(tokenGen)

  private def arr(toks: Seq[String]): ArrayData =
    new GenericArrayData(toks.map(t => UTF8String.fromString(t)).toArray[Any])

  private def md5(s: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
  private def h32(s: String): Long = {
    val d = md5(s)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
  private def h60(s: String): Long = {
    val d = md5(s)
    var v = 0L
    (0 until 8).foreach(i => v = (v << 8) | (d(i) & 0xffL))
    v >>> 4
  }

  property("shingles == naive first-occurrence-distinct n-grams") =
    forAll(toksGen, Gen.choose(1, 4)) { (toks, n) =>
      val got = TextKernels.shingles(arr(toks), n)
      val gotSeq = (0 until got.numElements()).map(i => got.getUTF8String(i).toString)
      val naive =
        if (toks.length < n) Seq.empty[String]
        else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
      gotSeq == naive
    }

  property("minhash == per-seed minimum of affine-permuted gram hashes") =
    forAll(Gen.nonEmptyListOf(tokenGen)) { grams =>
      val got = TextKernels.minhashSignature(arr(grams))
      val sig = (0 until got.numElements()).map(got.getLong)
      val naive = TextKernels.MinhashSeeds.map { case (a, b) =>
        grams.map(g => (h32(g) * a + b) % TextKernels.MinhashP).min
      }
      sig == naive
    }

  property("simhash == per-bit sign of summed votes") =
    forAll(toksGen) { toks =>
      val distinct = toks.distinct
      val naive = (0 until 60).map { bit =>
        val votes = distinct.map(t => if (((h60(t) >> bit) & 1L) == 1L) 1 else -1).sum
        if (votes > 0) 1L << bit else 0L
      }.sum
      TextKernels.simhash60(arr(distinct)) == naive
    }

  property("winnow == distinct sorted sliding-window minima of ordered gram hashes") =
    forAll(toksGen, Gen.choose(1, 4), Gen.choose(1, 5)) { (toks, n, w) =>
      val got = TextKernels.winnow(arr(toks), n, w)
      val gotSeq = (0 until got.numElements()).map(got.getLong)
      val hs =
        if (toks.length < n) Seq.empty[Long]
        else toks.sliding(n).map(g => h32(g.mkString(" "))).toSeq
      val naive =
        if (hs.length < w) Seq.empty[Long]
        else hs.sliding(w).map(_.min).toSeq.distinct.sorted
      gotSeq == naive
    }

  property("repetitionStats == naive grouped n-gram multiset counts") =
    forAll(toksGen, Gen.choose(1, 4)) { (toks, n) =>
      val got = TextKernels.repetitionStats(toks = arr(toks), n = n)
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val grams =
        if (toks.length < n) Seq.empty[String]
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      got.getLong(0) == grams.size.toLong &&
        got.getLong(1) == counts.size.toLong &&
        got.getLong(2) == (if (counts.isEmpty) 0L else counts.values.max)
    }

  property("hash32/hash60 match the md5 hex-prefix parses") =
    forAll(tokenGen) { t =>
      val hex = md5(t).map(b => f"${b & 0xff}%02x").mkString
      TextKernels.hash32(UTF8String.fromString(t)) == java.lang.Long.parseLong(hex.take(8), 16) &&
      TextKernels.hash60(UTF8String.fromString(t)) == java.lang.Long.parseLong(hex.take(15), 16)
    }

  private val nfcCaseGen: Gen[String] = Gen.oneOf(
    "plain ascii", "cafe\u0301", "A\u030A", "\u00e9 already composed",
    "mix cafe\u0301 and A\u030A", "", "\u6f22\u5b57 e\u0301")

  property("nfc composes canonically: known forms, idempotence, composed-input identity") =
    forAll(nfcCaseGen) { s =>
      val got = TextKernels.nfc(UTF8String.fromString(s)).toString
      val again = TextKernels.nfc(UTF8String.fromString(got)).toString
      // idempotent, and decomposed pairs compose to the precomposed char
      got == again &&
        TextKernels.nfc(UTF8String.fromString("cafe\u0301")).toString == "caf\u00e9" &&
        TextKernels.nfc(UTF8String.fromString("A\u030A")).toString == "\u00c5" &&
        TextKernels.nfc(UTF8String.fromString("plain")).toString == "plain"
    }
}
