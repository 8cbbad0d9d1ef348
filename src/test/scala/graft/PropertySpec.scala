package graft

import graft.functions.{CanonicalJson, HexUtil, PqUtil}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based coverage for the scalar kernel pack (the SURVEY §5 test
  * plan's ScalaCheck leg): round-trips, algebraic identities, and parity
  * with JDK reference implementations over generated inputs — the cases a
  * fixture suite can't enumerate. */
class PropertySpec extends AnyFunSuite {

  private def check(label: String, p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, s"$label: ${r.status}")
  }

  private def utf8(s: String) = UTF8String.fromString(s)

  test("SafeLong: hex and decimal renderings of any non-negative long round-trip") {
    check("hex round-trip", Prop.forAll(Gen.chooseNum(0L, Long.MaxValue)) { n =>
      HexUtil.safeLong(utf8("0x" + java.lang.Long.toHexString(n)), -1L) == n &&
      HexUtil.safeLong(utf8(n.toString), -1L) == n
    })
    // UInt64 overflow clamps to Long.MaxValue (FAR_FUTURE sentinel policy)
    check("overflow clamp", Prop.forAll(Gen.chooseNum(0L, Long.MaxValue)) { n =>
      val big = java.math.BigInteger.valueOf(Long.MaxValue)
        .add(java.math.BigInteger.valueOf(n max 1L))
      HexUtil.safeLong(utf8(big.toString), -1L) == Long.MaxValue
    })
  }

  test("HexPopcount: parity with java.lang.Long.bitCount on any long") {
    check("popcount", Prop.forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue)) { n =>
      HexUtil.popcountHex(utf8("0x" + java.lang.Long.toHexString(n))) ==
        java.lang.Long.bitCount(n)
    })
  }

  test("HexByteLength: len//2 of any hex rendering") {
    check("byte length", Prop.forAll(Gen.chooseNum(0L, Long.MaxValue)) { n =>
      val h = java.lang.Long.toHexString(n)
      HexUtil.hexByteLen(utf8(h)) == h.length / 2
    })
  }

  test("morton2: deinterleave inverts, key is non-negative, grows per coordinate") {
    val coord = Gen.chooseNum(0L, 0x7FFFFFFFL)
    def deinterleave(z: Long): (Long, Long) = {
      def unspread(x0: Long): Long = {
        var x = x0 & 0x5555555555555555L
        x = (x | (x >> 1)) & 0x3333333333333333L
        x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
        x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
        x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
        x = (x | (x >> 16)) & 0x00000000FFFFFFFFL
        x
      }
      (unspread(z), unspread(z >> 1))
    }
    check("invertible", Prop.forAll(coord, coord) { (a, b) =>
      val z = HexUtil.morton2(a, b)
      z >= 0 && deinterleave(z) == ((a, b))
    })
    check("monotone", Prop.forAll(coord, coord) { (a, b) =>
      (a == 0x7FFFFFFFL || HexUtil.morton2(a + 1, b) > HexUtil.morton2(a, b)) &&
      (b == 0x7FFFFFFFL || HexUtil.morton2(a, b + 1) > HexUtil.morton2(a, b))
    })
  }

  test("matVec: identity fixes vectors; rotation preserves norms to fp tolerance") {
    val dim = 16
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-10.0f, 10.0f)).map(_.toArray)
    val id = Array.tabulate(dim * dim)(i => if (i / dim == i % dim) 1.0f else 0.0f)
    check("identity", Prop.forAll(vecGen) { v =>
      PqUtil.matVecFloats(v, id).sameElements(v)
    })
    val rot = graft.operators.Similarity.randomRotation(dim, seed = 11L)
    def norm(v: Array[Float]) = math.sqrt(v.map(x => x.toDouble * x).sum)
    check("isometry", Prop.forAll(vecGen) { v =>
      math.abs(norm(PqUtil.matVecFloats(v, rot)) - norm(v)) < 1e-2
    })
  }

  test("CanonicalJsonHash16: invariant under key order, 16 lowercase hex chars") {
    val keyGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(8))
    val entryGen = Gen.zip(keyGen, Gen.chooseNum(-1000000L, 1000000L))
    val objGen = Gen.nonEmptyListOf(entryGen).map(_.toMap.toList)
    check("order invariance", Prop.forAll(objGen) { entries =>
      def render(es: List[(String, Long)]) =
        es.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
      val h1 = CanonicalJson.payloadHash16(render(entries))
      val h2 = CanonicalJson.payloadHash16(render(entries.reverse))
      h1 == h2 && h1.length == 16 && h1.forall(c => c.isDigit || ('a' to 'f').contains(c))
    })
  }
}
