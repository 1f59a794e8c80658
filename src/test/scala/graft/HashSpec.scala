package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MinHashUtil

/** Property-style tests for the MinHash arithmetic: the 128-bit-product
  * modular reduction must agree with BigInt reference math for every
  * (h, a, b) — this is what keeps Spark signatures exact-equal to the
  * DuckDB oracle's HUGEINT formulation. */
class HashSpec extends AnyFunSuite {
  private val P = MinHashUtil.MersennePrime
  private val rnd = new scala.util.Random(42)

  test("affineMod equals BigInt reference for random inputs") {
    for (_ <- 1 to 5000) {
      val h = rnd.nextLong() >>> 4 // < 2^60
      val i = rnd.nextInt(256)
      val (a, b) = MinHashUtil.permCoeff(i)
      val expected = ((BigInt(a) * BigInt(h) + BigInt(b)) mod BigInt(P)).toLong
      assert(MinHashUtil.affineMod(h, a, b) === expected, s"h=$h i=$i")
    }
  }

  test("affineMod handles boundary hashes") {
    for (i <- 0 until 32; h <- Seq(0L, 1L, (1L << 60) - 1, P - 1, P)) {
      val (a, b) = MinHashUtil.permCoeff(i)
      val expected = ((BigInt(a) * BigInt(h) + BigInt(b)) mod BigInt(P)).toLong
      assert(MinHashUtil.affineMod(h, a, b) === expected, s"i=$i h=$h")
    }
  }

  test("md5Long60 equals the hex-prefix construction") {
    for (_ <- 1 to 500) {
      val s = rnd.alphanumeric.take(rnd.nextInt(40)).mkString
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val expected = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      assert(MinHashUtil.md5Long60(s.getBytes("UTF-8")) === expected, s"s=$s")
    }
  }

  test("permCoeff is deterministic and in range") {
    for (i <- 0 until 64) {
      val (a, b) = MinHashUtil.permCoeff(i)
      assert(a >= 1 && a < P)
      assert(b >= 0 && b < P)
      assert(MinHashUtil.permCoeff(i) === ((a, b)))
    }
  }
}
