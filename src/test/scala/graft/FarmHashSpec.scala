package graft

import com.google.common.hash.Hashing
import graft.functions.FarmHash
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8
import scala.util.Random

/**
 * Golden tests: our FarmHash Fingerprint64 must be bit-identical to Guava's
 * `farmHashFingerprint64` (itself verified against the C++ reference), which
 * is what BigQuery's FARM_FINGERPRINT computes. Split parity depends on this
 * (SURVEY §7.4.1).
 */
class FarmHashSpec extends AnyFunSuite {

  private def guava(b: Array[Byte]): Long =
    Hashing.farmHashFingerprint64().hashBytes(b).asLong()

  test("empty input") {
    assert(FarmHash.fingerprint64(Array.emptyByteArray) == guava(Array.emptyByteArray))
  }

  test("fixed vectors across every length-class branch (0-16, 17-32, 33-64, >64)") {
    val cases = Seq(
      "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
      "hello world", "0123456789abcdef",            // 16
      "0123456789abcdefg",                          // 17
      "0123456789abcdef0123456789abcdef",           // 32
      "0123456789abcdef0123456789abcdefX",          // 33
      "x" * 64, "x" * 65, "y" * 127, "z" * 128, "w" * 129,
      "q" * 1000, "CLIENT_ID_12345", "user-åäö-unicode-😀",
      (0 until 300).map(i => (i % 251).toChar).mkString)
    cases.foreach { s =>
      val b = s.getBytes(UTF_8)
      assert(FarmHash.fingerprint64(b) == guava(b), s"mismatch for len=${b.length}")
    }
  }

  test("property: random byte arrays match guava at all lengths 0..512") {
    val rnd = new Random(42)
    // cover every length once, plus 500 random extras
    val lengths = (0 to 512) ++ Seq.fill(500)(rnd.nextInt(4096))
    lengths.foreach { n =>
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      assert(FarmHash.fingerprint64(b) == guava(b), s"mismatch at len=$n")
    }
  }

  test("string overload hashes UTF-8 bytes") {
    val s = "straße-日本語"
    assert(FarmHash.fingerprint64(s) == guava(s.getBytes(UTF_8)))
  }
}
