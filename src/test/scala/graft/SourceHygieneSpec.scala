package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Source-file hygiene: no `.scala` file under `src/` may contain a raw
 * NUL (0x00) byte. A literal NUL inside a char literal makes git treat
 * the file as binary — `git diff` stops rendering it — which has
 * happened twice (BqDialect.scala rounds 2 and 4). Sentinels must be
 * spelled with the unicode escape (backslash-u0000), never the raw byte.
 */
class SourceHygieneSpec extends AnyFunSuite {

  private def scalaFiles(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala") && Files.isRegularFile(p))
      .toSeq

  test("no src/**.scala file contains a raw NUL byte") {
    val root = Paths.get("src")
    assert(Files.isDirectory(root), s"expected to run from the repo root; cwd=${Paths.get("").toAbsolutePath}")
    val offenders = scalaFiles(root).filter(p => Files.readAllBytes(p).contains(0.toByte))
    assert(offenders.isEmpty, s"raw NUL byte (git-binary) in: ${offenders.mkString(", ")}")
  }
}
