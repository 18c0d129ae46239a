package graft

import org.scalatest.funsuite.AnyFunSuite

/** Measurement-ledger gate: every artifact filename BASELINE.md names
  * must resolve to a file in the tree. Two consecutive rounds (r19,
  * r20) closed with BASELINE.md claiming sf10 artifacts that were
  * never committed; `tools/check_ledger.py` was written to catch
  * exactly that but nothing ran it at round close. Running the same
  * scan inside `sbt test` makes a green suite impossible while the
  * ledger lies — the enforcement hook the tool was missing.
  *
  * Mirrors tools/check_ledger.py: artifact-looking tokens are
  * underscored-stem `.json` names (bare names also probed under
  * bench_reports/); `*` tokens resolve by glob; `target/` paths are
  * transient write-path documentation, never required at rest.
  */
class LedgerSpec extends AnyFunSuite {

  test("every artifact BASELINE.md names exists in the tree") {
    val root = java.nio.file.Paths.get(".").toAbsolutePath
    val text = java.nio.file.Files.readString(root.resolve("BASELINE.md"))
    val token = """[A-Za-z0-9_*./-]*[A-Za-z0-9_]+_[A-Za-z0-9_]+\.json""".r
    val names = token.findAllIn(text).toSet
    val missing = names.toSeq.sorted.filterNot { name =>
      val rel = name.dropWhile(c => c == '.' || c == '/')
      if (rel.startsWith("target/")) true
      else {
        val dirs =
          if (rel.contains('/')) Seq(root)
          else Seq(root, root.resolve("bench_reports"))
        if (rel.contains('*')) {
          val matcher = java.nio.file.FileSystems.getDefault
            .getPathMatcher("glob:" + rel)
          dirs.exists { d =>
            val stream = java.nio.file.Files.list(d)
            try stream.anyMatch(p => matcher.matches(d.relativize(p)))
            finally stream.close()
          }
        } else dirs.exists(d => java.nio.file.Files.isRegularFile(d.resolve(rel)))
      }
    }
    assert(missing.isEmpty,
      s"BASELINE.md names artifacts missing from the tree: $missing " +
        "(commit the artifact or correct the claim)")
  }
}
