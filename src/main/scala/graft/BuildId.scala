package graft

import java.nio.file.{Files, Paths}

/** Resolves the repo's current git commit so Bench/Verify artifacts
  * self-identify: a stale `target/bench_latest.json` surviving a failed run
  * is detectable by its SHA instead of masquerading as the round's result. */
object BuildId {
  def gitSha(repoRoot: String = "."): String = try {
    val head = Files.readString(Paths.get(repoRoot, ".git", "HEAD")).trim
    if (head.startsWith("ref: ")) {
      val ref = head.stripPrefix("ref: ").trim
      val refPath = Paths.get(repoRoot, (".git" +: ref.split("/")): _*)
      if (Files.exists(refPath)) Files.readString(refPath).trim.take(12)
      else {
        val packed = Paths.get(repoRoot, ".git", "packed-refs")
        if (Files.exists(packed))
          Files.readAllLines(packed).toArray.map(_.toString)
            .find(l => !l.startsWith("#") && l.endsWith(ref))
            .map(_.split(" ")(0).take(12)).getOrElse("unknown")
        else "unknown"
      }
    } else head.take(12)
  } catch { case _: Exception => "unknown" }
}
