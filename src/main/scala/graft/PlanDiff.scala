package graft

/** Scratch diagnostic companion to [[PlanDump]]: normalize two dump
  * directories through the REAL [[PlanFingerprint]] (not a replica
  * script — the r17 verification replicated the normalizer in python,
  * which could itself drift) and print the query names whose
  * fingerprints differ. A no-change two-JVM pair must print 0. */
object PlanDiff {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: PlanDiff <dumpDirA> <dumpDirB> | PlanDiff --write " +
        "<dumpDir> <fpFile>")
    // --write: seed tools/bench_fingerprints.json from a WARMED dump
    // (PLANDUMP_WARM replays Bench's exact pre-fingerprint state, so
    // the hashes are the ones Bench would record) — a normalizer
    // change then needs one changed-mode construction pass to confirm
    // "0 of N changed" instead of a full re-bench of every query.
    if (args(0) == "--write") {
      val d = new java.io.File(args(1))
      val fps = d.listFiles().filter(_.getName.endsWith(".txt"))
        .map { f =>
          f.getName.stripSuffix(".txt") -> PlanFingerprint.md5hex(
            PlanFingerprint.normalize(new String(
              java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")))
        }.sortBy(_._1)
      val w = new java.io.PrintWriter(args(2))
      try w.println(fps.map { case (k, v) => s""""$k": "$v"""" }
        .mkString("{\n", ",\n", "\n}"))
      finally w.close()
      println(s"wrote ${fps.length} fingerprints to ${args(2)}")
      return
    }
    val (a, b) = (new java.io.File(args(0)), new java.io.File(args(1)))
    def fps(d: java.io.File): Map[String, String] =
      d.listFiles().filter(_.getName.endsWith(".txt")).map { f =>
        f.getName.stripSuffix(".txt") -> PlanFingerprint.md5hex(
          PlanFingerprint.normalize(new String(
            java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")))
      }.toMap
    val (fa, fb) = (fps(a), fps(b))
    val names = (fa.keySet ++ fb.keySet).toSeq.sorted
    val diff = names.filter(n => fa.get(n) != fb.get(n))
    diff.foreach(n => println(s"DIFF $n"))
    println(s"${diff.size} of ${names.size} differ")
  }
}
