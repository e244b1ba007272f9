package graft

/** Scratch diagnostic companion to [[PlanDump]]: normalize two dump
  * directories through the REAL [[PlanFingerprint]] (not a replica
  * script — the r17 verification replicated the normalizer in python,
  * which could itself drift) and print the query names whose
  * fingerprints differ. A no-change two-JVM pair must print 0. */
object PlanDiff {
  private val Usage =
    "usage: PlanDiff <dumpDirA> <dumpDirB> | PlanDiff --write " +
      "<dumpDir> <fpFile> | PlanDiff --norm <dumpFile>"

  /** Fingerprints of every <query>.txt in a dump dir, sorted by name. */
  private def fps(path: String): Seq[(String, String)] = {
    val files = new java.io.File(path).listFiles()
    require(files != null, s"not a readable directory: $path\n$Usage")
    files.filter(_.getName.endsWith(".txt")).map { f =>
      f.getName.stripSuffix(".txt") -> PlanFingerprint.md5hex(
        PlanFingerprint.normalize(new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")))
    }.sortBy(_._1).toSeq
  }

  def main(args: Array[String]): Unit = {
    // --write: seed tools/bench_fingerprints.json from a WARMED dump
    // (PLANDUMP_WARM replays Bench's exact pre-fingerprint state, so
    // the hashes are the ones Bench would record) — a normalizer
    // change then needs one changed-mode construction pass to confirm
    // "0 of N changed" instead of a full re-bench of every query.
    // --norm: print one dump file's NORMALIZED text (what the hash
    // actually sees) — `PlanDiff --norm a.txt > a.norm` twice + diff
    // localizes a flip to its exact normalized token.
    if (args.headOption.contains("--norm")) {
      require(args.length >= 2, Usage)
      println(PlanFingerprint.normalize(new String(
        java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(args(1))), "UTF-8")))
      return
    }
    if (args.headOption.contains("--write")) {
      require(args.length >= 3, Usage)
      val out = fps(args(1))
      val w = new java.io.PrintWriter(args(2))
      try w.println(out.map { case (k, v) => s""""$k": "$v"""" }
        .mkString("{\n", ",\n", "\n}"))
      finally w.close()
      println(s"wrote ${out.length} fingerprints to ${args(2)}")
      return
    }
    require(args.length >= 2, Usage)
    val (fa, fb) = (fps(args(0)).toMap, fps(args(1)).toMap)
    val names = (fa.keySet ++ fb.keySet).toSeq.sorted
    val diff = names.filter(n => fa.get(n) != fb.get(n))
    diff.foreach(n => println(s"DIFF $n"))
    println(s"${diff.size} of ${names.size} differ")
  }
}
