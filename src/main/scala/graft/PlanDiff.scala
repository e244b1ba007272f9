package graft

/** Scratch diagnostic companion to [[PlanDump]]: normalize two dump
  * directories through the REAL [[PlanFingerprint]] (not a replica
  * script — the r17 verification replicated the normalizer in python,
  * which could itself drift) and print the query names whose
  * fingerprints differ. A no-change two-JVM pair must print 0. */
object PlanDiff {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDiff <dumpDirA> <dumpDirB>")
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
