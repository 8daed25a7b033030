package graft.tools

/** One shared definition of the per-round artifact numbering: round N =
  * (highest `<prefix><NN>.json` in the cwd) + 1. `Bench` archives
  * `bench_out_r{N}` keyed off the driver's `BENCH_r*` files; `Verify`
  * archives `SKETCH_BOUNDS_r{N}` keyed off `CORRECTNESS_r*` — both
  * through this helper so the convention cannot drift between them.
  */
object Rounds {
  def next(prefix: String): Int = {
    val re = (java.util.regex.Pattern.quote(prefix) + "(\\d+)\\.json").r
    val ds = java.nio.file.Files.list(java.nio.file.Paths.get("."))
    try ds.toArray.map(_.toString.replaceFirst("^\\./", ""))
      .collect { case re(n) => n.toInt }
      .foldLeft(0)(math.max) + 1
    finally ds.close()
  }
}
