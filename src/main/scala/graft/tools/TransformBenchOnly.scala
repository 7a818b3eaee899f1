package graft.tools

/** Runs ONLY [[graft.Bench]]'s transform/detransform JMH-style matrix (no
  * Spark session, no query passes) — the fast iteration loop for kernel
  * work on the T2/T3 hot path (r8: the 1 GiB × 100 KiB GC profile).
  * Prints the same label→MB/s maps Bench embeds in BENCH_DETAIL.json. */
object TransformBenchOnly {
  def main(args: Array[String]): Unit = {
    val (t, d) = graft.Bench.transformMatrix()
    def fmt(m: Seq[(String, Double)]) = m.map { case (k, v) =>
      s""""$k":${String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))}"""
    }.mkString("{", ",", "}")
    println(s"""{"transform_mbps":${fmt(t)},"detransform_mbps":${fmt(d)}}""")
  }
}
