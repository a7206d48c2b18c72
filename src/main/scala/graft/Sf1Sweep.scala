package graft

import org.apache.spark.sql.SparkSession

/** One-command repeatable sf1 sweep: Inflate (×10 over sf0.1, if the
  * inflated dir is missing) → full-board Bench against it → the
  * sf1/sf0.1 nonlinearity report (tools/sf1_ratio.py). Writes the
  * machine-readable snapshot to `bench_sf1.json` at the REPO ROOT (a
  * committed artifact — each round's sweep diffs against the previous
  * round's snapshot instead of re-deriving ratios from prose).
  *
  * The 64 g driver-heap requirement (SCALE.md "Full-board sf1 sweep":
  * the dedup family OOMs the default 8 g single-JVM heap at sf1 —
  * ordinary EXECUTOR memory on a real cluster, but local[n] puts it all
  * in one JVM) is ENCODED here, not just documented: the sweep refuses
  * to start under ~48 g of max heap rather than dying 700 s in.
  *
  * Usage: `SPARK_DRIVER_MEM=64g SPARK_GRAFT_CPUS=8 sbt "runMain
  * graft.Sf1Sweep"` — dev tooling like [[Inflate]]/[[ScaleCheck]], not
  * part of the shipped library.
  */
object Sf1Sweep {
  def main(args: Array[String]): Unit = {
    val maxHeapGb = Runtime.getRuntime.maxMemory / (1L << 30)
    require(maxHeapGb >= 48,
      s"sf1 sweep needs a 64 g driver heap (have ${maxHeapGb} g): the " +
        "dedup family's candidate state OOMs the default 8 g single-JVM " +
        "heap at sf1. Re-run with SPARK_DRIVER_MEM=64g.")
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sf1Dir = "target/sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")

    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(sf1Dir, "lineitem.parquet"))) {
      println(s"[sf1] inflating $srcDir -> $sf1Dir x10")
      Inflate.main(Array(srcDir, sf1Dir, "10"))
      // Inflate leaves a session behind; Bench.run builds its own
      SparkSession.getActiveSession.foreach(_.stop())
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    } else println(s"[sf1] reusing existing $sf1Dir")

    Bench.run(sf1Dir, cpus, "bench_sf1.json")

    // nonlinearity report vs the committed sf0.1 canonical — best-effort
    // (the analyzer is dev-side python; absence shouldn't fail the sweep)
    try {
      val p = new ProcessBuilder("python3", "tools/sf1_ratio.py",
        "bench_full.json", "bench_sf1.json").inheritIO().start()
      p.waitFor()
    } catch {
      case e: Throwable =>
        println(s"[sf1] ratio report skipped (${e.getMessage}); run: " +
          "python3 tools/sf1_ratio.py bench_full.json bench_sf1.json")
    }
  }
}
