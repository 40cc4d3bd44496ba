package graft

/** Standalone pure-compute host probe for JOB-level scaling runs
  * (`scripts/job_scale.sh`). Prints one parseable line:
  *
  * {{{ PROBE cores=<c> sec=<s> mops=<work-units-per-usec> page_sec=<p> }}}
  *
  * Two signals, both needed to trust a job-level window on this shared
  * host (see BASELINE.md "Environment pathologies"):
  *
  *  - `mops`: xxh64-style avalanche mixing over a per-thread range on
  *    exactly `cores` threads — the same register-resident work shape as
  *    `Bench`'s Spark-side xxhash64 control, minus the Spark session, so
  *    it costs ~3 s instead of a 20 s JVM+session bootstrap per width.
  *    The wide/narrow mops ratio is the box's own compute-scaling
  *    ceiling for the window: job efficiency is reported raw AND
  *    normalized by it.
  *  - `page_sec`: first-touch of a fresh 256 MB off-heap buffer — the
  *    lazy-paging-phase detector (healthy ~0.1-0.2 s, degraded 2-18 s).
  *    A pre-touched heap hides the pathology, hence off-heap and fresh.
  *
  * Kept OUT of Bench.scala on purpose: the bench protocol is frozen
  * (round-4 verdict item 7); this is a sidecar for the spark-submit
  * deployment-surface measurement only.
  */
object HostProbe {
  // xxh64 prime constants (public domain algorithm); the loop body is
  // the avalanche step — enough mixing that the JIT cannot collapse it.
  private val P1 = -7046029288634856825L // 0x9E3779B185EBCA87
  private val P2 = -4417276706812531889L // 0xC2B2AE3D27D4EB4F

  private def mix(seed: Long, n: Long): Long = {
    var acc = seed
    var i = 0L
    while (i < n) {
      acc ^= i * P1
      acc = java.lang.Long.rotateLeft(acc, 31) * P2
      i += 1
    }
    acc
  }

  @volatile private var sink = 0L // defeat dead-code elimination

  private def run(threads: Int, perThread: Long): Double = {
    val accs = new Array[Long](threads)
    val ts = (0 until threads).map { t =>
      new Thread(() => accs(t) = mix(t.toLong, perThread))
    }
    val t0 = System.nanoTime()
    ts.foreach(_.start()); ts.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    sink = accs.sum
    sec
  }

  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 2
    // per-core-scaled work, ~3 s/run healthy at any width (work/sec is
    // the width-comparable unit, exactly as in Bench.ctlWork)
    val perThread = 2000000000L
    // fresh-page probe FIRST: if the window is lazy-paging, the compute
    // loop below would otherwise absorb the first-touch cost of its own
    // thread stacks/buffers into the measurement
    val p0 = System.nanoTime()
    val buf = java.nio.ByteBuffer.allocateDirect(256 << 20)
    var i = 0
    while (i < buf.capacity()) { buf.put(i, 1.toByte); i += 4096 }
    val pageSec = (System.nanoTime() - p0) / 1e9
    run(cores, perThread / 8) // JIT warm-up outside the measured window
    val sec = run(cores, perThread)
    val mops = cores * perThread / sec / 1e6
    println(f"PROBE cores=$cores sec=$sec%.2f mops=$mops%.0f page_sec=$pageSec%.2f sink=$sink")
  }
}
