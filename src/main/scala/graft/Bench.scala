package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.TranscriptGen
import graft.operators.Extract

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":S,"unit":"sec","queries":{...},"sf":dir,
  *  "scaling":{...}}.
  *
  * Part 1 — headline queries from SparkEntry at SPARK_GRAFT_SF_DIR, timed
  * individually. Results are forced with a noop-format write (a bare
  * count() would let Catalyst prune the computed columns away and
  * benchmark the scan, not the operator).
  *
  * Part 2 — the north-rule scaling evidence: the full extraction job
  * (parquet scan → sniff → route → extract → bucket-repartition →
  * sortWithinPartitions → noop) over the SAME materialized transcript
  * table at local[N] and local[4N] (N = SPARK_GRAFT_CPUS/8 → the 4/16
  * pair on this host), the sandbox stand-in for N- vs 4N-executor
  * clusters (per driver instruction). Inputs are sized so each measured
  * run is ≥ 30 s (SPARK_GRAFT_BENCH_TURNS_4N, default 6.4 M turns for
  * the primary pair; quarter size for the 1→N anchor pair) — at 600 k
  * turns the wide configs measured fixed job overhead, not the engine
  * (round-1 efficiency read 0.27 for that reason alone).
  *
  * Measurement design — this sandbox shares its 32 vCPUs with other
  * tenants (observed: identical runs ranging 5 s → 99 s, %steal spikes,
  * sys-time storms at full width), so a single timing is meaningless:
  *  - every measurement runs in a FRESH child JVM (no cross-session JIT/
  *    GC pollution — measured 9× distortion when sessions share a JVM);
  *  - N and 4N runs ALTERNATE across rounds so both configs sample the
  *    same interference windows; the minimum per config estimates true
  *    capacity;
  *  - each child also times a pure-compute CONTROL (xxhash64 over a
  *    range, zero allocation) — the box's own scaling ceiling. Raw
  *    efficiency is reported alongside control efficiency and the
  *    control-normalized ratio; on idle hardware raw ≈ normalized.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", (2 * cores).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** flagship job shape: extraction + stable-ordering bucketed layout */
  private def extractionJob(s: SparkSession, inDir: String): DataFrame =
    Extract(s.read.parquet(inDir))
      .repartition(64, col("conv_id"))
      .sortWithinPartitions("conv_id", "turn_idx")

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** child-JVM entry: measure extraction (min of 2) + control (min of 2)
    * at one core count; prints one parseable line. Shuffle scratch goes
    * to tmpfs when available: the sandbox's single shared /tmp disk is a
    * non-scaling resource that a multi-node cluster would not share, so
    * leaving shuffle on it measures the disk, not the engine.
    */
  private def scaleChild(cores: Int, inDir: String): Unit = {
    val scratch = new java.io.File(s"/dev/shm/graft-shuffle-$cores")
    val localDir =
      if (new java.io.File("/dev/shm").canWrite) { scratch.mkdirs(); scratch.getPath }
      else System.getProperty("java.io.tmpdir")
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-child-$cores")
      .config("spark.sql.shuffle.partitions", (2 * cores).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    try {
      force(Extract(s.read.parquet(inDir).limit(20000))) // JIT/codegen warm-up
      def ctl(): Double = time(
        s.range(1200000000L)
          .select(max(xxhash64(col("id"), col("id") + 1, col("id") + 2)))
          .collect())
      def ext(): Double = time(force(extractionJob(s, inDir)))
      ctl() // control warm-up
      // BRACKET the extract run with controls: the sample is only trusted
      // if the windows immediately around it were interference-free (the
      // host steals CPU in bursts longer than one run). One extract per
      // child — runs are sized ≥30 s now (round-1 lesson: at 600 k turns
      // the wide configs measured fixed overhead, not the engine), so a
      // second in-child repetition would double an already-long child;
      // cross-round minimums supply the repetition instead.
      val c0 = ctl(); val e1 = ext(); val c1 = ctl()
      val extractSec = e1
      val bracket = math.max(c0, c1)
      val ctlMin = math.min(c0, c1)
      println(f"CHILD $cores $extractSec%.3f $ctlMin%.3f $bracket%.3f")
    } finally {
      s.stop()
      if (scratch.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(scratch)
      }
    }
  }

  /** spawn a fresh JVM running scaleChild (same classpath + add-opens);
    * failures are reported, not thrown — one bad child must not cost the
    * whole benchmark line.
    */
  private def runChild(cores: Int, inDir: String): Option[(Double, Double, Double)] = {
    import scala.sys.process._
    val childMem = sys.env.getOrElse("SPARK_GRAFT_CHILD_MEM", "8g")
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports") ||
        a.startsWith("-D")) ++ Seq(
      // pre-fault the whole heap at child start: the sandbox VM has
      // phases where first-touch of fresh pages is ~100× slow (lazy
      // paging); pre-touch pays it once, OUTSIDE the measured windows
      s"-Xmx$childMem", s"-Xms$childMem", "-XX:+AlwaysPreTouch")
    val cmd = Seq(
      System.getProperty("java.home") + "/bin/java") ++ jvmArgs ++ Seq(
      "-cp", System.getProperty("java.class.path"),
      "graft.Bench", "--scale-child", cores.toString, inDir)
    try {
      val out = new StringBuilder
      val code = Process(cmd).!(ProcessLogger(l => out.append(l).append('\n'), _ => ()))
      for {
        _ <- Some(()) if code == 0
        line <- out.toString.linesIterator.find(_.startsWith("CHILD "))
        parts = line.split(' ')
      } yield (parts(2).toDouble, parts(3).toDouble, parts(4).toDouble)
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] child local[$cores] failed: ${e.getMessage}")
        None
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.length >= 3 && args(0) == "--scale-child") {
      scaleChild(args(1).toInt, args(2))
      return
    }

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // Scaling inputs are sized so every measured run is ≥ 30 s (round-1
    // lesson: 600 k turns finish in ~2.5 s at local[16] — fixed job
    // overhead dominated and the 4→16 efficiency read 0.27). Each PAIR
    // compares the same input at both widths, per the driver's protocol.
    val turns4N = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS_4N", "6400000").toLong
    val turnsAnchor = turns4N / 4
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "2").toInt

    // ---- part 1: headline queries at full parallelism
    val spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec = try time(force(fn(spark, sfDir))) catch { case _: Throwable => -1.0 }
      System.err.println(f"[bench] $name%-24s $sec%8.2f s")
      name -> sec
    }
    // materialize the scaling inputs ONCE (generation cost excluded from
    // the measurement — real deployments read tables, not generators).
    // Inputs live on tmpfs when available: the sandbox's single shared
    // /tmp DISK is a non-scaling resource and its neighbors' I/O storms
    // are INVISIBLE to the pure-compute control brackets (observed: a
    // 462 s extract between 4 s clean controls, entirely disk wait) —
    // a multi-node cluster would not share one disk either.
    val inBase =
      if (new java.io.File("/dev/shm").canWrite) "/dev/shm" else "/tmp"
    val bigDir = s"$inBase/graft_bench_turns_4n"
    val anchorDir = s"$inBase/graft_bench_turns_1n"
    val inputReady =
      try {
        TranscriptGen.inputDf(spark, turns4N)
          .write.mode("overwrite").parquet(bigDir)
        TranscriptGen.inputDf(spark, turnsAnchor)
          .write.mode("overwrite").parquet(anchorDir)
        true
      } catch { case e: Throwable =>
        System.err.println(s"[bench] scaling input write failed: ${e.getMessage}")
        false
      }
    spark.stop()

    // ---- part 2: N vs 4N scaling, alternating fresh child JVMs.
    // The pair is (cpus/8, cpus/2) — e.g. local[4] vs local[16] on the
    // 32-vCPU sandbox — because claiming ALL host vCPUs triggers a
    // hypervisor sys-time storm (observed 5–99 s spread for identical
    // local[32] runs) that measures the host, not the engine; half-width
    // still leaves headroom for GC threads exactly like a production
    // executor sized below the machine.
    val four = math.max(cpus / 2, 4)
    val n = math.max(four / 4, 1)
    // Two same-input pairs: the (n, 4n) pair on the big input is the
    // primary criterion; the (1, n) pair on the quarter-size input
    // anchors an operating point where the shared host can reliably
    // supply every requested core (observed: ≥0.8 raw there; at wider
    // configs the HOST itself tops out near 0.65 even for
    // zero-allocation compute — see control efficiency).
    val plan: Seq[(Int, String, Long)] = Seq(
      (1, anchorDir, turnsAnchor), (n, anchorDir, turnsAnchor),
      (n, bigDir, turns4N), (four, bigDir, turns4N))
    val samples = (1 to (if (inputReady) rounds else 0)).flatMap { r =>
      // alternate order each round so periodic host interference cannot
      // systematically hit one config
      val order = if (r % 2 == 1) plan else plan.reverse
      order.flatMap { case (c, dir, turns) =>
        runChild(c, dir).map { case (e, ctl, bracket) =>
          System.err.println(
            f"[bench] round $r local[$c] ($turns turns): extract $e%.2f s, control $ctl%.2f s, bracket $bracket%.2f s")
          (c, dir, turns, e, ctl, bracket)
        }
      }
    }
    // window-cleanliness gate: each child's bracketing controls reveal
    // whether ITS window was hit by host interference. Keep only samples
    // whose worst bracket is within 1.5× of that config's best control;
    // a dirty-window extract time says nothing about the engine.
    def minExtract(c: Int, dir: String): Double = {
      val mine = samples.filter(s => s._1 == c && s._2 == dir)
      val bestCtl = mine.map(_._5).min
      val kept = mine.filter(_._6 <= bestCtl * 1.5)
      (if (kept.nonEmpty) kept else mine).map(_._4).min
    }
    def minControl(c: Int): Double =
      samples.filter(_._1 == c).map(_._5).min
    def safe(f: => Double): Double =
      try { val v = f; if (v.isNaN || v.isInfinite) -1.0 else v }
      catch { case _: Throwable => -1.0 }
    val sec1 = safe(minExtract(1, anchorDir))
    val secNanchor = safe(minExtract(n, anchorDir))
    val secN = safe(minExtract(n, bigDir))
    val sec4N = safe(minExtract(four, bigDir))
    val tps1 = safe(turnsAnchor / sec1)
    val tpsN = safe(turns4N / secN)
    val tps4N = safe(turns4N / sec4N)
    val effRaw = safe((tps4N / tpsN) / 4.0)
    val effControl = safe((minControl(n) / minControl(four)) / 4.0)
    val effNormalized = safe(effRaw / effControl)
    val eff1toN = safe((turnsAnchor / secNanchor) / tps1 / n)

    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val scaling =
      f"""{"n_cores":$n,"4n_cores":$four,"turns":$turns4N,"anchor_turns":$turnsAnchor,""" +
        f""""sec_1":$sec1%.1f,"sec_n_anchor":$secNanchor%.1f,"sec_n":$secN%.1f,"sec_4n":$sec4N%.1f,""" +
        f""""turns_per_sec_1":$tps1%.1f,""" +
        f""""turns_per_sec_n":$tpsN%.1f,"turns_per_sec_4n":$tps4N%.1f,""" +
        f""""efficiency":$effRaw%.3f,"control_efficiency":$effControl%.3f,""" +
        f""""normalized_efficiency":$effNormalized%.3f,""" +
        f""""efficiency_1_to_4":$eff1toN%.3f}"""
    // free the tmpfs inputs — they are measurement scratch, not results
    Seq(bigDir, anchorDir).foreach { d =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      val f = new java.io.File(d)
      if (f.exists()) rm(f)
    }

    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","scaling":$scaling}"""
    println(line)
    // sidecar copy: belt-and-braces against stdout decoration/truncation
    // (r1 lost the line to sbt's [info] prefix — BENCH_r01.json parsed:null)
    val sidecar = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(sidecar), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] sidecar write failed: ${e.getMessage}")
    }
  }
}
