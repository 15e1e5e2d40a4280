package graft.ops

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import scala.jdk.CollectionConverters._

/** Per-executor pool of RESIDENT codec subprocesses — the Spark
  * PythonRunner daemon pattern applied to the out-of-JVM codec contract
  * (r19 adjudication outcome: a fresh `java -cp <spark jars>` child costs
  * ~1.5 s of class loading on this box, and the r18 floors paid it per
  * partition, per QUERY, per micro-batch — the whole >2×-floor drift of
  * the multimodal quartet was spawn tax, not decode).
  *
  * Protocol: a pooled child loops over REQUEST STREAMS — each request is
  * one complete Arrow IPC stream on stdin (ending with the IPC
  * end-of-stream marker), answered by one complete IPC stream on stdout;
  * stdin EOF means "no more requests", child exits 0
  * ([[graft.tools.ArrowPngCodec]]'s main loop). Pure pipes like
  * `/bin/cat` satisfy the contract for the passthrough path (the EOS
  * marker echoes straight through). A child whose response desyncs —
  * task failure, torn stream, half-consumed response — is DESTROYED,
  * never recycled; only a worker whose response stream completed cleanly
  * goes back to the pool.
  *
  * Lifecycle: checkout gives exclusive use (workers are single-user);
  * idle workers park on a blocked stdin read and die on parent exit
  * (their pipe write-end closes → EOF) — the shutdown hook just makes it
  * prompt. Pool depth is bounded per command; overflow workers are
  * reaped at checkin.
  */
private[graft] object CodecWorkers {

  final class Worker private[CodecWorkers] (val cmd: Seq[String]) {
    val proc: Process = new ProcessBuilder(cmd.asJava).start()
    val stdin: java.io.OutputStream = proc.getOutputStream
    val stdout: java.io.InputStream =
      new java.io.BufferedInputStream(proc.getInputStream)
    // rolling stderr tail — bounded so a chatty child can't grow the
    // executor heap over a long worker lifetime
    private val err = new java.io.ByteArrayOutputStream()
    private val drain = new Thread(() => {
      val tmp = new Array[Byte](1024)
      try {
        var n = proc.getErrorStream.read(tmp)
        while (n >= 0) {
          err.synchronized {
            if (err.size > 65536) {
              val tail = err.toByteArray.takeRight(4096)
              err.reset(); err.write(tail)
            }
            err.write(tmp, 0, n)
          }
          n = proc.getErrorStream.read(tmp)
        }
      } catch { case _: java.io.IOException => () }
    }, "graft-codec-stderr")
    drain.setDaemon(true); drain.start()

    // stderr position at the CURRENT request's checkout: error reports
    // must carry this task's stderr, not warnings a recycled worker
    // logged while serving earlier queries
    @volatile private var errMark = 0
    private[CodecWorkers] def markRequest(): Unit =
      err.synchronized { errMark = err.size }
    def stderrTail: String = err.synchronized {
      val all = err.toByteArray
      // the rolling reset can shrink the buffer below the mark — fall
      // back to the whole (post-reset) tail in that case
      val from = if (errMark <= all.length) errMark else 0
      new String(all, from, all.length - from, "UTF-8").takeRight(4096)
    }
    def alive: Boolean = proc.isAlive
    def destroy(): Unit = { proc.destroyForcibly(); () }
  }

  private val pools = new ConcurrentHashMap[Seq[String], ConcurrentLinkedQueue[Worker]]()
  /** Idle-pool depth per command AND the codec-decode task width the
    * media synthesis spreads to (Multimodal.spreadDocs) — ONE knob, so
    * concurrent decode tasks never exceed the residents the pool will
    * keep (r19 verdict ask #4: a pool shallower than the task wave reaps
    * the overflow and re-pays its ~2 s spawn every query; r20 measured
    * the opposite failure too — task waves sized to all 32 slots spawned
    * a 5-cmd × 32-child fleet whose burst start-up CPU melted the box).
    * Deployments size it to their per-executor codec budget via
    * GRAFT_CODEC_POOL. */
  private[graft] val PoolDepth: Int =
    sys.env.get("GRAFT_CODEC_POOL").flatMap(_.toIntOption).getOrElse(8)
  private def MaxIdlePerCmd: Int = PoolDepth
  /** Test seam: total child processes ever spawned. */
  private[graft] val spawns = new java.util.concurrent.atomic.AtomicLong(0L)

  def checkout(cmd: Seq[String]): Worker = {
    val q = pools.computeIfAbsent(cmd, _ => new ConcurrentLinkedQueue[Worker]())
    var w = q.poll()
    while (w != null && !w.alive) { w.destroy(); w = q.poll() }
    val out = if (w == null) { spawns.incrementAndGet(); new Worker(cmd) } else w
    out.markRequest()
    out
  }

  /** Return a worker whose response completed cleanly. Dead or surplus
    * workers are reaped instead of pooled. */
  def checkin(w: Worker): Unit = {
    val q = pools.computeIfAbsent(w.cmd, _ => new ConcurrentLinkedQueue[Worker]())
    if (!w.alive || q.size >= MaxIdlePerCmd) w.destroy() else { q.add(w); () }
  }

  /** Prompt cleanup on JVM exit (children would also see stdin EOF). */
  sys.addShutdownHook {
    pools.values.asScala.foreach { q =>
      var w = q.poll()
      while (w != null) { w.destroy(); w = q.poll() }
    }
  }
}
