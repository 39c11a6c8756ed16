package graft

/** In-operator accounting channel — the "no silent caps" principle
  * (BASELINE.md plan notes, r3 verdict #3): an operator that DROPS data at
  * a safety cap must say how much it dropped, in-line, in the same call —
  * the separate audit functions (`EntityLinker.blockStats`,
  * `Similarity.bucketStats`) stay for deep dives, but a run log must not
  * be silent about lost recall.
  *
  * The sink is pluggable so specs can capture warnings deterministically;
  * the default is slf4j WARN (Spark's log4j2 backend picks it up).
  */
object Audit {
  private val log = org.slf4j.LoggerFactory.getLogger("graft.Audit")

  @volatile var sink: String => Unit = log.warn(_)

  def warn(msg: String): Unit = sink(msg)

  /** Run `f` with warnings captured into the returned buffer (spec hook);
    * restores the previous sink afterwards. Not reentrant. */
  def capturing[A](f: => A): (A, Seq[String]) = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    val prev = sink
    sink = m => buf.synchronized { buf += m; () }
    try (f, buf.toSeq) finally sink = prev
  }
}
