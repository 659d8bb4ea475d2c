package graft.spark

/** Overlap INDEPENDENT sub-computations of one query (guide §2.6):
  * Spark's scheduler happily runs several jobs at once inside one
  * application — actions are only sequential because driver code calls
  * them sequentially. A query whose gates decompose into independent
  * pieces (an exact-truth recomputation next to an index build, a
  * brute-force baseline next to an index scan, two anti-join directions)
  * submits each piece from a background thread so its jobs back-fill
  * executor threads the other piece leaves idle. Purely a scheduling
  * change: every piece computes exactly the value it computed
  * sequentially, and deterministic results stay deterministic.
  */
object Par {

  /** Start `body` on a background thread; returns a thunk that blocks
    * until it finishes (exceptions surface at the thunk call).
    * The body is wrapped in `scala.concurrent.blocking`: each piece
    * blocks its pool thread for the full duration of a Spark action, and
    * without the hint the global ForkJoinPool (sized to the core count)
    * would stop admitting new bodies once saturated — silently
    * serializing the very computations this exists to overlap (e.g.
    * q56's driver holds threads for the truth future plus three staging
    * writes while each foreachBatch ingest wants one more). */
  def overlapped[A](body: => A): () => A = {
    val f = scala.concurrent.Future(scala.concurrent.blocking(body))(
      scala.concurrent.ExecutionContext.global)
    () => scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf)
  }

  /** Await an overlapped thunk, suppressing its failure — for ERROR
    * paths only: before a cleanup (directory delete, rethrow) the
    * caller must not leave the background body's jobs racing the
    * cleanup, and must not let a secondary failure mask the primary. */
  def quietly(thunk: () => Any): Unit =
    try { thunk(); () } catch { case _: Throwable => () }
}
