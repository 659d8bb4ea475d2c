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
    * until it finishes (exceptions surface at the thunk call). */
  def overlapped[A](body: => A): () => A = {
    val f = scala.concurrent.Future(body)(scala.concurrent.ExecutionContext.global)
    () => scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf)
  }
}
