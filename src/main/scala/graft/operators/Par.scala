package graft.operators

/** Overlap INDEPENDENT eager sub-pipelines of one query on the shared
  * Spark scheduler (optimization guide §2.6 "Overlap independent
  * jobs"): Spark happily runs several jobs at once inside one
  * application — actions are only sequential because driver code calls
  * them sequentially. Several operator families in this library are
  * compositions of independent eager chains (per-subspace PQ Lloyd
  * fits, tokenizer-A/B training arms, a text-cleaning chain beside an
  * embedding-clustering chain) that the builder used to run one after
  * another, leaving most cores idle through each chain's tail. Running
  * the chains from a small thread pool lets the next chain's tasks
  * back-fill executors freed by the current chain's stragglers — at
  * the 100 TB tier exactly as in local mode, since it changes job
  * SUBMISSION order only, never any job's plan.
  *
  * Determinism: each thunk is an independent computation whose result
  * frame is combined by the caller in a FIXED order (results return in
  * input order); nothing here can reorder rows within a frame beyond
  * what Spark's own task scheduling already does (which every
  * aggregation/oracle in this repo is already robust to).
  *
  * Thread notes: Spark actions are safe from multiple driver threads
  * (the scheduler interleaves stages); `SparkSession` thread-locals
  * (active session, job group) are inherited at thread creation —
  * these thunks only touch DataFrames that carry their own session, so
  * none of that state is load-bearing. Failures propagate: the first
  * thunk exception rethrows on the calling thread after the pool
  * drains (a failed arm must fail the query, not leak a half-run).
  */
private[graft] object Par {

  /** Run the thunks concurrently; return results in input order. */
  def seq[T](thunks: Seq[() => T]): Seq[T] = {
    if (thunks.lengthCompare(1) <= 0) return thunks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(thunks.size, 8))
    try {
      val futs = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[T] {
          override def call(): T = t()
        })
      }
      futs.map { f =>
        try f.get()
        catch {
          // Unwrap the executor's envelope so callers see the real
          // failure (and tests can match on it).
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }
    } finally pool.shutdownNow()
  }

  /** Two heterogeneous arms. */
  def par2[A, B](a: () => A, b: () => B): (A, B) = {
    val r = seq[Any](Seq(a, b))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }

  /** Three heterogeneous arms. */
  def par3[A, B, C](a: () => A, b: () => B, c: () => C): (A, B, C) = {
    val r = seq[Any](Seq(a, b, c))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B], r(2).asInstanceOf[C])
  }

  /** Four heterogeneous arms. */
  def par4[A, B, C, D](
      a: () => A, b: () => B, c: () => C, d: () => D): (A, B, C, D) = {
    val r = seq[Any](Seq(a, b, c, d))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B],
      r(2).asInstanceOf[C], r(3).asInstanceOf[D])
  }
}
