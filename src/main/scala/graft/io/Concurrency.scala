package graft.io

/** Bounded-pool concurrent dispatch of INDEPENDENT Spark actions (the
  * per-collection and per-child-table pattern, SURVEY §4.2): each body
  * launches its own Spark jobs, and running a few driver threads lets the
  * scheduler interleave their stages and fill the cores a sequential loop
  * would leave idle. The pool is deliberately small — the parallelism that
  * matters is INSIDE each job (its tasks); the threads exist only to keep
  * the scheduler fed. Results return in input order; the first failure
  * propagates after the pool drains. */
private[graft] object Concurrency {

  def mapBounded[A, T](items: Seq[A], maxThreads: Int = 4)(
      body: A => T): Seq[T] = {
    if (items.isEmpty) return Seq.empty
    if (items.size == 1) return Seq(body(items.head))
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(items.size, maxThreads).max(1))
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(pool)
    try Await.result(
      Future.sequence(items.map(a => Future(body(a)))), Duration.Inf)
    finally pool.shutdown()
  }
}
