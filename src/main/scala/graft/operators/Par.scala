package graft.operators

/** Driver-side overlap of INDEPENDENT Spark actions (optimization guide
  * §2.6): Spark's scheduler happily runs several jobs at once inside one
  * application — actions are only sequential because driver code calls
  * them sequentially. The index-maintenance paths update several
  * independent companion tables per micro-batch; submitting those
  * updates from a small shared pool lets one update's driver-side
  * planning/commit overlap another's executor work instead of
  * serializing ~0.1–0.5 s of fixed per-action cost each.
  *
  * Tasks MUST be mutually independent (distinct tables/paths, no
  * read-after-write hazards between them) and MUST NOT call [[Par.all]]
  * themselves (a nested submit could starve the fixed pool). */
private[graft] object Par {
  private lazy val pool = java.util.concurrent.Executors.newFixedThreadPool(
    4,
    (r: Runnable) => {
      val t = new Thread(r, "graft-companion")
      t.setDaemon(true)
      t
    })

  /** Run the thunks, waiting for ALL of them; rethrows the first failure
    * after every task has finished (each task is an independent state
    * swap — no cancellation). Empty/single input runs inline. */
  def all(tasks: Seq[() => Unit]): Unit = tasks match {
    case Seq() => ()
    case Seq(one) => one()
    case many =>
      val futs = many.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = t()
        })
      }
      var err: Throwable = null
      futs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (err == null) err = e.getCause
          case e: Throwable => if (err == null) err = e
        }
      }
      if (err != null) throw err
  }
}
