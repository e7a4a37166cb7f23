package graft.util

/** Overlap independent EAGER subplan constructions (guide §2.6: the
  * scheduler happily runs several jobs at once; composites were only
  * sequential because construction code called one eager action —
  * localCheckpoint / count — after another, leaving the cluster idle
  * in each subtree's stage tails).
  *
  * `Par(a, b, c)` runs the thunks on separate threads and returns
  * their results in order; exceptions propagate (first failure wins,
  * others are awaited so no job leaks past the call). The thunks must
  * be independent — nothing here changes what any of them computes,
  * only when their jobs are submitted.
  */
object Par {
  def apply[T](thunks: (() => T)*): Seq[T] = {
    if (thunks.lengthCompare(1) <= 0) thunks.map(_())
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      val fs = thunks.map(t => Future(t()))
      fs.map(Await.result(_, Duration.Inf))
    }
  }
}
