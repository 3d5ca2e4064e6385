package minietl.pipeline

import org.apache.spark.sql.DataFrame

/** Run-scoped registry for frames that stage closures materialize
  * (localCheckpoint / persist) and cannot release themselves.
  *
  * The problem it closes (PLANS.md r9 residual #4): fire-and-forget
  * execution paths — the YAML config's `Pipeline.run` and `Dag.run` —
  * compose stage closures that sometimes must materialize an intermediate
  * eagerly (`Similarity.semanticDecontaminateEager` checkpoints the
  * flagged-id set, `LmScore.bigramSurpriseEager` the per-doc scores).
  * Those closures have no after-run hook, so the handles used to pin
  * blocks for the SESSION lifetime. Now: the run paths open a scope for
  * the duration of the run, the eager primitives [[register]] what they
  * checkpoint, and the scope releases every handle once the sink action
  * has consumed the data — a run leaves zero cache pins behind.
  *
  * Library callers composing frames directly are unaffected: with no scope
  * open, [[register]] is a no-op and they manage caches themselves (the
  * returned frame stays fully usable). ThreadLocal because a batch run
  * composes and executes on one driver thread; scopes nest innermost-wins
  * (an embedded `run` inside a stage releases its own frames when it
  * finishes — frames it RETURNS to the outer plan must be plain lazy
  * frames, which the eager primitives' join-shaped results are not, so
  * embedding composes via `Pipeline.frame`, not `run`). Streaming stage
  * closures execute on the stream's micro-batch thread where no scope is
  * open — by design: the streamable stage set is scan-side stateless and
  * never checkpoints.
  */
object RunCaches {

  private val scopes = new ThreadLocal[List[scala.collection.mutable.Buffer[DataFrame]]] {
    override def initialValue(): List[scala.collection.mutable.Buffer[DataFrame]] = Nil
  }

  /** Track a cached/checkpointed frame for release at the end of the
    * current run scope; no-op when no scope is open.
    */
  def register(df: DataFrame): Unit = scopes.get() match {
    case head :: _ => head += df; ()
    case Nil => ()
  }

  /** Run `body` with a fresh registry scope; every frame registered during
    * it is released afterward (blocking=false — the executors drop the
    * blocks asynchronously), whether the body completed or threw.
    */
  def scoped[T](body: => T): T = {
    val buf = scala.collection.mutable.Buffer.empty[DataFrame]
    scopes.set(buf :: scopes.get())
    try body
    finally {
      scopes.set(scopes.get().tail)
      buf.foreach(f => try release(f) catch { case _: Throwable => () })
    }
  }

  /** Release a frame's storage. `Dataset.unpersist` only evicts
    * CacheManager entries — a `localCheckpoint`ed frame's data lives as a
    * persisted RDD inside its `LogicalRDD` leaf (invisible to the
    * CacheManager, which is exactly why these frames used to pin blocks
    * for the session), so the leaf RDDs are unpersisted explicitly too.
    */
  private def release(df: DataFrame): Unit = releaseNow(df)

  /** [[release]], public for iterative operators that truncate lineage
    * with rolling localCheckpoints and must free the superseded
    * checkpoint's blocks themselves (the connected-components loop).
    */
  def releaseNow(df: DataFrame): Unit = {
    df.unpersist()
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false); ()
      case _ => ()
    }
  }
}
