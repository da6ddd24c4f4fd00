package graft.service

import org.apache.spark.sql.SparkSession

/** Health/liveness parity with the reference's HTTP control plane
  * (`src/controller/health-controller.ts:12-21` — GET|POST
  * `/health/ping` and GET `/` answer 200 "I'm healthy !!").
  *
  * This library has no HTTP surface — SURVEY §3.3 maps health to
  * DRIVER liveness — so the probe is a function with the reference's
  * exact contract: it returns the reference's body iff the session can
  * still schedule work, and throws otherwise (the moral equivalent of
  * the HTTP probe timing out). Wire it into whatever control plane
  * hosts the driver: a K8s exec/liveness probe, a one-line HTTP
  * handler, or the queue-subscription supervisor.
  */
object Health {

  /** The reference's response body, verbatim. */
  val Message = "I'm healthy !!"

  /** Liveness probe: proves the scheduler still answers — a wedged or
    * stopped driver must FAIL the probe, not return a cached string.
    * The one-row job is driver-local (no shuffle, no executors beyond
    * one task) and costs ~ms on a live session.
    */
  def ping(spark: SparkSession): String = {
    require(!spark.sparkContext.isStopped, "SparkContext is stopped")
    require(spark.range(1).count() == 1L, "scheduler did not answer")
    Message
  }
}
