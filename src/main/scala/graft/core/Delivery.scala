package graft.core

/** Result-delivery and admission policies — pure-function analogs of the
  * reference's postback retry loop and resource-manager gate. At cluster
  * scale the postback policy maps onto Spark task retries and the admission
  * gate onto scheduler backpressure (SURVEY.md §2 O20/O21); these functions
  * pin the reference's exact decision semantics so they stay testable.
  */
object Delivery {

  /** Postback retry policy — `/root/reference/ocr_rpc_client.go:20,232-277`:
    * at most 3 attempts, 2 s sleep between attempts.
    */
  val PostbackRetries = 3
  val PostbackBackoffSeconds = 2

  /** Outcome of delivering a result that fails `failuresBeforeSuccess` times:
    * (attempts actually made, delivered?, total backoff slept in seconds).
    */
  def postbackOutcome(failuresBeforeSuccess: Int): (Int, Boolean, Int) = {
    val attempts = math.min(failuresBeforeSuccess + 1, PostbackRetries)
    val delivered = failuresBeforeSuccess < PostbackRetries
    (attempts, delivered, (attempts - 1) * PostbackBackoffSeconds)
  }

  /** Broker memory ceiling — 95 % (`/root/reference/ocr_res_manager.go:23`). */
  val MemoryThresholdPercent = 95L

  /** Admission gate — accept new work iff BOTH schedulers pass
    * (`/root/reference/ocr_res_manager.go:98-120`):
    * queued messages < consumers × factor, and broker memory used < 95 % of
    * the limit. `factor` default 2 (`rabbit_config.go:50,105-109`).
    * Integer-exact compare (×100 vs ×95) so the pure, columnar, and SQL
    * variants agree bit-for-bit.
    */
  def admit(queued: Long, consumers: Long, factor: Long, memUsed: Long, memLimit: Long): Boolean =
    queued < consumers * factor && memUsed * 100L < memLimit * MemoryThresholdPercent
}
