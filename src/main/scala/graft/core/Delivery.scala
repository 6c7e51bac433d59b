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
    * The reference sleeps after EVERY failed attempt including the last
    * (`ocr_rpc_client.go:250-263` — the sleep precedes the loop condition),
    * so the all-fail case sleeps PostbackRetries times, not attempts-1.
    */
  def postbackOutcome(failuresBeforeSuccess: Int): (Int, Boolean, Int) = {
    val attempts = math.min(failuresBeforeSuccess + 1, PostbackRetries)
    val delivered = failuresBeforeSuccess < PostbackRetries
    val failures = math.min(failuresBeforeSuccess, PostbackRetries)
    (attempts, delivered, failures * PostbackBackoffSeconds)
  }

  /** Broker memory ceiling — 95 % (`/root/reference/ocr_res_manager.go:23`). */
  val MemoryThresholdPercent = 95L

  /** Admission gate — accept new work iff BOTH schedulers pass
    * (`/root/reference/ocr_res_manager.go:98-120`):
    * queued messages < consumers × factor, and broker memory used < 95 % of
    * the limit. `factor` default 2 (`rabbit_config.go:50,105-109`).
    * The memory compare uses TRUNCATING integer division exactly like the
    * reference (`ocr_res_manager.go:108`: `memTotalAvailable*95/100` in Go
    * int64 math) — e.g. memLimit=101, memUsed=95 REJECTS (95 < 9595/100=95
    * is false), where a cross-multiplied compare would accept.
    */
  def admit(queued: Long, consumers: Long, factor: Long, memUsed: Long, memLimit: Long): Boolean =
    queued < consumers * factor && memUsed < (memLimit * MemoryThresholdPercent) / 100L
}
